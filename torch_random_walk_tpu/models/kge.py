"""Knowledge-graph embedding trainers over triples walks.

Completes the KG-triples family end-to-end the same way SGNS/CBOW complete
the node-walk families: the reference stops at window generation
(/root/reference/csrc/cpu/windows_cpu.cpp:161-475 produce the batches, the
trainer "is NOT in this repo" — SURVEY.md §3.5), so this module supplies the
downstream consumer those batches exist for.

Two objective families, both functional (params in / params out), jitted,
and shardable exactly like SkipGramModel:

- **Link-prediction KGE** (``objective="transe" | "distmult" | "rotate"``):
  positives are the (h, r, t) triples the walks visit; negatives are
  locally-corrupted copies (head or tail replaced by a uniform entity — the
  standard local-closed-world negatives, which the reference's generators do
  not provide because its negatives are *co-occurrence* negatives).
  Logistic NEG loss over the score s(h,r,t): TransE
  ``margin - ||e_h + w_r - e_t||``, DistMult ``<e_h, w_r, e_t>``, or RotatE
  ``margin - ||e_h * exp(i*theta_r) - e_t||`` (complex rotation — the
  model family that can represent the cyclic relations TransE provably
  cannot).  Evaluated by tail-ranking MRR/Hits@k
  (models/eval.py::kg_tail_ranking_metrics).
- **Co-occurrence skip-gram/CBOW over composed triple vectors**
  (``objective="skipgram" | "cbow"``): consumes exactly the
  ``to_windows_triples`` / ``to_windows_triples_cbow`` batch shapes
  (targets/positives/negatives with component-wise ``padding_idx`` outside
  the walk — windows_cpu.cpp:209-300 semantics), embedding each triple as
  e_h + w_r + e_t with separate in/out tables, SGNS loss between target and
  context composition vectors (the RDF2Vec-style objective).

TPU notes: every loss is gathered rows + batched dot products (VPU) or a
(B, D) x (D, N) score matmul (MXU) at eval; padding is handled by clip +
mask so all shapes stay static under jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_random_walk_tpu.graph.triples import TriplesGraph
from torch_random_walk_tpu.utils import prng

_OBJECTIVES = ("transe", "distmult", "rotate", "skipgram", "cbow")
_PAIR_OBJECTIVES = ("transe", "distmult", "rotate")


def corrupt_triples(pos_triples, num_entities: int, num_neg: int, seed,
                    epoch=0):
    """(B, 3) positives -> (B, num_neg, 3) corrupted negatives.

    Even negative slots replace the tail, odd slots the head (uniform over
    all entities, standard local-closed-world negatives).  Pure function of
    (seed, epoch, slot index) via the threefry counter stream, so trainer
    runs stay deterministic under any batch sharding.
    """
    b = pos_triples.shape[0]
    key = prng.derive_key(seed, prng.STREAM_KGE_NEG)
    ids = jnp.arange(b * num_neg, dtype=jnp.uint32)
    bits, _ = prng.counter_bits(key, ids,
                                jnp.full_like(ids, jnp.uint32(epoch)))
    repl = prng.randint_from_bits(bits, num_entities)
    repl = repl.reshape(b, num_neg).astype(pos_triples.dtype)
    neg = jnp.broadcast_to(pos_triples[:, None, :], (b, num_neg, 3))
    slot = jnp.arange(num_neg) % 2  # 0 -> corrupt tail, 1 -> corrupt head
    tail_c = neg.at[:, :, 2].set(repl)
    head_c = neg.at[:, :, 0].set(repl)
    return jnp.where((slot == 0)[None, :, None], tail_c, head_c)


class KGEModel:
    """Functional KG-embedding model; holds only static config.

    Parameter pytree depends on the objective:
    - transe/distmult/rotate: {"ent": (N_e, D), "rel": (N_r, D)}
      (rotate relations are (N_r, D/2) phases)
    - skipgram/cbow:   in/out pairs of both tables (word2vec-style).
    """

    def __init__(self, num_entities: int, num_relations: int, dim: int = 128,
                 objective: str = "transe", margin: float = 2.0,
                 optimizer: optax.GradientTransformation | None = None,
                 learning_rate: float = 1e-2, dtype=jnp.float32,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
        if objective not in _OBJECTIVES:
            raise ValueError(f"unknown objective {objective!r}; "
                             f"expected one of {_OBJECTIVES}")
        if objective == "rotate" and dim % 2:
            raise ValueError("rotate needs an even dim (entity rows are "
                             f"dim/2 complex pairs); got dim={dim}")
        self.num_entities = num_entities
        self.num_relations = num_relations
        self.dim = dim
        self.objective = objective
        self.margin = margin
        self.dtype = dtype
        # The touched-rows step applies Adam manually, so it needs the
        # hyperparameters in the open — a custom optax optimizer is opaque
        # (same contract as SkipGramModel).
        self._sparse_hparams_ok = optimizer is None
        self.learning_rate = learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.optimizer = optimizer or optax.adam(learning_rate)

    # -- parameters ---------------------------------------------------------

    def init(self, seed: int = 0):
        key = jax.random.key(seed)
        scale = 1.0 / self.dim**0.5

        def table(k, n):
            return jax.random.uniform(
                k, (n, self.dim), jnp.float32, -scale, scale
            ).astype(self.dtype)

        ks = jax.random.split(key, 4)
        if self.objective in _PAIR_OBJECTIVES:
            if self.objective == "rotate":
                # Relations are D/2 rotation phases in [-pi, pi).
                rel = jax.random.uniform(
                    ks[1], (self.num_relations, self.dim // 2),
                    jnp.float32, -jnp.pi, jnp.pi).astype(self.dtype)
            else:
                rel = table(ks[1], self.num_relations)
            params = {"ent": table(ks[0], self.num_entities), "rel": rel}
        else:
            # Out tables start at zero, matching SkipGramModel.init.
            zeros_e = jnp.zeros((self.num_entities, self.dim), self.dtype)
            zeros_r = jnp.zeros((self.num_relations, self.dim), self.dtype)
            params = {"ent_in": table(ks[0], self.num_entities),
                      "rel_in": table(ks[1], self.num_relations),
                      "ent_out": zeros_e, "rel_out": zeros_r}
        return params, self.optimizer.init(params)

    def entity_embeddings(self, params):
        return params["ent" if self.objective in _PAIR_OBJECTIVES
                      else "ent_in"]

    def relation_embeddings(self, params):
        return params["rel" if self.objective in _PAIR_OBJECTIVES
                      else "rel_in"]

    # -- link-prediction objectives (transe / distmult) ---------------------

    def _score_tabs(self, ent, rel, triples):
        """s(h, r, t) for (..., 3) int triples against the given tables
        (full tables in the dense step, gathered sub-tables in the sparse
        one); indices must be in range."""
        e_h = ent[triples[..., 0]]
        w_r = rel[triples[..., 1]]
        e_t = ent[triples[..., 2]]
        if self.objective == "transe":
            d = (e_h + w_r - e_t).astype(jnp.float32)
            return self.margin - jnp.linalg.norm(d, axis=-1)
        if self.objective == "rotate":
            # RotatE (Sun et al. 2019): entities are D/2 complex pairs
            # (first half = real, second half = imaginary), relations are
            # unit rotations e^{i*theta}; s = margin - ||h o r - t||.
            # Rotations COMPOSE around cycles, so ring/grid relations are
            # representable where TransE's translations are not.
            half = self.dim // 2
            re_h = e_h[..., :half].astype(jnp.float32)
            im_h = e_h[..., half:].astype(jnp.float32)
            theta = w_r.astype(jnp.float32)
            cos, sin = jnp.cos(theta), jnp.sin(theta)
            d_re = re_h * cos - im_h * sin - e_t[..., :half]
            d_im = re_h * sin + im_h * cos - e_t[..., half:]
            norm = jnp.sqrt((d_re * d_re + d_im * d_im).sum(axis=-1) + 1e-12)
            return self.margin - norm
        prod = (e_h * w_r * e_t).astype(jnp.float32)
        return prod.sum(axis=-1)

    def _safe(self, t):
        """Clip triple components into table range (padding slots are
        masked out of the loss separately)."""
        h = jnp.clip(t[..., 0], 0, self.num_entities - 1)
        r = jnp.clip(t[..., 1], 0, self.num_relations - 1)
        tl = jnp.clip(t[..., 2], 0, self.num_entities - 1)
        return jnp.stack([h, r, tl], axis=-1)

    def _pair_loss_tabs(self, ent, rel, pos, neg, valid):
        """Shared by the dense and touched-rows steps so both compute the
        identical masked-mean logistic NEG loss and row gradients."""
        pos_s = self._score_tabs(ent, rel, pos)                 # (B,)
        neg_s = self._score_tabs(ent, rel, neg)                 # (B, K)
        per = -(jax.nn.log_sigmoid(pos_s)
                + jax.nn.log_sigmoid(-neg_s).sum(axis=-1))
        w = valid.astype(jnp.float32)
        return (per * w).sum() / jnp.maximum(w.sum(), 1.0)

    def pair_loss_fn(self, params, pos_triples, neg_triples, padding_idx):
        """Logistic NEG loss; positives whose relation == padding_idx
        (absorbed-walk slots, rw_cpu_triples.cpp:38-42) are masked out of
        the mean along with their negatives."""
        valid = (pos_triples[..., 1] != padding_idx)
        return self._pair_loss_tabs(params["ent"], params["rel"],
                                    self._safe(pos_triples),
                                    self._safe(neg_triples), valid)

    # -- co-occurrence objectives (skipgram / cbow) --------------------------

    def _compose(self, params, triples, side: str):
        """e_h + w_r + e_t composition with component-wise padding masking:
        padded components (windows_cpu.cpp:221-285 out-of-walk slots)
        contribute zero instead of a junk row."""
        ent, rel = params[f"ent_{side}"], params[f"rel_{side}"]
        h, r, t = triples[..., 0], triples[..., 1], triples[..., 2]

        def rows(tab, ids, n):
            ok = (ids >= 0) & (ids < n)
            g = tab[jnp.clip(ids, 0, n - 1)]
            return jnp.where(ok[..., None], g, jnp.zeros((), tab.dtype))

        return (rows(ent, h, self.num_entities)
                + rows(rel, r, self.num_relations)
                + rows(ent, t, self.num_entities))

    def skipgram_loss_fn(self, params, targets, pos_windows, neg_windows,
                         padding_idx):
        """SGNS between composed triple vectors; consumes the exact
        to_windows_triples batch (targets (B,3), pos/neg (B, 2W, 3)).

        A slot is a real sampled triple iff its relation component is not
        ``padding_idx`` (absorbed-walk slots are (v, pad, pad) and
        out-of-walk slots (pad, pad, pad) — both excluded); negatives are
        drawn from the real triples table and never padded."""
        u = self._compose(params, targets, "in")                # (B, D)
        v_pos = self._compose(params, pos_windows, "out")       # (B, 2W, D)
        v_neg = self._compose(params, neg_windows, "out")
        pos_logit = jnp.einsum("bd,bcd->bc", u, v_pos,
                               preferred_element_type=jnp.float32)
        neg_logit = jnp.einsum("bd,bcd->bc", u, v_neg,
                               preferred_element_type=jnp.float32)
        pos_ok = pos_windows[..., 1] != padding_idx             # (B, 2W)
        per = -(jnp.where(pos_ok, jax.nn.log_sigmoid(pos_logit), 0.0).sum(-1)
                + jax.nn.log_sigmoid(-neg_logit).sum(-1))
        tgt_ok = (targets[..., 1] != padding_idx).astype(jnp.float32)
        return (per * tgt_ok).sum() / jnp.maximum(tgt_ok.sum(), 1.0)

    def cbow_loss_fn(self, params, pos_triples, neg_triples, windows,
                     padding_idx):
        """CBOW over composed vectors; consumes the exact
        to_windows_triples_cbow batch (pos/neg (B,3), windows (B, 2W, 3)).
        Context mean runs over real slots only (relation != padding_idx)."""
        ctx = self._compose(params, windows, "out")             # (B, 2W, D)
        ctx_ok = (windows[..., 1] != padding_idx)[..., None]    # (B, 2W, 1)
        ctx = jnp.where(ctx_ok, ctx, jnp.zeros((), ctx.dtype))
        denom = jnp.maximum(ctx_ok.sum(axis=1), 1).astype(ctx.dtype)
        mean = ctx.sum(axis=1) / denom                          # (B, D)
        u_pos = self._compose(params, pos_triples, "in")        # (B, D)
        u_neg = self._compose(params, neg_triples, "in")
        dot = partial(jnp.einsum, "bd,bd->b",
                      preferred_element_type=jnp.float32)
        per = -(jax.nn.log_sigmoid(dot(mean, u_pos))
                + jax.nn.log_sigmoid(-dot(mean, u_neg)))
        ok = (pos_triples[..., 1] != padding_idx).astype(jnp.float32)
        return (per * ok).sum() / jnp.maximum(ok.sum(), 1.0)

    # -- train steps ----------------------------------------------------------

    @partial(jax.jit, static_argnums=(0, 5))
    def pair_train_step(self, params, opt_state, pos_triples, neg_triples,
                        padding_idx: int):
        loss, grads = jax.value_and_grad(self.pair_loss_fn)(
            params, pos_triples, neg_triples, padding_idx)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def init_sparse_opt_state(self, params):
        """State for ``pair_train_step_sparse``: fp32 Adam moments shaped
        like the tables plus the global step count (the same layout as
        SkipGramModel.init_sparse_opt_state)."""
        zeros = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)
        return {"mu": zeros,
                "nu": jax.tree.map(jnp.copy, zeros),
                "count": jnp.zeros((), jnp.int32)}

    @partial(jax.jit, static_argnums=(0, 5))
    def pair_train_step_sparse(self, params, opt_state, pos_triples,
                               neg_triples, padding_idx: int):
        """Pair train step with a TOUCHED-ROWS (lazy) Adam update.

        Same motivation and semantics as SkipGramModel.walk_train_step_
        sparse: the loss is computed on gathered sub-tables (identical
        masked-mean math — _pair_loss_tabs — so loss and row gradients
        equal the dense step's), touched entity/relation rows are
        deduplicated with a static-size sort, and Adam moments (fp32) are
        gathered/updated/scattered for those rows only — optimizer and
        gradient traffic scale with the batch instead of the entity
        vocabulary (the Wikidata-class-KG regime).  Rows NOT in the batch
        keep their params and moments; bias correction uses the global
        step count.  Rows touched every step update exactly like
        optax.adam (tests/test_kge.py::test_sparse_pair_step_matches_dense).
        """
        if not self._sparse_hparams_ok:
            raise ValueError(
                "pair_train_step_sparse applies the model's Adam "
                "hyperparameters manually, which cannot be read out of a "
                "custom optax optimizer; construct KGEModel with "
                "learning_rate/b1/b2/eps instead of optimizer=")
        ne, nr = self.num_entities, self.num_relations
        valid = (pos_triples[..., 1] != padding_idx)
        pos = self._safe(pos_triples)
        neg = self._safe(neg_triples)
        ent_touched = jnp.concatenate(
            [pos[..., 0].ravel(), pos[..., 2].ravel(),
             neg[..., 0].ravel(), neg[..., 2].ravel()])
        rel_touched = jnp.concatenate(
            [pos[..., 1].ravel(), neg[..., 1].ravel()])
        # Static-size sorted dedup padded with the table size (out of
        # bounds): the padded id array doubles as the scatter index and
        # OOB rows drop.  Sub-table locations come out of the SAME sort —
        # searchsorted is ~20 serialized gather passes at these sizes
        # (models/skipgram.sorted_unique_with_locations).
        from torch_random_walk_tpu.models.skipgram import (
            sorted_unique_with_locations,
        )

        ent_ids, ent_loc = sorted_unique_with_locations(ent_touched, ne)
        rel_ids, rel_loc = sorted_unique_with_locations(rel_touched, nr)
        k1, k2 = pos[..., 0].size, neg[..., 0].size

        def part(loc, lo, size, shape):
            return loc[lo: lo + size].reshape(shape)

        pos_l = jnp.stack(
            [part(ent_loc, 0, k1, pos[..., 0].shape),
             part(rel_loc, 0, k1, pos[..., 1].shape),
             part(ent_loc, k1, k1, pos[..., 2].shape)], axis=-1)
        neg_l = jnp.stack(
            [part(ent_loc, 2 * k1, k2, neg[..., 0].shape),
             part(rel_loc, k1, k2, neg[..., 1].shape),
             part(ent_loc, 2 * k1 + k2, k2, neg[..., 2].shape)], axis=-1)

        ent_safe = jnp.minimum(ent_ids, ne - 1)
        rel_safe = jnp.minimum(rel_ids, nr - 1)
        subs = {"ent": params["ent"][ent_safe],
                "rel": params["rel"][rel_safe]}

        def sub_loss(subs):
            return self._pair_loss_tabs(subs["ent"], subs["rel"], pos_l,
                                        neg_l, valid)

        loss, g = jax.value_and_grad(sub_loss)(subs)

        mu, nu = dict(opt_state["mu"]), dict(opt_state["nu"])
        count = opt_state["count"] + 1
        c = count.astype(jnp.float32)
        params = dict(params)
        for name, ids, sub, grad in (("ent", ent_ids, subs["ent"], g["ent"]),
                                     ("rel", rel_ids, subs["rel"], g["rel"])):
            safe = jnp.minimum(ids, params[name].shape[0] - 1)
            g32 = grad.astype(jnp.float32)
            mu_new = self.b1 * mu[name][safe] + (1.0 - self.b1) * g32
            nu_new = self.b2 * nu[name][safe] + (1.0 - self.b2) * (g32 * g32)
            # optax.scale_by_adam's formula (eps_root = 0).
            mu_hat = mu_new / (1.0 - self.b1 ** c)
            nu_hat = nu_new / (1.0 - self.b2 ** c)
            upd = self.learning_rate * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
            rows = (sub.astype(jnp.float32) - upd).astype(params[name].dtype)
            from torch_random_walk_tpu.models.skipgram import scatter_rows

            params[name] = scatter_rows(params[name], ids, rows)
            mu[name] = scatter_rows(mu[name], ids, mu_new)
            nu[name] = scatter_rows(nu[name], ids, nu_new)
        return params, {"mu": mu, "nu": nu, "count": count}, loss

    @partial(jax.jit, static_argnums=(0, 6))
    def skipgram_train_step(self, params, opt_state, targets, pos_windows,
                            neg_windows, padding_idx: int):
        loss, grads = jax.value_and_grad(self.skipgram_loss_fn)(
            params, targets, pos_windows, neg_windows, padding_idx)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @partial(jax.jit, static_argnums=(0, 6))
    def cbow_train_step(self, params, opt_state, pos_triples, neg_triples,
                        windows, padding_idx: int):
        loss, grads = jax.value_and_grad(self.cbow_loss_fn)(
            params, pos_triples, neg_triples, windows, padding_idx)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss


@dataclasses.dataclass(frozen=True)
class KGEmbeddingConfig:
    dim: int = 128
    walk_length: int = 20
    window_size: int = 3
    objective: str = "transe"   # transe | distmult | skipgram | cbow
    num_negatives: int = 4      # corrupted negatives per positive (pair obj.)
    margin: float = 2.0
    learning_rate: float = 1e-2
    seed: int = 0
    dtype: str = "float32"
    # padding id used for the walks; None -> max(num_entities, num_relations)
    # (out of range for BOTH id spaces, so the relation-component padding
    # test in the losses can never collide with a real relation id).
    padding_idx: int | None = None
    # "dense" = optax.adam over the full tables each step; "sparse" =
    # touched-rows lazy Adam (KGEModel.pair_train_step_sparse) — optimizer
    # and gradient traffic scale with the batch's unique rows instead of
    # the entity vocabulary.  Pair objectives (transe/distmult/rotate) only.
    update_mode: str = "dense"


class KGEmbedding:
    """End-to-end KG-embedding trainer over a TriplesGraph.

    The fused epoch step (relation-aware walk -> batch -> update in ONE
    jitted function) mirrors models.node2vec.Node2Vec: walk tensors never
    round-trip through host memory.  Graph tables are jit ARGUMENTS, never
    closed-over constants.
    """

    def __init__(self, graph: TriplesGraph,
                 config: KGEmbeddingConfig = KGEmbeddingConfig()):
        self.graph = graph
        self.config = config
        if config.padding_idx is None:
            self.padding_idx = max(graph.num_entities, graph.num_relations)
        else:
            if 0 <= config.padding_idx < graph.num_relations:
                raise ValueError(
                    f"padding_idx={config.padding_idx} is a valid relation "
                    f"id (num_relations={graph.num_relations}); padded and "
                    "real window slots would be indistinguishable")
            if 0 <= config.padding_idx < graph.num_entities:
                raise ValueError(
                    f"padding_idx={config.padding_idx} is a valid entity "
                    f"id (num_entities={graph.num_entities}); walks "
                    "reaching that entity would silently absorb "
                    "(triples_walk.py treats cur == padding_idx as padded)")
            self.padding_idx = config.padding_idx
        if config.update_mode not in ("dense", "sparse"):
            raise ValueError(f"unknown update_mode {config.update_mode!r}")
        if (config.update_mode == "sparse"
                and config.objective not in _PAIR_OBJECTIVES):
            raise ValueError("update_mode='sparse' requires a pair "
                             "objective (transe, distmult or rotate)")
        self.model = KGEModel(
            graph.num_entities, max(graph.num_relations, 1),
            dim=config.dim, objective=config.objective, margin=config.margin,
            learning_rate=config.learning_rate,
            dtype=jnp.dtype(config.dtype),
        )

    def init(self):
        params, opt_state = self.model.init(self.config.seed)
        if self.config.update_mode == "sparse":
            opt_state = self.model.init_sparse_opt_state(params)
        return params, opt_state

    def _walk(self, targets, seed, tab_a, tab_b):
        from torch_random_walk_tpu.ops import fatwalk
        from torch_random_walk_tpu.ops.triples_walk import uniform_walk_triples

        cfg = self.config
        g = self.graph
        if g.triple_tab is not None:
            return fatwalk.uniform_walk_triples_fat(
                tab_a, tab_b, targets, cfg.walk_length, self.padding_idx,
                seed, g.num_entities, g.num_triples)
        return uniform_walk_triples(tab_a, tab_b, targets, cfg.walk_length,
                                    self.padding_idx, True, seed)

    def _step_impl(self, params, opt_state, targets, epoch, tab_a, tab_b,
                   triples):
        """Traced body of the fused step — shared with the mesh-sharded
        trainer (parallel/kge_trainer.py), whose own jit adds donation and
        shardings around the identical computation."""
        from torch_random_walk_tpu.ops.windows import (
            _triples_targets_and_windows, to_windows_triples,
            to_windows_triples_cbow)

        cfg = self.config
        seed = jnp.uint32(cfg.seed) + jnp.uint32(epoch) * jnp.uint32(0x9E3779B1)
        walks = self._walk(targets, seed, tab_a, tab_b)
        pad = self.padding_idx
        if cfg.objective in _PAIR_OBJECTIVES:
            pos, _ = _triples_targets_and_windows(walks, 1, pad)
            neg = corrupt_triples(pos, self.graph.num_entities,
                                  cfg.num_negatives, seed, epoch)
            step = (self.model.pair_train_step_sparse
                    if cfg.update_mode == "sparse"
                    else self.model.pair_train_step)
            return step(params, opt_state, pos, neg, pad)
        if cfg.objective == "skipgram":
            tgt, pw, nw = to_windows_triples(
                walks, cfg.window_size, self.graph.num_entities, pad,
                triples, seed)
            return self.model.skipgram_train_step(params, opt_state, tgt,
                                                  pw, nw, pad)
        pt, nt, win = to_windows_triples_cbow(
            walks, cfg.window_size, self.graph.num_entities, pad, triples,
            seed)
        return self.model.cbow_train_step(params, opt_state, pt, nt, win, pad)

    @partial(jax.jit, static_argnums=0)
    def _step(self, params, opt_state, targets, epoch, tab_a, tab_b, triples):
        return self._step_impl(params, opt_state, targets, epoch, tab_a,
                               tab_b, triples)

    def epoch_step(self, params, opt_state, targets, epoch):
        """One fused sample+train step; pure function of
        (config.seed, epoch, targets)."""
        g = self.graph
        if g.triple_tab is not None:
            tab_a, tab_b = g.triple_tab, g.node_meta
        else:
            tab_a, tab_b = g.triples, g.relation_tail_index
        return self._step(params, opt_state, targets, jnp.uint32(epoch),
                          tab_a, tab_b, g.triples)

    def train(self, num_epochs: int, batch_entities=None, log_every: int = 0):
        params, opt_state = self.init()
        if batch_entities is None:
            batch_entities = jnp.arange(self.graph.num_entities,
                                        dtype=jnp.int32)
        losses = []
        for epoch in range(num_epochs):
            params, opt_state, loss = self.epoch_step(
                params, opt_state, batch_entities, epoch)
            losses.append(float(loss))
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch}: loss {losses[-1]:.4f}")
        return params, np.array(losses)

    def embeddings(self, params):
        return self.model.entity_embeddings(params)
