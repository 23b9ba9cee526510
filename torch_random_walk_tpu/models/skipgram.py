"""Skip-gram with negative sampling (SGNS) embedding trainer.

New capability required by BASELINE.json's north star (the reference stops at
batch generation — SURVEY.md §3.5: "the trainer itself is NOT in this repo").
Consumes exactly the (targets, pos_windows, neg_windows) batches produced by
ops.windows.to_windows, so the end-to-end DeepWalk/node2vec pipeline is
walk -> to_windows -> SkipGramModel.train_step.

TPU notes: parameters are two (num_nodes, dim) embedding tables; the loss is
batched dot products (VPU) over gathered rows.  Everything is functional
(params in / params out) so the train step jits, shards with NamedSharding
(batch along 'data', tables replicated or vocab-sharded along 'model'), and
differentiates without custom VJPs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax import lax


def sorted_unique_with_locations(x_flat, oob: int):
    """One sort -> (sorted unique ids OOB-padded at the tail, per-element
    locations into that unique array).

    Replaces ``jnp.unique(size=k)`` + ``jnp.searchsorted``: searchsorted is
    ~log2(k) *serialized* scalar-gather rounds over every query (~20 passes
    at k=1M — it alone cost several hundred ms of the r2 sparse train step
    on TPU), while the location array here falls out of the same sort that
    deduplicates, for one extra O(k) scatter.

    Returns (uids (k,) with unused slots == oob, loc (k,) int32) such that
    ``uids[loc] == x_flat`` and uids' occupied prefix is sorted unique.
    """
    x_flat = x_flat.ravel()
    k = x_flat.shape[0]
    sx, order = lax.sort((x_flat, jnp.arange(k, dtype=jnp.int32)),
                         num_keys=1)
    first = jnp.concatenate([jnp.ones((1,), bool), sx[1:] != sx[:-1]])
    upos = jnp.cumsum(first.astype(jnp.int32)) - 1
    loc = jnp.zeros((k,), jnp.int32).at[order].set(upos, unique_indices=True)
    # Duplicate writes land the same value; indices ascend with the sort.
    uids = jnp.full((k,), oob, x_flat.dtype).at[upos].set(
        sx, indices_are_sorted=True)
    return uids, loc


def scatter_rows(table, ids, rows, group: bool = True):
    """``table.at[ids].set(rows)`` for SORTED-UNIQUE ids padded with
    ``oob == table.shape[0]`` at the tail (dropped) — routed around the TPU
    narrow-row scatter cliff.

    Measured (v5e, 1.1M rows): (N, 128) tables scatter at 50-75M rows/s,
    but (N>=2M, 64) collapses to ~5M rows/s — scatters of rows narrower
    than the 128-element vector lane fall off the fast path on large
    tables.  When D < 128 (and divides it), scatter through a
    (N/g, g*D) grouped view instead: gather each touched GROUP row, blend
    every group member's new lanes in (ids are sorted, so a group's
    entries are consecutive; each entry merges its neighbors' lanes too,
    making duplicate group writes carry identical rows), and scatter the
    128-wide merged rows.  ~5x faster at D=64 despite the extra gather.

    Pass ``group=False`` when the table is FEATURE-SHARDED (the dp x mp
    trainer): the grouped (N/g, g*D) reshape crosses the sharded feature
    axis, so under P(None, "model") XLA must all-gather the whole table to
    materialize the view — measured ~10x MORE collective bytes per step
    than the dense path (benchmarks/trainer_traffic.py).  The narrow-row
    cliff on sharded pods needs a shard_map-local grouped view instead
    (future work); plain scatters are correct and traffic-optimal there.
    """
    n, d = table.shape
    g = 128 // d if (group and d < 128 and 128 % d == 0) else 1
    if g == 1 or n % g:
        return table.at[ids].set(rows, mode="drop", indices_are_sorted=True,
                                 unique_indices=True)
    view = table.reshape(n // g, g * d)
    valid = ids < n
    pid = jnp.minimum(ids, n) // g
    slot = ids % g
    grp_rows = jnp.where(valid[:, None], view[jnp.minimum(pid, n // g - 1)],
                         0)
    lane = jnp.repeat(jnp.arange(g)[None, :] == slot[:, None], d, axis=1)
    tiled = jnp.tile(rows, (1, g))
    merged = jnp.where(lane, tiled, grp_rows)
    for s in range(1, g):
        for sign in (1, -1):
            off = sign * s
            nb_same = jnp.roll(pid, off) == pid
            nb_valid = jnp.roll(valid, off)
            edge = jnp.arange(ids.shape[0])
            inside = (edge >= s) if sign == 1 else (edge < ids.shape[0] - s)
            take = (nb_same & nb_valid & valid & inside)[:, None]
            merged = jnp.where(take & jnp.roll(lane, off, axis=0),
                               jnp.roll(tiled, off, axis=0), merged)
    write = jnp.where(valid, pid, n // g)
    out = view.at[write].set(merged, mode="drop", indices_are_sorted=True)
    return out.reshape(n, d)


def shared_negative_ids(seed, num: int, num_nodes: int):
    """S uniform negative node ids from the (seed, STREAM_TRAIN) threefry
    stream — full-range via multiply-high (valid past 2^24 ids), and a pure
    function of ``seed`` so trainer runs stay deterministic."""
    from torch_random_walk_tpu.utils import prng

    key = prng.derive_key(seed, prng.STREAM_TRAIN)
    ids = jnp.arange(num, dtype=jnp.uint32)
    bits, _ = prng.counter_bits(key, ids, jnp.zeros_like(ids))
    return prng.randint_from_bits(bits, num_nodes).astype(jnp.int32)


class SkipGramModel:
    """Functional SGNS model; holds only static config, never parameters.

    ``dtype=jnp.bfloat16`` halves embedding-table HBM traffic (the fused
    train step is gather/scatter bound — BENCHLOG.md); logits and the loss
    always compute in float32.  Default stays float32.
    """

    def __init__(self, num_nodes: int, dim: int = 128,
                 optimizer: optax.GradientTransformation | None = None,
                 dtype=jnp.float32, learning_rate: float | None = None,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
        self.num_nodes = num_nodes
        self.dim = dim
        self.dtype = dtype
        # Adam hyperparameters for the touched-rows (lazy) step.  A custom
        # ``optimizer`` is opaque (optax transformations don't expose their
        # hyperparameters), so the sparse step refuses to run unless
        # ``learning_rate`` was passed explicitly alongside it — otherwise
        # the two steps would silently train at different rates.
        self._sparse_hparams_ok = optimizer is None or learning_rate is not None
        self.learning_rate = 1e-3 if learning_rate is None else learning_rate
        self.b1, self.b2, self.eps = b1, b2, eps
        self.optimizer = optimizer or optax.adam(self.learning_rate)

    def init(self, seed: int = 0):
        key = jax.random.key(seed)
        k_in, k_out = jax.random.split(key)
        scale = 1.0 / self.dim**0.5
        params = {
            "in_emb": jax.random.uniform(
                k_in, (self.num_nodes, self.dim), jnp.float32, -scale, scale
            ).astype(self.dtype),
            "out_emb": jnp.zeros((self.num_nodes, self.dim), self.dtype),
        }
        return params, self.optimizer.init(params)

    @staticmethod
    def loss_fn(params, targets, pos, neg):
        """NEG loss: -log σ(u·v⁺) - Σ log σ(-u·v⁻), averaged over the batch.

        targets: (B,) int; pos, neg: (B, C) int context/negative node ids.
        """
        u = params["in_emb"][targets]            # (B, D)
        v_pos = params["out_emb"][pos]           # (B, C, D)
        v_neg = params["out_emb"][neg]           # (B, C, D)
        pos_logit = jnp.einsum("bd,bcd->bc", u, v_pos,
                               preferred_element_type=jnp.float32)
        neg_logit = jnp.einsum("bd,bcd->bc", u, v_neg,
                               preferred_element_type=jnp.float32)
        loss = -(
            jax.nn.log_sigmoid(pos_logit).sum(axis=-1)
            + jax.nn.log_sigmoid(-neg_logit).sum(axis=-1)
        )
        return loss.mean()

    @partial(jax.jit, static_argnums=0)
    def train_step(self, params, opt_state, targets, pos, neg):
        loss, grads = jax.value_and_grad(self.loss_fn)(params, targets, pos, neg)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @staticmethod
    def walk_loss_fn(params, walks, neg_ids, window_size: int,
                     num_neg: int):
        """Blockwise SGNS over whole walks with batch-shared negatives.

        Computes the SAME (target, positive-context) pairs as
        ``ops.windows.to_windows`` + ``loss_fn`` — centers at walk positions
        W//2 .. L-W//2, contexts at offsets ±1..±W//2 — but in the TPU-native
        layout: each walk's rows are gathered ONCE ((B, L+1, D) instead of
        the window-expanded (13+104 rows)/walk), pos logits are 2*(W//2)
        shifted elementwise dot products (fused by XLA), and the
        ``num_neg``-negatives-per-window term is estimated with ``S``
        batch-shared uniform negatives (``neg_ids``) scaled by num_neg/S —
        a dense (B*C, D)x(D, S) matmul whose gradient is a dense (S, D)
        matrix, not 4 scattered rows per window.  Touched table rows drop
        ~7x (the fused step is scatter/gather-row bound — BENCHLOG.md).

        The negative TERM keeps the same expectation as the reference's
        per-window uniform negatives (windows_cpu.cpp:67-71, no collision
        check); only the estimator's variance differs.  Downstream quality
        is validated in benchmarks/quality_run.py.
        """
        length1 = walks.shape[1]
        hw = window_size // 2
        # Gather only the C=L+1-2*hw center rows for in_emb (the edge
        # positions are never centers): 24% fewer in-table gather rows
        # forward and scatter rows backward at W=5, bit-identical loss
        # and gradients.  out_emb needs every position (contexts).
        u = params["in_emb"][walks[:, hw: length1 - hw]]  # (B, C, D)
        out_rows = params["out_emb"][walks]      # (B, L+1, D)
        v_neg = params["out_emb"][neg_ids]       # (S, D)
        return SkipGramModel._blockwise_loss(u, out_rows, v_neg, hw, num_neg)

    @staticmethod
    def _blockwise_loss(u, out_rows, v_neg, hw: int, num_neg: int):
        """The blockwise SGNS math on already-gathered rows (shared by the
        dense and touched-rows train steps so both compute the identical
        loss/row-gradients)."""
        length1 = out_rows.shape[1]
        # Positive logits as 2*hw shifted elementwise dot products — only
        # the needed (B, C) diagonals, never the (B, L+1, L+1) gram matrix
        # (whose fp32 intermediate costs ~14% of the step at B=64K).
        pos_ls = 0.0
        for off in range(-hw, hw + 1):
            if off == 0:
                continue
            hi = length1 - hw + off
            v = out_rows[:, hw + off: hi if hi != 0 else None]  # (B, C, D)
            logit = jnp.einsum("bcd,bcd->bc", u, v,
                               preferred_element_type=jnp.float32)
            pos_ls = pos_ls + jax.nn.log_sigmoid(logit)
        neg_logit = jnp.einsum("bcd,sd->bcs", u, v_neg,
                               preferred_element_type=jnp.float32)
        neg_w = num_neg / v_neg.shape[0]
        loss = -(pos_ls
                 + neg_w * jax.nn.log_sigmoid(-neg_logit).sum(axis=-1))
        return loss.mean()

    @partial(jax.jit, static_argnums=(0, 5, 6))
    def walk_train_step(self, params, opt_state, walks, neg_ids,
                        window_size: int, num_neg: int):
        """Fused blockwise train step directly on (B, L+1) walk tensors."""
        loss, grads = jax.value_and_grad(self.walk_loss_fn)(
            params, walks, neg_ids, window_size, num_neg)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def init_sparse_opt_state(self, params):
        """State for ``walk_train_step_sparse``: fp32 first/second moments
        shaped like the tables, plus the global Adam step count."""
        zeros = jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), params)
        return {"mu": zeros,
                "nu": jax.tree.map(jnp.copy, zeros),
                "count": jnp.zeros((), jnp.int32)}

    @partial(jax.jit, static_argnums=(0, 5, 6, 7))
    def walk_train_step_sparse(self, params, opt_state, walks, neg_ids,
                               window_size: int, num_neg: int,
                               group_scatter: bool = True):
        """Blockwise train step with a TOUCHED-ROWS (lazy) Adam update.

        The dense step materializes full (N, D) gradient tables and runs
        Adam over every row each step; for vocabularies much larger than
        the rows a batch touches (ogbn-papers100M-class: N=111M vs ~2M
        touched at B=64K) that traffic dominates.  Here the loss is
        computed on gathered sub-tables (same math — _blockwise_loss — so
        loss and row-gradients are identical to the dense step), rows are
        deduplicated with a static-size sort, and Adam moments are
        gathered/updated/scattered for the touched rows only.

        SEMANTICS DIFFER from dense Adam for rows NOT in the batch: lazy
        Adam leaves their moments (and params) untouched, while dense Adam
        keeps applying decayed-momentum updates to every row each step.
        Bias correction uses the global step count.  Downstream-quality
        parity is validated in benchmarks/quality_run.py; rows touched on
        every step update identically to optax.adam
        (tests/test_skipgram.py::TestSparseAdam).  Moments are kept in fp32
        regardless of table dtype.
        """
        if not self._sparse_hparams_ok:
            raise ValueError(
                "walk_train_step_sparse uses the model's Adam "
                "hyperparameters, which cannot be read out of a custom "
                "optax optimizer; pass learning_rate= (and b1/b2/eps if "
                "non-default) explicitly to SkipGramModel alongside it")
        n = self.num_nodes
        length1 = walks.shape[1]
        hw = window_size // 2
        centers = walks[:, hw: length1 - hw]
        # Static-size dedup: sorted unique ids padded with n (out of
        # bounds) — the padded array doubles as the scatter index, OOB
        # rows drop.  Locations come from the SAME sort (one pass), not
        # from searchsorted (see sorted_unique_with_locations).
        in_ids, in_loc = sorted_unique_with_locations(centers.ravel(), n)
        in_loc = in_loc.reshape(centers.shape)
        out_flat = jnp.concatenate([walks.ravel(), neg_ids])
        out_ids, out_loc_flat = sorted_unique_with_locations(out_flat, n)
        out_loc = out_loc_flat[: walks.size].reshape(walks.shape)
        neg_loc = out_loc_flat[walks.size:]
        in_safe = jnp.minimum(in_ids, n - 1)
        out_safe = jnp.minimum(out_ids, n - 1)
        subs = {"in": params["in_emb"][in_safe],
                "out": params["out_emb"][out_safe]}

        def sub_loss(subs):
            return SkipGramModel._blockwise_loss(
                subs["in"][in_loc], subs["out"][out_loc],
                subs["out"][neg_loc], hw, num_neg)

        loss, g = jax.value_and_grad(sub_loss)(subs)

        mu, nu = dict(opt_state["mu"]), dict(opt_state["nu"])
        count = opt_state["count"] + 1
        c = count.astype(jnp.float32)
        params = dict(params)
        for name, ids, safe, sub, grad in (
                ("in_emb", in_ids, in_safe, subs["in"], g["in"]),
                ("out_emb", out_ids, out_safe, subs["out"], g["out"])):
            g32 = grad.astype(jnp.float32)
            mu_new = self.b1 * mu[name][safe] + (1.0 - self.b1) * g32
            nu_new = self.b2 * nu[name][safe] + (1.0 - self.b2) * (g32 * g32)
            # optax.scale_by_adam's formula (eps_root = 0).
            mu_hat = mu_new / (1.0 - self.b1 ** c)
            nu_hat = nu_new / (1.0 - self.b2 ** c)
            upd = self.learning_rate * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
            # ``sub`` already holds the gathered param rows — no second
            # M-row gather for the update.
            rows = (sub.astype(jnp.float32) - upd).astype(params[name].dtype)
            # ids are sorted with the OOB pads (== n) at the tail;
            # scatter_rows routes around the narrow-row scatter cliff.
            params[name] = scatter_rows(params[name], ids, rows,
                                        group=group_scatter)
            mu[name] = scatter_rows(mu[name], ids, mu_new,
                                    group=group_scatter)
            nu[name] = scatter_rows(nu[name], ids, nu_new,
                                    group=group_scatter)
        return params, {"mu": mu, "nu": nu, "count": count}, loss

    @staticmethod
    def embeddings(params):
        return params["in_emb"]
