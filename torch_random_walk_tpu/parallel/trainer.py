"""Multi-chip fused node2vec training: dp-sharded walkers x model-sharded tables.

The flagship scale-out path (SURVEY.md §2.8 "new framework" requirements).
One jitted step runs the whole chain — walk sampling, window generation and
the SGNS update — under a 2-D ("data", "model") mesh:

- walker/batch dimension sharded along "data": each chip samples and trains
  on its own walker block; gradients for the (replicated-in-"data") tables
  are combined by XLA with a psum over "data" riding ICI;
- embedding tables sharded along "model" on the *feature* dimension
  (P(None, "model")): per-node gathers stay chip-local (no vocab all-gather);
  the NEG-loss dot products contract the feature axis, so XLA inserts one
  psum over "model" for the logits — the cheapest collective placement for
  SGNS (logits are (B, C) scalars vs (B, C, D) vectors).

The reference has no distributed layer at all (SURVEY.md §2.8: single-process,
walker-per-CUDA-thread only — /root/reference/csrc/cuda/rw_cuda.cu:69).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.models.skipgram import SkipGramModel
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.ops.windows import to_windows


@dataclasses.dataclass(frozen=True)
class ShardedNode2VecConfig:
    dim: int = 128
    walk_length: int = 40
    window_size: int = 5
    p: float = 1.0
    q: float = 1.0
    learning_rate: float = 1e-2
    seed: int = 0
    data_axis: str = "data"
    model_axis: str = "model"
    # "block" = blockwise SGNS on whole walks with batch-shared negatives
    # (models/skipgram.walk_loss_fn); "windows" = materialized to_windows
    # batches with per-window negatives.  Same positive pairs either way;
    # block is ~1.8x faster (BENCHLOG.md "Blockwise SGNS") and its dense
    # (S, D) negative gradient shards cleanly on the feature axis.
    train_mode: str = "block"
    shared_negatives: int = 256
    # "uniform" (reference parity) or "degree75" (word2vec unigram^{3/4}
    # via alias tables) for the block-mode shared negatives.
    negative_distribution: str = "uniform"
    # "sparse" = touched-rows lazy Adam (SkipGramModel.walk_train_step_
    # sparse) under SPMD: the batch's unique row ids are global (XLA
    # all-gathers the dp-sharded walk ids for the sort), sub-table
    # gradients psum over 'data', and the row gathers/scatters stay local
    # to each feature shard — the optimizer traffic scales with the batch
    # instead of the vocabulary, which is what makes
    # ogbn-papers100M-class tables (111M rows) trainable at all.
    # "block" train_mode only.
    update_mode: str = "dense"


class ShardedNode2Vec:
    """node2vec trainer whose fused step is pjit-sharded over a 2-D mesh."""

    def __init__(self, graph: CSRGraph, mesh: Mesh,
                 config: ShardedNode2VecConfig = ShardedNode2VecConfig()):
        self.graph = graph
        self.mesh = mesh
        self.config = config
        if config.update_mode not in ("dense", "sparse"):
            raise ValueError(f"unknown update_mode {config.update_mode!r}")
        if config.update_mode == "sparse" and config.train_mode != "block":
            raise ValueError("update_mode='sparse' requires "
                             "train_mode='block'")
        if (config.negative_distribution != "uniform"
                and config.train_mode != "block"):
            raise ValueError("negative_distribution='degree75' requires "
                             "train_mode='block'")
        self.model = SkipGramModel(
            graph.num_nodes, config.dim,
            optimizer=optax.adam(config.learning_rate),
            learning_rate=config.learning_rate,
        )
        c = config
        self._repl = NamedSharding(mesh, P())
        self._dp = NamedSharding(mesh, P(c.data_axis))
        # Tables shard on the feature axis when the mesh has a model axis;
        # on a pure-dp mesh they stay replicated.
        mp_spec = (P(None, c.model_axis) if c.model_axis in mesh.axis_names
                   else P())
        self._mp = NamedSharding(mesh, mp_spec)
        # Graph structure replicated on every chip (the dp strategy; for
        # graphs beyond per-chip HBM use parallel.partition instead).
        self.row_ptr = jax.device_put(graph.row_ptr, self._repl)
        self.col_idx = jax.device_put(graph.col_idx, self._repl)
        self._use_fat = graph.edge_tab is not None
        if self._use_fat:
            self.edge_tab = jax.device_put(graph.edge_tab, self._repl)
            self.node_tab = jax.device_put(graph.node_tab, self._repl)
            if not (config.p == 1.0 and config.q == 1.0):
                from torch_random_walk_tpu.ops.walk import edge_set_for, fat6_for

                self._edge_set = edge_set_for(graph)
                self.hash_table = jax.device_put(self._edge_set.table,
                                                 self._repl)
                # Wide fat tables for the freerun mixture engine — the same
                # bitstream as single-chip ops.walk.walk (sampler choice
                # must not depend on entry point or batch size).
                e6, n6 = fat6_for(graph)
                self.fat6 = (jax.device_put(e6, self._repl),
                             jax.device_put(n6, self._repl))
            else:
                self.hash_table = self.edge_tab[:1]  # unused placeholder
                self.fat6 = (self.edge_tab[:1], self.edge_tab[:1])
        self.neg_tabs = None
        if config.negative_distribution == "degree75":
            from torch_random_walk_tpu.utils.alias import (
                build_alias,
                degree75_weights,
            )

            prob, alias = build_alias(degree75_weights(graph.row_ptr))
            self.neg_tabs = (jax.device_put(prob, self._repl),
                             jax.device_put(alias, self._repl))

    def init(self):
        """Initialize params + opt state already laid out on the mesh."""
        with jax.set_mesh(self.mesh):
            params, opt_state = self.model.init(self.config.seed)
            if self.config.update_mode == "sparse":
                opt_state = self.model.init_sparse_opt_state(params)
        params = jax.tree.map(lambda x: jax.device_put(x, self._mp), params)
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, self._mp)
            if getattr(x, "ndim", 0) == 2 else x,
            opt_state,
        )
        return params, opt_state

    def _sample(self, targets, seed, g1, g2, g3, g4, g5):
        """Walk sampling inside the jitted step; graph tables arrive as
        arguments (g1..g5), never closed over."""
        cfg = self.config
        if self._use_fat:
            from torch_random_walk_tpu.ops import fatwalk
            from torch_random_walk_tpu.ops.fatwalk import FatMeta

            meta = FatMeta.of(self.graph)
            if cfg.p == 1.0 and cfg.q == 1.0:
                return fatwalk.uniform_walk_fat(g1, g2, targets, meta,
                                                cfg.walk_length, seed)
            es = self._edge_set
            return fatwalk.node2vec_walk_fat(g1, g2, g3, targets, meta,
                                             es.log_size, es.salt, cfg.p,
                                             cfg.q, cfg.walk_length, seed,
                                             fat6=(g4, g5))
        if cfg.p == 1.0 and cfg.q == 1.0:
            return uniform_walk_csr(g1, g2, targets, cfg.walk_length, seed)
        return node2vec_walk_csr(g1, g2, targets, cfg.p, cfg.q,
                                 cfg.walk_length, seed,
                                 search_iters=self.graph.search_iters)

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _jit_step(self, params, opt_state, targets, epoch, g1, g2, g3, g4,
                  g5, neg_tabs=None):
        cfg = self.config
        seed = jnp.uint32(cfg.seed) + jnp.uint32(epoch) * jnp.uint32(0x9E3779B1)
        walks = self._sample(targets, seed, g1, g2, g3, g4, g5)
        if cfg.train_mode == "block":
            if neg_tabs is not None:
                from torch_random_walk_tpu.utils.alias import (
                    shared_negative_ids_alias,
                )

                neg_ids = shared_negative_ids_alias(
                    seed, cfg.shared_negatives, *neg_tabs)
            else:
                from torch_random_walk_tpu.models.skipgram import (
                    shared_negative_ids,
                )

                neg_ids = shared_negative_ids(seed, cfg.shared_negatives,
                                              self.graph.num_nodes)
            if cfg.update_mode == "sparse":
                # Touched-rows lazy Adam: inlines under this jit, so XLA
                # lays out the id sort/psum and the feature-local row
                # scatters over the same mesh as the dense path.
                # group_scatter only when the model axis is trivial: the
                # grouped narrow-row-scatter view reshapes across the
                # sharded feature axis and costs a full-table all-gather
                # under P(None, model) — ~10x the dense step's collective
                # bytes (trainer_traffic.py).  Pure data-parallel meshes
                # (model-axis size 1) keep no feature sharding, so they
                # keep the ~5x grouped-scatter win (ADVICE r4).
                mp_size = dict(self.mesh.shape).get(cfg.model_axis, 1)
                return self.model.walk_train_step_sparse(
                    params, opt_state, walks, neg_ids, cfg.window_size,
                    cfg.window_size - 1, group_scatter=(mp_size == 1))
            loss, grads = jax.value_and_grad(self.model.walk_loss_fn)(
                params, walks, neg_ids, cfg.window_size,
                cfg.window_size - 1)
        else:
            tgt, pos, neg = to_windows(walks, cfg.window_size,
                                       self.graph.num_nodes, seed)
            loss, grads = jax.value_and_grad(self.model.loss_fn)(
                params, tgt, pos, neg)
        updates, opt_state = self.model.optimizer.update(
            grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def train_step(self, params, opt_state, target_nodes, epoch=0):
        """One fused sample+train step; target batch sharded over 'data'."""
        targets = jax.device_put(
            jnp.asarray(target_nodes, jnp.int32), self._dp)
        if self._use_fat:
            g1, g2, g3 = self.edge_tab, self.node_tab, self.hash_table
            g4, g5 = self.fat6
        else:
            g1, g2, g3 = self.row_ptr, self.col_idx, self.row_ptr[:1]
            g4, g5 = g3, g3
        with jax.set_mesh(self.mesh):
            return self._jit_step(params, opt_state, targets,
                                  jnp.uint32(epoch), g1, g2, g3, g4, g5,
                                  self.neg_tabs)
