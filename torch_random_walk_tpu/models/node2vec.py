"""End-to-end node2vec/DeepWalk pipeline: walk -> windows -> SGNS training.

The fused epoch step (sample + window + SGNS update in ONE jitted function)
is the flagship training path: XLA fuses the whole chain so walks and windows
never round-trip through host memory — the TPU-native replacement for the
reference's intended pipeline (SURVEY.md §3.5) where walk tensors are
materialized and handed to an external trainer.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.models.skipgram import SkipGramModel
from torch_random_walk_tpu.ops.node2vec import node2vec_walk_csr
from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
from torch_random_walk_tpu.ops.windows import to_windows


@dataclasses.dataclass(frozen=True)
class Node2VecConfig:
    dim: int = 128
    walk_length: int = 40
    window_size: int = 5
    walks_per_node: int = 1
    p: float = 1.0
    q: float = 1.0
    learning_rate: float = 1e-2
    seed: int = 0
    dtype: str = "float32"  # "bfloat16" halves table HBM for ogbn-scale runs
    # "block" = blockwise SGNS on whole walks with batch-shared negatives
    # (SkipGramModel.walk_train_step — the fast TPU-native layout);
    # "windows" = materialized to_windows batches with per-window negatives
    # (exact reference-shaped pipeline).  Same positive pairs either way.
    train_mode: str = "block"
    # S per step in "block" mode.  The (B, C, S) neg-logit intermediates are
    # pure HBM elementwise traffic: S=1024 costs ~24ms/step more than S=256
    # at the bench shape for no measurable quality gain (QUALITY.md).
    shared_negatives: int = 256
    # "dense" = optax.adam over the full tables each step; "sparse" =
    # touched-rows lazy Adam (SkipGramModel.walk_train_step_sparse) — the
    # optimizer/gradient traffic scales with the batch's unique rows
    # instead of the vocabulary (the ogbn-papers100M-class regime).
    # "block" train_mode only.
    update_mode: str = "dense"
    # Distribution of the batch-shared negatives in "block" mode:
    # "uniform" (reference parity — windows_cpu.cpp:67-71) or "degree75"
    # (word2vec's unigram^{3/4} table, sampled O(1)/draw via alias tables
    # — utils/alias.py).  Windows-mode negatives stay uniform always.
    negative_distribution: str = "uniform"


class Node2Vec:
    """node2vec embedding trainer over a CSRGraph."""

    def __init__(self, graph: CSRGraph, config: Node2VecConfig = Node2VecConfig()):
        self.graph = graph
        self.config = config
        if config.update_mode not in ("dense", "sparse"):
            raise ValueError(f"unknown update_mode {config.update_mode!r}")
        if config.update_mode == "sparse" and config.train_mode != "block":
            raise ValueError("update_mode='sparse' requires "
                             "train_mode='block'")
        if config.negative_distribution not in ("uniform", "degree75"):
            raise ValueError("unknown negative_distribution "
                             f"{config.negative_distribution!r}")
        if (config.negative_distribution != "uniform"
                and config.train_mode != "block"):
            raise ValueError("negative_distribution='degree75' requires "
                             "train_mode='block' (windows-mode negatives "
                             "are reference-parity uniform)")
        self._neg_tabs = None
        if config.negative_distribution == "degree75":
            from torch_random_walk_tpu.utils.alias import (
                build_alias,
                degree75_weights,
            )

            self._neg_tabs = build_alias(degree75_weights(graph.row_ptr))
        self.model = SkipGramModel(
            graph.num_nodes, config.dim,
            optimizer=optax.adam(config.learning_rate),
            dtype=jnp.dtype(config.dtype),
            learning_rate=config.learning_rate,
        )

    def init(self):
        params, opt_state = self.model.init(self.config.seed)
        if self.config.update_mode == "sparse":
            opt_state = self.model.init_sparse_opt_state(params)
        return params, opt_state

    # Jitted steps take the graph tables as ARGUMENTS — closed-over arrays
    # would bake into the compiled program as constants.

    # NOTE: params/opt_state are deliberately NOT donated here — ad-hoc
    # callers may invoke the step repeatedly with the same buffers
    # (donation would invalidate them after the first call).  Rebind-loop
    # callers that need the halved peak memory wrap it in a donating jit
    # (bench.py::time_train_chained — required at the 2M-node bench shape
    # on a 16 GB chip); the sharded trainer (parallel/trainer.py), whose
    # train_step is always used in a rebind loop, donates directly.
    def _fat_step_impl(self, params, opt_state, targets, epoch, edge_tab,
                       node_tab, hash_table, fat6=None, neg_tabs=None):
        cfg = self.config
        seed = jnp.uint32(cfg.seed) + jnp.uint32(epoch) * jnp.uint32(0x9E3779B1)
        from torch_random_walk_tpu.ops import fatwalk
        from torch_random_walk_tpu.ops.fatwalk import FatMeta

        meta = FatMeta.of(self.graph)
        if cfg.p == 1.0 and cfg.q == 1.0:
            walks = fatwalk.uniform_walk_fat(edge_tab, node_tab, targets,
                                             meta, cfg.walk_length, seed)
        else:
            es = self._edge_set
            walks = fatwalk.node2vec_walk_fat(edge_tab, node_tab, hash_table,
                                              targets, meta, es.log_size,
                                              es.salt, cfg.p, cfg.q,
                                              cfg.walk_length, seed,
                                              fat6=fat6)
        return self._train(params, opt_state, walks, seed, neg_tabs)

    # Donated twins: same traced function, params/opt_state buffers donated.
    # Donation must live on THIS jit boundary — an outer donating jit around
    # epoch_step would close over the graph tables and bake them into the
    # HLO as constants (the 2M-node edge_tab alone exceeds the axon
    # remote-compile request limit, observed 2026-08-19).
    _fat_step = partial(jax.jit, static_argnums=0)(_fat_step_impl)
    _fat_step_donated = partial(jax.jit, static_argnums=0,
                                donate_argnums=(1, 2))(_fat_step_impl)

    def _train(self, params, opt_state, walks, seed, neg_tabs=None):
        cfg = self.config
        if cfg.train_mode == "block":
            neg_ids = self._shared_negatives(seed, neg_tabs)
            step = (self.model.walk_train_step_sparse
                    if cfg.update_mode == "sparse"
                    else self.model.walk_train_step)
            return step(params, opt_state, walks, neg_ids, cfg.window_size,
                        cfg.window_size - 1)
        tgt, pos, neg = to_windows(walks, cfg.window_size,
                                   self.graph.num_nodes, seed)
        return self.model.train_step(params, opt_state, tgt, pos, neg)

    def _shared_negatives(self, seed, neg_tabs=None):
        if neg_tabs is not None:
            from torch_random_walk_tpu.utils.alias import (
                shared_negative_ids_alias,
            )

            return shared_negative_ids_alias(
                seed, self.config.shared_negatives, *neg_tabs)
        from torch_random_walk_tpu.models.skipgram import shared_negative_ids

        return shared_negative_ids(seed, self.config.shared_negatives,
                                   self.graph.num_nodes)

    def _jnp_step_impl(self, params, opt_state, targets, epoch, row_ptr,
                       col_idx, neg_tabs=None):
        cfg = self.config
        seed = jnp.uint32(cfg.seed) + jnp.uint32(epoch) * jnp.uint32(0x9E3779B1)
        if cfg.p == 1.0 and cfg.q == 1.0:
            walks = uniform_walk_csr(row_ptr, col_idx, targets,
                                     cfg.walk_length, seed)
        else:
            walks = node2vec_walk_csr(row_ptr, col_idx, targets, cfg.p,
                                      cfg.q, cfg.walk_length, seed,
                                      search_iters=self.graph.search_iters)
        return self._train(params, opt_state, walks, seed, neg_tabs)

    _jnp_step = partial(jax.jit, static_argnums=0)(_jnp_step_impl)
    _jnp_step_donated = partial(jax.jit, static_argnums=0,
                                donate_argnums=(1, 2))(_jnp_step_impl)

    def epoch_step(self, params, opt_state, targets, epoch, donate=False):
        """One fused sample+train step over a batch of start nodes.

        ``epoch`` perturbs the walk seed so every epoch samples fresh walks;
        determinism is retained: the whole run is a pure function of
        (config.seed, epoch, targets).

        ``donate=True`` donates the params/opt_state buffers (halves peak
        HBM across the update — required for 2M-row fp32 Adam moments on a
        16 GB chip); the caller must rebind them to the returned values.
        """
        g = self.graph
        cfg = self.config
        if g.edge_tab is not None:
            bt = None
            if cfg.p == 1.0 and cfg.q == 1.0:
                ht = g.edge_tab[:1]  # placeholder; unused on the uniform path
            else:
                from torch_random_walk_tpu.ops.walk import edge_set_for, fat6_for

                self._edge_set = edge_set_for(g)
                ht = self._edge_set.table
                # Freerun mixture engine at every batch size (same bitstream
                # rule as ops.walk.walk — sampler choice must not depend on
                # batch size).
                bt = fat6_for(g)
            step = self._fat_step_donated if donate else self._fat_step
            return step(params, opt_state, targets, epoch,
                        g.edge_tab, g.node_tab, ht, bt, self._neg_tabs)
        step = self._jnp_step_donated if donate else self._jnp_step
        return step(params, opt_state, targets, epoch, g.row_ptr,
                    g.col_idx, self._neg_tabs)

    def train(self, num_epochs: int, batch_nodes=None, log_every: int = 0):
        """Simple training loop; returns (params, losses)."""
        params, opt_state = self.init()
        if batch_nodes is None:
            batch_nodes = jnp.arange(self.graph.num_nodes, dtype=jnp.int32)
        batch_nodes = jnp.tile(batch_nodes, self.config.walks_per_node)
        losses = []
        for epoch in range(num_epochs):
            params, opt_state, loss = self.epoch_step(
                params, opt_state, batch_nodes, jnp.uint32(epoch)
            )
            losses.append(float(loss))
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch}: loss {losses[-1]:.4f}")
        return params, np.array(losses)

    def embeddings(self, params):
        return self.model.embeddings(params)
