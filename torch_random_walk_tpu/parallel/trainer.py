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


class ShardedNode2Vec:
    """node2vec trainer whose fused step is pjit-sharded over a 2-D mesh."""

    def __init__(self, graph: CSRGraph, mesh: Mesh,
                 config: ShardedNode2VecConfig = ShardedNode2VecConfig()):
        self.graph = graph
        self.mesh = mesh
        self.config = config
        self.model = SkipGramModel(
            graph.num_nodes, config.dim,
            optimizer=optax.adam(config.learning_rate),
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

    def init(self):
        """Initialize params + opt state already laid out on the mesh."""
        with jax.set_mesh(self.mesh):
            params, opt_state = self.model.init(self.config.seed)
        params = jax.tree.map(lambda x: jax.device_put(x, self._mp), params)
        opt_state = jax.tree.map(
            lambda x: jax.device_put(x, self._mp)
            if getattr(x, "ndim", 0) == 2 else x,
            opt_state,
        )
        return params, opt_state

    def _step(self, params, opt_state, targets, epoch):
        cfg = self.config
        seed = jnp.uint32(cfg.seed) + jnp.uint32(epoch) * jnp.uint32(0x9E3779B1)
        if cfg.p == 1.0 and cfg.q == 1.0:
            walks = uniform_walk_csr(self.row_ptr, self.col_idx, targets,
                                     cfg.walk_length, seed)
        else:
            walks = node2vec_walk_csr(self.row_ptr, self.col_idx, targets,
                                      cfg.p, cfg.q, cfg.walk_length, seed,
                                      search_iters=self.graph.search_iters)
        tgt, pos, neg = to_windows(walks, cfg.window_size,
                                   self.graph.num_nodes, seed)
        loss, grads = jax.value_and_grad(self.model.loss_fn)(
            params, tgt, pos, neg)
        updates, opt_state = self.model.optimizer.update(
            grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _jit_step(self, params, opt_state, targets, epoch):
        return self._step(params, opt_state, targets, epoch)

    def train_step(self, params, opt_state, target_nodes, epoch=0):
        """One fused sample+train step; target batch sharded over 'data'."""
        targets = jax.device_put(
            jnp.asarray(target_nodes, self.graph.col_idx.dtype), self._dp)
        with jax.set_mesh(self.mesh):
            return self._jit_step(params, opt_state, targets,
                                  jnp.uint32(epoch))
