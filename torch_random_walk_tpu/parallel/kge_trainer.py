"""Multi-chip fused KG-embedding training: dp-sharded walkers x
feature-sharded entity/relation tables.

Same mesh layout as parallel.trainer.ShardedNode2Vec (and for the same
reasons — the reference has no distributed layer at all, SURVEY.md §2.8):

- walker/batch dimension sharded along "data": each chip samples its own
  block of triples walks and computes that block's loss; XLA psums the
  table gradients over "data" on ICI;
- entity AND relation tables sharded along "model" on the *feature*
  dimension (P(None, "model")): per-id gathers stay chip-local, and every
  objective's score contracts the feature axis (TransE norm, DistMult /
  composed-vector dot products), so the only "model" collective is a psum
  of (B,)-or-(B, K) scalars.

The fused step body is models.kge.KGEmbedding._step_impl — identical math
to the single-chip trainer, so the mesh run is bit-comparable to 1-device
(asserted in tests/test_kge_sharded.py).
"""

from __future__ import annotations

import dataclasses

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.graph.triples import TriplesGraph
from torch_random_walk_tpu.models.kge import KGEmbedding, KGEmbeddingConfig


@dataclasses.dataclass(frozen=True)
class ShardedKGEmbeddingConfig(KGEmbeddingConfig):
    data_axis: str = "data"
    model_axis: str = "model"


class ShardedKGEmbedding:
    """KG-embedding trainer whose fused step is sharded over a 2-D mesh."""

    def __init__(self, graph: TriplesGraph, mesh: Mesh,
                 config: ShardedKGEmbeddingConfig = ShardedKGEmbeddingConfig()):
        self.mesh = mesh
        self.config = config
        self.inner = KGEmbedding(graph, config)
        self.graph = graph
        self.model = self.inner.model
        self.padding_idx = self.inner.padding_idx
        self._repl = NamedSharding(mesh, P())
        self._dp = NamedSharding(mesh, P(config.data_axis))
        mp_spec = (P(None, config.model_axis)
                   if config.model_axis in mesh.axis_names else P())
        self._mp = NamedSharding(mesh, mp_spec)
        if config.model_axis in mesh.axis_names:
            msize = mesh.shape[config.model_axis]
            feat = (config.dim // 2 if config.objective == "rotate"
                    else config.dim)
            if feat % msize:
                raise ValueError(
                    f"feature dim {feat} (dim={config.dim}"
                    + (", rotate relations are dim/2 phases"
                       if config.objective == "rotate" else "")
                    + f") must divide the '{config.model_axis}' mesh axis "
                    f"size {msize} for P(None, '{config.model_axis}') "
                    "table sharding")
        # Graph tables replicated on every chip (dp strategy; beyond-HBM
        # graphs go through parallel.partition_v2 walks instead).
        if graph.triple_tab is not None:
            self._tabs = (jax.device_put(graph.triple_tab, self._repl),
                          jax.device_put(graph.node_meta, self._repl))
        else:
            self._tabs = (jax.device_put(graph.triples, self._repl),
                          jax.device_put(graph.relation_tail_index,
                                         self._repl))
        self._triples = jax.device_put(graph.triples, self._repl)

    def init(self):
        """Params + opt state laid out on the mesh (tables feature-sharded)."""
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

    @partial(jax.jit, static_argnums=0, donate_argnums=(1, 2))
    def _jit_step(self, params, opt_state, targets, epoch, tab_a, tab_b,
                  triples):
        return self.inner._step_impl(params, opt_state, targets, epoch,
                                     tab_a, tab_b, triples)

    def train_step(self, params, opt_state, target_entities, epoch=0):
        """One fused sample+train step; target batch sharded over 'data'.

        NOTE: params/opt_state are DONATED (always used in a rebind loop);
        keep rebinding the returned values.
        """
        targets = jax.device_put(
            jnp.asarray(target_entities, jnp.int32), self._dp)
        with jax.set_mesh(self.mesh):
            return self._jit_step(params, opt_state, targets,
                                  jnp.uint32(epoch), *self._tabs,
                                  self._triples)

    def embeddings(self, params):
        return self.model.entity_embeddings(params)
