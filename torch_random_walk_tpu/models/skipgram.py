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


class SkipGramModel:
    """Functional SGNS model; holds only static config, never parameters.

    ``dtype=jnp.bfloat16`` halves embedding-table HBM traffic (the fused
    train step is gather/scatter bound — BENCHLOG.md); logits and the loss
    always compute in float32.  Default stays float32.
    """

    def __init__(self, num_nodes: int, dim: int = 128,
                 optimizer: optax.GradientTransformation | None = None,
                 dtype=jnp.float32):
        self.num_nodes = num_nodes
        self.dim = dim
        self.dtype = dtype
        self.optimizer = optimizer or optax.adam(1e-3)

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
    def embeddings(params):
        return params["in_emb"]
