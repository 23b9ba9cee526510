"""CBOW embedding trainer with one negative per window.

Consumes the (pos_nodes, neg_nodes, context) batches of
ops.windows.to_windows_cbow: predict the center node from the mean of the
context embeddings, contrasted against the negative node.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax


class CBOWModel:
    def __init__(self, num_nodes: int, dim: int = 128,
                 optimizer: optax.GradientTransformation | None = None):
        self.num_nodes = num_nodes
        self.dim = dim
        self.optimizer = optimizer or optax.adam(1e-3)

    def init(self, seed: int = 0):
        key = jax.random.key(seed)
        k_in, _ = jax.random.split(key)
        scale = 1.0 / self.dim**0.5
        params = {
            "in_emb": jax.random.uniform(
                k_in, (self.num_nodes, self.dim), jnp.float32, -scale, scale
            ),
            "out_emb": jnp.zeros((self.num_nodes, self.dim), jnp.float32),
        }
        return params, self.optimizer.init(params)

    @staticmethod
    def loss_fn(params, pos_nodes, neg_nodes, context):
        ctx = params["in_emb"][context].mean(axis=1)    # (B, D)
        v_pos = params["out_emb"][pos_nodes]            # (B, D)
        v_neg = params["out_emb"][neg_nodes]            # (B, D)
        pos_logit = jnp.sum(ctx * v_pos, axis=-1)
        neg_logit = jnp.sum(ctx * v_neg, axis=-1)
        loss = -(jax.nn.log_sigmoid(pos_logit) + jax.nn.log_sigmoid(-neg_logit))
        return loss.mean()

    @partial(jax.jit, static_argnums=0)
    def train_step(self, params, opt_state, pos_nodes, neg_nodes, context):
        loss, grads = jax.value_and_grad(self.loss_fn)(
            params, pos_nodes, neg_nodes, context
        )
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @staticmethod
    def embeddings(params):
        return params["in_emb"]
