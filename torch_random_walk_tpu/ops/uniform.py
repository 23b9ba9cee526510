"""Uniform CSR random walks (jnp/XLA path).

Re-creates ``uniform_walk`` (/root/reference/csrc/cpu/rw_cpu.cpp:58-107,
csrc/cuda/rw_cuda.cu:59-98) TPU-first: a ``lax.scan`` over walk steps where
every step advances the *entire* walker frontier with one vectorized CSR
gather + one threefry draw.  Output layout matches the reference: walks are
(num_walkers, walk_length + 1) with walks[:, 0] = target_nodes
(rw_cpu.cpp:216-217 shape contract).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng


def uniform_walk_csr(row_ptr, col_idx, target_nodes, walk_length, seed,
                     walker_offset=0):
    """Batched uniform walks.  Pure function of (graph, targets, seed)."""
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_CSR_UNIFORM)
    cur0 = target_nodes.astype(col_idx.dtype)

    def step_fn(cur, step):
        c1 = jnp.full((num_walkers,), prng.step_round_counter(step), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        nxt = common.sample_csr_neighbor(row_ptr, col_idx, cur, bits)
        return nxt, nxt

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, cur0, steps)
    return jnp.concatenate([cur0[:, None], seq.T], axis=1)
