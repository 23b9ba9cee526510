"""KG-triples relation-aware walks (jnp/XLA path).

Re-creates ``triples::walk_triples_cpu``
(/root/reference/csrc/cpu/rw_cpu_triples.cpp) TPU-first.  Semantics kept:

- walk layout ``[v0, r1, v1, r2, v2, ...]`` of width 2*walk_length + 1
  (rw_cpu_triples.cpp:119 shape contract);
- each step samples a (relation, tail) pair uniformly from the head's sorted
  triples range ([start, end] inclusive, -1 sentinel);
- padding is absorbing: once at padding every subsequent pair is
  (padding, padding) (rw_cpu_triples.cpp:38-42);
- ``restart`` is accepted and ignored, matching the reference's dead
  parameter (rw_cpu_triples.cpp:53 — SURVEY.md §2.5).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng


def uniform_walk_triples(triples, relation_tail_index, target_nodes,
                         walk_length, padding_idx, restart, seed,
                         walker_offset=0):
    del restart  # accepted but unused, matching the reference
    num_walkers = target_nodes.shape[0]
    num_entities = relation_tail_index.shape[0]
    num_triples = triples.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_TRIPLES)
    dtype = triples.dtype
    cur0 = target_nodes.astype(dtype)
    pad = jnp.asarray(padding_idx, dtype)

    def step_fn(cur, step):
        c1 = jnp.full((num_walkers,), prng.step_round_counter(step), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        is_pad = cur == pad
        safe = jnp.clip(cur, 0, max(num_entities - 1, 0))
        start = relation_tail_index[safe, 0]
        end = relation_tail_index[safe, 1]
        has = (start >= 0) & (end >= 0) & ~is_pad
        idx = common.sample_range_inclusive(
            jnp.maximum(start, 0), jnp.maximum(end, 0), bits
        )
        idx = jnp.clip(idx, 0, max(num_triples - 1, 0))
        rel = jnp.where(has, triples[idx, 1], pad)
        tail = jnp.where(has, triples[idx, 2], pad)
        return tail, (rel, tail)

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, (rels, tails) = lax.scan(step_fn, cur0, steps)
    # Interleave [v0, r1, v1, r2, v2, ...].
    walks = jnp.zeros((num_walkers, 2 * walk_length + 1), dtype)
    walks = walks.at[:, 0].set(cur0)
    walks = walks.at[:, 1::2].set(rels.T)
    walks = walks.at[:, 2::2].set(tails.T)
    return walks
