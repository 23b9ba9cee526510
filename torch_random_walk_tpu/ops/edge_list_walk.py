"""Edge-list walks with padding/restart semantics (jnp/XLA path).

Re-creates ``walk_edge_list_cpu`` (/root/reference/csrc/cpu/rw_cpu_edge_list.cpp)
TPU-first.  Semantics kept:

- walks over an indexed edge list with a per-node [start, end]-inclusive
  range table; (-1, -1) rows mean no out-edges (dead end);
- a walker at a dead end moves to ``padding_idx``; a walker *at* padding
  moves to ``jump_node`` = target if ``restart`` else padding
  (rw_cpu_edge_list.cpp:100-122) — i.e. restart-at-source or
  absorbing-padding walks;
- biased (p/q) variant: candidate == t -> accept w.p. prob_0 (go back);
  candidate == padding -> accept w.p. prob_0, select jump; candidate a
  neighbor of t -> prob_1; else prob_2 (rw_cpu_edge_list.cpp:195-232).
  We use clean elif semantics where the reference has a bare-if quirk
  (SURVEY.md §2.4); distributions asserted against graph/oracle.py.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng


def uniform_walk_edge_list(edge_list, node_edge_index, target_nodes,
                           walk_length, seed, padding_idx, restart,
                           walker_offset=0):
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_EDGE_UNIFORM)
    dtype = edge_list.dtype
    cur0 = target_nodes.astype(dtype)
    pad = jnp.asarray(padding_idx, dtype)
    jump = cur0 if restart else jnp.full_like(cur0, pad)

    def step_fn(cur, step):
        c1 = jnp.full((num_walkers,), prng.step_round_counter(step), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        nxt = common.sample_edge_neighbor(edge_list, node_edge_index, cur,
                                          jump, padding_idx, bits)
        return nxt, nxt

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, cur0, steps)
    return jnp.concatenate([cur0[:, None], seq.T], axis=1)


def biased_walk_edge_list(edge_list, node_edge_index, target_nodes, p, q,
                          walk_length, seed, padding_idx, restart,
                          walker_offset=0,
                          search_iters=common.DEFAULT_SEARCH_ITERS,
                          max_rounds=common.DEFAULT_MAX_ROUNDS):
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_EDGE_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    dtype = edge_list.dtype
    cur0 = target_nodes.astype(dtype)
    pad = jnp.asarray(padding_idx, dtype)
    jump = cur0 if restart else jnp.full_like(cur0, pad)

    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    bits, _ = prng.counter_bits(key, wid, c1)
    first = common.sample_edge_neighbor(edge_list, node_edge_index, cur0,
                                        jump, padding_idx, bits)

    def rejection_step(carry, step):
        t, v = carry

        def cond(state):
            resolved, _, rnd = state
            return jnp.logical_and(~jnp.all(resolved), rnd < max_rounds)

        def body(state):
            resolved, sel, rnd = state
            c1 = jnp.full(
                (num_walkers,),
                prng.step_round_counter(step, rnd.astype(jnp.uint32)),
                jnp.uint32,
            )
            b_cand, b_acc = prng.counter_bits(key, wid, c1)
            cand = common.sample_edge_neighbor(edge_list, node_edge_index, v,
                                               jump, padding_idx, b_cand)
            r = prng.uniform_from_bits(b_acc)
            is_t = cand == t
            is_pad = cand == pad
            nbr_of_t = common.is_neighbor_edge(cand, t, edge_list,
                                               node_edge_index, padding_idx,
                                               search_iters)
            accept = jnp.where(
                is_t | is_pad,
                r < prob_0,
                jnp.where(nbr_of_t, r < prob_1, r < prob_2),
            )
            value = jnp.where(is_pad & ~is_t, jump, cand)
            sel = jnp.where(~resolved & accept, value, sel)
            return resolved | accept, sel, rnd + 1

        init = (jnp.zeros((num_walkers,), bool), v, jnp.int32(0))
        _, sel, _ = lax.while_loop(cond, body, init)
        return (v, sel), sel

    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(rejection_step, (cur0, first), steps)
    return jnp.concatenate([cur0[:, None], first[:, None], seq.T], axis=1)
