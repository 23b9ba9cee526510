"""node2vec p/q-biased CSR random walks (jnp/XLA path).

Re-creates ``biased_walk`` (/root/reference/csrc/cpu/rw_cpu.cpp:109-201,
csrc/cuda/rw_cuda.cu:100-184) TPU-first.  The reference runs an *unbounded
scalar rejection loop per walker*; that shape (data-dependent trip counts,
thread divergence) is hostile to a vector machine.  Here the whole frontier
does synchronized rejection *rounds*: each round is one vectorized
candidate-draw + acceptance test over every unresolved walker, inside a
``lax.while_loop`` that exits when all walkers resolved.  Acceptance per
round is >= min(1/p,1,1/q)/max(1/p,1,1/q) > 0 so the unresolved set shrinks
geometrically — typically 1-3 rounds.

Per-step transition law is exactly the node2vec distribution (verified
against graph/oracle.py in tests/test_walks_node2vec.py): conditional on
acceptance, P(x) ∝ multiplicity(x) * accept_prob(x).

The distance-1 test uses binary search over sorted rows (common.is_neighbor_csr)
instead of the reference's O(deg) scan.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng


def node2vec_walk_csr(row_ptr, col_idx, target_nodes, p, q, walk_length, seed,
                      walker_offset=0, search_iters=common.DEFAULT_SEARCH_ITERS,
                      max_rounds=common.DEFAULT_MAX_ROUNDS):
    """Batched node2vec walks; p, q are static Python floats."""
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    cur0 = target_nodes.astype(col_idx.dtype)

    # First hop is a plain uniform draw (rw_cpu.cpp:159).
    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    bits, _ = prng.counter_bits(key, wid, c1)
    first = common.sample_csr_neighbor(row_ptr, col_idx, cur0, bits)

    def rejection_step(carry, step):
        t, v = carry  # walk[step-2], walk[step-1]

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
            cand = common.sample_csr_neighbor(row_ptr, col_idx, v, b_cand)
            r = prng.uniform_from_bits(b_acc)
            is_t = cand == t
            nbr_of_t = common.is_neighbor_csr(cand, t, row_ptr, col_idx,
                                              search_iters)
            accept = jnp.where(
                is_t, r < prob_0, jnp.where(nbr_of_t, r < prob_1, r < prob_2)
            )
            sel = jnp.where(~resolved & accept, cand, sel)
            return resolved | accept, sel, rnd + 1

        init = (jnp.zeros((num_walkers,), bool), v, jnp.int32(0))
        _, sel, _ = lax.while_loop(cond, body, init)
        return (v, sel), sel

    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(rejection_step, (cur0, first), steps)
    return jnp.concatenate([cur0[:, None], first[:, None], seq.T], axis=1)
