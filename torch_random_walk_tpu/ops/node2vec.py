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


def _count_in_row(row_ptr, col_idx, v, x, iters=common.DEFAULT_SEARCH_ITERS):
    """Vectorized multiplicity of ``x`` in v's sorted CSR row (two binary
    searches) — the per-state spike mass of the mixture sampler."""
    num_edges = col_idx.shape[0]
    if num_edges == 0:
        return jnp.zeros(v.shape, jnp.uint32)
    lo0 = row_ptr[v]
    end = row_ptr[v + 1]

    def bound(strict):
        def body(_, lh):
            lo, hi = lh
            active = lo < hi
            mid = (lo + hi) >> 1
            val = col_idx[jnp.clip(mid, 0, max(num_edges - 1, 0))]
            go_right = (val <= x) if strict else (val < x)
            new_lo = jnp.where(active & go_right, mid + 1, lo)
            new_hi = jnp.where(active & ~go_right, mid, hi)
            return new_lo, new_hi

        lo, _ = lax.fori_loop(0, iters, body, (lo0, end))
        return lo

    return (bound(True) - bound(False)).astype(jnp.uint32)


def node2vec_walk_csr_mixture(row_ptr, col_idx, target_nodes, p, q,
                              walk_length, seed, deg_bits,
                              walker_offset=0,
                              search_iters=common.DEFAULT_SEARCH_ITERS,
                              max_rounds=common.DEFAULT_MAX_ROUNDS):
    """jnp reference of the composition-envelope ("mixture") node2vec
    sampler — the bit-identity oracle for ops.fatwalk's free-running
    production engine (sampler="mixture").

    Same exact node2vec law as the rejection sampler (verified against
    graph/oracle.py), at roughly half the mean rounds: the rare return-to-t
    weight spike is sampled as an exact point mass instead of inflating the
    rejection envelope (see fatwalk._mixture_consts).  ``deg_bits`` must be
    the fat-table layout's degree field width (CSRGraph.layout.deg_bits) so
    the static integer scaling matches the TPU engine bit-for-bit.
    """
    from torch_random_walk_tpu.ops.fatwalk import _mixture_consts

    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    mi, ei, wt_i, w1_i, w2_i = _mixture_consts(p, q, deg_bits)
    cur0 = target_nodes.astype(col_idx.dtype)
    num_edges = col_idx.shape[0]

    def draw_pos(t, v, rnd, step):
        deg = (row_ptr[v + 1] - row_ptr[v]).astype(jnp.uint32)
        start = row_ptr[v]
        mult = _count_in_row(row_ptr, col_idx, v, t, search_iters)
        mult = jnp.minimum(mult, 0xFFFF)
        c1 = jnp.full((num_walkers,), 0, jnp.uint32) + prng.step_round_counter(
            step, rnd.astype(jnp.uint32))
        b_cand, _ = prng.counter_bits(key, wid, c1)
        g_spike = jnp.uint32(ei) * mult
        g_total = jnp.uint32(mi) * deg + g_spike
        pos = prng.mulhi32(b_cand, jnp.maximum(g_total, 1))
        dead = deg == 0
        spike = (pos < g_spike) & ~dead
        base = pos - g_spike
        off = (base // jnp.uint32(mi)).astype(start.dtype)
        sub = base % jnp.uint32(mi)
        idx = jnp.clip(start + off, 0, max(num_edges - 1, 0))
        cand = jnp.where(dead, v, jnp.where(spike, t, col_idx[idx]))
        return cand, spike, dead, sub

    # First hop: uniform over N(t0) via the same quotient draw (mult == 0
    # for a fresh walker, so the spike mass is zero).
    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    b_first, _ = prng.counter_bits(key, wid, c1)
    deg0 = (row_ptr[cur0 + 1] - row_ptr[cur0]).astype(jnp.uint32)
    pos0 = prng.mulhi32(b_first, jnp.maximum(jnp.uint32(mi) * deg0, 1))
    off0 = (pos0 // jnp.uint32(mi)).astype(row_ptr.dtype)
    idx0 = jnp.clip(row_ptr[cur0] + off0, 0, max(num_edges - 1, 0))
    first = jnp.where(deg0 == 0, cur0, col_idx[idx0])

    def mixture_step(carry, step):
        t, v = carry

        def cond(state):
            resolved, _, rnd = state
            return jnp.logical_and(~jnp.all(resolved), rnd < max_rounds)

        def body(state):
            resolved, sel, rnd = state
            cand, spike, dead, sub = draw_pos(t, v, rnd, step)
            is_t = cand == t
            nbr = common.is_neighbor_csr(cand, t, row_ptr, col_idx,
                                         search_iters)
            accept = (spike | dead
                      | jnp.where(is_t, sub < wt_i,
                                  jnp.where(nbr, sub < w1_i, sub < w2_i)))
            sel = jnp.where(~resolved & accept, cand, sel)
            return resolved | accept, sel, rnd + 1

        init = (jnp.zeros((num_walkers,), bool), v, jnp.int32(0))
        _, sel, _ = lax.while_loop(cond, body, init)
        return (v, sel), sel

    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(mixture_step, (cur0, first), steps)
    return jnp.concatenate([cur0[:, None], first[:, None], seq.T], axis=1)
