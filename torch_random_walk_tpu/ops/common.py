"""Shared vectorized sampling primitives for all walk kernels.

TPU design stance (SURVEY.md §7): the reference is scalar-sequential per
walker (one CUDA thread chases one walk, /root/reference/csrc/cuda/rw_cuda.cu:69);
we invert to *step-synchronous walker-major batches* — every primitive here
operates on a whole (num_walkers,) frontier at once so each walk step compiles
to dense vectorized gathers + elementwise math on the VPU, with no
data-dependent Python control flow.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.utils import prng

# Static trip count for binary search: covers any row of < 2^31 edges.
DEFAULT_SEARCH_ITERS = 32
# Rejection-round cap.  Acceptance probability per round is
# >= min(1/p, 1, 1/q) / max(1/p, 1, 1/q) > 0, so unresolved walkers vanish
# geometrically; 4096 rounds is astronomically beyond need and bounds the
# while_loop for the compiler.
DEFAULT_MAX_ROUNDS = 4096


def compact_indices(mask, capacity: int):
    """Indices of the first ``capacity`` True lanes of ``mask``, padded with
    the sentinel ``mask.shape[0]``.

    One cumsum + one scatter — THE compaction primitive of the framework:
    the single-chip straggler drain (ops/fatwalk.py) and the routed-exchange
    outbox/carry builder (parallel/partition_v2.py) both address records
    through it, so its zero-drop property (every True lane with rank <
    capacity is selected, in order) is safety-critical and pinned by
    tests/test_aux.py::test_compact_indices.
    """
    num = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    write = jnp.where(mask & (pos < capacity), pos, capacity)
    buf = jnp.full((capacity + 1,), num, jnp.int32)
    buf = buf.at[write].set(jnp.arange(num, dtype=jnp.int32))
    return buf[:capacity]


def sample_csr_neighbor(row_ptr, col_idx, cur, bits):
    """Vectorized uniform neighbor draw over CSR rows.

    Reference semantics (rw_cpu.cpp:7-30): pick a uniform out-edge of ``cur``.
    Degree-0 rows stay at ``cur`` (defined behavior replacing the reference's
    ``rand() % 0`` UB — SURVEY.md §5 known-bugs list).  A graph with no edges
    at all leaves every walker in place.
    """
    num_edges = col_idx.shape[0]
    if num_edges == 0:
        return cur
    start = row_ptr[cur]
    deg = row_ptr[cur + 1] - start
    off = prng.randint_from_bits(bits, jnp.maximum(deg, 1))
    idx = jnp.clip(start + off.astype(start.dtype), 0, max(num_edges - 1, 0))
    nxt = col_idx[idx]
    return jnp.where(deg > 0, nxt, cur)


def is_neighbor_csr(cand, t, row_ptr, col_idx, iters=DEFAULT_SEARCH_ITERS):
    """Vectorized membership test: is ``cand`` an out-neighbor of ``t``?

    Binary search over the sorted CSR row of ``t`` — O(log deg) per walker
    replacing the reference's O(deg) linear scan (rw_cpu.cpp:32-56).
    Requires col_idx sorted within rows (CSRGraph builders guarantee it).
    """
    num_edges = col_idx.shape[0]
    if num_edges == 0:
        return jnp.zeros(cand.shape, bool)
    lo = row_ptr[t]
    end = row_ptr[t + 1]

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) >> 1
        val = col_idx[jnp.clip(mid, 0, max(num_edges - 1, 0))]
        go_right = val < cand
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, _ = lax.fori_loop(0, iters, body, (lo, end))
    at = col_idx[jnp.clip(lo, 0, max(num_edges - 1, 0))]
    return (lo < end) & (at == cand)


def node2vec_accept_probs(p: float, q: float):
    """Normalized node2vec rejection acceptance probabilities
    (rw_cpu.cpp:129-134): prob_0 (return to t), prob_1 (distance 1),
    prob_2 (distance 2)."""
    max_prob = max(1.0 / p, 1.0, 1.0 / q)
    return 1.0 / p / max_prob, 1.0 / max_prob, 1.0 / q / max_prob


def sample_range_inclusive(ranges_start, ranges_end, bits):
    """Uniform index in [start, end] inclusive (cpu_utils.cpp:3-9 contract).
    Caller must mask out the -1 sentinel rows."""
    cnt = ranges_end - ranges_start + 1
    off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
    return ranges_start + off.astype(ranges_start.dtype)


def sample_edge_neighbor(edge_list, node_edge_index, cur, jump, padding_idx, bits):
    """Vectorized uniform edge-list step (rw_cpu_edge_list.cpp:8-35):
    cur == padding -> jump; no out-edges (-1 range) -> padding;
    else tail of a uniform out-edge."""
    num_nodes = node_edge_index.shape[0]
    num_edges = edge_list.shape[0]
    pad = jnp.asarray(padding_idx, cur.dtype)
    is_pad = cur == pad
    safe = jnp.clip(cur, 0, max(num_nodes - 1, 0))
    start = node_edge_index[safe, 0]
    end = node_edge_index[safe, 1]
    has_edges = (start >= 0) & (end >= 0)
    idx = sample_range_inclusive(jnp.maximum(start, 0), jnp.maximum(end, 0), bits)
    tail = edge_list[jnp.clip(idx, 0, max(num_edges - 1, 0)), 1]
    nxt = jnp.where(has_edges, tail, pad)
    return jnp.where(is_pad, jump, nxt)


def is_neighbor_edge(cand, t, edge_list, node_edge_index, padding_idx,
                     iters=DEFAULT_SEARCH_ITERS):
    """Membership test over the edge list: does t have an out-edge to cand?

    Binary search over tails in t's [start, end]-inclusive range (builders
    sort by (head, tail)).  Implements the *correct* inclusive range — the
    reference scans end-exclusive and misses the last out-edge
    (rw_cpu_edge_list.cpp:51, SURVEY.md §2.4).  t == padding -> False.
    """
    num_nodes = node_edge_index.shape[0]
    num_edges = edge_list.shape[0]
    pad = jnp.asarray(padding_idx, t.dtype)
    safe = jnp.clip(t, 0, max(num_nodes - 1, 0))
    start = node_edge_index[safe, 0]
    end_incl = node_edge_index[safe, 1]
    valid = (t != pad) & (start >= 0) & (end_incl >= 0)
    lo = jnp.maximum(start, 0)
    end = jnp.maximum(end_incl, 0) + 1  # exclusive bound over a sorted segment

    def body(_, lh):
        lo, hi = lh
        active = lo < hi
        mid = (lo + hi) >> 1
        val = edge_list[jnp.clip(mid, 0, max(num_edges - 1, 0)), 1]
        go_right = val < cand
        new_lo = jnp.where(active & go_right, mid + 1, lo)
        new_hi = jnp.where(active & ~go_right, mid, hi)
        return new_lo, new_hi

    lo, _ = lax.fori_loop(0, iters, body, (lo, end))
    at = edge_list[jnp.clip(lo, 0, max(num_edges - 1, 0)), 1]
    return valid & (lo < end) & (at == cand)


def walker_ids(num_walkers, offset=0):
    """Global walker ids: the PRNG identity of each walker.  ``offset`` lets
    sharded launches preserve the single-launch bitstream (SURVEY.md §7 hard
    part 4: determinism across resharding)."""
    return jnp.arange(num_walkers, dtype=jnp.uint32) + jnp.asarray(offset, jnp.uint32)
