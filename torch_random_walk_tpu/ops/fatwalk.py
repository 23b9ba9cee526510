"""Fat-table walk engine — the TPU hot path for CSR walks.

Why this shape (measured on TPU v5e, see BENCHLOG.md):
- the TPU gather engine is *row-rate* bound: an (E, 2) row gather runs ~172M
  rows/s vs ~65M/s for scalar gathers, so fetching (dst, start_dst, deg_dst)
  as ONE packed row replaces the reference path's three scalar gathers per
  step (row_ptr[cur], row_ptr[cur+1], col_idx[idx]) — ~5x fewer
  gather-engine cycles per walk step;
- ``lax.scan`` stacked outputs re-copy the whole output buffer every
  iteration on this backend, so step loops are Python-unrolled (static
  walk_length) and stacked once at the end;
- node2vec's ``is_neighbor`` test is a cuckoo-set query (graph/hashset.py):
  exactly two row gathers, degree-independent — replacing O(log deg)
  serialized binary-search gathers per rejection round.

Distribution contract: draws consume the identical threefry (seed, stream,
walker, step, round) counters as the reference jnp path (ops/uniform.py,
ops/node2vec.py), and acceptance math is identical, so outputs are
bit-identical to that path (asserted in tests/test_fatwalk.py) and therefore
carry the same per-step node2vec transition law verified against the NumPy
oracle (graph/oracle.py).

All tables are passed as runtime arguments (never closed over): closed-over
arrays become constants baked into the compiled program.

Reference semantics being re-created TPU-first: uniform_walk / biased_walk
(/root/reference/csrc/cpu/rw_cpu.cpp:58-201, csrc/cuda/rw_cuda.cu:59-184).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.graph.csr import PackedLayout
from torch_random_walk_tpu.graph.hashset import _hash_jnp
from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng

# Static number of unrolled rejection rounds before falling into the
# all-walkers-resolved while_loop.  Acceptance per round is >=
# min(1/p,1,1/q)/max(1/p,1,1/q); 2 unrolled rounds resolve the vast majority
# of walkers for typical p/q without any loop-carried overhead.
DEFAULT_UNROLL_ROUNDS = 2


@dataclasses.dataclass(frozen=True)
class FatMeta:
    """Static (hashable) description of the fat tables — a jit static arg."""

    layout: PackedLayout
    num_nodes: int
    num_edges: int

    @classmethod
    def of(cls, graph) -> "FatMeta":
        return cls(layout=graph.layout, num_nodes=graph.num_nodes,
                   num_edges=graph.num_edges)


def _gather_node(node_tab, meta, nodes):
    """(B,) node ids -> (start, deg) via one node_tab row gather."""
    safe = jnp.clip(nodes, 0, meta.num_nodes - 1)
    _, start, deg = meta.layout.unpack(node_tab[safe])
    return start, deg


def _step_edge_gather(edge_tab, meta, start, deg, bits):
    """One uniform neighbor step: (start, deg) of cur -> (dst, start', deg').

    Consumes the same random bits as common.sample_csr_neighbor.  Dead ends
    (deg == 0) are handled by the caller via masking on deg.
    """
    off = prng.randint_from_bits(bits, jnp.maximum(deg, 1))
    e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
    return meta.layout.unpack(edge_tab[e])


def uniform_walk_fat(edge_tab, node_tab, target_nodes, meta, walk_length,
                     seed, walker_offset=0, unroll=8):
    """Uniform CSR walks, one row gather per step.  Output (B, L+1) int32,
    bit-identical to ops.uniform.uniform_walk_csr.

    Steps run under ``lax.scan`` (partially unrolled): measured at the full
    row-gather rate (~175M steps/s at B=64K on v5e) with seconds-scale
    compiles, vs minutes for a fully unrolled 80-step graph.
    """
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_CSR_UNIFORM)
    cur = target_nodes.astype(jnp.int32)
    start, deg = _gather_node(node_tab, meta, cur)

    def step_fn(carry, s):
        cur, start, deg = carry
        c1 = jnp.full((num_walkers,), prng.step_round_counter(s), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        nd, nstart, ndeg = _step_edge_gather(edge_tab, meta, start, deg, bits)
        alive = deg > 0
        nxt = jnp.where(alive, nd, cur)
        return (nxt, jnp.where(alive, nstart, start),
                jnp.where(alive, ndeg, deg)), nxt

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, (cur, start, deg), steps,
                      unroll=min(unroll, walk_length) if walk_length else 1)
    return jnp.concatenate([cur[:, None], seq.T], axis=1)


def _edge_set_contains(hash_table, hash_log_size, hash_salt, u, v):
    """Inline cuckoo membership (graph/hashset.py contract): two row gathers."""
    lo = v.astype(jnp.uint32)
    hi = u.astype(jnp.uint32)
    hit = jnp.zeros(u.shape, bool)
    for which in range(2):
        pos = _hash_jnp(lo, hi, hash_salt, which, hash_log_size)
        row = hash_table[pos]
        hit |= (row[..., 0] == lo) & (row[..., 1] == hi)
    return hit


def _compact(mask, capacity: int):
    """Indices of the first ``capacity`` True lanes of ``mask`` (B-sentinel
    padded).  One cumsum + one scatter — the straggler-compaction primitive.
    """
    num = mask.shape[0]
    pos = jnp.cumsum(mask.astype(jnp.int32)) - 1
    write = jnp.where(mask & (pos < capacity), pos, capacity)
    buf = jnp.full((capacity + 1,), num, jnp.int32)
    buf = buf.at[write].set(jnp.arange(num, dtype=jnp.int32))
    return buf[:capacity]



def _level_schedule(p: float, q: float, num_walkers: int):
    """Static straggler-compaction schedule for the biased rejection loop.

    Expected per-round acceptance is dominated by the distance-2 class in
    sparse graphs, so residual unresolved fractions are estimated with
    ``prob_2`` (slack 1.4x); capacity overflow is harmless — overflowed
    walkers simply retry the same rounds later (identical redraws), caught by
    the while_loop tail.  Returns [(capacity, rounds_in_level), ...].
    """
    _, _, prob_2 = common.node2vec_accept_probs(p, q)
    a = max(min(prob_2, 0.9), 0.05)
    levels = []
    residual = 1.0
    rounds_done = 2  # the two full-batch rounds
    for _ in range(8):
        residual *= (1.0 - a) ** 2
        cap = int(min(1.4 * residual * num_walkers, num_walkers))
        cap = max((cap + 127) // 128 * 128, 256)
        if cap <= 512 or rounds_done >= 24:
            break
        levels.append((cap, 2))
        rounds_done += 2
    return levels


def node2vec_walk_fat(edge_tab, node_tab, hash_table, target_nodes, meta,
                      hash_log_size, hash_salt, p, q, walk_length, seed,
                      walker_offset=0, max_rounds=common.DEFAULT_MAX_ROUNDS,
                      unroll=4):
    """node2vec p/q-biased walks over fat tables + cuckoo membership.

    Bit-identical to ops.node2vec.node2vec_walk_csr: draws consume the same
    threefry (walker, step, round) counters and the acceptance math is the
    same boolean function, so every walker resolves to the same neighbor.

    Rejection is *straggler-compacted*: synchronized full-batch rounds run
    until the LAST of B walkers accepts (max over B geometrics ≈ 40+ rounds
    at B=64K) even though the mean is ~1/acceptance ≈ 2-4, so nearly all
    full-batch gather work would be wasted.  Instead: two full-batch rounds
    resolve the bulk, then the shrinking unresolved set is compacted
    (cumsum + scatter) into statically-scheduled smaller sub-batches
    (_level_schedule), ending with a small-capacity while_loop.  Total gather
    rows ≈ E[rounds] * B instead of max[rounds] * B.

    Walker state rides in *packed* (2,)-uint32 rows (the very rows gathered
    from edge_tab/node_tab), so each level moves state with one row gather +
    one row scatter instead of three scalar ones.

    Capacity overflow semantics: a walker that doesn't get a slot does not
    consume rounds; it redraws the identical (step, round) counters later —
    exactness and bit-identity are unaffected.
    """
    num_walkers = target_nodes.shape[0]
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)

    t0_ = target_nodes.astype(jnp.int32)
    safe0 = jnp.clip(t0_, 0, meta.num_nodes - 1)
    t_row0 = node_tab[safe0]

    def unpack3(rows):
        return meta.layout.unpack(rows)

    def accept_fn(cand, r, t_sub, nbr):
        is_t = cand == t_sub
        return jnp.where(is_t, r < prob_0, jnp.where(nbr, r < prob_1,
                                                     r < prob_2))

    def draw(v_rows, wid_u32, c1):
        """One candidate draw for each lane: returns (cand_row, cand, r).
        Dead-end lanes (deg == 0) return their own row (stay in place)."""
        _, start, deg = unpack3(v_rows)
        b_cand, b_acc = prng.counter_bits(key, wid_u32, c1)
        off = prng.randint_from_bits(b_cand, jnp.maximum(deg, 1))
        e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
        rows = edge_tab[e]
        alive = (deg > 0)[:, None]
        rows = jnp.where(alive, rows, v_rows)
        r = prng.uniform_from_bits(b_acc)
        return rows, r

    # First hop: plain uniform draw (rw_cpu.cpp:159).
    wid_full = common.walker_ids(num_walkers, walker_offset)
    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    v_row, _ = draw(t_row0, wid_full, c1)

    levels = _level_schedule(p, q, num_walkers) if num_walkers >= 4096 else []
    tail_capacity = min(1024, num_walkers)
    tail_rounds = 4 if num_walkers >= 4096 else 1

    def step_fn(carry, step_u32):
        t, v_row = carry
        v, _, v_deg = unpack3(v_row)

        # Dead-end walkers resolve immediately to v (the candidate is v every
        # round; some round always accepts; the value is v either way).
        resolved = v_deg == 0
        sel_row = v_row
        rnd = jnp.zeros((num_walkers,), jnp.uint32)

        # Two full-batch rounds.
        for k in range(2):
            c1 = prng.step_round_counter(step_u32, rnd)
            cand_row, r = draw(v_row, wid_full, c1)
            cand = unpack3(cand_row)[0]
            nbr = _edge_set_contains(hash_table, hash_log_size, hash_salt,
                                     t, cand)
            take = ~resolved & accept_fn(cand, r, t, nbr)
            sel_row = jnp.where(take[:, None], cand_row, sel_row)
            resolved = resolved | take
            rnd = rnd + 1

        def run_level(state, capacity, rounds):
            resolved, sel_row, rnd = state
            idx = _compact(~resolved, capacity)
            safe = jnp.minimum(idx, num_walkers - 1)
            act = idx < num_walkers
            t_s = t[safe]
            v_row_s = v_row[safe]
            wid_s = safe.astype(jnp.uint32) + jnp.uint32(walker_offset)
            rnd_s = rnd[safe]
            l_res = jnp.zeros((capacity,), bool)
            l_sel = v_row_s
            for k in range(rounds):
                c1 = prng.step_round_counter(step_u32, rnd_s + jnp.uint32(k))
                cand_row, r = draw(v_row_s, wid_s, c1)
                cand = unpack3(cand_row)[0]
                nbr = _edge_set_contains(hash_table, hash_log_size, hash_salt,
                                         t_s, cand)
                take = ~l_res & accept_fn(cand, r, t_s, nbr)
                l_sel = jnp.where(take[:, None], cand_row, l_sel)
                l_res = l_res | take
            win = l_res & act
            idx_w = jnp.where(win, idx, num_walkers)
            sel_row = sel_row.at[idx_w].set(l_sel)
            resolved = resolved.at[idx_w].set(True)
            rnd = rnd.at[jnp.where(act, idx, num_walkers)].add(
                jnp.uint32(rounds))
            return resolved, sel_row, rnd

        state = (resolved, sel_row, rnd)
        for capacity, rounds in levels:
            state = run_level(state, capacity, rounds)

        def cond(state):
            resolved, _, rnd = state
            return jnp.logical_and(~jnp.all(resolved),
                                   rnd.max() < jnp.uint32(max_rounds))

        def body(state):
            return run_level(state, tail_capacity, tail_rounds)

        _, sel_row, _ = lax.while_loop(cond, body, state)
        nxt = unpack3(sel_row)[0]
        return (v, sel_row), nxt

    t_init = t0_
    v_init = unpack3(v_row)[0]
    if walk_length < 2:
        return jnp.concatenate([t_init[:, None], v_init[:, None]], axis=1)
    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, (t_init, v_row), steps,
                      unroll=min(unroll, walk_length - 1))
    return jnp.concatenate([t_init[:, None], v_init[:, None], seq.T], axis=1)
