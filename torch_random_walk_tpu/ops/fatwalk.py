"""Fat-table walk engine — the TPU hot path for CSR walks.

Why this shape (measured on TPU v5e, see BENCHLOG.md):
- the TPU gather engine is *row-rate* bound: an (E, 2) row gather runs ~172M
  rows/s vs ~65M/s for scalar gathers, so fetching (dst, start_dst, deg_dst)
  as ONE packed row replaces the reference path's three scalar gathers per
  step (row_ptr[cur], row_ptr[cur+1], col_idx[idx]) — ~5x fewer
  gather-engine cycles per walk step;
- step loops run under ``lax.scan`` with partial unroll (full Python
  unrolling costs minutes of compile for zero run-time gain — BENCHLOG.md);
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

import jax
import jax.numpy as jnp
from jax import lax

from torch_random_walk_tpu.graph.bloom import bloom_maybe
from torch_random_walk_tpu.graph.csr import PackedLayout
from torch_random_walk_tpu.graph.hashset import _hash_jnp
from torch_random_walk_tpu.ops import common
from torch_random_walk_tpu.utils import prng

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


# The straggler-compaction primitive, shared with the routed exchange
# (ops/common.py::compact_indices — single implementation, VERDICT r3 #8).
_compact = common.compact_indices



def _hier_schedule(p: float, q: float, num_walkers: int,
                   rounds_per_level: int = 2, slack: float = 1.15,
                   max_levels: int = 6):
    """Static hierarchical-compaction schedule for the biased rejection loop.

    Returns [(capacity, rounds), ...]; each level runs ``rounds`` hashed
    rounds on a sub-batch compacted *within its parent level* (so only the
    first compaction and the final scatter touch full-B arrays).  Sized from
    the no-hash decided-accept floor ``lo_acc``; capacity overflow walkers
    are caught by the while_loop tail.
    """
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    a = max(min(lo_acc, 0.9), 0.05)
    caps = []
    residual = (1.0 - a) ** 2  # after the two no-hash full rounds
    cap_prev = num_walkers
    for _ in range(max_levels):
        cap = int(min(slack * residual * num_walkers, num_walkers))
        cap = max((cap + 127) // 128 * 128, 256)
        cap = min(cap, cap_prev)
        if cap <= 512:
            break
        caps.append((cap, rounds_per_level))
        cap_prev = cap
        residual *= (1.0 - a) ** rounds_per_level
    return caps


def rejection_branch(p: float, q: float, num_walkers: int,
                     has_bloom: bool = False) -> str:
    """Which rejection structure ``node2vec_walk_fat`` takes for this config:
    'small' (flat full-acceptance rounds), 'bloom' (Bloom-prefiltered rounds
    + compacted exact stage — the production path when a bloom table is
    supplied), 'speculative' (narrow frozen band), or 'hierarchical'
    (compacted straggler levels).  Single source of truth for the dispatch —
    tests assert against it so every branch is provably exercised
    (VERDICT r1 weakness #1).

    The bloom/freerun branch is taken whenever wide fat tables are supplied,
    at ANY batch size: its bitstream depends only on (seed, global walker id,
    sampler) — never on batch size, chunking, block length, or compaction
    capacity — so chunked launches (walker_offset) and data-parallel
    shardings reproduce the full-batch walks exactly.  Gating it on
    num_walkers would silently switch samplers (hence walks) across the
    threshold."""
    if has_bloom:
        return "bloom"
    if num_walkers < 4096:
        return "small"
    _, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    band = max(prob_1, prob_2) - lo_acc
    f_ratio = band / (band + lo_acc) if (band + lo_acc) > 0 else 1.0
    return "speculative" if f_ratio <= 0.25 else "hierarchical"


def _mixture_consts(p: float, q: float, deg_bits: int) -> tuple:
    """Static integer weights of the composition-envelope (mixture) sampler.

    node2vec weights w(x) = 1/p if x==t, 1 if x in N(t), 1/q else.  Rejection
    against the flat envelope max(1/p, 1, 1/q) wastes rounds on the rare
    x==t spike (acceptance = E[w]/max_w, e.g. 0.27 at p=.5, q=2).  Instead:
    envelope M = max(1, 1/q) for the BASE part w_base = min(w, M), plus an
    exact point mass extra * mult_v(t) at x==t with extra = max(0, 1/p - M).
    Since P(x) = mult*(w_base + extra*1[x==t]) = mult*w(x), the law is exact
    and acceptance jumps to E[w_base]/M (~0.53 at p=.5, q=2 — mean rounds
    halve).  mult_v(t) rides in the wide fat row (fat6_for w5).

    All weights are scaled to integers (scale chosen so the total mass fits
    uint32): one 32-bit word per round yields the component choice, the
    candidate offset and the acceptance sub-uniform as exact independent
    quotient/remainder parts.  Weight quantization is <= 2^-12 relative for
    typical p, q — far below the reference's own float32 granularity.
    """
    max_deg = 1 << deg_bits
    m_env = max(1.0, 1.0 / q)
    extra = max(0.0, 1.0 / p - m_env)
    worst = max_deg * max(m_env, 1.0 / p) + 1
    s_bits = 31
    while (1 << s_bits) * worst > float(1 << 31) and s_bits > 1:
        s_bits -= 1
    scale = 1 << s_bits
    mi = max(int(round(m_env * scale)), 1)
    ei = int(round(extra * scale))
    wt_i = max(int(round(min(1.0 / p, m_env) * scale)), 0)
    w1_i = min(int(round(1.0 * scale)), mi)
    w2_i = min(int(round((1.0 / q) * scale)), mi)
    return mi, ei, wt_i, w1_i, w2_i


def _node2vec_freerun(edge_tab6, node_tab6, hash_table, target_nodes, meta,
                      hash_log_size, hash_salt, p, q, walk_length, seed,
                      walker_offset=0, max_rounds=common.DEFAULT_MAX_ROUNDS,
                      rounds_per_block=None, slack=1.05, round_unroll=None,
                      sampler="mixture", walks_per_lane=None):
    """Free-running biased rounds — the production CSR node2vec engine.

    Every per-step structure (compacted levels, per-step tails) is gone:
    each lane advances through its OWN walk at its own pace, so every round
    is one full-batch fat-row gather at the full gather rate with zero
    compaction machinery.  Ingredients (all measured — BENCHLOG.md r2):

    - **Wide fat rows** (fat6_for): candidate id + packed meta + 96-bit
      neighbor Bloom + reverse multiplicity in ONE gather (row width is
      nearly free on the gather engine; the lane carries its t row and v
      row in registers, so advancing never needs a second gather).
    - **Bloom classification in registers**: a draw is decided locally
      unless it is in the acceptance band AND Bloom-positive (a few
      percent); such lanes freeze (stall, redrawing deterministically).
    - **Amortized exact pass** every ``rounds_per_block`` rounds: frozen
      lanes compact once, replay their frozen round through the cuckoo
      set, and resume — the only compaction in the engine.  Measured sweep
      (BENCHLOG.md r2, 2M/36M/B=128K, p=.5 q=2): SHORT blocks win —
      rpb=3/unroll=3 12.76M steps/s vs 9.68M at the old rpb=6/unroll=3
      (frozen lanes resume sooner, so lane utilization dominates the extra
      pass fixed cost); rpb=12 degrades to 7.75M.
    - **sampler="mixture"**: the composition-envelope draw
      (_mixture_consts) — exact node2vec law at roughly HALF the mean
      rounds of flat rejection.  sampler="rejection" reproduces the jnp
      reference path's bitstream exactly (same counters, same acceptance).

    Loop = lax.scan over enough blocks for the expected round count, then a
    while_loop drain for stragglers (bounded by ``max_rounds``).

    **Virtual lanes (r5)**: with ``walks_per_lane = V > 1`` the engine runs
    ``B / V`` physical lanes, each advancing V whole walks back to back
    (lane ``l`` walks walker ids ``l``, ``lanes + l``, ``2*lanes + l``, …).
    A lane that finishes walk ``k`` is refilled with walk ``k+1``'s start
    node at the next exact pass.  This is the work-stealing answer to the
    r4 anatomy's ~11% straggler-spread idle (BENCHLOG r4): per-lane round
    counts concentrate as sums of V walks (sigma/mu ~ 1/sqrt(V·L)), and the
    multi-level drain runs once per V walks instead of per walk.  Draws are
    pure functions of (global walker id, step, round), so walks are
    BIT-IDENTICAL for every V — V is a performance knob like ``unroll``,
    never a semantics knob (asserted in tests/test_fatwalk.py).
    """
    num_walkers = target_nodes.shape[0]
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    hi_acc = max(prob_1, prob_2)
    # Row layout: 2 packed words | bw Bloom words | 1 multiplicity word.
    # The Bloom width scales with avg degree (ops/walk.bloom_words_for).
    bw = int(edge_tab6.shape[1]) - 3
    mult_col = 2 + bw
    mix = sampler == "mixture"
    mi, ei, wt_i, w1_i, w2_i = _mixture_consts(p, q, meta.layout.deg_bits)
    lo_i, hi_i = min(w1_i, w2_i), max(w1_i, w2_i)
    unpack3 = meta.layout.unpack
    length = walk_length
    cols = jnp.arange(length + 2, dtype=jnp.int32)
    m = jnp.uint32(prng.MAX_ROUNDS_PER_STEP)

    # Virtual lanes: V whole walks per physical lane (see docstring).  The
    # r5 TPU sweeps measured V > 1 SLOWER at every tested configuration
    # (bench shape: v1 22.0M, v2 19.3M, v4 17.1M steps/s; products shape:
    # v1 14.9M, v4 12.3M): the fat-gather rate is NOT flat in rows-in-
    # flight (62.5M rows/s at 128K rows, 39M at 32K — round_anatomy width
    # ladder), so shrinking lanes by V costs more gather rate than the
    # straggler concentration returns.  Auto therefore stays at V=1; the
    # knob remains for explicit use (bit-identical for every V).
    V = walks_per_lane
    if V is None or num_walkers % V:
        V = 1
    lanes = num_walkers // V
    lane_ids0 = jnp.arange(lanes, dtype=jnp.int32)
    # Exact-pass capacity must cover the frozen INFLOW of a whole block, or
    # a backlog forms and lane utilization collapses (frozen lanes stall).
    # Inflow/draw = band fraction x Bloom false-positive rate; the pass is
    # linear-cheap (compacted gathers + sorted scatters), so oversize it.
    import math as _math

    avg_deg = max(meta.num_edges / max(meta.num_nodes, 1), 1.0)
    fp_est = min((1.0 - _math.exp(-2.0 * avg_deg / (32.0 * bw))) ** 2 + 0.02,
                 1.0)
    if mix:
        band_frac = abs(w1_i - w2_i) / mi
    else:
        band_frac = hi_acc - lo_acc
    # Adaptive exact-pass cadence: a frozen lane stalls until its block's
    # exact pass, so the optimal block length falls as the freeze rate
    # (in-band AND Bloom-positive per draw) rises.  At deg-16 shapes
    # (freeze ~2-5%/draw) the measured sweet spot is rpb=3 (BENCHLOG.md
    # block-length sweep); at ogbn-products degree (~50) the 96-bit Bloom
    # saturates (fp ~0.46) and rpb=3 collapses lane utilization — serve
    # frozen lanes every round instead (the exact-pass fixed cost ~0.2-0.4ms
    # is small against a 3.5ms round).
    freeze_rate = fp_est * band_frac
    if rounds_per_block is None:
        # Thresholds anchored to the r4 sweeps: with the recorded-pend
        # exact pass AND the plateau-width Blooms (freeze rates ~0.03),
        # the sweet spot moved to LONGER blocks again — rpb=8 tops both
        # shapes (bench 21.87M at rpb8 vs 21.57M at rpb4; products 14.78M
        # at rpb8 vs 14.29M, falling by rpb12).  Very high freeze rates
        # (saturating Blooms) still want per-round exact passes.
        rounds_per_block = 1 if freeze_rate > 0.15 else (
            2 if freeze_rate > 0.09 else (4 if freeze_rate > 0.05 else 8))
    if round_unroll is None:
        # TPU: fully unroll the block (measured +10%: 21.89M at unroll 8
        # vs 19.82M at unroll 1, bench shape).  CPU: LLVM compile time
        # explodes superlinearly in unroll x row width ((E,16) rows at
        # unroll 2 never finished; unroll 1 compiles in ~6 s), and CPU
        # here is a correctness backend — cap it.  The unroll is
        # trace-structure only: walks are bit-identical either way
        # (asserted by the CPU suite vs the TPU-measured engine).
        if jax.default_backend() == "tpu":
            round_unroll = rounds_per_block
        else:
            wide = int(edge_tab6.shape[1]) > 8
            round_unroll = 1 if wide else min(rounds_per_block, 4)
    if mix:
        # Mean rounds ~= envelope acceptance floor lo_i / mi.
        a = max(min(lo_i / mi, 1.0), 0.05)
    else:
        a = max(min(lo_acc, 1.0), 0.05)
    # Exact-pass inflow per block: frozen draws (freeze_rate per draw) plus,
    # under virtual lanes, walk completions awaiting refill (a lane finishes
    # a walk every ~L/a rounds).
    refill_rate = a / max(length, 1) if V > 1 else 0.0
    inflow = (1.4 * fp_est * band_frac + 2.0 * refill_rate) \
        * rounds_per_block * lanes
    exact_cap = int(min(lanes, max(((int(inflow) + 127) // 128) * 128, 256)))

    # The scan phase must cover V whole walks per lane, plus the refill
    # stalls (a completed lane idles until its block's exact pass —
    # ~rpb/2 rounds per refill).
    est_rounds = (int(slack * V * length / a)
                  + (V - 1) * rounds_per_block + rounds_per_block)
    scan_blocks = max(est_rounds // rounds_per_block, 1)
    drain_blocks = max_rounds // rounds_per_block + 2

    all_t0 = target_nodes.astype(jnp.int32)     # (B,) — indexed at refill
    t0 = all_t0[:lanes]                          # slot-0 walks
    row0 = node_tab6[jnp.clip(t0, 0, meta.num_nodes - 1)]

    walks0 = jnp.zeros((num_walkers, length + 2), jnp.int32)
    walks0 = walks0.at[:, 0].set(all_t0)

    def contains(u, v):
        return _edge_set_contains(hash_table, hash_log_size, hash_salt, u, v)

    def classify2(t_row, v_row, wid_s, c1):
        """One draw at state (t_row, v_row) under the configured sampler.

        Returns (cand_rows, cand, spike, dead, acc_n, rej_n, e, accA, accB):
        acc_n/rej_n are the locally (Bloom-)decided outcomes — a draw
        neither acc nor rej is FROZEN (in the acceptance band AND
        Bloom-positive); ``e`` is the drawn edge index and accA/accB the
        draw's precomputed accept-if-neighbor / accept-if-not outcomes, so
        a frozen draw can be resolved later by a bare cuckoo membership
        with no redraw.  ``spike`` marks mixture draws that selected the t
        point mass (their next row is t_row, not an edge row)."""
        t = unpack3(t_row[:, :2])[0]
        _, start, deg = unpack3(v_row[:, :2])
        b_cand, b_acc = prng.counter_bits(key, wid_s, c1)
        if mix:
            mult = v_row[:, mult_col] & jnp.uint32(0xFFFF)
            dead = deg == 0
            g_spike = jnp.uint32(ei) * mult
            g_total = jnp.uint32(mi) * deg.astype(jnp.uint32) + g_spike
            pos = prng.mulhi32(b_cand, jnp.maximum(g_total, 1))
            spike = (pos < g_spike) & ~dead
            base = pos - g_spike
            off = (base // jnp.uint32(mi)).astype(jnp.int32)
            sub = base % jnp.uint32(mi)
            e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
            rows = edge_tab6[e]
            # Spike: the walk returns to t.  The new row is t's row with the
            # multiplicity halves swapped (rev' = own, own' = rev — see
            # graph/bloom.build_edge_multiplicities).
            w5 = v_row[:, mult_col]
            spike_w5 = (w5 >> jnp.uint32(16)) | (w5 << jnp.uint32(16))
            spike_row = jnp.concatenate(
                [t_row[:, :mult_col], spike_w5[:, None]], axis=1)
            rows = jnp.where(dead[:, None], v_row,
                             jnp.where(spike[:, None], spike_row, rows))
            cand = unpack3(rows[:, :2])[0]
            is_t = cand == t
            maybe = bloom_maybe(t_row[:, 2:mult_col], cand, words=bw)
            acc_n = jnp.where(is_t, sub < wt_i,
                              jnp.where(maybe, sub < lo_i, sub < w2_i))
            rej_n = jnp.where(is_t, sub >= wt_i,
                              jnp.where(maybe, sub >= hi_i,
                                        sub >= w2_i))
            acc_n = spike | (acc_n & ~spike)
            rej_n = rej_n & ~spike
            return (rows, cand, spike, dead, acc_n, rej_n, e,
                    sub < w1_i, sub < w2_i)
        off = prng.randint_from_bits(b_cand, jnp.maximum(deg, 1))
        e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
        rows = edge_tab6[e]
        dead = deg == 0
        rows = jnp.where(dead[:, None], v_row, rows)
        cand = unpack3(rows[:, :2])[0]
        r = prng.uniform_from_bits(b_acc)
        is_t = cand == t
        maybe = bloom_maybe(t_row[:, 2:mult_col], cand, words=bw)
        acc_n = jnp.where(is_t, r < prob_0,
                          jnp.where(maybe, r < lo_acc, r < prob_2))
        rej_n = jnp.where(is_t, r >= prob_0,
                          jnp.where(maybe, r >= hi_acc, r >= prob_2))
        spike = jnp.zeros(cand.shape, bool)
        return (rows, cand, spike, dead, acc_n, rej_n, e,
                r < prob_1, r < prob_2)

    # --- merged lane state (r4 exact-pass redesign; r5 virtual lanes) -----
    # One (lanes, 2W+5) uint32 array instead of six parallel arrays:
    #
    #   [:, :W]      t row        [:, W:2W]   v row
    #   [:, 2W]      step         [:, 2W+1]   rnd | FROZEN<<31
    #                                             | ACC_IF_NBR<<30
    #                                             | ACC_IF_NOT<<29
    #   [:, 2W+2]    pend_cand    [:, 2W+3]   pend_e
    #   [:, 2W+4]    k            (virtual-walk slot; walker id
    #                              = offset + k*lanes + lane)
    #
    # Rationale (BENCHLOG r4 pass anatomy): the exact pass was ~3.7 ms of
    # every 4-round block — over half of it the SIX per-array scatters, a
    # further quarter the candidate re-derivation (threefry + fat gather +
    # classify replay).  Freezing lanes now RECORD their pending draw: the
    # candidate id, its edge index, and the two possible acceptance
    # outcomes (accept-if-neighbor / accept-if-not — the draw's sub
    # threshold tests, precomputed), so the pass is just: compact frozen →
    # ONE state gather → cuckoo membership (2 gathers) → pick the
    # precomputed outcome → ONE state scatter + the walk scatter.  Draw
    # counters are untouched: the stored candidate IS the frozen round's
    # draw, so bit-identity with the jnp oracles is preserved.
    W = int(edge_tab6.shape[1])
    C_STEP, C_RND, C_CAND, C_PEND_E = 2 * W, 2 * W + 1, 2 * W + 2, 2 * W + 3
    C_K = 2 * W + 4
    F_FROZEN = jnp.uint32(1 << 31)
    F_ACC_NBR = jnp.uint32(1 << 30)
    F_ACC_NOT = jnp.uint32(1 << 29)
    RND_MASK = jnp.uint32((1 << 16) - 1)
    slot_ids = jnp.arange(V, dtype=jnp.int32)

    def walk_rows_of(S, lane_s):
        """Walk-array row (global-in-batch walker index) of each lane's
        CURRENT walk; compaction-padding lanes (sentinel id ``lanes``) go
        out of bounds == dropped by the scatter."""
        k = S[:, C_K].astype(jnp.int32)
        return jnp.where(lane_s >= lanes, num_walkers, k * lanes + lane_s)

    def wid_of(S, lane_s):
        k = S[:, C_K].astype(jnp.int32)
        return (jnp.uint32(walker_offset)
                + (k * lanes + jnp.minimum(lane_s, lanes - 1))
                .astype(jnp.uint32))

    def one_round(st, lane_s, compacted):
        """One free-running round over the lanes in ``st = (S, walks)`` or,
        during the V > 1 scan phase, ``st = (S, walks, wbuf)``.
        ``compacted`` False = full-width phase (emission = masked select —
        into the (lanes, L+2) CURRENT-walk buffer ``wbuf`` when present,
        else over the (V, lanes) walk-row view); True = drain subset
        (emission = scatter at per-lane computed walk rows)."""
        wbuf = st[2] if len(st) == 3 else None
        S, walks = st[0], st[1]
        t_row = S[:, :W]
        v_row = S[:, W:2 * W]
        step = S[:, C_STEP].astype(jnp.int32)
        rw = S[:, C_RND]
        rnd = rw & RND_MASK
        frozen = (rw & F_FROZEN) != 0
        active = (step < length) & ~frozen
        s = step + 1
        c1 = s.astype(jnp.uint32) * m + rnd
        rows, cand, spike, dead, acc_n, rej_n, e, accA, accB = classify2(
            t_row, v_row, wid_of(S, lane_s), c1)
        is_first = step == 0
        acc = active & (is_first | dead | acc_n)
        rej = active & ~acc & rej_n & ~is_first & ~dead
        frz = active & ~acc & ~rej
        new_t_row = jnp.where(acc[:, None], v_row, t_row)
        new_v_row = jnp.where(acc[:, None], rows, v_row)
        k_col = S[:, C_K]
        step = step + acc.astype(step.dtype)
        rnd = jnp.where(acc, 0, rnd + rej.astype(jnp.uint32))
        rw = (rnd
              | jnp.where(frozen | frz, F_FROZEN, 0)
              | jnp.where(frz, jnp.where(accA, F_ACC_NBR, 0)
                          | jnp.where(accB, F_ACC_NOT, 0),
                          jnp.where(frozen, rw, 0)
                          & (F_ACC_NBR | F_ACC_NOT)))
        pend_cand = jnp.where(frz, cand.astype(jnp.uint32), S[:, C_CAND])
        pend_e = jnp.where(frz, e.astype(jnp.uint32), S[:, C_PEND_E])
        S = jnp.concatenate(
            [new_t_row, new_v_row, step.astype(jnp.uint32)[:, None],
             rw[:, None], pend_cand[:, None], pend_e[:, None],
             k_col[:, None]], axis=1)
        if wbuf is not None:
            # V > 1 scan phase: emit into the per-lane CURRENT-walk buffer
            # (lanes, L+2).  The (V, lanes, L+2) select kept emission cost
            # O(B·L) per round while V multiplied the round count — the r5
            # vsweep measured exactly that (bench shape v1 21.99M, v4
            # 17.35M steps/s).  Completed rows flush to the walk array at
            # the block exact/refill pass; the per-round select is now
            # O(lanes·L), V-invariant in total.
            wbuf = jnp.where(acc[:, None] & (cols[None, :] == s[:, None]),
                             cand[:, None], wbuf)
            return S, walks, wbuf
        if not compacted:
            # Emit via masked select, not scatter: a full-B dynamic-column
            # scatter costs ~1.5ms/round on the TPU scatter path, while the
            # (V, lanes, L+2) select is plain VPU + streaming HBM traffic
            # (same element count as the (B, L+2) select at V == 1).
            k = k_col.astype(jnp.int32)
            w3 = walks.reshape(V, lanes, length + 2)
            mask = (acc[None, :, None]
                    & (slot_ids[:, None, None] == k[None, :, None])
                    & (cols[None, None, :] == s[None, :, None]))
            walks = jnp.where(mask, cand[None, :, None], w3).reshape(
                num_walkers, length + 2)
        else:
            # Compacted drain: per-lane walk rows (k*lanes + lane; OOB ==
            # dropped), non-accepting lanes write the junk column.  Rows
            # are unique ((k, lane) pairs) but only sorted when V == 1.
            walks = walks.at[walk_rows_of(S, lane_s),
                             jnp.where(acc, s, length + 1)].set(
                cand, indices_are_sorted=(V == 1), unique_indices=True)
        return S, walks

    def exact_pass(st, lane_s, cap):
        """Serve frozen lanes from their RECORDED pending draw: compact →
        one state gather → cuckoo membership → precomputed outcome →
        one state scatter + the walk scatter.  No redraw happens, so the
        resolved value equals the frozen round's draw bit-for-bit.

        Under virtual lanes the pass also REFILLS lanes whose current walk
        finished (step == length, k < V-1): they restart at walk k+1's
        start node with step = rnd = 0.  Refill is disjoint from frozen
        (a frozen lane's pending draw is at step < length).

        With the V > 1 scan-phase walk buffer (``st = (S, walks, wbuf)``)
        frozen resolutions land in ``wbuf`` and refilled lanes flush their
        completed (lanes, L+2) buffer row into the walk array here —
        the only place the full walk array is touched during the scan."""
        wbuf = st[2] if len(st) == 3 else None
        S, walks = st[0], st[1]
        size = S.shape[0]
        frozen = (S[:, C_RND] & F_FROZEN) != 0
        if V > 1:
            refill = ((S[:, C_STEP].astype(jnp.int32) >= length)
                      & (S[:, C_K].astype(jnp.int32) < V - 1)
                      & (lane_s < lanes))
            need = frozen | refill
        else:
            need = frozen
        idx = _compact(need, cap)
        safe = jnp.minimum(idx, size - 1)
        act = idx < size
        Ss = S[safe]
        lane_sub = lane_s[safe]
        t = unpack3(Ss[:, :2])[0]
        cand = Ss[:, C_CAND].astype(jnp.int32)
        hit = contains(t, cand)
        rw_s = Ss[:, C_RND]
        is_frz = act & ((rw_s & F_FROZEN) != 0)
        acc = is_frz & jnp.where(hit, (rw_s & F_ACC_NBR) != 0,
                                 (rw_s & F_ACC_NOT) != 0)
        e = jnp.clip(Ss[:, C_PEND_E].astype(jnp.int32), 0,
                     max(meta.num_edges - 1, 0))
        rows = edge_tab6[e]
        step_s = Ss[:, C_STEP].astype(jnp.int32)
        s_s = step_s + 1
        k_s = Ss[:, C_K].astype(jnp.int32)
        new_t = jnp.where(acc[:, None], Ss[:, W:2 * W], Ss[:, :W])
        new_v = jnp.where(acc[:, None], rows, Ss[:, W:2 * W])
        new_step = step_s + acc.astype(step_s.dtype)
        new_rw = jnp.where(acc, 0, (rw_s & RND_MASK)
                           + is_frz.astype(jnp.uint32))
        new_k = k_s
        if V > 1:
            is_rf = act & ~is_frz
            nxt_widx = jnp.clip((k_s + 1) * lanes
                                + jnp.minimum(lane_sub, lanes - 1),
                                0, num_walkers - 1)
            t_new = all_t0[nxt_widx]
            nrow = node_tab6[jnp.clip(t_new, 0, meta.num_nodes - 1)]
            new_t = jnp.where(is_rf[:, None], nrow, new_t)
            new_v = jnp.where(is_rf[:, None], nrow, new_v)
            new_step = jnp.where(is_rf, 0, new_step)
            new_rw = jnp.where(is_rf, 0, new_rw)
            new_k = jnp.where(is_rf, k_s + 1, k_s)
        Snew = jnp.concatenate(
            [new_t, new_v, new_step.astype(jnp.uint32)[:, None],
             new_rw[:, None], Ss[:, C_CAND][:, None],
             Ss[:, C_PEND_E][:, None],
             new_k.astype(jnp.uint32)[:, None]], axis=1)
        i_act = jnp.where(act, idx, size)
        S = S.at[i_act].set(Snew, indices_are_sorted=True,
                            unique_indices=True)
        if wbuf is not None:
            # Frozen resolutions: scatter into the current-walk buffer
            # (non-frozen slots row out of bounds == dropped, non-accepts
            # hit the junk column).
            c_rows = jnp.where(is_frz, jnp.minimum(lane_sub, lanes - 1),
                               lanes)
            wbuf = wbuf.at[c_rows, jnp.where(acc, s_s, length + 1)].set(
                cand, mode="drop", unique_indices=True)
            # Refilled lanes: flush walk k's completed buffer row to the
            # walk array, then reset the row to walk k+1's start node.
            ok_rf = is_rf & (lane_sub < lanes)
            f_rows = jnp.where(ok_rf,
                               jnp.clip(k_s * lanes + lane_sub, 0,
                                        num_walkers - 1), num_walkers)
            walks = walks.at[f_rows].set(
                wbuf[jnp.minimum(lane_sub, lanes - 1)], mode="drop",
                unique_indices=True)
            fresh = (jnp.zeros((idx.shape[0], length + 2), jnp.int32)
                     .at[:, 0].set(t_new))
            wbuf = wbuf.at[jnp.where(ok_rf, lane_sub, lanes)].set(
                fresh, mode="drop", unique_indices=True)
            return S, walks, wbuf
        # Frozen lanes' walk rows by (k, lane); refill/padding lanes land
        # in the junk column (or out of bounds == dropped).
        g_rows = jnp.where(is_frz,
                           jnp.where(lane_sub >= lanes, num_walkers,
                                     k_s * lanes + lane_sub),
                           num_walkers)
        walks = walks.at[g_rows, jnp.where(acc, s_s, length + 1)].set(
            cand, indices_are_sorted=(V == 1), unique_indices=True)
        return S, walks

    def block(st, lane_s=None, compacted=False, cap=None):
        # Rounds run under lax.scan (partially unrolled): fully Python-
        # unrolled round chains make XLA compile time explode (~2s/round
        # on CPU) for zero runtime gain.
        lane_s = lane_ids0 if lane_s is None else lane_s
        cap = exact_cap if cap is None else cap
        st = lax.scan(lambda s_, _: (one_round(s_, lane_s, compacted), 0),
                      st, None, length=rounds_per_block,
                      unroll=round_unroll)[0]
        return exact_pass(st, lane_s, cap)

    S0 = jnp.concatenate(
        [row0, row0, jnp.zeros((lanes, 5), jnp.uint32)], axis=1)
    if V > 1:
        wbuf0 = jnp.zeros((lanes, length + 2), jnp.int32).at[:, 0].set(t0)
        state = (S0, walks0, wbuf0)
    else:
        state = (S0, walks0)
    state, _ = lax.scan(lambda st, _: (block(st), 0), state,
                        jnp.arange(scan_blocks))
    if V > 1:
        # Scan -> drain boundary: flush every lane's current-walk buffer
        # row into the walk array ((k, lane) rows are distinct); the drain
        # emits via compacted scatters directly.
        S_, walks_, wbuf_ = state
        walks_ = walks_.at[walk_rows_of(S_, lane_ids0)].set(
            wbuf_, unique_indices=True)
        state = (S_, walks_)

    def step_of(st):
        return st[0][:, C_STEP].astype(jnp.int32)

    def lane_active(st):
        """A lane still has work: current walk unfinished, or more virtual
        walks queued behind it."""
        if V == 1:
            return step_of(st) < length
        return ((step_of(st) < length)
                | (st[0][:, C_K].astype(jnp.int32) < V - 1))

    def active_count(st):
        return jnp.sum(lane_active(st).astype(jnp.int32))

    # Straggler drain.  Lane completion rounds concentrate around the mean
    # (sum of L geometrics: sigma/mu ~ 1/sqrt(L)), so the scan phase covers
    # the bulk — but the tail is LONG (per-lane acceptance varies with the
    # local graph, and frozen lanes advance only at exact passes), and
    # running tail rounds at full batch wastes ~25% of all gather work on
    # finished lanes (measured r3: drain = 185 ms of a 738 ms walk when run
    # at one B/4 level).  So the drain is MULTI-LEVEL: before each level, a
    # guarded loop runs blocks at the current width only while more than
    # the next capacity remains active; survivors then compact into the
    # next level (B/4 -> B/16 -> B/64), with walk emission via sorted
    # scatters addressed by global lane id.  Draws stay pure functions of
    # (wid, step, round), so WHERE a round is evaluated never changes WHAT
    # it evaluates to — bit-identity with the jnp oracles is preserved.
    def cap_of(frac):
        return min(lanes, max(((lanes // frac) + 127) // 128 * 128, 256))

    level_caps = []
    for frac in (2, 4, 8, 16, 32, 64, 128, 256):
        c = cap_of(frac)
        if not level_caps or c < level_caps[-1]:
            level_caps.append(c)

    def pass_cap_for(width: int) -> int:
        """Exact-pass capacity scaled to the CURRENT lane width: the frozen
        (+ refill, under virtual lanes) inflow of one block is
        ~(freeze_rate + refill_rate)*rpb*width (2x margin for the straggler
        tail's above-average freeze density; overflowing lanes simply wait
        one more block — never dropped)."""
        raw = int(2.0 * (freeze_rate + refill_rate)
                  * rounds_per_block * width)
        return min(exact_cap, width, max(((raw + 127) // 128) * 128, 256))

    def compact_level(st, lane_s, c):
        """Compact the lanes of ``st`` that still have work into a c-lane
        level.  Padding lanes clone the last real lane (reads are safe;
        writes go to the OOB row / junk column and drop) and are marked
        done (step=length, k=V-1) so they never participate.

        Loud incompleteness (ADVICE r3): if the drain budget was exhausted
        while more than ``c`` lanes are still active, the overflow lanes
        can no longer be tracked — their CURRENT walk rows get ``-1``
        scattered into the final position instead of being silently
        truncated (the single-chip analog of the routed engines'
        completeness check; when nothing overflows every poison index is
        out of bounds and the scatter is a no-op, preserving
        bit-identity)."""
        S, walks = st
        size = S.shape[0]
        active = lane_active(st)
        rank = jnp.cumsum(active.astype(jnp.int32)) - 1
        lost = active & (rank >= c)
        g_all = walk_rows_of(S, lane_s)
        walks = walks.at[
            jnp.where(lost, jnp.minimum(g_all, num_walkers), num_walkers),
            length].set(-1, mode="drop")
        idx = _compact(active, c)
        safe = jnp.minimum(idx, size - 1)
        act = idx < size
        new_lane = jnp.where(act, lane_s[safe], lanes)
        Ss = S[safe]
        # Padding lanes: step=length, k=V-1 (never active), flags cleared
        # (never frozen, never refilled) so they cannot enter an exact pass.
        Ss = Ss.at[:, C_STEP].set(
            jnp.where(act, Ss[:, C_STEP], jnp.uint32(length)))
        Ss = Ss.at[:, C_RND].set(jnp.where(act, Ss[:, C_RND], 0))
        Ss = Ss.at[:, C_K].set(
            jnp.where(act, Ss[:, C_K], jnp.uint32(V - 1)))
        return (Ss, walks), new_lane

    budget = jnp.int32(drain_blocks)
    cur_lane = lane_ids0
    compacted = False
    for c in level_caps:
        kw = dict(lane_s=cur_lane, compacted=compacted,
                  cap=pass_cap_for(state[0].shape[0]))

        def guard_cond(carry, _c=c, _kw=kw):
            st, n = carry
            return (active_count(st) > _c) & (n < budget)

        def guard_body(carry, _kw=kw):
            st, n = carry
            return block(st, **_kw), n + 1

        state, used = lax.while_loop(guard_cond, guard_body,
                                     (state, jnp.int32(0)))
        budget = budget - used
        state, cur_lane = compact_level(state, cur_lane, c)
        compacted = True

    last_kw = dict(lane_s=cur_lane, compacted=True,
                   cap=pass_cap_for(state[0].shape[0]))

    def final_cond(carry):
        st, n = carry
        return jnp.any(lane_active(st)) & (n < budget)

    state, _ = lax.while_loop(
        final_cond, lambda carry: (block(carry[0], **last_kw), carry[1] + 1),
        (state, jnp.int32(0)))
    # Budget exhausted with lanes still unfinished (only possible when the
    # caller shrinks max_rounds far below DEFAULT_MAX_ROUNDS): poison their
    # final position with -1 — same loud-incompleteness contract as
    # compact_level above.  No-op (all indices OOB) on complete runs.
    walks_f = state[1]
    unfinished = lane_active(state)
    g_f = walk_rows_of(state[0], cur_lane)
    walks_f = walks_f.at[
        jnp.where(unfinished, jnp.minimum(g_f, num_walkers),
                  num_walkers), length].set(-1, mode="drop")
    return walks_f[:, : length + 1]


def node2vec_walk_fat(edge_tab, node_tab, hash_table, target_nodes, meta,
                      hash_log_size, hash_salt, p, q, walk_length, seed,
                      walker_offset=0, max_rounds=common.DEFAULT_MAX_ROUNDS,
                      unroll=4, fat6=None, sampler="mixture",
                      walks_per_lane=None):
    """node2vec p/q-biased walks over fat tables + cuckoo membership.

    Bit-identical to ops.node2vec.node2vec_walk_csr: every walker consumes
    threefry rounds (step, 0), (step, 1), ... in order and resolves on the
    same round with the same accepted candidate; rearranging WHEN each round
    is evaluated (freezing, compaction) never changes WHAT it evaluates to.

    Structure per step (sized for B >= 4096; small batches take a flat path):

    1. Two full-batch rounds with NO hash lookups: for cand != t the
       acceptance threshold is prob_1 or prob_2 depending on the distance-1
       test, so r < min(prob_1, prob_2) accepts and r >= max(...) rejects
       regardless of it — only r inside the band needs the cuckoo query.
       Banded ("frozen") walkers do not consume the round; they redraw the
       identical (step, round) counters in a later level, where hashing
       always happens.  This removes the 2 hash row-gathers (2/3 of the
       gather rows) from the bulk of all draws.
    2. Hierarchical straggler compaction: unresolved walkers compact into
       level 1 (capacity C1 < B); level 2 compacts *within level 1's
       arrays*, and so on — so cumsum/scatter costs shrink geometrically
       instead of paying O(B) per level.  Each level runs 2 hashed rounds.
       Results unwind level-by-level with one small scatter each, then one
       full-B scatter at the top.
    3. A small-capacity while_loop tail (flat, full-B compaction per
       iteration) catches level-capacity overflow and extreme stragglers.
    """
    num_walkers = target_nodes.shape[0]
    branch = rejection_branch(p, q, num_walkers, fat6 is not None)
    if branch == "bloom":
        return _node2vec_freerun(fat6[0], fat6[1], hash_table, target_nodes,
                                 meta, hash_log_size, hash_salt, p, q,
                                 walk_length, seed, walker_offset, max_rounds,
                                 sampler=sampler,
                                 walks_per_lane=walks_per_lane)
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    hi_acc = max(prob_1, prob_2)
    small = branch == "small"
    sentinel = num_walkers  # out-of-bounds scatter index == dropped

    t0_ = target_nodes.astype(jnp.int32)
    t_row0 = node_tab[jnp.clip(t0_, 0, meta.num_nodes - 1)]
    unpack3 = meta.layout.unpack

    def contains(u, v):
        return _edge_set_contains(hash_table, hash_log_size, hash_salt, u, v)

    def accept_full(cand, r, t_sub, nbr):
        is_t = cand == t_sub
        return jnp.where(is_t, r < prob_0,
                         jnp.where(nbr, r < prob_1, r < prob_2))

    def draw(v_rows, wid_u32, c1):
        """One candidate draw per lane -> (cand_row, cand, r).  Dead-end
        lanes (deg == 0) return their own row (stay in place)."""
        _, start, deg = unpack3(v_rows)
        b_cand, b_acc = prng.counter_bits(key, wid_u32, c1)
        off = prng.randint_from_bits(b_cand, jnp.maximum(deg, 1))
        e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
        rows = edge_tab[e]
        rows = jnp.where((deg > 0)[:, None], rows, v_rows)
        return rows, unpack3(rows)[0], prng.uniform_from_bits(b_acc)

    # First hop: plain uniform draw (rw_cpu.cpp:159).
    wid_full = common.walker_ids(num_walkers, walker_offset)
    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    v_row, v_init, _ = draw(t_row0, wid_full, c1)

    level_caps = [] if small else _hier_schedule(p, q, num_walkers)
    tail_capacity = min(2048, num_walkers)
    tail_rounds = 8 if not small else 1

    # Speculative scanning path (see step_fn): measured to win only when the
    # frozen band is narrow enough that hash traffic nearly vanishes (e.g.
    # q == 1 regimes, where band == 0 and NO draw ever needs the cuckoo set);
    # at moderate bands (p=.5,q=2: f=0.5) the hierarchical path is faster on
    # v5e — see BENCHLOG.md.
    band = hi_acc - lo_acc
    f_ratio = band / (band + lo_acc) if (band + lo_acc) > 0 else 1.0
    spec = branch == "speculative"
    spec_rounds = 6
    spec_hash_cap = min(
        num_walkers,
        max(((int(1.25 * max(f_ratio, 0.15) * num_walkers) + 127)
             // 128) * 128, 256))

    def hashed_rounds(step_u32, t_s, vrow_s, wid_s, rnd_s, l_res, l_sel,
                      rounds):
        """`rounds` consecutive full-acceptance (hashed) rejection rounds."""
        for _ in range(rounds):
            c1 = prng.step_round_counter(step_u32, rnd_s)
            cand_row, cand, r = draw(vrow_s, wid_s, c1)
            nbr = contains(t_s, cand)
            take = ~l_res & accept_full(cand, r, t_s, nbr)
            l_sel = jnp.where(take[:, None], cand_row, l_sel)
            l_res = l_res | take
            rnd_s = rnd_s + 1
        return l_res, l_sel, rnd_s

    def spec_phase(step_u32, t, v_row, resolved0):
        """Speculative scan: ``spec_rounds`` no-hash rounds classifying every
        draw as sure-accept / sure-reject / frozen, tracking the first sure
        accept and up to two frozen candidates in registers; then ONE
        compacted hash pass resolves the frozen draws in round order.
        Walkers whose outcome is still open enter the tail with the exact
        round to replay from (redraws are deterministic, so exactness and
        bit-identity hold).  Returns (resolved, sel_row, rnd)."""
        has_a = resolved0          # dead ends count as already-accepted
        a_row = v_row
        n_f = jnp.zeros((num_walkers,), jnp.int32)
        f1_row = v_row
        f1_r = jnp.zeros((num_walkers,), jnp.float32)
        f1_rnd = jnp.zeros((num_walkers,), jnp.uint32)
        f2_row = v_row
        f2_r = jnp.zeros((num_walkers,), jnp.float32)
        overflow = jnp.zeros((num_walkers,), bool)
        stop3_rnd = jnp.zeros((num_walkers,), jnp.uint32)
        stopped = resolved0
        for k in range(spec_rounds):
            c1 = jnp.full((num_walkers,),
                          prng.step_round_counter(step_u32, jnp.uint32(k)),
                          jnp.uint32)
            row, cand, r = draw(v_row, wid_full, c1)
            is_t = cand == t
            is_a = jnp.where(is_t, r < prob_0, r < lo_acc)
            is_r = jnp.where(is_t, r >= prob_0, r >= hi_acc)
            is_f = ~is_a & ~is_r
            scan = ~stopped
            new_f1 = scan & is_f & (n_f == 0)
            new_f2 = scan & is_f & (n_f == 1)
            new_f3 = scan & is_f & (n_f == 2)
            f1_row = jnp.where(new_f1[:, None], row, f1_row)
            f1_r = jnp.where(new_f1, r, f1_r)
            f1_rnd = jnp.where(new_f1, jnp.uint32(k), f1_rnd)
            f2_row = jnp.where(new_f2[:, None], row, f2_row)
            f2_r = jnp.where(new_f2, r, f2_r)
            n_f = n_f + (new_f1 | new_f2 | new_f3).astype(jnp.int32)
            overflow = overflow | new_f3
            stop3_rnd = jnp.where(new_f3, jnp.uint32(k), stop3_rnd)
            new_a = scan & is_a
            a_row = jnp.where(new_a[:, None], row, a_row)
            has_a = has_a | new_a
            stopped = stopped | new_a | new_f3

        clean = has_a & (n_f == 0)
        resolved = clean
        sel_row = jnp.where(clean[:, None], a_row, v_row)
        pending = ~clean & (n_f >= 1)
        # Tail-entry round if never served below: replay from the first
        # frozen draw; frozen-free no-accept walkers replay from spec_rounds.
        rnd = jnp.where(clean, 0,
                        jnp.where(pending, f1_rnd,
                                  jnp.uint32(spec_rounds)))

        # Compacted hash pass over pending walkers.
        idx = _compact(pending, spec_hash_cap)
        safe = jnp.minimum(idx, num_walkers - 1)
        act = idx < num_walkers
        t_s = t[safe]
        c1s = unpack3(f1_row[safe])[0]
        acc1 = jnp.where(contains(t_s, c1s), f1_r[safe] < prob_1,
                         f1_r[safe] < prob_2)
        c2s = unpack3(f2_row[safe])[0]
        acc2 = (n_f[safe] >= 2) & jnp.where(contains(t_s, c2s),
                                            f2_r[safe] < prob_1,
                                            f2_r[safe] < prob_2)
        l_sel = jnp.where(acc1[:, None], f1_row[safe],
                          jnp.where(acc2[:, None], f2_row[safe],
                                    a_row[safe]))
        l_res = acc1 | acc2 | (~overflow[safe] & has_a[safe])
        l_rnd = jnp.where(overflow[safe], stop3_rnd[safe],
                          jnp.uint32(spec_rounds))
        win = l_res & act
        idx_w = jnp.where(win, idx, num_walkers)
        sel_row = sel_row.at[idx_w].set(l_sel)
        resolved = resolved.at[idx_w].set(True)
        rnd = rnd.at[jnp.where(act, idx, num_walkers)].set(l_rnd)
        # Winners' rnd was clobbered with a tail value; harmless (unused).
        return resolved, sel_row, rnd

    def step_fn(carry, step_u32):
        t, v_row = carry
        v = unpack3(v_row)[0]
        v_deg = unpack3(v_row)[2]

        if spec:
            resolved, sel_row, rnd = spec_phase(step_u32, t, v_row,
                                                v_deg == 0)
            return _finish_step(step_u32, t, v, v_row, resolved, sel_row, rnd)

        # Dead ends resolve immediately to v (candidate == v every round and
        # some round always accepts; the value is v either way).
        resolved = v_deg == 0
        sel_row = v_row
        rnd = jnp.zeros((num_walkers,), jnp.uint32)

        # Full-batch rounds.
        for _ in range(2):
            c1 = prng.step_round_counter(step_u32, rnd)
            cand_row, cand, r = draw(v_row, wid_full, c1)
            if small:
                nbr = contains(t, cand)
                take = ~resolved & accept_full(cand, r, t, nbr)
                served = jnp.ones((num_walkers,), bool)
            else:
                is_t = cand == t
                dec_acc = jnp.where(is_t, r < prob_0, r < lo_acc)
                dec_rej = jnp.where(is_t, r >= prob_0, r >= hi_acc)
                served = dec_acc | dec_rej
                take = ~resolved & dec_acc
            sel_row = jnp.where(take[:, None], cand_row, sel_row)
            resolved = resolved | take
            rnd = rnd + served.astype(jnp.uint32)

        # Hierarchical compacted levels (2 hashed rounds each).  The down
        # pass saves each parent's (res, sel, rnd) so the up pass can scatter
        # the child's outcomes into exactly the lanes it was compacted from.
        stack = []
        cur_t, cur_vrow, cur_wid = t, v_row, wid_full
        cur_res, cur_sel, cur_rnd = resolved, sel_row, rnd
        cur_size = num_walkers
        for cap, lvl_rounds in level_caps:
            idx = _compact(~cur_res, cap)
            safe = jnp.minimum(idx, cur_size - 1)
            act = idx < cur_size
            stack.append((idx, act, cur_size, cur_res, cur_sel, cur_rnd))
            cur_t = cur_t[safe]
            cur_vrow = cur_vrow[safe]
            cur_wid = cur_wid[safe]
            cur_res, cur_sel, cur_rnd = hashed_rounds(
                step_u32, cur_t, cur_vrow, cur_wid, cur_rnd[safe], ~act,
                cur_vrow, lvl_rounds)
            cur_size = cap
        for idx, act, parent_size, p_res, p_sel, p_rnd in reversed(stack):
            win = cur_res & act
            idx_w = jnp.where(win, idx, parent_size)
            p_sel = p_sel.at[idx_w].set(cur_sel)
            p_res = p_res.at[idx_w].set(True)
            p_rnd = p_rnd.at[jnp.where(act, idx, parent_size)].set(cur_rnd)
            cur_res, cur_sel, cur_rnd = p_res, p_sel, p_rnd
        resolved, sel_row, rnd = cur_res, cur_sel, cur_rnd
        return _finish_step(step_u32, t, v, v_row, resolved, sel_row, rnd)

    def _finish_step(step_u32, t, v, v_row, resolved, sel_row, rnd):
        """Flat while_loop tail shared by both rejection paths: catches
        capacity overflow + extreme stragglers (full-B compaction per
        iteration, tiny capacity), then emits the step result."""

        def tail_level(state):
            res, sel, rn = state
            idx = _compact(~res, tail_capacity)
            safe = jnp.minimum(idx, sentinel - 1)
            act = idx < sentinel
            l_res, l_sel, l_rnd = hashed_rounds(
                step_u32, t[safe], v_row[safe], wid_full[safe], rn[safe],
                ~act, v_row[safe], tail_rounds)
            win = l_res & act
            idx_w = jnp.where(win, idx, sentinel)
            sel = sel.at[idx_w].set(l_sel)
            res = res.at[idx_w].set(True)
            rn = rn.at[jnp.where(act, idx, sentinel)].set(l_rnd)
            return res, sel, rn

        def cond(state):
            res, _, rn = state
            return jnp.logical_and(~jnp.all(res),
                                   rn.max() < jnp.uint32(max_rounds))

        _, sel_row, _ = lax.while_loop(cond, tail_level,
                                       (resolved, sel_row, rnd))
        nxt = unpack3(sel_row)[0]
        return (v, sel_row), nxt

    if walk_length < 2:
        return jnp.concatenate([t0_[:, None], v_init[:, None]], axis=1)
    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, (t0_, v_row), steps,
                      unroll=min(unroll, walk_length - 1))
    return jnp.concatenate([t0_[:, None], v_init[:, None], seq.T], axis=1)


def uniform_walk_edge_list_fat(edge_tab, node_tab, target_nodes, meta,
                               walk_length, seed, padding_idx, restart,
                               walker_offset=0, unroll=8):
    """Edge-list walks with padding/restart semantics, one row gather/step.

    Bit-identical to ops.edge_list_walk.uniform_walk_edge_list.  Packed rows
    carry (tail, start_tail, cnt_tail); cnt == 0 encodes the reference's
    (-1, -1) no-out-edges sentinel (rw_cpu_edge_list.cpp:21-22), so the walk
    semantics are: at padding -> jump (target if restart else padding);
    cnt == 0 -> padding; else a uniform out-edge of cur.
    """
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_EDGE_UNIFORM)
    cur0 = target_nodes.astype(jnp.int32)
    pad = jnp.int32(padding_idx)

    safe0 = jnp.clip(cur0, 0, meta.num_nodes - 1)
    _, start0, cnt0 = meta.layout.unpack(node_tab[safe0])
    if restart:
        jump, jump_start, jump_cnt = cur0, start0, cnt0
    else:
        jump = jnp.full_like(cur0, pad)
        jump_start = jnp.zeros_like(start0)
        jump_cnt = jnp.zeros_like(cnt0)

    def step_fn(carry, s):
        cur, start, cnt = carry
        c1 = jnp.full((num_walkers,), prng.step_round_counter(s), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
        e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
        tail, t_start, t_cnt = meta.layout.unpack(edge_tab[e])
        at_pad = cur == pad
        has = cnt > 0
        nxt = jnp.where(at_pad, jump, jnp.where(has, tail, pad))
        nstart = jnp.where(at_pad, jump_start, jnp.where(has, t_start, 0))
        ncnt = jnp.where(at_pad, jump_cnt, jnp.where(has, t_cnt, 0))
        return (nxt, nstart, ncnt), nxt

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, (cur0, start0, cnt0), steps,
                      unroll=min(unroll, walk_length) if walk_length else 1)
    return jnp.concatenate([cur0[:, None], seq.T], axis=1)


def uniform_walk_triples_fat(triple_tab, node_meta, target_nodes, walk_length,
                             padding_idx, seed, num_entities, num_triples,
                             walker_offset=0, unroll=8):
    """KG-triples walks [v0, r1, v1, ...], one (T, 4) row gather per step.

    Bit-identical to ops.triples_walk.uniform_walk_triples; padding absorbs
    (rw_cpu_triples.cpp:38-42).
    """
    num_walkers = target_nodes.shape[0]
    wid = common.walker_ids(num_walkers, walker_offset)
    key = prng.derive_key(seed, prng.STREAM_TRIPLES)
    cur0 = target_nodes.astype(jnp.int32)
    pad = jnp.int32(padding_idx)

    safe0 = jnp.clip(cur0, 0, max(num_entities - 1, 0))
    meta0 = node_meta[safe0]
    start0, cnt0 = meta0[:, 0], meta0[:, 1]
    # Padding / unknown entry behaves as a dead end from step 1.
    valid0 = (cur0 != pad) & (cur0 >= 0) & (cur0 < num_entities)
    cnt0 = jnp.where(valid0, cnt0, 0)

    def step_fn(carry, s):
        start, cnt = carry
        c1 = jnp.full((num_walkers,), prng.step_round_counter(s), jnp.uint32)
        bits, _ = prng.counter_bits(key, wid, c1)
        off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
        i = jnp.clip(start + off, 0, max(num_triples - 1, 0))
        row = triple_tab[i]             # (B, 4): rel, tail, start_t, cnt_t
        has = cnt > 0
        rel = jnp.where(has, row[:, 0], pad)
        tail = jnp.where(has, row[:, 1], pad)
        nstart = jnp.where(has, row[:, 2], 0)
        ncnt = jnp.where(has, row[:, 3], 0)
        return (nstart, ncnt), (rel, tail)

    steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
    _, (rels, tails) = lax.scan(step_fn, (start0, cnt0), steps,
                                unroll=min(unroll, walk_length)
                                if walk_length else 1)
    walks = jnp.zeros((num_walkers, 2 * walk_length + 1), jnp.int32)
    walks = walks.at[:, 0].set(cur0)
    if walk_length:
        walks = walks.at[:, 1::2].set(rels.T)
        walks = walks.at[:, 2::2].set(tails.T)
    return walks


def node2vec_walk_edge_list_fat(edge_tab, node_tab, hash_table, target_nodes,
                                meta, hash_log_size, hash_salt, p, q,
                                walk_length, seed, padding_idx, restart,
                                walker_offset=0,
                                max_rounds=common.DEFAULT_MAX_ROUNDS,
                                unroll=None, walks_per_lane=None):
    """Biased edge-list walks (padding/restart semantics), fat tables +
    cuckoo membership.  Bit-identical to
    ops.edge_list_walk.biased_walk_edge_list (same counters, same
    acceptance — rw_cpu_edge_list.cpp:195-232 semantics).

    Delegates to the free-running engine (r4); the step-synchronous
    implementation below remains as a tested bit-identity cross-check
    (_node2vec_edge_list_stepwise).  ``unroll`` forwards to the freerun
    engine's ``round_unroll`` (None = its platform default — ADVICE r4
    flagged the silently-inert parameter); unroll never changes walk
    values, only trace structure."""
    return node2vec_walk_edge_list_freerun(
        edge_tab, node_tab, hash_table, target_nodes, meta, hash_log_size,
        hash_salt, p, q, walk_length, seed, padding_idx, restart,
        walker_offset, max_rounds, round_unroll=unroll,
        walks_per_lane=walks_per_lane)


def _node2vec_edge_list_stepwise(edge_tab, node_tab, hash_table, target_nodes,
                                 meta, hash_log_size, hash_salt, p, q,
                                 walk_length, seed, padding_idx, restart,
                                 walker_offset=0,
                                 max_rounds=common.DEFAULT_MAX_ROUNDS,
                                 unroll=4):
    """Step-synchronous biased edge-list engine (pre-r4): two full-batch
    hashed rounds per step, then a compacted while_loop tail — every step
    pays the max-of-B-geometrics straggler wait (measured 2.5M steps/s at
    B=64K where the free-running engine above runs one exact 3-gather
    round per lane-step).  Kept as the bit-identity cross-check for the
    freerun engine (tests/test_fatwalk.py asserts equality).
    """
    num_walkers = target_nodes.shape[0]
    key = prng.derive_key(seed, prng.STREAM_EDGE_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    pad = jnp.int32(padding_idx)
    sentinel = num_walkers
    # Tail capacity: measured r4 — WIDENING this is a 5x LOSS (0.51M vs
    # 2.51M steps/s at B=64K with a floor-acceptance-sized ~0.84B cap):
    # the two full-batch rounds resolve far more lanes than the
    # worst-case acceptance floor predicts, so a wide tail mostly gathers
    # padding.  The engine's 2.5M ceiling lives in the per-STEP
    # synchronous structure itself (every step pays 2 full-B 3-gather
    # rounds + a serialized tail while_loop) — the fix is the CSR
    # engine's free-running rounds, not tail sizing (round-5 item,
    # BENCHLOG r4 family snapshot).  Capacity never changes walk values
    # (same per-lane counters), only where rounds are evaluated.
    tail_capacity = min(2048, num_walkers)
    tail_rounds = 8 if num_walkers >= 4096 else 1
    wid_full = common.walker_ids(num_walkers, walker_offset)

    cur0 = target_nodes.astype(jnp.int32)
    safe0 = jnp.clip(cur0, 0, meta.num_nodes - 1)
    _, start0, cnt0 = meta.layout.unpack(node_tab[safe0])
    if restart:
        jump, jump_start, jump_cnt = cur0, start0, cnt0
    else:
        jump = jnp.full_like(cur0, pad)
        jump_start = jnp.zeros_like(start0)
        jump_cnt = jnp.zeros_like(cnt0)

    def contains(u, v):
        return _edge_set_contains(hash_table, hash_log_size, hash_salt, u, v)

    def draw(cur, start, cnt, j, j_start, j_cnt, wid_u32, c1):
        """Candidate + its meta, mirroring common.sample_edge_neighbor."""
        b_cand, b_acc = prng.counter_bits(key, wid_u32, c1)
        off = prng.randint_from_bits(b_cand, jnp.maximum(cnt, 1))
        e = jnp.clip(start + off, 0, max(meta.num_edges - 1, 0))
        tail, t_start, t_cnt = meta.layout.unpack(edge_tab[e])
        at_pad = cur == pad
        has = cnt > 0
        cand = jnp.where(at_pad, j, jnp.where(has, tail, pad))
        c_start = jnp.where(at_pad, j_start, jnp.where(has, t_start, 0))
        c_cnt = jnp.where(at_pad, j_cnt, jnp.where(has, t_cnt, 0))
        return cand, c_start, c_cnt, prng.uniform_from_bits(b_acc)

    def round_eval(t_s, cand, c_start, c_cnt, r, j, j_start, j_cnt):
        """Acceptance + the value/meta an accepting walker moves to."""
        is_t = cand == t_s
        is_pad = cand == pad
        nbr = contains(t_s, cand)
        accept = jnp.where(is_t | is_pad, r < prob_0,
                           jnp.where(nbr, r < prob_1, r < prob_2))
        move_jump = is_pad & ~is_t
        value = jnp.where(move_jump, j, cand)
        v_start = jnp.where(move_jump, j_start, c_start)
        v_cnt = jnp.where(move_jump, j_cnt, c_cnt)
        return accept, value, v_start, v_cnt

    # First hop: plain uniform edge-list step (biased stream, step 1).
    c1 = jnp.full((num_walkers,), prng.step_round_counter(1), jnp.uint32)
    b_first, _ = prng.counter_bits(key, wid_full, c1)
    off = prng.randint_from_bits(b_first, jnp.maximum(cnt0, 1))
    e = jnp.clip(start0 + off, 0, max(meta.num_edges - 1, 0))
    tail0, ts0, tc0 = meta.layout.unpack(edge_tab[e])
    at_pad0 = cur0 == pad
    has0 = cnt0 > 0
    v = jnp.where(at_pad0, jump, jnp.where(has0, tail0, pad))
    v_start = jnp.where(at_pad0, jump_start, jnp.where(has0, ts0, 0))
    v_cnt = jnp.where(at_pad0, jump_cnt, jnp.where(has0, tc0, 0))

    def step_fn(carry, step_u32):
        t, v, v_start, v_cnt = carry
        resolved = jnp.zeros((num_walkers,), bool)
        sel, sel_start, sel_cnt = v, v_start, v_cnt
        rnd = jnp.zeros((num_walkers,), jnp.uint32)

        for _ in range(2):
            c1 = prng.step_round_counter(step_u32, rnd)
            cand, c_start, c_cnt, r = draw(v, v_start, v_cnt, jump,
                                           jump_start, jump_cnt, wid_full, c1)
            accept, value, val_start, val_cnt = round_eval(
                t, cand, c_start, c_cnt, r, jump, jump_start, jump_cnt)
            take = ~resolved & accept
            sel = jnp.where(take, value, sel)
            sel_start = jnp.where(take, val_start, sel_start)
            sel_cnt = jnp.where(take, val_cnt, sel_cnt)
            resolved = resolved | take
            rnd = rnd + 1

        def tail_level(state):
            res, sel, sel_start, sel_cnt, rn = state
            idx = _compact(~res, tail_capacity)
            safe = jnp.minimum(idx, sentinel - 1)
            act = idx < sentinel
            t_s = t[safe]
            v_s, vs_s, vc_s = v[safe], v_start[safe], v_cnt[safe]
            j_s, js_s, jc_s = jump[safe], jump_start[safe], jump_cnt[safe]
            wid_s = safe.astype(jnp.uint32) + jnp.uint32(walker_offset)
            rnd_s = rn[safe]
            l_res = ~act
            l_sel, l_ss, l_sc = v_s, vs_s, vc_s
            for k in range(tail_rounds):
                c1 = prng.step_round_counter(step_u32,
                                             rnd_s + jnp.uint32(k))
                cand, c_start, c_cnt, r = draw(v_s, vs_s, vc_s, j_s, js_s,
                                               jc_s, wid_s, c1)
                accept, value, val_start, val_cnt = round_eval(
                    t_s, cand, c_start, c_cnt, r, j_s, js_s, jc_s)
                take = ~l_res & accept
                l_sel = jnp.where(take, value, l_sel)
                l_ss = jnp.where(take, val_start, l_ss)
                l_sc = jnp.where(take, val_cnt, l_sc)
                l_res = l_res | accept
            win = l_res & act
            idx_w = jnp.where(win, idx, sentinel)
            sel = sel.at[idx_w].set(l_sel)
            sel_start = sel_start.at[idx_w].set(l_ss)
            sel_cnt = sel_cnt.at[idx_w].set(l_sc)
            res = res.at[idx_w].set(True)
            rn = rn.at[jnp.where(act, idx, sentinel)].add(
                jnp.uint32(tail_rounds))
            return res, sel, sel_start, sel_cnt, rn

        def cond(state):
            res, _, _, _, rn = state
            return jnp.logical_and(~jnp.all(res),
                                   rn.max() < jnp.uint32(max_rounds))

        _, sel, sel_start, sel_cnt, _ = lax.while_loop(
            cond, tail_level, (resolved, sel, sel_start, sel_cnt, rnd))
        return (v, sel, sel_start, sel_cnt), sel

    if walk_length < 2:
        return jnp.concatenate([cur0[:, None], v[:, None]], axis=1)
    steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
    _, seq = lax.scan(step_fn, (cur0, v, v_start, v_cnt), steps,
                      unroll=min(unroll, walk_length - 1))
    return jnp.concatenate([cur0[:, None], v[:, None], seq.T], axis=1)


def node2vec_walk_edge_list_freerun(edge_tab, node_tab, hash_table,
                                    target_nodes, meta, hash_log_size,
                                    hash_salt, p, q, walk_length, seed,
                                    padding_idx, restart, walker_offset=0,
                                    max_rounds=common.DEFAULT_MAX_ROUNDS,
                                    rounds_per_block=3, slack=1.1,
                                    round_unroll=None, walks_per_lane=None):
    """Free-running biased edge-list walks — the r4 production engine.

    The step-synchronous engine above pays, EVERY step, two full-batch
    3-gather rounds plus a serialized compacted tail while_loop — the
    max-of-B-geometrics shape the CSR engine abandoned in r2 (measured
    2.5M steps/s at B=64K where CSR reaches 20M on the same graph scale).
    Here each lane advances through its OWN walk: one draw per round
    (1 fat-row gather + 2 cuckoo gathers — membership is exact in-round,
    so no freeze/pend machinery is needed at all), then a multi-level
    compacted straggler drain.  Draws consume the identical
    (wid, step, round) threefry counters in per-lane round order, so
    walks are bit-identical to the step-synchronous engine and the jnp
    reference (asserted in tests/test_walks_edge_list.py +
    tests/test_fatwalk.py).

    Padding/restart semantics per rw_cpu_edge_list.cpp:195-232: a lane AT
    padding draws its jump node (target if ``restart`` else padding); a
    PAD candidate gates on prob_0 and an accept moves to the jump node.

    **Virtual lanes (r5, same scheme as the CSR engine)**: with
    ``walks_per_lane = V > 1`` each of ``B / V`` lanes advances V whole
    walks back to back; completed lanes refill with the next walk's start
    node (and its RESTART jump state, which is per-walk) in a compacted
    refill pass appended to every block.  Walks stay bit-identical for
    every V (draws keyed by global walker id).
    """
    num_walkers = target_nodes.shape[0]
    key = prng.derive_key(seed, prng.STREAM_EDGE_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    pad = jnp.int32(padding_idx)
    length = walk_length
    m = jnp.uint32(prng.MAX_ROUNDS_PER_STEP)
    cols = jnp.arange(length + 2, dtype=jnp.int32)
    if round_unroll is None:
        round_unroll = (rounds_per_block
                        if jax.default_backend() == "tpu" else 2)
    # Auto V stays 1: the r5 TPU sweeps measured V > 1 slower everywhere
    # (see the CSR engine's note — the gather rate falls with fewer rows
    # in flight).  The knob remains for explicit use.
    V = walks_per_lane
    if V is None or num_walkers % V:
        V = 1
    lanes = num_walkers // V
    lane_ids0 = jnp.arange(lanes, dtype=jnp.int32)
    slot_ids = jnp.arange(V, dtype=jnp.int32)

    a = max(min(prob_0, prob_1, prob_2), 0.05)
    est_rounds = (int(slack * V * max(length, 1) / a)
                  + V * rounds_per_block)
    scan_blocks = max(est_rounds // rounds_per_block, 1)
    drain_blocks = max_rounds // rounds_per_block + 2
    refill_cap = min(lanes, max(
        ((int(2.0 * (a / max(length, 1)) * rounds_per_block * lanes)
          + 127) // 128) * 128, 256)) if V > 1 else 0

    all_t0 = target_nodes.astype(jnp.int32)
    cur0 = all_t0[:lanes]
    safe0 = jnp.clip(cur0, 0, meta.num_nodes - 1)
    _, start0, cnt0 = meta.layout.unpack(node_tab[safe0])
    if restart:
        jump0, js0, jc0 = cur0, start0, cnt0
    else:
        jump0 = jnp.full_like(cur0, pad)
        js0 = jnp.zeros_like(start0)
        jc0 = jnp.zeros_like(cnt0)

    walks0 = jnp.zeros((num_walkers, length + 2), jnp.int32)
    walks0 = walks0.at[:, 0].set(all_t0)

    def contains(u, v):
        return _edge_set_contains(hash_table, hash_log_size, hash_salt, u, v)

    def rows_of(k, lane_s):
        return jnp.where(lane_s >= lanes, num_walkers, k * lanes + lane_s)

    def wid_of(k, lane_s):
        return (jnp.uint32(walker_offset)
                + (k * lanes + jnp.minimum(lane_s, lanes - 1))
                .astype(jnp.uint32))

    def one_round(st, lane_s, compacted):
        wbuf = st[11] if len(st) == 12 else None
        t, v, vs, vc, j, js, jc, step, rnd, k, walks = st[:11]
        active = step < length
        s = step + 1
        c1 = s.astype(jnp.uint32) * m + rnd
        b_cand, b_acc = prng.counter_bits(key, wid_of(k, lane_s), c1)
        off = prng.randint_from_bits(b_cand, jnp.maximum(vc, 1))
        e = jnp.clip(vs + off, 0, max(meta.num_edges - 1, 0))
        tail, t_start, t_cnt = meta.layout.unpack(edge_tab[e])
        at_pad = v == pad
        has = vc > 0
        cand = jnp.where(at_pad, j, jnp.where(has, tail, pad))
        c_start = jnp.where(at_pad, js, jnp.where(has, t_start, 0))
        c_cnt = jnp.where(at_pad, jc, jnp.where(has, t_cnt, 0))
        r = prng.uniform_from_bits(b_acc)
        is_t = cand == t
        is_pad = cand == pad
        nbr = contains(t, cand)
        accept = jnp.where(is_t | is_pad, r < prob_0,
                           jnp.where(nbr, r < prob_1, r < prob_2))
        move_jump = is_pad & ~is_t
        value = jnp.where(move_jump, j, cand)
        val_s = jnp.where(move_jump, js, c_start)
        val_c = jnp.where(move_jump, jc, c_cnt)
        is_first = step == 0
        # First hop: plain uniform draw, no acceptance, no pad->jump move
        # (the walk lands on the drawn tail or absorbs at pad) — exactly
        # the step-synchronous engine's first-hop block.
        value = jnp.where(is_first, cand, value)
        val_s = jnp.where(is_first, c_start, val_s)
        val_c = jnp.where(is_first, c_cnt, val_c)
        acc = active & (is_first | accept)
        t = jnp.where(acc, v, t)
        v = jnp.where(acc, value, v)
        vs = jnp.where(acc, val_s, vs)
        vc = jnp.where(acc, val_c, vc)
        step = step + acc.astype(step.dtype)
        rnd = jnp.where(acc, 0, rnd + (active & ~acc).astype(jnp.uint32))
        if wbuf is not None:
            # V > 1 scan phase: emit into the (lanes, L+2) current-walk
            # buffer so per-round emission is O(lanes·L), not O(B·L) —
            # same fix as the CSR engine (see its one_round).
            wbuf = jnp.where(acc[:, None] & (cols[None, :] == s[:, None]),
                             value[:, None], wbuf)
            return t, v, vs, vc, j, js, jc, step, rnd, k, walks, wbuf
        if not compacted:
            w3 = walks.reshape(V, lanes, length + 2)
            mask = (acc[None, :, None]
                    & (slot_ids[:, None, None] == k[None, :, None])
                    & (cols[None, None, :] == s[None, :, None]))
            walks = jnp.where(mask, value[None, :, None], w3).reshape(
                num_walkers, length + 2)
        else:
            walks = walks.at[rows_of(k, lane_s),
                             jnp.where(acc, s, length + 1)].set(
                value, indices_are_sorted=(V == 1), unique_indices=True)
        return t, v, vs, vc, j, js, jc, step, rnd, k, walks

    def refill_pass(st, lane_s):
        """Compacted refill (V > 1 only): lanes whose walk finished restart
        at walk k+1's start node with fresh per-walk jump state.  With the
        scan-phase walk buffer present, the finished walk's buffer row is
        flushed to the walk array here."""
        wbuf = st[11] if len(st) == 12 else None
        t, v, vs, vc, j, js, jc, step, rnd, k, walks = st[:11]
        size = step.shape[0]
        need = (step >= length) & (k < V - 1) & (lane_s < lanes)
        idx = _compact(need, refill_cap)
        safe = jnp.minimum(idx, size - 1)
        act = idx < size
        k_s = k[safe]
        lane_sub = lane_s[safe]
        nxt_widx = jnp.clip((k_s + 1) * lanes
                            + jnp.minimum(lane_sub, lanes - 1),
                            0, num_walkers - 1)
        t_new = all_t0[nxt_widx]
        safe_t = jnp.clip(t_new, 0, meta.num_nodes - 1)
        _, n_start, n_cnt = meta.layout.unpack(node_tab[safe_t])
        if restart:
            nj, njs, njc = t_new, n_start, n_cnt
        else:
            nj = jnp.full_like(t_new, pad)
            njs = jnp.zeros_like(n_start)
            njc = jnp.zeros_like(n_cnt)
        i_act = jnp.where(act, idx, size)
        kw = dict(indices_are_sorted=True, unique_indices=True)
        t = t.at[i_act].set(t_new, **kw)
        v = v.at[i_act].set(t_new, **kw)
        vs = vs.at[i_act].set(n_start, **kw)
        vc = vc.at[i_act].set(n_cnt, **kw)
        j = j.at[i_act].set(nj, **kw)
        js = js.at[i_act].set(njs, **kw)
        jc = jc.at[i_act].set(njc, **kw)
        step = step.at[i_act].set(0, **kw)
        rnd = rnd.at[i_act].set(0, **kw)
        k = k.at[i_act].set(k_s + 1, **kw)
        if wbuf is not None:
            ok = act & (lane_sub < lanes)
            f_rows = jnp.where(ok, jnp.clip(k_s * lanes + lane_sub, 0,
                                            num_walkers - 1), num_walkers)
            walks = walks.at[f_rows].set(
                wbuf[jnp.minimum(lane_sub, lanes - 1)], mode="drop",
                unique_indices=True)
            fresh = (jnp.zeros((idx.shape[0], length + 2), jnp.int32)
                     .at[:, 0].set(t_new))
            wbuf = wbuf.at[jnp.where(ok, lane_sub, lanes)].set(
                fresh, mode="drop", unique_indices=True)
            return t, v, vs, vc, j, js, jc, step, rnd, k, walks, wbuf
        return t, v, vs, vc, j, js, jc, step, rnd, k, walks

    def block(st, lane_s=None, compacted=False):
        lane_s = lane_ids0 if lane_s is None else lane_s
        st = lax.scan(lambda s_, _: (one_round(s_, lane_s, compacted), 0),
                      st, None, length=rounds_per_block,
                      unroll=round_unroll)[0]
        if V > 1:
            st = refill_pass(st, lane_s)
        return st

    state = (cur0, cur0, start0, cnt0, jump0, js0, jc0,
             jnp.zeros((lanes,), jnp.int32),
             jnp.zeros((lanes,), jnp.uint32),
             jnp.zeros((lanes,), jnp.int32), walks0)
    if V > 1:
        state = state + (
            jnp.zeros((lanes, length + 2), jnp.int32).at[:, 0].set(cur0),)
    # t starts as cur0 (never consulted at step 0: first hop accepts any).
    state, _ = lax.scan(lambda st, _: (block(st), 0), state,
                        jnp.arange(scan_blocks))
    if V > 1:
        # Flush every lane's current-walk buffer row before the drain
        # (whose compacted scatters write the walk array directly).
        walks_ = state[10].at[rows_of(state[9], lane_ids0)].set(
            state[11], unique_indices=True)
        state = state[:10] + (walks_,)

    def lane_active(st):
        if V == 1:
            return st[7] < length
        return (st[7] < length) | (st[9] < V - 1)

    def active_count(st):
        return jnp.sum(lane_active(st).astype(jnp.int32))

    def cap_of(frac):
        return min(lanes, max(((lanes // frac) + 127) // 128 * 128, 256))

    level_caps = []
    for frac in (2, 4, 8, 16, 32, 64, 128, 256):
        c = cap_of(frac)
        if not level_caps or c < level_caps[-1]:
            level_caps.append(c)

    def compact_level(st, lane_s, c):
        t, v, vs, vc, j, js, jc, step, rnd, k, walks = st
        size = step.shape[0]
        active = lane_active(st)
        rank = jnp.cumsum(active.astype(jnp.int32)) - 1
        lost = active & (rank >= c)
        g_all = rows_of(k, lane_s)
        walks = walks.at[
            jnp.where(lost, jnp.minimum(g_all, num_walkers), num_walkers),
            length].set(-1, mode="drop")
        idx = _compact(active, c)
        safe = jnp.minimum(idx, size - 1)
        act = idx < size
        new_lane = jnp.where(act, lane_s[safe], lanes)
        sub = (t[safe], v[safe], vs[safe], vc[safe], j[safe], js[safe],
               jc[safe], jnp.where(act, step[safe], length), rnd[safe],
               jnp.where(act, k[safe], V - 1), walks)
        return sub, new_lane

    budget = jnp.int32(drain_blocks)
    cur_lane = lane_ids0
    compacted = False
    for c in level_caps:
        kw = dict(lane_s=cur_lane, compacted=compacted)

        def guard_cond(carry, _c=c):
            st, n = carry
            return (active_count(st) > _c) & (n < budget)

        def guard_body(carry, _kw=kw):
            st, n = carry
            return block(st, **_kw), n + 1

        state, used = lax.while_loop(guard_cond, guard_body,
                                     (state, jnp.int32(0)))
        budget = budget - used
        state, cur_lane = compact_level(state, cur_lane, c)
        compacted = True

    last_kw = dict(lane_s=cur_lane, compacted=True)

    def final_cond(carry):
        st, n = carry
        return jnp.any(lane_active(carry[0])) & (n < budget)

    state, _ = lax.while_loop(
        final_cond, lambda carry: (block(carry[0], **last_kw), carry[1] + 1),
        (state, jnp.int32(0)))
    walks_f = state[10]
    g_f = rows_of(state[9], cur_lane)
    walks_f = walks_f.at[
        jnp.where(lane_active(state), jnp.minimum(g_f, num_walkers),
                  num_walkers), length].set(-1, mode="drop")
    return walks_f[:, : length + 1]
