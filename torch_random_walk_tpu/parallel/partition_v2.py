"""Edge-partitioned walks v2: owner-routed walker exchange (all_to_all).

The v1 engine (parallel/partition.py) proves correctness by *reduction*:
every device answers the full frontier and a psum combines answers — O(B*D)
collective bytes per rejection round.  This module implements the shape
SURVEY.md §2.8 actually calls for: **route each walker to the owner of its
current node**, so every graph gather is local and the only traffic is the
walker records themselves (O(B) bytes per step, independent of D).

Machinery (all shapes static; SURVEY.md §7 hard part 3):

- The graph is node-range partitioned (PartitionedCSR, reused from v1);
  owner(v) = v // shard_nodes.
- A walker is a fixed-width uint32 record.  Each *phase*, every shard:
  processes its arrivals (one local (S, 2) node-meta row gather + one col
  gather + threefry draw per walker), appends (wid, step, node) to a local
  walk log, and compacts departures into per-destination capacity-C buffers
  for ONE ``lax.all_to_all``.
- **Carry-over**: departures beyond a destination's capacity stay in a
  carry buffer and are retransmitted first next phase (FIFO priority, so
  no starvation); walkers simply lag phases, never drop.  Capacity
  accounting is asserted (overflow beyond carry capacity is counted and
  must be 0 — capacities are sized so it cannot happen for B walkers).
- Termination: a psum'd in-flight count; the phase while_loop exits when it
  reaches zero.  Uniform walks take exactly L+1 phases when nothing carries.
- Output: logs are scattered into the (B, L+1) walk tensor by one jitted
  scatter after the shard_map returns.

Exchange cost per *step*: exactly one all_to_all of walker records
(12 bytes/walker for uniform), vs v1's per-round all_gather+psum of the full
frontier on every device.  Exchanged-record and byte counts are returned for
MetricsWriter wiring (VERDICT r1 item 5).

Determinism: draws consume the identical (seed, stream, walker, step)
threefry counters as the single-device engines, so walks are bit-identical
to ops.fatwalk / ops.uniform (asserted in tests/test_partition_v2.py).
Reference semantics: uniform_walk (/root/reference/csrc/cpu/rw_cpu.cpp:58-107)
re-created as a distributed owner-routed sampler.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.ops.common import compact_indices as _compact_idx
from torch_random_walk_tpu.parallel.partition import PartitionedCSR
from torch_random_walk_tpu.utils import prng

# Record layout (uint32 words): wid, step, node.  `step` is the number of
# completed steps; `node` the walker's current node (== walk[step]).
_R_UNIFORM = 3


@dataclasses.dataclass(frozen=True)
class RoutedConfig:
    """Static capacities for the routed exchange.

    pair_capacity: records one shard may send one destination per phase.
    carry_capacity: shared carry-pool slots for departures that exceeded
        their destination's pair_capacity (they retransmit next phase,
        FIFO).  Every walker is at most one record in flight, so a pool of
        B slots guarantees zero-drop against any skew — O(B) memory,
        independent of the shard count.
    max_phases: while_loop bound (~2(L+1) plus carry slack: every step is a
        draw phase at owner(v) plus a log phase at the walker's WID-OWNER,
        where its (blk, L+1) walk shard lives).
    log_capacity: accepted and ignored (pre-r3 compatibility).  Walk logs
        are no longer per-shard buffers: positions scatter into the
        wid-owner's even-share walk shard, so per-shard walk memory is
        EXACTLY B*(L+1)/D — it shrinks with the fleet instead of paying the
        old worst-case B*(L+1) on every chip (VERDICT r2 item 4).
    """

    pair_capacity: int
    log_capacity: int | None = None
    max_phases: int = 0
    carry_capacity: int | None = None

    @property
    def carry(self) -> int:
        return (self.carry_capacity if self.carry_capacity is not None
                else 4 * self.pair_capacity)

    @classmethod
    def for_walk(cls, num_walkers: int, num_shards: int, walk_length: int,
                 balance: float = 4.0) -> "RoutedConfig":
        """Zero-drop default: at most B records are ever in flight (each
        walker is exactly one record — the LOG hop forwards the same
        record), so ``cap + carry >= B`` per destination guarantees
        overflow can never fire, whatever the hub skew.  pair_capacity
        stays ~balance*B/D^2 (the all_to_all payload); the skew tail queues
        in the carry buffer and lags phases instead of dropping."""
        pair = int(balance * max(num_walkers // max(num_shards ** 2, 1), 1))
        pair = max((pair + 127) // 128 * 128, 128)
        # max_phases only bounds the while_loop (it exits on inflight == 0
        # first), so cover worst-case carry queueing — a fully skewed step
        # drains one hot destination at pair_capacity records/phase.  Each
        # step is 2 phases (draw + log).
        drain = (num_walkers + pair - 1) // pair
        return cls(pair_capacity=pair,
                   max_phases=(2 * walk_length + 4) * max(4, drain),
                   carry_capacity=num_walkers)

    @classmethod
    def resolve(cls, config: "RoutedConfig | None", num_walkers: int,
                num_shards: int, walk_length: int) -> "RoutedConfig":
        """Fill in a usable phase budget for a hand-built config.

        ``max_phases`` defaults to 0 on direct construction (the pattern
        every test uses for capacity overrides); left at 0 it would build a
        while_loop that never runs and blame capacities in the
        incomplete-walk error.  Treat 0 as "auto": derive the same
        worst-case-carry bound ``for_walk`` uses, from the config's OWN
        pair_capacity."""
        if config is None:
            return cls.for_walk(num_walkers, num_shards, walk_length)
        if config.max_phases > 0:
            return config
        drain = (num_walkers + config.pair_capacity - 1) // config.pair_capacity
        return dataclasses.replace(
            config, max_phases=(2 * walk_length + 4) * max(4, drain))


def _biased_phase_budget(cfg: "RoutedConfig", walk_length: int,
                         spec_rounds: int) -> "RoutedConfig":
    """Raise a default config's while_loop bound for BIASED engines.

    Rejection tails are geometric: at extreme p/q (e.g. p=4, q=0.25 the
    spike-acceptance prob_0 is 1/16) one walker can legitimately consume
    hundreds of rounds on a step, and each replay phase only advances
    spec_rounds of them.  Budget the same round ceiling as the single-chip
    engines (common.DEFAULT_MAX_ROUNDS); the loop exits on inflight == 0,
    so a generous bound costs nothing at runtime."""
    from torch_random_walk_tpu.ops import common

    need = walk_length * (
        common.DEFAULT_MAX_ROUNDS // max(spec_rounds, 1) + 2)
    if cfg.max_phases >= need:
        return cfg
    return dataclasses.replace(cfg, max_phases=need)


# _compact_idx (first `capacity` True indices, len(mask)-padded) is imported
# from ops/common.py::compact_indices — single implementation shared with
# the single-chip straggler drain (VERDICT r3 #8).


def _to_varying(x, axis: str, exchange: str):
    """pcast a device-invariant while-carry value to varying.

    No-op when the value is ALREADY device-varying (queried from its VMA
    state rather than swallowing pcast's ValueError, which could mask
    unrelated pcast failures) or under the Pallas exchange, whose shard_map
    runs with check_vma=False.
    """
    if exchange == "pallas":
        return x
    if axis in jax.typeof(x).vma:
        return x
    return lax.pcast(x, axis, to="varying")


# np (not jnp): a module-level jnp constant would initialize the XLA
# backend at import time, breaking the jax.distributed.initialize-first
# contract on pods (tests/test_multiprocess.py).
_SENTINEL = np.uint32(0xFFFFFFFF)


def _build_outbox(recs, dests, valid, carry, carry_valid, nshards, cap, ccap):
    """Compact departure records into per-destination (D, cap) exchange
    buffers, carried-over records first (FIFO: no starvation); departures
    beyond a destination's cap go to ONE SHARED carry pool of ``ccap``
    slots for the next phase (the pool keeps each record's destination in
    an extra trailing column).

    A shared pool instead of per-destination buffers (r3): every walker is
    at most one record in flight, so ``ccap >= B`` guarantees zero-drop
    against ANY skew — while the old (D, ccap) carry needed ccap ~ B per
    destination, costing O(D*B) memory AND an O(D^2*B) per-phase scan (the
    dominant term of the D=8 virtual-mesh scaling curve, and ~3.6 GB/shard
    at B=1M, D=64).

    Returns (outbox (D, cap, R), carry (ccap, R+1), carry_valid (ccap,),
    overflow_count)."""
    width = recs.shape[-1]
    all_recs = jnp.concatenate([carry[:, :width], recs])
    all_dest = jnp.concatenate([carry[:, width].astype(jnp.int32), dests])
    all_valid = jnp.concatenate([carry_valid, valid])
    n_all = all_recs.shape[0]
    pad_rec = jnp.zeros((1, width), jnp.uint32).at[0, 0].set(_SENTINEL)
    recs_pad = jnp.concatenate([all_recs, pad_rec])
    out = []
    shipped = jnp.zeros((n_all,), bool)
    for d in range(nshards):
        want = all_valid & (all_dest == d)
        pos = jnp.cumsum(want.astype(jnp.int32)) - 1
        take = want & (pos < cap)
        idx = _compact_idx(want, cap)
        got = recs_pad[jnp.minimum(idx, n_all)]
        got = jnp.where((idx < n_all)[:, None], got, pad_rec)
        out.append(got)
        shipped = shipped | take
    outbox = jnp.stack(out)
    left = all_valid & ~shipped
    overflow = jnp.maximum(jnp.sum(left.astype(jnp.int32)) - ccap, 0)
    lidx = _compact_idx(left, ccap)
    safe = jnp.minimum(lidx, n_all)
    ok = lidx < n_all
    carry_rec = jnp.where(ok[:, None], recs_pad[safe], pad_rec)
    carry_dest = jnp.where(ok, all_dest[jnp.minimum(lidx, n_all - 1)],
                           0).astype(jnp.uint32)
    carry_buf = jnp.concatenate([carry_rec, carry_dest[:, None]], axis=1)
    return outbox, carry_buf, ok, overflow


def _check_complete(info, num_walkers: int, walk_length: int,
                    cfg: "RoutedConfig") -> None:
    """A dropped record or a truncated phase loop silently corrupts walks;
    fail loudly instead (every walker must log exactly L+1 positions)."""
    expected = num_walkers * (walk_length + 1)
    if info["overflow_dropped"] or info["log_entries"] != expected:
        raise RuntimeError(
            f"routed walk incomplete: {info['overflow_dropped']} records "
            f"dropped, {info['log_entries']}/{expected} positions logged "
            f"after {info['phases']} phases — raise RoutedConfig capacities "
            f"(pair_capacity={cfg.pair_capacity}, carry={cfg.carry}, "
            f"max_phases={cfg.max_phases})")


def _empty_carry(nshards, ccap, width):
    """Shared carry pool: (ccap, width+1) records (last column = stored
    destination) + validity mask.  ``nshards`` kept for signature
    compatibility (the pool is destination-agnostic)."""
    del nshards
    carry = jnp.zeros((ccap, width + 1), jnp.uint32)
    return carry.at[:, 0].set(_SENTINEL), jnp.zeros((ccap,), bool)


def _make_a2a(exchange: str, axis: str, nshards: int, interpret: bool):
    """Exchange backend: XLA's all_to_all collective, or the Pallas direct
    remote-DMA kernel (parallel/pallas_exchange.py) — flag-gated until
    multi-chip hardware can measure it; interpret=True runs it on the
    virtual CPU mesh."""
    if exchange == "pallas":
        from torch_random_walk_tpu.parallel.pallas_exchange import (
            pallas_all_to_all,
        )

        return lambda x: pallas_all_to_all(x, axis, nshards,
                                           interpret=interpret)
    return lambda x: lax.all_to_all(x, axis, split_axis=0, concat_axis=0,
                                    tiled=False)


# LOG-hop marker: top bit of the record's step word.  A record cycles
# owner(v_s) --draw--> WID-OWNER (logs walk[s+1] into its even-share walk
# shard, forwards) --> owner(v_{s+1}).  Each walker is exactly ONE record
# at all times, so the in-flight <= B zero-drop invariant is unchanged;
# per-shard walk memory is exactly blk*(L+1) (VERDICT r2 item 4), at the
# cost of 2 phases (2 all_to_all hops) per step.
_LOG_BIT = np.uint32(1 << 31)
# Edge-list dead-end restart: the LOG record carries BOTH the pad position
# (pre-filled) and the jump back to the target (scattered at step+1).
_FUSE_BIT = np.uint32(1 << 30)


def _overlapped_drive(a2a, process, outbox_A, carry_A, cvalid_A,
                      outbox_B, carry_B, cvalid_B, acc0, count_box,
                      count_carry, axis, max_phases, varying):
    """Two-pipeline software-pipelined phase driver (SURVEY §2.8's
    "exchange overlapped with on-partition sampling").

    The serial schedule's body is a strict chain — a2a(outbox) must land
    before processing starts, processing must finish before the next a2a —
    so the interconnect idles while the chip samples and vice versa.  Here
    the frontier is split into two independent pipelines: every body
    exchanges pipeline X's outbox while locally sampling pipeline Y's
    already-arrived records, and the returned state swaps the roles, so
    XLA's async collectives can hide the all_to_all under the local
    gathers (each pipeline advances one hop per two bodies; with balanced
    halves the wall clock per hop is max(exchange, sample) instead of
    their sum).  Records never migrate between pipelines, draws are
    unchanged, so walks stay bit-identical to the serial schedule.

    ``process(inbox, carry, cvalid, acc) -> (outbox, carry, cvalid, acc)``
    is the schedule-agnostic phase kernel; ``acc`` carries the walk shard +
    counters.  ``count_box``/``count_carry`` count live records for the
    termination psum.  The driver seeds pipeline B with one pre-loop
    exchange so body 1 has arrivals to sample.
    """
    inbox_B0 = a2a(outbox_B)

    def body(state):
        (ex_outbox, ex_carry, ex_cvalid, pr_inbox, pr_carry, pr_cvalid,
         acc, _inflight, phases) = state
        inbox_X = a2a(ex_outbox)                       # exchange pipeline X
        outbox_Y, carry_Y, cvalid_Y, acc = process(    # sample pipeline Y
            pr_inbox, pr_carry, pr_cvalid, acc)
        inflight = lax.psum(
            count_box(outbox_Y) + count_box(inbox_X)
            + count_carry(cvalid_Y) + count_carry(ex_cvalid), axis)
        return (outbox_Y, carry_Y, cvalid_Y, inbox_X, ex_carry, ex_cvalid,
                acc, inflight, phases + 1)

    def cond(state):
        return jnp.logical_and(state[7] > 0, state[8] < max_phases)

    init_inflight = lax.psum(
        count_box(outbox_A) + count_box(inbox_B0)
        + count_carry(cvalid_A) + count_carry(cvalid_B), axis)
    state = (outbox_A, carry_A, cvalid_A, varying(inbox_B0), carry_B,
             cvalid_B, acc0, init_inflight, jnp.int32(0))
    state = lax.while_loop(cond, body, state)
    return state[6], state[8]


@functools.lru_cache(maxsize=64)
def _routed_uniform_jit(mesh: Mesh, axis: str, nshards: int,
                        shard_nodes: int, num_walkers: int, walk_length: int,
                        cap: int, ccap: int,
                        max_phases: int, exchange: str,
                        exchange_interpret: bool, schedule: str = "serial"):
    """Build (and cache) the jitted shard_map for one routed-walk shape.

    Everything that shapes the HLO is in the cache key; the derived threefry
    key arrives as a TRACED (2,) uint32 argument, so per-epoch seeds reuse
    the compiled executable instead of retracing the phase while_loop."""
    sentinel = jnp.uint32(0xFFFFFFFF)

    def shard_fn(key, meta, col, tgt_local):
        meta = meta[0]          # (S, 2) [start, deg] local rows
        col = col[0]            # (E_max,) global neighbor ids
        my = lax.axis_index(axis)
        e_max = col.shape[0]
        blk = num_walkers // nshards

        # Even-share walk shard: this process owns walkers
        # [my*blk, (my+1)*blk); position 0 is local by construction
        # (targets are wid-sharded).
        walks_local = jnp.zeros((blk + 1, walk_length + 2), jnp.int32)
        walks_local = walks_local.at[:blk, 0].set(tgt_local)
        log_n = jnp.int32(blk)

        # --- phase-0 outbox: route each local target to its owner. -------
        wid0 = (my * blk + jnp.arange(blk, dtype=jnp.int32)).astype(jnp.uint32)
        rec0 = jnp.stack([wid0, jnp.zeros((blk,), jnp.uint32),
                          tgt_local.astype(jnp.uint32)], axis=1)  # (blk, R)
        dest0 = jnp.clip(tgt_local // shard_nodes, 0, nshards - 1)
        valid0 = jnp.ones((blk,), bool) & (walk_length > 0)

        def build_outbox(recs, dests, valid, carry, carry_valid):
            return _build_outbox(recs, dests, valid, carry, carry_valid,
                                 nshards, cap, ccap)

        a2a = _make_a2a(exchange, axis, nshards, exchange_interpret)

        def process(inbox, carry, carry_valid, acc):
            """Schedule-agnostic phase kernel: sample/log one inbox of
            arrivals, build the next outbox.  ``acc`` = (walks_local,
            log_n, sent_recs, overflow)."""
            walks_local, log_n, sent_recs, overflow = acc
            recs = inbox.reshape(-1, _R_UNIFORM)          # (D*cap, R)
            wid = recs[:, 0]
            arrived = wid != sentinel
            is_log = arrived & ((recs[:, 1] & _LOG_BIT) != 0)
            step = recs[:, 1] & ~_LOG_BIT
            v = recs[:, 2].astype(jnp.int32)

            # LOG arrivals: we are this walker's wid-owner — scatter
            # walk[step] = v into the local shard, then forward the SAME
            # record to owner(v) for the next draw (unless finished).
            wrow = jnp.where(is_log, (wid - my * blk).astype(jnp.int32), blk)
            wcol = jnp.where(is_log, step, walk_length + 1).astype(jnp.int32)
            walks_local = walks_local.at[wrow, wcol].set(v)
            log_n = log_n + jnp.sum(is_log.astype(jnp.int32))
            fwd_log = is_log & (step < walk_length)
            rec_fwd = jnp.stack([wid, step, recs[:, 2]], axis=1)
            dest_fwd = jnp.clip(v // shard_nodes, 0, nshards - 1)

            # STEP arrivals: we are owner(v) — draw the next neighbor and
            # send the advanced record to the walker's wid-owner to log.
            stepping = arrived & ~is_log & (step < walk_length)
            local = jnp.clip(v - my * shard_nodes, 0, shard_nodes - 1)
            rows = meta[local]
            start, deg = rows[:, 0], rows[:, 1]
            c1 = (step + 1) * jnp.uint32(prng.MAX_ROUNDS_PER_STEP)
            bits, _ = prng.counter_bits(key, wid, c1)
            off = prng.randint_from_bits(bits, jnp.maximum(deg, 1))
            idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
            nxt = jnp.where(deg > 0, col[idx], v)
            new_rec = jnp.stack([wid, (step + 1) | _LOG_BIT,
                                 nxt.astype(jnp.uint32)], axis=1)
            dest_new = jnp.clip((wid // jnp.uint32(blk)).astype(jnp.int32),
                                0, nshards - 1)

            recs_out = jnp.concatenate([rec_fwd, new_rec])
            dest_out = jnp.concatenate([dest_fwd, dest_new])
            valid_out = jnp.concatenate([fwd_log, stepping])

            outbox, carry, carry_valid, ovf = build_outbox(
                recs_out, dest_out, valid_out, carry, carry_valid)
            sent = jnp.sum(valid_out.astype(jnp.int32))
            return outbox, carry, carry_valid, (
                walks_local, log_n, sent_recs + sent, overflow + ovf)

        def varying(x):
            # The while carry must have consistent device-variance types:
            # these start identical on every shard but diverge in the body.
            return _to_varying(x, axis, exchange)

        def count_box(box):
            return jnp.sum((box[:, :, 0] != sentinel).astype(jnp.int32))

        def count_carry(cv):
            return jnp.sum(cv.astype(jnp.int32))

        if schedule == "overlapped":
            # Balanced halves by local lane parity; records never migrate.
            sel = (jnp.arange(blk, dtype=jnp.int32) % 2) == 0
            outbox_A, carry_A, cvalid_A, ovfA = build_outbox(
                rec0, dest0, valid0 & sel,
                *_empty_carry(nshards, ccap, _R_UNIFORM))
            outbox_B, carry_B, cvalid_B, ovfB = build_outbox(
                rec0, dest0, valid0 & ~sel,
                *_empty_carry(nshards, ccap, _R_UNIFORM))
            acc0 = (varying(walks_local), varying(log_n),
                    varying(jnp.int32(0)), ovfA + ovfB)
            acc, phases = _overlapped_drive(
                a2a, process, outbox_A, carry_A, cvalid_A, outbox_B,
                carry_B, cvalid_B, acc0, count_box, count_carry, axis,
                max_phases, varying)
            walks_local, log_n, sent_recs, overflow = acc
            stats = jnp.stack([log_n, sent_recs, phases, overflow])
            return walks_local[None, :blk, : walk_length + 1], stats[None]

        outbox, carry, carry_valid, ovf0 = build_outbox(
            rec0, dest0, valid0, *_empty_carry(nshards, ccap, _R_UNIFORM))

        def phase(state):
            outbox, carry, carry_valid, acc, _inflight, phases = state
            inbox = a2a(outbox)
            outbox, carry, carry_valid, acc = process(inbox, carry,
                                                      carry_valid, acc)
            # In-flight = records still travelling anywhere (psum'd so the
            # while cond is shard-invariant).
            inflight = lax.psum(count_box(outbox) + count_carry(carry_valid),
                                axis)
            return (outbox, carry, carry_valid, acc, inflight, phases + 1)

        def cond(state):
            return jnp.logical_and(state[4] > 0, state[5] < max_phases)

        init_inflight = lax.psum(count_box(outbox), axis)
        acc0 = (varying(walks_local), varying(log_n), varying(jnp.int32(0)),
                ovf0)
        state = (outbox, carry, carry_valid, acc0, init_inflight,
                 jnp.int32(0))
        state = lax.while_loop(cond, phase, state)
        (walks_local, log_n, sent_recs, overflow) = state[3]
        phases = state[5]
        stats = jnp.stack([log_n, sent_recs, phases, overflow])
        return walks_local[None, :blk, : walk_length + 1], stats[None]

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            # The interpreted Pallas exchange mixes varying/invariant types
            # inside its HLO interpreter; vma checking must be off for it.
            check_vma=(exchange != "pallas"),
        )
    )


def walk_partitioned_routed(pgraph: PartitionedCSR, target_nodes, mesh: Mesh,
                            walk_length: int, seed: int = 0,
                            axis: str = "data",
                            config: RoutedConfig | None = None,
                            exchange: str = "xla",
                            exchange_interpret: bool = False,
                            schedule: str = "serial"):
    """Uniform CSR walks with owner-routed walker exchange.

    Returns (walks (B, L+1) int32, stats dict).  Bit-identical to
    ops.uniform.uniform_walk_csr / ops.fatwalk.uniform_walk_fat.

    ``schedule="overlapped"`` runs the two-pipeline software-pipelined
    phase driver (_overlapped_drive): each body exchanges one half of the
    frontier while locally sampling the other, so the all_to_all hides
    under on-partition gathers (SURVEY §2.8 north star).  Walks are
    bit-identical across schedules; each hop takes two (cheaper) phases,
    so ``phases`` in the stats roughly doubles.
    """
    num_walkers = int(target_nodes.shape[0])
    nshards = pgraph.num_shards
    if num_walkers % nshards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({nshards}); pad the target batch.")
    cfg = RoutedConfig.resolve(config, num_walkers, nshards, walk_length)
    meta_sh, col_sh = pgraph.device_put(mesh, axis)
    targets = jax.device_put(
        jnp.asarray(target_nodes, jnp.int32), NamedSharding(mesh, P(axis)))
    fn = _routed_uniform_jit(mesh, axis, nshards, pgraph.shard_nodes,
                             num_walkers, walk_length,
                             cfg.pair_capacity, cfg.carry,
                             cfg.max_phases
                             * (2 if schedule == "overlapped" else 1),
                             exchange, bool(exchange_interpret),
                             schedule=schedule)
    key = jax.device_put(
        jnp.stack(prng.derive_key(int(seed), prng.STREAM_CSR_UNIFORM)),
        NamedSharding(mesh, P()))
    shard_walks, stats = fn(key, meta_sh, col_sh, targets)

    # (D, blk, L+1) wid-sharded shards ARE the walk tensor in wid order.
    walks = shard_walks.reshape(num_walkers, walk_length + 1)
    stats = np.asarray(stats)
    info = {
        "log_entries": int(stats[:, 0].sum()),
        "exchanged_records": int(stats[:, 1].sum()),
        "phases": int(stats[:, 2].max()),
        "overflow_dropped": int(stats[:, 3].sum()),
        "exchange_bytes": int(stats[:, 1].sum()) * _R_UNIFORM * 4,
        "schedule": schedule,
    }
    _check_complete(info, num_walkers, walk_length, cfg)
    return walks, info


# node2vec record layout (uint32 words).  Modes: 0 = STEP (walker at
# owner(v), draw rejection rounds), 1 = RESOLVE (walker at owner(t), answer
# the frozen distance-1 queries).
#   w0 wid | w1 step + flags<<24 | w2 t | w3 v | w4 replay round
#   w5 a_cand | w6 f1_cand | w7 f1_rnd | w8 f2_cand | w9 f2_rnd
#   w10-w13: 128-bit Bloom filter of N(t) (see _BLOOM_MULS)
# flags: bit0 mode, bit1 has_a, bit2 overflow, bits 3-4 n_f, bit 5 LOG
# (the record is on its wid-owner hop: walk[step] = w3 gets scattered
# into the even-share walk shard there, then the record forwards to
# owner(w3) with the flag cleared).
_R_N2V = 14
_F_MODE, _F_HAS_A, _F_OVF, _F_LOG = 1, 2, 4, 32

# Per-node Bloom filters (graph/bloom.py): most in-band draws are NOT
# neighbors of t, and a local no-false-negative test decides them without
# the RESOLVE round trip (threshold collapses to prob_2 exactly).
from torch_random_walk_tpu.graph.bloom import (  # noqa: E402
    BLOOM_WORDS as _BLOOM_WORDS,
    bloom_maybe as _bloom_maybe,
    build_node_blooms,
)


def build_partition_blooms(pgraph: PartitionedCSR, graph) -> jnp.ndarray:
    """(D, S, 4) uint32: per-node Bloom filters, node-range sharded."""
    flat = build_node_blooms(graph.row_ptr, graph.col_idx)
    s = pgraph.shard_nodes
    padded = np.zeros((pgraph.num_shards * s, _BLOOM_WORDS), np.uint32)
    padded[: flat.shape[0]] = flat
    return jnp.asarray(padded.reshape(pgraph.num_shards, s, _BLOOM_WORDS))


def walk_partitioned_node2vec_routed(pgraph: PartitionedCSR, hashes,
                                     target_nodes, mesh: Mesh, p: float,
                                     q: float, walk_length: int,
                                     seed: int = 0, axis: str = "data",
                                     config: RoutedConfig | None = None,
                                     spec_rounds: int = 6, blooms=None,
                                     exchange: str = "xla",
                                     exchange_interpret: bool = False,
                                     schedule: str = "serial"):
    """node2vec walks with owner-routed walkers (SURVEY.md §2.8's exchange).

    The single-chip speculative-scan semantics (ops/fatwalk.py spec_phase)
    distributed across shards: at owner(v) each walker draws ``spec_rounds``
    candidates and classifies them with the no-hash band — only draws whose
    acceptance lands inside [min(p1,p2), max(p1,p2)) need the distance-1
    test, and those route to owner(t), where the per-shard cuckoo set
    (build_partition_hashes: edges keyed by head) answers them *locally*.
    So one all_to_all moves walkers AND queries together:

        phase k:   STEP arrivals draw + classify   -> route next STEP to
                   owner(next) (no frozen blockers), or RESOLVE to owner(t)
        phase k+1: RESOLVE arrivals answer frozen draws locally -> STEP to
                   owner(next), or replay-STEP back to owner(v)

    Collectives: ONE all_to_all per phase, ~1.3-1.6 phases per walk step
    amortized (vs v1's 2 psums per rejection round, ~7 rounds-worth of
    full-frontier traffic per step at p=.5, q=2).  Exchange bytes are O(B)
    per phase (40 B/record), independent of shard count.

    Draws consume the identical threefry counters as
    ops.fatwalk.node2vec_walk_fat / ops.node2vec.node2vec_walk_csr, and
    rounds resolve in round order with identical acceptance — walks are
    bit-identical to the single-device engines (tests/test_partition_v2.py).

    ``hashes`` = parallel.partition.build_partition_hashes(pgraph, graph).
    """
    num_walkers = int(target_nodes.shape[0])
    nshards = pgraph.num_shards
    if num_walkers % nshards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({nshards}); pad the target batch.")
    cfg = RoutedConfig.resolve(config, num_walkers, nshards, walk_length)
    if config is None or config.max_phases <= 0:
        cfg = _biased_phase_budget(cfg, walk_length, spec_rounds)
    if hashes is None:
        # hashes=None (r4, VERDICT r3 #5): the distance-1 test binary-
        # searches t's sorted row in the LOCAL col slice instead of probing
        # a per-shard cuckoo edge set.  Owner(t) holds t's meta row and col
        # slice already, so the cuckoo's 2.5 * E_shard * 8 B — 10.7
        # GB/shard at papers100M D=8, the dominant term of the r3 memory
        # budget — drops to ZERO.  Both tests are exact, so walks stay
        # bit-identical (asserted in tests/test_partition_v2.py).
        hash_tables = jnp.zeros((nshards, 1, 2), jnp.uint32)
        hash_salts = jnp.zeros((nshards, 2), jnp.uint32)
        hash_log = 0
    else:
        hash_tables, hash_salts, hash_log = hashes

    if blooms is None:
        # Saturated filters == "always maybe": every in-band draw takes the
        # exact remote test.  Pass build_partition_blooms(pgraph, graph) to
        # resolve most of them locally.
        blooms = jnp.full(
            (nshards, pgraph.shard_nodes, _BLOOM_WORDS), 0xFFFFFFFF,
            jnp.uint32)
    meta_sh, col_sh = pgraph.device_put(mesh, axis)
    sharding = NamedSharding(mesh, P(axis))
    ht_sh = jax.device_put(hash_tables, sharding)
    salts_sh = jax.device_put(hash_salts, sharding)
    bloom_sh = jax.device_put(blooms, sharding)
    targets = jax.device_put(jnp.asarray(target_nodes, jnp.int32), sharding)

    fn = _routed_n2v_jit(mesh, axis, nshards, pgraph.shard_nodes,
                         num_walkers, walk_length, float(p),
                         float(q), int(spec_rounds), int(hash_log),
                         cfg.pair_capacity, cfg.carry,
                         cfg.max_phases
                         * (2 if schedule == "overlapped" else 1),
                         exchange, bool(exchange_interpret),
                         use_search=hashes is None, schedule=schedule)
    key = jax.device_put(
        jnp.stack(prng.derive_key(int(seed), prng.STREAM_CSR_BIASED)),
        NamedSharding(mesh, P()))
    shard_walks, stats = fn(key, meta_sh, col_sh, ht_sh, salts_sh, bloom_sh,
                            targets)
    walks = shard_walks.reshape(num_walkers, walk_length + 1)
    stats = np.asarray(stats)
    info = {
        "log_entries": int(stats[:, 0].sum()),
        "exchanged_records": int(stats[:, 1].sum()),
        "phases": int(stats[:, 2].max()),
        "overflow_dropped": int(stats[:, 3].sum()),
        "exchange_bytes": int(stats[:, 1].sum()) * _R_N2V * 4,
        "collectives_per_step": round(
            int(stats[:, 2].max()) / max(walk_length, 1), 2),
        "schedule": schedule,
    }
    _check_complete(info, num_walkers, walk_length, cfg)
    return walks, info


@functools.lru_cache(maxsize=64)
def _routed_n2v_jit(mesh: Mesh, axis: str, nshards: int, shard_nodes: int,
                    num_walkers: int, walk_length: int, p: float,
                    q: float, spec_rounds: int, hash_log: int, cap: int,
                    ccap: int, max_phases: int, exchange: str,
                    exchange_interpret: bool, use_search: bool = False,
                    schedule: str = "serial"):
    """Cached jitted shard_map builder for the routed node2vec engine (same
    rationale as _routed_uniform_jit: the threefry key is a traced argument,
    so per-epoch seeds never retrace)."""
    from torch_random_walk_tpu.graph.hashset import _hash_jnp_traced
    from torch_random_walk_tpu.ops import common

    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    hi_acc = max(prob_1, prob_2)
    sentinel = _SENTINEL

    def shard_fn(key, meta, col, ht, salt, bloom, tgt_local):
        meta = meta[0]
        col = col[0]
        ht = ht[0]
        salt = salt[0]
        bloom = bloom[0]        # (S, 4) per-node N(t) Bloom filters
        my = lax.axis_index(axis)
        e_max = col.shape[0]
        blk = num_walkers // nshards

        def owner(nodes):
            return jnp.clip(nodes // shard_nodes, 0, nshards - 1)

        def pack(wid, step, flags, t, v, rnd, a, f1, f1r, f2, f2r, tb):
            return jnp.concatenate([jnp.stack([
                wid, step | (flags.astype(jnp.uint32) << jnp.uint32(24)),
                t.astype(jnp.uint32), v.astype(jnp.uint32),
                rnd.astype(jnp.uint32), a.astype(jnp.uint32),
                f1.astype(jnp.uint32), f1r.astype(jnp.uint32),
                f2.astype(jnp.uint32), f2r.astype(jnp.uint32)], axis=1),
                tb.astype(jnp.uint32)], axis=1)

        def local_contains(t, cand):
            if use_search:
                # Binary search t's sorted row in the LOCAL col slice:
                # exact, zero extra memory (the cuckoo set is not built at
                # all under hashes=None).  Only RESOLVE lanes consume the
                # answer; t is clipped into range for the others.
                lt = jnp.clip(t - my * shard_nodes, 0, shard_nodes - 1)
                trow = meta[lt]
                lo = trow[:, 0].astype(jnp.int32)
                hi = lo + trow[:, 1].astype(jnp.int32)

                def body(_, lh):
                    lo_, hi_ = lh
                    active = lo_ < hi_
                    mid = (lo_ + hi_) >> 1
                    val = col[jnp.clip(mid, 0, e_max - 1)]
                    go_right = val < cand
                    return (jnp.where(active & go_right, mid + 1, lo_),
                            jnp.where(active & ~go_right, mid, hi_))

                lo, _ = lax.fori_loop(0, 32, body, (lo, hi))
                at = col[jnp.clip(lo, 0, e_max - 1)]
                return (lo < hi) & (at == cand)
            lo32 = cand.astype(jnp.uint32)
            hi32 = t.astype(jnp.uint32)
            hit = jnp.zeros(t.shape, bool)
            for which in range(2):
                pos = _hash_jnp_traced(lo32, hi32, salt, which, hash_log)
                row = ht[pos]
                hit |= (row[:, 0] == lo32) & (row[:, 1] == hi32)
            return hit

        def accept_r(wid, s, k):
            """Recompute the acceptance uniform of round (s, k)."""
            c1 = s * jnp.uint32(prng.MAX_ROUNDS_PER_STEP) + k
            _, b_acc = prng.counter_bits(key, wid, c1)
            return prng.uniform_from_bits(b_acc)

        # Even-share walk shard (walkers [my*blk, (my+1)*blk)); position 0
        # is local by construction (targets are wid-sharded).
        walks_local = jnp.zeros((blk + 1, walk_length + 2), jnp.int32)
        walks_local = walks_local.at[:blk, 0].set(tgt_local)

        # --- phase-0: route targets (step=0 STEP records) to owners. -----
        wid0 = (my * blk + jnp.arange(blk, dtype=jnp.int32)).astype(jnp.uint32)
        z = jnp.zeros((blk,), jnp.uint32)
        zb = jnp.zeros((blk, _BLOOM_WORDS), jnp.uint32)
        rec0 = pack(wid0, z, z, tgt_local, tgt_local, z, z, z, z, z, z, zb)
        dest0 = owner(tgt_local)
        valid0 = jnp.ones((blk,), bool) & (walk_length > 0)

        a2a = _make_a2a(exchange, axis, nshards, exchange_interpret)

        def process(inbox, carry, carry_valid, acc):
            """Schedule-agnostic phase kernel (see _routed_uniform_jit)."""
            walks_local, log_n, sent_recs, overflow = acc
            recs = inbox.reshape(-1, _R_N2V)
            wid = recs[:, 0]
            arrived = wid != sentinel
            step = recs[:, 1] & jnp.uint32(0xFFFFFF)
            flags = recs[:, 1] >> jnp.uint32(24)
            mode_log = arrived & ((flags & _F_LOG) != 0)
            mode_resolve = arrived & ~mode_log & ((flags & _F_MODE) != 0)
            mode_step = arrived & ~mode_log & ~mode_resolve
            t = recs[:, 2].astype(jnp.int32)
            v = recs[:, 3].astype(jnp.int32)
            rnd0 = recs[:, 4]
            a_cand = recs[:, 5].astype(jnp.int32)
            f1c = recs[:, 6].astype(jnp.int32)
            f1r_rnd = recs[:, 7]
            f2c = recs[:, 8].astype(jnp.int32)
            f2r_rnd = recs[:, 9]
            # STEP records: Bloom of N(t); RESOLVE records: Bloom of N(v)
            # (v is the next step's t — see departure packing below).
            rec_bloom = recs[:, 10:14]
            has_a = (flags & _F_HAS_A) != 0
            ovf_f = (flags & _F_OVF) != 0
            n_f = flags >> jnp.uint32(3)
            s = step + 1  # the step being taken

            # ---- LOG arrivals: we are this walker's wid-owner. ----------
            # Scatter walk[step] = v into the local shard, then forward the
            # SAME record (flag cleared) to owner(v) unless finished.
            wrow = jnp.where(mode_log, (wid - my * blk).astype(jnp.int32),
                             blk)
            wcol = jnp.where(mode_log, step,
                             jnp.uint32(walk_length + 1)).astype(jnp.int32)
            walks_local = walks_local.at[wrow, wcol].set(v)
            log_n = log_n + jnp.sum(mode_log.astype(jnp.int32))
            fwd_log = mode_log & (step < walk_length)
            rec_fwd = jnp.concatenate(
                [recs[:, :1], step[:, None], recs[:, 2:]], axis=1)
            dest_fwd = owner(v)

            # ---- STEP arrivals: draw + no-hash classify. ----------------
            local = jnp.clip(v - my * shard_nodes, 0, shard_nodes - 1)
            rows = meta[local]
            start, deg = rows[:, 0], rows[:, 1]
            dead = deg == 0

            # First hop (s == 1): one uniform draw, no acceptance.
            c1_first = jnp.uint32(prng.MAX_ROUNDS_PER_STEP)
            bits_first, _ = prng.counter_bits(
                key, wid, jnp.full_like(wid, c1_first))
            off_first = prng.randint_from_bits(bits_first,
                                               jnp.maximum(deg, 1))
            first_nxt = jnp.where(
                dead, v,
                col[jnp.clip(start + off_first.astype(start.dtype), 0,
                             e_max - 1)])

            # Rejection scan (s >= 2), spec_phase register semantics.
            sc_has_a = jnp.zeros_like(dead)
            sc_a = v
            sc_nf = jnp.zeros(wid.shape, jnp.uint32)
            sc_f1 = v
            sc_f1r = jnp.zeros_like(rnd0)
            sc_f2 = v
            sc_f2r = jnp.zeros_like(rnd0)
            sc_ovf = jnp.zeros_like(dead)
            sc_stop3 = jnp.zeros_like(rnd0)
            stopped = dead
            for k in range(spec_rounds):
                rk = rnd0 + jnp.uint32(k)
                c1 = s * jnp.uint32(prng.MAX_ROUNDS_PER_STEP) + rk
                b_cand, b_acc = prng.counter_bits(key, wid, c1)
                off = prng.randint_from_bits(b_cand, jnp.maximum(deg, 1))
                cand = col[jnp.clip(start + off.astype(start.dtype), 0,
                                    e_max - 1)]
                cand = jnp.where(dead, v, cand)
                r = prng.uniform_from_bits(b_acc)
                is_t = cand == t
                # Bloom-negative => provably not a neighbor of t: the
                # threshold is exactly prob_2, no remote test needed.
                maybe = _bloom_maybe(rec_bloom, cand)
                acc = jnp.where(is_t, r < prob_0,
                                jnp.where(maybe, r < lo_acc, r < prob_2))
                rej = jnp.where(is_t, r >= prob_0,
                                jnp.where(maybe, r >= hi_acc, r >= prob_2))
                frz = ~acc & ~rej
                scan = ~stopped
                new_f1 = scan & frz & (sc_nf == 0)
                new_f2 = scan & frz & (sc_nf == 1)
                new_f3 = scan & frz & (sc_nf == 2)
                sc_f1 = jnp.where(new_f1, cand, sc_f1)
                sc_f1r = jnp.where(new_f1, rk, sc_f1r)
                sc_f2 = jnp.where(new_f2, cand, sc_f2)
                sc_f2r = jnp.where(new_f2, rk, sc_f2r)
                sc_nf = sc_nf + (new_f1 | new_f2 | new_f3).astype(jnp.uint32)
                sc_ovf = sc_ovf | new_f3
                sc_stop3 = jnp.where(new_f3, rk, sc_stop3)
                new_a = scan & acc
                sc_a = jnp.where(new_a, cand, sc_a)
                sc_has_a = sc_has_a | new_a
                stopped = stopped | new_a | new_f3

            clean = sc_has_a & (sc_nf == 0)
            active = mode_step & (step < walk_length)
            step_next = jnp.where(s == 1, first_nxt,
                                  jnp.where(dead, v, sc_a))
            step_done = active & ((s == 1) | dead | clean)
            pending = active & (s >= 2) & ~dead & (sc_nf >= 1)
            allrej = active & (s >= 2) & ~dead & ~sc_has_a & (sc_nf == 0)
            replay_rnd = jnp.where(sc_ovf, sc_stop3,
                                   rnd0 + jnp.uint32(spec_rounds))

            # ---- RESOLVE arrivals: answer frozen draws locally. ---------
            r1 = accept_r(wid, s, f1r_rnd)
            r2 = accept_r(wid, s, f2r_rnd)
            acc1 = mode_resolve & jnp.where(local_contains(t, f1c),
                                            r1 < prob_1, r1 < prob_2)
            acc2 = (mode_resolve & (n_f >= 2) & ~acc1
                    & jnp.where(local_contains(t, f2c), r2 < prob_1,
                                r2 < prob_2))
            res_ok = acc1 | acc2 | (mode_resolve & has_a)
            res_next = jnp.where(acc1, f1c, jnp.where(acc2, f2c, a_cand))
            res_fail = mode_resolve & ~res_ok

            # ---- departures -------------------------------------------
            zf = jnp.zeros_like(wid)
            # (a) resolved steps (from STEP or RESOLVE): fresh record to
            # the walker's WID-OWNER (LOG hop — it scatters walk[s] there,
            # then forwards to owner(adv_next); a walker that just took its
            # last step dies at its wid-owner after logging).
            adv_next = jnp.where(mode_resolve, res_next, step_next)
            adv_valid = step_done | res_ok
            # Fresh record's t is the current v: its Bloom is local here for
            # STEP lanes (we ARE owner(v)); RESOLVE lanes shipped it in.
            v_bloom_local = bloom[local]
            fresh_tb = jnp.where(mode_resolve[:, None], rec_bloom,
                                 v_bloom_local)
            fresh = pack(wid, s, jnp.full_like(wid, _F_LOG), v, adv_next,
                         zf, zf, zf, zf, zf, zf, fresh_tb)
            # (b) frozen-pending: RESOLVE record to owner(t), shipping
            # N(v)'s Bloom so the resolve site can pack the next record.
            pend_flags = (jnp.uint32(_F_MODE)
                          | jnp.where(sc_has_a, jnp.uint32(_F_HAS_A),
                                      jnp.uint32(0))
                          | jnp.where(sc_ovf, jnp.uint32(_F_OVF),
                                      jnp.uint32(0))
                          | (jnp.minimum(sc_nf, 2) << jnp.uint32(3)))
            pend = pack(wid, step, pend_flags, t, v, replay_rnd, sc_a,
                        sc_f1, sc_f1r, sc_f2, sc_f2r, v_bloom_local)
            # (c) replay: back to owner(v) as STEP with advanced round.
            # allrej lanes keep their t-Bloom; res_fail lanes are at
            # owner(t), whose Bloom row is local.
            local_t = jnp.clip(t - my * shard_nodes, 0, shard_nodes - 1)
            rep_tb = jnp.where(mode_resolve[:, None], bloom[local_t],
                               rec_bloom)
            rep = pack(wid, step, zf,
                       t, v, jnp.where(mode_resolve, rnd0, replay_rnd),
                       zf, zf, zf, zf, zf, rep_tb)
            rep_valid = allrej | res_fail

            wid_dest = jnp.clip((wid // jnp.uint32(blk)).astype(jnp.int32),
                                0, nshards - 1)
            recs_out = jnp.concatenate([rec_fwd, fresh, pend, rep])
            dest_out = jnp.concatenate([
                dest_fwd, wid_dest, owner(t), owner(v)])
            valid_out = jnp.concatenate([fwd_log, adv_valid, pending,
                                         rep_valid])

            outbox, carry, carry_valid, ovf = _build_outbox(
                recs_out, dest_out, valid_out, carry, carry_valid,
                nshards=nshards, cap=cap, ccap=ccap)
            sent = jnp.sum(valid_out.astype(jnp.int32))
            return outbox, carry, carry_valid, (
                walks_local, log_n, sent_recs + sent, overflow + ovf)

        def varying(x):
            return _to_varying(x, axis, exchange)

        def count_box(box):
            return jnp.sum((box[:, :, 0] != sentinel).astype(jnp.int32))

        def count_carry(cv):
            return jnp.sum(cv.astype(jnp.int32))

        if schedule == "overlapped":
            sel = (jnp.arange(blk, dtype=jnp.int32) % 2) == 0
            outbox_A, carry_A, cvalid_A, ovfA = _build_outbox(
                rec0, dest0, valid0 & sel,
                *_empty_carry(nshards, ccap, _R_N2V), nshards=nshards,
                cap=cap, ccap=ccap)
            outbox_B, carry_B, cvalid_B, ovfB = _build_outbox(
                rec0, dest0, valid0 & ~sel,
                *_empty_carry(nshards, ccap, _R_N2V), nshards=nshards,
                cap=cap, ccap=ccap)
            acc0 = (varying(walks_local), varying(jnp.int32(blk)),
                    varying(jnp.int32(0)), ovfA + ovfB)
            acc, phases = _overlapped_drive(
                a2a, process, outbox_A, carry_A, cvalid_A, outbox_B,
                carry_B, cvalid_B, acc0, count_box, count_carry, axis,
                max_phases, varying)
            walks_local, log_n, sent_recs, overflow = acc
            stats = jnp.stack([log_n, sent_recs, phases, overflow])
            return walks_local[None, :blk, : walk_length + 1], stats[None]

        outbox, carry, carry_valid, ovf0 = _build_outbox(
            rec0, dest0, valid0, *_empty_carry(nshards, ccap, _R_N2V),
            nshards=nshards, cap=cap, ccap=ccap)

        def phase(state):
            outbox, carry, carry_valid, acc, _inflight, phases = state
            inbox = a2a(outbox)
            outbox, carry, carry_valid, acc = process(inbox, carry,
                                                      carry_valid, acc)
            inflight = lax.psum(count_box(outbox) + count_carry(carry_valid),
                                axis)
            return (outbox, carry, carry_valid, acc, inflight, phases + 1)

        def cond(state):
            return jnp.logical_and(state[4] > 0, state[5] < max_phases)

        init_inflight = lax.psum(count_box(outbox), axis)
        acc0 = (varying(walks_local), varying(jnp.int32(blk)),
                varying(jnp.int32(0)), ovf0)
        state = (outbox, carry, carry_valid, acc0, init_inflight,
                 jnp.int32(0))
        state = lax.while_loop(cond, phase, state)
        (walks_local, log_n, sent_recs, overflow) = state[3]
        phases = state[5]
        stats = jnp.stack([log_n, sent_recs, phases, overflow])
        return walks_local[None, :blk, : walk_length + 1], stats[None]

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=(exchange != "pallas"),
        )
    )




# ---------------------------------------------------------------------------
# KG-triples family: owner-routed partitioned walks.
# ---------------------------------------------------------------------------

# Triples record layout (uint32 words): wid, step(|LOG), relation, entity.
# STEP hop (at owner(entity)): relation word unused.  LOG hop (at the
# walker's wid-owner): (relation, entity) is the transition to scatter at
# columns (2*step-1, 2*step) of the even-share walk shard.
_R_TRIPLES = 4


def _range_partition(index, payload, n: int, num_shards: int):
    """Split a [start, end-inclusive]-indexed, head-sorted ``payload`` into
    contiguous head-range shards (shared by PartitionedTriples and
    PartitionedEdgeList).

    Returns (meta (D, S, 2) int32 [local start, cnt], payload_shards
    (D, E_max, ...) int32, S).  ``index`` is the (N, 2) per-head range
    table with (-1, -1) sentinels for empty heads.
    """
    index = np.asarray(index)
    payload = np.asarray(payload)
    s = -(-n // num_shards)
    starts = index[:, 0]
    cnts = np.where(starts >= 0, index[:, 1] - starts + 1, 0).astype(np.int64)
    # Cumulative form so empty heads get a valid (unused) local start.
    gstart = np.zeros(n, np.int64)
    np.cumsum(cnts[:-1], out=gstart[1:])
    metas, slices = [], []
    for d in range(num_shards):
        lo, hi = min(d * s, n), min((d + 1) * s, n)
        base = gstart[lo] if hi > lo else 0
        pad = s - (hi - lo)
        metas.append(np.stack([
            np.concatenate([gstart[lo:hi] - base, np.zeros(pad, np.int64)]),
            np.concatenate([cnts[lo:hi], np.zeros(pad, np.int64)]),
        ], axis=1).astype(np.int32))
        end = gstart[hi - 1] + cnts[hi - 1] if hi > lo else 0
        slices.append(payload[base:end].astype(np.int32))
    e_max = max(max((sl.shape[0] for sl in slices), default=0), 1)
    shards = np.zeros((num_shards, e_max) + payload.shape[1:], np.int32)
    for d, sl in enumerate(slices):
        shards[d, : sl.shape[0]] = sl
    return jnp.asarray(np.stack(metas)), jnp.asarray(shards), s


def _routed_info(stats, rec_width: int, what: str, num_walkers: int,
                 cfg: "RoutedConfig"):
    """Stats rows -> info dict + the zero-drop/termination completeness
    check shared by the triples and edge-list routed wrappers."""
    stats = np.asarray(stats)
    info = {
        "log_entries": int(stats[:, 0].sum()),
        "exchanged_records": int(stats[:, 1].sum()),
        "phases": int(stats[:, 2].max()),
        "overflow_dropped": int(stats[:, 3].sum()),
        "terminated": int(stats[:, 4].sum()),
        "exchange_bytes": int(stats[:, 1].sum()) * rec_width * 4,
    }
    if info["overflow_dropped"] or info["terminated"] != num_walkers:
        raise RuntimeError(
            f"routed {what} walk incomplete: {info['overflow_dropped']} "
            f"records dropped, {info['terminated']}/{num_walkers} walkers "
            f"terminated after {info['phases']} phases — raise RoutedConfig "
            f"capacities (pair_capacity={cfg.pair_capacity}, "
            f"carry={cfg.carry}, max_phases={cfg.max_phases})")
    return info


@dataclasses.dataclass(frozen=True)
class PartitionedTriples:
    """TriplesGraph split into contiguous head-entity-range partitions.

    Because the triples table is sorted by head (graph/triples.py), each
    shard's triples are one contiguous slice; ``node_meta_shards[d, i]`` =
    (start-within-slice, count) for local head ``d*S + i``, and
    ``rel_tail_shards[d]`` holds that slice's (relation, tail) columns
    padded to E_max rows.  Beyond-HBM scaling for the KG walk family —
    the same shape as PartitionedCSR for node walks.
    """

    node_meta_shards: jnp.ndarray  # (D, S, 2) int32 [local start, cnt]
    rel_tail_shards: jnp.ndarray   # (D, E_max, 2) int32
    num_entities: int
    num_shards: int
    shard_entities: int

    @classmethod
    def from_triples(cls, graph, num_shards: int) -> "PartitionedTriples":
        n = graph.num_entities
        meta, rt, s = _range_partition(graph.relation_tail_index,
                                       np.asarray(graph.triples)[:, 1:3],
                                       n, num_shards)
        return cls(
            node_meta_shards=meta,
            rel_tail_shards=rt,
            num_entities=n,
            num_shards=num_shards,
            shard_entities=s,
        )

    def device_put(self, mesh: Mesh, axis: str = "data"):
        sharding = NamedSharding(mesh, P(axis))
        return (jax.device_put(self.node_meta_shards, sharding),
                jax.device_put(self.rel_tail_shards, sharding))


@functools.lru_cache(maxsize=64)
def _routed_triples_jit(mesh: Mesh, axis: str, nshards: int,
                        shard_entities: int, num_walkers: int,
                        walk_length: int, padding_idx: int, cap: int,
                        ccap: int, max_phases: int,
                        exchange: str, exchange_interpret: bool,
                        schedule: str = "serial"):
    """Owner-routed KG-triples walks: each STEP arrival is one local (S, 2)
    meta-row gather + one (E_max, 2) rel/tail row gather + a threefry draw;
    the (relation, tail) transition then hops to the walker\'s WID-OWNER,
    which scatters it into its even-share (blk, 2L+1) walk shard and
    forwards the walker to owner(tail).  Absorbing-padding semantics
    (rw_cpu_triples.cpp:38-42) let absorbed walkers TERMINATE at the draw
    shard instead of shipping pad records — the pad slots are pre-filled in
    the walk shard, and the draws they would have consumed are masked to
    pad in the single-device engine too, so bit-identity is preserved."""
    sentinel = _SENTINEL

    def shard_fn(key, meta, rt, tgt_local):
        meta = meta[0]          # (S, 2) [local start, cnt]
        rt = rt[0]              # (E_max, 2) [relation, tail]
        my = lax.axis_index(axis)
        e_max = rt.shape[0]
        blk = num_walkers // nshards
        pad = jnp.int32(padding_idx)
        width = 2 * walk_length + 1

        walks_local = jnp.full((blk + 1, width + 1), pad, jnp.int32)
        walks_local = walks_local.at[:blk, 0].set(tgt_local)

        wid0 = (my * blk + jnp.arange(blk, dtype=jnp.int32)).astype(jnp.uint32)
        rec0 = jnp.stack([wid0, jnp.zeros((blk,), jnp.uint32),
                          jnp.zeros((blk,), jnp.uint32),
                          tgt_local.astype(jnp.uint32)], axis=1)
        dest0 = jnp.clip(tgt_local // shard_entities, 0, nshards - 1)
        valid0 = jnp.ones((blk,), bool)

        def build_outbox(recs, dests, valid, carry, carry_valid):
            return _build_outbox(recs, dests, valid, carry, carry_valid,
                                 nshards, cap, ccap)

        a2a = _make_a2a(exchange, axis, nshards, exchange_interpret)

        def process(inbox, carry, carry_valid, acc):
            """Schedule-agnostic phase kernel (see _routed_uniform_jit)."""
            walks_local, log_n, sent_recs, overflow, done = acc
            recs = inbox.reshape(-1, _R_TRIPLES)
            wid = recs[:, 0]
            arrived = wid != sentinel
            is_log = arrived & ((recs[:, 1] & _LOG_BIT) != 0)
            step = recs[:, 1] & ~_LOG_BIT   # completed steps
            v = recs[:, 3].astype(jnp.int32)

            # LOG arrivals (wid-owner): scatter (rel, tail) at columns
            # (2*step-1, 2*step), then forward to owner(tail) unless the
            # walk is finished or the tail is the pad id.
            wrow = jnp.where(is_log, (wid - my * blk).astype(jnp.int32),
                             blk)
            rel_col = jnp.where(is_log, 2 * step - 1,
                                jnp.uint32(width)).astype(jnp.int32)
            walks_local = walks_local.at[wrow, rel_col].set(
                recs[:, 2].astype(jnp.int32))
            walks_local = walks_local.at[wrow, rel_col + 1].set(v)
            log_n = log_n + jnp.sum(is_log.astype(jnp.int32))
            fwd_log = is_log & (step < walk_length) & (v != pad)
            done = done + jnp.sum((is_log & ~fwd_log).astype(jnp.int32))
            rec_fwd = jnp.stack([wid, step, jnp.zeros_like(wid),
                                 recs[:, 3]], axis=1)
            dest_fwd = jnp.clip(v // shard_entities, 0, nshards - 1)

            # STEP arrivals (owner(v)): draw a (relation, tail) pair.
            stepping = arrived & ~is_log & (step < walk_length)
            local = jnp.clip(v - my * shard_entities, 0, shard_entities - 1)
            rows = meta[local]
            start, cnt = rows[:, 0], rows[:, 1]
            has = (cnt > 0) & (v != pad)
            # Transition step+1 consumes the SAME (wid, (step+1)<<16)
            # counters as ops.triples_walk.uniform_walk_triples.
            c1 = prng.step_round_counter(step + jnp.uint32(1))
            bits, _ = prng.counter_bits(key, wid, c1)
            off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
            idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
            rel = rt[idx, 0]
            tail = rt[idx, 1]

            # Real transitions hop to the wid-owner for logging; absorbed
            # walkers (no out-triples / at pad) terminate here — their pad
            # slots are pre-filled in the walk shard.
            log_dep = stepping & has
            done = done + jnp.sum((stepping & ~has).astype(jnp.int32))
            new_rec = jnp.stack([wid, (step + 1) | _LOG_BIT,
                                 rel.astype(jnp.uint32),
                                 tail.astype(jnp.uint32)], axis=1)
            dest_new = jnp.clip((wid // jnp.uint32(blk)).astype(jnp.int32),
                                0, nshards - 1)

            recs_out = jnp.concatenate([rec_fwd, new_rec])
            dest_out = jnp.concatenate([dest_fwd, dest_new])
            valid_out = jnp.concatenate([fwd_log, log_dep])

            outbox, carry, carry_valid, ovf = build_outbox(
                recs_out, dest_out, valid_out, carry, carry_valid)
            sent = jnp.sum(valid_out.astype(jnp.int32))
            return outbox, carry, carry_valid, (
                walks_local, log_n, sent_recs + sent, overflow + ovf, done)

        def varying(x):
            return _to_varying(x, axis, exchange)

        def count_box(box):
            return jnp.sum((box[:, :, 0] != sentinel).astype(jnp.int32))

        def count_carry(cv):
            return jnp.sum(cv.astype(jnp.int32))

        if schedule == "overlapped":
            sel = (jnp.arange(blk, dtype=jnp.int32) % 2) == 0
            outbox_A, carry_A, cvalid_A, ovfA = build_outbox(
                rec0, dest0, valid0 & sel,
                *_empty_carry(nshards, ccap, _R_TRIPLES))
            outbox_B, carry_B, cvalid_B, ovfB = build_outbox(
                rec0, dest0, valid0 & ~sel,
                *_empty_carry(nshards, ccap, _R_TRIPLES))
            acc0 = (varying(walks_local), varying(jnp.int32(0)),
                    varying(jnp.int32(0)), ovfA + ovfB,
                    varying(jnp.int32(0)))
            acc, phases = _overlapped_drive(
                a2a, process, outbox_A, carry_A, cvalid_A, outbox_B,
                carry_B, cvalid_B, acc0, count_box, count_carry, axis,
                max_phases, varying)
            walks_local, log_n, sent_recs, overflow, done = acc
            stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
            return walks_local[None, :blk, :width], stats[None]

        outbox, carry, carry_valid, ovf0 = build_outbox(
            rec0, dest0, valid0, *_empty_carry(nshards, ccap, _R_TRIPLES))

        def phase(state):
            outbox, carry, carry_valid, acc, _inflight, phases = state
            inbox = a2a(outbox)
            outbox, carry, carry_valid, acc = process(inbox, carry,
                                                      carry_valid, acc)
            inflight = lax.psum(count_box(outbox) + count_carry(carry_valid),
                                axis)
            return (outbox, carry, carry_valid, acc, inflight, phases + 1)

        def cond(state):
            return jnp.logical_and(state[4] > 0, state[5] < max_phases)

        init_inflight = lax.psum(count_box(outbox), axis)
        acc0 = (varying(walks_local), varying(jnp.int32(0)),
                varying(jnp.int32(0)), ovf0, varying(jnp.int32(0)))
        state = (outbox, carry, carry_valid, acc0, init_inflight,
                 jnp.int32(0))
        state = lax.while_loop(cond, phase, state)
        (walks_local, log_n, sent_recs, overflow, done) = state[3]
        phases = state[5]
        stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
        return walks_local[None, :blk, :width], stats[None]

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=(exchange != "pallas"),
        )
    )




def walk_triples_partitioned_routed(pgraph: PartitionedTriples, target_nodes,
                                    mesh: Mesh, walk_length: int,
                                    padding_idx: int, seed: int = 0,
                                    axis: str = "data",
                                    config: RoutedConfig | None = None,
                                    exchange: str = "xla",
                                    exchange_interpret: bool = False,
                                    schedule: str = "serial"):
    """KG-triples walks over a head-range-partitioned triples table with
    owner-routed walker exchange.  Returns (walks (B, 2L+1) int32, stats);
    bit-identical to ops.walk.walk_triples on the unpartitioned graph.
    ``schedule="overlapped"``: see walk_partitioned_routed.
    """
    num_walkers = int(target_nodes.shape[0])
    nshards = pgraph.num_shards
    if num_walkers % nshards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({nshards}); pad the target batch.")
    if walk_length == 0:
        # Matches the single-device shape contract: the (B, 1) target
        # column (no transitions, nothing routed).
        walks = jnp.asarray(target_nodes, jnp.int32)[:, None]
        return walks, {"log_entries": 0, "exchanged_records": 0,
                       "phases": 0, "overflow_dropped": 0,
                       "terminated": num_walkers, "exchange_bytes": 0}
    cfg = RoutedConfig.resolve(config, num_walkers, nshards, walk_length)
    meta_sh, rt_sh = pgraph.device_put(mesh, axis)
    targets = jax.device_put(
        jnp.asarray(target_nodes, jnp.int32), NamedSharding(mesh, P(axis)))
    fn = _routed_triples_jit(mesh, axis, nshards, pgraph.shard_entities,
                             num_walkers, walk_length, int(padding_idx),
                             cfg.pair_capacity, cfg.carry,
                             cfg.max_phases
                             * (2 if schedule == "overlapped" else 1),
                             exchange, bool(exchange_interpret),
                             schedule=schedule)
    key = jax.device_put(
        jnp.stack(prng.derive_key(int(seed), prng.STREAM_TRIPLES)),
        NamedSharding(mesh, P()))
    shard_walks, stats = fn(key, meta_sh, rt_sh, targets)
    walks = shard_walks.reshape(num_walkers, 2 * walk_length + 1)
    return walks, _routed_info(stats, _R_TRIPLES, "triples", num_walkers,
                               cfg)


# ---------------------------------------------------------------------------
# Edge-list family: owner-routed partitioned walks (padding/restart).
# ---------------------------------------------------------------------------

# Edge-list record layout (uint32 words): wid, completed steps, node, target.
# The start node rides in the record so a dead-end restart
# (rw_cpu_edge_list.cpp:103-108 jump_node semantics) is resolved LOCALLY:
# the pad position and the jump-back-to-target position are both logged by
# the shard that discovered the dead end, and the walker is forwarded
# straight to owner(target) — the pad "node" never needs an owner.
_R_EDGE = 4


@dataclasses.dataclass(frozen=True)
class PartitionedEdgeList:
    """EdgeListGraph split into contiguous head-node-range partitions.

    The indexed edge list is sorted by head (graph/edge_list.py), so each
    shard's out-edges are one contiguous slice; ``node_meta_shards[d, i]``
    = (start-within-slice, count) for local head ``d*S + i`` and
    ``tail_shards[d]`` that slice's tail column padded to E_max."""

    node_meta_shards: jnp.ndarray  # (D, S, 2) int32 [local start, cnt]
    tail_shards: jnp.ndarray       # (D, E_max) int32
    num_nodes: int
    num_shards: int
    shard_nodes: int

    @classmethod
    def from_edge_list(cls, graph, num_shards: int) -> "PartitionedEdgeList":
        n = graph.num_nodes
        meta, tails, s = _range_partition(graph.node_edge_index,
                                          np.asarray(graph.edge_list)[:, 1],
                                          n, num_shards)
        return cls(
            node_meta_shards=meta,
            tail_shards=tails,
            num_nodes=n,
            num_shards=num_shards,
            shard_nodes=s,
        )

    def device_put(self, mesh: Mesh, axis: str = "data"):
        sharding = NamedSharding(mesh, P(axis))
        return (jax.device_put(self.node_meta_shards, sharding),
                jax.device_put(self.tail_shards, sharding))


@functools.lru_cache(maxsize=64)
def _routed_edge_list_jit(mesh: Mesh, axis: str, nshards: int,
                          shard_nodes: int, num_walkers: int,
                          walk_length: int, padding_idx: int, restart: bool,
                          cap: int, ccap: int, max_phases: int,
                          exchange: str, exchange_interpret: bool,
                          schedule: str = "serial"):
    sentinel = _SENTINEL

    def shard_fn(key, meta, tails, tgt_local):
        meta = meta[0]
        tails = tails[0]
        my = lax.axis_index(axis)
        e_max = tails.shape[0]
        blk = num_walkers // nshards
        pad = jnp.int32(padding_idx)

        walks_local = jnp.full((blk + 1, walk_length + 2), pad, jnp.int32)
        walks_local = walks_local.at[:blk, 0].set(tgt_local)

        wid0 = (my * blk + jnp.arange(blk, dtype=jnp.int32)).astype(jnp.uint32)
        t0 = tgt_local.astype(jnp.uint32)
        rec0 = jnp.stack([wid0, jnp.zeros((blk,), jnp.uint32), t0, t0],
                         axis=1)
        dest0 = jnp.clip(tgt_local // shard_nodes, 0, nshards - 1)
        valid0 = jnp.ones((blk,), bool)

        def build_outbox(recs, dests, valid, carry, carry_valid):
            return _build_outbox(recs, dests, valid, carry, carry_valid,
                                 nshards, cap, ccap)

        a2a = _make_a2a(exchange, axis, nshards, exchange_interpret)

        def process(inbox, carry, carry_valid, acc):
            """Schedule-agnostic phase kernel (see _routed_uniform_jit)."""
            walks_local, log_n, sent_recs, overflow, done = acc
            recs = inbox.reshape(-1, _R_EDGE)
            wid = recs[:, 0]
            arrived = wid != sentinel
            is_log = arrived & ((recs[:, 1] & _LOG_BIT) != 0)
            fused = arrived & ((recs[:, 1] & _FUSE_BIT) != 0)
            step = recs[:, 1] & ~(_LOG_BIT | _FUSE_BIT)
            v = recs[:, 2].astype(jnp.int32)
            tgt = recs[:, 3]

            # LOG arrivals (wid-owner).  Normal: scatter walk[step] = v and
            # forward to owner(v).  FUSED dead-end restart: position step
            # is the pad (pre-filled), position step+1 is the jump back to
            # the target — scatter it and forward to owner(target).
            wrow = jnp.where(is_log, (wid - my * blk).astype(jnp.int32),
                             blk)
            wcol = jnp.where(is_log, jnp.where(fused, step + 1, step),
                             jnp.uint32(walk_length + 1)).astype(jnp.int32)
            wval = jnp.where(fused, tgt.astype(jnp.int32), v)
            walks_local = walks_local.at[wrow, wcol].set(wval)
            log_n = log_n + jnp.sum(is_log.astype(jnp.int32))
            fstep = jnp.where(fused, step + 1, step)
            fnode = jnp.where(fused, tgt, recs[:, 2])
            fwd_log = is_log & (fstep < walk_length)
            done = done + jnp.sum((is_log & ~fwd_log).astype(jnp.int32))
            rec_fwd = jnp.stack([wid, fstep, fnode, tgt], axis=1)
            dest_fwd = jnp.clip(fnode.astype(jnp.int32) // shard_nodes, 0,
                                nshards - 1)

            # STEP arrivals (owner(v)).
            stepping = arrived & ~is_log & (step < walk_length)
            local = jnp.clip(v - my * shard_nodes, 0, shard_nodes - 1)
            rows = meta[local]
            start, cnt = rows[:, 0], rows[:, 1]
            # Same counters as ops.edge_list_walk.uniform_walk_edge_list:
            # transition s consumes (wid, s << 16) on STREAM_EDGE_UNIFORM.
            c1 = prng.step_round_counter(step + jnp.uint32(1))
            bits, _ = prng.counter_bits(key, wid, c1)
            off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
            idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
            nxt = jnp.where(cnt > 0, tails[idx], pad)
            # cur == padding -> jump (sample_edge_neighbor's first branch):
            # only reachable when a TARGET equals padding_idx (pad nodes are
            # otherwise never forwarded), or when padding_idx is a real node
            # id a walk can visit.
            vpad = v == pad
            jump = jnp.where(jnp.bool_(restart), tgt.astype(jnp.int32), pad)
            nxt = jnp.where(vpad, jump, nxt)
            s1 = step + 1

            # Dead end with restart: fuse the deterministic pad -> target
            # jump (positions s1 = pad and s1+1 = target hop together to
            # the wid-owner, FUSED-flagged).  Dead end without restart (or
            # at the last step): the pad slots are pre-filled — terminate
            # here, nothing to log.
            dead = stepping & (nxt == pad)
            fuse_dep = dead & bool(restart) & (s1 < walk_length)
            norm_dep = stepping & (nxt != pad)
            term_here = stepping & ~fuse_dep & ~norm_dep
            done = done + jnp.sum(term_here.astype(jnp.int32))
            dep_flags = jnp.where(fuse_dep, _LOG_BIT | _FUSE_BIT, _LOG_BIT)
            new_rec = jnp.stack([wid, s1 | dep_flags,
                                 nxt.astype(jnp.uint32), tgt], axis=1)
            dest_new = jnp.clip((wid // jnp.uint32(blk)).astype(jnp.int32),
                                0, nshards - 1)

            recs_out = jnp.concatenate([rec_fwd, new_rec])
            dest_out = jnp.concatenate([dest_fwd, dest_new])
            valid_out = jnp.concatenate([fwd_log, fuse_dep | norm_dep])

            outbox, carry, carry_valid, ovf = build_outbox(
                recs_out, dest_out, valid_out, carry, carry_valid)
            sent = jnp.sum(valid_out.astype(jnp.int32))
            return outbox, carry, carry_valid, (
                walks_local, log_n, sent_recs + sent, overflow + ovf, done)

        def varying(x):
            return _to_varying(x, axis, exchange)

        def count_box(box):
            return jnp.sum((box[:, :, 0] != sentinel).astype(jnp.int32))

        def count_carry(cv):
            return jnp.sum(cv.astype(jnp.int32))

        if schedule == "overlapped":
            sel = (jnp.arange(blk, dtype=jnp.int32) % 2) == 0
            outbox_A, carry_A, cvalid_A, ovfA = build_outbox(
                rec0, dest0, valid0 & sel,
                *_empty_carry(nshards, ccap, _R_EDGE))
            outbox_B, carry_B, cvalid_B, ovfB = build_outbox(
                rec0, dest0, valid0 & ~sel,
                *_empty_carry(nshards, ccap, _R_EDGE))
            acc0 = (varying(walks_local), varying(jnp.int32(0)),
                    varying(jnp.int32(0)), ovfA + ovfB,
                    varying(jnp.int32(0)))
            acc, phases = _overlapped_drive(
                a2a, process, outbox_A, carry_A, cvalid_A, outbox_B,
                carry_B, cvalid_B, acc0, count_box, count_carry, axis,
                max_phases, varying)
            walks_local, log_n, sent_recs, overflow, done = acc
            stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
            return walks_local[None, :blk, : walk_length + 1], stats[None]

        outbox, carry, carry_valid, ovf0 = build_outbox(
            rec0, dest0, valid0, *_empty_carry(nshards, ccap, _R_EDGE))

        def phase(state):
            outbox, carry, carry_valid, acc, _inflight, phases = state
            inbox = a2a(outbox)
            outbox, carry, carry_valid, acc = process(inbox, carry,
                                                      carry_valid, acc)
            inflight = lax.psum(count_box(outbox) + count_carry(carry_valid),
                                axis)
            return (outbox, carry, carry_valid, acc, inflight, phases + 1)

        def cond(state):
            return jnp.logical_and(state[4] > 0, state[5] < max_phases)

        init_inflight = lax.psum(count_box(outbox), axis)
        acc0 = (varying(walks_local), varying(jnp.int32(0)),
                varying(jnp.int32(0)), ovf0, varying(jnp.int32(0)))
        state = (outbox, carry, carry_valid, acc0, init_inflight,
                 jnp.int32(0))
        state = lax.while_loop(cond, phase, state)
        (walks_local, log_n, sent_recs, overflow, done) = state[3]
        phases = state[5]
        stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
        return walks_local[None, :blk, : walk_length + 1], stats[None]

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=(exchange != "pallas"),
        )
    )




def walk_edge_list_partitioned_routed(pgraph: PartitionedEdgeList,
                                      target_nodes, mesh: Mesh,
                                      walk_length: int, padding_idx: int,
                                      restart: bool = True, seed: int = 0,
                                      axis: str = "data",
                                      config: RoutedConfig | None = None,
                                      exchange: str = "xla",
                                      exchange_interpret: bool = False,
                                      schedule: str = "serial"):
    """Uniform edge-list walks (padding/restart dead-end semantics) over a
    head-range-partitioned edge list with owner-routed walker exchange.
    Returns (walks (B, L+1) int32, stats); bit-identical to
    ops.walk.walk_edge_list on the unpartitioned graph.
    ``schedule="overlapped"``: see walk_partitioned_routed.
    """
    num_walkers = int(target_nodes.shape[0])
    nshards = pgraph.num_shards
    if num_walkers % nshards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({nshards}); pad the target batch.")
    if walk_length == 0:
        walks = jnp.asarray(target_nodes, jnp.int32)[:, None]
        return walks, {"log_entries": 0, "exchanged_records": 0,
                       "phases": 0, "overflow_dropped": 0,
                       "terminated": num_walkers, "exchange_bytes": 0}
    cfg = RoutedConfig.resolve(config, num_walkers, nshards, walk_length)
    meta_sh, tails_sh = pgraph.device_put(mesh, axis)
    targets = jax.device_put(
        jnp.asarray(target_nodes, jnp.int32), NamedSharding(mesh, P(axis)))
    fn = _routed_edge_list_jit(mesh, axis, nshards, pgraph.shard_nodes,
                               num_walkers, walk_length, int(padding_idx),
                               bool(restart), cfg.pair_capacity, cfg.carry,
                               cfg.max_phases
                               * (2 if schedule == "overlapped" else 1),
                               exchange, bool(exchange_interpret),
                               schedule=schedule)
    key = jax.device_put(
        jnp.stack(prng.derive_key(int(seed), prng.STREAM_EDGE_UNIFORM)),
        NamedSharding(mesh, P()))
    shard_walks, stats = fn(key, meta_sh, tails_sh, targets)
    walks = shard_walks.reshape(num_walkers, walk_length + 1)
    return walks, _routed_info(stats, _R_EDGE, "edge-list", num_walkers,
                               cfg)


# --- biased (p/q) edge-list walks, owner-routed -----------------------------

# Record (uint32 words): wid, step|flags<<24, t, v, rnd, a_val, f1c, f1rnd,
# f2c, f2rnd, target, bloom[4].  One word wider than _R_N2V: the restart
# jump target must ride with the walker (the CSR family has no jumps).
_R_EL_N2V = 15


def _edge_list_head_sorted(graph):
    """(heads, tails, cnts) of the head-sorted edge list (the order
    EdgeListGraph.from_arrays stores and _range_partition slices by)."""
    index = np.asarray(graph.node_edge_index)
    tails = np.asarray(graph.edge_list)[:, 1]
    n = graph.num_nodes
    starts = index[:, 0]
    cnts = np.where(starts >= 0, index[:, 1] - starts + 1, 0).astype(np.int64)
    heads = np.repeat(np.arange(n, dtype=np.int64), cnts)
    return heads, tails, cnts


def build_edge_list_partition_hashes(pgraph: PartitionedEdgeList, graph):
    """Per-shard cuckoo edge sets for partitioned biased edge-list walks:
    shard d holds the edges whose HEAD is in shard d's node range, so the
    distance-1 test ``is_neighbor_edge(cand, t)`` resolves at owner(t).
    Returns (tables (D, S_h, 2) uint32, salts (D,) uint32, log_size) —
    the same contract as parallel.partition.build_partition_hashes."""
    from torch_random_walk_tpu.graph.hashset import EdgeHashSet

    heads, tails, cnts = _edge_list_head_sorted(graph)
    n = graph.num_nodes
    s = pgraph.shard_nodes
    gstart = np.zeros(n + 1, np.int64)
    np.cumsum(cnts, out=gstart[1:])
    per_shard, max_log = [], 4
    for d in range(pgraph.num_shards):
        lo, hi = min(d * s, n), min((d + 1) * s, n)
        sl = slice(gstart[lo], gstart[hi]) if hi > lo else slice(0, 0)
        e = max(gstart[hi] - gstart[lo] if hi > lo else 0, 1)
        max_log = max(max_log, int(np.ceil(np.log2(max(4 * e, 16)))))
        per_shard.append((heads[sl], tails[sl]))
    tables, salts = [], []
    for h, tl in per_shard:
        if h.size == 0:
            tables.append(np.full(((1 << max_log), 2), 0xFFFFFFFF, np.uint32))
            salts.append(0)
            continue
        es = EdgeHashSet.from_edges_with_log_size(h, tl, max_log)
        tables.append(np.asarray(es.table))
        salts.append(es.salt)
    return (jnp.asarray(np.stack(tables)),
            jnp.asarray(np.asarray(salts, np.uint32)), max_log)


def build_edge_list_partition_blooms(pgraph: PartitionedEdgeList,
                                     graph) -> jnp.ndarray:
    """(D, S, 4) uint32 per-node out-neighbor Blooms, node-range sharded."""
    _, tails, cnts = _edge_list_head_sorted(graph)
    row_ptr = np.zeros(graph.num_nodes + 1, np.int64)
    np.cumsum(cnts, out=row_ptr[1:])
    flat = build_node_blooms(row_ptr, tails)
    s = pgraph.shard_nodes
    padded = np.zeros((pgraph.num_shards * s, _BLOOM_WORDS), np.uint32)
    padded[: flat.shape[0]] = flat
    return jnp.asarray(padded.reshape(pgraph.num_shards, s, _BLOOM_WORDS))


@functools.lru_cache(maxsize=64)
def _routed_edge_list_n2v_jit(mesh: Mesh, axis: str, nshards: int,
                              shard_nodes: int, num_walkers: int,
                              walk_length: int, p: float, q: float,
                              padding_idx: int, restart: bool,
                              spec_rounds: int, hash_log: int, cap: int,
                              ccap: int, max_phases: int,
                              exchange: str, exchange_interpret: bool,
                              schedule: str = "serial"):
    """Owner-routed biased edge-list walks: the _routed_n2v_jit phase
    machine with the edge-list transition law
    (ops/edge_list_walk.py::biased_walk_edge_list, re-creating
    /root/reference/csrc/cpu/rw_cpu_edge_list.cpp:128-238):

    - candidates come from the per-head [start, cnt] range over the local
      tail slice; a dead-end draw yields ``padding_idx``, and a walker AT
      padding draws the jump node (target if ``restart`` else padding);
    - candidate == t or == padding resolves LOCALLY at prob_0 (no
      distance-1 test); an accepted padding candidate's logged value is
      the jump node (the law fuses the pad->jump move into the accept);
    - other candidates classify against the in-record Bloom of N(t);
      in-band Bloom-positive draws freeze and resolve exactly at owner(t)
      via the per-shard edge cuckoo set;
    - with restart=False an accepted ``padding`` value absorbs the walk:
      the position is logged locally and the walker TERMINATES (pad slots
      are pre-filled at assembly), like the routed triples engine.

    Draws consume the identical (seed, STREAM_EDGE_BIASED, wid, step,
    round) threefry counters as the single-device engines, and rounds
    resolve in round order with identical acceptance — walks are
    bit-identical to ops.walk.walk_edge_list (tests/test_partition_v2.py).
    """
    from torch_random_walk_tpu.graph.hashset import _hash_jnp_traced
    from torch_random_walk_tpu.ops import common

    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    lo_acc = min(prob_1, prob_2)
    hi_acc = max(prob_1, prob_2)
    sentinel = _SENTINEL

    def shard_fn(key, meta, tails, ht, salt, bloom, tgt_local):
        meta = meta[0]          # (S, 2) [local start, cnt]
        tails = tails[0]        # (E_max,) local tail slice
        ht = ht[0]
        salt = salt[0]
        bloom = bloom[0]        # (S, 4) per-node N(t) Bloom filters
        my = lax.axis_index(axis)
        e_max = tails.shape[0]
        blk = num_walkers // nshards
        pad = jnp.int32(padding_idx)

        def owner(nodes):
            return jnp.clip(nodes // shard_nodes, 0, nshards - 1)

        def pack(wid, step, flags, t, v, rnd, a, f1, f1r, f2, f2r, tgt, tb):
            return jnp.concatenate([jnp.stack([
                wid, step | (flags.astype(jnp.uint32) << jnp.uint32(24)),
                t.astype(jnp.uint32), v.astype(jnp.uint32),
                rnd.astype(jnp.uint32), a.astype(jnp.uint32),
                f1.astype(jnp.uint32), f1r.astype(jnp.uint32),
                f2.astype(jnp.uint32), f2r.astype(jnp.uint32),
                tgt.astype(jnp.uint32)], axis=1),
                tb.astype(jnp.uint32)], axis=1)

        def local_contains(t, cand):
            # Edge-list membership keeps the CUCKOO path: its exact test
            # must reproduce is_neighbor_edge's reference off-by-one
            # (end-exclusive scan — SURVEY.md §2.4), which the per-shard
            # edge sets encode; the CSR engine's search-membership
            # alternative does not apply to range-table graphs.
            lo32 = cand.astype(jnp.uint32)
            hi32 = t.astype(jnp.uint32)
            hit = jnp.zeros(t.shape, bool)
            for which in range(2):
                pos = _hash_jnp_traced(lo32, hi32, salt, which, hash_log)
                row = ht[pos]
                hit |= (row[:, 0] == lo32) & (row[:, 1] == hi32)
            return hit

        def accept_r(wid, s, k):
            c1 = s * jnp.uint32(prng.MAX_ROUNDS_PER_STEP) + k
            _, b_acc = prng.counter_bits(key, wid, c1)
            return prng.uniform_from_bits(b_acc)

        walks_local = jnp.full((blk + 1, walk_length + 2), pad, jnp.int32)
        walks_local = walks_local.at[:blk, 0].set(tgt_local)

        wid0 = (my * blk + jnp.arange(blk, dtype=jnp.int32)).astype(jnp.uint32)
        z = jnp.zeros((blk,), jnp.uint32)
        zb = jnp.zeros((blk, _BLOOM_WORDS), jnp.uint32)
        rec0 = pack(wid0, z, z, tgt_local, tgt_local, z, z, z, z, z, z,
                    tgt_local, zb)
        dest0 = owner(tgt_local)
        valid0 = jnp.ones((blk,), bool) & (walk_length > 0)

        a2a = _make_a2a(exchange, axis, nshards, exchange_interpret)

        def process(inbox, carry, carry_valid, acc):
            """Schedule-agnostic phase kernel (see _routed_uniform_jit)."""
            walks_local, log_n, sent_recs, overflow, done = acc
            recs = inbox.reshape(-1, _R_EL_N2V)
            wid = recs[:, 0]
            arrived = wid != sentinel
            step = recs[:, 1] & jnp.uint32(0xFFFFFF)
            flags = recs[:, 1] >> jnp.uint32(24)
            mode_log = arrived & ((flags & _F_LOG) != 0)
            mode_resolve = arrived & ~mode_log & ((flags & _F_MODE) != 0)
            mode_step = arrived & ~mode_log & ~mode_resolve
            t = recs[:, 2].astype(jnp.int32)
            v = recs[:, 3].astype(jnp.int32)
            rnd0 = recs[:, 4]
            a_val = recs[:, 5].astype(jnp.int32)
            f1c = recs[:, 6].astype(jnp.int32)
            f1r_rnd = recs[:, 7]
            f2c = recs[:, 8].astype(jnp.int32)
            f2r_rnd = recs[:, 9]
            tgt = recs[:, 10]
            rec_bloom = recs[:, 11:15]
            has_a = (flags & _F_HAS_A) != 0
            n_f = flags >> jnp.uint32(3)
            s = step + 1
            jump = jnp.where(jnp.bool_(restart), tgt.astype(jnp.int32), pad)

            # ---- LOG arrivals: we are this walker's wid-owner. ----------
            wrow = jnp.where(mode_log, (wid - my * blk).astype(jnp.int32),
                             blk)
            wcol = jnp.where(mode_log, step,
                             jnp.uint32(walk_length + 1)).astype(jnp.int32)
            walks_local = walks_local.at[wrow, wcol].set(v)
            log_n = log_n + jnp.sum(mode_log.astype(jnp.int32))
            fwd_log = mode_log & (step < walk_length)
            done = done + jnp.sum((mode_log & ~fwd_log).astype(jnp.int32))
            rec_fwd = jnp.concatenate(
                [recs[:, :1], step[:, None], recs[:, 2:]], axis=1)
            dest_fwd = owner(v)

            # ---- STEP arrivals: draw + local classify. ------------------
            local = jnp.clip(v - my * shard_nodes, 0, shard_nodes - 1)
            rows = meta[local]
            start, cnt = rows[:, 0], rows[:, 1]
            v_is_pad = v == pad

            def draw(bits):
                """sample_edge_neighbor's law on the local slice: at pad ->
                jump; dead end -> pad; else a uniform out-edge tail."""
                off = prng.randint_from_bits(bits, jnp.maximum(cnt, 1))
                idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
                nxt = jnp.where(cnt > 0, tails[idx], pad)
                return jnp.where(v_is_pad, jump, nxt)

            # First hop (s == 1): one uniform draw, no acceptance.
            c1_first = jnp.uint32(prng.MAX_ROUNDS_PER_STEP)
            bits_first, _ = prng.counter_bits(
                key, wid, jnp.full_like(wid, c1_first))
            first_nxt = draw(bits_first)

            # Rejection scan (s >= 2), spec_phase register semantics.
            sc_has_a = jnp.zeros(wid.shape, bool)
            sc_a = v
            sc_nf = jnp.zeros(wid.shape, jnp.uint32)
            sc_f1 = v
            sc_f1r = jnp.zeros_like(rnd0)
            sc_f2 = v
            sc_f2r = jnp.zeros_like(rnd0)
            sc_ovf = jnp.zeros(wid.shape, bool)
            sc_stop3 = jnp.zeros_like(rnd0)
            stopped = jnp.zeros(wid.shape, bool)
            for k in range(spec_rounds):
                rk = rnd0 + jnp.uint32(k)
                c1 = s * jnp.uint32(prng.MAX_ROUNDS_PER_STEP) + rk
                b_cand, b_acc = prng.counter_bits(key, wid, c1)
                cand = draw(b_cand)
                r = prng.uniform_from_bits(b_acc)
                is_t = cand == t
                is_pad_c = cand == pad
                local_dec = is_t | is_pad_c
                maybe = _bloom_maybe(rec_bloom, cand)
                acc = jnp.where(local_dec, r < prob_0,
                                jnp.where(maybe, r < lo_acc, r < prob_2))
                rej = jnp.where(local_dec, r >= prob_0,
                                jnp.where(maybe, r >= hi_acc, r >= prob_2))
                # Accepted pad candidate moves to the jump node directly
                # (rw_cpu_edge_list.cpp:211-217's fused pad branch).
                value = jnp.where(is_pad_c & ~is_t, jump, cand)
                frz = ~acc & ~rej
                scan = ~stopped
                new_f1 = scan & frz & (sc_nf == 0)
                new_f2 = scan & frz & (sc_nf == 1)
                new_f3 = scan & frz & (sc_nf == 2)
                sc_f1 = jnp.where(new_f1, cand, sc_f1)
                sc_f1r = jnp.where(new_f1, rk, sc_f1r)
                sc_f2 = jnp.where(new_f2, cand, sc_f2)
                sc_f2r = jnp.where(new_f2, rk, sc_f2r)
                sc_nf = sc_nf + (new_f1 | new_f2 | new_f3).astype(jnp.uint32)
                sc_ovf = sc_ovf | new_f3
                sc_stop3 = jnp.where(new_f3, rk, sc_stop3)
                new_a = scan & acc
                sc_a = jnp.where(new_a, value, sc_a)
                sc_has_a = sc_has_a | new_a
                stopped = stopped | new_a | new_f3

            clean = sc_has_a & (sc_nf == 0)
            active = mode_step & (step < walk_length)
            step_next = jnp.where(s == 1, first_nxt, sc_a)
            step_done = active & ((s == 1) | clean)
            pending = active & (s >= 2) & (sc_nf >= 1)
            allrej = active & (s >= 2) & ~sc_has_a & (sc_nf == 0)
            replay_rnd = jnp.where(sc_ovf, sc_stop3,
                                   rnd0 + jnp.uint32(spec_rounds))

            # ---- RESOLVE arrivals: answer frozen draws locally. ---------
            r1 = accept_r(wid, s, f1r_rnd)
            r2 = accept_r(wid, s, f2r_rnd)
            acc1 = mode_resolve & jnp.where(local_contains(t, f1c),
                                            r1 < prob_1, r1 < prob_2)
            acc2 = (mode_resolve & (n_f >= 2) & ~acc1
                    & jnp.where(local_contains(t, f2c), r2 < prob_1,
                                r2 < prob_2))
            res_ok = acc1 | acc2 | (mode_resolve & has_a)
            res_next = jnp.where(acc1, f1c, jnp.where(acc2, f2c, a_val))
            res_fail = mode_resolve & ~res_ok

            # ---- termination bookkeeping --------------------------------
            adv_next = jnp.where(mode_resolve, res_next, step_next)
            adv_valid = step_done | res_ok
            if restart:
                absorbed = jnp.zeros(wid.shape, bool)
            else:
                # Absorbing mode: an accepted pad value ends the walk —
                # terminate here; the walk shard's pad slots are
                # pre-filled, so nothing needs logging.
                absorbed = adv_valid & (adv_next == pad)
            done = done + jnp.sum(absorbed.astype(jnp.int32))

            # ---- departures ---------------------------------------------
            zf = jnp.zeros_like(wid)
            forward = adv_valid & ~absorbed
            # Fresh record's t is the current v; its N(v) Bloom is local
            # here for STEP lanes (we ARE owner(v)); RESOLVE lanes shipped
            # it in.  The record hops to the walker's WID-OWNER (LOG flag),
            # which scatters walk[s] and forwards to owner(adv_next) — a
            # just-finished walker dies there after logging walk[L].
            v_bloom_local = bloom[local]
            fresh_tb = jnp.where(mode_resolve[:, None], rec_bloom,
                                 v_bloom_local)
            fresh = pack(wid, s, jnp.full_like(wid, _F_LOG), v, adv_next,
                         zf, zf, zf, zf, zf, zf, tgt, fresh_tb)
            pend_flags = (jnp.uint32(_F_MODE)
                          | jnp.where(sc_has_a, jnp.uint32(_F_HAS_A),
                                      jnp.uint32(0))
                          | jnp.where(sc_ovf, jnp.uint32(_F_OVF),
                                      jnp.uint32(0))
                          | (jnp.minimum(sc_nf, 2) << jnp.uint32(3)))
            pend = pack(wid, step, pend_flags, t, v, replay_rnd, sc_a,
                        sc_f1, sc_f1r, sc_f2, sc_f2r, tgt, v_bloom_local)
            local_t = jnp.clip(t - my * shard_nodes, 0, shard_nodes - 1)
            rep_tb = jnp.where(mode_resolve[:, None], bloom[local_t],
                               rec_bloom)
            rep = pack(wid, step, zf,
                       t, v, jnp.where(mode_resolve, rnd0, replay_rnd),
                       zf, zf, zf, zf, zf, tgt, rep_tb)
            rep_valid = allrej | res_fail

            wid_dest = jnp.clip((wid // jnp.uint32(blk)).astype(jnp.int32),
                                0, nshards - 1)
            recs_out = jnp.concatenate([rec_fwd, fresh, pend, rep])
            dest_out = jnp.concatenate([
                dest_fwd, wid_dest, owner(t), owner(v)])
            valid_out = jnp.concatenate([fwd_log, forward, pending,
                                         rep_valid])

            outbox, carry, carry_valid, ovf = _build_outbox(
                recs_out, dest_out, valid_out, carry, carry_valid,
                nshards=nshards, cap=cap, ccap=ccap)
            sent = jnp.sum(valid_out.astype(jnp.int32))
            return outbox, carry, carry_valid, (
                walks_local, log_n, sent_recs + sent, overflow + ovf, done)

        def varying(x):
            return _to_varying(x, axis, exchange)

        def count_box(box):
            return jnp.sum((box[:, :, 0] != sentinel).astype(jnp.int32))

        def count_carry(cv):
            return jnp.sum(cv.astype(jnp.int32))

        if schedule == "overlapped":
            sel = (jnp.arange(blk, dtype=jnp.int32) % 2) == 0
            outbox_A, carry_A, cvalid_A, ovfA = _build_outbox(
                rec0, dest0, valid0 & sel,
                *_empty_carry(nshards, ccap, _R_EL_N2V), nshards=nshards,
                cap=cap, ccap=ccap)
            outbox_B, carry_B, cvalid_B, ovfB = _build_outbox(
                rec0, dest0, valid0 & ~sel,
                *_empty_carry(nshards, ccap, _R_EL_N2V), nshards=nshards,
                cap=cap, ccap=ccap)
            acc0 = (varying(walks_local), varying(jnp.int32(0)),
                    varying(jnp.int32(0)), ovfA + ovfB,
                    varying(jnp.int32(0)))
            acc, phases = _overlapped_drive(
                a2a, process, outbox_A, carry_A, cvalid_A, outbox_B,
                carry_B, cvalid_B, acc0, count_box, count_carry, axis,
                max_phases, varying)
            walks_local, log_n, sent_recs, overflow, done = acc
            stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
            return walks_local[None, :blk, : walk_length + 1], stats[None]

        outbox, carry, carry_valid, ovf0 = _build_outbox(
            rec0, dest0, valid0, *_empty_carry(nshards, ccap, _R_EL_N2V),
            nshards=nshards, cap=cap, ccap=ccap)

        def phase(state):
            outbox, carry, carry_valid, acc, _inflight, phases = state
            inbox = a2a(outbox)
            outbox, carry, carry_valid, acc = process(inbox, carry,
                                                      carry_valid, acc)
            inflight = lax.psum(count_box(outbox) + count_carry(carry_valid),
                                axis)
            return (outbox, carry, carry_valid, acc, inflight, phases + 1)

        def cond(state):
            return jnp.logical_and(state[4] > 0, state[5] < max_phases)

        init_inflight = lax.psum(count_box(outbox), axis)
        acc0 = (varying(walks_local), varying(jnp.int32(0)),
                varying(jnp.int32(0)), ovf0, varying(jnp.int32(0)))
        state = (outbox, carry, carry_valid, acc0, init_inflight,
                 jnp.int32(0))
        state = lax.while_loop(cond, phase, state)
        (walks_local, log_n, sent_recs, overflow, done) = state[3]
        phases = state[5]
        stats = jnp.stack([log_n, sent_recs, phases, overflow, done])
        return walks_local[None, :blk, : walk_length + 1], stats[None]

    return jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P(axis)),
            check_vma=(exchange != "pallas"),
        )
    )


def walk_edge_list_node2vec_partitioned_routed(
        pgraph: PartitionedEdgeList, hashes, target_nodes, mesh: Mesh,
        p: float, q: float, walk_length: int, padding_idx: int,
        restart: bool = True, seed: int = 0, axis: str = "data",
        config: RoutedConfig | None = None, spec_rounds: int = 6,
        blooms=None, exchange: str = "xla",
        exchange_interpret: bool = False, schedule: str = "serial"):
    """Biased (p/q) edge-list walks over a head-range-partitioned edge list
    with owner-routed walker exchange — the beyond-HBM tier of
    ops.walk.walk_edge_list's biased path.  Returns (walks (B, L+1) int32,
    stats); bit-identical to the single-device engines.

    ``hashes`` = build_edge_list_partition_hashes(pgraph, graph);
    ``blooms`` = build_edge_list_partition_blooms(pgraph, graph) (omitting
    it keeps walks identical but resolves every in-band draw remotely).
    """
    num_walkers = int(target_nodes.shape[0])
    nshards = pgraph.num_shards
    if num_walkers % nshards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({nshards}); pad the target batch.")
    if walk_length == 0:
        walks = jnp.asarray(target_nodes, jnp.int32)[:, None]
        return walks, {"log_entries": 0, "exchanged_records": 0,
                       "phases": 0, "overflow_dropped": 0,
                       "terminated": num_walkers, "exchange_bytes": 0}
    cfg = RoutedConfig.resolve(config, num_walkers, nshards, walk_length)
    if config is None or config.max_phases <= 0:
        cfg = _biased_phase_budget(cfg, walk_length, spec_rounds)
    hash_tables, hash_salts, hash_log = hashes
    if blooms is None:
        blooms = jnp.full(
            (nshards, pgraph.shard_nodes, _BLOOM_WORDS), 0xFFFFFFFF,
            jnp.uint32)
    meta_sh, tails_sh = pgraph.device_put(mesh, axis)
    sharding = NamedSharding(mesh, P(axis))
    ht_sh = jax.device_put(hash_tables, sharding)
    salts_sh = jax.device_put(hash_salts, sharding)
    bloom_sh = jax.device_put(blooms, sharding)
    targets = jax.device_put(jnp.asarray(target_nodes, jnp.int32), sharding)
    fn = _routed_edge_list_n2v_jit(
        mesh, axis, nshards, pgraph.shard_nodes, num_walkers, walk_length,
        float(p), float(q), int(padding_idx), bool(restart),
        int(spec_rounds), int(hash_log), cfg.pair_capacity, cfg.carry,
        cfg.max_phases * (2 if schedule == "overlapped" else 1),
        exchange, bool(exchange_interpret), schedule=schedule)
    key = jax.device_put(
        jnp.stack(prng.derive_key(int(seed), prng.STREAM_EDGE_BIASED)),
        NamedSharding(mesh, P()))
    shard_walks, stats = fn(key, meta_sh, tails_sh, ht_sh, salts_sh,
                            bloom_sh, targets)
    walks = shard_walks.reshape(num_walkers, walk_length + 1)
    info = _routed_info(stats, _R_EL_N2V, "edge-list-node2vec", num_walkers,
                        cfg)
    info["collectives_per_step"] = round(
        info["phases"] / max(walk_length, 1), 2)
    return walks, info
