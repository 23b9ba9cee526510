"""Edge-partitioned multi-chip walks: the graph itself is sharded.

For graphs too large for one device's HBM (SURVEY.md §2.8: "CSR shards per
host, walkers exchanged each step").  Nodes are partitioned into contiguous
ranges; each device holds only its range's CSR rows (col entries stay global
ids).  Each walk step, inside ``shard_map``:

  1. ``all_gather`` the walker frontier (tiny: 4 bytes/walker) over ICI;
  2. every device answers the walkers currently sitting on ITS partition
     (vectorized local gather + threefry draw), zeros elsewhere;
  3. ``psum`` combines the answers back into the full next frontier.

This exchange-by-reduction keeps every shape static (SURVEY.md §7 hard part 3
— no ragged all-to-all capacity planning) at the cost of O(num_walkers)
collective bytes per step, which is negligible next to the graph gathers.
The owner-routed ``all_to_all`` variant that sends each walker only to its
owner is implemented in parallel/partition_v2.py (the production engine);
this module is kept as the simpler cross-check implementation.

RNG draws are keyed on global walker ids, so partitioned walks are
bit-identical to single-device walks (verified in tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from torch_random_walk_tpu.graph.csr import CSRGraph
from torch_random_walk_tpu.utils import prng


@dataclasses.dataclass(frozen=True)
class PartitionedCSR:
    """CSR graph split into contiguous node-range partitions.

    row_ptr_shards: (D, S + 1) — per-shard row offsets, rebased to the local
        col shard (row_ptr_shards[d, 0] == 0); padded rows have degree 0.
    col_shards: (D, E_max) — per-shard neighbor lists, *global* node ids,
        padded with 0.
    """

    row_ptr_shards: jnp.ndarray
    col_shards: jnp.ndarray
    # (D, S, 2) int32 [start, deg] per local node — one row gather per step
    # (BENCHLOG.md: row gathers are ~2.6x scalar gathers on the TPU gather
    # engine; this replaces the two row_ptr scalar gathers of the naive step).
    node_meta_shards: jnp.ndarray
    num_nodes: int
    num_shards: int
    shard_nodes: int  # S: nodes per shard (padded)

    @classmethod
    def from_csr(cls, graph: CSRGraph, num_shards: int) -> "PartitionedCSR":
        row_ptr = np.asarray(graph.row_ptr)
        col_idx = np.asarray(graph.col_idx)
        n = graph.num_nodes
        s = -(-n // num_shards)  # ceil
        bounds = [min(d * s, n) for d in range(num_shards + 1)]
        locals_rp, locals_col = [], []
        for d in range(num_shards):
            lo, hi = bounds[d], bounds[d + 1]
            rp = row_ptr[lo : hi + 1] - row_ptr[lo]
            # Pad the node range to exactly s rows (degree-0 tail).
            rp = np.concatenate([rp, np.full(s - (hi - lo), rp[-1], rp.dtype)])
            locals_rp.append(rp)
            locals_col.append(col_idx[row_ptr[lo] : row_ptr[hi]])
        e_max = max((c.size for c in locals_col), default=0)
        e_max = max(e_max, 1)
        col = np.zeros((num_shards, e_max), col_idx.dtype)
        for d, c in enumerate(locals_col):
            col[d, : c.size] = c
        rp_stack = np.stack(locals_rp)
        meta = np.stack([rp_stack[:, :-1], np.diff(rp_stack, axis=1)],
                        axis=-1).astype(np.int32)
        return cls(
            row_ptr_shards=jnp.asarray(rp_stack),
            col_shards=jnp.asarray(col),
            node_meta_shards=jnp.asarray(meta),
            num_nodes=n,
            num_shards=num_shards,
            shard_nodes=s,
        )

    def device_put(self, mesh: Mesh, axis: str = "data"):
        """Place each partition on its device along ``axis``."""
        sharding = NamedSharding(mesh, P(axis))
        return (
            jax.device_put(self.node_meta_shards, sharding),
            jax.device_put(self.col_shards, sharding),
        )


def walk_partitioned(pgraph: PartitionedCSR, target_nodes, mesh: Mesh,
                     walk_length: int, seed: int = 0, axis: str = "data"):
    """Uniform walks over an edge-partitioned graph.  Returns (N, L+1) walks
    sharded by walker along ``axis``; bit-identical to uniform_walk_csr on the
    unpartitioned graph."""
    num_walkers = int(target_nodes.shape[0])
    if num_walkers % pgraph.num_shards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({pgraph.num_shards}); pad the target batch."
        )
    shard_nodes = pgraph.shard_nodes
    key = prng.derive_key(seed, prng.STREAM_CSR_UNIFORM)
    rp_sh, col_sh = pgraph.device_put(mesh, axis)
    targets = jax.device_put(
        target_nodes.astype(pgraph.col_shards.dtype),
        NamedSharding(mesh, P(axis)),
    )

    def shard_fn(meta, col, tgt_local):
        meta = meta[0]    # (S, 2)  local [start, deg] rows
        col = col[0]      # (E_max,)  global neighbor ids
        my = lax.axis_index(axis)
        lo = (my * shard_nodes).astype(meta.dtype)
        e_max = col.shape[0]
        wid = jnp.arange(num_walkers, dtype=jnp.uint32)

        def step_fn(cur_all, step):
            # cur_all: full (N,) frontier, identical on every device.
            c1 = jnp.full((num_walkers,), prng.step_round_counter(step),
                          jnp.uint32)
            bits, _ = prng.counter_bits(key, wid, c1)
            local = jnp.clip(cur_all - lo, 0, shard_nodes - 1).astype(
                meta.dtype)
            owned = (cur_all >= lo) & (cur_all < lo + shard_nodes)
            rows = meta[local]          # one (S, 2) row gather
            start = rows[:, 0]
            deg = rows[:, 1]
            off = prng.randint_from_bits(bits, jnp.maximum(deg, 1))
            idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
            nxt = jnp.where(deg > 0, col[idx], cur_all)
            contrib = jnp.where(owned, nxt, 0).astype(cur_all.dtype)
            # psum output is device-invariant; re-mark it as device-varying so
            # the scan carry type matches the all_gather'd initial frontier.
            nxt_all = lax.pcast(lax.psum(contrib, axis), axis, to="varying")
            return nxt_all, nxt_all

        cur0 = lax.all_gather(tgt_local, axis, tiled=True)  # (N,)
        steps = jnp.arange(1, walk_length + 1, dtype=jnp.uint32)
        _, seq = lax.scan(step_fn, cur0, steps)
        walks_all = jnp.concatenate([cur0[:, None], seq.T], axis=1)
        # Keep only this device's walker block (out_specs reassembles).
        blk = num_walkers // pgraph.num_shards
        return lax.dynamic_slice_in_dim(walks_all, my * blk, blk, axis=0)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
    )
    return fn(rp_sh, col_sh, targets)


def build_partition_hashes(pgraph: PartitionedCSR, graph: CSRGraph):
    """Per-shard cuckoo edge sets for partitioned node2vec walks.

    Shard d's set holds exactly the edges whose HEAD lives in shard d, so the
    distance-1 test ``is_neighbor(t, cand)`` is answered authoritatively by
    t's owner.  All shards share one log_size (static shapes); salts may
    differ per shard.  Returns (tables (D, S_h, 2) uint32, salts (D,) uint32,
    log_size).
    """
    from torch_random_walk_tpu.graph.hashset import EdgeHashSet

    row_ptr = np.asarray(graph.row_ptr)
    col_idx = np.asarray(graph.col_idx)
    n = graph.num_nodes
    s = pgraph.shard_nodes
    per_shard = []
    max_log = 4
    for d in range(pgraph.num_shards):
        # Clamp like PartitionedCSR.from_csr: trailing shards may be empty.
        lo, hi = min(d * s, n), min((d + 1) * s, n)
        heads = np.repeat(np.arange(lo, hi), np.diff(row_ptr[lo:hi + 1]))
        tails = col_idx[row_ptr[lo]:row_ptr[hi]]
        e = max(heads.shape[0], 1)
        max_log = max(max_log, int(np.ceil(np.log2(max(4 * e, 16)))))
        per_shard.append((heads, tails))
    tables, salts = [], []
    for heads, tails in per_shard:
        if heads.size == 0:
            tables.append(np.full(((1 << max_log), 2), 0xFFFFFFFF, np.uint32))
            salts.append(0)
            continue
        es = EdgeHashSet.from_edges_with_log_size(heads, tails, max_log)
        tables.append(np.asarray(es.table))
        salts.append(es.salt)
    return (jnp.asarray(np.stack(tables)),
            jnp.asarray(np.asarray(salts, np.uint32)), max_log)


def walk_partitioned_node2vec(pgraph: PartitionedCSR, hashes, target_nodes,
                              mesh: Mesh, p: float, q: float,
                              walk_length: int, seed: int = 0,
                              axis: str = "data", max_rounds: int = 4096):
    """node2vec walks over an edge-partitioned graph.

    Bit-identical to the single-device biased engines (same threefry
    counters, same acceptance).  Each rejection round costs two psums over
    ICI: one combining candidate draws from the owners of each walker's
    current node, one combining the distance-1 answer from the owners of the
    previous node.  Rounds are synchronized full-batch; the production
    engine (parallel/partition_v2.walk_partitioned_node2vec_routed) replaces
    them with owner-routed records and one all_to_all per phase.

    ``hashes`` is build_partition_hashes(pgraph, graph).
    """
    from torch_random_walk_tpu.graph.hashset import _hash_jnp_traced
    from torch_random_walk_tpu.ops import common

    num_walkers = int(target_nodes.shape[0])
    if num_walkers % pgraph.num_shards:
        raise ValueError(
            f"num_walkers ({num_walkers}) must be divisible by the shard "
            f"count ({pgraph.num_shards}); pad the target batch."
        )
    shard_nodes = pgraph.shard_nodes
    key = prng.derive_key(seed, prng.STREAM_CSR_BIASED)
    prob_0, prob_1, prob_2 = common.node2vec_accept_probs(p, q)
    hash_tables, hash_salts, hash_log = hashes
    meta_sh, col_sh = pgraph.device_put(mesh, axis)
    sharding = NamedSharding(mesh, P(axis))
    ht_sh = jax.device_put(hash_tables, sharding)
    salts_sh = jax.device_put(hash_salts, sharding)
    targets = jax.device_put(
        target_nodes.astype(pgraph.col_shards.dtype), sharding)

    def shard_fn(meta, col, ht, salt, tgt_local):
        meta = meta[0]
        col = col[0]
        ht = ht[0]           # (S_h, 2) local cuckoo table
        salt = salt[0]       # traced uint32
        my = lax.axis_index(axis)
        lo = (my * shard_nodes).astype(meta.dtype)
        e_max = col.shape[0]
        wid = jnp.arange(num_walkers, dtype=jnp.uint32)

        def owned(nodes):
            return (nodes >= lo) & (nodes < lo + shard_nodes)

        def local_sample(cur_all, bits):
            """Owner's candidate draw; 0 contribution off-shard."""
            local = jnp.clip(cur_all - lo, 0, shard_nodes - 1).astype(
                meta.dtype)
            rows = meta[local]
            start, deg = rows[:, 0], rows[:, 1]
            off = prng.randint_from_bits(bits, jnp.maximum(deg, 1))
            idx = jnp.clip(start + off.astype(start.dtype), 0, e_max - 1)
            nxt = jnp.where(deg > 0, col[idx], cur_all)
            return jnp.where(owned(cur_all), nxt, 0).astype(cur_all.dtype)

        def psum_varying(x):
            return lax.pcast(lax.psum(x, axis), axis, to="varying")

        def local_contains(u, v):
            """Local cuckoo membership, masked to walkers whose t we own."""
            lo32 = v.astype(jnp.uint32)
            hi32 = u.astype(jnp.uint32)
            hit = jnp.zeros(u.shape, bool)
            for which in range(2):
                pos = _hash_jnp_traced(lo32, hi32, salt, which, hash_log)
                row = ht[pos]
                hit |= (row[:, 0] == lo32) & (row[:, 1] == hi32)
            return hit & owned(u)

        def first_hop(t_all):
            c1 = jnp.full((num_walkers,), prng.step_round_counter(1),
                          jnp.uint32)
            bits, _ = prng.counter_bits(key, wid, c1)
            return psum_varying(local_sample(t_all, bits))

        def step_fn(carry, step):
            t_all, v_all = carry

            def cond(state):
                resolved, _, rnd = state
                return jnp.logical_and(~jnp.all(resolved), rnd < max_rounds)

            def body(state):
                resolved, sel, rnd = state
                c1 = jnp.full(
                    (num_walkers,),
                    prng.step_round_counter(step, rnd.astype(jnp.uint32)),
                    jnp.uint32)
                b_cand, b_acc = prng.counter_bits(key, wid, c1)
                cand = psum_varying(local_sample(v_all, b_cand))
                nbr = psum_varying(
                    local_contains(t_all, cand).astype(jnp.int32)) > 0
                r = prng.uniform_from_bits(b_acc)
                is_t = cand == t_all
                accept = jnp.where(is_t, r < prob_0,
                                   jnp.where(nbr, r < prob_1, r < prob_2))
                sel = jnp.where(~resolved & accept, cand, sel)
                return resolved | accept, sel, rnd + 1

            init = (
                lax.pcast(jnp.zeros((num_walkers,), bool), axis,
                          to="varying"),
                v_all,
                jnp.int32(0),
            )
            _, sel, _ = lax.while_loop(cond, body, init)
            return (v_all, sel), sel

        t_all = lax.all_gather(tgt_local, axis, tiled=True)
        v_all = first_hop(t_all)
        steps = jnp.arange(2, walk_length + 1, dtype=jnp.uint32)
        _, seq = lax.scan(step_fn, (t_all, v_all), steps)
        walks_all = jnp.concatenate(
            [t_all[:, None], v_all[:, None], seq.T], axis=1)
        blk = num_walkers // pgraph.num_shards
        return lax.dynamic_slice_in_dim(walks_all, my * blk, blk, axis=0)

    fn = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis),
        )
    )
    return fn(meta_sh, col_sh, ht_sh, salts_sh, targets)
