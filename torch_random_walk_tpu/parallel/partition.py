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
A sorted ``all_to_all`` walker-routing variant that sends each walker only to
its owner is the planned optimization once profiling justifies it.

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
