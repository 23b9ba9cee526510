"""ogbn-papers100M-class readiness (BASELINE.json config 5; VERDICT r2 item 5).

papers100M is 111M nodes / 1.6B directed edges (avg deg ~14.6) — past both
single-chip HBM and the 31-bit packed-field limit of the fat tables
(graph/csr.PackedLayout.fits), so the answer is the owner-routed
partitioned engines (parallel/partition_v2.py).  This script demonstrates
that path end-to-end at a host-RAM-feasible fraction of the full shape:

  1. builds a papers100M-shaped synthetic (power-law hubs, avg deg 15) at
     ``--scale`` of the full node count (default 1/10: 11.1M nodes,
     ~188M directed edges with the ring edges);
  2. constructs PartitionedCSR shards + per-shard Bloom tables for D=8
     (r4: NO cuckoo — the routed engine's distance-1 test binary-searches
     the local col slice under hashes=None, dropping the 10.7 GB/shard
     membership term of the r3 budget; pass --cuckoo to rebuild the old
     path), walks uniform AND node2vec on the virtual CPU mesh, asserts
     zero-drop/completeness;
  3. prints the measured per-shard memory table and its linear
     extrapolation to the full 111M/1.6B shape, per device count.

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
      python benchmarks/papers_readiness.py [--scale 0.1] [--devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAPERS_NODES = 111_059_956
PAPERS_EDGES = 1_615_685_872
AVG_DEG = 15


def shard_memory_bytes(pg, hashes, blooms, num_walkers, walk_length):
    """Per-shard device-memory table (bytes) for the routed node2vec walk."""
    d = pg.num_shards
    out = {}
    out["node_meta"] = pg.shard_nodes * 2 * 4
    out["col_slice"] = int(pg.col_shards.shape[1]) * 4
    out["cuckoo"] = (int(hashes[0].shape[1]) * 2 * 4
                     if hashes is not None else 0)
    out["bloom"] = pg.shard_nodes * 4 * 4
    out["walk_shard"] = (num_walkers // d) * (walk_length + 1) * 4
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--walkers", type=int, default=8192)
    ap.add_argument("--walk-length", type=int, default=8)
    ap.add_argument("--cuckoo", action="store_true",
                    help="use the per-shard cuckoo edge sets (r3 path) "
                    "instead of local binary search")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import numpy as np
    import jax

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
    from torch_random_walk_tpu.ops.uniform import uniform_walk_csr
    from torch_random_walk_tpu.parallel.mesh import make_mesh
    from torch_random_walk_tpu.parallel.partition import (
        PartitionedCSR,
        build_partition_hashes,
    )
    from torch_random_walk_tpu.parallel.partition_v2 import (
        build_partition_blooms,
        walk_partitioned_node2vec_routed,
        walk_partitioned_routed,
    )

    n = int(PAPERS_NODES * args.scale)
    t0 = time.time()
    graph = synthetic_power_law(n, AVG_DEG, 0, cache_root="dataset")
    build_s = time.time() - t0
    print(f"graph: {graph.num_nodes:,} nodes, {graph.num_edges:,} edges "
          f"({build_s:.0f}s build)", flush=True)

    d = args.devices
    mesh = make_mesh(devices=jax.devices()[:d])
    t0 = time.time()
    pg = PartitionedCSR.from_csr(graph, d)
    hashes = build_partition_hashes(pg, graph) if args.cuckoo else None
    blooms = build_partition_blooms(pg, graph)
    part_s = time.time() - t0
    print(f"partitioned into D={d} shards ({part_s:.0f}s)", flush=True)

    targets = jnp.arange(args.walkers, dtype=jnp.int32) % n
    t0 = time.time()
    walks_u, info_u = walk_partitioned_routed(pg, targets, mesh,
                                              args.walk_length, seed=7)
    uni_s = time.time() - t0
    t0 = time.time()
    walks_b, info_b = walk_partitioned_node2vec_routed(
        pg, hashes, targets, mesh, 0.5, 2.0, args.walk_length, seed=7,
        blooms=blooms)
    bias_s = time.time() - t0
    assert info_u["overflow_dropped"] == 0 and info_b["overflow_dropped"] == 0

    # Spot-check bit-identity on a slice vs the single-device jnp engine
    # (the full single-device walk also runs fine at this scale on CPU).
    ref = uniform_walk_csr(graph.row_ptr, graph.col_idx, targets[:256],
                           args.walk_length, seed=7)
    np.testing.assert_array_equal(np.asarray(ref),
                                  np.asarray(walks_u[:256]))

    mem = shard_memory_bytes(pg, hashes, blooms, args.walkers,
                             args.walk_length)
    # Extrapolate to full papers100M: graph-proportional terms scale by
    # 1/scale; the walk shard scales with B*(L+1)/D (shown at a production
    # B = 1M, L = 80).
    full = {
        "node_meta": int(mem["node_meta"] / args.scale),
        "col_slice": int(mem["col_slice"] / args.scale),
        "cuckoo": int(mem["cuckoo"] / args.scale),
        "bloom": int(mem["bloom"] / args.scale),
        "walk_shard@B=1M,L=80": 1_000_000 // d * 81 * 4,
    }
    print(json.dumps({
        "scale": args.scale,
        "nodes": graph.num_nodes,
        "edges": graph.num_edges,
        "devices": d,
        "uniform_phases": info_u["phases"],
        "uniform_s": round(uni_s, 1),
        "node2vec_phases": info_b["phases"],
        "node2vec_s": round(bias_s, 1),
        "exchange_bytes_per_step_uniform": round(
            info_u["exchange_bytes"] / (args.walkers * args.walk_length), 1),
        "per_shard_bytes_measured": mem,
        "per_shard_gb_measured": round(sum(mem.values()) / 2**30, 3),
        "per_shard_bytes_full_papers100M": full,
        "per_shard_gb_full_papers100M_D8": round(
            sum(full.values()) / 2**30, 2),
        "per_shard_gb_full_papers100M_D64": round(
            (sum(v for k, v in full.items()
                 if k != "walk_shard@B=1M,L=80") / 8
             + 1_000_000 // 64 * 81 * 4) / 2**30, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
