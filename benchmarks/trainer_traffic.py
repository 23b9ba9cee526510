"""Sharded-trainer optimizer TRAFFIC: dense vs touched-rows Adam (VERDICT
r3 #4b).

Real pod bandwidth cannot be measured here, but the COLLECTIVE BYTES a
step moves can: AOT-compile ShardedNode2Vec's fused step for both
update modes on the virtual dp x mp mesh and sum the result sizes of
every collective (all-reduce / all-gather / reduce-scatter /
all-to-all / collective-permute) in the OPTIMIZED HLO.  This is the
hardware-independent quantity the ICI actually carries per step.

The regime that motivates update_mode="sparse": vocabulary >> batch
(papers100M-class tables).  Dense Adam's gradient psum over 'data' moves
the FULL (N, D) tables every step; the sparse step psums only the
touched sub-tables (~B*L unique rows) plus the id all-gather.

Run (CPU, 8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python benchmarks/trainer_traffic.py
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_COLL = re.compile(
    r"=\s*((?:\([^)]*\)|\S+))\s+"
    r"(all-reduce|all-gather|reduce-scatter|all-to-all|collective-permute)"
    r"(?:-start)?\(")
_SHAPE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|pred)"
                    r"\[([0-9,]*)\]")


def collective_bytes(hlo_text: str) -> dict:
    """Sum result bytes per collective kind over an optimized HLO module."""
    out: dict[str, int] = {}
    for m in _COLL.finditer(hlo_text):
        shapes, kind = m.group(1), m.group(2)
        total = 0
        for dt, dims in _SHAPE.findall(shapes):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        out[kind] = out.get(kind, 0) + total
    out["total"] = sum(v for k, v in out.items() if k != "total")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_000_000)
    ap.add_argument("--degree", type=int, default=8)
    ap.add_argument("--walkers", type=int, default=16_384)
    ap.add_argument("--walk-length", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--mp", type=int, default=4)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count="
            f"{args.dp * args.mp}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
    from torch_random_walk_tpu.parallel.mesh import make_mesh
    from torch_random_walk_tpu.parallel.trainer import (
        ShardedNode2Vec,
        ShardedNode2VecConfig,
    )

    graph = synthetic_power_law(args.nodes, args.degree, 0,
                                cache_root="dataset")
    mesh = make_mesh((args.dp, args.mp), ("data", "model"))
    results = {}
    for mode in ("dense", "sparse"):
        cfg = ShardedNode2VecConfig(dim=args.dim,
                                    walk_length=args.walk_length,
                                    update_mode=mode)
        tr = ShardedNode2Vec(graph, mesh, cfg)
        params, opt_state = tr.init()
        targets = jax.device_put(
            jnp.arange(args.walkers, dtype=jnp.int32) % graph.num_nodes,
            tr._dp)
        if tr._use_fat:
            g = (tr.edge_tab, tr.node_tab, tr.hash_table, *tr.fat6)
        else:
            g1 = tr.row_ptr
            g = (g1, tr.col_idx, g1[:1], g1[:1], g1[:1])
        with jax.set_mesh(mesh):
            lowered = tr._jit_step.lower(tr, params, opt_state, targets,
                                         jnp.uint32(0), *g, tr.neg_tabs)
            compiled = lowered.compile()
        text = compiled.as_text()
        stats = collective_bytes(text)
        touched = min(args.walkers * (args.walk_length + 1) + 256,
                      args.nodes)
        stats["vocab_rows"] = args.nodes
        stats["touched_rows_bound"] = touched
        results[mode] = stats
        print(mode, json.dumps(stats), flush=True)

    ratio = (results["dense"]["total"]
             / max(results["sparse"]["total"], 1))
    summary = {
        "metric": "sharded_trainer_collective_bytes_per_step",
        "mesh": f"dp{args.dp}xmp{args.mp}",
        "nodes": args.nodes, "dim": args.dim,
        "walkers": args.walkers, "walk_length": args.walk_length,
        "dense_bytes": results["dense"]["total"],
        "sparse_bytes": results["sparse"]["total"],
        "dense_over_sparse": round(ratio, 2),
        "per_mode": results,
    }
    print(json.dumps(summary))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
