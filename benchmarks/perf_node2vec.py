"""node2vec walk-engine perf harness: ablations + trace-based cost anatomy.

Drives the round-2 optimization of the biased rejection path
(VERDICT r1 item 1: 3.87M -> >= 10M node-steps/s/chip).  Run on the real
TPU:

    python benchmarks/perf_node2vec.py --variant all
    python benchmarks/perf_node2vec.py --trace /tmp/n2vtrace

Variants (legacy-engine ablations disable stages; outputs then WRONG —
timing only):

    uniform    one row gather/step (the engine's hardware ceiling)
    bloom      free-running Bloom engine over wide fat rows (production)
    full       legacy hierarchical engine (no fat6 supplied)
    bulkonly   legacy: 2 full-batch no-hash rounds, nothing else
    nolevels   legacy: bulk rounds + tail (levels disabled)
    notail     legacy: bulk rounds + levels (tail disabled)
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(args):
    import jax.numpy as jnp
    from torch_random_walk_tpu.graph.datasets import (
        products_shape_graph,
        synthetic_power_law,
    )
    from torch_random_walk_tpu.ops.walk import edge_set_for

    if args.dataset == "products":
        graph = products_shape_graph("dataset")
        from torch_random_walk_tpu.ops.walk import warm_biased_tables

        # Disk-cached fat6 + cuckoo (the host build is ~3 min at 127M E).
        warm_biased_tables(graph, os.path.join("dataset",
                                               "products_shape_fat_v1"))
    else:
        graph = synthetic_power_law(args.nodes, args.degree, 0,
                                    cache_root="dataset")
    es = edge_set_for(graph)
    targets = jnp.arange(args.walkers, dtype=jnp.int32) % graph.num_nodes
    return graph, es, targets


def timed(fn, *a, iters=4, warmup=1):
    from torch_random_walk_tpu.utils.profiling import StepTimer

    return StepTimer().time(fn, *a, warmup=warmup, iters=iters)


def run_variant(name, graph, es, targets, args):
    import jax
    from unittest import mock

    from torch_random_walk_tpu.ops import fatwalk
    from torch_random_walk_tpu.ops.fatwalk import FatMeta

    meta = FatMeta.of(graph)
    p, q, L = args.p, args.q, args.walk_length
    kw = dict(meta=meta, hash_log_size=es.log_size, hash_salt=es.salt,
              p=p, q=q, walk_length=L, seed=7)

    def n2v(t, **over):
        merged = {**kw, **over}

        # Arrays must be jit ARGUMENTS: closed-over tables are baked into
        # the HLO (the 2GB cuckoo table blows the remote-compile limit).
        def run(edge_tab, node_tab, table, tt):
            return fatwalk.node2vec_walk_fat(edge_tab, node_tab, table, tt,
                                             **merged)

        return timed(jax.jit(run), graph.edge_tab, graph.node_tab, es.table,
                     t, iters=args.iters)

    if name == "bloom":
        from torch_random_walk_tpu.ops.walk import fat6_for

        ft = fat6_for(graph)
        # rpb 0 = engine's adaptive cadence (freeze-rate heuristic);
        # vlanes 0 = the engine's auto V choice, else explicit.
        fr_kw = dict(rounds_per_block=args.rpb or None,
                     round_unroll=args.runroll or None, slack=args.slack,
                     walks_per_lane=args.vlanes or None)

        def run_b(e6, n6, table, tt):
            return fatwalk._node2vec_freerun(
                e6, n6, table, tt, meta, es.log_size, es.salt, p, q, L,
                seed=7, **fr_kw)

        return timed(jax.jit(run_b), ft[0], ft[1], es.table, targets,
                     iters=args.iters)
    if name == "uniform":
        def run_u(edge_tab, node_tab, t):
            return fatwalk.uniform_walk_fat(edge_tab, node_tab, t, meta, L, 7)

        return timed(jax.jit(run_u), graph.edge_tab, graph.node_tab, targets,
                     iters=args.iters)
    if name == "full":
        return n2v(targets)
    if name == "bulkonly":
        with mock.patch.object(fatwalk, "_hier_schedule",
                               lambda *a, **k: []):
            return n2v(targets, max_rounds=0)
    if name == "nolevels":
        with mock.patch.object(fatwalk, "_hier_schedule",
                               lambda *a, **k: []):
            return n2v(targets)
    if name == "notail":
        return n2v(targets, max_rounds=0)
    raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=131_072)
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("--p", type=float, default=0.5)
    ap.add_argument("--q", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--dataset", type=str, default="synthetic",
                    choices=["synthetic", "products"],
                    help="products = cached products-shape CSR "
                    "(graph/datasets.products_shape_graph)")
    ap.add_argument("--rpb", type=int, default=0,
                    help="freerun rounds_per_block; 0 = adaptive "
                    "(bloom variant)")
    ap.add_argument("--runroll", type=int, default=0,
                    help="freerun round_unroll; 0 = rpb (bloom variant)")
    ap.add_argument("--sweep", type=str, default="",
                    help="comma list of rounds_per_block values: time the "
                    "bloom variant once per value (tables stay on device)")
    ap.add_argument("--vlanes", type=int, default=0,
                    help="freerun walks_per_lane; 0 = engine auto "
                    "(bloom variant)")
    ap.add_argument("--vsweep", type=str, default="",
                    help="comma list of walks_per_lane values: time the "
                    "bloom variant once per value (composable with --rpb)")
    ap.add_argument("--slack", type=float, default=1.05,
                    help="freerun scan-length slack (bloom variant)")
    ap.add_argument("--variant", type=str, default="all")
    ap.add_argument("--trace", type=str, default="")
    args = ap.parse_args()

    import jax

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    graph, es, targets = build(args)
    steps = args.walkers * args.walk_length
    names = (["uniform", "bloom", "full", "bulkonly", "nolevels", "notail"]
             if args.variant == "all" else args.variant.split(","))

    if args.trace:
        jax.profiler.start_trace(args.trace)
    out = {}
    if args.vsweep:
        for v in (int(x) for x in args.vsweep.split(",")):
            args.vlanes = v
            dt = run_variant("bloom", graph, es, targets, args)
            tag = f"bloom_v{v}" + (f"_rpb{args.rpb}" if args.rpb else "")
            out[tag] = dict(sec_per_call=round(dt, 4),
                            msteps_per_sec=round(steps / dt / 1e6, 2))
            print(tag, json.dumps(out[tag]), flush=True)
        names = []
    elif args.sweep:
        for rpb in (int(x) for x in args.sweep.split(",")):
            args.rpb, args.runroll = rpb, rpb
            dt = run_variant("bloom", graph, es, targets, args)
            out[f"bloom_rpb{rpb}"] = dict(
                sec_per_call=round(dt, 4),
                msteps_per_sec=round(steps / dt / 1e6, 2))
            print(f"bloom rpb={rpb}", json.dumps(out[f"bloom_rpb{rpb}"]),
                  flush=True)
        names = []
    for name in names:
        dt = run_variant(name, graph, es, targets, args)
        out[name] = dict(sec_per_call=round(dt, 4),
                         msteps_per_sec=round(steps / dt / 1e6, 2))
        print(name, json.dumps(out[name]), flush=True)
    if args.trace:
        jax.profiler.stop_trace()
    print(json.dumps({"config": vars(args), "results": out}))


if __name__ == "__main__":
    main()
