"""Benchmark harness: sampled node-steps/sec/chip (BASELINE.md north-star metric).

Measures uniform and node2vec(p=0.5, q=2.0) walk sampling throughput plus the
fused walk->windows->SGNS training step, on either a synthetic power-law
graph or the ogbn-products workload shape (BASELINE.json config 4).  Prints
ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no benchmark numbers (BASELINE.md: "published": {}),
so vs_baseline is reported against this framework's own recorded first-round
value when present (BENCH_BASELINE.json), else 1.0.

Datasets:
  --dataset synthetic       auto-sized power-law graph (default)
  --dataset ogbn-products   real edges from the OGB cache when present
                            (graph/datasets.load_ogbn), else a synthetic
                            graph with ogbn-products' shape: 2.45M nodes,
                            ~124M directed edges, avg degree ~50, hub skew.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

OGBN_PRODUCTS_NODES = 2_449_029
OGBN_PRODUCTS_AVG_DEGREE = 50


def build_graph(args, on_tpu: bool):
    from torch_random_walk_tpu.graph.datasets import (
        load_ogbn,
        synthetic_power_law,
    )

    if args.dataset == "ogbn-products":
        try:
            graph, _ = load_ogbn("ogbn-products", root=args.data_root)
            return graph, "ogbn-products"
        except ImportError:
            graph = synthetic_power_law(OGBN_PRODUCTS_NODES,
                                        OGBN_PRODUCTS_AVG_DEGREE, 0)
            return graph, "ogbn-products-shape-synthetic"
    num_nodes = args.nodes or (2_000_000 if on_tpu else 50_000)
    return synthetic_power_law(num_nodes, args.degree, 0), "synthetic"


def time_fn(fn, *args, warmup=2, iters=5):
    """Measurement per utils/profiling.py's rules: only a device-side scalar
    checksum ever leaves the chip (remote-tunnel backends swallow async
    faults under block_until_ready and charge readback bandwidth to the
    kernel otherwise)."""
    from torch_random_walk_tpu.utils.profiling import StepTimer

    return StepTimer().time(fn, *args, warmup=warmup, iters=iters)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, default="synthetic",
                        choices=["synthetic", "ogbn-products"])
    parser.add_argument("--data-root", type=str, default="dataset")
    parser.add_argument("--nodes", type=int, default=0, help="0 = auto-size")
    parser.add_argument("--degree", type=int, default=16)
    parser.add_argument("--walkers", type=int, default=0, help="0 = auto-size")
    parser.add_argument("--walk-length", type=int, default=80)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--train-dim", type=int, default=128)
    parser.add_argument("--profile-dir", type=str, default="")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from torch_random_walk_tpu.ops.walk import walk

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    graph, dataset_name = build_graph(args, on_tpu)
    num_nodes = graph.num_nodes
    num_walkers = args.walkers or (131_072 if on_tpu else 8_192)
    walk_length = args.walk_length

    targets = jnp.arange(num_walkers, dtype=graph.col_idx.dtype) % num_nodes

    def uniform_fn(t):
        return walk(graph, target_nodes=t, p=1.0, q=1.0,
                    walk_length=walk_length, seed=7)

    def biased_fn(t):
        return walk(graph, target_nodes=t, p=0.5, q=2.0,
                    walk_length=walk_length, seed=7)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)

    dt_uniform = time_fn(uniform_fn, targets, iters=args.iters)
    dt_biased = time_fn(biased_fn, targets, iters=args.iters)

    if args.profile_dir:
        jax.profiler.stop_trace()

    steps = num_walkers * walk_length
    uniform_sps = steps / dt_uniform
    biased_sps = steps / dt_biased

    # Fused training step (walks -> windows -> SGNS loss) on the SAME graph.
    # bf16 embedding tables keep multi-million-node tables + Adam state
    # within single-chip HBM (the sharded trainer, parallel/trainer.py,
    # removes even that limit on real pods).
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig

    train_dtype = "bfloat16" if num_nodes > 500_000 else "float32"
    n2v = Node2Vec(graph, Node2VecConfig(dim=args.train_dim, walk_length=16,
                                         window_size=5, p=1.0, q=1.0,
                                         dtype=train_dtype))
    params, opt_state = n2v.init()

    def train_fn(p, o, t):
        return n2v.epoch_step(p, o, t, jnp.uint32(1))

    train_targets = targets[: min(num_walkers, 65_536 if on_tpu else 4_096)]
    dt_train = time_fn(train_fn, params, opt_state, train_targets,
                       iters=max(2, args.iters // 2))
    train_sps = train_targets.shape[0] * 16 / dt_train

    value = biased_sps  # headline: the harder (node2vec) sampling path
    baseline_path = os.path.join(os.path.dirname(__file__) or ".",
                                 "BENCH_BASELINE.json")
    vs_baseline = 1.0
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            prev = json.load(f).get("value", 0)
        if prev:
            vs_baseline = value / prev

    print(json.dumps({
        "metric": "node2vec_node_steps_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "node-steps/s/chip",
        "vs_baseline": round(vs_baseline, 3),
        "uniform_node_steps_per_sec": round(uniform_sps, 1),
        "fused_train_node_steps_per_sec": round(train_sps, 1),
        "train_dtype": train_dtype,
        "platform": platform,
        "dataset": dataset_name,
        "num_nodes": num_nodes,
        "num_edges": graph.num_edges,
        "num_walkers": num_walkers,
        "walk_length": walk_length,
    }))


if __name__ == "__main__":
    main()
