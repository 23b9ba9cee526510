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
        products_shape_graph,
        synthetic_power_law,
    )

    if args.dataset == "ogbn-products":
        try:
            graph, _ = load_ogbn("ogbn-products", root=args.data_root)
            return graph, "ogbn-products"
        except ImportError:
            graph = products_shape_graph(args.data_root)
            return graph, "ogbn-products-shape-synthetic"
    num_nodes = args.nodes or (2_000_000 if on_tpu else 50_000)
    # cache_root: the bench-shape host build is ~4-5 min fresh vs ~18 s from
    # the on-disk CSR cache — r4's driver bench lost its whole artifact to a
    # timeout largely made of rebuilds like this one (VERDICT r4 weak #1).
    return (synthetic_power_law(num_nodes, args.degree, 0,
                                cache_root=args.data_root), "synthetic")


def time_fn(fn, *args, warmup=2, iters=5):
    """Measurement per utils/profiling.py's rules: only a device-side scalar
    checksum ever leaves the chip (remote-tunnel backends swallow async
    faults under block_until_ready and charge readback bandwidth to the
    kernel otherwise)."""
    from torch_random_walk_tpu.utils.profiling import StepTimer

    return StepTimer().time(fn, *args, warmup=warmup, iters=iters)


def time_train_chained(step, params, opt_state, targets, warmup=1, iters=3):
    """Time a (params, opt, targets) -> (params, opt, loss) step the way a
    real training loop runs it: outputs rebound to inputs each call, with
    params/opt_state DONATED (``step`` must accept donate=True and route it
    to a donating jit — Node2Vec.epoch_step does).  Donation matters for
    the measurement itself at bench scale — fp32 Adam moments for a
    2M x 128 bf16 table pair are ~4 GB, and a non-donating functional
    update holds old+new copies of every table, which is exactly what
    OOMed the sparse-step timing on the 16 GB v5e (2026-08-19).  Donation
    cannot live on an OUTER jit here: that would close over the graph
    tables and bake them into the HLO as constants (the 2M-node edge_tab
    alone exceeds the axon remote-compile request limit)."""
    import time as _time

    from torch_random_walk_tpu.utils.profiling import sync

    for _ in range(warmup):
        params, opt_state, loss = step(params, opt_state, targets)
        sync(loss)
    t0 = _time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, targets)
    sync(loss)
    return (_time.perf_counter() - t0) / iters


def run_scaling(args):
    """Multi-device scaling mode: the owner-routed partitioned engines
    (parallel/partition_v2.py) timed at 1, 2, 4, ... D devices on the same
    graph, with scaling efficiency and exchange traffic recorded per point.

    On the one attached TPU chip this degenerates to D=1 (still useful: it
    measures the partitioned engine's overhead vs the fat single-chip path).
    The multi-device curve runs on the virtual CPU mesh:

        XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python bench.py --mode scaling --metrics-out scaling.jsonl

    Virtual devices share one host's cores, so the CPU-mesh efficiency
    column is a collective/routing *overhead* sanity curve, not real chip
    scaling; exchange_bytes/step and collectives/step are
    hardware-independent and are the contract the real pod inherits.
    """
    import jax
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
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
    from torch_random_walk_tpu.utils.logging import MetricsWriter

    devices = jax.devices()
    platform = devices[0].platform
    on_tpu = platform == "tpu"
    num_nodes = args.nodes or (500_000 if on_tpu else 20_000)
    graph = synthetic_power_law(num_nodes, args.degree, 0)
    num_walkers = args.walkers or (32_768 if on_tpu else 2_048)
    walk_length = args.walk_length
    steps = num_walkers * walk_length
    metrics = MetricsWriter(args.metrics_out or None)

    counts = [d for d in (1, 2, 4, 8, 16, 32, 64) if d <= len(devices)]
    curve = {}
    for d in counts:
        mesh = make_mesh(devices=devices[:d])
        pg = PartitionedCSR.from_csr(graph, d)
        hashes = build_partition_hashes(pg, graph)
        blooms = build_partition_blooms(pg, graph)
        targets = jnp.arange(num_walkers, dtype=jnp.int32) % num_nodes

        sched = args.schedule
        dt_u = time_fn(
            lambda t: walk_partitioned_routed(pg, t, mesh, walk_length,
                                              seed=7, schedule=sched)[0],
            targets, warmup=1, iters=args.iters)
        _, info_u = walk_partitioned_routed(pg, targets, mesh, walk_length,
                                            seed=7, schedule=sched)
        dt_b = time_fn(
            lambda t: walk_partitioned_node2vec_routed(
                pg, hashes, t, mesh, 0.5, 2.0, walk_length, seed=7,
                blooms=blooms, schedule=sched)[0],
            targets, warmup=1, iters=args.iters)
        _, info_b = walk_partitioned_node2vec_routed(
            pg, hashes, targets, mesh, 0.5, 2.0, walk_length, seed=7,
            blooms=blooms, schedule=sched)

        point = {
            "devices": d,
            "schedule": sched,
            # Virtual CPU devices oversubscribe the host's cores: the
            # wall-clock columns are a routing-overhead sanity check only.
            # The honest pod projection is benchmarks/scaling_model.py.
            "wall_clock_valid": on_tpu,
            "uniform_steps_per_sec": round(steps / dt_u, 1),
            "node2vec_steps_per_sec": round(steps / dt_b, 1),
            "uniform_exchange_bytes_per_step": round(
                info_u["exchange_bytes"] / steps, 2),
            "node2vec_exchange_bytes_per_step": round(
                info_b["exchange_bytes"] / steps, 2),
            "node2vec_collectives_per_step": info_b["collectives_per_step"],
            "overflow_dropped": info_u["overflow_dropped"]
            + info_b["overflow_dropped"],
        }
        if 1 in curve:
            point["uniform_scaling_efficiency"] = round(
                point["uniform_steps_per_sec"]
                / (d * curve[1]["uniform_steps_per_sec"]), 3)
            point["node2vec_scaling_efficiency"] = round(
                point["node2vec_steps_per_sec"]
                / (d * curve[1]["node2vec_steps_per_sec"]), 3)
        curve[d] = point
        metrics.emit(mode="scaling", platform=platform,
                     num_nodes=num_nodes, num_walkers=num_walkers,
                     walk_length=walk_length, **point)

    top = curve[counts[-1]]
    print(json.dumps({
        "metric": "routed_node2vec_node_steps_per_sec",
        "value": top["node2vec_steps_per_sec"],
        "unit": "node-steps/s",
        "vs_baseline": 1.0,
        "platform": platform,
        "num_nodes": num_nodes,
        "num_walkers": num_walkers,
        "walk_length": walk_length,
        "scaling_curve": list(curve.values()),
    }))


def _fall_back_to_cpu_if_backend_hangs(probe_seconds: int = 240) -> None:
    """Probe backend init in a SUBPROCESS; on timeout, force CPU here.

    When the axon TPU tunnel is down, ``jax.devices()`` hangs indefinitely
    inside the plugin (observed 2026-08-18: >4 min with no error), which
    would make an unattended bench run record nothing at all.  Backend
    init is behind a process-wide lock, so an in-process thread+timeout
    cannot recover — probing in a throwaway subprocess (same env, same
    sitecustomize) and flipping ``jax_platforms`` BEFORE this process
    first touches a device is the only reliable fallback.  A degraded
    platform="cpu" JSON line beats a hung round.  No-op when JAX_PLATFORMS
    is already forcing a platform.
    """
    import subprocess
    import sys

    # The tunnel kernel env exports JAX_PLATFORMS=axon (sitecustomize
    # relies on it to prevent a SILENT cpu fallback), so "axon" still
    # means "default TPU init" and must be probed; only a non-axon
    # export (e.g. cpu for the virtual-mesh runs) skips the probe.
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and "axon" not in want:
        return
    # The probe must REPORT the platform it resolved: when the tunnel is
    # down the plugin fails nondeterministically — sometimes a quick
    # connection error (jax then silently falls back to CPU, rc=0),
    # sometimes an indefinite retry loop.  Only an affirmative non-CPU
    # answer lets this process risk the default init.
    probe = subprocess.Popen(
        [sys.executable, "-c",
         "import jax; print(jax.devices()[0].platform, flush=True)"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True)
    try:
        out, _ = probe.communicate(timeout=probe_seconds)
        answer = (out or "").strip().splitlines()[-1:] or [""]
        answer = answer[0]
    except subprocess.TimeoutExpired:
        probe.kill()
        probe.communicate()
        answer = "<hang>"
    if answer in ("cpu", "", "<hang>") or probe.returncode != 0:
        import jax

        print(f"bench: device backend probe answered {answer!r} "
              f"(rc={probe.returncode}); forcing CPU",
              file=sys.stderr, flush=True)
        jax.config.update("jax_platforms", "cpu")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", type=str, default="single",
                        choices=["single", "scaling"],
                        help="single = one-chip fat-engine bench (default); "
                        "scaling = partitioned-engine multi-device curve")
    parser.add_argument("--dataset", type=str, default="synthetic",
                        choices=["synthetic", "ogbn-products"])
    parser.add_argument("--data-root", type=str, default="dataset")
    parser.add_argument("--nodes", type=int, default=0, help="0 = auto-size")
    parser.add_argument("--degree", type=int, default=16)
    parser.add_argument("--walkers", type=int, default=0, help="0 = auto-size")
    parser.add_argument("--walk-length", type=int, default=80)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--train-dim", type=int, default=128)
    parser.add_argument("--families", type=str, default="csr",
                        choices=["csr", "all"],
                        help="all = additionally bench the edge-list and "
                        "triples walk engines on same-scale derived graphs "
                        "(extra build time; the headline metric is "
                        "unchanged)")
    parser.add_argument("--profile-dir", type=str, default="")
    parser.add_argument("--metrics-out", type=str, default="",
                        help="JSONL sink for per-point scaling metrics")
    parser.add_argument("--schedule", type=str, default="serial",
                        choices=["serial", "overlapped"],
                        help="scaling mode: routed-engine phase schedule "
                        "(overlapped = exchange hidden under on-partition "
                        "sampling; bit-identical walks)")
    args = parser.parse_args()

    # ORDER MATTERS: the hang probe runs FIRST and uses only stdlib —
    # importing the package (the helper below pulls it in) can itself
    # initialize the jax backend via module-level jnp constants, which is
    # exactly the hang being guarded against.
    _fall_back_to_cpu_if_backend_hangs()

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    if args.mode == "scaling":
        run_scaling(args)
        return

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

    # Per-shape baselines read up front so every streamed partial line can
    # carry vs_baseline (VERDICT r4 weak #1: the artifact is whatever line
    # the driver captured LAST — each phase's line must stand alone).
    baseline_path = os.path.join(os.path.dirname(__file__) or ".",
                                 "BENCH_BASELINE.json")
    base = {}
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)

    dual_shape = (on_tpu and args.dataset == "synthetic" and args.nodes == 0
                  and args.families == "csr")

    rec = {
        "metric": "node2vec_node_steps_per_sec_per_chip",
        "value": 0.0,
        "unit": "node-steps/s/chip",
        "vs_baseline": 1.0,
    }

    def emit(phase=None):
        """Print the CURRENT record as one complete JSON line.  Every phase
        emits, so a driver that times the run out still captures the most
        recent complete figures (r4's rc=124 recorded nothing); the final
        emit has no ``phase`` key and is the headline line."""
        out = dict(rec)
        if phase is not None:
            out["partial"] = True
            out["phase"] = phase
        out.update(platform=platform, dataset=dataset_name,
                   num_nodes=num_nodes, num_edges=graph.num_edges,
                   num_walkers=num_walkers, walk_length=walk_length)
        print(json.dumps(out), flush=True)

    dt_uniform = time_fn(uniform_fn, targets, iters=args.iters)
    dt_biased = time_fn(biased_fn, targets, iters=args.iters)

    if args.profile_dir:
        jax.profiler.stop_trace()

    steps = num_walkers * walk_length
    uniform_sps = steps / dt_uniform
    biased_sps = steps / dt_biased

    extras = {}
    rec["value"] = round(biased_sps, 1)
    rec["uniform_node_steps_per_sec"] = round(uniform_sps, 1)
    if base.get("value"):
        rec["vs_baseline"] = round(biased_sps / base["value"], 3)
    emit(phase="bench_shape_sampling" if dual_shape else "sampling")

    # North-star shape (VERDICT r3 #3): the default TPU bench additionally
    # measures the ogbn-products shape (2.45M nodes / 127M edges, avg deg
    # ~50 — BASELINE "speed-of-light on ogbn-products-scale graphs") and
    # makes THAT the headline, so every driver-captured BENCH_rNN carries a
    # current products figure.  The easy synthetic shape is still reported
    # (bench_shape_* extras) with its own per-shape vs_baseline.
    if dual_shape:
        from torch_random_walk_tpu.graph.datasets import products_shape_graph
        from torch_random_walk_tpu.ops.walk import clear_graph_caches as _cgc
        from torch_random_walk_tpu.ops.walk import warm_biased_tables

        extras["bench_shape_node2vec_node_steps_per_sec"] = round(
            biased_sps, 1)
        extras["bench_shape_uniform_node_steps_per_sec"] = round(
            uniform_sps, 1)
        extras["bench_shape_nodes"] = num_nodes
        extras["bench_shape_edges"] = graph.num_edges
        if base.get("value"):
            extras["bench_shape_vs_baseline"] = round(
                biased_sps / base["value"], 3)
        rec.update(extras)
        # The products fat tables (~7.4 GB) cannot share HBM with the
        # bench-shape ones: free the easy shape first.
        _cgc(graph)
        del graph, targets
        graph = products_shape_graph(args.data_root)
        dataset_name = "ogbn-products-shape-synthetic"
        num_nodes = graph.num_nodes
        targets = jnp.arange(num_walkers,
                             dtype=graph.col_idx.dtype) % num_nodes
        # Disk-cached cuckoo + fat6 tables: the host build is ~3 min at this
        # scale (fat6 pack 116 s + cuckoo 77 s on 4 cores), the raw-.npy
        # reload ~20 s.  _v1 = table layout version (bloom_words_for widths).
        warm_biased_tables(graph, os.path.join(
            args.data_root, "products_shape_fat_v1"))

        def uniform_fn(t):
            return walk(graph, target_nodes=t, p=1.0, q=1.0,
                        walk_length=walk_length, seed=7)

        def biased_fn(t):
            return walk(graph, target_nodes=t, p=0.5, q=2.0,
                        walk_length=walk_length, seed=7)

        # Fewer iters than the bench shape: products variance at 3 iters is
        # well under the round-over-round deltas being tracked, and the r4
        # 5-iter default was part of what pushed the run past the driver
        # budget (VERDICT r4 next-round #1c).
        p_iters = min(args.iters, 3)
        uniform_sps = steps / time_fn(uniform_fn, targets, warmup=1,
                                      iters=p_iters)
        biased_sps = steps / time_fn(biased_fn, targets, warmup=1,
                                     iters=p_iters)
        rec["value"] = round(biased_sps, 1)
        rec["uniform_node_steps_per_sec"] = round(uniform_sps, 1)
        rec["vs_baseline"] = (round(biased_sps / base["products_value"], 3)
                              if base.get("products_value") else 1.0)
        emit(phase="products_sampling")
    if args.families == "all":
        # Same-scale derived graphs: the edge-list family walks the CSR's
        # edges through the range-table engine (padding/restart
        # semantics), the triples family adds deterministic pseudo
        # relation labels (16 relations).
        import numpy as np

        from torch_random_walk_tpu.graph.edge_list import EdgeListGraph
        from torch_random_walk_tpu.graph.triples import TriplesGraph
        from torch_random_walk_tpu.ops.walk import walk_edge_list, walk_triples

        rp = np.asarray(graph.row_ptr)
        ci = np.asarray(graph.col_idx)
        heads = np.repeat(np.arange(num_nodes, dtype=ci.dtype), np.diff(rp))
        pad = int(num_nodes)
        el = EdgeListGraph.from_arrays(np.stack([heads, ci], axis=1),
                                       num_nodes=num_nodes)

        def el_uniform(t):
            return walk_edge_list(el, target_nodes=t,
                                  walk_length=walk_length, seed=7,
                                  padding_idx=pad, restart=True)

        def el_biased(t):
            return walk_edge_list(el, target_nodes=t, p=0.5, q=2.0,
                                  walk_length=walk_length, seed=7,
                                  padding_idx=pad, restart=True)

        extras["edge_list_uniform_node_steps_per_sec"] = round(
            steps / time_fn(el_uniform, targets, iters=args.iters), 1)
        extras["edge_list_biased_node_steps_per_sec"] = round(
            steps / time_fn(el_biased, targets, iters=args.iters), 1)
        from torch_random_walk_tpu.ops.walk import clear_graph_caches as _cgc

        _cgc(el)  # drop the edge-list cuckoo before the triples phase
        del el

        rels = (heads.astype(np.uint64) * 2654435761 % 16).astype(ci.dtype)
        tg = TriplesGraph.from_arrays(
            np.stack([heads, rels, ci], axis=1), num_entities=num_nodes)

        def tr_fn(t):
            return walk_triples(tg, target_nodes=t,
                                walk_length=walk_length, seed=7,
                                padding_idx=pad)

        extras["triples_node_steps_per_sec"] = round(
            steps / time_fn(tr_fn, targets, iters=args.iters), 1)
        del tg
        rec.update(extras)
        emit(phase="family_sampling")

    # Fused training step (walks -> windows -> SGNS loss) on the SAME graph.
    # bf16 embedding tables keep multi-million-node tables + Adam state
    # within single-chip HBM (the sharded trainer, parallel/trainer.py,
    # removes even that limit on real pods).  The biased-walk phase's
    # cuckoo + fat6 tables (~7.4GB at the products shape) are not needed by
    # the uniform-walk train step — free them first.
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
    from torch_random_walk_tpu.ops.walk import clear_graph_caches

    clear_graph_caches(graph)

    train_dtype = "bfloat16" if num_nodes > 500_000 else "float32"
    n2v = Node2Vec(graph, Node2VecConfig(dim=args.train_dim, walk_length=16,
                                         window_size=5, p=1.0, q=1.0,
                                         dtype=train_dtype))
    params, opt_state = n2v.init()

    def train_fn(p, o, t):
        return n2v.epoch_step(p, o, t, jnp.uint32(1), donate=True)

    train_targets = targets[: min(num_walkers, 65_536 if on_tpu else 4_096)]
    dt_train = time_train_chained(train_fn, params, opt_state, train_targets,
                                  iters=max(2, args.iters // 2))
    train_sps = train_targets.shape[0] * 16 / dt_train
    rec["fused_train_node_steps_per_sec"] = round(train_sps, 1)
    emit(phase="train_dense")

    # Touched-rows (lazy) Adam variant: optimizer/gradient traffic scales
    # with the batch's unique rows instead of the vocabulary.
    del params, opt_state
    n2v_s = Node2Vec(graph, Node2VecConfig(dim=args.train_dim, walk_length=16,
                                           window_size=5, p=1.0, q=1.0,
                                           dtype=train_dtype,
                                           update_mode="sparse"))
    params_s, opt_s = n2v_s.init()

    def train_sparse_fn(p, o, t):
        return n2v_s.epoch_step(p, o, t, jnp.uint32(1), donate=True)

    dt_train_s = time_train_chained(train_sparse_fn, params_s, opt_s,
                                    train_targets,
                                    iters=max(2, args.iters // 2))
    train_sparse_sps = train_targets.shape[0] * 16 / dt_train_s
    del params_s, opt_s

    # Headline (the harder node2vec sampling path; products shape when
    # dual_shape) and per-shape vs_baseline were already folded into ``rec``
    # as each phase completed — the final line is the same record with the
    # train figures and no ``partial`` marker.
    rec["fused_train_sparse_node_steps_per_sec"] = round(train_sparse_sps, 1)
    rec["train_dtype"] = train_dtype
    emit()


if __name__ == "__main__":
    main()
