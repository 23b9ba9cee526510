"""Stage ablation for the fused blockwise SGNS train step (BENCHLOG.md).

Times, at the bench train shape (2M-node graph, B=64K, L=16, D=128, bf16):
  walks   — uniform sampling only
  fwd     — walk_loss_fn forward
  grad    — value_and_grad (adds the backward scatter/gather)
  adam    — optimizer update on precomputed dense grads
  step    — the shipped fused walk_train_step (+walks)

Run: python benchmarks/perf_train.py [--nodes N] [--walkers B] [--dim D]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=65_536)
    ap.add_argument("--walk-length", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--window", type=int, default=5)
    ap.add_argument("--shared-negatives", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--modes", default="dense,sparse",
                    help="which optimizer modes --compare-sparse times "
                    "(pass 'sparse' alone at vocabularies where the dense "
                    "step's full gradient tables exceed HBM)")
    ap.add_argument("--compare-sparse", action="store_true",
                    help="time the dense vs touched-rows (lazy) Adam fused "
                    "steps head-to-head at this shape (VERDICT r2 item 2: "
                    "find the vocab-size crossover) and skip the stage "
                    "ablation")
    args = ap.parse_args()

    import jax

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
    from torch_random_walk_tpu.models.node2vec import Node2Vec, Node2VecConfig
    from torch_random_walk_tpu.models.skipgram import (
        SkipGramModel,
        shared_negative_ids,
    )
    from torch_random_walk_tpu.utils.profiling import StepTimer

    graph = synthetic_power_law(args.nodes, args.degree, 0)
    targets = jnp.arange(args.walkers, dtype=jnp.int32) % graph.num_nodes

    if args.compare_sparse:
        # Chained, DONATING timing (bench.py's time_train_chained shape):
        # fp32 Adam moments at huge vocabularies only fit HBM if the old
        # copies are donated away each call.
        import time as _time

        from torch_random_walk_tpu.utils.profiling import sync

        def chained(step, params, opt_state, warmup=1, iters=3):
            for _ in range(warmup):
                params, opt_state, loss = step(params, opt_state, targets)
                sync(loss)
            t0 = _time.perf_counter()
            for _ in range(iters):
                params, opt_state, loss = step(params, opt_state, targets)
            sync(loss)
            del params, opt_state
            return (_time.perf_counter() - t0) / iters

        out = {}
        for mode in args.modes.split(","):
            cfg = Node2VecConfig(dim=args.dim, walk_length=args.walk_length,
                                 window_size=args.window, p=1.0, q=1.0,
                                 dtype=args.dtype,
                                 shared_negatives=args.shared_negatives,
                                 update_mode=mode)
            n2v = Node2Vec(graph, cfg)
            params, opt_state = n2v.init()

            def step(p, o, t):
                return n2v.epoch_step(p, o, t, jnp.uint32(1), donate=True)

            dt = chained(step, params, opt_state,
                         iters=max(2, args.iters // 2))
            out[f"{mode}_ms"] = round(dt * 1e3, 1)
            out[f"{mode}_steps_per_sec_M"] = round(
                args.walkers * args.walk_length / dt / 1e6, 2)
            del params, opt_state, n2v
        if "dense_ms" in out and "sparse_ms" in out:
            out["sparse_over_dense"] = round(
                out["sparse_ms"] / out["dense_ms"], 2)
        out.update(nodes=args.nodes, walkers=args.walkers, dim=args.dim,
                   dtype=args.dtype, S=args.shared_negatives)
        print(json.dumps(out))
        return

    cfg = Node2VecConfig(dim=args.dim, walk_length=args.walk_length,
                         window_size=args.window, p=1.0, q=1.0,
                         dtype=args.dtype,
                         shared_negatives=args.shared_negatives)
    n2v = Node2Vec(graph, cfg)
    params, opt_state = n2v.init()
    seed = jnp.uint32(1)
    timer = StepTimer()
    results = {}

    from torch_random_walk_tpu.ops.walk import walk

    def walks_fn(t):
        return walk(graph, target_nodes=t, walk_length=args.walk_length,
                    seed=7)

    walks = walks_fn(targets)
    neg_ids = shared_negative_ids(seed, args.shared_negatives,
                                  graph.num_nodes)
    hw = args.window // 2

    @jax.jit
    def fwd(p, w, n):
        return SkipGramModel.walk_loss_fn(p, w, n, args.window,
                                          args.window - 1)

    @jax.jit
    def grad(p, w, n):
        return jax.value_and_grad(SkipGramModel.walk_loss_fn)(
            p, w, n, args.window, args.window - 1)

    _, grads = jax.block_until_ready(grad(params, walks, neg_ids))

    @jax.jit
    def adam(p, o, g):
        updates, o = n2v.model.optimizer.update(g, o, p)
        import optax

        return optax.apply_updates(p, updates), o

    def step_fn(p, o, t):
        return n2v.epoch_step(p, o, t, jnp.uint32(1))

    results["walks_ms"] = timer.time(walks_fn, targets,
                                     iters=args.iters) * 1e3
    results["fwd_ms"] = timer.time(fwd, params, walks, neg_ids,
                                   iters=args.iters) * 1e3
    results["grad_ms"] = timer.time(grad, params, walks, neg_ids,
                                    iters=args.iters) * 1e3
    results["adam_ms"] = timer.time(adam, params, opt_state, grads,
                                    iters=args.iters) * 1e3
    results["step_ms"] = timer.time(step_fn, params, opt_state, targets,
                                    iters=args.iters) * 1e3
    results = {k: round(v, 2) for k, v in results.items()}
    results["steps_per_sec_M"] = round(
        args.walkers * args.walk_length / results["step_ms"] / 1e3, 2)
    results.update(nodes=args.nodes, walkers=args.walkers,
                   dim=args.dim, dtype=args.dtype,
                   S=args.shared_negatives)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
