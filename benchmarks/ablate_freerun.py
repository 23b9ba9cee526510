"""Surgical cost anatomy of the freerun node2vec engine (timing only).

Monkey-patches pieces of ops/fatwalk._node2vec_freerun out (outputs are
WRONG for the ablated variants — this is a profiler, not a sampler):

    full        the production engine
    noemit      walk emission (the per-round (B, L+2) select) skipped
    nopass      exact passes skipped (frozen lanes stall forever; the
                scan phase is timed with drain disabled via max_rounds)
    scanonly    drain phases skipped (walks truncated for stragglers)

Run: python benchmarks/ablate_freerun.py [--dataset products]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=131_072)
    ap.add_argument("--walk-length", type=int, default=80)
    ap.add_argument("--p", type=float, default=0.5)
    ap.add_argument("--q", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "products"])
    ap.add_argument("--variants", default="full,noemit,scanonly",
                    help="also: rpbN (rounds_per_block override, e.g. "
                    "rpb3), capX (exact-pass slack multiplier via "
                    "fatwalk monkeypatch is not supported; use rpbN)")
    args = ap.parse_args()

    import jax

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import (
        products_shape_graph,
        synthetic_power_law,
    )
    from torch_random_walk_tpu.ops import fatwalk
    from torch_random_walk_tpu.ops.fatwalk import FatMeta
    from torch_random_walk_tpu.ops.walk import edge_set_for, fat6_for
    from torch_random_walk_tpu.utils.profiling import StepTimer

    if args.dataset == "products":
        graph = products_shape_graph("dataset")
    else:
        graph = synthetic_power_law(args.nodes, args.degree, 0,
                                    cache_root="dataset")
    es = edge_set_for(graph)
    ft = fat6_for(graph)
    meta = FatMeta.of(graph)
    targets = jnp.arange(args.walkers, dtype=jnp.int32) % graph.num_nodes
    steps = args.walkers * args.walk_length
    timer = StepTimer()
    src = fatwalk._node2vec_freerun

    def run(**over):
        def f(e6, n6, table, tt):
            return src(e6, n6, table, tt, meta, es.log_size, es.salt,
                       args.p, args.q, args.walk_length, seed=7, **over)

        return timer.time(jax.jit(f), ft[0], ft[1], es.table, targets,
                          iters=args.iters)

    out = {}
    for name in args.variants.split(","):
        if name == "full":
            dt = run()
        elif name == "noemit":
            real_where = jnp.where

            def skip_walks(cond, x=None, y=None, **kw):
                # Drop only the (B, L+2) emission select (identified by
                # the 2-D mask against the column iota).
                if (hasattr(cond, "ndim") and cond.ndim == 2
                        and y is not None and hasattr(y, "ndim")
                        and y.ndim == 2
                        and y.shape[-1] == args.walk_length + 2):
                    return y
                return real_where(cond, x, y, **kw)

            with mock.patch.object(fatwalk.jnp, "where", skip_walks):
                dt = run()
        elif name == "scanonly":
            # Neuter both drain while_loops: cond never true.
            real_while = fatwalk.lax.while_loop

            def no_drain(cond, body, init):
                return init

            with mock.patch.object(fatwalk.lax, "while_loop", no_drain):
                dt = run()
        elif name.startswith("rpb"):
            dt = run(rounds_per_block=int(name[3:]))
        elif name.startswith("cfg"):
            r, u = name[3:].split("_")
            dt = run(rounds_per_block=int(r), round_unroll=int(u))
        elif name.startswith("slack"):
            dt = run(slack=float(name[5:]) / 100.0)
        else:
            raise ValueError(name)
        out[name] = dict(sec=round(dt, 4),
                         msteps=round(steps / dt / 1e6, 2))
        print(name, json.dumps(out[name]), flush=True)
    print(json.dumps({"config": vars(args), "results": out}))


if __name__ == "__main__":
    main()
