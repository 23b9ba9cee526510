"""Biased edge-list freerun engine sweep: rounds_per_block x walks_per_lane.

VERDICT r4 #3: the late-r4 freerun port reached 7.3M steps/s against a
~13M 3-gather roof (56%); the residual is the same straggler idle the CSR
engine attacks with virtual lanes.  This harness sweeps the two knobs on
the family-bench shape (500K nodes / 9M edges, B=64K, L=40 — the
bench.py --families all configuration) or any synthetic size.

    python benchmarks/perf_edge_list.py --rpb-sweep 3,6,9 --vsweep 1,2,4
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=65_536)
    ap.add_argument("--walk-length", type=int, default=40)
    ap.add_argument("--p", type=float, default=0.5)
    ap.add_argument("--q", type=float, default=2.0)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--rpb-sweep", type=str, default="3")
    ap.add_argument("--vsweep", type=str, default="1")
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    from torch_random_walk_tpu.utils.profiling import (
        StepTimer,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    import jax
    import numpy as np
    import jax.numpy as jnp

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
    from torch_random_walk_tpu.graph.edge_list import EdgeListGraph
    from torch_random_walk_tpu.ops import fatwalk
    from torch_random_walk_tpu.ops.fatwalk import FatMeta
    from torch_random_walk_tpu.ops.walk import _edge_set_for_edge_list

    # Same derived edge-list graph bench.py --families all uses: the CSR's
    # edges through the range-table engine.
    csr = synthetic_power_law(args.nodes, args.degree, 0,
                              cache_root="dataset")
    rp = np.asarray(csr.row_ptr)
    ci = np.asarray(csr.col_idx)
    heads = np.repeat(np.arange(csr.num_nodes, dtype=ci.dtype), np.diff(rp))
    g = EdgeListGraph.from_arrays(np.stack([heads, ci], axis=1),
                                  num_nodes=csr.num_nodes)
    es = _edge_set_for_edge_list(g)
    meta = FatMeta.of(g)
    pad = int(csr.num_nodes)
    targets = jnp.arange(args.walkers, dtype=jnp.int32) % csr.num_nodes
    steps = args.walkers * args.walk_length

    out = {}
    for rpb, v in itertools.product(
            (int(x) for x in args.rpb_sweep.split(",")),
            (int(x) for x in args.vsweep.split(","))):
        def run(e, n, tab, t, _rpb=rpb, _v=v):
            return fatwalk.node2vec_walk_edge_list_freerun(
                e, n, tab, t, meta, es.log_size, es.salt, args.p, args.q,
                args.walk_length, 7, pad, True, rounds_per_block=_rpb,
                walks_per_lane=_v)

        dt = StepTimer().time(jax.jit(run), g.edge_tab, g.node_tab,
                              es.table, targets, warmup=1, iters=args.iters)
        tag = f"rpb{rpb}_v{v}"
        out[tag] = dict(sec_per_call=round(dt, 4),
                        msteps_per_sec=round(steps / dt / 1e6, 2))
        print(tag, json.dumps(out[tag]), flush=True)
    print(json.dumps({"config": vars(args), "results": out}))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"config": vars(args), "results": out}, f, indent=1)


if __name__ == "__main__":
    main()
