"""Triples-walk roofline: is 68.5M steps/s/chip the (T, 4)-row gather roof?

VERDICT r4 weak #6: the triples engine's gap vs uniform CSR (68.5M vs
~129M on the same family-bench shape) was attributed to the wider (T, 4)
rows but never measured.  This harness times, on the SAME derived triples
table the family bench uses:

  raw      a serialized (T, 4)-row gather chain with trivial index
           arithmetic — the hardware ceiling for any one-gather-per-step
           walker over this table;
  engine   fatwalk.uniform_walk_triples_fat (the production engine).

``engine/raw`` is the roofline ratio the BENCHLOG table quotes.

    python benchmarks/roofline_triples.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=65_536)
    ap.add_argument("--walk-length", type=int, default=40)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--unroll", type=int, default=8)
    args = ap.parse_args()

    from torch_random_walk_tpu.utils.profiling import (
        StepTimer,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()

    import jax
    import numpy as np
    import jax.numpy as jnp
    from jax import lax

    from torch_random_walk_tpu.graph.datasets import synthetic_power_law
    from torch_random_walk_tpu.graph.triples import TriplesGraph
    from torch_random_walk_tpu.ops import fatwalk

    # The family bench's derived triples graph: CSR edges + deterministic
    # pseudo relations (bench.py --families all).
    csr = synthetic_power_law(args.nodes, args.degree, 0,
                              cache_root="dataset")
    rp = np.asarray(csr.row_ptr)
    ci = np.asarray(csr.col_idx)
    heads = np.repeat(np.arange(csr.num_nodes, dtype=ci.dtype), np.diff(rp))
    rels = (heads.astype(np.uint64) * 2654435761 % 16).astype(ci.dtype)
    tg = TriplesGraph.from_arrays(np.stack([heads, rels, ci], axis=1),
                                  num_entities=csr.num_nodes)
    pad = int(csr.num_nodes)
    B, L = args.walkers, args.walk_length
    targets = jnp.arange(B, dtype=jnp.int32) % csr.num_nodes
    steps = B * L
    T = tg.num_triples

    timer = StepTimer()

    # --- raw serialized gather chain over the SAME (T, 4) table ---------
    @partial(jax.jit, static_argnames=("length", "unroll"))
    def raw_chain(table, idx0, length, unroll):
        def step(carry, _):
            idx = carry
            row = table[idx]
            # Serialize on the gathered value; keep index arithmetic at
            # the engine's own cost class (one multiply-high-free mod).
            nxt = (idx + row[:, 1] + row[:, 3] + 1) % jnp.int32(T)
            return nxt, None

        out, _ = lax.scan(step, idx0, None, length=length, unroll=unroll)
        return out

    idx0 = (targets * jnp.int32(2654435761)) % jnp.int32(T)
    dt_raw = timer.time(
        lambda tab, i0: raw_chain(tab, i0, L, args.unroll),
        tg.triple_tab, idx0, warmup=1, iters=args.iters)

    # --- production engine ----------------------------------------------
    @jax.jit
    def engine(tab, meta, t):
        return fatwalk.uniform_walk_triples_fat(
            tab, meta, t, L, pad, 7, tg.num_entities, tg.num_triples)

    dt_eng = timer.time(engine, tg.triple_tab, tg.node_meta, targets,
                        warmup=1, iters=args.iters)

    raw_m = steps / dt_raw / 1e6
    eng_m = steps / dt_eng / 1e6
    print(json.dumps({
        "table_rows": int(T),
        "raw_gather_msteps_per_sec": round(raw_m, 2),
        "engine_msteps_per_sec": round(eng_m, 2),
        "roofline_ratio": round(eng_m / raw_m, 3),
        "walkers": B, "walk_length": L,
    }))


if __name__ == "__main__":
    main()
