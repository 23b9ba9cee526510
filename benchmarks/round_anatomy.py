"""Per-component cost anatomy of ONE freerun mixture round (timing only).

Times a ladder of synthetic K-round scans at production shape, each adding
one ingredient of ops/fatwalk._node2vec_freerun's inner round, so the gap
between the measured engine and the pure-gather roof (BENCHLOG r3 roofline:
55% bench / 47% products) can be attributed line-by-line:

    gather        serialized fat-row gather only (the roof itself)
    prng          + threefry2x32 per round (the ~15% suspect)
    index         + mixture index math (mulhi32 envelope position, div/mod)
    classify      + Bloom membership + acceptance classification
    advance       + full lane-state advance (row selects, step/rnd update)
    emit          + walk emission select  (== the whole round, no pass)

Each variant carries a data dependence through the scan so rounds cannot be
collapsed; all results reduce to a scalar on device before timing ends
(axon-tunnel rule).  Run on TPU:  python benchmarks/round_anatomy.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_000_000)
    ap.add_argument("--degree", type=int, default=16)
    ap.add_argument("--walkers", type=int, default=131_072)
    ap.add_argument("--rounds", type=int, default=64)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dataset", default="synthetic",
                    choices=["synthetic", "products"])
    ap.add_argument("--mode", default="round", choices=["round", "pass"])
    ap.add_argument("--cap", type=int, default=43264,
                    help="exact-pass capacity for --mode pass")
    args = ap.parse_args()

    from torch_random_walk_tpu.utils.profiling import honor_jax_platforms_env

    honor_jax_platforms_env()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from torch_random_walk_tpu.graph.bloom import bloom_maybe
    from torch_random_walk_tpu.graph.datasets import (
        products_shape_graph,
        synthetic_power_law,
    )
    from torch_random_walk_tpu.ops import common, fatwalk
    from torch_random_walk_tpu.ops.fatwalk import FatMeta, _mixture_consts
    from torch_random_walk_tpu.ops.walk import fat6_for
    from torch_random_walk_tpu.utils import prng

    if args.dataset == "products":
        graph = products_shape_graph("dataset")
    else:
        graph = synthetic_power_law(args.nodes, args.degree, 0,
                                    cache_root="dataset")
    e6, n6 = fat6_for(graph)
    meta = FatMeta.of(graph)
    B, K = args.walkers, args.rounds
    p, q = 0.5, 2.0
    mi, ei, wt_i, w1_i, w2_i = _mixture_consts(p, q, meta.layout.deg_bits)
    lo_i, hi_i = min(w1_i, w2_i), max(w1_i, w2_i)
    bw = int(e6.shape[1]) - 3
    mult_col = 2 + bw
    unpack3 = meta.layout.unpack
    key = prng.derive_key(7, prng.STREAM_CSR_BIASED)
    wid = common.walker_ids(B)
    num_edges = int(e6.shape[0])
    m = jnp.uint32(prng.MAX_ROUNDS_PER_STEP)
    L = 80
    cols = jnp.arange(L + 2, dtype=jnp.int32)

    t0 = jnp.arange(B, dtype=jnp.int32) % graph.num_nodes
    row0 = n6[t0]

    def mk(level):
        """Build a K-round scan at the given ladder level.  The tables
        arrive as ARGUMENTS of the jitted fn (closed-over jnp arrays are
        baked into the HLO and shipped per compile — fatal over the
        tunnel)."""

        def body_with(tab, carry, r):
            t_row, v_row, step, rnd, walks = carry
            c1 = (step + 1).astype(jnp.uint32) * m + rnd
            if level == "gather":
                # Serialize through the previous row so the gather chain
                # cannot be batched; index derived from the row words only.
                e = (v_row[:, 0] ^ v_row[:, 1]).astype(jnp.uint32)
                e = (e % jnp.uint32(num_edges)).astype(jnp.int32)
                rows = tab[e]
                v_row = rows
                return (t_row, v_row, step, rnd + 1, walks), None
            b_cand, _ = prng.counter_bits(key, wid, c1)
            if level == "prng":
                e = ((v_row[:, 0] ^ b_cand) %
                     jnp.uint32(num_edges)).astype(jnp.int32)
                rows = tab[e]
                v_row = rows
                return (t_row, v_row, step, rnd + 1, walks), None
            _, start, deg = unpack3(v_row[:, :2])
            mult = v_row[:, mult_col] & jnp.uint32(0xFFFF)
            dead = deg == 0
            g_spike = jnp.uint32(ei) * mult
            g_total = jnp.uint32(mi) * deg.astype(jnp.uint32) + g_spike
            pos = prng.mulhi32(b_cand, jnp.maximum(g_total, 1))
            spike = (pos < g_spike) & ~dead
            base = pos - g_spike
            off = (base // jnp.uint32(mi)).astype(jnp.int32)
            sub = base % jnp.uint32(mi)
            e = jnp.clip(start + off, 0, num_edges - 1)
            rows = tab[e]
            if level == "index":
                v_row = rows
                return (t_row, v_row, step, rnd + 1, walks), None
            t = unpack3(t_row[:, :2])[0]
            w5 = v_row[:, mult_col]
            spike_w5 = (w5 >> jnp.uint32(16)) | (w5 << jnp.uint32(16))
            spike_row = jnp.concatenate(
                [t_row[:, :mult_col], spike_w5[:, None]], axis=1)
            rows = jnp.where(dead[:, None], v_row,
                             jnp.where(spike[:, None], spike_row, rows))
            cand = unpack3(rows[:, :2])[0]
            is_t = cand == t
            maybe = bloom_maybe(t_row[:, 2:mult_col], cand, words=bw)
            acc_n = jnp.where(is_t, sub < wt_i,
                              jnp.where(maybe, sub < lo_i, sub < w2_i))
            rej_n = jnp.where(is_t, sub >= wt_i,
                              jnp.where(maybe, sub >= hi_i, sub >= w2_i))
            acc = spike | (acc_n & ~spike) | dead
            rej = rej_n & ~spike & ~acc
            if level == "classify":
                v_row = jnp.where(acc[:, None], rows, v_row)
                return (t_row, v_row, step, rnd + 1, walks), None
            new_t_row = jnp.where(acc[:, None], v_row, t_row)
            v_row = jnp.where(acc[:, None], rows, v_row)
            t_row = new_t_row
            s = step + 1
            step = step + acc.astype(step.dtype)
            rnd = jnp.where(acc, 0, rnd + rej.astype(jnp.uint32))
            if level == "advance":
                return (t_row, v_row, step, rnd, walks), None
            mask = acc[:, None] & (cols[None, :] == s[:, None])
            walks = jnp.where(mask, cand[:, None], walks)
            return (t_row, v_row, step, rnd, walks), None

        def run(e6_, n6_, t0_):
            row0_ = n6_[t0_]
            walks = jnp.zeros((B, L + 2), jnp.int32).at[:, 0].set(t0_)
            init = (row0_, row0_, jnp.zeros((B,), jnp.int32),
                    jnp.zeros((B,), jnp.uint32), walks)
            out, _ = lax.scan(lambda c, r: body_with(e6_, c, r), init,
                              jnp.arange(K), unroll=4)
            return (out[1][:, 0].astype(jnp.uint32).sum()
                    + out[4][:, 1].astype(jnp.uint32).sum())

        return jax.jit(run)

    if args.mode == "pass":
        # Anatomy of ONE exact pass (the per-block frozen-lane service,
        # measured in-context at ~3.7 ms on the bench shape): a ladder of
        # K-iteration scans over its component ops at the production
        # exact_cap, each serialized through the state.
        #
        #   compact    _compact(frozen, cap) + index guards
        #   stgather   + compacted gathers of the lane state (B-row arrays)
        #   fatgather  + the candidate fat-row re-gather (cap rows, (E, W))
        #   cuckoo     + the 2 hash-table membership gathers
        #   scatters   + the 6 sorted scatters back into the (B, .) state
        cap = args.cap
        from torch_random_walk_tpu.ops.walk import edge_set_for

        es = edge_set_for(graph)
        htab, hls, hsalt = es.table, es.log_size, es.salt
        kw = dict(indices_are_sorted=True, unique_indices=True)

        def mkp(level):
            def body(tab, ht, carry, r):
                t_row, v_row, step, rnd, frozen, walks = carry
                size = step.shape[0]
                idx = fatwalk._compact(frozen, cap)
                safe = jnp.minimum(idx, size - 1)
                act = idx < size
                chk = act.sum().astype(jnp.uint32)
                if level == "compact":
                    return (t_row, v_row, step, rnd + chk, frozen,
                            walks), None
                tr_s = t_row[safe]
                vr_s = v_row[safe]
                s_s = step[safe] + 1
                r_s = rnd[safe]
                wid_s = wid[safe]
                chk = chk + (tr_s[:, 0] & jnp.uint32(1)).sum()
                if level == "stgather":
                    return (t_row, v_row, step, rnd + chk, frozen,
                            walks), None
                c1 = s_s.astype(jnp.uint32) * m + r_s
                b_cand, _ = prng.counter_bits(key, wid_s, c1)
                _, start, deg = unpack3(vr_s[:, :2])
                off = prng.randint_from_bits(b_cand, jnp.maximum(deg, 1))
                e = jnp.clip(start + off, 0, num_edges - 1)
                rows = tab[e]
                cand = unpack3(rows[:, :2])[0]
                chk = chk + (cand.astype(jnp.uint32) & jnp.uint32(1)).sum()
                if level == "fatgather":
                    return (t_row, v_row, step, rnd + chk, frozen,
                            walks), None
                t = unpack3(tr_s[:, :2])[0]
                hit = fatwalk._edge_set_contains(ht, hls, hsalt, cand, t)
                acc = act & hit
                chk = chk + hit.sum().astype(jnp.uint32)
                if level == "cuckoo":
                    return (t_row, v_row, step, rnd + chk, frozen,
                            walks), None
                oob = size
                i_act = jnp.where(act, idx, oob)
                t_row = t_row.at[i_act].set(
                    jnp.where(acc[:, None], vr_s, tr_s), **kw)
                v_row = v_row.at[i_act].set(
                    jnp.where(acc[:, None], rows, vr_s), **kw)
                g_rows = jnp.where(act, idx, B)
                walks = walks.at[g_rows,
                                 jnp.where(acc, s_s, L + 1)].set(cand, **kw)
                step = step.at[i_act].add(acc.astype(step.dtype), **kw)
                rnd = rnd.at[i_act].set(
                    jnp.where(acc, 0, r_s + 1), **kw) + chk
                frozen = frozen.at[i_act].set(False, **kw)
                frozen = frozen | ((step & 3) == (r % 3))  # keep pool alive
                return (t_row, v_row, step, rnd, frozen, walks), None

            def run(e6_, ht, t0_):
                row0_ = n6[t0_]
                walks = jnp.zeros((B, L + 2), jnp.int32)
                fr = (jnp.arange(B) % 3) == 0
                init = (row0_, row0_, jnp.zeros((B,), jnp.int32),
                        jnp.zeros((B,), jnp.uint32), fr, walks)
                out, _ = lax.scan(lambda c, r: body(e6_, ht, c, r), init,
                                  jnp.arange(K), unroll=1)
                return (out[3].astype(jnp.uint32).sum()
                        + out[0][:, 0].astype(jnp.uint32).sum())

            return jax.jit(run)

        results = {}
        for level in ("compact", "stgather", "fatgather", "cuckoo",
                      "scatters"):
            fn = mkp(level)
            float(fn(e6, htab, t0))
            best = 1e9
            for _ in range(args.iters):
                s = time.perf_counter()
                float(fn(e6, htab, t0))
                best = min(best, time.perf_counter() - s)
            results[level] = round(best / K * 1e3, 4)
            print(f"{level:9s} {results[level]:8.4f} ms/pass", flush=True)
        print(json.dumps({"config": vars(args), "ms_per_pass": results}))
        return

    results = {}
    for level in ("gather", "prng", "index", "classify", "advance", "emit"):
        fn = mk(level)
        float(fn(e6, n6, t0))  # compile + warm
        best = 1e9
        for _ in range(args.iters):
            s = time.perf_counter()
            float(fn(e6, n6, t0))
            best = min(best, time.perf_counter() - s)
        ms_round = best / K * 1e3
        results[level] = round(ms_round, 4)
        print(f"{level:9s} {ms_round:8.4f} ms/round "
              f"({B / (best / K) / 1e6:.1f}M rows/s)", flush=True)

    print(json.dumps({"config": vars(args), "ms_per_round": results}))


if __name__ == "__main__":
    main()
