"""Analytic pod-scaling-efficiency model (VERDICT r3 #6; BASELINE north-star
">= 80% edges/s scaling efficiency from 1 chip -> 1 host -> N hosts").

Real multi-chip hardware is unavailable in this environment (one v5e chip
behind a tunnel), and the 8-virtual-devices-on-4-cores CPU mesh produces
meaningless wall-clock ratios (oversubscription — its JSONL rows carry
``wall_clock_valid: false``).  What IS measurable today, and what this
model combines:

  1. single-chip step time (real v5e, bench.py / BENCHLOG r4),
  2. exchange traffic invariants of the routed partitioned engines
     (virtual-mesh artifacts, D-invariant by construction and asserted so:
     records/step, collectives/step — benchmarks/scaling_r3.jsonl),
  3. published v5e interconnect figures (Google Cloud TPU docs): ICI
     1600 Gbps/chip aggregate (2D torus, intra-pod), DCN ~25 Gbps/host
     egress for multi-slice.

Model (weak scaling, B walkers PER CHIP, the pod deployment shape):

  t_step(D) = t_comp + t_wire(D) + n_coll * t_lat
  t_comp    = B / single_chip_steps_per_sec          (unchanged under D)
  t_wire(D) = wire_bytes_per_chip_step(D) / ici_bytes_per_sec
  eff(D)    = t_comp / t_step(D)                      (edges/s efficiency)

Wire bytes use the PADDED all_to_all buffers (capacity cap = 4B/D^2 per
destination, R uint32 words per record, ``phases`` exchanges per step) —
the bytes the interconnect actually carries, an upper bound on the useful
record traffic measured in scaling_r3.jsonl.  The model intentionally has
NO overlap credit (the engines could hide exchange under local gathers;
projected efficiency is therefore a floor under its own assumptions).

Run:  python benchmarks/scaling_model.py [--json-out benchmarks/scaling_model_r4.json]
"""

from __future__ import annotations

import argparse
import json

# --- measured single-chip rates (v5e, B=131072, L=80; BENCHLOG r4) -------
MEASURED = {
    # family, shape: node-steps/s/chip (walk sampling, fat engines)
    ("uniform", "bench"): 95.99e6,     # BENCH_r03 (unchanged engine)
    ("node2vec", "bench"): 22.07e6,    # r4 final (pass redesign + wide Bloom + rpb8)
    ("uniform", "products"): 95.3e6,   # r3 roofline (gather-rate bound)
    ("node2vec", "products"): 14.67e6,  # r4 final (pass redesign + wide Bloom + rpb8)
}

# --- exchange invariants (virtual-mesh artifacts, D-invariant) ------------
# records/walker-step derived from scaling_r3.jsonl bytes/step / (4*R);
# phases/step from collectives/step (even-share LOG hop included).
TRAFFIC = {
    # family: (record_words R, records_per_walker_step, phases_per_step)
    "uniform": (3, 23.25 / 12.0, 2.0),
    "node2vec": (8, 122.37 / 32.0, 3.0),
}

V5E_ICI_BYTES = 1600e9 / 8      # 1600 Gbps/chip aggregate (cloud docs)
DCN_BYTES = 25e9 / 8            # ~25 Gbps/host egress, multi-slice
COLL_LAT = 25e-6                # all_to_all launch+sync latency (bound)


def project(family: str, shape: str, d: int, walkers: int,
            link_bytes_per_sec: float, balance: float = 4.0) -> dict:
    rate = MEASURED[(family, shape)]
    r_words, recs_per_step, phases = TRAFFIC[family]
    t_comp = walkers / rate
    # Padded outbox per chip per phase: D destinations x cap records, with
    # cap = balance * B_total / D^2 (RoutedConfig.for_walk) and B_total =
    # walkers * D under weak scaling  =>  D * cap * 4R = balance *
    # walkers * 4R bytes on the wire per phase, D-INDEPENDENT — the
    # measured O(B) traffic contract.  Useful record bytes (measured
    # scaling_r3.jsonl) are ~1/balance of that.
    wire = phases * balance * walkers * r_words * 4
    wire_useful = int(recs_per_step * walkers * r_words * 4)
    t_wire = wire / link_bytes_per_sec
    t_lat = phases * COLL_LAT
    eff = t_comp / (t_comp + t_wire + t_lat)
    # Overlap credit (r5): schedule="overlapped" in partition_v2 splits the
    # frontier into two pipelines — each phase body exchanges one half
    # while locally sampling the other (bit-identity tested on the virtual
    # mesh), so per hop the wall clock is 2 * max(t_comp/2, t_wire/2 +
    # t_lat) = max(t_comp, t_wire + 2*t_lat) instead of their sum.  This
    # is a designed property of the shipped schedule, not an aspiration;
    # the serial column remains the no-overlap floor.
    t_step_ovl = max(t_comp, t_wire + 2 * t_lat)
    eff_ovl = t_comp / t_step_ovl
    return {
        "family": family, "shape": shape, "devices": d,
        "walkers_per_chip": walkers,
        "t_comp_ms": round(t_comp * 1e3, 3),
        "t_wire_ms": round(t_wire * 1e3, 3),
        "t_latency_ms": round(t_lat * 1e3, 3),
        "wire_bytes_per_chip_step": int(wire),
        "useful_record_bytes_per_chip_step": wire_useful,
        "projected_efficiency": round(eff, 4),
        "projected_efficiency_overlapped": round(eff_ovl, 4),
        "projected_steps_per_sec_total": round(rate * d * eff, 0),
        "projected_steps_per_sec_total_overlapped": round(
            rate * d * eff_ovl, 0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=131_072,
                    help="walkers per chip (weak scaling)")
    ap.add_argument("--ici-gbps", type=float, default=1600.0)
    ap.add_argument("--dcn-gbps", type=float, default=25.0)
    ap.add_argument("--json-out", default="")
    args = ap.parse_args()

    ici = args.ici_gbps * 1e9 / 8
    dcn = args.dcn_gbps * 1e9 / 8
    rows = []
    for family in ("uniform", "node2vec"):
        for shape in ("bench", "products"):
            for d in (8, 16, 64, 256):
                rows.append(project(family, shape, d, args.walkers, ici))
            # Multi-POD (crossing DCN): v5e ICI spans a 256-chip pod, so
            # "1 chip -> 1 host -> N hosts" rides ICI intra-pod; only a
            # multi-pod all_to_all touches DCN.  8 chips share one host
            # NIC and half the traffic is inter-pod: effective per-chip
            # link = dcn/8 * 2.
            r = project(family, shape, 16, args.walkers, dcn / 8 * 2)
            r["devices"] = "2 pods (DCN)"
            rows.append(r)

    hdr = (f"{'family':9s} {'shape':9s} {'D':>9s} {'t_comp':>8s} "
           f"{'t_wire':>8s} {'eff':>7s} {'eff_ovl':>8s}")
    print(hdr)
    for r in rows:
        print(f"{r['family']:9s} {r['shape']:9s} {str(r['devices']):>9s} "
              f"{r['t_comp_ms']:7.2f}m {r['t_wire_ms']:7.3f}m "
              f"{r['projected_efficiency']:7.3f} "
              f"{r['projected_efficiency_overlapped']:8.3f}")
    out = {
        "assumptions": {
            "ici_gbps_per_chip": args.ici_gbps,
            "dcn_gbps_per_host": args.dcn_gbps,
            "collective_latency_s": COLL_LAT,
            "weak_scaling_walkers_per_chip": args.walkers,
            "wire_model": "padded (D, 4B/D^2, R) all_to_all buffers x "
                          "phases/step; serial column = no overlap credit, "
                          "overlapped column = max(t_comp, t_wire + 2*lat) "
                          "per the shipped two-pipeline schedule "
                          "(partition_v2 schedule='overlapped', "
                          "bit-identity tested)",
            "single_chip_rates": {f"{k[0]}/{k[1]}": v
                                  for k, v in MEASURED.items()},
            "traffic_invariants": TRAFFIC,
        },
        "projections": rows,
    }
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps({"min_intra_pod_efficiency": min(
        r["projected_efficiency"] for r in rows
        if isinstance(r["devices"], int))}))


if __name__ == "__main__":
    main()
