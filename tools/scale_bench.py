#!/usr/bin/env python3
"""Assemble BENCH_SCALE.json from two committed Bench artifacts.

Usage: python3 tools/scale_bench.py <base_full.json> <scaled_full.json> \
           <k> <out.json> [notes.json]

<base_full.json>   BENCH_FULL.json from a quiet 1x run (per-key medians).
<scaled_full.json> BENCH_FULL.json from the kx replicated corpus run.
<notes.json>       optional {key: analysis} map (tools/scale_notes.json);
                   every superlinear key MUST have a note or the script
                   exits 1 — a ratio above k is only acceptable in the
                   artifact alongside its measured explanation.

This replaces the round-9 one-off merge: the artifact is now derived
from its inputs by a committed script, so doc numbers (total_ratio,
superlinear key list) can be regenerated instead of hand-copied —
the drift class ADVICE r9 flagged twice (SURVEY 1.73 vs artifact 1.79).
"""
import json
import sys

FLOOR_SEC = 0.05  # below this the 1x time is scheduling noise, skip ratio


def main(base_p, scaled_p, k, out_p, notes_p=None):
    base = json.load(open(base_p))
    scaled = json.load(open(scaled_p))
    k = float(k)
    notes = json.load(open(notes_p)) if notes_p else {}

    bq, sq = base["queries"], scaled["queries"]
    missing = sorted(set(bq) ^ set(sq))
    if missing:
        sys.exit(f"key sets differ between base and scaled runs: {missing}")

    queries, superlinear = {}, []
    for key in sorted(bq):
        b, s = bq[key], sq[key]
        entry = {"sec_1x": round(b, 3), "sec_5x": round(s, 3)}
        if b >= FLOOR_SEC:
            entry["ratio"] = round(s / b, 2)
            if entry["ratio"] > k:
                superlinear.append(key)
        queries[key] = entry

    unexplained = [q for q in superlinear if q not in notes]
    if unexplained:
        sys.exit(
            f"superlinear keys lack an analysis note in {notes_p}: "
            f"{unexplained} — measure the cause and record it before "
            "committing the artifact")

    art = {
        "artifact": "BENCH_SCALE",
        "k": k,
        "base_sf": base.get("sf"),
        "scaled_sf": scaled.get("sf"),
        "base_total": base.get("value"),
        "scaled_total": scaled.get("value"),
        "total_ratio": round(scaled["value"] / base["value"], 2),
        "base_passes": base.get("passes"),
        "scaled_passes": scaled.get("passes"),
        "base_failed": base.get("failed"),
        "scaled_failed": scaled.get("failed"),
        "base_load_avg_before": base.get("load_avg_before"),
        "scaled_load_avg_before": scaled.get("load_avg_before"),
        "superlinear_keys": superlinear,
        "note": ("per-key median(1x, quiet multi-pass) vs kx replicated "
                 "corpus; ratio > k means superlinear growth in data "
                 "volume; ratios omitted for keys whose 1x time is under "
                 f"the {int(FLOOR_SEC*1000)}ms scheduling floor"),
        "queries": queries,
        "superlinear_analysis": {q: notes[q] for q in superlinear},
    }
    with open(out_p, "w") as f:
        json.dump(art, f, indent=None)
    print(f"total_ratio={art['total_ratio']} superlinear={superlinear}")


if __name__ == "__main__":
    main(*sys.argv[1:])
