#!/usr/bin/env python3
"""Assemble BENCH_SCALE.json from committed Bench artifacts at one or
more data multiples — the scale CURVE, not a single point.

Usage: python3 tools/scale_bench.py <base_full.json> <out.json> \
           <notes.json> <k1>=<scaled1.json> [<k2>=<scaled2.json> ...]

<base_full.json>  BENCH_FULL.json from a quiet 1x run (per-key medians).
<kN>=<scaledN>    BENCH_FULL.json from the kNx replicated corpus run.
<notes.json>      {key: analysis} map (tools/scale_notes.json); every
                  time- or byte-superlinear key MUST have a note or the
                  script exits 1 — a ratio above k is only acceptable in
                  the artifact alongside its measured explanation.

Three gates per multiple:
- TIME: per-key ratio sec_kx/sec_1x > k (1x times under FLOOR_SEC skip —
  scheduling noise).
- BYTES (round 11+): per-key shuffle-write ratio
  write_kx / max(write_1x, FLOOR_BYTES) > k. At cluster scale the cost
  model is shuffle bytes moved, not local seconds; the max() keeps a
  near-zero 1x base from inflating AQE/broadcast flips into violations
  while still catching a shuffle that GROWS into something real at kx.
- SPILL (round 12+): a key spilling >4MB at kx while spill-free at 1x is
  flagged spill-emergent — the memory-pressure signal that predicts
  100 TB OOMs even when local disk hides it from the timing.

With two or more multiples, each key also gets an empirical scaling
EXPONENT fit between the two largest multiples
(log(t_b/t_a)/log(b/a)): ~1 is linear, ~2 quadratic. One 5x ratio
cannot distinguish linear from quadratic-with-small-constant; two
points can. Exponents are only reported where both times clear
FLOOR_EXP_SEC, below which the fit is noise.

This replaces the round-9 one-off merge: the artifact is derived from
its inputs by a committed script, so doc numbers (total_ratio,
superlinear key list) can be regenerated instead of hand-copied —
the drift class ADVICE r9 flagged twice (SURVEY 1.73 vs artifact 1.79).
"""
import json
import math
import sys

FLOOR_SEC = 0.05      # below this the 1x time is scheduling noise
FLOOR_EXP_SEC = 0.2   # exponent fit needs both points above noise
FLOOR_BYTES = 4 * 1024 * 1024
OFFFIT_ABS_SEC = 1.0  # pred_err flags only above this absolute deviation


def main(base_p, out_p, notes_p, *points):
    base = json.load(open(base_p))
    notes = json.load(open(notes_p))
    if not points:
        sys.exit("need at least one <k>=<scaled_full.json> point")
    scaled = []
    for pt in points:
        kstr, _, path = pt.partition("=")
        scaled.append((float(kstr), json.load(open(path))))
    scaled.sort(key=lambda t: t[0])

    bq, bb = base["queries"], base.get("shuffle_bytes", {})
    for k, s in scaled:
        missing = sorted(set(bq) ^ set(s["queries"]))
        if missing:
            sys.exit(f"key sets differ between base and {k}x: {missing}")

    def ktag(k):
        return str(int(k)) if k == int(k) else str(k)

    queries, superlinear, byte_superlinear = {}, {}, {}
    spill_emergent, spill_unknown_base = {}, {}
    for key in sorted(bq):
        b = bq[key]
        entry = {"sec_1x": round(b, 3)}
        w1 = bb.get(key, {}).get("write", -1)
        if w1 >= 0:
            entry["write_mb_1x"] = round(w1 / 2**20, 1)
        p1 = bb.get(key, {}).get("spill", -1)
        if p1 >= 0:
            entry["spill_mb_1x"] = round(p1 / 2**20, 1)
        for k, art in scaled:
            t = ktag(k)
            s = art["queries"][key]
            entry[f"sec_{t}x"] = round(s, 3)
            if b >= FLOOR_SEC:
                r = round(s / b, 2)
                entry[f"ratio_{t}x"] = r
                if r > k:
                    superlinear.setdefault(t, []).append(key)
            wk = art.get("shuffle_bytes", {}).get(key, {}).get("write", -1)
            if w1 >= 0 and wk >= 0:
                entry[f"write_mb_{t}x"] = round(wk / 2**20, 1)
                br = round(wk / max(w1, FLOOR_BYTES), 2)
                entry[f"byte_ratio_{t}x"] = br
                if br > k:
                    byte_superlinear.setdefault(t, []).append(key)
            # spill gate (round 12+): spill is the memory-pressure signal
            # that predicts 100 TB OOMs — a key that runs spill-free at 1x
            # but spills at kx has outgrown its partition sizing, and the
            # local timing may hide it (disk is fast here, OOM is not).
            pk = art.get("shuffle_bytes", {}).get(key, {}).get("spill", -1)
            if pk >= 0:
                entry[f"spill_mb_{t}x"] = round(pk / 2**20, 1)
                # p1 >= 0 required (ADVICE r12): a base artifact that
                # predates spill recording has p1 = -1, which is NOT
                # "spill-free at 1x" — flagging on it would manufacture
                # false emergent keys; report those separately instead
                if pk > FLOOR_BYTES and 0 <= p1 <= FLOOR_BYTES:
                    spill_emergent.setdefault(t, []).append(key)
                elif pk > FLOOR_BYTES and p1 < 0:
                    spill_unknown_base.setdefault(t, []).append(key)
        if len(scaled) >= 2:
            (ka, aa), (kb, ab) = scaled[-2], scaled[-1]
            ta, tb = aa["queries"][key], ab["queries"][key]
            if ta >= FLOOR_EXP_SEC and tb >= FLOOR_EXP_SEC:
                entry["exponent"] = round(
                    math.log(tb / ta) / math.log(kb / ka), 2)
        # three-point check (VERDICT r12 task 7): fit the exponent on the
        # FIRST two multiples, predict the largest, and record
        # predicted-vs-measured — one fitted slope through two points
        # cannot be falsified; the third point can. pred_err ~1 means the
        # power-law fit extrapolates; far from 1 means the curve bends
        # (emergent behavior between kb and kc) and the key needs a note.
        if len(scaled) >= 3:
            (ka, aa), (kb, ab), (kc, ac) = scaled[0], scaled[1], scaled[-1]
            ta, tb, tc = (aa["queries"][key], ab["queries"][key],
                          ac["queries"][key])
            if min(ta, tb, tc) >= FLOOR_EXP_SEC:
                e_lo = math.log(tb / ta) / math.log(kb / ka)
                pred = tb * (kc / kb) ** e_lo
                entry["exponent_lo"] = round(e_lo, 2)
                entry[f"pred_sec_{ktag(kc)}x"] = round(pred, 3)
                entry["pred_err"] = round(tc / pred, 2)
        queries[key] = entry

    # off-fit keys (three-point runs only): measured third point more
    # than 2x off the low-fit power-law prediction in either direction —
    # the curve bent, and the bend needs a measured analysis like any
    # superlinear flag. The RELATIVE gate alone manufactures flags out
    # of sub-second floor noise (r14 carried six such keys: a 0.3 s
    # measurement vs a 0.1 s prediction is err 3.0 but means nothing on
    # this box's ±0.2 s scheduling jitter), so the flag additionally
    # requires the absolute deviation to clear OFFFIT_ABS_SEC — a
    # genuinely bent curve at the largest multiple is seconds off, a
    # floor artifact is not.
    t_last = ktag(scaled[-1][0])

    def _offfit(e):
        pe = e.get("pred_err")
        if pe is None or 0.5 <= pe <= 2.0:
            return False
        return abs(e[f"sec_{t_last}x"]
                   - e[f"pred_sec_{t_last}x"]) > OFFFIT_ABS_SEC
    offfit = sorted(q for q, e in queries.items() if _offfit(e))
    flagged = sorted({q for ks in superlinear.values() for q in ks} |
                     {q for ks in byte_superlinear.values() for q in ks} |
                     {q for ks in spill_emergent.values() for q in ks} |
                     set(offfit))
    unexplained = [q for q in flagged if q not in notes]
    if unexplained:
        sys.exit(
            f"superlinear keys lack an analysis note in {notes_p}: "
            f"{unexplained} — measure the cause and record it before "
            "committing the artifact")

    # headline continuity: total_ratio / superlinear_keys keep their
    # round-10 meaning (the FIRST multiple, 5x) for docs_check; the
    # full curve lives in `points` and the per-key map
    k0, s0 = scaled[0]
    art = {
        "artifact": "BENCH_SCALE",
        "k": k0,
        "base_sf": base.get("sf"),
        "base_total": base.get("value"),
        "base_passes": base.get("passes"),
        "base_failed": base.get("failed"),
        "base_load_avg_before": base.get("load_avg_before"),
        "total_ratio": round(s0["value"] / base["value"], 2),
        "superlinear_keys": superlinear.get(ktag(k0), []),
        "offfit_keys": offfit,
        "points": [{
            "k": k,
            "sf": a.get("sf"),
            "total": a.get("value"),
            "total_ratio": round(a["value"] / base["value"], 2),
            "passes": a.get("passes"),
            "failed": a.get("failed"),
            "load_avg_before": a.get("load_avg_before"),
            "superlinear_keys": superlinear.get(ktag(k), []),
            "byte_superlinear_keys": byte_superlinear.get(ktag(k), []),
            "spill_emergent_keys": spill_emergent.get(ktag(k), []),
            "spill_unknown_base_keys": spill_unknown_base.get(ktag(k), []),
        } for k, a in scaled],
        "note": ("per-key median(1x, quiet multi-pass) vs kx replicated "
                 "corpus at each point; ratio > k means superlinear "
                 "growth in data volume (time) or shuffle-write bytes; "
                 "`exponent` is the empirical scaling exponent fit "
                 "between the two largest multiples (~1 linear, ~2 "
                 "quadratic); ratios omitted for keys whose 1x time is "
                 f"under the {int(FLOOR_SEC*1000)}ms scheduling floor; "
                 "spill_emergent_keys spill >4MB at kx while spill-free "
                 "at 1x (the memory-pressure signal that predicts OOMs "
                 "at cluster scale); with three multiples each key also "
                 "carries exponent_lo (fit on the first two multiples), "
                 "pred_sec_<k>x (that fit extrapolated to the largest "
                 "multiple) and pred_err = measured/predicted — "
                 "pred_err outside [0.5, 2] AND an absolute deviation "
                 f"above {OFFFIT_ABS_SEC} s at the largest multiple "
                 "flags the key off-fit and requires an analysis note "
                 "(the absolute floor keeps sub-second scheduling "
                 "jitter from manufacturing flags)"),
        "queries": queries,
        "superlinear_analysis": {q: notes[q] for q in flagged},
    }
    with open(out_p, "w") as f:
        json.dump(art, f, indent=None)
    for p in art["points"]:
        print(f"k={p['k']} total_ratio={p['total_ratio']} "
              f"superlinear={p['superlinear_keys']} "
              f"byte_superlinear={p['byte_superlinear_keys']} "
              f"spill_emergent={p['spill_emergent_keys']}")


def _selftest_offfit():
    """A genuinely bent curve (seconds off its low-fit prediction) must
    still flag off-fit; a sub-second floor artifact with the same
    RELATIVE error must not (the r14 noise class)."""
    import os
    import subprocess
    import tempfile
    d = tempfile.mkdtemp()
    # floor: err ~2.2 but |diff| ~0.4 s  -> not flagged
    # bent:  err ~11  and |diff| ~27 s   -> flagged, note required
    base = {"queries": {"floor": 0.25, "bent": 0.2}, "value": 0.45,
            "sf": "1x"}
    p5 = {"queries": {"floor": 0.25, "bent": 1.0}, "value": 1.25, "sf": "5x"}
    p25 = {"queries": {"floor": 0.30, "bent": 2.0}, "value": 2.3,
           "sf": "25x"}
    p50 = {"queries": {"floor": 0.70, "bent": 30.0}, "value": 30.7,
           "sf": "50x"}
    notes = {"bent": "synthetic bend for the selftest",
             "floor": "unused unless the floor gate regresses"}
    for n, obj in (("b.json", base), ("p5.json", p5), ("p25.json", p25),
                   ("p50.json", p50), ("n.json", notes)):
        json.dump(obj, open(os.path.join(d, n), "w"))
    out = os.path.join(d, "out.json")
    r = subprocess.run(
        [sys.executable, __file__, os.path.join(d, "b.json"), out,
         os.path.join(d, "n.json"), "5=" + os.path.join(d, "p5.json"),
         "25=" + os.path.join(d, "p25.json"),
         "50=" + os.path.join(d, "p50.json")],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    art = json.load(open(out))
    assert art["offfit_keys"] == ["bent"], art["offfit_keys"]
    fq = art["queries"]["floor"]
    assert not 0.5 <= fq["pred_err"] <= 2.0, (
        "selftest premise broken: floor key's relative err must be "
        f"outside [0.5,2] to prove the absolute gate did the work: {fq}")
    print("selftest-offfit: bent flagged, floor artifact suppressed")


if __name__ == "__main__":
    if "--selftest-offfit" in sys.argv:
        _selftest_offfit()
        sys.exit(0)
    main(*sys.argv[1:])
