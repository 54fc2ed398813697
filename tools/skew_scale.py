#!/usr/bin/env python3
"""Assemble SKEW_SCALE.json: per-key quiet ratios of a SKEW-shaped
corpus run vs the UNIFORM replica corpus run at the SAME row counts.

The replica corpora (BENCH_SCALE) test volume; this artifact tests
DISTRIBUTION — a hot near-dup group (10% of docs one text), a hot
source (25% of docs), a hot user (25% of events), a hot part (25% of
lineitem). Row counts are identical by construction (graft.SkewData
rewrites values, never adds rows), so sec_skew/sec_uniform isolates the
skew response of each plan.

Usage: python3 tools/skew_scale.py <uniform_full.json> <skew_full.json> \
           <notes.json> <out.json>

<uniform_full.json>  BENCH_FULL.json from the uniform kx corpus.
<skew_full.json>     BENCH_FULL.json from the SkewData twin (may be a
                     key-filtered run; only keys present in BOTH are
                     compared — the filter set is recorded).
<notes.json>         {key: analysis} map. Every key with time ratio > 2
                     (above floor) MUST have a note or the script exits
                     1 — a skew degradation is only acceptable in the
                     artifact alongside its measured explanation.

Gates per key: TIME ratio > 2 (uniform times under FLOOR_SEC skip —
scheduling noise), BYTE ratio (shuffle write) > 2 above FLOOR_BYTES,
and SPILL emergence (spilling >4MB under skew while spill-free
uniform).
"""
import json
import sys

FLOOR_SEC = 0.2
FLOOR_BYTES = 4 * 1024 * 1024
RATIO_GATE = 2.0


def main(uni_p, skew_p, notes_p, out_p):
    uni = json.load(open(uni_p))
    skew = json.load(open(skew_p))
    notes = json.load(open(notes_p))
    uq, ub = uni["queries"], uni.get("shuffle_bytes", {})
    sq, sb = skew["queries"], skew.get("shuffle_bytes", {})
    keys = sorted(set(uq) & set(sq))
    if not keys:
        sys.exit("no common keys between uniform and skew runs")
    queries, flagged, byte_flagged, spill_emergent = {}, [], [], []
    for key in keys:
        u, s = uq[key], sq[key]
        entry = {"sec_uniform": round(u, 3), "sec_skew": round(s, 3)}
        if u >= FLOOR_SEC:
            r = round(s / u, 2)
            entry["ratio"] = r
            if r > RATIO_GATE:
                flagged.append(key)
                if key not in notes:
                    sys.exit(f"{key}: skew ratio {r} > {RATIO_GATE} but no "
                             f"analysis in {notes_p} — measure before "
                             "committing")
                entry["analysis"] = notes[key]
        uw = ub.get(key, {}).get("write", -1)
        sw = sb.get(key, {}).get("write", -1)
        if uw >= 0 and sw >= 0:
            entry["write_mb_uniform"] = round(uw / 2**20, 1)
            entry["write_mb_skew"] = round(sw / 2**20, 1)
            br = round(sw / max(uw, FLOOR_BYTES), 2)
            entry["byte_ratio"] = br
            if br > RATIO_GATE:
                byte_flagged.append(key)
                if key not in notes:
                    sys.exit(f"{key}: skew BYTE ratio {br} > {RATIO_GATE} "
                             f"but no analysis in {notes_p}")
                entry["analysis"] = notes[key]
        up = ub.get(key, {}).get("spill", -1)
        sp = sb.get(key, {}).get("spill", -1)
        if sp >= 0:
            entry["spill_mb_skew"] = round(sp / 2**20, 1)
            if sp > FLOOR_BYTES and 0 <= up <= FLOOR_BYTES:
                spill_emergent.append(key)
                if key not in notes:
                    sys.exit(f"{key}: spill-emergent under skew but no "
                             f"analysis in {notes_p}")
                entry["analysis"] = notes[key]
        queries[key] = entry
    out = {
        "artifact": "SKEW_SCALE",
        "protocol": ("graft.SkewData twin of the uniform replica corpus "
                     "(identical row counts; 10% hot near-dup doc group, "
                     "25% hot source, 25% hot user in events, 25% hot "
                     "part in lineitem), key-filtered graft.Bench on "
                     "both, ratios skew/uniform; ratio > 2, byte ratio "
                     "> 2 and emergent spill all require a committed "
                     "analysis"),
        "uniform_sf": uni.get("sf"),
        "skew_sf": skew.get("sf"),
        "keys": len(keys),
        "load_avg_before": {"uniform": uni.get("load_avg_before"),
                            "skew": skew.get("load_avg_before")},
        "time_flagged": sorted(flagged),
        "byte_flagged": sorted(byte_flagged),
        "spill_emergent": sorted(spill_emergent),
        "queries": queries,
    }
    with open(out_p, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{out_p}: {len(keys)} keys, time_flagged={sorted(flagged)}, "
          f"byte_flagged={sorted(byte_flagged)}, "
          f"spill_emergent={sorted(spill_emergent)}")


def _selftest():
    """Synthetic check: a 3x skew ratio without a note must fail; with a
    note it must pass and carry the analysis."""
    import tempfile, os
    d = tempfile.mkdtemp()
    uni = {"queries": {"a": 1.0, "b": 0.5}, "sf": "u",
           "shuffle_bytes": {"a": {"write": 10 * 2**20, "spill": 0},
                             "b": {"write": 10 * 2**20, "spill": 0}}}
    skw = {"queries": {"a": 3.0, "b": 0.6}, "sf": "s",
           "shuffle_bytes": {"a": {"write": 11 * 2**20, "spill": 0},
                             "b": {"write": 10 * 2**20, "spill": 0}}}
    for n, obj in (("u.json", uni), ("s.json", skw), ("n0.json", {}),
                   ("n1.json", {"a": "hot group contracted output"})):
        json.dump(obj, open(os.path.join(d, n), "w"))
    import subprocess
    r = subprocess.run([sys.executable, __file__,
                        os.path.join(d, "u.json"), os.path.join(d, "s.json"),
                        os.path.join(d, "n0.json"), os.path.join(d, "o.json")],
                       capture_output=True, text=True)
    assert r.returncode == 1 and "no" in r.stderr + r.stdout, (
        "missing-note run must fail: " + r.stdout + r.stderr)
    r = subprocess.run([sys.executable, __file__,
                        os.path.join(d, "u.json"), os.path.join(d, "s.json"),
                        os.path.join(d, "n1.json"), os.path.join(d, "o.json")],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    out = json.load(open(os.path.join(d, "o.json")))
    assert out["time_flagged"] == ["a"]
    assert out["queries"]["a"]["analysis"].startswith("hot group")
    assert "ratio" not in out["queries"]["b"] or \
        out["queries"]["b"]["ratio"] <= RATIO_GATE
    print("selftest: missing-note fails, noted flag passes")


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        _selftest()
        sys.exit(0)
    main(*sys.argv[1:5])
