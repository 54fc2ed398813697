#!/usr/bin/env python3
"""Merge a key-filtered oracle_check verdict dump into a committed
scaled-correctness artifact, preserving that artifact's shape.

Usage: python3 tools/merge_sf_verdicts.py <artifact.json> \
           <verdicts.json> <key1,key2,...>

CORRECTNESS_SF05.json is a summary WRAPPER ({artifact, keys, hash_match,
failed, queries:{...}}); CORRECTNESS_SF25.json is a FLAT {key: verdict}
map. Writing the wrong shape corrupts the artifact (round-12 lesson), so
this script detects the shape and updates wrapper counts when present.
Only the named keys are merged; the verdicts file may contain
NO-SPARK-OUTPUT failures for unrun keys (a key-filtered Verify dumps the
full oracle map) and those are ignored.
"""
import json
import sys


def main(art_p, verd_p, keys_csv):
    art = json.load(open(art_p))
    verd = json.load(open(verd_p))
    keys = [k.strip() for k in keys_csv.split(",") if k.strip()]
    wrapper = "queries" in art and isinstance(art.get("queries"), dict)
    target = art["queries"] if wrapper else art
    for k in keys:
        if k not in verd:
            sys.exit(f"key {k} missing from {verd_p}")
        v = verd[k]
        if not (v.get("hash_match") and v.get("rows_match")
                and v.get("schema_match") and not v.get("err")):
            sys.exit(f"key {k} verdict is not green in {verd_p}: {v} — "
                     "fix before merging")
        target[k] = v
    if wrapper:
        art["keys"] = len(target)
        art["hash_match"] = sum(
            1 for v in target.values() if v.get("hash_match"))
        art["failed"] = sorted(
            k for k, v in target.items() if not v.get("hash_match"))
    # keep the artifact's existing top-level field order; merged keys are
    # re-inserted in sorted key order to keep the map alphabetical
    if wrapper:
        art["queries"] = {k: target[k] for k in sorted(target)}
    else:
        art = {k: art[k] for k in sorted(art)}
    with open(art_p, "w") as f:
        json.dump(art, f, indent=1)
    print(f"{art_p}: merged {len(keys)} keys -> "
          f"{len(target)} total, all green")


if __name__ == "__main__":
    main(*sys.argv[1:4])
