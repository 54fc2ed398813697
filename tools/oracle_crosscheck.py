#!/usr/bin/env python3
"""Collapsed-vs-per-row oracle cross-check (ADVICE r11).

The fuzzy_link and minhash_sim_est oracles were rewritten at round 11 to
collapse exact duplicates before their quadratic joins — the same idea the
engine under test uses — so at 25x scale they stay tractable. That erodes
oracle independence: a bug in the shared collapse idea would pass the main
gate. This script keeps the ORIGINAL per-row formulations executable
(tools/per_row_oracles/*.sql) and re-proves, wherever the per-row form is
still tractable (sf0.001 / sf0.01), that both formulations emit IDENTICAL
rows in identical order.

Usage: python3 tools/oracle_crosscheck.py <sfDir> <verifyOutDir>

<verifyOutDir> must contain oracle_sql.json (a graft.Verify dump) — the
collapsed SQL is read from there, never duplicated here, so the check
always runs against the SHIPPED oracle text. Exit 1 on any divergence.
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    oracle = json.loads(
        (Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}')")

    sql_dir = Path(__file__).parent / "per_row_oracles"
    failures = []
    for f in sorted(sql_dir.glob("*.sql")):
        key = f.stem
        if key not in oracle:
            failures.append((key, "no shipped oracle of this name"))
            continue
        per_row = f.read_text()
        collapsed = oracle[key]
        a = con.execute(per_row).fetchall()
        b = con.execute(collapsed).fetchall()
        if len(a) != len(b):
            failures.append((key, f"row counts differ: per-row {len(a)} "
                                  f"vs collapsed {len(b)}"))
            continue
        bad = sum(1 for x, y in zip(a, b) if x != y)
        if bad:
            failures.append((key, f"{bad}/{len(a)} rows differ"))
            continue
        print(f"OK   {key}: per-row == collapsed, {len(a)} rows")
    if failures:
        for k, m in failures:
            print(f"FAIL {k}: {m}")
        sys.exit(1)
    print("cross-check green: every per-row formulation matches its "
          "shipped collapsed oracle")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
