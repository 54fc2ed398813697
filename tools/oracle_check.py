#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares row count, column names (sorted), and
values row-by-row in emitted order. Exit 1 on any mismatch.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

BIG_ROWS = 2_000_000  # above this, compare in DuckDB (EXCEPT ALL), not Python


def norm(v):
    if v is None:
        return None
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        # STRICTLY HARSHER than the driver: compare BOTH the exact-scale
        # string and the float-roundtrip rendering. The driver canonicalizes
        # decimals scale-insensitively on one side of its compare, so a
        # value like 327221103.20 (exact "327221103.20", float "327221103.2")
        # hash-mismatches there even when both engines agree. Carrying both
        # renderings makes any such divergence fail HERE first.
        return ("dec", str(v), repr(float(v)))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def driver_hazards(row):
    """Values the DRIVER would canonicalize two ways even when both engines
    agree: decimals whose exact-scale string differs from their float repr
    (trailing zero at scale). One hit = the driver's hash_match fails."""
    import decimal
    out = []
    for v in row:
        if isinstance(v, decimal.Decimal) and str(v) != repr(float(v)):
            out.append(v)
    return out


def main(sf_dir, out_dir):
    out = Path(out_dir)
    oracle = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    # replica-corpus scale: keep the big intermediate joins in RAM
    # instead of spilling (the default limit spilled >60 GB to disk on
    # the 25x corpus); harmless at the sf0.01 driver gate
    con.execute("SET memory_limit='90GB'")
    # Every oracle either ends in an explicit total-order ORDER BY or is
    # a single-row aggregate (asserted by scanning oracle_sql.json), so
    # implicit insertion-order preservation buys nothing on the oracle
    # side and doubles the materialization footprint of the heavy
    # pipelines. The ONLY order-sensitive read is the Spark result
    # parquet (file order = the engine's emitted order) — the Python
    # compare path re-enables preservation around that fetch.
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table (ScaleData's kx corpus)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    verdicts = {}  # name -> CORRECTNESS-style record (optional 3rd arg)

    def record(name, rows_match, schema_match, hash_match, srows, drows,
               err=None):
        verdicts[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": srows,
            "oracle_rows": drows, "err": err}

    # ORACLE_ONLY / ORACLE_SKIP: comma-separated key filters for targeted
    # re-runs (e.g. resuming a disk-exhausted pass at scale). The driver
    # never sets these; a filtered local pass is a debugging aid, not the
    # gate.
    import os
    only = set(filter(None, os.environ.get("ORACLE_ONLY", "").split(",")))
    skip = set(filter(None, os.environ.get("ORACLE_SKIP", "").split(",")))
    for name in sorted(oracle):
        if (only and name not in only) or name in skip:
            continue
        qdir = out / name
        if not qdir.exists():
            failures.append((name, "NO SPARK OUTPUT"))
            record(name, False, False, False, 0, None, "NO SPARK OUTPUT")
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        try:
            duck_rel = con.sql(oracle[name])
        except Exception as e:
            failures.append((name, f"ORACLE SQL ERROR: {e}"))
            record(name, False, False, False, None, None,
                   f"ORACLE SQL ERROR: {e}")
            continue
        scols, dcols = list(spark_rel.columns), list(duck_rel.columns)
        if sorted(map(str.lower, scols)) != sorted(map(str.lower, dcols)):
            failures.append((name, f"COLUMNS spark={sorted(scols)} duck={sorted(dcols)}"))
            record(name, None, False, False, None, None, "COLUMNS differ")
            continue
        # driver sorts columns by name before hashing
        order = sorted(range(len(scols)), key=lambda i: scols[i].lower())
        dorder = sorted(range(len(dcols)), key=lambda i: dcols[i].lower())
        n_spark = con.execute(
            f"SELECT count(*) FROM read_parquet('{qdir}/*.parquet')"
        ).fetchone()[0]
        if n_spark > BIG_ROWS:
            # at replica-corpus scale a Python row loop would hold tens of
            # millions of tuples; compare inside DuckDB instead. Both
            # engines emit a deterministic total order (repo discipline:
            # every key ends in an ORDER BY over a unique key), so
            # multiset equality + equal counts == ordered equality.
            n_duck = con.execute(
                f"SELECT count(*) FROM ({oracle[name]}) q").fetchone()[0]
            if n_spark != n_duck:
                failures.append((name, f"ROWS spark={n_spark} duck={n_duck}"))
                record(name, False, True, False, n_spark, n_duck,
                       "row count mismatch")
                continue
            sel_s = ", ".join(f'"{scols[i]}"' for i in order)
            sel_d = ", ".join(f'"{dcols[i]}"' for i in dorder)
            sq = f"SELECT {sel_s} FROM read_parquet('{qdir}/*.parquet')"
            dq = f"SELECT {sel_d} FROM ({oracle[name]}) q"
            d1 = con.execute(
                f"SELECT count(*) FROM (({sq}) EXCEPT ALL ({dq})) t"
            ).fetchone()[0]
            d2 = con.execute(
                f"SELECT count(*) FROM (({dq}) EXCEPT ALL ({sq})) t"
            ).fetchone()[0]
            if d1 or d2:
                failures.append(
                    (name, f"{d1}+{d2} multiset-diff rows of {n_spark}"))
                record(name, True, True, False, n_spark, n_duck,
                       f"{d1}+{d2} multiset-diff rows")
                continue
            # driver-hazard decimal scan on a bounded sample (the scan
            # exists for decimal-rendering hazards; the big keys are
            # integer-typed, this is belt-and-braces)
            hz = 0
            for r in con.execute(f"{sq} LIMIT 100000").fetchall():
                if driver_hazards(r):
                    hz += 1
            if hz:
                failures.append(
                    (name, f"{hz} sampled rows carry driver-hazard decimals"))
                record(name, True, True, False, n_spark, n_duck,
                       "driver-hazard decimals (sampled)")
                continue
            print(f"OK   {name}: {n_spark} rows (multiset compare)")
            record(name, True, True, True, n_spark, n_duck)
            continue
        # BOTH fetches run with order preservation ON: the Spark parquet's
        # file order IS the engine's emitted order, and a DuckDB oracle
        # with materialized CTEs was observed emitting rows out of its
        # final ORDER BY under preserve_insertion_order=false (the
        # triangle_count 25x false-FAIL — multiset-identical, order
        # scrambled). Only the explicitly order-insensitive multiset
        # branch above keeps the setting off.
        con.execute("SET preserve_insertion_order=true")
        try:
            srows = spark_rel.fetchall()
            drows = duck_rel.fetchall()
        finally:
            con.execute("SET preserve_insertion_order=false")
        if len(srows) != len(drows):
            failures.append((name, f"ROWS spark={len(srows)} duck={len(drows)}"))
            record(name, False, True, False, len(srows), len(drows),
                   "row count mismatch")
            continue
        bad = 0
        hazards = 0
        for ri, (sr, dr) in enumerate(zip(srows, drows)):
            sv = tuple(norm(sr[i]) for i in order)
            dv = tuple(norm(dr[i]) for i in dorder)
            if sv != dv:
                bad += 1
                if bad <= 3:
                    print(f"  [{name}] row {ri} diff:\n    spark={sv}\n    duck ={dv}")
            hz = driver_hazards(sr) + driver_hazards(dr)
            if hz:
                hazards += 1
                if hazards <= 3:
                    print(f"  [{name}] row {ri} DRIVER-HAZARD decimal(s): {hz}")
        if bad:
            failures.append((name, f"{bad}/{len(srows)} rows differ"))
            record(name, True, True, False, len(srows), len(drows),
                   f"{bad} rows differ")
        elif hazards:
            failures.append((name, f"{hazards}/{len(srows)} rows carry trailing-zero decimals the driver hash-fails"))
            record(name, True, True, False, len(srows), len(drows),
                   "driver-hazard decimals")
        else:
            print(f"OK   {name}: {len(srows)} rows")
            record(name, True, True, True, len(srows), len(drows))
    if len(sys.argv) > 3:
        Path(sys.argv[3]).write_text(json.dumps(verdicts, indent=1))
    if failures:
        print("\nFAILURES:")
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        sys.exit(1)
    n = len(verdicts)
    tag = "" if n == len(oracle) else f" (FILTERED: {len(oracle) - n} skipped)"
    print(f"\nALL {n} checked queries hash-match{tag}.")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
