#!/usr/bin/env python
"""Isolated per-query timing with the EXACT bench.py methodology:
warm-up run, then N measured runs of fresh-build + count(), min + var,
clearCache between runs.  For before/after A-B checks during the
optimization round without paying for the full 72-query bench.

Usage: python tools/qbench.py <query> [query ...]   [-n N]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if "-n" in args:
        i = args.index("-n")
        n = int(args[i + 1])
        del args[i:i + 2]
    names = args

    import __spark_entry__ as entrymod
    from pulsar_ingestion_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qbench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    queries["scan_project"](spark, sf_dir).count()
    spark.catalog.clearCache()

    print(f"{'query':<36} {'min':>7} {'var':>9}  runs")
    for name in names:
        samples = []
        for it in range(n + 1):
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - t0, 4)
            if it > 0:
                samples.append(dt)
            spark.catalog.clearCache()
        var = round(statistics.variance(samples), 6) if len(samples) >= 2 else 0.0
        print(f"{name:<36} {min(samples):>7.3f} {var:>9.4f}  "
              + " ".join(f"{s:.2f}" for s in samples))


if __name__ == "__main__":
    main()
