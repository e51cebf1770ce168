#!/usr/bin/env python
"""Driver-style correctness gate, run locally: every registered query's
Spark result vs its DuckDB oracle at a given scale factor.

Emulates the driver compare: sort columns by name, compare row multisets
exactly (plus a float near-miss report so parity bugs are diagnosable).

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")  # width-insensitive (int32 vs int64)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def unhashable_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns the driver's hasher cannot digest (array/map/struct values
    arrive in pandas as list/ndarray/dict objects → "unhashable type").
    VERDICT r2: emb_quantize_int8 slipped through because selfcheck compared
    via str() — mirror the driver's stricter contract here."""
    bad = []
    for c in pdf.columns:
        if pdf[c].dtype == object:
            probe = pdf[c].dropna().head(5)
            if any(isinstance(v, (list, tuple, dict, set)) or hasattr(v, "__array__")
                   for v in probe):
                bad.append(c)
    return bad


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> tuple[bool, str]:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return False, f"columns differ: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    bad = unhashable_cols(spark_pdf) + [c for c in unhashable_cols(duck_pdf)
                                        if c not in unhashable_cols(spark_pdf)]
    if bad:
        return False, (f"driver-unhashable (array/map-typed) output cols {bad}: "
                       "serialize via array_join/array_to_string on both sides")
    if len(spark_pdf) != len(duck_pdf):
        return False, f"row counts differ: spark={len(spark_pdf)} duck={len(duck_pdf)}"
    a, b = canon(spark_pdf), canon(duck_pdf)
    issues = []
    for c in a.columns:
        av, bv = a[c], b[c]
        # Driver mirror (round-5 hardening): the driver hashes raw values, so
        # an integer Spark column vs a float oracle column (DuckDB HUGEINT →
        # pandas float64, e.g. an uncast SUM(CASE…)) hash-mismatches even
        # when every value is numerically equal.  Reject the dtype-class
        # skew itself — the fix is a CAST(... AS BIGINT) in the oracle.
        if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
            issues.append(
                f"col {c}: dtype class differs (spark={av.dtype} vs duck={bv.dtype}) "
                "— driver hash would mismatch; CAST the oracle column"
            )
            continue
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            avf = pd.to_numeric(av, errors="coerce")
            bvf = pd.to_numeric(bv, errors="coerce")
            both_nan = avf.isna() & bvf.isna()
            eq = (avf == bvf) | both_nan
            if not eq.all():
                bad = (~eq).sum()
                maxdiff = (avf - bvf).abs().max()
                issues.append(f"col {c}: {bad} rows differ (max abs diff {maxdiff:.3e})")
        else:
            av2 = av.where(pd.notna(av), None)
            bv2 = bv.where(pd.notna(bv), None)
            if not av2.equals(bv2):
                bad = (av2 != bv2) & ~(av2.isna() & bv2.isna())
                idx = bad[bad].index[:3].tolist()
                examples = [(c, i, av2.get(i), bv2.get(i)) for i in idx]
                issues.append(f"col {c}: {bad.sum()} rows differ, e.g. {examples}")
    if issues:
        return False, "; ".join(issues)
    return True, "ok"


def main() -> int:
    args = sys.argv[1:]
    if args and os.path.isdir(args[0]):
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    only = set(names) or None

    import __spark_entry__ as entrymod
    from pulsar_ingestion_spark.session import get_spark, tables_dir

    spark = get_spark("selfcheck")
    con = duckdb.connect()
    for t, path in tables_dir(sf_dir).items():
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        unknown = only - set(queries)
        if unknown:
            print(f"unknown query names (or nonexistent sf_dir?): {sorted(unknown)}")
            return 1
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {ex}")
            continue
        finally:
            # A few queries persist() intermediates (ranking-based ones);
            # drop them so 192 sequential queries don't accumulate cached
            # blocks until LRU pressure (ADVICE r4).
            spark.catalog.clearCache()
        if name not in oracles:
            n_rows_only += 1
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {ex}")
            continue
        ok, msg = compare(name, sdf, ddf)
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failures:
        print("failed:", " ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
