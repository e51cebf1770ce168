"""Registry-wide physical-plan hygiene: every registered query's plan is
compiled (not executed) and screened for the anti-patterns that kill
100 TB runs.  Complements test_plans.py (deep per-query assertions) with
a cheap breadth gate — a new query with an accidental cartesian product
or a row-at-a-time Python UDF fails here before it ever ships.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# Queries with an INTENTIONAL non-broadcast cartesian product of bounded
# relations.  (BroadcastNestedLoopJoin is NOT screened: its product side
# is broadcast and therefore memory-bounded by construction — the
# sanctioned crossJoin(broadcast(<1-row aggregate>)) normalizer pattern
# plans as BNLJ.)  Every entry must stay justified.
CARTESIAN_OK = {
    "join_cross",          # region × nation demo — 5 × 25 rows by design
}


def _all_plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        out[name] = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        spark.catalog.clearCache()
    return out


@pytest.fixture(scope="module")
def plans(spark):
    return _all_plans(spark)


def test_no_rowwise_python_udf_anywhere(plans):
    """BatchEvalPython = row-at-a-time Python UDF — banned outright; the
    only sanctioned Python paths are Arrow-vectorized (ArrowEvalPython /
    mapInPandas / applyInPandas)."""
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not offenders, offenders


def test_no_unjustified_cartesian_products(plans):
    offenders = [
        n for n, p in plans.items()
        if "CartesianProduct" in p and n not in CARTESIAN_OK
    ]
    assert not offenders, offenders


def test_no_single_partition_exchange_on_data_paths(plans):
    """SinglePartition exchanges are legal only for final sketch-sized
    aggregates (1-row reductions); flag queries where one appears more
    than twice — a sign data-sized rows funnel through one task."""
    offenders = [
        n for n, p in plans.items() if p.count("Exchange SinglePartition") > 2
    ]
    assert not offenders, offenders
