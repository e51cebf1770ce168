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


# Queries with an INTENTIONAL unpartitioned window (Window.orderBy with
# no partition key — funnels its input through ONE task).  Legal only
# when the window's input is a bounded AGGREGATE relation, never the
# data-scale stream.  Every entry must stay justified.
GLOBAL_WINDOW_OK = {
    "sketch_quantile_logbins",  # window over the O(bins)≈90-row sketch table
    "drift_chi2",               # margins over the |event_type|×2 contingency table
    "win_mom_growth",           # lag over the per-month rollup (~24 rows)
    "text_keyphrase_rake",      # row_number over the TakeOrdered K=20 relation
    "ml_lift_deciles",          # cumsum over the 10-row decile aggregate
    "ml_mutual_info",           # margins over the bins×2 contingency table
}


def _split_top(s):
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _n_unpartitioned_windows(plan: str) -> int:
    """Count windowspecdefinitions with NO partition expressions: the
    first top-level argument is either the frame itself or an ordering
    expression (carries ASC/DESC); partition expressions never do."""
    import re

    n = 0
    for m in re.finditer(r"windowspecdefinition\(", plan):
        start = m.end()
        depth, i = 1, start
        while depth and i < len(plan):
            if plan[i] in "([":
                depth += 1
            elif plan[i] in ")]":
                depth -= 1
            i += 1
        first = _split_top(plan[start : i - 1])[0]
        if first.startswith("specifiedwindowframe") or " ASC" in first or " DESC" in first:
            n += 1
    return n


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


def test_no_unpartitioned_windows_on_data_paths(plans):
    """An unpartitioned Window.orderBy sorts its whole input in one task
    (VERDICT r5: ml_auc_roc shipped one over the event stream).  Only
    bounded aggregate-sized inputs are exempt, via GLOBAL_WINDOW_OK."""
    offenders = [
        n for n, p in plans.items()
        if _n_unpartitioned_windows(p) > 0 and n not in GLOBAL_WINDOW_OK
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
