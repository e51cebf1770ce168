"""Semantic invariants of the round-5 families — properties the oracle
hash can't see failing for the RIGHT reason (e.g. credit conservation),
checked at sf0.001 on the shared session."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_position_attribution_conserves_credit(spark):
    """Every converting user's journey distributes exactly 1.0 of credit
    (0.4/0.2/0.4 partitions a unit), so total credit == number of users
    with at least one pre-purchase touch."""
    from pulsar_ingestion_spark.queries_events import q_events_attribution_position
    from pulsar_ingestion_spark.session import fan_out, load_tables

    total_credit = (
        q_events_attribution_position(spark, SF).agg(F.sum("credit")).collect()[0][0]
    )
    ev = fan_out(load_tables(spark, SF)["events"], spark)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select("user_id", "event_type", F.row_number().over(w).alias("rn"))
    fp = (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("rn").alias("fp_rn"))
    )
    converters_with_touch = (
        seq.join(fp, "user_id")
        .filter((F.col("rn") < F.col("fp_rn")) & (F.col("event_type") != "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(total_credit - converters_with_touch) < 1e-6


def test_scd2_every_order_matches_one_version(spark):
    """The validity intervals partition time, so the join neither drops
    nor duplicates fact rows: per-segment counts sum to |orders|."""
    from pulsar_ingestion_spark.queries_warehouse import q_scd2_point_in_time
    from pulsar_ingestion_spark.session import load_tables

    total = (
        q_scd2_point_in_time(spark, SF).agg(F.sum("order_cnt")).collect()[0][0]
    )
    n_orders = load_tables(spark, SF)["orders"].count()
    assert total == n_orders


def test_merge_actions_partition_key_universe(spark):
    """inserted+updated+deleted+kept covers base ∪ cdc exactly once."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_merge_upsert
    from pulsar_ingestion_spark.session import load_tables

    rows = {r["action"]: r["key_cnt"] for r in q_warehouse_merge_upsert(spark, SF).collect()}
    od = load_tables(spark, SF)["orders"]
    base_keys = od.filter(F.col("o_orderkey") % 5 != 0).select("o_orderkey")
    cdc_keys = od.filter(
        (F.col("o_orderkey") % 5 == 0)
        | (F.col("o_orderkey") % 7 == 0)
        | (F.col("o_orderkey") % 11 == 0)
    ).select("o_orderkey")
    universe = base_keys.union(cdc_keys).distinct().count()
    assert sum(rows.values()) == universe
    assert set(rows) == {"inserted", "updated", "deleted", "kept"}


def test_snapshot_diff_counts_reconcile(spark):
    """inserted+updated+unchanged == |B|; deleted+updated+unchanged == |A|."""
    from pulsar_ingestion_spark.queries_warehouse import q_table_snapshot_diff
    from pulsar_ingestion_spark.session import load_tables

    rows = {r["change_type"]: r["key_cnt"] for r in q_table_snapshot_diff(spark, SF).collect()}
    od = load_tables(spark, SF)["orders"]
    n_a = od.filter(F.col("o_orderkey") % 5 != 0).count()
    n_b = od.filter(F.col("o_orderkey") % 7 != 0).count()
    assert rows.get("inserted", 0) + rows.get("updated", 0) + rows.get("unchanged", 0) == n_b
    assert rows.get("deleted", 0) + rows.get("updated", 0) + rows.get("unchanged", 0) == n_a


def test_reservoir_exact_k_and_reproducible(spark):
    """Bottom-k sampling returns exactly k per group (groups with ≥ k
    rows) and the identical sample on re-execution."""
    from pulsar_ingestion_spark.queries_sketch import (
        _RESERVOIR_K,
        q_sample_reservoir_hash,
    )

    a = q_sample_reservoir_hash(spark, SF).collect()
    b = q_sample_reservoir_hash(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_group = {}
    for r in a:
        per_group.setdefault(r["event_type"], []).append(r["event_id"])
    for ids in per_group.values():
        assert len(ids) == _RESERVOIR_K


def test_hll_merge_dominates_groups(spark):
    """Max-merged registers can only grow: the MERGED sketch's harmonic
    state dominates every per-group sketch, so its estimate is ≥ the
    largest group estimate (union cardinality ≥ any member)."""
    from pulsar_ingestion_spark.queries_sketch import q_sketch_hll_merge

    rows = {r["scope"]: r["hll_estimate"] for r in q_sketch_hll_merge(spark, SF).collect()}
    merged = rows.pop("MERGED")
    assert merged >= max(rows.values()) - 1e-9
    # and buckets_used of MERGED >= every group's (register-wise max)


def test_hierarchy_closure_depth_matches_key_domain(spark):
    """Path depth equals the div-10 chain length of the key domain —
    no truncation from the unrolled iteration bound."""
    import math

    from pulsar_ingestion_spark.queries_warehouse import q_graph_hierarchy_closure
    from pulsar_ingestion_spark.session import load_tables

    rows = q_graph_hierarchy_closure(spark, SF).collect()
    max_depth = max(r["depth"] for r in rows)
    max_key = (
        load_tables(spark, SF)["customer"].agg(F.max("c_custkey")).collect()[0][0]
    )
    expect = 0
    k = max_key
    while k >= 10:
        k //= 10
        expect += 1
    assert max_depth == expect


def test_range_interval_includes_self(spark):
    """Every row's trailing-hour frame contains at least itself."""
    from pulsar_ingestion_spark.queries_events import q_win_range_interval_1h

    bad = q_win_range_interval_1h(spark, SF).filter(F.col("cnt_1h") < 1).count()
    assert bad == 0
