"""Semantic invariants of the round-6 warehouse-depth queries (BOM
explosion over an edge table, MERGE with windowed conflict resolution)
— properties the oracle hash can't see failing for the RIGHT reason,
checked at sf0.001 on the shared session."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


def test_bom_rollup_matches_bruteforce_path_products(spark):
    """The frontier-join closure equals a naive Python walk of the edge
    forest: per root, the same path count, distinct-component count,
    quantity-weighted total (product of qty-per down each path), and
    max depth."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_bom_rollup
    from pulsar_ingestion_spark.session import load_tables

    got = {
        r["root_key"]: (r["n_paths"], r["n_components"], r["total_qty"], r["max_depth"])
        for r in q_warehouse_bom_rollup(spark, SF).collect()
    }

    keys = [
        r["p_partkey"]
        for r in load_tables(spark, SF)["part"].select("p_partkey").collect()
    ]
    present = set(keys)
    # brute force: walk each component's ancestor chain, multiplying qty
    expect: dict[int, list] = {}
    for k in keys:
        if k < 10:
            continue
        node, ext, depth = k, 1, 0
        # an edge exists for every PRESENT child key >= 10; a maximal
        # path reaches a root only if no intermediate child is missing
        while node >= 10 and node in present:
            ext *= node % 3 + 1
            node, depth = node // 10, depth + 1
        if node < 10:
            expect.setdefault(node, []).append((k, ext, depth))
    for root, paths in expect.items():
        n_paths = len(paths)
        n_components = len({c for c, _, _ in paths})
        total_qty = sum(e for _, e, _ in paths)
        max_depth = max(d for _, _, d in paths)
        assert got[root] == (n_paths, n_components, total_qty, max_depth), root
    assert set(got) == set(expect)


def test_bom_rollup_closure_only_counts_root_paths(spark):
    """Path totals grow with the closure, not the raw edge count: every
    component with key >= 10 reaches exactly one root, so Σ n_paths over
    roots equals the number of components (each contributes ONE maximal
    path; intermediate paths are filtered by assembly < 10)."""
    from pulsar_ingestion_spark.queries_warehouse import q_warehouse_bom_rollup
    from pulsar_ingestion_spark.session import load_tables

    rows = q_warehouse_bom_rollup(spark, SF).collect()
    n_parts = (
        load_tables(spark, SF)["part"].filter(F.col("p_partkey") >= 10).count()
    )
    assert sum(r["n_paths"] for r in rows) == n_parts


def test_merge_resolve_collapses_to_one_row_per_key(spark):
    """The windowed resolution stage emits exactly one winner per order
    key, and the audit's src_rows column accounts for every CDC row."""
    from pulsar_ingestion_spark.queries_warehouse import (
        q_warehouse_merge_resolve_conflicts,
    )
    from pulsar_ingestion_spark.session import load_tables

    rows = {r["action"]: r for r in q_warehouse_merge_resolve_conflicts(spark, SF).collect()}
    li = load_tables(spark, SF)["lineitem"]
    od = load_tables(spark, SF)["orders"]
    n_cdc_rows = li.count()
    n_cdc_keys = li.select("l_orderkey").distinct().count()
    n_base = od.filter(F.col("o_orderkey") % 3 != 0).count()

    # every action except 'kept' consumed exactly one resolved winner per key
    resolved_keys = sum(
        rows[a]["key_cnt"] for a in rows if a != "kept"
    )
    assert resolved_keys == n_cdc_keys
    # src_rows sums the collapsed versions — all CDC rows accounted for
    assert sum(rows[a]["src_rows"] or 0 for a in rows) == n_cdc_rows
    # kept + matched actions tile the base exactly
    matched = sum(
        rows[a]["key_cnt"] for a in rows if a in ("updated", "deleted")
    )
    assert rows["kept"]["key_cnt"] + matched == n_base
    # kept rows carry no CDC provenance
    assert rows["kept"]["src_rows"] is None


def test_merge_resolve_winner_is_deterministic(spark):
    """Running the query twice yields identical audits (the tie-break
    order is total, so shuffle nondeterminism cannot flip winners)."""
    from pulsar_ingestion_spark.queries_warehouse import (
        q_warehouse_merge_resolve_conflicts,
    )

    a = sorted(map(tuple, q_warehouse_merge_resolve_conflicts(spark, SF).collect()))
    b = sorted(map(tuple, q_warehouse_merge_resolve_conflicts(spark, SF).collect()))
    assert a == b
