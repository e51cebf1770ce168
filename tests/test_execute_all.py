"""Execute EVERY registered query at sf0.001 — the never-run-code gate.

VERDICT r3: ``sketch_bloom_build`` shipped in an end-of-round snapshot
without ever being executed and crashed at plan construction
(``F.shiftleft`` handed a Column bit count).  This test makes that
impossible to repeat: one parametrized case per registry entry, each
asserting the query plans, runs, and returns a driver-safe result
(≥0 rows, no array/map/struct output columns — the driver's hasher
rejects those).

Correctness-vs-oracle lives in ``tools/selfcheck.py`` and the driver's
CORRECTNESS gate; this test only guarantees *executability*, so it
limits each result to a handful of rows to stay fast.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pulsar_ingestion_spark.registry import QUERIES

_IDS = sorted(QUERIES)


def test_registry_matches_entry():
    assert set(entrymod.queries()) == set(QUERIES)


@pytest.mark.parametrize("name", _IDS)
def test_query_executes(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    # schema must be resolvable and driver-hashable (no nested types)
    for f in df.schema.fields:
        kind = f.dataType.typeName()
        assert kind not in {"array", "map", "struct"}, (
            f"{name}: output column {f.name!r} is {kind}-typed — the driver "
            "hasher rejects nested values; serialize via array_join/to_json"
        )
    rows = df.limit(5).collect()
    assert rows is not None
