"""Versioned-table (manifest) layer: snapshot isolation, time travel,
rollback, CAS commit races, and vacuum safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_ingestion_spark.operators.versioned import CommitConflict, VersionedTable


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").cast("long").alias("id"))


def test_append_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    v0 = t.append(_df(spark, 0, 10))
    v1 = t.append(_df(spark, 10, 30))
    assert (v0, v1) == (0, 1)
    assert t.read(spark, 0).count() == 10
    assert t.read(spark, 1).count() == 30
    assert t.read(spark).count() == 30  # latest
    assert t.describe(1).parent == 0


def test_overwrite_keeps_history(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))
    t.overwrite(_df(spark, 100, 105))
    assert t.read(spark).count() == 5
    assert t.read(spark, 0).count() == 10  # old snapshot intact
    assert t.describe().op == "overwrite"


def test_rollback_is_append_only(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))
    t.overwrite(_df(spark, 0, 3))
    v = t.rollback(0)
    assert v == 2
    assert t.read(spark).count() == 10
    assert t.versions() == [0, 1, 2]  # history never truncated


def test_snapshot_isolation_while_writing(spark, tmp_path):
    """Files staged by an in-flight write are invisible until the
    manifest commits."""
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))
    staged = t._write_files(_df(spark, 10, 20))  # staged, NOT committed
    assert staged
    assert t.read(spark).count() == 10  # reader still sees v0 only
    t._commit("append", t.describe().files + staged)
    assert t.read(spark).count() == 20


def test_commit_race_cas(spark, tmp_path):
    """A racer claiming the next slot forces the retry path; with
    retries exhausted a CommitConflict surfaces."""
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 5))
    # racer steals slot 1 directly
    racer_files = t._write_files(_df(spark, 5, 8))
    t._commit("append", t.describe().files + racer_files)
    # append still succeeds by retrying into slot 2
    t.append(_df(spark, 8, 10))
    assert t.current_version() == 2
    assert t.read(spark).count() == 10
    # simulate a stale snapshot of current_version (the racer committed
    # between our read and our link): with one retry, conflict surfaces
    stale = t.current_version() - 1
    t.current_version = lambda: stale  # type: ignore[method-assign]
    with pytest.raises(CommitConflict):
        t._commit("append", [], max_retries=1)


def test_vacuum_keeps_reachable_only(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))      # v0
    t.overwrite(_df(spark, 0, 5))    # v1 — v0's files now unreachable from v1+
    t.append(_df(spark, 5, 9))       # v2
    removed = t.vacuum(keep_last=2)
    assert removed  # v0's exclusive files were deleted
    assert t.versions() == [1, 2]
    assert t.read(spark, 2).count() == 9
    assert t.read(spark, 1).count() == 5
    with pytest.raises(FileNotFoundError):
        t.describe(0)


def test_vacuum_never_breaks_retained_versions(spark, tmp_path):
    """Files shared between retained and expired versions survive."""
    t = VersionedTable(str(tmp_path / "t"))
    t.append(_df(spark, 0, 10))      # v0
    t.append(_df(spark, 10, 12))     # v1 shares v0's files
    t.append(_df(spark, 12, 15))     # v2 shares v0+v1's files
    t.vacuum(keep_last=2)            # drops manifest v0 only
    assert t.read(spark, 1).count() == 12
    assert t.read(spark, 2).count() == 15


def test_stream_committer_idempotent_per_batch(spark, tmp_path):
    """A replayed foreachBatch call (same batch_id) must be a no-op —
    the exactly-once contract on top of streaming's at-least-once
    replay."""
    t = VersionedTable(str(tmp_path / "t"))
    commit = t.stream_batch_committer()
    commit(_df(spark, 0, 10), 0)
    commit(_df(spark, 10, 15), 1)
    assert t.read(spark).count() == 15
    commit(_df(spark, 10, 15), 1)  # replay of batch 1
    commit(_df(spark, 0, 10), 0)   # stale replay of batch 0
    assert t.read(spark).count() == 15
    assert t.committed_batch_ids() == {0, 1}
    assert t.describe().op == "stream-append"


def test_stream_committer_end_to_end_with_restart(spark, tmp_path):
    """File-source stream → versioned sink; a restart from the same
    checkpoint (which replays or no-ops depending on commit-log state)
    never duplicates rows."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.jsonl").write_text(
        "\n".join(_json.dumps({"k": i}) for i in range(20)) + "\n"
    )
    t = VersionedTable(str(tmp_path / "t"))
    stream = (
        spark.readStream.schema("k long").json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(t.stream_batch_committer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert t.read(spark).count() == 20
    # restart on the same checkpoint — no new data, no duplicates
    q2 = (
        stream.writeStream.foreachBatch(t.stream_batch_committer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert t.read(spark).count() == 20
    # new file lands → exactly the new rows appear, as a new version
    (src / "b.jsonl").write_text(
        "\n".join(_json.dumps({"k": i}) for i in range(20, 25)) + "\n"
    )
    q3 = (
        stream.writeStream.foreachBatch(t.stream_batch_committer())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(120)
    assert t.read(spark).count() == 25


def test_versioned_model_based_random_ops(spark, tmp_path):
    """Model-based check: a random (seeded, deterministic) sequence of
    append/overwrite/rollback ops against an in-memory model — after
    every op, every retained version's row multiset matches the model."""
    import random

    rng = random.Random(42)
    t = VersionedTable(str(tmp_path / "t"))
    model: list[set[int]] = []  # model[v] = expected row ids of version v
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        rows = set(range(next_id, next_id + n))
        next_id += n
        return rows

    for _ in range(12):
        op = rng.choice(["append", "append", "overwrite", "rollback"])
        if op == "rollback" and not model:
            op = "append"
        if op == "append":
            rows = fresh_rows(rng.randint(1, 5))
            df = spark.createDataFrame([(i,) for i in sorted(rows)], "id long")
            t.append(df)
            model.append((model[-1] if model else set()) | rows)
        elif op == "overwrite":
            rows = fresh_rows(rng.randint(1, 5))
            df = spark.createDataFrame([(i,) for i in sorted(rows)], "id long")
            t.overwrite(df)
            model.append(rows)
        else:
            target = rng.randrange(len(model))
            t.rollback(target)
            model.append(model[target])
        # invariant: every retained version matches the model exactly
        for v in t.versions():
            got = {r["id"] for r in t.read(spark, v).collect()}
            assert got == model[v], (v, got, model[v])
    assert t.current_version() == len(model) - 1


def test_pipeline_versioned_sink_end_to_end(spark, tmp_path):
    """The CLI/pipeline surface lands CMF output into a VersionedTable
    when sink_mode='versioned': rows arrive exactly once, the manifest
    history records the stream batches, and a checkpoint restart adds
    nothing."""
    import json as _json

    from pulsar_ingestion_spark.plans.pipeline import (
        PipelineSpec,
        SourceSpec,
        run_pipeline,
    )

    src = tmp_path / "geo"
    src.mkdir()
    rows = [
        {
            "Device_ID": f"d{i}", "Vehicle_ID": f"v{i % 3}",
            "Record_DateTime": "2024-02-02T08:00:%02dZ" % (i % 60),
            "Latitude": 1.0 + i, "Longitude": 6.0,
        }
        for i in range(10)
    ]
    (src / "a.jsonl").write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    spec = PipelineSpec(
        sources=[SourceSpec(kind="jsonl", translator="geotab",
                            options={"path": str(src)}, tenant="t-ver")],
        output_path=str(tmp_path / "table"),
        checkpoint=str(tmp_path / "ckpt"),
        sink_mode="versioned",
    )
    q = run_pipeline(spark, spec, streaming=True)
    q.awaitTermination(120)
    t = VersionedTable(str(tmp_path / "table"))
    out = t.read(spark)
    assert out.count() == 10
    assert out.select("tenantId").distinct().collect()[0][0] == "t-ver"
    assert t.describe().op == "stream-append"
    # restart on the same checkpoint: no duplicates, no new version rows
    v_before = t.current_version()
    q2 = run_pipeline(spark, spec, streaming=True)
    q2.awaitTermination(120)
    assert t.read(spark).count() == 10
    assert t.current_version() in (v_before, v_before + 1)  # empty replay may commit nothing
