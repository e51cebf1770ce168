"""CLI (__main__) and load-generator coverage — batch mode, in-process."""

from __future__ import annotations

import json

from pulsar_ingestion_spark.__main__ import main as cli_main
from tools.loadgen import generate


def test_loadgen_deterministic(tmp_path):
    n1 = generate(str(tmp_path / "a"), "geotab", rows=200, seed=7, malformed_pct=5)
    n2 = generate(str(tmp_path / "b"), "geotab", rows=200, seed=7, malformed_pct=5)
    assert n1 == n2 == 200
    a = (tmp_path / "a" / "part-000.jsonl").read_text()
    b = (tmp_path / "b" / "part-000.jsonl").read_text()
    assert a == b  # seeded → byte-identical
    malformed = sum(1 for line in a.splitlines() if line.startswith('{"truncated"'))
    assert malformed >= 1


def test_cli_batch_run(spark, tmp_path):
    # spark fixture keeps the session warm; the CLI builds/reuses it.
    generate(str(tmp_path / "geo"), "geotab", rows=300, seed=3, malformed_pct=10)
    rc = cli_main([
        "run",
        "--pipeline", "/root/reference/deployment/pipeline.yaml",
        "--output", str(tmp_path / "out"),
        "--batch",
        "--dead-letter", str(tmp_path / "dead"),
        "--override", "geotab-translator", f"path={tmp_path}/geo",
    ])
    assert rc == 0
    out = spark.read.parquet(str(tmp_path / "out"))
    dead = spark.read.parquet(str(tmp_path / "dead"))
    assert out.count() + dead.count() == 300
    assert dead.count() >= 10  # ~10% malformed
    sample = json.loads(out.select("value").first()["value"])
    assert sample["sourceType"] == "Geotab" and sample["partitionKey"] == sample["vehicleId"]


def test_cli_no_sources_errors(tmp_path):
    rc = cli_main([
        "run",
        "--pipeline", "/root/reference/deployment/pipeline.yaml",
        "--output", str(tmp_path / "out"),
        "--batch",
    ])
    assert rc == 2  # all translator inputs skipped → actionable exit code
