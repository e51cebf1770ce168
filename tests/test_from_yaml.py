"""pipeline.yaml (reference format) → PipelineSpec loader."""

from __future__ import annotations

import json

from pulsar_ingestion_spark.plans.from_yaml import load_pipeline_yaml
from pulsar_ingestion_spark.plans.pipeline import run_pipeline

REFERENCE_YAML = "/root/reference/deployment/pipeline.yaml"


def test_load_reference_pipeline_yaml(tmp_path):
    spec = load_pipeline_yaml(
        REFERENCE_YAML,
        output_path=str(tmp_path / "out"),
        overrides={
            "geotab-translator": {"path": str(tmp_path / "g")},
            "calamp-translator": {"path": str(tmp_path / "c")},
            "ford-translator": {"path": str(tmp_path / "f")},
        },
    )
    got = {(s.kind, s.translator, s.tenant) for s in spec.sources}
    # kinesis/kafka/http connectors collapse to the local jsonl bridge
    assert got == {
        ("jsonl", "geotab", "acme"),
        ("jsonl", "calamp", "acme"),
        ("jsonl", "ford", "acme"),
    }
    assert spec.skipped == []  # all three translator inputs had overrides


def test_override_by_connector_name(tmp_path):
    # the documented primary contract: overrides[connector_name]
    spec = load_pipeline_yaml(
        REFERENCE_YAML,
        output_path=str(tmp_path / "out"),
        overrides={"kinesis-input": {"path": str(tmp_path / "k")}},
    )
    assert [(s.kind, s.translator) for s in spec.sources] == [("jsonl", "geotab")]


def test_yaml_pipeline_batch_run(spark, tmp_path):
    (tmp_path / "g").mkdir()
    (tmp_path / "g" / "a.jsonl").write_text(
        json.dumps({
            "Device_ID": "d1", "Vehicle_ID": "v1",
            "Record_DateTime": "2024-05-05T05:00:00.000Z",
            "Latitude": 1.0, "Longitude": 2.0,
        }) + "\n"
    )
    spec = load_pipeline_yaml(
        REFERENCE_YAML,
        output_path=str(tmp_path / "out"),
        overrides={"geotab-translator": {"path": str(tmp_path / "g")}},
    )
    assert len(spec.sources) == 1 and len(spec.skipped) == 2
    run_pipeline(spark, spec, streaming=False)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 1
    assert out.first()["tenantId"] == "acme"
