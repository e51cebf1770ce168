"""Load the reference's ``deployment/pipeline.yaml`` format into a
PipelineSpec — the migration path for a user of the reference.

The reference provisions (deployment/pipeline.yaml:1-68):
  * ``connectors``: name → {source: true, image, configRef, output: <topic>}
  * ``functions``:  name → {className, inputs: [<topics>], output} and the
    Filterer consuming the shared CMF topic with dynamic outputs.

Mapping rules:
  * connector name/image infers the source kind (kinesis/kafka/
    azure-eventhub/rabbitmq/http/grpc/pulsar) — each becomes a
    SourceSpec whose Spark connector options come from ``overrides``
    (the configRef files hold broker endpoints, which don't apply to a
    local run; overrides supply e.g. a jsonl path or kafka bootstrap);
  * a function whose className ends in <X>Translator consumes the topics
    produced by connectors → pairs (connector kind, translator);
  * the Filterer function marks the routing stage (always present in
    run_pipeline: extract tenant → drop unroutable → partitioned sink).
"""

from __future__ import annotations

from typing import Any

import yaml

from pulsar_ingestion_spark.plans.pipeline import PipelineSpec, SourceSpec

_KIND_HINTS = ("kinesis", "kafka", "azure-eventhub", "rabbitmq", "http", "grpc", "pulsar")

_TRANSLATOR_CLASSES = {
    "geotabtranslator": "geotab",
    "calamptranslator": "calamp",
    "fordtranslator": "ford",
}

# pulsar is a real passthrough kind since round 10 (format("pulsar") via
# sources/registry.py) — a `path` override below still degrades any kind
# to the jsonl bridge for broker-less runs.
_KIND_ALIASES = {"azure-eventhub": "eventhub"}


def _infer_kind(name: str, image: str) -> str:
    for hint in _KIND_HINTS:
        if hint in name or hint in (image or ""):
            return _KIND_ALIASES.get(hint, hint)
    return "jsonl"


def load_pipeline_yaml(
    path: str,
    output_path: str,
    checkpoint: str | None = None,
    overrides: dict[str, dict[str, Any]] | None = None,
    dead_letter_path: str | None = None,
) -> PipelineSpec:
    """Parse a reference-format pipeline.yaml into a PipelineSpec.

    ``overrides[connector_name]`` supplies the Spark source options for
    that connector (path=... for file-backed kinds, kafka options for
    kafka/eventhub).  Connectors without overrides AND without a usable
    local default are skipped with the skip recorded in
    ``spec_skipped`` (mirrors the reference's own stub connectors, e.g.
    the source-less gRPC module).
    """
    overrides = overrides or {}
    with open(path) as fh:
        doc = yaml.safe_load(fh)

    tenant = doc.get("tenant", "acme")
    topic_to_kind: dict[str, str] = {}
    topic_to_connector: dict[str, str] = {}
    for cname, cfg in (doc.get("connectors") or {}).items():
        if not cfg.get("source"):
            continue
        out_topic = cfg.get("output")
        if out_topic:
            topic_to_kind[out_topic] = _infer_kind(cname.lower(), str(cfg.get("image", "")).lower())
            topic_to_connector[out_topic] = cname

    sources: list[SourceSpec] = []
    skipped: list[str] = []
    for fname, cfg in (doc.get("functions") or {}).items():
        cls = str(cfg.get("className", "")).rsplit(".", 1)[-1].lower()
        translator = _TRANSLATOR_CLASSES.get(cls)
        if translator is None:
            continue  # the Filterer / unknown functions — routing is built in
        inputs = cfg.get("inputs") or ([cfg["input"]] if "input" in cfg else [])
        for topic in inputs:
            kind = topic_to_kind.get(topic, "jsonl")
            # override lookup order: function name, topic, CONNECTOR name
            # (the docstring's primary contract)
            opts = (
                overrides.get(fname)
                or overrides.get(topic)
                or overrides.get(topic_to_connector.get(topic, ""))
                or {}
            )
            if not opts and kind not in ("rate",):
                skipped.append(f"{fname}:{topic} (kind={kind}, no local options)")
                continue
            # a local `path` override = the bridge-drop pattern: JSON lines
            # on disk stand in for the broker regardless of connector kind
            if "path" in opts and kind not in ("jsonl", "parquet", "csv", "json"):
                kind = "jsonl"
            sources.append(SourceSpec(kind=kind, translator=translator, options=opts, tenant=tenant))

    spec = PipelineSpec(
        sources=sources,
        output_path=output_path,
        checkpoint=checkpoint,
        dead_letter_path=dead_letter_path,
    )
    spec.skipped = skipped  # type: ignore[attr-defined]
    return spec
