"""Custom stateful streaming operator: ignition ON→OFF/OFF→ON transition
detection per vehicle (the gap/transition analytics the CMF model implies —
SURVEY.md §2.5 stream_stateful_flatmap).

Streaming path: ``applyInPandasWithState`` keeps one tiny state row per
vehicle (last status + last event time), emitting a row per observed
transition.  Arrow-batched per group — the sanctioned custom-state escape
hatch when built-ins can't express the semantics.

Batch path: identical semantics via lag() over a window — used by tests to
cross-check the streaming output (same input ⇒ same transitions).

Scale: state is O(#vehicles) (bytes each), partitioned by vehicle key;
watermark-driven timeout (GroupStateTimeout.EventTimeTimeout) would evict
retired vehicles in production.

API note: Spark 4's successor API (transformWithStateInPandas /
StatefulProcessor) requires a working protobuf runtime, which this
environment lacks (`ImportError: cannot import name 'descriptor' from
google.protobuf` at query start) — applyInPandasWithState is the
supported path here and remains fully supported upstream.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

TRANSITION_SCHEMA = StructType([
    StructField("vehicle_id", StringType()),
    StructField("from_status", StringType()),
    StructField("to_status", StringType()),
    StructField("at_epoch_ms", LongType()),
])

_STATE_SCHEMA = StructType([
    StructField("last_status", StringType()),
    StructField("last_epoch_ms", LongType()),
])


def _detect_transitions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (vehicle_id,) = key
    if state.exists:
        last_status, last_ms = state.get
    else:
        last_status, last_ms = None, None
    # Arrow may deliver one group as MULTIPLE chunks: concat + sort ONCE
    # globally — sorting per chunk would interleave event time across
    # chunks and emit phantom transitions.
    chunks = [pdf for pdf in pdfs]
    merged = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
    sort_cols = ["epoch_ms"] + (["tiebreak"] if "tiebreak" in merged.columns else [])
    merged = merged.sort_values(sort_cols)
    rows: list[dict[str, Any]] = []
    for status, ms in zip(merged["status"], merged["epoch_ms"]):
        if last_status is not None and status != last_status:
            rows.append(
                {
                    "vehicle_id": vehicle_id,
                    "from_status": last_status,
                    "to_status": status,
                    "at_epoch_ms": int(ms),
                }
            )
        last_status, last_ms = status, int(ms)
    state.update((last_status, last_ms))
    yield pd.DataFrame(rows, columns=[f.name for f in TRANSITION_SCHEMA.fields])


def ignition_transitions(
    df: DataFrame,
    key_col: str = "vehicle_id",
    status_col: str = "status",
    ts_col: str = "epoch_ms",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Emit one row per status transition per vehicle.

    Input: any DataFrame with (vehicle key, status string, epoch-ms long).
    Streaming input → applyInPandasWithState; batch input → lag() window
    (same output, no state store needed).

    ``tiebreak_col``: optional unique secondary ordering column — REQUIRED
    for deterministic output when two events of one vehicle can share an
    epoch_ms (ordering ties are otherwise engine/run-dependent).
    """
    cols = [
        F.col(key_col).alias("vehicle_id"),
        F.col(status_col).alias("status"),
        F.col(ts_col).cast("long").alias("epoch_ms"),
    ]
    order_cols = ["epoch_ms"]
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col).alias("tiebreak"))
        order_cols.append("tiebreak")
    normalized = df.select(*cols)
    if normalized.isStreaming:
        return (
            normalized.groupBy("vehicle_id")
            .applyInPandasWithState(
                _detect_transitions,
                outputStructType=TRANSITION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )
    w = Window.partitionBy("vehicle_id").orderBy(*order_cols)
    prev = F.lag("status").over(w)
    return (
        normalized.withColumn("from_status", prev)
        .filter(F.col("from_status").isNotNull() & (F.col("from_status") != F.col("status")))
        .select(
            "vehicle_id",
            "from_status",
            F.col("status").alias("to_status"),
            F.col("epoch_ms").alias("at_epoch_ms"),
        )
    )
