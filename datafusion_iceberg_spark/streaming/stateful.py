"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2B guidance for operators Spark lacks natively).

Implements a per-user running aggregate (event count, max value, last
event time) maintained in explicit GroupState — the template for any
bespoke stateful operator (CDC compaction, dedup-with-TTL, anomaly
flagging).  State size is O(active users); rows stream through in Arrow
batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.streaming.windows import _events_stream, run_stream

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, max_value double"
STATE_SCHEMA = "n bigint, mx double"


def _update_user_state(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, mx = state.get if state.exists else (0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, mx))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "max_value": [mx]}
    )


@register(
    "stream_stateful_running_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, MAX(value) AS max_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_stateful_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator: explicit GroupState per user.  With the
    whole table as one batch the final state equals the global aggregate,
    so the query is oracle-checkable."""
    stream, _ = _events_stream(spark, sf_dir)
    updated = (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return run_stream(updated, "stateful", mode="update").orderBy("user_id")


# ---------------------------------------------------------------------------
# Streaming dedup — the training-pipeline op as a stateful stream
# ---------------------------------------------------------------------------

DEDUP_OUTPUT = "user_id bigint, event_type string, n_kept bigint"
DEDUP_STATE = "seen array<string>"


def _dedup_user_events(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Keep the first occurrence of each (event_type) per user; state =
    the set of types already seen.  The template for streaming exact
    dedup: state is the seen-key set (bounded by a TTL in production —
    GroupStateTimeout.ProcessingTimeTimeout — so memory is O(recent keys),
    here unbounded because the drive-to-completion harness is finite)."""
    (user_id,) = key
    seen = set(state.get[0]) if state.exists else set()
    kept: dict[str, int] = {}
    for pdf in pdfs:
        for et in pdf["event_type"]:
            if et not in seen:
                seen.add(et)
                kept[et] = kept.get(et, 0) + 1
    state.update((sorted(seen),))
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(kept),
            "event_type": list(kept),
            "n_kept": list(kept.values()),
        }
    )


@register(
    "stream_dedup_stateful",
    oracle="""
    SELECT user_id, COUNT(DISTINCT event_type) AS n_first_seen
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def stream_dedup_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup via explicit GroupState: each user's stream
    keeps only first-seen event types.  Driven to completion, the number
    of kept rows per user equals COUNT(DISTINCT event_type) — the oracle
    the batch engine can check."""
    stream, _ = _events_stream(spark, sf_dir)
    deduped = (
        stream.select("user_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _dedup_user_events,
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    sink = run_stream(deduped, "stream_dedup", mode="update")
    # countDistinct, not count(*): with a multi-file source a user's group
    # can emit in several micro-batches and the update sink keeps all rows
    return (
        sink.groupBy("user_id")
        .agg(F.countDistinct("event_type").alias("n_first_seen"))
        .orderBy("user_id")
    )
