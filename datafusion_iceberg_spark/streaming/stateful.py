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
