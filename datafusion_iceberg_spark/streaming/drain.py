"""``Trigger.AvailableNow`` drain loop for rate-limited Iceberg streams.

pyspark's Python DataSource stream wrapper has no
``SupportsTriggerAvailableNow`` hook, so an ``availableNow=True`` run over
``iceberg_py`` captures ONE ``latestOffset()`` as the run's target.  With a
rate cap (``max_files_per_batch`` / ``max_snapshots_per_batch``) that
target is a single capped window — the run drains one window and stops,
instead of looping to caught-up the way Iceberg-Spark's JVM source
composes ``streaming-max-files-per-micro-batch`` with availableNow
(measured r11; VERDICT r11 "What's missing" #1).

:func:`drain_available_now` closes the behavioral gap without the missing
API hook: it re-runs capped availableNow windows FROM THE SAME CHECKPOINT
until the committed offset reaches the snapshot head captured at entry —
exactly the scheduled-job "process everything available now, in bounded
batches, then exit" contract.  Each round is a complete
start/awaitTermination/cleanup cycle, so a crash between rounds loses
nothing: the checkpoint carries the offsets, and re-invoking the helper
resumes where it stopped.

Scale note: rounds are METADATA-bounded — each replans only the file diff
of its capped window, so a 10⁴-file backlog at cap 50 runs 200 bounded
batches whose union covers every file exactly once (the per-file offset
math is the stream reader's, unchanged — this helper only schedules runs).
"""

from __future__ import annotations

import json
import os

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


def _last_committed_offset(checkpoint: str) -> Optional[tuple]:
    """(ordinal, file) of the newest COMMITTED micro-batch in the
    checkpoint, or None before the first commit.  Structured Streaming
    writes ``offsets/<batchId>`` ahead of the batch and ``commits/<batchId>``
    after it; only the committed pair counts as consumed."""
    cdir = os.path.join(checkpoint, "commits")
    odir = os.path.join(checkpoint, "offsets")
    try:
        done = [int(f) for f in os.listdir(cdir) if f.isdigit()]
    except OSError:
        return None
    if not done:
        return None
    with open(os.path.join(odir, str(max(done)))) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    # file layout: "v1" header, stream-metadata JSON, then one offset
    # line per source (we have exactly one).  Python DataSource offsets
    # are the reader's dict, JSON-encoded — sometimes nested as a JSON
    # string inside the line, so decode up to twice.
    off = lines[-1]
    for _ in range(2):
        try:
            off = json.loads(off)
        except (TypeError, ValueError):
            break
        if isinstance(off, dict):
            return (int(off["ordinal"]), int(off.get("file", 0)))
    return None


def drain_available_now(
    spark: SparkSession,
    path: str,
    checkpoint: str,
    *,
    options: Optional[dict] = None,
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
    foreach_batch: Optional[Callable] = None,
    sink_format: Optional[str] = None,
    sink_path: Optional[str] = None,
    output_mode: str = "append",
    max_rounds: int = 10_000,
    round_timeout_s: float = 600.0,
) -> dict:
    """Run capped ``availableNow`` windows from ``checkpoint`` until the
    stream has consumed every snapshot committed to the Iceberg table at
    ``path`` as of THIS call (later commits are left for the next
    invocation — availableNow semantics).

    ``options`` are passed to the ``iceberg_py`` reader (typically
    ``max_files_per_batch`` or ``max_snapshots_per_batch``); ``transform``
    maps the streaming frame before the sink; the sink is either
    ``foreach_batch`` or ``sink_format``+``sink_path``.

    Returns ``{"rounds", "caught_up", "head_ordinal", "final_offset"}``.
    Raises RuntimeError if a round makes no offset progress while behind
    (a wedged source must not spin forever) or exceeds
    ``round_timeout_s``.
    """
    from datafusion_iceberg_spark.iceberg.table import IcebergTable
    from datafusion_iceberg_spark.sources.iceberg_datasource import (
        register_iceberg_datasource,
    )

    if (foreach_batch is None) == (sink_format is None):
        raise ValueError(
            "exactly one of foreach_batch or sink_format/sink_path"
        )
    register_iceberg_datasource(spark)
    ords = IcebergTable.load(path).metadata.snapshot_ordinals()
    head = max(ords.values()) if ords else -1
    rounds = 0
    off = _last_committed_offset(checkpoint)
    while rounds < max_rounds:
        if off is not None and off[0] >= head:
            # file > 0 cannot outlive ordinal == head: a partial offset
            # always points INTO snapshot ordinal+1
            break
        if head < 0:
            break  # empty table: nothing is "available now"
        reader = spark.readStream.format("iceberg_py").option("path", path)
        for k, v in (options or {}).items():
            reader = reader.option(k, str(v))
        df = reader.load()
        if transform is not None:
            df = transform(df)
        writer = (
            df.writeStream.option("checkpointLocation", checkpoint)
            .outputMode(output_mode)
            .trigger(availableNow=True)
        )
        if foreach_batch is not None:
            q = writer.foreachBatch(foreach_batch).start()
        else:
            q = writer.format(sink_format).start(path=sink_path)
        try:
            if not q.awaitTermination(round_timeout_s):
                raise RuntimeError(
                    f"drain_available_now: round {rounds} exceeded "
                    f"{round_timeout_s}s"
                )
        finally:
            if q.isActive:
                q.stop()
        rounds += 1
        new_off = _last_committed_offset(checkpoint)
        if new_off == off and (off is None or off[0] < head):
            raise RuntimeError(
                f"drain_available_now: no offset progress in round "
                f"{rounds} (offset={off}, head ordinal={head})"
            )
        off = new_off
    return {
        "rounds": rounds,
        "caught_up": head < 0 or (off is not None and off[0] >= head),
        "head_ordinal": head,
        "final_offset": off,
    }
