"""Replay-safe streaming append sink (streaming/windows.py::
iceberg_append_sink): foreachBatch is at-least-once, the table must be
exactly-once — batch-id stamps in snapshot summaries are the ledger."""

from __future__ import annotations

import shutil

import pytest

from datafusion_iceberg_spark.iceberg.catalog import Catalog
from datafusion_iceberg_spark.streaming.windows import (
    _last_committed_batch_id,
    iceberg_append_sink,
)


@pytest.fixture()
def cat(spark, tmp_path):
    d = tmp_path / "sink_wh"
    c = Catalog(str(d), name="snk")
    c.sql(spark, "CREATE TABLE snk.s.t (k BIGINT, v BIGINT)")
    yield c
    shutil.rmtree(d, ignore_errors=True)


def _rows(spark, lo, n):
    return spark.createDataFrame(
        [(i, i * 10) for i in range(lo, lo + n)], "k long, v long"
    )


def test_replayed_batch_is_skipped(spark, cat):
    sink = iceberg_append_sink(cat, "s.t")
    sink(_rows(spark, 0, 3), 0)
    sink(_rows(spark, 3, 3), 1)
    # crash-between-commit-and-checkpoint: batch 1 re-runs verbatim
    sink(_rows(spark, 3, 3), 1)
    # ...and an older replay window re-runs batch 0 too
    sink(_rows(spark, 0, 3), 0)
    df = cat.load("s.t").to_df(spark)
    assert df.count() == 6
    assert df.groupBy("k").count().filter("count > 1").count() == 0
    assert _last_committed_batch_id(cat.load("s.t").metadata, "") == 1
    # progress resumes after the replays
    sink(_rows(spark, 6, 2), 2)
    assert cat.load("s.t").to_df(spark).count() == 8


def test_empty_batch_commits_nothing(spark, cat):
    sink = iceberg_append_sink(cat, "s.t")
    sink(_rows(spark, 0, 0), 0)
    assert _last_committed_batch_id(cat.load("s.t").metadata, "") is None
    assert cat.load("s.t").to_df(spark).count() == 0


def test_end_to_end_stream_then_replay(spark, cat, tmp_path):
    """Drive a real file-source stream through the sink, then replay its
    final batch manually: contents must not change."""
    src = tmp_path / "src"
    _rows(spark, 0, 10).write.parquet(str(src))
    sink = iceberg_append_sink(cat, "s.t")
    q = (
        spark.readStream.schema("k long, v long")
        .parquet(str(src))
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    n1 = cat.load("s.t").to_df(spark).count()
    assert n1 == 10
    last = _last_committed_batch_id(cat.load("s.t").metadata, "")
    sink(_rows(spark, 0, 10), last)  # replayed final batch
    assert cat.load("s.t").to_df(spark).count() == n1


def test_second_query_with_fresh_checkpoint_is_not_mistaken_for_replay(
    spark, cat
):
    """Batch ids restart at 0 per checkpoint: a DIFFERENT query tag must
    not have its early batches dropped by the first query's ledger."""
    a = iceberg_append_sink(cat, "s.t", query_tag="ckpt-a")
    a(_rows(spark, 0, 3), 0)
    a(_rows(spark, 3, 3), 1)
    b = iceberg_append_sink(cat, "s.t", query_tag="ckpt-b")
    b(_rows(spark, 6, 3), 0)  # batch 0 of query B: must land
    assert cat.load("s.t").to_df(spark).count() == 9
    # and each tag's OWN replays still dedup
    a(_rows(spark, 0, 3), 0)
    b(_rows(spark, 6, 3), 0)
    assert cat.load("s.t").to_df(spark).count() == 9
