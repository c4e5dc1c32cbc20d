"""Selective binpack compaction (writer.compact_binpack): only small /
delete-laden files rewrite; right-sized files ride along verbatim."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_iceberg_spark.iceberg.catalog import Catalog


def _mk(spark, root, n_small=6):
    cat = Catalog(str(root), name="bp")
    df0 = spark.range(0, 1).select(F.col("id").alias("k"), F.col("id").alias("v"))
    cat.create_table("d.t", df0.schema)
    # one "large" file (10k rows) + n_small tiny files (5 rows each)
    cat.append(
        "d.t",
        spark,
        spark.range(100000, 110000)
        .select(F.col("id").alias("k"), F.col("id").alias("v"))
        .coalesce(1),
    )
    for i in range(n_small):
        cat.append(
            "d.t",
            spark,
            spark.range(i * 5, i * 5 + 5)
            .select(F.col("id").alias("k"), F.col("id").alias("v"))
            .coalesce(1),
        )
    return cat


def test_binpack_rewrites_only_small(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh")
    t = cat.load("d.t")
    before = {f.path: f.file_size_in_bytes for f in t.files()}
    big = max(before, key=before.get)
    n_before = t.to_df(spark).count()
    # threshold chosen so the 10k-row file counts as right-sized
    out = cat.compact_binpack(
        "d.t", spark, target_file_bytes=before[big], small_ratio=0.9
    )
    assert out["rewritten_files"] == 6
    assert out["kept_files"] == 1
    t = cat.load("d.t")
    after = {f.path for f in t.files()}
    assert big in after  # untouched file survives verbatim
    assert len(after) < len(before)
    assert t.to_df(spark).count() == n_before
    assert (
        t.to_df(spark).agg(F.sum("k")).first()[0]
        == sum(range(100000, 110000)) + sum(range(30))
    )


def test_binpack_noop_when_nothing_small(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh", n_small=1)
    t = cat.load("d.t")
    n_snaps = len(t.metadata.snapshots)
    out = cat.compact_binpack("d.t", spark, target_file_bytes=1)  # all "big"
    assert out["rewritten_files"] == 0
    t = cat.load("d.t")
    assert len(t.metadata.snapshots) == n_snaps  # no commit at all


def test_binpack_folds_outstanding_deletes(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="bp")
    df = spark.range(0, 1000).select(F.col("id").alias("k"), F.col("id").alias("v"))
    cat.create_table(
        "d.t",
        df.schema,
        properties={"write.delete.mode": "merge-on-read"},
    )
    cat.append("d.t", spark, df.coalesce(1))
    cat.sql(spark, "DELETE FROM bp.d.t WHERE k < 100")
    out = cat.compact_binpack("d.t", spark)  # file is small AND delete-laden
    assert out["rewritten_files"] == 1
    t = cat.load("d.t")
    assert t.to_df(spark).count() == 900
    assert not t.position_delete_files()  # delete debt retired
    assert t.to_df(spark).filter("k < 100").count() == 0


def test_binpack_via_call(spark, tmp_path):
    cat = _mk(spark, tmp_path / "wh")
    rows = cat.sql(
        spark, "CALL bp.system.rewrite_small_files('d.t')"
    ).collect()
    kv = {r["key"]: r["value"] for r in rows}
    # default 128 MB target: every file in this fixture is "small"
    assert kv["rewritten_files"] == "7"


def test_binpack_preserves_partitions(spark, tmp_path):
    cat = Catalog(str(tmp_path / "wh"), name="bp")
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    cat.create_table("d.t", df.schema, partition_by=["p"])
    for i in range(4):
        cat.append(
            "d.t",
            spark,
            df.filter(F.col("k").between(i * 50, i * 50 + 49)).coalesce(1),
        )
    out = cat.compact_binpack("d.t", spark)
    assert out["rewritten_files"] > 0
    t = cat.load("d.t")
    assert all(f.partition.get("p") in ("0", "1") for f in t.files())
    assert t.to_df(spark).count() == 200
