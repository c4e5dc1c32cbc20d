"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on wholesale: pipelines carve
reproducible subsets (ablation slices, eval holdouts, per-source
mixtures).  Random sampling (``df.sample``) is non-reproducible across
runs/partitionings, so everything here keys on a STABLE HASH of the
record id: re-running the pipeline — or re-running it on twice the
cluster — selects the same rows.  The hash is the first 4 hex chars of
md5 (16 bits, 65536 buckets), portable between Spark (``conv``) and the
DuckDB oracles (``('0x' || substr(md5(..),1,4))::INT``).

Scale shapes:
- hash-fraction and mixture sampling are pure map-side filters — no
  shuffle at all, fully pushed into the scan pipeline;
- exact-k stratified sampling is one hash-partitioned window (shuffle
  carries only (group, hash, id), never the payload) — same shape as
  top-k-per-group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import window as W

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.session import local_df
from datafusion_iceberg_spark.tables import load_table


def hash_bucket(col, buckets: int = 100):
    """Stable per-row bucket in [0, buckets): 16-bit md5 prefix mod n.
    Deterministic across runs, partitionings, and engines."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % F.lit(buckets)
    )


def _sql_bucket(expr: str, buckets: int = 100) -> str:
    return f"(('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 4))::INT % {buckets})"


def sample_fraction(df: DataFrame, key: str, pct: int) -> DataFrame:
    """Keep ~pct% of rows, deterministically, by id-hash threshold."""
    return df.filter(hash_bucket(F.col(key)) < pct)


def sample_stratified_exact(
    df: DataFrame, group: str, key: str, k: int
) -> DataFrame:
    """Exactly min(k, group size) rows per group, chosen by hash rank
    (ties broken by key) — a reproducible 'k docs per source' slice."""
    w = W.Window.partitionBy(group).orderBy(
        hash_bucket(F.col(key), 1 << 16), F.col(key)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def sample_mixture(
    df: DataFrame, group: str, key: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-group keep-fractions (domain mixture reweighting): groups
    absent from ``fractions`` are dropped.  Map-side only."""
    frac = F.lit(None).cast("double")
    expr = None
    for g, p in sorted(fractions.items()):
        cond = F.col(group) == g
        expr = F.when(cond, F.lit(p)) if expr is None else expr.when(cond, F.lit(p))
    frac = expr.otherwise(F.lit(0.0))
    return df.filter(
        hash_bucket(F.col(key), 10000) < (frac * 10000).cast("int")
    )


@register(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, source FROM documents
    WHERE {_sql_bucket('doc_id')} < 37
    ORDER BY doc_id
    """,
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~37% reproducible sample of the corpus — a pure map-side filter
    (no shuffle; the predicate rides the parquet scan)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        sample_fraction(docs, "doc_id", 37)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


@register(
    "sample_stratified_exact",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {_sql_bucket('doc_id', 1 << 16)}, doc_id
             ) AS rk
      FROM documents
    )
    SELECT source, doc_id FROM ranked WHERE rk <= 5
    ORDER BY source, doc_id
    """,
)
def _gate_sample_stratified_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 5 docs per source, hash-ranked: the reproducible
    'inspection slice' every curation loop needs.  Shuffle carries only
    (source, hash, doc_id).  Delegates to the library helper
    ``sample_stratified_exact(df, group, key, k)`` above (which this gate
    previously shadowed by redefining the public name)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        sample_stratified_exact(docs, "source", "doc_id", 5)
        .select("source", "doc_id")
        .orderBy("source", "doc_id")
    )


@register(
    "sample_mixture_weights",
    oracle=f"""
    SELECT source, COUNT(*) AS n_kept
    FROM documents
    WHERE {_sql_bucket('doc_id', 10000)} < CAST(
      CASE source
        WHEN 'src0' THEN 0.80 WHEN 'src1' THEN 0.50 WHEN 'src2' THEN 0.25
        ELSE 0.0 END * 10000 AS INT)
    GROUP BY source ORDER BY source
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixture reweighting: keep 80% of src0, 50% of src1, 25% of
    src2, drop the rest — deterministic per-group hash thresholds, zero
    shuffle before the verification count."""
    docs = load_table(spark, sf_dir, "documents")
    kept = sample_mixture(
        docs, "source", "doc_id", {"src0": 0.80, "src1": 0.50, "src2": 0.25}
    )
    return (
        kept.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Column profiling (data-quality pass)
# ---------------------------------------------------------------------------


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile — rows, exact distinct, nulls, min, max — for N
    columns in ONE scan: all aggregates compute in a single pass and the
    wide row unpivots map-side (stack), instead of N separate table
    scans.  The corpus-health dashboard query at 100 TB."""
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.min(F.col(c).cast("double")).alias(f"{c}__min"),
            F.max(F.col(c).cast("double")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__n`, `{c}__nd`, `{c}__nulls`, `{c}__min`, `{c}__max`"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack})"
            " AS (col, n_rows, n_distinct, n_nulls, vmin, vmax)"
        )
    ).orderBy("col")


@register(
    "profile_lineitem_columns",
    oracle="""
    SELECT * FROM (
      SELECT 'l_discount' AS col, COUNT(*) AS n_rows,
             COUNT(DISTINCT l_discount) AS n_distinct,
             CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             MIN(l_discount) AS vmin, MAX(l_discount) AS vmax FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', COUNT(*), COUNT(DISTINCT l_extendedprice),
             CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             MIN(l_extendedprice), MAX(l_extendedprice) FROM lineitem
      UNION ALL
      SELECT 'l_quantity', COUNT(*), COUNT(DISTINCT l_quantity),
             CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             MIN(l_quantity), MAX(l_quantity) FROM lineitem
    ) ORDER BY col
    """,
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-scan profile of three lineitem measures (the oracle's three
    UNION branches each rescan; Spark computes all 15 aggregates in one
    pass and unpivots)."""
    df = load_table(spark, sf_dir, "lineitem")
    return profile_columns(df, ["l_discount", "l_extendedprice", "l_quantity"])


@register(
    "sample_train_val_test",
    oracle=f"""
    WITH tagged AS (
      SELECT doc_id, source,
             CASE WHEN {_sql_bucket('doc_id')} < 90 THEN 'train'
                  WHEN {_sql_bucket('doc_id')} < 95 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def sample_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment by id-hash bucket —
    the split every training run needs to be REPRODUCIBLE across reruns,
    repartitionings and engines (never ``rand()``: a re-shuffled rerun
    would leak val docs into train).  Buckets partition [0,100), so the
    three splits are disjoint and exhaustive by construction.

    Scale shape: a pure map-side CASE over the scan (zero shuffle for
    the assignment itself); the summary is one narrow aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    tagged = docs.select(
        "doc_id",
        "source",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test").alias(
            "split"
        ),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").cast("long").alias("min_doc_id"),
            F.max("doc_id").cast("long").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@register(
    "sample_group_split",
    oracle=f"""
    WITH RECURSIVE
    tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 150
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS shared
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT i.u, i.v
        FROM inter i
        JOIN sz su ON su.doc_id = i.u
        JOIN sz sv ON sv.doc_id = i.v
        WHERE i.shared * 1.0 / (su.n + sv.n - i.shared) >= 0.6
    ),
    edges AS (SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs),
    reach(u, r) AS (
        SELECT u, u FROM (SELECT DISTINCT u FROM edges)
        UNION
        SELECT e.u, reach.r FROM edges e JOIN reach ON reach.u = e.v
    ),
    comp AS (SELECT u AS doc_id, MIN(r) AS rep FROM reach GROUP BY u),
    allrep AS (
        SELECT d.doc_id, COALESCE(c.rep, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c USING (doc_id)
    ),
    tagged AS (
        SELECT doc_id, rep,
               CASE WHEN {_sql_bucket('rep')} < 90 THEN 'train'
                    WHEN {_sql_bucket('rep')} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM allrep
    )
    SELECT split, COUNT(*) AS n_docs,
           COUNT(DISTINCT rep) AS n_groups,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM tagged GROUP BY split ORDER BY split
    """,
)
def sample_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP-AWARE train/val/test split (round 7): docs are bucketed by
    the hash of their near-dup CLUSTER representative, not their own id,
    so near-duplicates can never straddle splits — the leakage guard a
    plain id-hash split (``sample_train_val_test``) does not give.
    Clusters come from :func:`~datafusion_iceberg_spark.extensions.
    dedup.token_jaccard_components` over the doc_id < 150 near-dup
    region (the corpus's engineered duplicates); everything else is its
    own singleton group.

    Scale shape: the split assignment itself is one narrow left join
    (doc_id → rep, id-only) plus a map-side CASE — the cluster pass is
    the dedup pipeline's existing output, reused, not recomputed per
    split.  The oracle replays clustering (recursive CTE) + the md5
    bucket arithmetic end-to-end."""
    from datafusion_iceberg_spark.extensions.dedup import (
        token_jaccard_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    comp = token_jaccard_components(
        docs.filter(F.col("doc_id") < 150)
    ).select(F.col("node").alias("doc_id"), F.col("label").alias("rep"))
    tagged = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("rep"), F.col("doc_id")).alias("rep"),
        )
    )
    b = hash_bucket(F.col("rep"))
    tagged = tagged.select(
        "doc_id",
        "rep",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test").alias(
            "split"
        ),
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("rep").alias("n_groups"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("split")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling")
# ---------------------------------------------------------------------------

_DSIR_BUCKETS = 256
_DSIR_TARGET = ("src0", "src1")  # the "high-quality domain" exemplar set


def _dsir_bucket(tok_col):
    """Hashed unigram feature bucket — the repo's portable md5 hash."""
    return (
        F.conv(F.substring(F.md5(tok_col), 1, 4), 16, 10).cast("int")
        % F.lit(_DSIR_BUCKETS)
    )


@register(
    "sample_dsir_importance",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source IN {_DSIR_TARGET} AS is_t,
             (('0x' || substr(md5(tok), 1, 4))::INT % {_DSIR_BUCKETS}) AS b
      FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
            FROM documents)
    ),
    bucket_counts AS (
      SELECT b,
             SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS cr
      FROM toks GROUP BY b
    ),
    totals AS (
      SELECT SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS tt,
             SUM(CASE WHEN is_t THEN 0 ELSE 1 END) AS tr
      FROM toks
    ),
    lr AS (
      SELECT b, LN((ct + 1.0) / (tt + {_DSIR_BUCKETS}))
                - LN((cr + 1.0) / (tr + {_DSIR_BUCKETS})) AS logratio
      FROM bucket_counts, totals
    ),
    feats AS (
      SELECT doc_id, b, COUNT(*) AS c FROM toks WHERE NOT is_t
      GROUP BY doc_id, b
    )
    SELECT doc_id, ROUND(SUM(c * logratio), 4) AS dsir_score
    FROM feats JOIN lr USING (b)
    GROUP BY doc_id
    ORDER BY dsir_score DESC, doc_id LIMIT 100
    """,
)
def sample_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scoring: rank RAW-pool documents by how
    target-like their hashed-unigram distribution is — log importance
    weight Σ_b c_b(doc)·ln(p̂_target(b)/p̂_raw(b)) with add-one
    smoothing over {_DSIR_BUCKETS} md5 buckets (Xie et al. 2023; the
    data-selection step between dedup and training).  Scale shape: one
    (bucket) agg for the two distributions (256 rows, broadcast), one
    (doc_id, bucket) map-side-combinable shuffle for features — no text
    leaves the tokenize stage.  The oracle replays hashing, smoothing,
    and the log-linear score; transcendentals round to 4dp per the repo
    float rule."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.col("source").isin(*_DSIR_TARGET).alias("is_t"),
        F.explode(F.split("text", " ")).alias("tok"),
    ).withColumn("b", _dsir_bucket(F.col("tok"))).drop("tok")
    bc = toks.groupBy("b").agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("cr"),
    )
    tot = toks.agg(
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("tt"),
        F.sum(F.when(F.col("is_t"), 0).otherwise(1)).alias("tr"),
    )
    lr = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("tt") + _DSIR_BUCKETS))
            - F.log((F.col("cr") + 1.0) / (F.col("tr") + _DSIR_BUCKETS))
        ).alias("logratio"),
    )
    feats = (
        toks.filter(~F.col("is_t"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        feats.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("c") * F.col("logratio")), 4).alias("dsir_score"))
        .orderBy(F.col("dsir_score").desc(), "doc_id")
        .limit(100)
    )


@register(
    "sample_temperature_mixture",
    oracle="""
    WITH mass AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, chars,
           ROUND(POWER(chars, 0.5) / SUM(POWER(chars, 0.5)) OVER (), 6)
             AS weight
    FROM mass ORDER BY source
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled domain mixture (the multilingual/multi-domain
    sampling rule of mBERT/XLM-R and T5: p_i ∝ mass_i^alpha with
    alpha=0.5): per-source character mass from ONE scan's partial agg,
    then the normalizing sum over the per-DOMAIN frame — which has one
    row per source, so the unpartitioned window runs on tens of rows no
    matter how many petabytes the corpus holds.  The weights feed
    sample_mixture / stratified sampling as keep-fractions."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    mass = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("chars"),
    )
    scaled = F.pow(F.col("chars").cast("double"), F.lit(0.5))
    return (
        mass.withColumn(
            "weight",
            F.round(
                scaled / F.sum(scaled).over(Window.partitionBy()), 6
            ),
        )
        .select("source", "n_docs", "chars", "weight")
        .orderBy("source")
    )


@register(
    "corpus_shard_plan",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS toks FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             SUM(toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT CAST(FLOOR((cum - toks) / 4096.0) AS BIGINT) AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(toks) AS BIGINT) AS shard_tokens,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
    FROM c GROUP BY shard ORDER BY shard
    """,
)
def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: assign docs (in stable doc_id order) to
    ~4096-token shards by GLOBAL running token count — the plan that
    turns a curated corpus into equal-budget tokenizer shards.

    The oracle's unpartitioned running-sum window would drag every row
    into ONE partition on Spark (the classic global-cumsum trap), so
    this side computes the SAME cumsum with the scalable two-phase
    prefix sum: range-partition by doc_id, per-partition running sums
    in parallel windows, then per-partition TOTALS (one tiny row per
    partition) prefix-folded on the driver and broadcast-joined back as
    offsets.  Shard boundaries are invariant to where the range splits
    land, so the sampled partitioning never changes the answer."""
    from pyspark.sql.window import Window

    from datafusion_iceberg_spark.session import cpus

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("toks")
    )
    parts = docs.repartitionByRange(cpus(), "doc_id").withColumn(
        "pid", F.spark_partition_id()
    )
    from datafusion_iceberg_spark.caching import scoped_cache

    parts = scoped_cache(parts)
    w = Window.partitionBy("pid").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = parts.withColumn("lcum", F.sum("toks").over(w))
    totals = sorted(
        (r.pid, r.tot)
        for r in parts.groupBy("pid")
        .agg(F.sum("toks").alias("tot"))
        .collect()
    )
    offset, offsets = 0, {}
    for pid, tot in totals:
        offsets[pid] = offset
        offset += tot
    off_df = local_df(spark, 
        [(int(p), int(o)) for p, o in offsets.items()], "pid int, off long"
    )
    cum = local.join(F.broadcast(off_df), "pid").withColumn(
        "cum", F.col("lcum") + F.col("off")
    )
    shard = F.floor(
        (F.col("cum") - F.col("toks")) / F.lit(4096.0)
    ).cast("long")
    return (
        cum.groupBy(shard.alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").cast("long").alias("shard_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard")
    )


@register(
    "sample_balanced_cap",
    oracle="""
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(doc_id) AS BIGINT) AS kept_key_sum
    FROM (
      SELECT source, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 15
    GROUP BY source ORDER BY source
    """,
)
def sample_balanced_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-domain downsampling: keep AT MOST k docs per source,
    chosen by a deterministic hash order (md5 of the key — seedless,
    reproducible across runs and engines) so the cap is an unbiased
    pseudo-random draw, not head-of-file bias.  One shuffle on source;
    the rank never leaves its partition.  The over-represented-domain
    equalizer that runs before mixture weighting at corpus scale."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 15)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("doc_id").cast("long").alias("kept_key_sum"),
        )
        .orderBy("source")
    )


@register(
    "sample_soft_dedup_weights",
    oracle="""
    WITH g AS (
      SELECT md5(text) AS d, COUNT(*) AS n_copies FROM documents GROUP BY 1
    ),
    w AS (
      SELECT doc_id, n_copies,
             ROUND(1.0 / n_copies, 6) AS weight
      FROM documents JOIN g ON md5(text) = g.d
    )
    SELECT doc_id, CAST(n_copies AS BIGINT) AS n_copies, weight,
           CAST((SELECT COUNT(*) FROM g) AS BIGINT) AS n_unique
    FROM w ORDER BY doc_id
    """,
)
def sample_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of dropping duplicates, every copy stays and
    gets sampling weight 1/n_copies — the duplicate CLUSTER contributes
    one document's worth of probability mass to training (the
    soft-dedup alternative used when hard dropping loses wanted
    distributional signal; composes with temperature/DSIR weighting
    downstream).  ``n_unique`` (the corpus' effective size under these
    weights, since sum(weight) = #clusters) rides along for the mixture
    planner.

    Scale shape: identical to dedup_exact_hash — the shuffle carries
    16-byte digests + counts, the weight attaches by a digest-keyed
    join back to the docs (AQE-planned), and the one global n_unique is
    a 1-row broadcast constant-attach."""
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(F.md5("text").alias("d")).agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    nu = g.agg(F.count(F.lit(1)).alias("n_unique"))  # 1-row attach
    return (
        docs.select("doc_id", F.md5("text").alias("d"))
        .join(g, "d")
        .crossJoin(F.broadcast(nu))
        .select(
            "doc_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.round(1.0 / F.col("n_copies"), 6).alias("weight"),
            F.col("n_unique").cast("long").alias("n_unique"),
        )
        .orderBy("doc_id")
    )


@register(
    "sample_epoch_shuffle_plan",
    oracle="""
    WITH e AS (SELECT 0 AS epoch UNION ALL SELECT 1 UNION ALL SELECT 2),
    perm AS (
      SELECT e.epoch, d.doc_id,
             md5(CONCAT('epoch-', CAST(e.epoch AS VARCHAR), ':',
                        CAST(d.doc_id AS VARCHAR))) AS ord_key
      FROM documents d CROSS JOIN e
    ),
    ranked AS (
      SELECT epoch, doc_id, ord_key,
             ROW_NUMBER() OVER (PARTITION BY epoch
                                ORDER BY ord_key, doc_id) AS pos
      FROM perm
    )
    SELECT epoch,
           CAST(FLOOR((pos - 1) / 100.0) AS BIGINT) AS batch,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS first_doc,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum
    FROM ranked
    GROUP BY epoch, batch
    ORDER BY epoch, batch
    """,
)
def sample_epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch training-order plan: each epoch gets its OWN
    deterministic permutation (order by md5(epoch:doc_id) — different
    every epoch, reproducible on any engine, no stored RNG state), cut
    into fixed-size batches.  The property that matters for training:
    batch composition decorrelates across epochs while the whole plan
    stays a pure function of (corpus, epoch) — a resumed or re-run job
    rebuilds byte-identical order.

    Scale shape: the permutation key is computed map-side; the per-epoch
    rank is a window partitioned BY EPOCH — at real scale the batch
    boundary uses the same two-phase prefix-sum trick as
    corpus_shard_plan (count rows below each range split), but the
    output here aggregates per batch, so the window's sort IS the
    shuffle Spark would pay to write epoch-ordered shards anyway —
    nothing is driver-side."""
    from pyspark.sql.window import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = local_df(spark, [(0,), (1,), (2,)], "epoch int")
    perm = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.lit("epoch-"),
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("ord_key"),
    )
    w = W.partitionBy("epoch").orderBy("ord_key", "doc_id")
    ranked = perm.withColumn("pos", F.row_number().over(w))
    return (
        ranked.groupBy(
            "epoch",
            F.floor((F.col("pos") - 1) / 100.0).cast("long").alias("batch"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.sum("doc_id").cast("long").alias("id_sum"),
        )
        .orderBy("epoch", "batch")
    )


# --- weighted sampling without replacement ---------------------------------

_WSAMPLE_K = 100


@register(
    "sample_weighted_no_replacement",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, source,
             greatest(n_chars, 1) AS w,
             ROUND(
               -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 1)
                   / 4294967297.0)
               / greatest(n_chars, 1), 9) AS sample_key
      FROM documents
    )
    SELECT doc_id, source, CAST(w AS BIGINT) AS w, sample_key
    FROM keyed ORDER BY sample_key, doc_id LIMIT {_WSAMPLE_K}
    """,
)
def sample_weighted_no_replacement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k WEIGHTED sampling WITHOUT replacement (Efraimidis-
    Spirakis A-ES): each doc draws key = -ln(u)/w from a DETERMINISTIC
    md5-derived uniform u (no RNG state — reproducible on any engine,
    any partitioning, any retry) and the global k smallest keys are the
    sample; P(selection) follows the weights (here ``n_chars``: longer
    docs proportionally likelier), the distributional contract
    bernoulli/hash-fraction sampling cannot give.  One map-side pass +
    a top-k (Spark plans TakeOrderedAndProject — per-partition heaps,
    no global sort Exchange); at 100 TB the only data movement is k
    rows per partition.  Keys round to 9 dp on both engines before
    ranking (the repo's transcendental-portability rule), doc_id breaks
    ties."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    w = F.greatest(F.col("n_chars"), F.lit(1))
    key = F.round(-F.log((h + 1) / F.lit(4294967297.0)) / w, 9)
    return (
        docs.select(
            "doc_id",
            "source",
            w.cast("long").alias("w"),
            key.alias("sample_key"),
        )
        .orderBy("sample_key", "doc_id")
        .limit(_WSAMPLE_K)
    )
