"""Embedding similarity search (BASELINE.json north_star).

- ``sim_topk_bruteforce``: exact top-k cosine neighbors — broadcast the
  query set against the corpus; the correctness baseline.
- ``sim_lsh_topk``: random-hyperplane LSH — sign-bit codes, banded
  buckets, search only within colliding buckets.  The 100 TB path: the
  corpus is scanned once to code+bucket (map-side), then a bucket
  equi-join replaces the all-pairs cross join.

Cosines are computed in DOUBLE on both engines and ranked by the rounded
value with a deterministic id tiebreak, so Spark and DuckDB produce
identical orderings.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table, scale_out

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors

DOT = "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"
NORM_Q = "sqrt(aggregate(transform(qv, x -> x * x), 0D, (acc, p) -> acc + p))"
NORM_C = "sqrt(aggregate(transform(cv, x -> x * x), 0D, (acc, p) -> acc + p))"


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x as double))")


@register(
    "sim_topk_bruteforce",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ev GROUP BY vec_id),
    dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, SUM(q.v * c.v) AS dot
        FROM ev q JOIN ev c ON q.i = c.i
        WHERE q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, cand_id, ROUND(dot / (nq.nrm * nc.nrm), 4) AS cos_sim
        FROM dots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = cand_id
    )
    SELECT query_id, cand_id, cos_sim, rnk FROM (
        SELECT query_id, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: broadcast the (small) query set, scan the corpus
    once, per-query top-k via window.  One corpus scan, no corpus×corpus
    blowup — this shape works at any corpus size as long as the query set
    broadcasts."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = scale_out(emb).select(
        F.col("vec_id").alias("cand_id"), _as_double("embedding").alias("cv")
    )
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("cand_id"))
        .withColumn("cos_sim", F.round(F.expr(DOT) / (F.expr(NORM_Q) * F.expr(NORM_C)), 4))
        .select("query_id", "cand_id", "cos_sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("query_id", "rnk")
    )


def _hyperplanes(dim: int = 64, n_bits: int = 16, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_bits, dim).tolist()


@register("sim_lsh_topk")  # bucketing is hash-family specific → rows-only
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via random-hyperplane LSH: 16 sign bits per
    vector, 4 bands × 4 bits; candidates = corpus vectors sharing ≥1 band
    with the query; exact cosine re-rank within candidates.  Recall vs.
    brute force is asserted in tests/test_similarity.py."""
    from pyspark.sql import Window as W

    emb = scale_out(load_table(spark, sf_dir, "embeddings"))
    planes = _hyperplanes()
    plane_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in row]) for row in planes]
    )

    coded = (
        emb.select("vec_id", _as_double("embedding").alias("v"))
        .withColumn("planes", plane_lit)
        .withColumn(
            "code",
            F.expr(
                "aggregate(zip_with(planes, sequence(0, size(planes) - 1), (p, i) ->"
                " if(aggregate(zip_with(p, v, (a, b) -> a * b), 0D, (acc, x) -> acc + x) > 0D,"
                " shiftleft(1L, i), 0L)), 0L, (acc, x) -> acc + x)"
            ),
        )
        .drop("planes")
    )

    bands = coded.select(
        "vec_id",
        "v",
        F.posexplode(
            F.expr("transform(sequence(0, 3), b -> shiftright(code, b * 4) & 15)")
        ).alias("band_id", "band_val"),
    )
    q = bands.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        "band_id",
        "band_val",
    )
    c = bands.select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv"), "band_id", "band_val"
    )
    cand = (
        q.join(c, ["band_id", "band_val"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "qv", "cand_id", "cv")
        .distinct()
    )
    scored = cand.withColumn(
        "cos_sim", F.round(F.expr(DOT) / (F.expr(NORM_Q) * F.expr(NORM_C)), 4)
    ).select("query_id", "cand_id", "cos_sim")
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("query_id", "rnk")
    )


@register(
    "sim_pairwise_threshold",
    oracle="""
    WITH ev AS (
        SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ev GROUP BY vec_id),
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS dot
        FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
        WHERE a.label = b.label
        GROUP BY 1, 2
    )
    SELECT COUNT(*) AS n_similar_pairs
    FROM dots JOIN norms na ON na.vec_id = vec_a JOIN norms nb ON nb.vec_id = vec_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.3
    """,
)
def sim_pairwise_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked pairwise similarity: equi-join on label first (blocking key)
    so the quadratic term is per-block, not global — the standard
    entity-resolution shape."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double("embedding").alias("v")
    )
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("label").alias("la"), F.col("v").alias("qv")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label").alias("lb"), F.col("v").alias("cv")
    )
    cos = F.expr(DOT) / (F.expr(NORM_Q) * F.expr(NORM_C))
    return (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("vec_a") < F.col("vec_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.3)
        .agg(F.count(F.lit(1)).alias("n_similar_pairs"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the partition-and-probe scale path
# ---------------------------------------------------------------------------

N_CENTROIDS = 16
N_PROBE = 4
_CENT_LO, _CENT_HI = N_QUERIES, N_QUERIES + N_CENTROIDS - 1  # inclusive ids


@register(
    "sim_ivf_topk",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ev GROUP BY vec_id),
    cdots AS (
        SELECT a.vec_id AS vid, c.vec_id AS cent_id, SUM(a.v * c.v) AS dot
        FROM ev a JOIN ev c ON a.i = c.i
        WHERE c.vec_id BETWEEN {_CENT_LO} AND {_CENT_HI}
        GROUP BY 1, 2
    ),
    ccos AS (
        SELECT vid, cent_id,
               ROUND(dot / (na.nrm * nc.nrm), 6) AS ccos
        FROM cdots
        JOIN norms na ON na.vec_id = vid
        JOIN norms nc ON nc.vec_id = cent_id
    ),
    assign AS (
        SELECT vid, cent_id FROM (
            SELECT vid, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vid
                                      ORDER BY ccos DESC, cent_id) AS rn
            FROM ccos
        ) WHERE rn = 1
    ),
    probe AS (
        SELECT vid AS query_id, cent_id FROM (
            SELECT vid, cent_id,
                   ROW_NUMBER() OVER (PARTITION BY vid
                                      ORDER BY ccos DESC, cent_id) AS rn
            FROM ccos WHERE vid < {N_QUERIES}
        ) WHERE rn <= {N_PROBE}
    ),
    cand AS (
        SELECT p.query_id, a.vid AS cand_id
        FROM probe p JOIN assign a USING (cent_id)
        WHERE a.vid <> p.query_id
    ),
    rdots AS (
        SELECT cand.query_id, cand.cand_id, SUM(q.v * c.v) AS dot
        FROM cand
        JOIN ev q ON q.vec_id = cand.query_id
        JOIN ev c ON c.vec_id = cand.cand_id AND q.i = c.i
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, cand_id, ROUND(dot / (nq.nrm * nc.nrm), 4) AS cos_sim
        FROM rdots
        JOIN norms nq ON nq.vec_id = query_id
        JOIN norms nc ON nc.vec_id = cand_id
    )
    SELECT query_id, cand_id, cos_sim, rnk FROM (
        SELECT query_id, cand_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos_sim DESC, cand_id) AS rnk
        FROM scored
    ) WHERE rnk <= {TOP_K}
    ORDER BY query_id, rnk
    """,
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate top-k: corpus vectors are assigned to
    their nearest of {N_CENTROIDS} centroids (one scan, centroids
    broadcast), each query probes its {N_PROBE} nearest centroid lists,
    and exact cosine re-ranks within the probed lists only — searching
    ~{N_PROBE}/{N_CENTROIDS} of the corpus.  At 100 TB the assignment is
    the partitioning key of the stored index (write once, probe forever);
    centroids here are deterministically seeded from the corpus (ids
    {_CENT_LO}..{_CENT_HI}) — the k-means refinement loop is an offline
    index-build concern, orthogonal to the query plan.

    The DuckDB oracle replays the SAME algorithm, so this approximate
    operator still gets the strong hash check (assignment ties broken by
    rounded cosine + centroid id on both engines)."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cent = emb.filter(
        (F.col("vec_id") >= _CENT_LO) & (F.col("vec_id") <= _CENT_HI)
    ).select(F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"))

    # one corpus scan × broadcast centroids: cosine to every centroid
    ccos = (
        emb.withColumnRenamed("v", "qv")
        .join(F.broadcast(cent))
        .withColumn("ccos", F.round(F.expr(DOT) / (F.expr(NORM_Q) * F.expr(NORM_C)), 6))
        .select("vec_id", "qv", "cent_id", "ccos")
    )
    wv = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), "cent_id")
    ranked = ccos.withColumn("rn", F.row_number().over(wv))
    assign = ranked.filter(F.col("rn") == 1).select(
        F.col("vec_id").alias("cand_id"), F.col("qv").alias("cv"), "cent_id"
    )
    probe = ranked.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("rn") <= N_PROBE)
    ).select(F.col("vec_id").alias("query_id"), "qv", "cent_id")

    cand = (
        F.broadcast(probe)
        .join(assign, "cent_id")
        .filter(F.col("query_id") != F.col("cand_id"))
    )
    scored = cand.withColumn(
        "cos_sim", F.round(F.expr(DOT) / (F.expr(NORM_Q) * F.expr(NORM_C)), 4)
    ).select("query_id", "cand_id", "cos_sim")
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TOP_K)
        .orderBy("query_id", "rnk")
    )
