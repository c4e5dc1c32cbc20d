"""Multimodal column plumbing (BASELINE.json north_star).

Images/audio/video are opaque ``binary`` columns plus typed metadata
structs.  The Spark-side machinery here is real — schema, partition-
preserving ``mapInPandas`` pipelines, Arrow batch shapes — while the
actual media decode is stubbed (no image/audio libs in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested (SURVEY.md §2B extension table).

In production the fake decoder is replaced by e.g. PIL/ffmpeg calls inside
the same ``mapInPandas`` iterator; nothing else changes — batches stream
through Arrow, memory stays bounded by ``maxRecordsPerBatch``, and the
decode parallelizes with the scan.
"""

from __future__ import annotations

from collections.abc import Iterator

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table, scale_out

MEDIA_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, width int, height int, "
    "mean_byte double, checksum string"
)

REAL_DECODERS_AVAILABLE = False  # no PIL/ffmpeg in this container


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Attach a deterministic fake payload: binary column derived from the
    doc text (stands in for image bytes) + typed metadata struct — the
    exact schema a binaryFile/Iceberg scan of real media would produce.

    COUPLING (ADVICE r4): the content derivation ``unhex(md5(text))`` is
    load-bearing for every mm_* DuckDB replay oracle — mm_decode_features
    and mm_frame_sample replay it as ``md5(text)`` hex arithmetic, and
    mm_embed_similarity_topk's oracle computes ``md5(md5(text))`` because
    the fake encoder hashes the payload's HEX spelling
    (embed_media_batch).  Changing this derivation requires re-syncing
    all three oracle SQL builders in this module in the same commit."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("content"),
        F.struct(
            F.lit("image/fake").alias("media_type"),
            F.length(F.unhex(F.md5("text"))).alias("n_bytes"),
            (F.col("n_chars") % 64 + 1).cast("int").alias("width_hint"),
        ).alias("meta"),
    )


def decode_image_batch(
    batches: Iterator[pd.DataFrame], use_fake_decoder: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary in → feature rows out, one Arrow batch at
    a time (never materializes the partition)."""
    for pdf in batches:
        if not use_fake_decoder:
            if not REAL_DECODERS_AVAILABLE:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg — not in this "
                    "container; pass use_fake_decoder=True"
                )
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": [m["media_type"] for m in pdf["meta"]],
                "n_bytes": [len(b) for b in pdf["content"]],
                # deterministic fake "decode": dimensions & stats from bytes
                "width": [b[0] % 64 + 1 for b in pdf["content"]],
                "height": [b[1] % 64 + 1 for b in pdf["content"]],
                "mean_byte": [sum(b) / len(b) for b in pdf["content"]],
                "checksum": [b.hex()[:8] for b in pdf["content"]],
            }
        )
        yield out


@register(
    "mm_decode_features",
    # Algorithm-replay oracle (the sim_ivf_topk pattern): the fake decoder
    # is pure md5 arithmetic over the doc text, and DuckDB has md5().  The
    # oracle re-derives each digest byte from its hex pair and replays the
    # width/height/mean/checksum formulas exactly.
    oracle="""
    WITH b AS (
      SELECT doc_id, md5(text) AS h FROM documents
    ), byt AS (
      SELECT doc_id, h,
        list_transform(range(1, 17), i ->
          (strpos('0123456789abcdef', substr(h, 2*i - 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1)
        ) AS byte_vals
      FROM b
    )
    SELECT doc_id,
           'image/fake' AS media_type,
           CAST(16 AS INTEGER) AS n_bytes,
           CAST(byte_vals[1] % 64 + 1 AS INTEGER) AS width,
           CAST(byte_vals[2] % 64 + 1 AS INTEGER) AS height,
           CAST(list_sum(byte_vals) AS DOUBLE) / 16 AS mean_byte,
           substr(h, 1, 8) AS checksum
    FROM byt ORDER BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary column → mapInPandas decode → typed features.
    tests/test_multimodal.py additionally asserts the features equal a
    pure-Python recomputation."""
    docs = scale_out(load_table(spark, sf_dir, "documents"))
    media = synthesize_media(docs)
    feats = media.mapInPandas(decode_image_batch, schema=MEDIA_SCHEMA)
    return feats.orderBy("doc_id")


@register(
    "mm_metadata_stats",
    oracle="""
    SELECT CAST(n_chars % 64 + 1 AS INTEGER) AS width_hint,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(octet_length(from_hex(md5(text))) AS BIGINT)) AS BIGINT)
             AS total_bytes
    FROM documents
    GROUP BY 1 ORDER BY width_hint
    """,
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over the media table — the common 'plan a
    decode job from metadata' query; never touches payload bytes."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return (
        media.groupBy(F.col("meta.width_hint").alias("width_hint"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("meta.n_bytes").cast("long")).alias("total_bytes"),
        )
        .orderBy("width_hint")
    )


@register(
    "mm_frame_sample",
    # Replay oracle: payload is always the 16-byte md5 digest, so the
    # sampled offsets are the fixed stride range(0, 16, 4) per doc.
    oracle="""
    SELECT doc_id,
           CAST(16 AS INTEGER) AS n_bytes,
           CAST(u.frame_offset AS INTEGER) AS frame_offset,
           CAST(u.frame_offset // 4 AS INTEGER) AS frame_id
    FROM documents, unnest(range(0, 16, 4)) AS u(frame_offset)
    ORDER BY doc_id, frame_id
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling shape for video columns: explode a deterministic
    frame index per media row (every k-th 'frame'), carrying the byte
    offsets a real demuxer would seek to."""
    docs = load_table(spark, sf_dir, "documents")
    media = synthesize_media(docs)
    return (
        media.select(
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
            F.explode(F.expr("sequence(0, meta.n_bytes - 1, 4)")).alias("frame_offset"),
        )
        .withColumn("frame_id", (F.col("frame_offset") / 4).cast("int"))
        .orderBy("doc_id", "frame_id")
    )


# ---------------------------------------------------------------------------
# Multimodal → similarity composition: embed binary payloads, then ANN
# ---------------------------------------------------------------------------

EMB_DIM = 16


def embed_media_batch(
    batches: Iterator[pd.DataFrame], use_fake_encoder: bool = True
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload → unit-norm embedding.  The fake
    encoder derives EMB_DIM floats deterministically from the payload
    bytes (a real deployment swaps in an ONNX/CLIP encoder here — same
    signature, same batch shape, same downstream plan)."""
    import numpy as np

    for pdf in batches:
        if not use_fake_encoder and not REAL_DECODERS_AVAILABLE:
            raise NotImplementedError(
                "real media encoder not available in this container;"
                " pass use_fake_encoder=True"
            )
        mats = []
        for b in pdf["content"]:
            # md5 over the payload's hex spelling: binary-in semantics are
            # unchanged (any payload bytes → deterministic embedding), but
            # the derivation is DuckDB-replayable — content.hex() is the
            # md5(text) hex string, so the oracle computes md5(md5(text)).
            raw = np.frombuffer(
                hashlib.md5(bytes(b).hex().encode()).digest(), dtype=np.uint8
            )[:EMB_DIM].astype(np.float64)
            v = raw - raw.mean()
            # explicit sqrt-of-sequential-sum (not np.linalg.norm's scaled
            # BLAS dnrm2) so the oracle's list_sum reproduces it exactly
            n = float(np.sqrt((v * v).sum()))
            mats.append((v / n if n else v).tolist())
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": mats})


def _mm_embed_oracle_sql() -> str:
    """Replay of embed_media_batch + cosine top-5: the fake embedding is
    md5(md5(text)) digest bytes, mean-centered and L2-normalized; cosine
    is the exploded-dot-product pattern of sim_topk_bruteforce.  Rounded
    to 4dp on both engines before ranking (the sim_topk convention) to
    absorb summation-order ulps."""
    hexpair = (
        "CAST((strpos('0123456789abcdef', substr(h, 2*j - 1, 1)) - 1) * 16"
        " + (strpos('0123456789abcdef', substr(h, 2*j, 1)) - 1) AS DOUBLE)"
    )
    return f"""
    WITH b AS (SELECT doc_id, md5(md5(text)) AS h FROM documents),
    raws AS (
      SELECT doc_id,
             list_transform(range(1, {EMB_DIM} + 1), j -> {hexpair}) AS raw
      FROM b
    ),
    cent AS (
      SELECT doc_id,
             list_transform(raw, x -> x - list_sum(raw) / {EMB_DIM}) AS v
      FROM raws
    ),
    emb AS (
      SELECT doc_id,
             CASE WHEN nrm = 0 THEN v
                  ELSE list_transform(v, x -> x / nrm) END AS e
      FROM (SELECT doc_id, v,
                   sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm
            FROM cent)
    ),
    ev AS (
      SELECT doc_id, generate_subscripts(e, 1) AS i, unnest(e) AS x FROM emb
    ),
    dots AS (
      SELECT q.doc_id AS query_id, c.doc_id AS cand_id, SUM(q.x * c.x) AS dot
      FROM ev q JOIN ev c ON q.i = c.i
      WHERE q.doc_id < 3 AND q.doc_id <> c.doc_id
      GROUP BY 1, 2
    )
    SELECT query_id, cand_id, cos_sim, rnk FROM (
      SELECT query_id, cand_id, ROUND(dot, 4) AS cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY ROUND(dot, 4) DESC, cand_id) AS rnk
      FROM dots
    ) WHERE rnk <= 5
    ORDER BY query_id, rnk
    """


@register("mm_embed_similarity_topk", oracle=_mm_embed_oracle_sql())
def mm_embed_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal retrieval pipeline end to end: synthesize media →
    mapInPandas encode (Arrow-batched) → brute-force cosine top-5 of the
    first 3 docs against the corpus.  One corpus scan, query side
    broadcast — the same plan shape as extensions/similarity.py, fed by
    the binary-column path instead of a stored embedding column.
    tests/test_extensions.py checks the results against a pure-Python
    recomputation."""
    from pyspark.sql import Window as W

    docs = scale_out(load_table(spark, sf_dir, "documents"))
    media = synthesize_media(docs)
    emb = media.mapInPandas(
        embed_media_batch, schema="doc_id long, embedding array<double>"
    )
    q = emb.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = emb.select(F.col("doc_id").alias("cand_id"), F.col("embedding").alias("cv"))
    dot = F.expr(
        "aggregate(zip_with(qv, cv, (x, y) -> x * y), 0D, (acc, p) -> acc + p)"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "cand_id")
    return (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("cand_id"))
        .withColumn("cos_sim", F.round(dot, 4))  # unit vectors: dot = cosine
        .select("query_id", "cand_id", "cos_sim")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .orderBy("query_id", "rnk")
    )
