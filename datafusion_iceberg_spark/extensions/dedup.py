"""Deduplication operators for large-scale training-data pipelines
(BASELINE.json north_star): exact, hash-exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (100 TB):

- Exact dedup groups on a fixed-width digest (md5), never the full text —
  the shuffle moves 16-byte keys, not documents.
- MinHash+LSH is the standard near-dup path: per-doc signature (map-side,
  no shuffle), band → bucket equi-join (shuffle on 8-byte band hashes),
  exact Jaccard verification only on candidate pairs.  Brute-force
  pairwise comparison is O(n²) and appears here only inside buckets.
- SimHash packs a document into one 64-bit code; near-dup = Hamming ≤ k,
  found by banding the code (pigeonhole: d ≤ 3 ⇒ one of 4 16-bit bands
  equal).
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY text ORDER BY keep_doc_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the lowest doc_id per distinct text (deterministic survivor
    choice — dropDuplicates keeps an arbitrary row under parallelism)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_doc_id", "n_copies")
        .orderBy("keep_doc_id")
    )


@register(
    "dedup_exact_hash",
    oracle="""
    SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY keep_doc_id
    """,
)
def dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same dedup but shuffling 16-byte digests instead of full documents —
    the only viable exact-dedup shuffle shape at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keep_doc_id")
    )


# ---------------------------------------------------------------------------
# N-gram (token-set) Jaccard near-dup — exact, oracle-checked
# ---------------------------------------------------------------------------


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 100
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
        FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
    FROM inter
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE shared * 1.0 / (sa.n + sb.n - shared) >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard over a bounded id range (the verification
    kernel MinHash candidates feed into; standalone it is quadratic, hence
    the doc_id < 100 fence)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    sz = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = tok.alias("a")
    b = tok.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.8)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (rows-only check: hash family not SQL-portable)
# ---------------------------------------------------------------------------

NUM_HASHES = 32
BANDS = 8
ROWS_PER_BAND = NUM_HASHES // BANDS


def minhash_signatures(docs: DataFrame, shingle_len: int = 3) -> DataFrame:
    """doc_id + minhash signature array, fully columnar (no shuffle, no
    Python): word shingles → two xxhash64 seeds → K virtual permutations
    via the standard double-hashing trick h1 + k·h2."""
    shingled = docs.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                f"transform(sequence(1, greatest(size(split(text, ' ')) - {shingle_len - 1}, 1)),"
                f" i -> array_join(slice(split(text, ' '), i, {shingle_len}), ' '))"
            )
        ).alias("shingles"),
    )
    # Lower 32 bits of each xxhash64 so h1 + k·h2 stays within a signed
    # 64-bit long (Spark 4 runs ANSI mode: wrap-around would raise
    # ARITHMETIC_OVERFLOW).  k ≤ 32 ⇒ max ≈ 33·2³² ≪ 2⁶³.
    hashed = shingled.select(
        "doc_id",
        "shingles",
        F.expr("transform(shingles, s -> xxhash64(s) & 4294967295L)").alias("h1"),
        F.expr("transform(shingles, s -> xxhash64(s, 1) & 4294967295L)").alias("h2"),
    )
    return hashed.select(
        "doc_id",
        "shingles",
        F.expr(
            f"transform(sequence(0, {NUM_HASHES - 1}),"
            " k -> array_min(zip_with(h1, h2, (a, b) -> a + k * b)))"
        ).alias("sig"),
    )


@register("dedup_minhash_lsh")  # hash-family specific → rows-only check
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature → LSH banding → candidate pairs → exact Jaccard
    verification on candidates only.  Returns verified near-dup pairs
    (jaccard >= 0.8).  Deterministic (xxhash64 is seeded), but the hash
    family is not expressible in DuckDB → rows-only driver check; the
    pytest suite checks candidates ⊆ exact pairs and recall vs. the
    brute-force oracle."""
    docs = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(docs)

    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {BANDS - 1}),"
                f" b -> xxhash64(cast(b as string),"
                f" array_join(transform(slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}),"
                " x -> cast(x as string)), ',')))"
            )
        ).alias("band_id", "band_hash"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_hash") == F.col("y.band_hash"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh_a = sig.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    sh_b = sig.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (Pandas UDF: bit-twiddling kernel; rows-only check)
# ---------------------------------------------------------------------------


def _token_hash64(token: str) -> int:
    """Deterministic 64-bit token hash (md5-derived; PYTHONHASHSEED-proof)."""
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "little")


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens — vectorized Arrow batch in,
    cached token-hash dict (vocabularies are tiny relative to corpora)."""
    cache: dict[str, int] = {}
    out = []
    for text in texts:
        votes = [0] * 64
        for tok in (text or "").split(" "):
            h = cache.get(tok)
            if h is None:
                h = _token_hash64(tok)
                cache[tok] = h
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        code = 0
        for bit in range(64):
            if votes[bit] > 0:
                code |= 1 << bit
        # wrap to signed 64-bit for Spark LongType
        out.append(code - (1 << 64) if code >= (1 << 63) else code)
    return pd.Series(out)


@register("dedup_simhash")  # hash-family specific → rows-only check
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash codes + banded Hamming-distance pairing: pairs with
    Hamming(code_a, code_b) <= 3 found via 4×16-bit band equality
    (pigeonhole guarantee), then exact popcount verification."""
    docs = load_table(spark, sf_dir, "documents")
    coded = docs.select("doc_id", simhash64("text").alias("code"))

    bands = coded.select(
        "doc_id",
        "code",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 3),"
                " b -> shiftright(code, b * 16) & 65535)"
            )
        ).alias("band_id", "band_val"),
    )
    cand = (
        bands.alias("x")
        .join(
            bands.alias("y"),
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_val") == F.col("y.band_val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("x.code").alias("code_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("y.code").alias("code_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("code_a").bitwiseXOR(F.expr("code_b")))
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= 3)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup — exact, oracle-checked in DOUBLE
# ---------------------------------------------------------------------------


@register(
    "dedup_embedding_cosine",
    oracle="""
    WITH ev AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    norms AS (SELECT vec_id, SQRT(SUM(v * v)) AS nrm FROM ev GROUP BY vec_id),
    dots AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, SUM(a.v * b.v) AS dot
        FROM ev a JOIN ev b ON a.i = b.i AND a.vec_id < b.vec_id
        GROUP BY 1, 2
    )
    SELECT vec_a, vec_b, ROUND(dot / (na.nrm * nb.nrm), 4) AS cos_sim
    FROM dots
    JOIN norms na ON na.vec_id = vec_a
    JOIN norms nb ON nb.vec_id = vec_b
    WHERE dot / (na.nrm * nb.nrm) >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs cosine near-dup over embeddings (exact; the LSH-bucketed
    scale path lives in extensions/similarity.py).  Cosine computed in
    DOUBLE on both engines (DuckDB's list_cosine_similarity is FLOAT —
    not oracle-stable)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> cast(x as double))").alias("v")
    )
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, p) -> acc + p)")
    nrm = lambda c: F.sqrt(
        F.expr(f"aggregate(transform({c}, x -> x * x), 0D, (acc, p) -> acc + p)")
    )
    cos = dot / (nrm("va") * nrm("vb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.4)
        .select("vec_a", "vec_b", F.round("cos_raw", 4).alias("cos_sim"))
        .orderBy("vec_a", "vec_b")
    )
