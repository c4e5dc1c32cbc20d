"""Text-analysis operators (BASELINE.json north_star): token counting,
quality scoring, language-ID heuristic, document fingerprinting.

All pure-columnar (split / higher-order array functions / md5) — no Python
in the row path, so these run at full codegen speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_iceberg_spark.registry import register
from datafusion_iceberg_spark.tables import load_table, scale_out

STOPWORDS = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "y", "los", "de"),
}


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_ish,
           LENGTH(text) AS n_chars_computed,
           n_chars
    FROM documents ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counting."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).alias("n_unique_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_ish"),
        F.length("text").alias("n_chars_computed"),
        "n_chars",
    ).orderBy("doc_id")


@register(
    "text_quality_score",
    oracle="""
    SELECT doc_id,
           ROUND(len(list_filter(string_split(text, ' '),
                                 t -> t IN ('the', 'a', 'of', 'and', 'to')))
                 * 1.0 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND(len(list_distinct(string_split(text, ' ')))
                 * 1.0 / len(string_split(text, ' ')), 6) AS ttr,
           ROUND(LENGTH(text) * 1.0 / len(string_split(text, ' ')), 6) AS avg_tok_len,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 10 AND 1000
                 AND len(list_distinct(string_split(text, ' ')))
                     * 1.0 / len(string_split(text, ' ')) > 0.05
                THEN 1 ELSE 0 END AS passes_quality
    FROM documents ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / stopword-ratio / type-token-ratio quality gate (the
    Gopher-rules shape)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    n_stop = F.expr(f"size(filter(split(text, ' '), t -> t IN ({sw})))")
    ttr = F.size(F.array_distinct(toks)) / n_toks
    return docs.select(
        "doc_id",
        F.round(n_stop / n_toks, 6).alias("stopword_ratio"),
        F.round(ttr, 6).alias("ttr"),
        F.round(F.length("text") / n_toks, 6).alias("avg_tok_len"),
        F.when((n_toks.between(10, 1000)) & (ttr > 0.05), 1)
        .otherwise(0)
        .alias("passes_quality"),
    ).orderBy("doc_id")


def _lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(string_split(text, ' '), t -> t IN ({words})))"


def _lang_hits_spark(lang: str) -> F.Column:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(f"size(filter(split(text, ' '), t -> t IN ({words})))")


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {_lang_hits('en')} AS hits_en,
               {_lang_hits('de')} AS hits_de,
               {_lang_hits('fr')} AS hits_fr,
               {_lang_hits('es')} AS hits_es
        FROM documents
    ),
    pred AS (
        SELECT doc_id, lang,
               CASE WHEN hits_de > hits_en AND hits_de >= hits_fr AND hits_de >= hits_es THEN 'de'
                    WHEN hits_fr > hits_en AND hits_fr > hits_de AND hits_fr >= hits_es THEN 'fr'
                    WHEN hits_es > hits_en AND hits_es > hits_de AND hits_es > hits_fr THEN 'es'
                    ELSE 'en' END AS pred_lang
        FROM scored
    )
    SELECT lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY lang, pred_lang ORDER BY lang, pred_lang
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language-ID heuristic; output = confusion matrix
    against the labeled ``lang`` column."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        _lang_hits_spark("en").alias("hits_en"),
        _lang_hits_spark("de").alias("hits_de"),
        _lang_hits_spark("fr").alias("hits_fr"),
        _lang_hits_spark("es").alias("hits_es"),
    )
    h = {k: F.col(f"hits_{k}") for k in ("en", "de", "fr", "es")}
    pred = scored.withColumn(
        "pred_lang",
        F.when(
            (h["de"] > h["en"]) & (h["de"] >= h["fr"]) & (h["de"] >= h["es"]), "de"
        )
        .when((h["fr"] > h["en"]) & (h["fr"] > h["de"]) & (h["fr"] >= h["es"]), "fr")
        .when((h["es"] > h["en"]) & (h["es"] > h["de"]) & (h["es"] > h["fr"]), "es")
        .otherwise("en"),
    )
    return (
        pred.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred_lang")
    )


@register(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             AS vocab_fingerprint
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive vocabulary fingerprint (sorted distinct tokens →
    md5) — survives token reordering, the cheap shingle-free near-dup key."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
        ).alias("vocab_fingerprint"),
    ).orderBy("doc_id")


@register(
    "text_winnow_fingerprint",
    oracle="""
    SELECT doc_id, MIN(md5(substr(text, CAST(i AS INTEGER), 16))) AS winnow_fp
    FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(LENGTH(text) - 15, 1))) AS i
        FROM documents
    )
    GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window fingerprint (winnowing, window = whole doc): min
    hash over all 16-char character shingles — columnar, no explode
    shuffle (transform + array_min stay map-side)."""
    docs = scale_out(load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        F.array_min(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 15, 1)),"
                " i -> md5(substring(text, i, 16)))"
            )
        ).alias("winnow_fp"),
    ).orderBy("doc_id")


@register(
    "text_token_frequencies",
    oracle="""
    SELECT tok, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok ORDER BY freq DESC, tok LIMIT 50
    """,
)
def text_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency (the vocabulary-building scan): explode →
    two-phase hash agg (partial map-side combine keeps the shuffle at
    |vocab|, not |tokens|)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Composite pipeline: the end-to-end corpus-cleaning shape
# ---------------------------------------------------------------------------


@register(
    "pipeline_clean_corpus",
    oracle="""
    WITH gated AS (
        SELECT doc_id, source, text,
               len(string_split(text, ' ')) AS ntoks,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) AS ttr
        FROM documents
        WHERE lang = 'en'
    ),
    q AS (
        SELECT * FROM gated WHERE ntoks BETWEEN 10 AND 1000 AND ttr > 0.05
    ),
    dedup AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(lower(trim(text)))
                                     ORDER BY doc_id) AS rn
        FROM q
    )
    SELECT source, COUNT(*) AS n_docs_kept,
           CAST(SUM(ntoks) AS BIGINT) AS n_tokens_kept
    FROM dedup WHERE rn = 1
    GROUP BY source
    ORDER BY source
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data cleaning pipeline as ONE declarative plan:
    language gate → quality gate (token count + type-token ratio) → exact
    near-normalized dedup (first doc_id wins) → per-source yield stats.
    Each stage is a narrow projection/filter except the dedup window
    (one shuffle on the content hash) and the final aggregate — i.e. the
    whole pipeline costs two shuffles at any corpus size, with every gate
    pushed before the first shuffle."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    gated = docs.filter(F.col("lang") == "en").select(
        "doc_id",
        "source",
        "text",
        F.size(toks).alias("ntoks"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
    )
    q = gated.filter(F.col("ntoks").between(10, 1000) & (F.col("ttr") > 0.05))
    w = W.partitionBy(F.md5(F.lower(F.trim(F.col("text"))))).orderBy("doc_id")
    kept = q.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_kept"),
            F.sum("ntoks").alias("n_tokens_kept"),
        )
        .orderBy("source")
    )


@register(
    "text_redact_pii",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact: ' || source || '@example.com or +1-555-'
                    || CAST(doc_id AS VARCHAR) AS aug_text
        FROM documents WHERE doc_id < 200
    ),
    red AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(aug_text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                   '\\+?\\d[\\d-]{7,}\\d', '<PHONE>', 'g') AS red_text,
               aug_text
        FROM aug
    )
    SELECT doc_id,
           md5(red_text) AS red_md5,
           CAST((len(red_text) - len(replace(red_text, '<EMAIL>', ''))) / 7
                AS BIGINT) AS n_emails,
           CAST((len(red_text) - len(replace(red_text, '<PHONE>', ''))) / 7
                AS BIGINT) AS n_phones
    FROM red ORDER BY doc_id
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction for training corpora: e-mail and phone patterns →
    placeholder tokens, pure JVM regexp_replace (no Python in the row
    path).  The test corpus carries no real PII, so the query injects a
    synthetic contact line per document and the oracle verifies the
    redacted text byte-for-byte via md5 — the redaction rules run
    identically in both engines."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: "),
            F.col("source"),
            F.lit("@example.com or +1-555-"),
            F.col("doc_id").cast("string"),
        ).alias("aug_text"),
    )
    red = aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace(
                F.col("aug_text"),
                r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
                "<EMAIL>",
            ),
            r"\+?\d[\d-]{7,}\d",
            "<PHONE>",
        ).alias("red_text"),
    )
    n_tok = lambda tok: (
        (F.length("red_text") - F.length(F.replace(F.col("red_text"), F.lit(tok), F.lit(""))))
        / F.lit(7)
    ).cast("long")
    return red.select(
        "doc_id",
        F.md5("red_text").alias("red_md5"),
        ((F.length("red_text") - F.length(F.replace(F.col("red_text"), F.lit("<EMAIL>"), F.lit("")))) / 7).cast("long").alias("n_emails"),
        ((F.length("red_text") - F.length(F.replace(F.col("red_text"), F.lit("<PHONE>"), F.lit("")))) / 7).cast("long").alias("n_phones"),
    ).orderBy("doc_id")


@register(
    "text_chunk_documents",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts FROM documents
        WHERE doc_id < 300
    ),
    chunks AS (
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               array_to_string(ts[(i * 25 + 1):(i * 25 + 50)], ' ') AS chunk
        FROM toks,
             LATERAL unnest(generate_series(0,
                 CAST(GREATEST(CEIL((len(ts) - 25) / 25.0), 1) - 1 AS BIGINT))) t(i)
    )
    SELECT doc_id, chunk_id,
           CAST(len(string_split(chunk, ' ')) AS BIGINT) AS n_tokens,
           md5(chunk) AS chunk_md5
    FROM chunks WHERE chunk <> ''
    ORDER BY doc_id, chunk_id
    """,
)
def text_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (50-token chunks, stride 25) —
    the pretraining-data shaping op that turns documents into
    context-window-sized samples.  Pure higher-order functions: the token
    array is built once per doc and sliced per chunk map-side; no
    explode-then-window shuffle.  Chunk text is verified byte-for-byte
    via md5 against the oracle's identical slicing."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    toks = docs.select("doc_id", F.split("text", " ").alias("ts"))
    chunks = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, CAST(greatest(ceil((size(ts) - 25) / 25.0), 1) AS INT) - 1),"
                " i -> array_join(slice(ts, i * 25 + 1, 50), ' '))"
            )
        ).alias("chunk_id", "chunk"),
    ).filter(F.col("chunk") != "")
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(F.split("chunk", " ")).cast("long").alias("n_tokens"),
        F.md5("chunk").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# Test-set decontamination (n-gram overlap vs a benchmark set)
# ---------------------------------------------------------------------------

# Broadcast fence for the benchmark n-gram set: real eval sets are
# bounded (thousands of docs), but the fence must be REAL — a benchmark
# leg that turns out corpus-sized must fall back to a shuffle join, not
# OOM the driver (VERDICT r5 task 5).  ~50 bytes per 8-token shingle →
# 2M rows ≈ 100 MB broadcast, the sane ceiling at executor defaults.
BENCH_BROADCAST_MAX_ROWS = 2_000_000


def _fenced_broadcast(side: DataFrame, max_rows: int | None = None) -> DataFrame:
    """Broadcast-hint ``side`` only when a capped count proves it small.
    The probe is ``limit(max+1).count()`` — Spark stops producing rows at
    the limit, so an oversized side costs one truncated pass, never a
    full materialization.  Over the fence, the side is returned unhinted
    and AQE/stats pick a shuffle strategy."""
    cap = BENCH_BROADCAST_MAX_ROWS if max_rows is None else max_rows
    n = side.limit(cap + 1).count()
    return F.broadcast(side) if n <= cap else side


@register(
    "text_decontaminate",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    ng AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(ts) - 6),
               i -> array_to_string(ts[i:i+7], ' ')))) AS ng
      FROM tok WHERE len(ts) >= 8
    ),
    bench AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 97 = 0),
    corpus AS (SELECT * FROM ng WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, COUNT(*) AS n_shared
    FROM corpus c JOIN bench b USING (ng)
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — the step every training pipeline runs
    before an eval release: flag corpus documents sharing any 8-token
    shingle with the benchmark set (here: doc_id % 97 == 0).

    Scale shape: the benchmark n-gram set is tiny relative to the corpus
    (evals are thousands of docs, the corpus is billions), so the join is
    BROADCAST — but only after the size fence PROVES it small
    (_fenced_broadcast: capped count, shuffle-join fallback).  Corpus
    n-grams are generated map-side (array slice, no explode-then-window),
    hashed against the broadcast set, and only (doc_id, match) pairs
    reach the aggregation.  Shuffling full n-gram strings of the corpus
    is never needed in the intended regime."""
    docs = load_table(spark, sf_dir, "documents")
    # NOT cached (r15): materializing the exploded shingle frame costs
    # more than re-running the codegen explode per consumer (measured:
    # 2.1 s -> 3.5 s with a scoped cache at sf0.1)
    ngrams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, ' ')) >= 8 THEN"
                " array_distinct(transform("
                "   sequence(1, size(split(text, ' ')) - 7),"
                "   i -> array_join(slice(split(text, ' '), i, 8), ' ')))"
                " ELSE array() END"
            )
        ).alias("ng"),
    )
    bench = (
        ngrams.filter(F.col("doc_id") % 97 == 0).select("ng").distinct()
    )
    corpus = ngrams.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(_fenced_broadcast(bench), "ng")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus ranking: TF-IDF top terms and BM25 retrieval
# ---------------------------------------------------------------------------


@register(
    "text_tfidf_topk",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents WHERE doc_id < 100
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term), n
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 3
    ORDER BY doc_id, rk
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (docs < 100): the per-doc keyword
    extraction a curation UI shows.  One token shuffle for tf, one small
    term-level aggregate for df broadcast back; rounded before ranking
    (cross-engine ln determinism rule, PERF_NOTES.md)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    n_docs = tok.select("doc_id").distinct().count()
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    from pyspark.sql import window as W

    w = W.Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tfidf")
        .orderBy("doc_id", F.col("tfidf").desc(), "term")
    )


@register(
    "text_bm25_rank",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    dl AS (SELECT doc_id, len(ts) AS dl FROM tok),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(len(ts)) AS total_tok FROM tok),
    tf AS (
      SELECT doc_id, t AS term, COUNT(*) AS tf
      FROM (SELECT doc_id, unnest(ts) AS t FROM tok)
      WHERE t IN ('spark', 'join', 'filter')
      GROUP BY doc_id, t
    ),
    idf AS (
      SELECT term,
             ln((s.n_docs - COUNT(DISTINCT doc_id) + 0.5)
                / (COUNT(DISTINCT doc_id) + 0.5) + 1) AS idf
      FROM tf, stats s GROUP BY term, s.n_docs
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(idf.idf * tf.tf * 2.2
                 / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                    / (s.total_tok * 1.0 / s.n_docs)))) AS score
      FROM tf JOIN idf USING (term) JOIN dl ON dl.doc_id = tf.doc_id, stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, ROUND(score, 4) AS bm25 FROM scored
    ORDER BY bm25 DESC, doc_id LIMIT 20
    """,
)
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, Lucene idf) top-20 documents for the query
    {spark, join, filter} — the retrieval scorer for corpus search.

    Scale shape: term frequencies shuffle only rows whose token is one of
    the query terms (filter BEFORE the shuffle); idf and the global
    length stats are single-row/3-row broadcasts; avgdl is the exact
    rational SUM(dl)/N so both engines divide identical integers
    (cross-engine FP rule)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = ("spark", "join", "filter")
    tok = docs.select(
        "doc_id", F.split("text", " ").alias("ts")
    )
    dl = tok.select("doc_id", F.size("ts").alias("dl"))
    stats = tok.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("ts")).alias("total_tok"),
    )
    tf = (
        tok.select("doc_id", F.explode("ts").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log(
                (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                + 1
            ).alias("idf"),
        )
    )
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.col("idf")
                * F.col("tf")
                * 2.2
                / (
                    F.col("tf")
                    + 1.2
                    * (
                        0.25
                        + 0.75
                        * F.col("dl")
                        / (F.col("total_tok") * 1.0 / F.col("n_docs"))
                    )
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round("score", 4).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Context-window sequence packing (offset-based, distributed prefix sum)
# ---------------------------------------------------------------------------


@register(
    "text_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    c AS (
      SELECT doc_id, n,
             COALESCE(SUM(n) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
      FROM t
    )
    SELECT CAST(cb // 512 AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS n_tokens
    FROM c GROUP BY 1 ORDER BY 1
    """,
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents (in doc_id order) into 512-token context windows by
    cumulative-offset binning: doc -> bin floor(tokens_before / 512).
    Offset packing admits a bin to run over by its last doc (no doc is
    split), which is the standard pretraining packing compromise.

    Scale shape — the point of this op: a GLOBAL prefix sum without a
    global single-partition window.  Phase 1 computes per-chunk token
    totals (chunk = doc_id div 1000; aligned with the order key, so
    chunk order IS doc order) and cumsums the tiny chunk-totals frame;
    phase 2 windows WITHIN each chunk (partitioned — parallel) and adds
    the broadcast chunk offset.  The only full-data shuffle is the
    final bin aggregation; the classic two-phase scan pattern."""
    from pyspark.sql import window as W

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") / 1000).cast("long").alias("chunk"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )
    chunk_tot = t.groupBy("chunk").agg(F.sum("n").alias("chunk_n"))
    w_chunks = W.Window.orderBy("chunk").rowsBetween(
        W.Window.unboundedPreceding, -1
    )
    offsets = chunk_tot.select(
        "chunk", F.coalesce(F.sum("chunk_n").over(w_chunks), F.lit(0)).alias("off")
    )
    w_in = (
        W.Window.partitionBy("chunk")
        .orderBy("doc_id")
        .rowsBetween(W.Window.unboundedPreceding, -1)
    )
    packed = (
        t.join(F.broadcast(offsets), "chunk")
        .select(
            "doc_id",
            "n",
            (
                F.col("off") + F.coalesce(F.sum("n").over(w_in), F.lit(0))
            ).alias("cb"),
        )
        .select(
            F.floor(F.col("cb") / 512).cast("long").alias("bin_id"),
            "n",
        )
    )
    return (
        packed.groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
        .orderBy("bin_id")
    )


@register(
    "text_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    g2 AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS g
      FROM toks, UNNEST(generate_series(1, n - 1)) AS u(i)
    ),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
    top2 AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c2 GROUP BY doc_id),
    g3 AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
      FROM toks, UNNEST(generate_series(1, n - 2)) AS u(i)
    ),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
    dup3 AS (
      SELECT doc_id,
             SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_n,
             SUM(c) AS tot_n
      FROM c3 GROUP BY doc_id
    )
    SELECT toks.doc_id,
           CAST(toks.n AS BIGINT) AS n_tokens,
           ROUND(top2.mx * 2.0 / toks.n, 6) AS top2_frac,
           ROUND(dup3.dup_n * 1.0 / dup3.tot_n, 6) AS dup3_frac,
           CASE WHEN top2.mx * 2.0 / toks.n <= 0.20
                 AND dup3.dup_n * 1.0 / dup3.tot_n <= 0.30
                THEN 1 ELSE 0 END AS passes_repetition
    FROM toks JOIN top2 USING (doc_id) JOIN dup3 USING (doc_id)
    ORDER BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality gate on token n-grams:
    ``top2_frac`` = fraction of tokens covered by the single most
    frequent 2-gram (boilerplate/header spam signal), ``dup3_frac`` =
    fraction of 3-gram instances that are duplicates (loop/babble
    signal); a doc passes when both sit under the Gopher-shaped
    thresholds (0.20 / 0.30).

    Scale shape: n-grams are generated map-side from the token array
    (sequence+transform, pure codegen), then explode → count per
    (doc_id, gram) → per-doc aggregate.  The only shuffles carry
    (doc_id, gram) pairs — proportional to corpus token count, the
    same cost class as the MinHash shingle pass — never an O(d^2)
    per-doc loop, so million-token documents don't blow up a task."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 3
    )
    toks = docs.select(
        "doc_id",
        F.split("text", " ").alias("t"),
        F.size(F.split("text", " ")).cast("long").alias("n"),
    )

    def grams(k: int) -> DataFrame:
        return toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {k}), "
                    f"i -> concat_ws(' ', {', '.join(f't[i+{j}]' for j in range(k))}))"
                )
            ).alias("g"),
        )

    c2 = grams(2).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    top2 = c2.groupBy("doc_id").agg(F.max("c").alias("mx"))
    c3 = grams(3).groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    dup3 = c3.groupBy("doc_id").agg(
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("dup_n"),
        F.sum("c").alias("tot_n"),
    )
    top2_frac = F.col("mx") * 2.0 / F.col("n")
    dup3_frac = F.col("dup_n") * 1.0 / F.col("tot_n")
    return (
        toks.select("doc_id", "n")
        .join(top2, "doc_id")
        .join(dup3, "doc_id")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            F.round(top2_frac, 6).alias("top2_frac"),
            F.round(dup3_frac, 6).alias("dup3_frac"),
            F.when((top2_frac <= 0.20) & (dup3_frac <= 0.30), 1)
            .otherwise(0)
            .alias("passes_repetition"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_unigram_surprise",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS c FROM tok GROUP BY t),
    total AS (SELECT SUM(c) AS n FROM vocab),
    scored AS (
      SELECT tok.doc_id,
             AVG(-ln(vocab.c * 1.0 / total.n)) AS surprise,
             COUNT(*) AS n_tokens
      FROM tok JOIN vocab USING (t), total
      GROUP BY tok.doc_id
    )
    SELECT doc_id, ROUND(surprise, 4) AS avg_surprise,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN ROW_NUMBER() OVER (
                  ORDER BY ROUND(surprise, 4) DESC, doc_id) <= 20
                THEN 1 ELSE 0 END AS is_outlier
    FROM scored ORDER BY doc_id
    """,
)
def text_unigram_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprise scoring — the cheap stand-in for the KenLM
    perplexity filter every pretraining pipeline runs: score each doc by
    the average negative log corpus-frequency of its tokens and flag
    the top-20 most surprising as outliers (gibberish, wrong-language,
    encoding junk) — rank-based (rounded score, doc_id tiebreak) rather
    than a float threshold, deterministic across engines and exercised
    on any corpus.

    Scale shape: the vocabulary is a (token, count) aggregate — shuffles
    carry tokens once; corpus vocabularies are UNBOUNDED (typos/URLs grow
    with the corpus), so the score join carries no broadcast hint — AQE
    picks the strategy from the measured vocab size.  The top-20 cut is
    ``orderBy().limit(20)`` (TakeOrderedAndProject: per-partition heaps,
    20 rows to the driver — no single-task global window), and outliers
    are marked via a ≤20-row broadcast join, the same pattern as
    sim_hybrid_rrf.  The -ln and AVG are computed identically on both
    engines and rounded to 4 dp (the BM25 idf precedent)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))  # 1-row constant attach
    scored = (
        tok.join(vocab, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.avg(-F.log(F.col("c") * 1.0 / F.col("n"))).alias("surprise"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )
    # top-20 by (rounded score desc, doc_id) — deterministic across
    # engines; TakeOrderedAndProject keeps the cut fully distributed
    top = (
        scored.select(
            "doc_id", F.round("surprise", 4).alias("s")
        )
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.lit(1).alias("is_outlier_flag"))
    )
    return (
        scored.join(F.broadcast(top), "doc_id", "left")
        .select(
            "doc_id",
            F.round("surprise", 4).alias("avg_surprise"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("is_outlier_flag", F.lit(0)).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_pmi_pairs",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT t[i] AS a, t[i+1] AS b
      FROM toks, UNNEST(generate_series(1, n - 1)) AS u(i)
    ),
    pair_c AS (SELECT a, b, COUNT(*) AS c FROM bg GROUP BY a, b),
    uni AS (
      SELECT tok, COUNT(*) AS c FROM (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
      ) GROUP BY tok
    ),
    total AS (SELECT SUM(c) AS n FROM pair_c)
    SELECT a, b, CAST(pair_c.c AS BIGINT) AS pair_count,
           ROUND(ln(pair_c.c * 1.0 * total.n / (ua.c * 1.0 * ub.c)), 4) AS pmi
    FROM pair_c
    JOIN uni ua ON ua.tok = a
    JOIN uni ub ON ub.tok = b, total
    WHERE pair_c.c >= 5
    ORDER BY pmi DESC, a, b LIMIT 20
    """,
)
def text_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocation mining by pointwise mutual information — the
    phrase-detection pass (word2vec-style phrase merging, vocabulary
    induction) of a text pipeline: PMI(a,b) = ln(c(ab)·N / (c(a)·c(b))),
    min support 5, top-20 by rounded PMI with a deterministic tiebreak.

    Scale shape: bigrams generate map-side from the token array; the
    shuffles are (a,b)-pair counts and unigram counts — both
    vocabulary-sized, not corpus-sized, after their map-side partial
    aggregation; marginals attach via token-keyed joins and the single
    N rides a 1-row broadcast.  The final cut is
    orderBy().limit() (TakeOrderedAndProject)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    )
    toks = docs.select(F.split("text", " ").alias("t"))
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS a, t[i+1] AS b))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pair_c = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    uni = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("uc"))
    )
    total = pair_c.agg(F.sum("c").alias("n"))
    scored = (
        pair_c.filter(F.col("c") >= 5)
        .join(uni.withColumnRenamed("tok", "a").withColumnRenamed("uc", "ca"), "a")
        .join(uni.withColumnRenamed("tok", "b").withColumnRenamed("uc", "cb"), "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            F.col("c").cast("long").alias("pair_count"),
            F.round(
                F.log(
                    F.col("c") * 1.0 * F.col("n")
                    / (F.col("ca") * 1.0 * F.col("cb"))
                ),
                4,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(20)


@register(
    "text_boilerplate_spans",
    oracle="""
    WITH sh AS (
      SELECT doc_id, md5(substr(text, CAST(p AS INTEGER), 20)) AS h
      FROM (
        SELECT doc_id, text,
               unnest(generate_series(1, GREATEST(LENGTH(text) - 19, 1), 7)) AS p
        FROM documents
      )
    ),
    shared AS (
      SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1
    ),
    per_doc AS (
      SELECT sh.doc_id,
             COUNT(*) AS n_spans,
             SUM(CASE WHEN shared.h IS NOT NULL THEN 1 ELSE 0 END) AS n_shared
      FROM sh LEFT JOIN shared ON sh.h = shared.h
      GROUP BY sh.doc_id
    )
    SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
           CAST(n_shared AS BIGINT) AS n_shared,
           ROUND(n_shared * 1.0 / n_spans, 6) AS boilerplate_frac
    FROM per_doc ORDER BY doc_id
    """,
)
def text_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level boilerplate detection — the template/header stripper
    that runs BELOW document-level dedup: sample 20-char character
    shingles on a stride-7 grid, find spans shared across DIFFERENT
    documents, and score each doc by its shared-span fraction (high ⇒
    templated/boilerplate content even when no whole document
    duplicates).

    Scale shape: shingles generate map-side (sequence+transform, pure
    codegen) and the shuffles carry (doc_id, 16-byte md5) pairs — the
    stride caps shingle volume at len(text)/7 per doc; the cross-doc
    test is a count-distinct per hash (one aggregate), and the per-doc
    rollup joins back on the hash — never a doc×doc comparison."""
    docs = load_table(spark, sf_dir, "documents")
    sh = scale_out(docs).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 19, 1), 7),"
                " p -> md5(substring(text, p, 20)))"
            )
        ).alias("h"),
    )
    # One pass over (h, doc_id) groups + a count window instead of a
    # count-distinct aggregate self-joined back onto the shingle frame
    # (guide §2.4: the join's probe side re-computed the explode).  A
    # (h, doc_id) group row is one distinct sharer of h, so rows-per-h
    # > 1 equals COUNT(DISTINCT doc_id) > 1, and per-doc span counts
    # are the sums of the group counts.  Measured on the funnel's
    # identical leg: 1.40 → 0.93 s at sf0.1.
    d1 = sh.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (
        d1.withColumn(
            "nd", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_spans"),
            F.sum(
                F.when(F.col("nd") > 1, F.col("c")).otherwise(0)
            ).alias("n_shared"),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("n_spans").cast("long").alias("n_spans"),
        F.col("n_shared").cast("long").alias("n_shared"),
        F.round(F.col("n_shared") * 1.0 / F.col("n_spans"), 6).alias(
            "boilerplate_frac"
        ),
    ).orderBy("doc_id")


# Per-document quality + Gopher-repetition flags in one Arrow-vectorized
# pass (guide §4.2): counts are exact integers from hash maps over the
# token list, and the flag thresholds use the same IEEE-double arithmetic
# Catalyst evaluates, so the flags are bit-identical to the SQL spelling
# the oracle replays (mx2 = max 2-gram multiplicity, dup3 = total count
# of duplicated 3-gram instances, tot3 = n - 2 grams).  Serving the
# funnel's map-side stage; defined at module level so reused Python
# workers keep the deserialized function across tasks (guide §4.5).
def _funnel_qr_kernel(ts):
    import pandas as pd
    from collections import Counter

    qs, rs = [], []
    for toks in ts:
        toks = list(toks)
        n = len(toks)
        q = 1 if (10 <= n <= 1000 and len(set(toks)) * 1.0 / n > 0.05) else 0
        if n >= 3:
            mx2 = max(Counter(zip(toks, toks[1:])).values())
            dup3 = sum(
                c
                for c in Counter(zip(toks, toks[1:], toks[2:])).values()
                if c > 1
            )
            r = (
                1
                if (
                    mx2 * 2.0 / n <= 0.20
                    and dup3 * 1.0 / (n - 2) <= 0.30
                )
                else 0
            )
        else:
            r = 0
        qs.append(q)
        rs.append(r)
    return pd.DataFrame({"q": qs, "r": rs})


# explicit StructType: a DDL-string return type would be parsed at
# import time, which needs an active SparkContext the registry's module
# load cannot assume
_funnel_qr = F.pandas_udf(
    T.StructType(
        [
            T.StructField("q", T.IntegerType()),
            T.StructField("r", T.IntegerType()),
        ]
    )
)(_funnel_qr_kernel)


@register(
    "pipeline_curation_funnel",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, string_split(text, ' ') AS ts,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    quality AS (
      SELECT doc_id,
             CASE WHEN n BETWEEN 10 AND 1000
                   AND len(list_distinct(ts)) * 1.0 / n > 0.05
                  THEN 1 ELSE 0 END AS q
      FROM base
    ),
    g2 AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] AS g
      FROM base, UNNEST(generate_series(1, n - 1)) AS u(i) WHERE n >= 2
    ),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM g2 GROUP BY doc_id, g),
    top2 AS (SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM c2 GROUP BY doc_id),
    g3 AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
      FROM base, UNNEST(generate_series(1, n - 2)) AS u(i) WHERE n >= 3
    ),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g),
    dup3 AS (
      SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_n,
             SUM(c) AS tot_n
      FROM c3 GROUP BY doc_id
    ),
    rep AS (
      SELECT base.doc_id,
             CASE WHEN top2.mx * 2.0 / base.n <= 0.20
                   AND dup3.dup_n * 1.0 / dup3.tot_n <= 0.30
                  THEN 1 ELSE 0 END AS r
      FROM base JOIN top2 USING (doc_id) JOIN dup3 USING (doc_id)
    ),
    sh AS (
      SELECT doc_id, md5(substr(text, CAST(p AS INTEGER), 20)) AS h
      FROM (SELECT doc_id, text,
                   unnest(generate_series(1, GREATEST(LENGTH(text) - 19, 1), 7)) AS p
            FROM documents)
    ),
    shared AS (SELECT h FROM sh GROUP BY h HAVING COUNT(DISTINCT doc_id) > 1),
    boil AS (
      SELECT sh.doc_id,
             CASE WHEN SUM(CASE WHEN shared.h IS NOT NULL THEN 1 ELSE 0 END)
                       * 1.0 / COUNT(*) <= 0.5
                  THEN 1 ELSE 0 END AS b
      FROM sh LEFT JOIN shared ON sh.h = shared.h GROUP BY sh.doc_id
    ),
    ng AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(ts) - 6), i -> array_to_string(ts[i:i+7], ' ')))) AS ng
      FROM base WHERE n >= 8
    ),
    bench AS (SELECT DISTINCT ng FROM ng WHERE doc_id % 97 = 0),
    contaminated AS (
      SELECT DISTINCT c.doc_id FROM ng c JOIN bench USING (ng)
      WHERE c.doc_id % 97 <> 0
    ),
    flags AS (
      SELECT base.doc_id, base.text,
             quality.q,
             COALESCE(rep.r, 0) AS r,
             COALESCE(boil.b, 0) AS b,
             CASE WHEN base.doc_id % 97 <> 0
                   AND contaminated.doc_id IS NULL THEN 1 ELSE 0 END AS d
      FROM base
      JOIN quality USING (doc_id)
      LEFT JOIN rep USING (doc_id)
      LEFT JOIN boil USING (doc_id)
      LEFT JOIN contaminated ON contaminated.doc_id = base.doc_id
    ),
    agg AS (
      SELECT COUNT(*) AS s0,
             SUM(q) AS s1,
             SUM(q * r) AS s2,
             SUM(q * r * b) AS s3,
             SUM(q * r * b * d) AS s4,
             COUNT(DISTINCT CASE WHEN q * r * b * d = 1
                                 THEN md5(text) END) AS s5
      FROM flags
    )
    SELECT * FROM (
      SELECT 0 AS stage, 'all' AS stage_name, CAST(s0 AS BIGINT) AS n_docs FROM agg
      UNION ALL SELECT 1, 'quality', CAST(s1 AS BIGINT) FROM agg
      UNION ALL SELECT 2, 'repetition', CAST(s2 AS BIGINT) FROM agg
      UNION ALL SELECT 3, 'boilerplate', CAST(s3 AS BIGINT) FROM agg
      UNION ALL SELECT 4, 'decontaminated', CAST(s4 AS BIGINT) FROM agg
      UNION ALL SELECT 5, 'deduped', CAST(s5 AS BIGINT) FROM agg
    ) ORDER BY stage
    """,
)
def pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole curation pipeline as ONE funnel report — the number a
    data lead actually asks for ("how many documents survive each
    gate?"): quality (length+TTR) → repetition (Gopher n-gram) →
    boilerplate (shared spans) → decontamination (benchmark 8-grams) →
    exact dedup, applied cumulatively.

    Scale shape: every stage is the already-verified kernel (each has
    its own gate query); the funnel joins their per-doc FLAGS — narrow
    (doc_id, 0/1) frames — and the final count is one aggregate, with
    the dedup stage as COUNT(DISTINCT digest) over survivors rather
    than a materialized survivor table."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "text",
        F.split("text", " ").alias("ts"),
        F.size(F.split("text", " ")).alias("n"),
    )
    # Quality + repetition flags are per-document, computed by ONE
    # Arrow-vectorized kernel pass (guide §4.2): r15's map-side
    # aggregate() folds removed the corpus-wide gram shuffles (the right
    # trade per §2.3) but burned interpreted per-element expression CPU
    # that extra cores don't absorb — whole-query 2.79 s (r14 exploded)
    # → 3.9-4.3 s (folds).  The kernel keeps the zero-shuffle shape and
    # moves the per-doc counting into hash maps over the token batch
    # (measured leg A/B, min-of-4 at sf0.1: folds 0.90 s → kernel
    # 0.38 s; whole query 3.58 → ~2.4 s).  Flags are bit-identical:
    # integer counts and the same IEEE-double threshold arithmetic.

    # The cross-document boilerplate leg keeps the explode, but counts
    # distinct sharers with one pass over (h, doc_id) groups + a window
    # instead of a count-distinct aggregate + self-join (guide §2.4:
    # the join re-computed the shingle explode on its probe side).
    # A (h, doc_id) group row IS one distinct sharer, so rows-per-h > 1
    # equals COUNT(DISTINCT doc_id) > 1.  Measured 1.40 → 0.93 s.
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(length(text) - 19, 1), 7),"
                " p -> md5(substring(text, p, 20)))"
            )
        ).alias("h"),
    )
    d1 = sh.groupBy("h", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("h"))
    boil = (
        d1.withColumn("nd", nd)
        .groupBy("doc_id")
        .agg(
            F.when(
                F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0))
                * 1.0
                / F.sum("c")
                <= 0.5,
                1,
            )
            .otherwise(0)
            .alias("b")
        )
    )
    ngrams = base.filter(F.col("n") >= 8).select(
        "doc_id",
        F.explode(
            F.expr(
                "array_distinct(transform(sequence(1, size(ts) - 7),"
                " i -> array_join(slice(ts, i, 8), ' ')))"
            )
        ).alias("ng"),
    )
    bench = ngrams.filter(F.col("doc_id") % 97 == 0).select("ng").distinct()
    contaminated = (
        ngrams.filter(F.col("doc_id") % 97 != 0)
        .join(_fenced_broadcast(bench), "ng")
        .select("doc_id")
        .distinct()
        .withColumn("is_cont", F.lit(1))
    )
    # quality and repetition are per-row columns (one ArrowEvalPython
    # over the token array) — only the two genuinely cross-document
    # stages (boilerplate spans, benchmark contamination) remain joins
    flags = (
        base.withColumn("_qr", _funnel_qr("ts"))
        .select(
            "doc_id",
            "text",
            F.col("_qr.q").alias("q"),
            F.col("_qr.r").alias("r"),
        )
        .join(boil, "doc_id", "left")
        .join(contaminated, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            "q",
            F.coalesce("r", F.lit(0)).alias("r"),
            F.coalesce("b", F.lit(0)).alias("b"),
            F.when(
                (F.col("doc_id") % 97 != 0) & F.col("is_cont").isNull(), 1
            )
            .otherwise(0)
            .alias("d"),
        )
    )
    agg = flags.agg(
        F.count(F.lit(1)).alias("s0"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("r")).alias("s2"),
        F.sum(F.col("q") * F.col("r") * F.col("b")).alias("s3"),
        F.sum(F.col("q") * F.col("r") * F.col("b") * F.col("d")).alias("s4"),
        F.countDistinct(
            F.when(
                F.col("q") * F.col("r") * F.col("b") * F.col("d") == 1,
                F.md5("text"),
            )
        ).alias("s5"),
    )
    names = ["all", "quality", "repetition", "boilerplate", "decontaminated", "deduped"]
    stack = ", ".join(
        f"{i}, '{nm}', CAST(s{i} AS BIGINT)" for i, nm in enumerate(names)
    )
    return agg.select(
        F.expr(f"stack(6, {stack}) AS (stage, stage_name, n_docs)")
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters (deterministic, bit-exact oracle replay)
# ---------------------------------------------------------------------------

_CMS_D = 4       # hash rows
_CMS_W = 1024    # buckets per row


def _cms_bucket(row: int, tok_col):
    """Row-``row`` CMS bucket: 16-bit md5 prefix of ``row:token`` mod W —
    the repo's engine-portable hash convention (sampling.hash_bucket)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(str(row)), F.lit(":"), tok_col)), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % F.lit(_CMS_W)
    )


def _cms_bucket_sql(row_expr: str, tok_expr: str) -> str:
    return (
        f"(('0x' || substr(md5(CAST({row_expr} AS VARCHAR) || ':' || {tok_expr}), 1, 4))"
        f"::INT % {_CMS_W})"
    )


@register(
    "text_cms_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cells AS (
      SELECT r.i AS row, {_cms_bucket_sql('r.i', 'tok')} AS b,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, (SELECT unnest([0, 1, 2, 3]) AS i) r
      GROUP BY 1, 2
    ),
    vocab AS (SELECT DISTINCT tok FROM toks),
    probes AS (
      SELECT tok, r.i AS row, {_cms_bucket_sql('r.i', 'tok')} AS b
      FROM vocab, (SELECT unnest([0, 1, 2, 3]) AS i) r
    )
    SELECT tok, MIN(c) AS est
    FROM probes JOIN cells USING (row, b)
    GROUP BY tok ORDER BY est DESC, tok LIMIT 25
    """,
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens via a DETERMINISTIC count-min sketch (d=4,
    w=1024; md5-derived row hashes): the streaming-friendly sketch every
    corpus profiler uses when the vocabulary is too large to count
    exactly.  Build is one (row, bucket) shuffle of d*w = 4,096 cells
    regardless of corpus size; estimates join the kilobyte sketch
    (auto-broadcast) against the vocabulary.  The DuckDB oracle replays
    the SKETCH itself bit-for-bit — same hashes, same cells, same min —
    so the approximation is verified exactly, like the KMV NDV blobs
    (writer.compute_table_stats).  CMS guarantee (est >= true count)
    is property-tested in tests/test_extensions.py."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_bucket(i, F.col("tok")).alias("b")
            )
            for i in range(_CMS_D)
        ]
    )
    cells = (
        toks.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = toks.distinct().select(
        "tok", F.explode(rows).alias("rb")
    ).select("tok", F.col("rb.row").alias("row"), F.col("rb.b").alias("b"))
    return (
        probes.join(F.broadcast(cells), ["row", "b"])
        .groupBy("tok")
        .agg(F.min("c").alias("est"))
        .orderBy(F.col("est").desc(), "tok")
        .limit(25)
    )


@register(
    "text_zipf_slope",
    oracle="""
    WITH freq AS (
      SELECT tok, COUNT(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    ranked AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rnk
      FROM freq
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(regr_slope(LN(CAST(cnt AS DOUBLE)),
                            LN(CAST(rnk AS DOUBLE))), 6) AS zipf_slope,
           ROUND(regr_r2(LN(CAST(cnt AS DOUBLE)),
                         LN(CAST(rnk AS DOUBLE))), 6) AS r2
    FROM ranked WHERE rnk <= 100
    """,
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus naturalness check: OLS slope of log(freq) vs log(rank) over
    the top-100 vocabulary — natural language sits near -1 (Zipf), word
    salad and boilerplate drift off it.  Scale shape: the vocabulary agg
    is a partial-combined explode→groupBy; the top-100 cut is a TopK
    (TakeOrderedAndProject — no global sort of |vocab|), and ranking +
    regression run on exactly 100 rows.  regr_slope/regr_r2 are
    JVM-side aggregates on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    top = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(100)
    )
    ranked = top.withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy().orderBy(F.col("cnt").desc(), "tok")
        ),
    )
    lf = F.log(F.col("cnt").cast("double"))
    lr = F.log(F.col("rnk").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(F.regr_slope(lf, lr), 6).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 6).alias("r2"),
    )


@register(
    "text_dup_ngram_mass",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS p
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source, gram FROM (
        SELECT doc_id, source,
               tok || ' ' || LEAD(tok, 1) OVER w || ' '
                   || LEAD(tok, 2) OVER w AS gram
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY p)
      ) WHERE gram IS NOT NULL
    ),
    spread AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS nd FROM grams GROUP BY gram
    )
    SELECT g.source,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_grams,
           ROUND(CAST(SUM(CASE WHEN s.nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_frac
    FROM grams g JOIN spread s ON g.gram = s.gram
    GROUP BY g.source ORDER BY g.source
    """,
)
def text_dup_ngram_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-text mass (the RefinedWeb/Dolma corpus
    health metric): fraction of each source's token 3-grams that also
    appear in ANOTHER document.  Two shuffles total — grams hash to
    their spread count (|distinct grams|, partial-combined), then one
    narrow (gram → nd) join back; no doc×doc pairing ever materializes,
    which is what keeps it linear at 100 TB where pairwise dedup is
    quadratic."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("p", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("p")
    gram = F.concat(
        F.col("tok"),
        F.lit(" "),
        F.lead("tok", 1).over(w),
        F.lit(" "),
        F.lead("tok", 2).over(w),
    )
    from datafusion_iceberg_spark.caching import scoped_cache

    grams = scoped_cache(
        # feeds BOTH the spread agg and the join probe — the r11 plan
        # audit showed the explode+window subtree built twice; scoped so
        # the next gate's invocation frees the blocks (ADVICE r11 #4)
        toks.select("doc_id", "source", gram.alias("gram")).filter(
            F.col("gram").isNotNull()
        )
    )
    spread = grams.groupBy("gram").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") > 1, 1).otherwise(0)
    return (
        grams.join(spread, "gram")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(dup).cast("long").alias("dup_grams"),
            F.round(
                F.sum(dup).cast("double") / F.count(F.lit(1)), 6
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


@register(
    "text_bigram_perplexity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    bg AS (
      SELECT doc_id, t[i] AS a, t[i+1] AS b
      FROM toks, UNNEST(generate_series(1, n - 1)) AS u(i)
    ),
    big AS (SELECT a, b, COUNT(*) AS c FROM bg GROUP BY a, b),
    ctx AS (SELECT a, SUM(c) AS cc FROM big GROUP BY a),
    v AS (
      SELECT COUNT(DISTINCT tk) AS vs FROM (
        SELECT unnest(string_split(text, ' ')) AS tk FROM documents
      )
    ),
    scored AS (
      SELECT bg.doc_id,
             AVG(-ln((big.c + 0.5) / (ctx.cc + 0.5 * v.vs))) AS nll,
             COUNT(*) AS n_bigrams
      FROM bg
      JOIN big ON bg.a = big.a AND bg.b = big.b
      JOIN ctx ON bg.a = ctx.a, v
      GROUP BY bg.doc_id
    )
    SELECT doc_id, ROUND(nll, 4) AS avg_nll,
           ROUND(EXP(ROUND(nll, 4)), 4) AS ppl,
           CAST(n_bigrams AS BIGINT) AS n_bigrams,
           CASE WHEN ROW_NUMBER() OVER (
                  ORDER BY ROUND(nll, 4) DESC, doc_id) <= 20
                THEN 1 ELSE 0 END AS is_outlier
    FROM scored ORDER BY doc_id
    """,
)
def text_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity scoring — one rung up from
    text_unigram_surprise toward the KenLM filter CCNet-style pipelines
    run: P(cur|prev) with add-0.5 smoothing over corpus bigram counts,
    per-doc score = avg -ln P over the doc's bigrams, perplexity =
    exp(score); top-20 most-perplexing docs flagged (the rank cut, not
    a float threshold — deterministic on any corpus).

    Scale shape: bigrams generate MAP-SIDE from each doc's token array
    (no window shuffle for adjacency); the model is two
    vocabulary-sized aggregates — (prev, cur) counts and per-prev
    context totals, both partial-aggregated before their shuffle; the
    vocabulary size V rides a 1-row broadcast; scoring joins the doc
    bigrams against the two count tables on token keys (AQE picks the
    strategy from measured sizes — corpus vocabularies are unbounded,
    so no broadcast hint).  The -ln/AVG/EXP are computed identically on
    both engines and rounded to 4 dp (the unigram-surprise precedent;
    the per-doc AVG is over hundreds of terms, far inside double
    stability at 4 dp)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= 2
    )
    bg = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] AS a, t[i+1] AS b))"
            )
        ).alias("p"),
    ).select("doc_id", "p.a", "p.b")
    big = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    ctx = big.groupBy("a").agg(F.sum("c").alias("cc"))
    v = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("tk"))
        .agg(F.countDistinct("tk").alias("vs"))
    )
    scored = (
        bg.join(big, ["a", "b"])
        .join(ctx, "a")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.avg(
                -F.log(
                    (F.col("c") + 0.5) / (F.col("cc") + 0.5 * F.col("vs"))
                )
            ).alias("nll"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
    top = (
        scored.select("doc_id", F.round("nll", 4).alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(20)
        .select("doc_id", F.lit(1).alias("flag"))
    )
    return (
        scored.join(F.broadcast(top), "doc_id", "left")
        .select(
            "doc_id",
            F.round("nll", 4).alias("avg_nll"),
            F.round(F.exp(F.round("nll", 4)), 4).alias("ppl"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.coalesce("flag", F.lit(0)).alias("is_outlier"),
        )
        .orderBy("doc_id")
    )



# ---------------------------------------------------------------------------
# fastText-style quality classifier (hashed-ngram linear model)
# ---------------------------------------------------------------------------

_QC_BUCKETS = 4096   # hashed feature space (fastText's `-bucket`)
_QC_WRANGE = 2001    # weights in [-1000, 1000], deterministic per bucket


def _qc_bucket(gram_col):
    """Engine-portable 16-bit md5 bucket of a gram (the repo's hash
    convention, cf. ``_cms_bucket``)."""
    return (
        F.conv(F.substring(F.md5(gram_col), 1, 4), 16, 10).cast("int")
        % F.lit(_QC_BUCKETS)
    )


@register(
    "text_quality_classifier",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ),
    uni AS (
      SELECT doc_id, unnest(ts) AS g, generate_subscripts(ts, 1) AS i
      FROM toks
    ),
    grams AS (
      SELECT doc_id, g FROM uni
      UNION ALL
      SELECT a.doc_id, a.g || '_' || b.g AS g
      FROM uni a JOIN uni b ON a.doc_id = b.doc_id AND b.i = a.i + 1
    ),
    feat AS (
      SELECT doc_id,
             (('0x' || substr(md5(g), 1, 4))::INT % {_QC_BUCKETS}) AS bucket
      FROM grams
    ),
    weights AS (
      SELECT b.b AS bucket,
             (('0x' || substr(md5('w:' || CAST(b.b AS VARCHAR)), 1, 4))::INT
              % {_QC_WRANGE}) - 1000 AS w
      FROM (SELECT unnest(generate_series(0, {_QC_BUCKETS - 1})) AS b) b
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(w.w) AS BIGINT) AS score,
           CAST(SUM(w.w) > 0 AS INTEGER) AS keep
    FROM feat f JOIN weights w ON f.bucket = w.bucket
    GROUP BY f.doc_id ORDER BY f.doc_id
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style quality classifier (VERDICT r14 #7) — the filter
    rung production pipelines (CCNet, RefinedWeb, Dolma) deploy above
    heuristic scores: a HASHED-NGRAM LINEAR MODEL.  Unigrams + bigrams
    hash into a {_QC_BUCKETS}-bucket feature space (16-bit md5, the
    repo's engine-portable convention), a deterministic weights table —
    the stand-in for trained parameters; swap in real weights without
    touching the plan — BROADCASTS to every executor, and the document
    score is a map-side sparse dot product: explode grams → project to
    (doc_id, bucket) → BroadcastHashJoin against the 4096-row weights
    dim → partial-agg sum per doc.  The only shuffle carries
    (doc_id, partial sums); text never moves.  Integer weights keep the
    DuckDB replay bit-exact (a sigmoid is monotone in the logit, so
    ``keep = logit > 0`` classifies identically)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("ts")
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.concat(
                F.col("ts"),
                F.when(
                    F.size("ts") >= 2,
                    F.expr(
                        "transform(sequence(1, size(ts) - 1), "
                        "i -> concat(ts[i-1], '_', ts[i]))"
                    ),
                ).otherwise(F.expr("array()")),
            )
        ).alias("g"),
    )
    weights = (
        spark.range(_QC_BUCKETS)
        .select(
            F.col("id").cast("int").alias("bucket"),
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit("w:"), F.col("id").cast("string"))),
                        1,
                        4,
                    ),
                    16,
                    10,
                ).cast("int")
                % F.lit(_QC_WRANGE)
                - 1000
            ).alias("w"),
        )
    )
    feat = grams.select("doc_id", _qc_bucket(F.col("g")).alias("bucket"))
    return (
        feat.join(F.broadcast(weights), on="bucket", how="inner")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("w").alias("score"),
            (F.sum("w") > 0).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )
