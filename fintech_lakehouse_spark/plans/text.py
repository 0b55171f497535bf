"""Text-analysis & dedup queries over `documents` (SURVEY.md §7.6 —
the [NEW] training-data-pipeline surface: token stats, quality scores,
language ID, fingerprints, exact + near dedup).

Everything stays in built-in JVM functions (split/array ops/md5/regexp)
— no Python UDFs — so the plans whole-stage-codegen and scale linearly;
the documents table is the 100 TB web-corpus stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.text import (
    language_best_guess,
    lsh_band_pairs,
    minhash_signatures,
    shingle_rows,
    simhash64,
    word_shingles,
)
from fintech_lakehouse_spark.plans._num import davg_int, sql_davg_int
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


@register(
    "doc_stats_by_lang",
    oracle=f"""
    SELECT lang, source,
           COUNT(*)                     AS n_docs,
           {sql_davg_int('n_chars')}    AS avg_chars,
           {sql_davg_int('n_tokens')}   AS avg_tokens,
           SUM(n_tokens)                AS total_tokens
    FROM (
        SELECT lang, source, n_chars,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    GROUP BY lang, source
    """,
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source): whitespace token counting
    (SURVEY §7.6 text stats). Averages use the exact integer
    floor-division pattern (plans/_num.py) — char/token counts are
    ints whose true averages hit round() midpoints."""
    documents = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", F.size(F.split(F.col("text"), " "))
    )
    return documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        davg_int("n_chars").alias("avg_chars"),
        davg_int("n_tokens").alias("avg_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


@register(
    "doc_quality_scores",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' '))                             AS n_tokens,
           len(list_distinct(string_split(text, ' ')))              AS n_unique_tokens,
           ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4)                 AS unique_ratio,
           ROUND(CAST(length(text) AS DOUBLE)
                 / len(string_split(text, ' ')), 4)                 AS avg_token_len,
           length(text)                                             AS n_chars_actual,
           ROUND(CAST(length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text), 4)                                 AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     x -> list_contains(['the','a','and','of','to','is','in'], x))) AS DOUBLE)
                 / len(string_split(text, ' ')), 4)                 AS stopword_ratio
    FROM documents
    WHERE doc_id < 100
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (SURVEY §7.6 quality scoring):
    token count, type/token (unique) ratio, mean token length,
    punctuation ratio, stopword ratio — the standard cheap filters a
    pretraining pipeline applies before expensive dedup. Narrow
    projection, zero shuffle."""
    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tokens = F.split(F.col("text"), " ")
    n_tokens = F.size(tokens)
    return documents.select(
        "doc_id",
        "lang",
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(tokens)).alias("n_unique_tokens"),
        F.round(F.size(F.array_distinct(tokens)).cast("double") / n_tokens, 4).alias(
            "unique_ratio"
        ),
        F.round(F.length("text").cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.length("text").alias("n_chars_actual"),
        F.round(
            (
                F.length("text")
                - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
            ).cast("double")
            / F.length("text"),
            4,
        ).alias("punct_ratio"),
        F.round(
            F.size(
                F.filter(
                    tokens,
                    lambda x: x.isin("the", "a", "and", "of", "to", "is", "in"),
                )
            ).cast("double")
            / n_tokens,
            4,
        ).alias("stopword_ratio"),
    )


@register(
    "exact_dedup_docs",
    oracle="""
    SELECT md5(text)    AS content_hash,
           COUNT(*)     AS n_copies,
           MIN(doc_id)  AS keep_doc_id
    FROM documents
    GROUP BY md5(text)
    HAVING COUNT(*) > 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup (SURVEY §7.6): hash-groupBy on md5(text);
    keep lowest doc_id. At 100 TB this is the canonical first dedup
    stage — hashes shuffle, never the documents themselves."""
    documents = load_table(spark, sf_dir, "documents")
    return (
        documents.select(F.md5(F.col("text").cast("binary")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .filter(F.col("n_copies") > 1)
    )


@register(
    "ngram_jaccard_pairs",
    oracle="""
    WITH shingles AS (
        SELECT doc_id, unnest(list_distinct(
            [array_to_string(string_split(text, ' ')[i:i+2], ' ')
             FOR i IN range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1)]
        )) AS shingle
        FROM documents WHERE doc_id < 250
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM shingles GROUP BY doc_id),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
        FROM shingles a JOIN shingles b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           ROUND(CAST(n_shared AS DOUBLE)
                 / (sa.n_shingles + sb.n_shingles - n_shared), 4) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_shared) >= 0.30
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard near-dedup (SURVEY §7.6): word-3-gram shingles →
    inverted-index self-join on shingle → shared-count → Jaccard ≥ 0.30.

    This is the exact-Jaccard ground truth MinHash approximates; the
    shingle join IS the scalable formulation (only docs sharing a
    shingle ever meet — no O(n²) cross join). Hot shingles would skew
    the join at corpus scale; minhash_lsh_pairs is the production path."""
    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    shingled = word_shingles(documents, n=3)
    exploded = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    sizes = shingled.select("doc_id", F.size("shingles").alias("n_shingles"))
    a = exploded.alias("a")
    b = exploded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    jaccard = F.col("n_shared").cast("double") / (
        F.col("sa.n_shingles") + F.col("sb.n_shingles") - F.col("n_shared")
    )
    return (
        pairs.join(sizes.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jaccard >= 0.30)
        .select("doc_a", "doc_b", F.round(jaccard, 4).alias("jaccard"))
    )


@register("minhash_lsh_pairs")  # Spark-hash-specific → rows-only check
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates (SURVEY §7.6) — the
    scale path for ngram_jaccard_pairs.

    shingle → K minhashes (xxhash64, per-permutation seeds) → B bands
    of R rows → band-signature bucket join; only same-bucket docs pair
    up, so the join is linear in corpus size for bounded bucket width.
    K=32, B=8, R=4 targets the Jaccard≳0.5 region. The signature
    computation explodes shingles once and collapses in a map-side
    partial aggregate (see functions/text.py::minhash_signatures).
    No SQL oracle: signatures depend on Spark's xxhash64."""
    documents = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    signatures = minhash_signatures(shingle_rows(documents, n=3), n_hashes=32)
    return lsh_band_pairs(signatures, n_hashes=32, n_bands=8)


@register("simhash_fingerprints")  # Spark-hash-specific → rows-only check
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash document fingerprints (SURVEY §7.6): per token,
    xxhash64 → ±1 vote per bit position weighted by term frequency;
    fingerprint bit b = sign of the vote sum. Near-dups differ in few
    bits (hamming64 in functions/text.py is the pairing metric)."""
    documents = load_table(spark, sf_dir, "documents")
    return simhash64(documents)


@register(
    "lang_id_heuristic",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang AS labeled_lang,
               list_distinct(string_split(text, ' ')) AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, labeled_lang,
               len(list_intersect(toks, ['the', 'a', 'and', 'of', 'to'])) AS s_en,
               len(list_intersect(toks, ['der', 'die', 'und', 'das', 'ist'])) AS s_de,
               len(list_intersect(toks, ['el', 'la', 'los', 'que', 'de'])) AS s_es,
               len(list_intersect(toks, ['le', 'la', 'les', 'et', 'est'])) AS s_fr,
               len(list_intersect(toks, ['de5', 'shi4', 'le5', 'zai4', 'he2'])) AS s_zh
        FROM scored
    )
    SELECT doc_id, labeled_lang,
           CASE WHEN s_zh = best THEN 'zh' WHEN s_fr = best THEN 'fr' WHEN s_es = best THEN 'es' WHEN s_en = best THEN 'en' WHEN s_de = best THEN 'de' END AS predicted_lang,
           best AS marker_hits
    FROM (SELECT *, greatest(s_en, s_de, s_es, s_fr, s_zh) AS best FROM s)
    """,
)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (SURVEY §7.6): score each doc against
    per-language stopword marker sets via array intersection, predict
    argmax (functions/text.py::language_best_guess). A real corpus
    would use char-n-gram profiles; the mechanism (token-set overlap,
    argmax over struct array) is the same and stays JVM-side.

    Oracle replicates Spark's array_max(struct(score, lang)) argmax
    exactly: max score, ties broken by the greatest language code
    (the CASE tests languages in descending order)."""
    documents = load_table(spark, sf_dir, "documents")
    best = language_best_guess()
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.getField("lang").alias("predicted_lang"),
        best.getField("score").alias("marker_hits"),
    )


@register("duplicate_clusters")  # iterative, non-SQL-expressible → rows-only
def duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup clusters: MinHash-LSH candidate pairs → connected
    components → (doc_id, cluster_id) with cluster_id = canonical
    (minimum) doc_id. The full near-dedup pipeline a training-data
    run executes before dropping non-canonical rows (SURVEY §7.6).
    Iterative min-label propagation — see functions/text.py::
    dedup_clusters."""
    from fintech_lakehouse_spark.functions.text import dedup_clusters

    documents = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    signatures = minhash_signatures(shingle_rows(documents, n=3), n_hashes=32)
    pairs = lsh_band_pairs(signatures, n_hashes=32, n_bands=8)
    return dedup_clusters(pairs).orderBy("doc_id")


@register(
    "doc_token_counts",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))                            AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')) AS bpe_ish_tokens,
           len(regexp_extract_all(text, '[0-9]+'))                 AS numeric_tokens,
           len(list_distinct(regexp_extract_all(text, '[a-z0-9]+'))) AS vocab_size
    FROM documents
    WHERE doc_id < 200
    """,
)
def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways (SURVEY §7.6): whitespace split and a
    BPE-ish regex lexer (runs of alphanumerics + single punctuation
    marks — the pre-tokenization most BPE vocabularies apply). Both
    stay in JVM regexp engines; identical regex dialect on the oracle
    side."""
    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)).alias(
            "bpe_ish_tokens"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0)).alias(
            "numeric_tokens"
        ),
        F.size(
            F.array_distinct(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+"), 0))
        ).alias("vocab_size"),
    )


@register("doc_rolling_fingerprints")  # Spark-hash-specific → rows-only
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (SURVEY §7.6
    fingerprinting): fold over tokens with h = h*31 + xxhash64(token).
    Order-sensitive (unlike MinHash/SimHash) — equal fingerprints mean
    equal token SEQUENCES, the strictest near-zero-cost dedup key after
    md5. Wrapping 64-bit arithmetic keeps it a pure codegen fold."""
    documents = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    # Chain hashing instead of acc*31+h: multiplication overflows under
    # ANSI mode; xxhash64(acc, token) is equally order-sensitive.
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.xxhash64(acc, x),
    )
    return documents.select(
        "doc_id",
        rolling.alias("rolling_hash"),
        F.md5(F.col("text").cast("binary")).alias("md5_hash"),
    )
