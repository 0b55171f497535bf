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

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


def _word_shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingles: array<string>) — distinct word n-grams.

    Guarded so docs shorter than n tokens yield no shingles (Spark's
    sequence(0, negative) would count downward, not return empty)."""
    tokens = F.split(F.col("text"), " ")
    ngrams = F.transform(
        F.sequence(F.lit(0), F.size(tokens) - n),
        lambda i: F.concat_ws(" ", *[tokens[i + j] for j in range(n)]),
    )
    shingles = F.when(F.size(tokens) >= n, F.array_distinct(ngrams)).otherwise(
        F.array().cast("array<string>")
    )
    return documents.select("doc_id", shingles.alias("shingles")).filter(
        F.size("shingles") > 0
    )


@register(
    "doc_stats_by_lang",
    oracle="""
    SELECT lang, source,
           COUNT(*)                                              AS n_docs,
           ROUND(AVG(n_chars), 4)                                AS avg_chars,
           ROUND(AVG(len(string_split(text, ' '))), 4)           AS avg_tokens,
           SUM(len(string_split(text, ' ')))                     AS total_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def doc_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus profile per (lang, source): whitespace token counting
    (SURVEY §7.6 text stats)."""
    documents = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(n_tokens), 4).alias("avg_tokens"),
        F.sum(n_tokens).alias("total_tokens"),
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
           length(text)                                             AS n_chars_actual
    FROM documents
    WHERE doc_id < 100
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (SURVEY §7.6 quality scoring):
    token count, type/token (unique) ratio, mean token length — the
    standard cheap filters a pretraining pipeline applies before
    expensive dedup. Narrow projection, zero shuffle."""
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
    shingled = _word_shingles(documents, n=3)
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

    shingle → K minhashes (xxhash64 with per-permutation seeds) → B
    bands of R rows → band-signature bucket join. Only same-bucket docs
    pair up, so the join is linear in corpus size for bounded bucket
    width. K=32, B=8, R=4 targets the Jaccard~0.5+ region. No SQL
    oracle: signatures depend on Spark's xxhash64."""
    documents = load_table(spark, sf_dir, "documents")
    n_hashes, n_bands = 32, 8
    rows_per_band = n_hashes // n_bands
    shingled = _word_shingles(documents, n=3)
    # minhash k = min over shingles of xxhash64(shingle, seed=k)
    sig = shingled.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(F.col("shingles"), lambda s: F.xxhash64(s, F.lit(k)))
            ).alias(f"mh{k}")
            for k in range(n_hashes)
        ],
    )
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "_",
                        *[
                            F.col(f"mh{band * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("band", "band_sig"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


@register("simhash_fingerprints")  # Spark-hash-specific → rows-only check
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash document fingerprints (SURVEY §7.6): per token,
    xxhash64 → ±1 vote per bit position weighted by term frequency;
    fingerprint bit b = sign of the vote sum. Near-dups differ in few
    bits (compare via hamming distance on fingerprint halves).

    Built entirely from array/bitwise built-ins — the explode is per
    token but collapses immediately in a partial aggregate."""
    documents = load_table(spark, sf_dir, "documents")
    token = F.explode(F.split(F.col("text"), " ")).alias("token")
    toks = documents.select("doc_id", token)
    hashed = toks.withColumn("h", F.xxhash64("token"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(64)
        ]
    )
    fingerprint = None
    for bit in range(64):
        contrib = F.when(F.col(f"v{bit}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(2**bit).cast("long") if bit < 63 else F.when(
            F.col(f"v{bit}") > 0, F.lit(-(2**63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = contrib if fingerprint is None else fingerprint + contrib
    return votes.select("doc_id", fingerprint.alias("simhash64"))


@register("lang_id_heuristic")  # heuristic scorer → rows-only check
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-token language ID (SURVEY §7.6): score each doc against
    per-language stopword marker sets via array intersection, predict
    argmax. A real corpus would use char-n-gram profiles; the mechanism
    (token-set overlap, argmax over struct array) is the same and stays
    JVM-side."""
    markers = {
        "en": ["the", "a", "and", "of", "to"],
        "de": ["der", "die", "und", "das", "ist"],
        "es": ["el", "la", "los", "que", "de"],
        "fr": ["le", "la", "les", "et", "est"],
        "zh": ["de5", "shi4", "le5", "zai4", "he2"],
    }
    documents = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.split(F.col("text"), " "))
    scores = F.array(
        *[
            F.struct(
                F.size(
                    F.array_intersect(tokens, F.array(*[F.lit(m) for m in ms]))
                ).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, ms in markers.items()
        ]
    )
    best = F.array_max(scores)
    return documents.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        best.getField("lang").alias("predicted_lang"),
        best.getField("score").alias("marker_hits"),
    )
