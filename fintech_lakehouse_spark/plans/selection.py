"""Data-selection extensions (SURVEY §7.6 training-data pipeline,
round-6 session 4) — the three selection/filtering stages a pretraining
corpus pipeline runs AFTER dedup and BEFORE mixing:

- ``dsir_importance_weights`` — DSIR (Xie et al., "Data Selection for
  Language Models via Importance Resampling", NeurIPS 2023): score raw
  documents by hashed-unigram importance ratios against a target
  domain, the principled way to upsample target-like raw data. Here in
  exact integer micro-unit arithmetic so the DuckDB twin hash-matches.
- ``duplicate_span_runs`` — the suffix-array substring-dedup analog
  (Lee et al., "Deduplicating Training Data Makes Language Models
  Better", ACL 2022): find the LONGEST exactly-duplicated token span
  between document pairs, not just set overlap. Re-expressed as a
  gaps-and-islands detection over shared positional 8-grams — consecutive
  shared grams on the same alignment diagonal form a run, and a run of
  R grams is a duplicated span of R+7 tokens.
- ``quality_classifier_scores`` — the fasttext-style linear quality
  filter (the GPT-3/LLaMA WebText-vs-CommonCrawl classifier shape):
  hashed bag-of-words features × a frozen weight vector, sign of the
  mean activation decides keep/drop. The weight table here is a frozen
  deterministic stand-in (md5-derived), exactly like the frozen IVF
  codebook (plans/_ivf_codebook.py): a really-trained fasttext model
  drops in as a broadcast map without changing the plan shape.

Own module so rotation front-loads the new queries into the next
driver window (plans/__init__.py).

Reference parity: the reference has no selection stage at all (its
transformations layer is empty — SURVEY §0); these are the
beyond-reference LLM-pipeline operators the build brief requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.functions.sampling import (
    hash_bucket,
    sql_hash_bucket,
)
from fintech_lakehouse_spark.functions.text import tokens
from fintech_lakehouse_spark.functions.vectors import dot, with_norm
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# Portable hashed-feature buckets (the md5 contract of
# functions/sampling.py, with query-specific salts and moduli).

DSIR_BUCKETS = 1024  # hashed unigram feature space (DSIR §2.2 uses 10k)
DSIR_SCALE = 1_000_000  # importance ratios in exact micro-units
QF_BUCKETS = 4096  # quality-classifier feature space
QF_WEIGHT_SPAN = 1000  # frozen weights in [-1000, 1000] micro-units

SPAN_GRAM = 8  # positional gram width (tokens)
SPAN_HOT_DOCS = 100  # boilerplate grams in > this many docs are dropped
SPAN_MIN_RUN = 2  # >= 2 consecutive grams → span of >= 9 tokens




# Shared CTE prefix for the two DSIR oracles: hashed-unigram
# occurrences + the Laplace-smoothed target/raw bucket-count models.
_DSIR_MODELS_SQL = f"""
    occ AS (
        SELECT doc_id, lang,
               {sql_hash_bucket('unnest(string_split(text, chr(32)))', 'dsir', DSIR_BUCKETS)} AS fb
        FROM documents
    ),
    tgt AS (
        SELECT fb, COUNT(*) AS c FROM occ WHERE lang = 'en' GROUP BY fb
    ),
    raw AS (
        SELECT fb, COUNT(*) AS c FROM occ WHERE lang <> 'en' GROUP BY fb
    )"""


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH {_DSIR_MODELS_SQL}
    SELECT o.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(SUM(({DSIR_SCALE} * (COALESCE(t.c, 0) + 1))
                    // (COALESCE(r.c, 0) + 1)) AS BIGINT) AS sum_ratio_micro,
           CAST(SUM(({DSIR_SCALE} * (COALESCE(t.c, 0) + 1))
                    // (COALESCE(r.c, 0) + 1)) // COUNT(*) AS BIGINT)
               AS avg_ratio_micro
    FROM occ o
    LEFT JOIN tgt t ON o.fb = t.fb
    LEFT JOIN raw r ON o.fb = r.fb
    WHERE o.lang <> 'en'
    GROUP BY o.doc_id
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): estimate hashed
    bag-of-unigrams models for a target domain (here lang='en', the
    "high-quality target" stand-in) and for the raw pool (every other
    language), then weight each raw document by its per-token feature
    ratio — target-like raw documents get high weights and survive the
    importance-resampling draw.

    Exact-arithmetic variant of the paper's log-likelihood ratio: the
    additive per-occurrence ratio ``(SCALE*(n_target+1)) DIV
    (n_raw+1)`` (Laplace-smoothed, integer floor division, micro-unit
    scale) replaces ``log p_tgt - log p_raw``. A summed log-ratio is a
    float accumulation across a shuffle — unpinnable cross-engine
    (ROUND_NOTES fact 29); the integer sum is exact on both engines
    and order-isomorphic to the paper's score for ranking purposes
    within a document length class.

    Scale shape: one token explode feeds BOTH count models and the
    scoring pass; the two models are bucket-bounded (1024 rows each)
    and broadcast into the scoring join, so the corpus never shuffles
    — the whole query is scan + explode + two broadcast hash joins +
    one map-side-combinable groupBy(doc_id). At 100 TB the models stay
    1024 rows regardless of corpus size; only N_BUCKETS grows (DSIR
    uses 10k), never the join strategy."""
    return _dsir_scored(spark, sf_dir).drop("lang")


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, n_toks, sum_ratio_micro, avg_ratio_micro) for
    every raw-pool (non-target) document — the shared scoring plan
    behind dsir_importance_weights and dsir_resampled_corpus."""
    documents = load_table(spark, sf_dir, "documents")
    occ = documents.select(
        "doc_id",
        "lang",
        F.explode(tokens()).alias("tok"),
    ).select(
        "doc_id",
        "lang",
        hash_bucket("tok", "dsir", DSIR_BUCKETS).alias("fb"),
    )
    tgt = (
        occ.filter(F.col("lang") == "en")
        .groupBy("fb")
        .agg(F.count(F.lit(1)).alias("tgt_c"))
    )
    raw = (
        occ.filter(F.col("lang") != "en")
        .groupBy("fb")
        .agg(F.count(F.lit(1)).alias("raw_c"))
    )
    scored = (
        occ.filter(F.col("lang") != "en")
        .join(F.broadcast(tgt), "fb", "left")
        .join(F.broadcast(raw), "fb", "left")
        .withColumn(
            "ratio_micro",
            F.expr(
                f"({DSIR_SCALE} * (COALESCE(tgt_c, 0) + 1))"
                " DIV (COALESCE(raw_c, 0) + 1)"
            ),
        )
    )
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("ratio_micro").alias("sum_ratio_micro"),
        )
        .withColumn(
            "avg_ratio_micro", F.expr("sum_ratio_micro DIV n_toks")
        )
    )


@register(
    "dsir_resampled_corpus",
    oracle=f"""
    WITH {_DSIR_MODELS_SQL},
    w AS (
        SELECT o.doc_id, o.lang,
               CAST(COUNT(*) AS BIGINT) AS n_toks,
               CAST(SUM(({DSIR_SCALE} * (COALESCE(t.c, 0) + 1))
                        // (COALESCE(r.c, 0) + 1)) // COUNT(*) AS BIGINT)
                   AS avg_r
        FROM occ o
        LEFT JOIN tgt t ON o.fb = t.fb
        LEFT JOIN raw r ON o.fb = r.fb
        WHERE o.lang <> 'en'
        GROUP BY o.doc_id, o.lang
    ),
    mx AS (SELECT MAX(avg_r) AS wmax FROM w),
    drawn AS (
        SELECT lang, n_toks,
               CASE WHEN {sql_hash_bucket('doc_id', 'dsirdraw')} * wmax
                         < avg_r * 10000
                    THEN 1 ELSE 0 END AS kept
        FROM w, mx
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(kept) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN kept = 1 THEN n_toks ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM drawn
    GROUP BY lang
    """,
)
def dsir_resampled_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "R" in DSIR — the importance-resampling DRAW that turns the
    weights into an actual corpus subset: keep document d with
    probability w(d)/w_max, decided by the portable md5 hash bucket
    (functions/sampling.py contract) instead of rand(), so the drawn
    corpus is identical across runs, retries, and repartitionings —
    the reproducibility a 100 TB selection job cannot get from rand().
    Acceptance test in exact cross-multiplied integers:
    ``u · w_max < w · 10000`` with u = bucket(doc_id) ∈ [0, 10000)
    (no float division anywhere, so the DuckDB twin is bit-exact; at
    production scale normalize the weights first so the product stays
    inside 64 bits).

    Output is the selection manifest per language: candidates, kept
    docs, kept token mass — the numbers a mixture designer reads to
    see what the target model actually up/down-weighted.

    Scale shape: the scoring plan is dsir_importance_weights'
    (broadcast models, corpus never shuffles); the draw adds ONE
    1-row global max joined back via broadcast nested-loop (the
    1-row crossJoin pattern of quality/checker.py) and a per-lang
    final aggregate — nothing new shuffles except ≤ n_langs rows."""
    w = _dsir_scored(spark, sf_dir)
    wmax = w.agg(F.max("avg_ratio_micro").alias("wmax"))
    drawn = w.crossJoin(F.broadcast(wmax)).withColumn(
        "kept",
        F.when(
            hash_bucket("doc_id", "dsirdraw")
            * F.col("wmax")
            < F.col("avg_ratio_micro") * 10_000,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return drawn.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("kept").alias("n_kept"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_toks")).otherwise(0)).alias(
            "kept_tokens"
        ),
    )


@register(
    "duplicate_span_runs",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, chr(32)) AS toks FROM documents
        WHERE len(string_split(text, chr(32))) >= {SPAN_GRAM}
    ),
    g AS (
        SELECT doc_id,
               unnest(range(0, len(toks) - {SPAN_GRAM - 1})) AS p,
               unnest([('0x' || substr(md5(
                          array_to_string(toks[i:i+{SPAN_GRAM - 1}], chr(32))
                       ), 1, 15))::BIGINT
                       FOR i IN range(1, len(toks) - {SPAN_GRAM - 2})]) AS gkey
        FROM t
    ),
    shared AS (
        SELECT gkey FROM g GROUP BY gkey
        HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND {SPAN_HOT_DOCS}
    ),
    cold AS (
        SELECT * FROM g WHERE gkey IN (SELECT gkey FROM shared)
    ),
    hits AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.p AS pa, a.p - b.p AS diag
        FROM cold a JOIN cold b ON a.gkey = b.gkey
        WHERE a.doc_id < b.doc_id
    ),
    runs AS (
        SELECT doc_a, doc_b, diag,
               pa - ROW_NUMBER() OVER (
                   PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp,
               pa
        FROM hits
    ),
    spans AS (
        SELECT doc_a, doc_b, COUNT(*) + {SPAN_GRAM - 1} AS span_tokens
        FROM runs GROUP BY doc_a, doc_b, diag, grp
        HAVING COUNT(*) >= {SPAN_MIN_RUN}
    )
    SELECT doc_a, doc_b,
           CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_spans
    FROM spans GROUP BY doc_a, doc_b
    """,
)
def duplicate_span_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest exactly-duplicated token span per document pair — the
    distributed analog of suffix-array substring dedup (Lee et al.
    2022 build one suffix array over the whole corpus; that is a
    single-machine construction that does not shard). Equivalent
    observation: a duplicated span of S >= GRAM tokens appears as
    S-GRAM+1 CONSECUTIVE shared positional grams on one alignment
    diagonal (pos_a - pos_b constant), so runs of shared grams
    reconstruct exact span lengths without any suffix array.

    Plan: positional 8-gram FINGERPRINTS — each gram maps scan-side to
    a 60-bit md5 key (the winnowing_fingerprints recipe, bit-exact on
    both engines), so the shuffles carry 8-byte longs instead of
    ~70-byte strings — then a key-frequency BAND filter (> 100 docs =
    boilerplate, same skew bound as test_set_decontamination; < 2 docs
    = singleton, can never form a duplicated span), then an
    inverted-index self-join on the key — linear in SHARED keys, never
    total grams or doc-pairs — followed by the classic
    gaps-and-islands grouping: within (pair, diagonal), consecutive
    positions share ``pos - row_number()``, one group per run. The
    window partition is (pair, diagonal) — bounded by true overlap, so
    no global sort and no skewed partition at 100 TB. Runs shorter
    than SPAN_MIN_RUN grams (span < {SPAN_GRAM + SPAN_MIN_RUN - 1}
    tokens) are noise and dropped before the final per-pair max.

    The singleton drop + key fingerprinting are what flattened the
    1M-doc scale curve (VERDICT r7 weak item 1: the join/span shuffles
    used to carry every singleton gram as a full string, O(G log G) in
    TOTAL gram bytes). Fingerprint collisions (~2^-26 odds of ANY at
    52M grams) are deterministic and identical across engines — the
    md5 is the shared definition — so the driver hash check is immune;
    a collision could at worst merge two grams' band counts, the same
    approximation winnowing already accepts."""
    documents = load_table(spark, sf_dir, "documents")
    toks = F.col("_toks")
    tokenized = documents.select("doc_id", tokens().alias("_toks")).filter(
        F.size(toks) >= SPAN_GRAM
    )
    key_arr = F.transform(
        F.sequence(F.lit(0), F.size(toks) - SPAN_GRAM),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ", *[toks[i + j] for j in range(SPAN_GRAM)]
                    ).cast("binary")
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    grams = tokenized.select(
        "doc_id", F.posexplode(key_arr).alias("p", "gkey")
    ).repartition("gkey")
    # one groupBy serves both band bounds; the semi join reuses the
    # repartition("gkey") exchange
    shared = (
        grams.groupBy("gkey")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter((F.col("nd") >= 2) & (F.col("nd") <= SPAN_HOT_DOCS))
        .select("gkey")
    )
    cold = grams.join(shared, "gkey", "left_semi")
    a = cold.select(
        F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"), "gkey"
    )
    b = cold.select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"), "gkey"
    )
    hits = (
        a.join(b, "gkey")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", (F.col("pa") - F.col("pb")).alias("diag"))
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = hits.withColumn("grp", F.col("pa") - F.row_number().over(w))
    spans = (
        runs.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg((F.count(F.lit(1)) + (SPAN_GRAM - 1)).alias("span_tokens"))
        .filter(F.col("span_tokens") >= SPAN_GRAM + SPAN_MIN_RUN - 1)
    )
    return spans.groupBy("doc_a", "doc_b").agg(
        F.max("span_tokens").cast("long").alias("max_span_tokens"),
        F.count(F.lit(1)).alias("n_spans"),
    )


@register(
    "quality_classifier_scores",
    oracle=f"""
    WITH occ AS (
        SELECT doc_id,
               {sql_hash_bucket('unnest(string_split(text, chr(32)))', 'qf', QF_BUCKETS)} AS fb
        FROM documents
    ),
    w AS (
        SELECT doc_id,
               (('0x' || substr(md5('qw' || '|' || CAST(fb AS VARCHAR)), 1, 12))::BIGINT
                % {2 * QF_WEIGHT_SPAN + 1}) - {QF_WEIGHT_SPAN} AS wt
        FROM occ
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_toks,
           CAST(SUM(wt) AS BIGINT) AS score_sum_micro,
           CAST((SUM(wt) + {QF_WEIGHT_SPAN} * COUNT(*)) // COUNT(*)
                - {QF_WEIGHT_SPAN} AS BIGINT) AS score_avg_micro,
           CAST(CASE WHEN SUM(wt) >= 0 THEN 1 ELSE 0 END AS BIGINT) AS keep_flag
    FROM w
    GROUP BY doc_id
    """,
)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier scoring — the fasttext-shaped filter
    (hashed bag-of-words × weight vector, threshold on the mean
    activation) that GPT-3-style pipelines run to keep WebText-like
    pages. The weight vector here is FROZEN and md5-derived (weight of
    feature bucket b = md5('qw|'||b) mapped to [-1000, 1000]
    micro-units) — the same frozen-model technique that made the IVF
    codebook hash-checkable (plans/_ivf_codebook.py): swap in really
    trained weights as a broadcast map / literal CASE and the plan is
    unchanged.

    Shape: weight lookup is a PURE FUNCTION of the token (two md5s),
    so the whole classifier is scan + project + map-side-combinable
    groupBy(doc_id) — no join, no broadcast, no shuffle beyond the
    final per-doc aggregate. That is the ideal 100 TB plan: a real
    4096-float weight vector would be a broadcast map lookup with the
    identical profile.

    Integer-division care: Spark ``DIV`` truncates toward zero while
    DuckDB ``//`` floors (relational_r6 fact), and the mean activation
    CAN be negative — so the mean is computed on the shifted
    non-negative sum ``score + 1000·n`` and un-shifted after, keeping
    both engines in the positive range where DIV and // agree."""
    documents = load_table(spark, sf_dir, "documents")
    occ = documents.select("doc_id", F.explode(tokens()).alias("tok")).select(
        "doc_id", hash_bucket("tok", "qf", QF_BUCKETS).alias("fb")
    )
    wt_hash = F.md5(
        F.concat_ws("|", F.lit("qw"), F.col("fb").cast("string")).cast("binary")
    )
    wt = (
        F.conv(F.substring(wt_hash, 1, 12), 16, 10).cast("long")
        % (2 * QF_WEIGHT_SPAN + 1)
        - QF_WEIGHT_SPAN
    )
    return (
        occ.withColumn("wt", wt)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("wt").alias("score_sum_micro"),
        )
        .withColumn(
            "score_avg_micro",
            F.expr(
                f"(score_sum_micro + {QF_WEIGHT_SPAN} * n_toks) DIV n_toks"
                f" - {QF_WEIGHT_SPAN}"
            ),
        )
        .withColumn(
            "keep_flag",
            F.when(F.col("score_sum_micro") >= 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )


N_ANCHORS = 50  # anchor batch for triplet mining (vec_id < 50)


@register(
    "hard_negative_pairs",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    a AS (
        SELECT vec_id AS anchor_id, label AS al, v AS av
        FROM emb WHERE vec_id < {N_ANCHORS}
    ),
    s AS (
        SELECT anchor_id, al, vec_id AS cand_id, label AS cl,
               list_dot_product(av, v)
               / (sqrt(list_dot_product(av, av))
                  * sqrt(list_dot_product(v, v))) AS cos
        FROM a CROSS JOIN emb
    ),
    neg AS (
        SELECT anchor_id, cand_id AS hard_neg_id, cos AS ncos
        FROM s WHERE cl <> al
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cos DESC, cand_id) = 1
    ),
    pos AS (
        SELECT anchor_id, cand_id AS hard_pos_id, cos AS pcos
        FROM s WHERE cl = al AND cand_id <> anchor_id
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY anchor_id ORDER BY cos ASC, cand_id) = 1
    )
    SELECT n.anchor_id, hard_neg_id, ROUND(ncos, 4) AS neg_cosine,
           hard_pos_id, ROUND(pcos, 4) AS pos_cosine,
           ROUND(pcos - ncos, 4) AS margin
    FROM neg n JOIN pos p ON n.anchor_id = p.anchor_id
    """,
)
def hard_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative / triplet mining over the embedding space — the
    contrastive-training data op (the miner behind every
    sentence-embedding / retrieval fine-tune): for each anchor in the
    batch, the MOST similar different-label vector (the hard negative
    that teaches the boundary) and the LEAST similar same-label vector
    (the hard positive), plus the triplet margin pos−neg. Negative
    margins mark anchors whose hardest negative is already closer than
    their farthest positive — exactly the triplets a contrastive loss
    needs.

    Plan shape (the knn_bruteforce_cosine contract): the anchor batch
    is small and BROADCASTS into one streaming pass over the corpus —
    the corpus never shuffles; both argmax/argmin reductions ride the
    same scored stream through keyed windows partitioned by anchor
    (≤ corpus rows per anchor, no global sort). Norms are attached as
    columns BEFORE the join (with_norm) so each row's fold runs once,
    not once per pair (functions/vectors.py:32 CollapseProject note).
    At 100 TB the anchor batch stays the training batch (thousands) —
    same plan; corpus-scale mining goes through the LSH/IVF bucketed
    paths first and this exact miner runs within buckets.

    Ties in cosine break by candidate id on BOTH engines, so the
    argmax rows hash-match even for equal-valued doubles."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    corpus = with_norm(emb, "v", "_cn")
    anchors = with_norm(
        emb.filter(F.col("vec_id") < N_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("al"),
            F.col("v").alias("av"),
        ),
        "av",
        "_an",
    )
    scored = corpus.crossJoin(F.broadcast(anchors)).select(
        "anchor_id",
        "al",
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cl"),
        (dot(F.col("av"), F.col("v")) / (F.col("_an") * F.col("_cn"))).alias(
            "cos"
        ),
    )
    w_neg = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").desc(), F.col("cand_id")
    )
    neg = (
        scored.filter(F.col("cl") != F.col("al"))
        .withColumn("_rn", F.row_number().over(w_neg))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("hard_neg_id"),
            F.col("cos").alias("ncos"),
        )
    )
    w_pos = Window.partitionBy("anchor_id").orderBy(
        F.col("cos").asc(), F.col("cand_id")
    )
    pos = (
        scored.filter(
            (F.col("cl") == F.col("al"))
            & (F.col("cand_id") != F.col("anchor_id"))
        )
        .withColumn("_rn", F.row_number().over(w_pos))
        .filter(F.col("_rn") == 1)
        .select(
            "anchor_id",
            F.col("cand_id").alias("hard_pos_id"),
            F.col("cos").alias("pcos"),
        )
    )
    # both sides are anchor-bounded (one row per anchor) — broadcast
    # the join-up rather than letting it fall to sort-merge
    return neg.join(F.broadcast(pos), "anchor_id").select(
        "anchor_id",
        "hard_neg_id",
        F.round("ncos", 4).alias("neg_cosine"),
        "hard_pos_id",
        F.round("pcos", 4).alias("pos_cosine"),
        F.round(F.col("pcos") - F.col("ncos"), 4).alias("margin"),
    )
