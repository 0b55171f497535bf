"""Similarity-search queries over `embeddings` (SURVEY.md §7.6 [NEW]):
brute-force cosine top-k as the exact baseline, an LSH-bucketed
approximate variant as the scale path, embedding near-dup, and
per-label vector stats.

Dot products run JVM-side via zip_with/aggregate over array<double> —
no Python in the loop. Embeddings are cast float→double once at scan
so both engines accumulate in double precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fintech_lakehouse_spark.functions.vectors import (
    brute_force_knn,
    cosine,
    dot,
    hyperplanes,
    l2_norm,
    lsh_signature_pandas,
    with_norm,
)
from fintech_lakehouse_spark.plans._num import davg_int, sql_davg_int
from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


def _embeddings_double(
    spark: SparkSession, sf_dir: str, spread: str | None = None
) -> DataFrame:
    # ``spread`` is per-CALLER, not blanket: the r16 A/B measured the
    # conditional scan spread (readers.load_table) a 1.21× win for the
    # brute-force kNN scan but a regression for the bucketed/probed
    # consumers (lsh_bucketed_neighbors 0.71×, quantization 0.78×),
    # whose cheap scans don't amortize the extra exchange.
    emb = load_table(spark, sf_dir, "embeddings", spread=spread)
    return emb.select(
        "vec_id",
        "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )


@register(
    "knn_bruteforce_cosine",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         q   AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 10),
         c   AS (SELECT vec_id AS neighbor_id, v AS cv FROM emb WHERE vec_id >= 10),
         scored AS (
            SELECT query_id, neighbor_id,
                   list_dot_product(qv, cv)
                   / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                   AS cos
            FROM q CROSS JOIN c
         )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine_sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) <= 5
    """,
)
def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors (SURVEY §7.6
    ANN baseline). The query side is tiny → broadcast cross join, so
    the corpus streams once with no shuffle; per-query top-k via a
    keyed window. At 100 TB the same plan holds for any small query
    batch; large query batches go through lsh_bucketed_neighbors."""
    emb = _embeddings_double(spark, sf_dir, spread="vec_id")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), "embedding"
    )
    return brute_force_knn(corpus, queries, k=5).select(
        "query_id", "neighbor_id", F.round("cos", 4).alias("cosine_sim")
    )


@register(
    "embedding_near_duplicates",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cosine_sim
    FROM emb a JOIN emb b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.40
    """,
)
def embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (SURVEY §7.6 dedup family):
    all pairs with cosine > 0.40. Exact O(n²) formulation as ground
    truth — the LSH-bucketed variant below is the corpus-scale path.

    Threshold 0.40 (was 0.60): the synthetic embeddings have no pair
    above 0.6 below sf0.1, which made the driver's check a vacuous
    0 == 0 (VERDICT r2 wrong-item 3); 0.40 yields a real pair set at
    every sf (66/59/920 at sf0.001/0.01/0.1)."""
    emb = _embeddings_double(spark, sf_dir)
    a = with_norm(
        emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("va")),
        "va", "na",
    )
    b = with_norm(
        emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("vb")),
        "vb", "nb",
    )
    cos = dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(cos > 0.40)
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cosine_sim"))
    )


@register(
    "embedding_label_stats",
    oracle="""
    SELECT label,
           COUNT(*) AS n_vectors,
           ROUND(AVG(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS avg_norm,
           ROUND(MAX(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS max_norm,
           ROUND(AVG(embedding[1]), 6) AS avg_dim0
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector profile: norms + first-component mean —
    array-native aggregation (SURVEY §2.13: built-ins, no UDF)."""
    emb = _embeddings_double(spark, sf_dir)
    norm = l2_norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(norm), 4).alias("avg_norm"),
        F.round(F.max(norm), 4).alias("max_norm"),
        F.round(F.avg(F.col("embedding").getItem(0)), 6).alias("avg_dim0"),
    )


def _lsh_oracle_sql(n_planes: int = 16, dim: int = 64, seed: int = 42) -> str:
    """DuckDB twin of the full LSH pipeline: the hyperplanes are FIXED
    floats (seeded numpy, hyperplanes()), so each one is inlined as a
    64-literal DOUBLE list and bit i of the bucket signature is
    ``CASE WHEN list_dot_product(v, plane_i) >= 0``. repr() round-trips
    float64 exactly, so both engines threshold the same doubles; the
    in-bucket cosine / top-3 mirrors the knn_bruteforce_cosine oracle.
    Same technique as the minhash CTE chain (plans/text.py) — an
    "approximate" op is still deterministic given its seed, which is
    what makes a hash-green driver row possible (VERDICT r3 item 3)."""
    planes = hyperplanes(n_planes=n_planes, dim=dim, seed=seed)
    bits = " ||\n               ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in plane)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for plane in planes
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    sig AS (
        SELECT vec_id, v,
               sqrt(list_dot_product(v, v)) AS n,
               {bits} AS bucket
        FROM emb
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_dot_product(a.v, b.v) / (a.n * b.n) AS cos
        FROM sig a JOIN sig b
          ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
    )
    SELECT query_id, neighbor_id, ROUND(cos, 4) AS cosine_sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, neighbor_id) <= 3
    """


@register("lsh_bucketed_neighbors", oracle=_lsh_oracle_sql(n_planes=12))
def lsh_bucketed_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH
    (SURVEY §7.6 scale path): 12-bit sign signature per vector →
    bucket join on signature → exact cosine within bucket, top-3 per
    query. 12 planes (was 16): 2¹² buckets keeps occupancy bounded
    while yielding a non-vacuous candidate set at every test SF
    (92/1327 pairs at sf0.01/sf0.1 vs 4 with 16 bits — the vacuous-
    check lesson from VERDICT r2).

    Same-bucket candidates only: the join is linear in corpus size for
    bounded bucket occupancy, vs the O(n²) brute force. Recall is
    tunable by planes/bands. Approximate ≠ unverifiable: the seeded
    hyperplanes are constants, so the DuckDB twin (_lsh_oracle_sql)
    replays the identical signature → bucket → cosine → top-3 chain
    and the driver hash-checks the full result."""
    planes = hyperplanes(n_planes=12, dim=64, seed=42)
    # Sign signatures are scale-invariant: bucket on the RAW vectors
    # (normalizing first is pure waste), carry norms as columns for the
    # in-bucket cosine.
    emb = with_norm(_embeddings_double(spark, sf_dir), "embedding", "_n")
    sig = lsh_signature_pandas(planes)
    signed = emb.select(
        "vec_id", "embedding", "_n", sig("embedding").alias("bucket")
    )
    a = signed.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("_n").alias("qn"),
        "bucket",
    )
    b = signed.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.col("_n").alias("cn"),
        "bucket",
    )
    scored = (
        a.join(b, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    topk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(topk))
        .filter(F.col("_rn") <= 3)
        .select("query_id", "neighbor_id", F.round("cos", 4).alias("cosine_sim"))
    )


def _ivf_oracle_sql(n_probes: int = 2, k: int = 5) -> str:
    """DuckDB twin of the fixed-codebook IVF pipeline. The trained
    centroids are FROZEN literals (plans/_ivf_codebook.py — KMeans
    trained once by scripts/train_ivf_codebook.py, the r4
    lsh_bucketed_neighbors promotion applied to the trained-quantizer
    case, VERDICT r5 item 2): both engines inline the identical
    float64 reprs, rank by the identical ||c||² − 2·(v·c) expression
    with the identical dist→list_id tie-break, and score in-list
    cosine exactly like the knn_bruteforce_cosine oracle."""
    from fintech_lakehouse_spark.plans._ivf_codebook import (
        CENTROID_SQ,
        CENTROIDS,
    )

    rows = ",\n        ".join(
        f"({i}, [" + ", ".join(repr(x) for x in c) + f"]::DOUBLE[], {CENTROID_SQ[i]!r})"
        for i, c in enumerate(CENTROIDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents(list_id, c, csq) AS (VALUES
        {rows}),
    dists AS (
        SELECT e.vec_id, e.v, c.list_id,
               c.csq - 2 * list_dot_product(e.v, c.c) AS dist
        FROM emb e CROSS JOIN cents c
    ),
    corpus AS (
        SELECT vec_id, v, list_id FROM (
            SELECT vec_id, v, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, list_id) AS rn
            FROM dists WHERE vec_id >= 10
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS query_id, v AS qv, list_id FROM (
            SELECT vec_id, v, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY dist, list_id) AS rn
            FROM dists WHERE vec_id < 10
        ) WHERE rn <= {n_probes}
    ),
    scored AS (
        SELECT p.query_id, s.vec_id,
               list_dot_product(p.qv, s.v)
               / (sqrt(list_dot_product(p.qv, p.qv))
                  * sqrt(list_dot_product(s.v, s.v))) AS cos
        FROM probes p JOIN corpus s ON p.list_id = s.list_id
    )
    SELECT query_id, vec_id, ROUND(cos, 4) AS cosine_sim
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cos DESC, vec_id) <= {k}
    """


@register("ivf_approx_neighbors", oracle=_ivf_oracle_sql())
def ivf_approx_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate nearest neighbors (SURVEY §7.6 scale path #2):
    a FROZEN trained codebook (plans/_ivf_codebook.py) partitions the
    corpus into 16 inverted lists; each query probes its 2 closest
    lists and scores exact cosine within ≈1/8th of the corpus.
    Complements lsh_bucketed_neighbors (random hyperplanes vs trained
    quantizer).

    Scale shape: the codebook is plan literals — assignment is a
    zero-shuffle map over the corpus (at 100 TB you'd persist
    ``list_id`` at write time and partition by it); the probed
    queries broadcast into the single list-membership join, so the
    corpus never shuffles. Training lives OFFLINE in
    scripts/train_ivf_codebook.py exactly as a production IVF index
    trains on a sample once; the train-at-query-time library variant
    (functions/vectors.py::ivf_assign/ivf_search, pandas_udf probe
    path for wide embeddings) stays unit-tested with a recall
    contract in tests/test_functions.py."""
    from fintech_lakehouse_spark.functions.vectors import (
        ivf_assign_fixed,
        ivf_probes_fixed,
    )
    from fintech_lakehouse_spark.plans._ivf_codebook import (
        CENTROID_SQ,
        CENTROIDS,
    )

    emb = _embeddings_double(spark, sf_dir)
    corpus = ivf_assign_fixed(
        emb.filter(F.col("vec_id") >= 10), CENTROIDS, CENTROID_SQ
    )
    corpus_n = with_norm(
        corpus.select("vec_id", "list_id", F.col("embedding").alias("_cv")),
        "_cv",
        "_cn",
    )
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    probes = ivf_probes_fixed(queries, CENTROIDS, n_probes=2, centroid_sq=CENTROID_SQ)
    probe_n = with_norm(
        probes.select("query_id", F.col("embedding").alias("_qv"), "list_id"),
        "_qv",
        "_qn",
    )
    scored = corpus_n.join(F.broadcast(probe_n), "list_id").select(
        "query_id",
        "vec_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
            "cos"
        ),
    )
    topk = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(topk))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "vec_id", F.round("cos", 4).alias("cosine_sim"))
    )


@register(
    "label_text_profile",
    oracle=f"""
    SELECT e.label,
           COUNT(*) AS n_docs,
           {sql_davg_int("len(string_split(d.text, ' '))")} AS avg_tokens,
           ROUND(AVG(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))), 4) AS avg_norm,
           COUNT(DISTINCT d.lang) AS n_langs
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    GROUP BY e.label
    """,
)
def label_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal profile (SURVEY §7.6): join the text table to its
    embedding table on doc_id = vec_id and profile each embedding
    label by its TEXT characteristics — the sanity check a curation
    pipeline runs to confirm semantic clusters align with surface
    statistics (token length, language spread).

    Shape: two fact-scale tables equi-join on the id — at 100 TB both
    sides shuffle-partition on the key (or pre-bucket via
    write_bucketed_table and skip the exchange); the aggregate is
    10-label cardinality, so everything after the join is map-side.
    avg_tokens uses exact integer floor-division (plans/_num.py);
    avg_norm rounds a double mean of norms (never midpoint-aligned,
    same pattern as embedding_label_stats)."""
    emb = _embeddings_double(spark, sf_dir)
    documents = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("_n_tokens")
    )
    norm = l2_norm(F.col("embedding"))
    return (
        emb.join(documents, emb.vec_id == documents.doc_id)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            davg_int("_n_tokens").alias("avg_tokens"),
            F.round(F.avg(norm), 4).alias("avg_norm"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


@register(
    "embedding_dim_stats",
    oracle="""
    WITH vals AS (
        SELECT generate_subscripts(embedding, 1) - 1            AS dim,
               CAST(unnest(embedding) AS DOUBLE)                AS val
        FROM embeddings
    )
    SELECT dim,
           CAST(COUNT(*) AS BIGINT)                             AS n_vals,
           MIN(val)                                             AS min_val,
           MAX(val)                                             AS max_val,
           ROUND((MAX(val) - MIN(val)) / 255, 6)                AS int8_scale
    FROM vals
    GROUP BY dim
    """,
)
def embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension calibration table for int8 embedding quantization
    (SURVEY §7.6 [NEW]): global min/max per vector dimension plus the
    derived symmetric-range scale ((max−min)/255) — the table an
    affine-quantization step broadcasts to compress float32 vectors
    4× before ANN indexing at 100 TB.

    Shape: posexplode (JVM-side generator, no UDF) fans each vector
    into (dim, value) rows, then groupBy(dim) — map-side partial
    aggregation collapses every task to ≤ d rows before the shuffle,
    so the exchange moves O(tasks × d) rows regardless of corpus
    size; the result is d rows total. min/max are order-independent
    (unlike a float sum), so the values — and the scale derived from
    them in exact double arithmetic — are bit-identical across
    engines; no rounding flake."""
    emb = _embeddings_double(spark, sf_dir)
    return (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n_vals"),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .select(
            "dim",
            "n_vals",
            "min_val",
            "max_val",
            F.round((F.col("max_val") - F.col("min_val")) / 255, 6).alias(
                "int8_scale"
            ),
        )
    )


@register(
    "embedding_quantization_error",
    oracle="""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    vals AS (
        SELECT generate_subscripts(embedding, 1) - 1 AS dim,
               CAST(unnest(embedding) AS DOUBLE)     AS val
        FROM embeddings
    ),
    calib AS (
        SELECT dim, MIN(val) AS mn, (MAX(val) - MIN(val)) / 255 AS sc
        FROM vals GROUP BY dim
    ),
    cal AS (
        SELECT list(mn ORDER BY dim) AS mins, list(sc ORDER BY dim) AS scales
        FROM calib
    ),
    errs AS (
        SELECT e.vec_id,
               [CASE WHEN c.scales[i] = 0 THEN 0.0
                     ELSE ABS(c.mins[i]
                              + ROUND((e.v[i] - c.mins[i]) / c.scales[i])
                                * c.scales[i]
                              - e.v[i]) END
                FOR i IN generate_series(1, len(e.v))] AS errs
        FROM emb e CROSS JOIN cal c
    )
    SELECT vec_id,
           CAST(len(errs) AS BIGINT)            AS n_dims,
           ROUND(list_sum(errs) / len(errs), 8) AS mean_abs_err,
           ROUND(list_max(errs), 8)             AS max_abs_err
    FROM errs
    """,
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY step of int8 embedding quantization (completes the
    calibrate → quantize pipeline whose calibration table is
    embedding_dim_stats): affine-quantize every vector against the
    per-dim (min, scale) calibration — q = round((x−min)/scale) ∈
    [0,255] — dequantize, and report per-vector reconstruction error
    (the fidelity gate a pipeline checks before swapping its ANN index
    to compressed vectors).

    Scale shape: the corpus NEVER explodes — calibration is the
    embedding_dim_stats posexplode (exchange moves O(tasks×d) rows),
    its d-row result folds into ONE row of (mins, scales) arrays that
    broadcasts into a cross join, and the per-vector error is an
    in-row transform over indices. Constant dims (scale 0) quantize
    to their exact value (error 0) rather than dividing by zero —
    guarded identically in both engines.

    Parity: min/max are order-independent, so mins/scales are
    bit-identical literals by construction; round() is away-from-zero
    on non-negative inputs in both engines; the error fold accumulates
    left-to-right in both."""
    emb = _embeddings_double(spark, sf_dir)
    calib = (
        emb.select(F.posexplode("embedding").alias("dim", "val"))
        .groupBy("dim")
        .agg(
            F.min("val").alias("mn"),
            ((F.max("val") - F.min("val")) / 255).alias("sc"),
        )
    )
    cal = calib.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mn"))),
            lambda s: s["mn"],
        ).alias("mins"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "sc"))),
            lambda s: s["sc"],
        ).alias("scales"),
    )
    errs = emb.crossJoin(F.broadcast(cal)).select(
        "vec_id",
        F.expr(
            "transform(sequence(0, size(embedding) - 1), "
            "i -> IF(scales[i] = 0D, 0D, "
            "abs(mins[i] + round((embedding[i] - mins[i]) / scales[i]) "
            "* scales[i] - embedding[i])))"
        ).alias("errs"),
    )
    return errs.select(
        "vec_id",
        F.size("errs").cast("long").alias("n_dims"),
        F.round(
            F.expr("aggregate(errs, 0D, (acc, x) -> acc + x)") / F.size("errs"),
            8,
        ).alias("mean_abs_err"),
        F.round(F.array_max("errs"), 8).alias("max_abs_err"),
    )


def _cluster_balanced_oracle_sql(per_cluster: int = 3) -> str:
    """DuckDB twin of cluster_balanced_sample: same frozen-codebook
    assignment CTE as _ivf_oracle_sql (identical ||c||^2 - 2*(v.c)
    ranking with the identical dist->list_id tie-break), then a
    ROW_NUMBER over the portable md5 pick order."""
    from fintech_lakehouse_spark.plans._ivf_codebook import (
        CENTROID_SQ,
        CENTROIDS,
    )

    rows = ",\n        ".join(
        f"({i}, [" + ", ".join(repr(x) for x in c) + f"]::DOUBLE[], {CENTROID_SQ[i]!r})"
        for i, c in enumerate(CENTROIDS)
    )
    return f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents(list_id, c, csq) AS (VALUES
        {rows}),
    assigned AS (
        SELECT vec_id, list_id FROM (
            SELECT e.vec_id, c.list_id,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                      ORDER BY c.csq - 2 * list_dot_product(e.v, c.c),
                                               c.list_id) AS rn
            FROM emb e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    sized AS (
        SELECT a.*, s.cluster_size FROM assigned a
        JOIN (SELECT list_id, COUNT(*) AS cluster_size
              FROM assigned GROUP BY list_id) s USING (list_id)
    )
    SELECT list_id, cluster_size, vec_id,
           ROW_NUMBER() OVER (PARTITION BY list_id
                              ORDER BY md5('bal' || '|' || CAST(vec_id AS VARCHAR)),
                                       vec_id) AS pick_rank
    FROM sized
    QUALIFY pick_rank <= {per_cluster}
    """


@register("cluster_balanced_sample", oracle=_cluster_balanced_oracle_sql())
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced (diversity) subsampling (SURVEY §7.6 extension
    — the semantic-dedup/coverage move in training-data curation, cf.
    SemDeDup-style pipelines): assign every embedding to its nearest
    cluster of the FROZEN trained codebook (plans/_ivf_codebook.py,
    same literals as ivf_approx_neighbors), then take a fixed quota of
    3 vectors per cluster, picked by the portable md5 hash of vec_id —
    a deterministic, engine-replayable stand-in for random-per-cluster
    sampling. Output carries cluster_size so the balance the sample
    corrects (raw cluster mass vs flat quota) is visible.

    Scale shape: codebook assignment is plan literals — a zero-shuffle
    map over the corpus. The per-cluster quota is picked by a
    TWO-PHASE top-k: phase 1 takes local top-3-by-hash per
    (cluster, input partition) via mapPartitions-free aggregation —
    here a window over (list_id, salt) where salt bounds every
    partition — phase 2 re-ranks the <= 3*64 survivors per cluster.
    With only 16 clusters, a single window PARTITION BY list_id would
    funnel the full corpus through 16 tasks; the salted first phase
    keeps every task bounded while remaining exact (the global top-3
    is always inside the union of local top-3s). Cluster sizes ride
    the SAME salted window stage as a count() over the identical
    partitioning (r10 — a separate groupBy consumer re-evaluated the
    whole literal-codebook assignment, the query's dominant cost,
    a second time: the two-consecutive-round +25% watch item's root
    cause); every survivor carries its salt group's count, and the
    16 true sizes re-aggregate from the <= 3*64*16 survivor rows."""
    from pyspark.sql import Window as _W

    from fintech_lakehouse_spark.functions.vectors import ivf_assign_fixed
    from fintech_lakehouse_spark.plans._ivf_codebook import (
        CENTROID_SQ,
        CENTROIDS,
    )

    emb = _embeddings_double(spark, sf_dir)
    assigned = ivf_assign_fixed(emb, CENTROIDS, CENTROID_SQ).select(
        "vec_id", "list_id"
    )
    pick = F.md5(
        F.concat_ws("|", F.lit("bal"), F.col("vec_id").cast("string")).cast(
            "binary"
        )
    )
    salted = assigned.withColumn("_pick", pick).withColumn(
        "_salt", F.pmod(F.xxhash64("vec_id"), F.lit(64))
    )
    local_w = _W.partitionBy("list_id", "_salt").orderBy("_pick", "vec_id")
    count_w = _W.partitionBy("list_id", "_salt")
    survivors = salted.withColumn(
        "_lrn", F.row_number().over(local_w)
    ).withColumn("_ln", F.count(F.lit(1)).over(count_w)).filter(
        F.col("_lrn") <= 3
    )
    # exact: every non-empty (list_id, salt) group keeps its rank-1
    # survivor carrying the group's full count, so summing _ln over
    # the rank-1 rows of the list reconstructs the true cluster size
    # from <= 3*64 rows — ONE lineage, no second scan, no join (the
    # list_id window below is needed for the final rank anyway)
    list_w = _W.partitionBy("list_id")
    final_w = _W.partitionBy("list_id").orderBy("_pick", "vec_id")
    return (
        survivors.withColumn(
            "cluster_size",
            F.sum(
                F.when(F.col("_lrn") == 1, F.col("_ln")).otherwise(F.lit(0))
            ).over(list_w),
        )
        .withColumn("pick_rank", F.row_number().over(final_w))
        .filter(F.col("pick_rank") <= 3)
        .select("list_id", "cluster_size", "vec_id", "pick_rank")
    )


def _jl_oracle_sql() -> str:
    """DuckDB twin of the JL distortion pipeline: the frozen ±1 matrix
    (plans/_jl_matrix.py) is inlined as integer literals, projections
    are list_dot_product(v, s_j)/4 (√16 = 4, exact binary), and both
    distances round to 4 decimals like every float query in the
    registry."""
    from fintech_lakehouse_spark.plans._jl_matrix import K, SIGNS

    assert K == 16  # scale 1/4 below is exact only for k = 16
    proj = ", ".join(
        "list_dot_product(v, ["
        + ", ".join(f"{s}.0" for s in row)
        + "]::DOUBLE[]) / 4"
        for row in SIGNS
    )
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    proj AS (
        SELECT vec_id, v, [{proj}]::DOUBLE[] AS p FROM emb
    ),
    q AS (SELECT vec_id AS query_id, v AS qv, p AS qp
          FROM proj WHERE vec_id < 5),
    c AS (SELECT vec_id, v AS cv, p AS cp
          FROM proj WHERE vec_id >= 10 AND vec_id < 200)
    SELECT q.query_id, c.vec_id,
           ROUND(list_dot_product(qv, qv) + list_dot_product(cv, cv)
                 - 2 * list_dot_product(qv, cv), 4) AS dist_sq,
           ROUND(list_dot_product(qp, qp) + list_dot_product(cp, cp)
                 - 2 * list_dot_product(qp, cp), 4) AS proj_dist_sq
    FROM q CROSS JOIN c
    """


@register("jl_projection_distortion", oracle=_jl_oracle_sql())
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random-projection sketching under the
    driver hash (SURVEY §7.6 similarity-search family): every
    embedding is projected 64 → 16 dims through the FROZEN ±1 matrix
    (plans/_jl_matrix.py — md5-derived, inlined identically in plan
    and oracle, the _ivf_codebook pattern without a training step),
    then every (query, corpus) pair in a bounded 5×190 grid emits its
    TRUE squared L2 distance next to its PROJECTED squared distance.
    The driver hashes both, so the check replays the whole pipeline —
    sign literals, per-row projection, pair distances — and any
    distortion statistics downstream (mean |ratio−1| ≈ √(2/k)) are
    derivable from the verified columns rather than asserted.

    Scale shape: the projection is a zero-shuffle JVM map (16 literal
    dot products per row — the IVF-assignment shape); at 100 TB the
    16-dim sketch column is what candidate generation runs on, cutting
    shuffle volume 4× before any exact re-rank. The pair grid here is
    deliberately bounded (the brute-force twin of the LSH/IVF
    candidate paths); nothing in the plan is all-pairs on the corpus."""
    from fintech_lakehouse_spark.functions.vectors import jl_project
    from fintech_lakehouse_spark.plans._jl_matrix import SIGNS

    emb = _embeddings_double(spark, sf_dir)
    proj = emb.select(
        "vec_id",
        "embedding",
        jl_project(F.col("embedding"), SIGNS).alias("p"),
    )
    q = proj.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("p").alias("qp"),
    )
    c = proj.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 200)).select(
        "vec_id",
        F.col("embedding").alias("cv"),
        F.col("p").alias("cp"),
    )
    return F.broadcast(q).crossJoin(c).select(
        "query_id",
        "vec_id",
        F.round(
            dot(F.col("qv"), F.col("qv"))
            + dot(F.col("cv"), F.col("cv"))
            - 2 * dot(F.col("qv"), F.col("cv")),
            4,
        ).alias("dist_sq"),
        F.round(
            dot(F.col("qp"), F.col("qp"))
            + dot(F.col("cp"), F.col("cp"))
            - 2 * dot(F.col("qp"), F.col("cp")),
            4,
        ).alias("proj_dist_sq"),
    )


@register(
    "embedding_anisotropy",
    oracle="""
    WITH dims AS (
        SELECT generate_subscripts(embedding, 1) AS dim,
               unnest(embedding::DOUBLE[]) AS x
        FROM embeddings
    ),
    mean_vec AS (
        SELECT SUM(avg_x * avg_x) AS mean_norm_sq
        FROM (SELECT dim, AVG(x) AS avg_x FROM dims GROUP BY dim)
    ),
    norms AS (
        SELECT AVG(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS avg_norm_sq,
               CAST(COUNT(*) AS BIGINT) AS n_vectors
        FROM embeddings
    )
    SELECT n_vectors,
           ROUND(mean_norm_sq, 6) AS mean_vec_norm_sq,
           ROUND(avg_norm_sq, 6)  AS avg_norm_sq,
           ROUND(mean_norm_sq / avg_norm_sq, 6) AS anisotropy
    FROM mean_vec, norms
    """,
)
def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space anisotropy diagnostic (Ethayarajh 2019 /
    Mu & Viswanath 2018 all-but-the-top — public results): the ratio
    ‖mean vector‖² / E‖v‖², which equals the expected pairwise cosine
    for normalized vectors. Near 0 = isotropic (directions spread);
    near 1 = a dominant common direction — the condition that breaks
    cosine-based retrieval/dedup and motivates mean-centering before
    the ANN/near-dup pipelines in this repo. Run this BEFORE trusting
    any cosine threshold on a new embedding table.

    Shape: per-dimension means via posexplode + groupBy(dim) — the
    shuffle is O(tasks × 64) partials, never vector-cardinality — and
    one scan-level norm aggregate; both collapse to a 1×1 join.
    No pairwise anything: the identity E[cos(u,v)] = ‖mean‖²/E‖v‖²
    (normalized case) is what makes the statistic computable in one
    pass at 100 TB."""
    emb = _embeddings_double(spark, sf_dir)
    dims = emb.select(
        F.posexplode("embedding").alias("dim", "x")
    )
    mean_vec = (
        dims.groupBy("dim")
        .agg(F.avg("x").alias("avg_x"))
        .agg(F.sum(F.col("avg_x") * F.col("avg_x")).alias("mean_norm_sq"))
    )
    norms = emb.agg(
        F.avg(dot(F.col("embedding"), F.col("embedding"))).alias(
            "avg_norm_sq"
        ),
        F.count(F.lit(1)).alias("n_vectors"),
    )
    return norms.crossJoin(F.broadcast(mean_vec)).select(
        "n_vectors",
        F.round("mean_norm_sq", 6).alias("mean_vec_norm_sq"),
        F.round("avg_norm_sq", 6).alias("avg_norm_sq"),
        F.round(F.col("mean_norm_sq") / F.col("avg_norm_sq"), 6).alias(
            "anisotropy"
        ),
    )


MMR_LAMBDA = 0.7
MMR_POOL = 10


@register(
    "mmr_diverse_rerank",
    oracle=f"""
    WITH emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT v AS qv FROM emb WHERE vec_id = 0),
    pool AS (
        SELECT vec_id, cv, rel FROM (
            SELECT c.vec_id, c.v AS cv,
                   list_dot_product(q.qv, c.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(c.v, c.v))) AS rel,
                   ROW_NUMBER() OVER (ORDER BY
                       list_dot_product(q.qv, c.v)
                       / (sqrt(list_dot_product(q.qv, q.qv))
                          * sqrt(list_dot_product(c.v, c.v))) DESC,
                       c.vec_id) AS rn
            FROM emb c CROSS JOIN q WHERE c.vec_id >= 10
        ) WHERE rn <= {MMR_POOL}
    ),
    s1 AS (SELECT vec_id, cv, rel FROM pool
           ORDER BY rel DESC, vec_id LIMIT 1),
    m2 AS (
        SELECT p.vec_id, p.cv, p.rel,
               {MMR_LAMBDA} * p.rel - {1 - MMR_LAMBDA:.1f} *
               (list_dot_product(p.cv, s.cv)
                / (sqrt(list_dot_product(p.cv, p.cv))
                   * sqrt(list_dot_product(s.cv, s.cv)))) AS mmr
        FROM pool p CROSS JOIN s1 s WHERE p.vec_id != s.vec_id
    ),
    s2 AS (SELECT vec_id, cv, rel, mmr FROM m2
           ORDER BY mmr DESC, vec_id LIMIT 1),
    m3 AS (
        SELECT p.vec_id, p.rel,
               {MMR_LAMBDA} * p.rel - {1 - MMR_LAMBDA:.1f} * GREATEST(
                   list_dot_product(p.cv, a.cv)
                   / (sqrt(list_dot_product(p.cv, p.cv))
                      * sqrt(list_dot_product(a.cv, a.cv))),
                   list_dot_product(p.cv, b.cv)
                   / (sqrt(list_dot_product(p.cv, p.cv))
                      * sqrt(list_dot_product(b.cv, b.cv)))) AS mmr
        FROM pool p CROSS JOIN s1 a CROSS JOIN s2 b
        WHERE p.vec_id NOT IN (a.vec_id, b.vec_id)
    ),
    s3 AS (SELECT vec_id, rel, mmr FROM m3
           ORDER BY mmr DESC, vec_id LIMIT 1)
    SELECT 1 AS rank, vec_id, ROUND(rel, 4) AS relevance,
           ROUND(rel, 4) AS mmr_score FROM s1
    UNION ALL
    SELECT 2, vec_id, ROUND(rel, 4), ROUND(mmr, 4) FROM s2
    UNION ALL
    SELECT 3, vec_id, ROUND(rel, 4), ROUND(mmr, 4) FROM s3
    """,
)
def mmr_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998 — the diversity-aware selection step after retrieval in RAG
    pipelines: pick results that are relevant to the query AND
    dissimilar to what is already picked, so 3 near-duplicate top hits
    don't crowd out coverage). Greedy selection is inherently
    sequential in k, so the driver-checked instance unrolls k=3 exactly
    (argmax_c λ·rel(c) − (1−λ)·max_{{s∈S}} sim(c,s), λ=0.7) over the
    cosine top-10 candidate pool of query vector 0; both engines run
    the identical unrolled plan, so the hash check replays every
    selection step. The general-k per-query-group form is
    functions/vectors.py::mmr_rerank_pandas (applyInPandas — the
    data-dependent greedy loop a UDF genuinely owns), unit-tested
    against this unrolled instance.

    Scale shape: MMR cost is k·|pool| sims per QUERY, never
    corpus-sized — the pool (top-N from knn/IVF/LSH, N≈10-100) is the
    only input; here each selection step is a 1-row broadcast argmax
    over the 10-row pool. At 100 TB thousands of queries re-rank in
    parallel via the applyInPandas form, one group per query."""
    lam = MMR_LAMBDA
    emb = _embeddings_double(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    rel = cosine(F.col("embedding"), F.col("qv"))
    pool = (
        emb.filter(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.col("embedding").alias("cv"), rel.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
    )
    s1 = pool.orderBy(F.desc("rel"), F.asc("vec_id")).limit(1)
    sim_to = lambda other: cosine(F.col("cv"), F.col(other))  # noqa: E731
    m2 = (
        pool.crossJoin(
            F.broadcast(
                s1.select(
                    F.col("vec_id").alias("_s1"), F.col("cv").alias("acv")
                )
            )
        )
        .filter(F.col("vec_id") != F.col("_s1"))
        .select(
            "vec_id", "cv", "rel",
            (lam * F.col("rel") - (1 - lam) * sim_to("acv")).alias("mmr"),
        )
    )
    s2 = m2.orderBy(F.desc("mmr"), F.asc("vec_id")).limit(1)
    m3 = (
        pool.crossJoin(
            F.broadcast(
                s1.select(
                    F.col("vec_id").alias("_s1"), F.col("cv").alias("acv")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                s2.select(
                    F.col("vec_id").alias("_s2"), F.col("cv").alias("bcv")
                )
            )
        )
        .filter(
            (F.col("vec_id") != F.col("_s1"))
            & (F.col("vec_id") != F.col("_s2"))
        )
        .select(
            "vec_id", "rel",
            (
                lam * F.col("rel")
                - (1 - lam) * F.greatest(sim_to("acv"), sim_to("bcv"))
            ).alias("mmr"),
        )
    )
    s3 = m3.orderBy(F.desc("mmr"), F.asc("vec_id")).limit(1)
    return (
        s1.select(
            F.lit(1).alias("rank"), "vec_id",
            F.round("rel", 4).alias("relevance"),
            F.round("rel", 4).alias("mmr_score"),
        )
        .unionByName(
            s2.select(
                F.lit(2).alias("rank"), "vec_id",
                F.round("rel", 4).alias("relevance"),
                F.round("mmr", 4).alias("mmr_score"),
            )
        )
        .unionByName(
            s3.select(
                F.lit(3).alias("rank"), "vec_id",
                F.round("rel", 4).alias("relevance"),
                F.round("mmr", 4).alias("mmr_score"),
            )
        )
    )


KM_K = 8
KM_DIM = 64
KM_SCALE = 1000
KM_OFFSET = 1024


def _km_quant_sql() -> str:
    return (
        f"[CAST(floor(x * {KM_SCALE}.0) AS BIGINT) + {KM_OFFSET} "
        "FOR x IN embedding::DOUBLE[]]"
    )


def _km_assign_sql(cents: str, this: str) -> str:
    """One unrolled Lloyd assignment as DuckDB CTEs: exact integer
    squared distance per (vector, centroid), argmin via
    ROW_NUMBER ORDER BY (dist, cid) — the same lowest-cid tie-break as
    the Spark side's strict < over the cid-sorted centroid pack."""
    return f"""
    {this}_d AS (
        SELECT v.vec_id, v.q, c.cid,
               list_sum([ (v.q[i] - c.c[i]) * (v.q[i] - c.c[i])
                          FOR i IN range(1, {KM_DIM + 1}) ]) AS dist
        FROM qv v CROSS JOIN {cents} c
    ),
    {this} AS (
        SELECT vec_id, q, cid, CAST(dist AS BIGINT) AS dist FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY vec_id ORDER BY dist, cid) AS rn
            FROM {this}_d
        ) WHERE rn = 1
    )"""


def _km_update_sql(assigned: str, this: str) -> str:
    """One unrolled Lloyd update: per-(cluster, dim) integer sums,
    floor-divided by the member count (non-negative operands, so
    DuckDB // == Spark div), re-packed with list(... ORDER BY i)."""
    return f"""
    {this}_s AS (
        SELECT a.cid, t.i, SUM(a.q[t.i]) // COUNT(*) AS s
        FROM {assigned} a CROSS JOIN range(1, {KM_DIM + 1}) t(i)
        GROUP BY a.cid, t.i
    ),
    {this} AS (
        SELECT cid, list(CAST(s AS BIGINT) ORDER BY i) AS c
        FROM {this}_s GROUP BY cid
    )"""


@register(
    "kmeans_lloyd_clusters",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id, {_km_quant_sql()} AS q FROM embeddings
    ),
    c0 AS (SELECT vec_id AS cid, q AS c FROM qv WHERE vec_id < {KM_K}),
    {_km_assign_sql('c0', 'a1').lstrip()},
    {_km_update_sql('a1', 'c1').lstrip()},
    {_km_assign_sql('c1', 'a2').lstrip()},
    {_km_update_sql('a2', 'c2').lstrip()},
    {_km_assign_sql('c2', 'a3').lstrip()}
    SELECT a.cid AS cluster_id,
           COUNT(*) AS n_members,
           CAST(SUM(a.dist) AS BIGINT) AS inertia_q,
           CAST(ANY_VALUE(list_sum([e - {KM_OFFSET} FOR e IN c.c]))
                AS BIGINT) AS centroid_sum_q
    FROM a3 a JOIN c2 c ON a.cid = c.cid
    GROUP BY a.cid
    ORDER BY cluster_id
    """,
)
def kmeans_lloyd_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means TRAINING as one lazy DataFrame plan — two
    Lloyd iterations (assign → update, ×2) plus a final assignment,
    k=8 seeded from the vectors with the k smallest vec_ids. The
    iterative-ML-training shape next to dup_graph_pagerank's iterative
    graph shape: the frozen-codebook IVF query (ivf_approx_neighbors)
    APPLIES a trained quantizer; this query IS the training loop,
    hash-checked end-to-end. Reports per-cluster size, integer inertia
    (sum of squared quantized distances — the quantity Lloyd
    monotonically decreases), and a centroid checksum.

    Determinism design (the dup_graph_pagerank trick, applied to ML):
    coordinates are shift-quantized to non-negative integers
    (functions/vectors.py::kmeans_quantize), distances and centroid
    means are exact integer arithmetic with floor division, ties break
    to the lowest cid on both engines — so the DuckDB twin replays all
    five unrolled stages bit-for-bit. Float k-means is
    order-dependent; integer micro-units make an iterative trainer
    hash-checkable.

    Scale shape: each assignment is a MAP-ONLY pass — the k centroids
    collapse to one broadcast row and the argmin runs inside a
    higher-order aggregate (functions/vectors.py::kmeans_assign), so
    the corpus NEVER shuffles on assignment; each update's per-dim
    sums are map-side combined to ≤ k rows per task before a
    tiny-bytes shuffle (kmeans_update). Total corpus-sized shuffles
    for the whole training loop: zero. The lazy unroll does re-scan
    the corpus once per chain level (runtime ReusedExchange dedups the
    doubly-consumed final-centroid subtree; measured ~6 effective
    corpus passes for 2 iterations — bounded by the fixed unroll
    depth, never iteration-quadratic in bytes shuffled). At 100 TB
    you keep this plan's per-iteration shape but materialize the k
    centroids between iterations (spark.ml KMeans collects them to
    the driver each step — k×dim doubles, trivially small), trading
    the single-lazy-plan replayability this hash-checked instance
    needs for one scan per iteration; codebook training also samples
    the corpus first (scripts/train_ivf_codebook.py).

    Reference parity: the reference has no ML training surface (its
    transformations layer is empty — SURVEY §0); this extends the
    §7.6 LLM-pipeline family (clustering for curation: SemDeDup's
    cluster stage, IVF codebooks, cluster-balanced sampling all
    consume exactly this loop's output).
    """
    from fintech_lakehouse_spark.functions.vectors import (
        kmeans_assign,
        kmeans_quantize,
        kmeans_update,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id", kmeans_quantize(F.col("embedding"), KM_SCALE, KM_OFFSET).alias("q")
    )
    c0 = vectors.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    a1 = kmeans_assign(vectors, c0)
    c1 = kmeans_update(a1, KM_DIM)
    a2 = kmeans_assign(vectors, c1)
    c2 = kmeans_update(a2, KM_DIM)
    a3 = kmeans_assign(vectors, c2)
    stats = a3.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist").alias("inertia_q"),
    )
    cent_sum = c2.select(
        "cid",
        F.aggregate(
            "c",
            F.lit(0).cast("long"),
            lambda acc, e: acc + e - F.lit(KM_OFFSET),
        ).alias("centroid_sum_q"),
    )
    return (
        stats.join(cent_sum, "cid")
        .select(
            F.col("cid").alias("cluster_id"),
            "n_members",
            "inertia_q",
            "centroid_sum_q",
        )
        .orderBy("cluster_id")
    )


@register(
    "nearest_centroid_accuracy",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id, label, {_km_quant_sql()} AS q FROM embeddings
    ),
    cm_s AS (
        SELECT label AS cid, t.i, SUM(q[t.i]) // COUNT(*) AS s
        FROM qv CROSS JOIN range(1, {KM_DIM + 1}) t(i)
        GROUP BY label, t.i
    ),
    cents AS (
        SELECT cid, list(CAST(s AS BIGINT) ORDER BY i) AS c
        FROM cm_s GROUP BY cid
    ),
    {_km_assign_sql('cents', 'pred').lstrip()}
    SELECT CAST(v.label AS BIGINT) AS label,
           CAST(p.cid AS BIGINT)   AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           CAST(SUM(CASE WHEN v.label = p.cid THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS cell_correct_ppm
    FROM pred p JOIN qv v USING (vec_id)
    GROUP BY v.label, p.cid
    ORDER BY label, predicted
    """,
)
def nearest_centroid_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classifier evaluation over the
    labeled embeddings — the supervised composition of the Lloyd
    machinery (kmeans_update fits one centroid PER LABEL, kmeans_assign
    predicts by nearest centroid) into a confusion matrix: per
    (true label, predicted label) counts with the diagonal flagged in
    exact ppm. The embedding-space companion of lang_id_confusion
    (which evaluates the text-feature classifier) and the quality
    gate for the cluster-based curation ops — if nearest-centroid
    cannot separate the labels, SemDeDup-style cluster pruning is
    operating on noise.

    Same determinism contract as kmeans_lloyd_clusters: shift-
    quantized non-negative integers, floor-divided means, exact
    integer distances, lowest-cid ties — the DuckDB twin replays
    fit + predict bit-for-bit.

    Scale shape: fitting is one map-side-combinable groupBy (the
    |labels| centroids are the only shuffle payload); prediction is
    the map-only broadcast-pack argmin; the label join-back rides the
    vec_id key; output is |labels|²-bounded."""
    from fintech_lakehouse_spark.functions.vectors import (
        kmeans_assign,
        kmeans_quantize,
        kmeans_update,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        kmeans_quantize(F.col("embedding"), KM_SCALE, KM_OFFSET).alias("q"),
    )
    cents = kmeans_update(
        vectors.select(F.col("label").alias("cid"), "q"), KM_DIM
    )
    pred = kmeans_assign(vectors.select("vec_id", "q"), cents)
    return (
        pred.join(vectors.select("vec_id", "label"), "vec_id")
        .groupBy("label", F.col("cid").alias("predicted"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vectors"),
            F.expr(
                "SUM(CASE WHEN label = cid THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(1)"
            )
            .cast("long")
            .alias("cell_correct_ppm"),
        )
        .orderBy("label", "predicted")
    )


def _ann_recall_oracle() -> str:
    from fintech_lakehouse_spark.plans.registry import ORACLES

    return f"""
    WITH bf AS ({ORACLES["knn_bruteforce_cosine"]}),
         iv AS ({ORACLES["ivf_approx_neighbors"]})
    SELECT b.query_id,
           CAST(COUNT(*) AS BIGINT)      AS n_exact,
           CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT)               AS n_hit,
           CAST(SUM(CASE WHEN i.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*)
                AS BIGINT)               AS recall_ppm
    FROM bf b
    LEFT JOIN iv i
      ON i.query_id = b.query_id AND i.vec_id = b.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """


@register("ann_recall_eval", oracle=_ann_recall_oracle())
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index-quality evaluation — recall@5 of the IVF index
    against the exact brute-force ground truth, per query (the eval
    harness every vector-search deployment runs before trusting an
    approximate index, and the driver-checked closure of the ANN
    family: knn_bruteforce_cosine and ivf_approx_neighbors are each
    hash-checked individually; this query pins their RELATIONSHIP).
    recall_ppm = |approx top-5 ∩ exact top-5| · 1e6 / 5 in floor-
    divided integer ppm.

    Determinism: both sides inherit the total (cos DESC, id)
    tie-breaks of the underlying queries, so the two top-5 SETS are
    engine-identical and the intersection count is exact integer
    arithmetic — no float enters this query at all (the cosines stay
    inside the sub-plans).

    Scale shape: strictly the union of the two sub-plans (each
    documented at its own registration — query side broadcasts,
    corpus never shuffles) plus a join and aggregate over the
    10×5-row result frames. At 100 TB the eval cost is the
    brute-force pass over the sampled query set — exactly how
    production indexes are audited (ground truth on a query SAMPLE,
    never the full corpus)."""
    exact = knn_bruteforce_cosine(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("nid")
    )
    approx = ivf_approx_neighbors(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("nid"), F.lit(1).alias("hit")
    )
    # both sides are k×|queries| rows — broadcast the approx side so
    # the comparison never sort-merge-shuffles two 50-row frames
    return (
        exact.join(F.broadcast(approx), ["query_id", "nid"], "left")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hit"),
            F.expr("COUNT(hit) * 1000000 DIV COUNT(1)")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def _mrr_oracle() -> str:
    from fintech_lakehouse_spark.plans.registry import ORACLES

    return f"""
    WITH bf AS ({ORACLES["knn_bruteforce_cosine"]}),
         iv AS ({ORACLES["ivf_approx_neighbors"]}),
         top1 AS (
            SELECT query_id, neighbor_id AS top1_id FROM bf
            QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cosine_sim DESC,
                                                neighbor_id) = 1
         ),
         ranked AS (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC,
                                               vec_id) AS rnk
            FROM iv
         )
    SELECT t.query_id,
           CAST(t.top1_id AS BIGINT)                    AS top1_id,
           CAST(r.rnk AS BIGINT)                        AS approx_rank,
           CAST(COALESCE(1000000 // r.rnk, 0) AS BIGINT) AS rr_ppm
    FROM top1 t
    LEFT JOIN ranked r
      ON r.query_id = t.query_id AND r.vec_id = t.top1_id
    ORDER BY t.query_id
    """


@register("retrieval_mrr_eval", oracle=_mrr_oracle())
def retrieval_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-reciprocal-rank evaluation of the IVF index — the RANKING
    companion of ann_recall_eval's set-overlap recall (recall@5 says
    whether the right answers appear; MRR says how HIGH the single
    best answer lands, the metric retrieval/RAG stacks actually report
    for first-hit quality): per query, find the exact brute-force
    TOP-1 neighbor inside the approximate top-5, emit its rank and the
    reciprocal rank in floor-divided integer ppm (1e6 DIV rank — exact
    arithmetic on both engines, no float enters this query).

    Determinism: both sub-plans emit ROUND(cos, 4) values that are
    hash-checked engine-identical, so the (cosine DESC, id) row_number
    ranks are identical too; a miss (top-1 absent from the approx
    list) yields NULL rank and rr_ppm 0.

    Scale shape: strictly the two sub-plans (corpus never shuffles in
    either; see their registrations) plus window + broadcast join over
    k×|queries| rows — the ground-truth pass over a query SAMPLE is
    how production indexes are audited, never the full corpus."""
    exact = knn_bruteforce_cosine(spark, sf_dir)
    w_bf = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    top1 = (
        exact.withColumn("rn", F.row_number().over(w_bf))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("neighbor_id").alias("top1_id"))
    )
    w_iv = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("vec_id")
    )
    ranked = ivf_approx_neighbors(spark, sf_dir).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        F.row_number().over(w_iv).cast("long").alias("approx_rank"),
    )
    return (
        top1.join(
            F.broadcast(ranked),
            (top1["query_id"] == ranked["query_id"])
            & (F.col("top1_id") == F.col("nid")),
            "left",
        )
        .select(
            top1["query_id"],
            "top1_id",
            "approx_rank",
            F.coalesce(
                F.expr("1000000 DIV approx_rank"), F.lit(0)
            )
            .cast("long")
            .alias("rr_ppm"),
        )
        .orderBy("query_id")
    )


def _pq_assign_sql(elem) -> list[str]:
    """Per-subspace PQ assignment expressions — ONE text generator for
    both engines (``elem(i)`` renders the 1-based subscript of the
    double-array column in that engine's syntax; the struct-literal /
    sort idioms differ and are handled by the caller-provided
    templates in ``elem.struct`` / ``elem.first``): for subspace s,
    the sorted-first of [(squared L2 distance to centroid c, c)] —
    struct ordering is lexicographic on BOTH engines, so the smallest
    distance wins with the centroid id as the deterministic
    tie-break."""
    from fintech_lakehouse_spark.plans._pq_codebook import (
        CODEBOOK,
        K,
        M,
        SUBDIM,
    )

    out = []
    for s in range(M):
        structs = []
        for c in range(K):
            terms = " + ".join(
                f"({elem(s * SUBDIM + j + 1)} - "
                f"({CODEBOOK[s][c][j]}/1000.0)) * "
                f"({elem(s * SUBDIM + j + 1)} - "
                f"({CODEBOOK[s][c][j]}/1000.0))"
                for j in range(SUBDIM)
            )
            structs.append(elem.struct.format(d=terms, c=c))
        out.append(elem.first.format(items=", ".join(structs)))
    return out


def _pq_oracle_sql() -> str:
    def elem(i: int) -> str:
        return f"v[{i}]"

    elem.struct = "{{'d': {d}, 'c': {c}}}"
    elem.first = "list_sort([{items}])[1]"
    assigns = _pq_assign_sql(elem)
    code = ", ".join(f"CAST(a{s}.c AS VARCHAR)" for s in range(len(assigns)))
    err = " + ".join(f"a{s}.d" for s in range(len(assigns)))
    named = ", ".join(f"{a} AS a{s}" for s, a in enumerate(assigns))
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    assigned AS (
        SELECT vec_id, {named} FROM emb
    )
    SELECT vec_id,
           concat_ws('-', {code}) AS pq_code,
           ROUND({err}, 6) AS sq_err
    FROM assigned
    """


@register("pq_quantization_distortion", oracle=_pq_oracle_sql())
def pq_quantization_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode + distortion audit (Jégou et al.
    2011 — the third member of the compression family next to int8
    affine quantization and JL projection): every embedding splits
    into 8 contiguous 8-dim subvectors, each assigned to the nearest
    of 16 FROZEN centroids (plans/_pq_codebook.py, md5-derived and
    inlined identically in plan and oracle — the _ivf_codebook
    technique), emitting the 8-symbol PQ code (the 4-bit-per-subspace
    compressed representation, 64 floats → 4 bytes) and the exact
    reconstruction squared error. The driver hash replays codebook
    literals, per-subspace argmin, and the error sum — bit-for-bit
    across engines because both build the IDENTICAL float expression
    tree (the embedding_quantization_error precedent) with ROUND only
    at the end.

    Argmin determinism: each subspace sorts [(distance, centroid_id)]
    structs and takes the first — lexicographic struct ordering on
    both engines makes centroid_id the tie-break, so equal distances
    can never flip the code across engines or shuffles.

    Scale shape: a ZERO-SHUFFLE map over the corpus — 8×16 literal
    distance evaluations per row (the IVF-assignment / JL-projection
    shape; the 1024-literal codebook is a few KB of plan). At 100 TB
    this is the encode pass an ANN pipeline runs once before storing
    4-byte codes; ADC search then probes lookup tables instead of raw
    vectors. The generated expression exceeds whole-stage-codegen's
    method budget and evaluates interpreted — the trade for a
    bit-replayable frozen codebook. The PRODUCTION twin is
    functions/vectors.py::pq_encode_pandas (r9, VERDICT r8 item 7):
    Arrow-batched NumPy against the codebook as a worker constant,
    unit-asserted bit-identical codes/distortion and measured 5.5×
    faster at sf0.1 (0.38 s vs 2.1 s — the interpreted literal tree is
    the cost of oracle replayability, not of PQ)."""

    def elem(i: int) -> str:
        return f"element_at(v, {i})"

    elem.struct = "named_struct('d', {d}, 'c', {c})"
    elem.first = "array_sort(array({items}))[0]"
    assigns = _pq_assign_sql(elem)
    emb = _embeddings_double(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    assigned = emb.select(
        "vec_id",
        *[F.expr(a).alias(f"a{s}") for s, a in enumerate(assigns)],
    )
    code = F.concat_ws(
        "-", *[F.col(f"a{s}.c").cast("string") for s in range(len(assigns))]
    )
    err = None
    for s in range(len(assigns)):
        d = F.col(f"a{s}.d")
        err = d if err is None else err + d
    return assigned.select(
        "vec_id",
        code.alias("pq_code"),
        F.round(err, 6).alias("sq_err"),
    )


def _pq_centroid_lookup(elem_arr, s: int = 0, code: str = "c0") -> str:
    """Literal centroid-array lookup for subspace ``s`` indexed by the
    assigned code (1-based on both engines): renders
    <array-of-16-arrays-literal>[code + 1] in the engine syntax given
    by ``elem_arr`` (a format template with {items} and {idx})."""
    from fintech_lakehouse_spark.plans._pq_codebook import CODEBOOK, SUBDIM

    rows = ", ".join(
        elem_arr.inner.format(
            vals=", ".join(
                f"({CODEBOOK[s][c][j]}/1000.0)" for j in range(SUBDIM)
            )
        )
        for c in range(len(CODEBOOK[s]))
    )
    return elem_arr.outer.format(items=rows, idx=code)


def _pq_adc_sql() -> str:
    """DuckDB twin of the ADC search: corpus codes from the shared
    encode CTE, per-subspace centroid lookup by code, asymmetric
    distance = Σ_s ||q_s − C_s[code_s]||², exact distance alongside,
    top-5 per query."""
    from fintech_lakehouse_spark.plans._pq_codebook import M, SUBDIM

    def elem(i: int) -> str:
        return f"v[{i}]"

    elem.struct = "{{'d': {d}, 'c': {c}}}"
    elem.first = "list_sort([{items}])[1]"
    assigns = _pq_assign_sql(elem)
    codes = ", ".join(f"{a}.c AS c{s}" for s, a in enumerate(assigns))

    class arr:
        inner = "[{vals}]::DOUBLE[]"
        outer = "([{items}])[{idx} + 1]"

    # the 128-literal codebook array renders ONCE per subspace (the
    # decoded CTE); the distance terms then reference the hoisted
    # cent{s} columns — inlining the literal into every squared term
    # made the SQL ~16k literals and parse time dominated
    cents = ", ".join(
        f"{_pq_centroid_lookup(arr, s, f'c{s}')} AS cent{s}"
        for s in range(M)
    )
    dist_terms = []
    for s in range(M):
        for j in range(SUBDIM):
            dist_terms.append(
                f"(qv[{s * SUBDIM + j + 1}] - cent{s}[{j + 1}])"
                f" * (qv[{s * SUBDIM + j + 1}] - cent{s}[{j + 1}])"
            )
    adc = " + ".join(dist_terms)
    return f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    corpus AS (
        SELECT vec_id, v, {codes} FROM emb WHERE vec_id >= 10
    ),
    decoded AS (
        SELECT vec_id, v, {cents} FROM corpus
    ),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3),
    scored AS (
        SELECT query_id, c.vec_id,
               {adc} AS adc,
               list_dot_product(qv, qv) + list_dot_product(c.v, c.v)
                 - 2 * list_dot_product(qv, c.v) AS exact_d
        FROM q CROSS JOIN decoded c
    )
    SELECT query_id, vec_id,
           ROUND(adc, 6) AS adc_dist_sq,
           ROUND(exact_d, 6) AS exact_dist_sq
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY adc, vec_id) <= 5
    ORDER BY query_id, adc, vec_id
    """


@register("pq_adc_topk", oracle=_pq_adc_sql())
def pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — the QUERY side of
    product quantization (Jégou et al. 2011 §IV): the corpus exists
    only as 8-symbol PQ codes (from pq_quantization_distortion's
    encode), each query computes its distance to a code by summing
    per-subspace distances to the code's centroid — the raw corpus
    vector is never touched at search time (only the exact column
    here, kept for distortion visibility, reads it). Top-5 per query
    by ADC distance with vec_id tie-break, exact squared L2 alongside
    so ADC-vs-exact ranking error is auditable from verified columns.

    Scale shape: search cost is |queries| × corpus CODE table (4-byte
    codes at production width, not 256-byte floats) with the queries
    broadcast — the memory-bandwidth win that makes PQ the standard
    billion-vector index layout; at 100 TB the per-(query, subspace)
    16-entry lookup tables make the inner loop table lookups, which
    this declarative form expresses as literal centroid indexing.
    Same determinism machinery as the encode query: frozen codebook
    literals, identical float trees, ROUND at the end, struct-sort
    argmin tie-breaks."""
    from fintech_lakehouse_spark.plans._pq_codebook import M, SUBDIM

    def elem(i: int) -> str:
        return f"element_at(v, {i})"

    elem.struct = "named_struct('d', {d}, 'c', {c})"
    elem.first = "array_sort(array({items}))[0]"
    assigns = _pq_assign_sql(elem)

    class arr:
        inner = "array({vals})"
        outer = "element_at(array({items}), {idx} + 1)"

    # hoist each subspace's literal centroid lookup into ONE column;
    # the distance terms reference cent{s} (see the oracle's comment)
    dist_terms = []
    for s in range(M):
        for j in range(SUBDIM):
            dist_terms.append(
                f"(element_at(qv, {s * SUBDIM + j + 1})"
                f" - element_at(cent{s}, {j + 1}))"
                f" * (element_at(qv, {s * SUBDIM + j + 1})"
                f" - element_at(cent{s}, {j + 1}))"
            )
    adc = " + ".join(dist_terms)

    emb = _embeddings_double(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    corpus = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id",
        "v",
        *[F.expr(f"{a}.c").alias(f"c{s}") for s, a in enumerate(assigns)],
    )
    corpus = corpus.select(
        "vec_id",
        "v",
        *[
            F.expr(_pq_centroid_lookup(arr, s, f"c{s}")).alias(f"cent{s}")
            for s in range(M)
        ],
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    exact = (
        dot(F.col("qv"), F.col("qv"))
        + dot(F.col("v"), F.col("v"))
        - 2 * dot(F.col("qv"), F.col("v"))
    )
    scored = (
        F.broadcast(q)
        .crossJoin(corpus)
        .select(
            "query_id",
            "vec_id",
            F.expr(adc).alias("adc"),
            exact.alias("exact_d"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("vec_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select(
            "query_id",
            "vec_id",
            F.round("adc", 6).alias("adc_dist_sq"),
            F.round("exact_d", 6).alias("exact_dist_sq"),
        )
        .orderBy("query_id", "adc_dist_sq", "vec_id")
    )


def kmeans_lloyd_train(
    spark: SparkSession,
    sf_dir: str,
    iterations: int = 2,
    checkpoint: bool = False,
) -> DataFrame:
    """Library form of the Lloyd training loop behind
    ``kmeans_lloyd_clusters`` with the iteration strategy explicit —
    the third consumer of operators/graph.py::iterate_edges (VERDICT
    r7 item 2 named kcore, PageRank, AND Lloyd):

    * ``checkpoint=False`` — the registry query's single lazy plan
      (bit-replayable by the unrolled DuckDB oracle; ~3 corpus scans
      per chain level, bounded by the fixed unroll depth).
    * ``checkpoint=True`` — the 100 TB shape the registry docstring
      describes: the k-row centroid table localCheckpoints between
      iterations (iterate_edges), so every iteration is EXACTLY one
      corpus scan (assign+update against a centroid leaf) and plan
      size stays O(one iteration) at any iteration count — what
      spark.ml's KMeans does with a driver collect, done engine-side.

    Both strategies compute identical centroids for any iteration
    count (exact integer arithmetic, deterministic ties — unit-pinned),
    so the strategy is a pure execution choice, never a semantics one.
    Returns the final (cid, c) centroid table."""
    from fintech_lakehouse_spark.functions.vectors import (
        kmeans_assign,
        kmeans_quantize,
        kmeans_update,
    )
    from fintech_lakehouse_spark.operators.graph import iterate_edges

    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(
        "vec_id",
        kmeans_quantize(F.col("embedding"), KM_SCALE, KM_OFFSET).alias("q"),
    )
    cents = vectors.filter(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    if not checkpoint:
        for _ in range(iterations):
            cents = kmeans_update(kmeans_assign(vectors, cents), KM_DIM)
        return cents
    cents, _, _ = iterate_edges(
        cents,
        lambda c, _i: kmeans_update(kmeans_assign(vectors, c), KM_DIM),
        iterations,
        checkpoint_input=True,
    )
    return cents


def _pq_recall_oracle() -> str:
    from fintech_lakehouse_spark.plans.registry import ORACLES

    return f"""
    WITH adc AS ({ORACLES["pq_adc_topk"]}),
    emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3),
    c AS (SELECT vec_id, v AS cv FROM emb WHERE vec_id >= 10),
    exact AS (
        SELECT query_id, vec_id
        FROM (
            SELECT query_id, vec_id,
                   list_dot_product(qv, qv) + list_dot_product(cv, cv)
                     - 2 * list_dot_product(qv, cv) AS d
            FROM q CROSS JOIN c
        )
        QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY d, vec_id) <= 5
    )
    SELECT e.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_hit,
           CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS recall_ppm
    FROM exact e
    LEFT JOIN adc a ON a.query_id = e.query_id AND a.vec_id = e.vec_id
    GROUP BY e.query_id
    ORDER BY e.query_id
    """


@register("pq_recall_eval", oracle=_pq_recall_oracle())
def pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ index-quality evaluation — recall@5 of ADC search against
    the exact squared-L2 ground truth, per query: the
    ``ann_recall_eval`` harness applied to the compression family's
    search path, closing the PQ trio (encode distortion → ADC search →
    quality number). Both sub-plans are hash-checked individually;
    this query pins their RELATIONSHIP as a driver-checked value —
    the number a deployment reads before swapping raw vectors for
    4-byte codes.

    Determinism: both top-5 sets inherit total (distance, vec_id)
    orderings from their sub-plans, so the intersection count is exact
    integer arithmetic; no float enters this query.

    Scale shape: the union of the two sub-plans plus a join/aggregate
    over 15-row frames. At 100 TB this is the sampled-query audit
    (ground truth on a query SAMPLE, never the full corpus) — the PQ
    literature's standard recall@R protocol.

    Honest-number note: on this lake's RANDOM 64-dim embeddings —
    the adversarial case for any quantizer, per the IVF recall note —
    the trained 4-bit-per-subspace codebook lands recall@5 of 0-1/5
    per query (the md5 bootstrap codebook scored 0/5 everywhere,
    which is why scripts/train_pq_codebook.py exists); real embedding
    manifolds cluster, random vectors don't. The VALUE the driver
    checks is the exact intersection count, whatever the recall."""
    emb = _embeddings_double(spark, sf_dir).select(
        "vec_id", F.col("embedding").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= 10).select(
        "vec_id", F.col("v").alias("cv")
    )
    d = (
        dot(F.col("qv"), F.col("qv"))
        + dot(F.col("cv"), F.col("cv"))
        - 2 * dot(F.col("qv"), F.col("cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d"), F.asc("vec_id"))
    exact = (
        F.broadcast(q)
        .crossJoin(c)
        .select("query_id", "vec_id", d.alias("d"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .select("query_id", "vec_id")
    )
    approx = pq_adc_topk(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("avid"), F.lit(1).alias("hit")
    )
    return (
        exact.join(
            F.broadcast(approx),
            (exact["query_id"] == approx["query_id"])
            & (exact["vec_id"] == approx["avid"]),
            "left",
        )
        .drop(approx["query_id"])
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("long")
            .alias("n_hit"),
            F.expr(
                "SUM(COALESCE(hit, 0)) * 1000000 DIV COUNT(1)"
            )
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("query_id")
    )
