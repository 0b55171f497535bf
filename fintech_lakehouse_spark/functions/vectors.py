"""Vector / embedding building blocks (SURVEY §7.6 similarity search).

JVM-side array arithmetic (zip_with / aggregate) — Arrow-free, UDF-free
— so the dot product lives inside whole-stage codegen. For very wide
embeddings (≥1k dims) a vectorized pandas_udf can win; at 64-256 dims
the built-ins are faster than the Arrow round-trip.
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf type hints resolve

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + left-fold aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def jl_project(vec: Column, signs: list[list[int]]) -> Column:
    """Johnson-Lindenstrauss ±1 projection (Achlioptas 2001,
    database-friendly random projections): out[j] = (1/√k)·Σ_d
    signs[j][d]·vec[d]. The sign matrix arrives as plan literals (the
    frozen-codebook pattern — plans/_jl_matrix.py), so the projection
    is a zero-shuffle JVM-side map over the corpus: k dot products per
    row, no Python, no exchange. At 100 TB this is the cheap
    dimensionality-reduction front of an ANN/cluster pipeline — store
    the k-dim sketch next to the vector and run candidate generation
    on 4× less data."""
    import math

    scale = 1.0 / math.sqrt(len(signs))
    if isinstance(vec, str):
        name = vec
    else:
        # Column → its field name. ADVICE r11 low: recovering it from
        # _jc.toString() breaks on expression Columns (SQL text lands
        # inside the backticked reference below) and on Spark Connect
        # (no _jc at all) — accept only a BARE column reference and
        # fail loud on anything else.
        import re as _re

        raw = (
            vec._jc.toString()
            if hasattr(vec, "_jc")
            else str(vec).removeprefix("Column<'").removesuffix("'>")
        )
        if not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", raw):
            raise ValueError(
                "jl_project needs a column NAME (str) or a bare column "
                f"reference, got the expression {raw!r} — alias it to a "
                "column first"
            )
        name = raw
    rows = []
    for row in signs:
        arr = ", ".join(_sql_double(float(s)) for s in row)
        rows.append(
            f"aggregate(zip_with(`{name}`, array({arr}), "
            "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x) * "
            f"{_sql_double(scale)}"
        )
    # ONE parsed expression instead of k×d Column ops (the
    # centroid_candidates_sql rationale — py4j round-trips per
    # operator dominate the build); arithmetic order and literals are
    # bit-identical to the Column form
    return F.expr("array(" + ", ".join(rows) + ")")


def l2_normalize(df: DataFrame, vec: str = "embedding") -> DataFrame:
    """Unit-normalize a vector column — a WRITE-TIME operator: persist
    (or cache) the result before fanning out. Left in a lazy plan,
    Catalyst's CollapseProject inlines the norm into the divide lambda
    and re-evaluates the fold per element (measured 3-8× slower in the
    kNN hot loop — that is why the query paths carry norms as separate
    columns via with_norm instead)."""
    return (
        df.withColumn("_norm", l2_norm(F.col(vec)))
        .withColumn(
            vec,
            F.when(
                F.col("_norm") > 0,
                F.transform(F.col(vec), lambda x: x / F.col("_norm")),
            ).otherwise(F.col(vec)),
        )
        .drop("_norm")
    )


def with_norm(df: DataFrame, vec: str = "embedding", out: str = "_norm") -> DataFrame:
    """Attach the L2 norm as a scalar column. A Project below a join
    survives optimization (CollapseProject only merges adjacent
    projections), so each row's norm fold runs exactly once even when
    the row then participates in many join pairs."""
    return df.withColumn(out, l2_norm(F.col(vec)))


def hyperplanes(n_planes: int = 16, dim: int = 64, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(embedding: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature string: bit i = sign(embedding · plane_i).
    Vectors with equal signatures are cosine-close with probability
    rising in signature length — the bucket key for approximate NN.

    Pure-JVM formulation; for more than a handful of planes prefer
    lsh_signature_pandas — this literal tree (planes × dim constants)
    is expensive to codegen."""
    plane_arrays = F.array(
        *[F.array(*[F.lit(float(x)) for x in plane]) for plane in planes]
    )
    return F.concat_ws(
        "",
        *[
            F.when(dot(embedding, plane_arrays[i]) >= 0, "1").otherwise("0")
            for i in range(len(planes))
        ],
    )


def lsh_signature_pandas(planes: list[list[float]]):
    """Arrow-vectorized signature: one numpy matmul per batch instead
    of a planes×dim literal expression tree (the JVM version spends
    more compiling codegen than computing at small plane counts, and
    scales worse at large ones). Returns a pandas_udf Column factory.
    Bit i = sign(v · plane_i), identical to lsh_signature."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64).T  # (dim, planes)

    @pandas_udf("string")
    def _sig(embeddings: pd.Series) -> pd.Series:
        vecs = np.vstack(embeddings.to_numpy())  # (batch, dim)
        bits = (vecs @ mat) >= 0  # (batch, planes)
        return pd.Series(
            ["".join("1" if b else "0" for b in row) for row in bits]
        )

    return _sig


def centroid_candidates(
    vec: Column, centroids: list[list[float]], centroid_sq: list[float] | None = None
) -> Column:
    """array<struct<dist,list_id>> of rank-equivalent squared
    distances to each centroid: dist = ||c||² − 2·(v·c) (the ||v||²
    term is constant per row, so argmin/argsort are unchanged by
    dropping it). Pure-JVM expression tree — no Python, no Arrow —
    so a fixed codebook can be replayed verbatim by a SQL oracle:
    the fold in ``dot`` accumulates left-to-right exactly like
    DuckDB's list_dot_product loop, and struct ordering breaks
    distance ties on the lower list_id, same as ORDER BY dist,
    list_id. ``centroid_sq`` lets the caller pin ||c||² to the exact
    literal its oracle inlines (computed here otherwise)."""
    if centroid_sq is None:
        centroid_sq = [sum(x * x for x in c) for c in centroids]
    return F.array(
        *[
            F.struct(
                (
                    F.lit(float(centroid_sq[i]))
                    - 2.0 * dot(vec, F.array(*[F.lit(float(x)) for x in c]))
                ).alias("dist"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def _sql_double(x: float) -> str:
    """Render a Python float as a Spark SQL DOUBLE literal. repr()
    round-trips float64 exactly and the 'D' suffix keeps the parser
    off the DECIMAL default, so the parsed literal is bit-identical
    to F.lit(float(x))."""
    r = repr(float(x))
    if r in ("inf", "-inf", "nan"):
        raise ValueError(f"non-finite centroid component {x!r}")
    return f"({r}D)"


def centroid_candidates_sql(
    vec: str, centroids: list[list[float]], centroid_sq: list[float] | None = None
) -> str:
    """SQL-text twin of :func:`centroid_candidates`, built as ONE
    string for ONE F.expr call (r11, VERDICT r10 item 1): composing
    the 16×64-literal tree through Column algebra costs one py4j
    round-trip PER operator — ~2.3 s of pure driver-side Python per
    ivf_approx_neighbors build, 3× the query's actual execution.
    Parsing the identical expression from text is a single call; the
    Catalyst tree, the left-fold arithmetic, and the (dist, list_id)
    tie-break are unchanged, so results stay bit-identical (unit-
    pinned against the Column form, and the driver hash check replays
    the same floats in DuckDB)."""
    if centroid_sq is None:
        centroid_sq = [sum(x * x for x in c) for c in centroids]
    items = []
    for i, c in enumerate(centroids):
        arr = ", ".join(_sql_double(x) for x in c)
        dot_s = (
            f"aggregate(zip_with(`{vec}`, array({arr}), "
            "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
        )
        items.append(
            f"named_struct('dist', {_sql_double(centroid_sq[i])} - "
            f"2.0D * {dot_s}, 'list_id', {i})"
        )
    return "array(" + ", ".join(items) + ")"


def ivf_assign_fixed(
    df: DataFrame,
    centroids: list[list[float]],
    centroid_sq: list[float] | None = None,
    vec: str = "embedding",
    out: str = "list_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid of a FIXED codebook
    (the production IVF shape: train once on a sample, broadcast the
    tiny codebook, assign the full corpus with zero shuffles). The
    codebook rides into the executors as plan literals — parsed from
    one SQL string (see :func:`centroid_candidates_sql`).

    The assignment is wrapped in an always-true NONDETERMINISTIC guard
    (guide §4.4, r16 optimization round): every downstream equi-join
    on the assignment infers ``isnotnull(list_id)`` and pushes it
    below this projection, duplicating the 16-centroid argmin fold
    into a Filter that re-evaluates it per row (r15 measured the
    duplication <2% and deferred; at sf0.1 post-catalog it reads
    8–20% of the consumer queries — interleaved min-of-4 A/B:
    ann_recall_eval 1.796→1.493 s, ivf_approx_neighbors 1.475→1.366 s,
    retrieval_mrr_eval 1.575→1.453 s, semantic_dedup_clusters flat).
    ``spark_partition_id()`` is flagged nondeterministic, so the
    optimizer may not substitute the projection into pushed filters —
    one evaluation per row. The guard never changes the value (the
    predicate is constant-true on every partition); callers apply
    their own scan filters BELOW the assignment, so nothing pushable
    is lost."""
    cands = F.expr(centroid_candidates_sql(vec, centroids, centroid_sq))
    assigned = F.array_min(cands).getField("list_id")
    return df.withColumn(out, F.when(F.spark_partition_id() >= 0, assigned))


def ivf_probes_fixed(
    df: DataFrame,
    centroids: list[list[float]],
    n_probes: int = 2,
    centroid_sq: list[float] | None = None,
    vec: str = "embedding",
    out: str = "list_id",
) -> DataFrame:
    """Explode each query row into its ``n_probes`` nearest inverted
    lists of a fixed codebook — one output row per (query, probed
    list). array_sort on the (dist, list_id) structs gives the probe
    order with deterministic tie-breaks."""
    cands = F.array_sort(
        F.expr(centroid_candidates_sql(vec, centroids, centroid_sq))
    )
    return df.withColumn(
        out, F.explode(F.slice(cands, 1, n_probes).getField("list_id"))
    )


def ivf_assign(
    emb: DataFrame,
    n_lists: int = 16,
    vec: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer (SURVEY §7.6 'IVF or LSH-bucketed'
    variant): k-means centroids partition the corpus into inverted
    lists; search only probes the closest lists.

    Returns (corpus with ``list_id``, centroid vectors). Training uses
    spark.ml KMeans (seeded); at 100 TB you train on a sample and
    assign the full corpus with a broadcast of the k centroids —
    exactly what this does, since assignment is the transform step."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    featurized = emb.withColumn("_features", array_to_vector(F.col(vec)))
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="_features", predictionCol="list_id"
    ).fit(featurized)
    assigned = model.transform(featurized).drop("_features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return assigned, centroids


def ivf_search(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 5,
    n_probes: int = 2,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec: str = "embedding",
) -> DataFrame:
    """Probe the ``n_probes`` nearest inverted lists per query, exact
    cosine within them, top-k. Work ≈ (n_probes / n_lists) of brute
    force; recall grows with n_probes. Probe assignment is DISTRIBUTED:
    the (tiny) centroid matrix closes over an Arrow-batched pandas_udf,
    so probe ASSIGNMENT never collects to the driver. The assigned
    queries then broadcast into the corpus join, so the corpus itself
    never shuffles — which bounds the QUERY batch to broadcast scale
    (the driver materializes batch × n_probes rows for the broadcast;
    a corpus-sized query batch needs the shuffle-join variant
    instead — drop the broadcast hint and let AQE pick)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.window import Window

    cent = np.asarray(centroids, dtype=np.float64)  # (k, dim) — tiny
    cent_sq = (cent**2).sum(axis=1)  # ||c||² per centroid

    @pandas_udf("array<int>")
    def _probe_lists(embs: pd.Series) -> pd.Series:
        V = np.vstack(embs.to_numpy())  # (batch, dim)
        # ||v-c||² = ||v||² - 2 v·c + ||c||²; ||v||² is rank-constant
        # per row, so argsort needs only the cross and centroid terms.
        d = cent_sq[None, :] - 2.0 * (V @ cent.T)  # (batch, k)
        idx = np.argsort(d, axis=1)[:, :n_probes]
        return pd.Series([row.tolist() for row in idx])

    probe_df = queries.select(
        query_id,
        F.col(vec).alias("_qv"),
        F.explode(_probe_lists(F.col(vec))).alias("list_id"),
    )
    corpus_n = with_norm(
        assigned.select(corpus_id, "list_id", F.col(vec).alias("_cv")), "_cv", "_cn"
    )
    probe_n = with_norm(probe_df, "_qv", "_qn")
    scored = corpus_n.join(F.broadcast(probe_n), "list_id").select(
        query_id,
        corpus_id,
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
            "cos"
        ),
    )
    topk = Window.partitionBy(query_id).orderBy(F.col("cos").desc(), F.col(corpus_id))
    # zero-norm guard, same rationale as brute_force_knn
    return (
        scored.filter(F.col("cos").isNotNull() & ~F.isnan("cos"))
        .withColumn("_rn", F.row_number().over(topk))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def cosine_to_query_pandas_udf(query_vec: list[float]):
    """Arrow-vectorized cosine against a fixed query vector — the
    pandas-UDF path for WIDE embeddings (SURVEY §2.13: built-ins
    first; when dims reach thousands the JVM fold loses to one numpy
    matmul per Arrow batch, and this is the right escape hatch).

    Returns a pandas_udf usable as a Column expression; numerically
    equivalent to cosine() (verified in tests)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    q = np.asarray(query_vec, dtype=np.float64)
    q_norm = float(np.linalg.norm(q))

    @pandas_udf("double")
    def _cos(embeddings: pd.Series) -> pd.Series:
        mat = np.vstack(embeddings.to_numpy())  # (batch, dim)
        dots = mat @ q
        norms = np.linalg.norm(mat, axis=1)
        return pd.Series(dots / (norms * q_norm))

    return _cos


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    corpus_id: str = "neighbor_id",
    query_id: str = "query_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors: broadcast the (small) query batch,
    stream the corpus once, per-query top-k via keyed window. No
    corpus shuffle — the only wide op is the final tiny top-k.

    Norms ride along as scalar columns computed in Projects BELOW the
    join (once per row), so the per-pair work is one dot product and
    one divide — not dot + two 64-element norm folds."""
    from pyspark.sql.window import Window

    corpus_n = with_norm(
        corpus.select(F.col(corpus_id), F.col(vec).alias("_cv")), "_cv", "_cn"
    )
    queries_n = with_norm(
        queries.select(F.col(query_id), F.col(vec).alias("_qv")), "_qv", "_qn"
    )
    scored = corpus_n.crossJoin(F.broadcast(queries_n)).select(
        query_id,
        corpus_id,
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
            "cos"
        ),
    )
    topk = Window.partitionBy(query_id).orderBy(
        F.col("cos").desc(), F.col(corpus_id)
    )
    # a zero-norm vector (padding row / failed encode) divides by
    # zero → NULL cos; undefined similarities must never claim a
    # top-k slot when a list has fewer than k real matches
    return (
        scored.filter(F.col("cos").isNotNull() & ~F.isnan("cos"))
        .withColumn("_rn", F.row_number().over(topk))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mmr_rerank_pandas(
    candidates: DataFrame,
    k: int = 3,
    lam: float = 0.7,
) -> DataFrame:
    """General-k Maximal Marginal Relevance re-rank, one group per
    query (Carbonell & Goldstein 1998): greedy selection
    argmax_c λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s), ties broken
    by candidate id. Greedy MMR is data-dependently sequential in k —
    exactly the loop a Python escape hatch genuinely owns — so it runs
    as applyInPandas over (query_id) groups: each group is one
    retrieval pool (top-N from knn/IVF/LSH, N≈10-100), cost k·N sims
    per query, thousands of queries in parallel, never corpus-sized.

    ``candidates``: (query_id, vec_id, rel, embedding). Returns
    (query_id, rank, vec_id, relevance, mmr_score) with rank 1..k.
    The k=3 instance is hash-checked end-to-end by the
    mmr_diverse_rerank registry query's unrolled plan; this form is
    unit-tested against it."""
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("query_id", LongType(), False),
            StructField("rank", IntegerType(), False),
            StructField("vec_id", LongType(), False),
            StructField("relevance", DoubleType(), False),
            StructField("mmr_score", DoubleType(), False),
        ]
    )

    def select_group(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        vecs = np.stack(pdf["embedding"].map(np.asarray))
        norms = np.sqrt((vecs * vecs).sum(axis=1))
        # a zero vector would make its cosine NaN, and np.argmax
        # treats NaN as maximal — it would win every selection round
        # (review finding r7). inf norm → similarity 0 instead.
        norms = np.where(norms == 0, np.inf, norms)
        rel = pdf["rel"].to_numpy()
        ids = pdf["vec_id"].to_numpy()
        selected: list[int] = []
        rows = []
        max_sim = np.full(len(pdf), -np.inf)
        for rank in range(1, min(k, len(pdf)) + 1):
            if not selected:
                score = rel.copy()
            else:
                score = lam * rel - (1 - lam) * max_sim
            score[selected] = -np.inf
            # argmax with vec_id tie-break: ids are sorted ascending,
            # so np.argmax's first-max rule IS the tie-break
            best = int(np.argmax(score))
            rows.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    rank,
                    int(ids[best]),
                    float(rel[best]),
                    float(score[best]),
                )
            )
            sims = (vecs @ vecs[best]) / (norms * norms[best])
            max_sim = np.maximum(max_sim, sims)
            selected.append(best)
        return pd.DataFrame(
            rows, columns=["query_id", "rank", "vec_id", "relevance", "mmr_score"]
        )

    return candidates.groupBy("query_id").applyInPandas(select_group, schema)


def kmeans_quantize(
    embedding: Column, scale: int = 1000, offset: int = 1024
) -> Column:
    """Shift-quantize a float vector into non-negative integer units:
    ``q[i] = floor(x[i] * scale) + offset``. Lloyd iterations over the
    quantized vectors are exact integer arithmetic — order-independent
    under any shuffle and bit-replayable by a SQL twin. The offset
    keeps every operand non-negative so Spark's truncating ``div``
    and DuckDB's flooring ``//`` agree (they diverge on negatives);
    the shift cancels in every squared-distance term.
    """
    return F.transform(
        embedding.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale))).cast("long") + F.lit(offset),
    )


def kmeans_sq_dist(q: Column, c: Column) -> Column:
    """Exact integer squared L2 distance between two quantized vectors
    (zip_with + aggregate — JVM-side, no Python in the loop)."""
    return F.aggregate(
        F.zip_with(q, c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd ASSIGNMENT step with zero corpus-sized shuffle.

    ``centroids`` (``cid``, ``c: array<long>``, k rows) is collapsed
    into a single row holding all centroids sorted by cid, then
    broadcast; each corpus row computes its argmin centroid inside one
    higher-order ``aggregate`` over that packed array — a map-only
    pass over the corpus. The naive shape (broadcast join producing k
    rows per vector + ``groupBy(vec_id).agg(min(struct(...)))``)
    re-shuffles the corpus once per iteration; this shape never does.
    Ties break to the lowest cid (strict ``<`` over the cid-sorted
    pack), matching a ``ROW_NUMBER() OVER (ORDER BY dist, cid)`` twin.

    Returns (``vec_id``, ``q``, ``cid``, ``dist``).
    """
    packed = centroids.agg(
        F.sort_array(F.collect_list(F.struct("cid", "c"))).alias("cents")
    )
    far = F.struct(
        F.lit(2**62).cast("long").alias("dist"),
        F.lit(-1).cast("long").alias("cid"),
    )
    best = F.aggregate(
        F.col("cents"),
        far,
        lambda acc, ct: F.when(
            kmeans_sq_dist(F.col("q"), ct["c"]) < acc["dist"],
            F.struct(
                kmeans_sq_dist(F.col("q"), ct["c"]).alias("dist"),
                ct["cid"].cast("long").alias("cid"),
            ),
        ).otherwise(acc),
    )
    return (
        vectors.crossJoin(F.broadcast(packed))
        .select("vec_id", "q", best.alias("_best"))
        .select(
            "vec_id",
            "q",
            F.col("_best.cid").alias("cid"),
            F.col("_best.dist").alias("dist"),
        )
    )


def kmeans_update(assigned: DataFrame, dim: int) -> DataFrame:
    """One Lloyd UPDATE step: per-cluster element-wise integer mean,
    ``c'[i] = SUM(q[i]) div COUNT(*)`` (floor division — exact, and
    valid because quantized coordinates are non-negative). The
    ``dim`` per-dimension SUMs are plain aggregates, so map-side
    combine reduces each task's contribution to ≤ k rows before the
    (tiny-bytes) shuffle — the corpus itself never re-shuffles.
    Clusters that received no members disappear, on both engines.

    Returns (``cid``, ``c: array<long>``) for the next assignment.
    """
    sums = assigned.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.col("q")[i]).alias(f"s{i}") for i in range(dim)],
    )
    arr = ", ".join(f"s{i}" for i in range(dim))
    return sums.select(
        "cid", F.expr(f"transform(array({arr}), s -> s div n)").alias("c")
    )


def pq_encode_pandas(
    embeddings: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """PRODUCTION PQ encode (r9, VERDICT r8 item 7): NumPy-vectorized
    Arrow-batched encode against the trained codebook shipped as a
    worker-side constant — the deployment shape
    plans/vectors.py::pq_quantization_distortion's docstring names:
    the frozen-LITERAL form inlines 1024 codebook literals into the
    plan, which exceeds whole-stage-codegen's method budget and
    evaluates interpreted; this form keeps the plan tiny (one
    mapInPandas node) and moves the 8×16 distance argmins into
    vectorized float64 NumPy. A real deployment swaps CODEBOOK for a
    re-trained array without touching the plan.

    BIT-PARITY with the literal path (unit-asserted): identical
    milli-unit integers / 1000.0, squared-diff terms accumulated
    LEFT-TO-RIGHT per subspace dim (matching the literal '+' chain —
    np.sum's pairwise summation would drift ulps), argmin's
    first-occurrence rule = the literal (distance, centroid_id)
    struct-sort tie-break, and sq_err returned UNROUNDED so callers
    apply the same engine-side F.round the literal path uses.

    Scale shape: zero-shuffle map, Arrow batch transfer, ~1 KB closure
    (the codebook) shipped once per executor — the encode pass an ANN
    pipeline runs once before storing 4-byte codes."""
    from fintech_lakehouse_spark.plans._pq_codebook import (
        CODEBOOK,
        K,
        M,
        SUBDIM,
    )

    import numpy as np

    cb = np.asarray(CODEBOOK, dtype=np.float64) / 1000.0  # (M, K, SUBDIM)

    def encode(iterator):
        import pandas as pd

        for pdf in iterator:
            n = len(pdf)
            if n == 0:
                continue
            vecs = np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )  # (n, M*SUBDIM)
            total = np.zeros(n)
            code_cols = []
            for s in range(M):
                sub = vecs[:, s * SUBDIM : (s + 1) * SUBDIM]  # (n, SUBDIM)
                d = np.zeros((n, K))
                for j in range(SUBDIM):  # left-to-right, literal parity
                    diff = sub[:, j : j + 1] - cb[s][:, j][None, :]
                    d += diff * diff
                kmin = np.argmin(d, axis=1)  # ties -> lowest centroid id
                total += d[np.arange(n), kmin]
                code_cols.append(kmin)
            codes = [
                "-".join(str(int(c)) for c in row)
                for row in zip(*code_cols)
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "pq_code": codes,
                    "sq_err_raw": total,
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, pq_code string, sq_err_raw double"
    )
