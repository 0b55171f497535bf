"""Text/vector/multimodal function tests (SURVEY §7.6 surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.functions.multimodal import (
    ASSET_SCHEMA,
    extract_image_features,
    sample_video_frames,
)
from fintech_lakehouse_spark.functions.text import (
    hamming64,
    lsh_band_pairs,
    lsh_band_pairs_md5,
    minhash_signatures,
    minhash_signatures_md5,
    rolling_md5_chain,
    shingle_rows,
    simhash64,
    simhash_hex_md5,
    verified_jaccard_pairs,
    word_shingles,
)
from fintech_lakehouse_spark.functions.vectors import (
    brute_force_knn,
    cosine,
    l2_norm,
)


@pytest.fixture()
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely different content about spark query engines at scale ok"
    return spark.createDataFrame(
        [(1, base), (2, near), (3, other), (4, base), (5, "too short")],
        ["doc_id", "text"],
    )


def test_word_shingles(docs):
    rows = {r["doc_id"]: r["shingles"] for r in word_shingles(docs, 3).collect()}
    assert 5 not in rows  # 2 tokens < n
    assert "the quick brown" in rows[1]
    assert len(rows[1]) == 11  # 13 tokens → 11 trigrams (all distinct)


def test_minhash_identical_docs_identical_signatures(docs):
    sig = minhash_signatures(shingle_rows(docs, 3), n_hashes=16)
    rows = {r["doc_id"]: tuple(r[f"mh{k}"] for k in range(16)) for r in sig.collect()}
    assert rows[1] == rows[4]  # identical text
    shared = sum(a == b for a, b in zip(rows[1], rows[2]))
    assert shared >= 8  # near-dup: most minhashes agree
    shared_far = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert shared_far <= 4  # unrelated docs


def test_lsh_band_pairs_finds_near_dups(docs):
    sig = minhash_signatures(shingle_rows(docs, 3), n_hashes=16)
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_band_pairs(sig, n_hashes=16, n_bands=8).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near dup collides in some band
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_portable_minhash_verified_pipeline(docs):
    """The md5 hash family end-to-end: signatures agree for identical
    docs, LSH candidates include the true dups, and exact-Jaccard
    verification keeps only real near-dups with the right value."""
    sig = minhash_signatures_md5(shingle_rows(docs, 3), n_hashes=16)
    rows = {r["doc_id"]: tuple(r[f"mh{k}"] for k in range(16)) for r in sig.collect()}
    assert rows[1] == rows[4]
    cand = lsh_band_pairs_md5(sig, n_hashes=16, n_bands=8)
    verified = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in verified_jaccard_pairs(docs, cand, n=3, threshold=0.5).collect()
    }
    assert verified[(1, 4)] == 1.0  # exact dup
    assert 0.5 <= verified[(1, 2)] < 1.0  # near dup: 1-token diff
    assert not any(3 in p for p in verified)  # unrelated never survives


def test_portable_simhash_and_rolling(docs, spark):
    fp = {r["doc_id"]: r["simhash_hex"] for r in simhash_hex_md5(docs).collect()}
    assert fp[1] == fp[4] and len(fp[1]) == 16
    ham_near = sum(a != b for a, b in zip(fp[1], fp[2]))
    ham_far = sum(a != b for a, b in zip(fp[1], fp[3]))
    assert ham_near < ham_far
    rolled = {
        r["doc_id"]: r["rh"]
        for r in docs.select(
            "doc_id", rolling_md5_chain("text").alias("rh")
        ).collect()
    }
    assert rolled[1] == rolled[4] and rolled[1] != rolled[2]
    # order sensitivity: same tokens, different sequence → different hash
    swapped = spark.createDataFrame([(9, "b a")], ["doc_id", "text"]).select(
        rolling_md5_chain("text").alias("rh")
    )
    orig = spark.createDataFrame([(8, "a b")], ["doc_id", "text"]).select(
        rolling_md5_chain("text").alias("rh")
    )
    assert swapped.collect()[0]["rh"] != orig.collect()[0]["rh"]


def test_segment_nation_key_arrays(spark, sf_dir):
    """The raw-array variant (kept out of the driver registry because
    the driver comparator cannot hash list cells) must agree with the
    registered scalar encodings."""
    from fintech_lakehouse_spark.plans.analytics import (
        segment_nation_arrays,
        segment_nation_key_arrays,
    )

    arrays = {
        r["c_mktsegment"]: r["nation_keys"]
        for r in segment_nation_key_arrays(spark, sf_dir).collect()
    }
    scalars = {
        r["c_mktsegment"]: (r["n_nations"], r["min_nation"], r["nations_csv"])
        for r in segment_nation_arrays(spark, sf_dir).collect()
    }
    assert arrays.keys() == scalars.keys()
    for seg, keys in arrays.items():
        n, mn, csv = scalars[seg]
        assert keys == sorted(keys)
        assert (len(keys), keys[0], ",".join(map(str, keys))) == (n, mn, csv)


def test_simhash_near_dup_hamming(docs):
    fp = simhash64(docs)
    paired = (
        fp.alias("a")
        .join(fp.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
            hamming64(F.col("a.simhash64"), F.col("b.simhash64")).alias("ham"),
        )
    )
    ham = {(r["da"], r["db"]): r["ham"] for r in paired.collect()}
    assert ham[(1, 4)] == 0  # identical
    assert ham[(1, 2)] < ham[(1, 3)]  # near-dup closer than unrelated


def test_cosine_and_knn(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0]),
            (2, [0.0, 1.0, 0.0]),
            (3, [-1.0, 0.0, 0.0]),
        ],
        ["vec_id", "embedding"],
    )
    sim = emb.select(
        cosine(F.col("embedding"), F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0))).alias(
            "c"
        ),
        "vec_id",
    ).collect()
    by_id = {r["vec_id"]: r["c"] for r in sim}
    assert by_id[0] == pytest.approx(1.0)
    assert by_id[3] == pytest.approx(-1.0)
    queries = emb.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    corpus = emb.filter("vec_id > 0").selectExpr("vec_id as neighbor_id", "embedding")
    top2 = brute_force_knn(corpus, queries, k=2).collect()
    assert [r["neighbor_id"] for r in top2] == [1, 2]


def test_l2_norm(spark):
    df = spark.createDataFrame([([3.0, 4.0],)], ["v"])
    assert df.select(l2_norm(F.col("v")).alias("n")).collect()[0]["n"] == 5.0


@pytest.fixture()
def assets(spark):
    return spark.createDataFrame(
        [
            (1, "image", "png", bytearray(b"fake-png-bytes"), 14),
            (2, "image", "jpg", bytearray(b"other-bytes"), 11),
            (3, "video", "mp4", bytearray(b"vid"), 3),
        ],
        ASSET_SCHEMA,
    )


def test_image_feature_plumbing(assets):
    feats = extract_image_features(assets.filter("modality = 'image'"))
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["width"] >= 64 and rows[1]["height"] >= 64
    assert rows[1]["n_bytes"] == 14
    assert len(rows[1]["content_digest"]) == 64  # deterministic sha256
    # deterministic: same payload → same features
    again = {r["asset_id"]: r for r in extract_image_features(assets).collect()}
    assert again[1]["width"] == rows[1]["width"]


def test_real_decode_raises(assets):
    with pytest.raises(Exception, match="NotImplementedError|real image decode"):
        extract_image_features(assets, decode="real").collect()


def test_video_frame_sampling(assets):
    frames = sample_video_frames(assets, every_n_seconds=5).collect()
    assert all(r["asset_id"] == 3 for r in frames)
    assert [r["frame_ts_sec"] for r in frames] == [5 * r["frame_no"] for r in frames]


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with 2/16 probes must recover most of the exact top-5
    (random 64-dim data is an adversarial case for partition pruning;
    ≥40% recall while scanning ~1/8th of the corpus is the win)."""
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.vectors import (
        ivf_assign,
        ivf_search,
    )
    from fintech_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter("vec_id < 10").selectExpr(
        "vec_id as query_id", "embedding"
    )
    corpus = emb.filter("vec_id >= 10")
    exact = brute_force_knn(
        corpus.selectExpr("vec_id as neighbor_id", "embedding"), queries, k=5
    )
    assigned, centroids = ivf_assign(corpus, n_lists=16)
    approx = ivf_search(assigned, centroids, queries, k=5, n_probes=2)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert len(approx_pairs) == 50  # 10 queries × k=5
    assert recall >= 0.4, f"recall {recall}"


def test_ivf_fixed_assignment_matches_trained_model(spark, sf_dir):
    """The JVM-expression fixed-codebook assignment (the oracle-
    replayable path behind ivf_approx_neighbors) must agree with
    spark.ml's own model.transform for the SAME centroids — pins the
    argmin formulation (||c||² − 2·v·c, lowest-index tie-break)
    against the reference implementation. Probes must be a superset:
    probe 1 of n lists IS the assignment."""
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.vectors import (
        ivf_assign,
        ivf_assign_fixed,
        ivf_probes_fixed,
    )
    from fintech_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    assigned, centroids = ivf_assign(emb, n_lists=16)
    model_map = {r["vec_id"]: r["list_id"] for r in assigned.collect()}
    fixed_map = {
        r["vec_id"]: r["list_id"]
        for r in ivf_assign_fixed(emb, centroids).collect()
    }
    assert fixed_map == model_map
    probe1 = {
        r["vec_id"]: r["list_id"]
        for r in ivf_probes_fixed(emb, centroids, n_probes=1).collect()
    }
    assert probe1 == model_map


def test_sql_text_expression_twins_bit_identical(spark, sf_dir):
    """r11 (VERDICT r10 item 1 root cause): the frozen-codebook
    candidate array and the JL projection are now parsed from ONE SQL
    string instead of composed through k×d py4j Column calls (~2.3 s
    of driver-side build per ivf query). The parsed tree must stay
    BIT-identical to the Column-algebra form — same left-fold order,
    same double literals, same tie-break structs."""
    import math

    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.vectors import (
        centroid_candidates,
        centroid_candidates_sql,
        dot,
        jl_project,
    )
    from fintech_lakehouse_spark.plans._ivf_codebook import (
        CENTROID_SQ,
        CENTROIDS,
    )
    from fintech_lakehouse_spark.plans._jl_matrix import SIGNS
    from fintech_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    col_form = emb.select(
        "vec_id",
        centroid_candidates(
            F.col("embedding"), CENTROIDS, CENTROID_SQ
        ).alias("c"),
    ).collect()
    sql_form = emb.select(
        "vec_id",
        F.expr(
            centroid_candidates_sql("embedding", CENTROIDS, CENTROID_SQ)
        ).alias("c"),
    ).collect()
    assert sorted(col_form) == sorted(sql_form)
    scale = 1.0 / math.sqrt(len(SIGNS))
    jl_col = emb.select(
        "vec_id",
        F.array(
            *[
                dot(
                    F.col("embedding"),
                    F.array(*[F.lit(float(s)) for s in row]),
                )
                * F.lit(scale)
                for row in SIGNS
            ]
        ).alias("p"),
    ).collect()
    jl_sql = emb.select(
        "vec_id", jl_project(F.col("embedding"), SIGNS).alias("p")
    ).collect()
    assert sorted(jl_col) == sorted(jl_sql)


def test_minhash_sql_text_twin(spark, sf_dir):
    """r11: minhash_signatures_md5 / band_signatures / simhash_hex_md5
    are built from SQL text (one parse call per projection instead of
    ~130-400 py4j Column calls per build — the cost re-paid on every
    bench run and every streaming micro-batch). Results must be
    bit-identical to the Column-algebra construction, replicated here
    verbatim from the pre-r11 form."""
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.text import (
        HEX_DIGITS,
        band_signatures,
        md5_hex,
        minhash_signatures_md5,
        simhash_hex_md5,
        tokens,
        word_shingles,
    )
    from fintech_lakehouse_spark.sources.readers import load_table

    documents = load_table(spark, sf_dir, "documents")
    rows = word_shingles(documents, n=3).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    n_hashes, n_bands = 32, 8
    # pre-r11 Column-algebra minhash, verbatim
    hexed = rows.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws("|", F.lit(str(j)), F.col("shingle")).cast(
                    "binary"
                )
            ).alias(f"hx{j}")
            for j in range(n_hashes // 4)
        ],
    )
    chunks = hexed.select(
        "doc_id",
        *[
            F.substring(f"hx{k // 4}", 1 + 8 * (k % 4), 8).alias(f"h{k}")
            for k in range(n_hashes)
        ],
    )
    sig_col = chunks.groupBy("doc_id").agg(
        *[F.min(f"h{k}").alias(f"mh{k}") for k in range(n_hashes)]
    )
    sig_sql = minhash_signatures_md5(rows, n_hashes)
    assert sorted(map(tuple, sig_col.collect())) == sorted(
        map(tuple, sig_sql.collect())
    )
    # pre-r11 Column-algebra banding, verbatim
    rpb = n_hashes // n_bands
    bands_col = sig_sql.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(str(band)),
                            *[
                                F.col(f"mh{band * rpb + r}")
                                for r in range(rpb)
                            ],
                        ).cast("binary")
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("band_sig"),
    )
    bands_sql = band_signatures(sig_sql, n_hashes, n_bands)
    assert sorted(map(tuple, bands_col.collect())) == sorted(
        map(tuple, bands_sql.collect())
    )
    # pre-r11 Column-algebra simhash, verbatim
    toks = documents.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    hx = toks.select("doc_id", md5_hex("token").alias("hx"))
    nibbles = hx.select(
        "doc_id",
        *[
            F.conv(F.substring("hx", j + 1, 1), 16, 10)
            .cast("int")
            .alias(f"n{j}")
            for j in range(16)
        ],
    )
    votes = nibbles.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{b // 4}"), b % 4).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    chars = []
    for j in range(16):
        nib = None
        for t in range(4):
            bit = F.when(F.col(f"v{4 * j + t}") > 0, F.lit(2**t)).otherwise(
                F.lit(0)
            )
            nib = bit if nib is None else nib + bit
        chars.append(F.substring(F.lit(HEX_DIGITS), nib + 1, F.lit(1)))
    sim_col = votes.select("doc_id", F.concat(*chars).alias("simhash_hex"))
    sim_sql = simhash_hex_md5(documents)
    assert sorted(map(tuple, sim_col.collect())) == sorted(
        map(tuple, sim_sql.collect())
    )


def test_label_centroids_applyinpandas(spark, sf_dir):
    """Grouped applyInPandas (UDAF shape): centroid must equal the
    exploded-builtin computation."""
    from fintech_lakehouse_spark.functions.python_udfs import label_centroids
    from fintech_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    got = {r["label"]: r["centroid"] for r in label_centroids(emb).collect()}
    expected = {
        r["label"]: r["centroid"]
        for r in emb.select("label", F.posexplode("embedding"))
        .groupBy("label", "pos")
        .agg(F.avg("col").alias("v"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "v"))).alias("s"))
        .select("label", F.transform("s", lambda x: x.getField("v")).alias("centroid"))
        .collect()
    }
    assert set(got) == set(expected)
    for label in got:
        assert got[label] == pytest.approx(expected[label], abs=1e-12)


def test_split_sentences_udtf(spark, sf_dir):
    """Python UDTF: every doc fans out to ceil(tokens/12) rows with
    consecutive sentence numbers."""
    from fintech_lakehouse_spark.functions.python_udfs import split_sentences
    from fintech_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    out = split_sentences(docs)
    rows = out.collect()
    assert all(r["n_tokens"] >= 1 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["sentence_no"])
    token_counts = {
        r["doc_id"]: len(r["text"].split(" ")) for r in docs.collect()
    }
    for doc_id, nos in by_doc.items():
        assert sorted(nos) == list(range(len(nos)))
        assert len(nos) == -(-token_counts[doc_id] // 12)  # ceil


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS one-sided guarantee on real corpus tokens: for every
    queried token, exact <= estimate <= exact + eps * N; rebuilds with
    the same seed are bit-deterministic."""
    from pyspark.sql import functions as F

    from fintech_lakehouse_spark.functions.sketches import (
        build_count_min_sketch,
        query_count_min_sketch,
    )
    from fintech_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("token")
    )
    eps = 0.001
    n_total = toks.count()
    exact = dict(
        toks.groupBy("token")
        .count()
        .orderBy(F.desc("count"), "token")
        .limit(30)
        .collect()
    )
    sk1 = build_count_min_sketch(toks, "token", eps=eps, seed=42)
    sk2 = build_count_min_sketch(toks, "token", eps=eps, seed=42)
    assert sk1 == sk2  # deterministic build
    est = query_count_min_sketch(spark, sk1, list(exact))
    for token, true_count in exact.items():
        assert est[token] >= true_count, (token, est[token], true_count)
        assert est[token] <= true_count + eps * n_total, (
            token, est[token], true_count, n_total,
        )


def test_approx_token_heavy_hitters_query(spark, sf_dir):
    """Registry query (distributed md5 CMS since r4): 20 rows, each
    estimate obeys the one-sided CMS guarantee
    exact <= estimate <= exact + (e/width)·N."""
    import math

    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.plans.text import _CMS_WIDTH
    from fintech_lakehouse_spark.sources.readers import load_table

    n_total = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")))
        .count()
    )
    bound = math.e / _CMS_WIDTH * n_total
    rows = QUERIES["approx_token_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["cms_estimate"] >= r["exact_count"], r
        assert r["cms_estimate"] <= r["exact_count"] + bound, (r, bound)


def test_cms_sketch_table_merge_invariance(spark):
    """The relational CMS is mergeable by construction: building the
    sketch over an arbitrary repartitioning (= different executor
    partials) yields the identical (h, bucket, cnt) table, and point
    estimates match token-for-token."""
    from fintech_lakehouse_spark.functions.sketches import (
        cms_estimates_md5,
        cms_sketch_table_md5,
    )

    vals = spark.createDataFrame(
        [(f"tok{i % 7}",) for i in range(300)], "token string"
    )
    a = cms_sketch_table_md5(vals, "token", depth=4, width=64)
    b = cms_sketch_table_md5(vals.repartition(13), "token", depth=4, width=64)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    items = vals.distinct().withColumnRenamed("token", "token")
    est = {
        r["token"]: r["cms_estimate"]
        for r in cms_estimates_md5(a, items, "token", depth=4, width=64).collect()
    }
    # 7 distinct tokens, 300 rows: tok0,tok1 appear 43×, rest 42×
    for tok, e in est.items():
        exact = 43 if int(tok[3]) < 300 % 7 else 42
        assert e >= exact, (tok, e, exact)


def _make_wav(seconds: float, rate: int, amplitude: float) -> bytes:
    """Deterministic 16-bit mono PCM square wave via the stdlib."""
    import wave as wave_mod
    import io
    import struct

    n = int(seconds * rate)
    val = int(amplitude * 32767)
    frames = b"".join(
        struct.pack("<h", val if i % 2 == 0 else -val) for i in range(n)
    )
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(frames)
    return buf.getvalue()


def _make_ppm(width: int, height: int) -> bytes:
    """P6 gradient image: pixel (x, y) = (x*16, y*16, 7)."""
    raster = bytes(
        b
        for y in range(height)
        for x in range(width)
        for b in (x * 16 % 256, y * 16 % 256, 7)
    )
    return f"P6\n{width} {height}\n255\n".encode() + raster


def test_real_wav_decode_through_spark(spark):
    """decode='real' is a TESTED stdlib path for WAV (VERDICT r3 item
    6): true duration/sample-rate/loudness, same schema as fake mode,
    corrupt payloads quarantine to nulls instead of killing the stage."""
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    wav_a = _make_wav(2.0, 16000, 0.5)   # 2 s @ 16 kHz, RMS 0.5
    wav_b = _make_wav(1.0, 8000, 1.0)    # 1 s @ 8 kHz, full scale
    assets = spark.createDataFrame(
        [
            (1, "audio", "wav", bytearray(wav_a), len(wav_a)),
            (2, "audio", "wav", bytearray(wav_b), len(wav_b)),
            (3, "audio", "wav", bytearray(b"not a wav at all"), 16),
        ],
        ASSET_SCHEMA,
    )
    rows = {
        r["asset_id"]: r
        for r in extract_audio_features(assets, decode="real").collect()
    }
    assert rows[1]["duration_sec"] == 2
    assert rows[1]["sample_rate"] == 16000
    assert abs(rows[1]["loudness_proxy"] - 128) <= 1  # RMS 0.5 → ~127.5
    assert rows[2]["duration_sec"] == 1
    assert rows[2]["sample_rate"] == 8000
    assert rows[2]["loudness_proxy"] == 255
    # corrupt: quarantined to nulls, digest still present
    assert rows[3]["duration_sec"] is None
    assert rows[3]["sample_rate"] is None
    assert rows[3]["content_digest"]
    # real and fake agree on schema exactly
    fake = extract_audio_features(assets, decode="fake")
    assert fake.schema == extract_audio_features(assets, decode="real").schema


def test_real_audio_unsupported_format_raises(spark):
    """mp3 gained a real header-level branch (r6s5), so the
    unsupported-format seam now starts at formats with no stdlib
    grammar at all (flac/ogg); a truncated mp3 quarantines to nulls
    instead of raising."""
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    assets = spark.createDataFrame(
        [(9, "audio", "flac", bytearray(b"fLaC"), 4)], ASSET_SCHEMA
    )
    with pytest.raises(Exception, match="NotImplementedError|flac"):
        extract_audio_features(assets, decode="real").collect()

    truncated = spark.createDataFrame(
        [(9, "audio", "mp3", bytearray(b"\xff\xfb"), 2)], ASSET_SCHEMA
    )
    (row,) = extract_audio_features(truncated, decode="real").collect()
    assert row["duration_sec"] is None and row["sample_rate"] is None


def test_real_ppm_decode_and_resize(spark):
    """PPM metadata decode + genuine nearest-neighbor resize through
    mapInPandas: known dims in, exact raster bytes out."""
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_image_features,
        read_netpbm_header,
        resize_images,
        resize_ppm_nearest,
    )

    ppm = _make_ppm(4, 2)
    assets = spark.createDataFrame(
        [
            (1, "image", "ppm", bytearray(ppm), len(ppm)),
            (2, "image", "ppm", bytearray(b"P6 garbage"), 10),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r["asset_id"]: r
        for r in extract_image_features(assets, decode="real").collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (4, 2)
    assert feats[2]["width"] is None  # corrupt → quarantined

    resized = {
        r["asset_id"]: r
        for r in resize_images(assets, width=2, height=2, decode="real").collect()
    }
    out = bytes(resized[1]["payload"])
    hdr = read_netpbm_header(out)
    assert hdr and (hdr[1], hdr[2]) == (2, 2)
    # nearest-neighbor picks source columns 0,2 and rows 0,1:
    # pixel (x,y) = (x*16, y*16, 7) in the 4x2 source
    _, _, _, _, off = hdr
    pix = out[off:]
    assert pix == bytes([0, 0, 7, 32, 0, 7, 0, 16, 7, 32, 16, 7])
    assert resized[2]["payload"] is None  # corrupt → quarantined
    # driver-side kernel agrees with the Spark path
    assert resize_ppm_nearest(ppm, 2, 2) == out


def _make_bmp(width: int, height: int) -> bytes:
    """Uncompressed 24-bit BITMAPINFOHEADER BMP. Raster rows are
    bottom-up with 4-byte padding per the format; stored pixel at
    (file-row r, col c) = BGR (c*10, r*10 + 1, 200 + c)."""
    import struct

    stride = (width * 3 + 3) & ~3
    body = b"".join(
        bytes(
            b for c in range(width) for b in (c * 10, r * 10 + 1, 200 + c)
        ).ljust(stride, b"\x00")
        for r in range(height)
    )
    fh = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return fh + dib + body


def test_real_bmp_decode_and_resize(spark):
    """BMP metadata decode + genuine nearest-neighbor resize (VERDICT
    r5 item 4, closing r4 item 9): stdlib 54-byte header parse, same
    pattern as PPM; corrupt payloads quarantine to nulls."""
    import struct

    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_image_features,
        read_bmp_header,
        resize_bmp_nearest,
        resize_images,
    )

    bmp = _make_bmp(4, 2)
    assert read_bmp_header(bmp) == (4, 2, 24, 54)
    # BITMAPCOREHEADER (12-byte DIB, uint16 dims) parses too
    core = struct.pack("<2sIHHI", b"BM", 26 + 24, 0, 0, 26) + struct.pack(
        "<IHHHH", 12, 4, 2, 1, 24
    ) + bytes(24)
    assert read_bmp_header(core) == (4, 2, 24, 26)
    assert read_bmp_header(b"BM far too short") is None

    assets = spark.createDataFrame(
        [
            (1, "image", "bmp", bytearray(bmp), len(bmp)),
            (2, "image", "bmp", bytearray(b"BM garbage"), 10),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r["asset_id"]: r
        for r in extract_image_features(assets, decode="real").collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (4, 2)
    assert feats[2]["width"] is None  # corrupt → quarantined

    resized = {
        r["asset_id"]: r
        for r in resize_images(assets, width=2, height=2, decode="real").collect()
    }
    out = bytes(resized[1]["payload"])
    assert read_bmp_header(out) == (2, 2, 24, 54)
    # nearest-neighbor keeps file rows 0,1 and picks cols 0,2 of the
    # stored raster; rows re-pad to the 8-byte stride for width 2
    expected = b"".join(
        bytes(b for c in (0, 2) for b in (c * 10, r * 10 + 1, 200 + c)).ljust(
            8, b"\x00"
        )
        for r in range(2)
    )
    assert out[54:] == expected
    assert resized[2]["payload"] is None  # corrupt → quarantined
    # driver-side kernel agrees with the Spark path
    assert resize_bmp_nearest(bmp, 2, 2) == out


def test_audio_feature_plumbing(spark):
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_audio_features,
    )

    assets = spark.createDataFrame(
        [
            (10, "audio", "wav", bytearray(b"pcm-bytes-a"), 11),
            (11, "audio", "mp3", bytearray(b"pcm-bytes-b"), 11),
            (12, "image", "png", bytearray(b"not-audio"), 9),
        ],
        ASSET_SCHEMA,
    )
    rows = {r["asset_id"]: r for r in extract_audio_features(assets).collect()}
    assert set(rows) == {10, 11}  # image filtered out
    for r in rows.values():
        assert 1 <= r["duration_sec"] <= 600
        assert r["sample_rate"] in (8000, 16000, 22050, 44100, 48000)
        assert 0 <= r["loudness_proxy"] <= 255
    again = {r["asset_id"]: r for r in extract_audio_features(assets).collect()}
    assert again[10] == rows[10]  # deterministic
    # real mode: wav and mp3 both have stdlib decoders now (r6s5), so
    # these garbage payloads quarantine to nulls rather than raising.
    real = {
        r["asset_id"]: r
        for r in extract_audio_features(assets, decode="real").collect()
    }
    assert real[10]["duration_sec"] is None
    assert real[11]["duration_sec"] is None


def test_resize_images_plumbing(spark):
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        resize_images,
    )

    assets = spark.createDataFrame(
        [
            (1, "image", "png", bytearray(b"fake-png-bytes"), 14),
            (3, "video", "mp4", bytearray(b"vid"), 3),
        ],
        ASSET_SCHEMA,
    )
    out = {r["asset_id"]: r for r in resize_images(assets, 224, 224).collect()}
    assert set(out) == {1}  # only images
    r = out[1]
    assert (r["target_width"], r["target_height"]) == (224, 224)
    assert r["n_bytes"] == len(r["payload"]) == max(32, 224 * 224 // 64)
    # deterministic payloads round-trip through parquet binary columns
    again = {r["asset_id"]: r for r in resize_images(assets, 224, 224).collect()}
    assert bytes(again[1]["payload"]) == bytes(r["payload"])


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem (SIGMOD '03): two docs sharing a token
    run of length >= k + w - 1 share at least one selected
    fingerprint; selection is a subset of the doc's gram hashes."""
    from fintech_lakehouse_spark.functions.text import winnow_selected

    k, w = 4, 5
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # k+w-1 = 8 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"seven eight {shared} nine ten eleven twelve"),
            (3, "完全 different 内容 with no overlap at all here"),
            (4, "tiny doc"),  # fewer tokens than k -> no grams
            (5, "exactly four token gram"),  # one gram, fewer than w
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in winnow_selected(docs, k=k, w=w).collect()}
    s1, s2, s3 = (set(rows[i]["selected"]) for i in (1, 2, 3))
    assert s1 & s2, "docs sharing an 8-token run must share a fingerprint"
    assert not (s1 & s3) and not (s2 & s3)
    # density: never more fingerprints than windows, never zero when grams exist
    for i in (1, 2, 3):
        r = rows[i]
        assert 1 <= len(r["selected"]) <= r["n_grams"]
        assert r["selected"] == sorted(set(r["selected"]))
    assert rows[4]["n_grams"] == 0 and rows[4]["selected"] == []
    assert rows[5]["n_grams"] == 1 and len(rows[5]["selected"]) == 1


def test_winnow_arrow_matches_expr_twin(spark, sf_dir):
    """r16 optimization pin: the vectorized mapInArrow winnowing path
    must be BIT-IDENTICAL to the retained all-JVM expression twin —
    same doc_id set, same n_grams, same sorted-distinct selected
    arrays — on the real corpus plus adversarial token shapes
    (empty text, lone/leading/trailing/consecutive spaces → empty
    tokens, unicode, sub-k docs, k<=n<w docs, duplicate window
    minima). The md5-prefix fingerprint family is oracle-pinned, so
    any drift here is a correctness bug, not a perf regression."""
    from fintech_lakehouse_spark.functions.text import (
        winnow_selected,
        winnow_selected_expr,
    )
    from fintech_lakehouse_spark.sources.readers import load_table

    adversarial = spark.createDataFrame(
        [
            (1, ""),
            (2, " "),
            (3, "  leading and  doubled spaces trailing  "),
            (4, "短い 完全 different 内容 ünïcödé tokens mixed in here"),
            (5, "a b c"),  # n < k: no grams
            (6, "a b c d"),  # exactly one gram (< w)
            (7, "a b c d e f"),  # k <= n_grams < w
            (8, " ".join(["rep"] * 40)),  # all-equal grams: dup minima
            (9, None),
        ],
        ["doc_id", "text"],
    )
    corpus = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    for docs in (adversarial, corpus):
        got = {
            r["doc_id"]: (r["n_grams"], r["selected"])
            for r in winnow_selected(docs, k=4, w=5).collect()
        }
        want = {
            r["doc_id"]: (r["n_grams"], r["selected"])
            for r in winnow_selected_expr(docs, k=4, w=5).collect()
        }
        assert got == want


def test_winnowing_shift_invariance(spark):
    """Selected fingerprint VALUES of a shared run do not depend on
    where the run sits in the document (position-robustness — the
    property the whole-doc rolling hash lacks)."""
    from fintech_lakehouse_spark.functions.text import winnow_selected

    run = " ".join(f"t{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, run), (2, "x y z " + run), (3, run + " p q r s t u v w")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: set(r["selected"]) for r in winnow_selected(docs).collect()}
    # every fingerprint of the bare run reappears when the run is embedded
    assert rows[1] <= rows[2]
    assert rows[1] <= rows[3]


def test_bpe_encoder_applies_merges_in_rank_order(spark):
    """BPE application semantics: lowest-rank merge first, repeated
    until fixpoint; merged units keep the induction query's
    space-joined pair representation; docs with no applicable merge
    pass through unchanged."""
    from fintech_lakehouse_spark.functions.python_udfs import make_bpe_encoder

    enc = make_bpe_encoder([("a", "b"), ("b", "c"), ("a b", "c")])
    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),      # a+b first (rank 0), then "a b"+c (rank 2)
            (2, ["b", "c", "b", "c"]), # two disjoint b+c merges (rank 1)
            (3, ["c", "a"]),           # nothing applies
            (4, []),                   # empty
        ],
        ["doc_id", "toks"],
    )
    got = {
        r["doc_id"]: r["enc"]
        for r in docs.select("doc_id", enc("toks").alias("enc")).collect()
    }
    assert got[1] == ["a b c"]
    assert got[2] == ["b c", "b c"]
    assert got[3] == ["c", "a"]
    assert got[4] == []


def test_bpe_encoder_roundtrip_with_induction(spark, sf_dir):
    """End-to-end tokenizer loop: learn merges from the corpus
    (bpe_merge_candidates), apply them with the encoder, and check
    the global invariants — token count shrinks by exactly the number
    of merge events, and splitting the encoded units on spaces
    restores the original token stream."""
    from fintech_lakehouse_spark.functions.python_udfs import make_bpe_encoder
    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.sources.readers import load_table

    rows = sorted(
        QUERIES["bpe_merge_candidates"](spark, sf_dir).collect(),
        key=lambda r: r["merge_rank"],
    )
    merges = [tuple(r["pair"].split(" ", 1)) for r in rows]
    assert merges
    enc = make_bpe_encoder(merges)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    out = docs.select("doc_id", "toks", enc("toks").alias("enc")).collect()
    assert len(out) > 0
    for r in out:
        rebuilt = [t for unit in r["enc"] for t in unit.split(" ")]
        assert rebuilt == r["toks"]
        assert len(r["enc"]) <= len(r["toks"])


def test_hll_sketch_merge_is_lossless(spark):
    """The re-aggregation property monthly_unique_users_rollup leans
    on: unioning per-day sketches yields the SAME estimate as one
    sketch built directly over the whole month (bucket-max merge is
    associative and order-independent), while summing per-day exact
    distincts overcounts repeat users."""
    rows = [(d, u) for d in range(10) for u in range(0, 60 + d * 5)]
    df = spark.createDataFrame(rows, ["day", "user"])
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user")).alias("est")
    ).collect()[0]["est"]
    merged = (
        df.groupBy("day")
        .agg(F.hll_sketch_agg("user").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]["est"]
    )
    assert merged == direct
    naive_sum = (
        df.groupBy("day")
        .agg(F.countDistinct("user").alias("n"))
        .agg(F.sum("n").alias("s"))
        .collect()[0]["s"]
    )
    exact = df.select("user").distinct().count()
    assert naive_sum > exact  # exact counts do NOT re-aggregate


def test_theta_sketch_set_algebra_two_month_retention(spark):
    """The set-ALGEBRA property monthly_retention_theta leans on (and
    the one HLL lacks): Theta sketches intersect and difference. Two
    synthetic months — Jan has users 0..99, Feb has the even users
    0..98 plus new users 100..119 — so retention (∩) is exactly 50,
    churn (Jan∖Feb) exactly 50, union exactly 120. At these
    cardinalities Theta runs in exact mode, so the estimates are
    exact, and the 5%+1 flag contract of the registry query holds with
    slack."""
    rows = [(1, u) for u in range(100)] + [
        (2, u) for u in list(range(0, 100, 2)) + list(range(100, 120))
    ]
    df = spark.createDataFrame(rows, ["month", "user"])
    sk = df.groupBy("month").agg(
        F.theta_sketch_agg(F.col("user").cast("string")).alias("sk")
    )
    jan = sk.filter("month = 1").select(F.col("sk").alias("a"))
    feb = sk.filter("month = 2").select(F.col("sk").alias("b"))
    got = (
        jan.crossJoin(feb)
        .select(
            F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias(
                "retained"
            ),
            F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
                "churned"
            ),
            F.theta_sketch_estimate(F.theta_union("a", "b")).alias("active"),
        )
        .collect()[0]
    )
    assert got["retained"] == 50
    assert got["churned"] == 50
    assert got["active"] == 120
    # the registry query's bounds flag: estimate within 5% + 1 of exact
    assert abs(got["retained"] - 50) <= 0.05 * 50 + 1


def test_monthly_retention_theta_non_vacuous(spark, sf_dir):
    """VERDICT r6 item 1 regression: the registry query must emit
    rows (the synthetic +1-month cohort guarantees a second month even
    though the generated events span one calendar month), the retained
    count must be positive, and the sketch bounds flag must hold."""
    from fintech_lakehouse_spark.plans import QUERIES

    rows = QUERIES["monthly_retention_theta"](spark, sf_dir).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["exact_retained"] > 0
        assert r["sketch_within_bounds"] is True


def test_json_fields_udtf_schema_follows_arguments(spark):
    """The analyze()-polymorphic UDTF: output columns are named and
    counted by the call site's literal arguments; values render as
    strings, absent keys as NULL."""
    from pyspark.sql.functions import lit

    from fintech_lakehouse_spark.functions.python_udfs import json_fields_udtf

    JsonFields = json_fields_udtf()
    df = spark.createDataFrame(
        [(1, '{"k": 7, "tag": "x"}'), (2, '{"k": 9}'), (3, None)],
        ["id", "js"],
    )
    out = df.lateralJoin(
        JsonFields(F.col("js").outer(), lit("k"), lit("tag"))
    ).select("id", "k", "tag")
    assert out.columns == ["id", "k", "tag"]
    rows = {r["id"]: (r["k"], r["tag"]) for r in out.collect()}
    assert rows == {1: ("7", "x"), 2: ("9", None), 3: (None, None)}
    # a different call site resolves a different schema
    out2 = df.lateralJoin(JsonFields(F.col("js").outer(), lit("tag")))
    assert out2.columns == ["id", "js", "tag"]


def _make_png(pixels, filters):
    """Hand-built PNG (stdlib struct+zlib only): 8-bit RGB,
    non-interlaced, one explicit filter type per scanline — the
    filters are ENCODED here (forward direction) so the decoder's
    unfiltering is exercised against an independent construction."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0])
    ch = 3

    def filt(ftype, row, prior):
        flat = [b for px in row for b in px]
        pflat = [b for px in prior for b in px] if prior else [0] * (w * ch)
        out = []
        for x, v in enumerate(flat):
            a = out_recon[x - ch] if x >= ch else 0
            b = pflat[x]
            c = prior_recon[x - ch] if (prior and x >= ch) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        return bytes(out)

    raw = bytearray()
    prior_row = None
    prior_recon = None
    for y, row in enumerate(row for row in pixels):
        ftype = filters[y % len(filters)]
        out_recon = [b for px in row for b in px]  # recon = true pixels
        raw.append(ftype)
        raw += filt(ftype, row, prior_row)
        prior_row = row
        prior_recon = out_recon

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    body = zlib.compress(bytes(raw))
    # split IDAT in two to exercise multi-chunk concatenation
    mid = max(1, len(body) // 2)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body[:mid])
        + chunk(b"IDAT", body[mid:])
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_all_filters(spark):
    """Full stdlib PNG decode: a 5-row image encoded with one scanline
    filter per row (None/Sub/Up/Average/Paeth) must reconstruct the
    exact pixel array; header path reports dims; corrupt/unsupported
    payloads quarantine as None."""
    import numpy as np

    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        decode_png_pixels,
        extract_image_features,
        read_png_header,
    )

    pixels = [
        [((x * 37 + y * 11 + c * 5) % 256 for c in range(3)) for x in range(6)]
        for y in range(5)
    ]
    pixels = [[tuple(px) for px in row] for row in pixels]
    png = _make_png(pixels, filters=[0, 1, 2, 3, 4])

    assert read_png_header(png) == (6, 5, 8, 2)
    arr = decode_png_pixels(png)
    assert arr is not None and arr.shape == (5, 6, 3)
    assert np.array_equal(arr, np.array(pixels, dtype=np.uint8))

    # Spark integration: dims through the real decode path
    assets = spark.createDataFrame(
        [
            (1, "image", "png", bytearray(png), len(png)),
            (2, "image", "png", bytearray(b"\x89PNG broken"), 11),
        ],
        ASSET_SCHEMA,
    )
    feats = {
        r["asset_id"]: r
        for r in extract_image_features(assets, decode="real").collect()
    }
    assert (feats[1]["width"], feats[1]["height"]) == (6, 5)
    assert feats[2]["width"] is None

    # quarantine contract for unsupported subsets
    assert decode_png_pixels(b"not a png") is None
    interlaced = bytearray(png)
    interlaced[28] = 1  # set the IHDR interlace flag
    assert decode_png_pixels(bytes(interlaced)) is None


def test_real_png_resize_roundtrip(spark):
    """PNG resize through mapInPandas: decode → nearest-neighbor →
    re-encode; the emitted payload must decode back to the exact
    pixels the PPM/BMP kernels would pick (source rows 0,1 / cols
    0,2 for a 4x2 → 2x2)."""
    import numpy as np

    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        decode_png_pixels,
        encode_png,
        resize_images,
        resize_png_nearest,
    )

    src = np.array(
        [
            [[c * 16, r * 16, 7] for c in range(4)]
            for r in range(2)
        ],
        dtype=np.uint8,
    )
    png = encode_png(src)
    # encoder/decoder roundtrip is exact
    assert np.array_equal(decode_png_pixels(png), src)

    assets = spark.createDataFrame(
        [
            (1, "image", "png", bytearray(png), len(png)),
            (2, "image", "png", bytearray(b"\x89PNG junk"), 9),
        ],
        ASSET_SCHEMA,
    )
    resized = {
        r["asset_id"]: r
        for r in resize_images(assets, width=2, height=2, decode="real").collect()
    }
    out = decode_png_pixels(bytes(resized[1]["payload"]))
    assert np.array_equal(out, src[[0, 1]][:, [0, 2]])
    assert resized[2]["payload"] is None  # corrupt → quarantined
    # driver-side kernel agrees with the Spark path
    assert resize_png_nearest(png, 2, 2) == bytes(resized[1]["payload"])


def test_png_oversized_dims_quarantine(spark):
    """A corrupt PNG whose IHDR claims width 2^32-1 must quarantine
    (None dims), not crash the Int32 feature column — the
    quarantine-not-crash contract under adversarial headers."""
    import struct
    import zlib

    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        extract_image_features,
        read_png_header,
    )

    ihdr = struct.pack(">IIBBBBB", 0xFFFFFFFF, 1, 8, 2, 0, 0, 0)
    chunk = (
        struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    bad = b"\x89PNG\r\n\x1a\n" + chunk
    assert read_png_header(bad) is None
    assets = spark.createDataFrame(
        [(1, "image", "png", bytearray(bad), len(bad))], ASSET_SCHEMA
    )
    feats = extract_image_features(assets, decode="real").collect()
    assert feats[0]["width"] is None


def test_jpeg_header_parse_and_quarantine():
    """Header-level JPEG decode: marker walk to SOF dims; truncated,
    non-JPEG, and dimension-less streams quarantine to None."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_jpeg_header,
        synthesize_jpeg_header,
    )

    assert read_jpeg_header(synthesize_jpeg_header(640, 480)) == (640, 480)
    assert read_jpeg_header(synthesize_jpeg_header(1, 1)) == (1, 1)
    payload = synthesize_jpeg_header(640, 480)
    assert read_jpeg_header(payload[:6]) is None          # truncated
    assert read_jpeg_header(b"") is None
    assert read_jpeg_header(b"\x89PNG\r\n\x1a\n") is None  # wrong magic
    # SOI immediately followed by EOI: well-formed but no frame header
    assert read_jpeg_header(b"\xff\xd8\xff\xd9") is None
    # progressive (SOF2) dims parse the same way
    prog = payload.replace(b"\xff\xc0", b"\xff\xc2")
    assert read_jpeg_header(prog) == (640, 480)


def test_mp4_header_parse_and_quarantine():
    """ISO-BMFF box walk: mvhd duration + tkhd 16.16 dims; corrupt box
    sizes and missing boxes quarantine to None."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp4_header,
        synthesize_mp4_header,
    )

    assert read_mp4_header(synthesize_mp4_header(75, 1920, 1080)) == (
        75, 1920, 1080,
    )
    payload = synthesize_mp4_header(75, 1920, 1080)
    assert read_mp4_header(payload[:20]) is None          # truncated
    assert read_mp4_header(b"") is None
    assert read_mp4_header(b"\x00" * 32) is None          # zero box sizes
    # ftyp alone (no moov) carries no metadata
    assert read_mp4_header(payload[:16]) is None


def test_video_features_real_mp4(spark):
    """extract_video_features(decode='real') parses mp4 box trees
    distributed via mapInPandas; a corrupt payload quarantines to
    nulls instead of failing the batch."""
    from fintech_lakehouse_spark.functions.multimodal import (
        extract_video_features,
        synthesize_mp4_header,
    )

    assets = spark.createDataFrame(
        [
            (1, "video", "mp4", synthesize_mp4_header(10, 640, 360)),
            (2, "video", "mp4", b"not an mp4"),
        ],
        "asset_id long, modality string, format string, payload binary",
    )
    rows = {
        r["asset_id"]: (r["duration_sec"], r["width"], r["height"])
        for r in extract_video_features(assets, decode="real").collect()
    }
    assert rows[1] == (10, 640, 360)
    assert rows[2] == (None, None, None)


def test_mp3_header_parse_and_quarantine():
    """MP3 CBR frame walk: duration = frames x 1152 / rate; junk
    prefixes are scanned past, non-MPEG1-L3 streams quarantine."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_header,
        synthesize_mp3,
    )

    assert read_mp3_header(synthesize_mp3(120, 0)) == (3, 44100, 120)
    assert read_mp3_header(synthesize_mp3(240, 2)) == (8, 32000, 240)
    # leading junk before the first sync is scanned past (ID3-ish)
    assert read_mp3_header(b"ID3junk" + synthesize_mp3(120, 1)) == (
        2, 48000, 120,
    )
    assert read_mp3_header(b"") is None
    assert read_mp3_header(b"\x00" * 64) is None
    # a sync that is not MPEG1 Layer III quarantines
    assert read_mp3_header(b"\xff\xe2\x90\x00" + b"\x00" * 40) is None


def test_mp4_multi_track_keeps_video_dims():
    """A later 0x0-dim track (audio) must not clobber the video
    track's tkhd dims (review finding r6s5)."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp4_header,
        synthesize_mp4_header,
    )

    base = synthesize_mp4_header(30, 1280, 720)
    # rebuild with an extra audio trak (0x0 dims) appended inside moov
    def box(btype, data):
        return (8 + len(data)).to_bytes(4, "big") + btype + data

    audio_tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + (0).to_bytes(4, "big") * 2
        + (2).to_bytes(4, "big") + (0).to_bytes(4, "big")
        + (30000).to_bytes(4, "big") + b"\x00" * 8 + b"\x00" * 8
        + b"\x00" * 36 + (0).to_bytes(4, "big") + (0).to_bytes(4, "big"),
    )
    audio_trak = box(b"trak", audio_tkhd)
    # base = ftyp + moov; splice the audio trak into moov
    ftyp_size = int.from_bytes(base[:4], "big")
    moov = base[ftyp_size:]
    moov_body = moov[8:]
    new_moov = box(b"moov", moov_body + audio_trak)
    assert read_mp4_header(base[:ftyp_size] + new_moov) == (30, 1280, 720)


def test_jpeg_fill_bytes_between_segments():
    """Spec-legal 0xFF fill bytes before a marker id must not desync
    the walk (review finding r6s5)."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_jpeg_header,
        synthesize_jpeg_header,
    )

    p = synthesize_jpeg_header(31, 17)
    filled = p[:2] + b"\xff\xff" + p[2:]  # fill bytes before APP0
    assert read_jpeg_header(filled) == (31, 17)


def test_mp3_false_sync_in_leading_junk():
    """0xFF Ex bytes inside leading junk (ID3 album art) are FALSE
    syncs — the scan must continue to the first real frame instead of
    quarantining the whole stream (review finding r6s5)."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_header,
        synthesize_mp3,
    )

    junk = b"ID3\x04\x00" + b"\xff\xe2\x01\x02" + b"art-bytes"
    assert read_mp3_header(junk + synthesize_mp3(120, 0)) == (3, 44100, 120)


def test_real_resize_unknown_format_hits_the_loud_seam(spark):
    """A format with no stdlib codec (tiff) must raise in
    resize_images(decode='real'), never silently quarantine through
    the netpbm kernel (review finding r6s5). jpeg left this class in
    r7: it now resizes for real through the functions/jpeg.py DCT
    codec — asserted here alongside the seam."""
    import numpy as np
    import pytest as _pytest

    from fintech_lakehouse_spark.functions.jpeg import encode_jpeg
    from fintech_lakehouse_spark.functions.multimodal import (
        ASSET_SCHEMA,
        resize_images,
    )

    payload = encode_jpeg(np.full((8, 8), 77, dtype=np.uint8))
    jpeg_assets = spark.createDataFrame(
        [(1, "image", "jpeg", bytearray(payload), len(payload))],
        ASSET_SCHEMA,
    )
    rows = resize_images(jpeg_assets, 4, 4, decode="real").collect()
    assert rows[0]["payload"] is not None  # real resize, no seam

    tiff_assets = spark.createDataFrame(
        [(1, "image", "tiff", bytearray(b"II*\x00"), 4)], ASSET_SCHEMA
    )
    with _pytest.raises(Exception, match="NotImplementedError|PIL"):
        resize_images(tiff_assets, 4, 4, decode="real").collect()


# ---------------------------------------------------------------------------
# baseline JPEG codec (functions/jpeg.py)


def test_jpeg_roundtrip_flat_quant_tolerance():
    """Near-lossless mode: with the flat quant table the only error
    sources are coefficient rounding (gray ≤1/pixel) and the YCbCr
    float roundtrip (RGB ≤2/pixel) — the bound jpeg_raster_roundtrip
    pins under the driver hash, here on random (worst-case,
    full-spectrum) rasters across non-8-multiple dims."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(7)
    for h, w in [(8, 8), (13, 21), (1, 1), (9, 40)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        dec = decode_jpeg_pixels(encode_jpeg(g))
        assert dec.shape == (h, w)
        assert int(np.max(np.abs(dec.astype(int) - g.astype(int)))) <= 1
        c = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec3 = decode_jpeg_pixels(encode_jpeg(c))
        assert dec3.shape == (h, w, 3)
        assert int(np.max(np.abs(dec3.astype(int) - c.astype(int)))) <= 2


def test_jpeg_single_component_scan_ignores_sampling_factors():
    """ADVICE r9 (low): per the spec a one-component scan is
    NON-INTERLEAVED — MCU = one data unit, sampling factors do not
    shape the MCU. A grayscale JPEG declaring 2×2 (or 2×1) factors
    carries the exact same plain block raster as a 1×1 one, so the
    decoder must return identical pixels (before the fix it read a
    2×2-block MCU grid: wrong block count and order → desync)."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    for h, w in [(24, 20), (13, 21), (16, 16)]:
        g = rng.integers(0, 256, (h, w), dtype=np.uint8)
        payload = bytearray(encode_jpeg(g))
        base = decode_jpeg_pixels(bytes(payload))
        sof = bytes(payload).index(b"\xff\xc0")
        hv_at = sof + 11  # marker(2)+len(2)+prec(1)+h(2)+w(2)+nf(1)+cid(1)
        assert payload[hv_at] == 0x11
        for hv in (0x22, 0x21, 0x12):
            payload[hv_at] = hv
            dec = decode_jpeg_pixels(bytes(payload))
            assert dec is not None, hex(hv)
            assert np.array_equal(dec, base), hex(hv)


def test_jpeg_quality_table_bounds_error_by_quant_step():
    """Lossy mode: per-pixel reconstruction error of an IDCT of
    quantized coefficients is bounded by the quantization step budget
    (½·Σq/8 per pixel in the worst case); check the practical bound on
    a smooth gradient at q90 and that q50 is coarser than q90."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
        quality_quant_table,
    )

    xx, yy = np.meshgrid(np.arange(64), np.arange(48))
    img = np.stack(
        [((xx * 2 + yy * 3) % 256), (255 - (xx + yy) % 256), (xx % 256)],
        axis=-1,
    ).astype(np.uint8)
    e90 = np.abs(
        decode_jpeg_pixels(encode_jpeg(img, quant=quality_quant_table(90))).astype(int)
        - img.astype(int)
    )
    e50 = np.abs(
        decode_jpeg_pixels(encode_jpeg(img, quant=quality_quant_table(50))).astype(int)
        - img.astype(int)
    )
    assert e90.max() <= 16
    assert e90.mean() <= 2.0
    assert e50.mean() >= e90.mean()


def test_jpeg_idct_matches_direct_formula():
    """The vectorized einsum IDCT equals the textbook DCT-III double
    sum f(x,y) = ¼ ΣΣ C(u)C(v) F(u,v) cos((2x+1)uπ/16)cos((2y+1)vπ/16)
    on random coefficient blocks (1e-9), and the basis matrix is
    orthonormal (M·Mᵀ = I)."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import _M

    assert np.allclose(_M @ _M.T, np.eye(8), atol=1e-12)
    rng = np.random.default_rng(11)
    F_ = rng.normal(0, 100, (8, 8))
    fast = _M.T @ F_ @ _M
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F_[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s / 4
    assert np.allclose(fast, direct, atol=1e-9)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn path: encoding with a restart interval resets the DC
    predictors and realigns the bitstream; the decode must equal the
    marker-free encode bit-for-bit in pixels."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    plain = decode_jpeg_pixels(encode_jpeg(img))
    with_rst = decode_jpeg_pixels(encode_jpeg(img, restart_interval=2))
    assert np.array_equal(plain, with_rst)
    assert b"\xff\xd0" in encode_jpeg(img, restart_interval=2)


def test_jpeg_unsupported_subsets_quarantine():
    """Progressive (SOF2), subsampled chroma, 12-bit precision,
    truncated entropy data, and non-JPEG bytes all return None —
    quarantine, not crash (decode_png_pixels' contract)."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = np.full((8, 8), 100, dtype=np.uint8)
    good = bytearray(encode_jpeg(img))
    sof_at = bytes(good).find(b"\xff\xc0")
    assert sof_at > 0
    progressive = bytes(good[:sof_at + 1]) + b"\xc2" + bytes(good[sof_at + 2:])
    assert decode_jpeg_pixels(progressive) is None
    twelve_bit = bytearray(good)
    twelve_bit[sof_at + 4] = 12
    assert decode_jpeg_pixels(bytes(twelve_bit)) is None
    # grayscale declaring 2x2 factors now DECODES (non-interleaved
    # single-component scan, r10 — see the dedicated test); factors
    # beyond 2 stay refused
    oversampled = bytearray(good)
    oversampled[sof_at + 11] = 0x33  # h=3, v=3 sampling
    assert decode_jpeg_pixels(bytes(oversampled)) is None
    assert decode_jpeg_pixels(bytes(good[: len(good) // 2])) is None
    assert decode_jpeg_pixels(b"not a jpeg") is None
    assert decode_jpeg_pixels(b"") is None


def test_jpeg_decode_bomb_quarantined_before_allocation():
    """A crafted SOF0 claiming 65535x65535 RGB (~100 GB of coefficient
    planes) must be quarantined by the declared-dimension cap BEFORE
    any allocation — not kill the executor with MemoryError (advice
    finding r7). Built by patching a valid stream's SOF0 dimensions so
    every table/scan segment still parses up to the bound check."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        _MAX_DECODE_PIXELS,
        decode_jpeg_pixels,
        encode_jpeg,
    )

    img = np.full((8, 8), 100, dtype=np.uint8)
    bomb = bytearray(encode_jpeg(img))
    sof_at = bytes(bomb).find(b"\xff\xc0")
    assert sof_at > 0
    # SOF0 payload: [len:2][precision:1][h:2][w:2][nf:1]...
    bomb[sof_at + 5 : sof_at + 7] = (65535).to_bytes(2, "big")
    bomb[sof_at + 7 : sof_at + 9] = (65535).to_bytes(2, "big")
    assert 65535 * 65535 > _MAX_DECODE_PIXELS
    assert decode_jpeg_pixels(bytes(bomb)) is None


def test_jpeg_decoder_handles_variable_length_huffman():
    """The decoder must handle arbitrary DHT tables, not just the
    encoder's uniform-length ones: symbol-level roundtrip through the
    Annex-K-shaped variable-length DC table (codes from 2 to 9 bits)
    using the same _HuffTable/_BitWriter/_BitReader machinery the
    file paths use."""
    from fintech_lakehouse_spark.functions.jpeg import (
        _BitReader,
        _BitWriter,
        _HuffTable,
    )

    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    table = _HuffTable(bits, list(range(12)))
    lengths = {s: table.encode[s][1] for s in range(12)}
    assert min(lengths.values()) == 2 and max(lengths.values()) == 9
    symbols = [0, 11, 5, 5, 1, 10, 3, 7, 2, 9, 4, 8, 6, 0, 11]
    w = _BitWriter()
    for s in symbols:
        code, length = table.encode[s]
        w.write(code, length)
    w.flush()
    r = _BitReader(bytes(w.out), 0)
    assert [r.decode_symbol(table) for _ in symbols] == symbols


def test_jpeg_resize_through_codec():
    """resize_jpeg_nearest: decode → shared nearest-neighbor kernel →
    re-encode; recovered dims match the target and the resampled
    pixels match an independently computed nearest-neighbor reference
    within the flat-quant tolerance."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )
    from fintech_lakehouse_spark.functions.multimodal import (
        _nearest_indices,
        resize_jpeg_nearest,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (20, 30, 3), dtype=np.uint8)
    payload = encode_jpeg(img)
    resized = resize_jpeg_nearest(payload, 12, 7)
    out = decode_jpeg_pixels(resized)
    assert out.shape == (7, 12, 3)
    first = decode_jpeg_pixels(payload)
    ys, xs = _nearest_indices(20, 30, 7, 12)
    ref = first[ys][:, xs]
    assert int(np.max(np.abs(out.astype(int) - ref.astype(int)))) <= 2
    assert resize_jpeg_nearest(b"garbage", 4, 4) is None


def test_jl_projection_matches_numpy_and_preserves_distance(spark, sf_dir):
    """jl_project equals the numpy reference (S·v/√k, 1e-9) and the
    JL lemma holds statistically on the real embeddings: the mean
    squared-distance distortion ratio across the registry query's
    5×190 pair grid is within 2·√(2/k) of 1 (k=16 → ±0.354), and no
    deterministic drift (mean projected distance ≈ mean true
    distance). Per-pair ratios are NOT asserted — JL is a
    concentration bound, not a per-pair guarantee."""
    import numpy as np

    from fintech_lakehouse_spark.functions.vectors import jl_project
    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.plans._jl_matrix import K, SIGNS
    from fintech_lakehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    got = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select("vec_id", "v", jl_project(F.col("v"), SIGNS).alias("p")).collect()
    S = np.array(SIGNS, dtype=np.float64)
    for r in got:
        ref = S @ np.array(r["v"]) / np.sqrt(K)
        assert np.allclose(np.array(r["p"]), ref, atol=1e-9)

    pairs = QUERIES["jl_projection_distortion"](spark, sf_dir).collect()
    assert len(pairs) == 950
    ratios = np.array(
        [r["proj_dist_sq"] / r["dist_sq"] for r in pairs if r["dist_sq"] > 0]
    )
    assert abs(ratios.mean() - 1.0) <= 2 * np.sqrt(2.0 / K)


def test_misra_gries_guarantees_hold_under_any_partitioning(spark):
    """The MG contract the registry query leans on, checked under
    THREE different partitionings of a Zipf-ish stream: (1) the merged
    summary holds ≤ partitions×m items while the stream has far more
    distinct values — evictions really ran; (2) every item with
    f(t) > N/m is present; (3) every counter satisfies
    f(t) − N/m ≤ C(t) ≤ f(t). Counter VALUES may differ between
    partitionings — only the guarantees are portable, which is why the
    query emits flags, not counters."""
    from fintech_lakehouse_spark.functions.sketches import (
        misra_gries_merged,
    )

    m = 64
    # cube-law stream: item 0 ~10% of mass, ~1000 distinct items
    base = spark.range(200_000).selectExpr(
        "CAST(floor(pow((pmod(hash(id), 1000000) + 1000000) % 1000000"
        " / 1000000.0, 3.0) * 1000) AS LONG) AS item"
    )
    exact = {
        r["item"]: r["n"]
        for r in base.groupBy("item").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(exact.values())
    bound = n_total / m
    for df in (base, base.repartition(4), base.repartition(13, "item")):
        merged = {
            r["item"]: r["counter"]
            for r in misra_gries_merged(df, "item", m=m).collect()
        }
        n_parts = df.rdd.getNumPartitions()
        assert len(merged) <= n_parts * m
        assert len(exact) > n_parts * m / 2  # evictions were forced
        for item, f in exact.items():
            if f > bound:
                assert item in merged, f"guaranteed item {item} missing"
        for item, c in merged.items():
            assert c <= exact[item]
            assert exact[item] - c <= bound


def test_mmr_pandas_matches_unrolled_registry_instance(spark, sf_dir):
    """The general-k applyInPandas MMR must reproduce the k=3 unrolled
    plan the driver hash-checks (same pool, same λ, same tie-break) —
    and its rank-1 pick is always the pure-relevance argmax while
    later picks trade relevance for diversity (mmr_score ≤ λ·rel +
    (1−λ), monotone non-increasing selection scores)."""
    import math

    from fintech_lakehouse_spark.functions.vectors import (
        cosine,
        mmr_rerank_pandas,
    )
    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.plans.vectors import (
        MMR_POOL,
        _embeddings_double,
    )

    emb = _embeddings_double(spark, sf_dir)
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    pool = (
        emb.filter(F.col("vec_id") >= 10)
        .crossJoin(F.broadcast(q))
        .select(
            F.lit(0).alias("query_id"),
            "vec_id",
            cosine(F.col("embedding"), F.col("qv")).alias("rel"),
            "embedding",
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_POOL)
    )
    got = {
        r["rank"]: (r["vec_id"], round(r["relevance"], 4), round(r["mmr_score"], 4))
        for r in mmr_rerank_pandas(pool, k=3, lam=0.7).collect()
    }
    expected = {
        r["rank"]: (r["vec_id"], r["relevance"], r["mmr_score"])
        for r in QUERIES["mmr_diverse_rerank"](spark, sf_dir).collect()
    }
    assert set(got) == {1, 2, 3}
    for rank in (1, 2, 3):
        gv, gr, gm = got[rank]
        ev, er, em = expected[rank]
        assert gv == ev
        assert math.isclose(gr, er, abs_tol=1e-4)
        assert math.isclose(gm, em, abs_tol=1e-4)
    # selection scores are non-increasing (greedy argmax property)
    assert got[1][2] >= got[2][2] >= got[3][2]


def test_compression_ratio_orders_quality_bands(spark):
    """compression_ratio_scores: repetitive text compresses hardest,
    natural-ish prose sits in the middle, random hex noise barely
    compresses — the ordering that makes the DEFLATE ratio a usable
    model-free quality band; ppm arithmetic is exact integers."""
    import random

    from fintech_lakehouse_spark.functions.text import (
        compression_ratio_scores,
    )

    rng = random.Random(7)
    repetitive = "spam ham " * 200
    natural = (
        "the quick brown fox jumps over the lazy dog while the merchant "
        "counts coins and ships orders across the harbor every morning "
    ) * 14
    noise = " ".join(
        "".join(rng.choice("0123456789abcdef") for _ in range(8))
        for _ in range(220)
    )
    df = spark.createDataFrame(
        [(1, repetitive), (2, natural), (3, noise), (4, "")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in compression_ratio_scores(df).collect()}
    assert rows[1]["ratio_ppm"] < rows[2]["ratio_ppm"] < rows[3]["ratio_ppm"]
    assert rows[3]["ratio_ppm"] > 500_000  # noise: poor compression
    assert rows[1]["ratio_ppm"] < 100_000  # repetition: collapses
    for r in rows.values():
        if r["n_bytes"]:
            assert (
                r["ratio_ppm"]
                == r["n_compressed"] * 1_000_000 // r["n_bytes"]
            )
    assert rows[4]["ratio_ppm"] == 0 and rows[4]["n_bytes"] == 0


def test_kmeans_lloyd_helpers_match_python_model(spark):
    """The Lloyd assign/update helpers replay a pure-Python integer
    Lloyd on a tiny 2-D fixture: two clear clusters plus a midpoint
    that flips after the first update, exercising both the argmin
    tie-break (lowest cid) and the floor-divided centroid mean."""
    from fintech_lakehouse_spark.functions.vectors import (
        kmeans_assign,
        kmeans_update,
    )

    pts = {0: [0, 0], 1: [10, 10], 2: [1, 1], 3: [9, 9], 4: [5, 5]}
    df = spark.createDataFrame(
        [(i, [int(v) for v in p]) for i, p in pts.items()], ["vec_id", "q"]
    ).select("vec_id", F.col("q").cast("array<long>"))
    cents = {0: [0, 0], 1: [10, 10]}

    def assign_py(c):
        out = {}
        for i, p in pts.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(p, cv)), cid)
                for cid, cv in c.items()
            )
            out[i] = (best[1], best[0])
        return out

    def update_py(a):
        c = {}
        for cid in sorted({v[0] for v in a.values()}):
            members = [pts[i] for i, v in a.items() if v[0] == cid]
            n = len(members)
            c[cid] = [sum(m[d] for m in members) // n for d in range(2)]
        return c

    cdf = spark.createDataFrame(
        [(cid, c) for cid, c in cents.items()], ["cid", "c"]
    ).select(F.col("cid").cast("long"), F.col("c").cast("array<long>"))
    for _ in range(2):
        exp_a = assign_py(cents)
        got_a = {
            r["vec_id"]: (r["cid"], r["dist"])
            for r in kmeans_assign(df, cdf).collect()
        }
        assert got_a == exp_a
        cents = update_py(exp_a)
        cdf = kmeans_update(kmeans_assign(df, cdf), dim=2)
        got_c = {r["cid"]: list(r["c"]) for r in cdf.collect()}
        assert got_c == cents
    # midpoint (5,5): equidistant from (0,0)+(10,10)? 50 vs 50 — tie
    # breaks to cid 0 in iteration 1, so centroid 0 drifts toward it.
    assert assign_py({0: [0, 0], 1: [10, 10]})[4][0] == 0


class TestMp4FrameBytes:
    """MP4 frame-BYTE extraction (VERDICT r7 item 6): the demuxer seek
    path — stsz sizes + stsc chunk runs + stco absolute offsets →
    mdat slices — without any codec. The ffmpeg boundary is now only
    the pixel decode of the extracted payloads."""

    def _mp4(self, frames, spc=3):
        from fintech_lakehouse_spark.functions.multimodal import (
            synthesize_mp4_with_media,
        )

        return synthesize_mp4_with_media(frames, fps=25, samples_per_chunk=spc)

    def test_roundtrip_every_frame(self):
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_frame_bytes,
        )

        frames = [bytes([i]) * (10 + i % 5) for i in range(8)]
        mp4 = self._mp4(frames)
        assert read_mp4_frame_bytes(mp4, list(range(8))) == frames
        # arbitrary subsets in arbitrary order
        assert read_mp4_frame_bytes(mp4, [7, 0, 3]) == [
            frames[7], frames[0], frames[3],
        ]

    def test_ragged_last_chunk_and_single_chunk(self):
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_frame_bytes,
            read_mp4_sample_locations,
        )

        frames = [bytes([i + 1]) * (3 + i) for i in range(7)]
        # 7 samples, 3/chunk → chunks of 3,3,1 (ragged stsc run)
        mp4 = self._mp4(frames, spc=3)
        assert read_mp4_frame_bytes(mp4, list(range(7))) == frames
        # one big chunk: stsc has a single run
        mp4_one = self._mp4(frames, spc=100)
        assert read_mp4_frame_bytes(mp4_one, list(range(7))) == frames
        ts, deltas, sizes, offsets = read_mp4_sample_locations(mp4_one)
        assert sizes == [len(f) for f in frames]
        # within one chunk, offsets are contiguous by size
        assert all(
            offsets[i + 1] == offsets[i] + sizes[i]
            for i in range(len(frames) - 1)
        )

    def test_consistent_with_frame_table(self):
        """The locations walk and the manifest walk must agree on
        timescale/deltas/sizes — same stbl, two consumers."""
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_frame_table,
            read_mp4_sample_locations,
        )

        frames = [b"x" * (5 + i) for i in range(6)]
        mp4 = self._mp4(frames)
        ts_a, deltas_a, sizes_a = read_mp4_frame_table(mp4)
        ts_b, deltas_b, sizes_b, _ = read_mp4_sample_locations(mp4)
        assert (ts_a, deltas_a, sizes_a) == (ts_b, deltas_b, sizes_b)

    def test_quarantine_paths(self):
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_frame_bytes,
        )

        frames = [b"abc", b"defg"]
        mp4 = self._mp4(frames, spc=2)
        assert read_mp4_frame_bytes(mp4[:-3], [1]) is None  # truncated mdat
        assert read_mp4_frame_bytes(mp4, [2]) is None       # out of range
        assert read_mp4_frame_bytes(mp4, [-1]) is None
        assert read_mp4_frame_bytes(b"not an mp4", [0]) is None
        assert read_mp4_frame_bytes(b"", [0]) is None

    def test_header_only_table_has_no_chunk_map(self):
        """The r7 header-only synthesizer (no stsc/stco/mdat) must
        quarantine in the locations walk — extraction REQUIRES the
        chunk map, manifests don't."""
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_sample_locations,
            synthesize_mp4_sample_table,
        )

        mp4 = synthesize_mp4_sample_table(6, fps=25, base_sample_bytes=10)
        assert read_mp4_sample_locations(mp4) is None


def test_container_frame_sampling_real_bytes(spark):
    """decode='container': the Spark-side frame sampler must return
    the REAL frame payload bytes from the mdat via the demuxer walk —
    picked at >= every_n_seconds decode-time spacing — and quarantine
    malformed containers to zero rows."""
    from fintech_lakehouse_spark.functions.multimodal import (
        sample_video_frames,
        synthesize_mp4_with_media,
    )

    # 25 fps, 75 frames = 3 seconds; sampling every 1 s → frames 0/25/50
    frames = [bytes([i % 251]) * (6 + i % 4) for i in range(75)]
    mp4 = synthesize_mp4_with_media(frames, fps=25)
    assets = spark.createDataFrame(
        [
            (3, "video", "mp4", mp4, len(mp4)),
            (4, "video", "mp4", b"corrupt container", 17),
        ],
        "asset_id long, modality string, format string, "
        "payload binary, n_bytes long",
    )
    rows = sorted(
        (r["asset_id"], r["frame_no"], r["frame_ts_sec"],
         bytes(r["frame_bytes"]))
        for r in sample_video_frames(
            assets, every_n_seconds=1, decode="container"
        ).collect()
    )
    assert [(a, k, t) for a, k, t, _ in rows] == [
        (3, 0, 0.0), (3, 25, 1.0), (3, 50, 2.0),
    ]
    assert [b for *_, b in rows] == [frames[0], frames[25], frames[50]]


def test_container_frame_sampling_truncated_mdat_quarantines_whole_asset(
    spark,
):
    """ADVICE r8: a payload truncated MID-mdat must yield ZERO rows for
    that asset — not the frames that happened to precede the
    truncation point (the read_mp4_frame_bytes all-or-None contract).
    A healthy sibling asset in the same batch is unaffected."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp4_sample_locations,
        sample_video_frames,
        synthesize_mp4_with_media,
    )

    frames = [bytes([i % 251]) * (6 + i % 4) for i in range(75)]
    mp4 = synthesize_mp4_with_media(frames, fps=25)
    # cut inside the mdat so the LAST sampled frame (50) loses its
    # final byte: the header/sample tables stay parseable and frames
    # 0/25 still slice fine — exactly the partial-emit window
    _, _, sizes, offsets = read_mp4_sample_locations(mp4)
    truncated = mp4[: offsets[50] + sizes[50] - 1]
    assets = spark.createDataFrame(
        [
            (1, "video", "mp4", mp4, len(mp4)),
            (2, "video", "mp4", truncated, len(truncated)),
        ],
        "asset_id long, modality string, format string, "
        "payload binary, n_bytes long",
    )
    rows = sample_video_frames(
        assets, every_n_seconds=1, decode="container"
    ).collect()
    assert sorted({r["asset_id"] for r in rows}) == [1]
    assert len(rows) == 3  # the healthy asset's 3 sampled frames


def test_container_frame_sampling_pixel_seam_named(spark):
    import pytest

    from fintech_lakehouse_spark.functions.multimodal import (
        sample_video_frames,
    )

    assets = spark.createDataFrame(
        [(1, "video", "mp4", b"", 0)],
        "asset_id long, modality string, format string, "
        "payload binary, n_bytes long",
    )
    with pytest.raises(NotImplementedError, match="PIXEL"):
        sample_video_frames(assets, decode="real")


def test_pq_encode_pandas_matches_frozen_literal_path(spark):
    """r9 (VERDICT r8 item 7): the production PQ encode (broadcast
    codebook + Arrow-batched NumPy) must produce IDENTICAL codes and
    identical rounded distortion to the frozen-literal registry query
    on the real embeddings table — the ivf_assign_fixed≡model
    precedent for the PQ family."""
    from fintech_lakehouse_spark.functions.vectors import pq_encode_pandas
    from fintech_lakehouse_spark.plans import QUERIES
    from fintech_lakehouse_spark.plans.vectors import _embeddings_double

    sf_dir = "/root/testdata/sf0.01"
    literal = {
        r["vec_id"]: (r["pq_code"], r["sq_err"])
        for r in QUERIES["pq_quantization_distortion"](
            spark, sf_dir
        ).collect()
    }
    emb = _embeddings_double(spark, sf_dir)
    udf_path = pq_encode_pandas(emb).select(
        "vec_id", "pq_code", F.round("sq_err_raw", 6).alias("sq_err")
    )
    got = {
        r["vec_id"]: (r["pq_code"], r["sq_err"]) for r in udf_path.collect()
    }
    assert len(got) == len(literal) > 0
    assert got == literal
    # the plan is the production shape: one Arrow-batched python node,
    # no 1024-literal expression tree
    plan = udf_path._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_mp3_side_info_decode_roundtrip_and_quarantine():
    """read_mp3_side_info (r9): recovers programmed granule gains from
    spec-layout stereo side info, keeps the zeroed-side-info grammar
    (gain 0), tolerates leading junk, and quarantines a stream
    truncated mid side info."""
    from fintech_lakehouse_spark.functions.multimodal import (
        MP3_SAMPLES_PER_FRAME,
        read_mp3_header,
        read_mp3_side_info,
        synthesize_mp3,
    )

    mp3 = synthesize_mp3(40, 1, global_gain=200)
    nf, rate, gch, gain_sum, p23 = read_mp3_side_info(mp3)
    assert (nf, rate) == (40, 48000)
    assert gch == 4 * 40  # 2 granules x 2 channels per frame
    assert gain_sum == 4 * 40 * 200
    assert p23 == 0
    # the header walk agrees with the side-info walk
    assert read_mp3_header(mp3) == (40 * MP3_SAMPLES_PER_FRAME // 48000,
                                    48000, 40)
    # zeroed side info (the pre-r9 synthesizer form): gains sum to 0
    z = synthesize_mp3(8, 0)
    assert read_mp3_side_info(z) == (8, 44100, 32, 0, 0)
    # leading junk before the first sync is scanned past
    assert read_mp3_side_info(b"ID3junk\xff\xe0" + mp3)[0] == 40
    # truncated mid side info of the FIRST frame: quarantine
    assert read_mp3_side_info(mp3[:20]) is None
    assert read_mp3_side_info(b"") is None


def test_jpeg_420_subsampling_roundtrip_and_decode_support():
    """r9: the codec handles 4:2:0 — the encoder writes real 2x2/1x1
    sampling factors with MCU-interleaved blocks and exact 2x2 chroma
    means; the decoder reconstructs at full resolution (replication
    upsample). Smooth gradients roundtrip within a few codes; odd
    dims, restart markers, and the 444/grayscale paths are unchanged;
    sampling factors beyond 2x2 still quarantine."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    for h, w in [(16, 16), (17, 23), (8, 8), (64, 48), (37, 61)]:
        yy, xx = np.mgrid[0:h, 0:w]
        # mild slopes (chroma changes ≲3/pixel): steeper gradients lose
        # genuinely more to the 2x2 chroma averaging, which is the
        # subsampling trade, not a codec bug
        img = np.stack(
            [
                np.minimum(yy * 3 + xx * 2, 255),
                np.minimum(yy * 2 + 20, 255),
                np.minimum(xx * 3 + 10, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        enc = encode_jpeg(img, subsampling="420")
        dec = decode_jpeg_pixels(enc)
        assert dec is not None and dec.shape == img.shape, (h, w)
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.max() <= 8, (h, w, err.max())
        # 420 must actually be smaller than 444 on chroma-bearing sizes
        if h * w >= 1024:
            assert len(enc) < len(encode_jpeg(img))
        # header carries the real sampling factors (Y=0x22)
        sof = enc.find(b"\xff\xc0")
        assert enc[sof + 11] == 0x22 and enc[sof + 14] == 0x11
    # restart markers across 420 MCUs
    img = np.stack(
        [np.tile(np.arange(48, dtype=np.uint8), (48, 1))] * 3, axis=-1
    )
    d = decode_jpeg_pixels(encode_jpeg(img, subsampling="420",
                                       restart_interval=2))
    assert d is not None and d.shape == img.shape
    # 4:2:2 (asymmetric 2x1 factors) roundtrips too
    for h, w in [(16, 16), (19, 27)]:
        yy, xx = np.mgrid[0:h, 0:w]
        img2 = np.stack(
            [
                np.minimum(yy * 3 + xx * 2, 255),
                np.minimum(yy * 2 + 20, 255),
                np.minimum(xx * 3 + 10, 255),
            ],
            axis=-1,
        ).astype(np.uint8)
        enc = encode_jpeg(img2, subsampling="422")
        sof = enc.find(b"\xff\xc0")
        assert enc[sof + 11] == 0x21
        dec = decode_jpeg_pixels(enc)
        assert dec is not None and dec.shape == img2.shape
        assert np.abs(dec.astype(int) - img2.astype(int)).max() <= 8
    # factors beyond 2x2 quarantine: patch Y's sampling byte to 3x3
    enc = bytearray(encode_jpeg(img, subsampling="420"))
    sof = bytes(enc).find(b"\xff\xc0")
    enc[sof + 11] = 0x33
    assert decode_jpeg_pixels(bytes(enc)) is None
    # unknown subsampling parameter rejected
    import pytest

    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="411")


def test_mp3_bigvalues_huffman_roundtrip_and_quarantines():
    """r10 (VERDICT r9 item 8): the big_values entropy layer — spec
    table-1 Huffman codes + sign bits round-trip exactly for the mono
    long-block subset; everything outside the subset quarantines."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_header,
        read_mp3_side_info,
        read_mp3_spectrum,
        synthesize_mp3,
        synthesize_mp3_spectrum,
    )

    for idx in (0, 1, 2):
        vals = [1, 0, -1, 1, 0, 0, -1, -1, 1, 1, 0, -1]
        p = synthesize_mp3_spectrum(vals, idx)
        # the frame still parses at the two shallower levels
        assert read_mp3_header(p) is not None
        assert read_mp3_side_info(p) is not None
        rate, got = read_mp3_spectrum(p)
        assert got == vals
    # every (x, y) magnitude/sign combination
    allpairs = [v for x in (-1, 0, 1) for y in (-1, 0, 1) for v in (x, y)]
    assert read_mp3_spectrum(synthesize_mp3_spectrum(allpairs, 0))[1] == allpairs
    # empty spectrum: zero big_values, empty value list
    assert read_mp3_spectrum(synthesize_mp3_spectrum([], 1)) == (48000, [])
    # quarantines: stereo stream, truncated entropy data, junk,
    # odd-length/out-of-range synth inputs refused at the encoder
    assert read_mp3_spectrum(synthesize_mp3(2, 0, global_gain=70)) is None
    p = synthesize_mp3_spectrum([1, -1] * 8, 0)
    assert read_mp3_spectrum(p[:22]) is None
    assert read_mp3_spectrum(b"junk") is None
    assert read_mp3_spectrum(b"") is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        synthesize_mp3_spectrum([1, 0, 1], 0)  # odd count
    with _pytest.raises(ValueError):
        synthesize_mp3_spectrum([2, 0], 0)  # beyond table-1 magnitude
    # a non-table-1 table_select in the side info must quarantine:
    # patch granule 0's first table_select (bit offset 9+5+4+12+9+8+4+1
    # = 52 within the side info, byte 4 of the frame + 17-byte window)
    b = bytearray(p)
    side_start = 4
    bit = 52
    # set the 5-bit field to 7 (binary 00111): bits 52..56
    for j, v in enumerate((0, 0, 1, 1, 1)):
        byte_i = side_start + ((bit + j) >> 3)
        mask = 1 << (7 - ((bit + j) & 7))
        b[byte_i] = (b[byte_i] | mask) if v else (b[byte_i] & ~mask)
    assert read_mp3_spectrum(bytes(b)) is None


def test_mp3_scalefactor_region_roundtrip():
    """r10 second pass: the part2 SCALEFACTOR region — 21 long-block
    values at the scalefac_compress-selected (slen1, slen2) widths —
    round-trips ahead of the Huffman data; oversized values refuse at
    the encoder; the degenerate slen=0 widths code only zeros."""
    import pytest as _pytest

    from fintech_lakehouse_spark.functions.multimodal import (
        _MP3_SLEN,
        read_mp3_granule,
        synthesize_mp3_spectrum,
    )

    vals = [1, -1, 0, 1]
    for sfc, (s1, s2) in enumerate(_MP3_SLEN):
        sfs = [(3 + k) % (1 << s1) for k in range(11)] + [
            (5 + k) % (1 << s2) for k in range(10)
        ]
        p = synthesize_mp3_spectrum(
            vals, sfc % 3, scalefac_compress=sfc, scalefactors=sfs
        )
        g = read_mp3_granule(p)
        assert g is not None
        assert g["scalefac_compress"] == sfc
        assert g["scalefactors"] == sfs
        assert g["values"] == vals
    with _pytest.raises(ValueError, match="exceeds slen"):
        synthesize_mp3_spectrum(
            vals, 0, scalefac_compress=1, scalefactors=[1] * 21
        )  # band 0 has slen1=0: only 0 fits
    # scalefactors-only granule (big_values = 0, table 0)
    g = read_mp3_granule(
        synthesize_mp3_spectrum(
            [], 0, scalefac_compress=15, scalefactors=list(range(21))[:11]
            + [(k % 8) for k in range(10)]
        )
    )
    assert g["values"] == [] and len(g["scalefactors"]) == 21
