"""Independent-implementation checks for plans/selection.py — the
DSIR / span-dedup / quality-classifier trio. Each query is verified
against a plain-Python model (the SemDeDup-bruteforce pattern), and
the scale-critical plan shapes are pinned."""

from __future__ import annotations

import hashlib
from collections import Counter

from fintech_lakehouse_spark.plans import QUERIES
from fintech_lakehouse_spark.plans.selection import (
    DSIR_BUCKETS,
    DSIR_SCALE,
    QF_BUCKETS,
    QF_WEIGHT_SPAN,
    SPAN_GRAM,
    SPAN_MIN_RUN,
)
from fintech_lakehouse_spark.sources.readers import load_table


def _md5_mod(salt: str, value: str, mod: int) -> int:
    h = hashlib.md5(f"{salt}|{value}".encode()).hexdigest()
    return int(h[:12], 16) % mod


def test_dsir_weights_match_python_model(spark, sf_dir):
    """Replay the exact integer DSIR scoring in plain Python: hashed
    unigram buckets, Laplace-smoothed target/raw counts, floor-divided
    micro-unit ratios — every non-target doc must match exactly."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    tgt_c: Counter = Counter()
    raw_c: Counter = Counter()
    for r in docs:
        buckets = [
            _md5_mod("dsir", t, DSIR_BUCKETS) for t in r["text"].split(" ")
        ]
        (tgt_c if r["lang"] == "en" else raw_c).update(buckets)

    got = {
        r["doc_id"]: r
        for r in QUERIES["dsir_importance_weights"](spark, sf_dir).collect()
    }
    scored = [r for r in docs if r["lang"] != "en"]
    assert set(got) == {r["doc_id"] for r in scored}
    for r in scored:
        buckets = [
            _md5_mod("dsir", t, DSIR_BUCKETS) for t in r["text"].split(" ")
        ]
        total = sum(
            (DSIR_SCALE * (tgt_c[b] + 1)) // (raw_c[b] + 1) for b in buckets
        )
        row = got[r["doc_id"]]
        assert row["n_toks"] == len(buckets)
        assert row["sum_ratio_micro"] == total
        assert row["avg_ratio_micro"] == total // len(buckets)


def test_dsir_models_are_broadcast(spark, sf_dir):
    """The two 1024-row count models must broadcast — the corpus side
    of the scoring join must never shuffle (the 100 TB contract from
    the docstring)."""
    plan = (
        QUERIES["dsir_importance_weights"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_quality_classifier_matches_python_model(spark, sf_dir):
    """Replay the frozen hashed linear classifier in plain Python —
    including the shifted integer mean (negative sums must not hit the
    DIV/floor divergence)."""
    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    )
    got = {
        r["doc_id"]: r
        for r in QUERIES["quality_classifier_scores"](spark, sf_dir).collect()
    }
    assert set(got) == {r["doc_id"] for r in docs}
    for r in docs:
        toks = r["text"].split(" ")
        wts = [
            _md5_mod("qw", str(_md5_mod("qf", t, QF_BUCKETS)), 2 * QF_WEIGHT_SPAN + 1)
            - QF_WEIGHT_SPAN
            for t in toks
        ]
        s = sum(wts)
        row = got[r["doc_id"]]
        assert row["n_toks"] == len(toks)
        assert row["score_sum_micro"] == s
        assert (
            row["score_avg_micro"]
            == (s + QF_WEIGHT_SPAN * len(toks)) // len(toks) - QF_WEIGHT_SPAN
        )
        assert row["keep_flag"] == (1 if s >= 0 else 0)


def test_quality_classifier_is_join_free(spark, sf_dir):
    """The weight lookup is a pure function of the token, so the plan
    must contain NO join of any kind — scan, project, one aggregate."""
    plan = (
        QUERIES["quality_classifier_scores"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


def test_duplicate_spans_planted_corpus(spark, tmp_path_factory):
    """Plant known duplicated spans in a synthetic corpus and check the
    reported span lengths exactly — including maximality (a span of S
    must not be reported when S+1 consecutive tokens are shared) and
    the multi-span case (two separate islands on different diagonals).
    """
    tok = lambda i: f"w{i}"  # noqa: E731
    shared = [tok(100 + i) for i in range(12)]  # a 12-token span
    shared2 = [tok(200 + i) for i in range(9)]  # a 9-token span
    uniq = lambda base, n: [tok(base + i) for i in range(n)]  # noqa: E731
    docs = [
        # pair (0, 1): one 12-token duplicated span
        (0, uniq(1000, 10) + shared + uniq(2000, 10)),
        (1, uniq(3000, 5) + shared + uniq(4000, 15)),
        # pair (2, 3): two islands — a 12-span and a separate 9-span
        (2, shared + uniq(5000, 9) + shared2),
        (3, shared2 + uniq(6000, 9) + shared),
        # 4: no 8-gram overlap with anything
        (4, uniq(7000, 30)),
    ]
    sf = tmp_path_factory.mktemp("spans")
    spark.createDataFrame(
        [(i, "en", "test", 0, " ".join(ts)) for i, ts in docs],
        "doc_id long, lang string, source string, n_chars long, text string",
    ).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in QUERIES["duplicate_span_runs"](spark, str(sf)).collect()
    }
    # shared appears in docs 0,1,2,3 → pairs among them share the 12-span
    for pair in [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]:
        assert rows[pair]["max_span_tokens"] == 12, pair
    # pair (2,3) shares BOTH spans: max 12, and two distinct islands
    assert rows[(2, 3)]["max_span_tokens"] == 12
    assert rows[(2, 3)]["n_spans"] == 2
    # doc 4 appears in no pair
    assert not any(4 in p for p in rows)
    # 9 tokens ≥ GRAM + MIN_RUN − 1, so shared2-only pairs would report 9;
    # no pair reports above its true longest overlap
    assert all(r["max_span_tokens"] <= 12 for r in rows.values())


def test_duplicate_spans_verified_against_text(spark, sf_dir):
    """For every reported pair on the real corpus, the claimed max span
    must literally exist: some window of that many tokens from doc_a
    occurs token-aligned in doc_b, and no window one token longer does
    (maximality) — an independent substring check that never looks at
    grams, diagonals, or runs."""
    texts = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    }
    rows = QUERIES["duplicate_span_runs"](spark, sf_dir).collect()
    assert rows, "real corpus must contain duplicated spans"

    def has_shared_window(a: str, b: str, width: int) -> bool:
        ta, padded_b = a.split(" "), f" {b} "
        return any(
            f" {' '.join(ta[i:i + width])} " in padded_b
            for i in range(len(ta) - width + 1)
        )

    for r in rows[:50]:
        a, b, s = texts[r["doc_a"]], texts[r["doc_b"]], r["max_span_tokens"]
        assert s >= SPAN_GRAM + SPAN_MIN_RUN - 1
        assert has_shared_window(a, b, s), (r["doc_a"], r["doc_b"])
        assert not has_shared_window(a, b, s + 1), (r["doc_a"], r["doc_b"])


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_HYP = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=8, max_size=24),
        min_size=2,
        max_size=5,
    )
)
@settings(**_HYP)
def test_duplicate_spans_match_dp_model(spark, tmp_path_factory, docs):
    """Randomized check against a quadratic DP model: mark every
    position pair (i, j) where an 8-gram of doc_a matches one of
    doc_b, take maximal diagonal runs, keep runs >= SPAN_MIN_RUN —
    plain double loops, no joins, no windows. The 3-letter alphabet
    makes shared grams (and tricky overlapping/adjacent islands)
    common."""
    sf = tmp_path_factory.mktemp("span_dp")
    spark.createDataFrame(
        [(i, "en", "t", 0, " ".join(ts)) for i, ts in enumerate(docs)],
        "doc_id long, lang string, source string, n_chars long, text string",
    ).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    def model(a: list[str], b: list[str]) -> tuple[int, int] | None:
        match = {
            (i, j)
            for i in range(len(a) - SPAN_GRAM + 1)
            for j in range(len(b) - SPAN_GRAM + 1)
            if a[i : i + SPAN_GRAM] == b[j : j + SPAN_GRAM]
        }
        runs = []
        for i, j in match:
            if (i - 1, j - 1) in match:
                continue  # not a run start
            r = 0
            while (i + r, j + r) in match:
                r += 1
            runs.append(r)
        spans = [r + SPAN_GRAM - 1 for r in runs if r >= SPAN_MIN_RUN]
        return (max(spans), len(spans)) if spans else None

    expected = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            m = model(docs[i], docs[j])
            if m:
                expected[(i, j)] = m

    got = {
        (r["doc_a"], r["doc_b"]): (r["max_span_tokens"], r["n_spans"])
        for r in QUERIES["duplicate_span_runs"](spark, str(sf)).collect()
    }
    assert got == expected


def test_dsir_resampling_draw_matches_python_model(spark, sf_dir):
    """Replay the resampling draw in plain Python: per-doc weight from
    the shared scoring model, global max, md5-bucket acceptance in
    cross-multiplied integers — per-lang manifest must match exactly,
    and the draw must actually discriminate (some kept, some dropped)."""
    from fintech_lakehouse_spark.plans.selection import _dsir_scored

    w = {
        (r["doc_id"], r["lang"]): (r["n_toks"], r["avg_ratio_micro"])
        for r in _dsir_scored(spark, sf_dir).collect()
    }
    wmax = max(avg for _, avg in w.values())
    expected: dict[str, list[int]] = {}
    for (doc_id, lang), (n_toks, avg) in w.items():
        u = _md5_mod("dsirdraw", str(doc_id), 10_000)
        kept = 1 if u * wmax < avg * 10_000 else 0
        agg = expected.setdefault(lang, [0, 0, 0])
        agg[0] += 1
        agg[1] += kept
        agg[2] += n_toks if kept else 0

    got = {
        r["lang"]: [r["n_candidates"], r["n_kept"], r["kept_tokens"]]
        for r in QUERIES["dsir_resampled_corpus"](spark, sf_dir).collect()
    }
    assert got == expected
    total_c = sum(v[0] for v in got.values())
    total_k = sum(v[1] for v in got.values())
    assert 0 < total_k < total_c  # a draw, not a pass-through


def test_hard_negative_pairs_match_numpy_model(spark, sf_dir):
    """Replay triplet mining in numpy: exact cosine argmax/argmin with
    the same id tie-break, per anchor — ids AND rounded cosines must
    match."""
    import numpy as np

    from fintech_lakehouse_spark.plans.selection import N_ANCHORS

    rows = load_table(spark, sf_dir, "embeddings").collect()
    ids = np.array([r["vec_id"] for r in rows])
    labels = np.array([r["label"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))

    got = {
        r["anchor_id"]: r
        for r in QUERIES["hard_negative_pairs"](spark, sf_dir).collect()
    }
    order = np.argsort(ids, kind="stable")
    for a in np.where(ids < N_ANCHORS)[0]:
        cos = mat @ mat[a] / (norms * norms[a])
        neg_i = min(
            (i for i in order if labels[i] != labels[a]),
            key=lambda i: (-cos[i], ids[i]),
        )
        pos_i = min(
            (i for i in order if labels[i] == labels[a] and ids[i] != ids[a]),
            key=lambda i: (cos[i], ids[i]),
        )
        r = got[int(ids[a])]
        assert r["hard_neg_id"] == ids[neg_i]
        assert r["hard_pos_id"] == ids[pos_i]
        assert r["neg_cosine"] == round(cos[neg_i], 4)
        assert r["pos_cosine"] == round(cos[pos_i], 4)
        assert r["margin"] == round(cos[pos_i] - cos[neg_i], 4)


def test_hard_negative_anchors_broadcast(spark, sf_dir):
    """The anchor batch must broadcast; the corpus must not sort-merge
    against it."""
    plan = (
        QUERIES["hard_negative_pairs"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["en", "fr", "zh"]),
            st.lists(
                st.sampled_from(["a", "b", "cc", ""]), min_size=0, max_size=6
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_HYP)
def test_dsir_and_classifier_random_corpora(spark, tmp_path_factory, docs):
    """Degenerate-corpus property: random tiny corpora including
    all-target (raw pool empty → zero output rows), no-target (every
    bucket Laplace-only), and empty-string documents (split(' ') of ''
    is [''] — one empty token, which must count on both engines and in
    the model). Replays both scoring queries in plain Python."""
    sf = tmp_path_factory.mktemp("dsel")
    spark.createDataFrame(
        [
            (i, lang, "t", 0, " ".join(toks))
            for i, (lang, toks) in enumerate(docs)
        ],
        "doc_id long, lang string, source string, n_chars long, text string",
    ).write.mode("overwrite").parquet(str(sf / "documents.parquet"))

    # note: " ".join then split(" ") — an empty token list becomes one
    # empty-string token, exactly what both engines see
    texts = {i: " ".join(toks).split(" ") for i, (_, toks) in enumerate(docs)}
    langs = {i: lang for i, (lang, _) in enumerate(docs)}

    tgt_c: Counter = Counter()
    raw_c: Counter = Counter()
    for i, toks in texts.items():
        bs = [_md5_mod("dsir", t, DSIR_BUCKETS) for t in toks]
        (tgt_c if langs[i] == "en" else raw_c).update(bs)

    got = {
        r["doc_id"]: r
        for r in QUERIES["dsir_importance_weights"](spark, str(sf)).collect()
    }
    raw_ids = [i for i in texts if langs[i] != "en"]
    assert set(got) == set(raw_ids)
    for i in raw_ids:
        bs = [_md5_mod("dsir", t, DSIR_BUCKETS) for t in texts[i]]
        total = sum(
            (DSIR_SCALE * (tgt_c[b] + 1)) // (raw_c[b] + 1) for b in bs
        )
        assert got[i]["sum_ratio_micro"] == total
        assert got[i]["avg_ratio_micro"] == total // len(bs)

    qgot = {
        r["doc_id"]: r
        for r in QUERIES["quality_classifier_scores"](spark, str(sf)).collect()
    }
    assert set(qgot) == set(texts)
    for i, toks in texts.items():
        s_ = sum(
            _md5_mod(
                "qw", str(_md5_mod("qf", t, QF_BUCKETS)), 2 * QF_WEIGHT_SPAN + 1
            )
            - QF_WEIGHT_SPAN
            for t in toks
        )
        assert qgot[i]["score_sum_micro"] == s_
        assert (
            qgot[i]["score_avg_micro"]
            == (s_ + QF_WEIGHT_SPAN * len(toks)) // len(toks) - QF_WEIGHT_SPAN
        )
