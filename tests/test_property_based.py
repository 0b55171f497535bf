"""Property-based tests (hypothesis) — randomized inputs against
independent Python models. The reference has none (SURVEY §5.5);
these pin the operators whose edge cases hand-written fixtures miss:
dedup tie-breaking, as-of boundary behavior, decimal-sum exactness.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators import asof_join, deduplicate_by_key

SETTINGS = dict(
    max_examples=12,  # each example spins Spark jobs — keep bounded
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(0, 5),  # key
            st.integers(0, 10),  # version (ties allowed)
            st.integers(0, 3),  # tiebreak id
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_dedup_matches_python_model(spark, rows):
    df = spark.createDataFrame(
        [(k, v, t) for k, v, t in rows], ["k", "v", "t"]
    )
    got = {
        (r["k"], r["v"], r["t"])
        for r in deduplicate_by_key(
            df, ["k"], "v", order_ascending=False, tie_breakers=["t"]
        ).collect()
    }
    # model: per key keep max version; among ties the min tiebreak
    expected = set()
    for key in {k for k, _, _ in rows}:
        group = [(v, t) for k, v, t in rows if k == key]
        vmax = max(v for v, _ in group)
        tmin = min(t for v, t in group if v == vmax)
        expected.add((key, vmax, tmin))
    assert got == expected


@given(
    lefts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)),
                   min_size=1, max_size=15),
    rights=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                              st.integers(0, 99)),
                    min_size=0, max_size=15),
)
@settings(**SETTINGS)
def test_asof_join_matches_python_model(spark, lefts, rights):
    left = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(lefts)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame(
        [(k, ts, v) for k, ts, v in rights], ["k", "ts", "v"]
    ) if rights else spark.createDataFrame([], "k int, ts int, v int")
    got = {
        r["lid"]: r["v_asof"]
        for r in asof_join(
            left, right, on=["k"], left_time="ts", right_time="ts"
        ).collect()
    }
    # model: latest right at ts' <= ts for same key; ties on (k, ts')
    # reduce to max(v) (asof_join's documented dedup rule)
    expected = {}
    for i, (k, ts) in enumerate(lefts):
        candidates = [(rts, v) for rk, rts, v in rights if rk == k and rts <= ts]
        if not candidates:
            expected[i] = None
        else:
            best_ts = max(rts for rts, _ in candidates)
            expected[i] = max(v for rts, v in candidates if rts == best_ts)
    assert got == expected
    assert len(got) == len(lefts)  # left join preserves every left row


@given(
    cents=st.lists(st.integers(0, 10_000_000), min_size=1, max_size=50)
)
@settings(**SETTINGS)
def test_decimal_sum_exact(spark, cents):
    """The _num.py premise: decimal sums equal exact integer math
    regardless of partitioning/order."""
    df = spark.createDataFrame(
        [(c / 100,) for c in cents], ["x"]
    ).repartition(4)
    got = df.agg(
        F.sum(F.col("x").cast("decimal(12,2)")).alias("s")
    ).collect()[0]["s"]
    assert got == Decimal(sum(cents)) / 100


@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.floats(-1000, 1000, allow_nan=False)),
            st.sampled_from(["USD", "EUR", "XXX", None]),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_one_pass_dq_matches_per_check_model(spark, rows):
    """One-pass conditional aggregation must equal the reference's
    per-check filter counts for every rule family on randomized data
    (nulls, out-of-range, bad enums)."""
    from fintech_lakehouse_spark.quality import DataQualityChecker

    df = spark.createDataFrame(rows, "amount double, currency string")
    report = (
        DataQualityChecker(df, "t")
        .check_completeness(["amount"], threshold=1.0)
        .check_range("amount", 0, 500)
        .check_values_in_set("currency", ["USD", "EUR"])
        .run()
    )
    got = {r.check_name: r.failed_records for r in report.results}
    amounts = [a for a, _ in rows]
    currencies = [c for _, c in rows]
    expected = {
        "completeness_amount": sum(a is None for a in amounts),
        "range_amount": sum(
            a is not None and (a < 0 or a > 500) for a in amounts
        ),
        "values_in_set_currency": sum(
            c is not None and c not in ("USD", "EUR") for c in currencies
        ),
    }
    assert got == expected
    assert report.results[0].total_records == len(rows)


@given(
    texts=st.lists(
        st.text(
            alphabet="ab cd",  # tiny alphabet → frequent shingle overlap
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_portable_minhash_matches_python_model(spark, texts):
    """The portable chunked-md5 MinHash against an exact Python
    reimplementation: same md5 chunk values, same per-doc minima —
    the property that makes the DuckDB oracles trustworthy."""
    import hashlib

    from fintech_lakehouse_spark.functions.text import (
        minhash_signatures_md5,
        shingle_rows,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sig = minhash_signatures_md5(shingle_rows(docs, n=2), n_hashes=8)
    got = {
        r["doc_id"]: tuple(r[f"mh{k}"] for k in range(8)) for r in sig.collect()
    }
    expected = {}
    for i, t in enumerate(texts):
        toks = t.split(" ")
        if len(toks) < 2:
            continue
        shingles = [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        mins = []
        for k in range(8):
            hexes = [
                hashlib.md5(f"{k // 4}|{s}".encode()).hexdigest()[
                    8 * (k % 4) : 8 * (k % 4) + 8
                ]
                for s in shingles
            ]
            mins.append(min(hexes))
        expected[i] = tuple(mins)
    assert got == expected


@given(
    n=st.integers(50, 300),
    rate_pct=st.integers(1, 99),
    salt=st.sampled_from(["a", "b", "sample"]),
)
@settings(**SETTINGS)
def test_hash_sampling_properties(spark, n, rate_pct, salt):
    """Sampling invariants for arbitrary rates/salts: membership is a
    pure function of (key, salt); samples are NESTED across rates
    (rate r1 < r2 ⇒ sample(r1) ⊆ sample(r2)); realized rate tracks the
    nominal rate."""
    from fintech_lakehouse_spark.functions.sampling import deterministic_sample

    df = spark.range(n).withColumnRenamed("id", "k")
    rate = rate_pct / 100
    s = {r["k"] for r in deterministic_sample(df, rate, "k", salt).collect()}
    s2 = {r["k"] for r in deterministic_sample(df, rate, "k", salt).collect()}
    assert s == s2
    bigger = {
        r["k"]
        for r in deterministic_sample(df, min(1.0, rate + 0.3), "k", salt).collect()
    }
    assert s <= bigger
    # loose bound: binomial 4-sigma
    import math

    sigma = math.sqrt(n * rate * (1 - rate))
    assert abs(len(s) - n * rate) <= 4 * sigma + 1


@given(
    initial=st.dictionaries(
        st.integers(0, 5),
        st.tuples(st.integers(0, 3) | st.none(), st.sampled_from(["a", "b", None])),
        max_size=6,
    ),
    ops=st.lists(
        st.one_of(
            st.tuples(
                st.just("upsert"),
                st.integers(0, 5),
                st.integers(0, 3) | st.none(),
                st.sampled_from(["a", "b", None]),
            ),
            st.tuples(st.just("delete"), st.integers(0, 5)),
        ),
        min_size=1,
        max_size=10,
    ),
)
@settings(**SETTINGS)
def test_snapshot_diff_replay_recovers_state(spark, initial, ops):
    """CDF-consumer guarantee (VERDICT r4 item 8): applying the
    snapshot_diff changelog (insert/update ⇒ set NEW values, delete ⇒
    drop key) to the OLD state reconstructs the NEW state exactly —
    for random op sequences of upserts (incl. restates to NULL and
    no-op restates) and deletes, with null-bearing compare columns.
    Also pins changelog minimality: unchanged keys emit no row."""
    from fintech_lakehouse_spark.sources.writers import snapshot_diff

    schema = "k int, v int, w string"

    old_model = dict(initial)
    new_model = dict(initial)
    for op in ops:
        if op[0] == "upsert":
            new_model[op[1]] = (op[2], op[3])
        else:
            new_model.pop(op[1], None)

    def to_df(model):
        return spark.createDataFrame(
            [(k, v, w) for k, (v, w) in model.items()], schema
        )

    changelog = snapshot_diff(to_df(old_model), to_df(new_model), keys=["k"])
    rows = changelog.collect()

    # replay onto the old state
    replayed = dict(old_model)
    for r in rows:
        if r["_change_type"] == "delete":
            assert r["k"] in replayed, "delete for a key absent from old"
            del replayed[r["k"]]
        else:
            replayed[r["k"]] = (r["v"], r["w"])
    assert replayed == new_model

    # change types are exact and the changelog is change-cardinality
    # sized: one row per changed key, none for unchanged keys
    expected_types = {}
    for k in set(old_model) | set(new_model):
        if k not in old_model:
            expected_types[k] = "insert"
        elif k not in new_model:
            expected_types[k] = "delete"
        elif old_model[k] != new_model[k]:
            expected_types[k] = "update"
    assert {r["k"]: r["_change_type"] for r in rows} == expected_types
    assert len(rows) == len(expected_types)


@given(
    batches=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 3),      # key
                st.sampled_from(["a", "b", "c"]),  # tracked attr
                st.integers(1, 40),     # effective ts (day number)
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_upsert_matches_python_model(spark, batches, tmp_path_factory):
    """SCD2 lifecycle against an independent Python model for random
    batch sequences: latest-per-key-per-batch wins (intra-batch
    collapse), a change strictly newer than the current row closes it
    and opens a new one, out-of-order/duplicate updates are no-ops,
    history rows never mutate, and exactly one current row per key."""
    import datetime as dt

    from fintech_lakehouse_spark.sources.writers import scd2_upsert

    path = str(tmp_path_factory.mktemp("scd2_prop") / "dim")

    base = dt.datetime(2024, 1, 1)

    def ts(day):
        return base + dt.timedelta(days=day)

    def day_of(t):
        return (t - base).days

    # python model: key -> list of [attr, from_day, to_day|None]
    model: dict[int, list[list]] = {}
    for batch in batches:
        latest = {}
        for k, attr, day in batch:
            # row_number ties broken arbitrarily in Spark when two
            # batch rows share (key, ts) — make the input unambiguous
            # by keeping the LAST write per (key, ts) out of the test
            if k in latest and latest[k][1] == day:
                continue
            if k not in latest or day > latest[k][1]:
                latest[k] = (attr, day)
        rows = [(f"k{k}", attr, ts(day)) for k, (attr, day) in latest.items()]
        df = spark.createDataFrame(
            rows, "id string, tier string, effective_ts timestamp"
        )
        scd2_upsert(spark, df, path, key="id", tracked_cols=["tier"])
        for k, (attr, day) in latest.items():
            hist = model.setdefault(k, [])
            if not hist:
                hist.append([attr, day, None])
                continue
            cur = hist[-1]
            if cur[0] != attr and day > cur[1]:
                cur[2] = day
                hist.append([attr, day, None])
            # unchanged attrs or stale ts: no-op

    got = sorted(
        (
            r["id"],
            r["tier"],
            day_of(r["effective_from"]),
            day_of(r["effective_to"]) if r["effective_to"] else None,
            r["is_current"],
        )
        for r in spark.read.parquet(path).collect()
    )
    expected = sorted(
        (f"k{k}", attr, frm, to, to is None)
        for k, hist in model.items()
        for attr, frm, to in hist
    )
    assert got == expected
    # exactly one current row per key
    cur_keys = [g[0] for g in got if g[4]]
    assert sorted(cur_keys) == sorted(set(cur_keys))


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd", "e"]),
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_repetition_scores_match_counter_model(spark, tmp_path_factory, docs):
    """doc_repetition_scores' zero-shuffle sort+longest-run folds must
    equal the obvious Counter model for ANY token stream — including
    the edge cases a fold gets wrong: single-token docs (no bigrams),
    all-identical docs, max-run at the array end (the fold must fold
    the final run into 'best'), and ties."""
    from collections import Counter

    from fintech_lakehouse_spark.plans import QUERIES

    sf_dir = tmp_path_factory.mktemp("rep")
    spark.createDataFrame(
        [(i, "en", "test", 0, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, lang string, source string, n_chars long, text string",
    ).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))

    got = {
        r["doc_id"]: r
        for r in QUERIES["doc_repetition_scores"](spark, str(sf_dir)).collect()
    }
    assert set(got) == set(range(len(docs)))
    for i, toks in enumerate(docs):
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        adj = sum(1 for a, b in zip(toks, toks[1:]) if a == b)
        r = got[i]
        assert r["n_tokens"] == len(toks)
        assert r["top_token_count"] == max(Counter(toks).values())
        assert r["top_bigram_count"] == (
            max(Counter(grams).values()) if grams else 0
        )
        assert r["n_adjacent_repeats"] == adj


@given(
    texts=st.lists(
        st.text(alphabet="ab cd", min_size=0, max_size=60),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_chunk_block_hashes_match_python_model(spark, texts):
    """chunk_block_hashes against an exact Python reimplementation:
    non-overlapping 10-token blocks, remainder block kept, md5 of the
    space-rejoined block text — the derivation chunk_dedup_fractions
    and its DuckDB oracle both rest on (including the clamped final
    slice and the single-token/empty-text edges)."""
    import hashlib

    from fintech_lakehouse_spark.plans.text import (
        CHUNK_DEDUP_BLOCK,
        chunk_block_hashes,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = sorted(
        (r["doc_id"], r["block_hash"])
        for r in chunk_block_hashes(docs).collect()
    )
    expected = []
    for i, t in enumerate(texts):
        toks = t.split(" ")  # split('') == [''] — one 1-token block
        for j in range(0, len(toks), CHUNK_DEDUP_BLOCK):
            block = " ".join(toks[j : j + CHUNK_DEDUP_BLOCK])
            expected.append((i, hashlib.md5(block.encode()).hexdigest()))
    assert got == sorted(expected)


@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=0,
            max_size=12,
        ).map(" ".join),
        min_size=2,
        max_size=24,
    ),
    m_bits=st.sampled_from([64, 256, 4096]),
)
@settings(**SETTINGS)
def test_bloom_one_sided_property(spark, texts, m_bits):
    """The Bloom membership contract on arbitrary corpora and filter
    sizes, including DELIBERATELY undersized filters (m=64 bits forces
    heavy false positives): every built value passes membership (no
    false negative, ever), and every membership miss is a true
    non-member. False positives are unconstrained — that is the
    one-sidedness being pinned."""
    from fintech_lakehouse_spark.functions.sketches import (
        bloom_build_md5,
        bloom_filter_members,
    )

    half = max(1, len(texts) // 2)
    build_vals = set(texts[:half])
    probe_vals = texts
    build = spark.createDataFrame([(v,) for v in build_vals], ["gram"])
    probe = spark.createDataFrame(
        [(i, v) for i, v in enumerate(probe_vals)], ["i", "gram"]
    )
    bloom = bloom_build_md5(build, "gram", k=4, m_bits=m_bits)
    survivors = {
        r["i"] for r in bloom_filter_members(probe, bloom, "gram", 4, m_bits).collect()
    }
    for i, v in enumerate(probe_vals):
        if v in build_vals:
            assert i in survivors, f"false negative on {v!r}"
        if i not in survivors:
            assert v not in build_vals


@given(
    obs=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),       # key
            st.integers(0, 20),                 # day offset
            st.integers(1, 500),                # metric value
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_gapfill_locf_matches_python_model(spark, obs):
    """Calendar densify + LOCF on arbitrary sparse series: for every
    key and every calendar day, zero-filled counts and the
    carried-forward last observation must match a plain-Python replay
    (daily_volume_gapfill's shape, minus the parquet tables)."""
    import datetime as dt

    from pyspark.sql.window import Window

    base = dt.date(2024, 1, 1)
    rows = [(k, base + dt.timedelta(days=d), v) for k, d, v in obs]
    df = spark.createDataFrame(rows, "k string, day date, v long")
    daily = df.groupBy("k", "day").agg(
        F.count(F.lit(1)).alias("n"), F.max("v").alias("day_max")
    )
    bounds = df.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    calendar = bounds.select(
        F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day")
    )
    grid = df.select("k").distinct().crossJoin(F.broadcast(calendar))
    w = (
        Window.partitionBy("k")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        (r["k"], r["day"]): (r["n"], r["locf"])
        for r in grid.join(daily, ["k", "day"], "left")
        .select(
            "k",
            "day",
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
            F.last("day_max", ignorenulls=True).over(w).alias("locf"),
        )
        .collect()
    }

    days = sorted({d for _, d, _ in rows})
    lo, hi = days[0], days[-1]
    keys = {k for k, _, _ in obs}
    per_day: dict = {}
    for k, d, v in obs:
        day = base + dt.timedelta(days=d)
        cnt, mx = per_day.get((k, day), (0, None))
        per_day[(k, day)] = (cnt + 1, v if mx is None else max(mx, v))
    expected = {}
    for k in keys:
        carry = None
        d = lo
        while d <= hi:
            cnt, mx = per_day.get((k, d), (0, None))
            if mx is not None:
                carry = mx
            expected[(k, d)] = (cnt, carry)
            d += dt.timedelta(days=1)
    assert got == expected


@given(
    st.binary(max_size=512),
)
@settings(max_examples=300, deadline=None)
def test_media_header_parsers_never_crash(payload):
    """The stdlib header parsers (JPEG marker walk, MP4 box walk, MP3
    frame walk, BMP/netpbm/PNG headers) must QUARANTINE arbitrary
    bytes — return None or a valid tuple, never raise. This is the
    per-row contract that keeps one corrupt file from killing a
    100 TB ingest stage."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_bmp_header,
        read_jpeg_header,
        read_mp3_header,
        read_mp4_header,
        read_netpbm_header,
        read_png_header,
    )

    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp4_frame_bytes,
        read_mp4_frame_table,
        read_mp4_sample_locations,
        read_mp4_sample_table,
    )

    for parser in (
        read_jpeg_header,
        read_mp4_header,
        read_mp3_header,
        read_bmp_header,
        read_netpbm_header,
        read_png_header,
        read_mp4_sample_table,
        read_mp4_frame_table,
        read_mp4_sample_locations,
    ):
        out = parser(payload)
        assert out is None or isinstance(out, tuple)
    got = read_mp4_frame_bytes(payload, [0])
    assert got is None or isinstance(got, list)


@given(
    w=st.integers(min_value=1, max_value=64),
    h=st.integers(min_value=1, max_value=64),
    prefix=st.binary(max_size=32),
)
@settings(max_examples=100, deadline=None)
def test_jpeg_mp4_roundtrip_survives_prefix_mutation(w, h, prefix):
    """Synthesized headers round-trip for any dims; prepending junk to
    an MP4 breaks the box walk cleanly to None (boxes must start at
    offset 0), never to a wrong answer."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_jpeg_header,
        read_mp4_header,
        synthesize_jpeg_header,
        synthesize_mp4_header,
    )

    assert read_jpeg_header(synthesize_jpeg_header(w, h)) == (w, h)
    mp4 = synthesize_mp4_header(w, w, h)
    assert read_mp4_header(mp4) == (w, w, h)
    mutated = read_mp4_header(prefix + mp4)
    assert mutated is None or mutated == (w, w, h)


@given(
    evolution=st.lists(
        st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=12),
        min_size=2,
        max_size=4,
    ),
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_extend_dense_surrogate_key_stability_model(spark, evolution):
    """Model check for the stable-key contract over random snapshot
    evolutions: (a) once a natural key has a surrogate key it NEVER
    changes, (b) keys are always unique, (c) retired keys survive,
    (d) new keys extend past the running max."""
    from fintech_lakehouse_spark.operators.keys import (
        add_dense_surrogate_key,
        extend_dense_surrogate_key,
    )

    assigned: dict[int, int] = {}
    existing = None
    for snapshot_keys in evolution:
        snapshot = spark.createDataFrame(
            [(k, f"attr{k}") for k in sorted(snapshot_keys)],
            "nk long, attr string",
        )
        if existing is None:
            refreshed = add_dense_surrogate_key(snapshot, "sk", ["nk"])
        else:
            refreshed = extend_dense_surrogate_key(
                existing, snapshot, "sk", ["nk"]
            )
        rows = {r["nk"]: r["sk"] for r in refreshed.collect()}
        # (b) unique
        assert len(set(rows.values())) == len(rows)
        for nk, sk in rows.items():
            if nk in assigned:
                # (a) stability
                assert sk == assigned[nk], (nk, sk, assigned[nk])
            else:
                # (d) new keys never reuse an existing sk
                assert sk not in set(assigned.values())
                assigned[nk] = sk
        # (c) every previously-seen key is still present (retired kept)
        assert set(assigned) <= set(rows)
        existing = refreshed


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    gray=st.booleans(),
    rst=st.sampled_from([0, 1, 3]),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_roundtrip_property(h, w, gray, rst, seed):
    """Hypothesis sweep of the baseline JPEG codec (functions/jpeg.py):
    ANY uint8 raster — arbitrary non-8-multiple dims, gray or RGB,
    with or without restart markers — must decode back within the
    flat-quant tolerance (gray ≤1, RGB ≤2 per pixel) at the exact
    original shape. Catches the MCU edge-padding / predictor-reset /
    bit-alignment corner cases a fixed fixture can miss."""
    import numpy as np

    from fintech_lakehouse_spark.functions.jpeg import (
        decode_jpeg_pixels,
        encode_jpeg,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.integers(0, 256, shape, dtype=np.uint8)
    dec = decode_jpeg_pixels(encode_jpeg(img, restart_interval=rst))
    assert dec is not None and dec.shape == img.shape
    err = int(np.max(np.abs(dec.astype(np.int64) - img.astype(np.int64))))
    assert err <= (1 if gray else 2)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    data=st.lists(
        st.integers(0, 30), min_size=1, max_size=400
    ),
    m=st.integers(2, 16),
    n_chunks=st.integers(1, 4),
)
def test_misra_gries_merge_property(data, m, n_chunks):
    """Hypothesis model of the mergeable MG summary (pure-Python
    replica of the mapInPandas fold in functions/sketches.py): for ANY
    stream, ANY m, and ANY chunking into partitions, the merged
    counters satisfy f(t) − N/m ≤ C(t) ≤ f(t) and every item with
    f(t) > N/m is present — the two guarantees mg_heavy_hitters emits
    as flags."""
    from collections import Counter

    def mg_fold(items, m):
        counters = {}
        for batch in [items]:
            for item, cnt in Counter(batch).items():
                counters[item] = counters.get(item, 0) + cnt
            if len(counters) > m:
                sub = sorted(counters.values(), reverse=True)[m]
                counters = {k: v - sub for k, v in counters.items() if v > sub}
        return counters

    chunk = max(1, len(data) // n_chunks)
    parts = [data[i : i + chunk] for i in range(0, len(data), chunk)]
    merged = Counter()
    for p in parts:
        for k, v in mg_fold(p, m).items():
            merged[k] += v
    exact = Counter(data)
    bound = len(data) / m
    for item, f in exact.items():
        if f > bound:
            assert item in merged
    for item, c in merged.items():
        assert c <= exact[item]
        assert exact[item] - c <= bound


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 50)),  # (key, t)
        min_size=1,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(
            st.integers(0, 3),  # key
            st.integers(0, 50),  # t (ties allowed)
            st.integers(0, 99),  # payload
        ),
        max_size=12,
    ),
)
@settings(**SETTINGS)
def test_nearest_join_matches_python_model(spark, left, right):
    """nearest_join vs an independent model: for every left row, the
    right row (same key) minimizing |Δt|, ties prefer the EARLIER
    right time; right rows tied on (key, t) reduce to max(payload)
    first; keys with no right rows yield NULLs."""
    from fintech_lakehouse_spark.operators import nearest_join

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k int, t long, lid int",
    )
    rdf = spark.createDataFrame(right, "k int, t long, payload int")

    # model: dedup tied rights by max payload, then nearest by
    # (abs delta, earlier time)
    dedup = {}
    for k, t, p in right:
        dedup[(k, t)] = max(dedup.get((k, t), -1), p)
    by_key = {}
    for (k, t), p in dedup.items():
        by_key.setdefault(k, []).append((t, p))
    expected = {}
    for i, (k, t) in enumerate(left):
        cands = by_key.get(k, [])
        if not cands:
            expected[i] = (None, None)
        else:
            rt, p = min(cands, key=lambda c: (abs(c[0] - t), c[0]))
            expected[i] = (rt, p)

    got = {
        r["lid"]: (r["t_nearest"], r["payload_nearest"])
        for r in nearest_join(
            ldf, rdf, on=["k"], left_time="t", right_time="t"
        ).collect()
    }
    assert got == expected


# ------------------------------------------------------------- r10:
# pure-Python codec layer (no Spark jobs — full hypothesis budgets).


@given(
    values=st.lists(
        st.integers(0, (1 << 40) - 1), min_size=0, max_size=400
    )
)
@settings(max_examples=200, deadline=None)
def test_roaring_bitmap_array_roundtrip_property(values):
    """encode ∘ decode = sorted ∘ set over arbitrary 64-bit row-index
    sets (spanning multiple 16-bit chunks and high-32 keys)."""
    from fintech_lakehouse_spark.sources.deletionvectors import (
        decode_roaring_bitmap_array,
        encode_roaring_bitmap_array,
    )

    assert decode_roaring_bitmap_array(
        encode_roaring_bitmap_array(values)
    ) == sorted(set(values))


@given(delta=st.integers(-2, 2), stride=st.sampled_from([1, 3, 7]))
@settings(max_examples=20, deadline=None)
def test_roaring_bitmap_container_boundary_property(delta, stride):
    """Cardinalities straddling the array/bitmap container switch
    (4096 per 16-bit chunk) round-trip exactly, at several strides."""
    from fintech_lakehouse_spark.sources.deletionvectors import (
        decode_roaring_bitmap_array,
        encode_roaring_bitmap_array,
    )

    card = 4096 + delta
    vals = list(range(0, card * stride, stride))
    assert decode_roaring_bitmap_array(
        encode_roaring_bitmap_array(vals)
    ) == vals


@given(data=st.binary(min_size=0, max_size=200))
@settings(max_examples=200, deadline=None)
def test_z85_roundtrip_property(data):
    """z85_decode(z85_encode(b))[:len(b)] == b for arbitrary bytes
    (the Base85Codec pads to 4-byte blocks; sizeInBytes truncates)."""
    from fintech_lakehouse_spark.sources.deletionvectors import (
        z85_decode,
        z85_encode,
    )

    enc = z85_encode(data)
    assert len(enc) % 5 == 0
    assert z85_decode(enc)[: len(data)] == data


@given(
    rows=st.lists(st.integers(0, 1 << 30), min_size=1, max_size=300),
    inline_max=st.sampled_from([0, 64, 1024]),
)
@settings(max_examples=40, deadline=None)
def test_dv_descriptor_roundtrip_property(tmp_path_factory, rows, inline_max):
    """make_dv_descriptor → decode_deletion_vector is identity for
    both the inline and on-disk file forms (inline_max=0 forces the
    packed-file path)."""
    from fintech_lakehouse_spark.sources.deletionvectors import (
        decode_deletion_vector,
        make_dv_descriptor,
    )

    root = str(tmp_path_factory.mktemp("dvprop"))
    dv = make_dv_descriptor(root, rows, inline_max_bytes=inline_max)
    assert decode_deletion_vector(root, dv) == sorted(set(rows))


@given(
    vals=st.lists(
        st.sampled_from([-1, 0, 1]), min_size=0, max_size=60
    ).filter(lambda v: len(v) % 2 == 0),
    rate_idx=st.sampled_from([0, 1, 2]),
)
@settings(max_examples=80, deadline=None)
def test_mp3_bigvalues_roundtrip_property(vals, rate_idx):
    """Huffman-coded big_values spectra round-trip for every pair
    pattern/sign combination and sample rate."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_spectrum,
        synthesize_mp3_spectrum,
    )

    rate, got = read_mp3_spectrum(synthesize_mp3_spectrum(vals, rate_idx))
    assert got == list(vals)
