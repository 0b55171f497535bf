"""Incremental view maintenance: the four-type changelog vocabulary
(sources.writers.snapshot_diff(emit_preimage=True)), the signed-delta
algebra (operators/ivm.py), and the streaming CDF producer→consumer
chain (foreach_batch_cdf(emit_preimage=True) → foreach_batch_ivm).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fintech_lakehouse_spark.operators.ivm import (
    apply_agg_delta,
    changelog_agg_delta,
)
from fintech_lakehouse_spark.sources.writers import snapshot_diff


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_snapshot_diff_preimage_vocabulary(spark):
    """emit_preimage=True must emit Delta CDF's four types: inserts
    and deletes unchanged, each update fanned out to a preimage row
    (old values) + a postimage row (new values)."""
    old = _df(
        spark,
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "k long, grp string, amount double",
    )
    new = _df(
        spark,
        [(1, "a", 10.0), (2, "b", 25.0), (4, "a", 40.0)],
        "k long, grp string, amount double",
    )
    rows = snapshot_diff(old, new, keys=["k"], emit_preimage=True).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r)
    assert {r["k"] for r in by_type["insert"]} == {4}
    assert {r["k"] for r in by_type["delete"]} == {3}
    # k=2 changed group AND amount: preimage carries the OLD values,
    # postimage the NEW; k=1 is unchanged and emits nothing.
    (pre,) = by_type["update_preimage"]
    (post,) = by_type["update_postimage"]
    assert (pre["k"], pre["grp"], pre["amount"]) == (2, "a", 20.0)
    assert (post["k"], post["grp"], post["amount"]) == (2, "b", 25.0)
    assert len(rows) == 4

    # default mode is unchanged: compact three-type form, new values
    compact = snapshot_diff(old, new, keys=["k"]).collect()
    types = {r["k"]: r["_change_type"] for r in compact}
    assert types == {4: "insert", 3: "delete", 2: "update"}


def test_ivm_delta_apply_equals_recompute(spark):
    """base + signed delta == direct recompute over the new snapshot,
    including a group-MOVING update (retract from old group, add to
    new) and a group that disappears entirely."""
    old = _df(
        spark,
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (5, "c", 5.0)],
        "k long, grp string, amount double",
    )
    new = _df(
        spark,
        [(1, "a", 11.0), (2, "b", 20.0), (3, "b", 30.0), (6, "b", 6.0)],
        "k long, grp string, amount double",
    )
    changelog = snapshot_diff(old, new, keys=["k"], emit_preimage=True)
    delta = changelog_agg_delta(changelog, ["grp"], {"total": "amount"})
    base = old.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("amount").cast("decimal(12,2)"))
        .cast("decimal(18,2)")
        .alias("total"),
    )
    maintained = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in apply_agg_delta(base, delta, ["grp"], ["total"]).collect()
    }
    recomputed = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in new.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("amount").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
        .collect()
    }
    assert maintained == recomputed
    assert "c" not in maintained  # emptied group removed, not zero-row


def test_ivm_first_batch_bootstraps_from_none(spark):
    """current=None (view doesn't exist yet): the delta alone IS the
    view — an insert-only changelog bootstraps it."""
    changelog = _df(
        spark,
        [(1, "a", 10.0, "insert"), (2, "b", 20.0, "insert")],
        "k long, grp string, amount double, _change_type string",
    )
    delta = changelog_agg_delta(changelog, ["grp"], {"total": "amount"})
    view = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in apply_agg_delta(None, delta, ["grp"], ["total"]).collect()
    }
    assert view == {"a": (1, 10.0), "b": (1, 20.0)}


def test_ivm_rejects_three_type_changelog(spark):
    """A compact changelog (plain 'update', no preimage) cannot
    maintain sums — the delta must fail loudly, not corrupt the
    view."""
    changelog = _df(
        spark,
        [(1, "a", 10.0, "update")],
        "k long, grp string, amount double, _change_type string",
    )
    delta = changelog_agg_delta(changelog, ["grp"], {"total": "amount"})
    with pytest.raises(Exception, match="unsupported _change_type"):
        delta.collect()


def test_cdf_to_ivm_materialized_view_matches_batch(spark, tmp_path):
    """End-to-end CDF chain: an upsert stream through
    foreach_batch_cdf(emit_preimage=True) produces the four-type
    changelog; a SECOND stream over the changelog directory through
    foreach_batch_ivm maintains a per-group (count, exact total) view.
    The final view must equal a direct groupBy over the final target
    table — the maintained aggregate never read the target."""
    from fintech_lakehouse_spark.streaming import (
        foreach_batch_cdf,
        foreach_batch_ivm,
        read_materialized_view,
    )

    src = tmp_path / "updates"
    src.mkdir()
    # b1: four inserts across two groups. b2: amount update (a),
    # group-moving update (u2: a->b), new key (c).
    b1 = pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u3", "u4"],
            "grp": ["a", "a", "b", "b"],
            "amount": [10.0, 20.0, 30.0, 40.0],
            "v": [1, 1, 1, 1],
        }
    )
    b2 = pd.DataFrame(
        {
            "user_id": ["u1", "u2", "u5"],
            "grp": ["a", "b", "c"],
            "amount": [15.0, 20.0, 50.0],
            "v": [2, 2, 1],
        }
    )
    b1.to_parquet(src / "b1.parquet", index=False)
    time.sleep(1.1)
    b2.to_parquet(src / "b2.parquet", index=False)
    os.utime(src / "b1.parquet", (1, 1))

    target = str(tmp_path / "accounts")
    changelog = str(tmp_path / "accounts_cdf")
    producer = (
        spark.readStream.schema("user_id string, grp string, amount double, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            foreach_batch_cdf(
                target, changelog, key="user_id", order_by="v", emit_preimage=True
            )
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_prod"))
        .trigger(availableNow=True)
        .start()
    )
    producer.awaitTermination(120)

    view = str(tmp_path / "accounts_by_grp")
    consumer = (
        spark.readStream.schema(
            "user_id string, grp string, amount double, v long, "
            "_change_type string, _batch_id long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(changelog)
        .writeStream.foreachBatch(
            foreach_batch_ivm(view, ["grp"], {"total": "amount"})
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cons"))
        .trigger(availableNow=True)
        .start()
    )
    consumer.awaitTermination(120)

    maintained = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in read_materialized_view(spark, view).collect()
    }
    recomputed = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in spark.read.parquet(target)
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("amount").cast("decimal(12,2)"))
            .cast("decimal(18,2)")
            .alias("total"),
        )
        .collect()
    }
    assert maintained == recomputed
    # the group-moving update really moved value: u2 sits in b now
    assert maintained["b"][0] == 3

    # view-level time travel: version 0 (first consumer batch) exists
    # and reflects only what that batch had applied
    v0 = read_materialized_view(spark, view, version=0)
    assert v0 is not None
    assert v0.count() >= 1


def test_ivm_retry_of_committed_version_is_skipped(spark, tmp_path):
    """foreachBatch is at-least-once: re-running a batch id whose
    version directory already committed must be a no-op (the
    exactly-once guarantee), even if the retry sees different data."""
    from fintech_lakehouse_spark.streaming import (
        foreach_batch_ivm,
        read_materialized_view,
    )

    view = str(tmp_path / "view")
    sink = foreach_batch_ivm(view, ["grp"], {"total": "amount"})
    batch = _df(
        spark,
        [(1, "a", 10.0, "insert")],
        "k long, grp string, amount double, _change_type string",
    )
    sink(batch, 0)
    first = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in read_materialized_view(spark, view).collect()
    }
    poisoned = _df(
        spark,
        [(9, "z", 99.0, "insert")],
        "k long, grp string, amount double, _change_type string",
    )
    sink(poisoned, 0)  # retry of committed batch 0: must be skipped
    after = {
        r["grp"]: (r["n_rows"], float(r["total"]))
        for r in read_materialized_view(spark, view).collect()
    }
    assert after == first == {"a": (1, 10.0)}


def test_table_as_of_batch_ignores_update_preimages(spark, tmp_path):
    """Time travel over a FOUR-type (emit_preimage=True) changelog must
    reconstruct post-update values: the preimage row ties with the
    postimage on _batch_id and would nondeterministically win the
    latest-change window if not dropped first (review finding r6s5)."""
    import pandas as pd

    from fintech_lakehouse_spark.streaming import table_as_of_batch

    changelog = tmp_path / "cdf"
    (changelog / "batch=0").mkdir(parents=True)
    (changelog / "batch=1").mkdir(parents=True)
    # the real producer (Spark parquet write) always leaves _SUCCESS;
    # table_as_of_batch reads only committed dirs
    (changelog / "batch=0" / "_SUCCESS").write_text("")
    (changelog / "batch=1" / "_SUCCESS").write_text("")
    pd.DataFrame(
        {
            "k": [1, 2],
            "v": [10.0, 20.0],
            "_change_type": ["insert", "insert"],
            "_batch_id": [0, 0],
        }
    ).to_parquet(changelog / "batch=0" / "part.parquet", index=False)
    pd.DataFrame(
        {
            "k": [1, 1],
            "v": [10.0, 15.0],
            "_change_type": ["update_preimage", "update_postimage"],
            "_batch_id": [1, 1],
        }
    ).to_parquet(changelog / "batch=1" / "part.parquet", index=False)
    for _ in range(20):  # the tie is nondeterministic — hammer it
        state = {
            r["k"]: r["v"]
            for r in table_as_of_batch(spark, str(changelog), key="k").collect()
        }
        assert state == {1: 15.0, 2: 20.0}


def test_sketch_rollup_stream_equals_batch(spark, tmp_path):
    """Streaming sketch state (VERDICT r6 item 8): a file stream of
    events consumed micro-batch-by-micro-batch through
    foreach_batch_sketch_rollup must end with per-group HLL and Theta
    sketches whose estimates EXACTLY equal a direct batch aggregate
    over the union of all batches — HLL bucket-max and Theta set-union
    merges are associative and batching-independent, so no tolerance
    is needed. The stored state then answers retention (∩), churn (∖)
    and total-reach (∪) questions without rescanning raw events."""
    from fintech_lakehouse_spark.streaming import (
        foreach_batch_sketch_rollup,
        read_materialized_view,
    )

    src = tmp_path / "events"
    src.mkdir()
    # two micro-batches; group key = month, distinct key = user.
    # month 1: users 0..79; month 2 (across both batches): evens
    # 0..78 plus 100..109 → retained = 40, churned = 40, reach = 90.
    b1 = pd.DataFrame(
        {
            "month": [1] * 50 + [2] * 20,
            "user": list(range(50)) + [2 * u for u in range(20)],
        }
    )
    b2 = pd.DataFrame(
        {
            "month": [1] * 30 + [2] * 30,
            "user": list(range(50, 80))
            + [2 * u for u in range(20, 40)]
            + list(range(100, 110)),
        }
    )
    b1.to_parquet(src / "b1.parquet", index=False)
    time.sleep(1.1)
    b2.to_parquet(src / "b2.parquet", index=False)
    os.utime(src / "b1.parquet", (1, 1))

    view = str(tmp_path / "sketch_state")
    q = (
        spark.readStream.schema("month long, user long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .writeStream.foreachBatch(
            foreach_batch_sketch_rollup(view, ["month"], "user")
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = read_materialized_view(spark, view)
    maintained = {
        r["month"]: (r["hll_est"], r["theta_est"], r["n_rows"])
        for r in state.select(
            "month",
            F.hll_sketch_estimate("hll_sk").alias("hll_est"),
            F.theta_sketch_estimate("theta_sk").alias("theta_est"),
            "n_rows",
        ).collect()
    }
    both = spark.createDataFrame(pd.concat([b1, b2]))
    direct = {
        r["month"]: (r["hll_est"], r["theta_est"], r["n_rows"])
        for r in both.groupBy("month")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("user").cast("string"))
            ).alias("hll_est"),
            F.theta_sketch_estimate(
                F.theta_sketch_agg(F.col("user").cast("string"))
            ).alias("theta_est"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    assert maintained == direct

    # set algebra on the STORED state — no raw-event rescan
    m1 = state.filter("month = 1").select(
        F.col("theta_sk").alias("a"), F.col("hll_sk").alias("ha")
    )
    m2 = state.filter("month = 2").select(
        F.col("theta_sk").alias("b"), F.col("hll_sk").alias("hb")
    )
    algebra = (
        m1.crossJoin(m2)
        .select(
            F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias(
                "retained"
            ),
            F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
                "churned"
            ),
            F.theta_sketch_estimate(F.theta_union("a", "b")).alias("reach"),
            F.hll_sketch_estimate(F.hll_union("ha", "hb")).alias("hll_reach"),
        )
        .collect()[0]
    )
    assert algebra["retained"] == 40
    assert algebra["churned"] == 40
    assert algebra["reach"] == 90
    assert algebra["hll_reach"] == 90

    # sketch-state time travel: the first consumer batch committed a
    # readable version reflecting only batch-1 rows
    v0 = read_materialized_view(spark, view, version=0)
    assert v0 is not None
    assert v0.agg(F.sum("n_rows")).collect()[0][0] == 70
