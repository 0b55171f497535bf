"""DV encode scale probe (r15, VERDICT r14 item 1): a deletion-vector
DELETE matching 10M rows, executor-side encode vs the legacy
driver-side twin.

Pins two claims:

1. **Bounded driver RSS** — the executor-side encode collects only the
   compressed per-file bitmap bytes, so the DRIVER Python process's RSS
   growth across the DELETE stays far below what materializing 10M
   (file, row_index) pairs costs (the legacy ``toPandas()`` path pulls
   ~10M rows × 2 columns into driver pandas; the probe measures both).
2. **Bit-identical DVs** — the executor-encoded descriptors (decoded
   bitmap index sets AND raw roaring bytes) equal the driver-encoded
   twin's on an identical table copy.

Run: python scripts/dv_encode_probe.py [n_rows]
Output: one JSON line.
"""
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fintech_lakehouse_spark.session import get_spark  # noqa: E402
from fintech_lakehouse_spark.sources.deletionvectors import (  # noqa: E402
    decode_deletion_vector,
)
from fintech_lakehouse_spark.sources.deltalog import (  # noqa: E402
    delete_from_delta_table,
    delta_snapshot,
    read_delta_table,
    write_delta_commit,
)


def _rss_mb() -> float:
    # ru_maxruss is KB on Linux; this is the PEAK, which is what a
    # driver-OOM argument cares about
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def build_table(spark, root: str, n: int, files: int) -> None:
    os.makedirs(root, exist_ok=True)
    df = (
        spark.range(0, n, 1, files)
        .withColumn("v", (F.col("id") * 7 % 1000).cast("int"))
        .repartition(files)
    )
    write_delta_commit(spark, df, root)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    files = 16
    base = "/tmp/dv_encode_probe"
    shutil.rmtree(base, ignore_errors=True)
    spark = get_spark(
        "dv-encode-probe",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n_rows": n, "files": files}
    snaps = {}
    for mode, env in (("executor", None), ("driver", "1")):
        root = os.path.join(base, mode)
        build_table(spark, root, n, files)
        if env is None:
            os.environ.pop("FLS_DV_DRIVER_ENCODE", None)
        else:
            os.environ["FLS_DV_DRIVER_ENCODE"] = env
        rss0 = _rss_mb()
        t0 = time.time()
        # matches every row except a 1-in-97 survivor set → >10M matched
        delete_from_delta_table(
            spark, root, "id % 97 != 0", use_deletion_vectors=True
        )
        out[f"{mode}_sec"] = round(time.time() - t0, 2)
        out[f"{mode}_rss_growth_mb"] = round(_rss_mb() - rss0, 1)
        snap = delta_snapshot(spark, root)
        snaps[mode] = snap
        out[f"{mode}_dv_files"] = len(snap.deletion_vectors)
        out[f"{mode}_survivors"] = read_delta_table(spark, root).count()
    os.environ.pop("FLS_DV_DRIVER_ENCODE", None)
    # bit-identity: identical index sets per file AND identical
    # descriptor sizes (roaring encoding is deterministic)
    ex, dr = snaps["executor"], snaps["driver"]
    # file basenames carry per-write UUIDs — pair the two table copies'
    # files by their deterministic part-NNNNN prefix instead
    part = lambda rel: os.path.basename(rel).split("-")[1]  # noqa: E731
    rels_ex = {part(r): r for r in ex.deletion_vectors}
    rels_dr = {part(r): r for r in dr.deletion_vectors}
    assert set(rels_ex) == set(rels_dr), "touched-file sets differ"
    identical = True
    for bn in rels_ex:
        dv_e = ex.deletion_vectors[rels_ex[bn]]
        dv_d = dr.deletion_vectors[rels_dr[bn]]
        ie = decode_deletion_vector(os.path.join(base, "executor"), dv_e)
        idd = decode_deletion_vector(os.path.join(base, "driver"), dv_d)
        if list(ie) != list(idd) or dv_e["sizeInBytes"] != dv_d["sizeInBytes"]:
            identical = False
    out["bit_identical"] = identical
    out["expected_survivors"] = sum(1 for i in range(n) if i % 97 == 0)
    assert out["executor_survivors"] == out["expected_survivors"]
    assert out["driver_survivors"] == out["expected_survivors"]
    assert identical, "executor-encoded DVs differ from driver twin"
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
