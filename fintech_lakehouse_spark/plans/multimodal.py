"""Driver-checked multimodal query (SURVEY §7.6 multimodal columns).

The multimodal surface (binary payload columns + Arrow-batched
mapInPandas decode) was previously verified by unit tests only — a
binary column can't round-trip through the driver's SQL-oracle hash.
This module closes that gap with a roundtrip IDENTITY query: payload
dims are PROGRAMMED from the row key, the payload is generated as real
PPM/BMP/PNG bytes and decoded back through the real stdlib codecs
inside the distributed pipeline, and the SQL oracle predicts the
recovered dims arithmetically — so a driver red here means the binary
plumbing (Arrow batching, schema, codec) broke, not the SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fintech_lakehouse_spark.plans.registry import register
from fintech_lakehouse_spark.sources.readers import load_table


def _spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition of the tiny per-asset driver table
    (doc_id + arithmetically derived params) so the Python codec work
    in the following pandas stage runs on every core (r15 optimization
    round, guide §2.5 "input skew: repartition immediately after the
    read"): the test lake is ONE parquet file, so the scan is ONE task
    and every mapInPandas/pandas_udf downstream of it ran the whole
    150-200-asset codec batch SERIALLY in a single Python worker
    (measured: jpeg_lossless_roundtrip 37.1 s → 10.2 s at sf0.01 in
    the oracle gate, first-query session warmup included both times). The exchange moves only the id/param longs — payload
    bytes are synthesized AFTER the spread — and at 100 TB the same
    repartition is a no-op-cost insurance against single-file or
    few-row-group asset tables."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


@register(
    "image_decode_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp'
                ELSE 'png' END          AS format,
           CAST(1 + doc_id % 16 AS BIGINT) AS width,
           CAST(1 + doc_id % 9  AS BIGINT) AS height,
           CAST((1 + doc_id % 16) * (1 + doc_id % 9) AS BIGINT) AS n_pixels
    FROM documents
    WHERE doc_id < 200
    """,
)
def image_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode identity through the REAL stdlib image codecs,
    under the driver's hash check: per doc, dims are derived from
    doc_id (width = 1 + id%16, height = 1 + id%9), a real payload in
    a per-row format (ppm/bmp/png cycling on id%3) is synthesized by
    an Arrow-batched pandas UDF, and ``extract_image_features
    (decode='real')`` recovers the dims via the stdlib header/raster
    parsers. The oracle predicts the SAME dims from doc_id alone, so
    the hash check pins the full binary path: synthesis → binary
    column → mapInPandas decode → typed features.

    Scale shape: two Arrow-batched Python stages over one scan — no
    shuffle at all (mapInPandas preserves partitioning; the payload
    never leaves the executor that made it). This is exactly the
    100 TB multimodal pattern: opaque binary column + vectorized
    decode, with per-row quarantine (a corrupt payload yields null
    dims, which would break the oracle identity — so a driver red
    here also catches silent decoder regressions)."""
    from pyspark.sql.types import BinaryType

    from fintech_lakehouse_spark.functions.multimodal import (
        extract_image_features,
        synthesize_image,
    )

    @F.pandas_udf(BinaryType())
    def make_payload(fmt: pd.Series, width: pd.Series, height: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synthesize_image(f, int(w), int(h))
                for f, w, h in zip(fmt, width, height)
            ]
        )

    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    fmt = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("ppm"))
        .when(F.col("doc_id") % 3 == 1, F.lit("bmp"))
        .otherwise(F.lit("png"))
    )
    assets = _spread(documents.select("doc_id")).select(
        F.col("doc_id").alias("asset_id"),
        fmt.alias("format"),
        (1 + F.col("doc_id") % 16).cast("int").alias("w"),
        (1 + F.col("doc_id") % 9).cast("int").alias("h"),
    ).withColumn("payload", make_payload("format", "w", "h"))
    feats = extract_image_features(
        assets.select("asset_id", "format", "payload"), decode="real"
    )
    # format re-derives arithmetically from the key — a join back to
    # `assets` would shuffle both Python-stage outputs just to fetch a
    # column the key already determines (keeping the plan shuffle-free
    # is the point of the mapInPandas pattern).
    fmt_back = (
        F.when(F.col("asset_id") % 3 == 0, F.lit("ppm"))
        .when(F.col("asset_id") % 3 == 1, F.lit("bmp"))
        .otherwise(F.lit("png"))
    )
    return feats.select(
        "asset_id",
        fmt_back.alias("format"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        (F.col("width").cast("long") * F.col("height").cast("long")).alias(
            "n_pixels"
        ),
    )


@register(
    "audio_decode_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(1 + doc_id % 4 AS BIGINT)  AS duration_sec,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 ELSE 16000 END AS BIGINT)
               AS sample_rate,
           CAST(2 << (doc_id % 7) AS BIGINT) AS loudness_proxy
    FROM documents
    WHERE doc_id < 200
    """,
)
def audio_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode→decode identity through the REAL stdlib WAV codec, under
    the driver's hash check (the audio twin of image_decode_roundtrip):
    per doc, a 16-bit PCM payload with programmed duration (1+id%4 s),
    sample rate (8k/16k by id%2) and constant magnitude 2^(8+id%7) is
    synthesized by an Arrow-batched pandas UDF and decoded back via
    ``extract_audio_features(decode='real')`` (wave module + numpy
    RMS). Power-of-two amplitudes make the RMS an exact binary float,
    so loudness_proxy = round(rms·255) = 2^(id%7+1) is predictable
    arithmetic — the oracle pins duration, rate AND the loudness math.

    Scale shape: identical to the image twin — two partition-
    preserving Arrow stages over one scan, the only Exchange is _spread's id-only repartition."""
    from pyspark.sql.types import BinaryType

    from fintech_lakehouse_spark.functions.multimodal import (
        extract_audio_features,
        synthesize_wav,
    )

    @F.pandas_udf(BinaryType())
    def make_wav(dur: pd.Series, rate: pd.Series, amp: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synthesize_wav(int(d), int(r), int(a))
                for d, r, a in zip(dur, rate, amp)
            ]
        )

    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = _spread(documents.select("doc_id")).select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("modality"),
        F.lit("wav").alias("format"),
        (1 + F.col("doc_id") % 4).cast("int").alias("dur"),
        F.when(F.col("doc_id") % 2 == 0, 8000).otherwise(16000).alias("rate"),
        # shiftleft's Python wrapper takes a literal bit count only —
        # go through SQL for a column-valued shift.
        F.expr("shiftleft(256, CAST(doc_id % 7 AS INT))").alias("amp"),
    ).withColumn("payload", make_wav("dur", "rate", "amp"))
    feats = extract_audio_features(
        assets.select("asset_id", "modality", "format", "payload"),
        decode="real",
    )
    return feats.select(
        "asset_id",
        F.col("duration_sec").cast("long").alias("duration_sec"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("loudness_proxy").cast("long").alias("loudness_proxy"),
    )


@register(
    "media_header_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'mp4'
                ELSE 'mp3' END AS format,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 0
                     ELSE 16 + doc_id % 32 END AS BIGINT) AS width,
           CAST(CASE WHEN doc_id % 3 = 2 THEN 0
                     ELSE 16 + doc_id % 24 END AS BIGINT) AS height,
           CAST(CASE doc_id % 3
                WHEN 0 THEN 0
                WHEN 1 THEN 1 + doc_id % 90
                ELSE ((30 + doc_id % 300) * 1152)
                     // (CASE (doc_id // 3) % 3 WHEN 0 THEN 44100
                         WHEN 1 THEN 48000 ELSE 32000 END)
                END AS BIGINT) AS duration_sec
    FROM documents
    WHERE doc_id < 200
    """,
)
def media_header_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-LEVEL metadata roundtrip for the library-bound formats
    (the third multimodal driver check, next to the raster-real image
    and audio roundtrips): JPEG marker-stream dims via
    ``read_jpeg_header``, MP4 ISO-BMFF box-tree duration/dims via
    ``read_mp4_header``, and MP3 CBR frame-walk duration via
    ``read_mp3_header`` — the stdlib-by-hand parsers for exactly the
    metadata any engine extracts without a full codec (lazy ``.size``
    / container probing / tag-reader duration). Payloads are
    synthesized marker streams / box trees / frame chains with
    programmed values; raster/granule/frame decode stays the
    documented DCT/ffmpeg seam, and this query pins everything ABOVE
    that seam under the driver hash. Non-applicable fields carry 0
    (not null) — a typed-null column would flip the comparator dtype.

    Scale shape: same as the other roundtrips — partition-preserving
    Arrow stages per modality branch, the only Exchange is _spread's id-only repartition; jpeg rides
    extract_image_features, mp4 extract_video_features, mp3
    extract_audio_features, and the union is a partition-local
    concatenation (no shuffle)."""
    from pyspark.sql.types import BinaryType

    from fintech_lakehouse_spark.functions.multimodal import (
        extract_audio_features,
        extract_image_features,
        extract_video_features,
        synthesize_jpeg_header,
        synthesize_mp3,
        synthesize_mp4_header,
    )

    @F.pandas_udf(BinaryType())
    def make_media(
        fmt: pd.Series, w: pd.Series, h: pd.Series,
        dur: pd.Series, frames: pd.Series, sridx: pd.Series,
    ) -> pd.Series:
        out = []
        for f, wi, hi, d, nf, sri in zip(fmt, w, h, dur, frames, sridx):
            if f == "jpeg":
                out.append(synthesize_jpeg_header(int(wi), int(hi)))
            elif f == "mp4":
                out.append(synthesize_mp4_header(int(d), int(wi), int(hi)))
            else:
                out.append(synthesize_mp3(int(nf), int(sri)))
        return pd.Series(out)

    documents = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = _spread(documents.select("doc_id")).select(
        F.col("doc_id").alias("asset_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("jpeg"))
        .when(F.col("doc_id") % 3 == 1, F.lit("mp4"))
        .otherwise(F.lit("mp3"))
        .alias("format"),
        (16 + F.col("doc_id") % 32).cast("int").alias("w"),
        (16 + F.col("doc_id") % 24).cast("int").alias("h"),
        (1 + F.col("doc_id") % 90).cast("int").alias("dur"),
        (30 + F.col("doc_id") % 300).cast("int").alias("frames"),
        F.expr("CAST((doc_id DIV 3) % 3 AS INT)").alias("sridx"),
    ).withColumn(
        "payload", make_media("format", "w", "h", "dur", "frames", "sridx")
    )
    jpeg_feats = extract_image_features(
        assets.filter(F.col("format") == "jpeg").select(
            "asset_id", "format", "payload"
        ),
        decode="real",
    ).select(
        "asset_id",
        F.lit("jpeg").alias("format"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.lit(0).cast("long").alias("duration_sec"),
    )
    mp4_feats = extract_video_features(
        assets.filter(F.col("format") == "mp4").select(
            "asset_id",
            F.lit("video").alias("modality"),
            "format",
            "payload",
        ),
        decode="real",
    ).select(
        "asset_id",
        F.lit("mp4").alias("format"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("duration_sec").cast("long").alias("duration_sec"),
    )
    mp3_feats = extract_audio_features(
        assets.filter(F.col("format") == "mp3").select(
            "asset_id",
            F.lit("audio").alias("modality"),
            "format",
            "payload",
        ),
        decode="real",
    ).select(
        "asset_id",
        F.lit("mp3").alias("format"),
        F.lit(0).cast("long").alias("width"),
        F.lit(0).cast("long").alias("height"),
        F.col("duration_sec").cast("long").alias("duration_sec"),
    )
    return jpeg_feats.unionByName(mp4_feats).unionByName(mp3_feats)


@register(
    "jpeg_raster_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS mode,
           CAST(5 + doc_id % 12 AS BIGINT) AS width,
           CAST(3 + doc_id % 10 AS BIGINT) AS height,
           TRUE AS err_le_2
    FROM documents
    WHERE doc_id < 150
    """,
)
def jpeg_raster_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL-RASTER JPEG roundtrip under the driver hash (VERDICT r6
    item 5 — the DCT path that was the largest multimodal seam, now a
    real stdlib codec in functions/jpeg.py): per doc a deterministic
    gradient raster with dims programmed from doc_id (width 5+id%12,
    height 3+id%10 — deliberately NOT 8-multiples so MCU edge padding
    is exercised), grayscale/RGB alternating on id%2, restart markers
    every 2 MCUs on id%5=0, is ENCODED (FDCT → flat quant → Huffman)
    and DECODED (marker walk → entropy decode → IDCT → color convert)
    inside one Arrow-batched stage. The emitted dims come from the
    DECODED ARRAY SHAPE — not any header field — and err_le_2 pins the
    per-pixel error bound of the flat-quant (near-lossless) mode:
    gray ≤1 (coefficient rounding only), RGB ≤2 (adds the YCbCr float
    roundtrip). The oracle predicts all of it arithmetically from
    doc_id, so a red row means the entropy coder, the IDCT, the MCU
    padding, or the restart handling broke.

    Scale shape: one scan + one mapInPandas — the only Exchange is _spread's id-only repartition; whole
    images stay single binary cells (entropy decode is sequential
    within an image because DC prediction chains block-to-block), and
    parallelism is ACROSS images, the same contract as PNG."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("mode", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("err_le_2", BooleanType(), True),
        ]
    )

    def batches(iterator):
        import numpy as np

        from fintech_lakehouse_spark.functions.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
        )

        for pdf in iterator:
            rows = {k: [] for k in ("asset_id", "mode", "width", "height", "err_le_2")}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 5 + i % 12, 3 + i % 10
                gray = i % 2 == 0
                xx = np.arange(w)[None, :]
                yy = np.arange(h)[:, None]
                if gray:
                    img = ((xx * 7 + yy * 13 + i) % 256).astype(np.uint8)
                else:
                    img = np.stack(
                        [((xx * 7 + yy * 13 + c * 29 + i) % 256) for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                payload = encode_jpeg(
                    img, restart_interval=2 if i % 5 == 0 else 0
                )
                dec = decode_jpeg_pixels(payload)
                rows["asset_id"].append(i)
                rows["mode"].append("gray" if gray else "rgb")
                if dec is None or dec.shape[:2] != (h, w):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["err_le_2"].append(None)
                    continue
                err = int(
                    np.max(np.abs(dec.astype(np.int64) - img.astype(np.int64)))
                )
                rows["width"].append(dec.shape[1])
                rows["height"].append(dec.shape[0])
                rows["err_le_2"].append(err <= 2)
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)


@register(
    "mp4_sample_table_roundtrip",
    oracle="""
    WITH params AS (
        SELECT doc_id,
               24 + doc_id % 96 AS n,
               CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END
                   AS fps,
               400 + doc_id % 100 AS base,
               doc_id % 4 = 0 AS uniform
        FROM documents WHERE doc_id < 150
    )
    SELECT doc_id AS asset_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST((n * (12800 // fps)) // 12800 AS BIGINT) AS duration_sec,
           CAST(CASE WHEN uniform THEN base * n
                ELSE base * n + (n // 7) * 21
                     + ((n % 7) * ((n % 7) - 1)) // 2
                END AS BIGINT) AS total_sample_bytes,
           CAST(12800 AS BIGINT) AS media_timescale
    FROM params
    """,
)
def mp4_sample_table_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP4 SAMPLE-TABLE roundtrip under the driver hash (r7 — one real
    level deeper than media_header_roundtrip's presentation metadata):
    per doc, a full ISO-BMFF tree with mdhd media timescale, a
    run-length stts decoding-time table, and an stsz size table
    (uniform-size form on id%4=0, per-sample form otherwise, sizes
    base+(i%7) so the byte sum is non-trivially programmed) is
    synthesized and re-parsed via ``read_mp4_sample_table`` — the
    frame-count / duration / byte-sum walk that ffprobe-level stream
    info performs. The oracle predicts every recovered value
    arithmetically, including the closed form of Σ(i%7). Sample
    PAYLOAD decode stays the codec-bound seam; everything above it is
    now hash-checked.

    Scale shape: one scan + one Arrow-batched stage, the only Exchange is _spread's id-only repartition —
    the standard multimodal roundtrip contract."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("n_samples", LongType(), True),
            StructField("duration_sec", LongType(), True),
            StructField("total_sample_bytes", LongType(), True),
            StructField("media_timescale", LongType(), True),
        ]
    )

    def batches(iterator):
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_sample_table,
            synthesize_mp4_sample_table,
        )

        for pdf in iterator:
            rows = {
                k: []
                for k in (
                    "asset_id",
                    "n_samples",
                    "duration_sec",
                    "total_sample_bytes",
                    "media_timescale",
                )
            }
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                payload = synthesize_mp4_sample_table(
                    n_samples=24 + i % 96,
                    fps=(24, 25, 30)[i % 3],
                    base_sample_bytes=400 + i % 100,
                    uniform=i % 4 == 0,
                )
                parsed = read_mp4_sample_table(payload)
                rows["asset_id"].append(i)
                if parsed is None:
                    for k in list(rows)[1:]:
                        rows[k].append(None)
                    continue
                n, dur, nbytes, ts = parsed
                rows["n_samples"].append(n)
                rows["duration_sec"].append(dur)
                rows["total_sample_bytes"].append(nbytes)
                rows["media_timescale"].append(ts)
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)


FRAME_SAMPLE_K = 4


@register(
    "video_frame_sample_manifest",
    oracle=f"""
    WITH params AS (
        SELECT doc_id,
               24 + doc_id % 96 AS n,
               CASE doc_id % 3 WHEN 0 THEN 24 WHEN 1 THEN 25 ELSE 30 END
                   AS fps,
               400 + doc_id % 100 AS base,
               doc_id % 4 = 0 AS uniform
        FROM documents WHERE doc_id < 150
    ),
    picked AS (
        SELECT p.doc_id, p.n, p.fps, p.base, p.uniform,
               CAST(j.j AS BIGINT)            AS sample_slot,
               (j.j * p.n) // {FRAME_SAMPLE_K} AS idx
        FROM params p CROSS JOIN range({FRAME_SAMPLE_K}) j(j)
    )
    SELECT doc_id AS asset_id, sample_slot,
           CAST(idx AS BIGINT) AS frame_index,
           CAST(idx * (12800 // fps) * 1000 // 12800 AS BIGINT)
               AS decode_ts_ms,
           CAST(CASE WHEN uniform THEN idx * base
                ELSE base * idx + (idx // 7) * 21
                     + ((idx % 7) * ((idx % 7) - 1)) // 2
                END AS BIGINT) AS byte_offset,
           CAST(CASE WHEN uniform THEN base
                ELSE base + idx % 7 END AS BIGINT) AS frame_bytes
    FROM picked
    ORDER BY asset_id, sample_slot
    """,
)
def video_frame_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRAME SAMPLING — the video op the multimodal brief names next
    to decode/resize: pick {FRAME_SAMPLE_K} uniformly-spaced frames
    per video (index ⌊j·n/{FRAME_SAMPLE_K}⌋) and emit the manifest a
    downstream frame decoder consumes — frame index, decode timestamp
    (ms), byte OFFSET into the media data, and frame size — all read
    from the REAL ISO-BMFF sample table (stts run-length decode
    times + stsz sizes, functions/multimodal.py::
    read_mp4_frame_table), never by decoding payloads (codec-bound
    seam). This is exactly how production frame samplers work: the
    sample table tells you where to seek, so you fetch K frames'
    bytes instead of the whole file.

    Driver-checkable by the fact-40 recipe: payloads synthesize with
    metadata PROGRAMMED from the key, the manifest is recovered by
    the real parser, and the oracle predicts every value
    arithmetically — offsets via the closed form of Σ(base + m%7)
    over m < idx (21 per full 7-cycle + the r(r−1)/2 partial).

    Scale shape: one scan + one Arrow-batched mapInPandas stage, zero
    Exchange (the multimodal roundtrip contract); output is
    K×|videos|."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("sample_slot", LongType(), False),
            StructField("frame_index", LongType(), True),
            StructField("decode_ts_ms", LongType(), True),
            StructField("byte_offset", LongType(), True),
            StructField("frame_bytes", LongType(), True),
        ]
    )

    def batches(iterator):
        from fintech_lakehouse_spark.functions.multimodal import (
            read_mp4_frame_table,
            synthesize_mp4_sample_table,
        )

        for pdf in iterator:
            rows = {
                k: []
                for k in (
                    "asset_id",
                    "sample_slot",
                    "frame_index",
                    "decode_ts_ms",
                    "byte_offset",
                    "frame_bytes",
                )
            }
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                payload = synthesize_mp4_sample_table(
                    n_samples=24 + i % 96,
                    fps=(24, 25, 30)[i % 3],
                    base_sample_bytes=400 + i % 100,
                    uniform=i % 4 == 0,
                )
                parsed = read_mp4_frame_table(payload)
                for j in range(FRAME_SAMPLE_K):
                    rows["asset_id"].append(i)
                    rows["sample_slot"].append(j)
                    if parsed is None:
                        for k in list(rows)[2:]:
                            rows[k].append(None)
                        continue
                    ts, deltas, sizes = parsed
                    idx = (j * len(sizes)) // FRAME_SAMPLE_K
                    rows["frame_index"].append(idx)
                    rows["decode_ts_ms"].append(
                        sum(deltas[:idx]) * 1000 // ts
                    )
                    rows["byte_offset"].append(sum(sizes[:idx]))
                    rows["frame_bytes"].append(sizes[idx])
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return (
        _spread(documents.select("doc_id"))
        .mapInPandas(batches, schema)
        .orderBy("asset_id", "sample_slot")
    )


@register(
    "mp3_granule_sideinfo_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(30 + doc_id % 120 AS BIGINT) AS n_frames,
           CAST(CASE doc_id % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS BIGINT) AS sample_rate,
           CAST(4 * (30 + doc_id % 120) AS BIGINT) AS n_granule_channels,
           CAST(4 * (30 + doc_id % 120) * (64 + doc_id % 128) AS BIGINT)
               AS global_gain_sum,
           CAST(0 AS BIGINT) AS part2_3_bits_total
    FROM documents
    WHERE doc_id < 200
    """,
)
def mp3_granule_sideinfo_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 GRANULE-level decode roundtrip (r9, VERDICT r8 item 10 —
    one real level below media_header_roundtrip's frame walk): per
    doc, a CBR MPEG1 Layer III stream is synthesized with spec-layout
    stereo side information carrying a PROGRAMMED global_gain
    (64 + id%128) in every granule-channel and empty entropy data
    (part2_3_length = 0 — the granules decode to digital silence under
    the spec, so the gain is metadata-coherent), then decoded back via
    ``read_mp3_side_info``: frame count, sample rate, granule-channel
    count (2 granules × 2 channels × frames), the recovered gain SUM,
    and the part2_3 bit total all under the driver hash. Huffman +
    IMDCT PCM reconstruction of NON-empty granules remains the
    library-bound seam (extract_audio_features(decode='real') names
    it); everything above that seam — sync walk, side-info bit
    grammar, granule accounting — is real decode, oracle-pinned.

    Scale shape: the roundtrip-family contract — two partition-
    preserving Arrow stages over one scan, the only Exchange is _spread's id-only repartition."""
    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_side_info,
        synthesize_mp3,
    )

    def batches(iterator):
        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "n_frames", "sample_rate",
                "n_granule_channels", "global_gain_sum",
                "part2_3_bits_total",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                payload = synthesize_mp3(
                    30 + did % 120, did % 3, global_gain=64 + did % 128
                )
                decoded = read_mp3_side_info(payload)
                assert decoded is not None  # synthetic stream: must sync
                nf, rate, gch, gain_sum, p23 = decoded
                rows["asset_id"].append(did)
                rows["n_frames"].append(nf)
                rows["sample_rate"].append(rate)
                rows["n_granule_channels"].append(gch)
                rows["global_gain_sum"].append(gain_sum)
                rows["part2_3_bits_total"].append(p23)
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return _spread(documents.select("doc_id")).mapInPandas(
        batches,
        "asset_id long, n_frames long, sample_rate long, "
        "n_granule_channels long, global_gain_sum long, "
        "part2_3_bits_total long",
    )


@register(
    "mp3_bigvalues_roundtrip",
    oracle="""
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    vals AS (
      SELECT b.doc_id, ((b.doc_id + k.k) % 3) - 1 AS v
      FROM base b, LATERAL (
        SELECT UNNEST(range(0, 2*(4 + b.doc_id % 13)))) AS k(k)
      WHERE b.doc_id % 17 <> 0
    ),
    agg AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(v) AS BIGINT) AS value_sum,
             CAST(SUM(ABS(v)) AS BIGINT) AS abs_sum
      FROM vals GROUP BY doc_id
    )
    SELECT b.doc_id AS asset_id,
           CASE WHEN b.doc_id % 17 = 0 THEN NULL
                ELSE CAST(CASE b.doc_id % 3 WHEN 0 THEN 44100
                          WHEN 1 THEN 48000 ELSE 32000 END AS BIGINT)
           END AS sample_rate,
           a.n_values, a.value_sum, a.abs_sum
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def mp3_bigvalues_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 ENTROPY-level decode roundtrip (r10, VERDICT r9 item 8 —
    one real level below mp3_granule_sideinfo_roundtrip's side-info
    grammar): per doc, a mono MPEG1 Layer III frame is synthesized
    whose granule 0 carries a PROGRAMMED spectral prefix
    (2·(4 + id%13) values, value k = ((id + k) % 3) − 1) HUFFMAN-CODED
    in the big_values region with spec table 1 (ISO 11172-3 Table
    B.7), then decoded back bit-for-bit via ``read_mp3_spectrum``:
    value count, signed sum, and magnitude sum under the driver hash
    (sign bits and code boundaries both wrong → hash flips). Every
    17th asset feeds a STEREO stream instead, which the mono-subset
    decoder must QUARANTINE to NULLs (fail-closed, in-pipeline).
    IMDCT/synthesis-filterbank PCM and the remaining 30 Huffman tables
    stay the named seam (functions/multimodal.py::_MP3_HUFF_T1
    documents the extension point).

    Scale shape: the roundtrip-family contract — two partition-
    preserving Arrow stages over one scan, the only Exchange is _spread's id-only repartition."""
    import pandas as pd

    from fintech_lakehouse_spark.functions.multimodal import (
        read_mp3_spectrum,
        synthesize_mp3,
        synthesize_mp3_spectrum,
    )

    def batches(iterator):
        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "sample_rate", "n_values", "value_sum",
                "abs_sum",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 17 == 0:
                    payload = synthesize_mp3(2, did % 3, global_gain=90)
                else:
                    n_vals = 2 * (4 + did % 13)
                    vals = [((did + k) % 3) - 1 for k in range(n_vals)]
                    payload = synthesize_mp3_spectrum(vals, did % 3)
                decoded = read_mp3_spectrum(payload)
                rows["asset_id"].append(did)
                if decoded is None:
                    for k in ("sample_rate", "n_values", "value_sum",
                              "abs_sum"):
                        rows[k].append(None)
                    continue
                rate, got = decoded
                rows["sample_rate"].append(rate)
                rows["n_values"].append(len(got))
                rows["value_sum"].append(sum(got))
                rows["abs_sum"].append(sum(abs(v) for v in got))
            yield pd.DataFrame(rows, dtype="object")

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return _spread(documents.select("doc_id")).mapInPandas(
        batches,
        "asset_id long, sample_rate long, n_values long, "
        "value_sum long, abs_sum long",
    )


@register(
    "mp3_scalefactor_roundtrip",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(doc_id % 16 AS BIGINT) AS sfc,
             CASE doc_id % 16
               WHEN 4 THEN 3 WHEN 5 THEN 1 WHEN 6 THEN 1 WHEN 7 THEN 1
               WHEN 8 THEN 2 WHEN 9 THEN 2 WHEN 10 THEN 2 WHEN 11 THEN 3
               WHEN 12 THEN 3 WHEN 13 THEN 3 WHEN 14 THEN 4 WHEN 15 THEN 4
               ELSE 0 END AS slen1,
             CASE doc_id % 16
               WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 3
               WHEN 4 THEN 0 WHEN 5 THEN 1 WHEN 6 THEN 2 WHEN 7 THEN 3
               WHEN 8 THEN 1 WHEN 9 THEN 2 WHEN 10 THEN 3 WHEN 11 THEN 1
               WHEN 12 THEN 2 WHEN 13 THEN 3 WHEN 14 THEN 2 ELSE 3
               END AS slen2
      FROM documents WHERE doc_id < 200
    ),
    sf AS (
      SELECT b.doc_id,
             (b.doc_id + k.k) % (CASE (CASE WHEN k.k < 11 THEN b.slen1
                                       ELSE b.slen2 END)
                                 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4
                                 WHEN 3 THEN 8 ELSE 16 END) AS v
      FROM base b, LATERAL (SELECT UNNEST(range(0, 21))) AS k(k)
      WHERE b.doc_id % 19 <> 0
    ),
    sfa AS (
      SELECT doc_id,
             CAST(SUM(v) AS BIGINT) AS sf_sum,
             CAST(MAX(v) AS BIGINT) AS sf_max
      FROM sf GROUP BY doc_id
    ),
    vals AS (
      SELECT b.doc_id, ((b.doc_id * 3 + j.j) % 3) - 1 AS v
      FROM base b, LATERAL (
        SELECT UNNEST(range(0, 2 * (2 + b.doc_id % 5)))) AS j(j)
      WHERE b.doc_id % 19 <> 0
    ),
    va AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(v) AS BIGINT) AS value_sum
      FROM vals GROUP BY doc_id
    )
    SELECT b.doc_id AS asset_id,
           CASE WHEN b.doc_id % 19 = 0 THEN NULL ELSE b.sfc END
               AS scalefac_compress,
           s.sf_sum, s.sf_max, v.n_values, v.value_sum
    FROM base b
    LEFT JOIN sfa s USING (doc_id)
    LEFT JOIN va v USING (doc_id)
    """,
)
def mp3_scalefactor_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MP3 SCALEFACTOR (part2) decode roundtrip (r10 — the second
    entropy-level pass after mp3_bigvalues_roundtrip's part3): per
    doc, a mono frame is synthesized whose granule 0 carries 21
    PROGRAMMED long-block scalefactors at the scalefac_compress-
    selected (slen1, slen2) bit widths (the canonical 16-entry
    _MP3_SLEN table) AHEAD of table-1 Huffman data, then decoded back
    via ``read_mp3_granule``: the compress index, scalefactor sum/max
    and the spectral values all under the driver hash — a one-bit slip
    anywhere in part2 desyncs part3 and flips every column. Every 19th
    asset feeds a stereo stream the mono-subset decoder must
    QUARANTINE to NULLs. The oracle replays the slen table and the
    modular scalefactor program in exact integer SQL.

    Scale shape: the roundtrip-family contract — two partition-
    preserving Arrow stages over one scan, the only Exchange is _spread's id-only repartition."""
    import pandas as pd

    from fintech_lakehouse_spark.functions.multimodal import (
        _MP3_SLEN,
        read_mp3_granule,
        synthesize_mp3,
        synthesize_mp3_spectrum,
    )

    def batches(iterator):
        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "scalefac_compress", "sf_sum", "sf_max",
                "n_values", "value_sum",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 19 == 0:
                    payload = synthesize_mp3(2, did % 3, global_gain=77)
                else:
                    sfc = did % 16
                    s1, s2 = _MP3_SLEN[sfc]
                    sfs = [
                        (did + k) % (1 << (s1 if k < 11 else s2))
                        for k in range(21)
                    ]
                    n_vals = 2 * (2 + did % 5)
                    vals = [((did * 3 + j) % 3) - 1 for j in range(n_vals)]
                    payload = synthesize_mp3_spectrum(
                        vals, did % 3, scalefac_compress=sfc,
                        scalefactors=sfs,
                    )
                g = read_mp3_granule(payload)
                rows["asset_id"].append(did)
                if g is None:
                    for k in ("scalefac_compress", "sf_sum", "sf_max",
                              "n_values", "value_sum"):
                        rows[k].append(None)
                    continue
                rows["scalefac_compress"].append(g["scalefac_compress"])
                rows["sf_sum"].append(sum(g["scalefactors"]))
                rows["sf_max"].append(max(g["scalefactors"]))
                rows["n_values"].append(len(g["values"]))
                rows["value_sum"].append(sum(g["values"]))
            yield pd.DataFrame(rows, dtype="object")

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return _spread(documents.select("doc_id")).mapInPandas(
        batches,
        "asset_id long, scalefac_compress long, sf_sum long, "
        "sf_max long, n_values long, value_sum long",
    )


@register(
    "mp3_count1_requantize_roundtrip",
    oracle="""
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 200),
    bv AS (
      SELECT b.doc_id, j.j AS i, ((b.doc_id + j.j) % 3) - 1 AS v
      FROM base b, LATERAL (
        SELECT UNNEST(range(0, 2 * (2 + b.doc_id % 4)))) AS j(j)
      WHERE b.doc_id % 23 <> 0
    ),
    c1 AS (
      SELECT b.doc_id,
             2 * (2 + b.doc_id % 4) + q.q * 4 + j.j AS i,
             q.q AS q, j.j AS j,
             CASE j.j
               WHEN 0 THEN (b.doc_id + q.q) % 2
               WHEN 1 THEN (b.doc_id + q.q + 1) % 2
               WHEN 2 THEN ((b.doc_id + q.q) // 2) % 2
               ELSE ((b.doc_id + q.q) // 3) % 2 END AS mag
      FROM base b,
           LATERAL (SELECT UNNEST(range(0, 1 + b.doc_id % 5))) AS q(q),
           LATERAL (SELECT UNNEST(range(0, 4))) AS j(j)
      WHERE b.doc_id % 23 <> 0
    ),
    c1v AS (
      SELECT doc_id, i,
             CASE WHEN mag <> 0 AND (doc_id + q + j) % 3 = 0 THEN -mag
                  ELSE mag END AS v
      FROM c1
    ),
    lines AS (
      SELECT doc_id, i, v FROM bv
      UNION ALL SELECT doc_id, i, v FROM c1v
    ),
    xr AS (
      SELECT doc_id, i, v,
             CASE WHEN v = 0 THEN 0
                  ELSE CAST(SIGN(v) AS BIGINT)
                       * CAST(POW(2.0, 25 - (doc_id % 20)
                              - ((doc_id + LEAST(i // 4, 6)) % 4))
                         AS BIGINT)
             END AS xs
      FROM lines
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN i >= 2 * (2 + doc_id % 4)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_count1,
             CAST(SUM(CASE WHEN i >= 2 * (2 + doc_id % 4)
                      THEN v ELSE 0 END) AS BIGINT) AS c1_sum,
             CAST(SUM(xs) AS BIGINT) AS xr_scaled,
             CAST(SUM(ABS(xs)) AS BIGINT) AS xr_abs_scaled
      FROM xr GROUP BY doc_id
    )
    SELECT b.doc_id AS asset_id, a.n_count1, a.c1_sum,
           a.xr_scaled, a.xr_abs_scaled
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def mp3_count1_requantize_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MP3 COUNT1 + REQUANTIZATION roundtrip (r12, VERDICT r11 item 6
    — the two layers that complete the entropy side of the mp3
    subset): per doc, a mono frame carries a programmed big_values
    prefix AND a programmed COUNT1 region (1 + id%5 quadruples of ±1/0
    with per-component sign programming, coded with ISO Table B.7 quad
    table A on even ids and 4-bit-complement table B on odd ids), all
    inside part2_3_length; ``read_mp3_granule`` must land exactly on
    the bit boundary after decoding BOTH regions. The decoded granule
    then REQUANTIZES (``mp3_requantize``: global_gain/scalefactor
    exponent law, ISO §2.4.3.4) under an exponent program chosen so
    every xr is an exact power of two — global_gain = 210 − 4·(id%20)
    and scalefac_scale=1 give integer exponents, so the 2^25-scaled
    sums are exact BIGINTs in BOTH engines (the plans/_num.py
    exactness-by-construction stance; no float rounding anywhere).
    Lines stay below index 30 where all three sample rates share
    Table B.8 boundaries and pretab is zero — the preflag/pretab and
    4/3-power paths are pinned by unit tests instead
    (tests/test_multimodal_r12.py). Every 23rd asset feeds a stereo
    stream the mono decoder QUARANTINES to NULLs. IMDCT + synthesis
    filterbank stay the named seam.

    Scale shape: the roundtrip-family contract — two partition-
    preserving Arrow stages over one scan, the only Exchange is _spread's id-only repartition."""
    import pandas as pd

    from fintech_lakehouse_spark.functions.multimodal import (
        mp3_requantize,
        read_mp3_granule,
        synthesize_mp3,
        synthesize_mp3_spectrum,
    )

    def batches(iterator):
        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "n_count1", "c1_sum", "xr_scaled",
                "xr_abs_scaled",
            )}
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 23 == 0:
                    payload = synthesize_mp3(2, did % 3, global_gain=90)
                else:
                    bvals = [((did + j) % 3) - 1
                             for j in range(2 * (2 + did % 4))]
                    c1: list[int] = []
                    for q in range(1 + did % 5):
                        quad = [
                            (did + q) % 2,
                            (did + q + 1) % 2,
                            ((did + q) // 2) % 2,
                            ((did + q) // 3) % 2,
                        ]
                        c1.extend(
                            -v if v and (did + q + j) % 3 == 0 else v
                            for j, v in enumerate(quad)
                        )
                    payload = synthesize_mp3_spectrum(
                        bvals, did % 3, scalefac_compress=10,
                        scalefactors=[(did + k) % 4 for k in range(21)],
                        count1_values=c1, count1table=did % 2,
                        global_gain=210 - 4 * (did % 20),
                        preflag=1 if did % 3 == 0 else 0,
                        scalefac_scale=1,
                    )
                g = read_mp3_granule(payload)
                rows["asset_id"].append(did)
                if g is None:
                    for k in ("n_count1", "c1_sum", "xr_scaled",
                              "xr_abs_scaled"):
                        rows[k].append(None)
                    continue
                xr = mp3_requantize(g)
                rows["n_count1"].append(len(g["count1_values"]))
                rows["c1_sum"].append(sum(g["count1_values"]))
                rows["xr_scaled"].append(
                    int(round(sum(xr) * (1 << 25)))
                )
                rows["xr_abs_scaled"].append(
                    int(round(sum(abs(v) for v in xr) * (1 << 25)))
                )
            yield pd.DataFrame(rows, dtype="object")

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 200
    )
    return _spread(documents.select("doc_id")).mapInPandas(
        batches,
        "asset_id long, n_count1 long, c1_sum long, "
        "xr_scaled long, xr_abs_scaled long",
    )


@register(
    "jpeg_progressive_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS mode,
           CAST(9 + doc_id % 21 AS BIGINT) AS width,
           CAST(6 + doc_id % 17 AS BIGINT) AS height,
           TRUE AS matches_baseline
    FROM documents
    WHERE doc_id < 150
    """,
)
def jpeg_progressive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG roundtrip (r12 — the spectral-selection
    half of the last JPEG seam): per doc a deterministic raster
    (dims 9+id%21 × 6+id%17, never 8-multiples; gray/RGB on id%2;
    every 3rd doc heavily quantized so consecutive all-zero AC blocks
    exercise the EOBn run codes) is encoded PROGRESSIVELY — one
    interleaved DC scan, then one full-band AC scan per component with
    EOB-run coalescing — and decoded back through the multi-scan
    coefficient accumulator. ``matches_baseline`` pins the strongest
    possible contract: the progressive decode must equal the BASELINE
    decode of the same coefficients BIT-FOR-BIT (both carry identical
    quantized DCT data, so any divergence is an entropy/scan-grammar
    bug, not rounding). Dims come from the decoded array shape.
    Successive approximation (Ah/Al ≠ 0) is implemented r13 — see
    ``jpeg_successive_roundtrip``.

    Scale shape: one scan + one mapInPandas — the only Exchange is _spread's id-only repartition; images
    stay single binary cells, parallelism is ACROSS images."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("mode", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("matches_baseline", BooleanType(), True),
        ]
    )

    def batches(iterator):
        import numpy as np

        from fintech_lakehouse_spark.functions.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "mode", "width", "height", "matches_baseline",
            )}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 9 + i % 21, 6 + i % 17
                gray = i % 2 == 0
                xx = np.arange(w)[None, :]
                yy = np.arange(h)[:, None]
                if gray:
                    img = ((xx * 5 + yy * 11 + i) % 256).astype(np.uint8)
                else:
                    img = np.stack(
                        [((xx * 5 + yy * 11 + c * 37 + i) % 256)
                         for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                if i % 3 == 0:
                    q = np.full(64, 220, dtype=np.uint16)
                    q[0] = 1  # DC survives; AC mostly zero -> EOB runs
                else:
                    q = None
                prog = encode_jpeg_progressive(img, quant=q)
                base = encode_jpeg(img, quant=q)
                dp = decode_jpeg_pixels(prog)
                db = decode_jpeg_pixels(base)
                rows["asset_id"].append(i)
                rows["mode"].append("gray" if gray else "rgb")
                if dp is None or db is None or dp.shape[:2] != (h, w):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["matches_baseline"].append(None)
                    continue
                rows["width"].append(dp.shape[1])
                rows["height"].append(dp.shape[0])
                rows["matches_baseline"].append(
                    bool(np.array_equal(dp, db))
                )
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)


@register(
    "jpeg_successive_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS mode,
           CAST(9 + doc_id % 21 AS BIGINT) AS width,
           CAST(6 + doc_id % 17 AS BIGINT) AS height,
           TRUE AS matches_baseline
    FROM documents
    WHERE doc_id < 150
    """,
)
def jpeg_successive_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUCCESSIVE-APPROXIMATION (SOF2, Ah/Al) JPEG roundtrip (r13 —
    VERDICT r12 item 5, the other progressive half): per doc the same
    deterministic raster family as ``jpeg_progressive_roundtrip`` is
    encoded as a TWO-STAGE approximation — DC and per-component
    full-band AC first scans at Al=1 (values point-transformed right
    one bit), then a DC refinement (one raw bit per block) and AC
    refinement scans (Ah=1: correction bits for already-nonzero
    coefficients interleaved with newly-nonzero (r<<4)|1 symbols and
    EOB-run buffering — the libjpeg encode/decode_mcu_AC_refine
    contract). ``matches_baseline`` pins the refinement to the
    strongest contract available: after both stages the decode must
    equal the BASELINE decode of the same quantized coefficients
    BIT-FOR-BIT — a wrong correction bit or desynced EOB run flips
    pixels, not just quality. Every 3rd doc heavily quantized so the
    refinement's EOBRUN/ZRL buffering paths run; arithmetic coding
    stays the named seam.

    Scale shape: one scan + one mapInPandas — the only Exchange is _spread's id-only repartition; images
    stay single binary cells, parallelism is ACROSS images."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("mode", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("matches_baseline", BooleanType(), True),
        ]
    )

    def batches(iterator):
        import numpy as np

        from fintech_lakehouse_spark.functions.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
            encode_jpeg_progressive_sa,
        )

        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "mode", "width", "height", "matches_baseline",
            )}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 9 + i % 21, 6 + i % 17
                gray = i % 2 == 0
                xx = np.arange(w)[None, :]
                yy = np.arange(h)[:, None]
                if gray:
                    img = ((xx * 5 + yy * 11 + i) % 256).astype(np.uint8)
                else:
                    img = np.stack(
                        [((xx * 5 + yy * 11 + c * 37 + i) % 256)
                         for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                if i % 3 == 0:
                    q = np.full(64, 220, dtype=np.uint16)
                    q[0] = 1  # AC mostly zero → refinement EOB runs
                else:
                    q = None
                dsa = decode_jpeg_pixels(
                    encode_jpeg_progressive_sa(img, quant=q)
                )
                db = decode_jpeg_pixels(encode_jpeg(img, quant=q))
                rows["asset_id"].append(i)
                rows["mode"].append("gray" if gray else "rgb")
                if dsa is None or db is None or dsa.shape[:2] != (h, w):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["matches_baseline"].append(None)
                    continue
                rows["width"].append(dsa.shape[1])
                rows["height"].append(dsa.shape[0])
                rows["matches_baseline"].append(
                    bool(np.array_equal(dsa, db))
                )
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)


@register(
    "jpeg_arithmetic_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS mode,
           CAST(9 + doc_id % 21 AS BIGINT) AS width,
           CAST(6 + doc_id % 17 AS BIGINT) AS height,
           TRUE AS matches_baseline,
           TRUE AS has_arith_markers,
           TRUE AS progressive_matches
    FROM documents
    WHERE doc_id < 150
    """,
)
def jpeg_arithmetic_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded (SOF9, QM-coder) JPEG roundtrip (r14 — VERDICT
    r13 item 7, the last named T.81 seam): per doc the same
    deterministic raster family as the progressive queries is encoded
    through ``functions/jpeg_arith.py`` — T.81 Annex D interval
    arithmetic with adaptive per-context probability states, the
    Annex F §F.1.4 sequential DC/AC statistical models, DAC
    conditioning segments and 0xFF stuffing — then decoded back.
    ``matches_baseline`` pins the strongest contract available
    offline: the arithmetic decode must equal the Huffman decode of
    the IDENTICAL quantized coefficients bit-for-bit (shared
    DCT/quant pipeline — only the entropy layer differs, exactly the
    seam the arithmetic option occupies in the standard).
    ``has_arith_markers`` asserts the stream really is the arithmetic
    format (SOF9 + DAC present, no DHT). ``progressive_matches``
    (r14, the item's second half) runs the SAME coefficients through
    the SOF10 two-stage successive approximation — DC first/refine,
    point-transformed AC first scans and the G.1.3.3 AC refinement
    walk — and pins that decode bit-for-bit too. Every 3rd doc
    heavily quantized so long zero runs exercise the EOB-decision
    contexts of both frame types.

    Scale shape: one scan + one mapInPandas — the only Exchange is _spread's id-only repartition; images
    stay single binary cells, parallelism is ACROSS images (the only
    distribution that makes sense for per-asset codecs at 100 TB)."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("mode", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("matches_baseline", BooleanType(), True),
            StructField("has_arith_markers", BooleanType(), True),
            StructField("progressive_matches", BooleanType(), True),
        ]
    )

    def batches(iterator):
        import numpy as np

        from fintech_lakehouse_spark.functions.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg,
        )
        from fintech_lakehouse_spark.functions.jpeg_arith import (
            encode_jpeg_arith,
            encode_jpeg_progressive_arith,
        )

        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "mode", "width", "height",
                "matches_baseline", "has_arith_markers",
                "progressive_matches",
            )}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 9 + i % 21, 6 + i % 17
                gray = i % 2 == 0
                xx = np.arange(w)[None, :]
                yy = np.arange(h)[:, None]
                if gray:
                    img = ((xx * 5 + yy * 11 + i) % 256).astype(np.uint8)
                else:
                    img = np.stack(
                        [((xx * 5 + yy * 11 + c * 37 + i) % 256)
                         for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                if i % 3 == 0:
                    q = np.full(64, 220, dtype=np.uint16)
                    q[0] = 1  # AC mostly zero → EOB-decision paths
                else:
                    q = None
                stream = encode_jpeg_arith(img, quant=q)
                da = decode_jpeg_pixels(stream)
                dp = decode_jpeg_pixels(
                    encode_jpeg_progressive_arith(img, quant=q)
                )
                db = decode_jpeg_pixels(encode_jpeg(img, quant=q))
                rows["asset_id"].append(i)
                rows["mode"].append("gray" if gray else "rgb")
                if da is None or db is None or da.shape[:2] != (h, w):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["matches_baseline"].append(None)
                    rows["has_arith_markers"].append(None)
                    rows["progressive_matches"].append(None)
                    continue
                rows["width"].append(da.shape[1])
                rows["height"].append(da.shape[0])
                rows["matches_baseline"].append(
                    bool(np.array_equal(da, db))
                )
                rows["has_arith_markers"].append(
                    b"\xff\xc9" in stream
                    and b"\xff\xcc" in stream
                    and b"\xff\xc4" not in stream
                )
                rows["progressive_matches"].append(
                    dp is not None and bool(np.array_equal(dp, db))
                )
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)


@register(
    "jpeg_lossless_roundtrip",
    oracle="""
    SELECT doc_id AS asset_id,
           CASE WHEN doc_id % 2 = 0 THEN 'gray' ELSE 'rgb' END AS mode,
           CAST(9 + doc_id % 21 AS BIGINT) AS width,
           CAST(6 + doc_id % 17 AS BIGINT) AS height,
           CAST(1 + doc_id % 7 AS BIGINT) AS predictor,
           TRUE AS exact_match,
           TRUE AS pt_matches,
           TRUE AS deep_matches,
           TRUE AS arith_matches,
           TRUE AS has_lossless_markers
    FROM documents
    WHERE doc_id < 150
    """,
)
def jpeg_lossless_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS (SOF3, T.81 Annex H) JPEG roundtrip (r15 — VERDICT r14
    item 7, closing the last named T.81 frame family): per doc the
    deterministic raster family of the other codec queries is encoded
    predictively — predictor ``1 + doc_id % 7`` walks all seven Annex H
    predictors across the corpus — and decoded back.

    Contracts pinned per asset: ``exact_match`` is the mode's defining
    property, decode ≡ source samples BIT-FOR-BIT (no DCT, no
    quantization, no color transform); ``pt_matches`` re-encodes with
    point transform 2 and pins decode ≡ (src >> 2) << 2, the spec's
    only lossy knob; ``deep_matches`` re-encodes the 16-BIT widening of
    the raster (precision 16) and pins bit-exactness there too;
    ``arith_matches`` (r15, same round) re-encodes through the
    LOSSLESS-ARITHMETIC frame (SOF11 — the QM coder over Annex H's
    two-dimensional difference contexts) and pins its decode
    bit-for-bit equal to both the source and the Huffman twin;
    ``has_lossless_markers`` asserts the stream is really SOF3 (no DQT
    — lossless has no quantization tables).

    Scale shape: one scan + one mapInPandas — the only Exchange is _spread's id-only repartition; images
    stay single binary cells, parallelism is ACROSS images (the only
    distribution that makes sense for per-asset codecs at 100 TB)."""
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("asset_id", LongType(), False),
            StructField("mode", StringType(), False),
            StructField("width", LongType(), True),
            StructField("height", LongType(), True),
            StructField("predictor", LongType(), False),
            StructField("exact_match", BooleanType(), True),
            StructField("pt_matches", BooleanType(), True),
            StructField("deep_matches", BooleanType(), True),
            StructField("arith_matches", BooleanType(), True),
            StructField("has_lossless_markers", BooleanType(), True),
        ]
    )

    def batches(iterator):
        import numpy as np

        from fintech_lakehouse_spark.functions.jpeg import (
            decode_jpeg_pixels,
            encode_jpeg_lossless,
        )
        from fintech_lakehouse_spark.functions.jpeg_arith import (
            encode_jpeg_lossless_arith,
        )

        for pdf in iterator:
            rows = {k: [] for k in (
                "asset_id", "mode", "width", "height", "predictor",
                "exact_match", "pt_matches", "deep_matches",
                "arith_matches", "has_lossless_markers",
            )}
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 9 + i % 21, 6 + i % 17
                gray = i % 2 == 0
                pred = 1 + i % 7
                xx = np.arange(w)[None, :]
                yy = np.arange(h)[:, None]
                if gray:
                    img = ((xx * 5 + yy * 11 + i) % 256).astype(np.uint8)
                else:
                    img = np.stack(
                        [((xx * 5 + yy * 11 + c * 37 + i) % 256)
                         for c in range(3)],
                        axis=-1,
                    ).astype(np.uint8)
                stream = encode_jpeg_lossless(img, predictor=pred)
                d = decode_jpeg_pixels(stream)
                dpt = decode_jpeg_pixels(
                    encode_jpeg_lossless(img, predictor=pred,
                                         point_transform=2)
                )
                img16 = (img.astype(np.uint16) * 257)  # widen 8→16 bit
                d16 = decode_jpeg_pixels(
                    encode_jpeg_lossless(img16, predictor=pred)
                )
                rows["asset_id"].append(i)
                rows["mode"].append("gray" if gray else "rgb")
                rows["predictor"].append(pred)
                if d is None or d.shape[:2] != (h, w):
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["exact_match"].append(None)
                    rows["pt_matches"].append(None)
                    rows["deep_matches"].append(None)
                    rows["arith_matches"].append(None)
                    rows["has_lossless_markers"].append(None)
                    continue
                rows["width"].append(d.shape[1])
                rows["height"].append(d.shape[0])
                rows["exact_match"].append(bool(np.array_equal(d, img)))
                rows["pt_matches"].append(
                    dpt is not None
                    and bool(np.array_equal(dpt, (img >> 2) << 2))
                )
                rows["deep_matches"].append(
                    d16 is not None and d16.dtype == np.uint16
                    and bool(np.array_equal(d16, img16))
                )
                da = decode_jpeg_pixels(
                    encode_jpeg_lossless_arith(img, predictor=pred)
                )
                rows["arith_matches"].append(
                    da is not None and bool(np.array_equal(da, img))
                )
                rows["has_lossless_markers"].append(
                    b"\xff\xc3" in stream and b"\xff\xdb" not in stream
                )
            yield pd.DataFrame(rows)

    documents = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 150
    )
    return _spread(documents.select("doc_id")).mapInPandas(batches, schema)
