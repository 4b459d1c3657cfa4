"""Multimodal columns: binary payloads + typed metadata + Pandas-UDF ops.

LLM-pipeline extension: image/audio/video content is carried as opaque
``binary`` columns with a typed metadata struct; decode/feature-extract/
resize/frame-sample run as Arrow-batched Pandas functions over
``mapInPandas``. The actual codecs (PIL/ffmpeg/soundfile) are NOT in
this container, so the decode step is STUBBED behind an import gate
(:func:`decode_image` raises ``NotImplementedError`` without PIL) — but
the Spark-side plumbing is real and oracle-checked: schemas, Arrow batch
shapes, partition-parallel UDF execution, metadata math.

The media table derives deterministically from ``documents``: payload =
UTF-8 bytes of the text, kind cycles image/audio/video, metadata from
``n_chars`` — so DuckDB can reproduce every derived value, including the
md5 of the binary payload.

Scale: payloads stay opaque end-to-end (no driver collect); features are
computed per Arrow batch inside executors; frame sampling is a pure
column-expression explode — number of output rows bounded by
duration/interval, not by payload size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from aruna_spark.catalog import load_table
from aruna_spark.queries import register

KINDS = ("image", "audio", "video")


def load_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, kind, payload BINARY, format, width, height, duration_ms)."""
    docs = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(kind == "image", "png")
        .when(kind == "audio", "wav")
        .otherwise("mp4")
        .alias("format"),
        F.when(kind == "image", (F.col("n_chars") % 640) + 16)
        .otherwise(F.lit(None).cast("long"))
        .alias("width"),
        F.when(kind == "image", (F.col("n_chars") % 480) + 16)
        .otherwise(F.lit(None).cast("long"))
        .alias("height"),
        F.when(kind != "image", F.col("n_chars") * 40)
        .otherwise(F.lit(None).cast("long"))
        .alias("duration_ms"),
    )


_D_MEDIA = """
    media AS (
      SELECT doc_id AS media_id,
             ['image', 'audio', 'video'][(doc_id % 3 + 1)] AS kind,
             encode(text) AS payload,
             CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                  ELSE 'mp4' END AS format,
             CASE WHEN doc_id % 3 = 0 THEN (n_chars % 640) + 16 END AS width,
             CASE WHEN doc_id % 3 = 0 THEN (n_chars % 480) + 16 END AS height,
             CASE WHEN doc_id % 3 <> 0 THEN n_chars * 40 END AS duration_ms
      FROM documents
    )
"""


# ----------------------------------------------------------- codec stubs
def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real image decode requires PIL, which is not in this container.
    The gate keeps the pipeline importable; swap in PIL at deploy time."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs PIL; payload plumbing is tested without it"
        ) from e
    raise NotImplementedError("wire PIL decode here")


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_md5", StringType()),
        StructField("head_byte", LongType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched Python feature extraction over the binary payloads —
    the exact shape a real embed/decode stage uses (bytes in, features
    out, per-partition)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "payload_md5": [
                        hashlib.md5(bytes(b)).hexdigest() for b in pdf["payload"]
                    ],
                    "head_byte": [
                        int(bytes(b)[0]) if len(b) else -1
                        for b in pdf["payload"]
                    ],
                }
            )
            yield out

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


@register(
    "multimodal_features",
    oracle=f"""
    WITH {_D_MEDIA}
    SELECT media_id, kind, CAST(octet_length(payload) AS BIGINT) AS n_bytes,
           md5(decode(payload)) AS payload_md5,
           CASE WHEN octet_length(payload) > 0
                THEN ascii(substring(decode(payload), 1, 1))
                ELSE -1 END AS head_byte
    FROM media
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary features via real Python mapInPandas, oracle-checked."""
    return extract_features(load_media(spark, sf_dir))


@register(
    "multimodal_frame_sample",
    oracle=f"""
    WITH {_D_MEDIA}
    SELECT media_id,
           CAST(duration_ms // 1000 + 1 AS BIGINT) AS n_frames,
           CAST((duration_ms // 1000) * 1000 AS BIGINT) AS last_offset_ms
    FROM media WHERE kind = 'video'
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling plan for video rows: one frame per second of
    duration — a pure column-expression explode + re-aggregation (the
    decode of each sampled frame would be the PIL/ffmpeg stub)."""
    media = load_media(spark, sf_dir).filter(F.col("kind") == "video")
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), (F.col("duration_ms") / 1000).cast("long") * 1000, F.lit(1000)
            )
        ).alias("offset_ms"),
    )
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.max("offset_ms").alias("last_offset_ms"),
    )


@register(
    "multimodal_resize_plan",
    oracle=f"""
    WITH {_D_MEDIA}
    SELECT media_id, width, height,
           CAST(CASE WHEN width >= height
                THEN 256 ELSE (width * 256) // height END AS BIGINT)
             AS out_width,
           CAST(CASE WHEN width >= height
                THEN (height * 256) // width ELSE 256 END AS BIGINT)
             AS out_height
    FROM media WHERE kind = 'image'
    """,
)
def multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize planning (long side → 256, aspect preserved, integer math);
    the pixel work itself sits behind the PIL stub."""
    img = load_media(spark, sf_dir).filter(F.col("kind") == "image")
    return img.select(
        "media_id",
        "width",
        "height",
        F.expr(
            "CASE WHEN width >= height THEN CAST(256 AS BIGINT) "
            "ELSE width * 256 div height END"
        ).alias("out_width"),
        F.expr(
            "CASE WHEN width >= height THEN height * 256 div width "
            "ELSE CAST(256 AS BIGINT) END"
        ).alias("out_height"),
    )


# ------------------------------------------------ real stdlib codec paths
WAV_RATE = 8000

ROUNDTRIP_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_pixels", LongType()),
        StructField("pixel_md5", StringType()),
        StructField("container_bytes", LongType()),
    ]
)


@register(
    "multimodal_png_roundtrip",
    oracle=f"""
    WITH {_D_MEDIA}
    SELECT media_id, CAST(octet_length(payload) AS BIGINT) AS width,
           CAST(1 AS BIGINT) AS height,
           CAST(octet_length(payload) AS BIGINT) AS n_pixels,
           md5(decode(payload)) AS pixel_md5
    FROM media WHERE kind = 'image'
    """,
)
def multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec path, stdlib-only: payload bytes → 8-bit gray PNG
    (zlib IDAT, CRC-checked chunks, one n×1 scanline so no byte is
    dropped) → decode back → pixel stats.

    The oracle computes the same stats straight from the source bytes, so
    a hash match proves the encode→decode roundtrip is lossless — an
    actual container parse in the executors, not a stub. (JPEG/mp4 stay
    behind the PIL/ffmpeg import gate.) ``container_bytes`` is dropped
    from the oracle row (zlib-version-dependent); tests assert it > 0."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from aruna_spark.ops.codecs import png_decode_gray, png_encode_gray

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pixels = bytes(payload)
                png = png_encode_gray(pixels, len(pixels), 1)
                w2, h2, back = png_decode_gray(png)
                assert back == pixels
                rows.append(
                    (
                        int(mid), w2, h2, w2 * h2,
                        hashlib.md5(back).hexdigest(), len(png),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in ROUNDTRIP_SCHEMA.fields]
            )

    media = load_media(spark, sf_dir).filter(F.col("kind") == "image")
    out = media.select("media_id", "payload").mapInPandas(
        run, ROUNDTRIP_SCHEMA
    )
    return out.select(
        "media_id", "width", "height", "n_pixels", "pixel_md5"
    )


WAV_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("pcm_md5", StringType()),
    ]
)


@register(
    "multimodal_wav_roundtrip",
    oracle=f"""
    WITH {_D_MEDIA}
    SELECT media_id, CAST({WAV_RATE} AS BIGINT) AS sample_rate,
           CAST(octet_length(payload) // 2 AS BIGINT) AS n_samples,
           CAST((octet_length(payload) // 2) * 1000 // {WAV_RATE} AS BIGINT)
             AS duration_ms,
           md5(decode(payload)) AS pcm_md5
    FROM media
    WHERE kind = 'audio' AND octet_length(payload) % 2 = 0
    """,
)
def multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path: payload bytes as PCM16 → RIFF/WAVE container
    → chunk-walking decode → sample stats, verified against the direct
    derivation (same contract as the PNG roundtrip). PCM16 frames are
    2 bytes, so the operator takes the even-length payloads (blob
    truncation is not expressible in the oracle dialect)."""
    from aruna_spark.pyship import ensure_package_shipped

    ensure_package_shipped(spark)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from aruna_spark.ops.codecs import wav_decode_pcm16, wav_encode_pcm16

        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                pcm = bytes(payload)
                rate, back = wav_decode_pcm16(wav_encode_pcm16(pcm, WAV_RATE))
                assert back == pcm
                n = len(back) // 2
                rows.append(
                    (
                        int(mid), rate, n, n * 1000 // rate,
                        hashlib.md5(back).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_SCHEMA.fields]
            )

    media = load_media(spark, sf_dir).filter(
        (F.col("kind") == "audio") & (F.length("payload") % 2 == 0)
    )
    return media.select("media_id", "payload").mapInPandas(run, WAV_SCHEMA)
