"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star component (BASELINE.json).  Design for 100 TB of media:

* media rides as a ``binary`` column (from ``spark.read.format("binaryFile")``
  or inline bytes) next to a typed metadata struct — no driver-side bytes;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — per-partition batch processing, the only sane
  shape for Python media libs on executors;
* the actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
  the decode kernel is pluggable: pass ``decoder=`` a real callable in
  production; the default is a clearly-marked deterministic fake
  (header-byte arithmetic) so the Spark-side plumbing — schema,
  partitioning, UDF signature, batch shape — is real and tested.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried beside every media binary column
MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image | audio | video
        T.StructField("format", T.StringType()),       # png, wav, mp4, …
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str, media_type: str) -> DataFrame:
    """``binaryFile`` scan → (path, content, media_meta).

    The scan parallelizes per file; Spark prunes ``content`` when later
    stages only touch metadata.
    """
    df = spark.read.format("binaryFile").load(path)
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        ext.alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("length").alias("size_bytes"),
    )
    return df.select("path", F.col("content"), meta.alias("media_meta"))


def fake_decode(content: bytes) -> dict:
    """Deterministic FAKE decode: derives pseudo-dimensions from header
    bytes.  STUB for PIL/ffmpeg — replace via the ``decoder=`` parameter;
    real decoding is NotImplemented in this container."""
    if content is None or len(content) == 0:
        return {"width": 0, "height": 0, "channels": 0, "mean_intensity": 0.0}
    head = content[:16].ljust(16, b"\0")
    return {
        "width": 16 + head[0] % 240,
        "height": 16 + head[1] % 240,
        "channels": 1 + head[2] % 4,
        "mean_intensity": round(sum(content[:256]) / max(len(content[:256]), 1) / 255.0, 6),
    }


DECODE_SCHEMA = "path string, width int, height int, channels int, mean_intensity double"


def decode_images(
    df: DataFrame,
    *,
    content_col: str = "content",
    path_col: str = "path",
    decoder: Callable[[bytes], dict] = fake_decode,
    batch_schema: str = DECODE_SCHEMA,
) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas`` (real plumbing, pluggable
    kernel).  One output row per input row."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[content_col].map(decoder)
            out = pd.DataFrame(list(decoded))
            out.insert(0, "path", pdf[path_col].values)
            yield out

    return df.mapInPandas(run, schema=batch_schema)


def fake_image_features(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic FAKE feature vector (byte histogram over ``dim``
    buckets, L1-normalized).  STUB for a real vision encoder."""
    counts = [0] * dim
    for b in content[:4096]:
        counts[b % dim] += 1
    total = sum(counts) or 1
    return [round(c / total, 6) for c in counts]


def extract_features(
    df: DataFrame,
    *,
    content_col: str = "content",
    path_col: str = "path",
    dim: int = 8,
    featurizer: Callable[[bytes], list] | None = None,
) -> DataFrame:
    """binary → embedding column (array<double>), Arrow-batched."""
    fn = featurizer or (lambda b: fake_image_features(b, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"path": pdf[path_col].values, "features": pdf[content_col].map(fn)}
            )

    return df.mapInPandas(run, schema="path string, features array<double>")


def frame_sample_plan(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    duration_col: str = "media_meta.duration_ms",
) -> DataFrame:
    """Video → one row per sampled frame timestamp (pure plan, no decode):
    ``explode(sequence(0, duration, step))``.  The downstream frame decode
    is a ``mapInPandas`` with a seek-capable decoder (stubbed here)."""
    return df.withColumn(
        "frame_ms",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col(duration_col), F.lit(0)),
                F.lit(every_ms),
            )
        ),
    )


def resize_images(
    df: DataFrame,
    *,
    content_col: str = "content",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Resize stage: schema/plumbing real, kernel NotImplemented without a
    codec library."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires a codec library (PIL) not present in this "
            "container; inject a real kernel in production"
        )
        yield  # pragma: no cover

    return df.mapInPandas(run, schema=df.schema)
