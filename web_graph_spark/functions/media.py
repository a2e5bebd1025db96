"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image/audio codec libraries are NOT in this container, so the
decode kernels are stubbed: ``decode=fake`` produces a deterministic
tensor derived from the bytes (so the Spark-side plumbing — schema,
batching, partitioning, UDF signatures — is real and tested), and
``decode=strict`` raises NotImplementedError where a codec would run.

At scale: media bytes live in their own parquet column (columnar
pruning keeps them off queries that don't touch them); frame-sample /
resize run per partition with bounded Arrow batch sizes
(spark.sql.execution.arrow.maxRecordsPerBatch) so a partition of
multi-MB blobs doesn't blow executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, media binary, "
                "meta struct<width:int, height:int, duration_ms:int, "
                "mime:string>")

FEATURE_SCHEMA = ("media_id string, kind string, n_bytes long, "
                  "sha string, feat array<float>")


def make_media_df(spark, docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from documents (stand-in for
    real blobs): media bytes = utf-8 of the text, kind by id hash."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"),
                                F.lit("video")),
                        (F.pmod(F.xxhash64(F.col(id_col)), 3) + 1).cast("int"))
    return docs.select(
        F.concat(F.lit("m-"), F.col(id_col).cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.struct(F.lit(64).alias("width"), F.lit(64).alias("height"),
                 (F.length(text_col) * 10).cast("int").alias("duration_ms"),
                 F.lit("application/octet-stream").alias("mime")).alias("meta"))


def _fake_decode(raw: bytes, n: int = 8) -> list[float]:
    """Deterministic feature vector from bytes (codec stand-in)."""
    d = hashlib.blake2b(raw or b"", digest_size=4 * n).digest()
    return [int.from_bytes(d[4 * i:4 * i + 4], "big") / 2**32
            for i in range(n)]


def extract_features(media: DataFrame, mode: str = "fake",
                     feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract per partition (mapInPandas).  mode:
    'fake' = deterministic stand-in; 'strict' = NotImplementedError
    (where a real codec (PIL/ffmpeg) would be called)."""
    if mode not in ("fake", "strict"):
        raise ValueError(mode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "strict":
                raise NotImplementedError(
                    "media codecs are not available in this image; "
                    "use mode='fake' for plumbing tests")
            raws = pdf["media"]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": raws.map(lambda b: len(b) if b is not None else 0),
                "sha": raws.map(lambda b: hashlib.sha1(b or b"").hexdigest()),
                "feat": raws.map(lambda b: _fake_decode(b, feat_dim)),
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode itself stubbed; timestamps are real)."""
    frames = F.sequence(F.lit(0), F.col("meta.duration_ms"),
                        F.lit(every_ms))
    return (media.filter(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ts_ms"))
            .withColumn("frame_ref",
                        F.concat(F.col("media_id"), F.lit("@"),
                                 F.col("frame_ts_ms").cast("string"))))
