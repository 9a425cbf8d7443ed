"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode/feature
steps are deterministic fakes clearly marked as stubs — but the
Spark-side plumbing (schemas, batch iteration, partition-size control,
UDF signatures) is real and tested. Swapping ``_fake_decode`` for a
PIL/libav call is the only change needed on a real cluster.

Design notes for 100 TB:
- media bytes stay in one ``binary`` column; metadata (width/height/
  duration) lives in sibling scalar columns so filters prune without
  touching payloads (Parquet column pruning).
- ``mapInPandas`` streams Arrow batches; ``spark.sql.execution.arrow.
  maxRecordsPerBatch`` bounds executor memory for fat rows.
- feature vectors come back as ``array<float>`` ready for the
  similarity operators.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)

FEATURE_DIM = 16


def synth_media_assets(asset_catalog: DataFrame) -> DataFrame:
    """Attach a deterministic fake binary payload + metadata to the
    asset catalog (payload = repeated md5 bytes of the ref; sizes
    derived from size_bytes). Stands in for reading real object-store
    blobs."""
    ref = F.col("media_ref")
    payload = F.encode(F.sha2(ref, 256), "utf-8")  # deterministic 64-byte blob
    return asset_catalog.select(
        "media_ref",
        "media_kind",
        payload.alias("payload"),
        F.when(F.col("media_kind") == "image",
               (F.pmod(F.xxhash64(ref, F.lit("w")), F.lit(1920)) + 16).cast("int"))
        .alias("width"),
        F.when(F.col("media_kind") == "image",
               (F.pmod(F.xxhash64(ref, F.lit("h")), F.lit(1080)) + 16).cast("int"))
        .alias("height"),
        F.when(F.col("media_kind") == "audio",
               (F.pmod(F.xxhash64(ref, F.lit("d")), F.lit(600_000)) + 1000).cast("int"))
        .alias("duration_ms"),
    )


def _fake_decode(payload: bytes, kind: str) -> np.ndarray | None:
    """STUB — deterministic stand-in for a real decoder.

    Real implementation would be: PIL.Image.open for images, soundfile/
    libav for audio, frame sampling for video. Here: a fixed-dim
    feature derived from the payload hash so the pipeline is testable
    end-to-end without media libs. Raises nothing; returns None for
    empty payloads (decode failure path).
    """
    if payload is None or len(payload) == 0:
        return None
    digest = hashlib.sha256(bytes(payload) + kind.encode()).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return arr / 65535.0


def extract_features(assets: DataFrame) -> DataFrame:
    """Decode + feature-extract every asset via Arrow-batched
    ``mapInPandas`` (batch-at-a-time, vectorized assembly)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            oks = []
            for payload, kind in zip(pdf["payload"], pdf["media_kind"]):
                vec = _fake_decode(payload, kind or "")
                if vec is None:
                    feats.append(None)
                    oks.append(False)
                else:
                    feats.append(vec.tolist())
                    oks.append(True)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(assets: DataFrame, max_side: int = 256) -> DataFrame:
    """STUB resize: computes the real target geometry (aspect-preserving
    clamp to ``max_side``) as Column math; the pixel work would happen
    in the decode UDF on a real cluster. Keeps plumbing + geometry
    logic testable."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return assets.withColumn(
        "resized_width", F.ceil(F.col("width") * scale).cast("int")
    ).withColumn("resized_height", F.ceil(F.col("height") * scale).cast("int"))


def frame_windows(
    assets: DataFrame,
    ref_col: str = "media_ref",
    duration_col: str = "duration_ms",
    every_ms: int = 5000,
) -> DataFrame:
    """Frame/window sampling plumbing for time-based media: one row per
    fixed-width sampling window of each asset — ``(ref, frame_idx,
    t_start_ms, t_end_ms)`` with the final window clamped to the
    asset's duration. This is the REAL part of video frame sampling
    (which timestamps to decode, how many rows fan out, how the work
    partitions); the pixel/waveform decode of each window stays behind
    the ``_fake_decode`` stub like every other decode in this module.

    Pure Column expressions: ``posexplode(sequence(...))`` fans out
    JVM-side — no Python, no shuffle; the row count is
    ceil(duration/every_ms) per asset. Null/zero durations produce no
    rows (nothing to sample)."""
    d = F.col(duration_col).cast("long")
    seq = F.sequence(
        F.lit(0).cast("long"), d - 1, F.lit(every_ms).cast("long")
    )
    return (
        assets.where(d > 0)
        .select(
            F.col(ref_col),
            d.alias("_dur"),
            F.posexplode(seq).alias("frame_idx", "t_start_ms"),
        )
        .select(
            ref_col,
            "frame_idx",
            "t_start_ms",
            F.least(
                F.col("t_start_ms") + every_ms, F.col("_dur")
            ).alias("t_end_ms"),
        )
    )
