"""Multimodal (image/audio/video) column support.

Design: media lives as opaque ``binary`` payload columns + typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas iterators via ``mapInPandas`` — the only operator
family in this engine that leaves the JVM, because media codecs are native
libraries. The Spark-side contract (schema, batching, partitioning) is real
and tested; the decoder itself is a deterministic stand-in because no media
libraries exist in this container (SURVEY: stub the decode step, keep the
plumbing real).

At 100 TB: payloads stay columnar in parquet, mapInPandas streams
Arrow batches (no per-row pickling), partition sizing is governed by
spark.sql.files.maxPartitionBytes so a partition of payloads fits executor
memory, and feature extraction is embarrassingly parallel (no shuffle).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)


def decode_batch(payloads: "list[bytes]", n_features: int) -> "list[list[float]]":
    """Deterministic fake decoder: byte-histogram features.

    REAL IMPLEMENTATION POINT: swap this for PIL/librosa/ffmpeg decoding —
    signature (batch of bytes) -> (batch of feature vectors) is unchanged.
    """
    out = []
    for p in payloads:
        if p is None:
            out.append(None)
            continue
        buckets = [0] * n_features
        for b in p:
            buckets[b % n_features] += 1
        total = max(len(p), 1)
        # round half AWAY from zero (floor(x+0.5) on the 1e6 scale), not
        # Python's banker's round: DuckDB/Spark SQL round() are half-away,
        # and matching them keeps the feature values oracle-reproducible
        # (ties are real: c/total = 1/128 has a 7th decimal digit of 5)
        out.append([math.floor(c / total * 1e6 + 0.5) / 1e6 for c in buckets])
    return out


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, n_features: int = 8
) -> DataFrame:
    """binary payload → ``features array<float>`` via mapInPandas
    (Arrow-batched; one Python roundtrip per batch, not per row)."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("n_bytes", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            payloads = list(pdf[payload_col])
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "features": decode_batch(payloads, n_features),
                }
            )

    return df.mapInPandas(run, schema)


def frame_sample(
    df: DataFrame, id_col: str, payload_col: str, every_n_bytes: int = 64
) -> DataFrame:
    """'Frame sampling' on the stand-in codec: emit one row per sampled
    offset (models video → frames explosion; output is a new row-per-frame
    relation, the shape downstream vision models consume)."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("frame_no", LongType()),
            StructField("offset", LongType()),
            StructField("frame_byte", LongType()),
        ]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd

        for pdf in batches:
            ids, frames, offsets, vals = [], [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for f, off in enumerate(range(0, len(p), every_n_bytes)):
                    ids.append(i)
                    frames.append(f)
                    offsets.append(off)
                    vals.append(p[off])
            yield pd.DataFrame(
                {id_col: ids, "frame_no": frames, "offset": offsets, "frame_byte": vals}
            )

    return df.mapInPandas(run, schema)


def audio_window_energy(
    df: DataFrame, id_col: str, payload_col: str, window: int = 64
) -> DataFrame:
    """Windowed audio energy over a binary payload treated as unsigned
    8-bit PCM: one row per ``window``-sample window with n_samples, peak,
    RMS and mean level. Arrow-batched mapInPandas, no shuffle — at scale
    this is the per-clip feature pass of an audio-curation pipeline.

    REAL IMPLEMENTATION POINT: swap the byte interpretation for a real
    codec (soundfile/librosa) — the (payload) -> (windows of samples)
    contract is unchanged. Deterministic byte math keeps this stub
    oracle-checkable (DuckDB reproduces it with ord(substr(...)))."""
    from pyspark.sql.types import DoubleType, IntegerType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("window_idx", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("peak", LongType()),
            StructField("rms", DoubleType()),
            StructField("mean_level", DoubleType()),
        ]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import math

        import pandas as pd

        for pdf in batches:
            rows = []
            for vid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for w in range((len(p) + window - 1) // window):
                    s = p[w * window : (w + 1) * window]
                    n = len(s)
                    rows.append(
                        (
                            vid,
                            w,
                            n,
                            max(s),
                            round(math.sqrt(sum(x * x for x in s) / n), 6),
                            round(sum(s) / n, 6),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "window_idx", "n_samples", "peak", "rms", "mean_level"]
            )

    return df.mapInPandas(run, schema)


def image_resize_pool(
    df: DataFrame, id_col: str, payload_col: str, width: int = 32, factor: int = 2
) -> DataFrame:
    """2D average-pool "resize" over a binary payload laid out as a
    ``width``-pixel-wide 8-bit grayscale image (rows = len // width): each
    ``factor x factor`` block becomes one output pixel (integer-sum mean).
    One row per image with the pooled pixel array + output dims —
    Arrow-batched mapInPandas, no shuffle; the downsample every vision
    pipeline runs before feature extraction.

    REAL IMPLEMENTATION POINT: swap the byte layout for a real decoder
    (PIL.Image.open -> numpy) — the (payload) -> (H x W array -> pooled
    array) contract is unchanged. Integer block sums keep the stub
    oracle-checkable."""
    from pyspark.sql.types import ArrayType, DoubleType, IntegerType

    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("in_w", IntegerType()),
            StructField("in_h", IntegerType()),
            StructField("out_w", IntegerType()),
            StructField("out_h", IntegerType()),
            StructField("pooled", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator["object"]) -> Iterator["object"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for vid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                h = len(p) // width
                if h < factor:
                    continue
                img = np.frombuffer(p[: h * width], dtype=np.uint8).reshape(h, width)
                oh, ow = h // factor, width // factor
                img = img[: oh * factor, : ow * factor].astype(np.int64)
                pooled = (
                    img.reshape(oh, factor, ow, factor).sum(axis=(1, 3))
                    / float(factor * factor)
                ).round(6)
                rows.append((vid, width, h, ow, oh, [float(x) for x in pooled.ravel()]))
            yield pd.DataFrame(
                rows, columns=[id_col, "in_w", "in_h", "out_w", "out_h", "pooled"]
            )

    return df.mapInPandas(run, schema)
