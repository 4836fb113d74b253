"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode/feature-extraction libraries (PIL/ffmpeg/librosa) are NOT
in this container, so the decode step is STUBBED behind a
deterministic fake (``fake_decode=True``, default) or a clearly-marked
NotImplementedError. Everything Spark-side — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested; a production
deployment swaps ``_decode_real`` in without touching the plan.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("checksum", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "fake/blob"
) -> DataFrame:
    """Manufacture a typed binary column from text (the sandbox has no
    real media files); preserves the production schema exactly."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _decode_real(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "real media decode requires PIL/ffmpeg/librosa — not available in "
        "this container; deploy with fake_decode=False and the decoder lib"
    )


def _decode_fake(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in: md5-derived pseudo-features."""
    h = hashlib.md5(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(
    media: DataFrame, dim: int = 8, fake_decode: bool = True
) -> DataFrame:
    """Decode + featurize via mapInPandas. Batch shape: one Arrow
    batch of (media_id, payload) rows in, one batch of feature rows
    out — the decode loop is per element but the frame assembly and
    transfer are columnar."""

    decode = _decode_fake if fake_decode else (lambda p, dim=dim: _decode_real(p))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(p, dim) if fake_decode else decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "checksum": pdf["payload"].map(
                        lambda p: hashlib.md5(p).hexdigest()
                    ),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(_run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
    ]
)


def frame_sample(
    media: DataFrame, n_frames: int = 4, fake_decode: bool = True
) -> DataFrame:
    """Video/audio frame sampling: payload -> n evenly-spaced frames.
    Real decode (ffmpeg keyframe extraction) is stubbed; the
    deterministic fake slices the byte payload into n evenly-spaced
    windows — the Spark-side shape (explode to one row per frame,
    typed binary column, batch plumbing) is exactly production's."""
    if not fake_decode:
        raise NotImplementedError(
            "real frame sampling requires ffmpeg — not in this container"
        )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, sizes = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = max(1, len(payload) // n_frames)
                for j in range(n_frames):
                    fr = bytes(payload[j * n : (j + 1) * n])
                    if not fr:
                        break
                    ids.append(mid)
                    idxs.append(j)
                    frames.append(fr)
                    sizes.append(len(fr))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": pd.Series(frames, dtype="object"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                }
            )

    return media.select("media_id", "payload").mapInPandas(_run, FRAME_SCHEMA)


def resize_media(
    media: DataFrame, target_bytes: int = 64, fake_decode: bool = True
) -> DataFrame:
    """Image resize: payload -> fixed-size representation. Real decode
    (PIL thumbnail) is stubbed; the deterministic fake truncates/pads
    the payload to ``target_bytes`` — schema and batch shape are
    production's."""
    if not fake_decode:
        raise NotImplementedError(
            "real resize requires PIL — not in this container"
        )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                bytes(p[:target_bytes]).ljust(target_bytes, b"\0")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pd.Series(resized, dtype="object"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series(
                        [len(r) for r in resized], dtype="int64"
                    ),
                }
            )

    return media.select(
        "media_id", "payload", "media_type"
    ).mapInPandas(_run, MEDIA_SCHEMA)
