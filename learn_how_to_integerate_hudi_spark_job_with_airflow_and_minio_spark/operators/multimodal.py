"""Multimodal (image/audio/video) column plumbing (north-star extension
mandate — SURVEY §2.5).

Design: media payloads are opaque ``binary`` columns with a typed
metadata struct alongside (mime, byte length, checksum). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the Spark-side contract (schema, batch shape,
partitioning) is real and tested; the actual codec calls are STUBBED
because image/audio libraries are not in this container:

- ``decode_stub``      — deterministic fake decoder (bytes → fixed-dim
                         feature vector) so pipelines are testable
                         end-to-end;
- ``decode_unavailable`` — the honest production hook: raises
                         NotImplementedError mentioning the missing
                         codec dependency.

Swapping in a real decoder is a one-argument change to
``extract_features`` — the plumbing does not move.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, byte_len long, checksum string"
)


def to_media_table(
    df: DataFrame, id_col: str, payload_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap any binary-able column as a media table with typed metadata."""
    payload = F.col(payload_col).cast("binary")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.lit(mime).alias("mime"),
        F.length(payload).cast("long").alias("byte_len"),
        F.md5(payload).alias("checksum"),
    )


def decode_stub(payload: bytes) -> list[float]:
    """Deterministic fake decode: FEATURE_DIM floats from byte content.

    Stands in for image-decode→CNN-embed / audio-decode→fbank etc.; keeps
    the Arrow batch path and schema identical to a real decoder.
    Vectorized (numpy over the byte buffer) — the stub should model a
    real decoder's batch-friendly cost profile, not a Python byte loop.
    """
    import numpy as np

    if payload is None:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % FEATURE_DIM
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    acc = arr.reshape(-1, FEATURE_DIM).astype(np.int64).sum(axis=0) % 997
    return (acc / 997.0).tolist()


def decode_unavailable(payload: bytes) -> list[float]:
    raise NotImplementedError(
        "media decoding requires an image/audio codec library (e.g. Pillow/"
        "torchaudio), which is not installed in this environment; inject a "
        "real decoder via extract_features(decoder=...)"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = decode_stub,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas``: each task receives an iterator of pandas batches —
    the decoder runs vectorized per batch, never per-row over Py4J. At
    100 TB this is the only Python stage in the pipeline, and it scales
    with executors × cores, bounded by Arrow batch size
    (``spark.sql.execution.arrow.maxRecordsPerBatch``).
    """

    out_schema = (
        "media_id long, byte_len long, feature array<double>"
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["byte_len"],
                    "feature": pdf["payload"].map(lambda p: decoder(p)),
                }
            )

    return media.mapInPandas(op, schema=out_schema)


def sample_frames(
    media: DataFrame, frame_size: int = 64, stride: int = 128
) -> DataFrame:
    """Frame sampling over opaque payloads: cut each payload into frames
    of ``frame_size`` bytes every ``stride`` bytes (video-keyframe /
    audio-window analog) and emit one row per frame with offset, length,
    and content checksum.

    Arrow-batched ``mapInPandas``; the slicing itself is per-media (as a
    real demuxer would be), the batch boundary keeps the Python exchange
    amortized. Deterministic by construction, so an external engine can
    recompute every frame from the source bytes.
    """
    import hashlib

    import pandas as pd

    def op(batches):
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_idx": [],
                "frame_off": [],
                "frame_len": [],
                "frame_md5": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n = len(payload)
                for idx, off in enumerate(range(0, n, stride)):
                    chunk = payload[off : off + frame_size]
                    if not chunk:
                        break
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["frame_off"].append(off)
                    out["frame_len"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        schema="media_id long, frame_idx long, frame_off long, "
        "frame_len long, frame_md5 string",
    )


def resize_payload(media: DataFrame, target_len: int = 256) -> DataFrame:
    """Resize/downsample an opaque payload to ≤ ``target_len`` bytes by
    stride sampling (image-thumbnail / audio-downsample analog): stride
    = max(1, n // target), keep bytes at offsets 0, stride, 2·stride…

    Arrow-batched ``mapInPandas``; emits the resized length and checksum
    (the resized bytes themselves stay task-side — at 100 TB you write
    them to a sibling media table, not through the driver). Deterministic
    by construction so an external engine can recompute it.
    """
    import hashlib

    import pandas as pd

    def op(batches):
        for pdf in batches:
            out = {"media_id": [], "orig_len": [], "resized_len": [], "resized_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                n = len(payload)
                stride = max(1, n // target_len)
                sampled = payload[::stride][:target_len]
                out["media_id"].append(mid)
                out["orig_len"].append(n)
                out["resized_len"].append(len(sampled))
                out["resized_md5"].append(hashlib.md5(sampled).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(
        op,
        schema="media_id long, orig_len long, resized_len long, resized_md5 string",
    )
