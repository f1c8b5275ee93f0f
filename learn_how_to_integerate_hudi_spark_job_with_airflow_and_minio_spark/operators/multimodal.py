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


def ahash_pairs(media: DataFrame, max_hamming: int = 1) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over media payloads — the
    image-dedup pipeline op (aHash: one bit per feature dimension, set
    when that dimension clears the mean; near-dups = small Hamming
    distance between hashes).

    Runs on the decoded feature vectors (stub decoder here; a real
    image pipeline swaps in CNN features or 8×8 grayscale means — the
    hash/banding algebra is identical). The bit rule is INTEGER-exact:
    bit d = q[d]·DIM ≥ Σq avoids any float mean.

    Scale shape: candidates come from multi-probe bucketing, never
    all-pairs — each item posts its hash plus every hash within
    ``max_hamming`` bit-flips (Σ C(DIM,i) probes), pairs equi-join on
    the probe key, and the exact popcount verifies. At 100 TB the
    shuffle carries (probe, id) pairs; the verify touches only
    collisions. ``max_hamming`` ≤ 2 supported (probe count stays
    1 + DIM + C(DIM,2)).
    """
    return ahash_pairs_from_hashes(ahash_hashes(media), max_hamming)


def ahash_hashes(media: DataFrame) -> DataFrame:
    """The signature stage of :func:`ahash_pairs`, separated so a
    streaming feed can maintain a PERSISTED ``(media_id, ahash)`` index
    per micro-batch (foreachBatch upsert) and query pairs from it —
    decode + hash cost is paid once per item ever, not per query."""
    # zero-length payloads carry no perceptual content and would all
    # hash identically (every dimension ties the mean) — exclude them
    # rather than emit a clique of meaningless "duplicates"
    feats = extract_features(media.where(F.col("byte_len") > 0))
    q = F.transform("feature", lambda x: F.round(x * 997).cast("long"))
    total = F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x)
    bit_terms = [
        F.when(
            F.element_at(F.col("_q"), d + 1) * FEATURE_DIM >= F.col("_total"),
            F.lit(1 << d).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        for d in range(FEATURE_DIM)
    ]
    h = bit_terms[0]
    for term in bit_terms[1:]:
        h = h + term
    return (
        feats.withColumn("_q", q)
        .withColumn("_total", total)
        .select("media_id", h.alias("_h"))
    )


def ahash_pairs_from_hashes(
    hashes: DataFrame, max_hamming: int = 1
) -> DataFrame:
    """Pair stage of :func:`ahash_pairs` over a precomputed
    ``(media_id, _h)`` hash set (see :func:`ahash_hashes`)."""
    if max_hamming > 2:
        raise ValueError("max_hamming > 2 needs banded multi-index, not probes")
    flips = [0] + [1 << i for i in range(FEATURE_DIM)]
    if max_hamming >= 2:
        flips += [
            (1 << i) | (1 << j)
            for i in range(FEATURE_DIM)
            for j in range(i + 1, FEATURE_DIM)
        ]
    masks = F.array(*[F.lit(m).cast("long") for m in flips])
    probes = hashes.select(
        "media_id",
        "_h",
        F.explode(F.transform(masks, lambda m: F.col("_h").bitwiseXOR(m))).alias(
            "_probe"
        ),
    )
    # XOR symmetry makes one-sided probing complete: x↔y within
    # max_hamming ⟺ y's probe set contains x's exact hash — so the
    # exact side stays unexploded (half the shuffle of probing both).
    # No post-filter and no distinct are needed: a._h == b._probe pins
    # a._h XOR b._h to one of the probe masks (all popcount ≤
    # max_hamming by construction), and XOR injectivity means each pair
    # matches via EXACTLY one mask — a distinct here would be a full
    # extra shuffle of the pair set for zero effect.
    a, b = hashes.alias("a"), probes.alias("b")
    hamming = F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
    return a.join(
        b,
        (F.col("a._h") == F.col("b._probe"))
        & (F.col("a.media_id") < F.col("b.media_id")),
    ).select(
        F.col("a.media_id").alias("id_1"),
        F.col("b.media_id").alias("id_2"),
        hamming.cast("int").alias("hamming"),
    )
