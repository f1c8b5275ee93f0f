"""Driver-gated multimodal-column queries (operators/multimodal.py).

No binary media ships with the testdata, so the media table is built by
treating each document's UTF-8 bytes as an opaque payload — the binary
column, metadata struct, and Arrow-batched decode plumbing are exactly
what a real image/audio table would use (decode itself is stubbed; see
operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from ..session import load_tables
from .catalog import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return M.to_media_table(d, "doc_id", "text", mime="text/plain")


@register(
    "multimodal_meta",
    oracle="""
        SELECT doc_id AS media_id,
               'text/plain' AS mime,
               octet_length(CAST(text AS BLOB)) AS byte_len,
               md5(text) AS checksum
        FROM documents
    """,
    doc="typed metadata over opaque binary payloads: byte length + "
    "checksum computed on the binary column (payload itself excluded "
    "from the compare — blob literals differ across engines)",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _media(spark, sf_dir).select("media_id", "mime", "byte_len", "checksum")


@register(
    "multimodal_features",
    # The stub decoder is deliberately SQL-expressible: feature[d] is the sum
    # of payload bytes at positions ≡ d (mod 8), mod 997, scaled to [0,1).
    # Testdata documents are ASCII-only (asserted in tests), so DuckDB can
    # recompute the byte sums from characters. The quantized integer
    # (value·997 rounded) makes the compare float-exact, and exploding to one
    # (media_id, dim, feature_q) row per dimension keeps array columns out of
    # the gate's canonicalizer.
    oracle="""
        WITH dims AS (SELECT unnest(range(8)) AS dim),
        bytes AS (
            SELECT doc_id, (i - 1) % 8 AS dim, ord(substr(text, i, 1)) AS b
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
                FROM documents
            )
        )
        SELECT d.doc_id AS media_id,
               dims.dim AS dim,
               CAST(COALESCE(SUM(bytes.b), 0) % 997 AS BIGINT) AS feature_q
        FROM documents d
        CROSS JOIN dims
        LEFT JOIN bytes ON bytes.doc_id = d.doc_id AND bytes.dim = dims.dim
        GROUP BY d.doc_id, dims.dim
    """,
    doc="Arrow-batched mapInPandas feature extraction over the payload "
    "column (deterministic stub decoder; real codec injectable) — the "
    "only Python stage, batch-vectorized. Output exploded to one row per "
    "feature dimension with an exact integer contract.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = M.extract_features(_media(spark, sf_dir))
    return feats.select(
        "media_id", F.posexplode("feature").alias("dim", "value")
    ).select(
        "media_id",
        F.col("dim").cast("long").alias("dim"),
        F.round(F.col("value") * 997).cast("long").alias("feature_q"),
    )


@register(
    "multimodal_frames",
    # ASCII testdata ⇒ payload bytes == text chars, so DuckDB recomputes
    # every frame (offset grid, length, md5 of the slice) from the source.
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id, text, length(text) AS n FROM documents
        ),
        offs AS (
            SELECT media_id, text, n, unnest(range(0, n, 128)) AS off FROM m
        )
        SELECT media_id,
               CAST(off / 128 AS BIGINT) AS frame_idx,
               off AS frame_off,
               least(64, n - off) AS frame_len,
               md5(substr(text, CAST(off + 1 AS INT), 64)) AS frame_md5
        FROM offs
        WHERE n - off > 0
    """,
    doc="frame sampling over opaque payloads (video-keyframe / "
    "audio-window analog): 64-byte frame every 128 bytes via "
    "Arrow-batched mapInPandas, one row per frame with offset/length/"
    "checksum — fully recomputable by the oracle",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.sample_frames(_media(spark, sf_dir), frame_size=64, stride=128)


@register(
    "multimodal_resize",
    # stride sampling is exactly recomputable from the source chars
    # (ASCII testdata ⇒ bytes == chars): stride = n // 256 (min 1), keep
    # offsets 0, stride, 2·stride…, at most 256 of them.
    oracle="""
        WITH m AS (
            SELECT doc_id AS media_id, text, length(text) AS n
            FROM documents
            WHERE length(text) > 0
        ),
        s AS (SELECT media_id, text, n, greatest(1, n // 256) AS stride FROM m)
        SELECT media_id,
               n AS orig_len,
               least(256, (n + stride - 1) // stride) AS resized_len,
               md5(array_to_string(
                   [substr(text, CAST(i * stride + 1 AS INT), 1)
                    for i in range(0, least(256, (n + stride - 1) // stride))],
                   '')) AS resized_md5
        FROM s
    """,
    doc="payload resize/downsample (thumbnail/audio-downsample analog): "
    "stride-sample to ≤256 bytes via Arrow-batched mapInPandas, emitting "
    "resized length + checksum — recomputed exactly by the oracle",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.resize_payload(_media(spark, sf_dir), target_len=256)


@register(
    "multimodal_ahash_pairs",
    # Oracle rebuilds the whole chain from characters (ASCII testdata ⇒
    # bytes == chars): per-dim byte sums mod 997 (the proven
    # multimodal_features contract), the integer bit rule
    # q[d]·8 >= Σq, and a brute-force Hamming pair scan — verifying the
    # Spark side's multi-probe candidate generation found EVERY pair.
    oracle="""
        WITH bytes AS (
            SELECT doc_id, (i - 1) % 8 AS dim, ord(substr(text, i, 1)) AS b
            FROM (
                SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
                FROM documents
            )
        ),
        fq AS (
            SELECT doc_id, dim, CAST(COALESCE(SUM(b), 0) % 997 AS BIGINT) AS q
            FROM bytes GROUP BY doc_id, dim
        ),
        qv AS (SELECT doc_id, list(q ORDER BY dim) AS q FROM fq GROUP BY doc_id),
        h AS (
            SELECT doc_id,
                   CAST(list_sum([CASE WHEN q[d + 1] * 8 >= list_sum(q)
                                       THEN (1::BIGINT << d) ELSE 0 END
                                  for d in range(0, 8)]) AS BIGINT) AS h
            FROM qv
        )
        SELECT a.doc_id AS id_1, b.doc_id AS id_2,
               CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
        FROM h a JOIN h b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.h, b.h)) <= 1
    """,
    doc="perceptual-hash (aHash) near-duplicate media pairs at Hamming "
    "<= 1: one bit per decoded feature dimension (integer rule "
    "q[d]*8 >= sum q — no float mean), candidates from one-sided "
    "multi-probe bucketing (exact hash x 9 bit-flip probes), popcount "
    "verify on collisions only — the image-dedup pipeline op, never "
    "all-pairs; oracle brute-forces the full pair set independently",
)
def multimodal_ahash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.ahash_pairs(_media(spark, sf_dir), max_hamming=1)
