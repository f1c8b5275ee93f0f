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
    oracle=None,  # stub decoder not expressible in SQL — rows-only
    doc="Arrow-batched mapInPandas feature extraction over the payload "
    "column (deterministic stub decoder; real codec injectable) — the "
    "only Python stage, batch-vectorized",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return M.extract_features(_media(spark, sf_dir))
