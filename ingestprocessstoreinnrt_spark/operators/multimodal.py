"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed through Arrow-batched Pandas plumbing
(mapInPandas) — the shape a 100 TB media pipeline needs even though the
decode libraries aren't in this container.

What's REAL here (and tested): the schema contract (binary payload +
metadata struct), hash-partitioning of media rows, the mapInPandas batch
path (Arrow transfer, per-batch vectorized work, stable output schema),
and a deterministic fake "decode" whose outputs a DuckDB oracle can
reproduce.  What's STUBBED: actual image/audio decoding — decode_media
raises NotImplementedError unless the deterministic fake is requested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.LongType()),
        T.StructField("content_md5_8", T.StringType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
    ]
)


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table from the documents table: payload =
    UTF-8 bytes of the text (an opaque blob as far as the pipeline is
    concerned), typed as image/audio by doc_id parity."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias(
            "media_type"
        ),
        "source",
    )


def decode_media(
    media: DataFrame, use_deterministic_fake: bool = False
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Real decode (PIL/librosa/ffmpeg) is unavailable in this container —
    STUB: raises NotImplementedError.  With use_deterministic_fake=True
    runs the same plumbing with a deterministic payload-derived result
    (length, sha1 prefix, fake dimensions), which is what the tests and
    the oracle check exercise.
    """
    if not use_deterministic_fake:
        raise NotImplementedError(
            "real media decode requires image/audio libraries not present "
            "in this environment; pass use_deterministic_fake=True for the "
            "plumbing-verified deterministic stub"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # one Arrow batch at a time — bounded memory
            payloads = pdf["payload"]
            digest = payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()[:8]
            )
            n = payloads.map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": n,
                    "content_md5_8": digest,
                    # fake dimensions derived from content length — stands
                    # in for decoded width/height deterministically
                    "fake_width": (n % 1920 + 1).astype("int32"),
                    "fake_height": (n % 1080 + 1).astype("int32"),
                }
            )

    # partition by media_id hash: each task decodes an independent slice
    return media.repartition(F.col("media_id")).mapInPandas(
        _decode, schema=DECODED_SCHEMA
    )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate query: documents -> binary media -> mapInPandas decode
    (deterministic fake) -> typed metadata."""
    return decode_media(
        media_from_documents(spark, sf_dir), use_deterministic_fake=True
    )


# DuckDB twin of the deterministic fake (md5 is identical in both engines;
# payload bytes == UTF-8 text bytes, so strlen/md5 over text match)
_DECODE_SQL = """
SELECT
  doc_id AS media_id,
  CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
  strlen(text)::BIGINT AS byte_len,
  substr(md5(text), 1, 8) AS content_md5_8,
  (strlen(text) % 1920 + 1)::INT AS fake_width,
  (strlen(text) % 1080 + 1)::INT AS fake_height
FROM documents
"""

QUERIES = {"multimodal_decode": multimodal_decode}
ORACLE = {"multimodal_decode": _DECODE_SQL}
