"""Multimodal column plumbing (beyond-reference).

Images / audio / video are opaque ``binary`` columns with typed
metadata. The container has no media libraries, so the *decode* step
is a clearly-marked deterministic stub — but everything Spark-side is
real and tested: the binary column, the Arrow batch path through
``mapInPandas``, the output schema, and the partitioning story
(decode is embarrassingly parallel map-side work; no shuffle).

The synthetic binary payload is ``encode(text, 'utf-8')`` from the
documents table, so the byte lengths — and therefore the stubbed
"decoded" metadata — are reproducible by the SQL oracle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mit_map_reduce_spark.functions.columns import round_half_up
from mit_map_reduce_spark.catalog import load_table

DECODE_SCHEMA = "doc_id bigint, media_type string, width int, height int, n_frames int"


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> (doc_id, source, media_type, content binary).

    In a real pipeline this is the parquet/lance scan of blob columns;
    here the blob is synthesized from text deterministically.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        "source",
        media.alias("media_type"),
        F.encode("text", "utf-8").alias("content"),
    )


def real_decode(content: bytes, media_type: str) -> dict:
    """The real decode hook (PIL / ffmpeg / soundfile live here).

    Deliberately unimplemented in this container — see module
    docstring. The Spark plumbing calls :func:`stub_decode` instead.
    """
    raise NotImplementedError("media codecs are not available in this environment")


def stub_decode(n_bytes: int, media_type: str) -> tuple[int, int, int]:
    """Deterministic fake decode: metadata derived from payload size."""
    width = 64 + n_bytes % 512
    height = 64 + (n_bytes * 7) % 512
    if media_type == "image":
        frames = 1
    elif media_type == "audio":
        frames = n_bytes % 100
    else:
        frames = n_bytes % 240
    return width, height, frames


def mm_decode_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode over the binary column via mapInPandas.

    Each batch arrives as a pandas DataFrame of raw bytes; the stub
    stands in for the image/audio/video codec. Map-side only — the
    plan has no exchange, so it scales linearly with executors.
    """
    assets = _assets(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes = pdf["content"].map(len)
            wh = [
                stub_decode(nb, mt)
                for nb, mt in zip(n_bytes, pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [w for w, _, _ in wh],
                    "height": [h for _, h, _ in wh],
                    "n_frames": [f for _, _, f in wh],
                }
            )

    return assets.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def mm_asset_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup per (source, media_type) — pure SQL side."""
    assets = _assets(spark, sf_dir)
    return assets.groupBy("source", "media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.octet_length("content")).alias("total_bytes"),
        round_half_up(F.avg(F.octet_length("content")), 4).alias("avg_bytes"),
    )


QUERIES = {
    "mm_asset_stats": mm_asset_stats,
    "mm_decode_assets": mm_decode_assets,
}

_MEDIA = """CASE CAST(doc_id % 3 AS INTEGER)
                WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"""

ORACLES = {
    "mm_asset_stats": f"""
        SELECT source, {_MEDIA} AS media_type,
               CAST(count(*) AS BIGINT) AS n_assets,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               floor((avg(octet_length(encode(text)))) * 10000.0 + 0.5) / 10000.0 AS avg_bytes
        FROM documents
        GROUP BY source, {_MEDIA}
    """,
    "mm_decode_assets": f"""
        WITH a AS (
            SELECT doc_id, {_MEDIA} AS media_type,
                   octet_length(encode(text)) AS nb
            FROM documents
        )
        SELECT doc_id, media_type,
               CAST(64 + nb % 512 AS INTEGER) AS width,
               CAST(64 + (nb * 7) % 512 AS INTEGER) AS height,
               CAST(CASE media_type
                    WHEN 'image' THEN 1
                    WHEN 'audio' THEN nb % 100
                    ELSE nb % 240 END AS INTEGER) AS n_frames
        FROM a
    """,
}
