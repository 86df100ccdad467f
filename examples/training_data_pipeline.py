"""A training-data curation pass over the documents table.

Composes the engine's LLM-pipeline operators the way a real corpus
build does: score quality, drop near-duplicates (MinHash LSH +
connected components), keep each cluster's canonical doc, take a
reproducible sample. Everything stays distributed — no collects until
the final preview.

    python examples/training_data_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit_map_reduce_spark.catalog import load_table
from mit_map_reduce_spark.operators.dedup import dedup_connected_components
from mit_map_reduce_spark.operators.text import text_quality
from mit_map_reduce_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("pipeline_example")

    docs = load_table(spark, sf_dir, "documents")
    quality = text_quality(spark, sf_dir)

    # near-dup clusters over the LSH pair graph; keep the cluster min
    clusters = dedup_connected_components(spark, sf_dir)
    drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )

    kept = (
        docs.join(drop, "doc_id", "left_anti")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= 0.4)
    )
    print("kept docs:", kept.count(), "of", docs.count())
    kept.select("doc_id", "lang", "quality").show(5)

    # The one-call version: quality + repetition + benchmark
    # decontamination + exact-dedup canonical + language-balanced
    # sample, as a single composed plan (operators/text.py).
    from mit_map_reduce_spark.operators.text import text_training_mix

    mix = text_training_mix(spark, sf_dir)
    print("training mix rows:", mix.count())
    mix.groupBy("lang").count().orderBy("lang").show()

    # Final step of a real corpus build: PII scrub, then pack the
    # surviving documents into fixed-token-budget training sequences
    # (two-pass distributed prefix sum — operators/text.py, round 4).
    from mit_map_reduce_spark.operators.text import text_pack_sequences

    packed = text_pack_sequences(spark, sf_dir)
    print("packed sequences:", packed.count())
    packed.orderBy("seq_id").show(5)

    # Long documents go the other way: split into overlapping
    # retrieval/context chunks instead of being concatenated.
    from mit_map_reduce_spark.operators.text import text_chunk_overlap

    chunks = text_chunk_overlap(spark, sf_dir)
    print("context chunks:", chunks.count())

    # Tomorrow's crawl lands: check the incoming batch against the
    # corpus built above — exact via the fingerprint store, near via
    # the band-key index (operators/dedup.py, round 4).
    from mit_map_reduce_spark.operators.dedup import dedup_incremental_ingest

    ingest = dedup_incremental_ingest(spark, sf_dir)
    ingest.groupBy("verdict").count().orderBy("verdict").show()

    # Embedding side: quantize to int8 for the ANN serving tier.
    from mit_map_reduce_spark.operators.similarity import embedding_quantize_int8

    quant = embedding_quantize_int8(spark, sf_dir)
    print("quantized vectors:", quant.count())


if __name__ == "__main__":
    main()
