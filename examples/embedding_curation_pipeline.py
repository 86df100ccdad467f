"""An embedding-side curation pass over the embeddings table.

Composes the engine's vector operators the way a retrieval/training
build does: semantically dedup the corpus against the trained IVF
cells (SemDeDup), mine hard negatives for contrastive training from
the SAME index, and close with the recall@k report that says whether
the index is still good enough to trust. The quantizer trains once
into the shared centroid artifact — all three stages probe it, none
retrains.

    python examples/embedding_curation_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mit_map_reduce_spark.operators.similarity import (
    ann_recall_report,
    hard_negative_mining,
    semantic_dedup_ivf,
)
from mit_map_reduce_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding_curation_example")

    kept = semantic_dedup_ivf(spark, sf_dir)
    n_total = kept.count()
    n_kept = kept.filter(F.col("kept")).count()
    print(f"SemDeDup: kept {n_kept}/{n_total} vectors "
          f"({n_total - n_kept} semantic duplicates dropped)")

    negs = hard_negative_mining(spark, sf_dir)
    print("hard negatives per query (top ranks):")
    for r in negs.filter(F.col("rank") <= 2).orderBy("query_id", "rank").collect():
        print(f"  q={r.query_id} (label {r.q_label}) -> neg={r.negative_id} "
              f"(label {r.neg_label}) cos={r.cos}")

    rep = ann_recall_report(spark, sf_dir)
    rows = rep.orderBy("query_id").collect()
    mean_recall = sum(r.recall_at_k for r in rows) / len(rows)
    print(f"index health: mean recall@k {mean_recall:.2f} over {len(rows)} queries")
    for r in rows:
        print(f"  q={r.query_id}: {r.n_matched} of top-k found "
              f"(recall {r.recall_at_k})")


if __name__ == "__main__":
    main()
