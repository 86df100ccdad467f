"""Second-invocation determinism for artifact-backed queries.

Several queries materialize a reusable side artifact on first use (IVF
centroids, bucketed warehouse tables, source-format round-trip copies)
or probe session-shared caches (normed embeddings, shingle arrays,
SimHash fingerprints). The driver and bench call each query more than
once across a round, so the SECOND invocation — the one that hits the
artifact/cache instead of building it — must produce byte-identical
results. A stale or half-keyed artifact shows up here as a diff.
"""

import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()

ARTIFACT_BACKED = [
    "sim_ann_ivf_topk",  # parquet centroid artifact
    "rel_bucketed_join_revenue",  # bucketed saveAsTable pair
    "src_csv_roundtrip_orders",  # csv scratch copy
    "src_partitioned_pruning_events",  # partitioned scratch copy
    "dedup_simhash_band_pairs",  # shared_persist fingerprint cache
    "sketch_cms_heavy_hitters",  # pure recompute (control)
]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("name", ARTIFACT_BACKED)
def test_second_invocation_identical(spark, sf_dir, name):
    first = _rows(QUERIES[name](spark, sf_dir))
    second = _rows(QUERIES[name](spark, sf_dir))
    assert first == second
    assert len(first) > 0
