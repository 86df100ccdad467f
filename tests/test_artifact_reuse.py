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


def test_artifact_keys_track_corpus_content(tmp_path):
    """Regenerating a source table in place must yield a DIFFERENT
    artifact key (round-4 advice: path-only keys aggregate stale bytes
    after the driver rewrites testdata)."""
    import os
    import shutil

    from mit_map_reduce_spark.catalog import corpus_fingerprint, table_path
    from mit_map_reduce_spark.operators.sources_queries import _artifact_dir

    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copy("/root/testdata/sf0.001/orders.parquet", table_path(str(sf), "orders"))
    k1 = _artifact_dir(str(sf), "csv", "orders")
    fp1 = corpus_fingerprint(str(sf), "orders")
    # simulate in-place regeneration: same path, new bytes/mtime
    p = table_path(str(sf), "orders")
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    k2 = _artifact_dir(str(sf), "csv", "orders")
    fp2 = corpus_fingerprint(str(sf), "orders")
    assert fp1 != fp2
    assert k1 != k2
    # unchanged content -> stable key (artifacts still reused)
    assert _artifact_dir(str(sf), "csv", "orders") == k2
