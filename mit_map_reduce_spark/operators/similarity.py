"""Similarity search over the ``embeddings`` table (beyond-reference).

Two paths, as a large-scale pipeline needs both:

- brute-force top-k: broadcast the (small) query set against the full
  corpus — one scan, no shuffle of the corpus, per-query top-k via a
  window. Exact; cost O(|corpus| * |queries|).
- LSH-bucketed top-k: random-hyperplane signatures bucket the corpus;
  candidates are bucket-mates only. The corpus is scanned once to
  compute signatures, then the search is an equi-join on the bucket
  key — this is the plan shape that survives a 100 TB corpus, at the
  price of approximate recall.

Hyperplanes are derived from md5 hex digits (see functions.columns.
hex_digit_val) instead of an RNG so the DuckDB oracle reproduces them
exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mit_map_reduce_spark.catalog import load_table, spread
from mit_map_reduce_spark.functions.columns import round_half_up, dot_product, vec_norm

TOP_K = 5
N_PLANES = 4  # 2^4 = 16 buckets
DIM = 64
QUERY_FILTER = "vec_id % 100 = 0"  # deterministic small query set


def _emb_with_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return emb.select("vec_id", "embedding", vec_norm(F.col("embedding")).alias("nrm"))


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id % 100 == 0)."""
    emb = _emb_with_norm(spark, sf_dir)
    queries = emb.filter(F.expr(QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    pairs = emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_product(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("c"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", round_half_up("c", 4).alias("cos"))
    )


def _plane(h: int) -> list[float]:
    """Hyperplane h: component j = hexval(md5(h || '_' || j)[0]) - 7.5.

    Derived from indices only — plane constants, not data — so they
    are computed driver-side (hashlib md5 == Spark md5 == DuckDB md5
    on the same strings) and embedded as literals.
    """
    import hashlib

    return [
        int(hashlib.md5(f"{h}_{j}".encode()).hexdigest()[0], 16) - 7.5
        for j in range(DIM)
    ]


def _signatures(emb: DataFrame, spark: SparkSession) -> DataFrame:
    """(vec_id, bucket): bucket = concat of hyperplane signs.

    Pure map-side projection: each sign is a fold of the embedding
    against a literal plane vector. The earlier formulation
    (posexplode + broadcast join + two aggregations) shuffled a
    (vec_id, h, partial-dot) stream; hyperplanes being constants, no
    shuffle is needed at all.
    """
    del spark  # kept for signature compatibility

    def sign(h: int):
        plane = F.array(*[F.lit(p) for p in _plane(h)])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda x, p: x.cast("double") * p),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    bucket = F.concat(*[sign(h) for h in range(N_PLANES)])
    return emb.select("vec_id", bucket.alias("bucket"))


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket."""
    emb = _emb_with_norm(spark, sf_dir)
    sig = _signatures(emb, spark)
    embs = emb.join(sig, "vec_id")
    queries = embs.filter(F.expr(QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    cand = embs.join(
        F.broadcast(queries),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_product(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("c"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", round_half_up("c", 4).alias("cos"))
    )


#: IVF coarse quantizer: seed vectors picked by a fixed predicate (no
#: k-means iterations — deterministic, so the oracle reproduces cells
#: exactly; in production swap for trained centroids, the plan shape is
#: identical). Disjoint from the query set (% 100 == 0).
CENTROID_FILTER = "vec_id % 50 = 1"
N_PROBE = 2


def _centroid_scores(embs: DataFrame) -> DataFrame:
    """(vec_id, cent_id, c): cosine of every vector to every centroid.

    Centroids broadcast (they are ~n/50 rows); the corpus is scanned
    once, map-side — the O(n * k) assignment pass of IVF-Flat.
    """
    cents = embs.filter(F.expr(CENTROID_FILTER)).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    return embs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cent_id",
        (dot_product(F.col("embedding"), F.col("c_emb")) / (F.col("nrm") * F.col("c_nrm"))).alias("c"),
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat top-k: assign every vector to its nearest centroid
    (cell); probe only the ``N_PROBE`` cells nearest each query.

    The inverted-file structure is the (cell -> vectors) partitioning;
    search is an equi-join on the cell key — like the LSH path, the
    corpus never cross-joins itself. Tie-breaks (equal cosine) go to
    the lower centroid id in both engines.
    """
    emb = _emb_with_norm(spark, sf_dir)
    scores = _centroid_scores(emb)
    w_assign = W.partitionBy("vec_id").orderBy(F.col("c").desc(), "cent_id")
    assign = (
        scores.withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("cell"))
    )
    queries = emb.filter(F.expr(QUERY_FILTER)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    probe = (
        scores.filter(F.expr(QUERY_FILTER))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= N_PROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("cent_id").alias("cell"))
    )
    corpus = emb.join(assign, "vec_id")
    cand = corpus.join(F.broadcast(probe), "cell").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = cand.join(F.broadcast(queries), "query_id").select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (dot_product(F.col("q_emb"), F.col("embedding")) / (F.col("q_nrm") * F.col("nrm"))).alias("c"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("c").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", round_half_up("c", 4).alias("cos"))
    )


QUERIES = {
    "sim_ann_bruteforce_topk": ann_bruteforce_topk,
    "sim_ann_lsh_topk": ann_lsh_topk,
    "sim_ann_ivf_topk": ann_ivf_topk,
}

_DOT = """list_sum(list_transform(range(1, {dim1}),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"""
_NRM_CTE = """
    nrm AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
        FROM embeddings
    )
"""

ORACLES = {
    "sim_ann_bruteforce_topk": f"""
        WITH {_NRM_CTE},
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_DOT.format(dim1=DIM + 1)} / (q.nrm * c.nrm) AS c
            FROM nrm q JOIN nrm c ON q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
                   floor((c) * 10000.0 + 0.5) / 10000.0 AS cos
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
    """,
    "sim_ann_ivf_topk": f"""
        WITH {_NRM_CTE},
        cscore AS (
            SELECT v.vec_id, ct.vec_id AS cent_id,
                   list_sum(list_transform(range(1, {DIM + 1}),
                        i -> CAST(v.embedding[i] AS DOUBLE) * CAST(ct.embedding[i] AS DOUBLE)))
                       / (v.nrm * ct.nrm) AS c
            FROM nrm v JOIN nrm ct ON ct.vec_id % 50 = 1
        ),
        assign AS (
            SELECT vec_id, cent_id AS cell FROM (
                SELECT vec_id, cent_id,
                       row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
                FROM cscore
            ) WHERE rn = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, cent_id AS cell FROM (
                SELECT vec_id, cent_id,
                       row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, cent_id) AS rn
                FROM cscore WHERE vec_id % 100 = 0
            ) WHERE rn <= {N_PROBE}
        ),
        scored AS (
            SELECT p.query_id, a.vec_id AS neighbor_id,
                   {_DOT.format(dim1=DIM + 1)} / (q.nrm * c.nrm) AS c
            FROM probe p
            JOIN assign a ON a.cell = p.cell AND a.vec_id <> p.query_id
            JOIN nrm q ON q.vec_id = p.query_id
            JOIN nrm c ON c.vec_id = a.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
                   floor((c) * 10000.0 + 0.5) / 10000.0 AS cos
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
    """,
    "sim_ann_lsh_topk": f"""
        WITH {_NRM_CTE},
        planes AS (
            SELECT t.h, u.j,
                   CAST(strpos('0123456789abcdef',
                        substr(md5(CAST(t.h AS VARCHAR) || '_' || CAST(u.j AS VARCHAR)), 1, 1)) - 1
                        AS DOUBLE) - 7.5 AS p
            FROM range({N_PLANES}) t(h) CROSS JOIN range({DIM}) u(j)
        ),
        comps AS (
            SELECT vec_id, j - 1 AS j, CAST(x AS DOUBLE) AS x
            FROM (SELECT vec_id, unnest(embedding) AS x,
                         generate_subscripts(embedding, 1) AS j
                  FROM embeddings)
        ),
        dots AS (
            SELECT vec_id, h, sum(x * p) AS dot
            FROM comps JOIN planes ON comps.j = planes.j
            GROUP BY vec_id, h
        ),
        sig AS (
            SELECT vec_id,
                   string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY h) AS bucket
            FROM dots GROUP BY vec_id
        ),
        embs AS (SELECT nrm.*, sig.bucket FROM nrm JOIN sig USING (vec_id)),
        scored AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   {_DOT.format(dim1=DIM + 1)} / (q.nrm * c.nrm) AS c
            FROM embs q JOIN embs c
              ON q.vec_id % 100 = 0 AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS INTEGER) AS rank,
                   floor((c) * 10000.0 + 0.5) / 10000.0 AS cos
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= {TOP_K}
    """,
}
