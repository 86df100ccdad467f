"""The reference's application queries, DataFrame-native.

These are the Catalyst-optimized formulations of the two real
reference apps (``src/mrapps/wc.go``, ``src/mrapps/indexer.go``) run
over the ``documents`` table. Unlike the opaque-closure facade in
:mod:`mit_map_reduce_spark.mapreduce`, these get map-side partial
aggregation, whole-stage codegen, and parquet column pruning — the
scan reads only ``text``/``doc_id``. The reference ships one
``(word, "1")`` pair per occurrence across its shuffle with no
combiner (``src/mrapps/wc.go:27-30``); Spark's hash aggregate shuffles
one partial count per (partition, word) instead, which is the main
reason this formulation survives 100 TB while the literal port would
not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mit_map_reduce_spark.catalog import load_table, spread
from mit_map_reduce_spark.functions.columns import tokenize_letters


def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count, semantics of reference src/mrapps/wc.go:19-40.

    Case-sensitive, tokens = maximal letter runs, one row per word.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokenize_letters(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def mr_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index, semantics of reference src/mrapps/indexer.go:20-39.

    Per word: number of distinct documents + comma-joined doc list
    sorted ascending (the reference sorts inside reduce because value
    order is unspecified — invariant preserved here by sorting in the
    aggregate).
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        F.col("doc_id"),
        F.explode(F.array_distinct(tokenize_letters(F.col("text")))).alias("word"),
    )
    return words.groupBy("word").agg(
        F.count("*").alias("n_docs"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("doc_list"),
    )


def mr_positional_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional inverted index — the phrase-query extension of
    reference src/mrapps/indexer.go's document index: per (word, doc),
    the ascending 1-based token positions, '|'-joined (what a search
    engine needs to answer "spark shuffle" as a PHRASE, not a bag).

    Map side emits (word, doc, pos) via one ``posexplode`` — the
    reference's map-emit shape with the position carried along; the
    single aggregation sorts positions INSIDE the group (the
    reference's sort-inside-reduce invariant for unspecified value
    order, indexer.go:37) and renders them to a string so the row
    stays driver-hashable. Output is bounded by distinct (word, doc)
    pairs; posting lists are bounded by doc length.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    words = docs.select(
        "doc_id",
        F.posexplode(tokenize_letters(F.col("text"))).alias("pos0", "word"),
    )
    return words.groupBy("word", "doc_id").agg(
        F.count("*").alias("n_occurrences"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.col("pos0") + 1)),
                lambda x: x.cast("string"),
            ),
            "|",
        ).alias("positions"),
    )


def mr_udtf_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``Map``-as-UDTF contract on Spark's NATIVE
    Python UDTF surface (Spark 3.5+; the SURVEY §2a#2 mapping made
    concrete): a table function takes one document row and emits one
    row per token — exactly ``mapf(file, contents) -> [(k, v)]``
    (reference src/mr/worker.go:138) — then plain SQL aggregates, via
    a LATERAL join over the registered view.

    This is the faithful-surface demo: the UDTF runs the SAME Python
    tokenizer as the MapReduce facade (mapreduce/apps.py), so an
    opaque user map function ports verbatim. The Catalyst-native
    ``mr_wordcount`` is the fast path — row-at-a-time Python is the
    price of opaque-UDF semantics, which is why it is the exception
    surface here, not the default.
    """
    from pyspark.sql.functions import udtf

    from mit_map_reduce_spark.mapreduce.apps import tokenize

    @udtf(returnType="word string")
    class SplitWords:
        def eval(self, text: str):
            for w in tokenize(text):
                yield (w,)

    # only the one table this SQL reads: register_views loads all ten
    # catalog tables' schemas per invocation (r15, guide §1.2 — don't
    # compute what you throw away)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("split_words", SplitWords)
    return spark.sql(
        """
        SELECT t.word, count(*) AS cnt
        FROM documents d, LATERAL split_words(d.text) t
        GROUP BY t.word
        """
    )


GREP_PATTERN = r"data \w+ (scan|sort)"


def mr_distributed_grep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed grep — the FIRST example in the original MapReduce
    paper (Dean & Ghemawat 2004, §2.3: "supplied pattern -> emit the
    line"): documents matching a regex, counted per source with the
    earliest matching doc id.

    Pure map-side filter + tiny aggregate: the regex predicate cannot
    push into parquet, but column pruning still holds the scan to
    (text, source, doc_id), and the only exchange carries one partial
    row per (partition, source).
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(GREP_PATTERN))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("doc_id").alias("first_doc_id"),
        )
    )


def mr_secondary_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic MapReduce *secondary sort* pattern: per-key groups
    whose VALUES arrive in a defined order. The reference's reduce
    sees key-sorted but value-unsorted groups (src/mr/worker.go:193
    sorts by key only); classic MR encodes (key, sort-field) composite
    keys plus a custom partitioner/grouper to get ordered values.
    Spark-first that collapses to one aggregation: collect the group,
    ``array_sort`` on a (ts, event_id, ...) struct — deterministic
    total order — and derive order-sensitive outputs (the user's
    event-type journey and first/last timestamps). One shuffle on the
    group key; no window double-sort; order is in-group, never global.
    """
    ev = load_table(spark, sf_dir, "events")
    s = F.struct("ts", "event_id", "event_type")
    grouped = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(s)).alias("arr")
    )
    return grouped.select(
        "user_id",
        F.size("arr").alias("n_events"),
        F.array_join(
            F.transform("arr", lambda x: x["event_type"]), ">"
        ).alias("journey"),
        F.element_at("arr", 1)["ts"].alias("first_ts"),
        F.element_at("arr", -1)["ts"].alias("last_ts"),
    )


def mr_reduce_side_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic MapReduce *reduce-side join* (SURVEY §2c joins row):
    map tags every record with its source relation, the shuffle
    co-locates both relations' records for a key, and reduce stitches
    them — the only way the reference paradigm can join at all (its
    sole inter-record operation is group-by-key,
    src/mr/worker.go:201-210).

    Spark-first the pattern collapses to union-tag + one hash
    aggregate: customer rows carry the segment, order rows carry the
    price, and a single shuffle on the key both "joins" and aggregates
    (conditional aggregates pick each relation's fields back out).
    When the reduce side ALSO aggregates per key — as here — this is a
    legitimately efficient plan even next to native ``df.join``: one
    exchange total, vs join-then-agg's exchange + agg. Customers
    without orders surface with zero counts, i.e. the left-outer
    variant of the pattern for free.
    """
    from mit_map_reduce_spark.functions.columns import money_sum

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k"),
        F.lit("c").alias("tag"),
        F.col("c_mktsegment").alias("seg"),
        F.lit(None).cast("double").alias("price"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.lit("o").alias("tag"),
        F.lit(None).cast("string").alias("seg"),
        F.col("o_totalprice").alias("price"),
    )
    return (
        cust.unionAll(orders)
        .groupBy("k")
        .agg(
            F.max(F.when(F.col("tag") == "c", F.col("seg"))).alias("c_mktsegment"),
            F.count(F.when(F.col("tag") == "o", 1)).alias("n_orders"),
            F.coalesce(money_sum("price", 2), F.lit(0.0)).alias("total_spend"),
        )
        .select(F.col("k").alias("custkey"), "c_mktsegment", "n_orders", "total_spend")
    )


TERA_PARTS = 16  # range partitions in the terasort manifest
TERA_SAMPLE_K = 1024  # fixed boundary-sample size, corpus-independent


def mr_terasort_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TeraSort recipe — MapReduce's canonical global-sort
    benchmark (O'Malley 2008) — as an auditable manifest: SAMPLE the
    key space, cut ``TERA_PARTS`` range boundaries from the sample's
    order statistics, range-assign every key by boundary comparison,
    and emit one manifest row per partition with a contiguity check
    (every partition's min must exceed its predecessor's max — the
    property that makes concatenating per-partition sorted runs a
    total order, with no merge pass).

    Scale honesty: keys are md5 hex (uniform, adversary-proof — the
    reason TeraSort samples rather than trusting the raw
    distribution); the sample is the fixed ``TERA_SAMPLE_K`` keys
    smallest by a SECOND hash (md5 of the key, tie-broken by the key)
    — a deterministic uniform draw both engines pick identically, and
    a TakeOrdered reduction in Spark (per-partition top-K, then a
    K-row merge on the driver — never a global sort). The sample is
    CAPPED at any corpus size, exactly as TeraSort's partitioner
    samples ~1e5 keys; the only ordered window runs over those K
    rows. The full corpus never sorts globally here: each key does
    one broadcast boundary-array comparison, then a pid-keyed
    aggregate. ``repartitionByRange`` does all this internally with a
    nondeterministic reservoir sample — spelling the boundaries out
    is what makes the result engine-reproducible AND gives the skew
    readout (n_rows per partition) a production sort needs anyway.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.md5(F.col("event_id").cast("string")).alias("k"))
    sample = (
        keyed.select("k", F.md5(F.col("k")).alias("s"))
        .orderBy("s", "k")
        .limit(TERA_SAMPLE_K)
        .select("k")
    )
    bkt = sample.select(
        "k", F.ntile(TERA_PARTS).over(W.orderBy("k")).alias("b")
    )
    bounds = (
        bkt.filter(F.col("b") < TERA_PARTS)
        .groupBy("b")
        .agg(F.max("k").alias("upper"))
        .agg(F.array_sort(F.collect_list("upper")).alias("bounds"))
    )
    assigned = keyed.crossJoin(F.broadcast(bounds)).select(
        "k",
        (
            F.lit(1)
            + F.size(F.filter("bounds", lambda b: b < F.col("k")))
        ).alias("pid"),
    )
    manifest = assigned.groupBy("pid").agg(
        F.count("*").alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    w = W.orderBy("pid")
    contiguous = F.coalesce(
        F.lag("max_key").over(w) < F.col("min_key"), F.lit(True)
    )
    return manifest.select(
        "pid", "n_rows", "min_key", "max_key", contiguous.alias("contiguous")
    )


QUERIES = {
    "mr_udtf_wordcount": mr_udtf_wordcount,
    "mr_positional_index": mr_positional_index,
    "mr_terasort_manifest": mr_terasort_manifest,
    "mr_reduce_side_join": mr_reduce_side_join,
    "mr_wordcount": mr_wordcount,
    "mr_inverted_index": mr_inverted_index,
    "mr_distributed_grep": mr_distributed_grep,
    "mr_secondary_sort": mr_secondary_sort,
}

_TOKENS = r"list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '')"

from mit_map_reduce_spark.functions.columns import sql_money_sum as _sms

ORACLES = {
    # The Python tokenizer ([^\W\d_]+ letters) and the oracle's
    # \p{L} split agree on letter-only tokens (pinned by the facade
    # parity tests).
    "mr_udtf_wordcount": r"""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '[^\p{L}]+'), x -> x <> '')) AS word FROM documents)
        GROUP BY word
    """,
    "mr_positional_index": f"""
        WITH words AS (SELECT doc_id, {_TOKENS} AS ws FROM documents),
        pos AS (
            SELECT doc_id, ws[i.i] AS word, CAST(i.i AS INTEGER) AS p
            FROM words, LATERAL (SELECT unnest(range(1, len(ws) + 1)) AS i) i
        )
        SELECT word, doc_id,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               string_agg(CAST(p AS VARCHAR), '|' ORDER BY p) AS positions
        FROM pos GROUP BY word, doc_id
    """,
    "mr_terasort_manifest": f"""
        WITH keyed AS (
            SELECT md5(CAST(event_id AS VARCHAR)) AS k FROM events
        ),
        sample AS (
            SELECT k FROM keyed ORDER BY md5(k), k LIMIT {TERA_SAMPLE_K}
        ),
        bkt AS (
            SELECT k, ntile({TERA_PARTS}) OVER (ORDER BY k) AS b FROM sample
        ),
        bounds AS (
            SELECT max(k) AS upper FROM bkt
            WHERE b < {TERA_PARTS} GROUP BY b
        ),
        assigned AS (
            SELECT keyed.k,
                   1 + (SELECT count(*) FROM bounds
                        WHERE bounds.upper < keyed.k) AS pid
            FROM keyed
        ),
        manifest AS (
            SELECT pid, count(*) AS n_rows, min(k) AS min_key,
                   max(k) AS max_key
            FROM assigned GROUP BY pid
        )
        SELECT CAST(pid AS INTEGER) AS pid, CAST(n_rows AS BIGINT) AS n_rows,
               min_key, max_key,
               coalesce(lag(max_key) OVER (ORDER BY pid) < min_key, TRUE)
                   AS contiguous
        FROM manifest
    """,
    "mr_reduce_side_join": f"""
        SELECT c_custkey AS custkey,
               c_mktsegment,
               CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               coalesce({_sms("o_totalprice")}, 0.0) AS total_spend
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_mktsegment
    """,
    "mr_secondary_sort": """
        SELECT user_id,
               CAST(count(*) AS INTEGER) AS n_events,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS journey,
               min(ts) AS first_ts,
               max(ts) AS last_ts
        FROM events
        GROUP BY user_id
    """,
    "mr_distributed_grep": f"""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_matches,
               min(doc_id) AS first_doc_id
        FROM documents
        WHERE regexp_matches(text, '{GREP_PATTERN}')
        GROUP BY source
    """,
    "mr_wordcount": f"""
        SELECT word, CAST(count(*) AS BIGINT) AS cnt
        FROM (SELECT unnest({_TOKENS}) AS word FROM documents)
        GROUP BY word
    """,
    "mr_inverted_index": f"""
        WITH pairs AS (
            SELECT DISTINCT doc_id, word
            FROM (SELECT doc_id, unnest({_TOKENS}) AS word FROM documents)
        )
        SELECT word,
               CAST(count(*) AS BIGINT) AS n_docs,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_list
        FROM pairs
        GROUP BY word
    """,
}
