"""Collection operators — higher-order array functions, map columns,
and lateral explode/posexplode.

The array lambda family (transform/filter/exists/forall/aggregate/
zip_with) is the JVM-side alternative to Python UDFs for nested data —
at 100 TB these run inside codegen with zero serialization, which is
exactly why the corpus expresses its hashes/shingles/vector math with
them (functions/portable.py, functions/vector.py). This module covers
the family explicitly as user-facing operators.

Map columns don't hash-compare across engines (entry order is engine
internal), so map queries emit scalar lookups, not raw maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import register_tables, table
from sparksql_server_spark.operators.registry import query


@query(
    "hof_array_lambdas",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(words,
                w -> CAST(length(w) AS VARCHAR)), ',')            AS word_lens,
           coalesce(array_to_string(
                list_filter(words, w -> length(w) > 5), ','), '') AS long_words,
           len(list_filter(words, w -> w LIKE '%a%')) > 0         AS has_a_word,
           len(list_filter(words, w -> length(w) < 20)) = len(words) AS all_short,
           CAST(list_reduce(list_prepend(0, list_transform(words,
                w -> length(w))), (acc, v) -> acc + v) AS INT)    AS total_chars
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part)
""",
)
def hof_array_lambdas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / exists / forall / aggregate over the
    tokenized part name — the full array-lambda family, all codegen.

    Array-valued intermediates are serialized with array_join before
    output: the harness canonicalizer sorts result columns with pandas
    and list cells are unhashable (round-1 err rows)."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("words")
    )
    w = F.col("words")
    return p.select(
        "p_partkey",
        F.array_join(
            F.transform(w, lambda x: F.length(x).cast("string")), ","
        ).alias("word_lens"),
        F.array_join(F.filter(w, lambda x: F.length(x) > 5), ",").alias(
            "long_words"
        ),
        F.exists(w, lambda x: x.like("%a%")).alias("has_a_word"),
        F.forall(w, lambda x: F.length(x) < 20).alias("all_short"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda acc, v: acc + v
        ).alias("total_chars"),
    )


@query(
    "hof_zip_with_sort",
    oracle="""
    SELECT vec_id,
           round(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(range(1, len(embedding) + 1),
                     i -> embedding[i]::DOUBLE
                          * embedding[len(embedding) + 1 - i]::DOUBLE)),
                 (acc, v) -> acc + v), 6)                    AS self_conv,
           round(list_sort(embedding)[len(embedding)]::DOUBLE, 6) AS max_elem,
           round(list_sort(embedding)[1]::DOUBLE, 6)             AS min_elem
    FROM embeddings
""",
)
def hof_zip_with_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zip_with (vector against its own reverse — a self-convolution
    term), reverse, and array_sort/element extremes. Left-to-right
    double accumulation matches the oracle bit-for-bit (see
    functions/vector.py)."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    conv = F.aggregate(
        F.zip_with(
            emb.cast("array<double>"),
            F.reverse(emb).cast("array<double>"),
            lambda x, y: x * y,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    srt = F.array_sort(emb)
    return e.select(
        "vec_id",
        F.round(conv, 6).alias("self_conv"),
        F.round(F.element_at(srt, F.size(emb)).cast("double"), 6).alias("max_elem"),
        F.round(F.element_at(srt, 1).cast("double"), 6).alias("min_elem"),
    )


@query(
    "map_column_ops",
    oracle="""
    SELECT l_returnflag,
           CAST(n_F AS DOUBLE) / (n_O + n_F) AS f_share,
           CAST(n_statuses AS INT) AS n_statuses
    FROM (SELECT l_returnflag,
                 count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS n_F,
                 count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS n_O,
                 count(DISTINCT l_linestatus)                   AS n_statuses
          FROM lineitem GROUP BY l_returnflag)
    ORDER BY l_returnflag
    """,
)
def map_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column (status → count) per group, then look up
    entries with try_element_at — map construction, map_keys
    cardinality, scalar extraction. The oracle computes the same
    scalars without maps (maps themselves can't hash-compare: entry
    order is engine-internal). Missing keys coalesce to 0 on both
    sides (a flag group may carry only one status)."""
    li = table(spark, sf_dir, "lineitem")
    counts = li.groupBy("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))
    mapped = counts.groupBy("l_returnflag").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("l_linestatus", "n")))
        ).alias("status_counts")
    )
    m = F.col("status_counts")
    n_f = F.coalesce(F.try_element_at(m, F.lit("F")), F.lit(0))
    n_o = F.coalesce(F.try_element_at(m, F.lit("O")), F.lit(0))
    return mapped.select(
        "l_returnflag",
        (n_f.cast("double") / (n_o + n_f)).alias("f_share"),
        F.size(F.map_keys(m)).alias("n_statuses"),
    ).orderBy("l_returnflag")


@query(
    "lateral_posexplode",
    oracle="""
    SELECT p_partkey, CAST(i AS INT) AS pos, words[i] AS word
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS words FROM part),
         range(1, 6) t(i)
    WHERE i <= len(words)
""",
)
def lateral_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode as a lateral view: one row per (part, word position).
    Generators run inside the scan stage — no shuffle, output is
    narrow. (Oracle unrolls via an index join; positions 1-based on
    both sides, part names are ≤5 words.)"""
    p = table(spark, sf_dir, "part").select(
        "p_partkey", F.split("p_name", " ").alias("words")
    )
    return (
        p.select("p_partkey", F.posexplode("words").alias("pos0", "word"))
        .select(
            "p_partkey", (F.col("pos0") + 1).cast("int").alias("pos"), "word"
        )
    )


@query(
    "array_set_ops",
    oracle="""
    SELECT o_orderkey,
           array_to_string(list_sort(list_distinct(flags)), ',') AS distinct_flags,
           CAST(len(list_distinct(flags)) AS INT)             AS n_distinct,
           list_contains(flags, 'R')                          AS saw_return
    FROM (SELECT l_orderkey AS o_orderkey, list(l_returnflag) AS flags
          FROM lineitem GROUP BY l_orderkey)
""",
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list → array_distinct / array_sort / array_contains —
    set algebra on grouped arrays (order-insensitive: collected arrays
    are normalized through distinct+sort, then serialized with
    array_join so the pandas canonicalizer never sees a list cell)."""
    li = table(spark, sf_dir, "lineitem")
    g = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.collect_list("l_returnflag").alias("flags")
    )
    return g.select(
        "o_orderkey",
        F.array_join(F.array_sort(F.array_distinct("flags")), ",").alias(
            "distinct_flags"
        ),
        F.size(F.array_distinct("flags")).alias("n_distinct"),
        F.array_contains("flags", "R").alias("saw_return"),
    )
