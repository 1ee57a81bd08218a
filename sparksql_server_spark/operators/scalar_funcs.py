"""Scalar-function families — string, date, math, array, JSON.

All JVM-side built-ins (whole-stage codegen; no Python in the row path).
DuckDB dialect mapping is per-query in the oracle strings:
  substring/substr, datediff ↔ date_diff('day', …), size ↔ len,
  element_at ↔ 1-based [] indexing, get_json_object ↔ json_extract_string,
  floor → BIGINT (Spark) vs DOUBLE (DuckDB) → cast both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparksql_server_spark.catalog import table
from sparksql_server_spark.operators.registry import query


@query(
    "str_funcs",
    oracle="""
    SELECT p_partkey,
           substr(p_name, 1, 8)                 AS name_prefix,
           upper(p_brand)                       AS brand_upper,
           trim(concat(p_brand, ' / ', p_type)) AS brand_type,
           CAST(length(p_name) AS INT)          AS name_len
    FROM part
    WHERE p_type LIKE '%O%'
""",
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_type").like("%O%"))
        .select(
            "p_partkey",
            F.substring("p_name", 1, 8).alias("name_prefix"),
            F.upper("p_brand").alias("brand_upper"),
            F.trim(F.concat("p_brand", F.lit(" / "), "p_type")).alias("brand_type"),
            F.length("p_name").cast("int").alias("name_len"),
        )

    )


@query(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)                    AS order_year,
           CAST(month(o_orderdate) AS INT)                   AS order_month,
           CAST(date_trunc('month', o_orderdate) AS DATE)    AS order_month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT)
             AS days_to_1998
    FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("order_month_start"),
        F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_1998"),
    )


@query(
    "math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           abs(l_discount - l_tax)              AS disc_tax_gap,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kbucket
    FROM lineitem
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # raw double arithmetic is bit-identical across engines; no round
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        F.abs(F.col("l_discount") - F.col("l_tax")).alias("disc_tax_gap"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kbucket"),
    )


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT)                          AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4) + 0           AS first_val,
           CAST(len(list_filter(embedding, x -> x > CAST(0.1 AS DOUBLE))) AS INT) AS n_big,
           list_contains([0, 1, 2], label)                      AS low_label
    FROM embeddings
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "embeddings")
    # `+ 0` on BOTH engines: a tiny negative value rounds to IEEE
    # negative zero in DuckDB (sign-preserving float round) but to
    # plain 0.0 in Spark (BigDecimal has no signed zero) — one sf0.1
    # row hit this and `-0.0` vs `0.0` hash-diverge under the driver's
    # stringified row sort. Adding integer zero folds -0.0 to 0.0
    # identically in both engines and is a no-op for every other value.
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        (F.round(F.element_at("embedding", 1).cast("double"), 4) + F.lit(0))
        .alias("first_val"),
        F.size(F.filter("embedding", lambda x: x > 0.1)).cast("int").alias("n_big"),
        F.array_contains(F.array(F.lit(0), F.lit(1), F.lit(2)), F.col("label")).alias(
            "low_label"
        ),
    )


@query(
    "json_funcs",
    oracle="""
    SELECT k_bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM (SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket, value
          FROM events)
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the events.props JSON column, bucketed."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.select(
            (F.get_json_object("props", "$.k").cast("long") % 10).alias("k_bucket"),
            "value",
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        )
        .orderBy("k_bucket")
    )


@query(
    "json_from_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT)          AS k,
           CAST(json_extract(props, '$.k') AS INT) % 7 = 0  AS k_div7,
           json_valid(props)                                AS is_valid
    FROM events
""",
)
def json_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parsing: from_json into a typed struct (vs
    json_funcs' path extraction), plus validity probing. At scale the
    struct parse is one pass per row and prunes to the referenced
    fields."""
    # r12: small-input spread (guide §2.5) — interleaved steady A/B -0.27/-0.35 s
    ev = table(spark, sf_dir, "events", spread=True)
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p"), "props"
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 7 == 0).alias("k_div7"),
        (F.from_json("props", "k INT").isNotNull()).alias("is_valid"),
    )


@query(
    "json_variant",
    oracle="""
    SELECT k_parity, CAST(count(*) AS BIGINT) AS n,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM (SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS k_parity, props
          FROM events)
    GROUP BY k_parity
    ORDER BY k_parity
    """,
)
def json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (native since Spark 4.0):
    parse_json into a VARIANT column, then typed variant_get
    extraction — the open-schema ingestion shape (store once, type at
    query time) that per-field string extraction (json_funcs) can't
    batch. DuckDB oracle uses its JSON type for identical semantics.

    Scale: parse_json is one vectorized pass; variant_get on a
    binary-encoded variant avoids re-tokenizing the JSON text per
    field."""
    ev = table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    return (
        v.select(
            (F.try_variant_get("v", "$.k", "bigint") % 2).alias("k_parity"),
            F.try_variant_get("v", "$.k", "bigint").alias("k"),
        )
        .groupBy("k_parity")
        .agg(F.count("*").alias("n"), F.max("k").alias("max_k"))
        .orderBy("k_parity")
    )


@query(
    "sql_try_funcs",
    oracle="""
    SELECT o_orderkey,
           o_totalprice / (o_custkey % 3)                        AS safe_ratio,
           try_cast(substr(o_orderpriority, 1, 1) AS INTEGER)    AS prio_num,
           try_cast(o_orderstatus AS INTEGER)                    AS status_num,
           try_cast(substr(CAST(o_orderdate AS VARCHAR), 1, 10) AS DATE) AS od
    FROM orders
    """,
)
def sql_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe SQL under ANSI mode: Spark 4 runs with
    spark.sql.ansi.enabled=true, where plain division-by-zero and bad
    casts THROW — the try_* family returns NULL instead, which is the
    pre-ANSI (and DuckDB) semantics a migrating workload expects.
    try_divide hits a zero denominator every third row; try_cast
    exercises a valid digit prefix, an always-invalid cast, and a
    string-to-date round trip.

    Scale: pure row-local codegen expressions — map-only, no shuffle;
    at 100 TB the value is that one malformed row NULLs instead of
    killing a 1000-executor stage. Unsorted output by design: a global
    ORDER BY on a row-local transform forces a range exchange + full
    sort of every output row for zero semantic value (the round-5
    profile ask — the sort was 80% of the query's 2.8 s; the driver's
    comparison is order-insensitive, and per-row results have no
    inherent order).

    Round 12 (optimization — guide §1.2 "per-task work"): a FAILING
    string→int try_cast costs ~10 µs/row — Spark's UTF8String parse
    throws and try_* catches per row, so a column that never parses
    (o_orderstatus is 'F'/'O'/'P') paid 1.44 s of the query's 1.9 s
    steady at sf0.1 (measured stand-alone; the three other columns
    cost 0.08-0.17 s together). The digit guard short-circuits rows
    that cannot possibly cast — a string with no ASCII digit is never
    a valid integer, so ``CASE WHEN s RLIKE '[0-9]' THEN try_cast(s)
    END`` is value-identical to ``try_cast(s)`` for EVERY input
    (verified on a 45-string battery incl. unicode digits, signs,
    overflow, whitespace, NULL: zero mismatches; Spark's parser is
    ASCII-only, so unicode-digit strings fail both ways). Rows that do
    carry digits still take the exception path only when malformed —
    the guard is a fast-path, not a semantic change. Measured: query
    steady 1.88 → ~0.5 s.
    """
    o = table(spark, sf_dir, "orders")
    return o.selectExpr(
        "o_orderkey",
        "try_divide(o_totalprice, o_custkey % 3)                     AS safe_ratio",
        "try_cast(substr(o_orderpriority, 1, 1) AS INTEGER)          AS prio_num",
        "CASE WHEN o_orderstatus RLIKE '[0-9]'"
        " THEN try_cast(o_orderstatus AS INTEGER) END                AS status_num",
        "try_cast(substr(CAST(o_orderdate AS STRING), 1, 10) AS DATE) AS od",
    )
