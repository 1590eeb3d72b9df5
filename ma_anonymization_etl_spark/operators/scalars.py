"""Scalar function families — SURVEY.md §2 group H, plus a3 (JSON column
parse).  One demo query per family over the corpus; each family's
functions are the building blocks the anonymization operators (group I)
compose.

All native Column expressions → whole-stage codegen, no Python.
Cross-engine dialect notes are inline where Spark and DuckDB differ
(split indexing, datediff arg order, ln vs log, pmod emulation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load


@register(
    "a3_json_col_parse",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       json_extract_string(props, '$.k') AS k_str
FROM events
""",
)
def a3_json_col_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a3: parse the semi-structured events.props JSON string into typed
    columns — from_json for the typed path, get_json_object for ad-hoc."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
        F.get_json_object("props", "$.k").alias("k_str"),
    )


@register(
    "h8_variant_semi_structured",
    oracle="""
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 7 AS k_bucket,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
FROM events
GROUP BY CAST(json_extract(props, '$.k') AS INTEGER) % 7
""",
)
def h8_variant_semi_structured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h8 (Spark 4 VARIANT): parse the JSON column ONCE into the binary
    VARIANT type, then typed ``variant_get`` extractions — the modern
    semi-structured path (single parse, no per-access re-parse like
    get_json_object; shreddable at the parquet layer).  Oracle uses
    DuckDB's json_extract on the same column."""
    e = load(spark, sf_dir, "events").withColumn("v", F.parse_json("props"))
    k = F.variant_get("v", "$.k", "int")
    return (
        e.select(k.alias("k"))
        .groupBy((F.col("k") % 7).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "h1_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LOWER(p_brand) AS brand_lower,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 8) AS name_prefix,
       LPAD(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       TRIM(CONCAT('  ', p_brand, '  ')) AS brand_trimmed,
       regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS brand_num,
       regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
       string_split(p_name, ' ')[1] AS first_word,
       CONCAT(p_brand, ':', p_type) AS brand_type
FROM part
""",
)
def h1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h1: string family.  Dialect notes: Spark split() takes a regex and
    is 0-indexed via getItem; DuckDB string_split takes a literal and is
    1-indexed.  Spark regexp_replace is global by default; DuckDB needs
    the 'g' flag."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("brand_trimmed"),
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "h2_datetime_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       dayofmonth(o_orderdate) AS order_day,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
       CAST(date_trunc('year', o_orderdate) AS TIMESTAMP) AS order_year_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(FLOOR(epoch(o_orderdate)) AS BIGINT) AS epoch_sec
FROM orders
""",
)
def h2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h2: date/time family.  Dialect notes: DuckDB datediff takes the
    unit first and (start, end); DuckDB date_trunc returns DATE (cast to
    TIMESTAMP to match Spark); DuckDB epoch() returns fractional seconds
    (floor to match Spark's unix_timestamp truncation)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_2002"
        ),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.date_trunc("year", "o_orderdate").alias("order_year_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_sec"),
    )


@register(
    "h3_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_round,
       FLOOR(l_extendedprice) AS price_floor,
       CEIL(l_extendedprice) AS price_ceil,
       ABS(l_discount - 0.05) AS disc_dev,
       ROUND(pow(l_quantity, 2), 6) AS qty_sq,
       ROUND(ln(l_extendedprice), 6) AS price_ln,
       ROUND(sqrt(l_quantity), 6) AS qty_sqrt,
       ((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7 AS key_mod7
FROM lineitem WHERE l_orderkey < 2000
""",
)
def h3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h3: math family.  libm results (pow/ln/sqrt) can differ in the
    last ulp between JVM and C runtimes → ROUND(6).  pmod is emulated in
    DuckDB as ((a % b) + b) % b.  Note Spark ROUND(double, 1) and DuckDB
    agree here because .x5 boundaries are not exactly representable."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_round"),
        F.floor("l_extendedprice").cast("double").alias("price_floor"),
        F.ceil("l_extendedprice").cast("double").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.sqrt("l_quantity"), 6).alias("qty_sqrt"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).alias("key_mod7"),
    )


@register(
    "h4_array_funcs",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       array_to_string(string_split(text, ' ')[1:3], '|') AS first3,
       array_to_string(list_transform(string_split(text, ' ')[1:3], w -> upper(w)), '|')
         AS first3_upper,
       len(list_filter(string_split(text, ' '), w -> length(w) > 5)) AS n_long_words,
       array_to_string(list_sort(string_split(text, ' ')[1:3]), '|') AS first3_sorted,
       list_reduce(list_transform(string_split(text, ' '), w -> length(w)),
                   (a, b) -> a + b) AS total_word_chars
FROM documents
""",
)
def h4_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h4: array + higher-order family over tokenized document text —
    size/slice/transform/filter/sort_array/aggregate.  Int reduction is
    exact so no rounding.  Array-valued results are serialized with
    '|' joins: oracle-checked projections must stay ARRAY-free (the
    driver's pandas canonicalizer cannot hash list cells)."""
    d = load(spark, sf_dir, "documents")
    words = F.split("text", " ")
    first3 = F.slice(words, 1, 3)
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(first3, "|").alias("first3"),
        F.array_join(F.transform(first3, lambda w: F.upper(w)), "|").alias("first3_upper"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long_words"),
        F.array_join(F.sort_array(first3), "|").alias("first3_sorted"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, b: a + b
        ).alias("total_word_chars"),
    )


@register(
    "h5_map_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
       CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 'k' END AS first_key,
       CAST(json_valid(props) AS BOOLEAN) AS is_valid_json
FROM events
""",
)
def h5_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h5: map/JSON family — parse to MapType, inspect keys.  Map values
    themselves stay engine-internal (map render order differs across
    engines); scalar extractions are oracle-checked."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return e.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.map_keys(m).getItem(0).alias("first_key"),
        m.isNotNull().alias("is_valid_json"),
    )


@register(
    "h6_hash_funcs",
    oracle="""
SELECT c_custkey,
       md5(c_name) AS name_md5,
       sha256(c_name) AS name_sha256,
       md5(CONCAT('pepper|', c_name)) AS name_md5_peppered
FROM customer
""",
)
def h6_hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h6: hash family — md5 and sha2-256 have verified cross-engine
    parity (SURVEY §2.H); xxhash64/hash/crc32 are engine-internal only
    and never appear in oracle-checked output."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
        F.md5(F.concat(F.lit("pepper|"), F.col("c_name"))).alias("name_md5_peppered"),
    )


@register(
    "h7_null_funcs",
    oracle="""
SELECT c_custkey,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(suppressed)') AS segment_masked,
       GREATEST(c_acctbal, 0.0) AS bal_floor0,
       LEAST(c_acctbal, 1000.0) AS bal_cap1000,
       CAST(c_acctbal IS NULL AS BOOLEAN) AS bal_is_null,
       IFNULL(NULLIF(c_mktsegment, c_mktsegment), 'all-null') AS nvl_demo
FROM customer
""",
)
def h7_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h7: null/conditional family — the scaffolding for suppression (i6,
    i7) and clamping (i12)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("(suppressed)")).alias(
            "segment_masked"
        ),
        F.greatest("c_acctbal", F.lit(0.0)).alias("bal_floor0"),
        F.least("c_acctbal", F.lit(1000.0)).alias("bal_cap1000"),
        F.isnull("c_acctbal").alias("bal_is_null"),
        F.nvl(F.nullif("c_mktsegment", F.col("c_mktsegment")), F.lit("all-null")).alias(
            "nvl_demo"
        ),
    )


@register(
    "h9_bitwise_funcs",
    oracle="""
SELECT o_orderstatus,
       bit_and(o_orderkey & 255) AS band,
       bit_or(o_orderkey & 255) AS bor,
       bit_xor(o_orderkey & 255) AS bxor,
       CAST(SUM(bit_count(((o_orderkey << 2) | 5)::BIGINT)) AS BIGINT) AS popcnt_sum,
       CAST(SUM(o_orderkey >> 3) AS BIGINT) AS shifted_sum
FROM orders
GROUP BY o_orderstatus
""",
)
def h9_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h9: bitwise scalar + aggregate family — &, |, ^, shifts,
    popcount, and the bit_and/bit_or/bit_xor aggregates (bitmap-style
    rollups).  All JVM-native integer ops inside codegen; identical
    two's-complement semantics on both engines."""
    o = load(spark, sf_dir, "orders")
    b = F.col("o_orderkey").bitwiseAND(F.lit(255))
    return o.groupBy("o_orderstatus").agg(
        F.bit_and(b).alias("band"),
        F.bit_or(b).alias("bor"),
        F.bit_xor(b).alias("bxor"),
        F.sum(
            F.bit_count(F.shiftleft(F.col("o_orderkey"), 2).bitwiseOR(F.lit(5)))
        ).alias("popcnt_sum"),
        F.sum(F.shiftright(F.col("o_orderkey"), 3)).alias("shifted_sum"),
    )


@register(
    "h10_url_funcs",
    oracle="""
SELECT doc_id,
       'https' AS proto,
       source || '.example.com' AS host,
       '/corpus/' || lang || '/' || CAST(doc_id AS VARCHAR) AS path,
       lang AS q_lang,
       'sec' || CAST(doc_id % 7 AS VARCHAR) AS frag,
       'com' AS tld,
       source AS subdomain
FROM documents
""",
)
def h10_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """h10: URL parsing family — the web-corpus preprocessing surface
    (domain-level dedup, blocklists, per-site quotas all key on these).
    A deterministic URL is synthesized per document, then every part is
    recovered with the REAL parser (``parse_url``: PROTOCOL / HOST /
    PATH / QUERY param / REF) plus ``substring_index`` for the
    tld/subdomain splits; the oracle reconstructs the same parts from
    first principles, so a parser that mangled any component would
    mismatch.  Map-side only — one projection, no shuffle at any
    scale."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/corpus/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&ref=feed#sec"),
        (F.col("doc_id") % 7).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("proto"),
        host.alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
        F.parse_url(F.col("url"), F.lit("REF")).alias("frag"),
        F.substring_index(host, ".", -1).alias("tld"),
        F.substring_index(host, ".", 1).alias("subdomain"),
    )
