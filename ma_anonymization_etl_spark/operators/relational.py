"""Relational core — SURVEY.md §2 groups B (projection/filter), C (joins),
D (aggregation), F (sort/limit/top-k), G (set ops).

Every query here is pure Catalyst-native Column expressions: predicate
pushdown, column pruning, partial aggregation, and join-strategy
selection (broadcast vs sort-merge, AQE skew splitting) all apply
untouched.  Scale notes per operator in docstrings.

Oracle-parity rules used throughout (see functions.numeric):
- large-magnitude double SUMs → exact scaled-int64 sums on both sides;
- AVG/STDDEV/CORR → ROUND(, 4..6) on both sides;
- every LIMIT carries a total order with a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.functions.numeric import dsum, ravg, sql_dsum, sql_ravg
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load

# ---------------------------------------------------------------------------
# D1 — flagship: TPC-H-Q1-style pricing summary (scan → filter → agg → sort)
# ---------------------------------------------------------------------------

FLAGSHIP_CUTOFF = "1998-09-02 00:00:00"


@register(
    "d1_agg_hash_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_ravg('l_quantity', 'avg_qty')},
       {sql_ravg('l_extendedprice', 'avg_price')},
       {sql_ravg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{FLAGSHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def d1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d1: hash aggregate with 8 aggregates over filtered lineitem.

    Scale: filter is a native predicate → parquet row-group skipping;
    groupBy on a 6-value key → partial (map-side) aggregation shrinks the
    shuffle to ~6 rows/partition regardless of input size; no skew risk.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(FLAGSHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            ravg("l_quantity", "avg_qty"),
            ravg("l_extendedprice", "avg_price"),
            ravg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# B — projection / filter / expressions
# ---------------------------------------------------------------------------


@register(
    "b1_project",
    oracle="SELECT c_custkey AS cust_id, c_name, c_mktsegment FROM customer",
)
def b1_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b1: column pruning + rename — ReadSchema should show only 3 columns."""
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_name", "c_mktsegment"
    )


@register(
    "b2_filter_pred",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_totalprice BETWEEN 1000 AND 50000
  AND o_orderpriority LIKE '1-%'
  AND o_custkey IS NOT NULL
""",
)
def b2_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b2: IN/BETWEEN/LIKE/IS NULL conjunction — all pushed to the scan."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 50000)
        & F.col("o_orderpriority").like("1-%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@register(
    "b3_derive_col",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS net_price,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS gross_price
FROM lineitem
WHERE l_orderkey < 1000
""",
)
def b3_derive_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b3: computed columns; identical IEEE double exprs on both engines."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        net.alias("net_price"),
        (net * (1 + F.col("l_tax"))).alias("gross_price"),
    )


@register(
    "b4_case_when",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'low' END AS priority_bucket
FROM orders
""",
)
def b4_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b4: conditional mapping (priority → bucket)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
        .alias("priority_bucket"),
    )


@register(
    "b5_cast",
    oracle="""
SELECT CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
FROM orders
""",
)
def b5_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """b5: type coercion.  Note cross-engine gotcha: DuckDB CAST(DOUBLE AS
    BIGINT) *rounds* while Spark truncates — FLOOR first on both sides."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_floor"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


# ---------------------------------------------------------------------------
# C — joins
# ---------------------------------------------------------------------------


@register(
    "c1_join_broadcast",
    oracle=f"""
SELECT r_name, COUNT(*) AS n_customers, {sql_dsum('c_acctbal', 'sum_acctbal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def c1_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c1: star join over tiny dims — explicit broadcast() so the plan is a
    BroadcastHashJoin with NO shuffle of the fact side, the 100 TB-safe
    shape for ≤25-row dimension tables."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_customers"), dsum("c_acctbal", "sum_acctbal"))
    )


@register(
    "c2_join_shuffle",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def c2_join_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c2: fact-fact equi join — above broadcast threshold Catalyst/AQE
    pick SortMergeJoin on the shuffled orderkey; both sides already keyed
    so at 100 TB bucketing both tables on orderkey removes this shuffle."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum(net, "revenue"))
    )


@register(
    "c3_join_outer",
    oracle="""
SELECT c_custkey, c_name, o_orderkey
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
""",
)
def c3_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c3: left outer join — customers without orders surface with NULL keys."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "c4_join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
)
def c4_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c4: left-semi join — customers with at least one big order."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi")


@register(
    "c5_join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
""",
)
def c5_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c5: left-anti join — customers with no order above 300k (the plain
    "no orders at all" variant is empty on this corpus: every customer
    has orders, FIXTURES.md FK note)."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select("o_custkey")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti")


@register(
    "c6_join_range_theta",
    oracle="""
SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
)
def c6_join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c6: self equi-join on user_id with a time-range theta conjunct —
    Spark executes the equi part as the join key and evaluates the range
    as a post-join condition.  Scale: the equi key bounds the blow-up to
    per-user pairs; for unbounded streams the same shape runs as an
    interval join with watermarks (streaming module)."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return a.join(b, cond).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
    )


@register(
    "c7_join_asof",
    oracle="""
SELECT event_id, user_id, asof_orderkey, asof_orderdate FROM (
  SELECT e.event_id, e.user_id,
         o.o_orderkey AS asof_orderkey, o.o_orderdate AS asof_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
""",
)
def c7_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c7: as-of join — for each event, the latest order at-or-before its
    event time for the same user.  Spark has no native ASOF JOIN;
    implemented as the union-merge: tag both sides, sort each user's
    timeline once, and carry the last-seen order forward with
    last(..., ignorenulls) — one shuffle on user, O(n log n), no
    (events × orders-per-user) pair blow-up (that naive range-join +
    row_number emulation is what the oracle uses as the referee).

    Ordering details that make it exact: at equal timestamps orders
    sort before events (inclusive <=), and same-date orders sort by
    orderkey ascending so the carried value is the max orderkey —
    matching the oracle's DESC row_number tie-break."""
    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderdate")
    timeline = o.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderdate").alias("odate"),
        F.lit(None).cast("long").alias("event_id"),
    ).unionByName(
        e.select(
            "user_id",
            F.col("ts").alias("t"),
            F.lit(1).alias("is_event"),
            F.lit(None).cast("long").alias("okey"),
            F.lit(None).cast("timestamp").alias("odate"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", "okey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        timeline.withColumn("asof_orderkey", F.last("okey", ignorenulls=True).over(w))
        .withColumn("asof_orderdate", F.last("odate", ignorenulls=True).over(w))
        .filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "asof_orderkey", "asof_orderdate")
    )


@register(
    "c8_join_cross",
    oracle="SELECT n_name, r_name FROM nation CROSS JOIN region",
)
def c8_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c8: small cartesian grid (25×5) — only ever for tiny sides."""
    n = load(spark, sf_dir, "nation").select("n_name")
    r = load(spark, sf_dir, "region").select("r_name")
    return n.crossJoin(F.broadcast(r))


@register(
    "c9_join_self",
    oracle="""
SELECT a.s_suppkey AS a_suppkey, b.s_suppkey AS b_suppkey, a.s_nationkey
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
""",
)
def c9_join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c9: self-join — same-nation supplier pairs, deduped by key order."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    a = s.alias("a")
    b = s.alias("b")
    return a.join(
        b,
        (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
        & (F.col("a.s_suppkey") < F.col("b.s_suppkey")),
    ).select(
        F.col("a.s_suppkey").alias("a_suppkey"),
        F.col("b.s_suppkey").alias("b_suppkey"),
        F.col("a.s_nationkey").alias("s_nationkey"),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Manual skew mitigation for an inner equi-join: every big-side row
    gets a deterministic salt in [0, n_salt) from xxhash64 of its full
    row, the small side is replicated n_salt times via explode, and the
    join runs on (key, salt) — a hot key's rows spread over n_salt
    reducers instead of one straggler task.  Result is row-identical to
    ``big.join(small, big_key == small_key)``.

    Prefer AQE skew-join splitting (on by default here) — it salts only
    the partitions that are actually skewed, at runtime, for free.  This
    helper is the fallback for when a SINGLE key exceeds what one task
    can hold even after AQE splits (power-law user_id at 100 TB), at the
    cost of scanning the small side n_salt times through the shuffle.
    """
    salted = big.withColumn(
        "__salt_b", F.pmod(F.xxhash64(*big.columns), F.lit(n_salt)).cast("int")
    )
    rep = small.withColumn(
        "__salt_s", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return (
        salted.join(
            rep,
            (F.col(big_key) == F.col(small_key))
            & (F.col("__salt_b") == F.col("__salt_s")),
        )
        .drop("__salt_b", "__salt_s")
    )


@register(
    "c10_join_salted",
    oracle=f"""
SELECT o_orderpriority, COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
""",
)
def c10_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c10: c2's fact-fact join through the manual salting fallback —
    lineitem rows salted 8 ways, orders replicated 8× — proving the
    rewrite is row-identical (same oracle as c2).  The demonstration
    data is unskewed, so this plan is strictly worse than c2's here;
    the point is the verified rewrite, reached for only when one key
    outgrows a task even after AQE skew splitting."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        salted_join(li, o, "l_orderkey", "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), dsum(net, "revenue"))
    )


# ---------------------------------------------------------------------------
# D — aggregation (beyond the d1 flagship)
# ---------------------------------------------------------------------------


@register(
    "d2_distinct",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def d2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d2: distinct tuples — hash aggregate with no aggregate functions."""
    return load(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


@register(
    "d3_count_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
)
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d3: exact distinct per group — Spark expands to a two-phase agg."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "d4_approx_count_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_5pct
FROM events GROUP BY event_type
""",
)
def d4_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d4: HyperLogLog distinct estimate — the scale path when exact
    distinct would shuffle too much.  HLL sketch values are
    engine-specific, so the oracle-checkable projection is the i18
    pattern: the exact count plus a boolean asserting the estimate
    landed within ±5% of it (the oracle emits TRUE).  The sketch is
    still exercised — a drifting estimate flips the boolean and fails
    the hash check."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("__approx"),
        )
        .select(
            "event_type",
            "exact_users",
            (
                F.abs(F.col("__approx") - F.col("exact_users"))
                <= 0.05 * F.col("exact_users")
            ).alias("approx_within_5pct"),
        )
    )


@register(
    "d5_grouping_sets",
    oracle=f"""
SELECT c_mktsegment, c_nationkey, COUNT(*) AS n, {sql_dsum('c_acctbal', 'sum_bal')}
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
""",
)
def d5_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d5: multi-granularity aggregate in one pass over the input."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_d5")
    return spark.sql(
        f"""
        SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
               {sql_dsum('c_acctbal', 'sum_bal')}
        FROM customer_d5
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
        """
    )


@register(
    "d6_rollup",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def d6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d6: hierarchical subtotals region → nation → grand total."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


@register(
    "d7_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {sql_dsum('o_totalprice', 'sum_price')}
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def d7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d7: all-combinations subtotals."""
    return (
        load(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice", "sum_price"))
    )


@register(
    "d8_agg_conditional",
    oracle=f"""
SELECT c_nationkey,
       {sql_dsum("CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal END", 'building_bal')},
       COUNT(CASE WHEN c_acctbal < 0 THEN 1 END) AS n_negative,
       COUNT(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 END) AS n_machinery
FROM customer GROUP BY c_nationkey
""",
)
def d8_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d8: pivot-style conditional aggregation — sum/count over CASE."""
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        dsum(F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal")), "building_bal"),
        F.count(F.when(F.col("c_acctbal") < 0, 1)).alias("n_negative"),
        F.count(F.when(F.col("c_mktsegment") == "MACHINERY", 1)).alias("n_machinery"),
    )


@register(
    "d9_collect_sorted",
    oracle="""
SELECT r_regionkey, array_to_string(list(n_name ORDER BY n_name), ',') AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_regionkey
""",
)
def d9_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d9: per-group list, sorted for determinism (collect_list order is
    otherwise partition-dependent — never emit unsorted lists), then
    serialized to a ','-joined scalar: oracle-checked projections must
    stay ARRAY-free (the driver canonicalizes rows through pandas, which
    cannot hash list cells — enforced for every oracle-checked query by
    the ARRAY-free assertion in tests/conftest.py::compare_query)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
    )


@register(
    "d10_agg_stats",
    oracle="""
SELECT o_orderstatus,
       ROUND(stddev_samp(o_totalprice), 4) AS std_price,
       ROUND(stddev_pop(o_totalprice), 4) AS stdp_price
FROM orders GROUP BY o_orderstatus
""",
)
def d10_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d10: statistical aggregates (stddev family; corr/covar exercised in
    d10b below on lineitem)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.stddev_samp("o_totalprice"), 4).alias("std_price"),
            F.round(F.stddev_pop("o_totalprice"), 4).alias("stdp_price"),
        )
    )


@register(
    "d10b_agg_corr",
    oracle="""
SELECT l_returnflag,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem GROUP BY l_returnflag
""",
)
def d10b_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d10: correlation / covariance across columns."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qty_price"),
        )
    )


@register(
    "d11_median_percentile",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
FROM orders GROUP BY o_orderstatus
""",
)
def d11_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d11: exact percentiles (linear interpolation — same definition as
    DuckDB quantile_cont).  Exact percentile requires a per-group sort;
    at 100 TB switch to approx_percentile with a tolerance."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("median_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90_price"),
        )
    )


@register(
    "d13_approx_percentile",
    oracle="""
SELECT o_orderstatus,
       ROUND(quantile_cont(o_totalprice, 0.5), 4) AS exact_median,
       ROUND(quantile_cont(o_totalprice, 0.9), 4) AS exact_p90,
       TRUE AS approx_within_1pct
FROM orders GROUP BY o_orderstatus
""",
)
def d13_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d13 (extension): approximate percentiles via the GK sketch — the
    100 TB replacement for exact d11 (no per-group sort; mergeable
    sketches, single pass).  Sketch outputs are engine-specific, so the
    oracle-checkable projection is the i18 pattern: exact percentiles
    plus a boolean asserting both estimates landed within 1% relative
    error (the oracle emits TRUE)."""
    rel_err = lambda approx, exact: F.abs(approx - exact) <= 0.01 * F.abs(exact)  # noqa: E731
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("exact_median"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("exact_p90"),
            F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("__a50"),
            F.approx_percentile("o_totalprice", F.lit(0.9), F.lit(10000)).alias("__a90"),
        )
        .select(
            "o_orderstatus",
            "exact_median",
            "exact_p90",
            (
                rel_err(F.col("__a50"), F.col("exact_median"))
                & rel_err(F.col("__a90"), F.col("exact_p90"))
            ).alias("approx_within_1pct"),
        )
    )


@register(
    "d14_mode",
    oracle="""
SELECT c_nationkey, c_mktsegment AS mode_segment, cnt AS mode_count FROM (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY COUNT(*) DESC, c_mktsegment) AS rn
  FROM customer GROUP BY 1, 2
) WHERE rn = 1
""",
)
def d14_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d14 (extension): deterministic MODE — the most frequent segment
    per nation.  Native ``mode()`` is tie-nondeterministic in both
    engines, so the checked form is max-count with a total tie-break
    (smallest segment wins) via one grouped count + one window: the
    only way a mode is safe in a differential-tested (or reproducible)
    pipeline."""
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("cnt").desc(), "c_mktsegment"
    )
    return (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("c_mktsegment").alias("mode_segment"),
            F.col("cnt").alias("mode_count"),
        )
    )


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "d12_pivot",
    oracle=f"""
SELECT c_nationkey,
       {", ".join(f"COUNT(CASE WHEN c_mktsegment = '{s}' THEN 1 END) AS {s}" for s in _SEGMENTS)}
FROM customer GROUP BY c_nationkey
""",
)
def d12_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d12: pivot (long → wide) — segments become columns.  The pivot
    values are pinned explicitly: letting Spark discover them adds an
    extra distinct pass AND makes the schema data-dependent (fatal for
    both the oracle and a 100 TB job's stability).  Missing combos are
    coalesced to 0 to match SQL COUNT semantics."""
    piv = (
        load(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .count()
    )
    return piv.select(
        "c_nationkey",
        *[F.coalesce(F.col(s), F.lit(0)).alias(s) for s in _SEGMENTS],
    )


# ---------------------------------------------------------------------------
# F — sorts / limits / top-k
# ---------------------------------------------------------------------------


@register(
    "f1_sort_global",
    oracle="""
SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
WHERE o_totalprice > 450000
ORDER BY o_orderdate DESC, o_totalprice ASC NULLS LAST
""",
)
def f1_sort_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f1: global multi-key sort (range-partitioned exchange in Spark)."""
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.col("o_orderdate").desc(), F.col("o_totalprice").asc_nulls_last())
    )


@register(
    "f2_limit",
    oracle="""
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
)
def f2_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f2: LIMIT — always paired with a total order + unique tie-break
    (o_orderkey) or the row *set* is nondeterministic."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "f3_topk_global",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
)
def f3_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f3: global top-k — Spark plans TakeOrderedAndProject: each
    partition keeps k rows, driver merges; no full sort at any scale."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@register(
    "f4_topk_per_group",
    oracle="""
SELECT c_nationkey, c_custkey, c_acctbal, rn FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn <= 3
""",
)
def f4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f4: top-k per group via ranked window + filter — the 100 TB-safe
    pattern (single shuffle on the group key, no per-group collect)."""
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        load(spark, sf_dir, "customer")
        .select("c_nationkey", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# G — set operations
# ---------------------------------------------------------------------------


@register(
    "g1_union_all",
    oracle="""
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 400000
""",
)
def g1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g1: bag union — overlapping rows appear twice (multiset parity)."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderpriority"
    )
    big = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey", "o_orderpriority")
    return urgent.unionByName(big)


@register(
    "g2_union_distinct",
    oracle="""
SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
UNION
SELECT o_orderkey FROM orders WHERE o_totalprice > 400000
""",
)
def g2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g2: set union (distinct applied after the bag union)."""
    o = load(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_orderkey")
    return urgent.union(big).distinct()


@register(
    "g3_intersect",
    oracle="""
SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal < 0
""",
)
def g3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3: set intersection of projected tuples."""
    c = load(spark, sf_dir, "customer")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_nationkey", "c_mktsegment")
    poor = c.filter(F.col("c_acctbal") < 0).select("c_nationkey", "c_mktsegment")
    return rich.intersect(poor)


@register(
    "g3b_intersect_all",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def g3b_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g3: bag intersection — per-value multiplicity = min(count_a, count_b)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    return clicks.intersectAll(views)


@register(
    "g4_except",
    oracle="""
SELECT o_custkey FROM orders
EXCEPT
SELECT c_custkey FROM customer WHERE c_acctbal < 0
""",
)
def g4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g4: set difference (Spark subtract)."""
    o = load(spark, sf_dir, "orders").select("o_custkey")
    neg = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") < 0).select("c_custkey")
    return o.subtract(neg)


@register(
    "g4b_except_all",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'click'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'view'
""",
)
def g4b_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """g4: bag difference — multiplicity = max(0, count_a - count_b)."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    return clicks.exceptAll(views)


@register(
    "f5_pagination",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
""",
)
def f5_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f5: keyset-free pagination — ORDER BY + OFFSET + LIMIT (the API
    page-3 query), tie-broken for determinism.  Spark plans offset+limit
    together (CollectLimit with skip), so only offset+limit rows leave
    the executors — but the sort is still global; at 100 TB serve pages
    from a keyset predicate (WHERE (price, key) < last_seen) instead,
    which this plan degenerates to under a pushed filter."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey").offset(40).limit(20)
    )


@register(
    "c11_range_join_binned",
    oracle="""
SELECT a.event_id AS a_id, b.event_id AS b_id
FROM events a JOIN events b
  ON b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE
""",
)
def c11_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c11 (extension): PURE range join — no equi key at all, the case
    Catalyst would plan as a BroadcastNestedLoopJoin (all-pairs) —
    rewritten as a BINNED equi-join: bucket both sides into
    interval-sized minutes, explode the left row into its two candidate
    buckets, hash-join on the bucket, residual-filter the exact range.
    Every qualifying pair shares exactly one candidate bucket, so no
    dedup is needed.

    Scale: shuffle O(n) on bucket keys instead of O(n²) pair
    enumeration — the standard interval-join binning (bucket width =
    interval width ⇒ ≤ 2 candidate buckets per row).  Skewed minutes
    fall back to AQE skew-split like any hot hash key."""
    e = load(spark, sf_dir, "events").select("event_id", "ts")
    bucket = F.floor(F.col("ts").cast("double") / 60).cast("long")
    a = e.select(
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = e.select(
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
        bucket.alias("bucket"),
    )
    return (
        a.join(b, "bucket")
        .filter(
            (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 1 MINUTE"))
        )
        .select("a_id", "b_id")
    )


@register(
    "d15_hll_sketch_merge",
    # Spark's Apache DataSketches HLL binaries have no DuckDB twin, so
    # the checkable projection is the i13 pattern: exact distinct count
    # plus invariant booleans the oracle emits as TRUE — (1) estimates
    # from MERGED per-shard sketches equal the direct single-pass
    # estimate EXACTLY (register-level union is deterministic), and
    # (2) the estimate lands within HLL's error envelope of the exact
    # count at lgK=12.
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_exact,
       TRUE AS merged_close_to_direct,
       TRUE AS est_within_5pct
FROM orders
GROUP BY o_orderpriority
""",
)
def d15_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d15 (extension): MERGEABLE distinct-count sketches — the
    datasketches surface (hll_sketch_agg / hll_union_agg /
    hll_sketch_estimate) that d4's approx_count_distinct hides: here
    the sketch itself is a first-class partial, built per shard and
    union-merged to the group total, which is how a 100 TB rollup
    keeps pre-aggregated distinct counts incrementally maintainable
    (k22's partial-merge algebra, but for a non-additive metric).
    The op asserts the merged estimate tracks the direct one within
    3% (the sparse->dense representation switch makes them differ in
    the last percent, so register-exact equality only holds in the
    coupon regime) and that the estimate sits inside the lgK=12 error
    envelope (5% ~= 3 sigma) of the true count.

    Scale: per-shard sketches are the map-side partial (one 4 KB
    buffer per group-shard), the merge is a tiny shuffle of sketch
    blobs — never re-scanning raw keys; this is the only correct shape
    for maintaining distinct counts under compaction/incremental
    refresh."""
    o = load(spark, sf_dir, "orders")
    direct = o.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("est_d"),
        F.countDistinct("o_custkey").alias("n_exact"),
    )
    shards = o.withColumn("shard", F.col("o_orderkey") % 8).groupBy(
        "o_orderpriority", "shard"
    ).agg(F.hll_sketch_agg("o_custkey", F.lit(12)).alias("sk"))
    merged = shards.groupBy("o_orderpriority").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_m")
    )
    return (
        direct.join(merged, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_exact",
            (
                F.abs(F.col("est_m") - F.col("est_d"))
                <= F.lit(0.03) * F.col("n_exact")
            ).alias("merged_close_to_direct"),
            (
                F.abs(F.col("est_d") - F.col("n_exact"))
                <= F.lit(0.05) * F.col("n_exact")
            ).alias("est_within_5pct"),
        )
    )


@register(
    "c12_interval_overlap_join",
    oracle="""
WITH promos AS (
  SELECT n_nationkey AS promo_id,
         TIMESTAMP '1995-01-01' + (n_nationkey * 90) * INTERVAL 1 DAY AS p_start,
         TIMESTAMP '1995-01-01' + (n_nationkey * 90 + 30) * INTERVAL 1 DAY AS p_end
  FROM nation
),
o AS (
  SELECT o_orderkey, o_totalprice, o_orderdate AS a_start,
         o_orderdate + 7 * INTERVAL 1 DAY AS a_end
  FROM orders
)
SELECT promo_id,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS sum_price_cents
FROM o JOIN promos ON a_start < p_end AND p_start < a_end
GROUP BY promo_id
""",
)
def c12_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c12: INTERVAL-OVERLAP join — both sides are intervals (order
    activity window [orderdate, +7d) x promotion window [start, +30d)),
    matched on the half-open overlap predicate a_start < b_end AND
    b_start < a_end; c6/c11 cover point-in-range, this is the
    campaign-attribution / validity-intersection shape.  The promo
    dimension is broadcast, so the overlap predicate evaluates
    map-side — no shuffle of the fact.

    Scale: when BOTH interval sets are large, bin each interval to the
    fixed-width buckets it spans (explode), equi-join on bucket, then
    re-check the exact predicate and dedup — c11's binned-range
    machinery verbatim; here the dimension side is small so broadcast
    is the right plan and the bins would only add work."""
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    promos = n.select(
        F.col("n_nationkey").alias("promo_id"),
        F.expr(
            "timestamp'1995-01-01 00:00:00' + make_dt_interval(n_nationkey * 90, 0, 0, 0)"
        ).alias("p_start"),
        F.expr(
            "timestamp'1995-01-01 00:00:00' + make_dt_interval(n_nationkey * 90 + 30, 0, 0, 0)"
        ).alias("p_end"),
    )
    facts = o.select(
        "o_totalprice",
        F.col("o_orderdate").alias("a_start"),
        F.expr("o_orderdate + make_dt_interval(7, 0, 0, 0)").alias("a_end"),
    )
    return (
        facts.join(
            F.broadcast(promos),
            (F.col("a_start") < F.col("p_end")) & (F.col("p_start") < F.col("a_end")),
        )
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias(
                "sum_price_cents"
            ),
        )
    )


def histogram_quantiles(binned: "DataFrame", group_col: str, bin_width: int) -> "DataFrame":
    """Shared read-side of the mergeable fixed-bin quantile histogram
    (d16 batch, k25 streaming): given (group_col, bin, c) counts,
    return per-group n and the p50/p95 bin lower edges via integer
    cumulative crossings (cc*2 >= n, cc*20 >= 19n) — the first bin
    whose cumulative count reaches ceil(q*n), i.e. the bin holding the
    ceil(q*n)-th order statistic.  Integer comparisons only, so both
    engines (and any future nested-refinement level) pick identical
    bins."""
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy(group_col)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    cum = binned.withColumn("cc", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    return cum.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n"),
        (F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("bin"))) * bin_width)
        .cast("long")
        .alias("p50_bin_lo"),
        (F.min(F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("bin"))) * bin_width)
        .cast("long")
        .alias("p95_bin_lo"),
    )


@register(
    "d16_histogram_quantile_merge",
    oracle="""
WITH b AS (
  SELECT o_orderstatus, CAST(FLOOR(o_totalprice / 10000) AS BIGINT) AS bin,
         COUNT(*) AS c
  FROM orders GROUP BY 1, 2
),
cum AS (
  SELECT o_orderstatus, bin, c,
         SUM(c) OVER (PARTITION BY o_orderstatus ORDER BY bin
                      ROWS UNBOUNDED PRECEDING) AS cc,
         SUM(c) OVER (PARTITION BY o_orderstatus) AS n
  FROM b
)
SELECT o_orderstatus,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cc * 2 >= n THEN bin END) * 10000 AS BIGINT)
         AS p50_bin_lo,
       CAST(MIN(CASE WHEN cc * 20 >= n * 19 THEN bin END) * 10000 AS BIGINT)
         AS p95_bin_lo
FROM cum GROUP BY o_orderstatus
""",
)
def d16_histogram_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d16 (extension): MERGEABLE quantile summaries — the fixed-bin
    histogram partial that d13's approx_percentile hides: per-shard
    bin counts are the map-side partial (here sharded on
    o_orderkey%8, then SUM-merged per group — d15's sketch-merge
    algebra, but for quantiles, and EXACT under merge because bin
    counting is additive), and any quantile reads off the merged
    cumulative histogram as the first bin whose cumulative count
    crosses q*n (integer comparisons only — cc*2 >= n, cc*20 >= 19n —
    so both engines pick identical bins with no float thresholds).
    Resolution is the bin width (10k here); production systems nest a
    second finer histogram inside hot bins.

    Scale: partials are O(groups x bins) rows regardless of data size,
    maintainable incrementally under n3/k22's partial-refresh shape —
    the only way percentile dashboards survive 100 TB without
    re-scanning history."""
    o = load(spark, sf_dir, "orders")
    shard_partials = (
        o.withColumn("shard", F.col("o_orderkey") % 8)
        .withColumn("bin", F.floor(F.col("o_totalprice") / 10000).cast("long"))
        .groupBy("o_orderstatus", "shard", "bin")
        .agg(F.count(F.lit(1)).alias("pc"))
    )
    merged = shard_partials.groupBy("o_orderstatus", "bin").agg(
        F.sum("pc").alias("c")
    )
    return histogram_quantiles(merged, "o_orderstatus", 10000)


@register(
    "d16b_histogram_hot_bin_refine",
    oracle="""
WITH fine AS (
  SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS fbin,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
coarse AS (
  SELECT event_type, fbin // 10 AS bin, SUM(c) AS c
  FROM fine GROUP BY 1, 2
),
tot AS (SELECT event_type, SUM(c) AS n FROM coarse GROUP BY 1),
hot AS (
  SELECT c.event_type, c.bin
  FROM coarse c JOIN tot t USING (event_type)
  WHERE c.c * 10 > t.n
),
mixed AS (
  SELECT f.event_type, f.fbin * 10 AS lo, CAST(10 AS BIGINT) AS w, f.c
  FROM fine f JOIN hot h
    ON h.event_type = f.event_type AND h.bin = f.fbin // 10
  UNION ALL
  SELECT c.event_type, c.bin * 100, CAST(100 AS BIGINT), c.c
  FROM coarse c LEFT JOIN hot h
    ON h.event_type = c.event_type AND h.bin = c.bin
  WHERE h.bin IS NULL
),
cum AS (
  SELECT event_type, lo, w, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY lo
                      ROWS UNBOUNDED PRECEDING) AS cc,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM mixed
),
picks AS (
  SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
         MIN(CASE WHEN cc * 2 >= n THEN lo END) AS p50_lo,
         MIN(CASE WHEN cc * 20 >= n * 19 THEN lo END) AS p95_lo
  FROM cum GROUP BY event_type
)
SELECT p.event_type, p.n,
       CAST(p.p50_lo AS BIGINT) AS p50_lo,
       CAST(m50.w AS BIGINT) AS p50_width,
       CAST(p.p95_lo AS BIGINT) AS p95_lo,
       CAST(m95.w AS BIGINT) AS p95_width
FROM picks p
JOIN mixed m50 ON m50.event_type = p.event_type AND m50.lo = p.p50_lo
JOIN mixed m95 ON m95.event_type = p.event_type AND m95.lo = p.p95_lo
""",
)
def d16b_histogram_hot_bin_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d16b (extension): d16's PRODUCTION REFINEMENT — a second, 10x
    finer histogram level nested inside HOT coarse bins (the
    refinement d16's docstring promises): any width-100 coarse bin
    holding >10% of its group's mass is replaced by its ten width-10
    sub-bins, so the released p50/p95 carry width-10 resolution
    wherever the distribution concentrates, and width-100 elsewhere.
    Runs on events.value per event_type — an exponential-shaped
    metric whose bottom bin holds ~86% of mass, exactly the regime
    hot-bin refinement exists for (both released quantiles come back
    width-10 here; o_totalprice's flat spread never trips the
    refinement, which is why d16 releases width-10000 there).  Bin
    counting is additive at every depth, so the merged release is
    EXACT under sharding/refresh just like d16, and the whole
    construction is integer arithmetic both engines replay
    identically.  Output: per-group n, quantile bin lower edge AND
    the width of the bin that answered it (10 = refined).

    Scale: one scan builds the fine partials (O(groups x 10·bins)
    rows, still data-size independent); coarse derives from fine by
    an additive rollup, hot-bin detection and the mixed histogram are
    arithmetic on those partials.  At 100 TB the fine level would be
    kept only inside hot bins (two-pass or conditional binning) —
    the release here is identical because cold fine bins are
    discarded before the crossing scan."""
    e = load(spark, sf_dir, "events")
    fine = (
        e.withColumn("fbin", F.floor(F.col("value") / 10).cast("long"))
        .groupBy("event_type", "fbin")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # reused 3x; O(groups x bins) rows
    )
    coarse = fine.groupBy(
        "event_type", F.expr("fbin div 10").alias("bin")
    ).agg(F.sum("c").alias("c"))
    tot = coarse.groupBy("event_type").agg(F.sum("c").alias("n"))
    hot = (
        coarse.join(tot, "event_type")
        .filter(F.col("c") * 10 > F.col("n"))
        .select("event_type", "bin")
    )
    fine_hot = (
        fine.withColumn("bin", F.expr("fbin div 10"))
        .join(F.broadcast(hot), ["event_type", "bin"], "left_semi")
        .select(
            "event_type",
            (F.col("fbin") * 10).alias("lo"),
            F.lit(10).cast("long").alias("w"),
            "c",
        )
    )
    coarse_cold = (
        coarse.join(F.broadcast(hot), ["event_type", "bin"], "left_anti")
        .select(
            "event_type",
            (F.col("bin") * 100).alias("lo"),
            F.lit(100).cast("long").alias("w"),
            "c",
        )
    )
    mixed = fine_hot.unionByName(coarse_cold).localCheckpoint(eager=False)
    from pyspark.sql import Window

    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("lo")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = mixed.withColumn("cc", F.sum("c").over(w_cum)).withColumn(
        "n", F.sum("c").over(w_all)
    )
    picks = cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.min(F.when(F.col("cc") * 2 >= F.col("n"), F.col("lo"))).alias("p50_lo"),
        F.min(F.when(F.col("cc") * 20 >= F.col("n") * 19, F.col("lo"))).alias(
            "p95_lo"
        ),
    )
    m50 = mixed.select(
        "event_type", F.col("lo").alias("p50_lo"), F.col("w").alias("p50_width")
    )
    m95 = mixed.select(
        "event_type", F.col("lo").alias("p95_lo"), F.col("w").alias("p95_width")
    )
    return (
        picks.join(m50, ["event_type", "p50_lo"])
        .join(m95, ["event_type", "p95_lo"])
        .select("event_type", "n", "p50_lo", "p50_width", "p95_lo", "p95_width")
    )


@register(
    "d17_agg_argminmax",
    # DuckDB's arg_max cannot take a composite (value, tie-break) key,
    # so the oracle makes the tie-break explicit with two row_number
    # orderings instead — same deterministic row the Spark struct key
    # picks even if an extreme price is ever held by two rows.
    oracle="""
WITH r AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderstatus,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rt,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice ASC, o_orderkey ASC) AS rb
  FROM orders)
SELECT o_orderpriority,
       MAX(CASE WHEN rt = 1 THEN o_orderkey END) AS top_orderkey,
       CAST(FLOOR(MAX(o_totalprice) * 100) AS BIGINT) AS top_cents,
       MAX(CASE WHEN rb = 1 THEN o_orderkey END) AS bottom_orderkey,
       CAST(FLOOR(MIN(o_totalprice) * 100) AS BIGINT) AS bottom_cents,
       CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT)
         AS n_finished
FROM r
GROUP BY o_orderpriority
""",
)
def d17_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d17 (extension): ARG-MAX/MIN aggregates (max_by / min_by,
    count_if-style conditional count) — 'which row holds the extreme',
    answered in ONE aggregate pass instead of the window-rank +
    filter=1 detour (f4's shape) or a self-join back to the extreme
    value.  The ordering key is a STRUCT (price, orderkey) so ties on
    the extreme price break deterministically to the extreme orderkey
    — max_by/min_by tie behavior is otherwise engine- and
    partition-order-arbitrary, and relying on tie-uniqueness at the
    tested SFs would be a latent nondeterminism at any other SF.

    Scale: same partial-aggregate profile as any min/max — each
    partial carries (value, key) pairs, merge keeps the winner; no
    second pass, no join, no window."""
    o = load(spark, sf_dir, "orders")
    key = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("top_orderkey"),
        F.floor(F.max("o_totalprice") * 100).cast("long").alias("top_cents"),
        F.min_by("o_orderkey", key).alias("bottom_orderkey"),
        F.floor(F.min("o_totalprice") * 100).cast("long").alias("bottom_cents"),
        F.count_if(F.col("o_orderstatus") == "F").cast("long").alias("n_finished"),
    )


@register(
    "d18_bitmap_distinct",
    # The bitmap blobs themselves have no DuckDB twin, but the RELEASED
    # counts are exact, so the oracle is the plain COUNT(DISTINCT) —
    # a full-strength value check (unlike d15's invariant booleans).
    oracle="""
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS n_exact_bitmap,
       COUNT(DISTINCT o_custkey) AS n_recount
FROM orders
GROUP BY o_orderpriority
""",
)
def d18_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d18 (extension): EXACT distinct counting via mergeable roaring
    bitmaps (bitmap_bucket_number / bitmap_bit_position /
    bitmap_construct_agg / bitmap_or_agg / bitmap_count) — the third
    point on the distinct-count design line: d3 exact-but-unmergeable,
    d4/d15 mergeable-but-approximate, d18 BOTH exact and mergeable.
    Keys are bucketed (2^15 bits per bucket), per-(group, bucket)
    bitmaps are the map-side partial, OR-merging is associative, and
    the released count is the bit-count sum — so the oracle checks the
    VALUE against COUNT(DISTINCT), not an error envelope.  The
    released n_recount (a plain countDistinct of the same column)
    must equal the bitmap count — both engines see the equality.

    Scale: per-partition partial bitmaps compress runs of dense ids to
    O(present-bits); the merge shuffles bitmap blobs, not keys — the
    incremental-refresh-safe EXACT distinct (pre-aggregated distinct
    counts under n3/k22 refresh without HLL's error)."""
    o = load(spark, sf_dir, "orders")
    per_bucket = o.groupBy(
        "o_orderpriority",
        F.bitmap_bucket_number(F.col("o_custkey")).alias("bucket"),
    ).agg(
        F.bitmap_construct_agg(F.bitmap_bit_position(F.col("o_custkey"))).alias("bm")
    )
    counts = per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count(F.col("bm"))).cast("long").alias("n_exact_bitmap")
    )
    recount = o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_recount")
    )
    return counts.join(recount, "o_orderpriority")


# ---------------------------------------------------------------------------
# f6: skyline / Pareto frontier
# ---------------------------------------------------------------------------


def skyline_2d(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D skyline (Pareto frontier), maximizing both ``x`` and ``y``:
    rows for which no other row is >= on both dimensions and > on at
    least one.  Ties survive together (two rows equal on both dims do
    not dominate each other).

    Plan shape (the reason this is not a self-join): dominance in 2-D
    collapses to "y must beat every y seen at a strictly larger x".
    Stage 1 reduces the input to one (x, max y) row per distinct x —
    a partial-aggregated groupBy, the only full-data shuffle.  Stage 2
    runs a running-max window over the DISTINCT-x table only (size =
    |distinct x|, grain-bounded for date/bucket domains — 2.4k days in
    this corpus at every SF — so the unpartitioned window is a
    constant-size driver-adjacent step, NOT an O(n) single-partition
    sort).  Stage 3 broadcast-joins the surviving (x, ymax) pairs back
    to recover every tied row.  The naive NOT EXISTS self-join is
    O(n²) and unshippable at scale; this is one shuffle + one tiny
    window + one broadcast.  For continuous x (|distinct x| ~ n),
    pre-bin x to a grain first — the standard distributed-skyline
    local-prune — or range-partition stage 2.
    """
    from pyspark.sql import Window

    per_x = df.groupBy(x).agg(F.max(y).alias("_ymax"))
    w = Window.orderBy(F.col(x).asc()).rowsBetween(1, Window.unboundedFollowing)
    surv = (
        per_x.withColumn("_later", F.max("_ymax").over(w))
        .filter(F.col("_later").isNull() | (F.col("_ymax") > F.col("_later")))
        .select(F.col(x).alias("_sx"), "_ymax")
    )
    return df.join(
        F.broadcast(surv),
        (F.col(x) == F.col("_sx")) & (F.col(y) == F.col("_ymax")),
    ).drop("_sx", "_ymax")


@register(
    "f6_skyline_pareto",
    # Independent formulation: row-level windows (strictly-later-day
    # running max via a RANGE frame + same-day max via PARTITION BY)
    # instead of the engine's groupBy-then-window-then-join-back.  A
    # NOT EXISTS dominance subquery would be the fully independent
    # oracle but is O(n²) (22.5G row pairs at sf0.1).
    oracle="""
WITH f AS (
  SELECT o_orderkey, o_orderdate, o_totalprice,
         MAX(o_totalprice) OVER (ORDER BY o_orderdate DESC
              RANGE BETWEEN UNBOUNDED PRECEDING AND INTERVAL 1 DAY PRECEDING)
           AS later_max,
         MAX(o_totalprice) OVER (PARTITION BY o_orderdate) AS day_max
  FROM orders)
SELECT o_orderkey, o_orderdate, o_totalprice FROM f
WHERE o_totalprice = day_max AND (later_max IS NULL OR o_totalprice > later_max)
""",
)
def f6_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """f6 (extension): SKYLINE / Pareto-frontier operator — the orders
    no other order beats on BOTH recency and value ("undominated big
    recent orders", the multi-criteria shortlist every dashboard's
    scatter plot wants).  Maximizes (o_orderdate, o_totalprice); ties
    on both dims survive together.

    Delegates to ``skyline_2d`` — groupBy-max per day, running max
    over the 2.4k-day distinct-date table, broadcast join back; see
    its docstring for why this is one shuffle instead of the O(n²)
    dominance self-join."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    return skyline_2d(o, "o_orderdate", "o_totalprice")


# ---------------------------------------------------------------------------
# d19: quantile binning / discretization
# ---------------------------------------------------------------------------


def quantile_binning(df: DataFrame, col: str, nbins: int) -> DataFrame:
    """d19's engine: equal-frequency DISCRETIZATION — compute the
    nbins-1 interior quantile edges in ONE exact-percentile aggregate,
    broadcast the single edge row, assign each value its bin with a
    map-side fold over the edge array (bin = 1 + #edges strictly
    below), release the per-bin summary (count, observed min/max).
    The ML feature-prep primitive (quantile bucketing) and the d16
    histogram's equal-POPULATION sibling.

    Engine-exactness note: a data value can never sit inside the ulp
    window of an edge it doesn't equal — interpolated edges lie
    strictly between ADJACENT sorted data values (or collapse exactly
    onto one when the index fraction is 0 or neighbors are equal), so
    the `>` comparison is engine-stable without rounding tricks.

    Scale: the exact percentile aggregate carries a per-partition
    value-count map — fine to ~10⁷ distinct values per column; at
    100 TB swap in approx_percentile (same one-aggregate shape, same
    downstream plan) or d16's mergeable-histogram route.  Binning
    itself is map-side against broadcast edges; the summary is one
    partial-agged groupBy over nbins groups."""
    qs = ", ".join(str(i / nbins) for i in range(1, nbins))
    edges = df.agg(F.expr(f"percentile({col}, array({qs}))").alias("_edges"))
    binned = df.join(F.broadcast(edges)).select(
        F.col(col).alias("_x"),
        (
            F.lit(1)
            + F.aggregate(
                "_edges",
                F.lit(0),
                lambda acc, e: acc + (F.col(col) > e).cast("int"),
            )
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("_x").alias("bin_min"),
        F.max("_x").alias("bin_max"),
    )


def _d19_oracle() -> str:
    nbins = 10
    qs = ", ".join(str(i / nbins) for i in range(1, nbins))
    terms = " + ".join(
        f"(CASE WHEN l_extendedprice > ed[{i}] THEN 1 ELSE 0 END)"
        for i in range(1, nbins)
    )
    return f"""
WITH e AS (SELECT quantile_cont(l_extendedprice, [{qs}]) AS ed FROM lineitem),
b AS (SELECT l_extendedprice AS x, 1 + {terms} AS bin FROM lineitem, e)
SELECT bin, COUNT(*) AS n_rows, MIN(x) AS bin_min, MAX(x) AS bin_max
FROM b GROUP BY 1
"""


@register("d19_quantile_binning", oracle=_d19_oracle())
def d19_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d19 (extension): decile binning of lineitem extended price —
    exact equal-frequency discretization: one percentile aggregate for
    the 9 interior edges, broadcast, map-side bin assignment, per-bin
    (count, min, max) release.  Near-equal bin counts ARE the
    falsifiable signal (an off-by-one in the edge fold shifts
    thousands of rows at every SF).

    Delegates to ``quantile_binning``."""
    li = load(spark, sf_dir, "lineitem").select("l_extendedprice")
    return quantile_binning(li, "l_extendedprice", 10)
