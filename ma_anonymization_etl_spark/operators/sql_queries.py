"""SQL-surface demo queries (SURVEY §3 lifecycle / §2 stretch): TPC-H
queries submitted as SQL TEXT through ``sql.run_sql``, exercising the
parser → Catalyst path rather than the DataFrame builder.

Each query is ONE dialect-portable SQL string registered as BOTH the
Spark query and the DuckDB oracle — zero translation, the strongest
cross-engine parity form.  Queries are adapted to the corpus where it
lacks a TPC-H column (noted per query); predicate dates sit inside the
corpus's 1995-2001 range.

Scale notes: these plans get full Catalyst treatment — s1/s6 are
scan+partial-agg (predicate pushed to parquet), s3/s5/s10 shuffle-join
fact tables with broadcast dims exactly like their DataFrame twins
(c1/c2); AQE handles the final join ordering at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ma_anonymization_etl_spark.functions.numeric import sql_dsum, sql_ravg
from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sql import run_sql

_REVENUE = "l_extendedprice * (1 - l_discount)"

S1_TPCH_Q1 = f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       {sql_dsum(_REVENUE, 'sum_disc_price')},
       {sql_dsum(_REVENUE + ' * (1 + l_tax)', 'sum_charge')},
       {sql_ravg('l_quantity', 'avg_qty')},
       {sql_ravg('l_extendedprice', 'avg_price')},
       {sql_ravg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

S3_TPCH_Q3 = f"""
SELECT l_orderkey,
       {sql_dsum(_REVENUE, 'revenue')},
       o_orderdate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""

S5_TPCH_Q5 = f"""
SELECT n_name,
       {sql_dsum(_REVENUE, 'revenue')}
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

S6_TPCH_Q6 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

S10_TPCH_Q10 = f"""
SELECT c_custkey,
       c_name,
       {sql_dsum(_REVENUE, 'revenue')},
       c_acctbal,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


S14_TPCH_Q14 = """
SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)
                     ELSE 0 END) AS DOUBLE)
     / CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS DOUBLE)
     * 100 AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
"""


S7_TPCH_Q7 = f"""
SELECT supp_nation,
       cust_nation,
       l_year,
       {sql_dsum('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(YEAR FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                       AND TIMESTAMP '1997-12-31 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

S8_TPCH_Q8 = """
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_9' THEN vol ELSE 0 END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT) AS vol,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                        AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

S13_TPCH_Q13 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

S15_TPCH_Q15 = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(revenue0.total_revenue AS DOUBLE) / 10000 AS total_revenue
FROM supplier
JOIN revenue0 ON s_suppkey = supplier_no
WHERE revenue0.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
ORDER BY s_suppkey
"""

S17_TPCH_Q17 = """
WITH pq AS (
  SELECT l_partkey AS pk,
         SUM(CAST(l_quantity AS BIGINT)) AS sq,
         COUNT(*) AS cnt
  FROM lineitem
  GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
       / 10000 / 7 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pq ON pk = l_partkey
WHERE p_brand = 'Brand#3'
  AND 5 * CAST(l_quantity AS BIGINT) * cnt < sq
"""

S18_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey AS ok, SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN big ON o_orderkey = ok
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""

S19_TPCH_Q19 = f"""
SELECT {sql_dsum(_REVENUE, 'revenue')}
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity >= 1 AND l_quantity <= 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity >= 10 AND l_quantity <= 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity >= 20 AND l_quantity <= 30)
"""

S22_TPCH_Q22 = """
WITH pos AS (
  SELECT c_custkey, c_nationkey, c_acctbal,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
avg_bal AS (
  SELECT SUM(cents) AS total, COUNT(*) AS n FROM pos WHERE cents > 0
)
SELECT c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(cents) AS DOUBLE) / 100 AS totacctbal
FROM pos p, avg_bal a
WHERE p.cents * a.n > a.total
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = p.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


def _sql_query(name: str, sql: str, doc: str):
    @register(name, oracle=sql)
    def q(spark: SparkSession, sf_dir: str, _sql: str = sql) -> DataFrame:
        return run_sql(spark, sf_dir, _sql)

    q.__doc__ = doc
    q.__name__ = name
    return q


_sql_query(
    "s1_tpch_q1_sql",
    S1_TPCH_Q1,
    "TPC-H Q1 (pricing summary) submitted as SQL text — parser → Catalyst "
    "path; identical text runs on DuckDB as the oracle.",
)
_sql_query(
    "s3_tpch_q3_sql",
    S3_TPCH_Q3,
    "TPC-H Q3 (shipping priority; corpus lacks o_shippriority — dropped "
    "from the projection) as dialect-portable SQL text.",
)
_sql_query(
    "s5_tpch_q5_sql",
    S5_TPCH_Q5,
    "TPC-H Q5 (local supplier volume) as SQL text — 6-table join with "
    "broadcast dims + shuffled facts under AQE.",
)
_sql_query(
    "s6_tpch_q6_sql",
    S6_TPCH_Q6,
    "TPC-H Q6 (forecast revenue) as SQL text — pure scan + pushed "
    "predicates + one global aggregate.",
)
_sql_query(
    "s14_tpch_q14_sql",
    S14_TPCH_Q14,
    "TPC-H Q14 (promo revenue share) as SQL text — the numerator and "
    "denominator are scaled-int64 exact sums, so the final division is "
    "identical IEEE on both engines.",
)
_sql_query(
    "s10_tpch_q10_sql",
    S10_TPCH_Q10,
    "TPC-H Q10 (returned items; corpus lacks c_phone/c_comment — dropped) "
    "as SQL text with tie-broken top-20.",
)
_sql_query(
    "s7_tpch_q7_sql",
    S7_TPCH_Q7,
    "TPC-H Q7 (volume shipping between two nations) as SQL text — the "
    "double nation join resolves to two broadcast hash joins over the "
    "shuffled lineitem⋈orders⋈customer spine; EXTRACT(YEAR) is "
    "dialect-portable.",
)
_sql_query(
    "s8_tpch_q8_sql",
    S8_TPCH_Q8,
    "TPC-H Q8 (national market share; corpus lacks p_mfgr — p_type filter "
    "instead) — the share ratio divides two exact scaled-int64 sums, so "
    "the final ROUND(·,6) is identical IEEE on both engines.",
)
_sql_query(
    "s13_tpch_q13_sql",
    S13_TPCH_Q13,
    "TPC-H Q13 (customer order-count distribution; corpus lacks o_comment "
    "— o_orderpriority filter instead) — LEFT JOIN with a pushed-into-ON "
    "predicate, double aggregation, pure integer output.",
)
_sql_query(
    "s15_tpch_q15_sql",
    S15_TPCH_Q15,
    "TPC-H Q15 (top supplier; the view rewritten as a CTE) — the max "
    "comparison runs on exact int64 scaled revenue, so equality with the "
    "scalar subquery is deterministic, not float-fragile.",
)
_sql_query(
    "s17_tpch_q17_sql",
    S17_TPCH_Q17,
    "TPC-H Q17 (small-quantity-order revenue) — the 0.2·avg(l_quantity) "
    "correlated subquery is rewritten as the cross-multiplied integer "
    "predicate 5·qty·cnt < sum_qty over a grouped CTE: exact on both "
    "engines and one shuffle instead of a per-row subquery.",
)
_sql_query(
    "s18_tpch_q18_sql",
    S18_TPCH_Q18,
    "TPC-H Q18 (large-volume customers; threshold 250 ≈ corpus p99.5 of "
    "per-order quantity) — HAVING on an exact integer sum, then a "
    "tie-broken top-20 join back to customer/orders.",
)
_sql_query(
    "s19_tpch_q19_sql",
    S19_TPCH_Q19,
    "TPC-H Q19 (discounted revenue, disjunctive brand/size/quantity "
    "predicates; corpus lacks p_container/l_shipmode — dropped) — one "
    "join with an OR-of-conjuncts residual filter.",
)
_sql_query(
    "s22_tpch_q22_sql",
    S22_TPCH_Q22,
    "TPC-H Q22 (global sales opportunity; corpus lacks c_phone — "
    "c_nationkey is the country code, and 'no recent orders' replaces "
    "'no orders' since every corpus customer has orders) — the "
    "acctbal > avg predicate is the cross-multiplied integer form "
    "cents·n > total, exact on both engines; NOT EXISTS anti-joins "
    "orders.",
)


S23_ANON_RELEASE = """
WITH g AS (
  SELECT md5('s23|' || c_name) AS name_token,
         c_nationkey,
         CAST(FLOOR(c_acctbal / 500) * 500 AS BIGINT) AS bal_bin
  FROM customer
),
k AS (
  SELECT c_nationkey, bal_bin, COUNT(*) AS class_n
  FROM g GROUP BY c_nationkey, bal_bin
)
SELECT g.name_token, g.c_nationkey, g.bal_bin, k.class_n
FROM g JOIN k ON k.c_nationkey = g.c_nationkey AND k.bal_bin = g.bal_bin
WHERE k.class_n >= 8
"""

_sql_query(
    "s23_anonymize_sql",
    S23_ANON_RELEASE,
    "A complete k-anonymous release written as ONE dialect-portable SQL "
    "text (pseudonymize the DI with salted md5, generalize the SA into "
    "500-wide bins, suppress classes under k=8) — the engine's "
    "anonymization semantics are reachable from the pure SQL surface, "
    "and the identical text runs on DuckDB as the oracle.  md5 is the "
    "portable hash (DuckDB spells sha2 differently); COUNT(*) keeps the "
    "k-filter HUGEINT-free.",
)

S24_DEDUP_SQL = """
WITH h AS (SELECT doc_id, source, md5(text) AS h FROM documents),
r AS (
  SELECT doc_id, source, h,
         ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
  FROM h
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN rn = 1 THEN 1 END) AS n_unique,
       COUNT(CASE WHEN rn > 1 THEN 1 END) AS n_dup_dropped
FROM r GROUP BY source
"""

_sql_query(
    "s24_dedup_sql",
    S24_DEDUP_SQL,
    "Exact content-hash dedup accounting as ONE portable SQL text "
    "(md5 → first-occurrence ROW_NUMBER survivorship → per-source audit) "
    "— j1/j2's semantics from the SQL surface; conditional COUNT (not "
    "SUM) keeps every output column BIGINT on both engines.",
)


# s25: gap-based sessionization as ONE portable text — k3's exact oracle
# SQL (lag → flag → running sum → session rollup) submitted through
# spark.sql, proving the sessionization semantics are reachable from the
# pure SQL surface on both engines.
from ma_anonymization_etl_spark.operators.events import _SESSION_SQL  # noqa: E402

_sql_query(
    "s25_sessionize_sql",
    _SESSION_SQL,
    "Gap-based sessionization (30-min inactivity gap) as ONE "
    "dialect-portable SQL text — the identical lag → flag → running-sum "
    "→ rollup text runs on Spark (parser → Catalyst) and on DuckDB as "
    "the oracle; k3 is the DataFrame twin of the same contract.",
)
