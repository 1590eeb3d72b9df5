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
