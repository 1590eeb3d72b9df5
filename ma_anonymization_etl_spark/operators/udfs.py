"""UDF / UDAF / UDTF surface — SURVEY.md §2 group L.

The engine's position (SURVEY §4): UDFs are the slow path — row-at-a-
time Python (l1) breaks codegen AND pushdown and exists only as the
documented escape hatch; everything practical goes through Arrow
(pandas_udf / applyInPandas, 10-100× faster).  Each demo here computes
something a native expression could ALSO compute — which is exactly
what lets the DuckDB oracle hash-check the UDF machinery itself.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ma_anonymization_etl_spark.registry import register
from ma_anonymization_etl_spark.sources.io import load


@register(
    "l1_udf_scalar_py",
    oracle="SELECT c_custkey, reverse(c_name) AS name_rev FROM customer",
)
def l1_udf_scalar_py(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l1: row-at-a-time Python UDF (discouraged; shown for surface
    completeness — appears as BatchEvalPython in the plan, blocking
    codegen and pushdown)."""
    rev = F.udf(lambda s: s[::-1] if s is not None else None, StringType())
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", rev("c_name").alias("name_rev"))


@register(
    "l2_udf_pandas_scalar",
    oracle="""
SELECT event_id, ROUND(ln(1 + value), 6) AS log1p_value FROM events
""",
)
def l2_udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l2: vectorized Arrow UDF — numpy log1p over whole batches.
    Identical doubles to the SQL ln(1+x) path, so the Arrow transfer
    machinery itself is what the oracle verifies."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def log1p(v: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(v.to_numpy()))

    e = load(spark, sf_dir, "events")
    return e.select("event_id", F.round(log1p("value"), 6).alias("log1p_value"))


@register(
    "l3_udaf_pandas_grouped",
    oracle="""
WITH r AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, ROUND(AVG(value), 4) AS trimmed_mean
FROM r
WHERE rn > FLOOR(n * 0.1) AND rn <= n - FLOOR(n * 0.1)
GROUP BY event_type
""",
)
def l3_udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l3: custom grouped aggregate (10% trimmed mean) as a GROUPED_AGG
    pandas UDF; the oracle recomputes it relationally (rank, trim,
    avg).  Ties at the trim boundary drop the same value multiset
    either way, so the means agree."""
    import numpy as np

    @F.pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        arr = np.sort(v.to_numpy())
        k = int(len(arr) * 0.1)
        return float(arr[k : len(arr) - k].mean())

    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.round(trimmed_mean("value"), 4).alias("trimmed_mean"))
    )


@register(
    "l4_grouped_map",
    oracle="""
SELECT c_custkey,
       ROUND((c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
             / stddev_samp(c_acctbal) OVER (PARTITION BY c_nationkey), 6) AS bal_z
FROM customer
""",
)
def l4_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l4: per-group DataFrame→DataFrame via applyInPandas (full shuffle
    on the group key) — z-score of balance within nation, with the
    group key reattached in the output schema.  ddof=1 matches
    stddev_samp."""
    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["c_acctbal"]
        z = (v - v.mean()) / v.std(ddof=1)
        return pd.DataFrame({"c_custkey": pdf["c_custkey"], "bal_z": z.round(6)})

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    return c.groupBy("c_nationkey").applyInPandas(zscore, "c_custkey LONG, bal_z DOUBLE")


@register(
    "l5_udtf",
    oracle="""
SELECT doc_id, CAST(i + 1 AS INTEGER) AS pos, w[i + 1] AS word
FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
     (SELECT unnest(range(200)) AS i)
WHERE i < len(w)
""",
)
def l5_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l5: Python UDTF — one text row → (pos, word) rows, applied via
    LATERAL (per-row table function).  Native explode would do the same
    cheaper; the UDTF surface is the point."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, word STRING")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate((text or "").lower().split(" ")):
                yield i + 1, w

    spark.udtf.register("split_words_udtf", SplitWords)
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents_l5")
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.word
        FROM documents_l5 d, LATERAL split_words_udtf(d.text) t
        """
    )


@register(
    "l6_udf_pandas_iterator",
    oracle="""
SELECT o_orderstatus,
       CAST(SUM(CAST(FLOOR(o_totalprice * 1.25 * 10000) AS BIGINT)) AS DOUBLE)
         / 10000 AS adj_total
FROM orders
GROUP BY o_orderstatus
""",
)
def l6_udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l6: ITERATOR-of-series pandas UDF — the Arrow variant whose
    function body runs ONCE per task and streams every batch through
    the same closure, amortizing expensive initialization (model load,
    tokenizer build) across batches instead of paying it per batch.
    The stand-in "model" is a constant price adjustment (1.25 is
    binary-exact, so Spark's multiply and DuckDB's produce identical
    doubles); the aggregate uses the scaled-int64 sum discipline."""
    @F.pandas_udf(DoubleType())
    def adjust(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        factor = 1.25  # expensive init would happen here, once per task
        for s in batches:
            yield s * factor

    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("adj", adjust("o_totalprice"))
        .groupBy("o_orderstatus")
        .agg(
            (
                F.sum(F.floor(F.col("adj") * 10000).cast("long")).cast("double")
                / 10000
            ).alias("adj_total")
        )
    )


@register(
    "l7_map_in_arrow",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT) * 3) AS BIGINT) AS sum_scaled
FROM events
WHERE event_id % 2 = 0
GROUP BY event_type
""",
)
def l7_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l7: ``mapInArrow`` — the zero-copy batch surface below the
    pandas UDFs: the function receives raw ``pyarrow.RecordBatch``es
    and returns RecordBatches, skipping the Arrow→pandas→Arrow round
    trip entirely (no pandas object allocation, no dtype coercion).
    The batch body filters even event_ids and emits a 100-scaled
    integer triple of ``value`` via pyarrow.compute kernels only; the
    final aggregate stays declarative.

    100 TB shape: this is the preferred lane for high-throughput
    columnar Python (feature extraction over binary payloads,
    tokenizers emitting int lists): one C-level kernel pipeline per
    batch, nothing row-at-a-time, output batches flow straight back
    into Tungsten as Arrow."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def triple_even(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            keep = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), 0)
            f = b.filter(keep)
            scaled = pc.multiply(
                pc.cast(pc.floor(pc.multiply(f.column("value"), 100.0)), pa.int64()),
                3,
            )
            yield pa.RecordBatch.from_arrays(
                [f.column("event_type"), scaled], ["event_type", "scaled"]
            )

    e = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = e.mapInArrow(triple_even, "event_type STRING, scaled BIGINT")
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("scaled").alias("sum_scaled")
    )
