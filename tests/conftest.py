"""Shared fixtures: one local SparkSession, a DuckDB oracle connection per
scale factor, and a canonicalizing comparator that mirrors the driver's
row-count + column-name + order-insensitive value check (stricter: exact
value equality after canonicalization)."""

from __future__ import annotations

import datetime
import decimal
import math
import os

import duckdb
import pytest

from ma_anonymization_etl_spark.session import get_spark
from ma_anonymization_etl_spark.sources.io import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="mael-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_ORACLE}/{t}.parquet')"
        )
    yield con
    con.close()


def canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0.0:
            v = 0.0  # normalize -0.0
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return repr(v)


def canon_rows(columns: list[str], rows) -> list[tuple[str, ...]]:
    """Sort columns by name (like the driver), canonicalize every value,
    return a sorted multiset of row tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(canon_value(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def _type_family(t: str) -> str:
    """Coarse type families for schema comparison: integer widths are
    interchangeable, everything else must align."""
    t = t.lower()
    if any(x in t for x in ("tinyint", "smallint", "int", "long", "bigint", "hugeint")):
        return "int"
    if any(x in t for x in ("double", "float", "real", "decimal")):
        return "float"
    if "bool" in t:
        return "bool"
    if "timestamp" in t:
        return "timestamp"
    if "date" in t:
        return "date"
    if any(x in t for x in ("binary", "blob")):
        return "binary"
    if any(x in t for x in ("array", "list", "[]")):
        return "array"
    if any(x in t for x in ("string", "varchar", "char")):
        return "string"
    return t


def compare_query(spark, duck, fn, oracle: str, sf_dir: str = SF_ORACLE) -> None:
    sdf = fn(spark, sf_dir)
    s_cols = sdf.columns
    s_types = dict(sdf.dtypes)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracle)  # relation API: real logical types, not DBAPI 'NUMBER'
    d_cols = list(rel.columns)
    d_types = {c: str(t) for c, t in zip(rel.columns, rel.types)}
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    # Oracle-checked projections must stay ARRAY-free: the driver's pandas
    # canonicalizer cannot hash list cells, so an array output is a
    # guaranteed driver MISMATCH even when values agree (j16c regressed
    # this once — serialize with array_join instead).
    for c, t in s_types.items():
        assert "array" not in t.lower(), (
            f"oracle-checked projection has ARRAY column {c}: {t} — "
            "serialize (array_join) before returning"
        )
    # Representation guard: the driver hashes both sides through Arrow, where
    # DuckDB HUGEINT (SUM over INTEGER → int128) and DECIMAL (bare literals
    # like `0.5`) render as decimal128 while Spark emits int64/double — a
    # guaranteed driver hash MISMATCH even when every value is identical
    # (the round-4 h8/k3 reds).  fetchall() normalizes these away, so value
    # comparison alone cannot see them; reject the types outright.
    for c, t in d_types.items():
        tu = t.upper()
        assert "HUGEINT" not in tu and "DECIMAL" not in tu, (
            f"oracle output column {c} has DuckDB type {t} — renders as "
            "decimal128 at the driver's Arrow layer vs Spark int64/double; "
            "CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
        )
    for c in s_cols:
        sf_, df_ = _type_family(s_types[c]), _type_family(d_types[c])
        assert sf_ == df_, f"type family differs for {c}: spark {s_types[c]} vs duckdb {d_types[c]}"
    assert len(s_rows) == len(d_rows), f"row count: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if cs != cd:
        diff_s = [r for r in cs if r not in set(cd)][:5]
        diff_d = [r for r in cd if r not in set(cs)][:5]
        raise AssertionError(
            f"value mismatch ({len(diff_s)}+ rows differ)\n"
            f"spark-only sample: {diff_s}\nduckdb-only sample: {diff_d}\n"
            f"sorted columns: {sorted(s_cols)}"
        )
