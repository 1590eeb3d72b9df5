"""Hypothesis property tests for the pure column transforms — random
inputs beyond the corpus distribution (negatives, tiny/huge magnitudes,
short strings) exercising invariants the oracle corpus can't.

Kept cheap: one Spark job per example, few examples — the point is
adversarial inputs, not volume."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ma_anonymization_etl_spark.operators import anonymize as A

finite_doubles = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50), st.sampled_from([1, 10, 100, 500]))
def test_generalize_numeric_bin_contains_value(spark, xs, width):
    df = spark.createDataFrame([(x,) for x in xs], "x DOUBLE")
    rows = df.select(
        "x", A.generalize_numeric("x", width).alias("b")
    ).collect()
    for r in rows:
        # Tolerance: floor(x/w)*w can slip one bin at float-division
        # boundaries (x within half an ulp of a multiple of w).
        eps = abs(r["x"]) * 1e-12 + 1e-12
        assert r["b"] - eps <= r["x"] < r["b"] + width + eps
        assert r["b"] % width == 0


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(codec="ascii", exclude_characters="\x00"),
                        min_size=0, max_size=30), min_size=1, max_size=30),
       st.integers(min_value=1, max_value=8))
def test_mask_partial_keeps_suffix_and_length(spark, names, keep):
    df = spark.createDataFrame([(n,) for n in names], "s STRING")
    rows = df.select("s", A.mask_partial("s", keep).alias("m")).collect()
    for r in rows:
        s, m = r["s"], r["m"]
        assert len(m) == len(s)
        tail = s[-keep:] if len(s) > keep else s
        assert m.endswith(tail)
        assert set(m[: len(m) - len(tail)]) <= {"*"}


@settings(max_examples=8, deadline=None)
@given(st.lists(finite_doubles, min_size=1, max_size=50))
def test_range_label_parses_back(spark, xs):
    width = 500
    df = spark.createDataFrame([(x,) for x in xs], "x DOUBLE")
    rows = df.select("x", A.generalize_range_label("x", width).alias("lbl")).collect()
    for r in rows:
        lo_s, hi_s = r["lbl"][1:-1].split(",")
        lo, hi = int(lo_s), int(hi_s)
        assert hi - lo == width
        eps = abs(r["x"]) * 1e-12 + 1e-12
        assert lo - eps <= r["x"] < hi + eps


@settings(max_examples=6, deadline=None)
@given(st.lists(finite_doubles, min_size=4, max_size=60))
def test_top_bottom_code_bounds(spark, xs):
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i LONG, x DOUBLE")
    out = A.top_bottom_code(df, "x", 0.1, 0.9, out="coded").collect()
    lo = min(r["coded"] for r in out)
    hi = max(r["coded"] for r in out)
    xs_sorted = sorted(xs)
    # Clamped range is within the original data range and ordered.
    assert xs_sorted[0] <= lo <= hi <= xs_sorted[-1]
    for r in out:
        assert lo <= r["coded"] <= hi
        assert not math.isnan(r["coded"])
