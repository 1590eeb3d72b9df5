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


# --- round-7 exactness contracts under random inputs ------------------------
# The prefix-filter joins' entire contract is "equals the exhaustive
# definition"; the fixed corpus pins one distribution, these pin random
# small universes (tiny vocab → heavy collisions → prefix filter under
# maximum stress) against driver-side brute force.

_vocab = st.integers(min_value=0, max_value=7)
_docsets = st.lists(
    st.frozensets(_vocab, min_size=1, max_size=8), min_size=2, max_size=10
)
_taus = st.sampled_from([0.3, 0.5, 0.8, 1.0])


def _brute_jaccard(sets):
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            out[(a, b)] = inter / union
    return out


@settings(max_examples=8, deadline=None)
@given(_docsets, _taus)
def test_set_similarity_join_exact_on_random_universes(spark, docsets, tau):
    from ma_anonymization_etl_spark.operators.llm import set_similarity_join

    sets = {i: set(s) for i, s in enumerate(docsets)}
    rows = [(i, f"t{t}") for i, s in sets.items() for t in s]
    toks = spark.createDataFrame(rows, "doc_id long, tok string")
    got = {
        (r.a_id, r.b_id): r.jaccard
        for r in set_similarity_join(toks, tau).collect()
    }
    want = {
        p: round(j, 6) for p, j in _brute_jaccard(sets).items() if j >= tau
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(_docsets, st.sampled_from([0.5, 0.8, 0.9, 1.0]))
def test_containment_join_exact_on_random_universes(spark, docsets, c):
    from ma_anonymization_etl_spark.operators.llm import containment_join

    sets = {i: set(s) for i, s in enumerate(docsets)}
    rows = [(i, f"t{t}") for i, s in sets.items() for t in s]
    toks = spark.createDataFrame(rows, "doc_id long, tok string")
    got = {
        (r.a_id, r.b_id): r.containment
        for r in containment_join(toks, c).collect()
    }
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b:
                cont = len(sa & sb) / len(sa)
                if cont >= c:
                    want[(a, b)] = round(cont, 6)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)),
        min_size=1,
        max_size=30,
    )
)
def test_skyline_2d_exact_on_random_points(spark, pts):
    from ma_anonymization_etl_spark.operators.relational import skyline_2d

    df = spark.createDataFrame(
        [(i, x, float(y)) for i, (x, y) in enumerate(pts)],
        "id long, x int, y double",
    )
    got = sorted(r.id for r in skyline_2d(df, "x", "y").collect())
    want = sorted(
        i
        for i, (x, y) in enumerate(pts)
        if not any(
            (x2 >= x and y2 >= y and (x2 > x or y2 > y))
            for j, (x2, y2) in enumerate(pts)
            if j != i
        )
    )
    assert got == want
