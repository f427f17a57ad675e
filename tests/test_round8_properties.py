"""Property tests for the round-6 session-4 operators: randomized
Spark == naive / Spark == replay parity (bucketed range join, signed
truncating OLS division, global NTILE remainder arithmetic, percentile
permille, Levenshtein banded replay). Each example runs real Spark
jobs — example counts deliberately small."""

import math
from fractions import Fraction

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops.fuzzy import _py_lev
from buildlog_consultant_spark.ops.quota import _order_hash, with_global_ntile
from buildlog_consultant_spark.ops.ranges import (
    bucketed_range_join,
    naive_range_join,
)
from buildlog_consultant_spark.ops.regress import ols_fit
from buildlog_consultant_spark.ops.robust import with_percentile_permille


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=20),
    intervals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=280),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=15,
    ),
    width=st.sampled_from([1, 7, 32, 400]),
)
def test_range_join_matches_naive_property(spark, points, intervals, width):
    pts = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, point long"
    )
    rng = spark.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(intervals)],
        "rid long, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["rid"])
        for r in bucketed_range_join(pts, rng, "point", "lo", "hi", width)
        .select("pid", "rid")
        .collect()
    )
    want = sorted(
        (r["pid"], r["rid"])
        for r in naive_range_join(pts, rng, "point", "lo", "hi")
        .select("pid", "rid")
        .collect()
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=-10**6, max_value=10**6),
        ),
        min_size=2,
        max_size=15,
    )
)
def test_ols_matches_fraction_arithmetic(spark, pts):
    """Spark's decimal(38,0) truncating-DIV ppm slope/intercept must
    equal exact Fraction arithmetic truncated toward zero — including
    negative slopes and intercepts."""
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    r = ols_fit(df, ["g"], "x", "y").first()
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    den = n * sxx - sx * sx
    assert (r["n"], r["sx"], r["sy"], r["sxy"], r["sxx"]) == (
        n, sx, sy, sxy, sxx,
    )
    if den == 0:
        assert r["slope_ppm"] is None and r["intercept_ppm"] is None
    else:
        assert r["slope_ppm"] == math.trunc(
            Fraction(1_000_000 * (n * sxy - sx * sy), den)
        )
        assert r["intercept_ppm"] == math.trunc(
            Fraction(1_000_000 * (sy * sxx - sx * sxy), den)
        )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=60),
    k=st.integers(min_value=1, max_value=12),
    stride=st.sampled_from([1, 13, 37]),
)
def test_global_ntile_matches_window_property(spark, n, k, stride):
    df = spark.range(n).select((F.col("id") * stride).alias("doc_id"))
    got = {
        r["doc_id"]: (r["rank"], r["tile"])
        for r in with_global_ntile(df, k, bucket_hex_chars=1).collect()
    }
    w = Window.orderBy(_order_hash("doc_id"), "doc_id")
    want = {
        r["doc_id"]: (r["rn"], r["t"])
        for r in df.select(
            "doc_id",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("t"),
        ).collect()
    }
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", None]),
            st.one_of(st.none(), st.integers(min_value=-20, max_value=20)),
        ),
        min_size=1,
        max_size=18,
    )
)
def test_percentile_permille_matches_python(spark, rows):
    df = spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(rows)],
        "id long, k string, v long",
    )
    got = {
        r["id"]: r["permille"]
        for r in with_percentile_permille(df, "k", "v").collect()
    }
    bykey: dict = {}
    for _, (k, v) in enumerate(rows):
        if v is not None:
            bykey.setdefault(k, []).append(v)
    for i, (k, v) in enumerate(rows):
        if v is None:
            assert got[i] is None
        else:
            vs = bykey[k]
            assert got[i] == 1000 * sum(1 for x in vs if x <= v) // len(vs)


@given(
    a=st.text(alphabet="abcé", max_size=12),
    b=st.text(alphabet="abcé", max_size=12),
    k=st.integers(min_value=0, max_value=12),
)
@settings(max_examples=200, deadline=None)
def test_py_lev_band_matches_full_dp(a, b, k):
    """The banded early-exit must agree with the unbanded DP: exact
    distance when <= k, else -1."""
    full = _py_lev(a, b, 10**9)
    assert full >= 0
    banded = _py_lev(a, b, k)
    assert banded == (full if full <= k else -1)
