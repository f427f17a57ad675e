"""Round-6 session-4 operators: bucketed point-in-interval range join,
Markov event-transition table, exact-integer per-group OLS, planted-
graph triangle counting, global exact NTILE without a global sort."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


# ---------------------------------------------------------------------------
# bucketed_range_join
# ---------------------------------------------------------------------------


def _rj_frames(spark):
    pts = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 31), (4, 32), (5, 99), (6, None)],
        "pid long, point long",
    )
    rng = spark.createDataFrame(
        [
            (10, 0, 9),       # matches 5
            (11, 5, 35),      # matches 5, 10, 31, 32 (spans a bucket edge)
            (12, 33, 33),     # point-interval, no match
            (13, 99, 99),     # matches 99 exactly
            (14, 50, 40),     # inverted → dropped
            (15, None, 7),    # NULL lo → dropped
            (16, 3, None),    # NULL hi → dropped
        ],
        "rid long, lo long, hi long",
    )
    return pts, rng


def test_range_join_matches_naive(spark):
    from buildlog_consultant_spark.ops.ranges import (
        bucketed_range_join,
        naive_range_join,
    )

    pts, rng = _rj_frames(spark)
    for b in (1, 7, 32, 1000):
        got = sorted(
            (r["pid"], r["rid"])
            for r in bucketed_range_join(pts, rng, "point", "lo", "hi", b)
            .select("pid", "rid")
            .collect()
        )
        want = sorted(
            (r["pid"], r["rid"])
            for r in naive_range_join(pts, rng, "point", "lo", "hi")
            .select("pid", "rid")
            .collect()
        )
        assert got == want, f"bucket_width={b}"
    assert want == [
        (1, 10),
        (1, 11),
        (2, 11),
        (3, 11),
        (4, 11),
        (5, 13),
    ]


def test_range_join_no_nested_loop_plan(spark):
    from buildlog_consultant_spark.ops.ranges import bucketed_range_join

    pts, rng = _rj_frames(spark)
    # Force the shuffle path so the assertion covers the cluster-scale
    # plan, not the toy-broadcast one.
    with_conf = spark.conf
    old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
    with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            bucketed_range_join(pts, rng, "point", "lo", "hi", 32)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
    finally:
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "_bucket" in plan


def test_range_join_rejects_bad_width(spark):
    from buildlog_consultant_spark.ops.ranges import bucketed_range_join

    pts, rng = _rj_frames(spark)
    with pytest.raises(ValueError):
        bucketed_range_join(pts, rng, "point", "lo", "hi", 0)


# ---------------------------------------------------------------------------
# event_transitions
# ---------------------------------------------------------------------------


def test_event_transitions_counts_and_permille(spark):
    from buildlog_consultant_spark.ops.funnel import event_transitions

    rows = [
        # user 1: view -> click -> view -> click  (ties broken by id)
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "view"),
        (4, 1, "2024-01-01 00:02:00", "click"),  # same ts as id 3
        # user 2: view -> NULL -> view  (NULL is a real state)
        (5, 2, "2024-01-01 00:00:00", "view"),
        (6, 2, "2024-01-01 00:01:00", None),
        (7, 2, "2024-01-01 00:02:00", "view"),
        # NULL user: excluded entirely
        (8, None, "2024-01-01 00:00:00", "view"),
        (9, None, "2024-01-01 00:01:00", "click"),
        # user 3: single event → no transition
        (10, 3, "2024-01-01 00:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["from_state"], r["to_state"]): (r["n"], r["p_permille"])
        for r in event_transitions(ev).collect()
    }
    # from view: ->click x2, ->NULL x1 → permille 666 / 333
    assert got[("view", "click")] == (2, 666)
    assert got[("view", None)] == (1, 333)
    assert got[("click", "view")] == (1, 1000)
    assert got[(None, "view")] == (1, 1000)
    assert ("purchase", "view") not in got
    assert sum(n for n, _ in got.values()) == 5  # 9 non-NULL-user events, 4 firsts


def test_event_transitions_empty(spark):
    from buildlog_consultant_spark.ops.funnel import event_transitions

    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    assert event_transitions(ev).count() == 0


# ---------------------------------------------------------------------------
# ols_fit
# ---------------------------------------------------------------------------


def test_ols_exact_line(spark):
    from buildlog_consultant_spark.ops.regress import ols_fit

    # y = 3x + 7 exactly → slope_ppm = 3_000_000, intercept_ppm = 7_000_000
    rows = [("g", x, 3 * x + 7) for x in (1, 2, 5, 10, 100)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit(df, ["g"], "x", "y").first()
    assert r["n"] == 5
    assert r["slope_ppm"] == 3_000_000
    assert r["intercept_ppm"] == 7_000_000


def test_ols_negative_slope_truncation_matches_duckdb(spark):
    import duckdb

    from buildlog_consultant_spark.ops.regress import ols_fit

    # Negative, non-integral slope (den has a factor 7, so the ppm
    # value never terminates): exercises signed truncating DIV.
    rows = [("g", 0, 9), ("g", 1, 7), ("g", 2, 4), ("g", 4, 1)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    r = ols_fit(df, ["g"], "x", "y").first()
    vals = ",".join(f"({x},{y})" for _, x, y in rows)
    num, den = duckdb.sql(
        f"""
        SELECT 4*SUM(x*y) - SUM(x)*SUM(y), 4*SUM(x*x) - SUM(x)*SUM(x)
        FROM (VALUES {vals}) t(x, y)
        """
    ).fetchone()
    assert num < 0
    # truncation toward zero (Spark DIV ≡ DuckDB // ≡ C), not floor:
    from fractions import Fraction
    import math

    exact = Fraction(1_000_000 * num, den)
    assert r["slope_ppm"] == math.trunc(exact)
    assert math.trunc(exact) != math.floor(exact)  # the case actually bites


def test_ols_degenerate_groups(spark):
    from buildlog_consultant_spark.ops.regress import ols_fit

    rows = [
        ("one_point", 4, 9),
        ("const_x", 2, 1),
        ("const_x", 2, 5),
        ("has_nulls", 1, 2),
        ("has_nulls", None, 99),
        ("has_nulls", 3, None),
        ("has_nulls", 2, 4),
    ]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r["g"]: r for r in ols_fit(df, ["g"], "x", "y").collect()}
    assert got["one_point"]["slope_ppm"] is None
    assert got["const_x"]["slope_ppm"] is None
    # has_nulls: only (1,2) and (2,4) survive → y = 2x
    assert got["has_nulls"]["n"] == 2
    assert got["has_nulls"]["slope_ppm"] == 2_000_000
    assert got["has_nulls"]["intercept_ppm"] == 0


def test_ols_single_agg_plan(spark):
    from buildlog_consultant_spark.ops.regress import ols_fit

    df = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("x"),
        (F.col("id") * 2).alias("y"),
    )
    plan = (
        ols_fit(df, ["g"], "x", "y")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one shuffle: partial→final agg
    assert "Window" not in plan and "Join" not in plan


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------


def _py_triangles(n):
    """Brute-force replay of the planted graph's triangles."""
    from buildlog_consultant_spark.ops.graph import _M32, _MIX_A, _MIX_B, _MIX_C, OUT_DEG

    und = set()
    for u in range(n):
        for j in range(OUT_DEG):
            t = ((u * _MIX_A + j * _MIX_B + _MIX_C) % _M32) % n
            if t == u:
                t = (t + 1) % n
            if t != u:
                und.add((min(u, t), max(u, t)))
    counts = {}
    for a, b in und:
        for c in range(n):
            if c > b and (b, c) in und and (a, c) in und:
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    return counts


def test_triangle_counts_matches_bruteforce(spark):
    from buildlog_consultant_spark.ops.graph import triangle_counts

    n = 60
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(docs).collect()
    }
    assert got == _py_triangles(n)
    assert sum(got.values()) % 3 == 0  # every triangle contributes 3 corners


def test_triangle_counts_null_and_empty(spark):
    from buildlog_consultant_spark.ops.graph import triangle_counts

    empty = spark.createDataFrame([], "doc_id long")
    assert triangle_counts(empty).count() == 0
    withnull = spark.createDataFrame(
        [(i,) for i in range(40)] + [(None,)], "doc_id long"
    )
    pure = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = sorted(map(tuple, triangle_counts(withnull).collect()))
    b = sorted(map(tuple, triangle_counts(pure).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# with_global_ntile
# ---------------------------------------------------------------------------


def _ntile_reference(spark, df, k, id_col="doc_id"):
    from buildlog_consultant_spark.ops.quota import _order_hash

    w = Window.orderBy(_order_hash(id_col), id_col)
    return {
        r[id_col]: r["t"]
        for r in df.select(id_col, F.ntile(k).over(w).alias("t")).collect()
    }


@pytest.mark.parametrize("n,k", [(10, 4), (7, 3), (5, 8), (64, 4), (1, 1), (100, 7)])
def test_global_ntile_matches_window_ntile(spark, n, k):
    from buildlog_consultant_spark.ops.quota import with_global_ntile

    df = spark.range(n).select((F.col("id") * 13 % 101).alias("doc_id"))
    got = {
        r["doc_id"]: r["tile"]
        for r in with_global_ntile(df, k, bucket_hex_chars=1).collect()
    }
    assert got == _ntile_reference(spark, df, k)


def test_global_ntile_front_loads_remainder(spark):
    from buildlog_consultant_spark.ops.quota import with_global_ntile

    # n=10, k=4 → tile sizes must be 3,3,2,2 (SQL NTILE), not 3,2,3,2.
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    sizes = (
        with_global_ntile(df, 4)
        .groupBy("tile")
        .count()
        .orderBy("tile")
        .collect()
    )
    assert [r["count"] for r in sizes] == [3, 3, 2, 2]


def test_global_ntile_no_new_corpus_shuffle(spark):
    from buildlog_consultant_spark.ops.quota import (
        with_global_cumsum,
        with_global_ntile,
    )

    df = spark.range(1000).select(F.col("id").alias("doc_id"))

    def plan(d):
        return d._jdf.queryExecution().executedPlan().toString()

    base = plan(with_global_cumsum(df, F.lit(1), out_col="_rank"))
    nt = plan(with_global_ntile(df, 10))
    # The tile arithmetic must add ZERO hash shuffles on top of the
    # already-audited bucketed cumsum; the total count joins in as a
    # broadcast one-row aggregate, not another corpus exchange.
    assert nt.count("Exchange hashpartitioning") == base.count(
        "Exchange hashpartitioning"
    )
    assert "BroadcastExchange" in nt or "BroadcastQueryStage" in nt


def test_global_ntile_rejects_bad_k(spark):
    from buildlog_consultant_spark.ops.quota import with_global_ntile

    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        with_global_ntile(df, 0)
