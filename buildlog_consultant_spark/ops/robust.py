"""Robust per-key dispersion statistics — exact quantiles over an
UNBOUNDED integer domain and the 1.5-IQR outlier rule (Tukey fences),
the distribution-free anomaly gate log pipelines run over latency /
value / size columns.

Exactness: nearest-rank order statistics (the value at rank
ceil(p*n/100) under (value) order) — approx_percentile sketches differ
across engines; discrete ranks are bit-portable, and the value AT a
rank is tie-order-independent. The fence comparison is kept integral
by doubling: v is an outlier iff 2*v < 2*q25 - 3*iqr or
2*v > 2*q75 + 3*iqr (1.5*iqr never materializes as a float).

Scale shape (quality_quantiles' histogram two-pass, generalized to an
unbounded value domain): pass 1 is ONE partial+final hash aggregate
groupBy(key, value) — the only corpus-row shuffle, carrying at most
(keys x per-key distinct values) rows after map-side combine. Pass 2
runs the cumulative window and nearest-rank filter over that
histogram; per-window work is the per-key DISTINCT-value count, not
the per-key row count (a hot key with 10^9 rows over a 10^4-value
domain costs 10^4). For a key whose distinct-value count itself
exceeds an executor, range-partition the domain first (documented
limit, same as quality_quantiles). Pass 3 (outlier counting) joins the
keys-sized fence table back BROADCAST and re-scans the corpus once —
fences must exist before any row can be judged, so two scans is the
floor for an exact rule.

NULL policy: NULL values are excluded from both the histogram and the
outlier scan (order statistics over NULL are undefined; SQL aggregates
skip NULLs). A NULL key is its own group (groupBy semantics, identical
in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_quantiles_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ps: tuple = (25, 50, 75),
) -> DataFrame:
    """(key, p, value): per-key nearest-rank p-th percentiles of an
    integral value column, via the histogram two-pass (no per-key
    corpus sort)."""
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy(key_col)
    cum = hist.select(
        key_col,
        value_col,
        "_cnt",
        F.sum("_cnt").over(w_cum).alias("_cum"),
        F.sum("_cnt").over(w_n).alias("_n"),
    )
    # integral DIV, not floor(double /): at per-key counts approaching
    # 2^53 the double quotient can round across the floor boundary and
    # pick a rank off by one vs the oracle's exact integer //
    r = F.expr("CAST((p * _n + 99) DIV 100 AS LONG)")
    return (
        cum.select(
            key_col,
            value_col,
            "_cnt",
            "_cum",
            "_n",
            F.explode(F.array(*[F.lit(int(p)) for p in ps])).alias("p"),
        )
        .where((F.col("_cum") >= r) & (F.col("_cum") - F.col("_cnt") < r))
        .select(key_col, F.col("p").cast("int").alias("p"), value_col)
    )


def iqr_outlier_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """(key, n, q25, q75, n_low, n_high): per-key Tukey-fence outlier
    counts with exact integer arithmetic. ``value_col`` must be
    integral (callers convert floats via the round(x*scale)->long
    convention)."""
    q = exact_quantiles_by_key(df, key_col, value_col, ps=(25, 75))
    fences = (
        q.groupBy(key_col)
        .agg(
            F.max(F.when(F.col("p") == 25, F.col(value_col))).alias("q25"),
            F.max(F.when(F.col("p") == 75, F.col(value_col))).alias("q75"),
        )
        .withColumnRenamed(key_col, "_fk")
    )
    v2 = F.col(value_col) * 2
    lo = F.col("q25") * 2 - (F.col("q75") - F.col("q25")) * 3
    hi = F.col("q75") * 2 + (F.col("q75") - F.col("q25")) * 3
    return (
        df.where(F.col(value_col).isNotNull())
        .join(
            F.broadcast(fences),
            F.col(key_col).eqNullSafe(F.col("_fk")),
        )
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("q25").alias("q25"),
            F.first("q75").alias("q75"),
            F.sum((v2 < lo).cast("long")).alias("n_low"),
            F.sum((v2 > hi).cast("long")).alias("n_high"),
        )
    )


def winsorized_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
    p_lo: int = 5,
    p_hi: int = 95,
) -> DataFrame:
    """(key, n, sum_raw, sum_winsorized, n_clamped_lo, n_clamped_hi):
    per-key sums after clamping values to the exact nearest-rank
    [p_lo, p_hi] percentiles — winsorization, the robust-mean
    normalization that keeps a fat-tailed value column from letting a
    few rows dominate a per-key aggregate. Same machinery and NULL
    policy as iqr_outlier_stats: histogram two-pass percentiles, a
    broadcast fence join, one counting/summing scan; all integers."""
    q = exact_quantiles_by_key(df, key_col, value_col, ps=(p_lo, p_hi))
    fences = (
        q.groupBy(key_col)
        .agg(
            F.max(F.when(F.col("p") == p_lo, F.col(value_col))).alias("_ql"),
            F.max(F.when(F.col("p") == p_hi, F.col(value_col))).alias("_qh"),
        )
        .withColumnRenamed(key_col, "_fk")
    )
    v = F.col(value_col)
    w = F.greatest(F.least(v, F.col("_qh")), F.col("_ql"))
    return (
        df.where(v.isNotNull())
        .join(F.broadcast(fences), F.col(key_col).eqNullSafe(F.col("_fk")))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(v).cast("long").alias("sum_raw"),
            F.sum(w).cast("long").alias("sum_winsorized"),
            F.sum((v < F.col("_ql")).cast("long")).alias("n_clamped_lo"),
            F.sum((v > F.col("_qh")).cast("long")).alias("n_clamped_hi"),
        )
    )


def with_percentile_permille(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_col: str = "permille",
) -> DataFrame:
    """Adds the per-key EXACT percentile rank of ``value_col`` as an
    integer permille: (1000 * |rows in key with value <= v|) DIV n —
    quantile normalization, the cross-language score calibration a
    mixing pipeline runs before comparing quality across corpora (a
    raw score of 70 means different things in different languages; its
    percentile doesn't).

    Scale shape: the (key, value) histogram agg touches corpus rows
    once; the cumulative window runs over the histogram (bounded by
    per-key DISTINCT values); rows get their permille back via ONE
    join on (key, value) — tie-safe by construction, since the
    percentile of a value is a function of (key, value). NULL values
    pass through with NULL permille (their rank is undefined); NULL
    keys are a real group (null-safe join key)."""
    hist = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    ranked = hist.select(
        F.col(key_col).alias("_pk"),
        F.col(value_col).alias("_pv"),
        F.expr(
            "CAST(1000 * SUM(_cnt) OVER ("
            f"PARTITION BY {key_col} ORDER BY {value_col} "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            f"DIV SUM(_cnt) OVER (PARTITION BY {key_col}) AS LONG)"
        ).alias(out_col),
    )
    return df.join(
        ranked,
        F.col(key_col).eqNullSafe(F.col("_pk"))
        & (F.col(value_col) == F.col("_pv")),
        "left",
    ).drop("_pk", "_pv")


def mad_outlier_stats(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """(key, n, med, mad, n_outliers): per-key MEDIAN ABSOLUTE DEVIATION
    outlier counts — the robust z-score rule (|x - med| > 3.5 * MAD,
    Iglewicz-Hoaglin's recommended cutoff) kept exactly integral by
    doubling: 2|x - med| > 7 * MAD. MAD tolerates up to 50% outliers
    (breakdown point) where IQR fences break at 25% — the
    complementary robust gate.

    Scale shape: TWO histogram two-passes (the exact_quantiles_by_key
    machinery) — one for the per-key median, one for the median of
    deviations — each touching corpus rows with one hash agg; medians
    ride broadcast joins. Three corpus scans total (median, deviation
    histogram, outlier count) — the floor for an exact two-level order
    statistic. NULL policy: exact_quantiles_by_key's (NULL values
    excluded; NULL key is a group)."""
    med = (
        exact_quantiles_by_key(df, key_col, value_col, ps=(50,))
        .select(F.col(key_col).alias("_mk"), F.col(value_col).alias("_med"))
    )
    dev = (
        df.where(F.col(value_col).isNotNull())
        .join(F.broadcast(med), F.col(key_col).eqNullSafe(F.col("_mk")))
        .select(
            F.col(key_col),
            F.col(value_col),
            F.col("_med"),
            F.abs(F.col(value_col) - F.col("_med")).alias("_dev"),
        )
    )
    mad = (
        exact_quantiles_by_key(dev, key_col, "_dev", ps=(50,))
        .select(F.col(key_col).alias("_gk"), F.col("_dev").alias("_mad"))
    )
    return (
        dev.join(F.broadcast(mad), F.col(key_col).eqNullSafe(F.col("_gk")))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("_med").alias("med"),
            F.first("_mad").alias("mad"),
            F.sum(
                (F.col("_dev") * 2 > F.col("_mad") * 7).cast("long")
            ).alias("n_outliers"),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
) -> DataFrame:
    """One-row skew diagnostic over a prospective shuffle key — the
    pre-flight check that decides salting (spark/pipeline.py's
    choose_salt_buckets runs the same idea over sampled kind counts):
    (n_keys, n_rows, max_n, p50_n, skew_permille = 1000*max DIV p50,
    suggested_salt = ceil(max/p50)). A key whose hottest group is 40x
    the median needs ~40 salt buckets for even tasks; <= 1 means don't
    salt.

    Scale shape: ONE corpus hash agg to per-key counts, then the exact
    nearest-rank p50 over the COUNT table (bounded by distinct keys;
    a single count histogram two-pass would also work at extreme key
    cardinality — at that point reuse exact_quantiles_by_key on the
    count table). Everything after the first agg is key-table-sized.
    NULL keys count as a group (they hash-partition together too —
    exactly why they matter for skew)."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_n")
    ranked = counts.select(
        "_n",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("_k"),
    )
    return (
        ranked.groupBy()
        .agg(
            F.max("_k").cast("long").alias("n_keys"),
            F.sum("_n").cast("long").alias("n_rows"),
            F.max("_n").cast("long").alias("max_n"),
            F.max(
                F.when(
                    F.col("_rn") == F.expr("CAST((50 * _k + 99) DIV 100 AS LONG)"),
                    F.col("_n"),
                )
            ).cast("long").alias("p50_n"),
        )
        .select(
            "n_keys",
            "n_rows",
            "max_n",
            "p50_n",
            F.expr("CAST(1000 * max_n DIV p50_n AS LONG)").alias(
                "skew_permille"
            ),
            F.expr("CAST((max_n + p50_n - 1) DIV p50_n AS LONG)").alias(
                "suggested_salt"
            ),
        )
    )
