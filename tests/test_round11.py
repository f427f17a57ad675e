"""Round-6 session-4 batch 3: calendar gap-fill, winsorized stats,
session path trigrams, per-key percentile (quantile) normalization."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

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
# gap_fill_hourly
# ---------------------------------------------------------------------------


def test_gap_fill_hourly(spark):
    from buildlog_consultant_spark.ops.anomaly import gap_fill_hourly

    rows = [
        (1, "a", "2024-01-01 00:10:00"),
        (2, "a", "2024-01-01 00:40:00"),   # same hour as 1
        (3, "a", "2024-01-01 03:05:00"),   # gap: hours 01, 02 missing
        (4, "b", "2024-01-01 05:00:00"),   # single-hour series
        (5, None, "2024-01-01 07:00:00"),  # NULL type is a real series
        (6, "a", None),                    # NULL ts excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["event_type"], str(r["hour"])): r["n"]
        for r in gap_fill_hourly(ev).collect()
    }
    assert got[("a", "2024-01-01 00:00:00")] == 2
    assert got[("a", "2024-01-01 01:00:00")] == 0
    assert got[("a", "2024-01-01 02:00:00")] == 0
    assert got[("a", "2024-01-01 03:00:00")] == 1
    assert ("a", "2024-01-01 04:00:00") not in got  # spine ends at max
    assert got[("b", "2024-01-01 05:00:00")] == 1
    assert got[(None, "2024-01-01 07:00:00")] == 1
    assert len(got) == 6


def test_gap_fill_dense_and_zero_sum(spark):
    from buildlog_consultant_spark.ops.anomaly import gap_fill_hourly

    ev = spark.createDataFrame(
        [(i, "x", f"2024-01-01 {i:02d}:30:00") for i in range(0, 24, 7)],
        "event_id long, event_type string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = gap_fill_hourly(ev).collect()
    # spans hours 0..21 → 22 dense rows; zero rows = 22 - 4 active
    assert len(out) == 22
    assert sum(r["n"] for r in out) == 4
    hours = sorted(str(r["hour"]) for r in out)
    assert hours[0] == "2024-01-01 00:00:00" and hours[-1] == "2024-01-01 21:00:00"


# ---------------------------------------------------------------------------
# winsorized_stats
# ---------------------------------------------------------------------------


def test_winsorized_stats(spark):
    from buildlog_consultant_spark.ops.robust import winsorized_stats

    # 20 values 1..20: p5 rank ceil(20*5/100)=1 → 1; p95 rank 19 → 19
    rows = [("a", v) for v in range(1, 21)]
    rows[0] = ("a", -1000)   # becomes the p5 value itself? no: sorted min
    df = spark.createDataFrame(rows, "k string, v long")
    r = {x["k"]: x for x in winsorized_stats(df, "k", "v").collect()}["a"]
    # sorted: -1000,2..20 → p5 = -1000 (rank 1), p95 = 19 (rank 19)
    assert r["n"] == 20
    assert r["sum_raw"] == sum(v for _, v in rows)
    # clamp: only 20 > 19 clamps high (to 19); nothing below -1000
    assert r["n_clamped_lo"] == 0 and r["n_clamped_hi"] == 1
    assert r["sum_winsorized"] == r["sum_raw"] - 1


def test_winsorized_matches_python(spark):
    from buildlog_consultant_spark.ops.robust import winsorized_stats

    import math

    vals = [((i * 37) % 7, (i * i * 13) % 501 - 50) for i in range(300)]
    df = spark.createDataFrame(
        [(str(k), v) for k, v in vals], "k string, v long"
    )
    got = {r["k"]: r for r in winsorized_stats(df, "k", "v").collect()}
    bykey: dict = {}
    for k, v in vals:
        bykey.setdefault(str(k), []).append(v)
    for k, vs in bykey.items():
        s = sorted(vs)
        n = len(s)
        ql = s[math.ceil(5 * n / 100) - 1]
        qh = s[math.ceil(95 * n / 100) - 1]
        wsum = sum(min(max(v, ql), qh) for v in vs)
        r = got[k]
        assert (r["n"], r["sum_raw"], r["sum_winsorized"]) == (
            n, sum(vs), wsum,
        ), k
        assert r["n_clamped_lo"] == sum(1 for v in vs if v < ql)
        assert r["n_clamped_hi"] == sum(1 for v in vs if v > qh)


# ---------------------------------------------------------------------------
# session_path_trigrams
# ---------------------------------------------------------------------------


def test_session_path_trigrams(spark):
    from buildlog_consultant_spark.ops.funnel import session_path_trigrams

    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "view"),
        (3, 1, "2024-01-01 00:02:00", "click"),
        (4, 1, "2024-01-01 00:03:00", "purchase"),
        # user 2: only two events → no trigram
        (5, 2, "2024-01-01 00:00:00", "view"),
        (6, 2, "2024-01-01 00:01:00", "click"),
        # user 3: NULL state mid-path is a real state
        (7, 3, "2024-01-01 00:00:00", "view"),
        (8, 3, "2024-01-01 00:01:00", None),
        (9, 3, "2024-01-01 00:02:00", "error"),
        (10, None, "2024-01-01 00:00:00", "view"),  # NULL user excluded
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["s1"], r["s2"], r["s3"]): r["n"]
        for r in session_path_trigrams(ev).collect()
    }
    assert got[("view", "view", "click")] == 1
    assert got[("view", "click", "purchase")] == 1
    assert got[("view", None, "error")] == 1
    assert len(got) == 3


def test_trigrams_single_window_sort_plan(spark):
    from buildlog_consultant_spark.ops.funnel import session_path_trigrams

    ev = spark.range(1000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 50).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        (F.col("id") % 3).cast("string").alias("event_type"),
    )
    plan = (
        session_path_trigrams(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # two lags + row_number share one window spec → ONE Window operator
    assert plan.count("Window") == 1


# ---------------------------------------------------------------------------
# with_percentile_permille
# ---------------------------------------------------------------------------


def test_percentile_permille_exact(spark):
    from buildlog_consultant_spark.ops.robust import with_percentile_permille

    rows = [("a", 10), ("a", 20), ("a", 20), ("a", 30), ("b", 5), ("a", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = sorted(
        [
            (r["k"], r["v"], r["permille"])
            for r in with_percentile_permille(df, "k", "v").collect()
        ],
        key=lambda t: (t[0], t[1] if t[1] is not None else -1),
    )
    # key a (n=4): v=10 → 1000*1//4=250; v=20 → 1000*3//4=750 (ties share);
    # v=30 → 1000; NULL → NULL passthrough
    assert got == [
        ("a", None, None),
        ("a", 10, 250),
        ("a", 20, 750),
        ("a", 20, 750),
        ("a", 30, 1000),
        ("b", 5, 1000),
    ]


def test_percentile_permille_null_key_group(spark):
    from buildlog_consultant_spark.ops.robust import with_percentile_permille

    rows = [(None, 1), (None, 2), ("x", 2)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r["k"], r["v"]): r["permille"]
        for r in with_percentile_permille(df, "k", "v").collect()
    }
    assert got[(None, 1)] == 500
    assert got[(None, 2)] == 1000
    assert got[("x", 2)] == 1000


# ---------------------------------------------------------------------------
# image dHash + banded near-dup pairs
# ---------------------------------------------------------------------------


def test_image_dhash_roundtrip_and_golden():
    """decode(encode(px)) == px (BMP lossless) and the UDF-side hash
    equals the by-construction golden for every fixture image."""
    from buildlog_consultant_spark.fixtures import make_image
    from buildlog_consultant_spark.ops.multimodal import (
        decode_image_pixels,
        image_dhash,
    )

    import numpy as np

    n_bmp, n_png, n_blob = 0, 0, 0
    for i in range(48):
        row, g = make_image(i)
        px = decode_image_pixels(row["media"])
        if g is None:
            assert px is None
            n_blob += 1
        else:
            assert px is not None and px.dtype == np.uint8
            assert image_dhash(px) == g
            if row["media"][:2] == b"BM":
                n_bmp += 1
            else:
                n_png += 1
    # both lossless containers present, incl. cross-format pairs
    assert n_bmp > 0 and n_png > 0 and n_blob > 0


def test_image_dhash_brightness_invariance():
    """A uniform brightness lift must not change a single dHash bit
    (gradient SIGNS are what the hash encodes)."""
    import numpy as np

    from buildlog_consultant_spark.ops.multimodal import image_dhash

    rng_free = (np.arange(24 * 32 * 3).reshape(24, 32, 3) * 37 % 200).astype(
        np.uint8
    )
    lifted = np.clip(rng_free.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    assert image_dhash(rng_free) == image_dhash(lifted)


def test_image_hash_spark_matches_golden(spark):
    from buildlog_consultant_spark.fixtures import image_df, make_image
    from buildlog_consultant_spark.ops.multimodal import with_image_dhash

    n = 32
    got = {
        r["url"]: (r["width"], r["height"], r["dhash"])
        for r in with_image_dhash(image_df(spark, n)).collect()
    }
    assert len(got) == n
    for i in range(n):
        row, g = make_image(i)
        if g is None:
            assert got[row["url"]] == (None, None, None)
        else:
            assert got[row["url"]][2] == g


def test_image_near_dups_spark_matches_replay(spark):
    from buildlog_consultant_spark.fixtures import image_df, make_image
    from buildlog_consultant_spark.ops.multimodal import (
        image_near_dup_pairs,
        py_image_near_dup_pairs,
        with_image_dhash,
    )

    n = 48
    hashed = with_image_dhash(image_df(spark, n))
    got = sorted(
        map(tuple, image_near_dup_pairs(hashed, max_hamming=6).collect())
    )
    want = py_image_near_dup_pairs(
        [(make_image(i)[0]["url"], make_image(i)[1]) for i in range(n)],
        max_hamming=6,
    )
    assert got == want
    # planted-pair RECALL, not just parity: every (base, variant) pair
    # whose golden distance is <= 6 must be IN the output (cross-base
    # incidental pairs alone can't satisfy this), and at least one
    # planted pair above 6 proves the threshold actually cuts
    found = {(a, b) for a, b, _ in got}
    n_in, n_out = 0, 0
    for k in range(n // 2):
        ra, ga = make_image(2 * k)
        rb, gb = make_image(2 * k + 1)
        if ga is None or gb is None:
            continue
        d = bin((ga ^ gb) & ((1 << 64) - 1)).count("1")
        if d <= 6:
            assert (ra["url"], rb["url"]) in found, (k, d)
            n_in += 1
        else:
            assert (ra["url"], rb["url"]) not in found, (k, d)
            n_out += 1
    assert n_in >= 10 and n_out >= 1


def test_image_near_dups_no_allpairs_plan(spark):
    from buildlog_consultant_spark.fixtures import image_df
    from buildlog_consultant_spark.ops.multimodal import (
        image_near_dup_pairs,
        with_image_dhash,
    )

    plan = (
        image_near_dup_pairs(
            with_image_dhash(image_df(spark, 16)), checkpoint=False
        )
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


# ---------------------------------------------------------------------------
# audio fingerprint
# ---------------------------------------------------------------------------


def test_audio_fingerprint_roundtrip_and_gain_invariance():
    import numpy as np

    from buildlog_consultant_spark.fixtures import make_audio
    from buildlog_consultant_spark.ops.multimodal import (
        audio_fingerprint,
        decode_wav_samples,
    )

    n_wav, n_blob = 0, 0
    for i in range(48):
        row, g = make_audio(i)
        s = decode_wav_samples(row["media"])
        if g is None:
            assert s is None
            n_blob += 1
        else:
            assert audio_fingerprint(s) == g
            n_wav += 1
    assert n_wav > 0 and n_blob > 0
    # explicit gain invariance beyond the planted x3
    t = np.arange(72 * 256, dtype=np.int64)
    base = ((t * 7) % 41) - 20
    assert audio_fingerprint(base) == audio_fingerprint(base * 5)
    # empty audio → None
    assert audio_fingerprint(np.array([], dtype=np.int64)) is None


def test_audio_dups_spark_matches_replay(spark):
    from buildlog_consultant_spark.fixtures import audio_df, make_audio
    from buildlog_consultant_spark.ops.multimodal import (
        with_audio_fingerprint,
    )

    n = 48
    fp = with_audio_fingerprint(audio_df(spark, n))
    got = {r["url"]: (r["n_samples"], r["fingerprint"]) for r in fp.collect()}
    assert len(got) == n
    for i in range(n):
        row, g = make_audio(i)
        if g is None:
            assert got[row["url"]] == (None, None)
        else:
            assert got[row["url"]][1] == g
    # planted pairs share fingerprints
    r0, g0 = make_audio(0)
    r1, g1 = make_audio(1)
    assert g0 == g1


# ---------------------------------------------------------------------------
# MAD outliers + key skew report
# ---------------------------------------------------------------------------


def test_mad_outlier_stats(spark):
    from buildlog_consultant_spark.ops.robust import mad_outlier_stats

    # key a: 1..13 plus a gross outlier; n=14 → med rank 7
    rows = [("a", v) for v in range(1, 14)] + [("a", 10_000)]
    rows += [("b", 5), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: r for r in mad_outlier_stats(df, "k", "v").collect()}
    a = got["a"]
    # sorted: 1..13,10000 → med = rank ceil(14*50/100)=7 → 7
    # devs: |v-7| = 6,5,4,3,2,1,0,1,2,3,4,5,6,9993 sorted:
    # 0,1,1,2,2,3,3,4,4,5,5,6,6,9993 → mad = rank 7 → 3
    assert (a["n"], a["med"], a["mad"]) == (14, 7, 3)
    # outliers: 2|v-7| > 21 → |v-7| > 10.5 → only 10000
    assert a["n_outliers"] == 1
    b = got["b"]
    assert (b["n"], b["med"], b["mad"], b["n_outliers"]) == (1, 5, 0, 0)


def test_mad_matches_python(spark):
    import math

    from buildlog_consultant_spark.ops.robust import mad_outlier_stats

    vals = [((i * 29) % 5, ((i * i * 7) % 401) - 80) for i in range(250)]
    df = spark.createDataFrame(
        [(str(k), v) for k, v in vals], "k string, v long"
    )
    got = {r["k"]: r for r in mad_outlier_stats(df, "k", "v").collect()}
    bykey: dict = {}
    for k, v in vals:
        bykey.setdefault(str(k), []).append(v)
    for k, vs in bykey.items():
        n = len(vs)
        med = sorted(vs)[math.ceil(50 * n / 100) - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[math.ceil(50 * n / 100) - 1]
        out = sum(1 for v in vs if 2 * abs(v - med) > 7 * mad)
        r = got[k]
        assert (r["n"], r["med"], r["mad"], r["n_outliers"]) == (
            n, med, mad, out,
        ), k


def test_key_skew_report(spark):
    from buildlog_consultant_spark.ops.robust import key_skew_report

    # 5 keys: counts 1,1,2,2,40 (plus a NULL key with 3 rows)
    rows = (
        [("a",)] + [("b",)] + [("c",)] * 2 + [("d",)] * 2 + [("e",)] * 40
        + [(None,)] * 3
    )
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k").first()
    # counts sorted: 1,1,2,2,3,40; n_keys=6 → p50 rank ceil(6*50/100)=3 → 2
    assert (r["n_keys"], r["n_rows"], r["max_n"], r["p50_n"]) == (6, 49, 40, 2)
    assert r["skew_permille"] == 20_000
    assert r["suggested_salt"] == 20


# ---------------------------------------------------------------------------
# incremental sessionization
# ---------------------------------------------------------------------------


def _sess_events(spark):
    rows = []
    eid = 0
    # user 1: two sessions (gap > 1800) straddling any cut
    for m in [0, 10, 20, 120, 130]:
        rows.append((eid, 1, m * 60)); eid += 1
    # user 2: one long session crossing the cut
    for m in [0, 25, 50, 75, 100]:
        rows.append((eid, 2, m * 60)); eid += 1
    # user 3: only early events (untouched by late batches)
    for m in [0, 5]:
        rows.append((eid, 3, m * 60)); eid += 1
    # user 4: only late events (first-ever in the new batch)
    for m in [200, 205]:
        rows.append((eid, 4, m * 60)); eid += 1
    # user 5: NULL ts and a NULL user sprinkled in
    rows.append((eid, 5, None)); eid += 1
    rows.append((eid, None, 50 * 60)); eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id long, sec long")
    return df.select(
        "event_id", "user_id", F.timestamp_seconds("sec").alias("ts")
    )


@pytest.mark.parametrize("cut_min", [-1, 15, 60, 110, 150, 999])
def test_incremental_sessionize_equals_full(spark, cut_min):
    from buildlog_consultant_spark.ops.sessions import (
        incremental_sessionize,
        sessionize,
    )

    ev = _sess_events(spark)
    cut = F.timestamp_seconds(F.lit(cut_min * 60))
    old = ev.where(F.col("ts") <= cut)
    new = ev.where(F.col("ts") > cut)
    got = sorted(
        map(
            tuple,
            incremental_sessionize(sessionize(old), new).collect(),
        )
    )
    want = sorted(map(tuple, sessionize(ev).collect()))
    assert got == want, f"cut={cut_min}"


def test_incremental_sessionize_no_event_rescan_plan(spark):
    """The untouched path must be a left_anti on prev_sessions — no
    window over old events anywhere in the incremental plan."""
    from buildlog_consultant_spark.ops.sessions import (
        incremental_sessionize,
        sessionize,
    )

    ev = _sess_events(spark)
    old_sessions = sessionize(ev.where(F.col("user_id") <= 3))
    # materialize prev sessions (what a real pipeline stores)
    prev = spark.createDataFrame(
        old_sessions.collect(), old_sessions.schema
    )
    new = ev.where(F.col("user_id") >= 2)
    plan = (
        incremental_sessionize(prev, new)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the NEW batch's sessionize (lag + running-sum windows) runs ONCE —
    # its session table is checkpointed before fanning into the three
    # consumer branches; old events contribute no Window at all
    assert plan.count("Window [") == 0  # only the checkpointed scan remains
    lazy = (
        incremental_sessionize(prev, new, checkpoint=False)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert lazy.count("Window [") >= 2  # the structure the checkpoint hides
