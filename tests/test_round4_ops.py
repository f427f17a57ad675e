"""Round-4 new-operator tests: repetition signals, contamination check,
PII scrub, and the as-of join (ops/asof.py)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops import text as text_ops
from buildlog_consultant_spark.ops.asof import asof_join


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


# ---------------------------------------------------------------------------
# repetition signals
# ---------------------------------------------------------------------------


def test_repetition_signals_counts(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b a b a"),       # 5 words, 2 distinct;
                                                    # bigrams: ab ba ab ba → 2 distinct
            Row(doc_id=2, text="x y z"),            # all unique
            Row(doc_id=3, text="solo"),             # 1 word → no bigrams
            Row(doc_id=4, text="   "),              # whitespace-only → 0 words
        ]
    )
    got = {
        r["doc_id"]: r
        for r in text_ops.with_repetition_signals(df).collect()
    }
    assert got[1]["n_words"] == 5 and got[1]["n_distinct_words"] == 2
    assert got[1]["n_bigrams"] == 4 and got[1]["n_distinct_bigrams"] == 2
    assert got[1]["dup_word_pct"] == 60 and got[1]["dup_bigram_pct"] == 50
    assert got[2]["dup_word_pct"] == 0 and got[2]["n_bigrams"] == 2
    assert got[3]["n_bigrams"] == 0 and got[3]["dup_bigram_pct"] == 0
    assert got[4]["n_words"] == 0 and got[4]["dup_word_pct"] == 0


def test_filter_repetitive_drops_boilerplate(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam spam spam spam spam spam"),
            Row(doc_id=2, text="a perfectly normal sentence with variety"),
        ]
    )
    kept = text_ops.filter_repetitive(df).select("doc_id").collect()
    assert [r[0] for r in kept] == [2]


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def test_contamination_finds_planted_overlap(spark):
    # doc 60 is in the benchmark sample (md5('60') starts '07...'); doc 17
    # is not (md5('17') starts '70...') — planted to share an 8-gram
    bench_text = "one two three four five six seven eight nine"
    df = spark.createDataFrame(
        [
            Row(doc_id=60, text=bench_text, lang="en"),
            Row(doc_id=17, text="zz " + bench_text, lang="en"),
            Row(doc_id=18, text="alpha beta gamma delta", lang="de"),
        ]
    )
    got = text_ops.contamination_hits(df, n=8).collect()
    assert len(got) == 1
    row = got[0]
    # doc 17's 10 words yield 3 8-grams, of which both of doc 60's grams
    # ("one..eight" and "two..nine") appear
    assert row["doc_id"] == 17 and row["lang"] == "en"
    assert row["n_shared_grams"] == 2


def test_decontaminate_drops_only_contaminated(spark):
    bench_text = "one two three four five six seven eight nine"
    df = spark.createDataFrame(
        [
            Row(doc_id=60, text=bench_text, lang="en"),       # benchmark: kept
            Row(doc_id=17, text="zz " + bench_text, lang="en"),  # contaminated
            Row(doc_id=18, text="alpha beta gamma delta", lang="de"),  # clean
        ]
    )
    kept = sorted(
        r["doc_id"] for r in text_ops.decontaminate(df, n=8).collect()
    )
    assert kept == [18, 60]


def test_contamination_broadcasts_benchmark(spark):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"w{i} x y z a b c d e", lang="en") for i in range(40)]
    )
    plan = text_ops.contamination_hits(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------------------
# PII scrub
# ---------------------------------------------------------------------------


def test_scrub_pii(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail a.b+c@ex-ample.org and 555-123-4567 now"),
            Row(doc_id=2, text="no pii here 12-34"),
            Row(doc_id=3, text="two a@b.co b@c.io mails"),
        ]
    )
    got = {r["doc_id"]: r for r in text_ops.scrub_pii(df).collect()}
    assert got[1]["n_emails"] == 1 and got[1]["n_phones"] == 1
    assert got[1]["text_scrubbed"] == "mail <EMAIL> and <PHONE> now"
    assert got[2]["n_emails"] == 0 and got[2]["n_phones"] == 0
    assert got[2]["text_scrubbed"] == "no pii here 12-34"
    assert got[3]["n_emails"] == 2
    assert got[3]["text_scrubbed"] == "two <EMAIL> <EMAIL> mails"


def test_read_adaptive_repartitions_small_single_file(spark, tmp_path):
    """A single small parquet file is ONE scan partition however much
    open-cost padding the size estimate adds — _read_adaptive must still
    repartition it up to the session parallelism (the round-4 estimate
    capped by real split count; the padded packing formula alone skipped
    this at low parallelism)."""
    import __spark_entry__ as entry

    p = str(tmp_path / "small.parquet")
    spark.range(1000).coalesce(1).write.parquet(p)
    df = entry._read_adaptive(spark, p)
    par = spark.sparkContext.defaultParallelism
    assert df.rdd.getNumPartitions() >= min(par, 2)


def test_decode_png_bounded_against_crafted_headers():
    """A crafted IHDR (huge declared dims) or an IDAT zlib bomb must cost
    header-level work only — never an unbounded allocate/inflate."""
    import struct
    import zlib

    from buildlog_consultant_spark.ops.multimodal import PNG_SIG, decode_png

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    # 50000×50000 declared: decode must return dims only, instantly
    ihdr = struct.pack(">IIBBBBB", 50000, 50000, 8, 2, 0, 0, 0)
    bomb_payload = zlib.compress(b"\x00" * 10_000_000)  # ~10 KB compressed
    png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb_payload)
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out == {"width": 50000, "height": 50000}

    # small declared dims with an over-inflating IDAT: inflate stops at
    # the declared byte count and the pixel stats are refused
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    png = (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", bomb_payload)
        + chunk(b"IEND", b"")
    )
    out = decode_png(png)
    assert out == {"width": 4, "height": 4}


def test_quantize_embeddings_codes(spark):
    from buildlog_consultant_spark.ops.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [
            (1, [1.0, -0.5, 0.25, 0.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector → zero codes
        ],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: list(r["qcodes"]) for r in
           quantize_embeddings(df, dim=4).collect()}
    # scale = 1.0 → floor(x*127): [127, -64 (floor(-63.5)), 31, 0]
    assert got[1] == [127, -64, 31, 0]
    assert got[2] == [0, 0, 0, 0]


def test_ann_topk_int8_ranking(spark):
    from buildlog_consultant_spark.ops.similarity import ann_topk_int8

    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),     # query
            (1, [1.0, 0.0]),     # identical direction → top
            (2, [0.0, 1.0]),     # orthogonal
            (3, [-1.0, 0.0]),    # opposite
        ],
        "vec_id long, embedding array<double>",
    )
    got = [(r["rank"], r["vec_id"], r["qdot"]) for r in
           ann_topk_int8(df, query_vec_id=0, k=3, dim=2).collect()]
    assert got == [(1, 1, 127 * 127), (2, 2, 0), (3, 3, -127 * 127)]


def test_quality_quantiles_nearest_rank(spark):
    # 4 docs, one lang: qualities sorted give the exact nearest-rank picks
    docs = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate([
            "short", "a bit longer text here ok", "x" * 400, "y" * 2000,
        ])],
        "doc_id long, text string, lang string",
    )
    got = {r["p"]: r["quality"] for r in
           text_ops.quality_quantiles(docs).collect()}
    qs = sorted(
        r["quality"] for r in text_ops.with_quality_score(docs).collect()
    )
    # n=4: rank(25)=1, rank(50)=2, rank(75)=3, rank(95)=4
    assert got == {25: qs[0], 50: qs[1], 75: qs[2], 95: qs[3]}


def test_cosine_kernel_zero_norm_is_null(spark):
    """Zero-norm vectors must yield NULL from the cosine kernel — never
    NaN (NaN compares greater than any double, so it would PASS >=
    threshold filters and sort FIRST in top-k) and never an error: under
    Spark 4's default ANSI mode the raw HOF division THROWS
    divideByZeroError, which would kill a whole crawl job on one zero
    vector. The kernel's NULL is the deliberate operator contract
    (equivalent to try_divide); HOF parity holds on all non-zero-norm
    inputs."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from buildlog_consultant_spark.ops.similarity import (
        _cosine_pairs_udf,
        _dot,
        _norm,
    )

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], [1.0, 2.0]),
            (2, [1.0, 1.0], [1.0, 2.0]),
        ],
        "id long, va array<double>, vb array<double>",
    )
    cos = _cosine_pairs_udf()
    kernel = {
        r["id"]: r["c"] for r in df.select("id", cos("va", "vb").alias("c")).collect()
    }
    assert kernel[1] is None
    hof_expr = _dot(F.col("va"), F.col("vb")) / (
        _norm(F.col("va")) * _norm(F.col("vb"))
    )
    with _pytest.raises((Py4JJavaError, Exception)):
        df.select(hof_expr.alias("c")).collect()  # ANSI: divide-by-zero throws
    hof2 = df.where("id = 2").select(hof_expr.alias("c")).collect()[0]["c"]
    assert kernel[2] == hof2


def test_bucketed_join_elides_shuffle(spark):
    """Pre-bucketed tables co-locate the join: both sides bucketed by the
    join key into the same bucket count join with NO Exchange — the
    strategy SURVEY §2b names for repeated big-big joins at crawl scale
    (bucket once at write time, every later join skips its shuffle)."""
    spark.sql("DROP TABLE IF EXISTS t_bucket_a")
    spark.sql("DROP TABLE IF EXISTS t_bucket_b")
    a = spark.range(1000).withColumnRenamed("id", "k").withColumn(
        "va", F.col("k") * 2
    )
    b = spark.range(1000).withColumnRenamed("id", "k").withColumn(
        "vb", F.col("k") + 1
    )
    a.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bucket_a")
    b.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bucket_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the big-big (sort-merge) path: broadcast would trivially
        # skip the shuffle for this small fixture
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("t_bucket_a").join(spark.table("t_bucket_b"), "k")
        assert j.count() == 1000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_tfidf_topk_ranking(spark):
    # "rare" appears twice in doc 1 only (tf=2, df=1 → score 2*3000);
    # "common" is in all three docs (idf ratio 1 → score 1000·tf)
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="rare rare common alpha"),
            Row(doc_id=2, text="common beta"),
            Row(doc_id=3, text="common gamma"),
        ]
    )
    got = text_ops.tfidf_topk(df, k=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["score"]))
    assert by_doc[1][0] == (1, "rare", 6000)
    assert by_doc[1][1] == (2, "alpha", 3000)
    # doc 2: beta (df=1, 3000) outranks common (df=3, 1000)
    assert by_doc[2][0] == (1, "beta", 3000)
    assert by_doc[2][1] == (2, "common", 1000)


# ---------------------------------------------------------------------------
# stream-stream interval join
# ---------------------------------------------------------------------------


def test_streaming_interval_join_cross_batch_state(spark, tmp_path):
    """A click arriving in micro-batch 0 must still match a purchase
    arriving in micro-batch 1 (the join buffers right-side state across
    triggers until the watermark evicts it)."""
    import os
    import time
    import uuid

    from buildlog_consultant_spark.streaming.pipeline import streaming_interval_join

    sch = "event_id long, user_id long, ts timestamp, event_type string"
    b0 = spark.createDataFrame(
        [
            (1, 7, "2024-01-01 10:00:00", "click"),
            (2, 7, "2024-01-01 10:20:00", "purchase"),  # in-batch pair (1200s)
            (3, 7, "2024-01-01 10:30:00", "click"),
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = spark.createDataFrame(
        [(4, 7, "2024-01-01 11:00:00", "purchase")],  # matches click 3 (1800s)
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stage = tmp_path / "stream"
    stage.mkdir()
    b0.coalesce(1).write.parquet(str(stage / "b0"))
    b1.coalesce(1).write.parquet(str(stage / "b1"))
    # flatten to time-ordered files in one dir (file stream reads a dir)
    files = []
    for sub in ("b0", "b1"):
        (src,) = [p for p in (stage / sub).iterdir() if p.suffix == ".parquet"]
        dst = stage / f"{sub}.parquet"
        src.rename(dst)
        files.append(dst)
    now = int(time.time())
    os.utime(files[0], (now - 120, now - 120))
    os.utime(files[1], (now - 60, now - 60))

    def side(event_type, id_alias, ts_alias):
        return (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .parquet(str(stage))
            .where(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(id_alias),
                "user_id",
                F.col("ts").alias(ts_alias),
            )
        )

    joined = streaming_interval_join(
        side("purchase", "purchase_id", "p_ts"),
        side("click", "click_id", "c_ts"),
        on="user_id",
        left_ts="p_ts",
        right_ts="c_ts",
    )
    name = f"t_ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["purchase_id"], r["click_id"]) for r in spark.table(name).collect()
    )
    # purchase 2 matches click 1 (in-batch); purchase 4 (batch 1) matches
    # clicks 1 and 3 — click 3 only via state buffered from batch 0
    assert got == [(2, 1), (4, 1), (4, 3)]


def test_streaming_dedup_cross_batch_state(spark, tmp_path):
    """A key seen in micro-batch 0 must be suppressed when it reappears in
    micro-batch 1 — dropDuplicates state persists across triggers."""
    import os
    import time
    import uuid

    from buildlog_consultant_spark.streaming.pipeline import streaming_dedup

    sch = "id long, k string"
    b0 = spark.createDataFrame([(1, "a"), (2, "b")], sch)
    b1 = spark.createDataFrame([(3, "a"), (4, "c")], sch)  # "a" is a dup
    stage = tmp_path / "stream"
    stage.mkdir()
    b0.coalesce(1).write.parquet(str(stage / "b0"))
    b1.coalesce(1).write.parquet(str(stage / "b1"))
    files = []
    for sub in ("b0", "b1"):
        (src,) = [p for p in (stage / sub).iterdir() if p.suffix == ".parquet"]
        dst = stage / f"{sub}.parquet"
        src.rename(dst)
        files.append(dst)
    now = int(time.time())
    os.utime(files[0], (now - 120, now - 120))
    os.utime(files[1], (now - 60, now - 60))

    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(stage))
    )
    kept = streaming_dedup(stream, ("k",))
    name = f"t_sdd_{uuid.uuid4().hex[:8]}"
    q = (
        kept.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r["id"], r["k"]) for r in spark.table(name).collect())
    # batch-0 rows kept; batch-1's "a" suppressed by cross-batch state
    assert got == [(1, "a"), (2, "b"), (4, "c")]


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        [Row(event_id=i, user_id=u, ts=ts) for i, u, ts in rows]
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_asof_join_basic_and_no_match(spark):
    left = _events(
        spark,
        [(100, 1, "2024-01-01 10:00:00"), (101, 1, "2024-01-01 12:00:00"),
         (102, 2, "2024-01-01 09:00:00")],
    )
    right = _events(
        spark,
        [(1, 1, "2024-01-01 09:30:00"), (2, 1, "2024-01-01 11:00:00"),
         (3, 2, "2024-01-01 09:30:00")],  # AFTER user 2's purchase
    )
    got = {r["event_id"]: r for r in asof_join(left, right, on="user_id").collect()}
    assert got[100]["asof_event_id"] == 1 and got[100]["asof_gap_sec"] == 1800
    assert got[101]["asof_event_id"] == 2 and got[101]["asof_gap_sec"] == 3600
    assert got[102]["asof_event_id"] is None and got[102]["asof_gap_sec"] is None


def test_asof_join_equal_ts_matches_and_tie_dedup(spark):
    # equal ts: the right row matches (ts >= semantics); two right rows at
    # the same (user, ts): greatest event_id wins deterministically
    left = _events(spark, [(100, 1, "2024-01-01 10:00:00")])
    right = _events(
        spark,
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-01-01 10:00:00")],
    )
    got = asof_join(left, right, on="user_id").collect()
    assert got[0]["asof_event_id"] == 2 and got[0]["asof_gap_sec"] == 0


def test_asof_join_null_payload_not_smeared(spark):
    # matched right row carries a NULL payload value: the output must keep
    # that NULL, not smear in an older right row's non-null value
    left = _events(spark, [(100, 1, "2024-01-01 12:00:00")])
    right = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts="2024-01-01 09:00:00", props="x"),
            Row(event_id=2, user_id=1, ts="2024-01-01 11:00:00", props=None),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_join(
        left, right, on="user_id", right_payload=("props",)
    ).collect()
    assert got[0]["asof_event_id"] == 2
    assert got[0]["asof_props"] is None


def test_asof_join_null_keys_never_match(spark):
    sch = "event_id long, user_id long, ts string"
    left = spark.createDataFrame(
        [(100, None, "2024-01-01 12:00:00")], sch
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, None, "2024-01-01 09:00:00")], sch
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = asof_join(left, right, on="user_id").collect()
    # equality-join semantics: NULL keys never match; the left row
    # survives with NULL match columns
    assert len(got) == 1
    assert got[0]["asof_event_id"] is None and got[0]["asof_gap_sec"] is None


def test_asof_join_single_shuffle_no_cartesian(spark):
    left = _events(spark, [(100, 1, "2024-01-01 10:00:00")])
    right = _events(spark, [(1, 1, "2024-01-01 09:00:00")])
    df = asof_join(left, right, on="user_id")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole operator costs exactly ONE exchange (the union keyed on
    # the join key); the tie-dedup rides the same window sort
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange") - final.count("AQEShuffleRead") <= 2  # Exchange + its ShuffleQueryStage line
    import re

    assert len(re.findall(r"\bExchange hashpartitioning", final)) == 1
