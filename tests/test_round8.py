"""Round-6 batch 4+5 operators: collocations (exact-integer PMI
ranking), Count-Min sketch estimates, bounded inverted index,
TPC-H-Q5-shaped join pipeline, streaming KMV state merge, exact
stratified split (hash_split_per_key), cluster canonicalization,
retention cohorts, rolling distinct active users."""

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
# collocations
# ---------------------------------------------------------------------------


def test_collocations_exact_counts_and_ranking(spark):
    from buildlog_consultant_spark.ops.colloc import collocations

    rows = [
        ("new york new york",),      # "new york" ×2, "york new" ×1
        ("new york city",),          # "new york" ×1, "york city" ×1
        ("a b a b a",),              # "a b" ×2, "b a" ×2
        (None,),                     # no tokens
        ("solo",),                   # size<2 → no bigrams
        ("",),                       # no tokens
    ]
    df = spark.createDataFrame(rows, "text string")
    got = {
        (r["w1"], r["w2"]): (r["c_ab"], r["c_a"], r["c_b"], r["assoc_ppb"])
        for r in collocations(df, min_count=2, k=10).collect()
    }
    # counts: new=3 york=3 city=1 a=3 b=2 solo=1
    assert got[("new", "york")] == (3, 3, 3, 3 * 10**9 // 9)
    assert got[("a", "b")] == (2, 3, 2, 2 * 10**9 // 6)
    assert got[("b", "a")] == (2, 2, 3, 2 * 10**9 // 6)
    # floor excluded the count-1 bigrams
    assert ("york", "new") not in got and ("york", "city") not in got


def test_collocations_k_truncation_is_total_order(spark):
    from buildlog_consultant_spark.ops.colloc import collocations

    df = spark.createDataFrame(
        [(" ".join(f"t{j} t{j}" for _ in range(3)),) for j in range(6)],
        "text string",
    )
    out = collocations(df, min_count=2, k=4).collect()
    assert len(out) == 4
    keys = [(r["assoc_ppb"], r["w1"], r["w2"]) for r in out]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


def test_collocations_plan_is_take_ordered(spark):
    from buildlog_consultant_spark.ops.colloc import collocations

    df = spark.createDataFrame([("a b c",)] * 8, "text string")
    out = collocations(df, min_count=2, k=5)
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Window" not in plan, plan[:1500]


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------


def _cms_corpus():
    return [
        (" ".join(f"w{(i * 7 + j) % 29}" for j in range(15)),)
        for i in range(40)
    ] + [(None,), ("",), ("  ",)]


def test_cms_matches_python_replay_any_partitioning(spark):
    from buildlog_consultant_spark.ops.sketch import (
        cms_token_estimates,
        py_cms_token_estimates,
    )

    rows = _cms_corpus()
    df = spark.createDataFrame(rows, "text string")
    want = sorted(py_cms_token_estimates([t for (t,) in rows]))
    for parts in (1, 5):
        got = sorted(
            (r["token"], r["exact_c"], r["cms_est"])
            for r in cms_token_estimates(df.repartition(parts)).collect()
        )
        assert got == want, parts


def test_cms_overestimates_only_and_tight_when_wide(spark):
    from buildlog_consultant_spark.ops.sketch import cms_token_estimates

    df = spark.createDataFrame(_cms_corpus(), "text string")
    rows = cms_token_estimates(df).collect()
    assert rows
    assert all(r["cms_est"] >= r["exact_c"] for r in rows)
    # 29 distinct tokens ≪ 256 buckets × 4 rows → collisions are rare
    # enough that at least one probe is exact
    assert any(r["cms_est"] == r["exact_c"] for r in rows)


def test_cms_narrow_width_still_overestimates(spark):
    from buildlog_consultant_spark.ops.sketch import (
        cms_token_estimates,
        py_cms_token_estimates,
    )

    rows = _cms_corpus()
    df = spark.createDataFrame(rows, "text string")
    got = sorted(
        (r["token"], r["exact_c"], r["cms_est"])
        for r in cms_token_estimates(df, width=4, depth=2, n_probe=8).collect()
    )
    want = sorted(
        py_cms_token_estimates([t for (t,) in rows], width=4, depth=2, n_probe=8)
    )
    assert got == want
    assert all(est >= c for (_, c, est) in got)
    # width 4 forces collisions over 29 tokens: some estimate must inflate
    assert any(est > c for (_, c, est) in got)


# ---------------------------------------------------------------------------
# inverted index
# ---------------------------------------------------------------------------


def test_inverted_index_semantics(spark):
    from buildlog_consultant_spark.ops.index import inverted_index

    rows = [
        (2, "alpha beta beta"),    # beta deduped per doc
        (10, "alpha beta"),
        (1, "alpha gamma"),
        (None, "alpha beta"),      # NULL doc id excluded
        (3, None),                 # NULL text → no tokens
        (4, "alpha"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: (r["df_docs"], r["min_doc"], r["max_doc"], r["postings"])
        for r in inverted_index(df, min_df=2, postings_cap=3).collect()
    }
    # numeric posting order: 1,2,4,10 — NOT "1,10,2,4"
    assert got["alpha"] == (4, 1, 10, None)  # df 4 > cap 3 → NULL postings
    assert got["beta"] == (2, 2, 10, "2,10")
    assert "gamma" not in got  # df 1 < min_df


def test_inverted_index_duplicate_doc_rows_count_once(spark):
    # df is a DOCUMENT frequency: a doc id ingested twice (both rows
    # containing the token) must count once and post once (review
    # finding — per-row array_distinct alone double-counted)
    from buildlog_consultant_spark.ops.index import inverted_index

    rows = [(5, "x y"), (5, "x z"), (6, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["token"]: (r["df_docs"], r["postings"])
        for r in inverted_index(df, min_df=1, postings_cap=8).collect()
    }
    assert got["x"] == (2, "5,6")
    assert got["y"] == (1, "5")


def test_inverted_index_numeric_posting_sort(spark):
    from buildlog_consultant_spark.ops.index import inverted_index

    df = spark.createDataFrame(
        [(i, "tok") for i in (10, 2, 1, 30)], "doc_id long, text string"
    )
    [r] = inverted_index(df, min_df=2, postings_cap=8).collect()
    assert r["postings"] == "1,2,10,30"


# ---------------------------------------------------------------------------
# q5 join pipeline plan
# ---------------------------------------------------------------------------


def test_q5_plan_broadcasts_dims(spark):
    import __spark_entry__ as entry

    out = entry.q_q5_region_revenue(spark, "/root/testdata/sf0.001")
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or plan.count("BroadcastHashJoin") >= 3


# ---------------------------------------------------------------------------
# streaming KMV
# ---------------------------------------------------------------------------


def test_streaming_kmv_equals_batch_sketch_across_batches(spark, tmp_path):
    import uuid

    from buildlog_consultant_spark.ops.sketch import py_kmv_distinct
    from buildlog_consultant_spark.streaming.pipeline import streaming_kmv

    rows = [
        (i, f"s{i % 3}", " ".join(f"w{(i * 5 + j) % 31}" for j in range(10)))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # three mtime-ordered files → three micro-batches; batch membership
    # deliberately interleaves sources so every key's state merges
    import os
    import time

    for b in range(3):
        # (id % 9) DIV 3 cycles independently of id % 3, so every batch
        # carries every source and each key's state merges 3 times
        part = df.where(F.expr("(doc_id % 9) DIV 3") == b)
        path = str(tmp_path / f"b{b}.parquet")
        part.toPandas().to_parquet(path)
        now = time.time()
        os.utime(path, (now - 300 + 60 * b, now - 300 + 60 * b))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    out = streaming_kmv(stream, key_col="source", k=16)
    name = f"t_skmv_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = spark.table(name)
    # every key updated in every batch → 3 snapshots per key
    assert snaps.count() == 9
    final = {
        r["source"]: (r["n_mins"], r["est_distinct"])
        for r in snaps.groupBy("source")
        .agg(F.max(F.struct("n_mins", "est_distinct")).alias("m"))
        .select("source", "m.n_mins", "m.est_distinct")
        .collect()
    }
    want = {
        k: (n, est)
        for k, n, est in py_kmv_distinct(
            [(s, t) for (_, s, t) in rows], k=16
        )
    }
    assert final == want


def test_streaming_kmv_snapshots_are_monotone(spark, tmp_path):
    import os
    import time
    import uuid

    from buildlog_consultant_spark.streaming.pipeline import streaming_kmv

    rows = [(i, "only", f"u{i} v{i} w{i} x{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    for b in range(2):
        path = str(tmp_path / f"b{b}.parquet")
        df.where(F.col("doc_id") % 2 == b).toPandas().to_parquet(path)
        now = time.time()
        os.utime(path, (now - 300 + 60 * b, now - 300 + 60 * b))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path))
    )
    out = streaming_kmv(stream, key_col="source", k=8)
    name = f"t_skmv_{uuid.uuid4().hex[:8]}"
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    snaps = [
        (r["n_mins"], r["est_distinct"])
        for r in spark.table(name).collect()
    ]
    assert len(snaps) == 2
    lo, hi = sorted(snaps)
    assert lo[0] <= hi[0] and lo[1] <= hi[1]
    # k=8 saturates against 40 docs × 4 distinct tokens → estimate path
    assert hi[0] == 8 and hi[1] > 8


# ---------------------------------------------------------------------------
# hash_split_per_key (exact stratified split)
# ---------------------------------------------------------------------------


def _split_corpus(spark, n=97, nulls=True):
    rows = [(i, f"l{i % 3}") for i in range(n)]
    if nulls:
        rows += [(None, "l0"), (900, None), (901, None)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_split_matches_naive_window(spark):
    from buildlog_consultant_spark.ops.quota import (
        _order_hash,
        hash_split_per_key,
    )
    from pyspark.sql import Window

    df = _split_corpus(spark)
    weights = {"train": 8, "val": 1, "test": 1}
    got = {
        (r["doc_id"], r["lang"]): r["split"]
        for r in hash_split_per_key(
            df, weights, key_col="lang", bucket_hex_chars=1
        ).collect()
    }
    w = Window.partitionBy("lang").orderBy(_order_hash("doc_id"), "doc_id")
    naive = df.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("lang"))
    )
    want = {}
    for r in naive.collect():
        if r["r"] <= (r["n"] * 8) // 10:
            want[(r["doc_id"], r["lang"])] = "train"
        elif r["r"] <= (r["n"] * 9) // 10:
            want[(r["doc_id"], r["lang"])] = "val"
        else:
            want[(r["doc_id"], r["lang"])] = "test"
    assert got == want
    # every input row labeled exactly once (NULL key and NULL id included)
    assert len(got) == df.count()


def test_hash_split_exact_proportions_per_key(spark):
    from buildlog_consultant_spark.ops.quota import hash_split_per_key

    df = _split_corpus(spark, n=120, nulls=False)  # 40 per lang
    out = hash_split_per_key(df, {"train": 8, "val": 1, "test": 1})
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").agg(F.count("*").alias("n")).collect()
    }
    for lang in ("l0", "l1", "l2"):
        assert counts[(lang, "train")] == 32
        assert counts[(lang, "val")] == 4
        assert counts[(lang, "test")] == 4


def test_hash_split_validates_weights(spark):
    from buildlog_consultant_spark.ops.quota import hash_split_per_key

    df = _split_corpus(spark, n=5, nulls=False)
    with pytest.raises(ValueError):
        hash_split_per_key(df, {})
    with pytest.raises(ValueError):
        hash_split_per_key(df, {"a": 1, "b": 0})


# ---------------------------------------------------------------------------
# cluster_canonical
# ---------------------------------------------------------------------------


def test_cluster_canonical_keeps_longest_then_lowest_id(spark):
    from buildlog_consultant_spark.ops.dedup import (
        cluster_canonical,
        near_dup_clusters,
    )

    # near-identical docs (one token changed) cluster via MinHash-LSH;
    # unrelated docs don't
    base = " ".join(f"w{j}" for j in range(40))
    variant = base.replace("w7", "w7x")
    other = " ".join(f"z{j}" for j in range(40))
    rows = [
        (1, base, len(base)),
        (2, variant, len(variant)),     # longest in cluster (w7x)
        (3, base, None),                # exact dup of 1 — collapsed by pre-pass
        (9, other, len(other)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    clusters = near_dup_clusters(df)
    ids = {r["id"] for r in clusters.collect()}
    assert ids == {1, 2}  # 3 collapsed, 9 unrelated
    [r] = cluster_canonical(df).collect()
    assert r["cluster"] == 1 and r["n_members"] == 2
    assert r["kept_id"] == 2 and r["kept_chars"] == len(variant)


def test_cluster_canonical_tie_prefers_lowest_id(spark):
    from buildlog_consultant_spark.ops.dedup import cluster_canonical

    base = " ".join(f"w{j}" for j in range(40))
    variant = base.replace("w7", "w7x")
    # equal n_chars metadata → tie broken to the LOWEST id
    rows = [(5, base, 100), (2, variant, 100)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    [r] = cluster_canonical(df).collect()
    assert (r["kept_id"], r["kept_chars"]) == (2, 100)


# ---------------------------------------------------------------------------
# retention cohorts / rolling active users
# ---------------------------------------------------------------------------


def _retention_events(spark):
    rows = [
        # user 1: first 2024-01-01, active again 01-02 and 01-05 (two
        # events that day — must count once)
        (1, 1, "2024-01-01 09:00:00"),
        (2, 1, "2024-01-02 09:00:00"),
        (3, 1, "2024-01-05 09:00:00"),
        (4, 1, "2024-01-05 10:00:00"),
        # user 2: first 01-02
        (5, 2, "2024-01-02 12:00:00"),
        # NULL user and NULL ts excluded
        (6, None, "2024-01-01 00:00:00"),
        (7, 3, None),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_retention_cohorts_semantics(spark):
    from buildlog_consultant_spark.ops.funnel import retention_cohorts

    got = {
        (str(r["cohort_day"]), r["day_offset"]): r["n_users"]
        for r in retention_cohorts(_retention_events(spark)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 4): 1,
        ("2024-01-02", 0): 1,
    }


def test_rolling_active_users_window_and_dedup(spark):
    from buildlog_consultant_spark.ops.funnel import rolling_active_users

    got = {
        str(r["day"]): r["active_users"]
        for r in rolling_active_users(
            _retention_events(spark), window_days=7
        ).collect()
    }
    # traffic days only: 01-01 (u1), 01-02 (u1,u2), 01-05 (u1 twice +
    # u1/u2 trailing)
    assert got == {
        "2024-01-01": 1,
        "2024-01-02": 2,
        "2024-01-05": 2,
    }


def test_rolling_active_users_window_expiry(spark):
    from buildlog_consultant_spark.ops.funnel import rolling_active_users

    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 2, "2024-01-09 00:00:00"),  # 8 days later: u1 expired
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        str(r["day"]): r["active_users"]
        for r in rolling_active_users(df, window_days=7).collect()
    }
    assert got == {"2024-01-01": 1, "2024-01-09": 1}


# ---------------------------------------------------------------------------
# gopher rule-set signals
# ---------------------------------------------------------------------------


def test_gopher_signals_metrics(spark):
    from buildlog_consultant_spark.ops.text import gopher_quality_signals

    good = " ".join(
        ["the", "be", "to"] + [f"word{i}" for i in range(60)]
    )
    rows = [
        (1, good),
        (2, None),                       # NULL text
        (3, "- a\n- b\nplain"),          # 2/3 bullet lines
        (4, "end...\nend…  \nno"),       # 2/3 ellipsis (rtrim'd)
        (5, "# # …"),                    # 3 symbols / 3 words
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_signals(df).collect()}

    g = got[1]
    assert g["n_words"] == 63 and g["stop_hits"] == 3
    assert g["alpha_word_ppm"] == 1_000_000
    assert g["gopher_keep"] is True

    n = got[2]
    assert n["n_words"] == 0 and n["mean_word_len_milli"] is None
    assert n["gopher_keep"] is False

    assert got[3]["bullet_line_ppm"] == 1_000_000 * 2 // 3
    assert got[4]["ellipsis_line_ppm"] == 1_000_000 * 2 // 3
    s = got[5]
    assert s["symbol_ppm"] == 1_000_000  # 3 symbols / 3 words
    assert s["alpha_word_ppm"] == 0


def test_gopher_keep_thresholds(spark):
    from buildlog_consultant_spark.ops.text import gopher_quality_signals

    base = ["the", "of", "and"] + [f"word{i}" for i in range(55)]
    rows = [
        (1, " ".join(base)),                       # passes all
        (2, " ".join(base[:30])),                  # < 50 words
        (3, " ".join(["the", "of"] + ["a"] * 56)), # mean len < 3
        (4, " ".join([f"word{i}" for i in range(58)])),  # 0 stop hits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    keep = {
        r["doc_id"]: r["gopher_keep"]
        for r in gopher_quality_signals(df).collect()
    }
    assert keep == {1: True, 2: False, 3: False, 4: False}


# ---------------------------------------------------------------------------
# script detection / NFC normalization
# ---------------------------------------------------------------------------


def test_script_char_counts_and_dominant(spark):
    from buildlog_consultant_spark.ops.text import script_char_counts

    rows = [
        (1, "hello мир"),          # 5 latin, 3 cyrillic → latin
        (2, "Привет ok"),          # 6 cyrillic, 2 latin → cyrillic
        (3, "你好世界"),            # 4 cjk
        (4, "مرحبا"),              # 5 arabic
        (5, "αβγ"),               # 3 greek
        (6, None),                 # all zero → 'latin' by priority
        (7, "123 456"),            # digits only → 'latin' by priority
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in script_char_counts(df).collect()}
    assert (got[1]["n_latin"], got[1]["n_cyrillic"]) == (5, 3)
    assert got[1]["dominant_script"] == "latin"
    assert got[2]["dominant_script"] == "cyrillic"
    assert (got[3]["n_cjk"], got[3]["dominant_script"]) == (4, "cjk")
    assert (got[4]["n_arabic"], got[4]["dominant_script"]) == (5, "arabic")
    assert (got[5]["n_greek"], got[5]["dominant_script"]) == (3, "greek")
    assert got[6]["n_chars_total"] == 0
    assert got[6]["dominant_script"] == "latin"  # zero-tie → priority
    assert (got[7]["n_digit"], got[7]["dominant_script"]) == (6, "latin")


def test_nfc_normalized_composes_and_preserves(spark):
    import unicodedata

    from buildlog_consultant_spark.ops.text import with_nfc_normalized

    decomposed = "café"          # e + combining acute
    precomposed = "café"
    rows = [(1, decomposed), (2, precomposed), (3, None), (4, "plain")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["text_nfc"]
        for r in with_nfc_normalized(df).collect()
    }
    assert got[1] == precomposed == unicodedata.normalize("NFC", decomposed)
    assert got[2] == precomposed
    assert got[3] is None
    assert got[4] == "plain"


# ---------------------------------------------------------------------------
# snapshot diff / pivot
# ---------------------------------------------------------------------------


def test_snapshot_diff_statuses(spark):
    from buildlog_consultant_spark.ops.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, None)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: "same",
        2: "changed",
        3: "removed",
        4: "same",  # NULL payload on both sides hashes as ''
        5: "added",
    }


def test_snapshot_diff_null_to_value_is_changed(spark):
    from buildlog_consultant_spark.ops.snapshot import snapshot_diff

    old = spark.createDataFrame([(1, None)], "doc_id long, text string")
    new = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    [r] = snapshot_diff(old, new).collect()
    assert r["status"] == "changed"


def test_events_pivot_one_pass_plan(spark):
    import __spark_entry__ as entry

    out = entry.q_events_pivot(spark, "/root/testdata/sf0.001")
    out.collect()
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # pivot with explicit values = corpus-touching (day, type) count agg
    # (partial+final), then pivotfirst over that BOUNDED aggregate —
    # two agg pairs, no Expand, and only the first pair sees corpus rows
    assert plan.count("partial_count") == 1, plan[:1500]
    assert plan.count("pivotfirst") == 2, plan[:1500]
    assert "Expand" not in plan, plan[:1500]
