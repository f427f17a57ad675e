"""Round-6 session-2 tests: temperature-scaled mixture allocations
(exact largest-remainder apportionment) and the two-stage MinHash →
exact-Jaccard verified near-dup pipeline."""

import math

import pytest
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops.dedup import (
    minhash_near_dup_pairs_xx,
    minhash_verified_pairs_xx,
)
from buildlog_consultant_spark.ops.quota import (
    mixture_allocations,
    mixture_allocations_py,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _nkey(t):
    return tuple((v is None, v) for v in t)


# ---------------------------------------------------------------------------
# mixture_allocations
# ---------------------------------------------------------------------------


def _mix_rows():
    # skewed totals, a NULL key, a zero-weight key, and NULL weights
    return (
        [("big", 1_000_000)] * 3
        + [("mid", 10_000)] * 5
        + [("small", 37)] * 2
        + [("zero", 0)] * 4
        + [(None, 123)] * 2
        + [("nullw", None)] * 3
    )


def test_mixture_sums_exactly_to_budget(spark):
    df = spark.createDataFrame(_mix_rows(), "source string, w long")
    for budget in (0, 1, 7, 999_983, 10**12):
        out = mixture_allocations(df, budget, key_col="source", weight_col="w")
        got = {r["source"]: r["allocation"] for r in out.collect()}
        assert sum(got.values()) == budget, budget
        assert all(v >= 0 for v in got.values())


def test_mixture_matches_python_replay(spark):
    df = spark.createDataFrame(_mix_rows(), "source string, w long")
    out = mixture_allocations(df, 999_983, key_col="source", weight_col="w")
    got = sorted(
        ((r["source"], r["tokens"], r["allocation"]) for r in out.collect()),
        key=lambda r: (r[0] is not None, r[0]),
    )
    totals: dict = {}
    for k, w in _mix_rows():
        totals[k] = totals.get(k, 0) + (w or 0)
    want = mixture_allocations_py(sorted(totals.items(), key=_nkey), 999_983)
    assert got == want


def test_mixture_sqrt_damping_direction(spark):
    # alpha = 1/2 gives the small source MORE than proportional share
    df = spark.createDataFrame(
        [("a", 1_000_000), ("b", 10_000)], "source string, w long"
    )
    out = {
        r["source"]: r["allocation"]
        for r in mixture_allocations(df, 1_000_000, weight_col="w").collect()
    }
    # proportional would give b ~9901; sqrt-damped gives b 1e3/(1e3+1e2) ≈ 90909
    assert out["b"] > 50_000
    assert out["a"] + out["b"] == 1_000_000
    assert out["a"] > out["b"]  # damped, not flattened


def test_mixture_hand_computed_largest_remainder(spark):
    # totals 4 and 9 → weights 2e6 and 3e6 → shares of 7: base 2 and 4,
    # leftover 1 goes to the larger remainder (a: 7*2/5 = 2.8 → rem .8)
    df = spark.createDataFrame([("a", 4), ("b", 9)], "source string, w long")
    out = {
        r["source"]: r["allocation"]
        for r in mixture_allocations(df, 7, weight_col="w").collect()
    }
    assert out == {"a": 3, "b": 4}


def test_mixture_all_zero_weights(spark):
    df = spark.createDataFrame([("a", 0), ("b", 0)], "source string, w long")
    out = mixture_allocations(df, 100, weight_col="w").collect()
    assert {r["allocation"] for r in out} == {0}


def test_mixture_count_mode_and_negative_budget(spark):
    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "source string, w long")
    out = {
        r["source"]: r["tokens"]
        for r in mixture_allocations(df, 10, key_col="source").collect()
    }
    assert out == {"a": 2, "b": 1}  # weight_col None counts rows
    with pytest.raises(ValueError):
        mixture_allocations(df, -1)


def test_mixture_py_replay_ties_and_nulls():
    # equal remainders break by key ASC NULLS FIRST
    rows = mixture_allocations_py([(None, 4), ("a", 4), ("b", 4)], 7)
    assert [r[0] for r in rows] == [None, "a", "b"]
    # 7*1/3 each → base 2, rem equal → leftover 1 to NULL (first in order)
    assert [r[2] for r in rows] == [3, 2, 2]
    assert mixture_allocations_py([("a", 0)], 5) == [("a", 0, 0)]


# ---------------------------------------------------------------------------
# minhash_verified_pairs_xx
# ---------------------------------------------------------------------------


def _near_dup_docs():
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " x98 x99"  # ~0.9 jaccard
    far = " ".join(f"z{i}" for i in range(40))
    return [
        (1, base),
        (2, near),
        (3, base),  # exact dup of 1 → collapsed by the pre-pass
        (4, far),
        (5, "tiny doc"),
    ]


def test_verified_pairs_jaccard_value(spark):
    df = spark.createDataFrame(_near_dup_docs(), "doc_id long, text string")
    out = minhash_verified_pairs_xx(df, min_shared_bands=1).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard_ppm"] for r in out}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs  # exact dup collapsed before banding
    # hand-computed exact jaccard of the (1, 2) shingle sets
    def sh(text):
        toks = text.lower().split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)}

    sa, sb = sh(_near_dup_docs()[0][1]), sh(_near_dup_docs()[1][1])
    want = int(len(sa & sb) * 1000000 / len(sa | sb))
    assert pairs[(1, 2)] == want
    assert want > 800_000


def test_verified_pairs_threshold_filters(spark):
    df = spark.createDataFrame(_near_dup_docs(), "doc_id long, text string")
    all_pairs = minhash_verified_pairs_xx(df, min_shared_bands=1).collect()
    kept = minhash_verified_pairs_xx(
        df, min_shared_bands=1, min_jaccard_ppm=800_000
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in kept} == {
        (r["id_a"], r["id_b"]) for r in all_pairs if r["jaccard_ppm"] >= 800_000
    }
    assert {(r["id_a"], r["id_b"]) for r in kept} == {(1, 2)}


def test_verified_pairs_extend_candidates_exactly(spark):
    # same candidate set and shared_bands as the unverified op
    df = spark.createDataFrame(_near_dup_docs(), "doc_id long, text string")
    cand = {
        (r["id_a"], r["id_b"]): r["shared_bands"]
        for r in minhash_near_dup_pairs_xx(df, min_shared_bands=1).collect()
    }
    ver = {
        (r["id_a"], r["id_b"]): r["shared_bands"]
        for r in minhash_verified_pairs_xx(df, min_shared_bands=1).collect()
    }
    assert cand == ver


# ---------------------------------------------------------------------------
# registered domain / domain stats
# ---------------------------------------------------------------------------


def test_registered_domain_mapping(spark):
    from buildlog_consultant_spark.ops.web import registered_domain

    cases = [
        ("www.site.com", "site.com"),
        ("blog.a.b.site.com", "site.com"),
        ("shop.site.co.uk", "site.co.uk"),
        ("site.co.uk", "site.co.uk"),
        ("news.portal.com.au", "portal.com.au"),
        ("SITE.Co.UK", "site.co.uk"),  # lowercased first
        ("localhost", "localhost"),  # single label → itself
        ("co.uk", "co.uk"),  # bare suffix → itself (documented approx)
        ("x.gov.uk", "x.gov.uk"),
        ("deep.x.gov.uk", "x.gov.uk"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _e) in enumerate(cases)], "i int, host string"
    )
    got = {
        r["i"]: r["rd"]
        for r in df.select("i", registered_domain("host").alias("rd")).collect()
    }
    for i, (h, expect) in enumerate(cases):
        assert got[i] == expect, (h, got[i], expect)


def test_registered_domain_regex_matches_duckdb(spark):
    # the SAME pattern string must behave identically under RE2
    import duckdb

    from buildlog_consultant_spark.ops.web import REG_DOMAIN_PATTERN

    hosts = [
        "www.site.com", "blog.a.b.site.com", "shop.site.co.uk",
        "site.co.uk", "news.portal.com.au", "localhost", "co.uk",
        "deep.x.gov.uk", "a.b.c.d.e",
    ]
    con = duckdb.connect()
    for h in hosts:
        duck = con.execute(
            "SELECT regexp_extract(?, ?, 0)", [h, REG_DOMAIN_PATTERN]
        ).fetchone()[0]
        from buildlog_consultant_spark.ops.web import registered_domain

        spark_rd = (
            spark.range(1)
            .select(registered_domain(F.lit(h)).alias("rd"))
            .collect()[0]["rd"]
        )
        assert spark_rd == (duck if duck != "" else h), (h, spark_rd, duck)


def test_domain_stats_rollup(spark):
    from buildlog_consultant_spark.ops.web import domain_stats

    df = spark.createDataFrame(
        [
            (1, "www.site.com"),
            (2, "blog.site.com"),
            (3, "www.site.com"),
            (4, "other.co.uk"),
            (5, None),
        ],
        "doc_id long, host string",
    )
    got = {
        r["reg_domain"]: (r["n_docs"], r["n_hosts"], r["min_id"])
        for r in domain_stats(df).collect()
    }
    assert got["site.com"] == (3, 2, 1)
    assert got["other.co.uk"] == (1, 1, 4)
    assert got[None] == (1, 0, 5)  # NULL host → NULL domain group


# ---------------------------------------------------------------------------
# naive-bayes classifier
# ---------------------------------------------------------------------------


def _nb_corpus():
    return [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog and the cat"),
        (3, "fr", "le chat et le chien"),
        (4, "fr", "le chien dort"),
        (5, "en", "a cat and a dog"),
        (6, "fr", "le chat dort"),
        (7, None, None),
        (8, "en", ""),
    ]


def test_nb_spark_matches_python_replay(spark):
    from buildlog_consultant_spark.ops.classifier import (
        nb_token_weights,
        py_nb_train_score,
        with_nb_score,
    )

    df = spark.createDataFrame(_nb_corpus(), "doc_id long, lang string, text string")
    label = F.col("lang") == "en"
    weights, prior = nb_token_weights(df, label, vocab_size=8)
    got = {
        r["doc_id"]: (r["nb_milli_bits"], r["nb_predicted"])
        for r in with_nb_score(df, weights, prior).collect()
    }
    train = [(lang == "en", text) for _i, lang, text in _nb_corpus()]
    score = [(i, text) for i, _lang, text in _nb_corpus()]
    want = {i: (s, p) for i, s, p in py_nb_train_score(train, score, vocab_size=8)}
    assert got == want
    # sanity: an en-token doc scores positive, an fr-token doc negative
    assert got[1][1] is True and got[3][1] is False


def test_nb_tokenless_doc_scores_prior(spark):
    from buildlog_consultant_spark.ops.classifier import (
        nb_token_weights,
        with_nb_score,
    )

    df = spark.createDataFrame(_nb_corpus(), "doc_id long, lang string, text string")
    weights, prior = nb_token_weights(df, F.col("lang") == "en")
    got = {
        r["doc_id"]: r["nb_milli_bits"]
        for r in with_nb_score(df, weights, prior).collect()
    }
    assert got[7] == prior and got[8] == prior  # NULL and empty text


def test_nb_empty_training(spark):
    from buildlog_consultant_spark.ops.classifier import (
        nb_token_weights,
        with_nb_score,
    )

    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    weights, prior = nb_token_weights(empty, F.col("lang") == "en")
    assert weights == {} and prior == 0
    df = spark.createDataFrame(_nb_corpus(), "doc_id long, lang string, text string")
    out = with_nb_score(df, weights, prior).collect()
    assert all(r["nb_milli_bits"] == 0 and r["nb_predicted"] is False for r in out)


# ---------------------------------------------------------------------------
# token_budget_from_table / mixture_sample
# ---------------------------------------------------------------------------


def _budget_corpus(spark):
    rows = [(i, ["a", "b", "c", None][i % 4], (i * 37) % 100) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_budget_table_constant_equals_scalar(spark):
    from buildlog_consultant_spark.ops.quota import (
        token_budget_from_table,
        token_budget_per_key,
    )

    df = _budget_corpus(spark)
    for budget in (0, 137, 500, 10**9):
        bud = df.select("source").distinct().withColumn("budget", F.lit(budget))
        a = sorted(r["doc_id"] for r in token_budget_from_table(df, bud, "n_chars").collect())
        b = sorted(r["doc_id"] for r in token_budget_per_key(df, budget, "n_chars").collect())
        assert a == b, budget


def test_budget_table_per_key_matches_naive(spark):
    from buildlog_consultant_spark.ops.quota import (
        token_budget_from_table,
        token_budget_per_key_naive,
    )

    df = _budget_corpus(spark)
    # 'c' absent from the table; NULL key budgeted; NULL budget for 'b'
    bud = spark.createDataFrame(
        [("a", 300), ("b", None), (None, 700)], "source string, budget long"
    )
    got: dict = {}
    for r in token_budget_from_table(df, bud, "n_chars").collect():
        got.setdefault(r["source"], []).append(r["doc_id"])
    # absent key and NULL-budget key contribute nothing
    assert "c" not in got and "b" not in got
    for key, budget in (("a", 300), (None, 700)):
        sub = df.where(F.col("source").eqNullSafe(F.lit(key)))
        want = sorted(
            r["doc_id"]
            for r in token_budget_per_key_naive(sub, budget, "n_chars").collect()
        )
        assert sorted(got.get(key, [])) == want, key


def test_mixture_sample_respects_allocations(spark):
    from buildlog_consultant_spark.ops.quota import (
        mixture_allocations,
        mixture_sample,
    )

    df = _budget_corpus(spark)
    alloc = {
        r["source"]: r["allocation"]
        for r in mixture_allocations(df, 1000, weight_col="n_chars").collect()
    }
    kept = (
        mixture_sample(df, 1000, weight_col="n_chars")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("c"))
        .collect()
    )
    for r in kept:
        assert r["c"] <= alloc[r["source"]], r["source"]


# ---------------------------------------------------------------------------
# bloom incremental dedup
# ---------------------------------------------------------------------------


def _naive_new(batch, corpus):
    return batch.join(
        corpus.select(F.col("text").alias("_t")),
        F.col("text").eqNullSafe(F.col("_t")),
        "left_anti",
    )


def test_bloom_equals_naive_anti_join(spark):
    from buildlog_consultant_spark.ops.bloom import incremental_new_docs

    corpus = spark.createDataFrame(
        [(i, f"doc {i % 50}") for i in range(200)] + [(999, None)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(1000, "doc 7"), (1001, "brand new"), (1002, None), (1003, "other new")],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in incremental_new_docs(batch, corpus).collect())
    want = sorted(r["doc_id"] for r in _naive_new(batch, corpus).collect())
    assert got == want == [1001, 1003]  # NULL-text batch doc IS a dup of NULL


def test_bloom_no_false_negatives_tiny_filter(spark):
    # m_bits=64 (one word) saturates — every batch doc collides, but the
    # exact confirm join still yields exactly the naive answer
    from buildlog_consultant_spark.ops.bloom import incremental_new_docs

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(200 + i, f"doc {i * 2}" if i % 3 else f"fresh {i}") for i in range(60)],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in incremental_new_docs(batch, corpus, m_bits=64, k=2).collect())
    want = sorted(r["doc_id"] for r in _naive_new(batch, corpus).collect())
    assert got == want


def test_bloom_empty_sides(spark):
    from buildlog_consultant_spark.ops.bloom import incremental_new_docs

    empty = spark.createDataFrame([], "doc_id long, text string")
    corpus = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert incremental_new_docs(empty, corpus).collect() == []
    out = incremental_new_docs(corpus, empty).collect()
    assert [r["doc_id"] for r in out] == [1]  # empty corpus → all new


def test_bloom_build_bounded_and_probe_jvm_only(spark):
    from buildlog_consultant_spark.ops.bloom import (
        bloom_build,
        bloom_might_contain,
        incremental_new_docs,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(500)], "doc_id long, text string"
    )
    words = bloom_build(df, F.md5("text"), m_bits=1 << 12, k=4)
    assert len(words) == (1 << 12) // 64
    # every inserted key tests positive (no false negatives)
    hits = df.where(
        bloom_might_contain(words, F.md5("text"), m_bits=1 << 12, k=4)
    ).count()
    assert hits == 500
    # probe plan: corpus-side filter is pure JVM (element_at + masks),
    # no UDF/python eval, no cartesian
    import io
    import contextlib

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        incremental_new_docs(df, df).explain("formatted")
    txt = buf.getvalue()
    assert "element_at" in txt
    assert "CartesianProduct" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_bloom_param_validation(spark):
    from buildlog_consultant_spark.ops.bloom import bloom_build

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bloom_build(df, F.md5("text"), m_bits=0)
    with pytest.raises(ValueError):
        bloom_build(df, F.md5("text"), k=0)


def test_verified_pairs_null_text_no_ansi_error(spark):
    # NULL text → single '' shingle; union never empty → no divide-by-zero
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a b c")], "doc_id long, text string"
    )
    out = minhash_verified_pairs_xx(df, min_shared_bands=1).collect()
    # the two NULL-text docs are exact dups → collapsed; no pair survives
    assert out == []
    out2 = minhash_verified_pairs_xx(
        df, min_shared_bands=1, dedup_exact_first=False
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard_ppm"] for r in out2}
    assert got == {(1, 2): 1_000_000}


# ---------------------------------------------------------------------------
# source overlap / auto quality gate
# ---------------------------------------------------------------------------


def _overlap_docs():
    return [
        ("a", "w1 w2 w3 w4 w5"),
        ("b", "w1 w2 w3 x1 x2"),
        ("c", "z1 z2 z3 z4 z5"),
        ("a", "w3 w4 w5 w6"),
        (None, "w1 w2 w3 w4"),  # NULL source excluded from pairs
    ]


def test_source_overlap_matches_replay(spark):
    from buildlog_consultant_spark.ops.overlap import (
        py_source_gram_overlap,
        source_gram_overlap,
    )

    df = spark.createDataFrame(_overlap_docs(), "source string, text string")
    got = sorted(
        (r["src_a"], r["src_b"], r["shared_grams"], r["jaccard_ppm"])
        for r in source_gram_overlap(df).collect()
    )
    want = py_source_gram_overlap(_overlap_docs())
    assert got == want
    assert any(p[:2] == ("a", "b") for p in got)  # w1w2w3 shared
    assert not any(p[0] is None or p[1] is None for p in got)


def test_source_overlap_hash64_equivalent(spark):
    from buildlog_consultant_spark.ops.overlap import source_gram_overlap

    df = spark.createDataFrame(_overlap_docs(), "source string, text string")
    s = sorted(tuple(r) for r in source_gram_overlap(df, gram_key="string").collect())
    h = sorted(tuple(r) for r in source_gram_overlap(df, gram_key="hash64").collect())
    assert s == h
    with pytest.raises(ValueError):
        source_gram_overlap(df, gram_key="md5")


def test_source_overlap_ubiquitous_cutoff(spark):
    from buildlog_consultant_spark.ops.overlap import (
        py_source_gram_overlap,
        source_gram_overlap,
    )

    # 'c1 c2 c3' gram is in ALL three sources → excluded at max 2
    docs = [
        ("a", "c1 c2 c3 a1"),
        ("b", "c1 c2 c3 b1"),
        ("c", "c1 c2 c3"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = sorted(
        tuple(r) for r in source_gram_overlap(df, max_sources_per_gram=2).collect()
    )
    want = py_source_gram_overlap(docs, max_sources_per_gram=2)
    assert got == [tuple(w) for w in want]
    # the all-source shingle 'c1 c2 c3' must not contribute anywhere
    for _a, _b, shared, _j in got:
        assert shared <= 2


def test_quality_gate_auto_keeps_at_least_three_quarters(spark):
    from buildlog_consultant_spark.ops.text import (
        filter_quality_auto,
        with_quality_score,
    )

    rows = [
        (i, ["en", "fr", None][i % 3], ("word " * ((i % 17) + 1)).strip())
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    total = {
        r["lang"]: r["n"]
        for r in df.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r["lang"]: r["n"]
        for r in filter_quality_auto(df, p=25)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # nearest-rank p25 keeps >= 75% per lang (ties at threshold kept),
    # incl. the NULL-lang group
    for lang, n in total.items():
        assert kept[lang] >= (3 * n) // 4, (lang, kept.get(lang), n)
    # and the gate equals the manual threshold computation
    scored = with_quality_score(df)
    for lang in total:
        qs = sorted(
            r["quality"]
            for r in scored.where(F.col("lang").eqNullSafe(F.lit(lang))).collect()
        )
        import math

        thr = qs[math.ceil(25 * len(qs) / 100) - 1]
        want = sum(1 for q in qs if q >= thr)
        assert kept[lang] == want, lang


# ---------------------------------------------------------------------------
# latest-by-key snapshot
# ---------------------------------------------------------------------------


def test_latest_by_key_matches_window_formulation(spark):
    from buildlog_consultant_spark.ops.snapshot import latest_by_key

    rows = [
        (1, 10, "2024-01-01 10:00:00", "a"),
        (2, 10, "2024-01-01 11:00:00", "b"),  # later ts wins
        (3, 11, "2024-01-01 09:00:00", "c"),
        (4, 11, "2024-01-01 09:00:00", "d"),  # ts tie → higher id wins
        (5, None, "2024-01-01 08:00:00", "e"),  # NULL key is a group
        (6, 12, None, "f"),  # NULL ts loses to any real ts
        (7, 12, "2024-01-01 07:00:00", "g"),
        (8, 13, None, "h"),  # all-NULL ts key → highest id survives
        (9, 13, None, "i"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["user_id"]: r["event_id"]
        for r in latest_by_key(df, key_col="user_id").collect()
    }
    assert got == {10: 2, 11: 4, None: 5, 12: 7, 13: 9}


def test_latest_by_key_preserves_schema_and_is_single_agg(spark):
    from buildlog_consultant_spark.ops.snapshot import latest_by_key

    df = spark.createDataFrame(
        [(1, 5, "2024-01-01 10:00:00", "a", 1.5, "p")],
        "event_id long, user_id long, ts string, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = latest_by_key(df, key_col="user_id")
    assert out.columns == df.columns
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # Map-side partial combine before the one key exchange (shuffle
    # bytes ~ keys, not events); no window (per-key sort of versions).
    assert "partial_max" in plan, plan[:1500]
    assert plan.count("Exchange") == 1, plan[:1500]
    assert "Window" not in plan, plan[:1500]


# ---------------------------------------------------------------------------
# ordered funnel
# ---------------------------------------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_funnel_times_strict_order_semantics(spark):
    from buildlog_consultant_spark.ops.funnel import funnel_times

    T = "2024-01-01 00:00:0{}"
    rows = [
        # full chain
        (1, 1, T.format(1), "view"),
        (2, 1, T.format(2), "click"),
        (3, 1, T.format(3), "purchase"),
        # click BEFORE view ignored; click AT t_view ignored (strict >)
        (4, 2, T.format(1), "click"),
        (5, 2, T.format(2), "view"),
        (6, 2, T.format(2), "click"),
        (7, 2, T.format(4), "click"),
        # purchase before click → chain stops at click
        (8, 3, T.format(1), "view"),
        (9, 3, T.format(2), "purchase"),
        (10, 3, T.format(3), "click"),
        # never viewed → absent entirely
        (11, 4, T.format(1), "click"),
        (12, 4, T.format(2), "purchase"),
        # NULL user enters step 1 but can never advance (join drops NULLs)
        (13, None, T.format(1), "view"),
        (14, None, T.format(2), "click"),
        # NULL ts can't anchor or satisfy strictly-after
        (15, 5, None, "view"),
        (16, 5, T.format(1), "view"),
        (17, 5, None, "click"),
    ]
    got = {
        r["user_id"]: (
            str(r["t_view"]),
            str(r["t_click"]),
            str(r["t_purchase"]),
        )
        for r in funnel_times(_ev(spark, rows)).collect()
    }
    s = "2024-01-01 00:00:0{}"
    assert set(got) == {1, 2, 3, None, 5}
    assert got[1] == (s.format(1), s.format(2), s.format(3))
    assert got[2] == (s.format(2), s.format(4), "None")
    assert got[3] == (s.format(1), s.format(3), "None")
    assert got[None] == (s.format(1), "None", "None")
    assert got[5] == (s.format(1), "None", "None")


def test_funnel_counts_and_plan_shape(spark):
    from buildlog_consultant_spark.ops.funnel import (
        funnel_counts,
        funnel_times,
    )

    T = "2024-01-01 00:00:0{}"
    rows = [
        (1, 1, T.format(1), "view"),
        (2, 1, T.format(2), "click"),
        (3, 1, T.format(3), "purchase"),
        (4, 2, T.format(1), "view"),
        (5, 2, T.format(2), "click"),
        (6, 3, T.format(1), "view"),
    ]
    ev = _ev(spark, rows)
    got = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel_counts(ev).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}
    plan = (
        funnel_times(ev)._jdf.queryExecution().executedPlan().toString()
    )
    # aggregate-shaped: conditional min-aggs with map-side combine,
    # never a per-user event-history window/sort
    assert "Window" not in plan, plan[:1500]
    assert "partial_min" in plan, plan[:1500]


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------


def _kmv_docs(n_docs=60, vocab=500):
    # deterministic pseudo-corpus: doc i picks 30 words from a rolling
    # window of the vocab, so sources share some shingles but not all
    rows = []
    for i in range(n_docs):
        words = [f"w{(i * 17 + j * j) % vocab}" for j in range(30)]
        rows.append((f"s{i % 3}", " ".join(words)))
    rows.append((None, None))  # NULL key group with NULL text
    rows.append(("s0", None))  # NULL text → single '' shingle
    return rows


def test_kmv_matches_python_replay_and_partitioning_invariant(spark):
    from buildlog_consultant_spark.ops.sketch import (
        kmv_distinct_shingles,
        py_kmv_distinct,
    )

    rows = _kmv_docs()
    df = spark.createDataFrame(rows, "source string, text string")
    want = {
        k: (n, est) for k, n, est in py_kmv_distinct(rows, k=16)
    }
    for parts in (1, 7):
        got = {
            r["source"]: (r["n_mins"], r["est_distinct"])
            for r in kmv_distinct_shingles(
                df.repartition(parts), k=16
            ).collect()
        }
        assert got == want, parts


def test_kmv_non_string_key_column(spark):
    # the mapInPandas schemas derive the key type from the input — a
    # bigint key (with a NULL) must round-trip, not Arrow-mismatch
    from buildlog_consultant_spark.ops.sketch import (
        kmv_distinct_shingles,
        py_kmv_distinct,
    )

    rows = [
        (7, "a b c d e"),
        (7, "a b c x y"),
        (9, "p q r s"),
        (None, "a b c"),
    ]
    df = spark.createDataFrame(rows, "grp long, text string")
    got = {
        r["grp"]: (r["n_mins"], r["est_distinct"])
        for r in kmv_distinct_shingles(df, k=8, key_col="grp").collect()
    }
    want = {k: (n, est) for k, n, est in py_kmv_distinct(rows, k=8)}
    assert got == want


def test_kmv_exact_below_k_and_estimate_above_k(spark):
    from buildlog_consultant_spark.ops.sketch import (
        kmv_distinct_shingles,
        py_kmv_distinct,
    )

    rows = _kmv_docs()
    # exact distinct per key from the replay tokenizer
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def sh(text):
        toks = ws.sub(" ", (text or "").strip(" ")).lower().split(" ")
        return {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 3, 0) + 1)
        }

    exact: dict = {}
    for k, t in rows:
        exact.setdefault(k, set()).update(sh(t))
    exact = {k: len(v) for k, v in exact.items()}

    df = spark.createDataFrame(rows, "source string, text string")
    # huge k → sketch holds everything → exact answer
    got = {
        r["source"]: r["est_distinct"]
        for r in kmv_distinct_shingles(df, k=100_000).collect()
    }
    assert got == exact
    # k=64 estimator within 35% of exact for the large keys
    est = {
        r["source"]: r["est_distinct"]
        for r in kmv_distinct_shingles(df, k=64).collect()
    }
    assert est == {
        k: e for k, _, e in py_kmv_distinct(rows, k=64)
    }
    for k, x in exact.items():
        if x > 200:
            assert abs(est[k] - x) <= 0.35 * x, (k, est[k], x)


def test_kmv_estimate_py_edges():
    from buildlog_consultant_spark.ops.sketch import (
        INT64_MAX,
        kmv_estimate_py,
    )

    assert kmv_estimate_py([], 8) == 0
    assert kmv_estimate_py([5, 9], 8) == 2  # below k → exact
    # tiny k-th min → estimate overflows int64 → clamped
    assert kmv_estimate_py(list(range(1, 9)), 8) == INT64_MAX
    # uniform spacing sanity: u_k at 1/1000 of the space → est ≈ 7000
    uk = (1 << 64) // 1000
    mins = [uk * (i + 1) // 8 for i in range(8)]
    assert kmv_estimate_py(mins, 8) == 7 * (1 << 64) // uk


# ---------------------------------------------------------------------------
# integer PageRank on the planted graph
# ---------------------------------------------------------------------------


def test_pagerank_matches_python_replay(spark):
    from buildlog_consultant_spark.ops.graph import pagerank, py_pagerank

    ids = list(range(37))
    df = spark.createDataFrame(
        [(i,) for i in ids] + [(None,)], "doc_id long"
    )
    got = sorted(
        (r["node"], r["in_deg"], r["rank_ppb"])
        for r in pagerank(df).collect()
    )
    assert got == py_pagerank(ids + [None])
    # NULL id excluded from the graph
    assert len(got) == 37


def test_pagerank_invariants(spark):
    from buildlog_consultant_spark.ops.graph import (
        OUT_DEG,
        pagerank,
        planted_edges,
        py_pagerank,
    )

    n = 25
    rows = py_pagerank(list(range(n)))
    ranks = [r for _, _, r in rows]
    # floor-division mass loss only: sum within n+100 ppb of 1e9
    assert 10**9 - (n + 100) * 10 <= sum(ranks) <= 10**9
    # in-degree mass conservation: total in_deg == n * OUT_DEG
    assert sum(d for _, d, _ in rows) == n * OUT_DEG
    # rank correlates with in-degree on the planted graph: the max-rank
    # node has >= the median in-degree
    by_rank = sorted(rows, key=lambda r: -r[2])
    degs = sorted(d for _, d, _ in rows)
    assert by_rank[0][1] >= degs[len(degs) // 2]
    # no self-loops in the planted edges
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = planted_edges(df, n).collect()
    assert len(edges) == n * OUT_DEG
    assert all(e["src"] != e["dst"] for e in edges)
    assert all(0 <= e["dst"] < n for e in edges)


def test_pagerank_zero_iters_is_uniform_base(spark):
    from buildlog_consultant_spark.ops.graph import pagerank

    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    got = {r["node"]: r["rank_ppb"] for r in pagerank(df, iters=0).collect()}
    assert got == {i: 10**8 for i in range(10)}


# ---------------------------------------------------------------------------
# SCD2 history intervals / rollup
# ---------------------------------------------------------------------------


def test_history_intervals_semantics(spark):
    from buildlog_consultant_spark.ops.snapshot import history_intervals

    T = "2024-01-01 00:00:0{}"
    rows = [
        (1, 10, T.format(1), "a"),
        (2, 10, T.format(3), "b"),
        (3, 10, T.format(3), "c"),  # ts tie → ordered by event_id
        (4, 10, None, "d"),  # NULL ts sorts OLDEST
        (5, 11, T.format(5), "e"),  # single version → open interval
        (6, None, T.format(1), "f"),  # NULL key is one history group
        (7, None, T.format(2), "g"),
        (8, 12, None, "h"),  # TWO NULL-ts versions: id=8's successor
        (9, 12, None, "i"),  # has NULL ts → valid_to NULL but NOT current
        (10, 12, T.format(4), "j"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["event_id"]: (str(r["valid_from"]), str(r["valid_to"]), r["is_current"])
        for r in history_intervals(df).collect()
    }
    s = "2024-01-01 00:00:0{}"
    assert got[4] == ("None", s.format(1), False)  # NULL-ts closed first
    assert got[1] == (s.format(1), s.format(3), False)
    assert got[2] == (s.format(3), s.format(3), False)  # tie: 2 precedes 3
    assert got[3] == (s.format(3), "None", True)  # newest stays open
    assert got[5] == (s.format(5), "None", True)
    assert got[6] == (s.format(1), s.format(2), False)
    assert got[7] == (s.format(2), "None", True)
    # the review scenario: NULL valid_to does NOT imply current when the
    # successor's ts is NULL — is_current disambiguates
    assert got[8] == ("None", "None", False)
    assert got[9] == ("None", s.format(4), False)
    assert got[10] == (s.format(4), "None", True)


def test_history_intervals_chain_invariant(spark):
    # on real data: per key, exactly one current version; valid_to of
    # any closed interval equals some version's valid_from of the same
    # key. (NULL-valid_to count == n_keys additionally holds here only
    # because the sf corpora carry no NULL ts.)
    from buildlog_consultant_spark.ops.snapshot import history_intervals

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = history_intervals(ev).select(
        "user_id", "valid_from", "valid_to", "is_current"
    )
    n_keys = ev.select("user_id").distinct().count()
    assert out.where(F.col("is_current")).count() == n_keys
    assert out.where(F.col("valid_to").isNull()).count() == n_keys
    dangling = (
        out.where(F.col("valid_to").isNotNull())
        .alias("a")
        .join(
            out.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.valid_to") == F.col("b.valid_from")),
            "left_anti",
        )
        .count()
    )
    assert dangling == 0


def test_events_rollup_gid_and_single_pass_plan(spark):
    rows = [
        (1, "2024-01-01 10:00:00", "view", 1.0),
        (2, "2024-01-01 11:00:00", "view", 2.0),
        (3, "2024-01-02 10:00:00", "click", 4.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    day = F.to_date("ts").alias("day")
    out = ev.rollup("event_type", day).agg(
        F.grouping_id().alias("gid"), F.count("*").alias("n")
    )
    got = {
        (r["event_type"], str(r["day"])): (r["gid"], r["n"])
        for r in out.collect()
    }
    assert got[("view", "2024-01-01")] == (0, 2)
    assert got[("view", "None")] == (1, 2)  # day aggregated → low bit
    assert got[("click", "None")] == (1, 1)
    assert got[(None, "None")] == (3, 3)  # grand total: both bits
    plan = (
        out._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # ONE scan: Expand fans the grouping sets map-side into a single
    # partial+final hash agg — not one scan+agg per grouping set
    assert plan.count("Expand") == 1, plan[:1500]
    assert plan.count("HashAggregate") == 2, plan[:1500]


# ---------------------------------------------------------------------------
# rate anomaly
# ---------------------------------------------------------------------------


def _spike_events(spark):
    # type "a": 1 event/hour for 30 hours, then 10 events in hour 30;
    # type "b": young series (10 hours) with a huge hour — never eligible;
    # a NULL-ts event and a NULL-type series for policy coverage
    rows = []
    eid = 0
    for h in range(30):
        rows.append((eid, h, "a"))
        eid += 1
    for _ in range(9):  # 9 events in hour 30 vs trailing mean 1
        rows.append((eid, 30, "a"))
        eid += 1
    for h in range(10):
        rows.append((eid, h, "b"))
        eid += 1
    rows.append((eid, 9, "b"))
    eid += 1
    for _ in range(50):
        rows.append((eid, 9, "b"))
        eid += 1
    rows.append((eid, None, "a"))
    eid += 1
    for h in range(26):
        rows.append((eid, h, None))
        eid += 1
    df = spark.createDataFrame(rows, "event_id long, h int, event_type string")
    return df.select(
        "event_id",
        "event_type",
        F.when(
            F.col("h").isNotNull(),
            F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)"),
        ).alias("ts"),
    )


def test_rate_spikes_plants_and_policies(spark):
    from buildlog_consultant_spark.ops.anomaly import rate_spikes

    out = rate_spikes(_spike_events(spark), num=2, den=1, window=24)
    got = {
        (r["event_type"], str(r["hour"])): (r["n"], r["sum_prev"])
        for r in out.collect()
    }
    # the planted hour-30 spike: n=9, trailing 24h sum=24 (hours 6..29)
    assert got[("a", "2024-01-02 06:00:00")] == (9, 24)
    # young series "b" (10 hours of history) never alerts
    assert not any(t == "b" for t, _ in got)
    # NULL type is a normal series; its uniform 1/hour never spikes
    assert not any(t is None for t, _ in got)
    assert len(got) == 1


def test_rate_spikes_gap_counts_as_zero(spark):
    from buildlog_consultant_spark.ops.anomaly import rate_spikes

    # 25 quiet hours, a 23-hour gap, then 2 events in one hour: the
    # trailing-24h sum is ONLY the 1 event at gap start → spike; a
    # ROWS-based window would have averaged the full quiet history
    rows = [(i, i, "a") for i in range(25)] + [(100, 48, "a"), (101, 48, "a")]
    df = spark.createDataFrame(
        rows, "event_id long, h int, event_type string"
    ).select(
        "event_id",
        "event_type",
        F.expr("timestamp '2024-01-01 00:00:00' + make_interval(0,0,0,0,h,0,0)").alias("ts"),
    )
    out = rate_spikes(df, num=2, den=1, window=24).collect()
    got = {(r["event_type"], str(r["hour"])): (r["n"], r["sum_prev"]) for r in out}
    assert got[("a", "2024-01-03 00:00:00")] == (2, 1)


def test_rate_spikes_single_corpus_agg_plan(spark):
    from buildlog_consultant_spark.ops.anomaly import rate_spikes

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        rate_spikes(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    # one partial+final hash agg touches the corpus; windows run over
    # the (type, hour) aggregate only
    assert plan.count("HashAggregate") == 2, plan[:2000]
