"""Round-6 session-4 batch 2: PPJoin-style exact all-pairs Jaccard,
prefix-blocked Levenshtein pairs, mojibake signals, exact per-key
quantiles + Tukey-fence outliers, JSON field extraction."""

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
# jaccard_allpairs (prefix filtering)
# ---------------------------------------------------------------------------


_PP_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog tonight"),
    (1, "the quick brown fox jumps over the lazy cat tonight"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog tonight"),   # exact dup of 0
    (3, "completely different words appear in this document body"),
    (4, "completely different words appear in this document text"),  # near-dup of 3
    (5, "short doc"),                                             # < 3 tokens → no grams
    (6, None),                                                    # NULL text
    (None, "the quick brown fox jumps over the lazy dog tonight"),  # NULL id dropped
]


def test_jaccard_allpairs_matches_bruteforce(spark):
    from buildlog_consultant_spark.ops.ppjoin import (
        jaccard_allpairs,
        jaccard_allpairs_bruteforce,
    )

    df = spark.createDataFrame(_PP_DOCS, "doc_id long, text string")
    for tau in (200, 500, 800, 1000):
        got = sorted(
            map(tuple, jaccard_allpairs(df, tau_permille=tau).collect())
        )
        want = sorted(
            map(
                tuple,
                jaccard_allpairs_bruteforce(df, tau_permille=tau).collect(),
            )
        )
        assert got == want, f"tau={tau}"
    # exact dup pair present at tau=1000 with permille 1000
    exact = dict(
        ((a, b), p)
        for a, b, p in map(
            tuple, jaccard_allpairs(df, tau_permille=1000).collect()
        )
    )
    assert exact[(0, 2)] == 1000


def test_jaccard_allpairs_prefix_index_is_smaller(spark):
    """The prefix index (what the candidate self-join sees) must be
    strictly smaller than the full gram index — the point of the
    filter — while test_jaccard_allpairs_matches_bruteforce pins that
    it loses no qualifying pair."""
    from buildlog_consultant_spark.ops import ppjoin
    from buildlog_consultant_spark.ops.text import word_ngrams

    df = spark.createDataFrame(_PP_DOCS, "doc_id long, text string")
    docs = df.where(F.col("doc_id").isNotNull())
    full = word_ngrams(docs, n=3).count()
    # replicate the op's prefix construction at tau=800
    tok = word_ngrams(docs, n=3)
    dfreq = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("_gdf"))
    ordered = (
        tok.join(dfreq, "gram")
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_gdf"), F.col("gram")))
            ).alias("_arr"),
            F.count(F.lit(1)).alias("_nt"),
        )
    )
    p = F.expr("_nt - ((800 * _nt + 999) DIV 1000) + 1").cast("int")
    prefix_n = ordered.select(
        F.explode(F.slice("_arr", F.lit(1), p)).alias("g")
    ).count()
    assert 0 < prefix_n < full


@pytest.mark.parametrize("tau", [0, -5, 1001])
def test_jaccard_allpairs_rejects_bad_tau(spark, tau):
    from buildlog_consultant_spark.ops.ppjoin import jaccard_allpairs

    df = spark.createDataFrame(_PP_DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        jaccard_allpairs(df, tau_permille=tau)


def test_jaccard_allpairs_property_vs_bruteforce(spark):
    """Synthetic corpus with heavy overlap: every doc is a sliding
    window over a shared token tape, so qualifying pairs exist at many
    thresholds; prefix filtering must lose none of them."""
    from buildlog_consultant_spark.ops.ppjoin import (
        jaccard_allpairs,
        jaccard_allpairs_bruteforce,
    )

    tape = [f"w{i % 17}" for i in range(60)]
    rows = [
        (i, " ".join(tape[i : i + 20 + (i % 5)])) for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for tau in (300, 600, 900):
        got = sorted(
            map(tuple, jaccard_allpairs(df, tau_permille=tau).collect())
        )
        want = sorted(
            map(
                tuple,
                jaccard_allpairs_bruteforce(df, tau_permille=tau).collect(),
            )
        )
        assert got == want, f"tau={tau}"


# ---------------------------------------------------------------------------
# levenshtein_block_pairs
# ---------------------------------------------------------------------------


_LEV_DOCS = [
    (0, "Breaking News: markets rally on data"),
    (1, "breaking news: markets rally on data!"),   # dist 1 after lower
    (2, "breaking news: markets slump on data"),    # dist 5 vs 0 (rally→slump)
    (3, "totally unrelated headline about sports"),
    (4, None),
    (5, ""),
    (6, "   breaking    news: markets rally on data"),  # normalizes to == 1-ish
    (None, "breaking news: markets rally on data"),
]


def test_lev_pairs_match_python_replay(spark):
    from buildlog_consultant_spark.ops.fuzzy import (
        levenshtein_block_pairs,
        py_levenshtein_block_pairs,
    )

    df = spark.createDataFrame(_LEV_DOCS, "doc_id long, text string")
    for k in (0, 2, 8):
        got = sorted(
            map(
                tuple,
                levenshtein_block_pairs(df, max_dist=k).collect(),
            )
        )
        want = py_levenshtein_block_pairs(
            [(r["doc_id"], r["text"]) for r in df.collect()], max_dist=k
        )
        assert got == want, f"k={k}"
    # sanity on the k=8 content: (0,1) dist 1, (0,6) dist 0 after norm
    pairs = dict(((a, b), d) for a, b, d in want)
    assert pairs[(0, 1)] == 1
    assert pairs[(0, 6)] == 0
    assert (0, 3) not in pairs  # different block


def test_lev_pairs_unicode_char_semantics(spark):
    """Spark levenshtein counts CHARS (not UTF-8 bytes) — the replay
    must agree on non-ASCII edits."""
    from buildlog_consultant_spark.ops.fuzzy import (
        levenshtein_block_pairs,
        py_levenshtein_block_pairs,
    )

    rows = [(0, "das schöne café am see"), (1, "das schoene cafe am see")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, levenshtein_block_pairs(df, max_dist=8, prefix_chars=7).collect())
    )
    want = py_levenshtein_block_pairs(rows, max_dist=8, prefix_chars=7)
    assert got == want
    assert got[0][2] == 3  # ö→oe (2 char ops: sub+insert... exact: 3)


def test_py_lev_banded_exactness():
    from buildlog_consultant_spark.ops.fuzzy import _py_lev

    assert _py_lev("kitten", "sitting", 10) == 3
    assert _py_lev("kitten", "sitting", 2) == -1
    assert _py_lev("", "abc", 3) == 3
    assert _py_lev("abc", "abc", 0) == 0


# ---------------------------------------------------------------------------
# with_mojibake_signals
# ---------------------------------------------------------------------------


def test_mojibake_signals(spark):
    from buildlog_consultant_spark.ops.text import with_mojibake_signals

    rows = [
        (0, "perfectly clean ascii text"),
        (1, "bad char here � and here �"),
                (2, "c1 control \u0085 lurking"),
        (3, "double encoded cafÃ© and grÃ¼n"),
        (4, None),
        (5, "café legit accents stay clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_replacement"],
            r["n_c1"],
            r["n_double_utf8"],
            r["is_mojibake"],
        )
        for r in with_mojibake_signals(df).collect()
    }
    assert got[0] == (0, 0, 0, False)
    assert got[1] == (2, 0, 0, True)
    assert got[2] == (0, 1, 0, True)
    assert got[3] == (0, 0, 2, True)
    assert got[4] == (0, 0, 0, False)  # NULL counts as clean
    assert got[5] == (0, 0, 0, False)  # real accents are not mojibake


# ---------------------------------------------------------------------------
# exact_quantiles_by_key / iqr_outlier_stats
# ---------------------------------------------------------------------------


def test_exact_quantiles_by_key_nearest_rank(spark):
    from buildlog_consultant_spark.ops.robust import exact_quantiles_by_key

    rows = [("a", v) for v in [1, 2, 3, 4, 100]] + [
        ("b", v) for v in [10, 10, 10, 10]
    ] + [("a", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r["k"], r["p"]): r["v"]
        for r in exact_quantiles_by_key(df, "k", "v", ps=(25, 50, 75)).collect()
    }
    # n=5: rank ceil(25*5/100)=2 → 2; ceil(50*5/100)=3 → 3; ceil(75*5/100)=4 → 4
    assert got[("a", 25)] == 2
    assert got[("a", 50)] == 3
    assert got[("a", 75)] == 4
    assert got[("b", 50)] == 10


def test_exact_quantiles_match_duckdb_nearest_rank(spark):
    import duckdb

    from buildlog_consultant_spark.ops.robust import exact_quantiles_by_key

    vals = [(chr(97 + i % 3), (i * 37) % 101) for i in range(200)]
    df = spark.createDataFrame(vals, "k string, v long")
    got = sorted(
        map(
            tuple,
            exact_quantiles_by_key(df, "k", "v", ps=(25, 50, 75, 95)).collect(),
        )
    )
    lit = ",".join(f"('{k}',{v})" for k, v in vals)
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""
        WITH d(k, v) AS (VALUES {lit}),
        ranked AS (
          SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY v) AS rn,
                 COUNT(*) OVER (PARTITION BY k) AS n
          FROM d
        )
        SELECT k, CAST(p AS INT) AS p, v
        FROM ranked, (VALUES (25), (50), (75), (95)) t(p)
        WHERE rn = (p * n + 99) // 100
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_iqr_outlier_stats(spark):
    from buildlog_consultant_spark.ops.robust import iqr_outlier_stats

    # key 'a': 12 values 1..12 plus outliers -100 and 1000
    rows = [("a", v) for v in range(1, 13)] + [("a", -100), ("a", 1000)]
    rows += [("b", 5), ("b", None)]
    df = spark.createDataFrame(rows, "k string, v long")
    got = {r["k"]: r for r in iqr_outlier_stats(df, "k", "v").collect()}
    a = got["a"]
    # n=14 → q25 rank ceil(14*25/100)=4, q75 rank ceil(14*75/100)=11
    # sorted: -100,1,2,...,12,1000 → rank4=3, rank11=10, iqr=7
    assert (a["q25"], a["q75"]) == (3, 10)
    # fences: lo = 3-10.5 = -7.5, hi = 10+10.5 = 20.5 → -100 low, 1000 high
    assert (a["n"], a["n_low"], a["n_high"]) == (14, 1, 1)
    b = got["b"]
    assert (b["n"], b["n_low"], b["n_high"]) == (1, 0, 0)


def test_iqr_histogram_plan_no_corpus_window(spark):
    """The only corpus-grain shuffle is the (key, value) histogram agg;
    windows run over the histogram."""
    from buildlog_consultant_spark.ops.robust import exact_quantiles_by_key

    df = spark.range(10000).select(
        (F.col("id") % 5).cast("string").alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    plan = (
        exact_quantiles_by_key(df, "k", "v")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # Window input is the aggregate, never the relation directly:
    # textually, Aggregate must appear below Window in the tree.
    assert plan.index("Window") < plan.index("Aggregate")


# ---------------------------------------------------------------------------
# with_json_fields
# ---------------------------------------------------------------------------


def test_with_json_fields(spark):
    from buildlog_consultant_spark.ops.semistruct import with_json_fields

    rows = [
        (0, '{"k": 69}'),
        (1, '{"k": 7, "m": {"d": 3}}'),
        (2, "corrupt2"),
        (3, None),
        (4, '{"m": {"d": 9}}'),
        (5, '{"k": "not a number"}'),
        (6, '{"k": "35"}'),   # QUOTED number: typed parse rejects it
        (7, '{"k": 3.5}'),    # double under BIGINT: rejected
        (8, '{"k": true}'),   # boolean under BIGINT: rejected
    ]
    df = spark.createDataFrame(rows, "id long, props string")
    got = {
        r["id"]: (r["k"], r["d"])
        for r in with_json_fields(
            df, "props", "k BIGINT, m STRUCT<d: BIGINT>", {"k": "k", "d": "m.d"}
        ).collect()
    }
    assert got[0] == (69, None)
    assert got[1] == (7, 3)
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[4] == (None, 9)
    assert got[5] == (None, None)  # type mismatch → NULL (both engines)
    assert got[6] == (None, None)  # quoted number rejected by typed parse
    assert got[7] == (None, None)
    assert got[8] == (None, None)
    # ...and the DuckDB oracle's json_type gate replays exactly that:
    import duckdb

    oc = duckdb.sql(
        """
        SELECT CASE WHEN json_type(TRY_CAST(p AS JSON), '$.k')
                        IN ('BIGINT', 'UBIGINT')
                   THEN TRY_CAST(json_extract_string(TRY_CAST(p AS JSON),
                                                     '$.k') AS BIGINT)
               END AS k
        FROM (VALUES ('{"k": 69}'), ('{"k": "35"}'), ('{"k": 3.5}'),
                     ('{"k": true}'), ('{"k": -7}')) t(p)
        """
    ).fetchall()
    assert [r[0] for r in oc] == [69, None, None, None, -7]
