"""Property tests for the round-6 operators: randomized Spark == replay
parity over small adversarial corpora (tiny alphabets force gram/line
collisions far denser than the driver data has; NULLs mixed in). Each
example runs real Spark jobs, so example counts are deliberately small —
these complement the handcrafted corner tests, they don't replace them."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from buildlog_consultant_spark.ops.lines import (
    py_strip_boilerplate_lines,
    strip_boilerplate_lines,
)
from buildlog_consultant_spark.ops.quota import (
    token_budget_per_key,
    token_budget_per_key_naive,
)
from buildlog_consultant_spark.ops.spans import py_scrub_spans, scrub_span_duplicated


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


# a 4-word alphabet makes 8-grams collide across random 10-30 token docs
_WORDS = st.sampled_from(["aa", "bb", "Cc", "dd"])
_TEXT = st.one_of(
    st.none(),
    st.lists(_WORDS, min_size=0, max_size=30).map(" ".join),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_TEXT, min_size=1, max_size=8))
def test_scrub_matches_replay_on_random_corpora(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(
        (
            (r["doc_id"], r["text_scrubbed"], r["n_tokens_removed"])
            for r in scrub_span_duplicated(df, min_len=4).collect()
        ),
        key=_nkey,
    )
    want = sorted(py_scrub_spans(docs, min_len=4), key=_nkey)
    assert got == want


_LINE = st.sampled_from(["nav", "foot", "x", "y", ""])
_DOC = st.one_of(
    st.none(), st.lists(_LINE, min_size=0, max_size=6).map("\n".join)
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(st.sampled_from(["s1", "s2", None]), _DOC),
        min_size=1,
        max_size=10,
    )
)
def test_strip_boilerplate_matches_replay_on_random_corpora(spark, rows):
    docs = [(i, src, text) for i, (src, text) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    got = sorted(
        (
            (r["doc_id"], r["text_stripped"], r["n_lines_removed"])
            for r in strip_boilerplate_lines(df, min_docs=2).collect()
        ),
        key=_nkey,
    )
    want = sorted(py_strip_boilerplate_lines(docs, min_docs=2), key=_nkey)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    weights=st.lists(
        st.tuples(st.sampled_from(["k1", "k2", None]), st.integers(0, 20)),
        min_size=1,
        max_size=20,
    ),
    budget=st.integers(0, 60),
)
def test_token_budget_per_key_matches_naive_randomized(spark, weights, budget):
    rows = [(i, k, w) for i, (k, w) in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id int, source string, w int")
    a = sorted(
        (tuple(r) for r in token_budget_per_key(
            df, budget, "w", key_col="source", id_col="doc_id"
        ).collect()),
        key=_nkey,
    )
    b = sorted(
        (tuple(r) for r in token_budget_per_key_naive(
            df, budget, "w", key_col="source", id_col="doc_id"
        ).collect()),
        key=_nkey,
    )
    assert a == b


# ---------------------------------------------------------------------------
# hash_split_per_key (round-6 session 3): bucketed labeling == naive window
# ---------------------------------------------------------------------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=500),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    keys=st.lists(st.sampled_from(["k0", "k1", None]), min_size=40, max_size=40),
    weights=st.sampled_from(
        [{"a": 1, "b": 1}, {"train": 8, "val": 1, "test": 1}, {"x": 3, "y": 2, "z": 5}]
    ),
    chars=st.sampled_from([1, 2]),
)
def test_hash_split_matches_naive_on_random_corpora(
    spark, ids, keys, weights, chars
):
    from pyspark.sql import Window

    from buildlog_consultant_spark.ops.quota import (
        _order_hash,
        hash_split_per_key,
    )

    rows = [(i, keys[n]) for n, i in enumerate(ids)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r["doc_id"], r["lang"]): r["split"]
        for r in hash_split_per_key(
            df, weights, key_col="lang", bucket_hex_chars=chars
        ).collect()
    }
    w = Window.partitionBy("lang").orderBy(_order_hash("doc_id"), "doc_id")
    naive = df.withColumn("r", F.row_number().over(w)).withColumn(
        "n", F.count("*").over(Window.partitionBy("lang"))
    )
    labels, total = list(weights), sum(weights.values())
    want = {}
    for r in naive.collect():
        cum, label = 0, labels[-1]
        for lab in labels[:-1]:
            cum += weights[lab]
            if r["r"] <= (r["n"] * cum) // total:
                label = lab
                break
        want[(r["doc_id"], r["lang"])] = label
    assert got == want
    assert len(got) == len(rows)
