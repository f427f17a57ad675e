"""Property tests for the round-6 session-2 operators: randomized
Spark == replay / Spark == naive parity (mixture apportionment, per-key
budget tables, bloom incremental dedup, NB classifier). Each example
runs real Spark jobs — example counts deliberately small."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops.bloom import incremental_new_docs
from buildlog_consultant_spark.ops.classifier import (
    nb_token_weights,
    py_nb_train_score,
    with_nb_score,
)
from buildlog_consultant_spark.ops.quota import (
    mixture_allocations,
    mixture_allocations_py,
    token_budget_from_table,
    token_budget_per_key_naive,
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


_KEY = st.sampled_from(["a", "b", "c", None])
_W = st.one_of(st.none(), st.integers(min_value=0, max_value=1000))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(st.tuples(_KEY, _W), min_size=1, max_size=12),
    budget=st.integers(min_value=0, max_value=10**6),
)
def test_mixture_allocations_match_replay(spark, rows, budget):
    docs = [(i, k, w) for i, (k, w) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, source string, w long")
    nulls_first = lambda r: (r[0] is not None, r[0] or "")  # noqa: E731
    got = sorted(
        (
            (r["source"], r["tokens"], r["allocation"])
            for r in mixture_allocations(df, budget, weight_col="w").collect()
        ),
        key=nulls_first,
    )
    totals: dict = {}
    for _i, k, w in docs:
        totals[k] = totals.get(k, 0) + (w or 0)
    want = sorted(
        mixture_allocations_py(sorted(totals.items(), key=_nkey), budget),
        key=nulls_first,
    )
    assert got == want
    assert sum(a for _, _, a in got) in (budget, 0)  # 0 iff all-zero weights


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(st.tuples(_KEY, _W), min_size=1, max_size=14),
    budgets=st.fixed_dictionaries(
        {},
        optional={
            "a": st.integers(min_value=0, max_value=500),
            "b": st.integers(min_value=0, max_value=500),
            "c": st.integers(min_value=0, max_value=500),
            None: st.integers(min_value=0, max_value=500),
        },
    ),
)
def test_budget_table_matches_per_key_naive(spark, rows, budgets):
    docs = [(i, k, w) for i, (k, w) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id long, source string, w long")
    bud = spark.createDataFrame(
        list(budgets.items()) or [("zz", 1)], "source string, budget long"
    )
    got: dict = {}
    for r in token_budget_from_table(df, bud, "w").collect():
        got.setdefault(r["source"], []).append(r["doc_id"])
    for key in ["a", "b", "c", None]:
        sub = df.where(F.col("source").eqNullSafe(F.lit(key)))
        if key in budgets:
            want = sorted(
                r["doc_id"]
                for r in token_budget_per_key_naive(
                    sub, budgets[key], "w"
                ).collect()
            )
        else:
            want = []  # absent from the budget table → keeps nothing
        assert sorted(got.get(key, [])) == want, key


_TXT = st.one_of(
    st.none(),
    st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=6
    ).map(" ".join),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_TXT, min_size=0, max_size=10),
    batch=st.lists(_TXT, min_size=1, max_size=6),
)
def test_bloom_incremental_matches_anti_join(spark, corpus, batch):
    cdf = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    ) if corpus else spark.createDataFrame([], "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch)], "doc_id long, text string"
    )
    # tiny filter (m_bits=64) maximizes false positives; result must
    # still equal the exact anti-join
    got = sorted(
        r["doc_id"]
        for r in incremental_new_docs(bdf, cdf, m_bits=64, k=3).collect()
    )
    corpus_set = set(corpus)
    want = sorted(
        100 + i for i, t in enumerate(batch) if t not in corpus_set
    )
    assert got == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.tuples(st.booleans(), _TXT), min_size=1, max_size=10
    )
)
def test_nb_matches_replay_on_random_corpora(spark, docs):
    rows = [(i, lab, t) for i, (lab, t) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, lab boolean, text string")
    weights, prior = nb_token_weights(df, F.col("lab"), vocab_size=4)
    got = sorted(
        (r["doc_id"], r["nb_milli_bits"], r["nb_predicted"])
        for r in with_nb_score(df, weights, prior).collect()
    )
    want = sorted(
        py_nb_train_score(
            [(lab, t) for _i, lab, t in rows],
            [(i, t) for i, _lab, t in rows],
            vocab_size=4,
        )
    )
    assert got == want
