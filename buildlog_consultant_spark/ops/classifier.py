"""Trained quality/language classifier — the supervised-classifier stage
of a CCNet/Dolma-style pipeline (upstream uses fastText; the classic
SQL-replayable analog with the SAME pipeline shape is multinomial Naive
Bayes over unigrams). Train once on a labeled subset, broadcast the
integer weight table, score the whole corpus map-side — at 100 TB the
scoring pass dominates and it is pure whole-plan map work, no shuffle.

Determinism contract (mirrors `unigram_vocab_costs`): the training
aggregation produces EXACT integer counts (explode + hash agg with
map-side combine, shuffle bounded by DISTINCT tokens); the float log2
runs once per vocab token ON THE DRIVER and identically in the
Python-golden oracle replay, so per-document scores are integer
arithmetic end-to-end and hash-stable across engines.

Model: milli-bit log-odds with add-one smoothing.

  w(t)  = floor(1000 · (log2((c1+1)/(n1+V)) − log2((c0+1)/(n0+V))))
  prior = floor(1000 · (log2(d1+1) − log2(d0+1)))
  score(doc) = prior + Σ_tokens w(t)      (OOV tokens weigh 0)
  predicted  = score > 0

where c1/c0 are the token's occurrence counts in positive/negative
training docs, n1/n0 the per-class total token counts, V the vocab
size, d1/d0 the per-class training doc counts. A doc with no tokens
(NULL/empty text) scores exactly `prior` — the prior IS the
no-evidence answer, so nothing is dropped or NULL.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr

NB_VOCAB_SIZE = 128


def nb_token_counts(df: DataFrame, label, text_col: str = "text") -> DataFrame:
    """The training lineage: per-token (t, c1, c0) class counts, plus
    one NULL-sentinel row per doc whose counts ARE the per-class doc
    counts. Split out of `nb_token_weights` so the single-corpus-scan
    plan shape (one explode, one partial+final hash-agg pair) is
    assertable on the REAL lineage, not a test replica."""
    lab = F.coalesce(label, F.lit(False))
    toks = F.concat(
        F.array(F.lit(None).cast("string")), tokens_expr(text_col)
    )
    return (
        df.select(F.explode(toks).alias("t"), lab.alias("_l"))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("_l"), 1).otherwise(0)).alias("c1"),
            F.sum(F.when(F.col("_l"), 0).otherwise(1)).alias("c0"),
        )
    )


def nb_token_weights(
    df: DataFrame,
    label,
    vocab_size: int = NB_VOCAB_SIZE,
    text_col: str = "text",
) -> tuple[dict, int]:
    """Train on ``df`` with boolean Column ``label`` (NULL counts as
    false). Returns ``(weights, prior)`` — milli-bit integer log-odds
    for the ``vocab_size`` most frequent tokens (ties by token asc) and
    the doc-count prior. ONE corpus scan: each doc also emits a NULL
    sentinel token (tokens_expr is never NULL, so the sentinel survives
    NULL/empty text), whose per-class counts ARE the doc counts — the
    three driver-bounded collects (1-row totals, 1-row doc counts,
    V-row top list) all run on the persisted per-token table, whose
    shuffle is bounded by distinct tokens, never corpus tokens."""
    counts = nb_token_counts(df, label, text_col).persist()
    # totals + doc counts + top-V share one corpus scan
    try:
        real = counts.where(F.col("t").isNotNull())
        tot = real.agg(
            F.coalesce(F.sum("c1"), F.lit(0)).alias("n1"),
            F.coalesce(F.sum("c0"), F.lit(0)).alias("n0"),
        ).collect()[0]
        n1, n0 = tot["n1"], tot["n0"]
        sent = counts.where(F.col("t").isNull()).collect()
        d1 = sent[0]["c1"] if sent else 0
        d0 = sent[0]["c0"] if sent else 0
        top = (
            real.orderBy(F.desc(F.col("c1") + F.col("c0")), F.asc("t"))
            .limit(vocab_size)
            .collect()
        )
    finally:
        counts.unpersist()
    weights = {
        r["t"]: int(
            math.floor(
                (
                    math.log2(r["c1"] + 1)
                    - math.log2(n1 + vocab_size)
                    - math.log2(r["c0"] + 1)
                    + math.log2(n0 + vocab_size)
                )
                * 1000
            )
        )
        for r in top
    }
    prior = int(math.floor((math.log2(d1 + 1) - math.log2(d0 + 1)) * 1000))
    return weights, prior


def with_nb_score(
    df: DataFrame, weights: dict, prior: int, text_col: str = "text"
) -> DataFrame:
    """Adds ``nb_milli_bits`` (integer log-odds score, = ``prior`` for
    token-less docs) and ``nb_predicted``. Pure map-side: weight map
    literal + fold, no shuffle — same plan-size caveat as
    `with_unigram_logloss` (swap to a dict pandas UDF past ~1k vocab)."""
    toks = tokens_expr(text_col)
    if weights:
        pairs = []
        for t, w in sorted(weights.items()):
            pairs.extend([F.lit(t), F.lit(int(w))])
        m = F.create_map(*pairs)
        w_of = lambda t: F.coalesce(F.element_at(m, t), F.lit(0)).cast("long")  # noqa: E731
    else:
        w_of = lambda t: F.lit(0).cast("long")  # noqa: E731
    score = F.lit(int(prior)).cast("long") + F.aggregate(
        F.transform(toks, w_of), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return df.withColumn("nb_milli_bits", score).withColumn(
        "nb_predicted", F.col("nb_milli_bits") > 0
    )


def py_nb_train_score(
    train: list, score: list, vocab_size: int = NB_VOCAB_SIZE
) -> list:
    """Python-golden replay: ``train`` is [(label: bool, text)], ``score``
    is [(id, text)]; returns [(id, nb_milli_bits, nb_predicted)] — same
    tokenizer (whitespace-normalize, lower, split), same vocab selection
    and smoothing, same driver-side float log2, same integer fold."""
    import re
    from collections import Counter

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def toks(text):
        t = (text or "").strip(" ")
        return ws.sub(" ", t).lower().split(" ") if t else []

    c1: Counter = Counter()
    c0: Counter = Counter()
    d1 = d0 = 0
    for lab, text in train:
        lab = bool(lab)
        (c1 if lab else c0).update(toks(text))
        if lab:
            d1 += 1
        else:
            d0 += 1
    n1, n0 = sum(c1.values()), sum(c0.values())
    vocab = sorted(
        set(c1) | set(c0), key=lambda t: (-(c1[t] + c0[t]), t)
    )[:vocab_size]
    weights = {
        t: int(
            math.floor(
                (
                    math.log2(c1[t] + 1)
                    - math.log2(n1 + vocab_size)
                    - math.log2(c0[t] + 1)
                    + math.log2(n0 + vocab_size)
                )
                * 1000
            )
        )
        for t in vocab
    }
    prior = int(math.floor((math.log2(d1 + 1) - math.log2(d0 + 1)) * 1000))
    out = []
    for i, text in score:
        s = prior + sum(weights.get(t, 0) for t in toks(text))
        out.append((i, s, s > 0))
    return out
