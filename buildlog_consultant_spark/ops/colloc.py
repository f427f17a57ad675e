"""Collocation mining — rank adjacent word pairs by pointwise
association, the phrase-detection stage of web-text pipelines
(word2vec/fastText phrase merging; "new york" → one token before
training).

Score: for fixed corpus totals, PMI(a,b) = log(P(ab) / (P(a)·P(b))) is
a MONOTONE function of c_ab / (c_a · c_b), so the ranking needs no
logarithm (floats drift between engines). We rank by the exact integer

    assoc_ppb = (c_ab · 10^9) DIV (c_a · c_b)

with the numerator and denominator computed in decimal(38,0): at crawl
scale stopword products c_a · c_b exceed int64 (two 10^10-count words),
and a double division would round past 2^53 (the ops/quota.py::_div
argument). The result itself is ≤ 10^9 (c_ab ≤ min(c_a, c_b)), so it
casts back to long losslessly.

Counts are OCCURRENCE counts over the token stream (not doc-distinct):
c_a from one unigram hash agg, c_ab from one adjacent-bigram hash agg —
both map-side combinable, both bounded by vocab/bigram-vocab, never by
corpus rows. The two count joins are keyed on words (vocab-sized tables;
AQE broadcasts the smaller side when it fits). A ``min_count`` floor on
c_ab is applied BEFORE the joins — the standard phrase-mining noise
gate, and it shrinks the bigram table ahead of the join work.

Tokenizer: the ONE shared expression (ops/text.py::tokens_expr — NULL /
empty text yields [], never ['']); bigrams are built positionally with
the sequence guard (`F.sequence(1, 0)` DESCENDS — size<2 must
short-circuit to an empty array).

Reference scope: jelmer/buildlog-consultant has no collocation stage;
this is part of the repo's LLM-training-data surface (round brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .quota import _div
from .text import tokens_expr

_DEC = "decimal(38,0)"


def _bigrams(tokens):
    """Adjacent (a, b) struct pairs of a token array; [] when size < 2."""
    empty = F.array().cast("array<struct<a:string,b:string>>")
    idx = F.sequence(F.lit(1), F.size(tokens) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(tokens, i).alias("a"),
            F.element_at(tokens, i + 1).alias("b"),
        ),
    )
    return F.when(F.size(tokens) < 2, empty).otherwise(pairs)


def collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` adjacent word pairs by exact-integer association:
    (w1, w2, c_ab, c_a, c_b, assoc_ppb), ordered by (assoc_ppb DESC,
    w1, w2) via TakeOrderedAndProject. ``min_count`` floors c_ab."""
    toks = df.select(tokens_expr(text_col).alias("ts"))
    uni = (
        toks.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
    )
    big = (
        toks.select(F.explode(_bigrams(F.col("ts"))).alias("p"))
        .select(F.col("p.a").alias("w1"), F.col("p.b").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c_ab"))
        .where(F.col("c_ab") >= min_count)
    )
    ca = uni.select(F.col("w").alias("w1"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("w2"), F.col("c").alias("c_b"))
    num = (F.col("c_ab").cast(_DEC) * F.lit(10**9).cast(_DEC)).cast(_DEC)
    den = (F.col("c_a").cast(_DEC) * F.col("c_b").cast(_DEC)).cast(_DEC)
    return (
        big.join(ca, "w1")
        .join(cb, "w2")
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            _div(num, den).alias("assoc_ppb"),
        )
        .orderBy(F.desc("assoc_ppb"), "w1", "w2")
        .limit(k)
    )
