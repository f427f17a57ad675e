"""Text-analysis operators — all Catalyst-native (pyspark.sql.functions only,
JVM-side, whole-stage codegen; no Python in the hot path).

Each operator is also expressible in ANSI SQL so the DuckDB oracle can verify
it exactly (integer/rounded outputs avoid float-hash instability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword seeds for the n-gram/stopword lang-ID heuristic;
# deliberately small and deterministic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "la", "que", "los"],
    "pt": ["de", "que", "em", "para", "com"],
}


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (BPE-ish split on non-word boundaries is
    `word_count_bpeish`)."""
    t = F.trim(F.col(text_col))
    return df.withColumn(
        "n_tokens",
        F.when(F.length(t) == 0, F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))),
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / other-symbol runs, each
# optionally absorbing one leading space, plus whitespace runs — the GPT-2
# pre-split shape, restricted to constructs Java regex and RE2 (DuckDB)
# evaluate identically (no lookahead — RE2 has none; ASCII \s on both).
BPE_ISH_PATTERN = r" ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^A-Za-zÀ-ÿ0-9\s]+|\s+"


def with_bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token count under the BPE-ish pre-tokenizer (JVM-side regexp_count —
    no Python, no explode; at crawl scale this is a pure map column)."""
    return df.withColumn(
        "n_bpe_tokens", F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    )


def token_topk(
    df: DataFrame, k: int = 10, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Heavy hitters: the top-k most frequent whitespace tokens per language
    — the vocabulary-stats pass of a training-data pipeline.

    Shape at 10^12 rows: explode is a flat map (no shuffle); the count is a
    partial+final hash aggregate, so each executor pre-combines its token
    counts map-side before ONE shuffle keyed on (lang, token) — the shuffle
    carries at most executors × distinct-vocab rows, not corpus tokens. The
    final per-lang top-k ranks the aggregated counts (vocab-sized input,
    ties broken lexicographically for cross-engine determinism)."""
    from pyspark.sql import Window

    toks = F.split(
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")), " "
    )
    counts = (
        df.select(F.col(lang_col).alias("lang"), F.explode(toks).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("lang", F.col("rank").cast("int").alias("rank"), "token", "n")
    )


def deterministic_sample(
    df: DataFrame, threshold_hex: str = "19999999", id_col: str = "doc_id"
) -> DataFrame:
    """Reproducible uniform subsample: keep rows whose md5(id) hex digest
    sorts below ``threshold_hex`` (8 hex digits → rate = int(threshold,16)
    / 16^8; the default ≈ 0.1). Hash-based, so the SAME rows are kept on
    any cluster, any partitioning, any engine — the property a training-
    data pipeline needs for resumable/rerunnable sampling, which
    rand()-based sampling does not give. Pure map-side filter: no shuffle,
    prunes at scan when id is a partition/sort column."""
    return df.where(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < F.lit(threshold_hex)
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic integer quality score in [0, 100]:
    length component + punctuation-ratio + uppercase-ratio penalties.
    Mirrors reference-free web-text quality heuristics; exact SQL equivalent
    exists for the oracle."""
    t = F.col(text_col)
    length = F.length(t)
    n_punct = length - F.length(F.regexp_replace(t, r"[.,;:!?]", ""))
    n_upper = length - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    # floor() everywhere: integer casts of doubles round differently across
    # engines (DuckDB rounds half-even on CAST), floor is portable
    len_score = F.least(F.lit(50).cast("long"), F.floor(length / F.lit(20)))
    punct_pen = F.least(
        F.lit(25).cast("long"), F.floor(n_punct * 100 / F.greatest(length, F.lit(1)))
    )
    upper_pen = F.least(
        F.lit(25).cast("long"), F.floor(n_upper * 100 / F.greatest(length, F.lit(1)))
    )
    return df.withColumn(
        "quality", (F.lit(50) + len_score - punct_pen - upper_pen).cast("long")
    )


def filter_quality(
    df: DataFrame,
    min_quality: int = 55,
    langs: tuple = (),
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The quality-gate ENDPOINT of a training-data pipeline: keep rows at
    or above ``min_quality`` (the deterministic with_quality_score), and —
    when ``langs`` is given — only those languages. Pure map-side filter:
    both predicates are scan-pushable expressions, no shuffle, no Python."""
    d = with_quality_score(df, text_col)
    cond = F.col("quality") >= min_quality
    if langs:
        cond = cond & F.col(lang_col).isin(list(langs))
    return d.where(cond)


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit lang-ID: the language with the most stopword occurrences
    ('und' when no hits; ties resolved to the lexicographically greatest code
    — struct greatest semantics, identical in DuckDB for the oracle). Pure
    built-ins: one regexp_count per language over a lowercased copy."""
    t = F.lower(F.col(text_col))
    scores = []
    for lang in sorted(STOPWORDS):
        pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
        hits = F.regexp_count(t, F.lit(pat))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.greatest(*scores)
    return df.withColumn(
        "lang_guess",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: first 16 hex chars of md5 over the
    whitespace-normalized text (rolling-hash analogue, portable to SQL)."""
    norm = F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " ")
    return df.withColumn("fingerprint", F.substring(F.md5(norm), 1, 16))


def doc_stats(df: DataFrame) -> DataFrame:
    """Per-lang corpus stats — all-integer outputs for exact oracle parity."""
    d = with_token_count(df)
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .orderBy("lang")
    )
