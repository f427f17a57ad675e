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


def _split_norm_expr(text_col: str, lower: bool):
    """The ONE split geometry both tokenizers share: trim(coalesce) →
    ASCII-\\s collapse → (optional lower) → split; empty/NULL → []."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    s = F.regexp_replace(t, r"\s+", " ")
    if lower:
        s = F.lower(s)
    words = F.split(s, " ")
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        words
    )


def tokens_expr(text_col: str = "text"):
    """THE repo whitespace tokenizer, as one shared expression:
    trim(coalesce(text, '')) → ASCII-\\s normalize → lower → split;
    empty/NULL text yields an EMPTY array (never ['']). Shared by
    with_repetition_signals, word_ngrams, and ops/spans.py — every
    Python-golden oracle is byte-pinned to exactly this expression, so
    there is deliberately a single copy (a drifting inline duplicate
    would surface as an oracle mismatch in a different query than the
    one edited)."""
    return _split_norm_expr(text_col, lower=True)


def orig_tokens_expr(text_col: str = "text"):
    """Case-preserving sibling of tokens_expr — built from the SAME
    split geometry (_split_norm_expr), just without lower(), so its
    positions align 1:1 with tokens_expr by construction: span token
    ranges computed on normalized tokens can cut original-case tokens
    (ops/spans.py::scrub_span_duplicated). Single-sourcing the geometry
    is load-bearing: a drift between the two splits would silently
    misalign cut positions (review r6 #7)."""
    return _split_norm_expr(text_col, lower=False)


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count (BPE-ish split on non-word boundaries is
    `word_count_bpeish`). NULL text coalesces to '' (dedup.py policy) —
    zero tokens, never a NULL count."""
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
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
    no Python, no explode; at crawl scale this is a pure map column).
    NULL text coalesces to '' → count 0."""
    return df.withColumn(
        "n_bpe_tokens",
        F.regexp_count(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(BPE_ISH_PATTERN)
        ),
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
    ties broken lexicographically for cross-engine determinism). NULL
    text coalesces to '' (dedup.py policy): the doc contributes one ''
    token instead of silently vanishing from the vocabulary stats."""
    from pyspark.sql import Window

    toks = F.split(
        F.lower(
            F.regexp_replace(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
            )
        ),
        " ",
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
    exists for the oracle. NULL text coalesces to '' (dedup.py policy)
    → the empty-text score of 50, never a NULL that filters silently
    drop."""
    t = F.coalesce(F.col(text_col), F.lit(""))
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
    built-ins: one regexp_count per language over a lowercased copy.
    NULL text coalesces to '' → 'und'."""
    t = F.lower(F.coalesce(F.col(text_col), F.lit("")))
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
    whitespace-normalized text (rolling-hash analogue, portable to SQL).
    NULL text coalesces to '' (dedup.py policy: NULL and empty docs are
    the same document for dedup purposes, here as there)."""
    norm = F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")
    return df.withColumn("fingerprint", F.substring(F.md5(norm), 1, 16))


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, all-integer for exact
    oracle parity: word and word-bigram duplication counts per document
    (a high duplicate-bigram fraction is the classic boilerplate /
    keyword-stuffing signal used by web-text quality filters).

    Adds: n_words, n_distinct_words, n_bigrams, n_distinct_bigrams,
    dup_word_pct, dup_bigram_pct (floor of 100×duplicated/total — floor is
    portable across engines, CAST rounds half-even in DuckDB).

    Scale shape: everything is per-row map-side (split / array_distinct /
    a size-bounded transform over the words array) — no shuffle, no
    Python; prunes to the text column at scan. The bigram transform is an
    interpreted HOF, but that is the scale-right trade here: the
    explode→agg alternative shuffles every corpus bigram, while this stays
    a linear per-row map (≈ doc length); MEASURED against a pandas-UDF
    Arrow kernel (scripts/bench_bigrams.py, BENCH/BASELINE.md round-5
    table) the HOF is at parity or up to 2× FASTER across 50–1000-word
    docs — string Arrow transfer + per-row set builds cost more than the
    interpreter here, unlike the 64-wide numeric folds that moved to
    kernels (ops/dedup.py simhash votes). NULL text coalesces to ''
    (dedup.py policy): zero-count signals, 0% dup — filter_repetitive
    KEEPS NULL-text docs instead of silently dropping them on NULL
    metrics."""
    d = df.withColumn("_w", tokens_expr(text_col))
    n_words = F.size("_w")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.element_at(F.col("_w"), i),
                              F.element_at(F.col("_w"), i + 1)),
    )
    bigrams = F.when(n_words < 2, F.array().cast("array<string>")).otherwise(bigrams)
    d = d.withColumn("_bg", bigrams)
    n_bigrams = F.size("_bg")
    out = (
        d.withColumn("n_words", n_words.cast("long"))
        .withColumn("n_distinct_words", F.size(F.array_distinct("_w")).cast("long"))
        .withColumn("n_bigrams", n_bigrams.cast("long"))
        .withColumn(
            "n_distinct_bigrams", F.size(F.array_distinct("_bg")).cast("long")
        )
        .drop("_w", "_bg")
    )
    return out.withColumn(
        "dup_word_pct",
        F.floor(
            (F.col("n_words") - F.col("n_distinct_words"))
            * 100
            / F.greatest(F.col("n_words"), F.lit(1))
        ),
    ).withColumn(
        "dup_bigram_pct",
        F.floor(
            (F.col("n_bigrams") - F.col("n_distinct_bigrams"))
            * 100
            / F.greatest(F.col("n_bigrams"), F.lit(1))
        ),
    )


def filter_repetitive(
    df: DataFrame,
    max_dup_word_pct: int = 60,
    max_dup_bigram_pct: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """The repetition-gate ENDPOINT: drop documents whose duplicate-word or
    duplicate-bigram percentage exceeds the thresholds (Gopher drops docs
    with high duplicate n-gram character fractions; this is the integer
    word-level analogue). Map-side filter on with_repetition_signals —
    no shuffle."""
    d = with_repetition_signals(df, text_col)
    return d.where(
        (F.col("dup_word_pct") <= max_dup_word_pct)
        & (F.col("dup_bigram_pct") <= max_dup_bigram_pct)
    )


def word_ngrams(
    df: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, gram) rows: all word ``n``-grams of the lowercased whitespace-
    normalized text, DISTINCT per document. explode is a flat map — no
    shuffle; the distinct is per-row map-side (array_distinct before the
    explode), so downstream joins see each (doc, gram) once. NULL text is
    coalesced to '' (the dedup.py _shingles policy): a NULL-text doc emits
    NO grams — without the coalesce, size(NULL) dodges the n_words<n guard
    and a spurious '' gram leaks out."""
    # Arrow-batched pandas UDF instead of the equivalent JVM
    # transform/slice/concat_ws HOF chain: HOF lambdas run interpreted
    # (never codegen) and CPython split/join measures ~4× faster on the
    # same corpus, bit-identically (the _shingles kernel precedent —
    # see ops/dedup.py). Geometry replicates tokens_expr + the n-gram
    # window + array_distinct's keep-first-occurrence order exactly:
    # trim(' ') → ASCII-\s collapse → lower → split(' '); empty/NULL
    # text → no tokens; < n tokens → no grams.
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def ng(s):
        out = []
        for txt in s:
            tr = (txt or "").strip(" ")
            if not tr:
                out.append([])
                continue
            toks = ws.sub(" ", tr).lower().split(" ")
            if len(toks) < n:
                out.append([])
                continue
            out.append(
                list(
                    dict.fromkeys(
                        " ".join(toks[i : i + n])
                        for i in range(len(toks) - n + 1)
                    )
                )
            )
        return pd.Series(out)

    ng.__annotations__ = {"s": pd.Series, "return": pd.Series}
    grams = pandas_udf(ng, "array<string>")(F.col(text_col))
    return df.select(F.col(id_col), F.explode(grams).alias("gram"))


def contamination_hits(
    df: DataFrame,
    benchmark_threshold_hex: str = "10000000",
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Benchmark-contamination check: which training documents share a word
    ``n``-gram with the held-out benchmark set? (The decontamination pass
    every LLM data pipeline runs — e.g. drop any training doc sharing a
    13-gram with an eval set; 8 here because the test corpus has short
    docs.)

    The benchmark set is the deterministic_sample of the corpus itself
    (md5(id) < threshold — engine-portable row selection), standing in for
    an external eval set. Returns (doc_id, lang, n_shared_grams) for
    non-benchmark docs with ≥1 shared n-gram.

    Scale shape: benchmark grams are DISTINCT n-grams of a tiny sample —
    broadcast to every executor (F.broadcast), so the contamination check
    is a map-side broadcast semi-join on the exploded grams + one hash agg
    keyed on doc_id. No shuffle of the corpus' grams."""
    bench_ids = deterministic_sample(df, benchmark_threshold_hex, id_col).select(
        id_col
    )
    bench_grams = (
        word_ngrams(df.join(bench_ids, id_col, "left_semi"), n, text_col, id_col)
        .select("gram")
        .distinct()
    )
    train = df.join(bench_ids, id_col, "left_anti")
    train_grams = word_ngrams(train, n, text_col, id_col)
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )
    return hits.join(
        df.select(id_col, F.col(lang_col).alias("lang")), id_col
    ).select(id_col, "lang", "n_shared_grams")


def decontaminate(
    df: DataFrame,
    benchmark_threshold_hex: str = "10000000",
    n: int = 8,
    min_shared_grams: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The decontamination ENDPOINT: drop every training document sharing
    at least ``min_shared_grams`` word n-grams with the benchmark set
    (contamination_hits is the audit; this is the removal a pipeline
    actually ships). Benchmark docs themselves are kept — they are the
    eval set stand-in, not training data to filter. One broadcast
    semi-join + one anti-join keyed on id; the corpus is scanned once for
    gram generation and once for the final projection."""
    hits = contamination_hits(
        df, benchmark_threshold_hex, n, text_col, id_col, lang_col
    ).where(F.col("n_shared_grams") >= min_shared_grams)
    return df.join(hits.select(id_col), id_col, "left_anti")


# PII patterns restricted to constructs Java regex and RE2 (DuckDB)
# evaluate identically: no lookaround, ASCII classes, explicit quantifiers
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_PATTERN = r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction pass: replace emails and phone numbers with typed
    placeholder tokens and count what was redacted. Adds ``n_emails``,
    ``n_phones`` (long) and ``{text_col}_scrubbed``. Pure JVM regexp —
    map-side, no shuffle, whole-stage codegen; the patterns are RE2-safe
    so the DuckDB oracle replays them byte-identically. NULL text
    coalesces to '' (dedup.py policy): zero counts and an empty scrubbed
    text, never NULL metrics."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    scrubbed = F.regexp_replace(
        F.regexp_replace(t, PII_EMAIL_PATTERN, "<EMAIL>"),
        PII_PHONE_PATTERN,
        "<PHONE>",
    )
    return (
        df.withColumn("n_emails", F.regexp_count(t, F.lit(PII_EMAIL_PATTERN)))
        .withColumn("n_phones", F.regexp_count(t, F.lit(PII_PHONE_PATTERN)))
        .withColumn(f"{text_col}_scrubbed", scrubbed)
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k keywords by an integer TF-IDF variant:
    score = tf × floor(1000 × N / df) — the idf is the plain inverse
    document frequency as a milli-ratio rather than its logarithm, because
    ln() is not guaranteed bit-identical across engines (libm differences)
    while integer arithmetic is; the RANKING this produces is the same
    monotone-in-(tf, 1/df) ordering tf-idf gives. Ties break (score desc,
    term asc) for cross-engine determinism. Returns (id, rank, term,
    score).

    Scale shape: one explode (flat map) → (doc, term, tf) partial+final
    hash agg keyed on (doc, term); the document-frequency table is a
    second agg keyed on term (vocab-sized, shuffle carries vocab not
    tokens); the stats join back is keyed on term (broadcast when the
    vocab fits, shuffle otherwise — Catalyst/AQE decides from sizes); the
    final per-doc top-k is a window over each doc's distinct terms.
    NULL text coalesces to '' (dedup.py policy) — a NULL-text doc
    contributes one '' term row instead of poisoning the aggregate."""
    from pyspark.sql import Window

    toks = F.split(
        F.lower(
            F.regexp_replace(
                F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
            )
        ),
        " ",
    )
    terms = df.select(F.col(id_col), F.explode(toks).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    # corpus size as a broadcast 1-row frame, not df.count(): keeps the
    # operator lazy (no driver action at plan-build time) and folds the
    # count into the same job as the scoring pass
    n_docs = F.broadcast(df.agg(F.count("*").alias("_n")))
    dfreq = tf.groupBy("term").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n_docs)
        .select(
            F.col(id_col),
            "term",
            (
                F.col("tf") * F.floor(F.lit(1000) * F.col("_n") / F.col("df"))
            ).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, F.col("rank").cast("int").alias("rank"), "term", "score")
    )


# single source of truth for the compressibility pass: the gate bounds and
# zlib level are shared by filter_compressible, the driver query, and the
# Python-golden oracle (a drifting literal on one side reads as an engine
# bug in the correctness gate)
COMPRESSION_LEVEL = 6
COMPRESSION_GATE_MIN_PERMILLE = 200
COMPRESSION_GATE_MAX_PERMILLE = 900


def _compression_permille_udf(level: int):
    """Arrow kernel: zlib-deflate size of the utf-8 text as permille of
    the raw size — floor(1000·len(compress(b))/len(b)); empty/NULL → 0.
    zlib at a fixed level is deterministic for a given zlib build, so a
    Python-golden oracle replays it byte-exactly on the same host."""
    import zlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def ratio(ts):
        out = []
        for s in ts.values:
            b = (s or "").encode("utf-8")
            if not b:
                out.append(0)
                continue
            out.append(len(zlib.compress(b, level)) * 1000 // len(b))
        return pd.Series(out, dtype="int64")

    ratio.__annotations__ = {"ts": pd.Series, "return": pd.Series}
    return pandas_udf(ratio, "long")


def with_compression_ratio(
    df: DataFrame, text_col: str = "text", level: int = COMPRESSION_LEVEL
) -> DataFrame:
    """Deflate-compressibility quality signal (the Gopher/CCNet-family
    heuristic): highly repetitive boilerplate compresses far below
    normal prose, random junk barely compresses at all. Adds
    ``compression_permille`` = floor(1000·deflate_bytes/raw_bytes)
    (integer — hash-stable; NULL/empty text → 0 per the repo NULL
    policy).

    Scale shape: one Arrow-batched pandas UDF per task — map-side, no
    shuffle, cost linear in bytes (zlib level 6 ≈ 100 MB/s/core; pick a
    lower level for a cheaper pass). A JVM expression can't compute
    this (no deflate in pyspark.sql.functions), so this is one of the
    legitimate Python-kernel cases alongside the vector kernels."""
    r = _compression_permille_udf(level)
    return df.withColumn("compression_permille", r(F.col(text_col)))


def filter_compressible(
    df: DataFrame,
    min_permille: int = COMPRESSION_GATE_MIN_PERMILLE,
    max_permille: int = COMPRESSION_GATE_MAX_PERMILLE,
    text_col: str = "text",
) -> DataFrame:
    """The compressibility-gate ENDPOINT: drop documents that compress
    too well (< min — boilerplate/repetition) or too poorly (> max —
    binary junk/random strings). Map-side filter over
    with_compression_ratio.

    NULL policy (uniform with filter_repetitive / filter_span_duplicated):
    NULL/empty-text docs pass through UNCONDITIONALLY — the signal is
    undefined on zero bytes (permille 0 is a sentinel, not a measurement),
    and a gate chain must not let one endpoint silently drop rows its
    siblings keep (ADVICE r5). Drop empties explicitly upstream if that
    is the intent."""
    d = with_compression_ratio(df, text_col)
    empty = F.length(F.coalesce(F.col(text_col), F.lit(""))) == 0
    return d.where(
        empty
        | (
            (F.col("compression_permille") >= min_permille)
            & (F.col("compression_permille") <= max_permille)
        )
    )


def quality_quantiles(
    df: DataFrame, ps: tuple = (25, 50, 75, 95), text_col: str = "text"
) -> DataFrame:
    """Per-lang quality-score quantiles as EXACT order statistics
    (nearest-rank: the value at rank ceil(p·n/100) under (quality, doc_id)
    order) — approx_percentile sketches differ across engines, discrete
    ranks are bit-portable, and the value at a rank is tie-order-
    independent. Returns (lang, p, quality).

    Scale shape (two-pass, histogram-based — NO per-lang corpus sort):
    pass 1 is a partial+final hash aggregate groupBy(lang, quality) — the
    only shuffle that sees corpus rows, and it carries at most
    langs × distinct-quality rows after map-side combine (quality is an
    integer in [0, 100], so ≤ 101 rows per language REGARDLESS of corpus
    size). Pass 2 runs the cumulative-count window and the nearest-rank
    filter over that tiny histogram. The previous formulation ranked every
    corpus row with row_number over a per-lang window — five languages
    meant five tasks each sorting 20% of the corpus, the classic
    single-task scale-killer; the histogram value at the nearest rank is
    identical (the value at a rank is tie-order-independent). For an
    UNBOUNDED value domain the same shape holds as long as the per-key
    distinct-value count fits an executor (else range-partition the
    domain first); quality's domain is bounded by construction."""
    from pyspark.sql import Window

    d = with_quality_score(df, text_col)
    hist = d.groupBy("lang", "quality").agg(F.count("*").alias("cnt"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "quality",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_n).alias("n"),
    )
    return (
        cum.select(
            "lang",
            "quality",
            "cnt",
            "cum",
            "n",
            F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
        )
        # nearest-rank index r = ceil(p*n/100) in pure integer arithmetic
        # (integral DIV — a double floor((p*n+99)/100) rounds across the
        # boundary near 2^53, same fix as ops/robust.py); the quantile
        # value is the histogram bin whose cumulative range
        # [cum-cnt+1, cum] contains r
        .where(
            (F.col("cum") >= F.expr("CAST((p * n + 99) DIV 100 AS LONG)"))
            & (
                F.col("cum") - F.col("cnt")
                < F.expr("CAST((p * n + 99) DIV 100 AS LONG)")
            )
        )
        .select("lang", F.col("p").cast("int").alias("p"), "quality")
    )


def quality_auto_threshold(
    df: DataFrame, p: int = 25, text_col: str = "text"
) -> DataFrame:
    """(lang, threshold): the per-lang nearest-rank p-th percentile
    quality score — `quality_quantiles`' histogram two-pass at a single
    p (same exact order-statistic contract, same scale shape: the only
    corpus-touching operator is the ≤101-bins-per-lang histogram agg)."""
    return quality_quantiles(df, ps=(p,), text_col=text_col).select(
        "lang", F.col("quality").alias("threshold")
    )


def filter_quality_auto(
    df: DataFrame, p: int = 25, text_col: str = "text"
) -> DataFrame:
    """AUTO-TUNED quality gate — the thresholding real pipelines run
    ("drop the worst quartile per language") instead of a hand-picked
    constant: keep docs whose quality ≥ their lang's p-th percentile.
    By nearest-rank construction the kept fraction per lang is ≥
    (100−p)% (ties at the threshold keep everything equal to it).

    The threshold table is langs-sized → broadcast join (null-safe:
    NULL lang is its own percentile group, mirroring the groupBy);
    corpus rows are touched by the histogram agg and the final filter
    scan only. Returns the kept rows with `quality` attached."""
    d = with_quality_score(df, text_col)
    thr = quality_auto_threshold(df, p, text_col).select(
        F.col("lang").alias("_tl"), "threshold"
    )
    # inner, not left: every lang in df (incl. NULL) produced a
    # threshold row, and a left join's unmatched rows would be dropped
    # by the >= filter anyway — inner states the actual contract
    return (
        d.join(F.broadcast(thr), F.col("lang").eqNullSafe(F.col("_tl")), "inner")
        .where(F.col("quality") >= F.col("threshold"))
        .drop("_tl", "threshold")
    )


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


# unigram LM quality scoring: vocab size is deliberately small — the map
# literal ships inside the plan (2V expressions); a privately-trained
# KenLM-style model would broadcast a real table instead, same shape
UNIGRAM_VOCAB_SIZE = 128


def unigram_vocab_costs(
    df: DataFrame, vocab_size: int = UNIGRAM_VOCAB_SIZE, text_col: str = "text"
) -> tuple[dict, int]:
    """Corpus unigram model → integer per-token costs, the CCNet-style
    LM-quality stage with the LM replaced by the corpus's own unigram
    distribution (no pretrained model ships in this container; the SHAPE
    — train once, broadcast, score map-side — is the production one).

    Returns ``(costs, oov_cost)``: ``costs[token] = floor(-log2(c/total)
    · 1000)`` in MILLI-BITS for the ``vocab_size`` most frequent tokens
    (ties broken by token asc — engine-portable), and the out-of-vocab
    cost ``floor(log2(total) · 1000)`` (probability 1/total). The float
    log runs ONCE PER VOCAB TOKEN on the driver (and identically in the
    Python-golden oracle); everything per-document is integer arithmetic,
    so scores are hash-stable.

    Scale shape: one explode + hash agg with map-side combine (shuffle
    bounded by DISTINCT tokens, not corpus tokens), one
    TakeOrderedAndProject for the top-V, one tiny sum — then scoring is
    pure map-side."""
    import math

    toks = tokens_expr(text_col)
    counts = (
        df.select(F.explode(toks).alias("t")).groupBy("t").agg(F.count("*").alias("c"))
    ).persist()  # two actions (total + top-V) share ONE corpus scan/shuffle
    try:
        total = counts.agg(F.sum("c")).collect()[0][0] or 0
        if total == 0:
            return {}, 0
        top = counts.orderBy(F.desc("c"), F.asc("t")).limit(vocab_size).collect()
    finally:
        counts.unpersist()
    costs = {
        r["t"]: int(math.floor((math.log2(total) - math.log2(r["c"])) * 1000))
        for r in top
    }
    return costs, int(math.floor(math.log2(total) * 1000))


def with_unigram_logloss(
    df: DataFrame, costs: dict, oov_cost: int, text_col: str = "text"
) -> DataFrame:
    """Adds ``unigram_milli_bits`` — the mean per-token cost in
    milli-bits, floor-divided (integer): high = surprising text (random
    junk), low = boilerplate of corpus-dominant tokens; the standard
    LM-quality gate ranks docs by exactly this. NULL/empty text (no
    tokens) → NULL score (kept; gate separately per the repo NULL
    policy). Pure map-side: vocab map literal + interpreted fold, no
    shuffle; swap in a dict-lookup pandas UDF when V grows past plan-size
    comfort."""
    toks = tokens_expr(text_col)
    if costs:
        pairs = []
        for t, c in sorted(costs.items()):
            pairs.extend([F.lit(t), F.lit(int(c))])
        m = F.create_map(*pairs)
        cost_of = lambda t: F.coalesce(  # noqa: E731
            F.element_at(m, t), F.lit(int(oov_cost))
        ).cast("long")
    else:
        cost_of = lambda t: F.lit(int(oov_cost)).cast("long")  # noqa: E731
    total_cost = F.aggregate(
        F.transform(toks, cost_of), F.lit(0).cast("long"), lambda a, x: a + x
    )
    # integral DIV, not floor(double /): the double quotient can round
    # across the floor boundary once total_cost approaches 2^53 — the
    # same fix robust.py applies (repo DIV convention); the Python
    # replay uses exact //.
    return (
        df.withColumn("_ug_tc", total_cost.cast("long"))
        .withColumn("_ug_n", F.size(toks).cast("long"))
        .withColumn(
            "unigram_milli_bits",
            F.when(F.col("_ug_n") > 0, F.expr("_ug_tc DIV _ug_n")).cast(
                "long"
            ),
        )
        .drop("_ug_tc", "_ug_n")
    )


def py_unigram_logloss(
    docs: list, vocab_size: int = UNIGRAM_VOCAB_SIZE
) -> list:
    """Python replay for oracle construction: ``docs`` is a list of
    (id, text); returns (id, unigram_milli_bits|None) — same tokenizer,
    same vocab selection (count desc, token asc), same driver-side float
    log, same integer per-doc arithmetic."""
    import math
    import re
    from collections import Counter

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def toks(text):
        t = (text or "").strip(" ")
        return ws.sub(" ", t).lower().split(" ") if t else []

    counts: Counter = Counter()
    for _i, text in docs:
        counts.update(toks(text))
    total = sum(counts.values())
    if total == 0:
        return [(i, None) for i, _ in docs]
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    costs = {
        t: int(math.floor((math.log2(total) - math.log2(c)) * 1000))
        for t, c in top
    }
    oov = int(math.floor(math.log2(total) * 1000))
    out = []
    for i, text in docs:
        ts = toks(text)
        if not ts:
            out.append((i, None))
            continue
        out.append((i, sum(costs.get(t, oov) for t in ts) // len(ts)))
    return out


def gopher_quality_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher rule-set quality signals (Rae et al. 2021, §A1.1 —
    the published heuristic battery behind MassiveText and most later
    web-text pipelines), computed as EXACT integers so a plain SQL
    oracle replays them bit-for-bit:

    - n_words                whitespace tokens (tokens_expr geometry)
    - mean_word_len_milli    floor(1000·Σlen(word)/n_words) — closed
                             form: Σlen = len(ws-collapsed text) −
                             (n_words−1), no per-word fold needed
    - alpha_word_ppm         floor(1e6·|words containing [A-Za-z]|/n_words)
    - symbol_ppm             floor(1e6·(#'#' + #'…')/n_words)
    - bullet_line_ppm        floor(1e6·|lines starting '-','*','•'|/n_lines)
    - ellipsis_line_ppm      floor(1e6·|lines ending '...' or '…'|/n_lines)
    - stop_hits              how many of 8 fixed English stop words occur
    - gopher_keep            the conjunction of the published thresholds
                             (50 ≤ words ≤ 100k, 3 ≤ mean len ≤ 10,
                             ≥80% alpha words, ≤10% symbols, ≤90% bullet
                             lines, ≤30% ellipsis lines, ≥2 stop words)

    Scale shape: pure per-row map-side expressions — no shuffle, no
    Python, prunes to the text column at scan; line/word predicates are
    interpreted HOF filters (linear in doc length — the
    repetition-signals trade, measured there). Engine parity notes:
    floor() not CAST (DuckDB rounds half-even), lines split on literal
    \\n, line trim is ASCII-space rtrim/ltrim on both sides, stop-word
    hits are 8 explicit array_contains terms (list_intersect dedup
    semantics differ between engines). NULL text coalesces to '' →
    n_words 0, ratio columns NULL, gopher_keep FALSE (the n_words≥50
    conjunct fails before any NULL reaches the AND — three-valued
    logic never surfaces)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    d = df.withColumn("_w", tokens_expr(text_col))
    n_words = F.size("_w")
    norm = F.regexp_replace(F.trim(t), r"\s+", " ")
    sum_chars = F.length(norm) - (n_words - 1)
    alpha_words = F.size(
        F.filter(F.col("_w"), lambda w: w.rlike("[A-Za-z]"))
    )
    n_sym = (
        F.length(t)
        - F.length(F.regexp_replace(t, r"#", ""))
        + (F.length(t) - F.length(F.regexp_replace(t, r"…", "")))
    )
    lines = F.split(t, r"\n")
    n_lines = F.size(lines)
    bullet = F.size(
        F.filter(
            lines,
            lambda l: F.substring(F.ltrim(l), 1, 1).isin("-", "*", "•"),
        )
    )
    ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.endswith(F.rtrim(l), F.lit("..."))
            | F.endswith(F.rtrim(l), F.lit("…")),
        )
    )
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    stop_hits = sum(
        (F.array_contains("_w", s).cast("long") for s in stops),
        F.lit(0).cast("long"),
    )

    def ppm(num, den):
        return F.when(den > 0, F.floor(num * F.lit(1_000_000) / den)).cast(
            "long"
        )

    mean_milli = F.when(
        n_words > 0, F.floor(sum_chars * F.lit(1000) / n_words)
    ).cast("long")
    d = (
        d.withColumn("n_words", n_words.cast("long"))
        .withColumn("mean_word_len_milli", mean_milli)
        .withColumn("alpha_word_ppm", ppm(alpha_words, n_words))
        .withColumn("symbol_ppm", ppm(n_sym, n_words))
        .withColumn("bullet_line_ppm", ppm(bullet, n_lines))
        .withColumn("ellipsis_line_ppm", ppm(ellipsis, n_lines))
        .withColumn("stop_hits", stop_hits)
    )
    keep = (
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100_000)
        & (F.col("mean_word_len_milli") >= 3000)
        & (F.col("mean_word_len_milli") <= 10_000)
        & (F.col("alpha_word_ppm") >= 800_000)
        & (F.col("symbol_ppm") <= 100_000)
        & (F.col("bullet_line_ppm") <= 900_000)
        & (F.col("ellipsis_line_ppm") <= 300_000)
        & (F.col("stop_hits") >= 2)
    )
    return d.withColumn(
        "gopher_keep", F.coalesce(keep, F.lit(False))
    ).drop("_w")


def script_char_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Script detection features — per-doc counts of characters in five
    explicit Unicode script ranges plus the dominant-script label (the
    char-class stage of a language-ID pipeline; fastText/CLD-style
    systems gate on script before any token model).

    Counts are the regexp-strip length trick (len(t) − len(t with the
    class removed)) — pure map-side JVM, no shuffle. Ranges are BMP-only
    by contract (Latin/digit/Cyrillic/CJK-unified/Arabic/Greek), so
    Spark's UTF-16 length and DuckDB's code-point len agree; astral
    scripts would need a code-point-true counter. Dominant label is a
    chained >= CASE, fixed priority (latin > cyrillic > cjk > arabic >
    greek) breaking ties deterministically; a doc with zero script
    chars labels 'latin' by the same rule (count 0 ties all, priority
    wins) — documented, not special-cased. NULL text → all zero."""
    t = F.coalesce(F.col(text_col), F.lit(""))

    def cnt(cls: str):
        return (F.length(t) - F.length(F.regexp_replace(t, cls, ""))).cast(
            "long"
        )

    d = (
        df.withColumn("n_latin", cnt("[A-Za-z]"))
        .withColumn("n_digit", cnt("[0-9]"))
        .withColumn("n_cyrillic", cnt("[Ѐ-ӿ]"))
        .withColumn("n_cjk", cnt("[一-鿿]"))
        .withColumn("n_arabic", cnt("[؀-ۿ]"))
        .withColumn("n_greek", cnt("[Ͱ-Ͽ]"))
        .withColumn("n_chars_total", F.length(t).cast("long"))
    )
    order = ("latin", "cyrillic", "cjk", "arabic", "greek")
    cols = {
        "latin": "n_latin",
        "cyrillic": "n_cyrillic",
        "cjk": "n_cjk",
        "arabic": "n_arabic",
        "greek": "n_greek",
    }
    expr = None
    for name in order:
        cond = None
        for other in order:
            if other == name:
                continue
            c = F.col(cols[name]) >= F.col(cols[other])
            cond = c if cond is None else (cond & c)
        expr = (
            F.when(cond, name) if expr is None else expr.when(cond, name)
        )
    return d.withColumn("dominant_script", expr.otherwise(order[-1]))


def with_nfc_normalized(
    df: DataFrame, text_col: str = "text", out_col: str = "text_nfc"
) -> DataFrame:
    """Unicode NFC normalization — the canonicalization stage every
    multilingual pipeline runs before hashing/dedup (decomposed
    e + U+0301 and precomposed é must dedup together). Spark has no
    normalization builtin, so this is the honest Arrow-batched
    pandas-UDF slow path (stdlib unicodedata — no per-row Python rows,
    one vectorized map per batch); DuckDB's nfc_normalize is the
    oracle's exact counterpart (verified char-identical on composed /
    decomposed / ligature inputs — NFC composes, never folds
    compatibility forms). NULL text stays NULL."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def norm(s):
        import unicodedata

        return s.map(
            lambda t: None
            if t is None
            else unicodedata.normalize("NFC", t)
        )

    # `from __future__ import annotations` breaks pandas_udf hint
    # introspection — set the annotations explicitly (round-3 note)
    norm.__annotations__ = {"s": pd.Series, "return": pd.Series}
    fn = pandas_udf(norm, "string")
    return df.withColumn(out_col, fn(F.col(text_col)))


# Mojibake / encoding-damage detection (map-side). Three exact,
# regex-countable artifacts of real crawl corpora:
#   * U+FFFD REPLACEMENT CHARACTER — a decoder already gave up;
#   * C1 controls U+0080-U+009F — bytes that decode to nothing
#     printable in any sane text, the classic cp1252-as-latin1 tell;
#   * the double-encoded UTF-8 signature [U+00C2 U+00C3][U+00A0-U+00FF]
#     — UTF-8 lead bytes 0xC2/0xC3 re-decoded as Latin-1 ('e-acute'
#     becomes 'A-tilde copyright-sign').
# Patterns are literal BMP character classes — valid and identical in
# Java regex (Spark) and RE2 (DuckDB); counts are non-overlapping
# left-to-right matches in both. NULL text counts as clean (coalesce
# to '' — signals are 0, is_mojibake false), mirroring the signal ops'
# NULL policy rather than the filters' passthrough.
MOJIBAKE_REPLACEMENT_RE = "\ufffd"
MOJIBAKE_C1_RE = "[\u0080-\u009f]"
MOJIBAKE_DOUBLE_UTF8_RE = "[\u00c2\u00c3][\u00a0-\u00ff]"


def with_mojibake_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds n_replacement / n_c1 / n_double_utf8 / is_mojibake — one
    map-side projection, no shuffle, no Python in the row path."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_rep = F.regexp_count(t, F.lit(MOJIBAKE_REPLACEMENT_RE)).cast("long")
    n_c1 = F.regexp_count(t, F.lit(MOJIBAKE_C1_RE)).cast("long")
    n_dbl = F.regexp_count(t, F.lit(MOJIBAKE_DOUBLE_UTF8_RE)).cast("long")
    return (
        df.withColumn("n_replacement", n_rep)
        .withColumn("n_c1", n_c1)
        .withColumn("n_double_utf8", n_dbl)
        .withColumn(
            "is_mojibake",
            (F.col("n_replacement") + F.col("n_c1") + F.col("n_double_utf8"))
            > 0,
        )
    )
