"""Duplicated-substring COVERAGE spans — the removal geometry of the
ExactSubstr pass in "Deduplicating Training Data Makes Language Models
Better" (Lee et al., 2022). Verbatim repetition at this granularity is
what the near-dup family (minhash / simhash — whole-document similarity)
cannot see: two long documents sharing one lifted paragraph.

Semantics (stated precisely — the two directions differ): every token
inside an emitted span is covered by some length-L gram that occurs ≥ 2
times corpus-wide, and the spans are the MAXIMAL such contiguous
regions. That is the union of duplicated ≥L substrings — exactly the
region the ExactSubstr *removal* step cuts — NOT a claim that each
merged span occurs twice as a whole: a run whose sub-grams match in
*different* places merges into one region that may itself be unique
(e.g. 'x A y' where 'x A' matches one doc and 'A y' another). Consumers
wanting whole-span duplication should post-verify candidate spans; the
coverage view is the one dedup pipelines act on.

The reference implementation builds a corpus suffix array; here

  1. per doc, emit every L-token gram WITH its position — a flat map,
     no shuffle (word_ngrams-style sequence/transform over the token
     array, NULL text → no grams per the repo policy);
  2. ONE hash-agg shuffle keyed on the gram finds grams occurring ≥ 2
     times corpus-wide (map-side combine bounds the shuffle by distinct
     grams; the gram STRING is the key — exact, no hash collisions; at
     10^12 tokens swap in a 128-bit gram hash to shrink shuffle bytes);
  3. positions of duplicated grams join back (broadcast when the
     duplicated-gram set is small — Catalyst/AQE decides) and
     consecutive positions merge into MAXIMAL spans per doc via the
     sessionization pattern: lag/cumsum windows partitioned by doc_id,
     each window partition bounded by one document's token count —
     never a corpus-wide sort.

Returns one row per maximal duplicated span. An off-Spark oracle replays
steps 1-3 in plain Python (gram counting + run merging) — exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    # the ONE shared tokenizer — see text.py::tokens_expr's pinning note
    from .text import tokens_expr

    return tokens_expr(text_col)


def gram_positions(
    df: DataFrame, min_len: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, pos, gram): every length-``min_len`` token gram with its
    0-based token position. Map-side only."""
    words = _tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(words) - (min_len - 1), F.lit(0))),
        lambda i: F.struct(
            (i - 1).alias("pos"),
            F.concat_ws(" ", F.slice(words, i, min_len)).alias("gram"),
        ),
    )
    grams = F.when(
        F.size(words) < min_len, F.array().cast("array<struct<pos:int,gram:string>>")
    ).otherwise(grams)
    return df.select(
        F.col(id_col), F.explode(grams).alias("g")
    ).select(id_col, F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))


def duplicated_spans(
    df: DataFrame, min_len: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Maximal duplicated-COVERAGE spans: (id, span_start, span_end,
    n_tokens) for every maximal run of positions whose L-grams occur ≥ 2
    times corpus-wide (see module doc for the precise union-of-duplicated-
    substrings semantics); n_tokens = span_end - span_start + 1 ≥ min_len.
    span_end is the index of the span's LAST token (inclusive). Two spans
    of one doc can OVERLAP in tokens when their position runs are
    separated by a gap of 2..min_len-1 (filter_span_duplicated unions
    them before computing coverage). Precondition: ``id_col`` uniquely
    identifies rows — duplicate ids would interleave two documents'
    position runs in one window partition."""
    gp = gram_positions(df, min_len, text_col, id_col)
    dup_grams = (
        gp.groupBy("gram").agg(F.count("*").alias("_n")).where(F.col("_n") > 1)
        .select("gram")
    )
    hits = gp.join(dup_grams, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn(
        "_new", (F.col("pos") - F.lag("pos", 1, -2).over(w) != 1).cast("int")
    ).withColumn(
        "_run",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        runs.groupBy(id_col, "_run")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + (min_len - 1)).alias("span_end"),
        )
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_tokens"),
        )
    )


def filter_span_duplicated(
    df: DataFrame,
    max_dup_permille: int = 500,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The span-dedup ENDPOINT: drop documents whose duplicated-COVERAGE
    tokens exceed ``max_dup_permille``/1000 of their token count (Lee et
    al. remove the duplicated substrings themselves; at pipeline level
    the common deployment drops the documents that are mostly lifted
    text). Docs with no duplicated spans (or no tokens) are kept; rows
    with a NULL id pass through unconditionally (repo NULL policy — a
    NULL key can't join its span evidence back).

    Coverage is the UNION of span tokens, not the sum: adjacent spans
    overlap when their position runs sit 2..min_len-1 apart, and a naive
    sum double-counts the shared tokens (it can exceed 1000‰). The union
    subtracts each span's overlap with its predecessor via a lag window
    over the per-doc SPANS (runs-count rows, not corpus rows)."""
    spans = duplicated_spans(df, min_len, text_col, id_col)
    w = Window.partitionBy(id_col).orderBy("span_start")
    overlap = F.greatest(
        F.lit(0), F.lag("span_end", 1, -1).over(w) + 1 - F.col("span_start")
    )
    dup_tokens = (
        spans.withColumn("_covered", F.col("n_tokens") - overlap)
        .groupBy(id_col)
        .agg(F.sum("_covered").alias("_dup_tokens"))
    )
    n_tokens = F.size(_tokens(text_col))
    scored = df.withColumn("_n_tokens", n_tokens)
    passthrough = scored.where(F.col(id_col).isNull())
    kept = (
        scored.where(F.col(id_col).isNotNull())
        .join(dup_tokens, id_col, "left")
        .where(
            F.coalesce(F.col("_dup_tokens"), F.lit(0)) * 1000
            <= F.lit(max_dup_permille) * F.greatest(F.col("_n_tokens"), F.lit(1))
        )
        .drop("_dup_tokens")
    )
    return kept.unionByName(passthrough).drop("_n_tokens")


def py_duplicated_spans(
    docs: list, min_len: int = 8
) -> list:
    """Python replay for oracle construction: ``docs`` is a list of
    (id, text) with UNIQUE ids (the operator's precondition); returns
    sorted (id, span_start, span_end, n_tokens) tuples — same tokenizer
    (ASCII-\\s normalize, lower, NULL→''), same gram counting, same
    maximal-run merge. NULL ids sort first (mirrors Spark nulls-first)."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    tok: dict = {}
    counts: dict = {}
    for doc_id, text in docs:
        t = (text or "").strip(" ")
        words = ws.sub(" ", t).lower().split(" ") if t else []
        tok[doc_id] = words
        for i in range(max(len(words) - min_len + 1, 0)):
            g = " ".join(words[i : i + min_len])
            counts[g] = counts.get(g, 0) + 1
    out = []
    for doc_id, words in tok.items():
        dup_pos = [
            i
            for i in range(max(len(words) - min_len + 1, 0))
            if counts[" ".join(words[i : i + min_len])] > 1
        ]
        run_start = None
        prev = None
        for p in dup_pos + [None]:
            if p is not None and prev is not None and p == prev + 1:
                prev = p
                continue
            if run_start is not None:
                end = prev + min_len - 1
                out.append((doc_id, run_start, end, end - run_start + 1))
            run_start, prev = p, p
    return sorted(out, key=lambda r: (r[0] is not None, r[0] if r[0] is not None else 0, r[1:]))
