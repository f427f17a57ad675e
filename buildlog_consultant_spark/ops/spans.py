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
     grams). The shuffle KEY defaults to a 128-bit xxhash64-pair of the
     gram — 16 bytes/key instead of ~8 words of text, the crawl-scale
     shape (collision odds ~n²/2^129; see _gram_key_col) — with
     ``gram_key="string"`` as the exact oracle-reference path, pinned
     equivalent by test;
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


def gram_positions(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_doc_tokens: bool = False,
) -> DataFrame:
    """(id, pos, gram[, doc_tokens]): every length-``min_len`` token gram
    with its 0-based token position. Map-side only. With
    ``with_doc_tokens`` each row also carries the document's total token
    count — computed on THIS scan, so downstream consumers (the span-dedup
    endpoint's coverage gate) never re-tokenize the corpus on a second
    scan."""
    # Arrow-batched kernel instead of the JVM transform/slice/concat_ws
    # HOF + explode: HOF lambdas run interpreted (never codegen) and the
    # gram build was the most expensive expression of the span plan
    # (~4.5 s per pass at 50k docs vs ~1 s in CPython split/join — the
    # _shingles/word_ngrams kernel precedent, bit-identical geometry).
    # mapInArrow (not pandas) so the id column is carried by pyarrow
    # `take` — its exact type survives, including nullable int64 ids
    # that a pandas round-trip would widen to float64.
    import re

    import pyarrow as pa

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    id_t = df.schema[id_col].dataType.simpleString()
    names = [id_col, "pos", "gram"] + (["doc_tokens"] if with_doc_tokens else [])
    schema = f"{id_col} {id_t}, pos int, gram string" + (
        ", doc_tokens int" if with_doc_tokens else ""
    )

    def gp(batches):
        for b in batches:
            texts = b.column(1).to_pylist()
            idxs, poss, grams, dts = [], [], [], []
            for ri, txt in enumerate(texts):
                tr = (txt or "").strip(" ")
                toks = ws.sub(" ", tr).lower().split(" ") if tr else []
                nt = len(toks)
                if nt < min_len:
                    continue
                for i in range(nt - min_len + 1):
                    idxs.append(ri)
                    poss.append(i)
                    grams.append(" ".join(toks[i : i + min_len]))
                    if with_doc_tokens:
                        dts.append(nt)
            arrays = [
                b.column(0).take(pa.array(idxs, type=pa.int32())),
                pa.array(poss, type=pa.int32()),
                pa.array(grams, type=pa.string()),
            ] + ([pa.array(dts, type=pa.int32())] if with_doc_tokens else [])
            yield pa.RecordBatch.from_arrays(arrays, names)

    return df.select(F.col(id_col), F.col(text_col)).mapInArrow(gp, schema)


def _gram_key_col(gram_key: str):
    """The corpus-wide aggregation key for a gram row.

    ``"string"`` keys on the raw L-token gram — exact, zero collision
    risk, the oracle-reference path. ``"hash128"`` keys on a 128-bit
    composite of two independent xxhash64 values (the second chained
    through a distinct LONG seed lane — Spark chains multi-arg xxhash64
    as hash(argN, seed=hash(..)), so the pair is two different functions
    of the gram): 16 bytes per key instead of ~8 words of text, cutting
    the one corpus-wide shuffle's bytes roughly an order of magnitude at
    crawl scale. Collision math: P(any collision among n distinct grams)
    ≈ n²/2^129 — at n = 10^12 grams that is ~4e-15, far below any
    hardware error rate; a collision could only MERGE two span regions,
    never lose one. Equivalence string-vs-hash128 is pinned by test on
    the fixture corpus."""
    if gram_key == "string":
        return F.col("gram")
    if gram_key == "hash128":
        return F.struct(
            F.xxhash64(F.col("gram")).alias("h1"),
            F.xxhash64(F.lit(1).cast("long"), F.col("gram")).alias("h2"),
        )
    raise ValueError(f"gram_key must be 'string' or 'hash128', got {gram_key!r}")


def duplicated_spans(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_key: str = "hash128",
    with_doc_tokens: bool = False,
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
    position runs in one window partition.

    ``gram_key`` picks the corpus-wide shuffle key (see _gram_key_col):
    default ``"hash128"`` — 16 bytes/key, the crawl-scale shape;
    ``"string"`` is the exact oracle-reference path, test-pinned
    equivalent. ``with_doc_tokens`` adds a ``doc_tokens`` column (the
    document's total token count, carried out of the SAME scan that
    produced the grams — see gram_positions)."""
    gp = gram_positions(df, min_len, text_col, id_col, with_doc_tokens)
    gp = gp.withColumn("_gk", _gram_key_col(gram_key)).drop("gram")
    # The keyed gram-position index feeds TWO branches (the corpus-wide
    # duplicate count and the join-back of hit positions); without
    # materialization each branch re-runs the gram build — an
    # interpreted HOF costing ~1.5 ms/doc, the most expensive part of
    # the whole plan. localCheckpoint trades one corpus-token-scale
    # materialization (the same rows the shuffle carries anyway: id,
    # pos, 16-byte key) for the second build; lineage truncation makes
    # a lost block loud instead of silently recomputing.
    gp = gp.localCheckpoint(eager=True)
    dup_grams = (
        gp.groupBy("_gk").agg(F.count("*").alias("_n")).where(F.col("_n") > 1)
        .select("_gk")
    )
    hit_cols = [id_col, "pos"] + (["doc_tokens"] if with_doc_tokens else [])
    hits = gp.join(dup_grams, "_gk").select(*hit_cols)
    w = Window.partitionBy(id_col).orderBy("pos")
    runs = hits.withColumn(
        "_new", (F.col("pos") - F.lag("pos", 1, -2).over(w) != 1).cast("int")
    ).withColumn(
        "_run",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    aggs = [
        F.min("pos").alias("span_start"),
        (F.max("pos") + (min_len - 1)).alias("span_end"),
    ] + ([F.first("doc_tokens").alias("doc_tokens")] if with_doc_tokens else [])
    return (
        runs.groupBy(id_col, "_run")
        .agg(*aggs)
        .select(
            id_col,
            F.col("span_start").cast("int").alias("span_start"),
            F.col("span_end").cast("int").alias("span_end"),
            (F.col("span_end") - F.col("span_start") + 1)
            .cast("int")
            .alias("n_tokens"),
            *([F.col("doc_tokens").cast("int").alias("doc_tokens")]
              if with_doc_tokens else []),
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
    over the per-doc SPANS (runs-count rows, not corpus rows).

    Single-tokenize shape: the document token count rides OUT of the gram
    subtree (``with_doc_tokens`` — computed on the same scan that emitted
    the grams), so the output branch never re-tokenizes the corpus; docs
    with no duplicated spans need no count at all (0 covered tokens pass
    any gate). The documents relation is still scanned once for the
    output rows — inherent to a join-back endpoint — but that scan
    projects only the original columns."""
    spans = duplicated_spans(
        df, min_len, text_col, id_col, with_doc_tokens=True
    )
    w = Window.partitionBy(id_col).orderBy("span_start")
    overlap = F.greatest(
        F.lit(0), F.lag("span_end", 1, -1).over(w) + 1 - F.col("span_start")
    )
    dup_tokens = (
        spans.withColumn("_covered", F.col("n_tokens") - overlap)
        .groupBy(id_col)
        .agg(
            F.sum("_covered").alias("_dup_tokens"),
            F.first("doc_tokens").alias("_n_tokens"),
        )
    )
    passthrough = df.where(F.col(id_col).isNull())
    kept = (
        df.where(F.col(id_col).isNotNull())
        .join(dup_tokens, id_col, "left")
        .where(
            F.coalesce(F.col("_dup_tokens"), F.lit(0)) * 1000
            <= F.lit(max_dup_permille)
            * F.greatest(F.coalesce(F.col("_n_tokens"), F.lit(0)), F.lit(1))
        )
        .drop("_dup_tokens", "_n_tokens")
    )
    return kept.unionByName(passthrough)


def scrub_span_duplicated(
    df: DataFrame,
    min_len: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_key: str = "hash128",
) -> DataFrame:
    """The ExactSubstr REMOVAL endpoint (Lee et al. 2022, the step their
    pipeline applies after finding duplicated substrings): cut every
    duplicated-COVERAGE span out of the document text. Adds two columns:

      * ``text_scrubbed`` — the document with covered tokens removed;
      * ``n_tokens_removed`` — how many token positions were cut.

    Removal geometry: spans are TOKEN ranges in the normalized token
    sequence, so the scrubbed text is rebuilt as the single-space join of
    the surviving ORIGINAL-CASE tokens (the original split on ASCII
    whitespace aligns 1:1 with the normalized tokens — lowering and
    whitespace-collapse never change token count). Only documents that
    actually lose tokens get whitespace-normalized; untouched documents
    keep their text byte-identical. Exact original-byte-range surgery
    would need char offsets the tokenizer doesn't keep — the token-join
    form is deterministic and replayable off-Spark, which is what the
    oracle gate needs.

    NULL policy (uniform with filter_span_duplicated): NULL text →
    NULL ``text_scrubbed`` (no grams, nothing to cut); NULL-id rows pass
    through untouched (their span evidence can't join back); docs with
    no duplicated spans are byte-identical.

    Shuffle shape: duplicated_spans' bounded plan + ONE per-doc
    collect_list of spans (≤ doc_tokens/2 structs — same bound as the
    run-merge window) + a join back to the documents relation. The
    per-token containment test is an exists() over that bounded span
    array — O(tokens × spans) per doc, both bounded by doc length."""
    from .text import orig_tokens_expr

    spans = duplicated_spans(df, min_len, text_col, id_col, gram_key=gram_key)
    span_lists = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    # the case-preserving sibling of tokens_expr — SAME split geometry by
    # construction (single-sourced in text.py), so positions align 1:1
    orig_words = orig_tokens_expr(text_col)
    passthrough = (
        df.where(F.col(id_col).isNull())
        .withColumn("text_scrubbed", F.col(text_col))
        .withColumn("n_tokens_removed", F.lit(0).cast("int"))
    )
    joined = (
        df.where(F.col(id_col).isNotNull())
        .join(span_lists, id_col, "left")
        .withColumn("_ow", orig_words)
    )
    kept_words = F.filter(
        F.col("_ow"),
        lambda tok, i: ~F.exists(
            F.col("_spans"),
            lambda s: (s["span_start"] <= i) & (i <= s["span_end"]),
        ),
    )
    scrubbed = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("_spans").isNull(), F.col(text_col))
        .otherwise(F.concat_ws(" ", kept_words))
    )
    n_removed = (
        F.when(F.col("_spans").isNull() | F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.col("_ow")) - F.size(kept_words))
        .cast("int")
    )
    scrubbed_rows = (
        joined.withColumn("text_scrubbed", scrubbed)
        .withColumn("n_tokens_removed", n_removed)
        .drop("_spans", "_ow")
    )
    return scrubbed_rows.unionByName(passthrough)


def py_scrub_spans(docs: list, min_len: int = 8) -> list:
    """Python replay of scrub_span_duplicated for oracle construction:
    ``docs`` is a list of (id, text) with unique ids; returns
    (id, text_scrubbed, n_tokens_removed) per input row — same span
    geometry as py_duplicated_spans, same original-case token split,
    same single-space join. NULL text → (id, None, 0); NULL id →
    untouched passthrough."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    by_doc: dict = {}
    for doc_id, s, e, _n in py_duplicated_spans(docs, min_len):
        by_doc.setdefault(doc_id, []).append((s, e))
    out = []
    for doc_id, text in docs:
        if text is None:
            out.append((doc_id, None, 0))
            continue
        sp = by_doc.get(doc_id) if doc_id is not None else None
        if not sp:
            out.append((doc_id, text, 0))
            continue
        t = text.strip(" ")
        words = ws.sub(" ", t).split(" ") if t else []
        covered: set = set()
        for s, e in sp:
            covered.update(range(s, e + 1))
        kept = [w for i, w in enumerate(words) if i not in covered]
        out.append((doc_id, " ".join(kept), len(words) - len(kept)))
    return out


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
