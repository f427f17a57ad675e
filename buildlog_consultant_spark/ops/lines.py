"""Line-level boilerplate removal — the within-domain line-dedup pass of a
web-scale pipeline (RefinedWeb "line-wise corrections"; CCNet drops lines
duplicated across pages of a domain): navigation menus, cookie banners and
footers repeat VERBATIM on every page of a host while the article text is
unique, so a line occurring in ≥ ``min_docs`` distinct documents of one
source is boilerplate and is cut from all of them.

Shuffle shape (mirrors ops/spans.py — this is ExactSubstr's geometry one
granularity up):

  1. per doc, posexplode the line array — map-side, positions kept so the
     document can be rebuilt in order;
  2. ONE hash agg keyed on (source, line) counts DISTINCT docs per line
     (map-side partial distinct bounds the shuffle by distinct
     (source, line, doc) triples; at crawl scale swap the line string for
     a 128-bit hash exactly like spans._gram_key_col, and
     approx_count_distinct if a ±2% threshold error is acceptable);
  3. boilerplate (source, line) pairs join back to the positions
     (shuffle equi-join — the boilerplate set is proportional to distinct
     templates, often broadcastable; Catalyst/AQE decides) and each doc's
     dropped positions aggregate into a bounded array (≤ doc line count);
  4. rebuild: filter the line array by dropped-position membership, join
     with '\\n' — never a corpus-wide sort; per-task work bounded by one
     document.

Semantics:
  * lines are exact '\\n' splits of the raw text (trailing empties kept —
    parity with the Python replay is test-pinned);
  * EMPTY lines (length 0) are never counted and never dropped —
    formatting survives;
  * a line repeated only WITHIN one doc is not boilerplate (the count is
    distinct docs, not occurrences);
  * NULL text → NULL ``text_stripped`` (nothing to strip); NULL-id rows
    pass through untouched AND their lines never count toward the
    threshold (countDistinct ignores NULL ids — a row that can't receive
    the strip shouldn't be evidence for it; the Python replay mirrors
    this); NULL source forms its own dedup scope (Spark groupBy keeps
    NULL as its own group natively, and the join-back is NULL-SAFE on
    the source so the strip actually reaches that group — a plain
    equi-join would detect but silently never remove).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def line_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(id, source, pos, line): every line of every doc with its 0-based
    position. Map-side only; NULL text yields no rows (split(NULL) is
    NULL → explode drops it)."""
    lines = F.split(F.col(text_col), "\n", -1)
    return df.select(
        F.col(id_col), F.col(source_col), F.posexplode(lines).alias("pos", "line")
    )


def boilerplate_lines(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """(source, line, n_docs): non-empty lines appearing in ≥ ``min_docs``
    DISTINCT documents of one source. One hash agg with map-side partial
    distinct — the only operator that sees corpus lines."""
    lp = line_positions(df, text_col, id_col, source_col)
    return (
        lp.where(F.length("line") > 0)
        .groupBy(source_col, "line")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def strip_boilerplate_lines(
    df: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """The line-dedup ENDPOINT: remove every boilerplate line (per
    boilerplate_lines) from every document of its source. Adds
    ``text_stripped`` (the doc rebuilt from surviving lines, '\\n'-joined,
    original bytes preserved line-for-line) and ``n_lines_removed``.
    Untouched docs keep text byte-identical; see module doc for the NULL
    policy."""
    bp = boilerplate_lines(df, min_docs, text_col, id_col, source_col)
    lp = line_positions(df, text_col, id_col, source_col)
    # NULL-SAFE on the source: a plain [source, line] equi-join drops the
    # NULL-source dedup scope — boilerplate there would be detected but
    # never removed (review r6 finding #1)
    dropped = (
        lp.join(
            bp.select(
                F.col(source_col).alias("_bs"), F.col("line").alias("_bl")
            ),
            F.col(source_col).eqNullSafe(F.col("_bs"))
            & (F.col("line") == F.col("_bl")),
        )
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_dropped"))
    )
    lines = F.split(F.col(text_col), "\n", -1)
    passthrough = (
        df.where(F.col(id_col).isNull())
        .withColumn("text_stripped", F.col(text_col))
        .withColumn("n_lines_removed", F.lit(0).cast("int"))
    )
    joined = (
        df.where(F.col(id_col).isNotNull())
        .join(dropped, id_col, "left")
        .withColumn("_lines", lines)
    )
    kept = F.filter(
        F.col("_lines"),
        lambda ln, i: ~F.array_contains(F.col("_dropped"), i),
    )
    stripped = (
        F.when(F.col(text_col).isNull(), F.lit(None).cast("string"))
        .when(F.col("_dropped").isNull(), F.col(text_col))
        .otherwise(F.concat_ws("\n", kept))
    )
    n_removed = (
        F.when(F.col("_dropped").isNull() | F.col(text_col).isNull(), F.lit(0))
        .otherwise(F.size(F.col("_dropped")))
        .cast("int")
    )
    return (
        joined.withColumn("text_stripped", stripped)
        .withColumn("n_lines_removed", n_removed)
        .drop("_dropped", "_lines")
        .unionByName(passthrough)
    )


def py_strip_boilerplate_lines(docs: list, min_docs: int = 3) -> list:
    """Python replay for oracle construction: ``docs`` is a list of
    (id, source, text) with unique ids; returns (id, text_stripped,
    n_lines_removed) per input row — same '\\n' split (trailing empties
    kept), same distinct-doc counting scoped per source (NULL source is
    its own scope), same empty-lines-never-dropped rule; NULL text →
    (id, None, 0); NULL id → untouched passthrough."""
    from collections import defaultdict

    seen: dict = defaultdict(set)
    for doc_id, source, text in docs:
        # NULL-id docs are not evidence (Spark countDistinct ignores NULL
        # ids; a row that can't receive the strip shouldn't count for it)
        if text is None or doc_id is None:
            continue
        for line in set(text.split("\n")):
            if line:
                seen[(source, line)].add(doc_id)
    boiler = {k for k, ids in seen.items() if len(ids) >= min_docs}
    out = []
    for doc_id, source, text in docs:
        if text is None:
            out.append((doc_id, None, 0))
            continue
        if doc_id is None:
            out.append((doc_id, text, 0))
            continue
        lines = text.split("\n")
        kept = [ln for ln in lines if not (ln and (source, ln) in boiler)]
        if len(kept) == len(lines):
            out.append((doc_id, text, 0))
        else:
            out.append((doc_id, "\n".join(kept), len(lines) - len(kept)))
    return out
