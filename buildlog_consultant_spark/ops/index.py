"""Inverted-index build — token → document-frequency stats plus the
posting list for rare tokens, the search/retrieval-side artifact a
web-text pipeline materializes (deduplication forensics, contamination
lookups, "which docs contain this token" audits).

Scale shape (the cap discipline, same argument as the LSH bucket caps):
per-token statistics (df, min/max doc id) are ONE hash agg over the
distinct (token, doc) pairs — safe at any skew because every output is
a scalar. The posting LIST, however, is unbounded for stopwords (a
``collect_list`` behind a ``CASE WHEN df <= cap`` still collects the
stopword's full posting before discarding it), so lists are built in a
second pass restricted BY JOIN to tokens whose df is already known to
be ≤ ``postings_cap`` — every collect_list group is ≤ cap rows by
construction, and common tokens carry a NULL postings column (their
stats still appear; the cap is a documented contract, not a silent
drop). Postings are emitted as a comma-joined string (engine-portable;
array hashing differences never reach the driver compare).

NULL policy: NULL doc ids are excluded up front (a posting that points
nowhere identifies nothing); NULL/empty text yields no tokens
(ops/text.py::tokens_expr). df is a DOCUMENT frequency: per-row
array_distinct collapses within-doc multiplicity map-side (the cheap
99% case), and a (token, doc) pair-level distinct — one hash agg with
partial combine — guards against the same doc id appearing on several
input rows (re-ingested docs), which would otherwise double-count df
and duplicate postings against the DISTINCT-based oracle.

Reference scope: jelmer/buildlog-consultant has no retrieval index;
part of the repo's LLM-training-data surface (round brief)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_expr


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    postings_cap: int = 8,
) -> DataFrame:
    """(token, df_docs, min_doc, max_doc, postings) for tokens
    appearing in ≥ ``min_df`` docs; ``postings`` is the ascending
    comma-joined doc-id list when df_docs ≤ ``postings_cap``, else
    NULL."""
    pairs = (
        df.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("doc"),
            F.explode(F.array_distinct(tokens_expr(text_col))).alias(
                "token"
            ),
        )
        .distinct()
    )
    stats = pairs.groupBy("token").agg(
        F.count("*").cast("long").alias("df_docs"),
        F.min("doc").alias("min_doc"),
        F.max("doc").alias("max_doc"),
    )
    rare = stats.where(F.col("df_docs") <= postings_cap).select("token")
    lists = (
        pairs.join(rare, "token")
        .groupBy("token")
        .agg(
            # numeric sort FIRST, then cast to string ("10" < "2" would
            # misorder a lexicographic sort), then join
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("doc")),
                    lambda d: d.cast("string"),
                ),
                ",",
            ).alias("postings")
        )
    )
    return (
        stats.where(F.col("df_docs") >= min_df)
        .join(lists, "token", "left")
        .select("token", "df_docs", "min_doc", "max_doc", "postings")
    )
