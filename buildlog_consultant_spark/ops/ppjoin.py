"""EXACT all-pairs Jaccard similarity join via PREFIX FILTERING — the
AllPairs/PPJoin family (Bayardo et al. WWW'07; Xiao et al. WWW'08),
the exact counterpart of the MinHash-LSH near-dup path: every pair
with Jaccard >= tau is returned, NO false negatives, no sketch error.

Why not brute force: the token self-join (tok a JOIN tok b ON a.gram =
b.gram) explodes on common grams — at crawl scale a boilerplate
shingle shared by 10^6 docs alone yields 10^12 candidate rows. Prefix
filtering bounds candidate generation by a THEOREM instead of a prune:

  Order the universe of grams by a global total order (ascending
  document frequency, ties by gram — rarest first). For a doc with t
  distinct grams, keep the first  p = t - ceil(tau*t) + 1  grams under
  that order (its PREFIX). If J(A,B) >= tau then |A∩B| >= ceil(tau *
  max(|A|,|B|)), so A and B cannot disagree on all of either prefix —
  any qualifying pair SHARES at least one PREFIX gram. Candidates =
  pairs co-occurring in the prefix index only; rare-first ordering
  makes those postings the SHORTEST ones. Each candidate is then
  verified with an exact overlap count.

Scale shape, stage by stage (all hash-partitioned, no windows over
corpus rows, no nested loop):
  1. gram index: word_ngrams (map-side explode of per-row distinct
     shingles) — one corpus scan;
  2. document frequency: one (gram) hash agg; join back to the index
     on gram (the tf-idf shuffle shape);
  3. per-doc prefix: one (doc) hash agg collecting the doc's OWN grams
     (doc-grain array, bounded by doc length), sort_array by (df,
     gram), slice the prefix — per-task work bounded per doc;
  4. candidates: self-equi-join of the PREFIX index on gram (a < b),
     distinct — the joined postings are document-frequency-ordered
     shortest postings by construction;
  5. verify: candidate-restricted overlap count — two equi-joins that
     touch only candidate pairs' token rows, then the exact integer
     permille threshold by cross-multiplication (1000*c >= tau*(na +
     nb - c); never a float ratio).

The permille threshold keeps every comparison in integers; emitted
jaccard_permille is the truncating 1000*c DIV union (Spark DIV ≡
DuckDB //).

NULL/short-doc policy: word_ngrams' — NULL ids dropped (pair identity
needs a key), docs with < n tokens emit no grams and join nothing.
Self-pairs are excluded by id_a < id_b; each qualifying pair appears
exactly once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_ngrams


def jaccard_allpairs(
    df: DataFrame,
    tau_permille: int = 500,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint: bool = True,
) -> DataFrame:
    """(id_a, id_b, jaccard_permille): every unordered doc pair whose
    n-gram-shingle Jaccard >= tau_permille/1000, found via prefix
    filtering and verified exactly."""
    if not (0 < tau_permille <= 1000):
        raise ValueError(
            f"tau_permille must be in (0, 1000], got {tau_permille}"
        )
    tau = int(tau_permille)
    tok = word_ngrams(
        df.where(F.col(id_col).isNotNull()), n=n,
        text_col=text_col, id_col=id_col,
    )
    # The gram index feeds FIVE plan branches (df-count, prefix build,
    # both verify sides, sizes) — persist it so the corpus
    # scan+tokenize+explode runs once, not per branch (triangle_counts'
    # pattern: persist the reused table, materialize the bounded
    # output, release).
    tok.persist()
    try:
        dfreq = tok.groupBy("gram").agg(F.count(F.lit(1)).alias("_gdf"))
        ordered = (
            tok.join(dfreq, "gram")
            .groupBy(id_col)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_gdf"), F.col("gram")))
                ).alias("_arr"),
                F.count(F.lit(1)).alias("_nt"),
            )
        )
        # prefix length p = t - ceil(tau*t/1000) + 1  (>= 1 when t >= 1)
        p = F.expr(f"_nt - (({tau} * _nt + 999) DIV 1000) + 1").cast("int")
        prefix = ordered.select(
            F.col(id_col),
            F.explode(
                F.transform(F.slice("_arr", F.lit(1), p), lambda x: x["gram"])
            ).alias("gram"),
        )

        a = prefix.select(F.col(id_col).alias("id_a"), "gram")
        b = prefix.select(F.col(id_col).alias("id_b"), "gram")
        cand = (
            a.join(b, "gram")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

        ta = tok.select(F.col(id_col).alias("id_a"), "gram")
        tb = tok.select(F.col(id_col).alias("id_b"), "gram")
        overlap = (
            cand.join(ta, "id_a")
            .join(tb, ["id_b", "gram"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )
        sz = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
        out = _verify_and_emit(overlap, sz, tau, id_col)
        if checkpoint:
            # Pair-grain output (bounded by qualifying pairs) —
            # materialize so the persisted gram index can be released
            # now. checkpoint=False keeps the lazy plan (plan dumps,
            # composition) at the cost of pinning the cache until the
            # caller evaluates.
            out = out.localCheckpoint(eager=True)
    finally:
        if checkpoint:
            tok.unpersist()
    return out


def jaccard_allpairs_bruteforce(
    df: DataFrame,
    tau_permille: int = 500,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Unfiltered token self-join formulation — the equivalence
    reference for tests only (candidate set = every pair sharing ANY
    gram; never on the query path)."""
    tok = word_ngrams(
        df.where(F.col(id_col).isNotNull()), n=n,
        text_col=text_col, id_col=id_col,
    )
    ta = tok.select(F.col(id_col).alias("id_a"), "gram")
    tb = tok.select(F.col(id_col).alias("id_b"), "gram")
    overlap = (
        ta.join(tb, "gram")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    sz = tok.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"))
    return _verify_and_emit(overlap, sz, int(tau_permille), id_col)


def _verify_and_emit(
    overlap: DataFrame, sz: DataFrame, tau: int, id_col: str
) -> DataFrame:
    """Shared tail of both formulations: join sizes onto the pair
    overlap counts, apply the exact cross-multiplied threshold, emit
    the truncating permille. Single-sourced so a threshold/rounding
    change can't drift between the op and its equivalence reference."""
    return (
        overlap.join(
            sz.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")),
            "id_a",
        )
        .join(
            sz.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")),
            "id_b",
        )
        .where(F.expr(f"1000 * _c >= {tau} * (_na + _nb - _c)"))
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(1000 * _c DIV (_na + _nb - _c) AS LONG)").alias(
                "jaccard_permille"
            ),
        )
    )
