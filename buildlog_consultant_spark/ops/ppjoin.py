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
  2. gram table: one (gram) hash agg for document frequency, plus a
     session-unique int64 surrogate id per gram
     (monotonically_increasing_id); the table is eagerly
     localCheckpoint-ed so the ids are assigned EXACTLY ONCE — every
     downstream branch reads the frozen ids, and a lost block fails
     the job loudly instead of silently re-assigning. All candidate
     keys and verify arrays are 8-byte longs, never gram text, with
     zero collision risk (the id is a join-assigned bijection, not a
     hash);
  3. per-doc ordered gram array: one (doc) hash agg collecting the
     doc's OWN grams (doc-grain array, bounded by doc length),
     sort_array by (df, gram) — per-task work bounded per doc;
  4. candidates: self-equi-join of the POSITIONAL prefix index on the
     gram id (a < b), pruned by three lossless PPJoin filters before
     any pair is materialized —
       * length: 1000*min(|A|,|B|) >= tau*max(|A|,|B|)  (else J < tau);
       * positional (per occurrence): a shared prefix gram at 1-based
         positions (pa, pb) bounds the overlap by
         ub = 1 + min(|A|-pa, |B|-pb); drop the occurrence when
         ub < alpha where alpha = ceil(tau*(|A|+|B|)/(1000+tau)) is
         the minimal overlap for J >= tau (cross-multiplied form of
         c >= tau*(|A|+|B|-c));
       * positional (per pair): aggregating surviving occurrences,
         c <= n_shared_prefix + min(|A|-max_pa, |B|-max_pb). Lossless
         because the global order is consistent across docs: any
         common gram not counted lies strictly after (max_pa, max_pb)
         in both docs (an occurrence before the surviving max in both
         docs would itself have survived the per-occurrence filter).
  5. verify: join each surviving pair to the two per-doc gram-id
     arrays and count the EXACT overlap map-side
     (size(array_intersect)) — pair-grain rows only, never a
     pair x token explode; the arrays cross exactly one shuffle
     (the move-heavy-bytes-once shape). The exact integer permille
     threshold by cross-multiplication (1000*c >= tau*(na + nb - c);
     never a float ratio).

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
    filtering with PPJoin length/positional pruning and verified
    exactly at pair grain."""
    if not (0 < tau_permille <= 1000):
        raise ValueError(
            f"tau_permille must be in (0, 1000], got {tau_permille}"
        )
    tau = int(tau_permille)
    tok = word_ngrams(
        df.where(F.col(id_col).isNotNull()), n=n,
        text_col=text_col, id_col=id_col,
    )
    if checkpoint:
        # tok feeds the gram-table job (eager, below) and the ordered
        # build — persist so the corpus scan+tokenize+explode runs
        # once. checkpoint=False keeps the full plan lazy (plan dumps,
        # composition) at the cost of re-tokenizing per evaluation.
        tok.persist()
    try:
        # Gram table: df + session-unique int64 surrogate id. Eagerly
        # localCheckpoint-ed: monotonically_increasing_id depends on
        # partitioning, so the assignment must happen exactly once —
        # after this line every branch (prefix index, verify arrays)
        # reads the same frozen ids; a recompute can't silently
        # re-assign them (a lost block fails loudly instead). The
        # table is VOCABULARY-sized (one row per distinct gram), not
        # corpus-sized.
        gramtab = (
            tok.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("_gdf"))
            .withColumn("_gid", F.monotonically_increasing_id())
            .localCheckpoint(eager=True)
        )
        ordered = (
            tok.join(gramtab, "gram")
            .groupBy(id_col)
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("_gdf"), F.col("gram"), F.col("_gid"))
                    )
                ).alias("_arr"),
                F.count(F.lit(1)).alias("_nt"),
            )
        )
        if checkpoint:
            # ordered feeds three branches (prefix index + both verify
            # sides) — cache it for the single eager evaluation below.
            ordered.persist()

        # prefix length p = t - ceil(tau*t/1000) + 1  (>= 1 when t >= 1)
        p = F.expr(f"_nt - (({tau} * _nt + 999) DIV 1000) + 1").cast("int")
        prefix = ordered.select(
            F.col(id_col),
            F.col("_nt"),
            F.posexplode(
                F.slice(F.transform("_arr", lambda x: x["_gid"]), F.lit(1), p)
            ).alias("_p0", "_gid"),
        ).select(id_col, "_nt", (F.col("_p0") + 1).alias("_pos"), "_gid")

        a = prefix.select(
            F.col(id_col).alias("id_a"),
            F.col("_nt").alias("_na"),
            F.col("_pos").alias("_pa"),
            "_gid",
        )
        b = prefix.select(
            F.col(id_col).alias("id_b"),
            F.col("_nt").alias("_nb"),
            F.col("_pos").alias("_pb"),
            "_gid",
        )
        # alpha = ceil(tau*(na+nb)/(1000+tau)): the minimal exact
        # overlap c for J >= tau (from c*(1000+tau) >= tau*(na+nb)).
        alpha = F.expr(
            f"({tau} * (_na + _nb) + {1000 + tau} - 1) DIV {1000 + tau}"
        )
        occ = (
            a.join(b, "_gid")
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.expr(f"1000 * least(_na, _nb) >= {tau} * greatest(_na, _nb)"))
            .where(
                (
                    1
                    + F.least(
                        F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb")
                    )
                )
                >= alpha
            )
        )
        pairs = (
            occ.groupBy("id_a", "id_b")
            .agg(
                F.count(F.lit(1)).alias("_cp"),
                F.max("_pa").alias("_mpa"),
                F.max("_pb").alias("_mpb"),
                F.first("_na").alias("_na"),
                F.first("_nb").alias("_nb"),
            )
            .where(
                (
                    F.col("_cp")
                    + F.least(
                        F.col("_na") - F.col("_mpa"),
                        F.col("_nb") - F.col("_mpb"),
                    )
                )
                >= F.expr(
                    f"({tau} * (_na + _nb) + {1000 + tau} - 1) DIV {1000 + tau}"
                )
            )
            .select("id_a", "id_b")
        )

        docarr = ordered.select(
            F.col(id_col),
            F.transform("_arr", lambda x: x["_gid"]).alias("_g"),
            F.col("_nt"),
        )
        # Pair-grain exact verification: two equi-joins attach each
        # side's gram-id array, then one map-side array_intersect.
        # shuffle_hash: the doc-array side per post-shuffle partition
        # is doc-grain and array-bounded — hash-build it instead of
        # sorting the (much larger) pair side.
        out = _emit_threshold(
            pairs.join(
                docarr.select(
                    F.col(id_col).alias("id_a"),
                    F.col("_g").alias("_ga"),
                    F.col("_nt").alias("_na"),
                ).hint("shuffle_hash"),
                "id_a",
            )
            .join(
                docarr.select(
                    F.col(id_col).alias("id_b"),
                    F.col("_g").alias("_gb"),
                    F.col("_nt").alias("_nb"),
                ).hint("shuffle_hash"),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("_ga", "_gb")).alias("_c"),
                "_na",
                "_nb",
            ),
            tau,
        )
        if checkpoint:
            # Pair-grain output (bounded by qualifying pairs) —
            # materialize so the persisted intermediates can be
            # released now.
            out = out.localCheckpoint(eager=True)
    finally:
        if checkpoint:
            tok.unpersist()
            try:
                ordered.unpersist()
            except NameError:
                pass
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
    return _emit_threshold(
        overlap.join(
            sz.select(F.col(id_col).alias("id_a"), F.col("_n").alias("_na")),
            "id_a",
        ).join(
            sz.select(F.col(id_col).alias("id_b"), F.col("_n").alias("_nb")),
            "id_b",
        ),
        int(tau_permille),
    )


def _emit_threshold(pairs_with_counts: DataFrame, tau: int) -> DataFrame:
    """Shared tail of both formulations: given pair rows carrying the
    exact overlap `_c` and set sizes `_na`/`_nb`, apply the exact
    cross-multiplied threshold and emit the truncating permille.
    Single-sourced so a threshold/rounding change can't drift between
    the op and its equivalence reference."""
    return (
        pairs_with_counts.where(F.expr(f"1000 * _c >= {tau} * (_na + _nb - _c)"))
        .select(
            "id_a",
            "id_b",
            F.expr("CAST(1000 * _c DIV (_na + _nb - _c) AS LONG)").alias(
                "jaccard_permille"
            ),
        )
    )
