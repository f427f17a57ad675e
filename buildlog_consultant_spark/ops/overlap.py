"""Inter-source n-gram overlap matrix — corpus analytics for mixture
design: "how much does source A's content overlap source B's?" drives
both dedup priorities (crawl sources that mirror each other) and
contamination review (a curated set leaking into a crawl source).

Shape: ONE distinct aggregate over (source, gram) — the only operator
that sees corpus grams, map-side combined, cardinality bounded by
sources × distinct grams — then a per-gram source-set aggregate whose
arrays are bounded by ``max_sources_per_gram``, with source PAIRS
emitted map-side from each array (never a gram-keyed self-join). The
pair table is at most K²/2 rows for K sources.

Ubiquitous grams (present in more than ``max_sources_per_gram``
sources) are EXCLUDED BY DESIGN, not capped-and-sampled: a gram shared
by nearly every source is the n-gram analog of a stopword — it carries
no discriminative overlap signal and is precisely the gram that would
generate O(K²) pairs. This is the same IDF-style cutoff contamination
passes apply. The exclusion is part of the operator's CONTRACT (the
oracle applies the same cutoff), not a lossy approximation.

Scale note on the gram key: the default keys the distinct/group
aggregates by the raw gram STRING (the oracle reference — replayable in
pure Python). ``gram_key='hash64'`` shuffles xxhash64(gram) instead —
8-byte keys vs ~3 words of text, the dup_spans trade (collisions merge
two grams with probability ~n²/2^65; equivalence at fixture scale is
test-pinned)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles


def source_gram_overlap(
    df: DataFrame,
    k: int = 3,
    key_col: str = "source",
    text_col: str = "text",
    gram_key: str = "string",
    max_sources_per_gram: int = 64,
    min_shared: int = 1,
) -> DataFrame:
    """(src_a, src_b, shared_grams, jaccard_ppm) for every source pair
    (src_a < src_b) sharing ≥ ``min_shared`` distinct k-shingles, under
    the ubiquitous-gram cutoff (module doc). jaccard_ppm =
    floor(shared · 1e6 / (|A| + |B| − shared)) over DISTINCT gram sets —
    floor-of-double with operands exact in double below 2^53 (the
    near_dup_verify convention: Spark's cast(long) and Python's int()
    truncate the same IEEE division; shared·1e6 < 2^53 holds for any
    per-source distinct-gram count below ~9e9). NULL sources are excluded (a NULL key
    can't order in a pair and carries no source identity)."""
    if gram_key not in ("string", "hash64"):
        raise ValueError(f"gram_key must be 'string' or 'hash64', got {gram_key!r}")
    g = F.explode(F.array_distinct(_shingles(text_col, k))).alias("g")
    grams = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("src"), g)
        .select("src", (F.xxhash64("g") if gram_key == "hash64" else F.col("g")).alias("gk"))
        .distinct()
        # feeds TWO branches (per-source sizes + per-gram source sets);
        # materialize so the corpus scan + interpreted shingle HOF +
        # distinct shuffle run once, not per branch. The table is
        # sources × distinct-grams — already the reduced form, far
        # smaller than the corpus.
        .localCheckpoint(eager=True)
    )
    per_src = grams.groupBy("src").agg(F.count("*").alias("n_grams"))
    buckets = (
        grams.groupBy("gk")
        .agg(F.sort_array(F.collect_set("src")).alias("srcs"))
        .where(
            (F.size("srcs") >= 2) & (F.size("srcs") <= max_sources_per_gram)
        )
    )
    # map-side pair emission from each (bounded) source array; the
    # two-parameter transform lambda binds the element INDEX second
    pairs = buckets.select(
        F.explode(
            F.flatten(
                F.transform(
                    "srcs",
                    lambda x, i: F.transform(
                        F.slice(F.col("srcs"), i + 2, F.size("srcs")),
                        lambda y: F.struct(x.alias("src_a"), y.alias("src_b")),
                    ),
                )
            )
        ).alias("p")
    ).select("p.src_a", "p.src_b")
    shared = pairs.groupBy("src_a", "src_b").agg(
        F.count("*").alias("shared_grams")
    )
    a = per_src.select(F.col("src").alias("src_a"), F.col("n_grams").alias("_na"))
    b = per_src.select(F.col("src").alias("src_b"), F.col("n_grams").alias("_nb"))
    # sources « grams: both count tables broadcast
    jac = (
        F.col("shared_grams").cast("long")
        * 1000000
        / (F.col("_na") + F.col("_nb") - F.col("shared_grams"))
    ).cast("long")
    return (
        shared.join(F.broadcast(a), "src_a")
        .join(F.broadcast(b), "src_b")
        .select("src_a", "src_b", "shared_grams", jac.alias("jaccard_ppm"))
        .where(F.col("shared_grams") >= min_shared)
    )


def py_source_gram_overlap(
    docs: list, k: int = 3, max_sources_per_gram: int = 64, min_shared: int = 1
) -> list:
    """Python-golden replay over [(source, text)] — same tokenizer
    (whitespace-normalize, lower, split; NULL text → the single ''
    shingle), same ubiquitous-gram cutoff, same integer Jaccard."""
    import re
    from itertools import combinations

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def shingles(text):
        toks = ws.sub(" ", (text or "").strip(" ")).lower().split(" ")
        n = len(toks)
        return {" ".join(toks[i : i + k]) for i in range(0, max(n - k, 0) + 1)}

    per_src: dict = {}
    for src, text in docs:
        if src is None:
            continue
        per_src.setdefault(src, set()).update(shingles(text))
    gram_srcs: dict = {}
    for src, grams in per_src.items():
        for g in grams:
            gram_srcs.setdefault(g, set()).add(src)
    counts: dict = {}
    for srcs in gram_srcs.values():
        if not (2 <= len(srcs) <= max_sources_per_gram):
            continue
        for pa, pb in combinations(sorted(srcs), 2):
            counts[(pa, pb)] = counts.get((pa, pb), 0) + 1
    out = []
    for (pa, pb), c in sorted(counts.items()):
        if c < min_shared:
            continue
        union = len(per_src[pa]) + len(per_src[pb]) - c
        out.append((pa, pb, c, int(c * 1000000 / union)))
    return out
