"""Similarity search over the embeddings table (vec_id, embedding:
array<float>, label).

Brute-force cosine top-k is the exactness baseline (one scan, JVM-side
F.aggregate/zip_with arithmetic, no UDF); the scale path buckets vectors with
a random-hyperplane LSH (SimHash for vectors) so candidate generation is a
bucket join instead of an all-pairs scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the query vector (excluded from
    results). Single scan + broadcast of the 1-row query + top-k via
    orderBy/limit (Spark plans TakeOrderedAndProject — no full sort)."""
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )
    v = F.col(vec_col).cast("array<double>")
    scored = (
        df.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            (
                _dot(v, F.col("qv"))
                / (_norm(v) * _norm(F.col("qv")))
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def plane_component(b: int, i: int, seed: int = 42) -> float:
    """Deterministic pseudo-random plane weight in [-1, 1): splitmix-style
    mix of (seed, b, i). Module-level so an independent oracle can rebuild
    the identical plane matrix."""
    x = (seed * 1000003 + b * 10007 + i * 101) & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = (x ^ (x >> 16)) * 0x45D9F3B & 0xFFFFFFFF
    x = x ^ (x >> 16)
    return (x / 0x80000000) - 1.0


def hyperplane_buckets(
    df: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: bit b = sign(v · h_b) with
    h_b derived deterministically from plane_component(b, i) — reproducible on
    any executor without shipping plane matrices."""
    v = F.col(vec_col).cast("array<double>")

    bucket = F.lit(0).cast("long")
    for b in range(n_planes):
        plane = F.array(*[F.lit(plane_component(b, i, seed)) for i in range(dim)])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        bit = F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseOR(bit)
    return df.select(F.col(id_col), bucket.alias("bucket"))


def ann_topk_lsh(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probe_hamming: int = 1,
    max_bucket: int | None = 1024,
) -> DataFrame:
    """Approximate top-k: restrict the exact scorer to the query's LSH bucket
    and (multi-probe) its hamming-``probe_hamming`` neighbor buckets — the
    standard recall fix for single-probe hyperplane LSH, at (n_planes+1)×
    the candidate volume instead of 2^n_planes.

    Scale sizing: expected bucket population is N / 2**n_planes, so pick
    n_planes ≈ log2(N / target_bucket) — the default 8 (256 buckets) is
    sized for the ~10^3-vector test corpus; a 10^12-vector crawl needs
    n_planes ≈ 30–40 (and more probe tables once n_planes approaches dim).
    ``max_bucket`` (default-on) additionally bounds the exact-cosine work:
    each probed bucket contributes at most its ``max_bucket`` lowest ids —
    deterministic, so an off-Spark oracle can replay the truncation — which
    caps candidates at (n_planes+1) × max_bucket even when a hot bucket
    swallows a constant fraction of the corpus."""
    buckets = hyperplane_buckets(df, n_planes, id_col, vec_col, dim)
    qb = buckets.where(F.col(id_col) == query_vec_id).select(
        F.col("bucket").alias("qbucket")
    )
    cond = F.col("bucket") == F.col("qbucket")
    if probe_hamming >= 1:
        for i in range(n_planes):
            cond = cond | (F.col("bucket") == F.col("qbucket").bitwiseXOR(F.lit(1 << i)))
    cands = (
        buckets.crossJoin(F.broadcast(qb))
        .where(cond)
        .where(F.col(id_col) != query_vec_id)
    )
    if max_bucket is not None:
        from pyspark.sql import Window

        # the window shuffle only carries the ≤ (n_planes+1) probed buckets;
        # the query row is excluded above so it never occupies a rank
        w = Window.partitionBy("bucket").orderBy(id_col)
        cands = (
            cands.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_bucket)
        )
    cands = cands.select(id_col)
    # re-add the query row: cosine_topk reads its vector from this frame
    restricted = df.join(cands, id_col, "left_semi").unionByName(
        df.where(F.col(id_col) == query_vec_id)
    )
    return cosine_topk(restricted, query_vec_id, k, id_col, vec_col)


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probe_hamming: int = 1,
    max_bucket: int | None = 256,
    log_dropped: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale.

    Candidate generation is a bucket join (never all-pairs): each surviving
    vector's LSH bucket is expanded to itself plus its hamming-
    ``probe_hamming`` neighbors (multi-probe); probes join the grouped
    bucket membership and pairs are emitted MAP-SIDE from each bucket's id
    array (no row-level self-join). Only candidates get the exact cosine
    test (>= threshold).

    Buckets larger than ``max_bucket`` are dropped entirely (default-on,
    mirroring minhash_near_dup_pairs): candidate volume is O(Σ m_bucket²),
    so one hot bucket — near-identical boilerplate pages, zero vectors —
    otherwise turns the join quadratic at crawl scale. With the cap,
    candidates are bounded by (n_planes+1) × max_bucket per vector by
    construction. ``log_dropped=True`` counts and warns about dropped
    buckets (costs one extra pass over the bucket aggregation).

    Scale sizing: expected bucket population is N / 2**n_planes — pick
    n_planes ≈ log2(N / target_bucket). The default 6 (64 buckets) is sized
    for the ~10^3-vector test corpus; a 10^12-vector crawl needs n_planes ≈
    30–40, keeping n_planes ≲ dim for the bits to stay discriminative."""
    buckets = hyperplane_buckets(df, n_planes, id_col, vec_col, dim)
    grouped = buckets.groupBy("bucket").agg(F.collect_list(id_col).alias("ids"))
    if max_bucket is not None:
        if log_dropped:
            import logging

            n_over = grouped.where(F.size("ids") > max_bucket).count()
            if n_over:
                logging.getLogger(__name__).warning(
                    "embedding_near_dups: dropping %d buckets larger than %d",
                    n_over,
                    max_bucket,
                )
        grouped = grouped.where(F.size("ids") <= max_bucket)
    # per-id rows rebuilt from surviving buckets only: a vector in an
    # oversized bucket neither probes nor is probed
    kept = grouped.select(F.col("bucket"), F.explode("ids").alias(id_col))
    masks = [0] + ([1 << i for i in range(n_planes)] if probe_hamming >= 1 else [])
    probes = kept.select(
        F.col(id_col).alias("pid"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("probe"),
    )
    # hamming-1 probing is symmetric (x probes y's bucket iff y probes x's),
    # so emitting only pid < candidate, map-side from the bucket's id array,
    # yields each unordered pair at least once; distinct dedups multi-band
    # hits
    cand = (
        probes.join(grouped, F.col("probe") == F.col("bucket"))
        .select(
            F.col("pid").alias("id_a"),
            F.explode(
                F.filter(F.col("ids"), lambda b: b > F.col("pid"))
            ).alias("id_b"),
        )
        .distinct()
    )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    cos = _dot(F.col("va"), F.col("vb")) / (_norm(F.col("va")) * _norm(F.col("vb")))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(cos >= threshold)
        .select("id_a", "id_b")
    )
