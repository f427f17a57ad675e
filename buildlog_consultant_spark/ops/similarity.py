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


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_pivots: int = 16,
    nprobe: int = 4,
    max_cell: int | None = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the coarse-
    quantizer alternative to hyperplane LSH.

    Pivot selection is deterministic (the ``n_pivots`` lowest-id vectors),
    so the whole index is replayable off-Spark bit-exactly: every distance
    is a left-to-right double fold, identical in Spark's F.aggregate, in
    DuckDB list_sum, and in a plain Python loop. Each vector joins the cell
    of its highest-cosine pivot (ties → lowest pivot index); the query
    probes its ``nprobe`` nearest cells; only those cells get the exact
    scorer, capped at ``max_cell`` lowest ids per cell (mirroring the LSH
    family's bucket caps).

    Scale shape: the pivot table is a driver-side collect of n_pivots rows
    (bounded, documented); assignment is a per-row JVM expression (n_pivots
    dot products — no shuffle); candidate selection is a filter on the cell
    id, which also makes cell a natural write-partition key for repeated
    queries (partition pruning replaces the filter scan). Expected scan
    fraction ≈ nprobe / n_pivots; pick n_pivots ≈ sqrt(N) for the classic
    IVF balance at crawl scale."""
    piv_rows = (
        df.orderBy(id_col)
        .limit(n_pivots)
        .select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    pivots = [(r[0], list(r[1])) for r in piv_rows]

    def py_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    piv_norms = [math.sqrt(py_dot(v, v)) for _, v in pivots]

    v = F.col(vec_col).cast("array<double>")
    vnorm = _norm(v)
    # struct max: (cosine, -index) — lexicographic array_max gives the
    # highest cosine, ties broken toward the LOWEST pivot index
    piv_entries = []
    for i, (_pid, pv) in enumerate(pivots):
        pcos = _dot(v, F.array(*[F.lit(x) for x in pv])) / (vnorm * F.lit(piv_norms[i]))
        piv_entries.append(F.struct(pcos.alias("c"), F.lit(-i).alias("ni")))
    cands_struct = F.array(*piv_entries)
    cell = (-F.array_max(cands_struct)["ni"]).alias("cell")
    assigned = df.select(F.col(id_col), cell)

    # query-side probe selection in plain Python — same IEEE doubles, same
    # fold order, so it agrees bit-exactly with the JVM assignment
    qv = [
        float(x)
        for x in df.where(F.col(id_col) == query_vec_id).select(v.alias("q")).head()[0]
    ]
    qnorm = math.sqrt(py_dot(qv, qv))
    qcos = [
        (py_dot(qv, pv) / (qnorm * piv_norms[i]), -i)
        for i, (_, pv) in enumerate(pivots)
    ]
    probe_cells = [-ni for _, ni in sorted(qcos, reverse=True)[:nprobe]]

    cands = assigned.where(
        F.col("cell").isin(probe_cells) & (F.col(id_col) != query_vec_id)
    )
    if max_cell is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("cell").orderBy(id_col)
        cands = (
            cands.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= max_cell)
        )
    cands = cands.select(id_col)
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


def embedding_near_dup_clusters(
    df: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probe_hamming: int = 1,
    max_bucket: int | None = 256,
) -> DataFrame:
    """Embedding-cosine near-dup CLUSTERS: the capped LSH pair generator
    feeding connected components (same CC machinery as the text-minhash
    family — reliable checkpointing, pointer jumping). Returns
    (id, cluster) with cluster = the component's minimum vec_id."""
    from .dedup import connected_components

    pairs = embedding_near_dups(
        df, threshold, n_planes, id_col, vec_col, dim, probe_hamming, max_bucket
    )
    return connected_components(pairs.select("id_a", "id_b"))
