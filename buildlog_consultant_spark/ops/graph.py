"""Link-graph PageRank — the web-graph centrality signal crawl
pipelines rank domains/pages with (quality weighting, crawl-frontier
prioritization, seed selection).

The corpus carries no hyperlinks, so the graph is PLANTED
deterministically (the repo's convention for absent web structure —
see domain_stats' planted hosts): every node u emits OUT_DEG=4 edges
to ``((u·2654435761 + j·40503 + 12345) mod 2^32) mod n`` (a Knuth
multiplicative mix; self-loops advance to the next node so out-degree
is exactly 4). Both engines replay the same arithmetic.

Integer PageRank: float PageRank drifts across engines, so ranks are
parts-per-billion integers with exact floor division at every step —
bit-replayable in pure Python:

    base   = 10^9 // n
    tele   = (15 · base) // 100
    contrib(v→u) = rank(v) DIV 4
    rank'(u) = tele + (85 · Σ contrib) // 100

Fixed ITERS=5 iterations (enough to differentiate hubs on the planted
graph; the count is part of the query contract, not a convergence
loop — data-dependent convergence is not oracle-checkable).

Scale shape: the classic Pregel pattern — edges are computed once,
repartitioned on src and cached; each iteration is one equi-join
(edges ⋈ ranks on src; the cached edge side keeps its partitioning)
plus one map-side-combinable sum aggregate on dst. The src→dst
partitioning mismatch per iteration is inherent to PageRank (scatter
by src, gather by dst) — at cluster scale you bucket BOTH by node id
so the join is exchange-free and only the gather shuffles. Lineage: 5
fixed iterations is shallow enough to skip checkpointing; a
convergence-loop deployment would localCheckpoint every ~5 rounds.

NULL policy: node ids come from the corpus id column; NULL ids are
excluded from the graph up front (a NULL node can't join its edges).

Contiguity contract: the planted targets are ids in [0, n), so the
graph assumes the corpus id column is exactly {0..n-1} (the synthetic
corpus convention). A subsetted/non-contiguous id space would first
need a dense index (zipWithIndex / row_number over a bounded dim) —
out of scope for the planted stand-in."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_DEG = 4
ITERS = 5
_MIX_A = 2654435761
_MIX_B = 40503
_MIX_C = 12345
_M32 = 1 << 32


def planted_edges(nodes: DataFrame, n: int, id_col: str = "doc_id") -> DataFrame:
    """(src, dst) edge list: OUT_DEG deterministic out-links per node,
    self-loops advanced to the next node id.

    Arithmetic bound (part of the contiguity contract): the mix
    ``id * 2654435761`` runs in int64, so ids must stay below
    2^63 / 2654435761 ≈ 3.47e9 — beyond that the product wraps (or
    throws under ANSI) while the pure-Python replay uses unbounded
    ints and would silently diverge. The documented synthetic [0, n)
    corpus keeps n far below that; a larger id space would need the
    mix in decimal(38,0) before the mod 2^32."""
    cols = []
    for j in range(OUT_DEG):
        t = (F.col(id_col) * _MIX_A + F.lit(j * _MIX_B + _MIX_C)) % _M32 % n
        t = F.when(t == F.col(id_col), (t + 1) % n).otherwise(t)
        cols.append(t.cast("long"))
    return (
        nodes.where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("src"),
            F.explode(F.array(*cols)).alias("dst"),
        )
    )


def pagerank(
    docs: DataFrame, id_col: str = "doc_id", iters: int = ITERS
) -> DataFrame:
    """(node, in_deg, rank_ppb) — exact-integer PageRank after
    ``iters`` rounds on the planted graph over the non-NULL ids."""
    # .distinct() pins the documented node contract (the python replay
    # dedupes via set()): a duplicate id would otherwise double-count
    # its contribution every round and inflate n — diverging silently.
    nodes = (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("node"))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node",
            F.lit(0).cast("long").alias("in_deg"),
            F.lit(0).cast("long").alias("rank_ppb"),
        )
    base = 10**9 // n
    tele = (15 * base) // 100

    edges = planted_edges(nodes, n, id_col="node").repartition("src")
    edges.persist()
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )

    ranks = nodes.withColumn("rank", F.lit(base).cast("long"))
    for _ in range(iters):
        sums = (
            edges.join(ranks, edges.src == ranks.node)
            .select("dst", F.expr(f"rank DIV {OUT_DEG}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(sums, nodes.node == sums.dst, "left")
            .select(
                "node",
                F.expr(
                    f"CAST({tele} + (85 * coalesce(s, 0)) DIV 100 AS LONG)"
                ).alias("rank"),
            )
        )
    out = (
        ranks.join(in_deg, "node", "left")
        .select(
            "node",
            F.coalesce("in_deg", F.lit(0)).cast("long").alias("in_deg"),
            F.col("rank").alias("rank_ppb"),
        )
    )
    # Materialize node-grain output (≤ one row per corpus id) so the
    # cached edge partitions can be released NOW — returning a lazy
    # frame would pin the edge cache for the session lifetime (each
    # invocation leaking another copy into executor storage memory).
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def py_pagerank(node_ids: list, iters: int = ITERS) -> list:
    """Pure-Python golden replay: same planted edges, same integer
    arithmetic. Returns sorted (node, in_deg, rank_ppb)."""
    ids = sorted({i for i in node_ids if i is not None})
    n = len(ids)
    if n == 0:
        return []
    base = 10**9 // n
    tele = (15 * base) // 100
    edges: list = []
    for u in ids:
        for j in range(OUT_DEG):
            t = ((u * _MIX_A + j * _MIX_B + _MIX_C) % _M32) % n
            if t == u:
                t = (t + 1) % n
            edges.append((u, t))
    in_deg: dict = {}
    for _, d in edges:
        in_deg[d] = in_deg.get(d, 0) + 1
    rank = {u: base for u in ids}
    for _ in range(iters):
        sums: dict = {}
        for u, d in edges:
            sums[d] = sums.get(d, 0) + rank[u] // OUT_DEG
        rank = {u: tele + (85 * sums.get(u, 0)) // 100 for u in ids}
    return [(u, in_deg.get(u, 0), rank[u]) for u in ids]


def triangle_counts(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-node triangle counts on the planted link graph — the
    clustering/community-density signal of web-graph analysis (spam
    farms and boilerplate mirror clusters show up as dense triangles).
    Returns (node, n_triangles) for every node in >= 1 triangle.

    Algorithm: the standard edge-orientation enumeration. The directed
    planted edges are first canonicalized to an undirected simple edge
    set with a < b (distinct least/greatest — direction and multiplicity
    don't define a triangle), then each triangle a < b < c is found
    EXACTLY ONCE as e1=(a,b) ⋈ e2=(b,c) on the shared middle node plus
    an existence join on (a,c).

    Scale shape: two hash equi-joins over the oriented edge table — no
    nested loop, no per-node adjacency materialization beyond the join
    hash sides. The wedge join (e1.b = e2.a) fans out by the oriented
    out-degree of the middle node; orienting a < b on a bounded-degree
    graph (planted out-degree 4 → undirected degree ≤ 8) bounds wedges
    per node at ~deg²; on a power-law web graph the production trick is
    to orient low-degree → high-degree instead, which this canonical
    form generalizes to without changing the joins. The oriented edge
    table is persisted: it feeds three join sides and would otherwise
    recompute the distinct per use.

    NULL policy: NULL ids are excluded up front (pagerank's node
    contract; the planted targets need the dense [0, n) id space).
    """
    nodes = (
        docs.where(F.col(id_col).isNotNull())
        .select(F.col(id_col).cast("long").alias("node"))
        .distinct()
    )
    n = nodes.count()
    if n == 0:
        return nodes.select(
            "node", F.lit(0).cast("long").alias("n_triangles")
        ).limit(0)
    und = (
        planted_edges(nodes, n, id_col="node")
        .where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    und.persist()
    try:
        e1 = und.select(F.col("a").alias("ta"), F.col("b").alias("tb"))
        e2 = und.select(F.col("a").alias("tb2"), F.col("b").alias("tc"))
        e3 = und.select(F.col("a").alias("ca"), F.col("b").alias("cc"))
        tri = (
            e1.join(e2, F.col("tb") == F.col("tb2"))
            .join(
                e3,
                (F.col("ca") == F.col("ta")) & (F.col("cc") == F.col("tc")),
                "left_semi",
            )
            .select("ta", "tb", "tc")
        )
        out = (
            tri.select(
                F.explode(F.array("ta", "tb", "tc")).alias("node")
            )
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        )
        # Node-grain output (bounded by corpus ids) — materialize so the
        # persisted edge table can be released now (pagerank's pattern).
        out = out.localCheckpoint(eager=True)
    finally:
        und.unpersist()
    return out
