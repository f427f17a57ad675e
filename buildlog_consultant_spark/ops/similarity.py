"""Similarity search over the embeddings table (vec_id, embedding:
array<float>, label).

Brute-force cosine top-k is the exactness baseline; the scale path buckets
vectors with a random-hyperplane LSH (SimHash for vectors) so candidate
generation is a bucket join instead of an all-pairs scan.

Vector math runs in numpy Arrow kernels (pandas UDFs), NOT in Spark
higher-order-function expressions: HOF folds (aggregate/zip_with) never
enter whole-stage codegen — they run interpreted, ~60× slower than the
same arithmetic over an Arrow batch (measured on the SimHash vote fold,
ops/dedup.py). Bit-exactness with the off-Spark oracles is preserved by
folding LEFT-TO-RIGHT: np.cumsum along the vector axis is a sequential
accumulation, so every dot/norm rounds identically to the reference
Python loop ``acc = 0.0; for x in prod: acc = acc + x`` and to Spark's
F.aggregate fold (property-pinned in tests/test_round4.py). The HOF
forms are kept as _dot/_norm/_hyperplane_buckets_hof for those parity
tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    """Interpreted HOF dot — reference fold for bit-exactness tests only."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    """Interpreted HOF norm — reference fold for bit-exactness tests only."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def _ltr_sum(m: np.ndarray) -> np.ndarray:
    """Left-to-right IEEE-double fold along the last axis, starting from
    0.0 — identical rounding to the HOF/Python reference fold (cumsum is a
    sequential scan; the explicit 0.0+first replicates the fold's initial
    accumulator, which canonicalizes -0.0)."""
    if m.shape[-1] == 0:
        return np.zeros(m.shape[:-1])
    m = m.astype(np.float64, copy=True)
    m[..., 0] = 0.0 + m[..., 0]
    return np.cumsum(m, axis=-1)[..., -1]


# rows per 3-D kernel call, sized so the (chunk × planes × dim) float64
# intermediate stays ~4 MB and cache-resident — a fixed 4096-row chunk
# built 19 MB intermediates at dim 64 × 12 planes and thrashed (measured
# 15× slower off-Spark); the adaptive size keeps the bound at any
# plane-count/dim combination
def _kernel_chunk(width: int) -> int:
    """Rows per kernel call for a per-row intermediate of ``width`` doubles."""
    return max(64, 512 * 1024 // max(width, 1))


_KERNEL_CHUNK = 1024  # pairwise (1-D intermediate) kernels


def _rows_matrix(vals: list) -> np.ndarray:
    """Stack same-length vector rows into an (n, dim) float64 matrix.
    Arrow hands list<double> columns to the UDF as a Series of float64
    ndarrays, so np.stack is zero-conversion; np.asarray covers plain-list
    rows from object Series."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in vals])


def _cosine_pairs_udf():
    """Vectorized Arrow UDF: (array<double>, array<double>) → cosine,
    bit-exact with _dot(a,b)/(_norm(a)*_norm(b)) on every defined input.
    NULL on either side → NULL, and length-mismatched pairs → NULL
    (zip_with pads the shorter array with nulls, which nulls the HOF
    fold) — the reference fold's null semantics exactly. Zero-norm
    vectors → NULL (see the inline note: the ANSI HOF would throw).
    Same-length groups are batched per length so mixed-dim corpora still
    vectorize."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cos(va, vb):
        a_list, b_list = va.values, vb.values
        n = len(a_list)
        vals = np.full(n, np.nan)
        nulls = np.ones(n, dtype=bool)
        by_len: dict[int, list[int]] = {}
        for i, (a, b) in enumerate(zip(a_list, b_list)):
            if a is not None and b is not None and len(a) == len(b):
                by_len.setdefault(len(a), []).append(i)
        for idx in by_len.values():
            ma = _rows_matrix([a_list[i] for i in idx])
            mb = _rows_matrix([b_list[i] for i in idx])
            dots = _ltr_sum(ma * mb)
            na = np.sqrt(_ltr_sum(ma * ma))
            nb = np.sqrt(_ltr_sum(mb * mb))
            denom = na * nb
            ok = denom != 0.0
            # zero-norm vectors → NULL (the try_divide contract), never
            # NaN and never an error: NaN compares greater than any
            # double (it would PASS >= threshold filters and sort FIRST
            # in top-k), and Spark 4's default ANSI mode makes the raw
            # HOF division THROW divideByZeroError — one zero vector in
            # a crawl must not kill the job (pinned in test_round4_ops)
            res = np.full(len(idx), np.nan)
            np.divide(dots, denom, out=res, where=ok)
            vals[idx] = res
            nulls[idx] = ~ok
        if nulls.any():
            return pd.Series(
                [None if m else float(v) for m, v in zip(nulls, vals)], dtype=object
            )
        return pd.Series(vals)

    cos.__annotations__ = {"va": pd.Series, "vb": pd.Series, "return": pd.Series}
    return pandas_udf(cos, "double")


def cosine_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to the query vector (excluded from
    results). Single scan + broadcast of the 1-row query + top-k via
    orderBy/limit (Spark plans TakeOrderedAndProject — no full sort); the
    cosine itself is one Arrow-batch numpy kernel per task."""
    q = df.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )
    v = F.col(vec_col).cast("array<double>")
    cos = _cosine_pairs_udf()
    scored = (
        df.where(F.col(id_col) != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(F.col(id_col), cos(v, F.col("qv")).alias("cosine"))
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


def plane_matrix(n_planes: int, dim: int, seed: int = 42) -> np.ndarray:
    """The (n_planes, dim) hyperplane matrix as float64 — rebuilt from
    plane_component on every executor (a few KB; no broadcast needed)."""
    return np.array(
        [[plane_component(b, i, seed) for i in range(dim)] for b in range(n_planes)]
    )


def _bucket_udf(n_planes: int, dim: int, seed: int):
    """Vectorized Arrow UDF: embedding array<double> → LSH bucket (long).
    Bit b = sign(v · h_b), folded left-to-right — bit-exact with the HOF
    reference (_hyperplane_buckets_hof). NULL/odd-length vectors get
    bucket 0, matching the HOF's when(null > 0)→otherwise(0) bits."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # built once per UDF construction and shipped in the closure (a few
    # KB) — rebuilding inside the body would re-run the n_planes×dim
    # interpreted plane_component loop on every Arrow batch
    planes = plane_matrix(n_planes, dim, seed)
    weights = np.int64(1) << np.arange(n_planes, dtype=np.int64)

    def bucket(vs):
        vlist = vs.values
        out = np.zeros(len(vlist), dtype=np.int64)
        idx = [i for i, v in enumerate(vlist) if v is not None and len(v) == dim]
        step = _kernel_chunk(n_planes * dim)
        for lo in range(0, len(idx), step):
            chunk = idx[lo : lo + step]
            m = _rows_matrix([vlist[i] for i in chunk])
            dots = _ltr_sum(m[:, None, :] * planes[None, :, :])
            out[chunk] = ((dots > 0).astype(np.int64) * weights).sum(axis=1)
        return pd.Series(out)

    bucket.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(bucket, "long")


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
    any executor without shipping plane matrices. One numpy matmul-shaped
    kernel per Arrow batch (see module doc for the codegen rationale)."""
    v = F.col(vec_col).cast("array<double>")
    bucket = _bucket_udf(n_planes, dim, seed)
    return df.select(F.col(id_col), bucket(v).alias("bucket"))


def _hyperplane_buckets_hof(
    df: DataFrame,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Interpreted HOF form of hyperplane_buckets — kept ONLY as the
    bit-exactness reference for tests (never on the query path)."""
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


def _cell_udf(pivmat: np.ndarray, pnorms: np.ndarray):
    """Vectorized Arrow UDF: embedding → IVF cell = argmax-cosine pivot
    index (ties → lowest index, numpy argmax's first-max rule — identical
    to the (cosine, -index) lexicographic max of the reference replay).
    Zero-norm vectors get sentinel cell -1 (never probed) in BOTH this
    kernel and the Python oracle; NULL/odd-length vectors likewise."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    dim = pivmat.shape[1]

    def cell(vs):
        vlist = vs.values
        out = np.full(len(vlist), -1, dtype=np.int32)
        idx = [i for i, v in enumerate(vlist) if v is not None and len(v) == dim]
        step = _kernel_chunk(pivmat.shape[0] * dim)
        for lo in range(0, len(idx), step):
            chunk = idx[lo : lo + step]
            m = _rows_matrix([vlist[i] for i in chunk])
            dots = _ltr_sum(m[:, None, :] * pivmat[None, :, :])
            vnorm = np.sqrt(_ltr_sum(m * m))
            ok = vnorm > 0.0
            cells = np.full(len(chunk), -1, dtype=np.int32)
            if ok.any():
                cos = dots[ok] / (vnorm[ok, None] * pnorms[None, :])
                cells[ok] = np.argmax(cos, axis=1).astype(np.int32)
            out[chunk] = cells
        return pd.Series(out)

    cell.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(cell, "int")


def ivf_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_pivots: int = 16,
    nprobe: int = 4,
    max_cell: int | None = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pivot_ids: list[int] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the coarse-
    quantizer alternative to hyperplane LSH.

    Pivot selection is pluggable: the default (``pivot_ids=None``) takes the
    ``n_pivots`` lowest-id vectors — deterministic, so the whole index is
    replayable off-Spark bit-exactly (at crawl scale lowest-id ≈ an
    arbitrary sample of the shard order). Pass ``pivot_ids`` for a sampled
    or trained pivot set (e.g. deterministic_pivot_ids for a hash-spread
    sample with better cell balance); the oracle replays any explicit list
    the same way. Every distance is a left-to-right double fold, identical
    in the numpy kernel (cumsum scan), in a plain Python loop, and in
    DuckDB list_sum. Each vector joins the cell of its highest-cosine pivot
    (ties → lowest pivot index); zero-norm vectors get sentinel cell -1
    (never probed — documented oracle-aligned semantics); the query probes
    its ``nprobe`` nearest cells; only those cells get the exact scorer,
    capped at ``max_cell`` lowest ids per cell (mirroring the LSH family's
    bucket caps).

    Scale shape: the pivot table is a driver-side collect of n_pivots rows
    (bounded, documented); assignment is one numpy kernel per Arrow batch
    (n_pivots dot products/row — no shuffle); candidate selection is a
    filter on the cell id, which also makes cell a natural write-partition
    key for repeated queries (partition pruning replaces the filter scan).
    Expected scan fraction ≈ nprobe / n_pivots; pick n_pivots ≈ sqrt(N) for
    the classic IVF balance at crawl scale.

    Raises ValueError when ``query_vec_id`` is absent, the query vector has
    zero norm, any pivot has zero norm, or a requested pivot id is missing."""
    vd = F.col(vec_col).cast("array<double>")
    if pivot_ids is None:
        piv_rows = (
            df.orderBy(id_col)
            .limit(n_pivots)
            .select(id_col, vd.alias("v"))
            .collect()
        )
    else:
        n_pivots = len(pivot_ids)
        got = {
            r[0]: r[1]
            for r in df.where(F.col(id_col).isin(list(pivot_ids)))
            .select(id_col, vd.alias("v"))
            .collect()
        }
        missing = [p for p in pivot_ids if p not in got]
        if missing:
            raise ValueError(f"ivf_topk: pivot ids not in the table: {missing}")
        piv_rows = [(p, got[p]) for p in pivot_ids]
    pivots = [(r[0], list(r[1])) for r in piv_rows]

    def py_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    import math

    piv_norms = [math.sqrt(py_dot(v, v)) for _, v in pivots]
    if any(n == 0.0 for n in piv_norms):
        bad = [pid for (pid, _), n in zip(pivots, piv_norms) if n == 0.0]
        raise ValueError(f"ivf_topk: zero-norm pivot vectors: {bad}")

    pivmat = np.array([v for _, v in pivots], dtype=np.float64)
    cell = _cell_udf(pivmat, np.array(piv_norms, dtype=np.float64))
    assigned = df.select(F.col(id_col), cell(vd).alias("cell"))

    # query-side probe selection in plain Python — same IEEE doubles, same
    # fold order, so it agrees bit-exactly with the kernel's assignment
    qrow = df.where(F.col(id_col) == query_vec_id).select(vd.alias("q")).head()
    if qrow is None or qrow[0] is None:
        raise ValueError(
            f"ivf_topk: query_vec_id {query_vec_id} not found in {id_col}"
        )
    qv = [float(x) for x in qrow[0]]
    qnorm = math.sqrt(py_dot(qv, qv))
    if qnorm == 0.0:
        raise ValueError("ivf_topk: query vector has zero norm — cosine undefined")
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


def deterministic_pivot_ids(
    df: DataFrame, n_pivots: int, id_col: str = "vec_id"
) -> list[int]:
    """A hash-spread deterministic pivot sample: the n_pivots ids with the
    lowest md5(id) — engine-portable (same rows on any cluster/partitioning)
    and, unlike lowest-id, uncorrelated with insertion order, so cells stay
    balanced when ids encode crawl time. One TakeOrderedAndProject scan."""
    rows = (
        df.select(F.col(id_col), F.md5(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h", id_col)
        .limit(n_pivots)
        .collect()
    )
    return [r[0] for r in rows]


def _quantize_udf(dim: int):
    """Vectorized Arrow UDF: embedding array<double> → int8-style codes
    (array<int>, values in [-127, 127]) with per-vector max-abs scaling:
    q_i = floor((v_i * 127.0) / max_abs). All-zero vectors quantize to
    all-zero codes (no divide). Every step is an exact double op (abs,
    max, one multiply, one divide, floor) so an off-Spark oracle replays
    the codes bit-identically."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def quant(vs):
        vals = vs.values
        out = []
        for v in vals:
            if v is None or len(v) != dim:
                out.append(None)
                continue
            a = np.asarray(v, dtype=np.float64)
            m = np.abs(a).max() if len(a) else 0.0
            if m == 0.0:
                out.append(np.zeros(len(a), dtype=np.int32))
            else:
                out.append(np.floor((a * 127.0) / m).astype(np.int32))
        return pd.Series(out)

    quant.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    return pandas_udf(quant, "array<int>")


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Scalar (int8-range) quantization of the embedding column — the
    standard 4× memory/IO compression for a crawl-scale vector store
    (float32 → int8 codes + an implicit per-vector scale). Returns
    (id, qcodes: array<int>). Map-side kernel, no shuffle; deterministic
    and engine-replayable (see _quantize_udf)."""
    v = F.col(vec_col).cast("array<double>")
    q = _quantize_udf(dim)
    return df.select(F.col(id_col), q(v).alias("qcodes"))


def ann_topk_int8(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k by INTEGER dot product over int8-quantized codes
    — the cheap first-pass scorer of a quantized vector store (exact
    integer arithmetic: no float summation-order concerns at all, so the
    score itself is hash-stable and the oracle is plain SQL). Returns
    (rank, vec_id, qdot); ties rank by lowest id. At crawl scale the
    quantized scan reads a quarter of the bytes and the integer dot
    vectorizes; re-rank the top candidates with the exact float cosine
    when recall matters (ann_topk_int8_rerank below).

    Top-k is orderBy/limit (TakeOrderedAndProject: per-partition heaps,
    k rows to the driver-side merge — NOT a global-window row_number,
    which would sort every scored row in one task; plan-asserted in
    tests/test_plans.py). Ranks are then attached by a window over the
    k survivors only — that post-limit window is O(k), free.

    Raises ValueError when ``query_vec_id`` is absent (parity with
    ivf_topk; a silent empty frame hides a caller typo). Like ivf_topk's
    pivot/query fetch, this costs one bounded driver-side head() at
    build time — a pushed-filter scan (PushedFilters on the id) that
    prunes to the matching row group when ids are sorted/partitioned;
    the eager job is the price of failing fast on a bad id rather than
    returning a silently empty result at action time."""
    from pyspark.sql import Window

    codes = quantize_embeddings(df, id_col, vec_col, dim)
    qhead = codes.where(F.col(id_col) == query_vec_id).select("qcodes").head()
    if qhead is None or qhead[0] is None:
        raise ValueError(
            f"ann_topk_int8: query_vec_id {query_vec_id} not found in {id_col}"
        )
    # inline the k-byte query code array as a literal — no crossJoin, and
    # the codes are exact ints so the collected values are bit-identical
    qq = F.array(*[F.lit(int(x)) for x in qhead[0]])
    # integer zip-dot: element products summed as longs — exact, so a HOF
    # fold is fine here (no rounding to match; and the arrays are int)
    qdot = F.aggregate(
        F.zip_with(
            F.col("qcodes"),
            qq,
            lambda a, b: (a.cast("long") * b.cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    topk = (
        codes.where(F.col(id_col) != query_vec_id)
        .select(F.col(id_col), qdot.alias("qdot"))
        .orderBy(F.desc("qdot"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("qdot"), F.asc(id_col))
    return topk.select(
        F.row_number().over(w).cast("int").alias("rank"), id_col, "qdot"
    )


def ann_topk_int8_rerank(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    rerank_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """The production shape of a quantized vector store: a cheap int8
    integer-dot FIRST pass keeps ``rerank_factor × k`` candidates (reading
    quarter-width codes, exact integer math), then ONLY those survivors
    get the exact float cosine and the final top-k order — so the
    expensive full-precision scorer touches O(k) rows, not the corpus.
    Returns (rank, vec_id) ranked by exact cosine (ties → lowest id).

    Both passes are TakeOrderedAndProject (per-partition heaps), and the
    second runs over ≤ rerank_factor×k rows joined back to the vector
    table by a broadcast-able semi join. Emits (rank, id) only — rank is
    hash-stable across engines, raw cosine doubles are not."""
    survivors = ann_topk_int8(
        df, query_vec_id, rerank_factor * k, id_col, vec_col, dim
    ).select(id_col)
    restricted = df.join(survivors, id_col, "left_semi").unionByName(
        df.where(F.col(id_col) == query_vec_id)
    )
    from pyspark.sql import Window

    topk = cosine_topk(restricted, query_vec_id, k, id_col, vec_col)
    w = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    return topk.select(
        F.row_number().over(w).cast("int").alias("rank"), id_col
    )


def ann_topk_int8_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    qid_col: str | None = None,
) -> DataFrame:
    """Batched quantized ANN — production retrieval scores a query TABLE,
    not one vector: every ANN endpoint above takes a single id; this one
    takes a ``queries`` DataFrame (qid, vector) and returns
    (query_id, rank, vec_id, qdot) — per-query top-k by exact integer
    dot over int8 codes, ties broken by lowest id.

    ONE job for N queries (never a per-query Spark loop): the query
    codes are quantized with the SAME kernel as the corpus, collected
    once (bounded — a retrieval batch is ≤10^5 rows × dim ints; raise
    past driver budget, don't spill), and closed over a mapInPandas
    kernel that scores each Arrow batch of corpus codes against ALL
    queries with a single int64 matmul (B×D · D×Q), emitting only each
    query's per-batch top-k. The final per-query selection is a window
    over ≤ n_batches × k candidate rows per query — bounded by the scan
    parallelism, never by corpus size; no corpus-wide sort anywhere.
    The matmul is cache-blocked so the B×Q score block stays ≲4 MB
    (same budget as the other Arrow kernels).

    Self-match policy: a corpus row whose id equals the query's id is
    excluded (the single-query endpoints' semantics); use disjoint id
    spaces when queries are not corpus rows. Rows whose codes are NULL
    (NULL vector / wrong dim) never score. Scores are exact integers, so
    the result is hash-stable and an off-Spark oracle replays it from
    the same quantization math."""
    import pandas as pd
    from pyspark.sql import Window

    qid_col = qid_col or id_col
    qrows = quantize_embeddings(queries, qid_col, vec_col, dim).collect()
    if not qrows:
        raise ValueError("ann_topk_int8_batch: queries frame is empty")
    bad = [r[0] for r in qrows if r[1] is None]
    if bad:
        raise ValueError(
            f"ann_topk_int8_batch: unquantizable query vectors (NULL or "
            f"wrong dim) for ids {bad[:5]}"
        )
    qids = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    qmat = np.asarray([list(r[1]) for r in qrows], dtype=np.int64)  # Q×D

    codes = quantize_embeddings(df, id_col, vec_col, dim)
    out_schema = f"query_id long, {id_col} long, qdot long"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids_all = pdf[id_col].to_numpy()
            code_vals = pdf["qcodes"].values
            # pd.notna guard: a NULL id arrives as float64 NaN here, and
            # astype(int64) would silently mint INT64_MIN as a row id —
            # the single-query endpoints drop NULL-id rows via SQL null
            # comparison, so the batch kernel must too (review r6 #3)
            keep = [
                i
                for i, c in enumerate(code_vals)
                if c is not None and pd.notna(ids_all[i])
            ]
            if not keep:
                continue
            vids = ids_all[keep].astype(np.int64)
            mat = np.vstack(
                [np.asarray(code_vals[i], dtype=np.int64) for i in keep]
            )
            out_q, out_v, out_s = [], [], []
            step = max(_kernel_chunk(len(qids)), 1)
            for lo in range(0, len(vids), step):
                scores = mat[lo : lo + step] @ qmat.T  # (chunk, Q)
                cvids = vids[lo : lo + step]
                for j in range(len(qids)):
                    sj = scores[:, j]
                    mask = cvids != qids[j]
                    vj, sj = cvids[mask], sj[mask]
                    if vj.size == 0:
                        continue
                    kk = min(k, vj.size)
                    order = np.lexsort((vj, -sj))[:kk]
                    out_q.append(np.full(kk, qids[j], dtype=np.int64))
                    out_v.append(vj[order])
                    out_s.append(sj[order])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        id_col: np.concatenate(out_v),
                        "qdot": np.concatenate(out_s),
                    }
                )

    cand = codes.mapInPandas(gen, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc(id_col))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "qdot")
    )


def ann_topk_lsh_batch(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probe_hamming: int = 1,
    max_bucket: int | None = 1024,
    qid_col: str | None = None,
) -> DataFrame:
    """Batched hyperplane-LSH ANN: the bucket-join generalization of
    ann_topk_lsh to a queries DataFrame. Returns (query_id, rank,
    vec_id) per query, ranked by exact cosine over candidates only.

    Shape: corpus buckets once (map-side kernel); each query expands to
    its bucket plus hamming-``probe_hamming`` probes (explode over
    n_planes+1 rows per query — tiny); probes BROADCAST-join the corpus
    bucket table on the bucket id (an equi-join, never a crossJoin
    against the corpus); per-(query, bucket) candidates are capped at
    the ``max_bucket`` lowest ids (deterministic, replayable — window
    partitions bounded by one bucket); only capped candidates get the
    exact cosine (one Arrow kernel over candidate pairs, the query
    vectors riding in via a broadcast join on query_id). Final top-k is
    a window over ≤ (n_planes+1)×max_bucket rows per query. One job for
    N queries; every stage's task bound is independent of corpus size."""
    from pyspark.sql import Window

    qid_col = qid_col or id_col
    qb = hyperplane_buckets(queries, n_planes, qid_col, vec_col, dim).select(
        F.col(qid_col).alias("query_id"), F.col("bucket").alias("qbucket")
    )
    probes = [F.col("qbucket")] + [
        F.col("qbucket").bitwiseXOR(F.lit(1 << i))
        for i in range(n_planes if probe_hamming >= 1 else 0)
    ]
    qprobes = qb.select(
        "query_id", F.explode(F.array(*probes)).alias("bucket")
    ).dropDuplicates(["query_id", "bucket"])
    buckets = hyperplane_buckets(df, n_planes, id_col, vec_col, dim)
    cands = (
        buckets.join(F.broadcast(qprobes), "bucket")
        .where(F.col(id_col) != F.col("query_id"))
    )
    if max_bucket is not None:
        w_cap = Window.partitionBy("query_id", "bucket").orderBy(id_col)
        cands = (
            cands.withColumn("_rn", F.row_number().over(w_cap))
            .where(F.col("_rn") <= max_bucket)
        )
    cands = cands.select("query_id", id_col)
    qvecs = queries.select(
        F.col(qid_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    v = F.col(vec_col).cast("array<double>")
    cos = _cosine_pairs_udf()
    scored = (
        cands.join(df.select(id_col, vec_col), id_col)
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", F.col(id_col), cos(v, F.col("qv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", id_col)
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    probe_hamming: int = 1,
    max_bucket: int | None = 256,
    log_dropped: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs at corpus scale.

    Candidate generation is a bucket join (never all-pairs): each surviving
    vector's LSH bucket is expanded to itself plus its hamming-
    ``probe_hamming`` neighbors (multi-probe); probes join the grouped
    bucket membership and pairs are emitted MAP-SIDE from each bucket's id
    array (no row-level self-join). Only candidates get the exact cosine
    test (>= threshold) — one numpy kernel per Arrow batch of pairs.

    Buckets larger than ``max_bucket`` are dropped entirely (default-on,
    mirroring minhash_near_dup_pairs): candidate volume is O(Σ m_bucket²),
    so one hot bucket — near-identical boilerplate pages, zero vectors —
    otherwise turns the join quadratic at crawl scale. With the cap,
    candidates are bounded by (n_planes+1) × max_bucket per vector by
    construction. ``log_dropped`` (default-ON) counts dropped buckets as an
    observed metric folded into the SAME pass — zero extra jobs — and warns
    asynchronously when the count is non-zero (see dedup._observe_dropped).

    Scale sizing: expected bucket population is N / 2**n_planes — pick
    n_planes ≈ log2(N / target_bucket). The default 6 (64 buckets) is sized
    for the ~10^3-vector test corpus; a 10^12-vector crawl needs n_planes ≈
    30–40, keeping n_planes ≲ dim for the bits to stay discriminative."""
    from .dedup import _observe_dropped

    buckets = hyperplane_buckets(df, n_planes, id_col, vec_col, dim)
    grouped = buckets.groupBy("bucket").agg(F.collect_list(id_col).alias("ids"))
    if max_bucket is not None:
        if log_dropped:
            grouped = _observe_dropped(grouped, max_bucket, "embedding_near_dups")
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
    # explode first, filter after: the per-element F.filter lambda runs
    # interpreted (never codegen) over every probed bucket array; the
    # generator + codegen'd WHERE computes the same pair set with the
    # comparison compiled.
    cand = (
        probes.join(grouped, F.col("probe") == F.col("bucket"))
        .select(
            F.col("pid").alias("id_a"),
            F.explode(F.col("ids")).alias("id_b"),
        )
        .where(F.col("id_b") > F.col("id_a"))
        .distinct()
    )
    v = df.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
    va = v.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"))
    cos = _cosine_pairs_udf()
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .where(cos(F.col("va"), F.col("vb")) >= threshold)
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
