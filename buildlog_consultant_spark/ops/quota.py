"""Per-key quotas — the domain/source budgeting pass of a web-scale
training-data pipeline (cap each domain's contribution so boilerplate-heavy
hosts don't dominate the corpus; CCNet/RefinedWeb-style source balancing).

The selection contract is EXACT and engine-portable: per key, keep the
``n_keep`` rows with the lowest (md5(id), id) — the same hash-spread order
deterministic_sample uses, so the kept set is identical on any cluster,
any partitioning, any engine, and a plain SQL oracle replays it. NULL
handling follows the repo policy: a NULL id hashes as '' (like the
NULL-text coalesce in text.py/dedup.py) and NULL keys form a normal
quota group of their own (the join is null-safe) — NULL rows are
budgeted, never silently dropped.

The scale problem is the same one quality_quantiles solved for bounded
domains: the naive implementation (`row_number` over a per-key window)
sorts each key's ENTIRE row set in one task — a key holding 50% of a
10^12-row corpus is a single-task sort. This is the two-pass nearest-rank
selection generalized to an UNBOUNDED rank target:

  pass 1: bucket every row by a hash prefix (md5 is uniform, so buckets
          are balanced) and hash-aggregate per-(key, bucket) counts —
          the only operator that sees corpus rows, with map-side combine;
  pass 2: a cumulative window over the tiny (keys × buckets) count table
          locates each key's quota boundary; rows in buckets past the
          boundary are FILTERED map-side (the broadcast join adds each
          bucket's keep-count), and only the surviving candidate rows —
          at most ~n_keep + one bucket's worth per key — are shuffled
          and ranked, each window partition bounded by a single bucket
          (pick ``bucket_hex_chars`` so key_rows/16^chars fits a task:
          2 → 256 buckets for moderate corpora, 4 → 65536 at crawl
          scale). One corpus scan, no corpus-sized shuffle.

Because the bucket id is a PREFIX of the hash, (bucket, hash, id) order
equals (hash, id) order — the bucketed selection is bit-identical to the
naive global ranking (pinned by an equivalence test, including skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_hash(id_col: str):
    """THE selection-order hash: md5(coalesce(cast(id as string), '')).
    Single-sourced — the NULL-as-'' policy and the exact expression are
    load-bearing for every SQL oracle's replay; the ordering tiebreak is
    (this hash, id), so ids must be unique with at most ONE NULL id per
    selection scope (two NULL ids tie on both keys and the kept set
    under a mid-tie budget/quota cut would be partitioning-dependent)."""
    return F.md5(F.coalesce(F.col(id_col).cast("string"), F.lit("")))


def _bucket_meta_join(d: DataFrame, key_col: str) -> DataFrame:
    """Shared scaffolding of the bucketed per-key rank family
    (key_quota, hash_split_per_key): given ``d`` carrying the _h/_b
    hash+prefix columns, hash-aggregate per-(key, bucket) counts, and
    broadcast-join back per row: _cnt (bucket size), _before (rows of
    the key in EARLIER buckets), _n (key total). Two load-bearing
    subtleties live here ONCE: the join is null-safe on the key (a
    plain equi-join NULL-rejects and would silently drop NULL-key rows
    from their stratum/quota), and because _b is a hash PREFIX,
    _before + in-bucket rank equals the global per-key (hash, id)
    rank exactly."""
    counts = d.groupBy(key_col, "_b").agg(F.count("*").alias("_cnt"))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    meta = counts.select(
        F.col(key_col).alias("_mk"),
        F.col("_b").alias("_mb"),
        F.col("_cnt"),
        (F.sum("_cnt").over(w_cum) - F.col("_cnt")).alias("_before"),
        F.sum("_cnt").over(Window.partitionBy(key_col)).alias("_n"),
    )
    return d.join(
        F.broadcast(meta),
        F.col(key_col).eqNullSafe(F.col("_mk")) & (F.col("_b") == F.col("_mb")),
    ).drop("_mk", "_mb")


def key_quota(
    df: DataFrame,
    n_keep: int,
    key_col: str = "source",
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Keep at most ``n_keep`` rows per ``key_col``, selected as the
    lowest (md5(coalesce(id,'')), id) — deterministic, rerun-stable,
    oracle-replayable; NULL keys are their own quota group (null-safe
    join), NULL ids hash as ''. Returns the input rows (original
    columns) that survive the quota.

    Shuffle shape: one hash-agg shuffle keyed on (key, bucket) for the
    counts; one broadcast of the (keys × buckets) boundary table back
    onto the scan, which FILTERS past-boundary rows map-side; one
    shuffle+rank of only the surviving candidates (≈ n_keep + one
    bucket's remainder per key), each window partition bounded by one
    bucket's rows. ONE pass over corpus rows besides the count agg; no
    task ever sorts a whole key."""
    if n_keep <= 0:
        return df.limit(0)
    h = _order_hash(id_col)
    b = F.substring(h, 1, bucket_hex_chars)
    d = df.withColumn("_h", h).withColumn("_b", b)
    dd = _bucket_meta_join(d, key_col)
    # rows of this bucket to keep: clamp(n_keep - rows_before_bucket)
    kb = F.greatest(
        F.lit(0),
        F.least(F.col("_cnt"), F.lit(n_keep) - F.col("_before")),
    )
    dd = dd.withColumn("_kb", kb)
    # candidates = rows whose bucket keeps anything; ranking them all is
    # cheap (each window partition ≤ one bucket, and full buckets rank
    # trivially) and keeps this a SINGLE branch — the earlier
    # full-union-partial formulation scanned and md5'd the corpus twice
    w_rank = Window.partitionBy(key_col, "_b").orderBy("_h", id_col)
    return (
        dd.where(F.col("_kb") > 0)
        .withColumn("_rn", F.row_number().over(w_rank))
        .where(F.col("_rn") <= F.col("_kb"))
        .drop("_rn", "_h", "_b", "_kb", "_cnt", "_before", "_n")
    )


def token_budget_sample(
    df: DataFrame,
    max_tokens: int,
    weight_col,
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Deterministic token-budgeted corpus sample — the mixture-building
    primitive ("give me ≈2B tokens of this source"): walk the corpus in
    (md5(id), id) hash order and keep the longest prefix whose cumulative
    ``weight_col`` (token counts) stays ≤ ``max_tokens``, plus nothing
    after it. Hash order makes the kept set independent of partitioning
    and engine (rerun-stable, oracle-replayable), and a prefix rule means
    growing the budget only ADDS documents — the property incremental
    mixture rebuilds need.

    Scale shape = key_quota's two-pass technique with a SUM instead of a
    COUNT: hash-prefix buckets → one hash-agg (bucket, sum(weight), and
    per-bucket rows) → cumulative window over the tiny bucket table
    locates the boundary bucket; whole buckets before it are kept with
    no ranking, and only the boundary bucket's rows are shuffled for the
    exact running-sum cut (a window over ~corpus/16^chars rows). NULL
    ids hash as '' (repo policy); NULL weights count 0.

    Exactness note: the cut is the classic prefix rule — a doc is kept
    iff cum_weight_through_it ≤ max_tokens — so one oversized document
    larger than the whole budget is simply skipped-over-nothing (the
    prefix ends before it).

    Weight contract: NON-NEGATIVE INTEGER weights (token/char counts).
    The column is cast to long, so a fractional weight must be rounded
    by the CALLER — an SQL oracle sums the raw column and a silent
    per-row truncation here would diverge; negative weights make the
    running sum non-monotone, which breaks both the bucketed/naive
    equivalence and the prefix-monotone property, and are unsupported."""
    # only a NEGATIVE budget is trivially empty: at budget exactly 0 the
    # prefix rule still keeps leading ZERO-weight docs (cum == 0 <= 0),
    # and the normal bucketed path handles that case correctly — an
    # early-empty return here diverged from the naive oracle
    if max_tokens < 0:
        return df.limit(0)
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = _order_hash(id_col)
    b = F.substring(h, 1, bucket_hex_chars)
    d = df.withColumn("_w8", F.coalesce(w_expr.cast("long"), F.lit(0))).withColumn(
        "_h", h
    ).withColumn("_b", b)

    buckets = d.groupBy("_b").agg(F.sum("_w8").alias("_bw"))
    w_cum = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # _before = budget already spent by earlier buckets; the window runs
    # over ≤ 16^chars rows (the bucket table), never corpus rows
    meta = buckets.select(
        F.col("_b").alias("_mb"),
        (F.sum("_bw").over(w_cum) - F.col("_bw")).alias("_before"),
        F.col("_bw"),
    )
    dd = d.join(F.broadcast(meta), F.col("_b") == F.col("_mb")).drop("_mb")
    keep_full = dd.where(F.col("_before") + F.col("_bw") <= max_tokens)
    # <= (not <): a bucket whose predecessors exactly exhaust the budget
    # can still contribute ZERO-weight docs under the prefix rule
    # (cum == max_tokens), and the oracle's naive running-sum keeps them
    boundary = dd.where(
        (F.col("_before") <= max_tokens)
        & (F.col("_before") + F.col("_bw") > max_tokens)
    )
    w_run = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep_boundary = boundary.withColumn(
        "_cum", F.sum("_w8").over(w_run)
    ).where(F.col("_before") + F.col("_cum") <= max_tokens).drop("_cum")
    drop_cols = ("_w8", "_h", "_b", "_before", "_bw")
    return keep_full.unionByName(keep_boundary).drop(*drop_cols)


def token_budget_per_key(
    df: DataFrame,
    max_tokens: int,
    weight_col,
    key_col: str = "source",
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Per-key token budget — the REAL mixture primitive ("≤ B tokens per
    SOURCE"): within each ``key_col`` group independently, keep the longest
    (md5(id), id)-hash-ordered prefix whose cumulative ``weight_col`` stays
    ≤ ``max_tokens``. The composition of key_quota (per-key scope) and
    token_budget_sample (SUM boundary) the domain-balancing pass of a
    crawl pipeline needs: a boilerplate-heavy host contributes at most B
    tokens no matter how many documents it has.

    Scale shape is token_budget_sample's two-pass with every window
    PARTITIONED BY the key: one hash-agg over (key, bucket) sums — the
    only operator touching corpus rows — a cumulative window over the
    tiny (keys × ≤16^chars buckets) table, a broadcast of that boundary
    table back onto the scan, and an exact running-sum window over ONLY
    each key's boundary bucket (per-task work bounded by one bucket of
    one key, independent of key skew). NULL keys are their own budget
    group (null-safe join); NULL ids hash as ''; NULL weights count 0;
    the weight contract (non-negative integers) is token_budget_sample's.

    Same prefix-monotone property per key: growing the budget only ADDS
    documents within every source."""
    if max_tokens < 0:
        return df.limit(0)
    return _token_budget_keyed(
        df, F.lit(max_tokens).cast("long"), None,
        weight_col, key_col, id_col, bucket_hex_chars,
    )


def token_budget_from_table(
    df: DataFrame,
    budgets: DataFrame,
    weight_col,
    key_col: str = "source",
    id_col: str = "doc_id",
    budget_col: str = "budget",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """`token_budget_per_key` with a DIFFERENT budget per key, read from
    ``budgets`` (key_col, budget_col) — the shape a mixture pipeline
    actually needs: allocations differ per source. Semantics per key are
    exactly the scalar version's prefix rule at that key's budget
    (test-pinned: constant table == scalar endpoint bit-for-bit).

    Budget-table contract: one row per key (duplicate keys would
    double-join the scan — not checked, caller owns it). Keys ABSENT
    from the table, and keys whose budget is NULL, contribute NOTHING —
    the NULL budget propagates through every ``<=`` comparison as
    false — unlike budget 0, which still keeps leading zero-weight docs
    under the prefix rule. Negative budgets also keep nothing (the
    running sum is never negative). The join of budgets onto the bucket
    metadata is key-table-sized and broadcast with it; the corpus-side
    plan is unchanged from the scalar endpoint."""
    b_key = F.col(f"_bt.{key_col}")
    budget_expr = F.col(f"_bt.{budget_col}").cast("long")
    return _token_budget_keyed(
        df, budget_expr, budgets.alias("_bt"),
        weight_col, key_col, id_col, bucket_hex_chars, b_key,
    )


def _token_budget_keyed(
    df: DataFrame,
    budget_expr,
    budgets: DataFrame | None,
    weight_col,
    key_col: str,
    id_col: str,
    bucket_hex_chars: int,
    budgets_key=None,
) -> DataFrame:
    """Shared body of token_budget_per_key / token_budget_from_table.
    ``budget_expr`` must be resolvable on the bucket-metadata table —
    a literal, or a column of ``budgets`` (joined null-safely on the
    key; the left join leaves absent keys' budget NULL, which keeps
    nothing)."""
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = _order_hash(id_col)
    b = F.substring(h, 1, bucket_hex_chars)
    d = (
        df.withColumn("_w8", F.coalesce(w_expr.cast("long"), F.lit(0)))
        .withColumn("_h", h)
        .withColumn("_b", b)
    )

    buckets = d.groupBy(key_col, "_b").agg(F.sum("_w8").alias("_bw"))
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    meta = buckets.select(
        F.col(key_col).alias("_mk"),
        F.col("_b").alias("_mb"),
        (F.sum("_bw").over(w_cum) - F.col("_bw")).alias("_before"),
        F.col("_bw"),
    )
    if budgets is not None:
        meta = meta.join(
            budgets, F.col("_mk").eqNullSafe(budgets_key), "left"
        )
    meta = meta.select("_mk", "_mb", "_before", "_bw", budget_expr.alias("_budget"))
    # null-safe on the key (same reason as key_quota: a plain equi-join
    # would silently drop the NULL-key budget group)
    dd = d.join(
        F.broadcast(meta),
        F.col(key_col).eqNullSafe(F.col("_mk")) & (F.col("_b") == F.col("_mb")),
    ).drop("_mk", "_mb")
    limit = F.col("_budget")
    keep_full = dd.where(F.col("_before") + F.col("_bw") <= limit)
    boundary = dd.where(
        (F.col("_before") <= limit)
        & (F.col("_before") + F.col("_bw") > limit)
    )
    w_run = (
        Window.partitionBy(key_col, "_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep_boundary = boundary.withColumn(
        "_cum", F.sum("_w8").over(w_run)
    ).where(F.col("_before") + F.col("_cum") <= limit).drop("_cum")
    drop_cols = ("_w8", "_h", "_b", "_before", "_bw", "_budget")
    return keep_full.unionByName(keep_boundary).drop(*drop_cols)


def mixture_sample(
    df: DataFrame,
    budget: int,
    key_col: str = "source",
    weight_col="n_chars",
    id_col: str = "doc_id",
    weight_scale: int = 1_000_000,
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """End-to-end temperature-scaled mixture sampling — the composition
    the two building blocks exist for: `mixture_allocations` turns a
    global token budget into exact per-source allocations (sqrt-damped,
    largest-remainder), and `token_budget_from_table` keeps each
    source's (md5(id), id)-hash-ordered prefix under ITS allocation.
    Returns the sampled corpus rows (original schema).

    Two corpus scans by construction (one for per-source totals, one for
    the selection) — at crawl scale the totals scan is the cheap one
    (map-side partial agg over two columns; column pruning keeps text
    bytes out of it). The allocation table is #sources-sized and rides
    the broadcast the selection already does."""
    alloc = mixture_allocations(
        df, budget, key_col=key_col, weight_col=weight_col,
        weight_scale=weight_scale,
    ).select(key_col, F.col("allocation").alias("budget"))
    return token_budget_from_table(
        df, alloc, weight_col, key_col=key_col, id_col=id_col,
        bucket_hex_chars=bucket_hex_chars,
    )


def token_budget_per_key_naive(
    df: DataFrame,
    max_tokens: int,
    weight_col,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Single-window per-key running-sum formulation — equivalence
    reference for tests only (sorts each key's entire row set in one
    task; never on the query path)."""
    if max_tokens < 0:
        return df.limit(0)
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = (
        Window.partitionBy(key_col)
        .orderBy(_order_hash(id_col), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.coalesce(w_expr.cast("long"), F.lit(0))).over(w)
    return df.withColumn("_cum", cum).where(F.col("_cum") <= max_tokens).drop("_cum")


def with_global_cumsum(
    df: DataFrame,
    weight_col,
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
    out_col: str = "cum_weight",
) -> DataFrame:
    """EXACT global running sum of ``weight_col`` in (md5(id), id) hash
    order, computed WITHOUT a global sort — the fourth instance of the
    bucketed two-pass technique, this time emitting the cumulative value
    for EVERY row (token_budget_sample only needed it at the boundary):
    one (bucket) hash agg over corpus rows, a cumulative window over the
    tiny bucket table gives each bucket's prefix OFFSET (broadcast), and
    a running-sum window PARTITIONED BY BUCKET adds within-bucket order —
    offset + within-bucket sum = the exact global cumsum because the
    bucket id is a PREFIX of the ordering hash (order-compatible, same
    argument as key_quota). Every window partition is bounded by one
    bucket (~corpus/16^chars rows), so per-task work is independent of
    corpus size. NULL ids hash as ''; NULL weights count 0 (weight
    contract = token_budget_sample's: non-negative integers)."""
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    h = _order_hash(id_col)
    b = F.substring(h, 1, bucket_hex_chars)
    d = (
        df.withColumn("_w8", F.coalesce(w_expr.cast("long"), F.lit(0)))
        .withColumn("_h", h)
        .withColumn("_b", b)
    )
    buckets = d.groupBy("_b").agg(F.sum("_w8").alias("_bw"))
    w_cum = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    meta = buckets.select(
        F.col("_b").alias("_mb"),
        (F.sum("_bw").over(w_cum) - F.col("_bw")).alias("_off"),
    )
    w_run = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.join(F.broadcast(meta), F.col("_b") == F.col("_mb"))
        .withColumn(out_col, F.col("_off") + F.sum("_w8").over(w_run))
        .drop("_mb", "_off", "_w8", "_h", "_b")
    )


def with_sequence_bins(
    df: DataFrame,
    bin_tokens: int,
    weight_col,
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
) -> DataFrame:
    """Sequence-PACKING assignment — the concat-and-chop step of LLM
    pretraining data prep: lay every document out on one global token
    tape in deterministic (md5(id), id) hash order, then chop the tape
    into fixed ``bin_tokens``-sized training sequences. Adds:

      * ``bin_first`` / ``bin_last`` — the first/last sequence index the
        doc's tokens land in (a doc STRADDLES a boundary when they
        differ — exactly what packed pretraining batches do);
      * ``bin_offset`` — the doc's start position within ``bin_first``.

    Pure arithmetic over the exact global cumsum (with_global_cumsum —
    no global sort, windows bounded per hash bucket), so the assignment
    is engine-portable, rerun-stable, and SQL-replayable: start =
    cum - w, bin_first = start div L, bin_last = (cum - 1) div L (w > 0);
    zero-weight docs sit at a point: bin_first = bin_last = cum div L.
    A writer would repartition by sequence index and emit the packed
    sequences; the assignment is the shuffle-key-defining step."""
    if bin_tokens <= 0:
        raise ValueError(f"bin_tokens must be positive, got {bin_tokens}")
    w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w8 = F.coalesce(w_expr.cast("long"), F.lit(0))
    d = with_global_cumsum(df, weight_col, id_col, bucket_hex_chars)
    cum = F.col("cum_weight")
    # start == cum when w8 == 0, so bin_first and bin_offset need no
    # zero-weight branch; only bin_last does (a zero-weight doc sits at
    # the point cum, not at cum - 1)
    start = cum - w8
    L = F.lit(bin_tokens).cast("long")
    bin_first = _div(start, L)
    bin_last = F.when(w8 == 0, _div(cum, L)).otherwise(_div(cum - 1, L))
    return (
        d.withColumn("bin_first", bin_first.cast("long"))
        .withColumn("bin_last", bin_last.cast("long"))
        .withColumn("bin_offset", (start % L).cast("long"))
    )


def _div(a, b):
    """EXACT integer floor division on non-negative longs. a - a%b is
    exactly divisible by b, and the division runs in decimal(38,0) — a
    double division here would round past 2^53 and shift bin boundaries
    by one at crawl-scale tape lengths (the oracle's integer // would
    not), which is precisely the scale this module claims."""
    exact = (a - (a % b)).cast("decimal(38,0)")
    return (exact / b.cast("decimal(38,0)")).cast("long")


def mixture_allocations(
    df: DataFrame,
    budget: int,
    key_col: str = "source",
    weight_col=None,
    weight_scale: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source-mixing allocations — the data-mixing
    step of LLM pretraining prep (Pile/CCNet-style: sample sources
    proportionally to a DAMPED size so one giant crawl source doesn't
    drown the small curated ones). Given per-key token totals t_k, give
    each key an integer token allocation a_k with

        a_k  ∝  sqrt(t_k)        (temperature alpha = 1/2)
        sum(a_k) == budget       exactly (largest-remainder method)

    Everything after the corpus-touching aggregate is EXACT integer /
    IEEE-deterministic arithmetic, so the allocation table is engine-
    portable and SQL-replayable:

      * damped weight w_k = floor(sqrt(double(t_k)) * weight_scale) as a
        LONG — IEEE-754 sqrt is correctly rounded in every engine (JVM
        strictfp sqrt, C sqrt, numpy), the single multiply rounds once,
        floor is exact: bit-identical in Spark / DuckDB / Python. alpha
        is fixed at 1/2 BECAUSE sqrt is the one power with a correctly-
        rounded guarantee (pow(x, a) is not), which is what makes the
        contract exact rather than approximate;
      * base_k = (budget * w_k) div W and remainder r_k = (budget * w_k)
        mod W with W = sum(w_k), computed in decimal(38,0) — exact far
        past 2^63 (budget 1e15 × w_k 1e15 = 1e30 « 1e38);
      * the budget - sum(base_k) leftover units (< #keys) go one each to
        the keys with the largest r_k, ties broken by key ASC with NULLS
        FIRST (Spark's ascending default — oracles must say NULLS FIRST
        explicitly, DuckDB defaults NULLS LAST).

    Scale shape: the groupBy(key) total is the ONLY operator that sees
    corpus rows (map-side partial agg); every later step runs on the
    per-key table, which is orders of magnitude smaller than the corpus
    (web sources / curated subsets, not documents). The final ranking
    window sorts that table in one task — right for up to ~10^6 keys; a
    per-DOMAIN allocation at crawl scale would swap it for the bucketed
    ranker (key_quota's technique) without touching the contract.

    W == 0 (every key's total is 0/NULL) allocates 0 everywhere rather
    than dividing by zero. NULL keys form a normal group. ``weight_col``
    None counts rows instead of summing a weight. Returns one row per
    key: (key, tokens, allocation)."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    if weight_col is None:
        t_agg = F.count("*")
    else:
        w_expr = F.col(weight_col) if isinstance(weight_col, str) else weight_col
        t_agg = F.coalesce(F.sum(w_expr.cast("long")), F.lit(0))
    tot = df.groupBy(key_col).agg(t_agg.cast("long").alias("tokens"))
    wm = F.floor(
        F.sqrt(F.col("tokens").cast("double")) * F.lit(float(weight_scale))
    ).cast("long")
    w = tot.select(key_col, "tokens", wm.alias("_wm"))
    dec = "decimal(38,0)"
    totals = w.agg(F.sum(F.col("_wm").cast(dec)).alias("_W"))
    prod = F.lit(budget).cast(dec) * F.col("_wm").cast(dec)
    b = (
        w.crossJoin(F.broadcast(totals))
        .withColumn("_rem", F.when(F.col("_W") > 0, prod % F.col("_W")))
        .withColumn(
            "_base",
            F.when(
                F.col("_W") > 0,
                ((prod - F.col("_rem")) / F.col("_W")).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
    )
    extra = b.agg(
        (F.lit(budget) - F.coalesce(F.sum("_base"), F.lit(0))).alias("_extra")
    )
    # ranking window over the per-key table only (see docstring). In the
    # W == 0 degenerate _rem is NULL and _extra == budget, but the
    # outer W > 0 guard on `allocation` pins every key to 0 regardless
    # of rank, so the rank order of NULL remainders is immaterial.
    w_rank = Window.orderBy(
        F.col("_rem").desc_nulls_last(), F.col(key_col).asc_nulls_first()
    )
    out = (
        b.crossJoin(F.broadcast(extra))
        .withColumn("_rn", F.row_number().over(w_rank))
        .withColumn(
            "allocation",
            F.when(F.col("_W") > 0,
                   F.col("_base")
                   + F.when(F.col("_rn") <= F.col("_extra"), 1).otherwise(0))
            .otherwise(F.lit(0))
            .cast("long"),
        )
    )
    return out.select(key_col, "tokens", "allocation")


def mixture_allocations_py(totals: list, budget: int, weight_scale: int = 1_000_000) -> list:
    """Pure-Python replay of mixture_allocations over [(key, tokens)] —
    the oracle/property-test reference. Same IEEE sqrt, same integer
    apportionment, same (rem DESC, key ASC NULLS FIRST) tie order."""
    import math

    w = [(k, t, int(math.floor(math.sqrt(float(t)) * weight_scale))) for k, t in totals]
    W = sum(x for _, _, x in w)
    if W == 0:
        return sorted(((k, t, 0) for k, t, _ in w), key=lambda r: (r[0] is not None, r[0]))
    base = {k: (budget * x) // W for k, _, x in w}
    rem = {k: (budget * x) % W for k, _, x in w}
    extra = budget - sum(base.values())
    order = sorted(w, key=lambda r: (-rem[r[0]], r[0] is not None, r[0]))
    winners = {k for k, _, _ in order[:extra]}
    return sorted(
        ((k, t, base[k] + (1 if k in winners else 0)) for k, t, _ in w),
        key=lambda r: (r[0] is not None, r[0]),
    )


def hash_split_per_key(
    df: DataFrame,
    weights: dict,
    key_col: str = "lang",
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
    split_col: str = "split",
) -> DataFrame:
    """EXACT stratified split — train/val/test assignment with exact
    per-key proportions (the split-leakage control a training pipeline
    runs per language/source): within each key, rows ranked by the
    selection-order hash (md5(coalesce(id,'')), id) are cut at
    boundary_i = (n_key · cumweight_i) DIV total_weight — deterministic,
    rerun-stable on any partitioning, and replayable by a plain
    QUALIFY-style SQL oracle. The cheap industry alternative (label by
    hash RANGE, no shuffle, ~proportions only) is a one-liner on top of
    _order_hash; this operator is the exact-quota variant.

    ``weights``: ordered {label: integer weight}; every key's class
    counts are exactly floor-cumulative (largest class absorbs
    remainders at the tail by construction).

    Scale shape (key_quota's bucket discipline, extended from a
    selection to a TOTAL labeling): per-(key, hash-prefix-bucket)
    counts from one hash agg; per-key totals and per-bucket prefix
    offsets computed on that tiny table; the rank window then runs
    per (key, bucket) — every partition bounded by one bucket of one
    key regardless of skew, never a whole-key sort. Labeling touches
    every row by necessity (the label IS the output), so the one
    bounded-rank shuffle of corpus rows is inherent, not avoidable.
    Because the bucket id is a hash PREFIX, prefix-offset + in-bucket
    rank equals the global per-key rank exactly.

    NULL policy: NULL ids hash as '' (≤ 1 per key — _order_hash
    contract); NULL keys are their own stratum (null-safe join)."""
    if not weights or any(w <= 0 for w in weights.values()):
        raise ValueError("weights must be positive")
    labels = list(weights)
    total = sum(weights.values())
    h = _order_hash(id_col)
    b = F.substring(h, 1, bucket_hex_chars)
    d = df.withColumn("_h", h).withColumn("_b", b)
    dd = _bucket_meta_join(d, key_col)
    w_rank = Window.partitionBy(key_col, "_b").orderBy("_h", id_col)
    r = (F.col("_before") + F.row_number().over(w_rank)).alias("_r")
    dd = dd.withColumn("_r", r)
    cum = 0
    expr = None
    for label, wgt in list(weights.items())[:-1]:
        cum += wgt
        cond = F.col("_r") <= F.expr(f"(_n * {cum}) DIV {total}")
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    expr = (
        F.lit(labels[0]) if expr is None else expr.otherwise(labels[-1])
    )
    return dd.withColumn(split_col, expr).drop(
        "_h", "_b", "_cnt", "_before", "_n", "_r"
    )


def key_quota_naive(
    df: DataFrame,
    n_keep: int,
    key_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """The single-window formulation — kept ONLY as the equivalence
    reference for tests (it sorts each key's entire row set in one task;
    never on the query path). Same NULL semantics: NULL ids hash as '',
    NULL keys are a window partition of their own."""
    w = Window.partitionBy(key_col).orderBy(_order_hash(id_col), id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_keep)
        .drop("_rn")
    )


def with_global_ntile(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    bucket_hex_chars: int = 2,
    out_col: str = "tile",
) -> DataFrame:
    """EXACT ``NTILE(k)`` over the whole corpus in (md5(id), id) hash
    order — equal-depth bucketing (train-shard assignment, decile
    labeling) WITHOUT the global sort NTILE's single window partition
    implies (the textbook formulation funnels every row through ONE
    task; this is the fifth instance of the bucketed two-pass
    technique).

    The global rank is with_global_cumsum with weight 1 (the cumsum of
    ones IS the 1-based rank; ids unique per that helper's contract).
    SQL NTILE then front-loads the remainder: with q = n div k and
    r = n mod k, the first r tiles take q+1 rows, the rest take q:

        rank <= r*(q+1):  tile = (rank-1) div (q+1) + 1
        otherwise:        tile = r + (rank - r*(q+1) - 1) div q + 1

    (NOT the evenly-spread floor((rank-1)*k/n) + 1, which distributes
    the fat tiles across the range and disagrees with SQL NTILE
    whenever r >= 2 — e.g. n=10, k=4 gives sizes 3,3,2,2 vs 3,2,3,2.)
    Pure integer arithmetic on (rank, n, k) → engine-portable; the
    total count rides in as a broadcast one-row aggregate, so the whole
    thing stays one lazy plan (no driver-side count action).

    NULL policy: with_global_cumsum's — NULL ids hash as '' (at most
    one per corpus for a total order). Every row gets a tile.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    d = with_global_cumsum(
        df, F.lit(1), id_col=id_col,
        bucket_hex_chars=bucket_hex_chars, out_col="_rank",
    )
    n_meta = df.agg(F.count(F.lit(1)).alias("_n"))
    q = F.expr(f"_n DIV {int(k)}")
    r = F.col("_n") % F.lit(int(k))
    fat = r * (q + 1)  # rows living in the first r (size q+1) tiles
    tile = F.when(
        F.col("_rank") <= fat,
        F.expr(f"(_rank - 1) DIV (_n DIV {int(k)} + 1) + 1"),
    ).otherwise(
        r
        + F.expr(
            f"(_rank - (_n % {int(k)}) * (_n DIV {int(k)} + 1) - 1) "
            f"DIV (_n DIV {int(k)}) + 1"
        )
    )
    return (
        d.join(F.broadcast(n_meta))
        .withColumn(out_col, tile.cast("long"))
        .drop("_n")
        .withColumnRenamed("_rank", "rank")
    )
