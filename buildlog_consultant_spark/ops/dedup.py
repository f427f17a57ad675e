"""Deduplication operators.

Exact dedup is a hash-groupBy; near-dup uses MinHash+LSH with md5-based
shingle hashes so the identical computation is expressible in DuckDB SQL for
the oracle (lexicographic min over hex digests is a valid min-hash family:
md5 is a uniform hash, so argmin over shingles is uniform — the standard
MinHash estimator applies).

Scale notes: shingling + min-aggregation are per-row (no shuffle); ONE
shuffle groups (band, signature) rows into buckets and pairs are generated
map-side from each bucket's id array (no self-join — the signature lineage
is computed exactly once). Banding bounds collisions between *dissimilar*
documents, but
NOT between true duplicates: m byte-identical documents share every band
signature and would produce O(m²) candidate pairs. minhash_near_dup_pairs
therefore (a) collapses exact-duplicate groups to one representative before
banding (dedup_exact_first) and (b) drops buckets larger than max_bucket —
both on by default; web crawls make both cases common.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# last Observation per label — introspected by tests; the daemon logger
# below is the production consumer
_dropped_observations: dict = {}
_obs_counter = itertools.count()

# observer threads give up after this long without an action on the
# observed frame — a plan that is built but never executed (dump_plans-
# style exploration) must not accumulate blocked threads for the life of
# the driver
_OBS_WAIT_SECS = 300.0


def _observe_dropped(
    grouped: DataFrame, max_bucket: int, label: str, arr_col: str = "ids"
) -> DataFrame:
    """Count over-cap buckets as an OBSERVED METRIC folded into the same
    pass (Dataset.observe — an accumulator on the existing plan, zero extra
    jobs/shuffles; the pre-round-4 implementation ran a second count() job
    over the full bucket lineage, which is why log_dropped defaulted off).
    A daemon thread logs a warning when the first action on the returned
    frame completes with a non-zero drop count; the thread POLLS with a
    bounded deadline (_OBS_WAIT_SECS) rather than blocking forever on
    Observation.get, so a frame that is built but never executed leaks no
    thread."""
    import logging
    import threading
    import time

    from pyspark.sql import Observation

    obs = Observation(f"{label}_dropped_{next(_obs_counter)}")
    observed = grouped.observe(
        obs,
        F.sum((F.size(arr_col) > max_bucket).cast("long")).alias("n_dropped"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    _dropped_observations[label] = obs

    def _log() -> None:
        logger = logging.getLogger(__name__)
        deadline = time.monotonic() + _OBS_WAIT_SECS
        try:
            while True:
                got = _observation_metrics(obs, block=False)
                if got is not None:
                    break
                if time.monotonic() >= deadline:
                    logger.debug(
                        "%s: no action on the observed frame within %.0fs "
                        "— dropped-bucket observer exiting",
                        label,
                        _OBS_WAIT_SECS,
                    )
                    return
                time.sleep(0.5)
            if got.get("n_dropped"):
                logger.warning(
                    "%s: dropped %d of %d buckets larger than %d members",
                    label,
                    got["n_dropped"],
                    got.get("n_buckets"),
                    max_bucket,
                )
            elif not got:
                logger.debug(
                    "%s: dropped-bucket metric lost to the AQE listener race "
                    "— see _observation_metrics", label,
                )
        except Exception:  # session teardown etc. — never crash the driver
            logger.debug(
                "%s: dropped-bucket metric unavailable", label, exc_info=True
            )

    threading.Thread(target=_log, daemon=True, name=f"{label}-dropped-log").start()
    return observed


def _observation_metrics(obs, block: bool = True) -> dict | None:
    """Observed (n_dropped, n_buckets) metrics, best-effort.

    With ``block=False`` this PROBES instead of waiting: returns None when
    no action has completed yet (the observer thread's bounded poll), a
    dict once the metrics row has latched. The probe is the JVM
    Observation's public ``getRowOrEmpty`` (an Option, ~100 ms internal
    wait) — feature-tested via getattr since the py4j handle is not a
    stable Python API; when the method is absent on a future PySpark the
    non-blocking probe reports "no metric" rather than risking an
    unbounded blocking get.

    Two upstream Spark quirks handled here (both reproduced on Spark
    4.1.2, pinned in tests/test_round4.py):

    - The JVM metrics row sometimes arrives WITHOUT a schema on multi-
      stage plans, and Observation.get's toPyRow helper asserts
      GenericRowWithSchema; positional access through py4j needs no schema
      and we own the metric order.
    - Under AQE (adaptive.enabled, the default) the Observation listener
      races the adaptive re-plan on multi-shuffle pipelines and can latch
      an EMPTY row — the same plan reliably delivers metrics with AQE off.
      An empty dict is returned in that case; the async logger degrades to
      a debug line rather than losing the main result. The query itself is
      unaffected — only the side metric is racy, which is why log_dropped
      can default on at zero cost (no extra job either way).
    """

    def _from_jrow(jrow) -> dict:
        if jrow.length() < 2:
            return {}
        return {"n_dropped": jrow.get(0), "n_buckets": jrow.get(1)}

    probe = getattr(getattr(obs, "_jo", None), "getRowOrEmpty", None)
    if probe is not None:
        try:
            jopt = probe()
            if jopt.isDefined():
                return _from_jrow(jopt.get())
            if not block:
                return None
        except Exception:
            if not block:
                return {}
    elif not block:
        # py4j handle shape changed across a PySpark upgrade — report
        # "no metric" instead of falling through to a blocking wait
        return {}
    try:
        got = obs.get
        return got if got else {}
    except Exception:
        jrow = obs._jo.getRow()
        return _from_jrow(jrow)


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (text_md5, n_dups, min_id)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(F.count("*").alias("n_dups"), F.min(id_col).alias("min_id"))
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest-id representative per identical text."""
    w = exact_dup_groups(df, id_col, text_col).select("min_id")
    return df.join(w, df[id_col] == w["min_id"], "left_semi")


def _shingles(text_col: str, k: int = 3):
    """Word k-shingles of the whitespace-normalized, lowercased text.
    NULL text is coalesced to '' (→ the single empty shingle), matching the
    Python-golden oracles' ``text or ''`` — without this, NULL propagates
    into NULL band signatures, which DuckDB/Python replays can't join on.

    Implementation: an Arrow-batched pandas UDF, NOT the equivalent JVM
    ``transform(sequence(..), i -> concat_ws(' ', slice(..)))`` — HOF
    lambdas run interpreted (never whole-stage codegen) and measured 4×
    slower than CPython's C-speed split/join at 50k docs (2.0–2.4 s vs
    0.52 s, bit-identical output verified by exceptAll both ways over
    the full sf1.0 corpus). The split geometry replicates the shared
    tokenizer expression exactly: trim(' ') → ASCII-\\s collapse →
    lower → split(' '); empty/NULL text yields [''] (one empty
    shingle), n < k tokens yield the single head shingle — the same
    corners the expression form produced."""
    import re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def sh(s):
        out = []
        for txt in s:
            tr = (txt or "").strip(" ")
            toks = ws.sub(" ", tr).lower().split(" ") if tr else [""]
            n = len(toks)
            out.append([" ".join(toks[i : i + k]) for i in range(max(n - k, 0) + 1)])
        return pd.Series(out)

    sh.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(sh, "array<string>")(F.col(text_col))


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, band, sig): per band b, sig = min over shingles of md5(b || '|' || shingle)."""
    sh = _shingles(text_col, k).alias("shingles")
    base = df.select(F.col(id_col).alias("id"), sh)

    def band_sig(b: int):
        # NB: the transform lambda must take exactly one parameter — a second
        # parameter would be bound to the element index by Spark
        def hash_shingle(s):
            return F.md5(F.concat(F.lit(f"{b}|"), s))

        return F.array_min(F.transform(F.col("shingles"), hash_shingle))

    band_cols = [band_sig(b).alias(f"sig_{b}") for b in range(bands)]
    wide = base.select("id", *band_cols)
    stack_expr = ", ".join(f"{b}, sig_{b}" for b in range(bands))
    return wide.selectExpr(
        "id", f"stack({bands}, {stack_expr}) as (band, sig)"
    )


def minhash_signatures_xx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    k: int = 3,
) -> DataFrame:
    """(id, band, sig) with sig = min over shingles of
    xxhash64(band::long, shingle) — one JVM hash per (band, shingle) instead
    of an md5 over a concatenated string (~8× cheaper than the md5 family).
    Exactly replayable off-Spark: xxhash64(long, string) chains as
    xxh64(utf8(s), seed=xxh64(le64(band), 42)) (ops/xxh64.py; verified
    bit-identical), with SIGNED 64-bit min semantics."""
    sh = _shingles(text_col, k).alias("shingles")
    base = df.select(F.col(id_col).alias("id"), sh)

    def band_sig(b: int):
        return F.array_min(
            F.transform(
                F.col("shingles"), lambda s: F.xxhash64(F.lit(b).cast("long"), s)
            )
        )

    band_cols = [band_sig(b).alias(f"sig_{b}") for b in range(bands)]
    wide = base.select("id", *band_cols)
    stack_expr = ", ".join(f"{b}, sig_{b}" for b in range(bands))
    return wide.selectExpr(
        "id", f"stack({bands}, {stack_expr}) as (band, sig)"
    )


def _pairs_from_sigs(
    sigs: DataFrame,
    min_shared_bands: int,
    max_bucket: int | None = None,
    log_dropped: bool = True,
) -> DataFrame:
    """Candidate pairs from (id, band, sig) rows, single-pass.

    ONE shuffle groups rows into buckets (collect_list per (band, sig));
    pair generation is then map-side array math — no self-join, so the
    shingle/hash lineage is computed exactly once and the per-bucket pair
    count is bounded by max_bucket² by construction. Buckets larger than
    max_bucket are dropped here (they defeat banding — see module doc);
    ``log_dropped`` (default-ON) counts them as an observed metric in the
    same pass — no extra job — and warns asynchronously."""
    buckets = sigs.groupBy("band", "sig").agg(F.collect_list("id").alias("ids"))
    keep = buckets.where(F.size("ids") >= 2)
    if max_bucket is not None:
        if log_dropped:
            keep = _observe_dropped(keep, max_bucket, "minhash")
        keep = keep.where(F.size("ids") <= max_bucket)
    # Pair expansion: posexplode the sorted bucket, then pair each
    # element with the SLICE after its position — on sorted distinct
    # ids, slice(ids, i+2, ..) == filter(ids, b > a), but a single
    # built-in slice per row replaces the interpreted per-element
    # filter lambda the old nested-transform expansion paid (HOF
    # lambdas never enter codegen; the old shape was O(m²) interpreted
    # evals per bucket). Still no self-join; per-bucket pair count is
    # bounded by max_bucket² as before.
    return (
        keep.select(F.array_sort(F.col("ids")).alias("ids"))
        .select(F.posexplode("ids").alias("_i", "id_a"), F.col("ids"))
        .select(
            "id_a",
            F.explode(
                F.slice(
                    "ids",
                    F.col("_i") + 2,
                    F.greatest(F.size("ids") - F.col("_i") - 1, F.lit(0)),
                )
            ).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_bands"))
        .where(F.col("shared_bands") >= min_shared_bands)
    )


def minhash_near_dup_pairs_xx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    k: int = 3,
    min_shared_bands: int = 2,
    dedup_exact_first: bool = True,
    max_bucket: int | None = 256,
    log_dropped: bool = True,
) -> DataFrame:
    """minhash_near_dup_pairs with the xxhash64 signature family — the
    throughput path for crawl-scale corpora (same banding/cap/dedup
    semantics; see minhash_signatures_xx for the hash construction)."""
    src = dedup_exact(df, id_col, text_col) if dedup_exact_first else df
    sigs = minhash_signatures_xx(src, id_col, text_col, bands, k)
    return _pairs_from_sigs(sigs, min_shared_bands, max_bucket, log_dropped)


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    k: int = 3,
    min_shared_bands: int = 2,
    dedup_exact_first: bool = True,
    max_bucket: int | None = 256,
    log_dropped: bool = True,
) -> DataFrame:
    """Candidate near-dup pairs: ids sharing ≥ min_shared_bands band
    signatures. Bucket join on (band, sig) — the LSH trick keeps the
    self-join tiny at corpus scale for *dissimilar* documents.

    True duplicates defeat banding (m identical texts share all bands →
    O(m²) pairs in one bucket), so by default (a) exact-duplicate groups are
    collapsed to their min-id representative before banding (report those
    via exact_dup_groups instead) and (b) buckets larger than ``max_bucket``
    are dropped — ``log_dropped`` (default-ON) counts what was skipped as an
    observed metric in the same pass and warns asynchronously."""
    src = dedup_exact(df, id_col, text_col) if dedup_exact_first else df
    sigs = minhash_signatures(src, id_col, text_col, bands, k)
    return _pairs_from_sigs(sigs, min_shared_bands, max_bucket, log_dropped)


def minhash_verified_pairs_xx(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 8,
    k: int = 3,
    min_shared_bands: int = 2,
    min_jaccard_ppm: int = 0,
    dedup_exact_first: bool = True,
    max_bucket: int | None = 256,
    log_dropped: bool = True,
) -> DataFrame:
    """The full two-stage near-dup pipeline: MinHash-LSH CANDIDATE pairs
    → EXACT k-shingle Jaccard verification (the classic generate-then-
    verify shape — banding recalls candidates cheaply but its shared-band
    count is a noisy similarity proxy; the exact set Jaccard is the
    decision metric real dedup passes threshold on). Returns
    (id_a, id_b, shared_bands, jaccard_ppm) for candidates with
    jaccard_ppm ≥ ``min_jaccard_ppm`` (ppm = ×1e6, floor-of-double — the
    same integer both DuckDB and a Python replay compute).

    Scale shape: candidate generation is minhash_near_dup_pairs_xx
    (bucketed, capped — pairs « corpus by construction). Verification
    never goes back to an all-pairs or gram-keyed join: the distinct-
    shingle SETS are joined onto the pair list by id, restricted first by
    a semi-join to candidate ids, so shuffle bytes are
    O(candidate docs × shingles), not O(corpus). The shingle projection
    is evaluated once per side (twice total, map-side CPU) — at crawl
    scale persist it if candidate volume warrants; jaccard_ppm itself is
    array math on already-joined rows. The union of two non-empty
    distinct-shingle sets is never empty (every doc has ≥ 1 shingle —
    NULL text coalesces to the single '' shingle), so the double
    division cannot hit ANSI divide-by-zero."""
    if dedup_exact_first:
        # src feeds two branches (signatures + verification shingles),
        # each of which would re-run the exact-dedup md5 agg + semi-join
        # and re-scan the corpus; materialize it once. localCheckpoint
        # also truncates the lineage, so a lost block fails loudly
        # rather than recomputing into a divergent branch.
        src = dedup_exact(df, id_col, text_col).localCheckpoint(eager=True)
    else:
        src = df
    sigs = minhash_signatures_xx(src, id_col, text_col, bands, k)
    pairs = _pairs_from_sigs(sigs, min_shared_bands, max_bucket, log_dropped)
    cand = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # Semi-join restriction BEFORE shingling: only candidate docs pay
    # the (interpreted-HOF) shingle projection, not the whole corpus.
    sh_c = (
        src.withColumnRenamed(id_col, "id")
        .join(cand, "id", "left_semi")
        .select(
            F.col("id"), F.array_distinct(_shingles(text_col, k)).alias("sh")
        )
    )
    a = sh_c.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh_c.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    # intersection size goes through LONG before the ×1e6 — a doc with
    # > 2147 distinct shingles would overflow int32 under ANSI otherwise
    jac = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
        * 1000000
        / F.size(F.array_union("sh_a", "sh_b"))
    ).cast("long")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", "shared_bands", jac.alias("jaccard_ppm"))
        .where(F.col("jaccard_ppm") >= min_jaccard_ppm)
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): hash every k-token shingle, slide a w-wide window over the
    hash sequence, keep each window's minimum; the document's fingerprint
    set is the distinct window-minima. Any shared substring of ≥ w+k-1
    tokens is guaranteed to share a fingerprint, at ~2/(w+1) the density
    of full shingling.

    All JVM-side: shingles hashed ONCE into an array (xxhash64), windows
    via transform over an index sequence + slice + array_min, one explode
    — no shuffle until the caller aggregates. Returns (id, fp) with fp a
    signed 64-bit hash. Docs shorter than w shingles emit one whole-array
    fingerprint."""
    sh = _shingles(text_col, k)
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(sh, lambda s: F.xxhash64(s)).alias("hs"),
    )
    n = F.size(F.col("hs"))
    idx = F.sequence(F.lit(1), F.greatest(n - F.lit(w - 1), F.lit(1)))
    mins = F.transform(idx, lambda i: F.array_min(F.slice(F.col("hs"), i, w)))
    return base.select(
        "id", F.explode(F.array_distinct(mins)).alias("fp")
    )


def winnow_dup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Fingerprints shared by ≥ 2 documents: (fp, n_docs, min_doc). One
    shuffle keyed on the 64-bit fingerprint — uniform by construction, so
    no skew handling needed."""
    fps = winnow_fingerprints(df, id_col, text_col, k, w)
    return (
        fps.groupBy("fp")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("id").alias("min_doc"),
        )
        .where(F.col("n_docs") >= 2)
    )


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the logical plan. Uses RELIABLE checkpoint() when the session has
    a checkpoint dir configured (spark.sparkContext.setCheckpointDir) —
    blocks land on the cluster's fault-tolerant store, so losing an executor
    mid-iteration recomputes from the checkpoint instead of killing the job.
    Falls back to localCheckpoint() (executor-local blocks, NOT
    fault-tolerant) for single-node / test sessions with no dir set."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint()
    return df.localCheckpoint()


def connected_components(
    edges: DataFrame, max_iter: int = 25, driver_threshold: int = 1_000_000
) -> DataFrame:
    """Connected components over an undirected edge list (id_a, id_b) by
    iterative min-label propagation: every vertex starts labeled with its
    own id; each round vertices adopt the minimum label among themselves
    and their neighbors, until a fixpoint.

    Adaptive small-graph fast path (same spirit as AQE's runtime broadcast
    decision): a single bounded job collects up to driver_threshold+1 edges
    via Arrow (limit + toArrow — two int64 columns, so 1M edges is ~16 MB
    of columnar buffers on the driver, NOT Row objects); if the limit was
    not hit, those ARE all the edges and union-find runs on the driver —
    one job total, versus O(rounds) distributed jobs each paying
    scheduler+shuffle overhead (the collect doubles as the size probe, so
    no separate count() job). The labels are identical (component-min
    ids). Dedup graphs are usually far smaller than their corpora (pairs
    survive banding + caps), so this path often holds even at crawl scale;
    pass ``driver_threshold=0`` to skip the probe and force the
    distributed loop.

    Distributed-path scale notes: each round is two broadcast-free joins +
    one aggregation — all shuffles keyed on vertex id, O(log diameter)
    rounds via pointer jumping. Each round's labels are checkpointed
    (reliable when a checkpoint dir is set, else local — see
    _truncate_lineage): a persist alone is NOT enough — the logical plan
    references the previous round's frame three times, so without
    truncation the plan tree grows 3^rounds and OOMs the planner long
    before the data does. If max_iter rounds pass without a fixpoint the
    possibly-non-converged labels are returned with a warning (25
    pointer-jumping rounds cover ~2^25-deep chains — defense-in-depth)."""
    spark = edges.sparkSession
    edges = _truncate_lineage(
        edges.select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
    )
    if driver_threshold > 0:
        probe = edges.limit(driver_threshold + 1).toArrow()
        if probe.num_rows <= driver_threshold:
            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in zip(
                probe.column("id_a").to_pylist(), probe.column("id_b").to_pylist()
            ):
                parent.setdefault(a, a)
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            rows = [(x, find(x)) for x in sorted(parent)]
            return spark.createDataFrame(rows, "id long, cluster long")
    labels = _truncate_lineage(
        edges.select(F.col("id_a").alias("id"))
        .union(edges.select(F.col("id_b").alias("id")))
        .distinct()
        .withColumn("label", F.col("id"))
    )
    changed = 0
    for _ in range(max_iter):
        msgs = (
            edges.join(labels, edges.id_a == labels.id)
            .select(F.col("id_b").alias("id"), "label")
            .union(
                edges.join(labels, edges.id_b == labels.id)
                .select(F.col("id_a").alias("id"), "label")
            )
        )
        propagated = (
            labels.select("id", "label")
            .union(msgs)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        )
        # pointer jumping: labels are themselves vertex ids, so following
        # the label one hop (label ← label's label) halves chain lengths —
        # O(log diameter) rounds instead of O(diameter)
        hop = propagated.select(
            F.col("id").alias("label"), F.col("label").alias("label2")
        )
        # the convergence flag is computed inside the same checkpointed
        # pass (one extra vertex-keyed join folded into the round's job);
        # the count() below then only filters cached blocks instead of
        # re-joining old vs new labels as a second shuffle job per round
        flagged = _truncate_lineage(
            propagated.join(hop, "label", "left")
            .select("id", F.coalesce("label2", "label").alias("label"))
            .join(labels.select("id", F.col("label").alias("_old")), "id")
            .select(
                "id", "label", (F.col("label") != F.col("_old")).alias("_chg")
            )
        )
        changed = flagged.where(F.col("_chg")).count()
        labels = flagged.select("id", "label")
        if changed == 0:
            break
    if changed != 0:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: no fixpoint after %d rounds "
            "(%d labels still changing) — returning possibly non-converged "
            "labels; raise max_iter",
            max_iter,
            changed,
        )
    return labels.select(F.col("id"), F.col("label").alias("cluster"))


def near_dup_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """Near-duplicate clusters: MinHash-LSH candidate pairs (xxhash64
    family) → connected components. Returns (id, cluster) with cluster =
    the component's minimum doc id; singletons are not rows (every
    unclustered doc is its own implicit cluster).

    NOTE (inherited from minhash_near_dup_pairs_xx defaults): exact
    duplicates of a clustered representative are ABSENT from the output —
    the exact-dedup pre-pass collapses byte-identical groups to their
    min-id representative before banding. Recover them by joining
    exact_dup_groups on the representative id, or pass
    ``dedup_exact_first=False`` (at the cost of O(m²) pairs per
    m-duplicate group). Buckets over ``max_bucket`` are likewise dropped
    (counted and warned about via the default-on observed-metric logging)."""
    pairs = minhash_near_dup_pairs_xx(df, id_col, text_col, **minhash_kwargs)
    return connected_components(pairs.select("id_a", "id_b"))


def cluster_canonical(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chars_col: str = "n_chars",
    **minhash_kwargs,
) -> DataFrame:
    """Canonical-member election per near-dup cluster — the retention
    policy that follows clustering in a real dedup pass: within each
    cluster KEEP THE LONGEST member (most content preserved), ties to
    the lowest id. Emits (cluster, n_members, kept_id, kept_chars).

    Length comes from the ``chars_col`` metadata column (NOT
    length(text): Java String length counts UTF-16 units where Python
    counts code points — a latent surrogate-pair divergence the
    metadata column sidesteps for both engines); NULL chars coalesce
    to -1 so a NULL-length member never beats a measured one.

    Scale shape: near_dup_clusters' bucketed LSH + components, then ONE
    max(struct(chars, -id)) partial+final agg per cluster (the
    latest_by_key shape — shuffle bytes ≈ clusters, no per-cluster
    sort). The -id negation flips the tiebreak so struct-max = (max
    chars, MIN id); ids are non-negative by the corpus contract."""
    clusters = near_dup_clusters(df, id_col, text_col, **minhash_kwargs)
    members = clusters.join(
        df.select(
            F.col(id_col).alias("id"),
            F.coalesce(F.col(chars_col), F.lit(-1)).alias("_len"),
        ),
        "id",
    )
    return (
        members.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.max(
                F.struct(
                    F.col("_len").alias("l"), (-F.col("id")).alias("ni")
                )
            ).alias("_m"),
        )
        .select(
            "cluster",
            "n_members",
            (-F.col("_m.ni")).cast("long").alias("kept_id"),
            F.col("_m.l").cast("long").alias("kept_chars"),
        )
    )


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = 256,
    dedup_exact_first: bool = True,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance: the 64-bit signature is
    split into four 16-bit bands; by pigeonhole, any pair within hamming
    ``max_hamming`` ≤ 3 shares at least one band EXACTLY, so candidate
    generation is a bucket join on (band, slice) and only candidates pay
    the exact popcount test (bit_count(xor) — JVM-side).

    Same scale shape AND semantics as the MinHash family: one shuffle
    groups (band, slice) buckets, pairs expand map-side from each bucket's
    array; identical texts share all FOUR bands, so ``dedup_exact_first``
    (default-ON, API parity with minhash_near_dup_pairs) collapses exact-
    duplicate groups to their min-id representative before banding —
    without it a crawl's duplicate clusters land in one bucket and are
    silently dropped by ``max_bucket``. ``log_dropped`` (default-ON)
    counts dropped buckets as an observed metric in the same pass and
    warns asynchronously. Returns (id_a, id_b, hamming) distinct."""
    src = dedup_exact(df, id_col, text_col) if dedup_exact_first else df
    sigs = simhash64(src, id_col, text_col)
    band_exprs = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), 16 * b)
            .bitwiseAND(F.lit(0xFFFF))
            .cast("int")
            .alias("slice"),
        )
        for b in range(4)
    ]
    banded = sigs.select(
        "id", "simhash", F.explode(F.array(*band_exprs)).alias("bk")
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.slice").alias("slice"))
    buckets = banded.groupBy("band", "slice").agg(
        F.collect_list(F.struct("id", "simhash")).alias("members")
    )
    keep = buckets.where(F.size("members") >= 2)
    if max_bucket is not None:
        if log_dropped:
            keep = _observe_dropped(keep, max_bucket, "simhash", arr_col="members")
        keep = keep.where(F.size("members") <= max_bucket)
    # Pair expansion via posexplode + slice of the sorted tail (ids are
    # unique per bucket, so the tail after position i is exactly
    # filter(b.id > a.id)) — one built-in slice per row instead of the
    # O(m²)-interpreted nested transform/filter; same rewrite as
    # _pairs_from_sigs.
    return (
        keep.select(F.array_sort(F.col("members")).alias("ms"))
        .select(F.posexplode("ms").alias("_i", "a"), F.col("ms"))
        .select(
            "a",
            F.explode(
                F.slice(
                    "ms",
                    F.col("_i") + 2,
                    F.greatest(F.size("ms") - F.col("_i") - 1, F.lit(0)),
                )
            ).alias("b"),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def near_dup_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **minhash_kwargs,
) -> DataFrame:
    """The corpus-dedup ENDPOINT: returns the deduplicated DataFrame —
    exact duplicates collapsed to their min-id representative, then every
    near-dup cluster member except the cluster representative dropped.
    This is the pass a training-data pipeline actually runs before
    tokenization; near_dup_clusters is its diagnostic view.

    Scale shape: exact dedup runs EXACTLY ONCE — the representative-id list
    (one long column, far smaller than the corpus) is computed up front and
    lineage-truncated, then reused both as the LSH pipeline's input (which
    therefore runs with dedup_exact_first=False) and as the final frame the
    near-dup drop anti-joins against. Pre-round-4 this op paid the md5
    scan + groupBy + semi-join twice (once inside near_dup_clusters, once
    for the returned frame) — a whole extra corpus pass at 100 TB.
    Clustering is the capped LSH + CC pipeline; the final drop is a
    left-anti join keyed on id. ``dedup_exact_first`` in minhash_kwargs is
    ignored (forced False — the input is already deduped here)."""
    minhash_kwargs["dedup_exact_first"] = False
    reps = _truncate_lineage(
        exact_dup_groups(df, id_col, text_col).select("min_id")
    )
    deduped = df.join(reps, df[id_col] == reps["min_id"], "left_semi")
    pairs = minhash_near_dup_pairs_xx(deduped, id_col, text_col, **minhash_kwargs)
    clusters = connected_components(pairs.select("id_a", "id_b"))
    drop = clusters.where(F.col("id") != F.col("cluster")).select(
        F.col("id").alias(id_col)
    )
    return deduped.join(drop, id_col, "left_anti")


def _sig_from_bit_votes_udf():
    """Vectorized Arrow UDF: array<long> of token hashes → signed 64-bit
    SimHash. The bit-vote accumulation lives here rather than in a
    64-wide higher-order-function fold because Spark's HOF expressions
    (aggregate/zip_with/transform) do NOT enter whole-stage codegen — the
    fold runs interpreted, ~60× slower than numpy's unpackbits over the
    same Arrow batch. Hashing stays JVM-side (one xxhash64 per token), so
    no hash semantics cross the language boundary."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def sig_from_hashes(hs):
        out = np.zeros(len(hs), dtype=np.int64)
        for i, arr in enumerate(hs):
            if arr is None:
                continue  # defensive: callers coalesce text to '' upstream
            a = np.asarray(arr, dtype=np.int64)
            if a.size == 0:
                continue  # zero votes → all bits 0
            # bits in value order 0..63: little-endian byte view + LSB-first
            bits = np.unpackbits(
                a.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
            )
            votes = 2 * bits.sum(axis=0, dtype=np.int64) - a.size
            # pack the sign bits back into one signed long (LSB-first)
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8), bitorder="little"
            ).view(np.int64)[0]
        return pd.Series(out)

    # real annotation objects: `from __future__ import annotations` would
    # stringify inline hints and break pandas_udf type inference
    sig_from_hashes.__annotations__ = {"hs": pd.Series, "return": pd.Series}
    return pandas_udf(sig_from_hashes, "long")


def simhash64(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash over word tokens using xxhash64 bit votes.

    Per token t: h = xxhash64(t). For each bit position, vote +1/-1; the
    signature bit is the vote sign. Tokenization and hashing are JVM-side
    (exact Spark split/lower semantics, one hash per token); the 64-wide
    vote accumulation is a vectorized Arrow UDF (see
    _sig_from_bit_votes_udf for why not a HOF fold)."""
    tokens = F.split(
        F.lower(F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")),
        " ",
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(tokens, lambda t: F.xxhash64(t)).alias("hs"),
    )
    sig = _sig_from_bit_votes_udf()
    return base.select("id", sig(F.col("hs")).alias("simhash"))


def _md5_sig_udf():
    """Vectorized Arrow UDF: array<string> of tokens → signed 64-bit
    md5-nibble SimHash (same HOF-interpretation rationale as
    _sig_from_bit_votes_udf). hashlib.md5 over the token's UTF-8 bytes is
    the same MD5 the JVM/DuckDB compute, so cross-engine exactness is
    preserved; a per-batch token cache amortizes repeated words."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def md5_sig(toks_col):
        out = np.zeros(len(toks_col), dtype=np.int64)
        cache: dict = {}
        jbits = np.arange(4, dtype=np.uint8)
        for i, toks in enumerate(toks_col):
            if toks is None:
                continue  # defensive: callers coalesce text to '' upstream
            n = len(toks)
            if n == 0:
                continue
            digs = np.empty((n, 8), dtype=np.uint8)
            for j, t in enumerate(toks):
                d = cache.get(t)
                if d is None:
                    d = cache[t] = hashlib.md5(t.encode("utf-8")).digest()[:8]
                digs[j] = np.frombuffer(d, dtype=np.uint8)
            # hex digit d of the digest = high nibble of byte d//2 (d even)
            # else low nibble; signature bit (4d + j) = bit j of digit d
            nibbles = np.empty((n, 16), dtype=np.uint8)
            nibbles[:, 0::2] = digs >> 4
            nibbles[:, 1::2] = digs & 15
            bits = (nibbles[:, :, None] >> jbits) & 1  # (n, 16, 4)
            votes = 2 * bits.sum(axis=0, dtype=np.int64).reshape(64) - n
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8), bitorder="little"
            ).view(np.int64)[0]
        return pd.Series(out)

    md5_sig.__annotations__ = {"toks_col": pd.Series, "return": pd.Series}
    return pandas_udf(md5_sig, "long")


def simhash64_md5(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash whose per-token hash is md5 instead of xxhash64 —
    bit (4d+j) is the j-th bit of hex digit d. Slower than simhash64 but
    the identical computation is expressible in DuckDB SQL, giving
    near-dup signatures an exact cross-engine oracle. Tokenization stays
    JVM-side (exact Spark split/lower semantics); hashing + bit votes run
    in the vectorized Arrow UDF."""
    tokens = F.split(
        F.lower(F.regexp_replace(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " ")),
        " ",
    )
    base = df.select(F.col(id_col).alias("id"), tokens.alias("toks"))
    sig = _md5_sig_udf()
    return base.select("id", sig(F.col("toks")).alias("simhash"))


def ngram_jaccard(
    df: DataFrame,
    id_a: int,
    id_b: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard similarity between two documents (×1e6, integer)."""
    sh = _shingles(text_col, k)
    pair = df.where(F.col(id_col).isin([id_a, id_b])).select(
        F.col(id_col).alias("id"), F.array_distinct(sh).alias("sh")
    )
    a = pair.where(F.col("id") == id_a).select(F.col("sh").alias("sa"))
    b = pair.where(F.col("id") == id_b).select(F.col("sh").alias("sb"))
    return a.crossJoin(b).select(
        (
            # long before the ×1e6: > 2147 distinct shingles would
            # overflow int32 under ANSI (same guard as
            # minhash_verified_pairs_xx)
            F.size(F.array_intersect("sa", "sb")).cast("long") * 1000000
            / F.size(F.array_union("sa", "sb"))
        ).cast("long").alias("jaccard_ppm")
    )
