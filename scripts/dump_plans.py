"""Regenerate PLANS.md — formatted executed plans of the flagship pipeline."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from buildlog_consultant_spark import fixtures
from buildlog_consultant_spark.spark import get_spark
from buildlog_consultant_spark.spark.pipeline import aggregate_counts, classify_and_enrich


def formatted(spark, df) -> str:
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def main() -> None:
    spark = get_spark("local[4]", app_name="plans")
    tmp = tempfile.mkdtemp()
    fixtures.pages_df(spark, 200, partitions=4).write.parquet(f"{tmp}/pages")
    pages = spark.read.parquet(f"{tmp}/pages")
    enriched = classify_and_enrich(pages)
    agg = aggregate_counts(enriched)

    from buildlog_consultant_spark.ops.similarity import embedding_near_dups

    emb = spark.createDataFrame(
        [(i, [float(i % 7) - 3.0, 1.0, -2.0, 0.5]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    nd = embedding_near_dups(emb, threshold=-1.0, n_planes=3, dim=4)
    nd.collect()  # finalize AQE so exchange reuse is visible

    from buildlog_consultant_spark.ops.similarity import ivf_topk

    ivf = ivf_topk(emb, query_vec_id=0, k=5, n_pivots=4, nprobe=2)
    ivf.collect()

    from pyspark.sql import functions as F

    from buildlog_consultant_spark.ops.asof import asof_join
    from buildlog_consultant_spark.ops.text import contamination_hits

    ev = spark.createDataFrame(
        [(i, i % 5, f"2024-01-01 0{i % 10}:00:00", "purchase" if i % 2 else "click")
         for i in range(40)],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    aj = asof_join(
        ev.where("event_type = 'purchase'"), ev.where("event_type = 'click'"),
        on="user_id",
    )
    aj.collect()

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(12)), "en")
         for i in range(60)],
        "doc_id long, text string, lang string",
    )
    cont = contamination_hits(docs)
    cont.collect()

    from buildlog_consultant_spark.ops.similarity import ann_topk_int8
    from buildlog_consultant_spark.ops.text import quality_quantiles

    emb64 = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 11) + 1.0 for j in range(64)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    int8 = ann_topk_int8(emb64, 0, k=5)
    int8.collect()
    qq = quality_quantiles(docs)
    qq.collect()

    from buildlog_consultant_spark.ops.quota import key_quota

    sources = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(90)], "doc_id long, source string"
    )
    quota = key_quota(sources, 7, bucket_hex_chars=1)
    quota.collect()

    from buildlog_consultant_spark.ops.spans import duplicated_spans

    span_docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 3 + j) % 40}" for j in range(20))) for i in range(40)],
        "doc_id long, text string",
    )
    spans = duplicated_spans(span_docs, min_len=8)
    spans.collect()

    from buildlog_consultant_spark.ops.quota import token_budget_per_key
    from buildlog_consultant_spark.ops.similarity import ann_topk_int8_batch
    from buildlog_consultant_spark.ops.spans import (
        filter_span_duplicated,
        scrub_span_duplicated,
    )

    scrub = scrub_span_duplicated(span_docs, min_len=8)
    scrub.collect()
    spanfilter = filter_span_duplicated(span_docs, min_len=8)
    spanfilter.collect()
    weights = spark.createDataFrame(
        [(i, f"s{i % 3}", (i * 13) % 40) for i in range(90)],
        "doc_id long, source string, w long",
    )
    pkb = token_budget_per_key(weights, 60, "w", key_col="source",
                               bucket_hex_chars=1)
    pkb.collect()
    batch = ann_topk_int8_batch(emb64, emb64.where("vec_id < 3"), k=5)
    batch.collect()

    from buildlog_consultant_spark.ops.lines import strip_boilerplate_lines
    from buildlog_consultant_spark.ops.similarity import ann_topk_lsh_batch
    from buildlog_consultant_spark.ops.text import (
        unigram_vocab_costs,
        with_unigram_logloss,
    )

    line_docs = spark.createDataFrame(
        [(i, f"s{i % 2}", "NAV\n" + "\n".join(f"body {i} {j}" for j in range(3)))
         for i in range(12)],
        "doc_id long, source string, text string",
    )
    lstrip = strip_boilerplate_lines(line_docs, min_docs=3)
    lstrip.collect()
    ucosts, uoov = unigram_vocab_costs(docs, vocab_size=16)
    uni = with_unigram_logloss(docs, ucosts, uoov)
    uni.collect()
    lshb = ann_topk_lsh_batch(
        emb64, emb64.where("vec_id < 3"), k=5, n_planes=4
    )
    lshb.collect()

    from buildlog_consultant_spark.ops.bloom import incremental_new_docs
    from buildlog_consultant_spark.ops.classifier import (
        nb_token_weights,
        with_nb_score,
    )
    from buildlog_consultant_spark.ops.dedup import minhash_verified_pairs_xx
    from buildlog_consultant_spark.ops.quota import mixture_sample

    bloom_batch = spark.createDataFrame(
        [(200 + i, f"w{(i * 7) % 23} fresh {i % 4}") for i in range(20)],
        "doc_id long, text string",
    )
    inc = incremental_new_docs(bloom_batch, docs)
    inc.collect()
    mix = mixture_sample(weights, 300, key_col="source", weight_col="w")
    mix.collect()
    ver = minhash_verified_pairs_xx(span_docs, min_shared_bands=1)
    ver.collect()
    nbw, nbp = nb_token_weights(docs, F.col("lang") == "en", vocab_size=16)
    nb = with_nb_score(docs, nbw, nbp)
    nb.collect()

    from buildlog_consultant_spark.ops.anomaly import rate_spikes
    from buildlog_consultant_spark.ops.funnel import funnel_times
    from buildlog_consultant_spark.ops.graph import pagerank
    from buildlog_consultant_spark.ops.overlap import source_gram_overlap
    from buildlog_consultant_spark.ops.sketch import kmv_distinct_shingles
    from buildlog_consultant_spark.ops.snapshot import (
        history_intervals,
        latest_by_key,
    )
    from buildlog_consultant_spark.ops.text import filter_quality_auto
    from buildlog_consultant_spark.ops.web import domain_stats

    hosts = spark.createDataFrame(
        [(i, f"h{i % 5}.example{'s' * (i % 2)}.com") for i in range(40)],
        "doc_id long, host string",
    )
    dom = domain_stats(hosts)
    dom.collect()
    qga = filter_quality_auto(docs)
    qga.collect()
    ovl = source_gram_overlap(line_docs, k=2)
    ovl.collect()
    ev2 = spark.createDataFrame(
        [(i, i % 5, f"2024-01-0{1 + i % 3} 0{i % 10}:00:00",
          ["view", "click", "purchase"][i % 3], float(i % 9))
         for i in range(60)],
        "event_id long, user_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    snap = latest_by_key(ev2)
    snap.collect()
    fun = funnel_times(ev2)
    fun.collect()
    kmv = kmv_distinct_shingles(line_docs, k=8)
    kmv.collect()
    pr = pagerank(docs)  # localCheckpoints internally
    hist = history_intervals(ev2)
    hist.collect()
    roll = ev2.rollup("event_type", F.to_date("ts").alias("day")).agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
    )
    roll.collect()
    spikes = rate_spikes(ev2, window=4)
    spikes.collect()

    from buildlog_consultant_spark.ops.colloc import collocations
    from buildlog_consultant_spark.ops.dedup import cluster_canonical
    from buildlog_consultant_spark.ops.funnel import (
        retention_cohorts,
        rolling_active_users,
    )
    from buildlog_consultant_spark.ops.index import inverted_index
    from buildlog_consultant_spark.ops.quota import hash_split_per_key
    from buildlog_consultant_spark.ops.sketch import cms_token_estimates

    coll = collocations(docs, min_count=2, k=10)
    coll.collect()
    cmsq = cms_token_estimates(docs, width=64, depth=2, n_probe=8)
    cmsq.collect()
    inv = inverted_index(docs.select("doc_id", "text"), min_df=2)
    inv.collect()
    split = hash_split_per_key(
        docs, {"train": 8, "val": 1, "test": 1}, key_col="lang",
        bucket_hex_chars=1,
    )
    split.collect()
    canon_docs = spark.createDataFrame(
        [
            (i, " ".join(f"w{j + (i % 2)}" for j in range(40)), 40 + i)
            for i in range(8)
        ],
        "doc_id long, text string, n_chars long",
    )
    canon = cluster_canonical(canon_docs)
    canon.collect()
    ret = retention_cohorts(ev2)
    ret.collect()
    wau = rolling_active_users(ev2, window_days=3)
    wau.collect()

    from buildlog_consultant_spark.ops.snapshot import snapshot_diff
    from buildlog_consultant_spark.ops.text import gopher_quality_signals

    diff = snapshot_diff(
        docs.select("doc_id", "text"),
        docs.select((F.col("doc_id") + 1).alias("doc_id"), "text"),
    )
    diff.collect()
    goph = gopher_quality_signals(docs).select(
        "doc_id", "n_words", "gopher_keep"
    )
    goph.collect()
    piv = (
        ev2.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    piv.collect()

    from buildlog_consultant_spark.ops.ppjoin import jaccard_allpairs
    from buildlog_consultant_spark.ops.quota import with_global_ntile
    from buildlog_consultant_spark.ops.ranges import bucketed_range_join
    from buildlog_consultant_spark.ops.regress import ols_fit
    from buildlog_consultant_spark.ops.robust import iqr_outlier_stats

    pts = spark.range(200).select(
        F.col("id").alias("pid"), ((F.col("id") * 37) % 500).alias("point")
    )
    rng = spark.range(50).select(
        F.col("id").alias("rid"),
        (F.col("id") * 10).alias("lo"),
        (F.col("id") * 10 + 7).alias("hi"),
    )
    rj = bucketed_range_join(pts, rng, "point", "lo", "hi", 16)
    rj.collect()

    ols = ols_fit(
        spark.range(300).select(
            (F.col("id") % 3).cast("string").alias("g"),
            F.col("id").alias("x"),
            (F.col("id") * 2 + 1).alias("y"),
        ),
        ["g"], "x", "y",
    )
    ols.collect()

    nt = with_global_ntile(
        spark.range(500).select(F.col("id").alias("doc_id")), 10
    )
    nt.collect()

    jp = jaccard_allpairs(docs, tau_permille=500, checkpoint=False)
    jp.collect()

    iqr = iqr_outlier_stats(
        ev2.select("event_type", F.col("event_id").alias("cents")),
        "event_type", "cents",
    )
    iqr.collect()

    from buildlog_consultant_spark.fixtures import audio_df, image_df
    from buildlog_consultant_spark.ops.anomaly import gap_fill_hourly
    from buildlog_consultant_spark.ops.multimodal import (
        image_near_dup_pairs,
        with_audio_fingerprint,
        with_image_dhash,
    )

    gfill = gap_fill_hourly(ev2)
    gfill.collect()
    imgpairs = image_near_dup_pairs(
        with_image_dhash(image_df(spark, 32)), max_hamming=6,
        checkpoint=False,  # show the full lazy structure
    )
    imgpairs.collect()
    afp = with_audio_fingerprint(audio_df(spark, 32))
    afp.collect()

    from buildlog_consultant_spark.ops.robust import (
        key_skew_report,
        mad_outlier_stats,
    )
    from buildlog_consultant_spark.ops.sessions import (
        incremental_sessionize,
        sessionize,
    )

    madp = mad_outlier_stats(
        ev2.select("event_type", F.col("event_id").alias("cents")),
        "event_type", "cents",
    )
    madp.collect()
    skew = key_skew_report(ev2, "user_id")
    skew.collect()
    cutoff = F.timestamp_seconds(F.lit(90000))
    inc = incremental_sessionize(
        sessionize(ev2.where(F.col("ts") <= cutoff)).localCheckpoint(
            eager=True
        ),
        ev2.where(F.col("ts") > cutoff),
        checkpoint=False,  # show the batch-window structure
    )
    inc.collect()

    out = [
        "# PLANS — executed plans of the flagship pipeline (local[4], 200-doc fixture corpus)",
        "",
        "Auto-generated by `python3 scripts/dump_plans.py`. What to look for:",
        "- the FileScan reads only url/text/lang (html pruned)",
        "- BroadcastHashJoin for the enrich lookup (no shuffle of the big side)",
        "- two HashAggregate nodes (partial + final) for the counts",
        "- embedding near-dups: no CartesianProduct / nested-loop join; the",
        "  bucket aggregation's exchange is REUSED on the probe branch",
        "  (plane projection computed once), pairs expand map-side",
        "- as-of join: ONE exchange keyed on user_id feeding a single Window",
        "  (no range join, no cartesian)",
        "- contamination: benchmark grams arrive via BroadcastExchange; the",
        "  corpus grams are never shuffled before the per-doc hash agg",
        "",
        "## classify → enrich",
        "```",
        formatted(spark, enriched),
        "```",
        "",
        "## per-kind/per-lang aggregate",
        "```",
        formatted(spark, agg),
        "```",
        "",
        "## embedding_near_dups (capped LSH candidate generation, round 3)",
        "```",
        formatted(spark, nd),
        "```",
        "",
        "## ivf_topk (coarse-quantizer ANN, round 3) — cell filter + capped",
        "## window + TakeOrderedAndProject, no cartesian",
        "```",
        formatted(spark, ivf),
        "```",
        "",
        "## asof_join (round 4) — one user_id exchange + a single Window",
        "```",
        formatted(spark, aj),
        "```",
        "",
        "## contamination (round 4) — broadcast benchmark grams, map-side corpus grams",
        "```",
        formatted(spark, cont),
        "```",
        "",
        "## ann_topk_int8 (round 5) — TakeOrderedAndProject first, rank",
        "## Window over the k survivors only (no global-window corpus sort)",
        "```",
        formatted(spark, int8),
        "```",
        "",
        "## quality_quantiles (round 5) — histogram hash-agg is the only",
        "## operator touching corpus rows; Window runs over ≤101 bins/lang",
        "```",
        formatted(spark, qq),
        "```",
        "",
        "## key_quota (round 5) — full buckets kept without ranking; the",
        "## row_number window sits under the boundary-bucket filter only",
        "```",
        formatted(spark, quota),
        "```",
        "",
        "## dup_spans (round 5; round 6: 128-bit xxhash64-pair gram key) —",
        "## flat-map gram positions, ONE gram-keyed hash agg (16-byte keys),",
        "## run-merge windows partitioned per doc (bounded)",
        "```",
        formatted(spark, spans),
        "```",
        "",
        "## scrub_span_duplicated (round 6) — ExactSubstr removal: bounded",
        "## per-doc collect_list of spans, join-back, per-token exists()",
        "## over the span array; no corpus-wide sort anywhere",
        "```",
        formatted(spark, scrub),
        "```",
        "",
        "## filter_span_duplicated (round 6 single-tokenize rewrite) — the",
        "## doc token count rides out of the gram scan (doc_tokens in the",
        "## run-merge agg); the output branch's FileScan projects original",
        "## columns only — no second tokenize of the corpus",
        "```",
        formatted(spark, spanfilter),
        "```",
        "",
        "## token_budget_per_key (round 6) — per-key SUM-boundary two-pass:",
        "## one (key, bucket) hash agg over corpus rows, broadcast boundary",
        "## table, running-sum window over boundary buckets only",
        "```",
        formatted(spark, pkb),
        "```",
        "",
        "## ann_topk_int8_batch (round 6) — ONE MapInPandas over the corpus",
        "## codes scores ALL queries (int64 matmul per Arrow batch, per-batch",
        "## top-k); the only Window runs over bounded candidates per query",
        "```",
        formatted(spark, batch),
        "```",
        "",
        "## strip_boilerplate_lines (round 6) — posexplode line stream, ONE",
        "## (source, line) distinct-doc hash agg, null-safe join-back,",
        "## bounded per-doc rebuild",
        "```",
        formatted(spark, lstrip),
        "```",
        "",
        "## with_unigram_logloss (round 6) — pure map-side scoring: vocab map",
        "## literal + integer fold; the training agg ran once at build time",
        "```",
        formatted(spark, uni),
        "```",
        "",
        "## ann_topk_lsh_batch (round 6) — broadcast probe bucket-join, capped",
        "## buckets, exact cosine on candidates, per-query bounded rank window",
        "```",
        formatted(spark, lshb),
        "```",
        "",
        "## incremental_new_docs (round 6) — the Bloom membership test is a",
        "## JVM Filter (element_at + bit masks) directly above the corpus",
        "## scan; the confirm anti-join sees only surviving rows",
        "```",
        formatted(spark, inc),
        "```",
        "",
        "## mixture_sample (round 6) — allocations (per-key groupBy + tiny",
        "## apportionment) broadcast into the per-key SUM-boundary selection;",
        "## corpus-side plan identical to token_budget_per_key",
        "```",
        formatted(spark, mix),
        "```",
        "",
        "## minhash_verified_pairs_xx (round 6) — banding lineage computed",
        "## once (AQE exchange reuse); shingle sets LeftSemi-restricted to",
        "## candidate ids before the pair join; no cartesian",
        "```",
        formatted(spark, ver),
        "```",
        "",
        "## with_nb_score (round 6) — pure map-side scoring via the broadcast",
        "## weight-map literal; training's explode+hash-agg ran at build time",
        "```",
        formatted(spark, nb),
        "```",
        "",
        "## domain_stats (round 6) — registered-domain extraction is scan-side;",
        "## ONE two-phase hash agg (exact distinct hosts inside the domain group)",
        "```",
        formatted(spark, dom),
        "```",
        "",
        "## filter_quality_auto (round 6) — histogram two-pass threshold table",
        "## broadcast joined back; corpus touched by the hash agg + filter only",
        "```",
        formatted(spark, qga),
        "```",
        "",
        "## source_gram_overlap (round 6) — one distinct (source, gram) agg,",
        "## pairs emitted map-side from bounded per-gram arrays; no self-join",
        "```",
        formatted(spark, ovl),
        "```",
        "",
        "## latest_by_key (round 6) — snapshot compaction as ONE partial+final",
        "## max(struct) agg: shuffle bytes ≈ keys, no Window, no per-key sort",
        "```",
        formatted(spark, snap),
        "```",
        "",
        "## history_intervals (round 6) — the per-key sort is inherent to SCD2",
        "## (each version needs its successor); ONE Window, bounded by",
        "## versions-per-key",
        "```",
        formatted(spark, hist),
        "```",
        "",
        "## funnel_times (round 6) — K conditional min-aggs chained by key",
        "## equi-joins; no Window, no per-user event sort, no collect_list",
        "```",
        formatted(spark, fun),
        "```",
        "",
        "## kmv_distinct_shingles (round 6) — bounded MapInPandas partial",
        "## (≤ k mins per key per partition), ONE exchange of sketch rows",
        "```",
        formatted(spark, kmv),
        "```",
        "",
        "## pagerank (round 6) — returned frame is the localCheckpoint scan;",
        "## per-round plans are one equi-join + one map-side-combinable sum",
        "## over cached src-partitioned edges (edges unpersisted on return)",
        "```",
        formatted(spark, pr),
        "```",
        "",
        "## events ROLLUP (round 6) — ONE Expand + single partial+final hash",
        "## agg: three grouping sets in one corpus scan",
        "```",
        formatted(spark, roll),
        "```",
        "",
        "## rate_spikes (round 6) — corpus touched by ONE hash agg; both",
        "## RANGE windows run over the (type, hour) aggregate only",
        "```",
        formatted(spark, spikes),
        "```",
        "",
        "## collocations (round 6) — two vocab-bounded hash aggs, vocab-keyed",
        "## count joins, TakeOrderedAndProject (no Window, no corpus sort)",
        "```",
        formatted(spark, coll),
        "```",
        "",
        "## cms_token_estimates (round 6) — ONE hash agg over the depth-",
        "## expanded token stream; the probe join broadcasts the counter table",
        "```",
        formatted(spark, cmsq),
        "```",
        "",
        "## inverted_index (round 6) — stats agg over per-doc-distinct pairs;",
        "## the collect_list branch sits above a join restricted to df ≤ cap",
        "```",
        formatted(spark, inv),
        "```",
        "",
        "## hash_split_per_key (round 6) — count agg + broadcast meta; the",
        "## rank window partitions by (key, hash-prefix bucket), never a",
        "## whole key",
        "```",
        formatted(spark, split),
        "```",
        "",
        "## cluster_canonical (round 6) — LSH clustering lineage feeding ONE",
        "## max(struct) partial+final agg per cluster (no per-cluster sort)",
        "```",
        formatted(spark, canon),
        "```",
        "",
        "## retention_cohorts (round 6) — distinct-pairs agg, min-day agg,",
        "## one user-keyed join, final two-phase countDistinct; no Window",
        "```",
        formatted(spark, ret),
        "```",
        "",
        "## rolling_active_users (round 6) — fan-out-the-aggregate: explode",
        "## the DISTINCT (user, day) pairs ×window, semi-join traffic days,",
        "## exact countDistinct per day; no range self-join of raw events",
        "```",
        formatted(spark, wau),
        "```",
        "",
        "## snapshot_diff (round 6) — payloads reduced to md5 MAP-SIDE before",
        "## the one full-outer join; the shuffle carries 32-byte digests",
        "```",
        formatted(spark, diff),
        "```",
        "",
        "## gopher_quality_signals (round 6) — pure map-side projection over",
        "## the scan: no Exchange anywhere in the plan",
        "```",
        formatted(spark, goph),
        "```",
        "",
        "## events pivot (round 6, explicit values) — corpus (day, type)",
        "## count agg, then pivotfirst over that bounded aggregate; no",
        "## distinct-scan pre-job, no Expand",
        "```",
        formatted(spark, piv),
        "```",
        "",
        "## bucketed_range_join (round 6) — point-in-interval as ONE bucket",
        "## equi-join + residual BETWEEN; no NestedLoop/Cartesian anywhere",
        "```",
        formatted(spark, rj),
        "```",
        "",
        "## ols_fit (round 6) — per-group exact OLS: ONE partial+final hash",
        "## agg over the fact table; no Window, no Join",
        "```",
        formatted(spark, ols),
        "```",
        "",
        "## with_global_ntile (round 6) — exact NTILE(10) over the bucketed",
        "## cumsum; the corpus total joins in as a broadcast ONE-ROW agg —",
        "## the BroadcastNestedLoopJoin below is that scalar join (build",
        "## side is exactly 1 row; the standard scalar-subquery shape, not",
        "## a pairwise nested loop); zero hash shuffles beyond the cumsum's",
        "```",
        formatted(spark, nt),
        "```",
        "",
        "## jaccard_allpairs (round 6) — prefix-filtered exact Jaccard join:",
        "## candidates from the sliced rarest-first prefix index only, then",
        "## candidate-restricted overlap verification. Dumped with",
        "## checkpoint=False to show the full structure; the op persists the",
        "## gram index (InMemoryTableScan leaves below = the ONE materialized",
        "## scan reused across five branches) and localCheckpoints the",
        "## bounded pair output on the query path",
        "```",
        formatted(spark, jp),
        "```",
        "",
        "## iqr_outlier_stats (round 6) — (key,value) histogram agg is the",
        "## only corpus-row shuffle; windows run over the histogram; fences",
        "## broadcast back",
        "```",
        formatted(spark, iqr),
        "```",
        "",
        "## gap_fill_hourly (round 6) — one corpus (type,hour) agg; spine",
        "## generation (Generate over per-type bounds) and the left join run",
        "## on aggregate-sized tables",
        "```",
        formatted(spark, gfill),
        "```",
        "",
        "## image_near_dup_pairs (round 6) — MapInPandas decode+hash kernel,",
        "## 4x16-bit band Generate, band equi-join (no nested loop),",
        "## popcount(xor) verify on candidates. Dumped with checkpoint=False",
        "## to show the join structure — the kernel appears on BOTH join",
        "## sides here; the production path (checkpoint=True) persists the",
        "## tiny hash projection so the decode runs ONCE and the bounded",
        "## pair output is localCheckpointed (ppjoin's pattern)",
        "```",
        formatted(spark, imgpairs),
        "```",
        "",
        "## with_audio_fingerprint (round 6) — single MapInPandas scan,",
        "## Arrow-batched; no shuffle at all",
        "```",
        formatted(spark, afp),
        "```",
        "",
        "## mad_outlier_stats (round 6) — two histogram two-passes (median,",
        "## median of deviations); medians ride broadcast joins; windows run",
        "## over histograms, never corpus rows",
        "```",
        formatted(spark, madp),
        "```",
        "",
        "## key_skew_report (round 6) — one corpus hash agg to per-key",
        "## counts; everything after is count-table-sized",
        "```",
        formatted(spark, skew),
        "```",
        "",
        "## incremental_sessionize (round 6) — prev sessions checkpointed",
        "## (scan leaves, no old-events window); dumped with",
        "## checkpoint=False so the NEW batch's single lag+running-sum",
        "## window pair is visible; untouched users pass via left_anti",
        "```",
        formatted(spark, inc),
        "```",
    ]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    spark.stop()


if __name__ == "__main__":
    main()
