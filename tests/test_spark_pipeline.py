"""Spark end-to-end tests: pipeline correctness (counts + routed-row
equality vs goldens), lineage/resume idempotence, streaming smoke, ops.

One shared local session (module-scoped fixture) keeps total runtime sane.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from buildlog_consultant_spark import fixtures
from buildlog_consultant_spark.spark import get_spark
from buildlog_consultant_spark.spark.pipeline import (
    aggregate_counts,
    classify_and_enrich,
    routed_rows_equal,
    run_pipeline,
)

N = 200


@pytest.fixture(scope="module")
def spark():
    s = get_spark("local[4]", app_name="tests")
    yield s
    s.stop()


@pytest.fixture(scope="module")
def enriched(spark):
    pages = fixtures.pages_df(spark, N, partitions=4)
    df = classify_and_enrich(pages).persist()
    df.count()
    yield df
    df.unpersist()


def test_counts_match_golden(spark, enriched):
    agg = aggregate_counts(enriched).collect()
    got = {
        (r.problem_kind, r.lang): r.n_matched
        for r in agg
        if r.problem_kind is not None
    }
    exp = {
        k: v for k, v in fixtures.expected_counts(N).items() if k[0] is not None
    }
    assert got == exp


def test_routed_rows_equal_golden(spark, enriched):
    golden = spark.createDataFrame(fixtures.golden_pdf(0, N))
    mine = enriched.where(F.col("match_line").isNotNull()).select(
        "url", "lang", "problem_kind", "lineno", "match_line", "details",
        "container", "stage", "phase",
    )
    assert routed_rows_equal(mine, golden)


def test_enrich_broadcast_plan(spark, enriched):
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_run_pipeline_resume(spark):
    out = tempfile.mkdtemp(prefix="blc_test_out_")
    try:
        pages = fixtures.pages_df(spark, 120, partitions=4)
        res1 = run_pipeline(spark, pages, out, n_shards=3)
        assert len(res1) == 3
        assert sum(r.input_count for r in res1) == 120
        # rerun: everything committed → nothing to do
        res2 = run_pipeline(spark, pages, out, n_shards=3)
        assert res2 == []
        lineage = spark.read.parquet(f"{out}/_lineage")
        assert lineage.count() == 3
        routed = spark.read.parquet(f"{out}/routed")
        assert routed.count() == 120
        # partitioned by sink_kind (fan-out happened)
        assert "sink_kind" in routed.columns
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_run_pipeline_single_scan(spark):
    """Scale invariant: the input is materialized ONCE for all shards —
    shard ids are a computed column, not per-shard input filters (which
    would re-scan the table n_shards times)."""
    out = tempfile.mkdtemp(prefix="blc_test_scan_")
    try:
        acc = spark.sparkContext.accumulator(0)
        pages = fixtures.pages_df(spark, 120, partitions=4)

        def count_rows(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        instrumented = pages.mapInPandas(count_rows, schema=pages.schema)
        res = run_pipeline(spark, instrumented, out, n_shards=4)
        assert sum(r.input_count for r in res) == 120
        assert acc.value == 120, f"input rows materialized {acc.value}×, want 120 (once)"
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_run_pipeline_waves_resume(spark):
    """Wave-granular checkpointing: 2 waves of 2 shards; rerun is a no-op
    and a partially-committed run resumes only the missing shards."""
    out = tempfile.mkdtemp(prefix="blc_test_wave_")
    try:
        pages = fixtures.pages_df(spark, 120, partitions=4)
        res1 = run_pipeline(spark, pages, out, n_shards=4, shards_per_wave=2)
        assert [r.shard for r in res1] == [0, 1, 2, 3]
        assert sum(r.input_count for r in res1) == 120
        res2 = run_pipeline(spark, pages, out, n_shards=4, shards_per_wave=2)
        assert res2 == []
        lineage = spark.read.parquet(f"{out}/_lineage")
        assert lineage.count() == 4
        routed = spark.read.parquet(f"{out}/routed")
        assert routed.count() == 120
        assert {"shard", "sink_kind"} <= set(routed.columns)
        counts = spark.read.parquet(f"{out}/counts")
        assert counts.select(F.sum("n")).collect()[0][0] == 120
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_iceberg_detection_and_fallback(spark, tmp_path):
    """No iceberg-spark-runtime jar ships in this image (and there is no
    network to fetch one) — detection must return False, strict mode must
    raise with the fix-it hint, and the default must fall back to parquet."""
    import pytest as _pytest

    from buildlog_consultant_spark.spark.pipeline import iceberg_available, load_pages

    path = str(tmp_path / "pages")
    fixtures.pages_df(spark, 20, partitions=2).write.parquet(path)
    if iceberg_available(spark):  # pragma: no cover — cluster with the jar
        df = load_pages(spark, path, fmt="iceberg", strict=True)
        assert df.count() >= 0
        return
    with _pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        load_pages(spark, path, fmt="iceberg", strict=True)
    assert load_pages(spark, path, fmt="iceberg").count() == 20


def _planted_embeddings(spark, n=200, dim=64, planted=20):
    """Deterministic corpus with a planted near-neighbor cluster around
    vec 0 (base + small perturbation, cosine ≳ 0.95) amid random vectors."""
    from buildlog_consultant_spark.ops.similarity import plane_component

    def comp(i, j):
        # splitmix-style mixer — an LCG here leaves vectors correlated
        # enough to create accidental near-dups among the "random" fill
        return plane_component(i, j, seed=777)

    base = [comp(0, j) for j in range(dim)]
    rows = [(0, base)]
    rows += [
        (i, [b + 0.15 * comp(i, j) for j, b in enumerate(base)])
        for i in range(1, planted + 1)
    ]
    rows += [(i, [comp(i, j) for j in range(dim)]) for i in range(planted + 1, n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_lsh_recall_on_planted_neighbors(spark):
    """LSH ANN is a near-duplicate retriever: on a planted high-cosine
    cluster its top-10 must equal the exact top-10 (recall 1.0,
    deterministic planes + data). On near-orthogonal random vectors (the
    driver embeddings table, max pair cosine 0.51) bucket collisions are
    ~random — that regime is cosine_topk's job, not LSH's."""
    from buildlog_consultant_spark.ops import similarity as S

    emb = _planted_embeddings(spark)
    exact = {r.vec_id for r in S.cosine_topk(emb, 0, k=10).collect()}
    approx = {r.vec_id for r in S.ann_topk_lsh(emb, 0, k=10, n_planes=6).collect()}
    assert len(exact & approx) == 10


def test_embedding_near_dups_finds_planted_cluster(spark):
    from buildlog_consultant_spark.ops import similarity as S

    emb = _planted_embeddings(spark)
    pairs = S.embedding_near_dups(emb, threshold=0.9, n_planes=6).collect()
    ids = {r.id_a for r in pairs} | {r.id_b for r in pairs}
    assert len(pairs) > 50  # the 21-member cluster pairs up
    assert ids <= set(range(21)), ids  # and nothing outside it
    """500 byte-identical docs must NOT produce O(m²) candidate pairs:
    exact-dedup collapses them pre-banding; with dedup off, the bucket cap
    drops the oversized bucket."""
    from buildlog_consultant_spark.ops.dedup import minhash_near_dup_pairs

    docs = spark.createDataFrame(
        [(i, "the same exact web page text repeated across the whole crawl") for i in range(500)],
        schema="doc_id long, text string",
    )
    assert minhash_near_dup_pairs(docs).count() == 0
    assert (
        minhash_near_dup_pairs(
            docs, dedup_exact_first=False, max_bucket=64, log_dropped=True
        ).count()
        == 0
    )


def test_streaming_smoke(spark):
    from buildlog_consultant_spark.streaming import (
        classify_stream,
        streaming_kind_counts,
    )

    src = tempfile.mkdtemp(prefix="blc_stream_src_")
    try:
        fixtures.pages_df(spark, 60, partitions=3).write.mode("overwrite").parquet(src)
        from buildlog_consultant_spark.streaming.pipeline import read_pages_stream

        stream = read_pages_stream(spark, src)
        assert stream.isStreaming
        counts = streaming_kind_counts(classify_stream(stream))
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName("kind_counts_stream")
            .start()
        )
        try:
            q.processAllAvailable()
            got = {
                (r.problem_kind, r.lang): r.n
                for r in spark.sql(
                    "select problem_kind, lang, sum(n) as n from kind_counts_stream "
                    "where problem_kind is not null group by 1, 2"
                ).collect()
            }
            exp = {
                k: v
                for k, v in fixtures.expected_counts(60).items()
                if k[0] is not None
            }
            assert got == exp
        finally:
            q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_streaming_routed_sink(spark):
    """Streaming → enrich → salted fan-out sink via foreachBatch: the batch
    pipeline's route_fanout is reused verbatim per micro-batch, landing the
    same partitioned layout (sink_kind=...) in append mode."""
    from buildlog_consultant_spark.spark.enrich import enrich_with_remediation
    from buildlog_consultant_spark.spark.pipeline import route_fanout
    from buildlog_consultant_spark.streaming.pipeline import (
        classify_stream,
        read_pages_stream,
    )

    src = tempfile.mkdtemp(prefix="blc_stream_route_src_")
    out = tempfile.mkdtemp(prefix="blc_stream_route_out_") + "/routed"
    try:
        fixtures.pages_df(spark, 60, partitions=3).write.mode("overwrite").parquet(src)
        stream = read_pages_stream(spark, src, max_files_per_trigger=2)

        def write_batch(batch_df, epoch_id):
            route_fanout(enrich_with_remediation(batch_df), out, mode="append")

        q = classify_stream(stream).writeStream.foreachBatch(write_batch).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        routed = spark.read.parquet(out)
        assert routed.count() == 60
        assert "sink_kind" in routed.columns
        assert routed.where(F.col("sink_kind") != "__unmatched__").count() > 0
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(out.rsplit("/", 1)[0], ignore_errors=True)


def test_connected_components(spark):
    """Min-label propagation over a chain (worst diameter), a triangle, and
    an isolated pair — labels must settle to each component's min id."""
    from buildlog_consultant_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, triangle 10-11-12, pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "id_a long, id_b long",
    )
    got = {r.id: r.cluster for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_xxh64_matches_spark(spark):
    """ops/xxh64.py is the oracle-side hash: pin bit-identity to Spark's
    xxhash64 for strings (seed 42) and the multi-arg long-seed chain."""
    import struct

    from buildlog_consultant_spark.ops.xxh64 import xxh64, xxh64_signed

    toks = ["", "a", "hello world", "x" * 31, "y" * 32, "z" * 100, "üñïçødé", "汉字词"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(toks)], "b long, t string")
    rows = df.select(
        "b", "t",
        F.xxhash64("t").alias("h1"),
        F.xxhash64("b", "t").alias("h2"),
    ).collect()
    for r in rows:
        assert xxh64_signed(r.t.encode()) == r.h1
        chained = xxh64(r.t.encode(), xxh64(struct.pack("<q", r.b), 42))
        chained = chained - (1 << 64) if chained >= (1 << 63) else chained
        assert chained == r.h2


def test_streaming_stateful_first_seen(spark):
    """applyInPandasWithState: only the first doc per kind crosses the
    stream, across micro-batches."""
    import tempfile

    from buildlog_consultant_spark.streaming.pipeline import (
        classify_stream,
        read_pages_stream,
        streaming_first_seen,
    )

    src = tempfile.mkdtemp(prefix="blc_state_src_")
    try:
        fixtures.pages_df(spark, 80, partitions=4).write.mode("overwrite").parquet(src)
        stream = read_pages_stream(spark, src, max_files_per_trigger=1)
        firsts = streaming_first_seen(classify_stream(stream))
        q = (
            firsts.writeStream.outputMode("append")
            .format("memory")
            .queryName("first_seen_stream")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("select * from first_seen_stream").collect()
            kinds = [r.problem_kind for r in rows]
            # exactly one row per kind despite many docs per kind
            assert len(kinds) == len(set(kinds)) and len(kinds) >= 4, kinds
        finally:
            q.stop()
    finally:
        shutil.rmtree(src, ignore_errors=True)


def test_multimodal_plumbing(spark):
    from buildlog_consultant_spark.ops.multimodal import extract_media_meta

    pages = fixtures.pages_df(spark, 20, partitions=2)
    meta = extract_media_meta(pages).collect()
    assert len(meta) == 20
    # html bytes aren't BMP/WAV → deterministic stub path, clearly labeled
    by_url = {r.url: r for r in meta}
    page0, _ = fixtures.make_doc(0)
    import hashlib

    r = by_url[page0["url"]]
    assert r.media_type == "unknown"
    assert r.n_bytes == len(page0["html"])
    assert r.sha1 == hashlib.sha1(page0["html"]).hexdigest()
    assert 64 <= r.fake_width < 256


def test_multimodal_real_decoders(spark):
    """BMP/WAV/PNG are decoded for real (header parse + numpy stats, PNG
    via stdlib zlib), JPEG at header level (SOF dims); the golden
    expectations come from the generating arrays, not the decoders."""
    from buildlog_consultant_spark.ops.multimodal import extract_media_meta

    media = fixtures.media_df(spark, 32, partitions=2)
    got = {r.url: r.asDict() for r in extract_media_meta(media, binary_col="media").collect()}
    assert len(got) == 32
    counts: dict = {}
    for i in range(32):
        _, golden = fixtures.make_media(i)
        row = got[golden["url"]]
        for k, v in golden.items():
            assert row[k] == v, (i, k, row[k], v)
        counts[golden["media_type"]] = counts.get(golden["media_type"], 0) + 1
    assert counts == {
        "image/bmp": 16, "audio/wav": 4, "image/jpeg": 4, "image/png": 4,
        "video/mp4": 2, "unknown": 2,
    }


def test_bmp_wav_roundtrip_unit():
    import numpy as np

    from buildlog_consultant_spark.ops.multimodal import (
        decode_bmp,
        decode_wav,
        encode_bmp,
        encode_wav,
    )

    px = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    meta = decode_bmp(encode_bmp(px))
    assert meta["width"] == 4 and meta["height"] == 5
    assert meta["mean_r_milli"] == int(px[:, :, 0].astype(int).sum() * 1000 // 20)
    samples = (np.arange(100) % 64 - 32).astype(np.int16)
    w = decode_wav(encode_wav(samples, 16000))
    assert w["sample_rate"] == 16000 and w["n_samples"] == 100
    # junk is neither
    assert decode_bmp(b"not a bmp at all, definitely not") is None
    assert decode_wav(b"RIFFxxxxNOPE") is None


def test_dedup_ops(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from buildlog_consultant_spark.ops.dedup import dedup_exact, exact_dup_groups

    groups = exact_dup_groups(docs)
    n_groups = groups.count()
    n_docs = docs.count()
    deduped = dedup_exact(docs)
    assert deduped.count() == n_groups <= n_docs


def test_details_json_survives_write_read(spark, enriched, tmp_path):
    """North-rule invariant: the details JSON column round-trips through the
    sink byte-identically (kind registry note in SURVEY §1)."""
    out = str(tmp_path / "roundtrip")
    src = enriched.where(F.col("details").isNotNull()).select("url", "details")
    src.write.parquet(out)
    back = spark.read.parquet(out)
    before = {r.url: r.details for r in src.collect()}
    after = {r.url: r.details for r in back.collect()}
    assert before == after and len(before) > 50
    # and each payload reconstructs to an equal Problem
    import json

    from buildlog_consultant_spark.core.problems import canonical_json, problem_from_json

    kinds = {
        r.url: r.problem_kind
        for r in enriched.where(F.col("details").isNotNull())
        .select("url", "problem_kind")
        .collect()
    }
    for url, details in list(before.items())[:50]:
        p = problem_from_json(kinds[url], json.loads(details))
        assert canonical_json(p.details) == details


def test_salted_fanout_spreads_hot_kind(spark):
    """Skew evidence: the dominant problem_kind must land in more than one
    task after the salted repartition (missing-python-module is ~18% of the
    corpus by construction — unsalted it would hotspot one partition)."""
    from buildlog_consultant_spark.spark.pipeline import route_fanout  # noqa: F401

    # AQE's partition coalescing folds this tiny test shuffle into one
    # partition (its 64MB bin target >> the whole corpus); disable it here —
    # at real scale the bins preserve the salted spread.
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        pages = fixtures.pages_df(spark, 400, partitions=4)
        enriched = classify_and_enrich(pages)
        salted = enriched.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("url")), F.lit(8))
        )
        sink_key = F.coalesce(F.col("problem_kind"), F.lit("__unmatched__"))
        spread = (
            salted.withColumn("sink_kind", sink_key)
            .repartition(F.col("sink_kind"), F.col("_salt"))
            .withColumn("pid", F.spark_partition_id())
            .groupBy("sink_kind")
            .agg(F.countDistinct("pid").alias("n_partitions"), F.count("*").alias("n"))
            .collect()
        )
        hot = {r.sink_kind: r for r in spread}["missing-python-module"]
        assert hot.n > 30
        assert hot.n_partitions > 1, spread
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def test_lang_guess(spark):
    from buildlog_consultant_spark.ops.text import with_lang_guess

    df = spark.createDataFrame(
        [("the cat and the dog of the house",), ("der hund und die katze ist",), ("zzz",)],
        schema="text string",
    )
    got = [r.lang_guess for r in with_lang_guess(df).collect()]
    assert got[0] == "en" and got[1] == "de" and got[2] == "und"
