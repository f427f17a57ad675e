"""Round-5 tests: asof NULL-ts semantics, the NULL-text coalesce policy in
text.py, the TakeOrderedAndProject int8 top-k + exact re-rank, the
histogram-based exact quantiles, the bounded dropped-bucket observer, and
run_pipeline's max_waves budget knob."""

import datetime
import threading
import time

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops import dedup as dedup_ops
from buildlog_consultant_spark.ops import similarity as sim_ops
from buildlog_consultant_spark.ops import text as text_ops
from buildlog_consultant_spark.ops.asof import asof_join


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _ts(minute):
    return datetime.datetime(2026, 1, 1, 12, minute, 0)


# ---------------------------------------------------------------------------
# asof_join NULL-timestamp semantics (ADVICE r4, medium)
# ---------------------------------------------------------------------------


def test_asof_null_ts_right_row_never_matches(spark):
    """A NULL-ts right row must never be carried as a match: DuckDB ASOF's
    l.ts >= NULL is never true. Without the right-side ts filter the
    NULL-ts row sorts nulls-first and last(ignorenulls) smears it onto
    every left row with no earlier real right row."""
    left = spark.createDataFrame(
        [
            Row(event_id=100, user_id=1, ts=_ts(3)),   # before any real click
            Row(event_id=101, user_id=1, ts=_ts(6)),   # after click 2
        ]
    )
    right = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=None),       # NULL ts — never a match
            Row(event_id=2, user_id=1, ts=_ts(5)),
        ],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r for r in asof_join(left, right, on="user_id").collect()}
    assert got[100]["asof_event_id"] is None
    assert got[100]["asof_gap_sec"] is None
    assert got[101]["asof_event_id"] == 2
    assert got[101]["asof_gap_sec"] == 60


def test_asof_null_ts_left_row_kept_unmatched(spark):
    """A NULL-ts left row is kept with NULL match columns (it satisfies no
    l.ts >= r.ts predicate): it sorts nulls-first, ahead of every real
    right row, so the running last() sees nothing."""
    left = spark.createDataFrame(
        [Row(event_id=100, user_id=1, ts=None)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame([Row(event_id=2, user_id=1, ts=_ts(1))])
    rows = asof_join(left, right, on="user_id").collect()
    assert len(rows) == 1
    assert rows[0]["asof_event_id"] is None and rows[0]["asof_gap_sec"] is None


# ---------------------------------------------------------------------------
# NULL-text coalesce policy in text.py (ADVICE r4)
# ---------------------------------------------------------------------------


def test_word_ngrams_null_text_emits_no_grams(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="a b c d e f g h i")],
        "doc_id long, text string",
    )
    got = text_ops.word_ngrams(df, n=8).collect()
    assert all(r["doc_id"] == 2 for r in got)
    assert len(got) == 2  # 9 words → two 8-grams
    assert all(r["gram"] != "" for r in got)


def test_repetition_signals_null_text_zeroed_and_kept(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="w w w w w w w w w w")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text_ops.with_repetition_signals(df).collect()}
    assert got[1]["n_words"] == 0 and got[1]["dup_word_pct"] == 0
    assert got[1]["dup_bigram_pct"] == 0
    # filter_repetitive must KEEP the NULL-text doc (zero metrics), not
    # silently drop it on NULL comparisons
    kept = {r["doc_id"] for r in text_ops.filter_repetitive(df).collect()}
    assert kept == {1}


def test_all_text_ops_null_policy(spark):
    """Round-5 sweep: EVERY text.py operator follows the dedup.py NULL→''
    policy — a NULL-text doc behaves exactly like an empty-text doc
    (counts 0, quality 50, lang 'und', md5('') fingerprint) instead of
    propagating NULLs that downstream filters silently drop."""
    import hashlib

    df = spark.createDataFrame(
        [Row(doc_id=1, text=None, lang="en"),
         Row(doc_id=2, text="", lang="en")],
        "doc_id long, text string, lang string",
    )
    tok = {r["doc_id"]: r for r in text_ops.with_token_count(df).collect()}
    assert tok[1]["n_tokens"] == 0 == tok[2]["n_tokens"]
    bpe = {r["doc_id"]: r for r in text_ops.with_bpe_token_count(df).collect()}
    assert bpe[1]["n_bpe_tokens"] == 0 == bpe[2]["n_bpe_tokens"]
    q = {r["doc_id"]: r for r in text_ops.with_quality_score(df).collect()}
    assert q[1]["quality"] == 50 == q[2]["quality"]
    lg = {r["doc_id"]: r for r in text_ops.with_lang_guess(df).collect()}
    assert lg[1]["lang_guess"] == "und" == lg[2]["lang_guess"]
    fp = {r["doc_id"]: r for r in text_ops.with_fingerprint(df).collect()}
    empty_md5 = hashlib.md5(b"").hexdigest()[:16]
    assert fp[1]["fingerprint"] == empty_md5 == fp[2]["fingerprint"]
    tt = text_ops.token_topk(df, k=3).collect()
    assert {(r["token"], r["n"]) for r in tt} == {("", 2)}


def test_tfidf_null_text_coalesced(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="alpha beta alpha")],
        "doc_id long, text string",
    )
    got = text_ops.tfidf_topk(df, k=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # the NULL-text doc contributes one '' term row, never a NULL term
    assert all(r["term"] is not None for r in got)
    assert {r["term"] for r in by_doc[1]} == {""}
    assert {r["term"] for r in by_doc[2]} == {"alpha", "beta"}


# ---------------------------------------------------------------------------
# int8 ANN: top-k shape, ValueError parity, exact re-rank composition
# ---------------------------------------------------------------------------


def _toy_embeddings(spark, n=30, dim=64):
    rows = [
        (i, [float(((i * 31 + j * 7) % 13) - 6) + 0.5 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_topk_int8_missing_query_raises(spark):
    emb = _toy_embeddings(spark)
    with pytest.raises(ValueError, match="not found"):
        sim_ops.ann_topk_int8(emb, query_vec_id=999)


def test_ann_topk_int8_rerank_matches_exact_when_unbounded(spark):
    """With rerank_factor×k covering the whole corpus the re-ranked result
    must equal the exact brute-force cosine top-k — the quantized pass is
    then pure candidate selection and the float pass decides everything."""
    emb = _toy_embeddings(spark, n=30)
    exact = [
        r["vec_id"]
        for r in sim_ops.cosine_topk(emb, 0, k=5).collect()
    ]
    rer = [
        r["vec_id"]
        for r in sim_ops.ann_topk_int8_rerank(emb, 0, k=5, rerank_factor=10)
        .orderBy("rank")
        .collect()
    ]
    assert rer == exact


def test_ann_topk_int8_ranks_contiguous(spark):
    got = sim_ops.ann_topk_int8(_toy_embeddings(spark), 0, k=5).orderBy("rank").collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # descending integer scores, id-ascending at ties
    qd = [r["qdot"] for r in got]
    assert qd == sorted(qd, reverse=True)


# ---------------------------------------------------------------------------
# histogram-based exact quantiles
# ---------------------------------------------------------------------------


def test_quality_quantiles_matches_sort_based_reference(spark):
    """The two-pass histogram formulation must reproduce the nearest-rank
    order statistics of the (scale-unsafe) per-lang full-sort reference."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=i, lang=("en" if i % 3 else "de"),
                text=("word " * ((i * 17) % 29 + 1)).strip() + ("!" * (i % 7)))
            for i in range(200)
        ]
    )
    ps = (25, 50, 75, 95)
    d = text_ops.with_quality_score(docs)
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    wn = Window.partitionBy("lang")
    ref = (
        d.select(
            "lang", "quality",
            F.row_number().over(w).alias("rn"),
            F.count("*").over(wn).alias("n"),
        )
        .select(
            "lang", "quality", "rn", "n",
            F.explode(F.array(*[F.lit(p) for p in ps])).alias("p"),
        )
        .where(F.col("rn") == F.floor((F.col("p") * F.col("n") + 99) / 100))
        .select("lang", F.col("p").cast("int").alias("p"), "quality")
    )
    got = {
        (r["lang"], r["p"]): r["quality"]
        for r in text_ops.quality_quantiles(docs, ps).collect()
    }
    want = {(r["lang"], r["p"]): r["quality"] for r in ref.collect()}
    assert got == want and len(got) == 8


# ---------------------------------------------------------------------------
# bounded dropped-bucket observer (ADVICE r4)
# ---------------------------------------------------------------------------


def _grouped(spark):
    df = spark.createDataFrame(
        [Row(k=i % 2, v=i) for i in range(10)]
    )
    return df.groupBy("k").agg(F.collect_list("v").alias("ids"))


def test_observation_probe_none_before_action_then_metrics(spark):
    observed = dedup_ops._observe_dropped(_grouped(spark), 1, "round5probe")
    obs = dedup_ops._dropped_observations["round5probe"]
    assert dedup_ops._observation_metrics(obs, block=False) is None
    observed.collect()
    got = None
    for _ in range(100):
        got = dedup_ops._observation_metrics(obs, block=False)
        if got:
            break
        time.sleep(0.1)
    assert got and got["n_dropped"] == 2 and got["n_buckets"] == 2


def test_observer_thread_exits_without_action(spark, monkeypatch):
    """A frame that is built but never executed must not leak a blocked
    observer thread for the life of the driver (ADVICE r4): the poll loop
    gives up after _OBS_WAIT_SECS."""
    monkeypatch.setattr(dedup_ops, "_OBS_WAIT_SECS", 1.0)
    dedup_ops._observe_dropped(_grouped(spark), 1, "round5orphan")
    threads = [
        t for t in threading.enumerate() if t.name == "round5orphan-dropped-log"
    ]
    assert threads
    threads[0].join(15)
    assert not threads[0].is_alive()


# ---------------------------------------------------------------------------
# baseline JPEG full decode (VERDICT r4 #8: the stub is video-only now)
# ---------------------------------------------------------------------------


def _jpeg_mods():
    import numpy as np

    from buildlog_consultant_spark.ops.multimodal import (
        decode_jpeg,
        encode_jpeg,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    return np, decode_jpeg, encode_jpeg, rgb_to_ycbcr, ycbcr_to_rgb


def test_jpeg_solid_roundtrip_exact_444_and_420():
    """Solid-color images survive the all-ones-quant DCT round-trip
    exactly (DC-only blocks; constant chroma is subsampling-lossless), so
    the decoded means equal the JFIF color-transform replay of the source
    color — the by-construction property the media_meta oracle uses."""
    np, decode_jpeg, encode_jpeg, fwd, inv = _jpeg_mods()
    rgb = np.full((16, 24, 3), (200, 64, 33), dtype=np.uint8)
    exp = inv(fwd(rgb))[0, 0]
    for sub in (False, True):
        got = decode_jpeg(encode_jpeg(rgb, subsample=sub))
        assert (got["width"], got["height"]) == (24, 16)
        assert got["mean_r_milli"] == int(exp[0]) * 1000
        assert got["mean_g_milli"] == int(exp[1]) * 1000
        assert got["mean_b_milli"] == int(exp[2]) * 1000


def test_jpeg_gradient_within_rounding():
    """Non-constant content: 4:4:4 decode means must track the color-
    transform reference to within DCT float rounding; 4:2:0 within the
    chroma-blur envelope. Odd (non-multiple-of-8/16) dims exercise the
    padding/crop path."""
    np, decode_jpeg, encode_jpeg, fwd, inv = _jpeg_mods()
    yy, xx = np.mgrid[0:17, 0:31]
    px = np.stack(
        [(xx * 11) % 256, (yy * 5) % 256, (xx * yy) % 256], -1
    ).astype(np.uint8)
    ref = inv(fwd(px)).astype(np.int64)
    n = 17 * 31
    refm = [int(ref[:, :, c].sum() * 1000 // n) for c in range(3)]
    d444 = decode_jpeg(encode_jpeg(px))
    d420 = decode_jpeg(encode_jpeg(px, subsample=True))
    assert (d444["width"], d444["height"]) == (31, 17)
    for c, k in enumerate(("mean_r_milli", "mean_g_milli", "mean_b_milli")):
        assert abs(d444[k] - refm[c]) <= 2000, (k, d444[k], refm[c])
        assert abs(d420[k] - refm[c]) <= 15000, (k, d420[k], refm[c])


def test_jpeg_fallback_to_header_dims():
    """Outside the baseline envelope the decoder degrades to the SOFn
    header dims (never crashes, never stubs): progressive marker (SOF2)
    and a truncated entropy scan both keep real width/height."""
    np, decode_jpeg, encode_jpeg, _, _ = _jpeg_mods()
    rgb = np.full((8, 8, 3), (10, 200, 90), dtype=np.uint8)
    data = encode_jpeg(rgb)
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    got = decode_jpeg(prog)
    assert got == {"width": 8, "height": 8}
    truncated = data[: len(data) - (len(data) - data.find(b"\xff\xda")) // 2]
    got_t = decode_jpeg(truncated)
    assert got_t is not None and (got_t["width"], got_t["height"]) == (8, 8)
    assert got_t.get("mean_r_milli") is None
    assert decode_jpeg(b"GIF89a") is None


def test_jpeg_malformed_segments_degrade_not_crash():
    """Self-review r5: malformed fixed-field segments (short SOF body,
    empty SOS, short DRI) and a zero-width SOF must degrade — never raise
    through classify_and_decode into a Spark task failure."""
    from buildlog_consultant_spark.ops.multimodal import (
        classify_and_decode,
        decode_jpeg,
    )

    bad = [
        bytes.fromhex("ffd8ffc000040800"),  # SOF0 with ln=4: 2-byte body
        b"\xff\xd8\xff\xda\x00\x02",        # SOS with empty body
        b"\xff\xd8\xff\xdd\x00\x02",        # DRI with no interval bytes
    ]
    for b in bad:
        assert decode_jpeg(b) is None
        assert classify_and_decode(b)["media_type"] == "unknown"
    # zero-width SOF: header path rejects w<=0, the pixel path must too
    # (previously emitted width=0 with int64//0 == 0 bogus means)
    zw = (
        b"\xff\xd8\xff\xc0" + (17).to_bytes(2, "big")
        + bytes([8, 0, 8, 0, 0, 3])
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    assert decode_jpeg(zw) is None
    assert classify_and_decode(zw)["media_type"] == "unknown"


def test_jpeg_work_budgets_fall_back_to_header():
    """Self-review r5: the pure-Python entropy decode is budgeted — an
    image over the pixel budget or a scan over the byte budget keeps
    header-level dims instead of stalling an executor task."""
    np, decode_jpeg, encode_jpeg, _, _ = _jpeg_mods()
    from buildlog_consultant_spark.ops import multimodal as mm

    rgb = np.full((8, 8, 3), (9, 9, 9), dtype=np.uint8)
    data = encode_jpeg(rgb)
    # inflate the scan segment past the byte budget
    cut = data.find(b"\xff\xda") + 20
    oversized = data[:cut] + b"\x55" * (mm._JPEG_MAX_SCAN_BYTES + 1)
    assert decode_jpeg(oversized) == {"width": 8, "height": 8}
    # shrink the pixel budget: the same valid image falls back to dims
    orig = mm._JPEG_MAX_DECODE_PIXELS
    try:
        mm._JPEG_MAX_DECODE_PIXELS = 16
        assert decode_jpeg(data) == {"width": 8, "height": 8}
    finally:
        mm._JPEG_MAX_DECODE_PIXELS = orig


def test_media_goldens_full_roundtrip():
    """Every fixture media row's golden fields must be reproduced by the
    dispatch decoder — including the real-JPEG rows' exact means and the
    header-only JPEG rows' dims (i%16==11 fallback path)."""
    from buildlog_consultant_spark import fixtures
    from buildlog_consultant_spark.ops.multimodal import classify_and_decode

    seen_types = set()
    for i in range(32):
        row, golden = fixtures.make_media(i)
        meta = classify_and_decode(bytes(row["media"]))
        seen_types.add(meta["media_type"])
        for k, v in golden.items():
            if k == "url":
                continue
            assert meta.get(k) == v, (i, k, meta.get(k), v)
    assert seen_types == {
        "image/bmp", "audio/wav", "image/png", "image/jpeg",
        "video/mp4", "unknown",
    }


def test_mp4_header_decode():
    """ISO BMFF box walk: real tkhd dims (16.16 fixed, v0 and v1 layouts)
    + mvhd duration; audio tracks (0×0) skipped; non-BMFF rejected."""
    import struct

    from buildlog_consultant_spark.ops.multimodal import (
        classify_and_decode,
        decode_mp4_header,
        encode_mp4_header,
    )

    data = encode_mp4_header(1920, 1080, 4500)
    assert decode_mp4_header(data) == {
        "width": 1920, "height": 1080, "duration_ms": 4500,
    }
    meta = classify_and_decode(data)
    assert meta["media_type"] == "video/mp4" and meta["width"] == 1920
    assert meta["fake_width"] is None  # real metadata, not the stub
    assert decode_mp4_header(b"GIF89a" + b"\x00" * 20) is None
    assert decode_mp4_header(b"") is None
    # truncated box tree must not crash and keeps whatever parsed
    assert decode_mp4_header(data[:40]) is not None
    # v1 tkhd layout: rewrite the version byte and shift the field block
    tkhd_off = data.find(b"tkhd") + 4
    v1_body = (
        b"\x01\x00\x00\x07"
        + struct.pack(">QQIIQ", 0, 0, 1, 0, 4500)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", 640 << 16, 360 << 16)
    )
    trak_body = struct.pack(">I", len(v1_body) + 8) + b"tkhd" + v1_body
    trak = struct.pack(">I", len(trak_body) + 8) + b"trak" + trak_body
    mvhd_start = data.find(b"mvhd") - 4
    mvhd = data[mvhd_start : mvhd_start + struct.unpack_from(">I", data, mvhd_start)[0]]
    moov_body = mvhd + trak
    moov = struct.pack(">I", len(moov_body) + 8) + b"moov" + moov_body
    ftyp_len = struct.unpack_from(">I", data, 0)[0]
    v1_data = data[:ftyp_len] + moov
    got = decode_mp4_header(v1_data)
    assert got["width"] == 640 and got["height"] == 360


# ---------------------------------------------------------------------------
# skewed-corpus fan-out: salting bounds per-task rows (SURVEY §7 "Skew")
# ---------------------------------------------------------------------------


def _skewed_enriched(spark, n=600, hot_share=0.6):
    """Skewed classified corpus: one kind holds ≥ hot_share of the docs —
    the dominant-missing-* shape SURVEY §7 calls out."""
    n_hot = int(n * hot_share)
    rows = [
        Row(
            url=f"https://logs.example.org/doc/{i:06d}",
            lang="en",
            problem_kind=("missing-hot-dep" if i < n_hot else f"kind-{i % 7}"),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows), n_hot


def _hot_file_counts(spark, out):
    rows = (
        spark.read.parquet(out)
        .where(F.col("sink_kind") == "missing-hot-dep")
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    return [r["count"] for r in rows]


def test_salted_fanout_bounds_hot_kind_tasks(spark, tmp_path):
    """With salting OFF the hot kind (60% of the corpus) lands in ONE
    shuffle task/file — the hot-spot. With salting ON it spreads over
    multiple tasks with a bounded per-task share. AQE is disabled for the
    assertion: its size-based coalescer re-merges the toy-sized salted
    partitions (at crawl scale a hot kind exceeds the 64 MB advisory
    target and stays split — locally everything is 'small'), and the test
    must show the raw salt spread the shuffle produces."""
    from buildlog_consultant_spark.spark.pipeline import route_fanout

    enriched, n_hot = _skewed_enriched(spark)
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out_off = str(tmp_path / "off")
        route_fanout(enriched, out_off, salt_buckets=1)
        off = _hot_file_counts(spark, out_off)
        assert len(off) == 1 and off[0] == n_hot  # the hot-spot, demonstrated

        out_on = str(tmp_path / "on")
        route_fanout(enriched, out_on, salt_buckets=8)
        on = _hot_file_counts(spark, out_on)
        assert sum(on) == n_hot
        assert len(on) >= 3, on  # spread over tasks (8 salts, hash-merged ≥3)
        assert max(on) <= n_hot * 0.5, on  # no task carries half the hot kind
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.shuffle.partitions", "4")


def test_choose_salt_buckets_from_histogram_probe(spark):
    """SURVEY §7: salt factor = ceil(hot-kind estimate / per-task row
    budget), probed from the kind histogram; clamped to [1, cap]."""
    from buildlog_consultant_spark.spark.pipeline import choose_salt_buckets

    enriched, n_hot = _skewed_enriched(spark)  # 360 hot rows
    assert (
        choose_salt_buckets(
            enriched, target_rows_per_task=100, sample_fraction=1.0
        )
        == 4  # ceil(360 / 100)
    )
    assert (
        choose_salt_buckets(enriched, target_rows_per_task=10**9, sample_fraction=1.0)
        == 1
    )
    assert (
        choose_salt_buckets(
            enriched, target_rows_per_task=1, sample_fraction=1.0, cap=16
        )
        == 16
    )


# ---------------------------------------------------------------------------
# URL canonicalization + compression-ratio quality signal (round-5 ops)
# ---------------------------------------------------------------------------


def test_canonical_url_spark_python_parity(spark):
    """The Catalyst canonical_url expression and the Python replay
    (oracle side) must agree byte-for-byte across every rule's trigger:
    case, userinfo, default/non-default ports, duplicate+trailing
    slashes, tracking-vs-real params, fragments, empty paths."""
    from buildlog_consultant_spark.ops.web import canonical_url, py_canonical_url

    urls = [
        "https://Example.COM/Path/A",
        "http://user:pw@host.example/x",
        "https://example.com:443/a",
        "https://example.com:8443/a",
        "http://example.com:80/a",
        "http://example.com:8080/a",
        "https://example.com//a///b//",
        "https://example.com/a/",
        "https://example.com/",
        "https://example.com",
        "https://example.com/a?utm_source=x&id=3&utm_medium=y",
        "https://example.com/a?gclid=zz&fbclid=q",
        "https://example.com/a?real=1",
        "https://example.com/a#frag",
        "HTTPS://EXAMPLE.com/a?utm_campaign=c#x",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r[0]
        for r in df.select(canonical_url("url")).collect()
    ]
    want = [py_canonical_url(u) for u in urls]
    assert got == want, list(zip(urls, got, want))
    # spot semantic checks
    m = dict(zip(urls, got))
    assert m["https://example.com:443/a"] == "https://example.com/a"
    assert m["https://example.com:8443/a"] == "https://example.com:8443/a"
    assert m["https://example.com//a///b//"] == "https://example.com/a/b"
    assert m["https://example.com"] == "https://example.com/"
    assert m["https://example.com/a?utm_source=x&id=3&utm_medium=y"] == (
        "https://example.com/a?id=3"
    )
    assert m["http://user:pw@host.example/x"] == "http://host.example/x"


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the canonical form is a
    fixed point (a second pass over already-clean URLs in an incremental
    pipeline must be a no-op)."""
    from buildlog_consultant_spark.ops.web import canonical_url

    urls = [
        "https://Example.COM/Path//A/?utm_source=x&id=3#f",
        "http://u@h.example:80//x//",
        "https://example.com",
        "https://example.com/a?real=1&gclid=g",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url("url").alias("c1"))
    twice = once.select(F.col("c1"), canonical_url(F.col("c1")).alias("c2"))
    for r in twice.collect():
        assert r["c1"] == r["c2"], r


def test_dedup_by_canonical_url(spark):
    from buildlog_consultant_spark.ops.web import dedup_by_canonical_url

    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="https://A.com/x/"),
            Row(doc_id=2, url="https://a.com/x"),
            Row(doc_id=3, url="https://a.com:443/x#f"),
            Row(doc_id=4, url="https://b.com/y"),
        ]
    )
    kept = sorted(r["doc_id"] for r in dedup_by_canonical_url(df).collect())
    assert kept == [1, 4]


def test_url_dedup_unparseable_urls_kept(spark):
    """Unparseable/NULL URLs (canonical form NULL) must be KEPT by the
    dedup endpoint and excluded from duplicate groups — not collapsed
    into one giant NULL 'duplicate' set."""
    from buildlog_consultant_spark.ops.web import (
        dedup_by_canonical_url,
        url_dup_groups,
    )

    df = spark.createDataFrame(
        [
            Row(doc_id=1, url="not a url"),
            Row(doc_id=2, url="also/not?one"),
            Row(doc_id=3, url=None),
            Row(doc_id=4, url="https://a.com/x"),
            Row(doc_id=5, url="https://A.com/x/"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(r["doc_id"] for r in dedup_by_canonical_url(df).collect())
    assert kept == [1, 2, 3, 4]
    groups = url_dup_groups(df).collect()
    assert len(groups) == 1 and groups[0]["canon_url"] == "https://a.com/x"


def test_compression_ratio_signal(spark):
    """Repetitive text compresses far below prose; NULL/empty → 0; the
    gate keeps prose and drops boilerplate and junk extremes."""
    import random

    rng = random.Random(7)
    junk = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(400))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="spam " * 200),
            Row(doc_id=2, text=(
                "The quick brown fox jumps over the lazy dog and then wanders "
                "through a surprisingly verbose paragraph about nothing much. "
            ) * 4),
            Row(doc_id=3, text=junk),
            Row(doc_id=4, text=None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["compression_permille"]
        for r in text_ops.with_compression_ratio(df).collect()
    }
    assert got[1] < 100          # boilerplate compresses hard
    assert 200 <= got[2] <= 700  # prose mid-range
    assert got[3] > 700          # random junk barely compresses
    assert got[4] == 0           # NULL policy
    kept = {r["doc_id"] for r in text_ops.filter_compressible(df).collect()}
    # NULL-text doc 4 passes through unconditionally (ADVICE r5: uniform
    # NULL policy with filter_repetitive / filter_span_duplicated)
    assert kept == {2, 4}


# ---------------------------------------------------------------------------
# exact duplicated-substring spans (ExactSubstr, Lee et al. 2022)
# ---------------------------------------------------------------------------


def _span_docs():
    return [
        (1, "a b c d e f g h i j k l m"),
        (2, "z z a b c d e f g h i j q r"),      # shares a..j with doc 1
        (3, "one two three four five six seven eight "
            "one two three four five six seven eight tail"),  # internal repeat
        (4, None),
        (5, "short text"),
    ]


def test_duplicated_spans_matches_python_replay(spark):
    """Spark span detection must equal the Python oracle replay exactly:
    cross-doc overlap (docs 1-2 share tokens a..j → 10-token spans),
    within-doc repetition (doc 3: two maximal 8-token spans — the grams
    bridging the repeat boundary are unique so the runs don't merge),
    NULL and too-short docs emit nothing."""
    from buildlog_consultant_spark.ops.spans import (
        duplicated_spans,
        py_duplicated_spans,
    )

    docs = _span_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in duplicated_spans(df, min_len=8).collect())
    want = py_duplicated_spans(docs, min_len=8)
    assert got == want
    assert (1, 0, 9, 10) in got and (3, 0, 7, 8) in got and (3, 8, 15, 8) in got
    assert not any(r[0] in (4, 5) for r in got)


def test_filter_span_duplicated_unions_overlapping_spans(spark):
    """Self-review r5 #3: two spans whose position runs sit 2..L-1 apart
    OVERLAP in tokens — coverage must be the union, not the sum (the sum
    exceeds the doc length and wrongly drops the doc). doc 1 holds
    w0..w10; doc 2 matches w0..w7, doc 3 matches w2..w9 → doc 1 gets
    overlapping spans (0,7) and (2,9): union 10 of 11 tokens (909‰),
    naive sum 16 (1454‰)."""
    from buildlog_consultant_spark.ops.spans import (
        duplicated_spans,
        filter_span_duplicated,
    )

    docs = [
        (1, " ".join(f"w{i}" for i in range(11))),
        (2, " ".join(f"w{i}" for i in range(8))),
        (3, " ".join(f"w{i}" for i in range(2, 10))),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans1 = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicated_spans(df, min_len=8).where("doc_id = 1").collect()
    )
    assert spans1 == [(0, 7), (2, 9)]  # overlapping pair
    kept = sorted(
        r["doc_id"]
        for r in filter_span_duplicated(df, max_dup_permille=950).collect()
    )
    assert 1 in kept  # union 909‰ ≤ 950 — the naive sum (1454‰) dropped it
    kept_strict = sorted(
        r["doc_id"]
        for r in filter_span_duplicated(df, max_dup_permille=900).collect()
    )
    assert 1 not in kept_strict


def test_filter_span_duplicated_null_id_kept(spark):
    """Self-review r5 #3: NULL-id rows pass through the span filter
    unconditionally (their span evidence can't join back)."""
    from buildlog_consultant_spark.ops.spans import filter_span_duplicated

    df = spark.createDataFrame(
        [(None, "a b c d e f g h i"), (2, "a b c d e f g h i")],
        "doc_id int, text string",
    )
    kept = {r["doc_id"] for r in filter_span_duplicated(df, max_dup_permille=0).collect()}
    assert None in kept and 2 not in kept


def test_filter_span_duplicated_drops_mostly_lifted_docs(spark):
    from buildlog_consultant_spark.ops.spans import filter_span_duplicated

    df = spark.createDataFrame(_span_docs(), "doc_id long, text string")
    # doc 1: 10 of 13 tokens duplicated (769‰) — dropped at 500‰;
    # doc 2: 10 of 14 (714‰) — dropped; doc 3: 16/17 (941‰) — dropped;
    # docs 4 and 5 have no spans — kept
    kept = sorted(r["doc_id"] for r in filter_span_duplicated(df).collect())
    assert kept == [4, 5]
    lax = sorted(
        r["doc_id"] for r in filter_span_duplicated(df, max_dup_permille=950).collect()
    )
    assert lax == [1, 2, 3, 4, 5]


# ---------------------------------------------------------------------------
# per-key quota (bucketed exact selection — no whole-key sorts)
# ---------------------------------------------------------------------------


def _quota_corpus(spark):
    """Skewed: key 'hot' holds 60% of rows."""
    rows = [
        Row(doc_id=i, source=("hot" if i % 5 < 3 else f"s{i % 5}"))
        for i in range(400)
    ]
    return spark.createDataFrame(rows)


@pytest.mark.parametrize("n_keep", [0, 1, 7, 64, 1000])
def test_key_quota_matches_naive_on_skew(spark, n_keep):
    """The bucketed quota must equal the naive whole-key row_number
    selection bit-for-bit — including n_keep 0, 1, mid-bucket boundaries,
    and n_keep beyond every key's size — on a 60%-hot corpus."""
    from buildlog_consultant_spark.ops.quota import key_quota, key_quota_naive

    df = _quota_corpus(spark)
    got = {
        (r["source"], r["doc_id"])
        for r in key_quota(df, n_keep, bucket_hex_chars=1).collect()
    }
    want = {
        (r["source"], r["doc_id"])
        for r in key_quota_naive(df, n_keep).collect()
    }
    assert got == want
    if n_keep:
        from collections import Counter

        per_key = Counter(k for k, _ in got)
        assert all(v <= n_keep for v in per_key.values())


def test_key_quota_null_keys_and_ids_budgeted(spark):
    """Self-review r5 #2: NULL keys/ids must be budgeted, not silently
    dropped — the null-safe join keeps NULL-key rows as their own quota
    group and NULL ids hash as '' (repo NULL policy), identical to the
    naive reference."""
    from buildlog_consultant_spark.ops.quota import key_quota, key_quota_naive

    rows = [Row(doc_id=i, source=("a" if i % 2 else None)) for i in range(20)]
    rows.append(Row(doc_id=None, source="a"))
    df = spark.createDataFrame(rows, "doc_id int, source string")
    for n_keep in (2, 5, 50):
        got = {
            (r["source"], r["doc_id"])
            for r in key_quota(df, n_keep, bucket_hex_chars=1).collect()
        }
        want = {
            (r["source"], r["doc_id"])
            for r in key_quota_naive(df, n_keep).collect()
        }
        assert got == want, (n_keep, got ^ want)
        assert any(k is None for k, _ in got)  # NULL key group present
    full = {
        (r["source"], r["doc_id"])
        for r in key_quota(df, 50, bucket_hex_chars=1).collect()
    }
    assert len(full) == 21  # nothing dropped when quota exceeds every key


def test_null_text_oracle_parity(spark, tmp_path):
    """Self-review r5 #1: the NULL→'' policy must be TWO-SIDED — the
    DuckDB oracles coalesce exactly like the Spark operators, verified
    end-to-end on a corpus that actually contains a NULL text (the
    driver corpus has none, which is what kept the one-sided version
    green). Also pins the policy's corollary: a NULL-text doc and an
    empty-text doc share one fingerprint group."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as entry

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [None, "", "Hello, World! the and of to in THE."],
            "lang": ["en", "en", "de"],
            "source": ["s0", "s0", "s1"],
            "n_chars": [0, 0, 35],
        }
    )
    p = str(tmp_path / "documents.parquet")
    pdf.to_parquet(p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}')")
    docs = spark.read.parquet(p)

    got_hist = sorted(
        (r["quality"], r["n"])
        for r in text_ops.with_quality_score(docs)
        .groupBy("quality")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    want_hist = sorted(con.execute(entry.ORACLE_QUALITY_HIST).fetchall())
    assert got_hist == want_hist
    assert any(q == 50 for q, _ in got_hist)  # NULL+empty land in bucket 50

    got_fp = sorted(
        (r["fingerprint"], r["n_dups"], r["min_id"])
        for r in text_ops.with_fingerprint(docs)
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_dups"), F.min("doc_id").alias("min_id"))
        .where(F.col("n_dups") > 1)
        .collect()
    )
    want_fp = sorted(con.execute(entry.ORACLE_FINGERPRINT_DUPS).fetchall())
    assert got_fp == want_fp and len(got_fp) == 1  # the NULL+'' pair

    got_tok = sorted(
        (r["lang"], r["rank"], r["token"], r["n"])
        for r in text_ops.token_topk(docs, k=10).collect()
    )
    want_tok = sorted(con.execute(entry.ORACLE_TOKEN_TOPK).fetchall())
    assert got_tok == want_tok


def test_mp4_leading_padding_boxes_accepted():
    """Self-review r5 #4: ISO BMFF only recommends ftyp first — a
    QuickTime-style leading 'wide'/'skip' box must not demote a real MP4
    to the 'unknown' stub."""
    import struct as _s

    from buildlog_consultant_spark.ops.multimodal import (
        classify_and_decode,
        decode_mp4_header,
        encode_mp4_header,
    )

    base = encode_mp4_header(640, 360, 2000)
    for pad in (b"wide", b"skip", b"free"):
        padded = _s.pack(">I", 8) + pad + base
        got = decode_mp4_header(padded)
        assert got == {"width": 640, "height": 360, "duration_ms": 2000}, pad
        assert classify_and_decode(padded)["media_type"] == "video/mp4"
    # random blobs still rejected (first box type unknown)
    assert decode_mp4_header(b"\x00\x00\x00\x08junk" + base[:20]) is None


@pytest.mark.parametrize("budget", [0, 1, 37, 500, 10**9])
def test_token_budget_sample_matches_naive_prefix(spark, budget):
    """Bucketed token-budget sampling must equal the naive hash-ordered
    running-sum prefix exactly, across tiny/mid/huge budgets; zero-weight
    docs follow the same prefix rule."""
    from buildlog_consultant_spark.ops.quota import token_budget_sample

    rows = [Row(doc_id=i, w=(i * 7) % 23) for i in range(300)]
    df = spark.createDataFrame(rows)
    got = {r["doc_id"] for r in token_budget_sample(
        df, budget, "w", bucket_hex_chars=1
    ).collect()}
    naive_w = Window.orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    want = {
        r["doc_id"]
        for r in df.withColumn("_cum", F.sum("w").over(naive_w))
        .where(F.col("_cum") <= budget)
        .collect()
    }
    assert got == want
    if budget >= 10**9:
        assert len(got) == 300  # budget beyond corpus keeps everything


def test_token_budget_exact_exhaustion_corners(spark):
    """Self-review r5 #5: exercise the boundary `<=` conditions the
    random fixture never hits — budgets landing EXACTLY on a cumulative
    sum, with zero-weight docs adjacent in hash order, and budgets equal
    to a bucket's _before. Expectations come from a Python md5 replay of
    the naive prefix rule, so flipping either <= to < fails here."""
    import hashlib

    from buildlog_consultant_spark.ops.quota import token_budget_sample

    rows = [(i, 0 if i % 2 == 0 else 5 + (i % 7)) for i in range(240)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    order = sorted(range(240), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    weights = dict(rows)
    cums = []
    c = 0
    for i in order:
        c += weights[i]
        cums.append((i, c))

    def naive_kept(budget):
        return {i for i, c in cums if c <= budget}

    # budgets: 0 (keeps the leading zero-weight run — the old <=0 guard
    # returned empty), an exact mid-corpus cum followed by a zero-weight
    # doc, the same minus 1, and each 1-hex bucket's _before value
    probes = {0}
    for k in range(len(cums) - 1):
        nxt = order[k + 1]
        if weights[nxt] == 0 and cums[k][1] not in (c for _, c in cums[:k]):
            probes.add(cums[k][1])
            probes.add(cums[k][1] - 1)
            if len(probes) >= 6:
                break
    bucket_before = {}
    run = 0
    for i in order:
        bkt = hashlib.md5(str(i).encode()).hexdigest()[0]
        bucket_before.setdefault(bkt, run)
        run += weights[i]
    probes.update(list(bucket_before.values())[:4])

    assert naive_kept(0), "fixture must start with zero-weight docs in hash order"
    for budget in sorted(probes):
        got = {
            r["doc_id"]
            for r in token_budget_sample(df, budget, "w", bucket_hex_chars=1).collect()
        }
        assert got == naive_kept(budget), (budget, got ^ naive_kept(budget))


def test_token_budget_prefix_monotone(spark):
    """Growing the budget only ADDS documents (prefix property — what
    incremental mixture rebuilds rely on)."""
    from buildlog_consultant_spark.ops.quota import token_budget_sample

    df = spark.createDataFrame([Row(doc_id=i, w=5 + i % 11) for i in range(200)])
    small = {r["doc_id"] for r in token_budget_sample(df, 300, "w").collect()}
    big = {r["doc_id"] for r in token_budget_sample(df, 900, "w").collect()}
    assert small < big


def test_key_quota_windows_only_candidate_buckets(spark):
    """The ranking window must sit ABOVE the _kb > 0 candidate filter
    (only surviving buckets' rows are shuffled and ranked, each window
    partition bounded by one bucket) — no task sorts a whole key, and
    the corpus is scanned once (single branch, no union)."""
    from buildlog_consultant_spark.ops.quota import key_quota

    plan = key_quota(_quota_corpus(spark), 7)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("row_number") <= 2, plan[:2000]  # one def + one ref
    assert "_kb" in plan  # boundary arithmetic drives the keep decision
    assert "Union" not in plan  # single-branch: one pass over corpus rows
    # window partition key includes the bucket column — never key alone
    assert "windowspecdefinition(source" not in plan.replace(" ", "").lower() or \
        "_b" in plan


# ---------------------------------------------------------------------------
# run_pipeline max_waves + resume
# ---------------------------------------------------------------------------


def test_run_pipeline_max_waves_then_resume(spark, tmp_path):
    """max_waves bounds one invocation to K waves (the budget-bounded /
    partial-failure shape); the next invocation resumes from the committed
    lineage and the final lineage has exactly one row per shard."""
    from buildlog_consultant_spark import fixtures
    from buildlog_consultant_spark.spark.pipeline import run_pipeline

    pages = fixtures.pages_df(spark, 40, partitions=2)
    out = str(tmp_path / "out")
    r1 = run_pipeline(spark, pages, out, n_shards=4, shards_per_wave=2, max_waves=1)
    assert sorted(r.shard for r in r1) == [0, 1]
    r2 = run_pipeline(spark, pages, out, n_shards=4, shards_per_wave=2)
    assert sorted(r.shard for r in r2) == [2, 3]
    lineage = spark.read.parquet(f"{out}/_lineage")
    assert lineage.count() == 4
    assert lineage.select("shard").distinct().count() == 4
    assert lineage.agg(F.sum("input_count")).collect()[0][0] == 40
