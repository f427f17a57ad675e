"""Round-6 tests: the ExactSubstr removal endpoint (scrub_span_duplicated),
128-bit gram-hash keying equivalence, the single-tokenize coverage gate,
per-key token budgets, and the batched ANN paths (int8 + LSH over a
queries DataFrame)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from buildlog_consultant_spark.ops.quota import (
    token_budget_per_key,
    token_budget_per_key_naive,
)
from buildlog_consultant_spark.ops.similarity import (
    ann_topk_int8,
    ann_topk_int8_batch,
    ann_topk_lsh,
    ann_topk_lsh_batch,
)
from buildlog_consultant_spark.ops.spans import (
    duplicated_spans,
    filter_span_duplicated,
    py_duplicated_spans,
    py_scrub_spans,
    scrub_span_duplicated,
)


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _nkey(t):
    return tuple((v is None, v) for v in t)


# ---------------------------------------------------------------------------
# spans: gram_key equivalence + scrub endpoint (VERDICT r5 next #2/#3)
# ---------------------------------------------------------------------------


def _span_docs():
    shared = " ".join(f"tok{i}" for i in range(10))
    return [
        (1, f"{shared} unique tail one"),
        (2, f"prefix two {shared} suffix"),
        (3, "x1 x2 x3 x4 x5 x6 x7 x8 mid x1 x2 x3 x4 x5 x6 x7 x8"),
        (4, None),
        (5, "no duplicated grams in here at all worth noting today"),
        (None, f"{shared} null id row"),
    ]


def test_gram_key_hash128_equivalent_to_string(spark):
    """The 128-bit xxhash64-pair shuffle key yields bit-identical spans to
    the exact gram-string key (VERDICT r5 #3: the hash cuts the one
    corpus-wide shuffle's bytes ~10× at crawl scale)."""
    df = spark.createDataFrame(_span_docs(), "doc_id int, text string")
    a = sorted(
        (tuple(r) for r in duplicated_spans(df, 8, gram_key="string").collect()),
        key=_nkey,
    )
    b = sorted(
        (tuple(r) for r in duplicated_spans(df, 8, gram_key="hash128").collect()),
        key=_nkey,
    )
    assert a == b and len(a) > 0


def test_gram_key_invalid_raises(spark):
    df = spark.createDataFrame(_span_docs(), "doc_id int, text string")
    with pytest.raises(ValueError, match="gram_key"):
        duplicated_spans(df, 8, gram_key="md5").collect()


def test_duplicated_spans_doc_tokens_carried(spark):
    """with_doc_tokens rides the token count out of the gram scan — the
    single-tokenize shape of filter_span_duplicated (VERDICT r5 nit #2)."""
    docs = [(i, t) for i, t in _span_docs() if i is not None]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = duplicated_spans(df, 8, with_doc_tokens=True).collect()
    toks = {i: len((t or "").split()) for i, t in docs}
    assert rows
    for r in rows:
        assert r["doc_tokens"] == toks[r["doc_id"]]


def test_scrub_matches_python_replay(spark):
    """scrub_span_duplicated == py_scrub_spans on every corner the fixture
    encodes: cross-doc shared region, within-doc repetition (overlapping
    coverage), NULL text, span-free doc, NULL-id passthrough."""
    docs = _span_docs()
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = sorted(
        (
            (r["doc_id"], r["text_scrubbed"], r["n_tokens_removed"])
            for r in scrub_span_duplicated(df, min_len=8).collect()
        ),
        key=_nkey,
    )
    want = sorted(py_scrub_spans(docs, min_len=8), key=_nkey)
    assert got == want


def test_scrub_untouched_docs_byte_identical(spark):
    """Docs with no duplicated spans keep their text EXACTLY (including
    internal whitespace) — only scrubbed docs get token-join normalized."""
    docs = [(1, "weird   spacing\tand CASE kept as-is"), (2, "totally different")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = {r["doc_id"]: r for r in scrub_span_duplicated(df, min_len=8).collect()}
    for i, t in docs:
        assert rows[i]["text_scrubbed"] == t
        assert rows[i]["n_tokens_removed"] == 0


def test_scrub_removes_whole_doc_to_empty(spark):
    """A fully duplicated doc scrubs to the empty string (not NULL)."""
    body = " ".join(f"w{i}" for i in range(12))
    df = spark.createDataFrame(
        [(1, body), (2, body)], "doc_id int, text string"
    )
    rows = {r["doc_id"]: r for r in scrub_span_duplicated(df, min_len=8).collect()}
    assert rows[1]["text_scrubbed"] == "" and rows[1]["n_tokens_removed"] == 12
    assert rows[2]["text_scrubbed"] == "" and rows[2]["n_tokens_removed"] == 12


def test_scrub_preserves_original_case_outside_spans(spark):
    """Scrubbed docs rebuild from ORIGINAL-CASE tokens — the normalized
    (lowered) tokens are only the matching key, never the output."""
    shared = " ".join(f"s{i}" for i in range(8))
    df = spark.createDataFrame(
        [(1, f"KeepMyCase {shared}"), (2, f"other prefix {shared}")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_span_duplicated(df, min_len=8).collect()}
    assert rows[1]["text_scrubbed"] == "KeepMyCase"


def test_filter_span_duplicated_unchanged_by_single_scan_rewrite(spark):
    """The coverage gate (now fed doc_tokens from the gram scan) keeps /
    drops exactly as before: doc 3 (16 of 17 tokens covered → 941‰) drops
    at 500‰, docs with partial or no coverage keep."""
    docs = _span_docs()
    df = spark.createDataFrame(docs, "doc_id int, text string")
    kept = {
        r["doc_id"]
        for r in filter_span_duplicated(df, max_dup_permille=500).collect()
    }
    # doc1: 10/13 covered (769‰) → dropped; doc2: 10/13 → dropped;
    # doc3: union 16/17 (941‰) → dropped; 4,5 kept; NULL id passes through
    assert kept == {4, 5, None}
    kept_hi = {
        r["doc_id"]
        for r in filter_span_duplicated(df, max_dup_permille=980).collect()
    }
    assert kept_hi == {1, 2, 3, 4, 5, None}


# ---------------------------------------------------------------------------
# per-key token budgets (VERDICT r5 next #5)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def budget_corpus(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, "s%d" % (0 if i % 10 < 7 else i % 10), rng.randint(0, 50))
        for i in range(400)
    ]
    # corners: NULL key group, NULL id (hashes as ''), zero-weight doc
    rows += [(400, None, 5), (None, "s1", 7), (401, "s1", 0)]
    return spark.createDataFrame(rows, "doc_id int, source string, w int")


@pytest.mark.parametrize("budget", [0, 37, 500, 10**9])
def test_token_budget_per_key_matches_naive(spark, budget_corpus, budget):
    """Bucketed per-key SUM-boundary selection is bit-identical to the
    naive per-key running-sum window — including the 70%-hot key, the
    NULL-key group, budget 0 (leading zero-weight docs kept), and a
    budget beyond every key's total."""
    a = sorted(
        (tuple(r) for r in token_budget_per_key(
            budget_corpus, budget, "w", key_col="source", id_col="doc_id"
        ).collect()),
        key=_nkey,
    )
    b = sorted(
        (tuple(r) for r in token_budget_per_key_naive(
            budget_corpus, budget, "w", key_col="source", id_col="doc_id"
        ).collect()),
        key=_nkey,
    )
    assert a == b


def test_token_budget_per_key_prefix_monotone(spark, budget_corpus):
    """Growing the budget only ADDS documents within every key."""
    small = {
        tuple(r)
        for r in token_budget_per_key(
            budget_corpus, 100, "w", key_col="source", id_col="doc_id"
        ).collect()
    }
    big = {
        tuple(r)
        for r in token_budget_per_key(
            budget_corpus, 300, "w", key_col="source", id_col="doc_id"
        ).collect()
    }
    assert small <= big


def test_token_budget_per_key_negative_budget_empty(spark, budget_corpus):
    assert (
        token_budget_per_key(
            budget_corpus, -1, "w", key_col="source", id_col="doc_id"
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# batched ANN (VERDICT r5 next #4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vec_corpus(spark):
    rng = np.random.RandomState(7)
    rows = [(int(i), [float(x) for x in rng.randn(16)]) for i in range(120)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(4)


def test_ann_int8_batch_matches_single_query_endpoint(spark, vec_corpus):
    """Per-query slices of the batch result equal the single-query int8
    endpoint — same quantization, same integer dot, same tie order."""
    qids = [3, 17, 55]
    queries = vec_corpus.where(F.col("vec_id").isin(qids))
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["qdot"])
        for r in ann_topk_int8_batch(vec_corpus, queries, k=5, dim=16).collect()
    )
    ref = sorted(
        (q, r["rank"], r["vec_id"], r["qdot"])
        for q in qids
        for r in ann_topk_int8(vec_corpus, q, k=5, dim=16).collect()
    )
    assert got == ref and len(got) == 15


def test_ann_int8_batch_empty_queries_raises(spark, vec_corpus):
    empty = vec_corpus.limit(0)
    with pytest.raises(ValueError, match="empty"):
        ann_topk_int8_batch(vec_corpus, empty, k=5, dim=16)


def test_ann_int8_batch_null_query_vector_raises(spark, vec_corpus):
    bad = spark.createDataFrame(
        [(999, None)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="unquantizable"):
        ann_topk_int8_batch(vec_corpus, bad, k=5, dim=16)


def test_ann_int8_batch_skips_null_corpus_rows(spark, vec_corpus):
    """NULL corpus vectors never score (the kernel's None-code skip)."""
    withnull = vec_corpus.unionByName(
        spark.createDataFrame([(500, None)], "vec_id long, embedding array<double>")
    )
    got = ann_topk_int8_batch(withnull, vec_corpus.where("vec_id = 3"), k=200, dim=16)
    ids = {r["vec_id"] for r in got.collect()}
    assert 500 not in ids and 3 not in ids and len(ids) == 119


def test_ann_lsh_batch_matches_single_query_endpoint(spark, vec_corpus):
    qids = [3, 17, 55]
    queries = vec_corpus.where(F.col("vec_id").isin(qids))
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"])
        for r in ann_topk_lsh_batch(
            vec_corpus, queries, k=5, n_planes=6, dim=16
        ).collect()
    )
    ref = []
    for q in qids:
        rs = ann_topk_lsh(vec_corpus, q, k=5, n_planes=6, dim=16).collect()
        ranked = sorted(rs, key=lambda r: (-r["cosine"], r["vec_id"]))
        ref.extend((q, i, r["vec_id"]) for i, r in enumerate(ranked, 1))
    assert got == sorted(ref)


def test_mp4_bare_signature_without_metadata_not_classified(spark):
    """ADVICE r5: an ISO-BMFF signature with no extractable mvhd/tkhd
    fields (ftyp + truncated/absent moov) must NOT earn video/mp4 with
    all-NULL metadata — it falls through to the labeled stub, mirroring
    the JPEG path's require-header-dims rule."""
    import struct

    from buildlog_consultant_spark.ops.multimodal import classify_and_decode

    ftyp = struct.pack(">I4s", 16, b"ftyp") + b"isom" + b"\x00\x00\x02\x00"
    # bare signature: ftyp then a truncated moov header (no mvhd/tkhd)
    bare = ftyp + struct.pack(">I4s", 8, b"moov")
    meta = classify_and_decode(bare)
    assert meta["media_type"] == "unknown"
    assert meta["fake_width"] is not None  # stub path, clearly labeled
    # a real moov with mvhd still classifies
    mvhd = struct.pack(">I4s", 8 + 100, b"mvhd") + bytes([0]) + b"\x00" * 11 + \
        struct.pack(">II", 1000, 5000) + b"\x00" * 80
    moov = struct.pack(">I4s", 8 + len(mvhd), b"moov") + mvhd
    meta2 = classify_and_decode(ftyp + moov)
    assert meta2["media_type"] == "video/mp4"
    assert meta2["duration_ms"] == 5000


def test_filter_compressible_null_and_empty_pass_through(spark):
    """ADVICE r5: NULL/empty-text docs pass the compressibility gate
    unconditionally (uniform NULL policy with filter_repetitive)."""
    from buildlog_consultant_spark.ops import text as text_ops

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "x " * 300)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in text_ops.filter_compressible(df).collect()}
    assert {1, 2} <= kept and 3 not in kept  # boilerplate still drops


# ---------------------------------------------------------------------------
# global cumsum + sequence packing (round-6 addition)
# ---------------------------------------------------------------------------


def test_global_cumsum_matches_naive_window(spark):
    """Bucketed two-pass global running sum == the naive single global
    window, including NULL id (hashes as ''), zero weights, and NULL
    weights (count 0)."""
    import random

    from pyspark.sql import Window

    from buildlog_consultant_spark.ops.quota import (
        _order_hash,
        with_global_cumsum,
    )

    rng = random.Random(9)
    rows = [(i, rng.randint(0, 40)) for i in range(300)]
    rows += [(300, 0), (None, 7), (301, None)]
    d = spark.createDataFrame(rows, "doc_id int, w int")
    wn = Window.orderBy(_order_hash("doc_id"), "doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    naive = d.withColumn(
        "cum_weight",
        F.sum(F.coalesce(F.col("w").cast("long"), F.lit(0))).over(wn),
    )
    a = sorted((tuple(r) for r in with_global_cumsum(d, "w").collect()), key=_nkey)
    b = sorted((tuple(r) for r in naive.collect()), key=_nkey)
    assert a == b


def test_sequence_bins_chop_arithmetic(spark):
    """bin_first/bin_last/bin_offset follow the concat-and-chop rule for
    every row — straddling docs span consecutive bins; zero-weight docs
    sit at a point; the tape is gapless (each doc starts where the
    previous ended)."""
    import random

    from buildlog_consultant_spark.ops.quota import with_sequence_bins

    rng = random.Random(5)
    rows = [(i, rng.randint(0, 100)) for i in range(200)] + [(200, 0)]
    d = spark.createDataFrame(rows, "doc_id int, w int")
    out = with_sequence_bins(d, 64, "w").collect()
    starts = {}
    for r in out:
        w = r["w"] or 0
        start = r["cum_weight"] - w
        if w > 0:
            assert r["bin_first"] == start // 64
            assert r["bin_last"] == (r["cum_weight"] - 1) // 64
            assert r["bin_offset"] == start % 64
        else:
            assert r["bin_first"] == r["bin_last"] == r["cum_weight"] // 64
            assert r["bin_offset"] == r["cum_weight"] % 64
        starts[start] = r["cum_weight"]
    # gapless tape: the sorted (start, end) intervals tile [0, total]
    ivs = sorted((s, e) for s, e in starts.items())
    pos = 0
    for s, e in ivs:
        assert s == pos
        pos = e


def test_sequence_bins_exact_past_double_precision(spark):
    """Review r6b #3: bin arithmetic must stay EXACT past 2^53 — a double
    division would round the quotient and shift bin boundaries by one at
    crawl-scale tape lengths. Weights near 2^58; NULL weight counts 0
    (review r6b #1, the oracle's COALESCE)."""
    from buildlog_consultant_spark.ops.quota import with_sequence_bins

    big = (1 << 58) + 12345
    rows = [(1, big), (2, 2048), (3, None), (4, big + 7), (5, 1)]
    d = spark.createDataFrame(rows, "doc_id int, w long")
    out = {r["doc_id"]: r for r in with_sequence_bins(d, 2048, "w").collect()}
    for r in out.values():
        w = r["w"] or 0
        start = r["cum_weight"] - w
        if w > 0:
            assert r["bin_first"] == start // 2048, r
            assert r["bin_last"] == (r["cum_weight"] - 1) // 2048, r
        else:
            assert r["bin_first"] == r["bin_last"] == r["cum_weight"] // 2048, r
        assert r["bin_offset"] == start % 2048, r


def test_sequence_bins_invalid_bin_raises(spark):
    from buildlog_consultant_spark.ops.quota import with_sequence_bins

    d = spark.createDataFrame([(1, 5)], "doc_id int, w int")
    with pytest.raises(ValueError, match="bin_tokens"):
        with_sequence_bins(d, 0, "w")


# ---------------------------------------------------------------------------
# line-level boilerplate removal + unigram LM quality (round-6 additions)
# ---------------------------------------------------------------------------


def _line_docs():
    nav = "NAV | home | about"
    return [
        (1, "a.com", f"article one body\n{nav}\n\nunique tail 1"),
        (2, "a.com", f"article two body\n{nav}\nunique tail 2"),
        (3, "a.com", f"{nav}\narticle three body"),
        # within-doc repetition only — NOT boilerplate (distinct-doc count)
        (4, "a.com", "solo line\nsolo line\nsolo line"),
        # b.com has the same nav but only 2 docs — below min_docs, kept
        (5, "b.com", f"b one\n{nav}"),
        (6, "b.com", f"b two\n{nav}"),
        (7, "a.com", None),
        (None, "a.com", f"{nav}\nnull id row"),
    ]


def test_strip_boilerplate_lines_matches_python_replay(spark):
    from buildlog_consultant_spark.ops.lines import (
        py_strip_boilerplate_lines,
        strip_boilerplate_lines,
    )

    docs = _line_docs()
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    got = sorted(
        (
            (r["doc_id"], r["text_stripped"], r["n_lines_removed"])
            for r in strip_boilerplate_lines(df, min_docs=3).collect()
        ),
        key=_nkey,
    )
    want = sorted(py_strip_boilerplate_lines(docs, min_docs=3), key=_nkey)
    assert got == want
    by_id = dict((i, (t, n)) for i, t, n in want)
    # the nav line is cut from all three a.com docs, empty line survives
    assert by_id[1] == ("article one body\n\nunique tail 1", 1)
    assert by_id[3] == ("article three body", 1)
    # within-doc repetition, sub-threshold source, NULL text, NULL id: kept
    assert by_id[4][1] == 0 and by_id[5][1] == 0 and by_id[6][1] == 0
    assert by_id[7] == (None, 0)
    assert by_id[None][1] == 0


def test_strip_boilerplate_null_source_scope_is_stripped(spark):
    """Review r6 #1: the NULL-source dedup scope must actually be STRIPPED,
    not just detected — the join-back is null-safe on source."""
    from buildlog_consultant_spark.ops.lines import (
        py_strip_boilerplate_lines,
        strip_boilerplate_lines,
    )

    docs = [
        (1, None, "NAV\na"),
        (2, None, "NAV\nb"),
        (3, None, "NAV\nc"),
        (4, "real.com", "NAV\nd"),  # different scope — kept (only 1 doc)
    ]
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    got = sorted(
        (r["doc_id"], r["text_stripped"], r["n_lines_removed"])
        for r in strip_boilerplate_lines(df, min_docs=3).collect()
    )
    assert got == sorted(py_strip_boilerplate_lines(docs, min_docs=3))
    assert got[:3] == [(1, "a", 1), (2, "b", 1), (3, "c", 1)]
    assert got[3] == (4, "NAV\nd", 0)


def test_strip_boilerplate_null_id_docs_are_not_evidence(spark):
    """Review r6 #2: a NULL-id doc's lines never count toward min_docs
    (Spark countDistinct ignores NULL ids; the replay mirrors it)."""
    from buildlog_consultant_spark.ops.lines import (
        py_strip_boilerplate_lines,
        strip_boilerplate_lines,
    )

    docs = [(1, "s", "NAV\na"), (2, "s", "NAV\nb"), (None, "s", "NAV\nc")]
    df = spark.createDataFrame(docs, "doc_id int, source string, text string")
    got = sorted(
        ((r["doc_id"], r["text_stripped"], r["n_lines_removed"])
         for r in strip_boilerplate_lines(df, min_docs=3).collect()),
        key=_nkey,
    )
    want = sorted(py_strip_boilerplate_lines(docs, min_docs=3), key=_nkey)
    assert got == want
    # only 2 countable docs share NAV — below threshold, nothing stripped
    assert all(n == 0 for _i, _t, n in got)


def test_ann_int8_batch_null_id_corpus_row_never_scores(spark, vec_corpus):
    """Review r6 #3: a NULL-id corpus row with a VALID vector must be
    skipped by the batch kernel (NaN id would otherwise mint INT64_MIN)."""
    v = [float(i) for i in range(16)]
    withnull = vec_corpus.unionByName(
        spark.createDataFrame([(None, v)], "vec_id long, embedding array<double>")
    )
    got = ann_topk_int8_batch(withnull, vec_corpus.where("vec_id = 3"), k=500, dim=16)
    ids = {r["vec_id"] for r in got.collect()}
    assert -(1 << 63) not in ids and None not in ids and len(ids) == 119


def test_line_split_trailing_empty_parity(spark):
    """Spark split(text, '\\n', -1) must keep trailing empties exactly like
    Python str.split('\\n') — the replay's split-parity pin."""
    texts = ["a\nb\n", "\n\n", "x", "", "a\n\nb"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    rows = {r["i"]: r["n"] for r in df.select(
        "i", F.size(F.split(F.col("text"), "\n", -1)).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert rows[i] == len(t.split("\n")), (t, rows[i])


def test_unigram_logloss_matches_python_replay(spark):
    from buildlog_consultant_spark.ops import text as text_ops

    docs = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),
        (3, "zq9 xkcd7 qwfp vvv"),  # junk — every token rare
        (4, None),
        (5, ""),
        (6, "the cat"),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    costs, oov = text_ops.unigram_vocab_costs(df, vocab_size=4)
    got = sorted(
        (r["doc_id"], r["unigram_milli_bits"])
        for r in text_ops.with_unigram_logloss(df, costs, oov).collect()
    )
    want = sorted(text_ops.py_unigram_logloss(docs, vocab_size=4))
    assert got == want
    by_id = dict(got)
    # boilerplate of the dominant token scores LOWEST, junk HIGHEST
    assert by_id[2] < by_id[1] < by_id[3]
    assert by_id[4] is None and by_id[5] is None


def test_unigram_vocab_deterministic_tiebreak(spark):
    from buildlog_consultant_spark.ops import text as text_ops

    df = spark.createDataFrame(
        [(1, "bb aa bb aa cc")], "doc_id int, text string"
    )
    costs, _ = text_ops.unigram_vocab_costs(df, vocab_size=2)
    # aa and bb tie at 2; cc (count 1) loses; tie kept by token asc
    assert set(costs) == {"aa", "bb"}


def test_streaming_sessions_merge_across_microbatches(spark, tmp_path):
    """The session state MERGES across micro-batches: user 1's three
    events arrive split over two files (two triggers) 10 minutes apart —
    one session of 3 must be appended once the watermark (driven by a
    later anchor event) passes its window end. A second user's lone event
    inside the watermark horizon stays buffered (not emitted)."""
    import datetime
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from buildlog_consultant_spark.streaming.pipeline import streaming_sessions

    t0 = datetime.datetime(2026, 1, 1, 12, 0, 0)

    def mk(rows):
        return pa.Table.from_pylist(
            [{"user_id": u, "ts": ts} for u, ts in rows],
            schema=pa.schema(
                [("user_id", pa.int64()), ("ts", pa.timestamp("us"))]
            ),
        )

    stage = tmp_path / "stream"
    stage.mkdir()
    pq.write_table(
        mk([(1, t0), (1, t0 + datetime.timedelta(minutes=10))]),
        stage / "b0.parquet",
    )
    pq.write_table(
        mk([
            (1, t0 + datetime.timedelta(minutes=20)),
            # anchor: watermark → t0+5h−1h; open session for user 2
            (2, t0 + datetime.timedelta(hours=5)),
        ]),
        stage / "b1.parquet",
    )
    now = int(__import__("time").time())
    os.utime(stage / "b0.parquet", (now - 120, now - 120))
    os.utime(stage / "b1.parquet", (now - 60, now - 60))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(stage))
    )
    sess = streaming_sessions(stream, "ts", "user_id", "30 minutes", "1 hour")
    name = f"t6_sess_{uuid.uuid4().hex[:6]}"
    q = (
        sess.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table(name).select(
        "user_id", F.col("session_window.start").alias("s"), "n_events"
    ).collect()
    assert [(r["user_id"], r["s"], r["n_events"]) for r in rows] == [(1, t0, 3)]


def test_ann_int8_batch_is_one_job_no_corpus_window(spark, vec_corpus):
    """Plan shape: the candidate stream is a mapInPandas over the corpus
    scan (one pass for all queries), and the only window runs over the
    per-batch top-k candidates — bounded rows — never the scored corpus.
    No Cartesian product anywhere."""
    queries = vec_corpus.where(F.col("vec_id").isin([3, 17]))
    plan = ann_topk_int8_batch(vec_corpus, queries, k=5, dim=16)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("MapInPandas") == 1
