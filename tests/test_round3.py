"""Round-3 regression tests.

Line-splitting parity: the reference splits documents with
``split_inclusive('\\n')`` (/root/reference/src/bin/analyze-build-log.rs:77,
src/common.rs:2677); ``str.splitlines`` also breaks on \\r, \\f, \\x1c-\\x1e,
\\x85, \\u2028, \\u2029 and therefore shifted line offsets on real logs (curl /
wget / dpkg progress bars emit \\r-separated segments). Round 2 additionally
misattributed blocked-gate hits after a \\r segment by counting only \\n
(ADVICE r2, high) — the fixed attribution is positional (bisect over line
starts).
"""

import pytest

from buildlog_consultant_spark.engine.core import (
    find_build_failure_description,
    find_secondary_build_failure,
    split_log_lines,
)
from buildlog_consultant_spark.spark.classify import analyze_text


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    yield (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def test_split_log_lines_inclusive_newline_only():
    assert split_log_lines("") == []
    assert split_log_lines("a\n") == ["a\n"]
    assert split_log_lines("a\nb") == ["a\n", "b"]
    assert split_log_lines("a\n\nb\n") == ["a\n", "\n", "b\n"]
    # \r / \f /   are NOT line breaks (unlike str.splitlines)
    assert split_log_lines("a\rb\fc d\n") == ["a\rb\fc d\n"]
    # round-trips byte-exactly — required by the zero-copy gate window
    for t in ("x\ry\nz", "a\n\n", "\n", "no-newline"):
        assert "".join(split_log_lines(t)) == t


def test_cr_progress_bar_secondary_match():
    # ADVICE r2 repro: a \r-separated progress bar before the error segment
    # made the blocked gate scan attribute the hit to the wrong line and the
    # doc silently classified as no-match.
    doc = (
        "downloading... 50%\rdownloading... 100%\r"
        "make: *** [Makefile:12: all] Error 1\n"
    )
    gated = analyze_text(doc, use_gate=True)
    ungated = analyze_text(doc, use_gate=False)
    assert gated == ungated
    assert gated["match_line"] is not None
    # split_inclusive('\n') parity: the \r segments are part of line 1
    assert gated["lineno"] == 1
    assert "Error 1" in gated["match_line"]


def test_cr_before_primary_match():
    doc = (
        "progress   1%\rprogress  99%\rprogress done\n"
        "cp: cannot stat '/usr/share/foo': No such file or directory\n"
    )
    gated = analyze_text(doc, use_gate=True)
    ungated = analyze_text(doc, use_gate=False)
    assert gated == ungated
    assert gated["problem_kind"] == "missing-file"
    assert gated["lineno"] == 2


def test_cr_inside_matched_line_primary():
    # the error itself shares a physical line with \r segments: the whole
    # thing is ONE line and the (unanchored-search) rule still fires
    doc = "fetch 10%\rfetch 100%\rbuild: foo: No space left on device\n"
    match, problem = find_build_failure_description(split_log_lines(doc), text=doc)
    assert problem is not None and problem.kind == "no-space-on-device"
    assert match.lineno == 1


def test_secondary_scan_cr_parity_direct():
    lines = split_log_lines(
        "ok\n" * 20 + "spin\rspin\rspin\nTEST FAILURE\n" + "tail\n" * 3
    )
    gated = find_secondary_build_failure(lines, 250, use_gate=True)
    ungated = find_secondary_build_failure(lines, 250, use_gate=False)
    assert gated is not None and ungated is not None
    assert gated.offset == ungated.offset
    assert "TEST FAILURE" in gated.line


# ---------------------------------------------------------------------------
# LSH bucket caps (VERDICT r2 "next" #1): a planted hot bucket — the crawl
# failure mode where near-identical boilerplate collapses a constant corpus
# fraction into one bucket — must stay bounded, not go quadratic.
# ---------------------------------------------------------------------------

_DIM = 8
_PLANES = 4


def _py_bucket(v):
    from buildlog_consultant_spark.ops.similarity import plane_component

    b = 0
    for p in range(_PLANES):
        dot = sum(v[i] * plane_component(p, i) for i in range(_DIM))
        if dot > 0:
            b |= 1 << p
    return b


def _hot_cold_df(spark, n_hot=600):
    v_hot = [1.0, 0.25, -0.5, 0.75, -0.1, 0.6, -0.3, 0.2]
    v_cold = [-x for x in v_hot]  # every plane dot flips sign →
    # hamming(bucket_hot, bucket_cold) == n_planes, so the cold bucket is
    # not even a hamming-1 probe of the hot one
    assert bin(_py_bucket(v_hot) ^ _py_bucket(v_cold)).count("1") == _PLANES
    rows = [(i, v_hot, "hot") for i in range(n_hot)]
    rows += [
        (10_000, v_cold, "cold"),
        (10_001, [x * 1.01 for x in v_cold], "cold"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def test_embedding_near_dups_hot_bucket_capped(spark):
    from buildlog_consultant_spark.ops.similarity import embedding_near_dups

    df = _hot_cold_df(spark)
    # threshold=-1 makes every candidate pair a result row, so the output
    # size IS the candidate volume: the 600-member hot bucket (>256 cap)
    # must contribute zero, leaving exactly the one cold pair
    pairs = embedding_near_dups(
        df, threshold=-1.0, n_planes=_PLANES, dim=_DIM, max_bucket=256
    ).collect()
    assert [(r.id_a, r.id_b) for r in pairs] == [(10_000, 10_001)]


def test_embedding_near_dups_uncapped_keeps_hot_bucket(spark):
    from buildlog_consultant_spark.ops.similarity import embedding_near_dups

    df = _hot_cold_df(spark, n_hot=20)
    n = embedding_near_dups(
        df, threshold=0.99, n_planes=_PLANES, dim=_DIM, max_bucket=None
    ).count()
    assert n == 20 * 19 // 2 + 1  # all hot pairs + the cold pair


# ---------------------------------------------------------------------------
# Cluster-grade checkpointing (VERDICT r2 "next" #4): with a checkpoint dir
# configured, connected_components must use RELIABLE checkpoint() — the plan
# is truncated to a checkpoint scan and blocks land in the dir, so executor
# loss mid-iteration recomputes instead of killing the job.
# ---------------------------------------------------------------------------


def test_connected_components_reliable_checkpoint(spark, tmp_path):
    import os

    from buildlog_consultant_spark.ops.dedup import connected_components

    ckpt = str(tmp_path / "ckpt")
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    sc.setCheckpointDir(ckpt)
    try:
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (9, 9)], "id_a long, id_b long"
        )
        # driver_threshold=0 forces the distributed loop (the adaptive
        # small-graph path would otherwise swallow this graph)
        out = connected_components(edges, driver_threshold=0)
        rows = sorted((r.id, r.cluster) for r in out.collect())
        assert rows == [(1, 1), (2, 1), (3, 1), (5, 5), (6, 5), (9, 9)]
        # plan truncated: the result reads from checkpointed RDDs, not the
        # original join lineage
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan and "Join" not in plan
        # and blocks actually landed in the reliable dir
        found = any(files for _, _, files in os.walk(ckpt))
        assert found, "no checkpoint files written"
    finally:
        # reset so later tests see no checkpoint dir (no public unset API)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())


def test_connected_components_local_checkpoint_without_dir(spark):
    from buildlog_consultant_spark.ops.dedup import connected_components

    assert spark.sparkContext.getCheckpointDir() is None
    edges = spark.createDataFrame([(1, 2), (3, 4), (4, 1)], "id_a long, id_b long")
    rows = sorted(
        (r.id, r.cluster)
        for r in connected_components(edges, driver_threshold=0).collect()
    )
    assert rows == [(1, 1), (2, 1), (3, 1), (4, 1)]


def test_connected_components_paths_agree(spark):
    """The adaptive driver fast path and the distributed loop must label
    identically (component-min ids) — checked on a chain, a star, a
    self-loop, and disjoint pairs."""
    from buildlog_consultant_spark.ops.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 20), (31, 30)],
        "id_a long, id_b long",
    )
    fast = sorted(
        (r.id, r.cluster) for r in connected_components(edges).collect()
    )
    dist = sorted(
        (r.id, r.cluster)
        for r in connected_components(edges, driver_threshold=0).collect()
    )
    assert fast == dist
    assert fast[0] == (1, 1)


def test_connected_components_empty_edges(spark):
    from buildlog_consultant_spark.ops.dedup import connected_components

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty).collect() == []


def test_simhash_kernels_edges(spark):
    """The round-3 vectorized bit-vote kernels: empty text (one ''-token),
    single-token docs (signature = the token hash's bit pattern), and the
    signed bit-63 path must all survive both hash families."""
    from buildlog_consultant_spark.ops.dedup import simhash64, simhash64_md5

    df = spark.createDataFrame(
        [(1, ""), (2, "solo"), (3, "a b a b a")], "doc_id long, text string"
    )
    for fn in (simhash64, simhash64_md5):
        rows = {r.id: r.simhash for r in fn(df).collect()}
        assert set(rows) == {1, 2, 3}
        again = {r.id: r.simhash for r in fn(df).collect()}
        assert rows == again  # deterministic
    # single-token doc: every vote is ±1 from that one hash, so the
    # signature IS the token's hash bit pattern
    from pyspark.sql import functions as F

    h = df.where("doc_id = 2").select(
        F.xxhash64(F.lit("solo")).alias("h")
    ).head()[0]
    assert {r.simhash for r in simhash64(df.where("doc_id = 2")).collect()} == {h}


def test_simhash_near_dup_pairs_planted(spark):
    """Identical docs: collapsed by the default exact-dedup pre-pass (round
    4 — API parity with the MinHash family), paired at hamming 0 only when
    the pre-pass is explicitly disabled; an unrelated doc never pairs."""
    from buildlog_consultant_spark.ops.dedup import simhash_near_dup_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical → exact dup, not a near-dup pair
            (3, "completely different content about spark physical plans"),
        ],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dup_pairs(df).collect()}
    assert rows == {}, "exact dups must be collapsed before banding by default"
    rows = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_dup_pairs(df, dedup_exact_first=False).collect()
    }
    assert rows == {(1, 2): 0}


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """Winnowing's core guarantee: two documents sharing a token run of
    length >= w+k-1 (here 6) must share at least one fingerprint; docs
    with no overlap share none (whp)."""
    from buildlog_consultant_spark.ops.dedup import winnow_dup_groups

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    df = spark.createDataFrame(
        [
            (1, f"intro one two {shared} tail x y z"),
            (2, f"completely different head {shared} other ending words"),
            (3, "nothing in common with the others at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    groups = winnow_dup_groups(df, k=3, w=4).collect()
    assert groups, "shared 6-token run must produce a shared fingerprint"
    for g in groups:
        assert g.n_docs == 2 and g.min_doc == 1  # only docs 1 and 2 overlap


def test_winnow_short_doc_single_fingerprint(spark):
    from buildlog_consultant_spark.ops.dedup import winnow_fingerprints

    df = spark.createDataFrame([(7, "just two")], "doc_id long, text string")
    rows = winnow_fingerprints(df, k=3, w=4).collect()
    assert len(rows) == 1  # shorter than one window → one whole-array min


def test_ivf_topk_probes_only_nearest_cells(spark):
    from buildlog_consultant_spark.ops.similarity import ivf_topk

    # pivots = two lowest ids: 0 → [1,0], 1 → [0,1]; query = 0; nprobe=1
    # probes only cell 0, so id 11 (cell 1) is excluded despite a positive
    # cosine — the IVF recall trade the operator is supposed to make
    df = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 1.0]),
            (10, [0.9, 0.1]),
            (11, [0.1, 0.9]),
        ],
        "vec_id long, embedding array<double>",
    )
    out = ivf_topk(df, query_vec_id=0, k=10, n_pivots=2, nprobe=1).collect()
    ids = [r.vec_id for r in out]
    assert 10 in ids and 11 not in ids and 1 not in ids


def test_ivf_topk_cell_cap_deterministic(spark):
    from buildlog_consultant_spark.ops.similarity import ivf_topk

    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    rows += [(100 + i, [1.0, 0.0]) for i in range(50)]  # hot cell 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ivf_topk(df, query_vec_id=0, k=10, n_pivots=2, nprobe=1, max_cell=5).collect()
    # cap keeps the 5 lowest ids of cell 0 (query excluded); all tie at
    # cosine 1.0 so the scorer orders by id
    assert [r.vec_id for r in out] == [100, 101, 102, 103, 104]


def test_ann_topk_lsh_hot_bucket_capped_deterministic(spark):
    from buildlog_consultant_spark.ops.similarity import ann_topk_lsh

    df = _hot_cold_df(spark, n_hot=100)
    out = ann_topk_lsh(
        df, query_vec_id=0, k=10, n_planes=_PLANES, dim=_DIM, max_bucket=50
    ).collect()
    # all hot vectors tie at cosine 1.0; the cap keeps the 50 lowest ids of
    # the probed bucket (query excluded), the scorer then tie-breaks by id
    assert [r.vec_id for r in out] == list(range(1, 11))
