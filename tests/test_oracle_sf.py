"""The Python-golden oracles must follow the data dir, not pin sf0.01
(VERDICT r2 "what's wrong" #1): `simhash`, `minhash_near_dups_xx`, and
`near_dup_clusters` recompute their golden VALUES in pure Python; round 2
read them from a hardcoded sf0.01 path while the Spark queries followed the
driver's sf_dir. This mirrors the driver's compare loop at a SECOND scale
factor (sf0.001) — green here proves the oracles track sf_dir without edits.
"""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield s


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _row_key(row):
    # None-safe total order (NULLs can share a column with dates etc.,
    # which raw tuple comparison rejects) — same spirit as the driver's
    # repr-based sort
    return tuple((v is None, repr(v)) for v in row)


@pytest.mark.parametrize(
    "name",
    [
        "simhash",
        "minhash_near_dups_xx",
        "near_dup_clusters",
        "ann_topk_ivf",
        "winnow_dups",
        "near_dup_dedup",
        "embedding_clusters",
        "simhash_near_dups",
        # r5/r6 Python-golden oracles (recompute over {sf_dir}/documents)
        "compression_ratio",
        "url_dedup",
        "dup_spans",
        "span_scrub",
        "line_dedup",
        "unigram_quality",
        "ann_topk_lsh_batch",
        "pack_sequences",
        "near_dup_verify",
        "incremental_dedup",
        "source_mixture",
        "mixture_sample",
        "nb_classifier",
        "domain_stats",
        "quality_gate_auto",
        "source_overlap",
        "latest_snapshot",
        "funnel",
        "kmv_distinct",
        "pagerank",
        "scd2_intervals",
        "events_rollup",
        "rate_anomaly",
        "cms_heavy",
        "streaming_kmv",
        "cluster_canonical",
        # session-4 additions: fuzzy_lev_pairs is Python-golden; the
        # others run eager internal actions (triangle_count's node
        # count, jaccard's localCheckpoint) or n-dependent planted
        # arithmetic worth re-proving at a second scale
        "fuzzy_lev_pairs",
        "triangle_count",
        "jaccard_pairs",
        "ntile_global",
        "gap_fill",
        # streaming queries: plain-SQL oracles, but their file-stream
        # staging logic is sf_dir-dependent — exercise it at the second
        # scale too
        "streaming_event_counts",
        "streaming_first_seen",
        "streaming_stream_join",
        "streaming_dedup",
        "streaming_sessionization",
    ],
)
def test_golden_oracle_follows_sf_dir(spark, duck, name):
    sdf = entry.queries()[name](spark, SF_DIR)
    # driver semantics: sort columns by name, then compare sorted row values
    cols = sorted(sdf.columns)
    spark_rows = sorted(
        (tuple(r) for r in sdf.select(*cols).collect()), key=_row_key
    )

    sql = entry.oracle_sql(sf_dir=SF_DIR)[name]
    cur = duck.execute(sql)
    ora_names = [d[0] for d in cur.description]
    ora = cur.fetchall()
    assert sorted(ora_names) == cols
    order = [ora_names.index(c) for c in cols]
    oracle_rows = sorted(
        (tuple(row[i] for i in order) for row in ora), key=_row_key
    )

    assert len(spark_rows) == len(oracle_rows)
    assert spark_rows == oracle_rows


def test_oracle_sf_dir_env_override(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", "/some/other/dir")
    assert entry._oracle_sf_dir() == "/some/other/dir"
    monkeypatch.delenv("SPARK_GRAFT_ORACLE_SF_DIR")
    assert entry._oracle_sf_dir() == "/root/testdata/sf0.01"
