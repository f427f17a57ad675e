"""KMV (k-minimum-values) distinct-count sketch — the mergeable
cardinality estimator a crawl pipeline uses where an exact
COUNT(DISTINCT) shuffle is unaffordable: "distinct shingles (or URLs)
per source/domain" over 10^12 rows.

Why not exact distinct: `groupBy(key).agg(countDistinct(x))` shuffles
every distinct (key, x) pair — at crawl scale that is the corpus. Why
not approx_count_distinct: Spark's HLL++ is the right production tool
but its estimate is not bit-replayable outside the JVM, so it can't be
oracle-checked; KMV with xxhash64 is the same mergeable-sketch shape
(bounded state, union = merge) AND every intermediate is an integer a
pure-Python replay reproduces exactly.

Scale shape (the honest sketch contract, not a collect_set in
disguise):

1. map side — explode shingles, hash JVM-side (`F.xxhash64`), then a
   `mapInPandas` PARTIAL pass that streams the partition's Arrow
   batches through a bounded per-key accumulator (≤ k smallest
   DISTINCT hash values per key; memory k × keys-in-partition, not
   distinct-values) and emits ONE row per key per partition;
2. one exchange of those bounded rows (≤ k × map-tasks longs per key —
   independent of corpus size);
3. final merge — flatten / array_distinct / array_sort / slice(k) over
   the collected partials (input already bounded), then the estimate.

Estimator (Bar-Yossef et al. 2002): with U(k) the k-th smallest
distinct hash mapped to [0, 2^64), distinct ≈ (k-1) · 2^64 / U(k);
when fewer than k distinct hashes exist the sketch IS the exact
distinct set, so the answer is exact. All arithmetic is exact integer
floor division (Python ints in a vectorized final-stage UDF over one
row per key), clamped to int64 — byte-replayable by the oracle.

Unsigned ordering trick: Spark's xxhash64 returns a SIGNED long; the
k-min must be over the UNSIGNED value. XOR-ing the sign bit
(`h ^ -2^63`) maps unsigned order onto signed order, so every Spark
comparison (heap, array_sort, slice) runs in the flipped domain and
the final stage adds 2^63 back.

NULL policy: NULL key is a normal group (groupBy semantics; the pandas
partial uses `dropna=False`). NULL text contributes the single ''
shingle (shared `_shingles` convention — see ops/dedup.py)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles
from .text import tokens_expr

_SIGN = -(1 << 63)
INT64_MAX = (1 << 63) - 1


def _kmv_partial(k: int):
    """mapInPandas function: bounded per-key k-min-distinct accumulator
    over the partition's batches; yields one (key, mins) row per key."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            for key, grp in pdf.groupby("_k", dropna=False, sort=False):
                vals = np.unique(grp["_h"].to_numpy(dtype="int64"))[:k]
                key = None if pd.isna(key) else key
                cur = acc.get(key)
                if cur is None:
                    acc[key] = vals
                else:
                    acc[key] = np.union1d(cur, vals)[:k]
        yield pd.DataFrame(
            {
                "_k": list(acc.keys()),
                "_mins": [v.tolist() for v in acc.values()],
            }
        )

    return fn


def kmv_estimate_py(mins_unsigned: list[int], k: int) -> int:
    """Exact-integer KMV estimate from the ≤ k smallest distinct
    UNSIGNED hash values (ascending). Shared by the Spark final stage
    and the pure-Python oracle replay."""
    m = len(mins_unsigned)
    if m < k:
        return m  # sketch holds every distinct hash → exact
    uk = max(mins_unsigned[k - 1], 1)
    return min((k - 1) * (1 << 64) // uk, INT64_MAX)


def kmv_distinct_shingles(
    df: DataFrame,
    k: int = 64,
    key_col: str = "source",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Per-key estimated distinct shingle count:
    (key, n_mins, est_distinct). ``n_mins`` is the sketch fill (= exact
    distinct count when < k)."""
    # the key travels through two mapInPandas stages — declare its REAL
    # type (a hardcoded "string" would Arrow-mismatch any non-string key)
    key_t = df.schema[key_col].dataType.simpleString()
    hashed = df.select(
        F.col(key_col).alias("_k"),
        F.explode(_shingles(text_col, shingle_k)).alias("_g"),
    ).select(
        "_k",
        F.xxhash64(F.col("_g")).bitwiseXOR(F.lit(_SIGN)).alias("_h"),
    )
    partial = hashed.mapInPandas(
        _kmv_partial(k), schema=f"_k {key_t}, _mins array<long>"
    )
    merged = partial.groupBy("_k").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("_mins")))),
            1,
            k,
        ).alias("_mins")
    )

    def est_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mins = [
                [int(v) + (1 << 63) for v in arr] for arr in pdf["_mins"]
            ]
            yield pd.DataFrame(
                {
                    "_k": pdf["_k"],
                    "n_mins": [len(u) for u in mins],
                    "est_distinct": [kmv_estimate_py(u, k) for u in mins],
                }
            )

    return merged.mapInPandas(
        est_batch, schema=f"_k {key_t}, n_mins long, est_distinct long"
    ).withColumnRenamed("_k", key_col)


def _cms_bucket(j: int, word, width: int):
    """Row-j CMS bucket of a word: pmod(xxhash64(j::long, word), width).
    The long-first argument order is load-bearing — Spark's multi-arg
    xxhash64 chains seeds as xxh64(utf8(w), seed=xxh64(le64(j), 42)),
    which the Python replay reproduces exactly (an int-typed first arg
    would take the 4-byte path instead)."""
    return F.pmod(F.xxhash64(F.lit(j).cast("long"), word), F.lit(width))


def cms_token_estimates(
    df: DataFrame,
    width: int = 256,
    depth: int = 4,
    n_probe: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min-sketch token-frequency estimates vs exact counts —
    the OTHER mergeable sketch a crawl pipeline keeps (heavy-hitter /
    frequency estimation where per-token exact counters don't fit;
    Cormode & Muthukrishnan 2005). Emits (token, exact_c, cms_est) for
    a deterministic probe set: the ``n_probe`` distinct tokens with the
    smallest (xxhash64(token), token). CMS guarantees cms_est ≥ exact_c
    (overestimate-only) with error ≤ 2N/width at ≥ 1 − 2^-depth
    probability.

    Scale shape: the sketch build is ONE hash agg over the depth-
    expanded token stream (map-side fan-out × depth, map-side combined;
    the agg output is the bounded depth × width counter table). The
    probe estimate joins n_probe × depth rows against that table —
    broadcast-sized by construction. Exact counts come from the
    vocab-bounded unigram agg (at true crawl scale the exact side is
    the expensive half — that asymmetry is the point of the sketch;
    here it doubles as the oracle-checked ground truth).

    All counters are exact integers; the whole operator is replayed
    bit-for-bit by py_cms_token_estimates."""
    toks = df.select(F.explode(tokens_expr(text_col)).alias("w"))
    expand = F.array(
        *[
            F.struct(
                F.lit(j).cast("int").alias("j"),
                _cms_bucket(j, F.col("w"), width).alias("b"),
            )
            for j in range(depth)
        ]
    )
    cms = (
        toks.select(F.explode(expand).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.b").alias("b"))
        .agg(F.count("*").cast("long").alias("c"))
    )
    uni = toks.groupBy("w").agg(F.count("*").cast("long").alias("exact_c"))
    probes = uni.orderBy(F.xxhash64("w").asc(), F.col("w").asc()).limit(
        n_probe
    )
    probed = probes.select(
        "w", "exact_c", F.explode(expand).alias("p")
    ).select("w", "exact_c", F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    return (
        probed.join(F.broadcast(cms), ["j", "b"])
        .groupBy("w", "exact_c")
        .agg(F.min("c").alias("cms_est"))
        .select(F.col("w").alias("token"), "exact_c", "cms_est")
    )


def py_cms_token_estimates(
    texts: list, width: int = 256, depth: int = 4, n_probe: int = 16
) -> list:
    """Pure-Python golden replay of cms_token_estimates over a list of
    text values: same tokenizer (ASCII-ws collapse, lower, strip; NULL/
    empty → no tokens), same chained xxhash64, same probe selection.
    Returns sorted (token, exact_c, cms_est)."""
    import re
    import struct as _struct

    from .xxh64 import xxh64, xxh64_signed

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    counts: dict = {}
    for text in texts:
        t = (text or "").strip(" ")
        if not t:
            continue
        for w in ws.sub(" ", t).lower().split(" "):
            counts[w] = counts.get(w, 0) + 1
    seeds = [xxh64(_struct.pack("<q", j), 42) for j in range(depth)]

    def bucket(j: int, w: str) -> int:
        return xxh64_signed(w.encode("utf-8"), seeds[j]) % width

    cms = [[0] * width for _ in range(depth)]
    for w, c in counts.items():
        for j in range(depth):
            cms[j][bucket(j, w)] += c
    probes = sorted(
        counts, key=lambda w: (xxh64_signed(w.encode("utf-8")), w)
    )[:n_probe]
    return sorted(
        (
            w,
            counts[w],
            min(cms[j][bucket(j, w)] for j in range(depth)),
        )
        for w in probes
    )


def py_kmv_distinct(
    docs: list, k: int = 64, shingle_k: int = 3
) -> list:
    """Pure-Python golden replay over [(key, text)] — same tokenizer
    (whitespace-normalize, lower, split; NULL text → the single ''
    shingle), same xxhash64 (seed 42, UTF-8 bytes), same estimator.
    Returns sorted (key, n_mins, est_distinct)."""
    import re

    from .xxh64 import xxh64

    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def shingles(text):
        toks = ws.sub(" ", (text or "").strip(" ")).lower().split(" ")
        n = len(toks)
        return {
            " ".join(toks[i : i + shingle_k])
            for i in range(0, max(n - shingle_k, 0) + 1)
        }

    per_key: dict = {}
    for key, text in docs:
        hs = per_key.setdefault(key, set())
        for g in shingles(text):
            hs.add(xxh64(g.encode("utf-8")))
    out = []
    for key, hs in per_key.items():
        mins = sorted(hs)[:k]
        out.append((key, len(mins), kmv_estimate_py(mins, k)))
    return sorted(out, key=lambda r: (r[0] is not None, r[0]))
