"""Bloom-filter incremental deduplication.

The production incremental-crawl shape: a huge existing corpus (10^12
docs) and a small-by-comparison new batch (one crawl/day). "Which batch
docs are genuinely new?" is an anti-join — but a plain anti-join shuffles
BOTH sides on the join key, and the corpus side is the 100 TB one. The
classic fix (what Spark's own runtime-row-filter optimization does with
`bloom_filter_agg`, which is not registered in the public function
registry — verified UNRESOLVED_ROUTINE on 4.1.2) is to build a Bloom
filter over the SMALL side's keys and apply it map-side to the corpus
scan, so only probable-duplicate corpus rows (true dups + a bounded
false-positive fraction) ever reach the confirm join.

This module builds that filter from public primitives only:

  * build — per batch row, k word/mask bit positions from
    ``xxhash64(key, seed_i)`` → ONE ``bit_or`` hash aggregate over at
    most m/64 word indexes (map-side partial agg; the filter, not the
    data, is what converges) → collect of ≤ m/64 (word, bits) rows →
    dense ``array<long>`` literal. For the default m = 2^18 that is a
    4096-long (32 KB) plan literal — broadcast-by-construction, no
    driver round-trip at probe time.
  * probe — pure JVM whole-stage-codegen expressions:
    ``element_at(words, idx >> 6) & (1 << (idx & 63)) != 0`` AND-ed over
    the k seeds. No UDF, no shuffle: Catalyst pushes the filter to just
    above the corpus scan.
  * confirm — the surviving corpus rows (tiny) are exact-anti-joined
    against the batch on null-safe text equality, so Bloom false
    positives are screened out and the final answer is EXACTLY the
    plain anti-join (which is what the SQL oracle computes). A false
    NEGATIVE is impossible by construction (every inserted key sets all
    k of its bits), so no duplicate can slip through.

False-positive rate: (1 - e^{-kn/m})^k — for the defaults (m = 2^18,
k = 4) and n = 10^4 batch docs, ~1e-5; size m at ~10 bits per expected
batch key for ~1% at k = 4. FPs cost only wasted confirm-join rows,
never correctness.

NULL policy: matches `dedup_exact`'s groupBy(text) semantics — NULL text
equals NULL text (xxhash64 hashes a NULL column to the seed-only value,
so all NULL-text rows share bloom positions; the confirm join uses
eqNullSafe; oracles say IS NOT DISTINCT FROM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shl1(p):
    """1L << (p & 63) — the PySpark `shiftleft` wrapper insists on a
    Python-int shift amount; call_function passes the Column through to
    the (column-accepting) SQL builtin."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), p.bitwiseAND(F.lit(63)).cast("int")
    )


def _positions(key, m_bits: int, k: int):
    """k bloom bit positions (long, in [0, m_bits)) for a key column."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits).cast("long"))
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame, key, m_bits: int = 1 << 18, k: int = 4
) -> list[int]:
    """Distributed Bloom-filter build over ``key`` (a Column) of ``df``.

    Returns the dense word list (length ceil(m_bits/64), int64 values —
    possibly negative when bit 63 is set). The only action is a collect
    of at most m_bits/64 (word, bits) rows — bounded by the FILTER size,
    independent of df's row count."""
    if m_bits <= 0 or k <= 0:
        raise ValueError(f"m_bits and k must be positive, got {m_bits}, {k}")
    n_words = (m_bits + 63) // 64
    pairs = F.array(
        *[
            F.struct(
                F.shiftright(p, 6).cast("int").alias("w"),
                _shl1(p).alias("m"),
            )
            for p in _positions(key, m_bits, k)
        ]
    )
    rows = (
        df.select(F.explode(pairs).alias("pm"))
        .groupBy(F.col("pm.w").alias("w"))
        .agg(F.bit_or("pm.m").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(words: list[int], key, m_bits: int = 1 << 18, k: int = 4):
    """Membership-test Column for a filter built by `bloom_build` with the
    SAME (m_bits, k). All-JVM (element_at + bit ops) — stays inside
    whole-stage codegen and pushes down to just above the scan."""
    arr = F.lit(words).cast("array<bigint>")
    test = None
    for p in _positions(key, m_bits, k):
        word = F.element_at(arr, F.shiftright(p, 6).cast("int") + 1)
        bit = word.bitwiseAND(_shl1(p)) != 0
        test = bit if test is None else (test & bit)
    return test


def incremental_new_docs(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """Batch docs whose text does not already exist in the corpus —
    exactly ``batch ANTI JOIN corpus ON text IS NOT DISTINCT FROM text``,
    computed with the corpus side reduced map-side by a Bloom filter
    built from the batch's keys (see module docstring for why that is
    the only shape that survives a 10^12-row corpus).

    The corpus is touched by ONE scan + bloom filter + the confirm
    semi/anti machinery over the (bounded) surviving rows; nothing
    corpus-sized ever shuffles."""
    key = F.md5(F.col(text_col))
    words = bloom_build(batch, key, m_bits, k)
    hits = corpus.where(bloom_might_contain(words, key, m_bits, k)).select(
        F.col(text_col).alias("_dup_text")
    )
    return batch.join(
        hits, F.col(text_col).eqNullSafe(F.col("_dup_text")), "left_anti"
    )
