"""Edit-distance near-duplicate pairs via prefix BLOCKING — the
record-linkage primitive (title/identifier dedup) where MinHash's
set semantics are wrong: transpositions and single-char edits barely
move an edit distance but can rewrite every shingle.

Blocking contract (recall is explicitly scoped, the standard
record-linkage trade): candidate pairs are those agreeing on the
first ``prefix_chars`` characters of the normalized text. Pairs that
edit WITHIN the block prefix are out of contract — callers wanting
multi-pass recall run several block keys (suffix, sorted-token key)
and union, which composes from this op unchanged.

Comparison window: the distance is computed over the first
``window_chars`` chars of the normalized text. This (a) bounds the
O(len^2) DP per pair regardless of document size — at crawl scale an
unbounded levenshtein over two 1 MB texts is a task-killer — and (b)
pins exact cross-engine parity: Spark's levenshtein counts CHARACTERS
while some engines (DuckDB) count UTF-8 BYTES, so the oracle replays
the same char-level DP in Python rather than SQL.

Scale shape: one map-side normalize+block projection, ONE equi-join
on the block key (hash-partitioned; never a corpus cross join), a
length pre-gate (|len_a - len_b| <= k is a levenshtein lower bound)
that prunes before any DP runs, and Spark's THRESHOLDED levenshtein
(the 3.5+ banded variant: O(k*len) and early-exit, returns -1 past
the bound) instead of the full matrix. Hot blocks (a ubiquitous
16-char opener) go quadratic within the block — the documented skew
knob is a longer/composite block key; AQE skew-split applies to the
join itself.

Normalization parity (the repo's tokenizer geometry): trim spaces →
collapse ASCII whitespace runs to one space → lower. NULL ids are
dropped (pair identity); NULL/empty text normalizes to '' and only
pairs with other ''-prefix docs under the length gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def levenshtein_block_pairs(
    df: DataFrame,
    max_dist: int = 8,
    prefix_chars: int = 16,
    window_chars: int = 192,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_a, id_b, dist): unordered doc pairs sharing the normalized
    ``prefix_chars`` block whose windowed char-level edit distance is
    <= max_dist."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    norm = F.lower(
        F.regexp_replace(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+", " "
        )
    )
    base = df.where(F.col(id_col).isNotNull()).select(
        F.col(id_col).alias("_id"),
        F.substring(norm, 1, int(prefix_chars)).alias("_blk"),
        F.substring(norm, 1, int(window_chars)).alias("_w"),
    )
    a = base.select(
        F.col("_id").alias("id_a"), "_blk", F.col("_w").alias("_wa")
    )
    b = base.select(
        F.col("_id").alias("id_b"), "_blk", F.col("_w").alias("_wb")
    )
    return (
        a.join(b, "_blk")
        .where(F.col("id_a") < F.col("id_b"))
        .where(
            F.abs(F.length("_wa") - F.length("_wb")) <= F.lit(int(max_dist))
        )
        .withColumn(
            "dist", F.levenshtein("_wa", "_wb", int(max_dist)).cast("long")
        )
        .where(F.col("dist") >= 0)
        .select("id_a", "id_b", "dist")
    )


def py_levenshtein_block_pairs(
    docs: list,
    max_dist: int = 8,
    prefix_chars: int = 16,
    window_chars: int = 192,
) -> list:
    """Pure-Python golden replay (oracle construction): same
    normalization, same blocking, same CHAR-level banded DP. ``docs``
    is a list of (id, text); returns sorted (id_a, id_b, dist)."""
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    blocks: dict = {}
    for doc_id, text in docs:
        if doc_id is None:
            continue
        t = (text or "").strip(" ")
        n = ws.sub(" ", t).lower()
        blocks.setdefault(n[:prefix_chars], []).append(
            (doc_id, n[:window_chars])
        )
    out = []
    for members in blocks.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                ia, wa = members[i]
                ib, wb = members[j]
                if abs(len(wa) - len(wb)) > max_dist:
                    continue
                d = _py_lev(wa, wb, max_dist)
                if d >= 0:
                    out.append((ia, ib, d))
    return sorted(out)


def _py_lev(a: str, b: str, k: int) -> int:
    """Banded Levenshtein: exact distance if <= k, else -1."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > k:
        return -1
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        best = i
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
            best = min(best, cur[j])
        if best > k:
            return -1
        prev = cur
    return prev[lb] if prev[lb] <= k else -1
