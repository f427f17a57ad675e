"""Semi-structured (JSON) column handling — the payload-parsing step
of every event/log pipeline (the reference's engine consumes
pre-parsed YAML/JSON in its apt/cudf paths, e.g. ``engine/apt.py``'s
dose3 report handling; here the parse itself is the distributed
operator).

``from_json`` is the right Spark primitive: the parse runs JVM-side
(Jackson) inside whole-stage codegen — no Python in the row path — and
Catalyst's OptimizeJsonExprs/schema-pruning rewrite collapses
``from_json(col).field`` chains so only the accessed subtree is
materialized. Contrast a Python UDF with ``json.loads``: Arrow
round-trip + per-row interpreter work for the identical result.

Cross-engine parse-failure contract (pinned by test): Spark PERMISSIVE
mode is LENIENT about trailing garbage ('{"k": 1}x' parses k=1) while
strict validators (DuckDB json_valid) reject it — so the portable
surface is the EXTRACTED VALUES of documents that are either fully
valid or fully garbage. Missing keys, type-mismatched scalars, and
unparseable rows all yield NULL fields. Two replay subtleties an
oracle must honor (experiment-pinned): (a) trailing-garbage rows
diverge — callers who need them byte-portable must pre-filter with a
strict validator on both sides; (b) typed from_json(k BIGINT) rejects
QUOTED numbers ('{"k": "35"}' -> NULL) and doubles/booleans, while a
string-extract-then-cast replay would coerce them — the SQL oracle
gates on json_type IN ('BIGINT','UBIGINT') to match.

NULL policy: NULL json → NULL struct → NULL fields (count() skips
them, matching SQL).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_json_fields(
    df: DataFrame,
    json_col: str,
    schema: str,
    fields: Mapping[str, str],
) -> DataFrame:
    """Parse ``json_col`` once with ``schema`` (a DDL string, e.g.
    ``'k BIGINT, m STRUCT<d: BIGINT>'``) and project each
    ``out_name -> dotted.path`` in ``fields`` as a top-level column.
    One from_json per ROW regardless of how many fields are pulled
    (the single ``_j`` intermediate is what lets Catalyst prune and
    de-duplicate the parse)."""
    d = df.withColumn("_j", F.from_json(F.col(json_col), schema))
    for out, path in fields.items():
        d = d.withColumn(out, F.col(f"_j.{path}"))
    return d.drop("_j")
