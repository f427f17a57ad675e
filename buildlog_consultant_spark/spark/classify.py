"""The classify operator: the reference's analyzers as a vectorized
Arrow-batched stage.

One DataFrame row per document goes in; one row with the classification
struct comes out — the log is never exploded to per-line rows (per-doc
processing stays inside the Arrow batch; at 10^12 rows an explode would 100×
the shuffle volume for no benefit since all per-line state is doc-local).

Container detection mirrors the reference's entry points (README: "Currently
supported container formats: sbuild, plain"; autopkgtest logs get the
autopkgtest analyzer):
  * sbuild  — text contains the +{78×'-'}+ section separator
  * autopkgtest — text contains "autopkgtest [" timestamped packets
  * plain   — everything else → find_build_failure_description
"""

from __future__ import annotations

from typing import Iterator, Optional, Sequence

import pandas as pd

from ..core.problems import canonical_json
from ..engine.autopkgtest import find_autopkgtest_failure_description
from ..engine.core import find_build_failure_description, split_log_lines
from ..engine.problem_text import problem_message
from ..engine.sbuild import SEP, parse_sbuild_log, worker_failure_from_sbuild_log

CLASSIFY_RESULT_FIELDS = (
    "container string, problem_kind string, match_line string, "
    "offset long, lineno long, origin string, details string, "
    "stage string, phase string, phase_test string, section string, description string, "
    "is_universal boolean, "
    # typed Summary payload (reference src/sbuild.rs:56-123) — per-build
    # resource telemetry, queryable downstream
    "build_time long, install_time long, package_time long, build_space long, "
    "space long, package string, source_version string, distribution string, "
    "sbuild_status string"
)

_EMPTY = {
    "container": "plain",
    "problem_kind": None,
    "match_line": None,
    "offset": None,
    "lineno": None,
    "origin": None,
    "details": None,
    "stage": None,
    "phase": None,
    "phase_test": None,
    "section": None,
    "description": None,
    "is_universal": None,
    "build_time": None,
    "install_time": None,
    "package_time": None,
    "build_space": None,
    "space": None,
    "package": None,
    "source_version": None,
    "distribution": None,
    "sbuild_status": None,
}


def detect_container(text: str) -> str:
    if SEP in text:
        return "sbuild"
    if "autopkgtest [" in text:
        return "autopkgtest"
    return "plain"


def analyze_text(
    text: Optional[str], use_gate: bool = True, container: Optional[str] = None
) -> dict:
    """Classify one document's text; returns a flat result dict.

    ``container`` forces the analyzer ("plain"/"sbuild"/"autopkgtest")
    instead of auto-detection — the CLI's --format override.

    Never raises: at 10^12 rows one pathological document must not kill the
    executor (the reference is process-per-log and can afford to panic; a
    batch UDF cannot). Analyzer errors surface as problem_kind
    '__analyzer-error__' rows for offline triage.
    """
    try:
        return _analyze_text_inner(text, use_gate, container)
    except Exception as ex:  # noqa: BLE001 — deliberate batch-safety net
        out = dict(_EMPTY)
        out["problem_kind"] = "__analyzer-error__"
        out["description"] = f"{type(ex).__name__}: {ex}"[:500]
        return out


def _analyze_text_inner(
    text: Optional[str], use_gate: bool = True, container: Optional[str] = None
) -> dict:
    if not text:
        return dict(_EMPTY)
    if container is None:
        container = detect_container(text)
    out = dict(_EMPTY)
    out["container"] = container
    if container == "sbuild":
        log = parse_sbuild_log(text)
        failure = worker_failure_from_sbuild_log(log)
        summary = log.summary() or {}
        out["build_time"] = summary.get("build_time")
        out["install_time"] = summary.get("install_time")
        out["package_time"] = summary.get("package_time")
        out["build_space"] = summary.get("build_space")
        out["space"] = summary.get("space")
        out["package"] = summary.get("package")
        out["source_version"] = summary.get("source_version")
        out["distribution"] = summary.get("distribution")
        out["sbuild_status"] = summary.get("status")
        out["stage"] = failure.stage
        if failure.section is not None:
            out["section"] = failure.section.title
        if failure.phase:
            out["phase"] = failure.phase[0]
            if len(failure.phase) > 1:
                out["phase_test"] = failure.phase[1]
        out["description"] = failure.description
        if failure.match is not None:
            out["match_line"] = failure.match.line.rstrip("\n")
            out["origin"] = failure.match.origin
            # section-relative offset rebased to log-absolute lineno
            # (src/sbuild.rs:506-512)
            if failure.section is not None:
                out["lineno"] = failure.section.offsets[0] + failure.match.lineno
            else:
                out["lineno"] = failure.match.lineno
            out["offset"] = out["lineno"] - 1
        if failure.error is not None:
            out["problem_kind"] = failure.error.kind
            out["details"] = canonical_json(failure.error.details)
            out["is_universal"] = failure.error.is_universal
        return out
    # split_inclusive('\n') parity — NOT splitlines(), which also splits on
    # \r/\f/  and would shift offsets vs the reference (core.py docstring)
    lines = split_log_lines(text)
    if container == "autopkgtest":
        match, testname, error, description = find_autopkgtest_failure_description(lines)
        out["phase"] = "autopkgtest"
        out["phase_test"] = testname
        out["description"] = description or problem_message(error)
    else:
        match, error = find_build_failure_description(lines, use_gate=use_gate, text=text)
        out["description"] = (
            problem_message(error)
            if error is not None
            else (match.line.rstrip("\n") if match is not None else None)
        )
    if match is not None:
        out["match_line"] = match.line.rstrip("\n")
        out["offset"] = match.offset
        out["lineno"] = match.lineno
        out["origin"] = match.origin
    if error is not None:
        out["problem_kind"] = error.kind
        out["details"] = canonical_json(error.details)
        out["is_universal"] = error.is_universal
    return out


def _classify_iter(
    batches: Iterator[pd.DataFrame], text_col: str, keep_cols: Sequence[str],
    use_gate: bool = True,
) -> Iterator[pd.DataFrame]:
    cols = list(CLASSIFY_RESULT_FIELDS_NAMES)
    for pdf in batches:
        rows = [analyze_text(t, use_gate=use_gate) for t in pdf[text_col]]
        res = pd.DataFrame(rows, columns=cols)
        for c in (
            "offset", "lineno",
            "build_time", "install_time", "package_time", "build_space", "space",
        ):
            res[c] = res[c].astype("Int64")
        res["is_universal"] = res["is_universal"].astype("boolean")
        out = pd.concat(
            [pdf[list(keep_cols)].reset_index(drop=True), res], axis=1
        )
        yield out


CLASSIFY_RESULT_FIELDS_NAMES = [
    f.strip().split(" ")[0] for f in CLASSIFY_RESULT_FIELDS.split(",")
]


def classify_documents(
    df,
    text_col: str = "text",
    keep_cols: Sequence[str] = ("url", "lang"),
    use_gate: bool = True,
):
    """Run the classify stage: keep_cols pass through, text is consumed.

    Column pruning: only keep_cols + text reach the Python worker — select
    BEFORE this call so Parquet scans never read unused columns (e.g. html).
    """
    keep_cols = [c for c in keep_cols if c in df.columns]
    in_df = df.select(*keep_cols, text_col)
    schema_prefix = ", ".join(f"{c} {dict(zip(df.schema.names, [f.dataType.simpleString() for f in df.schema.fields]))[c]}" for c in keep_cols)
    schema = (schema_prefix + ", " if schema_prefix else "") + CLASSIFY_RESULT_FIELDS
    return in_df.mapInPandas(
        lambda it: _classify_iter(it, text_col, keep_cols, use_gate), schema=schema
    )
