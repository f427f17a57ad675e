"""Single-log CLI — the analogue of the reference's analyze-build-log /
analyze-sbuild-log / analyze-autopkgtest-log binaries
(/root/reference/src/bin/), so a reference user can point their existing
invocations at this engine:

    python -m buildlog_consultant_spark.cli [--json] [--context N] [PATH]

Reads PATH (or stdin), auto-detects the container format, prints the
highlighted match or the JSON sink shape
{lineno, line, origin, problem, details, stage, phase}
(/root/reference/src/bin/analyze-build-log.rs:23-47).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="buildlog-consultant-spark")
    ap.add_argument("path", nargs="?", help="log file (default: stdin)")
    ap.add_argument("--json", action="store_true", help="output JSON")
    ap.add_argument("--context", type=int, default=5, help="context lines")
    ap.add_argument(
        "--format",
        choices=["auto", "plain", "sbuild", "autopkgtest", "apt"],
        default="auto",
    )
    args = ap.parse_args(argv)

    text = open(args.path).read() if args.path else sys.stdin.read()

    from .spark.classify import analyze_text, detect_container

    if args.format == "apt":
        # analyze-apt-log equivalent (/root/reference/src/bin/analyze-apt-log.rs)
        from .core.problems import canonical_json
        from .engine.apt import find_apt_get_failure
        from .engine.core import split_log_lines

        # split_inclusive('\n') like analyze-apt-log.rs:28
        match, problem = find_apt_get_failure(split_log_lines(text))
        result = {
            "container": "apt",
            "problem_kind": problem.kind if problem else None,
            "match_line": match.line.rstrip("\n") if match else None,
            "offset": match.offset if match else None,
            "lineno": match.lineno if match else None,
            "origin": match.origin if match else None,
            "details": canonical_json(problem.details) if problem else None,
            "stage": None,
            "phase": None,
            "phase_test": None,
            "section": None,
            "description": None,
            "is_universal": problem.is_universal if problem else None,
        }
    else:
        container = args.format if args.format != "auto" else detect_container(text)
        result = analyze_text(text, container=container)

    if args.json:
        print(json.dumps(result, indent=2))
        return 0 if result["match_line"] is not None else 1

    if result["match_line"] is None:
        print("No issues found")
        return 1
    from .core.matchers import SingleLineMatch
    from .engine.core import highlight_lines, split_log_lines

    lines = split_log_lines(text)
    offset = (result["lineno"] or 1) - 1
    offset = min(max(offset, 0), len(lines) - 1)
    m = SingleLineMatch(result["origin"] or "", offset, lines[offset])
    for out_line in highlight_lines(lines, m, context=args.context):
        print(out_line)
    if result["problem_kind"]:
        print(f"Identified issue: {result['problem_kind']}: {result['description']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
