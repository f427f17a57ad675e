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

from buildlog_consultant_spark.engine.core import (
    find_build_failure_description,
    find_secondary_build_failure,
    split_log_lines,
)
from buildlog_consultant_spark.spark.classify import analyze_text


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
