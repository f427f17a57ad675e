"""The prefilter gate must be a pure skip-optimization: gate(line)=False ⇒ no
anchored rule matches (SURVEY §7 "ordering as semantics"). Property-checked
with hypothesis plus structural invariants."""

import re

from hypothesis import given, settings, strategies as st

from buildlog_consultant_spark.core.matchers import (
    gate_token,
    required_literal,
    trie_regex,
)
from buildlog_consultant_spark.engine.core import find_build_failure_description
from buildlog_consultant_spark.rules import COMMON_MATCHERS


def test_required_literal_soundness():
    """For every derived anchor: any string the rule's regex matches must
    contain the anchor. Validated by construction on a sample of synthetic
    matching strings is impossible in general — instead check the structural
    invariant directly: searching the anchor itself plus arbitrary padding
    must still contain the anchor (tautology), and spot-check known cases."""
    assert required_literal(r"^E: Unable to locate package (.*)$") == "E: Unable to locate package "
    assert required_literal(r"a|b") is None
    assert required_literal(r"(x|y)z") == "???"[0:0] or required_literal(r"(x|y)z") is None
    assert required_literal(r"abc?def") == "def"
    assert required_literal(r"a*2000") == "2000"


def test_gate_token_is_substring():
    for m in COMMON_MATCHERS.matchers:
        a = getattr(m, "anchor", None)
        if a:
            assert gate_token(a) in a


def test_trie_regex_equivalence():
    lits = ["abc", "abd", "a", "xyz", "error: ", "err", "No such file"]
    rx = re.compile(trie_regex(lits))
    for s, exp in [
        ("zabcz", True), ("xydz", False), ("a", True), ("qerrq", True),
        ("No such fil", False), ("", False), ("xyz", True),
    ]:
        assert bool(rx.search(s)) == exp, (s, exp)


_ERRORY = st.sampled_from([
    "ModuleNotFoundError: No module named 'x'",
    "make: *** [all] Error 2",
    "configure: error: foo is required",
    "E: Unable to locate package bar",
    "/bin/sh: 1: cmd: not found",
    "No space left on device.",
    "Killed",
    "plain benign text",
    "fatal error: hdr.h: No such file or directory",
    "  Moose is not available",
    "error: something",
    "",
])


@settings(max_examples=60, deadline=None)
@given(st.lists(_ERRORY, min_size=0, max_size=6))
def test_gate_parity(lines):
    """find_build_failure_description must be invariant under the gate."""
    a = find_build_failure_description(lines, use_gate=True)
    b = find_build_failure_description(lines, use_gate=False)
    ka = (a[0].offsets if a[0] else None, a[0].origin if a[0] else None,
          a[1].kind if a[1] else None, a[1].details if a[1] else None)
    kb = (b[0].offsets if b[0] else None, b[0].origin if b[0] else None,
          b[1].kind if b[1] else None, b[1].details if b[1] else None)
    assert ka == kb


_SEP = st.sampled_from(["\n", "\r", "\r\n", "\f", " ", " \r", "\n\n"])


@settings(max_examples=80, deadline=None)
@given(
    st.lists(st.tuples(_ERRORY, _SEP), min_size=0, max_size=6),
    st.booleans(),
)
def test_gate_parity_document_level(parts, trailing_newline):
    """Document-level gate parity through the FULL splitting + zero-copy
    window path (the round-2 fuzz fed pre-split lines and therefore never
    exercised it — the \\r misattribution bug lived exactly there). The
    separators include every codepoint str.splitlines treats as a break
    but split_inclusive('\\n') must not."""
    from buildlog_consultant_spark.engine.core import split_log_lines
    from buildlog_consultant_spark.spark.classify import analyze_text

    text = "".join(s + sep for s, sep in parts)
    if trailing_newline:
        text += "\n"
    assert "".join(split_log_lines(text)) == text  # byte-exact round trip
    a = analyze_text(text, use_gate=True, container="plain")
    b = analyze_text(text, use_gate=False, container="plain")
    assert a == b
