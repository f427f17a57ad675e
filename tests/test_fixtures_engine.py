"""Fixture corpus ↔ engine round-trip (no Spark): every generated document's
classification must equal the golden derived by construction, and the padding
vocabulary must stay invisible to both matcher catalogs."""

from buildlog_consultant_spark.engine.core import find_build_failure_description
from buildlog_consultant_spark.fixtures import (
    _pad_line,
    expected_counts,
    family_for,
    golden_pdf,
    make_doc,
)
from buildlog_consultant_spark.spark.classify import analyze_text, detect_container

N = 300


def test_fixture_goldens_round_trip():
    for i in range(N):
        page, golden = make_doc(i)
        out = analyze_text(page["text"])
        fam = family_for(i).__name__
        if golden is None:
            assert out["problem_kind"] is None and out["match_line"] is None, (i, fam, out)
            continue
        assert out["problem_kind"] == golden["problem_kind"], (i, fam, out)
        assert out["match_line"] == golden["match_line"], (i, fam)
        assert out["lineno"] == golden["lineno"], (i, fam, out["lineno"], golden["lineno"])
        assert out["details"] == golden["details"], (i, fam)
        assert out["container"] == golden["container"], (i, fam)
        if golden["stage"] is not None:
            assert out["stage"] == golden["stage"], (i, fam)


def test_fixtures_padding_is_no_match():
    pads = [_pad_line(i, j) for i in range(40) for j in range(8)]
    m, p = find_build_failure_description(pads)
    assert m is None and p is None


def test_fixture_determinism():
    a1, g1 = make_doc(123)
    a2, g2 = make_doc(123)
    assert a1 == a2 and g1 == g2


def test_container_detection():
    assert detect_container("hello\nworld\n") == "plain"
    assert detect_container("autopkgtest [10:00:00]: foo\n") == "autopkgtest"
    assert detect_container("+" + "-" * 78 + "+\n| Build |\n") == "sbuild"


def test_expected_counts_consistency():
    counts = expected_counts(N)
    g = golden_pdf(0, N)
    from collections import Counter

    via_pdf = Counter(zip(g["problem_kind"].where(g["problem_kind"].notna(), None), g["lang"]))
    assert dict(via_pdf) == counts


def test_html_text_invariant():
    """Per-row invariant: byte-identical extracted text per url — the html
    wraps the exact text (pure inverse function)."""
    import html as _html
    import re

    for i in range(0, 50):
        page, _ = make_doc(i)
        inner = re.search(
            rb"<pre>(.*)</pre>", page["html"], re.S
        ).group(1)
        assert _html.unescape(inner.decode("utf-8")) == page["text"]
