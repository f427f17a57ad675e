"""Matcher-machinery vectors ported from /root/reference/src/match.rs:257-470
plus Match-model semantics from src/lib.rs:254-475."""

from buildlog_consultant_spark.core.matchers import (
    MatcherGroup,
    MultiLineMatch,
    Rule,
    SingleLineMatch,
    rule,
)
from buildlog_consultant_spark.core.problems import Problem


def _test_problem(desc):
    return Problem("test", {"description": desc})


def test_rule_matches_and_extracts():
    m = Rule(r"test", lambda c: _test_problem("test problem"))
    lines = ["line 1", "test line", "line 3"]
    result = m.extract(lines, 1)
    assert result is not None
    match, problem = result
    assert match.line == "test line"
    assert match.offset == 1
    assert problem.kind == "test"
    assert m.extract(["other line"], 0) is None


def test_rule_no_problem_callback():
    m = rule(r"test")
    result = m.extract(["test line"], 0)
    assert result is not None
    assert result[1] is None


def test_matcher_group_first_match_wins():
    g = MatcherGroup(
        [
            Rule(r"test1", lambda c: _test_problem("p1")),
            Rule(r"test2", lambda c: _test_problem("p2")),
        ]
    )
    result = g.extract(["line 1", "test2 line", "line 3"], 1)
    assert result is not None
    match, problem = result
    assert match.line == "test2 line" and match.offset == 1
    assert problem.kind == "test"
    assert g.extract(["line 1", "line 2", "line 3"], 1) is None
    # declaration order decides when both match
    g2 = MatcherGroup(
        [
            Rule(r"testX", lambda c: _test_problem("first")),
            Rule(r"test", lambda c: _test_problem("second")),
        ]
    )
    _, p = g2.extract(["testX line"], 0)
    assert p.details == {"description": "first"}


def test_origin_format():
    # src/match.rs:111: origin = "direct regex (<pattern>)"
    m = rule(r"error: (.*)")
    match, _ = m.extract(["error: x"], 0)
    assert match.origin == "direct regex (error: (.*))"


def test_match_model_semantics():
    # src/lib.rs: lineno = offset + 1; MultiLineMatch.offset/line = LAST
    s = SingleLineMatch("o", 4, "line")
    assert s.lineno == 5 and s.offsets == [4] and s.linenos == [5]
    m = MultiLineMatch("o", [2, 3, 4], ["a", "b", "c"])
    assert m.offset == 4 and m.lineno == 5
    assert m.line == "c"
    shifted = m.add_offset(10)
    assert shifted.offsets == [12, 13, 14] and shifted.lines == ["a", "b", "c"]


def test_unanchored_search_semantics():
    # Rust Regex::captures searches anywhere in the line
    m = rule(r"needle")
    assert m.extract(["hay needle hay"], 0) is not None
