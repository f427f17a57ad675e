"""Round-2 fixes: cmake imported-target branch (previously unreachable),
CLI --format analyzer override, typed Summary columns in classify output."""

import json

from buildlog_consultant_spark.cli import main as cli_main
from buildlog_consultant_spark.engine.core import find_build_failure_description
from buildlog_consultant_spark.engine.sbuild import SEP
from buildlog_consultant_spark.spark.classify import analyze_text

FIXTURES = "/root/reference/src/testdata"


def test_cmake_imported_target_missing_file_blank_separated():
    # real cmake rendering: header, blank, quoted entry, blank, marker
    # (reference src/common.rs:3471-3499 would panic on this input)
    lines = [l + "\n" for l in [
        "running cmake configure",
        '  The imported target "Qt5::Gui" references the file',
        "",
        '     "/usr/lib64/libEGL.so"',
        "",
        "  but this file does not exist.  Possible reasons include:",
    ]]
    m, p = find_build_failure_description(lines)
    assert p is not None and p.kind == "missing-file"
    assert p.details["path"] == "/usr/lib64/libEGL.so"
    assert m.lineno == 4  # the quoted file-entry line


def test_cmake_imported_target_missing_file_compact():
    lines = [l + "\n" for l in [
        "running cmake configure",
        '  The imported target "Qt5::Gui" references the file',
        '     "/usr/lib64/libEGL.so"',
        "  but this file does not exist.",
    ]]
    m, p = find_build_failure_description(lines)
    assert p is not None and p.kind == "missing-file"
    assert p.details["path"] == "/usr/lib64/libEGL.so"


def test_cmake_imported_target_truncated_log_no_crash():
    # header as the last line: bounds guards must hold
    lines = [
        "running cmake configure\n",
        '  The imported target "Qt5::Gui" references the file\n',
    ]
    m, p = find_build_failure_description(lines)
    assert p is None


def test_analyze_text_container_override():
    text = (
        SEP + "\n"
        + "ModuleNotFoundError: No module named 'requests'\n"
    )
    auto = analyze_text(text)
    assert auto["container"] == "sbuild"
    forced = analyze_text(text, container="plain")
    assert forced["container"] == "plain"
    assert forced["problem_kind"] == "missing-python-module"


def test_cli_format_forces_analyzer(tmp_path, capsys):
    # a log containing the sbuild separator, analyzed as plain on request
    log = tmp_path / "mixed.log"
    log.write_text(
        SEP + "\n" + "ModuleNotFoundError: No module named 'requests'\n"
    )
    rc = cli_main([str(log), "--json", "--format", "plain"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["container"] == "plain"
    assert out["problem_kind"] == "missing-python-module"


def test_summary_columns_from_sbuild_log():
    # typed Summary payload (reference src/sbuild.rs:56-123) surfaced as
    # columns; expectations read straight from sbuild.0.log's Summary block
    text = open(f"{FIXTURES}/sbuild.0.log").read()
    out = analyze_text(text)
    assert out["container"] == "sbuild"
    assert out["build_time"] == 3
    assert out["install_time"] == 4
    assert out["package_time"] == 72
    assert out["build_space"] == 41428
    assert out["space"] == 41428
    assert out["package"] == "rust-always-assert"
    assert out["source_version"] == "0.1.3-1"
    assert out["distribution"] == "unstable"
    assert out["sbuild_status"] == "successful"


def test_summary_columns_absent_on_plain():
    out = analyze_text("ModuleNotFoundError: No module named 'x'\n")
    assert out["build_time"] is None and out["sbuild_status"] is None


def test_analyzer_error_safety_net(monkeypatch):
    """A pathological document must not raise out of the batch UDF: the
    exception surfaces as a typed __analyzer-error__ row."""
    from buildlog_consultant_spark.spark import classify as C

    def boom(text, use_gate=True, container=None):
        raise ValueError("synthetic parser explosion")

    monkeypatch.setattr(C, "_analyze_text_inner", boom)
    out = C.analyze_text("anything")
    assert out["problem_kind"] == "__analyzer-error__"
    assert "synthetic parser explosion" in out["description"]
