"""apt + sbuild analyzer vectors, ported from /root/reference/src/apt.rs:372-
and src/sbuild.rs tests, plus the golden fixture logs in
/root/reference/src/testdata/."""

from buildlog_consultant_spark.core import problems as P
from buildlog_consultant_spark.engine.apt import (
    error_from_dose3_reports,
    find_apt_get_failure,
    find_cudf_output,
)
from buildlog_consultant_spark.engine.sbuild import (
    parse_sbuild_log,
    strip_build_tail,
    worker_failure_from_sbuild_log,
)

FIXTURES = "/root/reference/src/testdata"


def assert_apt_match(lines, lineno, expected):
    match, actual = find_apt_get_failure(lines)
    assert match is not None
    assert match.line == lines[lineno - 1]
    assert match.lineno == lineno
    if expected is None:
        assert actual is None
    else:
        assert actual is not None
        assert (actual.kind, actual.details) == (expected.kind, expected.details)


def test_apt_fetch_failure():
    assert_apt_match(
        ["E: Failed to fetch http://janitor.debian.net/blah/Packages.xz  File has unexpected size (3385796 != 3385720). Mirror sync in progress? [IP]"],
        1,
        P.AptFetchFailure(
            "http://janitor.debian.net/blah/Packages.xz",
            "File has unexpected size (3385796 != 3385720). Mirror sync in progress? [IP]",
        ),
    )


def test_missing_release_file():
    assert_apt_match(
        ["E: The repository 'https://janitor.debian.net/ blah/ Release' does not have a Release file."],
        1,
        P.AptMissingReleaseFile("https://janitor.debian.net/ blah/ Release"),
    )


def test_vague():
    assert_apt_match(["E: Stuff is broken"], 1, None)


def test_fetch_no_space():
    assert_apt_match(
        ["E: Failed to fetch http://apt.example.com/pool/main/h/hello/hello_2.10.orig.tar.gz  No space left on device"],
        1,
        P.NoSpaceOnDevice(),
    )


def test_dpkg_deb_no_space():
    assert_apt_match(
        ["dpkg-deb: error: unable to write file '/var/cache/apt/archives/hello_2.10-2_amd64.deb': No space left on device"],
        1,
        P.NoSpaceOnDevice(),
    )


def test_free_space():
    assert_apt_match(["E: You don't have enough free space in /var."], 1, P.NoSpaceOnDevice())


def test_write_error_no_space():
    assert_apt_match(
        ["E: Write error - write (28: No space left on device)"], 1, P.NoSpaceOnDevice()
    )


def test_dpkg_error_no_space():
    assert_apt_match(
        ["dpkg: error: writing to '/var/lib/dpkg/status': No space left on device"],
        1,
        P.NoSpaceOnDevice(),
    )


def test_dpkg_error_general():
    assert_apt_match(
        ["dpkg: error: some other error occurred"],
        1,
        P.DpkgError("some other error occurred"),
    )


def test_dpkg_error_processing_package():
    match, problem = find_apt_get_failure(
        [
            "dpkg: error processing package hello (--configure):",
            "subprocess installed post-installation script returned error exit status 1",
        ]
    )
    assert match is not None and problem is not None
    assert problem.kind == "dpkg-error"
    assert problem.details == {"msg": "processing package hello (--configure)"}


def test_broken_packages():
    match, problem = find_apt_get_failure(
        ["The following packages have unmet dependencies:", "E: Broken packages"]
    )
    assert problem is not None
    assert problem.details == {
        "description": "The following packages have unmet dependencies:",
        "broken": None,
    }


def test_unable_to_locate():
    match, problem = find_apt_get_failure(["E: Unable to locate package nonexistent-package"])
    assert problem.details == {"package": "nonexistent-package"}


def test_copy_extracted_no_space():
    match, problem = find_apt_get_failure(
        [
            "some text before",
            " cannot copy extracted data for '/var/cache/apt/archives/hello_2.10-2_amd64.deb' to '/tmp/hello': failed to write (No space left on device)",
            "some text after",
        ]
    )
    assert problem.kind == "no-space-on-device"


def test_generic_no_space():
    match, problem = find_apt_get_failure(
        [
            "some text before",
            " /var/cache/apt/archives/hello_2.10-2_amd64.deb: No space left on device",
            "some text after",
        ]
    )
    assert problem.kind == "no-space-on-device"


def test_error_from_dose3_reports_cases():
    # missing-dependency case (src/apt.rs:614-640)
    missing = [{
        "package": "sbuild-build-depends-main-dummy",
        "version": "0.invalid.0",
        "architecture": "amd64",
        "status": "broken",
        "reasons": [{"missing": {"pkg": {"unsat-dependency": "libfoo (>= 1.0)"}}}],
    }]
    p = error_from_dose3_reports(missing)
    assert p.kind == "unsatisfied-apt-dependencies"
    assert p.details == {"relations": "libfoo (>= 1.0)"}
    # conflict case
    conflict = [{
        "package": "sbuild-build-depends-main-dummy",
        "version": "0.invalid.0",
        "architecture": "amd64",
        "status": "broken",
        "reasons": [{"conflict": {"pkg1": {"unsat-conflict": "libbar (>= 2.0)"}}}],
    }]
    p = error_from_dose3_reports(conflict)
    assert p.kind == "unsatisfied-apt-conflicts"
    assert p.details == {"relations": "libbar (>= 2.0)"}
    # empty reasons → no problem
    ok = [{
        "package": "sbuild-build-depends-main-dummy",
        "status": "broken",
        "reasons": [],
    }]
    assert error_from_dose3_reports(ok) is None


def test_cudf_full_struct():
    # src/apt.rs:577-611 full parsed structure
    log = open(f"{FIXTURES}/sbuild-cudf.log").read()
    sl = parse_sbuild_log(log)
    offsets, doc = find_cudf_output(sl.sections[0].lines)
    assert offsets == list(range(104, 120))
    assert doc["native-architecture"] == "amd64"
    rep = doc["report"][0]
    assert rep["architecture"] == "amd64"
    assert str(rep["version"]) == "0.invalid.0"
    assert rep["status"] == "broken"
    reason = rep["reasons"][0]
    assert reason["missing"]["pkg"]["unsat-dependency"] == (
        "librust-breezyshim+dirty-tracker-dev:amd64 (>= 0.1.138-~~)"
    )
    assert reason.get("conflict") is None


# ---- golden fixture logs ----------------------------------------------------


def test_parse_sbuild_log():
    # src/sbuild.rs:1618-1633
    log = open(f"{FIXTURES}/sbuild.0.log").read()
    sl = parse_sbuild_log(log)
    assert sl.section_titles() == [
        "Update chroot",
        "Fetch source files",
        "Check architectures",
        "Build environment",
        "Cleanup",
        "Summary",
    ]
    assert sl.get_failed_stage() is None
    s = sl.summary()
    assert s["package"] == "rust-always-assert"
    assert s["build_time"] == 3
    assert s["space"] == 41428
    assert s["status"] == "successful"


def test_find_cudf_output():
    # src/apt.rs:577-611: exact offsets 104..=119 and the parsed CUDF struct
    log = open(f"{FIXTURES}/sbuild-cudf.log").read()
    sl = parse_sbuild_log(log)
    offsets, doc = find_cudf_output(sl.sections[0].lines)
    assert offsets[0] == 104 and offsets[-1] == 119
    assert doc["output-version"] == (1, 2)
    assert [r["package"] for r in doc["report"]] == ["sbuild-build-depends-main-dummy"]
    err = error_from_dose3_reports(doc["report"])
    assert err.kind == "unsatisfied-apt-dependencies"
    assert "librust-breezyshim+dirty-tracker-dev" in err.details["relations"]


def test_strip_build_tail_meson():
    log = open(f"{FIXTURES}/sbuild.meson.log").read()
    lines = log.splitlines(keepends=True)
    body, files = strip_build_tail(lines)
    assert "meson-logs/meson-log.txt" in files
    assert all(not l.startswith("Build finished at ") for l in body)


def test_worker_failure_stage_dispatch():
    sep = "+" + "-" * 78 + "+"
    log = "\n".join(
        ["pre"]
        + [sep, "| Build                                                                        |", sep]
        + ["x", "ModuleNotFoundError: No module named 'zed'"]
        + [sep, "| Summary                                                                      |", sep]
        + ["Fail-Stage: build"]
    ) + "\n"
    failure = worker_failure_from_sbuild_log(parse_sbuild_log(log))
    assert failure.stage == "build"
    assert failure.phase == ("build",)
    assert failure.error.kind == "missing-python-module"
    assert failure.error.details["module"] == "zed"
