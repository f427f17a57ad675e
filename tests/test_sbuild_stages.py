"""Per-stage dispatch coverage: every Fail-Stage arm of
worker_failure_from_sbuild_log (src/sbuild.rs:1487-1507) exercised with a
miniature sbuild container."""

from buildlog_consultant_spark.engine.sbuild import (
    parse_sbuild_log,
    worker_failure_from_sbuild_log,
)

SEP = "+" + "-" * 78 + "+"


def _container(sections: list[tuple[str, list[str]]], fail_stage: str) -> str:
    lines = ["preamble"]
    for title, body in sections:
        header = f"| {title}" + " " * max(1, 77 - len(title) - 2) + "|"
        lines += [SEP, header, SEP] + body
    lines += [SEP, "| Summary" + " " * 69 + "|", SEP, f"Fail-Stage: {fail_stage}"]
    return "\n".join(lines) + "\n"


def _fail(sections, stage):
    return worker_failure_from_sbuild_log(parse_sbuild_log(_container(sections, stage)))


def test_stage_install_deps_apt():
    f = _fail(
        [(
            "Install package build dependencies",
            ["reading...", "E: Unable to locate package libfoo-dev"],
        )],
        "install-deps",
    )
    assert f.stage == "install-deps"
    assert f.error.kind == "apt-package-unknown"
    assert f.error.details == {"package": "libfoo-dev"}
    assert f.phase == ("build",)


def test_stage_apt_get_update():
    f = _fail(
        [(
            "Update chroot",
            ["Get:1 http://deb x", "E: The repository 'http://x unstable Release' does not have a Release file."],
        )],
        "apt-get-update",
    )
    assert f.stage == "apt-get-update"
    assert f.error.kind == "missing-release-file"
    assert f.phase == ("apt-get-update",)


def test_stage_arch_check():
    f = _fail(
        [(
            "Check architectures",
            ["E: dsc: amd64 not in arch list or does not match any arch wildcards: armhf arm64 -- skipping"],
        )],
        "arch-check",
    )
    assert f.stage == "arch-check"
    assert f.error.kind == "arch-not-in-list"
    assert f.error.details == {"arch": "amd64", "arch_list": ["armhf", "arm64"]}


def test_stage_check_space():
    f = _fail(
        [(
            "Cleanup",
            [
                "E: Disk space is probably not sufficient for building.",
                "I: Source needs 2048 KiB, while 1024 KiB is free.",
            ],
        )],
        "check-space",
    )
    assert f.stage == "check-space"
    assert f.error.kind == "insufficient-disk-space"
    assert f.error.details == {"needed": 2048, "free": 1024}


def test_stage_create_session():
    f = _fail([], "create-session")
    assert f.stage == "create-session"
    assert f.phase == ("create-session",)


def test_stage_unpack():
    f = _fail(
        [(
            "Build",
            ["dpkg-source: error: unrepresentable changes to source"],
        )],
        "unpack",
    )
    assert f.stage == "unpack"
    assert f.error.kind == "unrepresentable-local-changes"
    assert f.phase == ("unpack",)


def test_stage_autopkgtest():
    f = _fail(
        [(
            "autopkgtest",
            [
                "autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary",
                "unit-tests           FAIL timed out",
            ],
        )],
        "autopkgtest",
    )
    assert f.stage == "autopkgtest"
    assert f.error.kind == "timed-out"
    assert f.phase == ("autopkgtest", "unit-tests")


def test_stage_fetch_src():
    f = _fail(
        [(
            "Fetch source files",
            ["E: Failed to fetch http://x/foo.dsc  404 Not Found"],
        )],
        "fetch-src",
    )
    assert f.stage == "fetch-src"
    assert f.error.kind == "apt-file-fetch-failure"


def test_unknown_stage_falls_back():
    f = _fail([], "mystery-stage")
    assert f.stage == "mystery-stage"
    assert f.description == "build failed stage mystery-stage"
    assert f.error is None


def test_no_fail_stage_preamble_only():
    text = "dpkg-source: error: unrepresentable changes to source\n"
    f = worker_failure_from_sbuild_log(parse_sbuild_log(text))
    assert f.stage == "unpack"
    assert f.error.kind == "unrepresentable-local-changes"


def test_no_fail_stage_brz_fallback():
    text = "brz: ERROR: The nested tree for lib can not be resolved.\n"
    f = worker_failure_from_sbuild_log(parse_sbuild_log(text))
    assert f.error.kind == "nested-tree-unresolvable"
    assert f.phase == ("build-env",)


# --- round-2 ports of reference regression vectors (src/sbuild.rs mod tests) ---


def test_apt_get_update_connection_failed_sets_phase():
    """test_find_failure_apt_get_update_sets_phase: even an unrecognized apt
    fetch error must carry phase=('apt-get-update',)."""
    f = _fail(
        [(
            "update chroot",
            ["E: Failed to fetch http://deb.debian.org/debian/dists/sid/InRelease  Connection failed"],
        )],
        "apt-get-update",
    )
    assert f.stage == "apt-get-update"
    assert f.phase == ("apt-get-update",)


def test_autopkgtest_failure_before_any_test_sets_sentinel_phase():
    """test_find_failure_autopkgtest_sets_phase_without_testname: a testbed
    failure before any test runs must still get a non-empty AutoPkgTest phase,
    keep the recognised problem, and surface the reason in the description."""
    f = _fail(
        [(
            "post build",
            [
                "autopkgtest [01:50:23]: starting date and time: 2026-05-06 01:50:23+0000",
                "autopkgtest [01:50:23]: ERROR: testbed failure: eof from the virtualisation server",
            ],
        )],
        "post-build",
    )
    assert f.phase is not None and f.phase[0] == "autopkgtest"
    assert len(f.phase) > 1 and f.phase[1], f.phase
    assert f.error is not None
    assert "eof from the virtualisation server" in (f.description or "")


def test_autopkgtest_failure_keeps_testname_when_present():
    """test_find_failure_autopkgtest_keeps_testname_when_present."""
    f = _fail(
        [(
            "autopkgtest",
            [
                "autopkgtest [10:00:00]: test command1: preparing testbed",
                "autopkgtest [10:00:01]: test command1: [-----------------------",
                "autopkgtest [10:00:02]: ERROR: testbed failure: eof from the virtualisation server",
            ],
        )],
        "autopkgtest",
    )
    assert f.phase == ("autopkgtest", "command1"), f.phase


def test_unpack_local_changes_sets_phase():
    """test_find_failure_unpack_sets_phase."""
    f = _fail(
        [(
            "build",
            [
                "dpkg-source: info: local changes detected, the modified files are:",
                " setup.cfg",
                "dpkg-source: error: aborting due to unexpected upstream changes, see /tmp/foo.diff",
                "E: Failed to package source directory /build/area/foo-1.0",
            ],
        )],
        "unpack",
    )
    assert f.stage == "unpack"
    assert f.phase == ("unpack",)
    assert f.error is not None


def test_unpack_without_preamble_match_still_sets_phase():
    """test_find_failure_unpack_sets_phase_without_preamble_match."""
    f = _fail([("build", ["something inscrutable went wrong"])], "unpack")
    assert f.phase == ("unpack",)
    assert f.error is None
