"""sbuild internals ported from /root/reference/src/sbuild.rs:1662-1935."""

from buildlog_consultant_spark.engine.sbuild import (
    SbuildLog,
    SbuildLogSection,
    find_failed_stage,
    parse_summary,
    strip_build_tail,
    strip_section_header_timestamp,
)

FIXTURES = "/root/reference/src/testdata"


def test_strip_build_tail_simple():
    body, files = strip_build_tail(
        [
            "Build finished at 2023-09-16T16:47:58Z",
            "-" * 80,
            "Finished at 2023-09-16T16:47:58Z",
            "Build needed 00:01:12, 41428k disk space",
        ]
    )
    assert body == [] and files == {}


def test_strip_build_tail_meson_exact():
    lines = open(f"{FIXTURES}/sbuild.meson.log").read().splitlines()
    body, files = strip_build_tail(lines)
    assert body == [
        " --sysconfdir=/etc --localstatedir=/var --libdir=lib/x86_64-linux-gnu",
        "The Meson build system",
        "Version: 0.56.2",
        "Source dir: /<<PKGBUILDDIR>>",
        "Build dir: /<<PKGBUILDDIR>>/obj-x86_64-linux-gnu",
        "Build type: native build",
        "",
        "../meson.build:1:0: ERROR: Meson version is 0.56.2 but project requires >= 0.57.0",
        "",
        "A full log can be found at /<<PKGBUILDDIR>>/obj-x86_64-linux-gnu/meson-logs/meson-log.txt",
        "cd obj-x86_64-linux-gnu && tail -v -n \\+0 meson-logs/meson-log.txt",
    ]
    assert list(files) == ["meson-logs/meson-log.txt"]
    assert files["meson-logs/meson-log.txt"][0] == "Build started at 2022-07-21T04:21:47.088879"
    assert files["meson-logs/meson-log.txt"][-1] == (
        "dpkg-buildpackage: error: debian/rules binary subprocess returned exit status 2"
    )


def test_find_failed_stage():
    assert find_failed_stage(["Foo: bar", "Fail-Stage: unpack", "Bar: baz"]) == "unpack"
    assert find_failed_stage(["Foo: bar", "Bar: baz"]) is None


def test_parse_summary():
    s = parse_summary(
        [
            "Package: rust-always-assert",
            "Version: 0.1.3-1",
            "Distribution: unstable",
            "Status: successful",
            "Build-Time: 3",
            "Space: n/a",
        ]
    )
    assert s["package"] == "rust-always-assert"
    assert s["version"] == "0.1.3-1"
    assert s["build_time"] == 3
    assert s["space"] is None  # Space::NotAvailable


def test_strip_section_header_timestamp():
    assert (
        strip_section_header_timestamp(
            "Build                                      Wed, 29 Apr 2026 15:17:54 +0000"
        )
        == "Build"
    )
    assert (
        strip_section_header_timestamp(
            "Update chroot                                Wed,  3 Jan 2024 09:01:02 -0800"
        )
        == "Update chroot"
    )
    assert strip_section_header_timestamp("Build") == "Build"
    assert (
        strip_section_header_timestamp("Note Wed, 29 Apr 2026 15:17:54 +0000 was today")
        == "Note Wed, 29 Apr 2026 15:17:54 +0000 was today"
    )


def test_get_section_case_insensitive():
    log = SbuildLog(
        [
            SbuildLogSection("Build", (1, 5), ["dpkg-buildpackage: error: …"]),
            SbuildLogSection("Fetch source files", (6, 10), ["fetched"]),
        ]
    )
    assert log.get_section("build").title == "Build"
    assert log.get_section("BUILD").title == "Build"
    assert log.get_section("fetch source files").title == "Fetch source files"
    assert log.get_section("Build").title == "Build"
    assert log.get_section("install-deps") is None


def test_get_section_none_matches_unnamed():
    log = SbuildLog(
        [
            SbuildLogSection(None, (1, 2), ["preamble"]),
            SbuildLogSection("Build", (3, 4), ["building"]),
        ]
    )
    assert log.get_section(None).title is None
    only_unnamed = SbuildLog([SbuildLogSection(None, (1, 1), ["x"])])
    assert only_unnamed.get_section("anything") is None


def test_get_section_returns_first_match():
    log = SbuildLog(
        [
            SbuildLogSection("Build", (1, 5), ["first"]),
            SbuildLogSection("build", (6, 9), ["second"]),
        ]
    )
    assert log.get_section("BUILD").lines == ["first"]
