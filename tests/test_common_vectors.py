"""Matcher test vectors ported from the reference's inline tests
(/root/reference/src/common.rs:3530-5928). assert_match semantics mirror
src/common.rs:3545-3566: match line content, 1-based lineno, and Problem
equality on (kind, details)."""

import pytest

from buildlog_consultant_spark.core import problems as P
from buildlog_consultant_spark.engine.core import find_build_failure_description


def assert_match(lines, lineno, expected):
    match, actual = find_build_failure_description(lines)
    assert match is not None, f"no match for {lines!r}"
    assert match.line == lines[lineno - 1]
    assert match.lineno == lineno
    if expected is not None:
        assert actual is not None, f"expected {expected!r}, got no problem"
        assert actual.kind == expected.kind, (actual.kind, expected.kind)
        assert actual.details == expected.details, (actual.details, expected.details)
    else:
        assert actual is None, f"expected no problem, got {actual!r}"


def assert_just_match(lines, lineno):
    match, actual = find_build_failure_description(lines)
    assert actual is None
    if match is not None:
        assert match.line == lines[lineno - 1]
        assert match.lineno == lineno


CASES = [
    # test_make_missing_rule (common.rs:3568)
    (
        ["make[1]: *** No rule to make target 'nno.autopgen.bin', needed by 'dan-nno.autopgen.bin'.  Stop."],
        1,
        lambda: P.MissingMakeTarget("nno.autopgen.bin", "dan-nno.autopgen.bin"),
    ),
    (
        ["make[1]: *** No rule to make target '/usr/share/blah/blah', needed by 'dan-nno.autopgen.bin'.  Stop."],
        1,
        lambda: P.MissingMakeTarget("/usr/share/blah/blah", "dan-nno.autopgen.bin"),
    ),
    (
        ["debian/rules:4: /usr/share/openstack-pkg-tools/pkgos.make: No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/share/openstack-pkg-tools/pkgos.make"),
    ),
    # test_git_identity (common.rs:3594)
    (
        ["fatal: unable to auto-detect email address (got 'jenkins@osuosl167-amd64.(none)')"],
        1,
        lambda: P.MissingGitIdentity(),
    ),
    # test_ioerror (common.rs:3605)
    (
        ["E   IOError: [Errno 2] No such file or directory: '/usr/lib/python2.7/poly1305/rfc7539.txt'"],
        1,
        lambda: P.MissingFile("/usr/lib/python2.7/poly1305/rfc7539.txt"),
    ),
    # test_vignette (common.rs:3616)
    (
        [
            "Error: processing vignette 'uroot-intro.Rnw' failed with diagnostics:",
            "pdflatex is not available",
        ],
        2,
        lambda: P.MissingVagueDependency.simple("pdflatex"),
    ),
    # test_upstart_file_present (common.rs:3628)
    (
        ["dh_installinit: upstart jobs are no longer supported!  Please remove debian/sddm.upstart and check if you need to add a conffile removal"],
        1,
        lambda: P.UpstartFilePresent("debian/sddm.upstart"),
    ),
    # test_missing_go_mod_file (common.rs:3639)
    (
        ["go: go.mod file not found in current directory or any parent directory; see 'go help modules'"],
        1,
        lambda: P.MissingGoModFile(),
    ),
    (
        ["ModuleNotFoundError: No module named 'numpy'"],
        1,
        lambda: P.MissingPythonModule("numpy", 3, None),
    ),
    (
        ["E   ModuleNotFoundError: No module named 'click'"],
        1,
        lambda: P.MissingPythonModule("click", 3, None),
    ),
    (
        ["/bin/sh: 1: uvcdynctrl: not found"],
        1,
        lambda: P.MissingCommand("uvcdynctrl"),
    ),
    (
        ["foo.c:1:10: fatal error: bar.h: No such file or directory"],
        1,
        lambda: P.MissingCHeader("bar.h"),
    ),
    (
        ["configure: error: Package requirements (libffi >= 3.0.0) were not met:"],
        1,
        lambda: P.MissingPkgConfig("libffi", "3.0.0"),
    ),
    (
        ["No package 'glib-2.0' found"],
        1,
        lambda: P.MissingPkgConfig("glib-2.0"),
    ),
    (
        ["Could not find gem 'rspec (>= 3.0)', which is required by gem 'top'."],
        1,
        lambda: P.MissingRubyGem("rspec", "3.0"),
    ),
    (
        ["error: failed to select a version for the requirement `serde ^1.0`"],
        1,
        lambda: P.MissingCargoCrate("serde", "^1.0"),
    ),
    (
        ["Caused by: java.lang.ClassNotFoundException: org.apache.Thing"],
        1,
        lambda: P.MissingJavaClass("org.apache.Thing"),
    ),
    (
        ["  namespace 'rlang' 0.4.10 is being loaded, but >= 0.4.11 is required"],
        1,
        lambda: P.MissingRPackage("rlang", "0.4.11"),
    ),
    (
        ["/usr/bin/ld: cannot find -lcrypto"],
        1,
        lambda: P.MissingLibrary("crypto"),
    ),
    (
        ["OSError: [Errno 28] No space left on device"],
        1,
        lambda: P.NoSpaceOnDevice(),
    ),
    (
        ["E: Build killed with signal TERM after 150 minutes of inactivity"],
        1,
        lambda: P.InactiveKilled(150),
    ),
    (
        ["ERROR: JAVA_HOME is not set and no 'java' command could be found in your PATH."],
        1,
        lambda: P.MissingJRE(),
    ),
    # backward scan priority: latest error wins
    (
        [
            "ModuleNotFoundError: No module named 'first'",
            "filler",
            "ModuleNotFoundError: No module named 'second'",
        ],
        3,
        lambda: P.MissingPythonModule("second", 3, None),
    ),
    # Haskell block (common.rs:200-235)
    (
        [
            "Setup: Encountered missing or private dependencies:",
            "    base >=4.7 && <5, bytestring,",
            "",
        ],
        2,
        lambda: P.MissingHaskellDependencies(["base >=4.7 && <5"]),
    ),
    # Perl 3-liner (common.rs:317-354)
    (
        [
            "# The following modules are not available.",
            "# `perl Makefile.PL | cpanm` will install them:",
            "  Moose",
        ],
        3,
        lambda: P.MissingPerlModule(module="Moose"),
    ),
    # cmake paragraph
    (
        [
            "CMake Error at CMakeLists.txt:5 (find_package):",
            "  Could NOT find Boost (missing: system filesystem)",
            "",
        ],
        2,
        lambda: P.MissingCMakeComponents("Boost", ["system", "filesystem"]),
    ),
    # Perl @INC
    (
        ["Can't locate Module/Build.pm in @INC (you may need to install the Module::Build module) (@INC contains: /a /b) at Makefile.PL line 6."],
        1,
        lambda: P.MissingPerlModule("Module/Build.pm", "Module::Build", ["/a", "/b"], None),
    ),
    # pkg-config version constraint via helper (tab split)
    (
        ["Requested 'vapigen >= 0.22' but version of vapigen is 0.20"],
        1,
        lambda: P.MissingPkgConfig("vapigen", "0.22"),
    ),
]


@pytest.mark.parametrize("lines,lineno,expected", CASES, ids=lambda v: str(v)[:48])
def test_vector(lines, lineno, expected):
    if callable(expected):
        expected = expected()
    assert_match(lines, lineno, expected)


def test_secondary_only():
    assert_just_match(["make: *** [all] Error 2"], 1)
    assert_just_match(["make[2]: *** [Makefile:20: all] Error 2"], 1)
    assert_just_match(["E   DeprecationWarning: use something else"], 1)


def test_no_match_at_all():
    match, problem = find_build_failure_description(["all good here"])
    assert match is None and problem is None


def test_window_bound_250():
    inside = ["pad"] * 300 + ["ModuleNotFoundError: No module named 'x'"]
    m, p = find_build_failure_description(inside)
    assert p is not None and m.lineno == 301
    outside = ["ModuleNotFoundError: No module named 'x'"] + ["pad"] * 300
    m, p = find_build_failure_description(outside)
    assert p is None


def test_first_match_wins_order():
    # chown no-problem rule outranks the later generic make error
    # (src/common.rs:753-764)
    m, p = find_build_failure_description(
        [
            "chown: changing ownership of '/x': Operation not permitted",
            "make[2]: *** [Makefile:5: install] Error 1",
        ]
    )
    assert p is None
    assert m.lineno == 1
