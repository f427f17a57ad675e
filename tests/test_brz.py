"""brz analyzer vectors ported from /root/reference/src/brz.rs:253-480."""

from buildlog_consultant_spark.engine.brz import find_brz_build_error, parse_brz_error


def test_inconsistent_source_format():
    err, line = parse_brz_error(
        "Inconsistency between source format and version: version is not native, format is native.",
        [],
    )
    assert line == "Inconsistent source format between version and source format"
    assert err.kind == "inconsistent-source-format"
    assert err.details == {"version": True, "source_format": False}


def test_missing_debcargo_crate():
    lines = [
        "Using crate name: version-check, version 0.9.2   Updating crates.io index\n",
        "\x1b[1;31mSomething failed: Couldn't find any crate matching version-check = 0.9.2\n",
        "Try `debcargo update` to update the crates.io index.\x1b[0m\n",
        "brz: ERROR: Debcargo failed to run.\n",
    ]
    err, line = find_brz_build_error(lines)
    assert line == "debcargo can't find crate version-check (version: 0.9.2)"
    assert err.kind == "debcargo-missing-crate"
    assert err.details == {"crate": "version-check", "version": "0.9.2"}


def test_missing_debcargo_crate2():
    lines = [
        "Running 'sbuild -A -s -v'\n",
        "Building using working tree\n",
        "Building package in merge mode\n",
        "Using crate name: utf8parse, version 0.10.1+git20220116.1.dfac57e\n",
        "    Updating crates.io index\n",
        "    Updating crates.io index\n",
        "\x1b[1;31mdebcargo failed: Couldn't find any crate matching utf8parse =0.10.1\n",
        "Try `debcargo update` to update the crates.io index.\x1b[0m\n",
        "brz: ERROR: Debcargo failed to run.\n",
    ]
    err, line = find_brz_build_error(lines)
    assert line == "debcargo can't find crate utf8parse (version: 0.10.1)"
    assert err.details == {"crate": "utf8parse", "version": "0.10.1"}


def test_uscan_no_matching_files_for_version():
    lines = [
        "Using uscan to look for the upstream tarball.\n",
        "uscan warn: In debian/watch no matching files for version 1.2.0 in watch line\n",
        "brz: ERROR: UScan failed to run: In debian/watch no matching files for version 1.2.0 in watch line.\n",
    ]
    err, _ = find_brz_build_error(lines)
    assert err.kind == "uscan-request-version-missing"
    assert err.details == {"version": "1.2.0"}


def test_uscan_failed_multiline_reflow():
    lines = [
        "Using uscan to look for the upstream tarball.\n",
        "uscan warn: In watchfile debian/watch, reading webpage\n",
        "  https://example.com/dist/ failed: 404 Not Found\n",
        "brz: ERROR: UScan failed to run: In watchfile debian/watch, reading webpage\n",
        "  https://example.com/dist/ failed: 404 Not Found.\n",
    ]
    err, _ = find_brz_build_error(lines)
    assert err.kind == "uscan-failed"
    assert err.details == {
        "url": "https://example.com/dist/",
        "reason": "404 Not Found.",
    }


def test_nested_tree_unresolvable():
    lines = ["brz: ERROR: The nested tree for lib can not be resolved.\n"]
    err, line = find_brz_build_error(lines)
    assert err.kind == "nested-tree-unresolvable"
    assert err.details == {"name": "lib"}
    assert line == "Nested tree for lib cannot be resolved"


def test_uscan_remote_version_mismatch():
    lines = [
        "Using uscan to look for the upstream tarball.\n",
        "brz: ERROR: UScan failed to run: Newest version of td1.8.11 on remote site is 1.8.0+git20260425.8fc2344, specified download version is 1.8.11~git20230202.3179d35.\n",
    ]
    err, line = find_brz_build_error(lines)
    assert err.kind == "uscan-remote-version-mismatch"
    assert err.details == {
        "package": "td1.8.11",
        "remote_version": "1.8.0+git20260425.8fc2344",
        "wanted_version": "1.8.11~git20230202.3179d35",
    }
    assert line == (
        "uscan: td1.8.11 latest is 1.8.0+git20260425.8fc2344, wanted 1.8.11~git20230202.3179d35"
    )


def test_uscan_watchfile_malformed():
    lines = [
        "brz: ERROR: UScan failed to run: The following paragraph isn't well formatted, skipping it: << ==EOF==\n",
    ]
    err, line = find_brz_build_error(lines)
    assert err.kind == "uscan-watchfile-malformed"
    assert err.details == {"paragraph": "<< ==EOF=="}
    assert line == "uscan rejected malformed debian/watch paragraph"


def test_submodule_encountered():
    lines = [
        "brz: ERROR: dulwich.objects.SubmoduleEncountered: (b'subprojects/libcmatrix', b'6c260ee37bd2eff096ee44c29690f30718566c1c')\n",
    ]
    err, _ = find_brz_build_error(lines)
    assert err.kind == "submodule-encountered"
    assert err.details == {
        "path": "subprojects/libcmatrix",
        "sha": "6c260ee37bd2eff096ee44c29690f30718566c1c",
    }


def test_internal_assertion_error_empty():
    lines = ["brz: ERROR: AssertionError: \n"]
    err, line = find_brz_build_error(lines)
    assert err.kind == "brz-internal-error"
    assert err.details == {"exception_type": "AssertionError", "exception_message": ""}
    assert line == "brz internal error: AssertionError"


def test_internal_attribute_error_with_message():
    lines = [
        "brz: ERROR: AttributeError: 'RemoteGitRepository' object has no attribute '_git'\n",
    ]
    err, line = find_brz_build_error(lines)
    assert err.details == {
        "exception_type": "AttributeError",
        "exception_message": "'RemoteGitRepository' object has no attribute '_git'",
    }
    assert line == (
        "brz internal error: AttributeError: 'RemoteGitRepository' object has no attribute '_git'"
    )
