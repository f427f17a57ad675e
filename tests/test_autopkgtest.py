"""autopkgtest vectors ported from /root/reference/src/autopkgtest.rs:858-."""

from buildlog_consultant_spark.engine.autopkgtest import (
    find_autopkgtest_failure_description as fafd,
)


def test_empty():
    assert fafd([]) == (None, None, None, None)


def test_no_match():
    m, testname, err, desc = fafd(["blalblala\n"])
    assert m.offsets == [0]
    assert testname == "blalblala\n"
    assert err is None and desc is None


def test_unknown_error():
    m, testname, err, desc = fafd(
        [
            "autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary\n",
            "python-bcolz           FAIL some error\n",
        ]
    )
    assert m.offsets == [1]
    assert testname == "python-bcolz"
    assert err is None
    assert desc == "Test python-bcolz failed: some error"


def test_timed_out():
    m, testname, err, desc = fafd(
        [
            "autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary\n",
            "unit-tests           FAIL timed out\n",
        ]
    )
    assert m.offsets == [1]
    assert testname == "unit-tests"
    assert err.kind == "timed-out"
    assert desc == "timed out"


def test_deps_badpkg():
    lines = [
        "autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary\n",
        "intltool             FAIL badpkg",
        "blame: arg:/home/janitor/tmp/tmpgbn5jhou/build-area/cmake-extras_1.3+17.04.20170310-6~jan+unchanged1_all.deb deb:cmake-extras /home/janitor/tmp/tmpgbn5jhou/build-area/cmake-extras_1.3+17.04.20170310-6~jan.dsc",
        "badpkg: Test dependencies are unsatisfiable. A common reason is that your testbed is out of date with respect to the archive, and you need to use a current testbed or run apt-get update or use -U.",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [2]
    assert testname == "intltool"
    assert err.kind == "badpkg"
    assert err.details["args"] == [
        ["arg", "/home/janitor/tmp/tmpgbn5jhou/build-area/cmake-extras_1.3+17.04.20170310-6~jan+unchanged1_all.deb"],
        ["deb", "cmake-extras"],
        [None, "/home/janitor/tmp/tmpgbn5jhou/build-area/cmake-extras_1.3+17.04.20170310-6~jan.dsc"],
    ]
    assert desc.startswith("Test intltool failed: Test dependencies are unsatisfiable.")


def test_session_disappeared():
    lines = [
        "autopkgtest [22:52:18]: starting date: 2021-04-01\n",
        "autopkgtest [22:52:18]: version 5.16\n",
        "autopkgtest [22:52:18]: host osuosl167-amd64; command line: /usr/bin/autopkgtest '/tmp/x.changes' --no-auto-control -- schroot unstable-amd64-sbuild\n",
        "<VirtSubproc>: failure: ['chmod', '1777', '/tmp/autopkgtest.JLqPpH'] unexpectedly produced stderr output `W: /var/lib/schroot/session/unstable-amd64-sbuild-dbcdb3f2-53ed-4f84-8f0d-2c53ebe71010: Failed to stat file: No such file or directory\n",
        "'\n",
        "autopkgtest [22:52:19]: ERROR: testbed failure: cannot send to testbed: [Errno 32] Broken pipe\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert err is not None
    assert err.kind == "testbed-chroot-disappeared"


def test_stderr_unauthorized_output():
    lines = [
        "intltool            FAIL stderr: some output",
        "autopkgtest [20:49:00]: test intltool:  - - - - - - - - - - stderr - - - - - - - - - -",
        "some output",
        "some more output",
        "autopkgtest [20:49:00]: @@@@@@@@@@@@@@@@@@@@ summary",
        "intltool            FAIL stderr: some output",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [2]
    assert testname == "intltool"
    assert err.kind == "stderr-output"
    assert err.details == {"stderr_line": "some output"}
    assert desc == "Test intltool failed due to unauthorized stderr output: some output"


def test_stderr_with_command_missing():
    lines = [
        "autopkgtest [20:49:00]: test intltool:  - - - - - - - - - - stderr - - - - - - - - - -",
        "/tmp/bla: 12: ss: not found",
        "some more output",
        "autopkgtest [20:49:00]: @@@@@@@@@@@@@@@@@@@@ summary",
        "intltool            FAIL stderr: /tmp/bla: 12: ss: not found",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [1]
    assert testname == "intltool"
    assert err.kind == "command-missing"
    assert err.details == {"command": "ss"}
    assert desc == "/tmp/bla: 12: ss: not found"


def test_stderr_reason_only():
    lines = [
        "autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary\n",
        'command10            FAIL stderr: Can\'t exec "uptime": No such file or directory at /usr/lib/nagios/plugins/check_uptime line 529.',
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [1]
    assert testname == "command10"
    assert err.kind == "command-missing"
    assert err.details == {"command": "uptime"}


def test_testbed_failure_copyup():
    lines = [
        "autopkgtest [12:46:18]: ERROR: testbed failure: sent `copyup /tmp/autopkgtest.9IStGJ/build.0Pm/src/ /tmp/autopkgtest.output.icg0g8e6/tests-tree/', got `timeout', expected `ok...'\n"
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [0]
    assert testname is None
    assert err.kind == "testbed-failure"
    assert desc is None


def test_testbed_failure_with_test():
    lines = [
        "Removing autopkgtest-satdep (0) ...\n",
        "autopkgtest [06:59:00]: test phpunit: [-----------------------\n",
        "PHP Fatal error:  Declaration of Wicked_TestCase::setUp() must be compatible with PHPUnit\\Framework\\TestCase::setUp(): void in /tmp/autopkgtest.5ShOBp/build.ViG/src/wicked-2.0.8/test/Wicked/TestCase.php on line 31\n",
        "autopkgtest [06:59:01]: ERROR: testbed failure: testbed auxverb failed with exit code 255\n",
        "Exiting with 16\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [3]
    assert testname == "phpunit"
    assert err.kind == "testbed-failure"


def test_test_command_failure():
    lines = [
        "Removing autopkgtest-satdep (0) ...\n",
        "autopkgtest [01:30:11]: test command2: phpunit --bootstrap /usr/autoload.php\n",
        "autopkgtest [01:30:11]: test command2: [-----------------------\n",
        "PHPUnit 8.5.2 by Sebastian Bergmann and contributors.\n",
        "\n",
        'Cannot open file "/usr/share/php/Pimple/autoload.php".\n',
        "\n",
        "autopkgtest [01:30:12]: test command2: -----------------------]\n",
        "autopkgtest [01:30:12]: test command2:  - - - - - - - - - - results - - - - - - - - - -\n",
        "command2             FAIL non-zero exit status 1\n",
        "autopkgtest [01:30:12]: @@@@@@@@@@@@@@@@@@@@ summary\n",
        "command1             PASS\n",
        "command2             FAIL non-zero exit status 1\n",
        "Exiting with 4\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [5]
    assert testname == "command2"
    assert err.kind == "missing-file"
    assert err.details == {"path": "/usr/share/php/Pimple/autoload.php"}
    assert desc == 'Cannot open file "/usr/share/php/Pimple/autoload.php".\n'


def test_dpkg_failure_chroot_disappeared():
    lines = [
        "autopkgtest [19:19:19]: test require: [-----------------------\n",
        "autopkgtest [19:19:20]: test require: -----------------------]\n",
        "autopkgtest [19:19:20]: test require:  - - - - - - - - - - results - - - - - - - - - -\n",
        "require              PASS\n",
        "autopkgtest [19:19:23]: test runtestsuite: preparing testbed\n",
        "Get:1 file:/tmp/autopkgtest.hdIETy/binaries  InRelease\n",
        "Ign:1 file:/tmp/autopkgtest.hdIETy/binaries  InRelease\n",
        'autopkgtest [19:19:23]: ERROR: "dpkg --unpack /tmp/autopkgtest.hdIETy/4-autopkgtest-satdep.deb" failed with stderr "W: /var/lib/schroot/session/unstable-amd64-sbuild-7fb1b836-14f9-4709-8584-cbbae284db97: Failed to stat file: No such file or directory\n',
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [7]
    assert testname == "runtestsuite"
    assert err.kind == "testbed-chroot-disappeared"
    assert desc == (
        "W: /var/lib/schroot/session/unstable-amd64-sbuild-7fb1b836-14f9-4709-8584-cbbae284db97: Failed to stat file: No such file or directory"
    )


def test_last_stderr_line():
    lines = [
        "autopkgtest [17:38:49]: test unmunge: [-----------------------\n",
        'munge: Error: Failed to access "/run/munge/munge.socket.2": No such file or directory\n',
        "unmunge: Error: No credential specified\n",
        "autopkgtest [17:38:50]: test unmunge: -----------------------]\n",
        "autopkgtest [17:38:50]: test unmunge:  - - - - - - - - - - results - - - - - - - - - -\n",
        "unmunge              FAIL non-zero exit status 2\n",
        "autopkgtest [17:38:50]: test unmunge:  - - - - - - - - - - stderr - - - - - - - - - -\n",
        'munge: Error: Failed to access "/run/munge/munge.socket.2": No such file or directory\n',
        "unmunge: Error: No credential specified\n",
        "autopkgtest [17:38:50]: @@@@@@@@@@@@@@@@@@@@ summary\n",
        "unmunge              FAIL non-zero exit status 2\n",
        "Exiting with 4\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [10]
    assert testname == "unmunge"
    assert err is None
    assert desc == "Test unmunge failed: non-zero exit status 2"


def test_python_error_in_output():
    lines = [
        "autopkgtest [14:55:35]: test unit-tests-3: [-----------------------",
        ' File "twisted/test/test_log.py", line 511, in test_getTimezoneOffsetWithout',
        '   self._getTimezoneOffsetTest("Africa/Johannesburg", -7200, -7200)',
        ' File "twisted/test/test_log.py", line 460, in _getTimezoneOffsetTest',
        "   daylight = time.mktime(localDaylightTuple)",
        "builtins.OverflowError: mktime argument out of range",
        "-" * 79,
        "Ran 12377 tests in 143.490s",
        "",
        "143.4904797077179 12377 12377 1 0 2352",
        "autopkgtest [14:58:01]: test unit-tests-3: -----------------------]",
        "autopkgtest [14:58:01]: test unit-tests-3:  - - - - - - - - - - results - - - - - - - - - -",
        "unit-tests-3         FAIL non-zero exit status 1",
        "autopkgtest [14:58:01]: @@@@@@@@@@@@@@@@@@@@ summary",
        "unit-tests-3         FAIL non-zero exit status 1",
        "Exiting with 4",
    ]
    m, testname, err, desc = fafd(lines)
    assert m.offsets == [5]
    assert testname == "unit-tests-3"
    assert err is None
    assert desc == "builtins.OverflowError: mktime argument out of range"


def test_parse_summary_variants():
    from buildlog_consultant_spark.engine.autopkgtest import parse_autopkgtest_summary

    assert parse_autopkgtest_summary([]) == []
    s = parse_autopkgtest_summary(["python-bcolz PASS"])
    assert (s[0].offset, s[0].name, s[0].result, s[0].reason) == (0, "python-bcolz", "PASS", None)
    s = parse_autopkgtest_summary(["python-bcolz FAIL some error"])
    assert (s[0].result, s[0].reason) == ("FAIL", "some error")
    s = parse_autopkgtest_summary(["python-bcolz SKIP some reason"])
    assert (s[0].result, s[0].reason) == ("SKIP", "some reason")
    s = parse_autopkgtest_summary(["python-bcolz FLAKY some reason"])
    assert (s[0].result, s[0].reason) == ("FLAKY", "some reason")


def test_parse_line_packets():
    from buildlog_consultant_spark.engine.autopkgtest import parse_autopkgtest_line as pal

    assert pal("autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ source ") == ("07:58:03", "source", None)
    assert pal("autopkgtest [07:58:03]: @@@@@@@@@@@@@@@@@@@@ summary") == ("07:58:03", "summary", None)
    assert pal("autopkgtest [07:58:03]: test unit-tests: [-----------------------") == (
        "07:58:03", "test-begin-output", "unit-tests",
    )
    assert pal("autopkgtest [07:58:03]: test unit-tests: -----------------------]") == (
        "07:58:03", "test-end-output", "unit-tests",
    )
    assert pal(
        "autopkgtest [07:58:03]: test unit-tests:  - - - - - - - - - - results - - - - - - - - - -"
    ) == ("07:58:03", "results", "unit-tests")
    assert pal(
        "autopkgtest [07:58:03]: test unit-tests:  - - - - - - - - - - stderr - - - - - - - - - -"
    ) == ("07:58:03", "stderr", "unit-tests")
    assert pal("autopkgtest [07:58:03]: test unit-tests: preparing testbed") == (
        "07:58:03", "testbed-setup", "unit-tests",
    )
    assert pal("autopkgtest [07:58:03]: test unit-tests: some output") == (
        "07:58:03", "test-output", ("unit-tests", "some output"),
    )
    assert pal("autopkgtest [07:58:03]: ERROR: some error") == ("07:58:03", "error", "some error")


def test_testbed_failure_plain():
    lines = [
        "autopkgtest [06:59:00]: ERROR: testbed failure: rules extract failed with exit code 100 (apt failed)\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert err.kind == "testbed-failure"
    assert err.details == {"reason": "rules extract failed with exit code 100 (apt failed)"}
