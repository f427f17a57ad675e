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


def test_testbed_failure_plain():
    lines = [
        "autopkgtest [06:59:00]: ERROR: testbed failure: rules extract failed with exit code 100 (apt failed)\n",
    ]
    m, testname, err, desc = fafd(lines)
    assert err.kind == "testbed-failure"
    assert err.details == {"reason": "rules extract failed with exit code 100 (apt failed)"}
