"""autopkgtest log analysis (reference: /root/reference/src/autopkgtest.rs).

Single forward pass classifying each line into Packets, maintaining
``current_field`` and accumulating per-test output slices with start offsets;
ERROR packets trigger an in-pass cascade; otherwise the summary section drives
per-test dispatch. Offsets are rebased into the full log by adding the
captured slice's start offset.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional, Sequence

from ..core.matchers import Match, SingleLineMatch
from ..core.problems import (
    AptFetchFailure,
    AutopkgtestDepChrootDisappeared,
    AutopkgtestDepsUnsatisfiable,
    AutopkgtestErroneousPackage,
    AutopkgtestStderrFailure,
    AutopkgtestTestbedFailure,
    AutopkgtestTestbedSetupFailure,
    AutopkgtestTimedOut,
    ChrootNotFound,
    Problem,
    XDGRunTimeNotSet,
)

_LINE_RE = re.compile(r"autopkgtest \[([0-9:]+)\]: (.*)")


def parse_autopkgtest_line(line: str):
    """src/autopkgtest.rs:71-105. Returns (timestamp, kind, payload)."""
    m = _LINE_RE.search(line)
    if m is None:
        return None
    timestamp, message = m.group(1), m.group(2)
    if message.startswith("@@@@@@@@@@@@@@@@@@@@ source "):
        return timestamp, "source", None
    if message.startswith("@@@@@@@@@@@@@@@@@@@@ summary"):
        return timestamp, "summary", None
    if message.startswith("test "):
        rest = message[len("test "):].rstrip("\n")
        if ": " not in rest:
            return timestamp, "other", message
        testname, test_status = rest.split(": ", 1)
        if test_status == "[-----------------------":
            return timestamp, "test-begin-output", testname
        if test_status == "-----------------------]":
            return timestamp, "test-end-output", testname
        if test_status == " - - - - - - - - - - results - - - - - - - - - -":
            return timestamp, "results", testname
        if test_status == " - - - - - - - - - - stderr - - - - - - - - - -":
            return timestamp, "stderr", testname
        if test_status == "preparing testbed":
            return timestamp, "testbed-setup", testname
        return timestamp, "test-output", (testname, test_status)
    if message.startswith("ERROR: "):
        return timestamp, "error", message[len("ERROR: "):]
    return timestamp, "other", message


@dataclass
class TestSummary:
    offset: int
    name: str
    result: str  # PASS/FAIL/SKIP/FLAKY
    reason: Optional[str]
    extra: list


_PASS_RE = re.compile("([^ ]+)(?:[ ]+)PASS")
_RESULT_RE = re.compile("([^ ]+)(?:[ ]+)(FAIL|PASS|SKIP|FLAKY) (.+)")


def parse_autopkgtest_summary(lines: Sequence[str]) -> list[TestSummary]:
    """src/autopkgtest.rs:189-232."""
    i = 0
    ret = []
    while i < len(lines):
        line = lines[i]
        m = _PASS_RE.search(line)
        if m:
            # reference tries this unanchored PASS regex first, unconditionally
            # (src/autopkgtest.rs:194-204)
            ret.append(TestSummary(i, m.group(1), "PASS", None, []))
            i += 1
            continue
        m = _RESULT_RE.search(line)
        if m:
            offset = i
            extra = []
            if m.group(3) == "badpkg":
                while i + 1 < len(lines) and (
                    lines[i + 1].startswith("badpkg:") or lines[i + 1].startswith("blame:")
                ):
                    extra.append(lines[i + 1])
                    i += 1
            ret.append(TestSummary(offset, m.group(1), m.group(2), m.group(3), extra))
            i += 1
        else:
            i += 1
    return ret


def _deps_unsatisfiable_from_blame_line(line: str) -> Problem:
    """src/problems/autopkgtest.rs:14-30."""
    args = []
    for entry in line[len("blame: "):].split():
        if ":" in entry:
            kind, arg = entry.split(":", 1)
            args.append([kind, arg])
        else:
            args.append([None, entry])
    return AutopkgtestDepsUnsatisfiable(args)


def find_testbed_setup_failure(lines: Sequence[str]):
    """src/autopkgtest.rs:794-855."""
    for i in range(len(lines) - 1, -1, -1):
        line = lines[i]
        m = re.search(r"\[(.*)\] failed \(exit status ([0-9]+), stderr \'(.*)\'\)", line)
        if m:
            stderr = m.group(3)
            cm = re.search(r"E: (.*): Chroot not found\\n", stderr)
            if cm:
                return (
                    SingleLineMatch("direct regex", i, lines[i]),
                    ChrootNotFound(cm.group(1)),
                )
            return (
                SingleLineMatch("direct regex", i, lines[i]),
                AutopkgtestTestbedSetupFailure(m.group(1), int(m.group(2)), stderr),
            )
        m = re.search(
            r"<VirtSubproc>: failure: \['(.*)'\] unexpectedly produced stderr output `(.*)",
            line,
        )
        if m:
            stderr_group = m.group(2)
            if re.search(
                r"W: /var/lib/schroot/session/(.*): Failed to stat file: No such file or directory",
                stderr_group,
            ):
                return (
                    SingleLineMatch("direct regex", i, lines[i]),
                    AutopkgtestDepChrootDisappeared(),
                )
            return (
                SingleLineMatch("direct regex", i, lines[i]),
                AutopkgtestTestbedSetupFailure(m.group(1), 1, stderr_group),
            )
    return None, None


def find_autopkgtest_failure_description(lines: Sequence[str]):
    """src/autopkgtest.rs:288-780. Returns (match, testname, error, description)."""
    from .apt import find_apt_get_failure
    from .core import find_build_failure_description

    lines = list(lines)
    test_output: dict[tuple, tuple[list, int]] = {}
    current_field: Optional[tuple] = None
    i = -1
    n = len(lines)
    while i + 1 < n:
        i += 1
        line = lines[i]
        parsed = parse_autopkgtest_line(line)
        if parsed is None:
            if current_field is not None:
                test_output.setdefault(current_field, ([], i))[0].append(line)
            continue
        _, kind, payload = parsed
        if kind in ("source", "other"):
            continue
        if kind == "error":
            msg = payload
            if msg.startswith('"') and msg.count('"') == 1:
                sublines = [msg]
                while i + 1 < n:
                    i += 1
                    sublines.append(lines[i])
                    if lines[i].count('"') == 1:
                        break
                msg = "\n".join(sublines)
            last_test = current_field[1] if current_field and len(current_field) > 1 else None

            m = re.search(r'"(.*)" failed with stderr "(.*)("?)', msg)
            if m and re.search(
                "W: (.*): Failed to stat file: No such file or directory", m.group(2)
            ):
                return (
                    SingleLineMatch("direct regex", i, lines[i]),
                    last_test,
                    AutopkgtestDepChrootDisappeared(),
                    m.group(2),
                )
            m = re.search(r"testbed failure: (.*)", msg)
            if m:
                reason = m.group(1)
                if (
                    current_field is not None
                    and reason == "testbed auxverb failed with exit code 255"
                ):
                    field = ("output", current_field[1])
                    entry = test_output.get(field)
                    fl = entry[0] if entry else []
                    bm, berr = find_build_failure_description(fl)
                    if bm is not None and berr is not None:
                        description = bm.line
                        off = (entry[1] if entry else 0) + bm.offset
                        return (
                            SingleLineMatch("direct regex", off, lines[off]),
                            last_test,
                            berr,
                            description,
                        )
                if reason == "sent `auxverb_debug_fail', got `copy-failed', expected `ok...'":
                    bm, berr = find_build_failure_description(lines)
                    if berr is not None:
                        return bm, last_test, berr, bm.line
                if reason == "cannot send to testbed: [Errno 32] Broken pipe":
                    tm, terr = find_testbed_setup_failure(lines)
                    if tm is not None and terr is not None:
                        return tm, last_test, terr, tm.line
                if reason == "apt repeatedly failed to download packages":
                    am, aerr = find_apt_get_failure(lines)
                    if am is not None and aerr is not None:
                        return am, last_test, aerr, am.line
                    return (
                        SingleLineMatch("direct regex", i, lines[i]),
                        last_test,
                        AptFetchFailure(None, reason),
                        None,
                    )
                return (
                    SingleLineMatch("direct regex", i, lines[i]),
                    last_test,
                    AutopkgtestTestbedFailure(reason),
                    None,
                )
            m = re.search(r"erroneous package: (.*)", msg)
            if m:
                bm, berr = find_build_failure_description(lines[:i])
                if bm is not None and berr is not None:
                    return bm, last_test, berr, bm.line
                return (
                    SingleLineMatch("direct regex", i, lines[i]),
                    last_test,
                    AutopkgtestErroneousPackage(m.group(1)),
                    None,
                )
            if msg == "unexpected error:":
                bm, berr = find_build_failure_description(lines[i + 1:])
                if bm is not None and berr is not None:
                    # offsets relative to the slice; reference returns the
                    # inner match as-is (src/autopkgtest.rs:447-459)
                    return bm, last_test, berr, bm.line
            if current_field is not None and current_field in test_output:
                entry = test_output[current_field]
                am, aerr = find_apt_get_failure(entry[0])
                if am is not None and aerr is not None:
                    off = entry[1] + am.offset
                    return (
                        SingleLineMatch("direct regex", off, lines[off]),
                        last_test,
                        aerr,
                        am.line,
                    )
            if msg == "autopkgtest" and i + 1 < n and lines[i + 1].rstrip() == ": error cleaning up:":
                entry = test_output.get(current_field)
                off = entry[1] if entry else i
                return (
                    SingleLineMatch("direct regex", off, lines[off]),
                    last_test,
                    AutopkgtestTimedOut(),
                    lines[i - 1].rstrip(),
                )
            return (
                SingleLineMatch("direct regex", i, lines[i]),
                last_test,
                None,
                msg,
            )
        if kind == "summary":
            current_field = ("summary",)
            test_output[current_field] = ([], i + 1)
            continue
        # test markers
        if kind == "test-begin-output":
            current_field = ("output", payload)
        elif kind == "test-end-output":
            current_field = None
            continue
        elif kind == "results":
            current_field = ("results", payload)
        elif kind == "stderr":
            current_field = ("stderr", payload)
        elif kind == "testbed-setup":
            current_field = ("testbed-setup", payload)
        elif kind == "test-output":
            testname, field = payload
            current_field = ("specific", testname, field)
        test_output[current_field] = ([], i + 1)

    summary = test_output.get(("summary",))
    if summary is None:
        while lines and not lines[-1].strip():
            lines.pop()
        if not lines:
            return None, None, None, None
        offset = len(lines) - 1
        return (
            SingleLineMatch("direct regex", offset, lines[offset]),
            lines[-1],
            None,
            None,
        )
    summary_lines, summary_offset = summary
    for packet in parse_autopkgtest_summary(summary_lines):
        if packet.result in ("PASS", "SKIP"):
            continue
        if packet.reason == "timed out":
            off = summary_offset + packet.offset
            return (
                SingleLineMatch("direct regex", off, lines[off]),
                packet.name,
                AutopkgtestTimedOut(),
                packet.reason,
            )
        elif packet.reason is not None and packet.reason.startswith("stderr: "):
            output = packet.reason[len("stderr: "):]
            field = ("stderr", packet.name)
            entry = test_output.get(field)
            stderr_lines = entry[0] if entry else []
            stderr_offset = entry[1] if entry else None
            offset = None
            description = None
            error = None
            if stderr_lines:
                bm, error = find_build_failure_description(stderr_lines)
                if bm is not None and stderr_offset is not None:
                    offset = bm.offset + stderr_offset
                    description = bm.line
                elif len(stderr_lines) == 1 and re.search(
                    r"QStandardPaths: XDG_RUNTIME_DIR not set, defaulting to \'(.*)\'",
                    stderr_lines[0],
                ):
                    error = XDGRunTimeNotSet()
                    description = stderr_lines[0]
                    offset = stderr_offset
                elif stderr_offset is not None:
                    offset = stderr_offset
            else:
                bm, error = find_build_failure_description([output])
                if bm is not None:
                    offset = summary_offset + packet.offset + bm.offset
                    description = bm.line
            if offset is None:
                offset = summary_offset + packet.offset
            if error is None:
                error = AutopkgtestStderrFailure(output)
            if description is None:
                description = (
                    f"Test {packet.name} failed due to unauthorized stderr output: {output}"
                )
            return (
                SingleLineMatch("direct regex", offset, lines[offset]),
                packet.name,
                error,
                description,
            )
        elif packet.reason == "badpkg":
            field = ("output", packet.name)
            entry = test_output.get(field)
            output_lines = entry[0] if entry else []
            output_offset = entry[1] if entry else None
            if output_lines and output_offset is not None:
                am, aerr = find_apt_get_failure(output_lines)
                if am is not None and aerr is not None:
                    off = am.offset + output_offset
                    return (
                        SingleLineMatch("direct regex", off, lines[off]),
                        packet.name,
                        aerr,
                        None,
                    )
            badpkg = None
            blame = None
            blame_offset = None
            for extra_offset, line in enumerate(packet.extra, start=1):
                if line.startswith("badpkg: "):
                    badpkg = line[len("badpkg: "):]
                if line.startswith("blame: "):
                    blame = line
                    blame_offset = extra_offset
            if badpkg is not None:
                description = f"Test {packet.name} failed: {badpkg.rstrip()}"
            else:
                description = f"Test {packet.name} failed"
            error = (
                _deps_unsatisfiable_from_blame_line(blame) if blame is not None else None
            )
            off = summary_offset + packet.offset + (blame_offset or 0)
            return (
                SingleLineMatch("direct regex", off, lines[off]),
                packet.name,
                error,
                description,
            )
        else:
            field = ("output", packet.name)
            entry = test_output.get(field)
            output_lines = entry[0] if entry else []
            output_offset = entry[1] if entry else None
            bm, error = find_build_failure_description(output_lines)
            if bm is not None and output_offset is not None:
                offset = bm.offset + output_offset
            else:
                offset = summary_offset + packet.offset
            if bm is not None:
                description = bm.line
            elif packet.reason is not None:
                description = f"Test {packet.name} failed: {packet.reason}"
            else:
                description = f"Test {packet.name} failed"
            return (
                SingleLineMatch("direct regex", offset, lines[offset]),
                packet.name,
                error,
                description,
            )

    return None, None, None, None
