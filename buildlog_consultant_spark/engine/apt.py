"""APT log analysis (reference: /root/reference/src/apt.rs).

``find_apt_get_failure`` does a backward scan over the last 50 lines with a
priority cascade; a generic ``E: `` line is remembered as a weak fallback; a
final forward full-scan catches two no-space patterns.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from ..core.matchers import Match, MultiLineMatch, SingleLineMatch
from ..core.problems import (
    AptBrokenPackages,
    AptFetchFailure,
    AptMissingReleaseFile,
    AptPackageUnknown,
    DpkgError,
    NoSpaceOnDevice,
    Problem,
    UnsatisfiedAptConflicts,
    UnsatisfiedAptDependencies,
)
from .cudf import parse_cudf

_FETCH_RE = re.compile("^E: Failed to fetch ([^ ]+)  (.*)")
_DEPENDS_RE = re.compile(r"\s*Depends: (.*) but it is not (going to be installed|installable)")
_PKG_DEPENDS_RE = re.compile(
    r"\s*(.*) : Depends: (.*) but it is not (going to be installed|installable)"
)
_RELEASE_RE = re.compile("E: The repository '([^']+)' does not have a Release file.")
_DPKG_DEB_NOSPACE_RE = re.compile(
    "dpkg-deb: error: unable to write file '(.*)': No space left on device"
)
_FREE_SPACE_RE = re.compile(r"E: You don't have enough free space in (.*)\.")
_LOCATE_RE = re.compile(r"E: Unable to locate package (.*)")
_DPKG_ERROR_RE = re.compile(r"dpkg: error: (.*)")
_DPKG_PROC_RE = re.compile(r"dpkg: error processing package (.*) \((.*)\):")
_COPY_NOSPACE_RE = re.compile(
    r" cannot copy extracted data for '(.*)' to '(.*)': failed to write \(No space left on device\)"
)
_ANY_NOSPACE_RE = re.compile(r" .*: No space left on device")


def find_apt_get_failure(
    lines: Sequence[str],
) -> tuple[Optional[Match], Optional[Problem]]:
    """src/apt.rs:35-248."""
    ret: tuple[Optional[Match], Optional[Problem]] = (None, None)
    n = len(lines)
    start = max(0, n - 50)
    for lineno in range(n - 1, start - 1, -1):
        line = lines[lineno].rstrip("\n")
        if line.startswith("E: Failed to fetch "):
            m = _FETCH_RE.search(line)
            if m:
                if "No space left on device" in m.group(2):
                    problem: Problem = NoSpaceOnDevice()
                else:
                    problem = AptFetchFailure(m.group(1), m.group(2))
                return (
                    SingleLineMatch("direct regex", lineno, lines[lineno]),
                    problem,
                )
            return SingleLineMatch("direct regex", lineno, lines[lineno]), None
        if line == "E: Broken packages":
            # reference indexes lineno-1 unguarded (src/apt.rs:69-82) and
            # would panic on line 0; clamp instead
            prev = max(lineno - 1, 0)
            error = AptBrokenPackages(lines[prev].strip(), None)
            return (
                SingleLineMatch("direct match", prev, lines[prev]),
                error,
            )
        if line == "E: Unable to correct problems, you have held broken packages.":
            offsets = []
            broken = []
            for j in range(lineno - 2, -1, -1):
                m = _DEPENDS_RE.search(lines[j])
                if m:
                    offsets.append(j)
                    broken.append(m.group(1))
                    continue
                m = _PKG_DEPENDS_RE.search(lines[j])
                if m:
                    offsets.append(j)
                    broken.append(m.group(2))
                    continue
                break
            error = AptBrokenPackages(lines[lineno].strip(), broken)
            offsets.append(lineno)
            match = MultiLineMatch(
                "direct match", offsets, [lines[o] for o in offsets]
            )
            return match, error
        m = _RELEASE_RE.search(line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                AptMissingReleaseFile(m.group(1)),
            )
        if _DPKG_DEB_NOSPACE_RE.search(line):
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                NoSpaceOnDevice(),
            )
        if _FREE_SPACE_RE.search(line):
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                NoSpaceOnDevice(),
            )
        if line.startswith("E: ") and ret[0] is None:
            ret = (SingleLineMatch("direct regex", lineno, lines[lineno]), None)
        m = _LOCATE_RE.search(line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                AptPackageUnknown(m.group(1)),
            )
        if line == "E: Write error - write (28: No space left on device)":
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                NoSpaceOnDevice(),
            )
        m = _DPKG_ERROR_RE.search(line)
        if m:
            if m.group(1).endswith(": No space left on device"):
                return (
                    SingleLineMatch("direct regex", lineno, lines[lineno]),
                    NoSpaceOnDevice(),
                )
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgError(m.group(1)),
            )
        m = _DPKG_PROC_RE.search(line)
        if m:
            # reference indexes lineno+1 unguarded (src/apt.rs:207-221);
            # clamp at the last line
            nxt = min(lineno + 1, n - 1)
            return (
                SingleLineMatch("direct regex", nxt, lines[nxt]),
                DpkgError(f"processing package {m.group(1)} ({m.group(2)})"),
            )

    for i in range(n):
        if _COPY_NOSPACE_RE.search(lines[i]):
            return (
                SingleLineMatch("direct regex", i, lines[i]),
                NoSpaceOnDevice(),
            )
        if _ANY_NOSPACE_RE.search(lines[i]):
            return (
                SingleLineMatch("direct regex", i, lines[i]),
                NoSpaceOnDevice(),
            )
    return ret


def find_apt_get_update_failure(sbuildlog):
    """src/apt.rs:263-268: focus the "update chroot" section."""
    focus_section = "update chroot"
    lines = sbuildlog.get_section_lines(focus_section) or []
    match, problem = find_apt_get_failure(lines)
    return focus_section, match, problem


def find_cudf_output(lines: Sequence[str]):
    """src/apt.rs:282-299: backward scan for the topmost ``output-version:``
    line; collect until blank; YAML-parse."""
    offset = None
    for i in range(len(lines) - 1, -1, -1):
        if lines[i].startswith("output-version:"):
            offset = i
    if offset is None:
        return None
    output = []
    offsets = []
    while offset < len(lines) and lines[offset].strip():
        offsets.append(offset)
        output.append(lines[offset].rstrip("\n"))
        offset += 1
    return offsets, parse_cudf("\n".join(output))


def _normalize_relation(rel: str) -> str:
    """Whitespace-normalize one Debian relation entry (alternatives joined by
    ``|``). Observable behavior of the reference round-trips relation strings
    through debian_control parse + Display (src/apt.rs:326-343) which yields
    single-space ``name (op version)`` forms joined with " | "."""
    alts = []
    for alt in rel.split("|"):
        alt = " ".join(alt.split())
        alt = re.sub(r"\s*\(\s*", " (", alt)
        alt = re.sub(r"\s*\)\s*", ")", alt)
        alt = re.sub(r"\(([<>=!~]+)\s*", r"(\1 ", alt)
        alts.append(alt.strip())
    return " | ".join(alts)


def error_from_dose3_reports(reports) -> Optional[Problem]:
    """src/apt.rs:311-355."""
    packages = [r["package"] for r in reports]
    assert packages == ["sbuild-build-depends-main-dummy"], packages
    if reports[0]["status"] != "broken":
        return None
    missing = []
    conflict = []
    for reason in reports[0].get("reasons", []):
        if reason.get("missing"):
            rel = reason["missing"]["pkg"]["unsat-dependency"]
            missing.append(_normalize_relation(rel))
        if reason.get("conflict"):
            rel = reason["conflict"]["pkg1"]["unsat-conflict"]
            conflict.extend(_normalize_relation(e) for e in rel.split(","))
    if missing:
        return UnsatisfiedAptDependencies(", ".join(missing))
    if conflict:
        return UnsatisfiedAptConflicts(", ".join(conflict))
    return None
