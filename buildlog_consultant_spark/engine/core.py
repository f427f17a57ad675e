"""The core per-document analysis algorithm.

``find_build_failure_description`` mirrors
/root/reference/src/common.rs:3440-3528 exactly:

1. backward scan of the last 250 lines (``OFFSET``), applying the full
   ordered primary catalog per line; first match wins; note whether any
   scanned line contains "cmake";
2. if cmake: a forward multi-line cmake-heuristics pass;
3. forward scan of the last 250 lines with the secondary matchers.

The scan windows are correctness-relevant (results depend on them) — they are
also the reason per-document work is bounded at 10^12-row scale.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from ..core.matchers import Match, SingleLineMatch
from ..core.problems import CMakeFilesMissing, MissingCommand, MissingFile, Problem
from ..rules import COMMON_MATCHERS
from ..rules.secondary import (
    SECONDARY_ANCHOR_OF,
    SECONDARY_GATE,
    SECONDARY_MATCHERS,
    SECONDARY_NO_ANCHOR,
    SECONDARY_TOKEN_RULES,
)

OFFSET = 250  # src/common.rs:3441

# Web-scale safety guard: Python's `re` backtracks (the reference's Rust
# `regex` crate is linear-time), so a single multi-hundred-KB line (minified
# JS, binary junk in a crawled page) can stall a scan for minutes. Lines
# longer than this are truncated *for matching and reporting*. This mirrors
# the spirit of the reference's per-pattern BacktrackLimitExceeded guard
# (src/common.rs:3410-3420) and its own 4096-char tail truncation
# (src/llm.rs:7). Real log error lines are far shorter.
MAX_SCAN_CHARS = 8192


def clamp_lines(lines: Sequence[str]) -> Sequence[str]:
    """Truncate pathologically long lines before regex work."""
    if all(len(l) <= MAX_SCAN_CHARS for l in lines):
        return lines
    return [l if len(l) <= MAX_SCAN_CHARS else l[:MAX_SCAN_CHARS] for l in lines]


def match_lines(lines: Sequence[str], offset: int, use_gate: bool = True):
    """Apply the primary catalog at one offset (src/common.rs:3011-3013)."""
    return COMMON_MATCHERS.extract(lines, offset, use_gate=use_gate)


def find_secondary_build_failure(
    lines: Sequence[str], start_offset: int, use_gate: bool = True
) -> Optional[Match]:
    """Forward scan over the last ``start_offset`` lines for secondary
    patterns (src/common.rs:3385-3434)."""
    lines = clamp_lines(lines)
    n = len(lines)
    start = max(0, n - start_offset)
    for offset in range(start, n):
        match_line = lines[offset].rstrip("\n")
        if not use_gate or SECONDARY_GATE is None:
            idxs = range(len(SECONDARY_MATCHERS))
        elif not SECONDARY_GATE.search(match_line):
            idxs = SECONDARY_NO_ANCHOR
        else:
            cand = set(SECONDARY_NO_ANCHOR)
            for tok, rule_idxs in SECONDARY_TOKEN_RULES.items():
                if tok in match_line:
                    cand.update(rule_idxs)
            idxs = sorted(cand)
        for i in idxs:
            alts = SECONDARY_ANCHOR_OF.get(i)
            if alts is not None and not any(a in match_line for a in alts):
                continue
            regexp = SECONDARY_MATCHERS[i]
            if regexp.search(match_line):
                origin = f"secondary regex {regexp.pattern}"
                return SingleLineMatch(origin, offset, lines[offset])
    return None


def highlight_lines(lines: Sequence[str], match: Match, context: int = 5) -> list[str]:
    """Context printer (reference src/lib.rs:550-571): matched lines prefixed
    with '>' ± context. Debug/notebook helper — returns the rendered lines."""
    out = []
    if len(match.linenos) == 1:
        out.append(f"Issue found at line {match.lineno}:")
    else:
        out.append(f"Issue found at lines {match.linenos[0]}-{match.linenos[-1]}:")
    start = max(0, match.offsets[0] - context)
    end = min(len(lines), match.offsets[-1] + context + 1)
    for i in range(start, end):
        marker = ">" if i in match.offsets else " "
        out.append(f" {marker}  {lines[i].rstrip(chr(10))}")
    return out


_CMAKE_COULD_NOT_FIND = re.compile(r"  Could NOT find (.*) \(missing: .*\)")
_CMAKE_IMPORTED_TARGET = re.compile(r'\s*The imported target "(.*)" references the file')
_CMAKE_FILE_ENTRY = re.compile(r'\s*"(.*)"')
_CMAKE_PKG_CONFIG_HEADER = re.compile(
    '^  Could not find a package configuration file provided by "(.*)" with any of the following names:'
)


def find_build_failure_description(
    lines: Sequence[str], use_gate: bool = True
) -> tuple[Optional[Match], Optional[Problem]]:
    """Find the key failure line in build output (src/common.rs:3440-3528)."""
    lines = clamp_lines(lines)
    n = len(lines)
    cmake = False
    # We search backwards for clear errors.
    start = max(0, n - OFFSET)
    for lineno in range(n - 1, start - 1, -1):
        if "cmake" in lines[lineno]:
            cmake = True
        r = match_lines(lines, lineno, use_gate=use_gate)
        if r is not None:
            return r

    # TODO(reference jelmer): kept for parity with CMakeErrorMatcher
    # (src/common.rs:3454-3519).
    if cmake:
        lineno = 0
        while lineno < n:
            line = lines[lineno].rstrip("\n")
            m = _CMAKE_COULD_NOT_FIND.search(line)
            if m:
                return (
                    SingleLineMatch("direct regex", lineno, lines[lineno]),
                    MissingCommand(m.group(1).lower()),
                )
            m = _CMAKE_IMPORTED_TARGET.search(line)
            if m:
                # src/common.rs:3471-3499 would panic whenever this fired (its
                # cursor loop tests the constant-truthy header, runs to
                # lines.len(), then indexes lineno+2). Implemented here with
                # the evident intent: cmake renders the header, a blank line,
                # the quoted file entry, a blank line, then the
                # "but this file does not exist." marker.
                j = lineno + 1
                while j < n and not lines[j].strip():
                    j += 1
                if j < n:
                    fm = _CMAKE_FILE_ENTRY.search(lines[j].rstrip("\n"))
                    k = j + 1
                    while k < n and not lines[k].strip():
                        k += 1
                    if (
                        fm
                        and k < n
                        and lines[k].lstrip().startswith("but this file does not exist.")
                    ):
                        return (
                            SingleLineMatch("direct regex", j, lines[j]),
                            MissingFile(fm.group(1)),
                        )
                lineno += 1
                continue
            if lineno + 1 < n:
                combined = line + " " + lines[lineno + 1].lstrip(" ").rstrip("\n")
                if _CMAKE_PKG_CONFIG_HEADER.search(combined):
                    if lineno + 2 < n and lines[lineno + 2].strip() == "":
                        i = 3
                        filenames = []
                        while lineno + i < n and lines[lineno + i].strip():
                            filenames.append(lines[lineno + i].strip())
                            i += 1
                        return (
                            SingleLineMatch("direct regex (cmake)", lineno, lines[lineno]),
                            CMakeFilesMissing(filenames, None),
                        )
            lineno += 1

    # And forwards for vague ("secondary") errors.
    m = find_secondary_build_failure(lines, OFFSET, use_gate=use_gate)
    if m is not None:
        return m, None

    return None, None
