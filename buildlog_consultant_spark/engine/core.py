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
from bisect import bisect_right
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


def split_log_lines(text: str) -> list[str]:
    """Split a document exactly like the reference: ``split_inclusive('\\n')``
    (src/bin/analyze-build-log.rs:77, src/common.rs:2677, and sbuild's
    BufRead::read_line). Every line keeps its trailing ``\\n``; the final
    line may lack one; no other codepoint (``\\r``, ``\\f``, ``\\u2028``…) is
    a line break. Using ``str.splitlines`` here would diverge: it splits on
    those extra codepoints, so e.g. curl/wget ``\\r`` progress bars would
    become separate lines and change match offsets vs the reference."""
    parts = text.split("\n")
    out = [p + "\n" for p in parts[:-1]]
    if parts[-1]:
        out.append(parts[-1])
    return out

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
    if not lines or max(map(len, lines)) <= MAX_SCAN_CHARS:
        return lines
    return [l if len(l) <= MAX_SCAN_CHARS else l[:MAX_SCAN_CHARS] for l in lines]


def match_lines(lines: Sequence[str], offset: int, use_gate: bool = True):
    """Apply the primary catalog at one offset (src/common.rs:3011-3013)."""
    return COMMON_MATCHERS.extract(lines, offset, use_gate=use_gate)


def _window_text_and_starts(
    lines: Sequence[str], start: int, end: int, text: Optional[str]
) -> tuple:
    """(window_text, line_start_offsets). Uses the original document string
    zero-copy when the window covers it and every line is its keepends
    split; otherwise joins with newline termination."""
    if text is not None and start == 0 and end == len(lines):
        win = text
        lens = map(len, lines)
    else:
        parts = [
            l if l.endswith("\n") else l + "\n" for l in lines[start:end]
        ]
        win = "".join(parts)
        lens = map(len, parts)
    import itertools

    starts = [0]
    starts.extend(itertools.accumulate(lens))
    return win, starts


# lines per blocked gate scan: small enough that a late match (the common
# real-log shape — errors near the tail) costs about one block, large
# enough that benign windows amortize the per-block call overhead
_GATE_BLOCK = 8


def _block_hits(win: str, gate, starts: Sequence[int], lo: int, hi: int) -> list:
    """Window-relative line indices of gate matches inside lines
    [``lo``, ``hi``) of the window text ``win`` (whose line i starts at
    ``starts[i]``).

    Soundness: gate tokens are newline-free literals and every line's full
    span (terminator included) is inside ``win``, so a token inside line i
    also occurs within line i's span (no false negatives). A match is
    attributed to the line containing its START by bisecting the line-start
    offsets — exact for ANY terminator byte, unlike newline counting, which
    misattributed hits after ``\\r``-terminated segments; any false positive
    merely sends that line through the exact per-line gate downstream,
    which re-filters."""
    hits = []
    for m in gate.finditer(win, starts[lo], starts[hi]):
        hits.append(bisect_right(starts, m.start(), lo, hi) - 1)
    return hits


def find_secondary_build_failure(
    lines: Sequence[str], start_offset: int, use_gate: bool = True,
    text: Optional[str] = None, candidates: Optional[set] = None,
) -> Optional[Match]:
    """Forward scan over the last ``start_offset`` lines for secondary
    patterns (src/common.rs:3385-3434). ``text``, when given, must be the
    string ``lines`` was split from (zero-copy gate scan); ``candidates``
    is an optional superset of gate-positive offsets (from the combined
    pass) — lines outside it are provably uninteresting, lines inside are
    re-filtered by the exact per-line gate below."""
    clamped = clamp_lines(lines)
    if clamped is not lines:
        text = None
        candidates = None
    lines = clamped
    n = len(lines)
    start = max(0, n - start_offset)
    gated = use_gate and SECONDARY_GATE is not None
    if gated and not SECONDARY_NO_ANCHOR:
        # Blocked forward scan: one C-level gate pass per _GATE_BLOCK-line
        # block instead of a search call per line; only gate-positive lines
        # run the candidate-rule loop (no rule runs on gate-negative lines)
        if candidates is None:
            win, starts = _window_text_and_starts(lines, start, n, text)
            nwin = n - start
            offsets = []
            for lo in range(0, nwin, _GATE_BLOCK):
                hi = min(nwin, lo + _GATE_BLOCK)
                hits = _block_hits(win, SECONDARY_GATE, starts, lo, hi)
                offsets.extend(start + h for h in dict.fromkeys(hits))
        else:
            offsets = sorted(o for o in candidates if start <= o < n)
    elif gated:
        offsets = range(start, n)
    else:
        offsets = range(start, n)
    for offset in offsets:
        match_line = lines[offset].rstrip("\n")
        if not gated:
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
    lines: Sequence[str], use_gate: bool = True, text: Optional[str] = None
) -> tuple[Optional[Match], Optional[Problem]]:
    """Find the key failure line in build output (src/common.rs:3440-3528).

    ``text``, when given, must be the string ``lines`` was split from
    (splitlines keepends) — it lets the gate scan the document without
    re-joining the window."""
    clamped = clamp_lines(lines)
    if clamped is not lines:
        text = None
    lines = clamped
    n = len(lines)
    # We search backwards for clear errors.
    start = max(0, n - OFFSET)
    if use_gate and COMMON_MATCHERS._gate is not None and not COMMON_MATCHERS._no_anchor:
        # Blocked backward scan: one C-level primary-gate pass per
        # _GATE_BLOCK-line block instead of a search call per line, processed
        # newest-block-first so a match near the tail keeps the reference's
        # early exit. The per-line gate inside extract() re-filters hit lines
        # exactly. The _no_anchor guard mirrors the secondary path above:
        # rules without an extractable anchor must run on every line, so the
        # gate-positive-only fast path is sound only while that set is empty
        # (also pinned by tests/test_rules_integrity.py).
        gate = COMMON_MATCHERS._gate
        win, starts = _window_text_and_starts(lines, start, n, text)
        nwin = n - start
        for hi in range(nwin, 0, -_GATE_BLOCK):
            lo = max(0, hi - _GATE_BLOCK)
            hits = _block_hits(win, gate, starts, lo, hi)
            for h in sorted(set(hits), reverse=True):
                r = match_lines(lines, start + h, use_gate=True)
                if r is not None:
                    return r
        # only reached when nothing matched — the flag's only consumer
        # ('cmake' is newline-free, every window line newline-terminated,
        # so substring presence in win ≡ presence in some window line)
        cmake = "cmake" in win
    else:
        cmake = False
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
    m = find_secondary_build_failure(lines, OFFSET, use_gate=use_gate, text=text)
    if m is not None:
        return m, None

    return None, None
