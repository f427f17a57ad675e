"""Match model + regex rule infrastructure.

Mirrors the reference's matcher layer (/root/reference/src/match.rs,
/root/reference/src/lib.rs:254-475):

* ``SingleLineMatch`` / ``MultiLineMatch`` — 0-based offsets, 1-based linenos,
  ``MultiLineMatch.offset`` is the LAST offset (src/lib.rs:448-453) and
  ``.line`` the last line (src/lib.rs:438-441).
* ``Rule`` — one regex + extractor callback, origin ``direct regex (<pat>)``
  (src/match.rs:111). Matching is an unanchored *search* (Rust
  ``Regex::captures``). Paragraph rules get ``(?s)`` prepended
  (src/match.rs:187-200).
* ``MatcherGroup`` — ordered, first-match-wins (src/match.rs:247-254).

Performance: the reference tries ~750 regexes per line (no prefilter,
BASELINE.md). This engine adds a *provably non-semantic* literal-anchor
prefilter: for each rule we statically extract a substring that every matching
line must contain (sound by construction: depth-0 literal run, no top-level
alternation, not under an optional quantifier). A single compiled alternation
("gate") over all anchors decides whether any anchored rule could match a
line; rules with no extractable anchor are always checked. prefilter=False ⇒
no anchored rule matches ⇒ running only the no-anchor rules in catalog order
yields the same first match as the full ordered scan.
"""

from __future__ import annotations

import re
from typing import Callable, Optional, Sequence

from .problems import Problem


class Match:
    """Base: a located match in a line array."""

    __slots__ = ("origin", "offsets", "lines")

    def __init__(self, origin: str, offsets: list[int], lines: list[str]):
        assert offsets and len(offsets) == len(lines)
        self.origin = origin
        self.offsets = offsets
        self.lines = lines

    @property
    def offset(self) -> int:
        return self.offsets[-1]

    @property
    def lineno(self) -> int:
        return self.offset + 1

    @property
    def line(self) -> str:
        return self.lines[-1]

    @property
    def linenos(self) -> list[int]:
        return [o + 1 for o in self.offsets]

    def add_offset(self, extra: int) -> "Match":
        return Match(self.origin, [o + extra for o in self.offsets], list(self.lines))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Match({self.origin!r}, lineno={self.lineno}, line={self.line!r})"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Match)
            and self.offsets == other.offsets
            and self.lines == other.lines
        )

    def __hash__(self) -> int:
        return hash((tuple(self.offsets), tuple(self.lines)))


def SingleLineMatch(origin: str, offset: int, line: str) -> Match:
    return Match(origin, [offset], [line])


def MultiLineMatch(origin: str, offsets: list[int], lines: list[str]) -> Match:
    return Match(origin, offsets, lines)


def single_line_match_from_lines(
    lines: Sequence[str], offset: int, origin: Optional[str] = None
) -> Match:
    return Match(origin or "", [offset], [lines[offset]])


# ---------------------------------------------------------------------------
# Literal-anchor extraction (sound, conservative)
# ---------------------------------------------------------------------------

_CLASS_ESCAPES = set("dDsSwWbBAZ")  # \d etc. — not literals
_LITERAL_ESCAPES = {
    "n": "\n", "r": "\r", "t": "\t", "f": "\f", "v": "\v",
    "\\": "\\", ".": ".", "+": "+", "*": "*", "?": "?", "(": "(", ")": ")",
    "[": "[", "]": "]", "{": "{", "}": "}", "|": "|", "^": "^", "$": "$",
    "/": "/", "'": "'", '"': '"', " ": " ", "-": "-", "!": "!", "#": "#",
    ",": ",", ":": ":", "=": "=", "<": "<", ">": ">", "@": "@", "&": "&",
    "~": "~", "%": "%", ";": ";", "`": "`",
}


def required_literal(pattern: str) -> Optional[str]:
    """Longest literal substring guaranteed to appear in any string the
    pattern matches (searched, unanchored), or None.

    Sound under: only depth-0 runs count; a '|' at depth 0 disqualifies the
    whole pattern; a quantifier making the previous atom optional (?, *,
    {0,…}) drops that atom from the current run; any group, class or escape
    construct breaks the run (contents ignored — conservative).
    """
    # quick reject: top-level alternation
    depth = 0
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\":
            i += 2
            continue
        if c == "[":
            # skip char class
            i += 1
            if i < n and pattern[i] == "^":
                i += 1
            if i < n and pattern[i] == "]":
                i += 1
            while i < n and pattern[i] != "]":
                if pattern[i] == "\\":
                    i += 1
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "|" and depth == 0:
            return None
        i += 1

    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            runs.append("".join(cur))
            cur.clear()

    def skip_quantifier(j: int) -> int:
        """j at a quantifier char; return index past the quantifier."""
        if j < n and pattern[j] in "?*+":
            j += 1
        elif j < n and pattern[j] == "{":
            k = pattern.find("}", j)
            if k == -1:
                return j  # not a quantifier after all
            j = k + 1
        if j < n and pattern[j] == "?":  # lazy modifier
            j += 1
        return j

    depth = 0
    i = 0
    while i < n:
        c = pattern[i]
        nxt = pattern[i + 1] if i + 1 < n else ""
        if c == "\\":
            esc = nxt
            i += 2
            if depth != 0:
                continue
            if esc in _CLASS_ESCAPES or esc.isdigit():
                flush()
                continue
            lit = _LITERAL_ESCAPES.get(esc)
            if lit is None:
                flush()
                continue
            # optional quantifier after the escape?
            q = pattern[i] if i < n else ""
            if q in "?*" or (q == "{" and re.match(r"\{0?,", pattern[i:])):
                flush()
                i = skip_quantifier(i)
                continue
            cur.append(lit)
            if q == "+" or (q == "{" and re.match(r"\{[0-9]", pattern[i:])):
                # at-least-once: the single char is required, run breaks after
                flush()
                i = skip_quantifier(i)
            continue
        if c == "[":
            flush()
            i += 1
            if i < n and pattern[i] == "^":
                i += 1
            if i < n and pattern[i] == "]":
                i += 1
            while i < n and pattern[i] != "]":
                if pattern[i] == "\\":
                    i += 1
                i += 1
            i += 1
            continue
        if c == "(":
            flush()
            depth += 1
            i += 1
            continue
        if c == ")":
            depth -= 1
            i += 1
            # a quantified group: nothing to do, group contents were ignored
            continue
        if depth != 0:
            i += 1
            continue
        if c in "^$":
            flush()
            i += 1
            continue
        if c in "?*+" or (c == "{" and re.match(r"\{[0-9]*,?[0-9]*\}", pattern[i:])):
            # quantifier applying to the last literal char
            if c in "?*" or (c == "{" and re.match(r"\{0?,", pattern[i:])):
                if cur:
                    cur.pop()
                flush()
            else:
                # + or {n≥1,…}: previous char required once; break run after it
                flush()
            i = skip_quantifier(i)
            continue
        if c == "{":
            # brace that is not a quantifier — literal in Python re
            cur.append(c)
            i += 1
            continue
        if c == ".":
            flush()
            i += 1
            continue
        cur.append(c)
        i += 1
    flush()
    if not runs:
        return None
    best = max(runs, key=len)
    return best if len(best) >= 3 else None


# by descending frequency in English prose; earlier = more common = worse
_FREQ_ORDER = "etaoinshrdlucmfwygpbvkxjqz"
_FREQ_RANK = {c: i for i, c in enumerate(_FREQ_ORDER)}
_PUNCT = set(":!*[]#$%@=<>`/\\|(){}~^&+;,.?_-")


def _char_score(c: str) -> int:
    if c in _PUNCT:
        return 0
    if c.isupper():
        return 1
    if c.isdigit():
        return 2
    if c == " ":
        return 45
    if c in "'\"":
        return 25
    rank = _FREQ_RANK.get(c)
    if rank is None:
        return 12
    return 40 - rank  # 'e' → 40 (worst), 'z' → 15


def gate_token(anchor: str, k: int = 10) -> str:
    """Pick the cheapest-to-scan substring of an anchor literal.

    The gate's cost is dominated by how often a line position's first char
    enters the trie walk; starting every token at the rarest character in the
    anchor (punctuation / uppercase / digit beats lowercase prose) cuts the
    benign-line scan from ~36 µs to ~0.7 µs per line. Short tokens are
    penalized — a one-char token fires on ordinary prose and forces the full
    ordered rule scan. Soundness is unchanged: token ⊆ anchor, so a line
    without the token cannot contain the anchor.
    """
    n = len(anchor)

    def cost(i: int) -> tuple:
        remaining = min(k, n - i)
        return (_char_score(anchor[i]) + max(0, 6 - remaining) * 8, i)

    best = min(range(n), key=cost)
    return anchor[best:best + k]


def trie_regex(literals: Sequence[str]) -> str:
    """Compile a set of literal strings into a trie-shaped regex pattern.

    A flat 600-branch alternation makes CPython's sre try each branch at each
    position (~180 µs/line measured); a prefix-trie collapses shared prefixes
    so each position costs one trie walk (~the classic trieregex technique).
    Matches exactly the same set: any string containing one of the literals.
    """
    trie: dict = {}
    for lit in literals:
        node = trie
        for ch in lit:
            node = node.setdefault(ch, {})
        node[""] = {}  # terminal

    def emit(node: dict) -> str:
        if "" in node and len(node) == 1:
            return ""
        alts = []
        has_terminal = False
        for ch, child in sorted(node.items()):
            if ch == "":
                has_terminal = True
                continue
            alts.append(re.escape(ch) + emit(child))
        if len(alts) == 1 and not has_terminal:
            return alts[0]
        body = "(?:" + "|".join(alts) + ")"
        if has_terminal:
            body += "?"
        return body

    return emit(trie)


# ---------------------------------------------------------------------------
# Matchers
# ---------------------------------------------------------------------------

ExtractorFn = Callable[[re.Match], Optional[Problem]]

_FLAG_RE = re.compile(r"^\(\?([asimx]+)\)")


def _compile(pattern: str, dotall: bool = False) -> re.Pattern:
    flags = re.DOTALL if dotall else 0
    return re.compile(pattern, flags)


class Rule:
    """One regex line matcher: pattern + optional extractor callback
    (reference: src/match.rs:39-128)."""

    __slots__ = ("pattern", "regex", "callback", "anchor", "anchors", "origin")

    def __init__(
        self,
        pattern: str,
        callback: Optional[ExtractorFn] = None,
        dotall: bool = False,
        anchor: Optional[str] = "",
        anchors: Optional[tuple] = None,
    ):
        self.pattern = pattern
        self.regex = _compile(pattern, dotall=dotall)
        self.callback = callback
        # anchor="" means "derive"; None means "no anchor, always check";
        # anchors (plural) = any-of alternatives for group-wrapped literals
        self.anchor = required_literal(pattern) if anchor == "" else anchor
        self.anchors = anchors
        self.origin = f"direct regex ({'(?s)' if dotall else ''}{pattern})"

    def extract(self, lines: Sequence[str], offset: int):
        line = lines[offset]
        m = self.regex.search(line)
        if m is None:
            return None
        problem = self.callback(m) if self.callback else None
        return SingleLineMatch(self.origin, offset, line), problem


def rule(pattern: str, callback: Optional[ExtractorFn] = None) -> Rule:
    """regex_line_matcher! equivalent (src/match.rs:151-164)."""
    return Rule(pattern, callback)


def para_rule(pattern: str, callback: Optional[ExtractorFn] = None) -> Rule:
    """regex_para_matcher! equivalent — prepends (?s) (src/match.rs:187-200)."""
    return Rule(pattern, callback, dotall=True)


class MatcherGroup:
    """Ordered, first-match-wins group with the literal-anchor gate.

    ``extract(lines, offset)`` is semantically identical to trying every
    matcher in order (src/match.rs:247-254); the gate only skips whole-line
    scans that provably cannot match any anchored rule.
    """

    def __init__(self, matchers: Sequence):
        self.matchers = list(matchers)
        self._no_anchor: list[int] = []
        # idx -> tuple of anchor alternatives (rule can only match if at
        # least one is present in the line)
        self._anchor_of: dict[int, tuple] = {}
        token_rules: dict[str, list[int]] = {}
        for idx, m in enumerate(self.matchers):
            alts = getattr(m, "anchors", None)
            if not alts:
                a = getattr(m, "anchor", None)
                alts = (a,) if a else None
            if alts:
                self._anchor_of[idx] = tuple(alts)
                for a in alts:
                    token_rules.setdefault(gate_token(a), []).append(idx)
            else:
                self._no_anchor.append(idx)
        self._token_rules = token_rules
        uniq = sorted(token_rules)
        self._gate = re.compile(trie_regex(uniq)) if uniq else None

    def extract(self, lines: Sequence[str], offset: int, use_gate: bool = True):
        if not use_gate or self._gate is None:
            for m in self.matchers:
                r = m.extract(lines, offset)
                if r is not None:
                    return r
            return None
        line = lines[offset]
        if not self._gate.search(line):
            for idx in self._no_anchor:
                r = self.matchers[idx].extract(lines, offset)
                if r is not None:
                    return r
            return None
        # candidate rules: only those whose (sound) token is present, merged
        # with the no-anchor rules, in original catalog order
        candidates = set(self._no_anchor)
        for tok, idxs in self._token_rules.items():
            if tok in line:
                candidates.update(idxs)
        for idx in sorted(candidates):
            alts = self._anchor_of.get(idx)
            if alts is not None and not any(a in line for a in alts):
                continue
            r = self.matchers[idx].extract(lines, offset)
            if r is not None:
                return r
        return None
