"""Custom (stateful / multi-line) matchers.

Each mirrors one reference struct (file:line cited per class). Protocol:
``extract(lines, offset) -> Optional[(Match, Optional[Problem])]`` plus an
``anchor`` literal for the prefilter gate (the trigger line's required
substring).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

from ..core.matchers import (
    Match,
    MatcherGroup,
    MultiLineMatch,
    Rule,
    SingleLineMatch,
    rule,
)
from ..core.problems import (
    MissingAutoconfMacro,
    MissingCommand,
    MissingHaskellDependencies,
    MissingPerlModule,
    MissingRPackage,
    MissingSetupPyCommand,
    MissingVagueDependency,
)
from .helpers import file_not_found_maybe_executable_path

# src/common.rs:136-157
CONFIGURE_LINE_MATCHERS = MatcherGroup([
    rule(r"^\s*Unable to find (.*) \(http(.*)\)",
         lambda m: MissingVagueDependency(m.group(1), url=m.group(2))),
    rule(r"^\s*Unable to find (.*)\.",
         lambda m: MissingVagueDependency(m.group(1))),
])


class MultiLineConfigureErrorMatcher:
    """src/common.rs:160-197: bare ``configure: error:`` header, forward scan
    through non-blank lines delegating to CONFIGURE_LINE_MATCHERS."""

    anchor = "configure: error:"

    def extract(self, lines: Sequence[str], offset: int):
        if lines[offset].rstrip("\r\n") != "configure: error:":
            return None
        relevant = []
        for j in range(offset + 1, len(lines)):
            if not lines[j].strip():
                continue
            relevant.append(j)
            m = CONFIGURE_LINE_MATCHERS.extract(lines, j)
            if m is not None:
                return m
        if not relevant:
            return None
        return (
            MultiLineMatch("configure", relevant, [lines[j] for j in relevant]),
            None,
        )


class HaskellMissingDependencyMatcher:
    """src/common.rs:200-235."""

    anchor = ": Encountered missing or private dependencies:"
    _header = re.compile(r"(.*): Encountered missing or private dependencies:")

    def extract(self, lines: Sequence[str], offset: int):
        if not self._header.search(lines[offset].rstrip("\n")):
            return None
        deps = []
        offsets = [offset]
        for j in range(offset + 1, len(lines)):
            if not lines[j].strip():
                break
            if "," in lines[j].strip():
                deps.append(lines[j].strip().split(",", 1)[0])
            offsets.append(j)
        m = MultiLineMatch("haskell dependencies", offsets, [lines[i] for i in offsets])
        return m, MissingHaskellDependencies(deps)


class SetupPyCommandMissingMatcher:
    """src/common.rs:238-276: scan ≤20 lines backward for the setup.py usage
    banner."""

    anchor = "error: invalid command '"
    _cmd = re.compile(r"error: invalid command \'(.*)\'")
    _usage = re.compile(
        r"usage: setup.py \[global_opts\] cmd1 \[cmd1_opts\] \[cmd2 \[cmd2_opts\] \.\.\.\]"
    )

    def extract(self, lines: Sequence[str], offset: int):
        first_offset = offset
        c = self._cmd.search(lines[offset].strip())
        if c is None:
            return None
        for j in range(20):
            if offset - j < 0:
                break
            line = lines[offset - j].rstrip("\n")
            if self._usage.search(line):
                m = MultiLineMatch("setup.py", [first_offset], [lines[first_offset]])
                return m, MissingSetupPyCommand(c.group(1))
        return None


class PythonFileNotFoundErrorMatcher:
    """src/common.rs:279-314: context peek at offset-2 for "subprocess"."""

    anchor = "FileNotFoundError: [Errno 2] No such file or directory: '"
    _re = re.compile(
        r"^(?:E  +)?FileNotFoundError: \[Errno 2\] No such file or directory: \'(.*)\'"
    )

    def extract(self, lines: Sequence[str], offset: int):
        m = self._re.search(lines[offset].rstrip("\n"))
        if m is None:
            return None
        name = m.group(1)
        if offset > 2 and "subprocess" in lines[offset - 2]:
            return (
                SingleLineMatch("python", offset, lines[offset]),
                MissingCommand(name),
            )
        return (
            SingleLineMatch("python", offset, lines[offset]),
            file_not_found_maybe_executable_path(name),
        )


class MultiLinePerlMissingModulesErrorMatcher:
    """src/common.rs:317-354: 2-line header, module name on 3rd line."""

    anchor = "# The following modules are not available."

    def extract(self, lines: Sequence[str], offset: int):
        if lines[offset].rstrip("\r\n") != "# The following modules are not available.":
            return None
        if offset + 2 >= len(lines):
            return None
        if (
            lines[offset + 1].rstrip("\r\n")
            != "# `perl Makefile.PL | cpanm` will install them:"
        ):
            return None
        offsets = [offset, offset + 1, offset + 2]
        m = MultiLineMatch("perl line match", offsets, [lines[i] for i in offsets])
        return m, MissingPerlModule(module=lines[offset + 2].strip())


# src/common.rs:356-363
VIGNETTE_LINE_MATCHERS = MatcherGroup([
    rule(r"^([^ ]+) is not available",
         lambda m: MissingVagueDependency.simple(m.group(1))),
    rule(r"^The package `(.*)` is required\.",
         lambda m: MissingRPackage.simple(m.group(1))),
    rule(r"^Package '(.*)' required.*",
         lambda m: MissingRPackage.simple(m.group(1))),
    rule(r"^The '(.*)' package must be installed.*",
         lambda m: MissingRPackage.simple(m.group(1))),
])


class MultiLineVignetteErrorMatcher:
    """src/common.rs:366-395."""

    anchor = "Error: processing vignette '"
    _header = re.compile(r"^Error: processing vignette '(.*)' failed with diagnostics:")

    def extract(self, lines: Sequence[str], offset: int):
        if not self._header.search(lines[offset]):
            return None
        if offset + 1 >= len(lines):
            return None
        r = VIGNETTE_LINE_MATCHERS.extract(lines, offset + 1)
        if r is not None:
            return r
        return (
            SingleLineMatch("vignette line match", offset + 1, lines[offset + 1]),
            None,
        )


class AutoconfUnexpectedMacroMatcher:
    """src/common.rs:398-433: 2-line window."""

    anchor = "syntax error near unexpected token `"
    _l1 = re.compile(r"\./configure: line [0-9]+: syntax error near unexpected token `.+'")
    _l2 = re.compile(r"^\./configure: line [0-9]+: `[\s\t]*([A-Z0-9_]+)\(.*")

    def extract(self, lines: Sequence[str], offset: int):
        if not self._l1.search(lines[offset]):
            return None
        if offset + 1 >= len(lines):
            return None
        m = MultiLineMatch(
            "autoconf unexpected macro",
            [offset, offset + 1],
            [lines[offset], lines[offset + 1]],
        )
        c = self._l2.search(lines[offset + 1])
        problem = (
            MissingAutoconfMacro(c.group(1), need_rebuild=True) if c else None
        )
        return m, problem
