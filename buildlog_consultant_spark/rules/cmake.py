"""CMake paragraph matchers (reference: /root/reference/src/common.rs:2641-2995).

CMakeErrorMatcher reassembles the indented continuation block after a
``CMake Error at path:line (rule):`` header, dedents it, and re-runs the
24 paragraph rules (``(?s)`` so ``.`` crosses newlines) on the paragraph.
"""

from __future__ import annotations

import re
import textwrap
from typing import Sequence

from ..core.matchers import MatcherGroup, MultiLineMatch, para_rule
from ..core.problems import (
    CMakeFilesMissing,
    CMakeNeedExactVersion,
    MissingCMakeComponents,
    MissingCMakeConfig,
    MissingCommand,
    MissingFile,
    MissingLibrary,
    MissingPkgConfig,
    MissingPythonModule,
    MissingQt,
    MissingStaticLibrary,
    MissingVagueDependency,
    NoSpaceOnDevice,
)
from .helpers import command_missing


def _compiler_failure(m):
    # src/common.rs:2673-2680: re-run the full analysis on the dedented
    # compiler output (lazy import: engine.core imports this module's parent).
    from ..engine.core import find_build_failure_description, split_log_lines

    compiler_output = textwrap.dedent(m.group(3))
    _match, error = find_build_failure_description(
        split_log_lines(compiler_output)
    )
    return error


def _include_not_found(m):
    path = m.group(2)
    if not path.endswith(".cmake"):
        path += ".cmake"
    return CMakeFilesMissing([path], None)


CMAKE_ERROR_MATCHERS = MatcherGroup([
    para_rule(
        r"Could NOT find (.*) \(missing:\s(.*)\)\s\(found\ssuitable\sversion\s.*",
        lambda m: MissingCMakeComponents(m.group(1), m.group(2).split()),
    ),
    para_rule(
        r"\s*--\s+Package \'(.*)\', required by \'(.*)\', not found",
        lambda m: MissingPkgConfig.simple(m.group(1)),
    ),
    para_rule(
        r'Could not find a package configuration file provided by\s"(.*)" \(requested\sversion\s(.*)\)\swith\sany\s+of\s+the\s+following\snames:\n\n(  .*\n)+\n.*$',
        lambda m: MissingCMakeConfig(m.group(1), m.group(2)),
    ),
    para_rule(
        r"Could NOT find (.*) \(missing: (.*)\)",
        lambda m: MissingCMakeComponents(m.group(1), m.group(2).split()),
    ),
    para_rule(
        r'The (.+) compiler\n\n  "(.*)"\n\nis not able to compile a simple test program\.\n\nIt fails with the following output:\n\n(.*)\n\nCMake will not be able to correctly generate this project.\n$',
        _compiler_failure,
    ),
    para_rule(
        r'Could NOT find (.*): Found unsuitable version \"(.*)\",\sbut\srequired\sis\sexact version \"(.*)\" \(found\s(.*)\)',
        lambda m: CMakeNeedExactVersion(m.group(1), m.group(2), m.group(3), m.group(4)),
    ),
    para_rule(
        r"(.*) couldn't be found \(missing: .*_LIBRARIES .*_INCLUDE_DIR\)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r'Could NOT find (.*): Found unsuitable version \"(.*)\",\sbut\srequired\sis\sat\sleast\s\"(.*)\" \(found\s(.*)\)',
        lambda m: MissingPkgConfig(m.group(1), m.group(3)),
    ),
    para_rule(
        r'The imported target \"(.*)\" references the file\n\n\s*"(.*)"\n\nbut this file does not exist\.(.*)',
        lambda m: MissingFile(m.group(2)),
    ),
    para_rule(
        r'Could not find a configuration file for package "(.*)"\sthat\sis\scompatible\swith\srequested\sversion\s"(.*)"\.',
        lambda m: MissingCMakeConfig(m.group(1), m.group(2)),
    ),
    para_rule(
        r'.*Could not find a package configuration file provided by "(.*)"\s+with\s+any\s+of\s+the\s+following\s+names:\n\n(  .*\n)+\n.*$',
        lambda m: CMakeFilesMissing(m.group(2).split(), None),
    ),
    para_rule(
        r'.*Could not find a package configuration file provided by "(.*)"\s\(requested\sversion\s(.+\))\swith\sany\sof\sthe\sfollowing\snames:\n\n(  .*\n)+\n.*$',
        lambda m: MissingCMakeConfig(m.group(1), m.group(2)),
    ),
    para_rule(
        r'No CMAKE_(.*)_COMPILER could be found.\n\nTell CMake where to find the compiler by setting either\sthe\senvironment\svariable\s"(.*)"\sor\sthe\sCMake\scache\sentry\sCMAKE_(.*)_COMPILER\sto\sthe\sfull\spath\sto\sthe\scompiler,\sor\sto\sthe\scompiler\sname\sif\sit\sis\sin\sthe\sPATH.\n',
        lambda m: MissingCommand(m.group(1).lower()),
    ),
    para_rule(
        r'file INSTALL cannot find\s"(.*)".\n',
        lambda m: MissingFile(m.group(1)),
    ),
    para_rule(
        r'file INSTALL cannot copy file\n"(.*)"\sto\s"(.*)":\sNo space left on device.\n',
        lambda m: NoSpaceOnDevice(),
    ),
    para_rule(
        r"patch: \*\*\*\* write error : No space left on device",
        lambda m: NoSpaceOnDevice(),
    ),
    para_rule(r".*\(No space left on device\)", lambda m: NoSpaceOnDevice()),
    para_rule(r'file INSTALL cannot copy file\n"(.*)"\nto\n"(.*)"\.\n'),
    para_rule(
        r"Missing (.*)\.  Either your\nlib(.*) version is too old, or lib(.*) wasn\'t found in the place you\nsaid.",
        lambda m: MissingLibrary(m.group(1)),
    ),
    para_rule(
        r"need (.*) of version (.*)",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    para_rule(
        r"\*\*\* (.*) is required to build (.*)\n",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(r"\[([^ ]+)\] not found", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(r"([^ ]+) not found", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(r"error: could not find git .*", lambda m: MissingCommand("git")),
    para_rule(
        r"Could not find \'(.*)\' executable[\!,].*",
        lambda m: MissingCommand(m.group(1)),
    ),
    para_rule(
        r"Could not find (.*)_STATIC_LIBRARIES using the following names: ([a-zA-z0-9_.]+)",
        lambda m: MissingStaticLibrary(m.group(1), m.group(2)),
    ),
    para_rule("include could not find (requested|load) file:\n\n  (.*)\n", _include_not_found),
    para_rule(r"(.*) and (.*) are required", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(
        r"Please check your (.*) installation",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Python module (.*) not found\!",
        lambda m: MissingPythonModule.simple(m.group(1)),
    ),
    para_rule(
        r"\s*could not find ([^\s]+)$",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Please install (.*) before installing (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Please get (.*) from (www\..*)",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    para_rule(
        r'Found unsuitable Qt version "" from NOTFOUND, this code requires Qt 4.x',
        lambda m: MissingQt(),
    ),
    para_rule(
        r"(.*) executable not found\! Please install (.*)\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    para_rule(r"(.*) tool not found", lambda m: MissingCommand(m.group(1))),
    para_rule(
        r"--   Requested \'(.*) >= (.*)\' but version of (.*) is (.*)",
        lambda m: MissingPkgConfig(m.group(1), m.group(2)),
    ),
    para_rule(
        r"--   No package \'(.*)\' found",
        lambda m: MissingPkgConfig(m.group(1)),
    ),
    para_rule(r"([^ ]+) library not found\.", lambda m: MissingLibrary(m.group(1))),
    para_rule(
        r"Please install (.*) so that it is on the PATH and try again\.",
        command_missing,
    ),
    para_rule(
        r"-- Unable to find git\.  Setting git revision to \'unknown\'\.",
        lambda m: MissingCommand("git"),
    ),
    para_rule(
        r"(.*) must be installed before configuration \& building can proceed",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"(.*) development files not found\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r".* but no (.*) dev libraries found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Failed to find (.*) \(missing: .*\)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Couldn\'t find ([^ ]+) development files\..*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Could not find required (.*) package\!",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Cannot find (.*), giving up\. .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Cannot find (.*)\. (.*) is required for (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"The development\sfiles\sfor\s(.*)\sare\srequired\sto\sbuild (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"Required library (.*) not found\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"(.*) required to compile (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"(.*) requires (.*) ([0-9].*) or newer. See (https://.*)\s*",
        lambda m: MissingVagueDependency(
            m.group(2), url=m.group(4), minimum_version=m.group(3)
        ),
    ),
    para_rule(
        r"(.*) requires (.*) ([0-9].*) or newer.\s*",
        lambda m: MissingVagueDependency(m.group(2), minimum_version=m.group(3)),
    ),
    para_rule(r"(.*) requires (.*) to build", lambda m: MissingVagueDependency.simple(m.group(2))),
    para_rule(r"(.*) library missing", lambda m: MissingLibrary(m.group(1))),
    para_rule(r"(.*) requires (.*)", lambda m: MissingVagueDependency.simple(m.group(2))),
    para_rule(r"Could not find ([A-Za-z-]+)", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(r"(.+) is required for (.*)\.", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(
        r"No (.+) version could be found in your system\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(
        r"([^ ]+) >= (.*) is required",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    para_rule(r"\s*([^ ]+) is required", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(r"([^ ]+) binary not found\!", lambda m: MissingCommand(m.group(1))),
    para_rule(r"error: could not find git for clone of .*", lambda m: MissingCommand("git")),
    para_rule(r"Did not find ([^\s]+)", lambda m: MissingVagueDependency.simple(m.group(1))),
    para_rule(
        r"Could not find the ([^ ]+) external dependency\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    para_rule(r"Couldn\'t find (.*)", lambda m: MissingVagueDependency.simple(m.group(1))),
])


def extract_cmake_error_lines(lines: Sequence[str], i: int):
    """src/common.rs:2930-2957: gather the indented continuation block, strip
    trailing blanks, dedent."""
    linenos = [i]
    error_lines = []
    for j in range(i + 1, len(lines)):
        line = lines[j]
        trimmed = line.rstrip("\n")
        if trimmed and not line.startswith(" "):
            break
        error_lines.append(line)
        linenos.append(j)
    while error_lines and not error_lines[-1].rstrip("\n"):
        error_lines.pop()
        linenos.pop()
    return linenos, textwrap.dedent("".join(error_lines))


class CMakeErrorMatcher:
    """src/common.rs:2926-2995."""

    anchor = "CMake "
    _header = re.compile(r"CMake (Error|Warning) at (.+):([0-9]+) \((.*)\):")

    def extract(self, lines: Sequence[str], offset: int):
        if not self._header.search(lines[offset].rstrip("\n")):
            return None
        linenos, error_string = extract_cmake_error_lines(lines, offset)
        match = MultiLineMatch("CMake", linenos, [lines[j] for j in linenos])
        r = CMAKE_ERROR_MATCHERS.extract([error_string], 0)
        if r is not None:
            return match, r[1]
        return match, None
