"""Primary catalog, part 4 — the intentionally-broad tail, ported in order
from /root/reference/src/common.rs:2287-2638. These stay at the bottom of the
list (first-match-wins makes position semantic, src/common.rs:2291-2309)."""

from __future__ import annotations

from ..core.matchers import Rule, rule
from ..core.problems import (
    MissingCHeader,
    MissingCommand,
    MissingLibrary,
    MissingOCamlPackage,
    MissingPythonDistribution,
    MissingVagueDependency,
    NoSpaceOnDevice,
)

PART4 = [
    rule(
        r'configure: error: Can not find "(.*)" .* in your PATH',
        lambda m: MissingCommand(m.group(1)),
    ),
    # Intentionally at the bottom of the list.
    rule(
        r"([^ ]+) package not found\. Please install from (https://[^ ]+)",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    rule(
        r"([^ ]+) package not found\. Please use \'pip install .*\' first",
        lambda m: MissingPythonDistribution.simple(m.group(1)),
    ),
    rule(r".*: No space left on device", lambda m: NoSpaceOnDevice()),
    Rule(
        r".*(No space left on device).*",
        lambda m: NoSpaceOnDevice(),
        # the literal is group-wrapped, invisible to required_literal
        anchor="No space left on device",
    ),
    rule(
        r"ocamlfind: Package `(.*)\' not found",
        lambda m: MissingOCamlPackage(m.group(1)),
    ),
    # Not a very unique ocaml-specific pattern :(
    rule(
        r'Error: Library "(.*)" not found.',
        lambda m: MissingOCamlPackage(m.group(1)),
    ),
    # Intentionally at the bottom of the list, since they're quite broad.
    rule(
        r"configure: error: ([^ ]+) development files not found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Exception: ([^ ]+) development files not found\..*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Exception: Couldn\'t find (.*) source libs\!",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        "configure: error: '(.*)' command was not found",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) not present.*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) >= (.*) not found",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: (.*) headers (could )?not (be )?found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) ([0-9].*) (could )?not (be )?found",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: (.*) (could )?not (be )?found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) ([0-9.]+) is required to build.*",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: Problem encountered: (.*) (.*) or later required",
        lambda m: MissingVagueDependency(m.group(3), minimum_version=m.group(4)),
    ),
    rule(
        r"configure: error: Please install (.*) from (http:\/\/[^ ]+)",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    rule(
        r"configure: error: Required package (.*) (is ?)not available\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Error\! You need to have (.*) \((.*)\) around.",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: You don\'t have (.*) installed",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Could not find a recent version of (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Unable to locate (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Missing the (.* library)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) requires (.* libraries), .*",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"configure: error: (.*) requires ([^ ]+)\.",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"(.*) cannot be discovered in ([^ ]+)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Missing required program '(.*)'.*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Missing (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Unable to find (.*), please install (.*)",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"configure: error: (.*) Not found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: You need to install (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) \((.*)\) not found\.",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"configure: error: (.*) libraries are required for compilation",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: .*Make sure you have (.*) installed\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"error: Cannot find (.*) in the usual places. .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r'Makefile:[0-9]+: \*\*\* "(.*) was not found"\.  Stop\.',
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r'Makefile:[0-9]+: \*\*\* \"At least (.*) version (.*) is needed to build (.*)\.".  Stop\.',
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"([a-z0-9A-Z]+) not found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ERROR:  Unable to locate (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        "\x1b\\[1;31merror: (.*) not found\x1b\\[0;32m",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"You do not have (.*) correctly installed\. .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Error: (.*) is not available on your system",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ERROR: (.*) (.*) or later is required",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: .*Please install the \'(.*)\' package\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Error: Please install ([^ ]+) package",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: <(.*\.h)> is required",
        lambda m: MissingCHeader(m.group(1)),
    ),
    rule(
        r"configure: error: ([^ ]+) is required",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: you should install ([^ ]+) first",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: .*You need (.*) installed.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"To build (.*) you need (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r".*Can\'t ([^\. ]+)\. (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"([^ ]+) >= (.*) is required",
        # reference uses group 1 for minimum_version here (upstream quirk) — parity
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(1)),
    ),
    rule(
        r".*: ERROR: (.*) needs to be installed to run these tests",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ERROR: Unable to locate (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ERROR: Cannot find command \'(.*)\' - do you have \'(.*)\' installed and in your PATH\?",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"ValueError: no ([^ ]+) installed, .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"This project needs (.*) in order to build\. .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ValueError: Unable to find (.+)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"([^ ]+) executable not found\. .*",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"ERROR: InvocationError for command could not find executable (.*)",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"E ImportError: Unable to find ([^ ]+) shared library",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"\s*([^ ]+) library not found on the system",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"\s*([^ ]+) library not found(\.?)",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r".*Please install ([^ ]+) libraries\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Error: Please install (.*) package",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Please get ([^ ]+) from (www\..*)\.",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    rule(
        r"Please install ([^ ]+) so that it is on the PATH and try again\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"configure: error: No (.*) binary found in (.*)",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"Could not find ([A-Za-z-]+)$",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"No ([^ ]+) includes and libraries found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Required library (.*) not found\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Missing ([^ ]+) boost library, .*",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"configure: error: ([^ ]+) needed\!",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\*\*\* (.*) not found, please install it \*\*\*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: could not find ([^ ]+)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"([^ ]+) is required for ([^ ]+)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: \*\*\* No ([^.])\! Install (.*) development headers/libraries! \*\*\*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: \'(.*)\' cannot be found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"No (.*) includes and libraries found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\s*No (.*) version could be found in your system\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(r"You need (.+)", lambda m: MissingVagueDependency.simple(m.group(1))),
    rule(
        r"configure: error: ([^ ]+) is needed",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Cannot find ([^ ]+)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: ([^ ]+) requested but not installed\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"We need the Python library (.+) to be installed\..*",
        lambda m: MissingPythonDistribution.simple(m.group(1)),
    ),
    rule(
        r"(.*) uses (.*) \(.*\) for installation but (.*) was not found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"ERROR: could not locate the \'([^ ]+)\' utility",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"Can\'t find (.*) libs. Exiting",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
]
