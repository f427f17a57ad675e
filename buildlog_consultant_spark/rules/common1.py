"""Primary catalog, part 1 — ported rule-for-rule, in order, from
/root/reference/src/common.rs:493-1059. Order is load-bearing (first match
wins)."""

from __future__ import annotations

import shlex

from ..core.matchers import rule
from ..core.problems import (
    DhWithOrderIncorrect,
    DirectoryNonExistant,
    MissingAssembler,
    MissingAutoconfMacro,
    MissingCargoCrate,
    MissingCHeader,
    MissingCommand,
    MissingCSharpCompiler,
    MissingGoPackage,
    MissingIntrospectionTypelib,
    MissingLibrary,
    MissingNodeModule,
    MissingNodePackage,
    MissingPerlModule,
    MissingPkgConfig,
    MissingPostgresExtension,
    MissingPytestFixture,
    MissingPythonDistribution,
    MissingPythonModule,
    MissingQt,
    MissingRPackage,
    MissingRustCompiler,
    MissingVagueDependency,
    MissingX11,
    NoSpaceOnDevice,
    UnsupportedDebhelperCompatLevel,
    UnsupportedPytestArguments,
    UnsupportedPytestConfigOption,
    VcsControlDirectoryNeeded,
    python_distribution_from_requirement,
)
from .custom import (
    AutoconfUnexpectedMacroMatcher,
    MultiLineConfigureErrorMatcher,
    MultiLinePerlMissingModulesErrorMatcher,
    MultiLineVignetteErrorMatcher,
)
from .helpers import (
    command_missing,
    file_not_found,
    file_not_found_maybe_executable,
    interpreter_missing,
    node_module_missing,
    pkg_config_missing,
)


def _shlex_or_whitespace(s: str) -> list[str]:
    try:
        return shlex.split(s)
    except ValueError:
        return s.split()


def _pluggy_requirement(m):
    # src/common.rs:512-533
    expr = m.group(1)
    if ">=" in expr:
        pkg, minimum = expr.split(">=", 1)
        return MissingPythonModule(pkg.strip(), 2, minimum.strip())
    if " " not in expr:
        return MissingPythonModule(expr.strip(), 2, None)
    return None


def _module_spec_not_found(m):
    # src/common.rs:624-638
    exe = m.group(1)
    if exe.endswith("python3"):
        pv = 3
    elif exe.endswith("python2"):
        pv = 2
    else:
        pv = None
    return MissingPythonModule(m.group(3).strip(), pv, None)


PART1 = [
    rule(r"^[^:]+:\d+: (.*): No such file or directory$", file_not_found_maybe_executable),
    rule(
        r"^(distutils.errors.DistutilsError|error): Could not find suitable distribution for Requirement.parse\('([^']+)'\)$",
        lambda m: python_distribution_from_requirement(m.group(2).split(";")[0]),
    ),
    rule(
        r"^We need the Python library (.*) to be installed. Try runnning: python -m ensurepip$",
        lambda m: MissingPythonDistribution(m.group(1), None, None),
    ),
    rule(
        r"^pkg_resources.DistributionNotFound: The '([^']+)' distribution was not found and is required by the application$",
        lambda m: python_distribution_from_requirement(m.group(1)),
    ),
    rule(
        r"^pkg_resources.DistributionNotFound: The '([^']+)' distribution was not found and is required by (.*)$",
        lambda m: python_distribution_from_requirement(m.group(1)),
    ),
    rule(
        r"^Please install cmake version >= (.*) and re-run setup$",
        lambda m: MissingCommand("cmake"),
    ),
    rule(
        r"^pluggy.manager.PluginValidationError: Plugin '.*' could not be loaded: \(.* \(/usr/lib/python2.[0-9]/dist-packages\), Requirement.parse\('(.*)'\)\)!$",
        _pluggy_requirement,
    ),
    rule(
        r"^E ImportError: (.*) could not be imported\.$",
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        r"^ImportError: could not find any library for ([^ ]+) .*$",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"^ImportError: cannot import name (.*), introspection typelib not found$",
        lambda m: MissingIntrospectionTypelib(m.group(1)),
    ),
    rule(
        r"^ValueError: Namespace (.*) not available$",
        lambda m: MissingIntrospectionTypelib(m.group(1)),
    ),
    rule(
        r"^  namespace '(.*)' ([^ ]+) is being loaded, but >= ([^ ]+) is required$",
        lambda m: MissingRPackage(m.group(1), m.group(3)),
    ),
    rule(
        "^ImportError: cannot import name '(.*)' from '(.*)'$",
        lambda m: MissingPythonModule(f"{m.group(2)}.{m.group(1)}", None, None),
    ),
    rule(
        "^E       fixture '(.*)' not found$",
        lambda m: MissingPytestFixture(m.group(1)),
    ),
    rule(
        "^pytest: error: unrecognized arguments: (.*)$",
        # reference shlex::split().unwrap() panics on unbalanced quotes
        # (src/common.rs:563-566); fall back to whitespace split instead
        lambda m: UnsupportedPytestArguments(_shlex_or_whitespace(m.group(1))),
    ),
    rule(
        "^INTERNALERROR> pytest.PytestConfigWarning: Unknown config option: (.*)$",
        lambda m: UnsupportedPytestConfigOption(m.group(1)),
    ),
    rule(
        "PytestConfigWarning: Unknown config (?:ini key|option): (.*)$",
        lambda m: UnsupportedPytestConfigOption(m.group(1)),
    ),
    rule(
        "^E   ImportError: cannot import name '(.*)' from '(.*)'",
        lambda m: MissingPythonModule(f"{m.group(2)}.{m.group(1)}", None, None),
    ),
    rule(
        "^E   ImportError: cannot import name ([^']+)",
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        r"^django.core.exceptions.ImproperlyConfigured: Error loading .* module: No module named '(.*)'",
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        "^E   ImportError: No module named (.*)",
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        r"^\s*ModuleNotFoundError: No module named '(.*)'",
        lambda m: MissingPythonModule(m.group(1), 3, None),
    ),
    rule(
        r"^Could not import extension .* \(exception: No module named (.*)\)",
        lambda m: MissingPythonModule(m.group(1).strip(), None, None),
    ),
    rule(
        r"^Could not import (.*)\.",
        lambda m: MissingPythonModule(m.group(1).strip(), None, None),
    ),
    rule(
        r"^(.*): Error while finding module specification for '(.*)' \(ModuleNotFoundError: No module named '(.*)'\)",
        _module_spec_not_found,
    ),
    rule(
        "^E   ModuleNotFoundError: No module named '(.*)'",
        lambda m: MissingPythonModule(m.group(1), 3, None),
    ),
    rule(
        r"^/usr/bin/python3: No module named ([^ ]+).*",
        lambda m: MissingPythonModule(m.group(1), 3, None),
    ),
    rule(
        r'^(.*:[0-9]+|package .*): cannot find package "(.*)" in any of:',
        lambda m: MissingGoPackage(m.group(2)),
    ),
    rule(
        r'^ImportError: Error importing plugin ".*": No module named (.*)',
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        r"^ImportError: No module named (.*)",
        lambda m: MissingPythonModule(m.group(1), None, None),
    ),
    rule(
        r"^[^:]+:\d+:\d+: fatal error: (.+\.h|.+\.hh|.+\.hpp): No such file or directory",
        lambda m: MissingCHeader(m.group(1)),
    ),
    rule(
        r"^[^:]+:\d+:\d+: fatal error: (.+\.xpm): No such file or directory",
        file_not_found,
    ),
    rule(
        r".*fatal: not a git repository \(or any parent up to mount point /\)",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r".*fatal: not a git repository \(or any of the parent directories\): \.git",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r"[^:]+\.[ch]:\d+:\d+: fatal error: (.+): No such file or directory",
        lambda m: MissingCHeader(m.group(1)),
    ),
    rule("^.*␛\x1b\\[31mERROR:␛\x1b\\[39m Error: Cannot find module '(.*)'", node_module_missing),
    rule("^\x1b\\[2mError: Cannot find module '(.*)'", node_module_missing),
    rule("^\x1b\\[1m\x1b\\[31m\\[!\\] \x1b\\[1mError: Cannot find module '(.*)'", node_module_missing),
    rule("^✖ \x1b\\[31mERROR:\x1b\\[39m Error: Cannot find module '(.*)'", node_module_missing),
    rule(
        "^\x1b\\[0;31m  Error: To use the transpile option, you must have the '(.*)' module installed",
        node_module_missing,
    ),
    rule(r'^\[31mError: No test files found: "(.*)"\[39m'),
    rule('^\x1b\\[31mError: No test files found: "(.*)"\x1b\\[39m'),
    rule(r"^\s*Error: Cannot find module '(.*)'", node_module_missing),
    rule(r"^>> Error: Cannot find module '(.*)'", node_module_missing),
    rule(r"^>> Error: Cannot find module '(.*)' from '.*'", node_module_missing),
    rule(
        r"^Error: Failed to load parser '.*' declared in '.*': Cannot find module '(.*)'",
        lambda m: MissingNodeModule(m.group(1)),
    ),
    rule(
        r"^    Cannot find module '(.*)' from '.*'",
        lambda m: MissingNodeModule(m.group(1)),
    ),
    rule(
        r"^>> Error: Grunt attempted to load a \.coffee file but CoffeeScript was not installed\.",
        lambda m: MissingNodePackage("coffeescript"),
    ),
    rule(
        r"^>> Got an unexpected exception from the coffee-script compiler. The original exception was: Error: Cannot find module '(.*)'",
        node_module_missing,
    ),
    rule(r"^\s*Module not found: Error: Can't resolve '(.*)' in '(.*)'", node_module_missing),
    rule(r"^  Module (.*) in the transform option was not found\.", node_module_missing),
    rule(
        r"^libtool/glibtool not found!",
        lambda m: MissingVagueDependency.simple("libtool"),
    ),
    rule(r"^qmake: could not find a Qt installation of ''", lambda m: MissingQt()),
    rule(r"^Cannot find X include files via .*", lambda m: MissingX11()),
    rule(
        r"^\*\*\* No X11! Install X-Windows development headers/libraries! \*\*\*",
        lambda m: MissingX11(),
    ),
    rule(
        r"^configure: error: \*\*\* No X11! Install X-Windows development headers/libraries! \*\*\*",
        lambda m: MissingX11(),
    ),
    rule(
        r"^configure: error: The Java compiler javac failed.*",
        lambda m: MissingCommand("javac"),
    ),
    rule(
        r"^configure: error: No ([^ ]+) command found",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^ERROR: InvocationError for command could not find executable (.*)",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^  \*\*\* The (.*) script could not be found\. .*",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r'^(.*)" command could not be found. (.*)',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^configure: error: cannot find lib ([^ ]+)",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(r'^>> Local Npm module "(.*)" not found. Is it installed?', node_module_missing),
    rule(
        r"^npm ERR! CLI for webpack must be installed.",
        lambda m: MissingNodePackage("webpack-cli"),
    ),
    rule(r"^npm ERR! \[!\] Error: Cannot find module '(.*)'", node_module_missing),
    rule(
        r'^npm ERR! >> Local Npm module "(.*)" not found. Is it installed\?',
        node_module_missing,
    ),
    rule(r"^npm ERR! Error: Cannot find module '(.*)'", node_module_missing),
    rule(
        r"^npm ERR! ERROR in Entry module not found: Error: Can't resolve '(.*)' in '.*'",
        node_module_missing,
    ),
    rule(r"^npm ERR! sh: [0-9]+: (.*): not found", command_missing),
    rule(
        r"^npm ERR! (.*\.ts)\([0-9]+,[0-9]+\): error TS[0-9]+: Cannot find module '(.*)' or its corresponding type declarations.",
        lambda m: MissingNodeModule(m.group(2)),
    ),
    rule(r"^npm ERR! Error: spawn (.*) ENOENT", command_missing),
    rule(
        r"^(\./configure): line \d+: ([A-Z0-9_]+): command not found",
        lambda m: MissingAutoconfMacro.new(m.group(2)),
    ),
    rule(r"^.*: line \d+: ([^ ]+): command not found", command_missing),
    rule(r"^.*: line \d+: ([^ ]+): Permission denied"),
    rule(r"^make\[[0-9]+\]: .*: Permission denied"),
    # src/common.rs:753-764: unprivileged-build chown/install failures — match
    # with no problem so they win over the trailing generic make error.
    rule(r"^chown: changing ownership of '(.*)': Operation not permitted", lambda m: None),
    rule(r"^install: cannot change ownership of '(.*)': Operation not permitted", lambda m: None),
    rule(r"^/usr/bin/texi2dvi: TeX neither supports -recorder nor outputs \\openout lines in its log file"),
    rule(r"^/bin/sh: \d+: ([^ ]+): not found", command_missing),
    rule(r"^sh: \d+: ([^ ]+): not found", command_missing),
    rule(r"^.*\.sh: \d+: ([^ ]+): not found", command_missing),
    rule(
        r"^.*: 1: cd: can't cd to (.*)",
        lambda m: DirectoryNonExistant(m.group(1)),
    ),
    rule(r"^/bin/bash: (.*): command not found", command_missing),
    rule(r"^bash: ([^ ]+): command not found", command_missing),
    rule(r"^env: ‘(.*)’: No such file or directory", interpreter_missing),
    rule(
        r"^/bin/bash: .*: (.*): bad interpreter: No such file or directory",
        interpreter_missing,
    ),
    # SH Errors
    rule(r"^.*: [0-9]+: exec: (.*): not found", command_missing),
    rule(r"^.*: [0-9]+: (.*): not found", command_missing),
    rule(r"^/usr/bin/env: [‘'](.*)['’]: No such file or directory", command_missing),
    rule(r"^make\[[0-9]+\]: (.*): Command not found", command_missing),
    rule(r"^make: (.*): Command not found", command_missing),
    rule(r"^make: (.*): No such file or directory", command_missing),
    rule(r"^xargs: (.*): No such file or directory", command_missing),
    rule(r"^make\[[0-9]+\]: ([^/ :]+): No such file or directory", command_missing),
    rule(r"^.*: failed to exec '(.*)': No such file or directory", command_missing),
    rule(r"^.*: failed to execute (.*): No such file or directory", command_missing),
    rule(r"^No package '([^']+)' found", pkg_config_missing),
    rule(r"^--\s* No package '([^']+)' found", pkg_config_missing),
    rule(
        r"^\-\- Please install Git, make sure it is in your path, and then try again.",
        lambda m: MissingCommand("git"),
    ),
    rule(
        r'^\+ERROR:  could not access file "(.*)": No such file or directory',
        lambda m: MissingPostgresExtension(m.group(1)),
    ),
    rule(
        r'^configure: error: (Can\'t|Cannot) find "(.*)" in your PATH.*',
        lambda m: MissingCommand(m.group(2)),
    ),
    rule(
        r"^configure: error: Cannot find (.*) in your system path",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r'^> Cannot run program "(.*)": error=2, No such file or directory',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^(.*) binary '(.*)' not available .*",
        lambda m: MissingCommand(m.group(2)),
    ),
    rule(
        r"^An error has occurred: FatalError: git failed\. Is it installed, and are you in a Git repository directory\?",
        lambda m: MissingCommand("git"),
    ),
    rule(
        "^Please install '(.*)' seperately and try again.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^> A problem occurred starting process 'command '(.*)''",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^vcver.scm.git.GitCommandError: 'git .*' returned an error code 127",
        lambda m: MissingCommand("git"),
    ),
    MultiLineConfigureErrorMatcher(),
    MultiLinePerlMissingModulesErrorMatcher(),
    MultiLineVignetteErrorMatcher(),
    rule(r"^configure: error: No package '([^']+)' found", pkg_config_missing),
    rule(
        r"^configure: error: (doxygen|asciidoc) is not available and maintainer mode is enabled",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^configure: error: Documentation enabled but rst2html not found.",
        lambda m: MissingCommand("rst2html"),
    ),
    rule(
        r"^cannot run pkg-config to check .* version at (.*) line [0-9]+\.",
        lambda m: MissingCommand("pkg-config"),
    ),
    rule(r"^Error: pkg-config not found!", lambda m: MissingCommand("pkg-config")),
    rule(
        r"^\*\*\* pkg-config (.*) or newer\. You can download pkg-config",
        lambda m: MissingVagueDependency("pkg-config", minimum_version=m.group(1)),
    ),
    # Tox
    rule(r"^ERROR: InterpreterNotFound: (.*)", lambda m: MissingCommand(m.group(1))),
    rule(r"^ERROR: unable to find python", lambda m: MissingCommand("python")),
    rule(r"^ ERROR: BLAS not found!", lambda m: MissingLibrary("blas")),
    AutoconfUnexpectedMacroMatcher(),
    rule(r"^\./configure: [0-9]+: \.: Illegal option .*"),
    rule(r"^Requested '(.*)' but version of ([^ ]+) is ([^ ]+)", pkg_config_missing),
    rule(r"^.*configure: error: Package requirements \((.*)\) were not met:", pkg_config_missing),
    rule(r"^configure: error: [a-z0-9_-]+-pkg-config (.*) couldn't be found", pkg_config_missing),
    rule(r'^configure: error: C preprocessor "/lib/cpp" fails sanity check'),
    rule(
        r"^configure: error: .*\. Please install (bison|flex)",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"^configure: error: No C\# compiler found. You need to install either mono \(>=(.*)\) or \.Net",
        lambda m: MissingCSharpCompiler(),
    ),
    rule(r"^configure: error: No C\# compiler found", lambda m: MissingCSharpCompiler()),
    rule(r"^error: can't find Rust compiler", lambda m: MissingRustCompiler()),
    rule(r"^Found no assembler", lambda m: MissingAssembler()),
    rule(
        r"^error: failed to get `(.*)` as a dependency of package `(.*)`",
        lambda m: MissingCargoCrate.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: (.*) requires libkqueue \(or system kqueue\). .*",
        lambda m: MissingPkgConfig.simple("libkqueue"),
    ),
    rule(
        r"^Did not find pkg-config by name 'pkg-config'",
        lambda m: MissingCommand("pkg-config"),
    ),
    rule(
        r"^configure: error: Required (.*) binary is missing. Please install (.*).",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r'.*meson.build:([0-9]+):([0-9]+): ERROR: Dependency "(.*)" not found',
        lambda m: MissingPkgConfig.simple(m.group(3)),
    ),
    rule(
        r".*meson.build:([0-9]+):([0-9]+): ERROR: Problem encountered: No XSLT processor found, .*",
        lambda m: MissingVagueDependency.simple("xsltproc"),
    ),
    rule(
        r".*meson.build:([0-9]+):([0-9]+): Unknown compiler\(s\): \[\['(.*)'.*\]",
        lambda m: MissingCommand(m.group(3)),
    ),
    rule(
        '.*meson.build:([0-9]+):([0-9]+): ERROR: python3 "(.*)" missing',
        lambda m: MissingPythonModule(m.group(3), 3, None),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: Program '(.*)' not found",
        lambda m: MissingCommand(m.group(3)),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: Git program not found, .*",
        lambda m: MissingCommand("git"),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: C header '(.*)' not found",
        lambda m: MissingCHeader(m.group(3)),
    ),
    rule(
        r"^configure: error: (.+\.h) could not be found\. Please set CPPFLAGS\.",
        lambda m: MissingCHeader(m.group(1)),
    ),
    rule(
        r".*meson.build:([0-9]+):([0-9]+): ERROR: Unknown compiler\(s\): \['(.*)'\]",
        lambda m: MissingCommand(m.group(3)),
    ),
    rule(
        '.*meson.build:([0-9]+):([0-9]+): ERROR: Dependency "(.*)" not found, tried pkgconfig',
        lambda m: MissingPkgConfig.simple(m.group(3)),
    ),
    rule(
        r'.*meson.build:([0-9]+):([0-9]+): ERROR: Could not execute Vala compiler "(.*)"',
        lambda m: MissingCommand(m.group(3)),
    ),
    rule(
        r".*meson.build:([0-9]+):([0-9]+): ERROR: python3 is missing modules: (.*)",
        # reference uses group 1 here (likely upstream bug) — kept for parity
        lambda m: MissingPythonModule.simple(m.group(1)),
    ),
    rule(
        r".*meson.build:([0-9]+):([0-9]+): ERROR: Invalid version of dependency, need '([^']+)' \['>=\s*([^']+)'\] found '([^']+)'\.",
        lambda m: MissingPkgConfig(m.group(3), m.group(4)),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: C shared or static library '(.*)' not found",
        lambda m: MissingLibrary(m.group(3)),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: C\\+\\++ shared or static library '(.*)' not found",
        lambda m: MissingLibrary(m.group(3)),
    ),
    rule(
        ".*meson.build:([0-9]+):([0-9]+): ERROR: Pkg-config binary for machine .* not found. Giving up.",
        lambda m: MissingCommand("pkg-config"),
    ),
    rule(
        ".*meson.build([0-9]+):([0-9]+): ERROR: Problem encountered: (.*) require (.*) >= (.*), (.*) which were not found.",
        lambda m: MissingVagueDependency(m.group(4), minimum_version=m.group(5)),
    ),
    rule(
        ".*meson.build([0-9]+):([0-9]+): ERROR: Problem encountered: (.*) is required to .*",
        # reference uses m.get(4) (src/common.rs:872) which would panic when
        # this rule fires — there are only 3 groups; group 3 is the evident
        # intent (the dependency name)
        lambda m: MissingVagueDependency.simple(m.group(3)),
    ),
    rule(
        r"^ERROR: (.*) is not installed\. Install at least (.*) version (.+) to continue\.",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(3)),
    ),
    rule(
        r"^configure: error: Library requirements \((.*)\) not met\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: (.*) is missing -- (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: Cannot find (.*), check (.*)",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    rule(
        r"^configure: error: \*\*\* Unable to find (.* library)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: unable to find (.*)\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: Perl Module (.*) not available",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"(.*) was not found in your path\. Please install (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: Please install (.*) >= (.*)",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"^configure: error: the required package (.*) is not installed",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: \*\*\* (.*) >= (.*) not installed.*",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"^configure: error: you should install (.*) first",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: cannot locate (.*) >= (.*)",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"^configure: error: !!! Please install (.*) !!!",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"^configure: error: (.*) version (.*) or higher is required",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"^configure.(ac|in):[0-9]+: error: libtool version (.*) or higher is required",
        # reference uses m.get(2)/m.get(3) (src/common.rs:919-921) but the
        # pattern has 2 groups — get(3) would panic when fired; the evident
        # intent (cf. the sibling Autoconf rule, src/common.rs:2156-2163) is
        # name "libtool", minimum_version = the captured version
        lambda m: MissingVagueDependency("libtool", minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: ([^ ]+) ([^ ]+) or better is required.*",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: ([^ ]+) ([^ ]+) or greater is required.*",
        lambda m: MissingVagueDependency(m.group(1), minimum_version=m.group(2)),
    ),
    rule(
        r"configure: error: ([^ ]+) or greater is required.*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) library is required",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) library is not installed\.",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"configure: error: OpenSSL developer library 'libssl-dev' or 'openssl-devel' not installed; cannot continue.",
        lambda m: MissingLibrary("ssl"),
    ),
    rule(
        r"configure: error: \*\*\* Cannot find (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) is required to compile .*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\s*You must have (.*) installed to compile .*\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"You must install (.*) to compile (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\*\*\* No (.*) found, please in(s?)tall it \*\*\*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) required, please in(s?)tall it",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\*\* ERROR \*\* : You must have `(.*)' installed on your system\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"autogen\.sh: ERROR: You must have `(.*)' installed to compile this package\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"autogen\.sh: You must have (.*) installed\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\s*Error! You need to have (.*) installed\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"(configure: error|\*\*Error\*\*): You must have (.*) installed.*",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"configure: error: (.*) is required for building this package.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) is required to build (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) is required",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) is required for (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: \*\*\* (.*) is required\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: (.*) is required, please get it from (.*)",
        lambda m: MissingVagueDependency(m.group(1), url=m.group(2)),
    ),
    rule(
        r".*meson.build:\d+:\d+: ERROR: Assert failed: (.*) support explicitly required, but (.*) not found",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: .*, (lib[^ ]+) is required",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"dh: Unknown sequence --(.*) \(options should not come before the sequence\)",
        lambda m: DhWithOrderIncorrect(),
    ),
    rule(
        r"(dh: |dh_.*: error: )Compatibility levels before ([0-9]+) are no longer supported \(level ([0-9]+) requested\)",
        lambda m: UnsupportedDebhelperCompatLevel(int(m.group(2)), int(m.group(3))),
    ),
    rule(r"\{standard input\}: Error: (.*)"),
    rule(r"dh: Unknown sequence (.*) \(choose from: .*\)"),
    rule(r".*: .*: No space left on device", lambda m: NoSpaceOnDevice()),
    rule(r"^No space left on device.", lambda m: NoSpaceOnDevice()),
    rule(
        r".*Can't locate (.*).pm in @INC \(you may need to install the (.*) module\) \(@INC contains: (.*)\) at .* line [0-9]+\.",
        lambda m: MissingPerlModule(
            f"{m.group(1)}.pm", m.group(2), m.group(3).split(" "), None
        ),
    ),
    rule(
        r".*Can't locate (.*).pm in @INC \(you may need to install the (.*) module\) \(@INC contains: (.*)\)\.",
        lambda m: MissingPerlModule(
            f"{m.group(1)}.pm", m.group(2), m.group(3).split(" "), None
        ),
    ),
    rule(
        r"\[DynamicPrereqs\] Can't locate (.*) at inline delegation in .*",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
]
