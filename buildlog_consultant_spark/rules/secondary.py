"""Secondary matchers — patterns that hint at an error but aren't the error
itself (reference: /root/reference/src/common.rs:3021-3372). Ordered,
broad→broader; applied forward over the last-N window by
find_secondary_build_failure (src/common.rs:3385-3434).

Two patterns use lookahead ((?!…), src/common.rs:3093 and :3207) — Python re
supports these natively (the reference needs fancy_regex for them).
"""

from __future__ import annotations

import re

from ..core.matchers import gate_token, required_literal, trie_regex

_PATTERNS = [
    r"E: pybuild pybuild:[0-9]+: test: plugin [^ ]+ failed with:",
    r"[^:]+: error: (.*)",
    r"[^:]+:[0-9]+: error: (.*)",
    r"[^:]+:[0-9]+:[0-9]+: error: (.*)",
    r"error TS[0-9]+: (.*)",
    r"mount: .*: mount failed: Operation not permitted\.",
    r"  [0-9]+:[0-9]+\s+error\s+.+",
    r"fontmake: Error: In '(.*)': (.*)",
    r"#   Failed test at t\/.*\.t line [0-9]+\.",
    r"Gradle build daemon disappeared unexpectedly \(it may have been killed or may have crashed\)",
    # ocaml
    r"\*\*\* omake error:",
    r".*ocamlc.*: OCam has been configured with -force-safe-string: -unsafe-string is not available\.",
    # latex
    r"\! LaTeX Error: .*",
    r"Killed",
    # Java
    r'Exception in thread "(.*)" (.*): (.*);',
    r"error: Unrecognized option: \'.*\'",
    r"Segmentation fault",
    r"\[ERROR\] (.*\.java):\[[0-9]+,[0-9]+\] (.*)",
    r"make: \*\*\* No targets specified and no makefile found\.  Stop\.",
    r"make\[[0-9]+\]: \*\*\* No targets specified and no makefile found\.  Stop\.",
    r"make\[[0-9]+\]: (.*): No such file or directory",
    r"make\[[0-9]+\]: \*\*\* \[.*:[0-9]+: .*\] Segmentation fault",
    r".*:[0-9]+: \*\*\* empty variable name.  Stop.",
    r"error: can't copy '(.*)': doesn't exist or not a regular file",
    r"error: ([0-9]+) test executed, ([0-9]+) fatal tests failed, ",
    r"([0-9]+) nonfatal test failed\.",
    r".*\.rst:toctree contains ref to nonexisting file \'.*\'",
    r".*\.rst:[0-9]+:term not in glossary: .*",
    r"Try adding AC_PREREQ\(\[(.*)\]\) to your configure\.ac\.",
    # Erlang
    r"  (.*_test): (.+)\.\.\.\*failed\*",
    r"(.*\.erl):[0-9]+:[0-9]+: erlang:.*",
    # Clojure
    r"Could not locate (.*) or (.*) on classpath\.",
    # QMake
    r"Project ERROR: .*",
    # pdflatex
    r"\!  ==> Fatal error occurred, no output PDF file produced\!",
    # latex
    r"\! Undefined control sequence\.",
    r"\! Emergency stop\.",
    r"\!pdfTeX error: pdflatex: fwrite\(\) failed",
    # inkscape
    r"Unknown option (?!.*ignoring.*)",
    # CTest
    r"not ok [0-9]+ .*",
    r"Errors while running CTest",
    r"dh_auto_install: error: .*",
    r"dh_quilt_patch: error: (.*)",
    r"dh.*: Aborting due to earlier error",
    r"dh.*: unknown option or error during option parsing; aborting",
    r"Could not import extension .* \(exception: .*\)",
    r"configure.ac:[0-9]+: error: (.*)",
    r"Reconfigure the source tree (via './config' or 'perl Configure'), please.",
    r"dwz: Too few files for multifile optimization",
    r"\[CJM/MatchManifest\] Aborted because of MANIFEST mismatch",
    r"dh_dwz: dwz -q -- .* returned exit code [0-9]+",
    r"help2man: can\'t get `-?-help\' info from .*",
    r"[^:]+: line [0-9]+:\s+[0-9]+ Segmentation fault.*",
    r"dpkg-gencontrol: error: (.*)",
    r".*:[0-9]+:[0-9]+: (error|ERROR): (.*)",
    r".*[.]+FAILED .*",
    r"FAIL: (.*)",
    r"FAIL\!  : (.*)",
    r"\s*FAIL (.*) \(.*\)",
    r"FAIL\s+(.*) \[.*\] ?",
    r"([0-9]+)% tests passed, ([0-9]+) tests failed out of ([0-9]+)",
    r"TEST FAILURE",
    r"make\[[0-9]+\]: \*\*\* \[.*\] Error [0-9]+",
    r"make\[[0-9]+\]: \*\*\* \[.*\] Aborted",
    r"exit code=[0-9]+: .*",
    r"chmod: cannot access \'.*\': .*",
    r"dh_autoreconf: autoreconf .* returned exit code [0-9]+",
    r"make: \*\*\* \[.*\] Error [0-9]+",
    r".*:[0-9]+: \*\*\* missing separator\.  Stop\.",
    r"[0-9]+ tests: [0-9]+ ok, [0-9]+ failure\(s\), [0-9]+ test\(s\) skipped",
    r"\*\*Error:\*\* (.*)",
    r"^Error: (.*)",
    r"Failed [0-9]+ tests? out of [0-9]+, [0-9.]+% okay.",
    r"Failed [0-9]+\/[0-9]+ test programs. [0-9]+/[0-9]+ subtests failed.",
    r"Original error was: (.*)",
    r"-- Error \(.*\.R:[0-9]+:[0-9]+\): \(.*\) [-]*",
    r"^Error \[ERR_.*\]: .*",
    r"^FAILED \(.*\)",
    r"FAILED .*",
    # Random Python errors
    "^(E  +)?(SyntaxError|TypeError|ValueError|AttributeError|NameError|django.core.exceptions..*|RuntimeError|subprocess.CalledProcessError|testtools.matchers._impl.MismatchError|PermissionError|IndexError|TypeError|AssertionError|IOError|ImportError|SerialException|OSError|qtawesome.iconic_font.FontError|redis.exceptions.ConnectionError|builtins.OverflowError|ArgumentError|httptools.parser.errors.HttpParserInvalidURLError|HypothesisException|SSLError|KeyError|Exception|rnc2rng.parser.ParseError|pkg_resources.UnknownExtra|tarfile.ReadError|numpydoc.docscrape.ParseError|distutils.errors.DistutilsOptionError|datalad.support.exceptions.IncompleteResultsError|AssertionError|Cython.Compiler.Errors.CompileError|UnicodeDecodeError|UnicodeEncodeError): .*",
    # Rust
    r"error\[E[0-9]+\]: .*",
    "^E   DeprecationWarning: .*",
    "^E       fixture '(.*)' not found",
    # Rake
    r"[0-9]+ runs, [0-9]+ assertions, [0-9]+ failures, [0-9]+ errors, [0-9]+ skips",
    # Node
    r"# failed [0-9]+ of [0-9]+ tests",
    # Pytest
    r"(.*).py:[0-9]+: AssertionError",
    r"============================ no tests ran in ([0-9.]+)s =============================",
    # Perl
    r"  Failed tests:  [0-9-]+",
    r"Failed (.*\.t): output changed",
    # Go
    r"no packages to test",
    "FAIL\t(.*)\t[0-9.]+s",
    r".*.go:[0-9]+:[0-9]+: (?!note:).*",
    r"can\'t load package: package \.: no Go files in /<<PKGBUILDDIR>>/(.*)",
    # Ld
    r"\/usr\/bin\/ld: cannot open output file (.*): No such file or directory",
    r"configure: error: (.+)",
    r"config.status: error: (.*)",
    r"E: Build killed with signal TERM after ([0-9]+) minutes of inactivity",
    r"    \[javac\] [^: ]+:[0-9]+: error: (.*)",
    r"1\) TestChannelFeature: ([^:]+):([0-9]+): assert failed",
    r"cp: target \'(.*)\' is not a directory",
    r"cp: cannot create regular file \'(.*)\': No such file or directory",
    r"couldn\'t determine home directory at (.*)",
    r"ln: failed to create symbolic link \'(.*)\': File exists",
    r"ln: failed to create symbolic link \'(.*)\': No such file or directory",
    r"ln: failed to create symbolic link \'(.*)\': Permission denied",
    r"ln: invalid option -- .*",
    r"mkdir: cannot create directory [‘'](.*)['’]: No such file or directory",
    r"mkdir: cannot create directory [‘'](.*)['’]: File exists",
    r"mkdir: missing operand",
    r"rmdir: failed to remove '.*': No such file or directory",
    r"Fatal error: .*",
    "Fatal Error: (.*)",
    r"Alert: (.*)",
    r'ERROR: Test "(.*)" failed. Exiting.',
    # scons
    r"ERROR: test\(s\) failed in (.*)",
    r"./configure: line [0-9]+: syntax error near unexpected token `.*\'",
    r"scons: \*\*\* \[.*\] ValueError : unsupported pickle protocol: .*",
    # yarn
    r"ERROR: There are no scenarios; must have at least one.",
    # perl
    r"Execution of (.*) aborted due to compilation errors.",
    # Mocha
    r"     AssertionError \[ERR_ASSERTION\]: Missing expected exception.",
    # lt (C++)
    r".*: .*:[0-9]+: .*: Assertion `.*\' failed.",
    r"(.*).xml: FAILED:",
    r" BROKEN .*",
    r"failed: [0-9]+-.*",
    # ninja
    r"ninja: build stopped: subcommand failed.",
    r".*\.s:[0-9]+: Error: .*",
    # rollup
    r"\[\!\] Error: Unexpected token",
    # glib
    r"\(.*:[0-9]+\): [a-zA-Z0-9]+-CRITICAL \*\*: [0-9:.]+: .*",
    r"tar: option requires an argument -- \'.\'",
    r"tar: .*: Cannot stat: No such file or directory",
    r"tar: .*: Cannot open: No such file or directory",
    # rsvg-convert
    r"Could not render file (.*.svg)",
    # pybuild tests
    r"ERROR: file not found: (.*)",
    # msgfmt
    r"/usr/bin/msgfmt: found [0-9]+ fatal errors",
    # Docker
    r"Cannot connect to the Docker daemon at unix:///var/run/docker.sock. Is the docker daemon running\?",
    r"dh_makeshlibs: failing due to earlier errors",
    # Ruby
    r"([^:]+)\.rb:[0-9]+:in `([^\'])+\': (.*) \((.*)\)",
    r".*: \*\*\* ERROR: There where errors/warnings in server logs after running test cases.",
    r"Errno::EEXIST: File exists @ dir_s_mkdir - .*",
    r"Test environment was found to be incomplete at configuration time,",
    r"libtool:   error: cannot find the library \'(.*)\' or unhandled argument \'(.*)\'",
    r"npm ERR\! (.*)",
    r"install: failed to access \'(.*)\': (.*)",
    r"MSBUILD: error MSBUILD[0-9]+: Project file \'(.*)\' not found.",
    # Anchored `E: ` (src/common.rs:3324-3328)
    r"^E: (.*)",
    r"(.*)\(([0-9]+),([0-9]+)\): Error: .*",
    # C #
    r"(.*)\.cs\([0-9]+,[0-9]+\): error CS[0-9]+: .*",
    r".*Segmentation fault.*",
    r"a2x: ERROR: (.*) returned non-zero exit status ([0-9]+)",
    r"-- Configuring incomplete, errors occurred\!",
    r'Error opening link script "(.*)"',
    r"cc: error: (.*)",
    r"\[ERROR\] .*",
    r"dh_auto_(test|build): error: (.*)",
    r"tar: This does not look like a tar archive",
    r"\[DZ\] no (name|version) was ever set",
    r"\[Runtime\] No -phase or -relationship specified at .* line [0-9]+\.",
    r"diff: (.*): No such file or directory",
    r"gpg: signing failed: .*",
    # mh_install
    r"Cannot find the jar to install: (.*)",
    r"ERROR: .*",
    r"> error: (.*)",
    r"error: (.*)",
    r"(.*\.hs):[0-9]+:[0-9]+: error:",
    r"go1: internal compiler error: .*",
]

SECONDARY_MATCHERS: list[re.Pattern] = [re.compile(p) for p in _PATTERNS]

# literal-anchor gate for the secondary scan (same soundness argument as
# MatcherGroup's — see core/matchers.py)
# manual anchor-sets for patterns whose required literals live inside groups
# (invisible to the conservative extractor); any-of semantics
_ANCHOR_OVERRIDES: dict[str, tuple] = {
    r".*:[0-9]+:[0-9]+: (error|ERROR): (.*)": ("error: ", "ERROR: "),
    # the Python-exception family: every alternative contains one of these
    next(p for p in _PATTERNS if "SyntaxError" in p): (
        "Error", "Exception", "django.core.exceptions.", "UnknownExtra",
    ),
}

SECONDARY_NO_ANCHOR: list[int] = []
SECONDARY_ANCHOR_OF: dict[int, tuple] = {}
SECONDARY_TOKEN_RULES: dict[str, list[int]] = {}
for _i, (_p, _rx) in enumerate(zip(_PATTERNS, SECONDARY_MATCHERS)):
    _alts = _ANCHOR_OVERRIDES.get(_p)
    if _alts is None:
        _a = required_literal(_p)
        _alts = (_a,) if _a else None
    if _alts:
        SECONDARY_ANCHOR_OF[_i] = _alts
        for _a in _alts:
            SECONDARY_TOKEN_RULES.setdefault(gate_token(_a), []).append(_i)
    else:
        SECONDARY_NO_ANCHOR.append(_i)
SECONDARY_GATE = (
    re.compile(trie_regex(sorted(SECONDARY_TOKEN_RULES)))
    if SECONDARY_TOKEN_RULES
    else None
)
