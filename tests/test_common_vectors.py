"""Matcher test vectors ported from the reference's inline tests
(/root/reference/src/common.rs:3530-5928). assert_match semantics mirror
src/common.rs:3545-3566: match line content, 1-based lineno, and Problem
equality on (kind, details)."""

import pytest

from buildlog_consultant_spark.core import problems as P
from buildlog_consultant_spark.engine.core import find_build_failure_description


def assert_match(lines, lineno, expected):
    match, actual = find_build_failure_description(lines)
    assert match is not None, f"no match for {lines!r}"
    assert match.line == lines[lineno - 1]
    assert match.lineno == lineno
    if expected is not None:
        assert actual is not None, f"expected {expected!r}, got no problem"
        assert actual.kind == expected.kind, (actual.kind, expected.kind)
        assert actual.details == expected.details, (actual.details, expected.details)
    else:
        assert actual is None, f"expected no problem, got {actual!r}"


def assert_just_match(lines, lineno):
    match, actual = find_build_failure_description(lines)
    assert actual is None
    if match is not None:
        assert match.line == lines[lineno - 1]
        assert match.lineno == lineno


CASES = [
    # test_make_missing_rule (common.rs:3568)
    (
        ["make[1]: *** No rule to make target 'nno.autopgen.bin', needed by 'dan-nno.autopgen.bin'.  Stop."],
        1,
        lambda: P.MissingMakeTarget("nno.autopgen.bin", "dan-nno.autopgen.bin"),
    ),
    (
        ["make[1]: *** No rule to make target '/usr/share/blah/blah', needed by 'dan-nno.autopgen.bin'.  Stop."],
        1,
        lambda: P.MissingMakeTarget("/usr/share/blah/blah", "dan-nno.autopgen.bin"),
    ),
    (
        ["debian/rules:4: /usr/share/openstack-pkg-tools/pkgos.make: No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/share/openstack-pkg-tools/pkgos.make"),
    ),
    # test_git_identity (common.rs:3594)
    (
        ["fatal: unable to auto-detect email address (got 'jenkins@osuosl167-amd64.(none)')"],
        1,
        lambda: P.MissingGitIdentity(),
    ),
    # test_ioerror (common.rs:3605)
    (
        ["E   IOError: [Errno 2] No such file or directory: '/usr/lib/python2.7/poly1305/rfc7539.txt'"],
        1,
        lambda: P.MissingFile("/usr/lib/python2.7/poly1305/rfc7539.txt"),
    ),
    # test_vignette (common.rs:3616)
    (
        [
            "Error: processing vignette 'uroot-intro.Rnw' failed with diagnostics:",
            "pdflatex is not available",
        ],
        2,
        lambda: P.MissingVagueDependency.simple("pdflatex"),
    ),
    # test_upstart_file_present (common.rs:3628)
    (
        ["dh_installinit: upstart jobs are no longer supported!  Please remove debian/sddm.upstart and check if you need to add a conffile removal"],
        1,
        lambda: P.UpstartFilePresent("debian/sddm.upstart"),
    ),
    # test_missing_go_mod_file (common.rs:3639)
    (
        ["go: go.mod file not found in current directory or any parent directory; see 'go help modules'"],
        1,
        lambda: P.MissingGoModFile(),
    ),
    (
        ["ModuleNotFoundError: No module named 'numpy'"],
        1,
        lambda: P.MissingPythonModule("numpy", 3, None),
    ),
    (
        ["E   ModuleNotFoundError: No module named 'click'"],
        1,
        lambda: P.MissingPythonModule("click", 3, None),
    ),
    (
        ["/bin/sh: 1: uvcdynctrl: not found"],
        1,
        lambda: P.MissingCommand("uvcdynctrl"),
    ),
    (
        ["foo.c:1:10: fatal error: bar.h: No such file or directory"],
        1,
        lambda: P.MissingCHeader("bar.h"),
    ),
    (
        ["configure: error: Package requirements (libffi >= 3.0.0) were not met:"],
        1,
        lambda: P.MissingPkgConfig("libffi", "3.0.0"),
    ),
    (
        ["No package 'glib-2.0' found"],
        1,
        lambda: P.MissingPkgConfig("glib-2.0"),
    ),
    (
        ["Could not find gem 'rspec (>= 3.0)', which is required by gem 'top'."],
        1,
        lambda: P.MissingRubyGem("rspec", "3.0"),
    ),
    (
        ["error: failed to select a version for the requirement `serde ^1.0`"],
        1,
        lambda: P.MissingCargoCrate("serde", "^1.0"),
    ),
    (
        ["Caused by: java.lang.ClassNotFoundException: org.apache.Thing"],
        1,
        lambda: P.MissingJavaClass("org.apache.Thing"),
    ),
    (
        ["  namespace 'rlang' 0.4.10 is being loaded, but >= 0.4.11 is required"],
        1,
        lambda: P.MissingRPackage("rlang", "0.4.11"),
    ),
    (
        ["/usr/bin/ld: cannot find -lcrypto"],
        1,
        lambda: P.MissingLibrary("crypto"),
    ),
    (
        ["OSError: [Errno 28] No space left on device"],
        1,
        lambda: P.NoSpaceOnDevice(),
    ),
    (
        ["E: Build killed with signal TERM after 150 minutes of inactivity"],
        1,
        lambda: P.InactiveKilled(150),
    ),
    (
        ["ERROR: JAVA_HOME is not set and no 'java' command could be found in your PATH."],
        1,
        lambda: P.MissingJRE(),
    ),
    # backward scan priority: latest error wins
    (
        [
            "ModuleNotFoundError: No module named 'first'",
            "filler",
            "ModuleNotFoundError: No module named 'second'",
        ],
        3,
        lambda: P.MissingPythonModule("second", 3, None),
    ),
    # Haskell block (common.rs:200-235)
    (
        [
            "Setup: Encountered missing or private dependencies:",
            "    base >=4.7 && <5, bytestring,",
            "",
        ],
        2,
        lambda: P.MissingHaskellDependencies(["base >=4.7 && <5"]),
    ),
    # Perl 3-liner (common.rs:317-354)
    (
        [
            "# The following modules are not available.",
            "# `perl Makefile.PL | cpanm` will install them:",
            "  Moose",
        ],
        3,
        lambda: P.MissingPerlModule(module="Moose"),
    ),
    # cmake paragraph
    (
        [
            "CMake Error at CMakeLists.txt:5 (find_package):",
            "  Could NOT find Boost (missing: system filesystem)",
            "",
        ],
        2,
        lambda: P.MissingCMakeComponents("Boost", ["system", "filesystem"]),
    ),
    # Perl @INC
    (
        ["Can't locate Module/Build.pm in @INC (you may need to install the Module::Build module) (@INC contains: /a /b) at Makefile.PL line 6."],
        1,
        lambda: P.MissingPerlModule("Module/Build.pm", "Module::Build", ["/a", "/b"], None),
    ),
    # pkg-config version constraint via helper (tab split)
    (
        ["Requested 'vapigen >= 0.22' but version of vapigen is 0.20"],
        1,
        lambda: P.MissingPkgConfig("vapigen", "0.22"),
    ),
    # ---- second tranche, ported from common.rs:3649-4165 ----
    (
        ["ExecJS::RuntimeUnavailable: Could not find a JavaScript runtime. See https://github.com/rails/execjs for a list of available runtimes."],
        1,
        lambda: P.MissingJavaScriptRuntime(),
    ),
    (
        ["debian/components/build: 19: cd: can't cd to rollup-plugin"],
        1,
        lambda: P.DirectoryNonExistant("rollup-plugin"),
    ),
    (
        ["   > Cannot find '.git' directory"],
        1,
        lambda: P.VcsControlDirectoryNeeded(["git"]),
    ),
    (
        ["Sprockets::FileNotFound: couldn't find file 'activestorage' with type 'application/javascript'"],
        1,
        lambda: P.MissingSprocketsFile("activestorage", "application/javascript"),
    ),
    (
        ["g++: error: /usr/lib/x86_64-linux-gnu/libGL.so: No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/lib/x86_64-linux-gnu/libGL.so"),
    ),
    (
        ["/<<PKGBUILDDIR>>/build.xml:59: /<<PKGBUILDDIR>>/lib does not exist."],
        1,
        lambda: P.MissingBuildFile("lib"),
    ),
    (
        ["  vignette builder 'R.rsp' not found"],
        1,
        lambda: P.MissingRPackage.simple("R.rsp"),
    ),
    (
        ["libtoolize:   error: '/usr/share/aclocal/ltdl.m4' does not exist."],
        1,
        lambda: P.MissingFile("/usr/share/aclocal/ltdl.m4"),
    ),
    (
        ["Error: Error: ENOENT: no such file or directory, open '/usr/lib/nodejs/requirejs/text.js'"],
        1,
        lambda: P.MissingFile("/usr/lib/nodejs/requirejs/text.js"),
    ),
    (
        ["vcversioner: ['git', '--git-dir', '/build/tmp0tlam4pe/pyee/.git', 'describe', '--tags', '--long'] failed and '/build/tmp0tlam4pe/pyee/version.txt' isn't present."],
        1,
        lambda: P.MissingVcVersionerVersion(),
    ),
    (
        ["python3.7: can't open file '/usr/bin/blah.py': [Errno 2] No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/bin/blah.py"),
    ),
    (
        ["python3.7: can't open file 'setup.py': [Errno 2] No such file or directory"],
        1,
        lambda: P.MissingBuildFile("setup.py"),
    ),
    (
        ["E           FileNotFoundError: [Errno 2] No such file or directory: '/usr/share/firmware-microbit-micropython/firmware.hex'"],
        1,
        lambda: P.MissingFile("/usr/share/firmware-microbit-micropython/firmware.hex"),
    ),
    (
        ["configure: error: Please install gnu flex from http://www.gnu.org/software/flex/"],
        1,
        lambda: P.MissingVagueDependency("gnu flex", url="http://www.gnu.org/software/flex/"),
    ),
    (
        ["RuntimeError: cython is missing"],
        1,
        lambda: P.MissingVagueDependency.simple("cython"),
    ),
    (
        [
            "configure: error:",
            "",
            "        Unable to find the Multi Emulator Super System (MESS).",
        ],
        3,
        lambda: P.MissingVagueDependency.simple("the Multi Emulator Super System (MESS)"),
    ),
    (
        ["configure: error: libwandio 4.0.0 or better is required to compile this version of libtrace. If you have installed libwandio in a non-standard location please use LDFLAGS to specify the location of the library. WANDIO can be obtained from http://research.wand.net.nz/software/libwandio.php"],
        1,
        lambda: P.MissingVagueDependency("libwandio", minimum_version="4.0.0"),
    ),
    (
        ["configure: error: libpcap0.8 or greater is required to compile libtrace. If you have installed it in a non-standard location please use LDFLAGS to specify the location of the library"],
        1,
        lambda: P.MissingVagueDependency.simple("libpcap0.8"),
    ),
    (
        ["Error: Please install xml2 package"],
        1,
        lambda: P.MissingVagueDependency.simple("xml2"),
    ),
    (
        ["*** error: gettext infrastructure mismatch: using a Makefile.in.in from gettext version 0.19 but the autoconf macros are from gettext version 0.20"],
        1,
        lambda: P.MismatchGettextVersions("0.19", "0.20"),
    ),
    (
        ["configure: error: *** No X11! Install X-Windows development headers/libraries! ***"],
        1,
        lambda: P.MissingX11(),
    ),
    (
        ["/bin/bash: /usr/bin/rst2man: /usr/bin/python: bad interpreter: No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/bin/python"),
    ),
    (
        [r'dh_installdocs: Cannot find (any matches for) "README.txt" (tried in ., debian/tmp)'],
        1,
        lambda: P.DebhelperPatternNotFound("README.txt", "installdocs", [".", "debian/tmp"]),
    ),
    (
        ["dh_autoreconf: debhelper compat level specified both in debian/compat and via build-dependency on debhelper-compat"],
        1,
        lambda: P.DuplicateDHCompatLevel("dh_autoreconf"),
    ),
    (
        ["dh_clean: Please specify the compatibility level in debian/compat"],
        1,
        lambda: P.MissingDHCompatLevel("dh_clean"),
    ),
    (
        ["dh_clean: error: Compatibility levels before 7 are no longer supported (level 5 requested)"],
        1,
        lambda: P.UnsupportedDebhelperCompatLevel(7, 5),
    ),
    (
        ["meson.build:13:0: ERROR: Git program not found."],
        1,
        lambda: P.MissingCommand("git"),
    ),
    (
        ["meson.build:85:0: ERROR: C++ shared or static library 'vulkan-1' not found"],
        1,
        lambda: P.MissingLibrary("vulkan-1"),
    ),
    (
        ['Error: Library "camlp-streams" not found.'],
        1,
        lambda: P.MissingOCamlPackage("camlp-streams"),
    ),
    (
        ["meson.build:1:0: ERROR: Meson version is 0.49.2 but project requires >=0.50"],
        1,
        lambda: P.MissingVagueDependency("meson", minimum_version="0.50", current_version="0.49.2"),
    ),
    (
        ["../meson.build:1:0: ERROR: Meson version is 0.49.2 but project requires >=0.50"],
        1,
        lambda: P.MissingVagueDependency("meson", minimum_version="0.50", current_version="0.49.2"),
    ),
    (
        ["Error: debian/control needs updating from debian/control.in. Run 'pg_buildext updatecontrol'."],
        1,
        lambda: P.NeedPgBuildExtUpdateControl("debian/control", "debian/control.in"),
    ),
    (
        ["configure.ac:13: error: Autoconf version 2.71 or higher is required"],
        1,
        lambda: P.MissingVagueDependency("autoconf", minimum_version="2.71"),
    ),
    (
        ["configure: error: libetpan 0.57 not found"],
        1,
        lambda: P.MissingVagueDependency("libetpan", minimum_version="0.57"),
    ),
    (
        ["config.status: error: cannot find input file: `po/Makefile.in.in'"],
        1,
        lambda: P.MissingConfigStatusInput("po/Makefile.in.in"),
    ),
    (
        ["ERROR: JAVA_HOME is set to an invalid directory: /usr/lib/jvm/default-java/"],
        1,
        lambda: P.MissingJVM(),
    ),
    (
        ["cp: cannot stat '/<<PKGBUILDDIR>>/debian/patches/lshw-gtk.desktop': No such file or directory"],
        1,
        lambda: P.MissingBuildFile("debian/patches/lshw-gtk.desktop"),
    ),
    (
        ["/bin/bash: idna-tables-properties.csv: No such file or directory"],
        1,
        lambda: P.MissingBuildFile("idna-tables-properties.csv"),
    ),
    (
        ["automake: error: cannot open < gtk-doc.make: No such file or directory"],
        1,
        lambda: P.MissingAutomakeInput("gtk-doc.make"),
    ),
    # dh addon load (multi-line context, common.rs:3720-3740)
    (
        [
            "   dh_auto_clean -O--buildsystem=pybuild",
            "E: Please add appropriate interpreter package to Build-Depends, see pybuild(1) for details.this: $VAR1 = bless( {",
            "     'py3vers' => '3.8',",
        ],
        2,
        lambda: P.DhAddonLoadFailure("pybuild", "Debian/Debhelper/Buildsystem/pybuild.pm"),
    ),
    # cmake legacy forward pass (common.rs:4064-4073)
    (
        [
            "  Could NOT find Git (missing: GIT_EXECUTABLE)",
            "dh_auto_configure: cd obj-x86_64-linux-gnu && cmake with args",
        ],
        1,
        lambda: P.MissingCommand("git"),
    ),
    # ---- third tranche, ported from common.rs:4167-4704 ----
    (
        ["configure.in:1802: error: possibly undefined macro: AC_CHECK_CCA"],
        1,
        lambda: P.MissingAutoconfMacro("AC_CHECK_CCA", False),
    ),
    (
        ["./configure: line 12569: PKG_PROG_PKG_CONFIG: command not found"],
        1,
        lambda: P.MissingAutoconfMacro("PKG_PROG_PKG_CONFIG", False),
    ),
    (
        [
            "checking for gawk... (cached) mawk",
            "./configure: line 2368: syntax error near unexpected token `APERTIUM,'",
            "./configure: line 2368: `PKG_CHECK_MODULES(APERTIUM, apertium >= 3.7.1)'",
        ],
        3,
        lambda: P.MissingAutoconfMacro("PKG_CHECK_MODULES", True),
    ),
    (
        [
            "checking for libexif to use... ./configure: line 15968: syntax error near unexpected token `LIBEXIF,libexif'",
            "./configure: line 15968: `\t\t\t\t\t\tPKG_CHECK_MODULES(LIBEXIF,libexif >= 0.6.18,have_LIBEXIF=yes,:)'",
        ],
        2,
        lambda: P.MissingAutoconfMacro("PKG_CHECK_MODULES", True),
    ),
    (
        ["ERROR: dependencies ‘ellipsis’, ‘pkgload’ are not available for package ‘testthat’"],
        1,
        lambda: P.MissingRPackage.simple("ellipsis"),
    ),
    (
        ["  namespace ‘DBI’ 1.0.0 is being loaded, but >= 1.0.0.9003 is required"],
        1,
        lambda: P.MissingRPackage("DBI", "1.0.0.9003"),
    ),
    (
        ["  namespace ‘spatstat.utils’ 1.13-0 is already loaded, but >= 1.15.0 is required"],
        1,
        lambda: P.MissingRPackage("spatstat.utils", "1.15.0"),
    ),
    (
        ["Error in library(zeligverse) : there is no package called 'zeligverse'"],
        1,
        lambda: P.MissingRPackage.simple("zeligverse"),
    ),
    (
        ["there is no package called 'mockr'"],
        1,
        lambda: P.MissingRPackage.simple("mockr"),
    ),
    (
        ["ERROR: dependencies 'igraph', 'matlab', 'expm', 'RcppParallel' are not available for package 'markovchain'"],
        1,
        lambda: P.MissingRPackage.simple("igraph"),
    ),
    (
        ["Error: package 'BH' 1.66.0-1 was found, but >= 1.75.0.0 is required by 'RSQLite'"],
        1,
        lambda: P.MissingRPackage("BH", "1.75.0.0"),
    ),
    (
        ["Error: package ‘AnnotationDbi’ 1.52.0 was found, but >= 1.53.1 is required by ‘GO.db’"],
        1,
        lambda: P.MissingRPackage("AnnotationDbi", "1.53.1"),
    ),
    (
        ["  namespace 'alakazam' 1.1.0 is being loaded, but >= 1.1.0.999 is required"],
        1,
        lambda: P.MissingRPackage("alakazam", "1.1.0.999"),
    ),
    (
        ["mv: cannot stat '/usr/res/boss.png': No such file or directory"],
        1,
        lambda: P.MissingFile("/usr/res/boss.png"),
    ),
    (
        ["dh_link: link destination debian/r-cran-crosstalk/usr/lib/R/site-library/crosstalk/lib/ionrangeslider is a directory"],
        1,
        lambda: P.DhLinkDestinationIsDirectory(
            "debian/r-cran-crosstalk/usr/lib/R/site-library/crosstalk/lib/ionrangeslider"
        ),
    ),
    (
        [r'dh_install: Cannot find (any matches for) "server/etc/gnumed/gnumed-restore.conf" (tried in ., debian/tmp)'],
        1,
        lambda: P.DebhelperPatternNotFound(
            "server/etc/gnumed/gnumed-restore.conf", "install", [".", "debian/tmp"]
        ),
    ),
    (
        ["dpkg-gensymbols: error: some symbols or patterns disappeared in the symbols file: see diff output below"],
        1,
        lambda: P.DisappearedSymbols(),
    ),
    (
        ["PHP Fatal error:  Uncaught Error: Class 'PHPUnit_Framework_TestCase' not found in /tmp/autopkgtest.gO7h1t/build.b1p/src/Horde_Text_Diff-2.2.0/test/Horde/Text/Diff/EngineTest.php:9"],
        1,
        lambda: P.MissingPhpClass("PHPUnit_Framework_TestCase"),
    ),
    (
        ["Caused by: java.lang.ClassNotFoundException: org.codehaus.Xpp3r$Builder",
         "\tat org.codehaus.strategy.SelfFirstStrategy.loadClass(lfFirstStrategy.java:50)"],
        1,
        lambda: P.MissingJavaClass("org.codehaus.Xpp3r$Builder"),
    ),
    (
        ["dh: The --until option is not supported any longer (#932537). Use override targets instead."],
        1,
        lambda: P.DhUntilUnsupported(),
    ),
    (
        ["I/O error : Attempt to load network entity http://www.oasis-open.org/docbook/xml/4.5/docbookx.dtd"],
        1,
        lambda: P.MissingXmlEntity("http://www.oasis-open.org/docbook/xml/4.5/docbookx.dtd"),
    ),
    (
        ["ccache: error: Failed to create directory /sbuild-nonexistent/.ccache/tmp: Permission denied"],
        1,
        lambda: P.CcacheError("Failed to create directory /sbuild-nonexistent/.ccache/tmp: Permission denied"),
    ),
    (
        ["dh: unable to load addon nodejs: Debian/Debhelper/Sequence/nodejs.pm did not return a true value at (eval 11) line 1."],
        1,
        lambda: P.DhAddonLoadFailure("nodejs", "Debian/Debhelper/Sequence/nodejs.pm"),
    ),
    (
        ["/usr/bin/ld: cannot find -lpthreads"],
        1,
        lambda: P.MissingLibrary("pthreads"),
    ),
    (["Found no assembler"], 1, lambda: P.MissingAssembler()),
    (
        ["./ylwrap: line 176: yacc: command not found"],
        1,
        lambda: P.MissingCommand("yacc"),
    ),
    (["/bin/sh: 1: cmake: not found"], 1, lambda: P.MissingCommand("cmake")),
    (["sh: 1: git: not found"], 1, lambda: P.MissingCommand("git")),
    (
        ["/usr/bin/env: ‘python3’: No such file or directory"],
        1,
        lambda: P.MissingCommand("python3"),
    ),
    (["%Error: 'flex' must be installed to build"], 1, lambda: P.MissingCommand("flex")),
    (
        ['pkg-config: exec: "pkg-config": executable file not found in $PATH'],
        1,
        lambda: P.MissingCommand("pkg-config"),
    ),
    (
        ['Can\'t exec "git": No such file or directory at Makefile.PL line 25.'],
        1,
        lambda: P.MissingCommand("git"),
    ),
    (
        ["vcver.scm.git.GitCommandError: 'git describe --tags --match 'v*' --abbrev=0' returned an error code 127"],
        1,
        lambda: P.MissingCommand("git"),
    ),
    (["make[1]: docker: Command not found"], 1, lambda: P.MissingCommand("docker")),
    (["make[1]: git: Command not found"], 1, lambda: P.MissingCommand("git")),
    (["make: dh_elpa: Command not found"], 1, lambda: P.MissingCommand("dh_elpa")),
    (["/bin/bash: valac: command not found"], 1, lambda: P.MissingCommand("valac")),
    (
        ["E: Failed to execute “python3”: No such file or directory"],
        1,
        lambda: P.MissingCommand("python3"),
    ),
    (
        ['Can\'t exec "cmake": No such file or directory at /usr/share/perl5/Debian/Debhelper/Dh_Lib.pm line 484.'],
        1,
        lambda: P.MissingCommand("cmake"),
    ),
    (
        ["Invalid gemspec in [unicorn.gemspec]: No such file or directory - git"],
        1,
        lambda: P.MissingCommand("git"),
    ),
    (
        ["dbus-run-session: failed to exec 'xvfb-run': No such file or directory"],
        1,
        lambda: P.MissingCommand("xvfb-run"),
    ),
    (
        ["unshare: failed to execute python3: No such file or directory"],
        1,
        lambda: P.MissingCommand("python3"),
    ),
    (["/bin/sh: 1: ./configure: not found"], 1, lambda: P.MissingConfigure()),
    (
        ["xvfb-run: error: xauth command not found"],
        1,
        lambda: P.MissingCommand("xauth"),
    ),
    (
        ["meson.build:39:2: ERROR: Program(s) ['wrc'] not found or not executable"],
        1,
        lambda: P.MissingCommand("wrc"),
    ),
    (
        ["/tmp/autopkgtest.FnbV06/build.18W/src/debian/tests/blas-testsuite: 7: dpkg-architecture: not found"],
        1,
        lambda: P.MissingCommand("dpkg-architecture"),
    ),
    (
        ['> Cannot run program "git": error=2, No such file or directory'],
        1,
        lambda: P.MissingCommand("git"),
    ),
    (["E ImportError: Bad git executable"], 1, lambda: P.MissingCommand("git")),
    (["E ImportError: Bad git executable."], 1, lambda: P.MissingCommand("git")),
    (
        ['Could not find external command "java"'],
        1,
        lambda: P.MissingCommand("java"),
    ),
    (
        ["checking for LAPACK... configure: error: \"Cannot check for existence of module lapack without pkgconf\""],
        1,
        lambda: P.MissingCommand("pkgconf"),
    ),
    (
        ["dh: Unknown sequence --with (options should not come before the sequence)"],
        1,
        lambda: P.DhWithOrderIncorrect(),
    ),
    (
        ["configure: error: Package requirements (apertium-3.2 >= 3.2.0) were not met:"],
        1,
        lambda: P.MissingPkgConfig("apertium-3.2", "3.2.0"),
    ),
    (
        ["checking for GLEW... configure: error: Package requirements (glew) were not met:"],
        1,
        lambda: P.MissingPkgConfig.simple("glew"),
    ),
    (
        ['meson.build:10:0: ERROR: Dependency "gssdp-1.2" not found, tried pkgconfig'],
        1,
        lambda: P.MissingPkgConfig.simple("gssdp-1.2"),
    ),
    (
        ['src/plugins/sysprof/meson.build:3:0: ERROR: Dependency "sysprof-3" not found, tried pkgconfig'],
        1,
        lambda: P.MissingPkgConfig.simple("sysprof-3"),
    ),
    (
        ["meson.build:84:0: ERROR: Invalid version of dependency, need 'libpeas-1.0' ['>= 1.24.0'] found '1.22.0'."],
        1,
        lambda: P.MissingPkgConfig("libpeas-1.0", "1.24.0"),
    ),
    (
        ["meson.build:233:0: ERROR: Invalid version of dependency, need 'vte-2.91' ['>=0.63.0'] found '0.62.3'."],
        1,
        lambda: P.MissingPkgConfig("vte-2.91", "0.63.0"),
    ),
    (["No package 'tepl-3' found"], 1, lambda: P.MissingPkgConfig.simple("tepl-3")),
    (
        ["configure: error: x86_64-linux-gnu-pkg-config sdl2 couldn't be found"],
        1,
        lambda: P.MissingPkgConfig.simple("sdl2"),
    ),
    (
        ["configure: error: No package 'libcrypto' found"],
        1,
        lambda: P.MissingPkgConfig.simple("libcrypto"),
    ),
    (
        [
            "-- Checking for module 'gtk+-3.0'",
            "--   Package 'gtk+-3.0', required by 'virtual:world', not found",
        ],
        2,
        lambda: P.MissingPkgConfig.simple("gtk+-3.0"),
    ),
    (
        ["configure: error: libfilezilla not found: Package dependency requirement 'libfilezilla >= 0.17.1' could not be satisfied."],
        1,
        lambda: P.MissingPkgConfig("libfilezilla", "0.17.1"),
    ),
    # FileNotFoundError with subprocess context (common.rs:4559-4582)
    (
        [
            "Traceback (most recent call last):",
            '  File "/usr/lib/python3/dist-packages/mesonbuild/mesonmain.py", line 140, in run',
            "    return options.run_func(options)",
            '  File "/usr/lib/python3/dist-packages/mesonbuild/mdist.py", line 267, in run',
            "    names = create_dist_git(dist_name, archives, src_root, bld_root, dist_sub, b.dist_scripts, subprojects)",
            '  File "/usr/lib/python3/dist-packages/mesonbuild/mdist.py", line 119, in create_dist_git',
            "    git_clone(src_root, distdir)",
            '  File "/usr/lib/python3/dist-packages/mesonbuild/mdist.py", line 108, in git_clone',
            "    if git_have_dirty_index(src_root):",
            '  File "/usr/lib/python3/dist-packages/mesonbuild/mdist.py", line 104, in git_have_dirty_index',
            "    ret = subprocess.call(['git', '-C', src_root, 'diff-index', '--quiet', 'HEAD'])",
            '  File "/usr/lib/python3.9/subprocess.py", line 349, in call',
            "    with Popen(*popenargs, **kwargs) as p:",
            '  File "/usr/lib/python3.9/subprocess.py", line 951, in __init__',
            "    self._execute_child(args, executable, preexec_fn, close_fds,",
            '  File "/usr/lib/python3.9/subprocess.py", line 1823, in _execute_child',
            "    raise child_exception_type(errno_num, err_msg, err_filename)",
            "FileNotFoundError: [Errno 2] No such file or directory: 'git'",
        ],
        18,
        lambda: P.MissingCommand("git"),
    ),
    # ---- fourth tranche, ported from common.rs:4725-5276 ----
    (
        ["Could not find gem 'childprocess (~> 0.5)', which is required by gem 'selenium-webdriver', in any of the sources."],
        1,
        lambda: P.MissingRubyGem("childprocess", "0.5"),
    ),
    (
        ["Could not find gem 'rexml', which is required by gem 'rubocop', in any of the sources."],
        1,
        lambda: P.MissingRubyGem("rexml"),
    ),
    (
        ["/usr/lib/ruby/2.5.0/rubygems/dependency.rb:310:in `to_specs': Could not find 'http-parser' (~> 1.2.0) among 59 total gem(s) (Gem::MissingSpecError)"],
        1,
        lambda: P.MissingRubyGem("http-parser", "1.2.0"),
    ),
    (
        ["/usr/lib/ruby/2.5.0/rubygems/dependency.rb:312:in `to_specs': Could not find 'celluloid' (~> 0.17.3) - did find: [celluloid-0.16.0] (Gem::MissingSpecVersionError)"],
        1,
        lambda: P.MissingRubyGem("celluloid", "0.17.3"),
    ),
    (
        ["/usr/lib/ruby/2.5.0/rubygems/dependency.rb:310:in `to_specs': Could not find 'sassc' (>= 2.0.0) among 34 total gem(s) (Gem::MissingSpecError)"],
        1,
        lambda: P.MissingRubyGem("sassc", "2.0.0"),
    ),
    (
        ["/usr/lib/ruby/2.7.0/bundler/resolver.rb:290:in `block in verify_gemfile_dependencies_are_found!': Could not find gem 'rake-compiler' in any of the gem sources listed in your Gemfile. (Bundler::GemNotFound)"],
        1,
        lambda: P.MissingRubyGem("rake-compiler"),
    ),
    (
        ["/usr/lib/ruby/2.7.0/rubygems.rb:275:in `find_spec_for_exe': can't find gem rdoc (>= 0.a) with executable rdoc (Gem::GemNotFoundException)"],
        1,
        lambda: P.MissingRubyGem("rdoc", "0.a"),
    ),
    (
        ["[ERROR] Failed to execute goal on project byteman-bmunit5: Could not resolve dependencies for project org.jboss.byteman:byteman-bmunit5:jar:4.0.7: The following artifacts could not be resolved: org.junit.jupiter:junit-jupiter-api:jar:5.4.0, org.junit.jupiter:junit-jupiter-params:jar:5.4.0, org.junit.jupiter:junit-jupiter-engine:jar:5.4.0: Cannot access central (https://repo.maven.apache.org/maven2) in offline mode and the artifact org.junit.jupiter:junit-jupiter-api:jar:5.4.0 has not been downloaded from it before. -> [Help 1]"],
        1,
        lambda: P.MissingMavenArtifacts([
            "org.junit.jupiter:junit-jupiter-api:jar:5.4.0",
            "org.junit.jupiter:junit-jupiter-params:jar:5.4.0",
            "org.junit.jupiter:junit-jupiter-engine:jar:5.4.0",
        ]),
    ),
    (
        ["[ERROR] Failed to execute goal on project opennlp-uima: Could not resolve dependencies for project org.apache.opennlp:opennlp-uima:jar:1.9.2-SNAPSHOT: Cannot access ApacheIncubatorRepository (http://people.apache.org/repo/m2-incubating-repository/) in offline mode and the artifact org.apache.opennlp:opennlp-tools:jar:debian has not been downloaded from it before. -> [Help 1]"],
        1,
        lambda: P.MissingMavenArtifacts(["org.apache.opennlp:opennlp-tools:jar:debian"]),
    ),
    (
        ["[ERROR] Failed to execute goal on project bookkeeper-server: Could not resolve dependencies for project org.apache.bookkeeper:bookkeeper-server:jar:4.4.0: Cannot access central (https://repo.maven.apache.org/maven2) in offline mode and the artifact io.netty:netty:jar:debian has not been downloaded from it before. -> [Help 1]"],
        1,
        lambda: P.MissingMavenArtifacts(["io.netty:netty:jar:debian"]),
    ),
    (
        ["[ERROR] Unresolveable build extension: Plugin org.apache.felix:maven-bundle-plugin:2.3.7 or one of its dependencies could not be resolved: Cannot access central (https://repo.maven.apache.org/maven2) in offline mode and the artifact org.apache.felix:maven-bundle-plugin:jar:2.3.7 has not been downloaded from it before. @"],
        1,
        lambda: P.MissingMavenArtifacts(["org.apache.felix:maven-bundle-plugin:2.3.7"]),
    ),
    (
        ["[ERROR] Plugin org.apache.maven.plugins:maven-jar-plugin:2.6 or one of its dependencies could not be resolved: Cannot access central (https://repo.maven.apache.org/maven2) in offline mode and the artifact org.apache.maven.plugins:maven-jar-plugin:jar:2.6 has not been downloaded from it before. -> [Help 1]"],
        1,
        lambda: P.MissingMavenArtifacts(["org.apache.maven.plugins:maven-jar-plugin:2.6"]),
    ),
    (
        ["[FATAL] Non-resolvable parent POM for org.joda:joda-convert:2.2.1: Cannot access central (https://repo.maven.apache.org/maven2) in offline mode and the artifact org.joda:joda-parent:pom:1.4.0 has not been downloaded from it before. and 'parent.relativePath' points at wrong local POM @ line 8, column 10"],
        1,
        lambda: P.MissingMavenArtifacts(["org.joda:joda-parent:pom:1.4.0"]),
    ),
    (
        ["[ivy:retrieve] \t\t:: com.carrotsearch.randomizedtesting#junit4-ant;${/com.carrotsearch.randomizedtesting/junit4-ant}: not found"],
        1,
        lambda: P.MissingMavenArtifacts(["com.carrotsearch.randomizedtesting:junit4-ant:jar:debian"]),
    ),
    (
        ["[ERROR] Plugin org.apache.maven.plugins:maven-compiler-plugin:3.10.1 or one of its dependencies could not be resolved: Failed to read artifact descriptor for org.apache.maven.plugins:maven-compiler-plugin:jar:3.10.1: 1 problem was encountered while building the effective model for org.apache.maven.plugins:maven-compiler-plugin:3.10.1"],
        1,
        lambda: P.MissingMavenArtifacts(["org.apache.maven.plugins:maven-compiler-plugin:3.10.1"]),
    ),
    (
        [
            "dh_missing --fail-missing",
            "dh_missing: usr/share/man/man1/florence_applet.1 exists in debian/tmp but is not installed to anywhere",
            "dh_missing: usr/lib/x86_64-linux-gnu/libflorence-1.0.la exists in debian/tmp but is not installed to anywhere",
            "dh_missing: missing files, aborting",
        ],
        3,
        lambda: P.DhMissingUninstalled("usr/lib/x86_64-linux-gnu/libflorence-1.0.la"),
    ),
    (
        ["Converting tags.ledger... Can't locate String/Interpolate.pm in @INC (you may need to install the String::Interpolate module) (@INC contains: /etc/perl /usr/local/lib/x86_64-linux-gnu/perl/5.28.1 /usr/local/share/perl/5.28.1 /usr/lib/x86_64-linux-gnu/perl5/5.28 /usr/share/perl5 /usr/lib/x86_64-linux-gnu/perl/5.28 /usr/share/perl/5.28 /usr/local/lib/site_perl /usr/lib/x86_64-linux-gnu/perl-base) at ../bin/ledger2beancount line 23."],
        1,
        lambda: P.MissingPerlModule(
            "String/Interpolate.pm", "String::Interpolate",
            ["/etc/perl", "/usr/local/lib/x86_64-linux-gnu/perl/5.28.1",
             "/usr/local/share/perl/5.28.1", "/usr/lib/x86_64-linux-gnu/perl5/5.28",
             "/usr/share/perl5", "/usr/lib/x86_64-linux-gnu/perl/5.28",
             "/usr/share/perl/5.28", "/usr/local/lib/site_perl",
             "/usr/lib/x86_64-linux-gnu/perl-base"],
            None,
        ),
    ),
    (
        ["- ExtUtils::Depends         ...missing. (would need 0.302)"],
        1,
        lambda: P.MissingPerlModule(None, "ExtUtils::Depends", None, "0.302"),
    ),
    (
        ['Can\'t locate object method "new" via package "Dist::Inkt::Profile::TOBYINK" (perhaps you forgot to load "Dist::Inkt::Profile::TOBYINK"?) at /usr/share/perl5/Dist/Inkt.pm line 208.'],
        1,
        lambda: P.MissingPerlModule.simple("Dist::Inkt::Profile::TOBYINK"),
    ),
    (
        ["Pod::Weaver::Plugin::WikiDoc (for section -WikiDoc) does not appear to be installed"],
        1,
        lambda: P.MissingPerlModule.simple("Pod::Weaver::Plugin::WikiDoc"),
    ),
    (
        ["List::Util version 1.56 required--this is only version 1.55 at /build/tmpttq5hhpt/package/blib/lib/List/AllUtils.pm line 8."],
        1,
        lambda: P.MissingPerlModule(None, "List::Util", None, "1.56"),
    ),
    (
        ["Can't locate debian/perldl.conf in @INC (@INC contains: /<<PKGBUILDDIR>>/inc /etc/perl /usr/local/lib/x86_64-linux-gnu/perl/5.28.1 /usr/local/share/perl/5.28.1 /usr/lib/x86_64-linux-gnu/perl5/5.28 /usr/share/perl5 /usr/lib/x86_64-linux-gnu/perl/5.28 /usr/share/perl/5.28 /usr/local/lib/site_perl /usr/lib/x86_64-linux-gnu/perl-base) at Makefile.PL line 131."],
        1,
        lambda: P.MissingPerlFile(
            "debian/perldl.conf",
            ["/<<PKGBUILDDIR>>/inc", "/etc/perl",
             "/usr/local/lib/x86_64-linux-gnu/perl/5.28.1",
             "/usr/local/share/perl/5.28.1", "/usr/lib/x86_64-linux-gnu/perl5/5.28",
             "/usr/share/perl5", "/usr/lib/x86_64-linux-gnu/perl/5.28",
             "/usr/share/perl/5.28", "/usr/local/lib/site_perl",
             "/usr/lib/x86_64-linux-gnu/perl-base"],
        ),
    ),
    (
        ['Can\'t open perl script "Makefile.PL": No such file or directory'],
        1,
        lambda: P.MissingPerlFile("Makefile.PL", None),
    ),
    (
        [">(error): Could not expand [ 'Dist::Inkt::Profile::TOBYINK'"],
        1,
        lambda: P.MissingPerlModule.simple("Dist::Inkt::Profile::TOBYINK"),
    ),
    (
        [
            "String found where operator expected at Makefile.PL line 13, near \"author_tests 'xt'\"",
            "\t(Do you need to predeclare author_tests?)",
            "syntax error at Makefile.PL line 13, near \"author_tests 'xt'\"",
            '"strict subs" in use at Makefile.PL line 13.',
        ],
        2,
        lambda: P.MissingPerlPredeclared("author_tests"),
    ),
    (
        ["String found where operator expected at Makefile.PL line 8, near \"readme_from    'lib/URL/Encode.pod'\""],
        1,
        lambda: P.MissingPerlPredeclared("readme_from"),
    ),
    (
        ['Bareword "use_test_base" not allowed while "strict subs" in use at Makefile.PL line 12.'],
        1,
        lambda: P.MissingPerlPredeclared("use_test_base"),
    ),
    (
        ['go: github.com/golangci/golangci-lint@v1.24.0: Get "https://proxy.golang.org/github.com/golangci/golangci-lint/@v/v1.24.0.mod": x509: certificate signed by unknown authority'],
        1,
        lambda: P.UnknownCertificateAuthority(
            "https://proxy.golang.org/github.com/golangci/golangci-lint/@v/v1.24.0.mod"
        ),
    ),
    (
        ["/usr/bin/install: error writing '/<<PKGBUILDDIR>>/debian/tmp/usr/lib/gcc/x86_64-linux-gnu/8/cc1objplus': No space left on device"],
        1,
        lambda: P.NoSpaceOnDevice(),
    ),
    (
        ["Required plugin bundle Dist::Zilla::PluginBundle::Git isn't installed."],
        1,
        lambda: P.MissingPerlModule.simple("Dist::Zilla::PluginBundle::Git"),
    ),
    (
        ["Required plugin Dist::Zilla::Plugin::PPPort isn't installed."],
        1,
        lambda: P.MissingPerlModule.simple("Dist::Zilla::Plugin::PPPort"),
    ),
    (
        ["error: Package `glib-2.0' not found in specified Vala API directories or GObject-Introspection GIR directories"],
        1,
        lambda: P.MissingValaPackage("glib-2.0"),
    ),
    (
        ["ValueError: Namespace GnomeDesktop not available"],
        1,
        lambda: P.MissingIntrospectionTypelib("GnomeDesktop"),
    ),
    (
        [
            "checking for pkg-config... no",
            "",
            "*** Your version of pkg-config is too old. You need atleast",
            "*** pkg-config 0.9.0 or newer. You can download pkg-config",
            "*** from the freedesktop.org software repository at",
            "***",
            "***    https://www.freedesktop.org/wiki/Software/pkg-config/",
            "***",
        ],
        4,
        lambda: P.MissingVagueDependency("pkg-config", minimum_version="0.9.0"),
    ),
    (
        ["> Kotlin could not find the required JDK tools in the Java installation '/usr/lib/jvm/java-8-openjdk-amd64/jre' used by Gradle. Make sure Gradle is running on a JDK, not JRE."],
        1,
        lambda: P.MissingJDK("/usr/lib/jvm/java-8-openjdk-amd64/jre"),
    ),
    (
        ["Error: Cannot find module 'tape'"],
        1,
        lambda: P.MissingNodeModule("tape"),
    ),
    (
        ["npm ERR! [!] Error: Cannot find module '@rollup/plugin-buble'"],
        1,
        lambda: P.MissingNodeModule("@rollup/plugin-buble"),
    ),
    (
        ["npm ERR! Error: Cannot find module 'fs-extra'"],
        1,
        lambda: P.MissingNodeModule("fs-extra"),
    ),
    (
        ["\x1b[1m\x1b[31m[!] \x1b[1mError: Cannot find module '@rollup/plugin-buble'"],
        1,
        lambda: P.MissingNodeModule("@rollup/plugin-buble"),
    ),
]


TRANCHE5 = [
    (
        ["cdhit-common.h:39:9: fatal error: zlib.h: No such file or directory"],
        1, lambda: P.MissingCHeader("zlib.h"),
    ),
    (
        ["/<<PKGBUILDDIR>>/Kernel/Operation_Vector.cpp:15:10: fatal error: petscvec.h: No such file or directory"],
        1, lambda: P.MissingCHeader("petscvec.h"),
    ),
    (
        ["src/bubble.h:27:10: fatal error: DBlurEffectWidget: No such file or directory"],
        1, lambda: P.MissingCHeader("DBlurEffectWidget"),
    ),
    (
        ["> Could not find tools.jar. Please check that /usr/lib/jvm/java-8-openjdk-amd64 contains a valid JDK installation."],
        1, lambda: P.MissingJDKFile("/usr/lib/jvm/java-8-openjdk-amd64", "tools.jar"),
    ),
    (
        ["ImportError: No module named pytz"],
        1, lambda: P.MissingPythonModule.simple("pytz"),
    ),
    (
        ["ModuleNotFoundError: No module named 'django_crispy_forms'"],
        1, lambda: P.MissingPythonModule("django_crispy_forms", 3, None),
    ),
    (
        [" ModuleNotFoundError: No module named 'Cython'"],
        1, lambda: P.MissingPythonModule("Cython", 3, None),
    ),
    (
        ["E   ModuleNotFoundError: No module named 'twisted'"],
        1, lambda: P.MissingPythonModule("twisted", 3, None),
    ),
    (
        ["E   ImportError: cannot import name 'async_poller' from 'msrest.polling' (/usr/lib/python3/dist-packages/msrest/polling/__init__.py)"],
        1, lambda: P.MissingPythonModule.simple("msrest.polling.async_poller"),
    ),
    (
        ["/usr/bin/python3: No module named sphinx"],
        1, lambda: P.MissingPythonModule("sphinx", 3, None),
    ),
    (
        ["Could not import extension sphinx.ext.pngmath (exception: No module named pngmath)"],
        1, lambda: P.MissingPythonModule.simple("pngmath"),
    ),
    (
        ["/usr/bin/python3: Error while finding module specification for 'pep517.build' (ModuleNotFoundError: No module named 'pep517')"],
        1, lambda: P.MissingPythonModule("pep517", 3, None),
    ),
    (
        ['src/github.com/vuls/config/config.go:30:2: cannot find package "golang.org/x/xerrors" in any of:'],
        1, lambda: P.MissingGoPackage("golang.org/x/xerrors"),
    ),
    (
        ["[ERROR] LazyFont - Failed to read font file /usr/share/texlive/texmf-dist/fonts/opentype/public/stix2-otf/STIX2Math.otf <java.io.FileNotFoundException: /usr/share/texlive/texmf-dist/fonts/opentype/public/stix2-otf/STIX2Math.otf (No such file or directory)>java.io.FileNotFoundException: /usr/share/texlive/texmf-dist/fonts/opentype/public/stix2-otf/STIX2Math.otf (No such file or directory)"],
        1, lambda: P.MissingFile("/usr/share/texlive/texmf-dist/fonts/opentype/public/stix2-otf/STIX2Math.otf"),
    ),
    (
        ["! LaTeX Error: File `fancyvrb.sty' not found."],
        1, lambda: P.MissingLatexFile("fancyvrb.sty"),
    ),
    (
        ["E   ImportError: cannot import name cmod"],
        1, lambda: P.MissingPythonModule.simple("cmod"),
    ),
    (
        ["E   ImportError: No module named mock"],
        1, lambda: P.MissingPythonModule.simple("mock"),
    ),
    (
        ["pluggy.manager.PluginValidationError: Plugin 'xdist.looponfail' could not be loaded: (pytest 3.10.1 (/usr/lib/python2.7/dist-packages), Requirement.parse('pytest>=4.4.0'))!"],
        1, lambda: P.MissingPythonModule("pytest", 2, "4.4.0"),
    ),
    (
        ['ImportError: Error importing plugin "tests.plugins.mock_libudev": No module named mock'],
        1, lambda: P.MissingPythonModule.simple("mock"),
    ),
    (
        ["sed: can't read /etc/locale.gen: No such file or directory"],
        1, lambda: P.MissingFile("/etc/locale.gen"),
    ),
    (
        ["pytest: error: unrecognized arguments: --cov=janitor --cov-report=html --cov-report=term-missing:skip-covered"],
        1,
        lambda: P.UnsupportedPytestArguments(
            ["--cov=janitor", "--cov-report=html", "--cov-report=term-missing:skip-covered"]
        ),
    ),
    (
        ["INTERNALERROR> pytest.PytestConfigWarning: Unknown config option: asyncio_mode"],
        1, lambda: P.UnsupportedPytestConfigOption("asyncio_mode"),
    ),
    (
        ["  /usr/lib/python3/dist-packages/_pytest/config/__init__.py:1148: PytestConfigWarning: Unknown config ini key: pep8maxlinelength"],
        1, lambda: P.UnsupportedPytestConfigOption("pep8maxlinelength"),
    ),
    (
        ["distutils.errors.DistutilsError: Could not find suitable distribution for Requirement.parse('pytest-runner')"],
        1, lambda: P.MissingPythonDistribution.simple("pytest-runner"),
    ),
    (
        ["distutils.errors.DistutilsError: Could not find suitable distribution for Requirement.parse('certifi>=2019.3.9')"],
        1, lambda: P.MissingPythonDistribution("certifi", None, "2019.3.9"),
    ),
    (
        ["error: Could not find suitable distribution for Requirement.parse('gitlab')"],
        1, lambda: P.MissingPythonDistribution.simple("gitlab"),
    ),
    (
        ["pkg_resources.DistributionNotFound: The 'configparser>=3.5' distribution was not found and is required by importlib-metadata"],
        1, lambda: P.MissingPythonDistribution("configparser", None, "3.5"),
    ),
    (
        ["error: Command '['/usr/bin/python3.9', '-m', 'pip', '--disable-pip-version-check', 'wheel', '--no-deps', '-w', '/tmp/tmp973_8lhm', '--quiet', 'asynctest']' returned non-zero exit status 1."],
        1, lambda: P.MissingPythonDistribution("asynctest", 3, None),
    ),
    (
        [
            "CMake Error at CMakeLists.txt:84 (MESSAGE):",
            "  alut not found",
        ],
        2, lambda: P.MissingVagueDependency.simple("alut"),
    ),
    (
        [
            "CMake Error at CMakeLists.txt:213 (message):",
            "  could not find zlib",
        ],
        2, lambda: P.MissingVagueDependency.simple("zlib"),
    ),
]
CASES.extend(TRANCHE5)

# TRANCHE6 — round 2: the last reference vectors not yet ported (gap scan
# against every assert_match/assert_just_match first-line in
# /root/reference/src/common.rs mod tests)
TRANCHE6 = [
    # test_mv_stat (common.rs)
    (["mv: cannot stat 'res/boss.png': No such file or directory"], 1, None),
    # test_fortran / undefined reference vectors
    (["./testFortranCompiler.f:4: undefined reference to `sgemm_'"], 1, None),
    (["writer.d:59: error: undefined reference to 'sam_hdr_parse_'"], 1, None),
    # relative-path command missing → match only
    (["make[1]: ./docker: Command not found"], 1, None),
    # typescript error
    (
        ["blah/tokenizer.ts(175,21): error TS2532: Object is possibly 'undefined'."],
        1,
        None,
    ),
    # pkg-config version too old
    (
        ["Requested 'vte-2.91 >= 0.59.0' but version of vte is 0.58.2"],
        1,
        lambda: P.MissingPkgConfig("vte-2.91", "0.59.0"),
    ),
    # configure needs pkgconf itself
    (
        ['checking for LAPACK... configure: error: "Cannot check for existence of module lapack without pkgconf"'],
        1,
        lambda: P.MissingCommand("pkgconf"),
    ),
    # ld relocation advice → match only
    (
        ["/usr/bin/ld: pcap-linux.o: relocation R_X86_64_PC32 against symbol `stderr@@GLIBC_2.2.5' can not be used when making a shared object; recompile with -fPIC"],
        1,
        None,
    ),
    # perl module with full @INC capture
    (
        ["Can't locate Test/Needs.pm in @INC (you may need to install the Test::Needs module) (@INC contains: t/lib /<<PKGBUILDDIR>>/blib/lib /<<PKGBUILDDIR>>/blib/arch /etc/perl /usr/local/lib/x86_64-linux-gnu/perl/5.30.0 /usr/local/share/perl/5.30.0 /usr/lib/x86_64-linux-gnu/perl5/5.30 /usr/share/perl5 /usr/lib/x86_64-linux-gnu/perl/5.30 /usr/share/perl/5.30 /usr/local/lib/site_perl /usr/lib/x86_64-linux-gnu/perl-base .) at t/anon-basic.t line 7."],
        1,
        lambda: P.MissingPerlModule(
            "Test/Needs.pm",
            "Test::Needs",
            [
                "t/lib", "/<<PKGBUILDDIR>>/blib/lib", "/<<PKGBUILDDIR>>/blib/arch",
                "/etc/perl", "/usr/local/lib/x86_64-linux-gnu/perl/5.30.0",
                "/usr/local/share/perl/5.30.0", "/usr/lib/x86_64-linux-gnu/perl5/5.30",
                "/usr/share/perl5", "/usr/lib/x86_64-linux-gnu/perl/5.30",
                "/usr/share/perl/5.30", "/usr/local/lib/site_perl",
                "/usr/lib/x86_64-linux-gnu/perl-base", ".",
            ],
            None,
        ),
    ),
    (
        ["Can't locate ExtUtils/Depends.pm in @INC (you may need to install the ExtUtils::Depends module) (@INC contains: /etc/perl /usr/local/lib/x86_64-linux-gnu/perl/5.32.1 /usr/local/share/perl/5.32.1 /usr/lib/x86_64-linux-gnu/perl5/5.32 /usr/share/perl5 /usr/lib/x86_64-linux-gnu/perl-base /usr/lib/x86_64-linux-gnu/perl/5.32 /usr/share/perl/5.32 /usr/local/lib/site_perl) at (eval 11) line 1."],
        1,
        lambda: P.MissingPerlModule(
            "ExtUtils/Depends.pm",
            "ExtUtils::Depends",
            [
                "/etc/perl", "/usr/local/lib/x86_64-linux-gnu/perl/5.32.1",
                "/usr/local/share/perl/5.32.1", "/usr/lib/x86_64-linux-gnu/perl5/5.32",
                "/usr/share/perl5", "/usr/lib/x86_64-linux-gnu/perl-base",
                "/usr/lib/x86_64-linux-gnu/perl/5.32", "/usr/share/perl/5.32",
                "/usr/local/lib/site_perl",
            ],
            None,
        ),
    ),
    # py2-style ImportError without quotes → match only
    (["ImportError: cannot import name SubfieldBase"], 1, None),
    # sphinx config syntax error → match only
    (
        ["There is a syntax error in your configuration file: Unknown syntax: Constant"],
        1,
        None,
    ),
    # pip wheel subprocess failure → distribution from the command line
    (
        ["subprocess.CalledProcessError: Command '['/usr/bin/python', '-m', 'pip', '--disable-pip-version-check', 'wheel', '--no-deps', '-w', '/tmp/tmpm2l3kcgv', '--quiet', 'setuptools_scm']' returned non-zero exit status 1."],
        1,
        lambda: P.MissingPythonDistribution("setuptools-scm", None, None),
    ),
]
CASES.extend(TRANCHE6)


def test_setup_py_command_missing():
    lines = (
        "/usr/lib/python3.9/distutils/dist.py:274: UserWarning: Unknown distribution option: 'long_description_content_type'\n"
        "  warnings.warn(msg)\n"
        "/usr/lib/python3.9/distutils/dist.py:274: UserWarning: Unknown distribution option: 'test_suite'\n"
        "  warnings.warn(msg)\n"
        "/usr/lib/python3.9/distutils/dist.py:274: UserWarning: Unknown distribution option: 'python_requires'\n"
        "  warnings.warn(msg)\n"
        "usage: setup.py [global_opts] cmd1 [cmd1_opts] [cmd2 [cmd2_opts] ...]\n"
        "   or: setup.py --help [cmd1 cmd2 ...]\n"
        "   or: setup.py --help-commands\n"
        "   or: setup.py cmd --help\n"
        "\n"
        "error: invalid command 'test'\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 12
    assert problem.kind == "missing-setup.py-command"
    assert problem.details == {"command": "test"}


def test_cmake_imported_target_missing_file():
    lines = (
        'CMake Error at /usr/lib/x86_64-/cmake/Qt5Gui/Qt5GuiConfig.cmake:27 (message):\n'
        '  The imported target "Qt5::Gui" references the file\n'
        "\n"
        '     "/usr/lib/x86_64-linux-gnu/libEGL.so"\n'
        "\n"
        "  but this file does not exist.  Possible reasons include:\n"
        "\n"
        "  * The file was deleted, renamed, or moved to another location.\n"
        "\n"
        "  * An install or uninstall procedure did not complete successfully.\n"
        "\n"
        "  * The installation package was faulty and contained\n"
        "\n"
        '     "/usr/lib/x86_64-linux-gnu/cmake/Qt5Gui/Qt5GuiConfigExtras.cmake"\n'
        "\n"
        "  but not all the files it references.\n"
        "\n"
        "Call Stack (most recent call first):\n"
        "  CMakeLists.txt:34 (find_package)\n"
        "dh_auto_configure: cd obj-x86_64-linux-gnu && cmake with args\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert problem is not None
    assert problem.kind == "missing-file"
    assert problem.details == {"path": "/usr/lib/x86_64-linux-gnu/libEGL.so"}


def test_cmake_missing_include():
    lines = (
        "-- Performing Test _OFFT_IS_64BIT\n"
        "-- Performing Test _OFFT_IS_64BIT - Success\n"
        "-- Performing Test HAVE_DATE_TIME\n"
        "-- Performing Test HAVE_DATE_TIME - Success\n"
        "CMake Error at CMakeLists.txt:43 (include):\n"
        "  include could not find load file:\n"
        "\n"
        "    KDEGitCommitHooks\n"
        "\n"
        "\n"
        '-- Found KF5Activities: /usr/lib/x86_64-linux-gnu/cmake/KF5Activities/KF5ActivitiesConfig.cmake (found version "5.78.0") \n'
        '-- Found KF5Config: /usr/lib/x86_64-linux-gnu/cmake/KF5Config/KF5ConfigConfig.cmake (found version "5.78.0") \n'
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 8
    assert problem.kind == "missing-cmake-files"
    assert problem.details == {"filenames": ["KDEGitCommitHooks.cmake"], "version": None}


def test_cmake_missing_cmake_files():
    lines = (
        "CMake Error at /usr/share/cmake-3.22/Modules/FindPackageHandleStandardArgs.cmake:230 (message):\n"
        '  Could not find a package configuration file provided by "sensor_msgs" with\n'
        "  any of the following names:\n"
        "\n"
        "    sensor_msgsConfig.cmake\n"
        "    sensor_msgs-config.cmake\n"
        "\n"
        '  Add the installation prefix of "sensor_msgs" to CMAKE_PREFIX_PATH or set\n'
        '  "sensor_msgs_DIR" to a directory containing one of the above files.  If\n'
        '  "sensor_msgs" provides a separate development package or SDK, be sure it\n'
        "  has been installed.\n"
        "dh_auto_configure: cd obj-x86_64-linux-gnu && cmake with args\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 11
    assert problem.kind == "missing-cmake-files"
    assert problem.details == {
        "filenames": ["sensor_msgsConfig.cmake", "sensor_msgs-config.cmake"],
        "version": None,
    }


def test_cmake_exact_version():
    lines = (
        "CMake Error at /usr/share/cmake-3.18/Modules/FindPackageHandleStandardArgs.cmake:165 (message):\n"
        '  Could NOT find SignalProtocol: Found unsuitable version "2.3.3", but\n'
        '  required is exact version "2.3.2" (found\n'
        "  /usr/lib/x86_64-linux-gnu/libsignal-protocol-c.so)\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 4
    assert problem.kind == "cmake-exact-version-missing"
    assert problem.details == {
        "package": "SignalProtocol",
        "version_found": "2.3.3",
        "exact_version_needed": "2.3.2",
        "path": "/usr/lib/x86_64-linux-gnu/libsignal-protocol-c.so",
    }


def test_cmake_vague_gpgme():
    lines = (
        "-- Found LibSolv_ext: /usr/lib/x86_64-linux-gnu/libsolvext.so  \n"
        "-- Found LibSolv: /usr/include /usr/lib/x86_64-linux-gnu/libsolv.so;/usr/lib/x86_64-linux-gnu/libsolvext.so\n"
        "-- No usable gpgme flavours found.\n"
        "CMake Error at cmake/modules/FindGpgme.cmake:398 (message):\n"
        "  Did not find GPGME\n"
        "Call Stack (most recent call first):\n"
        "  CMakeLists.txt:223 (FIND_PACKAGE)\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 5
    assert problem.kind == "missing-vague-dependency"
    assert problem.details["name"] == "GPGME"


def test_secondary_regressions():
    from buildlog_consultant_spark.engine.core import find_secondary_build_failure

    assert find_secondary_build_failure(["Unknown option --foo"], 10) is not None
    assert find_secondary_build_failure(["Unknown option --foo, ignoring."], 10) is None
    # `E: ` anchored (src/common.rs:5754-5758)
    assert find_secondary_build_failure(["RECOMPILE: main.cc"], 10) is None
    assert find_secondary_build_failure(["E: Build failed"], 10) is not None
    # long line handled gracefully (src/common.rs:5909-5927)
    long_line = "error: " + "a" * 5000
    find_secondary_build_failure([long_line], 1)
    assert find_secondary_build_failure(["Unknown option --foo"], 1) is not None


def test_chown_regressions():
    lines = [
        "chmod 4755 debian/tcptraceroute/usr/bin/tcptraceroute.mt",
        "chown root:root debian/tcptraceroute/usr/bin/tcptraceroute.mt",
        "chown: changing ownership of 'debian/tcptraceroute/usr/bin/tcptraceroute.mt': Operation not permitted",
        "make[1]: *** [debian/rules:23: override_dh_auto_install] Error 1",
    ]
    m, err = find_build_failure_description(lines)
    assert err is None
    assert m.line == lines[2]
    lines = [
        "INSTALL bin/physlock",
        "install: cannot change ownership of '/build/reproducible-path/physlock-13/debian/physlock/usr/bin/physlock': Operation not permitted",
        "make[2]: *** [Makefile:55: install] Error 1",
    ]
    m, err = find_build_failure_description(lines)
    assert err is None
    assert m.line == lines[1]


def test_arch_prefixed_ld_fpic():
    lines = [
        "/usr/bin/x86_64-linux-gnu-ld.bfd: build/dpiGlobal.o: relocation R_X86_64_PC32 against symbol `dpiDebugLevel' can not be used when making a shared object; recompile with -fPIC",
        "/usr/bin/x86_64-linux-gnu-ld.bfd: final link failed: bad value",
        "collect2: error: ld returned 1 exit status",
    ]
    m, err = find_build_failure_description(lines)
    assert err is None
    assert m.line == lines[0]


def test_boost_cmake_components():
    lines = (
        "CMake Error at /usr/share/cmake-3.18/Modules/FindPackageHandleStandardArgs.cmake:165 (message):\n"
        "  Could NOT find Boost (missing: program_options filesystem system graph\n"
        "  serialization iostreams) (found suitable version \"1.74.0\", minimum required\n"
        "  is \"1.55.0\")\n"
        "Call Stack (most recent call first):\n"
        "  /usr/share/cmake-3.18/Modules/FindPackageHandleStandardArgs.cmake:458 (_FPHSA_FAILURE_MESSAGE)\n"
        "  /usr/share/cmake-3.18/Modules/FindBoost.cmake:2177 (find_package_handle_standard_args)\n"
        "  src/CMakeLists.txt:4 (find_package)\n"
    ).splitlines(keepends=True)
    match, problem = find_build_failure_description(lines)
    assert match.lineno == 4
    assert problem.kind == "missing-cmake-components"
    assert problem.details == {
        "name": "Boost",
        "components": [
            "program_options", "filesystem", "system", "graph",
            "serialization", "iostreams",
        ],
    }


def test_just_match_tranche4():
    assert_just_match(
        ["rspec ./spec/acceptance/cookbook_resource_spec.rb:20 # Client API operations downloading a cookbook when the cookbook of the name/version is found downloads the cookbook to the destination"],
        1,
    )
    assert_just_match(
        ["./dconf-paths.c:249: multiple definition of `dconf_is_rel_dir'; client/libdconf-client.a(dconf-paths.c.o):./obj-x86_64-linux-gnu/../common/dconf-paths.c:249: first defined here"],
        1,
    )
    assert_just_match(
        ["/usr/bin/ld: ../lib/libaxe.a(stream.c.o):(.bss+0x10): multiple definition of `gsl_message_mask'; ../lib/libaxe.a(error.c.o):(.bss+0x8): first defined here"],
        1,
    )
    assert_just_match(
        ["[ERROR] Failed to execute goal org.apache.maven.plugins:maven-jar-plugin:3.1.2:jar (default-jar) on project xslthl: Execution default-jar of goal org.apache.maven.plugins:maven-jar-plugin:3.1.2:jar failed: An API incompatibility was encountered while executing org.apache.maven.plugins:maven-jar-plugin:3.1.2:jar: java.lang.NoSuchMethodError: 'void org.codehaus.plexus.util.DirectoryScanner.setFilenameComparator(java.util.Comparator)'"],
        1,
    )
    assert_just_match(
        ['/bin/bash: line 3:  7392 Segmentation fault      itstool -m "${mo}" ${d}/C/index.docbook ${d}/C/legal.xml'],
        1,
    )
    assert_just_match(
        ["/<<PKGBUILDDIR>>/msgpack4nim.nim(470, 6) Error: usage of 'isNil' is a user-defined error"],
        1,
    )
    assert_just_match(
        ["core/src/main/scala/org/json4s/JsonFormat.scala:131: error: No JSON deserializer found for type List[T]. Try to implement an implicit Reader or JsonFormat for this type."],
        1,
    )
    assert_just_match(
        ["../src/Backend/FeedServer.vala:60.98-60.148: error: The name `COLLECTION_CREATE_NONE' does not exist in the context of `Secret.CollectionCreateFlags'"],
        1,
    )
    assert_just_match(
        ["✖ [31mERROR:[39m Cannot find module '/<<PKGBUILDDIR>>/test'"],
        1,
    )
    assert_just_match(["FAIL\tgithub.com/edsrzf/mmap-go\t0.083s"], 1)
    # common.rs:5257-5260 — literal "[31m" (colors already stripped), no
    # "Error:" prefix: no matcher claims it, and no problem is reported
    assert_just_match(
        ["✖ [31mERROR:[39m Cannot find module '/<<PKGBUILDDIR>>/test'"], 1
    )


@pytest.mark.parametrize("lines,lineno,expected", CASES, ids=lambda v: str(v)[:48])
def test_vector(lines, lineno, expected):
    if callable(expected):
        expected = expected()
    assert_match(lines, lineno, expected)


def test_secondary_only():
    assert_just_match(["make: *** [all] Error 2"], 1)
    assert_just_match(["make[2]: *** [Makefile:20: all] Error 2"], 1)
    assert_just_match(["E   DeprecationWarning: use something else"], 1)


def test_just_match_cases():
    # ported from common.rs:3877-3999 and :4156-4164
    assert_just_match(["configure: error:", "", "        Some other error."], 3)
    assert_just_match(
        ["env: ‘/<<PKGBUILDDIR>>/socket-activate’: No such file or directory"], 1
    )
    assert_just_match(
        ["ERROR in Entry module not found: Error: Can't resolve 'index.js' in '/<<PKGBUILDDIR>>'"],
        1,
    )
    assert_just_match(
        ["dh_makeshlibs: The udeb libepoxy0-udeb (>= 1.3) does not contain any shared libraries but --add-udeb=libepoxy0-udeb (>= 1.3) was passed!?"],
        1,
    )
    assert_just_match(
        ["dh: unable to load addon systemd: dh: The systemd-sequence is no longer provided in compat >= 11, please rely on dh_installsystemd instead"],
        1,
    )
    assert_just_match(
        ["dh: The --before option is not supported any longer (#932537). Use override targets instead."],
        1,
    )
    assert_just_match(
        [" " * 40 + "^----^ SC2086: Double quote to prevent globbing and word splitting."],
        1,
    )


def test_no_match_at_all():
    match, problem = find_build_failure_description(["all good here"])
    assert match is None and problem is None


def test_window_bound_250():
    inside = ["pad"] * 300 + ["ModuleNotFoundError: No module named 'x'"]
    m, p = find_build_failure_description(inside)
    assert p is not None and m.lineno == 301
    outside = ["ModuleNotFoundError: No module named 'x'"] + ["pad"] * 300
    m, p = find_build_failure_description(outside)
    assert p is None


def test_first_match_wins_order():
    # chown no-problem rule outranks the later generic make error
    # (src/common.rs:753-764)
    m, p = find_build_failure_description(
        [
            "chown: changing ownership of '/x': Operation not permitted",
            "make[2]: *** [Makefile:5: install] Error 1",
        ]
    )
    assert p is None
    assert m.lineno == 1
