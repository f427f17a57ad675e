"""Primary catalog, part 3 — ported in order from
/root/reference/src/common.rs:1600-2285 (up to the first "ADD NEW REGEXES
ABOVE THIS LINE" marker)."""

from __future__ import annotations

from ..core.matchers import rule
from ..core.problems import (
    ChrootNotFound,
    CodeCoverageTooLow,
    DebianVersionRejected,
    DhAddonLoadFailure,
    DirectoryNonExistant,
    ESModuleMustUseImport,
    InactiveKilled,
    InvalidCurrentUser,
    MinimumAutoconfTooOld,
    MismatchGettextVersions,
    MissingCargoCrate,
    MissingCHeader,
    MissingCommand,
    MissingDebianBuildDep,
    MissingFile,
    MissingFontspec,
    MissingGitIdentity,
    MissingGnulibDirectory,
    MissingGoModFile,
    MissingGoRuntime,
    MissingPerlPredeclared,
    MissingGoSumEntry,
    MissingHaskellModule,
    MissingJavaScriptRuntime,
    MissingLatexFile,
    MissingLibrary,
    MissingLibtool,
    MissingLuaModule,
    MissingMakeTarget,
    MissingNodePackage,
    MissingPauseCredentials,
    MissingPerlDistributionFile,
    MissingPerlModule,
    MissingPHPExtension,
    MissingPkgConfig,
    MissingPythonDistribution,
    MissingPythonModule,
    MissingQtModules,
    MissingRPackage,
    MissingRubyFile,
    MissingSecretGpgKey,
    MissingVagueDependency,
    MissingVcVersionerVersion,
    MissingXDisplay,
    NeedPgBuildExtUpdateControl,
    NoSpaceOnDevice,
    OutdatedGoModFile,
    PatchApplicationFailed,
    UnknownCertificateAuthority,
    ValaCompilerCannotCompile,
    VcsControlDirectoryNeeded,
    python_distribution_from_requirement,
)
from .cmake import CMakeErrorMatcher
from .custom import HaskellMissingDependencyMatcher, PythonFileNotFoundErrorMatcher, SetupPyCommandMissingMatcher
from .helpers import (
    command_missing,
    file_not_found,
    file_not_found_maybe_executable,
    pkg_config_missing,
)


def _coverage_too_low(m):
    try:
        return CodeCoverageTooLow(float(m.group(1)), float(m.group(2)))
    except ValueError:
        return None


def _cargo_select_version(m):
    # src/common.rs:1832-1846
    parts = m.group(1).split(" ", 1)
    if len(parts) == 2:
        return MissingCargoCrate(parts[0], parts[1])
    return MissingCargoCrate(m.group(1), None)


def _pip_wheel_failed(m):
    # src/common.rs:1936-1943
    pv = m.group(2)
    python_version = int(pv.split(".")[0]) if pv else None
    return python_distribution_from_requirement(m.group(3), python_version)


PART3 = [
    # Java
    rule(r"error: Source option [0-9] is no longer supported. Use [0-9] or later.", lambda m: None),
    rule(
        r"(dh.*|jh_build): -s/--same-arch has been removed; please use -a/--arch instead",
        lambda m: None,
    ),
    rule(
        r"dh_systemd_start: dh_systemd_start is no longer used in compat >= 11, please use dh_installsystemd instead",
        lambda m: None,
    ),
    rule(r"Trying patch (.*) at level 1 \.\.\. 0 \.\.\. 2 \.\.\. failure.", lambda m: None),
    # QMake
    rule(r"Project ERROR: (.*) development package not found", pkg_config_missing),
    rule(r"Package \'(.*)\', required by \'(.*)\', not found\n", pkg_config_missing),
    rule(r"pkg-config cannot find (.*)", pkg_config_missing),
    rule(
        r"configure: error: .* not found: Package dependency requirement \'([^\']+)\' could not be satisfied.",
        pkg_config_missing,
    ),
    rule(
        r"configure: error: (.*) is required to build documentation",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(r".*:[0-9]+: (.*) does not exist.", file_not_found),
    # uglifyjs
    rule(r"ERROR: can\'t read file: (.*)", file_not_found),
    rule(r'jh_build: Cannot find \(any matches for\) "(.*)" \(tried in .*\)', lambda m: None),
    rule(
        r"--   Package \'(.*)\', required by \'(.*)\', not found",
        lambda m: MissingPkgConfig.simple(m.group(1)),
    ),
    rule(
        r".*.rb:[0-9]+:in `require_relative\': cannot load such file -- (.*) \(LoadError\)",
        lambda m: None,
    ),
    rule(
        r"<internal:.*>:[0-9]+:in `require': cannot load such file -- (.*) \(LoadError\)",
        lambda m: MissingRubyFile(m.group(1)),
    ),
    rule(
        r".*.rb:[0-9]+:in `require\': cannot load such file -- (.*) \(LoadError\)",
        lambda m: MissingRubyFile(m.group(1)),
    ),
    rule(r"LoadError: cannot load such file -- (.*)", lambda m: MissingRubyFile(m.group(1))),
    rule(r"  cannot load such file -- (.*)", lambda m: MissingRubyFile(m.group(1))),
    # TODO(upstream): fairly generic; perhaps combine with other ruby checks
    rule(r"File does not exist: ([a-z/]+)$", lambda m: MissingRubyFile(m.group(1))),
    rule(
        r".*:[0-9]+:in `do_check_dependencies\': E: dependency resolution check requested but no working gemspec available \(RuntimeError\)",
        lambda m: None,
    ),
    rule(r"rm: cannot remove \'(.*)\': Is a directory", lambda m: None),
    rule(r"rm: cannot remove \'(.*)\': No such file or directory", file_not_found),
    # Invalid option from Python
    rule(r"error: option .* not recognized", lambda m: None),
    # Invalid option from go
    rule(r"flag provided but not defined: .*", lambda m: None),
    rule(
        r'CMake Error: The source directory "(.*)" does not exist.',
        lambda m: DirectoryNonExistant(m.group(1)),
    ),
    rule(r".*: [0-9]+: cd: can\'t cd to (.*)", lambda m: DirectoryNonExistant(m.group(1))),
    rule(r"/bin/sh: 0: Can\'t open (.*)", file_not_found_maybe_executable),
    rule(r"/bin/sh: [0-9]+: cannot open (.*): No such file", file_not_found_maybe_executable),
    rule(r".*: line [0-9]+: (.*): No such file or directory", file_not_found_maybe_executable),
    rule(r"/bin/sh: [0-9]+: Syntax error: .*", lambda m: None),
    rule(r"error: No member named \$memberName", lambda m: None),
    rule(
        r"(?:/usr/bin/)?install: cannot create regular file \'(.*)\': Permission denied",
        lambda m: None,
    ),
    rule(r"(?:/usr/bin/)?install: cannot create directory .(.*).: File exists", lambda m: None),
    rule(r"/usr/bin/install: missing destination file operand after .*", lambda m: None),
    # Ruby
    rule(r"rspec .*\.rb:[0-9]+ # (.*)", lambda m: None),
    # help2man
    rule(r"Addendum (.*) does NOT apply to (.*) \(translation discarded\).", lambda m: None),
    rule(
        r"dh_installchangelogs: copy\((.*), (.*)\): No such file or directory",
        file_not_found,
    ),
    rule(r"dh_installman: mv (.*) (.*): No such file or directory", file_not_found),
    rule(r"dh_installman: Could not determine section for (.*)", lambda m: None),
    rule(
        r"failed to initialize build cache at (.*): mkdir (.*): permission denied",
        lambda m: None,
    ),
    rule(
        r'Can\'t exec "(.*)": No such file or directory at (.*) line ([0-9]+).',
        command_missing,
    ),
    rule(r'E OSError: No command "(.*)" found on host .*', command_missing),
    # PHPUnit
    rule(r'Cannot open file "(.*)".', file_not_found),
    rule(
        r".*Could not find a JavaScript runtime\. See https://github.com/rails/execjs for a list of available runtimes\..*",
        lambda m: MissingJavaScriptRuntime(),
    ),
    PythonFileNotFoundErrorMatcher(),
    # ruby
    rule(r"Errno::ENOENT: No such file or directory - (.*)", file_not_found),
    rule(r"(.*.rb):[0-9]+:in `.*\': .* \(.*\) ", lambda m: None),
    # JavaScript
    rule(r".*: ENOENT: no such file or directory, open \'(.*)\'", file_not_found),
    rule(r"\[Error: ENOENT: no such file or directory, stat \'(.*)\'\] \{", file_not_found),
    rule(
        r"(.*):[0-9]+: error: Libtool library used but \'LIBTOOL\' is undefined",
        lambda m: MissingLibtool(),
    ),
    # libtoolize
    rule(r"libtoolize:   error: \'(.*)\' does not exist.", file_not_found),
    # Seen in python-cogent
    rule(
        "(OSError|RuntimeError): (.*) required but not found.",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"RuntimeError: The (.*) executable cannot be found\. Please check if it is in the system path\.",
        lambda m: MissingCommand(m.group(1).lower()),
    ),
    rule(r".*: [0-9]+: cannot open (.*): No such file", file_not_found),
    rule(r"Cannot find Git. Git is required for .*", lambda m: MissingCommand("git")),
    rule(
        r"E ImportError: Bad (.*) executable\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        "RuntimeError: (.*) is missing",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"(OSError|RuntimeError): Could not find (.*) library\..*",
        lambda m: MissingLibrary(m.group(2)),
    ),
    rule(
        r"(OSError|RuntimeError): We need package (.*), but not importable",
        lambda m: MissingPythonDistribution(m.group(2), None, None),
    ),
    rule(
        r"(OSError|RuntimeError): No (.*) was found: .*",
        lambda m: MissingVagueDependency.simple(m.group(2)),
    ),
    rule(
        r"(.*)meson.build:[0-9]+:[0-9]+: ERROR: Meson version is (.+) but project requires >=\s*(.+)",
        lambda m: MissingVagueDependency(
            "meson",
            minimum_version=m.group(3).rstrip("."),
            current_version=m.group(2),
        ),
    ),
    # Seen in cpl-plugin-giraf
    rule(
        r"ImportError: Numpy version (.*) or later must be installed to use .*",
        lambda m: MissingPythonModule("numpy", None, m.group(1)),
    ),
    # Seen in mayavi2
    rule(r"\w+Numpy is required to build.*", lambda m: MissingPythonModule.simple("numpy")),
    # autoconf
    rule(r"configure.ac:[0-9]+: error: required file \'(.*)\' not found", file_not_found),
    rule(
        r"/usr/bin/m4:(.*):([0-9]+): cannot open `(.*)\': No such file or directory",
        lambda m: MissingFile(m.group(3)),
    ),
    # automake
    rule(r"Makefile.am: error: required file \'(.*)\' not found", file_not_found),
    # sphinx
    rule(r"config directory doesn\'t contain a conf.py file \((.*)\)", lambda m: None),
    # vcversioner
    rule(
        r"vcversioner: no VCS could be detected in \'/<<PKGBUILDDIR>>\' and \'/<<PKGBUILDDIR>>/version.txt\' isn\'t present.",
        lambda m: None,
    ),
    # rst2html (and other Python?)
    rule(r"  InputError: \[Errno 2\] No such file or directory: \'(.*)\'", file_not_found),
    # gpg
    rule(r"gpg: can\'t connect to the agent: File name too long", lambda m: None),
    rule(r"(.*.lua):[0-9]+: assertion failed", lambda m: None),
    rule(r"\s+\^\-\-\-\-\^ SC[0-4][0-9][0-9][0-9]: .*", lambda m: None),
    rule(
        r"Error: (.*) needs updating from (.*)\. Run \'pg_buildext updatecontrol\'.",
        lambda m: NeedPgBuildExtUpdateControl(m.group(1), m.group(2)),
    ),
    rule(
        r"Patch (.*) does not apply \(enforce with -f\)",
        lambda m: PatchApplicationFailed(m.group(1)),
    ),
    rule(
        r"java.io.FileNotFoundException: ([^ ]+) \(No such file or directory\)",
        file_not_found,
    ),
    # Pytest
    rule(r"INTERNALERROR> PluginValidationError: (.*)", lambda m: None),
    rule(r"[0-9]+ out of [0-9]+ hunks FAILED -- saving rejects to file (.*\.rej)", lambda m: None),
    rule(r"pkg_resources.UnknownExtra: (.*) has no such extra feature \'(.*)\'", lambda m: None),
    rule(
        r"dh_auto_configure: invalid or non-existing path to the source directory: .*",
        lambda m: None,
    ),
    # Sphinx
    rule(
        r"(.*) is no longer a hard dependency since version (.*). Please install it manually.\(pip install (.*)\)",
        lambda m: MissingPythonModule.simple(m.group(1)),
    ),
    rule(r"There is a syntax error in your configuration file: (.*)", lambda m: None),
    rule(
        r"E: The Debian version (.*) cannot be used as an ELPA version.",
        lambda m: DebianVersionRejected(m.group(1)),
    ),
    rule(r'"(.*)" is not exported by the ExtUtils::MakeMaker module', lambda m: None),
    rule(
        r"E: Please add appropriate interpreter package to Build-Depends, see pybuild\(1\) for details\..*",
        lambda m: DhAddonLoadFailure("pybuild", "Debian/Debhelper/Buildsystem/pybuild.pm"),
    ),
    rule(r"dpkg: error: .*: No space left on device", lambda m: NoSpaceOnDevice()),
    rule(
        r"You need the GNU readline library\(ftp://ftp.gnu.org/gnu/readline/\s+\) to build",
        lambda m: MissingLibrary("readline"),
    ),
    rule(
        r"configure: error: Could not find lib(.*)",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"    Could not find module ‘(.*)’",
        lambda m: MissingHaskellModule(m.group(1)),
    ),
    rule(r"E: session: (.*): Chroot not found", lambda m: ChrootNotFound(m.group(1))),
    HaskellMissingDependencyMatcher(),
    SetupPyCommandMissingMatcher(),
    CMakeErrorMatcher(),
    rule(
        r"error: failed to select a version for the requirement `(.*)`",
        _cargo_select_version,
    ),
    rule(r"^Environment variable \$SOURCE_DATE_EPOCH: No digits were found: $"),
    rule(
        r"\[ERROR\] LazyFont - Failed to read font file (.*) \<java.io.FileNotFoundException: (.*) \(No such file or directory\)\>java.io.FileNotFoundException: (.*) \(No such file or directory\)",
        lambda m: MissingFile(m.group(1)),
    ),
    rule(r"qt.qpa.xcb: could not connect to display", lambda m: MissingXDisplay()),
    rule(
        r"\(.*:[0-9]+\): Gtk-WARNING \*\*: [0-9]{2}:[0-9]{2}:[0-9]{2}\.[0-9]{3}: cannot open display: ",
        lambda m: MissingXDisplay(),
    ),
    rule(
        r"\s*Package (.*) was not found in the pkg-config search path.",
        lambda m: MissingPkgConfig.simple(m.group(1)),
    ),
    rule(r"Can't open display", lambda m: MissingXDisplay()),
    rule(r"Can't open (.+): No such file or directory.*", file_not_found),
    rule(
        r"pkg-config does not know (.*) at .*\.",
        lambda m: MissingPkgConfig.simple(m.group(1)),
    ),
    rule(
        r"\*\*\* Please install (.*) \(atleast version (.*)\) or adjust",
        lambda m: MissingPkgConfig(m.group(1), m.group(2)),
    ),
    rule(
        r"go runtime is required: https://golang.org/doc/install",
        lambda m: MissingGoRuntime(),
    ),
    rule(
        r"\%Error: '(.*)' must be installed to build",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r'configure: error: "Could not find (.*) in PATH',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(r"Could not find executable (.*)", lambda m: MissingCommand(m.group(1))),
    rule(
        r'go: .*: Get \"(.*)\": x509: certificate signed by unknown authority',
        lambda m: UnknownCertificateAuthority(m.group(1)),
    ),
    rule(
        r'.*.go:[0-9]+:[0-9]+: .*: Get \"(.*)\": x509: certificate signed by unknown authority',
        lambda m: UnknownCertificateAuthority(m.group(1)),
    ),
    rule(
        r"fatal: unable to access '(.*)': server certificate verification failed. CAfile: none CRLfile: none",
        lambda m: UnknownCertificateAuthority(m.group(1)),
    ),
    rule(
        r"curl: \(77\) error setting certificate verify locations:  CAfile: (.*) CApath: (.*)",
        lambda m: MissingFile(m.group(1)),
    ),
    rule(
        r"\t\(Do you need to predeclare (.*)\?\)",
        lambda m: MissingPerlPredeclared(m.group(1)),
    ),
    rule(
        r'Bareword \"(.*)\" not allowed while \"strict subs\" in use at Makefile.PL line ([0-9]+).',
        lambda m: MissingPerlPredeclared(m.group(1)),
    ),
    rule(
        r'String found where operator expected at Makefile.PL line ([0-9]+), near "([a-z0-9_]+).*"',
        lambda m: MissingPerlPredeclared(m.group(2)),
    ),
    rule(r"  vignette builder 'knitr' not found", lambda m: MissingRPackage.simple("knitr")),
    rule(
        r"fatal: unable to auto-detect email address \(got \'.*\'\)",
        lambda m: MissingGitIdentity(),
    ),
    rule(
        r"E       fatal: unable to auto-detect email address \(got \'.*\'\)",
        lambda m: MissingGitIdentity(),
    ),
    rule(r"gpg: no default secret key: No secret key", lambda m: MissingSecretGpgKey()),
    rule(
        r"ERROR: FAILED--Further testing stopped: Test requires module \'(.*)\' but it\'s not found",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"(subprocess.CalledProcessError|error): Command \'\[\'/usr/bin/python([0-9.]*)\', \'-m\', \'pip\', \'--disable-pip-version-check\', \'wheel\', \'--no-deps\', \'-w\', .*, \'([^-][^\']+)\'\]\' returned non-zero exit status 1.",
        _pip_wheel_failed,
    ),
    rule(
        r"vcversioner: \[\'git\', .*, \'describe\', \'--tags\', \'--long\'\] failed and \'(.*)/version.txt\' isn\'t present\.",
        lambda m: MissingVcVersionerVersion(),
    ),
    rule(
        r"vcversioner: no VCS could be detected in '(.*)' and '(.*)/version.txt' isn't present\.",
        lambda m: MissingVcVersionerVersion(),
    ),
    rule(
        r"You don't have a working TeX binary \(tex\) installed anywhere in",
        lambda m: MissingCommand("tex"),
    ),
    rule(
        r"# Module \'(.*)\' is not installed",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r'Base class package "(.*)" is empty.',
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"    \!  (.*::.*) is not installed",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"Cannot find (.*) in @INC at (.*) line ([0-9]+)\.",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"(.*::.*) (.*) is required to configure our .* dependency, please install it manually or upgrade your CPAN/CPANPLUS",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"configure: error: Missing lib(.*)\.",
        lambda m: MissingLibrary(m.group(1)),
    ),
    rule(
        r"OSError: (.*): cannot open shared object file: No such file or directory",
        lambda m: MissingFile(m.group(1)),
    ),
    rule(
        r'The "(.*)" executable has not been found\.',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"  '\! LaTeX Error: File `(.*)' not found.'",
        lambda m: MissingLatexFile(m.group(1)),
    ),
    rule(
        r"\! LaTeX Error: File `(.*)\' not found\.",
        lambda m: MissingLatexFile(m.group(1)),
    ),
    rule(
        r'(\!|.*:[0-9]+:) Package fontspec Error: The font \"(.*)\" cannot be found\.',
        lambda m: MissingFontspec(m.group(2)),
    ),
    rule(
        r"  vignette builder \'(.*)\' not found",
        lambda m: MissingRPackage.simple(m.group(1)),
    ),
    rule(
        r"Error: package [‘'](.*)[’'] (.*) was found, but >= (.*) is required by [‘'](.*)[’']",
        lambda m: MissingRPackage(m.group(1), m.group(3)),
    ),
    rule(
        r"\s*there is no package called \'(.*)\'",
        lambda m: MissingRPackage.simple(m.group(1)),
    ),
    rule(
        r"Error in .*: there is no package called ‘(.*)’",
        lambda m: MissingRPackage.simple(m.group(1)),
    ),
    rule(
        r"Exception: cannot execute command due to missing interpreter: (.*)",
        command_missing,
    ),
    rule(
        r"E: Build killed with signal TERM after ([0-9]+) minutes of inactivity",
        lambda m: InactiveKilled(int(m.group(1))),
    ),
    rule(
        r'\[.*Authority\] PAUSE credentials not found in "config.ini" or "dist.ini" or "~/.pause"\! Please set it or specify an authority for this plugin. at inline delegation in Dist::Zilla::Plugin::Authority for logger->log_fatal \(attribute declared in /usr/share/perl5/Dist/Zilla/Role/Plugin.pm at line [0-9]+\) line [0-9]+\.',
        lambda m: MissingPauseCredentials(),
    ),
    rule(
        r"npm ERR\! ERROR: \[Errno 2\] No such file or directory: \'(.*)\'",
        file_not_found,
    ),
    rule(
        r"\*\*\* error: gettext infrastructure mismatch: using a Makefile\.in\.in from gettext version ([0-9.]+) but the autoconf macros are from gettext version ([0-9.]+)",
        lambda m: MismatchGettextVersions(m.group(1), m.group(2)),
    ),
    rule(
        r"You need to install the (.*) package to use this program\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"You need to install (.*)",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: You don't seem to have the (.*) library installed\..*",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"configure: error: You need (.*) installed",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"open3: exec of cme (.*) failed: No such file or directory at .*/Dist/Zilla/Plugin/Run/Role/Runner.pm line [0-9]+\.",
        lambda m: MissingPerlModule.simple(f"App::Cme::Command::{m.group(1)}"),
    ),
    rule(
        r"pg_ctl: cannot be run as (.*)",
        lambda m: InvalidCurrentUser(m.group(1)),
    ),
    rule(
        r"([^ ]+) \(for section ([^ ]+)\) does not appear to be installed",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"(.*) version (.*) required--this is only version (.*) at .*\.pm line [0-9]+\.",
        lambda m: MissingPerlModule(None, m.group(1), None, m.group(2)),
    ),
    rule(
        r"Bailout called\.  Further testing stopped:  YOU ARE MISSING REQUIRED MODULES: \[ ([^,]+)(.*) \]:",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r'CMake Error: CMake was unable to find a build program corresponding to "(.*)".  CMAKE_MAKE_PROGRAM is not set\.  You probably need to select a different build tool\.',
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"Dist currently only works with Git or Mercurial repos",
        lambda m: VcsControlDirectoryNeeded(["git", "hg"]),
    ),
    rule(
        r"GitHubMeta: need a .git\/config file, and you don\'t have one",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r"Exception: Versioning for this project requires either an sdist tarball, or access to an upstream git repository\. It's also possible that there is a mismatch between the package name in setup.cfg and the argument given to pbr\.version\.VersionInfo\. Project name .* was given, but was not able to be found\.",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r"configure: error: no suitable Python interpreter found",
        lambda m: MissingCommand("python"),
    ),
    rule(
        r'Could not find external command "(.*)"',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"  Failed to find (.*) development headers\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"\*\*\* \Subdirectory \'(.*)\' does not yet exist. Use \'./gitsub.sh pull\' to create it, or set the environment variable GNULIB_SRCDIR\.",
        lambda m: MissingGnulibDirectory(m.group(1)),
    ),
    rule(
        r"configure: error: Cap\'n Proto compiler \(capnp\) not found.",
        lambda m: MissingCommand("capnp"),
    ),
    rule(
        r"lua: (.*):(\d+): module \'(.*)\' not found:",
        lambda m: MissingLuaModule(m.group(3)),
    ),
    rule(r"Unknown key\(s\) in sphinx_gallery_conf:"),
    rule(r"(.+\.gir):In (.*): error: (.*)"),
    rule(r"(.+\.gir):[0-9]+\.[0-9]+-[0-9]+\.[0-9]+: error: (.*)"),
    rule(r"psql:.*\.sql:[0-9]+: ERROR:  (.*)"),
    rule(r"intltoolize: \'(.*)\' is out of date: use \'--force\' to overwrite"),
    rule(
        r"E: pybuild pybuild:[0-9]+: cannot detect build system, please use --system option or set PYBUILD_SYSTEM env\. variable"
    ),
    rule(
        r"--   Requested \'(.*) >= (.*)\' but version of (.*) is (.*)",
        lambda m: MissingPkgConfig(m.group(1), m.group(2)),
    ),
    rule(
        r".*Could not find (.*) lib/headers, please set .* or ensure (.*).pc is in PKG_CONFIG_PATH\.",
        lambda m: MissingPkgConfig.simple(m.group(2)),
    ),
    rule(
        r"go: go.mod file not found in current directory or any parent directory; see \'go help modules\'",
        lambda m: MissingGoModFile(),
    ),
    rule(
        r"go: cannot find main module, but found Gopkg.lock in (.*)",
        lambda m: MissingGoModFile(),
    ),
    rule(
        r"go: updates to go.mod needed; to update it:",
        lambda m: OutdatedGoModFile(),
    ),
    rule(r"(c\+\+|collect2|cc1|g\+\+): fatal error: .*"),
    rule(r"fatal: making (.*): failed to create tests\/decode.trs"),
    # ocaml
    rule(r"Please specify at most one of .*"),
    # Python lint
    rule(r".*\.py:[0-9]+:[0-9]+: [A-Z][0-9][0-9][0-9] .*"),
    rule(
        r'PHPUnit requires the "(.*)" extension\.',
        lambda m: MissingPHPExtension(m.group(1)),
    ),
    rule(
        r'     \[exec\] PHPUnit requires the "(.*)" extension\.',
        lambda m: MissingPHPExtension(m.group(1)),
    ),
    rule(
        r".*/gnulib-tool: \*\*\* minimum supported autoconf version is (.*)\. ",
        lambda m: MinimumAutoconfTooOld(m.group(1)),
    ),
    rule(
        r"configure.(ac|in):[0-9]+: error: Autoconf version (.*) or higher is required",
        lambda m: MissingVagueDependency("autoconf", minimum_version=m.group(2)),
    ),
    rule(
        r'# Error: The file "(MANIFEST|META.yml)" is missing from this distribution\\. .*',
        lambda m: MissingPerlDistributionFile(m.group(1)),
    ),
    rule(r"^  ([^ ]+) does not exist$", file_not_found),
    rule(
        r"\s*> Cannot find \'\.git\' directory",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r"Unable to find the \'(.*)\' executable\. .*",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"\[@RSRCHBOY\/CopyrightYearFromGit\]  -  412 No \.git subdirectory found",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r"Couldn\'t find version control data \(git/hg/bzr/svn supported\)",
        lambda m: VcsControlDirectoryNeeded(["git", "hg", "bzr", "svn"]),
    ),
    rule(
        r"RuntimeError: Unable to determine package version. No local Git clone detected, and no version file found at .*",
        lambda m: VcsControlDirectoryNeeded(["git"]),
    ),
    rule(
        r'"(.*)" failed to start: "No such file or directory" at .*.pm line [0-9]+\.',
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(r"Can\'t find ([^ ]+)\.", lambda m: MissingCommand(m.group(1))),
    rule(r"Error: spawn (.*) ENOENT", lambda m: MissingCommand(m.group(1))),
    rule(
        r"E ImportError: Failed to initialize: Bad (.*) executable\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r'ESLint couldn\'t find the config "(.*)" to extend from\. Please check that the name of the config is correct\.'
    ),
    rule(
        r'E OSError: no library called "cairo-2" was found',
        # reference uses m.get(1) (src/common.rs:2203-2206) but the pattern
        # has no groups — panic when fired; the literal is the evident intent
        lambda m: MissingLibrary("cairo-2"),
    ),
    rule(
        r"ERROR: \[Errno 2\] No such file or directory: '(.*)'",
        file_not_found_maybe_executable,
    ),
    rule(
        r"error: \[Errno 2\] No such file or directory: '(.*)'",
        file_not_found_maybe_executable,
    ),
    rule(
        r"We need the Python library (.+) to be installed\. .*",
        lambda m: MissingPythonDistribution.simple(m.group(1)),
    ),
    # Waf
    rule(
        r"Checking for header (.+\.h|.+\.hpp)\s+: not found ",
        lambda m: MissingCHeader(m.group(1)),
    ),
    rule(r"000: File does not exist (.*)", file_not_found),
    rule(
        r"ERROR: Coverage for lines \(([0-9.]+)%\) does not meet global threshold \(([0-9]+)%\)",
        # [0-9.]+ admits multi-dot garbage the reference's parse().unwrap()
        # would panic on — degrade to a match with no problem instead
        lambda m: _coverage_too_low(m),
    ),
    rule(
        r"Error \[ERR_REQUIRE_ESM\]: Must use import to load ES Module: (.*)",
        lambda m: ESModuleMustUseImport(m.group(1)),
    ),
    rule(r".* (/<<BUILDDIR>>/.*): No such file or directory", file_not_found),
    rule(
        r"Cannot open file `(.*)' in mode `(.*)' \(No such file or directory\)",
        file_not_found,
    ),
    rule(r"[^:]+: cannot stat \'(.*)\': No such file or directory", file_not_found),
    rule(r"cat: (.*): No such file or directory", file_not_found),
    rule(r"ls: cannot access \'(.*)\': No such file or directory", file_not_found),
    rule(
        r"Problem opening (.*): No such file or directory at (.*) line ([0-9]+)\.",
        file_not_found,
    ),
    rule(r"/bin/bash: (.*): No such file or directory", file_not_found),
    rule(
        r'\(The package "(.*)" was not found when loaded as a Node module from the directory ".*"\.\)',
        lambda m: MissingNodePackage(m.group(1)),
    ),
    rule(
        r"\+\-\- UNMET DEPENDENCY (.*)",
        lambda m: MissingNodePackage(m.group(1)),
    ),
    rule(
        r"Project ERROR: Unknown module\(s\) in QT: (.*)",
        lambda m: MissingQtModules(m.group(1).split()),
    ),
    rule(
        r"(.*):(\d+):(\d+): ERROR: Vala compiler \'.*\' can not compile programs",
        lambda m: ValaCompilerCannotCompile(),
    ),
    rule(
        r"(.*):(\d+):(\d+): ERROR: Problem encountered: Cannot load ([^ ]+) library\. (.*)",
        lambda m: MissingLibrary(m.group(4)),
    ),
    rule(
        r"go: (.*)@(.*): missing go.sum entry; to add it:",
        lambda m: MissingGoSumEntry(m.group(1), m.group(2)),
    ),
    rule(
        r"E: pybuild pybuild:(.*): configure: plugin (.*) failed with: PEP517 plugin dependencies are not available\. Please Build-Depend on (.*)\.",
        # reference uses group 1 here (likely upstream bug) — kept for parity
        lambda m: MissingDebianBuildDep(m.group(1)),
    ),
    rule(
        r"^make\[[0-9]+\]: \*\*\* No rule to make target '(.*)', needed by '(.*)'\.  Stop\.$",
        lambda m: MissingMakeTarget(m.group(1), m.group(2)),
    ),
    rule(
        r"make: \*\*\* No rule to make target \'(.*)\'\.  Stop\.",
        lambda m: MissingMakeTarget(m.group(1)),
    ),
    rule(
        r"make\[[0-9]+\]: \*\*\* No rule to make target \'(.*)\'\.  Stop\.",
        lambda m: MissingMakeTarget(m.group(1)),
    ),
    # ADD NEW REGEXES ABOVE THIS LINE (src/common.rs:2286)
]
