"""Primary catalog, part 2 — ported in order from
/root/reference/src/common.rs:1060-1599."""

from __future__ import annotations

import posixpath

from ..core.matchers import rule
from ..core.problems import (
    Cancelled,
    CcacheError,
    DebhelperPatternNotFound,
    DhAddonLoadFailure,
    DhLinkDestinationIsDirectory,
    DhMissingUninstalled,
    DhUntilUnsupported,
    DirectoryNonExistant,
    DisappearedSymbols,
    DuplicateDHCompatLevel,
    GnomeCommonMissing,
    ImageMagickDelegateMissing,
    MissingAutoconfMacro,
    MissingAutomakeInput,
    MissingCommand,
    MissingConfigStatusInput,
    MissingDHCompatLevel,
    MissingGnomeCommonDependency,
    MissingJavaClass,
    MissingJDK,
    MissingJDKFile,
    MissingJRE,
    MissingJVM,
    MissingLibrary,
    MissingMavenArtifacts,
    MissingNodePackage,
    MissingPerlFile,
    MissingPerlManifest,
    MissingPerlModule,
    MissingPhpClass,
    MissingPythonDistribution,
    MissingRPackage,
    MissingRubyGem,
    MissingSprocketsFile,
    MissingVagueDependency,
    MissingValaPackage,
    MissingXfceDependency,
    MissingXmlEntity,
    NoSpaceOnDevice,
    NotExecutableFile,
    SetuptoolScmVersionIssue,
    UpstartFilePresent,
)
from .helpers import (
    command_missing,
    file_not_found,
    file_not_found_maybe_executable,
    maven_missing_artifact,
    r_missing_package,
    ruby_missing_gem,
    webpack_file_missing,
)

# src/common.rs:489
MAVEN_ERROR_PREFIX = "(?:\\[ERROR\\]|\\[\x1b\\[1;31mERROR\x1b\\[m\\]) "

PART2 = [
    rule(
        r'Can\'t locate object method "(.*)" via package "(.*)" \(perhaps you forgot to load "(.*)"\?\) at .*.pm line [0-9]+\.',
        lambda m: MissingPerlModule.simple(m.group(2)),
    ),
    rule(
        r">\(error\): Could not expand \[(.*)'",
        lambda m: MissingPerlModule.simple(m.group(1).strip().strip("'")),
    ),
    rule(
        r"\[DZ\] could not load class (.*) for license (.*)",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"\- ([^\s]+)\s+\.\.\.missing. \(would need (.*)\)",
        lambda m: MissingPerlModule(None, m.group(1), None, m.group(2)),
    ),
    rule(
        r"Required plugin bundle ([^ ]+) isn't installed.",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"Required plugin ([^ ]+) isn't installed.",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r".*Can't locate (.*) in @INC \(@INC contains: (.*)\) at .* line .*.",
        lambda m: MissingPerlFile(m.group(1), m.group(2).split(" ")),
    ),
    rule(
        r"Can't find author dependency ([^ ]+) at (.*) line ([0-9]+).",
        lambda m: MissingPerlModule.simple(m.group(1)),
    ),
    rule(
        r"Can't find author dependency ([^ ]+) version (.*) at (.*) line ([0-9]+).",
        lambda m: MissingPerlModule(None, m.group(1), None, m.group(2)),
    ),
    rule(
        r"> Could not find (.*)\. Please check that (.*) contains a valid JDK installation.",
        lambda m: MissingJDKFile(m.group(2), m.group(1)),
    ),
    rule(
        r"> Could not find (.*)\. Please check that (.*) contains a valid \(and compatible\) JDK installation.",
        lambda m: MissingJDKFile(m.group(2), m.group(1)),
    ),
    rule(
        r"> Kotlin could not find the required JDK tools in the Java installation '(.*)' used by Gradle. Make sure Gradle is running on a JDK, not JRE.",
        lambda m: MissingJDK(m.group(1)),
    ),
    rule(
        r"> JDK_5 environment variable is not defined. It must point to any JDK that is capable to compile with Java 5 target \((.*)\)",
        lambda m: MissingJDK(m.group(1)),
    ),
    rule(
        r"ERROR: JAVA_HOME is not set and no 'java' command could be found in your PATH.",
        lambda m: MissingJRE(),
    ),
    rule(
        r'Error: environment variable "JAVA_HOME" must be set to a JDK \(>= v(.*)\) installation directory',
        lambda m: MissingJDK(m.group(1)),
    ),
    rule(
        r"(?:/usr/bin/)?install: cannot create regular file '(.*)': No such file or directory",
        file_not_found,
    ),
    rule(r"Cannot find source directory \((.*)\)", file_not_found),
    rule(
        r"python[0-9.]*: can't open file '(.*)': \[Errno 2\] No such file or directory",
        file_not_found,
    ),
    rule(
        r"^error: \[Errno 2\] No such file or directory: '(.*)'",
        file_not_found_maybe_executable,
    ),
    rule(
        r".*:[0-9]+:[0-9]+: ERROR: <ExternalProgram 'python3' -> \['/usr/bin/python3'\]> is not a valid python or it is missing setuptools",
        lambda m: MissingPythonDistribution("setuptools", 3, None),
    ),
    rule(r"OSError: \[Errno 28\] No space left on device", lambda m: NoSpaceOnDevice()),
    # python:setuptools_scm
    rule(
        r"^LookupError: setuptools-scm was unable to detect version for '.*'\.",
        lambda m: SetuptoolScmVersionIssue(),
    ),
    rule(
        r"^LookupError: setuptools-scm was unable to detect version for .*\.",
        lambda m: SetuptoolScmVersionIssue(),
    ),
    rule(r"^OSError: 'git' was not found", lambda m: MissingCommand("git")),
    rule(r"^OSError: No such file (.*)", file_not_found_maybe_executable),
    rule(
        r"^Could not open '(.*)': No such file or directory at /usr/share/perl/[0-9.]+/ExtUtils/MM_Unix.pm line [0-9]+.",
        lambda m: MissingPerlFile(m.group(1), None),
    ),
    rule(
        r'^Can\'t open perl script "(.*)": No such file or directory',
        lambda m: MissingPerlFile(m.group(1), None),
    ),
    # Maven
    rule(
        MAVEN_ERROR_PREFIX
        + r"Failed to execute goal on project .*: \x1b\[1;31mCould not resolve dependencies for project .*: The following artifacts could not be resolved: (.*): Could not find artifact (.*) in (.*) \((.*)\)\x1b\[m -> \x1b\[1m\[Help 1\]\x1b\[m",
        maven_missing_artifact,
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Failed to execute goal on project .*: \x1b\[1;31mCould not resolve dependencies for project .*: Could not find artifact (.*)\x1b\[m .*",
        maven_missing_artifact,
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Failed to execute goal on project .*: Could not resolve dependencies for project .*: The following artifacts could not be resolved: (.*): Cannot access central \(https://repo\.maven\.apache\.org/maven2\) in offline mode and the artifact .* has not been downloaded from it before..*",
        maven_missing_artifact,
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Unresolveable build extension: Plugin (.*) or one of its dependencies could not be resolved: Cannot access central \(https://repo.maven.apache.org/maven2\) in offline mode and the artifact .* has not been downloaded from it before. @",
        lambda m: MissingMavenArtifacts([m.group(1)]),
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Non-resolvable import POM: Cannot access central \(https://repo.maven.apache.org/maven2\) in offline mode and the artifact (.*) has not been downloaded from it before. @ line [0-9]+, column [0-9]+",
        maven_missing_artifact,
    ),
    rule(
        r"\[FATAL\] Non-resolvable parent POM for .*: Cannot access central \(https://repo.maven.apache.org/maven2\) in offline mode and the artifact (.*) has not been downloaded from it before. .*",
        maven_missing_artifact,
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Plugin (.*) or one of its dependencies could not be resolved: Cannot access central \(https://repo.maven.apache.org/maven2\) in offline mode and the artifact .* has not been downloaded from it before. -> \[Help 1\]",
        lambda m: MissingMavenArtifacts([m.group(1)]),
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Plugin (.+) or one of its dependencies could not be resolved: Failed to read artifact descriptor for (.*): (.*)",
        lambda m: MissingMavenArtifacts([m.group(1)]),
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Failed to execute goal on project .*: Could not resolve dependencies for project .*: Cannot access .* \([^\)]+\) in offline mode and the artifact (.*) has not been downloaded from it before. -> \[Help 1\]",
        maven_missing_artifact,
    ),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Failed to execute goal on project .*: Could not resolve dependencies for project .*: Cannot access central \(https://repo.maven.apache.org/maven2\) in offline mode and the artifact (.*) has not been downloaded from it before..*",
        maven_missing_artifact,
    ),
    rule(MAVEN_ERROR_PREFIX + "Failed to execute goal (.*) on project (.*): (.*)", lambda m: None),
    rule(
        MAVEN_ERROR_PREFIX
        + r"Error resolving version for plugin \'(.*)\' from the repositories \[.*\]: Plugin not found in any plugin repository -> \[Help 1\]",
        lambda m: MissingMavenArtifacts([m.group(1)]),
    ),
    rule(
        r"E: eatmydata: unable to find '(.*)' in PATH",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"'(.*)' not found in PATH at (.*) line ([0-9]+)\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(r"/usr/bin/eatmydata: [0-9]+: exec: (.*): not found", command_missing),
    rule(
        r"/usr/bin/eatmydata: [0-9]+: exec: (.*): Permission denied",
        lambda m: NotExecutableFile(m.group(1)),
    ),
    rule(
        r'(.*): exec: "(.*)": executable file not found in \$PATH',
        lambda m: MissingCommand(m.group(2)),
    ),
    rule(
        r'Can\'t exec "(.*)": No such file or directory at (.*) line ([0-9]+)\.',
        command_missing,
    ),
    rule(
        r"dh_missing: (warning: )?(.*) exists in debian/.* but is not installed to anywhere",
        lambda m: DhMissingUninstalled(m.group(2)),
    ),
    rule(
        r"dh_link: link destination (.*) is a directory",
        lambda m: DhLinkDestinationIsDirectory(m.group(1)),
    ),
    rule(
        r"I/O error : Attempt to load network entity (.*)",
        lambda m: MissingXmlEntity(m.group(1)),
    ),
    rule(r"ccache: error: (.*)", lambda m: CcacheError(m.group(1))),
    rule(
        r"dh: The --until option is not supported any longer \(#932537\). Use override targets instead.",
        lambda m: DhUntilUnsupported(),
    ),
    rule(
        r"dh: unable to load addon (.*): (.*) did not return a true value at \(eval 11\) line ([0-9]+).",
        lambda m: DhAddonLoadFailure(m.group(1), m.group(2)),
    ),
    rule("ERROR: dependencies (.*) are not available for package [‘'](.*)['’]", r_missing_package),
    rule("ERROR: dependency [‘'](.*)['’] is not available for package [‘'](.*)[’']", r_missing_package),
    rule(r"Error in library\(.*\) : there is no package called \'(.*)\'", r_missing_package),
    rule(r"Error in .* : there is no package called \'(.*)\'", r_missing_package),
    rule(r"there is no package called \'(.*)\'", r_missing_package),
    rule(
        r"  namespace ‘(.*)’ ([^ ]+) is being loaded, but >= ([^ ]+) is required",
        lambda m: MissingRPackage(m.group(1), m.group(3)),
    ),
    rule(
        r"  namespace ‘(.*)’ ([^ ]+) is already loaded, but >= ([^ ]+) is required",
        lambda m: MissingRPackage(m.group(1), m.group(3)),
    ),
    rule(
        r"b\'convert convert: Unable to read font \((.*)\) \[No such file or directory\]\.\\n\'",
        file_not_found,
    ),
    rule(r"mv: cannot stat \'(.*)\': No such file or directory", file_not_found),
    rule(r"mv: cannot move \'.*\' to \'(.*)\': No such file or directory", file_not_found),
    rule(
        r"(/usr/bin/install|mv): will not overwrite just-created \'(.*)\' with \'(.*)\'",
        lambda m: None,
    ),
    rule(r"^IOError: \[Errno 2\] No such file or directory: \'(.*)\'", file_not_found_maybe_executable),
    rule(r"^error: \[Errno 2\] No such file or directory: \'(.*)\'", file_not_found_maybe_executable),
    rule(r"^E   IOError: \[Errno 2\] No such file or directory: \'(.*)\'", file_not_found_maybe_executable),
    rule("FAIL\t(.+\\/.+\\/.+)\t([0-9.]+)s", lambda m: None),
    rule(
        r'dh_(.*): Cannot find \(any matches for\) "(.*)" \(tried in (.*)\)',
        lambda m: DebhelperPatternNotFound(
            m.group(2), m.group(1), [d.strip() for d in m.group(3).split(",")]
        ),
    ),
    rule(
        r'Can\'t exec "(.*)": No such file or directory at /usr/share/perl5/Debian/Debhelper/Dh_Lib.pm line [0-9]+.',
        command_missing,
    ),
    rule(
        r'Can\'t exec "(.*)": Permission denied at (.*) line [0-9]+\.',
        lambda m: NotExecutableFile(m.group(1)),
    ),
    rule(
        r"/usr/bin/fakeroot: [0-9]+: (.*): Permission denied",
        lambda m: NotExecutableFile(m.group(1)),
    ),
    rule(r".*: error: (.*) command not found", command_missing),
    rule(r"error: command '(.*)' failed: No such file or directory", command_missing),
    rule(
        r"dh_install: Please use dh_missing --list-missing/--fail-missing instead",
        lambda m: None,
    ),
    rule(
        r'dh([^:]*): Please use the third-party "pybuild" build system instead of python-distutils',
        lambda m: None,
    ),
    # A Python error, but not likely to be actionable. The previous line will
    # have the actual line that failed.
    rule(r"ImportError: cannot import name (.*)", lambda m: None),
    # Rust ?
    rule(r"\s*= note: /usr/bin/ld: cannot find -l([^ ]+): .*", lambda m: MissingLibrary(m.group(1))),
    rule(r"\s*= note: /usr/bin/ld: cannot find -l([^ ]+)", lambda m: MissingLibrary(m.group(1))),
    rule(r"/usr/bin/ld: cannot find -l([^ ]+): .*", lambda m: MissingLibrary(m.group(1))),
    rule(r"/usr/bin/ld: cannot find -l([^ ]+)", lambda m: MissingLibrary(m.group(1))),
    rule(
        r"Could not find gem \'([^ ]+) \(([^)]+)\)\', which is required by gem.*",
        ruby_missing_gem,
    ),
    rule(
        r"Could not find gem \'([^ \']+)\', which is required by gem.*",
        lambda m: MissingRubyGem(m.group(1)),
    ),
    rule(
        r"[^:]+:[0-9]+:in \`to_specs\': Could not find \'(.*)\' \(([^)]+)\) among [0-9]+ total gem\(s\) \(Gem::MissingSpecError\)",
        ruby_missing_gem,
    ),
    rule(
        r"[^:]+:[0-9]+:in \`to_specs\': Could not find \'(.*)\' \(([^)]+)\) - .* \(Gem::MissingSpecVersionError\)",
        ruby_missing_gem,
    ),
    rule(
        r"[^:]+:[0-9]+:in \`block in verify_gemfile_dependencies_are_found\!\': Could not find gem \'(.*)\' in any of the gem sources listed in your Gemfile\. \(Bundler::GemNotFound\)",
        lambda m: MissingRubyGem(m.group(1)),
    ),
    rule(
        r"Exception: (.*) not in path[!.]*",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"Exception: Building sdist requires that ([^ ]+) be installed\.",
        lambda m: MissingVagueDependency.simple(m.group(1)),
    ),
    rule(
        r"[^:]+:[0-9]+:in \`find_spec_for_exe\': can\'t find gem (.*) \(([^)]+)\) with executable (.*) \(Gem::GemNotFoundException\)",
        ruby_missing_gem,
    ),
    rule(
        r".?PHP Fatal error:  Uncaught Error: Class \'(.*)\' not found in (.*):([0-9]+)",
        lambda m: MissingPhpClass(m.group(1)),
    ),
    rule(
        r"Caused by: java.lang.ClassNotFoundException: (.*)",
        lambda m: MissingJavaClass(m.group(1)),
    ),
    rule(
        r"\[(.*)\] \t\t:: (.*)\#(.*);\$\{(.*)\}: not found",
        lambda m: MissingMavenArtifacts([f"{m.group(2)}:{m.group(3)}:jar:debian"]),
    ),
    rule(
        r"Caused by: java.lang.IllegalArgumentException: Cannot find JAR \'(.*)\' required by module \'(.*)\' using classpath or distribution directory \'(.*)\'",
        lambda m: None,
    ),
    rule(
        r".*\.xml:[0-9]+: Unable to find a javac compiler;",
        lambda m: MissingJavaClass("com.sun.tools.javac.Main"),
    ),
    rule(
        r'checking for (.*)\.\.\. configure: error: "Cannot check for existence of module (.*) without pkgconf"',
        lambda m: MissingCommand("pkgconf"),
    ),
    rule(
        r"configure: error: Could not find '(.*)' in path\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(r"autoreconf was not found; .*", lambda m: MissingCommand("autoreconf")),
    rule(r"^g\+\+: error: (.*): No such file or directory", file_not_found),
    rule(r"strip: \'(.*)\': No such file", file_not_found),
    rule(
        r"Sprockets::FileNotFound: couldn\'t find file \'(.*)\' with type \'(.*)\'",
        lambda m: MissingSprocketsFile(m.group(1), m.group(2)),
    ),
    rule(
        r'xdt-autogen: You must have "(.*)" installed. You can get if from',
        lambda m: MissingXfceDependency(m.group(1)),
    ),
    rule(
        r"autogen.sh: You must have GNU autoconf installed.",
        lambda m: MissingCommand("autoconf"),
    ),
    rule(
        r"\s*You must have (autoconf|automake|aclocal|libtool|libtoolize) installed to compile (.*)\.",
        lambda m: MissingCommand(m.group(1)),
    ),
    rule(
        r"It appears that Autotools is not correctly installed on this system.",
        lambda m: MissingCommand("autoconf"),
    ),
    rule(r"\*\*\* No autoreconf found \*\*\*", lambda m: MissingCommand("autoreconf")),
    rule(r"You need to install gnome-common module and make.*", lambda m: GnomeCommonMissing()),
    rule(r"You need to install the gnome-common module and make.*", lambda m: GnomeCommonMissing()),
    rule(
        r"You need to install gnome-common from the GNOME (git|CVS|SVN)",
        lambda m: GnomeCommonMissing(),
    ),
    rule(
        r"automake: error: cannot open < (.*): No such file or directory",
        lambda m: MissingAutomakeInput(m.group(1)),
    ),
    rule(
        r"configure(|\.in|\.ac):[0-9]+: error: possibly undefined macro: (.*)",
        lambda m: MissingAutoconfMacro.new(m.group(2)),
    ),
    rule(
        r"configure.(in|ac):[0-9]+: error: macro (.*) is not defined; is a m4 file missing\?",
        lambda m: MissingAutoconfMacro.new(m.group(2)),
    ),
    rule(
        r"config.status: error: cannot find input file: `(.*)\'",
        lambda m: MissingConfigStatusInput(m.group(1)),
    ),
    rule(
        r"\*\*\*Error\*\*\*: You must have glib-gettext >= (.*) installed.*",
        lambda m: MissingGnomeCommonDependency("glib-gettext", m.group(1)),
    ),
    rule(
        r"ERROR: JAVA_HOME is set to an invalid directory: /usr/lib/jvm/default-java/",
        lambda m: MissingJVM(),
    ),
    rule(
        r'Error: The file "MANIFEST" is missing from this distribution\. The MANIFEST lists all files included in the distribution\.',
        lambda m: MissingPerlManifest(),
    ),
    rule(
        r"dh_installdocs: --link-doc not allowed between (.*) and (.*) \(one is arch:all and the other not\)",
        lambda m: None,
    ),
    rule(
        r"dh: unable to load addon systemd: dh: The systemd-sequence is no longer provided in compat >= 11, please rely on dh_installsystemd instead",
        lambda m: None,
    ),
    rule(
        r"dh: The --before option is not supported any longer \(#932537\). Use override targets instead.",
        lambda m: None,
    ),
    rule(r"\(.*\): undefined reference to `(.*)'", lambda m: None),
    rule("(.*):([0-9]+): undefined reference to `(.*)'", lambda m: None),
    rule("(.*):([0-9]+): error: undefined reference to '(.*)'", lambda m: None),
    rule(
        r"\/usr\/bin\/ld:(.*): multiple definition of `*.\'; (.*): first defined here",
        lambda m: None,
    ),
    rule(r".+\.go:[0-9]+: undefined reference to `(.*)'", lambda m: None),
    rule(r"ar: libdeps specified more than once", lambda m: None),
    rule(
        r"\/usr\/bin\/ld: .*\(.*\):\(.*\): multiple definition of `*.\'; (.*):\((.*)\) first defined here",
        lambda m: None,
    ),
    rule(
        r"\/usr\/bin\/ld:(.*): multiple definition of `*.\'; (.*):\((.*)\) first defined here",
        lambda m: None,
    ),
    rule(r"\/usr\/bin\/ld: (.*): undefined reference to `(.*)\'", lambda m: None),
    rule(r"\/usr\/bin\/ld: (.*): undefined reference to symbol \'(.*)\'", lambda m: None),
    rule(
        r"\/usr\/bin\/ld: (.*): relocation (.*) against symbol `(.*)\' can not be used when making a shared object; recompile with -fPIC",
        lambda m: None,
    ),
    # Cross-toolchain linkers (src/common.rs:1477-1485)
    rule(
        r"\/usr\/bin\/[A-Za-z0-9_.-]+ld(?:\.bfd|\.gold)?: (.*): relocation (.*) against symbol [`']?(.*?)[`']? can not be used when making a shared object; recompile with -fPIC",
        lambda m: None,
    ),
    rule(
        "(.*):([0-9]+): multiple definition of `(.*)'; (.*):([0-9]+): first defined here",
        lambda m: None,
    ),
    rule(
        "(dh.*): debhelper compat level specified both in debian/compat and via build-dependency on debhelper-compat",
        lambda m: DuplicateDHCompatLevel(m.group(1)),
    ),
    rule(
        "(dh.*): (error: )?Please specify the compatibility level in debian/compat",
        lambda m: MissingDHCompatLevel(m.group(1)),
    ),
    rule(
        "dh_makeshlibs: The udeb (.*) does not contain any shared libraries but --add-udeb=(.*) was passed!?",
        lambda m: None,
    ),
    rule(
        "dpkg-gensymbols: error: some symbols or patterns disappeared in the symbols file: see diff output below",
        lambda m: DisappearedSymbols(),
    ),
    rule(
        r"Failed to copy \'(.*)\': No such file or directory at /usr/share/dh-exec/dh-exec-install-rename line [0-9]+.*",
        file_not_found,
    ),
    rule(r"Invalid gemspec in \[.*\]: No such file or directory - (.*)", command_missing),
    rule(
        r".*meson.build:[0-9]+:[0-9]+: ERROR: Program\(s\) \[\'(.*)\'\] not found or not executable",
        command_missing,
    ),
    rule(
        r".*meson.build:[0-9]+:[0-9]: ERROR: Git program not found\.",
        lambda m: MissingCommand("git"),
    ),
    rule(
        r"Failed: [pytest] section in setup.cfg files is no longer supported, change to [tool:pytest] instead.",
        lambda m: None,
    ),
    rule(r"cp: cannot stat \'(.*)\': No such file or directory", file_not_found),
    rule(r"cp: \'(.*)\' and \'(.*)\' are the same file", lambda m: None),
    rule(r".?PHP Fatal error: (.*)", lambda m: None),
    rule(r"sed: no input files", lambda m: None),
    rule(r"sed: can\'t read (.*): No such file or directory", file_not_found),
    rule(
        r"ERROR in Entry module not found: Error: Can\'t resolve \'(.*)\' in \'(.*)\'",
        webpack_file_missing,
    ),
    rule(
        r".*:([0-9]+): element include: XInclude error : could not load (.*), and no fallback was found",
        lambda m: None,
    ),
    rule(r"E: Child terminated by signal ‘Terminated’", lambda m: Cancelled()),
    rule(r"E: Caught signal ‘Terminated’", lambda m: Cancelled()),
    rule(r"E: Failed to execute “(.*)”: No such file or directory", command_missing),
    rule(r"E ImportError: Bad (.*) executable(\.?)", command_missing),
    rule(r"E: The Debian version .* cannot be used as an ELPA version.", lambda m: None),
    # ImageMagick
    rule(
        r"convert convert: Image pixel limit exceeded \(see -limit Pixels\) \(-1\).",
        lambda m: None,
    ),
    rule(r"convert convert: Improper image header \(.*\).", lambda m: None),
    rule(r"convert convert: invalid primitive argument \([0-9]+\).", lambda m: None),
    rule(r"convert convert: Unexpected end-of-file \(\)\.", lambda m: None),
    rule(r"convert convert: Unrecognized option \((.*)\)\.", lambda m: None),
    rule(r"convert convert: Unrecognized channel type \((.*)\)\.", lambda m: None),
    rule(
        r"convert convert: Unable to read font \((.*)\) \[No such file or directory\].",
        file_not_found,
    ),
    rule(
        r"convert convert: Unable to open file (.*) \[No such file or directory\]\.",
        file_not_found,
    ),
    rule(
        r"convert convert: No encode delegate for this image format \((.*)\) \[No such file or directory\].",
        lambda m: ImageMagickDelegateMissing(m.group(1)),
    ),
    rule(r"ERROR: Sphinx requires at least Python (.*) to run.", lambda m: None),
    rule(r"Can\'t find (.*) directory in (.*)", lambda m: None),
    rule(
        r"/bin/sh: [0-9]: cannot create (.*): Directory nonexistent",
        lambda m: DirectoryNonExistant(posixpath.dirname(m.group(1))),
    ),
    rule(r"dh: Unknown sequence (.*) \(choose from: .*\)", lambda m: None),
    rule(r".*\.vala:[0-9]+\.[0-9]+-[0-9]+.[0-9]+: error: (.*)", lambda m: None),
    rule(
        r"error: Package `(.*)\' not found in specified Vala API directories or GObject-Introspection GIR directories",
        lambda m: MissingValaPackage(m.group(1)),
    ),
    rule(r".*.scala:[0-9]+: error: (.*)", lambda m: None),
    # JavaScript
    rule(r"error TS6053: File \'(.*)\' not found.", file_not_found),
    # Mocha
    rule(
        r"Error \[ERR_MODULE_NOT_FOUND\]: Cannot find package '(.*)' imported from (.*)",
        lambda m: MissingNodePackage(m.group(1)),
    ),
    rule(
        r"\s*Uncaught Error \[ERR_MODULE_NOT_FOUND\]: Cannot find package '(.*)' imported from (.*)",
        lambda m: MissingNodePackage(m.group(1)),
    ),
    rule(r"(.*\.ts)\([0-9]+,[0-9]+\): error TS[0-9]+: (.*)", lambda m: None),
    rule(r"(.*.nim)\([0-9]+, [0-9]+\) Error: .*", lambda m: None),
    rule(
        r"dh_installinit: upstart jobs are no longer supported\!  Please remove (.*) and check if you need to add a conffile removal",
        lambda m: UpstartFilePresent(m.group(1)),
    ),
    rule(
        r"dh_installinit: --no-restart-on-upgrade has been renamed to --no-stop-on-upgrade",
        lambda m: None,
    ),
    rule(r"find: paths must precede expression: .*", lambda m: None),
    rule(r"find: ‘(.*)’: No such file or directory", file_not_found),
    rule(r"ninja: fatal: posix_spawn: Argument list too long", lambda m: None),
    rule(
        "ninja: fatal: chdir to '(.*)' - No such file or directory",
        lambda m: DirectoryNonExistant(m.group(1)),
    ),
]
