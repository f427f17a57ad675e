"""Problem model: a classification result with a kebab-case ``kind`` and a JSON
details payload.

Semantics mirror the reference's ``Problem`` trait
(/root/reference/src/lib.rs:487-542): equality and hashing are on
``(kind, canonical-JSON(details))``; serialization is ``{"kind": …, "details": …}``
with sorted keys (serde_json's default BTreeMap ordering). ``is_universal`` is
true only for no-space-on-device (/root/reference/src/problems/common.rs:1602).

The full kind registry (158 kinds) is transcribed from
/root/reference/src/problems/{common.rs,debian.rs,autopkgtest.rs} — each entry
lists the detail field names exactly as the reference's ``json()`` emits them.
"""

from __future__ import annotations

import json
import re
from typing import Any, Optional

_UNSET = object()


def canonical_json(value: Any) -> str:
    """Byte-stable JSON: sorted keys, compact separators (mirrors serde_json's
    BTreeMap ordering + compact output)."""
    return json.dumps(value, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


class Problem:
    """A classified problem: (kind, details). Details is a dict / list / str /
    None, matching the reference's per-kind ``json()`` payload."""

    __slots__ = ("kind", "details", "is_universal")

    def __init__(self, kind: str, details: Any = None, is_universal: bool = False):
        self.kind = kind
        self.details = details
        self.is_universal = is_universal

    def json(self) -> Any:
        return self.details

    def to_dict(self) -> dict:
        return {"kind": self.kind, "details": self.details}

    def details_json(self) -> str:
        return canonical_json(self.details)

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Problem)
            and self.kind == other.kind
            and canonical_json(self.details) == canonical_json(other.details)
        )

    def __hash__(self) -> int:
        return hash((self.kind, canonical_json(self.details)))

    def __repr__(self) -> str:  # pragma: no cover
        return f"Problem({self.kind!r}, {self.details!r})"


# registry: kind -> tuple of detail field names (None = null details payload)
KIND_REGISTRY: dict[str, Optional[tuple[str, ...]]] = {}


class ProblemType:
    """Factory for one problem kind. Calling it builds a ``Problem`` whose
    details dict has exactly the registered fields (missing ones = None,
    mirroring the reference's explicit nulls, e.g.
    /root/reference/src/problem.rs:315-330)."""

    def __init__(
        self,
        kind: str,
        fields: Optional[tuple[str, ...]] = (),
        universal: bool = False,
        scalar: bool = False,
        null_details: bool = False,
    ):
        self.kind = kind
        self.fields = fields or ()
        self.universal = universal
        # scalar: details payload is the single field's bare value? Never true
        # in the reference (tuple structs still serialize as {"field": v}).
        self.scalar = scalar
        self.null_details = null_details
        KIND_REGISTRY[kind] = None if null_details else tuple(self.fields)

    def __call__(self, *args, **kwargs) -> Problem:
        if self.null_details:
            assert not args and not kwargs
            return Problem(self.kind, None, self.universal)
        details: dict[str, Any] = {f: None for f in self.fields}
        if len(args) > len(self.fields):
            raise TypeError(f"{self.kind}: too many positional args")
        for f, v in zip(self.fields, args):
            details[f] = v
        for k, v in kwargs.items():
            if k not in details:
                raise TypeError(f"{self.kind}: unknown field {k!r}")
            details[k] = v
        return Problem(self.kind, details, self.universal)

    def simple(self, value: Any) -> Problem:
        """First field set, the rest None."""
        return self(value)


def _pt(kind: str, *fields: str, universal: bool = False, null_details: bool = False) -> ProblemType:
    return ProblemType(kind, tuple(fields), universal=universal, null_details=null_details)


# ---- problems/common.rs (109 kinds) ----------------------------------------
MissingFile = _pt("missing-file", "path")
MissingBuildFile = _pt("missing-build-file", "filename")
MissingCommandOrBuildFile = _pt("missing-command-or-build-file", "filename")
VcsControlDirectoryNeeded = _pt("vcs-control-directory-needed", "vcs")
MissingPythonModule = _pt("missing-python-module", "module", "python_version", "minimum_version")
MissingCommand = _pt("command-missing", "command")
MissingPythonDistribution = _pt(
    "missing-python-distribution", "distribution", "python_version", "minimum_version"
)
MissingHaskellModule = _pt("missing-haskell-module", "module")
MissingLibrary = _pt("missing-library", "library")
MissingIntrospectionTypelib = _pt("missing-introspection-typelib", "library")
MissingPytestFixture = _pt("missing-pytest-fixture", "fixture")
UnsupportedPytestConfigOption = _pt("unsupported-pytest-config-option", "name")
UnsupportedPytestArguments = _pt("unsupported-pytest-arguments", "args")
MissingRPackage = _pt("missing-r-package", "package", "minimum_version")
MissingGoPackage = _pt("missing-go-package", "package")
MissingCHeader = _pt("missing-c-header", "header")
MissingNodeModule = _pt("missing-node-module", "module")
MissingNodePackage = _pt("missing-node-package", "package")
MissingConfigure = _pt("missing-configure")
MissingVagueDependency = _pt(
    "missing-vague-dependency", "name", "url", "minimum_version", "current_version"
)
MissingQt = _pt("missing-qt")
MissingX11 = _pt("missing-x11")
MissingAutoconfMacro = _pt("missing-autoconf-macro", "macro", "need_rebuild")
DirectoryNonExistant = _pt("local-directory-not-existing", "path")
MissingValaPackage = _pt("missing-vala-package", "package")
UpstartFilePresent = _pt("upstart-file-present", "filename")
MissingPostgresExtension = _pt("missing-postgresql-extension", "extension")
MissingPkgConfig = _pt("missing-pkg-config-package", "module", "minimum_version")
MissingHaskellDependencies = _pt("missing-haskell-dependencies", "deps")
NoSpaceOnDevice = _pt("no-space-on-device", universal=True)
MissingJRE = _pt("missing-jre")
MissingJDK = _pt("missing-jdk", "jdk_path")
MissingJDKFile = _pt("missing-jdk-file", "jdk_path", "filename")
MissingPerlFile = _pt("missing-perl-file", "filename", "inc")
MissingPerlModule = _pt("missing-perl-module", "filename", "module", "inc", "minimum_version")
MissingSetupPyCommand = _pt("missing-setup.py-command", "command")
MissingCSharpCompiler = _pt("missing-c#-compiler")
MissingRustCompiler = _pt("missing-rust-compiler")
MissingAssembler = _pt("missing-assembler")
MissingCargoCrate = _pt("missing-cargo-crate", "crate", "requirement")
DhWithOrderIncorrect = _pt("debhelper-argument-order")
UnsupportedDebhelperCompatLevel = _pt(
    "unsupported-debhelper-compat-level", "oldest_supported", "requested"
)
SetuptoolScmVersionIssue = _pt("setuptools-scm-version-issue")
MissingMavenArtifacts = _pt("missing-maven-artifacts", "artifacts")
NotExecutableFile = _pt("not-executable-file", "path")
DhMissingUninstalled = _pt("dh-missing-uninstalled", "missing_file")
DhLinkDestinationIsDirectory = _pt("dh-link-destination-is-directory", "path")
MissingXmlEntity = _pt("missing-xml-entity", "url")
CcacheError = _pt("ccache-error", "error")
DebianVersionRejected = _pt("debian-version-rejected", "version")
PatchApplicationFailed = _pt("patch-application-failed", "patchname")
NeedPgBuildExtUpdateControl = _pt(
    "need-pg-buildext-updatecontrol", "generated_path", "template_path"
)
DhAddonLoadFailure = _pt("dh-addon-load-failure", "name", "path")
DhUntilUnsupported = _pt("dh-until-unsupported")
DebhelperPatternNotFound = _pt("debhelper-pattern-not-found", "pattern", "tool", "directories")
MissingPerlManifest = _pt("missing-perl-manifest")
ImageMagickDelegateMissing = _pt("imagemagick-delegate-missing", "delegate")
Cancelled = _pt("cancelled")
DisappearedSymbols = _pt("disappeared-symbols")
DuplicateDHCompatLevel = _pt("duplicate-dh-compat-level", "command")
MissingDHCompatLevel = _pt("missing-dh-compat-level", "command")
MissingJVM = _pt("missing-jvm")
MissingRubyGem = _pt("missing-ruby-gem", "gem", "version")
MissingJavaScriptRuntime = _pt("javascript-runtime-missing")
MissingRubyFile = _pt("missing-ruby-file", "filename")
MissingPhpClass = _pt("missing-php-class", "php_class")
MissingJavaClass = _pt("missing-java-class", "classname")
MissingSprocketsFile = _pt("missing-sprockets-file", "name", "content_type")
MissingXfceDependency = _pt("missing-xfce-dependency", "package")
GnomeCommonMissing = _pt("missing-gnome-common")
MissingConfigStatusInput = _pt("missing-config.status-input", "path")
MissingGnomeCommonDependency = _pt(
    "missing-gnome-common-dependency", "package", "minimum_version"
)
MissingAutomakeInput = _pt("missing-automake-input", "path")
ChrootNotFound = _pt("chroot-not-found", "chroot")
MissingLibtool = _pt("missing-libtool")
CMakeFilesMissing = _pt("missing-cmake-files", "filenames", "version")
MissingCMakeComponents = _pt("missing-cmake-components", "name", "components")
MissingCMakeConfig = _pt("missing-cmake-config", "name", "version")
CMakeNeedExactVersion = _pt(
    "cmake-exact-version-missing", "package", "version_found", "exact_version_needed", "path"
)
MissingStaticLibrary = _pt("missing-static-library", "library", "filename")
MissingGoRuntime = _pt("missing-go-runtime")
UnknownCertificateAuthority = _pt("unknown-certificate-authority", "url")
MissingPerlPredeclared = _pt("missing-perl-predeclared", "name")
MissingGitIdentity = _pt("missing-git-identity")
MissingSecretGpgKey = _pt("no-secret-gpg-key")
MissingVcVersionerVersion = _pt("no-vcversioner-version")
MissingLatexFile = _pt("missing-latex-file", "filename")
MissingXDisplay = _pt("missing-x-display")
MissingFontspec = _pt("missing-fontspec", "fontspec")
InactiveKilled = _pt("inactive-killed", "minutes")
MissingPauseCredentials = _pt("missing-pause-credentials")
MismatchGettextVersions = _pt(
    "mismatch-gettext-versions", "makefile_version", "autoconf_version"
)
InvalidCurrentUser = _pt("invalid-current-user", "user")
MissingGnulibDirectory = _pt("missing-gnulib-directory", "directory")
MissingLuaModule = _pt("missing-lua-module", "module")
MissingGoModFile = _pt("missing-go.mod-file")
OutdatedGoModFile = _pt("outdated-go.mod-file")
CodeCoverageTooLow = _pt("code-coverage-too-low", "actual", "required")
ESModuleMustUseImport = _pt("esmodule-must-use-import", "path")
MissingPHPExtension = _pt("missing-php-extension", "extension")
MinimumAutoconfTooOld = _pt("minimum-autoconf-too-old", "minimum_version")
MissingPerlDistributionFile = _pt("missing-perl-distribution-file", "filename")
MissingGoSumEntry = _pt("missing-go.sum-entry", "package", "version")
ValaCompilerCannotCompile = _pt("valac-cannot-compile")
MissingDebianBuildDep = _pt("missing-debian-build-dep", "dep")
MissingQtModules = _pt("missing-qt-modules", "modules")
MissingOCamlPackage = _pt("missing-ocaml-package", "package")
TooManyOpenFiles = _pt("too-many-open-files")
MissingMakeTarget = _pt("missing-make-target", "target", "required_by")

# ---- problems/debian.rs (41 kinds) ------------------------------------------
DpkgError = _pt("dpkg-error", "msg")
AptUpdateError = _pt("apt-update-error")
AptFetchFailure = _pt("apt-file-fetch-failure", "url", "error")
AptMissingReleaseFile = _pt("missing-release-file", "url")
AptPackageUnknown = _pt("apt-package-unknown", "package")
AptBrokenPackages = _pt("apt-broken-packages", "description", "broken")
UnableToFindUpstreamTarball = _pt("unable-to-find-upstream-tarball", "package", "version")
SourceFormatUnbuildable = _pt("source-format-unbuildable", "source_format", "reason")
SourceFormatUnsupported = _pt("source-format-unsupported", "source_format")
PatchFileMissing = _pt("patch-file-missing", "path")
DpkgSourceLocalChanges = _pt("unexpected-local-upstream-changes", "diff_file", "files")
DpkgSourceUnrepresentableChanges = _pt("unrepresentable-local-changes", null_details=True)
DpkgUnwantedBinaryFiles = _pt("unwanted-binary-files", null_details=True)
DpkgBinaryFileChanged = _pt("binary-file-changed", "files")
MissingControlFile = _pt("missing-control-file", null_details=True)
UnknownMercurialExtraFields = _pt("unknown-mercurial-extra-fields", "field")
UpstreamPGPSignatureVerificationFailed = _pt(
    "upstream-pgp-signature-verification-failed", null_details=True
)
UScanRequestVersionMissing = _pt("uscan-request-version-missing", "version")
DebcargoFailure = _pt("debcargo-failure", "reason")
ChangelogParseError = _pt("changelog-parse-error", "reason")
UScanError = _pt("uscan-error", "reason")
UScanFailed = _pt("uscan-failed", "url", "reason")
InconsistentSourceFormat = _pt("inconsistent-source-format", "version", "source_format")
UpstreamMetadataFileParseError = _pt("debian-upstream-metadata-invalid", "path", "reason")
DpkgSourcePackFailed = _pt("dpkg-source-pack-failed", "reason")
DpkgBadVersion = _pt("dpkg-bad-version", "version", "reason")
MissingDebcargoCrate = _pt("debcargo-missing-crate", "crate", "version")
PristineTarTreeMissing = _pt("pristine-tar-missing-tree", "treeish")
MissingRevision = _pt("missing-revision", "revision")
DebcargoUnacceptablePredicate = _pt("debcargo-unacceptable-predicate", "crate", "predicate")
DebcargoUnacceptableComparator = _pt("debcargo-unacceptable-comparator", "crate", "comparator")
UScanTooManyRequests = _pt("uscan-too-many-requests", "reason")
UnsatisfiedAptConflicts = _pt("unsatisfied-apt-conflicts", "relations")
ArchitectureNotInList = _pt("arch-not-in-list", "arch", "arch_list")
UnsatisfiedAptDependencies = _pt("unsatisfied-apt-dependencies", "relations")
InsufficientDiskSpace = _pt("insufficient-disk-space", "needed", "free")
NestedTreeUnresolvable = _pt("nested-tree-unresolvable", "name")
SubmoduleEncountered = _pt("submodule-encountered", "path", "sha")
UScanRemoteVersionMismatch = _pt(
    "uscan-remote-version-mismatch", "package", "remote_version", "wanted_version"
)
UScanWatchfileMalformed = _pt("uscan-watchfile-malformed", "paragraph")
BrzInternalError = _pt("brz-internal-error", "exception_type", "exception_message")

# ---- problems/autopkgtest.rs (8 kinds) ---------------------------------------
AutopkgtestDepsUnsatisfiable = _pt("badpkg", "args")
AutopkgtestTimedOut = _pt("timed-out")
XDGRunTimeNotSet = _pt("xdg-runtime-dir-not-set")
AutopkgtestTestbedFailure = _pt("testbed-failure", "reason")
AutopkgtestDepChrootDisappeared = _pt("testbed-chroot-disappeared")
AutopkgtestErroneousPackage = _pt("erroneous-package", "reason")
AutopkgtestStderrFailure = _pt("stderr-output", "stderr_line")
AutopkgtestTestbedSetupFailure = _pt("testbed-setup-failure", "command", "exit_status", "error")


# ---- special constructors ----------------------------------------------------

def problem_from_json(kind: str, details: Any) -> Problem:
    """Reconstruct a Problem from its serialized (kind, details) form
    (reference: problem_from_json registry dispatch,
    /root/reference/src/problem.rs:25-111, incl. legacy shapes where a bare
    string/array stands in for the canonical single-field object,
    src/problem.rs:280-297)."""
    if kind not in KIND_REGISTRY:
        raise KeyError(f"unknown problem kind: {kind}")
    fields = KIND_REGISTRY[kind]
    if fields is None:
        return Problem(kind, None, kind == "no-space-on-device")
    if details is None:
        details = {}
    if not isinstance(details, dict):
        # legacy bare value: assign to the first registered field
        details = {fields[0]: details} if fields else {}
    full = {f: details.get(f) for f in fields}
    return Problem(kind, full, kind == "no-space-on-device")


# MissingPerlModule::simple sets *module* (the 2nd field), not filename
# (/root/reference/src/problems/common.rs — `simple(module)`).
MissingPerlModule.simple = lambda module: MissingPerlModule(module=module)  # type: ignore[method-assign]

# MissingAutoconfMacro::new(macro) defaults need_rebuild=false.
MissingAutoconfMacro.new = lambda macro: MissingAutoconfMacro(macro, False)  # type: ignore[attr-defined]

# MissingCargoCrate::simple(crate) — requirement=None.
MissingCargoCrate.simple = lambda crate: MissingCargoCrate(crate)  # type: ignore[method-assign]

_REQ_RE = re.compile(r"^\s*([A-Za-z0-9._-]+)\s*(?:\[[^\]]*\])?\s*(.*)$")
_PYVER_MARKER_RE = re.compile(r"python_version\s*[<>=!~]=?\s*['\"](\d+)")


def python_distribution_from_requirement(text: str, python_version: Optional[int] = None) -> Problem:
    """PEP508-ish requirement parse (reference:
    /root/reference/src/problems/common.rs:467-497): distribution name, a
    `>=`-only single specifier becomes minimum_version, python_version from an
    environment-marker if present."""
    req = text
    marker = None
    if ";" in req:
        req, marker = req.split(";", 1)
    m = _REQ_RE.match(req)
    name = m.group(1) if m else req.strip()
    rest = (m.group(2) if m else "").strip()
    if rest.startswith("(") and rest.endswith(")"):
        rest = rest[1:-1].strip()
    minimum_version = None
    if rest:
        specs = [s.strip() for s in rest.split(",") if s.strip()]
        if len(specs) == 1 and specs[0].startswith(">="):
            minimum_version = specs[0][2:].strip()
    if python_version is None and marker:
        mv = _PYVER_MARKER_RE.search(marker)
        if mv:
            python_version = int(mv.group(1))
    # pep508_rs normalizes the package name per PEP 503 (reference
    # from_requirement_str → Requirement.name): lowercase, [-_.]+ → -
    name = re.sub(r"[-_.]+", "-", name).lower()
    return MissingPythonDistribution(name, python_version, minimum_version)
