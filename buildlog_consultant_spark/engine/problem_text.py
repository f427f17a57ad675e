"""Human-readable problem messages, mirroring the reference's per-kind
``Display`` impls (/root/reference/src/problems/{common,debian,autopkgtest}.rs).

``problem_message(p)`` is used for the failure ``description`` field
(src/sbuild.rs:1145-1151 etc.). Rust ``{:?}`` on a Vec<String> renders like
``["a", "b"]`` — replicated by ``_dbg``.
"""

from __future__ import annotations

from typing import Optional

from ..core.problems import Problem


def _rust_str_dbg(s: str) -> str:
    """Rust ``{:?}`` for str: double-quoted with backslash escapes
    (core::fmt Debug for str escapes ``\\``, ``\"``, \\n, \\r, \\t; rare
    control chars render as \\u{..} upstream — not reproduced, none of the
    matched capture groups can contain them)."""
    out = (
        str(s)
        .replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return f'"{out}"'


def _dbg(v) -> str:
    if v is None:
        return "None"
    if isinstance(v, list):
        return "[" + ", ".join(_dbg(x) for x in v) + "]"
    return _rust_str_dbg(v)


def _badpkg_args_dbg(args) -> str:
    """Byte-exact reference Display for badpkg
    (/root/reference/src/problems/autopkgtest.rs:56-60): ``{:?}`` of
    ``Vec<(Option<String>, String)>`` — ``[(Some("deb"), "foo"), (None,
    "bar")]``. The JSON data model carries each tuple as a two-element list
    with null for None (serde's tuple/Option encoding,
    autopkgtest.rs:38-42), so the tuple/Option shape is reconstructed here
    rather than rendered as nested lists."""
    parts = []
    for pair in args or []:
        kind, arg = (pair + [None, None])[:2] if isinstance(pair, list) else pair
        k = f"Some({_rust_str_dbg(kind)})" if kind is not None else "None"
        parts.append(f"({k}, {_rust_str_dbg(arg)})")
    return "[" + ", ".join(parts) + "]"


def _d(p: Problem, key: str):
    return p.details.get(key) if isinstance(p.details, dict) else None


_SIMPLE = {
    "missing-file": lambda p: f"Missing file: {_d(p,'path')}",
    "missing-build-file": lambda p: f"Missing build file: {_d(p,'filename')}",
    "missing-command-or-build-file": lambda p: f"Missing command or build file: {_d(p,'filename')}",
    "command-missing": lambda p: f"Missing command: {_d(p,'command')}",
    "vcs-control-directory-needed": lambda p: "VCS control directory needed: "
    + ", ".join(_d(p, "vcs") or []),
    "missing-haskell-module": lambda p: f"Missing Haskell module: {_d(p,'module')}",
    "missing-library": lambda p: f"Missing library: {_d(p,'library')}",
    "missing-introspection-typelib": lambda p: f"Missing introspection typelib: {_d(p,'library')}",
    "missing-pytest-fixture": lambda p: f"Missing pytest fixture: {_d(p,'fixture')}",
    "unsupported-pytest-config-option": lambda p: f"Unsupported pytest config option: {_d(p,'name')}",
    "unsupported-pytest-arguments": lambda p: f"Unsupported pytest arguments: {_dbg(_d(p,'args'))}",
    "missing-go-package": lambda p: f"Missing Go package: {_d(p,'package')}",
    "missing-c-header": lambda p: f"Missing C header: {_d(p,'header')}",
    "missing-node-module": lambda p: f"Missing Node module: {_d(p,'module')}",
    "missing-node-package": lambda p: f"Missing Node package: {_d(p,'package')}",
    "missing-configure": lambda p: "Missing ./configure",
    "missing-vague-dependency": lambda p: f"Missing dependency: {_d(p,'name')}",
    "missing-qt": lambda p: "Missing Qt",
    "missing-x11": lambda p: "Missing X11",
    "missing-autoconf-macro": lambda p: f"Missing autoconf macro: {_d(p,'macro')}",
    "local-directory-not-existing": lambda p: f"Directory does not exist: {_d(p,'path')}",
    "missing-vala-package": lambda p: f"Missing Vala package: {_d(p,'package')}",
    "upstart-file-present": lambda p: f"Upstart file present: {_d(p,'filename')}",
    "missing-postgresql-extension": lambda p: f"Missing PostgreSQL extension: {_d(p,'extension')}",
    "missing-haskell-dependencies": lambda p: f"Missing Haskell dependencies: {_dbg(_d(p,'deps'))}",
    "no-space-on-device": lambda p: "No space left on device",
    "missing-jre": lambda p: "Missing JRE",
    "missing-jdk": lambda p: f"Missing JDK at {_d(p,'jdk_path')}",
    "missing-jdk-file": lambda p: f"Missing JDK file {_d(p,'filename')} at {_d(p,'jdk_path')}",
    "missing-setup.py-command": lambda p: f"Missing setup.py command: {_d(p,'command')}",
    "missing-c#-compiler": lambda p: "Missing C# compiler",
    "missing-rust-compiler": lambda p: "Missing Rust compiler",
    "missing-assembler": lambda p: "Missing assembler",
    "debhelper-argument-order": lambda p: "dh argument order is incorrect",
    "unsupported-debhelper-compat-level": lambda p: (
        f"Request debhelper compat level {_d(p,'requested')} lower than supported {_d(p,'oldest_supported')}"
    ),
    "setuptools-scm-version-issue": lambda p: "setuptools_scm was unable to find version",
    "missing-maven-artifacts": lambda p: "Missing Maven artifacts: "
    + ", ".join(_d(p, "artifacts") or []),
    "not-executable-file": lambda p: f"Command not executable: {_d(p,'path')}",
    "dh-missing-uninstalled": lambda p: f"dh_missing file not installed: {_d(p,'missing_file')}",
    "dh-link-destination-is-directory": lambda p: f"Link destination {_d(p,'path')} is directory",
    "missing-xml-entity": lambda p: f"Missing XML entity: {_d(p,'url')}",
    "ccache-error": lambda p: f"ccache error: {_d(p,'error')}",
    "debian-version-rejected": lambda p: f"Debian Version Rejected; {_d(p,'version')}",
    "patch-application-failed": lambda p: f"Patch application failed: {_d(p,'patchname')}",
    "need-pg-buildext-updatecontrol": lambda p: (
        f"Need to run 'pg_buildext updatecontrol' to update {_d(p,'generated_path')}"
    ),
    "dh-addon-load-failure": lambda p: f"dh addon loading failed: {_d(p,'name')}",
    "dh-until-unsupported": lambda p: "dh --until is no longer supported",
    "debhelper-pattern-not-found": lambda p: (
        f"debhelper ({_d(p,'tool')}) expansion failed for {_dbg(_d(p,'pattern'))} "
        f"(directories: {_dbg(_d(p,'directories'))})"
    ),
    "missing-perl-manifest": lambda p: "missing Perl MANIFEST",
    "imagemagick-delegate-missing": lambda p: f"Imagemagick missing delegate: {_d(p,'delegate')}",
    "cancelled": lambda p: "Cancelled by runner or job manager",
    "disappeared-symbols": lambda p: "Disappeared symbols",
    "duplicate-dh-compat-level": lambda p: f"DH Compat Level specified twice (command: {_d(p,'command')})",
    "missing-dh-compat-level": lambda p: f"Missing DH Compat Level (command: {_d(p,'command')})",
    "missing-jvm": lambda p: "missing JVM",
    "javascript-runtime-missing": lambda p: "Missing JavaScript Runtime",
    "missing-ruby-file": lambda p: f"missing ruby file: {_d(p,'filename')}",
    "missing-php-class": lambda p: f"missing PHP class: {_d(p,'php_class')}",
    "missing-java-class": lambda p: f"missing Java class: {_d(p,'classname')}",
    "missing-sprockets-file": lambda p: (
        f"missing sprockets file: {_d(p,'name')} (type: {_d(p,'content_type')})"
    ),
    "missing-xfce-dependency": lambda p: f"missing XFCE build dependency: {_d(p,'package')}",
    "missing-gnome-common": lambda p: "gnome-common is not installed",
    "missing-config.status-input": lambda p: f"missing config.status input {_d(p,'path')}",
    "missing-gnome-common-dependency": lambda p: (
        f"missing gnome-common dependency: {_d(p,'package')}: (>= {_d(p,'minimum_version') or 'any'})"
    ),
    "missing-automake-input": lambda p: f"automake input file {_d(p,'path')} missing",
    "chroot-not-found": lambda p: f"chroot not found: {_d(p,'chroot')}",
    "missing-libtool": lambda p: "Libtool is missing",
    "missing-cmake-files": lambda p: f"CMake files missing: {_dbg(_d(p,'filenames'))}",
    "missing-cmake-components": lambda p: f"Missing CMake components: {_dbg(_d(p,'components'))}",
    "cmake-exact-version-missing": lambda p: (
        f"CMake needs exact package {_d(p,'package')}, version {_d(p,'exact_version_needed')}"
    ),
    "missing-static-library": lambda p: f"missing static library: {_d(p,'library')}",
    "missing-go-runtime": lambda p: "go runtime is missing",
    "unknown-certificate-authority": lambda p: f"Unknown Certificate Authority for {_d(p,'url')}",
    "missing-perl-predeclared": lambda p: f"missing predeclared function: {_d(p,'name')}",
    "missing-git-identity": lambda p: "Missing Git Identity",
    "no-secret-gpg-key": lambda p: "No secret GPG key is present",
    "no-vcversioner-version": lambda p: "vcversion could not find a git directory or version.txt file",
    "missing-latex-file": lambda p: f"Missing LaTeX file: {_d(p,'filename')}",
    "missing-x-display": lambda p: "No X Display",
    "missing-fontspec": lambda p: f"Missing font spec: {_d(p,'fontspec')}",
    "inactive-killed": lambda p: f"Killed due to inactivity after {_d(p,'minutes')} minutes",
    "missing-pause-credentials": lambda p: "Missing credentials for PAUSE",
    "mismatch-gettext-versions": lambda p: (
        f"Mismatch versions ({_d(p,'makefile_version')}, {_d(p,'autoconf_version')})"
    ),
    "invalid-current-user": lambda p: f"Can not run as {_d(p,'user')}",
    "missing-gnulib-directory": lambda p: f"Missing gnulib directory: {_d(p,'directory')}",
    "missing-lua-module": lambda p: f"Missing Lua Module: {_d(p,'module')}",
    "missing-go.mod-file": lambda p: "go.mod file is missing",
    "outdated-go.mod-file": lambda p: "go.mod file is outdated",
    "code-coverage-too-low": lambda p: (
        f"Code coverage too low: {_d(p,'actual'):.2f} < {_d(p,'required'):.2f}"
    ),
    "esmodule-must-use-import": lambda p: f"ESM-only module {_d(p,'path')} must use import()",
    "missing-php-extension": lambda p: f"Missing PHP Extension: {_d(p,'extension')}",
    "minimum-autoconf-too-old": lambda p: (
        f"configure.{{ac,in}} should require newer autoconf {_d(p,'minimum_version')}"
    ),
    "missing-perl-distribution-file": lambda p: f"Missing perl distribution file: {_d(p,'filename')}",
    "missing-go.sum-entry": lambda p: f"Missing go.sum entry: {_d(p,'package')}@{_d(p,'version')}",
    "valac-cannot-compile": lambda p: "valac can not compile",
    "missing-debian-build-dep": lambda p: f"Missing Debian Build-Depends: {_d(p,'dep')}",
    "missing-qt-modules": lambda p: f"Missing QT modules: {_dbg(_d(p,'modules'))}",
    "missing-ocaml-package": lambda p: f"Missing OCaml package: {_d(p,'package')}",
    "too-many-open-files": lambda p: "Too many open files",
    "missing-make-target": lambda p: f"Unknown make target: {_d(p,'target')}",
    # debian.rs
    "dpkg-error": lambda p: f"dpkg error: {_d(p,'msg')}",
    "apt-update-error": lambda p: "apt update error",
    "missing-release-file": lambda p: f"apt missing release file: {_d(p,'url')}",
    "apt-package-unknown": lambda p: f"apt package unknown: {_d(p,'package')}",
    "apt-broken-packages": lambda p: f"apt broken packages: {_d(p,'description')}",
    "unable-to-find-upstream-tarball": lambda p: (
        f"Unable to find upstream tarball for {_d(p,'package')} {_d(p,'version')}"
    ),
    "source-format-unbuildable": lambda p: (
        f"Source format {_d(p,'source_format')} is unbuildable: {_d(p,'reason')}"
    ),
    "source-format-unsupported": lambda p: f"Source format {_d(p,'source_format')} is unsupported",
    "patch-file-missing": lambda p: f"Patch file missing: {_d(p,'path')}",
    "unrepresentable-local-changes": lambda p: "Tree has unrepresentable changes",
    "unwanted-binary-files": lambda p: "Tree has unwanted binary files",
    "binary-file-changed": lambda p: "Binary file changed",
    "missing-control-file": lambda p: "Missing control file: ",
    "unknown-mercurial-extra-fields": lambda p: f"Unknown Mercurial extra field: {_d(p,'field')}",
    "upstream-pgp-signature-verification-failed": lambda p: "Upstream PGP signature verification failed",
    "uscan-request-version-missing": lambda p: f"UScan request version missing: {_d(p,'version')}",
    "debcargo-failure": lambda p: f"Debcargo failure: {_d(p,'reason')}",
    "changelog-parse-error": lambda p: f"Changelog parse error: {_d(p,'reason')}",
    "uscan-error": lambda p: f"UScan error: {_d(p,'reason')}",
    "uscan-failed": lambda p: f"UScan failed: {_d(p,'reason')}",
    "inconsistent-source-format": lambda p: "Inconsistent source format between version and source format",
    "debian-upstream-metadata-invalid": lambda p: f"Upstream metadata file parse error: {_d(p,'reason')}",
    "dpkg-source-pack-failed": lambda p: f"Dpkg source pack failed: {_d(p,'reason')}",
    "debcargo-missing-crate": lambda p: (
        f"debcargo can't find crate {_d(p,'crate')}"
        + (f" (version: {_d(p,'version')})" if _d(p, "version") else "")
    ),
    "pristine-tar-missing-tree": lambda p: f"Pristine-tar tree missing: {_d(p,'treeish')}",
    "missing-revision": lambda p: f"Missing revision: {_d(p,'revision')}",
    "debcargo-unacceptable-predicate": lambda p: (
        f"Cannot represent prerelease part of dependency: {_d(p,'predicate')}"
    ),
    "debcargo-unacceptable-comparator": lambda p: (
        f"Cannot represent prerelease part of dependency: {_d(p,'comparator')}"
    ),
    "uscan-too-many-requests": lambda p: f"UScan too many requests: {_d(p,'reason')}",
    "unsatisfied-apt-conflicts": lambda p: f"unsatisfied apt conflicts: {_d(p,'relations')}",
    "arch-not-in-list": lambda p: f"Architecture {_d(p,'arch')} not a build arch",
    "unsatisfied-apt-dependencies": lambda p: f"unsatisfied apt dependencies: {_d(p,'relations')}",
    "insufficient-disk-space": lambda p: (
        f"Insufficient disk space for build. Need: {_d(p,'needed')} KiB, free: {_d(p,'free')} KiB"
    ),
    "nested-tree-unresolvable": lambda p: f"Nested tree for {_d(p,'name')} cannot be resolved",
    "submodule-encountered": lambda p: f"Submodule encountered at {_d(p,'path')} ({_d(p,'sha')})",
    "uscan-remote-version-mismatch": lambda p: (
        f"uscan: {_d(p,'package')} latest is {_d(p,'remote_version')}, wanted {_d(p,'wanted_version')}"
    ),
    "uscan-watchfile-malformed": lambda p: "uscan rejected malformed debian/watch paragraph",
    # autopkgtest.rs
    "badpkg": lambda p: f"autopkgtest dependencies unsatisfiable: {_badpkg_args_dbg(_d(p,'args'))}",
    "timed-out": lambda p: "autopkgtest timed out",
    "xdg-runtime-dir-not-set": lambda p: "XDG_RUNTIME_DIR not set",
    "testbed-failure": lambda p: f"autopkgtest testbed failure: {_d(p,'reason')}",
    "testbed-chroot-disappeared": lambda p: "autopkgtest dependency chroot disappeared",
    "erroneous-package": lambda p: f"autopkgtest erroneous package: {_d(p,'reason')}",
    "stderr-output": lambda p: f"autopkgtest output on stderr: {_d(p,'stderr_line')}",
    "testbed-setup-failure": lambda p: (
        f"autopkgtest testbed setup failure: {_d(p,'command')} exited with status "
        f"{_d(p,'exit_status')}: {_d(p,'error')}"
    ),
}


def problem_message(p: Optional[Problem]) -> Optional[str]:
    if p is None:
        return None
    kind = p.kind
    fn = _SIMPLE.get(kind)
    if fn is not None:
        try:
            return fn(p)
        except Exception:
            pass
    # compound formats
    if kind == "missing-python-module":
        pv = _d(p, "python_version")
        base = (
            f"Missing {pv} Python module: {_d(p,'module')}"
            if pv
            else f"Missing Python module: {_d(p,'module')}"
        )
        mv = _d(p, "minimum_version")
        return base + (f" (>= {mv})" if mv else "")
    if kind == "missing-python-distribution":
        pv = _d(p, "python_version")
        base = (
            f"Missing {pv} Python distribution: {_d(p,'distribution')}"
            if pv
            else f"Missing Python distribution: {_d(p,'distribution')}"
        )
        mv = _d(p, "minimum_version")
        return base + (f" (>= {mv})" if mv else "")
    if kind == "missing-r-package":
        base = f"Missing R package: {_d(p,'package')}"
        mv = _d(p, "minimum_version")
        return base + (f" (>= {mv})" if mv else "")
    if kind == "missing-pkg-config-package":
        mv = _d(p, "minimum_version")
        if mv:
            return f"Missing pkg-config module: {_d(p,'module')} >= {mv}"
        return f"Missing pkg-config module: {_d(p,'module')}"
    if kind == "missing-perl-file":
        inc = _d(p, "inc")
        if inc:
            return f"Missing Perl file {_d(p,'filename')} (INC: {':'.join(inc)})"
        return f"Missing Perl file {_d(p,'filename')}"
    if kind == "missing-perl-module":
        fnme = _d(p, "filename")
        base = (
            f"Missing Perl module: {_d(p,'module')} (from {fnme})"
            if fnme
            else f"Missing Perl module: {_d(p,'module')}"
        )
        mv = _d(p, "minimum_version")
        base += f" >= {mv}" if mv else ""
        inc = _d(p, "inc")
        if inc is not None:
            base += " (INC: " + ", ".join(inc) + ")"
        return base
    if kind == "missing-cargo-crate":
        req = _d(p, "requirement")
        if req:
            return f"Missing Cargo crate {_d(p,'crate')} (required by {req})"
        return f"Missing Cargo crate {_d(p,'crate')}"
    if kind == "missing-ruby-gem":
        v = _d(p, "version")
        if v:
            return f"missing ruby gem: {_d(p,'gem')} (>= {v})"
        return f"missing ruby gem: {_d(p,'gem')}"
    if kind == "missing-cmake-config":
        v = _d(p, "version")
        if v:
            return f"Missing CMake package configuration for {_d(p,'name')} (version {v})"
        return f"Missing CMake package configuration for {_d(p,'name')}"
    if kind == "apt-file-fetch-failure":
        url = _d(p, "url")
        if url:
            return f"apt fetch failure: {url} ({_d(p,'error')})"
        return f"apt fetch failure: {_d(p,'error')}"
    if kind == "unexpected-local-upstream-changes":
        files = _d(p, "files")
        if files is not None:
            if len(files) < 5:
                return f"Tree has local changes: {_dbg(files)}"
            return f"Tree has local changes: {len(files)} files"
        return "Tree has local changes"
    if kind == "dpkg-bad-version":
        reason = _d(p, "reason")
        if reason:
            return f"Version {_d(p,'version')} is invalid: {reason}"
        return f"Version {_d(p,'version')} is invalid"
    if kind == "brz-internal-error":
        # reference Display appends the message only when non-empty
        # (src/problems/debian.rs:1679-1691)
        msg = _d(p, "exception_message")
        if msg:
            return f"brz internal error: {_d(p,'exception_type')}: {msg}"
        return f"brz internal error: {_d(p,'exception_type')}"
    # fallback
    return f"{kind}: {p.details_json()}"
