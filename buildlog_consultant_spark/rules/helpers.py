"""Callback helper extractors (reference: /root/reference/src/common.rs:25-487)."""

from __future__ import annotations

import re
from typing import Optional

from ..core.problems import (
    MissingBuildFile,
    MissingCommand,
    MissingCommandOrBuildFile,
    MissingConfigure,
    MissingFile,
    MissingMavenArtifacts,
    MissingNodeModule,
    MissingPkgConfig,
    MissingRPackage,
    MissingRubyGem,
    Problem,
    VcsControlDirectoryNeeded,
)


def node_module_missing(m: re.Match) -> Optional[Problem]:
    # src/common.rs:25-35
    if m.group(1).startswith("/<<PKGBUILDDIR>>/"):
        return None
    if m.group(1).startswith("./"):
        return None
    return MissingNodeModule(m.group(1))


def file_not_found(m: re.Match) -> Optional[Problem]:
    # src/common.rs:37-66
    path = m.group(1)
    if path.startswith("/") and not path.startswith("/<<PKGBUILDDIR>>"):
        return MissingFile(path)
    if path.startswith("/<<PKGBUILDDIR>>/"):
        return MissingBuildFile(path[len("/<<PKGBUILDDIR>>/"):])
    if path == ".git/HEAD":
        return VcsControlDirectoryNeeded(["git"])
    if path == "CVS/Root":
        return VcsControlDirectoryNeeded(["cvs"])
    if "/" not in path:
        # Maybe a missing command?
        return MissingBuildFile(path)
    return None


def file_not_found_maybe_executable_path(p: str) -> Optional[Problem]:
    # src/common.rs:68-82
    if p.startswith("/") and not p.startswith("/<<PKGBUILDDIR>>"):
        return MissingFile(p)
    if "/" not in p:
        return MissingCommandOrBuildFile(p)
    return None


def file_not_found_maybe_executable(m: re.Match) -> Optional[Problem]:
    return file_not_found_maybe_executable_path(m.group(1))


def interpreter_missing(m: re.Match) -> Optional[Problem]:
    # src/common.rs:84-99
    p = m.group(1)
    if p.startswith("/"):
        if "PKGBUILDDIR" in p:
            return None
        return MissingFile(p)
    if "/" in p:
        return None
    return MissingCommand(p)


def pkg_config_missing(m: re.Match) -> Optional[Problem]:
    # src/common.rs:101-117
    expr = m.group(1).split("\t")[0]
    if ">=" in expr:
        pkg, minimum = expr.split(">=", 1)
        return MissingPkgConfig(pkg.strip(), minimum.strip())
    if " " not in expr:
        return MissingPkgConfig(expr)
    return None


def command_missing(m: re.Match) -> Optional[Problem]:
    # src/common.rs:119-134
    command = m.group(1)
    if "PKGBUILDDIR" in command:
        return None
    if command == "./configure":
        return MissingConfigure()
    if command.startswith("./") or command.startswith("../"):
        return None
    if command == "debian/rules":
        return None
    return MissingCommand(command)


def maven_missing_artifact(m: re.Match) -> Optional[Problem]:
    # src/common.rs:435-444
    artifacts = [s.strip() for s in m.group(1).split(",")]
    return MissingMavenArtifacts(artifacts)


def r_missing_package(m: re.Match) -> Optional[Problem]:
    # src/common.rs:446-458
    fragment = m.group(1)
    deps = [d.strip().strip("‘’'") for d in fragment.split(",")]
    return MissingRPackage.simple(deps[0])


def webpack_file_missing(m: re.Match) -> Optional[Problem]:
    # src/common.rs:460-468 (PathBuf::join semantics: absolute path replaces)
    path, container = m.group(1), m.group(2)
    joined = path if path.startswith("/") else container.rstrip("/") + "/" + path
    if joined.startswith("/") and not joined.startswith("/<<PKGBUILDDIR>>"):
        return MissingFile(joined)
    return None


def ruby_missing_gem(m: re.Match) -> Optional[Problem]:
    # src/common.rs:470-487
    minimum_version = None
    for grp in m.group(2).split(","):
        parts = grp.strip().split(" ", 1)
        if len(parts) == 2:
            cond, val = parts
            if cond == ">=":
                minimum_version = val
                break
            if cond == "~>":
                minimum_version = val
    return MissingRubyGem(m.group(1), minimum_version)
