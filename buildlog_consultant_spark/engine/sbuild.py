"""sbuild container-format analysis (reference: /root/reference/src/sbuild.rs).

Sectionizer, summary parse, tail strip, preamble scan, per-stage failure
finders and the 11-arm stage dispatcher ``worker_failure_from_sbuild_log``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional, Sequence

from ..core.matchers import Match, MultiLineMatch, SingleLineMatch
from ..core.problems import (
    ArchitectureNotInList,
    ChrootNotFound,
    DpkgBadVersion,
    DpkgBinaryFileChanged,
    DpkgSourceLocalChanges,
    DpkgSourcePackFailed,
    DpkgSourceUnrepresentableChanges,
    DpkgUnwantedBinaryFiles,
    InsufficientDiskSpace,
    MissingControlFile,
    MissingRevision,
    NoSpaceOnDevice,
    PatchApplicationFailed,
    PatchFileMissing,
    PristineTarTreeMissing,
    Problem,
    SourceFormatUnbuildable,
    SourceFormatUnsupported,
)
from .apt import (
    find_apt_get_failure,
    find_apt_get_update_failure,
    find_cudf_output,
    error_from_dose3_reports,
)
from .core import find_build_failure_description, split_log_lines
from .problem_text import problem_message


# ---------------------------------------------------------------------------
# Sectionizer (src/sbuild.rs:375-463)
# ---------------------------------------------------------------------------

SEP = "+" + "-" * 78 + "+"

_TIMESTAMP_RE = re.compile(
    r"\s+[A-Z][a-z]{2},\s+\d{1,2}\s+[A-Z][a-z]{2}\s+\d{4}\s+\d{2}:\d{2}:\d{2}\s+[+-]\d{4}$"
)


def strip_section_header_timestamp(raw: str) -> str:
    """src/sbuild.rs:346-363."""
    m = _TIMESTAMP_RE.search(raw)
    if m:
        return raw[: m.start()].rstrip()
    return raw


@dataclass
class SbuildLogSection:
    title: Optional[str]
    offsets: tuple[int, int]  # (begin, end), 1-based per reference
    lines: list[str] = field(default_factory=list)


class SbuildLog:
    """src/sbuild.rs:226-285. Section title lookup is case-insensitive."""

    def __init__(self, sections: list[SbuildLogSection]):
        self.sections = sections

    def get_section(self, title: Optional[str]) -> Optional[SbuildLogSection]:
        for s in self.sections:
            if title is None:
                if s.title is None:
                    return s
            elif s.title is not None and s.title.lower() == title.lower():
                return s
        return None

    def get_section_lines(self, title: Optional[str]) -> Optional[list[str]]:
        s = self.get_section(title)
        return s.lines if s is not None else None

    def section_titles(self) -> list[str]:
        return [s.title for s in self.sections if s.title is not None]

    def get_failed_stage(self) -> Optional[str]:
        summary = self.summary()
        return summary.get("fail_stage") if summary is not None else None

    def summary(self) -> Optional[dict]:
        lines = self.get_section_lines("Summary")
        return parse_summary(lines) if lines is not None else None


def parse_sbuild_log(text: str) -> SbuildLog:
    """Streaming split on +{78×'-'}+ / |title| / sep triplets
    (src/sbuild.rs:375-463). Lines keep their trailing newline, matching the
    reference's read_line behavior."""
    raw = split_log_lines(text)
    sections: list[SbuildLogSection] = []
    begin_offset = 1
    lines: list[str] = []
    title: Optional[str] = None
    lineno = 0
    i = 0
    n = len(raw)
    while i < n:
        line = raw[i]
        i += 1
        lineno += 1
        if line.strip() == SEP:
            l1 = raw[i] if i < n else ""
            l2 = raw[i + 1] if i + 1 < n else ""
            i += 2
            lineno += 2
            l1t, l2t = l1.strip(), l2.strip()
            if l1t.startswith("|") and l1t.endswith("|") and l2t == SEP:
                end_offset = lineno - 3
                while lines and lines[-1] == "\n":
                    lines.pop()
                    end_offset -= 1
                if lines:
                    sections.append(SbuildLogSection(title, (begin_offset, end_offset), lines))
                    lines = []
                raw_title = l1t.strip("|").strip()
                title = strip_section_header_timestamp(raw_title)
                begin_offset = lineno
            else:
                lines.extend([line, l1, l2])
        else:
            lines.append(line)
    sections.append(SbuildLogSection(title, (begin_offset, lineno), lines))
    return SbuildLog(sections)


# ---------------------------------------------------------------------------
# Summary (src/sbuild.rs:147-219) — values kept as strings/ints in a dict
# ---------------------------------------------------------------------------

_SUMMARY_KEYS = {
    "Fail-Stage": "fail_stage",
    "Build Architecture": "build_architecture",
    "Build Type": "build_type",
    "Build-Time": "build_time",
    "Build-Space": "build_space",
    "Host Architecture": "host_architecture",
    "Install-Time": "install_time",
    "Lintian": "lintian",
    "Package": "package",
    "Package-Time": "package_time",
    "Source-Version": "source_version",
    "Job": "job",
    "Machine Architecture": "machine_architecture",
    "Distribution": "distribution",
    "Autopkgtest": "autopkgtest",
    "Status": "status",
    "Space": "space",
    "Version": "version",
}
_INT_KEYS = {"build_time", "install_time", "package_time"}
_SPACE_KEYS = {"build_space", "space"}


def parse_summary(lines: Sequence[str]) -> dict:
    out: dict = {}
    for line in lines:
        if not line.strip():
            continue
        parts = line.rstrip().split(": ", 1)
        if len(parts) != 2:
            continue  # reference logs a warning
        key, value = parts[0], parts[1].strip()
        field_name = _SUMMARY_KEYS.get(key)
        if field_name is None:
            continue  # unknown key — reference logs a warning
        if field_name in _INT_KEYS:
            out[field_name] = int(value)
        elif field_name in _SPACE_KEYS:
            out[field_name] = None if value == "n/a" else int(value)
        else:
            out[field_name] = value
    return out


def find_failed_stage(lines: Sequence[str]) -> Optional[str]:
    """src/sbuild.rs:42-49."""
    for line in lines:
        if line.startswith("Fail-Stage: "):
            return line[len("Fail-Stage: "):].strip()
    return None


# ---------------------------------------------------------------------------
# Tail strip (src/sbuild.rs:905-954)
# ---------------------------------------------------------------------------

DEFAULT_LOOK_BACK = 50
_FILE_HEADER_RE = re.compile(r"==> (.*) <==")


def strip_build_tail(
    lines: Sequence[str], look_back: Optional[int] = None
) -> tuple[list[str], dict[str, list[str]]]:
    look_back = look_back if look_back is not None else DEFAULT_LOOK_BACK
    interesting = list(lines)
    n = len(lines)
    start_tail = max(0, n - look_back)
    for i in range(start_tail, n):
        if lines[i].startswith("Build finished at "):
            interesting = list(lines[:i])
            if interesting and interesting[-1].rstrip("\n") == "-" * 80:
                interesting = interesting[:-1]
            break

    files: dict[str, list[str]] = {}
    body = interesting
    current_file = None
    current_contents: list[str] = []
    start = 0
    for i, line in enumerate(interesting):
        m = _FILE_HEADER_RE.search(line)
        if m:
            if current_file is not None:
                files[current_file] = current_contents
            else:
                body = current_contents
            current_file = m.group(1)
            current_contents = []
            start = i + 1
            continue
        current_contents = interesting[start:i + 1]
    if current_file is not None:
        files[current_file] = current_contents
    else:
        body = current_contents
    return body, files


# ---------------------------------------------------------------------------
# Preamble scan (src/sbuild.rs:543-843)
# ---------------------------------------------------------------------------


def find_preamble_failure_description(
    lines: Sequence[str],
) -> tuple[Optional[Match], Optional[Problem]]:
    ret: tuple[Optional[Match], Optional[Problem]] = (None, None)
    n = len(lines)
    start = max(0, n - 100)
    for lineno in range(n - 1, start - 1, -1):
        line = lines[lineno].rstrip("\n")
        m = re.search(
            "dpkg-source: error: aborting due to unexpected upstream changes, see (.*)",
            line,
        )
        if m:
            j = lineno - 1
            files = []
            while j > 0:
                if lines[j] == "dpkg-source: info: local changes detected, the modified files are:\n":
                    return (
                        SingleLineMatch("direct regex", lineno, lines[lineno]),
                        DpkgSourceLocalChanges(m.group(1), files),
                    )
                files.append(lines[j].strip())
                j -= 1
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgSourceLocalChanges(m.group(1), files),
            )
        if line == "dpkg-source: error: unrepresentable changes to source":
            return (
                SingleLineMatch("direct match", lineno, lines[lineno]),
                DpkgSourceUnrepresentableChanges(),
            )
        if re.search(r"dpkg-source: error: detected ([0-9]+) unwanted binary file.*", line):
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgUnwantedBinaryFiles(),
            )
        m = re.search(
            "dpkg-source: error: cannot read (.*/debian/control): No such file or directory",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                MissingControlFile(),
            )
        if re.search("dpkg-source: error: .*: No space left on device", line):
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                NoSpaceOnDevice(),
            )
        if re.search("tar: .*: Cannot write: No space left on device", line):
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                NoSpaceOnDevice(),
            )
        m = re.search(
            "dpkg-source: error: cannot represent change to (.*): binary file contents changed",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgBinaryFileChanged([m.group(1)]),
            )
        m = re.search(
            r"dpkg-source: error: source package format \'(.*)\' is not supported: Can\'t locate (.*) in \@INC \(you may need to install the (.*) module\) \(\@INC contains: (.*)\) at \(eval [0-9]+\) line [0-9]+\.",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                SourceFormatUnsupported(m.group(1)),
            )
        m = re.search("E: Failed to package source directory (.*)", line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgSourcePackFailed(m.group(1)),
            )
        m = re.search("E: Bad version unknown in (.*)", line)
        if m and lineno >= 1 and lines[lineno - 1].startswith("LINE: "):
            m2 = re.search(
                r"dpkg-parsechangelog: warning: .*\(l[0-9]+\): version \'(.*)\' is invalid: (.*)",
                lines[lineno - 2] if lineno >= 2 else "",
            )
            if m2:
                return (
                    SingleLineMatch("direct regex", lineno, lines[lineno]),
                    DpkgBadVersion(m2.group(1), m2.group(2)),
                )
        m = re.search("Patch (.*) does not apply \\(enforce with -f\\)", line)
        if m:
            patchname = m.group(1).rsplit("/", 1)[-1]
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                PatchApplicationFailed(patchname),
            )
        m = re.search(
            r"dpkg-source: error: LC_ALL=C patch .* --reject-file=- < .*\/debian\/patches\/([^ ]+) subprocess returned exit status 1",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                PatchApplicationFailed(m.group(1)),
            )
        m = re.search("dpkg-source: error: can't build with source format '(.*)': (.*)", line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                SourceFormatUnbuildable(m.group(1), m.group(2)),
            )
        m = re.search("dpkg-source: error: cannot read (.*): No such file or directory", line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                PatchFileMissing(m.group(1)),
            )
        m = re.search("dpkg-source: error: source package format '(.*)' is not supported: (.*)", line)
        if m:
            _, p = find_build_failure_description([m.group(2)])
            if p is None:
                p = SourceFormatUnsupported(m.group(1))
            return SingleLineMatch("direct regex", lineno, lines[lineno]), p
        m = re.search("breezy.errors.NoSuchRevision: (.*) has no revision b'(.*)'", line)
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                MissingRevision(m.group(2)),
            )
        m = re.search(
            r"fatal: ambiguous argument \'(.*)\': unknown revision or path not in the working tree.",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                PristineTarTreeMissing(m.group(1)),
            )
        m = re.search("dpkg-source: error: (.*)", line)
        if m:
            # lowest-priority branch: remember, keep scanning (src/sbuild.rs:829-839)
            ret = (
                SingleLineMatch("direct regex", lineno, lines[lineno]),
                DpkgSourcePackFailed(m.group(1)),
            )
    return ret


# ---------------------------------------------------------------------------
# SbuildFailure + stage finders (src/sbuild.rs:470-1612)
# ---------------------------------------------------------------------------


@dataclass
class SbuildFailure:
    stage: Optional[str] = None
    description: Optional[str] = None
    error: Optional[Problem] = None
    phase: Optional[tuple] = None  # ("build",) or ("autopkgtest", testname)
    section: Optional[SbuildLogSection] = None
    match: Optional[Match] = None

    def to_dict(self) -> dict:
        """JSON shape per src/sbuild.rs:490-519."""
        out = {
            "stage": self.stage,
            "phase": list(self.phase) if self.phase else None,
            "section": self.section.title if self.section else None,
            "origin": self.match.origin if self.match else None,
            "lineno": (
                self.section.offsets[0] + self.match.lineno
                if self.section and self.match
                else None
            ),
        }
        if self.error is not None:
            out["kind"] = self.error.kind
            out["details"] = self.error.details
        return out


def find_failure_fetch_src(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section("fetch source files")
    if section is None:
        return None
    section_lines = section.lines
    if section_lines and not section_lines[0].strip():
        section_lines = section_lines[1:]
    if len(section_lines) == 1 and section_lines[0].startswith("E: Could not find "):
        preamble = sbuildlog.get_section_lines(None)
        if preamble is None:
            return None
        match, error = find_preamble_failure_description(preamble)
        return SbuildFailure(
            stage="unpack",
            description=problem_message(error) if error else None,
            error=error,
            section=section,
            match=match,
        )
    match, error = find_apt_get_failure(section.lines)
    return SbuildFailure(
        stage=failed_stage,
        description=f"build failed stage {failed_stage}",
        error=error,
        section=section,
        match=match,
    )


def find_creation_session_error(lines: Sequence[str]):
    ret = (None, None)
    for i in range(len(lines) - 1, -1, -1):
        line = lines[i]
        if line.startswith("E: "):
            ret = (SingleLineMatch("direct regex", i, lines[i]), None)
        m = re.search("E: Chroot for distribution (.*), architecture (.*) not found", line)
        if m:
            ret = (
                SingleLineMatch("direct regex", i, lines[i]),
                ChrootNotFound(f"{m.group(1)}-{m.group(2)}-sbuild"),
            )
        if line.rstrip("\n").endswith(": No space left on device"):
            return SingleLineMatch("direct regex", i, lines[i]), NoSpaceOnDevice()
    return ret


def find_failure_create_session(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section(None)
    if section is None:
        return None
    match, error = find_creation_session_error(section.lines)
    return SbuildFailure(
        stage=failed_stage,
        description=f"build failed stage {failed_stage}",
        error=error,
        phase=("create-session",),
        section=section,
        match=match,
    )


def find_failure_unpack(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section("build")
    if section is not None:
        match, error = find_preamble_failure_description(section.lines)
        if error is not None:
            return SbuildFailure(
                stage=failed_stage,
                description=problem_message(error),
                error=error,
                section=section,
                match=match,
                phase=("unpack",),
            )
    return SbuildFailure(
        stage=failed_stage,
        description=f"build failed stage {failed_stage}",
        phase=("unpack",),
        section=section,
    )


def find_failure_build(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section("build")
    match = error = None
    if section is not None:
        body, _files = strip_build_tail(section.lines)
        match, error = find_build_failure_description(body)
    if error is not None:
        description = problem_message(error)
    elif match is not None:
        description = match.line.rstrip("\n")
    else:
        description = f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        phase=("build",),
        section=section,
        match=match,
    )


def find_failure_apt_get_update(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    focus_section, match, error = find_apt_get_update_failure(sbuildlog)
    if error is not None:
        description = problem_message(error)
    elif match is not None:
        description = match.line.rstrip("\n")
    else:
        description = f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        phase=("apt-get-update",),
        section=sbuildlog.get_section(focus_section),
        match=match,
    )


def find_arch_check_failure_description(lines: Sequence[str]):
    for offset, line in enumerate(lines):
        m = re.search(
            "E: dsc: (.*) not in arch list or does not match any arch wildcards: (.*) -- skipping",
            line,
        )
        if m:
            return (
                SingleLineMatch("direct regex", offset, lines[offset]),
                ArchitectureNotInList(m.group(1), m.group(2).split()),
            )
    return SingleLineMatch("direct regex", len(lines) - 1, lines[-1]), None


def find_failure_arch_check(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section("check architectures")
    if section is not None:
        match, error = find_arch_check_failure_description(section.lines)
    else:
        match, error = None, None
    description = problem_message(error) if error else f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        section=section,
        match=match,
    )


def find_check_space_failure_description(lines: Sequence[str]):
    for offset, line in enumerate(lines):
        if line == "E: Disk space is probably not sufficient for building.\n" or (
            line.rstrip("\n") == "E: Disk space is probably not sufficient for building."
        ):
            if offset + 1 < len(lines):
                m = re.search(
                    "I: Source needs ([0-9]+) KiB, while ([0-9]+) KiB is free.",
                    lines[offset + 1],
                )
                if m:
                    return (
                        SingleLineMatch("direct regex", offset, lines[offset]),
                        InsufficientDiskSpace(int(m.group(1)), int(m.group(2))),
                    )
            return SingleLineMatch("direct match", offset, lines[offset]), None
    return None, None


def find_failure_check_space(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    section = sbuildlog.get_section("cleanup")
    if section is None:
        return None
    match, error = find_check_space_failure_description(section.lines)
    description = problem_message(error) if error else f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        section=section,
        match=match,
    )


DOSE3_SECTION = "install dose3 build dependencies (aspcud-based resolver)"


def find_install_deps_failure_description(sbuildlog: SbuildLog):
    """src/sbuild.rs:1321-1362."""
    dose3_lines = sbuildlog.get_section_lines(DOSE3_SECTION)
    if dose3_lines is not None:
        dose3 = find_cudf_output(dose3_lines)
        if dose3 is not None:
            offsets, output = dose3
            error = error_from_dose3_reports(output["report"])
            match = MultiLineMatch("", offsets, [dose3_lines[o] for o in offsets])
            return DOSE3_SECTION, match, error

    SECTION = "Install package build dependencies"
    bd_lines = sbuildlog.get_section_lines(SECTION)
    if bd_lines is not None:
        dose3 = find_cudf_output(bd_lines)
        if dose3 is not None:
            offsets, output = dose3
            error = error_from_dose3_reports(output["report"])
            match = MultiLineMatch("", offsets, [bd_lines[o] for o in offsets])
            return SECTION, match, error
        match, error = find_apt_get_failure(bd_lines)
        return SECTION, match, error

    for section in sbuildlog.sections:
        if section.title is None:
            continue
        if re.search("install (.*) build dependencies.*", section.title.lower()):
            match, error = find_apt_get_failure(section.lines)
            if match is not None:
                return section.title, match, error

    return None, None, None


def find_failure_install_deps(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    focus_section, match, error = find_install_deps_failure_description(sbuildlog)
    if error is not None:
        description = problem_message(error)
    elif match is not None:
        line = match.line
        if line.startswith("E: "):
            description = line[3:].rstrip("\n")
        else:
            description = line.rstrip("\n")
    else:
        description = f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        phase=("build",),
        section=sbuildlog.get_section(focus_section) if focus_section else None,
        match=match,
    )


def find_failure_autopkgtest(sbuildlog: SbuildLog, failed_stage: str) -> Optional[SbuildFailure]:
    focus_section = {
        "run-post-build-commands": "post build commands",
        "post-build": "post build",
        "autopkgtest": "autopkgtest",
    }[failed_stage]
    section = sbuildlog.get_section(focus_section)
    if section is not None:
        from .autopkgtest import find_autopkgtest_failure_description

        match, testname, error, description = find_autopkgtest_failure_description(
            section.lines
        )
        if description is None and error is not None:
            description = problem_message(error)
        phase = ("autopkgtest", testname if testname is not None else "<setup>")
    else:
        description, error, match, phase = None, None, None, None
    if description is None:
        description = f"build failed stage {failed_stage}"
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        phase=phase,
        section=section,
        match=match,
    )


_STAGE_DISPATCH = {
    "fetch-src": find_failure_fetch_src,
    "create-session": find_failure_create_session,
    "unpack": find_failure_unpack,
    "build": find_failure_build,
    "apt-get-update": find_failure_apt_get_update,
    "arch-check": find_failure_arch_check,
    "check-space": find_failure_check_space,
    "install-deps": find_failure_install_deps,
    "explain-bd-uninstallable": find_failure_install_deps,
    "autopkgtest": find_failure_autopkgtest,
    "run-post-build-commands": find_failure_autopkgtest,
    "post-build": find_failure_autopkgtest,
}


def worker_failure_from_sbuild_log(sbuildlog: SbuildLog) -> SbuildFailure:
    """The stage dispatcher (src/sbuild.rs:1463-1570)."""
    if [s.title for s in sbuildlog.sections] == [None]:
        section = sbuildlog.sections[0]
        match, error = find_preamble_failure_description(section.lines)
        if error is not None:
            return SbuildFailure(
                stage="unpack",
                description=problem_message(error),
                error=error,
                section=section,
                match=match,
            )

    failed_stage = sbuildlog.get_failed_stage()

    if failed_stage is not None:
        finder = _STAGE_DISPATCH.get(failed_stage)
        if finder is not None:
            overall = finder(sbuildlog, failed_stage)
            if overall is not None:
                return overall
        return SbuildFailure(
            stage=failed_stage,
            description=f"build failed stage {failed_stage}",
        )

    description = "build failed"
    match = error = None
    section = None
    if [s.title for s in sbuildlog.sections] == [None]:
        s = sbuildlog.sections[0]
        match, error = find_preamble_failure_description(s.lines)
        if error is not None:
            description = problem_message(error)
        else:
            match, error = find_build_failure_description(s.lines)
            if match is not None:
                description = match.line.rstrip("\n")
            if error is None:
                from .brz import find_brz_build_error

                r = find_brz_build_error(s.lines)
                if r is not None:
                    e, d = r
                    if e is not None:
                        description = d
                        error = e
                    elif match is None:
                        description = d
        section = s
    return SbuildFailure(
        stage=failed_stage,
        description=description,
        error=error,
        phase=("build-env",),
        section=section,
        match=match,
    )
