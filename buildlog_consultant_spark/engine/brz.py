"""Breezy (brz) error analysis (reference: /root/reference/src/brz.rs)."""

from __future__ import annotations

import re
from typing import Optional, Sequence

from ..core.problems import (
    BrzInternalError,
    ChangelogParseError,
    DebcargoFailure,
    DebcargoUnacceptableComparator,
    DebcargoUnacceptablePredicate,
    DpkgSourcePackFailed,
    InconsistentSourceFormat,
    MissingDebcargoCrate,
    NestedTreeUnresolvable,
    NoSpaceOnDevice,
    Problem,
    SubmoduleEncountered,
    UnableToFindUpstreamTarball,
    UnknownMercurialExtraFields,
    UpstreamMetadataFileParseError,
    UpstreamPGPSignatureVerificationFailed,
    UScanError,
    UScanFailed,
    UScanRemoteVersionMismatch,
    UScanRequestVersionMissing,
    UScanTooManyRequests,
    UScanWatchfileMalformed,
)
from .problem_text import problem_message


def _debcargo_crate_from_string(text: str) -> Problem:
    # src/problems/debian.rs:1084-1096
    text = text.strip()
    if "=" in text:
        cratename, version = text.split("=", 1)
        return MissingDebcargoCrate(cratename.strip(), version.strip())
    return MissingDebcargoCrate(text, None)


def parse_debcargo_failure(m: re.Match, prior_lines: Sequence[str]) -> Optional[Problem]:
    """src/brz.rs:62-123."""
    MORE_TAIL = "\x1b[0m\n"
    MORE_HEAD1 = "\x1b[1;31mSomething failed: "
    MORE_HEAD2 = "\x1b[1;31mdebcargo failed: "
    if prior_lines and prior_lines[-1].endswith(MORE_TAIL):
        extra = [prior_lines[-1][: -len(MORE_TAIL)]]
        for line in reversed(prior_lines[:-1]):
            if extra[0].startswith(MORE_HEAD1):
                extra[0] = extra[0][len(MORE_HEAD1):]
                break
            if extra[0].startswith(MORE_HEAD2):
                extra[0] = extra[0][len(MORE_HEAD2):]
                break
            extra.insert(0, line)
        if len(extra) == 1:
            extra = []
        if extra and extra[-1].startswith(
            "Try `debcargo update` to update the crates.io index."
        ):
            c = re.search(r"Couldn't find any crate matching (.*)", extra[-2].rstrip())
            if c:
                return _debcargo_crate_from_string(c.group(1))
            return DpkgSourcePackFailed(extra[-2])
        elif extra:
            c = re.search(
                r"Cannot represent prerelease part of dependency: (.*) Predicate \{ (.*) \}",
                extra[0],
            )
            if c:
                return DebcargoUnacceptablePredicate(c.group(1), c.group(2))
            c = re.search(
                r"Cannot represent prerelease part of dependency: (.*) Comparator \{ (.*) \}",
                extra[0],
            )
            if c:
                return DebcargoUnacceptableComparator(c.group(1), c.group(2))
        else:
            return DebcargoFailure("".join(extra))
    return DebcargoFailure("Debcargo failed to run")


BRZ_ERRORS = [
    (
        "Unable to find the needed upstream tarball for package (.*), version (.*)\\.",
        lambda m, pl: UnableToFindUpstreamTarball(m.group(1), m.group(2)),
    ),
    (
        "Unknown mercurial extra fields in (.*): b'(.*)'.",
        lambda m, pl: UnknownMercurialExtraFields(m.group(2)),
    ),
    (
        "UScan failed to run: In watchfile (.*), reading webpage (.*) failed: 429 too many requests\\.",
        lambda m, pl: UScanTooManyRequests(m.group(2)),
    ),
    (
        "UScan failed to run: OpenPGP signature did not verify..",
        lambda m, pl: UpstreamPGPSignatureVerificationFailed(),
    ),
    (
        r"Inconsistency between source format and version: version is( not)? native, format is( not)? native\.",
        lambda m, pl: InconsistentSourceFormat(
            m.group(1) is not None, m.group(2) is not None
        ),
    ),
    (
        r"UScan failed to run: In (.*) no matching hrefs for version (.*) in watch line",
        lambda m, pl: UScanRequestVersionMissing(m.group(2)),
    ),
    (
        r"UScan failed to run: In (.*) no matching files for version (.*) in watch line",
        lambda m, pl: UScanRequestVersionMissing(m.group(2)),
    ),
    (
        r"UScan failed to run: In directory ., downloading (.*) failed: (.*)",
        lambda m, pl: UScanFailed(m.group(1), m.group(2)),
    ),
    (
        r"UScan failed to run: In directory \., downloading\n  (.*) failed: (.*)",
        lambda m, pl: UScanFailed(m.group(1), m.group(2)),
    ),
    (
        r"UScan failed to run: In watchfile debian/watch, reading webpage\n  (.*) failed: (.*)",
        lambda m, pl: UScanFailed(m.group(1), m.group(2)),
    ),
    (
        r"UScan failed to run: In watchfile debian/watch, reading webpage (.*) failed: (.*)",
        lambda m, pl: UScanFailed(m.group(1), m.group(2)),
    ),
    (
        r"UScan failed to run: Newest version of (.*) on remote site is (.*), specified download version is (.*)\.",
        lambda m, pl: UScanRemoteVersionMismatch(m.group(1), m.group(2), m.group(3)),
    ),
    (
        r"UScan failed to run: The following paragraph isn't well formatted, skipping it: ([\s\S]*)",
        lambda m, pl: UScanWatchfileMalformed(m.group(1).strip()),
    ),
    (
        r"Unable to parse upstream metadata file (.*): (.*)",
        lambda m, pl: UpstreamMetadataFileParseError(m.group(1), m.group(2)),
    ),
    (r"Debcargo failed to run\.", parse_debcargo_failure),
    (
        r"The nested tree for (.*) can not be resolved\.",
        lambda m, pl: NestedTreeUnresolvable(m.group(1)),
    ),
    (
        r"dulwich\.objects\.SubmoduleEncountered: \(b?'?([^']+)'?, b?'?([0-9a-f]+)'?\)",
        lambda m, pl: SubmoduleEncountered(m.group(1), m.group(2)),
    ),
    (
        r"^([A-Z][A-Za-z]*Error): ?(.*)$",
        lambda m, pl: BrzInternalError(m.group(1), m.group(2).strip()),
    ),
    (
        r"\[Errno 28\] No space left on device",
        lambda m, pl: NoSpaceOnDevice(),
    ),
]

_BRZ_ERRORS = [(re.compile(p), f) for p, f in BRZ_ERRORS]


def parse_brz_error(line: str, prior_lines: Sequence[str]):
    """src/brz.rs:223-251."""
    line = line.strip()
    for rx, f in _BRZ_ERRORS:
        m = rx.search(line)
        if m:
            err = f(m, prior_lines)
            return err, problem_message(err)
    if line.startswith("UScan failed to run: "):
        return UScanError(line[len("UScan failed to run: "):]), line
    if line.startswith("Unable to parse changelog: "):
        return ChangelogParseError(line[len("Unable to parse changelog: "):]), line
    first_line = line.split("\n", 1)[0]
    return None, first_line


def find_brz_build_error(lines: Sequence[str]):
    """src/brz.rs:28-49."""
    for i in range(len(lines) - 1, -1, -1):
        line = lines[i]
        if line.startswith("brz: ERROR: "):
            rest = [line[len("brz: ERROR: "):].rstrip("\n")]
            for n in lines[i + 1:]:
                if n.startswith(" "):
                    rest.append(n.rstrip("\n"))
            err, desc = parse_brz_error("\n".join(rest), list(lines[:i]))
            return err, desc
    return None
