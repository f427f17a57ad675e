"""Broadcast-join enrichment: problem_kind → remediation_category.

The lookup table is derived from the full kind registry (158 kinds,
core/problems.py, mirroring /root/reference/src/problems/) with a
deterministic bucket per FIXTURES.md §4. It is tiny (<200 rows), so the join
is always a broadcast-hash-join — no shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.problems import KIND_REGISTRY

_RESOURCE = {
    "no-space-on-device",
    "insufficient-disk-space",
    "too-many-open-files",
    "inactive-killed",
    "timed-out",
    "code-coverage-too-low",
}
_INFRA = {
    "chroot-not-found",
    "testbed-failure",
    "testbed-chroot-disappeared",
    "testbed-setup-failure",
    "missing-x-display",
    "xdg-runtime-dir-not-set",
    "invalid-current-user",
    "cancelled",
    "apt-update-error",
    "apt-file-fetch-failure",
    "missing-release-file",
    "unknown-certificate-authority",
    "uscan-too-many-requests",
}
_VCS = {
    "vcs-control-directory-needed",
    "missing-git-identity",
    "missing-revision",
    "pristine-tar-missing-tree",
    "nested-tree-unresolvable",
    "submodule-encountered",
    "unknown-mercurial-extra-fields",
    "unexpected-local-upstream-changes",
    "unrepresentable-local-changes",
    "brz-internal-error",
}
_FLAKY = {"stderr-output", "erroneous-package"}


def remediation_category(kind: str) -> str:
    if kind in _RESOURCE:
        return "resource"
    if kind in _INFRA:
        return "infra"
    if kind in _VCS:
        return "vcs"
    if kind in _FLAKY:
        return "flaky"
    if kind.startswith("missing-") or kind in (
        "command-missing",
        "badpkg",
        "unsatisfied-apt-dependencies",
        "unsatisfied-apt-conflicts",
        "apt-broken-packages",
        "apt-package-unknown",
        "debcargo-missing-crate",
    ):
        return "install-dep"
    return "fix-source"


def kind_remediation_rows() -> list[tuple[str, str, bool]]:
    return [
        (kind, remediation_category(kind), kind == "no-space-on-device")
        for kind in sorted(KIND_REGISTRY)
    ]


def kind_remediation_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        kind_remediation_rows(),
        schema="problem_kind string, remediation_category string, is_universal_kind boolean",
    )


def enrich_with_remediation(df: DataFrame) -> DataFrame:
    """Left broadcast join on problem_kind; unclassified rows get NULL."""
    spark = df.sparkSession
    lookup = kind_remediation_df(spark)
    return df.join(F.broadcast(lookup), on="problem_kind", how="left")
