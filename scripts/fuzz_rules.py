"""Fuzz every rule's callback with hypothesis-generated matching lines.

Finds callbacks that reference nonexistent capture groups or crash on inputs
their own regex accepts (this is how three would-panic-the-reference rules
were found). Too slow for the default pytest run — execute directly:

    python3 scripts/fuzz_rules.py
"""

from __future__ import annotations

import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

warnings.filterwarnings("ignore")

from hypothesis import HealthCheck, given, settings
from hypothesis.strategies import from_regex

from buildlog_consultant_spark.core.matchers import Rule
from buildlog_consultant_spark.rules import COMMON_MATCHERS
from buildlog_consultant_spark.rules.cmake import CMAKE_ERROR_MATCHERS
from buildlog_consultant_spark.rules.custom import (
    CONFIGURE_LINE_MATCHERS,
    VIGNETTE_LINE_MATCHERS,
)


def main() -> int:
    bugs: list[tuple] = []
    checked = skipped = 0

    def check(m: Rule) -> None:
        @settings(
            max_examples=3,
            deadline=None,
            suppress_health_check=list(HealthCheck),
            database=None,
        )
        @given(from_regex(m.regex))
        def run(s):
            try:
                m.extract([s], 0)
            except Exception as ex:  # noqa: BLE001
                bugs.append((m.pattern[:70], type(ex).__name__, str(ex)[:70]))

        run()

    for group in (
        COMMON_MATCHERS,
        CMAKE_ERROR_MATCHERS,
        CONFIGURE_LINE_MATCHERS,
        VIGNETTE_LINE_MATCHERS,
    ):
        for m in group.matchers:
            if not isinstance(m, Rule):
                continue
            try:
                check(m)
                checked += 1
            except Exception:
                skipped += 1

    print(f"checked {checked}, generation-unsupported {skipped}")
    seen = set()
    for b in bugs:
        if b[0] not in seen:
            seen.add(b[0])
            print("BUG:", b)
    print("distinct buggy rules:", len(seen))
    return 1 if seen else 0


if __name__ == "__main__":
    sys.exit(main())
