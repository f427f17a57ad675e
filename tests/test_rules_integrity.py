"""Static integrity checks over the rule catalog: every callback's global
references must resolve (a NameError inside a rarely-firing rule callback
would otherwise only surface in production), every regex must compile, and
catalog order/shape must match the reference inventory."""

import builtins

from buildlog_consultant_spark.core.matchers import Rule
from buildlog_consultant_spark.rules import COMMON_MATCHERS, SECONDARY_MATCHERS
from buildlog_consultant_spark.rules.cmake import CMAKE_ERROR_MATCHERS
from buildlog_consultant_spark.rules.custom import (
    CONFIGURE_LINE_MATCHERS,
    VIGNETTE_LINE_MATCHERS,
)
from buildlog_consultant_spark.engine.brz import BRZ_ERRORS


def _check_callable_globals(fn, where):
    import dis

    code = getattr(fn, "__code__", None)
    if code is None:
        return
    g = fn.__globals__
    loads = {
        ins.argval
        for ins in dis.get_instructions(code)
        if ins.opname in ("LOAD_GLOBAL", "LOAD_NAME")
    }
    missing = [n for n in loads if n not in g and not hasattr(builtins, n)]
    assert not missing, f"{where}: unresolved names {missing} in callback"


def _iter_rules(group):
    for m in group.matchers:
        if isinstance(m, Rule) and m.callback is not None:
            yield m


def test_all_primary_callbacks_resolve():
    for r in _iter_rules(COMMON_MATCHERS):
        _check_callable_globals(r.callback, r.pattern[:60])


def test_cmake_and_sub_catalogs_resolve():
    for group in (CMAKE_ERROR_MATCHERS, CONFIGURE_LINE_MATCHERS, VIGNETTE_LINE_MATCHERS):
        for r in _iter_rules(group):
            _check_callable_globals(r.callback, r.pattern[:60])
    for pat, fn in BRZ_ERRORS:
        _check_callable_globals(fn, pat[:60])


def test_catalog_shape():
    """Exact structural parity with the reference (grep counts over
    src/common.rs): 679 line rules + 8 custom matchers in the main catalog,
    67 cmake paragraph rules, 6 configure/vignette sub-group rules, 164
    secondary patterns."""
    n_rules = sum(1 for m in COMMON_MATCHERS.matchers if isinstance(m, Rule))
    n_custom = len(COMMON_MATCHERS.matchers) - n_rules
    assert n_custom == 8, n_custom
    assert n_rules == 679, n_rules
    assert len(SECONDARY_MATCHERS) == 164, len(SECONDARY_MATCHERS)
    assert len(CMAKE_ERROR_MATCHERS.matchers) == 67
    assert len(CONFIGURE_LINE_MATCHERS.matchers) == 2
    assert len(VIGNETTE_LINE_MATCHERS.matchers) == 4
    assert len(BRZ_ERRORS) == 19


def test_no_anchor_sets_stay_empty():
    """The blocked gate fast paths in engine/core.py run rules only on
    gate-positive lines; that is sound only while every rule has an
    extractable anchor. Both paths now guard on the set being empty, but
    this pins the invariant so adding an anchor-less rule fails loudly here
    instead of silently never matching (ADVICE r2, medium)."""
    from buildlog_consultant_spark.rules.secondary import SECONDARY_NO_ANCHOR

    assert COMMON_MATCHERS._no_anchor == [], COMMON_MATCHERS._no_anchor
    assert SECONDARY_NO_ANCHOR == [], SECONDARY_NO_ANCHOR


def test_every_regex_compiles_and_searches():
    # exercise each compiled pattern once (catches pathological syntax that
    # compiles but cannot run)
    probe = "x" * 50
    for m in COMMON_MATCHERS.matchers:
        if isinstance(m, Rule):
            m.regex.search(probe)
    for rx in SECONDARY_MATCHERS:
        rx.search(probe)
