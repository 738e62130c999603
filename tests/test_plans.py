"""Physical-plan regression gate (SURVEY.md §4): every registered
query's explain() is audited for accidental cartesian/nested-loop
joins, lost parquet predicate pushdown, unpruned scans, missing
map-side partial aggregation, and expected join strategies.

Plans only — nothing executes — so the whole registry audits in one
test at sf0.001. A failure here means a plan regressed (e.g. a filter
stopped reaching the scan), which bench numbers would only show later
and at much higher cost.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.explain_audit import audit_plans  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_all_query_plans_clean(spark):
    failures = audit_plans(spark, SF_DIR, verbose=False)
    assert not failures, f"plan violations: {failures}"


def test_dead_exemption_sweep_is_sf_pinned():
    """The dead-exemption sweep's liveness verdict must come from ONE
    canonical sf_dir regardless of where the full audit ran (r16
    advice: the pytest gate at sf0.001 and the CLI at sf0.01
    disagreed whenever an exempted pattern was SF-dependent). Pin
    the constant and keep it aligned with the CLI default so the
    common roundcheck path reuses its own plans."""
    from tools import explain_audit

    assert explain_audit.SWEEP_SF_DIR == "/root/testdata/sf0.01"
    import inspect

    src = inspect.getsource(explain_audit.main)
    assert '"/root/testdata/sf0.01"' in src  # CLI default == canonical
