"""Driver-contract meta-guards: every registered query must carry an
oracle and build a deterministic schema — catches a future operator
added to QUERIES but not ORACLE (the driver would record a weaker
rows-only check silently)."""

from __future__ import annotations

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE


def test_every_query_has_an_oracle():
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(oracles)
    assert len(qs) >= 59
    for name, sql in oracles.items():
        assert sql.strip(), name


def test_query_plans_build_with_stable_schemas(spark):
    for name, fn in entry.queries().items():
        a = fn(spark, SF_SMOKE).schema
        b = fn(spark, SF_SMOKE).schema
        assert a == b, name
        assert all(f.name == f.name.lower() for f in a.fields), name
