"""BI query layer: every query matches its DuckDB oracle exactly at
sf0.01 (the driver's t2 scale), via the same comparison the driver does
(row count + sorted schema + values), but with exact float equality."""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tools.oracle_check import _norm_rows

import __spark_entry__ as entrymod


def _compare(spark, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_ORACLE)
    sc, sr = _norm_rows(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = duck.execute(oracles[name])
    dc, dr = _norm_rows([d[0] for d in res.description], res.fetchall())
    assert len(sr) > 0, f"{name}: empty result"
    assert sc == dc, f"{name}: schema mismatch {sc} vs {dc}"
    assert sr == dr, f"{name}: values differ"


@pytest.mark.parametrize(
    "name",
    [
        "bi_pricing_rollup",
        "bi_rollup_levels",
        "bi_first_n",
        "bi_percentiles",
        "bi_index_search",
        "bi_topk_customers",
        "bi_time_of_day",
        "bi_point_lookup",
        "bi_enrich_join",
        "bi_dict_enrich",
    ],
)
def test_bi_query_matches_oracle(spark, duck, name):
    _compare(spark, duck, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) == 10


def test_every_query_has_oracle_or_is_flagged(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
