"""Cross-engine dtype parity for every registered query: the driver's
correctness gate compares SCHEMAS, not just values, so a Spark DOUBLE
facing a DuckDB DECIMAL (or a BIGINT facing a HUGEINT from an
unguarded SUM) is a red row even when the numbers agree.  This builds
both sides' schemas lazily (no execution) and asserts the exact type
mapping for all queries — the audit that caught ml_pr_thresholds'
DECIMAL literal, PageRank's HUGEINT sum, and quantile_bins' INT bin."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry
from tests.conftest import SF_SMOKE

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# spark simpleString -> acceptable DuckDB logical type names
_TYPE_MAP = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "double": {"DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "timestamp": {"TIMESTAMP"},
    "timestamp_ntz": {"TIMESTAMP"},
    "date": {"DATE"},
    "binary": {"BLOB"},
}


def test_every_query_schema_matches_oracle_types(spark):
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    problems = []
    for name in qs:
        sdf = qs[name](spark, SF_SMOKE)  # lazy — schema only
        sd = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
        rel = con.sql(oracles[name])  # lazy — relation types only
        dd = list(zip(rel.columns, [str(t) for t in rel.types]))
        if [a for a, _ in sd] != [a for a, _ in dd]:
            problems.append((name, "column names/order", sd, dd))
            continue
        for (n1, t1), (_, t2) in zip(sd, dd):
            if t2 not in _TYPE_MAP.get(t1, set()):
                problems.append((name, f"{n1}: spark={t1} duckdb={t2}", None, None))
    assert not problems, problems
