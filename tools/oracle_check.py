"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names/order-insensitive schema, and exact cell values (stricter than a
value-hash: floats must match bit-for-bit, which the decimal-sum contract
in functions.scalars guarantees).

Usage:  python tools/oracle_check.py [--mat] [sf_dir] [query ...]

--mat: for queries that publish a materialized twin formulation
(``__spark_entry__.oracle_sql_mat``), run that statement list (shared
frames as temp tables) instead of the single-statement oracle — the
sf1 sweep path; semantics are pinned equal at sf0.01 by tests.
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def check(
    sf_dir: str, only: list[str] | None = None, use_mat: bool = False
) -> bool:
    import __spark_entry__ as e
    from ingestprocessstoreinnrt_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = _duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    mats = e.oracle_sql_mat() if use_mat else {}
    ok = True
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows={len(srows)} (rows-only check, no oracle)")
            continue
        if name in mats:
            for stmt in mats[name][:-1]:
                con.execute(stmt)
            res = con.execute(mats[name][-1])
        else:
            res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        sc, sr = _norm_rows(scols, srows)
        dc, dr = _norm_rows(dcols, drows)
        status = []
        if len(sr) != len(dr):
            status.append(f"ROWCOUNT spark={len(sr)} duck={len(dr)}")
        if sc != dc:
            status.append(f"SCHEMA spark={sc} duck={dc}")
        if not status and sr != dr:
            bad = sum(1 for a, b in zip(sr, dr) if a != b)
            status.append(f"VALUES {bad}/{len(sr)} rows differ")
            for a, b in zip(sr, dr):
                if a != b:
                    print(f"    spark: {a}\n    duck : {b}")
                    break
        if status:
            ok = False
            print(f"  {name}: FAIL  " + "; ".join(status))
        else:
            print(f"  {name}: OK ({len(sr)} rows)")
    return ok


if __name__ == "__main__":
    args = sys.argv[1:]
    use_mat = "--mat" in args
    args = [a for a in args if a != "--mat"]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = args[1:] or None
    print(f"oracle check @ {sf_dir}{' (mat twins)' if use_mat else ''}")
    sys.exit(0 if check(sf_dir, only, use_mat=use_mat) else 1)
