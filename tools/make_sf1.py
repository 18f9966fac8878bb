"""Generate a bench-only sf1 dataset (10x sf0.1) at .bigdata/sf1.

TPC-H-style scaling: fact/dim tables that grow with SF (customer,
supplier, part, orders, lineitem, events, documents, embeddings) are
replicated 10x with per-copy key offsets that PRESERVE join integrity
(o_custkey offsets track c_custkey offsets, etc.); region/nation stay
fixed.  Content columns are perturbed per copy so similarity-based
operators see linear corpus growth instead of a quadratic cross-copy
duplicate blowup:

  * documents.text: every token gets a copy suffix (copy 0 pristine) —
    within-copy token structure (and thus the pair distribution) is
    preserved, cross-copy overlap is zero.
  * embeddings.emb: circular shift by the copy index — norm and value
    distribution preserved, cross-copy cosine decorrelated.

Usage: python tools/make_sf1.py [src_dir] [dst_dir] [copies]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".bigdata", "sf1")
)
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src_docs AS SELECT * FROM '{SRC}/documents.parquet'")

    # key strides: next power-of-10 above max key keeps offsets readable
    def stride(table: str, col: str) -> int:
        mx = con.execute(
            f"SELECT MAX({col}) FROM '{SRC}/{table}.parquet'"
        ).fetchone()[0]
        s = 1
        while s <= mx:
            s *= 10
        return s

    mc = stride("customer", "c_custkey")
    ms = stride("supplier", "s_suppkey")
    mp = stride("part", "p_partkey")
    mo = stride("orders", "o_orderkey")
    md = stride("documents", "doc_id")
    me = stride("events", "event_id")
    mu = stride("events", "user_id")

    def write(table: str, select_per_copy: str) -> None:
        parts = " UNION ALL ".join(
            select_per_copy.format(c=c) for c in range(COPIES)
        )
        con.execute(
            f"COPY ({parts}) TO '{DST}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM '{DST}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    write(
        "customer",
        f"SELECT c_custkey + {{c}} * {mc} AS c_custkey, * EXCLUDE "
        f"(c_custkey) FROM '{SRC}/customer.parquet'",
    )
    write(
        "supplier",
        f"SELECT s_suppkey + {{c}} * {ms} AS s_suppkey, * EXCLUDE "
        f"(s_suppkey) FROM '{SRC}/supplier.parquet'",
    )
    write(
        "part",
        f"SELECT p_partkey + {{c}} * {mp} AS p_partkey, * EXCLUDE "
        f"(p_partkey) FROM '{SRC}/part.parquet'",
    )
    write(
        "orders",
        f"SELECT o_orderkey + {{c}} * {mo} AS o_orderkey, "
        f"o_custkey + {{c}} * {mc} AS o_custkey, * EXCLUDE "
        f"(o_orderkey, o_custkey) FROM '{SRC}/orders.parquet'",
    )
    write(
        "lineitem",
        f"SELECT l_orderkey + {{c}} * {mo} AS l_orderkey, "
        f"l_partkey + {{c}} * {mp} AS l_partkey, "
        f"l_suppkey + {{c}} * {ms} AS l_suppkey, * EXCLUDE "
        f"(l_orderkey, l_partkey, l_suppkey) "
        f"FROM '{SRC}/lineitem.parquet'",
    )
    write(
        "events",
        f"SELECT event_id + {{c}} * {me} AS event_id, "
        f"user_id + {{c}} * {mu} AS user_id, * EXCLUDE "
        f"(event_id, user_id) FROM '{SRC}/events.parquet'",
    )
    write(
        "documents",
        f"SELECT doc_id + {{c}} * {md} AS doc_id, "
        f"CASE WHEN {{c}} = 0 THEN text ELSE "
        f"regexp_replace(text, '(\\S+)', '\\1x{{c}}', 'g') END AS text, "
        f"lang, source, "
        f"CASE WHEN {{c}} = 0 THEN n_chars ELSE length("
        f"regexp_replace(text, '(\\S+)', '\\1x{{c}}', 'g'))::BIGINT END "
        f"AS n_chars FROM '{SRC}/documents.parquet'",
    )
    mv = stride("embeddings", "vec_id")
    write(
        "embeddings",
        f"SELECT vec_id + {{c}} * {mv} AS vec_id, "
        f"CASE WHEN {{c}} = 0 THEN embedding ELSE "
        f"list_concat(embedding[{{c}}+1:], embedding[1:{{c}}])"
        f"::FLOAT[] END AS embedding, label "
        f"FROM '{SRC}/embeddings.parquet'",
    )


if __name__ == "__main__":
    main()
