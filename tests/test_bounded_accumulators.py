"""Guard rails for the dsum/davg(bounded=True) BIGINT fast path.

ADVICE r11 (low): bounded=True keeps a BIGINT accumulator that wraps
silently on overflow — the per-group bound proof lived only in call-site
comments, so a future caller with corpus-grain groups would get wrong
sums with no error.  These tests turn the proof obligation into code:

  1. an INVENTORY gate — the set of bounded call sites is pinned, so a
     new caller must consciously register here (and thereby meet the
     bound-proof obligation below) before the fast path compiles in;
  2. a BOUND test per registered site — measures max rows-per-group and
     max quantized |value| on real data at two scale factors, asserts
     wide int64 headroom AND that rows-per-group does not grow with the
     corpus (the structural property the fast path rests on: a group
     whose row count scales with corpus size must keep the decimal
     accumulator).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMOKE

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ingestprocessstoreinnrt_spark",
)

# Registered bounded=True call sites: file -> expected number of
# bounded aggregate expressions.  Adding a site means: prove the
# per-group row count is structurally constant in the corpus (not just
# small today), state the bound in a call-site comment, and extend
# _SITE_BOUNDS below.
REGISTERED_BOUNDED_SITES = {
    "operators/entity.py": 3,   # orders grouped by o_custkey (~10/cust)
    "operators/profile.py": 4,  # events grouped by user_id (~67/user)
}

# int64 capacity for the quantized per-group |sum|
I64 = 2**63 - 1
# demand at least this many orders of magnitude of headroom at test SF:
# rows-per-group is SF-invariant (asserted separately), and quantized
# values grow at most modestly, so 1e6x headroom at sf0.01 cannot erode
# to overflow at any realistic corpus size.
MIN_HEADROOM = 1e6


def _bounded_lines(path):
    out = []
    with open(path) as f:
        for i, line in enumerate(f, 1):
            s = line.strip()
            if "bounded=True" in s and not s.startswith("#"):
                out.append(i)
    return out


def test_bounded_sites_inventory():
    """Every bounded=True call site must be registered here with its
    bound proof — an unregistered site fails this gate loudly instead
    of wrapping silently at scale."""
    found: dict[str, int] = {}
    for root, _dirs, files in os.walk(PKG):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            p = os.path.join(root, fn)
            if os.path.relpath(p, PKG) == "functions/scalars.py":
                continue  # the definition site (docstring mentions)
            n = len(_bounded_lines(p))
            if n:
                found[os.path.relpath(p, PKG)] = n
    assert found == REGISTERED_BOUNDED_SITES, (
        "bounded=True call sites changed — register the new site in "
        "REGISTERED_BOUNDED_SITES only after proving its per-group row "
        "count is corpus-size-invariant (see scalars.dsum docstring): "
        f"{found}"
    )


def _group_profile(spark, sf_dir, table, key, value_col):
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    rows = (
        df.groupBy(key)
        .count()
        .agg(F.max("count").alias("max_rows"))
        .collect()[0]
    )
    vmax = df.agg(
        F.max(
            F.abs(
                F.floor(
                    F.col(value_col).cast("double") * F.lit(10000.0)
                    + F.lit(0.5)
                )
            )
        ).alias("qmax")
    ).collect()[0]
    return int(rows.max_rows), int(vmax.qmax)


def test_entity_bounded_groups_hold_at_scale(spark):
    """orders/o_custkey: rows-per-customer must not grow with the
    corpus, and the worst-case per-group quantized sum must keep
    >= MIN_HEADROOM x headroom under int64."""
    r1, v1 = _group_profile(spark, SF_SMOKE, "orders", "o_custkey",
                            "o_totalprice")
    r2, v2 = _group_profile(spark, SF_ORACLE, "orders", "o_custkey",
                            "o_totalprice")
    # 10x corpus -> per-group rows flat (allow 3x for small-SF noise)
    assert r2 <= max(3 * r1, r1 + 8), (r1, r2)
    assert r2 * v2 * MIN_HEADROOM < I64, (r2, v2)


def test_profile_bounded_groups_hold_at_scale(spark):
    """events/user_id: same structural bound for the car-profile twin."""
    r1, v1 = _group_profile(spark, SF_SMOKE, "events", "user_id", "value")
    r2, v2 = _group_profile(spark, SF_ORACLE, "events", "user_id", "value")
    assert r2 <= max(3 * r1, r1 + 8), (r1, r2)
    assert r2 * v2 * MIN_HEADROOM < I64, (r2, v2)
