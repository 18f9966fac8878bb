"""Invariant tests for win_running_totals, ts_seasonal_anomaly, and
quality_schema_drift (conservation laws + brute-force recheck)."""

from __future__ import annotations

from collections import defaultdict

import pyspark.sql.functions as F

from ingestprocessstoreinnrt_spark.catalog import load_table
from ingestprocessstoreinnrt_spark.operators import quality, timeseries, windows
from tests.conftest import SF_SMOKE


def test_running_totals_end_at_group_totals(spark):
    rows = windows.running_totals(spark, SF_SMOKE).collect()
    last = {}
    for r in sorted(rows, key=lambda r: (r.user_id, r.n_so_far)):
        # counts are 1..n dense within each user
        assert r.n_so_far == last.get(r.user_id, (0, 0.0))[0] + 1
        last[r.user_id] = (r.n_so_far, r.value_so_far)
    ev = load_table(spark, SF_SMOKE, "events")
    totals = {
        r.user_id: (r.n, round(r.s / 10000.0, 4))
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 10000.0 + 0.5).cast("long")
            ).alias("s"),
        )
        .collect()
    }
    for uid, (n, s) in totals.items():
        assert last[uid][0] == n
        assert abs(last[uid][1] - s) < 1e-6


def test_seasonal_anomaly_rows_truly_deviate(spark):
    """Each flagged event deviates from its (type, hour) cell mean by
    more than K x the cell's reported MAD; and no unflagged event
    deviates by more than K x MAD + slack (quantization band)."""
    out = timeseries.seasonal_anomaly(spark, SF_SMOKE).collect()
    for r in out:
        assert abs(r.value - r.cell_avg) > timeseries.ANOMALY_K * r.cell_mad
    # brute-force the cell model and count how many SHOULD be flagged
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.hour("ts").alias("hod"), "value"
    ).collect()
    cells = defaultdict(list)
    for r in ev:
        cells[(r.event_type, r.hod)].append(r.value)
    slack = 5e-4  # davg quantization half-step, generous
    lo = hi = 0
    for r in ev:
        vs = cells[(r.event_type, r.hod)]
        m = sum(vs) / len(vs)
        mad = sum(abs(v - m) for v in vs) / len(vs)
        d = abs(r.value - m)
        if d > timeseries.ANOMALY_K * (mad + slack) + slack:
            lo += 1
        if d > timeseries.ANOMALY_K * max(mad - slack, 0.0) - slack:
            hi += 1
    assert lo <= len(out) <= hi


def test_schema_drift_conserves_counts_and_shares(spark):
    rows = quality.schema_drift(spark, SF_SMOKE).collect()
    n_events = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_early + r.n_late for r in rows) == n_events
    assert abs(sum(r.share_early for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.share_late for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert abs((r.share_late - r.share_early) - r.share_drift) < 2e-6
        assert abs((r.avg_late - r.avg_early) - r.avg_drift) < 1e-9


def test_ngram_novelty_first_doc_full_and_conserves(spark):
    from ingestprocessstoreinnrt_spark.operators import textops

    rows = {r.doc_id: r for r in textops.ngram_novelty(spark, SF_SMOKE).collect()}
    assert rows[min(rows)].novelty == 1.0  # first doc introduces all its grams
    # sum of per-doc first-seen grams == corpus distinct gram count
    from ingestprocessstoreinnrt_spark.operators.dedup import _shingle_frame
    from ingestprocessstoreinnrt_spark.catalog import fan_out

    sh = _shingle_frame(fan_out(load_table(spark, SF_SMOKE, "documents")))
    n_distinct = (
        sh.select(F.explode("toks").alias("g")).distinct().count()
    )
    assert sum(r.n_new for r in rows.values()) == n_distinct
    for r in rows.values():
        assert 0.0 <= r.novelty <= 1.0 and r.n_new <= r.n_shingles
