"""Resample/fill-forward and quantile-binning invariants on smoke
data; exact values are the DuckDB oracle's job."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestprocessstoreinnrt_spark.operators import timeseries
from tests.conftest import SF_SMOKE


def test_resample_grid_dense_and_mass_conserving(spark):
    out = timeseries.resample_ffill(spark, SF_SMOKE).collect()
    ev = (
        timeseries.load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < timeseries.RESAMPLE_USERS)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    expected = {r.user_id: r.n for r in ev.collect()}
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(expected)
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r.hour_us)
        hours = [r.hour_us for r in rows]
        # dense: every hour between first and last, exactly once
        assert hours == list(
            range(hours[0], hours[-1] + 1, timeseries.HOUR_US)
        )
        assert sum(r.n_events for r in rows) == expected[user]
        # end hours anchor on real events; fill never leaves a null
        # after the first observation (h0 is an event hour, so none)
        assert rows[0].n_events > 0 and rows[-1].n_events > 0
        assert all(r.avg_value is not None for r in rows)
        # empty hours carry the previous value forward
        prev = None
        for r in rows:
            if r.n_events == 0:
                assert r.avg_value == prev
            prev = r.avg_value


def test_quantile_bins_partition_orders(spark):
    rows = sorted(
        timeseries.quantile_bins(spark, SF_SMOKE).collect(),
        key=lambda r: r.bin,
    )
    assert [r.bin for r in rows] == list(range(1, timeseries.N_BINS + 1))
    total = (
        timeseries.load_table(spark, SF_SMOKE, "orders").count()
    )
    assert sum(r.n_orders for r in rows) == total
    for r in rows:  # deciles: each bin within a loose balance band
        assert 0.05 * total < r.n_orders < 0.15 * total
    for a, b in zip(rows, rows[1:]):  # value ranges strictly ordered
        assert a.max_price <= b.min_price


def test_interpolate_matches_python_linear(spark):
    """Grid rows with events reproduce the hourly average; interior
    gaps sit exactly on the Python-computed straight line between the
    bracketing observed hours."""
    from ingestprocessstoreinnrt_spark.operators import timeseries as ts
    from tests.conftest import SF_SMOKE

    rows = ts.resample_interpolate(spark, SF_SMOKE).collect()
    ffill = {
        (r.user_id, r.hour_us): r
        for r in ts.resample_ffill(spark, SF_SMOKE).collect()
    }
    assert set((r.user_id, r.hour_us) for r in rows) == set(ffill)

    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r.hour_us)
        obs = [(i, r) for i, r in enumerate(rs) if r.n_events > 0]
        assert obs and obs[0][0] == 0 and obs[-1][0] == len(rs) - 1
        for (i0, a), (i1, b) in zip(obs, obs[1:]):
            for k in range(i0 + 1, i1):
                t = (k - i0) / (i1 - i0)
                want = a.interp_value + (b.interp_value - a.interp_value) * t
                assert abs(rs[k].interp_value - want) < 1e-9, (u, k)
        # observed hours agree with the ffill twin's carried value
        for _, r in obs:
            assert ffill[(u, r.hour_us)].avg_value == r.interp_value


def test_ewma_matches_python_replay(spark):
    """Driver-side exact integer replay of the bounded 2^i weighting
    reproduces every ewma bit-for-bit."""
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import timeseries as T
    from tests.conftest import SF_SMOKE

    ev = sorted(
        load_table(spark, SF_SMOKE, "events")
        .select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us"), "value"
        )
        .collect(),
        key=lambda r: (r.user_id, r.ts_us, r.event_id),
    )
    want = {}
    hist: dict = {}
    for r in ev:
        h = hist.setdefault(r.user_id, [])
        h.append(int(r.value * 10000.0 + 0.5) if r.value >= 0 else None)
        assert h[-1] is not None
        frame = h[-T.EWMA_K:]
        num = sum(x << i for i, x in enumerate(frame))
        den = (1 << len(frame)) - 1
        want[r.event_id] = num / den / 10000.0
    got = T.ewma_smooth(spark, SF_SMOKE).collect()
    assert len(got) == len(ev)
    for r in got:
        assert r.ewma == want[r.event_id], r.event_id


def test_ohlc_open_close_are_positional(spark):
    """open/close equal the value at the earliest/latest (ts, event_id)
    in each bar — replayed in Python over the raw events."""
    from collections import defaultdict

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import timeseries as T
    import pyspark.sql.functions as F
    from tests.conftest import SF_ORACLE

    bars = {
        (r.event_type, r.hour_us): r
        for r in T.ohlc_bars(spark, SF_ORACLE).collect()
    }
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "value",
    ).collect()
    cells = defaultdict(list)
    for r in ev:
        h = r.ts_us // T.HOUR_US * T.HOUR_US
        cells[(r.event_type, h)].append((r.ts_us, r.event_id, r.value))
    assert set(cells) == set(bars)
    for key, rows in cells.items():
        rows.sort()
        b = bars[key]
        assert b.open == rows[0][2] and b.close == rows[-1][2]
        assert b.high == max(v for _, _, v in rows)
        assert b.low == min(v for _, _, v in rows)
        assert b.n_events == len(rows)


def test_cusum_changepoint_matches_bruteforce(spark):
    """Pure-Python offline CUSUM over each user's ordered values must
    agree with the windowed integer formulation (D_i = |n*P_i - i*T| is
    n*|S_i|; argmax with earliest-tie)."""
    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import timeseries as ts
    from tests.conftest import SF_ORACLE

    rows = (
        load_table(spark, SF_ORACLE, "events")
        .selectExpr(
            "user_id", "unix_micros(ts) AS tus", "event_id",
            "CAST(FLOOR(value * 10000.0 + 0.5) AS LONG) AS qv",
        )
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.tus, r.event_id, r.qv))
    expect = {}
    for u, evs in by_user.items():
        evs.sort()
        n = len(evs)
        t = sum(q for _, _, q in evs)
        best = (-1, None, None)  # (dd, -i asc via first-wins, tus)
        p = 0
        for i, (tus, _, q) in enumerate(evs, start=1):
            p += q
            dd = abs(n * p - i * t)
            if dd > best[0]:
                best = (dd, i, tus)
        # HALF_UP like both engines (python round is half-even)
        stat = best[0] / (n * 10000.0)
        import math

        expect[u] = (
            n, best[1], best[2], math.floor(stat * 1e6 + 0.5) / 1e6,
        )
    got = {
        r.user_id: (r.n, r.cp_idx, r.cp_ts_us, r.cusum_stat)
        for r in ts.cusum_changepoint(spark, SF_ORACLE).collect()
    }
    assert got == expect
