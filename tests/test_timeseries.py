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


def test_lttb_python_replay(spark):
    """Pure-Python replay of the parallel-LTTB selection (bucket
    average anchors, max triangle area, (ts, event_id) tie-break)
    reproduces every selected point at sf0.001."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import timeseries as T
    from tests.conftest import SF_SMOKE

    b = T.LTTB_BUCKET_US
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "event_id", "value"
    ).collect()
    buckets: dict = defaultdict(list)
    for r in ev:
        buckets[(r.event_type, r.ts_us // b)].append(r)
    stats = {
        k: (
            len(v),
            sum(r.ts_us % b for r in v),
            sum(int(r.value * 100.0 + 0.5) for r in v),
        )
        for k, v in buckets.items()
    }
    want = {}
    for (et, bk), pts in buckets.items():
        ordered = sorted(k[1] for k in buckets if k[0] == et)
        i = ordered.index(bk)
        if i == 0 or i == len(ordered) - 1:
            continue
        pb, nb_ = ordered[i - 1], ordered[i + 1]
        pc, ps, pq = stats[(et, pb)]
        nc, ns, nq = stats[(et, nb_)]
        ax, ay = pb + ps / pc / b, pq / pc / 100.0
        cx, cy = nb_ + ns / nc / b, nq / nc / 100.0

        def area(r):
            px = r.ts_us // b + (r.ts_us % b) / b
            py = int(r.value * 100.0 + 0.5) / 100.0
            return abs((ax - cx) * (py - ay) - (ax - px) * (cy - ay)) / 2.0

        best = min(pts, key=lambda r: (-round(area(r), 9), r.ts_us, r.event_id))
        want[(et, bk * b)] = (best.ts_us, best.value)
    got = T.lttb_downsample(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        assert want[(r.event_type, r.bucket_us)] == (r.ts_us, r.value)


def test_peaks_are_strict_local_maxima(spark):
    """Every flagged hour strictly exceeds the mean of all +-PEAK_W
    existing neighbor grid hours, replayed in exact rationals."""
    from collections import defaultdict
    from fractions import Fraction

    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import timeseries as T
    from tests.conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    ).collect()
    cells: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        c = cells[(r.event_type, r.ts_us // T.HOUR_US)]
        c[0] += 1
        c[1] += int(r.value * 100.0 + 0.5)
    want = set()
    by_type: dict = defaultdict(list)
    for (et, h) in cells:
        by_type[et].append(h)
    for et, hours in by_type.items():
        hours.sort()
        for i, h in enumerate(hours):
            if i < T.PEAK_W or i >= len(hours) - T.PEAK_W:
                continue
            me = Fraction(cells[(et, h)][1], cells[(et, h)][0])
            neigh = [hours[i + d] for d in range(-T.PEAK_W, T.PEAK_W + 1) if d]
            if all(
                me > Fraction(cells[(et, n)][1], cells[(et, n)][0])
                for n in neigh
            ):
                want.add((et, h * T.HOUR_US))
    got = {(r.event_type, r.hour_us) for r in T.ts_peaks(spark, SF_SMOKE).collect()}
    assert got == want
