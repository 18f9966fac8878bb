"""BFS landmark distances + multivariate OLS: independent recomputation."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from ingestprocessstoreinnrt_spark.catalog import load_table
from ingestprocessstoreinnrt_spark.operators import graph, ml
from tests.conftest import SF_SMOKE


def test_bfs_landmarks_matches_python_bfs(spark):
    edges = graph._edges(spark, SF_SMOKE).collect()
    adj = {}
    for r in edges:
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)
    lms = sorted(
        {r.node for r in
         load_table(spark, SF_SMOKE, "supplier")
         .select((F.col("s_suppkey") * 2).alias("node")).collect()}
    )[: graph.BFS_LANDMARKS]
    expected = {}
    for lm in lms:
        dist = {lm: 0}
        frontier = [lm]
        for d in range(1, graph.BFS_HOPS + 1):
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = d
                        nxt.append(v)
            frontier = nxt
        for node, d in dist.items():
            expected[(node, lm)] = d
    got = {
        (r.node, r.landmark): r.dist
        for r in graph.bfs_landmarks(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_ols_multi_matches_numpy_lstsq(spark):
    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_quantity", "l_discount", "l_extendedprice"
    ).collect()
    got = {r.l_returnflag: r for r in ml.group_ols_multi(spark, SF_SMOKE).collect()}
    flags = sorted({r.l_returnflag for r in rows})
    for flag in flags:
        sub = [r for r in rows if r.l_returnflag == flag]
        X = np.array([[1.0, r.l_quantity, r.l_discount] for r in sub])
        y = np.array([r.l_extendedprice for r in sub])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        g = got[flag]
        assert g.n == len(sub)
        # quantization perturbs inputs at the 1e-2 level; coefficients
        # agree to ~1e-3 relative
        assert abs(g.intercept - beta[0]) < max(1.0, abs(beta[0]) * 1e-2)
        assert abs(g.coef_qty - beta[1]) < max(0.5, abs(beta[1]) * 1e-2)
        assert abs(g.coef_disc - beta[2]) < max(50.0, abs(beta[2]) * 1e-2)


def test_bloom_semijoin_no_false_negatives(spark):
    """The Bloom guarantee: every true member passes (zero false
    negatives); n_true equals the exact semi-join count; false
    positives are non-negative and small at this m/k."""
    from ingestprocessstoreinnrt_spark.operators import bloom

    rows = bloom.bloom_semijoin_audit(spark, SF_SMOKE).collect()
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    urgent = orders.filter(
        F.col("o_orderpriority") == bloom.BLOOM_PRIORITY
    ).select("o_orderkey")
    truth = (
        li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
        .select("l_orderkey", "l_returnflag")
        .distinct()
        .groupBy("l_returnflag")
        .count()
        .collect()
    )
    want = {r.l_returnflag: r["count"] for r in truth}
    for r in rows:
        assert r.n_true == want[r.l_returnflag]  # no false negatives
        assert r.n_false_pos >= 0
        assert r.n_bloom_pass == r.n_true + r.n_false_pos


def test_dedup_corpus_conserves_and_survivors_clean(spark):
    from ingestprocessstoreinnrt_spark.operators import dedup

    rows = dedup.dedup_survivors(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert r.n_survivors + r.n_dropped == r.n_docs
    # greedy policy: exactly the distinct doc_b values get dropped
    pairs = dedup.jaccard_pairs_full(spark, SF_SMOKE).collect()
    dropped = {p.doc_b for p in pairs}
    assert sum(r.n_dropped for r in rows) == len(dropped)


def test_kmv_merge_identical_and_close(spark):
    from ingestprocessstoreinnrt_spark.operators import sketch

    r = sketch.kmv_union_merge(spark, SF_SMOKE).collect()[0]
    assert r.sketches_identical
    assert r.k_merged == r.k_direct and r.kth_merged == r.kth_direct
    # k=256 sketch: ~1/sqrt(k) ~ 6% relative error band (generous 25%)
    assert abs(r.approx_merged - r.exact_distinct) <= max(
        0.25 * r.exact_distinct, 5
    )


def test_pr_thresholds_laws(spark):
    from ingestprocessstoreinnrt_spark.operators import ml

    rows = ml.pr_at_thresholds(spark, SF_SMOKE).collect()
    n_pos = {r.tp + r.fn for r in rows}
    assert len(n_pos) == 1  # tp+fn is the positive count at every threshold
    recalls = [r.recall for r in rows]
    assert recalls == sorted(recalls, reverse=True)  # recall monotone down
    ev = load_table(spark, SF_SMOKE, "events")
    assert n_pos.pop() == ev.filter(F.col("event_type") == ml.AUC_POS_TYPE).count()


def test_multimodal_rollup_conserves(spark):
    from ingestprocessstoreinnrt_spark.operators import multimodal

    rows = multimodal.multimodal_format_rollup(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_assets for r in rows) == n_docs
    for r in rows:
        assert r.n_distinct_payloads <= r.n_assets
        assert abs(r.avg_bytes * r.n_assets - r.total_bytes) < 1e-6 * r.total_bytes


def test_langid_confusion_and_gate_funnel_consistency(spark):
    from ingestprocessstoreinnrt_spark.operators import textops

    conf = textops.langid_confusion(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r.n_docs for r in conf) == n_docs
    f = textops.curation_gate_funnel(spark, SF_SMOKE).collect()[0]
    assert f.n_total >= f.n_len_ok >= f.n_lang_ok >= f.n_after_dedup > 0
    # the funnel's final stage equals the curated-corpus row count
    assert f.n_after_dedup == textops.curated_corpus(spark, SF_SMOKE).count()


def test_rfm_segments_partition_customers(spark):
    from ingestprocessstoreinnrt_spark.operators import bi

    rows = bi.rfm_segments(spark, SF_SMOKE).collect()
    n_cust = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows) == n_cust
    for r in rows:
        assert 1 <= r.r_score <= 3 and 1 <= r.f_score <= 3
        assert 1 <= r.m_score <= 3
    # terciles: each single-dimension marginal is roughly a third
    from collections import Counter
    m = Counter()
    for r in rows:
        m[r.m_score] += r.n_customers
    for k in (1, 2, 3):
        assert 0.2 * n_cust <= m[k] <= 0.5 * n_cust


def test_ols_multi_singular_matrix_yields_nulls(spark, tmp_path):
    """Collinear features (constant discount == intercept column) make
    the normal equations singular; every coefficient must come back
    NULL, not a division blow-up."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "l_returnflag": ["A"] * 4,
            "l_quantity": [1.0, 2.0, 3.0, 4.0],
            "l_discount": [0.05] * 4,  # constant -> collinear
            "l_extendedprice": [10.0, 20.0, 30.0, 40.0],
        }
    )
    spark.createDataFrame(rows).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = ml.group_ols_multi(spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].n == 4
    assert out[0].coef_qty is None
    assert out[0].coef_disc is None
    assert out[0].intercept is None


def test_decile_lift_laws(spark):
    rows = ml.decile_lift(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    n = ev.count()
    n_pos = ev.filter(F.col("event_type") == ml.AUC_POS_TYPE).count()
    assert sum(r.n for r in rows) == n
    assert sum(r.n_pos for r in rows) == n_pos
    # lift averages to ~1 weighted by bin size
    avg_lift = sum(r.lift * r.n for r in rows) / n
    assert abs(avg_lift - 1.0) < 0.01


def test_kcore_peel_matches_python(spark):
    from collections import defaultdict

    edges = graph._edges(spark, SF_SMOKE).collect()
    adj = defaultdict(set)
    for r in edges:
        adj[r.src].add(r.dst)
        adj[r.dst].add(r.src)
    kept = set(adj)
    for _ in range(graph.KCORE_ROUNDS):
        deg = {u: sum(1 for v in adj[u] if v in kept) for u in kept}
        kept = {u for u in kept if deg[u] >= graph.KCORE_K}
    expected = {
        u: sum(1 for v in adj[u] if v in kept) for u in kept
    }
    got = {
        r.node: r.core_degree
        for r in graph.kcore_peel(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_hourly_autocorr_matches_numpy(spark):
    from ingestprocessstoreinnrt_spark.operators import timeseries as ts

    got = {r.event_type: r for r in ts.hourly_autocorr(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.expr("unix_micros(ts) DIV 3600000000").alias("h")
    ).collect()
    from collections import Counter, defaultdict

    counts = defaultdict(Counter)
    for r in ev:
        counts[r.event_type][r.h] += 1
    for et, cs in counts.items():
        xs, ys = [], []
        for h, c in cs.items():
            if (h - ts.AC_LAG) in cs:
                xs.append(float(c))
                ys.append(float(cs[h - ts.AC_LAG]))
        if len(xs) >= 2:
            r_np = float(np.corrcoef(xs, ys)[0, 1])
            assert got[et].n_pairs == len(xs)
            assert abs(got[et].autocorr - r_np) < 1e-4


def test_attribution_window_gates_correctly(spark):
    from ingestprocessstoreinnrt_spark.operators import asof

    base = {r.event_id: r for r in asof.asof_enrich(spark, SF_SMOKE).collect()}
    out = asof.attribution_windowed(spark, SF_SMOKE).collect()
    assert len(out) == len(base)
    n_attr = 0
    for r in out:
        b = base[r.event_id]
        within = (
            b.last_click_ts_us is not None
            and b.purchase_ts_us - b.last_click_ts_us <= asof.ATTRIB_WINDOW_US
        )
        assert r.attributed == within
        if within:
            n_attr += 1
            assert r.attributed_click_ts_us == b.last_click_ts_us
        else:
            assert r.attributed_click_ts_us is None
    assert 0 < n_attr < len(out)  # the window is actually selective


def test_token_budget_fill_laws(spark):
    from ingestprocessstoreinnrt_spark.operators import textops

    r = textops.token_budget_fill(spark, SF_SMOKE).collect()[0]
    assert r.n_tokens_taken <= r.token_budget
    assert 0 < r.n_docs_taken
    # brute-force: bucket docs, fill from best bucket down
    stats = textops.text_stats(spark, SF_SMOKE).collect()
    from collections import defaultdict

    buckets = defaultdict(lambda: [0, 0])
    for s in stats:
        b = round(s.stopword_ratio, 2)
        buckets[b][0] += 1
        buckets[b][1] += s.n_tokens
    cum_d = cum_t = 0
    best = (0, 0, None)
    for b in sorted(buckets, reverse=True):
        nd, nt = buckets[b]
        if cum_t + nt > textops.TOKEN_BUDGET:
            break
        cum_d += nd
        cum_t += nt
        best = (cum_d, cum_t, b)
    assert (r.n_docs_taken, r.n_tokens_taken, r.quality_cutoff) == best


def test_chi2_matches_scipy_free_formula(spark):
    from collections import Counter

    r = ml.chi2_independence(spark, SF_SMOKE).collect()[0]
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", F.dayofweek("ts").alias("dow")
    ).collect()
    cells = Counter((e.event_type, e.dow) for e in ev)
    rt = Counter()
    ct = Counter()
    for (et, d), c in cells.items():
        rt[et] += c
        ct[d] += c
    n = sum(cells.values())
    chi2 = sum(
        (c - rt[et] * ct[d] / n) ** 2 / (rt[et] * ct[d] / n)
        for (et, d), c in cells.items()
    )
    assert abs(r.chi2 - chi2) < 1e-6
    assert r.dof == (len(rt) - 1) * (len(ct) - 1)


def test_vocab_growth_monotone_and_final_totals(spark):
    from ingestprocessstoreinnrt_spark.operators import textops

    rows = textops.vocab_growth(spark, SF_SMOKE).collect()
    vs = [r.vocab_size for r in rows]
    ts_ = [r.cum_tokens for r in rows]
    assert vs == sorted(vs) and ts_ == sorted(ts_)  # monotone curves
    docs = load_table(spark, SF_SMOKE, "documents")
    total_vocab = (
        docs.select(
            F.explode(
                F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
            ).alias("t")
        )
        .filter(F.col("t") != "")
        .distinct()
        .count()
    )
    assert rows[-1].vocab_size == total_vocab
    assert rows[-1].cum_docs == docs.count()


def test_welch_ttest_matches_numpy(spark):
    got = {r.event_type: r for r in ml.welch_ttest(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "value"
    ).collect()
    from collections import defaultdict

    groups = defaultdict(list)
    for r in ev:
        groups[r.event_type].append(r.value)
    ctrl = np.array(groups[ml.TT_CONTROL])
    for et, vals in groups.items():
        if et == ml.TT_CONTROL:
            continue
        x = np.array(vals)
        t = (x.mean() - ctrl.mean()) / np.sqrt(
            x.var(ddof=1) / len(x) + ctrl.var(ddof=1) / len(ctrl)
        )
        # 1e-4 quantization perturbs the statistic slightly
        assert abs(got[et].t_stat - t) < 5e-3
        assert got[et].n == len(x)


def test_logistic_score_matches_unquantized_irls(spark):
    """Independent replay: unquantized numpy IRLS over the same
    features must land within the quantization budget of the engine's
    betas (proves the quantized loop IS Newton-Raphson on the logistic
    likelihood, not just two engines sharing a quirk), and the
    confusion counts must be internally consistent."""
    import numpy as np

    from ingestprocessstoreinnrt_spark.operators import ml
    from tests.conftest import SF_ORACLE

    feats = ml._logi_feats(spark, SF_ORACLE).collect()
    X = np.array([[1.0, r.x1, r.x2] for r in feats])
    y = np.array([float(r.y) for r in feats])
    beta = np.zeros(3)
    for _ in range(ml.LOGISTIC_ROUNDS):
        p = 1.0 / (1.0 + np.exp(-(X @ beta)))
        w = p * (1.0 - p)
        beta = beta + np.linalg.solve(
            X.T @ (X * w[:, None]), X.T @ (y - p)
        )
    row = ml.logistic_score(spark, SF_ORACLE).collect()[0]
    got = np.array([row.b0, row.b1, row.b2])
    assert np.all(np.abs(got - beta) < 1e-3), (got, beta)
    assert row.tp + row.fp + row.fn + row.tn == row.n_docs
    assert row.tp + row.fn == row.n_pos
    assert abs(row.accuracy - (row.tp + row.tn) / row.n_docs) < 1e-6


def test_km_survival_matches_python_replay(spark):
    """Pure-Python Kaplan-Meier over the same (lifetime, event) pairs
    must reproduce every curve point to 6 dp."""
    import math

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import ml
    from tests.conftest import SF_ORACLE

    rows = (
        load_table(spark, SF_ORACLE, "events")
        .selectExpr("user_id", "unix_micros(ts) AS tus")
        .collect()
    )
    mx = max(r.tus for r in rows)
    per: dict = {}
    for r in rows:
        t0, t1 = per.get(r.user_id, (r.tus, r.tus))
        per[r.user_id] = (min(t0, r.tus), max(t1, r.tus))
    day = ml._DAY_US
    pairs = [
        (
            (t1 - t0) // day,
            1 if t1 < mx - ml.KM_CENSOR_DAYS * day else 0,
        )
        for t0, t1 in per.values()
    ]
    grid: dict = {}
    for t, e in pairs:
        d, c = grid.get(t, (0, 0))
        grid[t] = (d + e, c + (1 - e))
    expect = []
    remaining = len(pairs)
    s = 1.0
    cum_q = 0
    dead = False
    for t in sorted(grid):
        d, c = grid[t]
        n = remaining
        if d == n:
            dead = True
        elif d > 0 or True:
            cum_q += math.floor(math.log((n - d) / n) * 1e9 + 0.5)
        surv = 0.0 if dead else math.floor(
            math.exp(cum_q / 1e9) * 1e6 + 0.5
        ) / 1e6
        expect.append((t, n, d, c, surv))
        remaining -= d + c
    got = [
        (r.t_days, r.n_at_risk, r.n_events, r.n_censored, r.survival)
        for r in ml.km_survival(spark, SF_ORACLE).collect()
    ]
    assert got == expect


def test_spearman_python_replay(spark):
    """Average-rank Spearman replayed in exact Fractions at sf0.001 —
    the decimal sufficient-statistic path must agree to 6 dp."""
    from collections import Counter, defaultdict
    from fractions import Fraction

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.operators import ml as M
    from tests.conftest import SF_SMOKE

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    groups: dict = defaultdict(list)
    for r in rows:
        groups[r.l_returnflag].append(
            (int(r.l_quantity + 0.5), int(r.l_extendedprice * 100.0 + 0.5))
        )

    def avg_ranks(vals):
        cnt = Counter(vals)
        start, first = {}, 1
        for v in sorted(cnt):
            start[v] = first
            first += cnt[v]
        return [Fraction(2 * start[v] + cnt[v] - 1, 2) for v in vals]

    want = {}
    for g, pts in groups.items():
        rx = avg_ranks([p[0] for p in pts])
        ry = avg_ranks([p[1] for p in pts])
        n = len(pts)
        sx, sy = sum(rx), sum(ry)
        sxx = sum(v * v for v in rx)
        syy = sum(v * v for v in ry)
        sxy = sum(a * b for a, b in zip(rx, ry))
        num = n * sxy - sx * sy
        import math

        den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
            float(n * syy - sy * sy)
        )
        want[g] = float(num) / den
    got = M.spearman_corr(spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        assert abs(r.spearman - want[r.l_returnflag]) < 1e-6, r
