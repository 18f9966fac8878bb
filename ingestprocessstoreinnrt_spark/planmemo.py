"""Session-scoped memo of declared-query DataFrame PLANS.

Profiling (r13, guide §1.1): rebuilding a declared query's DataFrame
object costs 0.3-1.7 s of pure py4j round trips at sf0.1 (5,800 socket
round trips for sim_ivfpq_search alone), and across the 240-query
suite repeat construction totals ~44 s per sweep pass — driver-side
work that recomputes NOTHING, it just re-assembles an identical lazy
plan the JVM has already analyzed once.  Handing the second invocation
the same DataFrame object removes that cost.

Scope rules, so this can never shade into result caching:

* Only queries whose repeat construction triggers ZERO Spark jobs are
  memoized (pure plan builders).  Queries that run driver-paced
  computation while building their frame — iterative fits, collects,
  localCheckpoint rounds — are listed in PLAN_IMPURE and always
  rebuild, so their warm reps keep paying (and measuring) the real
  recompute.  tests/test_planmemo.py pins the invariant.
* The memo holds LAZY frames only; every action still executes the
  full plan (a family-cold ``clearCache()`` drops any .cache()d data
  and the next action recomputes from parquet).
* bench.py and tools/isolated_probe.py clear() this memo at each
  family boundary alongside the fit memos, so every family's cold rep
  still pays one full plan construction per session.
"""

from __future__ import annotations

# Queries whose construction RUNS Spark jobs (fits, collects,
# localCheckpoint iterations, artifact reads) — never memoized: their
# construction cost is real computation the warm rep must re-measure.
# Derived by the r13 classifier (setJobGroup around a repeat
# construction; zero job ids => pure) and pinned by
# tests/test_planmemo.py.
PLAN_IMPURE = frozenset(
    {
        # r14: construction opens the persisted basket pair artifact
        # (a parquet read) when basket._PAIR_MEMO is cold — the same
        # treatment as the dedup artifact openers below
        "bi_basket_lift",
        "graph_degree_stats",
        "curation_bpe_train_batched",
        "dedup_best_match",
        "dedup_clusters",
        "dedup_incremental",
        "dedup_jaccard_full",
        "dedup_keep_longest",
        "dedup_keep_longest_lsh",
        "graph_assortativity",
        "graph_clustering_coeff",
        "graph_components",
        "graph_jaccard_neighbors",
        "graph_kcore_peel",
        "graph_pagerank",
        "graph_pref_attachment",
        "graph_resource_allocation",
        "graph_rich_club",
        "graph_triangles",
        "join_bloom_semijoin",
        "ml_decision_tree",
        "ml_kmeans",
        "ml_pca_power",
        "pipeline_dedup_corpus",
    }
)

_PLAN_MEMO: dict = {}


def clear() -> None:
    """Family-cold hook: forget every memoized plan (bench.py /
    isolated_probe.py call this next to the fit-memo clears) so the
    next invocation rebuilds and re-registers its .cache() marks."""
    _PLAN_MEMO.clear()


def _wrap(name: str, fn):
    def wrapped(spark, sf_dir):
        from .operators.ml import _session_token

        app, sess = _session_token(spark)
        # evict on the FULL (app, sess) token (ADVICE r13): a stale
        # sessionUUID of a still-live app (spark.newSession()) would
        # otherwise accumulate dead DataFrame handles for the app's
        # lifetime
        for k in [k for k in _PLAN_MEMO if (k[0], k[1]) != (app, sess)]:
            del _PLAN_MEMO[k]  # dead context's / dead session's frames
        key = (app, sess, name, sf_dir)
        df = _PLAN_MEMO.get(key)
        if df is None:
            df = fn(spark, sf_dir)
            _PLAN_MEMO[key] = df
        return df

    wrapped.__name__ = f"memoized_{name}"
    wrapped.__wrapped__ = fn
    return wrapped


def memoize_pure(qdict: dict) -> dict:
    """Wrap every pure-plan query in the registry dict; PLAN_IMPURE
    entries pass through untouched."""
    return {
        name: (fn if name in PLAN_IMPURE else _wrap(name, fn))
        for name, fn in qdict.items()
    }
