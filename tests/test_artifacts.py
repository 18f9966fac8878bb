"""operators/artifacts.py — persisted per-corpus index cache.

Pins the cache contract the dedup family now rests on (VERDICT r11
item 4): build-on-miss, read-on-hit (builder NOT re-run), fingerprint
invalidation when the source table changes, stale-fingerprint pruning,
and correctness-never-depends-on-the-cache fallback.
"""

from __future__ import annotations

import os

import pytest

from ingestprocessstoreinnrt_spark.operators import artifacts as A


@pytest.fixture()
def corpus(tmp_path, spark):
    """A tiny standalone 'sf dir' with a documents table we can mutate."""
    sf = tmp_path / "sfx"
    sf.mkdir()
    spark.range(10).selectExpr("id AS doc_id", "id * 2 AS v").write.parquet(
        str(sf / "documents.parquet")
    )
    return str(sf)


@pytest.fixture(autouse=True)
def _isolated_art_dir(tmp_path, monkeypatch):
    monkeypatch.setattr(A, "_ART_DIR", str(tmp_path / "art"))


def test_build_on_miss_then_read_on_hit(spark, corpus):
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(
            os.path.join(corpus, "documents.parquet")
        ).selectExpr("doc_id", "v * 10 AS w")

    a = A.corpus_artifact(spark, corpus, "t1", build)
    assert sorted((r.doc_id, r.w) for r in a.collect()) == [
        (i, i * 20) for i in range(10)
    ]
    assert calls == [1]
    b = A.corpus_artifact(spark, corpus, "t1", build)
    assert calls == [1], "hit must not re-run the builder"
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, a.collect()))
    # hit and miss return plan-identical frames (same parquet path), so
    # downstream .cache() dedup works across invocations
    assert a.schema == b.schema


def test_fingerprint_invalidation_on_table_change(spark, corpus):
    calls = []

    def build():
        calls.append(1)
        return spark.read.parquet(
            os.path.join(corpus, "documents.parquet")
        ).selectExpr("max(v) AS mx")

    assert A.corpus_artifact(spark, corpus, "t2", build).collect()[0].mx == 18
    # rewrite the corpus: bigger table, backdated-impossible mtime bump
    spark.range(20).selectExpr("id AS doc_id", "id * 3 AS v").write.mode(
        "overwrite"
    ).parquet(os.path.join(corpus, "documents.parquet"))
    got = A.corpus_artifact(spark, corpus, "t2", build).collect()[0].mx
    assert got == 57, "changed corpus must rebuild, not read stale"
    assert calls == [1, 1]
    # stale fingerprint pruned after the successful publish
    base = os.path.join(A._ART_DIR, "t2", A.corpus_key(corpus))
    live = [e for e in os.listdir(base) if ".tmp-" not in e]
    assert len(live) == 1


def test_prune_never_touches_another_corpus(spark, corpus, tmp_path):
    """The first r12 suite run's failure mode, pinned: two corpora
    sharing an artifact NAME must keep independent caches — a rebuild
    for one must not prune (delete) the other's live artifact."""
    sf2 = tmp_path / "sfy"
    sf2.mkdir()
    spark.range(5).selectExpr("id AS doc_id", "id AS v").write.parquet(
        str(sf2 / "documents.parquet")
    )

    def build_for(sf):
        return lambda: spark.read.parquet(
            os.path.join(sf, "documents.parquet")
        ).selectExpr("count(*) AS n")

    a = A.corpus_artifact(spark, corpus, "shared", build_for(corpus))
    b = A.corpus_artifact(spark, str(sf2), "shared", build_for(str(sf2)))
    # both artifacts remain readable after each other's publish+prune
    assert a.collect()[0].n == 10
    assert b.collect()[0].n == 5
    # and a re-read of the first still hits (files not pruned)
    again = A.corpus_artifact(spark, corpus, "shared", build_for(corpus))
    assert again.collect()[0].n == 10


def test_unwritable_cache_falls_through_to_builder(spark, corpus, monkeypatch):
    """Read-only checkout / full disk: the artifact layer must serve
    the built frame directly — correctness never depends on the
    cache."""
    monkeypatch.setattr(A, "_ART_DIR", "/proc/definitely-not-writable")
    df = A.corpus_artifact(
        spark,
        corpus,
        "t3",
        lambda: spark.read.parquet(
            os.path.join(corpus, "documents.parquet")
        ),
    )
    assert df.count() == 10
