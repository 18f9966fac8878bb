"""Persisted per-corpus operator artifacts (pair frames, signature
indexes) — the dedup-family twin of ml.py's centroid disk cache.

A verified near-dup pair frame or a banded-signature index is a FITTED
INDEX: a pure function of the corpus contents that a production dedup
service builds once and maintains next to the data (exactly what
`dedup_incremental` models — its docstring describes the persisted
band/token tables an ingest job appends to).  Rebuilding such an index
from raw text on every session start is the 100 TB anti-pattern: the
r11 sf10 sweep spent 1502 s of dedup-family cold time (half the whole
sweep's cold budget) re-tokenizing, re-signing, and re-joining a corpus
that had not changed since the previous sweep (VERDICT r11 item 4).

So: `corpus_artifact` persists a built DataFrame as parquet under
`<repo>/.cache/artifacts/<name>/<fingerprint>`, where the fingerprint
hashes the source table's file names + sizes + mtimes (the ml.py
centroid-cache convention).  Every read re-validates the fingerprint —
a changed corpus gets a fresh build — and a corrupt or missing artifact
falls through to the builder, so correctness never depends on the
cache.  Writes are atomic (write to a pid-suffixed tmp dir, rename into
place), so concurrent sessions race safely; the loser's tmp dir is
removed and the winner's artifact is read.  Stale fingerprints of the
same artifact name are pruned after a successful write.

Determinism contract: a builder wired through this module MUST be a
deterministic pure function of the source table (all dedup pair
builders are — integer minhash/PPJoin math, exact verification), so
reading the artifact is bit-identical to rebuilding, and the DuckDB
oracle twins stay green with or without a cache hit.
"""

from __future__ import annotations

import hashlib
import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# per-process hit/miss counters, recorded into bench records so every
# committed number is self-identifying about whether it measured the
# steady-state (artifact read) or first-build path
STATS = {"hit": 0, "miss": 0}

_ART_DIR = os.path.join(
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
    ".cache",
    "artifacts",
)


def corpus_key(sf_dir: str, table: str = "documents") -> str:
    """Identity of the SOURCE (path, not contents): artifacts of
    different corpora (sf0.001 vs sf0.01 vs sf10) live side by side
    under distinct keys, so pruning one corpus's stale fingerprints
    can never delete another's live artifact (the failure the first
    r12 test-suite run caught: a later sf0.001 build pruned the
    sf0.01 pair artifact out from under the suite's cached frames)."""
    raw = f"{os.path.abspath(sf_dir)}|{table}"
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def table_fingerprint(sf_dir: str, table: str = "documents") -> str:
    """md5 over the source table's file names/sizes/mtimes — the same
    validation key ml.py's centroid cache uses: any rewrite of the
    table produces a different fingerprint and therefore a rebuild,
    never a stale read."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    parts = []
    if os.path.isdir(p):
        for name in sorted(os.listdir(p)):
            st = os.stat(os.path.join(p, name))
            parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    elif os.path.exists(p):
        st = os.stat(p)
        parts.append(f"{st.st_size}:{int(st.st_mtime)}")
    raw = "|".join(parts)
    return hashlib.md5(raw.encode()).hexdigest()


def _done_marker(path: str) -> str:
    return os.path.join(path, "_SUCCESS")


def corpus_artifact(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    table: str = "documents",
) -> DataFrame:
    """Return `name` for this corpus, building + persisting on miss.

    Cache hit: one parquet read of the artifact (steady-state cost — a
    production index is read, not refit, by every consumer session).
    Cache miss: run `build()`, persist its FULL result, atomically
    publish, prune stale fingerprints, and return a read of the
    published copy — so hit and miss return plan-identical frames and
    downstream .cache() dedup works across invocations either way."""
    fp = table_fingerprint(sf_dir, table)
    base = os.path.join(_ART_DIR, name, corpus_key(sf_dir, table))
    final = os.path.join(base, fp)
    if os.path.exists(_done_marker(final)):
        STATS["hit"] += 1
        return spark.read.parquet(final)
    STATS["miss"] += 1
    tmp = f"{final}.tmp-{os.getpid()}"
    try:
        build().write.mode("overwrite").parquet(tmp)
    except Exception:
        # a write failure is either an unwritable cache dir (read-only
        # checkout, full disk — Spark surfaces it as a JVM IOException,
        # not OSError) or a broken builder.  Correctness never depends
        # on the cache: serve the built frame directly; a genuinely
        # broken builder re-raises out of this second call.
        shutil.rmtree(tmp, ignore_errors=True)
        if os.path.exists(_done_marker(final)):
            return spark.read.parquet(final)  # concurrent winner
        return build()
    try:
        os.rename(tmp, final)
    except OSError:
        # lost a concurrent-publish race: keep the winner's copy
        shutil.rmtree(tmp, ignore_errors=True)
    # prune artifacts of dead corpora (fingerprint changed): they can
    # never be read again and only cost disk.  Never touch tmp dirs —
    # another session may be mid-publish on a fresher fingerprint.
    try:
        for entry in os.listdir(base):
            if entry != fp and ".tmp-" not in entry:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
    except OSError:
        pass
    return spark.read.parquet(final)
