"""One-off scale probe for the dedup suite (VERDICT r1 item 8).

Validates the claimed occupancy-bound scaling of the candidate
generators before anyone trusts it at 100x: replicates the sf0.1
documents corpus k-fold (per-copy salt token appended so copies are
near-dup-rich but not cross-copy exact dups — the adversarial shape for
LSH), then records, per scale:

  * minhash band-join candidates (pre-verify), verified pairs, and the
    max (band, key) bucket size — candidate growth should track the sum
    of squared bucket occupancies, NOT corpus^2;
  * ppjoin prefix candidates + verified pairs — growth follows prefix
    bucket occupancy;
  * wall time per operator.

Writes nothing to /root/testdata; probe corpora land in /tmp.  Results
are pasted into PERFORMANCE.md.

Usage: python tools/scale_probe.py [copies ...]   (default 1 3 10)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = "/tmp/spark_graft_scale_probe"


def build_corpus(spark, copies: int, disjoint: bool) -> str:
    """k-fold corpus, two growth models:

    shared (default): copy c appends a ' probe<c>' salt token — minhash
    signatures stay mostly identical across copies, band buckets MERGE,
    candidate volume grows ~quadratically.  The boilerplate-heavy worst
    case; exercises the mega-bucket guard.

    disjoint: every token is prefixed with the copy tag, so copies are
    disjoint in token space — bucket occupancy stays flat and candidate
    volume should grow ~linearly.  The genuine content-growth model."""
    out = f"{WORK}/docs_x{copies}{'d' if disjoint else ''}"
    if os.path.exists(out):
        return out
    from ingestprocessstoreinnrt_spark.catalog import load_table

    docs = load_table(spark, SRC, "documents")

    def text_of(c):
        if disjoint:
            return F.regexp_replace(
                F.col("text"), r"(\S+)", f"c{c}_$1"
            )
        return F.concat(F.col("text"), F.lit(f" probe{c}"))

    parts = [
        docs.select(
            (F.col("doc_id") + F.lit(c * 10_000_000)).alias("doc_id"),
            text_of(c).alias("text"),
            *[
                F.col(f.name)
                for f in docs.schema.fields
                if f.name not in ("doc_id", "text")
            ],
        )
        for c in range(copies)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.repartition(32).write.mode("overwrite").parquet(out)
    return out


def probe(spark, copies: int, disjoint: bool) -> dict:
    from ingestprocessstoreinnrt_spark.operators import dedup

    path = build_corpus(spark, copies, disjoint)
    docs = spark.read.parquet(path)
    n_docs = docs.count()
    res = {
        "copies": copies,
        "mode": "disjoint" if disjoint else "shared",
        "docs": n_docs,
    }

    # --- minhash: candidates + occupancy ---------------------------------
    d = dedup._token_frame(docs)
    sig = d.withColumn(
        "hashes",
        F.transform(
            F.col("toks"),
            lambda t: dedup.stable_hash64(t) % F.lit(dedup._P),
        ),
    ).withColumn("mh", dedup._minhash_array())
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at(
                                    "mh", i * dedup._R + r + 1
                                ).cast("string")
                                for r in range(dedup._R)
                            ],
                        ).alias("key"),
                    )
                    for i in range(dedup._B)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")

    t0 = time.perf_counter()
    occ = (
        bands.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(
            F.max("m").alias("max_bucket"),
            F.sum(F.col("m") * (F.col("m") - 1) / 2).alias("cand_bound"),
        )
        .collect()[0]
    )
    cand = dedup._salted_self_join_pairs(bands, ["band", "key"]).count()
    res["mh_max_bucket"] = occ["max_bucket"]
    res["mh_cand_bound"] = int(occ["cand_bound"])
    res["mh_candidates"] = cand
    res["mh_cand_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    res["mh_pairs"] = _minhash_on(spark, docs).count()
    res["mh_total_sec"] = round(time.perf_counter() - t0, 2)

    # --- ppjoin ----------------------------------------------------------
    t0 = time.perf_counter()
    res["pp_pairs"] = dedup._ppjoin_pairs(docs).count()
    res["pp_total_sec"] = round(time.perf_counter() - t0, 2)

    spark.catalog.clearCache()
    return res


def _minhash_on(spark, docs):
    """minhash_lsh_pairs over an arbitrary docs frame (the public entry
    loads from an sf_dir; the probe corpus is a plain parquet dir)."""
    from ingestprocessstoreinnrt_spark.operators import dedup

    d = dedup._token_frame(docs)
    sig = d.withColumn(
        "hashes",
        F.transform(
            F.col("toks"),
            lambda t: dedup.stable_hash64(t) % F.lit(dedup._P),
        ),
    ).withColumn("mh", dedup._minhash_array())
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.element_at(
                                    "mh", i * dedup._R + r + 1
                                ).cast("string")
                                for r in range(dedup._R)
                            ],
                        ).alias("key"),
                    )
                    for i in range(dedup._B)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    cand = dedup._salted_self_join_pairs(bands, ["band", "key"])
    sets = d.select("doc_id", "toks", "n")
    inter = F.size(F.array_intersect(F.col("sa.toks"), F.col("sb.toks")))
    jac = inter.cast("double") / (
        F.col("sa.n") + F.col("sb.n") - inter
    ).cast("double")
    return (
        cand.join(sets.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sets.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= dedup.JACCARD_THRESHOLD)
    )


def main() -> None:
    from ingestprocessstoreinnrt_spark.session import get_spark

    args = sys.argv[1:]
    disjoint = "--disjoint" in args
    copies = [int(c) for c in args if c != "--disjoint"] or [1, 3, 10]
    spark = get_spark("scale-probe")
    rows = []
    for c in copies:
        r = probe(spark, c, disjoint)
        rows.append(r)
        print(r, flush=True)
    print("\n| copies | mode | docs | mh max bucket | mh candidates | "
          "mh pairs | mh sec | pp pairs | pp sec |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['copies']} | {r['mode']} | {r['docs']} | "
            f"{r['mh_max_bucket']} | {r['mh_candidates']} | {r['mh_pairs']} | "
            f"{r['mh_total_sec']} | {r['pp_pairs']} | {r['pp_total_sec']} |"
        )
    shutil.rmtree(WORK, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
