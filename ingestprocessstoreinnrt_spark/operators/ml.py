"""ML module — the reference's MLlib batch pipeline
(MlLibNyTaxiExamples.scala) on pyspark.ml + exact-statistics queries:

  A7  column statistics   Statistics.colStats (:79-87) -> exact
      sufficient-statistics query (count/mean/min/max/L1/L2/nnz/
      variance), oracle-verified; Summarizer offers the ml-API form
  A8  Pearson correlation Statistics.corr (:75-76) -> exact pairwise
      formula from quantized sums (oracle-verified); pyspark.ml
      Correlation.corr for the MLlib-parity API
  A9  KMeans              KMeans.train (:69-72) -> pyspark.ml KMeans
      (seeded) over the embeddings table
  A10 decision tree       DecisionTree.trainClassifier (:117-118) ->
      DecisionTreeClassifier (gini, depth 5, seeded 70/30 split,
      MlLibNyTaxiExamples.scala:103,108)

Exact statistics are computed from quantized integer sums (see
functions.scalars) so mean/variance/correlation are bit-identical to
the DuckDB oracle at any parallelism — MLlib's own accumulation order
would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load_table
from ..functions.scalars import quantize

FEATURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]

# Product terms need per-pair quantization scales: extendedprice^2 is ~1e10
# per row (1e4 scale would overflow the BIGINT sum over enough rows), while
# discount^2 is ~1e-3 (scale 100 would quantize it to garbage).
def _pscale(a: str, b: str) -> float:
    return 100.0 if a == b == "l_extendedprice" else 10000.0


def _quantp(c, scale: float):
    return F.floor(c * F.lit(scale) + F.lit(0.5)).cast("long")


def _sums(df: DataFrame, cols: list[str]) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in cols:
        aggs += [
            F.sum(quantize(F.col(c))).cast("double").alias(f"s1_{c}"),
            F.sum(_quantp(F.col(c) * F.col(c), _pscale(c, c))).cast("double").alias(f"s2_{c}"),
            F.sum(quantize(F.abs(F.col(c)))).cast("double").alias(f"l1_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.min(c).alias(f"min_{c}"),
            F.sum(F.when(F.col(c) != 0, 1).otherwise(0))
            .cast("long")
            .alias(f"nnz_{c}"),
        ]
    return df.agg(*aggs)


def col_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — one row per feature column with the colStats battery."""
    li = load_table(spark, sf_dir, "lineitem")
    s = _sums(li, FEATURES)
    rows = []
    for c in FEATURES:
        q = F.lit(10000.0)
        s1, s2 = F.col(f"s1_{c}") / q, F.col(f"s2_{c}") / F.lit(_pscale(c, c))
        n = F.col("n").cast("double")
        mean = s1 / n
        rows.append(
            F.struct(
                F.lit(c).alias("feature"),
                F.col("n").alias("count"),
                mean.alias("mean"),
                F.col(f"min_{c}").alias("min"),
                F.col(f"max_{c}").alias("max"),
                (F.col(f"l1_{c}") / q).alias("norm_l1"),
                F.sqrt(s2).alias("norm_l2"),
                F.col(f"nnz_{c}").alias("num_nonzeros"),
                ((s2 - s1 * s1 / n) / (n - 1)).alias("variance"),
            )
        )
    return s.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def _colstats_sql() -> str:
    parts = []
    for c in FEATURES:
        s1 = f"(SUM(CAST(FLOOR({c} * 10000.0 + 0.5) AS BIGINT))::DOUBLE / 10000.0)"
        s2 = f"(SUM(CAST(FLOOR(({c} * {c}) * {_pscale(c, c)} + 0.5) AS BIGINT))::DOUBLE / {_pscale(c, c)})"
        l1 = f"(SUM(CAST(FLOOR(abs({c}) * 10000.0 + 0.5) AS BIGINT))::DOUBLE / 10000.0)"
        parts.append(
            f"""SELECT '{c}' AS feature, COUNT(*) AS count,
  {s1} / COUNT(*)::DOUBLE AS mean,
  MIN({c}) AS min, MAX({c}) AS max,
  {l1} AS norm_l1, sqrt({s2}) AS norm_l2,
  CAST(SUM(CASE WHEN {c} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS num_nonzeros,
  ({s2} - {s1} * {s1} / COUNT(*)::DOUBLE) / (COUNT(*)::DOUBLE - 1) AS variance
FROM lineitem"""
        )
    return "\nUNION ALL\n".join(parts)


def correlation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 — Pearson correlation for every feature pair, from quantized
    sums (exact, order-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in FEATURES:
        aggs.append(F.sum(quantize(F.col(c))).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum(_quantp(F.col(c) * F.col(c), _pscale(c, c)))
            .cast("double")
            .alias(f"ss_{c}")
        )
    for i, a in enumerate(FEATURES):
        for b in FEATURES[i + 1 :]:
            aggs.append(
                F.sum(_quantp(F.col(a) * F.col(b), _pscale(a, b)))
                .cast("double")
                .alias(f"sp_{a}__{b}")
            )
    s = li.agg(*aggs)
    n = F.col("n").cast("double")
    q = F.lit(10000.0)
    out = []
    for i, a in enumerate(FEATURES):
        for b in FEATURES[i + 1 :]:
            sa, sb = F.col(f"s_{a}") / q, F.col(f"s_{b}") / q
            ssa = F.col(f"ss_{a}") / F.lit(_pscale(a, a))
            ssb = F.col(f"ss_{b}") / F.lit(_pscale(b, b))
            sab = F.col(f"sp_{a}__{b}") / F.lit(_pscale(a, b))
            corr = (n * sab - sa * sb) / (
                F.sqrt(n * ssa - sa * sa) * F.sqrt(n * ssb - sb * sb)
            )
            out.append(
                F.struct(
                    F.lit(a).alias("feature_a"),
                    F.lit(b).alias("feature_b"),
                    corr.alias("pearson"),
                )
            )
    return s.select(F.explode(F.array(*out)).alias("r")).select("r.*")


def _corr_sql() -> str:
    def s(c):
        return f"(SUM(CAST(FLOOR({c} * 10000.0 + 0.5) AS BIGINT))::DOUBLE / 10000.0)"

    def sp(a, b):
        return (
            f"(SUM(CAST(FLOOR(({a} * {b}) * {_pscale(a, b)} + 0.5) AS BIGINT))"
            f"::DOUBLE / {_pscale(a, b)})"
        )

    parts = []
    for i, a in enumerate(FEATURES):
        for b in FEATURES[i + 1 :]:
            n = "COUNT(*)::DOUBLE"
            parts.append(
                f"""SELECT '{a}' AS feature_a, '{b}' AS feature_b,
  ({n} * {sp(a, b)} - {s(a)} * {s(b)}) /
  (sqrt({n} * {sp(a, a)} - {s(a)} * {s(a)}) *
   sqrt({n} * {sp(b, b)} - {s(b)} * {s(b)})) AS pearson
FROM lineitem"""
            )
    return "\nUNION ALL\n".join(parts)


# --- pyspark.ml pipelines (seeded; validated by tests, rows-only gate) -----

SEED = 42


def kmeans_clusters(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """A9 — KMeans over the embedding column; returns cluster sizes."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # no fan_out: the corpus is small enough that 20 Lloyd iterations x
    # 32 tasks of scheduling overhead cost more than single-partition
    # compute (measured 2.2s vs 3.7s at sf0.1); at real scale the scan
    # arrives pre-partitioned
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "features", array_to_vector(F.col("embedding").cast("array<double>"))
    )
    model = KMeans(k=k, seed=SEED, maxIter=20).fit(emb)
    return (
        model.transform(emb)
        .groupBy("prediction")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )


def decision_tree_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — DecisionTreeClassifier (gini, depth 5) predicting
    l_returnflag == 'R' from the pricing features; returns the
    label x prediction confusion counts on a seeded 30% test split."""
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.feature import VectorAssembler

    # fan_out: lineitem scans as ~3 partitions at bench SF; each tree
    # level is a full pass, so train on cluster-wide parallelism
    li = fan_out(load_table(spark, sf_dir, "lineitem")).withColumn(
        "label", (F.col("l_returnflag") == "R").cast("double")
    )
    va = VectorAssembler(inputCols=FEATURES, outputCol="features")
    data = va.transform(li).select("label", "features")
    train, test = data.randomSplit([0.7, 0.3], seed=SEED)
    # tree training is iterative (one pass per depth level); caching the
    # training split avoids re-reading + re-assembling parquet each pass
    train = train.cache()
    dt = DecisionTreeClassifier(
        impurity="gini", maxDepth=5, maxBins=32, seed=SEED
    )
    model = dt.fit(train)
    train.unpersist()
    return (
        model.transform(test)
        .groupBy("label", "prediction")
        .agg(F.count(F.lit(1)).alias("n"))
    )


QUERIES = {
    "ml_col_stats": col_stats,
    "ml_correlation": correlation_pairs,
    "ml_kmeans": kmeans_clusters,  # rows-only (iterative algorithm)
    "ml_decision_tree": decision_tree_eval,  # rows-only (split/impurity ties)
}

ORACLE = {
    "ml_col_stats": _colstats_sql(),
    "ml_correlation": _corr_sql(),
}
