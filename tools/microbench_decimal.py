"""Micro-bench: long vs decimal(38,0) quantized-sum accumulators
(VERDICT r10 item 4).

The r10 overflow fix widened dsum/davg's integer accumulator from
BIGINT to decimal(38,0) — correct at any corpus size (a quantized
extendedprice is ~1e9/row, so an int64 sum dies around 1e10 rows,
inside the 100 TB target) but decimal aggregation leaves the primitive
whole-stage-codegen fast path.  This measures that cost on the
hottest shape it touches: a Q1-style grouped rollup over sf0.1
lineitem (summing quantized l_extendedprice/l_quantity/l_discount per
(l_returnflag, l_linestatus)), plus an ungrouped total.

Protocol: REPS alternating runs per variant (interleaved, so box
drift hits both equally), noop-write sink, median reported.  Run on a
quiet box; the load stamp prints with the result.  Conclusion lives
in PERFORMANCE.md §decimal-accumulators.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPS = 7


def main() -> None:
    from pyspark.sql import functions as F

    from ingestprocessstoreinnrt_spark.catalog import load_table
    from ingestprocessstoreinnrt_spark.functions.scalars import quantize
    from ingestprocessstoreinnrt_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("microbench_decimal")
    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()  # warm footers + page cache before timing

    def accs(cast_to: str | None):
        def q(c):
            qc = quantize(F.col(c))
            return qc.cast(cast_to) if cast_to else qc

        return [
            F.sum(q("l_extendedprice")).alias("s_price"),
            F.sum(q("l_quantity")).alias("s_qty"),
            F.sum(q("l_discount")).alias("s_disc"),
            F.avg(q("l_extendedprice")).alias("a_price"),
            F.count(F.lit(1)).alias("cnt"),
        ]

    variants = {
        "long": None,  # quantize() already yields BIGINT
        "decimal38": "decimal(38,0)",
    }

    def run(cast_to) -> float:
        t0 = time.perf_counter()
        li.groupBy("l_returnflag", "l_linestatus").agg(
            *accs(cast_to)
        ).write.format("noop").mode("overwrite").save()
        li.agg(*accs(cast_to)).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    for name in variants:  # one untimed warm-up each (codegen compile)
        run(variants[name])
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _ in range(REPS):  # interleaved: drift hits both variants
        for name, cast_to in variants.items():
            times[name].append(run(cast_to))

    med = {k: statistics.median(v) for k, v in times.items()}
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "rows": n,
                "reps": REPS,
                "median_sec": {k: round(v, 4) for k, v in med.items()},
                "all_sec": {
                    k: [round(x, 4) for x in v] for k, v in times.items()
                },
                "decimal_over_long": round(
                    med["decimal38"] / med["long"], 3
                ),
                "load_1m": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
