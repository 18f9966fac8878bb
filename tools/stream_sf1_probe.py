"""sf1 streaming throughput probe (r4 verdict item 4; compaction-
under-ingest section added per r8 verdict item 4).

Runs the SAME two streaming benches bench.py ships, but at 10x scale:
  * upsert path: 4M generated taxi rows (10x bench's 400k) through the
    exactly-once merge pipeline (ledger + undo on);
  * windowed path: the sf1 events table (10x bench rows, 10x keys —
    state-store + watermark pressure);
  * compaction-under-ingest: 4M rows / 1M keys through 40 apply_batch
    upserts WHILE compact_upsert_table loops in a concurrent thread
    (both serialize on the table commit lock) — records per-batch
    latency percentiles, rows/s, compaction runs, and file counts
    before/after the final quiesced OPTIMIZE.

Usage: python tools/stream_sf1_probe.py [sf1_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ingestprocessstoreinnrt_spark.session import get_spark


def compaction_under_ingest(
    spark,
    total_rows: int = 4_000_000,
    batches: int = 40,
    buckets: int = 16,
    keyspace: int = 1_000_000,
) -> dict:
    """Continuous upsert replay with a live compactor thread.  Every
    key is written 4x across the run (update-heavy entity shape); each
    batch spreads over all buckets (worst-case write amplification for
    the bucket-overwrite design)."""
    from ingestprocessstoreinnrt_spark.streaming import compact
    from ingestprocessstoreinnrt_spark.streaming.upsert import UpsertTable

    tmp = tempfile.mkdtemp(prefix="sf1_compact_")
    try:
        per = total_rows // batches
        table = UpsertTable(spark, tmp + "/t", ["k"], num_buckets=buckets)

        def batch_df(b: int):
            return spark.range(per).selectExpr(
                f"(id * {batches} + {b}) % {keyspace} AS k",
                f"{b} AS batch_id",
                "id AS v",
            )

        table.init(batch_df(0))
        stop = threading.Event()
        comp = {"runs": 0, "errors": 0}

        def compactor() -> None:
            while not stop.is_set():
                try:
                    compact.compact_upsert_table(
                        table, target_bytes=64 * 2**20
                    )
                    comp["runs"] += 1
                except Exception:  # noqa: BLE001 - probe counts, test asserts
                    comp["errors"] += 1
                time.sleep(0.5)

        th = threading.Thread(target=compactor)
        th.start()
        lat: list[float] = []
        t0 = time.perf_counter()
        for b in range(1, batches):
            bt = time.perf_counter()
            table.apply_batch(b, batch_df(b))
            lat.append(time.perf_counter() - bt)
        elapsed = time.perf_counter() - t0
        stop.set()
        th.join()

        files_live = compact.parquet_file_stats(table._data())[0]
        compact.compact_upsert_table(table, target_bytes=64 * 2**20)
        files_final, bytes_final = compact.parquet_file_stats(table._data())
        n_rows = table.read().count()
        lat_s = sorted(lat)

        def pct(p: float) -> float:
            return round(lat_s[min(len(lat_s) - 1, int(p * len(lat_s)))], 3)

        return {
            "compact_ingest_rows_per_sec": round(
                (batches - 1) * per / elapsed, 1
            ),
            "compact_ingest_batches": batches - 1,
            "compact_ingest_batch_p50_s": pct(0.50),
            "compact_ingest_batch_p90_s": pct(0.90),
            "compact_ingest_batch_p99_s": pct(0.99),
            "compact_runs_during_ingest": comp["runs"],
            "compact_errors": comp["errors"],
            "table_rows": n_rows,
            "table_rows_expected": keyspace,
            "files_before_final_optimize": files_live,
            "files_after_final_optimize": files_final,
            "table_mb": round(bytes_final / 2**20, 1),
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bigdata/sf1"
    spark = get_spark("stream-sf1")
    bench.STREAM_ROWS = 4_000_000
    out = {"sf": 1.0, "upsert_rows": bench.STREAM_ROWS}
    out.update(bench.streaming_bench(spark))
    out.update(bench.windowed_stream_bench(spark, sf1))
    out.update(compaction_under_ingest(spark))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
