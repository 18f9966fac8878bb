"""sf1 streaming throughput probe (r4 verdict item 4).

Runs the SAME two streaming benches bench.py ships, but at 10x scale:
  * upsert path: 4M generated taxi rows (10x bench's 400k) through the
    exactly-once merge pipeline (ledger + undo on);
  * windowed path: the sf1 events table (10x bench rows, 10x keys —
    state-store + watermark pressure).

Usage: python tools/stream_sf1_probe.py [sf1_dir]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from ingestprocessstoreinnrt_spark.session import get_spark


def main() -> None:
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.bigdata/sf1"
    spark = get_spark("stream-sf1")
    bench.STREAM_ROWS = 4_000_000
    out = {"sf": 1.0, "upsert_rows": bench.STREAM_ROWS}
    out.update(bench.streaming_bench(spark))
    out.update(bench.windowed_stream_bench(spark, sf1))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
