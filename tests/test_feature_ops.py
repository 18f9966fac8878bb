"""Rolling point-in-time features and tf-idf ranking invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ingestprocessstoreinnrt_spark.operators import textops, windows
from tests.conftest import SF_SMOKE


def test_rolling_24h_matches_bruteforce_on_sample(spark):
    """For a handful of users, the windowed trailing-24h count equals a
    brute-force per-event filter count."""
    out = {
        r.event_id: r
        for r in windows.rolling_24h(spark, SF_SMOKE)
        .filter(F.col("user_id") < 5)
        .collect()
    }
    ev = (
        windows.load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id") < 5)
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    assert out and len(ev) == len(out)
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rows in by_user.items():
        for r in rows:
            n = sum(
                1
                for o in rows
                if r.ts_us - windows.ROLL_US < o.ts_us <= r.ts_us
            )
            assert out[r.event_id].n_24h == n


def test_tfidf_ranks_and_positivity(spark):
    rows = textops.text_tfidf_topterms(spark, SF_SMOKE).collect()
    assert rows
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in by_doc.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= textops.TFIDF_TOP
        for a, b in zip(rs, rs[1:]):
            assert (a.tfidf, b.term) >= (b.tfidf, a.term)  # desc, tie asc
        for r in rs:
            assert r.tfidf >= 0.0  # ln(N/df) >= 0 since df <= N


def test_streaming_rolling_features_equal_batch(spark, tmp_path):
    """The applyInPandasWithState rolling-feature stream replayed over
    time-ordered chunks emits EXACTLY the batch RANGE-frame features —
    online serving equals offline training, bit for bit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ingestprocessstoreinnrt_spark.streaming import features

    ev = windows.load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),  # plain longs round-trip
        "value",
    )
    pdf = ev.orderBy("ts_us", "event_id").toPandas()
    d = str(tmp_path / "chunks")
    import os

    os.makedirs(d)
    # time-ordered chunks, cut ONLY between distinct timestamps so a
    # (user_id, ts_us) peer group never straddles a micro-batch — the
    # stream's strictly-increasing-across-batches contract
    k = len(pdf) // 3 + 1
    cuts, at = [0], k
    while at < len(pdf):
        while at < len(pdf) and pdf["ts_us"].iat[at] == pdf["ts_us"].iat[at - 1]:
            at += 1
        if at < len(pdf):
            cuts.append(at)
        at += k
    cuts.append(len(pdf))
    for i, (lo, hi) in enumerate(zip(cuts, cuts[1:])):
        chunk = pdf.iloc[lo:hi]
        if len(chunk):
            pq.write_table(pa.Table.from_pandas(chunk), f"{d}/c{i}.parquet")

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
        .drop("ts_us")
    )
    q = (
        features.rolling_features_stream(src)
        .writeStream.format("memory")
        .queryName("rollfeat")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        r.event_id: (r.user_id, r.n_24h, r.value_24h)
        for r in spark.sql("SELECT * FROM rollfeat").collect()
    }
    batch = {
        r.event_id: (r.user_id, r.n_24h, r.value_24h)
        for r in windows.rolling_24h(spark, SF_SMOKE).collect()
    }
    assert len(streamed) == len(batch) > 0
    assert streamed == batch


def test_funnel_matches_bruteforce(spark):
    """Ordered funnel counts equal a per-user Python replay."""
    from ingestprocessstoreinnrt_spark.operators import funnel

    got = {
        r.stage: r.n_users
        for r in funnel.funnel_counts(spark, SF_SMOKE).collect()
    }
    ev = (
        windows.load_table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r.user_id, []).append((r.ts_us, r.event_type))
    n = [0, 0, 0]
    for rows in by_user.values():
        rows.sort()
        t = None
        for depth, stage in enumerate(funnel.FUNNEL_STAGES):
            nxt = min(
                (ts for ts, et in rows
                 if et == stage and (t is None or ts > t)),
                default=None,
            )
            if nxt is None:
                break
            t = nxt
            n[depth] += 1
    assert got == dict(zip(funnel.FUNNEL_STAGES, n))
    assert n[0] >= n[1] >= n[2] > 0  # funnel narrows, never empties here


def test_watermarked_rolling_features_equal_batch_out_of_order(
    spark, tmp_path
):
    """The watermark-buffered stream replayed over SHUFFLED chunks
    (events deliberately out of event-time order across micro-batches)
    emits features bit-identical to the batch RANGE frame — no
    ordering contract needed.  Two far-future sentinel rows advance
    the watermark past every real event so all keys flush."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ingestprocessstoreinnrt_spark.streaming import features

    ev = windows.load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
    )
    pdf = ev.orderBy("ts_us", "event_id").toPandas()
    # disorder bounded by the watermark: 6 sequential time blocks;
    # each block's trailing 24h of rows is DEFERRED into the next
    # micro-batch (cross-batch event-time regression, < the 48h
    # watermark delay so nothing is droppably late), and every chunk
    # is fully shuffled internally
    import numpy as np

    d = str(tmp_path / "chunks")
    os.makedirs(d)
    t0, t1 = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
    n_blocks, day_us = 6, 86_400_000_000
    block = (t1 - t0) // n_blocks + 1
    chunks = [
        pdf[(pdf["ts_us"] >= t0 + i * block) & (pdf["ts_us"] < t0 + (i + 1) * block)]
        for i in range(n_blocks)
    ]
    rng = np.random.RandomState(7)
    carried = chunks[0].iloc[0:0]
    for i, c in enumerate(chunks):
        hi = int(c["ts_us"].max()) if len(c) else 0
        tail = c[c["ts_us"] > hi - day_us] if i < n_blocks - 1 else c.iloc[0:0]
        keep = c.drop(tail.index)
        out = (
            keep
            if carried.empty
            else __import__("pandas").concat([carried, keep])
        )
        out = out.iloc[rng.permutation(len(out))]  # in-batch shuffle
        if len(out):
            pq.write_table(pa.Table.from_pandas(out), f"{d}/c{i}.parquet")
        carried = tail
    far = t1 + 10**12  # >> watermark delay
    for j, name in enumerate(("zz_flush1", "zz_flush2")):
        sent = pdf.iloc[:1].copy()
        sent["user_id"] = -1
        sent["event_id"] = -(j + 1)
        sent["ts_us"] = far + j
        pq.write_table(pa.Table.from_pandas(sent), f"{d}/{name}.parquet")

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
        .drop("ts_us")
    )
    q = (
        features.rolling_features_stream_watermarked(src, delay="48 hours")
        .writeStream.format("memory")
        .queryName("rollfeat_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        r.event_id: (r.user_id, r.n_24h, r.value_24h)
        for r in spark.sql(
            "SELECT * FROM rollfeat_wm WHERE user_id >= 0"
        ).collect()
    }
    batch = {
        r.event_id: (r.user_id, r.n_24h, r.value_24h)
        for r in windows.rolling_24h(spark, SF_SMOKE).collect()
    }
    assert len(streamed) == len(batch) > 0
    assert streamed == batch
