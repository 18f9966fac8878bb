"""Z-order clustering quality: sorting by the interleaved value must
give chunks (stand-ins for files) narrower min/max spans on BOTH
dimensions than a single-column sort gives its non-sorted dimension —
that span is exactly what file-statistics pruning cuts."""

from __future__ import annotations

from ingestprocessstoreinnrt_spark.operators import layout
from tests.conftest import SF_SMOKE

N_CHUNKS = 16


def _avg_spans(rows):
    rows = list(rows)
    k = max(1, len(rows) // N_CHUNKS)
    sx = sy = n = 0
    for i in range(0, len(rows), k):
        chunk = rows[i : i + k]
        xs = [r.xdim for r in chunk]
        ys = [r.ydim for r in chunk]
        sx += max(xs) - min(xs)
        sy += max(ys) - min(ys)
        n += 1
    return sx / n, sy / n


def test_zorder_clusters_both_dimensions(spark):
    rows = layout.zorder_orders(spark, SF_SMOKE).collect()
    assert len(rows) > N_CHUNKS
    zx, zy = _avg_spans(sorted(rows, key=lambda r: r.zval))
    xx, xy = _avg_spans(sorted(rows, key=lambda r: (r.xdim, r.ydim)))
    # x-sorted files are perfectly narrow on x but wide on y; z-order
    # must beat that y-span AND stay well-clustered on x itself
    assert zy < xy / 2
    full_x = max(r.xdim for r in rows) - min(r.xdim for r in rows)
    full_y = max(r.ydim for r in rows) - min(r.ydim for r in rows)
    assert zx < full_x / 2
    assert zy < full_y / 2


def test_zval_roundtrips_dimensions(spark):
    """De-interleaving even/odd bits recovers both dimensions exactly —
    the z-value loses no information."""
    for r in layout.zorder_orders(spark, SF_SMOKE).limit(200).collect():
        x = y = 0
        for j in range(layout.Z_BITS):
            x |= ((r.zval >> (2 * j)) & 1) << j
            y |= ((r.zval >> (2 * j + 1)) & 1) << j
        assert (x, y) == (r.xdim, r.ydim)


def test_zorder_writer_physical_table_prunes_real_columns(spark, tmp_path):
    """The writer's payoff on the REAL table: zorder_write lays out
    orders (original columns) z-clustered, and per-file footer stats on
    the actual query columns (o_custkey, day) let a planner skip most
    files for a two-dimensional range predicate — while the written
    table still answers the query identically to the source table."""
    import glob

    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_z")
    layout.zorder_write(spark, SF_SMOKE, out, n_files=16)

    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 8

    def stats(f, col):
        md = pq.read_metadata(f)
        i = md.schema.to_arrow_schema().names.index(col)
        lo = hi = None
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(i).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return lo, hi

    src = layout.load_table(spark, SF_SMOKE, "orders")
    cmx = src.agg(F.max("o_custkey")).first()[0]
    days = src.select(
        F.expr(f"unix_micros(o_orderdate) DIV {layout.DAY_US}").alias("d")
    ).agg(F.min("d"), F.max("d")).first()
    # low-corner rectangle, ~15% of each real dimension
    qc = (0, int(cmx * 0.15))
    qd = (days[0], days[0] + max(1, int((days[1] - days[0]) * 0.15)))

    touched = 0
    for f in files:
        c0, c1 = stats(f, "o_custkey")
        d0, d1 = stats(f, "day")
        if c1 >= qc[0] and c0 <= qc[1] and d1 >= qd[0] and d0 <= qd[1]:
            touched += 1
    assert touched <= len(files) // 2  # planner skips most files

    # and the written table answers the rectangle query identically
    got = (
        spark.read.parquet(out)
        .filter(
            (F.col("o_custkey").between(*qc)) & (F.col("day").between(*qd))
        )
        .select("o_orderkey")
    )
    want = src.filter(
        (F.col("o_custkey").between(*qc))
        & (
            F.expr(
                f"unix_micros(o_orderdate) DIV {layout.DAY_US}"
            ).between(*qd)
        )
    ).select("o_orderkey")
    assert sorted(r[0] for r in got.collect()) == sorted(
        r[0] for r in want.collect()
    )


def test_zorder_write_enables_file_pruning(spark, tmp_path):
    """The payoff claim, demonstrated physically: write the table
    z-sorted vs hash-distributed, read per-file min/max statistics
    from the parquet footers (exactly what a scan planner prunes on),
    and count which files a two-dimensional rectangle query must
    touch.  The z-order layout must let the planner skip files; the
    hash layout cannot skip any."""
    import glob

    import pyarrow.parquet as pq

    from ingestprocessstoreinnrt_spark.operators import layout

    z = layout.zorder_orders(spark, SF_SMOKE)
    zdir, hdir = str(tmp_path / "z"), str(tmp_path / "h")
    (
        z.repartitionByRange(8, "zval")
        .sortWithinPartitions("zval")
        .write.parquet(zdir)
    )
    z.repartition(8).write.parquet(hdir)  # hash layout baseline

    def file_ranges(d):
        out = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.read_metadata(f)
            names = md.schema.to_arrow_schema().names
            ix, iy = names.index("xdim"), names.index("ydim")
            lo = {"x": None, "y": None}
            hi = {"x": None, "y": None}
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for k, i in (("x", ix), ("y", iy)):
                    st = rg.column(i).statistics
                    lo[k] = st.min if lo[k] is None else min(lo[k], st.min)
                    hi[k] = st.max if hi[k] is None else max(hi[k], st.max)
            out.append((lo["x"], hi["x"], lo["y"], hi["y"]))
        return out

    # a selective rectangle (low corner, ~15% of each dimension) — the
    # shape of a real "this customer range, this week" query; a
    # centered rectangle would legitimately touch every middle quadrant
    m = layout._MASK
    qx = (0, int(m * 0.15))
    qy = (0, int(m * 0.15))

    def touched(ranges):
        return sum(
            1
            for (x0, x1, y0, y1) in ranges
            if x1 >= qx[0] and x0 <= qx[1] and y1 >= qy[0] and y0 <= qy[1]
        )

    zr, hr = file_ranges(zdir), file_ranges(hdir)
    assert len(zr) >= 4 and len(hr) >= 4
    assert touched(hr) == len(hr)  # hash layout: every file overlaps
    assert touched(zr) < len(zr)  # z layout: the planner skips files
    assert touched(zr) <= len(zr) // 2  # and skips a lot, not just one
