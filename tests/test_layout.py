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
