"""Aspect-ratio bucketing + per-bucket batch packing.

Multi-resolution image training (SDXL-style) requires every training
batch to hold images of ONE target resolution: images are first
assigned to the nearest aspect-ratio bucket, then packed into
fixed-size batches within their bucket.  Both halves are distributed:

* bucket assignment is a vectorized argmin over the |w/h − bw/bh|
  distance matrix inside ``map_batches`` (IEEE double division and
  comparison only — no transcendental functions — so the assignment is
  bit-reproducible against a SQL oracle);
* packing reuses :func:`parsel_ray.functions.sort.grouped_row_number`:
  a hot bucket (a popular aspect ratio can be 30%+ of a web corpus)
  spreads over (bucket, order-key-range) cells, and only the O(buckets
  × partitions) cell counts visit the driver.

Beyond-reference operator (no scrapy/parsel analogue); the bucket list
shape follows the published SDXL multi-aspect training recipe.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sort import grouped_row_number

# SDXL-flavored bucket ladder (w, h); index in this list = bucket_id,
# which is also the argmin tiebreak (lowest id wins on equal distance)
DEFAULT_BUCKETS = [
    (1024, 1024),
    (1152, 896),
    (896, 1152),
    (1280, 768),
    (768, 1280),
    (1536, 640),
    (640, 1536),
]


def assign_ar_buckets(
    ds,
    w_col: str,
    h_col: str,
    buckets=None,
):
    """Add ``bucket_id`` / ``bucket_w`` / ``bucket_h`` columns: the
    bucket whose w/h ratio is nearest (linear ratio distance, lowest id
    on ties) to each row's aspect ratio."""
    buckets = list(buckets or DEFAULT_BUCKETS)
    bw = np.array([b[0] for b in buckets], dtype=np.float64)
    bh = np.array([b[1] for b in buckets], dtype=np.float64)
    ratios = bw / bh
    bw_i = np.array([b[0] for b in buckets], dtype=np.int64)
    bh_i = np.array([b[1] for b in buckets], dtype=np.int64)

    def assign(t: pa.Table) -> pa.Table:
        w = t[w_col].to_numpy(zero_copy_only=False).astype(np.float64)
        h = t[h_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # (n, B) distance matrix; argmin picks the first (= lowest id)
        # minimum, matching ORDER BY dist, bucket_id in the oracle
        dist = np.abs((w / h)[:, None] - ratios[None, :])
        bid = np.argmin(dist, axis=1)
        return (
            t.append_column("bucket_id", pa.array(bid, pa.int64()))
            .append_column("bucket_w", pa.array(bw_i[bid], pa.int64()))
            .append_column("bucket_h", pa.array(bh_i[bid], pa.int64()))
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def pack_bucket_batches(
    ds,
    order_by,
    ascending,
    batch_size: int,
    bucket_col: str = "bucket_id",
    num_partitions: int = 16,
):
    """Assign every row a ``(batch_idx, slot)`` within its bucket such
    that each training batch holds exactly ``batch_size`` rows of one
    bucket (one ragged tail batch per bucket).  Deterministic given a
    total ``order_by`` within each bucket."""
    ranked = grouped_row_number(
        ds, bucket_col, order_by, ascending,
        out_col="__rn", num_partitions=num_partitions,
    )

    def split(t: pa.Table) -> pa.Table:
        rn = t["__rn"].to_numpy(zero_copy_only=False) - 1  # 0-based
        out = t.drop_columns(["__rn"])
        return (
            out.append_column(
                "batch_idx", pa.array(rn // batch_size, pa.int64())
            )
            .append_column(
                "slot", pa.array(rn % batch_size, pa.int64())
            )
        )

    return ranked.map_batches(split, batch_format="pyarrow")
