"""Z-order (Morton) clustered parquet layout + 2D range-pruned reads.

One sort can only cluster one column; interleaving the bits of TWO
columns into a Morton key and sorting by that clusters BOTH, so a
min/max sidecar per shard prunes on either (or both) predicates — the
standard lakehouse multi-dimensional clustering trick (public Z-order /
Delta OPTIMIZE ZORDER literature), built here on the repo's own shard
conventions (content+task digest names, atomic replace, worker-side
writes).

The reader prunes with per-shard min/max of the ORIGINAL columns (not
the z key): correctness never depends on the curve, only locality does,
so a bad bit budget degrades to more shards read — never to wrong rows.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from .partitioned import _content_name


def _spread_bits16(v: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value so bit i lands at bit 2i
    (classic Morton bit-twiddle, vectorized uint64)."""
    x = v.astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton_key(x: np.ndarray, y: np.ndarray, lo_x, hi_x, lo_y, hi_y) -> np.ndarray:
    """Interleave two int64 columns into a z key: each is first scaled
    into a 16-bit grid over its [lo, hi] domain (domain from the caller —
    at scale, footer stats or a prior profiling pass)."""
    def grid(v, lo, hi):
        span = max(1, int(hi) - int(lo))
        g = ((v.astype(np.float64) - lo) / span * 65535.0)
        return np.clip(g, 0, 65535).astype(np.uint64)

    gx = _spread_bits16(grid(x, lo_x, hi_x))
    gy = _spread_bits16(grid(y, lo_y, hi_y))
    return ((gx << np.uint64(1)) | gy).astype(np.int64)


def zorder_write(
    ds,
    out_dir: str,
    col_x: str,
    col_y: str,
    domains: "tuple[tuple[int, int], tuple[int, int]]",
    shards: int = 16,
) -> int:
    """Sort by the Morton key of (col_x, col_y), repartition to ``shards``
    z-contiguous shards, write each from its producing task with a
    min/max sidecar over BOTH original columns.  Returns total rows."""
    os.makedirs(out_dir, exist_ok=True)
    (lo_x, hi_x), (lo_y, hi_y) = domains

    def add_key(t: pa.Table) -> pa.Table:
        z = morton_key(
            t[col_x].to_numpy(zero_copy_only=False),
            t[col_y].to_numpy(zero_copy_only=False),
            lo_x, hi_x, lo_y, hi_y,
        )
        return t.append_column("__z", pa.array(z, pa.int64()))

    clustered = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .sort("__z")
        .repartition(shards)
    )

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        t = t.drop_columns(["__z"])
        name = _content_name(t)
        path = os.path.join(out_dir, name)
        xs = t[col_x].to_numpy(zero_copy_only=False)
        ys = t[col_y].to_numpy(zero_copy_only=False)
        side = {
            col_x: [int(xs.min()), int(xs.max())],
            col_y: [int(ys.min()), int(ys.max())],
            "n": len(t),
        }
        # publish the SIDECAR first: a crash between the two replaces
        # then leaves an orphan .zidx (harmless — readers glob *.parquet)
        # instead of a shard whose missing sidecar breaks every read
        tmp_s = path + ".zidx.tmp"
        with open(tmp_s, "w") as f:
            json.dump(side, f)
        os.replace(tmp_s, path + ".zidx")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    total = clustered.map_batches(
        write_block, batch_format="pyarrow"
    ).sum("n")
    return int(total or 0)


def zorder_range_read(
    out_dir: str,
    col_x: str,
    col_y: str,
    x_range: "tuple[int, int]",
    y_range: "tuple[int, int]",
    columns=None,
    parallelism: int = 8,
):
    """2D range scan over a z-ordered layout: sidecar min/max prunes
    shards on BOTH predicates, survivors stream through column-pruned
    reads with the exact filter applied in-task.  Returns
    (Dataset, stats_fn) where stats_fn() → shards_total/shards_read."""
    from .pruned import pruned_shard_read

    shards = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    if not shards:
        raise FileNotFoundError(f"no shards under {out_dir}")

    def keep_flags(paths):
        flags = []
        for p in paths:
            with open(p + ".zidx") as f:
                side = json.load(f)
            flags.append(
                not (
                    side[col_x][0] > x_range[1]
                    or side[col_x][1] < x_range[0]
                    or side[col_y][0] > y_range[1]
                    or side[col_y][1] < y_range[0]
                )
            )
        return flags

    # the exact filter needs both key columns; read them even when the
    # caller's projection omits them, drop afterwards
    read_cols = None
    if columns is not None:
        read_cols = list(dict.fromkeys(list(columns) + [col_x, col_y]))

    def load_one(p):
        shard = pq.read_table(p, columns=read_cols)
        m = pc.and_(
            pc.and_(
                pc.greater_equal(shard[col_x], x_range[0]),
                pc.less_equal(shard[col_x], x_range[1]),
            ),
            pc.and_(
                pc.greater_equal(shard[col_y], y_range[0]),
                pc.less_equal(shard[col_y], y_range[1]),
            ),
        )
        out = shard.filter(m)
        if columns is not None:
            out = out.select(list(columns))
        yield out

    sch = pq.read_schema(shards[0])
    cols = list(columns) if columns is not None else list(sch.names)
    typed_empty = pa.table(
        {c: pa.array([], sch.field(c).type) for c in cols}
    )
    return pruned_shard_read(shards, keep_flags, load_one, typed_empty,
                             parallelism=parallelism)
