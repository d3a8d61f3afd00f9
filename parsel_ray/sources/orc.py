"""ORC sink/source for Ray Data (pyarrow.orc; Ray Data ships no ORC IO).

Same worker-side shard contract as :mod:`parsel_ray.sources.partitioned`:
every write happens inside the map task that holds the block (the driver
never sees rows), shard names are content+task digests so task RETRIES
overwrite their own files idempotently via atomic ``os.replace``, and the
read side distributes one-file-per-row paths through ``map_batches`` so a
100 TB directory streams with normal backpressure instead of a driver
listing loop.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.orc as po

import ray.data as rd

from .partitioned import _content_name


def write_orc(ds, out_dir: str) -> int:
    """Stream ``ds`` to ``out_dir/shard-<digest>.orc``, one file per
    non-empty block, written by the task that produced the block.
    Returns the total row count (from O(shards) receipt rows)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        name = _content_name(t).replace(".parquet", ".orc")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        po.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    receipts = ds.map_batches(write_block, batch_format="pyarrow")
    total = receipts.sum("n")
    return int(total or 0)


def read_orc(path: str, columns=None, parallelism: int = 8):
    """Read a directory of ORC shards (or one file) as a Ray Dataset.
    Paths fan out as rows; each task opens its own files with
    ``pyarrow.orc`` and emits their tables (column-pruned at the reader
    when ``columns`` is given)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".orc")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .orc files under {path}")

    paths_ds = rd.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    ).repartition(min(parallelism, len(files)))

    def load(t: pa.Table):
        for p in t["path"].to_pylist():
            yield po.read_table(p, columns=columns)

    return paths_ds.map_batches(load, batch_format="pyarrow")
