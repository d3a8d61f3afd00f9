"""Arrow IPC (Feather V2) sink/source for Ray Data.

Fifth interchange format next to parquet/csv/jsonl/orc.  IPC is the
zero-copy one: a stored block IS the wire/object-store representation, so
the read side memory-maps straight into Arrow arrays with no decode step
— the right spill/handoff format between pipeline stages of THIS engine
(parquet stays the archival format; IPC the hot-path one).

Same worker-side shard contract as :mod:`parsel_ray.sources.partitioned`:
writes happen inside the map task that holds the block (the driver never
sees rows), shard names are content+task digests so task retries
overwrite their own files idempotently via atomic ``os.replace``, and the
read side distributes one-path-per-row through ``map_batches`` so a large
directory streams with normal backpressure.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.feather as pf
import pyarrow.ipc as ipc

import ray.data as rd

from .partitioned import _content_name


def write_arrow_ipc(ds, out_dir: str, compression: str | None = "lz4") -> int:
    """Stream ``ds`` to ``out_dir/shard-<digest>.arrow`` (Feather V2 =
    Arrow IPC file format), one file per non-empty block, written by the
    task that produced the block.  Returns total rows from O(shards)
    receipt rows."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        name = _content_name(t).replace(".parquet", ".arrow")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        pf.write_feather(t, tmp, compression=compression)
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    receipts = ds.map_batches(write_block, batch_format="pyarrow")
    return int(receipts.sum("n") or 0)


def read_arrow_ipc(path: str, columns=None, parallelism: int = 8):
    """Read a directory of Arrow IPC shards (or one file) as a Ray
    Dataset.  Paths fan out as rows; each task memory-maps its files
    (zero-copy for uncompressed shards) and emits their tables,
    column-pruned at the reader when ``columns`` is given."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".arrow")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")

    paths_ds = rd.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    ).repartition(min(parallelism, len(files)))

    def load(t: pa.Table):
        for p in t["path"].to_pylist():
            with pa.memory_map(p, "r") as src:
                tbl = ipc.open_file(src).read_all()
            yield tbl.select(columns) if columns else tbl

    return paths_ds.map_batches(load, batch_format="pyarrow")
