"""Partitioned parquet sink — the resumable-output layout (SURVEY §2.6).

ONE streaming pass over the Dataset: each ``map_batches`` task splits its
batch by the partition key and writes one shard per (key, batch) directly
from the worker (atomic tmp+rename) under ``out_dir/<key>=<value>/``.
After the pass the driver publishes a ``_DONE`` marker per partition
directory.  A rerun:

* skips ROWS of finished (``_DONE``) partitions inside the tasks, and
* cleans partial shards of unfinished partitions up front,

so a failed run resumes without rewriting completed partitions and
without the O(K) full-dataset re-scans of a filter-per-key loop.  No
driver materialization: the returned per-partition row counts come from
the tasks' write receipts (plus metadata read-back for pre-finished
partitions).
"""

from __future__ import annotations

import glob
import hashlib
import io
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.ipc as ipc
import pyarrow.parquet as pq


# (task_id, next_seq) of the task currently running in this worker — a
# worker executes one map task at a time, so one slot suffices
_TASK_SEQ: list = ["", 0]


def _content_name(sub: pa.Table) -> str:
    """Shard filename from a digest of (batch content, Ray task id,
    per-task write ordinal): a RETRIED task reuses its task id and
    replays its batches in order from a fresh worker (ordinal restarts
    at 0), so the rewrite lands on the same name and the atomic
    ``os.replace`` is idempotent — while two DIFFERENT tasks, or two
    byte-identical sub-batches within ONE task, get distinct names (no
    silent collapse, with or without ``verify``).  Remaining corner: a
    same-process re-execution of one task id would continue the ordinal
    instead of restarting — that run double-writes (extra shards), which
    ``verify`` flags; rows are never silently dropped."""
    sink = io.BytesIO()
    with ipc.new_stream(sink, sub.schema) as w:
        w.write_table(sub)
    try:
        import ray

        tid = ray.get_runtime_context().get_task_id() or ""
    except Exception:  # not inside a Ray task (unit tests, driver)
        tid = ""
    if _TASK_SEQ[0] != tid:
        _TASK_SEQ[0], _TASK_SEQ[1] = tid, 0
    seq, _TASK_SEQ[1] = _TASK_SEQ[1], _TASK_SEQ[1] + 1
    digest = hashlib.md5(
        sink.getvalue() + tid.encode() + seq.to_bytes(8, "little")
    ).hexdigest()[:20]
    return f"shard-{digest}.parquet"


def _partition_value(dirname: str, key_col: str) -> str | None:
    base = os.path.basename(dirname.rstrip("/"))
    prefix = f"{key_col}="
    return base[len(prefix):] if base.startswith(prefix) else None


def write_partitioned_parquet(ds, out_dir: str, key_col: str,
                              verify: bool = True) -> pa.Table:
    """Write ``ds`` under ``out_dir/<key_col>=<value>/shard-*.parquet``
    in one pass; returns ``(key_col, n)`` per-partition row counts.

    Key values are rendered with ``str()`` — callers with keys that are
    unsafe as path segments should pre-map them to a safe column.
    ``verify`` (default) cross-checks write receipts against parquet file
    metadata BEFORE publishing ``_DONE`` — any shard-name collision or
    lost write raises instead of silently corrupting counts (metadata
    footer reads only, O(shards)).
    """
    os.makedirs(out_dir, exist_ok=True)
    done: set[str] = set()
    for pdir in glob.glob(os.path.join(out_dir, f"{key_col}=*")):
        val = _partition_value(pdir, key_col)
        if val is None:
            continue
        if os.path.exists(os.path.join(pdir, "_DONE")):
            done.add(val)
        else:  # partial output of a failed run — rewritten by this pass
            for f in glob.glob(os.path.join(pdir, "*.parquet*")):
                os.remove(f)

    def write_batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {key_col: pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
        if len(t) == 0:
            return empty
        keys = t[key_col]
        out_keys: list[str] = []
        out_ns: list[int] = []
        for k in pc.unique(keys).to_pylist():
            sval = str(k)
            if sval in done:
                continue
            sub = t.filter(pc.equal(keys, k))
            pdir = os.path.join(out_dir, f"{key_col}={sval}")
            os.makedirs(pdir, exist_ok=True)
            path = os.path.join(pdir, _content_name(sub))
            tmp = path + f".tmp{os.getpid()}"
            pq.write_table(sub, tmp)
            os.replace(tmp, path)  # atomic publish; idempotent on retry
            out_keys.append(sval)
            out_ns.append(len(sub))
        if not out_keys:
            return empty
        return pa.table(
            {
                key_col: pa.array(out_keys, pa.string()),
                "n": pa.array(out_ns, pa.int64()),
            }
        )

    from ..functions.agg import partial_sum_groupby

    receipts = partial_sum_groupby(
        ds.map_batches(write_batch, batch_format="pyarrow"), [key_col], {"n": "n"}
    )
    counts = {r[key_col]: int(r["n"]) for r in receipts.take_all()}  # ≤ K rows
    # the aggregate consumed the stream → every shard is on disk
    if verify:
        for val, n in counts.items():
            files = glob.glob(
                os.path.join(out_dir, f"{key_col}={val}", "*.parquet")
            )
            on_disk = sum(pq.read_metadata(f).num_rows for f in files)
            if on_disk != n:
                raise RuntimeError(
                    f"partition {key_col}={val}: receipts say {n} rows but "
                    f"files hold {on_disk} — shard collision or lost write"
                )
    for val in counts:
        open(os.path.join(out_dir, f"{key_col}={val}", "_DONE"), "w").close()
    for val in done:  # pre-finished partitions: count from file metadata
        files = glob.glob(os.path.join(out_dir, f"{key_col}={val}", "*.parquet"))
        counts[val] = sum(pq.read_metadata(f).num_rows for f in files)
    keys = sorted(counts)
    return pa.table(
        {
            key_col: pa.array(keys, pa.string()),
            "n": pa.array([counts[k] for k in keys], pa.int64()),
        }
    )
