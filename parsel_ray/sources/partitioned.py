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
import json
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
        # the marker carries the partition's row count: later passes
        # (delete_from_partitioned, resumed writes) cross-check it
        # against parquet footers to catch crash-window duplicates
        with open(os.path.join(out_dir, f"{key_col}={val}", "_DONE"),
                  "w") as f:
            f.write(str(counts[val]))
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


def delete_from_partitioned(out_dir: str, key_col: str, predicate,
                            verify: bool = True) -> pa.Table:
    """Targeted delete / compaction over an existing partitioned corpus
    (the retention / right-to-be-forgotten pass): rewrite ONLY the
    partitions that contain matching rows, one Ray task per partition,
    leaving untouched partitions' files byte-identical.

    ``predicate``: a callable ``pa.Table -> pa.BooleanArray`` marking
    rows to DELETE (applied inside the per-partition task — vectorized,
    worker-side; the driver sees only per-partition receipt rows).

    Protocol per affected partition: cross-check the partition's
    ``_DONE`` row count (written by ``write_partitioned_parquet`` and
    refreshed here) against the parquet footers BEFORE reading — a
    crash between a previous pass's atomic publish and its cleanup
    leaves a stale duplicate shard, and the count mismatch raises
    loudly instead of serving duplicated rows.  Then write the
    surviving rows to one consolidated shard via tmp + ``os.replace``
    (atomic publish), remove the superseded shards, and refresh
    ``_DONE``.

    Returns ``(key_col, n_deleted, n_kept)`` per partition.
    """
    import ray.data as rd

    pdirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, f"{key_col}=*"))
        if _partition_value(d, key_col) is not None
    )
    if not pdirs:
        return pa.table(
            {
                key_col: pa.array([], pa.string()),
                "n_deleted": pa.array([], pa.int64()),
                "n_kept": pa.array([], pa.int64()),
            }
        )

    def compact(t: pa.Table) -> pa.Table:
        out_k, out_d, out_n = [], [], []
        for pdir in t["pdir"].to_pylist():
            val = _partition_value(pdir, key_col)
            # sweep orphan .tmp shards from a compaction that crashed
            # BEFORE its atomic publish (they are invisible to the
            # *.parquet glob and would otherwise accumulate forever)
            for stale in glob.glob(os.path.join(pdir, "*.parquet.tmp*")):
                os.remove(stale)
            files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
            if not files:
                continue
            done_path = os.path.join(pdir, "_DONE")
            expected = None
            if os.path.exists(done_path):
                txt = open(done_path).read().strip()
                expected = int(txt) if txt.isdigit() else None
            on_disk = sum(pq.read_metadata(f).num_rows for f in files)
            if expected is not None and on_disk != expected:
                raise RuntimeError(
                    f"partition {key_col}={val}: _DONE records "
                    f"{expected} rows but files hold {on_disk} — "
                    f"crash window or lost write (stale shard?)"
                )
            tab = pa.concat_tables([pq.read_table(f) for f in files])
            mask = predicate(tab)
            n_del = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
            if n_del:
                kept = tab.filter(pc.invert(mask))
                new = os.path.join(pdir, _content_name(kept))
                tmp = new + f".tmp{os.getpid()}"
                pq.write_table(kept, tmp)
                os.replace(tmp, new)  # atomic publish
                for f in files:
                    if f != new:
                        os.remove(f)
                n_kept = len(kept)
            else:
                n_kept = len(tab)
            if n_del or expected is None:
                with open(done_path, "w") as f:  # refresh the count
                    f.write(str(n_kept))
            out_k.append(val)
            out_d.append(n_del)
            out_n.append(n_kept)
        return pa.table(
            {
                key_col: pa.array(out_k, pa.string()),
                "n_deleted": pa.array(out_d, pa.int64()),
                "n_kept": pa.array(out_n, pa.int64()),
            }
        )

    receipts = (
        rd.from_arrow(pa.table({"pdir": pa.array(pdirs, pa.string())}))
        .repartition(len(pdirs))  # one task per partition
        .map_batches(compact, batch_format="pyarrow")
        .take_all()  # O(partitions) receipt rows
    )
    if verify:
        for r in receipts:
            files = glob.glob(
                os.path.join(out_dir, f"{key_col}={r[key_col]}",
                             "*.parquet")
            )
            on_disk = sum(pq.read_metadata(f).num_rows for f in files)
            if on_disk != r["n_kept"]:
                raise RuntimeError(
                    f"partition {key_col}={r[key_col]}: compaction "
                    f"receipts say {r['n_kept']} rows but files hold "
                    f"{on_disk} — crash window or lost write"
                )
    keys = sorted(r[key_col] for r in receipts)
    by = {r[key_col]: r for r in receipts}
    return pa.table(
        {
            key_col: pa.array(keys, pa.string()),
            "n_deleted": pa.array(
                [by[k]["n_deleted"] for k in keys], pa.int64()
            ),
            "n_kept": pa.array([by[k]["n_kept"] for k in keys], pa.int64()),
        }
    )


def compact_partitioned(out_dir: str, key_col: str,
                        target_rows_per_shard: int = 100_000,
                        verify: bool = True) -> pa.Table:
    """Small-file compaction over an existing partitioned corpus: every
    partition whose shard count exceeds what ``target_rows_per_shard``
    requires is rewritten into ceil(rows/target) shards; partitions
    already at or under the target are left byte-identical (their files
    are not even opened beyond the footer).  One Ray task per partition
    — the driver sees only receipt rows, never data.

    Same crash-safety protocol as :func:`delete_from_partitioned`:
    orphan ``.tmp`` sweep, ``_DONE``-vs-footer cross-check BEFORE
    reading, atomic per-shard publish via ``os.replace``, superseded
    shards removed only after every replacement shard is live, and a
    refreshed ``_DONE`` count.  A crash mid-compaction leaves either
    extra live shards (caught by the count cross-check on the next
    pass's read of ``_DONE``) or orphan tmps (swept), never lost rows.

    Returns ``(key_col, files_before, files_after, n_rows)`` receipts.
    """
    import math as _math

    import ray.data as rd

    if target_rows_per_shard < 1:
        raise ValueError("target_rows_per_shard must be >= 1")
    pdirs = sorted(
        d for d in glob.glob(os.path.join(out_dir, f"{key_col}=*"))
        if _partition_value(d, key_col) is not None
    )
    empty = pa.table(
        {
            key_col: pa.array([], pa.string()),
            "files_before": pa.array([], pa.int64()),
            "files_after": pa.array([], pa.int64()),
            "n_rows": pa.array([], pa.int64()),
        }
    )
    if not pdirs:
        return empty

    def compact(t: pa.Table) -> pa.Table:
        out = {k: [] for k in
               (key_col, "files_before", "files_after", "n_rows")}
        for pdir in t["pdir"].to_pylist():
            val = _partition_value(pdir, key_col)
            for stale in glob.glob(os.path.join(pdir, "*.parquet.tmp*")):
                os.remove(stale)
            files = sorted(glob.glob(os.path.join(pdir, "*.parquet")))
            if not files:
                continue
            done_path = os.path.join(pdir, "_DONE")
            expected = None
            if os.path.exists(done_path):
                txt = open(done_path).read().strip()
                expected = int(txt) if txt.isdigit() else None
            on_disk = sum(pq.read_metadata(f).num_rows for f in files)
            if expected is not None and on_disk != expected:
                raise RuntimeError(
                    f"partition {key_col}={val}: _DONE records "
                    f"{expected} rows but files hold {on_disk} — "
                    f"crash window or lost write (stale shard?)"
                )
            want_files = max(1, _math.ceil(on_disk / target_rows_per_shard))
            if len(files) <= want_files:
                out[key_col].append(val)
                out["files_before"].append(len(files))
                out["files_after"].append(len(files))
                out["n_rows"].append(on_disk)
                continue
            # deterministic row order: shards concatenate in sorted
            # filename order, so re-runs produce identical output shards
            tab = pa.concat_tables([pq.read_table(f) for f in files])
            new_files: list[str] = []
            for i in range(want_files):
                sub = tab.slice(i * target_rows_per_shard,
                                target_rows_per_shard)
                new = os.path.join(pdir, _content_name(sub))
                tmp = new + f".tmp{os.getpid()}"
                pq.write_table(sub, tmp)
                os.replace(tmp, new)  # atomic publish
                new_files.append(new)
            live = set(new_files)
            for f in files:
                if f not in live:
                    os.remove(f)
            with open(done_path, "w") as fh:
                fh.write(str(on_disk))
            out[key_col].append(val)
            out["files_before"].append(len(files))
            out["files_after"].append(len(new_files))
            out["n_rows"].append(on_disk)
        if not out[key_col]:
            return empty
        return pa.table(
            {
                key_col: pa.array(out[key_col], pa.string()),
                "files_before": pa.array(out["files_before"], pa.int64()),
                "files_after": pa.array(out["files_after"], pa.int64()),
                "n_rows": pa.array(out["n_rows"], pa.int64()),
            }
        )

    receipts = (
        rd.from_arrow(pa.table({"pdir": pa.array(pdirs, pa.string())}))
        .repartition(len(pdirs))  # one task per partition
        .map_batches(compact, batch_format="pyarrow")
        .take_all()  # O(partitions) receipt rows
    )
    if verify:
        for r in receipts:
            files = glob.glob(
                os.path.join(out_dir, f"{key_col}={r[key_col]}", "*.parquet")
            )
            on_disk = sum(pq.read_metadata(f).num_rows for f in files)
            if on_disk != r["n_rows"] or len(files) != r["files_after"]:
                raise RuntimeError(
                    f"partition {key_col}={r[key_col]}: compaction "
                    f"receipts say {r['n_rows']} rows in "
                    f"{r['files_after']} files but disk holds {on_disk} "
                    f"rows in {len(files)} — crash window or lost write"
                )
    keys = sorted(r[key_col] for r in receipts)
    by = {r[key_col]: r for r in receipts}
    return pa.table(
        {
            key_col: pa.array(keys, pa.string()),
            "files_before": pa.array(
                [by[k]["files_before"] for k in keys], pa.int64()
            ),
            "files_after": pa.array(
                [by[k]["files_after"] for k in keys], pa.int64()
            ),
            "n_rows": pa.array([by[k]["n_rows"] for k in keys], pa.int64()),
        }
    )


def read_evolved_parquet(paths, promote: bool = True):
    """Read parquet files whose schemas EVOLVED over time (columns added,
    widths promoted) as one Dataset with the unified schema — the
    standard long-lived-corpus ingestion problem.

    Footer schemas (no data read) unify via ``pa.unify_schemas``:
    columns missing from older files come back as typed nulls, and with
    ``promote=True`` compatible widths promote (int32 -> int64,
    float -> double).  Incompatible same-name types raise loudly at
    plan time instead of failing mid-stream.  Returns
    ``(Dataset, unified_schema)``.
    """
    paths = sorted(paths)
    if not paths:
        raise ValueError("read_evolved_parquet: no input files")
    schemas = [pq.read_schema(p) for p in paths]
    try:
        union = pa.unify_schemas(
            schemas,
            promote_options="permissive" if promote else "default",
        )
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
        raise ValueError(
            f"read_evolved_parquet: incompatible schemas across "
            f"{len(paths)} files: {e}"
        ) from e
    import ray.data as rd

    return rd.read_parquet(paths, schema=union), union


def write_bucketed(ds, out_dir: str, key_col: str, buckets: int,
                   verify: bool = True) -> pa.Table:
    """Bucketed table layout (Hive/Spark bucketing): rows land in
    ``out_dir/__bucket=<hash(key) % buckets>/`` shards.  Two tables
    bucketed with the SAME key domain and bucket count are co-partitioned
    ON DISK — a later equi-join on that key reads bucket pairs directly
    and never shuffles (:func:`bucketed_join`)."""
    from ..functions.relational import _bucket_of

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", _bucket_of(t[key_col], buckets))

    receipts = write_partitioned_parquet(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        out_dir, key_col="__bucket", verify=verify,
    )
    # manifest pins the hash backend: string keys bucket via polars'
    # row hash, which is only stable within one environment — joining a
    # layout bucketed under a different polars version (or the FNV
    # fallback) would silently drop matching rows, so bucketed_join
    # REFUSES mismatched manifests instead
    key_type = ds.schema().base_schema.field(key_col).type
    with open(os.path.join(out_dir, "_BUCKETS.json"), "w") as f:
        json.dump(
            {"buckets": buckets, "key_col": key_col,
             "hash_backend": _bucket_hash_backend(key_type)},
            f,
        )
    return receipts


def _bucket_hash_backend(key_type) -> str:
    if pa.types.is_integer(key_type):
        return "fib64"  # in-repo Fibonacci hash — stable everywhere
    try:
        import polars as pl

        return f"polars-{pl.__version__}"
    except ImportError:  # pragma: no cover
        return "fnv64"


def bucketed_join(
    left_dir: str,
    right_dir: str,
    on: str,
    buckets: int,
    suffixes=("", "_r"),
):
    """Shuffle-FREE equi-join over two bucketed layouts written by
    :func:`write_bucketed` with the same key domain and bucket count:
    the bucket id stream fans out as rows, each task reads ONE bucket
    directory pair and joins it in memory with Arrow.  The only data
    movement is the initial storage read — co-partitioning happened at
    write time, which is the point (at 100 TB, re-bucketing once and
    joining many times amortizes the shuffle)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    manifests = []
    for d in (left_dir, right_dir):
        mpath = os.path.join(d, "_BUCKETS.json")
        try:
            with open(mpath) as f:
                manifests.append(json.load(f))
        except FileNotFoundError:
            manifests.append(None)
    lm, rm = manifests
    if lm is not None and rm is not None:
        if lm["buckets"] != rm["buckets"] or lm["buckets"] != buckets:
            raise ValueError(
                f"bucket-count mismatch: left={lm['buckets']} "
                f"right={rm['buckets']} join={buckets}"
            )
        if lm["hash_backend"] != rm["hash_backend"]:
            raise ValueError(
                "bucketed layouts were written with different hash "
                f"backends ({lm['hash_backend']} vs {rm['hash_backend']}) "
                "— equal keys may sit in different buckets; re-bucket one "
                "side in the current environment"
            )

    ids = rd.from_arrow(
        pa.table({"b": pa.array(range(buckets), pa.int64())})
    ).repartition(min(buckets, 16))

    # typed empty block unioned below: a join with zero output rows
    # across ALL buckets would otherwise drop the dataset schema
    # (sources/pruned.py documents the same Ray quirk)
    def _side_schema(d: str) -> pa.Table:
        # NOTE: pads.dataset(d) sees nothing here — dataset discovery
        # ignores "_"-prefixed paths and every bucket dir is __bucket=N —
        # so read the schema from one shard footer directly
        shards = glob.glob(os.path.join(d, "__bucket=*", "*.parquet"))
        if not shards:
            raise ValueError(f"no bucketed shards under {d}")
        t = pq.read_schema(shards[0]).empty_table()
        return t.drop_columns(
            [c for c in ("__bucket",) if c in t.column_names]
        )

    empty_joined = _side_schema(left_dir).join(
        _side_schema(right_dir), keys=on, join_type="inner",
        right_suffix=suffixes[1],
    )

    def join_bucket(t: pa.Table):
        import pyarrow.dataset as pads

        for b in t["b"].to_pylist():
            sides = []
            for d in (left_dir, right_dir):
                bdir = os.path.join(d, f"__bucket={b}")
                if os.path.isdir(bdir):
                    tb = pads.dataset(bdir, format="parquet").to_table()
                    tb = tb.drop_columns(
                        [c for c in ("__bucket",) if c in tb.column_names]
                    )
                else:
                    tb = None
                sides.append(tb)
            lt, rt = sides
            if lt is None or len(lt) == 0 or rt is None or len(rt) == 0:
                continue  # inner join: a one-sided bucket contributes 0
            joined = lt.join(
                rt, keys=on, join_type="inner",
                right_suffix=suffixes[1],
            )
            if len(joined):
                yield joined

    return ids.map_batches(join_bucket, batch_format="pyarrow").union(
        rd.from_arrow(empty_joined)
    )
