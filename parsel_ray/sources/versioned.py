"""Versioned table layout: manifest-pinned snapshots + time travel.

The other sinks in this package make shard FILES immutable and
retry-idempotent (content+task digest names, atomic replace); this
module adds the missing coordination layer: a numbered MANIFEST that
pins exactly which shard files constitute a snapshot.  Readers resolve
a manifest, never a directory listing, so

* a reader of version N is isolated from concurrent appends (new shards
  are invisible until a later manifest commits),
* old versions stay readable after new commits (time travel),
* a failed writer leaves orphan shard files but can never corrupt a
  snapshot (the manifest is the only publish point — an EXCLUSIVE
  link-based create, so two appenders racing to the same version number
  fail loudly rather than silently dropping one writer's commit).

This is the public Iceberg/Delta snapshot-isolation idea reduced to the
repo's needs; at 100 TB the manifest holds shard paths + row counts
(KBs per thousand shards), never data.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .partitioned import _content_name

_MANIFEST = "manifest-v{n}.json"


def _versions(table_dir: str) -> list:
    out = []
    for f in os.listdir(table_dir):
        if f.startswith("manifest-v") and f.endswith(".json"):
            out.append(int(f[len("manifest-v"):-len(".json")]))
    return sorted(out)


def append_version(ds, table_dir: str) -> int:
    """Write ``ds`` as new immutable shards, then commit a manifest that
    pins PREVIOUS version's shards + the new ones (append semantics).
    Returns the new version number.  The manifest rename is the single
    atomic publish point — a crash before it leaves only orphan files."""
    os.makedirs(table_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "n": pa.array([], pa.int64())}
            )
        name = _content_name(t)
        path = os.path.join(table_dir, name)
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table(
            {"path": pa.array([name], pa.string()),
             "n": pa.array([len(t)], pa.int64())}
        )

    receipts = ds.map_batches(write_block, batch_format="pyarrow").take_all()
    new_files = [{"path": r["path"], "rows": r["n"]} for r in receipts]

    vs = _versions(table_dir)
    prev_files = []
    if vs:
        with open(os.path.join(table_dir,
                               _MANIFEST.format(n=vs[-1]))) as f:
            prev_files = json.load(f)["files"]
    n = (vs[-1] + 1) if vs else 1
    manifest = {
        "version": n,
        "files": prev_files + new_files,
        "rows": sum(f["rows"] for f in prev_files + new_files),
    }
    tmp = os.path.join(table_dir, f".manifest-v{n}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    final = os.path.join(table_dir, _MANIFEST.format(n=n))
    # exclusive link (not a clobbering rename): a concurrent appender
    # that raced to the same version number fails LOUDLY here instead of
    # silently discarding the other writer's committed files.  The loser
    # retries by re-reading the latest manifest.
    try:
        os.link(tmp, final)
    except FileExistsError as e:
        os.unlink(tmp)
        raise RuntimeError(
            f"append_version: concurrent commit raced to version {n}; "
            "re-read the latest manifest and retry"
        ) from e
    os.unlink(tmp)
    return n


def read_version(
    table_dir: str,
    version: int | None = None,
    columns=None,
    parallelism: int = 8,
):
    """Read snapshot ``version`` (default: latest).  Only manifest-pinned
    shards are touched — orphans from failed writers and shards of later
    versions are invisible."""
    vs = _versions(table_dir)
    if not vs:
        raise FileNotFoundError(f"no manifests under {table_dir}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise ValueError(f"version {v} not in {vs}")
    with open(os.path.join(table_dir, _MANIFEST.format(n=v))) as f:
        manifest = json.load(f)
    paths = [os.path.join(table_dir, e["path"]) for e in manifest["files"]]
    if not paths:
        raise ValueError(f"version {v} pins no files")
    return rd.read_parquet(paths, columns=columns)
