"""WebDataset-style tar shard sink/source for Ray Data.

Large-scale image/text training corpora are commonly stored as tar
shards whose members group into samples by key prefix —
``{key}.jpg`` + ``{key}.json`` + ``{key}.txt`` — streamed
sequentially by the training loader (the WebDataset convention).
This module writes and reads that layout with the same worker-side
shard contract as :mod:`parsel_ray.sources.partitioned`: every tar is
produced inside the map task that holds the block (the driver never
sees rows), shard names are content+task digests so task RETRIES
overwrite their own files idempotently via atomic ``os.replace``, and
the read side distributes one-path-per-row through ``map_batches`` so
a 100 TB shard directory streams with backpressure instead of a
driver listing loop.

Tar bytes are DETERMINISTIC (USTAR format, mtime=0, uid/gid=0, empty
uname/gname) so a retried task reproduces byte-identical shards and
the content digest is stable.
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pyarrow as pa

import ray.data as rd

from .partitioned import _content_name

KEY_COL = "__key__"


def _tar_add(tf: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tf.addfile(info, io.BytesIO(payload))


def write_tar_shards(
    ds,
    out_dir: str,
    key_col: str,
    payload_exts: dict,
    meta_cols=None,
) -> int:
    """Stream ``ds`` to ``out_dir/shard-<digest>.tar``, one tar per
    non-empty block, written by the task that produced the block.

    ``payload_exts`` maps column name -> member extension (``"txt"``,
    ``"jpg"``, ...): string columns are UTF-8 encoded, binary columns
    pass through raw.  ``meta_cols`` (optional) are bundled into one
    ``{key}.json`` member per sample.  Members of a sample are
    adjacent (the WebDataset grouping contract).  Returns total sample
    count via O(shards) receipt rows.
    """
    os.makedirs(out_dir, exist_ok=True)
    meta_cols = list(meta_cols or [])

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        name = _content_name(t).replace(".parquet", ".tar")
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        keys = [str(k) for k in t[key_col].to_pylist()]
        payloads = {
            c: t[c].to_pylist() for c in payload_exts
        }
        metas = {c: t[c].to_pylist() for c in meta_cols}
        with open(tmp, "wb") as f:
            with tarfile.open(
                fileobj=f, mode="w", format=tarfile.USTAR_FORMAT
            ) as tf:
                for i, k in enumerate(keys):
                    for col, ext in payload_exts.items():
                        v = payloads[col][i]
                        if v is None:
                            # WebDataset semantics: a null payload means
                            # the member file is absent for this sample
                            # (bytes(None) would kill the whole task)
                            continue
                        data = (
                            v.encode("utf-8") if isinstance(v, str) else
                            bytes(v)
                        )
                        _tar_add(tf, f"{k}.{ext}", data)
                    if meta_cols:
                        doc = {c: metas[c][i] for c in meta_cols}
                        _tar_add(
                            tf,
                            f"{k}.json",
                            json.dumps(doc, sort_keys=True).encode(),
                        )
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    receipts = ds.map_batches(write_block, batch_format="pyarrow")
    total = receipts.sum("n")
    return int(total or 0)


def read_tar_shards(path: str, exts=None, parallelism: int = 8):
    """Read a directory of tar shards (or one tar) as a Ray Dataset of
    samples: one row per key, one ``binary`` column per member
    extension (named by the extension), plus ``__key__``.

    ``exts`` (optional) prunes to the named extensions at the reader —
    other members are skipped without being buffered (tarfile streams
    member-by-member), the shard-format analogue of a column-pruned
    parquet read.
    """
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".tar")
        )
    else:
        files = [path]
    if not files:
        raise FileNotFoundError(f"no .tar files under {path}")
    want = set(exts) if exts else None

    paths_ds = rd.from_arrow(
        pa.table({"path": pa.array(files, pa.string())})
    ).repartition(min(parallelism, len(files)))

    def load(t: pa.Table):
        for p in t["path"].to_pylist():
            rows = {}  # key -> {ext: bytes}; dict preserves order
            with tarfile.open(p, mode="r") as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    key, _, ext = m.name.rpartition(".")
                    if not key or (want is not None and ext not in want):
                        continue
                    rows.setdefault(key, {})[ext] = tf.extractfile(
                        m
                    ).read()
            if not rows:
                continue
            all_exts = sorted({e for r in rows.values() for e in r})
            cols = {
                KEY_COL: pa.array(list(rows), pa.string()),
            }
            for e in all_exts:
                cols[e] = pa.array(
                    [r.get(e) for r in rows.values()], pa.binary()
                )
            yield pa.table(cols)

    return paths_ds.map_batches(load, batch_format="pyarrow")
