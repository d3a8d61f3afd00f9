"""Bloom-sidecar indexed parquet sink + point-lookup pruned reader.

The partitioned sink (:mod:`parsel_ray.sources.partitioned`) prunes on
the PARTITION key's directory value; point lookups on a high-cardinality
key (doc ids, URL hashes) need a per-shard secondary index instead.
Each shard gets a tiny ``.idx`` sidecar — key min/max plus a Bloom
filter of the shard's keys (no false negatives, so pruning never loses
a row).  A point lookup then touches only the shards whose sidecar may
match: at 100 TB the sidecar scan itself is a distributed map over the
path list (sidecars are KBs; the driver never reads a shard), and the
surviving shards stream through normal column-pruned parquet reads.

Same retry contract as the other sinks: shard AND sidecar names derive
from the block content + task id, written via atomic ``os.replace``, so
a retried task overwrites its own files idempotently.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..functions.relational import BloomFilter, LazyRef
from .partitioned import _content_name

_IDX_MAGIC = b"PRIX1\n"


def _sidecar_bytes(keys: np.ndarray, fpr: float) -> bytes:
    bf = BloomFilter(max(64, len(keys)), fpr)
    bf.add_many(keys)
    hdr = json.dumps(
        {
            "m": bf.m,
            "k": bf.k,
            "n": int(keys.size),
            "lo": int(keys.min()),
            "hi": int(keys.max()),
        }
    ).encode()
    return (
        _IDX_MAGIC
        + struct.pack("<I", len(hdr))
        + hdr
        + bf.bits.tobytes()
    )


def _sidecar_may_match(data: bytes, keys: np.ndarray) -> bool:
    if not data.startswith(_IDX_MAGIC):
        raise ValueError("not a PRIX1 sidecar")
    (hlen,) = struct.unpack_from("<I", data, len(_IDX_MAGIC))
    off = len(_IDX_MAGIC) + 4
    hdr = json.loads(data[off : off + hlen])
    inrange = keys[(keys >= hdr["lo"]) & (keys <= hdr["hi"])]
    if inrange.size == 0:
        return False
    bf = BloomFilter.__new__(BloomFilter)
    bf.m, bf.k = hdr["m"], hdr["k"]
    bf.bits = np.frombuffer(
        data[off + hlen :], dtype=np.uint64
    ).copy()
    return bool(bf.may_contain(inrange).any())


def write_indexed_parquet(
    ds, out_dir: str, key_col: str, fpr: float = 0.005
) -> int:
    """Stream ``ds`` to ``out_dir/shard-*.parquet`` + ``.idx`` sidecars
    (key Bloom + min/max), one pair per non-empty block, written by the
    producing task.  Returns total rows (receipt sum)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        name = _content_name(t)
        path = os.path.join(out_dir, name)
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        # sidecar first (orphan .idx is harmless; a shard missing its
        # .idx would break every point_lookup in the directory)
        side = path + ".idx"
        tmp_s = side + ".tmp"
        with open(tmp_s, "wb") as f:
            f.write(_sidecar_bytes(keys, fpr))
        os.replace(tmp_s, side)
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.table({"n": pa.array([len(t)], pa.int64())})

    total = ds.map_batches(write_block, batch_format="pyarrow").sum("n")
    return int(total or 0)


def point_lookup(
    out_dir: str,
    key_col: str,
    keys,
    columns=None,
    parallelism: int = 8,
):
    """Read only the rows whose ``key_col`` is in ``keys``: a distributed
    sidecar scan selects candidate shards (Bloom + min/max — no false
    negatives, so the result is EXACT after the final in-shard filter),
    then only those shards are read (column-pruned).  Returns
    (Dataset, stats_fn) — call ``stats_fn()`` after consuming the
    Dataset for {'shards_total', 'shards_read'} pruning evidence."""
    import pyarrow.compute as pc

    from .pruned import pruned_shard_read

    shards = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    if not shards:
        raise FileNotFoundError(f"no shards under {out_dir}")
    keys_arr = np.asarray(sorted(set(int(k) for k in keys)), np.int64)
    keys_ref = LazyRef(ray.put(keys_arr))

    def keep_flags(paths):
        ks = keys_ref.get()
        flags = []
        for p in paths:
            with open(p + ".idx", "rb") as f:
                flags.append(_sidecar_may_match(f.read(), ks))
        return flags

    def load_one(p):
        ks = keys_ref.get()
        shard = pq.read_table(p, columns=columns)
        mask = pc.is_in(shard[key_col], value_set=pa.array(ks, pa.int64()))
        yield shard.filter(mask)

    sch = pq.read_schema(shards[0])
    schema_cols = list(columns) if columns is not None else list(sch.names)
    typed_empty = pa.table(
        {c: pa.array([], sch.field(c).type) for c in schema_cols}
    )
    return pruned_shard_read(shards, keep_flags, load_one, typed_empty,
                             parallelism=parallelism)
