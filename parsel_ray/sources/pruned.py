"""Shared scaffold for sidecar-pruned shard readers.

Both the Bloom point-lookup reader (:mod:`.indexed`) and the Z-order
range reader (:mod:`.zorder`) have the same shape: fan the shard paths
out as dataset rows, let tasks drop shards whose sidecar cannot match
(the driver never opens a sidecar), collect the O(matching) candidate
list, then stream only those shards through an exact in-task filter.
The one Ray quirk lives here exactly once: map outputs that are ALL
empty lose their schema, so the loaded stream unions with a typed empty
block.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd


def pruned_shard_read(
    shards,
    keep_flags_fn,
    load_fn,
    typed_empty: pa.Table,
    parallelism: int = 8,
):
    """Generic pruned reader.

    ``shards``: ordered list of shard paths (non-empty).
    ``keep_flags_fn``: list[str] → list[bool] — which paths MAY match
    (runs inside tasks; must have no false negatives).
    ``load_fn``: path → iterable of pa.Table — exact per-shard read+filter
    (may yield empty tables).
    ``typed_empty``: zero-row table with the reader's output schema.

    Returns (Dataset, stats_fn) with stats_fn() →
    {"shards_total", "shards_read"}."""

    paths_ds = rd.from_arrow(
        pa.table({"path": pa.array(shards, pa.string())})
    ).repartition(min(parallelism, len(shards)))

    def scan(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(keep_flags_fn(t["path"].to_pylist())))

    keep = [
        r["path"]
        for r in paths_ds.map_batches(scan, batch_format="pyarrow").take_all()
    ]

    def load(t: pa.Table):
        for p in t["path"].to_pylist():
            yield from load_fn(p)

    if keep:
        # union with a typed empty block: Ray drops all-empty map output
        # blocks, which would otherwise leave a schema-less dataset when
        # the exact filter empties every candidate
        result = rd.from_arrow(
            pa.table({"path": pa.array(keep, pa.string())})
        ).repartition(min(parallelism, len(keep))).map_batches(
            load, batch_format="pyarrow"
        ).union(rd.from_arrow(typed_empty))
    else:
        result = rd.from_arrow(typed_empty)

    def stats():
        return {"shards_total": len(shards), "shards_read": len(keep)}

    return result, stats
