"""Streaming / incremental processing over a stateful actor pool.

The batch engine's windows (sessionize, sliding, lag) re-scan history;
a production ingest pipeline instead processes an ordered stream of
MICRO-BATCHES and carries per-key state forward.  This module runs that
shape on Ray:

  * the event-time axis splits into B half-open micro-batch ranges
    (the watermark: a batch closes when its upper bound passes);
  * each micro-batch streams through ``map_batches`` tasks that route
    row slices to K hash-partitioned ``SessionState`` actors (a key
    always meets the same actor — the crawl frontier's sharding
    contract);
  * rows WITHIN a micro-batch arrive unordered (tasks race), so actors
    buffer until the driver's barrier, then fold the buffer in event-time
    order — the standard out-of-order handling under a watermark;
  * the driver sees only per-push acks and the end-of-stream flush refs;
    session rows never leave the workers (``from_arrow_refs``).

Correctness contract: identical output to the batch ``events_sessionize``
(30-min gap, (ts, event_id) order) — the oracle-checked equivalence is
the streaming engine's regression test, per micro-batch count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


def _footer_minmax(path: str, col: str):
    """(min, max) of ``col`` from parquet row-group footer statistics —
    zero data read; falls back to one distributed min/max scan when the
    writer omitted statistics."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path)
    idx = meta.schema_arrow.get_field_index(col)
    lo, hi = None, None
    for rg in range(meta.metadata.num_row_groups):
        st = meta.metadata.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            lo = hi = None
            break
        lo = st.min if lo is None or st.min < lo else lo
        hi = st.max if hi is None or st.max > hi else hi
    if lo is None:
        ds = rd.read_parquet(path, columns=[col])
        return ds.min(col), ds.max(col)
    return lo, hi


@ray.remote
class SessionState:
    """One hash partition of per-user session state.

    State per user: (last event ts, open session count, event count).
    ``push`` only buffers (cheap, called from racing tasks);
    ``process_batch`` folds the buffer in (ts, event_id) order —
    vectorized per user with the carried-in previous timestamp."""

    def __init__(self) -> None:
        self.buffer: list[pa.Table] = []
        self.last_ts: dict[int, int] = {}
        self.n_sessions: dict[int, int] = {}
        self.n_events: dict[int, int] = {}

    def push(self, table: pa.Table) -> int:
        self.buffer.append(table)
        return len(table)

    def process_batch(self) -> int:
        if not self.buffer:
            return 0
        t = pa.concat_tables(self.buffer)
        self.buffer = []
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "ts": t["ts"]
                .cast(pa.timestamp("us"))  # ns-precision inputs normalize
                .cast(pa.int64())
                .to_numpy(zero_copy_only=False),
                "event_id": t["event_id"].to_numpy(zero_copy_only=False),
            }
        ).sort_values(["ts", "event_id"], kind="mergesort")
        for uid, g in df.groupby("user_id", sort=False):
            ts = g["ts"].to_numpy()
            prev_tail = self.last_ts.get(uid)
            prev = np.empty(len(ts), dtype=np.float64)
            prev[1:] = ts[:-1]
            prev[0] = prev_tail if prev_tail is not None else np.nan
            starts = int(np.sum(np.isnan(prev) | (ts - prev > GAP_US)))
            self.n_sessions[uid] = self.n_sessions.get(uid, 0) + starts
            self.n_events[uid] = self.n_events.get(uid, 0) + len(ts)
            self.last_ts[uid] = int(ts[-1])
        return len(df)

    def flush(self) -> pa.Table:
        uids = sorted(self.n_events)
        return pa.table(
            {
                "user_id": pa.array(uids, pa.int64()),
                "n_sessions": pa.array(
                    [self.n_sessions[u] for u in uids], pa.int64()
                ),
                "n_events": pa.array(
                    [self.n_events[u] for u in uids], pa.int64()
                ),
            }
        )


def streaming_sessionize(
    events_path: str,
    n_microbatches: int = 8,
    n_actors: int = 4,
):
    """Replay the events table as ``n_microbatches`` event-time-ordered
    micro-batches through ``n_actors`` session-state actors; return the
    per-user session aggregate as a Dataset (worker-side blocks).

    Matches ``events_sessionize`` exactly (the D gate query shares its
    oracle)."""
    import pyarrow.dataset as pads

    # micro-batch bounds from footer statistics (no data read)
    lo, hi = _footer_minmax(events_path, "ts")
    lo_us = pa.scalar(lo).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    hi_us = pa.scalar(hi).cast(pa.timestamp("us")).cast(pa.int64()).as_py()
    edges = np.linspace(lo_us, hi_us + 1, n_microbatches + 1).astype(
        np.int64
    )

    actors = [SessionState.remote() for _ in range(n_actors)]

    def route(t: pa.Table, _actors=actors) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        part = (uid % len(_actors)).astype(np.int64)
        acks = []
        for p in np.unique(part):
            sub = t.filter(pa.array(part == p))
            acks.append(_actors[int(p)].push.remote(sub))
        pushed = sum(ray.get(acks)) if acks else 0
        return pa.table({"pushed": pa.array([pushed], pa.int64())})

    for b in range(n_microbatches):
        lo_b, hi_b = int(edges[b]), int(edges[b + 1])
        filt = (
            pads.field("ts")
            >= pa.scalar(lo_b, pa.int64()).cast(pa.timestamp("us"))
        ) & (
            pads.field("ts")
            < pa.scalar(hi_b, pa.int64()).cast(pa.timestamp("us"))
        )
        mb = rd.read_parquet(
            events_path,
            columns=["user_id", "ts", "event_id"],
            filter=filt,
        )
        acked = mb.map_batches(route, batch_format="pyarrow").take_all()
        pushed_b = sum(r["pushed"] for r in acked)
        # watermark barrier: the batch is closed, actors fold in order
        processed = sum(
            ray.get([a.process_batch.remote() for a in actors])
        )
        if processed != pushed_b:
            raise AssertionError(
                f"micro-batch {b}: pushed != processed "
                f"({pushed_b} != {processed})"
            )
    refs = [a.flush.remote() for a in actors]
    return rd.from_arrow_refs(refs)


@ray.remote
class DistinctState:
    """One hash partition of a streaming exact-distinct set.

    Exact per-partition Python set — right for gate-scale keys; at
    10^10 keys swap the set for this repo's sharded cuckoo filter
    (``state/cuckoo.py``, the crawl frontier's URL-seen structure) and
    accept its false-positive rate."""

    def __init__(self) -> None:
        self.seen: set[int] = set()

    def push(self, keys: list[int]) -> int:
        self.seen.update(keys)
        return len(keys)

    def count(self) -> int:
        return len(self.seen)


def streaming_distinct(
    events_path: str,
    col: str = "user_id",
    n_microbatches: int = 6,
    n_actors: int = 4,
) -> int:
    """Replay the events table as micro-batches through hash-partitioned
    distinct-state actors; return the exact global distinct count of
    ``col`` (disjoint partitions sum without double-counting)."""
    import pyarrow.dataset as pads

    actors = [DistinctState.remote() for _ in range(n_actors)]

    def route(t: pa.Table, _actors=actors) -> pa.Table:
        vals = t[col].to_numpy(zero_copy_only=False)
        part = (vals % len(_actors)).astype(np.int64)
        acks = []
        for p in np.unique(part):
            acks.append(
                _actors[int(p)].push.remote(
                    np.unique(vals[part == p]).tolist()
                )
            )
        pushed = sum(ray.get(acks)) if acks else 0
        return pa.table({"pushed": pa.array([pushed], pa.int64())})

    # micro-batch split on the event-id axis (any stable axis works for
    # a distinct count — no ordering contract to preserve); bounds come
    # from footer statistics, no data read
    lo, hi = _footer_minmax(events_path, "event_id")
    edges = np.linspace(int(lo), int(hi) + 1,
                        n_microbatches + 1).astype(np.int64)
    for b in range(n_microbatches):
        filt = (pads.field("event_id") >= int(edges[b])) & (
            pads.field("event_id") < int(edges[b + 1])
        )
        rd.read_parquet(
            events_path, columns=["event_id", col], filter=filt
        ).map_batches(route, batch_format="pyarrow").take_all()
    return int(sum(ray.get([a.count.remote() for a in actors])))
