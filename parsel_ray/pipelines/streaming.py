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

import hashlib
import io

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.ipc as _ipc

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
        from ray.data.aggregate import Max, Min

        ds = rd.read_parquet(path, columns=[col])
        row = ds.aggregate(Min(col), Max(col))  # ONE pass, not two scans
        return row[f"min({col})"], row[f"max({col})"]
    return lo, hi



# -- retry-idempotent actor pushes ------------------------------------------
#
# Ray Data may RETRY a map task whose pushes already reached some actors
# (worker death after partial delivery): without dedup the retry
# double-counts rows and silently breaks the exact batch-oracle
# equivalence every streaming entry point asserts.  Each push carries an
# id that is a PURE CONTENT DIGEST of (partition, pushed payload) — no
# task id, no per-task ordinal, no module state.  This works because
# every pushed payload in this module embeds a unique-row-id column
# (event_id / doc_id / c_custkey — each call site names its column), so:
#
#   * a replayed push (task retried on a fresh worker OR re-executed in
#     the same still-alive process — the corner an ordinal-based id
#     cannot cover without an attempt number, which Ray 2.49 does not
#     expose) digests identically and the actor replays the remembered
#     ack instead of re-applying;
#   * two different tasks, or two batches within one task, carry
#     disjoint row ids and can never collide;
#   * there is no shared mutable sequence slot, so interleaved tasks in
#     one process (threaded actor pools) are race-free by construction.
#
# This is deliberately NOT ``sources/partitioned._content_name``'s
# (task id, ordinal, digest) recipe: the sink must give byte-identical
# sub-batches DISTINCT shard names (generic tables have no unique-id
# guarantee), whereas a streaming push WANTS identical content to
# collide — the unique-row-id precondition is what licenses the
# stronger, re-execution-proof scheme here.

_ACK_CAP = 1 << 17  # FIFO-evict remembered acks beyond this (replays
#                     arrive temporally adjacent to their originals, so
#                     eviction after ~131k newer pushes is safe; bounds
#                     actor memory on unbounded streams)


def _push_id(part: int, *payload) -> str:
    """Content-digest push id.  ``payload`` items are pyarrow Tables
    (IPC-serialized — schema included) or array-likes; at least one
    item must carry unique row ids for the dedup contract to hold."""
    h = hashlib.blake2b(digest_size=16)
    h.update(str(part).encode())
    for item in payload:
        if isinstance(item, pa.Table):
            sink = io.BytesIO()
            with _ipc.new_stream(sink, item.schema) as w:
                w.write_table(item)
            h.update(sink.getvalue())
        else:
            arr = np.asarray(item)
            if arr.dtype == object:
                for s in arr.tolist():
                    h.update(str(s).encode())
                    h.update(b"\x1f")
            else:
                h.update(arr.dtype.str.encode())
                h.update(arr.tobytes())
        h.update(b"\x1e")
    return h.hexdigest()


def _idempotent_push(actor, push_id, apply_fn) -> int:
    acks = getattr(actor, "_push_acks", None)
    if acks is None:
        acks = actor._push_acks = {}
    if push_id is not None and push_id in acks:
        return acks[push_id]
    n = apply_fn()
    if push_id is not None:
        acks[push_id] = n
        if len(acks) > _ACK_CAP:
            acks.pop(next(iter(acks)))
    return n


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

    def push(self, table: pa.Table, push_id=None) -> int:
        def _do():
            self.buffer.append(table)
            return len(table)

        return _idempotent_push(self, push_id, _do)

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
            # unique row id for the dedup contract: event_id (in sub)
            acks.append(
                _actors[int(p)].push.remote(sub, _push_id(int(p), sub))
            )
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

    def push(self, keys: list[int], push_id=None) -> int:
        # set.update is idempotent by construction — replayed pushes are
        # harmless, so callers skip the dedup id (pure overhead here)
        def _do():
            self.seen.update(keys)
            return len(keys)

        return _idempotent_push(self, push_id, _do)

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


@ray.remote
class WindowState:
    """One hash partition of event-time tumbling windows under a
    watermark: open windows accumulate (n, value_cents); once the
    GLOBAL watermark (max event time seen, minus allowed lateness)
    passes a window's end, the window FINALIZES — later arrivals for it
    are counted as late-dropped, the standard watermark contract."""

    def __init__(self) -> None:
        self.open: dict[tuple, list] = {}   # (type, hour_us) -> [n, cents]
        self.final: dict[tuple, list] = {}
        self.late_dropped = 0

    def push(self, table: pa.Table, push_id=None) -> int:
        return _idempotent_push(self, push_id, lambda: self._push_impl(table))

    def _push_impl(self, table: pa.Table) -> int:
        import pyarrow.compute as pc

        hour = (
            pc.floor_temporal(
                table["ts"].cast(pa.timestamp("us")), unit="hour"
            )
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        from .queries import _cents

        cents = np.asarray(_cents(table["value"]), np.int64)
        types = table["event_type"].to_pylist()
        for ty, h, c in zip(types, hour, cents):
            key = (ty, int(h))
            if key in self.final:
                self.late_dropped += 1
                continue
            slot = self.open.setdefault(key, [0, 0])
            slot[0] += 1
            slot[1] += int(c)
        return len(table)

    def advance_watermark(self, watermark_us: int) -> int:
        """Finalize every open window whose END (hour start + 1h) is at
        or before the watermark; returns how many finalized."""
        hour_us = 3_600_000_000
        done = [k for k in self.open if k[1] + hour_us <= watermark_us]
        for k in done:
            self.final[k] = self.open.pop(k)
        return len(done)

    def flush(self) -> pa.Table:
        for k, v in self.open.items():
            self.final[k] = v
        self.open = {}
        keys = sorted(self.final)
        return pa.table(
            {
                "event_type": pa.array([k[0] for k in keys], pa.string()),
                "hour": pa.array(
                    [k[1] for k in keys], pa.timestamp("us")
                ),
                "n": pa.array(
                    [self.final[k][0] for k in keys], pa.int64()
                ),
                "sum_value_cents": pa.array(
                    [self.final[k][1] for k in keys], pa.int64()
                ),
            }
        )

    def stats(self) -> tuple:
        return (self.late_dropped, len(self.final), len(self.open))


def streaming_hourly_counts(
    events_path: str,
    n_microbatches: int = 6,
    n_actors: int = 4,
    allowed_lateness_us: "int | None" = None,
):
    """Event-time tumbling hourly counts under a watermark, replaying
    the table in ARRIVAL order (event_id ranges — deliberately
    uncorrelated with event time, so rows genuinely arrive out of
    event-time order across micro-batches).

    After each micro-batch the driver folds per-actor max-event-time
    scalars into the global watermark; with finite
    ``allowed_lateness_us`` windows finalize as the watermark passes
    and later arrivals drop (counted).  With ``None`` (unbounded
    lateness) nothing finalizes early and the result matches the batch
    ``events_hourly`` EXACTLY — that equivalence is the gate.

    Returns ``(Dataset, late_dropped_total)``.
    """
    import pyarrow.dataset as pads

    actors = [WindowState.remote() for _ in range(n_actors)]

    def route(t: pa.Table, _actors=actors) -> pa.Table:
        hour = (
            t["ts"].cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        part = ((hour // 3_600_000_000) % len(_actors)).astype(np.int64)
        acks = []
        for p in np.unique(part):
            sub = t.filter(pa.array(part == p))
            # unique row id for the dedup contract: event_id (in sub)
            acks.append(
                _actors[int(p)].push.remote(sub, _push_id(int(p), sub))
            )
        pushed = sum(ray.get(acks)) if acks else 0
        mx = int(hour.max()) if len(hour) else 0
        return pa.table(
            {
                "pushed": pa.array([pushed], pa.int64()),
                "max_ts": pa.array([mx], pa.int64()),
            }
        )

    lo, hi = _footer_minmax(events_path, "event_id")
    edges = np.linspace(int(lo), int(hi) + 1,
                        n_microbatches + 1).astype(np.int64)
    watermark = -1
    for b in range(n_microbatches):
        filt = (pads.field("event_id") >= int(edges[b])) & (
            pads.field("event_id") < int(edges[b + 1])
        )
        acked = (
            rd.read_parquet(
                events_path,
                columns=["event_id", "ts", "event_type", "value"],
                filter=filt,
            )
            .map_batches(route, batch_format="pyarrow")
            .take_all()
        )
        if allowed_lateness_us is not None and acked:
            watermark = max(
                watermark, max(r["max_ts"] for r in acked)
            ) 
            ray.get(
                [
                    a.advance_watermark.remote(
                        watermark - allowed_lateness_us
                    )
                    for a in actors
                ]
            )
    refs = [a.flush.remote() for a in actors]
    dropped = sum(s[0] for s in ray.get([a.stats.remote() for a in actors]))
    return rd.from_arrow_refs(refs), dropped


@ray.remote
class EnrichState:
    """One hash partition of a dimension table (key → attribute) plus the
    running per-attribute aggregate of the enriched stream — the
    stream-table-join building block (dimension loads once into actor
    state; event micro-batches route by key and fold in place, so
    enriched rows never travel).  Lookups are vectorized: the dimension
    freezes into sorted key + factorized-attribute arrays on first push,
    then each push is one searchsorted + two np.add.at folds."""

    def __init__(self) -> None:
        self._keys: list = []
        self._vals: list = []
        self._frozen = None
        self.unmatched = 0

    def load_dim(self, keys, vals, push_id=None) -> int:
        # idempotent like push: a retried load task re-sends the same
        # (unique c_custkey) content, so a remembered ack replays instead
        # of double-loading — or, post-freeze, instead of tripping the
        # frozen assert (which remains a real invariant for NEW loads)
        def _do():
            assert self._frozen is None, "dimension already frozen"
            self._keys.extend(keys)
            self._vals.extend(vals)
            return len(keys)

        return _idempotent_push(self, push_id, _do)

    def _freeze(self):
        keys = np.asarray(self._keys, np.int64)
        order = np.argsort(keys, kind="stable")
        cats, codes = np.unique(
            np.asarray(self._vals, object)[order], return_inverse=True
        )
        self._frozen = (
            keys[order],
            codes.astype(np.int64),
            [str(c) for c in cats],
            np.zeros(len(cats), np.int64),   # n per attribute
            np.zeros(len(cats), np.int64),   # cents per attribute
        )

    def push(self, keys, cents, push_id=None) -> int:
        return _idempotent_push(
            self, push_id, lambda: self._push_impl(keys, cents)
        )

    def _push_impl(self, keys, cents) -> int:
        if self._frozen is None:
            self._freeze()
        dk, codes, _cats, agg_n, agg_c = self._frozen
        keys = np.asarray(keys, np.int64)
        cents = np.asarray(cents, np.int64)
        idx = np.searchsorted(dk, keys)
        ok = (idx < dk.size) & (dk[np.minimum(idx, dk.size - 1)] == keys)
        self.unmatched += int((~ok).sum())
        code = codes[idx[ok]]
        np.add.at(agg_n, code, 1)
        np.add.at(agg_c, code, cents[ok])
        return int(keys.size)

    def result(self):
        if self._frozen is None:
            self._freeze()
        _dk, _codes, cats, agg_n, agg_c = self._frozen
        return (
            [(c, int(n), int(s)) for c, n, s in zip(cats, agg_n, agg_c)
             if n],
            self.unmatched,
        )


def streaming_enrich(
    events_path: str,
    customer_path: str,
    n_microbatches: int = 6,
    n_actors: int = 4,
):
    """Stream-table join: the customer dimension hash-partitions into
    ``EnrichState`` actors (loaded worker-side, the driver sees acks),
    then the events table replays as event-id micro-batches; each batch
    routes (key = user_id % |customer| + 1, cents) to the actor owning
    that key partition.  Returns (c_mktsegment, n_events,
    sum_value_cents) — exactly a batch join+groupby, which is the DuckDB
    oracle of the gate query.  Raises if any event misses the dimension
    (referential integrity by construction of the key)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    n_cust = pq.ParquetFile(customer_path).metadata.num_rows
    actors = [EnrichState.remote() for _ in range(n_actors)]

    def load(t: pa.Table, _actors=actors) -> pa.Table:
        k = t["c_custkey"].to_numpy(zero_copy_only=False)
        v = t["c_mktsegment"].to_pylist()
        part = (k % len(_actors)).astype(np.int64)
        acks = [
            _actors[int(p)].load_dim.remote(
                k[part == p].tolist(),
                [v[i] for i in np.nonzero(part == p)[0]],
                # unique row id for the dedup contract: c_custkey
                _push_id(int(p), k[part == p]),
            )
            for p in np.unique(part)
        ]
        return pa.table(
            {"loaded": pa.array([sum(ray.get(acks)) if acks else 0],
                                pa.int64())}
        )

    rd.read_parquet(
        customer_path, columns=["c_custkey", "c_mktsegment"]
    ).map_batches(load, batch_format="pyarrow").take_all()

    def route(t: pa.Table, _actors=actors) -> pa.Table:
        from .queries import _cents

        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        key = uid % n_cust + 1
        cents = np.asarray(_cents(t["value"]), np.int64)
        part = (key % len(_actors)).astype(np.int64)
        acks = [
            _actors[int(p)].push.remote(
                key[part == p].tolist(), cents[part == p].tolist(),
                # unique row id for the dedup contract: event_id
                _push_id(int(p), eid[part == p], key[part == p],
                         cents[part == p]),
            )
            for p in np.unique(part)
        ]
        return pa.table(
            {"pushed": pa.array([sum(ray.get(acks)) if acks else 0],
                                pa.int64())}
        )

    lo, hi = _footer_minmax(events_path, "event_id")
    edges = np.linspace(int(lo), int(hi) + 1,
                        n_microbatches + 1).astype(np.int64)
    for b in range(n_microbatches):
        filt = (pads.field("event_id") >= int(edges[b])) & (
            pads.field("event_id") < int(edges[b + 1])
        )
        rd.read_parquet(
            events_path, columns=["event_id", "user_id", "value"],
            filter=filt,
        ).map_batches(route, batch_format="pyarrow").take_all()

    rows, unmatched = [], 0
    for part, miss in ray.get([a.result.remote() for a in actors]):
        rows.extend(part)
        unmatched += miss
    if unmatched:
        raise ValueError(f"{unmatched} events missed the dimension")
    agg: dict = {}
    for seg, n, c in rows:
        cur = agg.setdefault(seg, [0, 0])
        cur[0] += n
        cur[1] += c
    segs = sorted(agg)
    return pa.table(
        {
            "c_mktsegment": pa.array(segs, pa.string()),
            "n_events": pa.array([agg[s][0] for s in segs], pa.int64()),
            "sum_value_cents": pa.array(
                [agg[s][1] for s in segs], pa.int64()
            ),
        }
    )


@ray.remote
class HeavyHitterState:
    """One hash partition of a streaming Misra-Gries heavy-hitters
    sketch.  Items route by content hash, so an actor sees EVERY
    occurrence of its items; the MG retention guarantee then holds
    per partition with a SMALLER substream length, which only helps —
    a globally heavy item (true > phi*N >= N/(k+1) >= n_a/(k+1)) is
    always retained by its owning actor."""

    def __init__(self, k: int) -> None:
        from ..functions.sketch import MisraGries

        self.mg = MisraGries(k)

    def push(self, items, ns, push_id=None) -> int:
        def _do():
            self.mg.add_exact_counts(items, ns)
            return len(items)

        return _idempotent_push(self, push_id, _do)

    def result(self):
        return (
            list(self.mg.counts.index),
            [int(x) for x in self.mg.counts.to_numpy()],
            int(self.mg.n),
        )


def streaming_heavy_terms(
    docs_path: str,
    phi: float = 0.001,
    k: int = 4096,
    n_microbatches: int = 6,
    n_actors: int = 4,
):
    """Streaming exact heavy hitters: the document stream replays as
    micro-batches; each batch's exact per-batch term counts route by
    term hash to partitioned :class:`HeavyHitterState` actors (state
    never leaves the workers); after end-of-stream the union of retained
    items is a COMPLETE candidate set (per-partition MG guarantee), and
    one exact recount pass over the table filters to the true
    ``count > phi * N`` set — identical to the batch two-pass
    ``doc_heavy_terms`` and its DuckDB oracle."""
    import hashlib

    import pyarrow.dataset as pads

    from ..functions.agg import partial_sum_groupby
    from ..functions.text import term_counts

    assert phi >= 1.0 / (k + 1), "k too small for the MG guarantee"
    actors = [HeavyHitterState.remote(k) for _ in range(n_actors)]

    def route(t: pa.Table, _actors=actors) -> pa.Table:
        items, ns = term_counts(t)
        if len(items) == 0:
            return pa.table({"pushed": pa.array([0], pa.int64())})
        part = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(s.encode(), digest_size=4).digest(),
                    "little",
                ) % len(_actors)
                for s in items
            ),
            dtype=np.int64, count=len(items),
        )
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
        acks = [
            _actors[int(p)].push.remote(
                items[part == p].tolist(),
                np.asarray(ns)[part == p].tolist(),
                # unique row ids for the dedup contract: the batch's
                # doc_id set (items are per-batch term aggregates)
                _push_id(int(p), doc_ids, items[part == p],
                         np.asarray(ns)[part == p]),
            )
            for p in np.unique(part)
        ]
        return pa.table(
            {"pushed": pa.array([sum(ray.get(acks)) if acks else 0],
                                pa.int64())}
        )

    lo, hi = _footer_minmax(docs_path, "doc_id")
    edges = np.linspace(int(lo), int(hi) + 1,
                        n_microbatches + 1).astype(np.int64)
    for b in range(n_microbatches):
        filt = (pads.field("doc_id") >= int(edges[b])) & (
            pads.field("doc_id") < int(edges[b + 1])
        )
        rd.read_parquet(
            docs_path, columns=["doc_id", "text"], filter=filt
        ).map_batches(route, batch_format="pyarrow").take_all()

    cand: set = set()
    total_n = 0
    for items, _counts, n_a in ray.get([a.result.remote() for a in actors]):
        cand.update(items)
        total_n += n_a
    thr = phi * total_n
    cand = frozenset(cand)

    def count_candidates(t: pa.Table) -> pa.Table:
        items, ns = term_counts(t)
        keep = np.fromiter((i in cand for i in items), dtype=bool,
                           count=len(items))
        return pa.table(
            {
                "term": pa.array(items[keep].tolist(), pa.string()),
                "n": pa.array(np.asarray(ns)[keep], pa.int64()),
            }
        )

    import pyarrow.compute as pc

    exact = partial_sum_groupby(
        rd.read_parquet(docs_path, columns=["text"]).map_batches(
            count_candidates, batch_format="pyarrow"
        ),
        ["term"], {"n": "n"},
    )
    return exact.map_batches(
        lambda t: t.filter(pc.greater(t["n"], thr)),
        batch_format="pyarrow",
    )
