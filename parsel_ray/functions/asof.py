"""As-of join — a custom operator Ray Data lacks (SURVEY §2.6 "custom
operators" clause): match each left row to the right row with the
greatest right-time ≤ left-time within the same key.

Shape: ONE co-partition shuffle (the same union + ``groupby(bucket)``
pattern as the relational bucket join — a key never spans partitions),
then a fully vectorized per-partition kernel: sort the right side by
(key, time) once, locate each left row's key segment with two
``searchsorted`` calls, and find the within-segment upper bound with a
vectorized bounded binary search (log₂(max-segment) numpy passes).  No
pandas, no per-row Python.

Partitioning assumption (documented per the brief): the join key is the
partition key; per-bucket memory ≈ (|L|+|R|)/buckets — size ``buckets``
accordingly, salt hot keys upstream if one key dominates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_int64(col: "pa.ChunkedArray") -> np.ndarray:
    """Timestamps → int64 (µs); ints pass through."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.int64())
    return col.to_numpy(zero_copy_only=False).astype(np.int64)


def _segmented_upper_bound(times_sorted: np.ndarray, starts: np.ndarray,
                           ends: np.ndarray, queries: np.ndarray,
                           inclusive: bool = True) -> np.ndarray:
    """Per query i: count of elements ≤ (or <, with ``inclusive=False``)
    queries[i] within ``times_sorted[starts[i]:ends[i]]``.  A global
    searchsorted would leak across segments, so run one binary search per
    row — iterative halving, each pass vectorized over all rows."""
    lo = starts.astype(np.int64).copy()
    hi = ends.astype(np.int64).copy()
    cap = max(len(times_sorted) - 1, 0)
    while True:
        active = lo < hi
        if not active.any():
            break
        mid = (lo + hi) // 2
        midv = times_sorted[np.minimum(mid, cap)]
        cond = midv <= queries if inclusive else midv < queries
        go_right = active & cond
        lo = np.where(go_right, mid + 1, lo)
        hi = np.where(active & ~go_right, mid, hi)
    return lo - starts


def asof_join(left, right, on: str, left_time: str, right_time: str,
              right_cols: "list[str]", buckets: int = 32):
    """For every left row: append ``right_cols`` of the right row with the
    greatest ``right_time`` ≤ ``left_time`` and equal ``on`` key (nulls
    when no such row exists).  ``right`` must be unique per
    (on, right_time) — equal-time ties would be nondeterministic; dedupe
    upstream (e.g. keep the max id per key+time)."""
    from .relational import _bucket_of

    _ls = left.schema()
    left_names = list(_ls.names)
    ltypes = dict(zip(_ls.names, _ls.types))
    rschema = right.schema()
    rtypes = dict(zip(rschema.names, rschema.types))

    def tag(is_right: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("__bucket", _bucket_of(t[on], buckets))
            return t.append_column(
                "__right", pa.array(np.full(len(t), is_right), pa.bool_())
            )

        return f

    both = left.map_batches(tag(False), batch_format="pyarrow",
                            batch_size=65536).union(
        right.map_batches(tag(True), batch_format="pyarrow", batch_size=65536)
    )

    def empty_out(g: pa.Table) -> pa.Table:
        cols = {}
        for c in left_names:
            cols[c] = (
                g[c].combine_chunks().slice(0, 0)
                if c in g.column_names
                else pa.array([], ltypes[c])
            )
        t = pa.table(cols)
        for c in right_cols:
            t = t.append_column(c, pa.array([], rtypes[c]))
        return t

    def match(g: pa.Table) -> pa.Table:
        if any(c not in g.column_names for c in left_names):
            return empty_out(g)  # one-sided bucket: right rows only
        mask = g["__right"].combine_chunks()
        lt = g.filter(pc.invert(mask)).select(left_names)
        if len(lt) == 0:
            return empty_out(g)
        have_right = all(
            c in g.column_names for c in {on, right_time, *right_cols}
        )
        rt = (
            g.filter(mask).select(
                list(dict.fromkeys([on, right_time, *right_cols]))
            )
            if have_right
            else None
        )
        if rt is None or len(rt) == 0:
            out = lt
            for c in right_cols:
                out = out.append_column(c, pa.nulls(len(lt), rtypes[c]))
            return out
        lkey = lt[on].to_numpy(zero_copy_only=False).astype(np.int64)
        ltime = _as_int64(lt[left_time])
        rkey = rt[on].to_numpy(zero_copy_only=False).astype(np.int64)
        rtime = _as_int64(rt[right_time])
        order = np.lexsort((rtime, rkey))
        rkey_s, rtime_s = rkey[order], rtime[order]
        starts = np.searchsorted(rkey_s, lkey, side="left")
        ends = np.searchsorted(rkey_s, lkey, side="right")
        n_le = _segmented_upper_bound(rtime_s, starts, ends, ltime)
        ok = n_le > 0
        src = order[np.where(ok, starts + n_le - 1, 0)]
        out = lt
        ok_arr = pa.array(ok)
        for c in right_cols:
            col = rt[c].combine_chunks()
            vals = col.take(pa.array(src, pa.int64()))
            if not ok.all():
                vals = pc.if_else(
                    ok_arr, vals, pa.scalar(None, col.type)
                )
            out = out.append_column(c, vals)
        return out

    return both.groupby("__bucket").map_groups(match, batch_format="pyarrow")


def range_join_count(left, right, on: str, left_time: str, right_time: str,
                     delta_lo: int, delta_hi: int, out_col: str = "n_in_range",
                     buckets: int = 32):
    """RANGE JOIN aggregate (custom operator): for every left row, the
    COUNT of right rows with equal ``on`` key and ``right_time`` in the
    half-open window ``[left_time + delta_lo, left_time + delta_hi)``
    (µs for timestamp columns).  Same co-partition + segmented-binary-
    search shape as :func:`asof_join`; the count is two bound queries per
    row (< hi minus < lo), so the kernel stays O((|L|+|R|) log |R|) per
    partition with no pair materialization — the scale advantage over an
    expand-then-aggregate interval join."""
    from .relational import _bucket_of

    _ls = left.schema()
    left_names = list(_ls.names)
    ltypes = dict(zip(_ls.names, _ls.types))

    def tag(is_right: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("__bucket", _bucket_of(t[on], buckets))
            return t.append_column(
                "__right", pa.array(np.full(len(t), is_right), pa.bool_())
            )

        return f

    both = left.map_batches(tag(False), batch_format="pyarrow",
                            batch_size=65536).union(
        right.map_batches(tag(True), batch_format="pyarrow", batch_size=65536)
    )

    def count(g: pa.Table) -> pa.Table:
        if any(c not in g.column_names for c in left_names):
            cols = {c: pa.array([], ltypes[c]) for c in left_names}
            t = pa.table(cols)
            return t.append_column(out_col, pa.array([], pa.int64()))
        mask = g["__right"].combine_chunks()
        lt = g.filter(pc.invert(mask)).select(left_names)
        if len(lt) == 0:
            return lt.append_column(out_col, pa.array([], pa.int64()))
        lkey = lt[on].to_numpy(zero_copy_only=False).astype(np.int64)
        ltime = _as_int64(lt[left_time])
        have_right = all(c in g.column_names for c in (on, right_time))
        if not have_right:
            return lt.append_column(
                out_col, pa.array(np.zeros(len(lt), np.int64), pa.int64())
            )
        rt = g.filter(mask)
        rkey = rt[on].to_numpy(zero_copy_only=False).astype(np.int64)
        rtime = _as_int64(rt[right_time])
        order = np.lexsort((rtime, rkey))
        rkey_s, rtime_s = rkey[order], rtime[order]
        starts = np.searchsorted(rkey_s, lkey, side="left")
        ends = np.searchsorted(rkey_s, lkey, side="right")
        n_below_hi = _segmented_upper_bound(
            rtime_s, starts, ends, ltime + delta_hi, inclusive=False
        )
        n_below_lo = _segmented_upper_bound(
            rtime_s, starts, ends, ltime + delta_lo, inclusive=False
        )
        return lt.append_column(
            out_col, pa.array(n_below_hi - n_below_lo, pa.int64())
        )

    return both.groupby("__bucket").map_groups(count, batch_format="pyarrow")
