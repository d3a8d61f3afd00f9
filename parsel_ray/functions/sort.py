"""Distributed total-order operators: global row_number / ranked export.

The canonical scale shape for "assign every row its global rank":

  1. pick P-1 range bounds on the primary sort key from a fixed-width
     binned histogram (min/max pass + bounded bin counts — O(bins)
     driver state at ANY key cardinality, so hash-valued keys like the
     epoch-shuffle order cost the same as a 4-value flag);
  2. range-partition rows by searchsorted(bounds) inside map_batches
     (bounds broadcast once via the object store);
  3. sort each partition locally (one task per range partition via
     ``grouped_apply`` — a key never spans partitions) and attach the
     within-partition index;
  4. the driver sees only P partition counts and prefix-sums them into
     offsets; a final vectorized map adds offset[pid] + local index.

No stage ever materializes the data on the driver; the all-to-all moves
every row exactly once (the range shuffle), like any distributed sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import (
    grouped_apply,
    partial_agg_groupby,
    partial_sum_groupby,
)


class _EmptyInput(Exception):
    """Range-partition input has no rows (upstream filter emptied it)."""


def _empty_with_col(ds, out_col: str):
    """Empty dataset + the typed output column the operator would add."""
    return ds.map_batches(
        lambda t: t.append_column(
            out_col, pa.array([0] * len(t), pa.int64())
        ),
        batch_format="pyarrow",
    )


def _range_partition(ds, primary: str, asc0: bool, num_partitions: int):
    """Shared scaffolding for the total-order operators: pick P-1 range
    bounds on the primary key from a FIXED-WIDTH binned histogram
    (min/max combiner pass + one bounded bin-count groupby — O(bins)
    driver state regardless of cardinality, so a hash key with N
    distinct values costs the same as a 4-value flag; bounds are a
    balance heuristic only, correctness never depends on them), then
    broadcast the bounds once and attach ``__pid`` (range-partition id,
    order-reversed for a descending primary) to every row.  The input
    is materialized on entry (pinned in the object store, spilling if
    needed): it is consumed by two bound passes plus the shuffle, and
    re-executing an expensive upstream three times loses to one pass at
    every scale.  Raises :class:`_EmptyInput` for an empty dataset —
    each caller defines its own empty output shape — and ``ValueError``
    for a non-empty all-null primary (define null placement explicitly
    before ranking)."""
    import pyarrow.compute as pc
    import ray

    ds = ds.materialize()
    nbins = max(1024, 64 * num_partitions)

    def mm_partial(t: pa.Table) -> pa.Table:
        col = t[primary]
        if len(col) == col.null_count:
            return pa.table({"lo": pa.array([], col.type),
                             "hi": pa.array([], col.type)})
        return pa.table(
            {"lo": pa.array([pc.min(col).as_py()], col.type),
             "hi": pa.array([pc.max(col).as_py()], col.type)}
        )

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").take_all()
    if not mm:  # O(blocks) rows on the driver, not O(rows)
        if ds.count() > 0:
            raise ValueError(
                f"column {primary!r} has no non-null values — rank "
                "null keys explicitly before calling"
            )
        raise _EmptyInput
    lo = min(r["lo"] for r in mm)
    hi = max(r["hi"] for r in mm)

    if hi == lo:
        bounds = np.array([])
    else:
        flo, span = float(lo), float(hi) - float(lo)

        def hist_partial(t: pa.Table) -> pa.Table:
            v = t[primary].drop_null().to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            b = np.clip(((v - flo) / span * nbins).astype(np.int64),
                        0, nbins - 1)
            counts = np.bincount(b, minlength=nbins)
            nz = np.nonzero(counts)[0]
            return pa.table({"bin": pa.array(nz, pa.int64()),
                             "n": pa.array(counts[nz], pa.int64())})

        hist = partial_sum_groupby(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            ["bin"], {"n": "n"},
        ).take_all()  # <= nbins rows
        hist.sort(key=lambda r: r["bin"])
        bins = np.array([r["bin"] for r in hist], dtype=np.int64)
        cum = np.cumsum([r["n"] for r in hist]).astype(np.int64)
        total = int(cum[-1])
        targets = [total * i / num_partitions
                   for i in range(1, num_partitions)]
        picked = [
            flo + (int(bins[int(np.searchsorted(cum, t_, side="left"))])
                   + 1) * span / nbins
            for t_ in targets
        ]
        # float bin-edge bounds: partitioning stays exact (searchsorted
        # on the TRUE key is deterministic per value, so equal keys can
        # never split) — only balance is approximate, to bin width
        bounds = np.unique(np.array(picked, dtype=np.float64))
    bounds_ref = ray.put(bounds)

    def assign_pid(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        if t[primary].null_count:
            # a partially-null key batch would degrade to float64 here
            # (rounding int64 keys > 2^53 across partition bounds) and
            # give nulls input-order-dependent ranks — same contract as
            # the all-null guard above: fail loudly instead
            raise ValueError(
                f"column {primary!r} contains null keys — rank null "
                "keys explicitly before calling"
            )
        key = t[primary].to_numpy(zero_copy_only=False)
        pid = np.searchsorted(b, key, side="right").astype(np.int64)
        if not asc0:  # descending primary: reverse partition order
            pid = len(b) - pid
        return t.append_column("__pid", pa.array(pid, pa.int64()))

    return ds.map_batches(assign_pid, batch_format="pyarrow")


def _local_sorter(order_by, ascending):
    """Stable in-partition sort attaching the 0-based ``__local`` index."""

    def local_sort(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), ascending=list(ascending),
                          kind="mergesort").copy()
        g["__local"] = np.arange(len(g), dtype=np.int64)
        return g

    return local_sort


def global_row_number(
    ds,
    order_by,
    ascending,
    out_col: str = "rank",
    num_partitions: int = 16,
):
    """Attach a 1-based global ``row_number() OVER (ORDER BY ...)`` to
    every row of ``ds``.

    ``order_by[0]`` is the range-partitioning key and must be numeric
    (bounds come from a fixed-width binned histogram — O(bins) state at
    any cardinality); the remaining columns break ties.  The
    full column list must give a TOTAL order (include a unique key) or
    ranks of exact ties are resolved by the local sort's stability.
    """
    import ray

    try:
        withpid = _range_partition(
            ds, order_by[0], bool(ascending[0]), num_partitions
        )
    except _EmptyInput:
        return _empty_with_col(ds, out_col)
    local_sort = _local_sorter(order_by, ascending)

    ranked = grouped_apply(
        withpid, "__pid", local_sort, num_partitions=num_partitions
    ).materialize()

    counts = partial_sum_groupby(
        ranked.map_batches(
            lambda t: t.select(["__pid"]), batch_format="pyarrow"
        ),
        ["__pid"],
        {},
        count_as="n",
    ).take_all()  # P rows
    counts.sort(key=lambda r: r["__pid"])
    offsets = {}
    acc = 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def finalize(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        pid = t["__pid"].to_numpy(zero_copy_only=False)
        local = t["__local"].to_numpy(zero_copy_only=False)
        base = np.array([off[p] for p in np.unique(pid)])
        lut = dict(zip(np.unique(pid), base))
        rank = local + np.vectorize(lut.get, otypes=[np.int64])(pid) + 1
        out = t.drop_columns(["__pid", "__local"])
        return out.append_column(out_col, pa.array(rank, pa.int64()))

    return ranked.map_batches(finalize, batch_format="pyarrow")


def grouped_row_number(
    ds,
    group_col: str,
    order_by,
    ascending,
    out_col: str = "rank",
    num_partitions: int = 16,
):
    """Attach a 1-based ``row_number() OVER (PARTITION BY group ORDER BY
    ...)`` to every row — the per-group variant of
    :func:`global_row_number`, built for LOW-cardinality groups whose
    members are corpus-scale (aspect-ratio buckets, language shards): a
    hot group must never collapse into one task, so rows partition by
    (group, range-of-order-key) cells and only the O(groups ×
    num_partitions) per-cell counts visit the driver to become prefix
    offsets.  ``order_by[0]`` must be numeric (range bounds come from a
    fixed-width binned histogram, so any cardinality is fine); the
    column list must give a total order within each group for
    deterministic ranks.
    """
    import ray

    try:
        withpid = _range_partition(
            ds, order_by[0], bool(ascending[0]), num_partitions
        )
    except _EmptyInput:
        return _empty_with_col(ds, out_col)
    local_sort = _local_sorter(order_by, ascending)

    ranked = grouped_apply(
        withpid, [group_col, "__pid"], local_sort,
        num_partitions=num_partitions,
    ).materialize()

    counts = partial_sum_groupby(
        ranked.map_batches(
            lambda t: t.select([group_col, "__pid"]),
            batch_format="pyarrow",
        ),
        [group_col, "__pid"],
        {},
        count_as="n",
    ).take_all()  # groups × P rows
    counts.sort(key=lambda r: (r[group_col], r["__pid"]))
    offsets, acc, cur = {}, 0, None
    for r in counts:
        if r[group_col] != cur:
            cur, acc = r[group_col], 0
        offsets[(cur, r["__pid"])] = acc
        acc += r["n"]
    off_ref = ray.put(offsets)

    def finalize(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        grp = t[group_col].to_pylist()
        pid = t["__pid"].to_numpy(zero_copy_only=False)
        local = t["__local"].to_numpy(zero_copy_only=False)
        base = np.fromiter(
            (off[(g, p)] for g, p in zip(grp, pid)),
            dtype=np.int64, count=len(t),
        )
        out = t.drop_columns(["__pid", "__local"])
        return out.append_column(
            out_col, pa.array(local + base + 1, pa.int64())
        )

    return ranked.map_batches(finalize, batch_format="pyarrow")


def global_prefix_sum(
    ds,
    order_by,
    ascending,
    val_col: str,
    out_col: str = "prefix",
    num_partitions: int = 16,
):
    """Attach the EXCLUSIVE running sum of ``val_col`` in global
    ``order_by`` order — ``SUM(val) OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING AND 1 PRECEDING)`` — to every row.

    Same scale shape as :func:`global_row_number`: range-partition on
    the numeric primary key (O(bins) fixed-width binned histogram),
    in-partition sort + vectorized cumsum, and only the P per-partition
    TOTALS visit the driver to become broadcast offsets.  The column
    list must give a total order for deterministic results."""
    import ray

    try:
        withpid = _range_partition(
            ds, order_by[0], bool(ascending[0]), num_partitions
        )
    except _EmptyInput:
        return _empty_with_col(ds, out_col)

    def local_scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(list(order_by), ascending=list(ascending),
                          kind="mergesort").copy()
        v = g[val_col].to_numpy().astype(np.int64)
        g["__local"] = np.cumsum(v) - v  # exclusive
        g["__ptotal"] = int(v.sum())
        return g

    scanned = grouped_apply(
        withpid, "__pid", local_scan, num_partitions=num_partitions
    ).materialize()

    totals = partial_agg_groupby(
        scanned.map_batches(
            lambda t: t.select(["__pid", "__ptotal"]).group_by(
                ["__pid"]).aggregate([("__ptotal", "max")]).rename_columns(
                ["__pid", "__ptotal"]),
            batch_format="pyarrow",
        ),
        ["__pid"], [("__ptotal", "max", "total")],
    ).take_all()  # P rows
    totals.sort(key=lambda r: r["__pid"])
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        acc += r["total"]
    off_ref = ray.put(offsets)

    def finalize(t: pa.Table) -> pa.Table:
        off = ray.get(off_ref)
        pid = t["__pid"].to_numpy(zero_copy_only=False)
        local = t["__local"].to_numpy(zero_copy_only=False)
        lut = {p: off[p] for p in np.unique(pid)}
        pre = local + np.vectorize(lut.get, otypes=[np.int64])(pid)
        out = t.drop_columns(["__pid", "__local", "__ptotal"])
        return out.append_column(out_col, pa.array(pre, pa.int64()))

    return scanned.map_batches(finalize, batch_format="pyarrow")
