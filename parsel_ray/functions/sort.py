"""Distributed total-order operators: global row_number / ranked export.

The canonical scale shape for "assign every row its global rank":

  1. pick P-1 range bounds on the primary sort key (here from the exact
     value histogram — O(distinct) shuffle state, same contract as
     ``exact_quantiles``; a t-digest swap-in serves unbounded domains);
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
    _exact_quantiles,
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
    bounds on the primary key from the exact value histogram
    (O(distinct) shuffle state — balance heuristic only, correctness
    never depends on the bounds), broadcast them once, and attach
    ``__pid`` (range-partition id, order-reversed for a descending
    primary) to every row.  Raises :class:`_EmptyInput` for an empty
    dataset — each caller defines its own empty output shape — and
    ``ValueError`` for a non-empty all-null primary (define null
    placement explicitly before ranking)."""
    import ray

    qs = [i / num_partitions for i in range(1, num_partitions)]
    try:
        _, vals, _cum = _exact_quantiles(ds, primary, qs, return_hist=True)
    except ValueError:
        if ds.count() > 0:
            raise ValueError(
                f"column {primary!r} has no non-null values — rank "
                "null keys explicitly before calling"
            )
        raise _EmptyInput
    idxs = np.linspace(1, len(vals) - 1, num_partitions - 1).astype(int) \
        if len(vals) > 1 else np.array([], dtype=int)
    bounds = np.unique(vals[idxs]) if len(idxs) else np.array([])
    bounds_ref = ray.put(bounds)

    def assign_pid(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
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
    with a domain-bounded distinct-value set (the bound-picking
    histogram is O(distinct)); the remaining columns break ties.  The
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
    offsets.  ``order_by[0]`` must be numeric with a domain-bounded
    distinct-value set; the column list must give a total order within
    each group for deterministic ranks.
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
    the numeric primary key (O(distinct) bound-picking histogram),
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
