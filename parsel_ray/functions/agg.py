"""Partial (combiner) aggregation: the at-scale ``groupby`` pattern.

A bare ``ds.groupby(keys).aggregate(...)`` shuffles every row.  For
algebraic aggregates (sum/count/min/max) the right shape at 100 TB is:
combine inside ``map_batches`` (pyarrow ``Table.group_by`` — one output
row per key per batch), then run the global ``groupby`` over the tiny
partials.  The all-to-all exchange then moves |keys|·|batches| rows
instead of |rows|.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
from ray.data.aggregate import Sum


def partial_sum_groupby(
    ds,
    keys: Sequence[str],
    sum_cols: Mapping[str, str],
    count_as: str | None = None,
    out_schema: pa.Schema | None = None,
):
    """``SELECT keys, sum(col) AS out..., count(*) AS count_as GROUP BY keys``
    with per-batch pre-aggregation.

    ``sum_cols`` maps input column → output column name.  Returns a Dataset
    with columns ``keys + list(sum_cols.values()) (+ count_as)``.

    ``out_schema``: Ray's ``groupby().aggregate()`` over an EMPTY (even
    typed-empty) input drops the schema entirely; when the input can be
    all-empty corpus-wide (pair chains), pass the exact output schema
    ``keys + sum outputs (+ count)`` — a typed empty block is unioned so
    downstream joins/selects keep working.  Types must match the
    aggregate's real output (int sums widen to int64).
    """
    keys = list(keys)
    aggs = [(c, "sum") for c in sum_cols]
    if count_as:
        aggs.append(([], "count_all"))

    def partial(t: pa.Table) -> pa.Table:
        # pyarrow handles 0-row tables and keeps the full output schema
        return t.group_by(keys).aggregate(aggs)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    ray_aggs = [Sum(f"{c}_sum", alias_name=out) for c, out in sum_cols.items()]
    if count_as:
        ray_aggs.append(Sum("count_all", alias_name=count_as))
    out = partials.groupby(keys).aggregate(*ray_aggs)
    if out_schema is not None:
        import ray.data as rd

        out = out.union(rd.from_arrow(out_schema.empty_table()))
    return out


def partial_agg_groupby(
    ds,
    keys: Sequence[str],
    specs: Sequence[tuple],
    count_as: str | None = None,
    out_schema: pa.Schema | None = None,
):
    """Generalized combiner groupby for algebraic aggregates.

    ``specs``: (input_col, fn, out_name) with fn ∈ {"sum","min","max"}.
    Per-batch pyarrow pre-aggregation, then a tiny global shuffle.

    ``out_schema``: see :func:`partial_sum_groupby` — required when the
    input can be all-empty corpus-wide and downstream needs the schema.
    """
    from ray.data.aggregate import Max, Min

    keys = list(keys)
    aggs = [(c, f) for c, f, _ in specs]
    if count_as:
        aggs.append(([], "count_all"))

    def partial(t: pa.Table) -> pa.Table:
        return t.group_by(keys).aggregate(aggs)

    partials = ds.map_batches(partial, batch_format="pyarrow")
    merge_cls = {"sum": Sum, "min": Min, "max": Max}
    ray_aggs = [merge_cls[f](f"{c}_{f}", alias_name=out) for c, f, out in specs]
    if count_as:
        ray_aggs.append(Sum("count_all", alias_name=count_as))
    out = partials.groupby(keys).aggregate(*ray_aggs)
    if out_schema is not None:
        import ray.data as rd

        out = out.union(rd.from_arrow(out_schema.empty_table()))
    return out


def exact_quantiles(ds, col: str, qs: Sequence[float]):
    """EXACT distributed quantiles by value histogram: per-batch pyarrow
    value-count combiner → one tiny groupby over (value, n) partials →
    driver cumsum picks rank ``ceil(q·N)`` (DuckDB ``quantile_disc``
    semantics, verified empirically).

    Scale bound (the reason this is exact AND cheap): the shuffled table
    is O(DISTINCT VALUES) — for domain-bounded columns (integer cents of
    a price range, ages, scores) that is fixed by the domain, not the
    corpus, so it stays small at any row count.  Unbounded-domain columns
    need a sketch (t-digest) instead.

    Returns an Arrow table ``(q, value)`` with one row per requested
    quantile — or, with ``return_hist=True``, ``(table, vals, cum)`` so
    callers can reuse the sorted value histogram without a second pass.
    Raises ``ValueError`` on an empty input (quantiles are undefined).
    """
    return _exact_quantiles(ds, col, qs, return_hist=False)


def _exact_quantiles(ds, col: str, qs: Sequence[float], return_hist: bool):
    import numpy as np

    def partial(t: pa.Table) -> pa.Table:
        # drop_null: NULLs are not values (DuckDB quantile_disc semantics —
        # a null group row would also poison the numpy sort below)
        out = (
            t.select([col]).drop_null().group_by([col])
            .aggregate([([], "count_all")])
        )
        return out.rename_columns([col, "n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )  # O(distinct values) rows
    hist = [r for r in hist if r[col] is not None]
    if not hist:
        raise ValueError("exact_quantiles: empty input (no non-null values)")
    vals = np.array([r[col] for r in hist])
    ns = np.array([r["n"] for r in hist], dtype=np.int64)
    order = np.argsort(vals, kind="stable")
    vals, ns = vals[order], ns[order]
    cum = np.cumsum(ns)
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        rank = max(1, int(np.ceil(q * total)))
        idx = int(np.searchsorted(cum, rank, side="left"))
        out_q.append(float(q))
        out_v.append(vals[idx])
    table = pa.table(
        {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v)}
    )
    if return_hist:
        return table, vals, cum
    return table


def grouped_apply(
    ds,
    keys,
    fn,
    num_partitions: int = 64,
    out_schema=None,
):
    """Apply ``fn`` (pandas sub-frame → pandas frame) once per distinct key
    group — but shuffle into only ``num_partitions`` coarse hash partitions
    and run the per-key split as an in-partition pandas ``groupby``.

    ``Dataset.groupby(key).map_groups`` dispatches one task per GROUP; with
    millions of tiny groups (LSH buckets, URL hosts) the per-group overhead
    dominates.  Coarse-partitioning bounds the task count at
    ``num_partitions`` while keeping per-key semantics exact (a key never
    spans partitions: partition = hash(key) % P).

    Contract: key columns must be NON-NULL — the in-partition pandas
    ``groupby`` drops null-keyed rows (SQL's PARTITION BY would give
    them their own group).  Callers joining against a SQL oracle must
    guarantee (or pre-filter) non-null keys.

    ``out_schema`` (pyarrow schema, optional): when ``fn`` can produce
    ZERO rows for every group corpus-wide (pair enumeration, duplicate
    victims), an all-empty result would otherwise drop the dataset's
    schema entirely and break downstream groupbys/joins — pass the
    output schema so empty partitions emit typed empty frames instead.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from .relational import _bucket_of

    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_part(t: pa.Table) -> pa.Table:
        if len(keys) == 1:
            b = _bucket_of(t[keys[0]], num_partitions)
        else:
            h = np.zeros(len(t), dtype=np.uint64)
            for k in keys:
                h = h * np.uint64(1000003) + _bucket_of(
                    t[k], 1 << 30
                ).to_numpy(zero_copy_only=False).astype(np.uint64)
            b = pa.array((h % np.uint64(num_partitions)).astype(np.int32))
        return t.append_column("__part", b)

    def per_partition(t: pa.Table):
        # pyarrow block in, pyarrow block out: the per-key split still
        # runs as a pandas groupby (the UDF contract is pandas), but the
        # EMITTED block is arrow so downstream stages stay zero-copy and
        # Ray's schema unification never sees a PandasBlockSchema.
        g = t.drop(["__part"]).to_pandas()
        outs = [fn(sub) for _, sub in g.groupby(keys, sort=True)]
        outs = [o for o in outs if o is not None and len(o)]
        if not outs:
            if out_schema is not None:
                # a pyarrow empty table KEEPS string/binary types; an
                # empty pandas frame degrades them to object → null on
                # the block conversion (verified)
                return out_schema.empty_table()
            return pd.DataFrame()
        try:
            tabs = [
                o if isinstance(o, pa.Table)
                # strip the b'pandas' schema metadata from_pandas attaches:
                # a schema holding a metadata dict is unhashable and makes
                # Ray log a schema-dedup warning per downstream stage
                else pa.Table.from_pandas(
                    o, preserve_index=False
                ).replace_schema_metadata(None)
                for o in outs
            ]
            out = tabs[0] if len(tabs) == 1 else pa.concat_tables(
                tabs, promote_options="permissive"
            )
            if out_schema is not None and not out.schema.equals(out_schema):
                out = out.select(out_schema.names).cast(out_schema)
            return out
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            # exotic object columns (ragged dicts, mixed cells) that
            # arrow can't infer — keep the pandas block for this site.
            # outs may mix pa.Table and DataFrame (Arrow-returning UDFs);
            # normalize so pd.concat doesn't die on Table elements.
            return pd.concat(
                [o.to_pandas() if isinstance(o, pa.Table) else o
                 for o in outs],
                ignore_index=True,
            )

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    if out_schema is not None:
        # also covers a 0-ROW input (per_partition never runs then — Ray
        # skips empty blocks in map stages, so the in-UDF fallback above
        # can't fire): a same-schema empty union block pins the type
        import ray.data as rd

        out = out.union(rd.from_arrow(out_schema.empty_table()))
    return out


def partitioned_apply_arrow(
    ds,
    keys,
    fn,
    num_partitions: int = 64,
    out_schema=None,
):
    """Arrow-native sibling of :func:`grouped_apply`: the same coarse
    hash partitioning (a key never spans partitions), but ``fn`` receives
    the WHOLE partition as one ``pa.Table`` (``__part`` stripped) and
    handles its key groups itself — typically a ``sort_by`` + numpy
    segment walk.  No per-group pandas frames, no per-group Python
    dispatch, no pandas→arrow block conversions; this is the hot-path
    variant for bodies that reduce to sorted-segment algebra (first-copy
    election, pair enumeration).  Same null-key caveat as
    :func:`grouped_apply` does NOT apply: null keys stay in the
    partition ``fn`` sees (hash of null buckets deterministically)."""
    import pyarrow as pa

    import numpy as np

    from .relational import _bucket_of

    keys = [keys] if isinstance(keys, str) else list(keys)

    def add_part(t: pa.Table) -> pa.Table:
        if len(keys) == 1:
            b = _bucket_of(t[keys[0]], num_partitions)
        else:
            h = np.zeros(len(t), dtype=np.uint64)
            for k in keys:
                h = h * np.uint64(1000003) + _bucket_of(
                    t[k], 1 << 30
                ).to_numpy(zero_copy_only=False).astype(np.uint64)
            b = pa.array((h % np.uint64(num_partitions)).astype(np.int32))
        return t.append_column("__part", b)

    def per_partition(t: pa.Table) -> pa.Table:
        out = fn(t.drop(["__part"]))
        if out is None or len(out) == 0:
            if out_schema is not None:
                return out_schema.empty_table()
            return out if out is not None else t.drop(["__part"]).slice(0, 0)
        if out_schema is not None and not out.schema.equals(out_schema):
            out = out.select(out_schema.names).cast(out_schema)
        return out

    out = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )
    if out_schema is not None:
        import ray.data as rd

        out = out.union(rd.from_arrow(out_schema.empty_table()))
    return out


def grouped_topk(
    ds,
    keys,
    order_by,
    ascending,
    k: int = 1,
    num_partitions: int = 64,
):
    """Distributed per-group top-k (the window-function
    ``row_number() OVER (PARTITION BY keys ORDER BY ...) <= k`` shape).

    Scale shape: a per-BATCH combiner keeps only k rows per key per block
    before the shuffle — the exchange carries O(k * distinct-keys-per-
    block) rows, never the full input — then :func:`grouped_apply`
    re-applies the same top-k per key within coarse hash partitions.
    ``order_by``/``ascending`` must give a TOTAL order (include a unique
    tie-break column) for deterministic output.
    """
    import pandas as pd
    import pyarrow as pa

    keys = [keys] if isinstance(keys, str) else list(keys)
    order_by = [order_by] if isinstance(order_by, str) else list(order_by)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df = df.sort_values(order_by, ascending=ascending, kind="mergesort")
        out = df.groupby(keys, sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_by, ascending=ascending, kind="mergesort")
        return g.head(k)

    return grouped_apply(
        ds.map_batches(combine, batch_format="pyarrow"),
        keys,
        final,
        num_partitions=num_partitions,
    )


def grouped_quantiles(ds, group, col, qs):
    """EXACT per-group quantiles (DuckDB ``quantile_disc`` rank rule,
    ``ceil(q*N)``) via the value-histogram trick of
    :func:`exact_quantiles`, grouped: per-batch (group, value, n)
    combiner -> one keyed sum over O(groups x distinct-values) rows ->
    per-group cumsum rank pick inside :func:`grouped_apply` coarse
    partitions.  Exact and cheap whenever the VALUE domain is bounded
    (the shuffle state is domain-sized, not corpus-sized); unbounded
    domains want a per-group t-digest instead.

    Returns a Dataset with columns ``(group, q, value)``.
    """
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    qs = list(qs)

    def partial(t: pa.Table) -> pa.Table:
        out = (
            t.select([group, col]).drop_null()
            .group_by([group, col]).aggregate([([], "count_all")])
        )
        return out.rename_columns([group, col, "n"])

    hist = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([group, col])
        .aggregate(Sum("n", alias_name="n"))
    )

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col, kind="mergesort")
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        total = int(cum[-1])
        vals = g[col].to_numpy()
        ranks = [max(1, int(np.ceil(q * total))) for q in qs]
        idx = np.searchsorted(cum, ranks, side="left")
        return pd.DataFrame(
            {
                group: g[group].iloc[0],
                "q": np.asarray(qs, dtype=np.float64),
                "value": vals[idx],
            }
        )

    return grouped_apply(hist, group, per_group, num_partitions=16)


def pareto_front(
    ds,
    max_cols,
    num_partitions: int = 16,
):
    """Skyline / Pareto front under MAXIMIZATION of every column in
    ``max_cols``: rows no other row dominates (>= in all dims, > in at
    least one).  Distribution uses the front's associativity — the front
    of a union is contained in the union of the fronts — so each block
    reduces to its local front (a combiner that usually removes almost
    everything), survivors repartition once, and a final single-partition
    pass computes the exact global front.  The final pass sees only
    O(front) candidates, which for real data is tiny; a pathological
    all-incomparable input degrades to one task over all rows, never to
    a wrong answer."""
    import numpy as np
    import pyarrow as pa

    cols = list(max_cols)

    def local_front(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        m = np.column_stack(
            [t[c].to_numpy(zero_copy_only=False) for c in cols]
        ).astype(np.float64)
        keep = _pareto_mask(m)
        return t.filter(pa.array(keep))

    pruned = ds.map_batches(local_front, batch_format="pyarrow")
    # batch_size=None: the global pass must see every survivor at once —
    # default 1024-row slicing would keep rows dominated across slices
    return pruned.repartition(1).map_batches(
        local_front, batch_format="pyarrow", batch_size=None
    )


def _pareto_mask(m: "np.ndarray") -> "np.ndarray":
    """Boolean mask of non-dominated rows (maximize all columns).
    Sort by the first column descending, then each row only needs
    checking against the kept set so far — O(n·front) worst case with
    vectorized inner comparisons."""
    import numpy as np

    n = len(m)
    order = np.lexsort(tuple(m[:, j] for j in range(m.shape[1] - 1, -1, -1)))
    order = order[::-1]  # first col desc, ties by later cols desc
    kept_rows = []
    keep = np.zeros(n, bool)
    for idx in order:
        row = m[idx]
        if kept_rows:
            K = np.vstack(kept_rows)
            dominated = ((K >= row).all(axis=1) & (K > row).any(axis=1)).any()
            if dominated:
                continue
        kept_rows.append(row)
        keep[idx] = True
    return keep


def grouped_ols(
    ds,
    group_cols,
    x_col: str,
    y_col: str,
):
    """Per-group simple linear regression (slope, intercept, n) from
    EXACT integer sufficient statistics: one combiner pass sums
    (n, Σx, Σy, Σxy, Σx²) per group in int64, and the closed form
    ``slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` is evaluated once per
    group as the same IEEE expression a SQL oracle writes — so doubles
    hash-match.

    Overflow contract: x and y fit 31 bits per element (asserted), so
    per-element products fit int64; each per-batch partial sum is
    asserted < 2⁶².  Cross-batch accumulation is EXACT and wrap-free:
    each per-batch partial is split into (hi = v >> 32, lo = v & 2³²−1)
    int64 columns whose global sums stay far below int64 range for any
    realistic partial count (< 2³¹ partials per group), and the finish
    kernel reconstructs the exact integer total hi·2³² + lo in Python
    ints before the single round-to-double — the same value a
    hugeint-summing SQL oracle computes."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    group_cols = list(group_cols)
    LIM = np.int64(1 << 62)
    _MASK = np.int64(0xFFFFFFFF)
    STATS = ("__sx", "__sy", "__sxy", "__sxx")

    def partial(t: pa.Table) -> pa.Table:
        x = t[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = t[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        assert (np.abs(x) < np.int64(1) << 31).all(), "x too large"
        # per-element products x*y must not wrap int64 (they stay < 2^62)
        assert (np.abs(y) < np.int64(1) << 31).all(), "y too large"
        # the in-batch group sums go through a 31-bit pre-split so they
        # can NEVER wrap int64 (a wrapped sum could land back inside the
        # |v| < 2^62 band and pass the post-sum assert silently): each
        # element's hi/lo part is < 2^31, so sums over any batch < 2^31
        # rows stay in range and the reconstructed python-int sum is
        # exact — the 2^62 magnitude contract is then checked EXACTLY
        _LO31 = np.int64((1 << 31) - 1)
        cols = {c: t[c] for c in group_cols}
        cols["__n"] = pa.array(np.ones(len(t), np.int64))
        for name, v in (
            ("__sx", x), ("__sy", y), ("__sxy", x * y), ("__sxx", x * x)
        ):
            # arithmetic >> floors, so v == (v >> 31)*2^31 + (v & lo31)
            # holds for negatives too
            cols[f"{name}_h"] = pa.array(v >> np.int64(31))
            cols[f"{name}_l"] = pa.array(v & _LO31)
        aggs = [("__n", "sum")]
        for c in STATS:
            aggs += [(f"{c}_h", "sum"), (f"{c}_l", "sum")]
        out = pa.table(cols).group_by(group_cols).aggregate(aggs)
        res = {c: out[c] for c in group_cols}
        res["__n"] = out["__n_sum"]
        for c in STATS:
            hi31 = out[f"{c}_h_sum"].to_numpy(zero_copy_only=False)
            lo31 = out[f"{c}_l_sum"].to_numpy(zero_copy_only=False)
            v = hi31.astype(object) * (1 << 31) + lo31.astype(object)
            m = max((abs(int(e)) for e in v), default=0)
            assert m < int(LIM), "sufficient-stat overflow risk"
            vi = v.astype(np.int64)  # exact: |v| < 2^62 proven above
            res[f"{c}_hi"] = pa.array(vi >> 32, pa.int64())
            res[f"{c}_lo"] = pa.array(vi & _MASK, pa.int64())
        return pa.table(res)

    split_cols = {"__n": "__n"}
    for c in STATS:
        split_cols[f"{c}_hi"] = f"{c}_hi"
        split_cols[f"{c}_lo"] = f"{c}_lo"
    sums = partial_sum_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_cols,
        split_cols,
    )

    def _exact(t: pa.Table, c: str) -> np.ndarray:
        hi = t[f"{c}_hi"].to_numpy(zero_copy_only=False).astype(object)
        lo = t[f"{c}_lo"].to_numpy(zero_copy_only=False).astype(object)
        return (hi * (1 << 32) + lo).astype(np.float64)

    def finish(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = _exact(t, "__sx")
        sy = _exact(t, "__sy")
        sxy = _exact(t, "__sxy")
        sxx = _exact(t, "__sxx")
        denom = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / denom
        intercept = (sy - slope * sx) / n
        cols = {c: t[c] for c in group_cols}
        cols["slope"] = pa.array(slope, pa.float64())
        cols["intercept"] = pa.array(intercept, pa.float64())
        cols["n"] = pc.cast(t["__n"], pa.int64())
        return pa.table(cols)

    return sums.map_batches(finish, batch_format="pyarrow")
