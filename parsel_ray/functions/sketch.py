"""Mergeable quantile sketch (t-digest, Dunning & Ertl) — the
unbounded-domain complement to :func:`parsel_ray.functions.agg.
exact_quantiles` (whose histogram state is only small for domain-bounded
values).  A t-digest is O(δ) centroids regardless of row count or value
domain, merges associatively (map_batches partials → task-tree merge,
same shape as the Bloom build), and bounds RANK error — tightest at the
tails — rather than value error.

Public literature: Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests" (2019).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


class TDigest:
    """Centroid-list t-digest with the k₁ (arcsine) scale function."""

    __slots__ = ("delta", "means", "weights")

    def __init__(self, delta: int = 200) -> None:
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)

    # -- build -------------------------------------------------------------

    def add_many(self, values: np.ndarray) -> "TDigest":
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if len(values):
            self.means = np.concatenate([self.means, values])
            self.weights = np.concatenate(
                [self.weights, np.ones(len(values))]
            )
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return self.delta / (2 * np.pi) * np.arcsin(2 * np.clip(q, 0, 1) - 1)

    def _compress(self) -> None:
        """Ertl-style merging pass, FULLY VECTORIZED (no per-value Python
        loop): sort by mean, map each point's mid-quantile through the k₁
        scale, bucket by floor(k), and collapse each bucket to its
        weighted mean with ``np.add.reduceat``."""
        if len(self.means) <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2.0) / total
        bucket = np.floor(self._k(q_mid)).astype(np.int64)
        # reduceat over bucket-change boundaries
        starts = np.flatnonzero(np.r_[True, np.diff(bucket) != 0])
        wsum = np.add.reduceat(w, starts)
        msum = np.add.reduceat(m * w, starts)
        self.means = msum / wsum
        self.weights = wsum

    # -- query -------------------------------------------------------------

    def quantile(self, q: float) -> float:
        if len(self.means) == 0:
            return float("nan")
        if len(self.means) == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid midpoints in cumulative-weight space
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        i = int(np.searchsorted(cum, target)) - 1
        frac = (target - cum[i]) / (cum[i + 1] - cum[i])
        return float(self.means[i] + frac * (self.means[i + 1] - self.means[i]))

    # -- (de)serialization for plasma/arrow --------------------------------

    def to_bytes(self) -> bytes:
        return np.concatenate([self.means, self.weights]).tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, delta: int = 200) -> "TDigest":
        arr = np.frombuffer(data, dtype=np.float64)
        td = cls(delta)
        n = len(arr) // 2
        td.means = arr[:n].copy()
        td.weights = arr[n:].copy()
        return td


def build_tdigest(ds, col: str, delta: int = 200):
    """Distributed t-digest: per-batch partial digests in ``map_batches``,
    reduced inside the Dataset (fan-in 256) until driver-scale, then
    merged by a tree of Ray tasks (no driver pass over values).  Returns
    the final :class:`TDigest`."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        td = TDigest(delta)
        td.add_many(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"__td": pa.array([td.to_bytes()], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["__td"].to_pylist():
            d = TDigest.from_bytes(b, delta)
            acc = d if acc is None else acc.merge(d)
        if acc is None:
            return t
        return pa.table({"__td": pa.array([acc.to_bytes()], pa.binary())})

    parts = _reduce_sketch_rows(
        ds.map_batches(partial, batch_format="pyarrow"), "__td", merge_batch
    )
    if not parts:
        return TDigest(delta)

    @ray.remote
    def merge_two(a: bytes, b: bytes, d: int) -> bytes:
        return TDigest.from_bytes(a, d).merge(TDigest.from_bytes(b, d)).to_bytes()

    refs = [ray.put(p["__td"]) for p in parts]
    while len(refs) > 1:
        refs = [
            merge_two.remote(refs[i], refs[i + 1], delta)
            if i + 1 < len(refs)
            else refs[i]
            for i in range(0, len(refs), 2)
        ]
    return TDigest.from_bytes(ray.get(refs[0]), delta)


# ---------------------------------------------------------------------------
# HyperLogLog count-distinct sketch
# ---------------------------------------------------------------------------


def _hash64(col) -> np.ndarray:
    """Vectorized stable 64-bit hash of an int/string column (uint64).

    Integers go through the splitmix64 finalizer (full avalanche — HLL
    consumes the HIGH bits for the register index and counts leading
    zeros of the rest, so weak low-bit mixes are not enough).  Strings
    hash via polars' vectorized row hash, FNV fallback without it.
    Stable within one run, which is all a sketch needs."""
    if pa.types.is_integer(col.type):
        z = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))
    from .relational import _hash_strings

    return _hash_strings(col)


def _rho_and_index(h: np.ndarray, p: int):
    """(register index, rank) for each uint64 hash — the HLL kernel
    shared by the global and per-group paths.  rho = leading zeros
    within the (64-p)-bit window + 1; floor(log2(v)) exactly via frexp
    on float64 (rest < 2**50 is exactly representable for p >= 14; for
    smaller p the 2**53 float mantissa still covers the window because
    ranks only matter near the top bits)."""
    w = np.uint64(64 - p)
    idx = (h >> w).astype(np.int64)
    rest = h & ((np.uint64(1) << w) - np.uint64(1))
    rho = np.empty(len(rest), dtype=np.uint8)
    nz = rest != 0
    _, e = np.frexp(rest[nz].astype(np.float64))
    rho[nz] = (int(w) - (e - 1)).astype(np.uint8)
    rho[~nz] = np.uint8(int(w) + 1)
    return idx, rho


class HyperLogLog:
    """Flajolet et al. HLL: ``m = 2**p`` one-byte registers, each the max
    leading-zero rank seen in its substream — O(m) state regardless of
    cardinality, merges by elementwise max (associative + idempotent, so
    task-tree merging and at-least-once batch delivery are both safe).
    Standard error ≈ 1.04/sqrt(m) (p=14 → ~0.8%).

    Public literature: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog:
    the analysis of a near-optimal cardinality estimation algorithm"
    (2007); small-range correction per the original paper."""

    __slots__ = ("p", "registers")

    def __init__(self, p: int = 14) -> None:
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.registers = np.zeros(1 << p, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HyperLogLog":
        """Fold a uint64 hash array in, fully vectorized."""
        idx, rho = _rho_and_index(h, self.p)
        np.maximum.at(self.registers, idx, rho)
        return self

    def add_column(self, col) -> "HyperLogLog":
        col = col.drop_null()  # COUNT(DISTINCT) semantics: nulls are not
        # values (and NaN from a null-int to_numpy would hash undefined)
        if len(col):
            self.add_hashes(_hash64(col))
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("cannot merge HLLs of different precision")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.ldexp(1.0, -self.registers.astype(np.int64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * math.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        hll = cls(data[0])
        hll.registers = np.frombuffer(data[1:], dtype=np.uint8).copy()
        return hll


def _reduce_sketch_rows(parts, col: str, merge_batch, fanin: int = 256,
                        max_driver_rows: int = 4096):
    """Collapse a Dataset of one-sketch-per-row partials INSIDE the
    Dataset (map_batches merges ``fanin`` rows -> 1) until few enough
    rows remain to take_all — at corpus scale the per-batch partials
    are millions of rows; the driver must only ever see O(fanin)."""
    parts = parts.materialize()  # sketch rows only (bytes per batch),
    # never input data — count() and any further level must not re-run
    # the full input scan
    while True:
        n = parts.count()
        if n <= max_driver_rows:
            return parts.take_all()
        parts = parts.repartition(
            max(1, n // fanin)
        ).map_batches(merge_batch, batch_format="pyarrow").materialize()


def build_hll(ds, col: str, p: int = 14):
    """Distributed count-distinct: per-batch partial HLLs in
    ``map_batches`` (one 16 KiB register array per batch leaves each
    task — never the values), reduced INSIDE the Dataset (fan-in 256)
    until driver-scale, then task-tree merged.  Returns the final
    :class:`HyperLogLog`."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        hll = HyperLogLog(p)
        hll.add_column(t[col])
        return pa.table({"__hll": pa.array([hll.to_bytes()], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["__hll"].to_pylist():
            h = HyperLogLog.from_bytes(b)
            acc = h if acc is None else acc.merge(h)
        if acc is None:
            return t
        return pa.table({"__hll": pa.array([acc.to_bytes()], pa.binary())})

    parts = _reduce_sketch_rows(
        ds.map_batches(partial, batch_format="pyarrow"), "__hll", merge_batch
    )
    if not parts:
        return HyperLogLog(p)

    @ray.remote
    def merge_two(a: bytes, b: bytes) -> bytes:
        return HyperLogLog.from_bytes(a).merge(HyperLogLog.from_bytes(b)).to_bytes()

    refs = [ray.put(r["__hll"]) for r in parts]
    while len(refs) > 1:
        refs = [
            merge_two.remote(refs[i], refs[i + 1])
            if i + 1 < len(refs)
            else refs[i]
            for i in range(0, len(refs), 2)
        ]
    return HyperLogLog.from_bytes(ray.get(refs[0]))


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitters sketch (mergeable)
# ---------------------------------------------------------------------------


class MisraGries:
    """Mergeable Misra-Gries frequency sketch with ``k`` counters.

    Guarantee (Agarwal et al., "Mergeable Summaries", PODS 2012): after
    any sequence of adds and merges over a stream of total length ``n``,
    every retained estimate satisfies ``true - n/(k+1) <= est <= true``,
    and every item with true frequency > ``n/(k+1)`` is retained.  So a
    two-pass heavy-hitters (sketch -> candidate recount) is EXACT for
    any threshold >= n/(k+1).

    State is a pandas int64 Series indexed by item (<= k entries) — all
    fold/merge/trim work is vectorized (index-aligned add, npartition
    for the (k+1)-th largest), no per-item Python loop."""

    __slots__ = ("k", "counts", "n")

    def __init__(self, k: int) -> None:
        import pandas as pd

        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counts = pd.Series(dtype=np.int64)
        self.n = 0

    def add_exact_counts(self, items, ns) -> "MisraGries":
        """Fold a (item, exact-count) summary of a batch in."""
        import pandas as pd

        other = pd.Series(np.asarray(ns, dtype=np.int64), index=items)
        self.counts = self.counts.add(other, fill_value=0).astype(np.int64)
        self.n += int(other.sum())
        return self._trim()

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("cannot merge MG sketches of different k")
        self.counts = self.counts.add(other.counts, fill_value=0).astype(
            np.int64
        )
        self.n += other.n
        return self._trim()

    def _trim(self) -> "MisraGries":
        extra = len(self.counts) - self.k
        if extra > 0:
            v = self.counts.to_numpy()
            # (k+1)-th largest = the largest of the `extra` smallest
            sub = np.partition(v, extra - 1)[extra - 1]
            self.counts = self.counts[self.counts > sub] - sub
        return self

    def candidates(self, threshold: float) -> list:
        """Items possibly exceeding ``threshold`` true occurrences: est
        is an undercount by at most n/(k+1), so prune anything whose
        est + n/(k+1) still falls short."""
        bound = self.counts.to_numpy() + self.n / (self.k + 1)
        return list(self.counts.index[bound > threshold])

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "item": pa.array(self.counts.index.tolist()),
                "est": pa.array(self.counts.to_numpy(), pa.int64()),
                "n": pa.array([self.n] * len(self.counts), pa.int64()),
            }
        )


def build_misra_gries(ds, k: int, count_fn):
    """Distributed MG build: ``count_fn(pa.Table) -> (items, ns)`` gives
    each batch's EXACT item counts (the best per-batch summary); partials
    are <= k counters each and merge by a task tree.  Returns the final
    :class:`MisraGries`."""
    import pickle

    import ray

    def partial(t: pa.Table) -> pa.Table:
        mg = MisraGries(k)
        items, ns = count_fn(t)
        if len(items):
            mg.add_exact_counts(items, ns)
        return pa.table({"__mg": pa.array([pickle.dumps(mg)], pa.binary())})

    def merge_batch(t: pa.Table) -> pa.Table:
        acc = None
        for b in t["__mg"].to_pylist():
            m = pickle.loads(b)
            acc = m if acc is None else acc.merge(m)
        if acc is None:
            return t
        return pa.table({"__mg": pa.array([pickle.dumps(acc)], pa.binary())})

    parts = _reduce_sketch_rows(
        ds.map_batches(partial, batch_format="pyarrow"), "__mg", merge_batch
    )
    if not parts:
        return MisraGries(k)

    @ray.remote
    def merge_two(a: bytes, b: bytes) -> bytes:
        return pickle.dumps(pickle.loads(a).merge(pickle.loads(b)))

    refs = [ray.put(r["__mg"]) for r in parts]
    while len(refs) > 1:
        refs = [
            merge_two.remote(refs[i], refs[i + 1])
            if i + 1 < len(refs)
            else refs[i]
            for i in range(0, len(refs), 2)
        ]
    return pickle.loads(ray.get(refs[0]))


def grouped_hll_partials(t: pa.Table, group: str, col: str, p: int):
    """One (group, registers) row per distinct group in the batch,
    fully vectorized: a single ``np.maximum.at`` scatter into a
    (n_groups x m) register matrix — no per-group Python loop.
    Null-group rows are excluded (the same contract as the pandas
    ``groupby(dropna=True)`` the exact path uses)."""
    import pandas as pd

    if len(t) == 0:
        return pa.table(
            {group: pa.array([], t.schema.field(group).type),
             "__regs": pa.array([], pa.binary())}
        )
    t = t.filter(pc.is_valid(t[col]))  # nulls are not values
    if len(t) == 0:
        return pa.table(
            {group: pa.array([], t.schema.field(group).type),
             "__regs": pa.array([], pa.binary())}
        )
    h = _hash64(t[col])
    codes, uniques = pd.factorize(
        pd.Series(t[group].to_numpy(zero_copy_only=False)), sort=False
    )
    m = 1 << p
    idx, rho = _rho_and_index(h, p)
    regs = np.zeros((len(uniques), m), dtype=np.uint8)
    ok = codes >= 0  # factorize marks null groups -1; without the mask
    # they would scatter into regs[-1] (the LAST group) and inflate it
    np.maximum.at(regs, (codes[ok], idx[ok]), rho[ok])
    return pa.table(
        {
            # build with the column's own type: inference would widen
            # e.g. int32 groups to int64, clashing with the typed-empty
            # branches above at schema-unification time
            group: pa.array(list(uniques), t.schema.field(group).type),
            "__regs": pa.array([r.tobytes() for r in regs], pa.binary()),
        }
    )


def grouped_hll(ds, group: str, col: str, p: int = 12):
    """Approximate COUNT(DISTINCT col) GROUP BY group: per-batch
    per-group register partials (one m-byte row per group per batch —
    values never shuffle), merged per group by elementwise max inside
    :func:`grouped_apply` coarse partitions.  Returns a Dataset of
    ``(group, n_distinct_est)``."""
    import pandas as pd

    from .agg import grouped_apply

    partials = ds.map_batches(
        lambda t: grouped_hll_partials(t, group, col, p),
        batch_format="pyarrow",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(
            [np.frombuffer(b, dtype=np.uint8) for b in g["__regs"]]
        )
        hll = HyperLogLog(p)
        hll.registers = regs.copy()
        return pd.DataFrame(
            {
                group: [g[group].iloc[0]],
                "n_distinct_est": [float(hll.estimate())],
            }
        )

    return grouped_apply(partials, group, merge, num_partitions=16)


def grouped_tdigest(ds, group: str, col: str, delta: int = 200):
    """Per-group t-digest (the unbounded-domain grouped-quantile path —
    :func:`parsel_ray.functions.agg.grouped_quantiles`' value-histogram
    trick needs a bounded value domain; a digest's state is O(delta)
    per group regardless of the domain).  Per-batch per-group digest
    partials, merged per group inside ``grouped_apply`` coarse
    partitions.  Returns a Dataset of ``(group, __digest: binary)``."""
    import pandas as pd

    from .agg import grouped_apply

    def partial(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {group: pa.array([], t.schema.field(group).type),
                 "__digest": pa.array([], pa.binary())}
            )
        vals = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        codes, uniques = pd.factorize(
            pd.Series(t[group].to_numpy(zero_copy_only=False)), sort=False
        )
        order = np.argsort(codes, kind="stable")
        bounds = np.searchsorted(codes[order], np.arange(len(uniques)))
        bounds = np.append(bounds, len(codes))
        out = []
        for i in range(len(uniques)):
            seg = vals[order[bounds[i] : bounds[i + 1]]]
            seg = seg[~np.isnan(seg)]
            out.append(TDigest(delta).add_many(seg).to_bytes())
        return pa.table(
            {group: pa.array(list(uniques), t.schema.field(group).type),
             "__digest": pa.array(out, pa.binary())}
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = TDigest.from_bytes(g["__digest"].iloc[0], delta)
        for b in g["__digest"].iloc[1:]:
            acc = acc.merge(TDigest.from_bytes(b, delta))
        return pd.DataFrame(
            {group: [g[group].iloc[0]], "__digest": [acc.to_bytes()]}
        )

    return grouped_apply(partials, group, merge, num_partitions=16)
