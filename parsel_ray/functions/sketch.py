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

import numpy as np
import pyarrow as pa


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
    merged by a tree of Ray tasks (no driver pass over values).  Returns
    the final :class:`TDigest`."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        td = TDigest(delta)
        td.add_many(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"__td": pa.array([td.to_bytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
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
