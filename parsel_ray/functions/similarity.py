"""Similarity search over ``list<float>`` embedding columns.

* Brute-force cosine top-k: the query matrix is broadcast once
  (``ray.put`` on the driver → read in each actor's ``__init__``), each
  batch does one float32 matmul, and per-batch partial top-k rows are
  merged by a final tiny ``groupby``/sort.  Exact; O(N·Q) — the baseline.
* LSH-bucketed variant: random-hyperplane signatures bucket both corpus
  and queries; only same-bucket pairs are scored — the 100 TB scale path
  (recall < 1, cost ≈ N·Q / 2^bits per table).
* Embedding near-duplicate detection: same hyperplane bucketing, pairwise
  cosine within buckets, threshold.

All deterministic: hyperplanes and any tie-breaks derive from fixed seeds;
cosine is computed in float64 with a fixed reduction order so the DuckDB
``list_cosine_similarity`` oracle agrees to ~1e-12.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack_embeddings(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (N, D) float64 ndarray (zero-copy flatten).

    Null or ragged rows raise: Arrow's ``flatten()`` silently DROPS null
    sublists, so a reshape after it would misalign every following row's
    values with its id (and a ragged column has no (N, D) shape at all).
    Embedding nulls must be filtered upstream — loud beats wrong."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    if col.null_count:
        raise ValueError(
            f"embedding column has {col.null_count} null rows — filter "
            "them upstream (flatten would silently misalign ids)"
        )
    if isinstance(col, pa.ListArray) or isinstance(col, pa.LargeListArray):
        widths = np.diff(col.offsets.to_numpy())
        if widths.size and (widths != widths[0]).any():
            raise ValueError(
                "ragged embedding column: row widths "
                f"{np.unique(widths)[:5].tolist()}..."
            )
    flat = col.flatten().to_numpy(zero_copy_only=False)
    if flat.size % n:
        raise ValueError(
            f"ragged embedding column: {flat.size} values over {n} rows"
        )
    return flat.reshape(n, -1).astype(np.float64)


class BruteForceTopK:
    """map_batches actor: emit per-batch partial top-k
    ``(query_id, neighbor_id, cosine)`` rows against a broadcast query set.

    ``queries_ref`` is a ``ray.put`` object ref of a dict
    ``{"ids": (Q,) int64, "mat": (Q, D) float64 row-normalized}`` — shipped
    to each actor once, NOT per batch.
    """

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding") -> None:
        from .relational import LazyRef

        self._q = LazyRef(queries_ref)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:  # filters upstream may empty whole blocks
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        q = self._q.get()
        self.qids = np.asarray(q["ids"], dtype=np.int64)
        self.qmat = np.asarray(q["mat"], dtype=np.float64)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _stack_embeddings(batch[self.emb_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = mat @ self.qmat.T  # (N, Q)
        n, q = sims.shape
        k = min(self.k, n)
        # partial top-k per query within this batch
        part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, Q)
        out_q, out_n, out_s = [], [], []
        for j in range(q):
            rows = part[:, j]
            out_q.append(np.full(k, self.qids[j]))
            out_n.append(ids[rows])
            out_s.append(sims[rows, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def finalize_topk(ds, k: int):
    """Merge per-batch partials: per query keep global top-k by
    (cosine desc, neighbor_id asc) — deterministic tie-break."""

    def head(t: pa.Table) -> pa.Table:
        t = t.sort_by(
            [("cosine", "descending"), ("neighbor_id", "ascending")]
        ).slice(0, k)
        return t.append_column(
            "rank", pa.array(np.arange(1, len(t) + 1, dtype=np.int64))
        )

    return ds.groupby("query_id").map_groups(head, batch_format="pyarrow")


def brute_force_topk(ds, queries_ref, k: int, id_col: str = "vec_id",
                     emb_col: str = "embedding", concurrency: int = 4):
    """Exact cosine top-k: partial top-k per batch (matmul) → tiny merge."""
    partials = ds.map_batches(
        BruteForceTopK(queries_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials, k)


# -- LSH (random hyperplane) ----------------------------------------------


def hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim)).astype(np.float64)


class HyperplaneBucketer:
    """Append an int64 ``bucket`` column: sign-pattern of ``bits`` random
    hyperplane projections (SimHash for vectors, Charikar 2002)."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 42,
                 emb_col: str = "embedding") -> None:
        self.planes = hyperplanes(dim, bits, seed)
        self.emb_col = emb_col
        self.weights = (1 << np.arange(bits, dtype=np.int64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch.append_column("bucket", pa.array([], pa.int64()))
        mat = _stack_embeddings(batch[self.emb_col])
        signs = (mat @ self.planes.T) > 0  # (N, bits)
        bucket = (signs * self.weights[None, :]).sum(axis=1)
        return batch.append_column("bucket", pa.array(bucket, pa.int64()))


def embedding_near_dup_pairs(ds, dim: int, threshold: float = 0.95,
                             bits: int = 10, seed: int = 42,
                             id_col: str = "vec_id",
                             emb_col: str = "embedding",
                             id_type=None):
    """Near-duplicate pairs by cosine ≥ threshold, LSH-bucketed: the scale
    path.  Recall is per-bucket (boost with multiple tables/seeds).
    Routed through ``grouped_apply`` (coarse hash partitions, per-bucket
    split inside) — ``groupby.map_groups`` would dispatch one task per
    bucket and 2^bits tiny buckets pay ~350 µs each in dispatch.

    ``id_type`` defaults to int64 (the embeddings table's ``vec_id``);
    it pins the output schema when NO bucket yields a pair — an untyped
    all-empty result would otherwise drop the schema for downstream
    selects/joins."""
    from .agg import grouped_apply

    bucketed = ds.map_batches(
        HyperplaneBucketer(dim=dim, bits=bits, seed=seed, emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=8192,
    ).select_columns([id_col, emb_col, "bucket"])

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in g[emb_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = mat @ mat.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = sims[ia, ib] >= threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
             "cosine": sims[ia, ib][keep]}
        )

    return grouped_apply(
        bucketed, "bucket", pairs, num_partitions=64,
        out_schema=pa.schema(
            [("id_a", id_type or pa.int64()),
             ("id_b", id_type or pa.int64()),
             ("cosine", pa.float64())]
        ),
    )


def exact_near_dup_pairs(ds, threshold: float, id_col: str = "vec_id",
                         emb_col: str = "embedding", block: int = 2048):
    """EXACT cosine-≥-threshold pairs via blocked all-pairs matmul.
    O(N²/2) — correctness oracle / small-N path; the LSH variant above is
    the 100 TB path.  Returns (id_a, id_b, cosine) with id_a < id_b."""
    import ray

    tbl = ds.select_columns([id_col, emb_col]).to_arrow_refs()
    mats, ids = [], []
    for ref in tbl:
        t = ray.get(ref)
        if len(t) == 0:  # upstream-filtered empty block: (0, 0) shape
            continue     # would break np.concatenate with (n, D) blocks
        ids.append(t[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        mats.append(_stack_embeddings(t[emb_col]))
    ids = np.concatenate(ids) if ids else np.empty(0, np.int64)
    mat = np.concatenate(mats) if mats else np.empty((0, 0))
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]

    @ray.remote
    def block_pairs(i0: int, i1: int, j0: int, j1: int, ids, mat):
        sims = mat[i0:i1] @ mat[j0:j1].T
        ia, ja = np.nonzero(sims >= threshold)
        gi, gj = ia + i0, ja + j0
        keep = gi < gj
        return ids[gi[keep]], ids[gj[keep]], sims[ia[keep], ja[keep]]

    ids_ref, mat_ref = ray.put(ids), ray.put(mat)
    futures = []
    n = len(ids)
    for i0 in range(0, n, block):
        for j0 in range(i0, n, block):
            futures.append(
                block_pairs.remote(i0, min(i0 + block, n), j0, min(j0 + block, n),
                                   ids_ref, mat_ref)
            )
    out_a, out_b, out_s = [], [], []
    for a, b, s in ray.get(futures):
        out_a.append(a); out_b.append(b); out_s.append(s)
    return pa.table(
        {
            "id_a": pa.array(np.concatenate(out_a) if out_a else [], pa.int64()),
            "id_b": pa.array(np.concatenate(out_b) if out_b else [], pa.int64()),
            "cosine": pa.array(np.concatenate(out_s) if out_s else [], pa.float64()),
        }
    )


# -- IVF (inverted-file) ANN ----------------------------------------------


def train_centroids(sample: np.ndarray, k: int, iters: int = 8,
                    seed: int = 42) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (Lloyd, fixed
    seeded init) → (k, D) row-normalized centroids.  At 100 TB the sample
    comes from ``ds.random_sample(frac, seed)``; training k centroids on
    ~100k sampled rows is a driver-scale problem."""
    rng = np.random.RandomState(seed)
    sample = sample.astype(np.float64)
    norms = np.linalg.norm(sample, axis=1)
    sample = sample[norms > 0] / norms[norms > 0, None]
    idx = rng.choice(len(sample), size=min(k, len(sample)), replace=False)
    cent = sample[np.sort(idx)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for j in range(len(cent)):
            members = sample[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cent[j] = c / n
    return cent


class IvfAssign:
    """Append ``ivf_cell``: nearest-centroid id (broadcast centroids)."""

    def __init__(self, centroids_ref, emb_col: str = "embedding") -> None:
        from .relational import LazyRef

        self._c = LazyRef(centroids_ref)
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("ivf_cell", pa.array([], pa.int32()))
        cent = self._c.get()
        mat = _stack_embeddings(t[self.emb_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cell = np.argmax(mat @ cent.T, axis=1).astype(np.int32)
        return t.append_column("ivf_cell", pa.array(cell, pa.int32()))


class IvfCellScore:
    """Per-cell partial top-k: each batch's rows are grouped by their
    ``ivf_cell`` and scored ONLY against the queries probing that cell —
    compute is Σ_cells N_c·Q_c (true IVF cost) instead of the union
    matmul's N_union·Q.  Semantics: a corpus row lives in exactly one
    cell, so a query's candidate set is exactly the rows of its nprobe
    cells; per-(batch, cell) partial top-k rows merge in
    :func:`finalize_topk`.  (This also fixes the union path's quirk of
    taking the batch top-k BEFORE the probe mask, which could drop valid
    probed-cell candidates behind unprobed-cell rows.)"""

    _EMPTY = pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "cosine": pa.array([], pa.float64()),
        }
    )

    def __init__(self, queries_ref, probes_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding") -> None:
        from .relational import LazyRef

        self._q = LazyRef(queries_ref)
        self._probes = LazyRef(probes_ref)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self._cell2q: "dict | None" = None  # built once per actor/worker

    def _build(self) -> None:
        q = self._q.get()
        self._qids = np.asarray(q["ids"], dtype=np.int64)
        self._qmat = np.asarray(q["mat"], dtype=np.float64)
        probes = self._probes.get()
        cell2q: dict[int, list[int]] = {}
        for row, cells in enumerate(np.asarray(probes["cells"])):
            for c in cells:
                cell2q.setdefault(int(c), []).append(row)
        self._cell2q = {
            c: np.array(rs, dtype=np.int64) for c, rs in cell2q.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return self._EMPTY
        if self._cell2q is None:
            self._build()
        ids = batch[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cells = batch["ivf_cell"].to_numpy(zero_copy_only=False)
        mat = _stack_embeddings(batch[self.emb_col])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        order = np.argsort(cells, kind="stable")
        sc = cells[order]
        seg_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(sc)) + 1, [len(sc)])
        )
        out_q, out_n, out_s = [], [], []
        for si in range(len(seg_starts) - 1):
            seg = order[seg_starts[si]:seg_starts[si + 1]]
            qrows = self._cell2q.get(int(sc[seg_starts[si]]))
            if qrows is None:
                continue
            sims = mat[seg] @ self._qmat[qrows].T  # (n_c, q_c)
            k = min(self.k, len(seg))
            part = np.argpartition(-sims, k - 1, axis=0)[:k]  # (k, q_c)
            seg_ids = ids[seg]
            for j, qrow in enumerate(qrows):
                rows = part[:, j]
                out_q.append(np.full(k, self._qids[qrow]))
                out_n.append(seg_ids[rows])
                out_s.append(sims[rows, j])
        if not out_q:
            return self._EMPTY
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), pa.int64()),
                "cosine": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )


def ivf_topk(ds, queries_ref, centroids_ref, k: int, nprobe: int = 4,
             id_col: str = "vec_id", emb_col: str = "embedding"):
    """IVF ANN top-k: corpus rows are assigned to centroid cells once;
    each query's candidates are restricted to its ``nprobe`` nearest
    cells (recall < 1).  Rows in cells no query probes are dropped by a
    cheap filter, then :class:`IvfCellScore` scores each cell's rows
    only against the queries probing that cell — Σ N_c·Q_c compute, no
    union matmul.
    """
    import ray

    import pyarrow.compute as pc

    q = ray.get(queries_ref)
    cent = ray.get(centroids_ref)
    probes = np.argsort(-(q["mat"] @ cent.T), axis=1)[:, :nprobe]
    probes_ref = ray.put({"ids": np.asarray(q["ids"], dtype=np.int64),
                          "cells": probes})
    probe_cells = pa.array(sorted(set(int(c) for row in probes for c in row)),
                           pa.int32())

    assigned = ds.map_batches(
        IvfAssign(centroids_ref, emb_col), batch_format="pyarrow",
        batch_size=4096,
    )
    filtered = assigned.map_batches(
        lambda t: t.filter(pc.is_in(t["ivf_cell"], value_set=probe_cells)),
        batch_format="pyarrow",
    )
    partials = filtered.map_batches(
        IvfCellScore(queries_ref, probes_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials, k)


def build_ivf_layout(ds, centroids_ref, out_dir: str,
                     emb_col: str = "embedding") -> "pa.Table":
    """Write the corpus as a CELL-PARTITIONED on-disk IVF index:
    ``out_dir/ivf_cell=<c>/shard-*.parquet`` (one streaming pass —
    :class:`IvfAssign` + the partitioned sink's atomic per-cell shards
    with verified ``_DONE`` receipts).  This is the scale path the
    in-memory :func:`ivf_topk` filter approximates: with the layout on
    disk, a query batch READS only its probed cells' files instead of
    scanning the whole corpus and filtering.  Returns per-cell row
    counts."""
    from ..sources.partitioned import write_partitioned_parquet

    assigned = ds.map_batches(
        IvfAssign(centroids_ref, emb_col), batch_format="pyarrow",
        batch_size=4096,
    )
    return write_partitioned_parquet(assigned, out_dir, "ivf_cell")


def ivf_topk_pruned(layout_dir: str, queries_ref, centroids_ref, k: int,
                    nprobe: int = 4, id_col: str = "vec_id",
                    emb_col: str = "embedding"):
    """IVF ANN top-k over a :func:`build_ivf_layout` directory with
    PARTITION PRUNING at the read: only the probed cells' parquet files
    enter the scan, so scan volume is the probed cells' row mass
    (∝ nprobe/cells for balanced cells), not the corpus.  Candidate sets
    are identical to :func:`ivf_topk` with the same centroids/queries —
    the layout changes WHERE the filter happens (directory listing vs
    post-read mask), not the semantics.

    Returns ``(result_dataset, rows_scanned, rows_total)`` — the scan
    accounting comes from parquet footers (O(files) metadata reads), so
    callers/tests can assert the pruning actually bounded the work."""
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    import ray
    import ray.data as rd

    q = ray.get(queries_ref)
    cent = ray.get(centroids_ref)
    probes = np.argsort(-(q["mat"] @ cent.T), axis=1)[:, :nprobe]
    probes_ref = ray.put({"ids": np.asarray(q["ids"], dtype=np.int64),
                          "cells": probes})
    probe_cells = sorted(set(int(c) for row in probes for c in row))

    all_files = {
        p: _pq.read_metadata(p).num_rows
        for p in _glob.glob(
            _os.path.join(layout_dir, "ivf_cell=*", "*.parquet")
        )
    }
    rows_total = sum(all_files.values())
    paths = sorted(
        p for p in all_files
        if int(_os.path.basename(_os.path.dirname(p)).split("=", 1)[1])
        in probe_cells
    )
    rows_scanned = sum(all_files[p] for p in paths)
    if not paths:
        empty = IvfCellScore._EMPTY.append_column(
            "rank", pa.array([], pa.int64())
        )
        return rd.from_arrow(empty), 0, rows_total
    ds = rd.read_parquet(paths, columns=[id_col, emb_col, "ivf_cell"])
    partials = ds.map_batches(
        IvfCellScore(queries_ref, probes_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials, k), rows_scanned, rows_total


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN — the memory-scale path
# ---------------------------------------------------------------------------


def train_pq(sample: np.ndarray, m: int = 8, ksub: int = 16, iters: int = 10,
             seed: int = 7) -> np.ndarray:
    """Train PQ codebooks on a driver-scale sample: split D into ``m``
    subspaces, run seeded Lloyd k-means (ksub codewords) per subspace.
    Returns (m, ksub, D/m) float64.  Public literature: Jegou, Douze,
    Schmid, "Product quantization for nearest neighbor search" (TPAMI
    2011).  At 100 TB the sample comes from ``ds.random_sample`` (same
    contract as :func:`train_centroids`); codes compress each vector to
    ``m`` bytes — a 64-dim float corpus shrinks 32x, which is what lets
    the candidate set live in worker memory."""
    rng = np.random.RandomState(seed)
    sample = sample.astype(np.float64)
    norms = np.linalg.norm(sample, axis=1)
    sample = sample[norms > 0] / norms[norms > 0, None]
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        k = min(ksub, len(sub))
        idx = rng.choice(len(sub), size=k, replace=False)
        cent = sub[np.sort(idx)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = sub[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        if k < ksub:  # pad degenerate books so codes stay uint8-stable
            cent = np.vstack([cent, np.repeat(cent[-1:], ksub - k, axis=0)])
        books[j] = cent
    return books


def pq_encode_kernel(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(N, D) -> (N, m) uint8 codes, vectorized per subspace."""
    n, d = mat.shape
    m, ksub, dsub = books.shape
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    mat = mat / norms[:, None]
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        # argmin ||x - c||^2 = argmax 2<x,c> - ||c||^2
        dots = sub @ books[j].T
        codes[:, j] = np.argmax(
            2 * dots - (books[j] ** 2).sum(axis=1)[None, :], axis=1
        ).astype(np.uint8)
    return codes


class PqEncode:
    """Append ``pq_code`` (m-byte binary) from broadcast codebooks."""

    def __init__(self, books_ref, emb_col: str = "embedding") -> None:
        from .relational import LazyRef

        self._b = LazyRef(books_ref)
        self.emb_col = emb_col

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("pq_code", pa.array([], pa.binary()))
        codes = pq_encode_kernel(
            _stack_embeddings(t[self.emb_col]), self._b.get()
        )
        return t.append_column(
            "pq_code", pa.array([c.tobytes() for c in codes], pa.binary())
        )


class PqAdcScore:
    """Asymmetric-distance partial top-k: per batch, build one
    (m, ksub) inner-product lookup table per query from the broadcast
    codebooks, score every code row with a flat ``np.take`` — the
    embedding column itself is NOT read (codes only), which is the
    point of PQ at scale."""

    def __init__(self, queries_ref, books_ref, k: int,
                 id_col: str = "vec_id") -> None:
        from .relational import LazyRef

        self._q = LazyRef(queries_ref)
        self._b = LazyRef(books_ref)
        self.k = k
        self.id_col = id_col
        self._built = None  # (qids, flat_luts, m, ksub) — once per worker

    def _build(self):
        """LUTs derive solely from broadcast state — build once per
        worker (one Q×m×ksub einsum), not once per batch."""
        if self._built is None:
            q = self._q.get()
            books = self._b.get()
            m, ksub, dsub = books.shape
            qmat = np.asarray(q["mat"], np.float64).reshape(-1, m, dsub)
            luts = np.einsum("msd,qmd->qms", books, qmat)  # (Q, m, ksub)
            self._built = (
                np.asarray(q["ids"]), luts.reshape(len(qmat), -1), m, ksub
            )
        return self._built

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        qids, flat_luts, m, ksub = self._build()
        codes = np.frombuffer(
            b"".join(t["pq_code"].to_pylist()), dtype=np.uint8
        ).reshape(len(t), m)
        flat = codes.astype(np.int64) + (np.arange(m) * ksub)[None, :]
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for qid, flat_lut in zip(qids, flat_luts):
            scores = np.take(flat_lut, flat).sum(axis=1)
            k = min(self.k, len(scores))
            top = np.argpartition(-scores, k - 1)[:k]
            top = top[np.argsort(-scores[top], kind="stable")]
            out_q.extend([int(qid)] * k)
            out_n.extend(ids[top].tolist())
            out_s.extend(scores[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def pq_topk(ds, queries_ref, books_ref, k: int, id_col: str = "vec_id",
            emb_col: str = "embedding"):
    """PQ ANN top-k: encode (once, m bytes/vector) -> ADC partial top-k
    per batch -> tiny global merge.  No shuffle of vectors at all; the
    only all-to-all is the O(Q*k) partial-result merge."""
    encoded = ds.map_batches(
        PqEncode(books_ref, emb_col), batch_format="pyarrow",
        batch_size=4096,
    ).select_columns([id_col, "pq_code"])
    partials = encoded.map_batches(
        PqAdcScore(queries_ref, books_ref, k, id_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials, k)


class ExactReRank:
    """Second PQ stage: exact cosine scoring of each query against ONLY
    its broadcast shortlist ids (per-query candidate masks via
    ``np.isin`` over the batch's id column) — the standard
    PQ-shortlist -> exact-re-rank ANN shape.  Vectors for non-candidates
    never get scored; the batch matmul runs once for all queries."""

    def __init__(self, queries_ref, short_ref, k: int,
                 id_col: str = "vec_id", emb_col: str = "embedding"):
        from .relational import LazyRef

        self._q = LazyRef(queries_ref)
        self._s = LazyRef(short_ref)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col
        self._built = None  # (union, per-query sorted shortlists) —
        #                     derives solely from broadcast state, so
        #                     sort once per worker, not once per batch

    def _build(self):
        if self._built is None:
            short = self._s.get()  # {query_id: np.ndarray of ids}
            union = (
                np.unique(np.concatenate(list(short.values())))
                if short else np.array([], np.int64)
            )
            self._built = (
                union, {k: np.sort(np.asarray(v)) for k, v in short.items()}
            )
        return self._built

    @staticmethod
    def _in_sorted(sorted_arr: np.ndarray, vals: np.ndarray) -> np.ndarray:
        if sorted_arr.size == 0:
            return np.zeros(len(vals), bool)
        i = np.minimum(
            np.searchsorted(sorted_arr, vals), sorted_arr.size - 1
        )
        return sorted_arr[i] == vals

    def __call__(self, t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(t) == 0:
            return empty
        q = self._q.get()
        union, short_sorted = self._build()
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        # subset to the UNION of shortlists BEFORE any vector math —
        # non-candidate rows are never decoded into the matmul (the
        # docstring's contract, and the point of the PQ prune: the
        # re-rank pass costs |shortlist-hits|, not |batch| x Q)
        hit = self._in_sorted(union, ids)
        if not hit.any():
            return empty
        ids = ids[hit]
        mat = _stack_embeddings(t[self.emb_col].filter(pa.array(hit)))
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        scores = mat @ q["mat"].T  # (|hits|, Q)
        out_q, out_n, out_s = [], [], []
        for c, qid in enumerate(q["ids"]):
            mask = self._in_sorted(short_sorted[int(qid)], ids)
            if not mask.any():
                continue
            s = scores[mask, c]
            cand_ids = ids[mask]
            k = min(self.k, len(s))
            top = np.argpartition(-s, k - 1)[:k]
            top = top[np.argsort(-s[top], kind="stable")]
            out_q.extend([int(qid)] * k)
            out_n.extend(cand_ids[top].tolist())
            out_s.extend(s[top].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )


def pq_topk_rerank(ds_factory, queries_ref, books_ref, k: int,
                   shortlist: int, id_col: str = "vec_id",
                   emb_col: str = "embedding"):
    """Full two-stage PQ ANN: (1) ADC over m-byte codes produces a
    per-query shortlist (k=``shortlist``); (2) a second streaming pass
    re-ranks only shortlist members with exact cosine.  The driver holds
    Q x shortlist (id, score) rows between stages — never vectors.
    ``ds_factory`` builds a fresh Dataset per pass (two pruned reads
    beat pinning the corpus in the object store)."""
    import ray

    short = pq_topk(
        ds_factory(), queries_ref, books_ref, shortlist, id_col, emb_col
    ).take_all()
    by_q: dict[int, list] = {}
    for r in short:
        by_q.setdefault(int(r["query_id"]), []).append(int(r["neighbor_id"]))
    short_ref = ray.put(
        {qid: np.asarray(v, dtype=np.int64) for qid, v in by_q.items()}
    )
    partials = ds_factory().map_batches(
        ExactReRank(queries_ref, short_ref, k, id_col, emb_col),
        batch_format="pyarrow",
        batch_size=4096,
    )
    return finalize_topk(partials, k)


def sparse_cosine_top1(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
    max_df_frac: float = 0.1,
    num_partitions: int = 32,
):
    """Most-similar document per doc under SPARSE term-frequency cosine —
    the inverted-index complement to the dense-embedding KNN: pair
    candidates come from shared terms, never from an all-pairs matmul.

    Exactness contract: weights are integer term frequencies, so every
    dot product and squared norm is an exact int64 sum; the cosine is
    the one IEEE expression ``dot / (sqrt(na) * sqrt(nb))`` both here
    and in the DuckDB oracle — hash-identical floats.

    Scale shape: the term-partitioned pair enumeration is bounded by the
    ``max_df`` document-frequency cut (≤ max_df²/2 pairs per term — the
    standard prefix-filter analog; terms above the cut are discriminative
    of nothing and are dropped on BOTH sides), partial dots pre-sum per
    batch before the pair shuffle, and the top-1 is a per-doc
    grouped_apply.  No driver-side state beyond one corpus-count scalar.

    ``max_df`` defaults to ``max(2, int(max_df_frac * n_rows))`` — a
    RELATIVE cut, because an absolute one empties the kept-term set as
    the corpus grows (at 10x the docs every df roughly 10x-es)."""
    import pandas as pd
    import pyarrow.compute as pc

    if max_df is None:
        # pin the lineage before consuming it twice (count() here, the
        # tf pass below) — otherwise an expensive upstream pipeline
        # re-executes from scratch for the second consumer
        ds = ds.materialize()
        # floor, mirrored by the oracle's CAST(floor(...)) — Python
        # int() truncation vs SQL CAST's round-to-nearest would disagree
        # whenever frac(0.1*n) >= 0.5
        max_df = max(2, int(np.floor(max_df_frac * ds.count())))

    from .agg import grouped_apply, partial_sum_groupby
    from .relational import hash_bucket_join
    from .text import term_doc_tf

    tf = ds.map_batches(
        lambda t: term_doc_tf(t, col=text_col, id_col=id_col),
        batch_format="pyarrow",
    ).materialize()  # consumed twice (df census + kept-term join):
    # pin the tokenization pass or it re-executes end-to-end
    df = partial_sum_groupby(tf, ["term"], {}, count_as="__df")

    def kept(t: pa.Table) -> pa.Table:
        f = t.filter(
            pc.and_(pc.greater(t["__df"], 1),
                    pc.less_equal(t["__df"], max_df))
        )
        return f.select(["term"])

    tf_kept = hash_bucket_join(
        tf, df.map_batches(kept, batch_format="pyarrow"),
        on="term", how="inner", buckets=num_partitions,
    )

    # the empty-corpus edge (no term kept → tf_kept/pairs all-empty)
    # must keep typed schemas through every aggregate or the joins below
    # crash on a schema-less side; id type comes from the materialized
    # tf pass, so schema() costs nothing
    from .relational import _pa_side_schema

    id_pa_type = _pa_side_schema(tf).field(id_col).type

    norms = partial_sum_groupby(
        tf_kept.map_batches(
            lambda t: pa.table(
                {
                    id_col: t[id_col],
                    "sq": pc.multiply(
                        pc.cast(t["tf"], pa.int64()),
                        pc.cast(t["tf"], pa.int64()),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        [id_col], {"sq": "norm_sq"},
        out_schema=pa.schema([(id_col, id_pa_type),
                              ("norm_sq", pa.int64())]),
    )

    def pair_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        tfs = g["tf"].to_numpy().astype(np.int64)
        d = ids.size
        if d < 2:
            return pd.DataFrame(
                {"a": np.empty(0, ids.dtype),
                 "b": np.empty(0, ids.dtype),
                 "prod": np.empty(0, np.int64)}
            )
        i, j = np.triu_indices(d, k=1)
        return pd.DataFrame(
            {"a": ids[i], "b": ids[j], "prod": tfs[i] * tfs[j]}
        )

    pairs = grouped_apply(tf_kept.select_columns([id_col, "term", "tf"]),
                          ["term"], pair_rows,
                          num_partitions=num_partitions,
                          out_schema=pa.schema(
                              [("a", id_pa_type), ("b", id_pa_type),
                               ("prod", pa.int64())]))
    dots = partial_sum_groupby(
        pairs, ["a", "b"], {"prod": "dot"},
        out_schema=pa.schema([("a", id_pa_type), ("b", id_pa_type),
                              ("dot", pa.int64())]),
    )

    # the rename maps skip 0-row blocks (dropping the schema the norms
    # union pinned) — re-pin with a typed empty union AFTER each rename
    # so the joins below always see a typed side
    import ray.data as _rd

    na = norms.map_batches(
        lambda t: t.rename_columns(["a", "norm_a"]), batch_format="pyarrow"
    ).union(_rd.from_arrow(pa.schema(
        [("a", id_pa_type), ("norm_a", pa.int64())]).empty_table()))
    nb = norms.map_batches(
        lambda t: t.rename_columns(["b", "norm_b"]), batch_format="pyarrow"
    ).union(_rd.from_arrow(pa.schema(
        [("b", id_pa_type), ("norm_b", pa.int64())]).empty_table()))
    with_a = hash_bucket_join(dots, na, on="a", buckets=num_partitions)
    with_b = hash_bucket_join(with_a, nb, on="b", buckets=num_partitions)

    def cosine_sym(t: pa.Table) -> pa.Table:
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        dot = t["dot"].to_numpy(zero_copy_only=False).astype(np.float64)
        # the oracle's exact expression: dot / (sqrt(na) * sqrt(nb))
        c = dot / (
            np.sqrt(t["norm_a"].to_numpy(zero_copy_only=False).astype(
                np.float64))
            * np.sqrt(t["norm_b"].to_numpy(zero_copy_only=False).astype(
                np.float64))
        )
        return pa.table(
            {
                id_col: pa.array(np.concatenate([a, b])),
                "best_doc": pa.array(np.concatenate([b, a])),
                "cosine": pa.array(np.concatenate([c, c]), pa.float64()),
            }
        )

    sym = with_b.map_batches(cosine_sym, batch_format="pyarrow")

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "best_doc"],
                          ascending=[False, True], kind="stable")
        return g.iloc[:1]

    return grouped_apply(sym, [id_col], top1,
                         num_partitions=num_partitions,
                         out_schema=pa.schema(
                             [(id_col, id_pa_type),
                              ("best_doc", id_pa_type),
                              ("cosine", pa.float64())]))


# ---------------------------------------------------------------------------
# Distributed PCA (one-pass sufficient statistics)
# ---------------------------------------------------------------------------


def pca_fit(ds, dim: int, col: str = "embedding"):
    """One-pass distributed PCA fit: every batch reduces to the O(d^2)
    sufficient statistics of the covariance — ``(n, sum_x, sum_outer)``
    — so the bytes leaving a worker are independent of corpus size; a
    second map_batches level folds batch partials into block partials
    (the driver sees O(blocks) rows of d^2 floats, a two-level reduce
    tree); the d x d eigendecomposition happens once on the driver.

    Returns ``(mean, components, explained_var)`` with components as
    rows sorted by descending eigenvalue and a deterministic sign
    convention (largest-|entry| coordinate made positive).
    """
    import pyarrow as pa

    def batch_stats(t: pa.Table) -> pa.Table:
        if len(t) == 0:  # filters upstream may empty whole blocks; a
            # 0-row batch would emit shape-(0,) partials that break fold
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 "s": pa.array([], pa.list_(pa.float64())),
                 "outer": pa.array([], pa.list_(pa.float64()))}
            )
        mat = _stack_embeddings(t[col]).astype(np.float64)
        s = mat.sum(axis=0)
        outer = mat.T @ mat
        return pa.table(
            {
                "n": pa.array([len(mat)], pa.int64()),
                "s": pa.array([s]),
                "outer": pa.array([outer.reshape(-1)]),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        n = int(np.sum(t["n"].to_numpy(zero_copy_only=False)))
        s = np.zeros(dim, dtype=np.float64)
        outer = np.zeros(dim * dim, dtype=np.float64)
        for row_s, row_o in zip(t["s"].to_pylist(), t["outer"].to_pylist()):
            s += np.asarray(row_s, dtype=np.float64)
            outer += np.asarray(row_o, dtype=np.float64)
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s": pa.array([s]),
                "outer": pa.array([outer]),
            }
        )

    parts = (
        ds.map_batches(batch_stats, batch_format="pyarrow")
        .map_batches(fold, batch_format="pyarrow", batch_size=256)
        .take_all()
    )
    n = sum(int(r["n"]) for r in parts)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.zeros(dim, dtype=np.float64)
    outer = np.zeros((dim, dim), dtype=np.float64)
    for r in parts:
        s += np.asarray(r["s"], dtype=np.float64)
        outer += np.asarray(r["outer"], dtype=np.float64).reshape(dim, dim)
    mean = s / n
    cov = (outer - np.outer(s, mean)) / (n - 1)
    cov = (cov + cov.T) / 2.0  # enforce symmetry against fp drift
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order].T  # components as rows
    # deterministic sign: the largest-|entry| coordinate is positive
    for i in range(evecs.shape[0]):
        j = int(np.argmax(np.abs(evecs[i])))
        if evecs[i, j] < 0:
            evecs[i] = -evecs[i]
    # certification: eigenvalue mass must reproduce the total variance
    tr = float(np.trace(cov))
    if not math.isclose(float(evals.sum()), tr, rel_tol=1e-9, abs_tol=1e-12):
        raise AssertionError("pca_fit: eigenvalue sum != trace(cov)")
    return mean, evecs, evals


class PcaProject:
    """Actor-pool projection stage: components broadcast once per actor
    via ``LazyRef``; each batch is one centered matmul.  Projections
    leave as integer micro-units so the output column is exact."""

    def __init__(self, ref, n_components: int, col: str = "embedding",
                 id_cols=("vec_id",)):
        from .relational import LazyRef

        self.ref = LazyRef(ref)
        self.k = n_components
        self.col = col
        self.id_cols = list(id_cols)

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        mean, comps = self.ref.get()
        mat = _stack_embeddings(t[self.col]).astype(np.float64)
        proj = (mat - mean) @ comps[: self.k].T
        cols = {c: t[c] for c in self.id_cols}
        for i in range(self.k):
            cols[f"pc{i + 1}_e6"] = pa.array(
                np.floor(proj[:, i] * 1e6 + 0.5).astype(np.int64)
            )
        return pa.table(cols)


def semdedup(ds, centroids_ref, threshold: float = 0.95,
             id_col: str = "vec_id", emb_col: str = "embedding",
             num_partitions: int = 32):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication of an embedding corpus — cluster with k-means, then
    drop within-cluster rows whose cosine similarity to an EARLIER
    (lower ``id_col``) row of the same cluster is >= ``threshold``.

    Distribution: one :class:`IvfAssign` map (broadcast centroids via
    ``ray.put``/LazyRef, zero-copy batches) + one cell-keyed coarse
    shuffle; per cell a single normalized matmul and an upper-triangle
    any() give the drop mask — no per-row Python, no driver-side
    vectors.  Per-cell memory is (N/k)^2 floats; at corpus scale k grows
    with N (SemDeDup's own prescription) to bound the cell quadratic.

    Deterministic contract (what the in-kernel mask certifies): a row is
    dropped iff SOME earlier same-cell row (kept or not — chains drop
    with their head, matching the paper's "keep one representative per
    duplicate neighborhood" at the stated threshold) is >= threshold.

    Returns the surviving rows (original columns + ``ivf_cell``).
    """
    from .relational import _bucket_of

    assigned = ds.map_batches(
        IvfAssign(centroids_ref, emb_col=emb_col), batch_format="pyarrow"
    )

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__part", _bucket_of(t["ivf_cell"].cast(pa.int64()), num_partitions)
        )

    def per_cell(t: pa.Table) -> pa.Table:
        # pure-arrow: one sort by (cell, id), one flat embedding matrix,
        # per-cell segment matmuls over numpy views — no pandas block
        t = t.drop(["__part"]).sort_by(
            [("ivf_cell", "ascending"), (id_col, "ascending")]
        )
        n = len(t)
        if n == 0:
            return t
        emb = t[emb_col].combine_chunks()
        flat = (
            emb.chunk(0).flatten() if isinstance(emb, pa.ChunkedArray) else emb.flatten()
        ).to_numpy(zero_copy_only=False).astype(np.float64)
        mat = flat.reshape(n, -1)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        cells = t["ivf_cell"].to_numpy(zero_copy_only=False)
        bounds = np.concatenate(
            ([0], np.flatnonzero(cells[1:] != cells[:-1]) + 1, [n])
        )
        keep = np.ones(n, dtype=bool)
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            sub = mat[lo:hi]
            sims = sub @ sub.T
            dup = (np.triu(sims >= threshold, k=1)).any(axis=0)
            keep[lo:hi] = ~dup
        return t.filter(pa.array(keep))

    return (
        assigned.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_cell, batch_format="pyarrow")
    )
