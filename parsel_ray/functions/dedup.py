"""Deduplication operators for 100 TB-scale corpora.

* exact        — content-hash → hash-partitioned groupby → first-wins
                 (combiner inside ``map_batches`` pre-dedups each batch so
                 the shuffle moves one row per distinct hash per batch);
* MinHash+LSH  — char-shingle → 64-perm minhash signature → banded LSH
                 bucketing → signature-estimated Jaccard ≥ threshold →
                 connected components → keep min id per component;
* SimHash      — 64-bit sign-of-weighted-sum fingerprint, exact or
                 hamming-banded grouping;
* n-gram Jaccard — exact set Jaccard on shingle hashes (verification-grade,
                 used inside LSH buckets).

All heavy math is numpy over Arrow buffers; the only shuffles are the
``groupby`` on hash/band keys, each preceded by a per-batch combiner.
No reference equivalent (the reference is a per-document selector library);
these follow the public MinHash/SimHash literature (Broder 1997;
Charikar 2002).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._numutil import _ignore_overflow  # noqa: F401 (re-export)



# universal-hash parameters (fixed seeds → deterministic across runs/workers)
_MERSENNE = np.uint64((1 << 61) - 1)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, (1 << 61) - 1, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, (1 << 61) - 1, size=num_perm, dtype=np.uint64)
    return a, b


def exact_dedup_rows(ds, fp_col: str = "fingerprint",
                     id_col: str = "doc_id", num_partitions: int = 64):
    """First-wins exact dedup CARRYING FULL ROWS — the 100 TB shape for
    "give me the distinct corpus", as opposed to the slim
    (fingerprint → min id) aggregate of ``partial_agg_groupby`` followed
    by a survivor-id broadcast (which needs a corpus-sized driver set).

    One fingerprint-keyed shuffle: each batch first keeps only its local
    min-``id_col`` row per fingerprint (Arrow sort + adjacent-run mask, so
    the shuffle moves one full row per distinct fingerprint per batch),
    then coarse hash partitions resolve global first-wins with a
    vectorized sort + ``duplicated`` inside each partition.  A fingerprint
    never spans partitions, so semantics are exact.
    """
    import pyarrow.compute as pc

    from .relational import _bucket_of

    def batch_first(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t.append_column("__part", pa.array([], pa.int32()))
        idx = pc.sort_indices(
            t, sort_keys=[(fp_col, "ascending"), (id_col, "ascending")]
        )
        t = t.take(idx)
        fp = t[fp_col].combine_chunks()
        first = pa.concat_arrays(
            [pa.array([True]), pc.not_equal(fp.slice(1), fp.slice(0, len(fp) - 1))]
        )
        # null fingerprints carry no equality evidence: keep every such
        # row (not_equal yields null there, and filter would silently
        # DELETE them — data loss, not dedup)
        t = t.filter(pc.fill_null(first, True))
        return t.append_column("__part", _bucket_of(t[fp_col], num_partitions))

    def per_partition(t: pa.Table) -> pa.Table:
        # pure-arrow first-wins: sort by (fp, id), then a row is a dup
        # iff its fingerprint equals the previous row's (nulls exempt —
        # a null fingerprint never dedups against another null)
        t = t.drop(["__part"]).sort_by(
            [(fp_col, "ascending"), (id_col, "ascending")]
        )
        n = len(t)
        if n <= 1:
            return t
        fp = t[fp_col].combine_chunks()
        eq = pc.equal(fp.slice(1, n - 1), fp.slice(0, n - 1))
        # null == null → null in arrow; fill false so nulls stay kept
        dup = pc.fill_null(eq, False).to_numpy(zero_copy_only=False)
        keep = np.ones(n, dtype=bool)
        keep[1:] = ~dup
        return t.filter(pa.array(keep))

    return (
        # large batch_size: coalesces small upstream blocks so (a) the
        # per-batch combiner sees more duplicates and (b) the sort
        # shuffle, whose cost tracks block count, gets few fat blocks
        ds.map_batches(batch_first, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(per_partition, batch_format="pyarrow")
    )


@_ignore_overflow
def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct 64-bit polynomial hashes of all ``k``-byte shingles of the
    lower-cased utf-8 text.  Fully vectorized: h_i = Σ_j (d[i+j]+1)·B^(k-1-j)
    is k shifted multiply-adds over the byte array (k numpy ops total, no
    per-byte Python loop)."""
    data = np.frombuffer(text.lower().encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    B = np.uint64(1000003)
    dplus = data + np.uint64(1)
    if n < k:
        h = np.uint64(0)
        for x in dplus:
            h = np.uint64(h * B + x)
        return np.array([h], dtype=np.uint64)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    pw = np.uint64(1)
    for j in range(k - 1, -1, -1):  # k iterations, each vectorized over all windows
        h += dplus[j : j + m] * pw
        pw = np.uint64(pw * B)
    return np.unique(h)


@_ignore_overflow
def minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(P,) uint64 minhash signature from (S,) shingle hashes."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (S,1)*(P,) + (P,) mod Mersenne-61 — wraparound-safe in uint64 because
    # we mask to 61 bits after a Mersenne fold
    x = shingles[:, None] & np.uint64((1 << 61) - 1)
    h = x * a[None, :] + b[None, :]
    h = (h & _MERSENNE) + (h >> np.uint64(61))
    return h.min(axis=0)


class MinHasher:
    """map_batches actor: text column → ``sig`` (list<uint64>) signature
    column.  Permutation params generated once per actor from a fixed seed,
    so every worker computes identical signatures."""

    def __init__(
        self, col: str = "text", num_perm: int = 64, k: int = 5, seed: int = 42
    ) -> None:
        self.col = col
        self.k = k
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            minhash_signature(shingle_hashes(t or "", self.k), self.a, self.b).astype(
                np.int64
            )
            for t in batch[self.col].to_pylist()
        ]
        return batch.append_column(
            "sig", pa.array([s.tolist() for s in sigs], pa.list_(pa.int64()))
        )


@_ignore_overflow
def emit_band_rows(
    batch: pa.Table, id_col: str, bands: int, rows_per_band: int,
    include_sig: bool = False,
) -> pa.Table:
    """Explode each signature into ``bands`` rows of
    ``(id, band_id, band_hash, sig)`` — the LSH bucketing key.  Band hashes
    are FNV-folded across the band's rows, vectorized over the whole batch
    ((N, bands) matrix ops, no per-value Python loop)."""
    n = len(batch)
    if n == 0:
        cols = {
            id_col: pa.array([], batch.schema.field(id_col).type),
            "band_id": pa.array([], pa.int32()),
            "band_hash": pa.array([], pa.int64()),
        }
        if include_sig:
            cols["sig"] = pa.array([], pa.list_(pa.int64()))
        return pa.table(cols)
    sig_col = batch["sig"].combine_chunks()
    flat = sig_col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
    sigs = flat.reshape(n, bands * rows_per_band)
    chunks = sigs.reshape(n, bands, rows_per_band)
    bh = np.full((n, bands), np.uint64(14695981039346656037), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    for j in range(rows_per_band):  # r iterations, vectorized over (N, bands)
        bh = (bh ^ chunks[:, :, j]) * prime
    # fold band_id into the hash → ONE int64 bucket key (same band_id AND
    # same band content ⇒ same bucket, to within 64-bit collision odds)
    bh = (bh ^ np.arange(bands, dtype=np.uint64)[None, :]) * prime
    ids = batch[id_col].combine_chunks()
    rep_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), bands))
    cols = {
        id_col: ids.take(rep_idx),
        "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
        "band_hash": pa.array(bh.reshape(-1).astype(np.int64), pa.int64()),
    }
    if include_sig:
        cols["sig"] = sig_col.take(rep_idx)
    return pa.table(cols)


def partition_candidate_pairs(t: pa.Table, id_col: str, cap: int = 256) -> pa.Table:
    """Bucket co-membership pair enumeration over one hash partition of
    slim band rows (id, band_hash) — pandas-free, deduped within the
    partition.

    Sort by (bucket, id), find group boundaries with numpy, enumerate pair
    indices per multi-member bucket (tiny loop over multi-buckets only,
    numpy slicing inside).
    """
    empty = pa.table(
        {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
    )
    n = len(t)
    if n < 2:
        return empty
    bucket = t["band_hash"].to_numpy(zero_copy_only=False)
    ids = t[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bucket))
    bucket, ids = bucket[order], ids[order]
    starts = np.flatnonzero(np.r_[True, np.diff(bucket) != 0])
    sizes = np.diff(np.r_[starts, n])
    ia_parts, ib_parts = [], []
    for s0, sz in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        m = min(int(sz), cap)  # hot-bucket guard
        la, lb = np.triu_indices(m, k=1)
        ia_parts.append(la + s0)
        ib_parts.append(lb + s0)
    if not ia_parts:
        return empty
    ia = np.concatenate(ia_parts)
    ib = np.concatenate(ib_parts)
    out = np.stack([ids[ia].astype(np.int64), ids[ib].astype(np.int64)], axis=1)
    out = np.unique(out, axis=0)  # per-partition dedupe across bands
    return pa.table(
        {
            "id_a": pa.array(out[:, 0], pa.int64()),
            "id_b": pa.array(out[:, 1], pa.int64()),
        }
    )


def lsh_candidate_pairs(bands_ds, id_col: str = "doc_id",
                        threshold: float = 0.8, num_partitions: int = 64):
    """Distributed LSH candidate pairs: ONE shuffle of SLIM band rows
    (id + 8-byte bucket key — signatures never enter the exchange) into
    ``num_partitions`` coarse partitions (a bucket never spans
    partitions), vectorized co-membership pair enumeration per partition,
    per-partition dedupe.  Pairs are UNVERIFIED (bucket co-membership
    only) and may still repeat across partitions; verify + final dedupe
    with :func:`verify_pairs` (broadcast signatures) downstream.
    ``threshold`` kept for API compatibility (verification threshold)."""

    def add_part(t: pa.Table) -> pa.Table:
        t = t.select([id_col, "band_hash"])
        b = t["band_hash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((b * np.uint64(11400714819323198485)) >> np.uint64(33)) % np.uint64(
            num_partitions
        )
        return t.append_column("__part", pa.array(part.astype(np.int32)))

    return (
        bands_ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(
            lambda g: partition_candidate_pairs(g, id_col),
            batch_format="pyarrow",
        )
    )


def _attach_by_key(target, source, key_col: str, out_col: str, width: int,
                   buckets: int = 32, tgt_prep=None):
    """Distributed key-gather ("fetch a column by key"): ONE union+groupby
    shuffle co-partitions target rows with (key, ``__val``) source rows by
    ``hash(key) % buckets``; inside each partition a vectorized
    searchsorted gather attaches value-of-key to every target row.  Arrow
    end-to-end — no pandas, no driver materialization.

    ``source`` columns: ``(key_col, "__val")`` where ``__val`` is
    ``fixed-width list<int64>`` of ``width`` (signatures) or plain int64
    when ``width == 0`` (labels).  Inner semantics: target rows whose key
    has no source row are dropped (callers guarantee full coverage).
    ``tgt_prep``: optional Arrow-table hook applied to each bucket's
    target slice before the gather — rows with equal ``key_col`` always
    co-locate, so a per-bucket dedupe here is an exact GLOBAL dedupe
    without its own shuffle.

    Scale: per-bucket memory ≈ (|target| + |source|) / buckets — size
    ``buckets`` so one bucket's signature slice fits a worker heap.  The
    full source is shuffled; when the target key set is far smaller and
    broadcastable, pre-filter source with ``broadcast_semi_join`` first.
    """
    import pyarrow.compute as pc

    from .relational import _bucket_of

    _s = target.schema()  # ray Schema: .types are pyarrow types
    tgt_schema = pa.schema(list(zip(_s.names, _s.types)))
    tgt_cols = list(tgt_schema.names)
    val_type = pa.list_(pa.int64(), width) if width else pa.int64()
    # ONE unified schema for both union sides (each side pads the other's
    # columns with typed nulls, the hash_bucket_join recipe) — otherwise
    # every groupby partition mixes two block schemas and Ray logs a
    # schema-mismatch warning per reduce task
    uni_fields = list(tgt_schema) + (
        [pa.field("__val", val_type)] if "__val" not in tgt_schema.names else []
    )

    def add_bucket(is_src: bool):
        def f(t: pa.Table) -> pa.Table:
            cols = [
                t[f_.name] if f_.name in t.column_names
                else pa.nulls(len(t), f_.type)
                for f_ in uni_fields
            ]
            out = pa.table(cols, names=[f_.name for f_ in uni_fields])
            out = out.append_column(
                "__bucket", _bucket_of(t[key_col], buckets)
            )
            return out.append_column(
                "__src", pa.array(np.full(len(t), is_src), pa.bool_())
            )

        return f

    # batch_size here COALESCES small upstream blocks (map task count — and
    # the sort-shuffle's per-block cost — tracks block count, and LSH/band
    # stages emit many tiny blocks); 64k rows ≈ tens of MB with signatures
    both = target.map_batches(
        add_bucket(False), batch_format="pyarrow", batch_size=65536
    ).union(
        source.map_batches(add_bucket(True), batch_format="pyarrow",
                           batch_size=65536)
    )

    def gather(g: pa.Table) -> pa.Table:
        empty = tgt_schema.empty_table().append_column(
            out_col, pa.array([], val_type)
        )
        mask = g["__src"].combine_chunks()
        src = g.filter(mask)
        tgt = g.filter(pc.invert(mask)).select(tgt_cols)
        if tgt_prep is not None:
            tgt = tgt_prep(tgt)
        if len(tgt) == 0 or len(src) == 0:
            return empty
        keys_src = src[key_col].to_numpy(zero_copy_only=False)
        order = np.argsort(keys_src, kind="stable")
        keys_sorted = keys_src[order]
        if width:
            vals = (
                src["__val"].combine_chunks().flatten()
                .to_numpy(zero_copy_only=False).reshape(len(src), width)[order]
            )
        else:
            vals = src["__val"].to_numpy(zero_copy_only=False)[order]
        tk = tgt[key_col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(keys_sorted, tk)
        idx_c = np.minimum(idx, len(keys_sorted) - 1)
        ok = keys_sorted[idx_c] == tk
        if not ok.all():
            tgt = tgt.filter(pa.array(ok))
            idx_c = idx_c[ok]
        if len(tgt) == 0:
            return empty
        # chunked gather: bounded allocations under memory pressure
        step = 262_144
        if width:
            out = np.empty((len(idx_c), width), dtype=vals.dtype)
            for lo in range(0, len(idx_c), step):
                out[lo : lo + step] = vals[idx_c[lo : lo + step]]
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(out.reshape(-1), pa.int64()), width
            )
        else:
            out = vals[idx_c]
            col = pa.array(out, pa.int64())
        return tgt.append_column(out_col, col)

    return both.groupby("__bucket").map_groups(gather, batch_format="pyarrow")


def distributed_verify_pairs(pairs_ds, sigs_ds, id_col: str = "doc_id",
                             num_perm: int = 64, threshold: float = 0.8,
                             buckets: int = 32):
    """Fully distributed candidate verification (the 100 TB path the
    round-1 driver-side :func:`verify_pairs` documented): hash-co-partition
    the pair list with the signature table twice (once per pair side) via
    :func:`_attach_by_key`, then a vectorized per-batch signature-agreement
    estimate keeps pairs ≥ ``threshold``.  Pairs repeated across LSH
    partitions dedupe inside the first attach's buckets (same ``id_a`` ⇒
    same bucket ⇒ bucket-local dedupe is exact and global) — no separate
    dedup shuffle.  Signatures never land on the driver."""

    def as_kv(key: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({key: t[id_col], "__val": t["sig"]})

        return f

    def dedupe(t: pa.Table) -> pa.Table:
        return t.group_by(["id_a", "id_b"]).aggregate([])

    p1 = _attach_by_key(
        pairs_ds.map_batches(
            lambda t: t.select(["id_a", "id_b"]), batch_format="pyarrow"
        ),
        sigs_ds.map_batches(as_kv("id_a"), batch_format="pyarrow"),
        "id_a", "sig_a", width=num_perm, buckets=buckets, tgt_prep=dedupe,
    )
    p2 = _attach_by_key(
        p1, sigs_ds.map_batches(as_kv("id_b"), batch_format="pyarrow"),
        "id_b", "sig_b", width=num_perm, buckets=buckets,
    )

    def estimate(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "est_jaccard": pa.array([], pa.float64()),
                }
            )
        a = (
            t["sig_a"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(len(t), num_perm)
        )
        b = (
            t["sig_b"].combine_chunks().flatten()
            .to_numpy(zero_copy_only=False).reshape(len(t), num_perm)
        )
        est = (a == b).mean(axis=1)
        keep = est >= threshold
        return pa.table(
            {
                "id_a": t["id_a"].filter(pa.array(keep)),
                "id_b": t["id_b"].filter(pa.array(keep)),
                "est_jaccard": pa.array(est[keep], pa.float64()),
            }
        )

    return p2.map_batches(estimate, batch_format="pyarrow")


def _unionfind_block(t: pa.Table) -> pa.Table:
    """Union-find over one edge block → (node, label=min id of component).
    Runs INSIDE a Ray task (the small-edge-set components path)."""
    src = t["src"].to_pylist()
    dst = t["dst"].to_pylist()
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted(set(src))  # edges are symmetric: src covers every node
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "label": pa.array([find(x) for x in nodes], pa.int64()),
        }
    )


def label_propagation_components(pairs_ds, buckets: int = 32,
                                 max_iters: int = 64,
                                 small_edges_threshold: int = 2_000_000):
    """Distributed connected components over the verified near-dup pairs
    (the groupby plan :func:`union_find_components` documents as the scale
    path).  Returns a Dataset ``(node, label=min id of component)`` for
    every node in an edge.

    Two regimes, both driver-free:

    * |edges| ≤ ``small_edges_threshold``: the symmetric edge set is
      repartitioned to ONE block and a single Ray TASK runs union-find
      (~32 MB at the default threshold — the verified pair set is orders
      of magnitude below corpus size, so this is the common case).
    * larger: iterative min-label propagation WITH POINTER JUMPING —
      each round propagates labels across edges (one
      :func:`_attach_by_key` co-partition shuffle + combiner groupby-min)
      and then jumps ``label ← min(label, label(label))``, so convergence
      takes O(log diameter) rounds instead of O(diameter) (long chains
      would otherwise pay one full shuffle round per hop).  The only
      driver value per round is the scalar label sum used as the
      convergence test (labels only decrease — fixed sum ⇒ done).
    """
    from .agg import partial_agg_groupby

    def sym(t: pa.Table) -> pa.Table:
        ia = t["id_a"].combine_chunks()
        ib = t["id_b"].combine_chunks()
        return pa.table(
            {
                "src": pa.concat_arrays([ia, ib]),
                "dst": pa.concat_arrays([ib, ia]),
            }
        )

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow").materialize()
    if edges.count() <= small_edges_threshold:
        return (
            edges.repartition(1)
            .map_batches(_unionfind_block, batch_format="pyarrow",
                         batch_size=None)
            .materialize()
        )

    def init(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(s, pa.int64()),
                "label": pa.array(np.minimum(s, d), pa.int64()),
            }
        )

    labels = partial_agg_groupby(
        edges.map_batches(init, batch_format="pyarrow"),
        ["node"], [("label", "min", "label")],
    ).materialize()
    prev = None
    for _ in range(max_iters):
        # 1) neighbor propagation: node ← min(label of each neighbor)
        lab_kv = labels.map_batches(
            lambda t: pa.table({"src": t["node"], "__val": t["label"]}),
            batch_format="pyarrow",
        )
        prop = _attach_by_key(edges, lab_kv, "src", "lab", width=0,
                              buckets=buckets).map_batches(
            lambda t: pa.table({"node": t["dst"], "label": t["lab"]}),
            batch_format="pyarrow",
        )
        # 2) pointer jump: node ← label(label(node)) — collapses chains
        #    exponentially (label values are node ids, so the label table
        #    itself is the lookup source)
        jump_kv = labels.map_batches(
            lambda t: pa.table({"label": t["node"], "__val": t["label"]}),
            batch_format="pyarrow",
        )
        jumped = _attach_by_key(labels, jump_kv, "label", "lab2", width=0,
                                buckets=buckets).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["lab2"]}),
            batch_format="pyarrow",
        )
        # repartition pins the label table's block count: the union
        # sums three block lists (prop + jumped + labels) and the
        # groupby preserves the union's count, so an unpinned loop
        # grows ~3x blocks per round (see graph.pagerank for the same
        # fix) — per-block task overhead would swamp late rounds
        labels = partial_agg_groupby(
            prop.union(jumped).union(labels), ["node"],
            [("label", "min", "label")],
        ).repartition(buckets).materialize()
        s = labels.sum("label")
        if s == prev:
            break
        prev = s
    return labels


def sig_matrix(sig_table: pa.Table, id_col: str = "doc_id"):
    """(sorted ids (N,), signature matrix (N, P)) from a (id, sig) Arrow
    table — zero-copy flatten, no per-row Python."""
    ids = sig_table[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    col = sig_table["sig"].combine_chunks()
    mat = col.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), -1)
    order = np.argsort(ids)
    return ids[order], mat[order]


def verify_pairs(pairs: pd.DataFrame, ids_sorted: np.ndarray,
                 mat: np.ndarray, threshold: float) -> pd.DataFrame:
    """Estimate Jaccard for each candidate pair from minhash signatures
    and keep those >= threshold — fully vectorized (searchsorted gather +
    one equality reduction over all pairs).

    The signature matrix here is a broadcastable table (fits one node for
    corpora whose candidate ids do — the common case); at 1e10-doc scale,
    hash-partition the pair list by id and join the signature table per
    partition instead."""
    if not len(pairs):
        out = pairs.copy()
        out["est_jaccard"] = np.empty(0, dtype=np.float64)
        return out
    ia = np.searchsorted(ids_sorted, pairs["id_a"].to_numpy())
    ib = np.searchsorted(ids_sorted, pairs["id_b"].to_numpy())
    # chunked gather: bounded allocations (a single multi-GB fancy-index
    # stalls on first-touch page faults under memory pressure)
    est = np.empty(len(ia), dtype=np.float64)
    step = 262_144
    for lo in range(0, len(ia), step):
        hi = lo + step
        est[lo:hi] = (mat[ia[lo:hi]] == mat[ib[lo:hi]]).mean(axis=1)
    out = pairs.copy()
    out["est_jaccard"] = est
    return out[out["est_jaccard"] >= threshold]


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def bucket_candidate_pairs(
    group: pd.DataFrame, id_col: str, threshold: float
) -> pd.DataFrame:
    """Inside one LSH bucket: emit (id_a, id_b, est_jaccard) for pairs whose
    signature-estimated Jaccard clears ``threshold``.  Buckets are small by
    construction (same band hash ⇒ near-identical band); guard the
    quadratic with a cap + sorted-id determinism."""
    g = group.sort_values(id_col)
    ids = g[id_col].to_numpy()
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []})
    sigs = np.stack([np.asarray(s, dtype=np.int64) for s in g["sig"]])
    cap = 256  # hot-bucket guard: identical-content floods stay bounded
    ids, sigs = ids[:cap], sigs[:cap]
    eq = (sigs[:, None, :] == sigs[None, :, :]).mean(axis=2)
    ia, ib = np.triu_indices(len(ids), k=1)
    est = eq[ia, ib]
    keep = est >= threshold
    return pd.DataFrame(
        {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "est_jaccard": est[keep]}
    )


def union_find_components(pairs: "pd.DataFrame") -> dict:
    """Driver-side union-find over the (small) near-duplicate pair set.
    Scale assumption (documented): |pairs| ≈ number of actual near-dup
    relations, orders of magnitude below corpus size; if a corpus breaks
    this, switch to the iterative min-label-propagation groupby."""
    parent: dict = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in zip(pairs["id_a"], pairs["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


# -- SimHash ---------------------------------------------------------------


class SimHasher:
    """64-bit SimHash over whitespace tokens (Charikar 2002).  Token hashes
    via the same universal hash family; bit-matrix accumulation in numpy."""

    def __init__(self, col: str = "text", out: str = "simhash", seed: int = 7) -> None:
        self.col = col
        self.out = out
        self.seed = seed

    def _token_hashes(self, text: str) -> np.ndarray:
        toks = text.lower().split()
        if not toks:
            return np.empty(0, dtype=np.uint64)
        return hash_strs64(toks)

    @_ignore_overflow
    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        shifts = np.arange(64, dtype=np.uint64)
        for t in batch[self.col].to_pylist():
            hs = self._token_hashes(t or "")
            if len(hs) == 0:
                out.append(0)
                continue
            bits = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
            votes = (bits * 2 - 1).sum(axis=0)
            sim = np.bitwise_or.reduce(
                (votes > 0).astype(np.uint64) << shifts
            )
            out.append(int(np.int64(sim.astype(np.int64))))
        return batch.append_column(self.out, pa.array(out, pa.int64()))


@_ignore_overflow
def hash_str64(s: str) -> np.uint64:
    """Deterministic (process-independent) 64-bit string hash: FNV-1a."""
    h = np.uint64(14695981039346656037)
    for byte in s.encode("utf-8"):
        h = np.uint64((h ^ np.uint64(byte)) * np.uint64(1099511628211))
    return h


@_ignore_overflow
def hash_strs64(tokens) -> np.ndarray:
    """Vectorized FNV-1a over a token list — bit-identical to
    :func:`hash_str64` per element.  FNV is byte-sequential, so the
    vectorization runs over byte POSITIONS (bounded by the longest
    token, ~tens) with whole-array ops per position, instead of a
    Python-level loop over every byte of every token (the hot inner
    loop of SimHash and n-gram shingling)."""
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bs = [t.encode("utf-8") for t in tokens]
    lens = np.fromiter((len(b) for b in bs), np.int64, count=n)
    m = int(lens.max())
    h = np.full(n, np.uint64(14695981039346656037))
    if m == 0:
        return h
    flat = np.frombuffer(b"".join(bs), dtype=np.uint8)
    ends = np.cumsum(lens)
    starts = ends - lens
    buf = np.zeros((n, m), dtype=np.uint8)
    idx = np.arange(len(flat), dtype=np.int64)
    rows = np.searchsorted(ends, idx, side="right")
    buf[rows, idx - starts[rows]] = flat
    F = np.uint64(1099511628211)
    for j in range(m):
        live = lens > j
        h[live] = (h[live] ^ buf[live, j].astype(np.uint64)) * F
    return h


def simhash_bands(batch: pa.Table, col: str = "simhash", n_bands: int = 4) -> pa.Table:
    """Split the 64-bit simhash into ``n_bands`` 16-bit band keys →
    candidates for hamming-distance near-dup grouping (two docs within
    hamming distance n_bands-1 share ≥1 band)."""
    h = batch[col].to_numpy(zero_copy_only=False).astype(np.uint64)
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)
    t = batch
    for bd in range(n_bands):
        band = ((h >> np.uint64(bd * width)) & mask).astype(np.int64)
        t = t.append_column(f"simband_{bd}", pa.array(band, pa.int64()))
    return t


# -- exact n-gram Jaccard (verification-grade) ----------------------------


def word_ngram_jaccard_pairs(ds, id_col: str = "doc_id",
                             text_col: str = "text", n: int = 2,
                             max_df: int = 50,
                             threshold: "tuple[int, int]" = (3, 5),
                             num_partitions: int = 32,
                             attach_buckets: int = 16):
    """EXACT word n-gram Jaccard near-dup pairs, distributed end-to-end
    (the dedup family's exact-set variant; MinHash+LSH is the sampled
    approximation of the same measure):

    1. per-doc DISTINCT n-gram hash rows from ``map_batches`` (string
       kernel per doc; token hashes FNV, gram hash a polynomial combine);
    2. ONE ``grouped_apply`` shuffle partitions rows by gram: ubiquitous
       grams (document frequency > ``max_df``) are DROPPED — the df cut
       bounds the per-gram pair fan-out (stopword grams would otherwise
       emit O(N²) rows) and is part of the operator contract, mirrored
       exactly in the SQL oracle; surviving grams emit co-occurrence
       pair rows and per-doc gram-count rows;
    3. combiner groupbys: ``|A∩B|`` per pair, ``|A|`` per doc;
    4. two :func:`_attach_by_key` co-partitions attach ``|A|``/``|B|``;
       an integer cross-multiplication keeps pairs with Jaccard ≥
       num/den — no float compare, byte-exact vs the oracle.

    Returns a Dataset ``(id_a, id_b)`` with ``id_a < id_b``.
    """
    from .agg import partial_sum_groupby, partitioned_apply_arrow

    num, den = threshold

    @_ignore_overflow
    def gram_rows(t: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        grams_out: list[np.ndarray] = []
        B = np.uint64(1_000_003)
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = (txt or "").strip().lower().split()
            if len(toks) < n:
                continue
            th = hash_strs64(toks)
            g = th[: len(th) - n + 1].copy()
            for j in range(1, n):  # n-1 vectorized combines
                g = g * B + th[j : len(th) - n + 1 + j]
            g = np.unique(g)
            ids_out.extend([i] * len(g))
            grams_out.append(g)
        g_all = (
            np.concatenate(grams_out) if grams_out else np.empty(0, np.uint64)
        )
        return pa.table(
            {
                "doc": pa.array(ids_out, pa.int64()),
                "g": pa.array(g_all.astype(np.int64), pa.int64()),
            }
        )

    def gram_partition(t: pa.Table) -> pa.Table:
        # Arrow-native pair enumeration over the whole hash partition
        # (round 5 — replaces a per-gram pandas body): one sort_by on
        # (g, doc), numpy segment sizes, df cut per segment, then pair
        # rows generated size-class by size-class — all groups of equal
        # size s enumerate their s·(s-1)/2 pairs in ONE gather (a
        # (groups, s) matrix indexed by triu) — ≤ max_df size classes,
        # no per-group Python.  Emits pair rows (a, b, 1) + per-doc
        # count rows (doc, -1, 1); ids are non-negative, so b = -1 is a
        # safe sentinel.
        s_t = t.sort_by([("g", "ascending"), ("doc", "ascending")])
        g = s_t["g"].to_numpy(zero_copy_only=False)
        d = s_t["doc"].to_numpy(zero_copy_only=False)
        n = len(g)
        if n == 0:
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        first = np.ones(n, dtype=bool)
        first[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, n))
        keep_grp = sizes <= max_df  # df cut: ubiquitous gram, no signal
        count_docs = d[np.repeat(keep_grp, sizes)]
        a_parts = [count_docs]
        b_parts = [np.full(len(count_docs), -1, np.int64)]
        for s_val in np.unique(sizes[keep_grp]):
            if s_val < 2:
                continue
            idx = starts[keep_grp & (sizes == s_val)]
            mat = d[idx[:, None] + np.arange(s_val)[None, :]]
            ia, ib = np.triu_indices(int(s_val), k=1)
            a_parts.append(mat[:, ia].ravel())
            b_parts.append(mat[:, ib].ravel())
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        return pa.table(
            {
                "a": pa.array(a, pa.int64()),
                "b": pa.array(b, pa.int64()),
                "w": pa.array(np.ones(len(a), np.int64), pa.int64()),
            }
        )

    # materialized: consumed twice (pair split + count split) — lazy would
    # re-run the gram shuffle per consumer
    rows = partitioned_apply_arrow(
        ds.map_batches(gram_rows, batch_format="pyarrow"),
        "g", gram_partition, num_partitions=num_partitions,
        out_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()), ("w", pa.int64())]
        ),
    ).materialize()
    import pyarrow.compute as pc

    def split_pairs(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "b" not in t.column_names:  # schema-less empties
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "w": pa.array([], pa.int64()),
                }
            )
        return t.filter(pc.greater_equal(t["b"], 0)).rename_columns(
            ["id_a", "id_b", "w"]
        )

    def split_counts(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "b" not in t.column_names:
            return pa.table(
                {"doc": pa.array([], pa.int64()), "w": pa.array([], pa.int64())}
            )
        return (
            t.filter(pc.less(t["b"], 0)).select(["a", "w"]).rename_columns(
                ["doc", "w"]
            )
        )

    pair_rows = rows.map_batches(split_pairs, batch_format="pyarrow")
    cnt_rows = rows.map_batches(split_counts, batch_format="pyarrow")
    inter = partial_sum_groupby(pair_rows, ["id_a", "id_b"], {"w": "i"})
    counts = partial_sum_groupby(cnt_rows, ["doc"], {"w": "n"})

    def as_kv(key: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({key: t["doc"], "__val": t["n"]})

        return f

    p1 = _attach_by_key(
        inter, counts.map_batches(as_kv("id_a"), batch_format="pyarrow"),
        "id_a", "na", width=0, buckets=attach_buckets,
    )
    p2 = _attach_by_key(
        p1, counts.map_batches(as_kv("id_b"), batch_format="pyarrow"),
        "id_b", "nb", width=0, buckets=attach_buckets,
    )

    def keep(t: pa.Table) -> pa.Table:
        i = t["i"].to_numpy(zero_copy_only=False)
        na = t["na"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        mask = den * i >= num * (na + nb - i)
        return t.select(["id_a", "id_b"]).filter(pa.array(mask))

    return p2.map_batches(keep, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    sa, sb = shingle_hashes(text_a, k), shingle_hashes(text_b, k)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def hamming_near_dup_pairs(ds, col: str, id_col: str, n_bands: int | None = None,
                           max_hamming: int = 6, num_partitions: int = 32,
                           max_group: int = 8192, id_type=None):
    """Near-dup pairs on a 64-bit fingerprint column (phash / simhash) by
    hamming distance: band the hash into ``n_bands`` keys, group per band,
    verify exact popcount <= max_hamming.  The phash near-dup hook
    (SURVEY N10).

    Pigeonhole guarantee: two hashes within hamming ``n_bands - 1`` share
    at least one band, so full recall at ``max_hamming`` needs
    ``n_bands >= max_hamming + 1``; when ``n_bands`` is omitted it is
    derived (the smallest divisor of 64 above ``max_hamming``).

    ``id_type`` (pyarrow type, optional): a corpus with NO near-dups
    yields an all-empty pair set whose schema Ray drops entirely; pass
    the id column's type so the output keeps a typed
    (id_a, id_b, hamming) schema that downstream joins/groupbys accept."""
    import pandas as pd_

    from .agg import grouped_apply

    if n_bands is None:
        n_bands = next(b for b in (2, 4, 8, 16, 32) if b > max_hamming)
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} cannot guarantee recall at max_hamming="
            f"{max_hamming}; need n_bands >= max_hamming + 1"
        )
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def emit(t: pa.Table) -> pa.Table:
        h = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = t[id_col]
        parts = []
        for bd in range(n_bands):
            band = ((h >> np.uint64(bd * width)) & mask).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        id_col: ids,
                        col: t[col],
                        "band_id": pa.array(
                            np.full(len(t), bd, dtype=np.int32), pa.int32()
                        ),
                        "band_val": pa.array(band, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    bands = ds.map_batches(emit, batch_format="pyarrow")

    def pairs(g: "pd_.DataFrame") -> "pd_.DataFrame":
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if len(g) < 2:
            return pd_.DataFrame({"id_a": [], "id_b": [], "hamming": []})
        if len(g) > max_group:
            # degenerate band (e.g. fingerprint 0 from empty/boilerplate
            # docs): the O(B^2) verify would OOM a worker — fail loudly,
            # naming the knob (the sibling bucket verifiers cap the same
            # way; silently dropping pairs would fake recall)
            raise ValueError(
                f"hamming band group of {len(g)} rows exceeds "
                f"max_group={max_group}; pre-filter degenerate "
                f"fingerprints or raise max_group"
            )
        ids = g[id_col].to_numpy()
        hs = g[col].to_numpy().astype(np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        keep = ham <= max_hamming
        return pd_.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "hamming": ham[keep]}
        )

    out_schema = None
    if id_type is not None:
        out_schema = pa.schema(
            [("id_a", id_type), ("id_b", id_type), ("hamming", pa.int64())]
        )
    out = grouped_apply(bands, ["band_id", "band_val"], pairs,
                        num_partitions=num_partitions,
                        out_schema=out_schema)
    return out


def edit1_pairs(ds, col: str, num_partitions: int = 32,
                max_bucket: int = 2000):
    """Fuzzy self-join at edit distance <= 1 via FastSS
    deletion-neighborhood blocking (Bocek et al., "Fast Similarity
    Search in Large Dictionaries", 2007 — public algorithm): every
    string emits itself plus each single-character-deletion variant as
    a blocking key; two strings within one edit ALWAYS share a key, so
    blocking has perfect recall and an exact verification kernel
    removes false candidates.

    Input: a Dataset with a string column ``col`` of DISTINCT values
    (callers dedupe first — identical duplicates would explode every
    bucket quadratically).  Output: Dataset (a_name, b_name), a < b,
    each pair once.

    Scale shape: the blocking-key fan-out is O(len) rows per string and
    shuffles via ``grouped_apply`` coarse partitions; per-key candidate
    enumeration is quadratic ONLY within a deletion bucket, whose size
    is vocabulary-bounded (a bucket holds strings one edit from one
    specific variant).  ``max_bucket`` guards pathological buckets the
    same way the MinHash hot-bucket cap does — an overflowing bucket
    raises rather than silently dropping pairs.  Pair dedup is one
    combiner groupby keyed by the pair itself.
    """
    import pandas as pd_

    from .agg import grouped_apply

    def expand(t: pa.Table) -> pa.Table:
        keys, names = [], []
        for s in t[col].to_pylist():
            if s is None:
                continue
            # the string ITSELF is a key (no marker prefix: a longer
            # string's deletion variant must land in the same bucket)
            keys.append(s)
            names.append(s)
            for i in range(len(s)):
                keys.append(s[:i] + s[i + 1:])
                names.append(s)
        return pa.table(
            {
                "bkey": pa.array(keys, pa.string()),
                "name": pa.array(names, pa.string()),
            }
        )

    blocked = ds.map_batches(expand, batch_format="pyarrow")

    def _ed_le1(a: str, b: str) -> bool:
        if a == b:
            return True
        la, lb = len(a), len(b)
        if abs(la - lb) > 1:
            return False
        if la == lb:  # one substitution allowed
            return sum(x != y for x, y in zip(a, b)) <= 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # b is a+1 chars: check one-deletion alignment
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    def pairs(g: pd_.DataFrame) -> pd_.DataFrame:
        names = sorted(set(g["name"]))
        if len(names) > max_bucket:
            raise ValueError(
                f"edit1_pairs: bucket for key {g['bkey'].iloc[0]!r} has "
                f"{len(names)} members (> {max_bucket}); raise max_bucket "
                "or pre-shard the vocabulary"
            )
        a_out, b_out = [], []
        for i in range(len(names)):
            for j in range(i + 1, len(names)):
                if _ed_le1(names[i], names[j]):
                    a_out.append(names[i])
                    b_out.append(names[j])
        return pd_.DataFrame({"a_name": a_out, "b_name": b_out})

    cand = grouped_apply(
        blocked, ["bkey"], pairs, num_partitions=num_partitions,
        # a vocabulary with no 1-edit neighbours yields zero pairs
        # corpus-wide: keep the string schema for the combiner groupby
        out_schema=pa.schema([("a_name", pa.string()),
                              ("b_name", pa.string())]),
    )
    # a pair can surface from several shared deletion keys: one
    # combiner groupby on the pair key dedupes it
    from .agg import partial_sum_groupby

    # the schema floor for a no-neighbours corpus goes AFTER the select:
    # Ray map stages skip 0-row blocks, so a floor pinned earlier would
    # be dropped again by the select map
    import ray.data as rd

    return partial_sum_groupby(
        cand, ["a_name", "b_name"], {}, count_as="__n"
    ).map_batches(
        lambda t: t.select(["a_name", "b_name"]), batch_format="pyarrow"
    ).union(rd.from_arrow(pa.schema(
        [("a_name", pa.string()), ("b_name", pa.string())]).empty_table()))


# -- content-defined chunking (CDC) dedup over binary payloads ---------------
#
# Gear-style rolling window hash → cut where the hash's low bits are zero
# (expected chunk = 2^avg_bits bytes) with min/max clamps, then chunk-hash
# dedup across the corpus.  The classic property: an insertion shifts byte
# offsets but re-synchronizes at the next content-defined boundary, so
# storage-level duplication is found regardless of alignment (public CDC /
# LBFS-FastCDC literature; Muthitacharoen 2001, Xia 2016).  The window
# hash is O(w) vectorized passes over the payload — no per-byte Python.

_CDC_MULT = np.uint64(0x9E3779B97F4A7C15)  # odd → full-period mod 2^64


@_ignore_overflow
def _cdc_window_hashes(buf: np.ndarray, w: int) -> np.ndarray:
    """Polynomial hash of every w-byte window (uint64 wraparound):
    H[i] = sum_j buf[i+j] * MULT^(w-1-j).  O(w) vector adds, O(n) memory.

    The w passes run over L2-sized tiles (with a w-1 overlap) rather than
    the whole buffer: at multi-MB inputs the full-width uint64 temps
    spill every pass to main memory (~16 allocations × 8n bytes of
    traffic), which measures ~2x slower than keeping the working set
    cache-resident."""
    n = buf.size
    if n < w:
        return np.empty(0, np.uint64)
    pw = np.empty(w, np.uint64)
    pw[w - 1] = np.uint64(1)
    for j in range(w - 2, -1, -1):
        pw[j] = pw[j + 1] * _CDC_MULT
    m = n - w + 1
    out = np.empty(m, np.uint64)
    tile = 1 << 14  # 16 KiB of windows → ~128 KiB uint64 working set
    tmp = np.empty(min(tile, m), np.uint64)
    for s in range(0, m, tile):
        e = min(s + tile, m)
        b = buf[s : e + w - 1].astype(np.uint64)
        acc = out[s:e]
        np.multiply(b[: e - s], pw[0], out=acc)
        t = tmp[: e - s]
        for j in range(1, w):
            np.multiply(b[j : j + e - s], pw[j], out=t)
            acc += t
    return out


def cdc_boundaries(
    data: bytes,
    avg_bits: int = 7,
    min_size: int = 32,
    max_size: int = 512,
    window: int = 16,
) -> list:
    """Chunk end offsets for ``data`` (last offset = len(data)).  A cut is
    allowed after byte p when the window ending at p hashes to 0 under the
    low ``avg_bits`` mask; the greedy walk enforces min_size/max_size and
    force-cuts at max_size when no boundary lands in range."""
    n = len(data)
    if n == 0:
        return []
    buf = np.frombuffer(data, np.uint8)
    h = _cdc_window_hashes(buf, window)
    mask = np.uint64((1 << avg_bits) - 1)
    # candidate cut AFTER byte index i+window-1 → end offset i+window
    cand = np.nonzero((h & mask) == 0)[0] + window
    return _cdc_walk(cand, n, min_size, max_size)


def _cdc_walk(cand, n: int, min_size: int, max_size: int) -> list:
    """Greedy boundary walk over sorted candidate end offsets: take the
    first candidate in [start+min_size, start+max_size], force-cut at
    max_size when none lands in range; final cut at ``n``.

    ``start`` only moves forward and ``cand`` is sorted, so one monotone
    pointer replaces per-cut binary searches (two tiny-array
    ``np.searchsorted`` per cut measured ~2x the whole kernel's cost)."""
    cl = cand.tolist() if hasattr(cand, "tolist") else list(cand)
    m = len(cl)
    cuts, start, i = [], 0, 0
    while n - start > max_size:
        lo = start + min_size
        while i < m and cl[i] < lo:
            i += 1
        end = cl[i] if i < m and cl[i] <= start + max_size \
            else start + max_size
        cuts.append(end)
        start = end
    cuts.append(n)
    return cuts


def cdc_chunk_rows(
    t: pa.Table,
    bytes_col: str = "bytes",
    id_col: str = "doc_id",
    avg_bits: int = 7,
    min_size: int = 32,
    max_size: int = 512,
) -> pa.Table:
    """Batch kernel: binary payloads → one row per chunk
    (id, occ_idx, chunk_hash int64, chunk_len).  Chunk identity is an
    8-byte blake2b of the chunk bytes.

    The rolling window hash runs ONCE over the batch's concatenated
    payloads (16 vector passes over the whole buffer) instead of per
    document — at web payload sizes (~KBs) the per-doc variant is
    dominated by numpy small-array call overhead, not hashing.  Windows
    that straddle a document boundary are excluded by construction
    (per-doc candidate ranges via searchsorted on the offset table), so
    the boundaries are byte-identical to :func:`cdc_boundaries` per doc."""
    import hashlib

    window = 16
    datas = [bytes(d) if d is not None else b"" for d in
             t[bytes_col].to_pylist()]
    doc_lens = np.fromiter((len(d) for d in datas), np.int64, len(datas))
    offs = np.zeros(len(datas) + 1, np.int64)
    np.cumsum(doc_lens, out=offs[1:])
    buf = np.frombuffer(b"".join(datas), np.uint8)
    h = _cdc_window_hashes(buf, window)
    mask = np.uint64((1 << avg_bits) - 1)
    cand_g = np.nonzero((h & mask) == 0)[0]  # global window-START indices
    # window starting at g lies inside doc d iff offs[d] <= g <= offs[d+1]-w
    doc_lo = np.searchsorted(cand_g, offs[:-1], side="left")
    doc_hi = np.searchsorted(cand_g, offs[1:] - window, side="right")

    ids_out, idxs, hashes, lens = [], [], [], []
    for d, (rid, data) in enumerate(zip(t[id_col].to_pylist(), datas)):
        if not data:
            continue
        cand = cand_g[doc_lo[d]:max(doc_lo[d], doc_hi[d])] \
            - offs[d] + window
        start = 0
        for k, end in enumerate(
            _cdc_walk(cand, len(data), min_size, max_size)
        ):
            d = hashlib.blake2b(data[start:end], digest_size=8).digest()
            ids_out.append(rid)
            idxs.append(k)
            h = int.from_bytes(d, "little")
            hashes.append(h - (1 << 64) if h >= 1 << 63 else h)
            lens.append(end - start)
            start = end
    return pa.table(
        {
            id_col: pa.array(ids_out, t[id_col].type),
            "occ_idx": pa.array(idxs, pa.int32()),
            "chunk_hash": pa.array(hashes, pa.int64()),
            "chunk_len": pa.array(lens, pa.int64()),
        }
    )


def dedup_cdc(
    ds,
    bytes_col: str = "bytes",
    id_col: str = "doc_id",
    avg_bits: int = 7,
    min_size: int = 32,
    max_size: int = 512,
    num_partitions: int = 64,
    pin: "bool | str" = "auto",
    spill_dir: "str | None" = None,
    pin_threshold_bytes: int = 1 << 30,
):
    """Corpus-level CDC dedup: per-doc (n_chunks, total_bytes, dup_bytes)
    where dup_bytes = bytes of chunk occurrences that are NOT the globally
    first copy of their content (first = min (id, occ_idx), so the result
    is deterministic and the keep-set is exactly one copy per distinct
    chunk).  Fully distributed: chunking is a map_batches kernel; the
    first-copy election is a coarse hash-partitioned ``grouped_apply`` on
    chunk_hash (never a driver-side set); per-doc rollups are combiner
    groupbys; the final attach is a bucket join keyed by id.

    The slim chunk table is consumed TWICE (per-doc totals + first-copy
    election); re-executing would repeat the per-byte rolling-hash pass
    end-to-end.  ``pin`` picks how the second consumer is fed:

    - ``True`` — ``materialize()`` the chunk rows in the object store
      (fastest; right when the slim table fits in aggregate plasma).
    - ``False`` — the 100 TB path: write the chunk rows ONCE to a
      partitioned parquet spill (``spill_dir`` or a fresh /tmp dir) and
      read them twice with pruned columns, so plasma never pins a
      corpus-scale table; the per-doc result (O(docs) slim rows) is
      materialized before the spill is deleted.
    - ``"auto"`` (default) — pin below ``pin_threshold_bytes`` of input
      (estimated from dataset metadata), else spill."""
    from .agg import partial_sum_groupby, partitioned_apply_arrow
    from .relational import hash_bucket_join

    chunk_ds = ds.map_batches(
        lambda t: cdc_chunk_rows(
            t, bytes_col, id_col, avg_bits, min_size, max_size
        ),
        batch_format="pyarrow",
    )
    if pin == "auto":
        # metadata-only size probe: size_bytes() on a LAZY dataset
        # triggers a full execution (measured ~1.2s on the 5k-doc gate
        # input — it would re-run the upstream payload build), so only
        # consult sources whose size is free: a materialized dataset's
        # block metadata, or the source files of a plain read.  Unknown
        # size defaults to pin; at corpus scale callers pass pin=False
        # (or a spill_dir) explicitly.
        from ray.data.dataset import MaterializedDataset

        sz = None
        if isinstance(ds, MaterializedDataset):
            sz = ds.size_bytes()
        else:
            try:
                files = ds.input_files()
                if files:
                    import os as _os

                    sz = sum(_os.path.getsize(f) for f in files)
            except Exception:
                sz = None
        pin = sz is None or sz < pin_threshold_bytes

    spill = None
    if pin:
        chunks = chunk_ds.materialize()
        totals_src = chunks
    else:
        import tempfile as _tempfile

        import ray.data as _rd

        spill = spill_dir or _tempfile.mkdtemp(prefix="cdc_chunks_", dir="/tmp")
        chunk_ds.write_parquet(spill)
        chunks = _rd.read_parquet(spill)
        totals_src = _rd.read_parquet(spill, columns=[id_col, "chunk_len"])

    totals = partial_sum_groupby(
        totals_src, [id_col], {"chunk_len": "total_bytes"},
        count_as="n_chunks",
    )

    def elect(t: pa.Table) -> pa.Table:
        # Arrow-native first-copy election over the whole hash partition
        # (round 5 — replaces a per-group pandas sort): one sort_by on
        # (chunk_hash, id, occ_idx), then a numpy segment walk keeps
        # every occurrence EXCEPT each hash segment's first row — the
        # globally-first copy, since a chunk_hash never spans partitions.
        s = t.sort_by(
            [("chunk_hash", "ascending"), (id_col, "ascending"),
             ("occ_idx", "ascending")]
        )
        h = s["chunk_hash"].to_numpy(zero_copy_only=False)
        first = np.ones(len(s), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return s.filter(pa.array(~first)).select([id_col, "chunk_len"])

    from .relational import _pa_side_schema

    # an all-unique corpus elects zero redundant chunks: without a typed
    # schema the left join below crashes on the schema-less empty side
    # (schema() is free — chunks is materialized)
    id_field = _pa_side_schema(chunks).field(id_col)
    dup = partitioned_apply_arrow(
        chunks, ["chunk_hash"], elect,
        num_partitions=num_partitions,
        out_schema=pa.schema([id_field, pa.field("chunk_len", pa.int64())]),
    )
    dup_per_doc = partial_sum_groupby(
        dup, [id_col], {"chunk_len": "dup_bytes"},
        out_schema=pa.schema([id_field, pa.field("dup_bytes", pa.int64())]),
    )

    out = hash_bucket_join(totals, dup_per_doc, on=id_col, how="left",
                           buckets=num_partitions)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dupb = pc.fill_null(pc.cast(t["dup_bytes"], pa.int64()), 0)
        return pa.table(
            {
                id_col: t[id_col],
                "n_chunks": pc.cast(t["n_chunks"], pa.int64()),
                "total_bytes": pc.cast(t["total_bytes"], pa.int64()),
                "dup_bytes": dupb,
            }
        )

    res = out.map_batches(finish, batch_format="pyarrow")
    if spill is not None and spill_dir is None:
        # owned temp spill: the lazy result still reads from it, so pin
        # the O(docs) per-doc rollup (slim rows — NOT the chunk table)
        # before deleting the spilled chunk files.  A caller-provided
        # spill_dir is left in place (resumable / caller-managed).
        import shutil as _shutil

        res = res.materialize()
        _shutil.rmtree(spill, ignore_errors=True)
    return res


def paragraph_chunk_rows(
    t: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    max_chunks_bits: int = 20,
) -> pa.Table:
    """Split each doc into consecutive ``chunk_tokens``-token paragraphs
    (space-separated), emitting one ``(chunk, rank)`` row per paragraph
    where ``rank = doc_id << max_chunks_bits | chunk_idx`` packs the
    occurrence's position into one orderable int64.

    Fully vectorized: one RE2-free split, numpy offset arithmetic, one
    ``ListArray.from_arrays`` re-group, one ``binary_join`` — no Python
    loop over docs, tokens, or chunks.  A doc never spans batches, so
    per-batch chunking is exact."""
    import pyarrow.compute as pc

    text = pc.fill_null(t[text_col], "")
    toks = pc.split_pattern(text, " ")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    tot = int(n.sum())
    starts = np.concatenate([[0], np.cumsum(n)[:-1]])
    within = np.arange(tot, dtype=np.int64) - np.repeat(starts, n)
    chunk_starts = np.flatnonzero(within % chunk_tokens == 0)
    # int32 offsets: a block is <= a few hundred MB, far under 2**31 tokens
    offsets = np.concatenate([chunk_starts, [tot]]).astype(np.int32)
    chunks = pc.binary_join(
        pa.ListArray.from_arrays(
            pa.array(offsets), pc.cast(flat, pa.string())
        ),
        " ",
    )
    nchunks = -(-n // chunk_tokens)  # ceil; n>=1 always (split('')==[''])
    doc = np.repeat(
        t[id_col].to_numpy(zero_copy_only=False).astype(np.int64), nchunks
    )
    cstarts = np.concatenate([[0], np.cumsum(nchunks)[:-1]])
    cidx = np.arange(len(chunk_starts), dtype=np.int64) - np.repeat(cstarts, nchunks)
    if len(cidx) and int(cidx.max()) >= (1 << max_chunks_bits):
        raise ValueError(
            f"doc has >= 2**{max_chunks_bits} chunks; raise max_chunks_bits"
        )
    if len(doc):
        dmax, dmin = int(doc.max()), int(doc.min())
        if dmin < 0 or dmax >= (1 << (63 - max_chunks_bits)):
            # the shift below would silently wrap int64, corrupting the
            # first-occurrence election AND the decoded doc ids
            raise ValueError(
                f"doc ids must be in [0, 2**{63 - max_chunks_bits}) to "
                "pack with max_chunks_bits="
                f"{max_chunks_bits}; lower max_chunks_bits or remap ids"
            )
    rank = (doc << max_chunks_bits) | cidx
    return pa.table({"chunk": pc.cast(chunks, pa.string()), "rank": rank})


def paragraph_dedup(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 16,
    num_partitions: int = 32,
    max_chunks_bits: int = 20,
):
    """Corpus-wide exact paragraph dedup (the CCNet / C4 shape): every
    ``chunk_tokens``-token paragraph keeps only its FIRST occurrence in
    (doc_id, position) order; docs are rebuilt from their surviving
    paragraphs.  Returns ``(doc_id, text_clean, n_chunks)`` — docs whose
    every paragraph lost the election disappear.

    Scale shape: the only all-to-all is one min-combiner groupby keyed
    by paragraph text (per-batch pyarrow pre-min bounds the shuffle at
    one row per distinct paragraph per block).  The election result
    ALREADY encodes the surviving occurrences (rank unpacks to
    doc_id + position), so no join-back pass is needed; the rebuild is
    a coarse hash partition by doc with a vectorized in-partition sort
    + ListArray re-group + binary_join."""
    from .agg import partial_agg_groupby
    from .relational import _bucket_of

    chunks = ds.map_batches(
        lambda t: paragraph_chunk_rows(
            t, text_col, id_col, chunk_tokens, max_chunks_bits
        ),
        batch_format="pyarrow",
    )
    winners = partial_agg_groupby(chunks, ["chunk"], [("rank", "min", "rank")])

    mask = (1 << max_chunks_bits) - 1

    def decode(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        rank = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = rank >> max_chunks_bits
        out = pa.table(
            {
                id_col: pa.array(doc),
                "chunk_idx": pa.array(rank & mask),
                "chunk": t["chunk"],
            }
        )
        part = _bucket_of(out[id_col], num_partitions)
        return out.append_column("__part", part)

    rebuild_schema = pa.schema(
        [(id_col, pa.int64()), ("text_clean", pa.string()),
         ("n_chunks", pa.int64())]
    )

    def rebuild(t: pa.Table) -> pa.Table:
        t = t.drop(["__part"]).sort_by(
            [(id_col, "ascending"), ("chunk_idx", "ascending")]
        )
        doc = t[id_col].to_numpy(zero_copy_only=False)
        if not len(doc):
            return rebuild_schema.empty_table()
        bounds = np.flatnonzero(np.diff(doc)) + 1
        offsets = np.concatenate([[0], bounds, [len(doc)]]).astype(np.int32)
        chunk = t["chunk"].combine_chunks()
        if isinstance(chunk, pa.ChunkedArray):
            chunk = (
                chunk.chunk(0) if chunk.num_chunks == 1
                else pa.concat_arrays(chunk.chunks)
            )
        la = pa.ListArray.from_arrays(pa.array(offsets), chunk.cast(pa.string()))
        heads = np.concatenate([[0], bounds])
        return pa.table(
            {
                id_col: pa.array(doc[heads], pa.int64()),
                "text_clean": pc.binary_join(la, " "),
                "n_chunks": pa.array(
                    np.diff(offsets).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        winners.map_batches(decode, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def duplicated_substring_spans(ds, id_col: str = "doc_id",
                               text_col: str = "text", L: int = 32,
                               key: str = "gram",
                               num_partitions: int = 32):
    """Cross-document EXACT duplicated-substring span report — the
    substring-level dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499), re-expressed
    as ONE gram-keyed shuffle instead of a global suffix array:

    a char range [s, s+L) of a doc is *duplicated* when the L-char gram
    starting at s appears verbatim in >= 2 distinct docs; overlapping or
    touching duplicated ranges merge into maximal spans.

    * stage 1 (map_batches): one row per gram start position per doc.
      ``key="gram"`` carries the gram itself as UTF-32-LE bytes (fixed
      4 bytes/char, so byte-equality <=> char-equality; EXACT, zero
      collision risk — the oracle-checkable mode; construction is one
      ``sliding_window_view`` copy + one zero-copy Arrow binary build
      per batch, no per-position Python).  ``key="hash64"`` carries the
      vectorized polynomial rolling hash over codepoints (L numpy ops
      per doc) — the 100 TB path: 8-byte keys shrink the shuffle vs
      4L-byte grams; a collision can only OVER-mark one span
      (P ~ n^2/2^64), never miss a duplicate.  Both modes are asserted
      equal on the same corpus by the test suite.
    * stage 2: hash-partition by gram key (a key never spans
      partitions); per partition one vectorized
      ``transform('nunique')`` keeps positions whose gram occurs in
      >= 2 distinct docs — no per-gram task dispatch.
    * stage 3: hash-partition by doc; per partition a vectorized
      gaps-and-islands merge (cumsum over gap > L breaks) emits
      (doc_id, span_start, span_end, span_chars), the distributed
      ``SUM(brk) OVER (PARTITION BY doc ORDER BY pos)`` window.

    Shuffle volume is O(total chars) rows — inherent to exact substring
    dedup (a suffix array moves the same data); the MinHash/winnow
    family in this module is the cheaper approximate tier.  No reference
    equivalent (the reference is a per-document selector library).
    """
    import pandas as pd

    from .relational import _bucket_of

    if key not in ("gram", "hash64"):
        raise ValueError(f"key must be 'gram' or 'hash64' (got {key!r})")

    @_ignore_overflow
    def gram_rows(t: pa.Table) -> pa.Table:
        ids, texts = t[id_col].to_pylist(), t[text_col].to_pylist()
        doc_out, pos_out, win_out, h_out = [], [], [], []
        B = np.uint64(1_000_003)
        for i, txt in zip(ids, texts):
            if txt is None:
                continue
            a = np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
            m = len(a) - L + 1
            if m <= 0:
                continue
            doc_out.append(np.full(m, i, np.int64))
            pos_out.append(np.arange(m, dtype=np.int64))
            if key == "gram":
                win_out.append(
                    np.ascontiguousarray(
                        np.lib.stride_tricks.sliding_window_view(a, L)
                    )
                )
            else:
                h = np.zeros(m, dtype=np.uint64)
                pw = np.uint64(1)
                a64 = a.astype(np.uint64) + np.uint64(1)
                for j in range(L - 1, -1, -1):
                    h += a64[j : j + m] * pw
                    pw = np.uint64(pw * B)
                h_out.append(h)
        n = sum(len(d) for d in doc_out)
        if key == "gram":
            if n:
                flat = np.concatenate(win_out).reshape(n, L)
                # int64 offsets + large_binary: a batch of long docs can
                # exceed 2^31 gram bytes (n * 4L), where int32 offsets
                # would silently wrap and corrupt the keys
                offs = pa.py_buffer(
                    (np.arange(n + 1, dtype=np.int64) * (4 * L)).tobytes()
                )
                g_arr = pa.Array.from_buffers(
                    pa.large_binary(), n,
                    [None, offs, pa.py_buffer(flat.tobytes())],
                )
            else:
                g_arr = pa.array([], pa.large_binary())
        else:
            g_arr = pa.array(
                (np.concatenate(h_out) if n else np.empty(0, np.uint64))
                .astype(np.int64),
                pa.int64(),
            )
        return pa.table(
            {
                "g": g_arr,
                "doc": pa.array(
                    np.concatenate(doc_out) if n else np.empty(0, np.int64),
                    pa.int64(),
                ),
                "pos": pa.array(
                    np.concatenate(pos_out) if n else np.empty(0, np.int64),
                    pa.int64(),
                ),
            }
        )

    def add_gpart(t: pa.Table) -> pa.Table:
        return t.append_column("__part", _bucket_of(t["g"], num_partitions))

    def keep_shared(t: pa.Table) -> pa.Table:
        # keep (doc,pos) rows whose gram appears in >= 2 distinct docs —
        # pure arrow: sort by (g, doc), segment by g, count distinct docs
        # per segment via adjacent-inequality, all vectorized
        t = t.drop(["__part"])
        n = len(t)
        if n == 0:
            return pa.table(
                {"doc": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        t = t.sort_by([("g", "ascending"), ("doc", "ascending")])
        g_col = t["g"].combine_chunks()
        d = t["doc"].to_numpy(zero_copy_only=False)
        same_g = np.zeros(n, dtype=bool)
        if n > 1:
            same_g[1:] = pc.fill_null(
                pc.equal(g_col.slice(1, n - 1), g_col.slice(0, n - 1)), False
            ).to_numpy(zero_copy_only=False)
        new_pair = np.ones(n, dtype=bool)
        if n > 1:
            new_pair[1:] = (~same_g[1:]) | (d[1:] != d[:-1])
        seg_id = np.cumsum(~same_g) - 1
        uniq = np.bincount(seg_id, weights=new_pair)
        keep = uniq[seg_id] >= 2
        return t.select(["doc", "pos"]).filter(pa.array(keep))

    marked = (
        ds.map_batches(gram_rows, batch_format="pyarrow")
        .map_batches(add_gpart, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(keep_shared, batch_format="pyarrow")
    )

    def add_dpart(t: pa.Table) -> pa.Table:
        return t.append_column("__part", _bucket_of(t["doc"], num_partitions))

    span_schema = pa.schema(
        [(id_col, pa.int64()), ("span_start", pa.int64()),
         ("span_end", pa.int64()), ("span_chars", pa.int64())]
    )

    def spans(t: pa.Table) -> pa.Table:
        t = t.drop(["__part"])
        if len(t) == 0:
            return span_schema.empty_table()
        t = t.sort_by([("doc", "ascending"), ("pos", "ascending")])
        d = t["doc"].to_numpy(zero_copy_only=False)
        p = t["pos"].to_numpy(zero_copy_only=False)
        brk = np.ones(len(t), dtype=bool)
        brk[1:] = (d[1:] != d[:-1]) | (p[1:] > p[:-1] + L)
        heads = np.flatnonzero(brk)
        lasts = np.append(heads[1:] - 1, len(t) - 1)
        starts = p[heads]
        ends = p[lasts] + L
        return pa.table(
            {id_col: pa.array(d[heads], pa.int64()),
             "span_start": pa.array(starts, pa.int64()),
             "span_end": pa.array(ends, pa.int64()),
             "span_chars": pa.array(ends - starts, pa.int64())}
        )

    return (
        marked.map_batches(add_dpart, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(spans, batch_format="pyarrow")
    )


def orbit_hamming_near_dup_pairs(ds, hashes_col: str, id_col: str,
                                 n_bands: int = 8, max_hamming: int = 6,
                                 num_partitions: int = 32,
                                 max_group: int = 8192):
    """Rotation/mirror-robust Hamming near-dup pairs: each row carries
    the 8 dihedral-orbit perceptual hashes (``list<int64>``, orientation
    order 1-8 — :func:`parsel_ray.images.codecs.phash_orbit64`'s
    constituents), and two images are near-dups when the MINIMUM
    Hamming distance over all 8x8 orientation combinations is
    <= ``max_hamming`` — a lossy (re-encoded / perturbed) rotated copy
    that plain single-orientation banding scatters across buckets.

    Distribution: every image indexes under each of its 8 orientation
    hashes' bands (pigeonhole: the (i, j) pair realizing the min shares
    a band when ``n_bands > max_hamming``, so recall is guaranteed at
    the stated threshold); per-image duplicate band keys collapse
    before the shuffle, so fan-out is <= 8 x n_bands slim rows per
    image with the 64-byte hash vector attached.  Per-band verification
    is one vectorized (pairs, 8, 8) xor-popcount.  Pair dedup across
    bands is a combiner groupby on the pair key.
    """
    import pandas as pd_

    from .agg import grouped_apply, partial_agg_groupby

    if 64 % n_bands or n_bands < 2:
        raise ValueError("n_bands must divide 64 and be >= 2")
    if n_bands <= max_hamming:
        raise ValueError(
            f"n_bands={n_bands} cannot guarantee recall at "
            f"max_hamming={max_hamming}"
        )
    width = 64 // n_bands
    mask = np.uint64((1 << width) - 1)

    def emit(t: pa.Table) -> pa.Table:
        # fully vectorized banding (mirrors hamming_near_dup_pairs.emit):
        # whole-column shift/mask per band, per-(row, band) dedup via one
        # np.unique over packed keys, 64-byte orbit vectors sliced from a
        # single buffer — no per-image Python loop
        n = len(t)
        col = t[hashes_col].combine_chunks()
        import pyarrow.compute as _pc

        flat = col.flatten() if n else pa.array([], pa.int64())
        if n and (
            col.null_count
            or flat.null_count  # a null ELEMENT turns to_numpy float64,
            # silently corrupting every hash in the batch above 2^53
            or not _pc.all(
                _pc.equal(_pc.list_value_length(col), 8)
            ).as_py()
        ):
            raise ValueError(f"{hashes_col} must hold 8 non-null hashes")
        H = (
            flat.to_numpy(zero_copy_only=False)
            .reshape(n, 8).astype(np.uint64)
        )
        vecs = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(64), n,
            [None, pa.py_buffer(H.astype("<i8").tobytes())],
        )
        rows8 = np.repeat(np.arange(n, dtype=np.int64), 8)
        row_parts, bid_parts, bval_parts = [], [], []
        for bd in range(n_bands):
            bv = ((H >> np.uint64(bd * width)) & mask).astype(np.int64)
            packed = np.unique((rows8 << np.int64(width)) | bv.ravel())
            row_parts.append(packed >> np.int64(width))
            bval_parts.append(packed & np.int64(mask))
            bid_parts.append(np.full(len(packed), bd, np.int32))
        rows = np.concatenate(row_parts) if row_parts else \
            np.empty(0, np.int64)
        take = pa.array(rows, pa.int64())
        return pa.table(
            {
                id_col: t[id_col].combine_chunks().take(take),
                "band_id": pa.array(np.concatenate(bid_parts), pa.int32()),
                "band_val": pa.array(np.concatenate(bval_parts), pa.int64()),
                "vec": vecs.take(take),
            }
        )

    bands = ds.map_batches(emit, batch_format="pyarrow")

    empty = pd_.DataFrame(
        {"id_a": pd_.Series([], dtype="int64"),
         "id_b": pd_.Series([], dtype="int64"),
         "hamming": pd_.Series([], dtype="int64")}
    )

    def pairs(g: "pd_.DataFrame") -> "pd_.DataFrame":
        g = g.sort_values(id_col).drop_duplicates(id_col)
        if len(g) < 2:
            return empty
        if len(g) > max_group:
            raise ValueError(
                f"orbit hamming band group of {len(g)} rows exceeds "
                f"max_group={max_group}; pre-filter degenerate "
                f"fingerprints or raise max_group"
            )
        ids = g[id_col].to_numpy()
        vecs = np.stack(
            [np.frombuffer(v, dtype=np.int64) for v in g["vec"]]
        ).astype(np.uint64)  # (n, 8)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = vecs[ia][:, :, None] ^ vecs[ib][:, None, :]  # (P, 8, 8)
        ham = np.zeros(x.shape, dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x = x >> np.uint64(1)
        d = ham.min(axis=(1, 2))
        keep = d <= max_hamming
        return pd_.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
             "hamming": d[keep]}
        )

    out = grouped_apply(
        bands, ["band_id", "band_val"], pairs,
        num_partitions=num_partitions,
        # orbit ids are always the packed int64s (the typed `empty`
        # frame above is filtered out when every group is pair-free, so
        # the schema must be re-pinned here)
        out_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("hamming", pa.int64())]),
    )
    # a pair can surface from several shared bands: one combiner groupby
    # on the pair key keeps a single row (hamming is identical everywhere)
    return partial_agg_groupby(
        out, ["id_a", "id_b"], [("hamming", "min", "hamming")],
        out_schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64()),
                              ("hamming", pa.int64())]),
    )
