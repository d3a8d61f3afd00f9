"""Join / lookup building blocks (the reference has none — parsel is a
per-document library; these are the engine's relational layer, built the
Ray-Data-idiomatic way).

* ``broadcast_lookup`` — small side shipped ONCE via ``ray.put``, resolved
  lazily per worker, Arrow-native ``pa.Table.join`` per zero-copy batch.
  No shuffle.  Use for dimension tables / vocab / blocklists.
* ``hash_bucket_join`` — both sides large: add ``bucket = hash(key) % B``
  to each side, tag, union, one ``groupby("bucket")`` shuffle, pairwise
  pandas merge inside ``map_groups``.  B is explicit.
* ``salted_bucket_join`` — the skew mitigation: hot keys replicated on
  the right / content-salted on the left, joined on composite sub-keys.
* ``broadcast_semi_join`` / ``anti`` — exact key-set membership filter
  inside ``map_batches``; ``BloomFilter`` / ``build_bloom`` /
  ``bloom_semi_join`` — the at-scale approximate prefilter (no false
  negatives; pair with an exact join for exact results).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


class LazyRef:
    """A ``ray.put`` ref resolved lazily inside the task/actor.

    Kernel instances close over the REF (tiny, pickles fine); the payload is
    fetched from the local object store on first use in each worker process
    (zero-copy plasma read — the broadcast is shipped once per node, never
    per batch, and never pickled into the task closure)."""

    __slots__ = ("ref", "_val", "_have")

    def __init__(self, ref) -> None:
        self.ref = ref
        self._val = None
        self._have = False

    def get(self):
        if not self._have:
            import ray

            self._val = ray.get(self.ref)
            self._have = True
        return self._val

    def __getstate__(self):
        return self.ref

    def __setstate__(self, ref):
        self.ref = ref
        self._val = None
        self._have = False


_ARROW_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


class BroadcastMerge:
    """map_batches kernel (task mode): Arrow-native ``pa.Table.join`` of
    each zero-copy batch against a broadcast small side (``ray.put`` ref of
    a pyarrow Table, or a pandas DataFrame converted ONCE per worker).  No
    arrow->pandas->arrow copy on the hot path.

    Null-key semantics are SQL's (null never matches null) — round 4
    aligned this with ``hash_bucket_join``; the earlier pandas ``merge``
    implementation paired NaN keys."""

    def __init__(self, small_ref, on: str | Sequence[str], how: str = "inner") -> None:
        self.small = LazyRef(small_ref)
        self.on = [on] if isinstance(on, str) else list(on)
        self.how = _ARROW_JOIN_TYPE[how]
        self._tbl: pa.Table | None = None

    def _small_table(self) -> pa.Table:
        if self._tbl is None:
            side = self.small.get()
            if not isinstance(side, pa.Table):
                side = pa.Table.from_pandas(side, preserve_index=False)
            # metadata-bearing schemas are unhashable → Ray schema-dedup
            # warnings downstream; the join output inherits this schema
            self._tbl = side.replace_schema_metadata(None)
        return self._tbl

    def __call__(self, batch: pa.Table) -> pa.Table:
        small = self._small_table()
        # align key dtypes once (no-op after the first batch: the casted
        # table is cached back into self._tbl)
        for k in self.on:
            bt = batch.schema.field(k).type
            st = small.schema.field(k).type
            if bt != st:
                idx = small.schema.get_field_index(k)
                small = small.set_column(idx, k, small[k].cast(bt))
        self._tbl = small
        return batch.join(small, keys=self.on, join_type=self.how).combine_chunks()

    def __getstate__(self):
        return (self.small, self.on, self.how)

    def __setstate__(self, s):
        self.small, self.on, self.how = s
        self._tbl = None


def broadcast_lookup(ds, small_ref, on, how: str = "inner", concurrency=None,
                     batch_size: int = 65536):
    # stateless tasks on warm workers: no actor-pool spin-up; the broadcast
    # side is a plasma ref, resolved locally per worker
    return ds.map_batches(
        BroadcastMerge(small_ref, on, how),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


class BroadcastSemiJoin:
    """Keep (semi) or drop (anti) rows whose key is in a broadcast key set."""

    def __init__(self, keys_ref, key_col: str, anti: bool = False) -> None:
        self.keys_ref = LazyRef(keys_ref)
        self.key_col = key_col
        self.anti = anti
        self._keys_arr = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._keys_arr is None:
            self._keys_arr = pa.array(sorted(set(self.keys_ref.get())))
        mask = pc.is_in(batch[self.key_col], value_set=self._keys_arr)
        if self.anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    def __getstate__(self):
        return (self.keys_ref, self.key_col, self.anti)

    def __setstate__(self, s):
        self.keys_ref, self.key_col, self.anti = s
        self._keys_arr = None


def broadcast_semi_join(ds, keys_ref, key_col: str, anti: bool = False,
                        concurrency=None):
    return ds.map_batches(
        BroadcastSemiJoin(keys_ref, key_col, anti),
        batch_format="pyarrow",
    )


class BloomFilter:
    """Vectorized Bloom filter over int64 keys (numpy bit array; k probes
    via double hashing of two independent 64-bit mixes).  The at-scale
    stand-in for an exact broadcast key set: a key set too large to ship
    (1e9 urgent orderkeys ≈ 8 GB exact) fits as ~1.2 GB of bits at 1%
    FPR.  NO false negatives — a Bloom PRE-filter followed by an exact
    join stays exact while pruning most non-matching rows at the map
    stage, before any shuffle."""

    __slots__ = ("bits", "k", "m")

    def __init__(self, capacity: int, fpr: float = 0.01) -> None:
        m = max(64, int(-capacity * np.log(fpr) / (np.log(2) ** 2)))
        self.m = ((m + 63) // 64) * 64
        self.k = max(1, int(round(self.m / max(1, capacity) * np.log(2))))
        self.bits = np.zeros(self.m // 64, dtype=np.uint64)

    def _hashes(self, keys: np.ndarray) -> "tuple[np.ndarray, np.ndarray]":
        with np.errstate(over="ignore"):
            v = keys.astype(np.uint64)
            h1 = v * np.uint64(11400714819323198485)
            h1 ^= h1 >> np.uint64(33)
            h2 = (v + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(
                14029467366897019727
            )
            h2 ^= h2 >> np.uint64(29)
            h2 |= np.uint64(1)  # odd stride
        return h1, h2

    def add_many(self, keys: np.ndarray) -> None:
        h1, h2 = self._hashes(np.asarray(keys, dtype=np.int64))
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                np.bitwise_or.at(
                    self.bits, (pos >> np.uint64(6)).astype(np.int64),
                    np.uint64(1) << (pos & np.uint64(63)),
                )

    def may_contain(self, keys: np.ndarray) -> np.ndarray:
        h1, h2 = self._hashes(np.asarray(keys, dtype=np.int64))
        out = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                pos = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
                word = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
                out &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
        return out

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(ds, col: str, capacity: int, fpr: float = 0.01,
                batch_size: int = 1 << 20):
    """Distributed Bloom build: per-batch partial filters in map_batches,
    OR-merged by a tree of Ray tasks over the partials' OBJECT REFS — the
    partial bitmaps (each O(capacity) bits) stay in the object store; the
    driver holds only refs and the single final filter.  ``batch_size``
    coalesces input blocks so the number of full-size partials stays
    small.  Returns a ``ray.put`` ref for :func:`bloom_semi_join`."""
    import ray

    def partial(t: pa.Table):
        bf = BloomFilter(capacity, fpr)
        bf.add_many(t[col].to_numpy(zero_copy_only=False))
        return pa.table({"__bloom": pa.array([bf.bits.tobytes()], pa.binary())})

    proto = BloomFilter(capacity, fpr)
    nwords = len(proto.bits)
    refs = list(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size)
        .to_arrow_refs()
    )
    if not refs:
        return ray.put(proto)

    def _bits(x) -> np.ndarray:
        out = np.zeros(nwords, dtype=np.uint64)
        if isinstance(x, pa.Table):  # leaf: a block of partial rows
            if "__bloom" in x.column_names:
                for v in x["__bloom"]:
                    out |= np.frombuffer(v.as_py(), np.uint64)
        else:  # inner node: merged bytes
            out |= np.frombuffer(x, np.uint64)
        return out

    @ray.remote
    def merge_two(a, b) -> bytes:
        return (_bits(a) | _bits(b)).tobytes()

    @ray.remote
    def finalize(x) -> bytes:
        return _bits(x).tobytes()

    while len(refs) > 1:
        refs = [
            merge_two.remote(refs[i], refs[i + 1])
            if i + 1 < len(refs)
            else refs[i]
            for i in range(0, len(refs), 2)
        ]
    proto.bits = np.frombuffer(ray.get(finalize.remote(refs[0])),
                               np.uint64).copy()
    return ray.put(proto)


class _BloomFilterBatch:
    def __init__(self, bloom_ref, key_col: str) -> None:
        self.bloom = LazyRef(bloom_ref)
        self.key_col = key_col

    def __call__(self, t: pa.Table) -> pa.Table:
        keys = t[self.key_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(self.bloom.get().may_contain(keys)))


def bloom_semi_join(ds, bloom_ref, key_col: str):
    """Approximate semi-join: keep rows whose key MAY be in the Bloom
    filter (no false negatives; ~FPR of non-members slip through — follow
    with an exact join when exactness matters)."""
    return ds.map_batches(
        _BloomFilterBatch(bloom_ref, key_col), batch_format="pyarrow"
    )


def vec_lookup(sorted_keys: np.ndarray, values: np.ndarray, keys: np.ndarray,
               default) -> np.ndarray:
    """Vectorized broadcast-map: values[position-of-key] with ``default``
    for misses — searchsorted over the (sorted) broadcast key array, no
    per-row Python.  The at-scale replacement for ``dict.get`` loops in
    map_batches kernels."""
    if len(sorted_keys) == 0:
        return np.full(len(keys), default, dtype=np.asarray([default]).dtype)
    idx = np.searchsorted(sorted_keys, keys)
    idx_c = np.minimum(idx, len(sorted_keys) - 1)
    ok = sorted_keys[idx_c] == keys
    return np.where(ok, values[idx_c], default)


def lookup_arrays(mapping: dict) -> tuple:
    """(sorted_keys, values) numpy pair for :func:`vec_lookup` from a dict
    — build once, ``ray.put`` the pair, resolve via LazyRef per worker."""
    ks = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
    vs = np.fromiter(mapping.values(), dtype=np.int64, count=len(mapping))
    order = np.argsort(ks, kind="stable")
    return ks[order], vs[order]


def _hash_strings(col) -> np.ndarray:
    """Vectorized stable 64-bit hash of a string column (uint64):
    polars' row hash (seed 0 — deterministic across the processes of
    one run), FNV-1a fallback without it.  THE shared string hash —
    join bucketing and the HLL sketch both route through it, so a
    seed or fallback change cannot desynchronize them."""
    try:
        import polars as pl

        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        return pl.from_arrow(arr).hash(seed=0).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover
        return np.fromiter(
            (_fnv(s) for s in col.to_pylist()), dtype=np.uint64,
            count=len(col),
        )


def _bucket_of(col: pa.ChunkedArray, buckets: int) -> pa.Array:
    """Deterministic bucket id from an int64/string key column.

    String keys hash via :func:`_hash_strings` (deterministic across
    the processes of one run, which is all bucketing needs)."""
    if pa.types.is_integer(col.type):
        if col.null_count:
            # fill nulls BEFORE to_numpy: a null-containing int64 column
            # converts to float64, silently rounding keys >= 2^53 into the
            # wrong bucket (null keys never match — any deterministic
            # bucket is fine for them)
            col = pc.fill_null(col, 0)
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        # Fibonacci hashing — spreads sequential keys
        h = (v * np.uint64(11400714819323198485)) >> np.uint64(40)
    else:
        h = _hash_strings(col)
    return pa.array((h % np.uint64(buckets)).astype(np.int32))


def _fnv(s) -> np.uint64:
    h = np.uint64(14695981039346656037)
    if s is None:
        return h
    for b in str(s).encode("utf-8"):
        h = np.uint64((h ^ np.uint64(b)) * np.uint64(1099511628211))
    return h


def detect_hot_keys(ds, on: str, threshold: int | None = None,
                    keep: int = 64, batch_size: int = 65536) -> list:
    """Cheap count-combiner hot-key pass for :func:`salted_bucket_join` /
    ``hash_bucket_join(auto_salt_col=...)``: each batch emits its
    top-``keep`` key counts plus a null-keyed batch-total row (tiny
    partials — O(keep) rows per batch, NO shuffle of the data); the driver
    sums the partials (a few KB regardless of input size) and returns keys
    whose summed count ≥ ``threshold`` (default: 1% of total rows, floor
    1024).  Per-key sums are LOWER bounds (a key outside a batch's
    top-``keep`` is dropped there) — the right bias for hotness: a truly
    hot key dominates the batches it appears in."""

    def partial(t: pa.Table) -> pa.Table:
        col = t[on].combine_chunks()
        vc = col.value_counts()
        vals = vc.field("values")
        cs = vc.field("counts").to_numpy(zero_copy_only=False)
        # drop the null-key row Arrow value_counts emits: null keys never
        # join, must not occupy top-`keep` slots, and would conflate with
        # the null-keyed batch-total sentinel below
        valid = vals.is_valid().to_numpy(zero_copy_only=False)
        if not valid.all():
            vals = vals.filter(pa.array(valid))
            cs = cs[valid]
        if len(cs) > keep:
            topi = np.argpartition(cs, -keep)[-keep:]
            vals = vals.take(pa.array(topi, pa.int64()))
            cs = cs[topi]
        k_arr = pa.concat_arrays([vals, pa.nulls(1, vals.type)])
        cnt = pa.array(np.append(cs, len(t)).astype(np.int64), pa.int64())
        return pa.table({"k": k_arr, "cnt": cnt})

    partials = ds.select_columns([on]).map_batches(
        partial, batch_format="pyarrow", batch_size=batch_size
    )
    # keyed in-Dataset sum BEFORE the driver collect (the same
    # reduce-before-collect discipline as the sketch builders): the
    # driver sees one row per distinct surviving key, not keep+1 rows
    # per input batch.  take_all (not to_pandas) keeps int64 keys exact
    # — a pandas int64-with-null column would upcast to float64 and
    # corrupt keys >= 2^53.
    from .agg import partial_sum_groupby

    rows = partial_sum_groupby(partials, ["k"], {"cnt": "cnt"}).take_all()
    total = sum(r["cnt"] for r in rows if r["k"] is None)
    if threshold is None:
        threshold = max(1024, int(0.01 * total))
    return [r["k"] for r in rows if r["k"] is not None and r["cnt"] >= threshold]


def salted_bucket_join(left, right, on: str, hot_keys, salt_col: str,
                       salt: int = 8, buckets: int = 32,
                       how: str = "inner", suffixes=("", "_r")):
    """Hot-key-salted partitioned join — the concrete mitigation for the
    bucket join's documented skew hazard (one key dominating a bucket):

    * RIGHT rows of a hot key are replicated ``salt`` times (salt ids
      0..salt-1) — right sides are the small/dimension side, so the
      replication is cheap;
    * LEFT hot rows get a deterministic content-based salt (Fibonacci
      hash of ``salt_col`` — REQUIRED, and it must vary within the hot
      key, e.g. the fact table's line/row id; the join key itself is
      constant within a hot key and would yield one sub-key, i.e. no
      mitigation at all) spreading the key over ``salt`` sub-keys;
    * the join runs on the composite sub-key, so each bucket sees at most
      ~|hot|/salt rows of the hot key.  Results are identical to the
      unsalted join (verified by test).

    ``hot_keys``: iterable of key values to salt — int64 keys compose an
    arithmetic sub-key, any other scalar type composes an injective
    string sub-key (find them with
    :func:`detect_hot_keys`, or let ``hash_bucket_join(auto_salt_col=...)``
    run that pass for you).

    Only ``inner``/``left`` joins: an outer/right join would emit each
    UNMATCHED replicated hot right row ``salt`` times (every replica
    survives null-padded), silently breaking result equality.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_bucket_join supports how='inner'/'left' (got {how!r}): "
            "replicated unmatched right rows would duplicate in outer joins"
        )
    hot_list = sorted(hot_keys)
    int_keys = all(isinstance(k, (int, np.integer)) for k in hot_list)
    hot = (
        np.array(hot_list, dtype=np.int64)
        if int_keys
        else np.array([str(k) for k in hot_list], dtype=object)
    )
    S = np.int64(salt)

    if salt_col == on:
        raise ValueError(
            "salt_col must differ from the join key: the key is constant "
            "within a hot key, so salting by it spreads nothing"
        )

    def _subkey(keys: np.ndarray, salts: np.ndarray) -> pa.Array:
        # integer keys: injective arithmetic composite; other key types:
        # injective string composite (US unit separator never appears in
        # the stringified key of the supported scalar types)
        if int_keys:
            return pa.array(
                keys.astype(np.int64) * S + salts.astype(np.int64),
                pa.int64(),
            )
        return pa.array(
            [f"{k}\x1f{si}" for k, si in zip(keys, salts)], pa.string()
        )

    def salt_left(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False)
        basis = t[salt_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            sgen = (
                (basis * np.uint64(11400714819323198485)) >> np.uint64(33)
            ) % np.uint64(salt)
        is_hot = np.isin(keys, hot)
        salts = np.where(is_hot, sgen.astype(np.int64), 0)
        return t.append_column("__salted", _subkey(keys, salts))

    def salt_right(t: pa.Table) -> pa.Table:
        keys = t[on].to_numpy(zero_copy_only=False)
        is_hot = np.isin(keys, hot)
        base_idx = np.arange(len(t), dtype=np.int64)
        # non-hot rows once (salt 0), hot rows replicated salt times
        rep_idx = np.concatenate(
            [base_idx[~is_hot]] + [base_idx[is_hot]] * salt
        )
        salts = np.concatenate(
            [np.zeros((~is_hot).sum(), np.int64)]
            + [np.full(is_hot.sum(), s, np.int64) for s in range(salt)]
        )
        out = t.take(pa.array(rep_idx, pa.int64()))
        return out.append_column(
            "__salted",
            _subkey(out[on].to_numpy(zero_copy_only=False), salts),
        )

    l = left.map_batches(salt_left, batch_format="pyarrow")
    r = right.map_batches(salt_right, batch_format="pyarrow")
    joined = hash_bucket_join(l, r, on="__salted", buckets=buckets, how=how,
                              suffixes=suffixes)
    drop = ["__salted"] + ([f"{on}{suffixes[1]}"] if suffixes[1] else [])

    def clean(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in drop if c in t.column_names])

    return joined.map_batches(clean, batch_format="pyarrow")


def _pa_side_schema(ds) -> pa.Schema:
    """Typed pyarrow schema of a Dataset side, whatever block format backs
    it (arrow blocks expose ``base_schema`` directly; pandas-block schemas
    carry numpy dtypes, mapped field-by-field with ``string`` for object)."""
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(sch.names, sch.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:
            try:
                fields.append(pa.field(name, pa.from_numpy_dtype(typ)))
            except (pa.ArrowNotImplementedError, TypeError, ValueError):
                fields.append(pa.field(name, pa.string()))
    return pa.schema(fields)


_JOIN_TYPE = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "outer": "full outer",
}


def hash_bucket_join(left, right, on: str, buckets: int = 32,
                     how: str = "inner", left_tag: str = "__l",
                     suffixes=("", "_r"), auto_salt_col: str | None = None,
                     hot_threshold: int | None = None, salt: int = 8,
                     side_schemas: "tuple[pa.Schema, pa.Schema] | None" = None):
    """Partitioned hash join: ONE groupby shuffle over the union of both
    (tagged, bucketed) sides, Arrow-native ``pa.Table.join`` per bucket —
    no pandas conversion, no dtype upcasts, typed-null padding for
    one-sided buckets (each bucket reconstructs its sides from the
    RECORDED side schemas — types, not just names — so a bucket whose rows
    all came from one side still emits schema-consistent blocks).

    Scale notes: ``buckets`` bounds per-group memory (≈ |L|+|R| / buckets);
    skewed keys → raise ``buckets``, or pass ``auto_salt_col`` (a left
    column varying within a key, e.g. the fact table's row id) to run the
    cheap count-combiner hot-key pass and route through
    :func:`salted_bucket_join` automatically when hot keys are found.

    Null-key semantics are SQL's (null never matches null), unlike
    pandas ``merge`` which pairs NaN keys.

    ``side_schemas=(lschema, rschema)``: pass the sides' pyarrow schemas
    explicitly to skip the ``ds.schema()`` probes — probing an unexecuted
    aggregate chain re-executes it, so iterative callers (PageRank, BFS)
    that join against a fresh groupby each round pass schemas to keep the
    whole round ONE fused streaming execution.
    """
    if auto_salt_col is not None:
        if how not in ("inner", "left"):
            raise ValueError("auto_salt_col requires how='inner'/'left' "
                             "(salting replicates right rows)")
        hot = detect_hot_keys(left, on, threshold=hot_threshold)
        if hot:
            return salted_bucket_join(
                left, right, on=on, hot_keys=hot, salt_col=auto_salt_col,
                salt=salt, buckets=buckets, how=how, suffixes=suffixes)

    if side_schemas is not None:
        lschema, rschema = side_schemas
    else:
        lschema = _pa_side_schema(left)
        rschema = _pa_side_schema(right)
    # an EMPTY side (or an all-null column) arrives null-typed, and
    # arrow's hash join rejects a null-typed key field.  A null-typed
    # column holds only nulls, so re-typing it is lossless: adopt the
    # OTHER side's type for same-named fields (the key especially —
    # null keys never match anyway), string as the last resort.
    def _detype_nulls(sch: pa.Schema, other: pa.Schema) -> pa.Schema:
        fields = []
        for f in sch:
            if pa.types.is_null(f.type):
                o = (other.field(f.name).type
                     if f.name in other.names else None)
                t = o if o is not None and not pa.types.is_null(o) \
                    else pa.string()
                f = pa.field(f.name, t)
            fields.append(f)
        return pa.schema(fields)

    lschema, rschema = (_detype_nulls(lschema, rschema),
                        _detype_nulls(rschema, lschema))
    join_type = _JOIN_TYPE[how]

    def add_bucket(tag: bool):
        def f(t: pa.Table) -> pa.Table:
            t = t.append_column("__bucket", _bucket_of(t[on], buckets))
            return t.append_column(left_tag, pa.array([tag] * len(t), pa.bool_()))

        return f

    l = left.map_batches(add_bucket(True), batch_format="pyarrow")
    r = right.map_batches(add_bucket(False), batch_format="pyarrow")
    both = l.union(r)

    def merge(g: pa.Table) -> pa.Table:
        mask = g[left_tag].combine_chunks()
        lg = g.filter(mask)
        rg = g.filter(pc.invert(mask))

        def side(t: pa.Table, schema: pa.Schema) -> pa.Table:
            cols = []
            for f in schema:
                if f.name in t.column_names:
                    col = t[f.name]
                    if col.type != f.type:
                        col = col.cast(f.type)
                    cols.append(col)
                else:
                    # one-sided bucket: pad with TYPED nulls so blocks from
                    # different buckets share one schema
                    cols.append(pa.nulls(len(t), f.type))
            return pa.table(cols, names=list(schema.names))

        lt, rt = side(lg, lschema), side(rg, rschema)
        return lt.join(
            rt, keys=on, join_type=join_type,
            left_suffix=suffixes[0] or None,
            right_suffix=suffixes[1] or None,
        )

    # map_groups over zero groups emits zero blocks and the Dataset loses
    # its schema (schema() -> None), which breaks any downstream join on
    # this result.  Pin the output schema with a typed empty union; the
    # empty join below is the exact per-bucket merge, so its schema is
    # byte-identical to what real buckets emit.
    import ray.data as _rd

    empty_joined = lschema.empty_table().join(
        rschema.empty_table(), keys=on, join_type=join_type,
        left_suffix=suffixes[0] or None, right_suffix=suffixes[1] or None,
    )
    return both.groupby("__bucket").map_groups(
        merge, batch_format="pyarrow"
    ).union(_rd.from_arrow(empty_joined))


def apply_changelog(
    snapshot,
    changes,
    key: str,
    seq_col: str = "__seq",
    op_col: str = "__op",
    num_partitions: int = 32,
):
    """CDC merge: fold a changelog of keyed upserts/deletes into a
    snapshot (the lakehouse MERGE INTO shape).  ``changes`` carries the
    snapshot's columns plus ``op_col`` ('upsert' | 'delete') and a
    monotonically increasing ``seq_col``; base rows rank below every
    change (seq -1).  Per key, the highest-seq row wins; a winning
    delete drops the key.

    Distribution: one union + one coarse hash-partitioned
    ``grouped_apply`` on the key — per-key state never leaves the
    partition, the driver holds nothing.  Ties on seq are broken by op
    ('delete' > 'upsert', matching the convention that a delete in the
    same transaction wins)."""
    import pandas as pd
    import pyarrow.compute as pc_

    def tag_base(t: pa.Table) -> pa.Table:
        return t.append_column(
            seq_col, pa.array(np.full(len(t), -1, np.int64))
        ).append_column(
            # explicit string type: a zero-row block would otherwise
            # infer null type and break the union/shuffle schema
            op_col, pa.array(["upsert"] * len(t), pa.string())
        )

    base = snapshot.map_batches(tag_base, batch_format="pyarrow")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # 'delete' outranks 'upsert' at equal seq (lexicographic order
        # would do the opposite, hence the explicit rank)
        g = g.assign(
            __oprank=(g[op_col] == "delete").astype(int)
        ).sort_values([seq_col, "__oprank"], kind="stable").drop(
            columns=["__oprank"]
        )
        last = g.iloc[-1]
        if last[op_col] == "delete":
            return g.iloc[0:0].drop(columns=[seq_col, op_col])
        return g.iloc[[-1]].drop(columns=[seq_col, op_col])

    from .agg import grouped_apply

    return grouped_apply(base.union(changes), [key], fold,
                         num_partitions=num_partitions)
