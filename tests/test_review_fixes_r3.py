"""Pins for the round-3 functions-layer review fixes.

Each test targets one specific failure the review surfaced:

* all-empty pair chains dropping the dataset schema (Ray skips 0-row
  blocks in map stages, so an all-empty ``grouped_apply``/aggregate
  output used to reach downstream joins with ``schema() is None``);
* ``binary_auc`` / ``pareto_front`` final passes slicing the global
  block into default 1024-row batches (one wrong partial per slice);
* ``grouped_ols`` batch sums wrapping int64 BEFORE the overflow
  assert could see them;
* ``paragraph_chunk_rows`` rank packing silently wrapping for huge
  doc ids;
* ``_bucket_of`` / ``_range_partition`` null-int64 keys degrading the
  whole batch to float64 (rounding keys above 2^53);
* ``sparse_cosine_top1`` re-executing the tokenization pass per
  consumer (pinned by materialize — behavior covered via the empty
  and non-empty end-to-end results here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd


class TestEmptyPairChains:
    """A corpus with NO duplicates/pairs must still yield typed, empty
    results through the whole chain (joins, groupbys, selects)."""

    def test_hamming_no_dups_keeps_schema(self, ray_session):
        from parsel_ray.functions.dedup import hamming_near_dup_pairs

        rng = np.random.default_rng(0)
        ds = rd.from_arrow(pa.table({
            "image_id": pa.array([f"img{i}" for i in range(8)]),
            "phash": pa.array(
                rng.integers(0, 2 ** 63, 8, dtype=np.int64), pa.int64()
            ),
        }))
        pairs = hamming_near_dup_pairs(
            ds, col="phash", id_col="image_id", max_hamming=1,
            id_type=pa.string(),
        )
        sch = pairs.schema()
        assert sch is not None
        assert list(sch.names) == ["id_a", "id_b", "hamming"]
        assert pairs.count() == 0

    def test_embedding_lsh_no_dups_keeps_schema(self, ray_session):
        from parsel_ray.functions.similarity import embedding_near_dup_pairs

        emb = rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(6), pa.int64()),
            "embedding": pa.array(
                [list(np.eye(8)[i % 8].astype(float)) for i in range(6)],
                pa.list_(pa.float32()),
            ),
        }))
        p = embedding_near_dup_pairs(emb, dim=8, threshold=0.999, bits=4)
        assert list(p.schema().names) == ["id_a", "id_b", "cosine"]
        assert p.select_columns(["id_a", "id_b"]).take_all() == []

    def test_cdc_all_unique_corpus(self, ray_session):
        from parsel_ray.functions.dedup import dedup_cdc

        rng = np.random.default_rng(0)
        docs = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(4), pa.int64()),
            "bytes": pa.array(
                [rng.bytes(400) for _ in range(4)], pa.binary()
            ),
        }))
        out = dedup_cdc(docs, num_partitions=4).take_all()
        assert sorted((r["doc_id"], r["dup_bytes"]) for r in out) == [
            (0, 0), (1, 0), (2, 0), (3, 0)
        ]

    def test_edit1_no_neighbours(self, ray_session):
        from parsel_ray.functions.dedup import edit1_pairs

        v = rd.from_arrow(pa.table({
            "name": pa.array(["alpha", "gamma", "omicron", "zzz"])
        }))
        e1 = edit1_pairs(v, col="name", num_partitions=4)
        assert list(e1.schema().names) == ["a_name", "b_name"]
        assert e1.count() == 0
        # regression: neighbours still found
        v2 = rd.from_arrow(pa.table({
            "name": pa.array(["cat", "cut", "dog", "dogs"])
        }))
        got = sorted(
            (r["a_name"], r["b_name"])
            for r in edit1_pairs(v2, col="name", num_partitions=4).take_all()
        )
        assert got == [("cat", "cut"), ("dog", "dogs")]

    def test_orbit_no_dups(self, ray_session):
        from parsel_ray.functions.dedup import orbit_hamming_near_dup_pairs

        rng = np.random.default_rng(0)
        orbits = [
            list(rng.integers(0, 2 ** 62, 8).astype(np.int64))
            for _ in range(5)
        ]
        ob = rd.from_arrow(pa.table({
            "img_id": pa.array(np.arange(5), pa.int64()),
            "hashes": pa.array(orbits, pa.list_(pa.int64())),
        }))
        o = orbit_hamming_near_dup_pairs(ob, "hashes", "img_id",
                                         max_hamming=1)
        assert list(o.schema().names) == ["id_a", "id_b", "hamming"]
        assert o.count() == 0

    def test_sparse_cosine_no_shared_terms(self, ray_session):
        from parsel_ray.functions.similarity import sparse_cosine_top1

        sc = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(4), pa.int64()),
            "text": pa.array(["aa bb", "cc dd", "ee ff", "gg hh"]),
        }))
        assert sparse_cosine_top1(sc, max_df=3).take_all() == []
        # regression: shared terms still pair up
        sc2 = rd.from_arrow(pa.table({
            "doc_id": pa.array(np.arange(4), pa.int64()),
            "text": pa.array(
                ["aa bb cc", "aa bb", "cc dd", "dd ee aa"]
            ),
        }))
        got = sorted(
            (r["doc_id"], r["best_doc"])
            for r in sparse_cosine_top1(sc2, max_df=3).take_all()
        )
        assert len(got) == 4 and got[0] == (0, 1) and got[1] == (1, 0)


class TestGlobalPassBatchSize:
    """Single-partition 'global' passes must see the WHOLE block in one
    call — default 1024-row batch slicing silently emits one partial
    result per slice."""

    def test_binary_auc_many_distinct_scores(self, ray_session):
        from parsel_ray.functions.ml import binary_auc

        rng = np.random.default_rng(7)
        n = 5000  # > 1024 distinct scores forces multi-slice w/o fix
        scores = rng.permutation(n).astype(np.float64) / n
        labels = (rng.random(n) < scores).astype(np.int64)  # informative
        ds = rd.from_arrow(pa.table({
            "s": pa.array(scores, pa.float64()),
            "y": pa.array(labels, pa.int64()),
        }))
        got = binary_auc(ds, "s", "y").take_all()
        assert len(got) == 1
        # exact rank-statistic reference
        order = np.argsort(scores, kind="stable")
        ranks = np.empty(n)
        ranks[order] = np.arange(1, n + 1)
        pos = labels == 1
        n1, n0 = int(pos.sum()), int((~pos).sum())
        want = (ranks[pos].sum() - n1 * (n1 + 1) / 2) / (n1 * n0)
        assert abs(got[0]["auc"] - want) < 1e-9

    def test_pareto_front_wide_global_pass(self, ray_session):
        from parsel_ray.functions.agg import pareto_front

        rng = np.random.RandomState(3)
        n = 3000  # local fronts can exceed 1024 rows combined
        a = rng.randint(0, 10_000_000, n)
        b = rng.randint(0, 10_000_000, n)
        t = pa.table({
            "rid": pa.array(range(n), pa.int64()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
        })
        got = sorted(
            r["rid"] for r in pareto_front(
                rd.from_arrow(t).repartition(6), ["a", "b"]
            ).take_all()
        )
        m = np.column_stack([a, b])
        want = sorted(
            int(i) for i in range(n)
            if not ((m >= m[i]).all(axis=1) & (m > m[i]).any(axis=1)).any()
        )
        assert got == want


class TestOverflowGuards:
    def test_grouped_ols_large_magnitudes_exact(self, ray_session):
        """Batch sums of x*y near 2^62 must not wrap before the assert:
        the 31-bit pre-split keeps every partial exact."""
        from parsel_ray.functions.agg import grouped_ols

        # |x| = |y| = 2^30 (inside the 2^31 element bound): a single
        # 8-row batch sums x*y to 2^63 > 2^62 — pre-fix this could
        # wrap int64 inside the batch and slip past the magnitude check
        x = np.full(8, 1 << 30, np.int64)
        y = np.full(8, 1 << 30, np.int64)
        ds = rd.from_arrow(pa.table({
            "g": pa.array(["a"] * 8), "x": pa.array(x), "y": pa.array(y),
        }))
        # Ray re-wraps worker-side AssertionError as RayTaskError(UserCode
        # Exception); match the guard's message, not the local type
        with pytest.raises(Exception, match="overflow risk"):
            grouped_ols(ds, ["g"], "x", "y").take_all()

        # in-range magnitudes: exact slope/intercept
        x2 = np.array([1, 2, 3, 4], np.int64)
        y2 = np.array([3, 5, 7, 9], np.int64)  # y = 2x + 1
        ds2 = rd.from_arrow(pa.table({
            "g": pa.array(["a"] * 4), "x": pa.array(x2), "y": pa.array(y2),
        }))
        out = grouped_ols(ds2, ["g"], "x", "y").take_all()
        assert len(out) == 1
        assert out[0]["slope"] == 2.0 and out[0]["intercept"] == 1.0

    def test_paragraph_chunk_rows_doc_id_overflow(self):
        from parsel_ray.functions.dedup import paragraph_chunk_rows

        t = pa.table({
            "doc_id": pa.array([1 << 44], pa.int64()),  # >= 2^(63-20)
            "text": pa.array(["hello world"]),
        })
        with pytest.raises(ValueError, match="doc ids must be in"):
            paragraph_chunk_rows(t, max_chunks_bits=20)


class TestNullKeyDegradation:
    def test_bucket_of_null_int64_keys(self):
        """A null int64 key used to float64-degrade the WHOLE column,
        rounding keys >= 2^53 into the wrong bucket."""
        from parsel_ray.functions.relational import _bucket_of

        big = (1 << 62) + 12345  # distinct under int64, collides as f64
        big2 = (1 << 62) + 12346
        col_nonull = pa.chunked_array([pa.array([big, big2], pa.int64())])
        col_null = pa.chunked_array(
            [pa.array([big, big2, None], pa.int64())]
        )
        b_clean = _bucket_of(col_nonull, 1 << 20).to_pylist()
        b_mixed = _bucket_of(col_null, 1 << 20).to_pylist()
        # non-null keys bucket identically whether or not a null is
        # present elsewhere in the column
        assert b_mixed[:2] == b_clean

    def test_range_partition_null_keys_raise(self, ray_session):
        from parsel_ray.functions.sort import global_row_number

        ds = rd.from_arrow(pa.table({
            "k": pa.array([3, None, 1], pa.int64()),
            "rid": pa.array([0, 1, 2], pa.int64()),
        }))
        with pytest.raises(Exception, match="null keys"):
            global_row_number(
                ds, ["k", "rid"], [True, True], num_partitions=2
            ).take_all()


class TestRangePartitionBinnedBounds:
    """_range_partition now derives bounds from a bounded binned
    histogram — O(bins) driver state even for hash-valued keys."""

    def test_hash_key_global_rank_exact(self, ray_session):
        from parsel_ray.functions.sort import global_row_number

        rng = np.random.default_rng(11)
        n = 4000
        keys = rng.permutation(n * 7)[:n].astype(np.int64)  # ~all distinct
        ds = rd.from_arrow(pa.table({
            "h": pa.array(keys, pa.int64()),
            "rid": pa.array(np.arange(n), pa.int64()),
        })).repartition(8)
        out = global_row_number(
            ds, ["h", "rid"], [True, True],
            out_col="rank", num_partitions=4,
        ).take_all()
        got = {r["rid"]: r["rank"] for r in out}
        order = np.argsort(keys, kind="stable")
        for rank0, rid in enumerate(order):
            assert got[int(rid)] == rank0 + 1

    def test_descending_and_single_value(self, ray_session):
        from parsel_ray.functions.sort import global_row_number

        ds = rd.from_arrow(pa.table({
            "k": pa.array([5, 5, 5], pa.int64()),
            "rid": pa.array([2, 0, 1], pa.int64()),
        }))
        out = global_row_number(
            ds, ["k", "rid"], [False, True], num_partitions=3
        ).take_all()
        assert {r["rid"]: r["rank"] for r in out} == {0: 1, 1: 2, 2: 3}
