"""Resumable partitioned parquet sink (round 2: single-pass rewrite)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd

from parsel_ray.sources import write_partitioned_parquet


def _docs(n=200):
    rng = np.random.RandomState(7)
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "lang": pa.array(
                [["en", "de", "fr"][i] for i in rng.randint(0, 3, n)]
            ),
            "text": pa.array([f"doc {i}" for i in range(n)]),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestPartitionedSink:
    def test_identical_subbatches_get_distinct_shard_names(self):
        # two byte-identical batches written by one task must not collide
        # (the second os.replace would silently drop the first's rows)
        from parsel_ray.sources.partitioned import _TASK_SEQ, _content_name

        t = pa.table({"doc_id": [1, 2], "text": ["a", "b"]})
        _TASK_SEQ[0], _TASK_SEQ[1] = "", 0  # fresh "task"
        first, second = _content_name(t), _content_name(t)
        assert first != second
        # a replayed task (fresh ordinal, same content) reuses the names
        _TASK_SEQ[0], _TASK_SEQ[1] = "", 0
        assert _content_name(t) == first and _content_name(t) == second

    def test_single_pass_counts_and_done_markers(self, tmp_path):
        t = _docs()
        out = str(tmp_path / "out")
        counts = write_partitioned_parquet(
            rd.from_arrow(t).repartition(4), out, "lang"
        )
        want = {}
        for lang in t["lang"].to_pylist():
            want[lang] = want.get(lang, 0) + 1
        got = dict(zip(counts["lang"].to_pylist(), counts["n"].to_pylist()))
        assert got == want
        for lang in want:
            pdir = os.path.join(out, f"lang={lang}")
            assert os.path.exists(os.path.join(pdir, "_DONE"))
            n = sum(
                pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(pdir, "*.parquet"))
            )
            assert n == want[lang]

    def test_rerun_skips_done_and_cleans_partial(self, tmp_path):
        t = _docs()
        out = str(tmp_path / "out")
        write_partitioned_parquet(rd.from_arrow(t).repartition(4), out, "lang")
        # simulate a failed follow-up run: one partition loses its _DONE
        # and gains a stray partial shard
        broken = os.path.join(out, "lang=de")
        os.remove(os.path.join(broken, "_DONE"))
        stray = os.path.join(broken, "shard-partial.parquet")
        pq.write_table(pa.table({"doc_id": pa.array([999], pa.int64()),
                                 "lang": pa.array(["de"]),
                                 "text": pa.array(["junk"])}), stray)
        en_files_before = sorted(
            glob.glob(os.path.join(out, "lang=en", "*.parquet"))
        )
        counts = write_partitioned_parquet(
            rd.from_arrow(t).repartition(4), out, "lang"
        )
        # finished partitions untouched (same files), broken one rebuilt
        # without the stray shard, totals correct everywhere
        assert sorted(
            glob.glob(os.path.join(out, "lang=en", "*.parquet"))
        ) == en_files_before
        assert not os.path.exists(stray)
        assert os.path.exists(os.path.join(broken, "_DONE"))
        want = {}
        for lang in t["lang"].to_pylist():
            want[lang] = want.get(lang, 0) + 1
        got = dict(zip(counts["lang"].to_pylist(), counts["n"].to_pylist()))
        assert got == want


class TestOrcSource:
    """sources/orc.py: worker-side ORC shards + path-fanout reader."""

    def test_roundtrip_and_pruning(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.sources.orc import read_orc, write_orc

        t = pa.table(
            {
                "k": pa.array(range(1000), pa.int64()),
                "s": pa.array([f"v{i%7}" for i in range(1000)]),
                "x": pa.array([i * 1.5 for i in range(1000)]),
            }
        )
        out = str(tmp_path / "orc")
        n = write_orc(rd.from_arrow(t).repartition(5), out)
        assert n == 1000
        import os

        shards = [f for f in os.listdir(out) if f.endswith(".orc")]
        assert len(shards) >= 2  # worker-side, one per non-empty block

        back = read_orc(out).to_pandas().sort_values("k").reset_index(
            drop=True
        )
        assert back.equals(t.to_pandas())

        pruned = read_orc(out, columns=["k"])
        assert pruned.schema().names == ["k"]
        assert pruned.count() == 1000

    def test_missing_dir_raises(self, tmp_path):
        import pytest as _pytest

        from parsel_ray.sources.orc import read_orc

        (tmp_path / "empty").mkdir()
        with _pytest.raises(FileNotFoundError):
            read_orc(str(tmp_path / "empty"))


class TestIndexedSink:
    """sources/indexed.py: Bloom+minmax sidecars, exact pruned lookups."""

    def _write(self, ray_session, tmp_path, n=2000, blocks=8):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.sources.indexed import write_indexed_parquet

        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"doc {i} body" for i in range(n)]),
            }
        )
        out = str(tmp_path / "idx")
        total = write_indexed_parquet(
            rd.from_arrow(t).repartition(blocks), out, key_col="doc_id"
        )
        assert total == n
        return out

    def test_exact_result_and_pruning(self, ray_session, tmp_path):
        from parsel_ray.sources.indexed import point_lookup

        out = self._write(ray_session, tmp_path)
        # clustered keys → range pruning
        ds, stats = point_lookup(out, "doc_id", keys=range(10, 30))
        got = sorted(r["doc_id"] for r in ds.take_all())
        assert got == list(range(10, 30))
        s = stats()
        assert s["shards_read"] < s["shards_total"]

        # scattered single keys → bloom keeps it exact (no false negatives)
        keys = [3, 777, 1501, 1999]
        ds2, stats2 = point_lookup(out, "doc_id", keys=keys,
                                   columns=["doc_id"])
        assert sorted(r["doc_id"] for r in ds2.take_all()) == keys
        assert stats2()["shards_read"] <= stats2()["shards_total"]

    def test_missing_keys_empty_result(self, ray_session, tmp_path):
        from parsel_ray.sources.indexed import point_lookup

        out = self._write(ray_session, tmp_path, n=500, blocks=4)
        ds, stats = point_lookup(out, "doc_id", keys=[999999, -5])
        assert ds.count() == 0
        # min/max alone prunes every shard for out-of-range keys
        assert stats()["shards_read"] == 0

    def test_sidecar_corruption_raises(self, ray_session, tmp_path):
        import os

        from parsel_ray.sources.indexed import _sidecar_may_match

        out = self._write(ray_session, tmp_path, n=100, blocks=2)
        side = next(
            os.path.join(out, f) for f in os.listdir(out)
            if f.endswith(".idx")
        )
        import numpy as np
        import pytest as _pytest

        with _pytest.raises(ValueError):
            _sidecar_may_match(b"garbage", np.array([1], np.int64))


class TestZorder:
    """sources/zorder.py: Morton clustering, 2D pruning, exact results."""

    def test_morton_key_locality(self):
        import numpy as np

        from parsel_ray.sources.zorder import morton_key

        # interleave property: z(x, y) with y fixed is monotone in x grid
        x = np.array([0, 1000, 2000, 65535], np.int64)
        y = np.zeros(4, np.int64)
        z = morton_key(x, y, 0, 65535, 0, 65535)
        assert (np.diff(z) > 0).all()
        # swapping axes lands in different bit lanes
        z2 = morton_key(y, x, 0, 65535, 0, 65535)
        assert not np.array_equal(z, z2)

    def test_write_scan_exact_and_pruned(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.sources.zorder import zorder_range_read, zorder_write

        rng = np.random.RandomState(6)
        n = 4000
        t = pa.table(
            {
                "rid": pa.array(range(n), pa.int64()),
                "x": pa.array(rng.randint(0, 1000, n), pa.int64()),
                "y": pa.array(rng.randint(0, 1000, n), pa.int64()),
            }
        )
        out = str(tmp_path / "z")
        total = zorder_write(
            rd.from_arrow(t).repartition(4), out, "x", "y",
            domains=((0, 1000), (0, 1000)), shards=16,
        )
        assert total == n

        ds, stats = zorder_range_read(
            out, "x", "y", x_range=(100, 200), y_range=(300, 400)
        )
        got = sorted(r["rid"] for r in ds.take_all())
        xs = t["x"].to_numpy()
        ys = t["y"].to_numpy()
        want = sorted(
            int(i) for i in range(n)
            if 100 <= xs[i] <= 200 and 300 <= ys[i] <= 400
        )
        assert got == want and len(want) > 0
        s = stats()
        # a 10% x 10% bbox over a z-clustered 16-shard layout must skip
        # most shards
        assert s["shards_read"] <= s["shards_total"] // 2, s

    def test_projection_keeps_filter_exact(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.sources.zorder import zorder_range_read, zorder_write

        t = pa.table(
            {
                "rid": pa.array(range(100), pa.int64()),
                "x": pa.array(range(100), pa.int64()),
                "y": pa.array([i * 3 % 100 for i in range(100)], pa.int64()),
            }
        )
        out = str(tmp_path / "z2")
        zorder_write(rd.from_arrow(t).repartition(2), out, "x", "y",
                     domains=((0, 100), (0, 100)), shards=4)
        ds, _ = zorder_range_read(out, "x", "y", (10, 20), (0, 100),
                                  columns=["rid"])
        assert ds.schema().names == ["rid"]
        assert ds.count() == 11


class TestVersionedTable:
    """sources/versioned.py: manifests pin snapshots; orphans invisible."""

    def test_append_time_travel_and_orphan_isolation(self, ray_session,
                                                     tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from parsel_ray.sources.versioned import append_version, read_version

        d = str(tmp_path / "tbl")
        t1 = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
        t2 = pa.table({"k": pa.array([4, 5], pa.int64())})
        assert append_version(rd.from_arrow(t1), d) == 1
        assert append_version(rd.from_arrow(t2), d) == 2

        assert sorted(r["k"] for r in read_version(d).take_all()) == [
            1, 2, 3, 4, 5,
        ]
        assert sorted(
            r["k"] for r in read_version(d, version=1).take_all()
        ) == [1, 2, 3]

        # an orphan shard (failed writer: file exists, no manifest) must
        # stay invisible to every version
        pq.write_table(
            pa.table({"k": pa.array([99], pa.int64())}),
            str(tmp_path / "tbl" / "shard-orphan.parquet"),
        )
        assert sorted(r["k"] for r in read_version(d).take_all()) == [
            1, 2, 3, 4, 5,
        ]

        import pytest as _pytest

        with _pytest.raises(ValueError):
            read_version(d, version=7)
        with _pytest.raises(FileNotFoundError):
            read_version(str(tmp_path / "nope"))


class TestBucketedJoin:
    """write_bucketed + bucketed_join — shuffle-free co-partitioned join."""

    def test_matches_plain_join(self, ray_session, tmp_path):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.sources.partitioned import (
            bucketed_join,
            write_bucketed,
        )

        left = pa.table(
            {"key": pa.array([1, 2, 3, 4, 5], pa.int64()),
             "name": pa.array(list("abcde"))}
        )
        right = pa.table(
            {"key": pa.array([2, 2, 3, 5, 9], pa.int64()),
             "v": pa.array([20, 21, 30, 50, 90], pa.int64())}
        )
        ld, rd_ = str(tmp_path / "l"), str(tmp_path / "r")
        write_bucketed(rd.from_arrow(left), ld, key_col="key", buckets=4)
        write_bucketed(rd.from_arrow(right), rd_, key_col="key", buckets=4)
        got = sorted(
            (r["key"], r["name"], r["v"])
            for r in bucketed_join(ld, rd_, on="key",
                                   buckets=4).take_all()
        )
        assert got == [(2, "b", 20), (2, "b", 21), (3, "c", 30),
                       (5, "e", 50)]


class TestCompactPartitioned:
    """sources/partitioned.py::compact_partitioned — small-file
    compaction with the _DONE/receipt crash-safety protocol."""

    def _fragmented(self, tmp_path, blocks=16):
        from parsel_ray.sources import write_partitioned_parquet

        out = str(tmp_path / "corpus")
        ds = rd.from_arrow(_docs(300)).repartition(blocks)
        write_partitioned_parquet(ds, out, "lang")
        return out

    def test_compacts_and_is_idempotent(self, ray_session, tmp_path):
        from parsel_ray.sources.partitioned import compact_partitioned

        out = self._fragmented(tmp_path)
        before = {
            p: sorted(glob.glob(os.path.join(p, "*.parquet")))
            for p in glob.glob(os.path.join(out, "lang=*"))
        }
        assert sum(len(v) for v in before.values()) > 6  # fragmented

        rec = compact_partitioned(out, "lang", target_rows_per_shard=60)
        want = _docs(300).to_pandas()
        got = (
            rd.read_parquet(out).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
        assert got.groupby("lang").size().to_dict() == \
            want.groupby("lang").size().to_dict()
        import math
        for k, fa, n in zip(rec["lang"].to_pylist(),
                            rec["files_after"].to_pylist(),
                            rec["n_rows"].to_pylist()):
            files = glob.glob(os.path.join(out, f"lang={k}", "*.parquet"))
            assert len(files) == fa == math.ceil(n / 60)
            # _DONE refreshed with the row count
            assert open(os.path.join(out, f"lang={k}", "_DONE")).read() \
                == str(n)

        # second pass: byte-identical no-op (same filenames, same receipts)
        names1 = {
            p: sorted(glob.glob(os.path.join(p, "*.parquet")))
            for p in glob.glob(os.path.join(out, "lang=*"))
        }
        rec2 = compact_partitioned(out, "lang", target_rows_per_shard=60)
        names2 = {
            p: sorted(glob.glob(os.path.join(p, "*.parquet")))
            for p in glob.glob(os.path.join(out, "lang=*"))
        }
        assert names1 == names2
        assert rec2["files_before"].to_pylist() == \
            rec2["files_after"].to_pylist()

    def test_sweeps_orphan_tmps(self, ray_session, tmp_path):
        from parsel_ray.sources.partitioned import compact_partitioned

        out = self._fragmented(tmp_path)
        pdir = glob.glob(os.path.join(out, "lang=*"))[0]
        orphan = os.path.join(pdir, "shard-dead.parquet.tmp999")
        open(orphan, "w").write("garbage from a crashed pass")
        compact_partitioned(out, "lang", target_rows_per_shard=60)
        assert not os.path.exists(orphan)

    def test_detects_stale_duplicate_shard(self, ray_session, tmp_path):
        from parsel_ray.sources.partitioned import compact_partitioned

        out = self._fragmented(tmp_path)
        pdir = glob.glob(os.path.join(out, "lang=*"))[0]
        src = glob.glob(os.path.join(pdir, "*.parquet"))[0]
        # a crash between publish and cleanup leaves a duplicate shard:
        # the _DONE count no longer matches the footers and must raise
        import shutil
        shutil.copy(src, os.path.join(pdir, "shard-stalestale.parquet"))
        with pytest.raises(ray.exceptions.RayTaskError,
                           match="crash window|lost write"):
            compact_partitioned(out, "lang", target_rows_per_shard=60)

    def test_rejects_bad_target(self, ray_session, tmp_path):
        from parsel_ray.sources.partitioned import compact_partitioned

        with pytest.raises(ValueError):
            compact_partitioned(str(tmp_path), "lang",
                                target_rows_per_shard=0)


class TestBucketedJoinGuards:
    """Round-3 review fixes: hash-backend manifests and the all-empty
    join schema."""

    @staticmethod
    def _write(tmp_path, name, tbl, buckets=4):
        import ray.data as rd

        from parsel_ray.sources.partitioned import write_bucketed

        d = str(tmp_path / name)
        write_bucketed(rd.from_arrow(tbl), d, key_col="key",
                       buckets=buckets)
        return d

    def test_bucket_count_mismatch_raises(self, ray_session, tmp_path):
        import pyarrow as pa

        from parsel_ray.sources.partitioned import bucketed_join

        t = pa.table({"key": pa.array([1, 2], pa.int64()),
                      "v": pa.array([1, 2], pa.int64())})
        ld = self._write(tmp_path, "l", t, buckets=4)
        rd_ = self._write(tmp_path, "r", t, buckets=8)
        with pytest.raises(ValueError, match="bucket-count"):
            bucketed_join(ld, rd_, on="key", buckets=4)

    def test_hash_backend_mismatch_raises(self, ray_session, tmp_path):
        import json

        import pyarrow as pa

        from parsel_ray.sources.partitioned import bucketed_join

        t = pa.table({"key": pa.array(["a", "b"]),
                      "v": pa.array([1, 2], pa.int64())})
        ld = self._write(tmp_path, "l", t)
        rd_ = self._write(tmp_path, "r", t)
        m = json.load(open(rd_ + "/_BUCKETS.json"))
        m["hash_backend"] = "polars-0.0.1"  # simulate an older writer env
        json.dump(m, open(rd_ + "/_BUCKETS.json", "w"))
        with pytest.raises(ValueError, match="hash backends"):
            bucketed_join(ld, rd_, on="key", buckets=4)

    def test_disjoint_keys_keep_schema(self, ray_session, tmp_path):
        import pyarrow as pa

        from parsel_ray.sources.partitioned import bucketed_join

        ld = self._write(
            tmp_path, "l",
            pa.table({"key": pa.array([1, 2], pa.int64()),
                      "name": pa.array(["a", "b"])}),
        )
        rd_ = self._write(
            tmp_path, "r",
            pa.table({"key": pa.array([7, 8], pa.int64()),
                      "v": pa.array([70, 80], pa.int64())}),
        )
        out = bucketed_join(ld, rd_, on="key", buckets=4)
        assert out.count() == 0
        # the all-empty output must still carry the JOIN schema (Ray
        # drops schemas of all-empty map output without the typed union)
        assert set(out.schema().names) == {"key", "name", "v"}
