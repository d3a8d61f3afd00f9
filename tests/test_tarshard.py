"""WebDataset-style tar shard sink/source: determinism, grouping, pruning."""

import os
import tarfile
import tempfile

import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.sources.tarshard import (
    KEY_COL,
    read_tar_shards,
    write_tar_shards,
)


def _docs_table():
    return pa.table(
        {
            "k": pa.array(["a0", "a1", "b2"], pa.string()),
            "text": pa.array(["hello", "wörld", ""], pa.string()),
            "img": pa.array([b"\x89PNG01", b"\xff\xd8x", b""], pa.binary()),
            "lang": pa.array(["en", "de", "en"], pa.string()),
        }
    )


class TestWrite:
    def test_roundtrip_and_member_grouping(self, ray_session):
        out = tempfile.mkdtemp(prefix="tar_rt_", dir="/tmp")
        ds = rd.from_arrow(_docs_table())
        n = write_tar_shards(
            ds, out, key_col="k",
            payload_exts={"text": "txt", "img": "jpg"},
            meta_cols=["lang"],
        )
        assert n == 3
        back = read_tar_shards(out).to_pandas().set_index(KEY_COL)
        assert sorted(back.index) == ["a0", "a1", "b2"]
        assert back.loc["a1", "txt"] == "wörld".encode("utf-8")
        assert back.loc["a0", "jpg"] == b"\x89PNG01"
        assert b'"lang": "de"' in back.loc["a1", "json"]
        assert back.loc["b2", "txt"] == b""

    def test_sample_members_adjacent(self, ray_session):
        # the WebDataset loader contract: all members of one sample are
        # contiguous in the tar stream
        out = tempfile.mkdtemp(prefix="tar_adj_", dir="/tmp")
        write_tar_shards(
            rd.from_arrow(_docs_table()).repartition(1), out,
            key_col="k", payload_exts={"text": "txt", "img": "jpg"},
            meta_cols=["lang"],
        )
        shard = [f for f in os.listdir(out) if f.endswith(".tar")]
        assert len(shard) == 1
        with tarfile.open(os.path.join(out, shard[0])) as tf:
            names = [m.name for m in tf.getmembers()]
        prefixes = [n.rsplit(".", 1)[0] for n in names]
        # each key appears as one contiguous run
        seen = []
        for p in prefixes:
            if not seen or seen[-1] != p:
                seen.append(p)
        assert len(seen) == len(set(seen))

    def test_deterministic_bytes_across_rewrites(self, ray_session):
        # tar CONTENT is deterministic (USTAR, mtime=0, uid/gid=0) —
        # shard names carry the task id, so only bytes are compared
        blobs = []
        for _ in range(2):
            out = tempfile.mkdtemp(prefix="tar_det_", dir="/tmp")
            write_tar_shards(
                rd.from_arrow(_docs_table()).repartition(1), out,
                key_col="k", payload_exts={"text": "txt"},
                meta_cols=["lang"],
            )
            names = sorted(os.listdir(out))
            assert len(names) == 1
            blobs.append(open(os.path.join(out, names[0]), "rb").read())
        assert blobs[0] == blobs[1]


class TestRead:
    def test_ext_pruning_skips_members(self, ray_session):
        out = tempfile.mkdtemp(prefix="tar_prune_", dir="/tmp")
        write_tar_shards(
            rd.from_arrow(_docs_table()), out, key_col="k",
            payload_exts={"text": "txt", "img": "jpg"}, meta_cols=["lang"],
        )
        back = read_tar_shards(out, exts=["txt"]).to_pandas()
        assert sorted(back.columns) == [KEY_COL, "txt"]
        assert len(back) == 3

    def test_missing_dir_raises(self):
        with pytest.raises(FileNotFoundError):
            read_tar_shards(tempfile.mkdtemp(prefix="tar_empty_", dir="/tmp"))


def test_null_payload_member_skipped(ray_session, tmp_path):
    """A null payload value means the member file is absent for that
    sample (WebDataset semantics) — not a bytes(None) task crash."""
    import pyarrow as pa
    import ray.data as rd

    from parsel_ray.sources.tarshard import read_tar_shards, write_tar_shards

    t = pa.table(
        {
            "key": pa.array(["k0", "k1"]),
            "txt": pa.array(["hello", None]),
            "bin": pa.array([b"p0", b"p1"], pa.binary()),
        }
    )
    out = str(tmp_path / "shards")
    write_tar_shards(
        rd.from_arrow(t), out, key_col="key",
        payload_exts={"txt": "txt", "bin": "bin"},
    )
    rows = {r["__key__"]: r for r in read_tar_shards(out).take_all()}
    assert rows["k0"]["txt"] == b"hello" and rows["k1"]["bin"] == b"p1"
    # absent member surfaces as null, not empty bytes and not a crash
    assert rows["k1"]["txt"] is None
