"""WARC source/sink: record serialization, streaming parse, Ray read."""

import gzip
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from parsel_ray.sources.warc import (
    FIXED_WARC_DATE,
    _parse_records,
    read_warc,
    warc_record_bytes,
    write_warc_batch,
)


class TestRecordFormat:
    def test_roundtrip_one_record(self):
        raw = warc_record_bytes("http://a/b", b"<html>hi</html>")
        recs = list(_parse_records(__import__("io").BytesIO(raw)))
        assert len(recs) == 1
        r = recs[0]
        assert r["warc_type"] == "response"
        assert r["target_uri"] == "http://a/b"
        assert r["warc_date"] == FIXED_WARC_DATE
        assert r["http_status"] == 200
        assert r["http_content_type"].startswith("text/html")
        assert r["payload"] == b"<html>hi</html>"

    def test_binary_payload_with_crlf_inside(self):
        # payload containing CRLFCRLF must survive (Content-Length framing)
        body = b"A\r\n\r\nB" * 10 + bytes(range(256))
        raw = warc_record_bytes("http://x", body, http_status=404,
                                http_content_type="application/octet-stream")
        (r,) = _parse_records(__import__("io").BytesIO(raw))
        assert r["payload"] == body and r["http_status"] == 404

    def test_deterministic_bytes(self):
        a = warc_record_bytes("http://a", b"x")
        b = warc_record_bytes("http://a", b"x")
        assert a == b  # fixed date + digest record id

    def test_truncated_raises(self):
        raw = warc_record_bytes("http://a", b"0123456789")[:-8]
        with pytest.raises(ValueError, match="truncated"):
            list(_parse_records(__import__("io").BytesIO(raw)))

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="not a WARC"):
            list(_parse_records(__import__("io").BytesIO(b"HELLO\r\nxx")))


@pytest.mark.usefixtures("ray_session")
class TestRayRead:
    def _mk_corpus(self, d, n_shards=3, per=10, compress=False):
        shutil.rmtree(d, ignore_errors=True)
        expect = {}
        for s in range(n_shards):
            uris = [f"http://s{s}/p{i}" for i in range(per)]
            bodies = [f"<html><p>{s}:{i}</p></html>".encode() for i in range(per)]
            write_warc_batch(d, uris, bodies, compress=compress)
            expect.update(dict(zip(uris, bodies)))
        return expect

    def test_multi_shard_plain(self, tmp_path):
        d = str(tmp_path / "plain")
        expect = self._mk_corpus(d, compress=False)
        df = read_warc(d).to_pandas()
        assert len(df) == len(expect)
        got = dict(zip(df.target_uri, df.payload))
        assert {k: bytes(v) for k, v in got.items()} == expect

    def test_multi_shard_gzip(self, tmp_path):
        d = str(tmp_path / "gz")
        expect = self._mk_corpus(d, compress=True)
        for f in os.listdir(d):
            assert f.endswith(".warc.gz")
            # verify the on-disk layout really is multi-member gzip
            raw = open(os.path.join(d, f), "rb").read()
            assert raw[:2] == b"\x1f\x8b"
            assert gzip.decompress(raw).startswith(b"WARC/1.0\r\n")
        df = read_warc(d).to_pandas()
        got = {k: bytes(v) for k, v in zip(df.target_uri, df.payload)}
        assert got == expect

    def test_batching_and_schema(self, tmp_path):
        d = str(tmp_path / "batch")
        self._mk_corpus(d, n_shards=1, per=700)
        ds = read_warc(d, batch_rows=256)
        t = pa.concat_tables(
            [b for b in ds.iter_batches(batch_format="pyarrow")]
        )
        assert t.num_rows == 700
        assert t.schema.field("payload").type == pa.binary()
        assert t.schema.field("http_status").type == pa.int32()

    def test_idempotent_shard_names(self, tmp_path):
        d = str(tmp_path / "idem")
        uris, bodies = ["http://a/1"], [b"<html/>"]
        p1 = write_warc_batch(d, uris, bodies)
        p2 = write_warc_batch(d, uris, bodies)
        assert p1 == p2 and len(os.listdir(d)) == 1
