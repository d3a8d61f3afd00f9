"""WARC (ISO 28500 / WARC-1.0) source + sink for Ray Data.

WARC is the interchange format real web crawls read and write (Common
Crawl, Heritrix, wget --warc): a file is a sequence of records, each a
header block (``WARC/1.0`` + name:value lines) and a Content-Length-
delimited body, usually an ``application/http`` block whose own body is
the page payload.  This module gives the engine:

- :func:`read_warc` — a Ray Data ``FileBasedDatasource``: one streaming
  read task per file (the natural WARC parallelism unit — records are
  not independently seekable, files are), multi-member-gzip aware
  (``.warc.gz`` files concatenate one gzip member per record; a single
  ``GzipFile`` over the stream walks every member), yielding Arrow
  batches with the payload as a ``binary`` column — page bytes never
  become Python row objects.
- :func:`warc_record_bytes` / :func:`write_warc_batch` — a
  deterministic writer (fixed WARC-Date, content-digest record ids and
  shard names) so distributed tasks can emit WARC shards idempotently:
  a retried task rewrites the same bytes to the same name.

Scale shape: reading N files is N independent streaming tasks with
backpressure (Ray Data's normal file-reading path); writing happens
worker-side inside ``map_batches`` — the driver never sees page bytes.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from urllib.parse import quote
from typing import Iterator

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

# Deterministic by design: synthesized archives must be byte-identical
# across runs/parallelism so tests and resumable pipelines can compare.
FIXED_WARC_DATE = "2026-01-01T00:00:00Z"

# minimal RFC 9110 reason phrases — a 404 must not serialize as "404 OK"
_HTTP_REASONS = {
    200: "OK", 201: "Created", 204: "No Content", 301: "Moved Permanently",
    302: "Found", 304: "Not Modified", 400: "Bad Request", 401: "Unauthorized",
    403: "Forbidden", 404: "Not Found", 410: "Gone", 429: "Too Many Requests",
    500: "Internal Server Error", 502: "Bad Gateway",
    503: "Service Unavailable",
}

_CRLF = b"\r\n"


def warc_record_bytes(
    target_uri: str,
    body: bytes,
    *,
    warc_type: str = "response",
    http_status: int = 200,
    http_content_type: str = "text/html; charset=utf-8",
    warc_date: str = FIXED_WARC_DATE,
) -> bytes:
    """Serialize ONE WARC record.  For ``response`` records the block is
    a full ``application/http`` message (status line + headers + body);
    for anything else the block is ``body`` verbatim."""
    if warc_type == "response":
        reason = _HTTP_REASONS.get(http_status, "")
        http_head = (
            f"HTTP/1.1 {http_status} {reason}\r\n"
            f"Content-Type: {http_content_type}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("ascii")
        block = http_head + body
        content_type = "application/http; msgtype=response"
    else:
        block = body
        content_type = "application/warc-fields"
    # WARC headers are ASCII: percent-encode any raw non-ASCII in the
    # URI (IRIs are routine in real crawls) instead of crashing the
    # shard task; already-escaped sequences pass through untouched
    target_uri = quote(target_uri, safe=":/?#[]@!$&'()*+,;=%~._-")
    rid = hashlib.md5(
        warc_type.encode() + b"\x00" + target_uri.encode() + b"\x00" + block
    ).hexdigest()
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {warc_type}\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {warc_date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode("ascii")
    return head + block + _CRLF + _CRLF


def write_warc_batch(
    out_dir: str,
    uris: list[str],
    bodies: list[bytes],
    *,
    compress: bool = False,
    statuses: list[int] | None = None,
) -> str:
    """Write one WARC shard for a batch of pages (called INSIDE a Ray
    task — worker-side I/O).  The shard name is a digest of the record
    bytes, so retries and re-runs converge on identical files
    (``os.replace`` publish, same idempotence contract as the
    partitioned parquet sink).  Returns the shard path."""
    recs = [
        warc_record_bytes(
            u, b, http_status=(statuses[i] if statuses else 200)
        )
        for i, (u, b) in enumerate(zip(uris, bodies))
    ]
    if compress:
        # one gzip member per record: the standard .warc.gz layout
        payload = b"".join(
            gzip.compress(r, compresslevel=1, mtime=0) for r in recs
        )
        ext = "warc.gz"
    else:
        payload = b"".join(recs)
        ext = "warc"
    name = hashlib.md5(payload).hexdigest()[:20]
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.{ext}")
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, path)
    return path


class _Buffered:
    """Minimal buffered reader over a pyarrow NativeFile / file object:
    readline + exact-count read, no full-file slurp."""

    __slots__ = ("f", "buf", "pos")

    def __init__(self, f) -> None:
        self.f = f
        self.buf = b""
        self.pos = 0

    def _fill(self, n: int = 1 << 16) -> bool:
        chunk = self.f.read(n)
        if not chunk:
            return False
        if self.pos:
            self.buf = self.buf[self.pos :]
            self.pos = 0
        self.buf += chunk
        return True

    def readline(self) -> bytes:
        while True:
            i = self.buf.find(b"\n", self.pos)
            if i != -1:
                line = self.buf[self.pos : i + 1]
                self.pos = i + 1
                return line
            if not self._fill():
                line = self.buf[self.pos :]
                self.pos = len(self.buf)
                return line

    def read_exact(self, n: int) -> bytes:
        while len(self.buf) - self.pos < n:
            if not self._fill(max(n, 1 << 16)):
                break
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


def _parse_records(raw) -> Iterator[dict]:
    """Yield parsed records from a (decompressed) WARC byte stream."""
    r = _Buffered(raw)
    while True:
        line = r.readline()
        while line in (_CRLF, b"\n"):  # inter-record blank lines
            line = r.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            raise ValueError(f"not a WARC record header: {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            h = r.readline()
            if h in (_CRLF, b"\n", b""):
                break
            k, _, v = h.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        n = int(headers.get("content-length", "0"))
        block = r.read_exact(n)
        if len(block) != n:
            raise ValueError("truncated WARC record body")
        rec = {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": block,
        }
        if headers.get("content-type", "").startswith("application/http"):
            split = block.find(b"\r\n\r\n")
            if split != -1:
                head, body = block[:split], block[split + 4 :]
                lines = head.split(b"\r\n")
                parts = lines[0].split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                for hl in lines[1:]:
                    if hl.lower().startswith(b"content-type:"):
                        rec["http_content_type"] = (
                            hl.split(b":", 1)[1].strip().decode(
                                "utf-8", "replace"
                            )
                        )
                rec["payload"] = body
        yield rec


_SCHEMA = pa.schema(
    [
        ("record_id", pa.string()),
        ("warc_type", pa.string()),
        ("target_uri", pa.string()),
        ("warc_date", pa.string()),
        ("http_status", pa.int32()),
        ("http_content_type", pa.string()),
        ("payload", pa.binary()),
    ]
)


class WarcDatasource(FileBasedDatasource):
    """Streaming WARC reader: one read task per file, records yielded in
    Arrow batches of ``batch_rows`` — a 100 TB archive is just many
    files fanned across the cluster by Ray Data's normal file planner."""

    _FILE_EXTENSIONS = ["warc", "warc.gz"]

    def __init__(self, paths, *, batch_rows: int = 256, **kwargs):
        super().__init__(paths, **kwargs)
        self._batch_rows = batch_rows

    def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
        # sniff, don't trust extensions: Ray/pyarrow may already have
        # decompressed a .gz stream by extension inference.  If gzip
        # magic remains, decompress here — GzipFile transparently walks
        # the multi-member layout (.warc.gz = one member per record).
        buf = io.BufferedReader(_RawAdapter(f))
        if buf.peek(2)[:2] == b"\x1f\x8b":
            f = gzip.GzipFile(fileobj=buf)
        else:
            f = buf
        rows: list[dict] = []
        for rec in _parse_records(f):
            rows.append(rec)
            if len(rows) >= self._batch_rows:
                yield pa.Table.from_pylist(rows, schema=_SCHEMA)
                rows = []
        if rows:
            yield pa.Table.from_pylist(rows, schema=_SCHEMA)


class _RawAdapter(io.RawIOBase):
    """Adapt a pyarrow NativeFile to the io.RawIOBase protocol GzipFile
    wants (readinto), keeping the read streaming."""

    def __init__(self, f) -> None:
        self.f = f

    def readable(self) -> bool:  # pragma: no cover
        return True

    def readinto(self, b) -> int:
        data = self.f.read(len(b))
        n = len(data)
        b[:n] = data
        return n


def read_warc(paths, *, batch_rows: int = 256, **kwargs):
    """``ray.data.read_datasource`` over :class:`WarcDatasource`."""
    import ray.data as rd

    return rd.read_datasource(
        WarcDatasource(paths, batch_rows=batch_rows, **kwargs)
    )
