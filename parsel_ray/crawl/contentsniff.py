"""Byte-level content-type sniffing for fetched blobs.

A crawler cannot trust Content-Type headers (missing, lying, or absent in
WARC replays); the router stage that decides which pipeline a fetched
body enters — selector extraction, image decode, JSON drill-down,
quarantine — has to look at the bytes.  This module implements the
header-byte subset of WHATWG MIME-sniffing relevant to this engine's
pipelines: markup (html/xml), json, the image container formats the
codec layer supports (via :func:`parsel_ray.images.codecs.
sniff_image_meta`), and a binary/text fallback by control-byte density.

Reference parity: parsel itself only sees already-typed text
(``Selector(text=...)``) — the reference's callers (scrapy) do this
sniff in ``scrapy.responsetypes`` from headers+body.  This is the
from-scratch Ray-side equivalent over raw bytes, exercised distributed
in the ``content_type_route`` gate query.

Cost model: every sniffer reads O(512) header bytes — the stage is
IO-shaped, never decode-shaped, so it can front every 100 TB ingest
without being the bottleneck.
"""

from __future__ import annotations

import pyarrow as pa

from ..images.codecs import sniff_image_meta

# first non-whitespace markup prefixes → html (WHATWG table, lowered)
_HTML_PREFIXES = (
    b"<!doctype html", b"<html", b"<head", b"<body", b"<script",
    b"<iframe", b"<h1", b"<div", b"<font", b"<table", b"<a ", b"<style",
    b"<title", b"<b>", b"<br", b"<p", b"<!--",
)
_WS = b" \t\n\r\x0c"


def _lstrip_ws(data: bytes) -> bytes:
    i, n = 0, len(data)
    while i < n and data[i] in _WS:
        i += 1
    return data[i:]


def detect_content_type(data: bytes) -> str:
    """Classify header bytes → one of ``html xml json image/<fmt>
    text binary``.

    Decision order matters: image magics are exact and checked first;
    markup prefixes beat JSON (a ``<`` can't start JSON); the
    text/binary fallback uses control-byte density over the first 512
    bytes (NUL or >30% control bytes → binary), which is the classic
    file(1)/git heuristic."""
    if not data:
        return "binary"
    meta = sniff_image_meta(data)
    if meta is not None:
        return f"image/{meta[0]}"
    head = data[:512]
    if head.startswith(b"\xef\xbb\xbf"):
        # WHATWG MIME sniffing handles the UTF-8 BOM before the markup
        # table; without this, BOM-prefixed HTML/XML/JSON reads as text
        head = head[3:]
    head = _lstrip_ws(head)
    low = head[:16].lower()
    if low.startswith(b"<?xml"):
        return "xml"
    if any(low.startswith(p) for p in _HTML_PREFIXES):
        return "html"
    if head.startswith(b"<"):
        # other markup: tag-shaped but not a known HTML root → xml
        return "xml"
    if head[:1] in (b"{", b"["):
        return "json"
    sample = data[:512]
    if b"\x00" in sample:
        return "binary"
    ctrl = sum(1 for b in sample if b < 9 or 14 <= b < 32 or b == 127)
    return "binary" if ctrl * 10 > len(sample) * 3 else "text"


class ContentTypeRouter:
    """map_batches kernel: binary column → ``ctype`` string column.
    Stateless; the per-row loop touches only header bytes (sniffers are
    O(512) regardless of payload size), so batches of multi-MB blobs
    stay cheap."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        ctypes = [
            detect_content_type(d) if d is not None else "binary"
            for d in t[self.bytes_col].to_pylist()
        ]
        return t.append_column("ctype", pa.array(ctypes, pa.string()))
