"""EXIF orientation: APP1 segment parse, minimal writer, and the eight
pixel transforms (EXIF/TIFF tag 274).

A web-scale image pipeline must honor orientation before any visual
operator (resize, phash, augmentation, training tensors): cameras store
sensor-native pixels plus this tag, so 2-8 of 8 orientations render
rotated/mirrored if ignored, and near-dup detection silently misses
rotated duplicates.  No reference equivalent (the reference is a
per-document selector library; this belongs to the BASELINE.json image
tier).

Scope: the orientation tag only.  The parser walks JPEG markers to the
first APP1 "Exif\\0\\0" payload, reads the TIFF header (both byte
orders), scans IFD0 for tag 0x0112 SHORT, and rejects out-of-range or
truncated structures by returning None — corrupt EXIF must never fail
a decode that would otherwise succeed.  The writer emits a minimal
valid APP1 (one IFD0 entry) so synthetic corpora can plant every
orientation; ``strip_exif_orientation`` rewrites the tag to 1 after
pixels are normalized, keeping byte metadata consistent.
"""

from __future__ import annotations

import struct

import numpy as np

_EXIF_MAGIC = b"Exif\x00\x00"
_ORIENTATION_TAG = 0x0112


def parse_exif_orientation(data: bytes) -> int | None:
    """Orientation value 1-8 from the first APP1 Exif segment of a JPEG,
    or None (no/invalid EXIF, out-of-range value)."""
    seg = _find_app1(data)
    if seg is None:
        return None
    off = _find_orientation_entry(seg)
    if off is None:
        return None
    endian = "<" if seg[6:8] == b"II" else ">"
    val = struct.unpack_from(endian + "H", seg, off + 8)[0]
    return val if 1 <= val <= 8 else None


def _find_app1(data: bytes) -> bytes | None:
    """The APP1 payload (starting at the Exif magic) or None."""
    if len(data) < 4 or data[0:2] != b"\xFF\xD8":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:  # start of scan: no APP1 will follow
            return None
        length = struct.unpack_from(">H", data, pos + 2)[0]
        if length < 2 or pos + 2 + length > n:
            return None
        if marker == 0xE1 and data[pos + 4 : pos + 10] == _EXIF_MAGIC:
            return data[pos + 4 : pos + 2 + length]
        pos += 2 + length
    return None


def _find_orientation_entry(seg: bytes) -> int | None:
    """Byte offset (within ``seg``) of the IFD0 entry for tag 0x0112."""
    tiff = 6  # after the Exif magic
    if len(seg) < tiff + 8:
        return None
    order = seg[tiff : tiff + 2]
    if order == b"II":
        endian = "<"
    elif order == b"MM":
        endian = ">"
    else:
        return None
    if struct.unpack_from(endian + "H", seg, tiff + 2)[0] != 42:
        return None
    ifd0 = struct.unpack_from(endian + "I", seg, tiff + 4)[0]
    base = tiff + ifd0
    if base + 2 > len(seg):
        return None
    count = struct.unpack_from(endian + "H", seg, base)[0]
    for i in range(count):
        off = base + 2 + 12 * i
        if off + 12 > len(seg):
            return None
        tag, typ = struct.unpack_from(endian + "HH", seg, off)
        if tag == _ORIENTATION_TAG and typ == 3:  # SHORT
            return off
    return None


def write_exif_orientation(data: bytes, orientation: int) -> bytes:
    """JPEG bytes with a minimal APP1 Exif segment carrying the given
    orientation, inserted right after SOI.  An existing orientation
    entry is rewritten in place instead."""
    if not 1 <= orientation <= 8:
        raise ValueError(f"orientation must be 1-8 (got {orientation})")
    if len(data) < 2 or data[0:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    seg = _find_app1(data)
    if seg is not None and _find_orientation_entry(seg) is not None:
        # rewrite in place: locate the segment again to get its absolute
        # position, then patch the 2 value bytes
        buf = bytearray(data)
        pos = 2
        while True:
            marker = buf[pos + 1]
            if 0xD0 <= marker <= 0xD7 or marker in (0xD8, 0x01):
                pos += 2
                continue
            length = struct.unpack_from(">H", buf, pos + 2)[0]
            if marker == 0xE1 and bytes(buf[pos + 4 : pos + 10]) == _EXIF_MAGIC:
                payload = bytes(buf[pos + 4 : pos + 2 + length])
                off = _find_orientation_entry(payload)
                endian = "<" if payload[6:8] == b"II" else ">"
                struct.pack_into(
                    endian + "H", buf, pos + 4 + off + 8, orientation
                )
                return bytes(buf)
            pos += 2 + length
    # build a minimal big-endian TIFF: header + IFD0 with one entry
    tiff = (
        b"MM\x00\x2a"
        + struct.pack(">I", 8)  # IFD0 at offset 8
        + struct.pack(">H", 1)  # one entry
        + struct.pack(">HHI", _ORIENTATION_TAG, 3, 1)
        + struct.pack(">HH", orientation, 0)  # SHORT value, padding
        + struct.pack(">I", 0)  # no next IFD
    )
    payload = _EXIF_MAGIC + tiff
    app1 = b"\xFF\xE1" + struct.pack(">H", len(payload) + 2) + payload
    return data[:2] + app1 + data[2:]


def strip_exif_orientation(data: bytes) -> bytes:
    """Rewrite an existing orientation tag to 1 (top-left); bytes pass
    through untouched when no orientation entry exists."""
    seg = _find_app1(data)
    if seg is None or _find_orientation_entry(seg) is None:
        return data
    return write_exif_orientation(data, 1)


def apply_exif_orientation(px: np.ndarray, orientation: int | None) -> np.ndarray:
    """Pixels as they should be DISPLAYED, per EXIF tag 274.  (H, W, C)
    or (H, W); returns a contiguous copy for orientations 2-8."""
    if orientation is None or orientation == 1:
        return px
    if orientation == 2:
        out = px[:, ::-1]
    elif orientation == 3:
        out = px[::-1, ::-1]
    elif orientation == 4:
        out = px[::-1, :]
    elif orientation == 5:  # transpose about the main diagonal
        out = np.swapaxes(px, 0, 1)
    elif orientation == 6:  # rotate 90 degrees clockwise to display
        out = np.swapaxes(px, 0, 1)[:, ::-1]
    elif orientation == 7:  # transverse: transpose about the anti-diagonal
        out = np.swapaxes(px, 0, 1)[::-1, ::-1]
    elif orientation == 8:  # rotate 90 degrees counter-clockwise
        out = np.swapaxes(px, 0, 1)[::-1, :]
    else:
        raise ValueError(f"orientation must be 1-8 (got {orientation})")
    return np.ascontiguousarray(out)
