"""Toy deterministic video container ("NV1") + frame access.

No real video codec library exists in this environment, so the container
is this engine's own: a header line ``NV1\\n<n> <w> <h> <fmt>\\n``
followed by ``n`` length-prefixed frames, each encoded with one of the
:mod:`parsel_ray.images.codecs` formats.  That makes the video stages'
plumbing REAL end-to-end (container parse → frame index → selective
decode) while staying honest that this is not MP4/ffmpeg: swapping in a
real demuxer replaces only :func:`frame_offsets` / :func:`read_frame`.
"""

from __future__ import annotations

import struct

import numpy as np

from .codecs import decode_image, encode_image

MAGIC = b"NV1\n"


def encode_video(frames: "list[np.ndarray]", fmt: str = "png") -> bytes:
    """Encode ``frames`` ((H, W, 3) uint8, equal sizes) into NV1 bytes."""
    if not frames:
        raise ValueError("empty video")
    h, w, _ = frames[0].shape
    out = bytearray()
    out += MAGIC
    out += f"{len(frames)} {w} {h} {fmt}\n".encode()
    for f in frames:
        if f.shape != frames[0].shape:
            raise ValueError("all frames must share one shape")
        payload = encode_image(f, fmt)
        out += struct.pack(">I", len(payload)) + payload
    return bytes(out)


def parse_header(data: bytes) -> tuple[int, int, int, str, int]:
    """(n_frames, w, h, fmt, payload_offset)."""
    if not data.startswith(MAGIC):
        raise ValueError("not an NV1 container")
    end = data.index(b"\n", len(MAGIC))
    n, w, h, fmt = data[len(MAGIC):end].decode().split()
    return int(n), int(w), int(h), fmt, end + 1


def frame_offsets(data: bytes) -> "tuple[list[int], str]":
    """Byte offsets of each frame payload (after its length prefix)."""
    n, _, _, fmt, pos = parse_header(data)
    offs = []
    for _ in range(n):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        offs.append(pos + 4)
        pos += 4 + ln
    return offs, fmt


def read_frame(data: bytes, index: int) -> np.ndarray:
    """Decode ONLY frame ``index`` (selective read — the point of the
    offset index)."""
    n, _, _, fmt, pos = parse_header(data)
    if not 0 <= index < n:
        raise IndexError(index)
    for i in range(index + 1):
        ln = struct.unpack(">I", data[pos:pos + 4])[0]
        if i == index:
            return decode_image(data[pos + 4:pos + 4 + ln], fmt)
        pos += 4 + ln
    raise AssertionError
