"""Pure numpy/stdlib image codecs + perceptual hash + PSNR.

All images are RGB uint8 ``(h, w, 3)`` arrays.  Encoders/decoders are
deterministic byte-for-byte, so image cells generated on any worker are
identical — a requirement for the crawl-vs-oracle byte comparisons.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# formats the synthetic crawl corpus draws from (pagestore assigns by
# hash % len — adding here would change the deterministic corpus)
FORMATS = ("ppm", "png", "qjpg")
# full codec surface (encode_image/decode_image): FORMATS + baseline JPEG
ALL_FORMATS = ("ppm", "png", "qjpg", "jpeg")


# -- PPM (P6 binary) -------------------------------------------------------


def _encode_ppm(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def _decode_ppm(data: bytes) -> np.ndarray:
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 ppm")
    parts = data.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    raw = parts[3]
    return np.frombuffer(raw[: w * h * 3], dtype=np.uint8).reshape(h, w, 3)


# -- minimal PNG (RGB8, filter 0) -----------------------------------------


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _encode_png(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 per scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = px.reshape(h, w * 3)
    # level 1: container compression is not the contract (lossless
    # either way); ~2x faster encode for ~4% larger payloads
    idat = zlib.compress(raw.tobytes(), level=1)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def _decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a png")
    pos = len(_PNG_SIG)
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack_from(">IIBB", payload)
            if depth != 8 or ctype != 2:
                raise ValueError("only 8-bit RGB supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    if np.any(raw[:, 0] != 0):
        raise ValueError("only filter 0 supported")
    return raw[:, 1:].reshape(h, w, 3).copy()


# -- qjpg (toy lossy: 5-bit quantization + zlib) --------------------------


def _encode_qjpg(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    q = (px >> 3).astype(np.uint8)  # 5 bits per channel
    # level 1 (see _encode_png): speed over a few % of payload size
    return b"QJ1\n%d %d\n" % (w, h) + zlib.compress(q.tobytes(), level=1)


def _decode_qjpg(data: bytes) -> np.ndarray:
    if not data.startswith(b"QJ1"):
        raise ValueError("not a qjpg")
    hdr, _, rest = data.partition(b"\n")
    dims, _, comp = rest.partition(b"\n")
    w, h = (int(x) for x in dims.split())
    q = np.frombuffer(zlib.decompress(comp), dtype=np.uint8).reshape(h, w, 3)
    # midpoint reconstruction: error ∈ [-4, 3] → PSNR ≈ 40.8 dB
    return ((q << 3) | 4).astype(np.uint8)


def _encode_jpeg(px: np.ndarray) -> bytes:
    from .jpeg import encode_jpeg

    return encode_jpeg(px, quality=90)


def _decode_jpeg(data: bytes) -> np.ndarray:
    from .jpeg import decode_jpeg

    return decode_jpeg(data)


_ENC = {"ppm": _encode_ppm, "png": _encode_png, "qjpg": _encode_qjpg,
        "jpeg": _encode_jpeg}
_DEC = {"ppm": _decode_ppm, "png": _decode_png, "qjpg": _decode_qjpg,
        "jpeg": _decode_jpeg}

LOSSLESS = {"ppm": True, "png": True, "qjpg": False, "jpeg": False}


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt not in _ENC:
        raise ValueError(f"unknown fmt {fmt!r}")
    px = np.ascontiguousarray(px, dtype=np.uint8)
    return _ENC[fmt](px)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt not in _DEC:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _DEC[fmt](bytes(data))


# -- metrics ---------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def phash64(px: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → bit = mean-pixel
    > global mean → packed int64 (deterministic, resize-free: block means
    over an even 8×8 grid)."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    # two reduceat passes = all 64 block sums in two vector ops
    row_sums = np.add.reduceat(gray, ys[:8], axis=0)
    cells = np.add.reduceat(row_sums, xs[:8], axis=1)
    cells /= np.outer(np.diff(ys), np.diff(xs))
    bits = (cells > cells.mean()).reshape(-1)
    val = int.from_bytes(
        np.packbits(bits, bitorder="little").tobytes(), "little"
    )
    return val - (1 << 64) if val >= 1 << 63 else val
