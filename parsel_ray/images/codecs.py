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
# + palette GIF87a (LZW)
ALL_FORMATS = ("ppm", "png", "qjpg", "jpeg", "gif", "bmp")


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
    """RGB-contract decode: the full decoder below (all filters / color
    types), channel-normalized to (h, w, 3)."""
    return png_to_rgb(decode_png(data))


# -- full PNG (filters 0-4, color types 0/2/3/4/6, 8-bit) ------------------
#
# The minimal ``_encode_png``/``_decode_png`` pair above stays frozen (the
# deterministic crawl corpus hashes its bytes); the full codec below is the
# real-web surface: all five scanline filters, grayscale / gray+alpha /
# palette / RGB / RGBA color types, multi-IDAT streams and CRC checks.
# Reference semantics: PNG spec (RFC 2083 / ISO 15948) — the same byte
# contract parsel-consuming crawlers meet via PIL; here it is pure
# numpy+zlib so every worker decodes identically.

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_CTYPE_FOR_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth_predict(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int arrays (spec §6.6)."""
    p = a + b - c
    pa_ = np.abs(p - a)
    pb_ = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb_) & (pa_ <= pc_), a, np.where(pb_ <= pc_, b, c))


def _png_filter_rows(img: np.ndarray, bpp: int, mode) -> np.ndarray:
    """Filter scanlines for encode.  ``img`` is (h, stride) uint8; returns
    (h, 1+stride) with the filter-type byte prefixed.  ``mode`` is an int
    0-4 to force one filter, or "adaptive" for the libpng minimum-sum-of-
    absolute-differences heuristic.  Encode-side neighbors are RAW bytes,
    so all five candidates vectorize over the whole image at once."""
    h, stride = img.shape
    cur = img.astype(np.int64)
    prev = np.vstack([np.zeros((1, stride), np.int64), cur[:-1]])
    left = np.zeros_like(cur)
    left[:, bpp:] = cur[:, :-bpp]
    upleft = np.zeros_like(cur)
    upleft[:, bpp:] = prev[:, :-bpp]
    cand = np.empty((5, h, stride), np.uint8)
    cand[0] = img
    cand[1] = (cur - left) & 0xFF
    cand[2] = (cur - prev) & 0xFF
    cand[3] = (cur - ((left + prev) >> 1)) & 0xFF
    cand[4] = (cur - _paeth_predict(left, prev, upleft)) & 0xFF
    if mode == "adaptive":
        # score = sum of |signed byte| per row per filter; argmin wins
        signed = np.where(cand > 127, 256 - cand.astype(np.int64),
                          cand.astype(np.int64))
        pick = np.argmin(signed.sum(axis=2), axis=0)
    else:
        pick = np.full(h, int(mode), np.intp)
    out = np.empty((h, 1 + stride), np.uint8)
    out[:, 0] = pick
    out[:, 1:] = cand[pick, np.arange(h)]
    return out


def encode_png(px: np.ndarray, filter_mode="adaptive", level: int = 6) -> bytes:
    """Full 8-bit PNG encoder.  ``px`` is (h, w) or (h, w, c) uint8 with
    c in {1, 2, 3, 4} → color type 0/4/2/6; ``filter_mode`` forces one
    scanline filter (0-4) or picks per-row adaptively."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    ctype = _CTYPE_FOR_CHANNELS[c]
    raw = _png_filter_rows(px.reshape(h, w * c), c, filter_mode)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), level=level))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse scanline filtering.  Row-sequential by construction (Up /
    Average / Paeth reference the RECONSTRUCTED previous row); within a
    row, None/Up are pure vector ops, Sub is a per-lane cumsum (mod 256
    distributes over the running sum), and Average/Paeth run a per-BYTE
    Python-scalar loop: the byte recurrence is inherently sequential in
    ``left``, and scalar int ops measure ~15x faster than numpy calls on
    ``bpp``-length arrays at scanline widths."""
    stride = w * bpp
    rows = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = line
        elif f == 1:  # Sub
            rec = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) & 0xFF
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average
            ln = line.tolist()
            up = prev.tolist()
            rl = [0] * stride
            for i in range(stride):
                a = rl[i - bpp] if i >= bpp else 0
                rl[i] = (ln[i] + ((a + up[i]) >> 1)) & 0xFF
            rec = np.asarray(rl, np.int64)
        elif f == 4:  # Paeth
            ln = line.tolist()
            up = prev.tolist()
            rl = [0] * stride
            for i in range(stride):
                a = rl[i - bpp] if i >= bpp else 0
                b = up[i]
                c = up[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa_ = p - a if p >= a else a - p
                pb_ = p - b if p >= b else b - p
                pc_ = p - c if p >= c else c - p
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                    (b if pb_ <= pc_ else c)
                rl[i] = (ln[i] + pred) & 0xFF
            rec = np.asarray(rl, np.int64)
        else:
            raise ValueError(f"corrupt PNG: filter type {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


# Adam7 pass geometry: (x0, y0, dx, dy) per pass, PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_deinterlace(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reassemble an Adam7 stream: each of the 7 passes is an
    independently-filtered sub-image; unfilter it, then scatter into
    the full frame by strided assignment (vectorized per pass)."""
    out = np.zeros((h, w, bpp), np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        n = ph * (1 + pw * bpp)
        if pos + n > raw.size:
            raise ValueError("corrupt PNG: Adam7 pass truncated")
        px = _png_unfilter(raw[pos : pos + n], ph, pw, bpp)
        out[y0::dy, x0::dx] = px.reshape(ph, pw, bpp)
        pos += n
    if pos != raw.size:
        raise ValueError("corrupt PNG: Adam7 size mismatch")
    return out


def decode_png(data: bytes, check_crc: bool = True) -> np.ndarray:
    """Full 8-bit PNG decoder → (h, w, c) uint8 with c in {1, 2, 3, 4}
    (palette images expand to RGB, c=3).  Handles all five scanline
    filters, multiple IDAT chunks, Adam7 interlacing, and verifies
    chunk CRCs.  Sub-8-bit streams raise ValueError."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a png")
    pos = len(_PNG_SIG)
    w = h = ctype = None
    interlace = 0
    palette = None
    idat = bytearray()
    saw_iend = False
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("corrupt PNG: truncated chunk")
        if check_crc:
            (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
            if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
                raise ValueError(f"corrupt PNG: bad CRC in {tag!r}")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack_from(
                ">IIBBBBB", payload
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("corrupt PNG: bad compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(
                    f"corrupt PNG: interlace method {interlace}"
                )
        elif tag == b"PLTE":
            if length % 3:
                raise ValueError("corrupt PNG: PLTE length not multiple of 3")
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            saw_iend = True
            break
    if w is None:
        raise ValueError("corrupt PNG: missing IHDR")
    if not saw_iend:
        # spec: IEND is mandatory — its absence means a truncated stream
        raise ValueError("corrupt PNG: truncated stream (no IEND)")
    bpp = _PNG_CHANNELS[ctype]
    try:
        raw = np.frombuffer(zlib.decompress(bytes(idat)), np.uint8)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG: zlib {e}") from e
    if interlace == 1:
        px = _png_deinterlace(raw, h, w, bpp)
    else:
        if raw.size != h * (1 + w * bpp):
            raise ValueError("corrupt PNG: IDAT size mismatch")
        px = _png_unfilter(raw, h, w, bpp).reshape(h, w, bpp)
    if ctype == 3:
        if palette is None:
            raise ValueError("corrupt PNG: palette image without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise ValueError("corrupt PNG: palette index out of range")
        return palette[idx]
    return px


def png_to_rgb(px: np.ndarray) -> np.ndarray:
    """Channel-normalize a ``decode_png`` result to the repo's RGB (h,w,3)
    contract: gray broadcasts, alpha drops (crawl images are opaque)."""
    c = px.shape[2]
    if c == 1:
        return np.repeat(px, 3, axis=2)
    if c == 2:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if c == 4:
        return np.ascontiguousarray(px[:, :, :3])
    return px


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


# -- BMP (BITMAPINFOHEADER, uncompressed 24-bit BGR, bottom-up) -------------


def _encode_bmp(px: np.ndarray) -> bytes:
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    size = 54 + h * stride
    hdr = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, h * stride, 2835, 2835, 0, 0
    )
    return hdr + rows.tobytes()


def _decode_bmp(data: bytes) -> np.ndarray:
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack_from("<I", data, 10)
    hsz, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hsz < 40 or bpp != 24 or comp != 0:
        raise ValueError("unsupported BMP: need uncompressed 24-bit")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if off + h * stride > len(data):
        raise ValueError("corrupt BMP: truncated pixel data")
    rows = np.frombuffer(data[off : off + h * stride], np.uint8).reshape(
        h, stride
    )
    px = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return np.ascontiguousarray(px[::-1] if flip else px)


def _encode_gif(px: np.ndarray) -> bytes:
    from .gif import encode_gif, quantize_332

    return encode_gif(quantize_332(px))


def _decode_gif(data: bytes) -> np.ndarray:
    from .gif import decode_gif_rgb

    return decode_gif_rgb(data)


_ENC = {"ppm": _encode_ppm, "png": _encode_png, "qjpg": _encode_qjpg,
        "jpeg": _encode_jpeg, "gif": _encode_gif, "bmp": _encode_bmp}
_DEC = {"ppm": _decode_ppm, "png": _decode_png, "qjpg": _decode_qjpg,
        "jpeg": _decode_jpeg, "gif": _decode_gif, "bmp": _decode_bmp}

LOSSLESS = {"ppm": True, "png": True, "qjpg": False, "jpeg": False,
            "gif": False, "bmp": True}


def encode_image(px: np.ndarray, fmt: str) -> bytes:
    if fmt not in _ENC:
        raise ValueError(f"unknown fmt {fmt!r}")
    px = np.ascontiguousarray(px, dtype=np.uint8)
    return _ENC[fmt](px)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt not in _DEC:
        raise ValueError(f"unknown fmt {fmt!r}")
    return _DEC[fmt](bytes(data))


# -- resampling -------------------------------------------------------------


def resize_bilinear(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample to (out_h, out_w), half-pixel-center convention
    (the align_corners=False standard shared by PIL/torch/OpenCV).
    Fully vectorized: two gathers + two lerps; channels broadcast."""
    px = np.asarray(px)
    h, w = px.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    p = px.astype(np.float64)
    if p.ndim == 2:
        p = p[:, :, None]
        squeeze = True
    else:
        squeeze = False
    py0 = p[y0]
    py1 = p[y1]
    top = py0[:, x0] * (1 - wx) + py0[:, x1] * wx
    bot = py1[:, x0] * (1 - wx) + py1[:, x1] * wx
    out = top * (1 - wy) + bot * wy
    if px.dtype == np.uint8:
        out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


# -- metrics ---------------------------------------------------------------


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def _box_mean(x: np.ndarray, win: int) -> np.ndarray:
    """Uniform win x win local mean, 'valid' region, via 2D cumsum —
    O(HW) regardless of window size (no per-window loop)."""
    c = np.cumsum(np.cumsum(x, axis=0), axis=1)
    c = np.pad(c, ((1, 0), (1, 0)))
    s = (
        c[win:, win:] - c[:-win, win:] - c[win:, :-win] + c[:-win, :-win]
    )
    return s / (win * win)


def ssim(a: np.ndarray, b: np.ndarray, win: int = 7) -> float:
    """Mean structural similarity (Wang et al. 2004, IEEE TIP 13(4) —
    public algorithm) over grayscale with a uniform win x win window
    (the paper's Gaussian window is a weighting refinement; the uniform
    variant keeps the kernel one cumsum pipeline).  1.0 = identical;
    lossy re-encodes of the same image score near 1, unrelated content
    near 0.  Inputs must share dims; images smaller than the window
    fall back to a global (single-window) SSIM."""
    if a.shape != b.shape:
        raise ValueError(f"ssim needs equal dims (got {a.shape} vs {b.shape})")
    ga = a.astype(np.float64) @ np.array([0.299, 0.587, 0.114]) \
        if a.ndim == 3 else a.astype(np.float64)
    gb = b.astype(np.float64) @ np.array([0.299, 0.587, 0.114]) \
        if b.ndim == 3 else b.astype(np.float64)
    C1, C2 = (0.01 * 255.0) ** 2, (0.03 * 255.0) ** 2
    if min(ga.shape) < win:  # tiny image: one global window
        mu_a, mu_b = ga.mean(), gb.mean()
        va, vb = ga.var(), gb.var()
        cov = ((ga - mu_a) * (gb - mu_b)).mean()
        return float(
            ((2 * mu_a * mu_b + C1) * (2 * cov + C2))
            / ((mu_a**2 + mu_b**2 + C1) * (va + vb + C2))
        )
    mu_a, mu_b = _box_mean(ga, win), _box_mean(gb, win)
    va = _box_mean(ga * ga, win) - mu_a * mu_a
    vb = _box_mean(gb * gb, win) - mu_b * mu_b
    cov = _box_mean(ga * gb, win) - mu_a * mu_b
    smap = ((2 * mu_a * mu_b + C1) * (2 * cov + C2)) / (
        (mu_a * mu_a + mu_b * mu_b + C1) * (va + vb + C2)
    )
    return float(smap.mean())


def phash64(px: np.ndarray) -> int:
    """64-bit average hash: grayscale → 8×8 block means → bit = mean-pixel
    > global mean → packed int64 (deterministic, resize-free: block means
    over an even 8×8 grid)."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    if h < 8 or w < 8:
        # sub-8px images (tracking pixels, tiny icons) would produce
        # zero-width blocks (divide-by-zero -> degenerate hash 0, every
        # such image colliding); nearest-neighbor upscale preserves the
        # structure and keeps the hash deterministic
        if h < 8:
            gray = np.repeat(gray, -(-8 // h), axis=0)
        if w < 8:
            gray = np.repeat(gray, -(-8 // w), axis=1)
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


def phash_orbit64(px: np.ndarray) -> int:
    """Rotation/mirror-canonical perceptual hash: the minimum
    :func:`phash64` over the image's 8-element dihedral orbit (the EXIF
    orientation transforms).  Any two images related by an EXACT
    rotation/flip of the pixel array share the hash — the orbit sets are
    identical — so hash-equality grouping catches rotated duplicates
    that a single-orientation phash scatters across 8 buckets.  The
    transforms must be applied to pixels (not to the 8x8 cell grid):
    block boundaries of non-multiple-of-8 dims do not commute with
    flips.  Lossy re-encoded rotations perturb bits and need the
    Hamming-band path instead; this is the exact-orbit key."""
    from .exif import apply_exif_orientation

    return min(
        phash64(apply_exif_orientation(px, o)) for o in range(1, 9)
    )


# -- header sniffing (format + dimensions WITHOUT decoding) ----------------
#
# At crawl scale most fetched blobs only need (fmt, w, h) to be routed,
# filtered or size-bucketed; full decode is 100-1000x the cost of reading
# the few header bytes every container format front-loads.  Each sniffer
# touches O(header) bytes — no entropy decode, no zlib inflate.
# Reference parity: parsel has no image layer; this mirrors what a scrapy
# media pipeline learns from Content-Type + PIL's lazy ``Image.open``
# (which also reads only the header).


def _sniff_jpeg_dims(data: bytes) -> "tuple[int, int] | None":
    """Walk JFIF marker segments to the first SOF0/1/2 frame header.

    Marker-segment lengths let us hop over quantization/huffman tables and
    APPn blobs without parsing them; dimensions live at a fixed offset in
    the SOF payload (ITU T.81 B.2.2)."""
    n = len(data)
    i = 2  # past SOI
    while i + 3 < n:
        if data[i] != 0xFF:
            return None  # lost marker sync: corrupt header
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            if i + 9 > n:
                return None
            h, w = struct.unpack_from(">HH", data, i + 5)
            return (w, h)
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI/RSTn: bare
            i += 2
            continue
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before any SOF
            return None
        (seglen,) = struct.unpack_from(">H", data, i + 2)
        if seglen < 2:
            return None
        i += 2 + seglen
    return None


def _sniff_pnm_dims(data: bytes) -> "tuple[int, int] | None":
    """P6 header: ``P6 <ws> w <ws> h <ws> maxval``; comments allowed."""
    toks, i, n = [], 2, len(data)
    while i < min(n, 256) and len(toks) < 2:
        c = data[i]
        if c == 0x23:  # '#' comment to end of line
            while i < n and data[i] not in (0x0A, 0x0D):
                i += 1
        elif c in (0x20, 0x09, 0x0A, 0x0D):
            i += 1
        else:
            j = i
            while j < n and data[j] not in (0x20, 0x09, 0x0A, 0x0D):
                j += 1
            toks.append(data[i:j])
            i = j
    try:
        w, h = int(toks[0]), int(toks[1])
    except (IndexError, ValueError):
        return None
    return (w, h) if w > 0 and h > 0 else None


def sniff_image_meta(data: bytes) -> "tuple[str, int, int] | None":
    """Identify ``(fmt, w, h)`` from magic bytes + fixed-offset header
    fields alone.  Returns None for unknown/corrupt headers rather than
    raising — the crawl path routes those to quarantine.  Supported:
    every fmt in ALL_FORMATS (ppm, png, qjpg, jpeg, gif, bmp)."""
    full = bytes(data)
    data = full[:4096]  # fixed-offset sniffers never need more
    n = len(data)
    if n >= 24 and data.startswith(_PNG_SIG) and data[12:16] == b"IHDR":
        w, h = struct.unpack_from(">II", data, 16)
        return ("png", w, h) if 0 < w < 1 << 31 and 0 < h < 1 << 31 else None
    if n >= 4 and data.startswith(b"\xff\xd8\xff"):
        # JPEG dims sit AFTER the APPn segments — real camera files
        # front-load >4 KB of EXIF/thumbnail, so the segment walk (which
        # HOPS by declared lengths, O(#segments) regardless of size)
        # must see the full buffer or valid JPEGs sniff as corrupt
        dims = _sniff_jpeg_dims(full)
        return ("jpeg", dims[0], dims[1]) if dims else None
    if n >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack_from("<HH", data, 6)
        return ("gif", w, h) if w > 0 and h > 0 else None
    if n >= 26 and data[:2] == b"BM":
        hsz, w, h = struct.unpack_from("<Iii", data, 14)
        if hsz >= 40 and w > 0 and h != 0:
            return ("bmp", w, abs(h))
        return None
    if data.startswith(b"P6"):
        dims = _sniff_pnm_dims(data)
        return ("ppm", dims[0], dims[1]) if dims else None
    if data.startswith(b"QJ1\n"):
        dims, _, _ = data[4:].partition(b"\n")
        try:
            w, h = (int(x) for x in dims.split())
        except ValueError:
            return None
        return ("qjpg", w, h) if w > 0 and h > 0 else None
    return None
