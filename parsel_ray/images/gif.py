"""Pure-Python/numpy GIF87a codec (LZW), palette-indexed.

The crawl-tier contract is the same as :mod:`parsel_ray.images.jpeg`:
a deterministic encoder/decoder pair a crawler would otherwise get from
PIL, rebuilt from the public GIF87a specification so every Ray worker
produces byte-identical cells.  GIF is palette-indexed, so the lossy
step is the palette quantization (:func:`quantize_332` — fixed 3-3-2
RGB cube, no dithering, fully vectorized); encode→decode of the
quantized image is lossless, which is what the gate query asserts.

LZW is inherently per-symbol sequential — like the JPEG entropy coder,
each image decodes serially inside an actor-pool ``map_batches`` stage
and parallelism comes from the batch dimension.
"""

from __future__ import annotations

import struct

import numpy as np

_GIF_SIG = b"GIF87a"

# fixed 3-3-2 palette: index = (r>>5)<<5 | (g>>5)<<2 | (b>>6); midpoint
# reconstruction per bucket (r/g buckets are 32 wide, b buckets 64 wide)
_PAL_332 = np.zeros((256, 3), np.uint8)
_idx = np.arange(256)
_PAL_332[:, 0] = ((_idx >> 5) & 7) * 32 + 16
_PAL_332[:, 1] = ((_idx >> 2) & 7) * 32 + 16
_PAL_332[:, 2] = (_idx & 3) * 64 + 32


def quantize_332(px: np.ndarray) -> np.ndarray:
    """RGB (h,w,3) uint8 → palette indices (h,w) uint8 under the fixed
    3-3-2 cube.  Vectorized; deterministic."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    return (
        (px[:, :, 0] >> 5).astype(np.uint8) << 5
        | (px[:, :, 1] >> 5).astype(np.uint8) << 2
        | (px[:, :, 2] >> 6).astype(np.uint8)
    )


def palette_332() -> np.ndarray:
    """The fixed 256×3 palette matching :func:`quantize_332` (midpoint
    reconstruction per bucket)."""
    return _PAL_332.copy()


# -- LZW ---------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    CLEAR emitted first and whenever the table fills at 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    data = indices.tobytes()
    if not data:
        emit(eoi, width)
    else:
        prefix = data[0:1]
        for i in range(1, len(data)):
            nxt = prefix + data[i : i + 1]
            if nxt in table:
                prefix = nxt
                continue
            emit(table[prefix], width)
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
            elif next_code >= 4096:
                emit(clear, width)
                table = {bytes([j]): j for j in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
            prefix = data[i : i + 1]
        emit(table[prefix], width)
        emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("corrupt GIF: LZW stream truncated")
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: code beyond table")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("corrupt GIF: pixel data short")
    return bytes(out[:n_expected])


# -- container ---------------------------------------------------------------


def encode_gif(indices: np.ndarray, palette: np.ndarray | None = None) -> bytes:
    """Palette-indexed (h,w) uint8 + 256×3 palette → GIF87a bytes
    (global color table, single image, no interlace)."""
    if palette is None:
        palette = _PAL_332
    if palette.shape != (256, 3):
        raise ValueError("palette must be 256x3")
    indices = np.ascontiguousarray(indices, dtype=np.uint8)
    h, w = indices.shape
    out = bytearray(_GIF_SIG)
    # logical screen descriptor: global table, 8 bits/px, 256 entries
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)  # image descriptor
    min_code = 8
    out.append(min_code)
    lzw = _lzw_encode(indices.reshape(-1), min_code)
    for i in range(0, len(lzw), 255):
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif(data: bytes) -> "tuple[np.ndarray, np.ndarray]":
    """GIF87a bytes → (indices (h,w) uint8, palette 256×3 uint8).  Raises
    ValueError on corrupt/truncated streams (crawl-robustness contract,
    same as decode_jpeg/decode_png)."""
    if not data.startswith(_GIF_SIG):
        raise ValueError("not a GIF87a")
    if len(data) < 13:
        raise ValueError("corrupt GIF: truncated header")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    if not flags & 0x80:
        raise ValueError("corrupt GIF: no global color table")
    tbl_size = 2 << (flags & 7)
    if pos + tbl_size * 3 > len(data):
        raise ValueError("corrupt GIF: truncated color table")
    palette = np.zeros((256, 3), np.uint8)
    palette[:tbl_size] = np.frombuffer(
        data[pos : pos + tbl_size * 3], np.uint8
    ).reshape(tbl_size, 3)
    pos += tbl_size * 3
    # skip extensions (0x21) to the image descriptor
    while pos < len(data) and data[pos] == 0x21:
        pos += 2
        while pos < len(data) and data[pos]:
            pos += 1 + data[pos]
        pos += 1
    if pos >= len(data) or data[pos] != 0x2C:
        raise ValueError("corrupt GIF: missing image descriptor")
    if pos + 10 > len(data):  # struct.error would escape the contract
        raise ValueError("corrupt GIF: truncated image descriptor")
    ix, iy, iw, ih, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
    pos += 10
    if iflags & 0x80:
        raise ValueError("unsupported GIF: local color table")
    interlaced = bool(iflags & 0x40)
    if pos >= len(data):
        raise ValueError("corrupt GIF: truncated before LZW")
    min_code = data[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        raise ValueError("corrupt GIF: bad LZW min code size")
    lzw = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("corrupt GIF: unterminated data blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(data):
            raise ValueError("corrupt GIF: truncated data block")
        lzw += data[pos : pos + n]
        pos += n
    if pos >= len(data) or data[pos] != 0x3B:
        raise ValueError("corrupt GIF: missing trailer")
    raw = _lzw_decode(bytes(lzw), min_code, iw * ih)
    rows = np.frombuffer(raw, np.uint8).reshape(ih, iw)
    if interlaced:
        # GIF87a 4-pass interlace: stored row order is passes
        # (y0=0,step8),(4,8),(2,4),(1,2) — invert by strided scatter
        out = np.empty_like(rows)
        src = 0
        for y0, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
            n = len(range(y0, ih, step))
            out[y0::step] = rows[src : src + n]
            src += n
        rows = out
    return rows, palette


def decode_gif_rgb(data: bytes) -> np.ndarray:
    """GIF87a bytes → RGB (h,w,3) uint8 via the embedded palette."""
    idx, pal = decode_gif(data)
    return pal[idx]
