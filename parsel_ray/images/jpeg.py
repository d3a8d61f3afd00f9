"""Baseline JPEG (ITU-T T.81 / JFIF) codec in pure numpy — round 2
replacement for the round-1 ``DecodeJpeg`` stub.

Scope (honestly bounded):

* **encode**: baseline sequential, 8-bit, YCbCr 4:4:4, one scan, the
  Annex K example quantization tables scaled by ``quality`` (libjpeg's
  scaling curve) and the Annex K "typical" Huffman tables.
* **decode**: baseline sequential (SOF0/1) with generic MCU interleaving
  — sampling factors 1–2 per axis (4:4:4, 4:2:2, 4:2:0), tables read
  from the stream (DQT/DHT), restart markers (DRI/RSTn) supported,
  EXIF/APPn segments skipped — AND progressive (SOF2, T.81 Annex G):
  spectral selection, successive approximation (DC+AC first/refine
  passes), EOB runs, interleaved DC + non-interleaved AC scans.
  Arithmetic coding, lossless/hierarchical SOFs and 12-bit precision
  raise ``ValueError``.
* **encode**: additionally ``encode_jpeg_progressive`` writes a SOF2
  scan script (DC/AC first at Al=1 + refinement to Al=0) that decodes
  bit-identically to the baseline encoding of the same pixels.

The DCT is vectorized (one einsum over all blocks); the entropy coder is
a per-symbol Python loop — images in this engine's pipelines are small
crawl assets, and the kernel runs inside ``map_batches`` actor pools.
"""

from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# -- constants -------------------------------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

LUM_Q = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float64)

CHROM_Q = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.float64)

# Annex K "typical" Huffman tables: (bits[1..16], values)
DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal 8-point DCT-II matrix
_D = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    _D[_u] = _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16.0)
# T.81's DCT has an extra factor vs the orthonormal transform: using the
# orthonormal matrix for both directions round-trips exactly, and matches
# the standard up to the 1/4 scaling folded into the basis normalization.


_QTAB_CACHE: dict = {}


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K example tables (cached per
    quality — rebuilt tables dominated per-call cost on tiny images;
    callers treat the arrays as read-only)."""
    quality = min(100, max(1, int(quality)))
    hit = _QTAB_CACHE.get(quality)
    if hit is None:
        scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
        lq = np.clip(np.floor((LUM_Q * scale + 50.0) / 100.0), 1, 255)
        cq = np.clip(np.floor((CHROM_Q * scale + 50.0) / 100.0), 1, 255)
        _QTAB_CACHE[quality] = hit = (lq, cq)
    return hit


def _build_codes(bits: list, values: list) -> dict:
    """symbol → (code, length) canonical Huffman assignment (T.81 C.2)."""
    out: dict = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


# the four standard T.81 Annex K Huffman tables are constants: build the
# symbol->(code,length) dicts ONCE at import (they were rebuilt per
# encode call, which dominated per-call cost on small images)
_STD_CODES = (
    _build_codes(*DC_LUM),
    _build_codes(*DC_CHROM),
    _build_codes(*AC_LUM),
    _build_codes(*AC_CHROM),
)


class _BitWriter:
    """Entropy bit packer.  Bits gather in a small-int accumulator and
    spill 8 bytes at a time; 0xFF byte stuffing happens ONCE at flush
    via ``bytes.replace`` (a single C pass) instead of a per-byte check
    — the writer only ever carries entropy bytes, so every 0xFF in the
    buffer needs a stuffed 0x00."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        n = self.nbits + length
        if n >= 64:
            drop = n & 7
            whole = (n - drop) >> 3
            self.buf += (self.acc >> drop).to_bytes(whole, "big")
            self.acc &= (1 << drop) - 1
            n = drop
        self.nbits = n

    def flush(self) -> bytes:
        if self.nbits:
            pad = (8 - self.nbits) & 7
            self.acc = (self.acc << pad) | ((1 << pad) - 1)
            self.nbits += pad
            self.buf += self.acc.to_bytes(self.nbits >> 3, "big")
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf).replace(b"\xff", b"\xff\x00")


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw-bits) for a DC diff / AC coefficient (T.81 F.1.2)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = int(a).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    p = px.astype(np.float64)
    y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
    cb = -0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2] + 128.0
    cr = 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2] + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """(H, W) → (n_blocks, 8, 8), edge-padded to multiples of 8."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        padded.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )


_NP_HUFF = None


def _np_huff_tables():
    """The four standard Huffman tables as numpy LUTs (code, length)
    indexed by symbol — built once; the vectorized scan encoder gathers
    codes for ALL tokens with two fancy-index reads per token class."""
    global _NP_HUFF
    if _NP_HUFF is None:
        dc_code = np.zeros((2, 17), np.int64)
        dc_len = np.zeros((2, 17), np.int64)
        ac_code = np.zeros((2, 256), np.int64)
        ac_len = np.zeros((2, 256), np.int64)
        for ti, tab in enumerate(_STD_CODES[:2]):
            for sym, (c, ln) in tab.items():
                dc_code[ti, sym] = c
                dc_len[ti, sym] = ln
        for ti, tab in enumerate(_STD_CODES[2:]):
            for sym, (c, ln) in tab.items():
                ac_code[ti, sym] = c
                ac_len[ti, sym] = ln
        _NP_HUFF = (dc_code, dc_len, ac_code, ac_len)
    return _NP_HUFF


def _encode_scan_loop(zz: "list[np.ndarray]") -> bytes:
    """Reference scalar entropy coder (the pre-round-5 per-block loop):
    kept verbatim as the differential pin for :func:`_encode_scan_vec`
    — tests assert byte equality on adversarial coefficient blocks."""
    dc_l, dc_c, ac_l, ac_c = _STD_CODES
    bw = _BitWriter()
    pred = [0, 0, 0]
    n_blocks = zz[0].shape[0]
    write = bw.write
    for bi in range(n_blocks):
        for ci in range(3):
            dc_tab = dc_l if ci == 0 else dc_c
            ac_tab = ac_l if ci == 0 else ac_c
            blk = zz[ci][bi]
            dc = int(blk[0])
            diff = dc - pred[ci]
            pred[ci] = dc
            if diff:
                size = abs(diff).bit_length()
                bits = diff if diff > 0 else diff + (1 << size) - 1
                code, ln = dc_tab[size]
                write((code << size) | bits, ln + size)
            else:
                code, ln = dc_tab[0]
                write(code, ln)
            nz = np.flatnonzero(blk[1:])
            prev = 0
            for k in nz.tolist():
                k += 1
                run = k - prev - 1
                prev = k
                while run > 15:
                    code, ln = ac_tab[0xF0]  # ZRL
                    write(code, ln)
                    run -= 16
                v = int(blk[k])
                size = abs(v).bit_length()
                bits = v if v > 0 else v + (1 << size) - 1
                code, ln = ac_tab[(run << 4) | size]
                write((code << size) | bits, ln + size)
            if prev < 63:
                code, ln = ac_tab[0x00]  # EOB
                write(code, ln)
    return bw.flush()


def _encode_scan_vec(zz: "list[np.ndarray]") -> bytes:
    """Vectorized baseline-JPEG entropy coder (round 5): token streams
    for ALL blocks/components materialize as flat numpy arrays (DC
    diffs per component, AC nonzeros with run lengths, ZRL expansions,
    EOBs), a stable argsort on a (row, intra-row) key interleaves them
    into T.81 scan order, and bit packing runs as ≤27 whole-array
    passes into a 0/1 array + ``np.packbits``.  Byte-identical to
    :func:`_encode_scan_loop` (differential-pinned in tests): same
    codes, same order, same 1-padding, same 0xFF stuffing."""
    n_blocks = zz[0].shape[0]
    if n_blocks == 0:
        return b""
    dc_code, dc_len, ac_code, ac_len = _np_huff_tables()
    arr = np.stack(zz, axis=1).reshape(n_blocks * 3, 64).astype(np.int64)
    R = arr.shape[0]
    comp_tab = np.tile(np.array([0, 1, 1], np.int64), n_blocks)
    pow2 = (np.int64(1) << np.arange(33, dtype=np.int64))

    # -- DC tokens: per-component diff chain --------------------------
    dc = arr[:, 0].reshape(n_blocks, 3)
    diffs = dc.copy()
    diffs[1:] -= dc[:-1]
    diffs = diffs.reshape(R)
    dsize = np.searchsorted(pow2, np.abs(diffs), side="right")
    dbits = np.where(diffs > 0, diffs, diffs + pow2[dsize] - 1)
    v_dc = (dc_code[comp_tab, dsize] << dsize) | dbits
    l_dc = dc_len[comp_tab, dsize] + dsize
    k_dc = np.arange(R, dtype=np.int64) << np.int64(20)

    # -- AC tokens: nonzeros with runs --------------------------------
    body = arr[:, 1:]
    rows, cols = np.nonzero(body)
    n_ac = len(rows)
    if n_ac:
        k = cols + 1
        v = body[rows, cols]
        prevk = np.empty_like(k)
        prevk[0] = 0
        prevk[1:] = np.where(rows[1:] == rows[:-1], k[:-1], 0)
        runs = k - prevk - 1
        size = np.searchsorted(pow2, np.abs(v), side="right")
        bits = np.where(v > 0, v, v + pow2[size] - 1)
        nzrl = runs >> 4
        sym = ((runs & 15) << 4) | size
        ct = comp_tab[rows]
        v_ac = (ac_code[ct, sym] << size) | bits
        l_ac = ac_len[ct, sym] + size
        # intra-row entry index
        idx_all = np.arange(n_ac, dtype=np.int64)
        first = np.ones(n_ac, bool)
        first[1:] = rows[1:] != rows[:-1]
        row_start = np.maximum.accumulate(np.where(first, idx_all, 0))
        i = idx_all - row_start
        k_ac = (rows.astype(np.int64) << np.int64(20)) + (i + 1) * 32 + 31
        # ZRL expansions precede their AC token
        zidx = np.flatnonzero(nzrl > 0)
        nz_rep = nzrl[zidx]
        z_rows = np.repeat(rows[zidx], nz_rep)
        z_base = np.repeat(k_ac[zidx] - 31, nz_rep)
        cum = np.concatenate([[0], np.cumsum(nz_rep)])
        z_off = np.arange(int(cum[-1]), dtype=np.int64) - np.repeat(
            cum[:-1], nz_rep
        )
        v_z = ac_code[comp_tab[z_rows], 0xF0]
        l_z = ac_len[comp_tab[z_rows], 0xF0]
        k_z = z_base + z_off
        # last nonzero position per row → EOB where < 63
        lastk = np.zeros(R, np.int64)
        last_mask = np.concatenate([rows[1:] != rows[:-1], [True]])
        lastk[rows[last_mask]] = k[last_mask]
    else:
        v_ac = l_ac = k_ac = v_z = l_z = k_z = np.empty(0, np.int64)
        lastk = np.zeros(R, np.int64)
    eob_rows = np.flatnonzero(lastk < 63)
    v_e = ac_code[comp_tab[eob_rows], 0x00]
    l_e = ac_len[comp_tab[eob_rows], 0x00]
    k_e = (eob_rows.astype(np.int64) << np.int64(20)) + (1 << 19)

    vals = np.concatenate([v_dc, v_ac, v_z, v_e])
    lens = np.concatenate([l_dc, l_ac, l_z, l_e])
    keys = np.concatenate([k_dc, k_ac, k_z, k_e])
    order = np.argsort(keys, kind="stable")
    vals = vals[order].astype(np.uint64)
    lens = lens[order]

    # -- bit packing: one pass per bit position ------------------------
    offs = np.cumsum(lens) - lens
    total = int(offs[-1] + lens[-1])
    pad = (-total) % 8
    bits_arr = np.zeros(total + pad, np.uint8)
    for b in range(int(lens.max())):
        m = lens > b
        sh = (lens[m] - 1 - b).astype(np.uint64)
        bits_arr[offs[m] + b] = ((vals[m] >> sh) & np.uint64(1)).astype(
            np.uint8
        )
    if pad:
        bits_arr[total:] = 1  # T.81 1-padding to the byte boundary
    return np.packbits(bits_arr).tobytes().replace(b"\xff", b"\xff\x00")


def encode_jpeg(px: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, one scan)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_jpeg expects (H, W, 3) RGB")
    lq, cq = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px) - 128.0

    # vectorized DCT + quantization per component
    comp_qcoef = []
    for ci in range(3):
        blocks = _blocks_of(ycc[..., ci])
        coef = np.einsum("ux,nxy,vy->nuv", _D, blocks, _D)
        q = lq if ci == 0 else cq
        comp_qcoef.append(np.round(coef / q).astype(np.int64))

    zz = [qc.reshape(-1, 64)[:, ZIGZAG] for qc in comp_qcoef]
    # Two byte-identical entropy coders (differential-pinned): the
    # whole-array vectorized path wins 1.6-2.2x on dense/large
    # coefficient streams (measured from ~64 blocks of noise up to
    # 256x256), while its fixed array-setup cost loses to the lean
    # scalar loop on small sparse streams (smooth thumbnails).  Route
    # by nonzero count — the token-volume proxy.
    nnz = sum(int(np.count_nonzero(z)) for z in zz)
    scan = _encode_scan_vec(zz) if nnz >= 768 else _encode_scan_loop(zz)

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tbl in ((0, lq), (1, cq)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG])
    out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (hv, tq) in enumerate(((0x11, 0), (0x11, 1), (0x11, 1)), start=1):
        out += struct.pack(">BBB", cid, hv, tq)
    for tclass, tid, (bits, values) in (
        (0, 0, DC_LUM), (0, 1, DC_CHROM), (1, 0, AC_LUM), (1, 1, AC_CHROM)
    ):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values),
                                         (tclass << 4) | tid)
        out += bytes(bits) + bytes(values)
    out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += struct.pack(">BB", cid, tabs)
    out += b"\x00\x3F\x00"  # Ss=0 Se=63 AhAl=0
    out += scan
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# -- decoder ---------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader.  The constructor walks the scan
    ONCE: byte-stuffing (0xFF00 → 0xFF) is removed and the data split
    into restart-interval segments, so the hot loop is plain small-int
    shifts with no per-byte stuffing checks (the old byte-at-a-time
    reader also let its accumulator grow into an unbounded big-int —
    per-image decode time was dominated by 140k+ ``read_bit`` calls).

    Semantics preserved from the byte-at-a-time reader: consuming past
    a segment whose boundary is an RSTn raises :class:`_RestartMarker`;
    bits past the scan's terminal marker pad with 1-bits (T.81
    F.2.2.5); ``sync_restart`` discards partial bits and crosses one
    RSTn.  New: a stream that ends with no terminal marker raises
    ValueError (truncation used to escape as IndexError)."""

    __slots__ = ("segs", "marks", "seg_i", "buf", "blen", "bpos",
                 "acc", "nbits", "pad", "pos")

    def __init__(self, data: bytes, pos: int) -> None:
        segs: list[bytes] = []
        marks: list = []  # per segment: RSTn byte | "term" | "eof"
        parts: list[bytes] = []
        i = pos
        n = len(data)
        term = n
        while True:
            j = data.find(b"\xff", i)
            if j < 0 or j + 1 >= n:  # ran off the end: truncated scan
                parts.append(data[i:(n if j < 0 else j)])
                segs.append(b"".join(parts))
                marks.append("eof")
                break
            nxt = data[j + 1]
            if nxt == 0x00:  # stuffed: keep the 0xFF, drop the 0x00
                parts.append(data[i:j + 1])
                i = j + 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: segment boundary
                parts.append(data[i:j])
                segs.append(b"".join(parts))
                marks.append(nxt)
                parts = []
                i = j + 2
            else:  # real marker: end of scan
                parts.append(data[i:j])
                segs.append(b"".join(parts))
                marks.append("term")
                term = j
                break
        self.segs = segs
        self.marks = marks
        self.seg_i = 0
        self.buf = segs[0]
        self.blen = len(self.buf)
        self.bpos = 0
        self.acc = 0
        self.nbits = 0
        self.pad = 0  # trailing padding bits currently in acc
        # original-data offset of the scan's terminal marker; callers
        # scanning forward from here find the same marker the old
        # reader's pos-based scan did
        self.pos = term

    def _ensure(self, need: int) -> None:
        while self.nbits < need:
            avail = self.blen - self.bpos
            if avail:
                take = avail if avail < 8 else 8
                self.acc = (
                    (self.acc & ((1 << self.nbits) - 1)) << (8 * take)
                ) | int.from_bytes(self.buf[self.bpos:self.bpos + take],
                                   "big")
                self.nbits += 8 * take
                self.bpos += take
            else:
                mark = self.marks[self.seg_i]
                if mark == "eof":
                    raise ValueError(
                        "corrupt JPEG: truncated entropy stream"
                    )
                # pad with 1-bits; _consume guards RST segments so the
                # padding is peek-only there
                self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | 0xFF
                self.nbits += 8
                self.pad += 8

    def _consume(self, n: int) -> None:
        if n > self.nbits - self.pad:
            mark = self.marks[self.seg_i]
            if mark != "term":
                raise _RestartMarker(mark)
            self.nbits -= n
            if self.pad > self.nbits:
                self.pad = self.nbits
            return
        self.nbits -= n

    def read_bit(self) -> int:
        self._ensure(1)
        self._consume(1)
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        self._ensure(n)
        self._consume(n)
        return (self.acc >> self.nbits) & ((1 << n) - 1)

    def sync_restart(self) -> None:
        """Discard partial bits and cross one RSTn segment boundary."""
        mark = self.marks[self.seg_i]
        if mark in ("term", "eof"):
            raise ValueError("corrupt JPEG: missing restart marker")
        self.seg_i += 1
        self.buf = self.segs[self.seg_i]
        self.blen = len(self.buf)
        self.bpos = 0
        self.acc = 0
        self.nbits = 0
        self.pad = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


@lru_cache(maxsize=64)
def _build_lut(bits: tuple, values: tuple) -> list:
    """16-bit-peek Huffman LUT: entry = (code_length << 8) | value, 0 =
    invalid prefix.  Canonical code assignment per T.81 C.2; built with
    numpy slice fills (≤ 256 of them), returned as a plain list so the
    per-symbol lookup is one list index."""
    lut = np.zeros(1 << 16, np.int32)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            lo = code << (16 - length)
            hi = (code + 1) << (16 - length)
            if hi > (1 << 16):
                raise ValueError("corrupt JPEG: overfull Huffman table")
            lut[lo:hi] = (length << 8) | values[k]
            k += 1
            code += 1
        code <<= 1
    return lut.tolist()


class _HuffTable:
    """Canonical Huffman decode via a 16-bit-peek lookup table."""

    __slots__ = ("lut",)

    def __init__(self, bits: list, values: list) -> None:
        if sum(bits) != len(values):
            raise ValueError("corrupt JPEG: Huffman table count mismatch")
        self.lut = _build_lut(tuple(bits), tuple(values))

    def decode(self, br: _BitReader) -> int:
        br._ensure(16)
        entry = self.lut[(br.acc >> (br.nbits - 16)) & 0xFFFF]
        if entry == 0:
            raise ValueError("corrupt JPEG: invalid Huffman code")
        br._consume(entry >> 8)
        return entry & 0xFF


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes → (H, W, 3) uint8 RGB.  Baseline sequential (SOF0/1)
    and progressive (SOF2, spectral selection + successive
    approximation, T.81 Annex G) streams."""
    data = bytes(data)
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    prog_coefs = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                tbl = np.frombuffer(seg[p + 1:p + 65], dtype=np.uint8)
                qtables[tq] = tbl.astype(np.float64)[UNZIGZAG].reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                values = list(seg[p + 17:p + 17 + n])
                htables[(tc, th)] = _HuffTable(bits, values)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps,
                     "progressive": marker == 0xC2}
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline and progressive JPEG are supported (got "
                f"SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = seg[0]
            scomps = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                ci, comp = next(
                    (j, c) for j, c in enumerate(frame["comps"])
                    if c["id"] == cs
                )
                scomps.append(
                    {**comp, "ci": ci, "dc": tabs >> 4, "ac": tabs & 0x0F}
                )
            if not frame["progressive"]:
                return _decode_scan(
                    data, pos + seglen, frame, scomps, qtables, htables,
                    restart_interval,
                )
            if prog_coefs is None:
                prog_coefs = _prog_init(frame)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            pos = _decode_prog_scan(
                data, pos + seglen, frame, scomps, ss, se,
                ahal >> 4, ahal & 0x0F, htables, restart_interval,
                prog_coefs,
            )
            continue
        # APPn / COM / others: skip
        pos += seglen
    if prog_coefs is not None:
        return _prog_reconstruct(frame, prog_coefs, qtables)
    raise ValueError("corrupt JPEG: no scan data")


def _decode_scan(data, pos, frame, comps, qtables, htables,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    br.sync_restart()
                    pred = [0] * len(comps)
                mcu_count += 1
                for ci, c in enumerate(comps):
                    dc_tab = htables[(0, c["dc"])]
                    ac_tab = htables[(1, c["ac"])]
                    q = qtables[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = _decode_block(br, dc_tab, ac_tab, pred, ci)
                            coef = blk[UNZIGZAG].reshape(8, 8) * q
                            pix = _D.T @ coef @ _D
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0:y0 + 8, x0:x0 + 8] = pix
    except _RestartMarker as rst:
        # an RSTn at anything but an exact restart-interval boundary is a
        # corrupt/truncated stream — surface it as the documented error
        # type instead of leaking the internal control-flow exception
        raise ValueError(
            "corrupt JPEG: unexpected restart marker "
            f"0xFF{rst.marker:02X} mid-entropy-decode (MCU {mcu_count})"
        ) from None
    # upsample to full resolution, crop, color-convert
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


def _decode_block(br, dc_tab, ac_tab, pred, ci) -> np.ndarray:
    blk = np.zeros(64, dtype=np.float64)
    size = dc_tab.decode(br)
    diff = _extend(br.read_bits(size), size) if size else 0
    pred[ci] += diff
    blk[0] = pred[ci]
    k = 1
    while k < 64:
        rs = ac_tab.decode(br)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("corrupt JPEG: coefficient index overflow")
        blk[k] = _extend(br.read_bits(size), size)
        k += 1
    return blk


# -- progressive (SOF2, T.81 Annex G) ---------------------------------------


def _frame_geometry(frame):
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    return hmax, vmax, mcux, mcuy


def _prog_init(frame):
    """Per-component zigzag coefficient planes, padded to the MCU grid."""
    hmax, vmax, mcux, mcuy = _frame_geometry(frame)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors above 2 not supported")
    return [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
        for c in frame["comps"]
    ]


def _ni_blocks(frame, c):
    """Non-interleaved scan grid for one component (T.81 A.2.2):
    ceil(component samples / 8) in each direction."""
    hmax, vmax, _, _ = _frame_geometry(frame)
    cw = -(-frame["w"] * c["h"] // hmax)
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_prog_scan(data, pos, frame, scomps, ss, se, ah, al,
                      htables, restart_interval, coefs) -> int:
    """Decode one progressive scan into ``coefs`` (in place); returns
    the stream position of the next marker."""
    br = _BitReader(data, pos)
    state = {"eobrun": 0}
    pred = [0] * len(scomps)
    for sc in scomps:
        sc["__dc_tab"] = htables.get((0, sc["dc"]))
        sc["__ac_tab"] = htables.get((1, sc["ac"]))
    try:
        if ss == 0:
            if se != 0:
                raise ValueError("corrupt JPEG: DC scan with Se != 0")
            _prog_dc_scan(br, frame, scomps, ah, al, restart_interval,
                          coefs, pred)
        else:
            if len(scomps) != 1:
                raise ValueError(
                    "corrupt JPEG: progressive AC scan must be "
                    "non-interleaved"
                )
            _prog_ac_scan(br, frame, scomps[0], ss, se, ah, al,
                          restart_interval, coefs, state)
    except _RestartMarker as rst:
        raise ValueError(
            "corrupt JPEG: unexpected restart marker "
            f"0xFF{rst.marker:02X} in progressive scan"
        ) from None
    except IndexError:
        raise ValueError(
            "corrupt JPEG: truncated progressive scan"
        ) from None
    # skip remaining entropy bytes to the next marker (RSTn and stuffed
    # 0xFF00 belong to the scan)
    p = br.pos
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00 and not (
                0xD0 <= data[p + 1] <= 0xD7):
            return p
        p += 1
    return n


def _prog_dc_scan(br, frame, scomps, ah, al, ri, coefs, pred):
    count = 0
    if len(scomps) > 1:  # interleaved MCU order
        _, _, mcux, mcuy = _frame_geometry(frame)
        for my in range(mcuy):
            for mx in range(mcux):
                if ri and count and count % ri == 0:
                    br.sync_restart()
                    pred[:] = [0] * len(pred)
                count += 1
                for si, c in enumerate(scomps):
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            _prog_dc_block(
                                br, _htable_dc(c, ah), coefs[c["ci"]],
                                my * c["v"] + by, mx * c["h"] + bx,
                                ah, al, pred, si,
                            )
    else:
        c = scomps[0]
        bh, bw = _ni_blocks(frame, c)
        for by in range(bh):
            for bx in range(bw):
                if ri and count and count % ri == 0:
                    br.sync_restart()
                    pred[0] = 0
                count += 1
                _prog_dc_block(
                    br, _htable_dc(c, ah), coefs[c["ci"]], by, bx,
                    ah, al, pred, 0,
                )


def _htable_dc(c, ah):
    # refinement scans read raw bits only — no table needed
    if ah:
        return None
    if c["__dc_tab"] is None:
        raise ValueError("corrupt JPEG: DC scan without DC table")
    return c["__dc_tab"]


def _prog_dc_block(br, dc_tab, carr, by, bx, ah, al, pred, si):
    if ah == 0:  # first pass: baseline DC diff, shifted by Al
        size = dc_tab.decode(br)
        diff = _extend(br.read_bits(size), size) if size else 0
        pred[si] += diff
        carr[by, bx, 0] = pred[si] << al
    else:  # refinement: one bit per block
        if br.read_bit():
            carr[by, bx, 0] |= 1 << al


def _prog_ac_scan(br, frame, c, ss, se, ah, al, ri, coefs, state):
    ac_tab = c["__ac_tab"]
    carr = coefs[c["ci"]]
    bh, bw = _ni_blocks(frame, c)
    count = 0
    for by in range(bh):
        for bx in range(bw):
            if ri and count and count % ri == 0:
                br.sync_restart()
                state["eobrun"] = 0
            count += 1
            blk = carr[by, bx]
            if ah == 0:
                _prog_ac_first(br, ac_tab, blk, ss, se, al, state)
            else:
                _prog_ac_refine(br, ac_tab, blk, ss, se, al, state)


def _prog_ac_first(br, ac_tab, blk, ss, se, al, state):
    if state["eobrun"] > 0:
        state["eobrun"] -= 1
        return
    k = ss
    while k <= se:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("corrupt JPEG: AC index overflow")
            blk[k] = _extend(br.read_bits(s), s) << al
            k += 1
        else:
            if r == 15:  # ZRL
                k += 16
                continue
            state["eobrun"] = (1 << r) - 1
            if r:
                state["eobrun"] += br.read_bits(r)
            break


def _prog_ac_refine(br, ac_tab, blk, ss, se, al, state):
    """T.81 G.2 / libjpeg decode_mcu_AC_refine: place newly-significant
    ±1<<Al coefficients and append a correction bit to every already-
    nonzero coefficient the scan passes over."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if state["eobrun"] == 0:
        while k <= se:
            rs = ac_tab.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    state["eobrun"] = 1 << r
                    if r:
                        state["eobrun"] += br.read_bits(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError(
                        "corrupt JPEG: AC refinement size != 1"
                    )
                s = p1 if br.read_bit() else m1
            while k <= se:
                coef = int(blk[k])
                if coef != 0:
                    if br.read_bit() and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else m1)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s and k <= se:
                blk[k] = s
            k += 1
    if state["eobrun"] > 0:
        while k <= se:
            coef = int(blk[k])
            if coef != 0 and br.read_bit() and (coef & p1) == 0:
                blk[k] = coef + (p1 if coef >= 0 else m1)
            k += 1
        state["eobrun"] -= 1


def _prog_reconstruct(frame, coefs, qtables):
    """Dequantize + IDCT every component plane (vectorized einsum over
    all blocks at once), then upsample/crop/color-convert like the
    baseline path."""
    h, w = frame["h"], frame["w"]
    hmax, vmax, _, _ = _frame_geometry(frame)
    full = []
    for ci, c in enumerate(frame["comps"]):
        arr = coefs[ci].astype(np.float64)
        by, bx = arr.shape[:2]
        q = qtables[c["tq"]]
        blk = arr[:, :, UNZIGZAG].reshape(by, bx, 8, 8) * q
        pix = np.einsum("ka,yxkl,lb->yxab", _D, blk, _D)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    return _ycbcr_to_rgb(np.stack(full, axis=-1))


# -- progressive encoder -----------------------------------------------------


def _emit_dc_first(bw, tab, dcs, preds, si, al):
    v = int(dcs) >> al  # arithmetic shift (T.81 point transform)
    diff = v - preds[si]
    preds[si] = v
    size, bits = _magnitude(diff)
    code, ln = tab[size]
    bw.write(code, ln)
    if size:
        bw.write(bits, size)


def _emit_ac_first(bw, tab, blk, ss, se, al):
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        av = abs(v) >> al
        if av == 0:
            r += 1
            continue
        while r > 15:
            code, ln = tab[0xF0]
            bw.write(code, ln)
            r -= 16
        sv = av if v > 0 else -av
        size, bits = _magnitude(sv)
        code, ln = tab[(r << 4) | size]
        bw.write(code, ln)
        bw.write(bits, size)
        r = 0
    if r:
        code, ln = tab[0x00]  # EOB (EOBRUN = 1)
        bw.write(code, ln)


def _emit_ac_refine(bw, tab, blk, ss, se, al):
    """Mirror of the G.1.2.3 refinement decoder (libjpeg
    encode_mcu_AC_refine structure): correction bits for
    already-significant coefficients buffer until the next emitted
    symbol; EOB runs are flushed per block (EOBRUN = 1 → symbol 0x00),
    which every conforming decoder accepts."""
    ah = al + 1
    eobk = ss - 1
    for k in range(ss, se + 1):
        if (abs(int(blk[k])) >> al) == 1:
            eobk = k
    r = 0
    pend: list = []
    for k in range(ss, se + 1):
        v = int(blk[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= eobk:
            code, ln = tab[0xF0]
            bw.write(code, ln)
            r -= 16
            for b in pend:
                bw.write(b, 1)
            pend = []
        if (abs(v) >> ah) != 0:  # history-significant: correction bit
            pend.append(t & 1)
            continue
        code, ln = tab[(r << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if v > 0 else 0, 1)
        for b in pend:
            bw.write(b, 1)
        pend = []
        r = 0
    if r > 0 or pend:
        code, ln = tab[0x00]
        bw.write(code, ln)
        for b in pend:
            bw.write(b, 1)


def encode_jpeg_progressive(px: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → progressive JFIF bytes (SOF2, 4:4:4): an
    interleaved DC-first scan at Al=1, per-component spectral-band AC
    scans at Al=1, then DC and AC refinement scans to Al=0 — the
    web-typical spectral-selection + successive-approximation script.
    Decodes to the same pixels as ``encode_jpeg`` at the same quality
    (identical quantized coefficients, different scan order)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    h, w, c = px.shape
    if c != 3:
        raise ValueError("encode_jpeg_progressive expects (H, W, 3) RGB")
    lq, cq = _quality_tables(quality)
    ycc = _rgb_to_ycbcr(px) - 128.0
    zz = []
    for ci in range(3):
        blocks = _blocks_of(ycc[..., ci])
        coef = np.einsum("ux,nxy,vy->nuv", _D, blocks, _D)
        q = lq if ci == 0 else cq
        zz.append(
            np.round(coef / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]
        )
    n_blocks = zz[0].shape[0]

    dc_tabs = [_STD_CODES[0], _STD_CODES[1], _STD_CODES[1]]
    ac_tabs = [_STD_CODES[2], _STD_CODES[3], _STD_CODES[3]]

    out = bytearray()
    out += b"\xFF\xD8"
    out += b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + \
        struct.pack(">HHBB", 1, 1, 0, 0)
    for tid, tbl in ((0, lq), (1, cq)):
        out += b"\xFF\xDB" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG])
    out += b"\xFF\xC2" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, (hv, tq) in enumerate(((0x11, 0), (0x11, 1), (0x11, 1)),
                                   start=1):
        out += struct.pack(">BBB", cid, hv, tq)
    for tclass, tid, (bits, values) in (
        (0, 0, DC_LUM), (0, 1, DC_CHROM), (1, 0, AC_LUM), (1, 1, AC_CHROM)
    ):
        out += b"\xFF\xC4" + struct.pack(">HB", 19 + len(values),
                                         (tclass << 4) | tid)
        out += bytes(bits) + bytes(values)

    def sos(comps, ss, se, ah, al, body):
        hdr = b"\xFF\xDA" + struct.pack(">HB", 6 + 2 * len(comps),
                                        len(comps))
        for cid, tabs in comps:
            hdr += struct.pack(">BB", cid, tabs)
        hdr += struct.pack(">BBB", ss, se, (ah << 4) | al)
        return hdr + body

    # scan 1: interleaved DC first, Al=1
    bw = _BitWriter()
    preds = [0, 0, 0]
    for bi in range(n_blocks):
        for ci in range(3):
            _emit_dc_first(bw, dc_tabs[ci], zz[ci][bi, 0], preds, ci, 1)
    out += sos([(1, 0x00), (2, 0x10), (3, 0x10)], 0, 0, 0, 1, bw.flush())

    # per-component AC-first scans, Al=1 (Y split into two bands)
    bands = [(0, 1, 5), (0, 6, 63), (1, 1, 63), (2, 1, 63)]
    for ci, bs, be in bands:
        bw = _BitWriter()
        for bi in range(n_blocks):
            _emit_ac_first(bw, ac_tabs[ci], zz[ci][bi], bs, be, 1)
        out += sos([(ci + 1, 0x00 if ci == 0 else 0x01)], bs, be, 0, 1,
                   bw.flush())

    # DC refinement to Al=0 (interleaved, raw bits)
    bw = _BitWriter()
    for bi in range(n_blocks):
        for ci in range(3):
            bw.write(int(zz[ci][bi, 0]) & 1, 1)
    out += sos([(1, 0x00), (2, 0x00), (3, 0x00)], 0, 0, 1, 0, bw.flush())

    # per-component AC refinement scans to Al=0
    for ci, bs, be in bands:
        bw = _BitWriter()
        for bi in range(n_blocks):
            _emit_ac_refine(bw, ac_tabs[ci], zz[ci][bi], bs, be, 0)
        out += sos([(ci + 1, 0x00 if ci == 0 else 0x01)], bs, be, 1, 0,
                   bw.flush())

    out += b"\xFF\xD9"
    return bytes(out)
