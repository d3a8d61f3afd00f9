"""Multimodal column stages: image/audio/video cells as opaque ``binary``
columns with typed metadata, processed by ``map_batches`` kernels.

Real, tested paths (pure numpy/zlib codecs from :mod:`parsel_ray.images`):
decode, resize (block mean), thumbnail features, mean color, phash.

Round 2 removed the round-1 stubs: JPEG decode is a real pure-numpy
baseline T.81 codec (:mod:`parsel_ray.images.jpeg`), audio features
parse RIFF/WAVE PCM16 headers, and video frame sampling parses the NV1
container (:mod:`parsel_ray.images.video`) with selective frame decode.
Real MP4/FLAC demuxers remain out of scope (no codec libraries in this
environment) — swapping one in replaces only the container-parse calls.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..images.codecs import decode_image, encode_image, phash64


def _block_mean_resize(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic box resize via uneven block means (no scipy/PIL)."""
    h, w, c = px.shape
    ys = (np.arange(out_h + 1) * h) // out_h
    xs = (np.arange(out_w + 1) * w) // out_w
    out = np.empty((out_h, out_w, c), dtype=np.float64)
    for i in range(out_h):
        for j in range(out_w):
            out[i, j] = px[ys[i] : max(ys[i] + 1, ys[i + 1]),
                           xs[j] : max(xs[j] + 1, xs[j + 1])].mean(axis=(0, 1))
    return out


class DecodeImageStats:
    """bytes+fmt → decoded stats: true w/h, mean RGB, recomputed phash,
    8×8 grayscale thumbnail (list<float>).  Stateless kernel; pass the
    class to map_batches for an actor pool or an instance for tasks."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 thumb: int = 8) -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.thumb = thumb

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, means, phashes, thumbs, oks = [], [], [], [], [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except Exception:  # corrupt payloads raise zlib/struct errors too
                oks.append(False)
                ws.append(None); hs.append(None); means.append(None)
                phashes.append(None); thumbs.append(None)
                continue
            oks.append(True)
            hs.append(px.shape[0]); ws.append(px.shape[1])
            means.append([float(x) for x in px.mean(axis=(0, 1))])
            phashes.append(phash64(px))
            gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            tm = _block_mean_resize(gray[..., None], self.thumb, self.thumb)
            thumbs.append([float(x) for x in tm.reshape(-1)])
        return (
            t.append_column("decoded_w", pa.array(ws, pa.int32()))
            .append_column("decoded_h", pa.array(hs, pa.int32()))
            .append_column("mean_rgb", pa.array(means, pa.list_(pa.float64())))
            .append_column("phash_recomputed", pa.array(phashes, pa.int64()))
            .append_column("thumb", pa.array(thumbs, pa.list_(pa.float64())))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


class ResizeImage:
    """Re-encode every image at ``out_h``×``out_w``.  ``method``:
    "block_mean" (box-filter downsample, the default) or "bilinear"
    (half-pixel-center resample, up or down).  Output replaces
    bytes/w/h; fmt preserved."""

    def __init__(self, out_h: int, out_w: int, bytes_col: str = "bytes",
                 fmt_col: str = "fmt", method: str = "block_mean") -> None:
        if method not in ("block_mean", "bilinear"):
            raise ValueError(f"unknown resize method {method!r}")
        self.out_h = out_h
        self.out_w = out_w
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.method = method

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.codecs import resize_bilinear

        out_bytes, ws, hs, oks = [], [], [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except Exception:  # one corrupt/null cell must not sink the
                # whole block (the decode-stage family contract)
                out_bytes.append(None)
                ws.append(None); hs.append(None); oks.append(False)
                continue
            if self.method == "bilinear":
                small = resize_bilinear(px, self.out_h, self.out_w)
            else:
                small = np.clip(
                    _block_mean_resize(px, self.out_h, self.out_w), 0, 255
                ).astype(np.uint8)
            out_bytes.append(encode_image(small, fmt))
            ws.append(self.out_w)
            hs.append(self.out_h)
            oks.append(True)
        idx_b = t.schema.get_field_index(self.bytes_col)
        t = t.set_column(idx_b, self.bytes_col, pa.array(out_bytes, pa.binary()))
        t = t.append_column("resize_ok", pa.array(oks, pa.bool_()))
        if "w" in t.column_names:
            t = t.set_column(t.schema.get_field_index("w"), "w",
                             pa.array(ws, pa.int32()))
        if "h" in t.column_names:
            t = t.set_column(t.schema.get_field_index("h"), "h",
                             pa.array(hs, pa.int32()))
        return t


class SniffImageMeta:
    """Header-only format + dimension sniff (``codecs.sniff_image_meta``):
    binary → (sniffed_fmt, sniffed_w, sniffed_h, sniff_ok) from magic
    bytes and fixed-offset header fields — no entropy decode, no inflate.
    At crawl scale this is the routing/filter stage that decides which
    blobs are worth a full decode; unknown or corrupt headers emit
    ``sniff_ok=False`` with nulls instead of failing the batch."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.codecs import sniff_image_meta

        fmts, ws, hs, oks = [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            meta = sniff_image_meta(data) if data is not None else None
            if meta is None:
                fmts.append(None); ws.append(None); hs.append(None)
                oks.append(False)
            else:
                fmts.append(meta[0]); ws.append(meta[1]); hs.append(meta[2])
                oks.append(True)
        return (
            t.append_column("sniffed_fmt", pa.array(fmts, pa.string()))
            .append_column("sniffed_w", pa.array(ws, pa.int32()))
            .append_column("sniffed_h", pa.array(hs, pa.int32()))
            .append_column("sniff_ok", pa.array(oks, pa.bool_()))
        )


class DecodeJpeg:
    """Baseline JPEG decode (pure-numpy codec, :mod:`parsel_ray.images.
    jpeg` — round 2: the round-1 stub replaced by a real T.81 baseline
    sequential decoder).  binary → decoded dims + raw RGB bytes +
    recomputed phash; corrupt/unsupported payloads set ``decode_ok`` =
    False rather than failing the batch."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.jpeg import decode_jpeg

        ws, hs, rgbs, phashes, oks = [], [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                px = decode_jpeg(data)
            except Exception:
                oks.append(False)
                ws.append(None); hs.append(None)
                rgbs.append(None); phashes.append(None)
                continue
            oks.append(True)
            hs.append(px.shape[0]); ws.append(px.shape[1])
            rgbs.append(px.tobytes())
            phashes.append(phash64(px))
        return (
            t.append_column("decoded_w", pa.array(ws, pa.int32()))
            .append_column("decoded_h", pa.array(hs, pa.int32()))
            .append_column("rgb", pa.array(rgbs, pa.binary()))
            .append_column("phash_recomputed", pa.array(phashes, pa.int64()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


class NormalizeOrientation:
    """EXIF-orientation-aware JPEG decode (``images/exif.py``): binary →
    display-oriented RGB bytes + oriented dims + the parsed tag value
    (1 when absent).  Every visual operator downstream (resize, phash,
    AR bucketing, training tensors) must see DISPLAY pixels — a camera
    tag of 5-8 swaps the axes, so ignoring it rotates thumbnails and
    splits near-dup clusters.  Corrupt payloads set ``decode_ok`` =
    False; corrupt EXIF inside a good JPEG degrades to orientation 1
    rather than failing the decode."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.exif import apply_exif_orientation, parse_exif_orientation
        from ..images.jpeg import decode_jpeg

        ws, hs, rgbs, orients, oks = [], [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                px = decode_jpeg(data)
            except Exception:
                oks.append(False)
                ws.append(None); hs.append(None)
                rgbs.append(None); orients.append(None)
                continue
            o = parse_exif_orientation(data) or 1
            px = apply_exif_orientation(px, o)
            oks.append(True)
            orients.append(o)
            hs.append(px.shape[0]); ws.append(px.shape[1])
            rgbs.append(px.tobytes())
        return (
            t.append_column("exif_orientation", pa.array(orients, pa.int32()))
            .append_column("oriented_w", pa.array(ws, pa.int32()))
            .append_column("oriented_h", pa.array(hs, pa.int32()))
            .append_column("rgb", pa.array(rgbs, pa.binary()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


class DecodePng:
    """Full PNG decode (pure numpy+zlib codec, :mod:`parsel_ray.images.
    codecs.decode_png`): all five scanline filters, gray / gray+alpha /
    palette / RGB / RGBA color types, CRC-checked.  binary → decoded
    dims + channel count + RGB-normalized phash; corrupt/unsupported
    payloads set ``decode_ok`` = False rather than failing the batch."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.codecs import decode_png, png_to_rgb

        ws, hs, cs, phashes, oks = [], [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                px = decode_png(data)
            except Exception:
                oks.append(False)
                ws.append(None); hs.append(None)
                cs.append(None); phashes.append(None)
                continue
            oks.append(True)
            hs.append(px.shape[0]); ws.append(px.shape[1])
            cs.append(px.shape[2])
            phashes.append(phash64(png_to_rgb(px)))
        return (
            t.append_column("decoded_w", pa.array(ws, pa.int32()))
            .append_column("decoded_h", pa.array(hs, pa.int32()))
            .append_column("channels", pa.array(cs, pa.int32()))
            .append_column("phash_recomputed", pa.array(phashes, pa.int64()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


class DecodeGif:
    """GIF87a decode (pure-Python LZW codec, :mod:`parsel_ray.images.
    gif`): palette-indexed frames → decoded dims, distinct palette
    entries actually used, RGB phash.  Corrupt/truncated payloads set
    ``decode_ok`` = False rather than failing the batch."""

    def __init__(self, bytes_col: str = "bytes") -> None:
        self.bytes_col = bytes_col

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.gif import decode_gif

        ws, hs, ncolors, phashes, oks = [], [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                idx, pal = decode_gif(data)
            except Exception:
                oks.append(False)
                ws.append(None); hs.append(None)
                ncolors.append(None); phashes.append(None)
                continue
            oks.append(True)
            hs.append(idx.shape[0]); ws.append(idx.shape[1])
            ncolors.append(int(np.unique(idx).size))
            phashes.append(phash64(pal[idx]))
        return (
            t.append_column("decoded_w", pa.array(ws, pa.int32()))
            .append_column("decoded_h", pa.array(hs, pa.int32()))
            .append_column("n_colors", pa.array(ncolors, pa.int32()))
            .append_column("phash_recomputed", pa.array(phashes, pa.int64()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


def sobel_edge_density(px: "np.ndarray") -> float:
    """Mean Sobel gradient magnitude over the grayscale image, normalized
    to [0, 1] (divide by the 4*255*sqrt(2) magnitude bound — each axis
    peaks at 4*255, the combined magnitude at that times sqrt(2)) — the
    standard cheap blur/blank detector for image-corpus quality
    filtering.  Vectorized: two shifted-difference convolutions, no
    Python pixel loop."""
    gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    if gray.shape[0] < 3 or gray.shape[1] < 3:
        return 0.0
    # Sobel via separable shifts on the interior
    gx = (
        (gray[:-2, 2:] + 2 * gray[1:-1, 2:] + gray[2:, 2:])
        - (gray[:-2, :-2] + 2 * gray[1:-1, :-2] + gray[2:, :-2])
    )
    gy = (
        (gray[2:, :-2] + 2 * gray[2:, 1:-1] + gray[2:, 2:])
        - (gray[:-2, :-2] + 2 * gray[:-2, 1:-1] + gray[:-2, 2:])
    )
    mag = np.sqrt(gx * gx + gy * gy)
    return float(mag.mean() / (4.0 * 255.0 * math.sqrt(2.0)))


class ImageQuality:
    """Per-image quality signals for corpus filtering: Sobel edge density
    (blur/blank detector) and grayscale std (contrast).  binary+fmt →
    ``edge_density`` (double, [0,1]), ``gray_std`` (double),
    ``quality_ok`` (decodable)."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt") -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, t: pa.Table) -> pa.Table:
        dens, stds, oks = [], [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except Exception:
                dens.append(None)
                stds.append(None)
                oks.append(False)
                continue
            oks.append(True)
            dens.append(sobel_edge_density(px))
            gray = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            stds.append(float(gray.std()))
        return (
            t.append_column("edge_density", pa.array(dens, pa.float64()))
            .append_column("gray_std", pa.array(stds, pa.float64()))
            .append_column("quality_ok", pa.array(oks, pa.bool_()))
        )


def _parse_wav_pcm16(data: bytes) -> "np.ndarray | None":
    """RIFF/WAVE PCM16 → mono float64 samples (channel mean), or None if
    the payload is not a WAV file."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    import struct as _struct

    pos = 12
    n_ch, fmt_code = 1, 1
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        ln = _struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + ln]
        if tag == b"fmt ":
            if len(body) < 4:
                raise ValueError("corrupt WAV: truncated fmt chunk")
            fmt_code, n_ch = _struct.unpack("<HH", body[:4])
            if n_ch == 0:
                # a declared channel count of 0 would divide by zero in
                # the data chunk — corrupt, not merely unsupported
                raise ValueError("corrupt WAV: zero channels")
        elif tag == b"data":
            if fmt_code != 1:
                raise ValueError("only PCM WAV supported")
            pcm = np.frombuffer(
                body[: (len(body) // (2 * n_ch)) * 2 * n_ch], dtype="<i2"
            ).astype(np.float64)
            if n_ch > 1:
                pcm = pcm.reshape(-1, n_ch).mean(axis=1)
            return pcm
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    return np.empty(0, dtype=np.float64)


class AudioFeatures:
    """Frame-energy (RMS) features over PCM16 audio.  Round 2: payloads
    with a RIFF/WAVE header are parsed for real (fmt/data chunks, multi-
    channel downmix); headerless payloads are treated as raw PCM16 mono
    (the round-1 contract, kept for the synthetic test tables)."""

    def __init__(self, bytes_col: str = "bytes", frame: int = 1024) -> None:
        self.bytes_col = bytes_col
        self.frame = frame

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, oks = [], []
        for data in t[self.bytes_col].to_pylist():
            if data is None:
                feats.append(None)
                oks.append(False)
                continue
            try:
                pcm = _parse_wav_pcm16(bytes(data))
            except Exception:  # corrupt/non-PCM: flag row,
                feats.append(None)  # don't fail the batch
                oks.append(False)
                continue
            oks.append(True)
            if pcm is None:
                pcm = np.frombuffer(
                    data[: (len(data) // 2) * 2], dtype="<i2"
                ).astype(np.float64)
            if len(pcm) == 0:
                feats.append([])
                continue
            n = len(pcm) // self.frame
            if n == 0:
                feats.append([float(np.sqrt(np.mean(pcm**2)))])
                continue
            frames = pcm[: n * self.frame].reshape(n, self.frame)
            feats.append([float(x) for x in np.sqrt((frames**2).mean(axis=1))])
        return t.append_column(
            "frame_rms", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("audio_ok", pa.array(oks, pa.bool_()))


class AudioSpectral:
    """Spectral band energies over PCM16 audio: frames of ``frame``
    samples → rfft → mean power in ``bands`` equal log-spaced-ish bins
    (here: equal-width bins over the positive spectrum — a deterministic
    mel-like front-end without the mel tables).  Same payload contract
    as :class:`AudioFeatures` (RIFF/WAVE parsed, headerless = raw PCM16
    mono).  Appends ``band_energy`` (list<double>, len = bands, the
    per-band mean over all frames) and ``spectral_ok``."""

    def __init__(self, bytes_col: str = "bytes", frame: int = 256,
                 bands: int = 4) -> None:
        self.bytes_col = bytes_col
        self.frame = frame
        self.bands = bands

    def __call__(self, t: pa.Table) -> pa.Table:
        feats, oks = [], []
        for data in t[self.bytes_col].to_pylist():
            if data is None:
                feats.append(None)
                oks.append(False)
                continue
            try:
                pcm = _parse_wav_pcm16(bytes(data))
            except Exception:  # corrupt/non-PCM: flag, don't fail batch
                feats.append(None)
                oks.append(False)
                continue
            oks.append(True)
            if pcm is None:
                pcm = np.frombuffer(
                    data[: (len(data) // 2) * 2], dtype="<i2"
                ).astype(np.float64)
            n = len(pcm) // self.frame
            if n == 0:
                feats.append([0.0] * self.bands)
                continue
            frames = pcm[: n * self.frame].reshape(n, self.frame)
            spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
            # drop DC, split the rest into equal-width bands
            body = spec[:, 1:]
            edges = np.linspace(0, body.shape[1], self.bands + 1).astype(int)
            e = [
                float(body[:, edges[b]:edges[b + 1]].mean())
                for b in range(self.bands)
            ]
            feats.append(e)
        return t.append_column(
            "band_energy", pa.array(feats, pa.list_(pa.float64()))
        ).append_column("spectral_ok", pa.array(oks, pa.bool_()))


class SampleVideoFrames:
    """Evenly-spaced frame sampling over the NV1 container
    (:mod:`parsel_ray.images.video` — round 2: the round-1 stub replaced
    by a real container parse + SELECTIVE decode: only sampled frames'
    payloads are touched).  binary → list<binary> of ``n`` re-encoded
    frames + their indices; a real MP4 demuxer would replace only the
    container-parsing calls."""

    def __init__(self, n: int = 4, bytes_col: str = "bytes",
                 out_fmt: str = "png") -> None:
        self.n = n
        self.bytes_col = bytes_col
        self.out_fmt = out_fmt

    def __call__(self, t: pa.Table) -> pa.Table:
        from ..images.codecs import decode_image, encode_image
        from ..images.video import frame_offsets

        import struct as _struct

        sampled, indices, oks = [], [], []
        for data in t[self.bytes_col].to_pylist():
            # the WHOLE per-row pipeline is guarded: a truncated frame
            # payload or 0-frame header flags the row (video_ok=False)
            # instead of failing the batch — same contract as DecodeJpeg
            try:
                data = bytes(data)
                offs, fmt = frame_offsets(data)  # one walk: offsets + fmt
                n_frames = len(offs)
                if n_frames == 0:
                    raise ValueError("empty video")
                k = min(self.n, n_frames)
                idx = (
                    [int(i * (n_frames - 1) / (k - 1)) for i in range(k)]
                    if k > 1
                    else [0]
                )
                idx = sorted(set(idx))
                frames, fidx = [], []
                for i in idx:
                    off = offs[i]
                    ln = _struct.unpack(">I", data[off - 4:off])[0]
                    px = decode_image(data[off:off + ln], fmt)
                    frames.append(encode_image(px, self.out_fmt))
                    fidx.append(i)
            except Exception:
                oks.append(False)
                sampled.append(None)
                indices.append(None)
                continue
            oks.append(True)
            sampled.append(frames)
            indices.append(fidx)
        return (
            t.append_column(
                "frames", pa.array(sampled, pa.list_(pa.binary()))
            )
            .append_column(
                "frame_indices", pa.array(indices, pa.list_(pa.int32()))
            )
            .append_column("video_ok", pa.array(oks, pa.bool_()))
        )


def _aug_params(image_id: str) -> dict:
    """Deterministic augmentation parameters from the image id alone
    (content-addressed randomness: stable across runs, shards and
    retries — the property a resumable 100 TB augmentation job needs)."""
    import hashlib

    h = int.from_bytes(
        hashlib.md5(image_id.encode("utf-8")).digest()[:8], "big"
    )
    return {
        "flip": bool(h & 1),
        "rot90": (h >> 1) & 3,
        # crop keeps 75-100% of each side, anchored top-left
        "crop_frac": 0.75 + ((h >> 3) & 0xFF) / 255.0 * 0.25,
        # brightness in [0.7, 1.3]
        "bright": 0.7 + ((h >> 11) & 0xFF) / 255.0 * 0.6,
    }


def apply_augment(px: np.ndarray, p: dict) -> np.ndarray:
    """Apply the parameterized augmentation to an HxWx3 uint8 array —
    pure numpy views/ufuncs (flip/rot90 are zero-copy views; the only
    materialization is the final brightness multiply)."""
    if p["flip"]:
        px = px[:, ::-1]
    if p["rot90"]:
        px = np.rot90(px, k=p["rot90"])
    ch = max(1, int(round(px.shape[0] * p["crop_frac"])))
    cw = max(1, int(round(px.shape[1] * p["crop_frac"])))
    px = px[:ch, :cw]
    return np.clip(px.astype(np.float32) * p["bright"], 0, 255).astype(
        np.uint8
    )


class AugmentImages:
    """Deterministic per-image augmentation (flip / rot90 / crop /
    brightness) for training-data pipelines: bytes in, augmented bytes
    out, parameters derived from ``image_id`` only.  In-kernel
    certification (``aug_ok``): the emitted bytes are decoded back and
    must reproduce ``apply_augment(decode(original))`` exactly for
    lossless formats, within the codec's own error bound for lossy
    ones (qjpg: |err| <= 4 by construction — its quantization drops 3
    bits with midpoint reconstruction; DCT jpeg: PSNR >= 35 dB, the
    realistic floor on arbitrarily small crops where 8x8 blocking
    dominates)."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 id_col: str = "image_id") -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.id_col = id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out_b, ws, hs, ops, oks = [], [], [], [], []
        for data, fmt, iid in zip(
            t[self.bytes_col].to_pylist(),
            t[self.fmt_col].to_pylist(),
            t[self.id_col].to_pylist(),
        ):
            p = _aug_params(str(iid))
            try:
                px = apply_augment(decode_image(data, fmt), p)
            except Exception:  # corrupt/null payload: flag, don't fail
                out_b.append(None)
                ws.append(None); hs.append(None)
                ops.append(None); oks.append(False)
                continue
            enc = encode_image(px, fmt)
            back = decode_image(enc, fmt)
            if back.shape != px.shape:
                ok = False
            elif fmt == "qjpg":
                # the codec's own hard guarantee: 3 dropped bits with
                # midpoint reconstruction => |err| <= 4 per channel
                # (PSNR ~40.8 dB in expectation; tiny crops can realize
                # slightly less, so the bound — not PSNR — is the gate)
                err = np.abs(
                    back.astype(np.int16) - px.astype(np.int16)
                ).max()
                ok = int(err) <= 4
            elif fmt == "gif":
                # GIF87a 3-3-2 palette: midpoint reconstruction of 5/5/6
                # dropped bits bounds per-channel error at 16/16/32 — a
                # PSNR gate would flag every correctly-augmented GIF
                # (~26 dB is that codec's normal ceiling)
                err = np.abs(back.astype(np.int16) - px.astype(np.int16))
                ok = (
                    int(err[..., :2].max(initial=0)) <= 16
                    and int(err[..., 2].max(initial=0)) <= 32
                )
            elif np.array_equal(back, px):
                ok = True
            else:  # lossy DCT round-trip: PSNR gate (35 dB on small
                # crops — 8x8 blocking dominates below ~32px sides)
                mse = float(
                    np.mean(
                        (back.astype(np.float64) - px.astype(np.float64))
                        ** 2
                    )
                )
                ok = mse > 0 and 10 * np.log10(255.0**2 / mse) >= 35.0
            out_b.append(enc)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            ops.append(
                f"flip={int(p['flip'])},rot={p['rot90']},"
                f"crop={p['crop_frac']:.3f},bright={p['bright']:.3f}"
            )
            oks.append(ok)
        idx_b = t.schema.get_field_index(self.bytes_col)
        t = t.set_column(idx_b, self.bytes_col, pa.array(out_b, pa.binary()))
        return (
            t.append_column("aug_w", pa.array(ws, pa.int32()))
            .append_column("aug_h", pa.array(hs, pa.int32()))
            .append_column("aug_op", pa.array(ops, pa.string()))
            .append_column("aug_ok", pa.array(oks, pa.bool_()))
        )


class DetectShotBoundaries:
    """Shot-boundary detection over NV1 video blobs: decode consecutive
    frames, mean-absolute-difference between neighbors, a boundary
    wherever the diff clears ``threshold``.  Sequential full-frame
    decode is inherent (every neighbor pair is compared); payload bytes
    never leave the task — only (n_frames, n_shots, boundaries) rows do.
    Corrupt containers emit ``video_ok=False`` instead of failing the
    batch."""

    def __init__(self, bytes_col: str = "bytes",
                 threshold: float = 64.0) -> None:
        self.bytes_col = bytes_col
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        import struct as _struct

        from ..images.codecs import decode_image
        from ..images.video import frame_offsets

        def _frame(data: bytes, off: int, fmt: str) -> np.ndarray:
            ln = _struct.unpack(">I", data[off - 4:off])[0]
            return decode_image(data[off:off + ln], fmt)

        ns, shots, bounds, oks = [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                data = bytes(data)
                # one container walk; read_frame(data, k) per frame would
                # re-walk all k length prefixes — O(n^2) on long videos
                offs, fmt = frame_offsets(data)
                n = len(offs)
                if n == 0:
                    raise ValueError("empty video")
                prev = _frame(data, offs[0], fmt)
                cuts = []
                for k in range(1, n):
                    cur = _frame(data, offs[k], fmt)
                    diff = float(
                        np.abs(cur.astype(np.int64)
                               - prev.astype(np.int64)).mean()
                    )
                    if diff > self.threshold:
                        cuts.append(k)
                    prev = cur
            except Exception:
                ns.append(None); shots.append(None)
                bounds.append(None); oks.append(False)
                continue
            ns.append(n); shots.append(1 + len(cuts))
            bounds.append(cuts); oks.append(True)
        return (
            t.append_column("n_frames", pa.array(ns, pa.int64()))
            .append_column("n_shots", pa.array(shots, pa.int64()))
            .append_column("boundaries", pa.array(bounds,
                                                  pa.list_(pa.int32())))
            .append_column("video_ok", pa.array(oks, pa.bool_()))
        )


def encode_wav_pcm16(samples: "np.ndarray", rate: int = 8000) -> bytes:
    """Mono PCM16 RIFF/WAVE encoder (int16 samples → bytes) — the
    write-side twin of :func:`_parse_wav_pcm16`, used to materialize
    audio cells deterministically on workers."""
    import struct as _struct

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = _struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF" + _struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
        + b"data" + _struct.pack("<I", len(pcm)) + pcm
    )


class SilenceSegments:
    """Voice-activity segmentation over PCM16 audio: frame RMS below
    ``threshold`` is silence; output counts frames, silent frames and
    maximal VOICED runs (the VAD segments a speech pipeline would clip).
    Non-WAV payloads emit ``audio_ok=False`` instead of failing the
    batch; the trailing partial frame is dropped (same frame contract
    as :class:`AudioFeatures`)."""

    def __init__(self, bytes_col: str = "bytes", frame: int = 256,
                 threshold: float = 500.0) -> None:
        self.bytes_col = bytes_col
        self.frame = frame
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        nf, nsil, nseg, oks = [], [], [], []
        for data in t[self.bytes_col].to_pylist():
            try:
                pcm = _parse_wav_pcm16(bytes(data)) if data else None
            except Exception:  # non-PCM / corrupt header: flag the row
                pcm = None
            if pcm is None:
                nf.append(None); nsil.append(None); nseg.append(None)
                oks.append(False)
                continue
            n = len(pcm) // self.frame
            frames = pcm[: n * self.frame].reshape(n, self.frame)
            rms = np.sqrt((frames * frames).mean(axis=1))
            voiced = rms >= self.threshold
            # maximal voiced runs: rising edges of the voiced mask
            starts = int(voiced[0]) + int(
                (voiced[1:] & ~voiced[:-1]).sum()
            ) if n else 0
            nf.append(n)
            nsil.append(int((~voiced).sum()))
            nseg.append(starts)
            oks.append(True)
        return (
            t.append_column("n_frames", pa.array(nf, pa.int64()))
            .append_column("n_silent_frames", pa.array(nsil, pa.int64()))
            .append_column("n_voice_segments", pa.array(nseg, pa.int64()))
            .append_column("audio_ok", pa.array(oks, pa.bool_()))
        )


def box_blur3(px: "np.ndarray") -> "np.ndarray":
    """3×3 box blur with edge-clamped counts (pure numpy, deterministic
    rounding) — the synthetic 'defocus' used by blur-detection tests."""
    g = px.astype(np.float64)
    acc = np.zeros_like(g)
    cnt = np.zeros_like(g)
    h, w = g.shape[:2]
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys = slice(max(0, dy), h + min(0, dy))
            xs = slice(max(0, dx), w + min(0, dx))
            yd = slice(max(0, -dy), h + min(0, -dy))
            xd = slice(max(0, -dx), w + min(0, -dx))
            acc[yd, xd] += g[ys, xs]
            cnt[yd, xd] += 1
    return np.clip(acc / cnt + 0.5, 0, 255).astype(np.uint8)


def laplacian_variance(px: "np.ndarray") -> float:
    """Variance of the 4-neighbor Laplacian over luma — the classic
    blur/defocus score (sharp noise ≈ 5e4, box-blurred ≈ 1e3 on the
    same content; see TestBlurDetect)."""
    g = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    lap = (-4 * g[1:-1, 1:-1] + g[:-2, 1:-1] + g[2:, 1:-1]
           + g[1:-1, :-2] + g[1:-1, 2:])
    return float(lap.var()) if lap.size else 0.0


class BlurDetect:
    """Blur/defocus filter for image corpora: decode → variance of the
    Laplacian → ``is_blurry`` under ``threshold``.  The standard
    quality gate a 100 TB image-caption crawl applies before spending
    training compute on a sample."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 threshold: float = 5000.0) -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.threshold = threshold

    def __call__(self, t: pa.Table) -> pa.Table:
        scores, flags, oks = [], [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except Exception:
                scores.append(None); flags.append(None); oks.append(False)
                continue
            v = laplacian_variance(px)
            scores.append(v); flags.append(v < self.threshold)
            oks.append(True)
        return (
            t.append_column("lap_var", pa.array(scores, pa.float64()))
            .append_column("is_blurry", pa.array(flags, pa.bool_()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )


def count_regions(mask: "np.ndarray") -> int:
    """4-connected component count over a boolean mask: vectorized
    min-label propagation to fixed point (O(diameter) passes, each a
    full-array numpy min — no per-pixel Python).  Exact for any mask;
    intended for the small region masks vision preprocessing emits."""
    if not mask.any():
        return 0
    lab = np.where(mask, np.arange(mask.size).reshape(mask.shape), -1)
    while True:
        nxt = lab.copy()
        nxt[1:, :] = np.where(
            mask[1:, :] & mask[:-1, :], np.minimum(nxt[1:, :], lab[:-1, :]),
            nxt[1:, :])
        nxt[:-1, :] = np.where(
            mask[:-1, :] & mask[1:, :], np.minimum(nxt[:-1, :], lab[1:, :]),
            nxt[:-1, :])
        nxt[:, 1:] = np.where(
            mask[:, 1:] & mask[:, :-1], np.minimum(nxt[:, 1:], lab[:, :-1]),
            nxt[:, 1:])
        nxt[:, :-1] = np.where(
            mask[:, :-1] & mask[:, 1:], np.minimum(nxt[:, :-1], lab[:, 1:]),
            nxt[:, :-1])
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return int(len(np.unique(lab[mask])))


class RegionCount:
    """Connected-component count over thresholded images (binary mask =
    luma > ``luma_cut``): the segmentation-shaped member of the image
    stage family.  Emits ``n_regions`` per image."""

    def __init__(self, bytes_col: str = "bytes", fmt_col: str = "fmt",
                 luma_cut: float = 128.0) -> None:
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col
        self.luma_cut = luma_cut

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, oks = [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            try:
                px = decode_image(data, fmt)
            except Exception:
                ns.append(None); oks.append(False)
                continue
            luma = px.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            ns.append(count_regions(luma > self.luma_cut))
            oks.append(True)
        return (
            t.append_column("n_regions", pa.array(ns, pa.int64()))
            .append_column("decode_ok", pa.array(oks, pa.bool_()))
        )
