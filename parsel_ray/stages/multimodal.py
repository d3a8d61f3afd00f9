"""Multimodal column stages: image/audio/video cells as opaque ``binary``
columns with typed metadata, processed by ``map_batches`` kernels.

Real, tested paths (pure numpy/zlib codecs from :mod:`parsel_ray.images`):
decode, resize (block mean), thumbnail features, mean color, phash.

Stubbed paths (codec libraries absent in this environment — the Ray-side
plumbing (schema, batch shape, kernel signature, output layout) is real
and tested; the decode call raises ``NotImplementedError`` so a swap-in
of PIL/ffmpeg later is a one-function change): JPEG decode, audio
feature extraction, video frame sampling.
"""

from __future__ import annotations

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
    """Re-encode every image at ``out_h``×``out_w`` (block-mean resize).
    Output replaces bytes/w/h; fmt preserved."""

    def __init__(self, out_h: int, out_w: int, bytes_col: str = "bytes",
                 fmt_col: str = "fmt") -> None:
        self.out_h = out_h
        self.out_w = out_w
        self.bytes_col = bytes_col
        self.fmt_col = fmt_col

    def __call__(self, t: pa.Table) -> pa.Table:
        out_bytes, ws, hs = [], [], []
        for data, fmt in zip(t[self.bytes_col].to_pylist(),
                             t[self.fmt_col].to_pylist()):
            px = decode_image(data, fmt)
            small = np.clip(
                _block_mean_resize(px, self.out_h, self.out_w), 0, 255
            ).astype(np.uint8)
            out_bytes.append(encode_image(small, fmt))
            ws.append(self.out_w)
            hs.append(self.out_h)
        idx_b = t.schema.get_field_index(self.bytes_col)
        t = t.set_column(idx_b, self.bytes_col, pa.array(out_bytes, pa.binary()))
        if "w" in t.column_names:
            t = t.set_column(t.schema.get_field_index("w"), "w",
                             pa.array(ws, pa.int32()))
        if "h" in t.column_names:
            t = t.set_column(t.schema.get_field_index("h"), "h",
                             pa.array(hs, pa.int32()))
        return t


class DecodeJpeg:
    """STUB: real JPEG decode needs a codec library not present in this
    environment.  The kernel contract (binary in → (H,W,3) uint8) and the
    batch plumbing are what the pipeline depends on; swap the body for
    PIL/libjpeg when available."""

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "JPEG decoding requires an image codec library (e.g. PIL) "
            "that is not available in this environment; use fmt ppm/png/"
            "qjpg (parsel_ray.images.codecs) or plug a decoder in here."
        )


class AudioFeatures:
    """STUB with a deterministic fake: treats the binary payload as PCM16
    mono and emits frame-energy features.  A real implementation would
    parse WAV/FLAC headers; the fake keeps the Ray-side contract testable."""

    def __init__(self, bytes_col: str = "bytes", frame: int = 1024) -> None:
        self.bytes_col = bytes_col
        self.frame = frame

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = []
        for data in t[self.bytes_col].to_pylist():
            pcm = np.frombuffer(
                data[: (len(data) // 2) * 2], dtype=np.int16
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
        return t.append_column("frame_rms", pa.array(feats, pa.list_(pa.float64())))


class SampleVideoFrames:
    """STUB: video frame sampling needs a container/codec parser.  The
    contract: binary in → list<binary> of ``n`` encoded frames."""

    def __init__(self, n: int = 4) -> None:
        self.n = n

    def __call__(self, t: pa.Table) -> pa.Table:
        raise NotImplementedError(
            "video frame sampling requires a codec library not available "
            "in this environment; contract: bytes -> list<binary> frames"
        )
