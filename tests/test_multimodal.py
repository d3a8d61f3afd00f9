"""Round-2 multimodal de-stubs: baseline JPEG codec (pure numpy),
NV1 video container + frame sampling, WAV parsing in AudioFeatures."""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa
import pytest

from parsel_ray.images.codecs import decode_image, encode_image, psnr
from parsel_ray.images.jpeg import (
    AC_CHROM,
    AC_LUM,
    DC_CHROM,
    DC_LUM,
    ZIGZAG,
    _BitWriter,
    _build_codes,
    _quality_tables,
    decode_jpeg,
    encode_jpeg,
)
from parsel_ray.images.video import (
    encode_video,
    frame_offsets,
    parse_header,
    read_frame,
)
from parsel_ray.stages.multimodal import (
    AudioFeatures,
    DecodeJpeg,
    SampleVideoFrames,
    _parse_wav_pcm16,
)


def gradient(h, w, scale=1):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 255) // max(1, w - 1), (yy * 255) // max(1, h - 1),
         ((xx + yy) * scale) % 256],
        axis=-1,
    ).astype(np.uint8)


class TestJpegCodec:
    def test_roundtrip_smooth_high_psnr(self):
        img = gradient(48, 64)
        for q, bar in ((90, 40.0), (75, 33.0)):
            out = decode_jpeg(encode_jpeg(img, q))
            assert out.shape == img.shape
            assert psnr(img, out) >= bar, q

    def test_flat_color_exact(self):
        img = np.full((24, 24, 3), 200, np.uint8)
        out = decode_jpeg(encode_jpeg(img, 50))
        assert int(np.abs(out.astype(int) - 200).max()) <= 1

    def test_odd_dimensions(self):
        # non-multiple-of-8 dims exercise edge padding + crop
        img = gradient(33, 41)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (33, 41, 3)
        assert psnr(img, out) >= 33.0

    def test_tiny_image(self):
        img = gradient(3, 5)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (3, 5, 3)

    def test_deterministic_bytes(self):
        img = gradient(20, 20)
        assert encode_jpeg(img, 80) == encode_jpeg(img, 80)

    def test_quality_monotone_size(self):
        img = gradient(64, 64, scale=7)
        assert len(encode_jpeg(img, 95)) > len(encode_jpeg(img, 30))

    def test_registered_format(self):
        img = gradient(16, 16)
        out = decode_image(encode_image(img, "jpeg"), "jpeg")
        assert out.shape == img.shape

    def test_corrupt_raises(self):
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg at all")
        good = bytearray(encode_jpeg(gradient(16, 16), 90))
        with pytest.raises(ValueError):
            decode_jpeg(bytes(good[:2]))  # SOI only

    def test_off_interval_restart_marker_raises_valueerror(self):
        # inject an RSTn into the entropy segment of a stream encoded
        # WITHOUT restarts: must surface as ValueError, not the internal
        # _RestartMarker control-flow exception
        data = bytearray(encode_jpeg(gradient(32, 32), 90))
        i = data.find(b"\xFF\xDA")  # SOS
        scan_start = i + 2 + int.from_bytes(data[i + 2:i + 4], "big")
        data[scan_start + 4:scan_start + 4] = b"\xFF\xD0"
        with pytest.raises(ValueError, match="restart marker"):
            decode_jpeg(bytes(data))

    def test_baseline_scan_in_sof2_frame_rejected(self):
        # SOF2 is now decodable, but a baseline full-band scan header
        # (Ss=0, Se=63) inside a progressive frame violates G.1 — the
        # stream is corrupt, not merely unsupported
        data = bytearray(encode_jpeg(gradient(16, 16), 90))
        i = data.find(b"\xFF\xC0")
        data[i + 1] = 0xC2  # flip SOF0 -> SOF2
        with pytest.raises(ValueError, match="corrupt"):
            decode_jpeg(bytes(data))

    def test_lossless_sof3_rejected(self):
        data = bytearray(encode_jpeg(gradient(16, 16), 90))
        i = data.find(b"\xFF\xC0")
        data[i + 1] = 0xC3  # SOF3 (lossless) stays unsupported
        with pytest.raises(ValueError, match="SOF"):
            decode_jpeg(bytes(data))

    @staticmethod
    def _craft(h, w, sampling, dri=0):
        """Hand-assemble a constant-gray baseline JPEG with the given
        (h_factor, v_factor) luma sampling — exercises decoder paths the
        4:4:4 encoder never emits (4:2:0 MCU interleave, restarts)."""
        hs, vs = sampling
        lq, cq = _quality_tables(90)
        out = bytearray(b"\xFF\xD8")
        for tid, tbl in ((0, lq), (1, cq)):
            out += b"\xFF\xDB" + struct.pack(">HB", 67, tid)
            out += bytes(int(x) for x in tbl.reshape(-1)[ZIGZAG])
        out += b"\xFF\xC0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
        out += struct.pack(">BBB", 1, (hs << 4) | vs, 0)
        out += struct.pack(">BBB", 2, 0x11, 1)
        out += struct.pack(">BBB", 3, 0x11, 1)
        for tclass, tid, (bits, values) in (
            (0, 0, DC_LUM), (0, 1, DC_CHROM), (1, 0, AC_LUM), (1, 1, AC_CHROM)
        ):
            out += b"\xFF\xC4" + struct.pack(
                ">HB", 19 + len(values), (tclass << 4) | tid
            )
            out += bytes(bits) + bytes(values)
        if dri:
            out += b"\xFF\xDD" + struct.pack(">HH", 4, dri)
        out += b"\xFF\xDA" + struct.pack(">HB", 12, 3)
        for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
            out += struct.pack(">BB", cid, tabs)
        out += b"\x00\x3F\x00"
        # constant 128-gray: every block is DC diff 0 + EOB
        dc_l, dc_c = _build_codes(*DC_LUM), _build_codes(*DC_CHROM)
        ac_l, ac_c = _build_codes(*AC_LUM), _build_codes(*AC_CHROM)
        mcux = -(-w // (8 * hs))
        mcuy = -(-h // (8 * vs))
        bw = _BitWriter()
        scan = bytearray()
        rst = 0
        count = 0
        for _ in range(mcux * mcuy):
            if dri and count and count % dri == 0:
                scan += bw.flush()
                bw = _BitWriter()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
            count += 1
            for _b in range(hs * vs):
                c, ln = dc_l[0]; bw.write(c, ln)
                c, ln = ac_l[0]; bw.write(c, ln)
            for _c in range(2):
                c, ln = dc_c[0]; bw.write(c, ln)
                c, ln = ac_c[0]; bw.write(c, ln)
        scan += bw.flush()
        out += scan + b"\xFF\xD9"
        return bytes(out)

    def test_420_subsampled_decode(self):
        data = self._craft(24, 24, (2, 2))
        out = decode_jpeg(data)
        assert out.shape == (24, 24, 3)
        assert int(np.abs(out.astype(int) - 128).max()) <= 1

    def test_422_subsampled_decode(self):
        out = decode_jpeg(self._craft(16, 24, (2, 1)))
        assert out.shape == (16, 24, 3)
        assert int(np.abs(out.astype(int) - 128).max()) <= 1

    def test_restart_markers(self):
        out = decode_jpeg(self._craft(8, 32, (1, 1), dri=1))
        assert out.shape == (8, 32, 3)
        assert int(np.abs(out.astype(int) - 128).max()) <= 1


class TestVideoContainer:
    def test_header_offsets_and_selective_read(self):
        frames = [gradient(12, 10, scale=k + 1) for k in range(5)]
        data = encode_video(frames, "png")
        n, w, h, fmt, _ = parse_header(data)
        assert (n, w, h, fmt) == (5, 10, 12, "png")
        offs, _ = frame_offsets(data)
        assert len(offs) == 5
        for k in (0, 2, 4):
            assert np.array_equal(read_frame(data, k), frames[k])
        with pytest.raises(IndexError):
            read_frame(data, 5)

    def test_not_a_video(self):
        with pytest.raises(ValueError):
            parse_header(b"garbage")


class TestMultimodalStages:
    def test_decode_jpeg_stage(self):
        imgs = [gradient(16, 16), gradient(24, 18)]
        t = pa.table(
            {
                "id": pa.array([1, 2, 3], pa.int64()),
                "bytes": pa.array(
                    [encode_jpeg(imgs[0], 90), encode_jpeg(imgs[1], 90),
                     b"corrupt"],
                    pa.binary(),
                ),
            }
        )
        out = DecodeJpeg()(t)
        assert out["decode_ok"].to_pylist() == [True, True, False]
        assert out["decoded_w"].to_pylist() == [16, 18, None]
        px = np.frombuffer(out["rgb"][0].as_py(), np.uint8).reshape(16, 16, 3)
        assert psnr(imgs[0], px) >= 35

    def test_sample_video_frames_stage(self):
        frames = [gradient(8, 8, scale=k) for k in range(6)]
        t = pa.table(
            {
                "id": pa.array([1, 2], pa.int64()),
                "bytes": pa.array(
                    [encode_video(frames, "png"), b"nope"], pa.binary()
                ),
            }
        )
        out = SampleVideoFrames(n=3)(t)
        assert out["video_ok"].to_pylist() == [True, False]
        assert out["frame_indices"][0].as_py() == [0, 2, 5]
        sampled = out["frames"][0].as_py()
        assert len(sampled) == 3
        got = decode_image(sampled[2], "png")
        assert np.array_equal(got, frames[5])

    def test_wav_parsing(self):
        # 2-channel PCM16 WAV: stage must downmix via the fmt chunk
        sr = 8000
        tdur = np.arange(512)
        left = (1000 * np.sin(tdur * 0.1)).astype("<i2")
        right = (500 * np.sin(tdur * 0.1)).astype("<i2")
        inter = np.empty(1024, "<i2")
        inter[0::2] = left
        inter[1::2] = right
        body = inter.tobytes()
        fmt = struct.pack("<HHIIHH", 1, 2, sr, sr * 4, 4, 16)
        wav = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(body))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body
        )
        pcm = _parse_wav_pcm16(wav)
        assert pcm is not None and len(pcm) == 512
        assert np.allclose(pcm, (left.astype(np.float64) + right) / 2)
        out = AudioFeatures(frame=128)(
            pa.table({"bytes": pa.array([wav], pa.binary())})
        )
        assert len(out["frame_rms"][0].as_py()) == 4

    def test_raw_pcm_fallback(self):
        raw = (np.arange(256, dtype="<i2")).tobytes()
        assert _parse_wav_pcm16(raw) is None
        out = AudioFeatures(frame=64)(
            pa.table({"bytes": pa.array([raw], pa.binary())})
        )
        assert len(out["frame_rms"][0].as_py()) == 4


class TestRobustnessRegressions:
    """Round-2 review fixes: corrupt/unsupported rows flag, never fail
    the batch."""

    def test_zero_frame_and_truncated_video_rows(self):
        good = encode_video([gradient(8, 8)], "png")
        zero = b"NV1\n0 4 4 png\n"
        truncated = encode_video([gradient(8, 8)], "png")[:-10]
        t = pa.table({"bytes": pa.array([good, zero, truncated], pa.binary())})
        out = SampleVideoFrames(n=3)(t)
        assert out["video_ok"].to_pylist() == [True, False, False]
        assert out["frame_indices"][0].as_py() == [0]

    def test_non_pcm_wav_row_flags_not_raises(self):
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # IEEE float
        wav = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4
        )
        raw = np.arange(256, dtype="<i2").tobytes()
        out = AudioFeatures(frame=64)(
            pa.table({"bytes": pa.array([wav, raw], pa.binary())})
        )
        assert out["audio_ok"].to_pylist() == [False, True]
        assert out["frame_rms"][0].as_py() is None
        assert len(out["frame_rms"][1].as_py()) == 4


class TestAugmentImages:
    def _mk(self, n=12, fmt="png"):
        from parsel_ray.images.codecs import encode_image

        rng = np.random.RandomState(33)
        rows = []
        for i in range(n):
            px = rng.randint(0, 256, (24 + i, 31, 3), dtype=np.uint8)
            rows.append(
                {"image_id": f"im-{i}", "fmt": fmt,
                 "bytes": encode_image(px, fmt), "px": px}
            )
        return rows

    def test_deterministic_and_certified(self):
        from parsel_ray.stages.multimodal import AugmentImages

        rows = self._mk()
        t = pa.Table.from_pylist(
            [{k: r[k] for k in ("image_id", "fmt", "bytes")} for r in rows]
        )
        a1 = AugmentImages()(t)
        a2 = AugmentImages()(t)
        assert a1["bytes"].to_pylist() == a2["bytes"].to_pylist()
        assert all(a1["aug_ok"].to_pylist())
        # ops vary across ids (content-addressed params)
        assert len(set(a1["aug_op"].to_pylist())) > 1

    def test_transform_matches_reference_numpy(self):
        from parsel_ray.images.codecs import decode_image
        from parsel_ray.stages.multimodal import (
            AugmentImages, _aug_params, apply_augment,
        )

        rows = self._mk(n=6)
        t = pa.Table.from_pylist(
            [{k: r[k] for k in ("image_id", "fmt", "bytes")} for r in rows]
        )
        out = AugmentImages()(t).to_pylist()
        for r, o in zip(rows, out):
            want = apply_augment(r["px"], _aug_params(r["image_id"]))
            got = decode_image(o["bytes"], "png")
            assert np.array_equal(got, want)
            assert (o["aug_h"], o["aug_w"]) == want.shape[:2]

    def test_lossy_codec_bound(self):
        from parsel_ray.stages.multimodal import AugmentImages

        rows = self._mk(n=8, fmt="qjpg")
        t = pa.Table.from_pylist(
            [{k: r[k] for k in ("image_id", "fmt", "bytes")} for r in rows]
        )
        out = AugmentImages()(t)
        assert all(out["aug_ok"].to_pylist())


class TestFullPng:
    """Full-PNG codec (codecs.encode_png/decode_png): all five scanline
    filters, gray / gray+alpha / palette / RGB / RGBA color types, CRC
    verification.  Reference semantics: PNG spec (RFC 2083) — the byte
    contract PIL meets for parsel-consuming crawlers."""

    def _rand(self, c, h=13, w=17, seed=3):
        rng = np.random.RandomState(seed + c)
        return rng.randint(0, 256, (h, w, c), dtype=np.uint8)

    @pytest.mark.parametrize("c", [1, 2, 3, 4])
    @pytest.mark.parametrize("mode", [0, 1, 2, 3, 4, "adaptive"])
    def test_roundtrip_all_filters_and_ctypes(self, c, mode):
        from parsel_ray.images.codecs import decode_png, encode_png

        px = self._rand(c)
        back = decode_png(encode_png(px, filter_mode=mode))
        assert back.shape == px.shape
        assert np.array_equal(back, px)

    def test_adaptive_uses_nontrivial_filters(self):
        import zlib

        from parsel_ray.images.codecs import _PNG_SIG, decode_png, encode_png

        yy, xx = np.mgrid[0:32, 0:32]
        smooth = np.stack(
            [(xx * 8) % 256, (yy * 8) % 256, ((xx + yy) * 4) % 256], -1
        ).astype(np.uint8)
        data = encode_png(smooth)
        pos, idat = len(_PNG_SIG), b""
        while pos < len(data):
            (ln,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += data[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        filters = set(
            np.frombuffer(zlib.decompress(idat), np.uint8)
            .reshape(32, 1 + 32 * 3)[:, 0]
            .tolist()
        )
        assert filters - {0}, "adaptive heuristic never left filter 0"
        assert np.array_equal(decode_png(data), smooth)

    def test_palette_decode(self):
        import zlib

        from parsel_ray.images.codecs import (
            _PNG_SIG,
            _png_chunk,
            _png_filter_rows,
            decode_png,
        )

        rng = np.random.RandomState(11)
        pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.randint(0, 16, (9, 11), dtype=np.uint8)
        ihdr = struct.pack(">IIBBBBB", 11, 9, 8, 3, 0, 0, 0)
        rows = _png_filter_rows(idx.reshape(9, 11), 1, "adaptive")
        blob = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"PLTE", pal.tobytes())
            + _png_chunk(b"IDAT", zlib.compress(rows.tobytes()))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(blob), pal[idx])

    @staticmethod
    def _adam7_blob(px, filt=0):
        """Interlaced PNG from scratch: serialize the 7 Adam7 passes,
        each row with the given filter type (0=None or 2=Up)."""
        import zlib

        from parsel_ray.images.codecs import _ADAM7, _PNG_SIG, _png_chunk

        h, w, c = px.shape
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        stream = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = px[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            flat = sub.reshape(ph, pw * c).astype(np.int64)
            for y in range(ph):
                if filt == 2:
                    prev = flat[y - 1] if y else np.zeros(pw * c, np.int64)
                    row = (flat[y] - prev) % 256
                else:
                    row = flat[y]
                stream += bytes([filt]) + row.astype(np.uint8).tobytes()
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(stream)))
            + _png_chunk(b"IEND", b"")
        )

    @pytest.mark.parametrize("c", [1, 3, 4])
    @pytest.mark.parametrize("filt", [0, 2])
    def test_adam7_interlaced_decode(self, c, filt):
        from parsel_ray.images.codecs import decode_png

        px = self._rand(c, h=21, w=15, seed=9)
        assert np.array_equal(decode_png(self._adam7_blob(px, filt)), px)

    def test_adam7_small_image_skips_empty_passes(self):
        # 2x2: passes 1 keeps (0,0); passes 2-3 empty; etc.
        from parsel_ray.images.codecs import decode_png

        px = self._rand(3, h=2, w=2, seed=4)
        assert np.array_equal(decode_png(self._adam7_blob(px)), px)

    def test_adam7_truncated_raises(self):
        from parsel_ray.images.codecs import decode_png

        blob = self._adam7_blob(self._rand(3, h=21, w=15, seed=9))
        # rebuild with IDAT cut mid-stream: recompress a prefix
        import zlib

        from parsel_ray.images.codecs import _PNG_SIG, _png_chunk

        pos, idat = len(_PNG_SIG), b""
        while pos < len(blob):
            (ln,) = struct.unpack_from(">I", blob, pos)
            tag = blob[pos + 4 : pos + 8]
            if tag == b"IDAT":
                idat += blob[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        raw = zlib.decompress(idat)
        cut = (
            _PNG_SIG
            + blob[len(_PNG_SIG) : len(_PNG_SIG) + 25]  # IHDR chunk (12+13)
            + _png_chunk(b"IDAT", zlib.compress(raw[: len(raw) // 2]))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(cut)

    def test_crc_and_corruption_raise(self):
        from parsel_ray.images.codecs import decode_png, encode_png

        blob = bytearray(encode_png(self._rand(3)))
        blob[40] ^= 0xFF
        with pytest.raises(ValueError):
            decode_png(bytes(blob))
        with pytest.raises(ValueError):
            decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 4)
        # truncated IDAT
        good = encode_png(self._rand(3))
        with pytest.raises(ValueError):
            decode_png(good[: len(good) // 2])

    def test_legacy_corpus_png_still_decodes(self):
        px = self._rand(3)
        assert np.array_equal(
            decode_image(encode_image(px, "png"), "png"), px
        )

    def test_decode_png_stage(self):
        from parsel_ray.images.codecs import encode_png, phash64, png_to_rgb
        from parsel_ray.stages.multimodal import DecodePng

        pxs = [self._rand(c, seed=c) for c in (1, 3, 4)]
        t = pa.table(
            {
                "image_id": pa.array(["a", "b", "c"]),
                "bytes": pa.array(
                    [encode_png(p) for p in pxs] , pa.binary()
                ),
            }
        )
        out = DecodePng()(t)
        assert out["decode_ok"].to_pylist() == [True, True, True]
        assert out["channels"].to_pylist() == [1, 3, 4]
        assert out["decoded_h"].to_pylist() == [13, 13, 13]
        assert out["phash_recomputed"].to_pylist() == [
            phash64(png_to_rgb(p)) for p in pxs
        ]
        # corrupt row degrades, not fails
        bad = pa.table(
            {"image_id": pa.array(["x"]),
             "bytes": pa.array([b"not a png"], pa.binary())}
        )
        assert DecodePng()(bad)["decode_ok"].to_pylist() == [False]


class TestGif:
    """GIF87a codec (images/gif.py): LZW variable-width codes with CLEAR
    on table fill, global color table, block-structured data.  Reference
    semantics: GIF87a spec — the byte contract PIL meets."""

    def test_lzw_roundtrip(self):
        from parsel_ray.images.gif import _lzw_decode, _lzw_encode

        rng = np.random.RandomState(5)
        for n in (0, 1, 2, 300, 5000):
            seq = rng.randint(0, 256, n).astype(np.uint8)
            assert _lzw_decode(_lzw_encode(seq, 8), 8, n) == seq.tobytes()
        # heavy repetition drives table growth + the KwKwK case
        rep = np.tile(np.arange(7, dtype=np.uint8), 9000)
        assert _lzw_decode(_lzw_encode(rep, 8), 8, rep.size) == rep.tobytes()

    def test_interlaced_decode(self):
        # build an interlaced GIF by permuting encoder rows into GIF87a
        # 4-pass storage order and setting the interlace flag
        from parsel_ray.images.gif import decode_gif, encode_gif

        rng = np.random.RandomState(13)
        idx = rng.randint(0, 256, (23, 9), dtype=np.uint8)
        h = idx.shape[0]
        order = [y for y0, st in ((0, 8), (4, 8), (2, 4), (1, 2))
                 for y in range(y0, h, st)]
        blob = bytearray(encode_gif(idx[order]))
        # image descriptor starts after 13-byte header + 768-byte table:
        # 0x2c + 8 bytes of geometry, then the flags byte
        dpos = 13 + 768 + 9
        assert blob[13 + 768] == 0x2C
        blob[dpos] |= 0x40
        back, _pal = decode_gif(bytes(blob))
        assert np.array_equal(back, idx)

    def test_lzw_table_fill_clear(self):
        from parsel_ray.images.gif import _lzw_decode, _lzw_encode

        # 200k random symbols exceed the 4096-entry table → CLEAR path
        big = np.random.RandomState(9).randint(0, 256, 200_000).astype(np.uint8)
        assert _lzw_decode(_lzw_encode(big, 8), 8, big.size) == big.tobytes()

    def test_container_roundtrip(self):
        from parsel_ray.images.gif import decode_gif, encode_gif, palette_332

        rng = np.random.RandomState(5)
        for shape in ((1, 1), (13, 17), (64, 48)):
            idx = rng.randint(0, 256, shape, dtype=np.uint8)
            back, pal = decode_gif(encode_gif(idx))
            assert np.array_equal(back, idx)
            assert np.array_equal(pal, palette_332())

    def test_quantize_and_rgb(self):
        from parsel_ray.images.gif import (
            decode_gif_rgb,
            encode_gif,
            palette_332,
            quantize_332,
        )

        img = gradient(20, 24)
        q = quantize_332(img)
        rgb = decode_gif_rgb(encode_gif(q))
        assert np.array_equal(rgb, palette_332()[q])
        # midpoint reconstruction error bound: r/g ±16, b ±32
        assert int(np.abs(rgb[:, :, :2].astype(int) - img[:, :, :2]).max()) <= 16
        assert int(np.abs(rgb[:, :, 2].astype(int) - img[:, :, 2]).max()) <= 32

    def test_truncation_raises(self):
        from parsel_ray.images.gif import decode_gif, encode_gif, quantize_332

        blob = encode_gif(quantize_332(gradient(16, 16)))
        for cut in (3, 12, len(blob) // 2, len(blob) - 1):
            with pytest.raises(ValueError):
                decode_gif(blob[:cut])
        with pytest.raises(ValueError):
            decode_gif(b"GIF89a" + blob[6:])  # only 87a accepted

    def test_codec_registry(self):
        from parsel_ray.images.gif import palette_332, quantize_332

        img = gradient(12, 12)
        blob = encode_image(img, "gif")
        assert np.array_equal(
            decode_image(blob, "gif"), palette_332()[quantize_332(img)]
        )

    def test_decode_gif_stage(self):
        from parsel_ray.images.gif import encode_gif, quantize_332
        from parsel_ray.stages.multimodal import DecodeGif

        q = quantize_332(gradient(10, 14))
        t = pa.table(
            {
                "image_id": pa.array(["a", "bad"]),
                "bytes": pa.array(
                    [encode_gif(q), b"GIF87a\x00"], pa.binary()
                ),
            }
        )
        out = DecodeGif()(t)
        assert out["decode_ok"].to_pylist() == [True, False]
        assert out["decoded_w"].to_pylist() == [14, None]
        assert out["decoded_h"].to_pylist() == [10, None]
        assert out["n_colors"].to_pylist()[0] == int(np.unique(q).size)


class TestBmp:
    """BMP codec: BITMAPINFOHEADER, 24-bit BGR, bottom-up, 4-byte row pad."""

    @pytest.mark.parametrize("shape", [(1, 1), (13, 17), (10, 21), (5, 4)])
    def test_lossless_roundtrip(self, shape):
        rng = np.random.RandomState(2)
        px = rng.randint(0, 256, (*shape, 3), dtype=np.uint8)
        assert np.array_equal(
            decode_image(encode_image(px, "bmp"), "bmp"), px
        )

    def test_corruption(self):
        from parsel_ray.images.codecs import _decode_bmp

        blob = encode_image(gradient(8, 8), "bmp")
        with pytest.raises(ValueError):
            _decode_bmp(b"BMxx")
        with pytest.raises(ValueError):
            _decode_bmp(blob[:-9])
        with pytest.raises(ValueError):
            _decode_bmp(b"XX" + blob[2:])

    def test_top_down_bmp_decodes(self):
        import struct as _s

        blob = bytearray(encode_image(gradient(6, 6), "bmp"))
        # flip height sign → top-down; pixel rows must then be read as-is
        (h,) = _s.unpack_from("<i", blob, 22)
        _s.pack_into("<i", blob, 22, -h)
        from parsel_ray.images.codecs import _decode_bmp

        got = _decode_bmp(bytes(blob))
        assert np.array_equal(got, gradient(6, 6)[::-1])


class TestBilinearResize:
    """codecs.resize_bilinear (half-pixel centers) + the ResizeImage
    method switch."""

    def test_identity_constant_midpoint(self):
        from parsel_ray.images.codecs import resize_bilinear

        rng = np.random.RandomState(1)
        px = rng.randint(0, 256, (9, 7, 3), dtype=np.uint8)
        assert np.array_equal(resize_bilinear(px, 9, 7), px)
        c = np.full((5, 5, 3), 77, np.uint8)
        assert (resize_bilinear(c, 13, 3) == 77).all()
        q = np.array([[[0], [100]], [[50], [150]]], np.float64)
        assert abs(resize_bilinear(q, 1, 1)[0, 0, 0] - 75.0) < 1e-9

    def test_grayscale_and_monotone_upsample(self):
        from parsel_ray.images.codecs import resize_bilinear

        gray = np.random.RandomState(2).randint(
            0, 256, (6, 6), dtype=np.uint8
        )
        assert resize_bilinear(gray, 3, 3).shape == (3, 3)
        g = np.tile(
            np.arange(0, 250, 50, dtype=np.uint8).reshape(1, 5, 1),
            (4, 1, 3),
        )
        up = resize_bilinear(g, 4, 10)
        assert (np.diff(up[0, :, 0].astype(int)) >= 0).all()

    def test_stage_method_switch(self):
        from parsel_ray.images.codecs import resize_bilinear
        from parsel_ray.stages.multimodal import ResizeImage

        px = gradient(20, 16)
        t = pa.table(
            {
                "fmt": pa.array(["bmp"]),
                "w": pa.array([16], pa.int32()),
                "h": pa.array([20], pa.int32()),
                "bytes": pa.array([encode_image(px, "bmp")], pa.binary()),
            }
        )
        out = ResizeImage(10, 8, method="bilinear")(t)
        got = decode_image(out["bytes"][0].as_py(), "bmp")
        assert np.array_equal(got, resize_bilinear(px, 10, 8))
        with pytest.raises(ValueError):
            ResizeImage(4, 4, method="bicubic")


class TestAudioSpectral:
    """AudioSpectral: rfft band energies pinned against pure tones."""

    def _tone(self, freq_bin, frame=256, n_frames=8):
        # a pure cosine at rfft bin `freq_bin` of the frame
        t = np.arange(frame * n_frames)
        x = np.cos(2 * np.pi * freq_bin * t / frame) * 10000
        return x.astype(np.int16).tobytes()

    def test_pure_tones_land_in_their_band(self):
        from parsel_ray.stages.multimodal import AudioSpectral

        # bands split bins 1..128 into 4 ranges of ~32; put one tone in
        # the middle of each
        tones = [self._tone(b) for b in (16, 48, 80, 112)]
        t = pa.table({"bytes": pa.array(tones, pa.binary())})
        out = AudioSpectral(frame=256, bands=4)(t)
        assert out["spectral_ok"].to_pylist() == [True] * 4
        for want, e in enumerate(out["band_energy"].to_pylist()):
            assert int(np.argmax(e)) == want

    def test_short_and_wav_payloads(self):
        from parsel_ray.stages.multimodal import AudioSpectral

        short = np.zeros(10, np.int16).tobytes()  # < one frame
        t = pa.table({"bytes": pa.array([short], pa.binary())})
        out = AudioSpectral(frame=256, bands=4)(t)
        assert out["band_energy"].to_pylist() == [[0.0] * 4]


class TestPhashNearDupSurvivors:
    """The funnel's near-dup stage in isolation — including the
    dup-free corpus edge where every map stage drops its 0-row blocks
    and the __dead side must keep a pinned schema."""

    @staticmethod
    def _img_ds(phashes):
        import ray.data as rd

        t = pa.table(
            {
                "image_id": pa.array(
                    [f"img-{i}" for i in range(len(phashes))]
                ),
                "phash": pa.array(phashes, pa.int64()),
                "fingerprint": pa.array(
                    [f"fp{i}" for i in range(len(phashes))]
                ),
            }
        )
        return rd.from_arrow(t)

    def test_pair_free_corpus_all_survive(self, ray_session):
        from parsel_ray.pipelines.image_prep import phash_near_dup_survivors

        # pairwise hamming distances far above max_hamming=6
        phashes = [0, -1, 0x5555555555555555, 0x00FF00FF00FF00FF]
        out = phash_near_dup_survivors(
            self._img_ds(phashes), drop_cols=["fingerprint"]
        )
        got = sorted(r["image_id"] for r in out.take_all())
        assert got == [f"img-{i}" for i in range(4)]
        assert set(out.schema().names) == {"image_id", "phash"}

    def test_near_dups_collapse_to_one_per_component(self, ray_session):
        from parsel_ray.pipelines.image_prep import phash_near_dup_survivors

        # img-0/img-1 differ by 1 bit (dup pair); img-2 is far away
        phashes = [0b1000, 0b1001, 0x0F0F0F0F0F0F0F0F]
        out = phash_near_dup_survivors(
            self._img_ds(phashes), drop_cols=["fingerprint"]
        )
        got = sorted(r["image_id"] for r in out.take_all())
        assert len(got) == 2 and "img-2" in got
        assert set(got) < {"img-0", "img-1", "img-2"}


class TestImageCorpusPrep:
    """pipelines/image_prep.py — the image-payload capstone funnel."""

    def test_funnel_monotone_and_published(self, ray_session, tmp_path):
        import os

        from parsel_ray.pipelines.image_prep import image_corpus_prep
        from parsel_ray.pipelines.queries import _demo_crawl_cfg

        funnel, out = image_corpus_prep(
            _demo_crawl_cfg(), out_dir=str(tmp_path / "pub")
        )
        rows = {r["stage"]: r["n"] for r in funnel.to_pylist()}
        assert (
            rows["crawled"]
            >= rows["exact_distinct"]
            >= rows["near_dup_survivors"]
            == rows["published"]
            > 0
        )
        # published layout: one directory per format, _DONE markers
        parts = [d for d in os.listdir(out) if d.startswith("fmt=")]
        assert parts
        import pyarrow.parquet as pq
        import ray.data as rd

        back = rd.read_parquet(out)
        assert back.count() == rows["published"]
        # thumbnails re-encoded at 16x16
        r0 = back.take(1)[0]
        assert (r0["w"], r0["h"]) == (16, 16)


class TestImageQuality:
    """sobel_edge_density + ImageQuality stage."""

    def test_flat_vs_edges_vs_noise(self):
        from parsel_ray.stages.multimodal import sobel_edge_density

        flat = np.full((20, 20, 3), 128, np.uint8)
        assert sobel_edge_density(flat) == 0.0
        # vertical step edge → strong response
        step = np.zeros((20, 20, 3), np.uint8)
        step[:, 10:] = 255
        e_step = sobel_edge_density(step)
        # smooth gradient → weak response
        e_grad = sobel_edge_density(gradient(20, 20))
        assert e_step > e_grad > 0
        # tiny image degenerates to 0, not a crash
        assert sobel_edge_density(np.zeros((2, 2, 3), np.uint8)) == 0.0

    def test_stage(self):
        from parsel_ray.stages.multimodal import ImageQuality

        flat = np.full((16, 16, 3), 99, np.uint8)
        t = pa.table(
            {
                "fmt": pa.array(["bmp", "bmp", "bmp"]),
                "bytes": pa.array(
                    [
                        encode_image(flat, "bmp"),
                        encode_image(gradient(16, 16), "bmp"),
                        b"broken",
                    ],
                    pa.binary(),
                ),
            }
        )
        out = ImageQuality()(t)
        assert out["quality_ok"].to_pylist() == [True, True, False]
        d = out["edge_density"].to_pylist()
        assert d[0] == 0.0 and d[1] > 0 and d[2] is None
        assert out["gray_std"].to_pylist()[0] == 0.0


class TestSniffImageMeta:
    """Header-only (fmt, w, h) sniffing: no decode, no inflate."""

    def test_all_formats_roundtrip(self):
        from parsel_ray.images.codecs import ALL_FORMATS, sniff_image_meta

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (19, 27, 3), dtype=np.uint8)
        for fmt in ALL_FORMATS:
            assert sniff_image_meta(encode_image(px, fmt)) == (fmt, 27, 19)

    def test_header_only_no_body_needed(self):
        # truncating the payload body must not matter — only the header
        # bytes are read (that's the whole point of the sniffer)
        from parsel_ray.images.codecs import sniff_image_meta

        px = gradient(33, 41)
        for fmt in ("png", "jpeg", "gif", "bmp"):
            blob = encode_image(px, fmt)
            head = blob[: 64 if fmt != "jpeg" else 1024]
            assert sniff_image_meta(head) == (fmt, 41, 33), fmt

    def test_ppm_comments_and_whitespace(self):
        from parsel_ray.images.codecs import sniff_image_meta

        blob = b"P6\n# a comment\n  12\t9\n255\n" + b"\x00" * (12 * 9 * 3)
        assert sniff_image_meta(blob) == ("ppm", 12, 9)

    def test_jpeg_marker_walk_skips_appn(self):
        # APP1 (Exif-ish) segment before SOF must be hopped via its length
        from parsel_ray.images.codecs import sniff_image_meta

        blob = encode_image(gradient(17, 23), "jpeg")
        app1 = b"\xff\xe1" + struct.pack(">H", 12) + b"Exif\x00\x00abcd"
        spliced = blob[:2] + app1 + blob[2:]
        assert sniff_image_meta(spliced) == ("jpeg", 23, 17)

    def test_corrupt_and_truncated(self):
        from parsel_ray.images.codecs import sniff_image_meta

        assert sniff_image_meta(b"") is None
        assert sniff_image_meta(b"\x00JUNK\x00\x00\x00") is None
        assert sniff_image_meta(b"\xff\xd8\xff\xe0tr") is None  # no SOF
        assert sniff_image_meta(b"P6\nnot numbers\n") is None
        assert sniff_image_meta(b"QJ1\nxx yy\n") is None
        assert sniff_image_meta(b"BM" + b"\x00" * 10) is None

    def test_stage_batch(self):
        from parsel_ray.images.codecs import sniff_image_meta  # noqa: F401
        from parsel_ray.stages.multimodal import SniffImageMeta

        t = pa.table(
            {
                "bytes": pa.array(
                    [encode_image(gradient(8, 9), "png"), b"junk", None],
                    pa.binary(),
                )
            }
        )
        out = SniffImageMeta()(t)
        assert out["sniffed_fmt"].to_pylist() == ["png", None, None]
        assert out["sniffed_w"].to_pylist() == [9, None, None]
        assert out["sniffed_h"].to_pylist() == [8, None, None]
        assert out["sniff_ok"].to_pylist() == [True, False, False]


class TestContentTypeSniff:
    def test_markup_and_json(self):
        from parsel_ray.crawl.contentsniff import detect_content_type as d

        assert d(b"  <!DOCTYPE html><html>") == "html"
        assert d(b"<HTML><body>") == "html"
        assert d(b"<?xml version='1.0'?><a/>") == "xml"
        assert d(b"<custom-root><x/></custom-root>") == "xml"
        assert d(b' {"k": 1}') == "json"
        assert d(b"[1, 2, 3]") == "json"

    def test_images_delegate_to_codec_sniff(self):
        from parsel_ray.crawl.contentsniff import detect_content_type as d

        assert d(encode_image(gradient(8, 8), "png")) == "image/png"
        assert d(encode_image(gradient(8, 8), "gif")) == "image/gif"

    def test_text_binary_fallback(self):
        from parsel_ray.crawl.contentsniff import detect_content_type as d

        assert d(b"just some plain prose, nothing else") == "text"
        assert d(b"with\x00nul") == "binary"
        assert d(bytes(range(1, 8)) * 20) == "binary"  # control-dense
        assert d(b"") == "binary"


class TestSilenceSegments:
    def test_runs_and_corrupt(self):
        from parsel_ray.stages.multimodal import (
            SilenceSegments,
            encode_wav_pcm16,
        )

        voice = np.full(512, 8000, np.int16); voice[1::2] = -8000
        sil = np.zeros(512, np.int16)
        wav = encode_wav_pcm16(np.concatenate([sil, voice, sil, voice, voice]))
        t = pa.table({"bytes": pa.array([wav, b"mp3junk"], pa.binary())})
        out = SilenceSegments(frame=256)(t)
        assert out["audio_ok"].to_pylist() == [True, False]
        assert out["n_frames"].to_pylist()[0] == 10
        assert out["n_silent_frames"].to_pylist()[0] == 4
        # voiced runs: frames 2-3 and 6-9 → 2 segments
        assert out["n_voice_segments"].to_pylist()[0] == 2

    def test_all_silent_and_all_voiced(self):
        from parsel_ray.stages.multimodal import (
            SilenceSegments,
            encode_wav_pcm16,
        )

        t = pa.table({"bytes": pa.array(
            [encode_wav_pcm16(np.zeros(1024, np.int16)),
             encode_wav_pcm16(np.full(1024, 9000, np.int16))], pa.binary())})
        out = SilenceSegments(frame=256)(t)
        assert out["n_voice_segments"].to_pylist() == [0, 1]
        assert out["n_silent_frames"].to_pylist() == [4, 0]


class TestBlurDetect:
    def test_gap_and_threshold(self):
        from parsel_ray.stages.multimodal import (
            box_blur3,
            laplacian_variance,
        )

        rng = np.random.default_rng(11)
        px = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
        sharp, blurred = laplacian_variance(px), laplacian_variance(box_blur3(px))
        assert sharp > 20000 and blurred < 3000  # ~50x separation

    def test_stage_flags_and_corrupt(self):
        from parsel_ray.stages.multimodal import BlurDetect, box_blur3

        rng = np.random.default_rng(3)
        px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        t = pa.table({
            "fmt": pa.array(["png", "png", "png"]),
            "bytes": pa.array(
                [encode_image(px, "png"),
                 encode_image(box_blur3(px), "png"), b"junk"], pa.binary()),
        })
        out = BlurDetect()(t)
        assert out["is_blurry"].to_pylist() == [False, True, None]
        assert out["decode_ok"].to_pylist() == [True, True, False]


class TestRegionCount:
    def test_shapes(self):
        from parsel_ray.stages.multimodal import count_regions

        m = np.zeros((8, 12), bool)
        assert count_regions(m) == 0
        m[1:3, 1:3] = True
        m[5:7, 1:3] = True
        m[1:7, 8:10] = True
        assert count_regions(m) == 3
        # diagonal touch is NOT 4-connected
        d = np.zeros((4, 4), bool)
        d[0, 0] = d[1, 1] = True
        assert count_regions(d) == 2
        # snake shape (worst case for propagation passes)
        s = np.zeros((5, 5), bool)
        s[0, :] = True; s[:, 4] = True; s[4, :] = True
        assert count_regions(s) == 1


class TestSniffEdgeCases:
    def test_progressive_sof2_and_topdown_bmp(self):
        from parsel_ray.images.codecs import sniff_image_meta

        # hand-built SOF2 (progressive) header after an APP0 segment
        sof2 = (b"\xff\xd8"                       # SOI
                b"\xff\xe0" + struct.pack(">H", 4) + b"JF"   # APP0
                + b"\xff\xc2" + struct.pack(">H", 11)        # SOF2
                + bytes([8]) + struct.pack(">HH", 31, 47)    # h=31 w=47
                + bytes([3, 0, 0x11, 0]))
        assert sniff_image_meta(sof2) == ("jpeg", 47, 31)
        # top-down BMP: negative height sniffs as abs(h)
        hdr = (b"BM" + struct.pack("<IHHI", 54, 0, 0, 54)
               + struct.pack("<IiiHHI", 40, 13, -9, 1, 24, 0) + b"\x00" * 20)
        assert sniff_image_meta(hdr) == ("bmp", 13, 9)

    def test_jpeg_fill_bytes_between_markers(self):
        from parsel_ray.images.codecs import sniff_image_meta

        blob = encode_image(gradient(10, 11), "jpeg")
        # inject FF fill padding before the first marker segment
        spliced = blob[:2] + b"\xff\xff" + blob[2:]
        assert sniff_image_meta(spliced) == ("jpeg", 11, 10)


class TestProgressiveJpeg:
    """SOF2 progressive decode (T.81 Annex G): spectral selection,
    successive approximation (DC+AC first/refine), EOB runs — pinned
    against the baseline decoder on identical quantized coefficients."""

    @pytest.mark.parametrize("hw", [(8, 8), (16, 24), (29, 37)])
    def test_progressive_equals_baseline(self, hw):
        from parsel_ray.images.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        h, w = hw
        px = np.random.RandomState(7).randint(
            0, 256, (h, w, 3), dtype=np.uint8
        )
        base = decode_jpeg(encode_jpeg(px, quality=90))
        prog = decode_jpeg(encode_jpeg_progressive(px, quality=90))
        assert np.array_equal(prog, base)

    def test_smooth_image_eob_and_zrl_paths(self):
        from parsel_ray.images.jpeg import (
            decode_jpeg,
            encode_jpeg,
            encode_jpeg_progressive,
        )

        yy, xx = np.mgrid[0:40, 0:56]
        smooth = np.stack(
            [(xx * 4) % 256, (yy * 3) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(smooth, 85)),
            decode_jpeg(encode_jpeg(smooth, 85)),
        )

    @staticmethod
    def _gray_prog(scans, w=16, h=8, dht_extra=()):
        """Minimal 1-component SOF2 container with identity quant and a
        tiny custom Huffman table pair."""
        import struct as _s

        dc_bits = [0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        dc_vals = [0, 1, 2, 3]
        ac_bits = [0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
        ac_vals = [0x00, 0x10, 0xF0, 0x12]
        out = bytearray(b"\xFF\xD8")
        out += b"\xFF\xDB" + _s.pack(">HB", 67, 0) + bytes([1] * 64)
        out += b"\xFF\xC2" + _s.pack(">HBHHB", 11, 8, h, w, 1)
        out += _s.pack(">BBB", 1, 0x11, 0)
        for tclass, bits, vals in ((0, dc_bits, dc_vals),
                                   (1, ac_bits, ac_vals)):
            out += b"\xFF\xC4" + _s.pack(">HB", 19 + len(vals), tclass << 4)
            out += bytes(bits) + bytes(vals)
        for ss, se, ah, al, body in scans:
            out += b"\xFF\xDA" + _s.pack(">HB", 8, 1)
            out += _s.pack(">BB", 1, 0x00)
            out += _s.pack(">BBB", ss, se, (ah << 4) | al)
            out += body
        out += b"\xFF\xD9"
        return bytes(out)

    def test_eobrun_spans_blocks(self):
        from parsel_ray.images.jpeg import (
            _D,
            UNZIGZAG,
            _BitWriter,
            _build_codes,
            decode_jpeg,
        )

        dc_tab = _build_codes(
            [0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0], [0, 1, 2, 3]
        )
        ac_tab = _build_codes(
            [0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0x00, 0x10, 0xF0, 0x12],
        )
        # DC scan (Al=0): block0 dc=3, block1 dc=2 (diff -1)
        bw = _BitWriter()
        c, ln = dc_tab[2]; bw.write(c, ln); bw.write(0b11, 2)   # +3
        c, ln = dc_tab[1]; bw.write(c, ln); bw.write(0b0, 1)    # -1
        dc_body = bw.flush()
        # AC scan 1..63 (Al=0): block0 has coef k=2 → run=1, size=2,
        # value +2; then EOBRUN r=1 + 1 extension bit = EOBRUN 2 →
        # closes block0 AND skips block1 entirely
        bw = _BitWriter()
        c, ln = ac_tab[0x12]; bw.write(c, ln); bw.write(0b10, 2)
        c, ln = ac_tab[0x10]; bw.write(c, ln); bw.write(0b0, 1)
        ac_body = bw.flush()
        blob = self._gray_prog(
            [(0, 0, 0, 0, dc_body), (1, 63, 0, 0, ac_body)]
        )
        got = decode_jpeg(blob)
        # expected: two 8x8 blocks with identity quant
        z0 = np.zeros(64); z0[0] = 3; z0[2] = 2
        z1 = np.zeros(64); z1[0] = 2
        exp = np.zeros((8, 16))
        exp[:, :8] = _D.T @ z0[UNZIGZAG].reshape(8, 8) @ _D
        exp[:, 8:] = _D.T @ z1[UNZIGZAG].reshape(8, 8) @ _D
        exp = np.clip(exp + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(got[:, :, 0], exp)

    def test_progressive_420_subsampled(self):
        # hand-built 4:2:0 progressive stream: interleaved DC scan over
        # Y(2x2 blocks)+Cb+Cr, then non-interleaved AC scans per comp
        from parsel_ray.images.jpeg import (
            _BitWriter,
            _build_codes,
            _emit_ac_first,
            decode_jpeg,
            DC_LUM,
            AC_LUM,
            ZIGZAG,
        )
        import struct as _s

        rng = np.random.RandomState(5)
        ydc = [10, -4, 7, 3]
        yac = rng.randint(-3, 4, (4, 64)); yac[:, 0] = 0
        dc_tab = _build_codes(*DC_LUM)
        ac_tab = _build_codes(*AC_LUM)

        out = bytearray(b"\xFF\xD8")
        out += b"\xFF\xDB" + _s.pack(">HB", 67, 0) + bytes([1] * 64)
        out += b"\xFF\xC2" + _s.pack(">HBHHB", 17, 8, 16, 16, 3)
        out += _s.pack(">BBB", 1, 0x22, 0)   # Y 2x2
        out += _s.pack(">BBB", 2, 0x11, 0)
        out += _s.pack(">BBB", 3, 0x11, 0)
        out += b"\xFF\xC4" + _s.pack(">HB", 19 + 12, 0x00)
        out += bytes(DC_LUM[0]) + bytes(DC_LUM[1])
        out += b"\xFF\xC4" + _s.pack(">HB", 19 + len(AC_LUM[1]), 0x10)
        out += bytes(AC_LUM[0]) + bytes(AC_LUM[1])
        # interleaved DC first (Al=0): Y blocks in MCU order then Cb, Cr
        from parsel_ray.images.jpeg import _magnitude

        bw = _BitWriter()
        pred = 0
        for v in ydc:
            size, bits = _magnitude(v - pred)
            pred = v
            c, ln = dc_tab[size]; bw.write(c, ln)
            if size:
                bw.write(bits, size)
        for _ in (2, 3):  # Cb, Cr dc = 0 (diff 0)
            c, ln = dc_tab[0]; bw.write(c, ln)
        out += b"\xFF\xDA" + _s.pack(">HB", 12, 3)
        for cid in (1, 2, 3):
            out += _s.pack(">BB", cid, 0x00)
        out += _s.pack(">BBB", 0, 0, 0)
        out += bw.flush()
        # non-interleaved Y AC scan, raster order over the 2x2 grid
        bw = _BitWriter()
        for bi in range(4):
            _emit_ac_first(bw, ac_tab, yac[bi], 1, 63, 0)
        out += b"\xFF\xDA" + _s.pack(">HB", 8, 1)
        out += _s.pack(">BB", 1, 0x10) + _s.pack(">BBB", 1, 63, 0)
        out += bw.flush()
        out += b"\xFF\xD9"

        got = decode_jpeg(bytes(out))
        assert got.shape == (16, 16, 3)
        # reference: reconstruct Y plane; Cb=Cr=0 shift ⇒ grayscale RGB
        from parsel_ray.images.jpeg import _D, UNZIGZAG

        yplane = np.zeros((16, 16))
        for bi, (by, bx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
            z = yac[bi].astype(float).copy()
            z[0] = ydc[bi]
            blk = _D.T @ z[UNZIGZAG].reshape(8, 8) @ _D
            yplane[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
        exp = np.clip(yplane + 128, 0, 255).astype(np.uint8)
        assert np.array_equal(got[:, :, 1], exp)  # G == Y when Cb=Cr=128

    def test_refinement_size_violation_raises(self):
        from parsel_ray.images.jpeg import _BitWriter, _build_codes, decode_jpeg

        ac_tab = _build_codes(
            [0, 0, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            [0x00, 0x10, 0xF0, 0x12],
        )
        bw = _BitWriter()
        c, ln = ac_tab[0x12]  # size 2 inside a refinement scan: invalid
        bw.write(c, ln); bw.write(0b10, 2)
        blob = self._gray_prog([(1, 63, 1, 0, bw.flush())])
        with pytest.raises(ValueError):
            decode_jpeg(blob)

    def test_truncated_progressive_raises(self):
        from parsel_ray.images.jpeg import encode_jpeg_progressive, decode_jpeg

        px = np.random.RandomState(3).randint(
            0, 256, (16, 16, 3), dtype=np.uint8
        )
        blob = encode_jpeg_progressive(px, 90)
        with pytest.raises(ValueError):
            decode_jpeg(blob[: int(len(blob) * 0.6)])

    def test_decode_stage_accepts_progressive(self, ray_session):
        import ray.data as rd

        from parsel_ray.images.jpeg import encode_jpeg_progressive
        from parsel_ray.stages.multimodal import DecodeJpeg

        px = np.random.RandomState(1).randint(
            0, 256, (16, 16, 3), dtype=np.uint8
        )
        t = pa.table(
            {
                "image_id": pa.array([1], pa.int64()),
                "bytes": pa.array([encode_jpeg_progressive(px, 90)],
                                  pa.binary()),
            }
        )
        out = rd.from_arrow(t).map_batches(
            DecodeJpeg(), batch_format="pyarrow"
        ).to_pandas()
        assert len(out) == 1


class TestTrainingBatchPrep:
    """pipelines/image_prep.training_batch_prep — AR buckets → packed
    batches → batch-contiguous WebDataset tar shards."""

    def test_funnel_and_shard_layout(self, ray_session):
        import os
        import tarfile

        from parsel_ray.pipelines.image_prep import training_batch_prep
        from parsel_ray.pipelines.queries import _demo_crawl_cfg

        funnel, shard_dir = training_batch_prep(_demo_crawl_cfg(),
                                                batch_size=8)
        rows = dict(zip(
            funnel["stage"].to_pylist(), funnel["rows"].to_pylist()
        ))
        assert rows["crawled"] == rows["packed"] == rows["tar_samples"] > 0
        assert rows["tar_shards"] >= 1
        # batch contiguity: within every tar, the (bucket, batch) prefix
        # of sample keys forms contiguous runs, and a batch never spans
        # two shards
        seen_batches = set()
        total = 0
        for f in sorted(os.listdir(shard_dir)):
            if not f.endswith(".tar"):
                continue
            with tarfile.open(os.path.join(shard_dir, f)) as tf:
                names = [m.name for m in tf.getmembers() if m.isfile()]
            keys = []
            for n in names:
                k = n.rsplit(".", 1)[0]
                if not keys or keys[-1] != k:
                    keys.append(k)
            total += len(keys)
            prefixes = ["/".join(k.split("/")[:2]) for k in keys]
            runs = []
            for p in prefixes:
                if not runs or runs[-1] != p:
                    runs.append(p)
            assert len(runs) == len(set(runs)), f"split batch in {f}"
            for p in set(runs):
                assert p not in seen_batches, f"batch {p} spans shards"
                seen_batches.add(p)
        assert total == rows["tar_samples"]


class TestExifOrientation:
    """images/exif.py: APP1 parse/write round-trip, the 8 display
    transforms, corrupt-EXIF tolerance, and the NormalizeOrientation
    stage contract."""

    @staticmethod
    def _jpeg(seed=3):
        rng = np.random.RandomState(seed)
        from parsel_ray.images.jpeg import encode_jpeg

        yy, xx = np.mgrid[0:24, 0:32]
        px = np.stack([(xx * 8) % 256, (yy * 11) % 256, (xx + yy) % 256],
                      axis=-1).astype(np.uint8)
        return encode_jpeg(px, quality=90)

    @pytest.mark.parametrize("o", range(1, 9))
    def test_write_parse_roundtrip(self, o):
        from parsel_ray.images.exif import (
            parse_exif_orientation, write_exif_orientation)
        from parsel_ray.images.jpeg import decode_jpeg

        base = self._jpeg()
        tagged = write_exif_orientation(base, o)
        assert parse_exif_orientation(tagged) == o
        # the added APP1 never disturbs the entropy stream
        assert (decode_jpeg(tagged) == decode_jpeg(base)).all()
        # in-place rewrite path: tag again with a different value
        retag = write_exif_orientation(tagged, 8 if o != 8 else 1)
        assert parse_exif_orientation(retag) == (8 if o != 8 else 1)
        assert len(retag) == len(tagged)

    def test_untagged_and_corrupt(self):
        from parsel_ray.images.exif import parse_exif_orientation

        assert parse_exif_orientation(self._jpeg()) is None
        assert parse_exif_orientation(b"") is None
        assert parse_exif_orientation(b"\xff\xd8\xff\xe1\x00\x04Ex") is None
        # APP1 present but truncated TIFF
        bad = b"\xff\xd8\xff\xe1\x00\x0aExif\x00\x00II"
        assert parse_exif_orientation(bad) is None

    def test_strip(self):
        from parsel_ray.images.exif import (
            parse_exif_orientation, strip_exif_orientation,
            write_exif_orientation)

        tagged = write_exif_orientation(self._jpeg(), 6)
        assert parse_exif_orientation(strip_exif_orientation(tagged)) == 1
        plain = self._jpeg()
        assert strip_exif_orientation(plain) is plain

    def test_transforms_exact(self):
        from parsel_ray.images.exif import apply_exif_orientation

        a = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
        want = {
            1: a,
            2: a[:, ::-1],
            3: a[::-1, ::-1],
            4: a[::-1, :],
            5: a.transpose(1, 0, 2),
            6: a.transpose(1, 0, 2)[:, ::-1],
            7: a.transpose(1, 0, 2)[::-1, ::-1],
            8: a.transpose(1, 0, 2)[::-1, :],
        }
        for o, w in want.items():
            got = apply_exif_orientation(a, o)
            assert (got == w).all(), o
            if o >= 5:
                assert got.shape == (3, 2, 3)
        # inverse pairs: rotating CW then CCW is identity, and the
        # mirror/transpose orientations are involutions
        assert (
            apply_exif_orientation(apply_exif_orientation(a, 6), 8) == a
        ).all()
        for o in (2, 3, 4, 5, 7):
            assert (
                apply_exif_orientation(apply_exif_orientation(a, o), o) == a
            ).all(), o

    def test_stage(self, ray_session):
        from parsel_ray.images.exif import write_exif_orientation
        from parsel_ray.stages.multimodal import NormalizeOrientation

        base = self._jpeg()
        t = pa.table(
            {
                "bytes": pa.array(
                    [base, write_exif_orientation(base, 6), b"junk"],
                    pa.binary(),
                )
            }
        )
        out = NormalizeOrientation()(t)
        assert out["decode_ok"].to_pylist() == [True, True, False]
        assert out["exif_orientation"].to_pylist() == [1, 6, None]
        # orientation 6 swaps the 32x24 image to 24x32
        assert out["oriented_w"].to_pylist() == [32, 24, None]
        assert out["oriented_h"].to_pylist() == [24, 32, None]


class TestOrbitPhash:
    """images/codecs.py::phash_orbit64 — dihedral-orbit-canonical hash."""

    def test_orbit_invariance(self):
        from parsel_ray.images.codecs import phash64, phash_orbit64
        from parsel_ray.images.exif import apply_exif_orientation

        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
        base = phash_orbit64(px)
        scattered = set()
        for o in range(1, 9):
            q = apply_exif_orientation(px, o)
            assert phash_orbit64(q) == base, o
            scattered.add(phash64(q))
        # the single-orientation hash really does scatter the orbit
        # (non-multiple-of-8 dims: flips move block boundaries)
        assert len(scattered) > 1

    def test_distinct_images_distinct_hash(self):
        from parsel_ray.images.codecs import phash_orbit64

        rng = np.random.RandomState(9)
        hashes = {
            phash_orbit64(rng.randint(0, 256, (16, 16, 3)).astype(np.uint8))
            for _ in range(64)
        }
        assert len(hashes) == 64


class TestOrbitHammingNearDup:
    """functions/dedup.py::orbit_hamming_near_dup_pairs — lossy rotated
    duplicates recovered at min-orbit Hamming <= 6; recall pinned on
    planted perturbation+rotation pairs, precision on the absence of
    cross-image pairs."""

    def test_planted_pairs(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import orbit_hamming_near_dup_pairs
        from parsel_ray.images.codecs import phash64
        from parsel_ray.images.exif import apply_exif_orientation

        def orbit(px):
            return [phash64(apply_exif_orientation(px, o))
                    for o in range(1, 9)]

        rows, want = [], set()
        for i in range(50):
            rng = np.random.RandomState(i)
            px = rng.randint(0, 256, (16 + i % 13, 16 + i % 19, 3)) \
                .astype(np.uint8)
            rows.append((i, orbit(px)))
            if i % 5 == 0:
                q = apply_exif_orientation(px, 2 + i % 7).astype(np.int16)
                mask = rng.rand(*q.shape) < 0.5
                q = np.clip(q + mask * rng.randint(-32, 33, q.shape),
                            0, 255).astype(np.uint8)
                rows.append((i + 1000, orbit(q)))
                want.add((i, i + 1000))
        ds = rd.from_arrow(
            pa.table(
                {
                    "img_id": pa.array([r[0] for r in rows], pa.int64()),
                    "hashes": pa.array([r[1] for r in rows],
                                       pa.list_(pa.int64())),
                }
            )
        ).repartition(4)
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in orbit_hamming_near_dup_pairs(
                ds, "hashes", "img_id", num_partitions=5
            ).take_all()
        }
        assert set(got) == want
        assert all(0 <= d <= 6 for d in got.values())

    def test_parameter_validation(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import orbit_hamming_near_dup_pairs

        ds = rd.from_arrow(
            pa.table({"img_id": pa.array([1], pa.int64()),
                      "hashes": pa.array([[0] * 8], pa.list_(pa.int64()))})
        )
        with pytest.raises(ValueError, match="divide"):
            orbit_hamming_near_dup_pairs(ds, "hashes", "img_id", n_bands=7)
        with pytest.raises(ValueError, match="recall"):
            orbit_hamming_near_dup_pairs(
                ds, "hashes", "img_id", n_bands=4, max_hamming=6
            )


class TestSsim:
    """images/codecs.py::ssim — Wang et al. structural similarity with a
    uniform window: identity = 1, lossy re-encode ~1, unrelated /
    histogram-identical-but-shuffled content ~0."""

    @staticmethod
    def _img():
        yy, xx = np.mgrid[0:48, 0:64]
        return np.stack(
            [(xx * 4) % 256, (yy * 4) % 256, ((xx + yy) * 2) % 256], -1
        ).astype(np.uint8)

    def test_identity_and_symmetry(self):
        from parsel_ray.images.codecs import ssim

        px = self._img()
        assert ssim(px, px) == 1.0
        rng = np.random.RandomState(2)
        other = rng.randint(0, 256, px.shape).astype(np.uint8)
        assert abs(ssim(px, other) - ssim(other, px)) < 1e-12

    def test_lossy_high_unrelated_low(self):
        from parsel_ray.images.codecs import ssim
        from parsel_ray.images.jpeg import decode_jpeg, encode_jpeg

        px = self._img()
        assert ssim(px, decode_jpeg(encode_jpeg(px, 85))) > 0.99
        rng = np.random.RandomState(3)
        flat = px.reshape(-1, 3).copy()
        rng.shuffle(flat)  # same histogram, destroyed structure
        assert ssim(px, flat.reshape(px.shape)) < 0.1

    def test_tiny_image_and_dim_mismatch(self):
        from parsel_ray.images.codecs import ssim

        px = self._img()
        assert ssim(px[:4, :4], px[:4, :4]) == 1.0
        with pytest.raises(ValueError, match="equal dims"):
            ssim(px, px[:10, :10])

    def test_box_mean_matches_naive(self):
        from parsel_ray.images.codecs import _box_mean

        rng = np.random.RandomState(4)
        x = rng.rand(13, 17)
        got = _box_mean(x, 5)
        want = np.array(
            [
                [x[i : i + 5, j : j + 5].mean() for j in range(13)]
                for i in range(9)
            ]
        )
        assert np.allclose(got, want)


class TestReviewRegressionPins:
    """Round-3 adversarial-review fixes pinned."""

    def test_exact_dedup_keeps_null_fingerprints(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import exact_dedup_rows

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                "fingerprint": pa.array(["a", "a", None, None, "b"]),
            }
        )
        out = sorted(
            r["doc_id"]
            for r in exact_dedup_rows(
                rd.from_arrow(t), num_partitions=4
            ).take_all()
        )
        # null fingerprints carry no equality evidence: rows 3 and 4
        # both survive (the bug deleted them outright)
        assert out == [1, 3, 4, 5]

    def test_orbit_hamming_rejects_null_hash_element(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import orbit_hamming_near_dup_pairs

        ds = rd.from_arrow(
            pa.table(
                {
                    "img_id": pa.array([1, 2], pa.int64()),
                    "hashes": pa.array(
                        [[1, 2, 3, 4, 5, 6, 7, None], [0] * 8],
                        pa.list_(pa.int64()),
                    ),
                }
            )
        )
        with pytest.raises(Exception, match="non-null"):
            orbit_hamming_near_dup_pairs(ds, "hashes", "img_id").take_all()

    def test_hamming_hot_group_guard(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import hamming_near_dup_pairs

        ds = rd.from_arrow(
            pa.table(
                {
                    "id": pa.array(range(40), pa.int64()),
                    "h": pa.array([0] * 40, pa.int64()),  # degenerate
                }
            )
        )
        with pytest.raises(Exception, match="max_group"):
            hamming_near_dup_pairs(
                ds, "h", "id", max_group=10
            ).take_all()

    def test_hash_strs64_bit_identical(self):
        from parsel_ray.functions.dedup import hash_str64, hash_strs64

        toks = ["hello", "", "a", "naïve", "x" * 50, "日本語"]
        assert [int(hash_str64(t)) for t in toks] == [
            int(h) for h in hash_strs64(toks)
        ]


class TestStageRobustnessPins:
    """Wave-4 review fixes: corrupt/null cells flag rows instead of
    failing batches; sub-8px phash; >4KB-APP1 JPEG sniff."""

    def test_audio_stages_tolerate_garbage(self, ray_session):
        import struct

        from parsel_ray.stages.multimodal import (
            AudioFeatures, AudioSpectral, SilenceSegments)

        def wav(fmt_code=1, n_ch=1, body=b"\x00\x00" * 8):
            fmt = struct.pack("<HHIIHH", fmt_code, n_ch, 8000,
                              16000, 2, 16)
            return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
                    + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                    + b"data" + struct.pack("<I", len(body)) + body)

        rows = pa.table(
            {
                "bytes": pa.array(
                    [wav(), wav(fmt_code=3), wav(n_ch=0), None,
                     # >= 44 bytes (else the headerless-raw-PCM fallback
                     # applies) with a truncated 2-byte fmt chunk
                     b"RIFF\x28\x00\x00\x00WAVEfmt \x02\x00\x00\x00ab"
                     + b"\x00" * 24],
                    pa.binary(),
                )
            }
        )
        for cls, okcol in ((AudioFeatures, "audio_ok"),
                           (AudioSpectral, "spectral_ok"),
                           (SilenceSegments, "audio_ok")):
            out = cls()(rows)
            oks = out[okcol].to_pylist()
            assert oks[0] is True, cls.__name__
            assert oks[1:] == [False, False, False, False], cls.__name__

    def test_resize_and_augment_flag_corrupt_rows(self, ray_session):
        from parsel_ray.images.codecs import encode_image
        from parsel_ray.stages.multimodal import AugmentImages, ResizeImage

        px = np.zeros((16, 16, 3), np.uint8)
        t = pa.table(
            {
                "image_id": pa.array(["a", "b"]),
                "bytes": pa.array([encode_image(px, "png"), b"corrupt"],
                                  pa.binary()),
                "fmt": pa.array(["png", "png"]),
            }
        )
        r = ResizeImage(8, 8)(t)
        assert r["resize_ok"].to_pylist() == [True, False]
        a = AugmentImages()(t)
        assert a["aug_ok"].to_pylist()[1] is False

    def test_augment_gif_certifies(self, ray_session):
        from parsel_ray.images.codecs import encode_image
        from parsel_ray.stages.multimodal import AugmentImages

        rng = np.random.RandomState(6)
        px = rng.randint(0, 256, (24, 24, 3)).astype(np.uint8)
        t = pa.table(
            {
                "image_id": pa.array(["g1"]),
                "bytes": pa.array([encode_image(px, "gif")], pa.binary()),
                "fmt": pa.array(["gif"]),
            }
        )
        assert AugmentImages()(t)["aug_ok"].to_pylist() == [True]

    def test_phash_tiny_images(self):
        from parsel_ray.images.codecs import phash64

        rng = np.random.RandomState(8)
        a = rng.randint(0, 256, (1, 1, 3)).astype(np.uint8)
        b = rng.randint(0, 256, (5, 3, 3)).astype(np.uint8)
        c = rng.randint(0, 256, (5, 3, 3)).astype(np.uint8)
        assert phash64(a) == phash64(a)  # deterministic, no warning/零 hash
        assert phash64(b) != phash64(c)  # tiny images don't all collide

    def test_jpeg_sniff_big_app1(self):
        from parsel_ray.images.codecs import sniff_image_meta
        from parsel_ray.images.jpeg import encode_jpeg

        base = encode_jpeg(np.zeros((20, 30, 3), np.uint8), 90)
        import struct

        seg = b"\xff\xe1" + struct.pack(">H", 6002) + b"Exif\x00\x00" + b"x" * 5994
        fat = base[:2] + seg + base[2:]
        assert sniff_image_meta(fat) == ("jpeg", 30, 20)


class TestReviewPinsSession4:
    """Pins for the round-3 pipelines/stages/images review findings,
    each reproduced against the pre-fix tree."""

    def test_gif_truncated_image_descriptor_is_valueerror(self):
        # a cut right after the 0x2C descriptor byte used to escape as
        # struct.error, breaking the documented ValueError contract
        from parsel_ray.images.gif import encode_gif, decode_gif, quantize_332

        blob = encode_gif(quantize_332(gradient(16, 16)))
        tbl_size = 2 << (blob[10] & 7)
        pos = 13 + tbl_size * 3
        while blob[pos] == 0x21:  # skip extensions to the descriptor
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        assert blob[pos] == 0x2C
        for cut in (pos + 1, pos + 5, pos + 9):
            with pytest.raises(ValueError):
                decode_gif(blob[:cut])

    def test_sobel_edge_density_bounded(self):
        from parsel_ray.stages.multimodal import sobel_edge_density

        # anti-diagonal step edge: gx = gy = 765 at the lone interior
        # pixel; the old 4*255 normalizer read 1.06 here
        ij = np.add.outer(np.arange(3), np.arange(3))
        img = np.where(ij >= 2, 255, 0).astype(np.uint8)
        img = np.repeat(img[:, :, None], 3, axis=2)
        d = sobel_edge_density(img)
        assert 0.0 < d <= 1.0
        # exhaustive bound check over random tiny images
        rng = np.random.RandomState(3)
        for _ in range(20):
            r = rng.randint(0, 256, (4, 4, 3)).astype(np.uint8)
            assert 0.0 <= sobel_edge_density(r) <= 1.0

    def test_shot_boundaries_single_container_walk(self):
        # behavior pin after the O(n^2) read_frame loop was replaced
        # with one frame_offsets walk
        from parsel_ray.images.video import encode_video
        from parsel_ray.stages.multimodal import DetectShotBoundaries
        import pyarrow as pa

        rng = np.random.RandomState(5)
        a = rng.randint(0, 40, (8, 8, 3)).astype(np.uint8)
        b = 255 - a
        frames = [a, a, b, b, b, a]
        blob = encode_video(frames, fmt="png")
        t = pa.table({"bytes": pa.array([blob], pa.binary())})
        out = DetectShotBoundaries()(t)
        assert out["video_ok"].to_pylist() == [True]
        assert out["n_frames"].to_pylist() == [8 if len(frames) == 8 else 6]
        assert out["boundaries"].to_pylist() == [[2, 5]]
        # corrupt container still flags, not raises
        bad = DetectShotBoundaries()(
            pa.table({"bytes": pa.array([b"junk"], pa.binary())})
        )
        assert bad["video_ok"].to_pylist() == [False]
