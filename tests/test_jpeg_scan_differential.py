"""Differential pin for the round-5 vectorized JPEG entropy coder:
_encode_scan_vec must be byte-identical to the reference scalar loop
(_encode_scan_loop, the pre-round-5 implementation kept verbatim) on
real corpus images AND adversarial coefficient streams — long zero
runs, maximal ZRL chains, all-zero blocks, trailing coefficients,
legal-range extremes.  encode_jpeg routes between the two by nonzero
count, so both paths stay live and both must agree."""

from __future__ import annotations

import numpy as np
import pytest

from parsel_ray.images import jpeg as J
from parsel_ray.images.jpeg import (
    ZIGZAG,
    _encode_scan_loop,
    _encode_scan_vec,
    decode_jpeg,
    encode_jpeg,
)


def _zz_of(px: np.ndarray, quality: int = 90):
    lq, cq = J._quality_tables(quality)
    ycc = J._rgb_to_ycbcr(np.ascontiguousarray(px, np.uint8)) - 128.0
    comp = []
    for ci in range(3):
        blocks = J._blocks_of(ycc[..., ci])
        coef = np.einsum("ux,nxy,vy->nuv", J._D, blocks, J._D)
        comp.append(
            np.round(coef / (lq if ci == 0 else cq)).astype(np.int64)
        )
    return [c.reshape(-1, 64)[:, ZIGZAG] for c in comp]


class TestScanDifferential:
    def test_real_corpus_images(self):
        from parsel_ray.pipelines.queries import _doc_image

        for i in range(120):
            zz = _zz_of(_doc_image(i))
            assert _encode_scan_loop(zz) == _encode_scan_vec(zz), i

    def test_adversarial_streams(self):
        rng = np.random.RandomState(0)
        for t in range(400):
            n = rng.randint(1, 6)
            zz = []
            for _ in range(3):
                mag = rng.randint(-1023, 1024, (n, 64))
                mask = rng.random((n, 64)) < rng.choice([0.02, 0.2, 0.6])
                m = np.where(mask, mag, 0)
                if t % 3 == 0:
                    m[:, 1:50] = 0  # long runs -> ZRL chains
                if t % 5 == 0:
                    m[:, :] = 0  # all-zero blocks -> immediate EOB
                if t % 7 == 0:
                    m[:, 63] = 7  # full-length block, no EOB
                if t % 11 == 0:
                    m[:, 1:63] = 0
                    m[:, 63] = -1  # maximal ZRL chain (run 62)
                zz.append(m.astype(np.int64))
            assert _encode_scan_loop(zz) == _encode_scan_vec(zz), t

    def test_dense_noise_images_roundtrip_both_paths(self):
        rng = np.random.RandomState(7)
        # dense noise routes to the vectorized coder; a small smooth
        # gradient routes to the loop — both must decode correctly
        noisy = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        ys, xs = np.mgrid[0:16, 0:16]
        smooth = np.stack([(ys * 4 + c * 10) % 256 for c in range(3)],
                          axis=2).astype(np.uint8)
        for px in (noisy, smooth):
            data = encode_jpeg(px, quality=90)
            out = decode_jpeg(data)
            assert out.shape == px.shape

    @pytest.mark.parametrize("quality", [10, 50, 95])
    def test_quality_sweep(self, quality):
        from parsel_ray.pipelines.queries import _doc_image

        for i in range(0, 60, 7):
            zz = _zz_of(_doc_image(i), quality)
            assert _encode_scan_loop(zz) == _encode_scan_vec(zz)

    def test_hypothesis_coefficient_streams(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st
        from hypothesis.extra.numpy import arrays

        coeff = st.integers(min_value=-1023, max_value=1023)

        @settings(max_examples=150, deadline=None)
        @given(
            st.integers(1, 4),
            st.data(),
        )
        def run(n, data):
            zz = []
            for _ in range(3):
                m = data.draw(arrays(np.int64, (n, 64), elements=coeff))
                # bias toward sparsity so EOB/ZRL paths get exercised
                keep = data.draw(
                    arrays(np.bool_, (n, 64),
                           elements=st.booleans())
                )
                zz.append(np.where(keep, m, 0).astype(np.int64))
            assert _encode_scan_loop(zz) == _encode_scan_vec(zz)

        run()
