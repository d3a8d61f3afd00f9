"""Per-row image verification (crawl operator N8): decoded-pixel
comparison against the reference generator — exact allclose for lossless
formats, PSNR ≥ 40 dB for lossy — plus caption equality and phash
recomputation (BASELINE.json input_hint invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..images.codecs import LOSSLESS, decode_image, phash64, psnr
from .pagestore import PageStore, StoreConfig

PSNR_MIN = 40.0


class VerifyImages:
    """map_batches kernel over corpus rows → per-row verdict columns
    (ok_pixels, ok_caption, ok_phash, psnr_db).  Store rebuilt lazily per
    worker from the picklable config."""

    def __init__(self, store_cfg: StoreConfig) -> None:
        self.cfg = store_cfg
        self._store = None

    def __getstate__(self):
        return self.cfg

    def __setstate__(self, cfg):
        self.cfg = cfg
        self._store = None

    def _expected_caption(self, image_id: str) -> "str | None":
        _, h, k, j = image_id.split("-")
        figs = self._store.figures_of(int(h), int(k))
        j = int(j)
        return figs[j]["caption"] if j < len(figs) else None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._store is None:
            self._store = PageStore(self.cfg)
        store = self._store
        ok_px, ok_cap, ok_ph, psnrs = [], [], [], []
        for row in t.to_pylist():
            ref = store.image_pixels(row["image_id"])
            try:
                got = decode_image(row["bytes"], row["fmt"])
            except Exception:
                ok_px.append(False)
                ok_cap.append(False)
                ok_ph.append(False)
                psnrs.append(0.0)
                continue
            if got.shape != ref.shape:
                ok_px.append(False)
                psnrs.append(0.0)
            elif LOSSLESS[row["fmt"]]:
                same = bool(np.array_equal(got, ref))
                ok_px.append(same)
                psnrs.append(float("inf") if same else psnr(got, ref))
            else:
                p = psnr(got, ref)
                ok_px.append(p >= PSNR_MIN)
                psnrs.append(p)
            ok_cap.append(row["caption"] == self._expected_caption(row["image_id"]))
            ok_ph.append(row["phash"] == phash64(ref))
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "ok_pixels": pa.array(ok_px, pa.bool_()),
                "ok_caption": pa.array(ok_cap, pa.bool_()),
                "ok_phash": pa.array(ok_ph, pa.bool_()),
                "psnr_db": pa.array(
                    [1e9 if p == float("inf") else p for p in psnrs], pa.float64()
                ),
            }
        )
