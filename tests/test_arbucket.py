"""Aspect-ratio bucketing, per-bucket packing, grouped row_number."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from parsel_ray.functions.arbucket import (
    DEFAULT_BUCKETS,
    assign_ar_buckets,
    pack_bucket_batches,
)
from parsel_ray.functions.sort import grouped_row_number


def _img_table(n=300, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table(
        {
            "img_id": pa.array(np.arange(n), pa.int64()),
            "w": pa.array(rng.randint(64, 2048, n), pa.int64()),
            "h": pa.array(rng.randint(64, 2048, n), pa.int64()),
        }
    )


class TestAssign:
    def test_nearest_ratio_and_tiebreak(self, ray_session):
        t = pa.table(
            {
                "img_id": pa.array([0, 1, 2], pa.int64()),
                "w": pa.array([1000, 1290, 640], pa.int64()),
                "h": pa.array([1000, 770, 1530], pa.int64()),
            }
        )
        out = (
            assign_ar_buckets(rd.from_arrow(t), "w", "h")
            .to_pandas()
            .set_index("img_id")
        )
        assert out.loc[0, "bucket_id"] == 0  # square
        assert (out.loc[1, "bucket_w"], out.loc[1, "bucket_h"]) == (1280, 768)
        assert (out.loc[2, "bucket_w"], out.loc[2, "bucket_h"]) == (640, 1536)

    def test_matches_reference_argmin(self, ray_session):
        t = _img_table()
        out = (
            assign_ar_buckets(rd.from_arrow(t), "w", "h")
            .to_pandas()
            .sort_values("img_id")
        )
        ratios = np.array([bw / bh for bw, bh in DEFAULT_BUCKETS])
        w = t["w"].to_numpy().astype(float)
        h = t["h"].to_numpy().astype(float)
        want = np.argmin(np.abs((w / h)[:, None] - ratios[None, :]), axis=1)
        assert (out["bucket_id"].to_numpy() == want).all()


class TestPack:
    def test_batches_homogeneous_and_dense(self, ray_session):
        ds = assign_ar_buckets(
            rd.from_arrow(_img_table(500)).repartition(8), "w", "h"
        )
        out = pack_bucket_batches(
            ds, order_by=["img_id"], ascending=[True], batch_size=32
        ).to_pandas()
        assert len(out) == 500
        for (bid, bidx), g in out.groupby(["bucket_id", "batch_idx"]):
            n_batches = out[out.bucket_id == bid]["batch_idx"].max() + 1
            # full batches except possibly the last per bucket
            if bidx < n_batches - 1:
                assert len(g) == 32
            assert sorted(g["slot"]) == list(range(len(g)))
        # deterministic: slot order within a bucket follows img_id order
        for bid, g in out.groupby("bucket_id"):
            g = g.sort_values("img_id")
            ranks = g["batch_idx"].to_numpy() * 32 + g["slot"].to_numpy()
            assert (ranks == np.arange(len(g))).all()


class TestGroupedRowNumber:
    def test_matches_pandas_rank(self, ray_session):
        rng = np.random.RandomState(3)
        t = pa.table(
            {
                "g": pa.array(rng.randint(0, 4, 400), pa.int64()),
                "k": pa.array(rng.permutation(400), pa.int64()),
            }
        )
        out = grouped_row_number(
            rd.from_arrow(t).repartition(8), "g", ["k"], [True],
            out_col="rn", num_partitions=4,
        ).to_pandas()
        want = (
            out.sort_values("k").groupby("g").cumcount() + 1
        )
        got = out.sort_values("k")["rn"]
        assert (got.to_numpy() == want.to_numpy()).all()

    def test_descending(self, ray_session):
        t = pa.table(
            {
                "g": pa.array([0, 0, 0, 1, 1], pa.int64()),
                "k": pa.array([10, 20, 30, 5, 7], pa.int64()),
            }
        )
        out = grouped_row_number(
            rd.from_arrow(t), "g", ["k"], [False], out_col="rn",
            num_partitions=2,
        ).to_pandas().sort_values(["g", "k"])
        assert list(out["rn"]) == [3, 2, 1, 2, 1]
