"""DuckDB-differential battery for the range-partitioned rank operators.

The bound-picking histogram moved to fixed-width float bins (round 3);
these sweeps pin the shapes that could break it: extreme magnitudes
(float64 binning precision at |v| ~ 2^60), all-equal primaries (hi==lo
degenerate), two-value domains, zipf skew (one bin holds ~half the
rows), negative floats, and descending order — each against DuckDB's
``row_number() OVER (ORDER BY ...)`` with a unique tie-break.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.functions.sort import global_row_number, grouped_row_number


def _dist(kind: str, n: int, rng) -> np.ndarray:
    if kind == "uniform":
        return rng.randint(-500, 500, size=n).astype(np.int64)
    if kind == "huge":
        return (rng.randint(-(1 << 30), 1 << 30, size=n).astype(np.int64)
                << 30)
    if kind == "all_equal":
        return np.full(n, 42, np.int64)
    if kind == "two_values":
        return rng.choice(np.array([-7, 13], np.int64), size=n)
    if kind == "zipf":
        v = rng.zipf(1.3, size=n).astype(np.int64)
        return np.minimum(v, 10**6)
    if kind == "neg_float":
        return (rng.randn(n) * 100.0).round(3)
    raise AssertionError(kind)


DISTS = ["uniform", "huge", "all_equal", "two_values", "zipf", "neg_float"]


class TestGlobalRowNumberVsDuckdb:
    @pytest.mark.parametrize("kind", DISTS)
    @pytest.mark.parametrize("asc", [True, False])
    def test_matches_oracle(self, ray_session, kind, asc):
        rng = np.random.RandomState(DISTS.index(kind) * 7919 + 11)
        n = 500
        df = pd.DataFrame({"v": _dist(kind, n, rng),
                           "id": np.arange(n, dtype=np.int64)})
        got = global_row_number(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            ["v", "id"], [asc, True], out_col="rk", num_partitions=8,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT v, id, row_number() OVER "
            f"(ORDER BY v {'ASC' if asc else 'DESC'}, id) AS rk FROM t"
        ).df()
        con.close()
        got = got.sort_values("id").reset_index(drop=True)
        want = want.sort_values("id").reset_index(drop=True)
        assert got["rk"].astype(np.int64).tolist() == \
            want["rk"].astype(np.int64).tolist()


class TestGroupedRowNumberVsDuckdb:
    @pytest.mark.parametrize("kind", ["uniform", "huge", "zipf"])
    def test_matches_oracle(self, ray_session, kind):
        rng = np.random.RandomState(DISTS.index(kind) * 7919 + 11)
        n = 600
        df = pd.DataFrame(
            {
                # hot group: 'a' holds ~70% of rows
                "g": np.where(rng.rand(n) < 0.7, "a",
                              rng.choice(list("bcd"), size=n)),
                "v": _dist(kind, n, rng),
                "id": np.arange(n, dtype=np.int64),
            }
        )
        got = grouped_row_number(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            "g", ["v", "id"], [True, True], out_col="rk", num_partitions=8,
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT g, v, id, row_number() OVER "
            "(PARTITION BY g ORDER BY v, id) AS rk FROM t"
        ).df()
        con.close()
        got = got.sort_values("id").reset_index(drop=True)
        want = want.sort_values("id").reset_index(drop=True)
        assert got["rk"].astype(np.int64).tolist() == \
            want["rk"].astype(np.int64).tolist()
