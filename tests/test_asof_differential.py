"""DuckDB-differential battery for the as-of and range-count joins.

Seeded random (key, time) tables sweep the kernel's edges: keys present
on only one side, rows with no match (left_time before every right
time), dense equal-time ties on the LEFT (right stays unique per
key+time, the operator's documented contract), negative deltas, and
empty sides.  DuckDB's native ASOF JOIN is the oracle.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.functions.asof import asof_join, range_join_count


def _mk(seed: int, n_left: int, n_right: int, key_space: int):
    rng = np.random.RandomState(seed)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, key_space, size=n_left).astype(np.int64),
            "lt": rng.randint(0, 1000, size=n_left).astype(np.int64),
            "lid": np.arange(n_left, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, key_space, size=n_right).astype(np.int64),
            "rt": rng.randint(0, 1000, size=n_right).astype(np.int64),
            "rv": rng.randint(0, 10**6, size=n_right).astype(np.int64),
        }
    ).drop_duplicates(["k", "rt"])  # operator contract: unique (key, time)
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].astype("Float64")  # nulls from no-match rows
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


CASES = [(s, nl, nr, ks) for s, (nl, nr, ks) in enumerate(
    [
        (60, 60, 8),      # plenty of matches
        (40, 10, 25),     # sparse right: many no-match rows
        (10, 60, 3),      # hot keys, dense right timelines
        (30, 0, 5),       # empty right: all-null appends
        (25, 25, 1),      # single key: one giant segment
    ]
)]


class TestAsofJoinVsDuckdb:
    @pytest.mark.parametrize("seed,n_left,n_right,key_space", CASES)
    def test_matches_oracle(self, ray_session, seed, n_left, n_right,
                            key_space):
        left, right = _mk(seed, n_left, n_right, key_space)
        got = asof_join(
            rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            on="k", left_time="lt", right_time="rt",
            right_cols=["rt", "rv"], buckets=8,
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT l.k, l.lt, l.lid, r.rt, r.rv "
            "FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.lt >= r.rt"
        ).df()
        con.close()
        assert len(got) == len(left)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

    @pytest.mark.parametrize("seed,n_left,n_right,key_space", CASES[:3])
    @pytest.mark.parametrize("lo,hi", [(-50, 50), (0, 100), (-200, -100)])
    def test_range_count_matches_oracle(self, ray_session, seed, n_left,
                                        n_right, key_space, lo, hi):
        left, right = _mk(seed, n_left, n_right, key_space)
        got = range_join_count(
            rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            on="k", left_time="lt", right_time="rt",
            delta_lo=lo, delta_hi=hi, buckets=8,
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT l.k, l.lt, l.lid, "
            "(SELECT count(*) FROM r WHERE r.k = l.k "
            f" AND r.rt >= l.lt + ({lo}) AND r.rt < l.lt + ({hi})) "
            "AS n_in_range FROM l"
        ).df()
        con.close()
        assert len(got) == len(left)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)
