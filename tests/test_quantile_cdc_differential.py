"""DuckDB-differential batteries: exact quantiles and the CDC merge.

* ``exact_quantiles`` sweeps adversarial value shapes (negatives,
  heavy duplicates, two-value domains, singletons) against DuckDB's
  ``quantile_disc`` — the rule the operator documents.
* ``apply_changelog`` replays seeded random upsert/delete streams
  against the SQL restatement (highest-seq row per key wins, delete
  outranks upsert at equal seq, base rows rank below every change).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.functions.agg import exact_quantiles
from parsel_ray.functions.relational import apply_changelog

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def _vals(kind: str, rng) -> np.ndarray:
    if kind == "uniform":
        return rng.randint(-1000, 1000, size=700).astype(np.int64)
    if kind == "dup_heavy":
        return rng.choice(np.array([-5, 0, 3, 7], np.int64), size=700)
    if kind == "two":
        return rng.choice(np.array([11, -11], np.int64), size=300)
    if kind == "single":
        return np.array([99], np.int64)
    if kind == "skewed":
        return np.minimum(rng.zipf(1.5, size=700), 10**4).astype(np.int64)
    raise AssertionError(kind)


class TestExactQuantilesVsDuckdb:
    @pytest.mark.parametrize(
        "kind", ["uniform", "dup_heavy", "two", "single", "skewed"]
    )
    def test_matches_quantile_disc(self, ray_session, kind):
        rng = np.random.RandomState(len(kind) * 7919)
        v = _vals(kind, rng)
        df = pd.DataFrame({"v": v})
        got = exact_quantiles(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            "v", QS,
        ).to_pydict()
        con = duckdb.connect()
        con.register("t", df)
        for q, val in zip(got["q"], got["value"]):
            want = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t"
            ).fetchone()[0]
            assert val == want, (kind, q, val, want)
        con.close()


class TestApplyChangelogVsDuckdb:
    @pytest.mark.parametrize("seed", [3, 17, 91])
    def test_matches_oracle(self, ray_session, seed):
        rng = np.random.RandomState(seed)
        n_keys, n_changes = 25, 120
        snap = pd.DataFrame(
            {
                "k": np.arange(n_keys, dtype=np.int64),
                "val": rng.randint(0, 100, size=n_keys).astype(np.int64),
            }
        )
        changes = pd.DataFrame(
            {
                "k": rng.randint(0, n_keys + 8, size=n_changes).astype(
                    np.int64
                ),  # some keys not in the snapshot
                "val": rng.randint(100, 200, size=n_changes).astype(np.int64),
                "__seq": np.arange(n_changes, dtype=np.int64),
                "__op": rng.choice(["upsert", "delete"], size=n_changes,
                                   p=[0.75, 0.25]),
            }
        )
        got = apply_changelog(
            rd.from_arrow(pa.Table.from_pandas(snap, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(changes,
                                               preserve_index=False)),
            key="k", num_partitions=8,
        ).to_pandas().sort_values("k").reset_index(drop=True)
        con = duckdb.connect()
        con.register("snap", snap)
        con.register("chg", changes)
        want = con.execute(
            """
            WITH all_rows AS (
              SELECT k, val, -1 AS seq, 'upsert' AS op FROM snap
              UNION ALL
              SELECT k, val, __seq AS seq, __op AS op FROM chg
            ), ranked AS (
              SELECT *, row_number() OVER (
                PARTITION BY k ORDER BY seq DESC,
                (op = 'delete') DESC
              ) AS rn FROM all_rows
            )
            SELECT k, val FROM ranked WHERE rn = 1 AND op <> 'delete'
            ORDER BY k
            """
        ).df()
        con.close()
        assert got["k"].astype(np.int64).tolist() == \
            want["k"].astype(np.int64).tolist()
        assert got["val"].astype(np.int64).tolist() == \
            want["val"].astype(np.int64).tolist()
