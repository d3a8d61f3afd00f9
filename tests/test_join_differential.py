"""DuckDB-differential battery for the partitioned hash join.

Deterministic seeded tables sweep the shapes that broke (or nearly
broke) the join historically: string right columns with SPARSE buckets
(one-sided buckets must pad typed nulls, not float64 NaN), null join
keys (SQL semantics: null never matches null), many-to-many duplicate
keys, fully empty sides (the typed-empty-union schema pin), and every
join type.  Each case compares row-for-row against DuckDB on the same
data after canonical (sorted columns, sorted rows) normalization.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.functions.relational import hash_bucket_join

JOIN_SQL = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "right": "RIGHT JOIN",
    "outer": "FULL OUTER JOIN",
}


def _mk_tables(seed: int, n_left: int, n_right: int, key_space: int,
               null_keys: bool):
    rng = np.random.RandomState(seed)

    def keys(n):
        k = rng.randint(0, key_space, size=n).astype(object)
        k = np.array([f"k{v}" for v in k], dtype=object)
        if null_keys and n:
            k[rng.rand(n) < 0.15] = None
        return k

    left = pd.DataFrame(
        {
            "k": keys(n_left),
            "lv": rng.randint(0, 1000, size=n_left).astype(np.int64),
            "ltxt": [f"L{v}" for v in rng.randint(0, 50, size=n_left)],
        }
    )
    right = pd.DataFrame(
        {
            "k": keys(n_right),
            "rv": rng.randint(0, 1000, size=n_right).astype(np.int64),
            "rtxt": [f"R{v}" for v in rng.randint(0, 50, size=n_right)],
        }
    )
    return left, right


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
        elif str(df[c].dtype).startswith(("int", "Int", "float")):
            # outer joins introduce nulls: compare in one nullable dtype
            df[c] = df[c].astype("Float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(
        drop=True
    )


def _oracle(left: pd.DataFrame, right: pd.DataFrame, how: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    # suffixes ("", "_r"): left keeps its names; only the right's key is
    # dropped (pa.Table.join merges key columns)
    out = con.execute(
        f"SELECT l.k AS k, l.lv AS lv, l.ltxt AS ltxt, "
        f"r.rv AS rv, r.rtxt AS rtxt "
        f"FROM l {JOIN_SQL[how]} r ON l.k = r.k"
    ).df()
    if how in ("right", "outer"):
        # pa full/right-outer joins surface the RIGHT key when the left
        # side is null; replicate with coalesce
        out2 = con.execute(
            f"SELECT coalesce(l.k, r.k) AS k, l.lv AS lv, l.ltxt AS ltxt, "
            f"r.rv AS rv, r.rtxt AS rtxt "
            f"FROM l {JOIN_SQL[how]} r ON l.k = r.k"
        ).df()
        con.close()
        return out2
    con.close()
    return out


CASES = [
    # (seed, n_left, n_right, key_space, null_keys, buckets, how)
    (1, 40, 40, 12, False, 8, "inner"),
    (2, 40, 40, 12, False, 8, "left"),
    (3, 40, 40, 12, False, 8, "right"),
    (4, 40, 40, 12, False, 8, "outer"),
    # sparse buckets: far more buckets than keys forces one-sided
    # buckets whose missing side must pad TYPED nulls (string cols!)
    (5, 25, 6, 30, False, 64, "left"),
    (6, 6, 25, 30, False, 64, "right"),
    (7, 25, 6, 30, False, 64, "outer"),
    # null join keys: SQL semantics (never match), both sides
    (8, 40, 40, 10, True, 8, "inner"),
    (9, 40, 40, 10, True, 8, "left"),
    (10, 40, 40, 10, True, 8, "outer"),
    # many-to-many skew: one hot key on both sides
    (11, 60, 60, 3, False, 8, "inner"),
    # empty sides (typed-empty union must keep the schema alive)
    (12, 0, 20, 10, False, 8, "inner"),
    (13, 20, 0, 10, False, 8, "left"),
    (14, 0, 0, 10, False, 8, "outer"),
]


class TestHashBucketJoinVsDuckdb:
    @pytest.mark.parametrize(
        "seed,n_left,n_right,key_space,null_keys,buckets,how", CASES
    )
    def test_matches_oracle(self, ray_session, seed, n_left, n_right,
                            key_space, null_keys, buckets, how):
        left, right = _mk_tables(seed, n_left, n_right, key_space, null_keys)
        out = hash_bucket_join(
            rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            on="k", buckets=buckets, how=how,
        )
        got = out.to_pandas()
        want = _oracle(left, right, how)
        if len(got) == 0 and len(want) == 0:
            # Ray's to_pandas drops columns on an all-empty stream (see
            # queries.py phash_near_dup note); the dataset schema is the
            # contract to check here
            assert sorted(out.schema().names) == sorted(want.columns)
            return
        got_c, want_c = _canon(got), _canon(want)
        assert list(got_c.columns) == list(want_c.columns)
        pd.testing.assert_frame_equal(got_c, want_c, check_dtype=False)

    def test_empty_result_keeps_typed_schema(self, ray_session):
        """Inner join with disjoint key sets: zero rows, but the schema
        must survive for downstream joins (the map_groups empty-output
        footgun)."""
        left = pd.DataFrame({"k": ["a", "b"], "lv": [1, 2]})
        right = pd.DataFrame({"k": ["c", "d"], "rv": [3, 4]})
        out = hash_bucket_join(
            rd.from_arrow(pa.Table.from_pandas(left, preserve_index=False)),
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            on="k", buckets=4, how="inner",
        )
        # a second join over the empty result must not crash on a
        # schema-less side
        out2 = hash_bucket_join(
            out,
            rd.from_arrow(pa.Table.from_pandas(right, preserve_index=False)),
            on="k", buckets=4, how="inner",
        )
        assert out2.take_all() == []
        sch = out.schema()
        assert sch is not None
        assert set(sch.names) >= {"k", "lv", "rv"}
