"""DuckDB-differential battery for the window-function gate queries.

The correctness gate runs each window query against its oracle on the
driver's TPC-H-ish events table — one fixed, friendly distribution.
This battery re-runs the SAME gate-path functions (same `queries()`
callables, same oracle SQL constants) over adversarial synthesized
events tables the gate data never exhibits:

* ``dup_ts``     — 5 distinct timestamps total: massive (ts) ties, so
                   every ordering falls through to the event_id
                   tie-break and RANGE frames hold whole peer groups;
* ``hot_user``   — one user owns ~90% of rows (hot window partition);
* ``singletons`` — every user has exactly one event (lag/first-value
                   NULL paths, 1-row sessions, degenerate frames);
* ``sparse_hours`` — timestamps scattered over two years (empty-hour
                   islands, RANGE frames that are almost always
                   singleton, multi-day OLS spans).

Each case writes an ``events.parquet`` into a tmp dir and calls the
query function with that dir — the full distributed path, not a kernel
shortcut.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parsel_ray.pipelines import queries as Q

TYPES = ["click", "view", "purchase", "signup", "error"]


def make_events(kind: str, n: int = 600) -> pa.Table:
    rng = np.random.RandomState(hash(kind) % (2**31))
    base = np.datetime64("1995-06-01T00:00:00", "us")
    if kind == "dup_ts":
        ts = base + rng.randint(0, 5, n) * np.timedelta64(17, "m")
        users = rng.randint(0, 6, n).astype(np.int64)
    elif kind == "hot_user":
        ts = base + rng.randint(0, 3 * 24 * 60, n) * np.timedelta64(1, "m")
        users = np.where(rng.rand(n) < 0.9, 1,
                         rng.randint(2, 10, n)).astype(np.int64)
    elif kind == "singletons":
        ts = base + rng.randint(0, 7 * 24 * 60, n) * np.timedelta64(1, "m")
        users = np.arange(n, dtype=np.int64)
    elif kind == "sparse_hours":
        ts = base + rng.randint(0, 2 * 365 * 24, n) * np.timedelta64(1, "h") \
            + rng.randint(0, 60, n) * np.timedelta64(1, "m")
        users = rng.randint(0, 8, n).astype(np.int64)
    else:
        raise AssertionError(kind)
    return pa.table(
        {
            "event_id": pa.array(rng.permutation(n).astype(np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(users),
            "event_type": pa.array(rng.choice(TYPES, n)),
            "value": pa.array(np.round(rng.randn(n) * 50 + 10, 2)),
            "props": pa.array(["{}"] * n),
        }
    )


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(np.int64)
    return df.sort_values(list(df.columns), na_position="last") \
        .reset_index(drop=True)


def run_case(qname: str, sql: str, events: pa.Table, tmp_path) -> None:
    path = os.path.join(str(tmp_path), "events.parquet")
    pq.write_table(events, path)
    got = getattr(Q, qname)(str(tmp_path))
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
        )
        want = con.execute(sql).df()
    finally:
        con.close()
    got, want = _normalize(got), _normalize(pd.DataFrame(want))
    assert list(got.columns) == list(want.columns), \
        (qname, list(got.columns), list(want.columns))
    assert len(got) == len(want), (qname, len(got), len(want))
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            assert np.allclose(g.astype(np.float64), w.astype(np.float64),
                               rtol=1e-12, atol=1e-9, equal_nan=True), \
                (qname, c)
        else:
            assert g.tolist() == w.tolist(), (qname, c)


FULL = [
    ("events_moving_sum", Q.MOVSUM_SQL),
    ("events_range_window", Q.RANGEWIN_SQL),
    ("events_forward_fill", Q.FFILL_SQL),
    ("events_lag_delta", Q.LAG_SQL),
    ("events_first_last_value", Q.FIRST_LAST_SQL),
    ("events_running_count", Q.RUNNING_SQL),
    ("events_sessionize", Q.SESSION_SQL),
    ("events_cume_dist", Q.CUME_SQL),
    ("events_percent_rank", Q.PCT_RANK_SQL),
    ("events_ntile", Q.NTILE_SQL),
    ("events_hour_gaps", Q.HOURGAP_SQL),
]
# degenerate-group sweep: the queries whose NULL/1-row frame paths differ
CORE = FULL[:7]


class TestWindowsVsDuckdb:
    @pytest.mark.parametrize("qname,sql", FULL, ids=[q for q, _ in FULL])
    @pytest.mark.parametrize("kind", ["dup_ts", "sparse_hours"])
    def test_adversarial_order(self, ray_session, tmp_path, kind, qname, sql):
        run_case(qname, sql, make_events(kind), tmp_path)

    @pytest.mark.parametrize("qname,sql", CORE, ids=[q for q, _ in CORE])
    @pytest.mark.parametrize("kind", ["hot_user", "singletons"])
    def test_degenerate_groups(self, ray_session, tmp_path, kind, qname, sql):
        run_case(qname, sql, make_events(kind), tmp_path)

    # per-type OLS trend needs >=2 distinct days per group — only the
    # wide-span domains guarantee the denominator is non-degenerate
    @pytest.mark.parametrize("kind", ["sparse_hours", "hot_user"])
    def test_value_trend(self, ray_session, tmp_path, kind):
        run_case("events_value_trend", Q.TREND_SQL, make_events(kind),
                 tmp_path)
