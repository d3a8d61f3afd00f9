"""Round-3 wave-4 analytics operators, pinned on synthetic tables the
test writes itself: funnel (strict min-ts ordering), exact-integer-moment
correlation, interpolated quantiles (quantile_cont semantics), CUBE
grouping sets, INTERSECT, and distributed k-means (Lloyd invariants).

Each query function takes an sf_dir and reads ``{sf_dir}/{table}.parquet``,
so the tests materialize miniature tables in tmp dirs and compare against
straight pandas / numpy / duckdb truths computed in-process.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parsel_ray.pipelines import queries as Q


def _write(tmp_path, name: str, df: pd.DataFrame) -> str:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / f"{name}.parquet"))
    return str(tmp_path)


def _events(rows):
    df = pd.DataFrame(rows, columns=["user_id", "ts_us", "event_type"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["value"] = 1.0
    df["props"] = "{}"
    return df[["event_id", "ts", "user_id", "event_type", "value", "props"]]


class TestFunnel:
    def test_strict_ordering_counts(self, ray_session, tmp_path):
        # u1 completes all 4 steps; u2 stops after view; u3 has view
        # BEFORE signup (step2 must NOT count); u4 ties signup/view ts
        # (strict > excludes); u5 never signs up.
        rows = [
            (1, 10, "signup"), (1, 20, "view"), (1, 30, "click"),
            (1, 40, "purchase"),
            (2, 10, "signup"), (2, 25, "view"),
            (3, 5, "view"), (3, 10, "signup"), (3, 20, "click"),
            (4, 10, "signup"), (4, 10, "view"),
            (5, 10, "view"), (5, 20, "click"), (5, 30, "purchase"),
        ]
        sf = _write(tmp_path, "events", _events(rows))
        got = (
            Q.events_funnel(sf).to_pandas()
            .sort_values("step").reset_index(drop=True)
        )
        # step1 = signed up: u1,u2,u3,u4 ; step2 = view strictly after
        # signup: u1,u2 ; step3: u1 ; step4: u1
        assert got["n_users"].tolist() == [4, 2, 1, 1]

    def test_min_ts_semantics_use_earliest_event(self, ray_session,
                                                 tmp_path):
        # a LATER view would qualify, but the funnel is defined on the
        # EARLIEST per-step timestamp: min(view)=5 < min(signup)=10.
        rows = [(7, 5, "view"), (7, 10, "signup"), (7, 50, "view")]
        sf = _write(tmp_path, "events", _events(rows))
        got = Q.events_funnel(sf).to_pandas().sort_values("step")
        assert got["n_users"].tolist() == [1, 0, 0, 0]


class TestCorr:
    def test_matches_numpy_corrcoef_on_integer_data(self, ray_session,
                                                    tmp_path):
        rng = np.random.RandomState(7)
        n = 4000
        x = rng.randint(1, 51, n)
        noise = rng.randint(-20000, 20000, n)
        y = x * 1000 + 50000 + noise  # strong positive corr
        df = pd.DataFrame(
            {
                "l_orderkey": np.arange(n, dtype=np.int64),
                "l_returnflag": np.where(np.arange(n) % 2 == 0, "A", "R"),
                "l_quantity": x.astype(np.float64),
                "l_extendedprice": y.astype(np.float64),
            }
        )
        sf = _write(tmp_path, "lineitem", df)
        got = (
            Q.lineitem_corr(sf).to_pandas()
            .sort_values("l_returnflag").reset_index(drop=True)
        )
        for flag in ("A", "R"):
            mask = df["l_returnflag"] == flag
            want = np.corrcoef(x[mask.values], y[mask.values])[0, 1]
            have = float(got.loc[got["l_returnflag"] == flag, "corr"].iloc[0])
            assert abs(have - want) < 1e-12
        # moments are exact integers
        a = got[got["l_returnflag"] == "A"].iloc[0]
        m = mask = df["l_returnflag"].values == "A"
        assert int(a["sxy"]) == int((x[m].astype(object) * y[m]).sum())


class TestQuantileCont:
    def test_matches_numpy_linear_interpolation(self, ray_session,
                                                tmp_path):
        rng = np.random.RandomState(3)
        cents = rng.randint(100, 10_000_000, 5001)
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(len(cents), dtype=np.int64),
                "o_totalprice": cents / 100.0,
            }
        )
        sf = _write(tmp_path, "orders", df)
        got = Q.price_quantiles_cont(sf).to_pandas()
        for q, v in zip(got["q"], got["value"]):
            want = np.percentile(
                np.floor(df["o_totalprice"] * 100 + 0.5), q * 100,
                method="linear",
            )
            assert v == want  # exact: dyadic q over integer cents

    def test_interpolates_between_adjacent_values(self, ray_session,
                                                  tmp_path):
        df = pd.DataFrame(
            {
                "o_orderkey": [1, 2, 3, 4],
                "o_totalprice": [1.00, 2.00, 3.00, 10.00],
            }
        )
        sf = _write(tmp_path, "orders", df)
        got = Q.price_quantiles_cont(sf).to_pandas()
        # n=4: pos(.5) = 1.5 -> (200+300)/2 = 250 cents
        assert float(got.loc[got["q"] == 0.5, "value"].iloc[0]) == 250.0


class TestCubeAndIntersect:
    def test_cube_levels_sum_consistently(self, ray_session, tmp_path):
        df = pd.DataFrame(
            {
                "doc_id": np.arange(9, dtype=np.int64),
                "text": ["t"] * 9,
                "lang": ["en", "en", "en", "de", "de", "fr", "fr", "fr",
                         "fr"],
                "source": ["s1", "s1", "s2", "s1", "s2", "s1", "s1", "s2",
                           "s2"],
                "n_chars": np.ones(9, dtype=np.int64),
            }
        )
        sf = _write(tmp_path, "documents", df)
        got = Q.docs_cube(sf).to_pandas()
        fine = got[got["lang"].notna() & got["source"].notna()]
        by_lang = got[got["lang"].notna() & got["source"].isna()]
        by_source = got[got["lang"].isna() & got["source"].notna()]
        total = got[got["lang"].isna() & got["source"].isna()]
        assert len(got) == len(fine) + len(by_lang) + len(by_source) + 1
        assert fine["n"].sum() == by_lang["n"].sum() == \
            by_source["n"].sum() == int(total["n"].iloc[0]) == 9
        want = df.groupby(["lang", "source"]).size()
        for _, r in fine.iterrows():
            assert r["n"] == want[(r["lang"], r["source"])]

    def test_intersect_distinct_users(self, ray_session, tmp_path):
        rows = [
            (1, 10, "click"), (1, 20, "purchase"), (1, 30, "click"),
            (2, 10, "click"),
            (3, 10, "purchase"),
            (4, 10, "click"), (4, 20, "purchase"),
        ]
        sf = _write(tmp_path, "events", _events(rows))
        got = sorted(
            Q.events_intersect_users(sf).to_pandas()["user_id"].tolist()
        )
        assert got == [1, 4]  # distinct, both sides, no dup for u1


class TestKMeans:
    def _embeddings(self, tmp_path, centers, per=40, d=16, spread=0.05):
        rng = np.random.RandomState(11)
        mats, labels = [], []
        for i, c in enumerate(centers):
            mats.append(c + rng.randn(per, d) * spread)
            labels.extend([i] * per)
        mat = np.vstack(mats).astype(np.float32)
        order = rng.permutation(len(mat))
        df = pd.DataFrame(
            {
                "vec_id": np.arange(len(mat), dtype=np.int64),
                "embedding": list(mat[order]),
                "label": np.asarray(labels, dtype=np.int32)[order],
            }
        )
        return _write(tmp_path, "embeddings", df), mat[order]

    def test_recovers_separated_clusters(self, ray_session, tmp_path):
        d = 16
        rng = np.random.RandomState(5)
        centers = [rng.randn(d) * 0 + off for off in (0.0, 5.0, 10.0)]
        sf, mat = self._embeddings(tmp_path, centers)
        out = Q.kmeans_embeddings(sf, k=3, iters=8, detail=True).to_pandas()
        assert sorted(out["n"].tolist()) and out["n"].sum() == len(mat)
        # well-separated data: every cluster ends non-empty and tight
        assert (out["n"] > 0).all()
        assert out["inertia_e3"].sum() < 1000 * len(mat) * d * 0.05

    def test_inertia_certification_is_monotone(self, ray_session,
                                               tmp_path):
        # the query itself raises if Lloyd's inertia ever increases;
        # running it IS the certification — just confirm it completes
        # on awkward data (duplicate points, k > natural clusters)
        d = 8
        centers = [np.zeros(d), np.ones(d) * 0.001]
        sf, _ = self._embeddings(tmp_path, centers, per=30, d=d,
                                 spread=0.0)
        out = Q.kmeans_embeddings(sf, k=4, iters=6, detail=True).to_pandas()
        assert out["n"].sum() == 60


class TestWindowRankFunctions:
    def test_ntile_duckdb_size_rule_and_ties(self, ray_session, tmp_path):
        import duckdb
        # n=10, k=4 -> sizes 3,3,2,2 ; duplicate values exercise the
        # deterministic (value, event_id) tie-break
        rows = [(1, i * 10, "click") for i in range(10)]
        df = _events(rows)
        df["value"] = [5.0, 5.0, 5.0, 1.0, 2.0, 2.0, 9.0, 0.0, 7.0, 7.0]
        sf = _write(tmp_path, "events", df)
        got = (
            Q.events_ntile(sf).to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        want = duckdb.sql(
            Q.NTILE_SQL.replace(
                "FROM events",
                f"FROM '{sf}/events.parquet'",
            )
        ).df().sort_values("event_id").reset_index(drop=True)
        assert got["tile"].tolist() == want["tile"].tolist()
        assert got.groupby("tile").size().tolist() == [3, 3, 2, 2]

    def test_cume_dist_tie_groups_share_rank(self, ray_session, tmp_path):
        rows = [(1, i * 10, "view") for i in range(4)]
        df = _events(rows)
        df["value"] = [1.0, 2.0, 2.0, 3.0]
        sf = _write(tmp_path, "events", df)
        got = (
            Q.events_cume_dist(sf).to_pandas()
            .sort_values("event_id")["cume_dist"].tolist()
        )
        assert got == [0.25, 0.75, 0.75, 1.0]


class TestEdit1Pairs:
    def _run(self, names):
        import ray.data as rd
        from parsel_ray.functions.dedup import edit1_pairs

        ds = rd.from_arrow(pa.table({"w": pa.array(names, pa.string())}))
        got = edit1_pairs(ds, "w", num_partitions=4).take_all()
        return sorted((r["a_name"], r["b_name"]) for r in got)

    def test_substitution_insertion_deletion(self, ray_session):
        names = ["cat", "cut", "cart", "dog", "dogs", "bird"]
        # cat~cut (sub), cat~cart (ins), dog~dogs (ins); bird isolated;
        # cut~cart is distance 2 and must NOT appear
        assert self._run(names) == [
            ("cart", "cat"), ("cat", "cut"), ("dog", "dogs")
        ]

    def test_each_pair_emitted_once(self, ray_session):
        # "ab"~"b" share TWO blocking keys ("b" via deletion and "b"
        # identity) — output still one row
        assert self._run(["ab", "b"]) == [("ab", "b")]

    def test_no_pairs(self, ray_session):
        assert self._run(["alpha", "gamma", "epsilon"]) == []

    def test_bucket_cap_raises(self, ray_session):
        # 60 single-char strings all share the "" deletion bucket
        names = [chr(ord("0") + i) for i in range(60)]
        import ray.data as rd
        from parsel_ray.functions.dedup import edit1_pairs

        ds = rd.from_arrow(pa.table({"w": pa.array(names, pa.string())}))
        with pytest.raises(Exception, match="max_bucket|bucket"):
            edit1_pairs(ds, "w", num_partitions=2, max_bucket=10).take_all()


class TestGlobalRowNumber:
    def _rank(self, vals, keys=None, asc=True, parts=5):
        import ray.data as rd
        from parsel_ray.functions.sort import global_row_number

        keys = keys if keys is not None else list(range(len(vals)))
        ds = rd.from_arrow(
            pa.table({"v": pa.array(vals, pa.int64()),
                      "k": pa.array(keys, pa.int64())})
        )
        out = global_row_number(
            ds, order_by=["v", "k"], ascending=[asc, True],
            num_partitions=parts,
        ).take_all()
        return {r["k"]: r["rank"] for r in out}

    def test_matches_argsort_with_heavy_ties(self, ray_session):
        rng = np.random.RandomState(2)
        vals = rng.randint(0, 7, 500).tolist()  # ties straddle bounds
        got = self._rank(vals)
        order = np.lexsort((np.arange(500), np.array(vals)))
        want = {int(k): i + 1 for i, k in enumerate(order)}
        assert got == want

    def test_descending(self, ray_session):
        vals = [3, 1, 4, 1, 5]
        got = self._rank(vals, asc=False)
        order = np.lexsort((np.arange(5), -np.array(vals)))
        want = {int(k): i + 1 for i, k in enumerate(order)}
        assert got == want

    def test_single_distinct_value(self, ray_session):
        got = self._rank([9] * 40, parts=4)
        assert sorted(got.values()) == list(range(1, 41))
        assert got == {k: k + 1 for k in range(40)}  # tie-break by k

    def test_empty(self, ray_session):
        assert self._rank([]) == {}


class TestWeightedSample:
    def test_deterministic_and_weight_biased(self, ray_session, tmp_path):
        # half the rows carry 50x the weight: they must dominate the
        # sample, and two runs must agree exactly
        n = 2000
        df = pd.DataFrame(
            {
                "o_orderkey": np.arange(n, dtype=np.int64),
                "o_totalprice": np.where(np.arange(n) < n // 2, 5000.0,
                                         100.0),
            }
        )
        sf = _write(tmp_path, "orders", df)
        a = Q.weighted_sample_orders(sf, k=200).to_pandas()
        b = Q.weighted_sample_orders(sf, k=200).to_pandas()
        assert sorted(a["o_orderkey"]) == sorted(b["o_orderkey"])
        assert len(a) == 200
        heavy = (a["o_orderkey"] < n // 2).sum()
        assert heavy > 170  # E[heavy] ~ 196 of 200; 170 is >5 sigma safe


class TestStreamingSessionize:
    def _run(self, tmp_path, rows, n_mb=4, n_actors=3):
        from parsel_ray.pipelines.streaming import streaming_sessionize

        sf = _write(tmp_path, "events", _events(rows))
        out = streaming_sessionize(
            f"{sf}/events.parquet", n_microbatches=n_mb, n_actors=n_actors
        ).take_all()
        return {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in out}

    def test_session_spanning_microbatch_boundary(self, ray_session,
                                                  tmp_path):
        m = 60_000_000  # one minute in us
        rows = [
            # u1: events at minutes 0,10,20,...,90 — gaps of 10 min,
            # ONE session even though micro-batches cut the span
            (1, i * 10 * m, "view") for i in range(10)
        ] + [
            # u2: minute 0 and minute 80 — 80-min gap = 2 sessions
            (2, 0, "view"), (2, 80 * m, "view"),
        ]
        got = self._run(tmp_path, rows, n_mb=5)
        assert got[1] == (1, 10)
        assert got[2] == (2, 2)

    def test_matches_batch_sessionize(self, ray_session, tmp_path):
        rng = np.random.RandomState(9)
        m = 60_000_000
        rows = [
            (int(u), int(t), "view")
            for u, t in zip(
                rng.randint(0, 12, 400),
                rng.randint(0, 600, 400) * m,
            )
        ]
        sf = _write(tmp_path, "events", _events(rows))
        from parsel_ray.pipelines.streaming import streaming_sessionize

        stream = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in streaming_sessionize(
                f"{sf}/events.parquet", n_microbatches=7, n_actors=4
            ).take_all()
        }
        batch = {
            r["user_id"]: (r["n_sessions"], r["n_events"])
            for r in Q.events_sessionize(sf).take_all()
        }
        assert stream == batch


class TestEwma:
    def test_closed_form_recursion(self, ray_session, tmp_path):
        # values 1,2,3 with alpha=0.5, adjust=False:
        # s1=1, s2=1.5, s3=2.25 -> last = 2.25
        rows = [(1, 10, "view"), (1, 20, "view"), (1, 30, "view")]
        df = _events(rows)
        df["value"] = [1.0, 2.0, 3.0]
        sf = _write(tmp_path, "events", df)
        got = Q.events_ewma(sf, alpha=0.5, detail=True).to_pandas()
        assert got.loc[0, "ewma_e6"] == 2_250_000
        assert got.loc[0, "n_events"] == 3


class TestPartitionedDelete:
    def _corpus(self, tmp_path):
        import ray.data as rd
        from parsel_ray.sources.partitioned import write_partitioned_parquet

        df = pd.DataFrame(
            {
                "doc_id": np.arange(30, dtype=np.int64),
                "lang": ["en"] * 10 + ["de"] * 10 + ["fr"] * 10,
                "n_chars": np.ones(30, dtype=np.int64),
            }
        )
        out = str(tmp_path / "corpus")
        write_partitioned_parquet(
            rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
            out, key_col="lang",
        )
        return out, df

    def test_untouched_partition_bytes_identical(self, ray_session,
                                                 tmp_path):
        import glob
        import hashlib
        from parsel_ray.sources.partitioned import delete_from_partitioned

        out, df = self._corpus(tmp_path)

        def digest(pdir):
            return [
                hashlib.md5(open(f, "rb").read()).hexdigest()
                for f in sorted(glob.glob(f"{pdir}/*.parquet"))
            ]

        fr_before = digest(f"{out}/lang=fr")
        # delete only en docs (ids 0-9 even)
        rec = delete_from_partitioned(
            out, "lang",
            predicate=lambda t: pa.array(
                (t["doc_id"].to_numpy(zero_copy_only=False) < 10)
                & (t["doc_id"].to_numpy(zero_copy_only=False) % 2 == 0)
            ),
        ).to_pandas().set_index("lang")
        assert rec.loc["en", "n_deleted"] == 5
        assert rec.loc["en", "n_kept"] == 5
        assert rec.loc["fr", "n_deleted"] == 0
        assert digest(f"{out}/lang=fr") == fr_before  # bytes untouched
        import duckdb
        n = duckdb.sql(
            f"SELECT count(*) FROM '{out}/*/*.parquet'"
        ).fetchone()[0]
        assert n == 25

    def test_done_count_detects_crash_window_duplicates(self,
                                                        ray_session,
                                                        tmp_path):
        import glob
        import shutil
        from parsel_ray.sources.partitioned import delete_from_partitioned

        out, df = self._corpus(tmp_path)
        # simulate the crash window: a superseded shard survives next to
        # the published one -> footer counts exceed the _DONE record
        src = glob.glob(f"{out}/lang=en/*.parquet")[0]
        shutil.copy(src, f"{out}/lang=en/shard-stale-duplicate.parquet")
        # the raise travels back wrapped in RayTaskError
        with pytest.raises(Exception, match="crash window|lost write"):
            delete_from_partitioned(
                out, "lang",
                predicate=lambda t: pa.array(
                    np.zeros(len(t), dtype=bool)
                ),
            )


class TestFooterMinmaxFallback:
    def test_statsless_parquet_falls_back_to_scan(self, ray_session,
                                                  tmp_path):
        import pyarrow.parquet as pq
        from parsel_ray.pipelines.streaming import (
            _footer_minmax,
            streaming_distinct,
        )

        df = _events([(u, t * 1000, "view") for u in range(5)
                      for t in range(20)])
        path = str(tmp_path / "events.parquet")
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), path,
            write_statistics=False,
        )
        lo, hi = _footer_minmax(path, "event_id")
        assert (lo, hi) == (0, 99)
        assert streaming_distinct(path, "user_id",
                                  n_microbatches=3, n_actors=2) == 5


class TestEvolvedRead:
    def test_unify_fills_typed_nulls_and_promotes(self, ray_session,
                                                  tmp_path):
        import pyarrow.parquet as pq
        from parsel_ray.sources.partitioned import read_evolved_parquet

        p1 = str(tmp_path / "v1.parquet")
        p2 = str(tmp_path / "v2.parquet")
        pq.write_table(
            pa.table({"id": pa.array([1, 2], pa.int64()),
                      "w": pa.array([10, 20], pa.int32())}), p1)
        pq.write_table(
            pa.table({"id": pa.array([3], pa.int64()),
                      "w": pa.array([30], pa.int64()),
                      "tag": pa.array(["x"], pa.string())}), p2)
        ds, schema = read_evolved_parquet([p1, p2])
        assert schema.field("w").type == pa.int64()  # promoted
        rows = sorted(ds.take_all(), key=lambda r: r["id"])
        assert [r["tag"] for r in rows] == [None, None, "x"]
        assert [r["w"] for r in rows] == [10, 20, 30]

    def test_incompatible_types_raise_at_plan_time(self, ray_session,
                                                   tmp_path):
        import pyarrow.parquet as pq
        from parsel_ray.sources.partitioned import read_evolved_parquet

        p1 = str(tmp_path / "a.parquet")
        p2 = str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"k": pa.array([1], pa.int64())}), p1)
        pq.write_table(pa.table({"k": pa.array(["s"], pa.string())}), p2)
        with pytest.raises(ValueError, match="incompatible schemas"):
            read_evolved_parquet([p1, p2])


class TestWatermarkWindows:
    def _events_arrival(self, rows):
        # rows: (event_id, ts_us, event_type, value) — event_id IS the
        # arrival axis; ts is event time
        df = pd.DataFrame(rows, columns=["event_id", "ts_us",
                                         "event_type", "value"])
        df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
        df["user_id"] = np.int64(1)
        df["props"] = "{}"
        return df[["event_id", "ts", "user_id", "event_type", "value",
                   "props"]]

    def test_late_rows_drop_under_finite_lateness(self, ray_session,
                                                  tmp_path):
        from parsel_ray.pipelines.streaming import streaming_hourly_counts

        H = 3_600_000_000  # one hour in us
        rows = [
            # arrival batch 1 (event_id 0-4): H0 and H5 windows
            (0, 10, "view", 1.0),
            (1, 20, "view", 1.0),
            (2, 5 * H + 1, "view", 1.0),   # pushes watermark to ~5h
            (3, 5 * H + 2, "view", 1.0),
            (4, 30, "click", 1.0),
            # arrival batch 2 (event_id 5-9): one LATE H0 row + H5 rows
            (5, 40, "view", 1.0),           # late: H0 finalized
            (6, 5 * H + 3, "view", 1.0),
            (7, 5 * H + 4, "view", 1.0),
            (8, 5 * H + 5, "view", 1.0),
            (9, 5 * H + 6, "click", 1.0),
        ]
        sf = _write(tmp_path, "events", self._events_arrival(rows))
        path = f"{sf}/events.parquet"
        # lateness 1h: after batch 1 the watermark is 5h+1us - 1h = 4h+,
        # so H0 (window end 1h) finalizes before batch 2 arrives
        ds, dropped = streaming_hourly_counts(
            path, n_microbatches=2, n_actors=2,
            allowed_lateness_us=H,
        )
        got = {(r["event_type"], r["hour"].hour): r["n"]
               for r in ds.take_all()}
        assert dropped == 1
        assert got[("view", 0)] == 2       # the late row is NOT counted
        assert got[("view", 5)] == 5
        assert got[("click", 0)] == 1
        # unbounded lateness: same input, nothing drops, late row counts
        ds2, dropped2 = streaming_hourly_counts(
            path, n_microbatches=2, n_actors=2, allowed_lateness_us=None,
        )
        got2 = {(r["event_type"], r["hour"].hour): r["n"]
                for r in ds2.take_all()}
        assert dropped2 == 0
        assert got2[("view", 0)] == 3


class TestStreamingEnrich:
    """pipelines/streaming.py::streaming_enrich — stream-table join with
    the dimension in hash-partitioned actor state; exact equivalence with
    the batch join computed in-process."""

    def test_matches_batch_join(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from parsel_ray.pipelines.streaming import streaming_enrich

        rng = np.random.RandomState(4)
        n_cust, n_ev = 12, 400
        cust = pa.table(
            {
                "c_custkey": pa.array(range(1, n_cust + 1), pa.int64()),
                "c_mktsegment": pa.array(
                    [["AUTO", "BIKE", "SHIP"][i % 3] for i in range(n_cust)]
                ),
            }
        )
        ev = pa.table(
            {
                "event_id": pa.array(range(n_ev), pa.int64()),
                "user_id": pa.array(
                    rng.randint(0, 5000, n_ev), pa.int64()
                ),
                "value": pa.array(
                    np.round(rng.uniform(0, 90, n_ev), 2), pa.float64()
                ),
            }
        )
        cpath = str(tmp_path / "customer.parquet")
        epath = str(tmp_path / "events.parquet")
        pq.write_table(cust, cpath)
        pq.write_table(ev, epath)

        out = streaming_enrich(epath, cpath, n_microbatches=4, n_actors=3)
        got = {
            r["c_mktsegment"]: (r["n_events"], r["sum_value_cents"])
            for r in out.to_pylist()
        }

        from parsel_ray.pipelines.queries import _cents

        key = ev["user_id"].to_numpy() % n_cust + 1
        seg = np.asarray(cust["c_mktsegment"].to_pylist(), object)[key - 1]
        cents = np.asarray(_cents(ev["value"]), np.int64)
        want = {}
        for s in np.unique(seg):
            m = seg == s
            want[str(s)] = (int(m.sum()), int(cents[m].sum()))
        assert got == want


class TestStreamingHeavyTerms:
    """pipelines/streaming.py::streaming_heavy_terms — micro-batch replay
    into hash-partitioned Misra-Gries actors + exact recount.  k is sized
    well below the distinct-term count so the MG trim actually evicts,
    exercising the per-partition retention guarantee end to end."""

    def test_matches_exact_counts(self, ray_session, tmp_path):
        import re
        from collections import Counter

        import pyarrow.parquet as pq

        from parsel_ray.pipelines.streaming import streaming_heavy_terms

        rng = np.random.RandomState(11)
        vocab = [f"w{i:03d}" for i in range(400)]
        heavy = ["alpha", "beta", "gamma"]
        docs = []
        for d in range(240):
            words = list(rng.choice(vocab, 20))
            # heavy terms appear in most docs, several times
            for h in heavy:
                if rng.rand() < 0.8:
                    words += [h] * int(rng.randint(1, 4))
            rng.shuffle(words)
            docs.append(" ".join(words))
        t = pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        )
        path = str(tmp_path / "documents.parquet")
        pq.write_table(t, path)

        phi = 0.01
        out = streaming_heavy_terms(
            path, phi=phi, k=120, n_microbatches=4, n_actors=3
        ).to_pandas()

        exact = Counter()
        for txt in docs:
            exact.update(w for w in re.split("[^a-z]+", txt) if len(w) >= 2)
        n = sum(exact.values())
        want = {w: c for w, c in exact.items() if c > phi * n}

        got = dict(zip(out["term"], out["n"].astype(int)))
        assert got == want
        assert set(heavy) <= set(got)

    def test_k_guard(self, ray_session, tmp_path):
        from parsel_ray.pipelines.streaming import streaming_heavy_terms

        with pytest.raises(AssertionError):
            streaming_heavy_terms("/nonexistent", phi=0.001, k=10)


class TestDqChecks:
    """dq_orders_checks must actually FIRE on planted violations (the
    gate corpus is clean, so every rule reads zero there)."""

    def test_planted_violations(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from parsel_ray.pipelines.queries import dq_orders_checks

        orders = pa.table(
            {
                "o_orderkey": pa.array([1, 2, 2, 3, 4], pa.int64()),
                "o_custkey": pa.array([10, None, 12, None, 14],
                                      pa.int64()),
                "o_totalprice": pa.array([5.0, -1.0, 0.0, 2.0, 3.0]),
            }
        )
        lineitem = pa.table(
            {"l_orderkey": pa.array([1, 1, 2, 99, 98, 99], pa.int64())}
        )
        pq.write_table(orders, str(tmp_path / "orders.parquet"))
        pq.write_table(lineitem, str(tmp_path / "lineitem.parquet"))
        out = {
            r["rule"]: r["violations"]
            for r in dq_orders_checks(str(tmp_path)).to_pylist()
        }
        assert out == {
            "duplicate_orderkey": 1,    # key 2 appears twice -> 1 excess
            "orphan_lineitem": 2,       # distinct orphans 98, 99
            "null_custkey": 2,
            "nonpositive_totalprice": 2,
        }


class TestParagraphDedup:
    """functions/dedup.py::paragraph_dedup — corpus-wide first-occurrence
    paragraph dedup with doc rebuild.  Pins the chunker on a handcrafted
    doc and the full distributed path against a single-process reference
    on planted cross-doc duplicate paragraphs."""

    def test_chunk_rows_pinned(self, ray_session):
        from parsel_ray.functions.dedup import paragraph_chunk_rows

        toks = [f"t{i}" for i in range(10)]
        t = pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array([" ".join(toks)]),
            }
        )
        out = paragraph_chunk_rows(t, chunk_tokens=4)
        assert out["chunk"].to_pylist() == [
            "t0 t1 t2 t3", "t4 t5 t6 t7", "t8 t9",
        ]
        assert out["rank"].to_pylist() == [
            (7 << 20) | 0, (7 << 20) | 1, (7 << 20) | 2,
        ]

    def test_matches_reference(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import paragraph_dedup

        rng = np.random.RandomState(5)
        vocab = [f"w{i}" for i in range(30)]
        ct = 4  # chunk_tokens
        paras = [" ".join(rng.choice(vocab, ct)) for _ in range(40)]
        docs = []
        for d in range(120):
            # planted duplication: docs share paragraphs from a small pool
            k = rng.randint(1, 6)
            docs.append(" ".join(rng.choice(paras, k)))

        # single-process reference
        seen, want = set(), {}
        for d, text in enumerate(docs):
            toks = text.split(" ")
            kept = []
            for c in range(0, len(toks), ct):
                chunk = " ".join(toks[c:c + ct])
                if chunk not in seen:
                    seen.add(chunk)
                    kept.append(chunk)
            if kept:
                want[d] = (" ".join(kept), len(kept))

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs),
                }
            )
        ).repartition(7)
        got = {
            r["doc_id"]: (r["text_clean"], r["n_chunks"])
            for r in paragraph_dedup(
                ds, chunk_tokens=ct, num_partitions=5
            ).take_all()
        }
        assert got == want
        assert len(got) < len(docs)  # some doc fully deduped away


class TestGlobalPrefixSum:
    def test_matches_sequential_cumsum(self, ray_session):
        import ray.data as rd
        from parsel_ray.functions.sort import global_prefix_sum

        rng = np.random.RandomState(5)
        vals = rng.randint(0, 100, 400)
        ds = rd.from_arrow(
            pa.table({"k": pa.array(range(400), pa.int64()),
                      "v": pa.array(vals, pa.int64())})
        ).repartition(7)
        out = global_prefix_sum(
            ds, ["k"], [True], "v", out_col="pre", num_partitions=5
        ).take_all()
        got = {r["k"]: r["pre"] for r in out}
        want = dict(enumerate(np.cumsum(vals) - vals))
        assert got == {k: int(v) for k, v in want.items()}

    def test_heavy_primary_ties_with_tiebreak(self, ray_session):
        import ray.data as rd
        from parsel_ray.functions.sort import global_prefix_sum

        # primary has only 3 distinct values; k breaks ties totally
        prim = [i % 3 for i in range(90)]
        ds = rd.from_arrow(
            pa.table({"p": pa.array(prim, pa.int64()),
                      "k": pa.array(range(90), pa.int64()),
                      "v": pa.array([1] * 90, pa.int64())})
        )
        out = global_prefix_sum(
            ds, ["p", "k"], [True, True], "v", out_col="pre",
            num_partitions=4,
        ).take_all()
        order = sorted(range(90), key=lambda i: (prim[i], i))
        want = {k: pos for pos, k in enumerate(order)}  # all v == 1
        assert {r["k"]: r["pre"] for r in out} == want


class TestShotBoundaries:
    def test_known_cuts_and_corrupt(self, ray_session):
        from parsel_ray.images.video import encode_video
        from parsel_ray.stages.multimodal import DetectShotBoundaries

        mk = lambda val: np.full((8, 9, 3), val, np.uint8)
        vid = encode_video([mk(40), mk(45), mk(190), mk(195), mk(40)],
                           fmt="png")
        t = pa.table({"bytes": pa.array([vid, b"notavideo"], pa.binary())})
        out = DetectShotBoundaries()(t)
        assert out["video_ok"].to_pylist() == [True, False]
        assert out["n_shots"].to_pylist()[0] == 3  # cuts at frames 2 and 4
        assert out["boundaries"].to_pylist()[0] == [2, 4]


class TestDuplicatedSubstringSpans:
    """functions/dedup.py::duplicated_substring_spans — exact Lee et al.
    2022 substring dedup as a gram-keyed shuffle.  Pins the span merge
    against a brute-force single-process reference on a planted-overlap
    corpus and asserts the hash64 scale path emits the identical span
    set as the exact UTF-32 gram path."""

    @staticmethod
    def _reference(docs, L):
        from collections import defaultdict

        owners = defaultdict(set)
        for d, txt in docs.items():
            for s in range(len(txt) - L + 1):
                owners[txt[s:s + L]].add(d)
        spans = []
        for d, txt in docs.items():
            marked = sorted(
                s for s in range(len(txt) - L + 1)
                if len(owners[txt[s:s + L]]) >= 2
            )
            cur = None
            for s in marked:
                if cur is None or s > cur[1] + L:
                    if cur:
                        spans.append((d, cur[0], cur[1] + L))
                    cur = [s, s]
                else:
                    cur[1] = s
            if cur:
                spans.append((d, cur[0], cur[1] + L))
        return {(d, a, b, b - a) for d, a, b in spans}

    @pytest.mark.parametrize("key", ["gram", "hash64"])
    def test_matches_reference(self, ray_session, key):
        import ray.data as rd

        from parsel_ray.functions.dedup import duplicated_substring_spans

        rng = np.random.RandomState(11)
        L = 8
        shared = ["".join(rng.choice(list("abcdef"), 20)) for _ in range(6)]
        docs = {}
        for d in range(40):
            parts = []
            for _ in range(rng.randint(1, 4)):
                if rng.rand() < 0.6:
                    parts.append(shared[rng.randint(len(shared))])
                parts.append("".join(rng.choice(list("ghijklmnop"),
                                                rng.randint(3, 25))))
            docs[d] = "".join(parts)
        docs[40] = "xy"           # shorter than L -> no gram rows
        docs[41] = None           # null text tolerated

        ds = rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(list(docs), pa.int64()),
                    "text": pa.array(list(docs.values())),
                }
            )
        ).repartition(7)
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_chars"])
            for r in duplicated_substring_spans(
                ds, L=L, key=key, num_partitions=5
            ).take_all()
        }
        want = self._reference(
            {d: t for d, t in docs.items() if t is not None}, L
        )
        assert got == want
        assert got  # planted overlaps actually produced spans

    def test_bad_key_rejected(self, ray_session):
        import ray.data as rd

        from parsel_ray.functions.dedup import duplicated_substring_spans

        ds = rd.from_arrow(pa.table({"doc_id": pa.array([1], pa.int64()),
                                     "text": pa.array(["x"])}))
        with pytest.raises(ValueError, match="gram"):
            duplicated_substring_spans(ds, key="md5")


class TestSemDedup:
    """functions/similarity.py::semdedup — planted near-duplicate
    clusters: within a cell, every row with an earlier >=threshold
    neighbor drops; the earliest of each duplicate neighborhood stays."""

    def test_planted_duplicates(self, ray_session):
        import ray
        import ray.data as rd

        from parsel_ray.functions.similarity import semdedup

        rng = np.random.RandomState(3)
        D = 16
        bases = rng.randn(5, D)
        bases /= np.linalg.norm(bases, axis=1, keepdims=True)
        rows, dup_of = [], {}
        vid = 0
        for b in range(5):
            head = vid
            for j in range(8):
                if j == 0:
                    v = bases[b]
                else:
                    # tight jitter: cosine to base stays > 0.999
                    v = bases[b] + rng.randn(D) * 1e-3
                    dup_of[vid] = head
                rows.append((vid, (v / np.linalg.norm(v))
                             .astype(np.float32)))
                vid += 1
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array([r[1].tolist() for r in rows],
                                          pa.list_(pa.float32())),
                }
            )
        ).repartition(4)
        # centroids = the exact bases -> each planted cluster is one cell
        surv = semdedup(
            ds, ray.put(bases.astype(np.float32)), threshold=0.99,
            num_partitions=3,
        ).take_all()
        kept = sorted(r["vec_id"] for r in surv)
        # exactly the 5 cluster heads survive
        assert kept == [0, 8, 16, 24, 32]

    def test_threshold_one_keeps_all(self, ray_session):
        import ray
        import ray.data as rd

        from parsel_ray.functions.similarity import semdedup

        rng = np.random.RandomState(4)
        mat = rng.randn(30, 8).astype(np.float32)
        ds = rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(30), pa.int64()),
                    "embedding": pa.array([v.tolist() for v in mat],
                                          pa.list_(pa.float32())),
                }
            )
        )
        cent = rng.randn(4, 8).astype(np.float32)
        surv = semdedup(ds, ray.put(cent), threshold=1.5).take_all()
        assert sorted(r["vec_id"] for r in surv) == list(range(30))


class TestPushIdempotency:
    """The retry-dedup contract of streaming._push_id/_idempotent_push:
    a replayed push (same partition, same payload) must return the
    remembered ack WITHOUT re-applying state; distinct payloads must
    both apply.  Simulates the Ray task-retry scenario the mechanism
    exists for (worker death after partial delivery → replay)."""

    def _tbl(self, eids, uids):
        return pa.table(
            {
                "user_id": pa.array(uids, pa.int64()),
                "ts": pa.array(
                    [1_000_000 * e for e in eids], pa.timestamp("us")
                ),
                "event_id": pa.array(eids, pa.int64()),
            }
        )

    def test_push_id_pure_content_function(self):
        from parsel_ray.pipelines.streaming import _push_id

        t = self._tbl([1, 2], [7, 7])
        assert _push_id(0, t) == _push_id(0, t)          # replay-stable
        assert _push_id(0, t) != _push_id(1, t)          # partition-keyed
        assert _push_id(0, t) != _push_id(0, self._tbl([3, 4], [7, 7]))
        a = np.array([1, 2, 3], np.int64)
        assert _push_id(2, a, a) == _push_id(2, a, a)
        assert _push_id(2, a) != _push_id(2, a, a)       # arity-sensitive

    def test_session_push_replay_not_reapplied(self, ray_session):
        import ray

        from parsel_ray.pipelines.streaming import SessionState, _push_id

        a = SessionState.remote()
        t = self._tbl([1, 2, 3], [5, 5, 5])
        pid = _push_id(0, t)
        assert ray.get(a.push.remote(t, pid)) == 3
        assert ray.get(a.push.remote(t, pid)) == 3       # replayed ack
        # only one buffered copy folds: 3 events, not 6
        assert ray.get(a.process_batch.remote()) == 3
        out = ray.get(a.flush.remote())
        assert out["n_events"].to_pylist() == [3]

    def test_window_replay_and_distinct_content(self, ray_session):
        import ray

        from parsel_ray.pipelines.streaming import WindowState, _push_id

        a = WindowState.remote()
        t1 = pa.table(
            {
                "ts": pa.array([0, 1], pa.timestamp("us")),
                "event_type": pa.array(["x", "x"]),
                "value": pa.array([1.0, 2.0]),
                "event_id": pa.array([10, 11], pa.int64()),
            }
        )
        t2 = t1.set_column(3, "event_id",
                           pa.array([12, 13], pa.int64()))
        ray.get(a.push.remote(t1, _push_id(0, t1)))
        ray.get(a.push.remote(t1, _push_id(0, t1)))      # replay: no-op
        ray.get(a.push.remote(t2, _push_id(0, t2)))      # distinct: applies
        out = ray.get(a.flush.remote())
        assert out["n"].to_pylist() == [4]
        assert out["sum_value_cents"].to_pylist() == [600]

    def test_load_dim_replay_post_freeze(self, ray_session):
        import ray

        from parsel_ray.pipelines.streaming import EnrichState, _push_id

        a = EnrichState.remote()
        keys = np.array([1, 2], np.int64)
        pid = _push_id(0, keys)
        assert ray.get(a.load_dim.remote([1, 2], ["A", "B"], pid)) == 2
        # an event push freezes the dimension
        ray.get(a.push.remote([1], [100],
                              _push_id(0, np.array([9], np.int64))))
        # late replay of the load must return the remembered ack, not
        # trip the frozen assert or double-load
        assert ray.get(a.load_dim.remote([1, 2], ["A", "B"], pid)) == 2
        rows, unmatched = ray.get(a.result.remote())
        assert unmatched == 0
        assert rows == [("A", 1, 100)]
