"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf, compare row-count + schema +
order-insensitive values.  Usage:

    python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import pandas as pd

import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: --json <output-path>")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = E.queries(), E.oracle_sql()
    failed = []
    # one record per queries() entry, in the driver's CORRECTNESS_r{N}.json
    # shape, so the committed self-check artifact always covers the full
    # registry (the driver's own snapshot has missed late additions)
    records: dict[str, dict] = {}

    def rec(name, rows_match=None, schema_match=None, hash_match=None,
            spark_rows=None, oracle_rows=None, err=None, status=None):
        # `err` carries REAL errors only; a query with no SQL oracle is a
        # distinct `status: "no_oracle"` so tooling that treats non-null
        # err as a failure doesn't report false failures
        records[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err,
            "status": status or ("error" if err else (
                "match" if hash_match else "ran")),
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"FAIL {name}: query raised")
            traceback.print_exc()
            failed.append(name)
            rec(name, err=f"query raised: {traceback.format_exc(limit=1)}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows={len(got)} (rows-only, no oracle)")
            rec(name, spark_rows=len(got), status="no_oracle")
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception:
            print(f"FAIL {name}: oracle SQL raised")
            traceback.print_exc()
            failed.append(name)
            rec(name, spark_rows=len(got),
                err=f"oracle raised: {traceback.format_exc(limit=1)}")
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failed.append(name)
            rec(name, rows_match=False, spark_rows=len(got),
                oracle_rows=len(want))
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            failed.append(name)
            rec(name, rows_match=True, schema_match=False,
                spark_rows=len(got), oracle_rows=len(want))
            continue
        try:
            gv = got.astype(str).values.tolist()
            wv = want.astype(str).values.tolist()
            if gv != wv:
                bad = next(i for i, (a, b) in enumerate(zip(gv, wv)) if a != b)
                print(f"FAIL {name}: value mismatch at row {bad}:\n  ray {gv[bad]}\n  sql {wv[bad]}")
                failed.append(name)
                rec(name, rows_match=True, schema_match=True,
                    hash_match=False, spark_rows=len(got),
                    oracle_rows=len(want))
                continue
        except Exception:
            print(f"FAIL {name}: compare raised")
            traceback.print_exc()
            failed.append(name)
            rec(name, rows_match=True, schema_match=True,
                spark_rows=len(got), oracle_rows=len(want),
                err=f"compare raised: {traceback.format_exc(limit=1)}")
            continue
        print(f"ok   {name}: rows={len(got)} MATCH")
        rec(name, rows_match=True, schema_match=True, hash_match=True,
            spark_rows=len(got), oracle_rows=len(want))
    if json_out:
        import json
        import os

        if only and os.path.exists(json_out):
            # partial run: update the existing snapshot in registry order
            # instead of clobbering the other entries
            with open(json_out) as f:
                prior = json.load(f)
            prior.update(records)
            records = {n: prior[n] for n in qs if n in prior}
        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {len(records)} records to {json_out}")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
