"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {name: rows_per_sec, ...}}

``--scaling``: runs the headline extraction pipeline in two FRESH
processes (num_cpus=8 then 32) on the same input and prints throughput at
both plus scaling efficiency (the sandbox stand-in for the N-node vs
4N-node cluster criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "20"))


def _init_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False


def replicated_docs(sf_dir: str, factor: int):
    """Deterministically replicate the documents table ``factor``× with
    distinct doc_ids — bench corpus synthesis (same shape, bigger N)."""
    import pyarrow as pa

    import ray.data as rd

    def rep(t: pa.Table) -> pa.Table:
        import numpy as np

        n = len(t)
        idx = np.tile(np.arange(n, dtype=np.int64), factor)
        out = t.take(pa.array(idx))
        ids = out["doc_id"].to_numpy(zero_copy_only=False)
        offs = np.repeat(np.arange(factor, dtype=np.int64) * 1_000_000, n)
        return out.set_column(
            out.schema.get_field_index("doc_id"), "doc_id", pa.array(ids + offs)
        )

    # split the single small file into many blocks so the replicate and the
    # downstream actor pool parallelize (one block = one task dispatch unit)
    return rd.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
        override_num_blocks=NUM_CPUS * 2,
    ).map_batches(rep, batch_format="pyarrow", batch_size=2048)


def bench_extract(sf_dir: str) -> int:
    """Headline: HTML build → parse → CSS/XPath extraction → token stats,
    over the replicated document corpus.  Returns rows processed."""
    from parsel_ray.functions.text import token_stats
    from parsel_ray.pipelines.queries import _doc_html
    from parsel_ray.stages.extract import ExtractSpec, SelectorExtract

    ds = (
        replicated_docs(sf_dir, REPLICATE)
        .map_batches(_doc_html, batch_format="pyarrow")
        .map_batches(
            SelectorExtract(
                specs=[
                    ExtractSpec("p_text", "css", "p.t::text", "get"),
                    ExtractSpec("hrefs", "css", "a::attr(href)", "getall"),
                    ExtractSpec("n_imgs", "xpath", "//a/img/@src", "count"),
                ],
                input_col="page",
                doc_type="html",
            ),
            batch_format="pyarrow",
            batch_size=256,
        )
        .map_batches(lambda t: token_stats(t, "p_text"), batch_format="pyarrow")
    )
    return ds.count()


def bench_q1(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import q1_pricing_summary

    return q1_pricing_summary(sf_dir).count()


def bench_hash_join(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import hash_join_priority

    return hash_join_priority(sf_dir).count()


def bench_minhash(sf_dir: str) -> int:
    from parsel_ray.functions import dedup as D

    ds = replicated_docs(sf_dir, max(1, REPLICATE // 5))
    sigs = ds.map_batches(
        D.MinHasher(col="text", num_perm=64, k=5),
        batch_format="pyarrow",
        batch_size=512,
    ).select_columns(["doc_id", "sig"])
    bands = sigs.map_batches(
        lambda t: D.emit_band_rows(t, "doc_id", bands=16, rows_per_band=4),
        batch_format="pyarrow",
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id", 0.8, num_partitions=64)
    return pairs.count()


def bench_knn(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import embedding_knn

    return embedding_knn(sf_dir).count()


def bench_sessionize(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import events_sessionize

    return events_sessionize(sf_dir).count()


BENCHES = {
    "extract": bench_extract,
    "q1": bench_q1,
    "hash_join": bench_hash_join,
    "dedup_minhash": bench_minhash,
    "knn": bench_knn,
    "sessionize": bench_sessionize,
}

HEADLINE = "extract"


def _warm_workers() -> None:
    """Spawn the worker pool before timing: a fixed-size production cluster
    has warm workers; cold python-process spawn (~50 s for 64 procs here)
    is not pipeline throughput."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    def touch(t: pa.Table) -> pa.Table:
        _ = np.asarray(t["id"])  # force numpy/pandas import in the worker
        import pandas  # noqa: F401

        return t

    rd.range(NUM_CPUS * 4, override_num_blocks=NUM_CPUS * 4).map_batches(
        touch, batch_format="pyarrow"
    ).groupby("id").count().count()


def run_suite(names) -> dict:
    _init_ray()
    _warm_workers()
    times, rows = {}, {}
    for name in names:
        t0 = time.perf_counter()
        n = BENCHES[name](SF_DIR)
        dt = time.perf_counter() - t0
        times[name] = round(dt, 3)
        rows[name] = n
    return {"times": times, "rows": rows}


def main() -> None:
    if "--scaling" in sys.argv:
        results = {}
        for ncpu in (8, 32):
            env = dict(
                os.environ,
                RAY_GRAFT_CPUS=str(ncpu),
                BENCH_ONLY=HEADLINE,
                GRAFT_SF_DIR=SF_DIR,
            )
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            results[ncpu] = json.loads(out.strip().splitlines()[-1])
        t8 = results[8]["queries"][HEADLINE]
        t32 = results[32]["queries"][HEADLINE]
        docs = results[32].get("headline_rows", 0)
        eff = (t8 / t32) / (32 / 8)
        print(
            json.dumps(
                {
                    "metric": "headline extraction scaling (8 vs 32 cpus)",
                    "sec_8": t8,
                    "sec_32": t32,
                    "docs": docs,
                    "docs_per_sec_8": round(docs / t8, 1) if docs else None,
                    "docs_per_sec_32": round(docs / t32, 1) if docs else None,
                    "scaling_efficiency": round(eff, 3),
                    "sf": SF_DIR,
                }
            )
        )
        return

    only = os.environ.get("BENCH_ONLY")
    names = [only] if only else list(BENCHES)
    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("documents", "lineitem", "orders", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")
    r = run_suite(names)
    total = round(sum(r["times"].values()), 3)
    print(
        json.dumps(
            {
                "metric": "bench suite total (docs extracted + relational + dedup + knn)",
                "value": total,
                "unit": "sec",
                "queries": r["times"],
                "headline_rows": r["rows"].get(HEADLINE, 0),
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
