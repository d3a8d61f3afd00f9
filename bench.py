"""Benchmark driver: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "throughput": {name: rows_per_sec, ...}}

``--scaling``: runs the selected pipelines at two parallelism levels
($SCALE_LEVELS, default 4,16) in FRESH processes on the same input,
each level CONFINED to that many cores via sched_setaffinity (the
whole local Ray instance — raylet, object store, workers, num_cpus=0
coordination actors — inherits the mask), as INTERLEAVED back-to-back
(lo, hi) pairs, printing throughput at both plus the median per-pair
scaling efficiency (the sandbox stand-in for the N-node vs 4N-node
cluster criterion; see BASELINE.md §Round-3 scaling).
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

# --scaling subprocesses set this: confine the WHOLE local Ray instance
# (this driver + raylet + object store + every worker and actor it
# forks) to the first N cores, BEFORE ray.init.  An N-node cluster's
# daemons and coordination actors live inside the same N nodes' core
# budget — an unconfined ray.init(num_cpus=N) on a 32-vCPU box instead
# lets daemons, num_cpus=0 actors, and worker threadpools ride free on
# the idle cores, inflating the low level and deflating the measured
# scaling ratio (measured: 3-cpu crawl read 317 s unconfined vs 229 s
# honest 4-core-confined work rate; 12-cpu read 104-160 s unconfined —
# scattered across 32 vCPUs — vs 63-77 s confined to 16).
_AFF = os.environ.get("RAY_GRAFT_AFFINITY")
if _AFF:
    os.sched_setaffinity(0, set(range(int(_AFF))))


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

    import pyarrow.parquet as pq

    import ray

    # The input file is ONE tiny parquet row group: a read-based pipeline
    # collapses into a single bundle and serializes every fused stage
    # behind it.  Instead: broadcast the source table once (ray.put),
    # generate each shard's expanded slice in its own Ray task, and build
    # the Dataset from those REAL (multi-MB) blocks — downstream
    # map_batches then parallelizes naturally, no bundling tricks needed.
    src = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    ).replace_schema_metadata(None)  # b'pandas' metadata makes the schema
    # unhashable (dict) — Ray then logs a schema-dedup warning per stage
    src_ref = ray.put(src)
    n = len(src)
    total = n * factor
    shards = NUM_CPUS * 4
    # replica-id stride ABOVE the real id range: a fixed 1e6 stride
    # would collide replicas with base ids on tables holding >= 1M docs
    import pyarrow.compute as _pc

    stride = int(_pc.max(src["doc_id"]).as_py() or 0) + 1

    @ray.remote
    def gen_shard(t: pa.Table, sid: int) -> pa.Table:
        import numpy as np

        lo = sid * total // shards
        hi = (sid + 1) * total // shards
        gidx = np.arange(lo, hi, dtype=np.int64)
        part = t.take(pa.array(gidx % n))
        ids = part["doc_id"].to_numpy(zero_copy_only=False) + (gidx // n) * stride
        return part.set_column(
            part.schema.get_field_index("doc_id"), "doc_id", pa.array(ids)
        )

    refs = [gen_shard.remote(src_ref, sid) for sid in range(shards)]
    return rd.from_arrow_refs(refs)


def bench_extract(sf_dir: str) -> int:
    """Headline: HTML build → parse → CSS/XPath extraction → token stats,
    over the replicated document corpus.  Returns rows processed."""
    from parsel_ray.functions.text import token_stats
    from parsel_ray.pipelines.queries import _doc_html
    from parsel_ray.stages.extract import ExtractSpec, SelectorExtract

    ds = (
        replicated_docs(sf_dir, REPLICATE)
        .map_batches(_doc_html, batch_format="pyarrow", batch_size=None)
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
            batch_size=None,
        )
        .map_batches(lambda t: token_stats(t, "p_text"), batch_format="pyarrow",
                     batch_size=None)
    )
    return ds.count()


def bench_q1(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import q1_pricing_summary

    return q1_pricing_summary(sf_dir).count()


def bench_hash_join(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import hash_join_priority

    return hash_join_priority(sf_dir).count()


def bench_minhash(sf_dir: str) -> int:
    """The standard dedup pipeline order: EXACT dedup first (the corpus is
    replica-heavy), then MinHash-LSH near-dup over the distinct texts —
    the pair stage sees the true near-dup structure, not replica floods."""
    from parsel_ray.functions import dedup as D
    from parsel_ray.functions.text import fingerprint

    ds = replicated_docs(sf_dir, max(1, REPLICATE // 5))
    # fingerprint-keyed first-wins shuffle carrying full rows — the 100 TB
    # shape (no driver-side survivor-id set; per-batch combiner bounds the
    # shuffle at one row per distinct fingerprint per batch)
    distinct = D.exact_dedup_rows(
        ds.map_batches(fingerprint, batch_format="pyarrow"),
        fp_col="fingerprint", id_col="doc_id", num_partitions=32,
    ).drop_columns(["fingerprint"])
    sigs = distinct.map_batches(
        D.MinHasher(col="text", num_perm=64, k=5),
        batch_format="pyarrow",
        batch_size=None,
    ).select_columns(["doc_id", "sig"]).materialize()
    bands = sigs.map_batches(
        lambda t: D.emit_band_rows(t, "doc_id", bands=16, rows_per_band=4),
        batch_format="pyarrow",
        batch_size=None,
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id", 0.8, num_partitions=64)
    # distributed verify + components (same path as the gate query — no
    # driver-side signature materialization)
    verified = D.distributed_verify_pairs(
        pairs, sigs, id_col="doc_id", num_perm=64, threshold=0.8
    )
    labels = D.label_propagation_components(verified)
    return labels.count()


def bench_knn(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import embedding_knn

    return embedding_knn(sf_dir).count()


def bench_sessionize(sf_dir: str) -> int:
    from parsel_ray.pipelines.queries import events_sessionize

    return events_sessionize(sf_dir).count()


def crawl_config(scale: int = 1):
    """Crawl bench configuration.  ``scale`` widens the synthetic web
    (pages-per-host and seeds ×scale — host count only grows the zipf web
    logarithmically, page depth grows it linearly) WITHOUT adding BSP
    epochs — the per-epoch actor-RTT/barrier cost is a fixed serial term
    (~6.5 s at sf0.1 probe size, measured), so the default probe
    under-reads scaling efficiency the way a 7 k-URL crawl would
    under-read a 10^10-URL frontier; the scaling probe passes scale>1
    (env ``BENCH_CRAWL_SCALE``) to amortize it, mirroring extract's
    ``BENCH_REPLICATE`` bump."""
    from parsel_ray.crawl.oracle import CrawlConfig
    from parsel_ray.crawl.pagestore import StoreConfig

    return CrawlConfig(
        store=StoreConfig(
            n_hosts=64,
            pages_per_host=2048 * scale,
            figures_base=5,
            figures_mod=4,
            links_base=3,
            links_mod=5,
            img_size_min=48,
            img_size_span=81,
        ),
        n_seeds=64 * scale,
        max_depth=12,
        max_epochs=40,
        shards=16,
        # politeness budget scales with the web: a fixed 128/host/epoch
        # refill against an 8x-deeper zipf host leaves the crawl tail
        # politeness-starved (128-URL waves that cannot use the cluster —
        # real for ONE giant host, but a 10^10-URL frontier has hosts >>
        # workers and its waves stay wide, which is what the probe models)
        bucket_capacity=128 * scale,
        bucket_refill=128 * scale,
        filter_capacity=(1 << 17) * scale,
    )


def bench_crawl(sf_dir: str) -> int:
    """North-rule headline: URLs fetched+extracted/sec through the full
    frontier (cuckoo seen-set, politeness, robots, priority pops, fetch,
    parsel-kernel extraction, image encode+phash).  Runs the PRODUCTION
    configuration (verify=False — no O(total-URLs) verification
    artifacts); determinism is pinned separately by the byte-match test
    suite at both parallelism levels."""
    import shutil
    import tempfile

    from parsel_ray.crawl.frontier import run_crawl

    out = tempfile.mkdtemp(prefix="crawl_bench_", dir="/tmp")
    scale = int(os.environ.get("BENCH_CRAWL_SCALE", "1"))
    try:
        res = run_crawl(crawl_config(scale), out_dir=out,
                        collect_images=False, verify=False)
    finally:
        shutil.rmtree(out, ignore_errors=True)
    return int(res.metrics["popped"])


def bench_image_codecs(sf_dir: str) -> int:
    """Image-axis throughput: per-doc JPEG + full-PNG + GIF encode→decode
    round-trips through the actor-pool decode stages (added round 3 with
    the full codecs; NOT part of the round-1/2 7-key suite — see
    BASELINE.md round-3 bench notes)."""
    from parsel_ray.pipelines.queries import (
        image_gif_roundtrip,
        image_jpeg_roundtrip,
        image_png_roundtrip,
    )

    n = 0
    for q in (image_jpeg_roundtrip, image_png_roundtrip, image_gif_roundtrip):
        n += q(sf_dir).count()
    return n


def bench_cdc(sf_dir: str) -> int:
    """CDC dedup throughput over ~2 KB binary payloads per doc (round-3
    bench key; see BASELINE.md round-3 bench notes)."""
    from parsel_ray.pipelines.queries import dedup_cdc_docs

    return dedup_cdc_docs(sf_dir).count()


def bench_substring_dedup(sf_dir: str) -> int:
    """Exact duplicated-substring spans (Lee et al. substring dedup as a
    gram-keyed shuffle), hash64 scale mode — the heaviest text-dedup
    shape: O(total chars) slim shuffle rows (round-3 bench key)."""
    import ray.data as rd

    from parsel_ray.functions.dedup import duplicated_substring_spans

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    return duplicated_substring_spans(
        ds, L=32, key="hash64", num_partitions=32
    ).count()


BENCHES = {
    "crawl": bench_crawl,
    "extract": bench_extract,
    "q1": bench_q1,
    "hash_join": bench_hash_join,
    "dedup_minhash": bench_minhash,
    "knn": bench_knn,
    "sessionize": bench_sessionize,
    # round-3 additions (new keys; the 7 keys above are unchanged and
    # remain comparable round-over-round)
    "image_codecs": bench_image_codecs,
    "cdc_dedup": bench_cdc,
    "substring_dedup": bench_substring_dedup,
}

HEADLINE = "extract"


def _warm_workers() -> None:
    """Spawn the full worker pool before timing: a fixed-size production
    cluster has warm workers; cold python-process spawn (~1 s/proc, ~50 s
    for a 64-proc storm) is not pipeline throughput."""
    import time as _time

    import ray

    @ray.remote
    def touch():
        import numpy  # noqa: F401
        import pandas  # noqa: F401
        import pyarrow  # noqa: F401

        import parsel_ray  # noqa: F401

        _time.sleep(0.3)  # hold the worker so each task lands on its own

    ray.get([touch.remote() for _ in range(NUM_CPUS + 4)])
    # also exercise a tiny Dataset INCLUDING a groupby, so Ray Data's
    # executor and the sort-shuffle machinery are warm before timing
    import ray.data as rd

    rd.range(256, override_num_blocks=8).groupby("id").count().count()


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
        # N vs 4N cores in fresh processes on the same input, each level
        # CONFINED to its core budget with sched_setaffinity (see _AFF
        # above).  Confinement is what makes the two levels commensurable:
        # a real N-node cluster runs raylet/GCS/driver daemons, num_cpus=0
        # coordination actors, and worker threadpools INSIDE its N nodes'
        # cores; without the mask all of those ride free on the box's
        # idle vCPUs at the low level (inflating it) and scatter across
        # 32 vCPUs at the high level (hypervisor-degrading it) — measured
        # spread at 12 unconfined cpus was 104-160 s for a crawl that
        # confined-16 runs in 63-77 s.  4 vs 16 keeps the exact 4x ratio
        # with both levels inside the box's ~16 fast cores.
        lo, hi = (int(x) for x in os.environ.get("SCALE_LEVELS", "4,16").split(","))
        report = {"metric": f"scaling ({lo} vs {hi} cpus, fresh processes, same input)",
                  "sf": SF_DIR, "pipelines": {}}
        repeats = int(os.environ.get("SCALE_REPEATS", "3"))

        def steal_pct(sample_s: float = 2.0) -> float:
            # hypervisor CPU steal is the dominant noise source on this
            # box (10%+ bursts, invisible to loadavg — a 12-cpu phase
            # under 12% steal reads ~12% slow and sinks the efficiency
            # ratio); sample it directly from /proc/stat
            def snap():
                parts = open("/proc/stat").readline().split()
                vals = list(map(int, parts[1:9]))
                return vals

            a = snap()
            time.sleep(sample_s)
            b = snap()
            d = [y - x for x, y in zip(a, b)]
            tot = sum(d) or 1
            return 100.0 * d[7] / tot

        def wait_for_quiet(max_wait: float = 240.0, threshold: float = 8.0,
                           steal_max: float = 4.0):
            # the box is shared: external load spikes and hypervisor
            # steal bursts distort individual runs; waiting briefly for a
            # quiet window removes most of the noise the median can't
            waited = 0.0
            while waited < max_wait:
                if os.getloadavg()[0] > threshold:
                    time.sleep(5)
                    waited += 5.0
                    continue
                if steal_pct() > steal_max:  # 2 s sample
                    waited += 2.0
                    time.sleep(8)
                    waited += 8.0
                    continue
                return
        pipes = os.environ.get("SCALE_PIPELINES", "crawl,extract").split(",")
        for name in pipes:

            def run_once(ncpu: int) -> dict:
                env = dict(
                    os.environ,
                    RAY_GRAFT_CPUS=str(ncpu),
                    RAY_GRAFT_AFFINITY=str(ncpu),
                    BENCH_ONLY=name,
                    GRAFT_SF_DIR=SF_DIR,
                )
                if name == "extract":
                    # larger corpus for the scaling probe: amortizes the
                    # ~1 s fixed pipeline cost that otherwise caps the
                    # efficiency reading.  Round 4 doubled 80 → 160: at
                    # 80 the confined-16 level finishes in ~11 s, small
                    # enough that ambient drift dominated the pair
                    # ratios (observed spread 0.65-0.93 in one 5-pair
                    # run); ~22 s halves the fixed-cost share and the
                    # noise sensitivity
                    env["BENCH_REPLICATE"] = str(max(REPLICATE, 160))
                if name == "crawl":
                    # wider synthetic web for the scaling probe: the BSP
                    # epoch barrier is a fixed serial term per epoch that
                    # the 7 k-URL default probe cannot amortize; ×scale
                    # hosts-depth/seeds keeps the epoch count while
                    # widening each wave — the 10^10-URL frontier shape
                    env["BENCH_CRAWL_SCALE"] = os.environ.get(
                        "BENCH_CRAWL_SCALE", "16")
                wait_for_quiet()
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env,
                    capture_output=True,
                    text=True,
                    check=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                ).stdout
                r = json.loads(out.strip().splitlines()[-1])
                return {"sec": r["queries"][name],
                        "rows": r.get("headline_rows", 0)}

            # INTERLEAVED PAIRS, not level blocks: this box's effective
            # speed drifts ±25% over tens of minutes (hypervisor
            # co-tenancy invisible to steal%/loadavg — measured: identical
            # 12-cpu runs 83 s and 103 s an hour apart on a 0% steal,
            # idle box).  Two level blocks 15 min apart turn that drift
            # straight into efficiency error; a back-to-back (lo, hi)
            # pair spans only its own ~7 min, and the median of per-pair
            # ratios cancels any drift slower than that.
            pairs = []
            for _ in range(repeats):
                a = run_once(lo)
                b = run_once(hi)
                pairs.append((a, b, (a["sec"] / b["sec"]) / (hi / lo)))
            pairs.sort(key=lambda p: p[2])
            mid = pairs[len(pairs) // 2]
            lo_secs = sorted(p[0]["sec"] for p in pairs)
            hi_secs = sorted(p[1]["sec"] for p in pairs)
            rows = mid[1]["rows"]
            report["pipelines"][name] = {
                f"sec_{lo}": mid[0]["sec"],
                f"sec_{hi}": mid[1]["sec"],
                f"sec_{lo}_all": lo_secs,
                f"sec_{hi}_all": hi_secs,
                "rows": rows,
                f"rows_per_sec_{lo}": round(rows / mid[0]["sec"], 1) if rows else None,
                f"rows_per_sec_{hi}": round(rows / mid[1]["sec"], 1) if rows else None,
                "pair_efficiencies": [round(p[2], 3) for p in pairs],
                "scaling_efficiency": round(mid[2], 3),
            }
        print(json.dumps(report))
        return

    only = os.environ.get("BENCH_ONLY")
    names = [only] if only else list(BENCHES)
    # warm the page cache so we measure compute+shuffle, not first disk
    # read — but only the tables the SELECTED benches touch (bench_crawl
    # reads no parquet at all; in --scaling mode this runs in every
    # repeat subprocess)
    import pyarrow.parquet as pq

    _WARM = {
        "extract": ("documents",),
        "q1": ("lineitem",),
        "hash_join": ("orders", "lineitem"),
        "dedup_minhash": ("documents",),
        "knn": ("embeddings",),
        "sessionize": ("events",),
        "image_codecs": ("documents",),
        "cdc_dedup": ("documents",),
        "substring_dedup": ("documents",),
    }
    for t in sorted({t for n in names for t in _WARM.get(n, ())}):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            pq.read_table(p)
    r = run_suite(names)
    total = round(sum(r["times"].values()), 3)
    headline_rows = r["rows"].get(only or HEADLINE, 0)
    # the round-1/2 suite was the first 7 keys; core_total keeps the
    # round-over-round comparison clean after the round-3 bench additions
    _CORE = ("crawl", "extract", "q1", "hash_join", "dedup_minhash",
             "knn", "sessionize")
    core = round(sum(v for k, v in r["times"].items() if k in _CORE), 3)
    print(
        json.dumps(
            {
                "metric": "bench suite total (docs extracted + relational + dedup + knn)",
                "value": total,
                "unit": "sec",
                "core_total": core,
                "queries": r["times"],
                "headline_rows": headline_rows,
                "sf": SF_DIR,
                "num_cpus": NUM_CPUS,
            }
        )
    )
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
