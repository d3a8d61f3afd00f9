"""Distributed crawl frontier: K host-sharded stateful actors (cuckoo
seen-set + token buckets + robots cache + pending queue) around a Ray
Data fetch+extract stage, in epoch-BSP rounds whose pop order and seen
set byte-match :func:`parsel_ray.crawl.oracle.oracle_crawl` at ANY
parallelism (crawl operators N2-N6, N11, N13).

Determinism recipe (same as the oracle, see oracle.py docstring):
priority key (depth, url); per-shard insert sequences pinned by sorting
the epoch's links by (parent_depth, parent_url, link_index) before
routing; K fixed in the config (scale nodes, not shard count).

Scale notes: the fetch+extract stage is a plain Dataset ``map_batches``
over the epoch's grants — extraction parallelism is independent of host
skew (a hot host's pages spread over all workers; its FETCH rate is
bounded by its token bucket by design, so hot-host splitting cannot
raise fetch throughput — it only parallelizes extraction, which this
layout already does).  Frontier actors do O(links) dict/filter work per
epoch — they are coordination, not compute.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from ..state.cuckoo import CuckooFilter, hash64_many
from ..state.robots import RobotsCache
from ..state.tokenbucket import TokenBuckets
from .extract import extract_page
from .oracle import CrawlConfig, CrawlResult, shard_of
from .pagestore import PageStore, make_seeds, page_indices
from .urlnorm import canonical_url, host_of, path_of

IMAGE_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("bytes", pa.binary()),
        ("w", pa.int32()),
        ("h", pa.int32()),
        ("fmt", pa.string()),
        ("caption", pa.string()),
        ("phash", pa.int64()),
    ]
)


@ray.remote
class FrontierShard:
    """One shard: seen-set segment + politeness + robots + pending queue.

    Hosts are fully contained in one shard (shard = fnv(host) % K), so
    per-host budgets and the seen set need no cross-shard coordination.
    """

    def __init__(self, shard_id: int, cfg: CrawlConfig, verify: bool = True,
                 keep_insert_log: bool = True) -> None:
        self.shard_id = shard_id
        self.cfg = cfg
        self.verify = verify
        # the O(delta) replay log only has a consumer when checkpointing
        # is on; without one it would quietly grow into the full URL
        # string set the verify=False contract promises NOT to hold
        self.keep_insert_log = keep_insert_log
        store = PageStore(cfg.store)
        self.filter = CuckooFilter(cfg.filter_capacity)
        self.buckets = TokenBuckets(cfg.bucket_capacity, cfg.bucket_refill)
        self.robots = RobotsCache(store.robots_txt)
        self.pending: list[tuple[int, str]] = []
        # exact URL dump: a VERIFICATION artifact (byte-match vs oracle /
        # kill-resume tests).  At production scale verify=False keeps only
        # the cuckoo filter — O(1)/URL memory instead of the full string set.
        self.seen: list[str] = []
        self.metrics = {"granted": 0, "dup_skipped": 0, "robots_blocked": 0,
                        "depth_dropped": 0, "admitted": 0}
        # keys successfully inserted into the cuckoo filter since the last
        # checkpoint — the O(delta) replay log for incremental checkpoints
        # (cuckoo inserts are a pure function of the insert sequence, so
        # replaying the log from a full snapshot is byte-identical)
        self._insert_log: list[str] = []
        self._last_full_epoch: int | None = None
        self._deltas_since_full = 0
        # wall-clock phase profile (gather / admit / pop), kept OUT of
        # self.metrics: metrics must stay byte-comparable across runs
        # (equivalence + resume tests); run_crawl folds these in under
        # driver_shard_*_ms which the semantic comparisons filter
        self._phase = {"gather": 0.0, "order": 0.0, "admit": 0.0, "pop": 0.0}

    # -- admission (links arrive pre-canonicalized, pre-sorted) -----------

    def admit_batch(self, items: list) -> int:
        """items: [(depth, canonical_url), ...] in the deterministic global
        order; returns number admitted to pending."""
        return self._admit_many(
            [d for d, _ in items], [u for _, u in items]
        )

    def _admit_many(self, depths, urls: list, hashes=None) -> int:
        """Vectorized admission, byte-identical to the sequential
        ``add_if_new`` loop it replaces.

        ~90% of candidate links at web scale are dup-skips; those used to
        pay a per-byte Python FNV hash plus scalar filter probes EACH.
        Now ONE ``hash64_many`` pass hashes the batch, a uint64
        ``np.unique`` drops intra-batch repeats (the filter observes keys
        only through this hash, so hash-equal keys are
        filter-indistinguishable — the sequential loop would have
        dup-skipped them identically), and one ``contains_hashes`` gather
        answers the pre-batch seen-set.  Filter state only grows, so a
        vector True is final; vector-absent survivors still run the
        ORIGINAL scalar ``add_if_new`` (with the precomputed hash) in
        sequence order, so placement/eviction order, the insert log,
        ``seen``, metrics, and every false positive stay byte-identical.
        """
        _t0 = time.perf_counter()
        n0 = len(self.pending)
        n = len(urls)
        if n:
            if hashes is None:
                hashes = hash64_many(urls)
            _, first_idx = np.unique(hashes, return_index=True)
            first_idx.sort()  # original sequence order
            self.metrics["dup_skipped"] += n - len(first_idx)
            found = self.filter.contains_hashes(hashes[first_idx])
            self.metrics["dup_skipped"] += int(found.sum())
            cand_idx = first_idx[~found]
        else:
            cand_idx = ()
        for i in cand_idx:
            cu = urls[i]
            if not self.filter.add_if_new(cu, hashes[i]):
                # fingerprint placed by an earlier key in THIS batch — the
                # sequential loop would have dup-skipped it here too
                self.metrics["dup_skipped"] += 1
                continue
            if self.keep_insert_log:
                self._insert_log.append(cu)
            if self.verify:
                self.seen.append(cu)
            if not self.robots.allowed(host_of(cu), path_of(cu)):
                self.metrics["robots_blocked"] += 1
                continue
            depth = int(depths[i])
            if depth > self.cfg.max_depth:
                self.metrics["depth_dropped"] += 1
                continue
            self.pending.append((depth, cu))
        self.metrics["admitted"] += len(self.pending) - n0
        self._phase["admit"] += time.perf_counter() - _t0
        return len(self.pending) - n0

    # -- epoch ------------------------------------------------------------

    def pop_batch(self) -> list:
        """Grant this epoch's fetches: pending sorted by (depth, url),
        gated by per-host tokens.  Deferred URLs stay pending."""
        _t0 = time.perf_counter()
        self.pending.sort(key=lambda du: (du[0], du[1]))
        grants, deferred = [], []
        for d, u in self.pending:
            if self.buckets.consume(host_of(u)):
                grants.append((d, u))
            else:
                deferred.append((d, u))
        self.pending = deferred
        self.metrics["granted"] += len(grants)
        self._phase["pop"] += time.perf_counter() - _t0
        return grants

    def end_epoch(self) -> None:
        self.buckets.tick()

    def _gather_links(self, link_refs: list) -> "tuple | None":
        """Shard-side link routing (round-2): materialize this shard's
        per-chunk link tables straight from the object store and order them
        by the UNIQUE key (parent_depth, parent_url, link_index).  A sort of
        the shard's restriction of the global link set equals the shard's
        subsequence of the globally-sorted order, so the oracle's per-shard
        insert sequence is preserved without the driver ever touching
        O(links) rows."""
        if not link_refs:
            return None
        _t0 = time.perf_counter()
        tables = [t for t in ray.get(list(link_refs)) if t is not None and len(t)]
        self._phase["gather"] += time.perf_counter() - _t0
        if not tables:
            return None
        _t0 = time.perf_counter()
        t = pa.concat_tables(tables).sort_by(
            [
                ("parent_depth", "ascending"),
                ("parent_url", "ascending"),
                ("link_index", "ascending"),
            ]
        )
        # (depths, urls, hashes) arrays — no per-link tuple
        # materialization; the vectorized _admit_many consumes them
        # directly.  Hashes were precomputed in the fetch tasks ("h"
        # column); older link tables without it fall back to hashing
        # inside _admit_many.
        hashes = (
            t["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if "h" in t.column_names else None
        )
        out = (t["parent_depth"].to_numpy() + 1, t["url"].to_pylist(), hashes)
        self._phase["order"] += time.perf_counter() - _t0
        return out

    def _admit_pre_and_links(self, link_refs: list) -> int:
        """Preadmit replay first, then this epoch's links — the same
        sequence the old single concatenated admit_batch call produced."""
        n = self.admit_batch(self._take_preadmit())
        links = self._gather_links(link_refs)
        if links is not None:
            n += self._admit_many(links[0], links[1], links[2])
        return n

    def admit_and_tick(self, link_refs: list) -> int:
        """Admit this shard's links (gathered + ordered shard-side), then
        the epoch tick — identical op sequence to admit_batch + end_epoch."""
        n = self._admit_pre_and_links(link_refs)
        self.buckets.tick()
        return n

    def _take_preadmit(self) -> list:
        pre = getattr(self, "_preadmit", None) or []
        self._preadmit = []
        return list(pre)

    def admit_tick_pop(self, link_refs: list) -> tuple:
        """ONE actor round-trip per epoch: admit last epoch's links, tick,
        pop the next epoch's grants.  The per-shard op sequence is
        identical to admit_batch+end_epoch+pop_batch; the very first call
        (link_refs=[] after seeding) ticks empty/full buckets — a no-op.
        Links checkpointed in-flight (popped before the snapshot, admitted
        after) replay first on resume.  Returns (grants, pending_count)."""
        self._admit_pre_and_links(link_refs)
        self.buckets.tick()
        grants = self.pop_batch()
        return grants, len(self.pending)

    def pending_count(self) -> int:
        return len(self.pending)

    def seen_urls(self) -> list:
        return list(self.seen)

    def get_metrics(self) -> dict:
        return dict(self.metrics)

    def get_phase_ms(self) -> dict:
        return {k: int(v * 1000) for k, v in self._phase.items()}

    # -- checkpoint (N11) --------------------------------------------------

    def checkpoint(self, ckpt_dir: str, epoch: int,
                   pending_admit_refs: "list | None" = None,
                   full_every: int = 8) -> str:
        """``pending_admit_refs``: object refs of this epoch's extracted
        link tables that have not yet gone through admit_tick_pop — they
        belong to the snapshot (the op sequence on resume replays them
        first, in the same shard-side deterministic order).

        INCREMENTAL: every ``full_every``-th checkpoint writes the full
        filter bitmap + seen list; the ones between write only the keys
        inserted since the previous checkpoint (O(delta) bytes — cuckoo
        inserts are a pure function of the insert sequence, so replaying
        the delta chain from the base snapshot is byte-identical).  The
        small frontier state (pending/preadmit/buckets/robots/metrics)
        rides along in full every time."""
        # read-only: the same refs are admitted via admit_tick_pop next
        # epoch, so the snapshot must not stash them into _preadmit
        pending_admits = list(getattr(self, "_preadmit", None) or [])
        links = self._gather_links(pending_admit_refs or [])
        if links is not None:
            pending_admits += [
                (int(d), u) for d, u in zip(links[0], links[1])
            ]
        d = os.path.join(ckpt_dir, f"epoch={epoch}")
        os.makedirs(d, exist_ok=True)
        is_full = (
            self._last_full_epoch is None
            or self._deltas_since_full >= full_every - 1
        )
        cols = {
            "shard": pa.array([self.shard_id], pa.int32()),
            "epoch": pa.array([epoch], pa.int32()),
            "kind": pa.array(["full" if is_full else "delta"]),
            "buckets_json": pa.array([json.dumps(self.buckets.state())]),
            "robots_json": pa.array([json.dumps(self.robots.state())]),
            "pending_depth": pa.array([[d for d, _ in self.pending]],
                                      pa.list_(pa.int32())),
            "pending_url": pa.array([[u for _, u in self.pending]],
                                    pa.list_(pa.string())),
            "preadmit_depth": pa.array([[d_ for d_, _ in pending_admits]],
                                       pa.list_(pa.int32())),
            "preadmit_url": pa.array([[u for _, u in pending_admits]],
                                     pa.list_(pa.string())),
            "metrics_json": pa.array([json.dumps(self.metrics)]),
        }
        if is_full:
            st = self.filter.state()
            cols.update(
                {
                    "filter_table": pa.array([st["table"].tobytes()],
                                             pa.binary()),
                    "filter_buckets": pa.array([st["table"].shape[0]],
                                               pa.int64()),
                    "filter_count": pa.array([st["count"]], pa.int64()),
                    "filter_kick": pa.array([st["kick"]], pa.int64()),
                    "filter_stash": pa.array(
                        [json.dumps(st["stash"])], pa.string()
                    ),
                    "seen": pa.array([self.seen], pa.list_(pa.string())),
                }
            )
        else:
            cols.update(
                {
                    "base_epoch": pa.array([self._last_full_epoch],
                                           pa.int32()),
                    "insert_log": pa.array([self._insert_log],
                                           pa.list_(pa.string())),
                }
            )
        path = os.path.join(d, f"shard-{self.shard_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(pa.table(cols), tmp)
        os.replace(tmp, path)  # atomic publish
        if is_full:
            self._last_full_epoch = epoch
            self._deltas_since_full = 0
        else:
            self._deltas_since_full += 1
        self._insert_log = []
        return path

    def _shard_ckpt_row(self, ckpt_dir: str, epoch: int) -> dict:
        path = os.path.join(
            ckpt_dir, f"epoch={epoch}", f"shard-{self.shard_id}.parquet"
        )
        t = pq.read_table(path)
        return {c: t[c][0].as_py() for c in t.column_names}

    def restore(self, ckpt_dir: str, epoch: int) -> None:
        row = self._shard_ckpt_row(ckpt_dir, epoch)
        if row.get("kind", "full") == "full":
            base_row, deltas = row, []
            self._last_full_epoch = epoch
            self._deltas_since_full = 0
        else:
            # delta chain: base full snapshot, then every checkpoint of
            # this shard in (base, epoch] in epoch order (byte-match
            # determinism makes files from a killed run identical to the
            # rerun's, so the chain is well-defined across resumes)
            import glob as _glob

            base = int(row["base_epoch"])
            base_row = self._shard_ckpt_row(ckpt_dir, base)
            assert base_row.get("kind", "full") == "full", (
                f"delta at epoch={epoch} points at base epoch={base} "
                "which is not a full snapshot"
            )
            chain_epochs = sorted(
                e
                for p in _glob.glob(os.path.join(ckpt_dir, "epoch=*"))
                if (e := int(os.path.basename(p).split("=")[1])) > base
                and e <= epoch
                and os.path.exists(
                    os.path.join(p, f"shard-{self.shard_id}.parquet")
                )
            )
            deltas = [self._shard_ckpt_row(ckpt_dir, e) for e in chain_epochs]
            self._last_full_epoch = base
            self._deltas_since_full = len(deltas)
        table = np.frombuffer(
            base_row["filter_table"], dtype=np.uint16
        ).reshape(base_row["filter_buckets"], -1)
        self.filter = CuckooFilter.from_state(
            {
                "table": table,
                "count": base_row["filter_count"],
                "kick": base_row["filter_kick"],
                # pre-stash checkpoints lack the column (their runs could
                # never leave a non-empty stash: add() used to hard-fail)
                "stash": json.loads(base_row.get("filter_stash") or "[]"),
            }
        )
        self.seen = list(base_row["seen"])
        for drow in deltas:
            assert drow.get("kind") == "delta" and \
                int(drow["base_epoch"]) == self._last_full_epoch, (
                "checkpoint chain mixes bases — remove stale epochs"
            )
            for cu in drow["insert_log"]:
                if not self.filter.add(cu):  # pragma: no cover
                    raise RuntimeError("cuckoo filter full during replay")
                if self.verify:
                    self.seen.append(cu)
        # the small frontier state always comes from the TARGET epoch's row
        self.buckets = TokenBuckets.from_state(json.loads(row["buckets_json"]))
        self.robots.restore(json.loads(row["robots_json"]))
        self.pending = list(zip(row["pending_depth"], row["pending_url"]))
        self._preadmit = list(zip(row.get("preadmit_depth", []),
                                  row.get("preadmit_url", [])))
        self.metrics = json.loads(row["metrics_json"])
        self._insert_log = []


class FetchExtract:
    """Stateless map_batches kernel: (depth, url) grants → unified rows:
    kind="img" image-corpus rows / kind="link" out-link rows (already
    canonicalized) / kind="err" fetch failures.  The page store is
    rebuilt lazily per worker from the (tiny, picklable) config."""

    def __init__(self, cfg: CrawlConfig) -> None:
        self.cfg = cfg
        self._store = None

    def __getstate__(self):
        return self.cfg

    def __setstate__(self, cfg):
        self.cfg = cfg
        self._store = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self._store is None:
            self._store = PageStore(self.cfg.store)
        store = self._store
        out = {
            "kind": [], "parent_depth": [], "parent_url": [], "link_index": [],
            "url": [], "shard": [], "image_id": [], "bytes": [], "w": [],
            "h": [], "fmt": [], "caption": [], "phash": [],
        }

        def put(kind, **kw):
            out["kind"].append(kind)
            for c in ("parent_depth", "parent_url", "link_index", "url", "shard",
                      "image_id", "bytes", "w", "h", "fmt", "caption", "phash"):
                out[c].append(kw.get(c))

        depths = t["depth"].to_pylist()
        urls = t["url"].to_pylist()
        for d, u in zip(depths, urls):
            page = store.page(u)
            if page is None:
                put("err", parent_depth=d, parent_url=u)
                continue
            body, enc = page
            links, figures, eff_base = extract_page(body, enc, u)
            for li, link in enumerate(links):
                cu = canonical_url(link, base=eff_base)
                if cu is None:
                    continue
                put(
                    "link", parent_depth=d, parent_url=u, link_index=li, url=cu,
                    shard=shard_of(host_of(cu), self.cfg.shards),
                )
            try:
                h_idx, k_idx = _page_indices(u)
            except ValueError:
                continue
            fmt_by_id = {
                f["image_id"]: f["fmt"] for f in store.figures_of(h_idx, k_idx)
            }
            for fig in figures:
                fmt = fmt_by_id.get(fig["image_id"])
                if fmt is None:
                    continue
                rec = store.image_record(fig["image_id"], fmt)
                put(
                    "img", parent_depth=d, parent_url=u,
                    image_id=rec["image_id"], bytes=rec["bytes"], w=rec["w"],
                    h=rec["h"], fmt=rec["fmt"], caption=fig["caption"],
                    phash=rec["phash"],
                )
        return pa.table(
            {
                "kind": pa.array(out["kind"], pa.string()),
                "parent_depth": pa.array(out["parent_depth"], pa.int32()),
                "parent_url": pa.array(out["parent_url"], pa.string()),
                "link_index": pa.array(out["link_index"], pa.int32()),
                "url": pa.array(out["url"], pa.string()),
                "shard": pa.array(out["shard"], pa.int32()),
                "image_id": pa.array(out["image_id"], pa.string()),
                "bytes": pa.array(out["bytes"], pa.binary()),
                "w": pa.array(out["w"], pa.int32()),
                "h": pa.array(out["h"], pa.int32()),
                "fmt": pa.array(out["fmt"], pa.string()),
                "caption": pa.array(out["caption"], pa.string()),
                "phash": pa.array(out["phash"], pa.int64()),
            }
        )


def _page_indices(url: str) -> tuple[int, int]:
    return page_indices(url)


@ray.remote
def _fetch_chunk(fetcher: FetchExtract, depths: list, urls: list,
                 img_path: "str | None", return_images: bool, n_shards: int):
    """One fetch+extract task over a chunk of the epoch's grants.

    Plain Ray task (not a Dataset stage): the per-epoch BSP loop would pay
    ~seconds of Dataset fixed cost per round, while a task round-trip is
    milliseconds; the kernel is the same map_batches-shaped FetchExtract.

    Image rows are written to ``img_path`` (one parquet shard per chunk,
    atomic tmp+rename) DIRECTLY from the worker — bulk image bytes never
    round-trip through the driver or a shuffle.  Extracted links are
    pre-partitioned by target shard and returned as ``n_shards`` SEPARATE
    return values (``num_returns``) so each FrontierShard pulls only its
    own partition from the object store and the driver handles only refs.

    Returns (images-or-None, (n_images, n_errors), links_shard_0, ...,
    links_shard_K-1) — the error count feeds the oracle-parity "errors"
    metric (fetch misses), gathered lazily after the epoch loop so the
    no-image-output fast path keeps its zero-barrier property.
    Callers must invoke via ``.options(num_returns=2 + n_shards)``."""
    t = fetcher(
        pa.table(
            {"depth": pa.array(depths, pa.int32()), "url": pa.array(urls, pa.string())}
        )
    )
    kinds = t["kind"]
    import pyarrow.compute as pc

    links = t.filter(pc.equal(kinds, "link")).select(
        ["parent_depth", "parent_url", "link_index", "url", "shard"]
    )
    # pre-hash the candidate URLs HERE, in the parallel fetch task: the
    # frontier shards consume the "h" column instead of re-hashing on
    # their serial admission path (same hash64_many values — admission
    # decisions are byte-identical; the hot shard's per-epoch barrier
    # cost drops by its hashing share)
    links = links.append_column(
        "h", pa.array(hash64_many(links["url"].to_pylist()), pa.uint64())
    )
    imgs = t.filter(pc.equal(kinds, "img")).select(
        ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    ).cast(IMAGE_SCHEMA)
    if img_path is not None:
        tmp = img_path + ".tmp"
        pq.write_table(imgs, tmp)
        os.replace(tmp, img_path)
    sh = links["shard"]
    per_shard = tuple(
        links.filter(pc.equal(sh, i)).drop_columns(["shard"])
        for i in range(n_shards)
    )
    n_err = len(t.filter(pc.equal(kinds, "err")))
    return (imgs if return_images else None, (len(imgs), n_err)) + per_shard


def run_crawl(
    cfg: CrawlConfig,
    out_dir: str | None = None,
    ckpt_dir: str | None = None,
    checkpoint_every: int = 0,
    resume_epoch: int | None = None,
    collect_images: bool = True,
    verify: bool = True,
    ckpt_full_every: int = 8,
    ckpt_gc: bool = False,
) -> CrawlResult:
    """Drive the epoch-BSP crawl.  Ray must already be initialised.

    ``out_dir``: per-epoch partitioned parquet image output
    (``images/epoch=E/``) — a resumed run skips finished epochs.
    ``checkpoint_every``: shard checkpoints each E epochs (requires
    ``ckpt_dir``); each checkpoint is INCREMENTAL on the driver side
    (only the pop-order delta since the previous checkpoint) and is
    published atomically with an epoch-level ``_DONE`` marker once the
    driver delta AND every shard snapshot are on disk.
    ``resume_epoch``: restore shard state + pop order from that (complete)
    checkpoint and continue.
    ``verify=False`` drops the O(total-URLs) verification artifacts (exact
    per-shard seen lists, driver pop-order history) for production-scale
    runs: CrawlResult.pop_order/seen_urls come back empty and metrics
    carry the counts instead.
    ``ckpt_full_every``: every Nth shard checkpoint is a full snapshot,
    the ones between are O(delta) insert-log deltas.
    ``ckpt_gc=True``: after each published checkpoint, run
    :func:`gc_checkpoints` — epochs older than the newest all-full
    checkpoint are deleted (driver history consolidated first), bounding
    on-disk checkpoint state for long crawls.
    """
    shards = [
        FrontierShard.remote(
            i, cfg, verify,
            # the log's only consumer is checkpoint(); both knobs must be
            # set for checkpoints to actually run
            keep_insert_log=checkpoint_every > 0 and ckpt_dir is not None,
        )
        for i in range(cfg.shards)
    ]
    pop_order: list[tuple[int, int, str]] = []
    n_popped = 0
    errors_restored = 0
    image_tables: list[pa.Table] = []
    start_epoch = 0

    if resume_epoch is not None:
        assert ckpt_dir is not None
        assert os.path.exists(
            os.path.join(ckpt_dir, f"epoch={resume_epoch}", "_DONE")
        ), f"checkpoint epoch={resume_epoch} is incomplete (no _DONE marker)"
        ray.get([s.restore.remote(ckpt_dir, resume_epoch) for s in shards])
        chain, popped_total, errors_restored = _read_driver_ckpts(
            ckpt_dir, resume_epoch)
        pop_order = chain if verify else []
        # the cumulative count survives verify=False checkpoints (empty
        # deltas carry popped_total metadata), so metrics stay correct
        n_popped = popped_total
        start_epoch = resume_epoch + 1
        if collect_images:
            # recover pre-resume image rows from the partitioned output
            # (without out_dir those epochs' rows are not recoverable —
            # pass out_dir on both runs when the image artifact matters)
            if out_dir:
                import glob as _glob

                for e in range(start_epoch):
                    edir = os.path.join(out_dir, "images", f"epoch={e}")
                    if not os.path.exists(os.path.join(edir, "_DONE")):
                        continue
                    for p in sorted(_glob.glob(os.path.join(edir, "*.parquet"))):
                        image_tables.append(pq.read_table(p).cast(IMAGE_SCHEMA))
    else:
        # seed admission: seed order, routed per shard (subsequence order
        # preserved ⇒ per-shard insert sequence matches the oracle)
        routed: dict[int, list] = {i: [] for i in range(cfg.shards)}
        for seed in make_seeds(cfg.store, cfg.n_seeds):
            cu = canonical_url(seed)
            if cu is None:
                continue
            routed[shard_of(host_of(cu), cfg.shards)].append((0, cu))
        ray.get(
            [s.admit_batch.remote(routed[i]) for i, s in enumerate(shards)]
        )

    # ordinals continue from whichever is further along: the restored
    # history's tail OR the cumulative count (a verify=False interlude
    # advances the count without extending the history — restarting from
    # the stale tail would reuse ordinals)
    pop_ord = max(pop_order[-1][1] + 1 if pop_order else 0, n_popped)
    last_ckpt_len = len(pop_order)
    fetcher = FetchExtract(cfg)
    # per-shard lists of OBJECT REFS of link tables — the driver routes
    # references, never rows; shards pull + order their own partitions
    routed_refs: dict[int, list] = {i: [] for i in range(cfg.shards)}
    # (n_images, n_errors) refs from every fetch chunk, gathered once
    # AFTER the loop (keeps the zero-barrier no-image-output fast path)
    count_refs: list = []

    def _submit_admission(refs: dict) -> list:
        # one actor RTT per shard per epoch: admit the previous epoch's
        # links (shards block on the chunk link refs themselves), tick,
        # pop the next epoch's grants
        return [
            s.admit_tick_pop.remote(refs[i]) for i, s in enumerate(shards)
        ]

    # driver-side phase timings ride along in metrics (lineage: where the
    # epoch-BSP wall-time goes — admission RTT, fetch dispatch, barriers)
    phase_s = {"admit_wait": 0.0, "dispatch": 0.0, "img_barrier": 0.0,
               "epochs": 0}
    admit_futs = _submit_admission(routed_refs)
    routed_refs = {i: [] for i in range(cfg.shards)}
    for epoch in range(start_epoch, cfg.max_epochs):
        _t0 = time.perf_counter()
        results = ray.get(admit_futs)
        phase_s["admit_wait"] += time.perf_counter() - _t0
        phase_s["epochs"] += 1
        admit_futs = None
        grants = sorted(
            (g for lst, _ in results for g in lst), key=lambda du: (du[0], du[1])
        )
        if not grants:
            if sum(p for _, p in results) == 0:
                break
            if epoch + 1 < cfg.max_epochs:
                admit_futs = _submit_admission(routed_refs)  # empty tick
            continue
        if verify:
            for d, u in grants:
                pop_order.append((epoch, pop_ord, u))
                pop_ord += 1
        n_popped += len(grants)

        # fan out fetch+extract as chunked tasks (one Ray task per ~chunk;
        # the kernel itself is the same map_batches-shaped FetchExtract).
        # TAPERED chunk sizes (guided self-scheduling): each chunk takes
        # ~1/(taper*ncpus) of the REMAINING grants, so early chunks are
        # big (low task overhead) and the final ones shrink to 4 URLs —
        # the epoch barrier's straggler tail idles (ncpus-1) slots for
        # the last chunk's duration, and that idle loss grows with
        # parallelism, which is exactly where scaling efficiency is
        # lost.  Grants are hash-ordered first (page cost clusters by
        # host in (depth,url) order; the hash order mixes cheap and
        # expensive pages so chunk cost tracks chunk size) — chunk
        # partition is invariant to the output contract: links re-sort
        # shard-side per epoch, image rows are compared order-free.
        ncpus = int(ray.cluster_resources().get("CPU", 8))
        taper = float(os.environ.get("CRAWL_TAPER", "2"))
        edir = None
        if out_dir:
            edir = os.path.join(out_dir, "images", f"epoch={epoch}")
            if os.path.isdir(edir):
                # re-running this epoch (resume past the checkpoint, or a
                # crashed previous attempt): clear stale shards + _DONE —
                # a smaller re-run writes fewer chunks, and leftover
                # chunk-k.parquet from the bigger run would otherwise be
                # globbed back in as duplicate image rows
                import shutil as _shutil

                _shutil.rmtree(edir)
            os.makedirs(edir, exist_ok=True)
        img_refs, nimg_refs = [], []
        _t0 = time.perf_counter()
        order = np.argsort(
            hash64_many([u for _, u in grants]), kind="stable"
        )
        parts = []
        pos, n_grants = 0, len(order)
        while pos < n_grants:
            c = max(4, int((n_grants - pos) / (taper * ncpus)))
            parts.append([grants[j] for j in order[pos:pos + c]])
            pos += c
        for ci, part in enumerate(parts):
            rets = _fetch_chunk.options(num_returns=2 + cfg.shards).remote(
                fetcher,
                [d for d, _ in part],
                [u for _, u in part],
                os.path.join(edir, f"chunk-{ci}.parquet") if edir else None,
                collect_images,
                cfg.shards,
            )
            img_refs.append(rets[0])
            nimg_refs.append(rets[1])
            count_refs.append(rets[1])
            for i in range(cfg.shards):
                routed_refs[i].append(rets[2 + i])
        phase_s["dispatch"] += time.perf_counter() - _t0
        will_ckpt = bool(
            checkpoint_every and ckpt_dir
            and (epoch + 1) % checkpoint_every == 0
        )
        if epoch + 1 < cfg.max_epochs and not will_ckpt:
            # PIPELINED admission: submit next epoch's admit_tick_pop now
            # (shards block on the chunk link refs themselves and start
            # admitting the moment the last chunk lands), overlapping the
            # driver's image barrier / _DONE publish / pop bookkeeping
            # with shard-side admission.  Checkpoint epochs keep the
            # serial order — the snapshot must capture pre-admission
            # state, and per-actor submission order would run
            # admit_tick_pop before checkpoint otherwise.  The last epoch
            # also stays serial so its leftover links go through the
            # post-loop admit_and_tick (no pop), matching the oracle.
            admit_futs = _submit_admission(routed_refs)
            routed_refs = {i: [] for i in range(cfg.shards)}
        if edir or collect_images:
            # barrier on the (tiny) image-count returns: all chunk
            # side-effects (parquet shards) are on disk before the epoch
            # _DONE marker.  Without image output there is NO driver
            # barrier here — the next epoch's admit_tick_pop blocks on the
            # link refs inside the shards, overlapping fetch stragglers
            # with the next admission round.
            _t0 = time.perf_counter()
            ray.get(nimg_refs)
            phase_s["img_barrier"] += time.perf_counter() - _t0
        if edir:
            open(os.path.join(edir, "_DONE"), "w").close()
        if collect_images:
            image_tables.extend(t for t in ray.get(img_refs) if t is not None)

        if will_ckpt:
            # always written: with verify=False the delta is empty but the
            # popped_total metadata still rides along, so a resume (at
            # EITHER verify setting) restores the cumulative pop count
            _write_driver_ckpt(
                ckpt_dir, epoch,
                pop_order[last_ckpt_len:] if verify else [],
                base=last_ckpt_len, popped_total=n_popped,
                errors_total=errors_restored
                + sum(e for _n, e in ray.get(count_refs)),
            )
            last_ckpt_len = len(pop_order)
            ray.get(
                [
                    s.checkpoint.remote(ckpt_dir, epoch, routed_refs[i],
                                        full_every=ckpt_full_every)
                    for i, s in enumerate(shards)
                ]
            )
            # epoch-level atomic publish: only a checkpoint with driver
            # delta AND all K shard snapshots counts for resume
            open(os.path.join(ckpt_dir, f"epoch={epoch}", "_DONE"), "w").close()
            if ckpt_gc:
                gc_checkpoints(ckpt_dir)
            if epoch + 1 < cfg.max_epochs:
                # serial (non-pipelined) admission after the snapshot —
                # the snapshot captured these refs as preadmit, so
                # admission must happen strictly after it
                admit_futs = _submit_admission(routed_refs)
                routed_refs = {i: [] for i in range(cfg.shards)}

    # max_epochs may truncate the crawl with links still un-admitted — the
    # oracle admits (and ticks) them inside its final iteration, so the seen
    # set must include them for the byte-match contract
    if any(routed_refs.values()):
        ray.get(
            [s.admit_and_tick.remote(routed_refs[i]) for i, s in enumerate(shards)]
        )

    seen = (
        sorted(
            u for lst in ray.get([s.seen_urls.remote() for s in shards]) for u in lst
        )
        if verify
        else []
    )
    all_metrics = ray.get([s.get_metrics.remote() for s in shards])
    fetch_counts = ray.get(count_refs)
    metrics: dict = {}
    for m in all_metrics:
        for k, v in m.items():
            metrics[k] = metrics.get(k, 0) + v
    metrics["popped"] = n_popped  # total grants (survives verify=False)
    # oracle parity, surviving resume: restored cumulative count + this
    # run's fetch misses
    metrics["errors"] = errors_restored + sum(e for _n, e in fetch_counts)
    metrics["driver_epochs"] = phase_s["epochs"]
    for k in ("admit_wait", "dispatch", "img_barrier"):
        metrics[f"driver_{k}_ms"] = int(phase_s[k] * 1000)
    # shard-side phase profile: SUM across shards ≈ cpu-ms spent per
    # phase cluster-wide (shards run concurrently, so this is not wall
    # time); driver_ prefix keeps it out of the semantic metric compares
    shard_phases = ray.get([s.get_phase_ms.remote() for s in shards])
    for ph in ("gather", "order", "admit", "pop"):
        metrics[f"driver_shard_{ph}_ms"] = sum(p[ph] for p in shard_phases)
    img_table = (
        pa.concat_tables(image_tables) if image_tables else IMAGE_SCHEMA.empty_table()
    )
    for s in shards:
        ray.kill(s)
    return CrawlResult(
        pop_order=pop_order,
        seen_urls=seen,
        image_rows=img_table.to_pylist(),
        metrics=metrics,
    )


def _write_driver_ckpt(
    ckpt_dir: str, epoch: int, delta: list, base: int = 0,
    popped_total: int = 0, errors_total: int = 0,
) -> None:
    """INCREMENTAL driver snapshot: only the pop-order rows appended since
    the previous checkpoint (O(delta) per epoch, not O(history));
    ``base`` records the global offset for sanity checks on read, and
    ``popped_total`` the cumulative grant count (the one piece of driver
    state that must survive verify=False runs, whose deltas are empty)."""
    d = os.path.join(ckpt_dir, f"epoch={epoch}")
    os.makedirs(d, exist_ok=True)
    t = pa.table(
        {
            "epoch": pa.array([e for e, _, _ in delta], pa.int32()),
            "pop_ord": pa.array([o for _, o, _ in delta], pa.int64()),
            "url": pa.array([u for _, _, u in delta], pa.string()),
        }
    )
    t = t.replace_schema_metadata(
        {b"base": str(base).encode(), b"popped": str(popped_total).encode(),
         b"errors": str(errors_total).encode()}
    )
    tmp = os.path.join(d, "driver.parquet.tmp")
    pq.write_table(t, tmp)
    os.replace(tmp, os.path.join(d, "driver.parquet"))


def gc_checkpoints(ckpt_dir: str) -> "list[int]":
    """Checkpoint retention (N11): delete checkpoint epochs strictly older
    than the newest COMPLETE epoch whose every shard snapshot is a FULL
    snapshot — the resume base.  Older epochs are unreachable by any
    restore chain (a full snapshot resets the delta chain; deltas only
    look back as far as their base), but without GC a long crawl with
    incremental checkpoints accumulates them without bound.

    The driver pop-order history chains from epoch 0 (each delta's
    ``base`` offset is validated against the concatenation of everything
    before it), so before deleting, the GC consolidates the history up to
    the base epoch into the base epoch's ``driver.parquet`` (rewritten
    with ``base=0``) — a resume from any surviving epoch reads an
    identical history.  Crash-debris epoch dirs (no ``_DONE``) older than
    the base are removed too.  Returns the removed epoch numbers."""
    import glob as _glob
    import re as _re
    import shutil as _shutil

    epoch_dirs: dict[int, str] = {}
    for p in _glob.glob(os.path.join(ckpt_dir, "epoch=*")):
        m = _re.search(r"epoch=(\d+)$", p)
        if m:
            epoch_dirs[int(m.group(1))] = p
    done = sorted(
        e for e, p in epoch_dirs.items()
        if os.path.exists(os.path.join(p, "_DONE"))
    )
    base = None
    for e in reversed(done):
        shard_files = _glob.glob(
            os.path.join(epoch_dirs[e], "shard-*.parquet")
        )
        if shard_files and all(
            pq.read_table(f, columns=["kind"])["kind"][0].as_py() == "full"
            for f in shard_files
        ):
            base = e
            break
    if base is None:
        return []
    victims = sorted(e for e in epoch_dirs if e < base)
    if not victims:
        return []
    # consolidate the driver history BEFORE dropping the deltas it
    # chains through (read validates the chain one last time)
    hist, popped, errors = _read_driver_ckpts(ckpt_dir, base)
    _write_driver_ckpt(ckpt_dir, base, hist, base=0,
                       popped_total=popped, errors_total=errors)
    for e in victims:
        _shutil.rmtree(epoch_dirs[e], ignore_errors=True)
    return victims


def _read_driver_ckpts(ckpt_dir: str, upto_epoch: int) -> "tuple[list, int, int]":
    """(pop-order history, cumulative popped count, cumulative error
    count) from the per-checkpoint
    deltas of every COMPLETE (``_DONE``) checkpoint up to ``upto_epoch``.
    verify=False checkpoints contribute empty deltas but still carry the
    popped count; a missing driver file gets a clear error."""
    import glob as _glob
    import re as _re

    epochs = sorted(
        int(m.group(1))
        for p in _glob.glob(os.path.join(ckpt_dir, "epoch=*"))
        if (m := _re.search(r"epoch=(\d+)$", p))
        and int(m.group(1)) <= upto_epoch
        and os.path.exists(os.path.join(p, "_DONE"))
    )
    out: list = []
    popped = 0
    errors = 0
    # Crash-safe GC support: gc_checkpoints consolidates the history into
    # the base epoch (rewritten with metadata base=0) BEFORE deleting
    # older epochs.  A crash at any point between the rewrite and the
    # last deletion leaves an arbitrary subset of victim epochs on disk;
    # starting the chain at the LATEST epoch whose metadata declares
    # base=0 (a consolidation point — deltas are always written with
    # base=len(history-so-far)>0) makes every intermediate state
    # readable.  Metadata-only reads: parquet footer, no row data.
    chain_start = 0
    for e in reversed(epochs):
        path = os.path.join(ckpt_dir, f"epoch={e}", "driver.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"checkpoint epoch={e} has _DONE but no driver.parquet — "
                "it was written by an incompatible (pre-round-2) layout"
            )
        meta = pq.read_schema(path).metadata or {}
        if int(meta.get(b"base", b"0")) == 0:
            chain_start = e
            break
    for e in epochs:
        if e < chain_start:
            continue
        path = os.path.join(ckpt_dir, f"epoch={e}", "driver.parquet")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"checkpoint epoch={e} has _DONE but no driver.parquet — "
                "it was written by an incompatible (pre-round-2) layout"
            )
        drv = pq.read_table(path)
        meta = drv.schema.metadata or {}
        if len(drv):
            base = int(meta.get(b"base", b"0"))
            assert base == len(out), (
                f"checkpoint chain broken at epoch={e}: delta base {base} != "
                f"{len(out)}"
            )
            out.extend(
                zip(drv["epoch"].to_pylist(), drv["pop_ord"].to_pylist(),
                    drv["url"].to_pylist())
            )
        popped = int(meta.get(b"popped", str(len(out)).encode()))
        errors = int(meta.get(b"errors", b"0"))
    return out, popped, errors
