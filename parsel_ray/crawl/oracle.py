"""The single-process deterministic oracle crawler — the SPEC for the
distributed frontier (SURVEY.md §2.5: "the distributed Ray pipeline must
match the oracle's crawl ordering and URL-seen set exactly").

Semantics (shared with :mod:`frontier` by construction):

* epoch-based BSP: per epoch, the pending set is ordered by the priority
  key ``(depth, url)`` (depth-first-breadth, lexicographic tie-break —
  discovery-order-free, hence parallelism-independent), then granted
  subject to per-host token buckets; grants are fetched and their links
  admitted before the next epoch;
* URL-seen = K sharded cuckoo filters, shard = fnv(host) % K.  K is part
  of the crawl config (FIXED across cluster sizes); false positives are
  deterministic functions of each shard's insert sequence, and the insert
  sequence is pinned: seeds in seed order, then per epoch in
  ``(parent_depth, parent_url, link_index)`` order;
* admission order per link: canonicalize → seen-check/mark → robots gate
  → depth gate;  robots fetches resolve out-of-band (cached per host,
  not part of the pop ordering);
* image fetches ride with their page (politeness counts page fetches).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..state.cuckoo import CuckooFilter, _hash64
from ..state.robots import RobotsCache
from ..state.tokenbucket import TokenBuckets
from .extract import extract_page
from .pagestore import PageStore, StoreConfig, make_seeds, page_indices
from .urlnorm import canonical_url, host_of, path_of


@dataclass(frozen=True)
class CrawlConfig:
    store: StoreConfig = StoreConfig()
    n_seeds: int = 8
    max_depth: int = 4
    max_epochs: int = 64
    shards: int = 8
    bucket_capacity: int = 4
    bucket_refill: int = 2
    filter_capacity: int = 1 << 14  # per shard


def shard_of(host: str, k: int) -> int:
    return int(_hash64(host.encode()) % np.uint64(k))


@dataclass
class CrawlResult:
    pop_order: list  # (epoch, pop_ord, url)
    seen_urls: list  # sorted canonical URLs admitted to the seen set
    image_rows: list  # dicts (image_id, bytes, w, h, fmt, caption, phash)
    metrics: dict = field(default_factory=dict)


def oracle_crawl(cfg: CrawlConfig) -> CrawlResult:
    store = PageStore(cfg.store)
    filters = [CuckooFilter(cfg.filter_capacity) for _ in range(cfg.shards)]
    buckets = TokenBuckets(cfg.bucket_capacity, cfg.bucket_refill)
    robots = RobotsCache(store.robots_txt)
    metrics = {"granted": 0, "errors": 0, "dup_skipped": 0,
               "robots_blocked": 0, "depth_dropped": 0}

    seen_list: list[str] = []
    pending: list[tuple[int, str]] = []

    def admit(url: str, depth: int, base: str | None) -> None:
        cu = canonical_url(url, base=base)
        if cu is None:
            return
        host = host_of(cu)
        f = filters[shard_of(host, cfg.shards)]
        if not f.add_if_new(cu):
            metrics["dup_skipped"] += 1
            return
        seen_list.append(cu)
        if not robots.allowed(host, path_of(cu)):
            metrics["robots_blocked"] += 1
            return
        if depth > cfg.max_depth:
            metrics["depth_dropped"] += 1
            return
        pending.append((depth, cu))

    for seed in make_seeds(cfg.store, cfg.n_seeds):
        admit(seed, 0, None)

    pop_order: list[tuple[int, int, str]] = []
    image_rows: list[dict] = []
    pop_ord = 0

    for epoch in range(cfg.max_epochs):
        if not pending:
            break
        pending.sort(key=lambda du: (du[0], du[1]))
        grants, deferred = [], []
        for d, u in pending:
            if buckets.consume(host_of(u)):
                grants.append((d, u))
            else:
                deferred.append((d, u))
        pending = deferred
        new_links: list[tuple[int, str, int, str, str]] = []
        for d, u in grants:
            pop_order.append((epoch, pop_ord, u))
            pop_ord += 1
            metrics["granted"] += 1
            page = store.page(u)
            if page is None:
                metrics["errors"] += 1
                continue
            body, enc = page
            links, figures, eff_base = extract_page(body, enc, u)
            for li, link in enumerate(links):
                new_links.append((d, u, li, link, eff_base))
            fmt_figs = {
                f["image_id"]: f for f in store.figures_of(*_page_of(u))
            }
            for fig in figures:
                iid = fig["image_id"]
                fmt = fmt_figs.get(iid, {}).get("fmt")
                if fmt is None:
                    continue
                rec = store.image_record(iid, fmt)
                rec["caption"] = fig["caption"]
                image_rows.append(rec)
        # admission barrier: deterministic insert order
        new_links.sort(key=lambda t: (t[0], t[1], t[2]))
        for d, _parent, _li, link, eff_base in new_links:
            admit(link, d + 1, base=eff_base)
        buckets.tick()

    metrics["epochs"] = epoch + 1 if pop_order else 0
    return CrawlResult(
        pop_order=pop_order,
        seen_urls=sorted(seen_list),
        image_rows=image_rows,
        metrics=metrics,
    )


def _page_of(url: str) -> tuple[int, int]:
    return page_indices(url)
