"""Crawl engine tests (SURVEY.md §5 t3-t5): oracle determinism, Ray
pipeline byte-equivalence, kill-and-resume, image round-trips, state
components."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from parsel_ray.crawl.oracle import CrawlConfig, oracle_crawl
from parsel_ray.crawl.pagestore import PageStore, StoreConfig, make_seeds
from parsel_ray.crawl.urlnorm import canonical_url, host_of, path_of
from parsel_ray.images.codecs import (
    FORMATS,
    decode_image,
    encode_image,
    phash64,
    psnr,
)
from parsel_ray.state.cuckoo import CuckooFilter
from parsel_ray.state.robots import RobotsCache, parse_robots
from parsel_ray.state.tokenbucket import TokenBuckets

SMALL = CrawlConfig(
    store=StoreConfig(n_hosts=4, pages_per_host=12),
    n_seeds=4,
    max_depth=3,
    max_epochs=32,
    shards=4,
)


class TestUrlNorm:
    @pytest.mark.parametrize(
        "raw,want",
        [
            ("HTTP://Host-1.TEST/page/3", "http://host-1.test/page/3"),
            ("http://host-1.test:80/page/3", "http://host-1.test/page/3"),
            ("https://host-1.test:443/x", "https://host-1.test/x"),
            ("https://host-1.test:8443/x", "https://host-1.test:8443/x"),
            ("http://h.test/a/../b/./c", "http://h.test/b/c"),
            ("http://h.test", "http://h.test/"),
            ("http://h.test/p?b=2&a=1", "http://h.test/p?a=1&b=2"),
            ("http://h.test/%7Euser/%41", "http://h.test/~user/A"),
            # reserved escapes are DATA — they must stay encoded (upper-cased)
            ("http://h.test/a%2Fb", "http://h.test/a%2Fb"),
            ("http://h.test/p?a=b%26c%3dd", "http://h.test/p?a=b%26c%3Dd"),
            ("http://h.test/a b", "http://h.test/a%20b"),
            ("http://h.test/p#frag", "http://h.test/p"),
            ("mailto:x@y.z", None),
            ("javascript:void(0)", None),
            # junk ports must yield None, not raise (one dirty href would
            # otherwise crash a whole FetchExtract task)
            ("http://host-1.test:abc/page/1", None),
            ("http://host-1.test:99999999/x", None),
            ("http://h.test:-1/x", None),
            # IPv6 literals keep their brackets (urlsplit strips them)
            ("http://[::1]:8080/p", "http://[::1]:8080/p"),
            ("HTTP://[2001:DB8::1]/x", "http://[2001:db8::1]/x"),
            ("http://[::1]:80/p", "http://[::1]/p"),
        ],
    )
    def test_canonical(self, raw, want):
        assert canonical_url(raw) == want

    def test_relative_resolution(self):
        assert (
            canonical_url("../page/7", base="http://h.test/page/3")
            == "http://h.test/page/7"
        )

    def test_path_of(self):
        assert path_of("http://h.test/page/3?a=1") == "/page/3?a=1"
        assert host_of("http://h.test/page/3") == "h.test"


class TestCodecs:
    def _img(self, w=23, h=17):
        rng = np.random.RandomState(5)
        return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)

    @pytest.mark.parametrize("fmt", ["ppm", "png"])
    def test_lossless_roundtrip(self, fmt):
        px = self._img()
        assert np.array_equal(decode_image(encode_image(px, fmt), fmt), px)

    def test_qjpg_psnr_above_40(self):
        px = self._img(64, 64)
        got = decode_image(encode_image(px, "qjpg"), "qjpg")
        assert psnr(got, px) >= 40.0

    def test_deterministic_bytes(self):
        px = self._img()
        for fmt in FORMATS:
            assert encode_image(px, fmt) == encode_image(px, fmt)

    def test_phash_horizontal_sensitivity(self):
        """an off-diagonal horizontal difference must change the hash
        (regression: the cell sampler once used the row index for the
        column slice, blinding the hash to within-row differences)."""
        rng = np.random.RandomState(3)
        a = rng.randint(0, 256, size=(64, 64, 3), dtype=np.uint8)
        a[0:8, 56:64] = 0
        b = a.copy()
        b[0:8, 56:64] = 255
        assert phash64(a) != phash64(b)

    def test_phash_stability_and_sensitivity(self):
        store = PageStore(StoreConfig())
        a = store.image_pixels("img-0-0-0")
        b = store.image_pixels("img-1-3-1")
        assert phash64(a) == phash64(a)
        assert phash64(a) != phash64(b)
        # lossy decode keeps the perceptual hash close (ham distance small)
        lossy = decode_image(encode_image(a, "qjpg"), "qjpg")
        ham = bin(phash64(a) ^ phash64(lossy)).count("1")
        assert ham <= 4


class TestState:
    def test_cuckoo_membership_and_determinism(self):
        f1, f2 = CuckooFilter(4096), CuckooFilter(4096)
        keys = [f"http://h{i % 7}.test/p/{i}" for i in range(1000)]
        for k in keys:
            assert f1.add_if_new(k) == f2.add_if_new(k)
        assert np.array_equal(f1.table, f2.table)
        for k in keys:
            assert f1.contains(k)
        assert not f1.add_if_new(keys[0])

    def test_hash64_many_matches_scalar(self):
        from parsel_ray.state.cuckoo import _hash64, hash64_many

        keys = (
            ["", "a", "ab" * 500, "héllo/ünïcode/中文", "\x7f\x01"]
            + [f"http://host{i % 13}.test/page/{i}?q={i * 7}" for i in range(4000)]
            + ["x" * n for n in range(0, 130, 7)]
        )
        got = hash64_many(keys)
        want = np.array([_hash64(k.encode("utf-8")) for k in keys], np.uint64)
        assert np.array_equal(got, want)
        assert len(hash64_many([])) == 0

    def test_contains_hashes_matches_scalar(self):
        from parsel_ray.state.cuckoo import hash64_many

        f = CuckooFilter(2048)
        ins = [f"http://h{i % 5}.test/{i}" for i in range(900)]
        for k in ins:
            f.add_if_new(k)
        probe = ins[::3] + [f"http://absent{i}.test/x" for i in range(500)]
        got = f.contains_hashes(hash64_many(probe))
        want = np.array([f.contains(k) for k in probe])
        assert np.array_equal(got, want)
        # stash path: force stash entries via a tiny over-filled filter
        g = CuckooFilter(64)
        keys = [f"k{i}" for i in range(240)]
        for k in keys:
            g.add(k)
        assert g._stash  # the point of the tiny filter
        got = g.contains_hashes(hash64_many(keys))
        assert got.all()  # add() keeps every key contained

    def test_admit_batch_vector_matches_sequential(self):
        """_admit_many (hash-dedup + vector prefilter + scalar survivors)
        must leave filter/seen/pending/metrics byte-identical to the plain
        sequential add_if_new loop."""
        from parsel_ray.crawl.frontier import FrontierShard
        from parsel_ray.crawl.oracle import CrawlConfig
        from parsel_ray.crawl.pagestore import StoreConfig

        cfg = CrawlConfig(
            store=StoreConfig(), n_seeds=8, max_depth=3, max_epochs=4,
            shards=2, bucket_capacity=8, bucket_refill=8,
            filter_capacity=1 << 12,
        )
        # two local (non-actor) shard instances via the undecorated class
        cls = FrontierShard.__ray_metadata__.modified_class
        a = cls.__new__(cls)
        b = cls.__new__(cls)
        for s in (a, b):
            cls.__init__(s, 0, cfg, verify=True, keep_insert_log=True)
        rng = np.random.default_rng(7)
        urls = [
            f"http://h{int(i)}.test/p/{int(j)}"
            for i, j in zip(rng.integers(0, 6, 3000), rng.integers(0, 400, 3000))
        ]
        depths = rng.integers(0, 6, 3000).tolist()
        items = list(zip(depths, urls))
        # a: vectorized path (admit_batch routes through _admit_many)
        cls.admit_batch(a, items)
        # b: the original sequential loop, inlined
        n0 = len(b.pending)
        for depth, cu in items:
            if not b.filter.add_if_new(cu):
                b.metrics["dup_skipped"] += 1
                continue
            b._insert_log.append(cu)
            b.seen.append(cu)
            from parsel_ray.crawl.urlnorm import host_of, path_of
            if not b.robots.allowed(host_of(cu), path_of(cu)):
                b.metrics["robots_blocked"] += 1
                continue
            if depth > b.cfg.max_depth:
                b.metrics["depth_dropped"] += 1
                continue
            b.pending.append((depth, cu))
        b.metrics["admitted"] += len(b.pending) - n0
        assert np.array_equal(a.filter.table, b.filter.table)
        assert a.filter._stash == b.filter._stash
        assert a.filter._kick_counter == b.filter._kick_counter
        assert a.seen == b.seen
        assert a._insert_log == b._insert_log
        assert a.pending == b.pending
        assert a.metrics == b.metrics

    def test_cuckoo_state_roundtrip(self):
        f = CuckooFilter(1024)
        for i in range(300):
            f.add(f"k{i}")
        g = CuckooFilter.from_state(f.state())
        assert np.array_equal(f.table, g.table)
        assert all(g.contains(f"k{i}") for i in range(300))

    def test_cuckoo_matches_spec_reference_under_eviction_pressure(self):
        """The pure-int hot path (round 4) must be BIT-identical to a
        straight spec implementation — table bytes, stash, kick counter,
        per-insert results — including overfilled regimes where eviction
        walks and stash spills dominate."""
        import random

        from parsel_ray.state.cuckoo import (
            _MAX_KICKS,
            _SLOTS,
            _STASH_MAX,
            _hash64,
            hash64_many,
        )

        class SpecFilter:
            """Frozen reference: partial-key cuckoo per Fan et al. with
            this repo's exact parameters (fp = low 16 bits or 1, bucket =
            next 16+ bits, alt = i ^ fp*0x5BD1E995, counter-seeded slot
            eviction, victim stash)."""

            def __init__(self, capacity):
                nb = 1
                while nb * _SLOTS < capacity:
                    nb <<= 1
                self.nb = nb
                self.table = [[0] * _SLOTS for _ in range(nb)]
                self.kick = 0
                self.stash = []

            def _fp_i1_i2(self, h):
                fp = (int(h) & 0xFFFF) or 1
                i1 = (int(h) >> 16) & (self.nb - 1)
                i2 = (i1 ^ (fp * 0x5BD1E995)) & (self.nb - 1)
                return fp, i1, i2

            def add_if_new(self, h):
                fp, i1, i2 = self._fp_i1_i2(h)
                if fp in self.table[i1] or fp in self.table[i2]:
                    return False
                if any(s == fp and b in (i1, i2) for b, s in self.stash):
                    return False
                for idx in (i1, i2):
                    row = self.table[idx]
                    for s in range(_SLOTS):
                        if row[s] == 0:
                            row[s] = fp
                            return True
                idx, cur = i1, fp
                for _ in range(_MAX_KICKS):
                    slot = self.kick % _SLOTS
                    self.kick += 1
                    cur, self.table[idx][slot] = self.table[idx][slot], cur
                    idx = (idx ^ (cur * 0x5BD1E995)) & (self.nb - 1)
                    row = self.table[idx]
                    for s in range(_SLOTS):
                        if row[s] == 0:
                            row[s] = cur
                            return True
                self.stash.append((idx, cur))
                if len(self.stash) > _STASH_MAX:
                    raise RuntimeError("full")
                return True

        rng = random.Random(5)
        for cap in (64, 128):
            real, ref = CuckooFilter(cap), SpecFilter(cap)
            keys = [f"c{cap}-{i}-{rng.randint(0, 10**9)}"
                    for i in range(int(cap * 1.2))]
            hs = hash64_many(keys)
            for k, h in zip(keys, hs):
                try:
                    got = real.add_if_new(k, h)
                except RuntimeError:
                    got = "FULL"
                try:
                    want = ref.add_if_new(h)
                except RuntimeError:
                    want = "FULL"
                assert got == want
                if got == "FULL":
                    break
            assert real.table.tolist() == ref.table
            assert real._stash == ref.stash
            assert real._kick_counter == ref.kick

    def test_token_bucket(self):
        tb = TokenBuckets(capacity=2, refill=1)
        assert tb.consume("h") and tb.consume("h")
        assert not tb.consume("h")
        tb.tick()
        assert tb.consume("h")
        tb2 = TokenBuckets.from_state(tb.state())
        assert tb2.level == tb.level

    def test_robots(self):
        rules = parse_robots(
            "User-agent: other\nDisallow: /x\nUser-agent: *\nDisallow: /page/3\n# c\n"
        )
        assert rules == [(False, "/page/3")]
        cache = RobotsCache(lambda h: "User-agent: *\nDisallow: /page/3\n")
        assert not cache.allowed("h.test", "/page/3")
        assert not cache.allowed("h.test", "/page/30")  # prefix rule
        assert cache.allowed("h.test", "/page/4")
        st = cache.state()
        cache2 = RobotsCache(lambda h: None)
        cache2.restore(st)
        assert not cache2.allowed("h.test", "/page/3")

    def test_robots_rfc9309(self):
        body = (
            "User-agent: a\nUser-agent: b\nDisallow: /shared\n"
            "User-agent: *\n"
            "Disallow: /private/\n"
            "Allow: /private/ok\n"
            "Disallow: /*.pdf$\n"
            "Allow: /p\n"
            "Disallow: /page\n"
        )
        # group selection: exact agent beats *; grouped agent lines share
        assert parse_robots(body, "B") == [(False, "/shared")]
        cache = RobotsCache(lambda h: body)
        # longest-match precedence
        assert not cache.allowed("h", "/private/x")
        assert cache.allowed("h", "/private/ok/deep")  # Allow is longer
        # wildcard + end anchor
        assert not cache.allowed("h", "/docs/manual.pdf")
        assert cache.allowed("h", "/docs/manual.pdfx")  # $ anchored
        assert cache.allowed("h", "/docs/manual.pdf/view")
        # /page vs /p: Disallow /page (5) beats Allow /p (2) on /pageX
        assert not cache.allowed("h", "/page9")
        assert cache.allowed("h", "/px")
        # Allow wins exact ties
        tie = RobotsCache(lambda h: "User-agent: *\nAllow: /t\nDisallow: /t\n")
        assert tie.allowed("h", "/t/x")
        # no matching rule -> allowed; empty Disallow ignored
        empty = RobotsCache(lambda h: "User-agent: *\nDisallow:\n")
        assert empty.allowed("h", "/anything")
        # state roundtrip preserves wildcard semantics
        c2 = RobotsCache(lambda h: None)
        c2.restore(cache.state())
        assert not c2.allowed("h", "/docs/manual.pdf")
        assert c2.allowed("h", "/private/ok")
        # legacy (pre-RFC-9309) checkpoint shape: bare Disallow prefixes
        old = RobotsCache(lambda h: None)
        old.restore({"rules": {"h": ["/page/3"]}})
        assert not old.allowed("h", "/page/30")
        assert old.allowed("h", "/other")

    def test_robots_trie_matches_regex_reference(self):
        """The trie fast path for plain prefix rules must agree with a
        straight RFC 9309 regex-scan reference on random rule sets
        (longest-match precedence, Allow-wins-ties, wildcards, anchors)."""
        import random

        from parsel_ray.state.robots import _HostRules, _compile

        class RegexRef:
            def __init__(self, rules):
                self.matchers = [
                    (a, len(p), _compile(p)) for a, p in rules
                ]

            def allowed(self, path):
                bl, ba = -1, True
                for allow, plen, rx in self.matchers:
                    if rx.match(path) is None:
                        continue
                    if plen > bl or (plen == bl and allow):
                        bl, ba = plen, allow
                return ba

        rng = random.Random(7)
        segs = ["a", "b", "c", "d", "ab", "abc", "x", "*", "priv", "p*q"]
        for _ in range(800):
            rules = []
            for _r in range(rng.randint(0, 12)):
                pat = "/" + "/".join(
                    rng.choice(segs) for _ in range(rng.randint(0, 3))
                )
                if rng.random() < 0.2:
                    pat += "$"
                rules.append((rng.random() < 0.5, pat))
            hr, ref = _HostRules(rules), RegexRef(rules)
            for _p in range(8):
                path = "/" + "/".join(
                    rng.choice(segs[:7]) for _ in range(rng.randint(0, 4))
                )
                assert hr.allowed(path) == ref.allowed(path), (rules, path)

    def test_sitemap_discovery(self):
        from parsel_ray.state.robots import parse_sitemap_urls

        body = (
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: https://h.test/sitemap.xml\n"
            "# Sitemap: https://h.test/commented.xml\n"
            "sitemap: https://h.test/other.xml\n"
            "Sitemap:\n"
        )
        assert parse_sitemap_urls(body) == [
            "https://h.test/sitemap.xml",
            "https://h.test/other.xml",
        ]
        assert parse_sitemap_urls("") == []


class TestPageStore:
    def test_pages_deterministic(self):
        s = PageStore(StoreConfig())
        u = s.url(0, 0)
        assert s.page(u) == s.page(u)
        assert s.page("http://nope.example/x") is None

    def test_image_record_fields(self):
        s = PageStore(StoreConfig())
        rec = s.image_record("img-0-0-0", "png")
        px = decode_image(rec["bytes"], "png")
        assert px.shape == (rec["h"], rec["w"], 3)
        assert rec["phash"] == phash64(px)

    def test_seeds_dirty_variants(self):
        seeds = make_seeds(StoreConfig(), 8)
        assert any("Http" in s or ":80" in s or ".." in s for s in seeds)
        assert all(canonical_url(s) for s in seeds)


class TestOracle:
    def test_oracle_deterministic(self):
        a, b = oracle_crawl(SMALL), oracle_crawl(SMALL)
        assert a.pop_order == b.pop_order
        assert a.seen_urls == b.seen_urls

    def test_politeness_budget_respected(self):
        res = oracle_crawl(SMALL)
        per_epoch_host: dict = {}
        for epoch, _, url in res.pop_order:
            key = (epoch, host_of(url))
            per_epoch_host[key] = per_epoch_host.get(key, 0) + 1
        assert max(per_epoch_host.values()) <= SMALL.bucket_capacity

    def test_pop_order_sorted_within_epoch(self):
        res = oracle_crawl(SMALL)
        by_epoch: dict = {}
        for epoch, _, url in res.pop_order:
            by_epoch.setdefault(epoch, []).append(url)
        # within an epoch the grant list is globally sorted by (depth, url);
        # depth is monotone in epoch progression only per url, but the URLs
        # of one (epoch, depth) run must be sorted — check full-epoch sort
        # key reconstruction instead: list equals its sorted-by-(depth,url)
        # permutation.  (depth not carried in the artifact; check urls of
        # depth-homogeneous first epoch.)
        assert by_epoch[0] == sorted(by_epoch[0])


@pytest.mark.usefixtures("ray_session")
class TestDistributedCrawl:
    def test_matches_oracle_byte_for_byte(self, tmp_path):
        from parsel_ray.crawl.frontier import run_crawl

        gold = oracle_crawl(SMALL)
        got = run_crawl(SMALL, out_dir=str(tmp_path))
        assert got.pop_order == gold.pop_order
        assert got.seen_urls == gold.seen_urls
        gi = sorted(got.image_rows, key=lambda r: r["image_id"])
        oi = sorted(gold.image_rows, key=lambda r: r["image_id"])
        assert len(gi) == len(oi)
        assert gi == oi
        # fetch-error parity: the distributed "errors" metric (counted
        # from kind="err" rows, gathered barrier-free) must equal the
        # oracle's page-miss count
        assert got.metrics["errors"] == gold.metrics["errors"]
        # partitioned parquet output exists per epoch
        import glob

        assert glob.glob(str(tmp_path / "images" / "epoch=*" / "*.parquet"))

    def test_medium_config_matches_oracle(self):
        """A second, larger topology (more hosts than shards, multi-host
        shards, deeper graph) — catches shard-collision and scale-shaped
        determinism bugs the SMALL config cannot."""
        from parsel_ray.crawl.frontier import run_crawl

        cfg = CrawlConfig(
            store=StoreConfig(n_hosts=12, pages_per_host=30),
            n_seeds=10,
            max_depth=5,
            max_epochs=40,
            shards=5,
        )
        gold = oracle_crawl(cfg)
        got = run_crawl(cfg, collect_images=False)
        assert got.pop_order == gold.pop_order
        assert got.seen_urls == gold.seen_urls

    @pytest.mark.parametrize("shards", [1, 16])
    def test_degenerate_shard_counts_match_oracle(self, shards):
        """Partitioning edges: ONE shard (all hosts co-located — the
        serial extreme) and MORE shards than hosts (most shard actors
        own no host and must stay inert through every epoch).  Pop order
        and seen set must be invariant to the shard count."""
        import dataclasses

        from parsel_ray.crawl.frontier import run_crawl

        cfg = dataclasses.replace(SMALL, shards=shards)
        gold = oracle_crawl(cfg)
        got = run_crawl(cfg, collect_images=False)
        assert got.pop_order == gold.pop_order
        assert got.seen_urls == gold.seen_urls

    def test_truncated_crawl_matches_oracle(self):
        """max_epochs binds mid-crawl: links extracted in the final epoch
        must still enter the seen set (the oracle admits them inside its
        last iteration)."""
        import dataclasses

        from parsel_ray.crawl.frontier import run_crawl

        cfg = dataclasses.replace(SMALL, max_epochs=3)
        gold = oracle_crawl(cfg)
        got = run_crawl(cfg, collect_images=False)
        assert got.pop_order == gold.pop_order
        assert got.seen_urls == gold.seen_urls

    def test_kill_and_resume_equivalence(self, tmp_path):
        """Run to completion with checkpoints; re-run from the mid
        checkpoint; artifacts must be identical (N11)."""
        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        full = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt, checkpoint_every=2)
        import glob
        import re

        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        assert epochs, "no checkpoints written"
        mid = epochs[len(epochs) // 2]
        resumed = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt, resume_epoch=mid)
        assert resumed.pop_order == full.pop_order
        assert resumed.seen_urls == full.seen_urls
        # the image artifact is recovered from the partitioned output too
        fi = sorted(full.image_rows, key=lambda r: r["image_id"])
        ri = sorted(resumed.image_rows, key=lambda r: r["image_id"])
        assert [r["image_id"] for r in fi] == [r["image_id"] for r in ri]

    def test_resume_over_crash_debris(self, tmp_path):
        """A job killed MID-EPOCH leaves a partial image dir (chunk
        shards, no _DONE) past the last complete checkpoint.  Resume
        must clear the debris and reproduce the full run's artifacts —
        no duplicate rows, no garbage shards globbed back in."""
        import glob
        import os
        import re

        import pyarrow.parquet as pq_

        from parsel_ray.crawl.frontier import IMAGE_SCHEMA, run_crawl

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        full = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt, checkpoint_every=2)
        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        mid = epochs[len(epochs) // 2]
        # crash debris: a partial epoch dir one past the checkpoint,
        # holding a bogus shard that must NOT survive the resume
        debris = os.path.join(out, "images", f"epoch={mid + 1}")
        os.makedirs(debris, exist_ok=True)
        bogus = pa.table(
            {
                "image_id": pa.array(["GARBAGE-row"], pa.string()),
                "bytes": pa.array([b"x"], pa.binary()),
                "w": pa.array([1], pa.int32()),
                "h": pa.array([1], pa.int32()),
                "fmt": pa.array(["ppm"], pa.string()),
                "caption": pa.array(["junk"], pa.string()),
                "phash": pa.array([0], pa.int64()),
            }
        ).cast(IMAGE_SCHEMA)
        pq_.write_table(bogus, os.path.join(debris, "chunk-99.parquet"))
        done = os.path.join(debris, "_DONE")
        assert not os.path.exists(done)

        resumed = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt,
                            resume_epoch=mid)
        assert resumed.pop_order == full.pop_order
        assert resumed.seen_urls == full.seen_urls
        fi = sorted(r["image_id"] for r in full.image_rows)
        ri = sorted(r["image_id"] for r in resumed.image_rows)
        assert fi == ri
        assert "GARBAGE-row" not in ri

    def test_incremental_checkpoints_delta_chain(self, tmp_path):
        """Checkpoints between full snapshots carry only the insert-log
        delta (O(delta) bytes, no filter bitmap / seen list); resuming
        from a delta epoch replays the chain byte-identically."""
        import glob
        import os
        import re

        import pyarrow.parquet as pq

        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        full = run_crawl(SMALL, ckpt_dir=ckpt, checkpoint_every=1)
        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        assert len(epochs) >= 3
        kinds, sizes = {}, {}
        for e in epochs:
            p = f"{ckpt}/epoch={e}/shard-0.parquet"
            t = pq.read_table(p)
            kinds[e] = t["kind"][0].as_py()
            sizes[e] = os.path.getsize(p)
            if kinds[e] == "delta":
                assert "filter_table" not in t.column_names
                assert "seen" not in t.column_names
        assert kinds[epochs[0]] == "full"
        deltas = [e for e in epochs if kinds[e] == "delta"]
        assert deltas, "expected delta checkpoints between full snapshots"
        assert max(sizes[e] for e in deltas) < min(
            sizes[e] for e in epochs if kinds[e] == "full"
        )
        # resume from the LAST delta epoch: chain = full + every delta
        resumed = run_crawl(SMALL, ckpt_dir=ckpt, resume_epoch=deltas[-1])
        assert resumed.pop_order == full.pop_order
        assert resumed.seen_urls == full.seen_urls

        def semantic(m):
            # driver_* entries are wall-clock phase timings (lineage
            # diagnostics) — everything else must match exactly on resume
            return {k: v for k, v in m.items() if not k.startswith("driver_")}

        assert semantic(resumed.metrics) == semantic(full.metrics)

    def test_verify_off_bounded_state(self, tmp_path):
        """verify=False (production mode) drops the O(total-URLs) driver/
        shard verification artifacts but crawls the identical frontier:
        metrics match the verify=True run and the image corpus is intact."""
        from parsel_ray.crawl.frontier import run_crawl

        gold = oracle_crawl(SMALL)
        got = run_crawl(
            SMALL, out_dir=str(tmp_path), collect_images=True, verify=False
        )
        assert got.pop_order == []
        assert got.seen_urls == []
        assert got.metrics["popped"] == len(gold.pop_order)
        assert got.metrics["granted"] == len(gold.pop_order)
        gi = sorted(got.image_rows, key=lambda r: r["image_id"])
        oi = sorted(gold.image_rows, key=lambda r: r["image_id"])
        assert gi == oi

    def test_checkpoints_are_incremental_with_done_markers(self, tmp_path):
        """Driver checkpoints carry only per-checkpoint pop-order DELTAS
        (O(delta), not O(history)), each complete epoch dir has a _DONE
        marker, and the concatenated chain rebuilds the full history."""
        import glob
        import os
        import re

        import pyarrow.parquet as pq

        from parsel_ray.crawl.frontier import _read_driver_ckpts, run_crawl

        ckpt = str(tmp_path / "ckpt")
        full = run_crawl(SMALL, ckpt_dir=ckpt, checkpoint_every=2,
                         collect_images=False)
        dirs = sorted(
            glob.glob(ckpt + "/epoch=*"),
            key=lambda p: int(re.search(r"epoch=(\d+)", p).group(1)),
        )
        assert len(dirs) >= 2
        total = 0
        for d in dirs:
            assert os.path.exists(os.path.join(d, "_DONE"))
            n = pq.read_metadata(os.path.join(d, "driver.parquet")).num_rows
            total += n
        last_epoch = int(re.search(r"epoch=(\d+)", dirs[-1]).group(1))
        chain, popped, _errs = _read_driver_ckpts(ckpt, last_epoch)
        assert total == len(chain)
        assert chain == full.pop_order[: len(chain)]
        assert popped == len(chain)
        # deltas are strictly smaller than the history they sum to
        first = pq.read_metadata(
            os.path.join(dirs[-1], "driver.parquet")
        ).num_rows
        assert first < total

    def test_verify_off_checkpoint_resume_metrics(self, tmp_path):
        """A verify=False run checkpoints (empty deltas + popped_total
        metadata) and resumes — at either verify setting — with the
        cumulative popped count intact."""
        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        full = run_crawl(SMALL, ckpt_dir=ckpt, checkpoint_every=2,
                         collect_images=False, verify=False)
        import glob
        import re

        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        mid = epochs[len(epochs) // 2]
        resumed = run_crawl(SMALL, ckpt_dir=ckpt, resume_epoch=mid,
                            collect_images=False, verify=False)
        assert resumed.metrics["popped"] == full.metrics["popped"]
        # resuming the same verify=False checkpoints with verify=True must
        # not crash (no pop-order history to rebuild, count still right)
        resumed2 = run_crawl(SMALL, ckpt_dir=ckpt, resume_epoch=mid,
                             collect_images=False, verify=True)
        assert resumed2.metrics["popped"] == full.metrics["popped"]

    def test_verify_off_gc_resume_metrics(self, tmp_path):
        """The production combination — verify=False + ckpt_gc=True —
        keeps checkpoint state bounded AND the consolidated driver
        metadata (popped/errors counts, which is ALL the driver state a
        verify=False run has) survives GC so a resume reports the same
        cumulative metrics."""
        import glob
        import re

        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        ref = run_crawl(SMALL, ckpt_dir=ckpt, checkpoint_every=1,
                        ckpt_full_every=2, ckpt_gc=True,
                        collect_images=False, verify=False)
        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        assert len(epochs) <= 3  # bounded by GC
        resumed = run_crawl(SMALL, ckpt_dir=ckpt, resume_epoch=epochs[-1],
                            collect_images=False, verify=False)
        sem = lambda m: {k: v for k, v in m.items()
                         if not k.startswith("driver_")}
        assert sem(resumed.metrics) == sem(ref.metrics)

    def test_resume_refuses_incomplete_checkpoint(self, tmp_path):
        import os

        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        run_crawl(SMALL, ckpt_dir=ckpt, checkpoint_every=2, collect_images=False)
        import glob
        import re

        d = sorted(glob.glob(ckpt + "/epoch=*"))[0]
        e = int(re.search(r"epoch=(\d+)", d).group(1))
        os.remove(os.path.join(d, "_DONE"))
        with pytest.raises(AssertionError, match="_DONE"):
            run_crawl(SMALL, ckpt_dir=ckpt, resume_epoch=e)

    def test_hot_host_politeness_and_metrics(self):
        """Skew (N12/N13): the hot host (host-0 has the most pages) is
        rate-bounded by its token bucket every epoch, never starves the
        others, and per-shard metrics survive aggregation."""
        from parsel_ray.crawl.frontier import run_crawl

        res = run_crawl(SMALL, collect_images=False)
        per_epoch_host: dict = {}
        hosts = set()
        for epoch, _, url in res.pop_order:
            h = host_of(url)
            hosts.add(h)
            key = (epoch, h)
            per_epoch_host[key] = per_epoch_host.get(key, 0) + 1
        assert max(per_epoch_host.values()) <= SMALL.bucket_capacity
        assert len(hosts) > 1  # hot host did not monopolize the crawl
        m = res.metrics
        assert m["granted"] == len(res.pop_order)
        assert m["granted"] + m["robots_blocked"] + m["depth_dropped"] <= len(
            res.seen_urls
        )

    def test_checkpoint_gc_resume_across_boundary(self, tmp_path):
        """gc_checkpoints deletes epochs older than the newest all-full
        checkpoint (after consolidating the driver history into it);
        resume from the surviving epochs — including a DELTA epoch whose
        original chain crossed the GC boundary — stays byte-identical."""
        import glob
        import os
        import re

        import pyarrow.parquet as pq

        from parsel_ray.crawl.frontier import gc_checkpoints, run_crawl

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        full = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt,
                         checkpoint_every=1, ckpt_full_every=2)

        def epochs_of():
            return sorted(
                int(re.search(r"epoch=(\d+)", p).group(1))
                for p in glob.glob(ckpt + "/epoch=*")
            )

        def kind_of(e):
            return pq.read_table(
                f"{ckpt}/epoch={e}/shard-0.parquet", columns=["kind"]
            )["kind"][0].as_py()

        before = epochs_of()
        fulls = [e for e in before if kind_of(e) == "full"]
        assert len(fulls) >= 2, "need two full snapshots for a GC boundary"
        base = fulls[-1]
        removed = gc_checkpoints(ckpt)
        assert removed == [e for e in before if e < base]
        after = epochs_of()
        assert min(after) == base
        # consolidated driver history at the base epoch chains from 0
        drv = pq.read_table(f"{ckpt}/epoch={base}/driver.parquet")
        assert (drv.schema.metadata or {}).get(b"base") == b"0"
        # resume from the LAST surviving epoch (and, when one exists, a
        # surviving delta epoch) reproduces the uninterrupted artifacts
        candidates = [after[-1]] + [e for e in after if kind_of(e) == "delta"][:1]
        for e in sorted(set(candidates)):
            resumed = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt,
                                resume_epoch=e)
            assert resumed.pop_order == full.pop_order
            assert resumed.seen_urls == full.seen_urls
            sem = lambda m: {k: v for k, v in m.items()
                             if not k.startswith("driver_")}
            assert sem(resumed.metrics) == sem(full.metrics)
        # second GC is a no-op (nothing older than the base remains)
        assert gc_checkpoints(ckpt) == []

    def test_checkpoint_gc_crash_intermediate_states(self, tmp_path):
        """gc_checkpoints is consolidate-then-delete; a crash at ANY
        intermediate point (after the base epoch's driver.parquet is
        rewritten with base=0 but before some/all victim deletions) must
        leave the checkpoint dir resumable byte-identically.  The reader
        starts the history chain at the latest base=0 consolidation
        point, so stale victim epochs — even a partially-deleted subset —
        are ignored rather than tripping the chain validator."""
        import glob
        import re
        import shutil

        import pyarrow.parquet as pq

        from parsel_ray.crawl.frontier import (
            _read_driver_ckpts, _write_driver_ckpt, gc_checkpoints, run_crawl,
        )

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        full = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt,
                         checkpoint_every=1, ckpt_full_every=2)

        def epochs_of():
            return sorted(
                int(re.search(r"epoch=(\d+)", p).group(1))
                for p in glob.glob(ckpt + "/epoch=*")
            )

        def kind_of(e):
            return pq.read_table(
                f"{ckpt}/epoch={e}/shard-0.parquet", columns=["kind"]
            )["kind"][0].as_py()

        before = epochs_of()
        fulls = [e for e in before if kind_of(e) == "full"]
        assert len(fulls) >= 2
        base = fulls[-1]
        victims = [e for e in before if e < base]
        assert len(victims) >= 2, "need >=2 victims to test partial deletion"
        last = before[-1]

        def assert_resumable():
            resumed = run_crawl(SMALL, out_dir=out, ckpt_dir=ckpt,
                                resume_epoch=last)
            assert resumed.pop_order == full.pop_order
            assert resumed.seen_urls == full.seen_urls

        # State A: consolidation rewrite done, NO deletions yet — every
        # victim epoch still on disk with its old delta chain.
        hist, popped, errors = _read_driver_ckpts(ckpt, base)
        _write_driver_ckpt(ckpt, base, hist, base=0,
                           popped_total=popped, errors_total=errors)
        assert_resumable()
        # chain reader skips the stale prefix and returns the full history
        h2, p2, e2 = _read_driver_ckpts(ckpt, last)
        assert p2 == full.metrics["granted"]

        # State B: a strict subset of victims deleted (crash mid-loop).
        shutil.rmtree(f"{ckpt}/epoch={victims[0]}")
        assert_resumable()

        # Completion: a re-run of gc finishes the job idempotently.
        removed = gc_checkpoints(ckpt)
        assert removed == victims[1:]
        assert min(epochs_of()) == base
        assert_resumable()

    def test_checkpoint_gc_inline_bounds_state(self, tmp_path):
        """ckpt_gc=True keeps on-disk checkpoint state bounded during the
        run and the final state still resumes byte-identically."""
        import glob
        import re

        from parsel_ray.crawl.frontier import run_crawl

        ckpt = str(tmp_path / "ckpt")
        out = str(tmp_path / "out")
        ref = run_crawl(SMALL, out_dir=out, ckpt_dir=str(tmp_path / "ref_ckpt"),
                        checkpoint_every=1, ckpt_full_every=2)
        got = run_crawl(SMALL, out_dir=str(tmp_path / "out2"), ckpt_dir=ckpt,
                        checkpoint_every=1, ckpt_full_every=2, ckpt_gc=True)
        assert got.pop_order == ref.pop_order
        epochs = sorted(
            int(re.search(r"epoch=(\d+)", p).group(1))
            for p in glob.glob(ckpt + "/epoch=*")
        )
        # bounded: at most full_every + 1 epochs survive a GC'd run
        assert len(epochs) <= 3
        resumed = run_crawl(SMALL, out_dir=str(tmp_path / "out2"),
                            ckpt_dir=ckpt, resume_epoch=epochs[-1])
        assert resumed.pop_order == ref.pop_order
        assert resumed.seen_urls == ref.seen_urls

    def test_image_verification_kernel(self):
        from parsel_ray.crawl.frontier import run_crawl
        from parsel_ray.crawl.verify import VerifyImages

        got = run_crawl(SMALL)
        t = pa.Table.from_pylist(got.image_rows)
        verdicts = VerifyImages(SMALL.store)(t)
        assert all(verdicts["ok_pixels"].to_pylist())
        assert all(verdicts["ok_caption"].to_pylist())
        assert all(verdicts["ok_phash"].to_pylist())
        lossy = [
            p
            for p, f in zip(
                verdicts["psnr_db"].to_pylist(), verdicts["fmt"].to_pylist()
            )
            if f == "qjpg"
        ]
        assert lossy and all(40.0 <= p < 1e9 for p in lossy)


class TestBaseHref:
    """extract_page returns the EFFECTIVE resolution base: the page URL
    refined by the first <base href> (the HTML rule scrapy honors via
    response.urljoin); both crawl loops resolve links against it."""

    def test_base_tag_changes_resolution(self):
        from parsel_ray.crawl.extract import extract_page

        body = (
            b"<html><head><base href='/sub/dir/'></head>"
            b"<body><a href='page.html'>x</a></body></html>"
        )
        links, _figs, base = extract_page(
            body, "utf-8", "http://h.test/top/index.html"
        )
        assert base == "http://h.test/sub/dir/"
        assert canonical_url(links[0], base=base) == \
            "http://h.test/sub/dir/page.html"

    def test_absolute_base(self):
        from parsel_ray.crawl.extract import extract_page

        body = (
            b"<html><head><base href='https://cdn.test/x/'></head>"
            b"<body><a href='a'>x</a></body></html>"
        )
        _l, _f, base = extract_page(body, "utf-8", "http://h.test/p")
        assert base == "https://cdn.test/x/"

    def test_no_base_tag(self):
        from parsel_ray.crawl.extract import extract_page

        _l, _f, base = extract_page(
            b"<html><body><a href='a'>x</a></body></html>",
            "utf-8", "http://h.test/p",
        )
        assert base == "http://h.test/p"


class TestCuckooReviewPins:
    """Review pins: load factor (the raw-FNV index skew saturated the
    filter at ~72%), and the victim stash (an exhausted eviction walk
    used to DROP a fingerprint — false negative on a seen key)."""

    def test_load_factor_meets_sizing_math(self):
        f = CuckooFilter(16384)
        slots = f.num_buckets * 4
        i = 0
        while f.add(f"https://host{i % 97}.example.com/path/{i}"):
            i += 1
        assert f.count / slots >= 0.90, f.count / slots

    def test_no_false_negative_after_walk_exhaustion(self):
        f = CuckooFilter(2048)
        added = []
        i = 0
        # push far past capacity: every add() keeps membership exact
        while len(f._stash) < 8:
            k = f"url-{i}"
            f.add(k)
            added.append(k)
            i += 1
        missing = [k for k in added if not f.contains(k)]
        assert missing == [], missing[:5]

    def test_stash_survives_checkpoint_roundtrip(self):
        f = CuckooFilter(2048)
        i = 0
        while not f._stash:
            f.add(f"url-{i}")
            i += 1
        g = CuckooFilter.from_state(f.state())
        assert g._stash == f._stash
        assert all(g.contains(f"url-{j}") for j in range(i))

    def test_legacy_state_without_stash(self):
        f = CuckooFilter(1024)
        f.add("a")
        st = f.state()
        del st["stash"]
        g = CuckooFilter.from_state(st)
        assert g.contains("a") and g._stash == []
