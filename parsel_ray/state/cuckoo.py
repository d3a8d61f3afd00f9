"""Deterministic cuckoo filter (Fan et al., CoNEXT 2014) over numpy.

Approximate membership with deletions-capable semantics (we only use
add/contains).  Partial-key cuckoo hashing: 16-bit fingerprints, 4 slots
per bucket, alternate bucket = i ^ hash(fingerprint).  Eviction walk uses
a deterministic counter-seeded slot choice, so the filter state — and
therefore every false positive — is a pure function of the insert
sequence.  That determinism is what lets the single-process oracle and
the distributed shards agree byte-for-byte on the URL-seen set.

Scale: 16-bit fingerprints at 95% load ≈ 2.4 bytes/key; a 10^10-URL seen
set sharded over 256 hosts-shards is ~94 GB cluster-wide, ~370 MB per
shard actor — feasible actor state, checkpointed as a single uint16
array per shard.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500
_STASH_MAX = 64


def hash64_many(keys: list) -> np.ndarray:
    """Vectorized ``_hash64`` over many str keys — byte-identical values
    (FNV-1a + fmix64), O(total bytes) work.

    The scalar hash is a per-byte Python loop (~15 us per URL) and runs
    once per candidate link in the frontier's hottest path; at web scale
    ~90% of those candidates are dup-skips, so batching the hash is the
    single biggest admission win.  Rows are processed length-sorted in
    bounded row-chunks so each byte column touches only the still-active
    suffix and the padded byte matrix stays cache-sized.
    """
    n = len(keys)
    out = np.empty(n, np.uint64)
    if not n:
        return out
    bs = [k.encode("utf-8") for k in keys]
    lens = np.fromiter((len(b) for b in bs), np.int64, n)
    order = np.argsort(lens, kind="stable")
    lens_s = lens[order]
    h_all = np.full(n, 14695981039346656037, np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for c0 in range(0, n, 16384):
            c1 = min(n, c0 + 16384)
            clens = lens_s[c0:c1]
            maxlen = int(clens[-1])  # sorted: last row is longest
            if maxlen == 0:
                continue
            joined = b"".join(bs[order[i]] for i in range(c0, c1))
            flat = np.frombuffer(joined, np.uint8)
            buf = np.zeros((c1 - c0, maxlen), np.uint8)
            row = np.repeat(np.arange(c1 - c0), clens)
            col = np.arange(len(flat)) - np.repeat(
                np.cumsum(clens) - clens, clens
            )
            buf[row, col] = flat
            h = h_all[c0:c1]  # in-place view updates
            start = 0
            for j in range(maxlen):
                # rows are length-sorted: rows still active at byte j
                # form the suffix [start:]
                while start < c1 - c0 and clens[start] <= j:
                    start += 1
                hs = h[start:]
                hs ^= buf[start:, j]
                hs *= prime
        h_all ^= h_all >> np.uint64(33)
        h_all *= np.uint64(0xFF51AFD7ED558CCD)
        h_all ^= h_all >> np.uint64(33)
        h_all *= np.uint64(0xC4CEB9FE1A85EC53)
        h_all ^= h_all >> np.uint64(33)
    out[order] = h_all
    return out


def _hash64(data: bytes) -> np.uint64:
    # pure-int FNV-1a (identical values to the numpy version, ~10x faster:
    # this runs per admitted URL in the crawl's hottest path), finished
    # with the murmur3 fmix64 avalanche: raw FNV's upper bits are
    # correlated for sequential-ish keys, which skewed bucket indices so
    # badly the filter saturated at ~72% load instead of the ~95% the
    # sizing math assumes (measured; fmix restores 96%)
    h = 14695981039346656037
    for b in data:
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & 0xFFFFFFFFFFFFFFFF
    h ^= h >> 33
    return np.uint64(h)


class CuckooFilter:
    """Fixed-capacity cuckoo filter; ``num_buckets`` must be a power of 2."""

    def __init__(self, capacity: int) -> None:
        nb = 1
        while nb * _SLOTS < capacity:
            nb <<= 1
        self.num_buckets = nb
        self.table = np.zeros((nb, _SLOTS), dtype=np.uint16)  # 0 = empty
        self.count = 0
        self._kick_counter = 0
        # overflow victims: (bucket, fingerprint) pairs displaced by an
        # exhausted eviction walk.  Without it a failed walk silently
        # DROPPED the last displaced fingerprint — a previously-added key
        # became a false negative, which re-admits a seen URL and breaks
        # the oracle/shard byte-match contract.  Determinism holds: the
        # stash is a pure function of the insert sequence.
        self._stash: list[tuple[int, int]] = []

    # -- hashing ----------------------------------------------------------

    def _fingerprint_and_index(
        self, key: str, h64: np.uint64 | None = None
    ) -> tuple[np.uint16, int]:
        h = _hash64(key.encode("utf-8")) if h64 is None else np.uint64(h64)
        fp = np.uint16((h & np.uint64(0xFFFF)) or np.uint64(1))  # never 0
        idx = int((h >> np.uint64(16)) & np.uint64(self.num_buckets - 1))
        return fp, idx

    def _alt_index(self, idx: int, fp: np.uint16) -> int:
        with np.errstate(over="ignore"):
            fh = np.uint64(fp) * np.uint64(0x5BD1E995)
        return int((np.uint64(idx) ^ fh) & np.uint64(self.num_buckets - 1))

    # -- ops --------------------------------------------------------------

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """Vectorized ``contains`` for precomputed ``hash64_many`` values,
        against the CURRENT state — one pass of table gathers per batch.

        Byte-match contract: the filter observes keys only through their
        64-bit hash, so any hash-level answer here equals the key-level
        answer.  State only GROWS under ``add``, so a True is final at
        any later sequence point; a False is only "absent NOW" — callers
        admitting a sequence must re-check False keys via ``add_if_new``
        at their own sequence points (an earlier insert from the same
        batch may have placed the fingerprint by then).
        """
        n = len(h)
        if not n:
            return np.zeros(0, bool)
        h = np.asarray(h, np.uint64)
        fp = (h & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        nb1 = np.uint64(self.num_buckets - 1)
        i1 = ((h >> np.uint64(16)) & nb1).astype(np.int64)
        with np.errstate(over="ignore"):
            fh = fp.astype(np.uint64) * np.uint64(0x5BD1E995)
        i2 = ((i1.astype(np.uint64) ^ fh) & nb1).astype(np.int64)
        found = (self.table[i1] == fp[:, None]).any(axis=1)
        found |= (self.table[i2] == fp[:, None]).any(axis=1)
        for s_idx, s_fp in self._stash:
            found |= (fp == np.uint16(s_fp)) & ((i1 == s_idx) | (i2 == s_idx))
        return found

    # The scalar ops below run per SURVIVOR on the frontier's serial
    # admission path (the hot shard's epoch-barrier cost), so they use
    # pure-Python ints instead of numpy scalars (~6x fewer microseconds
    # per call; measured 23 us -> 4 us).  Values are bit-identical: fp <
    # 2^16 and 0x5BD1E995 < 2^31, so fp * 0x5BD1E995 < 2^47 — the
    # uint64 overflow wrap of the old numpy expression is unreachable.

    def contains(self, key: str, h64: np.uint64 | None = None) -> bool:
        h = int(_hash64(key.encode("utf-8"))) if h64 is None else int(h64)
        fp = (h & 0xFFFF) or 1
        mask = self.num_buckets - 1
        i1 = (h >> 16) & mask
        i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
        if fp in self.table[i1].tolist() or fp in self.table[i2].tolist():
            return True
        if self._stash:
            return any(
                s_fp == fp and s_idx in (i1, i2) for s_idx, s_fp in self._stash
            )
        return False

    def _evict_insert(self, idx: int, fp: int) -> bool:
        """Deterministic eviction walk (slot chosen by a state counter);
        both buckets of ``fp`` are full.  Spills to the victim stash when
        exhausted so membership stays exact."""
        tl = self.table
        mask = self.num_buckets - 1
        cur = fp
        for _ in range(_MAX_KICKS):
            slot = self._kick_counter % _SLOTS
            self._kick_counter += 1
            prev = int(tl[idx, slot])
            tl[idx, slot] = cur
            cur = prev
            idx = (idx ^ (cur * 0x5BD1E995)) & mask
            row = tl[idx].tolist()
            for s in range(_SLOTS):
                if row[s] == 0:
                    tl[idx, s] = cur
                    self.count += 1
                    return True
        # walk exhausted: ``cur`` is some earlier key's displaced
        # fingerprint and ``idx`` is one of its two valid buckets — stash
        # it so membership stays exact, then report over-capacity once
        # the stash bound is hit (callers must resize, not retry)
        self._stash.append((idx, cur))
        self.count += 1
        return len(self._stash) <= _STASH_MAX

    def add(self, key: str, h64: np.uint64 | None = None) -> bool:
        """Insert.  The key is ALWAYS contained afterwards (an exhausted
        eviction walk spills to the victim stash rather than dropping a
        fingerprint); returns False once the stash bound is exceeded —
        the filter is over capacity and must be resized."""
        h = int(_hash64(key.encode("utf-8"))) if h64 is None else int(h64)
        fp = (h & 0xFFFF) or 1
        mask = self.num_buckets - 1
        i1 = (h >> 16) & mask
        i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
        tl = self.table
        for idx in (i1, i2):
            row = tl[idx].tolist()
            for s in range(_SLOTS):
                if row[s] == 0:
                    tl[idx, s] = fp
                    self.count += 1
                    return True
        return self._evict_insert(i1, fp)

    def add_if_new(self, key: str, h64: np.uint64 | None = None) -> bool:
        """The crawl primitive: True if the key was NOT seen (and is now
        marked seen).  A false positive returns False — the URL is skipped;
        determinism of FPs keeps the oracle and shards in agreement.
        One fused bucket read serves both the membership check and the
        common-path insert."""
        h = int(_hash64(key.encode("utf-8"))) if h64 is None else int(h64)
        fp = (h & 0xFFFF) or 1
        mask = self.num_buckets - 1
        i1 = (h >> 16) & mask
        i2 = (i1 ^ (fp * 0x5BD1E995)) & mask
        tl = self.table
        r1 = tl[i1].tolist()
        r2 = tl[i2].tolist()
        if fp in r1 or fp in r2:
            return False
        if self._stash and any(
            s_fp == fp and s_idx in (i1, i2) for s_idx, s_fp in self._stash
        ):
            return False
        for s in range(_SLOTS):
            if r1[s] == 0:
                tl[i1, s] = fp
                self.count += 1
                return True
        for s in range(_SLOTS):
            if r2[s] == 0:
                tl[i2, s] = fp
                self.count += 1
                return True
        if not self._evict_insert(i1, fp):
            raise RuntimeError("cuckoo filter full — size the shard capacity up")
        return True

    # -- checkpoint -------------------------------------------------------

    def state(self) -> dict:
        return {
            "table": self.table.copy(),
            "count": self.count,
            "kick": self._kick_counter,
            "stash": list(self._stash),
        }

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = np.asarray(st["table"], dtype=np.uint16).copy()
        f.num_buckets = f.table.shape[0]
        f.count = int(st["count"])
        f._kick_counter = int(st["kick"])
        # pre-stash checkpoints lack the key
        f._stash = [(int(a), int(b)) for a, b in st.get("stash", [])]
        return f
