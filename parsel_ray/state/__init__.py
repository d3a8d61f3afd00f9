"""Crawl-frontier state: cuckoo-filter URL-seen set, per-host token
buckets, robots cache, priority heap shard — each checkpointable to
parquet (SURVEY.md §2.5 N2-N4, N11).

All state is deterministic: given the same insert sequence, a filter /
bucket / heap reaches the same byte state on any worker, which is what
makes the crawl-vs-oracle byte comparison possible.
"""

from .cuckoo import CuckooFilter
from .tokenbucket import TokenBuckets
from .robots import RobotsCache, parse_robots

__all__ = ["CuckooFilter", "TokenBuckets", "RobotsCache", "parse_robots"]
