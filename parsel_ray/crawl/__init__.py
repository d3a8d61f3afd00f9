"""The Ray-Data-native crawl engine (SURVEY.md §2.5 [N] operators).

No reference code exists for this layer — the reference
(/root/reference/parsel) is the per-page extraction kernel only.  The
semantics here are pinned by :mod:`parsel_ray.crawl.oracle`, a
single-process deterministic crawler; the distributed pipeline
(:mod:`parsel_ray.crawl.frontier`) must reproduce its pop ordering and
URL-seen set byte-identically at any parallelism.
"""
