"""End-to-end Ray Data pipelines: the correctness-gate query suite
(:mod:`queries`) and the crawl pipeline (:mod:`parsel_ray.crawl`)."""
