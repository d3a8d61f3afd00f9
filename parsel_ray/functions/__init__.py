"""Scalar/batch functions for large-scale training-data pipelines.

Submodules:

* :mod:`text` — language-ID, quality scoring, token counting, document
  fingerprinting (vectorized Arrow kernels over a ``text`` column);
* :mod:`dedup` — exact, MinHash+LSH, SimHash, n-gram Jaccard and
  embedding-cosine near-duplicate detection;
* :mod:`similarity` — brute-force and LSH-bucketed cosine top-k search
  over ``list<float>`` embedding columns.

All are ``map_batches``-shaped: stateless functions or callable classes
whose setup (hash seeds, stopword automata, query matrices) happens once
per actor.
"""
