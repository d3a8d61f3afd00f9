"""Distributed PageRank vs a dense single-process reference on small
deterministic graphs — mass conservation, dangling-node handling,
sink-only nodes, and agreement to float tolerance."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from parsel_ray.functions.graph import pagerank


def _dense_pagerank(n, edge_list, d=0.85, iters=6):
    """Reference: textbook power iteration on the dense matrix."""
    out = np.zeros(n)
    for s, _ in edge_list:
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - d) / n)
        dangling = r[out == 0].sum()
        nxt += d * dangling / n
        for s, t in edge_list:
            nxt[t] += d * r[s] / out[s]
        r = nxt
    return r


def _run(n, edge_list, iters=6):
    names = [f"n{i}" for i in range(n)]
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([names[s] for s, _ in edge_list]),
                "dst": pa.array([names[t] for _, t in edge_list]),
            }
        )
    )
    nodes = rd.from_arrow(pa.table({"node": pa.array(names)}))
    got = pagerank(edges, nodes, iters=iters, buckets=4).take_all()
    r = np.zeros(n)
    for row in got:
        r[int(row["node"][1:])] = row["rank"]
    return r


class TestPageRank:
    def test_matches_dense_reference_with_dangling(self, ray_session):
        # 0->1, 0->2, 1->2, 3 dangling, 4 sink-only (2->4)
        edges = [(0, 1), (0, 2), (1, 2), (2, 4)]
        want = _dense_pagerank(5, edges)
        got = _run(5, edges)
        assert abs(got.sum() - 1.0) < 1e-9
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_cycle_is_uniform(self, ray_session):
        n = 6
        edges = [(i, (i + 1) % n) for i in range(n)]
        got = _run(n, edges)
        np.testing.assert_allclose(got, np.full(n, 1.0 / n), atol=1e-12)

    def test_all_dangling_stays_uniform(self, ray_session):
        got = _run(4, [])
        np.testing.assert_allclose(got, np.full(4, 0.25), atol=1e-12)

    def test_empty_nodes_raises(self, ray_session):
        nodes = rd.from_arrow(pa.table({"node": pa.array([], pa.string())}))
        edges = rd.from_arrow(
            pa.table({"src": pa.array([], pa.string()),
                      "dst": pa.array([], pa.string())})
        )
        with pytest.raises(ValueError, match="empty node set"):
            pagerank(edges, nodes, iters=1)
