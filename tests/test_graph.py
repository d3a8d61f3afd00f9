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

    def test_unknown_endpoint_raises(self, ray_session):
        # an edge to a node missing from `nodes` would silently drop
        # its rank mass at the state left-join — must fail fast instead
        nodes = rd.from_arrow(
            pa.table({"node": pa.array(["a", "b"], pa.string())})
        )
        edges = rd.from_arrow(
            pa.table({"src": pa.array(["a"], pa.string()),
                      "dst": pa.array(["ghost"], pa.string())})
        )
        with pytest.raises(ValueError, match="not in the node set"):
            pagerank(edges, nodes, iters=1, buckets=2)
        edges2 = rd.from_arrow(
            pa.table({"src": pa.array(["ghost"], pa.string()),
                      "dst": pa.array(["b"], pa.string())})
        )
        with pytest.raises(ValueError, match="not in the node set"):
            pagerank(edges2, nodes, iters=1, buckets=2)


class TestTriangleCount:
    """functions/graph.py::triangle_count — degree-oriented wedge closure.
    Pinned against the dense-matrix trace(A^3)/6 reference."""

    def _count_ref(self, edges, n):
        A = np.zeros((n, n), np.int64)
        for a, b in edges:
            if a != b:
                A[a, b] = A[b, a] = 1
        return int(np.trace(A @ A @ A) // 6)

    def test_known_graphs(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.graph import triangle_count

        cases = [
            ([(0, 1), (1, 2), (0, 2), (2, 3)], 1),          # one triangle + tail
            ([(i, j) for i in range(4) for j in range(i)], 4),  # K4
            ([(0, 1), (1, 2), (3, 4)], 0),                   # no triangle
        ]
        for edges, want in cases:
            ds = rd.from_arrow(
                pa.table(
                    {
                        "a": pa.array([e[0] for e in edges], pa.int64()),
                        "b": pa.array([e[1] for e in edges], pa.int64()),
                    }
                )
            )
            got = triangle_count(ds, num_partitions=4).to_pandas()
            assert int(got["n_triangles"][0]) == want, edges

    def test_random_graph_matches_dense_reference(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.graph import triangle_count

        rng = np.random.RandomState(11)
        n = 60
        edges = [
            (int(a), int(b))
            for a, b in rng.randint(0, n, (500, 2))
        ]
        # include duplicates + reversed duplicates + self loops on purpose
        edges += [(b, a) for a, b in edges[:50]] + [(5, 5), (7, 7)]
        want = self._count_ref(edges, n)
        ds = rd.from_arrow(
            pa.table(
                {
                    "a": pa.array([e[0] for e in edges], pa.int64()),
                    "b": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ).repartition(5)
        got = triangle_count(ds, num_partitions=8).to_pandas()
        assert int(got["n_triangles"][0]) == want
        assert want > 100  # non-trivial case


class TestReachability:
    """graph.reachable_nodes — BFS over iterative joins."""

    def test_chain_cycle_and_unreachable(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.graph import reachable_nodes

        # 0→1→2→3→0 cycle (terminates), 2→5, island 7→8, dup edges
        edges = [(0, 1), (1, 2), (2, 3), (3, 0), (2, 5), (7, 8), (0, 1)]
        ds = rd.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in edges], pa.int64()),
                    "dst": pa.array([e[1] for e in edges], pa.int64()),
                }
            )
        ).repartition(3)
        got = sorted(
            r["node"]
            for r in reachable_nodes(ds, start=0,
                                     num_partitions=4).take_all()
        )
        assert got == [0, 1, 2, 3, 5]

    def test_isolated_start(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.graph import reachable_nodes

        ds = rd.from_arrow(
            pa.table({"src": pa.array([5], pa.int64()),
                      "dst": pa.array([6], pa.int64())})
        )
        got = [r["node"] for r in reachable_nodes(ds, start=0).take_all()]
        assert got == [0]


class TestParetoFront:
    """agg.pareto_front — associative skyline."""

    def test_matches_bruteforce(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.agg import pareto_front

        rng = np.random.RandomState(1)
        a = rng.randint(0, 50, 400)
        b = rng.randint(0, 50, 400)
        t = pa.table(
            {"rid": pa.array(range(400), pa.int64()),
             "a": pa.array(a, pa.int64()),
             "b": pa.array(b, pa.int64())}
        )
        got = sorted(
            r["rid"]
            for r in pareto_front(
                rd.from_arrow(t).repartition(5), ["a", "b"]
            ).take_all()
        )
        m = np.column_stack([a, b])
        want = sorted(
            int(i) for i in range(400)
            if not ((m >= m[i]).all(axis=1) & (m > m[i]).any(axis=1)).any()
        )
        assert got == want
