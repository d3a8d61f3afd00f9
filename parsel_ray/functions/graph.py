"""Distributed iterative graph algorithms over edge-list Datasets.

PageRank here is the canonical join+groupby power iteration — the same
shape as a 10^10-node run: per round, ranks co-partition with edges by
source (one bucket shuffle), contributions aggregate by destination with
a per-batch combiner, and the driver sees only two scalars (dangling
mass, L1 delta).  Node state never materializes on the driver; the rank
table is a Dataset keyed by node id throughout.

Related: ``dedup.label_propagation_components`` (min-label propagation
with pointer jumping) is the connected-components sibling of this loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from .agg import partial_sum_groupby
from .relational import hash_bucket_join


def pagerank(
    edges,
    nodes,
    damping: float = 0.85,
    iters: int = 12,
    buckets: int = 8,
    certify: bool = True,
):
    """PageRank over ``edges`` (src: string, dst: string) and ``nodes``
    (node: string) Datasets.  Multi-edges should be pre-deduplicated by
    the caller (each (src, dst) pair contributes once).

    Per iteration (all distributed):
      1. ranks co-partition with out-degree-annotated edges by src
         (``hash_bucket_join``); each edge row emits rank/outdeg to dst;
      2. a combiner groupby sums contributions per dst;
      3. dangling mass (rank on zero-outdeg nodes) and the L1 delta
         reach the driver as single scalars;
      4. new rank = (1-d)/N + d·(in_sum + dangling/N), left-joined back
         onto the full node list so sink-only nodes keep receiving mass.

    Returns a Dataset ``(node, rank: float64)`` summing to 1.  With
    ``certify=True`` asserts Σrank = 1 ± 1e-9 every round (mass
    conservation — the standard PageRank invariant).
    """
    nodes = nodes.materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty node set")

    uniform = nodes.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank": pa.array(
                    np.full(len(t), 1.0 / n_nodes), pa.float64()
                ),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    edges = edges.materialize()
    if edges.count() == 0:
        # every node is dangling: the iteration fixpoint is uniform
        # ((1-d)/N + d·(1/N) = 1/N) — return it directly
        return uniform

    # out-degree once, attached to every edge row once (edges are then
    # reused unchanged every round)
    outdeg = partial_sum_groupby(
        edges.map_batches(
            lambda t: t.select(["src"]), batch_format="pyarrow"
        ),
        ["src"],
        {},
        count_as="outdeg",
    )
    edges_od = hash_bucket_join(
        edges, outdeg, on="src", buckets=buckets
    ).materialize()

    # out-degree keyed by node, for the per-round mass scan (left join
    # keeps zero-outdeg nodes with a null)
    node_outdeg = outdeg.map_batches(
        lambda t: t.rename_columns(["node", "outdeg"]),
        batch_format="pyarrow",
    ).materialize()

    ranks = uniform

    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # ONE mass scan per round yields both scalars: total rank
        # (conservation certificate) and dangling rank (zero-outdeg)
        mass_rows = hash_bucket_join(
            ranks, node_outdeg, on="node", how="left", buckets=buckets
        ).map_batches(
            lambda t: pa.table(
                {
                    "total": pa.array(
                        [pc.sum(t["rank"]).as_py() or 0.0], pa.float64()
                    ),
                    "dang": pa.array(
                        [
                            pc.sum(
                                pc.if_else(
                                    pc.is_null(t["outdeg"]),
                                    t["rank"],
                                    pa.scalar(0.0, pa.float64()),
                                )
                            ).as_py()
                            or 0.0
                        ],
                        pa.float64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).take_all()
        total = float(sum(r["total"] for r in mass_rows))
        dangling = float(sum(r["dang"] for r in mass_rows))
        if certify and abs(total - 1.0) > 1e-9:
            raise AssertionError(
                f"pagerank: rank mass {total} != 1 (conservation)"
            )

        srcranks = ranks.map_batches(
            lambda t: t.rename_columns(["src", "rank"]),
            batch_format="pyarrow",
        )
        contrib = hash_bucket_join(
            edges_od, srcranks, on="src", buckets=buckets
        ).map_batches(
            lambda t: pa.table(
                {
                    "node": t["dst"],
                    "w": pc.divide(
                        t["rank"], pc.cast(t["outdeg"], pa.float64())
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        in_sum = partial_sum_groupby(contrib, ["node"], {"w": "w"})
        joined = hash_bucket_join(
            nodes, in_sum, on="node", how="left", buckets=buckets
        )
        add = base + damping * dangling / n_nodes

        def update(t: pa.Table, _add=add) -> pa.Table:
            w = pc.fill_null(pc.cast(t["w"], pa.float64()), 0.0)
            rank = pc.add(
                pc.multiply(w, damping), pa.scalar(_add, pa.float64())
            )
            return pa.table({"node": t["node"], "rank": rank})

        ranks = joined.map_batches(
            update, batch_format="pyarrow"
        ).materialize()
    return ranks
