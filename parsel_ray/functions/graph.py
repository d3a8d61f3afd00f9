"""Distributed iterative graph algorithms over edge-list Datasets.

PageRank here is the canonical join+groupby power iteration — the same
shape as a 10^10-node run: per round, ranks co-partition with edges by
source (one bucket shuffle), contributions aggregate by destination with
a per-batch combiner, and the driver sees only two scalars (total mass,
dangling mass).  Node state never materializes on the driver; the rank
table is a Dataset keyed by node id throughout, and it CARRIES each
node's out-degree so the per-round mass scan is a map-only pass (no
extra shuffle) and the contribution join needs no pre-annotated edge
table.

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

    State table: (node, outdeg: nullable, rank).  Per iteration:
      1. a MAP-ONLY mass scan emits two partial scalars per block —
         total rank (conservation certificate) and dangling rank
         (null-outdeg nodes); the driver folds O(blocks) rows;
      2. edges co-partition with the state by src
         (``hash_bucket_join``); each edge emits rank/outdeg to dst;
      3. a combiner groupby sums contributions per dst;
      4. new rank = (1-d)/N + d·(in_sum + dangling/N), left-joined onto
         the full node-state list so sink-only nodes keep their
         out-degree and keep receiving mass.

    Two bucket shuffles per round total.  Returns a Dataset
    ``(node, rank: float64)`` summing to 1.  With ``certify=True``
    asserts Σrank = 1 ± 1e-9 every round (mass conservation — the
    standard PageRank invariant).
    """
    nodes = nodes.materialize()
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty node set")

    edges = edges.materialize()
    if edges.count() == 0:
        # every node is dangling: the iteration fixpoint is uniform
        # ((1-d)/N + d·(1/N) = 1/N) — return it directly
        return nodes.map_batches(
            lambda t: pa.table(
                {
                    "node": t["node"],
                    "rank": pa.array(
                        np.full(len(t), 1.0 / n_nodes), pa.float64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    outdeg = partial_sum_groupby(
        edges.map_batches(
            lambda t: t.select(["src"]).rename_columns(["node"]),
            batch_format="pyarrow",
        ),
        ["node"],
        {},
        count_as="outdeg",
    )
    # state = (node, outdeg nullable, rank); dangling nodes carry null
    r0 = 1.0 / n_nodes
    state = hash_bucket_join(
        nodes, outdeg, on="node", how="left", buckets=buckets
    ).map_batches(
        lambda t: t.append_column(
            "rank", pa.array(np.full(len(t), r0), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        # map-only mass scan: two partial scalars per block
        mass_rows = state.map_batches(
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
        # tolerance scales with N: the sum accumulates O(N) float adds,
        # so a fixed 1e-9 would spuriously fail at ~1e7+ nodes
        tol = 1e-9 + 64.0 * n_nodes * np.finfo(np.float64).eps
        if certify and abs(total - 1.0) > tol:
            raise AssertionError(
                f"pagerank: rank mass {total} != 1 (conservation, "
                f"tol={tol:g})"
            )

        srcstate = state.map_batches(
            lambda t: pa.table(
                {"src": t["node"], "outdeg": t["outdeg"], "rank": t["rank"]}
            ),
            batch_format="pyarrow",
        )
        contrib = hash_bucket_join(
            edges, srcstate, on="src", buckets=buckets
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
        # cut the lineage here: the join below probes both sides'
        # schemas, and an unexecuted aggregate chain re-executes per
        # probe — in_sum is O(nodes) and cheap to pin
        in_sum = partial_sum_groupby(
            contrib, ["node"], {"w": "w"}
        ).materialize()
        joined = hash_bucket_join(
            state.map_batches(
                lambda t: t.select(["node", "outdeg"]),
                batch_format="pyarrow",
            ),
            in_sum,
            on="node",
            how="left",
            buckets=buckets,
        )
        add = base + damping * dangling / n_nodes

        def update(t: pa.Table, _add=add) -> pa.Table:
            w = pc.fill_null(pc.cast(t["w"], pa.float64()), 0.0)
            rank = pc.add(
                pc.multiply(w, damping), pa.scalar(_add, pa.float64())
            )
            return pa.table(
                {"node": t["node"], "outdeg": t["outdeg"], "rank": rank}
            )

        # pin the block count: the bucket join unions both sides'
        # blocks and the groupby preserves the union's count, so
        # without this the state's block count DOUBLES per round
        # (per-block task overhead then grows exponentially)
        state = joined.map_batches(
            update, batch_format="pyarrow"
        ).repartition(buckets).materialize()
    return state.map_batches(
        lambda t: t.select(["node", "rank"]), batch_format="pyarrow"
    )
