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

import ray
import ray.data as rd

from .agg import partial_sum_groupby
from .relational import _pa_side_schema, hash_bucket_join


@ray.remote
def _pr_mass_partial(tbl: "pa.Table") -> "tuple[float, float]":
    """Per-block (total rank, dangling rank) partial — runs as a raw Ray
    task over a MATERIALIZED state block ref.  Raw tasks (not a Dataset
    pass) because the input blocks already sit in plasma: per-block
    fan-out + a driver fold of O(blocks) scalars skips a whole streaming
    execution per PageRank round."""
    if len(tbl) == 0 or "rank" not in tbl.column_names:
        # schema-pinning empty union blocks skip map UDFs, so an empty
        # block can still carry a pre-update schema — contributes nothing
        return 0.0, 0.0
    total = pc.sum(tbl["rank"]).as_py() or 0.0
    dang = (
        pc.sum(
            pc.if_else(
                pc.is_null(tbl["outdeg"]), tbl["rank"],
                pa.scalar(0.0, pa.float64()),
            )
        ).as_py()
        or 0.0
    )
    return total, dang


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

    if certify:
        # fail fast on edges whose endpoints are missing from ``nodes``:
        # an unknown dst would silently DROP its in-mass at the state
        # left-join (conservation then fails a full round later, or
        # never with certify=False); an unknown src silently loses its
        # edges at the contrib join.  One distributed pass over the
        # O(distinct endpoints) set — never a driver-side node set.
        ends = edges.map_batches(
            lambda t: pa.table(
                {"node": pa.concat_arrays(
                    [t["src"].combine_chunks().cast(t["src"].type),
                     t["dst"].combine_chunks().cast(t["dst"].type)]
                )}
            ),
            batch_format="pyarrow",
        )
        # materialize: hash_bucket_join probes the side schema and then
        # re-executes an unexecuted aggregate chain end-to-end (the same
        # double-execution the loop body documents for in_sum)
        distinct_ends = partial_sum_groupby(ends, ["node"], {},
                                            count_as="__c").materialize()
        marked = nodes.map_batches(
            lambda t: pa.table(
                {"node": t["node"],
                 "__m": pa.array(np.ones(len(t), np.int8))}
            ),
            batch_format="pyarrow",
        )
        n_missing = hash_bucket_join(
            distinct_ends, marked, on="node", how="left", buckets=buckets
        ).map_batches(
            lambda t: pa.table(
                {"miss": pa.array(
                    [pc.sum(pc.cast(pc.is_null(t["__m"]),
                                    pa.int64())).as_py() or 0],
                    pa.int64())}
            ),
            batch_format="pyarrow",
        ).take_all()
        missing = sum(r["miss"] for r in n_missing)
        if missing:
            raise ValueError(
                f"pagerank: {missing} edge endpoint(s) are not in the "
                "node set — their rank mass would be dropped; add them "
                "to `nodes` or pre-filter the edges"
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
    # explicit side schemas for the two in-loop joins: skipping the
    # ds.schema() probes keeps each round ONE fused streaming execution
    # (a probe of an unexecuted aggregate chain re-executes it, which is
    # why earlier revisions had to materialize in_sum mid-round)
    node_t = _pa_side_schema(state).field("node").type
    edges_schema = _pa_side_schema(edges)
    srcstate_schema = pa.schema(
        [("src", node_t), ("outdeg", pa.int64()), ("rank", pa.float64())]
    )
    insum_schema = pa.schema([("node", node_t), ("w", pa.float64())])
    nodestate_schema = pa.schema([("node", node_t), ("outdeg", pa.int64())])
    # tolerance scales with N: the sum accumulates O(N) float adds,
    # so a fixed 1e-9 would spuriously fail at ~1e7+ nodes
    tol = 1e-9 + 64.0 * n_nodes * np.finfo(np.float64).eps
    for _ in range(iters):
        # mass scan: per-block raw tasks over the materialized state's
        # plasma refs (distributed; the driver folds O(blocks) scalars)
        parts = ray.get(
            [_pr_mass_partial.remote(ref) for ref in state.to_arrow_refs()]
        )
        total = float(sum(p[0] for p in parts))
        dangling = float(sum(p[1] for p in parts))
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
            edges, srcstate, on="src", buckets=buckets,
            side_schemas=(edges_schema, srcstate_schema),
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
            state.map_batches(
                lambda t: t.select(["node", "outdeg"]),
                batch_format="pyarrow",
            ),
            in_sum,
            on="node",
            how="left",
            buckets=buckets,
            side_schemas=(nodestate_schema, insum_schema),
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


def triangle_count(
    edges,
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 32,
):
    """Exact triangle count over an undirected edge Dataset, fully
    distributed via degree orientation (the classic bound: orienting
    every edge from its lower-(degree, id) endpoint to the higher one
    caps per-node out-degree at O(sqrt(m)), so wedge generation —
    the quadratic step — is bounded regardless of hub skew; public
    compact-forward / Latapy 2008 literature).

    Pipeline (all shuffles are coarse hash partitions, no driver state):
      1. canonicalize + dedupe edges ((lo, hi), drop self-loops);
      2. degree per node = combiner groupby over the melted endpoints;
      3. two bucket joins attach endpoint degrees; orient edges;
      4. wedges: ``grouped_apply`` on the oriented source emits each
         out-neighbor pair once, packed (lo<<32|hi by orientation order);
      5. closure: bucket join wedge keys against oriented-edge keys,
         combiner count.

    Node ids must fit uint32 (packed-key contract, asserted).  Returns a
    one-row Dataset ``(n_triangles: int64)``.
    """
    import pandas as pd

    from .agg import grouped_apply

    def canon(t: pa.Table) -> pa.Table:
        a = pc.cast(t[a_col], pa.int64())
        b = pc.cast(t[b_col], pa.int64())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        keep = pc.not_equal(lo, hi)
        out = pa.table({"lo": pc.filter(lo, keep), "hi": pc.filter(hi, keep)})
        amax = pc.max(out["hi"]).as_py() if len(out) else 0
        amin = pc.min(out["lo"]).as_py() if len(out) else 0
        assert amax is None or amax < 1 << 32, "node ids must fit uint32"
        assert amin is None or amin >= 0, (
            "node ids must be non-negative (packed-key contract)"
        )
        return out

    # dedupe multi-edges with a combiner groupby (count discarded)
    uniq = partial_sum_groupby(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["lo", "hi"], {}, count_as="__n",
    ).map_batches(lambda t: t.select(["lo", "hi"]), batch_format="pyarrow")

    def melt(t: pa.Table) -> pa.Table:
        return pa.table(
            {"node": pa.concat_arrays(
                [t["lo"].combine_chunks(), t["hi"].combine_chunks()]
            )}
        )

    degs = partial_sum_groupby(
        uniq.map_batches(melt, batch_format="pyarrow"),
        ["node"], {}, count_as="deg",
    )

    with_da = hash_bucket_join(
        uniq, degs.map_batches(
            lambda t: t.rename_columns(["lo", "deg_lo"]),
            batch_format="pyarrow"),
        on="lo", buckets=num_partitions,
    )
    with_db = hash_bucket_join(
        with_da, degs.map_batches(
            lambda t: t.rename_columns(["hi", "deg_hi"]),
            batch_format="pyarrow"),
        on="hi", buckets=num_partitions,
    )

    def orient(t: pa.Table) -> pa.Table:
        lo = t["lo"].to_numpy(zero_copy_only=False)
        hi = t["hi"].to_numpy(zero_copy_only=False)
        dl = t["deg_lo"].to_numpy(zero_copy_only=False)
        dh = t["deg_hi"].to_numpy(zero_copy_only=False)
        # orientation order: (deg, id) lexicographic, lower first
        lo_first = (dl < dh) | ((dl == dh) & (lo < hi))
        src = np.where(lo_first, lo, hi)
        dst = np.where(lo_first, hi, lo)
        # rank key packs (deg, id) so the wedge kernel can order
        # out-neighbors by orientation without re-joining degrees
        dstrank = np.where(lo_first, dh, dl).astype(np.uint64) << np.uint64(
            32
        ) | dst.astype(np.uint64)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "dstrank": pa.array(dstrank.astype(np.int64), pa.int64()),
            }
        )

    oriented = with_db.map_batches(orient, batch_format="pyarrow")

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        nb = g.sort_values("dstrank")["dst"].to_numpy()
        d = nb.size
        if d < 2:
            # sentinel keeps the stage schema-stable even when NO group
            # emits a wedge (grouped_apply drops empty frames); -1 can
            # never match an edge key (packed keys are non-negative)
            return pd.DataFrame({"wkey": np.array([-1], np.int64)})
        i, j = np.triu_indices(d, k=1)
        keys = (nb[i].astype(np.uint64) << np.uint64(32)) | nb[j].astype(
            np.uint64
        )
        return pd.DataFrame({"wkey": keys.astype(np.int64)})

    wedge_keys = grouped_apply(
        oriented.select_columns(["src", "dst", "dstrank"]),
        ["src"], wedges, num_partitions=num_partitions,
    )

    def ekey(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"wkey": pa.array(((src << np.uint64(32)) | dst).astype(
                np.int64), pa.int64()),
             "__edge": pa.array(np.ones(len(t), np.int8))}
        )

    closures = hash_bucket_join(
        wedge_keys, oriented.map_batches(ekey, batch_format="pyarrow"),
        on="wkey", how="inner", buckets=num_partitions,
    )
    total = closures.count()
    return rd.from_arrow(
        pa.table({"n_triangles": pa.array([int(total)], pa.int64())})
    )


def reachable_nodes(
    edges,
    start: int,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int = 8,
    max_rounds: int = 64,
):
    """Distributed BFS reachability from ``start`` over a directed edge
    Dataset — the iterative-join twin of SQL's cycle-safe
    ``WITH RECURSIVE ... UNION``.  Per round: frontier ⋈ edges (bucket
    co-partition) → distinct successors (combiner groupby) → anti-join
    against the seen set (left join on a marker) keeps only NEW nodes.
    The driver sees one convergence scalar per round; seen/frontier are
    repartitioned and materialized each round (loop-carried Datasets
    grow their block count otherwise — see :func:`pagerank`).  Rounds =
    graph eccentricity of ``start``, never ``max_rounds`` on sane
    graphs."""
    uniq = partial_sum_groupby(
        edges.map_batches(
            lambda t: pa.table(
                {
                    "src": pc.cast(t[src_col], pa.int64()),
                    "dst": pc.cast(t[dst_col], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["src", "dst"], {}, count_as="__n",
    ).map_batches(lambda t: t.select(["src", "dst"]),
                  batch_format="pyarrow").materialize()

    seen = rd.from_arrow(
        pa.table({"node": pa.array([int(start)], pa.int64())})
    ).materialize()
    frontier = seen

    for _ in range(max_rounds):
        succ = partial_sum_groupby(
            hash_bucket_join(
                frontier.map_batches(
                    lambda t: t.rename_columns(["src"]),
                    batch_format="pyarrow",
                ),
                uniq, on="src", how="inner", buckets=num_partitions,
            ).map_batches(
                lambda t: pa.table({"node": t["dst"]}),
                batch_format="pyarrow",
            ),
            ["node"], {}, count_as="__n",
        ).map_batches(lambda t: t.select(["node"]),
                      batch_format="pyarrow").materialize()
        if succ.count() == 0:
            # frontier has no out-edges at all; an empty Dataset has no
            # schema, so the anti-join below would fail on it anyway
            break

        marked = hash_bucket_join(
            succ,
            seen.map_batches(
                lambda t: t.append_column(
                    "__seen", pa.array(np.ones(len(t), np.int8))
                ),
                batch_format="pyarrow",
            ),
            on="node", how="left", buckets=num_partitions,
        )
        new = marked.map_batches(
            lambda t: t.filter(pc.is_null(t["__seen"])).select(["node"]),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        seen = seen.union(new).repartition(num_partitions).materialize()
        frontier = new
    else:
        raise RuntimeError(
            f"reachable_nodes: not converged after {max_rounds} rounds "
            "(graph eccentricity exceeds max_rounds — raise it); a "
            "truncated set would silently diverge from the recursive-CTE "
            "semantics"
        )
    return seen
