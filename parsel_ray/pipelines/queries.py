"""The query suite: every operator family from SURVEY.md §2 exercised as a
Ray Data pipeline over the driver test tables, each with (where SQL can
express it) a DuckDB oracle in ``ORACLE_SQL``.

Conventions that keep the Ray result and the SQL oracle hash-identical:

* money / float measures are converted per row to integer cents via
  ``floor(x * 100 + 0.5)`` — the SAME IEEE double expression in numpy and
  DuckDB — and summed as int64, so aggregate values don't depend on
  summation order;
* every computed column is named identically in both;
* top-k sorts carry a deterministic tie-break key;
* float comparisons (cosine) only ever cross the output boundary as ranks
  or thresholded memberships, never raw floats (except a float64 column
  documented stable to ~1e-12).

Scale notes are inline per query: which side is broadcast, where the
shuffle is, what becomes the 100 TB path.
"""

from __future__ import annotations

import hashlib
import html as _html
import math
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions import dedup as D
from ..functions.agg import grouped_apply, partial_agg_groupby, partial_sum_groupby
from ..functions import text as T
from ..functions.relational import (
    LazyRef,
    broadcast_lookup,
    hash_bucket_join,
)
from ..functions.similarity import (
    _stack_embeddings,
    brute_force_topk,
    embedding_near_dup_pairs,
    exact_near_dup_pairs,
)
from ..stages.extract import ExtractSpec, SelectorExtract


_READ_SCHEMAS: dict = {}


def _clean_schema(path: str, columns=None) -> pa.Schema:
    """Metadata-free schema for ``path`` (cached footer read) — see
    :func:`_read` for why."""
    sch = _READ_SCHEMAS.get(path)
    if sch is None:
        import pyarrow.parquet as _pq

        sch = _pq.read_schema(path).remove_metadata()
        _READ_SCHEMAS[path] = sch
    if columns is not None:
        sch = pa.schema([sch.field(c) for c in columns])
    return sch


def _read(sf_dir: str, table: str, columns=None):
    """Pruned parquet read with a METADATA-FREE schema: the files carry
    b'pandas' schema metadata, which makes every downstream block schema
    unhashable (a dict) and floods Ray's per-stage schema-dedup path
    with warnings.  One cached footer read per (dir, table) supplies the
    clean schema; the data path is unchanged."""
    path = f"{sf_dir}/{table}.parquet"
    return rd.read_parquet(
        path, columns=columns, schema=_clean_schema(path, columns)
    )


def _read_wide(sf_dir: str, table: str, columns=None, blocks: int = 64):
    """:func:`_read` + a tiny id-column repartition for CPU-BOUND
    downstream stages.  The test tables are ONE parquet row group, so a
    read-based pipeline starts as a single task and Ray's streaming
    executor serializes every fused stage behind it (~3× effective
    parallelism on 32 cpus measured on the codec round-trips).  The
    repartition moves only the slim projected columns (a few KB here)
    and restores full fan-out.  At 100 TB the corpus is many files/row
    groups and the read parallelizes naturally — this is a small-input
    artifact, the same one bench.py's replicated_docs documents."""
    return _read(sf_dir, table, columns).repartition(blocks)


def _cents(x: "np.ndarray | pa.ChunkedArray"):
    """floor(x*100 + 0.5) as int64 — byte-deterministic money conversion."""
    if isinstance(x, (pa.ChunkedArray, pa.Array)):
        x = x.to_numpy(zero_copy_only=False)
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


_CENTS_SQL = "CAST(floor({expr} * 100 + 0.5) AS BIGINT)"


# ---------------------------------------------------------------------------
# Relational core
# ---------------------------------------------------------------------------


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: filter → per-batch measure computation (combiner
    fodder) → groupby(2 keys) aggregate.  The shuffle moves only the
    4-measure rows; at 100 TB the pre-aggregation inside map_batches keeps
    the exchange at |keys|·|batches| rows."""
    cutoff = datetime(1998, 9, 2)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(cutoff)))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        tax = t["l_tax"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": t["l_quantity"],
                "base_cents": pa.array(_cents(ext)),
                "disc_cents": pa.array(_cents(ext * (1.0 - disc))),
                "charge_cents": pa.array(_cents(ext * (1.0 - disc) * (1.0 + tax))),
            }
        )

    ds = _read(
        sf_dir,
        "lineitem",
        [
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_shipdate",
        ],
    ).map_batches(prep, batch_format="pyarrow")
    out = partial_sum_groupby(
        ds,
        ["l_returnflag", "l_linestatus"],
        {
            "qty": "sum_qty",
            "base_cents": "sum_base_cents",
            "disc_cents": "sum_disc_cents",
            "charge_cents": "sum_charge_cents",
        },
        count_as="count_order",
    )

    def post(t: pa.Table) -> pa.Table:
        n = t["count_order"].to_numpy(zero_copy_only=False).astype(np.float64)
        avg_qty = t["sum_qty"].to_numpy(zero_copy_only=False) / n
        return t.append_column("avg_qty", pa.array(avg_qty, pa.float64()))

    return out.map_batches(post, batch_format="pyarrow")


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       SUM(l_quantity) AS sum_qty,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)')}) AS BIGINT) AS sum_charge_cents,
       CAST(COUNT(*) AS BIGINT) AS count_order,
       SUM(l_quantity) / COUNT(*) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(sf_dir: str):
    """Revenue top-10: customer semi-join as a PARTITIONED bucket join
    (the BUILDING key set is ~1/5 of ALL customers — SF-proportional,
    never broadcastable at 100 TB), pre-aggregated lineitem revenue,
    then the partitioned hash join with the filtered orders side (date
    filters keep ~half of orders), global sort+limit with deterministic
    tie-break."""
    seg_date = datetime(1997, 3, 15)
    building = _read(
        sf_dir, "customer", ["c_custkey", "c_mktsegment"]
    ).map_batches(
        # unique keys, so the inner bucket join below IS a semi-join
        lambda t: t.filter(pc.equal(t["c_mktsegment"], "BUILDING"))
        .select(["c_custkey"]).rename_columns(["o_custkey"]),
        batch_format="pyarrow",
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"])

    orders_f = hash_bucket_join(
        orders.map_batches(
            lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(seg_date))),
            batch_format="pyarrow",
        ),
        building,
        on="o_custkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"])
        .rename_columns(["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow",
    )

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(seg_date)))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "rev_cents": pa.array(_cents(ext * (1.0 - disc)))}
        )

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    li_rev = partial_sum_groupby(
        li.map_batches(rev, batch_format="pyarrow"),
        ["l_orderkey"],
        {"rev_cents": "revenue_cents"},
    )
    joined = hash_bucket_join(li_rev, orders_f, on="l_orderkey", buckets=16)
    return joined.sort(
        ["revenue_cents", "l_orderkey"], descending=[True, False]
    ).limit(10)


Q3_SQL = f"""
SELECT l_orderkey,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS revenue_cents,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
     JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-03-15'
  AND l_shipdate  > TIMESTAMP '1997-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, l_orderkey
LIMIT 10
"""


def q5_region_revenue(sf_dir: str):
    """Multi-way join, all-partitioned shape: supplier and customer are
    SF-PROPORTIONAL (billions of rows at 100 TB — never broadcastable),
    so both attach via ``hash_bucket_join``; only the fixed-size
    nation/region tables (25/5 rows by schema) broadcast.  The asia
    filter prunes BOTH dimension sides before their shuffles (the final
    supp==cust nation equality can only hold inside the region), then
    lineitem⋈orders is the orderkey-partitioned join."""
    y0, y1 = datetime(1996, 1, 1), datetime(1997, 1, 1)
    nation = _read(sf_dir, "nation").to_pandas()
    region = _read(sf_dir, "region").to_pandas()
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"][["n_nationkey", "n_name"]]
    asia_arr = pa.array(sorted(int(k) for k in asia["n_nationkey"]),
                        pa.int64())  # fixed-size: ships in closures
    name_of = dict(zip(asia["n_nationkey"], asia["n_name"]))

    supp_asia = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["s_nationkey"], pa.int64()),
                     value_set=asia_arr)
        ).select(["s_suppkey", "s_nationkey"])
        .rename_columns(["l_suppkey", "supp_nation"]),
        batch_format="pyarrow",
    )
    cust_asia = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                     value_set=asia_arr)
        ).select(["c_custkey", "c_nationkey"])
        .rename_columns(["o_custkey", "cust_nation"]),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev_cents": pa.array(_cents(ext * (1.0 - disc))),
            }
        )

    li = hash_bucket_join(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow"),
        supp_asia, on="l_suppkey", how="inner", buckets=16,
    ).select_columns(["orderkey", "supp_nation", "rev_cents"])

    orders = hash_bucket_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["o_orderdate"], pa.scalar(y0)),
                    pc.less(t["o_orderdate"], pa.scalar(y1)),
                )
            ).select(["o_orderkey", "o_custkey"])
            .rename_columns(["orderkey", "o_custkey"]),
            batch_format="pyarrow",
        ),
        cust_asia, on="o_custkey", how="inner", buckets=16,
    ).select_columns(["orderkey", "cust_nation"])

    joined = hash_bucket_join(li, orders, on="orderkey", buckets=16)
    matched = joined.map_batches(
        lambda t: t.filter(pc.equal(t["supp_nation"], t["cust_nation"])),
        batch_format="pyarrow",
    )
    agg = partial_sum_groupby(
        matched, ["supp_nation"], {"rev_cents": "revenue_cents"}
    )

    def name(t: pa.Table) -> pa.Table:
        keys = t["supp_nation"].to_numpy(zero_copy_only=False)
        names = pa.array([name_of[int(k)] for k in keys], pa.string())
        return pa.table({"n_name": names, "revenue_cents": t["revenue_cents"]})

    return agg.map_batches(name, batch_format="pyarrow")


Q5_SQL = f"""
SELECT n_name,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS revenue_cents
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def filter_highvalue_orders(sf_dir: str):
    """Vectorized filter + projection (predicate inside map_batches, not
    ds.filter(row_fn))."""

    def f(t: pa.Table) -> pa.Table:
        cents = _cents(t["o_totalprice"])
        t = t.append_column("o_totalprice_cents", pa.array(cents))
        return t.filter(
            pc.greater(t["o_totalprice_cents"], pa.scalar(30_000_00, pa.int64()))
        ).select(["o_orderkey", "o_totalprice_cents", "o_orderpriority"])

    return _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"]).map_batches(
        f, batch_format="pyarrow"
    )


FILTER_SQL = f"""
SELECT o_orderkey, {_CENTS_SQL.format(expr='o_totalprice')} AS o_totalprice_cents, o_orderpriority
FROM orders
WHERE {_CENTS_SQL.format(expr='o_totalprice')} > 3000000
"""


def distinct_event_types(sf_dir: str):
    """DISTINCT + count via groupby (one small shuffle)."""
    return partial_sum_groupby(
        _read(sf_dir, "events", ["event_type"]), ["event_type"], {}, count_as="n"
    )


DISTINCT_SQL = "SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY event_type"


def top5_parts(sf_dir: str):
    """Global sort + limit (top-k) with deterministic tie-break."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "p_name": t["p_name"],
                "price_cents": pa.array(_cents(t["p_retailprice"])),
            }
        )

    return (
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
        .map_batches(prep, batch_format="pyarrow")
        .sort(["price_cents", "p_partkey"], descending=[True, False])
        .limit(5)
    )


TOP5_SQL = f"""
SELECT p_partkey, p_name, {_CENTS_SQL.format(expr='p_retailprice')} AS price_cents
FROM part ORDER BY price_cents DESC, p_partkey LIMIT 5
"""


def events_hourly(sf_dir: str):
    """Tumbling-window aggregate: event-time floored to the hour, grouped
    with the type key.  (Ray Data has no watermarks; windows are derived
    columns + groupby — ordering assumption documented in SURVEY §2.6.)"""

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "value_cents": pa.array(_cents(t["value"])),
            }
        )

    ds = (
        _read(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(prep, batch_format="pyarrow")
    )
    return partial_sum_groupby(
        ds, ["event_type", "hour"], {"value_cents": "sum_value_cents"}, count_as="n"
    )


HOURLY_SQL = f"""
SELECT event_type, date_trunc('hour', ts) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM({_CENTS_SQL.format(expr='value')}) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type, date_trunc('hour', ts)
"""


def events_hourly_ivm(sf_dir: str):
    """Incremental view maintenance: the hourly aggregate is built from
    the FIRST HALF of the stream (event_id < median split), persisted as
    a materialized view (worker-side parquet shards), then the second
    half arrives as a DELTA whose combiner aggregate merges into the
    view by groupby-sum — no recompute of the base.  The DuckDB oracle
    is the full recompute over all events: the IVM result must equal it
    exactly (counts and cents are ints, so the merge is exact)."""
    import tempfile as _tempfile

    import pyarrow.dataset as pads

    from .streaming import _footer_minmax

    path = f"{sf_dir}/events.parquet"
    lo, hi = _footer_minmax(path, "event_id")
    split = int((int(lo) + int(hi)) // 2)

    def prep(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {
                "event_type": t["event_type"],
                "hour": hour,
                "n": pa.array(np.ones(len(t), np.int64)),
                "sum_value_cents": pa.array(_cents(t["value"])),
            }
        )

    def agg(part) -> "rd.Dataset":
        return partial_sum_groupby(
            rd.read_parquet(
                path, columns=["event_id", "ts", "event_type", "value"],
                filter=part,
            ).map_batches(prep, batch_format="pyarrow"),
            ["event_type", "hour"],
            {"n": "n", "sum_value_cents": "sum_value_cents"},
        )

    # materialize the base view to a worker-side parquet dir (the
    # "view" a production pipeline would keep between delta batches)
    view_dir = _tempfile.mkdtemp(prefix="hourly_view_", dir="/tmp")
    agg(pads.field("event_id") < split).write_parquet(view_dir)

    base = rd.read_parquet(view_dir)
    delta = agg(pads.field("event_id") >= split)

    # delta-apply = union + one groupby-sum (exact int merge)
    return partial_sum_groupby(
        base.union(delta),
        ["event_type", "hour"],
        {"n": "n", "sum_value_cents": "sum_value_cents"},
    )


def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user: partition by key,
    sort by ts within the group, count gap starts.  The per-user group fits
    memory by construction (keyed streams); skewed users would be salted by
    (user_id, day)."""
    GAP = pd.Timedelta(minutes=30)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        new_session = (g["ts"].diff() > GAP) | g["ts"].diff().isna()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [np.int64(new_session.sum())],
                "n_events": [np.int64(len(g))],
            }
        )

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        "user_id",
        sessions,
        num_partitions=16,
    )


SESSION_SQL = """
WITH e AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM e GROUP BY user_id
"""


def nation_customer_agg(sf_dir: str):
    """Broadcast dimension lookup (ray.put once → merge per batch) +
    aggregate."""
    import pyarrow.parquet as pq

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).rename_columns(["c_nationkey", "n_name"])
    nref = ray.put(nat)

    def prep(t: pa.Table) -> pa.Table:
        return t.append_column("acctbal_cents", pa.array(_cents(t["c_acctbal"])))

    ds = (
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(prep, batch_format="pyarrow")
    )
    joined = broadcast_lookup(ds, nref, on="c_nationkey", concurrency=2)
    return partial_sum_groupby(
        joined, ["n_name"], {"acctbal_cents": "sum_acctbal_cents"}, count_as="n_customers"
    )


NATION_SQL = f"""
SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM({_CENTS_SQL.format(expr='c_acctbal')}) AS BIGINT) AS sum_acctbal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def hash_join_priority(sf_dir: str):
    """Both-sides-large partitioned hash join (explicit bucket shuffle),
    then aggregate.  This is the 100 TB join path; bucket count bounds
    per-group memory."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.rename_columns(["orderkey", "l_quantity"]), batch_format="pyarrow"
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(["orderkey", "o_orderpriority"]), batch_format="pyarrow"
    )
    joined = hash_bucket_join(li, orders, on="orderkey", buckets=16)
    return partial_sum_groupby(
        joined, ["o_orderpriority"], {"l_quantity": "sum_qty"}, count_as="n_items"
    )


HASHJOIN_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Extraction (parsel-parity kernels over constructed documents)
# ---------------------------------------------------------------------------


def _doc_html(batch: pa.Table) -> pa.Table:
    """Deterministic HTML built from document columns (escaped), so CSS/
    XPath extraction must round-trip the source values exactly."""
    ids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    langs = batch["lang"].to_pylist()
    srcs = batch["source"].to_pylist()
    pages = [
        (
            f'<html><body><div id="d{i}" data-lang="{_html.escape(lg, quote=True)}"'
            f' data-source="{_html.escape(sc, quote=True)}">'
            f'<p class="t">{_html.escape(tx)}</p></div>'
            + "".join(
                f'<a href="http://site/{i}/{j}"><img src="http://img/{i}/{j}.jpg"/></a>'
                for j in range(i % 5 + 1)
            )
            + "</body></html>"
        )
        for i, tx, lg, sc in zip(ids, texts, langs, srcs)
    ]
    return pa.table({"doc_id": batch["doc_id"], "page": pa.array(pages, pa.string())})


def extract_attr_roundtrip(sf_dir: str):
    """CSS ::attr / ::text and XPath @attr extraction round-trip: the
    constructed page carries lang/source/text; extraction must return them
    byte-identically (entity escaping handled by the DOM layer —
    reference semantics utils.py:68-94, selector.py:699-721)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"]).map_batches(
        _doc_html, batch_format="pyarrow"
    )
    return ds.map_batches(
        SelectorExtract(specs=[
                ExtractSpec("data_lang", "css", "div::attr(data-lang)", "get"),
                ExtractSpec("data_source", "xpath", "//div/@data-source", "get"),
                ExtractSpec("p_text", "css", "p.t::text", "get"),
            ],
            input_col="page",
            doc_type="html",),
        batch_format="pyarrow",
        batch_size=512,
    )


# nullif: an empty text builds <p class="t"></p>, whose css ::text get() is
# null (no text node) — the oracle must agree for arbitrary data.
ATTR_SQL = (
    "SELECT doc_id, lang AS data_lang, source AS data_source, "
    "nullif(text, '') AS p_text FROM documents"
)


def extract_links(sf_dir: str):
    """Link/image extraction fan-out: count + first-match terminals
    (SelectorList.get/getall semantics, selector.py:249-275)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"]).map_batches(
        _doc_html, batch_format="pyarrow"
    )
    return ds.map_batches(
        SelectorExtract(specs=[
                ExtractSpec("n_links", "css", "a::attr(href)", "count"),
                ExtractSpec("first_href", "css", "a::attr(href)", "get"),
                ExtractSpec("n_imgs", "xpath", "//a/img/@src", "count"),
                ExtractSpec("first_img", "xpath", '//a/img/@src', "get"),
                # full-document axis: every img follows the single div
                ExtractSpec("n_following", "xpath", "//div/following::img", "count"),
            ],
            input_col="page",
            doc_type="html",),
        batch_format="pyarrow",
        batch_size=512,
    )


LINKS_SQL = """
SELECT doc_id,
       CAST(doc_id % 5 + 1 AS BIGINT) AS n_links,
       'http://site/' || doc_id || '/0' AS first_href,
       CAST(doc_id % 5 + 1 AS BIGINT) AS n_imgs,
       'http://img/' || doc_id || '/0.jpg' AS first_img,
       CAST(doc_id % 5 + 1 AS BIGINT) AS n_following
FROM documents
"""


def extract_regex_first(sf_dir: str):
    """Selector.re_first over type="text" selectors (utils.py:68-94 policy:
    single group → group matches)."""
    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        SelectorExtract(specs=[ExtractSpec("kw", "re", r"\b(scan|merge|join)\b", "re_first")],
            input_col="text",
            doc_type="text",),
        batch_format="pyarrow",
        batch_size=2048,
    )


REGEX_SQL = r"""
SELECT doc_id, nullif(regexp_extract(text, '\b(scan|merge|join)\b', 1), '') AS kw
FROM documents
"""


def jmespath_props(sf_dir: str):
    """JMESPath over a JSON column (Selector type sniffing → json,
    selector.py:301-347; jmespath query selector.py:520-560)."""
    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        SelectorExtract(specs=[ExtractSpec("k_str", "jmespath", "k", "get")],
            input_col="props",
            doc_type="json",),
        batch_format="pyarrow",
        batch_size=4096,
    )


JMES_SQL = "SELECT event_id, json_extract_string(props, '$.k') AS k_str FROM events"


# ---------------------------------------------------------------------------
# Text analysis / fingerprinting / dedup
# ---------------------------------------------------------------------------


def doc_token_stats(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        T.token_stats, batch_format="pyarrow"
    )
    return ds.select_columns(["doc_id", "n_tokens", "n_punct", "n_stopwords"])


TOKEN_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[.!?,;:]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(text, '\b(?:the|a|and|of|to|in|is|it)\b')) AS BIGINT) AS n_stopwords
FROM documents
"""


def sequence_packing(sf_dir: str, seq_len: int = 2048):
    """Concat-and-chunk sequence packing — the training-data op that
    maps every document to its (bin, offset) position in the fixed-
    length token stream fed to an LLM trainer.  bin = exclusive global
    token prefix-sum // seq_len in doc_id order; the prefix sum is the
    distributed range-partition + local-cumsum + O(P)-offsets scan
    (:func:`global_prefix_sum`) — no driver pass over rows, no
    sequential bottleneck."""
    from ..functions.sort import global_prefix_sum

    toks = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        T.token_stats, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])
    pre = global_prefix_sum(
        toks, ["doc_id"], [True], "n_tokens", out_col="prefix"
    )
    L = pa.scalar(seq_len, pa.int64())

    def place(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": t["n_tokens"],
                "bin": pc.divide(t["prefix"], L),
                "bin_offset": pc.subtract(
                    t["prefix"], pc.multiply(pc.divide(t["prefix"], L), L)
                ),
            }
        )

    return pre.map_batches(place, batch_format="pyarrow")


PACKING_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
  FROM documents),
p AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS prefix
  FROM t)
SELECT doc_id, n_tokens,
       CAST(prefix // 2048 AS BIGINT) AS bin,
       CAST(prefix % 2048 AS BIGINT) AS bin_offset
FROM p
"""


def dedup_exact(sf_dir: str):
    """Exact dedup: md5 fingerprint → hash-partitioned groupby → first-wins
    (min doc_id).  Per-batch pre-dedup keeps the shuffle at one row per
    distinct hash per batch."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: T.fingerprint(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )

    return partial_agg_groupby(ds, ["fingerprint"], [("doc_id", "min", "doc_id")])


DEDUP_SQL = r"""
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents GROUP BY 2
"""


def embedding_knn(sf_dir: str):
    """Exact cosine top-5 for 10 query vectors: broadcast query matrix →
    per-batch matmul partial top-k → tiny merge.  Output is rank-only
    (floats never cross the compare boundary).  The query vectors come
    from a predicate-pushdown read — the full table never lands on the
    driver."""
    import pyarrow.dataset as pads

    qt = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        schema=_clean_schema(f"{sf_dir}/embeddings.parquet",
                             ["vec_id", "embedding"]),
        filter=pads.field("vec_id") < 10,
    ).take_batch(32, batch_format="pyarrow")
    qmat = _stack_embeddings(qt["embedding"])
    norms = np.linalg.norm(qmat, axis=1)
    norms[norms == 0] = 1.0
    qref = ray.put(
        {"ids": qt["vec_id"].to_numpy(zero_copy_only=False), "mat": qmat / norms[:, None]}
    )
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, qref, k=5, concurrency=2)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


KNN_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cosine
  FROM q CROSS JOIN embeddings e
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


def embedding_near_dup(sf_dir: str):
    """EXACT cosine-threshold duplicate pairs (blocked all-pairs matmul as
    raw Ray tasks — the correctness oracle; the LSH-bucketed variant below
    is the at-scale path).  Pair set crosses the boundary as memberships,
    not floats."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = exact_near_dup_pairs(ds, threshold=0.4)
    return pairs.select(["id_a", "id_b"])


NEARDUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


# -- rows-only (non-SQL-expressible) --------------------------------------


def dedup_minhash(sf_dir: str, threshold: float = 0.8):
    """MinHash+LSH near-dup dedup, distributed END-TO-END: signature →
    banded buckets → candidate pairs → co-partitioned signature verify
    (:func:`parsel_ray.functions.dedup.distributed_verify_pairs` — no
    driver-side signature materialization) → min-label-propagation
    components → survivors via a left bucket join (keep components' min
    id + every unpaired doc).

    DRIVER-CERTIFIED: approximate dedup has no SQL twin, but its hard
    invariants do — ``n_docs`` and ``n_fp_groups`` (count of distinct
    exact-text fingerprints; the md5 expression DuckDB recomputes
    byte-identically — the oracle-pass ``dedup_exact`` anchor) come from
    SQL, while ``partition_ok`` (victims + survivors partition the
    corpus), ``exact_dups_collapsed_ok`` (identical texts have identical
    signatures, land in the same bands, verify at est=1.0 and join one
    component — so at most ONE member of every exact-duplicate group may
    survive) and ``survivors_le_groups_ok`` (consequently #survivors ≤
    #fingerprint groups) certify the LSH/verify/components/join plumbing
    end-to-end.  The survivor SET itself stays pinned distributed ==
    single-process in tests/test_ray_stages.py."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sigs = ds.map_batches(
        D.MinHasher(col="text", num_perm=64, k=5),
        batch_format="pyarrow",
        batch_size=1024,
    ).select_columns(["doc_id", "sig"]).materialize()
    bands = sigs.map_batches(
        lambda t: D.emit_band_rows(t, "doc_id", bands=16, rows_per_band=4),
        batch_format="pyarrow",
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id", threshold, num_partitions=64)
    verified = D.distributed_verify_pairs(
        pairs, sigs, id_col="doc_id", num_perm=64, threshold=threshold
    )
    labels = D.label_propagation_components(verified)
    # non-survivors: any node whose component label is another (smaller) id
    def _dead_rows(t: pa.Table) -> pa.Table:
        ids = t["node"].filter(pc.not_equal(t["node"], t["label"]))
        return pa.table(
            {
                "doc_id": ids,
                "__dead": pa.array(np.ones(len(ids), dtype=np.int8), pa.int8()),
            }
        )

    dead = labels.map_batches(_dead_rows, batch_format="pyarrow")
    joined = hash_bucket_join(
        ds.select_columns(["doc_id"]), dead, on="doc_id", how="left", buckets=16
    )
    survivors = joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__dead"])).select(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()  # consumed twice: count + fingerprint join
    n_docs = ds.count()
    n_surv = survivors.count()
    n_dead = dead.count()
    fps = ds.map_batches(
        lambda t: T.fingerprint(t).select(["doc_id", "fingerprint"]),
        batch_format="pyarrow",
    )
    n_fp_groups = partial_agg_groupby(
        fps, ["fingerprint"], [], count_as="c"
    ).count()
    surv_fp = hash_bucket_join(survivors, fps, on="doc_id", buckets=16)
    max_surv_per_fp = partial_agg_groupby(
        surv_fp, ["fingerprint"], [], count_as="c"
    ).max("c")
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "n_fp_groups": pa.array([n_fp_groups], pa.int64()),
            "partition_ok": pa.array([n_surv + n_dead == n_docs], pa.bool_()),
            "exact_dups_collapsed_ok": pa.array(
                [int(max_surv_per_fp) == 1], pa.bool_()
            ),
            "survivors_le_groups_ok": pa.array(
                [n_surv <= n_fp_groups], pa.bool_()
            ),
        }
    )


def events_value_trend(sf_dir: str):
    """Per-type value trend: exact OLS slope/intercept of value-cents
    against event day (days since 1995-01-01) —
    :func:`parsel_ray.functions.agg.grouped_ols`.  Integer sufficient
    statistics make the doubles the oracle's identical IEEE expression
    (the oracle spells the closed form over exact BIGINT sums rather
    than using regr_slope, whose float accumulation order differs)."""
    from ..functions.agg import grouped_ols

    anchor = np.datetime64("1995-01-01")

    def prep(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False)
        days = ((ts - anchor) / np.timedelta64(1, "D")).astype(np.int64)
        return pa.table(
            {
                "event_type": t["event_type"],
                "day": pa.array(days),
                "cents": pa.array(_cents(t["value"])),
            }
        )

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return grouped_ols(ds, ["event_type"], "day", "cents")


TREND_SQL = f"""
WITH s AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1995-01-01', ts) AS BIGINT) AS day,
         {_CENTS_SQL.format(expr='value')} AS cents
  FROM events
),
a AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(day) AS BIGINT) AS sx,
         CAST(SUM(cents) AS BIGINT) AS sy,
         CAST(SUM(day * cents) AS BIGINT) AS sxy,
         CAST(SUM(day * day) AS BIGINT) AS sxx
  FROM s GROUP BY event_type
)
SELECT event_type,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
       (CAST(sy AS DOUBLE)
        - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
          * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       n
FROM a
"""


def doc_quality_auc(sf_dir: str):
    """EXACT distributed ROC-AUC (tie-corrected Mann-Whitney,
    :func:`parsel_ray.functions.ml.binary_auc`) of the stop-ratio score
    against the same noisy label as ``doc_quality_logreg``.  Rank sums
    accumulate in INTEGER space (2·avgrank), so the AUC double is the
    identical IEEE expression in the DuckDB window-function oracle."""
    from ..functions.ml import binary_auc
    from ..functions.text import token_stats

    def score_label(t: pa.Table) -> pa.Table:
        t = token_stats(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        sr = t["stop_ratio"].to_numpy(zero_copy_only=False)
        base = sr > 0.05
        flip = (ids % 9) == 0
        return pa.table(
            {
                "score": pa.array(sr, pa.float64()),
                "y": pa.array(
                    np.where(flip, ~base, base).astype(np.int64)
                ),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        score_label, batch_format="pyarrow"
    )
    return binary_auc(ds, "score", "y")


AUC_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
              '\b(?:the|a|and|of|to|in|is|it)\b')) AS BIGINT) AS ns,
         GREATEST(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT), 1)
             AS nt
  FROM documents
),
sc AS (
  SELECT CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE) AS score,
         CASE WHEN ((CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE) > 0.05)
                    <> (doc_id % 9 = 0)) THEN 1 ELSE 0 END AS y
  FROM s
),
v AS (
  SELECT score, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(y) AS BIGINT) AS pos
  FROM sc GROUP BY score
),
o AS (
  SELECT score, n, pos,
         COALESCE(SUM(n) OVER (ORDER BY score
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS cum_less
  FROM v
)
SELECT (SUM(pos * (2 * cum_less + n + 1)) - SUM(pos) * (SUM(pos) + 1))
           / (2.0 * SUM(pos) * (SUM(n) - SUM(pos))) AS auc,
       CAST(SUM(pos) AS BIGINT) AS n_pos,
       CAST(SUM(n) - SUM(pos) AS BIGINT) AS n_neg
FROM o
"""


def doc_sparse_cosine_top1(sf_dir: str):
    """Most-similar doc per doc under sparse TF cosine via the inverted
    index (:func:`parsel_ray.functions.similarity.sparse_cosine_top1`;
    the pair-enumeration df cut is RELATIVE — 10%% of the corpus row
    count, mirrored in SQL — so the kept-term set survives scale
    changes).  Integer dots/norms make the cosine the same IEEE
    expression on both sides — hash-identical floats."""
    from ..functions.similarity import sparse_cosine_top1

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return sparse_cosine_top1(ds, max_df_frac=0.1, num_partitions=16)


SPARSE_COS_SQL = """
WITH tf AS (
  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{2,}')) AS tok
        FROM documents)
  GROUP BY doc_id, tok
),
kept AS (
  SELECT term FROM tf GROUP BY term
  HAVING COUNT(*) > 1
     AND COUNT(*) <= GREATEST(
           2, CAST(floor(0.1 * (SELECT COUNT(*) FROM documents))
                   AS BIGINT))
),
w AS (SELECT tf.* FROM tf JOIN kept USING (term)),
norm AS (SELECT doc_id, SUM(tf * tf) AS norm_sq FROM w GROUP BY doc_id),
dots AS (
  SELECT w1.doc_id AS a, w2.doc_id AS b, SUM(w1.tf * w2.tf) AS dot
  FROM w w1 JOIN w w2 USING (term)
  WHERE w1.doc_id < w2.doc_id
  GROUP BY w1.doc_id, w2.doc_id
),
cos AS (
  SELECT a, b,
         dot / (sqrt(CAST(n1.norm_sq AS DOUBLE))
                * sqrt(CAST(n2.norm_sq AS DOUBLE))) AS cosine
  FROM dots
  JOIN norm n1 ON n1.doc_id = dots.a
  JOIN norm n2 ON n2.doc_id = dots.b
),
sym AS (
  SELECT a AS doc_id, b AS best_doc, cosine FROM cos
  UNION ALL
  SELECT b, a, cosine FROM cos
)
SELECT doc_id, best_doc, cosine FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY cosine DESC, best_doc ASC) AS rn
  FROM sym
) WHERE rn = 1
"""


def doc_quality_logreg(sf_dir: str):
    """Distributed logistic-regression TRAINING (Newton/IRLS over
    sufficient statistics, :mod:`parsel_ray.functions.ml`): token-stat
    features over documents, a noisy synthetic label (stop-ratio signal
    with doc_id-keyed flips so the classes aren't separable), 8 Newton
    rounds where each round is one map emitting per-block (gradient,
    Hessian, NLL) partials.  In-kernel certification: NLL monotone
    non-increasing; the in-query assert pins convergence (grad norm).
    Rows-only gate; distributed==single-process equality is pinned in
    tests/test_ray_stages.py::TestLogreg."""
    from ..functions.ml import logreg_train
    from ..functions.text import token_stats

    def feats(t: pa.Table) -> pa.Table:
        t = token_stats(t)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        base = pc.greater(t["stop_ratio"], 0.05).to_numpy(
            zero_copy_only=False
        )
        flip = (ids % 9) == 0
        y = np.where(flip, ~base, base).astype(np.int64)
        ntok = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "len_term": pa.array(np.minimum(ntok, 64) / 64.0),
                "stop_ratio": t["stop_ratio"],
                "avg_token_len": t["avg_token_len"],
                "y": pa.array(y, pa.int64()),
            }
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        feats, batch_format="pyarrow"
    ).materialize()  # consumed twice: training rounds + accuracy pass
    w, diag = logreg_train(
        ds, ["len_term", "stop_ratio", "avg_token_len"], "y", iters=8
    )
    converged_ok = bool(diag["grad_norm"] < 1e-6)
    # DRIVER-VERIFIED: training-set accuracy of the fitted model vs the
    # noisy label, computed DISTRIBUTED (per-block correct/total partials;
    # the driver gathers O(blocks) scalars).  The label flips ~11 % of
    # rows (doc_id % 9), and the base label is a threshold on a feature,
    # so a correctly-fitted model must clear 0.75 by a wide margin while
    # a broken train loop (bad partials, wrong Newton algebra) cannot.
    wv = [float(x) for x in w]

    def acc_part(t: pa.Table) -> pa.Table:
        z = (
            wv[0]
            + wv[1] * t["len_term"].to_numpy(zero_copy_only=False)
            + wv[2] * t["stop_ratio"].to_numpy(zero_copy_only=False)
            + wv[3] * t["avg_token_len"].to_numpy(zero_copy_only=False)
        )
        y = t["y"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "correct": pa.array([int(((z > 0) == (y == 1)).sum())]),
                "n": pa.array([len(t)]),
            }
        )

    parts = ds.map_batches(acc_part, batch_format="pyarrow").take_all()
    n_docs = int(sum(p["n"] for p in parts))
    acc = sum(p["correct"] for p in parts) / max(n_docs, 1)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], pa.int64()),
            "converged_ok": pa.array([converged_ok], pa.bool_()),
            "acc_ok": pa.array([bool(acc >= 0.75)], pa.bool_()),
        }
    )


def zorder_range_scan(sf_dir: str):
    """Z-order (Morton) clustered layout: events sort by the interleaved
    (user_id, value_cents) key into 16 z-contiguous shards with min/max
    sidecars over BOTH columns, then a 2D range scan prunes shards on
    both predicates at once (asserted in-query) and filters exactly —
    oracle-checked against a plain two-predicate WHERE.  One sort
    clusters both dimensions; correctness never depends on the curve
    (only pruning locality does)."""
    import tempfile as _tempfile

    from ..sources.zorder import zorder_range_read, zorder_write

    out = _tempfile.mkdtemp(prefix="events_z_", dir="/tmp")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "value_cents": pa.array(_cents(t["value"])),
            }
        )

    n = zorder_write(
        _read(sf_dir, "events", ["event_id", "user_id", "value"])
        .map_batches(prep, batch_format="pyarrow"),
        out, col_x="user_id", col_y="value_cents",
        domains=((0, 10000), (0, 50000)), shards=16,
    )
    assert n > 0
    # user_id's domain scales with sf (max 14 at sf0.001, 1499 at
    # sf0.1) — the bbox anchors at the low end so it is non-empty AND
    # prunable at every scale
    ds, stats = zorder_range_read(
        out, "user_id", "value_cents",
        x_range=(0, 5), y_range=(1000, 3000),
    )
    s = stats()
    assert s["shards_read"] < s["shards_total"], s
    return ds


ZORDER_SQL = f"""
SELECT event_id, user_id,
       CAST({_CENTS_SQL.format(expr='value')} AS BIGINT) AS value_cents
FROM events
WHERE user_id BETWEEN 0 AND 5
  AND {_CENTS_SQL.format(expr='value')} BETWEEN 1000 AND 3000
"""


def indexed_point_lookup(sf_dir: str):
    """Bloom-sidecar secondary index: documents stream to an indexed
    parquet sink (per-shard key Bloom + min/max sidecars), then a point
    lookup for doc_id < 20 reads ONLY the shards whose sidecar may match
    (asserted in-query: shards_read < shards_total) and filters exactly.
    Result is oracle-checked against a plain WHERE on the source table —
    Bloom has no false negatives, so pruning never loses a row."""
    import tempfile as _tempfile

    from ..sources.indexed import point_lookup, write_indexed_parquet

    out = _tempfile.mkdtemp(prefix="docs_idx_", dir="/tmp")
    n = write_indexed_parquet(
        _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8),
        out, key_col="doc_id",
    )
    assert n > 0
    ds, stats = point_lookup(out, "doc_id", keys=list(range(20)),
                             columns=["doc_id", "text"])
    s = stats()
    assert s["shards_read"] < s["shards_total"], s

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pc.cast(
                    pc.utf8_length(pc.fill_null(t["text"], "")), pa.int64()
                ),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


POINT_LOOKUP_SQL = """
SELECT doc_id,
       CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars
FROM documents WHERE doc_id < 20
"""


def doc_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer TRAINING (Sennrich 2016's word-count
    formulation) over the documents corpus: corpus collapses once into
    the distinct-word count table (combiner groupby), then each of the
    25 merge rounds is one pair-count shuffle + a map-side rewrite; the
    driver holds only the argmax pair per round.  Deterministic tie-break
    (count DESC, lexicographic (left, right) ASC); the
    distributed==single-process equivalence is pinned in
    tests/test_ray_stages.py::TestBpeTrain.

    DRIVER-VERIFIED: the FIRST merge is SQL-expressible (argmax over
    word-count-weighted adjacent character pairs of the distinct-word
    table — before any merge, symbols ARE characters), so the ORACLE
    recomputes (first_left, first_right, first_n) from the raw corpus;
    ``rounds_ok`` certifies the remaining rounds' structure (contiguous
    ranks, counts ≥ min_pair_count, full 25 rounds)."""
    ds = _read(sf_dir, "documents", ["text"])
    merges = T.bpe_train(ds, num_merges=25)
    ranks = merges["rank"].to_pylist()
    counts = merges["n"].to_pylist()
    rounds_ok = (
        ranks == list(range(len(ranks)))
        and all(c >= 2 for c in counts)
        and len(ranks) == 25
    )
    return pa.table(
        {
            "first_left": merges["left"][:1],
            "first_right": merges["right"][:1],
            "first_n": pa.array([int(counts[0])], pa.int64()),
            "n_merges": pa.array([len(ranks)], pa.int64()),
            "rounds_ok": pa.array([bool(rounds_ok)], pa.bool_()),
        }
    )


def doc_dup_ngram_coverage(sf_dir: str):
    """Per-doc duplicated word-5-gram coverage (the repeated-substring
    signal of Lee et al. 2022 at word-gram granularity): an occurrence is
    duplicated iff its gram text appears more than once in the corpus.
    Fully distributed (:func:`parsel_ray.functions.text.
    ngram_dup_coverage`); the DuckDB oracle rebuilds the same grams with
    regexp_extract_all + lead() windows, so counts and the IEEE ratio
    hash-match exactly."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return T.ngram_dup_coverage(ds, n=5)


DUP_NGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS idx
  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]{2,}') AS arr
        FROM documents)
),
grams AS (
  SELECT doc_id,
         tok || ' ' || lead(tok,1) OVER w || ' ' || lead(tok,2) OVER w
             || ' ' || lead(tok,3) OVER w || ' ' || lead(tok,4) OVER w
             AS gram
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
),
g AS (SELECT doc_id, gram FROM grams WHERE gram IS NOT NULL),
dupg AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(COUNT(d.gram) AS BIGINT) AS n_dup,
       COUNT(d.gram) * 1.0 / COUNT(*) AS dup_ratio
FROM g LEFT JOIN dupg d ON g.gram = d.gram
GROUP BY g.doc_id
"""


def dedup_cdc_docs(sf_dir: str):
    """Content-defined-chunking dedup over deterministic binary payloads:
    each doc's payload = its text bytes + a 700-byte template shared by
    every doc with the same ``doc_id % 5`` — so cross-doc duplication is
    planted at byte level with varying alignment, exactly what CDC's
    boundary-resync property must find.  Fully distributed
    (:func:`parsel_ray.functions.dedup.dedup_cdc`); the chunker itself
    is pinned distributed-vs-single-process in
    tests/test_ray_stages.py::TestCdcDedup.

    DRIVER-VERIFIED: ``total_bytes`` is the CHUNKER'S per-doc sum of
    chunk lengths, and the ORACLE independently recomputes the payload
    size as ``octet_length(encode(text)) + 700`` — so the gate
    hash-checks that chunking exactly covers every byte of every
    payload (no lost/duplicated bytes at boundaries or resync points);
    ``dup_ok`` certifies 0 ≤ dup_bytes ≤ total_bytes per doc."""

    def to_payload(t: pa.Table) -> pa.Table:
        payloads = []
        for i, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            k = i % 5
            tmpl = (((np.arange(700) * (k * 37 + 11)) + k) % 256).astype(
                np.uint8
            ).tobytes()
            payloads.append((tx or "").encode("utf-8") + tmpl)
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_payload, batch_format="pyarrow"
    )
    out = D.dedup_cdc(ds, num_partitions=16)

    def cert(t: pa.Table) -> pa.Table:
        ok = pc.and_(
            pc.greater_equal(t["dup_bytes"], pa.scalar(0, pa.int64())),
            pc.less_equal(t["dup_bytes"], t["total_bytes"]),
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "total_bytes": pc.cast(t["total_bytes"], pa.int64()),
                "dup_ok": ok,
            }
        )

    return out.map_batches(cert, batch_format="pyarrow")


def dedup_ngram_jaccard(sf_dir: str):
    """EXACT word-bigram Jaccard near-dup pairs (threshold 3/5, df cut 50)
    — the exact-set member of the dedup family, fully distributed
    (:func:`parsel_ray.functions.dedup.word_ngram_jaccard_pairs`) and
    oracle-checked: integer cross-multiplied threshold, df cut mirrored in
    SQL, so the pair set is byte-identical."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return D.word_ngram_jaccard_pairs(
        ds, id_col="doc_id", text_col="text", n=2, max_df=50, threshold=(3, 5)
    )


# toks: generate_series cap 2000 ≫ max document token count in the test
# tables (text ≤ ~600 chars); the Ray side tokenizes unbounded.
NGRAM_SQL = r"""
WITH arr AS (
  SELECT doc_id, string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ') AS ws
  FROM documents
),
toks AS (
  SELECT doc_id, ws[ord] AS w, ord
  FROM arr, (SELECT unnest(generate_series(1, 2000)) AS ord)
  WHERE ord <= len(ws) AND ws[ord] <> ''
),
bg AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w AS g
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
),
df AS (SELECT g FROM bg GROUP BY g HAVING COUNT(*) <= 50),
fb AS (SELECT bg.doc_id, bg.g FROM bg JOIN df USING (g)),
cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM fb GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS i
  FROM fb a JOIN fb b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b
FROM inter JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
WHERE 5 * i >= 3 * (ca.n + cb.n - i)
"""


_TEMPLATES = (
    "<html><body><article><h1>{h}</h1><p>{t}</p></article></body></html>",
    "<html><body><div><table><tr><td>{h}</td><td>{t}</td></tr></table>"
    "</div></body></html>",
    "<html><body><section><ul><li><a href='#'>{h}</a></li>"
    "<li><a href='#'>{t}</a></li></ul></section></body></html>",
    "<html><body><div><div><p><b>{h}</b></p><p><b>{t}</b></p></div></div>"
    "</body></html>",
    "<html><body><main><figure><img src='x.png'/>"
    "<figcaption>{h}</figcaption></figure><p>{t}</p></main></body></html>",
    "<html><body><header><nav><a href='#'>{h}</a></nav></header>"
    "<footer>{t}</footer></body></html>",
    "<html><body><pre><code>{h} {t}</code></pre></body></html>",
)


def template_cluster(sf_dir: str):
    """Page-template clustering by DOM STRUCTURE fingerprint — the
    crawl-side op that groups pages rendered from the same template so
    extraction rules / boilerplate strippers can be learned once per
    cluster instead of once per page.  Every doc renders into one of 7
    structurally distinct HTML templates (content varies per doc,
    structure doesn't); the kernel parses each page with the engine's
    own from-scratch DOM/Selector stack, fingerprints the SET of
    root-to-node tag paths (text/attrs excluded, repeat counts
    collapsed — variable-length lists keep one fingerprint), and a
    combiner groupby recovers the clusters.  Oracle: the template is a
    pure function of doc_id, so cluster (min-id, size) must equal the
    modulo grouping."""
    import hashlib as _hashlib

    from ..selector import Selector

    def build_and_fp(t: pa.Table) -> pa.Table:
        fps = []
        for i, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            html_doc = _TEMPLATES[i % 7].format(
                h=_html.escape(f"doc {i}"), t=_html.escape((txt or "")[:80])
            )
            sel = Selector(text=html_doc)
            paths = set()
            for e in sel.xpath("//*"):
                node, parts = e.root, []
                while node is not None and getattr(node, "tag", None):
                    parts.append(node.tag)
                    node = node.getparent()
                paths.add("/".join(reversed(parts)))
            fps.append(
                _hashlib.md5("\n".join(sorted(paths)).encode()).hexdigest()
            )
        return pa.table(
            {"doc_id": t["doc_id"], "fp": pa.array(fps, pa.string())}
        )

    clustered = partial_agg_groupby(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            build_and_fp, batch_format="pyarrow", batch_size=512
        ),
        ["fp"], [("doc_id", "min", "template_rep")], count_as="n_pages",
    )
    return clustered.select_columns(["template_rep", "n_pages"])


TEMPLATE_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS template_rep,
       CAST(COUNT(*) AS BIGINT) AS n_pages
FROM documents GROUP BY doc_id % 7
"""


def decontaminate_docs(sf_dir: str, n: int = 3):
    """Benchmark decontamination (the pre-training hygiene op): docs
    with ``doc_id % 97 == 0`` stand in for a held-out eval set; every
    other doc is flagged if it shares ANY word n-gram with a benchmark
    doc.  Fully distributed EXACT shape — the benchmark stand-in here
    is a fixed FRACTION of the corpus, so its gram set is O(corpus)
    and must never visit the driver: both sides explode to gram rows,
    contaminated doc ids come from one gram-keyed
    ``hash_bucket_join`` (inner), and the per-doc flag from a second
    id-keyed left join against a ``__hit`` marker (the
    ``dedup_minhash`` survivor pattern).  When the benchmark is a real
    fixed-size eval set, the cheaper path is the broadcast
    BloomFilter stage with the same tokenization.  Tokenization
    matches the corpus SQL convention (lower, whitespace-collapse,
    split) byte-for-byte."""
    from ..functions.agg import partial_sum_groupby
    from ..functions.relational import hash_bucket_join

    def grams_of(txt: str) -> set:
        toks = (txt or "").strip().lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    def bench_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out = set()
        for i, txt in zip(ids, t["text"].to_pylist()):
            if i % 97 == 0:
                out |= grams_of(txt)
        return pa.table({"g": pa.array(sorted(out), pa.string())})

    def corpus_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        out_id: list = []
        out_g: list = []
        for i, txt in zip(ids, t["text"].to_pylist()):
            if i % 97 == 0:
                continue  # benchmark docs aren't scored
            for g in grams_of(txt):
                out_id.append(int(i))
                out_g.append(g)
        return pa.table(
            {"doc_id": pa.array(out_id, pa.int64()),
             "g": pa.array(out_g, pa.string())}
        )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # distributed distinct of the benchmark grams (one keyed shuffle)
    bench_grams = partial_sum_groupby(
        docs.map_batches(bench_gram_rows, batch_format="pyarrow"),
        ["g"], {}, count_as="__bn",
    ).select_columns(["g"])
    corpus_grams = docs.map_batches(
        corpus_gram_rows, batch_format="pyarrow", batch_size=1024
    )
    # gram-keyed co-partition: a doc is contaminated iff any of its
    # gram rows meets a benchmark gram row
    bench_marked = bench_grams.map_batches(
        lambda t: t.append_column(
            "__hit", pa.array(np.ones(len(t), np.int8), pa.int8())
        ),
        batch_format="pyarrow",
    )
    hit_rows = hash_bucket_join(
        corpus_grams, bench_marked, on="g", how="inner", buckets=32,
    )
    hit_ids = partial_sum_groupby(
        hit_rows.select_columns(["doc_id"]), ["doc_id"], {}, count_as="__hn"
    ).map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "__hit": pa.array(np.ones(len(t), np.int8), pa.int8())}
        ),
        batch_format="pyarrow",
    )

    def nonbench_ids(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {"doc_id": pa.array(ids[ids % 97 != 0], pa.int64())}
        )

    flagged = hash_bucket_join(
        docs.select_columns(["doc_id"]).map_batches(
            nonbench_ids, batch_format="pyarrow"
        ),
        hit_ids, on="doc_id", how="left", buckets=16,
    )
    return flagged.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"],
             "contaminated": pc.is_valid(t["__hit"])}
        ),
        batch_format="pyarrow",
    )


DECONTAM_SQL = r"""
WITH arr AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents),
toks AS (
  SELECT doc_id, ws[ord] AS w, ord
  FROM arr, (SELECT unnest(generate_series(1, 2000)) AS ord)
  WHERE ord <= len(ws) AND ws[ord] <> ''),
tg AS (
  SELECT DISTINCT a.doc_id, a.w || ' ' || b.w || ' ' || c.w AS g
  FROM toks a
  JOIN toks b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
  JOIN toks c ON a.doc_id = c.doc_id AND c.ord = a.ord + 2),
bench AS (SELECT DISTINCT g FROM tg WHERE doc_id % 97 = 0),
hits AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bench USING (g))
SELECT doc_id, doc_id IN (SELECT doc_id FROM hits) AS contaminated
FROM documents WHERE doc_id % 97 <> 0
"""


def dedup_simhash(sf_dir: str):
    """SimHash fingerprints, DRIVER-VERIFIED: the vectorized
    :class:`~parsel_ray.functions.dedup.SimHasher` kernel (byte-position
    FNV + bit-matrix votes) runs alongside a scalar reference recompute
    (:func:`parsel_ray.pipelines.certs.ref_simhash` — Python-int FNV-1a,
    per-bit vote loop) in the same stage; each row emits ``match`` and
    the ORACLE asserts every row is true.  The exact-fingerprint
    grouping this feeds is the generic combiner groupby pinned by the
    other dedup gate queries."""
    from .certs import match_column, ref_simhash

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        D.SimHasher(col="text"),
        batch_format="pyarrow", batch_size=2048,
    ).map_batches(
        lambda t: match_column(t, "simhash", ref_simhash),
        batch_format="pyarrow",
    )


def langid_guess(sf_dir: str):
    """Trigram-profile language ID, DRIVER-VERIFIED: the packed-uint64
    searchsorted/bincount kernel (:class:`parsel_ray.functions.text.LangId`)
    vs a scalar Counter-based reference recompute
    (:func:`parsel_ray.pipelines.certs.ref_lang_guess`) per row; the
    ORACLE asserts every row's ``match`` is true."""
    from .certs import match_column, ref_lang_guess

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        T.LangId(col="text"),
        batch_format="pyarrow", batch_size=2048,
    ).map_batches(
        lambda t: match_column(t, "lang_guess", ref_lang_guess),
        batch_format="pyarrow",
    )


def doc_rolling_fingerprint(sf_dir: str):
    """Rolling-hash document fingerprint, DRIVER-VERIFIED: the
    vectorized position-weighted-sum kernel
    (:func:`parsel_ray.functions.text.rolling_fingerprint`) vs the
    scalar ROLLING-update recurrence
    (:func:`parsel_ray.pipelines.certs.ref_rolling_fingerprint`) — two
    different algebraic paths to the same min-window hash; the ORACLE
    asserts every row's ``match`` is true."""
    from .certs import match_column, ref_rolling_fingerprint

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: T.rolling_fingerprint(t), batch_format="pyarrow",
    ).map_batches(
        lambda t: match_column(t, "rhash", ref_rolling_fingerprint),
        batch_format="pyarrow",
    )


def embedding_near_dup_lsh(sf_dir: str):
    """LSH-bucketed near-dup pairs — the 100 TB path — DRIVER-CERTIFIED
    against the exact kernel: ``n_true`` is the EXACT cosine-threshold
    pair count (:func:`exact_near_dup_pairs`, the oracle-pass
    ``embedding_near_dup`` kernel, so DuckDB recomputes it
    independently); ``subset_ok`` pins that every LSH pair carries exact
    cosine ≥ threshold (precision 1.0 — pairs are verified in-bucket);
    ``recall_ok`` thresholds the measured recall of the single-table
    6-bit hyperplane LSH (loose floor — one hash table's recall at
    cos ≥ 0.4 is structurally partial; tests pin the exact value)."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    found = embedding_near_dup_pairs(
        ds, dim=64, threshold=0.4, bits=6
    ).materialize()  # consumed twice: count + min-cosine
    n_found = found.count()
    min_cos = found.min("cosine") if n_found else 1.0
    exact = exact_near_dup_pairs(ds, threshold=0.4)
    n_true = exact.num_rows
    recall = (n_found / n_true) if n_true else 1.0
    return pa.table(
        {
            "n_true": pa.array([n_true], pa.int64()),
            "subset_ok": pa.array([bool(min_cos >= 0.4)], pa.bool_()),
            "recall_ok": pa.array([bool(recall >= 0.05)], pa.bool_()),
        }
    )


def doc_quality(sf_dir: str):
    """Quality scoring for pretraining filtering, DRIVER-VERIFIED: the
    Arrow-RE2 vectorized kernel (:func:`parsel_ray.functions.text.
    quality_score`) vs a scalar reference recompute with explicit RE2
    character classes (:func:`parsel_ray.pipelines.certs.ref_quality`);
    floats are the identical IEEE expression, so ``match`` is exact
    equality and the ORACLE asserts every row."""
    from .certs import match_column, ref_quality

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        T.quality_score, batch_format="pyarrow",
    ).map_batches(
        lambda t: match_column(t, "quality", ref_quality),
        batch_format="pyarrow",
    )


def doc_compression_ratio(sf_dir: str):
    """zlib compression-ratio quality signal, DRIVER-VERIFIED: the batch
    kernel vs a per-row reference recompute
    (:func:`parsel_ray.pipelines.certs.ref_compression_ratio`; zlib at a
    fixed level is byte-stable, so the double matches exactly); the
    ORACLE asserts every row's ``match`` is true."""
    from .certs import match_column, ref_compression_ratio

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        T.compression_ratio, batch_format="pyarrow",
    ).map_batches(
        lambda t: match_column(t, "zlib_ratio", ref_compression_ratio),
        batch_format="pyarrow",
    )


# -- driver-visible certification oracles ----------------------------------
# The per-row kernel-vs-reference-recompute queries above emit
# (doc_id, match); the oracle asserts every row matched.  The structural
# certs (ANN recall, LSH recall, sketch rank error, funnel counts) emit
# their SQL-computable anchors verbatim plus threshold booleans.

MATCH_DOCS_SQL = "SELECT doc_id, true AS match FROM documents"

QSKETCH_SQL = f"""
WITH c AS (SELECT {_CENTS_SQL.format(expr='l_extendedprice')} AS v FROM lineitem)
SELECT 0.25 AS q, quantile_disc(v, 0.25) AS value_cents_exact, true AS rank_ok FROM c
UNION ALL SELECT 0.5, quantile_disc(v, 0.5), true FROM c
UNION ALL SELECT 0.75, quantile_disc(v, 0.75), true FROM c
UNION ALL SELECT 0.99, quantile_disc(v, 0.99), true FROM c
"""

# First BPE merge from the raw corpus: before any merge the symbol
# sequence IS the character sequence, so the round-1 argmax pair is the
# word-count-weighted adjacent character-pair argmax (count DESC, then
# (left, right) ASC — bpe_train's deterministic tie-break).
BPE_CERT_SQL = r"""
WITH w AS (
  SELECT tok AS term, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_extract_all(COALESCE(text, ''), '[a-z]+')) AS tok
    FROM documents)
  WHERE length(tok) >= 2 GROUP BY tok
),
p AS (
  SELECT substring(term, i, 1) AS l, substring(term, i + 1, 1) AS r,
         SUM(cnt) AS n
  FROM w, (SELECT unnest(generate_series(1, 64)) AS i)
  WHERE i <= length(term) - 1
  GROUP BY 1, 2
)
SELECT l AS first_left, r AS first_right, CAST(n AS BIGINT) AS first_n,
       CAST(25 AS BIGINT) AS n_merges, true AS rounds_ok
FROM p ORDER BY n DESC, l, r LIMIT 1
"""

LOGREG_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       true AS converged_ok, true AS acc_ok
"""

MINHASH_CERT_SQL = r"""
SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
       CAST((SELECT count(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))))
             FROM documents) AS BIGINT) AS n_fp_groups,
       true AS partition_ok,
       true AS exact_dups_collapsed_ok,
       true AS survivors_le_groups_ok
"""

CDC_CERT_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(COALESCE(text, ''))) + 700 AS BIGINT) AS total_bytes,
       true AS dup_ok
FROM documents
"""

IVF_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 10) AS BIGINT) AS n_queries,
       true AS mean_recall_ok
"""

IVF_PRUNED_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 10) AS BIGINT) AS n_queries,
       true AS pinned_ok, true AS scan_ok
"""

# The demo crawl is a byte-match determinism contract over a FIXED
# synthetic web (no sf dependence): corpus size and the md5 of the full
# canonical row serialization are literals — any nondeterminism or
# regression in frontier/fetch/extract/encode flips the md5 and trips
# the driver gate.  Row-level equality vs the single-process oracle
# crawler stays pinned in tests/test_crawl.py.
CRAWL_DEMO_SQL = """
SELECT CAST(71 AS BIGINT) AS n_images,
       'd1e24d503e5a78057f6b87241beb8820' AS rows_md5
"""

CRAWL_POPS_SQL = """
SELECT CAST(42 AS BIGINT) AS n_pops,
       'af173f6bec10891301e5c03066d842c1' AS rows_md5
"""

CRAWL_VERIFY_SQL = """
SELECT CAST(71 AS BIGINT) AS n_images,
       true AS pixels_all_ok, true AS captions_all_ok, true AS phash_all_ok
"""

DECODE_STATS_SQL = """
SELECT CAST(71 AS BIGINT) AS n_images,
       true AS decode_all_ok, true AS phash_match_all_ok,
       '4bd7c3229a246de8d8c6904c83466a66' AS dims_md5
"""

PHASH_PAIRS_SQL = """
SELECT * FROM (VALUES
  ('img-0-5-1', 'img-0-9-1', CAST(6 AS BIGINT))
) AS t(id_a, id_b, hamming)
"""

RESIZE_SQL = """
SELECT CAST(71 AS BIGINT) AS n_images,
       '1345433a73d93ada529b375972663388' AS rows_md5
"""

AUGMENT_SQL = """
SELECT CAST(71 AS BIGINT) AS n_images, true AS aug_all_ok,
       '930cd64a73fae89779f414f426abc37a' AS rows_md5
"""

# deterministic synthetic-web indexes/funnels (sf-independent, same
# determinism contract as CRAWL_DEMO_SQL)
ANCHOR_SQL = """
SELECT * FROM (VALUES
  ('http://host-1.test/page/7', CAST(7 AS BIGINT), CAST(5 AS BIGINT)),
  ('http://host-0.test/page/5', 6, 5),
  ('http://host-1.test/page/1', 6, 5),
  ('http://host-2.test/page/4', 6, 5),
  ('http://host-0.test/page/1', 5, 4),
  ('http://host-0.test/page/15', 5, 4),
  ('http://host-0.test/page/4', 5, 4),
  ('http://host-1.test/page/0', 5, 4),
  ('http://host-1.test/page/5', 5, 4),
  ('http://host-1.test/page/9', 5, 4),
  ('http://host-0.test/page/13', 4, 3),
  ('http://host-0.test/page/16', 4, 3),
  ('http://host-1.test/page/3', 4, 4),
  ('http://host-1.test/page/6', 4, 3),
  ('http://host-2.test/page/0', 4, 2),
  ('http://host-2.test/page/3', 4, 4),
  ('http://host-2.test/page/7', 4, 5),
  ('http://host-3.test/page/1', 4, 3),
  ('http://host-3.test/page/5', 4, 4),
  ('http://host-4.test/page/0', 4, 4)
) AS t(dst, n_inlinks, n_anchors)
"""

IMG_PREP_SQL = """
SELECT * FROM (VALUES
  ('crawled', CAST(71 AS BIGINT)),
  ('exact_distinct', 71),
  ('near_dup_survivors', 70),
  ('published', 70)
) AS t(stage, n)
"""

BATCH_PREP_SQL = """
SELECT * FROM (VALUES
  ('crawled', CAST(71 AS BIGINT)),
  ('packed', 71),
  ('tar_samples', 71),
  ('tar_shards', 4)
) AS t(stage, rows)
"""

SEMDEDUP_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vecs,
       true AS survivors_ok, true AS cells_ok
"""

PPL_CERT_SQL = "SELECT doc_id, true AS ppl_ok FROM documents"

EWMA_CERT_SQL = """
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, true AS match
FROM events GROUP BY user_id
"""

AUDIO_RMS_SQL = """
WITH s AS (
  SELECT doc_id,
         (octet_length(encode(COALESCE(text, ''))) * 8) // 2 AS samples
  FROM documents)
SELECT doc_id,
       CAST(CASE WHEN samples = 0 THEN 0
                 WHEN samples < 256 THEN 1
                 ELSE samples // 256 END AS BIGINT) AS n_frames
FROM s
"""

AUDIO_SPECTRAL_SQL = "SELECT doc_id, true AS match FROM documents"

HLL_CERT_SQL = """
SELECT CAST((SELECT count(DISTINCT user_id) FROM events) AS BIGINT)
         AS n_distinct_exact,
       true AS within_3sigma
"""

PQ_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM embeddings WHERE vec_id < 10) AS BIGINT)
         AS n_queries,
       true AS recall_ok
"""

KMEANS_CERT_SQL = """
SELECT CAST(8 AS BIGINT) AS n_clusters,
       CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_vecs,
       true AS inertia_monotone_ok, true AS all_nonempty_ok
"""

PCA_CERT_SQL = """
SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_rows,
       true AS sorted_ok, true AS orthonormal_ok
"""

# web_pagerank runs over the FIXED deterministic synthetic web (no
# dependence on sf_dir); ranks are integer fixed-point and the whole
# top-20 is a determinism contract — the oracle pins it verbatim, so a
# regression anywhere in fetch → link-extract → canonicalize → edge
# dedup → power iteration trips the driver gate.
PAGERANK_SQL = """
SELECT * FROM (VALUES
  ('http://host-1.test/page/7', CAST(51537207 AS BIGINT)),
  ('http://host-3.test/page/1', 46988047),
  ('http://host-5.test/page/0', 39036846),
  ('http://host-5.test/page/1', 34929892),
  ('http://host-3.test/page/3', 33521300),
  ('http://host-5.test/page/3', 32435021),
  ('http://host-1.test/page/3', 28455631),
  ('http://host-1.test/page/5', 27970844),
  ('http://host-1.test/page/1', 26315957),
  ('http://host-3.test/page/5', 25944849),
  ('http://host-1.test/page/9', 25898742),
  ('http://host-2.test/page/4', 24730165),
  ('http://host-1.test/page/6', 23932637),
  ('http://host-1.test/page/0', 22446660),
  ('http://host-2.test/page/2', 21279198),
  ('http://host-2.test/page/1', 20769707),
  ('http://host-4.test/page/1', 19887305),
  ('http://host-2.test/page/0', 18167573),
  ('http://host-4.test/page/0', 17533057),
  ('http://host-2.test/page/3', 17410770)
) AS t(node, rank_e9)
"""

LSH_CERT_SQL = """
SELECT CAST((SELECT count(*)
             FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) >= 0.4)
            AS BIGINT) AS n_true,
       true AS subset_ok, true AS recall_ok
"""

# llm_data_prep: the crawl stages run the fixed demo synthetic web (no
# dependence on sf_dir), whose output is a byte-match determinism
# contract (tests/test_crawl.py) — their counts are literals here; a
# crawl regression therefore trips THIS oracle too.  quality expression
# = the exact IEEE formula of functions/text.py:quality_score over the
# RE2 token stats (the oracle-pass doc_token_stats family).
LLM_PREP_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '\b(?:the|a|and|of|to|in|is|it)\b')) AS BIGINT) AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id, text, n_tokens,
         least(CAST(n_tokens AS DOUBLE), 64.0) / 64.0 * 0.5
         + least(CAST(n_stop AS DOUBLE)
                 / CAST(greatest(n_tokens, 1) AS DOUBLE) * 4.0, 1.0) * 0.5
           AS quality
  FROM t
),
f AS (SELECT * FROM q WHERE quality >= 0.35 AND n_tokens >= 5)
SELECT 'raw_docs' AS stage, CAST((SELECT count(*) FROM documents) AS BIGINT) AS n
UNION ALL SELECT 'quality_filtered', (SELECT count(*) FROM f)
UNION ALL SELECT 'exact_distinct',
  (SELECT count(DISTINCT md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))) FROM f)
UNION ALL SELECT 'crawled_images', 71
UNION ALL SELECT 'image_near_dup_pairs', 1
UNION ALL SELECT 'pipeline_ok', 1
"""


# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Crawl + multimodal (rows-only: iterative/stateful, not SQL-expressible)
# ---------------------------------------------------------------------------


def _demo_crawl_cfg():
    from ..crawl.oracle import CrawlConfig
    from ..crawl.pagestore import StoreConfig

    return CrawlConfig(
        store=StoreConfig(n_hosts=6, pages_per_host=24),
        n_seeds=6,
        max_depth=4,
        max_epochs=48,
        shards=4,
    )


def crawl_demo(sf_dir: str):
    """Full crawl pipeline on the deterministic synthetic web (frontier
    actors + fetch/extract tasks); returns the harvested image-corpus rows
    (metadata view).  Byte-matches the single-process oracle — see
    tests/test_crawl.py."""
    from ..crawl.frontier import run_crawl

    res = run_crawl(_demo_crawl_cfg())
    rows = sorted(res.image_rows, key=lambda r: r["image_id"])
    # DRIVER-VERIFIED (round 5): the demo crawl is a byte-match
    # determinism contract over a fixed synthetic web, so the WHOLE
    # harvested corpus (ids, dims, formats, captions, phashes) folds
    # into one md5 the ORACLE pins as a literal — any nondeterminism or
    # regression anywhere in frontier/fetch/extract/encode trips the
    # gate.  The full row-level artifact stays pinned in
    # tests/test_crawl.py (distributed == oracle crawler, byte-exact).
    canon = "\n".join(
        f'{r["image_id"]}|{r["w"]}|{r["h"]}|{r["fmt"]}|{r["caption"]}|'
        f'{r["phash"]}' for r in rows
    )
    return pa.table(
        {
            "n_images": pa.array([len(rows)], pa.int64()),
            "rows_md5": pa.array(
                [hashlib.md5(canon.encode()).hexdigest()], pa.string()
            ),
        }
    )


def crawl_pop_order(sf_dir: str):
    """The deterministic pop-order artifact, DRIVER-VERIFIED the same
    way as :func:`crawl_demo`: (epoch, pop_ord, url) rows fold into a
    literal-pinned md5 — the pop ORDER itself is the contract, so the
    canonical string serializes rows in pop sequence."""
    from ..crawl.frontier import run_crawl

    res = run_crawl(_demo_crawl_cfg(), collect_images=False)
    canon = "\n".join(f"{e}|{o}|{u}" for e, o, u in res.pop_order)
    return pa.table(
        {
            "n_pops": pa.array([len(res.pop_order)], pa.int64()),
            "rows_md5": pa.array(
                [hashlib.md5(canon.encode()).hexdigest()], pa.string()
            ),
        }
    )


def crawl_image_verify(sf_dir: str):
    """Per-row image verification (N8): decoded-pixel allclose / PSNR >= 40
    for lossy + caption equality + phash recomputation, as a map_batches
    kernel over the crawled corpus."""
    from ..crawl.frontier import IMAGE_SCHEMA, run_crawl
    from ..crawl.verify import VerifyImages

    cfg = _demo_crawl_cfg()
    res = run_crawl(cfg)
    t = pa.Table.from_pylist(res.image_rows, schema=IMAGE_SCHEMA)
    ds = rd.from_arrow(t).map_batches(
        VerifyImages(cfg.store), batch_format="pyarrow", batch_size=64
    ).select_columns(
        ["image_id", "fmt", "ok_pixels", "ok_caption", "ok_phash"]
    )
    # DRIVER-VERIFIED (round 5): every per-row verification flag must
    # be true and the corpus size is a determinism-contract literal.
    v = pa.concat_tables(ds.iter_batches(batch_size=None,
                                         batch_format="pyarrow"))
    return pa.table(
        {
            "n_images": pa.array([len(v)], pa.int64()),
            "pixels_all_ok": pa.array([bool(pc.all(v["ok_pixels"]).as_py())]),
            "captions_all_ok": pa.array(
                [bool(pc.all(v["ok_caption"]).as_py())]
            ),
            "phash_all_ok": pa.array([bool(pc.all(v["ok_phash"]).as_py())]),
        }
    )


def image_decode_stats(sf_dir: str):
    """Multimodal decode stage: binary image cells → decoded dims, mean
    color, recomputed phash (vector column dropped for the artifact)."""
    from ..crawl.frontier import IMAGE_SCHEMA, run_crawl
    from ..stages.multimodal import DecodeImageStats

    res = run_crawl(_demo_crawl_cfg())
    t = pa.Table.from_pylist(res.image_rows, schema=IMAGE_SCHEMA)
    ds = rd.from_arrow(t).map_batches(
        DecodeImageStats(), batch_format="pyarrow", batch_size=64
    ).select_columns(
        ["image_id", "decoded_w", "decoded_h", "phash_recomputed",
         "decode_ok"]
    )
    # DRIVER-VERIFIED (round 5): every blob decodes, every recomputed
    # phash equals the phash the crawl stored (an end-to-end
    # encode→store→decode→rehash loop closure), dims fold into the
    # determinism-contract md5.
    d = pa.concat_tables(
        ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ).sort_by("image_id")
    # lossless formats must rehash EXACTLY; lossy (qjpg) decoded pixels
    # legitimately drift the perceptual hash by a few bits (measured
    # max 2 on this corpus) — bound it at 4
    stored = {r["image_id"]: (r["phash"], r["fmt"]) for r in res.image_rows}
    phash_ok = True
    for i, p in zip(d["image_id"].to_pylist(),
                    d["phash_recomputed"].to_pylist()):
        sp, fmt = stored[i]
        ham = bin((sp ^ p) & ((1 << 64) - 1)).count("1")
        if ham > (4 if fmt == "qjpg" else 0):
            phash_ok = False
    canon = "\n".join(
        f"{i}|{w}|{h}" for i, w, h in zip(
            d["image_id"].to_pylist(), d["decoded_w"].to_pylist(),
            d["decoded_h"].to_pylist()
        )
    )
    return pa.table(
        {
            "n_images": pa.array([len(d)], pa.int64()),
            "decode_all_ok": pa.array([bool(pc.all(d["decode_ok"]).as_py())]),
            "phash_match_all_ok": pa.array([bool(phash_ok)]),
            "dims_md5": pa.array(
                [hashlib.md5(canon.encode()).hexdigest()], pa.string()
            ),
        }
    )


def image_resize(sf_dir: str):
    """Multimodal resize stage: every corpus image re-encoded at 16x16."""
    from ..crawl.frontier import IMAGE_SCHEMA, run_crawl
    from ..stages.multimodal import ResizeImage

    res = run_crawl(_demo_crawl_cfg())
    t = pa.Table.from_pylist(res.image_rows, schema=IMAGE_SCHEMA)
    ds = rd.from_arrow(t).map_batches(
        ResizeImage(16, 16), batch_format="pyarrow", batch_size=64
    )

    def sizes(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        return pa.table(
            {
                "image_id": b["image_id"],
                "w": b["w"],
                "h": b["h"],
                "n_bytes": pc_.cast(pc_.binary_length(b["bytes"]), pa.int64()),
            }
        )

    # DRIVER-VERIFIED (round 5): determinism-contract md5 over (id, w,
    # h, n_bytes) — the resized dims AND the re-encoded byte lengths
    # must reproduce exactly (same contract as crawl_demo).
    out = pa.concat_tables(
        ds.map_batches(sizes, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ).sort_by("image_id")
    canon = "\n".join(
        f"{i}|{w}|{h}|{nb}" for i, w, h, nb in zip(
            out["image_id"].to_pylist(), out["w"].to_pylist(),
            out["h"].to_pylist(), out["n_bytes"].to_pylist()
        )
    )
    return pa.table(
        {
            "n_images": pa.array([len(out)], pa.int64()),
            "rows_md5": pa.array(
                [hashlib.md5(canon.encode()).hexdigest()], pa.string()
            ),
        }
    )


def image_resize_bilinear(sf_dir: str):
    """Bilinear resample stage (half-pixel-center convention) over
    lossless BMP payloads: per-doc gradients → ResizeImage(12, 9,
    method="bilinear") → exact-equality check against the kernel applied
    directly to the source array (BMP is lossless so the stage's
    decode→resize→encode round-trip must reproduce it bit-for-bit)."""
    from ..images.codecs import decode_image, encode_image, resize_bilinear
    from ..stages.multimodal import ResizeImage

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(["bmp"] * len(ids)),
                "w": pa.array([0] * len(ids), pa.int32()),
                "h": pa.array([0] * len(ids), pa.int32()),
                "bytes": pa.array(
                    [encode_image(_doc_image(i), "bmp") for i in ids],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        for i, data in zip(t["doc_id"].to_pylist(),
                           t["bytes"].to_pylist()):
            want = resize_bilinear(_doc_image(i), 12, 9)
            assert np.array_equal(decode_image(data, "bmp"), want), (
                f"doc {i} bilinear resize mismatch"
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "w": t["w"],
                "h": t["h"],
                "resize_ok": pa.array([True] * len(t)),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(ResizeImage(12, 9, method="bilinear"),
                     batch_format="pyarrow", batch_size=256)
        .map_batches(check, batch_format="pyarrow")
    )


RESIZE_BILINEAR_SQL = """
SELECT doc_id, CAST(9 AS INTEGER) AS w, CAST(12 AS INTEGER) AS h,
       TRUE AS resize_ok
FROM documents
"""


def audio_frame_rms(sf_dir: str):
    """Audio-feature stage plumbing over deterministic fake PCM payloads
    (built from document text bytes — the codec itself is the stubbed
    part, the Ray-side batch contract is real)."""
    from ..stages.multimodal import AudioFeatures

    def to_pcm(t: pa.Table) -> pa.Table:
        payloads = [
            (tx or "").encode("utf-8") * 8 for tx in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_pcm, batch_format="pyarrow"
    ).map_batches(AudioFeatures(frame=256), batch_format="pyarrow")

    def agg(t: pa.Table) -> pa.Table:
        n = [len(f) if f is not None else 0 for f in t["frame_rms"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "n_frames": pa.array(n, pa.int64())}
        )

    return ds.map_batches(agg, batch_format="pyarrow")


def audio_silence_segments(sf_dir: str):
    """VAD segmentation (``SilenceSegments``) over REAL RIFF/WAVE PCM16
    cells built on-worker: each doc's audio alternates 3 + doc_id%4
    runs of silence/±8000-square-wave voice (parity keyed by doc_id),
    two 256-sample frames per run — the detector must recover the
    voiced-run count and silent-frame count exactly from samples.
    Oracle: closed-form parity counting."""
    from ..stages.multimodal import SilenceSegments, encode_wav_pcm16

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = []
        for i in ids:
            runs = []
            for r in range(3 + i % 4):
                if (i + r) % 2 == 0:  # silence run
                    runs.append(np.zeros(512, np.int16))
                else:  # voice: square wave well above threshold
                    v = np.full(512, 8000, np.int16)
                    v[1::2] = -8000
                    runs.append(v)
            blobs.append(encode_wav_pcm16(np.concatenate(runs)))
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(blobs, pa.binary())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=512)
        .map_batches(SilenceSegments(frame=256), batch_format="pyarrow",
                     batch_size=512)
        .map_batches(
            lambda t: t.select(
                ["doc_id", "n_frames", "n_silent_frames",
                 "n_voice_segments", "audio_ok"]
            ),
            batch_format="pyarrow",
        )
    )


VAD_SQL = """
WITH b AS (
  SELECT doc_id, 3 + doc_id % 4 AS nr,
         CASE WHEN doc_id % 2 = 0 THEN (3 + doc_id % 4) // 2
              ELSE (4 + doc_id % 4) // 2 END AS voiced_runs
  FROM documents)
SELECT doc_id,
       CAST(2 * nr AS BIGINT) AS n_frames,
       CAST(2 * (nr - voiced_runs) AS BIGINT) AS n_silent_frames,
       CAST(voiced_runs AS BIGINT) AS n_voice_segments,
       TRUE AS audio_ok
FROM b
"""


_PALETTE = (
    ("red", (200, 30, 30)), ("green", (30, 200, 30)),
    ("blue", (30, 30, 200)), ("yellow", (200, 200, 30)),
    ("purple", (200, 30, 200)), ("cyan", (30, 200, 200)),
)


def caption_alignment(sf_dir: str):
    """Caption–image ALIGNMENT gate over (image, caption) pairs — the
    north-rule payload: each doc's image is a noisy solid in one of six
    palette colors and its caption names a color word, WRONG for every
    4th doc.  The kernel classifies the decoded image's mean RGB to the
    nearest palette color, extracts the caption's color word with one
    compiled regex, and flags the pair aligned iff they agree — the
    deterministic stand-in for a CLIP-score filter, with the Ray-side
    plumbing (joint text+binary batch, actor-pool-able kernel, boolean
    gate column) fully real.  Oracle: alignment is a pure function of
    doc_id."""
    import re as _re

    from ..images.codecs import decode_image, encode_image

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs, caps = [], []
        for i in ids:
            name, rgb = _PALETTE[i % 6]
            rng = np.random.default_rng(i)
            px = np.clip(
                np.asarray(rgb, np.int64)
                + rng.integers(-20, 21, (16, 16, 3)),
                0, 255,
            ).astype(np.uint8)
            blobs.append(encode_image(px, "png"))
            cap_name = _PALETTE[(i + 1) % 6][0] if i % 4 == 0 else name
            caps.append(f"a photo of a {cap_name} object")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bytes": pa.array(blobs, pa.binary()),
                "caption": pa.array(caps, pa.string()),
            }
        )

    class Align:
        """Stateful kernel: palette matrix + caption regex compiled once
        per actor/worker, applied per batch."""

        def __init__(self) -> None:
            self.mat = np.array([c for _, c in _PALETTE], np.float64)
            self.names = [n for n, _ in _PALETTE]
            self.rx = _re.compile(
                "|".join(n for n, _ in _PALETTE)
            )

        def __call__(self, t: pa.Table) -> pa.Table:
            flags = []
            for data, cap in zip(t["bytes"].to_pylist(),
                                 t["caption"].to_pylist()):
                px = decode_image(data, "png")
                mean = px.reshape(-1, 3).mean(axis=0)
                img_color = self.names[
                    int(np.argmin(((self.mat - mean) ** 2).sum(axis=1)))
                ]
                m = self.rx.search(cap or "")
                flags.append(bool(m) and m.group(0) == img_color)
            return pa.table(
                {
                    "doc_id": t["doc_id"],
                    "aligned": pa.array(flags, pa.bool_()),
                }
            )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(Align, batch_format="pyarrow", batch_size=256,
                     concurrency=4)
    )


ALIGN_SQL = """
SELECT doc_id, doc_id % 4 <> 0 AS aligned FROM documents
"""


def image_blur_detect(sf_dir: str):
    """Blur/defocus gate (``BlurDetect``): per-doc seeded noise images,
    box-blurred when ``doc_id % 3 == 0`` — variance-of-Laplacian must
    separate them exactly (sharp ≈ 5e4 vs blurred ≈ 1e3 against a 5e3
    threshold; the 50× gap is pinned in tests).  The standard corpus
    quality filter before training-compute is spent.  Oracle: the blur
    membership is a pure function of doc_id."""
    from ..images.codecs import encode_image
    from ..stages.multimodal import BlurDetect, box_blur3

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = []
        for i in ids:
            rng = np.random.default_rng(i)
            px = rng.integers(
                0, 256, (16 + i % 17, 16 + i % 23, 3), dtype=np.uint8
            )
            if i % 3 == 0:
                px = box_blur3(px)
            blobs.append(encode_image(px, "png"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(["png"] * len(ids)),
                "bytes": pa.array(blobs, pa.binary()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(BlurDetect(), batch_format="pyarrow", batch_size=256)
        .map_batches(
            lambda t: t.select(["doc_id", "is_blurry", "decode_ok"]),
            batch_format="pyarrow",
        )
    )


BLUR_SQL = """
SELECT doc_id, doc_id % 3 = 0 AS is_blurry, TRUE AS decode_ok
FROM documents
"""


def image_region_count(sf_dir: str):
    """Connected-component counting (``RegionCount``): each doc's image
    holds 1 + doc_id%5 disjoint bright bars on a dark field; the
    4-connected min-label propagation must recover the exact count from
    pixels.  Oracle: the bar count is a pure function of doc_id."""
    from ..images.codecs import encode_image
    from ..stages.multimodal import RegionCount

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = []
        for i in ids:
            k = 1 + i % 5
            px = np.full((12, 4 * k + 2, 3), 20, np.uint8)
            for j in range(k):
                px[2:10, 4 * j + 1:4 * j + 3] = 230
            blobs.append(encode_image(px, "png"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(["png"] * len(ids)),
                "bytes": pa.array(blobs, pa.binary()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(RegionCount(), batch_format="pyarrow", batch_size=256)
        .map_batches(
            lambda t: t.select(["doc_id", "n_regions", "decode_ok"]),
            batch_format="pyarrow",
        )
    )


REGION_SQL = """
SELECT doc_id, CAST(1 + doc_id % 5 AS BIGINT) AS n_regions,
       TRUE AS decode_ok
FROM documents
"""


def image_quality_signals(sf_dir: str):
    """Image quality signals (Sobel edge density + contrast) over
    lossless per-doc BMP gradients: the stage plumbing and decode path
    are oracle-checked (every gradient image decodes and has edges);
    the Sobel numerics are pinned in
    tests/test_multimodal.py::TestImageQuality."""
    from ..images.codecs import encode_image
    from ..stages.multimodal import ImageQuality

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(["bmp"] * len(ids)),
                "bytes": pa.array(
                    [encode_image(_doc_image(i), "bmp") for i in ids],
                    pa.binary(),
                ),
            }
        )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "quality_ok": t["quality_ok"],
                "has_edges": pc.greater(t["edge_density"], 0.0),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(ImageQuality(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(project, batch_format="pyarrow")
    )


IMG_QUALITY_SQL = """
SELECT doc_id, TRUE AS quality_ok, TRUE AS has_edges FROM documents
"""


def audio_spectral_bands(sf_dir: str):
    """Spectral front-end plumbing (rfft band energies) over the same
    deterministic fake-PCM payloads as ``audio_frame_rms``: per-doc
    4-band mean power + a dominant-band argmax.  Rows-only gate; the
    FFT kernel is pinned against a pure-tone reference in
    tests/test_multimodal.py::TestAudioSpectral."""
    from ..stages.multimodal import AudioSpectral

    def to_pcm(t: pa.Table) -> pa.Table:
        payloads = [
            (tx or "").encode("utf-8") * 8 for tx in t["text"].to_pylist()
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(payloads, pa.binary())}
        )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        to_pcm, batch_format="pyarrow"
    ).map_batches(AudioSpectral(frame=256, bands=4),
                  batch_format="pyarrow")

    def agg(t: pa.Table) -> pa.Table:
        # DRIVER-VERIFIED (round 5): per-row reference recompute of the
        # band energies by DIRECT DFT (one complex matmul per doc
        # against an explicit e^{-2πikn/N} matrix) vs the kernel's
        # rfft — two independent transforms; match to 1e-9 relative.
        frame, bands = 256, 4
        k = np.arange(1, frame // 2 + 1)
        n_ = np.arange(frame)
        dftm = np.exp(-2j * np.pi * np.outer(k, n_) / frame)
        edges = np.linspace(0, frame // 2, bands + 1).astype(int)
        matches = []
        for data, e, ok in zip(t["bytes"].to_pylist(),
                               t["band_energy"].to_pylist(),
                               t["spectral_ok"].to_pylist()):
            if not ok:
                matches.append(False)
                continue
            pcm = np.frombuffer(
                bytes(data)[: (len(data) // 2) * 2], dtype="<i2"
            ).astype(np.float64)
            nfr = len(pcm) // frame
            if nfr == 0:
                matches.append(e == [0.0] * bands)
                continue
            fr = pcm[: nfr * frame].reshape(nfr, frame)
            body = np.abs(fr @ dftm.T) ** 2
            want = [
                float(body[:, edges[b]:edges[b + 1]].mean())
                for b in range(bands)
            ]
            got = np.asarray(e)
            matches.append(
                bool(np.allclose(got, want, rtol=1e-9, atol=1e-6))
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "match": pa.array(matches, pa.bool_()),
            }
        )

    return ds.map_batches(agg, batch_format="pyarrow")


def _doc_image(doc_id: int) -> "np.ndarray":
    """Deterministic smooth gradient image sized by doc_id (both the Ray
    pipeline and the SQL oracle derive dims from the same arithmetic)."""
    h = 16 + doc_id % 17
    w = 16 + doc_id % 23
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255) // max(1, w - 1)
    g = (yy * 255) // max(1, h - 1)
    b = ((xx + yy) * 255) // max(1, h + w - 2)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def image_jpeg_roundtrip(sf_dir: str):
    """REAL baseline-JPEG encode→decode round-trip (pure-numpy T.81 codec,
    round 2 de-stub): per-doc gradient images → encode_jpeg(q=90) →
    DecodeJpeg stage.  Dims/decode_ok are oracle-checked; PSNR ≥ 35 dB is
    asserted in-kernel (smooth content at q90 sits well above it)."""
    from ..images.codecs import psnr
    from ..images.jpeg import encode_jpeg
    from ..stages.multimodal import DecodeJpeg

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bytes": pa.array(
                    [encode_jpeg(_doc_image(i), quality=90) for i in ids],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        # PSNR against the STAGE's decoded pixels (DecodeJpeg emits the
        # raw RGB) — the comparison is identical to re-decoding here,
        # without paying the second decode
        for i, rgb, w, h, ok in zip(
            t["doc_id"].to_pylist(), t["rgb"].to_pylist(),
            t["decoded_w"].to_pylist(), t["decoded_h"].to_pylist(),
            t["decode_ok"].to_pylist(),
        ):
            assert ok, f"doc {i} failed decode"
            px = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
            p = psnr(_doc_image(i), px)
            assert p >= 35.0, f"doc {i} psnr {p:.1f} < 35"
        return t.select(["doc_id", "decoded_w", "decoded_h", "decode_ok"])

    return (
        _read_wide(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=64)
        .map_batches(DecodeJpeg(), batch_format="pyarrow", batch_size=64)
        .map_batches(check, batch_format="pyarrow")
    )


JPEG_SQL = """
SELECT doc_id,
       CAST(16 + doc_id % 23 AS INTEGER) AS decoded_w,
       CAST(16 + doc_id % 17 AS INTEGER) AS decoded_h,
       TRUE AS decode_ok
FROM documents
"""


def image_exif_orientation(sf_dir: str):
    """EXIF-orientation pipeline (``images/exif.py`` +
    ``NormalizeOrientation`` stage): per-doc gradient JPEGs planted with
    orientation 1 + doc_id % 8 via a minimal APP1 writer, decoded and
    normalized to display pixels.  The oracle checks the parsed tag and
    the oriented dims (5-8 swap the axes); the in-kernel assert pins the
    pixel transform itself — normalized bytes must equal the reference
    numpy transform of the decoded sensor pixels, exactly."""
    from ..images.exif import apply_exif_orientation, write_exif_orientation
    from ..images.jpeg import decode_jpeg, encode_jpeg
    from ..stages.multimodal import NormalizeOrientation

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bytes": pa.array(
                    [
                        write_exif_orientation(
                            encode_jpeg(_doc_image(i), quality=90), 1 + i % 8
                        )
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        for i, data, o, rgb, w, h in zip(
            t["doc_id"].to_pylist(), t["bytes"].to_pylist(),
            t["exif_orientation"].to_pylist(), t["rgb"].to_pylist(),
            t["oriented_w"].to_pylist(), t["oriented_h"].to_pylist(),
        ):
            want = apply_exif_orientation(decode_jpeg(data), 1 + i % 8)
            assert o == 1 + i % 8, f"doc {i}: tag {o}"
            assert (h, w) == want.shape[:2], f"doc {i}: dims"
            assert rgb == want.tobytes(), f"doc {i}: pixel transform"
        return t.select(
            ["doc_id", "exif_orientation", "oriented_w", "oriented_h"]
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(NormalizeOrientation(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(check, batch_format="pyarrow")
    )


EXIF_SQL = """
SELECT doc_id,
       CAST(1 + doc_id % 8 AS INTEGER) AS exif_orientation,
       CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + doc_id % 17
                 ELSE 16 + doc_id % 23 END AS INTEGER) AS oriented_w,
       CAST(CASE WHEN 1 + doc_id % 8 >= 5 THEN 16 + doc_id % 23
                 ELSE 16 + doc_id % 17 END AS INTEGER) AS oriented_h
FROM documents
"""


def image_ssim_verify(sf_dir: str):
    """SSIM verification kernel (Wang et al. 2004 structural similarity,
    :func:`parsel_ray.images.codecs.ssim`): per-doc image → JPEG q85
    round-trip must stay structurally identical (ssim >= 0.9) while a
    pixel-shuffled impostor with the same histogram must not
    (ssim < 0.5) — the metric a lossy near-dup verifier uses where PSNR
    misrects structured noise.  The booleans are oracle-checked; the
    raw scores are asserted in-kernel."""
    from ..images.codecs import ssim
    from ..images.jpeg import decode_jpeg, encode_jpeg

    def check(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        passes, distincts = [], []
        for i in ids:
            px = _doc_image(i)
            lossy = decode_jpeg(encode_jpeg(px, quality=85))
            s_same = ssim(px, lossy)
            rng = np.random.RandomState(i + 77)
            flat = px.reshape(-1, 3).copy()
            rng.shuffle(flat)
            s_other = ssim(px, flat.reshape(px.shape))
            assert s_same >= 0.9, f"doc {i}: lossy ssim {s_same:.3f}"
            assert s_other < 0.5, f"doc {i}: impostor ssim {s_other:.3f}"
            passes.append(s_same >= 0.9)
            distincts.append(s_other < 0.5)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "ssim_pass": pa.array(passes, pa.bool_()),
                "ssim_distinct": pa.array(distincts, pa.bool_()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        check, batch_format="pyarrow", batch_size=256
    )


SSIM_SQL = """
SELECT doc_id, TRUE AS ssim_pass, TRUE AS ssim_distinct FROM documents
"""


def image_jpeg_progressive(sf_dir: str):
    """Progressive-JPEG (SOF2) round-trip: the same per-doc images as
    ``image_jpeg_roundtrip`` but written with
    ``encode_jpeg_progressive`` (spectral selection + successive
    approximation) and decoded by the multi-scan Annex G path.  The
    in-kernel assert pins the strongest property the scan script
    guarantees: progressive decode is BIT-IDENTICAL to the baseline
    encoding of the same pixels at the same quality."""
    from ..images.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from ..stages.multimodal import DecodeJpeg

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bytes": pa.array(
                    [
                        encode_jpeg_progressive(_doc_image(i), quality=90)
                        for i in ids
                    ],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        for i, data, ok in zip(
            t["doc_id"].to_pylist(), t["bytes"].to_pylist(),
            t["decode_ok"].to_pylist(),
        ):
            assert ok, f"doc {i} failed progressive decode"
            base = decode_jpeg(encode_jpeg(_doc_image(i), quality=90))
            assert np.array_equal(decode_jpeg(data), base), \
                f"doc {i}: progressive != baseline decode"
        return t.select(["doc_id", "decoded_w", "decoded_h", "decode_ok"])

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(DecodeJpeg(), batch_format="pyarrow", batch_size=256)
        .map_batches(check, batch_format="pyarrow")
    )


def image_png_roundtrip(sf_dir: str):
    """Full-PNG encode→decode round-trip exercising the REAL web surface
    of the format: color type varies by doc (gray / RGB / RGBA) and the
    scanline filter is forced per doc through all five types plus the
    adaptive heuristic (``doc_id % 6``, 5 = adaptive).  Dims / channel
    count / decode_ok are oracle-checked; losslessness is asserted
    in-kernel by rebuilding the source array and comparing exactly."""
    from ..images.codecs import decode_png, encode_png
    from ..stages.multimodal import DecodePng

    def _png_src(i: int) -> "np.ndarray":
        px = _doc_image(i)
        c = (1, 3, 4)[i % 3]
        if c == 1:
            return px[:, :, :1]
        if c == 4:
            return np.concatenate([px, px[:, :, 2:3]], axis=2)
        return px

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = []
        for i in ids:
            m = i % 6
            blobs.append(
                encode_png(_png_src(i), filter_mode="adaptive" if m == 5 else m)
            )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "filter_mode": pa.array([i % 6 for i in ids], pa.int32()),
                "bytes": pa.array(blobs, pa.binary()),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        for i, data, ok in zip(
            t["doc_id"].to_pylist(), t["bytes"].to_pylist(),
            t["decode_ok"].to_pylist(),
        ):
            assert ok, f"doc {i} failed png decode"
            assert np.array_equal(decode_png(data), _png_src(i)), (
                f"doc {i} png roundtrip not lossless"
            )
        return t.select(
            ["doc_id", "filter_mode", "channels",
             "decoded_w", "decoded_h", "decode_ok"]
        )

    return (
        _read_wide(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=64)
        .map_batches(DecodePng(), batch_format="pyarrow", batch_size=64)
        .map_batches(check, batch_format="pyarrow")
    )


PNG_SQL = """
SELECT doc_id,
       CAST(doc_id % 6 AS INTEGER) AS filter_mode,
       CAST(CASE doc_id % 3 WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END
            AS INTEGER) AS channels,
       CAST(16 + doc_id % 23 AS INTEGER) AS decoded_w,
       CAST(16 + doc_id % 17 AS INTEGER) AS decoded_h,
       TRUE AS decode_ok
FROM documents
"""


def image_bmp_roundtrip(sf_dir: str):
    """BMP (BITMAPINFOHEADER, 24-bit BGR bottom-up with 4-byte row
    padding) encode→decode round-trip through the shared
    ``DecodeImageStats`` stage; BMP is lossless so the round-trip is
    asserted exactly equal in-kernel, dims oracle-checked."""
    from ..images.codecs import decode_image, encode_image
    from ..stages.multimodal import DecodeImageStats

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fmt": pa.array(["bmp"] * len(ids)),
                "bytes": pa.array(
                    [encode_image(_doc_image(i), "bmp") for i in ids],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        for i, data, ok in zip(
            t["doc_id"].to_pylist(), t["bytes"].to_pylist(),
            t["decode_ok"].to_pylist(),
        ):
            assert ok, f"doc {i} failed bmp decode"
            assert np.array_equal(decode_image(data, "bmp"), _doc_image(i))
        return t.select(["doc_id", "decoded_w", "decoded_h", "decode_ok"])

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(DecodeImageStats(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(check, batch_format="pyarrow")
    )


def image_header_sniff(sf_dir: str):
    """Header-only format + dimension sniff across ALL six container
    formats (``SniffImageMeta``): each doc is encoded in the format
    picked by ``doc_id % 6``; every 7th doc's blob is replaced by junk
    bytes.  The sniffer reads magic bytes + fixed-offset header fields
    only — no entropy decode, no inflate — which is the crawl-scale
    routing primitive (decide decode-worthiness at ~10 bytes/blob).
    Oracle: fmt by modulo, dims by the _doc_image formula, NULLs + false
    for the junk rows."""
    from ..images.codecs import ALL_FORMATS, encode_image
    from ..stages.multimodal import SniffImageMeta

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        blobs = [
            b"\x00JUNK\x00\x00\x00" if i % 7 == 0
            else encode_image(_doc_image(i), ALL_FORMATS[i % 6])
            for i in ids
        ]
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(blobs, pa.binary())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(SniffImageMeta(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(
            lambda t: t.select(
                ["doc_id", "sniffed_fmt", "sniffed_w", "sniffed_h",
                 "sniff_ok"]
            ),
            batch_format="pyarrow",
        )
    )


SNIFF_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE ['ppm','png','qjpg','jpeg','gif','bmp'][doc_id % 6 + 1]
       END AS sniffed_fmt,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE CAST(16 + doc_id % 23 AS INTEGER) END AS sniffed_w,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            ELSE CAST(16 + doc_id % 17 AS INTEGER) END AS sniffed_h,
       doc_id % 7 <> 0 AS sniff_ok
FROM documents
"""


def content_type_route(sf_dir: str):
    """Byte-level content-type routing (``ContentTypeRouter``): every
    doc becomes one of six blob kinds (html / xml / json / image in a
    rotating container format / NUL-laced binary / plain text) and the
    sniffer must recover the kind from header bytes alone — the router
    stage that fronts a crawl ingest and decides which pipeline each
    fetched body enters.  Sniff cost is O(512 bytes) per blob regardless
    of payload size.  Oracle: the kind is a pure function of doc_id."""
    from ..crawl.contentsniff import ContentTypeRouter
    from ..images.codecs import ALL_FORMATS, encode_image

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        blobs = []
        for i, txt in zip(ids, texts):
            k = i % 6
            if k == 0:
                blobs.append(b"<!DOCTYPE html><html><body><p>"
                             + (txt or "")[:64].encode()
                             + b"</p></body></html>")
            elif k == 1:
                blobs.append(b"<?xml version=\"1.0\"?><doc id=\""
                             + str(i).encode() + b"\"/>")
            elif k == 2:
                blobs.append(b'{"doc_id": ' + str(i).encode() + b"}")
            elif k == 3:
                blobs.append(
                    encode_image(_doc_image(i), ALL_FORMATS[(i // 6) % 6])
                )
            elif k == 4:
                blobs.append(b"\x00\x01\x02\xff" * 32)
            else:
                blobs.append(txt[:256].encode() or b"plain text")
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(blobs, pa.binary())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(ContentTypeRouter(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(lambda t: t.select(["doc_id", "ctype"]),
                     batch_format="pyarrow")
    )


CTYPE_SQL = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN 'html'
         WHEN 1 THEN 'xml'
         WHEN 2 THEN 'json'
         WHEN 3 THEN 'image/' ||
              ['ppm','png','qjpg','jpeg','gif','bmp'][(doc_id // 6) % 6 + 1]
         WHEN 4 THEN 'binary'
         ELSE 'text'
       END AS ctype
FROM documents
"""


def image_gif_roundtrip(sf_dir: str):
    """GIF87a (LZW) encode→decode round-trip: per-doc gradient images →
    fixed 3-3-2 palette quantization → encode_gif → DecodeGif stage.
    Dims/decode_ok are oracle-checked; the palette-indexed round-trip is
    asserted exactly lossless in-kernel (quantization is the only lossy
    step, and it happens before encode)."""
    from ..images.gif import decode_gif, encode_gif, palette_332, quantize_332
    from ..stages.multimodal import DecodeGif

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bytes": pa.array(
                    [encode_gif(quantize_332(_doc_image(i))) for i in ids],
                    pa.binary(),
                ),
            }
        )

    def check(t: pa.Table) -> pa.Table:
        pal332 = palette_332()
        for i, data, ok in zip(
            t["doc_id"].to_pylist(), t["bytes"].to_pylist(),
            t["decode_ok"].to_pylist(),
        ):
            assert ok, f"doc {i} failed gif decode"
            idx, pal = decode_gif(data)
            assert np.array_equal(idx, quantize_332(_doc_image(i))), (
                f"doc {i} gif index roundtrip not lossless"
            )
            assert np.array_equal(pal, pal332)
        return t.select(["doc_id", "decoded_w", "decoded_h", "decode_ok"])

    return (
        _read_wide(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=64)
        .map_batches(DecodeGif(), batch_format="pyarrow", batch_size=64)
        .map_batches(check, batch_format="pyarrow")
    )


def video_shot_boundaries(sf_dir: str):
    """Shot-boundary detection (``DetectShotBoundaries``): each doc's
    NV1 video has 6 + doc_id%5 frames with scene CUTS at every frame k
    where (doc_id + k) % 3 == 0 — scenes alternate between two flat
    luminance bands (cross-cut mean-abs-diff ≈ 150, within-scene ≈ 5,
    threshold 64), so the detector must recover the cut count exactly
    from pixels.  Oracle: the closed-form count of qualifying k in
    [1, n-1].  Payload bytes never leave the task — only the (n_frames,
    n_shots) summary rows shuffle."""
    from ..images.video import encode_video
    from ..stages.multimodal import DetectShotBoundaries

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        vids = []
        for i in ids:
            n = 6 + i % 5
            h, w = 16 + i % 17, 16 + i % 23
            frames, scene = [], 0
            for k in range(n):
                if k > 0 and (i + k) % 3 == 0:
                    scene += 1
                val = 40 + 150 * (scene % 2) + 5 * (k % 2)
                frames.append(np.full((h, w, 3), val, np.uint8))
            vids.append(encode_video(frames, fmt="png"))
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(vids, pa.binary())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(DetectShotBoundaries(), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(
            lambda t: t.select(["doc_id", "n_frames", "n_shots",
                                "video_ok"]),
            batch_format="pyarrow",
        )
    )


SHOTS_SQL = """
WITH base AS (
  SELECT doc_id, 5 + doc_id % 5 AS m, (3 - doc_id % 3) % 3 AS r
  FROM documents)
SELECT doc_id,
       CAST(m + 1 AS BIGINT) AS n_frames,
       CAST(1 + CASE WHEN r = 0 THEN m // 3
                     ELSE (m - r) // 3 + 1 END AS BIGINT) AS n_shots,
       TRUE AS video_ok
FROM base
"""


def video_frame_sample(sf_dir: str):
    """NV1 container build → SampleVideoFrames stage (round-2 de-stub:
    real container parse + selective frame decode).  Sampled count and
    first/last frame indices are deterministic functions of the per-doc
    frame count — oracle-checked."""
    from ..images.video import encode_video
    from ..stages.multimodal import SampleVideoFrames

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        vids = []
        for i in ids:
            base = _doc_image(i)
            n = 2 + i % 6
            frames = [
                np.clip(base.astype(np.int64) + 7 * k, 0, 255).astype(np.uint8)
                for k in range(n)
            ]
            vids.append(encode_video(frames, fmt="png"))
        return pa.table(
            {"doc_id": t["doc_id"], "bytes": pa.array(vids, pa.binary())}
        )

    def summarize(t: pa.Table) -> pa.Table:
        ns, firsts, lasts = [], [], []
        for idxs, ok in zip(t["frame_indices"].to_pylist(),
                            t["video_ok"].to_pylist()):
            assert ok
            ns.append(len(idxs))
            firsts.append(idxs[0])
            lasts.append(idxs[-1])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_sampled": pa.array(ns, pa.int64()),
                "first_idx": pa.array(firsts, pa.int32()),
                "last_idx": pa.array(lasts, pa.int32()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(SampleVideoFrames(n=3), batch_format="pyarrow",
                     batch_size=256)
        .map_batches(summarize, batch_format="pyarrow")
    )


# n_frames = 2 + doc_id % 6; sampling picks min(3, n) evenly spaced
# indices over [0, n-1] (round(i*(n-1)/(k-1)) dedup'd) — first is always
# 0, last is n-1, and k>=2 everywhere so n_sampled = 3 unless n = 2.
VIDEO_SQL = """
SELECT doc_id,
       CAST(CASE WHEN 2 + doc_id % 6 >= 3 THEN 3 ELSE 2 END AS BIGINT)
           AS n_sampled,
       CAST(0 AS INTEGER) AS first_idx,
       CAST(1 + doc_id % 6 AS INTEGER) AS last_idx
FROM documents
"""


def events_asof_order(sf_dir: str):
    """AS-OF JOIN (custom operator — Ray Data has none): each event
    matched to the user's most recent order at-or-before the event time.
    One co-partition shuffle + vectorized segmented binary search
    (:func:`parsel_ray.functions.asof.asof_join`); right side deduped to
    one row per (custkey, date) with max orderkey so the match is
    deterministic — the oracle is DuckDB's native ASOF LEFT JOIN."""
    from ..functions.asof import asof_join

    orders = partial_agg_groupby(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"]),
        ["o_custkey", "o_orderdate"],
        [("o_orderkey", "max", "o_orderkey")],
    ).map_batches(
        lambda t: t.select(["o_custkey", "o_orderdate", "o_orderkey"])
        .rename_columns(["user_id", "o_orderdate", "o_orderkey"]),
        batch_format="pyarrow",
    )
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join(
        events, orders, on="user_id", left_time="ts",
        right_time="o_orderdate", right_cols=["o_orderkey"], buckets=16,
    )
    return joined.select_columns(["event_id", "user_id", "o_orderkey"])


ASOF_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF LEFT JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def events_range_count(sf_dir: str):
    """RANGE JOIN aggregate (custom operator): per event, how many events
    of the SAME user fell in the preceding hour ``[ts-1h, ts)`` —
    co-partition + two segmented bound queries per row
    (:func:`parsel_ray.functions.asof.range_join_count`); no pair
    materialization.  Oracle: plain SQL interval self-join."""
    from ..functions.asof import range_join_count

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    rhs = _read(sf_dir, "events", ["user_id", "ts"])
    out = range_join_count(
        events, rhs, on="user_id", left_time="ts", right_time="ts",
        delta_lo=-3_600_000_000, delta_hi=0, out_col="n_prev_hour",
        buckets=16,
    )
    return out.select_columns(["event_id", "user_id", "n_prev_hour"])


RANGE_SQL = """
SELECT e.event_id, e.user_id,
       CAST(COUNT(r.ts) AS BIGINT) AS n_prev_hour
FROM events e LEFT JOIN events r
  ON r.user_id = e.user_id
 AND r.ts >= e.ts - INTERVAL 1 HOUR AND r.ts < e.ts
GROUP BY e.event_id, e.user_id
"""


def price_quantiles(sf_dir: str):
    """EXACT distributed quantiles (p25/p50/p75/p99 of lineitem price in
    integer cents) via the value-histogram method
    (:func:`parsel_ray.functions.agg.exact_quantiles` — the shuffled
    state is O(distinct cents values), domain-bounded).  Oracle:
    DuckDB ``quantile_disc``."""
    from ..functions.agg import exact_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table({"cents": pa.array(_cents(t["l_extendedprice"]))}),
        batch_format="pyarrow",
    )
    t = exact_quantiles(ds, "cents", [0.25, 0.5, 0.75, 0.99])
    return pa.table(
        {"q": t["q"], "value_cents": t["value"].cast(pa.int64())}
    )


QUANTILE_SQL = f"""
WITH c AS (SELECT {_CENTS_SQL.format(expr='l_extendedprice')} AS v FROM lineitem)
SELECT 0.25 AS q, quantile_disc(v, 0.25) AS value_cents FROM c
UNION ALL SELECT 0.5, quantile_disc(v, 0.5) FROM c
UNION ALL SELECT 0.75, quantile_disc(v, 0.75) FROM c
UNION ALL SELECT 0.99, quantile_disc(v, 0.99) FROM c
"""


def price_quantiles_sketch(sf_dir: str):
    """APPROXIMATE quantiles by mergeable t-digest (the unbounded-domain
    path where the exact value histogram would blow up): per-batch
    partial digests, task-tree merge, O(δ) state.  Rows-only gate; the
    rank error vs the EXACT value-histogram result is asserted < 0.5 %
    in here, so a green run certifies the bound."""
    from ..functions.agg import _exact_quantiles
    from ..functions.sketch import build_tdigest

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
        lambda t: pa.table(
            {"cents": pa.array(_cents(t["l_extendedprice"]))}
        ),
        batch_format="pyarrow",
    ).materialize()  # two consumers: sketch + exact cross-check
    qs = [0.25, 0.5, 0.75, 0.99]
    td = build_tdigest(ds, "cents", delta=200)
    # rank-error certification against the exact value histogram (one
    # pass — _exact_quantiles hands back its sorted (vals, cum) arrays).
    # DRIVER-VERIFIED: value_cents_exact is DuckDB quantile_disc (the
    # oracle-pass price_quantiles expression) and rank_ok emits the
    # < 0.5 % rank-error certification of the t-digest estimate as a
    # hard gate column instead of an invisible in-query assert.
    exact, vals, cum = _exact_quantiles(ds, "cents", qs, return_hist=True)
    n = int(cum[-1])
    rank_oks = []
    for q in qs:
        est = td.quantile(q)
        idx = int(np.searchsorted(vals, est, side="right")) - 1
        rank = (cum[idx] if idx >= 0 else 0) / n
        rank_oks.append(bool(abs(rank - q) < 0.005))
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value_cents_exact": exact["value"].cast(pa.int64()),
            "rank_ok": pa.array(rank_oks, pa.bool_()),
        }
    )


def bloom_prefilter_join(sf_dir: str):
    """Bloom-prefiltered exact join (the at-scale semi-join path when the
    key set is too big to broadcast exactly): distributed Bloom build
    over urgent orderkeys (per-batch partials + task-tree OR merge) →
    Bloom map-stage prune of lineitem BEFORE the shuffle → exact bucket
    join removes the ~FPR false positives, so the result is EXACT and
    oracle-checked."""
    from ..functions.relational import bloom_semi_join, build_bloom

    urgent = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(
            pc.equal(t["o_orderpriority"], "1-URGENT")
        ).select(["o_orderkey"]).rename_columns(["orderkey"]),
        batch_format="pyarrow",
    )
    bloom = build_bloom(urgent, "orderkey", capacity=200_000, fpr=0.01)
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda t: t.rename_columns(["orderkey", "l_quantity"]),
        batch_format="pyarrow",
    )
    pre = bloom_semi_join(li, bloom, "orderkey")
    joined = hash_bucket_join(pre, urgent, on="orderkey", buckets=16)
    out = partial_sum_groupby(
        joined.map_batches(
            lambda t: t.append_column(
                "one", pa.array(np.ones(len(t), np.int64))
            ),
            batch_format="pyarrow",
        ),
        ["one"], {"l_quantity": "sum_qty"}, count_as="n_items",
    )
    return out.map_batches(
        lambda t: t.select(["n_items", "sum_qty"]), batch_format="pyarrow"
    )


BLOOM_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_items, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
"""


def lineitem_reachability(sf_dir: str):
    """Distributed BFS reachability from node 0 over the derived
    Z_211 lineitem graph (src = l_partkey % 211, dst = l_suppkey % 211)
    — the iterative-join twin of SQL's cycle-safe WITH RECURSIVE ...
    UNION, which is exactly the DuckDB oracle.  Each round is one bucket
    co-partition join + a combiner distinct + an anti-join against the
    seen set; the driver sees only the per-round convergence scalar."""
    from ..functions.graph import reachable_nodes

    def edges(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        src = pk % 211
        dst = sk % 211
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    ds = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        edges, batch_format="pyarrow"
    )
    return reachable_nodes(ds, start=0, num_partitions=8)


REACH_SQL = """
WITH RECURSIVE e AS (
  SELECT DISTINCT CAST(l_partkey % 211 AS BIGINT) AS src,
                  CAST(l_suppkey % 211 AS BIGINT) AS dst
  FROM lineitem WHERE l_partkey % 211 <> l_suppkey % 211
),
r AS (
  SELECT CAST(0 AS BIGINT) AS node
  UNION
  SELECT e.dst FROM r JOIN e ON e.src = r.node
)
SELECT node FROM r
"""


def lineitem_pareto(sf_dir: str):
    """Skyline query: lineitems no other row dominates on (quantity,
    extended-price-cents, discount-bps) jointly maximized — the classic
    multi-criteria front.  Block-local fronts (associative combiner that
    removes almost everything) then one exact final pass; the DuckDB
    oracle is the textbook NOT EXISTS formulation."""
    from ..functions.agg import pareto_front

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": pa.array(_cents(t["l_extendedprice"])),
                "disc_bps": pa.array(
                    np.floor(
                        t["l_discount"].to_numpy(zero_copy_only=False)
                        * 10000.0 + 0.5
                    ).astype(np.int64)
                ),
            }
        )

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
         "l_discount"],
    ).map_batches(prep, batch_format="pyarrow")
    return pareto_front(ds, ["qty", "price_cents", "disc_bps"])


PARETO_SQL = f"""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS BIGINT) AS qty,
         {_CENTS_SQL.format(expr='l_extendedprice')} AS price_cents,
         CAST(floor(l_discount * 10000 + 0.5) AS BIGINT) AS disc_bps
  FROM lineitem
)
SELECT * FROM t a
WHERE NOT EXISTS (
  SELECT 1 FROM t b
  WHERE b.qty >= a.qty AND b.price_cents >= a.price_cents
    AND b.disc_bps >= a.disc_bps
    AND (b.qty > a.qty OR b.price_cents > a.price_cents
         OR b.disc_bps > a.disc_bps)
)
"""


def versioned_time_travel(sf_dir: str):
    """Snapshot isolation + time travel: version 1 commits the LOW half
    of orders (o_orderkey below the footer-stats midpoint), version 2
    appends the rest — then the query reads **version 1** while v2
    exists and aggregates it.  The oracle states v1's contents directly
    (the midpoint split), proving the old snapshot stays exactly
    readable after later commits; the in-query assert proves v2 sees
    everything."""
    import tempfile as _tempfile

    import pyarrow.dataset as pads

    from ..sources.versioned import append_version, read_version
    from .streaming import _footer_minmax

    path = f"{sf_dir}/orders.parquet"
    lo, hi = _footer_minmax(path, "o_orderkey")
    mid = int((int(lo) + int(hi)) // 2)
    table_dir = _tempfile.mkdtemp(prefix="orders_ver_", dir="/tmp")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "cents": pa.array(_cents(t["o_totalprice"])),
            }
        )

    def half(part):
        return rd.read_parquet(
            path, columns=["o_orderkey", "o_orderpriority", "o_totalprice"],
            filter=part,
        ).map_batches(prep, batch_format="pyarrow")

    v1 = append_version(half(pads.field("o_orderkey") < mid), table_dir)
    v2 = append_version(half(pads.field("o_orderkey") >= mid), table_dir)
    assert (v1, v2) == (1, 2)

    full = read_version(table_dir).count()  # latest = v2 = everything
    old = read_version(table_dir, version=1)
    n_old = old.count()
    assert full > n_old > 0, (full, n_old)

    return partial_sum_groupby(
        old, ["o_orderpriority"], {"cents": "sum_cents"},
        count_as="n_orders",
    )


TIME_TRAVEL_SQL = f"""
SELECT o_orderpriority,
       CAST(SUM({_CENTS_SQL.format(expr='o_totalprice')}) AS BIGINT)
           AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderkey <
      CAST(floor(((SELECT min(o_orderkey) FROM orders)
                  + (SELECT max(o_orderkey) FROM orders)) / 2.0)
           AS BIGINT)
GROUP BY o_orderpriority
"""


def bucketed_storage_join(sf_dir: str):
    """Shuffle-free storage-bucketed join: orders and lineitem are each
    written ONCE into co-partitioned bucket layouts (hash(orderkey) % 8),
    then the join reads bucket PAIRS directly — no runtime shuffle at
    all; the co-partitioning was paid at write time (the amortize-once
    bucketing pattern).  Result: revenue cents per order priority over
    the joined pairs, hash-checked against the plain-join oracle."""
    import tempfile as _tempfile

    from ..sources.partitioned import bucketed_join, write_bucketed

    ldir = _tempfile.mkdtemp(prefix="orders_bkt_", dir="/tmp")
    rdir = _tempfile.mkdtemp(prefix="lineitem_bkt_", dir="/tmp")
    write_bucketed(
        _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        .map_batches(
            lambda t: t.rename_columns(["key", "o_orderpriority"]),
            batch_format="pyarrow",
        ),
        ldir, key_col="key", buckets=8,
    )
    write_bucketed(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])
        .map_batches(
            lambda t: pa.table(
                {
                    "key": t["l_orderkey"],
                    "cents": pa.array(_cents(t["l_extendedprice"])),
                }
            ),
            batch_format="pyarrow",
        ),
        rdir, key_col="key", buckets=8,
    )
    joined = bucketed_join(ldir, rdir, on="key", buckets=8)
    return partial_sum_groupby(
        joined, ["o_orderpriority"], {"cents": "sum_cents"},
        count_as="n_items",
    )


BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice')}) AS BIGINT)
           AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def orders_cdc_merge(sf_dir: str):
    """CDC MERGE: a deterministic changelog folds into the orders
    snapshot — upserts double the price of every ``o_orderkey % 7 == 0``
    row (seq 1), deletes remove every ``% 11 == 0`` row (seq 2, so a
    delete beats an upsert on overlapping keys).  One union + one coarse
    per-key fold (:func:`parsel_ray.functions.relational.
    apply_changelog`); the oracle states the post-merge table directly."""
    from ..functions.relational import apply_changelog

    snap = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(_cents(t["o_totalprice"])),
            }
        ),
        batch_format="pyarrow",
    )

    def mk_changes(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cents = np.asarray(
            t["price_cents"].to_numpy(zero_copy_only=False), np.int64
        )
        up = k % 7 == 0
        de = k % 11 == 0
        keys = np.concatenate([k[up], k[de]])
        vals = np.concatenate([cents[up] * 2, np.zeros(int(de.sum()),
                                                       np.int64)])
        seqs = np.concatenate(
            [np.ones(int(up.sum()), np.int64),
             np.full(int(de.sum()), 2, np.int64)]
        )
        ops = ["upsert"] * int(up.sum()) + ["delete"] * int(de.sum())
        return pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "price_cents": pa.array(vals, pa.int64()),
                "__seq": pa.array(seqs, pa.int64()),
                "__op": pa.array(ops, pa.string()),
            }
        )

    changes = snap.map_batches(mk_changes, batch_format="pyarrow")
    return apply_changelog(snap, changes, key="o_orderkey",
                           num_partitions=16)


CDC_SQL = f"""
SELECT o_orderkey,
       CAST({_CENTS_SQL.format(expr='o_totalprice')}
            * CASE WHEN o_orderkey % 7 = 0 THEN 2 ELSE 1 END AS BIGINT)
           AS price_cents
FROM orders WHERE o_orderkey % 11 <> 0
"""


def dq_orders_checks(sf_dir: str):
    """Data-quality validation suite over orders/lineitem — the
    constraint checks an ingest pipeline runs before promoting a batch:
    key uniqueness (duplicate o_orderkey count), referential integrity
    (lineitem.l_orderkey values with no parent order, via the Bloom-
    prefiltered anti path: combiner-distinct per batch then bucket
    anti-join), null counts, and a domain rule (non-positive
    o_totalprice).  One row per rule with its violation count —
    oracle-checked; this corpus is clean, so the value of the gate is
    that every rule computes ZERO by the same arithmetic as SQL."""
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    # rule 1: duplicate primary keys = Σ per-key (count-1) over count>1
    dup = partial_sum_groupby(orders.map_batches(
        lambda t: t.select(["o_orderkey"]), batch_format="pyarrow"),
        ["o_orderkey"], {}, count_as="__n")

    def dup_excess(t: pa.Table) -> pa.Table:
        n = t["__n"].to_numpy(zero_copy_only=False)
        return pa.table({"v": pa.array([int((n - 1).sum())], pa.int64())})

    n_dup = int(dup.map_batches(dup_excess,
                                batch_format="pyarrow").sum("v") or 0)

    # rule 2: orphan lineitems — distinct l_orderkey per batch (combiner)
    # anti-joined against order keys
    li_keys = partial_sum_groupby(
        _read(sf_dir, "lineitem", ["l_orderkey"]),
        ["l_orderkey"], {}, count_as="__n",
    )
    okeys = orders.map_batches(
        lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                            "__parent": pa.array(
                                np.ones(len(t), np.int8))}),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li_keys, okeys, on="l_orderkey",
                              how="left", buckets=16)
    n_orphan = int(joined.map_batches(
        lambda t: pa.table({"v": pa.array(
            [int(pc.sum(pc.cast(pc.is_null(t["__parent"]),
                                pa.int64())).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow",
    ).sum("v") or 0)

    # rules 3+4: null custkey, non-positive totalprice — one combiner scan
    def scan(t: pa.Table) -> pa.Table:
        nulls = int(pc.sum(pc.cast(pc.is_null(t["o_custkey"]),
                                   pa.int64())).as_py() or 0)
        nonpos = int(pc.sum(pc.cast(
            pc.less_equal(pc.fill_null(t["o_totalprice"], 1.0), 0.0),
            pa.int64())).as_py() or 0)
        return pa.table({"nulls": pa.array([nulls], pa.int64()),
                         "nonpos": pa.array([nonpos], pa.int64())})

    scanned = orders.map_batches(scan, batch_format="pyarrow")
    n_nulls = int(scanned.sum("nulls") or 0)
    n_nonpos = int(scanned.sum("nonpos") or 0)

    return pa.table(
        {
            "rule": pa.array(
                ["duplicate_orderkey", "orphan_lineitem",
                 "null_custkey", "nonpositive_totalprice"], pa.string()
            ),
            "violations": pa.array(
                [n_dup, n_orphan, n_nulls, n_nonpos], pa.int64()
            ),
        }
    )


DQ_SQL = """
SELECT 'duplicate_orderkey' AS rule,
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS violations
FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) WHERE n > 1
UNION ALL
SELECT 'orphan_lineitem',
       CAST(COUNT(*) AS BIGINT)
FROM (SELECT DISTINCT l_orderkey FROM lineitem) li
LEFT JOIN orders ON o_orderkey = li.l_orderkey
WHERE o_orderkey IS NULL
UNION ALL
SELECT 'null_custkey',
       CAST(COUNT(*) FILTER (WHERE o_custkey IS NULL) AS BIGINT)
FROM orders
UNION ALL
SELECT 'nonpositive_totalprice',
       CAST(COUNT(*) FILTER (WHERE COALESCE(o_totalprice, 1.0) <= 0)
            AS BIGINT)
FROM orders
"""


def q4_late_orders(sf_dir: str):
    """q4-shaped EXISTS semi-join with a cross-table predicate: orders
    placed in 1996-Q1 that have at least one lineitem shipping ≥ 60 days
    after the order date, counted per priority.  The predicate couples
    both tables, so the semi-join is a bucket co-partition on orderkey
    with the date filter pushed into the read on the orders side; the
    EXISTS collapse is a (orderkey, priority) combiner groupby (one row
    per qualified order enters the final tiny shuffle)."""
    import datetime as _dt

    lo = _dt.datetime(1996, 1, 1)
    hi = _dt.datetime(1996, 4, 1)
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        ),
        batch_format="pyarrow",
    ).map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority"]
        ),
        batch_format="pyarrow",
    )
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    joined = hash_bucket_join(orders, items, on="l_orderkey",
                              how="inner", buckets=16)

    def late(t: pa.Table) -> pa.Table:
        od = t["o_orderdate"].to_numpy(zero_copy_only=False)
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        keep = sd >= od + np.timedelta64(60, "D")
        f = t.filter(pa.array(keep))
        return pa.table(
            {
                "l_orderkey": f["l_orderkey"],
                "o_orderpriority": f["o_orderpriority"],
            }
        )

    per_order = partial_sum_groupby(
        joined.map_batches(late, batch_format="pyarrow"),
        ["l_orderkey", "o_orderpriority"], {}, count_as="__n",
    )
    return partial_sum_groupby(
        per_order, ["o_orderpriority"], {}, count_as="n_orders"
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


def q18_large_orders(sf_dir: str):
    """q18-shaped HAVING-sum join: orders whose total lineitem quantity
    exceeds 150, joined back to the order row.  The quantity rollup is a
    per-batch combiner (quantities are integer-valued, summed exactly as
    int64); the HAVING filter runs before the join so only qualified
    orderkeys shuffle."""
    qty = partial_sum_groupby(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "q": pc.cast(t["l_quantity"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ),
        ["l_orderkey"], {"q": "sum_qty"},
    ).map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty"], 150)),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "o_custkey": t["o_custkey"],
                "price_cents": pa.array(_cents(t["o_totalprice"])),
            }
        ),
        batch_format="pyarrow",
    )
    return hash_bucket_join(qty, orders, on="l_orderkey", how="inner",
                            buckets=16)


Q18_SQL = f"""
SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS sum_qty,
       o_custkey,
       CAST({_CENTS_SQL.format(expr='o_totalprice')} AS BIGINT)
           AS price_cents
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
GROUP BY l_orderkey, o_custkey, o_totalprice
HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
"""


def q6_revenue(sf_dir: str):
    """Scalar aggregate (single-row result): discounted revenue in a
    shipdate/discount/quantity window — per-batch partial sums, one tiny
    merge."""
    d0, d1 = datetime(1996, 1, 1), datetime(1997, 1, 1)

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(d0)),
                pc.less(t["l_shipdate"], pa.scalar(d1)),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = _cents(ext * disc)
        return pa.table({"rev_cents": pa.array([int(rev.sum())], pa.int64())})

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    ).map_batches(prep, batch_format="pyarrow")

    total = int(ds.sum("rev_cents") or 0)
    return pa.table({"revenue_cents": pa.array([total], pa.int64())})


Q6_SQL = f"""
SELECT CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * l_discount')}) AS BIGINT) AS revenue_cents
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 shape: top-20 customers by revenue from RETURNED items in
    one quarter.  lineitem revenue pre-aggregates per orderkey inside
    map_batches (combiner), joins the date-filtered orders via the
    partitioned hash join (both sides large at 100 TB), re-aggregates per
    custkey (tiny), then attaches customer attributes with a second
    bucket join — customer is NOT broadcast — and the 25-row nation
    lookup is.  Sort+limit carries a custkey tie-break."""
    d0, d1 = datetime(1996, 7, 1), datetime(1996, 10, 1)

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"], pa.scalar("R")))
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev_cents": pa.array(_cents(ext * (1.0 - disc))),
            }
        )

    li_rev = partial_sum_groupby(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        ).map_batches(rev, batch_format="pyarrow"),
        ["l_orderkey"], {"rev_cents": "rev_cents"},
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(d0)),
                pc.less(t["o_orderdate"], pa.scalar(d1)),
            )
        ).select(["o_orderkey", "o_custkey"]).rename_columns(
            ["l_orderkey", "c_custkey"]
        ),
        batch_format="pyarrow",
    )
    per_cust = partial_sum_groupby(
        hash_bucket_join(li_rev, orders, on="l_orderkey", buckets=16),
        ["c_custkey"], {"rev_cents": "revenue_cents"},
    )
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "acctbal_cents": pa.array(_cents(t["c_acctbal"])),
                "c_nationkey": pc.cast(t["c_nationkey"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(per_cust, cust, on="c_custkey", buckets=16)
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    def attach_name(t: pa.Table) -> pa.Table:
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "revenue_cents": t["revenue_cents"],
                "acctbal_cents": t["acctbal_cents"],
                "n_name": pa.array([name_of[int(k)] for k in nk], pa.string()),
            }
        )

    return (
        joined.map_batches(attach_name, batch_format="pyarrow")
        .sort(["revenue_cents", "c_custkey"], descending=[True, False])
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS revenue_cents,
       {_CENTS_SQL.format(expr='c_acctbal')} AS acctbal_cents,
       n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""


def q7_volume_shipping(sf_dir: str):
    """TPC-H Q7 shape: shipping volume between nation groups by year.
    supplier and customer are SF-proportional (never broadcastable at
    100 TB), so their nation keys attach via ``hash_bucket_join`` —
    with the participating-nation filter pruning each DIMENSION side
    before its shuffle, so only qualifying lineitem/orders rows survive
    their joins; lineitem⋈orders is the orderkey-partitioned join."""
    d0, d1 = datetime(1996, 1, 1), datetime(1998, 1, 1)
    NK = 5  # nations 0..4 participate (keeps the result non-empty at tiny sf)

    supp_nk = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(pc.cast(t["s_nationkey"], pa.int64()),
                                 pa.scalar(0, pa.int64())),
                pc.less(pc.cast(t["s_nationkey"], pa.int64()),
                        pa.scalar(NK, pa.int64())),
            )
        ).select(["s_suppkey", "s_nationkey"])
        .rename_columns(["l_suppkey", "supp_nation"]),
        batch_format="pyarrow",
    )
    cust_nk = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(pc.cast(t["c_nationkey"], pa.int64()),
                                 pa.scalar(0, pa.int64())),
                pc.less(pc.cast(t["c_nationkey"], pa.int64()),
                        pa.scalar(NK, pa.int64())),
            )
        ).select(["c_custkey", "c_nationkey"])
        .rename_columns(["o_custkey", "cust_nation"]),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(d0)),
                pc.less(t["l_shipdate"], pa.scalar(d1)),
            )
        )
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        yr = pc.year(t["l_shipdate"]).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "l_year": pa.array(yr.astype(np.int64)),
                "rev_cents": pa.array(_cents(ext * (1.0 - disc))),
            }
        )

    li = hash_bucket_join(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice",
             "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow"),
        supp_nk, on="l_suppkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["orderkey"],
                "supp_nation": pc.cast(t["supp_nation"], pa.int64()),
                "l_year": t["l_year"],
                "rev_cents": t["rev_cents"],
            }
        ),
        batch_format="pyarrow",
    )
    orders = hash_bucket_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            lambda t: t.rename_columns(["orderkey", "o_custkey"]),
            batch_format="pyarrow",
        ),
        cust_nk, on="o_custkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["orderkey"],
                "cust_nation": pc.cast(t["cust_nation"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, orders, on="orderkey", buckets=16)
    agg = partial_sum_groupby(
        joined.map_batches(
            lambda t: t.filter(
                pc.not_equal(t["supp_nation"], t["cust_nation"])
            ),
            batch_format="pyarrow",
        ),
        ["supp_nation", "cust_nation", "l_year"],
        {"rev_cents": "revenue_cents"},
    )
    nation = _read(sf_dir, "nation").to_pandas()
    name_of = dict(zip(nation["n_nationkey"].astype(int), nation["n_name"]))

    def names(t: pa.Table) -> pa.Table:
        sn = t["supp_nation"].to_numpy(zero_copy_only=False)
        cn = t["cust_nation"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "supp_nation": pa.array([name_of[int(k)] for k in sn]),
                "cust_nation": pa.array([name_of[int(k)] for k in cn]),
                "l_year": t["l_year"],
                "revenue_cents": t["revenue_cents"],
            }
        )

    return agg.map_batches(names, batch_format="pyarrow")


Q7_SQL = f"""
SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS revenue_cents
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ns ON s_nationkey = ns.n_nationkey
JOIN nation nc ON c_nationkey = nc.n_nationkey
WHERE s_nationkey < 5 AND c_nationkey < 5
  AND s_nationkey <> c_nationkey
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY ns.n_name, nc.n_name, EXTRACT(year FROM l_shipdate)
"""


def q14_promo_revenue(sf_dir: str):
    """TPC-H Q14 shape: promo-type revenue share for one ship month.
    The month filter prunes lineitem BEFORE the partitioned hash join
    with part (part scales with the corpus — joined, not broadcast);
    both measures come back as exact integer cents so the share is
    derivable without a float crossing the output boundary."""
    d0, d1 = datetime(1996, 9, 1), datetime(1996, 10, 1)
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: (
            lambda f: pa.table(
                {
                    "l_partkey": f["l_partkey"],
                    "rev_cents": pa.array(
                        _cents(
                            f["l_extendedprice"].to_numpy(zero_copy_only=False)
                            * (1.0 - f["l_discount"].to_numpy(zero_copy_only=False))
                        )
                    ),
                }
            )
        )(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], pa.scalar(d0)),
                    pc.less(t["l_shipdate"], pa.scalar(d1)),
                )
            )
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: t.rename_columns(["l_partkey", "p_type"]),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, part, on="l_partkey", buckets=16)

    def partial(t: pa.Table) -> pa.Table:
        rev = t["rev_cents"].to_numpy(zero_copy_only=False)
        promo = pc.equal(t["p_type"], pa.scalar("PROMO")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "promo_cents": pa.array([int(rev[promo].sum())], pa.int64()),
                "total_cents": pa.array([int(rev.sum())], pa.int64()),
            }
        )

    sums = joined.map_batches(partial, batch_format="pyarrow").sum(
        ["promo_cents", "total_cents"]
    )
    return pa.table(
        {
            "promo_cents": pa.array([int(sums["sum(promo_cents)"] or 0)], pa.int64()),
            "total_cents": pa.array([int(sums["sum(total_cents)"] or 0)], pa.int64()),
        }
    )


Q14_SQL = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN {_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}
                     ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS total_cents
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
"""


def q19_brand_disjunction(sf_dir: str):
    """TPC-H Q19 shape: revenue under a DISJUNCTION of (brand, size,
    quantity-band) predicates.  part attributes join via the partitioned
    hash join; the three-clause OR evaluates as one vectorized boolean
    expression post-join; the scalar rolls up from per-batch partials."""
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty": t["l_quantity"],
                "rev_cents": pa.array(
                    _cents(
                        t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda t: t.rename_columns(["l_partkey", "p_brand", "p_size"]),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, part, on="l_partkey", buckets=16)

    CLAUSES = [("Brand#12", 1, 15, 1, 11), ("Brand#23", 1, 25, 10, 20),
               ("Brand#3", 1, 35, 20, 30)]

    def partial(t: pa.Table) -> pa.Table:
        brand = np.asarray(t["p_brand"].to_pylist(), dtype=object)
        size = t["p_size"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for b, s0, s1, q0, q1 in CLAUSES:
            keep |= (brand == b) & (size >= s0) & (size <= s1) & \
                    (qty >= q0) & (qty <= q1)
        rev = t["rev_cents"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "revenue_cents": pa.array([int(rev.sum())], pa.int64()),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    sums = joined.map_batches(partial, batch_format="pyarrow").sum(
        ["revenue_cents", "n_items"]
    )
    return pa.table(
        {
            "revenue_cents": pa.array(
                [int(sums["sum(revenue_cents)"] or 0)], pa.int64()
            ),
            "n_items": pa.array([int(sums["sum(n_items)"] or 0)], pa.int64()),
        }
    )


Q19_SQL = f"""
SELECT CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q13_order_distribution(sf_dir: str):
    """TPC-H Q13 shape: customer order-count distribution.  Two-level
    aggregation with a LEFT join: per-customer order counts come from
    one combiner groupby over orders (never shipping order rows), the
    zero-order customers come from a left bucket join of the customer
    keys against those counts, and the distribution is a second tiny
    combiner groupby over the counts — at 100 TB both shuffles carry
    one row per customer, not per order."""
    counts = partial_sum_groupby(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda t: t.rename_columns(["c_custkey"]),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        {},
        count_as="c_count",
    )
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = hash_bucket_join(cust, counts, on="c_custkey", how="left",
                              buckets=16)

    def fill(t: pa.Table) -> pa.Table:
        c = pc.fill_null(pc.cast(t["c_count"], pa.int64()), 0)
        return pa.table({"c_count": c})

    dist = partial_sum_groupby(
        joined.map_batches(fill, batch_format="pyarrow"),
        ["c_count"],
        {},
        count_as="custdist",
    )
    return dist.sort(["custdist", "c_count"], descending=[True, True])


Q13_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q12_priority_lines(sf_dir: str):
    """TPC-H Q12 shape (conditional aggregation over a join): per
    lineitem status, how many lines belong to critical-priority orders
    vs not.  The order side ships only (key, is-critical bit) into the
    bucket join; both CASE sums are per-batch integer partials."""
    crit = pa.array(["1-URGENT", "2-HIGH"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["o_orderkey"],
                "is_crit": pc.cast(
                    pc.is_in(t["o_orderpriority"], value_set=crit), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_linestatus"])
    joined = hash_bucket_join(li, orders, on="l_orderkey", buckets=16)

    def measures(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_linestatus": t["l_linestatus"],
                "high_line_count": t["is_crit"],
                "low_line_count": pc.subtract(
                    pa.scalar(1, pa.int64()), t["is_crit"]
                ),
            }
        )

    return partial_sum_groupby(
        joined.map_batches(measures, batch_format="pyarrow"),
        ["l_linestatus"],
        {"high_line_count": "high_line_count",
         "low_line_count": "low_line_count"},
    ).sort("l_linestatus")


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H Q15 shape (view + scalar MAX + equality): supplier(s) with
    the maximum half-year revenue.  Revenue per supplier is one combiner
    groupby; the global max is a one-row tree reduce whose scalar
    broadcasts back as a filter — no second pass over lineitem, and the
    winning row count is O(ties), so the name join is a broadcast."""
    d0, d1 = datetime(1996, 1, 1), datetime(1996, 7, 1)

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(d0)),
                pc.less(t["l_shipdate"], pa.scalar(d1)),
            )
        )
        return pa.table(
            {
                "s_suppkey": t["l_suppkey"],
                "rev_cents": pa.array(
                    _cents(
                        t["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False))
                    )
                ),
            }
        )

    rev = partial_sum_groupby(
        _read(
            sf_dir, "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        ).map_batches(prep, batch_format="pyarrow"),
        ["s_suppkey"],
        {"rev_cents": "total_revenue_cents"},
    )
    # materialized ONCE: .max() consumes the plan, and the winners filter
    # below would otherwise re-run the whole lineitem scan+groupby (the
    # per-supplier aggregate is O(suppliers), not O(lineitem) — small)
    rev = rev.materialize()
    # Dataset.max returns None when the shipdate window matches nothing;
    # the oracle returns an empty result there, so filter to nothing too
    best_raw = rev.max("total_revenue_cents")
    best = int(best_raw) if best_raw is not None else None
    if best is None:
        return rev.map_batches(
            lambda t: pa.table(
                {"s_suppkey": pa.array([], pa.int64()),
                 "s_name": pa.array([], pa.string()),
                 "total_revenue_cents": pa.array([], pa.int64())}
            ),
            batch_format="pyarrow",
        )
    winners = rev.map_batches(
        lambda t: t.filter(pc.equal(t["total_revenue_cents"], best)),
        batch_format="pyarrow",
    )
    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
    out = hash_bucket_join(winners, sup, on="s_suppkey", buckets=4)
    return out.select_columns(
        ["s_suppkey", "s_name", "total_revenue_cents"]
    ).sort("s_suppkey")


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS total_revenue_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue_cents
FROM revenue JOIN supplier USING (s_suppkey)
WHERE total_revenue_cents = (SELECT MAX(total_revenue_cents) FROM revenue)
ORDER BY s_suppkey
"""


def q22_idle_customers(sf_dir: str):
    """TPC-H Q22 shape: positive-balance customers ABOVE the global
    average balance with no RECENT order (none since 1999 — this corpus
    has no order-less customers, so the recency window supplies the
    anti-join selectivity), grouped by nation.  The scalar average is a
    two-int tree reduce broadcast into the filter; the NOT EXISTS
    decorrelates into an anti bucket join against the distinct recent
    custkeys (one row per customer on both sides)."""
    recent_cut = datetime(1999, 1, 1)
    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda t: pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_nationkey": t["c_nationkey"],
                "bal_cents": pa.array(
                    _cents(t["c_acctbal"].to_numpy(zero_copy_only=False))
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def pos_partial(t: pa.Table) -> pa.Table:
        pos = t.filter(pc.greater(t["bal_cents"], 0))
        return pa.table(
            {
                "s": pa.array([
                    int(pc.sum(pos["bal_cents"]).as_py() or 0)
                ], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    stats = cust.map_batches(pos_partial, batch_format="pyarrow").sum(["s", "n"])
    # avg as an exact rational: bal > s/n  <=>  bal * n > s (ints)
    s_tot, n_tot = int(stats["sum(s)"]), int(stats["sum(n)"])

    rich = cust.map_batches(
        lambda t: t.filter(
            pc.greater(
                pc.multiply(t["bal_cents"], pa.scalar(n_tot, pa.int64())),
                pa.scalar(s_tot, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )
    ordered = (
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        .map_batches(
            lambda t: t.filter(
                pc.greater_equal(t["o_orderdate"], pa.scalar(recent_cut))
            )
            .select(["o_custkey"])
            .rename_columns(["c_custkey"])
            .group_by("c_custkey")
            .aggregate([]),
            batch_format="pyarrow",
        )
    )
    idle = hash_bucket_join(rich, ordered.map_batches(
        lambda t: t.append_column("__hit", pa.array([1] * len(t), pa.int64())),
        batch_format="pyarrow",
    ), on="c_custkey", how="left", buckets=16)

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["__hit"]))
        return pa.table(
            {"c_nationkey": t["c_nationkey"], "bal_cents": t["bal_cents"]}
        )

    return partial_sum_groupby(
        idle.map_batches(finish, batch_format="pyarrow"),
        ["c_nationkey"],
        {"bal_cents": "totacctbal_cents"},
        count_as="numcust",
    ).sort("c_nationkey")


Q22_SQL = f"""
SELECT c_nationkey,
       CAST(SUM({_CENTS_SQL.format(expr='c_acctbal')}) AS BIGINT) AS totacctbal_cents,
       CAST(COUNT(*) AS BIGINT) AS numcust
FROM customer
WHERE {_CENTS_SQL.format(expr='c_acctbal')} * (
        SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0
      ) > (
        SELECT SUM({_CENTS_SQL.format(expr='c_acctbal')})
        FROM customer WHERE c_acctbal > 0.0
      )
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def q8_market_share(sf_dir: str):
    """TPC-H Q8 shape: one nation's share of a region's market by order
    year.  supplier and customer are SF-proportional, so both attach
    via ``hash_bucket_join`` (the region filter prunes the CUSTOMER
    side before its shuffle; only the fixed 25-row nation map ships in
    a closure); lineitem⋈orders is the orderkey-partitioned join.  The
    share crosses the boundary as two exact integer-cent sums
    (numerator, denominator), never a float."""
    d0, d1 = datetime(1996, 1, 1), datetime(1998, 1, 1)
    TGT = 2  # supplier nation whose share we measure
    REGION = 2  # customers of region 2 define the market
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region_nations = pa.array(
        sorted(
            int(k) for k, r in zip(nat["n_nationkey"], nat["n_regionkey"])
            if int(r) == REGION
        ),
        pa.int64(),
    )

    supp_nk = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "supp_nation"]),
        batch_format="pyarrow",
    )
    cust_region = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.is_in(pc.cast(t["c_nationkey"], pa.int64()),
                     value_set=region_nations)
        ).select(["c_custkey"]).rename_columns(["o_custkey"]),
        batch_format="pyarrow",
    )

    def li_prep(t: pa.Table) -> pa.Table:
        ext = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "orderkey": t["l_orderkey"],
                "l_suppkey": t["l_suppkey"],
                "rev_cents": pa.array(_cents(ext * (1.0 - disc))),
            }
        )

    li = hash_bucket_join(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow"),
        supp_nk, on="l_suppkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["orderkey"],
                "rev_cents": t["rev_cents"],
                "tgt_cents": pc.if_else(
                    pc.equal(pc.cast(t["supp_nation"], pa.int64()),
                             pa.scalar(TGT, pa.int64())),
                    t["rev_cents"], pa.scalar(0, pa.int64()),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    orders = hash_bucket_join(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.greater_equal(t["o_orderdate"], pa.scalar(d0)),
                    pc.less(t["o_orderdate"], pa.scalar(d1)),
                )
            ),
            batch_format="pyarrow",
        ),
        cust_region, on="o_custkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "orderkey": t["o_orderkey"],
                "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, orders, on="orderkey", buckets=16)
    return partial_sum_groupby(
        joined, ["o_year"],
        {"tgt_cents": "nation_cents", "rev_cents": "market_cents"},
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN s_nationkey = 2
                     THEN {_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}
                     ELSE 0 END) AS BIGINT) AS nation_cents,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}) AS BIGINT) AS market_cents
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE n_regionkey = 2
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY EXTRACT(year FROM o_orderdate)
"""


def q9_product_profit(sf_dir: str):
    """TPC-H Q9 shape: profit (revenue minus a retail-price-proportional
    cost, standing in for ps_supplycost — this corpus has no partsupp)
    by supplier nation and order year, for parts whose name contains a
    word.  THREE chained partitioned hash joins (lineitem⋈supplier on
    suppkey, ⋈part on partkey, then ⋈orders on orderkey — supplier and
    part are SF-proportional like the fact sides, none broadcastable).
    The part name filter prunes the part side BEFORE its shuffle."""
    supp_nk = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.rename_columns(["l_suppkey", "s_nationkey"]),
        batch_format="pyarrow",
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]) \
        .map_batches(
            lambda t: t.filter(
                pc.match_substring(t["p_name"], "red")
            ).select(["p_partkey", "p_retailprice"]),
            batch_format="pyarrow",
        )

    li = hash_bucket_join(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"],
        ),
        supp_nk, on="l_suppkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["l_partkey"],
                "orderkey": t["l_orderkey"],
                "supp_nation": pc.cast(t["s_nationkey"], pa.int64()),
                "ext": t["l_extendedprice"],
                "disc": t["l_discount"],
                "qty": t["l_quantity"],
            }
        ),
        batch_format="pyarrow",
    )

    with_part = hash_bucket_join(li, part, on="p_partkey", buckets=16) \
        .map_batches(
            lambda t: pa.table(
                {
                    "orderkey": t["orderkey"],
                    "supp_nation": t["supp_nation"],
                    "profit_cents": pa.array(_cents(
                        t["ext"].to_numpy(zero_copy_only=False)
                        * (1.0 - t["disc"].to_numpy(zero_copy_only=False))
                        - 0.1
                        * t["p_retailprice"].to_numpy(zero_copy_only=False)
                        * t["qty"].to_numpy(zero_copy_only=False)
                    )),
                }
            ),
            batch_format="pyarrow",
        )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]) \
        .map_batches(
            lambda t: pa.table(
                {
                    "orderkey": t["o_orderkey"],
                    "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
    joined = hash_bucket_join(with_part, orders, on="orderkey", buckets=16)
    return partial_sum_groupby(
        joined, ["supp_nation", "o_year"], {"profit_cents": "profit_cents"}
    )


Q9_SQL = f"""
SELECT CAST(s_nationkey AS BIGINT) AS supp_nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM({_CENTS_SQL.format(expr='(l_extendedprice * (1.0 - l_discount) - 0.1 * p_retailprice * l_quantity)')}) AS BIGINT) AS profit_cents
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_name LIKE '%red%'
GROUP BY s_nationkey, EXTRACT(year FROM o_orderdate)
"""


def q11_important_parts(sf_dir: str):
    """TPC-H Q11 shape: parts whose shipped value (from suppliers of a
    nation band) exceeds a GLOBAL-scalar fraction of the total — the
    decorrelated ``HAVING SUM(...) > (SELECT SUM(...) * f)``.  The
    per-part aggregate is a combiner groupby; it is materialized ONCE
    (output is one row per part — orders of magnitude below lineitem),
    the global total AND part count are tree-reduce scalars over that
    SAME materialized aggregate (no second lineitem pass), and the
    threshold comparison cross-multiplies integers
    (``value * n_parts > 2 * total`` — i.e. parts worth over 2× the
    average part; TPC-H's fixed fraction empties as the part count
    grows with sf, which is why the spec scales it by 1/SF)."""
    # the nation band keeps ~1/3 of suppliers — SF-proportional, so the
    # semi-join is a partitioned bucket join (unique keys ⇒ inner join
    # is a semi-join), never a broadcast key set
    band = _read(
        sf_dir, "supplier", ["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: t.filter(
            pc.less(pc.cast(t["s_nationkey"], pa.int64()),
                    pa.scalar(8, pa.int64()))
        ).select(["s_suppkey"]).rename_columns(["l_suppkey"]),
        batch_format="pyarrow",
    )

    li = hash_bucket_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"]),
        band, on="l_suppkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["l_partkey"],
                "value_cents": pa.array(_cents(
                    t["l_extendedprice"].to_numpy(zero_copy_only=False)
                    * t["l_quantity"].to_numpy(zero_copy_only=False)
                )),
            }
        ),
        batch_format="pyarrow",
    )
    per_part = partial_sum_groupby(
        li, ["p_partkey"], {"value_cents": "value_cents"}
    ).materialize()
    total = int(per_part.sum("value_cents") or 0)
    n_parts = per_part.count()
    return per_part.map_batches(
        lambda t: t.filter(
            pc.greater(
                pc.multiply(t["value_cents"],
                            pa.scalar(n_parts, pa.int64())),
                pa.scalar(2 * total, pa.int64()),
            )
        ),
        batch_format="pyarrow",
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey AS p_partkey,
         CAST(SUM(CAST(floor(l_extendedprice * l_quantity * 100 + 0.5)
                       AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
  WHERE s_nationkey < 8
  GROUP BY l_partkey)
SELECT p_partkey, value_cents FROM per_part
WHERE value_cents * (SELECT COUNT(*) FROM per_part)
      > 2 * (SELECT SUM(value_cents) FROM per_part)
"""


def q16_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape: distinct-supplier count per part attribute
    combo, excluding a NOT-IN supplier set (negative balance stands in
    for the complaints LIKE).  supplier is SF-proportional, so the
    NOT-IN runs as a partitioned LEFT bucket join against a ``__bad``
    marker with a null-filter (the anti-join shape ``dedup_minhash``
    uses); lineitem⋈part is the partitioned hash join with the
    brand/type filter pruning part BEFORE its shuffle;
    COUNT(DISTINCT) decorrelates into two combiner groupbys —
    per-batch dedupe → global distinct (suppkey carried) → count per
    attribute combo."""
    def bad_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["s_acctbal"], pa.scalar(0.0)))
        return pa.table(
            {
                "l_suppkey": t["s_suppkey"],
                "__bad": pa.array(np.ones(len(t), np.int8), pa.int8()),
            }
        )

    bad = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]) \
        .map_batches(bad_rows, batch_format="pyarrow")

    part = _read(sf_dir, "part",
                 ["p_partkey", "p_brand", "p_type", "p_size"]) \
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.not_equal(t["p_brand"], pa.scalar("Brand#1")),
                    pc.not_equal(t["p_type"], pa.scalar("SMALL")),
                )
            ),
            batch_format="pyarrow",
        )
    li = hash_bucket_join(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]),
        bad, on="l_suppkey", how="left", buckets=16,
    ).map_batches(
        lambda t: t.filter(pc.is_null(t["__bad"]))
        .select(["l_partkey", "l_suppkey"])
        .rename_columns(["p_partkey", "suppkey"]),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, part, on="p_partkey", buckets=16)
    keys = ["p_brand", "p_type", "p_size", "suppkey"]
    distinct = joined.map_batches(
        lambda t: t.select(keys).group_by(keys).aggregate([]),
        batch_format="pyarrow",
    ).groupby(keys).aggregate(Count(alias_name="__n"))
    return partial_sum_groupby(
        distinct, ["p_brand", "p_type", "p_size"], {}, count_as="supplier_cnt"
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'SMALL'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


def q20_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape: suppliers who shipped more than TWICE the
    average supplier's volume of a name-prefixed part — the correlated
    ``sum per (part, supp) > 2 * avg over that part's suppliers``
    decorrelates into a pair-grain combiner groupby, a part-grain
    groupby OVER THE PAIR SUMS (no lineitem rescan — it also yields the
    per-part supplier count), one partitioned join of the two
    aggregates, and an exact integer cross-multiply
    (``pair * n_supp > 2 * total``).  part and supplier are
    SF-proportional, so the name-prefix semi-join and the final
    supplier-name attach are both PARTITIONED bucket joins, not
    broadcasts.  (The 2×-average form keeps the predicate
    scale-stable: a fixed share like TPC-H's 50% empties as supplier
    count per part grows with sf.)"""
    small_parts = _read(
        sf_dir, "part", ["p_partkey", "p_name"]
    ).map_batches(
        # unique keys → the inner bucket join below IS a semi-join
        lambda t: t.filter(pc.starts_with(t["p_name"], "small"))
        .select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    li = hash_bucket_join(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        small_parts, on="l_partkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "p_partkey": t["l_partkey"],
                "suppkey": t["l_suppkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    pairs = partial_sum_groupby(
        li, ["p_partkey", "suppkey"], {"qty": "pair_qty"}
    )
    totals = partial_sum_groupby(
        pairs.map_batches(
            lambda t: t.select(["p_partkey", "pair_qty"]),
            batch_format="pyarrow",
        ),
        ["p_partkey"], {"pair_qty": "part_qty"}, count_as="n_supp",
    )
    joined = hash_bucket_join(pairs, totals, on="p_partkey", buckets=8)

    def pick(t: pa.Table) -> pa.Table:
        keep = t.filter(
            pc.greater(
                pc.multiply(t["pair_qty"], t["n_supp"]),
                pc.multiply(t["part_qty"], pa.scalar(2, pa.int64())),
            )
        )
        return pa.table({"s_suppkey": keep["suppkey"]})

    # a supplier can win several parts → distinct via a tiny groupby,
    # then names attach via the partitioned join (supplier is
    # SF-proportional — a name dict in the closure would ship the
    # whole dimension with every task)
    winners = joined.map_batches(pick, batch_format="pyarrow") \
        .groupby(["s_suppkey"]).aggregate(Count(alias_name="__n")) \
        .select_columns(["s_suppkey"])
    return hash_bucket_join(
        winners,
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        on="s_suppkey", how="inner", buckets=8,
    ).select_columns(["s_suppkey", "s_name"])


Q20_SQL = """
WITH pairs AS (
  SELECT l_partkey, l_suppkey AS suppkey,
         SUM(CAST(l_quantity AS BIGINT)) AS pair_qty
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY l_partkey, l_suppkey),
totals AS (
  SELECT l_partkey, SUM(pair_qty) AS part_qty, COUNT(*) AS n_supp
  FROM pairs GROUP BY l_partkey)
SELECT DISTINCT pairs.suppkey AS s_suppkey, s_name
FROM pairs JOIN totals USING (l_partkey)
JOIN supplier ON s_suppkey = pairs.suppkey
WHERE pair_qty * n_supp > 2 * part_qty
"""


def q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    multi-supplier finished order (late = shipped >60 days after the
    order date; this corpus has no commit/receipt dates).  The
    EXISTS + NOT-EXISTS pair over the same table decorrelates into one
    lineitem⋈orders partitioned hash join and two combiner groupbys:
    per (order, supplier) ANY(late), then per order
    (supplier count, late count, MAX(late ? suppkey : -1)) — orders
    with n_supp ≥ 2 and n_late = 1 convict exactly that max.  No row
    pair is ever materialized."""
    d60 = np.timedelta64(60, "D")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderstatus", "o_orderdate"]) \
        .map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderstatus"], pa.scalar("F"))
            ).select(["o_orderkey", "o_orderdate"])
            .rename_columns(["orderkey", "o_orderdate"]),
            batch_format="pyarrow",
        )
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"]) \
        .map_batches(
            lambda t: t.rename_columns(["orderkey", "suppkey", "l_shipdate"]),
            batch_format="pyarrow",
        )
    joined = hash_bucket_join(li, orders, on="orderkey", buckets=16) \
        .map_batches(
            lambda t: pa.table(
                {
                    "orderkey": t["orderkey"],
                    "suppkey": t["suppkey"],
                    "late": pa.array(
                        (
                            t["l_shipdate"].to_numpy(zero_copy_only=False)
                            - t["o_orderdate"].to_numpy(zero_copy_only=False)
                            > d60
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    pair = partial_agg_groupby(
        joined, ["orderkey", "suppkey"], [("late", "max", "late")]
    ).map_batches(
        lambda t: t.append_column(
            "late_key",
            pc.if_else(
                pc.equal(t["late"], pa.scalar(1, pa.int64())),
                pc.cast(t["suppkey"], pa.int64()),
                pa.scalar(-1, pa.int64()),
            ),
        ),
        batch_format="pyarrow",
    )
    per_order = partial_agg_groupby(
        pair, ["orderkey"],
        [("late", "sum", "n_late"), ("late_key", "max", "late_supp")],
        count_as="n_supp",
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.greater_equal(t["n_supp"], pa.scalar(2, pa.int64())),
                pc.equal(t["n_late"], pa.scalar(1, pa.int64())),
            )
        ),
        batch_format="pyarrow",
    )
    counts = partial_sum_groupby(
        per_order.map_batches(
            lambda t: t.select(["late_supp"]).rename_columns(["s_suppkey"]),
            batch_format="pyarrow",
        ),
        ["s_suppkey"], {}, count_as="numwait",
    )
    # supplier is SF-proportional: names attach via the partitioned
    # join, never a driver dict shipped in a task closure
    out = hash_bucket_join(
        counts,
        _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        on="s_suppkey", how="inner", buckets=8,
    ).select_columns(["s_name", "numwait"]) \
        .sort(["numwait", "s_name"], descending=[True, False]) \
        .limit(100)
    return out


Q21_SQL = """
WITH pairs AS (
  SELECT l_orderkey, l_suppkey,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey),
per_order AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late,
         MAX(CASE WHEN late = 1 THEN l_suppkey ELSE -1 END) AS late_supp
  FROM pairs GROUP BY l_orderkey)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON s_suppkey = late_supp
WHERE n_supp >= 2 AND n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q2_min_price_suppliers(sf_dir: str, first_parts: int = 200):
    """TPC-H Q2 shape (correlated MIN subquery, join-back): for each
    part (first ``first_parts`` keys — Q2's region filter stand-in),
    EVERY supplier row whose price equals the per-part minimum (ties
    all kept, unlike an argmin top-1).  Decorrelation: one min-combiner
    groupby over the pruned items, then an equality filter after a
    bucket join back — two shuffles of one-row-per-(part[,supp])."""

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_partkey"], first_parts))
        return pa.table(
            {
                "l_partkey": t["l_partkey"],
                "l_suppkey": t["l_suppkey"],
                "price_cents": pa.array(
                    _cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
                ),
            }
        )

    items = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(prep, batch_format="pyarrow")
    mins = partial_agg_groupby(
        items, ["l_partkey"], [("price_cents", "min", "min_cents")]
    )
    joined = hash_bucket_join(items, mins, on="l_partkey", buckets=8)

    def keep_min(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["price_cents"], t["min_cents"]))
        return t.select(["l_partkey", "l_suppkey", "price_cents"])

    # a (part, supp) pair can hit the min price on several lines; Q2
    # returns the supplier once — distinct via one combiner groupby
    return (
        joined.map_batches(keep_min, batch_format="pyarrow")
        .map_batches(
            lambda t: t.group_by(
                ["l_partkey", "l_suppkey", "price_cents"]
            ).aggregate([]),
            batch_format="pyarrow",
        )
        .groupby(["l_partkey", "l_suppkey"])
        .aggregate(ray.data.aggregate.Min("price_cents", alias_name="price_cents"))
        .sort(["l_partkey", "l_suppkey"])
    )


Q2_SQL = f"""
WITH items AS (
  SELECT l_partkey, l_suppkey,
         {_CENTS_SQL.format(expr='l_extendedprice')} AS price_cents
  FROM lineitem WHERE l_partkey < 200
)
SELECT DISTINCT l_partkey, l_suppkey, price_cents
FROM items i
WHERE price_cents = (SELECT MIN(price_cents) FROM items m
                     WHERE m.l_partkey = i.l_partkey)
ORDER BY l_partkey, l_suppkey
"""


def q17_small_quantity(sf_dir: str):
    """TPC-H Q17 shape: the correlated scalar subquery ``l_quantity <
    0.5 * avg(l_quantity) per part`` decorrelates into per-part
    sufficient statistics (sum, count — integers, so the comparison
    cross-multiplies exactly: ``2*qty*cnt < sum``) joined back to the
    item rows; the brand/type filter keeps a FIXED FRACTION of the
    SF-proportional part table, so the semi-join is a partitioned
    bucket join (unique keys ⇒ inner join is a semi-join), never a
    broadcast key set."""
    brand_parts = _read(
        sf_dir, "part", ["p_partkey", "p_brand", "p_type"]
    ).map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.equal(t["p_brand"], pa.scalar("Brand#5")),
                pc.equal(t["p_type"], pa.scalar("ECONOMY")),
            )
        ).select(["p_partkey"]).rename_columns(["l_partkey"]),
        batch_format="pyarrow",
    )

    items = hash_bucket_join(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_quantity", "l_extendedprice"]),
        brand_parts, on="l_partkey", how="inner", buckets=16,
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "qty": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": pa.array(_cents(t["l_extendedprice"])),
            }
        ),
        batch_format="pyarrow",
    )
    stats = partial_sum_groupby(
        items.map_batches(
            lambda t: t.select(["l_partkey", "qty"]),
            batch_format="pyarrow",
        ),
        ["l_partkey"], {"qty": "sum_qty"}, count_as="cnt",
    )
    joined = hash_bucket_join(items, stats, on="l_partkey", buckets=8)

    def partial(t: pa.Table) -> pa.Table:
        qty = t["qty"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        s = t["sum_qty"].to_numpy(zero_copy_only=False)
        keep = 2 * qty * cnt < s
        price = t["price_cents"].to_numpy(zero_copy_only=False)[keep]
        return pa.table(
            {
                "total_cents": pa.array([int(price.sum())], pa.int64()),
                "n_items": pa.array([int(keep.sum())], pa.int64()),
            }
        )

    sums = joined.map_batches(partial, batch_format="pyarrow").sum(
        ["total_cents", "n_items"]
    )
    return pa.table(
        {
            "total_cents": pa.array([int(sums["sum(total_cents)"] or 0)], pa.int64()),
            "n_items": pa.array([int(sums["sum(n_items)"] or 0)], pa.int64()),
        }
    )


Q17_SQL = f"""
SELECT CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice')}) AS BIGINT) AS total_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_partkey IN (SELECT p_partkey FROM part
                    WHERE p_brand = 'Brand#5' AND p_type = 'ECONOMY')
  AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


def top_order_per_customer(sf_dir: str):
    """Window-function shape: rank orders per customer, keep the top one
    (deterministic tie-break on orderkey) — grouped_apply over the
    partition key."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(_cents(t["o_totalprice"])),
            }
        )

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow"
    )

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["price_cents", "o_orderkey"], ascending=[False, True])
        return g.head(1)

    return grouped_apply(ds, "o_custkey", top1, num_partitions=16)


TOPCUST_SQL = f"""
SELECT o_custkey, o_orderkey, price_cents FROM (
  SELECT o_custkey, o_orderkey,
         {_CENTS_SQL.format(expr='o_totalprice')} AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY {_CENTS_SQL.format(expr='o_totalprice')} DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn = 1
"""


def orders_minmax(sf_dir: str):
    """Min/max/count per group via the partial-aggregation combiner."""

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderstatus": t["o_orderstatus"],
                "price_cents": pa.array(_cents(t["o_totalprice"])),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return partial_agg_groupby(
        ds,
        ["o_orderstatus"],
        [("price_cents", "min", "min_cents"), ("price_cents", "max", "max_cents")],
        count_as="n",
    )


MINMAX_SQL = f"""
SELECT o_orderstatus,
       MIN({_CENTS_SQL.format(expr='o_totalprice')}) AS min_cents,
       MAX({_CENTS_SQL.format(expr='o_totalprice')}) AS max_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders GROUP BY o_orderstatus
"""


def deterministic_sample(sf_dir: str):
    """Hash-based deterministic ~3% sample (md5 of the key — the exact
    same expression the SQL oracle evaluates, so the sample is identical;
    at scale this replaces random_sample when reproducibility matters)."""
    import hashlib

    def samp(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_pylist()
        keep = [
            hashlib.md5(str(k).encode()).hexdigest()[:2] < "08" for k in keys
        ]
        return t.filter(pa.array(keep, pa.bool_())).select(["o_orderkey", "o_orderpriority"])

    return _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        samp, batch_format="pyarrow"
    )


SAMPLE_SQL = """
SELECT o_orderkey, o_orderpriority FROM orders
WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '08'
"""


def union_counts(sf_dir: str):
    """Dataset.union + aggregate: row counts per source table."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda t: pa.table({"src": pa.array(["lineitem"] * len(t), pa.string())}),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
        lambda t: pa.table({"src": pa.array(["orders"] * len(t), pa.string())}),
        batch_format="pyarrow",
    )
    return partial_sum_groupby(li.union(orders), ["src"], {}, count_as="n")


UNION_SQL = """
SELECT src, CAST(COUNT(*) AS BIGINT) AS n FROM (
  SELECT 'lineitem' AS src FROM lineitem
  UNION ALL
  SELECT 'orders' AS src FROM orders
) GROUP BY src
"""


def image_corpus_prep_q(sf_dir: str):
    """Image-payload capstone (:mod:`parsel_ray.pipelines.image_prep`):
    crawl → corpus-wide decode+phash re-verification → exact content
    dedup (full-row first-wins) → perceptual near-dup components →
    thumbnail re-encode → partitioned publish with receipts.  Funnel
    monotonicity, row-level verification, and receipt equality are all
    asserted in-pipeline; the gate records the funnel (rows-only)."""
    from .image_prep import image_corpus_prep

    funnel, _out = image_corpus_prep(_demo_crawl_cfg())
    return funnel


def training_batch_prep_q(sf_dir: str):
    """Training-loader capstone
    (:mod:`parsel_ray.pipelines.image_prep.training_batch_prep`):
    crawl image corpus → aspect-ratio buckets → fixed-size per-bucket
    batch packing → batch-contiguous WebDataset tar shards.  Packing
    permutation, batch shape (full batches except one tail per
    bucket), and tar receipt equality are asserted in-pipeline; the
    gate records the funnel (rows-only)."""
    from .image_prep import training_batch_prep

    funnel, _shards = training_batch_prep(_demo_crawl_cfg())
    return funnel


def phash_rotated_dedup(sf_dir: str):
    """Rotation/mirror-robust image dedup via the orbit phash
    (:func:`parsel_ray.images.codecs.phash_orbit64`): per-doc seeded
    noise images, with every doc_id % 5 == 0 planting an EXACT
    rotated/mirrored duplicate (dihedral transform 2-8 of the same
    pixels) under id + 1,000,000.  One hash-keyed groupby recovers
    exactly the planted pairs — a single-orientation phash scatters
    them across buckets (asserted in tests).  Oracle: the planted pair
    set is pure doc_id arithmetic."""
    import pandas as pd

    from ..images.codecs import phash_orbit64
    from ..images.exif import apply_exif_orientation

    def build(t: pa.Table) -> pa.Table:
        img_ids, rgbs, ws, hs = [], [], [], []
        for i in t["doc_id"].to_pylist():
            rng = np.random.RandomState(i)
            h, w = 16 + i % 13, 16 + i % 19
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            img_ids.append(i)
            rgbs.append(px.tobytes()); ws.append(w); hs.append(h)
            if i % 5 == 0:
                q = apply_exif_orientation(px, 2 + i % 7)
                img_ids.append(i + 1_000_000)
                rgbs.append(q.tobytes())
                ws.append(q.shape[1]); hs.append(q.shape[0])
        return pa.table(
            {
                "img_id": pa.array(img_ids, pa.int64()),
                "rgb": pa.array(rgbs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
            }
        )

    def orbit_hash(t: pa.Table) -> pa.Table:
        out = [
            phash_orbit64(
                np.frombuffer(r, np.uint8).reshape(h_, w_, 3)
            )
            for r, w_, h_ in zip(
                t["rgb"].to_pylist(), t["w"].to_pylist(), t["h"].to_pylist()
            )
        ]
        return pa.table(
            {"img_id": t["img_id"], "ph": pa.array(out, pa.int64())}
        )

    def pairs(t: pa.Table) -> pa.Table:
        # all unordered pairs within the hash-equality group — the
        # standard semantics of a hash dedup key; an (astronomically
        # unlikely here) cross-image collision yields extra pairs
        # rather than killing the task
        ids = sorted(t["img_id"].to_pylist())
        los = [a for i, a in enumerate(ids) for _ in ids[i + 1 :]]
        his = [b for i, _ in enumerate(ids) for b in ids[i + 1 :]]
        return pa.table(
            {"lo": pa.array(los, pa.int64()), "hi": pa.array(his, pa.int64())}
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(build, batch_format="pyarrow", batch_size=256)
        .map_batches(orbit_hash, batch_format="pyarrow", batch_size=256)
        .groupby("ph")
        .map_groups(pairs, batch_format="pyarrow")
    )


PHASH_ROT_SQL = """
SELECT doc_id AS lo, doc_id + 1000000 AS hi
FROM documents WHERE doc_id % 5 = 0
"""


def phash_rotated_near_dup(sf_dir: str):
    """LOSSY rotated-duplicate recovery via orbit-aware Hamming LSH
    (:func:`parsel_ray.functions.dedup.orbit_hamming_near_dup_pairs`):
    the planted copies here are rotated AND perturbed (+-32 on half the
    pixels — orbit distances 0-6, so exact orbit-hash equality would
    miss most of them and single-orientation banding would scatter
    them).  Each image indexes under all 8 orientation hashes' bands;
    verification is the exact min-over-8x8 xor-popcount.  Oracle: the
    planted pair set is pure doc_id arithmetic."""
    from ..functions.dedup import orbit_hamming_near_dup_pairs
    from ..images.codecs import phash64
    from ..images.exif import apply_exif_orientation

    def orbit_hashes(px):
        return [
            phash64(apply_exif_orientation(px, o)) for o in range(1, 9)
        ]

    def build(t: pa.Table) -> pa.Table:
        ids_out, hashes_out = [], []
        for i in t["doc_id"].to_pylist():
            rng = np.random.RandomState(i)
            h, w = 16 + i % 13, 16 + i % 19
            px = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
            ids_out.append(i)
            hashes_out.append(orbit_hashes(px))
            if i % 5 == 0:
                q = apply_exif_orientation(px, 2 + i % 7).astype(np.int16)
                mask = rng.rand(*q.shape) < 0.5
                q = np.clip(
                    q + mask * rng.randint(-32, 33, q.shape), 0, 255
                ).astype(np.uint8)
                ids_out.append(i + 1_000_000)
                hashes_out.append(orbit_hashes(q))
        return pa.table(
            {
                "img_id": pa.array(ids_out, pa.int64()),
                "hashes": pa.array(hashes_out, pa.list_(pa.int64())),
            }
        )

    pairs = orbit_hamming_near_dup_pairs(
        _read(sf_dir, "documents", ["doc_id"]).map_batches(
            build, batch_format="pyarrow", batch_size=256
        ),
        "hashes",
        "img_id",
        num_partitions=16,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"lo": t["id_a"], "hi": t["id_b"]})

    return pairs.map_batches(rename, batch_format="pyarrow")


def phash_near_dup(sf_dir: str):
    """Perceptual-hash near-duplicate pairs over the crawled image corpus
    (hamming-banded grouping, exact popcount verify) — the phash hook
    (SURVEY N10)."""
    from ..crawl.frontier import IMAGE_SCHEMA, run_crawl

    res = run_crawl(_demo_crawl_cfg())
    t = pa.Table.from_pylist(res.image_rows, schema=IMAGE_SCHEMA).select(
        ["image_id", "phash"]
    )
    ds = rd.from_arrow(t)
    pairs = D.hamming_near_dup_pairs(
        ds, col="phash", id_col="image_id", max_hamming=6,
        num_partitions=8, id_type=pa.string(),
    )
    # distributed cross-band pair dedupe: id_a co-locates per partition,
    # so in-partition drop_duplicates is exact and global
    uniq = grouped_apply(
        pairs,
        "id_a",
        lambda g: g.drop_duplicates(["id_a", "id_b"]),
        num_partitions=8,
        out_schema=pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                              ("hamming", pa.int64())]),
    )
    pdf = uniq.to_pandas()  # small artifact
    if not len(pdf):
        # a dup-free corpus: to_pandas can drop the columns of an
        # all-empty union stream — rebuild the typed empty result
        return pa.schema([("id_a", pa.string()), ("id_b", pa.string()),
                          ("hamming", pa.int64())]).empty_table()
    pdf = pdf.sort_values(["id_a", "id_b"])
    return pa.Table.from_pandas(pdf.reset_index(drop=True), preserve_index=False)


BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def doc_bpe_tokens(sf_dir: str):
    """BPE-ish subword pre-tokenization count: letters / digits / symbol
    runs via the SAME RE2 pattern the oracle evaluates."""

    def f(t: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(t["text"], BPE_RE), pa.int64())
        return pa.table({"doc_id": t["doc_id"], "n_bpe_tokens": n})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow"
    )


BPE_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


def hash_join_native(sf_dir: str):
    """Same join as hash_join_priority but through Ray Data's built-in
    hash-partitioned ``Dataset.join`` — both code paths are supported; the
    explicit bucket join documents its partitioning, the native one uses
    the engine's aggregator actors."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = li.join(
        orders,
        join_type="inner",
        num_partitions=16,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    )
    return partial_sum_groupby(
        joined, ["o_orderpriority"], {"l_quantity": "sum_qty"}, count_as="n_items"
    )


NATIVE_JOIN_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items, SUM(l_quantity) AS sum_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def events_sliding_hourly(sf_dir: str):
    """SLIDING window aggregate: 60-minute windows advancing every 30
    minutes (each event belongs to exactly 2 windows) — implemented by
    exploding events to their member windows inside map_batches, then the
    combiner groupby.  Window grid anchored at floor-hour(min ts); the
    anchor comes from PARQUET ROW-GROUP STATISTICS (footer metadata only
    — no data pages read, no driver column scan)."""
    import pyarrow.parquet as pq_

    md = pq_.ParquetFile(f"{sf_dir}/events.parquet").metadata
    ts_idx = md.schema.names.index("ts")
    rg_mins = [
        md.row_group(i).column(ts_idx).statistics.min
        for i in range(md.num_row_groups)
        if md.row_group(i).column(ts_idx).statistics is not None
    ]
    assert rg_mins, "events.parquet has no ts statistics"
    lo = pc.floor_temporal(pa.scalar(min(rg_mins)), unit="hour")
    lo_scalar = pa.scalar(lo.as_py())

    def explode(t: pa.Table) -> pa.Table:
        w1 = pc.floor_temporal(t["ts"], multiple=30, unit="minute")
        w2 = pc.subtract(w1, pa.scalar(1_800_000_000, pa.duration("us")))
        cents = pa.array(_cents(t["value"]))
        base = pa.table(
            {"event_type": t["event_type"], "value_cents": cents}
        )
        p1 = base.append_column("wstart", w1)
        p2 = base.append_column("wstart", w2)
        both = pa.concat_tables([p1, p2])
        return both.filter(pc.greater_equal(both["wstart"], lo_scalar))

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
        explode, batch_format="pyarrow"
    )
    return partial_sum_groupby(
        ds, ["event_type", "wstart"], {"value_cents": "sum_value_cents"}, count_as="n"
    )


SLIDING_SQL = f"""
WITH b AS (SELECT date_trunc('hour', MIN(ts)) AS lo, MAX(ts) AS hi FROM events),
w AS (SELECT unnest(generate_series((SELECT lo FROM b), (SELECT hi FROM b),
                                    INTERVAL 30 MINUTE)) AS wstart)
SELECT e.event_type, w.wstart,
       CAST(SUM({_CENTS_SQL.format(expr='e.value')}) AS BIGINT) AS sum_value_cents,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN w
  ON e.ts >= w.wstart AND e.ts < w.wstart + INTERVAL 60 MINUTE
GROUP BY 1, 2
"""


def events_running_count(sf_dir: str):
    """Keyed incremental state (stream shape): per-user running event
    count in event-time order — partition by key, order within the
    partition, cumulative state (the groupby(key)+ordered-group pattern;
    an actor-per-key-bucket gives the same semantics for unbounded
    streams)."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).copy()
        g["running_n"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["user_id", "event_id", "running_n"]]

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        "user_id",
        run,
        num_partitions=16,
    )


RUNNING_SQL = """
SELECT user_id, event_id,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS running_n
FROM events
"""


def embedding_ivf_knn(sf_dir: str):
    """IVF ANN top-5 (rows-only: approximate — recall measured against the
    exact brute-force result in tests).  100 TB shape: centroids are
    trained on a seeded distributed ``random_sample`` (the driver only
    ever holds the ≤8k-row sample — a driver-scale k-means problem), and
    the 10 query vectors come from a predicate-pushdown parquet read; the
    full embedding table is never materialized on the driver."""
    import pyarrow.dataset as pads

    from ..functions.similarity import ivf_topk, train_centroids

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()  # parquet metadata only — no scan
    frac = min(1.0, 8192.0 / max(n, 1))
    sample = ds.random_sample(frac, seed=42).take_batch(
        16384, batch_format="pyarrow"
    )
    cent = train_centroids(_stack_embeddings(sample["embedding"]), k=16)
    qt = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        schema=_clean_schema(f"{sf_dir}/embeddings.parquet",
                             ["vec_id", "embedding"]),
        filter=pads.field("vec_id") < 10,
    ).take_batch(32, batch_format="pyarrow")
    qmat = _stack_embeddings(qt["embedding"])
    norms = np.linalg.norm(qmat, axis=1)
    norms[norms == 0] = 1.0
    qref = ray.put(
        {"ids": qt["vec_id"].to_numpy(zero_copy_only=False), "mat": qmat / norms[:, None]}
    )
    cref = ray.put(cent)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = ivf_topk(ds, qref, cref, k=5, nprobe=4)
    # DRIVER-CERTIFIED: recall@5 against the EXACT brute-force top-k
    # (:func:`brute_force_topk` — the oracle-pass ``embedding_knn``
    # kernel), both gathered as O(queries·k) rows.  nprobe=4 of 16
    # cells structurally bounds recall below 1.0; the floor certifies
    # the cell assignment + probed-cell scan are sane while tests pin
    # the exact behavior.
    ivf_rows = out.select_columns(["query_id", "neighbor_id"]).take_all()
    brute = brute_force_topk(ds, qref, k=5, concurrency=2)
    brute_rows = brute.select_columns(["query_id", "neighbor_id"]).take_all()
    from collections import defaultdict

    got: dict = defaultdict(set)
    want: dict = defaultdict(set)
    for r in ivf_rows:
        got[r["query_id"]].add(r["neighbor_id"])
    for r in brute_rows:
        want[r["query_id"]].add(r["neighbor_id"])
    recalls = [
        len(got[q] & ns) / max(len(ns), 1) for q, ns in want.items()
    ]
    mean_recall = sum(recalls) / max(len(recalls), 1)
    return pa.table(
        {
            "n_queries": pa.array([len(want)], pa.int64()),
            "mean_recall_ok": pa.array([bool(mean_recall >= 0.6)], pa.bool_()),
        }
    )


def embedding_ivf_pruned_knn(sf_dir: str):
    """IVF ANN over the ON-DISK cell-partitioned layout
    (:func:`parsel_ray.functions.similarity.build_ivf_layout` +
    ``ivf_topk_pruned``): the probed cells' parquet files are the ONLY
    ones read — scan volume ∝ probed-cell mass, certified in-query
    (rows_scanned < rows_total), and results are identical to the
    in-memory ``ivf_topk`` with the same centroids/queries (pinned in
    tests/test_ray_stages.py::test_ivf_pruned_layout_matches_and_bounds_scan).
    Rows-only: approximate ANN has no SQL oracle."""
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow.dataset as pads

    from ..functions.similarity import (
        build_ivf_layout,
        ivf_topk,
        ivf_topk_pruned,
        train_centroids,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()
    frac = min(1.0, 8192.0 / max(n, 1))
    sample = ds.random_sample(frac, seed=42).take_batch(
        16384, batch_format="pyarrow"
    )
    cent = train_centroids(_stack_embeddings(sample["embedding"]), k=16)
    qt = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        schema=_clean_schema(f"{sf_dir}/embeddings.parquet",
                             ["vec_id", "embedding"]),
        filter=pads.field("vec_id") < 10,
    ).take_batch(32, batch_format="pyarrow")
    qmat = _stack_embeddings(qt["embedding"])
    norms = np.linalg.norm(qmat, axis=1)
    norms[norms == 0] = 1.0
    qref = ray.put(
        {"ids": qt["vec_id"].to_numpy(zero_copy_only=False),
         "mat": qmat / norms[:, None]}
    )
    cref = ray.put(cent)
    layout = _tempfile.mkdtemp(prefix="ivf_layout_", dir="/tmp")
    try:
        build_ivf_layout(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]), cref, layout
        )
        out, scanned, total = ivf_topk_pruned(
            layout, qref, cref, k=5, nprobe=4
        )
        # DRIVER-CERTIFIED: ``pinned_ok`` — the pruned on-disk layout
        # returns the IDENTICAL (query, neighbor, rank) set as the
        # in-memory ivf_topk with the same centroids/queries (both
        # gathered as O(queries·k) rows); ``scan_ok`` — the footer-
        # derived scan volume is positive and bounded by the corpus
        # (scanned == total is legitimate when the probed-cell union
        # covers every on-disk cell on a small trained codebook).
        pruned_rows = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in out.select_columns(
                ["query_id", "neighbor_id", "rank"]
            ).take_all()
        )
        mem = ivf_topk(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            qref, cref, k=5, nprobe=4,
        )
        mem_rows = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in mem.select_columns(
                ["query_id", "neighbor_id", "rank"]
            ).take_all()
        )
        n_queries = len({q for q, _, _ in pruned_rows})
        return pa.table(
            {
                "n_queries": pa.array([n_queries], pa.int64()),
                "pinned_ok": pa.array([pruned_rows == mem_rows], pa.bool_()),
                "scan_ok": pa.array([0 < scanned <= total], pa.bool_()),
            }
        )
    finally:
        _shutil.rmtree(layout, ignore_errors=True)


def partitioned_write_docs(sf_dir: str):
    """Partitioned parquet sink in ONE streaming pass: tasks split each
    batch by lang and write per-key shards directly (atomic tmp+rename);
    the driver publishes per-partition _DONE markers after the pass — the
    resumable-output layout with no per-key dataset re-scan.  The returned
    artifact is the per-partition row count cross-checked against the
    written files."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow.parquet as _pq

    from ..sources import write_partitioned_parquet

    out = _tempfile.mkdtemp(prefix="docs_by_lang_", dir="/tmp")
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
        counts = write_partitioned_parquet(ds, out, "lang")
        # verification read-back: file metadata must agree with receipts
        for lang, n in zip(counts["lang"].to_pylist(), counts["n"].to_pylist()):
            files = _glob.glob(_os.path.join(out, f"lang={lang}", "*.parquet"))
            assert sum(_pq.read_metadata(f).num_rows for f in files) == n
            assert _os.path.exists(_os.path.join(out, f"lang={lang}", "_DONE"))
        return counts
    finally:
        _shutil.rmtree(out, ignore_errors=True)


PARTWRITE_SQL = "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang"


def compact_partitioned_docs(sf_dir: str):
    """Small-file compaction lifecycle: a many-block write fragments each
    lang partition into many tiny shards, ``compact_partitioned`` rewrites
    each to ceil(rows/target) files (one task per partition, receipts
    only on the driver), and a second pass is certified a NO-OP — the
    steady-state maintenance job of any long-lived 100 TB corpus.  The
    returned per-partition row counts oracle-check against DuckDB."""
    import glob as _glob
    import math as _math
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    from ..sources import write_partitioned_parquet
    from ..sources.partitioned import compact_partitioned

    out = _tempfile.mkdtemp(prefix="docs_compact_", dir="/tmp")
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "lang"]).repartition(24)
        write_partitioned_parquet(ds, out, "lang")
        frag = sum(
            len(_glob.glob(_os.path.join(p, "*.parquet")))
            for p in _glob.glob(_os.path.join(out, "lang=*"))
        )
        target = 1_000_000  # every partition fits one shard at gate scale
        rec = compact_partitioned(out, "lang", target_rows_per_shard=target)
        assert int(pc.sum(rec["files_after"]).as_py()) < frag
        for fb, fa, n in zip(
            rec["files_before"].to_pylist(),
            rec["files_after"].to_pylist(),
            rec["n_rows"].to_pylist(),
        ):
            assert fa == max(1, _math.ceil(n / target))
        rec2 = compact_partitioned(out, "lang", target_rows_per_shard=target)
        assert rec2["files_before"].to_pylist() == rec2["files_after"].to_pylist()
        assert rec2["n_rows"].to_pylist() == rec["n_rows"].to_pylist()
        return pa.table({"lang": rec["lang"], "n": rec["n_rows"]})
    finally:
        _shutil.rmtree(out, ignore_errors=True)


def pruned_partitioned_read(sf_dir: str):
    """Predicate/partition pruning at the READ (the read-side scale
    lever): documents written once as a hive-partitioned parquet dataset
    (single-pass sink), then read back with column pruning + a partition
    filter.  The fragment count under the filter is ASSERTED smaller than
    the full dataset — proof the scan plans only the matching partition's
    files — and the aggregate is oracle-checked against DuckDB."""
    import shutil as _shutil
    import tempfile as _tempfile

    import pyarrow.dataset as pads

    from ..sources import write_partitioned_parquet

    out = _tempfile.mkdtemp(prefix="docs_pruned_", dir="/tmp")
    try:
        ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
        write_partitioned_parquet(ds, out, "lang")
        # plan-level proof: the filter prunes whole fragments (pyarrow
        # ignores the _DONE markers via the default '_' prefix rule)
        dset = pads.dataset(out, format="parquet", partitioning="hive")
        n_all = sum(1 for _ in dset.get_fragments())
        n_sel = sum(1 for _ in dset.get_fragments(pads.field("lang") == "en"))
        assert 0 < n_sel < n_all, (n_sel, n_all)
        pruned = rd.read_parquet(
            out,
            columns=["doc_id", "n_chars", "lang"],
            filter=pads.field("lang") == "en",
        )
        # materialize the (≤ K-row) aggregate before the temp dir vanishes
        return partial_sum_groupby(
            pruned, ["lang"], {"n_chars": "sum_chars"}, count_as="n_docs"
        ).materialize()
    finally:
        _shutil.rmtree(out, ignore_errors=True)


PRUNED_SQL = """
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents WHERE lang = 'en' GROUP BY lang
"""


def extract_attrib_map(sf_dir: str):
    """The attrib terminal (E5, reference selector.py:786-795): full
    attribute dict of the first matched element, serialized as
    sorted-key JSON for a stable string artifact."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"]).map_batches(
        _doc_html, batch_format="pyarrow"
    )
    return ds.map_batches(
        SelectorExtract(
            specs=[ExtractSpec("div_attrib", "css", "div", "attrib")],
            input_col="page",
            doc_type="html",
        ),
        batch_format="pyarrow",
        batch_size=512,
    ).select_columns(["doc_id", "div_attrib"])


# to_json() JSON-escapes each value (quotes/backslashes/control chars),
# byte-identical to json.dumps(..., ensure_ascii=False) on the Ray side.
ATTRIB_SQL = """
SELECT doc_id,
       '{"data-lang": ' || to_json(lang) || ', "data-source": ' || to_json(source) ||
       ', "id": ' || to_json('d' || doc_id) || '}' AS div_attrib
FROM documents
"""


def _llm_data_prep_entry(sf_dir: str):
    """Capstone funnel, DRIVER-VERIFIED: the SQL-expressible stage
    counts go to the ORACLE verbatim — ``raw_docs`` (count), ``quality_
    filtered`` (the RE2 token-stat + quality expression, the oracle-pass
    ``doc_token_stats`` family), ``exact_distinct`` (count of distinct
    md5 fingerprints over the filtered set, the ``dedup_exact`` anchor),
    and the two crawl stages (the demo crawl is fully deterministic — a
    byte-match contract pinned by 66 tests — so its counts are
    corpus-independent literals).  The non-SQL stages (MinHash dedup,
    langid partitioning, sink receipts) collapse into ``pipeline_ok``:
    monotone funnel, survivors non-empty, written == survivors,
    ≥1 partition."""
    from .llm_prep import llm_data_prep

    funnel = llm_data_prep(sf_dir)
    by = dict(zip(funnel["stage"].to_pylist(), funnel["n"].to_pylist()))
    pipeline_ok = (
        0 < by["near_dup_deduped"] <= by["exact_distinct"]
        and by["written"] == by["near_dup_deduped"]
        and by["partitions"] >= 1
    )
    stages = ["raw_docs", "quality_filtered", "exact_distinct",
              "crawled_images", "image_near_dup_pairs", "pipeline_ok"]
    ns = [by["raw_docs"], by["quality_filtered"], by["exact_distinct"],
          by["crawled_images"], by["image_near_dup_pairs"],
          int(pipeline_ok)]
    return pa.table(
        {"stage": pa.array(stages, pa.string()),
         "n": pa.array(ns, pa.int64())}
    )


def doc_term_df(sf_dir: str, k: int = 20):
    """Inverted-index document frequency: top-``k`` terms by df (ties by
    term).  Scale shape: per-batch (term, doc) distinct + count is an
    exact partial (a doc never spans batches), the shuffle carries one
    (term, df_partial) row per term per block, and the final top-k runs
    a per-block partial top-k before one tiny merge sort — vocabulary
    never sits in one place."""
    pairs = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda t: T.term_doc_tf(t)
        .group_by("term")
        .aggregate([("doc_id", "count")])
        .rename_columns(["term", "df"]),
        batch_format="pyarrow",
    )
    df = partial_sum_groupby(pairs, ["term"], {"df": "df"})

    def block_topk(t: pa.Table) -> pa.Table:
        t = t.sort_by([("df", "descending"), ("term", "ascending")])
        return t.slice(0, k)

    return (
        df.map_batches(block_topk, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
    )


TERMDF_SQL = """
SELECT term, CAST(COUNT(*) AS BIGINT) AS df
FROM (SELECT DISTINCT doc_id, unnest(regexp_extract_all(text, '[a-z]{2,}')) AS term
      FROM documents)
GROUP BY term ORDER BY df DESC, term LIMIT 20
"""


def doc_tfidf_top_term(sf_dir: str, max_broadcast_vocab: int = 5_000_000):
    """Per-document top term by tf·idf (linear idf = N/df — ranking by
    tf/df, which orders identically and keeps both engines in exact
    int64/float64 agreement; ties by term).

    Round-4 shape: the document-frequency table (O(vocabulary), not
    O(corpus)) is gathered WORKER-SIDE from the df aggregate's arrow
    refs — never on the driver — and each scoring actor holds it as a
    term→df dict.  The scoring pass then fuses tokenize + df lookup +
    per-doc top-1 into ONE map_batches kernel: a document is always one
    input row, so its (term, tf) pairs are batch-local and the per-batch
    top-1 is the exact global top-1.  This removes BOTH all-to-all
    shuffles of the old plan (the bigger-than-input pairs⨝df bucket join
    and the grouped top-k) — the only exchange left is the tiny per-term
    df combiner.  Float ratios of int64s this small are exactly ordered
    in double, so the DuckDB window oracle matches hash-for-hash.

    Vocab guard (round 5): the per-actor df dict is O(vocabulary) — fine
    to ~10⁷ distinct terms, not at open-web vocabulary.  When the
    measured vocab exceeds ``max_broadcast_vocab``, the query falls back
    to the fully-shuffled plan (pairs⨝df bucket join + grouped top-1 —
    identical output, pinned by a test that forces the fallback)."""

    def pairs():
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            T.term_doc_tf, batch_format="pyarrow"
        )

    df = partial_sum_groupby(
        pairs().map_batches(
            lambda t: t.group_by("term")
            .aggregate([("doc_id", "count")])
            .rename_columns(["term", "df"]),
            batch_format="pyarrow",
        ),
        ["term"],
        {"df": "df"},
    ).materialize()
    if df.count() > max_broadcast_vocab:
        return _tfidf_top_term_shuffled(pairs, df)
    df_refs = df.to_arrow_refs()

    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("top_term", pa.string()),
         ("tf", pa.int64()), ("df", pa.int64())]
    )

    class TokenizeScoreTop1:
        """Actor-pool kernel: vocabulary gathered once per actor in
        __init__ (plasma refs → one dict), per-doc top-1 per batch."""

        def __init__(self, refs) -> None:
            tabs = [t for t in ray.get(list(refs)) if t is not None and len(t)]
            self.df_map: dict = {}
            for t in tabs:
                self.df_map.update(
                    zip(t["term"].to_pylist(), t["df"].to_pylist())
                )

        def __call__(self, t: pa.Table) -> pa.Table:
            p = T.term_doc_tf(t)
            if len(p) == 0:
                return out_schema.empty_table()
            terms = p["term"].to_pylist()
            dfv = np.fromiter(
                (self.df_map[x] for x in terms), np.int64, len(terms)
            )
            tf = p["tf"].to_numpy(zero_copy_only=False)
            doc = p["doc_id"].to_numpy(zero_copy_only=False)
            r = tf.astype(np.float64) / dfv
            # lexicographic tie-break: np.unique's inverse codes are
            # order-isomorphic to the sorted distinct terms
            _, codes = np.unique(np.asarray(terms, object), return_inverse=True)
            order = np.lexsort((codes, -r, doc))
            d_sorted = doc[order]
            first = np.ones(len(d_sorted), dtype=bool)
            first[1:] = d_sorted[1:] != d_sorted[:-1]
            pick = order[first]
            return pa.table(
                {
                    "doc_id": pa.array(doc[pick], pa.int64()),
                    "top_term": pa.array([terms[i] for i in pick], pa.string()),
                    "tf": pa.array(tf[pick], pa.int64()),
                    "df": pa.array(dfv[pick], pa.int64()),
                }
            )

    class Scorer(TokenizeScoreTop1):
        # closure-captured refs — the vocabulary tables stay in plasma
        # and each actor resolves them locally in __init__
        def __init__(self) -> None:
            super().__init__(df_refs)

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        Scorer,
        concurrency=(1, 8),
        batch_format="pyarrow",
    )


def _tfidf_top_term_shuffled(pairs, df):
    """Open-web-vocabulary fallback for :func:`doc_tfidf_top_term`: the
    pre-round-4 fully-distributed plan — pairs⨝df bucket join on term +
    grouped top-1 — whose state is never O(vocabulary) on any single
    worker.  Slower (two all-to-all exchanges) but unbounded."""
    from ..functions.agg import grouped_topk

    joined = hash_bucket_join(pairs(), df, on="term", buckets=32)

    def ratio(t: pa.Table) -> pa.Table:
        r = pc.divide(
            pc.cast(t["tf"], pa.float64()), pc.cast(t["df"], pa.float64())
        )
        return t.append_column("__r", r)

    top = grouped_topk(
        joined.map_batches(ratio, batch_format="pyarrow"),
        "doc_id",
        ["__r", "term"],
        [False, True],
        k=1,
        num_partitions=16,
    )
    return top.map_batches(
        lambda t: t.select(["doc_id", "term", "tf", "df"]).rename_columns(
            ["doc_id", "top_term", "tf", "df"]
        ),
        batch_format="pyarrow",
    )


TFIDF_SQL = """
WITH pairs AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{2,}')) AS term
        FROM documents)
  GROUP BY doc_id, term
), dfs AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM pairs GROUP BY term
)
SELECT doc_id, term AS top_term, tf, df FROM (
  SELECT p.doc_id, p.term, p.tf, d.df,
         row_number() OVER (
           PARTITION BY p.doc_id
           ORDER BY CAST(p.tf AS DOUBLE) / d.df DESC, p.term
         ) AS rn
  FROM pairs p JOIN dfs d USING (term)
) WHERE rn = 1
"""


_BOOL_TERMS = ("data", "hash", "join")


def doc_boolean_search(sf_dir: str, k: int = 50):
    """Conjunctive inverted-index search: documents containing ALL of
    ``_BOOL_TERMS``, ranked by total tf of the query terms (ties by
    doc_id), top-``k``.  Scale shape: the posting prune happens INSIDE
    each tokenize batch (only query-term postings ever leave a task —
    at 100 TB that's |query| rows per doc, not the vocabulary), the
    per-doc (matched-term count, score) pair is an exact per-batch
    partial (a doc never spans batches) summed by one keyed combiner
    shuffle, the AND is a filter on the matched count, and the top-k is
    a per-block partial sort before one tiny merge."""
    terms = pa.array(list(_BOOL_TERMS))

    def postings(t: pa.Table) -> pa.Table:
        p = T.term_doc_tf(t)
        p = p.filter(pc.is_in(p["term"], value_set=terms))
        g = p.group_by("doc_id").aggregate([("term", "count"), ("tf", "sum")])
        return g.rename_columns(["doc_id", "n_terms", "score"])

    per_doc = partial_sum_groupby(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            postings, batch_format="pyarrow"
        ),
        ["doc_id"],
        {"n_terms": "n_terms", "score": "score"},
    )

    def block_topk(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["n_terms"], len(_BOOL_TERMS)))
        t = t.sort_by([("score", "descending"), ("doc_id", "ascending")])
        return t.slice(0, k).select(["doc_id", "score"])

    return (
        per_doc.map_batches(block_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )


BOOLSEARCH_SQL = """
WITH pairs AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '[a-z]{2,}')) AS term
        FROM documents)
  GROUP BY doc_id, term
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS score
FROM pairs WHERE term IN ('data', 'hash', 'join')
GROUP BY doc_id HAVING COUNT(DISTINCT term) = 3
ORDER BY score DESC, doc_id LIMIT 50
"""


def doc_paragraph_dedup(sf_dir: str):
    """Corpus-wide exact paragraph dedup (the CCNet / C4 preprocessing
    shape): every 16-token paragraph keeps only its first occurrence in
    (doc_id, position) order, docs rebuilt from surviving paragraphs.
    One min-combiner shuffle keyed by paragraph text; the election
    result itself encodes the survivors (packed int64 rank), so there is
    no join-back pass.  See :func:`parsel_ray.functions.dedup.paragraph_dedup`."""
    return D.paragraph_dedup(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        chunk_tokens=16,
        num_partitions=16,
    )


PARA_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS ord
  FROM (SELECT doc_id, string_split(COALESCE(text, ''), ' ') AS l
        FROM documents)
),
chunks AS (
  SELECT doc_id, ord // 16 AS chunk_idx,
         string_agg(tok, ' ' ORDER BY ord) AS chunk
  FROM toks GROUP BY doc_id, ord // 16
),
winners AS (
  SELECT chunk, MIN(doc_id * 1048576 + chunk_idx) AS rank
  FROM chunks GROUP BY chunk
)
SELECT rank // 1048576 AS doc_id,
       string_agg(chunk, ' ' ORDER BY rank % 1048576) AS text_clean,
       CAST(COUNT(*) AS BIGINT) AS n_chunks
FROM winners GROUP BY rank // 1048576
"""


def top3_orders_per_customer(sf_dir: str):
    """Per-group top-k (k=3) via :func:`grouped_topk`: per-batch combiner
    bounds the shuffle at 3 rows per customer per block, coarse hash
    partitions do the final rank — the distributed
    ``row_number() <= 3`` window."""
    from ..functions.agg import grouped_topk

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "o_orderkey": t["o_orderkey"],
                "price_cents": pa.array(_cents(t["o_totalprice"])),
            }
        )

    ds = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"]
    ).map_batches(prep, batch_format="pyarrow")
    return grouped_topk(
        ds,
        "o_custkey",
        ["price_cents", "o_orderkey"],
        [False, True],
        k=3,
        num_partitions=16,
    )


TOP3CUST_SQL = f"""
SELECT o_custkey, o_orderkey, price_cents FROM (
  SELECT o_custkey, o_orderkey,
         {_CENTS_SQL.format(expr='o_totalprice')} AS price_cents,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY {_CENTS_SQL.format(expr='o_totalprice')} DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 3
"""


def events_distinct_users_hll(sf_dir: str):
    """Mergeable HyperLogLog count-distinct (the sketch a 10^10-URL
    frontier would use for seen-URL cardinality): per-batch 16 KiB
    register partials, task-tree merge — values never leave their
    batch.  Rows-only gate with in-kernel certification: the estimate
    is asserted within 3σ (σ = 1.04/√m, p=14 → ~0.8 %) of the exact
    distinct count computed alongside, so a green run certifies the
    bound."""
    from ..functions.sketch import build_hll

    # two passes over the pruned one-column read (streams; no pinned
    # materialization): sketch pass + exact-count certification pass
    hll = build_hll(_read(sf_dir, "events", ["user_id"]), "user_id", p=14)
    est = hll.estimate()
    exact = partial_sum_groupby(
        _read(sf_dir, "events", ["user_id"]), ["user_id"], {}, count_as="n"
    ).count()
    rel_err = abs(est - exact) / max(exact, 1)
    # DRIVER-VERIFIED (round 5): the exact distinct count is the SQL
    # anchor (DuckDB recomputes it) and the 3σ certification rides as a
    # gate column instead of an invisible assert.
    return pa.table(
        {
            "n_distinct_exact": pa.array([exact], pa.int64()),
            "within_3sigma": pa.array(
                [bool(rel_err < 3 * 1.04 / math.sqrt(1 << 14))]
            ),
        }
    )


def doc_heavy_terms(sf_dir: str, phi: float = 0.001, k: int = 4096):
    """Two-pass EXACT heavy hitters over document terms: (1) a mergeable
    Misra-Gries sketch (per-batch exact counts folded into <= k counters,
    task-tree merge) yields every candidate that COULD exceed
    ``phi * total`` — the MG guarantee (est undercounts by at most
    n/(k+1)) makes the candidate set complete for any threshold
    >= n/(k+1), and k is chosen so phi >= 1/(k+1); (2) a broadcast of
    the <= k candidate terms prunes a second counting pass whose keyed
    sum is exact.  Values never sit in one place; the driver holds only
    the k-counter sketch and the final heavy rows."""
    from ..functions.sketch import build_misra_gries
    from ..functions.text import term_counts

    assert phi >= 1.0 / (k + 1), "k too small for the MG guarantee"
    docs = _read(sf_dir, "documents", ["text"])
    mg = build_misra_gries(docs, k, term_counts)
    thr = phi * mg.n
    cand = frozenset(mg.candidates(thr))  # <= k terms, broadcast-size

    def count_candidates(t: pa.Table) -> pa.Table:
        items, ns = term_counts(t)
        keep = np.fromiter((i in cand for i in items), dtype=bool,
                           count=len(items))
        return pa.table(
            {
                "term": pa.array(items[keep].tolist(), pa.string()),
                "n": pa.array(ns[keep], pa.int64()),
            }
        )

    exact = partial_sum_groupby(
        docs.map_batches(count_candidates, batch_format="pyarrow"),
        ["term"],
        {"n": "n"},
    )
    return exact.map_batches(
        lambda b: b.filter(pc.greater(b["n"], thr)), batch_format="pyarrow"
    )


HEAVY_SQL = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(text, '[a-z]{2,}')) AS term
  FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM toks
GROUP BY term HAVING COUNT(*) > 0.001 * (SELECT COUNT(*) FROM toks)
"""


def lineitem_grouped_quantiles(sf_dir: str):
    """Per-group exact quantiles (``quantile_disc`` rank rule) over a
    domain-bounded value column: shuffle state is O(groups x distinct
    values), corpus-size-independent."""
    from ..functions.agg import grouped_quantiles

    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])
    return grouped_quantiles(
        ds, "l_returnflag", "l_quantity", [0.25, 0.5, 0.75]
    )


GROUPQ_SQL = """
SELECT l_returnflag, CAST(q AS DOUBLE) AS q, value FROM (
  SELECT l_returnflag,
         unnest([0.25, 0.5, 0.75]) AS q,
         unnest([quantile_disc(l_quantity, 0.25),
                 quantile_disc(l_quantity, 0.5),
                 quantile_disc(l_quantity, 0.75)]) AS value
  FROM lineitem GROUP BY l_returnflag
)
"""


def warc_extract_roundtrip(sf_dir: str):
    """WARC archive round-trip (the format a real crawl exchanges):
    worker-side tasks serialize each batch of synthesized pages as one
    .warc.gz shard (content-digest names — retries rewrite identical
    bytes); a fresh ``read_warc`` Dataset streams the records back (one
    task per shard, multi-member gzip) and the Selector kernel extracts
    the source values from the HTTP payload BYTES (the reference's
    bytes+encoding entry point).  Oracle-checked: extraction must
    round-trip documents exactly, doc ids recovered from the
    WARC-Target-URI.  Driver never touches page bytes."""
    import tempfile as _tempfile

    from ..sources.warc import read_warc, write_warc_batch

    out = _tempfile.mkdtemp(prefix="warc_corpus_", dir="/tmp")

    def write_shard(t: pa.Table) -> pa.Table:
        pages = _doc_html(t)
        uris = [
            f"http://corpus/doc/{i}" for i in pages["doc_id"].to_pylist()
        ]
        bodies = [
            pg.encode("utf-8") for pg in pages["page"].to_pylist()
        ]
        path = write_warc_batch(out, uris, bodies, compress=True)
        return pa.table(
            {"shard": pa.array([path]), "n": pa.array([len(t)], pa.int64())}
        )

    shards = (
        _read(sf_dir, "documents", ["doc_id", "text", "lang", "source"])
        .map_batches(write_shard, batch_format="pyarrow", batch_size=256)
        .take_all()
    )  # tiny: one (path, count) row per shard
    assert sum(r["n"] for r in shards) > 0

    recs = read_warc(out)
    extracted = recs.map_batches(
        SelectorExtract(
            specs=[
                ExtractSpec("data_lang", "css", "div::attr(data-lang)", "get"),
                ExtractSpec("data_source", "xpath", "//div/@data-source", "get"),
                ExtractSpec("p_text", "css", "p.t::text", "get"),
            ],
            input_col="payload",
            doc_type="html",
        ),
        batch_format="pyarrow",
        batch_size=512,
    )

    def finish(t: pa.Table) -> pa.Table:
        doc_id = pc.cast(
            pc.replace_substring_regex(t["target_uri"], r"^.*/", ""),
            pa.int64(),
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "data_lang": t["data_lang"],
                "data_source": t["data_source"],
                "p_text": t["p_text"],
                "http_status": pc.cast(t["http_status"], pa.int64()),
            }
        )

    return extracted.map_batches(finish, batch_format="pyarrow")


WARC_SQL = """
SELECT doc_id, lang AS data_lang, source AS data_source,
       nullif(text, '') AS p_text, CAST(200 AS BIGINT) AS http_status
FROM documents
"""


def events_user_distinct_by_type(sf_dir: str):
    """COUNT(DISTINCT) per group two ways — a per-group HyperLogLog
    (m-byte register rows shuffle, never values) AND the exact
    distinct count (per-batch distinct-pair combiner -> per-group
    nunique in coarse partitions) — then certifies the sketch within
    3σ per group.  ORACLE-CHECKED certification: the output carries
    (group, exact, within_3sigma); a sketch outside its error bound
    flips the boolean and fails the DuckDB compare."""
    from ..functions.agg import grouped_apply
    from ..functions.sketch import grouped_hll

    def ds():
        return _read(sf_dir, "events", ["event_type", "user_id"])

    est = grouped_hll(ds(), "event_type", "user_id", p=12).to_pandas()

    pairs = ds().map_batches(
        lambda t: t.group_by(["event_type", "user_id"]).aggregate([]),
        batch_format="pyarrow",
    )
    exact = grouped_apply(
        pairs,
        "event_type",
        lambda g: pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_distinct_exact": [int(g["user_id"].nunique())],
            }
        ),
        num_partitions=8,
    ).to_pandas()

    m = exact.merge(est, on="event_type", how="left")
    sigma = 1.04 / math.sqrt(1 << 12)
    m["within_3sigma"] = (
        (m["n_distinct_est"] - m["n_distinct_exact"]).abs()
        / m["n_distinct_exact"].clip(lower=1)
    ) < 3 * sigma
    return pa.table(
        {
            "event_type": pa.array(m["event_type"], pa.string()),
            "n_distinct_exact": pa.array(
                m["n_distinct_exact"], pa.int64()
            ),
            "within_3sigma": pa.array(m["within_3sigma"], pa.bool_()),
        }
    )


DISTINCT_BY_TYPE_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct_exact,
       true AS within_3sigma
FROM events GROUP BY event_type
"""


def image_augment(sf_dir: str):
    """Deterministic training-data augmentation over the crawled image
    corpus (flip/rot90/crop/brightness, parameters content-addressed by
    image_id so retries and re-runs emit identical bytes).  In-kernel
    certification: augmented bytes decode back to the exact transform
    (PSNR >= 40 dB for lossy formats) — ``aug_ok`` must be all-true."""
    from ..crawl.frontier import IMAGE_SCHEMA, run_crawl
    from ..stages.multimodal import AugmentImages

    res = run_crawl(_demo_crawl_cfg())
    t = pa.Table.from_pylist(res.image_rows, schema=IMAGE_SCHEMA)
    ds = rd.from_arrow(t).map_batches(
        AugmentImages(), batch_format="pyarrow", batch_size=64
    )
    out = ds.select_columns(
        ["image_id", "fmt", "aug_w", "aug_h", "aug_op", "aug_ok"]
    )
    tbl = pa.concat_tables(
        out.iter_batches(batch_format="pyarrow")
    ).sort_by("image_id")
    # DRIVER-VERIFIED (round 5): the in-kernel PSNR/exact-transform
    # verification rides as a gate column, and the augmented dims/ops
    # fold into the determinism-contract md5 (parameters are
    # content-addressed by image_id, so re-runs are byte-identical).
    canon = "\n".join(
        f"{i}|{f}|{w}|{h}|{op}" for i, f, w, h, op in zip(
            tbl["image_id"].to_pylist(), tbl["fmt"].to_pylist(),
            tbl["aug_w"].to_pylist(), tbl["aug_h"].to_pylist(),
            tbl["aug_op"].to_pylist()
        )
    )
    return pa.table(
        {
            "n_images": pa.array([len(tbl)], pa.int64()),
            "aug_all_ok": pa.array(
                [bool(len(tbl) and pc.all(tbl["aug_ok"]).as_py())]
            ),
            "rows_md5": pa.array(
                [hashlib.md5(canon.encode()).hexdigest()], pa.string()
            ),
        }
    )


def embedding_pq_knn(sf_dir: str):
    """Product-quantization ANN top-5 (rows-only: approximate) with the
    production two-stage shape — m-byte ADC codes produce a per-query
    shortlist, a second streaming pass re-ranks the shortlist with
    exact cosine.  In-kernel certification: recall@5 vs the exact
    brute-force result must be >= 0.9 (asserted here, so a green run
    certifies it).  Codebooks train on a seeded ``random_sample``;
    query vectors come from a pushdown read; the corpus is read per
    pass, never pinned."""
    import pyarrow.dataset as pads

    from ..functions.similarity import (
        brute_force_topk,
        pq_topk_rerank,
        train_pq,
    )

    def ds():
        return _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    n = ds().count()  # parquet metadata only
    frac = min(1.0, 8192.0 / max(n, 1))
    sample = ds().random_sample(frac, seed=42).take_batch(
        16384, batch_format="pyarrow"
    )
    books = train_pq(_stack_embeddings(sample["embedding"]), m=8, ksub=64)
    qt = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        schema=_clean_schema(f"{sf_dir}/embeddings.parquet",
                             ["vec_id", "embedding"]),
        filter=pads.field("vec_id") < 10,
    ).take_batch(32, batch_format="pyarrow")
    qmat = _stack_embeddings(qt["embedding"])
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0] = 1.0
    qref = ray.put(
        {
            "ids": qt["vec_id"].to_numpy(zero_copy_only=False),
            "mat": qmat / qn[:, None],
        }
    )
    bref = ray.put(books)
    shortlist = max(150, int(0.05 * n))  # >=5% candidate budget
    approx = pq_topk_rerank(ds, qref, bref, k=5, shortlist=shortlist)
    got = approx.select_columns(["query_id", "neighbor_id", "rank"])
    tbl = pa.concat_tables(got.iter_batches(batch_format="pyarrow"))

    exact = brute_force_topk(ds(), qref, k=5).select_columns(
        ["query_id", "neighbor_id"]
    )
    want: dict[int, set] = {}
    for r in exact.take_all():
        want.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    have: dict[int, set] = {}
    for r in tbl.to_pylist():
        have.setdefault(int(r["query_id"]), set()).add(int(r["neighbor_id"]))
    hits = sum(len(want[q] & have.get(q, set())) for q in want)
    recall = hits / sum(len(v) for v in want.values())
    # DRIVER-VERIFIED (round 5): the in-kernel recall@5 ≥ 0.9
    # certification becomes a hard gate column with an SQL-anchored
    # query count; the per-rank rows stay pinned in tests.
    return pa.table(
        {
            "n_queries": pa.array([len(want)], pa.int64()),
            "recall_ok": pa.array([bool(recall >= 0.9)], pa.bool_()),
        }
    )


def jsonl_roundtrip(sf_dir: str):
    """JSONL sink -> source round-trip (the other interchange format
    web-scale text corpora actually use): worker-side ``write_json``
    shards, a fresh ``read_json`` streams them back (one task per
    shard), and a combiner groupby aggregates — values must survive the
    JSON round-trip byte-exactly (unicode text included).  Oracle: the
    same aggregate straight off the parquet."""
    import tempfile as _tempfile

    out = _tempfile.mkdtemp(prefix="docs_jsonl_", dir="/tmp")
    _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"]).write_json(
        out
    )
    back = rd.read_json(out)
    return partial_sum_groupby(
        back.map_batches(
            lambda t: t.append_column(
                "text_chars",
                pc.cast(pc.utf8_length(pc.fill_null(t["text"], "")), pa.int64()),
            ),
            batch_format="pyarrow",
        ),
        ["lang"],
        {"n_chars": "sum_nchars", "text_chars": "sum_text_chars"},
        count_as="n_docs",
    )


JSONL_SQL = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_nchars,
       CAST(SUM(length(coalesce(text, ''))) AS BIGINT) AS sum_text_chars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY lang
"""


def events_value_quantiles_by_type(sf_dir: str):
    """Per-group quantiles over an UNBOUNDED double domain via per-group
    t-digests (O(delta) state per group — the histogram trick of
    ``lineitem_grouped_quantiles`` would shuffle every distinct value
    here).  ORACLE-CHECKED certification, fully distributed: the tiny
    (group, q, est) triple set broadcasts into one combiner pass that
    counts values <= est per group; the realized rank must sit within
    1.5% of q (t-digest delta=200 bound), and the boolean is part of
    the DuckDB compare."""
    from ..functions.sketch import TDigest, grouped_tdigest

    qs = [0.25, 0.5, 0.75]

    def ds():
        return _read(sf_dir, "events", ["event_type", "value"])

    digs = grouped_tdigest(ds(), "event_type", "value").take_all()
    trip = [
        (r["event_type"], q,
         TDigest.from_bytes(r["__digest"]).quantile(q))
        for r in digs
        for q in qs
    ]  # |groups| x |qs| rows — driver-scale by construction

    ests = {g: {} for g, _, _ in trip}
    for g, q, v in trip:
        ests[g][q] = v
    thresholds = {g: np.array([d[q] for q in qs]) for g, d in ests.items()}

    def rank_partial(t: pa.Table) -> pa.Table:
        gs, qout, le, tot = [], [], [], []
        codes, uniques = pd.factorize(
            pd.Series(t["event_type"].to_numpy(zero_copy_only=False)),
            sort=False,
        )
        vals = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        for i, g in enumerate(uniques):
            seg = vals[codes == i]
            seg = seg[~np.isnan(seg)]
            th = thresholds.get(g)
            if th is None:
                continue
            for q, bound in zip(qs, th):
                gs.append(g)
                qout.append(q)
                le.append(int((seg <= bound).sum()))
                tot.append(len(seg))
        return pa.table(
            {
                "event_type": pa.array(gs, pa.string()),
                "q": pa.array(qout, pa.float64()),
                "n_le": pa.array(le, pa.int64()),
                "n": pa.array(tot, pa.int64()),
            }
        )

    ranks = partial_sum_groupby(
        ds().map_batches(rank_partial, batch_format="pyarrow"),
        ["event_type", "q"],
        {"n_le": "n_le", "n": "n"},
    ).to_pandas()
    ranks["rank_ok"] = (
        (ranks["n_le"] / ranks["n"] - ranks["q"]).abs() <= 0.015
    )
    ranks = ranks.sort_values(["event_type", "q"]).reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(ranks["event_type"], pa.string()),
            "q": pa.array(ranks["q"], pa.float64()),
            "rank_ok": pa.array(ranks["rank_ok"], pa.bool_()),
        }
    )


TDIGEST_BY_TYPE_SQL = """
SELECT event_type, q, true AS rank_ok
FROM (SELECT DISTINCT event_type FROM events),
     (SELECT unnest([0.25, 0.5, 0.75]) AS q)
"""


def stratified_sample_orders(sf_dir: str, per_group: int = 50):
    """EXACTLY-N-per-stratum deterministic sample: rank rows inside each
    stratum by md5(key) (the same expression the oracle evaluates — the
    selection is reproducible across engines, runs and parallelism) and
    keep the first N via the distributed window top-k.  The per-batch
    combiner bounds the shuffle at N rows per stratum per block — the
    standard way to draw a balanced training subset from a skewed
    100 TB corpus without a full sort."""
    import hashlib

    from ..functions.agg import grouped_topk

    def keyed(t: pa.Table) -> pa.Table:
        h = [
            hashlib.md5(str(k).encode()).hexdigest()
            for k in t["o_orderkey"].to_pylist()
        ]
        return pa.table(
            {
                "o_orderpriority": t["o_orderpriority"],
                "o_orderkey": t["o_orderkey"],
                "__h": pa.array(h, pa.string()),
            }
        )

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    out = grouped_topk(
        ds,
        "o_orderpriority",
        ["__h", "o_orderkey"],
        [True, True],
        k=per_group,
        num_partitions=8,
    )
    return out.map_batches(
        lambda t: t.select(["o_orderpriority", "o_orderkey"]),
        batch_format="pyarrow",
    )


STRATIFIED_SQL = """
SELECT o_orderpriority, o_orderkey FROM (
  SELECT o_orderpriority, o_orderkey,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 50
"""


def events_type_pivot(sf_dir: str):
    """Pivot/reshape: per-user event counts spread across one column per
    event type (conditional aggregation).  Vectorized: one boolean mask
    + combiner sum per type inside map_batches; the shuffle carries one
    row per user per block."""
    types = ["click", "error", "purchase", "signup", "view"]

    def widen(t: pa.Table) -> pa.Table:
        cols = {"user_id": t["user_id"]}
        for ty in types:
            cols[f"n_{ty}"] = pc.cast(
                pc.equal(t["event_type"], ty), pa.int64()
            )
        return pa.table(cols)

    ds = _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
        widen, batch_format="pyarrow"
    )
    return partial_sum_groupby(
        ds, ["user_id"], {f"n_{ty}": f"n_{ty}" for ty in types}
    )


PIVOT_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def customers_without_orders(sf_dir: str):
    """Distributed ANTI-join (NOT IN at scale) — customers with no
    URGENT order: the right side filters early and reduces to one
    distinct-key marker row per urgent-ordering customer (combiner
    groupby — the shuffle carries keys, not orders), a LEFT bucket join
    attaches the marker, and null-marker rows survive.  Exact — unlike
    a Bloom prefilter, which can only serve the SEMI direction (false
    positives would silently DELETE rows here)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    marks = partial_sum_groupby(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        {},
        count_as="__m",
    )
    joined = hash_bucket_join(cust, marks, on="c_custkey", how="left",
                              buckets=16)
    return joined.map_batches(
        lambda t: t.filter(pc.is_null(t["__m"])).select(
            ["c_custkey", "c_name"]
        ),
        batch_format="pyarrow",
    )


ANTI_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
      (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
"""


def events_lag_delta(sf_dir: str):
    """Window lag(): per-user milliseconds since the previous event in
    event-time order — partition by key, order within the partition,
    vectorized shift.  Same coarse-partition shape as the running
    count; total order pinned by (ts, event_id)."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).copy()
        # DuckDB date_diff counts BOUNDARY CROSSINGS: floor each ts to
        # the millisecond, then subtract.  float64 so the first event's
        # null round-trips as NaN like the oracle's CAST(... AS DOUBLE)
        ems = g["ts"].astype("int64") // 1000  # us -> whole ms
        g["ms_since_prev"] = ems.diff().astype("float64")
        return g[["user_id", "event_id", "ms_since_prev"]]

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id"]),
        "user_id",
        run,
        num_partitions=16,
    )


LAG_SQL = """
SELECT user_id, event_id,
       CAST(date_diff('millisecond',
                      lag(ts) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id),
                      ts) AS DOUBLE) AS ms_since_prev
FROM events
"""


def events_range_window(sf_dir: str):
    """RANGE-frame window: per event, the sum and count of the same
    user's events in the trailing ONE HOUR (``RANGE BETWEEN INTERVAL 1
    HOUR PRECEDING AND CURRENT ROW`` — equal-timestamp peers included,
    per SQL RANGE semantics).  Per user-partition: one sort, then two
    vectorized ``searchsorted`` bounds over the timestamp array and a
    prefix-sum difference — O(n log n) per group, no per-row loop.
    Measures cross the boundary as exact integer cents."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).copy()
        ts = g["ts"].astype("int64").to_numpy()  # microseconds
        cents = _cents(g["value"].to_numpy())
        csum = np.concatenate([[0], np.cumsum(cents)])
        hour = 3_600_000_000
        # frame = all rows with ts in [t-1h, t]; ties share the frame
        lo = np.searchsorted(ts, ts - hour, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        g["win_cents"] = csum[hi] - csum[lo]
        g["win_n"] = (hi - lo).astype(np.int64)
        return g[["user_id", "event_id", "win_cents", "win_n"]]

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        "user_id",
        run,
        num_partitions=16,
    )


RANGEWIN_SQL = f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_SQL.format(expr='value')}) OVER w AS BIGINT) AS win_cents,
       CAST(COUNT(*) OVER w AS BIGINT) AS win_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
"""


def events_hour_gaps(sf_dir: str):
    """Gaps-and-islands aggregate: per user, how many whole hours inside
    their [first, last] activity span saw NO event.  Needs only three
    algebraic aggregates over distinct hours — min, max, distinct-count
    — so the shuffle carries one row per (user, hour) per block and the
    hour series is never materialized (the generate_series oracle is
    the quadratic formulation; this is the O(events) one)."""

    def hours(t: pa.Table) -> pa.Table:
        h = pc.floor(
            pc.divide(
                pc.cast(t["ts"], pa.int64()), pa.scalar(3_600_000_000, pa.int64())
            )
        )
        out = pa.table(
            {"user_id": t["user_id"], "hour": pc.cast(h, pa.int64())}
        )
        return out.group_by(["user_id", "hour"]).aggregate([])

    per_uh = (
        _read(sf_dir, "events", ["user_id", "ts"])
        .map_batches(hours, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .count()
        .drop_columns(["count()"])
    )
    agg = partial_agg_groupby(
        per_uh,
        ["user_id"],
        [("hour", "min", "h0"), ("hour", "max", "h1")],
        count_as="n_active",
    )

    def finish(t: pa.Table) -> pa.Table:
        span = pc.add(pc.subtract(t["h1"], t["h0"]), pa.scalar(1, pa.int64()))
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_hours_span": span,
                "n_hours_active": pc.cast(t["n_active"], pa.int64()),
                "n_hours_missing": pc.subtract(
                    span, pc.cast(t["n_active"], pa.int64())
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("user_id")


HOURGAP_SQL = """
WITH uh AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour
  FROM events
)
SELECT user_id,
       MAX(hour) - MIN(hour) + 1 AS n_hours_span,
       CAST(COUNT(*) AS BIGINT) AS n_hours_active,
       MAX(hour) - MIN(hour) + 1 - COUNT(*) AS n_hours_missing
FROM uh GROUP BY user_id ORDER BY user_id
"""


def events_value_mad(sf_dir: str):
    """Per-group median absolute deviation (robust spread): two exact
    distributed median passes over the bounded integer-cents domain.
    Pass 1's result is |groups| rows (driver-scale by construction) and
    broadcasts into pass 2's deviation kernel via a searchsorted lookup
    — the only shuffles are the two domain-sized value histograms."""
    from ..functions.agg import grouped_quantiles

    def cents_tbl(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(_cents(t["value"].to_numpy(zero_copy_only=False))),
            }
        )

    def ds():
        return _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            cents_tbl, batch_format="pyarrow"
        )

    med = {
        r["event_type"]: int(r["value"])
        for r in grouped_quantiles(ds(), "event_type", "cents", [0.5]).take_all()
    }
    keys = np.array(sorted(med), dtype=object)
    meds = np.array([med[k] for k in keys], dtype=np.int64)

    def dev(t: pa.Table) -> pa.Table:
        g = t["event_type"].to_numpy(zero_copy_only=False)
        m = meds[np.searchsorted(keys, g)]
        return pa.table(
            {
                "event_type": t["event_type"],
                "adev": pa.array(
                    np.abs(t["cents"].to_numpy(zero_copy_only=False) - m)
                ),
            }
        )

    out = grouped_quantiles(
        ds().map_batches(dev, batch_format="pyarrow"),
        "event_type", "adev", [0.5],
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "event_type": t["event_type"],
                "mad_cents": pc.cast(t["value"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).sort("event_type")


MAD_SQL = f"""
WITH c AS (
  SELECT event_type, {_CENTS_SQL.format(expr='value')} AS cents FROM events
), m AS (
  SELECT event_type, quantile_disc(cents, 0.5) AS med FROM c GROUP BY event_type
)
SELECT c.event_type,
       CAST(quantile_disc(abs(c.cents - m.med), 0.5) AS BIGINT) AS mad_cents
FROM c JOIN m USING (event_type)
GROUP BY c.event_type ORDER BY c.event_type
"""


def events_moving_sum(sf_dir: str):
    """ROWS-frame window (``ROWS BETWEEN 3 PRECEDING AND CURRENT ROW``):
    per event, the sum of the same user's last 4 event values in
    (ts, event_id) order.  Per partition: one sort + one prefix-sum
    difference — O(n log n), no per-row loop.  Complements
    :func:`events_range_window` (time-based frame)."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).copy()
        cents = _cents(g["value"].to_numpy())
        csum = np.concatenate([[0], np.cumsum(cents)])
        idx = np.arange(len(g))
        lo = np.maximum(idx - 3, 0)
        g["win4_cents"] = csum[idx + 1] - csum[lo]
        return g[["user_id", "event_id", "win4_cents"]]

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        "user_id",
        run,
        num_partitions=16,
    )


MOVSUM_SQL = f"""
SELECT user_id, event_id,
       CAST(SUM({_CENTS_SQL.format(expr='value')}) OVER w AS BIGINT) AS win4_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
"""


def events_type_unpivot(sf_dir: str):
    """UNPIVOT / melt: the per-user pivoted type counts reshaped back to
    long form ``(user_id, event_type, n)``, zero cells dropped.  The
    melt is a per-batch concat of K column slices — no shuffle beyond
    the pivot's own combiner groupby."""
    types = ["click", "error", "purchase", "signup", "view"]
    wide = events_type_pivot(sf_dir)

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for ty in types:
            sub = pa.table(
                {
                    "user_id": t["user_id"],
                    "event_type": pa.array([ty] * len(t), pa.string()),
                    "n": pc.cast(t[f"n_{ty}"], pa.int64()),
                }
            )
            parts.append(sub.filter(pc.greater(sub["n"], 0)))
        return pa.concat_tables(parts)

    return wide.map_batches(melt, batch_format="pyarrow")


UNPIVOT_SQL = """
SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY user_id, event_type
"""


def docs_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP as a union of combiner groupbys: counts
    by (lang, source), by (lang), and the grand total — each level its
    own partial-aggregated shuffle, the union is three tiny Datasets.
    At scale the finer level feeds the coarser ones (re-aggregation of
    partials), which is exactly what the per-level combiner does."""
    base = _read(sf_dir, "documents", ["lang", "source"])
    fine = partial_sum_groupby(
        base, ["lang", "source"], {}, count_as="n"
    ).materialize()  # one row per (lang, source) — group-domain-sized,
    # NOT corpus-sized; three consumers below must not re-scan documents
    mid = partial_sum_groupby(
        fine,
        ["lang"],
        {"n": "n"},
    ).map_batches(
        lambda t: t.append_column(
            "source", pa.array([None] * len(t), pa.string())
        ).select(["lang", "source", "n"]),
        batch_format="pyarrow",
    )
    total = pa.table(
        {
            "lang": pa.array([None], pa.string()),
            "source": pa.array([None], pa.string()),
            "n": pa.array(
                [sum(r["n"] for r in fine.select_columns(["n"]).take_all())],
                pa.int64(),
            ),
        }
    )
    fine = fine.map_batches(
        lambda t: t.select(["lang", "source", "n"]), batch_format="pyarrow"
    )
    return fine.union(mid).union(rd.from_arrow(total))


ROLLUP_SQL = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY ROLLUP (lang, source)
"""


def sitemap_urlset_extract(sf_dir: str):
    """Sitemap-protocol XML (the crawl seed-expansion format) through
    the DISTRIBUTED namespaced-XML path: each batch of documents
    becomes one urlset sitemap (proper sitemaps.org namespace), and
    ``SelectorExtract(namespaces=...)`` — the reference's
    register_namespace lifted to the actor-pool stage — pulls loc /
    lastmod / priority back out per <url> entry.  Oracle: the values
    reconstruct straight from the documents table.  (Sibling of
    ``sitemap_extract``, which round-trips per-host sitemaps through
    ``grouped_apply`` + raw Selector instead of the actor-pool stage.)"""

    def build(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        chars = t["n_chars"].to_pylist()
        entries = "".join(
            f"<url><loc>http://corpus/doc/{i}</loc>"
            f"<lastmod>2026-01-{(i % 28) + 1:02d}</lastmod>"
            f"<priority>0.{(c or 0) % 10}</priority></url>"
            for i, c in zip(ids, chars)
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + entries
            + "</urlset>"
        )
        return pa.table({"sitemap": pa.array([xml], pa.string())})

    maps = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        build, batch_format="pyarrow", batch_size=256
    )
    per_url = maps.map_batches(
        SelectorExtract(
            specs=[
                ExtractSpec("loc", "xpath", "//sm:url/sm:loc/text()",
                            "getall"),
                ExtractSpec("lastmod", "xpath",
                            "//sm:url/sm:lastmod/text()", "getall"),
                ExtractSpec("priority", "xpath",
                            "//sm:url/sm:priority/text()", "getall"),
            ],
            input_col="sitemap",
            doc_type="xml",
            namespaces={"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"},
        ),
        batch_format="pyarrow",
        batch_size=64,
    )

    def explode(t: pa.Table) -> pa.Table:
        loc = pc.list_flatten(t["loc"])
        return pa.table(
            {
                "doc_id": pc.cast(
                    pc.replace_substring_regex(loc, r"^.*/", ""), pa.int64()
                ),
                "loc": loc,
                "lastmod": pc.list_flatten(t["lastmod"]),
                "priority": pc.list_flatten(t["priority"]),
            }
        )

    return per_url.map_batches(explode, batch_format="pyarrow")


SITEMAP_URLSET_SQL = """
SELECT doc_id,
       'http://corpus/doc/' || CAST(doc_id AS VARCHAR) AS loc,
       '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
       '0.' || CAST(coalesce(n_chars, 0) % 10 AS VARCHAR) AS priority
FROM documents
"""


def events_forward_fill(sf_dir: str):
    """Per-key forward fill (time-series gap fill): purchase rows carry
    a value, other rows inherit the latest preceding purchase value
    within their user's event-time order — partition by key, order
    inside the partition, vectorized pandas ffill.  The distributed
    last_value(... IGNORE NULLS) window."""

    def prep(t: pa.Table) -> pa.Table:
        v = pc.if_else(
            pc.equal(t["event_type"], "purchase"),
            t["value"],
            pa.nulls(len(t), pa.float64()),
        )
        return pa.table(
            {
                "user_id": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "pv": v,
            }
        )

    def fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).copy()
        g["last_purchase_value"] = g["pv"].ffill()
        return g[["user_id", "event_id", "last_purchase_value"]]

    ds = _read(
        sf_dir, "events", ["user_id", "ts", "event_id", "event_type", "value"]
    ).map_batches(prep, batch_format="pyarrow")
    return grouped_apply(ds, "user_id", fill, num_partitions=16)


FFILL_SQL = """
SELECT user_id, event_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END
                  IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS last_purchase_value
FROM events
"""


def lineitem_profile(sf_dir: str):
    """Data profiling (the prep-pipeline health check): per-column row
    count / null count / min / max / sum in ONE pass — each batch emits
    one partial row per column (melted), a tiny keyed merge finishes.
    Money columns profile in exact integer cents."""
    from ray.data.aggregate import Max, Min, Sum

    cols = ["l_quantity", "l_extendedprice", "l_discount"]

    def partial(t: pa.Table) -> pa.Table:
        names, ns, nulls, mins, maxs, sums = [], [], [], [], [], []
        for c in cols:
            v = _cents(t[c])
            valid = v[~np.isnan(t[c].to_numpy(zero_copy_only=False))] if t[
                c
            ].null_count else v
            names.append(c)
            ns.append(len(t))
            nulls.append(t[c].null_count)
            mins.append(int(valid.min()) if len(valid) else None)
            maxs.append(int(valid.max()) if len(valid) else None)
            sums.append(int(valid.sum()) if len(valid) else 0)
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "n_null": pa.array(nulls, pa.int64()),
                "min_cents": pa.array(mins, pa.int64()),
                "max_cents": pa.array(maxs, pa.int64()),
                "sum_cents": pa.array(sums, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "lineitem", cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_null", alias_name="n_null"),
            Min("min_cents", alias_name="min_cents"),
            Max("max_cents", alias_name="max_cents"),
            Sum("sum_cents", alias_name="sum_cents"),
        )
    )


_PROFILE_ONE = """
SELECT '{c}' AS "column", CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
       MIN({cents}) AS min_cents, MAX({cents}) AS max_cents,
       CAST(SUM({cents}) AS BIGINT) AS sum_cents
FROM lineitem
"""

PROFILE_SQL = " UNION ALL ".join(
    _PROFILE_ONE.format(c=c, cents=_CENTS_SQL.format(expr=c))
    for c in ("l_quantity", "l_extendedprice", "l_discount")
)


def events_funnel(sf_dir: str):
    """Funnel analysis (signup -> view -> click -> purchase), the
    standard product-analytics query: per-user MIN event time per step
    via one conditional-min combiner pass (the shuffle carries one row
    per user per batch, never raw events), then a vectorized per-user
    strict-ordering check and a 4-row melt.  Funnel metric: a user
    completes step k when min-ts of every earlier step strictly
    precedes min-ts of step k."""
    steps = ["signup", "view", "click", "purchase"]

    def widen(t: pa.Table) -> pa.Table:
        ts_us = pc.cast(t["ts"], pa.int64())
        cols = {"user_id": t["user_id"]}
        for s in steps:
            cols[f"t_{s}"] = pc.if_else(
                pc.equal(t["event_type"], s), ts_us,
                pa.nulls(len(t), pa.int64()),
            )
        return pa.table(cols)

    per_user = partial_agg_groupby(
        _read(sf_dir, "events", ["user_id", "ts", "event_type"]).map_batches(
            widen, batch_format="pyarrow"
        ),
        ["user_id"],
        [(f"t_{s}", "min", f"t_{s}") for s in steps],
    )

    def count_steps(t: pa.Table) -> pa.Table:
        # an all-null min over a block arrives as Arrow `null` type —
        # pin every step column to int64 before comparing
        col = {
            s: pc.cast(t[f"t_{s}"], pa.int64()) for s in steps
        }
        ok = pc.is_valid(col["signup"])
        outs = [pc.sum(pc.cast(ok, pa.int64())).as_py() or 0]
        for prev, cur in zip(steps, steps[1:]):
            ok = pc.and_kleene(
                ok,
                pc.fill_null(pc.greater(col[cur], col[prev]), False),
            )
            outs.append(pc.sum(pc.cast(ok, pa.int64())).as_py() or 0)
        return pa.table(
            {
                "step": pa.array([1, 2, 3, 4], pa.int64()),
                "n_users": pa.array(outs, pa.int64()),
            }
        )

    return partial_sum_groupby(
        per_user.map_batches(count_steps, batch_format="pyarrow"),
        ["step"],
        {"n_users": "n_users"},
    )


FUNNEL_SQL = """
WITH m AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS t1,
         MIN(CASE WHEN event_type = 'view'     THEN ts END) AS t2,
         MIN(CASE WHEN event_type = 'click'    THEN ts END) AS t3,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t4
  FROM events GROUP BY user_id)
SELECT 1 AS step, CAST(COUNT(*) FILTER (t1 IS NOT NULL) AS BIGINT) AS n_users FROM m
UNION ALL
SELECT 2, CAST(COUNT(*) FILTER (t1 IS NOT NULL AND t2 > t1) AS BIGINT) FROM m
UNION ALL
SELECT 3, CAST(COUNT(*) FILTER (t1 IS NOT NULL AND t2 > t1 AND t3 > t2) AS BIGINT) FROM m
UNION ALL
SELECT 4, CAST(COUNT(*) FILTER (t1 IS NOT NULL AND t2 > t1 AND t3 > t2
                                AND t4 > t3) AS BIGINT) FROM m
"""


def lineitem_corr(sf_dir: str):
    """Pearson correlation per group from EXACT distributed integer
    moments: each batch emits per-returnflag (n, Σx, Σy, Σxy, Σx², Σy²)
    as int64 — x = quantity (integral), y = round(extendedprice) in
    whole currency units so Σy² stays inside int64 at any tested scale —
    then one tiny keyed merge and a final double formula applied to the
    exact integers.  The oracle computes corr from the SAME integer
    moments with the SAME double expression shape, so the float64
    output is bit-identical (IEEE ops on identical operands)."""

    def partial(t: pa.Table) -> pa.Table:
        x = np.floor(
            t["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) + 0.5
        ).astype(np.int64)
        # pyarrow group_by sums int64 EXACTLY — np.bincount's float64
        # weight accumulation would round partials past 2^53 (a ~5M-row
        # block of y^2 ~ 1e10 already exceeds it), silently breaking
        # the exact-moments contract at scale
        moments = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "sx": pa.array(x, pa.int64()),
                "sy": pa.array(y, pa.int64()),
                "sxy": pa.array(x * y, pa.int64()),
                "sxx": pa.array(x * x, pa.int64()),
                "syy": pa.array(y * y, pa.int64()),
            }
        )
        out = moments.group_by(["l_returnflag"]).aggregate(
            [("sx", "sum"), ("sy", "sum"), ("sxy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ([], "count_all")]
        )
        return out.rename_columns(
            ["l_returnflag", "sx", "sy", "sxy", "sxx", "syy", "n"]
        )

    merged = partial_sum_groupby(
        _read(
            sf_dir, "lineitem",
            ["l_returnflag", "l_quantity", "l_extendedprice"],
        ).map_batches(partial, batch_format="pyarrow"),
        ["l_returnflag"],
        {c: c for c in ["n", "sx", "sy", "sxy", "sxx", "syy"]},
    )

    def finalize(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = t["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = t["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = t["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = t["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = t["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        corr = (n * sxy - sx * sy) / (
            np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        )
        return t.append_column("corr", pa.array(corr, pa.float64()))

    return merged.map_batches(finalize, batch_format="pyarrow")


CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM (SELECT l_returnflag,
               CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
               CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS y
        FROM lineitem)
  GROUP BY l_returnflag)
SELECT l_returnflag, n, sx, sy, sxy, sxx, syy,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
FROM m
"""


def price_quantiles_cont(sf_dir: str):
    """Interpolated quantiles (DuckDB ``quantile_cont`` / numpy
    'linear'): reuse the exact O(distinct-values) value-histogram
    shuffle, then interpolate at position (n-1)·q between adjacent
    order statistics.  With dyadic q (.25/.5/.75) and integer-cent
    values the interpolation ``lo + (hi - lo) * frac`` is EXACT in
    float64, so the double output hash-matches the oracle bit-for-bit
    (verified against quantile_cont empirically)."""
    from ..functions.agg import _exact_quantiles

    ds = _read(sf_dir, "orders", ["o_totalprice"]).map_batches(
        lambda t: pa.table({"cents": pa.array(_cents(t["o_totalprice"]))}),
        batch_format="pyarrow",
    )
    qs = [0.25, 0.5, 0.75]
    _, vals, cum = _exact_quantiles(ds, "cents", qs, return_hist=True)
    n = int(cum[-1])

    def value_at(j: int) -> int:  # j: 0-indexed order statistic
        return int(vals[int(np.searchsorted(cum, j + 1, side="left"))])

    out = []
    for q in qs:
        pos = (n - 1) * q
        j = int(math.floor(pos))
        lo, hi = value_at(j), value_at(min(j + 1, n - 1))
        out.append(lo + (hi - lo) * (pos - j))
    return pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(out, pa.float64()),
        }
    )


QCONT_SQL = """
WITH c AS (SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           FROM orders)
SELECT 0.25 AS q, quantile_cont(cents, 0.25) AS value FROM c
UNION ALL SELECT 0.50, quantile_cont(cents, 0.50) FROM c
UNION ALL SELECT 0.75, quantile_cont(cents, 0.75) FROM c
"""


def docs_cube(sf_dir: str):
    """CUBE (lang, source): all four grouping sets from ONE
    group-domain-sized materialized fine aggregate — (lang, source),
    (lang), (source), and the grand total each re-aggregate the fine
    partials, so documents is scanned exactly once regardless of how
    many grouping sets the cube expands to."""
    base = _read(sf_dir, "documents", ["lang", "source"])
    fine = partial_sum_groupby(
        base, ["lang", "source"], {}, count_as="n"
    ).materialize()  # O(|lang| x |source|) rows

    by_lang = partial_sum_groupby(fine, ["lang"], {"n": "n"}).map_batches(
        lambda t: t.append_column(
            "source", pa.nulls(len(t), pa.string())
        ).select(["lang", "source", "n"]),
        batch_format="pyarrow",
    )
    by_source = partial_sum_groupby(
        fine, ["source"], {"n": "n"}
    ).map_batches(
        lambda t: t.append_column(
            "lang", pa.nulls(len(t), pa.string())
        ).select(["lang", "source", "n"]),
        batch_format="pyarrow",
    )
    total = pa.table(
        {
            "lang": pa.array([None], pa.string()),
            "source": pa.array([None], pa.string()),
            "n": pa.array(
                [sum(r["n"] for r in fine.select_columns(["n"]).take_all())],
                pa.int64(),
            ),
        }
    )
    fine_sel = fine.map_batches(
        lambda t: t.select(["lang", "source", "n"]), batch_format="pyarrow"
    )
    return fine_sel.union(by_lang).union(by_source).union(
        rd.from_arrow(total)
    )


def docs_grouping_sets(sf_dir: str):
    """GROUPING SETS ((lang, source), (lang), ()) with an explicit
    GROUPING() bitmask — the arbitrary-sets member of the CUBE/ROLLUP
    family.  The ``gid`` column is what disambiguates a genuinely-NULL
    key from a rolled-up one.  Same one-scan shape as docs_cube: every
    set re-aggregates the materialized group-domain-sized fine
    aggregate."""
    base = _read(sf_dir, "documents", ["lang", "source", "n_chars"])
    fine = partial_sum_groupby(
        base, ["lang", "source"], {"n_chars": "chars"}, count_as="n"
    ).materialize()

    def with_gid(t: pa.Table, gid: int) -> pa.Table:
        return t.append_column(
            "gid", pa.array([gid] * len(t), pa.int64())
        ).select(["lang", "source", "gid", "chars", "n"])

    set0 = fine.map_batches(lambda t: with_gid(t, 0),
                            batch_format="pyarrow")
    set1 = partial_sum_groupby(
        fine, ["lang"], {"chars": "chars", "n": "n"}
    ).map_batches(
        lambda t: with_gid(
            t.append_column("source", pa.nulls(len(t), pa.string())), 1
        ),
        batch_format="pyarrow",
    )
    rows = fine.select_columns(["chars", "n"]).take_all()
    total = pa.table(
        {
            "lang": pa.array([None], pa.string()),
            "source": pa.array([None], pa.string()),
            "gid": pa.array([3], pa.int64()),
            "chars": pa.array([sum(r["chars"] for r in rows)], pa.int64()),
            "n": pa.array([sum(r["n"] for r in rows)], pa.int64()),
        }
    )
    return set0.union(set1).union(rd.from_arrow(total))


GSETS_SQL = """
SELECT lang, source, CAST(GROUPING(lang, source) AS BIGINT) AS gid,
       CAST(SUM(n_chars) AS BIGINT) AS chars,
       CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY GROUPING SETS ((lang, source), (lang), ())
"""


CUBE_SQL = """
SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
FROM documents GROUP BY CUBE (lang, source)
"""


def events_intersect_users(sf_dir: str):
    """Set intersection (INTERSECT) without materializing either
    distinct set: one conditional-count combiner pass per side fused
    into a single per-user shuffle row, keep users present on both
    sides.  The all-to-all carries one row per user per batch."""

    def widen(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "a": pc.cast(pc.equal(t["event_type"], "click"), pa.int64()),
                "b": pc.cast(
                    pc.equal(t["event_type"], "purchase"), pa.int64()
                ),
            }
        )

    per_user = partial_sum_groupby(
        _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            widen, batch_format="pyarrow"
        ),
        ["user_id"],
        {"a": "a", "b": "b"},
    )
    return per_user.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["a"], 0), pc.greater(t["b"], 0))
        ).select(["user_id"]),
        batch_format="pyarrow",
    )


INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def recrawl_priority(sf_dir: str, top_k: int = 50):
    """Recrawl scheduling from fetch history — the frontier-side
    operator that decides WHICH known URLs to refetch next.  Events
    replay as a fetch log (user_id = url, ts = fetch time, props.k =
    content fingerprint); per url the change count is fingerprint ≠
    previous fingerprint in fetch order (the integerized
    Cho/Garcia-Molina change-rate signal) and the refetch priority is
    ``age_hours_since_last_fetch × (changes + 1)`` — hot pages that
    haven't been seen recently float to the top.  Scale shape: one
    ``grouped_apply`` coarse-partition shuffle co-locates each url's
    history; the per-url scan is a vectorized shift-compare, and only
    one row per url reaches the tiny top-k sort."""
    horizon_us = np.datetime64("2025-01-01", "us").astype(np.int64)

    def extract(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(
            pc.fill_null(t["props"], ""), r'"k":\s*(?P<k>-?\d+)'
        )
        return pa.table(
            {
                "url_id": t["user_id"],
                "event_id": t["event_id"],
                "ts": t["ts"],
                "fp": pc.cast(pc.struct_field(st, "k"), pa.int64()),
            }
        )

    log = _read(sf_dir, "events",
                ["event_id", "ts", "user_id", "props"]) \
        .map_batches(extract, batch_format="pyarrow")

    def per_url(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        fp = g["fp"].to_numpy()
        n_changes = int((fp[1:] != fp[:-1]).sum()) if len(fp) > 1 else 0
        last_us = g["ts"].to_numpy().astype("datetime64[us]") \
            .astype(np.int64).max()
        age_h = int((horizon_us - last_us) // 3_600_000_000)
        return pd.DataFrame(
            {
                "url_id": [int(g["url_id"].iloc[0])],
                "n_fetches": [len(g)],
                "n_changes": [n_changes],
                "priority": [age_h * (n_changes + 1)],
            }
        )

    per = grouped_apply(log, ["url_id"], per_url, num_partitions=32)
    return per.sort(["priority", "url_id"], descending=[True, False]) \
        .limit(top_k)


RECRAWL_SQL = """
WITH fetches AS (
  SELECT user_id AS url_id, ts, event_id,
         CAST(json_extract(props, '$.k') AS BIGINT) AS fp
  FROM events),
scans AS (
  SELECT url_id, fp, ts,
         LAG(fp) OVER (PARTITION BY url_id ORDER BY ts, event_id) AS prev
  FROM fetches),
per_url AS (
  SELECT url_id,
         CAST(COUNT(*) AS BIGINT) AS n_fetches,
         CAST(SUM(CASE WHEN prev IS NOT NULL AND fp <> prev
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
         MAX(ts) AS last_ts
  FROM scans GROUP BY url_id)
SELECT url_id, n_fetches, n_changes,
       ((epoch_us(TIMESTAMP '2025-01-01') - epoch_us(last_ts))
        // 3600000000) * (n_changes + 1) AS priority
FROM per_url
ORDER BY priority DESC, url_id
LIMIT 50
"""


def events_props_k_sum(sf_dir: str):
    """Vectorized JSON field extraction over the events props column:
    one RE2 ``extract_regex`` kernel pulls the integer ``k`` out of each
    JSON payload (no per-row parser in the hot path — the props schema
    is the flat ``{"k": int}`` the corpus generator emits; nested JSON
    goes through the Selector's jmespath layer instead), then a combiner
    groupby sums per type.  DuckDB mirrors with json_extract."""

    def extract(t: pa.Table) -> pa.Table:
        st = pc.extract_regex(
            pc.fill_null(t["props"], ""), r'"k":\s*(?P<k>-?\d+)'
        )
        k = pc.cast(pc.struct_field(st, "k"), pa.int64())
        return pa.table(
            {
                "event_type": t["event_type"],
                "k": pc.fill_null(k, 0),
                "has_k": pc.cast(pc.is_valid(st), pa.int64()),
            }
        )

    return partial_sum_groupby(
        _read(sf_dir, "events", ["event_type", "props"]).map_batches(
            extract, batch_format="pyarrow"
        ),
        ["event_type"],
        {"k": "sum_k", "has_k": "n_with_k"},
        count_as="n_events",
    )


PROPS_SQL = """
SELECT event_type,
       CAST(SUM(COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), 0))
            AS BIGINT) AS sum_k,
       CAST(COUNT(json_extract(props, '$.k')) AS BIGINT) AS n_with_k,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type
"""


def events_except_hours(sf_dir: str):
    """Set difference (EXCEPT) at the MINUTE grain: minutes that saw a
    click but no purchase — the same fused one-pass conditional-count
    shuffle as INTERSECT with the keep predicate flipped (a > 0 AND
    b = 0); neither distinct set materializes anywhere.  (Coarser grains
    are degenerate somewhere: every user purchases at every sf, and at
    sf0.1 every hour sees a purchase — the minute grain stays non-empty
    from sf0.001 through sf0.1.)"""

    def widen(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour": pc.floor_temporal(t["ts"], unit="minute"),
                "a": pc.cast(pc.equal(t["event_type"], "click"), pa.int64()),
                "b": pc.cast(
                    pc.equal(t["event_type"], "purchase"), pa.int64()
                ),
            }
        )

    per_hour = partial_sum_groupby(
        _read(sf_dir, "events", ["ts", "event_type"]).map_batches(
            widen, batch_format="pyarrow"
        ),
        ["hour"],
        {"a": "a", "b": "b"},
    )
    return per_hour.map_batches(
        lambda t: t.filter(
            pc.and_(pc.greater(t["a"], 0), pc.equal(t["b"], 0))
        ).select(["hour"]),
        batch_format="pyarrow",
    )


EXCEPT_SQL = """
SELECT date_trunc('minute', ts) AS hour FROM events
WHERE event_type = 'click'
EXCEPT
SELECT date_trunc('minute', ts) FROM events WHERE event_type = 'purchase'
"""


def events_value_histogram(sf_dir: str):
    """Fixed-width histogram (SQL width_bucket semantics over [0, 100)
    in 10 buckets, under/overflow clamped into buckets 0 and 11 as
    DuckDB does): one combiner pass — each batch emits at most 12 rows —
    then a tiny groupby.  The canonical data-profiling primitive."""

    def widen(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.clip(np.floor(v / 10.0).astype(np.int64) + 1, 0, 11)
        ub, cnt = np.unique(b, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(ub, pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    return partial_sum_groupby(
        _read(sf_dir, "events", ["value"]).map_batches(
            widen, batch_format="pyarrow"
        ),
        ["bucket"],
        {"n": "n"},
    )


# this DuckDB build ships no width_bucket; the bucket arithmetic is
# spelled out (identical semantics over [0,100) x 10 with clamp rows)
HISTOGRAM_SQL = """
SELECT LEAST(GREATEST(CAST(floor(value / 10) AS BIGINT) + 1, 0), 11)
           AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


def doc_url_regex_groups(sf_dir: str):
    """Multi-group regex extraction into typed columns: pull
    (scheme, host, path) out of the first URL-shaped substring of each
    document, vectorized with one RE2 ``extract_regex`` kernel (struct
    result → columns).  DuckDB mirrors with regexp_extract group
    indices."""
    pattern = r"(?P<scheme>https?)://(?P<host>[a-z0-9.\-]+)(?P<path>/[^\s\"']*)?"

    def extract(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t["text"], "")
        st = pc.extract_regex(s, pattern)
        ok = pc.is_valid(st)
        path = pc.struct_field(st, "path")
        # a non-participating optional group is '' in RE2/Arrow (and in
        # DuckDB's regexp_extract); both sides normalize '' -> NULL
        path = pc.if_else(pc.equal(path, ""), pa.scalar(None, pa.string()),
                          path)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "scheme": pc.struct_field(st, "scheme"),
                "host": pc.struct_field(st, "host"),
                "path": path,
                "has_url": ok,
            }
        )

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow"
    )


URL_GROUPS_SQL = r"""
SELECT doc_id,
       CASE WHEN m THEN regexp_extract(text, p, 1) END AS scheme,
       CASE WHEN m THEN regexp_extract(text, p, 2) END AS host,
       CASE WHEN m AND regexp_extract(text, p, 3) <> ''
            THEN regexp_extract(text, p, 3) END AS path,
       m AS has_url
FROM (
  SELECT doc_id, text,
         '(https?)://([a-z0-9.\-]+)(/[^\s"'']*)?' AS p,
         COALESCE(regexp_matches(text, '(https?)://([a-z0-9.\-]+)(/[^\s"'']*)?'), FALSE) AS m
  FROM documents
)
"""


def kmeans_embeddings(sf_dir: str, k: int = 8, iters: int = 5,
                      detail: bool = False):
    """Distributed k-means (Lloyd's) over the embedding table — the
    canonical iterative-ML workload: centroids broadcast once per
    round (LazyRef), each batch assigns rows by one matmul and emits
    k partial rows (per-cluster vector sum + count + inertia), the
    driver merges the O(k x batches) partials and updates.  The data
    NEVER leaves the workers; per round the driver sees k x d floats.
    In-kernel certification: Lloyd's inertia must be monotonically
    non-increasing — asserted across rounds.  Empty clusters keep
    their previous centroid (standard convention)."""
    # pin the blocks in the object store once: Lloyd re-scans the
    # data every round, and plasma (with spill) beats re-reading
    # parquet per iteration
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    # deterministic seed: the k lowest vec_ids, via a pushdown-filtered
    # read (row-group pruning serves this at scale)
    import pyarrow.dataset as pads

    seed = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < k,
    ).take_all()
    seed.sort(key=lambda r: r["vec_id"])
    centroids = np.array([r["embedding"] for r in seed], dtype=np.float64)

    def make_partial(cref):
        def partial(t: pa.Table) -> pa.Table:
            mat = _stack_embeddings(t["embedding"]).astype(np.float64)
            c = cref.get()
            # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; argmin over c
            d2 = (
                -2.0 * (mat @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)
            xx = (mat * mat).sum(axis=1)
            inert = d2[np.arange(len(mat)), assign] + xx
            kk = c.shape[0]
            n = np.bincount(assign, minlength=kk)
            sums = np.zeros((kk, c.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, mat)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(kk), pa.int64()),
                    "n": pa.array(n, pa.int64()),
                    "inertia": pa.array(
                        np.bincount(assign, inert, kk), pa.float64()
                    ),
                    "vsum": pa.array(list(sums)),
                }
            )

        return partial

    prev_inertia = None
    counts = None
    inertias = None
    for _ in range(iters):
        cref = LazyRef(ray.put(centroids))
        parts = ds.map_batches(
            make_partial(cref), batch_format="pyarrow"
        ).take_all()  # O(k x batches) rows — partials, never data
        counts = np.zeros(k, dtype=np.int64)
        inertias = np.zeros(k, dtype=np.float64)
        sums = np.zeros((k, centroids.shape[1]), dtype=np.float64)
        for r in parts:
            c = int(r["cluster"])
            counts[c] += r["n"]
            inertias[c] += r["inertia"]
            sums[c] += np.asarray(r["vsum"], dtype=np.float64)
        total = float(inertias.sum())
        if prev_inertia is not None and total > prev_inertia * (1 + 1e-9):
            raise AssertionError(
                f"kmeans: inertia increased {prev_inertia} -> {total}"
            )
        prev_inertia = total
        nonzero = counts > 0
        centroids = centroids.copy()
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
    if detail:  # per-cluster breakdown for tests
        return pa.table(
            {
                "cluster": pa.array(np.arange(k), pa.int64()),
                "n": pa.array(counts, pa.int64()),
                "inertia_e3": pa.array(
                    np.floor(inertias * 1000 + 0.5).astype(np.int64)
                ),
            }
        )
    # DRIVER-VERIFIED (round 5): total membership is the SQL anchor
    # (every vector lands in exactly one cluster ⇒ Σn == count(*)),
    # Lloyd's monotone-inertia certification rides as a gate column,
    # and the per-cluster breakdown stays pinned in tests (detail=True).
    return pa.table(
        {
            "n_clusters": pa.array([k], pa.int64()),
            "n_vecs": pa.array([int(counts.sum())], pa.int64()),
            "inertia_monotone_ok": pa.array([True], pa.bool_()),
            "all_nonempty_ok": pa.array([bool((counts > 0).all())]),
        }
    )


def embedding_pca_project(sf_dir: str, n_components: int = 2):
    """Distributed PCA: one pass of O(d^2) sufficient statistics per
    batch (two-level reduce tree — the driver only ever sees d x d
    covariance partials, never vectors), eigh on the tiny covariance
    with a deterministic sign convention, then an actor-pool projection
    with the components broadcast once.  Output coordinates are integer
    micro-units; in-kernel certification asserts eigenvalue mass equals
    trace(cov) and explained variances are sorted."""
    from ..functions.similarity import PcaProject, pca_fit

    dim = 64
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    mean, comps, evals = pca_fit(ds, dim=dim)
    sorted_ok = bool(np.all(np.diff(evals) <= 1e-9))
    # components of a symmetric eigendecomposition are orthonormal —
    # certify numerically (an independent check on the eigh plumbing)
    gram = comps @ comps.T
    orthonormal_ok = bool(
        np.allclose(gram, np.eye(gram.shape[0]), atol=1e-9)
    )
    ref = ray.put((mean, comps))
    proj = ds.map_batches(
        PcaProject(ref, n_components, id_cols=("vec_id", "label")),
        batch_format="pyarrow",
        concurrency=4,
    )
    # DRIVER-VERIFIED (round 5): row count is the SQL anchor; the
    # variance-order and orthonormality certifications ride as gate
    # columns.  The integer micro-unit projections stay pinned in tests.
    return pa.table(
        {
            "n_rows": pa.array([proj.count()], pa.int64()),
            "sorted_ok": pa.array([sorted_ok], pa.bool_()),
            "orthonormal_ok": pa.array([orthonormal_ok], pa.bool_()),
        }
    )


def customer_order_full_outer(sf_dir: str):
    """FULL OUTER join through the bucketed shuffle join: a filtered
    customer slice against per-customer URGENT order counts — rows
    survive from BOTH unmatched sides (left-only customers with null
    counts, right-only order keys with null names).  Per-bucket pyarrow
    full-outer with coalesced keys; typed-null padding keeps one-sided
    buckets schema-consistent."""
    left = _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["c_custkey"], 3), 0)
        ),
        batch_format="pyarrow",
    )
    right = partial_sum_groupby(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda t: t.filter(
                pc.equal(t["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"]).rename_columns(["c_custkey"]),
            batch_format="pyarrow",
        ),
        ["c_custkey"],
        {},
        count_as="n_urgent",
    )
    return hash_bucket_join(left, right, on="c_custkey", how="outer",
                            buckets=16)


FULL_OUTER_SQL = """
SELECT COALESCE(l.c_custkey, r.c_custkey) AS c_custkey, l.c_name, r.n_urgent
FROM (SELECT c_custkey, c_name FROM customer
      WHERE (c_custkey & 3) = 0) l
FULL OUTER JOIN
     (SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_urgent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1) r
ON l.c_custkey = r.c_custkey
"""


def lineitem_triangles(sf_dir: str):
    """Exact distributed triangle count (degree-oriented wedge closure,
    :func:`parsel_ray.functions.graph.triangle_count`) over a derived
    unipartite graph: node space Z_2003, an edge per lineitem between
    ``l_orderkey % 2003`` and ``(l_partkey*31 + l_suppkey) % 2003``.
    The DuckDB oracle counts the same triangles with a three-way
    self-join under the a<b<c canonical ordering."""
    from ..functions.graph import triangle_count

    def edges(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "a": pa.array(ok % 2003, pa.int64()),
                "b": pa.array((pk * 31 + sk) % 2003, pa.int64()),
            }
        )

    ds = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]
    ).map_batches(edges, batch_format="pyarrow")
    return triangle_count(ds, num_partitions=16)


TRIANGLE_SQL = """
WITH e AS (
  SELECT DISTINCT
    LEAST(l_orderkey % 2003, (l_partkey * 31 + l_suppkey) % 2003) AS lo,
    GREATEST(l_orderkey % 2003, (l_partkey * 31 + l_suppkey) % 2003) AS hi
  FROM lineitem
  WHERE l_orderkey % 2003 <> (l_partkey * 31 + l_suppkey) % 2003
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi
"""


def web_pagerank(sf_dir: str, iters: int = 8):
    """PageRank over the deterministic synthetic web's link graph — the
    iterative-graph workload on the crawl tier's own corpus: page HTML
    is fetched and link-extracted in map_batches (Selector kernel +
    RFC-3986 canonicalization, the exact crawl extraction path), edges
    dedupe per page, and ``functions.graph.pagerank`` runs the
    join+groupby power iteration with in-kernel mass-conservation
    certification.  Returns the top-20 pages by rank (rank in exact-ish
    fixed point for display)."""
    from ..crawl.pagestore import PageStore
    from ..crawl.urlnorm import canonical_url
    from ..functions.graph import pagerank

    cfg = _demo_crawl_cfg().store
    ps = PageStore(cfg)
    urls = [
        ps.url(h, k)
        for h in range(cfg.n_hosts)
        for k in range(ps.n_pages(h))
    ]
    pages = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))

    def extract_edges(t: pa.Table) -> pa.Table:
        from ..crawl.extract import extract_page

        store = PageStore(cfg)
        src_out, dst_out = [], []
        for url in t["url"].to_pylist():
            page = store.page(url)
            if page is None:
                continue
            body, enc = page
            links, _figs, eff_base = extract_page(body, enc, url)
            seen = set()
            for href in links:
                # resolve against the <base href>-effective base, exactly
                # like the crawl admission path
                canon = canonical_url(href, base=eff_base)
                if canon is None or canon == url or canon in seen:
                    continue
                if store._parse(canon) is None:
                    continue  # off-graph target
                seen.add(canon)
                src_out.append(url)
                dst_out.append(canon)
        return pa.table(
            {
                "src": pa.array(src_out, pa.string()),
                "dst": pa.array(dst_out, pa.string()),
            }
        )

    edges = pages.map_batches(extract_edges, batch_format="pyarrow")
    nodes = pages.map_batches(
        lambda t: t.rename_columns(["node"]), batch_format="pyarrow"
    )
    ranks = pagerank(edges, nodes, iters=iters, buckets=8)
    top = ranks.map_batches(
        lambda t: pa.table(
            {
                "node": t["node"],
                "rank_e9": pc.cast(
                    pc.floor(
                        pc.add(
                            pc.multiply(t["rank"], pa.scalar(1e9)),
                            pa.scalar(0.5),
                        )
                    ),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).sort(["rank_e9", "node"], descending=[True, False]).limit(20)
    return top


def anchor_text_index(sf_dir: str, top_k: int = 20):
    """Inlink anchor-text index over the synthetic web — the web-search
    index op: every page's ``<a>`` elements yield (target, anchor-text)
    pairs through the Selector kernel + RFC-3986 canonicalization (the
    exact crawl extraction path); per-pair dedupe, then two combiner
    groupbys build per-target ``n_inlinks`` (distinct linking pages)
    and ``n_anchors`` (distinct anchor strings).  Top-20 by inlinks
    with url tiebreak.  Rows-only gate: the page corpus is generated by
    the deterministic PageStore, not a SQL table — determinism is
    pinned by the fixed store seed (same contract as crawl_pop_order)."""
    from ..crawl.pagestore import PageStore
    from ..crawl.urlnorm import canonical_url

    cfg = _demo_crawl_cfg().store
    ps = PageStore(cfg)
    urls = [
        ps.url(h, k)
        for h in range(cfg.n_hosts)
        for k in range(ps.n_pages(h))
    ]
    pages = rd.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))

    def extract_anchors(t: pa.Table) -> pa.Table:
        from urllib.parse import urljoin as _urljoin

        from ..selector import Selector

        store = PageStore(cfg)
        srcs, dsts, texts = [], [], []
        for url in t["url"].to_pylist():
            page = store.page(url)
            if page is None:
                continue
            body, enc = page
            sel = Selector(body=body, encoding=enc or "utf-8", type="html",
                           base_url=url)
            base_href = sel.css("base::attr(href)").get()
            eff_base = (
                _urljoin(url, base_href.strip()) if base_href else url
            )
            seen = set()
            for a in sel.css("a"):
                href = a.attrib.get("href")
                canon = canonical_url(href, base=eff_base) if href else None
                if canon is None or canon == url:
                    continue
                if store._parse(canon) is None:
                    continue  # off-graph target
                text = " ".join("".join(a.css("::text").getall()).split())
                if (canon, text) in seen:
                    continue
                seen.add((canon, text))
                srcs.append(url); dsts.append(canon); texts.append(text)
        return pa.table(
            {
                "src": pa.array(srcs, pa.string()),
                "dst": pa.array(dsts, pa.string()),
                "anchor": pa.array(texts, pa.string()),
            }
        )

    pairs = pages.map_batches(extract_anchors, batch_format="pyarrow")
    # distinct linking pages per target
    inlinks = partial_sum_groupby(
        pairs.map_batches(
            lambda t: t.select(["src", "dst"]).group_by(
                ["src", "dst"]).aggregate([]),
            batch_format="pyarrow",
        ).groupby(["src", "dst"]).aggregate(Count(alias_name="__n")),
        ["dst"], {}, count_as="n_inlinks",
    )
    # distinct anchor strings per target
    anchors = partial_sum_groupby(
        pairs.map_batches(
            lambda t: t.select(["dst", "anchor"]).group_by(
                ["dst", "anchor"]).aggregate([]),
            batch_format="pyarrow",
        ).groupby(["dst", "anchor"]).aggregate(Count(alias_name="__n")),
        ["dst"], {}, count_as="n_anchors",
    )
    joined = hash_bucket_join(inlinks, anchors, on="dst", buckets=8)
    return joined.map_batches(
        lambda t: t.select(["dst", "n_inlinks", "n_anchors"]),
        batch_format="pyarrow",
    ).sort(["n_inlinks", "dst"], descending=[True, False]).limit(top_k)


def events_cume_dist(sf_dir: str):
    """Window ``cume_dist()`` — per event, the fraction of its
    event-type partition with value <= it: partition by key
    (grouped_apply coarse partitions), one vectorized max-rank inside
    each group.  The double is k/n (exact int division both sides), so
    it hash-matches the oracle.

    Scale note: PARTITION BY a LOW-cardinality key means each group
    must fit one worker here.  When it doesn't, the scale path is the
    range-partitioned rank machinery (``functions/sort.py``) applied
    per group — rank(x)/n needs only the global row_number within the
    group plus one group-count scalar."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["cume_dist"] = g["value"].rank(method="max") / len(g)
        return g[["event_id", "event_type", "cume_dist"]]

    return grouped_apply(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type",
        run,
        num_partitions=8,
    )


def events_first_last_value(sf_dir: str):
    """Window first_value/last_value over the full user partition
    ((ts, event_id) order, unbounded frame): per-user grouped_apply
    broadcasts the endpoints to every row — cents-exact so the oracle
    hashes identically."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"], kind="stable")
        out = g[["event_id", "user_id"]].copy()
        out["first_cents"] = g["cents"].iloc[0]
        out["last_cents"] = g["cents"].iloc[-1]
        return out

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    ds = ds.map_batches(
        lambda t: pa.table(
            {
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(_cents(t["value"])),
            }
        ),
        batch_format="pyarrow",
    )
    return grouped_apply(ds, "user_id", run, num_partitions=16)


FIRST_LAST_SQL = f"""
SELECT event_id, user_id,
       first_value({_CENTS_SQL.format(expr='value')}) OVER w AS first_cents,
       last_value({_CENTS_SQL.format(expr='value')}) OVER w AS last_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def events_percent_rank(sf_dir: str):
    """Window ``percent_rank()`` = (rank-1)/(n-1) with rank = MIN rank of
    the tie group (SQL semantics) — same coarse-partitioned shape as
    ``events_cume_dist`` (and the same scale note: the range-partitioned
    rank machinery in ``functions/sort.py`` is the path for groups that
    outgrow one worker)."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        n = len(g)
        if n == 1:
            g["percent_rank"] = 0.0
        else:
            g["percent_rank"] = (g["value"].rank(method="min") - 1) / (n - 1)
        return g[["event_id", "event_type", "percent_rank"]]

    return grouped_apply(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type",
        run,
        num_partitions=8,
    )


PCT_RANK_SQL = """
SELECT event_id, event_type,
       percent_rank() OVER (PARTITION BY event_type ORDER BY value)
           AS percent_rank
FROM events
"""


CUME_SQL = """
SELECT event_id, event_type,
       cume_dist() OVER (PARTITION BY event_type ORDER BY value)
           AS cume_dist
FROM events
"""


def events_ntile(sf_dir: str, k: int = 4):
    """Window ``ntile(4)`` — equal-height buckets per event-type
    partition with DuckDB's size rule (the first n mod k buckets get
    one extra row) over the deterministic total order (value,
    event_id).  Same coarse-partition shape as the other windows.

    Scale note: as with ``events_cume_dist``, a low-cardinality
    PARTITION BY needs the per-group range-partitioned row_number
    (``functions/sort.py``) once a group outgrows one worker — the
    tile is then a closed-form vectorized map over (rank, n, k)."""

    def run(g: pd.DataFrame, _k=k) -> pd.DataFrame:
        g = g.sort_values(["value", "event_id"]).copy()
        n = len(g)
        base, extra = divmod(n, _k)
        sizes = np.full(_k, base, dtype=np.int64)
        sizes[:extra] += 1
        g["tile"] = np.repeat(
            np.arange(1, _k + 1, dtype=np.int64), sizes
        )[:n]
        return g[["event_id", "event_type", "tile"]]

    return grouped_apply(
        _read(sf_dir, "events", ["event_id", "event_type", "value"]),
        "event_type",
        run,
        num_partitions=8,
    )


NTILE_SQL = """
SELECT event_id, event_type,
       CAST(ntile(4) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS BIGINT) AS tile
FROM events
"""


def csv_roundtrip(sf_dir: str):
    """CSV sink -> source round-trip (the third interchange format):
    worker-side ``write_csv`` shards with quoted text, ``read_csv``
    streams them back, combiner groupby proves value fidelity through
    the quoting/escaping layer.  Money goes through as exact cents."""
    import tempfile as _tempfile

    out = _tempfile.mkdtemp(prefix="orders_csv_", dir="/tmp")
    _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    ).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderpriority": t["o_orderpriority"],
                "cents": pa.array(_cents(t["o_totalprice"])),
            }
        ),
        batch_format="pyarrow",
    ).write_csv(out)
    back = rd.read_csv(out)
    return partial_sum_groupby(
        back,
        ["o_orderpriority"],
        {"cents": "sum_cents"},
        count_as="n_orders",
    )


CSV_SQL = f"""
SELECT o_orderpriority,
       CAST(SUM({_CENTS_SQL.format(expr='o_totalprice')}) AS BIGINT)
           AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def orc_roundtrip(sf_dir: str):
    """ORC sink -> source round-trip (fourth interchange format; Ray Data
    ships no ORC IO, so :mod:`parsel_ray.sources.orc` adds the worker-side
    shard writer + path-fanout reader).  Same fidelity contract as
    csv_roundtrip: exact cents through the format and back."""
    import tempfile as _tempfile

    from ..sources.orc import read_orc, write_orc

    out = _tempfile.mkdtemp(prefix="orders_orc_", dir="/tmp")
    n = write_orc(
        _read(
            sf_dir, "orders",
            ["o_orderkey", "o_orderpriority", "o_totalprice"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_orderpriority": t["o_orderpriority"],
                    "cents": pa.array(_cents(t["o_totalprice"])),
                }
            ),
            batch_format="pyarrow",
        ),
        out,
    )
    back = read_orc(out, columns=["o_orderpriority", "cents"])
    res = partial_sum_groupby(
        back,
        ["o_orderpriority"],
        {"cents": "sum_cents"},
        count_as="n_orders",
    )

    def receipts_match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        assert pc_.sum(t["n_orders"]).as_py() == n, "orc receipt mismatch"
        return t

    # one tiny block (≤ #priorities rows) so the receipt assert sees the
    # whole aggregate
    return res.repartition(1).map_batches(
        receipts_match, batch_format="pyarrow"
    )


def arrow_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather V2) sink → memory-mapped source round-trip
    (fifth interchange format; :mod:`parsel_ray.sources.arrowipc`) —
    the zero-copy hot-path format for stage handoffs/spills, vs parquet
    for archival.  Worker-side shard writes with retry-stable digest
    names; the read side memory-maps and column-prunes at the reader.
    Exact cents through the format and back, receipt-verified."""
    import tempfile as _tempfile

    from ..sources.arrowipc import read_arrow_ipc, write_arrow_ipc

    out = _tempfile.mkdtemp(prefix="lineitem_ipc_", dir="/tmp")
    n = write_arrow_ipc(
        _read(
            sf_dir, "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice"],
        ).map_batches(
            lambda t: pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "l_returnflag": t["l_returnflag"],
                    "cents": pa.array(_cents(t["l_extendedprice"])),
                }
            ),
            batch_format="pyarrow",
        ),
        out,
    )
    back = read_arrow_ipc(out, columns=["l_returnflag", "cents"])
    res = partial_sum_groupby(
        back, ["l_returnflag"], {"cents": "sum_cents"}, count_as="n_items"
    )

    def receipts_match(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        assert pc_.sum(t["n_items"]).as_py() == n, "ipc receipt mismatch"
        return t

    return res.repartition(1).map_batches(
        receipts_match, batch_format="pyarrow"
    )


IPC_SQL = f"""
SELECT l_returnflag,
       CAST(SUM({_CENTS_SQL.format(expr='l_extendedprice')}) AS BIGINT)
           AS sum_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem GROUP BY l_returnflag
"""


def tar_shard_roundtrip(sf_dir: str):
    """WebDataset-style tar shard sink → source round-trip (sixth
    interchange format; :mod:`parsel_ray.sources.tarshard`) — the
    training-loader layout for image/text corpora: members group into
    samples by key prefix (``{key}.txt`` + ``{key}.json``), one
    deterministic USTAR tar per block, worker-side writes with
    retry-stable digest names.  The read side prunes by member
    extension (the shard analogue of a column-pruned read) and
    re-groups members into sample rows.  Byte length + a json metadata
    field survive the trip exactly, receipt-verified."""
    import tempfile as _tempfile

    from ..sources.tarshard import read_tar_shards, write_tar_shards

    out = _tempfile.mkdtemp(prefix="docs_tar_", dir="/tmp")
    n = write_tar_shards(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        out,
        key_col="doc_id",
        payload_exts={"text": "txt"},
        meta_cols=["lang"],
    )

    def unpack(t: pa.Table) -> pa.Table:
        import json as _json

        keys = t["__key__"].to_pylist()
        txts = t["txt"].to_pylist()
        metas = t["json"].to_pylist()
        return pa.table(
            {
                "doc_id": pa.array([int(k) for k in keys], pa.int64()),
                "n_bytes": pa.array(
                    [len(b) for b in txts], pa.int64()
                ),
                "lang": pa.array(
                    [_json.loads(m)["lang"] for m in metas], pa.string()
                ),
            }
        )

    back = read_tar_shards(out, exts=["txt", "json"]).map_batches(
        unpack, batch_format="pyarrow"
    )

    def receipts_match(t: pa.Table) -> pa.Table:
        assert len(t) == n, "tar shard receipt mismatch"
        return t

    return (
        back.repartition(1)
        .map_batches(receipts_match, batch_format="pyarrow")
        .sort("doc_id")
    )


TAR_SQL = """
SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, lang
FROM documents ORDER BY doc_id
"""


def epoch_shuffle_split(sf_dir: str):
    """Deterministic training-loader assignments over the document
    corpus: seed-keyed epoch shuffle order, sample-keyed (epoch-stable)
    train/val/test split, and trainer shard = rank % world_size.  The
    LCG hash keeps every intermediate under 2^63 so the SQL oracle
    reproduces the permutation bit-for-bit (see
    :mod:`parsel_ray.functions.epochshuffle`)."""
    from ..functions.epochshuffle import epoch_shuffle_assign

    out = epoch_shuffle_assign(
        _read(sf_dir, "documents", ["doc_id"]),
        key_col="doc_id", seed=17, world_size=8,
    )
    return out.map_batches(
        lambda t: t.select(["doc_id", "epoch_rank", "split", "shard"]),
        batch_format="pyarrow",
    ).sort("doc_id")


EPOCH_SHUFFLE_SQL = """
WITH h AS (
  SELECT doc_id,
         ((((doc_id + 17) % 2147483648) * 1103515245 + 12345)
            % 2147483648 * 1103515245 + 12345) % 2147483648 AS eh,
         (((doc_id % 2147483648) * 1103515245 + 12345)
            % 2147483648 * 1103515245 + 12345) % 2147483648 % 100 AS sh
  FROM documents
), ranked AS (
  SELECT doc_id, sh,
         row_number() OVER (ORDER BY eh, doc_id) AS epoch_rank
  FROM h
)
SELECT doc_id,
       CAST(epoch_rank AS BIGINT) AS epoch_rank,
       CASE WHEN sh < 80 THEN 'train'
            WHEN sh < 90 THEN 'val' ELSE 'test' END AS split,
       CAST((epoch_rank - 1) % 8 AS BIGINT) AS shard
FROM ranked ORDER BY doc_id
"""


def doc_repetition_stats(sf_dir: str):
    """Gopher-family per-document repetition signals (most-frequent
    word / adjacent bigram + exact word counts), fully vectorized
    (pandas explode + groupby inside ``map_batches``); each document is
    independent so the stage is embarrassingly parallel with no
    shuffle.  Integer counts (no float fractions) keep the SQL oracle
    bit-exact."""
    from ..functions.text import repetition_stats

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(repetition_stats, batch_format="pyarrow")
        .sort("doc_id")
    )


REPETITION_SQL = """
WITH wl AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), words AS (
  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS i FROM wl
), wc AS (
  SELECT doc_id, w, COUNT(*) AS n FROM words GROUP BY doc_id, w
), topw AS (
  SELECT doc_id, w AS top_word, n AS top_word_n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, w) AS rk
  FROM wc
), bigrams AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS bg
  FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.i = a.i + 1
), bc AS (
  SELECT doc_id, bg, COUNT(*) AS n FROM bigrams GROUP BY doc_id, bg
), topb AS (
  SELECT doc_id, bg AS top_bigram, n AS top_bigram_n,
         row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, bg) AS rk
  FROM bc
), agg AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
         CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM wc GROUP BY doc_id
)
SELECT agg.doc_id, n_words, n_distinct,
       top_word, CAST(top_word_n AS BIGINT) AS top_word_n,
       top_bigram, CAST(top_bigram_n AS BIGINT) AS top_bigram_n
FROM agg
JOIN topw ON topw.doc_id = agg.doc_id AND topw.rk = 1
JOIN topb ON topb.doc_id = agg.doc_id AND topb.rk = 1
ORDER BY agg.doc_id
"""


def pii_redaction(sf_dir: str):
    """PII span redaction (the C4-style scrub): emails, IPv4s and
    phone-shaped digit runs replaced by typed placeholder tokens, with
    exact match counts.  Both sides run RE2 (pyarrow.compute's
    replace/count kernels here, DuckDB's regexp_* in the oracle), so
    leftmost-nonoverlapping replacement semantics agree exactly.  PII
    is injected deterministically from ``doc_id`` (the synthetic corpus
    contains none) by both engines, making the gate non-vacuous."""

    def redact(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        text = pc.binary_join_element_wise(
            t["text"].cast(pa.string()),
            pa.array(
                [
                    f"contact user{d}@mail{d % 7}.example.com "
                    f"at 10.{d % 256}.{(d * 3) % 256}.{d % 100} "
                    f"tel +1 {d % 900 + 100}-555-{d % 10000:04d}"
                    for d in did
                ],
                pa.string(),
            ),
            " ",
        )
        email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
        ip_re = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
        tel_re = r"\+\d[\d -]{7,}\d"
        n_email = pc.count_substring_regex(text, email_re)
        out = pc.replace_substring_regex(text, email_re, "<EMAIL>")
        n_ip = pc.count_substring_regex(out, ip_re)
        out = pc.replace_substring_regex(out, ip_re, "<IP>")
        n_tel = pc.count_substring_regex(out, tel_re)
        out = pc.replace_substring_regex(out, tel_re, "<PHONE>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "redacted": out,
                "n_email": n_email.cast(pa.int64()),
                "n_ip": n_ip.cast(pa.int64()),
                "n_tel": n_tel.cast(pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(redact, batch_format="pyarrow")
        .sort("doc_id")
    )


PII_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' ' || 'contact user' || doc_id || '@mail'
              || (doc_id % 7) || '.example.com at 10.' || (doc_id % 256)
              || '.' || ((doc_id * 3) % 256) || '.' || (doc_id % 100)
              || ' tel +1 ' || (doc_id % 900 + 100) || '-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         CAST(length(regexp_extract_all(
            t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
            AS BIGINT) AS n_email,
         regexp_replace(
            t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
            '<EMAIL>', 'g') AS t
  FROM injected
), s2 AS (
  SELECT doc_id, n_email,
         CAST(length(regexp_extract_all(
            t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT)
            AS n_ip,
         regexp_replace(
            t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')
            AS t
  FROM s1
)
SELECT doc_id,
       regexp_replace(t, '\+\d[\d -]{7,}\d', '<PHONE>', 'g') AS redacted,
       n_email, n_ip,
       CAST(length(regexp_extract_all(t, '\+\d[\d -]{7,}\d')) AS BIGINT)
           AS n_tel
FROM s2 ORDER BY doc_id
"""


def source_balance_resample(sf_dir: str):
    """Deterministic mixture balancing: downsample every source to the
    smallest source's row count by keeping each row iff its
    seeded-hash rank WITHIN its source is <= min_count — exact (not
    expected-value) proportions, restart-stable, no RNG state.  The
    per-source ranks come from ``grouped_row_number`` (hot sources
    spread over hash-range cells); only the O(sources) counts visit
    the driver to pick the floor."""
    from ..functions.epochshuffle import _lcg2
    from ..functions.sort import grouped_row_number

    def add_hash(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "__eh", pa.array(_lcg2(k, 29), pa.int64())
        )

    ds = _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
        add_hash, batch_format="pyarrow"
    )
    counts = partial_sum_groupby(
        ds.map_batches(
            lambda t: t.select(["source"]), batch_format="pyarrow"
        ),
        ["source"], {}, count_as="n",
    ).take_all()  # O(sources)
    # target = 60% of the smallest source (a strict downsample even
    # when the corpus arrives pre-balanced)
    mc = max(1, min(r["n"] for r in counts) * 3 // 5)

    ranked = grouped_row_number(
        ds, "source", ["__eh", "doc_id"], [True, True], out_col="rk"
    )
    return (
        ranked.filter(expr=f"rk <= {mc}")
        .map_batches(
            lambda t: t.select(["doc_id", "source", "rk"]),
            batch_format="pyarrow",
        )
        .sort("doc_id")
    )


SOURCE_BALANCE_SQL = """
WITH h AS (
  SELECT doc_id, source,
         ((((doc_id + 29) % 2147483648) * 1103515245 + 12345)
            % 2147483648 * 1103515245 + 12345) % 2147483648 AS eh
  FROM documents
), r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY eh, doc_id)
             AS rk
  FROM h
), m AS (
  SELECT GREATEST(1, MIN(c) * 3 // 5) AS mc FROM (
    SELECT COUNT(*) AS c FROM documents GROUP BY source
  )
)
SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
FROM r, m WHERE rk <= mc ORDER BY doc_id
"""


def sitemap_extract(sf_dir: str):
    """Sitemap generation + namespace-aware XML extraction as a
    distributed round-trip: one sitemap-protocol document per nation
    host (built in a ``grouped_apply`` — hosts are the natural crawl
    partition), parsed back by the selector stack inside
    ``map_batches`` with the sitemaps.org default namespace mapped to a
    prefix (reference namespace semantics:
    /root/reference/parsel/selector.py register_namespace usage).  The
    oracle rebuilds every <loc>/<lastmod> pair relationally.  (The
    sitemap protocol caps one file at 50k URLs / 50 MB; the production
    builder would emit a sitemapindex + per-50k-chunk files from the
    same grouped_apply — chunking by ``rank // 50_000`` with
    ``grouped_row_number`` — the single-file build here keeps the gate
    round-trip exact.)"""
    import pandas as pd

    from ..functions.agg import grouped_apply
    from ..selector import Selector

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()
    nat.sort(key=lambda r: r["n_nationkey"])
    nkeys = np.array([r["n_nationkey"] for r in nat], np.int64)
    nnames = np.array(
        [r["n_name"].lower().replace(" ", "-") for r in nat], object
    )
    import ray as _ray

    nref = _ray.put((nkeys, nnames))

    def build_xml(g: pd.DataFrame) -> pd.DataFrame:
        from ..functions.relational import vec_lookup

        keys, names = _ray.get(nref)
        nk = int(g["c_nationkey"].iloc[0])
        # clamped + miss-checked lookup (a raw searchsorted would return
        # the NEXT nation's host for an absent key, or IndexError)
        host = vec_lookup(keys, names, np.array([nk], np.int64), "")[0]
        if not host:
            raise ValueError(f"c_nationkey {nk} missing from nation")
        parts = ["<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
                 "<urlset xmlns=\"http://www.sitemaps.org/schemas/"
                 "sitemap/0.9\">"]
        for k in sorted(g["c_custkey"].tolist()):
            parts.append(
                f"<url><loc>https://{host}.example.com/customer/{k}"
                f"</loc><lastmod>2024-{k % 12 + 1:02d}-{k % 28 + 1:02d}"
                f"</lastmod></url>"
            )
        parts.append("</urlset>")
        return pd.DataFrame({"xml": ["".join(parts)]})

    sitemaps = grouped_apply(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]),
        "c_nationkey", build_xml, num_partitions=8,
    )

    _NS = {"sm": "http://www.sitemaps.org/schemas/sitemap/0.9"}

    def parse(t: pa.Table) -> pa.Table:
        urls, mods = [], []
        for xml in t["xml"].to_pylist():
            sel = Selector(text=xml, type="xml")
            urls.extend(
                sel.xpath("//sm:url/sm:loc/text()", namespaces=_NS)
                .getall()
            )
            mods.extend(
                sel.xpath("//sm:url/sm:lastmod/text()", namespaces=_NS)
                .getall()
            )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "lastmod": pa.array(mods, pa.string()),
            }
        )

    return sitemaps.map_batches(parse, batch_format="pyarrow").sort("url")


SITEMAP_SQL = """
SELECT 'https://' || replace(lower(n_name), ' ', '-')
           || '.example.com/customer/' || c_custkey AS url,
       '2024-' || lpad(CAST(c_custkey % 12 + 1 AS VARCHAR), 2, '0')
           || '-' || lpad(CAST(c_custkey % 28 + 1 AS VARCHAR), 2, '0')
           AS lastmod
FROM customer JOIN nation ON c_nationkey = n_nationkey
ORDER BY url
"""


def unicode_nfc_normalize(sf_dir: str):
    """Unicode NFC normalization (the canonical pre-dedup text
    normalization step: visually identical strings with different
    combining-character encodings must hash equal).  Decomposed
    sequences are injected deterministically from ``doc_id`` (the
    synthetic corpus is ASCII); both engines normalize with their
    Unicode NFC implementation and the gate pins byte equality plus the
    changed-length evidence column."""
    import unicodedata

    # combining marks: acute, grave, diaeresis
    marks = ["́", "̀", "̈"]

    def norm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        raw = [
            f"{s} cafe{marks[i % 3]} nai{marks[(i + 1) % 3]}ve"
            for i, s in zip(ids, texts)
        ]
        out = [unicodedata.normalize("NFC", s) for s in raw]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "normalized": pa.array(out, pa.string()),
                "n_chars": pa.array(
                    [len(s) for s in out], pa.int64()
                ),
                "shrunk": pa.array(
                    [len(o) < len(r) for o, r in zip(out, raw)],
                    pa.bool_(),
                ),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(norm, batch_format="pyarrow")
        .sort("doc_id")
    )


NFC_SQL = """
WITH built AS (
  SELECT doc_id,
         text || ' cafe' || CASE doc_id % 3 WHEN 0 THEN chr(769)
              WHEN 1 THEN chr(768) ELSE chr(776) END
           || ' nai' || CASE (doc_id + 1) % 3 WHEN 0 THEN chr(769)
              WHEN 1 THEN chr(768) ELSE chr(776) END || 've' AS raw
  FROM documents
)
SELECT doc_id,
       nfc_normalize(raw) AS normalized,
       CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_chars,
       length(nfc_normalize(raw)) < length(raw) AS shrunk
FROM built ORDER BY doc_id
"""


def doc_chunking(sf_dir: str):
    """Context-window chunking (RAG/embedding prep): split every
    document into overlapping word windows (W=32, stride 24) —
    embarrassingly parallel inside ``map_batches``, one output row per
    chunk with its exact text and word count; a short document yields
    one whole-document chunk.  The oracle rebuilds the identical
    windows with list_slice + generate_series."""
    W, S = 32, 24

    def chunk(t: pa.Table) -> pa.Table:
        ids, cidx, texts, nwords = [], [], [], []
        for i, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            words = s.split(" ")
            n = len(words)
            n_chunks = (max(n, W) - W + S - 1) // S + 1
            for c in range(n_chunks):
                piece = words[c * S : c * S + W]
                ids.append(i)
                cidx.append(c)
                texts.append(" ".join(piece))
                nwords.append(len(piece))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "chunk_idx": pa.array(cidx, pa.int64()),
                "chunk": pa.array(texts, pa.string()),
                "n_words": pa.array(nwords, pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(chunk, batch_format="pyarrow")
        .sort(["doc_id", "chunk_idx"])
    )


CHUNK_SQL = """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
), idx AS (
  SELECT doc_id, l, unnest(generate_series(0,
      CAST(ceil((greatest(len(l), 32) - 32) / 24.0) AS BIGINT))) AS i
  FROM d
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
       array_to_string(list_slice(l, i*24 + 1, i*24 + 32), ' ') AS chunk,
       CAST(len(list_slice(l, i*24 + 1, i*24 + 32)) AS BIGINT) AS n_words
FROM idx ORDER BY doc_id, chunk_idx
"""


def boilerplate_removal(sf_dir: str):
    """Readability-style main-content extraction: pages are synthesized
    with nav/aside/footer boilerplate (heavy in links) around the
    document text split into paragraphs; the extractor scores every
    block element by link-density-penalized text mass (the
    boilerpipe/readability signal — no tag names hardcoded) and returns
    the best subtree's paragraph text.  The gate pins exact recovery of
    the original document text through build → parse → score →
    extract."""
    from ..selector import Selector

    def build_and_extract(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out = []
        for i, s in zip(ids, t["text"].to_pylist()):
            words = s.split(" ")
            paras = [
                " ".join(words[j : j + 12])
                for j in range(0, len(words), 12)
            ]
            body = "".join(f"<p>{p}</p>" for p in paras)
            html = (
                "<html><head><title>d</title></head><body>"
                "<nav><a href='/a'>home sweet home</a>"
                "<a href='/b'>about the site</a>"
                "<a href='/c'>contact us now</a></nav>"
                f"<div id='main'>{body}</div>"
                "<aside><a href='/x'>related article one</a>"
                "<a href='/y'>related article two</a></aside>"
                "<footer><a href='/z'>terms</a> copyright legal "
                "boilerplate <a href='/w'>privacy</a></footer>"
                "</body></html>"
            )
            sel = Selector(text=html)
            best, best_score = None, -1.0
            for node in sel.xpath(
                "//body//*[self::div or self::section or self::nav "
                "or self::aside or self::footer or self::main]"
            ):
                text = " ".join(
                    x.strip() for x in node.xpath(".//text()").getall()
                    if x.strip()
                )
                link_text = " ".join(
                    x.strip()
                    for x in node.xpath(".//a//text()").getall()
                    if x.strip()
                )
                score = len(text) - 2.0 * len(link_text)
                if score > best_score:
                    best, best_score = node, score
            paras_out = [
                " ".join(
                    x.strip() for x in p.xpath(".//text()").getall()
                    if x.strip()
                )
                for p in best.xpath(".//p")
            ]
            out.append(" ".join(paras_out))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "extracted": pa.array(out, pa.string()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(build_and_extract, batch_format="pyarrow")
        .sort("doc_id")
    )


BOILERPLATE_SQL = """
SELECT doc_id, text AS extracted FROM documents ORDER BY doc_id
"""


def doc_lm_perplexity(sf_dir: str):
    """CCNet-style LM quality filter: train a char-bigram LM on the
    corpus itself (distributed combiner counts, O(alphabet²) shuffle
    state), broadcast it once via ``ray.put``, and score every document
    with bits-per-char perplexity — low = fluent/common, high =
    junk-shaped.  Certified in-kernel: the distributed model's total
    bigram mass must equal the corpus' exact bigram count (computed
    from the same Dataset), and every perplexity must be finite and
    positive.  Rows-only gate (float scores; ordering is pinned by the
    pytest reference-equality test instead)."""
    import ray as _ray

    from ..functions.text import perplexity_scores, train_char_bigram_lm

    from ..functions.relational import LazyRef

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    model = train_char_bigram_lm(ds, "text")
    total_mass = sum(model[1].values())
    mlazy = LazyRef(_ray.put(model))  # deserialize once per worker —
    #                                   a bare ray.get here would re-pay
    #                                   the dict unpickle on EVERY batch

    def score(t: pa.Table) -> pa.Table:
        # DRIVER-VERIFIED (round 5): per-row finite/positive flag as a
        # gate column (the float scores themselves stay pinned by the
        # pytest reference-equality test)
        out = perplexity_scores(t, mlazy.get(), "text")
        ppl = out["ppl"].to_numpy(zero_copy_only=False)
        ok = np.isfinite(ppl) & (ppl > 0)
        return pa.table(
            {"doc_id": out["doc_id"], "ppl_ok": pa.array(ok, pa.bool_())}
        )

    def certify(t: pa.Table) -> pa.Table:
        # exact mass check: sum over docs of (len(text)-1)
        n = sum(
            max(0, len(s) - 1) for s in t["text"].to_pylist()
        )
        return pa.table({"m": pa.array([n], pa.int64())})

    mass = ds.map_batches(certify, batch_format="pyarrow").sum("m")
    assert int(mass) == total_mass, "bigram mass mismatch"
    return ds.map_batches(score, batch_format="pyarrow").sort("doc_id")


def image_ar_bucket_pack(sf_dir: str):
    """Aspect-ratio bucketing + per-bucket batch packing (the SDXL
    multi-resolution training layout): every training batch holds
    images of ONE target resolution.  Dimensions are synthesized
    deterministically from ``p_partkey`` (integer arithmetic — SQL
    reproduces them exactly); assignment is a vectorized linear-ratio
    argmin (IEEE division/compare only, bit-reproducible vs the
    oracle); packing spreads hot buckets over (bucket, key-range)
    cells via ``grouped_row_number`` so no bucket collapses into one
    task."""
    from ..functions.arbucket import assign_ar_buckets, pack_bucket_batches

    def dims(t: pa.Table) -> pa.Table:
        k = t["p_partkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "p_partkey": t["p_partkey"],
                "w": pa.array(64 + (k * 37) % 1984, pa.int64()),
                "h": pa.array(64 + (k * 101) % 1984, pa.int64()),
            }
        )

    ds = _read(sf_dir, "part", ["p_partkey"]).map_batches(
        dims, batch_format="pyarrow"
    )
    packed = pack_bucket_batches(
        assign_ar_buckets(ds, "w", "h"),
        order_by=["p_partkey"],
        ascending=[True],
        batch_size=64,
    )
    return packed.map_batches(
        lambda t: t.select(
            ["p_partkey", "bucket_id", "bucket_w", "bucket_h",
             "batch_idx", "slot"]
        ),
        batch_format="pyarrow",
    ).sort("p_partkey")


AR_BUCKET_SQL = """
WITH dims AS (
  SELECT p_partkey,
         64 + (p_partkey * 37) % 1984 AS w,
         64 + (p_partkey * 101) % 1984 AS h
  FROM part
), buckets(bucket_id, bw, bh) AS (
  VALUES (0, 1024, 1024), (1, 1152, 896), (2, 896, 1152),
         (3, 1280, 768), (4, 768, 1280), (5, 1536, 640), (6, 640, 1536)
), assigned AS (
  SELECT p_partkey, bucket_id, bw, bh,
         row_number() OVER (
           PARTITION BY p_partkey
           ORDER BY abs(CAST(w AS DOUBLE) / h - CAST(bw AS DOUBLE) / bh),
                    bucket_id
         ) AS rk
  FROM dims CROSS JOIN buckets
), ranked AS (
  SELECT p_partkey, bucket_id, bw, bh,
         row_number() OVER (
           PARTITION BY bucket_id ORDER BY p_partkey
         ) - 1 AS rn
  FROM assigned WHERE rk = 1
)
SELECT p_partkey,
       CAST(bucket_id AS BIGINT) AS bucket_id,
       CAST(bw AS BIGINT) AS bucket_w,
       CAST(bh AS BIGINT) AS bucket_h,
       CAST(rn // 64 AS BIGINT) AS batch_idx,
       CAST(rn % 64 AS BIGINT) AS slot
FROM ranked ORDER BY p_partkey
"""


def part_name_fuzzy_join(sf_dir: str):
    """Fuzzy self-join: distinct part-name pairs within edit distance 1
    (typo-class near-dups) via FastSS deletion-neighborhood blocking —
    perfect recall by construction, exact edit-distance verification in
    the bucket kernel, pair dedup by combiner groupby.  The vocabulary
    is deduplicated FIRST (a distinct-keys combiner shuffle) so
    identical strings can't explode buckets quadratically."""
    vocab = partial_sum_groupby(
        _read(sf_dir, "part", ["p_name"]), ["p_name"], {}, count_as="__n"
    ).map_batches(
        lambda t: t.select(["p_name"]), batch_format="pyarrow"
    )
    return D.edit1_pairs(vocab, "p_name", num_partitions=16)


FUZZY_SQL = """
WITH v AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS a_name, b.p_name AS b_name
FROM v a JOIN v b ON a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= 1
"""


def favorite_event_type(sf_dir: str):
    """Per-group MODE (most frequent value, deterministic min-value
    tie-break): per-(user, type) combiner counts, then the distributed
    top-1-per-key window — the shuffle carries one row per (user, type)
    per batch and the rank stage sees only the count table."""
    from ..functions.agg import grouped_topk

    counts = partial_sum_groupby(
        _read(sf_dir, "events", ["user_id", "event_type"]),
        ["user_id", "event_type"],
        {},
        count_as="n",
    )
    top = grouped_topk(
        counts, keys=["user_id"],
        order_by=["n", "event_type"], ascending=[False, True], k=1,
    )
    return top.map_batches(
        lambda t: t.select(["user_id", "event_type", "n"]),
        batch_format="pyarrow",
    )


MODE_SQL = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1
"""


def orders_global_rank(sf_dir: str):
    """Global ``row_number() OVER (ORDER BY ...)`` on every row — the
    distributed-sort shape: range-partition by an exact-histogram bound
    pick, local sort per range, prefix-sum the P partition counts on
    the driver (P scalars, never rows), vectorized offset add.  Total
    order pinned by (cents DESC, o_orderkey ASC)."""
    from ..functions.sort import global_row_number

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda t: pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "cents": pa.array(_cents(t["o_totalprice"])),
            }
        ),
        batch_format="pyarrow",
    )
    return global_row_number(
        ds, order_by=["cents", "o_orderkey"], ascending=[False, True],
        out_col="rank", num_partitions=16,
    )


GLOBAL_RANK_SQL = f"""
SELECT o_orderkey, cents,
       CAST(row_number() OVER (ORDER BY cents DESC, o_orderkey)
            AS BIGINT) AS rank
FROM (SELECT o_orderkey,
             {_CENTS_SQL.format(expr='o_totalprice')} AS cents
      FROM orders)
"""


def weighted_sample_orders(sf_dir: str, k: int = 100):
    """Weighted sampling without replacement (Efraimidis-Spirakis A-ES,
    public algorithm): each row draws u from the SAME deterministic
    md5-derived uniform the oracle evaluates and keys itself with
    -ln(u)/w (w = total price) — the global k smallest keys are an
    exact weighted sample, reproducible across engines/runs/parallelism.
    Scale shape: per-batch partial top-k (each block forwards k rows,
    never the block), tiny global merge.  ``math.log`` (libm scalar)
    keeps the key bit-identical to DuckDB's ``ln``; numpy's SIMD log
    does not."""
    import hashlib
    import math as _math

    def keyed(t: pa.Table) -> pa.Table:
        ids = t["o_orderkey"].to_pylist()
        ws = t["o_totalprice"].to_pylist()
        keys = []
        for i, w in zip(ids, ws):
            u = int(
                hashlib.md5(str(i).encode()).hexdigest()[:13], 16
            ) / float(16 ** 13)
            keys.append(-_math.log(u) / w)
        out = pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": t["o_totalprice"],
                "__key": pa.array(keys, pa.float64()),
            }
        )
        # per-batch combiner: only k candidates leave each block
        idx = pc.select_k_unstable(
            out, k, [("__key", "ascending"), ("o_orderkey", "ascending")]
        )
        return out.take(idx)

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        keyed, batch_format="pyarrow"
    )
    top = ds.sort(["__key", "o_orderkey"]).limit(k)
    return top.map_batches(
        lambda t: t.select(["o_orderkey", "o_totalprice"]),
        batch_format="pyarrow",
    )


WEIGHTED_SAMPLE_SQL = """
SELECT o_orderkey, o_totalprice FROM (
  SELECT o_orderkey, o_totalprice,
         -ln(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)),
                                      1, 13)) AS BIGINT)
             / CAST(POWER(16, 13) AS DOUBLE)) / o_totalprice AS key
  FROM orders
  ORDER BY key, o_orderkey LIMIT 100)
"""


def events_sessionize_streaming(sf_dir: str):
    """The STREAMING sessionizer (micro-batch replay through the
    stateful actor pool, watermark barrier per batch, buffered
    event-time fold) — same 30-min-gap semantics and the SAME DuckDB
    oracle as the batch ``events_sessionize``: batch/streaming
    equivalence is the gate."""
    from .streaming import streaming_sessionize

    return streaming_sessionize(
        f"{sf_dir}/events.parquet", n_microbatches=8, n_actors=4
    )


def events_ewma(sf_dir: str, alpha: float = 0.3, detail: bool = False):
    """Per-user exponentially weighted moving average of ``value`` in
    event-time order — the RECURSIVE window (state folds forward), not
    expressible in single-pass SQL: partition by key, sort inside the
    partition, one vectorized pandas ``ewm`` per user.  Output is the
    LAST smoothed value per user (compact, deterministic).  Rows-only
    gate; the recursion is pinned by a closed-form check in tests.

    DRIVER-VERIFIED (round 5): ``n_events`` per user is the SQL anchor
    (GROUP BY count) and ``match`` certifies the pandas ``ewm`` result
    against a scalar Python recurrence recompute (s' = s + α(x − s))
    per user inside the same group — two independent implementations of
    the recursion, compared to 1e-9 relative (ulp-order differences
    between the vectorized and scalar fold are legitimate)."""

    def run(g: pd.DataFrame, _a=alpha, _d=detail) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        sm = g["value"].ewm(alpha=_a, adjust=False).mean()
        last = float(sm.iloc[-1])
        if _d:  # smoothed micro-unit value for tests
            return pd.DataFrame(
                {
                    "user_id": [g["user_id"].iloc[0]],
                    "n_events": [np.int64(len(g))],
                    "ewma_e6": [np.int64(np.floor(last * 1e6 + 0.5))],
                }
            )
        s = None
        for x in g["value"].tolist():
            s = x if s is None else s + _a * (x - s)
        match = abs(s - last) <= 1e-9 * max(1.0, abs(last))
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_events": [np.int64(len(g))],
                "match": [bool(match)],
            }
        )

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"]),
        "user_id",
        run,
        num_partitions=16,
    )


def economy_revenue_share(sf_dir: str):
    """Multi-table conditional-aggregate join (the TPC-H q14 shape):
    per ship-month, the share of revenue from ECONOMY-type parts —
    lineitem joins part through the bucketed shuffle join (part side
    pre-projected to (key, is_econ) — one bool per part row crosses the
    wire), revenue in exact integer cents, the share a double computed
    from the exact ints with the same expression both sides."""
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["p_partkey"],
                "is_econ": pc.cast(
                    pc.equal(t["p_type"], "ECONOMY"), pa.int64()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: pa.table(
            {
                "l_partkey": t["l_partkey"],
                "month": pc.strftime(t["l_shipdate"], format="%Y-%m"),
                "rev_cents": pa.array(
                    _cents(
                        pc.multiply(
                            t["l_extendedprice"],
                            pc.subtract(
                                pa.scalar(1.0, pa.float64()),
                                t["l_discount"],
                            ),
                        )
                    )
                ),
            }
        ),
        batch_format="pyarrow",
    )
    joined = hash_bucket_join(li, part, on="l_partkey", buckets=16)
    agg = partial_sum_groupby(
        joined.map_batches(
            lambda t: pa.table(
                {
                    "month": t["month"],
                    "econ_cents": pc.multiply(
                        t["rev_cents"], t["is_econ"]
                    ),
                    "total_cents": t["rev_cents"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["month"],
        {"econ_cents": "econ_cents", "total_cents": "total_cents"},
    )
    return agg.map_batches(
        lambda t: t.append_column(
            "econ_share",
            pc.divide(
                pc.cast(t["econ_cents"], pa.float64()),
                pc.cast(t["total_cents"], pa.float64()),
            ),
        ),
        batch_format="pyarrow",
    )


ECON_SHARE_SQL = f"""
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         {_CENTS_SQL.format(expr='l_extendedprice * (1.0 - l_discount)')}
             AS rev_cents,
         CASE WHEN p_type = 'ECONOMY' THEN 1 ELSE 0 END AS is_econ
  FROM lineitem JOIN part ON l_partkey = p_partkey)
SELECT month,
       CAST(SUM(rev_cents * is_econ) AS BIGINT) AS econ_cents,
       CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
       CAST(CAST(SUM(rev_cents * is_econ) AS BIGINT) AS DOUBLE)
       / CAST(CAST(SUM(rev_cents) AS BIGINT) AS DOUBLE) AS econ_share
FROM j GROUP BY month
"""


def doc_bigram_pmi(sf_dir: str, k: int = 20, min_count: int = 5):
    """Collocation mining — top-k bigrams by PMI ratio
    n·c(x,y) / (c(x)·c(y)) over the corpus: one vectorized pass builds
    within-doc adjacent pairs from Arrow list offsets (no Python
    per-row loop), unigram and bigram counts share one melted combiner
    shuffle, two bucket joins attach the marginals, and the ranking
    double is the same IEEE expression the oracle evaluates on the same
    exact int64 counts.  The classic phrase-extraction pass of an LLM
    data pipeline."""

    def partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.fill_null(t["text"], ""), "[^a-z]+"
        )
        la = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        )
        flat = la.values
        offs = np.asarray(la.offsets)
        keep = pc.greater_equal(pc.utf8_length(flat), 2)
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(
            np.arange(len(la), dtype=np.int64), np.diff(offs)
        )[keep_np]
        flat2 = flat.filter(keep)
        same = doc_idx[:-1] == doc_idx[1:]
        idx = np.nonzero(same)[0]
        w1 = flat2.take(pa.array(idx, pa.int64()))
        w2 = flat2.take(pa.array(idx + 1, pa.int64()))
        # melted: unigrams carry the "" sentinel (tokens are len>=2, so
        # no real bigram collides)
        melted = pa.table(
            {
                "w1": pa.concat_arrays(
                    [flat2.combine_chunks() if isinstance(flat2, pa.ChunkedArray) else flat2, w1]
                ),
                "w2": pa.concat_arrays(
                    [
                        pa.array([""] * len(flat2), pa.string()),
                        w2,
                    ]
                ),
            }
        )
        return melted.group_by(["w1", "w2"]).aggregate(
            [([], "count_all")]
        ).rename_columns(["w1", "w2", "n"])

    counts = partial_sum_groupby(
        _read(sf_dir, "documents", ["text"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["w1", "w2"],
        {"n": "n"},
    ).materialize()  # O(vocab + bigram-vocab) rows

    uni = counts.map_batches(
        lambda t: t.filter(pc.equal(t["w2"], "")).select(["w1", "n"]),
        batch_format="pyarrow",
    )
    total = int(uni.sum("n"))
    bg = counts.map_batches(
        lambda t: t.filter(
            pc.and_(
                pc.not_equal(t["w2"], ""),
                pc.greater_equal(t["n"], min_count),
            )
        ).rename_columns(["w1", "w2", "c_xy"]),
        batch_format="pyarrow",
    )
    jx = hash_bucket_join(
        bg,
        uni.map_batches(
            lambda t: t.rename_columns(["w1", "c_x"]),
            batch_format="pyarrow",
        ),
        on="w1",
        buckets=8,
    )
    jxy = hash_bucket_join(
        jx,
        uni.map_batches(
            lambda t: t.rename_columns(["w2", "c_y"]),
            batch_format="pyarrow",
        ),
        on="w2",
        buckets=8,
    )

    def score(t: pa.Table, _n=total) -> pa.Table:
        ratio = pc.divide(
            pc.multiply(
                pc.cast(t["c_xy"], pa.float64()),
                pa.scalar(float(_n), pa.float64()),
            ),
            pc.multiply(
                pc.cast(t["c_x"], pa.float64()),
                pc.cast(t["c_y"], pa.float64()),
            ),
        )
        return t.select(["w1", "w2", "c_xy", "c_x", "c_y"]).append_column(
            "pmi_ratio", ratio
        )

    return (
        jxy.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_ratio", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


PMI_SQL = """
WITH d AS (SELECT doc_id, regexp_extract_all(text, '[a-z]{2,}') AS ts
           FROM documents),
toks AS (
  SELECT u.p[1] AS w1, u.p[2] AS w2
  FROM d, unnest(list_zip(d.ts[1:len(d.ts)-1], d.ts[2:len(d.ts)])) u(p)),
uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(ts) AS term FROM d) GROUP BY term),
n AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM uni),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_xy
       FROM toks GROUP BY w1, w2 HAVING COUNT(*) >= 5)
SELECT bg.w1, bg.w2, bg.c_xy, a.c AS c_x, b.c AS c_y,
       CAST(bg.c_xy AS DOUBLE) * CAST(n.total AS DOUBLE)
       / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE)) AS pmi_ratio
FROM bg
JOIN uni a ON bg.w1 = a.term
JOIN uni b ON bg.w2 = b.term
CROSS JOIN n
ORDER BY pmi_ratio DESC, bg.w1, bg.w2 LIMIT 20
"""


def user_event_path(sf_dir: str):
    """Ordered group-concat (``string_agg ... ORDER BY``): per user, the
    comma-joined event-type path in event-time order — partition by
    key, sort inside the partition, one vectorized join per group.  The
    canonical session-path feature column."""

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "path": [",".join(g["event_type"])],
            }
        )

    return grouped_apply(
        _read(sf_dir, "events", ["user_id", "ts", "event_id",
                                 "event_type"]),
        "user_id",
        run,
        num_partitions=16,
    )


PATH_SQL = """
SELECT user_id,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS path
FROM events GROUP BY user_id
"""


def label_centroids(sf_dir: str):
    """Per-label embedding centroid in EXACT e6 fixed point: each value
    quantizes to floor(v·1e6 + 0.5) BEFORE summing (int64 sums are
    order-independent, so the distributed combiner matches the oracle
    bit-for-bit — float sums would not), melted to one (label, dim)
    row per batch.  The class-prototype table of an embedding corpus."""

    def partial(t: pa.Table) -> pa.Table:
        mat = _stack_embeddings(t["embedding"]).astype(np.float64)
        q = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        labels = t["label"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        k, d = len(uniq), q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, inv, q)
        n = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(
                    np.repeat(uniq.astype(np.int64), d), pa.int64()
                ),
                "dim": pa.array(
                    np.tile(np.arange(1, d + 1, dtype=np.int64), k),
                    pa.int64(),
                ),
                "sum_e6": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(n, d), pa.int64()),
            }
        )

    return partial_sum_groupby(
        _read(sf_dir, "embeddings", ["label", "embedding"]).map_batches(
            partial, batch_format="pyarrow"
        ),
        ["label", "dim"],
        {"sum_e6": "sum_e6", "n": "n"},
    )


CENTROID_SQL = """
SELECT label, dim,
       CAST(SUM(CAST(floor(embedding[dim] * 1e6 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_e6,
       CAST(COUNT(*) AS BIGINT) AS n
FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS dim)
GROUP BY label, dim
"""


def partitioned_delete_docs(sf_dir: str):
    """Retention / targeted-delete pass over the partitioned corpus:
    write documents partitioned by lang, delete every doc_id divisible
    by 7 via per-partition compaction tasks (only partitions holding
    matches rewrite; publish is atomic, receipts verified against
    parquet footers), then stream the corpus back and aggregate — the
    oracle filters the same predicate straight off the source table."""
    import shutil
    import tempfile as _tempfile

    from ..sources.partitioned import (
        delete_from_partitioned,
        write_partitioned_parquet,
    )

    out = _tempfile.mkdtemp(prefix="docs_delete_", dir="/tmp")
    shutil.rmtree(out, ignore_errors=True)
    write_partitioned_parquet(
        _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"]),
        out,
        key_col="lang",
    )
    def _div7(t: pa.Table):
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.array(ids % 7 == 0)

    delete_from_partitioned(out, key_col="lang", predicate=_div7)
    back = rd.read_parquet(out)
    return partial_sum_groupby(
        back,
        ["lang"],
        {"n_chars": "sum_nchars"},
        count_as="n_docs",
    )


DELETE_SQL = """
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sum_nchars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents WHERE doc_id % 7 <> 0
GROUP BY lang
"""


def events_distinct_users_streaming(sf_dir: str):
    """Streaming exact COUNT(DISTINCT): micro-batch replay through
    hash-partitioned distinct-state actors (disjoint key partitions sum
    exactly; ``state/cuckoo.py`` is the named 10^10-key swap-in) —
    same oracle as a batch COUNT(DISTINCT user_id)."""
    from .streaming import streaming_distinct

    n = streaming_distinct(
        f"{sf_dir}/events.parquet", col="user_id",
        n_microbatches=6, n_actors=4,
    )
    return pa.table({"n_users": pa.array([n], pa.int64())})


DISTINCT_STREAM_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users FROM events
"""


def events_enrich_streaming(sf_dir: str):
    """Streaming stream-table join: the customer dimension loads into
    hash-partitioned ``EnrichState`` actors worker-side, event
    micro-batches route (user_id-derived custkey, exact cents) to the
    owning partition, per-segment aggregates fold in actor state.  The
    DuckDB oracle is the batch join+groupby twin — exact equivalence is
    the streaming join's correctness gate."""
    from .streaming import streaming_enrich

    return streaming_enrich(
        f"{sf_dir}/events.parquet", f"{sf_dir}/customer.parquet",
        n_microbatches=6, n_actors=4,
    )


ENRICH_STREAM_SQL = f"""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM({_CENTS_SQL.format(expr='value')}) AS BIGINT)
           AS sum_value_cents
FROM events e
JOIN customer c
  ON c.c_custkey = e.user_id % (SELECT COUNT(*) FROM customer) + 1
GROUP BY c_mktsegment
"""


def doc_heavy_terms_streaming(sf_dir: str):
    """Streaming exact heavy hitters: micro-batch replay into
    hash-partitioned Misra-Gries state actors (each actor owns its items
    outright, so the per-partition retention guarantee keeps the
    candidate set complete), then one exact recount pass — the same
    output and DuckDB oracle as the batch ``doc_heavy_terms``."""
    from .streaming import streaming_heavy_terms

    return streaming_heavy_terms(
        f"{sf_dir}/documents.parquet", phi=0.001, k=4096,
        n_microbatches=6, n_actors=4,
    )


def evolved_schema_read(sf_dir: str):
    """Schema-evolution ingestion: half the corpus is written in a v1
    layout (no ``lang`` column), half in v2 (with it) — the unified
    read fills typed nulls for v1 rows (footer-schema unification, no
    data read at plan time) and one combiner aggregate proves row,
    value, and null fidelity against the source-of-truth table."""
    import tempfile as _tempfile

    from ..sources.partitioned import read_evolved_parquet

    out = _tempfile.mkdtemp(prefix="docs_evolved_", dir="/tmp")
    docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
    docs.map_batches(
        lambda t: t.filter(
            pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0)
        ).select(["doc_id", "n_chars"]),  # v1: no lang column
        batch_format="pyarrow",
    ).write_parquet(f"{out}/v1")
    docs.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["doc_id"], 1), 1)),
        batch_format="pyarrow",
    ).write_parquet(f"{out}/v2")
    import glob as _glob

    ds, schema = read_evolved_parquet(
        _glob.glob(f"{out}/v1/*.parquet") + _glob.glob(f"{out}/v2/*.parquet")
    )
    assert "lang" in schema.names
    return partial_sum_groupby(
        ds.map_batches(
            lambda t: pa.table(
                {
                    "has_lang": pc.cast(
                        pc.is_valid(t["lang"]), pa.int64()
                    ),
                    "n_chars": t["n_chars"],
                }
            ),
            batch_format="pyarrow",
        ),
        ["has_lang"],
        {"n_chars": "sum_nchars"},
        count_as="n_docs",
    )


EVOLVED_SQL = """
SELECT CAST(doc_id % 2 AS BIGINT) AS has_lang,
       CAST(SUM(n_chars) AS BIGINT) AS sum_nchars,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents GROUP BY 1
"""


def events_hourly_streaming(sf_dir: str):
    """Event-time tumbling windows through the watermark engine
    (`pipelines/streaming.py:streaming_hourly_counts`): rows replay in
    ARRIVAL order (event-id ranges, deliberately out of event-time
    order), window-hash-partitioned actors accumulate, the driver folds
    per-batch max-event-time scalars into the global watermark.  Run
    with unbounded lateness the result equals the batch
    ``events_hourly`` EXACTLY — same DuckDB oracle.  Finite-lateness
    drop semantics are pinned in tests."""
    from .streaming import streaming_hourly_counts

    ds, dropped = streaming_hourly_counts(
        f"{sf_dir}/events.parquet", n_microbatches=6, n_actors=4,
        allowed_lateness_us=None,
    )
    assert dropped == 0  # unbounded lateness drops nothing
    return ds


def dedup_substring_spans(sf_dir: str):
    """Exact cross-document duplicated-substring spans (the Lee et al.
    2022 suffix-array dedup shape as one gram-keyed shuffle): every
    32-char gram shared verbatim by >= 2 docs marks its range, ranges
    merge per doc into maximal spans.  Exact ``key="gram"`` mode (UTF-32
    byte keys — what the oracle checks); the hashed-key 100 TB variant
    is asserted equal in tests.  See
    :func:`parsel_ray.functions.dedup.duplicated_substring_spans`."""
    return D.duplicated_substring_spans(
        _read(sf_dir, "documents", ["doc_id", "text"]),
        L=32, key="gram", num_partitions=16,
    )


SUBSTR_SPANS_SQL = """
WITH grams AS (
  SELECT doc_id, CAST(u.p AS BIGINT) AS pos,
         substr(text, CAST(u.p AS INTEGER) + 1, 32) AS gram
  FROM documents,
       UNNEST(range(0, GREATEST(length(COALESCE(text, '')) - 31, 0))) AS u(p)
),
shared AS (
  SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
),
marked AS (
  SELECT g.doc_id, g.pos FROM grams g JOIN shared s USING (gram)
),
flagged AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(
                lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                -2147483648) + 32
              THEN 1 ELSE 0 END AS brk
  FROM marked
),
islands AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
  FROM flagged
)
SELECT doc_id, MIN(pos) AS span_start, MAX(pos) + 32 AS span_end,
       MAX(pos) + 32 - MIN(pos) AS span_chars
FROM islands GROUP BY doc_id, gid
"""


def semdedup_embeddings(sf_dir: str):
    """SemDeDup (Abbas et al. 2023): k-means cells over the embedding
    corpus, drop rows with a >= 0.5-cosine earlier neighbor in the same
    cell.  Centroids train on a seeded distributed ``random_sample``
    (driver holds only the k x D matrix, broadcast back via ``ray.put``);
    the per-cell dedup mask is one matmul + triu-any per cell.  Rows-only
    gate (k-means cells are not SQL-expressible); planted-duplicate
    recall and the drop-rule contract are pinned in tests.  See
    :func:`parsel_ray.functions.similarity.semdedup`."""
    from ..functions.similarity import semdedup, train_centroids

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n = ds.count()  # parquet metadata only — no scan
    frac = min(1.0, 8192.0 / max(n, 1))
    sample = ds.random_sample(frac, seed=42).take_batch(
        16384, batch_format="pyarrow"
    )
    cent = train_centroids(_stack_embeddings(sample["embedding"]), k=8)
    surv = semdedup(
        ds, ray.put(cent), threshold=0.5, num_partitions=8
    ).select_columns(["vec_id", "ivf_cell"]).materialize()
    # DRIVER-VERIFIED (round 5): corpus size is the SQL anchor; the
    # survivor set must be a non-empty proper subset-or-all with every
    # cell id in range — the survivor rows themselves stay pinned by
    # the planted-duplicate tests.
    n_surv = surv.count()
    cell_min = surv.min("ivf_cell")
    cell_max = surv.max("ivf_cell")
    return pa.table(
        {
            "n_vecs": pa.array([n], pa.int64()),
            "survivors_ok": pa.array([bool(0 < n_surv <= n)]),
            "cells_ok": pa.array([bool(0 <= cell_min and cell_max < 8)]),
        }
    )


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "filter_highvalue_orders": filter_highvalue_orders,
    "distinct_event_types": distinct_event_types,
    "top5_parts": top5_parts,
    "events_hourly": events_hourly,
    "events_hourly_ivm": events_hourly_ivm,
    "events_sessionize": events_sessionize,
    "events_sliding_hourly": events_sliding_hourly,
    "events_running_count": events_running_count,
    "embedding_ivf_knn": embedding_ivf_knn,
    "embedding_ivf_pruned_knn": embedding_ivf_pruned_knn,
    "nation_customer_agg": nation_customer_agg,
    "hash_join_priority": hash_join_priority,
    "events_asof_order": events_asof_order,
    "events_range_count": events_range_count,
    "bloom_prefilter_join": bloom_prefilter_join,
    "price_quantiles": price_quantiles,
    "price_quantiles_sketch": price_quantiles_sketch,
    "llm_data_prep": _llm_data_prep_entry,
    "extract_attr_roundtrip": extract_attr_roundtrip,
    "extract_links": extract_links,
    "extract_attrib_map": extract_attrib_map,
    "extract_regex_first": extract_regex_first,
    "jmespath_props": jmespath_props,
    "doc_token_stats": doc_token_stats,
    "sequence_packing": sequence_packing,
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_cdc_docs": dedup_cdc_docs,
    "doc_dup_ngram_coverage": doc_dup_ngram_coverage,
    "doc_bpe_train": doc_bpe_train,
    "indexed_point_lookup": indexed_point_lookup,
    "zorder_range_scan": zorder_range_scan,
    "doc_quality_logreg": doc_quality_logreg,
    "doc_quality_auc": doc_quality_auc,
    "events_value_trend": events_value_trend,
    "doc_sparse_cosine_top1": doc_sparse_cosine_top1,
    "embedding_knn": embedding_knn,
    "embedding_near_dup": embedding_near_dup,
    # rows-only (non-SQL-expressible)
    "dedup_minhash": dedup_minhash,
    "dedup_simhash": dedup_simhash,
    "decontaminate_docs": decontaminate_docs,
    "template_cluster": template_cluster,
    "langid_guess": langid_guess,
    "doc_rolling_fingerprint": doc_rolling_fingerprint,
    "embedding_near_dup_lsh": embedding_near_dup_lsh,
    "doc_quality": doc_quality,
    "doc_compression_ratio": doc_compression_ratio,
    "q6_revenue": q6_revenue,
    "q4_late_orders": q4_late_orders,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q11_important_parts": q11_important_parts,
    "q16_supplier_counts": q16_supplier_counts,
    "q20_excess_suppliers": q20_excess_suppliers,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q10_returned_revenue": q10_returned_revenue,
    "q14_promo_revenue": q14_promo_revenue,
    "q17_small_quantity": q17_small_quantity,
    "q19_brand_disjunction": q19_brand_disjunction,
    "q12_priority_lines": q12_priority_lines,
    "q13_order_distribution": q13_order_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q22_idle_customers": q22_idle_customers,
    "q2_min_price_suppliers": q2_min_price_suppliers,
    "events_hour_gaps": events_hour_gaps,
    "dq_orders_checks": dq_orders_checks,
    "orders_cdc_merge": orders_cdc_merge,
    "bucketed_storage_join": bucketed_storage_join,
    "versioned_time_travel": versioned_time_travel,
    "lineitem_pareto": lineitem_pareto,
    "lineitem_reachability": lineitem_reachability,
    "q18_large_orders": q18_large_orders,
    "top_order_per_customer": top_order_per_customer,
    "orders_minmax": orders_minmax,
    "deterministic_sample": deterministic_sample,
    "union_counts": union_counts,
    "partitioned_write_docs": partitioned_write_docs,
    "compact_partitioned_docs": compact_partitioned_docs,
    "pruned_partitioned_read": pruned_partitioned_read,
    "doc_bpe_tokens": doc_bpe_tokens,
    "hash_join_native": hash_join_native,
    "phash_near_dup": phash_near_dup,
    "image_corpus_prep": image_corpus_prep_q,
    "training_batch_prep": training_batch_prep_q,
    "crawl_demo": crawl_demo,
    "crawl_pop_order": crawl_pop_order,
    "crawl_image_verify": crawl_image_verify,
    "image_decode_stats": image_decode_stats,
    "image_resize": image_resize,
    "image_resize_bilinear": image_resize_bilinear,
    "audio_spectral_bands": audio_spectral_bands,
    "image_quality_signals": image_quality_signals,
    "audio_frame_rms": audio_frame_rms,
    "audio_silence_segments": audio_silence_segments,
    "image_jpeg_roundtrip": image_jpeg_roundtrip,
    "image_jpeg_progressive": image_jpeg_progressive,
    "image_png_roundtrip": image_png_roundtrip,
    "image_gif_roundtrip": image_gif_roundtrip,
    "image_bmp_roundtrip": image_bmp_roundtrip,
    "image_header_sniff": image_header_sniff,
    "image_blur_detect": image_blur_detect,
    "caption_alignment": caption_alignment,
    "image_region_count": image_region_count,
    "content_type_route": content_type_route,
    "video_frame_sample": video_frame_sample,
    "video_shot_boundaries": video_shot_boundaries,
    "doc_term_df": doc_term_df,
    "doc_tfidf_top_term": doc_tfidf_top_term,
    "top3_orders_per_customer": top3_orders_per_customer,
    "events_distinct_users_hll": events_distinct_users_hll,
    "doc_heavy_terms": doc_heavy_terms,
    "doc_heavy_terms_streaming": doc_heavy_terms_streaming,
    "lineitem_grouped_quantiles": lineitem_grouped_quantiles,
    "warc_extract_roundtrip": warc_extract_roundtrip,
    "events_user_distinct_by_type": events_user_distinct_by_type,
    "image_augment": image_augment,
    "embedding_pq_knn": embedding_pq_knn,
    "jsonl_roundtrip": jsonl_roundtrip,
    "events_value_quantiles_by_type": events_value_quantiles_by_type,
    "stratified_sample_orders": stratified_sample_orders,
    "events_type_pivot": events_type_pivot,
    "customers_without_orders": customers_without_orders,
    "events_lag_delta": events_lag_delta,
    "events_range_window": events_range_window,
    "doc_boolean_search": doc_boolean_search,
    "doc_paragraph_dedup": doc_paragraph_dedup,
    "events_value_mad": events_value_mad,
    "events_moving_sum": events_moving_sum,
    "events_type_unpivot": events_type_unpivot,
    "docs_rollup": docs_rollup,
    "sitemap_extract": sitemap_extract,
    "sitemap_urlset_extract": sitemap_urlset_extract,
    "unicode_nfc_normalize": unicode_nfc_normalize,
    "doc_chunking": doc_chunking,
    "boilerplate_removal": boilerplate_removal,
    "doc_lm_perplexity": doc_lm_perplexity,
    "events_forward_fill": events_forward_fill,
    "lineitem_profile": lineitem_profile,
    "events_funnel": events_funnel,
    "lineitem_corr": lineitem_corr,
    "price_quantiles_cont": price_quantiles_cont,
    "docs_cube": docs_cube,
    "docs_grouping_sets": docs_grouping_sets,
    "events_intersect_users": events_intersect_users,
    "events_except_hours": events_except_hours,
    "events_props_k_sum": events_props_k_sum,
    "recrawl_priority": recrawl_priority,
    "events_value_histogram": events_value_histogram,
    "doc_url_regex_groups": doc_url_regex_groups,
    "kmeans_embeddings": kmeans_embeddings,
    "embedding_pca_project": embedding_pca_project,
    "customer_order_full_outer": customer_order_full_outer,
    "web_pagerank": web_pagerank,
    "anchor_text_index": anchor_text_index,
    "lineitem_triangles": lineitem_triangles,
    "orc_roundtrip": orc_roundtrip,
    "tar_shard_roundtrip": tar_shard_roundtrip,
    "image_ar_bucket_pack": image_ar_bucket_pack,
    "epoch_shuffle_split": epoch_shuffle_split,
    "doc_repetition_stats": doc_repetition_stats,
    "pii_redaction": pii_redaction,
    "source_balance_resample": source_balance_resample,
    "arrow_ipc_roundtrip": arrow_ipc_roundtrip,
    "events_cume_dist": events_cume_dist,
    "events_percent_rank": events_percent_rank,
    "events_first_last_value": events_first_last_value,
    "events_ntile": events_ntile,
    "csv_roundtrip": csv_roundtrip,
    "part_name_fuzzy_join": part_name_fuzzy_join,
    "favorite_event_type": favorite_event_type,
    "orders_global_rank": orders_global_rank,
    "weighted_sample_orders": weighted_sample_orders,
    "events_sessionize_streaming": events_sessionize_streaming,
    "events_ewma": events_ewma,
    "economy_revenue_share": economy_revenue_share,
    "doc_bigram_pmi": doc_bigram_pmi,
    "user_event_path": user_event_path,
    "label_centroids": label_centroids,
    "partitioned_delete_docs": partitioned_delete_docs,
    "events_distinct_users_streaming": events_distinct_users_streaming,
    "events_enrich_streaming": events_enrich_streaming,
    "evolved_schema_read": evolved_schema_read,
    "events_hourly_streaming": events_hourly_streaming,
    "dedup_substring_spans": dedup_substring_spans,
    "semdedup_embeddings": semdedup_embeddings,
    "image_exif_orientation": image_exif_orientation,
    "phash_rotated_dedup": phash_rotated_dedup,
    "phash_rotated_near_dup": phash_rotated_near_dup,
    "image_ssim_verify": image_ssim_verify,
}

ORACLE_SQL = {
    # driver-visible certifications (round 5): per-row kernel-vs-
    # reference-recompute matches and structural cert anchors
    "langid_guess": MATCH_DOCS_SQL,
    "doc_quality": MATCH_DOCS_SQL,
    "doc_compression_ratio": MATCH_DOCS_SQL,
    "doc_rolling_fingerprint": MATCH_DOCS_SQL,
    "dedup_simhash": MATCH_DOCS_SQL,
    "price_quantiles_sketch": QSKETCH_SQL,
    "doc_bpe_train": BPE_CERT_SQL,
    "doc_quality_logreg": LOGREG_CERT_SQL,
    "dedup_minhash": MINHASH_CERT_SQL,
    "dedup_cdc_docs": CDC_CERT_SQL,
    "embedding_ivf_knn": IVF_CERT_SQL,
    "embedding_ivf_pruned_knn": IVF_PRUNED_CERT_SQL,
    "embedding_near_dup_lsh": LSH_CERT_SQL,
    "llm_data_prep": LLM_PREP_SQL,
    "events_distinct_users_hll": HLL_CERT_SQL,
    "embedding_pq_knn": PQ_CERT_SQL,
    "kmeans_embeddings": KMEANS_CERT_SQL,
    "embedding_pca_project": PCA_CERT_SQL,
    "web_pagerank": PAGERANK_SQL,
    "crawl_demo": CRAWL_DEMO_SQL,
    "crawl_pop_order": CRAWL_POPS_SQL,
    "crawl_image_verify": CRAWL_VERIFY_SQL,
    "image_decode_stats": DECODE_STATS_SQL,
    "phash_near_dup": PHASH_PAIRS_SQL,
    "image_resize": RESIZE_SQL,
    "image_augment": AUGMENT_SQL,
    "anchor_text_index": ANCHOR_SQL,
    "image_corpus_prep": IMG_PREP_SQL,
    "training_batch_prep": BATCH_PREP_SQL,
    "semdedup_embeddings": SEMDEDUP_CERT_SQL,
    "doc_lm_perplexity": PPL_CERT_SQL,
    "events_ewma": EWMA_CERT_SQL,
    "audio_frame_rms": AUDIO_RMS_SQL,
    "audio_spectral_bands": AUDIO_SPECTRAL_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "filter_highvalue_orders": FILTER_SQL,
    "distinct_event_types": DISTINCT_SQL,
    "top5_parts": TOP5_SQL,
    "events_hourly": HOURLY_SQL,
    "events_hourly_ivm": HOURLY_SQL,
    "events_sessionize": SESSION_SQL,
    "events_sliding_hourly": SLIDING_SQL,
    "events_running_count": RUNNING_SQL,
    "nation_customer_agg": NATION_SQL,
    "hash_join_priority": HASHJOIN_SQL,
    "events_asof_order": ASOF_SQL,
    "events_range_count": RANGE_SQL,
    "bloom_prefilter_join": BLOOM_SQL,
    "price_quantiles": QUANTILE_SQL,
    "extract_attr_roundtrip": ATTR_SQL,
    "extract_links": LINKS_SQL,
    "extract_attrib_map": ATTRIB_SQL,
    "extract_regex_first": REGEX_SQL,
    "jmespath_props": JMES_SQL,
    "doc_token_stats": TOKEN_SQL,
    "sequence_packing": PACKING_SQL,
    "dedup_exact": DEDUP_SQL,
    "dedup_ngram_jaccard": NGRAM_SQL,
    "decontaminate_docs": DECONTAM_SQL,
    "template_cluster": TEMPLATE_SQL,
    "lineitem_triangles": TRIANGLE_SQL,
    "doc_dup_ngram_coverage": DUP_NGRAM_SQL,
    "indexed_point_lookup": POINT_LOOKUP_SQL,
    "doc_sparse_cosine_top1": SPARSE_COS_SQL,
    "doc_quality_auc": AUC_SQL,
    "events_value_trend": TREND_SQL,
    "zorder_range_scan": ZORDER_SQL,
    "image_jpeg_roundtrip": JPEG_SQL,
    "image_jpeg_progressive": JPEG_SQL,
    "image_png_roundtrip": PNG_SQL,
    "image_gif_roundtrip": JPEG_SQL,
    "image_bmp_roundtrip": JPEG_SQL,
    "image_header_sniff": SNIFF_SQL,
    "image_blur_detect": BLUR_SQL,
    "caption_alignment": ALIGN_SQL,
    "image_region_count": REGION_SQL,
    "content_type_route": CTYPE_SQL,
    "image_resize_bilinear": RESIZE_BILINEAR_SQL,
    "image_quality_signals": IMG_QUALITY_SQL,
    "video_frame_sample": VIDEO_SQL,
    "video_shot_boundaries": SHOTS_SQL,
    "audio_silence_segments": VAD_SQL,
    "embedding_knn": KNN_SQL,
    "embedding_near_dup": NEARDUP_SQL,
    "q6_revenue": Q6_SQL,
    "q4_late_orders": Q4_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_parts": Q11_SQL,
    "q16_supplier_counts": Q16_SQL,
    "q20_excess_suppliers": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
    "q10_returned_revenue": Q10_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q17_small_quantity": Q17_SQL,
    "q19_brand_disjunction": Q19_SQL,
    "q12_priority_lines": Q12_SQL,
    "q13_order_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q22_idle_customers": Q22_SQL,
    "q2_min_price_suppliers": Q2_SQL,
    "events_hour_gaps": HOURGAP_SQL,
    "dq_orders_checks": DQ_SQL,
    "orders_cdc_merge": CDC_SQL,
    "bucketed_storage_join": BUCKETED_JOIN_SQL,
    "versioned_time_travel": TIME_TRAVEL_SQL,
    "lineitem_pareto": PARETO_SQL,
    "lineitem_reachability": REACH_SQL,
    "q18_large_orders": Q18_SQL,
    "top_order_per_customer": TOPCUST_SQL,
    "orders_minmax": MINMAX_SQL,
    "deterministic_sample": SAMPLE_SQL,
    "union_counts": UNION_SQL,
    "partitioned_write_docs": PARTWRITE_SQL,
    "compact_partitioned_docs": PARTWRITE_SQL,
    "pruned_partitioned_read": PRUNED_SQL,
    "doc_bpe_tokens": BPE_SQL,
    "hash_join_native": NATIVE_JOIN_SQL,
    "doc_term_df": TERMDF_SQL,
    "doc_tfidf_top_term": TFIDF_SQL,
    "top3_orders_per_customer": TOP3CUST_SQL,
    "doc_heavy_terms": HEAVY_SQL,
    "doc_heavy_terms_streaming": HEAVY_SQL,
    "lineitem_grouped_quantiles": GROUPQ_SQL,
    "warc_extract_roundtrip": WARC_SQL,
    "events_user_distinct_by_type": DISTINCT_BY_TYPE_SQL,
    "jsonl_roundtrip": JSONL_SQL,
    "events_value_quantiles_by_type": TDIGEST_BY_TYPE_SQL,
    "stratified_sample_orders": STRATIFIED_SQL,
    "events_type_pivot": PIVOT_SQL,
    "customers_without_orders": ANTI_SQL,
    "events_lag_delta": LAG_SQL,
    "events_range_window": RANGEWIN_SQL,
    "doc_boolean_search": BOOLSEARCH_SQL,
    "doc_paragraph_dedup": PARA_DEDUP_SQL,
    "events_value_mad": MAD_SQL,
    "events_moving_sum": MOVSUM_SQL,
    "events_type_unpivot": UNPIVOT_SQL,
    "docs_rollup": ROLLUP_SQL,
    "sitemap_extract": SITEMAP_SQL,
    "sitemap_urlset_extract": SITEMAP_URLSET_SQL,
    "unicode_nfc_normalize": NFC_SQL,
    "doc_chunking": CHUNK_SQL,
    "boilerplate_removal": BOILERPLATE_SQL,
    "events_forward_fill": FFILL_SQL,
    "lineitem_profile": PROFILE_SQL,
    "events_funnel": FUNNEL_SQL,
    "lineitem_corr": CORR_SQL,
    "price_quantiles_cont": QCONT_SQL,
    "docs_cube": CUBE_SQL,
    "docs_grouping_sets": GSETS_SQL,
    "events_intersect_users": INTERSECT_SQL,
    "events_except_hours": EXCEPT_SQL,
    "events_props_k_sum": PROPS_SQL,
    "recrawl_priority": RECRAWL_SQL,
    "events_value_histogram": HISTOGRAM_SQL,
    "doc_url_regex_groups": URL_GROUPS_SQL,
    "customer_order_full_outer": FULL_OUTER_SQL,
    "events_cume_dist": CUME_SQL,
    "events_percent_rank": PCT_RANK_SQL,
    "events_first_last_value": FIRST_LAST_SQL,
    "events_ntile": NTILE_SQL,
    "csv_roundtrip": CSV_SQL,
    "orc_roundtrip": CSV_SQL,
    "tar_shard_roundtrip": TAR_SQL,
    "image_ar_bucket_pack": AR_BUCKET_SQL,
    "epoch_shuffle_split": EPOCH_SHUFFLE_SQL,
    "doc_repetition_stats": REPETITION_SQL,
    "pii_redaction": PII_SQL,
    "source_balance_resample": SOURCE_BALANCE_SQL,
    "arrow_ipc_roundtrip": IPC_SQL,
    "part_name_fuzzy_join": FUZZY_SQL,
    "favorite_event_type": MODE_SQL,
    "orders_global_rank": GLOBAL_RANK_SQL,
    "weighted_sample_orders": WEIGHTED_SAMPLE_SQL,
    "events_sessionize_streaming": SESSION_SQL,
    "economy_revenue_share": ECON_SHARE_SQL,
    "doc_bigram_pmi": PMI_SQL,
    "user_event_path": PATH_SQL,
    "label_centroids": CENTROID_SQL,
    "partitioned_delete_docs": DELETE_SQL,
    "events_distinct_users_streaming": DISTINCT_STREAM_SQL,
    "events_enrich_streaming": ENRICH_STREAM_SQL,
    "evolved_schema_read": EVOLVED_SQL,
    "events_hourly_streaming": HOURLY_SQL,
    "dedup_substring_spans": SUBSTR_SPANS_SQL,
    "image_exif_orientation": EXIF_SQL,
    "phash_rotated_dedup": PHASH_ROT_SQL,
    "phash_rotated_near_dup": PHASH_ROT_SQL,
    "image_ssim_verify": SSIM_SQL,
}
