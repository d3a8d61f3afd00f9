"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init``/``ray.shutdown`` here or in the library code these callables
use.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build HTML pages from
    the documents table, run the parsel-parity CSS/XPath extraction kernel
    (map_batches over zero-copy Arrow), then vectorized token/quality
    scoring."""
    from parsel_ray.functions.text import quality_score, token_stats
    from parsel_ray.pipelines.queries import _doc_html, _read
    from parsel_ray.stages.extract import ExtractSpec, SelectorExtract

    sf = "/root/testdata/sf0.001"
    ds = _read(sf, "documents", ["doc_id", "text", "lang", "source"]).map_batches(
        _doc_html, batch_format="pyarrow"
    )
    extracted = ds.map_batches(
        SelectorExtract.bound(
            specs=[
                ExtractSpec("p_text", "css", "p.t::text", "get"),
                ExtractSpec("hrefs", "css", "a::attr(href)", "getall"),
                ExtractSpec("n_imgs", "xpath", "//a/img/@src", "count"),
            ],
            input_col="page",
            doc_type="html",
        ),
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
    )
    scored = extracted.map_batches(
        lambda t: quality_score(token_stats(t, "p_text"), "p_text"),
        batch_format="pyarrow",
    )
    return scored


def queries() -> dict[str, Callable[[str], Any]]:
    from parsel_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from parsel_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
