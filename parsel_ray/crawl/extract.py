"""Per-page extraction shared by the oracle and the distributed pipeline:
parsel-semantics CSS queries (a::attr(href), figure img@src + figcaption
text) over the engine's Selector kernel (crawl operator N6 built on [P]
operators Q1/Q2/E1-E4; reference semantics selector.py:562-728).

ONE implementation used by both sides — extraction equivalence is by
construction, and the conformance suite pins the kernel itself.
"""

from __future__ import annotations

from ..selector import Selector


def extract_page(body: bytes, encoding: str, url: str):
    """→ (links: list[str] in document order, figures: list[dict],
    base: str — the EFFECTIVE base for resolving the links: the page URL,
    refined by the first ``<base href>`` when present (itself resolved
    against the page URL, the HTML rule; scrapy honors it via
    ``response.urljoin``)).

    figures: {"image_id", "caption"} — image_id parsed from the img URL
    tail; caption is the entity-unescaped figcaption text.
    """
    from urllib.parse import urljoin

    sel = Selector(body=body, encoding=encoding or "utf-8", type="html",
                   base_url=url)
    base_href = sel.css("base::attr(href)").get()
    base = urljoin(url, base_href.strip()) if base_href else url
    links = sel.css("a::attr(href)").getall()
    figures = []
    for fig in sel.css("figure"):
        src = fig.css("img::attr(src)").get()
        cap = fig.css("figcaption::text").get()
        if not src:
            continue
        image_id = src.rstrip("/").rsplit("/", 1)[-1]
        figures.append({"image_id": image_id, "caption": cap or ""})
    return links, figures, base
