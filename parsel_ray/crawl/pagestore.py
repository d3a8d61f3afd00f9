"""Deterministic synthetic web: hosts, HTML pages with figures
(img + figcaption) and out-links, robots.txt, and the image corpus —
everything derived from (seed, host, page) hashes, no RNG state, so any
worker generates identical bytes (FIXTURES.md §2).

This is the fetcher backend (crawl operator N5's "network"): pages and
images are *generated* on lookup.  The host size distribution is skewed
(host 0 largest) to exercise hot-host handling.
"""

from __future__ import annotations

import hashlib
import html as _html
from dataclasses import dataclass

import numpy as np

from ..images.codecs import FORMATS, encode_image, phash64


def _h32(*parts) -> int:
    data = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.md5(data).digest()[:4], "little")


@dataclass(frozen=True)
class StoreConfig:
    n_hosts: int = 8
    pages_per_host: int = 40
    seed: int = 42
    malformed_every: int = 20  # 1/N pages get unclosed tags + a null byte
    latin1_every: int = 17     # 1/N pages are iso-8859-1 encoded
    # page weight knobs (bench configs raise these for realistic page cost)
    figures_base: int = 1
    figures_mod: int = 3
    links_base: int = 2
    links_mod: int = 4
    img_size_min: int = 16
    img_size_span: int = 49


class PageStore:
    def __init__(self, cfg: StoreConfig) -> None:
        self.cfg = cfg

    # -- topology ---------------------------------------------------------

    def host(self, h: int) -> str:
        return f"host-{h}.test"

    def n_pages(self, h: int) -> int:
        # zipf-ish skew: host 0 has pages_per_host, host h has /(h+1)
        return max(4, self.cfg.pages_per_host // (h + 1))

    def url(self, h: int, k: int) -> str:
        return f"http://{self.host(h)}/page/{k}"

    def _parse(self, url: str) -> "tuple[int, int] | None":
        try:
            hostpart, _, rest = url.partition("//")[2].partition("/")
            if not hostpart.startswith("host-") or not hostpart.endswith(".test"):
                return None
            if rest.split("/")[0] != "page":
                return None
            h, k = page_indices(url)
        except (ValueError, IndexError):
            return None
        if not (0 <= h < self.cfg.n_hosts and 0 <= k < self.n_pages(h)):
            return None
        return h, k

    # -- robots -----------------------------------------------------------

    def robots_txt(self, host: str) -> "str | None":
        try:
            h = int(host[5:-5])
        except (ValueError, IndexError):
            return None
        if not (0 <= h < self.cfg.n_hosts):
            return None
        if h % 5 == 4:
            return None  # some hosts have no robots file
        lines = ["User-agent: *"]
        for k in range(self.n_pages(h)):
            if _h32(self.cfg.seed, "robots", h, k) % 7 == 3:
                lines.append(f"Disallow: /page/{k}")
        return "\n".join(lines) + "\n"

    # -- figures & links (shared by page builder and golden corpus) -------

    def figures_of(self, h: int, k: int) -> list[dict]:
        nf = self.cfg.figures_base + _h32(self.cfg.seed, "nf", h, k) % self.cfg.figures_mod
        out = []
        for j in range(nf):
            iid = f"img-{h}-{k}-{j}"
            fmt = FORMATS[_h32(self.cfg.seed, "fmt", iid) % len(FORMATS)]
            cap = f"Caption {h}-{k}-{j}"
            if _h32(self.cfg.seed, "capent", iid) % 4 == 0:
                cap += ' with "quotes" & <entities>'
            out.append({"image_id": iid, "fmt": fmt, "caption": cap})
        return out

    def links_of(self, h: int, k: int) -> list[str]:
        """Raw (pre-canonicalization) hrefs as they appear in the HTML —
        deliberately dirty: relative paths, dot segments, uppercase hosts,
        default ports, unsorted query params."""
        nl = self.cfg.links_base + _h32(self.cfg.seed, "nl", h, k) % self.cfg.links_mod
        links = []
        for i in range(nl):
            r = _h32(self.cfg.seed, "link", h, k, i)
            if r % 5 == 0:  # cross-host
                th = (h + 1 + i) % self.cfg.n_hosts
                tk = r % self.n_pages(th)
                url = f"http://{self.host(th)}/page/{tk}"
                style = r % 4
                if style == 0:
                    url = url.replace("http://", "HTTP://").replace(
                        self.host(th), self.host(th).upper()
                    )
                elif style == 1:
                    url = url.replace(".test/", ".test:80/")
                elif style == 2:
                    url += "?b=2&a=1"
            else:  # same-host
                tk = (k * 2 + 1 + i) % self.n_pages(h)
                style = r % 3
                if style == 0:
                    url = f"/page/{tk}"
                elif style == 1:
                    url = f"../page/{tk}"
                else:
                    url = f"/page/./{tk}"
            links.append(url)
        return links

    # -- page HTML ---------------------------------------------------------

    def page(self, url: str) -> "tuple[bytes, str] | None":
        """(body bytes, encoding) or None (404)."""
        parsed = self._parse(url)
        if parsed is None:
            return None
        h, k = parsed
        figs = self.figures_of(h, k)
        links = self.links_of(h, k)
        fig_html = "".join(
            f'<figure><a href="{links[j % len(links)]}">'
            f'<img src="http://{self.host(h)}/img/{f["image_id"]}"/></a>'
            f"<figcaption>{_html.escape(f['caption'])}</figcaption></figure>"
            for j, f in enumerate(figs)
        )
        extra_links = "".join(
            f'<li><a href="{l}">link {i}</a></li>' for i, l in enumerate(links)
        )
        noise = (
            f'<div class="nav"><ul>{extra_links}</ul></div>'
            f'<div><p class="meta">page {k} of {self.host(h)}</p></div>'
        )
        body = (
            f"<html><head><base href=\"{url}\"><title>Page {h}-{k}</title></head>"
            f"<body>{fig_html}{noise}</body></html>"
        )
        if _h32(self.cfg.seed, "malformed", h, k) % self.cfg.malformed_every == 0:
            body = body.replace("</body></html>", "<div><span>unclosed\x00")
        enc = "utf-8"
        if _h32(self.cfg.seed, "enc", h, k) % self.cfg.latin1_every == 0:
            enc = "iso-8859-1"
        return body.encode(enc, errors="replace"), enc

    # -- images ------------------------------------------------------------

    def image_pixels(self, image_id: str) -> np.ndarray:
        s = _h32(self.cfg.seed, "img", image_id)
        rng = np.random.RandomState(s)
        w = self.cfg.img_size_min + s % self.cfg.img_size_span
        h = self.cfg.img_size_min + (s >> 8) % self.cfg.img_size_span
        # seeded sinusoid pattern per channel (distinct spatial structure
        # per image — a plain gradient would make every perceptual hash
        # collapse to the same bit pattern)
        fx = rng.randint(1, 5, size=3)
        fy = rng.randint(1, 5, size=3)
        px_ = rng.uniform(0, 2 * np.pi, size=3)
        py_ = rng.uniform(0, 2 * np.pi, size=3)
        base = np.empty((h, w, 3))
        xs_ = np.arange(w)
        ys_ = np.arange(h)
        for c in range(3):
            # the pattern is separable (sin over x + cos over y): evaluate
            # the trig on 1-D axes and broadcast — O(w+h) transcendentals
            # instead of O(w*h), bit-identical results (same per-element
            # expressions and addition order as the 2-D mgrid form)
            sx = 127.0 + 55.0 * np.sin(2 * np.pi * fx[c] * xs_ / w + px_[c])
            cy = 55.0 * np.cos(2 * np.pi * fy[c] * ys_ / h + py_[c])
            base[..., c] = sx[None, :] + cy[:, None]
        noise = rng.randint(0, 32, size=(h, w, 3))
        return np.clip(base / 1.45 + noise, 0, 255).astype(np.uint8)

    def image_record(self, image_id: str, fmt: str) -> dict:
        """Encoded corpus cell for one image (deterministic)."""
        px = self.image_pixels(image_id)
        data = encode_image(px, fmt)
        return {
            "image_id": image_id,
            "bytes": data,
            "w": int(px.shape[1]),
            "h": int(px.shape[0]),
            "fmt": fmt,
            "phash": phash64(px),
        }


def page_indices(url: str) -> "tuple[int, int]":
    """(host_idx, page_idx) of a synthetic-web page URL — THE shared
    parser (oracle, frontier and pagestore all import it; three copies
    once existed and could drift, silently breaking the byte-match-by-
    construction property).  Raises ValueError/IndexError on URLs
    outside the synthetic layout."""
    host, _, rest = url.partition("//")[2].partition("/")
    return int(host[5:-5]), int(rest.split("/")[1])


def make_seeds(cfg: StoreConfig, n_seeds: int) -> list[str]:
    """Seed list with dirty variants needing canonicalization."""
    store = PageStore(cfg)
    seeds = []
    for i in range(n_seeds):
        h = i % cfg.n_hosts
        k = _h32(cfg.seed, "seedpage", i) % store.n_pages(h)
        url = store.url(h, k)
        style = i % 4
        if style == 1:
            url = url.replace("http://", "Http://").replace("host-", "Host-")
        elif style == 2:
            url = url.replace(".test/", ".test:80/")
        elif style == 3:
            url = url.replace("/page/", "/page/../page/")
        seeds.append(url)
    return seeds
