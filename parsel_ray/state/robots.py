"""Minimal robots.txt handling (crawl operator N3): ``User-agent: *``
blocks with ``Disallow:`` path prefixes, cached per host.

The fetcher resolves robots from the (deterministic, local) page store —
robots fetches do not pass through the frontier ordering (documented
divergence from a networked crawler; keeps the pop-order artifact purely
about content URLs).
"""

from __future__ import annotations

from typing import Callable


def parse_robots(text: str) -> list[str]:
    """Return Disallow path prefixes for User-agent: * (simplified: no
    Allow, no wildcards; empty Disallow means allow-all)."""
    disallows: list[str] = []
    active = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active and val:
            disallows.append(val)
    return disallows


def parse_sitemap_urls(text: str) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body (REP: they apply
    regardless of the User-agent group, values are absolute URLs) —
    the discovery hook that feeds :func:`sitemap_extract`-style seed
    generation into the frontier."""
    out: list[str] = []
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        if key.strip().lower() == "sitemap":
            val = val.strip()
            if val:
                out.append(val)
    return out


class RobotsCache:
    """Per-host Disallow-prefix cache; ``fetch_robots(host) -> str | None``
    supplies the robots body (None = no robots file = allow all)."""

    def __init__(self, fetch_robots: Callable[[str], "str | None"]) -> None:
        self._fetch = fetch_robots
        self._rules: dict[str, list[str]] = {}

    def allowed(self, host: str, path: str) -> bool:
        rules = self._rules.get(host)
        if rules is None:
            body = self._fetch(host)
            rules = parse_robots(body) if body else []
            self._rules[host] = rules
        return not any(path.startswith(p) for p in rules)

    def state(self) -> dict:
        return {"rules": {h: list(r) for h, r in self._rules.items()}}

    def restore(self, st: dict) -> None:
        self._rules = {str(h): list(r) for h, r in st["rules"].items()}
