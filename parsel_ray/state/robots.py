"""robots.txt handling per RFC 9309 (crawl operator N3): group
selection by most-specific User-agent, Allow/Disallow rules with ``*``
and ``$`` wildcards, longest-match precedence (Allow wins ties), cached
per host.  Round 3 upgraded the round-1 "Disallow prefixes only"
simplification; the synthetic corpus emits plain prefix rules, so the
crawl byte-match artifacts are unchanged — the oracle and the
distributed shards share this module, so any rule semantics move in
lockstep.

The fetcher resolves robots from the (deterministic, local) page store —
robots fetches do not pass through the frontier ordering (documented
divergence from a networked crawler; keeps the pop-order artifact purely
about content URLs).
"""

from __future__ import annotations

import re
from typing import Callable

# (allow, pattern) pairs; pattern grammar: literal path bytes with "*"
# (any sequence) and a final "$" (end anchor)
Rule = "tuple[bool, str]"


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """RFC 9309 rules for ``agent``: the group(s) whose ``User-agent``
    token equals it case-insensitively, else the ``*`` group(s); groups
    sharing the matched token merge.  Returns (allow, pattern) pairs in
    file order; empty patterns (``Disallow:`` = allow-all) are dropped.
    """
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    pending_agents: list[str] = []
    rules: list[tuple[bool, str]] | None = None
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if rules is not None:  # a rule line closed the previous group
                groups.append((pending_agents, rules))
                pending_agents, rules = [], None
            pending_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            if not pending_agents:
                continue  # rules before any User-agent line are ignored
            if rules is None:
                rules = []
            if val:
                rules.append((key == "allow", val))
    if pending_agents:
        groups.append((pending_agents, rules or []))

    want = agent.lower()
    exact = [r for agents, rs in groups if want in agents for r in rs]
    if exact or any(want in agents for agents, _ in groups):
        return exact
    return [r for agents, rs in groups if "*" in agents for r in rs]


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


def _compile(pattern: str) -> "re.Pattern[str]":
    """RFC 9309 pattern → anchored regex: ``*`` = any sequence, a final
    ``$`` anchors the end; everything else is literal."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    body = ".*".join(re.escape(piece) for piece in pattern.split("*"))
    return re.compile(body + ("$" if anchored else ""))


class _HostRules:
    """Compiled per-host rule set.  ``allowed`` runs once per admitted
    URL on the frontier's serial path, so PLAIN prefix rules (no ``*``,
    no ``$`` — the overwhelming majority of real robots lines) live in a
    character trie: one O(len(path)) walk replaces an O(rules) regex
    scan (measured: a 300-rule host cost ~150 us/path on the regex loop;
    the trie walk is ~2 us and independent of rule count).  Wildcard /
    anchored rules keep the RFC 9309 regex path.  Longest-match
    precedence with Allow-wins-ties is preserved exactly: both loops
    fold the same (plen, allow) maximization the old single loop did."""

    __slots__ = ("rules", "_trie", "_wild")

    def __init__(self, rules: list[tuple[bool, str]]) -> None:
        self.rules = rules
        self._trie: dict = {}
        self._wild: list[tuple[bool, int, "re.Pattern[str]"]] = []
        for allow, pat in rules:
            if "*" in pat or pat.endswith("$"):
                self._wild.append((allow, len(pat), _compile(pat)))
                continue
            node = self._trie
            for ch in pat:
                node = node.setdefault(ch, {})
            term = node.get("\0")
            # same prefix declared twice: Allow wins the tie (same fold
            # the matcher loop applied at equal plen)
            node["\0"] = (len(pat), allow or (term[1] if term else False))

    def allowed(self, path: str) -> bool:
        best_len, best_allow = -1, True
        node = self._trie
        for i in range(len(path) + 1):
            term = node.get("\0")
            if term is not None:
                plen, allow = term
                if plen > best_len or (plen == best_len and allow):
                    best_len, best_allow = plen, allow
            if i == len(path):
                break
            node = node.get(path[i])
            if node is None:
                break
        for allow, plen, rx in self._wild:
            if rx.match(path) is None:
                continue
            # longest-match precedence; Allow wins exact ties
            if plen > best_len or (plen == best_len and allow):
                best_len, best_allow = plen, allow
        return best_allow


class RobotsCache:
    """Per-host RFC 9309 rule cache; ``fetch_robots(host) -> str | None``
    supplies the robots body (None = no robots file = allow all)."""

    def __init__(self, fetch_robots: Callable[[str], "str | None"],
                 agent: str = "*") -> None:
        self._fetch = fetch_robots
        self._agent = agent
        self._rules: dict[str, _HostRules] = {}

    def allowed(self, host: str, path: str) -> bool:
        hr = self._rules.get(host)
        if hr is None:
            body = self._fetch(host)
            hr = _HostRules(parse_robots(body, self._agent) if body else [])
            self._rules[host] = hr
        return hr.allowed(path)

    def state(self) -> dict:
        return {
            "rules": {
                h: [[a, p] for a, p in hr.rules]
                for h, hr in self._rules.items()
            }
        }

    def restore(self, st: dict) -> None:
        def _rule(r) -> tuple[bool, str]:
            if isinstance(r, str):
                # pre-RFC-9309 checkpoint shape: a bare Disallow prefix
                return (False, r)
            a, p = r
            return (bool(a), str(p))

        self._rules = {
            str(h): _HostRules([_rule(r) for r in rs])
            for h, rs in st["rules"].items()
        }
