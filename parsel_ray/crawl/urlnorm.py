"""RFC 3986 URL canonicalization (crawl-frontier operator N1).

Rules (the oracle and the distributed pipeline share this single
implementation, so "byte-match" is by construction):

* scheme/host lower-cased; default ports (:80 http, :443 https) dropped;
* percent-encodings of unreserved characters decoded; remaining escapes
  upper-cased; space → %20;
* dot-segments resolved; empty path → "/";
* query parameters sorted (stable by key, then value); fragment dropped.
"""

from __future__ import annotations

import re
from urllib.parse import quote, urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}
# characters that stay verbatim in path/query after re-quoting
_PATH_SAFE = "/:@!$&'()*+,;=~._-"
_QUERY_SAFE = ":@!$&'()*+,;=~._-/?"


_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_PCT_RE = re.compile(r"%[0-9a-fA-F]{2}")


def _renorm(component: str, safe: str) -> str:
    # RFC 3986 §6.2.2: decode ONLY escapes of unreserved characters —
    # %2F/%26/%3D etc. are data, not delimiters, and must stay encoded
    # (decoding them would conflate distinct URLs); other escapes are
    # upper-cased.  Then percent-encode any raw disallowed characters.
    def fix(m: "re.Match[str]") -> str:
        ch = chr(int(m.group(0)[1:], 16))
        return ch if ch in _UNRESERVED else m.group(0).upper()

    s = _PCT_RE.sub(fix, component)
    return quote(s, safe=safe + "%")


def _resolve_dots(path: str) -> str:
    segs = path.split("/")
    out: list[str] = []
    for seg in segs:
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
        elif seg != ".":
            out.append(seg)
    # RFC 3986 section 5.2.4: a TRAILING "." or ".." is replaced by "/"
    # (the output keeps the directory form) — "/a/b/.." is "/a/", not
    # "/a"; servers routinely serve different resources for the two
    if segs and segs[-1] in (".", "..") and (not out or out[-1] != ""):
        out.append("")
    p = "/".join(out)
    if not p.startswith("/"):
        p = "/" + p
    return p


def canonical_url(url: str, base: str | None = None) -> str | None:
    """Canonical form, or None for non-http(s)/unparseable URLs."""
    url = url.strip()
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
        scheme = parts.scheme.lower()
        if scheme not in ("http", "https"):
            return None
        # .hostname/.port parse lazily and raise on junk ports
        # (e.g. "http://h:abc/x", port > 65535) — treat as unparseable.
        host = (parts.hostname or "").lower()
        port = parts.port
    except ValueError:
        return None
    if not host:
        return None
    if ":" in host:  # IPv6 literal: .hostname strips the brackets
        host = f"[{host}]"
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = _resolve_dots(_renorm(parts.path or "/", _PATH_SAFE)) or "/"
    query = ""
    if parts.query:
        pairs = []
        for piece in parts.query.split("&"):
            if not piece:
                continue
            k, eq, v = piece.partition("=")
            pairs.append((_renorm(k, _QUERY_SAFE), _renorm(v, _QUERY_SAFE), eq))
        pairs.sort()
        query = "&".join(f"{k}={v}" if eq else k for k, v, eq in pairs)
    # upper-case any remaining percent escapes
    path = re.sub(r"%[0-9a-fA-F]{2}", lambda m: m.group(0).upper(), path)
    query = re.sub(r"%[0-9a-fA-F]{2}", lambda m: m.group(0).upper(), query)
    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Hostname of a URL.  Fast manual parse for the canonical-URL shape
    (runs per admitted link on the frontier's serial path — urlsplit
    costs ~3 us/call); falls back to urlsplit for userinfo/IPv6 forms.
    Byte-identical to ``urlsplit(url).hostname or ""`` (30k-case fuzz
    parity in tests): authority exists only when ``//`` immediately
    follows a valid scheme (or starts the url), the netloc ends at the
    first ``/``, ``?`` or ``#``, and lowercasing stops at the first
    ``%`` (CPython's IPv6 zone-info rule)."""
    if url.startswith("//"):
        rest = url[2:]
    else:
        i = url.find(":")
        if (
            i > 0
            and url[i + 1 : i + 3] == "//"
            and url[0].isascii() and url[0].isalpha()
            and all(c.isascii() and (c.isalnum() or c in "+.-") for c in url[1:i])
        ):
            rest = url[i + 3 :]
        else:
            return ""
    hostport = rest.partition("/")[0].partition("?")[0].partition("#")[0]
    if "@" in hostport or "[" in hostport:
        return urlsplit(url).hostname or ""
    host = hostport.partition(":")[0]
    h, pct, zone = host.partition("%")
    return h.lower() + pct + zone


def path_of(url: str) -> str:
    """Path+query of a canonical URL (robots matching input)."""
    rest = url.partition("//")[2]
    _, _, pq = rest.partition("/")
    return "/" + pq
