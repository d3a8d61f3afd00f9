"""Scalar utilities: flatten, regex extraction policy, entity replacement.

Behavior parity targets: /root/reference/parsel/utils.py:12-105 (flatten /
iflatten / extract_regex / shorten semantics, pinned by
tests/test_utils.py:13-97) and w3lib's ``replace_entities`` contract used at
utils.py:92-94 (re-implemented on stdlib ``html.entities``; w3lib is not
available in this environment).
"""

from __future__ import annotations

import re
from html.entities import name2codepoint
from typing import Any, Iterable, Iterator, Pattern, cast


def flatten(x: Iterable[Any]) -> list[Any]:
    """Flatten nested iterables into a single list (str/bytes are atomic)."""
    return list(iflatten(x))


def iflatten(x: Iterable[Any]) -> Iterator[Any]:
    for el in x:
        if _is_listlike(el):
            yield from iflatten(el)
        else:
            yield el


def _is_listlike(x: Any) -> bool:
    return hasattr(x, "__iter__") and not isinstance(x, (str, bytes))


_ENTITY_RE = re.compile(
    r"&((?P<named>[a-zA-Z\d]+)|#(?P<dec>\d+)|#x(?P<hex>[a-fA-F\d]+))(?P<semi>;?)"
)


def replace_entities(
    text: str, keep: Iterable[str] = (), remove_illegal: bool = True
) -> str:
    """Replace HTML entity/character references by their unicode characters.

    Names listed in ``keep`` are passed through untouched; unknown named
    entities are removed when ``remove_illegal`` (w3lib-compatible default).
    """
    keep_set = set(keep)

    def convert(m: re.Match[str]) -> str:
        named = m.group("named")
        try:
            if named is not None:
                if named in keep_set:
                    return m.group(0)
                if named.lower() in ("apos",):
                    return "'"
                cp = name2codepoint.get(named) or name2codepoint.get(named.lower())
                if cp is None:
                    raise KeyError(named)
                return chr(cp)
            if m.group("dec") is not None:
                return chr(int(m.group("dec")))
            return chr(int(m.group("hex"), 16))
        except (KeyError, OverflowError, ValueError):
            return "" if remove_illegal and m.group("semi") else m.group(0)

    return _ENTITY_RE.sub(convert, text)


def extract_regex(
    regex: str | Pattern[str], text: str, replace_entities_flag: bool = True
) -> list[str]:
    """Regex extraction policy: a named group ``extract`` wins; else all
    groups (flattened); else whole matches. Entities are then replaced except
    ``&amp;``/``&lt;``."""
    if isinstance(regex, str):
        regex = re.compile(regex, re.UNICODE)

    if "extract" in regex.groupindex:
        m = regex.search(text)
        if m is None:
            strings: list[str] = []
        else:
            extracted = cast("re.Match[str]", m).group("extract")
            strings = [extracted] if extracted is not None else []
    else:
        strings = regex.findall(text)

    strings = flatten(strings)
    if not replace_entities_flag:
        return strings
    return [replace_entities(s, keep=("lt", "amp")) for s in strings]


def shorten(text: str, width: int, suffix: str = "...") -> str:
    """Truncate ``text`` to ``width`` with a suffix."""
    if len(text) <= width:
        return text
    if width > len(suffix):
        return text[: width - len(suffix)] + suffix
    if width >= 0:
        return suffix[len(suffix) - width :]
    raise ValueError("width must be equal or greater than 0")
