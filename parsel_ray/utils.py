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


# IGNORECASE: HTML permits '&#X41;' (uppercase hex marker) and mixed-case
# named refs — w3lib compiles its pattern the same way
_ENTITY_RE = re.compile(
    r"&((?P<named>[a-z\d]+)|#(?P<dec>\d+)|#x(?P<hex>[a-f\d]+))(?P<semi>;?)",
    re.IGNORECASE,
)


def replace_entities(
    text: str, keep: Iterable[str] = (), remove_illegal: bool = True
) -> str:
    """Replace HTML entity/character references by their unicode characters.

    Names listed in ``keep`` (matched case-insensitively, per w3lib) are
    passed through untouched; unknown named entities are removed when
    ``remove_illegal`` (w3lib-compatible default).  Numeric references in
    0x80-0x9F decode through cp1252 — the universal browser/w3lib rule for
    Windows-style refs like ``&#146;`` (smart apostrophe), which would
    otherwise yield C1 control characters.
    """
    keep_set = {k.lower() for k in keep}

    def convert(m: re.Match[str]) -> str:
        named = m.group("named")
        try:
            if named is not None:
                if named.lower() in keep_set:
                    return m.group(0)
                if named.lower() in ("apos",):
                    return "'"
                cp = name2codepoint.get(named) or name2codepoint.get(named.lower())
                if cp is None:
                    raise KeyError(named)
                return chr(cp)
            if m.group("dec") is not None:
                number = int(m.group("dec"))
            else:
                number = int(m.group("hex"), 16)
            if 0x80 <= number <= 0x9F:
                return bytes((number,)).decode("cp1252")
            return chr(number)
        except (KeyError, OverflowError, ValueError, UnicodeDecodeError):
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
