"""Utility-function tables (ported from /root/reference/tests/test_utils.py)."""

from __future__ import annotations

import re
from typing import Any

import pytest

from parsel_ray.utils import extract_regex, flatten, iflatten, shorten


@pytest.mark.parametrize(
    ("width", "expected"),
    [
        (-1, ValueError),
        (0, ""),
        (1, "."),
        (2, ".."),
        (3, "..."),
        (4, "f..."),
        (5, "fo..."),
        (6, "foobar"),
        (7, "foobar"),
    ],
)
def test_shorten(width: int, expected: Any) -> None:
    if isinstance(expected, str):
        assert shorten("foobar", width) == expected
    else:
        with pytest.raises(expected):
            shorten("foobar", width)


@pytest.mark.parametrize(
    ("regex", "text", "replace_entities", "expected"),
    [
        (
            r"(?P<month>\w+)\s*(?P<day>\d+)\s*\,?\s*(?P<year>\d+)",
            "October  25, 2019",
            True,
            ["October", "25", "2019"],
        ),
        (
            r"(?P<extract>\w+)\s*\d+\s*\,?\s*\d+",
            "October  25 2019",
            True,
            ["October"],
        ),
        (
            r"\w+\s*\d+\s*\,?\s*\d+",
            "October  25 2019",
            True,
            ["October  25 2019"],
        ),
        (
            r"^.*$",
            "&quot;sometext&quot; &amp; &quot;moretext&quot;",
            True,
            ['"sometext" &amp; "moretext"'],
        ),
        (
            r"^.*$",
            "&quot;sometext&quot; &amp; &quot;moretext&quot;",
            False,
            ["&quot;sometext&quot; &amp; &quot;moretext&quot;"],
        ),
    ],
)
def test_extract_regex(
    regex: str, text: str, replace_entities: bool, expected: list[str]
) -> None:
    assert extract_regex(regex, text, replace_entities) == expected
    assert extract_regex(re.compile(regex), text, replace_entities) == expected


def test_flatten() -> None:
    assert flatten([[[1, 2, 3], (42, None)], [4, 5], [6], 7, (8, 9, 10)]) == [
        1, 2, 3, 42, None, 4, 5, 6, 7, 8, 9, 10,
    ]
    assert flatten(["foo", "bar"]) == ["foo", "bar"]
    assert flatten(["foo", ["baz", 42], "bar"]) == ["foo", "baz", 42, "bar"]
    assert list(iflatten([[1, 2], (3, 4)])) == [1, 2, 3, 4]
