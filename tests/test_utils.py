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


class TestRepetitionStats:
    def test_counts_and_tiebreak(self):
        import pyarrow as pa

        from parsel_ray.functions.text import repetition_stats

        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "a b a b c",   # top word tie a/b -> 'a'; bigram 'a b' x2
                        "x",            # single word: dropped (no bigram)
                        "z z z",
                    ],
                    pa.string(),
                ),
            }
        )
        out = repetition_stats(t).to_pandas().set_index("doc_id")
        assert list(out.index) == [1, 3]
        assert out.loc[1, "n_words"] == 5
        assert out.loc[1, "n_distinct"] == 3
        assert out.loc[1, "top_word"] == "a"
        assert out.loc[1, "top_word_n"] == 2
        assert out.loc[1, "top_bigram"] == "a b"
        assert out.loc[1, "top_bigram_n"] == 2
        assert out.loc[3, "top_bigram"] == "z z"
        assert out.loc[3, "top_bigram_n"] == 2


class TestCharBigramLM:
    def test_distributed_equals_reference(self, ray_session):
        import math

        import pyarrow as pa
        import ray.data as rd

        from parsel_ray.functions.text import (
            perplexity_scores,
            train_char_bigram_lm,
        )

        texts = ["the cat sat", "the dog ran far", "zzz qqq xxx", "hello"]
        t = pa.table(
            {
                "doc_id": pa.array(list(range(4)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        model = train_char_bigram_lm(rd.from_arrow(t).repartition(3))
        # single-process reference
        from collections import Counter

        ref = Counter()
        for s in texts:
            ref.update(zip(s, s[1:]))
        vocab = {c for pair in ref for c in pair}
        v = len(vocab)
        prev_tot = Counter()
        for (p, _c), n in ref.items():
            prev_tot[p] += n
        assert model[1] == dict(prev_tot)
        for pair, n in ref.items():
            want = math.log((n + 1) / (prev_tot[pair[0]] + v))
            assert abs(model[0][pair] - want) < 1e-12
        # a model trained on fluent text scores held-out junk worse
        fluent = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["the cat sat on the mat", "the dog ran to the car"],
                    pa.string(),
                ),
            }
        )
        fm = train_char_bigram_lm(rd.from_arrow(fluent))
        held = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(
                    ["the rat sat on the car", "zqx jww vkk pzz"],
                    pa.string(),
                ),
            }
        )
        scored = perplexity_scores(held, fm).to_pandas().set_index("doc_id")
        assert scored.loc[1, "ppl"] > scored.loc[0, "ppl"]

    def test_short_docs_null(self):
        import pyarrow as pa

        from parsel_ray.functions.text import perplexity_scores

        t = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["", "a"], pa.string()),
            }
        )
        model = ({}, {}, {"a"})
        out = perplexity_scores(t, model).to_pandas()
        assert out["ppl"].isna().all()
