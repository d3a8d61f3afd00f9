"""Differential pins for the driver-visible certification recomputes
(parsel_ray/pipelines/certs.py): each scalar reference must agree with
its production kernel on adversarial unicode/whitespace/boundary
inputs — these are the functions whose per-row `match` columns the
driver's correctness gate now hash-checks, so a divergence here would
surface as a gate failure on data that happens to contain the corner."""

from __future__ import annotations

import string

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parsel_ray.functions import dedup as D
from parsel_ray.functions import text as T
from parsel_ray.pipelines.certs import (
    ref_compression_ratio,
    ref_lang_guess,
    ref_quality,
    ref_rolling_fingerprint,
    ref_simhash,
    ref_token_stats,
)

FAST = settings(max_examples=200, deadline=None)

# whitespace zoo (incl. \x0b which RE2's \s EXCLUDES but Python's
# re.ASCII \s includes), word-boundary traps around stopwords, unicode
# letters, CJK/kana/hangul for the langid head rules
TEXTS = st.text(
    alphabet=(
        string.ascii_letters + string.digits + " \t\n\r\f\x0b"
        + ".!?,;:_-'\"()" + "éüßñ²µ" + "的是了日本語かなカナ한국어"
    ),
    max_size=300,
)


def _kernel_one(fn, text, col):
    batch = pa.table({"doc_id": pa.array([0], pa.int64()),
                      "text": pa.array([text], pa.string())})
    return fn(batch)[col][0].as_py()


class TestPerRowRefs:
    @FAST
    @given(TEXTS)
    def test_token_stats(self, text):
        t = T.token_stats(pa.table({"text": pa.array([text])}))
        want = (t["n_tokens"][0].as_py(), t["n_punct"][0].as_py(),
                t["n_stopwords"][0].as_py())
        got = ref_token_stats(text)[:3]
        assert got == want, (text, got, want)

    @FAST
    @given(TEXTS)
    def test_quality(self, text):
        want = _kernel_one(lambda b: T.quality_score(b), text, "quality")
        assert ref_quality(text) == want, text

    @FAST
    @given(TEXTS)
    def test_rolling_fingerprint(self, text):
        want = _kernel_one(lambda b: T.rolling_fingerprint(b), text, "rhash")
        assert ref_rolling_fingerprint(text) == want, text

    @FAST
    @given(TEXTS)
    def test_compression_ratio(self, text):
        want = _kernel_one(
            lambda b: T.compression_ratio(b), text, "zlib_ratio"
        )
        assert ref_compression_ratio(text) == want, text

    @FAST
    @given(TEXTS)
    def test_simhash(self, text):
        want = _kernel_one(D.SimHasher(col="text"), text, "simhash")
        assert ref_simhash(text) == want, text

    @FAST
    @given(TEXTS)
    def test_lang_guess(self, text):
        want = _kernel_one(T.LangId(col="text"), text, "lang_guess")
        assert ref_lang_guess(text) == want, text

    @pytest.mark.parametrize("text", [
        "", " ", "\x0b", "a", "the", "Xthe the theX the.",
        "aaaa", "a" * 20, "日本語のかな文字テスト " * 30,
        "한국어 텍스트 " * 40, "的" * 250,
        "the quick brown fox " * 10,
    ])
    def test_pinned_corners(self, text):
        assert ref_token_stats(text)[:3] == (
            lambda t: (t["n_tokens"][0].as_py(), t["n_punct"][0].as_py(),
                       t["n_stopwords"][0].as_py())
        )(T.token_stats(pa.table({"text": pa.array([text])})))
        assert ref_simhash(text) == _kernel_one(
            D.SimHasher(col="text"), text, "simhash"
        )
        assert ref_lang_guess(text) == _kernel_one(
            T.LangId(col="text"), text, "lang_guess"
        )
        assert ref_rolling_fingerprint(text) == _kernel_one(
            lambda b: T.rolling_fingerprint(b), text, "rhash"
        )
