"""Property-based robustness: arbitrary input must never escape the
documented error contract (ValueError or a clean result — no crashes,
no foreign exception types), and canonicalization must be idempotent.

Hypothesis drives the generators; examples are deterministic under the
fixed seed profile so CI runs are reproducible.
"""

from __future__ import annotations

import string

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parsel_ray.crawl.urlnorm import canonical_url
from parsel_ray.images.codecs import decode_image, sniff_image_meta
from parsel_ray.images.jpeg import decode_jpeg
from parsel_ray.selector import Selector

FAST = settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


class TestParserNeverCrashes:
    @FAST
    @given(st.text(max_size=600))
    def test_selector_arbitrary_text(self, text):
        # parse never raises for str input; text may sniff as JSON,
        # where css/xpath raise ValueError (reference semantics)
        try:
            sel = Selector(text=text)
            sel.css("a::attr(href)").getall()
            sel.xpath("//p/text()").getall()
        except ValueError:
            return

    @FAST
    @given(st.binary(max_size=600))
    def test_selector_arbitrary_bytes(self, body):
        try:
            sel = Selector(body=body)
            # bytes may sniff as JSON, where css/xpath raise ValueError
            # (reference semantics) — still inside the error contract
            sel.css("title::text").get()
        except ValueError:
            return

    @FAST
    @given(st.binary(max_size=400))
    def test_image_decoders_error_contract(self, blob):
        for fmt in ("jpeg", "png", "gif", "bmp"):
            try:
                decode_image(blob, fmt)
            except ValueError:
                pass  # the documented corrupt-input contract

    @FAST
    @given(st.binary(max_size=400))
    def test_jpeg_decoder_direct(self, blob):
        try:
            decode_jpeg(blob)
        except ValueError:
            pass

    @FAST
    @given(st.binary(max_size=400))
    def test_sniff_never_crashes(self, blob):
        try:
            sniff_image_meta(blob)
        except ValueError:
            pass


class TestCanonicalUrlProperties:
    URL_CHARS = string.ascii_letters + string.digits + ":/?#[]@!$&'()*+,;=.%-_~ "

    @FAST
    @given(st.text(alphabet=URL_CHARS, max_size=200))
    def test_idempotent(self, raw):
        url = "http://example.com/" + raw
        first = canonical_url(url)
        if first is None:
            return
        assert canonical_url(first) == first

    @FAST
    @given(st.text(alphabet=URL_CHARS, max_size=120))
    def test_relative_resolution_stays_on_base_scheme(self, rel):
        out = canonical_url(rel, base="https://host.example/a/b")
        if out is not None and "://" in out:
            assert out.split("://", 1)[0] in ("https", "http")
