"""CSS translation + end-to-end CSS selection conformance.

Golden pairs and fixture document ported from the reference
(/root/reference/tests/test_selector_csstranslator.py).
"""

from __future__ import annotations

from typing import Any

import pytest

from parsel_ray import ExpressionError, Selector, SelectorSyntaxError, css2xpath
from parsel_ray.htmlpath.csstranslate import Translator

HTMLBODY = """
<html>
<body>
<div>
 <a id="name-anchor" name="foo"></a>
 <a id="tag-anchor" rel="tag" href="http://localhost/foo">link</a>
 <a id="nofollow-anchor" rel="nofollow" href="https://example.org"> link</a>
 <p id="paragraph">
   lorem ipsum text
   <b id="p-b">hi</b> <em id="p-em">there</em>
   <b id="p-b2">guy</b>
   <input type="checkbox" id="checkbox-unchecked" />
   <input type="checkbox" id="checkbox-disabled" disabled="" />
   <input type="text" id="text-checked" checked="checked" />
   <input type="hidden" />
   <input type="hidden" disabled="disabled" />
   <input type="checkbox" id="checkbox-checked" checked="checked" />
   <input type="checkbox" id="checkbox-disabled-checked"
          disabled="disabled" checked="checked" />
   <fieldset id="fieldset" disabled="disabled">
     <input type="checkbox" id="checkbox-fieldset-disabled" />
     <input type="hidden" />
   </fieldset>
 </p>
 <map name="dummymap">
   <area shape="circle" coords="200,250,25" href="foo.html" id="area-href" />
   <area shape="default" id="area-nohref" />
 </map>
</div>
<div class="cool-footer" id="foobar-div" foobar="ab bc cde">
    <span id="foobar-span">foo ter</span>
</div>
</body></html>
"""


@pytest.mark.parametrize("html_mode", [True, False])
class TestTranslator:
    def c2x(self, css: str, html_mode: bool) -> str:
        return Translator(html=html_mode).css_to_xpath(css)

    @pytest.mark.parametrize(
        ("css", "xpath"),
        [
            ("::attr(name)", "descendant-or-self::*/@name"),
            ("a::attr(href)", "descendant-or-self::a/@href"),
            ("a ::attr(img)", "descendant-or-self::a/descendant-or-self::*/@img"),
            ("a > ::attr(class)", "descendant-or-self::a/*/@class"),
        ],
    )
    def test_attr_function(self, css: str, xpath: str, html_mode: bool) -> None:
        assert self.c2x(css, html_mode) == xpath, css

    @pytest.mark.parametrize(
        ("css", "exc"),
        [
            ("::attr(12)", ExpressionError),
            ("::attr(34test)", ExpressionError),
            ("::attr(@href)", SelectorSyntaxError),
        ],
    )
    def test_attr_function_exception(
        self, css: str, exc: type[Exception], html_mode: bool
    ) -> None:
        with pytest.raises(exc):
            self.c2x(css, html_mode)

    @pytest.mark.parametrize(
        ("css", "xpath"),
        [
            ("::text", "descendant-or-self::text()"),
            ("p::text", "descendant-or-self::p/text()"),
            ("p ::text", "descendant-or-self::p/descendant-or-self::text()"),
            ("#id::text", "descendant-or-self::*[@id = 'id']/text()"),
            ("p#id::text", "descendant-or-self::p[@id = 'id']/text()"),
            (
                "p#id ::text",
                "descendant-or-self::p[@id = 'id']/descendant-or-self::text()",
            ),
            ("p#id > ::text", "descendant-or-self::p[@id = 'id']/*/text()"),
            (
                "p#id ~ ::text",
                "descendant-or-self::p[@id = 'id']/following-sibling::*/text()",
            ),
            ("a[href]::text", "descendant-or-self::a[@href]/text()"),
            (
                "a[href] ::text",
                "descendant-or-self::a[@href]/descendant-or-self::text()",
            ),
            (
                "p::text, a::text",
                "descendant-or-self::p/text() | descendant-or-self::a/text()",
            ),
        ],
    )
    def test_text_pseudo_element(self, css: str, xpath: str, html_mode: bool) -> None:
        assert self.c2x(css, html_mode) == xpath, css

    @pytest.mark.parametrize(
        ("css", "exc"),
        [
            ("::attribute(12)", ExpressionError),
            ("::text()", ExpressionError),
            ("::attr(@href)", SelectorSyntaxError),
        ],
    )
    def test_pseudo_function_exception(
        self, css: str, exc: type[Exception], html_mode: bool
    ) -> None:
        with pytest.raises(exc):
            self.c2x(css, html_mode)

    @pytest.mark.parametrize(("css", "exc"), [("::text-node", ExpressionError)])
    def test_unknown_pseudo_element(
        self, css: str, exc: type[Exception], html_mode: bool
    ) -> None:
        with pytest.raises(exc):
            self.c2x(css, html_mode)

    @pytest.mark.parametrize(
        ("css", "exc"),
        [(":text", ExpressionError), (":attribute(name)", ExpressionError)],
    )
    def test_unknown_pseudo_class(
        self, css: str, exc: type[Exception], html_mode: bool
    ) -> None:
        with pytest.raises(exc):
            self.c2x(css, html_mode)


def test_css2xpath() -> None:
    expected_xpath = (
        "descendant-or-self::*[@class and contains("
        "concat(' ', normalize-space(@class), ' '), ' some-class ')]"
    )
    assert css2xpath(".some-class") == expected_xpath


class TestCSSSelector:
    sel = Selector(text=HTMLBODY)

    def x(self, *a: Any, **kw: Any) -> list[str]:
        return [v.strip() for v in self.sel.css(*a, **kw).extract() if v.strip()]

    def test_selector_simple(self) -> None:
        for x in self.sel.css("input"):
            assert isinstance(x, self.sel.__class__), x
        assert self.sel.css("input").extract() == [
            x.extract() for x in self.sel.css("input")
        ]

    def test_text_pseudo_element(self) -> None:
        assert self.x("#p-b2") == ['<b id="p-b2">guy</b>']
        assert self.x("#p-b2::text") == ["guy"]
        assert self.x("#p-b2 ::text") == ["guy"]
        assert self.x("#paragraph::text") == ["lorem ipsum text"]
        assert self.x("#paragraph ::text") == ["lorem ipsum text", "hi", "there", "guy"]
        assert self.x("p::text") == ["lorem ipsum text"]
        assert self.x("p ::text") == ["lorem ipsum text", "hi", "there", "guy"]

    def test_attribute_function(self) -> None:
        assert self.x("#p-b2::attr(id)") == ["p-b2"]
        assert self.x(".cool-footer::attr(class)") == ["cool-footer"]
        assert self.x(".cool-footer ::attr(id)") == ["foobar-div", "foobar-span"]
        assert self.x('map[name="dummymap"] ::attr(shape)') == ["circle", "default"]

    def test_nested_selector(self) -> None:
        assert self.sel.css("p").css("b::text").extract() == ["hi", "guy"]
        assert self.sel.css("div").css("area:last-child").extract() == [
            '<area shape="default" id="area-nohref">'
        ]

    def test_pseudoclass_has(self) -> None:
        assert self.x("p:has(b)::text") == ["lorem ipsum text"]


class TestCSSSelectorBytes(TestCSSSelector):
    sel = Selector(body=bytes(HTMLBODY, encoding="utf-8"))


class TestReferenceLayoutCompat:
    """Reference import-path parity (round 2): the class surface of
    parsel.csstranslator / parsel.xpathfuncs / SafeXMLParser ports
    unchanged."""

    def test_translator_classes(self):
        from parsel_ray.csstranslator import GenericTranslator, HTMLTranslator

        ht = HTMLTranslator()
        assert ht.css_to_xpath("p.a::text").endswith("/text()")
        # HTML flavor lowercases names; generic preserves case
        assert "div" in HTMLTranslator().css_to_xpath("DIV")
        assert "DIV" in GenericTranslator().css_to_xpath("DIV")
        # per-instance cache: same object back for the same query
        assert ht.css_to_xpath("p.a") is ht.css_to_xpath("p.a")

    def test_xpathfuncs_setup_and_safexml(self):
        import parsel_ray
        from parsel_ray import SafeXMLParser
        from parsel_ray.xpathfuncs import set_xpathfunc, setup

        setup()  # idempotent
        assert set_xpathfunc is parsel_ray.set_xpathfunc
        SafeXMLParser(resolve_entities=False)  # constructible, inert


class TestOfTypePseudoClasses:
    """of-type pseudo-class family (round 3): typed selectors translate
    to same-tag sibling counts; the universal selector raises, matching
    cssselect's '*:...-of-type is not implemented'."""

    HTML = (
        "<html><body><div>"
        "<p>p1</p><span>s1</span><p>p2</p><span>s2</span><p>p3</p>"
        "</div></body></html>"
    )

    def sel(self):
        from parsel_ray import Selector

        return Selector(text=self.HTML)

    def test_nth_of_type(self):
        s = self.sel()
        assert s.css("p:nth-of-type(2)::text").getall() == ["p2"]
        assert s.css("p:nth-of-type(odd)::text").getall() == ["p1", "p3"]
        assert s.css("p:nth-of-type(2n)::text").getall() == ["p2"]

    def test_nth_last_of_type(self):
        s = self.sel()
        assert s.css("span:nth-last-of-type(1)::text").getall() == ["s2"]
        assert s.css("p:nth-last-of-type(3)::text").getall() == ["p1"]

    def test_first_last_only_of_type(self):
        s = self.sel()
        assert s.css("p:first-of-type::text").getall() == ["p1"]
        assert s.css("p:last-of-type::text").getall() == ["p3"]
        assert s.css("span:first-of-type::text").getall() == ["s1"]
        from parsel_ray import Selector

        s2 = Selector(text="<div><p>a</p><em>e</em></div>")
        assert s2.css("em:only-of-type::text").getall() == ["e"]
        assert s2.css("p:only-of-type::text").getall() == ["a"]

    def test_universal_of_type_raises(self):
        import pytest as _pytest

        from parsel_ray.htmlpath.csstranslate import ExpressionError

        s = self.sel()
        for q in ("*:nth-of-type(1)", "*:first-of-type", "*:only-of-type"):
            with _pytest.raises(ExpressionError):
                s.css(q)
