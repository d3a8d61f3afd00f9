"""Full-document axes + id()/lang() (round-2 close of the round-1 XPath
exclusions).  Expected strings mirror lxml/libxml2 semantics for the same
queries (reference usage patterns: /root/reference/docs/usage.rst:634-727
exercise sibling/axis navigation; the reference gets the full axis set via
lxml, /root/reference/parsel/selector.py:601-607)."""

from __future__ import annotations

from parsel_ray import Selector

DOC = """
<html><body>
  <div id="top">
    <p id="p1">one</p>
    <p id="p2">two<b>bold</b></p>
  </div>
  <div id="mid">
    <span id="s1">three</span>
  </div>
  <p id="tail">four</p>
</body></html>
"""


class TestFullDocumentAxes:
    def test_following_axis(self):
        sel = Selector(text=DOC)
        got = sel.xpath("//p[@id='p2']/following::*/@id").getall()
        # document-order nodes after p2's subtree: mid, s1, tail
        assert got == ["mid", "s1", "tail"]

    def test_following_excludes_descendants(self):
        sel = Selector(text=DOC)
        got = sel.xpath("//div[@id='top']/following::*/@id").getall()
        assert got == ["mid", "s1", "tail"]  # p1/p2/b are descendants, not following

    def test_preceding_axis(self):
        sel = Selector(text=DOC)
        got = sel.xpath("//span[@id='s1']/preceding::p/@id").getall()
        # final node-set in DOCUMENT order (lxml/libxml2 semantics) ...
        assert got == ["p1", "p2"]
        # ... but positions count along the REVERSE axis: [1] is nearest
        assert sel.xpath("//span[@id='s1']/preceding::p[1]/@id").get() == "p2"
        assert sel.xpath("//span[@id='s1']/preceding::p[2]/@id").get() == "p1"

    def test_preceding_excludes_ancestors(self):
        sel = Selector(text=DOC)
        got = sel.xpath("//b/preceding::*/@id").getall()
        assert got == ["p1"]  # p2, top, body, html are ancestors

    def test_following_sibling_vs_following(self):
        sel = Selector(text=DOC)
        sib = sel.xpath("//div[@id='top']/following-sibling::*/@id").getall()
        assert sib == ["mid", "tail"]

    def test_preceding_in_predicate(self):
        sel = Selector(text=DOC)
        got = sel.xpath("//p[preceding::p[@id='p1']]/@id").getall()
        assert got == ["p2", "tail"]


class TestIdFunction:
    def test_id_single(self):
        sel = Selector(text=DOC)
        assert sel.xpath("id('p2')/b/text()").getall() == ["bold"]

    def test_id_whitespace_tokens_document_order(self):
        sel = Selector(text=DOC)
        got = sel.xpath("id('tail p1')/@id").getall()
        assert got == ["p1", "tail"]  # document order, not token order

    def test_id_missing_returns_empty(self):
        sel = Selector(text=DOC)
        assert sel.xpath("id('nope')").getall() == []

    def test_id_of_nodeset_arg(self):
        doc = (
            "<html><body><p class='ref'>p2</p>"
            "<p id='p2'>target</p></body></html>"
        )
        sel = Selector(text=doc)
        assert sel.xpath("id(//p[@class='ref'])/text()").getall() == ["target"]

    def test_id_in_path_and_count(self):
        sel = Selector(text=DOC)
        assert sel.xpath("count(id('top')/p)").get() == "2.0"


class TestLangFunction:
    DOC_LANG = (
        '<html xml:lang="en"><body>'
        '<p id="a">default</p>'
        '<div xml:lang="de"><p id="b">german</p></div>'
        '<p id="c" xml:lang="en-GB">british</p>'
        "</body></html>"
    )

    def test_lang_inherited(self):
        sel = Selector(text=self.DOC_LANG)
        assert sel.xpath("//p[lang('en')]/@id").getall() == ["a", "c"]

    def test_lang_override(self):
        sel = Selector(text=self.DOC_LANG)
        assert sel.xpath("//p[lang('de')]/@id").getall() == ["b"]

    def test_lang_sublang_prefix(self):
        sel = Selector(text=self.DOC_LANG)
        assert sel.xpath("//p[lang('en-gb')]/@id").getall() == ["c"]
        # 'en' matches 'en-GB' (hyphen refinement), not vice versa

    def test_lang_case_insensitive(self):
        sel = Selector(text=self.DOC_LANG)
        assert sel.xpath("//p[lang('EN')]/@id").getall() == ["a", "c"]

    def test_lang_absent(self):
        sel = Selector(text="<html><body><p>x</p></body></html>")
        assert sel.xpath("//p[lang('en')]").getall() == []
