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


class TestDtdIdAndEntities:
    """Round-3 close of the last documented divergences: XML DTD-declared
    ID attributes for id(), and declared-internal-entity expansion in
    attribute values (libxml2 resolve_entities=False semantics —
    reference gets both via lxml, /root/reference/parsel/selector.py)."""

    def test_xml_dtd_declared_id(self):
        xml = (
            "<!DOCTYPE r [<!ATTLIST e xid ID #IMPLIED>"
            "<!ATTLIST f name CDATA #IMPLIED fid ID #REQUIRED>]>"
            '<r><e xid="k1">one</e><f fid="k2" name="n">two</f>'
            '<e id="k3">three</e></r>'
        )
        sel = Selector(text=xml, type="xml")
        assert sel.xpath("id('k1')/text()").getall() == ["one"]
        assert sel.xpath("id('k2')/text()").getall() == ["two"]
        assert sel.xpath("id('k1 k2')/text()").getall() == ["one", "two"]
        # the plain `id` attribute is NOT an ID in XML (no declaration)
        assert sel.xpath("id('k3')").getall() == []

    def test_xml_without_dtd_has_no_ids(self):
        sel = Selector(text='<r><e id="k">x</e></r>', type="xml")
        assert sel.xpath("id('k')").getall() == []
        # HTML rule unchanged: id attribute is the ID
        html = Selector(text='<html><p id="k">x</p></html>')
        assert html.xpath("id('k')/text()").getall() == ["x"]

    def test_declared_entity_expands_in_attribute_only(self):
        xml = '<!DOCTYPE r [<!ENTITY a "X">]><r attr="&a;b">&a;c</r>'
        sel = Selector(text=xml, type="xml")
        # attribute values expand declared internal entities (libxml2
        # expands them even with resolve_entities=False) ...
        assert sel.xpath("//r/@attr").get() == "Xb"
        # ... content keeps the reference (serializes like lxml's
        # entity node)
        assert sel.get() == '<r attr="Xb">&a;c</r>'

    def test_entity_bomb_bounded_and_cycles_safe(self):
        bomb = (
            '<!DOCTYPE r [<!ENTITY a "bbbb">'
            '<!ENTITY b "&a;&a;&a;&a;&a;&a;&a;&a;">'
            '<!ENTITY c "&b;&b;&b;&b;&b;&b;&b;&b;">]>'
            '<r x="&c;&c;&c;"/>'
        )
        v = Selector(text=bomb, type="xml").xpath("//r/@x").get()
        assert len(v) < 100_000  # expansion budget holds
        cyc = '<!DOCTYPE r [<!ENTITY a "&b;"><!ENTITY b "&a;">]><r x="&a;"/>'
        out = Selector(text=cyc, type="xml").xpath("//r/@x").get()
        assert "&" in out  # gives up, keeps a literal reference

    def test_external_entity_never_resolved(self):
        xxe = (
            '<!DOCTYPE r [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>'
            '<r x="&xxe;">&xxe;</r>'
        )
        sel = Selector(text=xxe, type="xml")
        assert sel.get() == '<r x="&xxe;">&xxe;</r>'


class TestFilterExprPredicates:
    """Predicates on a parenthesized FilterExpr index the WHOLE node-set
    in document order ((//a)[2] = second <a> anywhere), unlike step
    predicates which are per-context-node (//a[2]).  lxml/libxml2
    semantics; round-3 fix (the old compilation as a self::node() step
    made every position()-predicate vacuously true)."""

    DOC = """<html><body>
      <div id="a"><a href="1">one</a><a href="2">two</a></div>
      <div id="b"><a href="3">three</a></div>
      <p class="x y">para1</p><p>para2</p>
    </body></html>"""

    def sel(self):
        return Selector(text=self.DOC)

    def test_positional_filter(self):
        assert self.sel().xpath("(//a)[1]/@href").get() == "1"
        assert self.sel().xpath("(//a)[last()]/@href").get() == "3"
        assert self.sel().xpath("(//a/@href)[2]").get() == "2"

    def test_filter_then_path_continuation(self):
        assert self.sel().xpath("(//div)[2]/a/@href").getall() == ["3"]
        assert self.sel().xpath("(//div)[last()]//text()").getall() == ["three"]

    def test_chained_filter_predicates(self):
        got = self.sel().xpath("(//a)[position()>1][1]/@href").get()
        assert got == "2"

    def test_union_inside_filter(self):
        got = self.sel().xpath("(//a | //p)[3]").get()
        assert got == '<a href="3">three</a>'

    def test_step_predicates_stay_per_context(self):
        # contrast case: //a[1] is first-within-each-div (two matches)
        assert self.sel().xpath("//a[1]/@href").getall() == ["1", "3"]

    def test_nested_parens(self):
        assert self.sel().xpath("((//a)[2])/text()").get() == "two"


class TestNumberStringEdges:
    """XPath 1.0 number->string conversion never uses exponential
    notation, and substring() handles non-finite bounds per spec."""

    def sel(self):
        return Selector(text="<p>x</p>")

    def test_no_exponential_notation(self):
        assert self.sel().xpath("string(0.000001)").get() == "0.000001"
        assert self.sel().xpath("string(0.00000001)").get() == "0.00000001"
        assert self.sel().xpath("string(-0.5 + 0.25)").get() == "-0.25"

    def test_nonfinite_names(self):
        assert self.sel().xpath("string(1 div 0)").get() == "Infinity"
        assert self.sel().xpath("string(-1 div 0)").get() == "-Infinity"
        assert self.sel().xpath("string(0 div 0)").get() == "NaN"

    def test_substring_infinite_length(self):
        s = self.sel()
        assert s.xpath("substring('12345', -42, 1 div 0)").get() == "12345"
        assert s.xpath("substring('12345', 2, 1 div 0)").get() == "2345"
        assert s.xpath("substring('12345', 1 div 0, 1 div 0)").get() == ""
        assert s.xpath("substring('12345', 0 div 0)").get() == ""

    def test_substring_rounding(self):
        assert self.sel().xpath("substring('12345', 1.5, 2.6)").get() == "234"

    def test_substring_negative_infinity_start(self):
        # two-arg: every position >= round(-inf) — the whole string
        # (libxml2 agrees); three-arg: the upper bound is -inf + len
        # (-inf, or NaN for infinite len) — nothing qualifies
        s = self.sel()
        assert s.xpath("substring('12345', -1 div 0)").get() == "12345"
        assert s.xpath("substring('12345', -1 div 0, 3)").get() == ""
        assert s.xpath("substring('12345', -1 div 0, 1 div 0)").get() == ""


class TestReverseAxisPosition:
    """XPath 1.0 §2.4: on reverse axes (ancestor, ancestor-or-self,
    preceding, preceding-sibling) position() counts in PROXIMITY order
    (nearest first), while the returned node-set is document-ordered.
    Pins the round-3 ancestor-ordering fix."""

    HTML = (
        "<html><body>"
        "<p id='p1'>a</p><p id='p2'>b</p><p id='p3'>c</p>"
        "<div id='d'><span id='s'>x</span></div>"
        "</body></html>"
    )

    def sel(self):
        from parsel_ray import Selector

        return Selector(text=self.HTML)

    def test_ancestor_or_self_first_is_self(self):
        s = self.sel()
        assert s.xpath("//div/ancestor-or-self::*[1]/@id").get() == "d"

    def test_ancestor_or_self_last_is_root(self):
        s = self.sel()
        got = s.xpath("name(//div/ancestor-or-self::*[last()])").get()
        assert got == "html"

    def test_ancestor_position_counts_upward(self):
        s = self.sel()
        assert s.xpath("//span/ancestor::*[1]/@id").get() == "d"
        assert s.xpath("name(//span/ancestor::*[2])").get() == "body"
        assert s.xpath("//span/ancestor::div[1]/@id").get() == "d"

    def test_preceding_sibling_proximity(self):
        s = self.sel()
        assert s.xpath("//div/preceding-sibling::p[1]/@id").get() == "p3"
        assert s.xpath("//div/preceding-sibling::p[last()]/@id").get() == "p1"

    def test_preceding_proximity(self):
        s = self.sel()
        assert s.xpath("//p[@id='p3']/preceding::p[2]/@id").get() == "p1"

    def test_result_set_is_document_ordered(self):
        s = self.sel()
        import re

        names = [
            re.match(r"<(\w+)", n).group(1)
            for n in s.xpath("//span/ancestor-or-self::*").getall()
        ]
        assert names == ["html", "body", "div", "span"]


class TestGrammarEdges:
    """Exotic-but-legal XPath 1.0 constructs a scrapy user might carry
    over: mod in positional predicates, parenthesized node-set
    indexing, unions with predicates, nested function composition,
    unary minus, cross-step .. predicates."""

    HTML = (
        "<html><body>"
        "<ul><li class='a'>one</li><li class='b'>two</li>"
        "<li class='a'>three</li><li>four</li></ul>"
        "<div data-n='3.7'>x</div><div data-n='2'>y</div>"
        "</body></html>"
    )

    def sel(self):
        from parsel_ray import Selector

        return Selector(text=self.HTML)

    def test_position_mod(self):
        s = self.sel()
        assert s.xpath("//li[position() mod 2 = 1]/text()").getall() == [
            "one", "three",
        ]

    def test_last_minus_one(self):
        assert self.sel().xpath("//li[last()-1]/text()").get() == "three"

    def test_parenthesized_indexing(self):
        assert self.sel().xpath("(//li)[2]/text()").get() == "two"

    def test_union_with_predicates(self):
        s = self.sel()
        got = s.xpath("//ul/li[@class='a'] | //div[@data-n='2']").getall()
        assert len(got) == 3 and got[-1].startswith("<div")

    def test_sum_floor_over_attrs(self):
        s = self.sel()
        assert s.xpath("string(sum(//div/@data-n))").get() == "5.7"
        assert s.xpath("string(floor(sum(//div/@data-n)))").get() == "5"

    def test_translate_of_string_of_nodeset(self):
        s = self.sel()
        assert (
            s.xpath("translate(string(//li[1]), 'one', 'ONE')").get() == "ONE"
        )

    def test_dotdot_predicate(self):
        s = self.sel()
        # every li whose parent also has a class='b' li -> all four
        assert len(s.xpath("//li[../li[@class='b']]/text()").getall()) == 4

    def test_unary_minus_arithmetic(self):
        assert self.sel().xpath("string(-3 + 5)").get() == "2"

    def test_hasclass_style_contains(self):
        s = self.sel()
        got = s.xpath(
            "//li[contains(concat(' ', @class, ' '), ' a ')]/text()"
        ).getall()
        assert got == ["one", "three"]

    def test_string_length_of_substring(self):
        s = self.sel()
        assert s.xpath("string(string-length(substring('hello', 2, 3)))").get() == "3"


class TestGrammarCorners:
    """XPath 1.0 grammar/function corners beyond the ported conformance
    suite (spec §§2.4, 3.5-3.7, 4.2-4.4) — pinned after checking each
    against the spec's rules (position rounding, per-context last(),
    parenthesized path re-rooting, numeric lexing)."""

    HTML = (
        '<html><body>'
        '<div id="a"><p class="x">one</p><p>two</p></div>'
        '<div id="b"><p>three</p></div>'
        '<span data-n="5">n5</span><span data-n="12">n12</span>'
        '</body></html>'
    )

    def sel(self):
        from parsel_ray import Selector

        return Selector(text=self.HTML)

    def test_last_is_per_context_vs_parenthesized(self):
        s = self.sel()
        assert s.xpath("//p[last()]/text()").getall() == ["two", "three"]
        assert s.xpath("(//p)[last()]/text()").getall() == ["three"]

    def test_position_mod_predicate(self):
        assert self.sel().xpath(
            "//div/p[position() mod 2 = 1]/text()"
        ).getall() == ["one", "three"]

    def test_parent_abbreviation_to_attribute(self):
        assert self.sel().xpath("//p/../@id").getall() == ["a", "b"]

    def test_numeric_attribute_comparison(self):
        assert self.sel().xpath(
            "//span[@data-n > 10]/@data-n"
        ).getall() == ["12"]

    def test_substring_rounding_rules(self):
        # spec §4.2: round(1.5)=2, round(1.5+2.6)=4 → chars 2..3
        s = self.sel()
        assert s.xpath("substring('12345', 1.5, 2.6)").get() == "234"
        assert s.xpath("substring('12345', 0)").get() == "12345"
        assert s.xpath("substring('12345', 2, 3)").get() == "234"

    def test_translate_drops_unmapped(self):
        assert self.sel().xpath(
            "translate('abcabc', 'abc', 'AB')"
        ).get() == "ABAB"

    def test_nodeset_to_string_takes_first(self):
        assert self.sel().xpath("concat(//p, '-')").get() == "one-"

    def test_arithmetic_precedence_div_mod(self):
        s = self.sel()
        assert s.xpath("2 + 3 * 4 - 1").get() == "13.0"
        assert s.xpath("10 div 4").get() == "2.5"
        assert s.xpath("7 mod 3").get() == "1.0"
        assert s.xpath("5.5 mod 2").get() == "1.5"  # fmod, not int mod
        assert s.xpath("-(-5)").get() == "5.0"

    def test_number_trims_whitespace(self):
        assert self.sel().xpath("number('  12  ')").get() == "12.0"

    def test_union_count_and_boolean_combinators(self):
        s = self.sel()
        assert s.xpath("count(//p | //span)").get() == "5.0"
        assert s.xpath("boolean(//p) and not(//table)").get() == "1"
