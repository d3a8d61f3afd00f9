"""Adversarial XPath battery: randomly-generated well-formed expressions
from the documented XPath 1.0 subset, checked against METAMORPHIC
relations the spec guarantees — count/boolean consistency, parenthesized
indexing, union laws, predicate-subset containment, last() selection.

No lxml exists in this environment, so there is no external evaluator to
diff against; these relations are the oracle instead: a silent wrong
answer in the evaluator must break at least one relation on some
generated expression (each relation evaluates the SAME node-set through
two independent code paths — e.g. count() runs the numeric-function
machinery while len(getall()) runs node-set extraction).  Unsupported
corners must stay LOUD: if an expression raises, it must raise
ValueError (the documented error contract, htmlpath/xpath.py:1-25), and
derived forms (count(E), boolean(E), (E)[1]) must not flip between
working and raising inconsistently."""

from __future__ import annotations

import random

import pytest

from parsel_ray import Selector

HTML = """<html><body>
<div id="a" class="x y"><p class="x">one</p><p>two<b>bold</b></p></div>
<div id="b"><span lang="en-US">hi<i>it</i></span><p class="x">three</p></div>
<ul id="l"><li>1</li><li class="x">2</li><li>3</li><li>4</li></ul>
<table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr></table>
</body></html>"""

SEL = Selector(text=HTML)

AXES = [
    "", "descendant::", "self::", "descendant-or-self::",
    "following-sibling::", "preceding-sibling::", "ancestor::",
    "ancestor-or-self::", "following::", "preceding::", "parent::",
]
NAMES = ["div", "p", "b", "span", "i", "ul", "li", "td", "tr", "*", "node()"]
ATTRS = ["id", "class", "lang"]
VALUES = ["a", "b", "x", "l", "en-US", "nope"]


def gen_predicate(rng: random.Random, depth: int) -> str:
    kind = rng.randrange(8)
    if kind == 0:
        return f"[{rng.randrange(1, 5)}]"
    if kind == 1:
        return "[last()]"
    if kind == 2:
        return f"[position() <= {rng.randrange(1, 4)}]"
    if kind == 3:
        return f"[@{rng.choice(ATTRS)}]"
    if kind == 4:
        return f"[@{rng.choice(ATTRS)}='{rng.choice(VALUES)}']"
    if kind == 5:
        return f"[{rng.choice(NAMES[:9])}]"
    if kind == 6:
        return f"[contains(@class, '{rng.choice(['x', 'y', 'z'])}')]"
    return f"[count({gen_path(rng, depth + 1, rel=True)}) >= 1]"


def gen_step(rng: random.Random, depth: int) -> str:
    s = rng.choice(AXES) + rng.choice(NAMES)
    if s.startswith("parent::"):
        return s  # positional predicates on parent:: are a 1-node set
    while rng.random() < 0.4 and depth < 3:
        s += gen_predicate(rng, depth)
    return s


def gen_path(rng: random.Random, depth: int = 0, rel: bool = False) -> str:
    steps = [gen_step(rng, depth) for _ in range(rng.randrange(1, 4))]
    if rng.random() < 0.2:  # attribute or text() node-set endings
        steps.append(rng.choice(
            [f"@{rng.choice(ATTRS)}", "@*", "text()", "comment()"]
        ))
    head = ("" if rel else rng.choice(["//", "/descendant-or-self::node()/"]))
    if rel and rng.random() < 0.5:
        head = "descendant::"
        return head + steps[0]
    return head + "/".join(steps) if not rel else "/".join(steps)


def results_or_error(xp: str):
    try:
        return SEL.xpath(xp).getall(), None
    except ValueError as e:
        return None, e
    # anything else propagates and fails the test: the error contract is
    # ValueError only


N_EXPRS = 400


@pytest.fixture(scope="module")
def corpus():
    rng = random.Random(20260820)
    return [gen_path(rng) for _ in range(N_EXPRS)]


class TestMetamorphicRelations:
    def test_count_matches_cardinality(self, corpus):
        """count(E) (numeric-function path) == len(E.getall()) (node-set
        extraction path) for every evaluable expression; if E raises,
        count(E) must raise too (ValueError, loud)."""
        checked = 0
        for e in corpus:
            got, err = results_or_error(e)
            cgot, cerr = results_or_error(f"count({e})")
            if err is not None:
                assert cerr is not None, (e, "count worked but E raised")
                continue
            assert cerr is None, (e, "E worked but count raised")
            assert float(cgot[0]) == float(len(got)), (e, cgot, len(got))
            checked += 1
        assert checked > N_EXPRS // 2  # the generator mostly emits legal forms

    def test_boolean_matches_nonempty(self, corpus):
        for e in corpus:
            got, err = results_or_error(e)
            if err is not None:
                continue
            bgot, berr = results_or_error(f"boolean({e})")
            assert berr is None, e
            assert bgot == (["1"] if got else ["0"]), (e, bgot, len(got))

    def test_parenthesized_first_and_last(self, corpus):
        """(E)[1] == first result in doc order; (E)[last()] == last."""
        for e in corpus:
            got, err = results_or_error(e)
            if err is not None:
                continue
            fgot, ferr = results_or_error(f"({e})[1]")
            lgot, lerr = results_or_error(f"({e})[last()]")
            assert ferr is None and lerr is None, e
            assert fgot == got[:1], (e, fgot, got[:1])
            assert lgot == got[-1:], (e, lgot, got[-1:])

    def test_union_laws(self, corpus):
        """E|E == E (idempotent, doc order); A|B == B|A (order-identical:
        both serialize the merged set in document order)."""
        for i in range(0, len(corpus) - 1, 2):
            a, b = corpus[i], corpus[i + 1]
            ra, ea = results_or_error(a)
            rb, eb = results_or_error(b)
            if ea is not None or eb is not None:
                continue
            dup, edup = results_or_error(f"{a} | {a}")
            assert edup is None and dup == ra, (a, "union idempotence")
            ab, eab = results_or_error(f"{a} | {b}")
            ba, eba = results_or_error(f"{b} | {a}")
            assert eab is None and eba is None, (a, b)
            assert ab == ba, (a, b, "union commutativity")
            # the union is a superset of each side (as multisets of
            # serializations, union size can dedup shared nodes)
            assert len(ab) <= len(ra) + len(rb)
            for x in set(ra) | set(rb):
                assert x in ab, (a, b, x)

    def test_predicate_subset(self, corpus):
        """(E)[pred] selects a sub-multiset of E, preserving order."""
        rng = random.Random(99)
        for e in corpus[:200]:
            got, err = results_or_error(e)
            if err is not None:
                continue
            pred = gen_predicate(rng, depth=3)
            sub, serr = results_or_error(f"({e}){pred}")
            if serr is not None:
                continue  # predicate itself may hit an unsupported corner
            it = iter(got)
            assert all(x in it for x in sub), (e, pred, "not an ordered subset")

    def test_string_function_algebra(self, corpus):
        """String-function identities over generated node-sets: the
        string value of E is string((E)[1]); string-length distributes
        over concat; normalize-space is idempotent; translate with an
        empty map is identity; substring(s, 1) == s.  Each identity
        routes the same value through different function machinery."""
        for e in corpus[:150]:
            got, err = results_or_error(e)
            if err is not None:
                continue
            sv, serr = results_or_error(f"string({e})")
            fv, ferr = results_or_error(f"string(({e})[1])")
            assert serr is None and ferr is None, e
            assert sv == fv, (e, "string(E) != string((E)[1])")
            ln, lerr = results_or_error(f"string-length(string({e}))")
            l2, l2err = results_or_error(
                f"string-length(concat(string({e}), 'xy')) - 2"
            )
            assert lerr is None and l2err is None, e
            assert float(ln[0]) == float(l2[0]), (e, ln, l2)
            ns1, _ = results_or_error(f"normalize-space({e})")
            ns2, _ = results_or_error(
                f"normalize-space(normalize-space({e}))"
            )
            assert ns1 == ns2, (e, "normalize-space not idempotent")
            tr, _ = results_or_error(f"translate(string({e}), '', '')")
            assert tr == sv, (e, "translate identity broken")
            ss, _ = results_or_error(f"substring(string({e}), 1)")
            assert ss == sv, (e, "substring(s, 1) != s")

    def test_self_union_with_descendants_contains_self(self, corpus):
        """E | E/descendant-or-self::node() ⊇ E."""
        for e in corpus[:100]:
            got, err = results_or_error(e)
            if err is not None or not got:
                continue
            sup, serr = results_or_error(
                f"{e} | ({e})/descendant-or-self::node()"
            )
            if serr is not None:
                continue
            for x in set(got):
                assert x in sup, (e, x)
