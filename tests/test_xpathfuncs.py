"""has-class + extension-function registry conformance
(ported from /root/reference/tests/test_xpathfuncs.py)."""

from __future__ import annotations

from typing import Any

import pytest

from parsel_ray import Selector, set_xpathfunc


def test_has_class_simple() -> None:
    body = """
    <p class="foo bar-baz">First</p>
    <p class="foo">Second</p>
    <p class="bar">Third</p>
    <p>Fourth</p>
    """
    sel = Selector(text=body)
    assert [x.extract() for x in sel.xpath('//p[has-class("foo")]/text()')] == [
        "First",
        "Second",
    ]
    assert [x.extract() for x in sel.xpath('//p[has-class("bar")]/text()')] == ["Third"]
    assert [x.extract() for x in sel.xpath('//p[has-class("foo","bar")]/text()')] == []
    assert [
        x.extract() for x in sel.xpath('//p[has-class("foo","bar-baz")]/text()')
    ] == ["First"]


def test_has_class_error_no_args() -> None:
    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match="has-class must have at least 1 argument"):
        sel.xpath("has-class()")


def test_has_class_error_invalid_arg_type() -> None:
    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match="has-class arguments must be strings"):
        sel.xpath("has-class(.)")


def test_has_class_unicode() -> None:
    sel = Selector(text='<p CLASS="fóó">First</p>')
    assert [x.extract() for x in sel.xpath('//p[has-class("fóó")]/text()')] == ["First"]


def test_has_class_uppercase() -> None:
    sel = Selector(text='<p CLASS="foo">First</p>')
    assert [x.extract() for x in sel.xpath('//p[has-class("foo")]/text()')] == ["First"]


def test_has_class_newline() -> None:
    sel = Selector(text='<p CLASS="foo\nbar">First</p>')
    assert [x.extract() for x in sel.xpath('//p[has-class("foo")]/text()')] == ["First"]


def test_has_class_tab() -> None:
    sel = Selector(text='<p CLASS="foo\tbar">First</p>')
    assert [x.extract() for x in sel.xpath('//p[has-class("foo")]/text()')] == ["First"]


def test_set_xpathfunc() -> None:
    def myfunc(ctx: Any) -> None:
        myfunc.call_count += 1  # type: ignore[attr-defined]

    myfunc.call_count = 0  # type: ignore[attr-defined]

    sel = Selector(text='<p CLASS="foo">First</p>')
    with pytest.raises(ValueError, match=r"Unregistered function(: myfunc)? in myfunc"):
        sel.xpath("myfunc()")

    set_xpathfunc("myfunc", myfunc)
    sel.xpath("myfunc()")
    assert myfunc.call_count == 1  # type: ignore[attr-defined]

    set_xpathfunc("myfunc", None)
    with pytest.raises(ValueError, match=r"Unregistered function(: myfunc)? in myfunc"):
        sel.xpath("myfunc()")


def test_exslt_set_distinct():
    """EXSLT set:distinct — first node in document order per distinct
    string-value (round 3: closed the one missing set: function)."""
    from parsel_ray import Selector

    s = Selector(
        text='<html><body><p class="b">1</p><p class="a">2</p>'
        '<p class="b">3</p></body></html>'
    )
    assert s.xpath("set:distinct(//p/@class)").getall() == ["b", "a"]
    assert s.xpath("count(set:distinct(//p))").get() == "3.0"
    assert s.xpath("set:distinct(//nope)").getall() == []
