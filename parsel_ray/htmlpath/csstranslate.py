"""CSS selector -> XPath translation.

Reproduces the translation contract pinned by the reference's golden pairs
(/root/reference/tests/test_selector_csstranslator.py:64-153), including the
``::text`` and ``::attr(name)`` pseudo-elements (csstranslator.py:33-48
defines their rendering; we re-derive it from the golden outputs):

* ``::attr(name)``       -> ``descendant-or-self::*/@name``
* ``a ::attr(img)``      -> ``descendant-or-self::a/descendant-or-self::*/@img``
* ``a > ::attr(class)``  -> ``descendant-or-self::a/*/@class``
* ``p ::text``           -> ``descendant-or-self::p/descendant-or-self::text()``

Implemented from the CSS Selectors Level 3 grammar on stdlib only
(cssselect is unavailable in this environment). Translation results are
LRU-cached per process, the same cache policy as the reference
(csstranslator.py:130-138: ``lru_cache(maxsize=256)``).
"""

from __future__ import annotations

import re
from functools import lru_cache


class ExpressionError(Exception):
    """Unknown or invalid pseudo-element / pseudo-class."""


class SelectorSyntaxError(Exception):
    """Malformed CSS selector."""


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

_CSS_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<string>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<number>[-+]?\d+(?:\.\d+)?)
  | (?P<ident>-?[A-Za-z_\xa0-\uffff][-\w\xa0-\uffff]*)
  | (?P<sym>.)
    """,
    re.VERBOSE,
)


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: str) -> None:
        self.kind = kind
        self.value = value


def _tokenize(css: str) -> list[_Tok]:
    out: list[_Tok] = []
    for m in _CSS_TOKEN.finditer(css):
        if m.group("ws"):
            out.append(_Tok("ws", " "))
        elif m.group("string") is not None:
            raw = m.group("string")[1:-1]
            out.append(_Tok("string", re.sub(r"\\(.)", r"\1", raw)))
        elif m.group("number") is not None:
            out.append(_Tok("number", m.group("number")))
        elif m.group("ident") is not None:
            out.append(_Tok("ident", m.group("ident")))
        else:
            out.append(_Tok("sym", m.group("sym")))
    out.append(_Tok("eof", ""))
    return out


# ---------------------------------------------------------------------------
# XPath expression being built (path/element/condition model + parsel's
# pseudo-element annotations)
# ---------------------------------------------------------------------------


class XPathExpr:
    def __init__(self, path: str = "", element: str = "*", condition: str = "") -> None:
        self.path = path
        self.element = element
        self.condition = condition
        self.textnode = False
        self.attribute: str | None = None

    def base_str(self) -> str:
        s = self.path + self.element
        if self.condition:
            s += f"[{self.condition}]"
        return s

    def add_condition(self, condition: str) -> "XPathExpr":
        if self.condition:
            self.condition = f"{self.condition} and ({condition})"
        else:
            self.condition = condition
        return self

    def add_name_test(self) -> None:
        if self.element == "*":
            return
        self.add_condition(f"name() = '{self.element}'")
        self.element = "*"

    def join(self, combiner: str, other: "XPathExpr") -> "XPathExpr":
        path = self.base_str() + combiner
        self.path = path + other.path
        self.element = other.element
        self.condition = other.condition
        self.textnode = other.textnode
        self.attribute = other.attribute
        return self

    def render(self, prefix: str) -> str:
        # pseudo-element adjustments apply to the *unprefixed* expression
        # (matches the reference's XPathExpr.__str__/prefix ordering,
        # csstranslator.py:33-48)
        path = self.base_str()
        if self.textnode:
            if path == "*":
                path = "text()"
            elif path.endswith("::*/*"):
                path = path[:-3] + "text()"
            else:
                path += "/text()"
        if self.attribute is not None:
            if path.endswith("::*/*"):
                path = path[:-2]
            path += f"/@{self.attribute}"
        return prefix + path


def _quote(value: str) -> str:
    if "'" not in value:
        return f"'{value}'"
    if '"' not in value:
        return f'"{value}"'
    parts: list[str] = []
    for i, chunk in enumerate(value.split("'")):
        if i:
            parts.append('"\'"')
        if chunk:
            parts.append(f"'{chunk}'")
    return "concat(%s)" % ", ".join(parts)


# ---------------------------------------------------------------------------
# Parser / translator
# ---------------------------------------------------------------------------


class Translator:
    """CSS -> XPath translator (one instance per document flavor).

    ``html=True`` lowercases element/attribute names (HTML documents are
    parsed lowercased); ``html=False`` is the XML/generic flavor.
    """

    def __init__(self, html: bool = True) -> None:
        self.html = html

    # public API

    def css_to_xpath(self, css: str, prefix: str = "descendant-or-self::") -> str:
        toks = _tokenize(css)
        pos = 0
        rendered: list[str] = []
        while True:
            expr, pos = self._parse_selector(toks, pos)
            rendered.append(expr.render(prefix))
            if toks[pos].kind == "ws":  # 'p , a' / trailing 'p ' are valid
                pos += 1
            t = toks[pos]
            if t.kind == "eof":
                break
            if t.kind == "sym" and t.value == ",":
                pos += 1
                if toks[pos].kind == "ws":
                    pos += 1
                continue
            raise SelectorSyntaxError(f"Unexpected token {t.value!r} in {css!r}")
        return " | ".join(rendered)

    # selector = seq (combinator seq)*

    def _parse_selector(self, toks: list[_Tok], pos: int) -> tuple[XPathExpr, int]:
        if toks[pos].kind == "ws":
            pos += 1
        left, pos = self._parse_simple_sequence(toks, pos)
        while True:
            combinator = None
            j = pos
            if toks[j].kind == "ws":
                combinator = " "
                j += 1
            if toks[j].kind == "sym" and toks[j].value in (">", "+", "~"):
                combinator = toks[j].value
                j += 1
                if toks[j].kind == "ws":
                    j += 1
            if combinator is None or toks[j].kind == "eof" or (
                toks[j].kind == "sym" and toks[j].value == ","
            ):
                break
            right, j = self._parse_simple_sequence(toks, j)
            if combinator == " ":
                left = left.join("/descendant-or-self::*/", right)
            elif combinator == ">":
                left = left.join("/", right)
            elif combinator == "~":
                left = left.join("/following-sibling::", right)
            else:  # '+'
                left = left.join("/following-sibling::", right)
                left.add_name_test()
                left.add_condition("position() = 1")
            pos = j
        return left, pos

    def _parse_simple_sequence(self, toks: list[_Tok], pos: int) -> tuple[XPathExpr, int]:
        expr = XPathExpr()
        t = toks[pos]
        matched = False
        if t.kind == "ident":
            expr.element = t.value.lower() if self.html else t.value
            pos += 1
            matched = True
        elif t.kind == "sym" and t.value == "*":
            pos += 1
            matched = True
        while True:
            t = toks[pos]
            if t.kind == "sym" and t.value == "#":
                nxt = toks[pos + 1]
                if nxt.kind not in ("ident", "number"):
                    raise SelectorSyntaxError("Expected id after '#'")
                expr.add_condition(f"@id = {_quote(nxt.value)}")
                pos += 2
                matched = True
            elif t.kind == "sym" and t.value == ".":
                nxt = toks[pos + 1]
                if nxt.kind != "ident":
                    raise SelectorSyntaxError("Expected class name after '.'")
                expr.add_condition(
                    "@class and contains(concat(' ', normalize-space(@class), ' '), "
                    f"' {nxt.value} ')"
                )
                pos += 2
                matched = True
            elif t.kind == "sym" and t.value == "[":
                pos = self._parse_attrib(toks, pos + 1, expr)
                matched = True
            elif t.kind == "sym" and t.value == ":":
                if toks[pos + 1].kind == "sym" and toks[pos + 1].value == ":":
                    pos = self._parse_pseudo_element(toks, pos + 2, expr)
                else:
                    pos = self._parse_pseudo_class(toks, pos + 1, expr)
                matched = True
            else:
                break
        if not matched:
            raise SelectorSyntaxError(f"Expected selector, got {t.value!r}")
        return expr, pos

    # [attr op value]

    def _parse_attrib(self, toks: list[_Tok], pos: int, expr: XPathExpr) -> int:
        if toks[pos].kind == "ws":
            pos += 1
        t = toks[pos]
        if t.kind != "ident":
            raise SelectorSyntaxError("Expected attribute name")
        attr = t.value.lower() if self.html else t.value
        pos += 1
        if toks[pos].kind == "ws":
            pos += 1
        t = toks[pos]
        op = None
        if t.kind == "sym" and t.value == "]":
            expr.add_condition(f"@{attr}")
            return pos + 1
        if t.kind == "sym" and t.value in ("~", "|", "^", "$", "*"):
            nxt = toks[pos + 1]
            if not (nxt.kind == "sym" and nxt.value == "="):
                raise SelectorSyntaxError("Expected '=' in attribute selector")
            op = t.value + "="
            pos += 2
        elif t.kind == "sym" and t.value == "=":
            op = "="
            pos += 1
        else:
            raise SelectorSyntaxError(f"Unexpected {t.value!r} in attribute selector")
        if toks[pos].kind == "ws":
            pos += 1
        t = toks[pos]
        if t.kind not in ("ident", "string", "number"):
            raise SelectorSyntaxError("Expected attribute value")
        value = t.value
        pos += 1
        if toks[pos].kind == "ws":
            pos += 1
        t = toks[pos]
        if not (t.kind == "sym" and t.value == "]"):
            raise SelectorSyntaxError("Expected ']'")
        pos += 1
        q = _quote(value)
        if op == "=":
            expr.add_condition(f"@{attr} = {q}")
        elif op == "~=":
            if " " in value or not value:
                expr.add_condition("0")
            else:
                expr.add_condition(
                    f"@{attr} and contains(concat(' ', normalize-space(@{attr}), ' '), "
                    f"{_quote(' ' + value + ' ')})"
                )
        elif op == "|=":
            expr.add_condition(
                f"@{attr} and (@{attr} = {q} or starts-with(@{attr}, {_quote(value + '-')}))"
            )
        elif op == "^=":
            if value:
                expr.add_condition(f"@{attr} and starts-with(@{attr}, {q})")
            else:
                expr.add_condition("0")
        elif op == "$=":
            if value:
                expr.add_condition(
                    f"@{attr} and substring(@{attr}, string-length(@{attr})-{len(value) - 1}) = {q}"
                )
            else:
                expr.add_condition("0")
        elif op == "*=":
            if value:
                expr.add_condition(f"@{attr} and contains(@{attr}, {q})")
            else:
                expr.add_condition("0")
        return pos

    # ::pseudo-element

    def _parse_pseudo_element(self, toks: list[_Tok], pos: int, expr: XPathExpr) -> int:
        t = toks[pos]
        if t.kind != "ident":
            raise SelectorSyntaxError("Expected pseudo-element name")
        name = t.value.lower()
        pos += 1
        if toks[pos].kind == "sym" and toks[pos].value == "(":
            # functional pseudo-element
            args, pos = self._parse_function_args(toks, pos + 1)
            if name == "attr":
                if len(args) != 1 or args[0][0] not in ("ident", "string"):
                    raise ExpressionError(
                        f"Expected a single string or ident for ::attr(), got {args!r}"
                    )
                expr.attribute = args[0][1]
                return pos
            raise ExpressionError(
                f"The functional pseudo-element ::{name}() is unknown"
            )
        if name == "text":
            expr.textnode = True
            return pos
        if name == "attr":
            raise ExpressionError("Expected a single string or ident for ::attr()")
        raise ExpressionError(f"The pseudo-element ::{name} is unknown")

    def _parse_function_args(
        self, toks: list[_Tok], pos: int
    ) -> tuple[list[tuple[str, str]], int]:
        args: list[tuple[str, str]] = []
        depth = 1
        while True:
            t = toks[pos]
            if t.kind == "eof":
                raise SelectorSyntaxError("Unclosed function call")
            if t.kind == "sym" and t.value == "(":
                depth += 1
                args.append((t.kind, t.value))
            elif t.kind == "sym" and t.value == ")":
                depth -= 1
                if depth == 0:
                    return args, pos + 1
                args.append((t.kind, t.value))
            elif t.kind == "ws":
                # keep the separator: :has(ul li) needs it to see the
                # descendant combinator (nth parsers strip spaces)
                args.append((t.kind, " "))
            elif t.kind == "sym" and t.value in ("@",):
                raise SelectorSyntaxError(f"Unexpected {t.value!r} in arguments")
            else:
                args.append((t.kind, t.value))
            pos += 1

    # :pseudo-class

    def _parse_pseudo_class(self, toks: list[_Tok], pos: int, expr: XPathExpr) -> int:
        t = toks[pos]
        if t.kind != "ident":
            raise SelectorSyntaxError("Expected pseudo-class name")
        name = t.value.lower()
        pos += 1
        if toks[pos].kind == "sym" and toks[pos].value == "(":
            raw_args, pos = self._parse_function_args(toks, pos + 1)
            return self._translate_functional_pseudo_class(name, raw_args, expr, pos)
        if name == "first-child":
            expr.add_condition("count(preceding-sibling::*) = 0")
        elif name == "last-child":
            expr.add_condition("count(following-sibling::*) = 0")
        elif name == "only-child":
            expr.add_condition(
                "count(preceding-sibling::*) = 0 and count(following-sibling::*) = 0"
            )
        elif name in ("first-of-type", "last-of-type", "only-of-type"):
            # of-type counts siblings of the SAME element type; a typed
            # selector is required (cssselect raises on *:first-of-type too)
            el = self._of_type_element(expr, name)
            if name == "first-of-type":
                expr.add_condition(f"count(preceding-sibling::{el}) = 0")
            elif name == "last-of-type":
                expr.add_condition(f"count(following-sibling::{el}) = 0")
            else:
                expr.add_condition(
                    f"count(preceding-sibling::{el}) = 0 and "
                    f"count(following-sibling::{el}) = 0"
                )
        elif name == "empty":
            expr.add_condition("not(*) and not(string-length())")
        elif name == "root":
            expr.add_condition("not(parent::*)")
        elif name == "checked" and self.html:
            expr.add_condition(
                "(@selected and name(.) = 'option') or "
                "(@checked and (name(.) = 'input' or name(.) = 'command') "
                "and (@type = 'checkbox' or @type = 'radio'))"
            )
        elif name == "link" and self.html:
            expr.add_condition(
                "@href and "
                "(name(.) = 'a' or name(.) = 'link' or name(.) = 'area')"
            )
        elif name == "disabled" and self.html:
            # cssselect HTMLTranslator semantics, incl. its documented
            # quirk: "input and @type != 'hidden'" is false for inputs
            # with NO type attribute, and the first-legend exception of
            # the HTML spec is not modeled
            expr.add_condition(
                "("
                "@disabled and ("
                "(name(.) = 'input' and @type != 'hidden') or "
                "name(.) = 'button' or name(.) = 'select' or "
                "name(.) = 'textarea' or name(.) = 'command' or "
                "name(.) = 'fieldset' or name(.) = 'optgroup' or "
                "name(.) = 'option')"
                ") or ("
                "((name(.) = 'input' and @type != 'hidden') or "
                "name(.) = 'button' or name(.) = 'select' or "
                "name(.) = 'textarea') "
                "and ancestor::fieldset[@disabled]"
                ")"
            )
        elif name == "enabled" and self.html:
            expr.add_condition(
                "("
                "@href and (name(.) = 'a' or name(.) = 'link' or "
                "name(.) = 'area')"
                ") or ("
                "(name(.) = 'command' or name(.) = 'fieldset' or "
                "name(.) = 'optgroup') and not(@disabled)"
                ") or ("
                "((name(.) = 'input' and @type != 'hidden') or "
                "name(.) = 'button' or name(.) = 'select' or "
                "name(.) = 'textarea' or name(.) = 'keygen') "
                "and not(@disabled) "
                "and not(ancestor::fieldset[@disabled])"
                ") or ("
                "name(.) = 'option' and not(@disabled or "
                "ancestor::optgroup[@disabled])"
                ")"
            )
        else:
            raise ExpressionError(f"The pseudo-class :{name} is unknown")
        return pos

    def _translate_functional_pseudo_class(
        self, name: str, raw_args: list[tuple[str, str]], expr: XPathExpr, pos: int
    ) -> int:
        if name == "nth-child":
            expr.add_condition(
                _nth_condition("count(preceding-sibling::*)", *_parse_nth(raw_args))
            )
        elif name == "nth-last-child":
            expr.add_condition(
                _nth_condition("count(following-sibling::*)", *_parse_nth(raw_args))
            )
        elif name in ("nth-of-type", "nth-last-of-type"):
            el = self._of_type_element(expr, name + "()")
            sib = "preceding" if name == "nth-of-type" else "following"
            expr.add_condition(
                _nth_condition(f"count({sib}-sibling::{el})", *_parse_nth(raw_args))
            )
        elif name == "not":
            inner_css = "".join(v for _k, v in raw_args)
            inner = Translator(self.html)
            sub, end = inner._parse_simple_sequence(_tokenize(inner_css), 0)
            if sub.textnode or sub.attribute:
                raise ExpressionError("Pseudo-elements are not allowed inside :not()")
            cond = sub.condition
            if sub.element != "*":
                name_test = f"name() = '{sub.element}'"
                cond = f"{name_test} and ({cond})" if cond else name_test
            expr.add_condition(f"not({cond})" if cond else "0")
        elif name == "lang":
            value = "".join(v for _k, v in raw_args).strip().strip("'\"")
            lit = value.replace("'", "")  # keep the condition parseable
            if self.html:
                # cssselect HTMLTranslator: nearest ancestor-or-self @lang,
                # case-insensitive, hyphen-refinement prefix
                expr.add_condition(
                    "ancestor-or-self::*[@lang][1]"
                    "[starts-with(concat(translate(@lang, "
                    "'ABCDEFGHIJKLMNOPQRSTUVWXYZ', "
                    "'abcdefghijklmnopqrstuvwxyz'), '-'), "
                    f"'{lit.lower()}-')]"
                )
            else:
                expr.add_condition(f"lang('{lit}')")
        elif name == "has":
            inner_css = "".join(v for _k, v in raw_args).strip()
            axis = "descendant::"
            if inner_css.startswith(">"):
                axis = ""
                inner_css = inner_css[1:].strip()
            inner = Translator(self.html)
            sub = _tokenize(inner_css)
            # full selector parse: ':has(ul li)' carries combinators,
            # which a simple-sequence parse would silently concatenate
            # into the nonexistent element 'ulli'
            sub_expr, _end = inner._parse_selector(sub, 0)
            expr.add_condition(axis + sub_expr.base_str() if axis else sub_expr.base_str())
        else:
            raise ExpressionError(f"The pseudo-class :{name}() is unknown")
        return pos

    @staticmethod
    def _of_type_element(expr: XPathExpr, pseudo: str) -> str:
        if expr.element == "*":
            raise ExpressionError(f"*:{pseudo} is not implemented")
        return expr.element


def _nth_condition(count_expr: str, a: int, b: int) -> str:
    """XPath condition for the CSS an+b pattern over a sibling count:
    position p (= count_expr + 1) matches iff p = a*k + b for some
    integer k >= 0.  For a > 0 that is p >= b with (p - b) mod a = 0;
    for a < 0 it is p <= b with (b - p) mod -a = 0 (e.g. -n+2 matches
    positions 2 and 1); a = 0 pins p = b exactly."""
    if a == 0:
        return f"{count_expr} = {b - 1}"
    if a > 0:
        return (
            f"({count_expr} + 1 >= {b}) and "
            f"(({count_expr} + 1 - {b}) mod {a} = 0)"
        )
    return (
        f"({count_expr} + 1 <= {b}) and "
        f"(({b} - ({count_expr} + 1)) mod {-a} = 0)"
    )


def _parse_nth(raw_args: list[tuple[str, str]]) -> tuple[int, int]:
    s = "".join(v for _k, v in raw_args).replace(" ", "").lower()
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 2
    m = re.fullmatch(r"([-+]?\d*)n([-+]\d+)?", s)
    if m:
        a_s, b_s = m.group(1), m.group(2)
        a = int(a_s) if a_s not in ("", "+", "-") else (-1 if a_s == "-" else 1)
        b = int(b_s) if b_s else 0
        return a, b
    try:
        return 0, int(s)
    except ValueError:
        raise ExpressionError(f"Invalid nth-child expression: {s!r}")


_html_translator = Translator(html=True)
_xml_translator = Translator(html=False)


@lru_cache(maxsize=256)
def css2xpath_html(query: str) -> str:
    return _html_translator.css_to_xpath(query)


@lru_cache(maxsize=256)
def css2xpath_xml(query: str) -> str:
    return _xml_translator.css_to_xpath(query)


def css2xpath(query: str) -> str:
    """Translated XPath version of a CSS query (HTML flavor) — public API
    parity with the reference's ``parsel.css2xpath`` (csstranslator.py:144-146)."""
    return css2xpath_html(query)
