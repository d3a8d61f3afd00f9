"""``Selector`` / ``SelectorList`` — the per-document query API.

API and semantics parity with the reference selector
(/root/reference/parsel/selector.py), re-implemented over the pure-Python
:mod:`parsel_ray.htmlpath` kernel (stdlib-only; lxml/cssselect/jmespath'
upstream stack is replaced by our own DOM + XPath + CSS translator, with
``jmespath`` from the environment).

Pinned invariants (checked by tests ported from the reference suite):

* not picklable — parsed trees never cross process/task boundaries
  (selector.py:499-500); Ray stages ship only str/bytes + extracted strings
* extraction always returns ``str`` for HTML/XML; XPath booleans -> "1"/"0",
  numbers -> ``str(float)`` (selector.py:699-721)
* JSON-first type sniffing for text/utf-8 bytes (selector.py:301-347)
* per-selector namespace state seeded with EXSLT ``re:``/``set:`` prefixes
  (selector.py:418-427); ad-hoc namespaces not persisted
* ``drop()`` is the only mutator: HTML keeps tail text, XML removes plainly
  (selector.py:757-784)
"""

from __future__ import annotations

import json
import typing
import warnings
from typing import Any, Mapping, Pattern

import jmespath as _jmespath

from .htmlpath import csstranslate
from .htmlpath.dom import Document, Element, parse_html, parse_xml
from .htmlpath.xpath import (
    Evaluator,
    XPathError,
    compile_xpath,
)
from .utils import extract_regex, flatten, iflatten, shorten

_NOT_SET = object()

# Engine always supports deep nesting; kept for API parity with the
# reference's lxml-version gate (selector.py:43-45).
LXML_SUPPORTS_HUGE_TREE = True


class CannotRemoveElementWithoutRoot(Exception):
    pass


class CannotRemoveElementWithoutParent(Exception):
    pass


class CannotDropElementWithoutParent(CannotRemoveElementWithoutParent):
    pass


class SafeXMLParser:
    """API-parity marker (reference selector.py:57-63 wraps lxml's
    XMLParser with ``resolve_entities=False``).  This engine's XML parser
    NEVER resolves external/recursive entities (``htmlpath.dom.parse_xml``
    keeps them as references — the billion-laughs corpus parses in O(1)
    memory, see the xml-attack conformance cases), so safety is
    unconditional and this class carries no behavior; it exists so
    reference imports port unchanged."""

    def __init__(self, *args, **kwargs) -> None:
        self.args = args
        self.kwargs = kwargs


def _xml_or_html(type_: str | None) -> str:
    return "xml" if type_ == "xml" else "html"


class SmartString(str):
    """``str`` carrying the owning DOM element — the engine's analog of
    lxml's smart strings (``_ElementUnicodeResult.getparent()``), produced
    only by Selector subclasses that opt in with
    ``_lxml_smart_strings = True`` (reference selector.py:428,
    tests/test_selector.py test_smart_strings)."""

    __slots__ = ("_parent",)

    def __new__(cls, value: str, parent=None):
        s = super().__new__(cls, value)
        s._parent = parent
        return s

    def getparent(self):
        return self._parent


def create_root_node(
    text: str,
    type_: str = "html",
    base_url: str | None = None,
    huge_tree: bool = True,
    body: bytes = b"",
    encoding: str = "utf-8",
) -> Element:
    """Parse ``text`` (or ``body``) into a root element: null bytes stripped,
    empty input -> ``<html/>`` (create_root_node contract, selector.py:90-119)."""
    if not text:
        text = body.replace(b"\x00", b"").strip().decode(encoding, errors="replace")
    else:
        text = text.strip().replace("\x00", "")
    if not text:
        text = "<html/>"
    if type_ == "xml":
        return parse_xml(text, base_url=base_url, huge_tree=huge_tree)
    return parse_html(text, base_url=base_url, huge_tree=huge_tree)


# every JSON document's first non-ws byte is one of these ({ [ " digit
# - t(rue) f(alse) n(ull), plus N(aN)/I(nfinity) which json.loads
# accepts by default) — anything else can skip the parse attempt.
# This sniff runs per WRAPPED STRING RESULT (every extracted href/text
# builds a Selector), so the exception-per-string cost is hot-path.
_JSON_LEAD = frozenset('{["-0123456789tfnNI')


def _is_valid_json(text: Any) -> bool:
    if isinstance(text, str):
        head = text[:1]
        if head not in _JSON_LEAD:
            if not head or not head.isspace():
                return False
            if text.lstrip()[:1] not in _JSON_LEAD:
                return False
    try:
        json.loads(text)
    except (TypeError, ValueError):
        return False
    return True


def _load_json_or_none(text: Any) -> Any:
    if isinstance(text, (str, bytes, bytearray)):
        try:
            return json.loads(text)
        except ValueError:
            return None
    return None


class SelectorList(list):
    """List of selectors with flattened re-query fan-out
    (reference: selector.py:122-291)."""

    def __getitem__(self, pos):
        o = super().__getitem__(pos)
        if isinstance(pos, slice):
            return self.__class__(o)
        return o

    def __getstate__(self) -> None:
        raise TypeError("can't pickle SelectorList objects")

    def jmespath(self, query: str, **kwargs: Any) -> "SelectorList":
        return self.__class__(flatten([x.jmespath(query, **kwargs) for x in self]))

    def xpath(
        self,
        xpath: str,
        namespaces: Mapping[str, str] | None = None,
        **kwargs: Any,
    ) -> "SelectorList":
        return self.__class__(
            flatten([x.xpath(xpath, namespaces=namespaces, **kwargs) for x in self])
        )

    def css(self, query: str) -> "SelectorList":
        return self.__class__(flatten([x.css(query) for x in self]))

    def re(self, regex: str | Pattern[str], replace_entities: bool = True) -> list[str]:
        return flatten([x.re(regex, replace_entities=replace_entities) for x in self])

    def re_first(
        self,
        regex: str | Pattern[str],
        default: str | None = None,
        replace_entities: bool = True,
    ) -> str | None:
        for el in iflatten(x.re(regex, replace_entities=replace_entities) for x in self):
            return typing.cast("str", el)
        return default

    def getall(self) -> list[str]:
        return [x.get() for x in self]

    extract = getall

    def get(self, default: str | None = None) -> Any:
        for x in self:
            return x.get()
        return default

    extract_first = get

    @property
    def attrib(self) -> Mapping[str, str]:
        for x in self:
            return x.attrib
        return {}

    def drop(self) -> None:
        for x in self:
            x.drop()


class Selector:
    """Wrapper for one HTML/XML/JSON document (or one node of it) supporting
    CSS, XPath and JMESPath queries (reference: selector.py:380-812)."""

    __slots__ = [
        "__weakref__",
        "_expr",
        "_huge_tree",
        "_text",
        "body",
        "namespaces",
        "root",
        "type",
    ]

    _default_namespaces = {
        "re": "http://exslt.org/regular-expressions",
        "set": "http://exslt.org/sets",
    }
    selectorlist_cls = SelectorList
    # opt-in smart strings (reference selector.py:428): subclasses set True
    # to make text()/@attr results SmartString (carrying .getparent())
    _lxml_smart_strings = False

    def __init__(
        self,
        text: str | None = None,
        type: str | None = None,  # noqa: A002 - API parity
        body: bytes | bytearray = b"",
        encoding: str = "utf-8",
        namespaces: Mapping[str, str] | None = None,
        root: Any | None = _NOT_SET,
        base_url: str | None = None,
        _expr: str | None = None,
        huge_tree: bool = True,
    ) -> None:
        if type not in ("html", "json", "text", "xml", None):
            raise ValueError(f"Invalid type: {type}")

        if text is None and not body and root is _NOT_SET:
            raise ValueError("Selector needs text, body, or root arguments")

        if text is not None and not isinstance(text, str):
            raise TypeError(
                f"text argument should be of type str, got {text.__class__}"
            )

        if text is not None:
            if root is not _NOT_SET:
                warnings.warn(
                    "Selector got both text and root, root is being ignored.",
                    stacklevel=2,
                )
            root_, type_ = self._root_and_type_from_text(
                text, input_type=type, base_url=base_url, huge_tree=huge_tree
            )
            self.root = root_
            self.type = type_
        elif body:
            if not isinstance(body, (bytes, bytearray)):
                raise TypeError(
                    f"body argument should be of type bytes or bytearray, "
                    f"got {body.__class__}"
                )
            root_, type_ = self._root_and_type_from_bytes(
                bytes(body),
                encoding,
                input_type=type,
                base_url=base_url,
                huge_tree=huge_tree,
            )
            self.root = root_
            self.type = type_
        elif root is _NOT_SET:
            raise ValueError("Selector needs text, body, or root arguments")
        else:
            self.root = root
            self.type = self._root_type(root, input_type=type)

        self.namespaces = dict(self._default_namespaces)
        if namespaces is not None:
            self.namespaces.update(namespaces)
        self._expr = _expr
        self._huge_tree = huge_tree
        self._text = text

    # -- construction helpers (type sniffing mirrors selector.py:301-360) --

    @staticmethod
    def _root_and_type_from_text(
        text: str, *, input_type: str | None, base_url: str | None, huge_tree: bool
    ) -> tuple[Any, str]:
        if input_type == "text":
            return text, input_type
        try:
            data = json.loads(text)
        except ValueError:
            data = _NOT_SET
        if data is not _NOT_SET:
            return data, "json"
        if input_type == "json":
            return None, "json"
        type_ = _xml_or_html(input_type)
        root = create_root_node(text, type_, base_url=base_url, huge_tree=huge_tree)
        return root, type_

    @staticmethod
    def _root_and_type_from_bytes(
        body: bytes,
        encoding: str,
        *,
        input_type: str | None,
        base_url: str | None,
        huge_tree: bool,
    ) -> tuple[Any, str]:
        if input_type == "text":
            return body.decode(encoding), input_type
        if encoding == "utf-8":
            try:
                data = json.loads(body)
            except ValueError:
                data = _NOT_SET
            if data is not _NOT_SET:
                return data, "json"
        if input_type == "json":
            return None, "json"
        type_ = _xml_or_html(input_type)
        root = create_root_node(
            "", type_, base_url=base_url, huge_tree=huge_tree, body=body,
            encoding=encoding,
        )
        return root, type_

    @staticmethod
    def _root_type(root: Any, *, input_type: str | None) -> str:
        if isinstance(root, Element):
            if input_type in {"json", "text"}:
                raise ValueError(
                    f"Selector got a document Element object as root, "
                    f"and {input_type!r} as type."
                )
            return _xml_or_html(input_type)
        if isinstance(root, (dict, list)) or _is_valid_json(root):
            return "json"
        return input_type or "json"

    def __getstate__(self) -> Any:
        raise TypeError("can't pickle Selector objects")

    # -- queries -----------------------------------------------------------

    def jmespath(self, query: str, **kwargs: Any) -> SelectorList:
        if self.type == "json":
            data = _load_json_or_none(self.root) if isinstance(self.root, str) else self.root
        else:
            if not isinstance(self.root, Element):
                data = _load_json_or_none(self.root)
            else:
                data = _load_json_or_none(self.root.text)

        result = _jmespath.search(query, data, **kwargs)
        if result is None:
            result = []
        elif not isinstance(result, list):
            result = [result]

        def make(x: Any) -> "Selector":
            if isinstance(x, str):
                return self.__class__(text=x, _expr=query, type="text")
            return self.__class__(root=x, _expr=query)

        return self.selectorlist_cls([make(x) for x in result])

    def xpath(
        self,
        query: str,
        namespaces: Mapping[str, str] | None = None,
        **kwargs: Any,
    ) -> SelectorList:
        if self.type not in ("html", "xml", "text"):
            raise ValueError(f"Cannot use xpath on a Selector of type {self.type!r}")
        if self.type in ("html", "xml"):
            ctx = self.root
            if not isinstance(ctx, Element):
                return self.selectorlist_cls([])
        else:
            ctx = create_root_node(self._text or "", "html", huge_tree=self._huge_tree)

        nsp = dict(self.namespaces)
        if namespaces is not None:
            nsp.update(namespaces)
        try:
            ast = compile_xpath(query)
            result = Evaluator(namespaces=nsp, variables=kwargs).evaluate(ast, ctx)
        except XPathError as exc:
            raise ValueError(f"XPath error: {exc} in {query}")

        if not isinstance(result, list):
            result = [result]

        from .htmlpath.xpath import AttrNode, NamespaceNode, TextNode
        from .htmlpath.dom import (
            Comment,
            EntityRef,
            ProcessingInstruction,
            _strip_entity_refs,
        )

        smart = getattr(self, "_lxml_smart_strings", False)
        wrapped = []
        for x in result:
            if isinstance(x, (TextNode, AttrNode)):
                v = _strip_entity_refs(x.value)
                if smart:
                    # lxml smart-string semantics: tail text belongs to the
                    # element whose tail it is, not the container
                    owner = x.parent
                    if isinstance(x, TextNode) and x.slot:
                        owner = x.parent.children[x.slot - 1]
                    v = SmartString(v, owner)
                x = v
            elif isinstance(x, NamespaceNode):
                x = x.uri
            elif isinstance(x, Comment):
                x = f"<!--{x.text}-->"
            elif isinstance(x, ProcessingInstruction):
                x = x.serialize(_xml_or_html(self.type))
            elif isinstance(x, EntityRef):
                x = x.serialize(_xml_or_html(self.type))
            wrapped.append(
                self.__class__(
                    root=x,
                    _expr=query,
                    namespaces=self.namespaces,
                    type=_xml_or_html(self.type),
                )
            )
        return self.selectorlist_cls(wrapped)

    def css(self, query: str) -> SelectorList:
        if self.type not in ("html", "xml", "text"):
            raise ValueError(f"Cannot use css on a Selector of type {self.type!r}")
        return self.xpath(self._css2xpath(query))

    def _css2xpath(self, query: str) -> str:
        if _xml_or_html(self.type) == "xml":
            return csstranslate.css2xpath_xml(query)
        return csstranslate.css2xpath_html(query)

    def re(self, regex: str | Pattern[str], replace_entities: bool = True) -> list[str]:
        return extract_regex(regex, self.get(), replace_entities_flag=replace_entities)

    def re_first(
        self,
        regex: str | Pattern[str],
        default: str | None = None,
        replace_entities: bool = True,
    ) -> str | None:
        return next(
            iflatten(self.re(regex, replace_entities=replace_entities)), default
        )

    # -- terminals ---------------------------------------------------------

    def get(self) -> Any:
        if self.type in ("text", "json"):
            return self.root
        root = self.root
        if isinstance(root, Element):
            return root.serialize("xml" if self.type == "xml" else "html")
        if root is True:
            return "1"
        if root is False:
            return "0"
        return str(root) if not isinstance(root, str) else root

    extract = get

    def getall(self) -> list[str]:
        return [self.get()]

    # -- namespaces --------------------------------------------------------

    def register_namespace(self, prefix: str, uri: str) -> None:
        self.namespaces[prefix] = uri

    def remove_namespaces(self) -> None:
        if self.type == "json":
            return
        if not isinstance(self.root, Element):
            return
        for el in self.root.iter():
            if el.tag.startswith("{"):
                el.tag = el.tag.split("}", 1)[1]
            el.prefix = None
            el.nsmap = {}
            for an in list(el.attrib):
                if an.startswith("{"):
                    el.attrib[an.split("}", 1)[1]] = el.attrib.pop(an)

    # -- mutation ----------------------------------------------------------

    def drop(self) -> None:
        if not isinstance(self.root, Element):
            raise CannotRemoveElementWithoutRoot(
                "The node you're trying to drop has no root, "
                "are you trying to drop a pseudo-element? "
                "Try to use 'li' as a selector instead of 'li::text' or "
                "'//li' instead of '//li/text()', for example."
            )
        parent = self.root.getparent()
        if self.type == "xml":
            if parent is None:
                raise ValueError("This node has no parent")
            parent.remove_child(self.root, keep_tail=False)
        else:
            if parent is None:
                raise CannotDropElementWithoutParent(
                    "The node you're trying to remove has no parent, "
                    "are you trying to remove a root element?"
                )
            parent.remove_child(self.root, keep_tail=True)

    # -- misc --------------------------------------------------------------

    @property
    def attrib(self) -> dict[str, str]:
        if isinstance(self.root, Element):
            from .htmlpath.dom import _strip_entity_refs as _sref

            return {
                k: ("" if v is None else _sref(v))
                for k, v in self.root.attrib.items()
            }
        return {}

    def __bool__(self) -> bool:
        return bool(self.get())

    __nonzero__ = __bool__

    def __str__(self) -> str:
        return str(self.get())

    def __repr__(self) -> str:
        data = repr(shorten(str(self.get()), width=40))
        return f"<{type(self).__name__} query={self._expr!r} data={data}>"
