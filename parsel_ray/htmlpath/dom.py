"""Pure-Python document object model with lenient HTML and XML parsers.

This is the worker-local parse kernel of the engine: documents (``str`` or
``bytes``) are parsed *inside* ``map_batches`` UDFs, and only extracted
strings ever cross Ray task boundaries (mirrors the no-pickle invariant of
the reference, /root/reference/parsel/selector.py:499-500).

Behavioral targets (pinned by the reference's tests, not by its code):

* lenient HTML parsing with ``<html><body>`` auto-wrapping
  (tests/test_selector.py:658-663), ``\\x00`` stripping (:697-699),
  empty input -> ``<html/>`` (selector.py:100-102)
* XML parsing with ``resolve_entities=False`` semantics: entity
  references are preserved un-expanded (tests/test_selector.py:843-852,
  tests/test_xml_attacks.py) and namespace-expanded ``{uri}local`` tags
* HTML vs XML serialization differences (tests/test_selector.py:304-316)
* depth clipping when ``huge_tree=False`` (tests/test_selector.py:940-1009)

No code is shared with the reference; lxml/libxml2 are unavailable here, so
both parsers are built on the stdlib (``html.parser`` + a hand-rolled XML
scanner).
"""

from __future__ import annotations

import html as _html_mod
import re
import warnings
from html.parser import HTMLParser as _StdHTMLParser
from typing import Any, Iterator

# Sentinel framing for unresolved XML entity references kept un-expanded
# (XXE / billion-laughs defense: we never resolve DTD-defined entities).
_ENT_OPEN = "\x01"
_ENT_RE = re.compile("\x01([^\x01]*)\x01")

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
RAW_TEXT_ELEMENTS = frozenset(("script", "style"))

HEAD_ELEMENTS = frozenset("title base meta link".split())

# Auto-close table: starting tag T closes the currently-open element C when
# T in _CLOSE_ON_NEW[C]  (lenient-HTML recovery, matching the behaviors the
# reference suite pins: p closed by block elements, li by li, etc.)
_BLOCK = frozenset(
    "p div ul ol li table h1 h2 h3 h4 h5 h6 blockquote pre form hr figure "
    "figcaption section article aside header footer nav dl dd dt fieldset "
    "address main details summary".split()
)
_CLOSE_ON_NEW: dict[str, frozenset[str]] = {
    "p": _BLOCK,
    "li": frozenset(("li",)),
    "dd": frozenset(("dd", "dt")),
    "dt": frozenset(("dd", "dt")),
    "tr": frozenset(("tr",)),
    "td": frozenset(("td", "th", "tr")),
    "th": frozenset(("td", "th", "tr")),
    "thead": frozenset(("tbody", "tfoot")),
    "tbody": frozenset(("tbody", "tfoot")),
    "tfoot": frozenset(("tbody",)),
    "option": frozenset(("option", "optgroup")),
    "optgroup": frozenset(("optgroup",)),
    "head": frozenset(("body",)),
}

_MAX_DEPTH_NO_HUGE_TREE = 255


class Document:
    """Owner document; parent of the root element and top-level comments.

    ``doc_type`` ("html"/"xml") and ``id_attrs`` (DTD-declared ID
    attributes, ``{element_qname: {attr_name, ...}}``) drive XPath
    ``id()`` semantics: parsed HTML treats the ``id`` attribute as the
    ID, XML honors only DTD declarations (libxml2's rules)."""

    __slots__ = ("children", "base_url", "doc_type", "id_attrs")

    def __init__(self, base_url: str | None = None,
                 doc_type: str = "html") -> None:
        self.children: list[Any] = []
        self.base_url = base_url
        self.doc_type = doc_type
        self.id_attrs: dict[str, set[str]] | None = None

    @property
    def root(self) -> "Element | None":
        for c in self.children:
            if isinstance(c, Element):
                return c
        return None

    def append(self, child: Any) -> None:
        self.children.append(child)
        child.parent = self


class Comment:
    __slots__ = ("text", "tail", "parent")

    def __init__(self, text: str) -> None:
        self.text = text
        self.tail: str | None = None
        self.parent: Any = None

    def serialize(self, method: str = "html") -> str:
        return f"<!--{self.text}-->"


class EntityRef:
    """Unresolved entity reference kept as a tree NODE — lxml's
    ``resolve_entities=False`` model (reference behavior territory:
    /root/reference/parsel/selector.py:60-79 SafeXMLParser + serialization
    pinned at /root/reference/tests/test_selector.py:843-852): content
    text SPLITS around the entity node (``text()`` yields the pieces
    without the reference), the entity contributes nothing to
    string-value (never expanded — XXE-safe), and serialization restores
    ``&name;`` exactly."""

    def __init__(self, name: str) -> None:
        self.name = name
        self.tail: str | None = None
        self.parent: Any = None

    def serialize(self, method: str = "xml") -> str:
        return f"&{self.name};"


class ProcessingInstruction:
    __slots__ = ("target", "text", "tail", "parent")

    def __init__(self, target: str, text: str) -> None:
        self.target = target
        self.text = text
        self.tail: str | None = None
        self.parent: Any = None

    def serialize(self, method: str = "html") -> str:
        body = f"{self.target} {self.text}" if self.text else self.target
        # libxml2 serialization: XML PIs close with "?>"; HTML PIs are
        # SGML-style and close with a bare ">" (any trailing "?" the HTML
        # tokenizer captured is already part of ``text``)
        return f"<?{body}>" if method == "html" else f"<?{body}?>"


class Element:
    """One element node.

    ``tag`` uses lxml-style universal names: ``local`` or ``{uri}local``.
    ``prefix`` / ``nsmap`` retain the source prefix and the namespace
    declarations made *on this element* (used for serialization and the
    XPath ``namespace::`` axis).
    """

    __slots__ = ("tag", "attrib", "text", "tail", "parent", "children", "prefix", "nsmap")

    def __init__(
        self,
        tag: str,
        attrib: dict[str, str] | None = None,
        prefix: str | None = None,
        nsmap: dict[str | None, str] | None = None,
    ) -> None:
        self.tag = tag
        self.attrib: dict[str, str] = attrib if attrib is not None else {}
        self.text: str | None = None
        self.tail: str | None = None
        self.parent: Any = None
        self.children: list[Any] = []
        self.prefix = prefix
        self.nsmap: dict[str | None, str] = nsmap or {}

    # -- tree ops ---------------------------------------------------------

    def append(self, child: Any) -> None:
        self.children.append(child)
        child.parent = self

    def getparent(self) -> "Element | None":
        p = self.parent
        return p if isinstance(p, Element) else None

    def getroot_document(self) -> Document | None:
        node: Any = self
        while node is not None and not isinstance(node, Document):
            node = node.parent
        return node

    @property
    def base(self) -> str | None:
        doc = self.getroot_document()
        return doc.base_url if doc is not None else None

    _LINK_ATTRS = (
        ("a", "href"), ("link", "href"), ("area", "href"), ("base", "href"),
        ("img", "src"), ("script", "src"), ("iframe", "src"), ("embed", "src"),
        ("source", "src"), ("form", "action"),
    )

    def make_links_absolute(self, base_url: str | None = None) -> None:
        """Resolve link attributes (href/src/action) in this subtree against
        ``base_url`` (default: the document base) — API parity with the
        lxml HtmlElement method the reference exposes via ``Selector.root``
        (tested at reference tests/test_selector.py
        test_make_links_absolute)."""
        from urllib.parse import urljoin

        base = base_url or self.base
        if not base:
            return
        wanted = {t: a for t, a in self._LINK_ATTRS}
        for el in self.iter():
            attr = wanted.get(el.tag)
            if attr and attr in el.attrib:
                el.attrib[attr] = urljoin(base, el.attrib[attr])

    def iter(self, tag: str | None = None) -> Iterator["Element"]:
        if tag in (None, "*") or self.tag == tag:
            yield self
        for c in self.children:
            if isinstance(c, Element):
                yield from c.iter(tag)

    def itertext(self) -> Iterator[str]:
        if self.text:
            yield self.text
        for c in self.children:
            if isinstance(c, Element):
                yield from c.itertext()
            if getattr(c, "tail", None):
                yield c.tail

    def string_value(self) -> str:
        return _strip_entity_refs("".join(self.itertext()))

    def remove_child(self, child: Any, keep_tail: bool) -> None:
        """Remove ``child``; with ``keep_tail`` its tail text is merged into
        the preceding sibling/parent text (the HTML ``drop_tree`` behavior,
        tests/test_selector.py:1204-1209)."""
        idx = self.children.index(child)
        tail = getattr(child, "tail", None)
        if keep_tail and tail:
            if idx > 0:
                prev = self.children[idx - 1]
                prev.tail = (prev.tail or "") + tail
            else:
                self.text = (self.text or "") + tail
        del self.children[idx]
        child.parent = None

    # -- local name helpers -----------------------------------------------

    @property
    def local_name(self) -> str:
        t = self.tag
        return t.split("}", 1)[1] if t.startswith("{") else t

    @property
    def namespace_uri(self) -> str | None:
        t = self.tag
        return t[1:].split("}", 1)[0] if t.startswith("{") else None

    def get(self, key: str, default: str | None = None) -> str | None:
        return self.attrib.get(key, default)

    # -- serialization ----------------------------------------------------

    def serialize(self, method: str = "html") -> str:
        out: list[str] = []
        self._serialize_into(out, method)
        return "".join(out)

    def _serialize_into(self, out: list[str], method: str) -> None:
        name = self._qualified_name()
        out.append("<")
        out.append(name)
        for k, v in self.attrib.items():
            aname = self._attr_name(k)
            if v is None:  # valueless (boolean) attribute from HTML source
                out.append(f" {aname}")
            else:
                out.append(f' {aname}="{escape_attr(v)}"')
        if method == "xml":
            for p, uri in self.nsmap.items():
                decl = "xmlns" if p is None else f"xmlns:{p}"
                if f" {decl}=" not in "".join(out[-len(self.attrib) - 2 :]):
                    out.append(f' {decl}="{escape_attr(uri)}"')
        is_void = method == "html" and self.tag in VOID_ELEMENTS
        if is_void:
            out.append(">")
            return
        if method == "xml" and not self.children and not self.text:
            out.append("/>")
            return
        out.append(">")
        raw = method == "html" and self.tag in RAW_TEXT_ELEMENTS
        if self.text:
            out.append(self.text if raw else escape_text(self.text))
        for c in self.children:
            if isinstance(c, Element):
                c._serialize_into(out, method)
            else:
                out.append(c.serialize(method))
            if getattr(c, "tail", None):
                out.append(escape_text(c.tail))
        out.append(f"</{name}>")

    def _qualified_name(self) -> str:
        local = self.local_name
        return f"{self.prefix}:{local}" if self.prefix else local

    def _attr_name(self, key: str) -> str:
        if key.startswith("{"):
            uri, local = key[1:].split("}", 1)
            if uri == "http://www.w3.org/XML/1998/namespace":
                return f"xml:{local}"
            for p, u in self._nsmap_in_scope().items():
                if u == uri and p is not None:
                    return f"{p}:{local}"
            return local
        return key

    def _nsmap_in_scope(self) -> dict[str | None, str]:
        maps: list[dict[str | None, str]] = []
        node: Any = self
        while isinstance(node, Element):
            maps.append(node.nsmap)
            node = node.parent
        merged: dict[str | None, str] = {}
        for m in reversed(maps):
            merged.update(m)
        return merged

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<Element {self.tag} at {hex(id(self))}>"


def escape_text(s: str) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    if _ENT_OPEN in s:
        s = _ENT_RE.sub(lambda m: f"&{m.group(1).replace('&amp;', '&')};", s)
    return s


def escape_attr(s: str) -> str:
    s = s.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    if _ENT_OPEN in s:
        # restore unresolved-entity sentinels as &name; (same as escape_text)
        s = _ENT_RE.sub(lambda m: f"&{m.group(1).replace('&amp;', '&')};", s)
    return s


def _strip_entity_refs(s: str) -> str:
    """String-value view of text holding unresolved entity sentinels."""
    if _ENT_OPEN in s:
        return _ENT_RE.sub(lambda m: f"&{m.group(1)};", s)
    return s


# ---------------------------------------------------------------------------
# HTML parsing
# ---------------------------------------------------------------------------


class _TreeBuilder(_StdHTMLParser):
    def __init__(self, huge_tree: bool = True) -> None:
        super().__init__(convert_charrefs=True)
        self.doc_children: list[Any] = []
        self.stack: list[Element] = []
        self.huge_tree = huge_tree
        self._overflowed = False

    # -- helpers

    def _append_node(self, node: Any) -> None:
        if self.stack:
            self.stack[-1].append(node)
        else:
            self.doc_children.append(node)

    def _append_text(self, data: str) -> None:
        if not self.stack:
            # top-level text: keep as raw str; the document wrapper re-homes
            # it under <body> (libxml2-style recovery)
            if self.doc_children and isinstance(self.doc_children[-1], str):
                self.doc_children[-1] += data
            else:
                self.doc_children.append(data)
            return
        top = self.stack[-1]
        if top.children:
            last = top.children[-1]
            last.tail = (last.tail or "") + data
        else:
            top.text = (top.text or "") + data

    # -- parser events

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if self._overflowed:
            return
        if not self.huge_tree and len(self.stack) >= _MAX_DEPTH_NO_HUGE_TREE:
            self._overflowed = True
            warnings.warn(
                "Input data is too deep; elements beyond the depth limit were "
                "dropped. Pass huge_tree=True to parse such documents.",
                stacklevel=1,
            )
            return
        while self.stack:
            cur = self.stack[-1].tag
            closers = _CLOSE_ON_NEW.get(cur)
            if closers is not None and tag in closers:
                self.stack.pop()
            else:
                break
        attrib: dict[str, str | None] = {}
        for k, v in attrs:
            if k not in attrib:
                attrib[k] = v
        el = Element(tag, attrib)  # type: ignore[arg-type]
        self._append_node(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # Lenient-HTML rule: "/>" only really self-closes void elements; for
        # any other element it is treated as an open tag.
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        for i in range(len(self.stack) - 1, -1, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # no matching open tag: ignored (recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self._append_text(data)

    def handle_comment(self, data: str) -> None:
        self._append_node(Comment(data))

    def handle_decl(self, decl: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        # libxml2's HTML parser keeps <?...> as a PI node (SGML-style,
        # terminated by the first ">"; html.parser hands us everything
        # between "<?" and ">", including any trailing "?").  The XML
        # declaration is not a PI and is dropped, matching libxml2.
        parts = data.split(None, 1)
        if not parts:
            return
        target = parts[0]
        if target.lower() == "xml":
            return
        self._append_node(
            ProcessingInstruction(target, parts[1] if len(parts) > 1 else "")
        )


_WS_RE = re.compile(r"\S")


def parse_html(
    text: str, base_url: str | None = None, huge_tree: bool = True
) -> Element:
    """Lenient HTML parse -> root ``<html>`` Element.

    Fragments are wrapped into ``<html><body>...`` the way the reference's
    parser does (tests/test_selector.py:658-660); head-only elements go under
    ``<head>``; an element-free document yields bare ``<html/>``.
    """
    builder = _TreeBuilder(huge_tree=huge_tree)
    builder.feed(text)
    builder.close()
    doc = Document(base_url)

    top = builder.doc_children
    root: Element | None = None
    for node in top:
        if isinstance(node, Element) and node.tag == "html":
            root = node
            break
    significant = [
        n for n in top if isinstance(n, Element) or (isinstance(n, str) and _WS_RE.search(n))
    ]
    if root is not None and len(significant) == 1:
        for node in top:
            if not isinstance(node, str):
                doc.append(node)
    else:
        root = Element("html")
        doc.append(root)
        for node in top:
            if isinstance(node, Element) and node.tag == "html":
                for sub in list(node.children):
                    root.append(sub)
                for k, v in node.attrib.items():
                    root.attrib.setdefault(k, v)
            elif isinstance(node, str):
                if root.children:
                    last = root.children[-1]
                    last.tail = (last.tail or "") + node
                else:
                    root.text = (root.text or "") + node
            else:
                root.append(node)

    _ensure_html_structure(root, text)
    return root


def _ensure_html_structure(root: Element, source_text: str) -> None:
    """Distribute <html>'s direct children into <head>/<body> as needed."""
    head = None
    body = None
    for c in root.children:
        if isinstance(c, Element):
            if c.tag == "head" and head is None:
                head = c
            elif c.tag == "body" and body is None:
                body = c
    if head is not None and body is not None:
        return

    new_children: list[Any] = []
    pending_body: list[Any] = []
    pending_head: list[Any] = []
    for c in list(root.children):
        if isinstance(c, Element) and c.tag in ("head", "body"):
            new_children.append(c)
        elif isinstance(c, Element) and c.tag in HEAD_ELEMENTS and body is None and not pending_body:
            pending_head.append(c)
        elif isinstance(c, Comment) and not pending_body and body is None:
            # leading comments hoist to the html level; once body
            # content has started a comment keeps its position inside
            # <body> (lxml: '<p>a</p><!--c--><p>b</p>' keeps the
            # comment between the two <p>)
            new_children.append(c)
        else:
            pending_body.append(c)
    # bare top-level text of the root
    if root.text and _WS_RE.search(root.text):
        p = Element("p")
        p.text = root.text
        pending_body.insert(0, p)
    root.text = None

    if pending_head and head is None:
        head = Element("head")
        for n in pending_head:
            head.append(n)
        new_children.insert(0, head)
    elif pending_head:
        for n in pending_head:
            head.append(n)  # type: ignore[union-attr]
    if pending_body:
        if body is None:
            body = Element("body")
            new_children.append(body)
        first = True
        for n in pending_body:
            tail = getattr(n, "tail", None)
            n.tail = None
            body.append(n)
            if tail:  # whitespace-only tails are real text nodes too
                n.tail = tail
            first = False
    root.children = []
    for c in new_children:
        root.append(c)


# ---------------------------------------------------------------------------
# XML parsing (recovering scanner; entities never resolved)
# ---------------------------------------------------------------------------

_XML_NAME = r"[^\s=<>/\"'&;!?]+"
_XML_TOKEN = re.compile(
    r"<!\[CDATA\[(?P<cdata>.*?)]]>"
    r"|<!--(?P<comment>.*?)-->"
    r"|<!DOCTYPE(?P<doctype>[^\[>]*(\[[^\]]*\])?[^>]*)>"
    r"|<\?(?P<pi>.*?)\?>"
    # the attr block must skip '>' inside quoted values (legal XML 1.0:
    # <a b="x>y"/>) — a bare [^>]*? truncates the tag at that '>'
    rf"|<(?P<open>{_XML_NAME})(?P<attrs>(?:[^>\"']|\"[^\"]*\"|'[^']*')*?)"
    r"(?P<selfclose>/?)>"
    rf"|</(?P<close>{_XML_NAME})\s*>",
    re.DOTALL,
)
_XML_ATTR = re.compile(rf"({_XML_NAME})\s*=\s*(\"([^\"]*)\"|'([^']*)')", re.DOTALL)
_CHARREF = re.compile(r"&(#[0-9]+|#x[0-9a-fA-F]+|[A-Za-z][A-Za-z0-9._-]*);")

_XML_PREDEFINED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}
XML_NS = "http://www.w3.org/XML/1998/namespace"


def _decode_xml_text(s: str, entities: dict[str, str] | None = None,
                     _budget: list | None = None, _depth: int = 0) -> str:
    """Decode char/predefined references.  With ``entities`` (attribute
    context only — libxml2 expands declared internal entities in
    attribute values even with resolve_entities=False), declared
    entities expand recursively under a total-output budget and depth
    cap (billion-laughs guard); undeclared/external entities always stay
    as literal references (XXE-safe)."""
    if entities and _budget is None:
        _budget = [65536]

    def sub(m: re.Match[str]) -> str:
        ref = m.group(1)
        if ref.startswith("#x") or ref.startswith("#X"):
            return chr(int(ref[2:], 16))
        if ref.startswith("#"):
            return chr(int(ref[1:]))
        if ref in _XML_PREDEFINED:
            return _XML_PREDEFINED[ref]
        if entities and ref in entities and _depth < 32:
            val = entities[ref]
            _budget[0] -= len(val)
            if _budget[0] > 0:
                return _decode_xml_text(val, entities, _budget, _depth + 1)
        # Unresolved entity: keep the reference, never expand (XXE-safe).
        return f"{_ENT_OPEN}{ref}{_ENT_OPEN}"

    return _CHARREF.sub(sub, s)


def _parse_dtd(subset: str) -> tuple[dict[str, str], dict[str, set[str]]]:
    """Internal-DTD-subset scan: general INTERNAL entity values (external
    SYSTEM/PUBLIC ids and parameter entities are intentionally ignored —
    resolve_entities=False / no-network semantics) and ATTLIST
    declarations whose type is ID."""
    entities: dict[str, str] = {}
    for m in re.finditer(
        r"<!ENTITY\s+(%?)\s*([\w.:-]+)\s+(?:\"([^\"]*)\"|'([^']*)')\s*>",
        subset,
    ):
        if m.group(1):  # parameter entity
            continue
        name = m.group(2)
        val = m.group(3) if m.group(3) is not None else m.group(4)
        if name not in entities and len(entities) < 64 and len(val) <= 4096:
            entities[name] = val
    id_attrs: dict[str, set[str]] = {}
    for m in re.finditer(r"<!ATTLIST\s+([\w.:-]+)\s+([^>]*)>", subset,
                         re.DOTALL):
        elem, body = m.group(1), m.group(2)
        toks = re.findall(r"\([^)]*\)|\"[^\"]*\"|'[^']*'|\S+", body)
        i = 0
        while i + 1 < len(toks):
            attr, typ = toks[i], toks[i + 1]
            i += 2
            if typ == "NOTATION" and i < len(toks):
                i += 1  # the notation enumeration
            if i < len(toks) and toks[i] == "#FIXED":
                i += 2
            elif i < len(toks) and (
                toks[i].startswith("#") or toks[i][0] in "\"'"
            ):
                i += 1
            if typ == "ID":
                id_attrs.setdefault(elem, set()).add(attr)
    return entities, id_attrs


def parse_xml(text: str, base_url: str | None = None, huge_tree: bool = True) -> Element:
    """Recovering XML parse with namespace expansion and unresolved entities
    preserved as references (resolve_entities=False semantics,
    tests/test_selector.py:843-852)."""
    doc = Document(base_url, doc_type="xml")
    stack: list[Element] = []
    ns_stack: list[dict[str | None, str]] = [{"xml": XML_NS}]
    entities: dict[str, str] = {}
    pos = 0
    n = len(text)

    def append_node(node: Any) -> None:
        if stack:
            stack[-1].append(node)
        else:
            doc.append(node)

    def append_plain(data: str) -> None:
        top = stack[-1]
        if top.children:
            last = top.children[-1]
            last.tail = (last.tail or "") + data
        else:
            top.text = (top.text or "") + data

    def append_text(data: str) -> None:
        if not stack or not data:
            return
        if _ENT_OPEN not in data:
            append_plain(data)
            return
        # unresolved entity references become EntityRef NODES: the text
        # splits around them (lxml resolve_entities=False model) —
        # _ENT_RE.split alternates [text, name, text, name, ..., text]
        parts = _ENT_RE.split(data)
        if parts[0]:
            append_plain(parts[0])
        for i in range(1, len(parts), 2):
            er = EntityRef(parts[i])
            stack[-1].append(er)
            if parts[i + 1]:
                er.tail = parts[i + 1]

    while pos < n:
        lt = text.find("<", pos)
        if lt == -1:
            append_text(_decode_xml_text(text[pos:]))
            break
        if lt > pos:
            append_text(_decode_xml_text(text[pos:lt]))
        m = _XML_TOKEN.match(text, lt)
        if m is None:
            append_text("<")
            pos = lt + 1
            continue
        pos = m.end()
        if m.group("cdata") is not None:
            append_text(m.group("cdata"))
        elif m.group("comment") is not None:
            append_node(Comment(m.group("comment")))
        elif m.group("doctype") is not None:
            sub = re.search(r"\[(.*)\]", m.group("doctype"), re.DOTALL)
            if sub is not None:
                entities, doc.id_attrs = _parse_dtd(sub.group(1))
                doc.id_attrs = doc.id_attrs or None
            continue
        elif m.group("pi") is not None:
            # keep PIs as tree nodes (libxml2 does); the XML declaration
            # <?xml version=...?> is not a PI node and is dropped
            parts = m.group("pi").split(None, 1)
            if parts and parts[0].lower() != "xml":
                append_node(
                    ProcessingInstruction(
                        parts[0], parts[1] if len(parts) > 1 else ""
                    )
                )
            continue
        elif m.group("open") is not None:
            if not huge_tree and len(stack) >= _MAX_DEPTH_NO_HUGE_TREE:
                # libxml2-without-XML_PARSE_HUGE behavior: abort at the
                # depth limit, keep the partial tree (recover=True)
                warnings.warn(
                    "Input data is too deep; elements beyond the depth limit "
                    "were dropped. Pass huge_tree=True to parse such "
                    "documents.",
                    stacklevel=1,
                )
                break
            qname = m.group("open")
            raw_attrs = _XML_ATTR.findall(m.group("attrs") or "")
            decls: dict[str | None, str] = {}
            plain_attrs: list[tuple[str, str]] = []
            for name, _q, v1, v2 in raw_attrs:
                value = _decode_xml_text(v1 if v1 else v2, entities or None)
                if name == "xmlns":
                    decls[None] = value
                elif name.startswith("xmlns:"):
                    decls[name[6:]] = value
                else:
                    plain_attrs.append((name, value))
            scope = dict(ns_stack[-1])
            scope.update(decls)
            prefix, local = (qname.split(":", 1) + [None])[:2] if ":" in qname else (None, qname)
            if local is None:
                prefix, local = None, qname
            uri = scope.get(prefix) if prefix else scope.get(None)
            tag = f"{{{uri}}}{local}" if uri else local
            attrib: dict[str, str] = {}
            for name, value in plain_attrs:
                if ":" in name:
                    ap, al = name.split(":", 1)
                    auri = scope.get(ap)
                    attrib[f"{{{auri}}}{al}" if auri else name] = value
                else:
                    attrib[name] = value
            el = Element(tag, attrib, prefix=prefix, nsmap=decls)
            append_node(el)
            if not m.group("selfclose"):
                stack.append(el)
                ns_stack.append(scope)
        elif m.group("close") is not None:
            qname = m.group("close")
            local = qname.split(":", 1)[1] if ":" in qname else qname
            for i in range(len(stack) - 1, -1, -1):
                if stack[i].local_name == local:
                    del stack[i:]
                    del ns_stack[i + 1 :]
                    break

    root = doc.root
    if root is None:
        root = Element("html")
        doc.append(root)
    return root
