"""Reference-layout compatibility module (``parsel.csstranslator``
parity, /root/reference/parsel/csstranslator.py:126-146): exposes the
``HTMLTranslator`` / ``GenericTranslator`` class surface over this
engine's own CSS→XPath translator (:mod:`parsel_ray.htmlpath.
csstranslate`) so reference imports port unchanged:

    from parsel_ray.csstranslator import HTMLTranslator
    HTMLTranslator().css_to_xpath("p.cls::text")
"""

from __future__ import annotations

from functools import lru_cache

from .htmlpath.csstranslate import Translator, css2xpath

__all__ = ["GenericTranslator", "HTMLTranslator", "css2xpath"]


class HTMLTranslator(Translator):
    """HTML-flavor translator (reference csstranslator.py:135-138):
    element/attribute names lowercased, ``::text``/``::attr()`` pseudo
    elements, per-instance translation cache."""

    def __init__(self, xhtml: bool = False) -> None:
        super().__init__(html=not xhtml)
        self.css_to_xpath = lru_cache(maxsize=256)(super().css_to_xpath)


class GenericTranslator(Translator):
    """XML/generic-flavor translator (reference csstranslator.py:126-132):
    case-preserving names, same pseudo-element support."""

    def __init__(self) -> None:
        super().__init__(html=False)
        self.css_to_xpath = lru_cache(maxsize=256)(super().css_to_xpath)
