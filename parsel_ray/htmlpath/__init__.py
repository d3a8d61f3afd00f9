"""Pure-Python document kernel: DOM, XPath subset, CSS->XPath translation."""

from . import csstranslate, dom, xpath

__all__ = ["dom", "xpath", "csstranslate"]
