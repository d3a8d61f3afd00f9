"""Reference-layout compatibility module (``parsel.xpathfuncs`` parity,
/root/reference/parsel/xpathfuncs.py): ``set_xpathfunc`` registers (or,
with ``None``, unregisters) a global XPath extension function;
``setup()`` (re-)installs the built-in ``has-class`` — called on package
import, exposed for parity with the reference's explicit hook."""

from __future__ import annotations

from .htmlpath.xpath import set_xpathfunc

__all__ = ["set_xpathfunc", "setup"]


def setup() -> None:
    """Install built-in extension functions (``has-class``).  The engine
    registers them at import; calling again is a harmless no-op —
    matching the reference where ``setup()`` re-registers has_class
    (xpathfuncs.py:37-38)."""
    # has-class lives in the evaluator's core registry permanently; the
    # user-extension registry is separate, so nothing to (re)do here.
    return None
