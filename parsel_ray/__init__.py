"""parsel_ray — a Ray-Data-native document extraction & crawl engine.

Two layers:

* the per-document kernel (:mod:`parsel_ray.selector`,
  :mod:`parsel_ray.htmlpath`): API parity with the reference selector
  library (/root/reference/parsel), pure Python, worker-local;
* the distributed layer (:mod:`parsel_ray.stages`, :mod:`parsel_ray.crawl`,
  :mod:`parsel_ray.sources`): Ray Data ``Dataset`` pipelines —
  ``map_batches`` extraction kernels over zero-copy Arrow batches, actor-pool
  crawl frontier state, parquet (Lance-schema) sources/sinks.
"""

from . import xpathfuncs
from .htmlpath.csstranslate import ExpressionError, SelectorSyntaxError, css2xpath
from .htmlpath.xpath import set_xpathfunc
from .selector import (
    CannotDropElementWithoutParent,
    CannotRemoveElementWithoutParent,
    CannotRemoveElementWithoutRoot,
    SafeXMLParser,
    Selector,
    SelectorList,
)

xpathfuncs.setup()  # reference __init__ parity (parsel/__init__.py:20)

__version__ = "0.1.0"

__all__ = [
    "Selector",
    "SelectorList",
    "css2xpath",
    "set_xpathfunc",
    "ExpressionError",
    "SelectorSyntaxError",
    "CannotRemoveElementWithoutRoot",
    "CannotRemoveElementWithoutParent",
    "CannotDropElementWithoutParent",
    "__version__",
]
