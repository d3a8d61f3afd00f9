"""Ray Data stages: ``map_batches``-shaped kernels over zero-copy Arrow.

Every stage here is either a plain function (stateless task) or a callable
class (actor pool; setup in ``__init__`` once per actor, work in
``__call__`` per batch).  Parsed DOM trees never cross a task/actor
boundary — only str/bytes documents and extracted strings do (mirrors the
reference's unpicklable-Selector invariant, selector.py:499-500).
"""

from .extract import SelectorExtract, ExtractSpec, explode_list_column

__all__ = ["SelectorExtract", "ExtractSpec", "explode_list_column"]
