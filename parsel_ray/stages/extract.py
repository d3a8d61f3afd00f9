"""Distributed selector extraction: the reference's per-document
``Selector.css/xpath/jmespath/re`` queries re-expressed as a vectorized
``map_batches`` stage over Arrow batches.

Reference semantics: /root/reference/parsel/selector.py:562-728 (query +
terminal operators).  The engine inverts the data model — one
``ray.data.Dataset`` holds a table of documents; one ``SelectorExtract``
actor applies N compiled queries to each row of each Arrow batch and emits
``list<string>`` / ``string`` columns.

Design notes (scale):

* queries are compiled ONCE per actor in ``__init__`` (CSS→XPath
  translation + XPath AST compile; mirrors the reference's per-process LRU,
  csstranslator.py:130-138) — pass the class to ``map_batches(...,
  concurrency=N)``;
* the per-document parse is unavoidable CPU work (that's the operator);
  everything around it is Arrow-native: input columns are read via
  zero-copy buffers, outputs are built as ``pyarrow`` arrays directly;
* a document is parsed ONCE per row even when many specs run against it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable, Sequence

import pyarrow as pa

from ..selector import Selector

_TERMINALS = ("getall", "get", "re", "re_first", "attrib", "count")
_LANGS = ("css", "xpath", "jmespath", "re")


@dataclass(frozen=True)
class ExtractSpec:
    """One query to run per document.

    ``out``     output column name.
    ``lang``    "css" | "xpath" | "jmespath" | "re".
    ``query``   the selector expression (for lang="re": the regex itself).
    ``terminal``  "getall" -> list<string>, "get"/"re_first" -> string
                (null when no match), "re" -> list<string> (needs
                ``pattern``), "attrib" -> map-as-struct json string,
                "count" -> int64 number of matches.
    ``pattern``  regex applied after the query for terminal="re"/"re_first"
                (SelectorList.re semantics, selector.py:196-247).
    """

    out: str
    lang: str
    query: str
    terminal: str = "getall"
    pattern: str | None = None

    def __post_init__(self) -> None:
        if self.lang not in _LANGS:
            raise ValueError(f"lang must be one of {_LANGS}, got {self.lang!r}")
        if self.terminal not in _TERMINALS:
            raise ValueError(
                f"terminal must be one of {_TERMINALS}, got {self.terminal!r}"
            )
        # fail fast at spec construction, not per-batch inside the actor
        # pool: a missing pattern or a lang/terminal mismatch would
        # otherwise sink every block at runtime
        if (
            self.terminal in ("re", "re_first")
            and self.lang != "re"
            and self.pattern is None
        ):
            raise ValueError(
                f"terminal={self.terminal!r} requires pattern= "
                f"(SelectorList.re semantics) when lang={self.lang!r}"
            )
        if self.lang == "re" and self.terminal == "attrib":
            raise ValueError(
                "terminal='attrib' needs a node-producing lang "
                "(css/xpath/jmespath); lang='re' yields string matches"
            )


def _run_spec(sel: Selector, spec: ExtractSpec) -> Any:
    """Apply one compiled spec to one parsed document."""
    if spec.lang == "re":
        matches = sel.re(spec.query)
        if spec.terminal in ("get", "re_first"):
            return matches[0] if matches else None
        if spec.terminal == "count":
            return len(matches)
        return matches
    if spec.lang == "css":
        sl = sel.css(spec.query)
    elif spec.lang == "xpath":
        sl = sel.xpath(spec.query)
    else:
        sl = sel.jmespath(spec.query)

    t = spec.terminal
    if t == "getall":
        return sl.getall()
    if t == "get":
        return sl.get()
    if t == "re":
        return sl.re(spec.pattern)
    if t == "re_first":
        return sl.re_first(spec.pattern)
    if t == "count":
        return len(sl)
    if t == "attrib":
        import json

        # ensure_ascii=False keeps raw UTF-8, matching DuckDB to_json so
        # the oracle contract holds for arbitrary attribute values
        return json.dumps(sl.attrib, sort_keys=True, ensure_ascii=False)
    raise AssertionError(spec.terminal)


class SelectorExtract:
    """Actor-pool ``map_batches`` stage: parse each document once, run all
    specs, append one output column per spec.

    Usage::

        ds.map_batches(
            SelectorExtract.bound(
                specs=[ExtractSpec("img_srcs", "css", "img::attr(src)")],
                input_col="body", doc_type="html",
            ),
            batch_format="pyarrow", concurrency=8, batch_size=256,
        )

    (``fn_constructor_kwargs=dict(...)`` with the bare class is
    equivalent; ``bound`` just keeps configuration at the class.)

    Input column may be ``string`` (→ ``Selector(text=...)``) or
    ``binary`` (→ ``Selector(body=..., encoding=encoding_col or "utf-8")``),
    matching the reference's dual text/bytes entry points
    (selector.py:431-497; the bytes path is the one its ``TestSelectorBytes``
    re-runs the whole suite through, tests/test_selector.py:1219-1266).
    """

    def __init__(
        self,
        specs: Sequence[ExtractSpec | tuple],
        input_col: str = "text",
        doc_type: str | None = "html",
        encoding_col: str | None = None,
        base_url_col: str | None = None,
        keep_input: bool = False,
        xpath_funcs: "dict[str, Any] | None" = None,
        namespaces: "dict[str, str] | None" = None,
    ) -> None:
        """``xpath_funcs``: the user-extension surface (reference
        ``set_xpathfunc``, xpathfuncs.py:16-34) lifted to the distributed
        layer — a dict of {name: callable} registered in EVERY worker
        process before queries run (the callables must be picklable, e.g.
        module-level functions)."""
        self.specs = [
            s if isinstance(s, ExtractSpec) else ExtractSpec(*s) for s in specs
        ]
        self.input_col = input_col
        self.doc_type = doc_type
        self.encoding_col = encoding_col
        self.base_url_col = base_url_col
        self.keep_input = keep_input
        self.xpath_funcs = dict(xpath_funcs or {})
        # prefix -> uri map applied to every per-document Selector (the
        # reference's register_namespace lifted to the distributed layer)
        self.namespaces = dict(namespaces or {})
        self._register_and_warm()

    @classmethod
    def bound(cls, **kwargs) -> type:
        """Zero-arg subclass with ``kwargs`` captured by value — pass THIS
        as the ``map_batches`` class instead of threading
        ``fn_constructor_kwargs`` through the call site.  (NOTE: Ray Data
        still ships the fused UDF through the object store itself, so the
        ray#53727 actor-restart caveat log is Ray-internal and appears for
        every actor-pool stage either way.)"""
        class _Bound(cls):  # type: ignore[misc, valid-type]
            def __init__(self) -> None:
                super().__init__(**kwargs)

        _Bound.__name__ = cls.__name__
        _Bound.__qualname__ = cls.__qualname__
        return _Bound

    def _register_and_warm(self) -> None:
        # Runs in __init__ (driver / actor) AND on unpickle (each task
        # worker): register extension functions, then warm the
        # query-compilation caches once per process.
        from ..htmlpath import csstranslate
        from ..htmlpath.xpath import compile_xpath, set_xpathfunc

        for name, fn in self.xpath_funcs.items():
            set_xpathfunc(name, fn)
        for s in self.specs:
            if s.lang == "xpath":
                compile_xpath(s.query)
            elif s.lang == "css":
                compile_xpath(
                    csstranslate.css2xpath_xml(s.query)
                    if self.doc_type == "xml"
                    else csstranslate.css2xpath_html(s.query)
                )

    def __getstate__(self):
        return {
            "specs": self.specs,
            "input_col": self.input_col,
            "doc_type": self.doc_type,
            "encoding_col": self.encoding_col,
            "base_url_col": self.base_url_col,
            "keep_input": self.keep_input,
            "xpath_funcs": self.xpath_funcs,
            "namespaces": self.namespaces,
        }

    def __setstate__(self, st):
        st.setdefault("namespaces", {})
        self.__dict__.update(st)
        self._register_and_warm()

    def _make_selector(self, value: Any, encoding: str, base_url: str | None) -> Selector:
        if isinstance(value, (bytes, bytearray)):
            return Selector(
                body=bytes(value),
                encoding=encoding or "utf-8",
                type=self.doc_type,
                base_url=base_url,
                namespaces=self.namespaces or None,
            )
        return Selector(text=value, type=self.doc_type, base_url=base_url,
                        namespaces=self.namespaces or None)

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch[self.input_col].to_pylist()
        encodings = (
            batch[self.encoding_col].to_pylist()
            if self.encoding_col and self.encoding_col in batch.column_names
            else None
        )
        base_urls = (
            batch[self.base_url_col].to_pylist()
            if self.base_url_col and self.base_url_col in batch.column_names
            else None
        )
        n = len(docs)
        outs: list[list[Any]] = [[] for _ in self.specs]
        for i in range(n):
            doc = docs[i]
            if doc is None:
                for col in outs:
                    col.append(None)
                continue
            sel = self._make_selector(
                doc,
                encodings[i] if encodings else "utf-8",
                base_urls[i] if base_urls else None,
            )
            for j, spec in enumerate(self.specs):
                outs[j].append(_run_spec(sel, spec))

        result = batch if self.keep_input else batch.drop_columns([self.input_col])
        for spec, col in zip(self.specs, outs):
            result = result.append_column(spec.out, _to_arrow(spec, col))
        return result


def _to_arrow(spec: ExtractSpec, values: list[Any]) -> pa.Array:
    if spec.terminal == "count":
        return pa.array(values, type=pa.int64())
    if spec.terminal in ("get", "re_first", "attrib"):
        # JSON selectors may return non-str values from get(); stringify
        # for a stable schema (reference returns raw JSON values,
        # selector.py:706-707 — the engine pins a string column schema).
        return pa.array(
            [None if v is None else _as_str(v) for v in values], type=pa.string()
        )
    return pa.array(
        [None if v is None else [_as_str(x) for x in v] for v in values],
        type=pa.list_(pa.string()),
    )


def _as_str(v: Any) -> str:
    if isinstance(v, str):
        return v
    import json

    return json.dumps(v, sort_keys=True)


def explode_list_column(
    batch: pa.Table, list_col: str, out_col: str | None = None
) -> pa.Table:
    """Flatten one ``list<string>`` column: one output row per list element,
    all other columns repeated (the ``SelectorList`` fan-out of
    selector.py:147-194 lifted to table shape; use inside ``map_batches``)."""
    out_col = out_col or list_col
    col = batch[list_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # zero-chunk tables
        col = pa.concat_arrays(col.chunks) if col.chunks else pa.array([], pa.list_(pa.string()))
    import numpy as np

    lengths = col.value_lengths().fill_null(0).to_numpy(zero_copy_only=False)
    indices = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    flat = col.flatten()
    taken = batch.drop_columns([list_col]).take(pa.array(indices))
    return taken.append_column(out_col, flat)


def xpath_tag_count(ctx, *args):
    """Example user-extension XPath function: count descendants of the
    context node with the given tag (string arg; default "a").  Register
    via ``SelectorExtract(..., xpath_funcs={"tag-count": xpath_tag_count})``.
    Extension callables must live in an importable module so task workers
    can unpickle them by reference (reference contract: xpathfuncs.py:16-34)."""
    tag = args[0] if args and isinstance(args[0], str) else "a"
    node = ctx.context_node
    it = node.iter()
    next(it, None)  # iter() yields the node itself; descendants only
    return float(sum(1 for el in it if el.tag == tag))


class QuarantineMap:
    """Dead-letter routing for per-row kernels: apply ``fn`` (row dict →
    row dict) to every row; rows whose ``fn`` raises are NOT retried and
    do NOT fail the batch — they stream to a quarantine parquet sink
    (worker-side shards, same retry-stable naming as the data sinks)
    carrying the error type/message, and the clean rows continue.

    This is the ingest-pipeline contract Ray's ``max_errored_blocks``
    cannot give: that knob drops whole BLOCKS and loses the rows; this
    stage keeps per-row provenance of every failure.  Vectorized kernels
    should catch their own errors; QuarantineMap is for genuinely
    row-shaped logic (parsers, codecs) where one poison row must not
    sink a 10^5-row block."""

    def __init__(self, fn, quarantine_dir: str, id_col: str,
                 out_schema=None) -> None:
        import os

        self.fn = fn
        self.dir = quarantine_dir
        self.id_col = id_col
        # out_schema pins the clean-row schema so a block where EVERY
        # row fails still emits a schema-consistent empty table (fn may
        # change the schema, so the input schema is not a safe fallback)
        self.out_schema = out_schema
        os.makedirs(quarantine_dir, exist_ok=True)

    def __call__(self, t: "pa.Table") -> "pa.Table":
        import os

        import pyarrow as pa

        from ..sources.partitioned import _content_name

        good, bad = [], []
        for row in t.to_pylist():
            try:
                good.append(self.fn(dict(row)))
            except Exception as e:  # noqa: BLE001 — the whole point
                bad.append(
                    {
                        self.id_col: row[self.id_col],
                        "error_type": type(e).__name__,
                        "error": str(e)[:500],
                    }
                )
        if bad:
            # pin the shard schema: from_pylist inference would type the
            # id column per-shard (a shard of all-null ids infers `null`),
            # making the quarantine dir unreadable as one dataset
            bad_schema = pa.schema(
                [
                    (self.id_col, t.schema.field(self.id_col).type),
                    ("error_type", pa.string()),
                    ("error", pa.string()),
                ]
            )
            bt = pa.Table.from_pylist(bad, schema=bad_schema)
            name = _content_name(bt)
            path = os.path.join(self.dir, name)
            import pyarrow.parquet as pq

            pq.write_table(bt, path + ".tmp")
            os.replace(path + ".tmp", path)
        if good:
            return pa.Table.from_pylist(good, schema=self.out_schema)
        if self.out_schema is not None:
            return pa.Table.from_pylist([], schema=self.out_schema)
        # no schema pinned and no survivors: an empty slice of the input
        # (only safe when fn is schema-preserving — document at call
        # sites or pass out_schema)
        return t.slice(0, 0)
