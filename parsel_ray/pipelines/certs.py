"""Driver-visible certification kernels: independent pure-Python
reference recomputes for the deterministic per-row operators whose gate
queries previously ran rows-only (no SQL oracle).

Each ``ref_*`` function re-derives one operator's per-row answer through
a DIFFERENT code path from the production kernel (scalar Python ints and
explicit character classes vs vectorized numpy / Arrow RE2 kernels).
The gate queries in :mod:`parsel_ray.pipelines.queries` run the
production kernel AND the reference recompute inside the same
``map_batches`` stage and emit a per-row ``match`` boolean; the DuckDB
ORACLE_SQL asserts ``true`` for every row, so a kernel/plumbing
regression becomes a hard value-hash mismatch in the driver's
correctness gate (the reference's own spec-as-test philosophy,
/root/reference/tests/test_selector.py golden assertions, applied to the
driver gate).

These recomputes are deliberately UNvectorized — they run over the
small gate corpora (500–5000 documents), not on the 100 TB hot path.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

# RE2 character classes, spelled out: RE2's \s is [\t\n\f\r ] (NO \x0b,
# unlike Python's re.ASCII \s) and \b is the ASCII word boundary over
# [0-9A-Za-z_].
_RE2_WS = set("\t\n\f\r ")
_WORD = set("0123456789_abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_PUNCT = set(".!?,;:")
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")

_MASK64 = (1 << 64) - 1


def ref_token_stats(text: str) -> tuple[int, int, int, int]:
    """(n_tokens, n_punct, n_stopwords, n_nonws) — scalar mirror of
    :func:`parsel_ray.functions.text.token_stats` (which counts with
    Arrow RE2 kernels: \\S+ runs, [.!?,;:], \\b-delimited stopwords)."""
    n_tokens = 0
    n_nonws = 0
    prev_ws = True
    for c in text:
        ws = c in _RE2_WS
        if not ws:
            n_nonws += 1
            if prev_ws:
                n_tokens += 1
        prev_ws = ws
    n_punct = sum(1 for c in text if c in _PUNCT)
    # non-overlapping left-to-right scan for \b(?:stop|...)\b — both RE2
    # count_substring_regex and this scan advance past each match
    n_stop = 0
    i, n = 0, len(text)
    while i < n:
        hit = 0
        if text[i].islower() and (i == 0 or text[i - 1] not in _WORD):
            for w in _STOPWORDS:
                j = i + len(w)
                if text.startswith(w, i) and (j >= n or text[j] not in _WORD):
                    hit = j - i
                    break
        if hit:
            n_stop += 1
            i += hit
        else:
            i += 1
    return n_tokens, n_punct, n_stop, n_nonws


def ref_quality(text: str) -> float:
    """Scalar mirror of :func:`parsel_ray.functions.text.quality_score`
    — identical IEEE double expression, different counting path."""
    n_tokens, _, n_stop, _ = ref_token_stats(text)
    denom = float(max(n_tokens, 1))
    stop_ratio = float(n_stop) / denom
    len_term = min(float(n_tokens), 64.0) / 64.0
    stop_term = min(stop_ratio * 4.0, 1.0)
    return len_term * 0.5 + stop_term * 0.5


# -- language ID ----------------------------------------------------------


def _lang_profiles():
    from ..functions.text import _LANG_PROFILES

    return _LANG_PROFILES


def ref_lang_guess(text: str) -> str:
    """Scalar mirror of :class:`parsel_ray.functions.text.LangId`:
    Counter-based trigram scoring (vs the kernel's packed-uint64
    searchsorted/bincount path) with the same CJK head-window rules."""
    from collections import Counter

    profiles = _lang_profiles()
    langs = [l for l, g in profiles.items() if g]
    lowered = text.lower()
    cps = [ord(c) for c in lowered]
    n = len(cps)
    window = min(n, 200)
    head = cps[:200]
    cjk_n = sum(1 for c in head if 0x4E00 <= c <= 0x9FFF)
    kana_n = sum(1 for c in head if 0x3040 <= c <= 0x30FF)
    hangul_n = sum(
        1 for c in head if 0xAC00 <= c <= 0xD7AF or 0x1100 <= c <= 0x11FF
    )
    is_ja = kana_n > window * 0.05 and (kana_n + cjk_n) > window * 0.2
    is_ko = hangul_n > window * 0.2 and not is_ja
    is_zh = cjk_n > window * 0.2 and not is_ja and not is_ko
    grams = Counter(lowered[i : i + 3] for i in range(n - 2))
    best_lang, best_score = "und", 0.0
    for lang in langs:  # profile order; first max wins ties
        prof = profiles[lang]
        score = float(
            sum(grams[g] * (len(prof) - i) for i, g in enumerate(prof))
        )
        if score > best_score:
            best_lang, best_score = lang, score
    out = best_lang if best_score > 0 else "und"
    if is_zh:
        out = "zh"
    if is_ko:
        out = "ko"
    if is_ja:
        out = "ja"
    return out


# -- rolling fingerprint --------------------------------------------------


def ref_rolling_fingerprint(text: str, window: int = 16) -> int:
    """Scalar mirror of
    :func:`parsel_ray.functions.text.rolling_fingerprint` via the
    ROLLING update h' = (h - first*B^(w-1))*B + next (Python ints mod
    2^64) — the kernel instead computes every window hash as a
    vectorized position-weighted sum, so the two agreeing pins both the
    recurrence algebra and the numpy overflow semantics."""
    B = 1000003
    data = text.encode("utf-8")
    n = len(data)
    if n < window:
        h = 0
        for b in data:
            h = (h * B + b) & _MASK64
        return h - (1 << 64) if h >= (1 << 63) else h
    bw = pow(B, window - 1, 1 << 64)
    h = 0
    for b in data[:window]:
        h = (h * B + b) & _MASK64
    best = h
    for i in range(n - window):
        h = ((h - data[i] * bw) * B + data[i + window]) & _MASK64
        if h < best:
            best = h
    return best - (1 << 64) if best >= (1 << 63) else best


def ref_compression_ratio(text: str, level: int = 6) -> "float | None":
    """Mirror of :func:`parsel_ray.functions.text.compression_ratio`."""
    if not text:
        return None
    raw = text.encode("utf-8")
    return len(zlib.compress(raw, level)) / len(raw)


# -- simhash --------------------------------------------------------------


def _fnv1a64(b: bytes) -> int:
    h = 14695981039346656037
    for byte in b:
        h = ((h ^ byte) * 1099511628211) & _MASK64
    return h


def ref_simhash(text: str) -> int:
    """Scalar mirror of :class:`parsel_ray.functions.dedup.SimHasher`:
    per-token scalar FNV-1a (Python ints) + per-bit vote loop, vs the
    kernel's byte-position-vectorized hash and bit-matrix reduction."""
    toks = (text or "").lower().split()
    if not toks:
        return 0
    votes = [0] * 64
    for t in toks:
        h = _fnv1a64(t.encode("utf-8"))
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sim = 0
    for b in range(64):
        if votes[b] > 0:
            sim |= 1 << b
    return sim - (1 << 64) if sim >= (1 << 63) else sim


# -- batch-level match builders ------------------------------------------


def match_column(batch: pa.Table, kernel_col: str, ref_fn,
                 text_col: str = "text") -> pa.Table:
    """(doc_id, match) rows: production-kernel column vs per-row
    reference recompute, exact equality (ints/strings; floats must be
    the identical IEEE expression).  Null text matches a null kernel
    output."""
    got = batch[kernel_col].to_pylist()
    texts = batch[text_col].to_pylist()
    matches = []
    for g, tx in zip(got, texts):
        if tx is None:
            matches.append(g is None)
        else:
            matches.append(g == ref_fn(tx))
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "match": pa.array(matches, pa.bool_()),
        }
    )


def all_true(tbl: pa.Table, col: str = "match") -> bool:
    import pyarrow.compute as pc

    return bool(pc.all(tbl[col]).as_py())


__all__ = [
    "ref_token_stats",
    "ref_quality",
    "ref_lang_guess",
    "ref_rolling_fingerprint",
    "ref_compression_ratio",
    "ref_simhash",
    "match_column",
    "all_true",
]
