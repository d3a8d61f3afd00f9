"""Text-analysis kernels: token counting, quality scoring, fingerprinting,
language ID.  All operate on a string column of an Arrow batch and append
typed columns; regex kernels use RE2 via ``pyarrow.compute`` so the DuckDB
oracle (also RE2) computes byte-identical answers.

These are first-class engine operators for training-data pipelines (no
reference equivalent; the reference's regex machinery is
/root/reference/parsel/utils.py:68-94, which :mod:`parsel_ray.utils`
already mirrors).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

def _ignore_overflow(fn):
    """uint64 wraparound is intentional in these hash kernels."""
    import functools

    @functools.wraps(fn)
    def wrapper(*a, **k):
        with np.errstate(over="ignore"):
            return fn(*a, **k)

    return wrapper



TOKEN_RE = r"\S+"
PUNCT_RE = r"[.!?,;:]"
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")
STOPWORD_RE = r"\b(?:" + "|".join(STOPWORDS) + r")\b"


def token_stats(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append ``n_tokens``, ``n_punct``, ``n_stopwords``, ``stop_ratio``,
    ``avg_token_len`` — all via RE2 count kernels (vectorized; no Python
    per-row loop)."""
    s = batch[col]
    n_tokens = pc.cast(pc.count_substring_regex(s, TOKEN_RE), pa.int64())
    n_punct = pc.cast(pc.count_substring_regex(s, PUNCT_RE), pa.int64())
    n_stop = pc.cast(pc.count_substring_regex(s, STOPWORD_RE), pa.int64())
    # total non-whitespace chars / token count
    n_nonws = pc.cast(pc.count_substring_regex(s, r"\S"), pa.int64())
    denom = pc.max_element_wise(n_tokens, pa.scalar(1, pa.int64()))
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom, pa.float64()))
    avg_len = pc.divide(pc.cast(n_nonws, pa.float64()), pc.cast(denom, pa.float64()))
    return (
        batch.append_column("n_tokens", n_tokens)
        .append_column("n_punct", n_punct)
        .append_column("n_stopwords", n_stop)
        .append_column("stop_ratio", stop_ratio)
        .append_column("avg_token_len", avg_len)
    )


def quality_score(batch: pa.Table, col: str = "text") -> pa.Table:
    """Append a ``quality`` double in [0,1]: a deterministic blend of
    length, stopword and punctuation signals (heuristic quality filter for
    pretraining corpora — Gopher/C4-style rules, simplified)."""
    # reuse token-stat columns when the caller already appended them
    # (composing with token_stats must not duplicate fields)
    t = batch if "n_tokens" in batch.column_names else token_stats(batch, col)
    n_tokens = pc.cast(t["n_tokens"], pa.float64())
    stop_ratio = t["stop_ratio"]
    # length term: min(n_tokens, 64) / 64
    len_term = pc.divide(pc.min_element_wise(n_tokens, pa.scalar(64.0)), pa.scalar(64.0))
    # stopword term: min(stop_ratio * 4, 1)
    stop_term = pc.min_element_wise(pc.multiply(stop_ratio, pa.scalar(4.0)), pa.scalar(1.0))
    q = pc.add(pc.multiply(len_term, pa.scalar(0.5)), pc.multiply(stop_term, pa.scalar(0.5)))
    return batch.append_column("quality", q)


def _normalize_for_fingerprint(text: str) -> str:
    return re.sub(r"\s+", " ", text.strip()).lower()


def fingerprint(batch: pa.Table, col: str = "text", out: str = "fingerprint") -> pa.Table:
    """Append an md5-hex fingerprint of the whitespace-normalized,
    lower-cased text.  Matches DuckDB
    ``md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))`` exactly."""
    # Normalize vectorized (RE2), then md5 per row (C speed via hashlib).
    norm = pc.utf8_lower(
        pc.replace_substring_regex(pc.utf8_trim_whitespace(batch[col]), r"\s+", " ")
    )
    vals = [
        None if v is None else hashlib.md5(v.encode("utf-8")).hexdigest()
        for v in norm.to_pylist()
    ]
    return batch.append_column(out, pa.array(vals, pa.string()))


@_ignore_overflow
def rolling_fingerprint(
    batch: pa.Table, col: str = "text", out: str = "rhash", window: int = 16
) -> pa.Table:
    """64-bit Rabin-Karp-style rolling-hash document fingerprint: the
    minimum rolling hash over all ``window``-byte windows (a content-defined
    chunk anchor usable for shift-robust dedup).  Vectorized with numpy."""
    B = np.uint64(1000003)
    res: list[int | None] = []
    for v in batch[col].to_pylist():
        if v is None:
            res.append(None)
            continue
        data = np.frombuffer(v.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        n = len(data)
        if n < window:
            h = np.uint64(0)
            for b in data:
                h = np.uint64(h * B + b)
            res.append(int(h.astype(np.int64)))
            continue
        # window hash = Σ_j d[i+j]·B^(w-1-j): w shifted multiply-adds,
        # each vectorized over all windows (no per-byte Python loop)
        m = n - window + 1
        h = np.zeros(m, dtype=np.uint64)
        pw = np.uint64(1)
        for j in range(window - 1, -1, -1):
            h += data[j : j + m] * pw
            pw = np.uint64(pw * B)
        res.append(int(h.min().astype(np.int64)))
    return batch.append_column(out, pa.array(res, pa.int64()))


# -- language ID (n-gram heuristic) ---------------------------------------

_LANG_PROFILES = {
    # top character trigrams per language (hand-built public-knowledge
    # profiles; Cavnar & Trenkle 1994 n-gram ranking, truncated)
    "en": ["the", "ing", "and", " th", "he ", "ion", " of", "of ", "tio", "ed "],
    "de": ["der", "ein", "ich", "sch", "die", "und", " de", "en ", "ch ", "ung"],
    "fr": ["es ", "de ", " de", "ent", "le ", "que", " le", "la ", " la", "ion"],
    "es": ["de ", " de", "os ", "la ", " la", "el ", " el", "que", " qu", "ión"],
    "zh": [],  # CJK handled by codepoint range
}


class LangId:
    """Actor-pool language-ID stage: trigram-profile scoring with a CJK
    codepoint fast path.  Profiles are built once per actor."""

    def __init__(self, col: str = "text", out: str = "lang_guess") -> None:
        self.col = col
        self.out = out
        self.profiles = {
            lang: {g: len(grams) - i for i, g in enumerate(grams)}
            for lang, grams in _LANG_PROFILES.items()
            if grams
        }

    def _guess(self, text: str) -> str:
        if not text:
            return "und"
        cjk = sum(1 for ch in text[:200] if "一" <= ch <= "鿿")
        if cjk > len(text[:200]) * 0.2:
            return "zh"
        t = text.lower()
        grams = [t[i : i + 3] for i in range(len(t) - 2)]
        best_lang, best_score = "und", 0
        for lang, prof in self.profiles.items():
            score = sum(prof.get(g, 0) for g in grams)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = [None if v is None else self._guess(v) for v in batch[self.col].to_pylist()]
        return batch.append_column(self.out, pa.array(vals, pa.string()))
