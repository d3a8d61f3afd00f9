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

from ._numutil import _ignore_overflow  # noqa: F401 (re-export)



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
    # profiles; Cavnar & Trenkle 1994 n-gram ranking, truncated).  Order
    # matters for tie-breaking: earlier language wins equal scores.
    "en": ["the", "ing", "and", " th", "he ", "ion", " of", "of ", "tio", "ed "],
    "de": ["der", "ein", "ich", "sch", "die", "und", " de", "en ", "ch ", "ung"],
    "fr": ["es ", "de ", " de", "ent", "le ", "que", " le", "la ", " la", "ion"],
    "es": ["de ", " de", "os ", "la ", " la", "el ", " el", "que", " qu", "ión"],
    "it": ["di ", " di", "che", " ch", "la ", " la", "to ", "re ", "del", "ell"],
    "pt": ["de ", " de", "os ", "ão ", "ção", "da ", " da", "em ", " co", "ara"],
    "nl": ["en ", "de ", " de", "van", " va", "een", " ee", "het", " he", "aar"],
    "ru": ["ого", "ени", " на", "ост", "ние", " по", "ть ", " не", "при", "ста"],
    "zh": [],  # CJK handled by codepoint range
}


class LangId:
    """Actor-pool language-ID stage: char-trigram-profile scoring with a
    CJK codepoint fast path.  Fully vectorized: each batch's texts are
    lowered with the Arrow kernel, concatenated into ONE utf-32 codepoint
    array, every trigram is packed EXACTLY into a uint64 (21 bits per
    codepoint), and profile matching is a single ``searchsorted`` against
    the union profile table with per-(doc, lang) ``bincount``
    accumulation — no per-row Python in the scoring path.  The union
    table (one row per distinct trigram, weight column per language) is
    built once per actor."""

    def __init__(self, col: str = "text", out: str = "lang_guess") -> None:
        self.col = col
        self.out = out
        self.langs = [l for l, g in _LANG_PROFILES.items() if g]
        keyed: dict[int, list[tuple[int, int]]] = {}
        for li, lang in enumerate(self.langs):
            grams = _LANG_PROFILES[lang]
            for i, g in enumerate(grams):
                cs = [ord(c) for c in g]
                k = (cs[0] << 42) | (cs[1] << 21) | cs[2]
                keyed.setdefault(k, []).append((li, len(grams) - i))
        self._keys = np.array(sorted(keyed), dtype=np.uint64)
        self._wm = np.zeros((len(self._keys), len(self.langs)), np.float64)
        for j, k in enumerate(self._keys.tolist()):
            for li, w in keyed[k]:
                self._wm[j, li] = w
        self._lang_arr = np.array(self.langs, dtype=object)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.col]
        n = len(col)
        if n == 0:
            return batch.append_column(self.out, pa.array([], pa.string()))
        lowered = pc.utf8_lower(col).to_pylist()
        bufs = [("" if v is None else v).encode("utf-32-le") for v in lowered]
        lens = np.fromiter((len(b) >> 2 for b in bufs), dtype=np.int64, count=n)
        big = np.frombuffer(b"".join(bufs), dtype="<u4").astype(np.uint64)
        starts = np.concatenate(([0], np.cumsum(lens)))
        total = int(starts[-1])
        doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
        pos_in_doc = np.arange(total, dtype=np.int64) - starts[doc_of]

        head = pos_in_doc < 200
        window = np.minimum(lens, 200)
        cjk = (big >= 0x4E00) & (big <= 0x9FFF) & head
        cjk_n = np.bincount(doc_of[cjk], minlength=n)
        # script separation inside the CJK fast path: kana => Japanese,
        # hangul => Korean, else han-dominant => Chinese (vectorized
        # codepoint-range tests, same 200-cp head window)
        kana = (big >= 0x3040) & (big <= 0x30FF) & head
        kana_n = np.bincount(doc_of[kana], minlength=n)
        hangul = ((big >= 0xAC00) & (big <= 0xD7AF) | (big >= 0x1100) & (big <= 0x11FF)) & head
        hangul_n = np.bincount(doc_of[hangul], minlength=n)
        # ja needs BOTH kana presence and CJK-script dominance — a short
        # kana quote inside an English document must not outrank the
        # trigram classifier (kana alone is >5% only in running Japanese)
        is_ja = (kana_n > window * 0.05) & (kana_n + cjk_n > window * 0.2)
        is_ko = (hangul_n > window * 0.2) & ~is_ja
        is_zh = (cjk_n > window * 0.2) & ~is_ja & ~is_ko

        scores = np.zeros((n, len(self.langs)), np.float64)
        if total >= 3:
            m = total - 2
            h = (big[:-2] << np.uint64(42)) | (big[1:-1] << np.uint64(21)) | big[2:]
            valid = pos_in_doc[:m] + 3 <= lens[doc_of[:m]]
            hv = h[valid]
            pos = np.minimum(
                np.searchsorted(self._keys, hv), len(self._keys) - 1
            )
            hit = self._keys[pos] == hv
            docs_w = doc_of[:m][valid][hit]
            uidx = pos[hit]
            for li in range(len(self.langs)):
                scores[:, li] = np.bincount(
                    docs_w, weights=self._wm[uidx, li], minlength=n
                )
        best = np.argmax(scores, axis=1)  # first max wins = profile order
        best_score = scores[np.arange(n), best]
        vals = np.where(best_score > 0, self._lang_arr[best], "und")
        vals = np.where(is_zh, "zh", vals)
        vals = np.where(is_ko, "ko", vals)
        vals = np.where(is_ja, "ja", vals)
        nulls = pc.is_null(col).to_numpy(zero_copy_only=False)
        out = [None if nl else str(v) for nl, v in zip(nulls, vals)]
        return batch.append_column(self.out, pa.array(out, pa.string()))


def term_doc_tf(
    batch: pa.Table, col: str = "text", id_col: str = "doc_id",
    min_len: int = 2,
) -> pa.Table:
    """(doc_id, term, tf) rows for the batch: term = maximal ASCII
    lowercase run (``[a-z]{min_len,}``), tf = occurrences within the doc.

    Inverted-index / tf-idf building block.  Fully vectorized: RE2 split
    into token lists, flatten with ``np.repeat`` doc alignment, distinct
    (term, doc) counting via Arrow ``group_by`` — no Python loop over
    rows or tokens.  Because one document is always one row (never split
    across batches), per-batch counts are exact, and a downstream sum /
    distinct-count over batches is exact too.

    Matches DuckDB ``unnest(regexp_extract_all(text, '[a-z]{2,}'))``:
    splitting on ``[^a-z]+`` yields the same maximal runs, minus the
    short (< min_len) ones, which the length filter drops."""
    text = pc.fill_null(batch[col], "")
    toks = pc.split_pattern_regex(text, "[^a-z]+")
    n = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False), n
    )
    keep = pc.greater_equal(pc.utf8_length(flat), min_len)
    t = pa.table(
        {
            "term": (
                flat.combine_chunks() if isinstance(flat, pa.ChunkedArray)
                else flat
            ),
            id_col: pa.array(doc),
        }
    ).filter(keep)
    out = t.group_by(["term", id_col]).aggregate([([], "count_all")])
    return out.rename_columns(["term", id_col, "tf"])


def term_counts(batch: pa.Table, col: str = "text", min_len: int = 2):
    """EXACT per-batch term totals: (terms ndarray, counts ndarray) for
    maximal ``[a-z]{min_len,}`` runs across the whole batch — the
    per-batch summary a mergeable frequency sketch folds in.  Same RE2
    split + Arrow value_counts path as :func:`term_doc_tf`."""
    toks = pc.split_pattern_regex(pc.fill_null(batch[col], ""), "[^a-z]+")
    flat = pc.list_flatten(toks)
    flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), min_len))
    vc = flat.value_counts()
    if isinstance(vc, pa.ChunkedArray):
        vc = vc.combine_chunks()
    return (
        np.asarray(vc.field("values").to_pylist(), dtype=object),
        vc.field("counts").to_numpy(zero_copy_only=False),
    )


def word_ngram_rows(
    batch: pa.Table,
    n: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 2,
) -> pa.Table:
    """Ordered word n-grams per doc: (doc_id, gram) rows where gram is
    ``n`` consecutive ``[a-z]{min_len,}`` tokens joined by one space —
    the unit of the Lee-et-al-style duplicated-substring coverage metric.
    Fully vectorized: the RE2 split + flatten path of
    :func:`term_doc_tf`, a boolean keep-mask that preserves per-doc token
    order, and one ``binary_join_element_wise`` over ``n`` shifted
    views — no Python loop over tokens."""
    text = pc.fill_null(batch[col], "")
    toks = pc.split_pattern_regex(text, "[^a-z]+")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lens)
    keep = pc.greater_equal(pc.utf8_length(flat), min_len).to_numpy(
        zero_copy_only=False
    )
    flat = flat.filter(pa.array(keep))
    doc = doc[keep]
    total = len(flat)
    empty = pa.table(
        {id_col: pa.array([], batch[id_col].type),
         "gram": pa.array([], pa.string())}
    )
    if total < n:
        return empty
    # a gram starting at i is valid iff token i+n-1 is still the same doc
    valid = doc[: total - n + 1] == doc[n - 1 :]
    if not valid.any():
        return empty
    shifted = [flat.slice(j, total - n + 1) for j in range(n)]
    # join n shifted views: gram[i] = tok[i] + ' ' + ... + tok[i+n-1]
    grams = shifted[0]
    for j in range(1, n):
        grams = pc.binary_join_element_wise(grams, shifted[j], " ")
    mask = pa.array(valid)
    return pa.table(
        {
            id_col: pa.array(doc[: total - n + 1][valid]),
            "gram": grams.filter(mask),
        }
    ).cast(empty.schema)


def ngram_dup_coverage(
    ds,
    n: int = 5,
    col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 16,
):
    """Per-doc duplicated-n-gram coverage: (doc_id, n_grams, n_dup,
    dup_ratio) where an occurrence is duplicated iff its gram text
    appears >1 time in the whole corpus (Lee et al. 2022's repeated-
    substring signal at word-gram granularity).

    Distribution: gram rows are a vectorized map kernel; the global
    gram census is a combiner groupby (one row per distinct gram per
    batch enters the shuffle); dup grams (census > 1) join back against
    a SECOND pass of the gram kernel (recompute beats materializing the
    gram stream at corpus scale); per-doc rollups are combiner groupbys
    joined with typed-null padding.  At 100 TB the gram strings in the
    two shuffles would be 8-byte content hashes instead (collision risk
    2^-64-scale); the gate keeps the strings so the DuckDB oracle is
    exact."""
    from .agg import partial_sum_groupby
    from .relational import hash_bucket_join

    def gram_rows(t: pa.Table) -> pa.Table:
        return word_ngram_rows(t, n=n, col=col, id_col=id_col)

    grams = ds.map_batches(gram_rows, batch_format="pyarrow")
    census = partial_sum_groupby(grams, ["gram"], {}, count_as="__n")
    def only_dups(t: pa.Table) -> pa.Table:
        f = t.filter(pc.greater(t["__n"], 1))
        return pa.table(
            {"gram": f["gram"],
             "__dup": pa.array(np.ones(len(f), np.int8))}
        )

    dup = census.map_batches(only_dups, batch_format="pyarrow")

    grams2 = ds.map_batches(gram_rows, batch_format="pyarrow")
    marked = hash_bucket_join(grams2, dup, on="gram", how="left",
                              buckets=buckets)

    def per_doc_partial(t: pa.Table) -> pa.Table:
        isdup = pc.cast(pc.is_valid(t["__dup"]), pa.int64())
        return pa.table(
            {id_col: t[id_col], "n_grams": pa.array(
                np.ones(len(t), np.int64)), "n_dup": isdup}
        )

    out = partial_sum_groupby(
        marked.map_batches(per_doc_partial, batch_format="pyarrow"),
        [id_col], {"n_grams": "n_grams", "n_dup": "n_dup"},
    )

    def finish(t: pa.Table) -> pa.Table:
        # same IEEE expression as the oracle's n_dup * 1.0 / n_grams
        ratio = pc.divide(
            pc.cast(t["n_dup"], pa.float64()),
            pc.cast(t["n_grams"], pa.float64()),
        )
        return pa.table(
            {
                id_col: t[id_col],
                "n_grams": pc.cast(t["n_grams"], pa.int64()),
                "n_dup": pc.cast(t["n_dup"], pa.int64()),
                "dup_ratio": ratio,
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


# -- BPE tokenizer training ---------------------------------------------------


def _bpe_pair_partials(t: pa.Table) -> pa.Table:
    """Per-batch partial pair counts over (syms: list<string>, cnt):
    adjacent symbol pairs weighted by word count, batch-aggregated so the
    shuffle moves one row per distinct pair per batch.  Vectorized:
    offsets mask word boundaries, weights come from np.repeat."""
    syms = t["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    lens = pc.list_value_length(syms).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(syms)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    total = len(flat)
    empty = pa.table(
        {"left": pa.array([], pa.string()),
         "right": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    if total < 2:
        return empty
    wid = np.repeat(np.arange(len(t)), lens)
    same = wid[:-1] == wid[1:]
    if not same.any():
        return empty
    cnt = np.repeat(
        t["cnt"].to_numpy(zero_copy_only=False), lens
    )[:-1][same]
    mask = pa.array(same)
    part = pa.table(
        {
            "left": flat.slice(0, total - 1).filter(mask),
            "right": flat.slice(1, total - 1).filter(mask),
            "n": pa.array(cnt, pa.int64()),
        }
    )
    out = part.group_by(["left", "right"]).aggregate([("n", "sum")])
    return out.rename_columns(["left", "right", "n"])


def _bpe_apply_merge(t: pa.Table, left: str, right: str) -> pa.Table:
    """Merge every left-to-right non-overlapping (left, right) adjacency
    inside each word's symbol list.  Detection is vectorized; the
    rewrite loops only over the words that actually contain the pair."""
    syms = t["syms"].to_pylist()
    lens = np.array([len(s) for s in syms], np.int64)
    if lens.sum() < 2:
        return t
    flat = np.array([x for s in syms for x in s], object)
    wid = np.repeat(np.arange(len(syms)), lens)
    hit = (flat[:-1] == left) & (flat[1:] == right) & (
        wid[:-1] == wid[1:]
    )
    hit_words = np.unique(wid[:-1][hit])
    if hit_words.size == 0:
        return t
    merged = left + right
    for w in hit_words:
        s = syms[w]
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                out.append(merged)
                i += 2
            else:
                out.append(s[i])
                i += 1
        syms[w] = out
    return pa.table(
        {
            "term": t["term"],
            "cnt": t["cnt"],
            "syms": pa.array(syms, pa.list_(pa.string())),
        }
    )


def bpe_train(
    ds,
    col: str = "text",
    num_merges: int = 30,
    min_len: int = 2,
    min_pair_count: int = 2,
):
    """Distributed BPE tokenizer training (Sennrich 2016's word-count
    formulation): the corpus collapses ONCE into the distinct-word count
    table (a combiner groupby — the classic trick that makes training
    independent of corpus length), then each merge round is one pair-
    count shuffle over the word table plus a map-side rewrite.  The
    driver holds only the argmax pair per round (count DESC, then
    lexicographic (left, right) — fully deterministic) and the merge
    list; the word table stays distributed, re-materialized per round so
    the loop doesn't replay lineage (see the iterative-loop note on
    :func:`parsel_ray.functions.graph.pagerank`).

    Returns a pa.Table (rank, left, right, n) of merges in order."""
    from .agg import partial_sum_groupby

    def word_rows(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.fill_null(t[col], ""), "[^a-z]+")
        flat = pc.list_flatten(toks)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        keep = pc.greater_equal(pc.utf8_length(flat), min_len)
        flat = flat.filter(keep)
        out = pa.table({"term": flat}).group_by("term").aggregate(
            [([], "count_all")]
        )
        return out.rename_columns(["term", "cnt"])

    words = partial_sum_groupby(
        ds.map_batches(word_rows, batch_format="pyarrow"),
        ["term"], {"cnt": "cnt"},
    )

    def to_syms(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        return pa.table(
            {
                "term": t["term"],
                "cnt": pc.cast(t["cnt"], pa.int64()),
                "syms": pa.array(
                    [list(w) for w in terms], pa.list_(pa.string())
                ),
            }
        )

    state = words.map_batches(to_syms, batch_format="pyarrow").materialize()
    n_blocks = max(1, min(16, state.num_blocks()))
    ranks, lefts, rights, counts = [], [], [], []
    for r in range(num_merges):
        pairs = state.map_batches(_bpe_pair_partials, batch_format="pyarrow")
        top = (
            partial_sum_groupby(pairs, ["left", "right"], {"n": "n"})
            .sort(["n", "left", "right"], descending=[True, False, False])
            .limit(1)
            .take_all()
        )
        if not top or int(top[0]["n"]) < min_pair_count:
            break
        l, rt, n = top[0]["left"], top[0]["right"], int(top[0]["n"])
        ranks.append(r)
        lefts.append(l)
        rights.append(rt)
        counts.append(n)
        state = state.map_batches(
            lambda t, _l=l, _r=rt: _bpe_apply_merge(t, _l, _r),
            batch_format="pyarrow",
        ).repartition(n_blocks).materialize()
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "n": pa.array(counts, pa.int64()),
        }
    )


def compression_ratio(
    batch: pa.Table, col: str = "text", out: str = "zlib_ratio",
    level: int = 6,
) -> pa.Table:
    """Append ``out`` = compressed_bytes / raw_bytes (zlib, fixed level)
    — the classic low-information/repetition quality signal for
    pretraining corpora (boilerplate and generated spam compress far
    below prose; the C4/Gopher-family repetition filters approximate the
    same quantity).  Deterministic: zlib at a fixed level is
    byte-stable, so the double is reproducible across workers.  Null or
    empty text → null ratio."""
    import zlib

    vals = []
    for v in batch[col].to_pylist():
        if not v:
            vals.append(None)
            continue
        raw = v.encode("utf-8")
        vals.append(len(zlib.compress(raw, level)) / len(raw))
    return batch.append_column(out, pa.array(vals, pa.float64()))


def repetition_stats(
    batch: pa.Table, col: str = "text", key_col: str = "doc_id",
) -> pa.Table:
    """Per-document word-repetition signals (the Gopher/MassiveText
    repetition-filter family, Rae et al. 2021 §A1.1, restated over
    whitespace tokens): total and distinct word counts plus the most
    frequent word and adjacent bigram with their counts.  Counts are
    exact integers (callers derive the filter fractions), so a SQL
    oracle reproduces them bit-for-bit.  Ties break by (count desc,
    token asc).  Documents with fewer than two words emit no row
    (no bigram exists — mirrors the oracle's inner join).

    Vectorized: pandas split/explode + two groupby counts; the only
    per-row work is the split itself.
    """
    import pandas as pd

    keys = batch[key_col].to_pandas()
    s = pd.Series(batch[col].to_pylist())
    words = s.str.split(" ")

    ex = words.explode()
    exf = pd.DataFrame({"row": ex.index, "w": ex.to_numpy()})

    wc = exf.groupby(["row", "w"], sort=False).size().rename("n") \
        .reset_index()
    agg = wc.groupby("row").agg(
        n_words=("n", "sum"), n_distinct=("n", "size")
    )
    topw = wc.sort_values(
        ["row", "n", "w"], ascending=[True, False, True], kind="mergesort"
    ).drop_duplicates("row").set_index("row")

    nxt = exf["w"].shift(-1)
    same = exf["row"] == exf["row"].shift(-1)
    bgf = pd.DataFrame(
        {
            "row": exf.loc[same, "row"],
            "bg": exf.loc[same, "w"] + " " + nxt[same],
        }
    )
    bc = bgf.groupby(["row", "bg"], sort=False).size().rename("n") \
        .reset_index()
    topb = bc.sort_values(
        ["row", "n", "bg"], ascending=[True, False, True], kind="mergesort"
    ).drop_duplicates("row").set_index("row")

    rows = topb.index.to_numpy()  # docs with >= 1 bigram
    return pa.table(
        {
            key_col: pa.array(keys.iloc[rows].to_numpy()),
            "n_words": pa.array(
                agg.loc[rows, "n_words"].to_numpy(), pa.int64()
            ),
            "n_distinct": pa.array(
                agg.loc[rows, "n_distinct"].to_numpy(), pa.int64()
            ),
            "top_word": pa.array(
                topw.loc[rows, "w"].to_numpy(), pa.string()
            ),
            "top_word_n": pa.array(
                topw.loc[rows, "n"].to_numpy(), pa.int64()
            ),
            "top_bigram": pa.array(
                topb.loc[rows, "bg"].to_numpy(), pa.string()
            ),
            "top_bigram_n": pa.array(
                topb.loc[rows, "n"].to_numpy(), pa.int64()
            ),
        }
    )


def char_bigram_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Per-batch partial char-bigram counts — the combiner stage of the
    distributed LM train (shuffle state is O(distinct bigrams), bounded
    by alphabet², never by corpus size)."""
    from collections import Counter

    c: Counter = Counter()
    for s in batch[col].to_pylist():
        if not s:
            continue
        c.update(zip(s, s[1:]))
    if not c:
        return pa.table(
            {
                "prev": pa.array([], pa.string()),
                "cur": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
            }
        )
    prev, cur = zip(*c.keys())
    return pa.table(
        {
            "prev": pa.array(list(prev), pa.string()),
            "cur": pa.array(list(cur), pa.string()),
            "n": pa.array(list(c.values()), pa.int64()),
        }
    )


def train_char_bigram_lm(ds, col: str = "text", alpha: float = 1.0):
    """Distributed char-bigram LM (the CCNet-style quality-filter model,
    Wenzek et al. 2020 §4.3, with a bigram model standing in for the
    KenLM 5-gram): combiner counts inside ``map_batches``, one small
    groupby over O(alphabet²) rows, Laplace smoothing.  Returns
    ``(bigram_logp, prev_total, vocab)`` dicts sized by the alphabet —
    broadcastable via ``ray.put``."""
    import math

    from .agg import partial_sum_groupby

    counts = partial_sum_groupby(
        ds.map_batches(
            lambda t: char_bigram_counts(t, col), batch_format="pyarrow"
        ),
        ["prev", "cur"],
        {"n": "n"},
    ).take_all()  # O(alphabet²) rows
    prev_tot: dict = {}
    vocab = set()
    for r in counts:
        prev_tot[r["prev"]] = prev_tot.get(r["prev"], 0) + r["n"]
        vocab.add(r["prev"])
        vocab.add(r["cur"])
    v = len(vocab)
    logp = {
        (r["prev"], r["cur"]): math.log(
            (r["n"] + alpha) / (prev_tot[r["prev"]] + alpha * v)
        )
        for r in counts
    }
    return logp, prev_tot, vocab


def perplexity_scores(
    batch: pa.Table, model, col: str = "text", alpha: float = 1.0,
    out: str = "ppl",
) -> pa.Table:
    """Append per-document bits-per-char perplexity under a broadcast
    char-bigram LM (unseen bigrams back off to the Laplace floor).

    Vectorized: the model densifies once per call into a (V+1)² log-prob
    matrix (V = alphabet size; the extra row/col is OOV), each document
    becomes a codepoint array via a utf-32 view, and the bigram log-prob
    sum is one fancy-indexed gather — no per-char Python."""
    import math

    logp, prev_tot, vocab = model
    v = len(vocab)
    chars = np.array(sorted(vocab))
    codes = np.array([ord(c) for c in chars], dtype=np.uint32)
    order = np.argsort(codes)
    codes = codes[order]
    chars = chars[order]
    # floor per previous-char (OOV prev has prev_tot 0)
    floors = np.array(
        [math.log(alpha / (prev_tot.get(c, 0) + alpha * v))
         for c in chars] + [math.log(1.0 / v) if v else 0.0]
    )
    mat = np.tile(floors[:, None], (1, v + 1))
    for (p, c), lp in logp.items():
        pi = np.searchsorted(codes, ord(p))
        ci = np.searchsorted(codes, ord(c))
        mat[pi, ci] = lp

    vals = []
    for s in batch[col].to_pylist():
        if not s or len(s) < 2:
            vals.append(None)
            continue
        cp = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
        idx = np.searchsorted(codes, cp)
        idx_c = np.minimum(idx, v - 1) if v else np.zeros_like(idx)
        ids = np.where(
            (v > 0) & (codes[idx_c] == cp), idx_c, v
        ).astype(np.int64)
        total = float(mat[ids[:-1], ids[1:]].sum())
        vals.append(math.exp(-total / (len(cp) - 1)))
    return batch.append_column(out, pa.array(vals, pa.float64()))
