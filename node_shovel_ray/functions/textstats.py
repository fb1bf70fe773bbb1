"""Text-analysis operators for training-data pipelines: language ID
(n-gram/stopword heuristic), quality scoring, token counting, and document
fingerprinting (rolling hash). All vectorized or actor-pooled; none exist in
the reference (its text handling stops at decode, src/decoders/), but they
are first-class here per the 100 TB training-data mandate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# tiny per-language stopword profiles (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "no", "por", "que"},
}

# Explicit ASCII classes so the engine (Arrow/RE2) and the DuckDB oracle
# (also RE2) agree byte-for-byte. Python re's unicode \w counts 'é' as a
# word char while RE2's ASCII \w does not — an explicit class removes the
# ambiguity on non-ASCII text.
_WORD_SPLIT = "[^a-zA-Z]+"
_PUNCT_RE = r"[^A-Za-z0-9_\s]"
_LANG_WORD_SPLIT = "[^a-zA-Zäöüéèêàáíóúñç]+"


def _flat_words(col, split_pattern: str):
    """Column → (flat word values, list offsets). Splitting on the
    complement class == findall of the word class, with empty strings at
    boundaries (filtered by the caller via a nonempty mask)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = pc.fill_null(arr, "")
    words = pc.split_pattern_regex(arr, pattern=split_pattern)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    offsets = np.asarray(words.offsets)
    return words.flatten(), offsets


def _seg_sum(vals: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Per-row sums of a flat per-word array (cumsum-diff: exact for empty
    rows, unlike reduceat)."""
    cs = np.concatenate([[0], np.cumsum(vals)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def token_count(batch: pa.Table, column: str = "text", out: str = "n_tokens") -> pa.Table:
    """Whitespace token count — fully vectorized Arrow kernels."""
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(batch[column]), pattern=r"\s+"
    )
    n = pc.list_value_length(toks)
    empty = pc.equal(pc.utf8_trim_whitespace(batch[column]), "")
    n = pc.if_else(empty, pa.scalar(0, pa.int32()), n)
    return batch.append_column(out, pc.cast(n, pa.int64()))


def bpe_ish_token_count(
    batch: pa.Table, column: str = "text", out: str = "n_bpe_tokens"
) -> pa.Table:
    """BPE-ish token estimate: count word pieces + punctuation via the GPT-2
    pre-tokenizer-style regex (public pattern), vectorized with RE2 counts."""
    # RE2-safe approximation of the GPT-2 pretokenizer split
    pat = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]|\s+"
    toks = pc.extract_regex_span(batch[column], pat) if hasattr(pc, "extract_regex_span") else None
    if toks is None:
        counts = pc.count_substring_regex(batch[column], pattern=pat)
        return batch.append_column(out, pc.cast(counts, pa.int64()))
    return batch.append_column(out, pc.cast(pc.list_value_length(toks), pa.int64()))


def quality_score(batch: pa.Table, column: str = "text") -> pa.Table:
    """Length/punct/stopword-ratio quality heuristics — fully vectorized
    (one regex split, flat-array stopword membership via ``pc.is_in``,
    cumsum-diff per-row sums). A task closure, not an actor pool: there is
    no per-actor state worth a pool's ~2 s spin-up."""
    s = pc.fill_null(
        batch[column].combine_chunks()
        if isinstance(batch[column], pa.ChunkedArray)
        else batch[column],
        "",
    )
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.int64)
    flat, offs = _flat_words(s, _WORD_SPLIT)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    wlens = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    stopset = pa.array(sorted(_STOPWORDS["en"]), pa.string())
    in_stop = pc.is_in(pc.utf8_lower(flat), value_set=stopset).to_numpy(
        zero_copy_only=False
    )
    n_words = _seg_sum(nonempty.astype(np.int64), offs)
    n_stop = _seg_sum((in_stop & nonempty).astype(np.int64), offs)
    wlen_sum = _seg_sum(np.where(nonempty, wlens, 0), offs)
    n_punct = (
        pc.count_substring_regex(s, pattern=_PUNCT_RE)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    punct_ratio = n_punct / np.maximum(n_chars, 1)
    stop_ratio = n_stop / np.maximum(n_words, 1)
    mean_word_len = np.where(n_words > 0, wlen_sum / np.maximum(n_words, 1), 0.0)
    # simple composite: plausible-prose score in [0,1]
    quality = (
        0.4 * (np.clip(stop_ratio, 0, 0.6) / 0.6)
        + 0.3 * (1 - np.clip(punct_ratio, 0, 0.5) / 0.5)
        + 0.3 * ((np.clip(mean_word_len, 2, 8) - 2) / 6)
    )
    return (
        batch.append_column("n_chars_q", pa.array(n_chars, pa.int64()))
        .append_column("n_words", pa.array(n_words, pa.int64()))
        .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
        .append_column("stop_ratio", pa.array(stop_ratio, pa.float64()))
        .append_column("mean_word_len", pa.array(mean_word_len, pa.float64()))
        .append_column("quality", pa.array(quality, pa.float64()))
    )


def lang_id(batch: pa.Table, column: str = "text", out: str = "lang_pred") -> pa.Table:
    """Stopword-profile language ID — vectorized: one split, one ``is_in``
    per language profile, argmax with first-wins tie-break (same order as
    the profile dict, mirrored by the SQL oracle's CASE ladder)."""
    s = (
        batch[column].combine_chunks()
        if isinstance(batch[column], pa.ChunkedArray)
        else batch[column]
    )
    flat, offs = _flat_words(s, _LANG_WORD_SPLIT)
    lower = pc.utf8_lower(flat)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    n_words = _seg_sum(nonempty.astype(np.int64), offs)
    langs = list(_STOPWORDS)
    scores = np.stack(
        [
            _seg_sum(
                (
                    pc.is_in(
                        lower, value_set=pa.array(sorted(_STOPWORDS[lg]), pa.string())
                    ).to_numpy(zero_copy_only=False)
                    & nonempty
                ).astype(np.int64),
                offs,
            )
            for lg in langs
        ],
        axis=1,
    )  # (n_rows, n_langs)
    best = scores.argmax(axis=1)  # first max wins ties, like the scan loop
    pred = np.array(langs, dtype=object)[best]
    pred[(n_words == 0) | (scores.max(axis=1) == 0)] = "unknown"
    return batch.append_column(out, pa.array(pred, pa.string()))


class QualityScore:
    """Back-compat pandas wrapper over :func:`quality_score`."""

    def __init__(self, column: str = "text"):
        self.column = column

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        t = quality_score(pa.Table.from_pandas(b, preserve_index=False), self.column)
        return t.to_pandas()


class LangId:
    """Back-compat pandas wrapper over :func:`lang_id`."""

    def __init__(self, column: str = "text", out: str = "lang_pred"):
        self.column = column
        self.out = out

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        t = lang_id(pa.Table.from_pandas(b, preserve_index=False), self.column, self.out)
        return t.to_pandas()


def normalize_text(
    batch: pa.Table, column: str = "text", out: str = "text_norm"
) -> pa.Table:
    """Canonical text normalization for dedup/curation preprocessing:
    Unicode NFC → lowercase → collapse whitespace runs → trim. Pure Arrow
    kernels, and each step has an exact DuckDB twin
    (nfc_normalize / lower / regexp_replace / trim — parity incl.
    non-ASCII verified empirically), so the query is fully oracle-paired."""
    col = (
        batch[column].combine_chunks()
        if isinstance(batch[column], pa.ChunkedArray)
        else batch[column]
    )
    x = pc.utf8_normalize(col, form="NFC")
    x = pc.utf8_lower(x)
    x = pc.replace_substring_regex(x, pattern=r"\s+", replacement=" ")
    x = pc.utf8_trim_whitespace(x)
    return batch.append_column(out, x)


# PII-ish patterns, RE2-safe and ASCII-explicit so Arrow and DuckDB agree
_PII_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\+?[0-9][0-9()\- ]{7,}[0-9]",  # no '.': keeps IPs out
    "n_ips": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_stats(batch: pa.Table, column: str = "text") -> pa.Table:
    """PII-density signals per document (emails / phone-shaped numbers /
    IPv4-shaped dotted quads) — the scrub-or-drop curation gate. Pure RE2
    count kernels; each pattern has an identical DuckDB twin."""
    s = pc.fill_null(
        batch[column].combine_chunks()
        if isinstance(batch[column], pa.ChunkedArray)
        else batch[column],
        "",
    )
    for out, pat in _PII_PATTERNS.items():
        batch = batch.append_column(
            out, pc.cast(pc.count_substring_regex(s, pattern=pat), pa.int64())
        )
    return batch


def repetition_stats(
    batch: pa.Table, column: str = "text", n: int = 3,
) -> pa.Table:
    """Intra-document repetition signal (the Gopher/C4-style quality rule
    "fraction of duplicate n-grams"): per doc, the count of word n-grams,
    distinct n-grams, and ``dup_ngram_ratio = 1 - distinct/total`` (0.0
    for docs shorter than ``n`` tokens).

    Fully vectorized: ONE hash over every doc's n-grams, one global
    lexsort by (doc, hash), boundary-count per segment — no per-doc set
    ops. SQL twin: list_distinct over the same n-gram lists."""
    import re

    ws_re = re.compile(r"[ \t\n\r\f\v]+")
    texts = batch[column].to_pylist()
    grams: list[str] = []
    offsets = [0]
    for t in texts:
        toks = [x for x in ws_re.split(t or "") if x]
        if len(toks) >= n:
            grams.extend(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))
        offsets.append(len(grams))
    offs = np.asarray(offsets, dtype=np.int64)
    total = (offs[1:] - offs[:-1]).astype(np.int64)
    if grams:
        hs = pd.util.hash_array(np.array(grams, dtype=object))
        seg = np.repeat(np.arange(len(texts), dtype=np.int64), total)
        order = np.lexsort((hs, seg))
        s_seg, s_h = seg[order], hs[order]
        new = np.ones(len(s_seg), dtype=np.int64)
        new[1:] = (s_seg[1:] != s_seg[:-1]) | (s_h[1:] != s_h[:-1])
        cs = np.concatenate([[0], np.cumsum(new)])
        distinct = cs[offs[1:]] - cs[offs[:-1]]
    else:
        distinct = np.zeros(len(texts), dtype=np.int64)
    ratio = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0)
    # round(4) half-away-from-zero, matching the DuckDB oracle
    ratio = np.sign(ratio) * np.floor(np.abs(ratio) * 10_000 + 0.5) / 10_000
    return (
        batch.append_column("n_ngrams", pa.array(total, pa.int64()))
        .append_column("n_distinct_ngrams", pa.array(distinct, pa.int64()))
        .append_column("dup_ngram_ratio", pa.array(ratio, pa.float64()))
    )


def fingerprint_md5(
    batch: pa.Table, column: str = "text", out: str = "fingerprint",
    window: int = 8,
) -> pa.Table:
    """Min-hash document fingerprint over ``window``-token shingles using
    DuckDB-reproducible hashing (``md5_number_lower`` of the
    space-joined shingle — functions/sketches.md5_lower64), so the query
    is fully SQL-oracle-checkable. Documents shorter than ``window``
    tokens hash their whole token list; zero-token documents get NULL
    (matching the SQL's NULL-propagating slice).

    Per-shingle md5 is a Python loop — linear and streaming, but ~10×
    the cycles of :func:`fingerprint`'s vectorized rolling hash; prefer
    ``fingerprint`` where SQL reproducibility is not required."""
    import hashlib
    import re

    ws_re = re.compile(r"[ \t\n\r\f\v]+")  # explicit class: RE2/Python-identical
    out_vals: list[int | None] = []
    for text in batch[column].to_pylist():
        toks = [t for t in ws_re.split(text or "") if t]
        if not toks:
            out_vals.append(None)
            continue
        best = None
        for i in range(max(len(toks) - window + 1, 1)):
            s = " ".join(toks[i : i + window])
            h = int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")
            if best is None or h < best:
                best = h
        out_vals.append(best)
    return batch.append_column(out, pa.array(out_vals, pa.uint64()))


def fingerprint(
    batch: pa.Table, column: str = "text", out: str = "fingerprint",
    window: int = 8,
) -> pa.Table:
    """Winnowing-style document fingerprint: min rolling hash over token
    windows — stable under small edits outside the min window.

    Vectorized MinHasher-style: ONE ``hash_array`` call over every doc's
    tokens; the residual per-doc loop touches only precomputed hash
    segments with numpy slicing (no per-doc string hashing)."""
    texts = batch[column].to_pylist()
    all_toks: list[str] = []
    offsets = [0]
    for t in texts:
        all_toks.extend((t or "").split())
        offsets.append(len(all_toks))
    fps = np.zeros(len(texts), dtype=np.uint64)
    if all_toks:
        hs = pd.util.hash_array(
            np.array(all_toks, dtype=object), hash_key="fingerprintseed!"[:16]
        )
        for i in range(len(texts)):
            a, b = offsets[i], offsets[i + 1]
            if a == b:
                continue
            seg = hs[a:b]
            if len(seg) <= window:
                fps[i] = seg.min()
            else:
                w = np.lib.stride_tricks.sliding_window_view(seg, window)
                fps[i] = np.bitwise_xor.reduce(w, axis=1).min()
    return batch.append_column(out, pa.array(fps, pa.uint64()))
