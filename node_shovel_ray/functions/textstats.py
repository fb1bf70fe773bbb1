"""Text-analysis operators for training-data pipelines: language ID
(n-gram/stopword heuristic), quality scoring, token counting, and document
fingerprinting (rolling hash). All vectorized or actor-pooled; none exist in
the reference (its text handling stops at decode, src/decoders/), but they
are first-class here per the 100 TB training-data mandate.
"""

from __future__ import annotations

import re

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


class QualityScore:
    """Actor-pool stage: length/punct/stopword-ratio quality heuristics.

    Compiled regexes + stopword sets built once per actor (__init__), scored
    per batch with pandas str kernels — the shovel closure-state idiom as an
    actor pool."""

    def __init__(self, column: str = "text"):
        self.column = column
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        s = b[self.column].fillna("")
        n_chars = s.str.len()
        words = s.str.findall(self.word_re)
        n_words = words.str.len()
        n_punct = s.str.count(self.punct_re)
        stop_ratio = words.map(
            lambda ws: sum(1 for w in ws if w.lower() in self.stop) / max(1, len(ws))
        )
        mean_word_len = words.map(lambda ws: np.mean([len(w) for w in ws]) if ws else 0.0)
        b = b.copy()
        b["n_chars_q"] = n_chars.astype("int64")
        b["n_words"] = n_words.astype("int64")
        b["punct_ratio"] = (n_punct / n_chars.clip(lower=1)).astype("float64")
        b["stop_ratio"] = stop_ratio.astype("float64")
        b["mean_word_len"] = mean_word_len.astype("float64")
        # simple composite: plausible-prose score in [0,1]
        b["quality"] = (
            0.4 * (b["stop_ratio"].clip(0, 0.6) / 0.6)
            + 0.3 * (1 - (b["punct_ratio"].clip(0, 0.5) / 0.5))
            + 0.3 * ((b["mean_word_len"].clip(2, 8) - 2) / 6)
        ).astype("float64")
        return b


class LangId:
    """Actor-pool stage: stopword-profile language ID heuristic."""

    def __init__(self, column: str = "text", out: str = "lang_pred"):
        self.column = column
        self.out = out
        self.word_re = re.compile(r"[a-zA-Zäöüéèêàáíóúñç]+")
        self.profiles = {k: v for k, v in _STOPWORDS.items()}

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        def pred(text: str) -> str:
            ws = [w.lower() for w in self.word_re.findall(text or "")]
            if not ws:
                return "unknown"
            best, best_score = "unknown", 0
            for lang, stop in self.profiles.items():
                score = sum(1 for w in ws if w in stop)
                if score > best_score:
                    best, best_score = lang, score
            return best

        b = b.copy()
        b[self.out] = b[self.column].map(pred)
        return b


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
