"""Text analysis for training-data pipelines: token counts, quality
scores, language-ID heuristic. Vectorized (pandas string kernels /
compiled regexes) for map_batches use."""
from __future__ import annotations

import re

import numpy as np
import pandas as pd

__all__ = ["token_count", "quality_columns", "lang_id_batch", "word_ngrams", "TOKEN_RE"]

TOKEN_RE = re.compile(r"[a-z0-9]+")
_WS_RE = re.compile(r"\S+")

# tiny function-word profiles for the lang-id heuristic
_PROFILES = {
    "en": {"the", "a", "of", "and", "to", "in", "is"},
    "es": {"el", "la", "de", "que", "y", "en", "un"},
    "de": {"der", "die", "und", "das", "ist", "ein", "zu"},
    "fr": {"le", "la", "de", "et", "un", "est", "les"},
}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    """Set of word n-grams of the lowercased [a-z0-9]+ token stream
    (the exact-Jaccard dedup unit; shorter texts yield the full token
    tuple as a single gram)."""
    toks = TOKEN_RE.findall(text.lower())
    if not toks:
        return set()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def token_count(texts: pd.Series) -> pd.Series:
    """Count of [a-z0-9]+ tokens in the lowercased text (the BPE-ish
    regex tokenizer's unit count)."""
    return texts.str.lower().str.count(TOKEN_RE).astype("int64")


def quality_columns(texts: pd.Series) -> pd.DataFrame:
    """Deterministic quality-score components (SQL-reproducible):
    n_chars_q = raw length, n_words = whitespace tokens,
    n_periods = '.' count."""
    return pd.DataFrame(
        {
            "n_chars_q": texts.str.len().astype("int64"),
            "n_words": texts.str.count(_WS_RE).astype("int64"),
            "n_periods": texts.str.count(re.escape(".")).astype("int64"),
        }
    )


_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def lang_id_batch(texts: pd.Series) -> pd.Series:
    """Language ID heuristic: CJK-codepoint ratio decides 'zh'; else
    stopword-profile argmax hit-rate; 'und' (undetermined) when nothing
    matches. (On corpora whose text is synthetic pseudo-English, 'en'/
    'und' is the CORRECT answer regardless of any metadata label.)"""
    langs = list(_PROFILES)
    out = []
    for t in texts:
        s = str(t)
        if s and len(_CJK_RE.findall(s)) / max(len(s), 1) > 0.2:
            out.append("zh")
            continue
        words = set(s.lower().split())
        scores = np.array([len(words & _PROFILES[l]) for l in langs])
        out.append(langs[int(scores.argmax())] if scores.max() > 0 else "und")
    return pd.Series(out, index=texts.index, dtype="object")
