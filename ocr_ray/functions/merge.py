"""Chunk-result merge: reading order + boundary-overlap dedup.

Re-implements the reference ResultMerger (app/ocr/splitting/merger.py)
as pure functions shared by the Ray extraction stage and the oracle:

- reading order: LTR sorts (row, col), RTL sorts (row, -col)
  (merger.py:119-147)
- sequential merge: chunks adjacent in the grid (row/col differ by
  exactly 1) get overlap dedup, others join with the separator
  (merger.py:149-197)
- exact dedup: longest suffix(prev[-500:]) == prefix(cur[:500]) of
  length >= min_overlap_chars (merger.py:286-306)
- fuzzy dedup: word windows up to 10 words, SequenceMatcher ratio >=
  0.95 AND >= 80% exact word matches (merger.py:308-355)
- Arabic normalization: strip tashkeel diacritics before comparison,
  map match positions back to the raw strings (merger.py:16-39,199-272)
"""
from __future__ import annotations

from difflib import SequenceMatcher

from ..config import MergeConfig

__all__ = ["strip_diacritics", "find_exact_overlap", "find_fuzzy_overlap", "merge_chunk_texts"]

# The 22 tashkeel / Quranic annotation marks the reference strips
# (merger.py:16-39): U+064B..U+065F plus U+0670
_TASHKEEL = {chr(cp) for cp in range(0x064B, 0x0660)} | {"ٰ"}


def strip_diacritics(text: str) -> tuple[str, list[int]]:
    """T2 — remove tashkeel marks; returns (stripped, index_map) where
    index_map[i] is the position in the ORIGINAL string of stripped
    char i (the position mapping merger.py:248-272 needs)."""
    chars: list[str] = []
    idx_map: list[int] = []
    for i, ch in enumerate(text):
        if ch not in _TASHKEEL:
            chars.append(ch)
            idx_map.append(i)
    return "".join(chars), idx_map


def find_exact_overlap(prev: str, cur: str, cfg: MergeConfig) -> int:
    """T3 — length of the longest exact suffix-of-prev == prefix-of-cur
    overlap (>= min_overlap_chars), measured in CURRENT-string chars.
    Windows capped at 500 chars like merger.py:235-236."""
    prev_n, _ = strip_diacritics(prev[-500:])
    cur_n, cur_map = strip_diacritics(cur[:500])
    best = 0
    max_len = min(len(prev_n), len(cur_n))
    for k in range(max_len, cfg.min_overlap_chars - 1, -1):
        if prev_n.endswith(cur_n[:k]):
            best = k
            break
    if best == 0:
        return 0
    # map normalized overlap length back to raw `cur` position
    return cur_map[best - 1] + 1 if best <= len(cur_map) else len(cur)


def find_fuzzy_overlap(prev: str, cur: str, cfg: MergeConfig) -> int:
    """T4 — fuzzy boundary match: compare trailing/leading word windows
    (<= fuzzy_window_words); accept when SequenceMatcher ratio >=
    similarity_threshold AND >= 80% of words match exactly. Returns the
    char length of the duplicated prefix of `cur` (0 = none)."""
    prev_n, _ = strip_diacritics(prev)
    cur_n, cur_map = strip_diacritics(cur)
    prev_words = prev_n.split()
    cur_words = cur_n.split()
    if not prev_words or not cur_words:
        return 0
    max_w = min(cfg.fuzzy_window_words, len(prev_words), len(cur_words))
    for k in range(max_w, 0, -1):
        tail = prev_words[-k:]
        head = cur_words[:k]
        ratio = SequenceMatcher(None, " ".join(tail), " ".join(head)).ratio()
        if ratio < cfg.similarity_threshold:
            continue
        exact = sum(a == b for a, b in zip(tail, head))
        if exact / k < 0.8:
            continue
        # duplicated region = first k words of cur (normalized); map the
        # end of word k back to a raw-cur char position
        joined = " ".join(head)
        end_n = len(joined)
        end = cur_map[end_n - 1] + 1 if end_n <= len(cur_map) else len(cur)
        # swallow following whitespace
        while end < len(cur) and cur[end].isspace():
            end += 1
        return end
    return 0


def _adjacent(a: dict, b: dict) -> bool:
    """merger.py:190-197: grid neighbors differ by exactly 1 in row xor col."""
    dr = abs(a["row"] - b["row"])
    dc = abs(a["col"] - b["col"])
    return (dr == 1 and dc == 0) or (dr == 0 and dc == 1)


def merge_chunk_texts(chunks: list[dict], cfg: MergeConfig) -> str:
    """G1+G2 — merge per-chunk texts into page text in reading order.

    ``chunks``: dicts with at least {row, col, text}; overlap keys
    optional. Overlap dedup only runs between *adjacent* chunks that
    were cut WITH overlap (overlap_* > 0 on the shared edge) — exact
    projection cuts never duplicate content, so their boundaries join
    directly (reference behavior: grid chunks carry overlaps,
    projection chunks don't; merger.py:149-188)."""
    if not chunks:
        return ""
    ordered = sorted(
        chunks, key=lambda c: (c["row"], -c["col"] if cfg.rtl else c["col"])
    )
    out = ordered[0]["text"]
    for prev_meta, meta in zip(ordered, ordered[1:]):
        text = meta["text"]
        if not text:
            continue
        if not out:
            out = text
            continue
        dedup = 0
        has_overlap = any(
            meta.get(k, 0) for k in ("overlap_top", "overlap_left", "overlap_bottom", "overlap_right")
        )
        if has_overlap and _adjacent(prev_meta, meta):
            dedup = find_exact_overlap(out, text, cfg)
            if dedup == 0:
                dedup = find_fuzzy_overlap(out, text, cfg)
        remainder = text[dedup:]
        if not remainder:
            continue
        out = out + cfg.separator + remainder if dedup == 0 else out + remainder
    return out
