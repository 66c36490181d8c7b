"""HTML boilerplate stripping — the text/HTML span path of the engine.

The north rule adds main-content extraction (HTML boilerplate strip,
DOM heuristics) alongside the reference's OCR core. The reference's
closest ancestor is its stdout-scrape parser (T1,
app/ocr/deepseek.py:213-262): strip scaffolding noise from raw
extractor output, keep content lines. This module generalizes that as
classic block-level DOM heuristics (tag class + link density + text
mass), implemented with compiled regexes so it runs vectorized-ish
inside ``map_batches`` over thousands of spans per batch.

Pure function shared by the Ray stage and the oracle.
"""
from __future__ import annotations

import re

__all__ = ["strip_boilerplate", "extract_table_cells"]

# containers whose entire content is boilerplate
_KILL_TAGS = ("script", "style", "nav", "footer", "header", "aside", "noscript", "form")
_KILL_RE = re.compile(
    r"<(" + "|".join(_KILL_TAGS) + r")\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level boundaries we split candidate blocks on
_BLOCK_RE = re.compile(
    r"</?(?:p|div|section|article|main|body|html|head|h[1-6]|ul|ol|li|table|tr|td|br)\b[^>]*>",
    re.IGNORECASE,
)
_ANCHOR_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")


def _clean(text: str) -> str:
    return _WS_RE.sub(" ", _TAG_RE.sub(" ", text)).strip()


_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>",
                       re.IGNORECASE | re.DOTALL)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.IGNORECASE | re.DOTALL)
_TD_RE = re.compile(r"<t[dh]\b[^>]*>(.*?)</t[dh]\s*>",
                    re.IGNORECASE | re.DOTALL)


def extract_table_cells(html: str) -> list[tuple[int, int, int, str]]:
    """Structured table extraction from an HTML fragment: one
    (table_idx, row_idx, col_idx, cell_text) tuple per <td>/<th> cell,
    in document order, inline tags stripped and whitespace collapsed
    per cell. The DOM-layout-parse sibling of
    :func:`strip_boilerplate` (the reference's layout parsing lives in
    its PDF service, app/services/pdf_service.py:107-130; here the
    structured-content case is HTML tables). Compiled regexes only —
    runs on thousands of spans per ``map_batches`` batch."""
    out: list[tuple[int, int, int, str]] = []
    if not html:
        return out
    for ti, table in enumerate(_TABLE_RE.findall(html)):
        for ri, row in enumerate(_TR_RE.findall(table)):
            for ci, cell in enumerate(_TD_RE.findall(row)):
                out.append((ti, ri, ci, _clean(cell)))
    return out


def strip_boilerplate(html: str, max_link_density: float = 0.4, min_text_chars: int = 20) -> str:
    """Extract main content from an HTML fragment.

    Heuristics (in order):
    1. drop <script>/<style>/<nav>/<footer>/<header>/<aside>/<form> +
       comments wholesale;
    2. split what remains on block-level tags;
    3. per block, compute link density = chars of anchor text / chars of
       all text; drop blocks with density > max_link_density (link
       farms, menus) or fewer than min_text_chars chars (stray labels);
    4. strip remaining inline tags, collapse whitespace;
    5. join surviving blocks with a newline.
    """
    if not html:
        return ""
    s = _COMMENT_RE.sub(" ", html)
    s = _KILL_RE.sub(" ", s)
    blocks = _BLOCK_RE.split(s)
    kept: list[str] = []
    for block in blocks:
        if not block or not block.strip():
            continue
        anchor_chars = sum(len(_clean(m)) for m in _ANCHOR_RE.findall(block))
        text = _clean(block)
        if not text or len(text) < min_text_chars:
            continue
        if anchor_chars / max(1, len(text)) > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept)
