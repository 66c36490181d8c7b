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

__all__ = ["strip_boilerplate"]

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
