"""Image splitting: 1 page -> N ordered chunks (reference: app/ocr/splitting/).

Re-implements the reference's splitter cascade as pure numpy functions
emitting chunk dicts with full provenance — the columns the downstream
merge sorts on (SURVEY.md §2.4 F1-F4):

- needs_splitting   (splitting/base.py:177-194): megapixels / dimension gate
- analyze_gaps      (analyzer.py:125-218): binarize, projection profiles,
                    whitespace runs >= min_gap_pixels below threshold,
                    centers outside a 10% edge margin
- ProjectionSplit   (projection.py:16-289): target count from MP/dims,
                    greedy gap selection nearest ideal even spacing,
                    min-chunk-size filter, exact cuts (no overlap)
- GridSplit         (grid.py:15-211): ceil grid with overlap_percent on
                    interior edges, overlap amounts recorded per chunk
                    (they feed the merge dedup)
- smart_split       (splitter.py:50-76): no-split fast path, else
                    projection -> grid fallback cascade

- component_split   (components.py:43-415): occupancy-map connected
                    regions — coarse cell grid marked by ink presence,
                    4-connected flood fill, bounding boxes in reading
                    order; sits between projection and grid in the
                    smart_split cascade.

A chunk dict: {image, index, row, col, x_offset, y_offset,
overlap_top, overlap_bottom, overlap_left, overlap_right}.
"""
from __future__ import annotations

import numpy as np

from ..config import SplitConfig
from .imageops import otsu_threshold

__all__ = [
    "needs_splitting",
    "analyze_gaps",
    "projection_split",
    "component_split",
    "grid_split",
    "smart_split",
    "analyze",
    "recommend_method",
    "split_with_method",
]


def needs_splitting(h: int, w: int, cfg: SplitConfig) -> bool:
    mp = (h * w) / 1e6
    return mp > cfg.max_megapixels or max(h, w) > cfg.max_dimension


def _find_gaps(profile: np.ndarray, cfg: SplitConfig, size: int) -> list[int]:
    """Whitespace runs in a normalized ink profile; returns gap centers
    (analyzer.py:173-218 semantics: runs >= min_gap_pixels below
    1 - gap_threshold, centers outside the 10% edge margin)."""
    is_gap = profile <= (1.0 - cfg.gap_threshold)
    centers: list[int] = []
    start = None
    for i, g in enumerate(np.append(is_gap, False)):
        if g and start is None:
            start = i
        elif not g and start is not None:
            if i - start >= cfg.min_gap_pixels:
                centers.append((start + i - 1) // 2)
            start = None
    margin = int(0.1 * size)
    return [c for c in centers if margin <= c <= size - margin]


def analyze_gaps(img: np.ndarray, cfg: SplitConfig) -> dict:
    """Projection-profile gap analysis on the Otsu-binarized image."""
    _, binary = otsu_threshold(img)
    ink = binary < 128
    h, w = ink.shape
    row_profile = ink.mean(axis=1)
    col_profile = ink.mean(axis=0)
    mx_r = row_profile.max() or 1.0
    mx_c = col_profile.max() or 1.0
    return {
        "h_gaps": _find_gaps(row_profile / mx_r, cfg, h),   # horizontal cut positions (y)
        "v_gaps": _find_gaps(col_profile / mx_c, cfg, w),   # vertical cut positions (x)
        "content_density": float(ink.mean()),
    }


def _target_chunks(h: int, w: int, cfg: SplitConfig) -> int:
    """projection.py:104-117: enough chunks to satisfy both MP and
    dimension caps, minimum 2."""
    mp = (h * w) / 1e6
    return max(
        int(np.ceil(mp / cfg.max_megapixels)),
        int(np.ceil(w / cfg.max_dimension)) * int(np.ceil(h / cfg.max_dimension)),
        2,
    )


def _pick_cuts(gaps: list[int], size: int, n_parts: int, cfg: SplitConfig) -> list[int]:
    """Greedy: for each ideal evenly-spaced cut, take the nearest unused
    gap center (projection.py:170-209); drop picks that would create
    chunks under min_chunk_size (projection.py:211-242)."""
    if n_parts <= 1 or not gaps:
        return []
    ideal = [size * i // n_parts for i in range(1, n_parts)]
    remaining = sorted(gaps)
    cuts: list[int] = []
    for pos in ideal:
        if not remaining:
            break
        nearest = min(remaining, key=lambda g: abs(g - pos))
        remaining.remove(nearest)
        cuts.append(nearest)
    cuts.sort()
    out: list[int] = []
    prev = 0
    for c in cuts:
        if c - prev >= cfg.min_chunk_size and size - c >= cfg.min_chunk_size:
            out.append(c)
            prev = c
    return out


def _emit(img: np.ndarray, y_cuts: list[int], x_cuts: list[int]) -> list[dict]:
    ys = [0] + y_cuts + [img.shape[0]]
    xs = [0] + x_cuts + [img.shape[1]]
    chunks = []
    idx = 0
    for r in range(len(ys) - 1):
        for c in range(len(xs) - 1):
            chunks.append(
                {
                    "image": img[ys[r] : ys[r + 1], xs[c] : xs[c + 1]],
                    "index": idx,
                    "row": r,
                    "col": c,
                    "x_offset": xs[c],
                    "y_offset": ys[r],
                    "overlap_top": 0,
                    "overlap_bottom": 0,
                    "overlap_left": 0,
                    "overlap_right": 0,
                }
            )
            idx += 1
    return chunks


def projection_split(img: np.ndarray, cfg: SplitConfig) -> list[dict] | None:
    """F2 — cut at detected whitespace gaps; None when gaps can't meet
    the target (caller falls through to grid_split)."""
    h, w = img.shape[:2]
    n = _target_chunks(h, w, cfg)
    gaps = analyze_gaps(img, cfg)
    # prefer the axis that violates the cap; typically horizontal cuts
    n_y = max(1, int(np.ceil(h / cfg.max_dimension)))
    n_x = max(1, int(np.ceil(w / cfg.max_dimension)))
    while n_y * n_x < n:
        if h / (n_y + 1) >= w / (n_x + 1):
            n_y += 1
        else:
            n_x += 1
    y_cuts = _pick_cuts(gaps["h_gaps"], h, n_y, cfg)
    x_cuts = _pick_cuts(gaps["v_gaps"], w, n_x, cfg)
    if not y_cuts and not x_cuts:
        return None
    chunks = _emit(img, y_cuts, x_cuts)
    # must actually relieve the size cap, else let grid handle it
    if any(needs_splitting(c["image"].shape[0], c["image"].shape[1], cfg) for c in chunks):
        return None
    return chunks


def _dilate3(mask: np.ndarray) -> np.ndarray:
    p = np.pad(mask, 1)
    h, w = mask.shape
    out = np.zeros_like(mask)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= p[dy : dy + h, dx : dx + w]
    return out


def component_split(img: np.ndarray, cfg: SplitConfig) -> list[dict] | None:
    """F3 — content-region occupancy splitter (components.py:43-415
    semantics, cv2-free): Otsu-inverse ink mask, 2x 3x3 dilation
    (~reference's 5x5 dilate) to weld nearby glyphs into regions, then
    1-D row/col occupancy maps padded by min_gap_pixels/2; cut at the
    centers of unoccupied runs nearest the ideal even spacing. Catches
    gaps the normalized projection threshold misses (faint wide pages);
    None when occupancy leaves no valid cut (fall through to grid)."""
    h, w = img.shape[:2]
    _, binary = otsu_threshold(img)
    ink = binary < 128
    ink = _dilate3(_dilate3(ink))
    pad = max(1, cfg.min_gap_pixels // 2)

    def occupancy_gaps(occ: np.ndarray, size: int) -> list[int]:
        # pad occupancy outward so cuts keep a margin from content
        padded = occ.copy()
        idx = np.flatnonzero(occ)
        for i in idx:
            padded[max(0, i - pad) : min(size, i + pad + 1)] = True
        free = ~padded
        centers: list[int] = []
        start = None
        for i, g in enumerate(np.append(free, False)):
            if g and start is None:
                start = i
            elif not g and start is not None:
                if i - start >= cfg.min_gap_pixels:
                    centers.append((start + i - 1) // 2)
                start = None
        margin = int(0.1 * size)
        return [c for c in centers if margin <= c <= size - margin]

    n = _target_chunks(h, w, cfg)
    n_y = max(1, int(np.ceil(h / cfg.max_dimension)))
    n_x = max(1, int(np.ceil(w / cfg.max_dimension)))
    while n_y * n_x < n:
        if h / (n_y + 1) >= w / (n_x + 1):
            n_y += 1
        else:
            n_x += 1
    y_cuts = _pick_cuts(occupancy_gaps(ink.any(axis=1), h), h, n_y, cfg)
    x_cuts = _pick_cuts(occupancy_gaps(ink.any(axis=0), w), w, n_x, cfg)
    if not y_cuts and not x_cuts:
        return None
    chunks = _emit(img, y_cuts, x_cuts)
    if any(needs_splitting(c["image"].shape[0], c["image"].shape[1], cfg) for c in chunks):
        return None
    return chunks


def grid_split(img: np.ndarray, cfg: SplitConfig) -> list[dict]:
    """F4 — fallback ceil-grid with overlap_percent on interior edges
    (grid.py:79-211). RTL collapses to horizontal strips (grid.py:111-125)."""
    h, w = img.shape[:2]
    base = min(cfg.target_chunk_dim, cfg.max_dimension)
    rows = max(1, int(np.ceil(h / base)))
    cols = max(1, int(np.ceil(w / base)))
    if cfg.rtl:
        cols = min(cols, 2)  # horizontal strips for RTL reading order
    bh, bw = h / rows, w / cols
    oy = int(bh * cfg.overlap_percent / 2)
    ox = int(bw * cfg.overlap_percent / 2)
    chunks = []
    idx = 0
    for r in range(rows):
        for c in range(cols):
            y0 = int(r * bh)
            y1 = int((r + 1) * bh) if r < rows - 1 else h
            x0 = int(c * bw)
            x1 = int((c + 1) * bw) if c < cols - 1 else w
            top = oy if r > 0 else 0
            bottom = oy if r < rows - 1 else 0
            left = ox if c > 0 else 0
            right = ox if c < cols - 1 else 0
            chunks.append(
                {
                    "image": img[y0 - top : y1 + bottom, x0 - left : x1 + right],
                    "index": idx,
                    "row": r,
                    "col": c,
                    "x_offset": x0 - left,
                    "y_offset": y0 - top,
                    "overlap_top": top,
                    "overlap_bottom": bottom,
                    "overlap_left": left,
                    "overlap_right": right,
                }
            )
            idx += 1
    return chunks


def smart_split(img: np.ndarray, cfg: SplitConfig) -> tuple[list[dict], str, bool]:
    """F1 — strategy cascade (splitter.py:50-76). Returns
    (chunks, split_method, was_split)."""
    h, w = img.shape[:2]
    if not needs_splitting(h, w, cfg):
        return (
            [
                {
                    "image": img,
                    "index": 0,
                    "row": 0,
                    "col": 0,
                    "x_offset": 0,
                    "y_offset": 0,
                    "overlap_top": 0,
                    "overlap_bottom": 0,
                    "overlap_left": 0,
                    "overlap_right": 0,
                }
            ],
            "none",
            False,
        )
    chunks = projection_split(img, cfg)
    if chunks is not None and len(chunks) > 1:
        return chunks, "projection", True
    chunks = component_split(img, cfg)
    if chunks is not None and len(chunks) > 1:
        return chunks, "components", True
    return grid_split(img, cfg), "grid", True


_METHODS: list[tuple[str, object]] = [
    ("projection", projection_split),
    ("components", component_split),
    ("grid", grid_split),
]


def analyze(img: np.ndarray, cfg: SplitConfig) -> dict:
    """User-facing splitting introspection (reference
    SmartSplitter.analyze, splitter.py:107-148): image stats, whether
    splitting is needed, which cascade methods CAN split this image, and
    which one smart_split would pick — same dict shape as the reference."""
    h, w = img.shape[:2]
    needs = needs_splitting(h, w, cfg)
    available: list[dict] = []
    recommended: str | None = None
    for name, fn in _METHODS:
        if not needs:
            can = False
        elif name == "grid":
            can = True  # the unconditional fallback
        else:
            chunks = fn(img, cfg)
            can = chunks is not None and len(chunks) > 1
        available.append({"name": name, "can_split": can})
        if can and recommended is None:
            recommended = name
    return {
        "width": w,
        "height": h,
        "megapixels": (h * w) / 1e6,
        "needs_splitting": needs,
        "max_megapixels": cfg.max_megapixels,
        "max_dimension": cfg.max_dimension,
        "available_methods": available,
        "recommended_method": recommended,
    }


def recommend_method(img: np.ndarray, cfg: SplitConfig) -> str | None:
    """Which cascade method smart_split would choose (None = no split
    needed) — reference SmartSplitter recommendation surface."""
    return analyze(img, cfg)["recommended_method"]


def split_with_method(img: np.ndarray, cfg: SplitConfig, method: str) -> list[dict] | None:
    """Split with an explicitly chosen method (reference
    SmartSplitter.split(method=...), splitter.py:78-105): bypasses the
    cascade; unknown names raise with the available list. Projection /
    components return None when they cannot split this image."""
    for name, fn in _METHODS:
        if name == method:
            return fn(img, cfg)
    raise ValueError(
        f"Unknown split method: {method}. Available: {[n for n, _ in _METHODS]}"
    )
