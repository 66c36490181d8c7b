"""synth:// media codec — deterministic render + decode of page images.

A ``media_ref`` URI fully determines a synthetic page image:

    synth://image/{doc_id}/{offset}?skew=1.7&inv=1&noise=0.01&t=<b64url payload>
    synth://pdf/{doc_id}/{offset}?pages=12&seed=991&skew=...&inv=...&noise=...

Rendering (``render_ref``) plays the role of fetching the binary
payload from storage; it is deterministic so the single-process oracle
and any Ray worker materialize byte-identical images with no shared
filesystem (SURVEY.md §7.0).

Image anatomy: the payload text's "\\n\\n"-separated paragraphs become
stacked *bands*; each band is a black frame (FRAME px) around a bit
matrix (CELL px per bit, BITS_PER_ROW bits wide, row 0 starts with a
16-bit byte-length prefix) encoding the paragraph's UTF-8 bytes. Bands
are separated by BAND_GAP white rows — the whitespace the projection
splitter (functions/split.py) detects, mirroring the reference's
projection-profile gap analyzer (app/ocr/splitting/analyzer.py:125-218).
Degradations applied at render (in order): rotate by ``skew`` (white
fill), invert if ``inv``, salt&pepper at rate ``noise`` (seeded) —
exactly the conditions the preprocessing chain (functions/preprocess.py)
must undo before ``decode_bands`` can read the bits back.
"""
from __future__ import annotations

import base64
import zlib
from urllib.parse import parse_qs, quote, unquote, urlparse

import numpy as np

from ..config import PreprocessConfig
from ..functions.preprocess import preprocess_image
from . import textgen

CELL = 6                  # px per bit cell
FRAME = 12                # frame thickness px (2 cells)
MARGIN = 12               # white margin around the whole image
BITS_PER_ROW = 64         # data bits per matrix row
BAND_GAP = 36             # white rows between bands
BAND_WIDTH = BITS_PER_ROW * CELL + 2 * FRAME  # 408
MIN_GAP_RUN = 6           # decoder: >= this many all-white rows separate bands

__all__ = [
    "build_image_ref",
    "build_pdf_ref",
    "parse_ref",
    "render_payload",
    "render_ref",
    "decode_bands",
    "extract_image_text",
    "pdf_page_params",
    "expected_payload_text",
]


# ---------------------------------------------------------------- refs

def build_image_ref(doc_id: str, offset: int, text: str, *, skew: float = 0.0,
                    invert: bool = False, noise: float = 0.0, seed: int = 0) -> str:
    t = base64.urlsafe_b64encode(text.encode("utf-8")).decode("ascii")
    return (
        f"synth://image/{quote(doc_id)}/{offset}"
        f"?skew={skew:g}&inv={int(invert)}&noise={noise:g}&seed={seed}&t={t}"
    )


def build_pdf_ref(doc_id: str, offset: int, pages: int, *, seed: int,
                  skew: float = 0.0, invert: bool = False, noise: float = 0.0,
                  title: str = "") -> str:
    ref = (
        f"synth://pdf/{quote(doc_id)}/{offset}"
        f"?pages={pages}&seed={seed}&skew={skew:g}&inv={int(invert)}&noise={noise:g}"
    )
    # document-level metadata travels in the ref (the stand-in for the
    # PDF info dict a real file carries, app/services/pdf_service.py:182-214)
    if title:
        ref += f"&title={quote(title)}"
    return ref


def parse_ref(ref: str) -> dict:
    u = urlparse(ref)
    if u.scheme != "synth":
        raise ValueError(f"not a synth ref: {ref!r}")
    kind = u.netloc  # "image" | "pdf"
    parts = u.path.lstrip("/").split("/")
    q = {k: v[0] for k, v in parse_qs(u.query).items()}
    out = {
        "kind": kind,
        "doc_id": unquote(parts[0]),
        "offset": int(parts[1]),
        "skew": float(q.get("skew", 0.0)),
        "invert": bool(int(q.get("inv", 0))),
        "noise": float(q.get("noise", 0.0)),
        "seed": int(q.get("seed", 0)),
    }
    if kind == "image":
        # parse_qs drops empty params, so an empty payload has no "t" key
        out["text"] = base64.urlsafe_b64decode(q.get("t", "").encode("ascii")).decode("utf-8")
    elif kind == "pdf":
        out["pages"] = int(q["pages"])
        out["title"] = q.get("title", "")
    else:
        raise ValueError(f"unknown synth media kind {kind!r}")
    return out


def pdf_page_params(params: dict, page_number: int) -> dict:
    """Per-page render params for a parsed pdf ref (1-indexed page).
    Page text + degradations derive deterministically from the pdf seed."""
    seed = params["seed"]
    rng = np.random.default_rng(np.uint64(seed) * np.uint64(7_919) + np.uint64(page_number))
    return {
        "text": textgen.page_text(seed, page_number),
        "skew": params["skew"] if rng.random() < 0.5 else 0.0,
        "invert": params["invert"] and (page_number % 3 == 0),
        "noise": params["noise"] if rng.random() < 0.5 else 0.0,
        "seed": int(seed * 31 + page_number),
    }


def expected_payload_text(ref: str) -> str:
    """What a correct extractor recovers from this ref (generator-side
    ground truth; the *judged* truth is the oracle, which decodes)."""
    p = parse_ref(ref)
    if p["kind"] == "image":
        return p["text"]
    pages = []
    for i in range(1, p["pages"] + 1):
        pages.append(textgen.page_text(p["seed"], i))
    return pages  # list of page texts; stitching handled upstream


# ---------------------------------------------------------------- render

def _encode_band(text: str) -> np.ndarray:
    """text -> framed binary band image (uint8, ink=0 on 255).

    Decode is verified robust (skew<=4deg, noise<=0.02, inversion) for
    bands up to ~1200 bytes; beyond that cumulative sub-pixel drift over
    the tall grid exceeds the single-flip CRC correction. The corpus
    generator keeps paragraphs far below this (~200 chars)."""
    data = text.encode("utf-8")
    if len(data) >= (1 << 16):
        raise ValueError("band payload too large")
    crc = zlib.crc32(data) & 0xFFFFFFFF
    bits = np.unpackbits(
        np.frombuffer(
            len(data).to_bytes(2, "big") + data + crc.to_bytes(4, "big"),
            dtype=np.uint8,
        )
    )
    n_rows = int(np.ceil(bits.size / BITS_PER_ROW))
    padded = np.zeros(n_rows * BITS_PER_ROW, dtype=np.uint8)
    padded[: bits.size] = bits
    matrix = padded.reshape(n_rows, BITS_PER_ROW)
    cells = np.kron(matrix, np.ones((CELL, CELL), dtype=np.uint8))
    img = np.where(cells > 0, 0, 255).astype(np.uint8)
    return np.pad(img, FRAME, mode="constant", constant_values=0)  # black frame


def render_payload(text: str) -> np.ndarray:
    """Render payload text (paragraphs = bands) into a clean page image."""
    bands = [_encode_band(b) for b in text.split("\n\n")]
    width = max(b.shape[1] for b in bands)
    rows: list[np.ndarray] = []
    gap = np.full((BAND_GAP, width), 255, dtype=np.uint8)
    for i, b in enumerate(bands):
        if i:
            rows.append(gap)
        if b.shape[1] < width:
            b = np.pad(b, ((0, 0), (0, width - b.shape[1])), constant_values=255)
        rows.append(b)
    page = np.concatenate(rows, axis=0)
    return np.pad(page, MARGIN, mode="constant", constant_values=255)


def _degrade(img: np.ndarray, *, skew: float, invert: bool, noise: float, seed: int) -> np.ndarray:
    from ..functions.imageops import rotate_expand

    if skew:
        img = rotate_expand(img, skew, fill=255)
    if invert:
        img = (255 - img).astype(np.uint8)
    if noise > 0:
        rng = np.random.default_rng(np.uint64(seed) + np.uint64(0x5EED))
        mask = rng.random(img.shape) < noise
        img = img.copy()
        img[mask] = 255 - img[mask]
    return img


def render_ref(ref: str, page_number: int | None = None) -> np.ndarray:
    """Materialize the page image for a media ref ("fetch from storage").
    For pdf refs, ``page_number`` (1-indexed) selects the page."""
    p = parse_ref(ref)
    if p["kind"] == "pdf":
        if page_number is None:
            raise ValueError("pdf ref requires page_number")
        p = pdf_page_params(p, page_number)
    img = render_payload(p["text"])
    return _degrade(
        img, skew=p["skew"], invert=p["invert"], noise=p["noise"], seed=p["seed"]
    )


# ---------------------------------------------------------------- decode

def _band_slices(binary: np.ndarray) -> list[tuple[int, int]]:
    """Split a binarized page into vertical band row-ranges separated by
    runs of >= MIN_GAP_RUN (near-)white rows. A few stray dark pixels
    per row are tolerated so residual undetected noise cannot weld
    bands together."""
    dark = binary < 128
    dark_rows = dark.sum(axis=1) > max(2, int(0.008 * binary.shape[1]))
    idx = np.flatnonzero(dark_rows)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > MIN_GAP_RUN)
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [idx.size - 1]])
    return [(int(idx[s]), int(idx[e]) + 1) for s, e in zip(starts, ends)]


def _cell_means(ii: np.ndarray, y0: float, x0: float, n_rows: int, h: int, w: int) -> np.ndarray:
    """Mean darkness of each cell's 4x4 interior via integral image."""
    ys = np.rint(y0 + np.arange(n_rows) * CELL + 1).astype(np.int64)
    xs = np.rint(x0 + np.arange(BITS_PER_ROW) * CELL + 1).astype(np.int64)
    ys = np.clip(ys, 0, h - 4)
    xs = np.clip(xs, 0, w - 4)
    k = 4
    s = (
        ii[np.ix_(ys + k, xs + k)]
        - ii[np.ix_(ys, xs + k)]
        - ii[np.ix_(ys + k, xs)]
        + ii[np.ix_(ys, xs)]
    )
    return s / (k * k)


def _decode_band(band: np.ndarray) -> str | None:
    """Decode one framed band (binarized, ink=0) back to text.
    Returns None when the slice holds no recognizable frame."""
    dark = band < 128
    h, w = dark.shape
    if h < 2 * FRAME + CELL or w < 2 * FRAME + CELL:
        return None
    row_frac = dark.mean(axis=1)
    col_frac = dark.mean(axis=0)
    # frame rows/cols are (nearly) fully dark across the band extent
    frame_rows = np.flatnonzero(row_frac > 0.5)
    frame_cols = np.flatnonzero(col_frac > 0.3)
    if frame_rows.size < FRAME or frame_cols.size < FRAME:
        return None
    top, bottom = int(frame_rows[0]), int(frame_rows[-1])
    left = int(frame_cols[0])
    max_rows = max(1, int(round((bottom - top + 1 - 2 * FRAME) / CELL)) + 1)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(dark, axis=0), axis=1, out=ii[1:, 1:])
    # Grid anchor search on ROW 0 ONLY: rotation smear makes the outer
    # frame bbox +-2 px fuzzy, so try offsets and keep the one whose
    # row-0 cell means are most decisive (far from 0.5). The row COUNT
    # is then taken from the decoded length prefix, not from the fuzzy
    # frame height.
    offs = np.arange(-2, 4)
    k = 4
    ys_all = np.clip(
        np.rint(top + FRAME + offs + 1).astype(np.int64), 0, h - k
    )  # (6,)
    xs_all = np.clip(
        np.rint(left + FRAME + offs[:, None] + np.arange(BITS_PER_ROW) * CELL + 1)
        .astype(np.int64),
        0,
        w - k,
    )  # (6, 64)
    y_lo = ys_all[:, None, None]
    y_hi = y_lo + k
    x_lo = xs_all[None, :, :]
    x_hi = x_lo + k
    m_all = (
        ii[y_hi, x_hi] - ii[y_lo, x_hi] - ii[y_hi, x_lo] + ii[y_lo, x_lo]
    ) / (k * k)  # (6 dy, 6 dx, 64 bits): row-0 cell means for every offset
    in_frame = m_all.mean(axis=2) > 0.85  # sampling the solid frame, not data
    conf = np.abs(m_all - 0.5).mean(axis=2)
    conf[in_frame] = -1.0
    order = np.argsort(conf, axis=None)[::-1]
    candidates = [
        (float(conf.flat[i]), int(offs[i // 6]), int(offs[i % 6]), i)
        for i in order
        if conf.flat[i] >= 0.0
    ]
    pow16 = 1 << np.arange(15, -1, -1)
    for _conf, dy, dx, flat_i in candidates:
        m0 = m_all[flat_i // 6, flat_i % 6]
        row0 = (m0 > 0.5).astype(np.int64).ravel()
        length = int((row0[:16] * pow16).sum())
        need = 16 + length * 8 + 32  # + crc32
        n_rows = int(np.ceil(need / BITS_PER_ROW))
        if length == 0 or n_rows > max_rows:
            continue
        m = _cell_means(ii, top + FRAME + dy, left + FRAME + dx, n_rows, h, w)
        bits = (m > 0.5).astype(np.uint8).ravel()
        if need > bits.size:
            continue
        decoded = _verify_payload(bits, m, length, need)
        if decoded is not None:
            return decoded
    return None


def _verify_payload(bits: np.ndarray, m: np.ndarray, length: int, need: int) -> str | None:
    """CRC-check the decoded bits; on mismatch, try flipping the most
    uncertain cells (means nearest 0.5) one at a time — misread cells
    are marginal by construction, so this corrects isolated errors."""

    def attempt(b: np.ndarray) -> str | None:
        payload = np.packbits(b[16 : 16 + length * 8]).tobytes()[:length]
        crc = int.from_bytes(np.packbits(b[16 + length * 8 : need]).tobytes()[:4], "big")
        if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
            return None
        try:
            return payload.decode("utf-8")
        except UnicodeDecodeError:
            return None

    out = attempt(bits)
    if out is not None:
        return out
    uncertainty = np.abs(m.ravel()[:need] - 0.5)
    for idx in np.argsort(uncertainty)[:12]:
        if idx < 16:
            continue  # a length-prefix error would have failed earlier
        flipped = bits.copy()
        flipped[idx] ^= 1
        out = attempt(flipped)
        if out is not None:
            return out
    return None


def decode_bands(binary: np.ndarray) -> list[str]:
    """Decode every band of a binarized page image, top-to-bottom.
    Slices with no recognizable frame (edge specks etc.) are dropped."""
    out = []
    for a, b in _band_slices(binary):
        text = _decode_band(binary[a:b])
        if text is not None:
            out.append(text)
    return out


def extract_image_text(img: np.ndarray, cfg: PreprocessConfig) -> tuple[str, list[str]]:
    """Whole-image extraction: preprocess (invert/denoise/deskew/binarize)
    then decode all bands, joined with "\\n\\n" — the same result the
    split-then-merge path composes to (functions/split.py + merge.py).
    Returns (text, steps_applied lineage)."""
    processed, applied, _ = preprocess_image(img, cfg)
    return "\n\n".join(decode_bands(processed)), applied
