"""Ingest-side validation (reference S1-S3, T6): magic-byte sniffing,
filename sanitizing, payload caps — as a tagged-rows ``map_batches``
stage, never a task failure.

Reference semantics re-expressed for a streaming engine
(app/utils/file_validation.py): the reference raises HTTP 400 per
upload; a 100TB pipeline instead TAGS each row (``valid``,
``detected_type``, ``reject_reason``) so malformed rows route to an
error-side output and the job never dies on one bad document.
"""
from __future__ import annotations

import pyarrow as pa

__all__ = ["sniff_type", "sanitize_filename", "validate_payload_batch", "MAGIC_TABLE"]

# magic-byte signature table (file_validation.py:33-45; RIFF/WEBP
# special case :54-75). Longest-prefix-first.
MAGIC_TABLE: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"%PDF-", "pdf"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF87a", "gif"),
    (b"GIF89a", "gif"),
    (b"BM", "bmp"),
    (b"II*\x00", "tiff"),
    (b"MM\x00*", "tiff"),
    (b"OCRF", "frames"),  # our raw-frame container (stages/multimodal.py)
]


def sniff_type(payload: bytes) -> str | None:
    """Detect payload type from its leading bytes; None if unknown."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    for sig, name in MAGIC_TABLE:
        if payload[: len(sig)] == sig:
            return name
    return None


def sanitize_filename(name: str) -> str | None:
    """Strip path components; reject traversal/dotfiles/overlong names
    (file_validation.py:194-224). Returns None when unsalvageable."""
    if ".." in name:  # reject traversal on the RAW name, pre-strip
        return None
    base = name.replace("\\", "/").rsplit("/", 1)[-1]
    if not base or base.startswith(".") or len(base) > 255:
        return None
    return base


def validate_payload_batch(
    batch: pa.Table,
    *,
    payload_col: str = "payload",
    filename_col: str | None = None,
    max_bytes: int = 50 * 1024 * 1024,
    allowed_types: frozenset[str] | None = None,
) -> pa.Table:
    """Append ``detected_type`` / ``valid`` / ``reject_reason`` columns.

    Mirrors the reference's 3 layers (size cap, magic sniff, and — in
    place of PIL.verify() — container-consistency where the codec is
    available) without ever raising per row."""
    types: list[str | None] = []
    valid: list[bool] = []
    reasons: list[str] = []
    payloads = batch.column(payload_col)
    names = batch.column(filename_col) if filename_col else None
    for i in range(batch.num_rows):
        buf = payloads[i].as_py()
        reason = ""
        t = None
        if buf is None or len(buf) == 0:
            reason = "empty"
        elif len(buf) > max_bytes:
            reason = "too_large"
        else:
            t = sniff_type(buf)
            if t is None:
                reason = "unknown_type"
            elif allowed_types is not None and t not in allowed_types:
                reason = f"type_not_allowed:{t}"
        if not reason and names is not None:
            if sanitize_filename(names[i].as_py() or "") is None:
                reason = "bad_filename"
        types.append(t)
        valid.append(not reason)
        reasons.append(reason)
    out = batch.append_column("detected_type", pa.array(types, pa.string()))
    out = out.append_column("valid", pa.array(valid, pa.bool_()))
    return out.append_column("reject_reason", pa.array(reasons, pa.string()))
