"""Ingest validation stage (sources/validate.py): magic sniffing,
filename sanitizing, tagged-rows semantics."""
import pyarrow as pa

from ocr_ray.sources import validate as V


def test_sniff_known_types():
    assert V.sniff_type(b"\x89PNG\r\n\x1a\n" + b"x" * 8) == "png"
    assert V.sniff_type(b"%PDF-1.7 ...") == "pdf"
    assert V.sniff_type(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert V.sniff_type(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "webp"
    assert V.sniff_type(b"RIFF\x00\x00\x00\x00WAVE") is None
    assert V.sniff_type(b"OCRF" + b"\x00" * 12) == "frames"
    assert V.sniff_type(b"garbage") is None


def test_sanitize_filename():
    assert V.sanitize_filename("a/b/c.png") == "c.png"
    assert V.sanitize_filename("..\\evil.png") is None
    assert V.sanitize_filename(".hidden") is None
    assert V.sanitize_filename("x" * 300) is None
    assert V.sanitize_filename("ok-name_1.pdf") == "ok-name_1.pdf"


def test_validate_batch_tags_rows_never_raises():
    batch = pa.table({
        "payload": pa.array(
            [b"%PDF-1.4", b"", b"\xff\xd8\xffdata", b"??unknown", b"Z" * 100],
            pa.binary()),
        "filename": ["doc.pdf", "x.bin", "../traversal.jpg", "f.bin", "big.bin"],
    })
    out = V.validate_payload_batch(
        batch, filename_col="filename", max_bytes=50,
        allowed_types=frozenset({"pdf", "jpeg"}))
    assert out.column("valid").to_pylist() == [True, False, False, False, False]
    assert out.column("reject_reason").to_pylist() == [
        "", "empty", "bad_filename", "unknown_type", "too_large"]
    assert out.column("detected_type").to_pylist()[0] == "pdf"
