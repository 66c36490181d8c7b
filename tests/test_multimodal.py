"""Multimodal binary-column stages: codec round-trip, actor stages,
fan-out provenance (stages/multimodal.py)."""
import numpy as np
import pyarrow as pa

from ocr_ray.stages.pdfmeta import pdf_metadata_batch
from ocr_ray.synth.media import build_pdf_ref, parse_ref


def test_pdf_metadata_stage_and_title_roundtrip():
    ref = build_pdf_ref("doc a", 2, pages=4, seed=11, title="My Title & Co")
    p = parse_ref(ref)
    assert p["title"] == "My Title & Co" and p["pages"] == 4
    batch = pa.table({
        "doc_id": ["d1", "d2"],
        "spans": [
            [{"kind": "text", "text": "t", "media_ref": "", "offset": 0},
             {"kind": "pdf", "text": "", "media_ref": ref, "offset": 1}],
            [{"kind": "text", "text": "u", "media_ref": "", "offset": 0}],
        ],
    })
    out = pdf_metadata_batch(batch)
    assert out.num_rows == 1
    row = out.to_pylist()[0]
    assert row["doc_id"] == "d1" and row["n_pages"] == 4
    assert row["title"] == "My Title & Co" and row["seed"] == 11
    assert row["author"] and row["producer"]
import pyarrow as pa
import pytest

from ocr_ray.stages import multimodal as MM


def test_frame_codec_roundtrip():
    rng = np.random.default_rng(0)
    for shape in [(32, 48), (3, 16, 16), (1, 1, 1)]:
        arr = rng.integers(0, 256, shape, dtype=np.uint8)
        out = MM.decode_frames(MM.encode_frames(arr))
        expect = arr[None] if arr.ndim == 2 else arr
        assert np.array_equal(out, expect)


def test_frame_codec_rejects_malformed():
    with pytest.raises(ValueError):
        MM.decode_frames(b"nope")
    with pytest.raises(ValueError):
        MM.decode_frames(MM.encode_frames(np.zeros((2, 4, 4), np.uint8))[:-5])
    with pytest.raises(ValueError):
        MM.encode_frames(np.zeros((4, 4), np.float32))


def test_compressed_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_compressed_image(b"\x89PNG\r\n")


def _batch(n_frames=6, h=10, w=8, n=3):
    rng = np.random.default_rng(1)
    return pa.table({
        "media_id": pa.array(list(range(n)), pa.int64()),
        "payload": pa.array(
            [MM.encode_frames(rng.integers(0, 256, (n_frames, h, w), dtype=np.uint8))
             for _ in range(n)], pa.binary()),
    })


def test_image_stats_stage():
    out = MM.ImageStats()(_batch())
    assert out.column_names == ["media_id", "height", "width", "ink_frac"]
    assert out.column("height").to_pylist() == [10, 10, 10]
    assert all(0.0 <= v <= 1.0 for v in out.column("ink_frac").to_pylist())


def test_resize_stage_roundtrip():
    out = MM.ImageResize(5, 4)(_batch())
    frames = MM.decode_frames(out.column("payload")[0].as_py())
    assert frames.shape == (6, 5, 4)
    assert out.column("height").to_pylist() == [5, 5, 5]


def test_frame_sampler_fanout_provenance():
    out = MM.FrameSampler(every_k=4)(_batch(n_frames=6))
    # 6 frames, k=4 -> indices 0 and 4 per media
    assert out.num_rows == 6
    assert out.column("frame_idx").to_pylist() == [0, 4] * 3
    f = MM.decode_frames(out.column("payload")[0].as_py())
    assert f.shape == (1, 10, 8)


def test_resize_then_stats_composition(ray_session):
    """ImageResize -> ImageStats must compose (no duplicate height/width
    columns) and the merged image_stats query must carry both the
    original and the resized (r_*) feature columns."""
    from ocr_ray import queries as Q

    out = Q.q_multimodal_image_stats("/root/testdata/sf0.001")
    assert (out["r_height"] == 48).all() and (out["r_width"] == 32).all()
    assert {"media_id", "height", "width", "ink_frac",
            "r_height", "r_width", "r_ink_frac"} <= set(out.columns)


def test_pcm_codec_and_audio_features(ray_session):
    import math

    # codec round-trip
    x = (np.sin(np.arange(8000) * 0.1) * 20000).astype(np.int16)
    samples, rate = MM.decode_pcm(MM.encode_pcm(x, rate=8000))
    assert rate == 8000 and np.array_equal(samples, x)
    # malformed payloads raise, never return garbage
    import pytest
    with pytest.raises(ValueError):
        MM.decode_pcm(b"nope")
    with pytest.raises(ValueError):
        MM.decode_pcm(MM.encode_pcm(x)[:-10])

    # feature sanity on a pure sine: rms ~= A/sqrt(2), zcr ~= 2f/rate
    from ocr_ray import queries as Q
    out = Q.q_multimodal_audio_features("/root/testdata/sf0.001")
    out2 = Q.q_multimodal_audio_features("/root/testdata/sf0.001")
    assert out.equals(out2)
    assert len(out) > 0
    assert (out["duration_sec"] > 0).all()
    expected_rms = 0.4 / math.sqrt(2)
    assert ((out["rms"] - expected_rms).abs() < 0.05).all()
    f = 100.0 + (out["media_id"] % 13) * 25.0
    expected_zcr = 2 * f / 16_000.0
    assert ((out["zcr"] - expected_zcr).abs() < 0.02).all()
