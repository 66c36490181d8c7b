import numpy as np
import pytest

from ocr_ray.config import PreprocessConfig
from ocr_ray.synth import media, textgen

CFG = PreprocessConfig()


@pytest.mark.parametrize(
    "skew,invert,noise",
    [
        (0.0, False, 0.0),
        (0.0, True, 0.0),
        (0.0, False, 0.01),
        (-3.0, False, 0.0),
        (2.5, True, 0.01),
        (3.8, False, 0.02),
        (-1.5, True, 0.02),
    ],
)
def test_roundtrip_degradations(skew, invert, noise):
    rng = np.random.default_rng(abs(hash((skew, invert, noise))) % 2**31)
    text = textgen.make_text(rng, int(rng.integers(1, 4)))
    ref = media.build_image_ref("d", 0, text, skew=skew, invert=invert, noise=noise, seed=5)
    got, _ = media.extract_image_text(media.render_ref(ref), CFG)
    assert got == text


def test_render_deterministic():
    ref = media.build_image_ref("d", 0, "Same input same pixels.", skew=1.5, noise=0.01, seed=9)
    a = media.render_ref(ref)
    b = media.render_ref(ref)
    assert np.array_equal(a, b)


def test_pdf_pages_roundtrip():
    ref = media.build_pdf_ref("d", 1, pages=3, seed=123, skew=2.0, invert=True, noise=0.01)
    for page in (1, 2, 3):
        got, _ = media.extract_image_text(media.render_ref(ref, page_number=page), CFG)
        assert got == textgen.page_text(123, page)


def test_empty_payload():
    ref = media.build_image_ref("d", 0, "")
    got, _ = media.extract_image_text(media.render_ref(ref), CFG)
    assert got == ""


def test_unicode_payload():
    text = "Zéphyr — ünïcode ☃ page"
    ref = media.build_image_ref("d", 0, text, skew=1.5, noise=0.01, seed=3)
    got, _ = media.extract_image_text(media.render_ref(ref), CFG)
    assert got == text


def test_parse_ref_rejects_garbage():
    with pytest.raises(ValueError):
        media.parse_ref("http://nope")
    with pytest.raises(ValueError):
        media.render_ref(media.build_pdf_ref("d", 0, pages=2, seed=1))  # no page_number


def test_lineage_reports_applied_steps():
    ref = media.build_image_ref("d", 0, "Lineage check content.", skew=2.5, invert=True, noise=0.01, seed=2)
    _, applied = media.extract_image_text(media.render_ref(ref), CFG)
    assert applied[:3] == ["invert", "denoise", "deskew"]
