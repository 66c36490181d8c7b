import numpy as np

from ocr_ray.functions.analysis import analyze_image, is_inverted, noise_level
from ocr_ray.synth.media import render_payload


def test_is_inverted():
    img = render_payload("Some page content here.")
    assert not is_inverted(img)
    assert is_inverted(255 - img)


def test_noise_level_thresholds():
    img = render_payload("Some page content here for noise testing.")
    assert noise_level(img) < 0.05
    rng = np.random.default_rng(1)
    noisy = img.copy()
    mask = rng.random(img.shape) < 0.01
    noisy[mask] = 255 - noisy[mask]
    assert noise_level(noisy) > 0.1


def test_analyze_flags_clean_image():
    img = render_payload("Clean upright page with several words of content.")
    a = analyze_image(img)
    assert not a["is_inverted"]
    assert not a["needs_denoising"]
    assert not a["needs_deskewing"]
    assert a["has_text"]


def test_analyze_inverted_noisy_skewed():
    from ocr_ray.functions.imageops import rotate_expand

    img = render_payload("Degraded page with several words of content to analyze.")
    img = rotate_expand(img, 2.5, fill=255)
    img = (255 - img).astype(np.uint8)
    rng = np.random.default_rng(2)
    mask = rng.random(img.shape) < 0.01
    img[mask] = 255 - img[mask]
    a = analyze_image(img)
    assert a["is_inverted"]
    assert a["needs_denoising"]
    assert a["needs_deskewing"] and abs(a["skew_angle"] + 2.5) < 0.5
