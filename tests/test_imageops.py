import numpy as np
import pytest

from ocr_ray.functions.imageops import (
    adaptive_threshold,
    estimate_skew,
    median3x3,
    otsu_threshold,
    rotate_expand,
)


def _striped_page():
    img = np.full((300, 400), 255, np.uint8)
    for y in range(40, 260, 30):
        img[y : y + 8, 30:370] = 20
    return img


def test_otsu_bimodal():
    img = _striped_page()
    t, b = otsu_threshold(img)
    assert 20 <= t < 255
    assert set(np.unique(b)) == {0, 255}
    assert (b == 0).sum() == (img == 20).sum()


def test_adaptive_threshold_binary_output():
    img = _striped_page()
    b = adaptive_threshold(img)
    assert set(np.unique(b)) <= {0, 255}
    # stripes stay dark
    assert b[44, 200] == 0 and b[30, 200] == 255


def test_rotate_expand_identity():
    img = _striped_page()
    assert np.array_equal(rotate_expand(img, 0.0), img)


def test_rotate_expands_canvas():
    img = _striped_page()
    rot = rotate_expand(img, 3.0)
    assert rot.shape[0] > img.shape[0] and rot.shape[1] > img.shape[1]


@pytest.mark.parametrize("angle", [-3.0, -1.2, 0.8, 2.5, 3.8])
def test_estimate_skew_correction(angle):
    img = _striped_page()
    rot = rotate_expand(img, angle, fill=255)
    est = estimate_skew(rot)
    # est is the CORRECTION angle: it must (approximately) undo `angle`
    assert abs(est + angle) < 0.25
    fixed = rotate_expand(rot, est, fill=255)
    assert abs(estimate_skew(fixed)) < 0.3


def test_estimate_skew_no_signal():
    assert estimate_skew(np.full((100, 100), 255, np.uint8)) == 0.0


def test_median3x3_kills_impulses():
    img = _striped_page()
    noisy = img.copy()
    rng = np.random.default_rng(0)
    mask = rng.random(img.shape) < 0.01
    noisy[mask] = 255 - noisy[mask]
    den = median3x3(noisy)
    assert (den != img).sum() < (noisy != img).sum() / 10


def test_resize_factor_up_down():
    import numpy as np
    from ocr_ray.functions.imageops import resize_factor

    img = np.zeros((40, 60), dtype=np.uint8)
    img[10:30, 20:40] = 200
    up = resize_factor(img, 2.0)
    assert up.shape == (80, 120)
    # the bright block scales with the image
    assert abs(float((up > 100).mean()) - float((img > 100).mean())) < 0.02
    down = resize_factor(img, 0.5)
    assert down.shape == (20, 30)
    assert resize_factor(img, 1.0) is img


def test_scaling_step_predicate_and_factor():
    import numpy as np
    from dataclasses import replace
    from ocr_ray.config import PreprocessConfig
    from ocr_ray.functions.preprocess import build_steps, preprocess_image

    # low-DPI page (small long side) with a scale-enabled config
    cfg = replace(PreprocessConfig(), scale_to_dpi=150, binarization="none",
                  auto_deskew=False, denoise=False, normalize=False)
    img = np.full((550, 400), 255, dtype=np.uint8)
    img[100:110, 50:350] = 0
    out, applied, analysis = preprocess_image(img, cfg)
    assert "scale" in applied
    # est dpi clamps to 72 -> factor min(150/72, 3.0) ~ 2.083
    assert out.shape == (1146, 833)
    # synth default keeps scaling off
    assert all(s.name != "scale" for s in build_steps(PreprocessConfig()))
