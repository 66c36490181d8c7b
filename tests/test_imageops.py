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
