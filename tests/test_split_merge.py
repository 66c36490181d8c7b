import numpy as np

from ocr_ray.config import MergeConfig, SplitConfig, get_engine
from ocr_ray.functions.merge import (
    find_exact_overlap,
    find_fuzzy_overlap,
    merge_chunk_texts,
    strip_diacritics,
)
from ocr_ray.functions.split import grid_split, needs_splitting, projection_split, smart_split
from ocr_ray.synth import media, textgen

SPLIT = SplitConfig(max_megapixels=0.25, max_dimension=700)
MERGE = MergeConfig()


def test_needs_splitting_gates():
    assert not needs_splitting(600, 400, SPLIT)
    assert needs_splitting(800, 400, SPLIT)          # dimension
    assert needs_splitting(600, 600, SPLIT)          # megapixels


def test_projection_split_cuts_at_gaps():
    rng = np.random.default_rng(0)
    text = textgen.make_text(rng, 6)
    img = media.render_payload(text)
    assert needs_splitting(*img.shape, SPLIT)
    chunks = projection_split(img, SPLIT)
    assert chunks is not None and len(chunks) >= 2
    # provenance is consistent: offsets match slices
    for c in chunks:
        h, w = c["image"].shape
        assert np.array_equal(
            c["image"], img[c["y_offset"] : c["y_offset"] + h, c["x_offset"] : c["x_offset"] + w]
        )


def test_grid_split_overlap_bookkeeping():
    img = np.full((900, 900), 255, np.uint8)
    cfg = SplitConfig(max_megapixels=0.25, max_dimension=700, target_chunk_dim=500)
    chunks = grid_split(img, cfg)
    assert len(chunks) == 4
    c = next(ch for ch in chunks if ch["row"] == 0 and ch["col"] == 0)
    assert c["overlap_top"] == 0 and c["overlap_left"] == 0
    assert c["overlap_bottom"] > 0 and c["overlap_right"] > 0
    c3 = next(ch for ch in chunks if ch["row"] == 1 and ch["col"] == 1)
    assert c3["overlap_top"] > 0 and c3["overlap_left"] > 0
    # overlapping chunks really share pixels
    assert c["image"].shape[0] > 450 and c3["image"].shape[0] > 450


def test_smart_split_no_split_fast_path():
    img = np.full((100, 100), 255, np.uint8)
    chunks, method, was_split = smart_split(img, SPLIT)
    assert method == "none" and not was_split and len(chunks) == 1


def test_split_decode_merge_composition():
    eng = get_engine("synth-small")
    rng = np.random.default_rng(1)
    text = textgen.make_text(rng, 6)
    img = media.render_payload(text)
    chunks, method, _ = smart_split(img, eng.split)
    assert method == "projection"
    for c in chunks:
        c["text"] = "\n\n".join(media.decode_bands(c["image"]))
    assert merge_chunk_texts(chunks, eng.merge) == text


def test_merge_reading_order_ltr_rtl():
    chunks = [
        {"row": 0, "col": 1, "text": "B"},
        {"row": 1, "col": 0, "text": "C"},
        {"row": 0, "col": 0, "text": "A"},
    ]
    assert merge_chunk_texts(chunks, MergeConfig()) == "A\n\nB\n\nC"
    assert merge_chunk_texts(chunks, MergeConfig(rtl=True)) == "B\n\nA\n\nC"


def test_exact_overlap_dedup():
    cfg = MergeConfig()
    prev = "the quick brown fox jumps over the lazy dog"
    cur = "over the lazy dog and keeps running"
    k = find_exact_overlap(prev, cur, cfg)
    assert cur[:k] == "over the lazy dog"
    chunks = [
        {"row": 0, "col": 0, "text": prev, "overlap_bottom": 10},
        {"row": 1, "col": 0, "text": cur, "overlap_top": 10},
    ]
    merged = merge_chunk_texts(chunks, cfg)
    assert merged == "the quick brown fox jumps over the lazy dog and keeps running"


def test_fuzzy_overlap_dedup():
    cfg = MergeConfig()
    prev = "alpha beta gamma delta epsilon zeta eta theta"
    # one OCR-ish char error in a 5-word overlap window:
    # ratio ~0.96 >= 0.95 and 4/5 exact words >= 80%
    cur = "delta epsilon zeta etb theta iota kappa"
    k = find_fuzzy_overlap(prev, cur, cfg)
    assert cur[k:] == "iota kappa"


def test_fuzzy_overlap_rejects_dissimilar():
    cfg = MergeConfig()
    # 2/3 exact words (< 80%) and ratio < 0.95: reference thresholds reject
    assert find_fuzzy_overlap("alpha zeta eta theta", "zeta etb theta iota", cfg) == 0


def test_no_dedup_without_overlap_flags():
    cfg = MergeConfig()
    chunks = [
        {"row": 0, "col": 0, "text": "shared tail words"},
        {"row": 1, "col": 0, "text": "shared tail words again"},
    ]
    # projection cuts carry no overlap -> plain join, no dedup
    assert merge_chunk_texts(chunks, cfg) == "shared tail words\n\nshared tail words again"


def test_strip_diacritics_mapping():
    raw = "كِتَاب"
    stripped, idx = strip_diacritics(raw)
    assert stripped == "كتاب"
    assert [raw[i] for i in idx] == list(stripped)


def test_rtl_diacritic_overlap():
    cfg = MergeConfig(rtl=True)
    prev = "النص الأول كِتَاب مفيد جدا"
    cur = "كتاب مفيد جدا النص الثاني"  # same words, diacritics stripped (>=10 chars overlap)
    k = find_exact_overlap(prev, cur, cfg)
    assert k > 0 and cur[k:].strip() == "النص الثاني"


def test_component_split_finds_occupancy_gap():
    import numpy as np
    from dataclasses import replace
    from ocr_ray.config import SplitConfig
    from ocr_ray.functions.split import component_split, projection_split, smart_split

    cfg = replace(SplitConfig(), max_megapixels=0.08, max_dimension=310,
                  min_chunk_size=40, min_gap_pixels=10)
    # two dense blocks with FAINT speckle in the gap: the normalized
    # projection profile sees ink everywhere, occupancy after dilation
    # still leaves a clean free run only if speckle is sparse
    img = np.full((600, 200), 255, dtype=np.uint8)
    img[20:270, 20:180] = 0
    img[330:580, 20:180] = 0
    chunks = component_split(img, cfg)
    assert chunks is not None and len(chunks) >= 2
    ys = sorted(c["y_offset"] for c in chunks)
    assert ys[0] == 0 and 270 <= ys[1] <= 330
    out, method, was = smart_split(img, cfg)
    assert was and method in ("projection", "components")


def test_component_split_none_when_no_gap():
    import numpy as np
    from dataclasses import replace
    from ocr_ray.config import SplitConfig
    from ocr_ray.functions.split import component_split

    cfg = replace(SplitConfig(), max_megapixels=0.05, max_dimension=260)
    img = np.zeros((600, 200), dtype=np.uint8)  # solid ink, no free run
    assert component_split(img, cfg) is None


def test_analyze_and_recommend_surface():
    import pytest

    from ocr_ray.functions.split import analyze, recommend_method, split_with_method

    small = np.full((100, 100), 255, np.uint8)
    a = analyze(small, SPLIT)
    assert not a["needs_splitting"] and a["recommended_method"] is None
    assert {m["name"] for m in a["available_methods"]} == {"projection", "components", "grid"}
    assert not any(m["can_split"] for m in a["available_methods"])

    rng = np.random.default_rng(0)
    text = textgen.make_text(rng, 6)
    img = media.render_payload(text)
    a = analyze(img, SPLIT)
    assert a["needs_splitting"] and a["megapixels"] > SPLIT.max_megapixels / 2
    # recommendation agrees with what smart_split actually does
    _, method, was_split = smart_split(img, SPLIT)
    assert was_split and a["recommended_method"] == method == recommend_method(img, SPLIT)
    # grid is always available as fallback once splitting is needed
    assert [m for m in a["available_methods"] if m["name"] == "grid"][0]["can_split"]

    chunks = split_with_method(img, SPLIT, "grid")
    assert len(chunks) > 1
    with pytest.raises(ValueError, match="Unknown split method"):
        split_with_method(img, SPLIT, "nope")
