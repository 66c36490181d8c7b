"""Per-row engine routing in the OCR actor (the Ray-native form of the
reference's model switching, SURVEY §2.5 M5/M6)."""
import pyarrow as pa

from ocr_ray.stages.ocr import OcrPageExtractor
from ocr_ray.synth.media import build_image_ref
from ocr_ray.synth import textgen
import numpy as np


def _unit_batch(ref: str, engine: str | None):
    cols = {
        "doc_id": ["d"],
        "offset": pa.array([0], pa.int32()),
        "kind": ["image"],
        "media_ref": [ref],
        "unit": pa.array([0], pa.int32()),
        "total_units": pa.array([1], pa.int32()),
        "salt": pa.array([0], pa.int32()),
        "text": [""],
        "done": [False],
    }
    if engine is not None:
        cols["engine"] = [engine]
    return pa.table(cols)


def test_routing_changes_split_behavior():
    rng = np.random.default_rng(0)
    # a tall many-band image: below the default split threshold but
    # above synth-small's (0.25 MP / 700 px)
    text = textgen.make_text(rng, 8)
    ref = build_image_ref("d", 0, text, skew=0.0, noise=0.0)
    actor = OcrPageExtractor("synth", engine_names=["synth", "synth-small"])

    out_default = actor(_unit_batch(ref, None))
    out_small = actor(_unit_batch(ref, "synth-small"))
    # both decode the same payload ...
    assert out_default.column("text").to_pylist() == out_small.column("text").to_pylist()
    assert out_default.column("text")[0].as_py() == text
    # ... but the routed engine split the page while the default did not
    assert out_default.column("split_method")[0].as_py() == "none"
    assert out_small.column("split_method")[0].as_py() != "none"


def test_unknown_route_falls_back_to_default():
    rng = np.random.default_rng(1)
    text = textgen.make_text(rng, 1)
    ref = build_image_ref("d", 0, text)
    actor = OcrPageExtractor("synth")
    out = actor(_unit_batch(ref, "no-such-engine"))
    assert out.column("text")[0].as_py() == text


def test_bad_media_ref_is_tagged_not_fatal(ray_session):
    """A corrupt media_ref yields an empty-text span + error column, not
    a task failure (error-side semantics at 100TB)."""
    import ray.data
    from ocr_ray.pipelines.extraction import build_extraction

    docs = [
        {"doc_id": "ok", "spans": [
            {"kind": "text", "text": "fine", "media_ref": "", "offset": 0}]},
        {"doc_id": "bad", "spans": [
            {"kind": "image", "text": "", "media_ref": "synth://image/bad/0?t=!!!notb64", "offset": 0},
            {"kind": "text", "text": "still here", "media_ref": "", "offset": 1}]},
    ]
    out = {r["doc_id"]: r for r in build_extraction(ray.data.from_items(docs)).take_all()}
    rows = {k: v["spans"] for k, v in out.items()}
    assert rows["ok"][0]["text"] == "fine"
    assert rows["bad"][0]["text"] == ""          # failed span -> empty, tagged upstream
    assert rows["bad"][1]["text"] == "still here"  # rest of the doc survives
    # doc-level error-side observability: exact error count + weakest-link
    # confidence zeroed by the failed unit
    assert out["ok"]["n_errors"] == 0 and out["ok"]["confidence"] == 1.0
    assert out["bad"]["n_errors"] == 1 and out["bad"]["confidence"] == 0.0
