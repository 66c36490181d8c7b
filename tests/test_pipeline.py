"""Span-sequence equality of the Ray pipeline vs the pure-Python oracle
(the graft's correctness criterion), plus invariance properties."""
import numpy as np
import pytest
import ray.data

from ocr_ray.pipelines.extraction import build_extraction, run_extraction
from ocr_ray.pipelines.oracle import extract_corpus
from ocr_ray.synth.corpus import generate_docs, write_corpus

N_DOCS = 14
SEED = 7


def _span_seq(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


@pytest.fixture(scope="module")
def oracle_result():
    docs = generate_docs(N_DOCS, seed=SEED, heavy_frac=0.1).to_pylist()
    return {d["doc_id"]: _span_seq(d["spans"]) for d in extract_corpus(docs)}


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("corpus"))
    write_corpus(out, N_DOCS, seed=SEED, heavy_frac=0.1, n_files=2)
    return out


def test_pipeline_matches_oracle(ray_session, corpus_dir, oracle_result):
    rows = run_extraction(corpus_dir).take_all()
    assert len(rows) == N_DOCS
    for r in rows:
        assert _span_seq(r["spans"]) == oracle_result[r["doc_id"]], r["doc_id"]


def test_pipeline_salted_matches_oracle(ray_session, corpus_dir, oracle_result):
    """The skew escape hatch (salted partial merge, extra shuffle) must
    produce byte-identical spans to the default single-stitch path."""
    rows = run_extraction(corpus_dir, salted=True).take_all()
    for r in rows:
        assert _span_seq(r["spans"]) == oracle_result[r["doc_id"]]


def test_input_row_order_invariance(ray_session, oracle_result):
    """Stitch must re-sort by offset, not trust arrival order: feed the
    same docs reversed and block-scrambled."""
    docs = generate_docs(N_DOCS, seed=SEED, heavy_frac=0.1).to_pylist()
    rng = np.random.default_rng(0)
    rng.shuffle(docs)
    ds = ray.data.from_items(docs).repartition(5)
    rows = build_extraction(ds).take_all()
    for r in rows:
        assert _span_seq(r["spans"]) == oracle_result[r["doc_id"]]


def test_confidence_matches_oracle(ray_session, corpus_dir):
    """Doc-level confidence (min over per-unit engine scores) must agree
    between the staged path (OCR column -> premerge min -> stitch min)
    and the single-process oracle, on BOTH stitch paths."""
    docs = generate_docs(N_DOCS, seed=SEED, heavy_frac=0.1).to_pylist()
    expected = {d["doc_id"]: d["confidence"] for d in extract_corpus(docs)}
    for salted in (False, True):
        rows = run_extraction(corpus_dir, salted=salted).take_all()
        for r in rows:
            assert r["confidence"] == pytest.approx(expected[r["doc_id"]], abs=1e-9), \
                (r["doc_id"], salted)
    # media-bearing docs must have sub-1.0 confidence, text-only 1.0
    kinds = {d["doc_id"]: {s["kind"] for s in d["spans"]} for d in docs}
    for did, conf in expected.items():
        if kinds[did] <= {"text", "html"}:
            assert conf == 1.0
        else:
            assert conf < 1.0


def test_rerun_deterministic(ray_session, corpus_dir):
    a = {r["doc_id"]: _span_seq(r["spans"]) for r in run_extraction(corpus_dir).take_all()}
    b = {r["doc_id"]: _span_seq(r["spans"]) for r in run_extraction(corpus_dir).take_all()}
    assert a == b


def test_salt_auto_probe(corpus_dir):
    """salt_premerge="auto" samples the corpus: the default synthetic
    corpus (heavy docs cap at 80 pages) stays on the cheap path; the
    probe reports the true max unit count so a pathological corpus
    (> salt_auto_units pages) would flip it on."""
    from ocr_ray.pipelines.extraction import _sample_max_units

    mx = _sample_max_units(corpus_dir)
    assert 1 <= mx <= 80
    from ocr_ray.config import PipelineConfig

    assert mx <= PipelineConfig().salt_auto_units  # default corpus: unsalted
    # unreadable path -> probe degrades to 1, never raises
    assert _sample_max_units("/tmp/does-not-exist-xyz") == 1


def test_pipeline_matches_oracle_wider(ray_session, tmp_path):
    """Span-sequence equality at ~10x the base fixture (120 docs, 10%
    heavy multi-page, 8 files) — wide enough that every engine kind
    path, the pdf fan-out, block boundaries and multi-file reads are
    all exercised against the single-process oracle."""
    n = 120
    docs = generate_docs(n, seed=31, heavy_frac=0.1).to_pylist()
    expected = {d["doc_id"]: _span_seq(d["spans"]) for d in extract_corpus(docs)}
    corpus = str(tmp_path / "in")
    write_corpus(corpus, n, seed=31, heavy_frac=0.1, n_files=8)
    rows = run_extraction(corpus).take_all()
    assert len(rows) == n
    got = {r["doc_id"]: _span_seq(r["spans"]) for r in rows}
    assert got == expected
