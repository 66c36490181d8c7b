"""Property-based tests (hypothesis) for the pure kernels the engine's
correctness rests on: hashing invariants, merge overlap laws, HTML
stripper robustness, validation total-ness. These guard the math under
inputs the example-based tests never enumerate."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_ray.functions import hashing as H
from ocr_ray.functions.html import strip_boilerplate
from ocr_ray.functions.merge import find_exact_overlap, strip_diacritics
from ocr_ray.sources.validate import sanitize_filename, sniff_type

TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=400
)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_jaccard_identity_and_bounds(t):
    h = H.shingle_hashes(t)
    assert H.jaccard(h, h) == 1.0
    other = H.shingle_hashes(t + " zzyzx extension tail")
    j = H.jaccard(h, other)
    assert 0.0 <= j <= 1.0


@settings(max_examples=60, deadline=None)
@given(TEXT, TEXT)
def test_jaccard_symmetric(a, b):
    ha, hb = H.shingle_hashes(a), H.shingle_hashes(b)
    assert H.jaccard(ha, hb) == H.jaccard(hb, ha)


@settings(max_examples=40, deadline=None)
@given(TEXT)
def test_minhash_signature_deterministic_and_shaped(t):
    h = H.shingle_hashes(t)
    s1, s2 = H.minhash_signature(h), H.minhash_signature(h)
    assert np.array_equal(s1, s2)
    assert s1.dtype == np.uint64 and s1.shape == (64,)
    # every signature entry is below the Mersenne modulus
    assert (s1 <= np.uint64((1 << 61) - 1)).all()


@settings(max_examples=40, deadline=None)
@given(st.lists(TEXT, max_size=8))
def test_simhash_batch_matches_single(texts):
    batch = H.simhash64_batch(texts)
    singles = np.array([H.simhash64(t) for t in texts], dtype=np.uint64)
    assert np.array_equal(batch, singles)


@settings(max_examples=60, deadline=None)
@given(TEXT, TEXT)
def test_exact_overlap_is_real_overlap(a, b):
    """find_exact_overlap(a, b) = k implies the diacritic-normalized
    500-char suffix window of a ends with the normalized form of b[:k]
    (the overlap is measured in raw chars of b, matched normalized)."""
    from ocr_ray.config import MergeConfig

    cfg = MergeConfig()
    k = find_exact_overlap(a, b, cfg)
    assert 0 <= k <= len(b)
    if k:
        prev_n, _ = strip_diacritics(a[-500:])
        cur_k_n, _ = strip_diacritics(b[:k])
        assert cur_k_n and prev_n.endswith(cur_k_n)


@settings(max_examples=60, deadline=None)
@given(TEXT)
def test_strip_diacritics_length_mapping(t):
    stripped, mapping = strip_diacritics(t)
    # mapping sends every stripped position to a valid original index
    assert len(mapping) == len(stripped)
    assert all(0 <= m < max(1, len(t)) for m in mapping)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=600))
def test_strip_boilerplate_total_and_idempotent_on_plain_text(t):
    """The stripper never raises, and text with no tags that survives
    one pass survives a second pass unchanged (idempotence on its own
    output when tag-free)."""
    out = strip_boilerplate(t)
    assert isinstance(out, str)
    if "<" not in out and ">" not in out:
        assert strip_boilerplate(out) in ("", out)


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=64))
def test_sniff_type_total(payload):
    t = sniff_type(payload)
    assert t is None or isinstance(t, str)


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=300))
def test_sanitize_filename_never_traverses(name):
    out = sanitize_filename(name)
    if out is not None:
        assert "/" not in out and "\\" not in out
        assert ".." not in out and not out.startswith(".")
        assert 0 < len(out) <= 255


@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                        max_size=40), min_size=1, max_size=30))
def test_crc32_batch_equals_zlib(ids):
    import zlib

    import numpy as np

    from ocr_ray.state.checkpoint import crc32_batch

    got = crc32_batch(np.array(ids, dtype=object))
    want = np.array([zlib.crc32(s.encode()) for s in ids], dtype=np.uint32)
    assert np.array_equal(got, want)


@given(st.permutations(list(range(6))))
@settings(max_examples=25, deadline=None)
def test_stitch_permutation_invariant(perm):
    """The per-doc stitch re-establishes order from carried provenance
    (offset, unit) regardless of how the shuffle delivered the rows —
    the §4.3 no-preserve_order contract, tested directly."""
    import pyarrow as pa

    from ocr_ray.config import get_engine
    from ocr_ray.stages.stitch import make_doc_stitch

    rows = [
        # two pdf pages at offset 0, then text/html/image spans
        {"doc_id": "d", "offset": 0, "kind": "pdf", "media_ref": "r0",
         "unit": 1, "text": "page one", "confidence": 0.9, "error": ""},
        {"doc_id": "d", "offset": 0, "kind": "pdf", "media_ref": "r0",
         "unit": 2, "text": "page two", "confidence": 0.8, "error": ""},
        {"doc_id": "d", "offset": 1, "kind": "text", "media_ref": "",
         "unit": 0, "text": "mid", "confidence": 1.0, "error": ""},
        {"doc_id": "d", "offset": 2, "kind": "html", "media_ref": "",
         "unit": 0, "text": "stripped", "confidence": 1.0, "error": ""},
        {"doc_id": "d", "offset": 3, "kind": "image", "media_ref": "ri",
         "unit": 0, "text": "ocr'd", "confidence": 0.7, "error": "X: boom"},
        {"doc_id": "d", "offset": 4, "kind": "text", "media_ref": "",
         "unit": 0, "text": "tail", "confidence": 1.0, "error": ""},
    ]
    stitch = make_doc_stitch(get_engine("synth"))
    base = stitch(pa.Table.from_pylist(rows)).to_pylist()[0]
    got = stitch(pa.Table.from_pylist([rows[i] for i in perm])).to_pylist()[0]
    assert got == base
    assert [s["offset"] for s in base["spans"]] == [0, 1, 2, 3, 4]
    assert base["confidence"] == 0.7 and base["n_errors"] == 1


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_token_frame_matches_naive_split(texts):
    """The vectorized explode kernel behind corpus_familiarity /
    vocab_growth must equal the naive per-doc str.split() expansion,
    preserving occurrence multiplicity and doc attribution."""
    import pandas as pd
    from ocr_ray.queries import _token_frame

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = _token_frame(df)
    want = [(i, w) for i, t in enumerate(texts) for w in t.lower().split()]
    assert list(zip(got["doc_id"], got["token"])) == want


@settings(max_examples=60, deadline=None)
@given(st.lists(TEXT, min_size=1, max_size=6))
def test_trigram_frame_matches_naive_shingles(texts):
    """The explode+shift 3-gram kernel behind decontamination /
    ngram_novelty must equal the naive distinct shingle set per doc."""
    import pandas as pd
    from ocr_ray.queries import _trigram_frame

    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    tf = _trigram_frame(df)
    got = set(zip(tf["doc_id"], tf["gram"]))
    want = set()
    for i, t in enumerate(texts):
        toks = t.lower().split()
        for j in range(len(toks) - 2):
            want.add((i, " ".join(toks[j:j + 3])))
    assert got == want
