import numpy as np

from ocr_ray.functions import hashing as H


def test_shingles_and_jaccard():
    a = H.shingle_hashes("the quick brown fox jumps over the lazy dog")
    b = H.shingle_hashes("the quick brown fox jumped over the lazy dog")
    c = H.shingle_hashes("completely different content here")
    assert H.jaccard(a, a) == 1.0
    assert H.jaccard(a, b) > 0.6
    assert H.jaccard(a, c) < 0.1


def test_minhash_estimates_jaccard():
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(60)]
    t1 = " ".join(words)
    t2 = " ".join(words[:48] + [f"x{i}" for i in range(12)])  # ~high overlap
    h1, h2 = H.shingle_hashes(t1), H.shingle_hashes(t2)
    true_j = H.jaccard(h1, h2)
    s1, s2 = H.minhash_signature(h1), H.minhash_signature(h2)
    est = (s1 == s2).mean()
    assert abs(est - true_j) < 0.2
    _ = rng


def test_band_keys_collide_for_near_dups():
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    s1 = H.minhash_signature(H.shingle_hashes(t))
    s2 = H.minhash_signature(H.shingle_hashes(t + " tail"))
    assert set(H.band_keys(s1)) & set(H.band_keys(s2))
    far = H.minhash_signature(H.shingle_hashes("something else entirely unrelated"))
    assert not set(H.band_keys(s1)) & set(H.band_keys(far))


def test_simhash_locality():
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    a = H.simhash64(t)
    b = H.simhash64(t.replace("kappa", "kappb"))
    c = H.simhash64("totally unrelated words like quartz marble onyx")
    assert H.hamming64(a, b) < H.hamming64(a, c)
    assert H.hamming64(a, a) == 0


def test_winnow_deterministic_and_contained():
    t = "the quick brown fox jumps over the lazy dog near the river bank"
    f1 = H.winnow_fingerprints(t)
    f2 = H.winnow_fingerprints(t)
    assert np.array_equal(f1, f2)
    # fingerprints of a superstring share most of the substring's prints
    f3 = H.winnow_fingerprints(t + " and keeps going onward")
    shared = np.intersect1d(f1, f3).size
    assert shared >= f1.size * 0.7


def test_hll_accuracy_and_merge():
    import numpy as np
    from ocr_ray.functions import hashing as H

    rng = np.random.default_rng(3)
    vals = np.unique(rng.integers(0, 2**63, 30000, dtype=np.uint64))
    # batched registers merged with max == one-shot registers
    one = H.hll_registers(vals)
    merged = np.zeros(4096, dtype=np.uint8)
    for chunk in np.array_split(vals, 11):
        merged = H.hll_merge(merged, H.hll_registers(chunk))
    assert np.array_equal(one, merged)
    est = H.hll_estimate(merged)
    assert abs(est - len(vals)) / len(vals) < 0.05


def test_hll_query_vs_exact(ray_session):
    import duckdb
    from ocr_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    out = Q.QUERIES["approx_distinct_orderkeys"](sf)
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchone()[0]
    # the query's bucketed exact count must equal SQL exactly, and the
    # HLL estimate must sit inside its published tolerance (the query
    # asserts that itself via the within_tol column)
    assert int(out["exact_distinct"].iloc[0]) == exact
    assert bool(out["within_tol"].iloc[0])


def test_batch_minhash_matches_per_doc():
    """The reduceat batch kernel must agree bit-for-bit with the
    per-doc signature (same universal hash family), including the
    all-sentinel signature for empty shingle sets."""
    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "", "abc", "another document with different content entirely",
             "the quick brown fox jumps over the lazy dog tail " * 3]
    arrays = [H.shingle_hashes(t) for t in texts]
    batch = H.minhash_signatures_batch(arrays)
    for i, a in enumerate(arrays):
        assert (batch[i] == H.minhash_signature(a)).all()


def test_batch_band_keys_same_collision_structure():
    """band_keys_batch is a different band hash than band_keys (crc32
    vs polymix) but must induce the same collisions: equal band chunks
    -> equal keys, near-dup docs collide on >=1 band, unrelated docs on
    none, and band indices never cross-collide."""
    t = "the quick brown fox jumps over the lazy dog " * 3
    sigs = np.vstack([
        H.minhash_signature(H.shingle_hashes(t)),
        H.minhash_signature(H.shingle_hashes(t + " tail")),
        H.minhash_signature(H.shingle_hashes("something else entirely unrelated")),
    ])
    k = H.band_keys_batch(sigs)
    assert k.shape == (3, 16) and k.dtype == np.int64
    assert (set(k[0]) & set(k[1]))          # near-dups collide
    assert not (set(k[0]) & set(k[2]))      # unrelated don't
    assert ((k >> 32) == np.arange(16)[None, :]).all()  # band in top bits
    # identical signatures -> identical keys
    assert (H.band_keys_batch(sigs[:1]) == k[0]).all()
