"""Product quantization: reconstruction quality, ADC recall, and
distributed-trainer == local-trainer equality (the same old-vs-new
pinning used for the IVF coarse quantizer)."""
import numpy as np
import pandas as pd
import pytest

from ocr_ray.functions import pq


def _clustered_vectors(n=400, dim=64, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((10, dim)) * 3
    v = centers[rng.integers(0, 10, n)] + rng.standard_normal((n, dim)) * 0.3
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_roundtrip_beats_untrained_and_compresses():
    v = _clustered_vectors()
    cb = pq.pq_train(v, m=8, k=16, iters=8)
    codes = pq.pq_encode(v, cb)
    assert codes.shape == (len(v), 8) and codes.dtype == np.uint8
    trained_err = float(np.mean((pq.pq_decode(codes, cb) - v) ** 2))
    cb0 = pq._init_codebooks(v, 8, 16, seed=13)  # untrained (init only)
    err0 = float(np.mean((pq.pq_decode(pq.pq_encode(v, cb0), cb0) - v) ** 2))
    assert trained_err < err0  # Lloyd iterations reduce distortion
    # 64 float64 -> 8 bytes/vector: 64x compression
    assert codes.nbytes * 64 == v.nbytes


def test_adc_topk_recall_vs_exact():
    """Standard PQ eval, recall@R: the exact top-10 must appear in the
    ADC top-50 (coded search shortlists, an exact rerank would finish —
    the IVF-PQ pipeline shape)."""
    v = _clustered_vectors(seed=3)
    cb = pq.pq_train(v, m=16, k=32, iters=8)
    codes = pq.pq_encode(v, cb)
    recalls = []
    for qi in range(8):
        exact = set(np.argsort(-(v @ v[qi]))[:10])
        shortlist = set(np.argsort(-pq.pq_adc_scores(v[qi], codes, cb))[:50])
        recalls.append(len(exact & shortlist) / 10)
    assert sum(recalls) / len(recalls) >= 0.9


def test_encode_deterministic_and_decode_shape():
    v = _clustered_vectors(seed=5)
    cb = pq.pq_train(v, m=4, k=8, iters=4)
    a, b = pq.pq_encode(v, cb), pq.pq_encode(v, cb)
    assert np.array_equal(a, b)
    assert pq.pq_decode(a, cb).shape == v.shape


def test_distributed_trainer_matches_local(ray_session):
    import ray.data

    v = _clustered_vectors(n=300, seed=9)
    init = pq._init_codebooks(v, 8, 16, seed=13)
    local = pq.pq_train(v, m=8, k=16, iters=4, seed=13)
    df = pd.DataFrame({"vec_id": np.arange(len(v)), "embedding": list(v)})
    # multiple blocks so the partial-sum combine path is real
    ds = ray.data.from_pandas([df.iloc[i::3].reset_index(drop=True) for i in range(3)])
    dist = pq.pq_train_distributed(ds, m=8, k=16, iters=4, init=init)
    # same init + same update math -> same codebooks (partial sums are
    # per-(subspace, code) so only benign float-summation order differs)
    assert np.allclose(local, dist, atol=1e-9)
    assert np.array_equal(pq.pq_encode(v, local), pq.pq_encode(v, dist))


def test_validation_errors():
    v = _clustered_vectors(n=20)
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_train(v, m=7)
    with pytest.raises(ValueError, match=">= k"):
        pq.pq_train(v[:4], m=8, k=16)


def test_pq_encode_as_ray_stage(ray_session):
    """The index-build shape at corpus scale: codebooks broadcast once
    via ray.put, encoding a vectorized map_batches stage emitting
    (vec_id, code bytes) — the full float column never leaves the
    cluster, the driver receives only uint8 codes."""
    import ray
    import ray.data

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    head = np.stack(ds.limit(128).to_pandas()["embedding"].to_numpy())
    head = head / np.linalg.norm(head, axis=1, keepdims=True)
    cb = pq.pq_train(head, m=8, k=16, iters=4)
    ref = ray.put(cb)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(ref)
        v = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        v = v / np.linalg.norm(v, axis=1, keepdims=True)
        return pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "code": [row.tobytes() for row in pq.pq_encode(v, c)],
        })

    out = ds.map_batches(encode, batch_format="pandas").to_pandas()
    assert len(out) == ds.count()
    assert all(len(b) == 8 for b in out["code"])  # 8 B per vector
    out2 = ds.map_batches(encode, batch_format="pandas").to_pandas()
    a = out.sort_values("vec_id").reset_index(drop=True)
    b = out2.sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivfpq_composition_recall():
    """The billion-scale index recipe (Jegou et al. IVFADC): coarse
    k-means lists + PQ codes of the RESIDUAL (v - centroid), queried by
    probing nprobe lists and ADC-scoring residual codes against the
    query residual. Must beat plain-PQ shortlist quality at the same
    8 B/vector budget and recall the exact top-10 in its shortlist."""
    v = _clustered_vectors(n=600, seed=11)
    rng = np.random.default_rng(2)
    nlist, nprobe = 8, 3
    cent = v[rng.choice(len(v), nlist, replace=False)].copy()
    for _ in range(6):
        assign = np.argmax(v @ cent.T, axis=1)
        for c in range(nlist):
            sel = v[assign == c]
            if len(sel):
                cent[c] = sel.mean(axis=0) / np.linalg.norm(sel.mean(axis=0))
    assign = np.argmax(v @ cent.T, axis=1)
    resid = v - cent[assign]
    cb = pq.pq_train(resid, m=8, k=16, iters=8)
    codes = pq.pq_encode(resid, cb)

    recalls = []
    for qi in range(8):
        q = v[qi]
        lists = np.argsort(-(cent @ q))[:nprobe]
        cand = np.nonzero(np.isin(assign, lists))[0]
        # score = q.centroid (exact per list) + q.residual_code (ADC)
        scores = (cent[assign[cand]] @ q) + pq.pq_adc_scores(q, codes[cand], cb)
        shortlist = set(cand[np.argsort(-scores)[:50]])
        exact = set(np.argsort(-(v @ q))[:10])
        # only neighbors inside probed lists are reachable — measure
        # recall of the reachable exact top-10 (coarse-probe loss is
        # the IVF tradeoff, scored separately in test_knn_ivf_recall)
        reachable = exact & set(cand)
        if reachable:
            recalls.append(len(reachable & shortlist) / len(reachable))
    assert recalls and sum(recalls) / len(recalls) >= 0.9
    assert codes.nbytes == len(v) * 8  # 8 B/vector at m=8


def test_k_over_256_refused():
    """Codes are uint8: k>256 must raise at train/encode time, never
    silently wrap 256->0 into corrupt codes."""
    v = _clustered_vectors(n=300, seed=11)
    with pytest.raises(ValueError, match="256"):
        pq.pq_train(v, m=8, k=300)
    cb_bad = np.zeros((4, 300, 16))
    with pytest.raises(ValueError, match="256"):
        pq.pq_encode(np.zeros((5, 64)), cb_bad)


def test_build_and_load_pq_index_roundtrip(ray_session, tmp_path):
    """build_pq_index writes the codes table + codebook sidecar as a
    dataset job; load_pq_index streams the codes back and ADC scoring
    over the ON-DISK codes must equal scoring over a fresh in-memory
    encode (the index is the artifact, not a cache of driver state)."""
    import ray
    import ray.data

    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    out = str(tmp_path / "pq_index")
    cb = pq.build_pq_index(ds, out, m=8, k=16, iters=4)

    cb2, codes_ds, meta = pq.load_pq_index(out)
    np.testing.assert_array_equal(cb, cb2)
    assert meta["normalize"] is True and meta["id_col"] == "vec_id"
    assert (meta["m"], meta["k"]) == (8, 16)
    codes_df = codes_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert len(codes_df) == ds.count()
    codes = np.stack([np.frombuffer(b, dtype=np.uint8) for b in codes_df["code"]])

    full = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    v = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    np.testing.assert_array_equal(codes, pq.pq_encode(v, cb))

    q = v[3]
    disk_scores = pq.pq_adc_scores(q, codes, cb2)
    mem_scores = pq.pq_adc_scores(q, pq.pq_encode(v, cb), cb)
    np.testing.assert_allclose(disk_scores, mem_scores)
    # ADC over 8 B/vector codes still finds the true neighborhood
    exact_top = set(np.argsort(-(v @ q))[:10])
    adc_top = set(np.argsort(-disk_scores)[:50])
    assert len(exact_top & adc_top) / 10 >= 0.5


def test_build_pq_index_trains_on_encoded_representation(ray_session, tmp_path):
    """normalize=True must train codebooks on NORMALIZED vectors (the
    representation encode() uses): training on raw scale-50 vectors and
    encoding unit vectors collapses the index into a couple of codes."""
    import pandas as pd
    import ray.data

    rng = np.random.default_rng(5)
    v = rng.standard_normal((600, 64)) * 50.0  # decidedly non-unit-norm
    ds = ray.data.from_pandas(pd.DataFrame(
        {"vec_id": np.arange(600, dtype=np.int64), "embedding": list(v)}))
    out = str(tmp_path / "pq_nonunit")
    cb = pq.build_pq_index(ds, out, m=8, k=16, iters=4)

    _, codes_ds, _ = pq.load_pq_index(out)
    codes_df = codes_ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    codes = np.stack([np.frombuffer(b, dtype=np.uint8) for b in codes_df["code"]])
    # a healthy codebook uses most of the k=16 code space per subspace
    assert all(len(np.unique(codes[:, j])) >= 8 for j in range(codes.shape[1]))
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    q = vn[7]
    adc = pq.pq_adc_scores(q, codes, cb)
    exact_top = set(np.argsort(-(vn @ q))[:10])
    adc_top = set(np.argsort(-adc)[:50])
    assert len(exact_top & adc_top) / 10 >= 0.5


def test_build_pq_index_rebuild_replaces_stale_codes(ray_session, tmp_path):
    """Rebuilding into the same output_dir must REPLACE the codes table
    (write_parquet uses unique file names; merging stale files would
    silently double the index on load)."""
    import ray.data

    src = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(src, columns=["vec_id", "embedding"])
    out = str(tmp_path / "pq_rebuild")
    pq.build_pq_index(ds, out, m=8, k=16, iters=2)
    pq.build_pq_index(ds, out, m=8, k=16, iters=4)  # rebuild, same dir
    _, codes_ds, _ = pq.load_pq_index(out)
    df = codes_ds.to_pandas()
    assert len(df) == ds.count()
    assert df["vec_id"].is_unique
