"""Driver-contract conformance at sf0.001: Ray query vs DuckDB oracle
(the same comparison CORRECTNESS_r{N}.json records at sf0.01)."""
import duckdb
import os

import numpy as np
import pandas as pd
import pytest
import ray.data

from ocr_ray import queries as Q

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fast, representative subset (full catalog is checked by the driver)
SUBSET = [
    "pricing_summary",
    "revenue_topk",
    "order_priority_revenue",
    "mktsegment_stats",
    "dedup_exact",
    "text_quality",
    "knn_bruteforce",
    "knn_lsh",
    "knn_ivf",
    "knn_ivfpq",
    "embedding_similar_pairs",
    "asof_last_order",
    "range_join_events",
    "dedup_clusters",
    "party_nation_counts",
    "top_orders",
    "pdf_metadata",
    "customers_no_orders",
    "top_orders_per_segment",
    "median_prices",
    "top_tokens",
    "dedup_keep_best",
    "ingest_validation",
    "session_stats",
    "customer_highvalue_counts",
    "dataset_splits",
    "rare_token_postings",
    "shipping_priority",
    "sliding_user_windows",
    "value_hour_corr",
    "price_stddev_by_priority",
    "price_histogram",
    "user_event_gaps",
    "ranked_orders",
    "cumulative_revenue",
    "rollup_revenue",
    "pivot_priority_by_segment",
    "props_field_stats",
    "orders_stratified_sample",
    "tfidf_top_terms",
    "profile_orders",
    "event_funnel",
    "nation_spend_outliers",
    "lost_customers",
    "nation_top_suppliers",
    "group_percentiles",
    "pagerank",
    "price_quartile_stats",
    "monthly_revenue_growth",
    "local_supplier_revenue",
    "label_centroids",
    "corpus_prep",
    "event_minute_gaps",
    "segment_revenue_share",
    "corpus_familiarity",
    "vocab_growth",
    "ngram_novelty",
    "snapshot_diff",
    "retention_cohorts",
    "conversion_attribution",
    "source_hash_sample",
    "chunk_windows",
    "source_token_jaccard",
    "token_pmi",
    "curriculum_buckets",
    "prefix_dups",
    "event_transitions",
    "bigram_familiarity",
    "segment_dedup",
    "pareto_orders",
    "mad_outliers",
    "event_burst_dedup",
    "rfm_segments",
    "event_sequences",
    "extraction_html_tables",
    "weighted_median",
    "extraction_reading_order",
    "distribution_drift",
    "basket_pairs",
    "user_mode_event",
    "repeat_customers",
    "price_quantity_hist2d",
    "fuzzy_name_matches",
    "user_longest_streak",
    "cms_token_counts",
    "order_count_distribution",
    "price_median_cont",
    "cube_revenue",
    "corr_matrix",
    "benford_digits",
    "gini_by_priority",
    "global_rank",
    "independence_stats",
    "table_checksum",
    "trimmed_mean",
    "doc_keywords",
    "column_entropy",
    "price_psi",
    "pattern_screen",
    "fk_integrity",
    "bm25_search",
    "triangle_count",
    "zipf_slope",
    "weighted_sample",
    "coverage_selection",
    "kcore",
    "price_trend_ols",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _norm(df):
    if isinstance(df, ray.data.Dataset):
        df = df.to_pandas()
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(ray_session, con, name):
    mine = _norm(Q.QUERIES[name](SF))
    orc = _norm(con.execute(Q.ORACLE_SQL[name]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False, rtol=1e-9, atol=1e-9)


def test_former_rows_only_queries_now_oracle_checked(ray_session, con):
    """fingerprints / dedup_minhash / dedup_simhash graduated from
    rows-only to hard SQL rows in round 5 — pin them against their
    oracles here too (the driver gate also does, at sf0.01)."""
    for name in ["fingerprints", "dedup_minhash", "dedup_simhash"]:
        mine = _norm(Q.QUERIES[name](SF))
        orc = _norm(con.execute(Q.ORACLE_SQL[name]).df())
        pd.testing.assert_frame_equal(mine, orc, check_dtype=False,
                                      rtol=1e-9, atol=1e-9)


def test_knn_ivf_recall_vs_bruteforce(ray_session):
    bf = Q.QUERIES["knn_bruteforce"](SF)
    ann = Q._knn_ivf_ann(SF)
    bf_sets = bf.groupby("qid")["vec_id"].apply(set)
    ann_sets = ann.groupby("qid")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & ann_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5  # nprobe=3 of nlist=8


def test_dedup_ngram_finds_planted_pair(ray_session):
    # sf0.001 documents contain exact/near duplicate pairs by
    # construction; the blocked n-gram scan must agree with minhash on
    # the high-jaccard ones that share source + length bucket
    ng = Q.QUERIES["dedup_ngram"](SF)
    assert set(ng.columns) == {"a", "b", "jaccard"}
    assert (ng["jaccard"] >= 0.3).all()
    mh = Q.QUERIES["dedup_minhash"](SF)
    if len(mh):
        strong = set(map(tuple, mh[mh["jaccard"] >= 0.9][["a", "b"]].to_numpy()))
        found = set(map(tuple, ng[["a", "b"]].to_numpy()))
        # every very-strong near-dup pair has near-equal length, so
        # blocking cannot split it
        assert strong <= found or len(strong) == 0


def test_multimodal_queries_deterministic(ray_session):
    a = Q.q_multimodal_image_stats(SF)
    b = Q.q_multimodal_image_stats(SF)
    pd.testing.assert_frame_equal(a, b)
    fs = Q.q_multimodal_frame_sample(SF)
    assert fs["frame_idx"].isin([0, 4]).all()
    assert len(fs) == 2 * len(a)


def _emb_all(sf):
    import pyarrow.parquet as pq
    df = pq.read_table(f"{sf}/embeddings.parquet").to_pandas()
    import numpy as np
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def test_knn_lsh_matches_driver_side_reference(ray_session):
    """The distributed LSH must return the exact rows of the (round-1)
    driver-local algorithm: same planes, same probes, same tie-break."""
    import numpy as np
    rng = np.random.default_rng(1234)
    planes = rng.standard_normal((8, 8, 64))
    ids_all, normed = _emb_all(SF)
    qmask = ids_all < 8
    qids, qmat = ids_all[qmask], normed[qmask]

    def bucket(m):
        bits = np.einsum("tpd,nd->ntp", planes, m) > 0
        return (bits << np.arange(8)).sum(axis=2)

    data_b, q_b = bucket(normed), bucket(qmat)
    masks = np.concatenate([[0], 1 << np.arange(8)])
    rows = []
    for qi, qid in enumerate(qids):
        probes = q_b[qi][None, :] ^ masks[:, None]
        cand = np.nonzero((data_b[:, None, :] == probes[None, :, :]).any(axis=(1, 2)))[0]
        sims = normed[cand] @ qmat[qi]
        order = np.lexsort((ids_all[cand], -np.round(sims, 9)))[:5]
        for rank, o in enumerate(order, 1):
            rows.append((int(qid), int(ids_all[cand[o]]), rank))
    expected = pd.DataFrame(rows, columns=["qid", "vec_id", "rank"])
    got = Q._knn_lsh_ann(SF)
    pd.testing.assert_frame_equal(_norm(got), _norm(expected), check_dtype=False)


def test_knn_ivf_matches_driver_side_reference(ray_session):
    """The distributed IVF (k-means via map_batches partial sums) must
    reproduce the round-1 driver-local k-means + probe + rerank rows."""
    import numpy as np
    ids_all, normed = _emb_all(SF)
    nlist, nprobe = 8, 3
    rng = np.random.default_rng(7)
    cent = normed[rng.choice(len(normed), nlist, replace=False)].copy()
    for _ in range(5):
        assign = np.argmax(normed @ cent.T, axis=1)
        for c in range(nlist):
            sel = normed[assign == c]
            if len(sel):
                v = sel.mean(axis=0)
                cent[c] = v / np.linalg.norm(v)
    assign = np.argmax(normed @ cent.T, axis=1)
    qmask = ids_all < 8
    qids, qmat = ids_all[qmask], normed[qmask]
    rows = []
    for qi, qid in enumerate(qids):
        lists = np.argsort(-(cent @ qmat[qi]))[:nprobe]
        cand = np.nonzero(np.isin(assign, lists))[0]
        sims = normed[cand] @ qmat[qi]
        order = np.lexsort((ids_all[cand], -np.round(sims, 9)))[:5]
        for rank, o in enumerate(order, 1):
            rows.append((int(qid), int(ids_all[cand[o]]), rank))
    expected = pd.DataFrame(rows, columns=["qid", "vec_id", "rank"])
    got = Q._knn_ivf_ann(SF)
    pd.testing.assert_frame_equal(_norm(got), _norm(expected), check_dtype=False)


def test_knn_lsh_recall_vs_bruteforce(ray_session):
    bf = Q.QUERIES["knn_bruteforce"](SF)
    ann = Q._knn_lsh_ann(SF)
    bf_sets = bf.groupby("qid")["vec_id"].apply(set)
    ann_sets = ann.groupby("qid")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & ann_sets.get(q, set())) / len(bf_sets[q]) for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5  # multi-probe LSH on 64-dim


def test_lsh_pairs_subset_and_planted_recall(ray_session):
    import numpy as np

    from ocr_ray.queries import _lsh_similar_pairs

    # subset property on real testdata: every LSH pair is a true pair.
    # The merged query gates this in-query (raising on violation) and
    # surfaces it as the lsh_subset_ok column
    exact = Q.QUERIES["embedding_similar_pairs"](SF)
    assert exact["lsh_subset_ok"].all()
    exact_set = set(map(tuple, exact[["a", "b"]].to_numpy()))
    lsh = _lsh_similar_pairs(
        ray.data.read_parquet(f"{SF}/embeddings.parquet",
                              columns=["vec_id", "embedding"]),
        threshold=0.32)
    lsh_set = set(map(tuple, lsh[["a", "b"]].to_numpy()))
    assert lsh_set <= exact_set

    # planted high-cos near-dups must be recalled (cos>=0.95 pairs
    # collide in >=1 of the 6 tables with ~99% probability each)
    rng = np.random.default_rng(5)
    base = rng.standard_normal((100, 64))
    planted = []
    for i in range(8):
        j = 100 + i
        dup = base[i] + 0.05 * rng.standard_normal(64)  # cos ~ 0.999
        base = np.vstack([base, dup[None, :]])
        planted.append((i, j))
    df = pd.DataFrame({"vec_id": np.arange(len(base), dtype=np.int64),
                       "embedding": list(base)})
    ds = ray.data.from_pandas(df)
    pairs = _lsh_similar_pairs(ds, threshold=0.9)
    found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
    recall = len(found & set(planted)) / len(planted)
    assert recall >= 0.75, (recall, found)


def test_large_part_items_guard_paths_agree(ray_session):
    """The broadcast-budget guard: forcing the bucketed semi-join
    fallback (budget=1 key) must produce the identical result as the
    broadcast path."""
    from ocr_ray.queries import q_large_part_items

    a = q_large_part_items(SF)
    b = q_large_part_items(SF, _broadcast_max=1)
    pd.testing.assert_frame_equal(a, b)


def test_mktsegment_guard_paths_agree(ray_session):
    """Over-budget customer dim must route through the bucketed join
    and produce exactly the broadcast path's result."""
    from ocr_ray.queries import q_mktsegment_stats

    a = q_mktsegment_stats(SF)
    b = q_mktsegment_stats(SF, _broadcast_max=1)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_local_supplier_guard_paths_agree(ray_session):
    """Over-budget supplier dim must route through the suppkey-bucketed
    join and produce exactly the broadcast path's result (including the
    exact integer micro-dollar revenue)."""
    from ocr_ray.queries import q_local_supplier_revenue

    a = q_local_supplier_revenue(SF)
    b = q_local_supplier_revenue(SF, _broadcast_max=1)
    pd.testing.assert_frame_equal(a, b)


def test_exact_shingle_pairs_match_string_bruteforce(ray_session):
    """The banded-matmul exact join must equal an independent
    brute-force over STRING 5-gram sets (no banding, no hashing):
    proves both the log2-band coverage argument and that 64-bit gram
    hashing is collision-free on this corpus (hash-set counts == string
    set counts, so jaccard values are bit-identical)."""
    import numpy as np

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    got = Q._exact_shingle_pairs(docs, t=0.5)

    import pyarrow.parquet as pq
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = np.array(t.column("doc_id").to_pylist(), dtype=np.int64)
    texts = t.column("text").to_pylist()

    def grams(s):
        tt = " ".join(s.lower().split())
        return {tt[i:i + 5] for i in range(len(tt) - 4)} if len(tt) >= 5 else set()

    gs = [grams(s) for s in texts]
    rows = []
    for i in range(len(gs)):
        if not gs[i]:
            continue
        for j in range(i + 1, len(gs)):
            if not gs[j]:
                continue
            u = len(gs[i] | gs[j])
            jac = len(gs[i] & gs[j]) / u
            if jac >= 0.5:
                a, b = int(ids[i]), int(ids[j])
                rows.append((min(a, b), max(a, b), jac))
    bf = pd.DataFrame(rows, columns=["a", "b", "jaccard"]) \
        .sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), bf)


def test_exact_shingle_pairs_gramless_corpus_typed_empty(ray_session):
    """A corpus where every text normalizes to <5 chars produces ZERO
    band rows; the kernel must return a typed empty (a, b, jaccard)
    frame, not KeyError on the schema-less map_groups result."""
    docs = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(["ab", "c d", " ", ""])]
    )
    out = Q._exact_shingle_pairs(docs, t=0.5)
    assert list(out.columns) == ["a", "b", "jaccard"]
    assert len(out) == 0


def test_shingle_matmul_byte_cap_subsplits(ray_session, monkeypatch):
    """With the per-task matrix budget forced tiny, every band must
    sub-split instead of building one doc x vocab matrix; pairs found
    are exactly a subset of the uncapped (exact) result and co-located
    duplicates are still found."""
    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    exact = Q._exact_shingle_pairs(docs, t=0.5)
    monkeypatch.setattr(Q, "_SHINGLE_MATMUL_BYTES", 64 * 1024)
    capped = Q._exact_shingle_pairs(docs, t=0.5)
    ex = set(map(tuple, exact[["a", "b"]].to_numpy()))
    cp = set(map(tuple, capped[["a", "b"]].to_numpy()))
    assert cp <= ex
    # the sf corpus' near-dup pairs are numerous enough that the hash
    # sub-split keeps some co-located — a fully-empty result would mean
    # the sub-split path is broken, not just lossy
    assert len(cp) > 0
    merged = capped.merge(exact, on=["a", "b"], suffixes=("_c", "_e"))
    assert (merged["jaccard_c"] == merged["jaccard_e"]).all()


def test_shingle_subsplit_one_shot_bounded_buckets(ray_session, monkeypatch):
    """The pathological sub-split shape that made a recursive hash
    splitter loop forever (and left one hash bucket holding the whole
    band): ids chosen so every multiplicative-mix hash shares a residue
    class. The one-shot POSITIONAL splitter must bound every bucket at
    ceil(rows/nsub) regardless of id structure and still find the
    within-bucket duplicate pairs."""
    import numpy as np

    M = 0x9E3779B97F4A7C15
    mask64 = (1 << 64) - 1
    ids = [i for i in range(1, 10_000)
           if (((i * M) & mask64) >> 33) % 2 == 0][:4]
    assert len(ids) == 4
    text = "the quick brown fox jumps over the lazy dog " * 8
    docs = ray.data.from_items([{"doc_id": i, "text": text} for i in ids])
    import ocr_ray.functions.hashing as H

    vocab = np.unique(H.shingle_hashes64(text)).size
    mat_bytes = 4 * vocab * 4  # 4 identical docs share the vocab
    # budget = the matrix term alone: the summed gate (mat + pair)
    # still trips, and nsub lands at 2 -> two buckets of 2
    budget = mat_bytes
    monkeypatch.setattr(Q, "_SHINGLE_MATMUL_BYTES", budget)
    out = Q._exact_shingle_pairs(docs, t=0.5)
    # positional buckets of ceil(4/nsub): every within-bucket pair of
    # the identical docs qualifies at jaccard 1.0; cross-bucket pairs
    # are missed BY DESIGN past the cap (so strictly fewer than 4C2=6)
    half = budget // 2
    nsub = max(-(-mat_bytes // half),
               int(np.ceil(np.sqrt(4 * 4 * 32 / half))))
    sizes = [c.size for c in np.array_split(np.arange(4), nsub)]
    expected = sum(s * (s - 1) // 2 for s in sizes)
    assert 1 <= expected < 6
    assert len(out) == expected
    assert (out["jaccard"] == 1.0).all()


def test_pyws_class_matches_python_split():
    """The _PYWS RE2 class substituted into the whitespace-tokenizing
    SQL mirrors must split exactly like Python str.split() (the Ray
    kernels' tokenizer) — including \\x0b, \\x1c-\\x1f, \\x85 and the
    Unicode spaces RE2's \\s misses."""
    import duckdb

    con = duckdb.connect()
    cases = ["a\x0bb", "a\xa0b", "a b", "a\x1cb", "a\x1fb", "a\x85b",
             "a　b", "a \t\n b", "  x  ", "", "ab", "a b c"]
    for t in cases:
        sql = con.execute(
            "SELECT list_filter(string_split_regex(?, ?), x -> x <> '')",
            [t, Q._PYWS]).fetchone()[0]
        assert sql == t.split(), repr(t)
        collapsed = con.execute(
            "SELECT trim(regexp_replace(?, ?, ' ', 'g'))",
            [t, Q._PYWS]).fetchone()[0]
        assert collapsed == " ".join(t.split()), repr(t)
        n_words = con.execute(
            "SELECT len(regexp_extract_all(?, ?))",
            [t, Q._PYWS_NEG]).fetchone()[0]
        assert n_words == len(t.split()), repr(t)


def test_memo_key_fingerprints_input(tmp_path):
    """Rewriting the input at the same path must change the memo key
    (stale-cache hazard); the session-id component must change the key
    across Ray job boundaries only when requested."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    f = tmp_path / "embeddings.parquet"
    pq.write_table(pa.table({"vec_id": [1]}), f)
    k1 = Q._memo_key(str(tmp_path), "embeddings")
    pq.write_table(pa.table({"vec_id": [1, 2]}), f)
    os.utime(f, ns=(1, 1))
    k2 = Q._memo_key(str(tmp_path), "embeddings")
    assert k1 != k2
    # (node id, job id) pair — neither alone distinguishes both a local
    # re-init (job id repeats) and an external-cluster reconnect (node
    # id repeats)
    assert len(Q._memo_key(str(tmp_path), "embeddings", with_session=True)) \
        == len(k2) + 2


def test_top_orders_per_segment_guard_paths_agree(ray_session):
    """Over-budget customer dim must route the grouped top-k through
    the custkey-bucketed join (with per-batch per-custkey pruning) and
    produce exactly the broadcast path's result."""
    from ocr_ray.queries import q_top_orders_per_segment

    a = q_top_orders_per_segment(SF)
    b = q_top_orders_per_segment(SF, _broadcast_max=1)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_ngram_block_cap_bounds_uniform_length_corpus(ray_session):
    """1,500 same-length docs collapse into ONE length bucket; the cap
    must split it into ~cap-bounded sub-blocks (never a 1500^2 gram
    matrix) and still find a planted duplicate pair that lands in the
    same sub-block."""
    import numpy as np

    from ocr_ray import queries as Q2

    rng = np.random.default_rng(42)
    words = ["alpha", "beta", "gamma", "delta", "epsi", "zeta", "etaa", "thet"]
    texts = [" ".join(rng.choice(words, 20)) for _ in range(1500)]
    # planted exact dup: find two doc_ids in the same secondary
    # sub-block. One block GROUP holds each doc once (the b/b+1
    # fan-out lands in different groups), so production pairs() sees
    # len(g)=1500 -> nsub = ceil(1500/cap) — replicate exactly.
    nsub = -(-1500 // Q2._NGRAM_BLOCK_CAP)
    ids = np.arange(1500, dtype=np.int64)
    mixed = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    sub = mixed % np.uint64(nsub)
    same = np.nonzero(sub == sub[0])[0]
    i, j = int(same[0]), int(same[1])
    texts[j] = texts[i]
    g = pd.DataFrame({"doc_id": ids, "text": texts})
    out = Q2._ngram_block_pairs(g)  # un-capped core on one block: huge but correct
    # the capped path via the closure shape:
    capped = []
    mixed_key = sub
    for s in range(nsub):
        capped.append(Q2._ngram_block_pairs(g[mixed_key == s]))
    capped = pd.concat(capped, ignore_index=True)
    planted = {(min(i, j), max(i, j))}
    assert planted <= set(map(tuple, capped[["a", "b"]].to_numpy()))
    # capped finds a subset of the exact result (recall trade, no false positives)
    assert set(map(tuple, capped[["a", "b"]].to_numpy())) <= \
        set(map(tuple, out[["a", "b"]].to_numpy()))


def test_knn_ivfpq_recall_vs_bruteforce(ray_session):
    """IVF-PQ (coarse lists + residual uint8 codes + ADC shortlist +
    exact rerank) must keep avg recall >= the gate bound; its coded
    pruning can only lose vs plain IVF where the true neighbor falls
    off the ADC shortlist."""
    bf = Q.QUERIES["knn_bruteforce"](SF)
    ann = Q._knn_ivfpq_ann(SF)
    bf_sets = bf.groupby("qid")["vec_id"].apply(set)
    ann_sets = ann.groupby("qid")["vec_id"].apply(set)
    recalls = [len(bf_sets[q] & ann_sets.get(q, set())) / len(bf_sets[q])
               for q in bf_sets.index]
    assert sum(recalls) / len(recalls) >= 0.5


def test_multimodal_features_merged_row(ray_session):
    """The merged long-format multimodal row: all three kinds present,
    deterministic, and the image slice agrees with the wide helper."""
    out = Q.QUERIES["multimodal_features"](SF)
    assert sorted(out["kind"].unique()) == ["audio", "frame", "image"]
    out2 = Q.QUERIES["multimodal_features"](SF)
    pd.testing.assert_frame_equal(out, out2)
    wide = Q.q_multimodal_image_stats(SF)
    img = out[(out["kind"] == "image") & (out["feature"] == "ink_frac")]
    assert np.allclose(
        img.sort_values("media_id")["value"].to_numpy(),
        wide.sort_values("media_id")["ink_frac"].to_numpy())


def test_range_join_window_semantics(ray_session):
    """Driver-side recomputation of the +/-1h window count for a few
    users pins the bucketed searchsorted kernel (inclusive bounds)."""
    out = Q.QUERIES["range_join_events"](SF)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"])
    err = ev[ev.event_type == "error"]
    clk = ev[ev.event_type == "click"]
    assert len(out) == len(err)
    H = pd.Timedelta(hours=1)
    sample = err.head(50)
    for _, r in sample.iterrows():
        n = ((clk.user_id == r.user_id) & (clk.ts >= r.ts - H) & (clk.ts <= r.ts + H)).sum()
        got = out.loc[out.event_id == r.event_id, "n_nearby_clicks"].iloc[0]
        assert got == n, (r.event_id, got, n)


def test_dedup_clusters_matches_union_find(ray_session):
    """Hash-to-min connected components vs a driver-side union-find
    over the same exact pair set."""
    pairs = Q._exact_pair_ds(SF).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs[["a", "b"]].itertuples(index=False):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = pd.DataFrame(
        sorted((int(n), int(find(n))) for n in parent),
        columns=["vec_id", "cluster_id"])
    got = Q.QUERIES["dedup_clusters"](SF)
    pd.testing.assert_frame_equal(got, expected, check_dtype=False)
    # cluster ids are the component minimum (a member of the cluster)
    assert (got.groupby("cluster_id")["vec_id"].min()
            == got["cluster_id"].unique()).all()


def test_ranked_orders_rank_is_total_and_contiguous(ray_session):
    """Per-customer ranks must be exactly 1..min(3, n_orders) with no
    gaps or duplicates (a shuffle-dependent tie-break would break
    this), and every ranked price must be >= any unranked price of the
    same customer."""
    out = Q.QUERIES["ranked_orders"](SF)
    for _, g in out.groupby("o_custkey"):
        assert list(g.sort_values("rnk")["rnk"]) == list(range(1, len(g) + 1))
        # within the returned top-3, price is non-increasing with rank
        p = g.sort_values("rnk")["o_totalprice"].to_numpy()
        assert (np.diff(p) <= 1e-9).all()


def test_cumulative_revenue_prefix_property(ray_session):
    """cum_cents must be the exact integer prefix sum of day_cents in
    date order, and the final value must equal the table total."""
    out = Q.QUERIES["cumulative_revenue"](SF)
    assert out["o_orderdate"].is_monotonic_increasing
    assert (out["cum_cents"].to_numpy()
            == np.cumsum(out["day_cents"].to_numpy())).all()
    con = duckdb.connect()
    total = con.execute(
        f"SELECT CAST(ROUND(SUM(o_totalprice)*100) AS BIGINT) FROM '{SF}/orders.parquet'"
    ).fetchone()[0]
    assert abs(int(out["cum_cents"].iloc[-1]) - int(total)) <= 1


def test_rollup_levels_consistent(ray_session):
    """Each rollup level must re-aggregate exactly from the level below
    (single-scan derivation invariant)."""
    out = Q.QUERIES["rollup_revenue"](SF)
    base = out[(out.l_returnflag != "ALL") & (out.l_linestatus != "ALL")]
    lvl1 = out[(out.l_returnflag != "ALL") & (out.l_linestatus == "ALL")]
    total = out[(out.l_returnflag == "ALL") & (out.l_linestatus == "ALL")]
    re1 = base.groupby("l_returnflag")["n_items"].sum()
    assert (lvl1.set_index("l_returnflag")["n_items"] == re1).all()
    assert int(total["n_items"].iloc[0]) == int(base["n_items"].sum())


def test_stratified_sample_rates_and_determinism(ray_session):
    """The hash sample must hit each stratum near its nominal rate and
    be byte-identical across runs (no RNG state anywhere)."""
    a = Q.QUERIES["orders_stratified_sample"](SF)
    b = Q.QUERIES["orders_stratified_sample"](SF)
    pd.testing.assert_frame_equal(a, b)
    tot = duckdb.connect().execute(
        f"SELECT o_orderpriority, COUNT(*) AS n FROM '{SF}/orders.parquet' GROUP BY 1"
    ).df().set_index("o_orderpriority")["n"]
    got = a.groupby("o_orderpriority").size()
    for pri, n in tot.items():
        rate = got.get(pri, 0) / n
        nominal = 0.2 if pri == "1-URGENT" else 0.05
        # binomial noise at sf0.001 strata (~300 rows) is wide; 3 sigma
        sigma = (nominal * (1 - nominal) / n) ** 0.5
        assert abs(rate - nominal) < max(3 * sigma, 0.03), (pri, rate)


def test_props_field_stats_tolerates_missing_field(ray_session, tmp_path):
    """props rows without the extracted field must drop out of the
    aggregates (not crash either side), and an event_type with no
    match anywhere must be excluded on BOTH sides."""
    ev = pd.DataFrame({
        "event_type": ["a", "a", "b", "c", "c"],
        "props": ['{"k": 3}', '{"x": 9}', '{"nothing": 1}',
                  '{"k": 7}', '{"k": -2}'],
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = _norm(Q.QUERIES["props_field_stats"](sf))
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["props_field_stats"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    assert set(mine["event_type"]) == {"a", "c"}  # 'b' has no k anywhere


def test_repetition_filter_edges_match_oracle(ray_session, tmp_path):
    """Gopher-style repetition filter: edge cases (empty / whitespace-only
    / short / all-one-token / alternating-bigram / clean) must agree with
    the SQL mirror exactly, and the keep rule must fire as designed."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5, 6],
        "text": [
            "",                                   # empty -> all zeros
            " \t\n  ",                            # whitespace-only
            "one two three four",                 # 4 < 5 tokens -> drop
            "x x x x x x x x x x",                # one token repeated
            "a b a b a b a b a b a b",            # one bigram dominates
            " ".join(f"w{i}" for i in range(20)),  # clean -> keep
        ],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = _norm(Q.QUERIES["repetition_filter"](sf))
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["repetition_filter"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    by_id = mine.set_index("doc_id")
    assert by_id.loc[1, "n_tokens"] == 0 and not by_id.loc[1, "keep"]
    assert by_id.loc[2, "n_tokens"] == 0 and not by_id.loc[2, "keep"]
    assert not by_id.loc[3, "keep"]          # min-length rule
    assert by_id.loc[4, "top_token_n"] == 10 and not by_id.loc[4, "keep"]
    assert by_id.loc[5, "top_bigram_n"] == 6 and not by_id.loc[5, "keep"]
    assert by_id.loc[6, "keep"] and by_id.loc[6, "n_distinct_tokens"] == 20


def test_decontamination_guard_paths_agree(ray_session):
    """Forcing the bucketed-join fallback (budget=0) must produce
    exactly the broadcast path's per-doc gram/hit counts and flags."""
    from ocr_ray.queries import q_decontamination

    a = _norm(q_decontamination(SF))
    b = _norm(q_decontamination(SF, _broadcast_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_decontamination_edges_match_oracle(ray_session, tmp_path):
    """Edge cases: empty / short (<3 tokens) docs have zero grams; an
    eval doc (doc_id % 97 == 0) is never 'contaminated' itself; a doc
    sharing a 3-gram with the eval doc is flagged; a disjoint doc is
    not. Both paths must agree with the SQL mirror exactly."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 97],
        "text": [
            "alpha beta gamma delta",        # eval doc (0 % 97 == 0)
            "the quick brown fox",           # disjoint -> clean
            "x alpha beta gamma y",          # shares 'alpha beta gamma'
            "two tokens",                    # <3 tokens -> zero grams
            "beta gamma delta unrelated",    # eval doc too (97 % 97 == 0)
        ],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = _norm(Q.QUERIES["decontamination"](sf))
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["decontamination"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    by_id = mine.set_index("doc_id")
    assert bool(by_id.loc[0, "is_eval"]) and not bool(by_id.loc[0, "contaminated"])
    assert by_id.loc[1, "n_hits"] == 0 and not bool(by_id.loc[1, "contaminated"])
    assert by_id.loc[2, "n_hits"] == 1 and bool(by_id.loc[2, "contaminated"])
    assert by_id.loc[3, "n_grams"] == 0 and by_id.loc[3, "n_hits"] == 0
    assert bool(by_id.loc[97, "is_eval"])


def test_shard_packing_matches_local_prefix_sum(ray_session):
    """The distributed two-pass prefix sum must equal a single-process
    pandas recompute, shards must be non-decreasing in doc_id order,
    and every shard's token total must respect the floor-division
    bound: total < target + that shard's last doc's tokens."""
    from ocr_ray.queries import _SHARD_TOKENS, q_shard_packing

    mine = q_shard_packing(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    n = docs["text"].str.split().str.len().fillna(0).astype("int64")
    before = n.cumsum() - n
    want = pd.DataFrame({"doc_id": docs["doc_id"].astype("int64"),
                         "n_tokens": n.to_numpy(),
                         "shard": (before // _SHARD_TOKENS).to_numpy()}) \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(mine, want, check_dtype=False)
    assert (mine["shard"].diff().fillna(0) >= 0).all()
    per = mine.groupby("shard")["n_tokens"].agg(["sum", "last"])
    assert (per["sum"] < _SHARD_TOKENS + per["last"]).all()


def test_lang_temperature_sample_rule(ray_session):
    """Every kept doc must satisfy the hash rule for its language's
    ceil-division rate, and the kept set must equal a local recompute
    (determinism across cluster layouts is the point of the design)."""
    from ocr_ray.queries import q_lang_temperature_sample

    mine = q_lang_temperature_sample(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    cnt = docs.groupby("lang").size()
    mn = int(cnt.min())
    rates = ((cnt + mn - 1) // mn).astype("int64")
    k = docs["doc_id"].to_numpy(dtype=np.uint64)
    h = ((k % np.uint64(2**31)) * np.uint64(2654435761)) % np.uint64(2**32)
    rate = docs["lang"].map(rates).to_numpy(dtype=np.uint64)
    want = docs[h % rate == 0].copy()
    want["rate"] = docs["lang"].map(rates)[h % rate == 0]
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        mine, want[["doc_id", "lang", "rate"]], check_dtype=False)
    # the head language is actually downsampled (rate > 1) on this data
    assert rates.max() > 1


def test_corpus_familiarity_guard_paths_agree(ray_session):
    """Forcing the bucketed fallback (budget=0) must produce exactly
    the broadcast path's per-doc counts and familiarity sums."""
    from ocr_ray.queries import q_corpus_familiarity

    a = _norm(q_corpus_familiarity(SF))
    b = _norm(q_corpus_familiarity(SF, _broadcast_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_token_first_occurrence_edges_match_oracle(ray_session, tmp_path):
    """corpus_familiarity / vocab_growth / ngram_novelty edge cases on
    a hand-built table: empty doc, whitespace-only doc, <3-token doc,
    an exact duplicate, and mixed case. All three must match their SQL
    mirrors exactly, and the hand-checkable invariants must hold."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": [
            "Alpha beta gamma delta",   # introduces 4 tokens, 2 grams
            "",                          # empty: no tokens
            "  \t ",                     # whitespace-only: no tokens
            "alpha BETA gamma delta",    # exact dup after lowering
            "two tokens",                # <3 tokens: no grams
            "alpha epsilon",             # one new token
        ],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    for name in ["corpus_familiarity", "vocab_growth", "ngram_novelty"]:
        mine = _norm(Q.QUERIES[name](sf))
        orc = _norm(con2.execute(Q.ORACLE_SQL[name]).df())
        pd.testing.assert_frame_equal(mine, orc, check_dtype=False)

    fam = Q.QUERIES["corpus_familiarity"](sf).to_pandas() \
        .set_index("doc_id")
    assert set(fam.index) == {0, 3, 4, 5}      # token-less docs emit no row
    # doc 0 == doc 3 after lowercasing: identical scores
    assert fam.loc[0].equals(fam.loc[3])
    # alpha:3 beta:2 gamma:2 delta:2 -> 9 familiarity, 4 distinct
    assert fam.loc[0, "familiarity"] == 9 and fam.loc[0, "n_distinct"] == 4
    assert fam.loc[5, "familiarity"] == 3 + 1  # alpha(3) + epsilon(1)

    vg = Q.QUERIES["vocab_growth"](sf).to_pandas().set_index("doc_id")
    assert len(vg) == 6                         # every doc emits a row
    assert vg.loc[0, "n_new_tokens"] == 4 and vg.loc[0, "vocab_size"] == 4
    assert vg.loc[3, "n_new_tokens"] == 0 and vg.loc[3, "vocab_size"] == 4
    assert vg.loc[4, "n_new_tokens"] == 2       # two, tokens
    assert vg.loc[5, "n_new_tokens"] == 1 and vg.loc[5, "vocab_size"] == 7

    nv = Q.QUERIES["ngram_novelty"](sf).to_pandas().set_index("doc_id")
    assert len(nv) == 6
    assert nv.loc[0, "n_grams"] == 2 and nv.loc[0, "n_new"] == 2
    assert nv.loc[3, "n_grams"] == 2 and nv.loc[3, "n_new"] == 0
    assert (nv.loc[[1, 2, 4, 5], ["n_grams", "n_new"]] == 0).all().all()
    assert (nv["n_new"] <= nv["n_grams"]).all()


def test_bigram_familiarity_guard_paths_agree(ray_session):
    """Forcing the bucketed fallback (budget=0) must produce exactly
    the broadcast path's per-doc bigram counts and familiarity sums."""
    from ocr_ray.queries import q_bigram_familiarity

    a = _norm(q_bigram_familiarity(SF))
    b = _norm(q_bigram_familiarity(SF, _broadcast_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_bigram_familiarity_edges(ray_session, tmp_path):
    """Hand-built corpus: empty / whitespace-only / 1-token docs emit
    no row; repeated bigrams count per occurrence; scores match the
    SQL mirror on the same table."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "a b a b",        # bigrams: (a b) x2, (b a) x1
            "A B",            # lowercased dup of (a b)
            "",               # no tokens
            "solo",           # 1 token: no bigram
            "c d",            # unique bigram
        ],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    mine = _norm(Q.QUERIES["bigram_familiarity"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["bigram_familiarity"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)

    fam = Q.QUERIES["bigram_familiarity"](sf).to_pandas().set_index("doc_id")
    assert set(fam.index) == {0, 1, 4}
    # global counts: (a b)=3, (b a)=1, (c d)=1
    assert fam.loc[0, "n_bigrams"] == 3 and fam.loc[0, "n_distinct"] == 2
    assert fam.loc[0, "familiarity"] == 3 + 3 + 1
    assert fam.loc[1, "familiarity"] == 3
    assert fam.loc[4, "familiarity"] == 1


def test_event_transitions_hand_checked(ray_session, tmp_path):
    """Two users with interleaved timestamps: transitions stay within
    each user; ties break on event_id; shares sum to 1 per prev_type."""
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [7, 7, 7, 8, 8, 8],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:00:05",
            "2024-01-01 00:00:05",  # tie with event 2 -> event_id order
            "2024-01-01 00:00:01", "2024-01-01 00:00:02",
            "2024-01-01 00:00:03",
        ]),
        "event_type": ["view", "click", "buy", "view", "view", "click"],
        "value": [0.0] * 6,
        "props": [""] * 6,
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    out = Q.QUERIES["event_transitions"](sf)
    if isinstance(out, ray.data.Dataset):
        out = out.to_pandas()
    got = {(r.prev_type, r.next_type): r.n_trans for r in out.itertuples()}
    # user 7: view->click, click->buy; user 8: view->view, view->click
    assert got == {("view", "click"): 2, ("click", "buy"): 1,
                   ("view", "view"): 1}
    shares = out.groupby("prev_type")["share"].sum()
    assert np.allclose(shares.to_numpy(), 1.0)


def test_segment_dedup_hand_checked(ray_session, tmp_path):
    """3-token segments (monkeypatched W via the module constant is
    avoided — build docs sized to the real W=16): a doc repeating its
    own first segment, a doc repeating another doc's segment, a short
    tail segment, and an empty doc. First occurrence under (doc_id,
    seg_idx) wins; removed-token counts are exact per segment."""
    W = Q._SEG_W
    seg_a = " ".join(f"a{i}" for i in range(W))      # full segment A
    seg_b = " ".join(f"b{i}" for i in range(W))      # full segment B
    tail = "t0 t1 t2"                                 # 3-token tail
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            f"{seg_a} {seg_a} {tail}",  # self-dup + unique tail
            f"{seg_b} {seg_a}",         # cross-doc dup of A
            "",                          # no tokens: no row
            tail,                        # dup of doc 0's tail segment
        ],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    mine = _norm(Q.QUERIES["segment_dedup"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["segment_dedup"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)

    out = Q.QUERIES["segment_dedup"](sf).to_pandas().set_index("doc_id")
    assert set(out.index) == {0, 1, 3}
    assert out.loc[0, "n_segs"] == 3      # A, A(dup), tail
    assert out.loc[0, "n_dup_segs"] == 1
    assert out.loc[0, "n_tokens_removed"] == W
    assert out.loc[1, "n_dup_segs"] == 1  # its A copy
    assert out.loc[1, "n_tokens_removed"] == W
    assert out.loc[3, "n_dup_segs"] == 1  # tail seen in doc 0 first
    assert out.loc[3, "n_tokens_removed"] == 3


def test_pareto_orders_hand_checked(ray_session, tmp_path):
    """Hand-built skyline: dominated points drop, ties on both axes
    both survive, and a point dominated only ACROSS batch boundaries
    is still pruned by the combine stage (forced via tiny batches)."""
    d = pd.to_datetime
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5, 6],
        "o_custkey": [0] * 6,
        "o_orderstatus": ["O"] * 6,
        "o_totalprice": [100.0, 50.0, 50.0, 200.0, 60.0, 100.0],
        "o_orderdate": d(["2024-01-03", "2024-01-02", "2024-01-02",
                          "2024-01-04", "2024-01-01", "2024-01-04"]),
        "o_orderpriority": ["1-URGENT"] * 5 + ["2-HIGH"]})
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    mine = _norm(Q.QUERIES["pareto_orders"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["pareto_orders"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    keys = set(mine["o_orderkey"])
    # 1 (latest at price 100 beats nothing cheaper later: key 4 is
    # later but pricier -> 1 survives), 2 & 3 (tie pair, cheapest),
    # 4 (latest date), 6 (only point in its priority). 5 is dominated
    # by 2/3 (later AND cheaper).
    assert keys == {1, 2, 3, 4, 6}


def test_mad_outliers_hand_checked(ray_session, tmp_path):
    """Known medians: group A = [1..5, 100] has lower median 3 (rank
    ceil(6/2)=3), deviations [2,1,0,1,2,97] -> MAD 1 (rank 3 of
    sorted [0,1,1,2,2,97]), threshold 3 -> only 100 is an outlier
    (|100-3|=97 > 3). Constant group B: MAD 0, zero outliers."""
    ev = pd.DataFrame({
        "event_id": range(9),
        "user_id": [0] * 9,
        "ts": pd.to_datetime(["2024-01-01"] * 9),
        "event_type": ["A"] * 6 + ["B"] * 3,
        "value": [1.0, 2.0, 3.0, 4.0, 5.0, 100.0, 7.0, 7.0, 7.0],
        "props": [""] * 9,
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    mine = _norm(Q.QUERIES["mad_outliers"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["mad_outliers"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    m = mine.set_index("event_type")
    assert m.loc["A", "med"] == 3.0 and m.loc["A", "mad"] == 1.0
    assert m.loc["A", "n_outliers"] == 1 and m.loc["A", "n_events"] == 6
    assert m.loc["B", "mad"] == 0.0 and m.loc["B", "n_outliers"] == 0


def test_event_burst_dedup_hand_checked(ray_session, tmp_path):
    """A 3-ping burst drops pings 2 and 3 (each within the 3600 s
    window of its predecessor); an isolated repeat 2 h later is kept;
    a different event_type inside the burst window is untouched. Also
    asserts the window actually fires on the synthetic sf0.01 data."""
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "user_id": [9, 9, 9, 9, 9, 9],
        "ts": pd.to_datetime([
            "2024-01-01 00:00:00", "2024-01-01 00:30:00",
            "2024-01-01 01:00:00",   # 1800 s after ping 2 -> dropped too
            "2024-01-01 03:00:00",   # 7200 s gap -> kept
            "2024-01-01 00:10:00",   # other type inside burst window
            "2024-01-01 00:20:00",   # same other type, 600 s later -> dup
        ]),
        "event_type": ["ping"] * 4 + ["click"] * 2,
        "value": [0.0] * 6,
        "props": [""] * 6,
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    mine = _norm(Q.QUERIES["event_burst_dedup"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["event_burst_dedup"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    m = mine.set_index("event_type")
    assert m.loc["ping", "n_events"] == 4 and m.loc["ping", "n_dropped"] == 2
    assert m.loc["click", "n_kept"] == 1 and m.loc["click", "n_dropped"] == 1
    # the real fixture must exercise the drop branch too
    full = Q.QUERIES["event_burst_dedup"](SF)
    if isinstance(full, ray.data.Dataset):
        full = full.to_pandas()
    assert full["n_dropped"].sum() > 0


def test_event_sequences_hand_checked(ray_session, tmp_path):
    """Sequences never span users, windows are CONSECUTIVE triples
    (4 events -> 2 sequences), and a tie at the tail sorts by the
    sequence labels."""
    ev = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6, 7],
        "user_id": [1, 1, 1, 1, 2, 2, 2],
        "ts": pd.to_datetime([f"2024-01-01 00:00:0{i}" for i in range(7)]),
        "event_type": ["a", "b", "c", "a", "b", "c", "a"],
        "value": [0.0] * 7,
        "props": [""] * 7,
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    mine = _norm(Q.QUERIES["event_sequences"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["event_sequences"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    got = {(r.t1, r.t2, r.t3): r.n_seq
           for r in Q.QUERIES["event_sequences"](sf).itertuples()}
    # user 1: abc, bca; user 2: bca — never a cross-user "a b c" from
    # events 4-5-6
    assert got == {("a", "b", "c"): 1, ("b", "c", "a"): 2}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rfm_segments_random_vs_oracle(ray_session, tmp_path, seed):
    """Seeded random order tables (heavy value ties, n not divisible
    by 5) must match DuckDB's NTILE exactly — guards the boundary
    selection and (value, custkey) tie-break across shapes the hand
    test can't enumerate."""
    rng = np.random.default_rng(seed)
    n = int(rng.integers(23, 120))
    orders = pd.DataFrame({
        "o_orderkey": range(n),
        "o_custkey": rng.integers(1, 18, n),
        "o_orderstatus": ["O"] * n,
        # 2-decimal prices from a tiny grid -> many exact ties
        "o_totalprice": rng.integers(1, 6, n) * 10.25,
        "o_orderdate": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 5, n), unit="D"),
        "o_orderpriority": ["1-URGENT"] * n,
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    mine = _norm(Q.QUERIES["rfm_segments"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["rfm_segments"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)


@pytest.mark.parametrize("seed", [0, 1])
def test_segment_dedup_random_vs_oracle(ray_session, tmp_path, seed):
    """Seeded random docs from a 4-token alphabet (so segment
    collisions are common) must match the SQL mirror exactly,
    including short tails and repeated within-doc segments."""
    rng = np.random.default_rng(seed)
    vocab = np.array(["aa", "bb", "cc", "dd"])
    docs = pd.DataFrame({
        "doc_id": range(30),
        "text": [" ".join(rng.choice(vocab, size=int(rng.integers(0, 40))))
                 for _ in range(30)],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    mine = _norm(Q.QUERIES["segment_dedup"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["segment_dedup"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)


def test_weighted_median_hand_checked(ray_session, tmp_path):
    """Weighted median crosses at the value where running weight
    reaches half the total: values [10 (w=1), 20 (w=1), 30 (w=8)]
    -> total 10, crossing at cw>=5 -> 30; an unweighted-median
    reading would say 20. Tie pooling: two rows of the same value
    pool their weights."""
    li = pd.DataFrame({
        "l_returnflag": ["A"] * 3 + ["B"] * 4,
        "l_extendedprice": [10.0, 20.0, 30.0, 5.0, 5.0, 7.0, 9.0],
        "l_quantity": [1.0, 1.0, 8.0, 2.0, 2.0, 3.0, 1.0],
        "l_shipdate": pd.to_datetime(["2024-01-01"] * 7),
        "l_discount": [0.0] * 7,
        "l_tax": [0.0] * 7,
        "l_orderkey": range(7),
        "l_partkey": [0] * 7,
        "l_suppkey": [0] * 7,
        "l_linenumber": [1] * 7,
    })
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    mine = _norm(Q.QUERIES["weighted_median"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["weighted_median"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    m = mine.set_index("l_returnflag")["wmedian_price"]
    assert m["A"] == 30.0
    # B: pooled 5s carry weight 4 of 8 total -> cw*2 >= tw at v=5
    assert m["B"] == 5.0


def test_basket_pairs_hand_checked(ray_session, tmp_path):
    """Pairs count per ORDER (duplicate lineitems of a part in one
    order count once), never across orders; cut ties sort by pair."""
    li = pd.DataFrame({
        "l_orderkey": [1, 1, 1, 2, 2, 3, 3, 3],
        "l_partkey": [10, 20, 10, 10, 20, 10, 20, 30],
        "l_quantity": [1.0] * 8,
        "l_extendedprice": [1.0] * 8,
        "l_discount": [0.0] * 8,
        "l_tax": [0.0] * 8,
        "l_returnflag": ["N"] * 8,
        "l_shipdate": pd.to_datetime(["2024-01-01"] * 8),
        "l_suppkey": [0] * 8,
        "l_linenumber": range(8),
    })
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    mine = _norm(Q.QUERIES["basket_pairs"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["basket_pairs"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    got = {(r.part_a, r.part_b): r.n_orders
           for r in Q.QUERIES["basket_pairs"](sf).itertuples()}
    # (10,20) in orders 1,2,3; (10,30),(20,30) in order 3 only; the
    # duplicated part 10 in order 1 contributes no extra pair
    assert got == {(10, 20): 3, (10, 30): 1, (20, 30): 1}


def test_ed_le1_matches_levenshtein():
    """The O(len) ed<=1 verifier agrees with DuckDB levenshtein on
    random short strings (both match/non-match directions), and the
    SymSpell blocking is complete: every ED=1 pair shares a deletion
    variant."""
    from ocr_ray.queries import _ed_le1

    rng = np.random.default_rng(7)
    con2 = duckdb.connect()
    words = ["".join(rng.choice(list("abc"), size=int(rng.integers(0, 6))))
             for _ in range(60)]
    for a in words[:30]:
        for b in words[30:]:
            lev = con2.execute(
                "SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert _ed_le1(a, b) == (lev <= 1), (a, b, lev)
            if lev == 1:
                va = {a} | {a[:i] + a[i + 1:] for i in range(len(a))}
                vb = {b} | {b[:i] + b[i + 1:] for i in range(len(b))}
                assert va & vb, (a, b)


def test_user_longest_streak_hand_checked(ray_session, tmp_path):
    """Runs break on type change AND on user change; interrupted runs
    don't merge (a a b a -> longest a-run is 2, not 3); max-length
    ties resolve to the lexicographically first type."""
    ev = pd.DataFrame({
        "event_id": range(9),
        "user_id": [1, 1, 1, 1, 2, 2, 2, 2, 3],
        "ts": pd.to_datetime([f"2024-01-01 00:00:0{i}" for i in range(9)]),
        "event_type": ["a", "a", "b", "a",      # user 1: aa, b, a
                       "b", "b", "a", "a",      # user 2: bb, aa (tie)
                       "z"],                     # user 3: single event
        "value": [0.0] * 9,
        "props": [""] * 9,
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    mine = _norm(Q.QUERIES["user_longest_streak"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["user_longest_streak"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    m = mine.set_index("user_id")
    assert m.loc[1, "streak_len"] == 2 and m.loc[1, "streak_type"] == "a"
    # tie 2 vs 2 -> 'a' before 'b'
    assert m.loc[2, "streak_len"] == 2 and m.loc[2, "streak_type"] == "a"
    assert m.loc[3, "streak_len"] == 1 and m.loc[3, "streak_type"] == "z"


def test_price_median_cont_hand_checked(ray_session, tmp_path):
    """Even group interpolates the two middle values (1,2,10,100 ->
    6.0); odd group returns the exact middle; both match DuckDB's
    quantile_cont."""
    li = pd.DataFrame({
        "l_returnflag": ["A"] * 4 + ["B"] * 3,
        "l_extendedprice": [1.0, 2.0, 10.0, 100.0, 5.0, 7.0, 9.0],
        "l_quantity": [1.0] * 7,
        "l_discount": [0.0] * 7,
        "l_tax": [0.0] * 7,
        "l_shipdate": pd.to_datetime(["2024-01-01"] * 7),
        "l_orderkey": range(7),
        "l_partkey": [0] * 7,
        "l_suppkey": [0] * 7,
        "l_linenumber": [1] * 7,
    })
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    mine = _norm(Q.QUERIES["price_median_cont"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["price_median_cont"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    m = mine.set_index("l_returnflag")["median_cont"]
    assert m["A"] == 6.0 and m["B"] == 7.0


def test_rfm_segments_hand_checked(ray_session, tmp_path):
    """7 customers (n % 5 = 2, so quintiles 1-2 hold 2 rows each),
    heavy ties on frequency and monetary so the (value, custkey)
    NTILE tie-break is exercised; matches the SQL mirror exactly and
    the segment census sums to the customer count."""
    orders = pd.DataFrame({
        "o_orderkey": range(1, 12),
        "o_custkey": [1, 1, 2, 3, 4, 5, 6, 7, 7, 7, 3],
        "o_orderstatus": ["O"] * 11,
        "o_totalprice": [10.0] * 11,     # all-tied monetary per order
        "o_orderdate": pd.to_datetime([
            "2024-01-01", "2024-02-01", "2024-02-01", "2024-02-01",
            "2024-03-01", "2024-03-01", "2024-01-15", "2024-01-10",
            "2024-01-11", "2024-01-12", "2024-02-01"]),
        "o_orderpriority": ["1-URGENT"] * 11,
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    mine = _norm(Q.QUERIES["rfm_segments"](sf))
    orc = _norm(con2.execute(Q.ORACLE_SQL["rfm_segments"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    assert mine["n_customers"].sum() == 7
    assert mine[["f_q", "m_q", "r_q"]].isin(range(1, 6)).all().all()


def test_vocab_growth_guard_paths_agree(ray_session):
    """Forcing the range-prefix-sum fallback (budget=0) must reproduce
    the broadcast-curve path exactly, including docs in ranges that
    introduce no new tokens (offset carried from preceding ranges)."""
    from ocr_ray.queries import q_vocab_growth

    a = _norm(q_vocab_growth(SF))
    b = _norm(q_vocab_growth(SF, _broadcast_max=0))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_chunk_windows_reconstruct_and_overlap(ray_session):
    """Every chunk must be the exact token slice of its document at
    chunk_idx * stride, consecutive chunks of a doc must overlap by
    W - S tokens, and concatenating each chunk's first S tokens (plus
    the final chunk's tail) must reproduce the document verbatim."""
    from ocr_ray.queries import _CHUNK_S, _CHUNK_W

    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .set_index("doc_id")["text"]
    ch = Q.QUERIES["chunk_windows"](SF).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"])
    for doc_id, g in ch.groupby("doc_id"):
        toks = docs.loc[doc_id].split(" ")
        assert list(g["chunk_idx"]) == list(range(len(g)))
        for _, row in g.iterrows():
            s = row["chunk_idx"] * _CHUNK_S
            e = min(s + _CHUNK_W, len(toks))
            assert row["chunk_text"] == " ".join(toks[s:e])
            assert row["n_tokens"] == e - s
        # stride-prefix reconstruction: no token lost or duplicated
        pieces = [c.split(" ")[:_CHUNK_S] for c in g["chunk_text"][:-1]]
        pieces.append(g["chunk_text"].iloc[-1].split(" "))
        assert [t for p in pieces for t in p] == toks


def test_source_token_jaccard_bounds_and_grain(ray_session):
    """Pairs are strictly a<b, jaccard = inter/union in (0, 1], and the
    per-source vocabulary sizes implied by (inter, union) must agree
    with a local pandas recomputation."""
    out = Q.QUERIES["source_token_jaccard"](SF)
    assert (out["src_a"] < out["src_b"]).all()
    assert ((out["inter"] >= 1) & (out["inter"] <= out["union_n"])).all()
    assert np.allclose(out["jaccard"],
                       out["inter"] / out["union_n"])
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"])
    vocab = {s: set(" ".join(g["text"]).split(" "))
             for s, g in docs.groupby("source")}
    for _, r in out.iterrows():
        a, b = vocab[r["src_a"]], vocab[r["src_b"]]
        assert r["inter"] == len(a & b) and r["union_n"] == len(a | b)


def test_token_pmi_support_and_orientation(ray_session):
    """pair_docs can never exceed either token's document frequency,
    pairs are a<b, the support floor holds, and PMI recomputes from
    the emitted integers."""
    from ocr_ray.queries import _PMI_MIN_PAIR

    out = Q.QUERIES["token_pmi"](SF)
    assert (out["tok_a"] < out["tok_b"]).all()
    assert (out["pair_docs"] >= _PMI_MIN_PAIR).all()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    n = len(docs)
    df_cnt: dict[str, int] = {}
    for t in docs["text"]:
        for tok in set(t.split(" ")):
            df_cnt[tok] = df_cnt.get(tok, 0) + 1
    da = out["tok_a"].map(df_cnt)
    db = out["tok_b"].map(df_cnt)
    assert (out["pair_docs"] <= np.minimum(da, db)).all()
    assert np.allclose(out["pmi"],
                       np.log(out["pair_docs"] * n / (da * db)))


def test_curriculum_buckets_partition_properties(ray_session):
    """Buckets partition the corpus: sizes differ by at most one with
    the larger buckets first (NTILE), every doc is counted once, and
    char ranges are non-decreasing across buckets."""
    from ocr_ray.queries import _CURR_K

    out = Q.QUERIES["curriculum_buckets"](SF).sort_values("bucket") \
        .reset_index(drop=True)
    n = len(pd.read_parquet(f"{SF}/documents.parquet",
                            columns=["doc_id"]))
    assert out["n_docs"].sum() == n
    assert list(out["bucket"]) == list(range(1, min(_CURR_K, n) + 1))
    sizes = out["n_docs"].to_numpy()
    assert sizes.max() - sizes.min() <= 1
    assert (np.diff(sizes) <= 0).all()  # larger buckets first
    # difficulty ordering: bucket k's max never exceeds bucket k+1's min
    assert (out["max_chars"].to_numpy()[:-1]
            <= out["min_chars"].to_numpy()[1:]).all()
    assert (out["min_chars"] <= out["max_chars"]).all()


def test_prefix_dups_edge_cases(ray_session, tmp_path):
    """Sorted-adjacency prefix detection must agree with the EXISTS
    oracle on a corpus engineered to stress it: duplicate texts (an
    exact dup is NOT a proper prefix), chains (a < ab < abc), texts
    equal to another's prefix via a different leading char, and the
    empty text (prefix of everything, shares no first char)."""
    docs = pd.DataFrame({
        "doc_id": np.arange(10, dtype=np.int64),
        "text": ["ab", "ab",          # duplicates, not proper prefixes
                 "abc", "abcd",       # chain: ab<abc<abcd
                 "b", "ba x",         # other leading char
                 "", "zzz",           # empty is prefix of all others
                 "abce",              # shares 'abc' prefix
                 "q"],                # prefix of nothing
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = _norm(Q.QUERIES["prefix_dups"](sf))
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["prefix_dups"]).df())
    pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    # both 'ab' rows qualify (prefix of abc), abc does (abcd), 'b'
    # does (ba x), '' does (everything); abcd/abce/ba x/zzz/q do not
    assert sorted(mine["doc_id"]) == [0, 1, 2, 4, 6]


def test_rank_decomposition_degenerate_groups(ray_session, tmp_path):
    """gini / trimmed_mean via _grouped_value_ranges on engineered
    degenerate groups: one group whose values are ALL identical (range
    width collapses to the 1e-12 floor, everything lands in range 0,
    Gini must be exactly 0), a singleton group (n=1: trim keeps the one
    row, Gini 0 by the rank-sum identity), and a heavy-tie group. Both
    queries must still match their SQL mirrors bit-for-bit."""
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, 12, dtype=np.int64),
        "o_custkey": np.ones(11, dtype=np.int64),
        "o_orderstatus": ["O"] * 11,
        "o_orderpriority": (["1-URGENT"] * 5      # all-equal values
                            + ["2-HIGH"]          # singleton
                            + ["3-MEDIUM"] * 5),  # ties at 10.0
        "o_totalprice": [7.0] * 5 + [42.0] + [10.0, 10.0, 10.0, 1.0, 89.0],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 11),
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    for name in ("gini_by_priority", "trimmed_mean"):
        mine = _norm(Q.QUERIES[name](sf))
        orc = _norm(con2.execute(Q.ORACLE_SQL[name]).df())
        pd.testing.assert_frame_equal(mine, orc, check_dtype=False)
    g = _norm(Q.QUERIES["gini_by_priority"](sf)) \
        .set_index("o_orderpriority")["gini"]
    assert g["1-URGENT"] == 0.0 and g["2-HIGH"] == 0.0


def test_table_checksum_detects_single_row_change(ray_session, tmp_path):
    """The anti-entropy fingerprint must differ when exactly one row's
    price moves by one cent, and must be batch-order independent (two
    different row orders of the same table fingerprint identically)."""
    base = pd.DataFrame({
        "o_orderkey": np.arange(1, 101, dtype=np.int64),
        "o_custkey": np.ones(100, dtype=np.int64),
        "o_orderstatus": ["O", "F"] * 50,
        "o_orderpriority": ["1-URGENT", "5-LOW"] * 50,
        "o_totalprice": np.linspace(10.0, 5000.0, 100),
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 100),
    })
    a, b, c = str(tmp_path / "a"), str(tmp_path / "b"), str(tmp_path / "c")
    for d in (a, b, c):
        os.makedirs(d, exist_ok=True)
    base.to_parquet(f"{a}/orders.parquet")
    # same rows, reversed order -> identical fingerprint
    base.iloc[::-1].reset_index(drop=True).to_parquet(f"{b}/orders.parquet")
    # one cent on one row -> different sum (xor may or may not move)
    mut = base.copy()
    mut.loc[57, "o_totalprice"] += 0.01
    mut.to_parquet(f"{c}/orders.parquet")
    ca = Q.QUERIES["table_checksum"](a).iloc[0]
    cb = Q.QUERIES["table_checksum"](b).iloc[0]
    cc = Q.QUERIES["table_checksum"](c).iloc[0]
    assert (ca["checksum_sum"], ca["checksum_xor"]) \
        == (cb["checksum_sum"], cb["checksum_xor"])
    assert ca["n_rows"] == cb["n_rows"] == cc["n_rows"] == 100
    assert ca["checksum_sum"] != cc["checksum_sum"]


def test_triangle_count_hand_checked(ray_session, tmp_path):
    """A 5-node graph with a known census. Orders are size-2 baskets,
    so each order contributes exactly one edge; duplicate orders for
    the same pair must collapse (edge set is distinct). Graph:
    triangle {1,2,3} + path edge 3-4 + isolated edge built twice
    (orders 5 and 6 both join 4-5).
    deg: 1:2 2:2 3:3 4:2 5:1 -> wedges = 1+1+3+1+0 = 6; triangles = 1;
    cc = 3*1/6 = 0.5."""
    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (4, 5)]
    rows = []
    for i, (a, b) in enumerate(pairs, start=1):
        for p in (a, b):
            rows.append((i, p))
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    li["l_quantity"] = 1.0
    li["l_extendedprice"] = 1.0
    li["l_discount"] = 0.0
    li["l_tax"] = 0.0
    li["l_returnflag"] = "N"
    li["l_linestatus"] = "O"
    li["l_shipdate"] = pd.to_datetime("2024-01-01")
    li["l_suppkey"] = 0
    li["l_linenumber"] = range(len(li))
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    out = Q.QUERIES["triangle_count"](sf).iloc[0]
    assert int(out["n_nodes"]) == 5
    assert int(out["n_edges"]) == 5
    assert int(out["n_wedges"]) == 6
    assert int(out["n_triangles"]) == 1
    assert out["global_cc"] == 0.5
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["triangle_count"]).df())
    pd.testing.assert_frame_equal(
        _norm(Q.QUERIES["triangle_count"](sf)), orc, check_dtype=False)


def test_zipf_slope_properties(ray_session):
    """Natural-ish text must fit a decreasing power law: slope < 0,
    R^2 in (0, 1]. The sf0.001 synthetic vocab is ~31 tokens, so the
    top-200 cut returns the whole vocabulary there."""
    out = Q.QUERIES["zipf_slope"](SF).iloc[0]
    assert 10 <= int(out["n_tokens"]) <= 200
    assert out["zipf_slope"] < -0.1
    assert 0.0 < out["r2"] <= 1.0


def test_weighted_sample_split_invariant(ray_session, tmp_path):
    """The A-ES race is stateless per row, so the sample must be
    IDENTICAL whether the table arrives as one file in key order or
    as seven shuffled shards — the resume/cluster-size determinism
    the docstring promises. A massively heavy row must also win."""
    rng = np.random.default_rng(11)
    n = 5000
    orders = pd.DataFrame({
        "o_orderkey": np.arange(1, n + 1, dtype=np.int64),
        "o_custkey": np.ones(n, dtype=np.int64),
        "o_orderstatus": ["O"] * n,
        "o_orderpriority": ["1-URGENT"] * n,
        "o_totalprice": rng.uniform(1.0, 100.0, n),
        "o_orderdate": pd.to_datetime(["2024-01-01"] * n),
    })
    orders.loc[123, "o_totalprice"] = 1e12  # key -> ~0: must rank 1st
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(a), os.makedirs(b)
    orders.to_parquet(f"{a}/orders.parquet")
    os.makedirs(f"{b}/orders.parquet")
    perm = rng.permutation(n)
    for i, chunk in enumerate(np.array_split(perm, 7)):
        orders.iloc[chunk].reset_index(drop=True).to_parquet(
            f"{b}/orders.parquet/part-{i}.parquet")
    ra = Q.QUERIES["weighted_sample"](a)
    rb = Q.QUERIES["weighted_sample"](b)
    pd.testing.assert_frame_equal(ra, rb)
    assert int(ra.iloc[0]["o_orderkey"]) == 124  # orderkey of row 123


def test_coverage_selection_hand_checked(ray_session, tmp_path):
    """Greedy max-cover on a crafted corpus: doc 1 = {a b c d},
    doc 2 = {a b c}, doc 3 = {d e f}, doc 4 = {g}. Greedy picks
    1 (4 new), then 3 (+2: e f), then 4 (+1: g), then stops —
    doc 2 adds nothing. Ties never arise; early-stop is exercised
    because K=8 > useful rounds."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b c d", "a b c", "d e f", "g"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [7, 5, 5, 1],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    out = Q.QUERIES["coverage_selection"](sf)
    assert out[["step", "doc_id", "new_tokens", "cum_coverage"]] \
        .to_records(index=False).tolist() \
        == [(1, 1, 4, 4), (2, 3, 2, 6), (3, 4, 1, 7)]
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["coverage_selection"]).df())
    pd.testing.assert_frame_equal(_norm(out), orc, check_dtype=False)


def test_kcore_hand_checked(ray_session, tmp_path):
    """Graph (after the >=2-support threshold) = triangle {1,2,3}
    + pendant chain 3-4, 4-5. k=3 peels 5 (deg 1), then 4 (deg 1),
    leaving the triangle — but deg inside a triangle is 2 < 3, so the
    3-core is EMPTY; rebuild with k via a second fixture where the
    4-clique {1,2,3,4} survives. Each edge is planted in exactly 2
    orders so the support filter keeps it; a decoy pair (5,6) appears
    once and must be dropped by the threshold."""
    def build(pairs, extra_once=()):
        rows, oid = [], 0
        for a, b in pairs:
            for _ in range(2):  # support 2
                oid += 1
                rows += [(oid, a), (oid, b)]
        for a, b in extra_once:
            oid += 1
            rows += [(oid, a), (oid, b)]
        li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
        for c, v in [("l_quantity", 1.0), ("l_extendedprice", 1.0),
                     ("l_discount", 0.0), ("l_tax", 0.0),
                     ("l_returnflag", "N"), ("l_linestatus", "O")]:
            li[c] = v
        li["l_shipdate"] = pd.to_datetime("2024-01-01")
        li["l_suppkey"] = 0
        li["l_linenumber"] = range(len(li))
        return li

    # fixture A: triangle + chain -> empty 3-core
    sfa = str(tmp_path / "a")
    os.makedirs(sfa)
    build([(1, 2), (1, 3), (2, 3), (3, 4), (4, 5)],
          extra_once=[(5, 6)]).to_parquet(f"{sfa}/lineitem.parquet")
    out = Q.QUERIES["kcore"](sfa).iloc[0]
    assert (int(out["n_core_nodes"]), int(out["n_core_edges"])) == (0, 0)

    # fixture B: 4-clique + pendant -> core = the clique (4 nodes, 6 edges)
    sfb = str(tmp_path / "b")
    os.makedirs(sfb)
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    build(clique + [(4, 9)]).to_parquet(f"{sfb}/lineitem.parquet")
    out = Q.QUERIES["kcore"](sfb).iloc[0]
    assert (int(out["n_core_nodes"]), int(out["n_core_edges"])) == (4, 6)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sfb}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["kcore"]).df())
    pd.testing.assert_frame_equal(_norm(Q.QUERIES["kcore"](sfb)), orc,
                                  check_dtype=False)


def test_price_trend_ols_recovers_planted_line(ray_session, tmp_path):
    """Exact-recovery property: when y lies EXACTLY on a line in cents
    (y = a + b*x), the integer OLS must return slope/intercept as the
    exact micro-unit integers — including a negative slope, which
    exercises the trunc-toward-zero division parity with DuckDB's
    HUGEINT ``//`` (floor division would be off by one here)."""
    epoch = pd.Timestamp("1995-01-01")
    days_a = [0, 10, 20, 30]
    days_b = [5, 15, 25]
    rows = []
    for d in days_a:  # priority A: y = 100000 + 250*d cents, rising
        rows.append(("1-A", epoch + pd.Timedelta(days=d),
                     (100000 + 250 * d) / 100.0))
    for d in days_b:  # priority B: y = 500000 - 333*d cents, falling
        rows.append(("2-B", epoch + pd.Timedelta(days=d),
                     (500000 - 333 * d) / 100.0))
    orders = pd.DataFrame(rows, columns=[
        "o_orderpriority", "o_orderdate", "o_totalprice"])
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")

    mine = Q.QUERIES["price_trend_ols"](sf)
    a = mine[mine["o_orderpriority"] == "1-A"].iloc[0]
    b = mine[mine["o_orderpriority"] == "2-B"].iloc[0]
    assert (int(a["slope_micro"]), int(a["intercept_micro"])) == \
        (250 * 1_000_000, 100000 * 1_000_000)
    assert (int(b["slope_micro"]), int(b["intercept_micro"])) == \
        (-333 * 1_000_000, 500000 * 1_000_000)

    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["price_trend_ols"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_hits_scores_hand_checked(ray_session, tmp_path):
    """HITS on a 2x2 planted bipartite graph, path counts by hand:
    c1 -> {s1, s2}, c2 -> {s1}. With hub0 = 1 and 2 unnormalized
    rounds: auth1 = (s1:2, s2:1), hub1 = (c1:3, c2:2),
    auth2 = (s1:5, s2:3), hub2 = (c1:8, c2:5). Also pins hub0 = 1 per
    DISTINCT customer (duplicate lineitem rows for the same pair must
    not inflate the seed — the bug class the bucketed seed combine
    exists to prevent)."""
    sf = str(tmp_path)
    pd.DataFrame({"o_orderkey": [1, 2, 3],
                  "o_custkey": [11, 11, 22]}).to_parquet(
        f"{sf}/orders.parquet")
    # order 1 (c11) -> s1 twice + s2; order 2 (c11) -> s1 again
    # (duplicate pair via a second order); order 3 (c22) -> s1
    pd.DataFrame({"l_orderkey": [1, 1, 1, 2, 3],
                  "l_suppkey": [101, 101, 102, 101, 101]}).to_parquet(
        f"{sf}/lineitem.parquet")
    mine = Q.QUERIES["hits_scores"](sf)
    got = {(r["node_type"], int(r["key"])): int(r["score"])
           for _, r in mine.iterrows()}
    assert got == {("A", 101): 5, ("A", 102): 3,
                   ("H", 11): 8, ("H", 22): 5}
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["hits_scores"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_markov_stationary_cycle_invariant(ray_session, tmp_path):
    """On a deterministic 3-cycle A->B->C->A the uniform fixed-point
    vector is exactly invariant under the integer iteration
    ((x*n)//tot == x when n == tot), so after any number of rounds
    every state holds exactly FP//3 — checked by hand and against the
    generated chained-CTE oracle."""
    seq = ["A", "B", "C", "A", "B", "C", "A"]
    rows = []
    for uid in (1, 2):  # two users exercise the user-bucket partials
        for i, et in enumerate(seq):
            rows.append((uid, pd.Timestamp("2024-01-01")
                         + pd.Timedelta(minutes=i), uid * 100 + i, et))
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["markov_stationary"](sf)
    fp3 = Q._MARKOV_FP // 3
    assert {(r["event_type"], int(r["stat_micro"]))
            for _, r in mine.iterrows()} == {("A", fp3), ("B", fp3),
                                             ("C", fp3)}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["markov_stationary"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_skipgram_counts_hand_checked(ray_session, tmp_path):
    """Window-3 skip-grams on two tiny docs, counted by hand — pins the
    positional (earlier, later) orientation, the distance cap, and
    that pairs never cross a document boundary."""
    docs = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b a b", "b  a"],  # doubled space collapses
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["skipgram_counts"](sf)
    got = {(r["tok_a"], r["tok_b"]): int(r["n_cooc"])
           for _, r in mine.iterrows()}
    # doc1 (a b a b): d1 ab,ba,ab; d2 aa,bb; d3 ab.  doc2 (b a): d1 ba
    assert got == {("a", "b"): 3, ("b", "a"): 2,
                   ("a", "a"): 1, ("b", "b"): 1}
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["skipgram_counts"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_max_concurrency_hand_checked(ray_session, tmp_path):
    """Planted sessions: user 1 spans midnight (23:50 -> 00:10, one
    session — its +1 lands in day-bin 1 and its -1 in day-bin 2, so the
    answer is only right if the cross-bin offset fold carries it);
    user 2 is an instantaneous session at exactly 00:00; user 3 at
    00:05; user 4 isolated the day before. Peak = 2 concurrent,
    earliest at 00:00 (u2 opens while u1 is active; the later u3
    overlap ties at 2 and must NOT displace the earlier instant)."""
    rows = [
        (1, "2024-01-01 23:50:00"), (1, "2024-01-02 00:10:00"),
        (2, "2024-01-02 00:00:00"),
        (3, "2024-01-02 00:05:00"),
        (4, "2024-01-01 10:00:00"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    ev["ts"] = pd.to_datetime(ev["ts"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["max_concurrency"](sf)
    assert int(mine["max_concurrent"].iloc[0]) == 2
    assert pd.Timestamp(mine["at_ts"].iloc[0]) == \
        pd.Timestamp("2024-01-02 00:00:00")
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["max_concurrency"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_value_locf_hand_checked(ray_session, tmp_path):
    """LOCF edges: a masked row before any observation stays missing
    (counted masked, not imputed); each masked row takes the LATEST
    prior unmasked value, not the first; users with no masked rows emit
    no row."""
    t0 = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: view (no prior -> not imputed), buy 2.00,
        # view (imputes 200), buy 5.00, view (imputes 500)
        (1, t0, 1, "view", 9.99),
        (1, t0 + pd.Timedelta(minutes=1), 2, "purchase", 2.00),
        (1, t0 + pd.Timedelta(minutes=2), 3, "view", 9.99),
        (1, t0 + pd.Timedelta(minutes=3), 4, "purchase", 5.00),
        (1, t0 + pd.Timedelta(minutes=4), 5, "view", 9.99),
        # user 2: never masked -> no output row
        (2, t0, 6, "purchase", 1.00),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type", "value"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["value_locf"](sf)
    assert len(mine) == 1
    r = mine.iloc[0]
    assert (int(r["user_id"]), int(r["n_masked"]), int(r["n_imputed"]),
            int(r["sum_imputed_cents"])) == (1, 3, 2, 700)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["value_locf"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_welch_ttest_known_answer(ray_session, tmp_path):
    """Welch t on tiny planted samples with a hand-computable answer:
    purchase = [1.00, 2.00, 3.00] (mean 200c, var 10000c^2),
    signup = [5.00, 5.00, 5.00, 5.00] (mean 500c, var 0) ->
    t = (200-500)/sqrt(10000/3) = -3*sqrt(3), df -> n1-1 = 2."""
    vals = [("purchase", 1.0), ("purchase", 2.0), ("purchase", 3.0),
            ("signup", 5.0), ("signup", 5.0), ("signup", 5.0),
            ("signup", 5.0)]
    ev = pd.DataFrame(vals, columns=["event_type", "value"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["welch_ttest"](sf)
    r = mine.iloc[0]
    assert (int(r["n_a"]), int(r["n_b"])) == (3, 4)
    assert abs(float(r["t_stat"]) - (-3.0 * np.sqrt(3.0))) < 1e-6
    assert abs(float(r["df_welch"]) - 2.0) < 1e-6
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["welch_ttest"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_char_entropy_edges(ray_session, tmp_path):
    """Entropy edges: uniform 4-char doc = ln(4); single repeated char
    = 0 (flagged low); empty doc = 0 row present (flagged low);
    a prose-ish doc clears the 2.0-nat flag threshold both sides."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["abcd", "aaaaaa", "",
                 "the quick brown fox jumps over the lazy dog"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["char_entropy"](sf).to_pandas() \
        if hasattr(Q.QUERIES["char_entropy"](sf), "to_pandas") \
        else Q.QUERIES["char_entropy"](sf)
    mine = mine.sort_values("doc_id").reset_index(drop=True)
    assert abs(float(mine.loc[0, "h_char"]) - round(np.log(4), 6)) < 1e-9
    assert float(mine.loc[1, "h_char"]) == 0.0
    assert bool(mine.loc[1, "low_entropy"])
    assert int(mine.loc[2, "n_chars"]) == 0
    assert bool(mine.loc[2, "low_entropy"])
    assert not bool(mine.loc[3, "low_entropy"])
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["char_entropy"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_dup_rate_by_source_cross_source(ray_session, tmp_path):
    """Duplicate occurrences count ALL copies (including the 'first')
    and cross-source collisions hit BOTH sources: text X appears in
    src a twice and src b once -> a: 2/3 dup, b: 1/1 dup; unique text
    Y in a -> not dup."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "source": ["a", "a", "b", "a"],
        "text": ["X", "X", "X", "Y"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["dup_rate_by_source"](sf)
    got = {r["source"]: (int(r["n_docs"]), int(r["n_dup_docs"]))
           for _, r in mine.iterrows()}
    assert got == {"a": (3, 2), "b": (1, 1)}
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["dup_rate_by_source"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_mannwhitney_u_known_answer(ray_session, tmp_path):
    """U on a tiny sample with ties, hand arithmetic:
    A = [1.00, 2.00, 2.00], B = [2.00, 3.00]. Combined ranks:
    100 -> 1; the three tied 200s share avg(2,3,4) = 3; 300 -> 5.
    R1 = 1 + 3 + 3 = 7, so 2*R1 = 14 and two_u = 14 - 3*4 = 2
    (U1 = 1). Direct cross-check: A beats B in 0 pairs and ties 2
    (the two 2.00-vs-2.00 half-wins), U1 = 2 * 0.5 = 1. Matches."""
    vals = [("purchase", 1.00), ("purchase", 2.00), ("purchase", 2.00),
            ("signup", 2.00), ("signup", 3.00)]
    ev = pd.DataFrame(vals, columns=["event_type", "value"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["mannwhitney_u"](sf)
    r = mine.iloc[0]
    assert (int(r["n_a"]), int(r["n_b"]), int(r["two_u"])) == (3, 2, 2)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["mannwhitney_u"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_als_user_factors_exact_solve(ray_session, tmp_path):
    """Closed-form check: one user, one event_type with md5 digits
    (q1, q2); rating r. Normal equations (I + qq^T) x = q r give
    x = adj(A) b / det exactly — recompute with Fractions here and
    compare the trunc-micro output, including a NEGATIVE component
    (exercises trunc-toward-zero vs floor)."""
    from fractions import Fraction
    import hashlib as hl
    et = "purchase"
    h = hl.md5(et.encode()).hexdigest()
    q1, q2 = int(h[0], 16) + 1, int(h[1], 16) + 1
    ev = pd.DataFrame({"user_id": [7, 7], "event_type": [et, et],
                       "value": [1.50, 2.50]})  # r = 400 cents
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    r = 400
    a11, a12, a22 = 1 + q1 * q1, q1 * q2, 1 + q2 * q2
    b1, b2 = q1 * r, q2 * r
    det = a11 * a22 - a12 * a12
    exp1 = int(Fraction((a22 * b1 - a12 * b2) * 10**6, det))
    exp2 = int(Fraction((a11 * b2 - a12 * b1) * 10**6, det))
    mine = Q.QUERIES["als_user_factors"](sf)
    row = mine.iloc[0]
    assert (int(row["user_id"]), int(row["x1_micro"]),
            int(row["x2_micro"])) == (7, exp1, exp2)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["als_user_factors"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_ks_test_known_answer(ray_session, tmp_path):
    """KS on disjoint supports = D = 1 exactly (d_num = n1*n2); and a
    hand case with overlap: A=[1,2], B=[2,3] -> CDF gaps at v=1:
    |1*2-0*2|=2, v=2: |2*2-1*2|=2, v=3: 0 -> d_num=2, D=0.5."""
    ev = pd.DataFrame({
        "event_type": ["purchase", "purchase", "signup", "signup"],
        "value": [1.00, 2.00, 2.00, 3.00]})
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["ks_test"](sf)
    r = mine.iloc[0]
    assert (int(r["n_a"]), int(r["n_b"]), int(r["d_num"])) == (2, 2, 2)
    assert abs(float(r["d_stat"]) - 0.5) < 1e-9
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["ks_test"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_wilson_conversion_small_n_ordering(ray_session, tmp_path):
    """The statistical point of the interval: a 2-customer segment at
    100% conversion must have a LOWER Wilson lower bound than a
    40-customer segment at 90% — and a never-converting segment's
    bounds stay in [0, 1)."""
    segs = (["TINY"] * 2) + (["BIG"] * 40) + (["DEAD"] * 3)
    cust = pd.DataFrame({"c_custkey": range(1, len(segs) + 1),
                         "c_mktsegment": segs})
    active = list(range(1, 3)) + list(range(3, 39))  # TINY 2/2, BIG 36/40
    orders = pd.DataFrame({"o_custkey": active * 2})  # dup orders per cust
    sf = str(tmp_path)
    cust.to_parquet(f"{sf}/customer.parquet")
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["wilson_conversion"](sf)
    row = {r["c_mktsegment"]: r for _, r in mine.iterrows()}
    assert (int(row["TINY"]["n_active"]), int(row["BIG"]["n_active"]),
            int(row["DEAD"]["n_active"])) == (2, 36, 0)
    assert float(row["TINY"]["rate"]) == 1.0
    assert float(row["TINY"]["wilson_lo"]) < float(row["BIG"]["wilson_lo"])
    assert 0.0 <= float(row["DEAD"]["wilson_lo"]) \
        and float(row["DEAD"]["wilson_hi"]) < 1.0
    con2 = duckdb.connect()
    for t in ("customer", "orders"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["wilson_conversion"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_user_autocorr_edges(ray_session, tmp_path):
    """A perfectly alternating user has phi = -1 exactly; a monotone
    ramp has phi = +1 on its 3 pairs; a constant-value user (zero
    variance) and a 2-event user (one pair, va or vb degenerate at
    n=1... n_pairs=1 < 2) are EXCLUDED on both sides."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: 1,3,1,3,1 -> pairs alternate, phi = -1
    for i, v in enumerate([1.0, 3.0, 1.0, 3.0, 1.0]):
        rows.append((1, t0 + pd.Timedelta(minutes=i), i, "x", v))
    # user 2: 1,2,3,4 -> phi = +1
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0]):
        rows.append((2, t0 + pd.Timedelta(minutes=i), 10 + i, "x", v))
    # user 3: constant -> excluded; user 4: two events -> excluded
    for i in range(4):
        rows.append((3, t0 + pd.Timedelta(minutes=i), 20 + i, "x", 5.0))
    rows.append((4, t0, 30, "x", 1.0))
    rows.append((4, t0 + pd.Timedelta(minutes=1), 31, "x", 2.0))
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type", "value"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["user_autocorr"](sf)
    got = {int(r["user_id"]): float(r["phi"]) for _, r in mine.iterrows()}
    assert set(got) == {1, 2}
    assert got[1] == -1.0 and got[2] == 1.0
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["user_autocorr"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_source_lang_tvd_hand_checked(ray_session, tmp_path):
    """Hand case: corpus = a{en:2, fr:2}, b{en:4}. Corpus mix
    en:6/8, fr:2/8. TVD(a) = 1/2(|1/2-3/4| + |1/2-1/4|) = 1/4 with
    exact numerator sum_l |n_a(l)*N - n(l)*N_a| = |2*8-6*4| + |2*8-2*4|
    = 8 + 8 = 16 (16 / (2*4*8) = 0.25). TVD(b) covers the MISSING
    (b, fr) cell: |4*8-6*4| + |0*8-2*4| = 8+8 = 16 -> 0.25."""
    docs = pd.DataFrame({
        "doc_id": range(8),
        "source": ["a"] * 4 + ["b"] * 4,
        "lang": ["en", "en", "fr", "fr", "en", "en", "en", "en"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["source_lang_tvd"](sf)
    got = {r["source"]: (int(r["tvd_num"]), float(r["tvd"]))
           for _, r in mine.iterrows()}
    assert got == {"a": (16, 0.25), "b": (16, 0.25)}
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["source_lang_tvd"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_wide_orders_is_lazy_dataset_and_total(ray_session):
    """The materialization op must return a LIVE Dataset (write path,
    never driver-collected) whose row count equals orders (every order
    has a customer, every customer a nation) with the widened schema."""
    res = Q.QUERIES["wide_orders"](SF)
    assert isinstance(res, ray.data.Dataset)
    n_orders = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF}/orders.parquet'").fetchone()[0]
    assert res.count() == n_orders
    cols = set(res.schema().names)
    assert cols == {"o_orderkey", "c_name", "c_mktsegment", "n_name",
                    "o_totalprice"}


def test_price_skewness_split_reassembly(ray_session, tmp_path):
    """The hi/lo reassembly must equal the direct big-int moments on
    values chosen to cross the split boundary (q and r both nonzero,
    max-range cents), and the sign must be right: a long right tail
    gives positive g1."""
    vals = [100.00, 100.00, 100.00, 499999.99]  # right-skewed
    orders = pd.DataFrame({
        "o_orderpriority": ["P"] * 4, "o_totalprice": vals})
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["price_skewness"](sf)
    r = mine.iloc[0]
    cents = [round(v * 100) for v in vals]
    n = len(cents)
    s1, s2, s3 = (sum(c ** k for c in cents) for k in (1, 2, 3))
    m = float(s1) / n
    v = float(s2) / n - m ** 2.0
    g1 = (float(s3) / n - 3.0 * m * (float(s2) / n) + 2.0 * m ** 3.0) \
        / v ** 1.5
    assert (int(r["n"]), float(r["skew_g1"])) == (4, round(g1, 6))
    assert float(r["skew_g1"]) > 1.0
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["price_skewness"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_geomean_prices_exact_fixed_point(ray_session, tmp_path):
    """gm_fixed must be the exact integer sum of floor(ln(cents)*1e9)
    and gm_dollars the exp of it: for [1.00, 100.00] cents are
    [100, 10000], L = floor(ln(100)*1e9) + floor(ln(10000)*1e9),
    geometric mean = 10.00 dollars (up to the 1e-9 quantization)."""
    import math
    orders = pd.DataFrame({"o_orderpriority": ["P", "P"],
                           "o_totalprice": [1.00, 100.00]})
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["geomean_prices"](sf)
    r = mine.iloc[0]
    exp_fixed = (math.floor(math.log(100.0) * 1e9)
                 + math.floor(math.log(10000.0) * 1e9))
    assert int(r["gm_fixed"]) == exp_fixed
    assert abs(float(r["gm_dollars"]) - 10.0) < 1e-3
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["geomean_prices"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_revenue_changepoint_planted_shift(ray_session, tmp_path):
    """A planted level shift: 3 months at ~$10, then 3 months at ~$50
    (with small within-month noise). The detector must place the
    boundary at the last low month and recover both means."""
    rows = []
    for mo, base in [(1, 10.0), (2, 10.2), (3, 9.8),
                     (4, 50.0), (5, 49.5), (6, 50.5)]:
        for d in (5, 15, 25):
            rows.append((pd.Timestamp(f"1995-{mo:02d}-{d:02d}"),
                         base + d * 0.001))
    orders = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["revenue_changepoint"](sf)
    r = mine.iloc[0]
    assert int(r["break_month"]) == 1995 * 12 + 2  # March 1995
    assert (int(r["n_before"]), int(r["n_after"])) == (9, 9)
    assert abs(float(r["mean_before"]) - 10.015) < 0.05
    assert abs(float(r["mean_after"]) - 50.015) < 0.05
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["revenue_changepoint"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_theilsen_trend_robust_to_outlier_month(ray_session, tmp_path):
    """Robustness: monthly means 10, 20, 30, 40 with one wild outlier
    month (1000) planted in the middle. Pairwise slopes cluster at 10
    $/mo; the median must stay 10 exactly (the outlier swings OLS far
    off, which the companion assertion demonstrates)."""
    rows = []
    for i, dollars in enumerate([10.0, 20.0, 1000.0, 40.0, 50.0]):
        rows.append((pd.Timestamp(f"1995-{i+1:02d}-10"), dollars))
    orders = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["theilsen_trend"](sf)
    r = mine.iloc[0]
    assert (int(r["n_months"]), int(r["n_pairs"])) == (5, 10)
    assert float(r["slope_dollars_per_month"]) == 10.0
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["theilsen_trend"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_lang_rollup_other_bucket(ray_session, tmp_path):
    """Rollup edges: ties broken by lang name, OTHER = exact remainder,
    and a corpus with <= 3 langs emits NO OTHER row."""
    docs = pd.DataFrame({
        "doc_id": range(10),
        "lang": ["en"] * 4 + ["fr"] * 2 + ["de"] * 2 + ["es"] + ["it"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["lang_rollup"](sf)
    got = {r["lang"]: (int(r["rnk"]), int(r["n_docs"]))
           for _, r in mine.iterrows()}
    # de/fr tie at 2 -> de first alphabetically
    assert got == {"en": (1, 4), "de": (2, 2), "fr": (3, 2),
                   "OTHER": (4, 2)}
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["lang_rollup"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)
    # <= 3 langs: no OTHER
    sf2 = str(tmp_path) + "/b"
    os.makedirs(sf2)
    docs2 = pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "fr"]})
    docs2.to_parquet(f"{sf2}/documents.parquet")
    m2 = Q.QUERIES["lang_rollup"](sf2)
    assert "OTHER" not in set(m2["lang"])
    con3 = duckdb.connect()
    con3.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf2}/documents.parquet'")
    orc2 = _norm(con3.execute(Q.ORACLE_SQL["lang_rollup"]).df())
    pd.testing.assert_frame_equal(_norm(m2), orc2, check_dtype=False)


def test_incremental_agg_boundary_rows(ray_session, tmp_path):
    """The base/delta boundary must be exclusive/inclusive exactly at
    the cutoff instant: an event AT 2024-01-30 00:00:00 belongs to the
    delta leg only (no double count, no drop) — the classic IVM
    off-by-one. Merge must equal full recompute (ivm_ok gates it)."""
    ev = pd.DataFrame({
        "event_type": ["a", "a", "b"],
        "ts": pd.to_datetime(["2024-01-29 23:59:59",
                              "2024-01-30 00:00:00",
                              "2024-01-30 12:00:00"]),
        "value": [1.00, 2.00, 3.00],
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["incremental_agg"](sf)
    got = {r["event_type"]: (int(r["n"]), int(r["cents"]))
           for _, r in mine.iterrows()}
    assert got == {"a": (2, 300), "b": (1, 300)}
    assert bool(mine["ivm_ok"].all())
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["incremental_agg"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_shard_rebalance_ring_moves_less(ray_session, tmp_path):
    """The whole point of the ring: on a reasonably sized corpus the
    consistent-hash move share must sit near 1/13 and FAR below the
    mod-hash share (~12/13); both counts must match the oracle
    exactly (string-hex ring comparison parity)."""
    docs = pd.DataFrame({"doc_id": range(1, 2001)})
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["shard_rebalance"](sf)
    r = mine.iloc[0]
    assert int(r["n_docs"]) == 2000
    assert float(r["ring_share"]) < 0.25          # ~1/13 expected
    assert float(r["mod_share"]) > 0.8            # ~12/13 expected
    assert float(r["ring_share"]) < float(r["mod_share"]) / 3
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["shard_rebalance"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_zorder_layout_prunes_both_columns(ray_session, tmp_path):
    """The layout trade: with custkey deliberately decorrelated from
    date, date-sorted files have near-perfect day zone maps but useless
    custkey ones (touch frac ~1); Z-order must bring custkey pruning
    far below that while keeping day pruning well under full scan."""
    n = 4096
    i = np.arange(n)
    orders = pd.DataFrame({
        "o_orderkey": i + 1,
        "o_custkey": (i * 37) % n + 1,          # decorrelated permutation
        "o_orderdate": pd.Timestamp("1995-01-01")
        + pd.to_timedelta(i // 8, unit="D"),    # 512 distinct days
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["zorder_layout"](sf)
    row = {r["layout"]: r for _, r in mine.iterrows()}
    ds_, zo = row["date_sort"], row["zorder"]
    assert float(ds_["day_touch_frac"]) < 0.05       # near 1/64
    assert float(ds_["cust_touch_frac"]) > 0.6       # near-useless maps
    assert float(zo["cust_touch_frac"]) < 0.5
    assert float(zo["day_touch_frac"]) < 0.5
    assert float(zo["cust_touch_frac"]) < float(ds_["cust_touch_frac"]) / 2
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["zorder_layout"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_data_contract_counts_planted_violations(ray_session, tmp_path):
    """Violation COUNTS are the contract: plant one bad row per rule
    and assert each rule reports exactly its own violation (and only
    clean rules flag ok)."""
    sf = str(tmp_path)
    pd.DataFrame({
        "o_totalprice": [10.0, -5.0, 20.0],         # one nonpositive
        "o_orderdate": pd.to_datetime(
            ["1995-06-01", "1996-06-01", "1970-01-01"]),  # one pre-1990
    }).to_parquet(f"{sf}/orders.parquet")
    pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["abc", "defg"],
        "n_chars": [3, 99],                          # one inconsistent
        "lang": ["en", "xx"],                        # one out of domain
        "source": ["s", "s"],
    }).to_parquet(f"{sf}/documents.parquet")
    pd.DataFrame({"value": [1.0, 0.0, 2.0]}).to_parquet(
        f"{sf}/events.parquet")                      # all clean
    mine = Q.QUERIES["data_contract"](sf)
    got = {r["rule"]: (int(r["n_violations"]), bool(r["ok"]))
           for _, r in mine.iterrows()}
    assert got == {
        "orders_price_positive": (1, False),
        "orders_date_in_range": (1, False),
        "documents_nchars_consistent": (1, False),
        "documents_lang_in_domain": (1, False),
        "events_value_nonnegative": (0, True),
    }
    con2 = duckdb.connect()
    for t in ("orders", "documents", "events"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["data_contract"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_revenue_anomalies_planted_spike(ray_session, tmp_path):
    """A flat-ish series with one planted 10x spike: only the spike day
    may flag (the early days with < 7 priors are excluded), and the
    spike's z must be large positive."""
    rows = []
    for d in range(12):
        base = 100.0 + (d % 3)  # mild variation so window var > 0
        price = 1000.0 if d == 9 else base
        rows.append((pd.Timestamp("1995-01-01") + pd.Timedelta(days=d),
                     price))
    orders = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["revenue_anomalies"](sf)
    assert list(mine["day"]) == [9]
    assert float(mine["z"].iloc[0]) > 100.0
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["revenue_anomalies"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_knn_int8_recall_vs_bruteforce(ray_session):
    """The quantized ANN's own rows (pre-gate) must overlap the exact
    top-5 well above the 0.8 gate on the fixture corpus — 8-bit
    reconstruction is tight."""
    exact = Q.QUERIES["knn_bruteforce"](SF)
    ann = Q._knn_int8_ann(SF)
    ex = exact.groupby("qid")["vec_id"].apply(set)
    an = ann.groupby("qid")["vec_id"].apply(set)
    recalls = [len(ex[q] & an.get(q, set())) / len(ex[q])
               for q in ex.index]
    assert sum(recalls) / len(recalls) >= 0.8


def test_ooo_inversions_hand_checked(ray_session, tmp_path):
    """Hand case: user 1 arrivals (event_id order) carry ts
    [10:00, 10:05, 10:01] -> only pair (2,3) is inverted (10:05 came
    before the 10:01 event) -> 1 of 3. User 2 in-order -> 0.
    Single-event user 3 -> 0 pairs row."""
    ev = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_id": [1, 2, 3, 4, 5, 6],
        "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-01 10:05",
                              "2024-01-01 10:01", "2024-01-01 09:00",
                              "2024-01-01 09:30", "2024-01-01 08:00"]),
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["ooo_inversions"](sf)
    got = {int(r["user_id"]): (int(r["n_pairs"]), int(r["n_inversions"]))
           for _, r in mine.iterrows()}
    assert got == {1: (3, 1), 2: (1, 0), 3: (0, 0)}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["ooo_inversions"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_sorted_neighborhood_vs_symspell_coverage(ray_session, tmp_path):
    """The blocking-strategy contrast: 'alpha bolt' vs 'alpha colt'
    (ed 1, adjacent in sort) is caught; 'zz aa' vs 'aa zz' (ed 4 but
    far apart in the sorted vocabulary) is NOT — the documented
    windowed-blocking miss. Exact lev values match the oracle."""
    names = ["alpha bolt", "alpha colt", "aa zz", "zz aa", "mid gear"]
    part = pd.DataFrame({"p_name": names * 2})  # dups collapse
    sf = str(tmp_path)
    part.to_parquet(f"{sf}/part.parquet")
    mine = Q.QUERIES["sorted_neighborhood_pairs"](sf)
    pairs = {(r["name_a"], r["name_b"]): int(r["lev_dist"])
             for _, r in mine.iterrows()}
    assert pairs[("alpha bolt", "alpha colt")] == 1
    assert ("aa zz", "zz aa") not in pairs
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["sorted_neighborhood_pairs"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_token_burstiness_hand_checked(ray_session, tmp_path):
    """cf/df by hand: 'x' appears 4 times in 2 docs -> 2.0 (bursty);
    'the' once per doc in 3 docs -> 1.0 (even spread)."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the x x", "the x x", "the y"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["token_burstiness"](sf)
    got = {r["token"]: (int(r["cf"]), int(r["df"]),
                        float(r["burstiness"]))
           for _, r in mine.iterrows()}
    assert got["x"] == (4, 2, 2.0)
    assert got["the"] == (3, 3, 1.0)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["token_burstiness"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_basket_triples_hand_checked(ray_session, tmp_path):
    """Triples by hand: orders {1,2,3}, {1,2,3,4}, {1,2} -> (1,2,3)
    appears in 2 orders, every other triple once, pairs-only orders
    contribute nothing; duplicate lineitem rows collapse."""
    rows = [(1, 1), (1, 2), (1, 3), (1, 3),
            (2, 1), (2, 2), (2, 3), (2, 4),
            (3, 1), (3, 2)]
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    mine = Q.QUERIES["basket_triples"](sf)
    got = {(int(r["part_a"]), int(r["part_b"]), int(r["part_c"])):
           int(r["n_orders"]) for _, r in mine.iterrows()}
    assert got[(1, 2, 3)] == 2
    assert got[(1, 2, 4)] == 1 and got[(2, 3, 4)] == 1
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["basket_triples"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_association_rules_hand_checked(ray_session, tmp_path):
    """Rules by hand: baskets {1,2} x3, {1} x1, {2,3} x3 (7 orders).
    Pair (1,2): n=3 >= minsup; rules 1->2 conf 3/4, 2->1 conf 3/6;
    lift = 3*7/(4*6) = 0.875. Pair (2,3): n=3; 2->3 conf 3/6,
    3->2 conf 3/3 = 1.0; lift = 3*7/(6*3) = 7/6."""
    rows = []
    oid = 0
    for basket, k in [((1, 2), 3), ((1,), 1), ((2, 3), 3)]:
        for _ in range(k):
            oid += 1
            rows.extend((oid, p) for p in basket)
    li = pd.DataFrame(rows, columns=["l_orderkey", "l_partkey"])
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    mine = Q.QUERIES["association_rules"](sf)
    got = {(int(r["antecedent"]), int(r["consequent"])):
           (float(r["confidence"]), float(r["lift"]))
           for _, r in mine.iterrows()}
    assert got[(1, 2)] == (0.75, 0.875)
    assert got[(2, 1)] == (0.5, 0.875)
    assert got[(3, 2)][0] == 1.0
    assert abs(got[(2, 3)][1] - 7/6) < 1e-6
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["association_rules"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_centroid_split_drift_planted(ray_session, tmp_path):
    """Planted drift: label 1's even vectors sit at +1 and odd at -1
    along dim 0 -> drift exactly 2.0; label 2 identical halves ->
    drift 0; label 3 present in only one half emits no row."""
    vecs, labs, ids = [], [], []
    for i in range(8):
        v = np.zeros(4, dtype=np.float32)
        v[0] = 1.0 if i % 2 == 0 else -1.0
        vecs.append(v); labs.append(1); ids.append(i)
    for i in range(8, 12):
        vecs.append(np.full(4, 0.5, dtype=np.float32))
        labs.append(2); ids.append(i)
    vecs.append(np.ones(4, dtype=np.float32)); labs.append(3); ids.append(12)
    emb = pd.DataFrame({"vec_id": ids, "label": labs,
                        "embedding": [list(map(float, v)) for v in vecs]})
    sf = str(tmp_path)
    emb.to_parquet(f"{sf}/embeddings.parquet")
    mine = Q.QUERIES["centroid_split_drift"](sf)
    got = {int(r["label"]): float(r["drift"]) for _, r in mine.iterrows()}
    assert got == {1: 2.0, 2: 0.0}
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["centroid_split_drift"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_bfs_levels_hand_checked(ray_session, tmp_path):
    """BFS on a planted path graph: c1-s1-c2-s2 plus isolated c9-s9.
    Seed = min customer node (c1). Levels: 0:{c1}, 1:{s1}, 2:{c2},
    3:{s2}; the isolated component is never reached."""
    pd.DataFrame({"o_orderkey": [1, 2, 3, 9],
                  "o_custkey": [1, 2, 2, 9]}).to_parquet(
        f"{tmp_path}/orders.parquet")
    pd.DataFrame({"l_orderkey": [1, 2, 3, 9],
                  "l_suppkey": [1, 1, 2, 9]}).to_parquet(
        f"{tmp_path}/lineitem.parquet")
    sf = str(tmp_path)
    mine = Q.QUERIES["bfs_levels"](sf)
    got = {int(r["lvl"]): int(r["n_nodes"]) for _, r in mine.iterrows()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 1}
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["bfs_levels"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_cheapest_suppliers_hand_checked(ray_session, tmp_path):
    """Min-plus by hand: c1 trades with s1 via 2 orders (cost 5000)
    and s2 via 1 (cost 10000); c2 trades with s1 (1 order) and s3
    (2 orders, cost 5000). From seed c1: s1=5000, s2=10000,
    s3 = 5000 + 10000 + 5000 = 20000 via c1-s1-c2-s3 (3 hops).
    A strictly cheaper multi-hop path must beat a direct one: s2 stays
    10000 because no 3-hop alternative is cheaper."""
    pd.DataFrame({"o_orderkey": [1, 2, 3, 4, 5, 6],
                  "o_custkey": [1, 1, 1, 2, 2, 2]}).to_parquet(
        f"{tmp_path}/orders.parquet")
    pd.DataFrame({"l_orderkey": [1, 2, 3, 4, 5, 6],
                  "l_suppkey": [1, 1, 2, 1, 3, 3]}).to_parquet(
        f"{tmp_path}/lineitem.parquet")
    sf = str(tmp_path)
    mine = Q.QUERIES["cheapest_suppliers"](sf)
    got = {int(r["suppkey"]): int(r["cost"]) for _, r in mine.iterrows()}
    assert got == {1: 5000, 2: 10000, 3: 20000}
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["cheapest_suppliers"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_hll_overlap_exact_sets(ray_session, tmp_path):
    """Exact leg/union/intersection on a planted overlap: users 1-6 in
    the first half, 4-9 in the second -> legs 6/6, union 9, both 3;
    the sketch gate passes trivially at this size."""
    rows = []
    for u in range(1, 7):
        rows.append((u, pd.Timestamp("2024-01-05")))
    for u in range(4, 10):
        rows.append((u, pd.Timestamp("2024-01-20")))
    ev = pd.DataFrame(rows, columns=["user_id", "ts"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["hll_overlap"](sf)
    r = mine.iloc[0]
    assert (int(r["n_first_half"]), int(r["n_second_half"]),
            int(r["n_union"]), int(r["n_both"])) == (6, 6, 9, 3)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["hll_overlap"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_ppr_seed_mass_concentrates_near_seed(ray_session, tmp_path):
    """On a path graph c1-s1-c2-s2, PPR from c1 must rank c1 first and
    weight s1 (1 hop) above s2 (3 hops) — locality pagerank does NOT
    have (uniform teleport spreads mass everywhere)."""
    pd.DataFrame({"o_orderkey": [1, 2, 3],
                  "o_custkey": [1, 2, 2]}).to_parquet(
        f"{tmp_path}/orders.parquet")
    pd.DataFrame({"l_orderkey": [1, 2, 3],
                  "l_suppkey": [1, 1, 2]}).to_parquet(
        f"{tmp_path}/lineitem.parquet")
    sf = str(tmp_path)
    mine = Q.QUERIES["ppr_seed"](sf)
    pr = {(r["node_type"], int(r["key"])): float(r["pr"])
          for _, r in mine.iterrows()}
    assert mine.iloc[0]["node_type"] == "C" and int(mine.iloc[0]["key"]) == 1
    assert pr[("S", 1)] > pr[("S", 2)]
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["ppr_seed"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_encoding_audit_hand_checked(ray_session, tmp_path):
    """Byte math by hand: distinct keys [1, 100, 300, 20000].
    Deltas vs prev (first vs 0): 1 (1B), 99 (1B), 200 (2B),
    19700 (3B, >= 16384) -> varint 7 bytes vs raw 32; crossing the
    128 and 16384 varint thresholds exercises the CASE ladder."""
    li = pd.DataFrame({"l_orderkey": [1, 100, 100, 300, 20000]})
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    mine = Q.QUERIES["encoding_audit"](sf)
    r = mine.iloc[0]
    assert (int(r["n_values"]), int(r["raw_bytes"]),
            int(r["varint_bytes"])) == (4, 32, 7)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["encoding_audit"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_key_gaps_planted_hole(ray_session, tmp_path):
    """Planted holes: keys 1..10 plus 50..52 plus 100. Gaps: after 10
    (width 39), after 52 (width 47) -> 2 gaps, widest 47 after key 52,
    missing = 100 - 1 + 1 - 14 = 86. A tie in widest picks the
    EARLIEST start on both sides."""
    keys = list(range(1, 11)) + [50, 51, 52, 100]
    li = pd.DataFrame({"l_orderkey": keys + keys})  # dups collapse
    sf = str(tmp_path)
    li.to_parquet(f"{sf}/lineitem.parquet")
    mine = Q.QUERIES["key_gaps"](sf)
    r = mine.iloc[0]
    assert (int(r["n_distinct"]), int(r["n_gaps"]), int(r["widest_gap"]),
            int(r["gap_after_key"]), int(r["n_missing"])) == \
        (14, 2, 47, 52, 86)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["key_gaps"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_rle_audit_hand_checked(ray_session, tmp_path):
    """Runs by hand: priorities in (date, key) order are
    A A B B A -> 3 runs over 5 rows; floor = 2 distinct. The planted
    same-day rows pin the o_orderkey tiebreak inside the composite
    sort key."""
    orders = pd.DataFrame({
        "o_orderkey": [1, 2, 3, 4, 5],
        "o_orderdate": pd.to_datetime(
            ["1995-01-01", "1995-01-01", "1995-01-02",
             "1995-01-03", "1995-01-03"]),
        "o_orderpriority": ["A", "A", "B", "B", "A"],
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["rle_audit"](sf)
    r = mine.iloc[0]
    assert (int(r["n_rows"]), int(r["runs_date_order"]),
            int(r["runs_floor"])) == (5, 3, 2)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["rle_audit"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_target_encoding_shrinks_rare_categories(ray_session, tmp_path):
    """The smoothing point: a single-row category at $1000 must encode
    FAR closer to the global mean than to its own mean, while a
    1000-row category at $10 encodes near $10. Exact formula checked
    against hand arithmetic."""
    rows = [("COMMON", 10.0)] * 1000 + [("RARE", 1000.0)]
    orders = pd.DataFrame(rows, columns=["o_orderpriority",
                                         "o_totalprice"])
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["target_encoding"](sf)
    got = {r["o_orderpriority"]: float(r["encoded_dollars"])
           for _, r in mine.iterrows()}
    gmean = (1000 * 1000 + 100000) / 1001.0  # cents
    rare = (100000 + 100.0 * gmean) / 101.0 / 100.0
    assert abs(got["RARE"] - round(rare, 6)) < 1e-9
    assert got["RARE"] < 25.0       # shrunk toward ~$11, not $1000
    assert abs(got["COMMON"] - 10.0) < 0.2
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["target_encoding"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_logreg_cv_folds_disjoint_and_learnable(ray_session, tmp_path):
    """On a separable planted problem (urgent iff price > $500) both
    folds must recover a high held-out accuracy, fold sizes must
    partition the table by orderkey parity, and weights must differ
    between folds (they saw different halves)."""
    n = 400
    keys = np.arange(1, n + 1)
    price = np.where(keys % 3 == 0, 900.0, 100.0)
    prio = np.where(price > 500.0, "1-URGENT", "5-LOW")
    orders = pd.DataFrame({"o_orderkey": keys, "o_totalprice": price,
                           "o_orderpriority": prio})
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["logreg_cv"](sf)
    assert list(mine["fold"]) == [0, 1]
    assert int(mine["train_n"].sum()) == n
    for _, r in mine.iterrows():
        assert int(r["train_n"]) + int(r["test_n"]) == n
        assert float(r["test_acc"]) > 0.6
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["logreg_cv"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_noise_distribution_smoothing_property(ray_session, tmp_path):
    """The 3/4-power point: with counts 16 and 1, raw probabilities are
    16/17 vs 1/17 but smoothed are 8/9 vs 1/9 (16^0.75 = 8) — the rare
    token's noise probability RISES. Exact values checked."""
    docs = pd.DataFrame({"doc_id": [1], "text": [" ".join(["a"] * 16 + ["b"])]})
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["noise_distribution"](sf)
    got = {r["token"]: (int(r["cf"]), float(r["noise_p"]))
           for _, r in mine.iterrows()}
    assert got["a"] == (16, round(8 / 9, 6))
    assert got["b"] == (1, round(1 / 9, 6))
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["noise_distribution"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_mixing_schedule_prefix_property(ray_session, tmp_path):
    """Stride scheduling's defining property: with weights 3:1, every
    4-slot prefix carries exactly three 'big' and one 'small', and the
    very first slot goes to the heavier source (earliest tick)."""
    docs = pd.DataFrame({
        "doc_id": range(8),
        "source": ["big"] * 6 + ["small"] * 2,  # 3:1
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["mixing_schedule"](sf)
    seq = list(mine["source"])
    assert seq[0] == "big"
    for i in range(0, 64, 4):
        window = seq[i:i + 4]
        assert window.count("big") == 3 and window.count("small") == 1
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["mixing_schedule"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_vocab_coverage_hand_checked(ray_session, tmp_path):
    """Coverage by hand: counts a:8, b:4, c:2, d:1 (total 15).
    k=1 -> 8/15, k=2 -> 12/15, k=4 -> 15/15; k beyond the vocabulary
    stays at full coverage on both sides."""
    text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
    docs = pd.DataFrame({"doc_id": [1], "text": [text]})
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["vocab_coverage"](sf)
    got = {int(r["k"]): (int(r["covered_tokens"]), float(r["share"]))
           for _, r in mine.iterrows()}
    assert got[1] == (8, round(8 / 15, 6))
    assert got[2] == (12, round(12 / 15, 6))
    assert got[4] == (15, 1.0)
    assert got[4096] == (15, 1.0)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["vocab_coverage"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_self_bleu_hand_checked(ray_session, tmp_path):
    """Bigram precision by hand on 3 tiny docs: doc0 'a b c'
    {ab, bc}, doc1 'a b d' {ab, bd}, doc2 'x y' {xy}.
    p(0->1)=1/2, p(1->0)=1/2, all pairs with doc2 = 0 ->
    mean over 6 ordered pairs = 1/6. A one-token doc contributes
    no pairs on either side."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b c", "a b d", "x y", "solo"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["self_bleu"](sf)
    r = mine.iloc[0]
    assert (int(r["n_docs"]), int(r["n_pairs"])) == (4, 6)
    assert abs(float(r["self_bleu2"]) - round(1 / 6, 6)) < 1e-9
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["self_bleu"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_arrival_rates_hand_checked(ray_session, tmp_path):
    """Gaps by hand: user 1 'click' at t0, t0+10s, t0+30s -> gaps 10,
    20 (n=2, sum 30, mean 15); the interleaved 'view' at t0+5s must
    NOT split the click stream; user 2's single click adds no gap;
    sub-second fractions floor away (10.9s -> 10)."""
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        (1, t0, 1, "click"),
        (1, t0 + pd.Timedelta(seconds=5), 2, "view"),
        (1, t0 + pd.Timedelta(seconds=10, milliseconds=900), 3, "click"),
        (1, t0 + pd.Timedelta(seconds=30), 4, "click"),
        (2, t0, 5, "click"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["arrival_rates"](sf)
    got = {r["event_type"]: (int(r["n_gaps"]), int(r["gap_sec"]))
           for _, r in mine.iterrows()}
    assert got == {"click": (2, 30)}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["arrival_rates"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_sign_test_hand_checked(ray_session, tmp_path):
    """Pairs by hand: u1 spends 1.00 then 2.00 (up), u2 3.00 then
    1.00 (down), u3 2.00 both halves (tie -> dropped), u4 only in the
    first half (no pair) -> n=2, k=1, ties=1, z=0."""
    rows = [
        (1, "2024-01-05", 1.00), (1, "2024-01-20", 2.00),
        (2, "2024-01-05", 3.00), (2, "2024-01-20", 1.00),
        (3, "2024-01-05", 2.00), (3, "2024-01-20", 2.00),
        (4, "2024-01-05", 9.00),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
    ev["ts"] = pd.to_datetime(ev["ts"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["sign_test"](sf)
    r = mine.iloc[0]
    assert (int(r["n_pairs"]), int(r["k_up"]), int(r["n_ties"]),
            float(r["z_stat"])) == (2, 1, 1, 0.0)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["sign_test"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_mcnemar_test_hand_checked(ray_session, tmp_path):
    """Cells by hand: u1 bought only first half, u2+u3 only second,
    u4 both, u5 neither (view only) -> b=1, c=2, both=1, neither=1,
    chi2 = (1-2)^2 / 3 = 1/3."""
    rows = [
        (1, "2024-01-05", "purchase"), (1, "2024-01-20", "view"),
        (2, "2024-01-05", "view"), (2, "2024-01-20", "purchase"),
        (3, "2024-01-20", "purchase"),
        (4, "2024-01-05", "purchase"), (4, "2024-01-20", "purchase"),
        (5, "2024-01-05", "view"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_type"])
    ev["ts"] = pd.to_datetime(ev["ts"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["mcnemar_test"](sf)
    r = mine.iloc[0]
    assert (int(r["n_first_only"]), int(r["n_second_only"]),
            int(r["n_both"]), int(r["n_neither"])) == (1, 2, 1, 1)
    assert abs(float(r["chi2"]) - Q._round_away(1 / 3, 6)) < 1e-12
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["mcnemar_test"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_degree_spend_corr_planted(ray_session, tmp_path):
    """Planted perfect correlation: customer k has k suppliers and
    spends exactly k dollars -> r = 1.0; a customer with orders but no
    lineitems is excluded (inner join, both sides)."""
    orows, lrows, oid = [], [], 0
    for k in (1, 2, 3, 4):
        oid += 1
        orows.append((oid, k, float(k)))
        for s in range(1, k + 1):
            lrows.append((oid, s))
    oid += 1
    orows.append((oid, 99, 1000.0))  # no lineitems -> excluded
    pd.DataFrame(orows, columns=["o_orderkey", "o_custkey",
                                 "o_totalprice"]).to_parquet(
        f"{tmp_path}/orders.parquet")
    pd.DataFrame(lrows, columns=["l_orderkey", "l_suppkey"]).to_parquet(
        f"{tmp_path}/lineitem.parquet")
    sf = str(tmp_path)
    mine = Q.QUERIES["degree_spend_corr"](sf)
    r = mine.iloc[0]
    assert int(r["n_customers"]) == 4
    assert float(r["corr_degree_spend"]) == 1.0
    con2 = duckdb.connect()
    for t in ("orders", "lineitem"):
        con2.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["degree_spend_corr"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_lang_text_stats_hand_checked(ray_session, tmp_path):
    """TTR by hand: lang en has tokens [aa aa bb] across two docs ->
    n_tokens 3, vocab 2, ttr 2/3, mean len 2.0; lang fr [ccc] -> ttr 1,
    len 3. Cross-doc duplicate vocab must not double count."""
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "lang": ["en", "en", "fr"],
        "text": ["aa aa", "bb", "ccc"],
    })
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    mine = Q.QUERIES["lang_text_stats"](sf)
    got = {r["lang"]: (int(r["n_tokens"]), int(r["n_vocab"]),
                       float(r["ttr"]), float(r["mean_word_len"]))
           for _, r in mine.iterrows()}
    assert got["en"] == (3, 2, Q._round_away(2 / 3, 6), 2.0)
    assert got["fr"] == (1, 1, 1.0, 3.0)
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["lang_text_stats"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_cramers_v_extremes(ray_session, tmp_path):
    """V = 1 on a perfectly dependent 2x2 grid (type determines
    weekday) and V = 0 on a perfectly independent one — with counts
    chosen so absent cells exercise the observed-zero handling."""
    # dependent: 'a' only on Monday (2024-01-01), 'b' only on Tuesday
    ev = pd.DataFrame({
        "event_type": ["a"] * 5 + ["b"] * 7,
        "ts": pd.to_datetime(["2024-01-01"] * 5 + ["2024-01-02"] * 7),
    })
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    r = Q.QUERIES["cramers_v"](sf).iloc[0]
    assert float(r["cramers_v"]) == 1.0
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["cramers_v"]).df())
    pd.testing.assert_frame_equal(_norm(Q.QUERIES["cramers_v"](sf)), orc,
                                  check_dtype=False)
    # independent: same type mix on both days
    sf2 = str(tmp_path) + "/b"
    os.makedirs(sf2)
    ev2 = pd.DataFrame({
        "event_type": ["a", "b"] * 4,
        "ts": pd.to_datetime(["2024-01-01", "2024-01-01",
                              "2024-01-02", "2024-01-02"] * 2),
    })
    ev2.to_parquet(f"{sf2}/events.parquet")
    r2 = Q.QUERIES["cramers_v"](sf2).iloc[0]
    assert float(r2["cramers_v"]) == 0.0


def test_markov_backtest_hand_checked(ray_session, tmp_path):
    """Train half: user 1 stream A,B,A,B -> P(B|A) wins, P(A|B) wins.
    Test half: user 1 stream A,B,C: transitions (A->B) hit,
    (B->C) miss -> accuracy 1/2. A cutoff-straddling pair (last train
    event -> first test event) must count in NEITHER half. Test
    transitions from an UNSEEN prev (C->A for user 2) are excluded."""
    t, rows = pd.Timestamp("2024-01-05"), []
    for i, et in enumerate(["A", "B", "A", "B"]):
        rows.append((1, t + pd.Timedelta(minutes=i), i, et))
    t2 = pd.Timestamp("2024-01-20")
    for i, et in enumerate(["A", "B", "C"]):
        rows.append((1, t2 + pd.Timedelta(minutes=i), 10 + i, et))
    rows.append((2, t2, 20, "C"))
    rows.append((2, t2 + pd.Timedelta(minutes=1), 21, "A"))
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["markov_backtest"](sf)
    r = mine.iloc[0]
    assert (int(r["n_test"]), int(r["n_hits"])) == (2, 1)
    assert float(r["accuracy"]) == 0.5
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["markov_backtest"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_dow_seasonality_hand_checked(ray_session, tmp_path):
    """2024-01-01 was a Monday: orders on Mon ($10, $20) and Tue
    ($30) give Mon mean 15 vs overall 20 -> index 0.75; Tue 30/20 ->
    1.5. Pins the Monday=0 key convention on both sides."""
    orders = pd.DataFrame({
        "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-01",
                                       "2024-01-02"]),
        "o_totalprice": [10.0, 20.0, 30.0],
    })
    sf = str(tmp_path)
    orders.to_parquet(f"{sf}/orders.parquet")
    mine = Q.QUERIES["dow_seasonality"](sf)
    got = {int(r["dow"]): (int(r["n_orders"]), float(r["index_value"]))
           for _, r in mine.iterrows()}
    assert got == {0: (2, 0.75), 1: (1, 1.5)}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["dow_seasonality"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_session_entry_exit_hand_checked(ray_session, tmp_path):
    """User 1: session [A, B, C] (within 30min) then a 2h gap then
    [B]; user 2: [C, A]. Pairs: (A,C):1, (B,B):1, (C,A):1 — the
    single-event session maps entry == exit."""
    t0 = pd.Timestamp("2024-01-01 00:00")
    rows = [
        (1, t0, 1, "A"), (1, t0 + pd.Timedelta(minutes=5), 2, "B"),
        (1, t0 + pd.Timedelta(minutes=10), 3, "C"),
        (1, t0 + pd.Timedelta(hours=3), 4, "B"),
        (2, t0, 5, "C"), (2, t0 + pd.Timedelta(minutes=1), 6, "A"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["session_entry_exit"](sf)
    got = {(r["entry"], r["exit"]): int(r["n_sessions"])
           for _, r in mine.iterrows()}
    assert got == {("A", "C"): 1, ("B", "B"): 1, ("C", "A"): 1}
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["session_entry_exit"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)


def test_abandonment_rate_hand_checked(ray_session, tmp_path):
    """Monday sessions: [view] (abandoned), [view, purchase]
    (converted), [purchase] (no view -> excluded) -> 2 view sessions,
    1 abandoned, rate 0.5."""
    t0 = pd.Timestamp("2024-01-01 08:00")  # a Monday
    rows = [
        (1, t0, 1, "view"),
        (2, t0, 2, "view"), (2, t0 + pd.Timedelta(minutes=5), 3,
                             "purchase"),
        (3, t0, 4, "purchase"),
    ]
    ev = pd.DataFrame(rows, columns=["user_id", "ts", "event_id",
                                     "event_type"])
    sf = str(tmp_path)
    ev.to_parquet(f"{sf}/events.parquet")
    mine = Q.QUERIES["abandonment_rate"](sf)
    assert len(mine) == 1
    r = mine.iloc[0]
    assert (int(r["dow"]), int(r["n_view_sessions"]),
            int(r["n_abandoned"]), float(r["abandon_rate"])) == \
        (0, 2, 1, 0.5)
    con2 = duckdb.connect()
    con2.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    orc = _norm(con2.execute(Q.ORACLE_SQL["abandonment_rate"]).df())
    pd.testing.assert_frame_equal(_norm(mine), orc, check_dtype=False)
