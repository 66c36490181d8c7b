"""Mergeable SpaceSaving heavy-hitters summaries (functions/sketch.py):
the truncated per-batch summary + merge must bound every true count and
never lose a true top-k key, on adversarial splits included."""
import numpy as np
import pandas as pd
import pytest

from ocr_ray.functions import sketch as SK


def _batches_to_parts(batches, m):
    parts = []
    for bid, toks in enumerate(batches):
        s = SK.topk_summarize(pd.Series(toks), m=m)
        s["bid"] = bid
        parts.append(s)
    return pd.concat(parts, ignore_index=True) if parts else pd.DataFrame(
        {"token": [], "n": [], "eps": [], "bid": []})


def test_summarize_keeps_topm_and_eps():
    toks = pd.Series(["a"] * 5 + ["b"] * 3 + ["c"] * 2 + ["d"])
    s = SK.topk_summarize(toks, m=2)
    assert list(s["token"]) == ["a", "b"]
    assert list(s["n"]) == [5, 3]
    # eps = largest dropped count = count(c) = 2, same on every row
    assert set(s["eps"]) == {2}


def test_summarize_no_drop_has_zero_eps_and_empty_batch_empty():
    s = SK.topk_summarize(pd.Series(["x", "x", "y"]), m=8)
    assert set(s["eps"]) == {0} and len(s) == 2
    assert len(SK.topk_summarize(pd.Series([], dtype=object), m=8)) == 0


def test_merge_bounds_contain_true_counts_adversarial_split():
    # "h" is the global heavy hitter but only a batch-local top-1 in
    # half the batches; elsewhere a local majority token crowds it out
    # of the m=1 summary, so its lower underestimates and eps must make
    # up the difference exactly
    batches = [["h"] * 6 + [f"kept{i}"] * 5 for i in range(3)]
    batches += [["h"] * 3 + [f"crowd{i}"] * 5 for i in range(3)]
    true = pd.Series([t for b in batches for t in b]).value_counts()
    parts = _batches_to_parts(batches, m=1)
    merged = SK.topk_merge(parts, k=2)
    got = merged.set_index("token")
    # every candidate's true count inside [lower, upper]
    for tok, row in got.iterrows():
        assert row["lower"] <= true[tok] <= row["upper"], tok
    # exact arithmetic: lower(h)=18 (3 kept batches), eps_seen(h)=3*5,
    # total_eps=3*5+3*3, upper=18+24-15=27=true(h)
    assert "h" in got.index
    assert got.loc["h", "lower"] == 18 and got.loc["h", "upper"] == 27
    assert true["h"] == 27


def test_merge_candidates_superset_of_true_topk_random():
    rng = np.random.default_rng(7)
    # 10 planted heavies over a long light tail: the heavies' counts
    # exceed total_eps (asserted below), so the SpaceSaving guarantee
    # applies and the candidate set must contain the true top-10
    heavies = [f"H{i}" for i in range(10)]
    tail = [f"t{i}" for i in range(2000)]
    draws = np.concatenate([
        np.repeat(heavies, 400),
        rng.choice(tail, size=16000),
    ])
    rng.shuffle(draws)
    cuts = np.sort(rng.choice(np.arange(1, len(draws)), size=15, replace=False))
    batches = [list(a) for a in np.split(draws, cuts)]
    true = pd.Series(draws).value_counts()
    for m in (16, 64):
        parts = _batches_to_parts(batches, m=m)
        total_eps = int(parts.groupby("bid")["eps"].first().sum())
        assert all(true[h] > total_eps for h in heavies), (m, total_eps)
        # full merged summary (k larger than vocab disables truncation):
        # bounds contain truth, and every key over total_eps survives
        full = SK.topk_merge(parts, k=10**9).set_index("token")
        for tok, row in full.iterrows():
            assert row["lower"] <= true[tok] <= row["upper"], (m, tok)
        for tok, cnt in true.items():
            if cnt > total_eps:
                assert tok in full.index, (m, tok)
        # truncated candidate set still contains the true top-10
        got = SK.topk_merge(parts, k=10).set_index("token")
        top10 = set(true.sort_values(ascending=False).head(10).index)
        assert top10 <= set(got.index), m


def test_merge_empty_and_exact_when_nothing_dropped():
    assert len(SK.topk_merge(_batches_to_parts([], 4), k=5)) == 0
    batches = [["a", "a", "b"], ["b", "c"]]
    parts = _batches_to_parts(batches, m=8)  # m > vocab: nothing dropped
    merged = SK.topk_merge(parts, k=2).set_index("token")
    true = pd.Series([t for b in batches for t in b]).value_counts()
    for tok, row in merged.iterrows():
        # zero total_eps -> bounds collapse to the exact count
        assert row["lower"] == row["upper"] == true[tok]


def test_sentinel_encoding_matches_topk_merge():
    """Drift guard: q_top_tokens renders the merge as a bucketed combine
    over sentinel-encoded rows (lo / es columns + one eps row per batch)
    instead of bid-tagged topk_merge; both must produce identical
    [lower, upper] bounds or one of the two implementations has drifted."""
    rng = np.random.default_rng(3)
    batches = [list(rng.choice([f"t{i}" for i in range(40)], size=200))
               for _ in range(7)]
    m = 8
    # reference: bid-tagged summaries through topk_merge (untruncated)
    parts = _batches_to_parts(batches, m=m)
    ref = SK.topk_merge(parts, k=10**9).set_index("token")
    # query-style: per-batch rows (token, lo, es) + one ("", 0, eps)
    # sentinel, merged with plain per-token sums
    rows = []
    for toks in batches:
        s = SK.topk_summarize(pd.Series(toks), m=m)
        eps = int(s["eps"].iloc[0]) if len(s) else 0
        rows.append(pd.DataFrame(
            {"token": s["token"], "lo": s["n"], "es": eps}))
        rows.append(pd.DataFrame({"token": [""], "lo": [0], "es": [eps]}))
    merged = pd.concat(rows).groupby("token").sum()
    total_eps = int(merged.loc["", "es"])
    merged = merged.drop(index="")
    merged["upper"] = merged["lo"] + (total_eps - merged["es"])
    assert set(merged.index) == set(ref.index)
    for tok in merged.index:
        assert merged.loc[tok, "lo"] == ref.loc[tok, "lower"], tok
        assert merged.loc[tok, "upper"] == ref.loc[tok, "upper"], tok


def test_summarize_counts_matches_summarize():
    toks = pd.Series(["a"] * 4 + ["b"] * 2 + ["c"])
    a = SK.topk_summarize(toks, m=2)
    b = SK.topk_summarize_counts(toks.value_counts(), m=2)
    pd.testing.assert_frame_equal(a, b)


def test_cms_overestimate_and_merge():
    """CMS point estimates never undercount; partial merge equals the
    one-shot sketch; unseen keys read (near-)zero; an adversarial
    heavy-hitter stream stays within the 2N/w bound with slack."""
    import numpy as np
    import pandas as pd
    from ocr_ray.functions import sketch as S

    rng = np.random.default_rng(3)
    keys = pd.Series(rng.choice([f"t{i}" for i in range(500)], size=5000))
    one = S.cms_partial(keys)
    halves = S.cms_merge([S.cms_partial(keys[:2500]),
                          S.cms_partial(keys[2500:])])
    assert (one == halves).all()
    truth = keys.value_counts()
    est = S.cms_query(one, pd.Series(truth.index))
    assert (est >= truth.to_numpy()).all()
    bound = 2 * len(keys) / S.CMS_W
    assert (est - truth.to_numpy() <= 4 * bound + 1).all()
    # unseen key: bounded by collisions only
    assert S.cms_query(one, pd.Series(["never-seen"]))[0] <= 4 * bound + 1
