"""Bloom filter: no false negatives (the anti-join safety property),
realized fpp near the target, order-independent OR-combine, and the
end-to-end pruned anti-join equality on a high-fpp filter."""
import numpy as np
import pandas as pd
import pytest

from ocr_ray.functions import bloom


def test_params_sizing():
    m, k = bloom.bloom_params(10_000, fpp=0.01)
    assert m % 64 == 0
    assert 9 * 10_000 <= m <= 11 * 10_000  # ~9.6 bits/key at 1%
    assert 5 <= k <= 9  # ~6.6 optimal
    m1, k1 = bloom.bloom_params(0)
    assert m1 >= 64 and k1 >= 1


def test_no_false_negatives_and_fpp_bound():
    rng = np.random.default_rng(3)
    present = rng.choice(10**9, 20_000, replace=False).astype(np.int64)
    absent = (rng.choice(10**9, 50_000, replace=False) + 10**9).astype(np.int64)
    m, k = bloom.bloom_params(len(present), fpp=0.01)
    words = bloom.bloom_partial(present, m, k)
    assert bloom.bloom_might_contain(words, present, k).all()  # never FN
    fpp = bloom.bloom_might_contain(words, absent, k).mean()
    assert fpp <= 0.03  # target 1%, generous bound


def test_or_combine_matches_single_build():
    rng = np.random.default_rng(5)
    keys = rng.choice(10**12, 9_000, replace=False).astype(np.int64)
    m, k = bloom.bloom_params(len(keys))
    whole = bloom.bloom_partial(keys, m, k)
    chunks = [bloom.bloom_partial(c, m, k).tobytes()
              for c in np.array_split(keys, 7)]
    rng.shuffle(chunks)  # OR is order-independent
    np.testing.assert_array_equal(bloom.bloom_or(chunks), whole)
    with pytest.raises(ValueError):
        bloom.bloom_or([])


def test_negative_keys_and_empty_batches():
    keys = np.array([-5, -1, 0, 7, 2**62], dtype=np.int64)
    m, k = bloom.bloom_params(5)
    words = bloom.bloom_partial(keys, m, k)
    assert bloom.bloom_might_contain(words, keys, k).all()
    empty = bloom.bloom_partial(np.array([], dtype=np.int64), m, k)
    assert not empty.any()
    assert bloom.bloom_might_contain(words, np.array([], dtype=np.int64), k).size == 0


def test_pruned_antijoin_exact_under_heavy_fpp():
    """customers_no_orders stays oracle-exact even when the filter is
    DELIBERATELY tiny (high fpp): positives are exact-checked, so false
    positives cost shuffle volume, never correctness. Exercised through
    the same split logic with a 64-bit filter over 500 keys."""
    rng = np.random.default_rng(9)
    build = rng.choice(10_000, 500, replace=False).astype(np.int64)
    probe = np.arange(10_000, dtype=np.int64)
    m, k = 64, 2  # absurdly undersized on purpose
    words = bloom.bloom_partial(build, m, k)
    hit = bloom.bloom_might_contain(words, probe, k)
    assert hit.mean() > 0.3  # the undersizing really does flood fps
    kept = probe[~hit]
    checked = probe[hit]
    exact_kept = checked[~np.isin(checked, build)]
    result = np.sort(np.concatenate([kept, exact_kept]))
    expected = np.sort(probe[~np.isin(probe, build)])
    np.testing.assert_array_equal(result, expected)


def test_customers_no_orders_query_matches_plain_antijoin(ray_session):
    """The bloom-pruned catalog query equals a driver-side pandas
    anti-join over the same tables (the SQL oracle also pins this at
    the driver's scale)."""
    from ocr_ray import queries as Q

    sf = "/root/testdata/sf0.001"
    got = Q.QUERIES["customers_no_orders"](sf)
    cust = pd.read_parquet(f"{sf}/customer.parquet", columns=["c_custkey"])
    orders = pd.read_parquet(f"{sf}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    hv = orders.loc[orders["o_totalprice"] > 400_000, "o_custkey"].unique()
    want = cust.loc[~cust["c_custkey"].isin(hv), "c_custkey"] \
               .astype("int64").sort_values().reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["c_custkey"].reset_index(drop=True), want, check_names=False)
