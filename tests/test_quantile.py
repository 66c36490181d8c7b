"""Mergeable quantile summaries (functions/quantile.py): the claimed
rank-error budget must upper-bound the realized error, and quantile
intervals must bracket the true order statistics, on adversarial
layouts and any fold shape."""
import numpy as np
import pytest

from ocr_ray.functions import quantile as QU


def _true_value(sorted_all: np.ndarray, rank: int) -> float:
    return float(sorted_all[rank - 1])


def test_exact_when_small():
    v = np.array([5.0, 1.0, 3.0, 2.0, 4.0])
    s = QU.qsummary(v, k=16)
    assert s[2] == 0.0
    lo, hi = QU.quantile_interval(s, 3)
    assert lo == hi == 3.0


@pytest.mark.parametrize("layout", ["sorted", "reversed", "dups", "zipf"])
@pytest.mark.parametrize("k", [64, 256])
def test_interval_contains_true_quantiles(layout, k):
    rng = np.random.default_rng(11)
    n = 20000
    if layout == "sorted":
        data = np.arange(n, dtype=np.float64)
    elif layout == "reversed":
        data = np.arange(n, dtype=np.float64)[::-1]
    elif layout == "dups":
        data = rng.choice([1.0, 2.0, 2.0, 3.0, 100.0], size=n)
    else:
        data = rng.zipf(1.5, size=n).astype(np.float64)
    s = QU.qsummary(data, k=k)
    sorted_all = np.sort(data)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        rank = max(1, int(q * n))
        lo, hi = QU.quantile_interval(s, rank)
        assert lo <= _true_value(sorted_all, rank) <= hi, (layout, k, q)


def test_fold_bounds_and_err_budget():
    rng = np.random.default_rng(5)
    batches = [rng.normal(loc=rng.uniform(-5, 5), size=rng.integers(50, 3000))
               for _ in range(40)]
    all_v = np.sort(np.concatenate(batches))
    n, k = len(all_v), 256
    s = QU.qfold((QU.qsummary(b, k=k) for b in batches), k=k)
    vals, wts, err, n_s = s
    assert n_s == n and abs(wts.sum() - n) < 1e-6 * n
    # claimed budget is sublinear in the number of batches
    assert err <= (n / k) * (np.log2(len(batches)) + 2)
    # realized rank error of every summary value <= claimed err
    est = np.cumsum(wts)
    true_rank = np.searchsorted(all_v, vals, side="right")
    assert np.all(np.abs(est - true_rank) <= err + 1e-6)
    # median interval brackets the true lower median
    rank = (n + 1) // 2
    lo, hi = QU.quantile_interval(s, rank)
    assert lo <= _true_value(all_v, rank) <= hi


def test_fold_order_invariant_validity():
    rng = np.random.default_rng(9)
    batches = [rng.exponential(size=500) for _ in range(9)]
    all_v = np.sort(np.concatenate(batches))
    rank = (len(all_v) + 1) // 2
    true = _true_value(all_v, rank)
    k = 64
    for order in (range(9), reversed(range(9))):
        s = QU.qfold((QU.qsummary(batches[i], k=k) for i in order), k=k)
        lo, hi = QU.quantile_interval(s, rank)
        assert lo <= true <= hi


def test_fold_empty_raises_and_single_passthrough():
    with pytest.raises(ValueError):
        QU.qfold(iter(()), k=8)
    v = np.array([2.0, 1.0])
    s = QU.qfold(iter([QU.qsummary(v, k=8)]), k=8)
    assert QU.quantile_interval(s, 1) == (1.0, 1.0)
