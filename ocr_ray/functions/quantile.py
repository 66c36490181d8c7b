"""Mergeable quantile summaries with deterministic rank-error bounds.

The single-pass 100 TB quantile path (the exact histogram-narrowing
median in queries.q_median_prices needs O(passes) scans; a summary
needs ONE): each ``map_batches`` task emits a compact weighted summary
of its batch, summaries merge associatively, and any quantile query on
the merged summary returns a VALUE INTERVAL guaranteed to contain the
true quantile — the guarantee is carried as an explicit rank-error
budget ``err`` that every merge/compaction updates conservatively
(Greenwald–Khanna-style accounting; Agarwal et al., "Mergeable
Summaries", PODS 2012, §3).

A summary is ``(vals, wts, err, n)``: ``vals`` sorted, ``wts`` (float)
the weight each value represents, ``n`` the true item count
(``wts.sum() == n`` up to float rounding), and ``err`` an upper bound
on ``|estimated_rank - true_rank|`` for every value.

- merge: concat + sort; errors ADD (each side's ranks are off by at
  most its own err).
- compaction (size > 2k -> k): equal-weight resampling at the k
  mid-target cumulative ranks; reassigning an item's weight to the
  selected value within its W/k-wide rank stripe moves any rank
  estimate by at most W/k, so ``err += W/k``.
- a tree (binary-counter) fold over m batch summaries therefore ends
  with err <= (W/k) * (log2 m + 2) — sublinear in m, tunable by k.

No reference counterpart; public algorithms.
"""
from __future__ import annotations

import numpy as np

__all__ = ["qsummary", "qmerge", "qfold", "quantile_interval"]


def qsummary(values: np.ndarray, k: int = 1024) -> tuple:
    """Summarize one batch: exact (err=0) when it fits in ``k*2``
    entries, else one compaction."""
    v = np.sort(np.asarray(values, dtype=np.float64))
    s = (v, np.ones(len(v)), 0.0, len(v))
    return _compact(s, k) if len(v) > 2 * k else s


def qmerge(a: tuple, b: tuple, k: int = 1024) -> tuple:
    """Merge two summaries; compacts when the result exceeds ``2k``."""
    va, wa, ea, na = a
    vb, wb, eb, nb = b
    order = np.argsort(np.concatenate([va, vb]), kind="mergesort")
    vals = np.concatenate([va, vb])[order]
    wts = np.concatenate([wa, wb])[order]
    s = (vals, wts, ea + eb, na + nb)
    return _compact(s, k) if len(vals) > 2 * k else s


def _compact(s: tuple, k: int) -> tuple:
    vals, wts, err, n = s
    W = float(wts.sum())
    cum = np.cumsum(wts)
    # the value whose cumulative-weight stripe covers each of the k
    # mid-targets; all W/k of that stripe's weight is reassigned to it
    targets = (np.arange(k) + 0.5) * (W / k)
    idx = np.minimum(np.searchsorted(cum, targets, side="left"), len(vals) - 1)
    return vals[idx], np.full(k, W / k), err + W / k, n


def qfold(summaries, k: int = 1024) -> tuple:
    """Binary-counter tree fold over an ITERABLE of summaries: holds
    O(log m) summaries (one per level), so a driver can stream
    ``iter_batches`` output through it without materializing all m
    partials — the same shape as the Bloom build's streaming OR.
    Folding pairs of equal tree height keeps the final err at
    (W/k)*O(log m) instead of the linear fold's (W/k)*O(m)."""
    levels: list[tuple | None] = []
    for s in summaries:
        carry = s
        i = 0
        while i < len(levels) and levels[i] is not None:
            carry = qmerge(levels[i], carry, k)
            levels[i] = None
            i += 1
        if i == len(levels):
            levels.append(None)
        levels[i] = carry
    acc = None
    for s in levels:
        if s is not None:
            acc = s if acc is None else qmerge(acc, s, k)
    if acc is None:
        raise ValueError("qfold: no summaries")
    return acc


def quantile_interval(s: tuple, rank: float) -> tuple[float, float]:
    """[lo, hi] values guaranteed to bracket the item of true rank
    ``rank`` (1-based): every summary value whose estimated-rank
    interval ± err could cover ``rank`` is a candidate; return the
    candidates' min/max. With err=0 this collapses to the exact value."""
    vals, wts, err, n = s
    if len(vals) == 0:
        raise ValueError("empty summary")
    cum = np.cumsum(wts)
    # value i's estimated rank span is the half-open (cum[i-1], cum[i]];
    # widen both ends by err (lower end stays exclusive)
    lo_rank = np.concatenate([[0.0], cum[:-1]]) - err
    hi_rank = cum + err
    cand = (hi_rank >= rank) & (lo_rank < rank)
    if not cand.any():  # rank beyond the summary's span (defensive)
        return float(vals[0]), float(vals[-1])
    return float(vals[cand].min()), float(vals[cand].max())
