"""Mergeable heavy-hitters summaries (distributed SpaceSaving).

The 100 TB top-k pattern when even the per-bucket pruned combine is too
wide (vocabulary ~ corpus size): each ``map_batches`` task emits a
TRUNCATED count summary — its exact counts for the batch's top ``m``
keys plus the batch's truncation bound ``eps`` (the largest dropped
count; every omitted key occurred at most ``eps`` times in that batch).
Summaries merge with plain per-key sums (Agarwal et al., "Mergeable
Summaries", PODS 2012; Metwally et al.'s SpaceSaving guarantee):

    lower(key) = sum of counts from batches that kept the key
    upper(key) = lower(key) + (total_eps - eps_seen(key))

so the true count is always inside [lower, upper], and any key whose
true count exceeds ``total_eps`` is guaranteed to survive in some
batch's summary. Both sums are ordinary per-key aggregations — the
merge runs through the same bucketed combine as an exact count, but
over at most ``m x n_batches`` rows instead of the full vocabulary.

No reference counterpart; public algorithms.
"""
from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["topk_summarize", "topk_summarize_counts", "topk_merge"]


def topk_summarize(tokens: pd.Series, m: int = 64) -> pd.DataFrame:
    """One batch's truncated summary: (token, n, eps) rows for the
    batch's top-``m`` tokens by exact count; ``eps`` (same value on
    every row of the batch) is the largest dropped count — 0 when
    nothing was dropped. An empty batch yields zero rows (and
    contributes nothing to total_eps)."""
    return topk_summarize_counts(tokens.value_counts(), m)


def topk_summarize_counts(c: pd.Series, m: int = 64) -> pd.DataFrame:
    """:func:`topk_summarize` over precomputed ``value_counts`` output
    (descending counts indexed by token) — callers that already hold the
    batch's exact counts (e.g. a fused exact+summary pass) avoid a
    second count."""
    if len(c) == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64"),
                             "eps": pd.Series([], dtype="int64")})
    kept = c.iloc[:m]
    eps = int(c.iloc[m]) if len(c) > m else 0
    return pd.DataFrame({"token": kept.index.to_numpy(),
                         "n": kept.to_numpy().astype(np.int64),
                         "eps": np.int64(eps)})


def topk_merge(parts: pd.DataFrame, k: int) -> pd.DataFrame:
    """Merge per-batch summaries into top-``k`` candidates with bounds.

    ``parts`` is the concatenation of :func:`topk_summarize` outputs
    (one eps per batch, repeated on its rows). Returns (token, lower,
    upper) sorted by lower desc, truncated to the keys whose upper
    bound reaches the k-th lower bound — the provably-complete
    candidate set for the true top-k."""
    if len(parts) == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "lower": pd.Series([], dtype="int64"),
                             "upper": pd.Series([], dtype="int64")})
    # one eps per batch: rows within a batch repeat it, so total_eps is
    # the sum over distinct batches — recover it from per-batch groups
    # by taking eps once per (batch) via the first row of each summary.
    # Callers tag rows with a per-batch id column "bid".
    batch_eps = parts.groupby("bid")["eps"].first()
    total_eps = int(batch_eps.sum())
    g = parts.groupby("token").agg(lower=("n", "sum"), eps_seen=("eps", "sum"))
    g["upper"] = g["lower"] + (total_eps - g["eps_seen"])
    g = g.sort_values(["lower"], ascending=False)
    kth_lower = int(g["lower"].iloc[min(k, len(g)) - 1]) if len(g) else 0
    cand = g[g["upper"] >= kth_lower].reset_index()
    return cand[["token", "lower", "upper"]]


# --------------------------------------------------------------- count-min
# Cormode & Muthukrishnan's count-min sketch (public): a (d x w) grid
# of counters; each key increments one counter per row (row-seeded
# hash), a point query reads the MIN across rows. Deterministic
# overestimate: est >= true count always; est <= true + 2N/w with
# probability >= 1 - 2^-d per query. Partials merge by plain addition,
# so the sketch streams through map_batches as one (d*w) int64 blob
# per batch and the driver folds O(batches) blobs — nothing
# vocabulary-sized anywhere.

CMS_W = 1024
CMS_D = 4
_CMS_KEYS = [f"cmsrow{r:04d}_0123456789"[:16] for r in range(CMS_D)]


def _cms_idx(keys: pd.Series, row: int) -> np.ndarray:
    h = pd.util.hash_array(keys.to_numpy(dtype=object),
                           hash_key=_CMS_KEYS[row])
    return (h % CMS_W).astype(np.int64)


def cms_partial(keys: pd.Series, counts: np.ndarray | None = None,
                ) -> np.ndarray:
    """(CMS_D, CMS_W) int64 partial for one batch; ``counts`` weights
    each key (defaults to 1 per occurrence row)."""
    w = np.ones(len(keys), dtype=np.int64) if counts is None \
        else counts.astype(np.int64)
    out = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for r in range(CMS_D):
        out[r] = np.bincount(_cms_idx(keys, r), weights=w,
                             minlength=CMS_W).astype(np.int64)
    return out


def cms_merge(parts) -> np.ndarray:
    """Sum of partials — mergeability is plain addition."""
    out = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for p in parts:
        out += p
    return out


def cms_query(cms: np.ndarray, keys: pd.Series) -> np.ndarray:
    """Point estimates: MIN across the d row counters per key."""
    est = np.full(len(keys), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(CMS_D):
        est = np.minimum(est, cms[r, _cms_idx(keys, r)])
    return est
