"""Distributed Bloom filter for semi-join / anti-join pruning.

The 100 TB join pattern Ray Data lacks natively: instead of shuffling
BOTH sides of a key join, build a compact bitmap over the build side's
keys (per-batch partial bitmaps emitted from ``map_batches``, combined
with a bitwise OR — order-independent, so the combine is trivially
parallel and the driver only ever holds O(bits) state), broadcast it
once via ``ray.put``, and stream the probe side through it:

- bloom-NEGATIVE rows are *definitely* not in the build side — for an
  anti-join they are final output and skip the shuffle entirely;
- bloom-POSITIVE rows (true hits + the configured false-positive
  sliver) are the only rows that pay the exact bucketed join.

At TPC-H-ish selectivities this removes the shuffle for the vast
majority of probe rows. Bitmap sizing is the textbook formula (Bloom
1970; m = -n ln p / ln^2 2, k = m/n ln 2). At 10^12-key scale the
single bitmap no longer fits a task heap — shard the filter by key
range and route probe batches to their shard's bitmap (same code per
shard); documented per the custom-operator contract.

No reference counterpart (the reference has no join engine); public
algorithm.
"""
from __future__ import annotations

import numpy as np

from .hashing import _mix64

__all__ = [
    "bloom_params",
    "bloom_partial",
    "bloom_or",
    "bloom_might_contain",
]

# 16 fixed distinct seeds (golden-ratio multiples with uint64 wraparound;
# they only feed an xor before splitmix64, so no parity/oddness is needed)
_SEEDS = np.uint64(0x9E3779B97F4A7C15) * np.arange(1, 17, dtype=np.uint64)


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k_hashes) for an expected ``n_keys`` build side at the
    target false-positive rate. ``n_keys`` may be an upper bound (e.g.
    a parquet metadata row count before filtering) — oversizing only
    lowers the realized fpp."""
    n = max(1, int(n_keys))
    m = int(np.ceil(-n * np.log(fpp) / (np.log(2) ** 2)))
    m = max(64, (m + 63) & ~63)  # whole uint64 words
    k = max(1, round(m / n * np.log(2)))
    return m, min(int(k), len(_SEEDS))


def _positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(k, n) bit positions for int64 keys: k independent splitmix64
    streams (key xor seed_i), reduced mod m."""
    u = np.ascontiguousarray(keys, dtype=np.int64).view(np.uint64)
    h = _mix64(u[None, :] ^ _SEEDS[:k_hashes, None])
    return h % np.uint64(m_bits)


def bloom_partial(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """One batch's partial bitmap: (m_bits / 64,) uint64 words with the
    keys' bits set. Emit ``.tobytes()`` from map_batches; OR-combine
    with :func:`bloom_or`."""
    words = np.zeros(m_bits // 64, dtype=np.uint64)
    if len(keys):
        pos = _positions(np.asarray(keys), m_bits, k_hashes).ravel()
        np.bitwise_or.at(
            words, pos >> np.uint64(6),
            np.uint64(1) << (pos & np.uint64(63)))
    return words


def bloom_or(parts) -> np.ndarray:
    """Combine partial bitmaps (uint64 arrays or their .tobytes())."""
    acc = None
    for p in parts:
        w = np.frombuffer(p, dtype=np.uint64) if isinstance(p, (bytes, bytearray)) \
            else np.asarray(p, dtype=np.uint64)
        acc = w.copy() if acc is None else acc | w
    if acc is None:
        raise ValueError("bloom_or: no partial bitmaps")
    return acc


def bloom_might_contain(words: np.ndarray, keys: np.ndarray,
                        k_hashes: int) -> np.ndarray:
    """Vectorized membership probe: True = maybe present (exact check
    needed), False = DEFINITELY absent (no false negatives)."""
    keys = np.asarray(keys)
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(words) * 64
    pos = _positions(keys, m_bits, k_hashes)  # (k, n)
    bits = (words[pos >> np.uint64(6)] >> (pos & np.uint64(63))) & np.uint64(1)
    return bits.all(axis=0)
