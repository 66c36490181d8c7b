"""Dedup sketches: shingles, MinHash, SimHash, winnowing fingerprints.

Vectorized numpy implementations designed for `map_batches` use: one
call processes a whole batch of documents. All hashes are deterministic
(no PYTHONHASHSEED dependence) via crc32/blake2 and fixed LCG
parameters, so pipeline reruns and cross-process stages agree.
"""
from __future__ import annotations

import zlib

import numpy as np

__all__ = [
    "char_shingles",
    "shingle_hashes",
    "shingle_hashes64",
    "minhash_signature",
    "minhash_signatures_batch",
    "band_keys",
    "band_keys_batch",
    "jaccard",
    "simhash64",
    "simhash64_batch",
    "hamming64",
    "winnow_fingerprints",
]

_MERSENNE = (1 << 61) - 1
_RNG = np.random.default_rng(0xC0FFEE)
_N_PERM = 64
# a < 2^31 and shingle hashes < 2^32 keep a*x + b < 2^63 + 2^61 — no
# uint64 wraparound before the mod, so the (a*x + b) mod p family is a
# genuine universal hash (the earlier 61-bit `a` draw silently wrapped)
_A = _RNG.integers(1, 1 << 31, _N_PERM, dtype=np.int64).astype(np.uint64)
_B = _RNG.integers(0, _MERSENNE, _N_PERM, dtype=np.int64).astype(np.uint64)


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Set of character k-shingles; EMPTY for texts shorter than k
    (same contract as shingle_hashes — no shrunken-k fallback)."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        return set()
    return {t[i : i + k] for i in range(len(t) - k + 1)}


_POLY_BASE = np.uint64(1099511628211)  # FNV-1a prime; odd -> bijective mod 2^64


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized): decorrelates the low/high bits
    of the raw polynomial hash before truncation."""
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return v ^ (v >> np.uint64(31))


def _gram_hashes_raw(text: str, k: int) -> np.ndarray:
    """Per-position 64-bit mixed hashes of every k-gram of the
    normalized text, fully vectorized: codepoints via a single utf-32
    encode, one (n-k+1, k) sliding-window weighted sum (polynomial
    hash, uint64 wraparound), one splitmix64 finalize. Order preserved
    (position i -> gram i). Replaces a per-shingle Python crc32 loop —
    the former cost center of dedup_minhash."""
    t = " ".join(text.lower().split())
    if not t:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    if codes.size < k:
        # k-shingle contract (matches char_shingles): a text shorter
        # than k has NO k-shingles — callers see the empty array / the
        # all-sentinel minhash signature, never a shrunken-k hash
        return np.zeros(0, dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    windows = sliding_window_view(codes, k)
    # base^(k-1-i) mod 2^64, exact in Python ints (array ops below wrap
    # mod 2^64 silently by design)
    weights = np.array(
        [pow(int(_POLY_BASE), k - 1 - i, 1 << 64) for i in range(k)], dtype=np.uint64
    )
    raw = (windows * weights[None, :]).sum(axis=1, dtype=np.uint64)
    return _mix64(raw)


def _gram_hashes(text: str, k: int) -> np.ndarray:
    """32-bit truncation of the 64-bit gram hashes — the MinHash input
    domain (the universal-hash family requires x < 2^32, see _A)."""
    return _gram_hashes_raw(text, k) >> np.uint64(32)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 32-bit (stored uint64) hashes of the k-shingles."""
    return np.unique(_gram_hashes(text, k))


def shingle_hashes64(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique FULL-64-bit k-shingle hashes, for EXACT set
    arithmetic (jaccard counts that must equal string-set counts):
    a 32-bit space sees birthday collisions within ~10^3-gram docs
    often enough to perturb a 4th decimal; 64 bits make within-pair
    collisions ~2^-44 — effectively never, so |hash set| ops equal
    |gram set| ops."""
    return np.unique(_gram_hashes_raw(text, k))


def minhash_signature(hashes: np.ndarray, n_perm: int = _N_PERM) -> np.ndarray:
    """MinHash signature (uint64[n_perm]) from shingle hashes."""
    if hashes.size == 0:
        return np.full(n_perm, np.uint64(_MERSENNE), dtype=np.uint64)
    # (a*x + b) mod mersenne prime, vectorized over perms x shingles;
    # overflow-free because a < 2^31 and x < 2^32 (see _A above)
    x = hashes[None, :]
    vals = (_A[:n_perm, None] * x + _B[:n_perm, None]) % np.uint64(_MERSENNE)
    return vals.min(axis=1)


def band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH banding: hash each band of the signature to one bucket key.
    bands=16 over 64 perms -> rows r=4; collision prob = 1-(1-J^4)^16
    (~0.97 at J=0.8, ~0.21 at J=0.4)."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows].tobytes()
        keys.append((b << 32) | zlib.crc32(chunk))
    return keys


def band_keys_batch(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Vectorized banding for a WHOLE batch: (n_docs, n_perm)
    signatures -> (n_docs, bands) int64 bucket keys, no per-doc Python.
    Each band's ``rows`` signature slots combine through one polynomial
    mix + splitmix64 finalize (any injective-enough band hash yields
    the same collision structure as the per-doc crc32 variant); the
    band index rides in the top bits so bands never cross-collide."""
    sigs = np.asarray(sigs, dtype=np.uint64)
    n, n_perm = sigs.shape
    rows = n_perm // bands
    chunks = sigs[:, : bands * rows].reshape(n, bands, rows)
    weights = np.array(
        [pow(int(_POLY_BASE), rows - 1 - i, 1 << 64) for i in range(rows)],
        dtype=np.uint64,
    )
    mixed = _mix64((chunks * weights[None, None, :]).sum(axis=2, dtype=np.uint64))
    keys = (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(32)) | (
        mixed >> np.uint64(32)
    )
    return keys.astype(np.int64)


def minhash_signatures_batch(
    hash_arrays: list[np.ndarray], n_perm: int = _N_PERM
) -> np.ndarray:
    """MinHash signatures for a whole batch of shingle-hash arrays:
    concatenate, one (n_perm, total_shingles) universal-hash pass,
    per-doc mins via ``np.minimum.reduceat`` — the per-doc Python is
    one size() call. Chunked so the transient (n_perm, chunk) hash
    matrix stays ~2 MB and CACHE-RESIDENT: at a 100k-shingle budget the
    ~50 MB temporaries went to DRAM and 32 concurrent map_batches
    workers saturated memory bandwidth (measured 25x slower single-task
    and 36x slower at 32-way vs this sizing). Empty arrays get the
    all-sentinel signature (same contract as minhash_signature)."""
    n = len(hash_arrays)
    out = np.full((n, n_perm), np.uint64(_MERSENNE), dtype=np.uint64)
    sizes = np.array([a.size for a in hash_arrays], dtype=np.int64)
    nz = np.nonzero(sizes)[0]
    if nz.size == 0:
        return out
    budget = 4_000  # shingles per chunk -> ~2 MB transient (see above)
    start = 0
    while start < nz.size:
        end = start
        tot = 0
        while end < nz.size and (tot == 0 or tot + sizes[nz[end]] <= budget):
            tot += sizes[nz[end]]
            end += 1
        idx = nz[start:end]
        cat = np.concatenate([hash_arrays[i] for i in idx])
        vals = (_A[:n_perm, None] * cat[None, :] + _B[:n_perm, None]) % np.uint64(
            _MERSENNE
        )
        offsets = np.concatenate(([0], np.cumsum(sizes[idx])[:-1]))
        out[idx] = np.minimum.reduceat(vals, offsets, axis=1).T
        start = end
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique hash arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


def simhash64_batch(texts: list[str]) -> np.ndarray:
    """64-bit SimHash per document, vectorized over a whole batch: the
    token hash is the first 8 bytes (big-endian) of md5 — chosen so an
    ANSI-SQL oracle can recompute the EXACT same signatures
    (``CAST(concat('0x', substr(md5(tok),1,16)) AS UBIGINT)`` in
    DuckDB), making the SimHash near-dup output a hard SQL-checkable
    row rather than a rows-only one. md5 runs once per UNIQUE token in
    the batch (np.unique + inverse map), then the per-bit +-1
    accumulation is 64 weighted bincounts over the token -> doc index
    map. No per-token Python in the per-occurrence hot path."""
    import hashlib

    toks: list[str] = []
    counts: list[int] = []
    for t in texts:
        tt = t.lower().split()
        toks.extend(tt)
        counts.append(len(tt))
    n = len(texts)
    if not toks:
        return np.zeros(n, dtype=np.uint64)
    uniq, inv = np.unique(np.array(toks, dtype=object), return_inverse=True)
    uh = np.array(
        [int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "big")
         for u in uniq],
        dtype=np.uint64,
    )
    h = uh[inv]
    doc_idx = np.repeat(np.arange(n), counts)
    acc = np.empty((n, 64), dtype=np.float64)
    for b in range(64):
        bit = ((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64)
        acc[:, b] = np.bincount(doc_idx, weights=2.0 * bit - 1.0, minlength=n)
    bits = (acc > 0).astype(np.uint64)
    return (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1).astype(np.uint64)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (single-doc convenience
    wrapper around the batch kernel)."""
    return int(simhash64_batch([text])[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def winnow_fingerprints(text: str, k: int = 5, window: int = 8) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): min hash in each sliding window
    of k-gram hashes -> sorted unique uint64 fingerprints. Gram hashing
    shares the vectorized rolling-hash kernel (_gram_hashes)."""
    t = " ".join(text.lower().split())
    if len(t) < k:
        return np.zeros(0, dtype=np.uint64)
    grams = _gram_hashes(text, k)
    if grams.size <= window:
        return np.unique(grams.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    mins = sliding_window_view(grams, window).min(axis=1)
    return np.unique(mins)


# ------------------------------------------------------------ HyperLogLog

_HLL_P = 12           # 2^12 = 4096 registers, ~1.6% standard error
_HLL_M = 1 << _HLL_P


def hll_registers(values: np.ndarray) -> np.ndarray:
    """HyperLogLog register array (uint8[4096]) for a batch of uint64
    hashes (Flajolet et al. 2007). Registers from different batches
    combine with elementwise max — the associative combiner that makes
    approx-distinct a cheap pre-aggregated shuffle at 100TB."""
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    if values.size == 0:
        return regs
    v = values.astype(np.uint64)
    # mix so low bits are well distributed (splitmix64 finalizer)
    v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    v = v ^ (v >> np.uint64(31))
    idx = (v >> np.uint64(64 - _HLL_P)).astype(np.int64)
    rest = v << np.uint64(_HLL_P)
    # rank = position of first set bit in the remaining 64-P bits, 1-based
    nbits = 64 - _HLL_P
    rank = np.full(v.size, nbits + 1, dtype=np.uint8)
    found = np.zeros(v.size, dtype=bool)
    for b in range(nbits):
        hit = ~found & ((rest >> np.uint64(63 - b)) & np.uint64(1)).astype(bool)
        rank[hit] = b + 1
        found |= hit
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate (with linear counting
    for the small range)."""
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -regs.astype(np.float64)).sum()
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting
    return float(est)
