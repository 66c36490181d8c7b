"""Product quantization (PQ) for embedding compression + ANN rerank.

The memory-scale path for similarity search over 10^12-document
corpora: a 64-dim float64 embedding (512 B) compresses to ``m`` uint8
codes (8 B at m=8) — the difference between "the index fits in cluster
RAM" and "it does not". Jegou et al., "Product Quantization for
Nearest Neighbor Search" (TPAMI 2011).

Design mirrors the repo's IVF coarse quantizer (queries._ivf_train):

- ``pq_train`` — driver-local Lloyd per subspace (tests / small data).
- ``pq_train_distributed`` — the SAME update math as one map_batches
  pass per iteration emitting per-(subspace, code) partial sums; the
  driver only ever holds the (m, k, dsub) codebook tensor, never the
  data. Given the same init, it is bit-identical to ``pq_train``
  (asserted in tests).
- ``pq_encode`` — vectorized nearest-codeword assignment per subspace,
  fits a ``map_batches`` stage as-is (pure ndarray in/out).
- ``pq_adc_scores`` — asymmetric distance computation: one (m, k)
  lookup table of query-codeword dot products, scores are a table
  gather + sum over subspaces — no decompression.

All deterministic (seeded init, no data-order dependence in the
partial-sum combine up to float summation of per-batch partials, which
the tests pin by construction).
"""
from __future__ import annotations

import json
import os
import shutil

import numpy as np

__all__ = [
    "pq_train",
    "pq_train_distributed",
    "pq_encode",
    "pq_decode",
    "pq_adc_scores",
    "build_pq_index",
    "load_pq_index",
]


def _split(vectors: np.ndarray, m: int) -> np.ndarray:
    n, dim = vectors.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    return vectors.reshape(n, m, dim // m)


def _init_codebooks(vectors: np.ndarray, m: int, k: int, seed: int) -> np.ndarray:
    """Seeded init: k distinct sample rows per subspace (the standard
    k-means++-free deterministic baseline)."""
    if k > 256:
        # codes are uint8 throughout (_assign casts argmin); a larger k
        # would silently wrap 256 -> 0 and corrupt every downstream
        # encode / ADC score — refuse at train time instead
        raise ValueError(f"k={k} exceeds 256, the uint8 code space")
    n = len(vectors)
    if n < k:
        raise ValueError(f"need >= k={k} vectors, got {n}")
    rng = np.random.default_rng(seed)
    sub = _split(np.asarray(vectors, dtype=np.float64), m)
    idx = rng.choice(n, k, replace=False)
    return np.stack([sub[idx, j, :] for j in range(m)])  # (m, k, dsub)


def _assign(sub: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Nearest codeword per (row, subspace) -> uint8 codes (n, m).
    Vectorized: ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x term is
    constant per row so argmin needs only the cross and codeword terms."""
    cross = np.einsum("nmd,mkd->nmk", sub, codebooks)
    c2 = (codebooks * codebooks).sum(axis=2)  # (m, k)
    return np.argmin(c2[None, :, :] - 2.0 * cross, axis=2).astype(np.uint8)


def pq_train(
    vectors: np.ndarray, m: int = 8, k: int = 16, iters: int = 8, seed: int = 13
) -> np.ndarray:
    """Train (m, k, dim/m) codebooks by per-subspace Lloyd k-means."""
    v = np.asarray(vectors, dtype=np.float64)
    codebooks = _init_codebooks(v, m, k, seed)
    sub = _split(v, m)
    for _ in range(iters):
        codes = _assign(sub, codebooks)
        for j in range(m):
            sums = np.zeros((k, sub.shape[2]))
            np.add.at(sums, codes[:, j], sub[:, j, :])
            counts = np.bincount(codes[:, j], minlength=k).astype(np.float64)
            nz = counts > 0
            codebooks[j, nz] = sums[nz] / counts[nz, None]
    return codebooks


def pq_train_distributed(
    ds, m: int = 8, k: int = 16, iters: int = 8, seed: int = 13,
    init: np.ndarray | None = None, embedding_col: str = "embedding",
    batch_size: int = 4096,
):
    """Same Lloyd update as :func:`pq_train`, but each iteration is ONE
    ``map_batches`` pass over a ``ray.data.Dataset`` emitting
    per-(subspace, code) partial (sum, count); the driver combines
    O(m*k) rows and never holds the data. ``init`` lets callers (and
    the equality test) share the exact seeded init with the local
    trainer — pass it whenever bit-reproducibility against ``pq_train``
    matters. Without it, the default init samples a few rows from EVERY
    block (a map_batches head per batch), not the first blocks, so a
    corpus whose leading file is unrepresentative (sorted layouts, one
    hot shard) cannot skew the seeded codewords; the sample is
    deterministic given a fixed block layout but not across layouts.
    """
    import pandas as pd
    import ray

    if init is None:
        # scattered seeded sample: <= rows_per_block rows from each
        # block (O(blocks) driver rows, never the data)
        def head_rows(df: pd.DataFrame) -> pd.DataFrame:
            return df[[embedding_col]].head(max(8, k))

        sample = ds.map_batches(
            head_rows, batch_format="pandas", batch_size=batch_size
        ).to_pandas()
        init = _init_codebooks(
            np.stack(sample[embedding_col].to_numpy()), m, k, seed
        )
    codebooks = np.array(init, dtype=np.float64)
    mm, kk, dsub = codebooks.shape

    for _ in range(iters):
        ref = ray.put(codebooks)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cb = ray.get(ref)
            v = np.stack(df[embedding_col].to_numpy()).astype(np.float64)
            sub = _split(v, mm)
            codes = _assign(sub, cb)
            sums = np.zeros((mm, kk, dsub))
            counts = np.zeros((mm, kk), dtype=np.int64)
            for j in range(mm):
                np.add.at(sums[j], codes[:, j], sub[:, j, :])
                counts[j] = np.bincount(codes[:, j], minlength=kk)
            return pd.DataFrame({"sums": [sums.tobytes()],
                                 "counts": [counts.tobytes()]})

        parts = ds.map_batches(
            partial, batch_format="pandas", batch_size=batch_size
        ).to_pandas()
        sums = np.zeros((mm, kk, dsub))
        counts = np.zeros((mm, kk), dtype=np.int64)
        for sb, cb_ in zip(parts["sums"], parts["counts"]):
            sums += np.frombuffer(sb, dtype=np.float64).reshape(mm, kk, dsub)
            counts += np.frombuffer(cb_, dtype=np.int64).reshape(mm, kk)
        nz = counts > 0
        codebooks[nz] = sums[nz] / counts[nz][:, None]
    return codebooks


def pq_encode(vectors: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, dim) float -> (n, m) uint8 codes."""
    if codebooks.shape[1] > 256:
        raise ValueError(
            f"codebook k={codebooks.shape[1]} exceeds 256, the uint8 code space"
        )
    sub = _split(np.asarray(vectors, dtype=np.float64), codebooks.shape[0])
    return _assign(sub, codebooks)


def pq_decode(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(n, m) codes -> (n, dim) reconstruction (codeword concat)."""
    m = codebooks.shape[0]
    parts = [codebooks[j, codes[:, j], :] for j in range(m)]
    return np.concatenate(parts, axis=1)


def build_pq_index(
    ds,
    output_dir: str,
    codebooks: np.ndarray | None = None,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    embedding_col: str = "embedding",
    normalize: bool = True,
    batch_size: int = 4096,
):
    """Build a persistent PQ index as a DATASET JOB: train codebooks
    (``pq_train_distributed``, unless ``codebooks`` is supplied — e.g.
    residual codebooks from an IVF composition), broadcast them once
    via ``ray.put``, encode every vector to ``m`` uint8 codes inside
    ``map_batches``, and ``write_parquet`` the (id, code-bytes) table
    next to a ``_pq_codebook.json`` sidecar (underscore-prefixed so
    parquet dataset discovery skips it, like the checkpoint manifest).

    The scale shape: the float column is read, encoded, and written
    entirely on the cluster — the driver holds only the (m, k, dsub)
    codebook. At 10^12 vectors the codes table is the thing that fits
    in cluster RAM (8 B/vector at m=8) while the float table does not;
    queries then run ADC over the codes (``pq_adc_scores``) and fetch
    floats only for the final rerank shortlist.

    Returns the trained/used codebooks. Reload with
    :func:`load_pq_index`.
    """
    import pandas as pd
    import ray

    if codebooks is None:
        # Train on the SAME representation we encode: codebooks fit on
        # raw vectors while encode() normalizes would collapse any
        # non-unit-norm corpus into a handful of codes.
        train_ds = ds
        if normalize:
            def _norm(df: pd.DataFrame) -> pd.DataFrame:
                v = np.stack(df[embedding_col].to_numpy()).astype(np.float64)
                v /= np.linalg.norm(v, axis=1, keepdims=True)
                return pd.DataFrame({embedding_col: list(v)})

            train_ds = ds.map_batches(
                _norm, batch_format="pandas", batch_size=batch_size
            )
        codebooks = pq_train_distributed(
            train_ds, m=m, k=k, iters=iters, seed=seed,
            embedding_col=embedding_col, batch_size=batch_size,
        )
    codebooks = np.asarray(codebooks, dtype=np.float64)
    ref = ray.put(codebooks)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        cb = ray.get(ref)
        v = np.stack(df[embedding_col].to_numpy()).astype(np.float64)
        if normalize:
            v /= np.linalg.norm(v, axis=1, keepdims=True)
        codes = pq_encode(v, cb)
        return pd.DataFrame({
            id_col: df[id_col].to_numpy(),
            "code": [row.tobytes() for row in codes],
        })

    os.makedirs(output_dir, exist_ok=True)
    codes_dir = os.path.join(output_dir, "codes")
    if os.path.isdir(codes_dir):
        # a rebuild into the same dir must not merge with stale files:
        # write_parquet uses unique names, so leftovers from a prior
        # build would silently double the codes table on load
        shutil.rmtree(codes_dir)
    ds.map_batches(
        encode, batch_format="pandas", batch_size=batch_size
    ).write_parquet(codes_dir)
    sidecar = {
        "m": int(codebooks.shape[0]),
        "k": int(codebooks.shape[1]),
        "dsub": int(codebooks.shape[2]),
        "id_col": id_col,
        "normalize": bool(normalize),
        "codebooks": codebooks.tolist(),
    }
    tmp = os.path.join(output_dir, "_pq_codebook.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(sidecar, fh)
    os.replace(tmp, os.path.join(output_dir, "_pq_codebook.json"))
    return codebooks


def load_pq_index(index_dir: str):
    """Load a :func:`build_pq_index` output: returns ``(codebooks,
    codes_dataset, meta)`` where ``codes_dataset`` is the lazy
    ``ray.data.Dataset`` over the codes table (stream it through
    ``pq_adc_scores`` in ``map_batches``; never ``to_pandas`` it at
    scale) and ``meta`` carries the sidecar's ``normalize`` / ``id_col``
    / shape fields — callers need ``normalize`` to preprocess query
    vectors the same way the index was encoded."""
    import ray.data

    with open(os.path.join(index_dir, "_pq_codebook.json")) as fh:
        sidecar = json.load(fh)
    codebooks = np.asarray(sidecar.pop("codebooks"), dtype=np.float64)
    codes = ray.data.read_parquet(os.path.join(index_dir, "codes"))
    return codebooks, codes, sidecar


def pq_adc_scores(query: np.ndarray, codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """Asymmetric distance computation: approximate dot(query, x_i) for
    every coded vector via one (m, k) lookup table — a gather + sum,
    never a decompression. Higher = more similar (cosine when inputs
    were normalized)."""
    q_sub = _split(np.asarray(query, dtype=np.float64)[None, :], codebooks.shape[0])[0]
    lut = np.einsum("md,mkd->mk", q_sub, codebooks)  # (m, k)
    m = codebooks.shape[0]
    return sum(lut[j, codes[:, j]] for j in range(m))
