"""Deterministic hashing primitives: stable 64-bit hash, MinHash, SimHash.

Used by the dedup pipelines.  Everything is seed-fixed and process-independent
(no reliance on Python's randomized ``hash()``), so hash-partitioning by these
keys is stable across workers and runs — a hard requirement for distributed
dedup and for resumable partitioned output.
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import numpy as np
import pyarrow as pa

_MERSENNE = (1 << 61) - 1
_MAX64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def stable_hash64(s: str) -> int:
    """Stable unsigned 64-bit hash of a string (blake2b, fixed)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8).digest(), "big")


def stable_hash64_array(values: Sequence[str]) -> np.ndarray:
    """Vector form of :func:`stable_hash64` (uint64 array)."""
    return np.fromiter(
        (stable_hash64(v if v is not None else "") for v in values),
        dtype=np.uint64,
        count=len(values),
    )


def stable_hash64_column(col, seed: int = 42) -> np.ndarray:
    """Vectorized stable 64-bit hash of an Arrow string column (uint64).

    Uses polars' Rust hash kernel (seed-fixed ahash): deterministic across
    worker processes within one environment/job — sufficient for
    hash-partitioning and within-job dedup keys.  NOT the same values as
    :func:`stable_hash64` (blake2b) and not guaranteed stable across polars
    versions, so never persist these hashes; use :func:`stable_hash64` for
    anything durable.  Nulls hash as empty string (parity with the scalar
    path's ``v or ""``).  ~100x faster than the per-row Python loop.
    """
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col, pa.string())
    try:
        import polars as pl

        return (
            pl.from_arrow(col).fill_null("").hash(seed=seed).to_numpy().astype(np.uint64)
        )
    except ImportError:  # pragma: no cover - polars is in the image
        return stable_hash64_array(col.to_pylist())


def _minhash_params(num_perm: int, seed: int = 42):
    """(a, b) coefficient arrays for the permutation family.

    NOTE: the (a*x + b) is computed in wrapping uint64 arithmetic BEFORE the
    Mersenne-prime reduction, so this is NOT the textbook universal hash
    family — it is a deterministic, empirically uniform mixing function
    (vectorizable in numpy without 128-bit decomposition).  The MinHash
    Jaccard estimate remains unbiased in practice; for the strict universal
    guarantee do the multiply in Python ints (much slower)."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class MinHasher:
    """MinHash signatures over shingle sets (classic Broder scheme).

    Construct once per actor (coefficients are precomputed); call per value.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        self.num_perm = num_perm
        self.a, self.b = _minhash_params(num_perm, seed)

    def signature(self, shingles: Sequence[str]) -> np.ndarray:
        """uint64 signature of length num_perm; all-max for empty input."""
        if not shingles:
            return np.full(self.num_perm, _MAX64, dtype=np.uint64)
        base = stable_hash64_array(list(set(shingles)))  # (n,)
        with np.errstate(over="ignore"):
            # (num_perm, n): universal hash then min over shingles
            hashed = (np.outer(self.a, base) + self.b[:, None]) % np.uint64(_MERSENNE)
        return hashed.min(axis=1).astype(np.uint64)

    def band_keys(self, sig: np.ndarray, num_bands: int) -> List[int]:
        """LSH band bucket keys: stable hash of each band's slice."""
        rows = self.num_perm // num_bands
        keys = []
        for band in range(num_bands):
            chunk = sig[band * rows : (band + 1) * rows]
            digest = hashlib.blake2b(chunk.tobytes(), digest_size=8, salt=band.to_bytes(8, "big")).digest()
            keys.append(int.from_bytes(digest, "big"))
        return keys


def simhash64(tokens: Sequence[str]) -> int:
    """64-bit SimHash over a token multiset (Charikar 2002)."""
    if not tokens:
        return 0
    hashes = stable_hash64_array(list(tokens))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    counts = bits.sum(axis=0) * 2 - len(tokens)  # +1/-1 votes
    out = np.uint64(0)
    for i in range(64):
        if counts[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming_distance64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    """Exact Jaccard similarity of two shingle sets."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
