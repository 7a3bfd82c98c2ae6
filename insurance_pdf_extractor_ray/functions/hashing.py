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
import pyarrow.compute as pc

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


_POLY_P = np.uint64(1099511628211)  # FNV-1a 64-bit prime (odd — invertible mod 2^64)


def durable_hash64_column(col) -> np.ndarray:
    """Vectorized DURABLE 64-bit hash of an Arrow string/binary column —
    safe to persist (bucketed layouts, at-rest dedup indexes), unlike the
    polars-backed :func:`stable_hash64_column`.

    Polynomial hash over UTF-8 bytes in wrapping uint64 numpy:
    ``H(s) = Σ (b_i + 1) · p^(L-1-i)``, finalized with a splitmix-style mix.
    Everything is flat-buffer arithmetic straight off the Arrow offsets —
    no per-row Python, no string materialization.  Nulls hash like ``""``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not isinstance(col, pa.Array):
        col = pa.array(col, pa.string())
    col = pc.fill_null(col, "" if pa.types.is_string(col.type) else b"")
    arr = col.cast(pa.large_binary())
    off_buf = np.frombuffer(arr.buffers()[1], dtype=np.int64)
    offsets = off_buf[arr.offset: arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[
        offsets[0]: offsets[-1]].astype(np.uint64)
    starts = (offsets[:-1] - offsets[0]).astype(np.int64)
    ends = (offsets[1:] - offsets[0]).astype(np.int64)
    lens = ends - starts
    if len(data):
        maxlen = int(lens.max())
        powers = np.empty(maxlen + 1, dtype=np.uint64)
        powers[0] = 1
        if maxlen:
            np.cumprod(np.full(maxlen, _POLY_P, dtype=np.uint64),
                       out=powers[1:])
        within = np.arange(len(data), dtype=np.int64) - np.repeat(starts, lens)
        exp = np.repeat(lens, lens) - 1 - within
        contrib = (data + np.uint64(1)) * powers[exp]
        csum = np.concatenate([np.zeros(1, np.uint64),
                               np.cumsum(contrib, dtype=np.uint64)])
        h = csum[ends] - csum[starts]
    else:
        h = np.zeros(len(arr), dtype=np.uint64)
    # splitmix-style finalizer (mix in the length so "a" != "a\0"-style runs)
    h = h ^ lens.astype(np.uint64)
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return h ^ (h >> np.uint64(31))


_SHINGLE_C = np.uint64(0x9E3779B97F4A7C15)  # odd golden-ratio multiplier


def shingle_hashes_many(texts: Sequence[str], ngram: int = 3,
                        seed: int = 42):
    """Per-doc word-``ngram`` shingle HASHES without building shingle strings.

    Tokenization (lowercase ``\\S+`` words — same token rule as
    ``textstats.word_ngrams``) and word hashing run inside polars (Rust,
    one pass over the whole batch); shingle hashes are then a rolling
    polynomial over the word-hash array in wrapping uint64 numpy — the
    n-gram join/encode/hash of the string path never happens.  Docs with
    0 < words < ngram yield one shingle over the available words (the
    word_ngrams contract); empty docs yield none.

    Returns ``(hashes, lengths)``: concatenated uint64 shingle hashes and
    the per-doc shingle counts — the input form of
    :meth:`MinHasher.signature_from_hashes`.  ~20x the string path.
    """
    import polars as pl

    n = len(texts)
    s = pl.Series([t or "" for t in texts], dtype=pl.String)
    words = s.str.to_lowercase().str.extract_all(r"\S+")
    counts = words.list.len().to_numpy().astype(np.int64)
    flat = words.explode().drop_nulls()  # empty docs explode to one null row
    h = flat.hash(seed=seed).to_numpy().astype(np.uint64)

    out_lens = np.where(counts >= ngram, counts - ngram + 1,
                        np.where(counts > 0, 1, 0))
    total_words = int(counts.sum())
    if total_words == 0:
        return np.empty(0, dtype=np.uint64), out_lens

    # doc id per word, to mask windows that would span doc boundaries
    did = np.repeat(np.arange(n, dtype=np.int64), counts)
    W = total_words - ngram + 1  # global window count (may be <= 0)
    with np.errstate(over="ignore"):
        if W > 0:
            sh = np.zeros(W, dtype=np.uint64)
            for j in range(ngram):
                sh = sh * _SHINGLE_C + h[j : j + W]
            valid = did[:W] == did[ngram - 1 :]
        else:
            sh = np.empty(0, dtype=np.uint64)
            valid = np.empty(0, dtype=bool)

        out = np.empty(int(out_lens.sum()), dtype=np.uint64)
        # full-length windows: valid windows appear in doc order and belong
        # exclusively to long docs, so a repeat-mask scatter is exact
        long_mask = counts >= ngram
        out_starts = np.cumsum(out_lens) - out_lens
        if W > 0 and long_mask.any():
            out[np.repeat(long_mask, out_lens)] = sh[valid]
        # short docs: one shingle over all available words
        word_starts = np.cumsum(counts) - counts
        for d in np.flatnonzero((counts > 0) & (counts < ngram)):
            acc = np.uint64(0)
            for j in range(counts[d]):
                acc = acc * _SHINGLE_C + h[word_starts[d] + j]
            out[out_starts[d]] = acc
    return out, out_lens


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
        base = stable_hash64_column(list(shingles))  # duplicates don't move a min
        with np.errstate(over="ignore"):
            # (num_perm, n): hash-family mix then min over shingles
            hashed = (np.outer(self.a, base) + self.b[:, None]) % np.uint64(_MERSENNE)
        return hashed.min(axis=1).astype(np.uint64)

    def signature_many(self, shingle_lists: Sequence[Sequence[str]],
                       max_chunk: int = 4096) -> np.ndarray:
        """(n_docs, num_perm) signature matrix — the batch form.

        ALL shingles of the batch are hashed in ONE vectorized polars call;
        the (num_perm x shingles) mix matrix is then computed in doc-aligned
        chunks of <= ``max_chunk`` shingles and reduced per doc with a
        segmented ``minimum.reduceat``.  ``max_chunk`` stays at 4096 because
        uint64 elementwise throughput falls off a cache cliff once the
        chunk matrix exceeds a few MB (measured 187M el/s at 4096 columns vs
        7-18M el/s at 8192+ on this host).
        """
        n = len(shingle_lists)
        lens = np.fromiter((len(s) for s in shingle_lists), dtype=np.int64, count=n)
        if int(lens.sum()) == 0:
            return np.full((n, self.num_perm), _MAX64, dtype=np.uint64)
        flat: List[str] = []
        for s in shingle_lists:
            flat.extend(s)
        base = stable_hash64_column(flat)  # one vectorized hash call
        return self.signature_from_hashes(base, lens, max_chunk=max_chunk)

    def signature_from_hashes(self, hashes: np.ndarray, lengths: np.ndarray,
                              max_chunk: int = 4096) -> np.ndarray:
        """(n_docs, num_perm) signatures from PRE-HASHED shingles.

        ``hashes`` is the concatenation of every doc's shingle hashes
        (uint64), ``lengths`` the per-doc counts (empty docs -> all-max
        signature).  The (num_perm x shingles) mix matrix is computed in
        doc-aligned chunks of <= ``max_chunk`` shingles: uint64 elementwise
        throughput falls off a cache cliff once the chunk matrix exceeds a
        few MB (measured 187M el/s at 4096 columns vs 7-18M el/s at 8192+).
        """
        n = len(lengths)
        out = np.full((n, self.num_perm), _MAX64, dtype=np.uint64)
        doc_starts = np.cumsum(lengths) - lengths
        lo = 0
        with np.errstate(over="ignore"):
            while lo < n:
                hi = lo
                cnt = 0
                while hi < n and (cnt == 0 or cnt + lengths[hi] <= max_chunk):
                    cnt += lengths[hi]
                    hi += 1
                nz = lo + np.flatnonzero(lengths[lo:hi])
                if len(nz):
                    s0 = doc_starts[lo]
                    chunk = hashes[s0 : s0 + cnt]
                    H = (self.a[:, None] * chunk[None, :]
                         + self.b[:, None]) % np.uint64(_MERSENNE)
                    starts = doc_starts[nz] - s0
                    out[nz, :] = np.minimum.reduceat(H, starts, axis=1).T
                lo = hi
        return out

    # fixed odd multiplier for the vectorized polynomial band fold
    _BAND_MIX = np.uint64(0x9E3779B97F4A7C15)

    def band_keys_many(self, sigs: np.ndarray, num_bands: int) -> np.ndarray:
        """(n_docs, num_bands) LSH bucket keys, fully vectorized.

        Key = polynomial fold of the band's signature slice in wrapping
        uint64 arithmetic, salted per band — docs share a bucket iff their
        band slices are identical (same guarantee as a cryptographic band
        hash, modulo negligible 64-bit fold collisions).
        """
        n = sigs.shape[0]
        rows = self.num_perm // num_bands
        S = sigs.reshape(n, num_bands, rows)
        key = np.zeros((n, num_bands), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(rows):
                key = key * self._BAND_MIX + S[:, :, r]
            key ^= np.arange(num_bands, dtype=np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F)
        return key

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
    return int(simhash64_many([tokens])[0])


def simhash64_many(token_lists: Sequence[Sequence[str]],
                  max_chunk: int = 262144) -> np.ndarray:
    """(n_docs,) uint64 SimHash vector — the batch form.

    All tokens of (a chunk of) the batch are hashed in ONE vectorized call
    and the per-doc bit votes are a segmented ``add.reduceat``; empty docs
    hash to 0.  ``max_chunk`` caps the transient (tokens x 64) vote matrix
    (~64 MB int32 at the default).
    """
    n = len(token_lists)
    out = np.zeros(n, dtype=np.uint64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    lo = 0
    while lo < n:
        hi = lo
        total = 0
        flat: List[str] = []
        lengths = []
        while hi < n and (total == 0 or total + len(token_lists[hi]) <= max_chunk):
            ln = len(token_lists[hi])
            flat.extend(token_lists[hi])
            lengths.append(ln)
            total += ln
            hi += 1
        if total:
            base = stable_hash64_column(flat)
            bits = ((base[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int32)  # (S, 64)
            lens = np.asarray(lengths, dtype=np.int64)
            nz = np.flatnonzero(lens)
            if len(nz):
                starts = (np.cumsum(lens) - lens)[nz]
                sums = np.add.reduceat(bits, starts, axis=0)  # (nz, 64)
                votes = 2 * sums - lens[nz, None]
                out[lo + nz] = ((votes > 0).astype(np.uint64) * weights).sum(axis=1)
        lo = hi
    return out


def hamming_distance64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: Sequence[str], b: Sequence[str]) -> float:
    """Exact Jaccard similarity of two shingle sets."""
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
