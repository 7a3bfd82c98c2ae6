"""Bloom-filter semi-join — cut shuffle volume before a big-big join.

At crawl scale the classic ``WHERE fact.key IN (SELECT key FROM dim WHERE
...)`` either broadcasts the dim-key set (fails when the key set itself is
big) or shuffles the whole fact side into a join (pays the all-to-all for
every row, including the vast majority that can never match).  The standard
engine answer (runtime filters in Spark/Presto) is a Bloom filter:

* build: one streaming pass over the (filtered) build side; each block emits
  a fixed ``m/8``-byte bitset, OR-merged on the driver — merge state is
  INDEPENDENT of row count (same mergeable-sketch shape as ``sketches.py``).
* probe: the bitset is ``ray.put`` once and read zero-copy in every map
  task; per batch, k vectorized double-hash probes drop definite non-members
  (no false negatives, ~(1-e^{-kn/m})^k false positives).
* exact step: survivors go through the normal keyed semi-join — the Bloom
  pass only shrinks what that join must shuffle, it never changes results.

Hashing is splitmix64-style on the key's uint64 image (wrapping numpy
arithmetic — deterministic across runs/platforms).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _join_partitions

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray, seed: int) -> np.ndarray:
    """splitmix64 finalizer over a uint64 array (wrapping arithmetic).
    The seed offset is reduced mod 2^64 in Python ints to avoid numpy
    scalar-overflow semantics differences."""
    z = x + np.uint64((seed * 0x9E3779B97F4A7C15) % (1 << 64))
    z = (z ^ (z >> np.uint64(30))) * _C1
    z = (z ^ (z >> np.uint64(27))) * _C2
    return z ^ (z >> np.uint64(31))


def _key_u64(col) -> np.ndarray:
    """uint64 image of an integer Arrow column (nulls must be pre-filtered)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.int64()).to_numpy(zero_copy_only=False) \
              .astype(np.int64).view(np.uint64)


def _positions(keys_u64: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """(k, n) bit positions via double hashing: h1 + i*h2 mod m."""
    h1 = _mix64(keys_u64, 1)
    h2 = _mix64(keys_u64, 2) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(k, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % np.uint64(m_bits)


def build_bloom(
    ds: ray.data.Dataset,
    key_col: str,
    m_bits: int = 1 << 23,
    k: int = 7,
) -> np.ndarray:
    """One streaming pass -> merged bitset (uint64[m_bits/64]).

    Each block contributes one constant-size bitset row; the driver OR-folds
    them streaming (one accumulator + one incoming — never #blocks at once).
    """
    assert m_bits % 64 == 0
    words = m_bits // 64

    def partial(batch: pa.Table) -> pa.Table:
        col = batch.column(key_col)
        valid = pc.drop_null(col)
        bits = np.zeros(words, dtype=np.uint64)
        if len(valid):
            pos = _positions(_key_u64(valid), m_bits, k).ravel()
            np.bitwise_or.at(bits, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bits": pa.array([bits.view(np.int64)],
                                          pa.list_(pa.int64()))})

    merged = np.zeros(words, dtype=np.uint64)
    blocks = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow")
    for b in blocks.iter_batches(batch_size=None, batch_format="pyarrow"):
        for row in b.column("bits").to_pylist():
            np.bitwise_or(merged, np.asarray(row, np.int64).view(np.uint64),
                          out=merged)
    return merged


class _BloomProbe:
    """Broadcast probe kernel: bitset resolved from the object store once
    per worker (dsutil.cached_broadcast — zero-copy numpy view); per batch
    k vectorized probes, all-bits-set rows survive."""

    def __init__(self, bits_ref, key_col: str, m_bits: int, k: int):
        from ..dsutil import cached_broadcast

        self.bits = cached_broadcast(bits_ref)
        self.key_col, self.m_bits, self.k = key_col, m_bits, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.key_col)
        keep = np.asarray(pc.is_valid(col).to_numpy(zero_copy_only=False))
        if keep.any():
            u = _key_u64(pc.fill_null(col, 0))
            pos = _positions(u, self.m_bits, self.k)
            hit = (self.bits[(pos >> np.uint64(6)).astype(np.int64)]
                   >> (pos & np.uint64(63))) & np.uint64(1)
            keep &= hit.all(axis=0).astype(bool)
        return batch.filter(pa.array(keep))


def bloom_semi_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    m_bits: int = 1 << 23,
    k: int = 7,
    num_partitions: Optional[int] = None,
    exact: bool = True,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """``big WHERE big.on IN (SELECT right_on FROM small)`` with a Bloom
    prefilter ahead of the exact keyed semi-join.

    ``small`` streams once into an ``m_bits``-bit filter (never collected);
    ``big`` rows failing the filter never reach the shuffle.  With
    ``exact=True`` (default) survivors inner-join the deduplicated key set,
    so the output is exactly the SQL semi-join; ``exact=False`` keeps the
    (false-positive-bearing) prefilter output for cases where a downstream
    stage re-verifies anyway.  Null probe keys never match (SQL IN).
    """
    right_on = right_on or on
    bits_ref = ray.put(build_bloom(small, right_on, m_bits=m_bits, k=k))

    # plain tasks, not an actor pool: the probe's only state is the
    # broadcast bitset (plasma-cached per worker); pools pay per-execution
    # spin-up and cap the probe width at their max size
    def probe(batch: pa.Table) -> pa.Table:
        return _BloomProbe(bits_ref, on, m_bits, k)(batch)

    survivors = big.map_batches(
        probe, batch_format="pyarrow",
        concurrency=concurrency if isinstance(concurrency, int) else None)
    if not exact:
        return survivors

    def distinct_keys(batch: pa.Table) -> pa.Table:
        t = batch.select([right_on]).filter(
            pc.is_valid(batch.column(right_on)))
        return t.group_by([right_on]).aggregate([])

    keys = (small.map_batches(distinct_keys, batch_format="pyarrow")
                 .groupby(right_on).count()
                 .select_columns([right_on]))
    P = num_partitions or _join_partitions()
    from ..dsutil import drop_empty_blocks

    # the distinct-key groupby can emit empty zero-column blocks the hash
    # join rejects — rebuild from non-empty blocks (key-cardinality-sized)
    joined = survivors.join(drop_empty_blocks(keys), join_type="inner",
                            num_partitions=P,
                            on=(on,), right_on=(right_on,))
    big_cols = list(big.schema().names)
    return joined.map_batches(lambda t: t.select(big_cols),
                              batch_format="pyarrow")
