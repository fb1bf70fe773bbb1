"""Bloom-filter broadcast pre-filter for membership tests at blocklist
scale.

`pipelines/corpus.decontaminate_docs` broadcasts the benchmark blocklist
as raw normalized strings — right for eval sets of a few thousand rows,
but at a 10M-entry blocklist the broadcast is GBs per actor. A Bloom
filter at 12 bits/key is ~15 MB regardless of string length, ships once
per actor via ``ray.put``, and answers "definitely not in the blocklist"
for the overwhelming majority of the corpus. The small bloom-positive
remainder (true matches + ~0.3% false positives at k=8) is then checked
EXACTLY against the blocklist dataset with a distributed anti join, so
the composed operator keeps exact semantics — the SQL oracle of the
plain variant applies unchanged.

Layout: one flat ``uint8`` bit array (little-endian bit order within a
byte). ``k`` probe positions come from double hashing — ``pos_i = (h1 +
i*h2) mod m`` with ``h2`` a splitmix64 remix of the key hash, forced odd
so the stride never collapses. All build/probe paths are vectorized
numpy; per CLAUDE.md, shifts run on int64 (broadcast uint64 shifts are
pathologically slow in this numpy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "BloomFilter",
    "bloom_build",
    "bloom_from_datasets",
    "bloom_query",
    "default_hash64",
]


def default_hash64(vals) -> np.ndarray:
    """Canonical string → uint64 key hash for filter build AND probe
    (pandas seeded hashing — fast, deterministic across processes)."""
    import pandas as pd

    return pd.util.hash_array(
        np.asarray(vals, dtype=object), hash_key="0123456789123456"
    ).astype(np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit remix (public splitmix64 finalizer)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
    x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
    return (x ^ (x >> np.uint64(31))).astype(np.uint64)


@dataclass(frozen=True)
class BloomFilter:
    bits: np.ndarray  # uint8[m_bytes]
    m: int            # number of BITS (multiple of 8)
    k: int            # probes per key

    @property
    def nbytes(self) -> int:
        return int(self.bits.nbytes)


def _positions(h: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) int64 bit positions for each key hash via double hashing."""
    h = np.asarray(h, dtype=np.uint64)
    h2 = _splitmix64(h) | np.uint64(1)  # odd stride
    strides = np.arange(k, dtype=np.uint64)
    pos = (h[:, None] + strides[None, :] * h2[:, None]) % np.uint64(m)
    return pos.astype(np.int64)


def bloom_build(hashes: np.ndarray, bits_per_key: int = 12, k: int = 8,
                m: int | None = None) -> BloomFilter:
    """Build a filter sized ``bits_per_key × len(hashes)`` (min 1 KiB)."""
    n = len(hashes)
    if m is None:
        m = max(8 * 1024, int(n * bits_per_key))
    m = (m + 7) // 8 * 8
    bits = np.zeros(m // 8, dtype=np.uint8)
    if n:
        _set_bits(bits, m, k, np.asarray(hashes, dtype=np.uint64))
    return BloomFilter(bits=bits, m=m, k=k)


def _set_bits(bits: np.ndarray, m: int, k: int, hashes: np.ndarray) -> None:
    pos = _positions(hashes, m, k).ravel()
    np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))


def bloom_from_datasets(ds, col: str, n_keys: int, hash_fn,
                        bits_per_key: int = 12, k: int = 8) -> BloomFilter:
    """Distributed build: each block contributes a partial bitmap; the
    driver OR-accumulates them one batch at a time (``iter_batches``), so
    driver memory is O(m) — never O(keys) — and no key strings ever
    leave their block.

    ``hash_fn(values) -> uint64[n]`` must match the probe side's hash.
    """
    m = (max(8 * 1024, int(n_keys * bits_per_key)) + 7) // 8 * 8

    def partial(t):
        import pyarrow as pa

        vals = t[col].to_pandas()
        vals = vals[vals.notna()]
        part = np.zeros(m // 8, dtype=np.uint8)
        if len(vals):
            _set_bits(part, m, k, hash_fn(vals.to_numpy()))
        return pa.table({"bloom": pa.array([part.tobytes()], pa.binary())})

    acc = np.zeros(m // 8, dtype=np.uint8)
    # batch_size=None → one m/8-byte partial PER BLOCK, not per 1024-row
    # batch — bounds partial-bitmap traffic to n_blocks × m bytes
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    for batch in partials.iter_batches(batch_size=4, batch_format="pyarrow"):
        for buf in batch["bloom"]:
            np.bitwise_or(acc, np.frombuffer(buf.as_py(), dtype=np.uint8),
                          out=acc)
    return BloomFilter(bits=acc, m=m, k=k)


def bloom_query(bf: BloomFilter, hashes: np.ndarray) -> np.ndarray:
    """bool[n] — True = MAYBE present, False = definitely absent."""
    n = len(hashes)
    if n == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(np.asarray(hashes, dtype=np.uint64), bf.m, bf.k)
    probed = (bf.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return probed.all(axis=1)
