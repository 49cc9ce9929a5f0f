"""Vectorized Bloom filter over int64 keys — the broadcast pre-filter
for distributed semi-joins (build once from the small side, `ray.put`
the bit array, probe fact batches vectorized; survivors go to the exact
join). No false negatives ever; false-positive survivors are removed by
the exact join, so results stay exact while the bloom kills most of the
fact stream BEFORE the shuffle — at 100 TB the filter is ~10-16 bits
per key vs 64+ for an exact key set.

Hash family: double hashing h_i = h1 + i*h2 (Kirsch–Mitzenmacher) over
two independent splitmix64 streams — k probes from two hash evaluations.
"""

from __future__ import annotations

import numpy as np

from address_parser_ray.functions.hashing import splitmix64

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def bloom_build(keys: np.ndarray, bits_per_key: int = 16, k: int = 4) -> tuple:
    """→ (bit_array uint64[], m, k). m is a power of two ≥ bits_per_key
    × len(keys), so probe positions reduce with a mask, not a modulo."""
    n = max(1, len(keys))
    m = 1 << int(np.ceil(np.log2(max(64, bits_per_key * n))))
    words = np.zeros(m // 64, dtype=np.uint64)
    if len(keys):
        pos = _positions(np.asarray(keys, dtype=np.int64), m, k)
        np.bitwise_or.at(words, pos >> 6, np.uint64(1) << (pos & np.uint64(63)))
    return words, m, k


def bloom_probe(words: np.ndarray, m: int, k: int, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test → bool mask (no false negatives)."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _positions(np.asarray(keys, dtype=np.int64), m, k).reshape(-1, k)
    hit = (words[pos >> 6] >> (pos & np.uint64(63))) & np.uint64(1)
    return (hit == 1).all(axis=1)


def _positions(keys: np.ndarray, m: int, k: int) -> np.ndarray:
    """k probe positions per key, flattened row-major (key-major)."""
    u = keys.view(np.uint64)
    h1 = splitmix64(u)
    with np.errstate(over="ignore"):
        h2 = splitmix64(u ^ _GOLD) | np.uint64(1)  # odd → full-period stride
        i = np.arange(k, dtype=np.uint64)
        probes = h1[:, None] + i[None, :] * h2[:, None]
    return (probes & np.uint64(m - 1)).reshape(-1)
