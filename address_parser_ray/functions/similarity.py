"""Pairwise similarity kernels — the P-stage primitives
(reference: Dice gate + RapidFuzz ratio family,
``fuzz/inexus_parser.py:2804-2941``). No external fuzzy-match library is
assumed; Jaro-Winkler is implemented directly (short strings only —
paths/identifiers), set similarities run vectorized on sketches.
"""

from __future__ import annotations

import numpy as np


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate from two MinHash signatures."""
    return float(np.mean(sig_a == sig_b))


def minhash_jaccard_batch(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
    """Row-wise Jaccard estimates for (N, P) signature matrices."""
    return (sigs_a == sigs_b).mean(axis=1)


def exact_jaccard(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Exact Jaccard of two unique-hash arrays."""
    if set_a.size == 0 and set_b.size == 0:
        return 1.0
    inter = np.intersect1d(set_a, set_b, assume_unique=True).size
    union = set_a.size + set_b.size - inter
    return inter / union if union else 1.0


def dice(set_a: np.ndarray, set_b: np.ndarray) -> float:
    """Dice coefficient 2|A∩B|/(|A|+|B|) — the reference's candidate gate
    (``fuzz/inexus_parser.py:2804-2833``, gate 0.4)."""
    denom = set_a.size + set_b.size
    if denom == 0:
        return 1.0
    inter = np.intersect1d(set_a, set_b, assume_unique=True).size
    return 2.0 * inter / denom


def jaro(s1: str, s2: str) -> float:
    """Jaro similarity (Jaro 1989). O(len1*len2) worst case; intended for
    short strings (paths, identifiers)."""
    if s1 == s2:
        return 1.0
    len1, len2 = len(s1), len(s2)
    if not len1 or not len2:
        return 0.0
    match_dist = max(len1, len2) // 2 - 1
    m1 = [False] * len1
    m2 = [False] * len2
    matches = 0
    for i, c in enumerate(s1):
        lo = max(0, i - match_dist)
        hi = min(len2, i + match_dist + 1)
        for j in range(lo, hi):
            if not m2[j] and s2[j] == c:
                m1[i] = m2[j] = True
                matches += 1
                break
    if not matches:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0


def jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler: Jaro boosted by common prefix (≤4 chars)."""
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def token_set_ratio(tokens_a: set, tokens_b: set) -> float:
    """Token-set similarity: Jaccard over token sets (the cheap stand-in
    for rapidfuzz token_set_ratio on already-tokenized inputs)."""
    if not tokens_a and not tokens_b:
        return 1.0
    union = len(tokens_a | tokens_b)
    return len(tokens_a & tokens_b) / union if union else 1.0


def size_ratio(n_a: int, n_b: int) -> float:
    """min/max length ratio — the reference uses length ratios to pick
    its scoring mode (``fuzz/inexus_parser.py:2852-2870``)."""
    if n_a == 0 and n_b == 0:
        return 1.0
    hi = max(n_a, n_b)
    return min(n_a, n_b) / hi if hi else 1.0
