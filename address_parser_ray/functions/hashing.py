"""Deterministic hashing kernels: sha256, char-shingle hashes, MinHash,
SimHash, winnowing fingerprints, per-key RNG.

These are the graft analogues of the reference's shingling + inverted
n-gram index (``fuzz/inexus_parser.py:2657-2680``): instead of a central
in-memory index, every record computes mergeable sketches that travel
with it through shuffles.

All randomness is derived from fixed seeds via splitmix64 so any worker
on any node computes identical values — the reference's shared
sequential ``random.Random`` (``ner/build_standard_dataset.py:941``)
does not parallelize deterministically; per-key hashing does.
"""

from __future__ import annotations

import hashlib
import re
from typing import Iterable

import numpy as np

_U64 = np.uint64
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)

# Polynomial base for the char-shingle rolling hash (odd → invertible
# mod 2^64, good avalanche when paired with a final mix).
_POLY_BASE = np.uint64(1099511628211)  # FNV-64 prime


def splitmix64(x: np.ndarray | int) -> np.ndarray | np.uint64:
    """SplitMix64 finalizer — a strong, cheap 64-bit mixer (public domain,
    Steele et al., "Fast Splittable Pseudorandom Number Generators")."""
    old = np.seterr(over="ignore")
    try:
        z = (np.asarray(x, dtype=_U64) + _U64(0x9E3779B97F4A7C15)) & _MASK64
        z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _MASK64
        z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _MASK64
        return z ^ (z >> _U64(31))
    finally:
        np.seterr(**old)


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic (a, b) multiplier/offset arrays for the MinHash
    "permutations" h_i(x) = a_i*x + b_i (mod 2^64), a_i odd."""
    idx = np.arange(num_perm, dtype=_U64)
    a = splitmix64(idx + _U64(seed) * _U64(0x9E3779B97F4A7C15)) | _U64(1)
    b = splitmix64(idx + _U64(seed + 1) * _U64(0xC2B2AE3D27D4EB4F))
    return a, b


def sha256_hex(texts: Iterable[str | None]) -> list[str]:
    """Hex sha256 of each string's UTF-8 bytes (None → sha of b"").

    This is the per-row invariant column carried through every stage
    (BASELINE.json input_hint). Matches DuckDB's ``sha256(text)``.
    """
    out = []
    for t in texts:
        out.append(hashlib.sha256((t or "").encode("utf-8")).hexdigest())
    return out


def stable_id64(*parts: str) -> int:
    """Deterministic signed-int64 record id from key strings (blake2b-8).

    64 bits is plenty below ~10^9 records; at the full 10^12-file scale
    switch to the 128-bit variant (collision odds ~n^2/2^k)."""
    h = hashlib.blake2b("\x1f".join(parts).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "big", signed=True)


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all char k-grams of ``text`` (vectorized).

    Analogue of ``generate_ngrams`` (``fuzz/inexus_parser.py:2657-2660``)
    but emitting hashes, not strings: a sliding-window dot product with a
    power-of-base vector under uint64 wraparound, then a splitmix64
    finalize. O(len*k) multiplies, all in numpy.
    """
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        if not data:
            return np.empty(0, dtype=_U64)
        data = data + b" " * (k - len(data))  # short text → one padded shingle
    arr = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    old = np.seterr(over="ignore")
    try:
        powers = np.empty(k, dtype=_U64)
        powers[0] = _U64(1)
        for i in range(1, k):
            powers[i] = (powers[i - 1] * _POLY_BASE) & _MASK64
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        raw = (win * powers[::-1]).sum(axis=1, dtype=_U64)
        return np.unique(splitmix64(raw))
    finally:
        np.seterr(**old)


_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def token_hashes(text: str) -> np.ndarray:
    """Unique 64-bit hashes of ``\\w+`` tokens (crc-free: blake2b-8 per
    unique token; unique-first keeps the Python loop short)."""
    toks = set(_TOKEN_RE.findall(text))
    if not toks:
        return np.empty(0, dtype=_U64)
    out = np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(t.encode("utf-8"), digest_size=8).digest(), "big"
            )
            for t in toks
        ),
        dtype=_U64,
        count=len(toks),
    )
    return np.unique(out)


def minhash_signature(hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature: min over elements of (a*x + b) mod 2^64.

    Empty input → all-ones sentinel (never matches anything else's row
    except another empty doc, which *should* collide)."""
    num_perm = len(a)
    if hashes.size == 0:
        return np.full(num_perm, _MASK64, dtype=_U64)
    old = np.seterr(over="ignore")
    try:
        # (S, P) product — S capped by unique shingles per doc; chunk very
        # large docs to bound the temporary.
        if hashes.size > 16384:
            sig = np.full(num_perm, _MASK64, dtype=_U64)
            for i in range(0, hashes.size, 16384):
                chunk = hashes[i : i + 16384]
                vals = (chunk[:, None] * a[None, :] + b[None, :]) & _MASK64
                np.minimum(sig, vals.min(axis=0), out=sig)
            return sig
        vals = (hashes[:, None] * a[None, :] + b[None, :]) & _MASK64
        return vals.min(axis=0)
    finally:
        np.seterr(**old)


def lsh_band_keys(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Fold each band of ``rows`` signature slots into one 64-bit key,
    mixing in the band index so keys from different bands never collide
    by construction (band id occupies the high mix input)."""
    assert sig.size == bands * rows
    old = np.seterr(over="ignore")
    try:
        folded = np.zeros(bands, dtype=_U64)
        banded = sig.reshape(bands, rows)
        for r in range(rows):
            folded = splitmix64(folded * _POLY_BASE + banded[:, r])
        return splitmix64(folded + (np.arange(bands, dtype=_U64) << _U64(56)))
    finally:
        np.seterr(**old)


def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash over a set of feature hashes (unweighted)."""
    if hashes.size == 0:
        return 0
    bits = (hashes[:, None] >> np.arange(64, dtype=_U64)[None, :]) & _U64(1)
    counts = bits.sum(axis=0, dtype=np.int64)
    out = np.where(counts * 2 >= hashes.size, np.uint64(1), np.uint64(0))
    return int((out << np.arange(64, dtype=_U64)).sum(dtype=_U64))


def hamming64(a: np.ndarray, b: int | np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays."""
    x = np.bitwise_xor(np.asarray(a, dtype=_U64), _U64(b) if np.isscalar(b) else b)
    # popcount via unpackbits on the byte view
    return np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)


def winnow_fingerprints(shingle_hashes_sorted_by_pos: np.ndarray, window: int) -> np.ndarray:
    """Winnowing (Schleimer et al., SIGMOD'03): min hash per sliding
    window of ``window`` consecutive shingles → document fingerprint set.
    Input must be position-ordered (NOT the unique()d set)."""
    h = shingle_hashes_sorted_by_pos
    if h.size == 0:
        return np.empty(0, dtype=_U64)
    if h.size <= window:
        return np.unique(h.min(keepdims=True))
    win = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(win.min(axis=1))


def char_shingle_hashes_positional(text: str, k: int) -> np.ndarray:
    """Like char_shingle_hashes but keeps positional order + duplicates
    (needed by winnowing)."""
    data = text.encode("utf-8", "ignore")
    if len(data) < k:
        if not data:
            return np.empty(0, dtype=_U64)
        data = data + b" " * (k - len(data))
    arr = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    old = np.seterr(over="ignore")
    try:
        powers = np.empty(k, dtype=_U64)
        powers[0] = _U64(1)
        for i in range(1, k):
            powers[i] = (powers[i - 1] * _POLY_BASE) & _MASK64
        win = np.lib.stride_tricks.sliding_window_view(arr, k)
        return splitmix64((win * powers[::-1]).sum(axis=1, dtype=_U64))
    finally:
        np.seterr(**old)


def decode_sig_column(col, num_perm: int) -> np.ndarray:
    """(n,) Arrow binary column of packed u64 signatures → (n, num_perm)
    uint64 matrix (one frombuffer over the concatenated payload)."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), dtype=_U64)
    buf = b"".join(col.to_pylist())
    return np.frombuffer(buf, dtype=_U64).reshape(n, num_perm)


def rng_for(seed: int, *key_parts) -> np.random.Generator:
    """Per-key deterministic RNG — replaces the reference's shared
    sequential ``random.Random`` (``build_standard_dataset.py:941``) so
    generation parallelizes reproducibly."""
    h = hashlib.blake2b(
        ("\x1f".join([str(seed), *map(str, key_parts)])).encode("utf-8"),
        digest_size=16,
    )
    return np.random.default_rng(int.from_bytes(h.digest(), "big"))
