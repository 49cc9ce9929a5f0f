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
    with np.errstate(over="ignore"):
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
    """Deterministic signed-int64 id from key strings (blake2b-8).

    LEGACY for record identity: 64-bit ids birthday-collide around
    10^9.7 records — the PIPELINE's record ids are :func:`stable_id128`
    since round 4.  Still fine for non-identity uses (hash priorities,
    test fixtures with known-small domains)."""
    h = hashlib.blake2b("\x1f".join(parts).encode("utf-8"), digest_size=8)
    return int.from_bytes(h.digest(), "big", signed=True)


#: canonical numpy dtype for 128-bit record ids: 16 raw big-endian bytes.
#: 'S16' sort/unique/searchsorted are lexicographic == unsigned numeric
#: order; trailing-NUL stripping in numpy comparisons is injective on
#: fixed-length inputs, so equality semantics are exact.
ID_DTYPE = "S16"


def stable_id128(*parts: str) -> bytes:
    """Deterministic 16-byte record id (blake2b-16) — the pipeline's
    record identity since round 4.  At the 10^12-row target the 64-bit
    variant silently merges unrelated records (birthday bound ~10^9.7);
    128 bits pushes the collision horizon past 10^18."""
    return hashlib.blake2b(
        "\x1f".join(parts).encode("utf-8"), digest_size=16
    ).digest()


def ids_np(col) -> np.ndarray:
    """Arrow binary id column → (n,) numpy 'S16' array.  Zero-copy off
    the Arrow data buffer when the column is null-free with a fixed
    16-byte stride (the stable_id128 invariant); copying fallback
    otherwise."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=ID_DTYPE)
    if arr.null_count == 0:
        if pa.types.is_fixed_size_binary(arr.type) and arr.type.byte_width == 16:
            return np.frombuffer(
                arr.buffers()[1], dtype=ID_DTYPE, count=n, offset=arr.offset * 16
            )
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
            # binary carries int32 offsets, large_binary int64 — read the
            # right width so both types hit the zero-copy path
            odt, ow = (
                (np.int64, 8) if pa.types.is_large_binary(arr.type) else (np.int32, 4)
            )
            offsets = np.frombuffer(
                arr.buffers()[1], dtype=odt, count=n + 1, offset=arr.offset * ow
            )
            if offsets[-1] - offsets[0] == n * 16 and np.all(np.diff(offsets) == 16):
                return np.frombuffer(
                    arr.buffers()[2], dtype=ID_DTYPE, count=n, offset=int(offsets[0])
                )
    return np.array(
        [v if v is not None else b"\x00" * 16 for v in arr.to_pylist()],
        dtype=ID_DTYPE,
    )


def pack_ids(ids: np.ndarray):
    """(n,) 'S16' numpy array → Arrow binary array, full 16 bytes per
    value (NEVER via .tolist(), which strips trailing NULs)."""
    import pyarrow as pa

    n = len(ids)
    if n == 0:
        return pa.array([], type=pa.binary())
    data = np.ascontiguousarray(ids).tobytes()
    offsets = (np.arange(n + 1, dtype=np.int32) * 16).tobytes()
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(offsets), pa.py_buffer(data)]
    )


def id_hash64(ids: np.ndarray) -> np.ndarray:
    """Deterministic u64 hash of 'S16' ids — the routing/salting basis
    (buckets, hot-key sampling, pair-bucket hashes).  Folds BOTH 64-bit
    halves so an id-prefix collision cannot co-route distinct records."""
    if len(ids) == 0:
        return np.empty(0, dtype=_U64)
    mat = np.frombuffer(np.ascontiguousarray(ids).tobytes(), dtype="<u8").reshape(
        -1, 2
    )
    with np.errstate(over="ignore"):
        return splitmix64(splitmix64(mat[:, 0].copy()) ^ mat[:, 1])


# modular inverse of _POLY_BASE mod 2^64 (odd → invertible); used by the
# O(n) prefix-based rolling hash below.
def _mod_inverse_u64(a: int) -> int:
    # Newton iteration: x_{k+1} = x_k (2 - a x_k) doubles correct bits
    x = a
    for _ in range(6):
        x = (x * (2 - a * x)) % (1 << 64)
    return x


_POLY_INV = np.uint64(_mod_inverse_u64(int(_POLY_BASE)))

# process-level cached power arrays (grow on demand)
_POW_CACHE: dict[str, np.ndarray] = {}


def _powers(base: np.uint64, n: int, key: str) -> np.ndarray:
    cur = _POW_CACHE.get(key)
    if cur is None or cur.size < n:
        size = max(n, 1 << 16)
        old = np.seterr(over="ignore")
        try:
            out = np.empty(size, dtype=_U64)
            out[0] = _U64(1)
            np.cumprod(np.full(size - 1, base, dtype=_U64), out=out[1:])
        finally:
            np.seterr(**old)
        _POW_CACHE[key] = out
        cur = out
    return cur


def _rolling_window_hashes(arr: np.ndarray, k: int) -> np.ndarray:
    """All k-window polynomial hashes of a uint64 byte array in O(n):
    H(i) = q^{i+k-1} * (C[i+k-1] - C[i-1]) with C[m] = Σ_{j≤m} b[j] q^{-j}
    (all mod 2^64; q odd → invertible). Identical values to the naive
    Σ b[i+t]·q^{k-1-t} windowed dot, ~k× less memory traffic."""
    n = arr.size
    old = np.seterr(over="ignore")
    try:
        qpow = _powers(_POLY_BASE, n + 1, "q")
        qinv = _powers(_POLY_INV, n + 1, "qinv")
        c = arr * qinv[:n]
        C = np.cumsum(c, dtype=_U64)
        diff = C[k - 1 :].copy()
        diff[1:] -= C[: n - k]
        return diff * qpow[k - 1 : n]
    finally:
        np.seterr(**old)


def char_shingle_hashes_u64(arr: np.ndarray, k: int, unique: bool = True) -> np.ndarray:
    """Core of ``char_shingle_hashes`` over an already-converted uint64
    byte array (share ONE encode + dtype conversion across several k).
    ``unique=False`` skips the sort — OPH MinHash is duplicate-
    insensitive (min per bucket), so its inputs never need it."""
    if arr.size < k:
        if arr.size == 0:
            return np.empty(0, dtype=_U64)
        arr = np.concatenate([arr, np.full(k - arr.size, 32, dtype=_U64)])
    h = splitmix64(_rolling_window_hashes(arr, k))
    return np.unique(h) if unique else h


def char_shingle_hashes(text: str, k: int) -> np.ndarray:
    """Unique 64-bit hashes of all char k-grams of ``text`` (vectorized).

    Analogue of ``generate_ngrams`` (``fuzz/inexus_parser.py:2657-2660``)
    but emitting hashes, not strings: an O(n) prefix rolling hash under
    uint64 wraparound, then a splitmix64 finalize.
    """
    data = text.encode("utf-8", "ignore")
    arr = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    return char_shingle_hashes_u64(arr, k, unique=True)


_TOKEN_RE = re.compile(r"\w+", re.UNICODE)


def token_hashes_u64(arr: np.ndarray, unique: bool = True) -> tuple[np.ndarray, int]:
    """(token hashes, token count) over an already-converted uint64 byte
    array. ASCII-whitespace token runs; ``unique=False`` for OPH inputs."""
    n = arr.size
    if n == 0:
        return np.empty(0, dtype=_U64), 0
    old = np.seterr(over="ignore")
    try:
        is_sep = (arr == 32) | (arr == 10) | (arr == 9) | (arr == 13)
        # segment starts/ends (token = maximal run of non-separator bytes)
        tok = ~is_sep
        starts = np.flatnonzero(tok & ~np.concatenate([[False], tok[:-1]]))
        ends = np.flatnonzero(tok & ~np.concatenate([tok[1:], [False]])) + 1
        if starts.size == 0:
            return np.empty(0, dtype=_U64), 0
        qpow = _powers(_POLY_BASE, n + 1, "q")
        qinv = _powers(_POLY_INV, n + 1, "qinv")
        C = np.cumsum(arr * qinv[:n], dtype=_U64)
        seg = C[ends - 1] - np.where(starts > 0, C[starts - 1], _U64(0))
        # normalize exponent so equal tokens hash equally wherever they
        # appear, and mix in the length to separate prefixes
        h = splitmix64(seg * qpow[starts] + (ends - starts).astype(_U64))
        return (np.unique(h) if unique else h), int(starts.size)
    finally:
        np.seterr(**old)


def text_hash60(col) -> np.ndarray:
    """Vectorized 60-bit content hash of a whole string column — the
    replacement for the per-row ``hashlib.md5`` fold the samplers and
    sketch diagnostics used to run (the named per-row-Python
    anti-pattern): ``acc = acc·B + byte`` polynomial over the UTF-8
    bytes (B = FNV-64 prime, computed in ONE prefix-sum pass over the
    concatenated Arrow buffer — O(total bytes), no per-row Python),
    ``+ length``, splitmix64 finalize, top 60 bits (``>> 4`` so the
    value fits int64 exactly like the old 15-hex-char md5 prefix).

    SQL twin: the ``strh60(expr)`` macro family in ``pipelines.oracle``
    (mulmod64 fold over ``ascii()`` code points — the ASCII-corpus
    assumption shared with the shingle oracles).  Nulls hash as ''.

    Accepts a pyarrow Array/ChunkedArray, pandas Series, list, or numpy
    object array."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col, type=pa.string(), from_pandas=True)
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        odt, ow = np.int64, 8
    else:
        odt, ow = np.int32, 4
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    offs = np.frombuffer(
        arr.buffers()[1], dtype=odt, count=n + 1, offset=arr.offset * ow
    ).astype(np.int64)
    starts = offs[:-1] - offs[0]
    ends = offs[1:] - offs[0]
    old = np.seterr(over="ignore")
    try:
        nb = int(ends[-1]) if n else 0
        if nb == 0:
            h = splitmix64(np.zeros(n, dtype=_U64))
            return (h >> _U64(4)).astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=nb,
                             offset=int(offs[0]))
        b = data.astype(_U64)
        qpow = _powers(_POLY_BASE, nb + 1, "q")
        qinv = _powers(_POLY_INV, nb + 1, "qinv")
        C = np.cumsum(b * qinv[:nb], dtype=_U64)
        e1 = np.maximum(ends, 1) - 1
        seg = C[e1] - np.where(starts > 0, C[np.maximum(starts, 1) - 1], _U64(0))
        poly = np.where(ends > starts, seg * qpow[e1], _U64(0))
        h = splitmix64(poly + (ends - starts).astype(_U64))
        return (h >> _U64(4)).astype(np.int64)
    finally:
        np.seterr(**old)


def token_hashes(text: str) -> np.ndarray:
    """Unique 64-bit hashes of whitespace-separated tokens, fully
    vectorized: one polynomial segment-hash pass over the byte buffer
    (prefix-sum trick — same machinery as the rolling shingle hash).
    Intended for already-normalized text (single-space separated); a
    hash-per-token Python loop costs ~1 µs × tokens × corpus."""
    data = text.encode("utf-8", "ignore")
    arr = np.frombuffer(data, dtype=np.uint8).astype(_U64)
    h, _ = token_hashes_u64(arr, unique=True)
    return h


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


def oph_minhash(hashes: np.ndarray, num_perm: int, seed: int = 0) -> np.ndarray:
    """One-permutation hashing MinHash (Li et al., NIPS'12) with rotation
    densification (Shrivastava & Li, ICML'14): shingle hashes are binned
    by their top bits, lane p = min hash in bin p, empty lanes borrow the
    next non-empty lane's value re-mixed by the borrow distance.

    ONE pass over the shingle set vs the classic num_perm passes —
    collision probability per lane still ≈ Jaccard, which is all the LSH
    banding and the scorer's equality-mean estimate need. num_perm must
    be a power of two. Empty input → all-ones sentinel.
    """
    if hashes.size == 0:
        return np.full(num_perm, _MASK64, dtype=_U64)
    shift = _U64(64 - int(num_perm).bit_length() + 1)
    assert (1 << int(64 - int(shift))) == num_perm, "num_perm must be 2^k"
    old = np.seterr(over="ignore")
    try:
        h = splitmix64(hashes + _U64(seed) * _U64(0x9E3779B97F4A7C15))
        bins = (h >> shift).astype(np.int64)
        sig = np.full(num_perm, _MASK64, dtype=_U64)
        np.minimum.at(sig, bins, h)
        empty = sig == _MASK64
        if empty.any() and not empty.all():
            filled = np.flatnonzero(~empty)
            # nearest filled lane to the right (cyclic), re-mixed by the
            # borrow distance so borrowed lanes stay pairwise independent
            for p in np.flatnonzero(empty):
                d = (filled - p) % num_perm
                src = filled[np.argmin(d)]
                sig[p] = splitmix64(sig[src] + _U64(int((src - p) % num_perm)))
        return sig
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


def lsh_band_keys_batch(sigs: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Vectorized band keys for a whole batch: (n, bands*rows) signatures
    → (n, bands) keys. One numpy pass instead of a per-record loop."""
    n = sigs.shape[0]
    old = np.seterr(over="ignore")
    try:
        banded = sigs.reshape(n, bands, rows)
        folded = np.zeros((n, bands), dtype=_U64)
        for r in range(rows):
            folded = splitmix64(folded * _POLY_BASE + banded[:, :, r])
        return splitmix64(folded + (np.arange(bands, dtype=_U64) << _U64(56))[None, :])
    finally:
        np.seterr(**old)


def simhash64(hashes: np.ndarray) -> int:
    """64-bit SimHash over a set of feature hashes (unweighted).
    Implemented via unpackbits on the byte view — 8× less memory traffic
    than the broadcast-shift formulation (bit ORDER is arbitrary but
    deterministic, which is all SimHash needs)."""
    if hashes.size == 0:
        return 0
    bits = np.unpackbits(hashes.view(np.uint8)).reshape(hashes.size, 64)
    counts = bits.sum(axis=0, dtype=np.int64)
    out = (counts * 2 >= hashes.size).astype(np.uint8)
    return int.from_bytes(np.packbits(out).tobytes(), "big")


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


def string_column_byte_views(col) -> list[np.ndarray]:
    """Zero-copy uint8 views of each string's UTF-8 bytes in an Arrow
    string column (offsets + shared data buffer) — avoids the
    str-decode/re-encode round trip per row. Nulls view as empty."""
    import pyarrow as pa

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return []
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    )
    dbuf = arr.buffers()[2]
    data = (
        np.frombuffer(dbuf, dtype=np.uint8)
        if dbuf is not None
        else np.empty(0, dtype=np.uint8)
    )
    return [data[offs[i]: offs[i + 1]] for i in range(n)]


def decode_sig_column(col, num_perm: int, dtype=None) -> np.ndarray:
    """(n,) Arrow binary column of packed signatures → (n, num_perm)
    matrix (one frombuffer over the concatenated payload)."""
    import pyarrow as pa

    dtype = dtype or _U64
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), dtype=dtype)
    # Fixed-width values are contiguous in the Arrow data buffer after
    # combine_chunks — read it zero-copy instead of a b"".join() heap
    # copy per batch/actor. Offsets can start past 0 (sliced arrays) and
    # nulls/ragged payloads break the fixed-stride assumption — fall back
    # to the copying path for those rare shapes.
    width = num_perm * np.dtype(dtype).itemsize
    if col.null_count == 0:
        offsets = np.frombuffer(col.buffers()[1], dtype=np.int32, count=n + 1,
                                offset=col.offset * 4)
        if offsets[-1] - offsets[0] == n * width and np.all(
            np.diff(offsets) == width
        ):
            return np.frombuffer(
                col.buffers()[2], dtype=dtype, count=n * num_perm,
                offset=int(offsets[0]),
            ).reshape(n, num_perm)
    buf = b"".join(v or b"\0" * width for v in col.to_pylist())
    return np.frombuffer(buf, dtype=dtype).reshape(n, num_perm)


def rng_for(seed: int, *key_parts) -> np.random.Generator:
    """Per-key deterministic RNG — replaces the reference's shared
    sequential ``random.Random`` (``build_standard_dataset.py:941``) so
    generation parallelizes reproducibly."""
    h = hashlib.blake2b(
        ("\x1f".join([str(seed), *map(str, key_parts)])).encode("utf-8"),
        digest_size=16,
    )
    return np.random.default_rng(int.from_bytes(h.digest(), "big"))


# ---- batched fingerprint kernels (round 4) -------------------------------
# The per-row helpers above cost ~0.5 ms/row in Python/numpy call
# overhead; at corpus scale the fingerprint stage (the pipeline's one
# content scan and its Amdahl floor) is dominated by it.  These kernels
# process a WHOLE batch as one concatenated byte stream: every doc's
# bytes (padded to the widest shingle and separated by one space so
# token runs cannot span docs) in one u64 array, one global prefix-sum
# rolling hash, one OPH bin-min pass, one vectorized densification.
# Hash values are bit-identical to the per-row path (pinned by
# test_batched_fingerprint_kernels_parity).


def concat_doc_bytes(views: list, pad_to: int = 12):
    """[(uint8 view)…] → (concat u64 array, starts, orig lengths).
    Each doc occupies ``max(L, pad_to) + 1`` slots: space-padded to the
    widest shingle (the per-row rule pads short docs with 0x20) plus one
    trailing space separator."""
    n = len(views)
    Ls = np.fromiter((v.size for v in views), dtype=np.int64, count=n)
    Lp = np.maximum(Ls, pad_to) + 1
    total = int(Lp.sum())
    buf = np.full(total, 32, dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(Lp)[:-1]]).astype(np.int64)
    for i, v in enumerate(views):
        if v.size:
            buf[starts[i]: starts[i] + v.size] = v
    return buf.astype(_U64), starts, Ls


def _global_window_hashes(arr: np.ndarray, k: int) -> np.ndarray:
    """All k-window polynomial hashes over the concatenated stream
    (identical values to :func:`_rolling_window_hashes` at every
    position — the hash is position-independent)."""
    return _rolling_window_hashes(arr, k)


def doc_shingle_window_mask(
    total: int, starts: np.ndarray, Ls: np.ndarray, k: int
):
    """(valid-window mask over the global position axis, per-doc window
    counts) — marks positions whose k-window lies inside one doc
    (incl. its space padding; excl. the trailing separator).  Built
    with one slice-assign per DOC, never per element."""
    W = np.where(Ls == 0, 0, np.maximum(Ls, k) - k + 1)
    mask = np.zeros(total, dtype=bool)
    for i in range(len(starts)):
        w = int(W[i])
        if w:
            mask[starts[i]: starts[i] + w] = True
    return mask, W


def token_stream(arr: np.ndarray, starts: np.ndarray, n_docs: int):
    """Token hashes over the concatenated stream (separators: space /
    \\t / \\n / \\r — doc pads and the trailing separator are spaces, so
    runs never span docs) → (hash stream, doc index per token,
    per-doc token counts).  Values identical to
    :func:`token_hashes_u64` (position-independent segment hash)."""
    n = arr.size
    old = np.seterr(over="ignore")
    try:
        is_sep = (arr == 32) | (arr == 10) | (arr == 9) | (arr == 13)
        tok = ~is_sep
        t_starts = np.flatnonzero(tok & ~np.concatenate([[False], tok[:-1]]))
        t_ends = np.flatnonzero(tok & ~np.concatenate([tok[1:], [False]])) + 1
        counts = np.zeros(n_docs, dtype=np.int64)
        if t_starts.size == 0:
            return np.empty(0, dtype=_U64), np.empty(0, dtype=np.int64), counts
        qpow = _powers(_POLY_BASE, n + 1, "q")
        qinv = _powers(_POLY_INV, n + 1, "qinv")
        C = np.cumsum(arr * qinv[:n], dtype=_U64)
        seg = C[t_ends - 1] - np.where(t_starts > 0, C[t_starts - 1], _U64(0))
        h = splitmix64(seg * qpow[t_starts] + (t_ends - t_starts).astype(_U64))
        doc_of = np.searchsorted(starts, t_starts, side="right") - 1
        np.add.at(counts, doc_of, 1)
        return h, doc_of, counts
    finally:
        np.seterr(**old)


def oph_minhash_batch(
    h_stream: np.ndarray,
    doc_of: np.ndarray,
    n_docs: int,
    num_perm: int,
    seed: int = 0,
    mask: np.ndarray | None = None,
) -> np.ndarray:
    """(n_docs, num_perm) OPH signatures for a whole batch in three
    vector passes: seed-mix, global bin-min (``np.minimum.at`` over
    doc*num_perm+bin), and a fully vectorized rotation densification
    (suffix-min next-filled per row).  Lane values identical to
    :func:`oph_minhash`.

    ``mask``: optional validity mask aligned with ``h_stream`` — masked
    positions are NEUTRALIZED in place of gathered out (their value
    becomes the empty-lane sentinel, which can never win a min), so the
    whole pipeline runs gather-free."""
    shift = _U64(64 - int(num_perm).bit_length() + 1)
    assert (1 << int(64 - int(shift))) == num_perm, "num_perm must be 2^k"
    old = np.seterr(over="ignore")
    try:
        sig = np.full(n_docs * num_perm, _MASK64, dtype=_U64)
        if h_stream.size:
            h = splitmix64(h_stream + _U64(seed) * _U64(0x9E3779B97F4A7C15))
            if mask is not None:
                # sentinel never beats a real min; its bin (127, the
                # all-ones top bits) simply stays "empty" if nothing
                # real lands there — exactly the per-row semantics
                h = np.where(mask, h, _MASK64)
            bins = doc_of * num_perm + (h >> shift).astype(np.int64)
            np.minimum.at(sig, bins, h)
        sig = sig.reshape(n_docs, num_perm)
        empty = sig == _MASK64
        need = empty.any(axis=1) & ~empty.all(axis=1)
        if need.any():
            sub = sig[need]
            emp = empty[need]
            P = num_perm
            lane = np.arange(P, dtype=np.int64)
            fidx = np.where(~emp, lane[None, :], 2 * P)
            nxt = np.minimum.accumulate(fidx[:, ::-1], axis=1)[:, ::-1]
            first = fidx.min(axis=1)
            src = np.where(nxt < 2 * P, nxt, first[:, None] + P)
            d = (src - lane[None, :]).astype(_U64)
            gathered = np.take_along_axis(sub, (src % P), axis=1)
            borrowed = splitmix64(gathered + d)
            sig[need] = np.where(emp, borrowed, sub)
        return sig
    finally:
        np.seterr(**old)
