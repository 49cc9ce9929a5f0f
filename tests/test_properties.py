"""Property-based tests (hypothesis) for the hash/sketch kernels —
invariants the pipeline's correctness rests on, probed over random
inputs rather than fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from address_parser_ray.functions.hashing import (
    char_shingle_hashes,
    char_shingle_hashes_u64,
    oph_minhash,
    simhash64,
    splitmix64,
    token_hashes,
    token_hashes_u64,
    winnow_fingerprints,
)

text_st = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=400
)


@given(text_st)
@settings(max_examples=60, deadline=None)
def test_shingle_hashes_deterministic_and_sorted(t):
    a = char_shingle_hashes(t, 4)
    b = char_shingle_hashes(t, 4)
    assert (a == b).all()
    if a.size >= 2:
        assert (np.diff(a) > 0).all()  # sorted + unique (set semantics)


@given(text_st)
@settings(max_examples=60, deadline=None)
def test_oph_duplicate_insensitive(t):
    """min-per-bucket over a multiset equals min over its set — the
    invariant that lets the fingerprint stage skip unique()."""
    arr = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
    raw = char_shingle_hashes_u64(arr, 4, unique=False)
    uni = char_shingle_hashes_u64(arr, 4, unique=True)
    assert (oph_minhash(raw, 64, 42) == oph_minhash(uni, 64, 42)).all()


@given(text_st)
@settings(max_examples=60, deadline=None)
def test_token_hashes_position_independent(t):
    """A token's hash is independent of where it appears: hashing the
    reversed token sequence yields the same SET."""
    toks = t.split()
    fwd = token_hashes(" ".join(toks))
    rev = token_hashes(" ".join(reversed(toks)))
    assert (np.sort(fwd) == np.sort(rev)).all()


@given(text_st)
@settings(max_examples=60, deadline=None)
def test_token_count_matches_split(t):
    arr = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.uint64)
    _, n = token_hashes_u64(arr)
    assert n == len(t.split())


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=200))
@settings(max_examples=60, deadline=None)
def test_winnow_subset_of_input(xs):
    h = np.asarray(xs, dtype=np.uint64)
    fp = winnow_fingerprints(h, 8)
    assert set(fp.tolist()).issubset(set(h.tolist()))
    # winnowing guarantee: at least one fingerprint per full window
    if h.size >= 8:
        assert fp.size >= 1


@given(st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=100, deadline=None)
def test_splitmix_is_bijective_sample(x):
    """splitmix64 is a bijection — distinct inputs may not collide (spot
    check against x+1)."""
    a = splitmix64(np.uint64(x))
    b = splitmix64(np.uint64((x + 1) % 2**64))
    assert a != b


@given(text_st, text_st)
@settings(max_examples=40, deadline=None)
def test_simhash_identical_text_identical_hash(a, b):
    sa = simhash64(char_shingle_hashes(a, 4))
    sb = simhash64(char_shingle_hashes(b, 4))
    if a == b:
        assert sa == sb
