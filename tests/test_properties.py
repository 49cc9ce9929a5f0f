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


# --- pure query kernels (no Ray) -------------------------------------------

events_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),          # user_id
        st.integers(min_value=0, max_value=100),        # ts (µs)
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    max_size=80,
)


@given(events_st, st.integers(min_value=1, max_value=50))
@settings(max_examples=120, deadline=None)
def test_funnel_anchors_match_bruteforce(events, window):
    """The vectorized masked-reduceat funnel equals a per-user brute
    force for every random event log and window width."""
    from address_parser_ray.pipelines.queries import _funnel_anchors

    uid = np.array([e[0] for e in events], dtype=np.int64)
    tsi = np.array([e[1] for e in events], dtype=np.int64)
    typ = np.array([e[2] for e in events], dtype=object)
    tv, tc, tb = _funnel_anchors(uid, tsi, typ, window)

    INF = np.iinfo(np.int64).max
    users = sorted(set(uid.tolist()))
    assert len(users) == len(tv) == len(tc) == len(tb)
    for k, u in enumerate(users):
        rows = [(t, y) for i, (t, y) in enumerate(zip(tsi, typ)) if uid[i] == u]
        t0 = min((t for t, y in rows if y == "view"), default=INF)
        t1 = (
            min((t for t, y in rows
                 if y == "click" and t > t0 and t - t0 <= window), default=INF)
            if t0 < INF else INF
        )
        t2 = (
            min((t for t, y in rows
                 if y == "purchase" and t > t1 and t - t1 <= window), default=INF)
            if t1 < INF else INF
        )
        assert (tv[k], tc[k], tb[k]) == (t0, t1, t2), (u, rows)


@given(
    st.integers(min_value=0, max_value=5000),
    st.integers(min_value=2, max_value=64),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=200, deadline=None)
def test_chunk_spans_invariants(n, size, stride):
    """Chunk windows tile the doc: full coverage, strictly increasing
    starts, every span non-empty and ≤ size, last span ends at n, and
    with stride < size consecutive spans overlap by size − stride
    (except possibly the clamped last one)."""
    from address_parser_ray.pipelines.queries import _chunk_spans

    stride = min(stride, size)  # stride > size would skip tokens
    spans = _chunk_spans(n, size, stride)
    if n == 0:
        assert spans == []
        return
    assert spans[0][0] == 0 and spans[-1][1] == n
    covered = 0
    for j, (lo, hi) in enumerate(spans):
        assert lo < hi <= n and hi - lo <= size
        assert lo <= covered  # no gap
        covered = max(covered, hi)
        if j:
            assert lo == spans[j - 1][0] + stride
    assert covered == n
    if n <= size:
        assert len(spans) == 1


@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200),
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=200),
)
@settings(max_examples=80, deadline=None)
def test_bloom_no_false_negatives(members, probes):
    """Every inserted key must probe positive (the exactness of the
    bloom-prefiltered semi-join rests on zero false negatives)."""
    from address_parser_ray.functions.bloom import bloom_build, bloom_probe

    keys = np.array(members, dtype=np.int64)
    words, m, k = bloom_build(keys)
    assert bloom_probe(words, m, k, keys).all()
    # false-positive rate sanity on disjoint probes (16 bits/key, k=4
    # → theoretical ~0.2%; assert a loose 10% bound, not exactness)
    others = np.array([p for p in probes if p not in set(members)], dtype=np.int64)
    if others.size >= 50:
        assert bloom_probe(words, m, k, others).mean() <= 0.10
