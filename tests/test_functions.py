"""Kernel-level unit tests: hashing, MinHash accuracy, similarity."""

import numpy as np
import pytest

from address_parser_ray.functions.hashing import (
    char_shingle_hashes,
    char_shingle_hashes_positional,
    hamming64,
    lsh_band_keys,
    minhash_params,
    minhash_signature,
    rng_for,
    sha256_hex,
    simhash64,
    splitmix64,
    stable_id64,
    token_hashes,
    winnow_fingerprints,
)
from address_parser_ray.functions.similarity import (
    dice,
    exact_jaccard,
    jaro_winkler,
    minhash_jaccard,
    size_ratio,
)


def test_sha256_matches_hashlib():
    import hashlib

    assert sha256_hex(["abc"]) == [hashlib.sha256(b"abc").hexdigest()]
    assert sha256_hex([None]) == [hashlib.sha256(b"").hexdigest()]


def test_stable_id_deterministic():
    assert stable_id64("a", "b", "c") == stable_id64("a", "b", "c")
    assert stable_id64("a", "b", "c") != stable_id64("a", "bc", "")


def test_stable_id128_shape_and_determinism():
    from address_parser_ray.functions.hashing import stable_id128

    a = stable_id128("r", "p", "c")
    assert isinstance(a, bytes) and len(a) == 16
    assert a == stable_id128("r", "p", "c")
    assert a != stable_id128("r", "pc", "")


def test_id128_full_width_discrimination():
    """The collision property the 128-bit migration exists for: two ids
    equal in their first 8 bytes (the entire former 64-bit identity)
    but differing in the last 8 MUST stay distinct through every id
    primitive — unique, searchsorted identity lookups, pair packing,
    and the union-find — i.e. identity decisions consume all 16 bytes,
    not an int64 prefix."""
    import numpy as np
    import pyarrow as pa

    from address_parser_ray.functions.hashing import (
        id_hash64,
        ids_np,
        pack_ids,
    )

    a = b"\x12" * 8 + b"\x00" * 8
    b = b"\x12" * 8 + b"\x00" * 7 + b"\x01"  # same 64-bit prefix
    ids = np.array([a, b], dtype="S16")
    # distinct through unique
    assert len(np.unique(ids)) == 2
    # distinct through the Arrow round trip (full 16 bytes preserved)
    col = pack_ids(ids)
    assert col.to_pylist() == [a, b]
    assert np.array_equal(ids_np(pa.chunked_array([col])), ids)
    # identity lookup resolves each to itself, not to its prefix-twin
    srt = np.sort(ids)
    pos = np.searchsorted(srt, ids)
    assert np.array_equal(srt[pos], ids)
    # routing hash consumes both halves
    h = id_hash64(ids)
    assert h[0] != h[1]
    # union-find keeps them in separate components absent an edge
    from address_parser_ray.stages.clustering import _numpy_components

    c = b"\x99" * 16
    uniq, roots = _numpy_components(
        np.array([a], dtype="S16"), np.array([c], dtype="S16")
    )
    lab = dict(zip(uniq.tolist(), roots.tolist()))
    # b never appeared in an edge; a and c merged, b untouched
    assert lab[a[: len(a)].rstrip(b"\x00") or a] != None  # noqa: E711 — presence check
    assert len(uniq) == 2  # a and c only — b absent, no phantom merge


def test_id128_trailing_nul_stripping_is_injective():
    """numpy 'S16' comparisons strip trailing NULs — injective on
    fixed-length inputs (two distinct 16-byte strings never strip to
    the same value), so equality through numpy is exact."""
    import numpy as np

    x = np.array([b"ab" + b"\x00" * 14], dtype="S16")
    y = np.array([b"ab\x00" + b"q" + b"\x00" * 12], dtype="S16")
    assert x[0] != y[0]
    assert len(np.unique(np.concatenate([x, y]))) == 2


def test_shingles_deterministic_and_shifted():
    a = char_shingle_hashes("the quick brown fox jumps", 4)
    b = char_shingle_hashes("the quick brown fox jumps", 4)
    assert np.array_equal(a, b)
    assert char_shingle_hashes("", 4).size == 0
    assert char_shingle_hashes("ab", 4).size == 1  # padded


def test_minhash_estimates_jaccard():
    """MinHash Jaccard estimate within ~0.1 of exact for 128 perms."""
    rng = rng_for(1, "mh")
    base = rng.integers(0, 2**63, 2000).astype(np.uint64)
    other = base.copy()
    other[:1000] = rng.integers(0, 2**63, 1000).astype(np.uint64)  # ~1/3 jaccard
    a, b = minhash_params(128, 42)
    s1 = minhash_signature(np.unique(base), a, b)
    s2 = minhash_signature(np.unique(other), a, b)
    est = minhash_jaccard(s1, s2)
    exact = exact_jaccard(np.unique(base), np.unique(other))
    assert abs(est - exact) < 0.12
    # identical sets → identical signatures
    assert np.array_equal(s1, minhash_signature(np.unique(base), a, b))


def test_empty_minhash_sentinel():
    a, b = minhash_params(16, 0)
    s = minhash_signature(np.empty(0, dtype=np.uint64), a, b)
    assert (s == np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_lsh_band_keys_shape_and_band_mixing():
    a, b = minhash_params(128, 42)
    sig = minhash_signature(np.arange(100, dtype=np.uint64), a, b)
    keys = lsh_band_keys(sig, 32, 4)
    assert keys.shape == (32,)
    assert len(np.unique(keys)) == 32  # band index mixed in


def test_simhash_similar_inputs_close():
    h1 = char_shingle_hashes("def load_user(x): return x + 1", 4)
    h2 = char_shingle_hashes("def load_user(y): return y + 1", 4)
    h3 = char_shingle_hashes("completely different program text here", 4)
    d_close = hamming64(np.array([simhash64(h1)], dtype=np.uint64), simhash64(h2))[0]
    d_far = hamming64(np.array([simhash64(h1)], dtype=np.uint64), simhash64(h3))[0]
    assert d_close < d_far


def test_winnowing_subset_of_hashes():
    h = char_shingle_hashes_positional("some text for winnowing windows", 4)
    fp = winnow_fingerprints(h, 5)
    assert fp.size > 0
    assert np.isin(fp, h).all()
    assert fp.size <= np.unique(h).size


def test_jaro_winkler_basics():
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0
    assert 0.7 < jaro_winkler("martha", "marhta") <= 1.0
    assert jaro_winkler("", "abc") == 0.0


def test_set_similarities():
    a = np.array([1, 2, 3, 4], dtype=np.uint64)
    b = np.array([3, 4, 5, 6], dtype=np.uint64)
    assert exact_jaccard(a, b) == pytest.approx(2 / 6)
    assert dice(a, b) == pytest.approx(0.5)
    assert size_ratio(10, 20) == 0.5
    assert size_ratio(0, 0) == 1.0


def test_splitmix_vectorized_matches_scalar():
    xs = np.arange(10, dtype=np.uint64)
    vec = splitmix64(xs)
    for i, x in enumerate(xs):
        assert splitmix64(np.uint64(x)) == vec[i]


def test_rng_for_key_independence():
    assert rng_for(42, "a").integers(0, 1 << 30) == rng_for(42, "a").integers(0, 1 << 30)
    assert rng_for(42, "a").integers(0, 1 << 30) != rng_for(42, "b").integers(0, 1 << 30)


def test_token_hashes_unique_sorted():
    t = token_hashes("a b a c a")
    assert t.size == 3
    assert np.array_equal(t, np.sort(t))


def test_token_hashes_position_independent():
    """Equal tokens hash equally wherever they appear; different tokens
    (incl. prefix pairs) differ."""
    h1 = token_hashes("alpha beta")
    h2 = token_hashes("beta alpha")
    assert np.array_equal(h1, h2)
    h3 = token_hashes("alph")  # prefix of alpha
    assert not np.intersect1d(h1, h3).size


def test_oph_minhash_properties():
    from address_parser_ray.functions.hashing import oph_minhash

    rng = rng_for(9, "oph")
    a = np.unique(rng.integers(0, 2**63, 3000).astype(np.uint64))
    # deterministic; identical sets → identical signatures
    assert np.array_equal(oph_minhash(a, 128, 1), oph_minhash(a, 128, 1))
    # different seeds → different signatures
    assert not np.array_equal(oph_minhash(a, 128, 1), oph_minhash(a, 128, 2))
    # empty → sentinel
    assert (oph_minhash(np.empty(0, dtype=np.uint64), 64, 0)
            == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
    # tiny sets leave empty bins → densification fills every lane
    tiny = oph_minhash(a[:3], 64, 0)
    assert (tiny != np.uint64(0xFFFFFFFFFFFFFFFF)).all()


def test_lsh_band_keys_batch_matches_single():
    from address_parser_ray.functions.hashing import lsh_band_keys_batch

    a, b = minhash_params(128, 42)
    sigs = np.stack(
        [
            minhash_signature(np.arange(10 + i, dtype=np.uint64) * np.uint64(7), a, b)
            for i in range(5)
        ]
    )
    batch = lsh_band_keys_batch(sigs, 32, 4)
    for i in range(5):
        assert np.array_equal(batch[i], lsh_band_keys(sigs[i], 32, 4))


def test_label_tokens_bio():
    from address_parser_ray.functions.text import label_tokens_bio

    tags = label_tokens_bio(
        "the hash join beats table scan here".split(),
        [["hash", "join"], ["table", "scan"]],
    )
    assert tags == ["O", "B-PHR", "I-PHR", "O", "B-PHR", "I-PHR", "O"]
    assert label_tokens_bio([], [["x"]]) == []


def test_sessionize():
    from address_parser_ray.functions.text import sessionize

    ts = np.array(
        ["2026-01-01T00:00:00", "2026-01-01T00:10:00", "2026-01-01T02:00:00"],
        dtype="datetime64[us]",
    )
    assert sessionize(ts, 1800.0).tolist() == [0, 0, 1]
    assert sessionize(np.array([], dtype="datetime64[us]"), 1800.0).size == 0


def test_normalize_strips_block_comments_and_docstrings():
    """M1 parity: variants differing only in /* */ blocks or Python
    docstrings must normalize identically (reference standardize_name's
    aggressive noise stripping, inexus_parser.py:2295-2463)."""
    import pyarrow as pa

    from address_parser_ray.functions.normalize import normalize_content_arrow

    base = "def f(x):\n    return x + 1\n"
    with_doc = 'def f(x):\n    """adds one\n    to x"""\n    return x + 1\n'
    with_sq = "def f(x):\n    '''adds one'''\n    return x + 1\n"
    c_base = "int f(int x) { return x + 1; }\n"
    c_block = "/* adds one\n   to x */\nint f(int x) { return x + 1; }\n"
    out = normalize_content_arrow(
        pa.array([base, with_doc, with_sq, c_base, c_block])
    ).to_pylist()
    assert out[0] == out[1] == out[2]
    assert out[3] == out[4]
    # unterminated block comment is left alone (no catastrophic regex)
    ok = normalize_content_arrow(pa.array(["a /* open forever"])).to_pylist()
    assert "open" in ok[0]


def test_media_pgm_roundtrip_and_codec_errors():
    """Real multimodal decode: PGM encode/decode round-trips exactly;
    codec-requiring formats fail loudly with the codec name."""
    import numpy as np
    import pytest

    from address_parser_ray.functions.media import (
        decode_image,
        encode_pgm,
        raster_features,
        synth_pgm_from_bytes,
    )

    raster = (np.arange(12, dtype=np.uint8) * 7).reshape(3, 4)
    w, h, back = decode_image(encode_pgm(raster))
    assert (w, h) == (4, 3)
    assert (back == raster).all()

    payload = synth_pgm_from_bytes(b"hello media world", width=8)
    w, h, r = decode_image(payload)
    assert w == 8 and h == 3 and r[0, 0] == ord("h")
    feats = raster_features(r)
    assert feats["nonzero_px"] == 17
    assert feats["mean_gray_1e4"] > 0

    with pytest.raises(NotImplementedError, match="jpeg"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(NotImplementedError, match="png"):
        decode_image(b"\x89PNG\r\n")


def test_cdc_chunk_spans_partition_and_shift_resilience():
    """CDC spans must exactly partition the text into non-empty chunks,
    and — the property that motivates content-defined over fixed-stride
    chunking — an insertion near the front must leave the chunk set
    after the edit point intact (boundaries re-synchronize)."""
    from address_parser_ray.pipelines.queries import _cdc_chunk_spans

    rng = np.random.default_rng(11)
    alphabet = np.array(list("abcdefgh XYZ.,\n"), dtype="<U1")
    for trial in range(20):
        n = int(rng.integers(0, 800))
        s = "".join(rng.choice(alphabet, size=n))
        cps = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        starts, ends = _cdc_chunk_spans(cps)
        if n == 0:
            assert starts.size == 0
            continue
        # exact partition, no empty chunk
        assert starts[0] == 0 and ends[-1] == n
        assert (starts[1:] == ends[:-1]).all()
        assert (ends > starts).all()

    # shift resilience: insert 3 chars at position 10 of a 600-char text;
    # the multiset of chunk contents may only change near the edit.
    s = "".join(rng.choice(alphabet, size=600))
    s2 = s[:10] + "@@@" + s[10:]

    def chunks(text):
        cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        st, en = _cdc_chunk_spans(cp)
        return [text[a:b] for a, b in zip(st, en)]

    c1, c2 = chunks(s), chunks(s2)
    # every chunk that starts after the edit's resync window is shared
    from collections import Counter

    common = sum((Counter(c1) & Counter(c2)).values())
    assert common >= len(c1) - 3  # at most the edit-local chunks differ


def test_skyline_2d_matches_bruteforce():
    """Pareto keep-mask vs O(n²) dominance brute force, including ties
    on one or both axes (equal pairs never dominate each other)."""
    from address_parser_ray.pipelines.queries import _skyline_2d

    rng = np.random.default_rng(3)
    for _ in range(150):
        n = int(rng.integers(0, 40))
        s = rng.integers(0, 6, n).astype(np.int64)
        p = rng.integers(0, 8, n).astype(np.int64)
        k = _skyline_2d(s, p)
        brute = np.array(
            [
                not any(
                    s[j] >= s[i]
                    and p[j] <= p[i]
                    and (s[j] > s[i] or p[j] < p[i])
                    for j in range(n)
                )
                for i in range(n)
            ],
            dtype=bool,
        )
        assert (k == brute).all()


def test_detect_lang_batch_parity():
    """The vectorized langid must equal the per-row reference on
    adversarial inputs: empties, None, CJK-ratio boundary, >4000-char
    truncation, apostrophes/underscores (WORD_RE boundary semantics)."""
    import pandas as pd

    from address_parser_ray.functions.text import detect_lang, detect_lang_batch

    texts = [
        "",
        None,
        "一" * 10,
        "一 the the the and of " + "x" * 30,
        "a" * 5000 + " the the the",      # stopwords past the 4000-char cut
        "the and of to a in is that",
        "der die das und ist",
        "le la les et est",
        "el la los las es",
        "lesdes laand",                    # stopwords as substrings only
        "don't l'école est la une des",    # apostrophe boundaries
        "_the_ the_x x_the the",           # underscore is NOT a word char
        "123 456 789",
        "THE AND OF",                      # case folding
    ]
    s = pd.Series(texts)
    got = detect_lang_batch(s).tolist()
    exp = [detect_lang(t or "") for t in texts]
    assert got == exp


def test_batched_fingerprint_kernels_parity():
    """The r4 batched sketch kernels (concat stream + gather-free OPH)
    must produce BIT-IDENTICAL lanes to the per-row helpers on
    adversarial docs: empty, sub-shingle-width, padded-boundary,
    whitespace-mix, long."""
    import numpy as np

    from address_parser_ray.functions.hashing import (
        _global_window_hashes,
        char_shingle_hashes_u64,
        concat_doc_bytes,
        doc_shingle_window_mask,
        oph_minhash,
        oph_minhash_batch,
        splitmix64,
        token_hashes_u64,
        token_stream,
    )

    rng = np.random.default_rng(3)
    words = ["spark", "the", "agg", "window", "a"]
    docs = ["", "a", "abcdefghijk", "abcdefghijkl", "x" * 500,
            "  leading and trailing  ", "tab\tand\nnewline\rmix"]
    docs += [
        " ".join(rng.choice(words, size=int(rng.integers(0, 40))))
        for _ in range(120)
    ]
    views = [np.frombuffer(d.encode(), dtype=np.uint8) for d in docs]
    n = len(views)
    concat, starts, Ls = concat_doc_bytes(views, pad_to=12)
    doc_by_pos = np.repeat(np.arange(n), np.maximum(Ls, 12) + 1)
    H12 = splitmix64(_global_window_hashes(concat, 12))
    m12, _ = doc_shingle_window_mask(H12.size, starts, Ls, 12)
    mh_b = oph_minhash_batch(H12, doc_by_pos[: H12.size], n, 128, 42, mask=m12)
    H4 = splitmix64(_global_window_hashes(concat, 4))
    m4, _ = doc_shingle_window_mask(H4.size, starts, Ls, 4)
    fmh_b = oph_minhash_batch(H4, doc_by_pos[: H4.size], n, 128, 55, mask=m4)
    th, tdoc, ntok_b = token_stream(concat, starts, n)
    tmh_b = oph_minhash_batch(th, tdoc, n, 64, 49)
    for i in range(n):
        arr = views[i].astype(np.uint64)
        sh12 = char_shingle_hashes_u64(arr, 12, unique=False)
        sh4 = char_shingle_hashes_u64(arr, 4, unique=False)
        tk, nt = token_hashes_u64(arr, unique=False)
        assert np.array_equal(mh_b[i], oph_minhash(sh12, 128, 42)), i
        assert np.array_equal(fmh_b[i], oph_minhash(sh4, 128, 55)), i
        assert np.array_equal(tmh_b[i], oph_minhash(tk, 64, 49)), i
        assert ntok_b[i] == nt, i
