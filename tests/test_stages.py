"""Stage-level tests: fingerprint invariant, exact dedup, blocking
recall, connected components vs a pure-python union-find oracle."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from address_parser_ray.config import DEFAULT_CONFIG as CFG


def test_fingerprinter_sha_invariant():
    """content_sha256 must equal hashlib.sha256 of the RAW content — the
    per-row invariant of BASELINE.json input_hint."""
    from address_parser_ray.stages.fingerprint import Fingerprinter

    batch = pa.table(
        {
            "repo": ["r1", "r2"],
            "path": ["src/a.py", "deep/dir/b.py"],
            "commit": ["c1", "c2"],
            "lang": ["python", "python"],
            "content": ["def f():\n    # comment\n    return 1\n", ""],
        }
    )
    out = Fingerprinter(CFG)(batch)
    expected = [
        hashlib.sha256(c.encode()).hexdigest() for c in batch["content"].to_pylist()
    ]
    assert out["content_sha256"].to_pylist() == expected
    assert out["basename"].to_pylist() == ["a.py", "b.py"]
    assert out["n_chars"].to_pylist() == [len(c) for c in batch["content"].to_pylist()]
    # normalization strips comments → identical minhash for comment variant
    batch2 = pa.table(
        {
            "repo": ["r3"],
            "path": ["x.py"],
            "commit": ["c3"],
            "lang": ["python"],
            "content": ["def f():\n    return 1\n"],
        }
    )
    out2 = Fingerprinter(CFG)(batch2)
    assert out["minhash"].to_pylist()[0] == out2["minhash"].to_pylist()[0]


def test_fingerprinter_poison_row_sketch_cap():
    """A pathological giant row must not blow up sketching: sketches are
    computed on at most max_sketch_bytes of NORMALIZED content while the
    sha invariant stays over the FULL raw content. With the cap, the
    giant row's sketches equal those of its normalized prefix."""
    import dataclasses

    from address_parser_ray.stages.fingerprint import Fingerprinter

    cap = 1 << 12
    cfg = dataclasses.replace(CFG, max_sketch_bytes=cap)
    body = ("x = 1\n" * 40000)  # ~240 KB, normalization-stable
    giant = pa.table(
        {
            "repo": ["r"], "path": ["big.py"], "commit": ["c"],
            "lang": ["python"], "content": [body],
        }
    )
    out = Fingerprinter(cfg)(giant)
    assert out["content_sha256"].to_pylist() == [
        hashlib.sha256(body.encode()).hexdigest()
    ]
    # prefix property: two giants sharing the first >cap bytes of
    # normalized content must sketch identically under the cap, even
    # though their full contents (and shas) differ
    giant2 = pa.table(
        {
            "repo": ["r"], "path": ["big.py"], "commit": ["c"],
            "lang": ["python"],
            "content": [body + "tail_that_differs = 999\n" * 1000],
        }
    )
    out2 = Fingerprinter(cfg)(giant2)
    for col in ("minhash", "token_minhash", "fine_minhash", "simhash"):
        assert out[col].to_pylist() == out2[col].to_pylist(), col
    assert out["content_sha256"].to_pylist() != out2["content_sha256"].to_pylist()
    # and without the cap the tails make the sketches differ (cap bit)
    full, full2 = Fingerprinter(CFG)(giant), Fingerprinter(CFG)(giant2)
    assert full["minhash"].to_pylist() != full2["minhash"].to_pylist()


def test_exact_dedup_min_wins(ray_session):
    import ray.data
    from address_parser_ray.stages.exact_dedup import (
        duplicate_edges,
        exact_dedup_stage,
        representatives,
    )
    from address_parser_ray.stages.fingerprint import fingerprint_stage

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": ["r"] * 4,
                "path": [f"p{i}.py" for i in range(4)],
                "commit": [f"c{i}" for i in range(4)],
                "lang": ["python"] * 4,
                "content": ["same", "same", "same", "other"],
            }
        )
    )
    dd = exact_dedup_stage(fingerprint_stage(corpus, CFG)).materialize()
    df = dd.to_pandas()
    grp = df[df["content_sha256"] == df["content_sha256"].mode()[0]]
    # r4 rule: rep = min (rep_key = md5(repo\x1fpath), record_id) —
    # a pure function of the natural key, recomputable by the oracles
    import hashlib

    want_rep = grp.loc[
        grp["path"].map(
            lambda p: hashlib.md5(f"r\x1f{p}".encode()).hexdigest()
        ).idxmin(),
        "record_id",
    ]
    assert (grp["rep_id"] == want_rep).all()
    assert representatives(dd).count() == 2
    edges = duplicate_edges(dd).to_pandas()
    assert len(edges) == 2
    assert set(edges["dst"]) == {want_rep}


def test_blocking_finds_same_seed_pairs(ray_session, fixture_corpus):
    """Every same-cluster record pair must co-occur in ≥1 blocking key
    with its cluster (recall via LSH bands ∪ exact path key)."""
    import pyarrow.parquet as pq
    import ray.data
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.stages.blocking import blocking_stage
    from address_parser_ray.stages.exact_dedup import (
        exact_dedup_stage,
        representatives,
    )
    from address_parser_ray.stages.fingerprint import fingerprint_stage

    corpus_dir, labels_path = fixture_corpus
    reps = representatives(
        exact_dedup_stage(fingerprint_stage(read_corpus(corpus_dir), CFG))
    ).materialize()
    pairs = blocking_stage(reps, CFG).to_pandas()
    got = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))

    lab = pq.read_table(labels_path).to_pandas()
    lab["record_id"] = [
        stable_id128(r, p, c)
        for r, p, c in zip(lab["repo"], lab["path"], lab["commit"])
    ]
    rep_ids = set(reps.to_pandas()["record_id"])
    lab = lab[lab["record_id"].isin(rep_ids)]
    missing = 0
    total = 0
    for _, grp in lab.groupby("cluster_id"):
        ids = sorted(grp["record_id"])
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                total += 1
                if (ids[i], ids[j]) not in got:
                    missing += 1
    assert total > 50
    # blocking recall ≥ 0.95 on the fixture (exact path key catches
    # same-seed variants; LSH catches the rest)
    assert missing / total < 0.05, (missing, total)


def test_bucket_shuffle_paths_identical(ray_session, fixture_corpus, monkeypatch):
    """The raw-task hash shuffle (default) and Ray's sort-based
    ``groupby().map_groups`` must produce the IDENTICAL candidate pair
    set — the task shuffle replaces only the exchange mechanism, never
    the bucket semantics."""
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.stages.blocking import blocking_stage
    from address_parser_ray.stages.exact_dedup import (
        exact_dedup_stage,
        representatives,
    )
    from address_parser_ray.stages.fingerprint import fingerprint_stage

    corpus_dir, _ = fixture_corpus
    reps = representatives(
        exact_dedup_stage(fingerprint_stage(read_corpus(corpus_dir), CFG))
    ).materialize()

    def pair_set():
        df = blocking_stage(reps, CFG).to_pandas()
        return set(map(tuple, df[["id_a", "id_b"]].values.tolist()))

    monkeypatch.setenv("APR_BUCKET_SHUFFLE", "tasks")
    tasks = pair_set()
    monkeypatch.setenv("APR_BUCKET_SHUFFLE", "sort")
    srt = pair_set()
    assert tasks == srt
    assert len(tasks) > 50


def test_task_shuffle_survives_schemaless_empty_blocks(ray_session):
    """An all-identical corpus leaves ONE rep — upstream map_batches then
    emits Ray 2.49's schema-less empty blocks, which must flow through
    both task-shuffle passes without KeyError('bucket') and yield the
    empty pair set (the verify-drive regression of round 5)."""
    import ray.data
    from address_parser_ray.stages.blocking import blocking_stage
    from address_parser_ray.stages.exact_dedup import (
        exact_dedup_stage,
        representatives,
    )
    from address_parser_ray.stages.fingerprint import fingerprint_stage

    corpus = ray.data.from_arrow(
        pa.table(
            {
                "repo": [f"r{i//10}" for i in range(30)],
                "path": [f"p{i}.go" for i in range(30)],
                "commit": ["c"] * 30,
                "lang": ["go"] * 30,
                "content": ["package main\nfunc main() {}\n"] * 30,
            }
        )
    )
    reps = representatives(
        exact_dedup_stage(fingerprint_stage(corpus, CFG))
    ).materialize()
    assert reps.count() == 1
    pairs = blocking_stage(reps, CFG).to_pandas()
    # the meaningful pin is "no KeyError('bucket') and an empty pair
    # set"; Ray's to_pandas may drop columns of an all-empty dataset
    assert len(pairs) == 0


def _py_union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [find(i) for i in range(n_nodes)]


@pytest.mark.parametrize(
    "seed,n,m,driver_max",
    [
        (0, 40, 30, 0),            # distributed label-propagation path
        (1, 60, 80, 0),            # distributed, denser
        (2, 30, 5, 10**6),         # driver union-find path
        (3, 50, 60, 10**6),        # driver path, denser
    ],
)
def test_connected_components_vs_oracle(ray_session, seed, n, m, driver_max):
    """Both CC paths (driver union-find and distributed label
    propagation) must agree with a sequential union-find oracle on random
    graphs (including chains — the pointer-jumping case)."""
    import ray.data
    from address_parser_ray.stages.clustering import connected_components

    rng = np.random.default_rng(seed)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2)) if a != b]
    # add a long chain to exercise >1 round
    chain = [(i, i + 1) for i in range(n - 10, n - 1)]
    edges += chain
    oracle = _py_union_find(n, edges)

    nodes = ray.data.from_arrow(
        pa.table({"record_id": pa.array(np.arange(n, dtype=np.int64))})
    )
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.int64()),
                "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
    )
    out = connected_components(eds, nodes, driver_max_edges=driver_max).to_pandas()
    got = dict(zip(out["record_id"], out["cluster_id"]))
    assert len(got) == n
    for i in range(n):
        assert got[i] == oracle[i], (i, got[i], oracle[i])


def test_cc_paths_agree(ray_session):
    """Driver and distributed paths produce IDENTICAL assignments."""
    import ray.data
    from address_parser_ray.stages.clustering import connected_components

    rng = np.random.default_rng(7)
    n = 80
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(100, 2)) if a != b]
    nodes = ray.data.from_arrow(
        pa.table({"record_id": pa.array(np.arange(n, dtype=np.int64))})
    )
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.int64()),
                "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
    )
    a = connected_components(eds, nodes, driver_max_edges=10**6).to_pandas()
    b = connected_components(eds, nodes, driver_max_edges=0).to_pandas()
    a = a.sort_values("record_id").reset_index(drop=True)
    b = b.sort_values("record_id").reset_index(drop=True)
    assert a.equals(b)


def test_cc_contraction_ladder_collapses_cliques(ray_session):
    """Filtering/contraction path: a clique-heavy graph above the driver
    gate must contract below it (dense cliques → stars) and agree with
    the sequential oracle; a chain (zero contraction shrinkage) must fall
    through to label propagation and still be correct."""
    import ray.data
    from address_parser_ray.stages.clustering import connected_components

    # 5 cliques of 20 → 950 edges, gate 200: raw > gate, stars < gate
    edges = []
    n = 100
    for c in range(5):
        base = c * 20
        edges += [(base + i, base + j) for i in range(20) for j in range(i + 1, 20)]
    oracle = _py_union_find(n, edges)
    nodes = ray.data.from_arrow(
        pa.table({"record_id": pa.array(np.arange(n, dtype=np.int64))})
    )
    eds = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in edges], type=pa.int64()),
                "dst": pa.array([e[1] for e in edges], type=pa.int64()),
            }
        )
    )
    out = connected_components(eds, nodes, driver_max_edges=200).to_pandas()
    got = dict(zip(out["record_id"], out["cluster_id"]))
    assert len(got) == n
    assert all(got[i] == oracle[i] for i in range(n))

    # pure chain: contraction cannot shrink a tree; the non-shrink break
    # must hand the residue to label propagation, still correct
    chain = [(i, i + 1) for i in range(49)]
    oracle2 = _py_union_find(50, chain)
    nodes2 = ray.data.from_arrow(
        pa.table({"record_id": pa.array(np.arange(50, dtype=np.int64))})
    )
    eds2 = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([e[0] for e in chain], type=pa.int64()),
                "dst": pa.array([e[1] for e in chain], type=pa.int64()),
            }
        )
    )
    out2 = connected_components(eds2, nodes2, driver_max_edges=10).to_pandas()
    got2 = dict(zip(out2["record_id"], out2["cluster_id"]))
    assert all(got2[i] == oracle2[i] for i in range(50))


def test_model_inference_state_loads_once(ray_session):
    """Reference-A3 shape: the ~6 MB weight matrix is built in __init__
    (once per actor) and __call__ never rebuilds it; prediction is
    vectorized over the batch and linguistically meaningful."""
    import numpy as np
    import pyarrow as pa

    from address_parser_ray.stages.inference import (
        CLASSES,
        VOCAB,
        HashingTrickClassifier,
    )

    clf = HashingTrickClassifier()
    assert clf.W.shape == (VOCAB, len(CLASSES))
    assert clf.W.nbytes >= 4 << 20  # genuinely heavy state
    W0 = clf.W
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "text": [
                "the cat sat on the mat and it was the best of times",
                "der hund ist nicht mit der katze und das ist gut",
                "",  # empty doc mid-batch
                "le chat est dans la maison et il est pour les chats",
            ],
        }
    )
    out1 = clf(batch)
    out2 = clf(batch)
    assert clf.W is W0 and clf.n_init == 1  # no rebuild across batches
    assert out1.equals(out2)
    pred = out1["pred_lang_model"].to_pylist()
    assert pred[0] == "en" and pred[1] == "de" and pred[3] == "fr"
    # trailing empty doc does not corrupt its neighbors (reduceat edge)
    batch2 = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["the cat sat on the mat and it was the", ""],
        }
    )
    out3 = clf(batch2)
    assert out3["pred_lang_model"].to_pylist()[0] == "en"
    assert out3["margin_1e4"].to_pylist()[1] <= 1  # empty → ~zero logits


def test_hot_key_probe_paths_agree(ray_session, fixture_corpus):
    """The driver-merge and distributed-groupby hot-key probe paths must
    produce identical hot dictionaries (gate equivalence discipline)."""
    from unittest import mock

    import address_parser_ray.stages.blocking as B
    from address_parser_ray.config import DEFAULT_CONFIG
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.stages.exact_dedup import exact_dedup_stage, representatives
    from address_parser_ray.stages.fingerprint import fingerprint_stage

    corpus_dir, _ = fixture_corpus
    reps = representatives(
        exact_dedup_stage(fingerprint_stage(read_corpus(corpus_dir)))
    ).materialize()
    key_input = reps.select_columns(["record_id", "minhash", "lang", "basename"])
    exploded = key_input.map_batches(
        B.emit_keys, fn_kwargs={"cfg": DEFAULT_CONFIG}, batch_format="pyarrow"
    )
    driver_hot = B.find_hot_keys(exploded, DEFAULT_CONFIG)
    with mock.patch.object(B, "DRIVER_PROBE_MAX_ROWS", 0):
        dist_hot = B.find_hot_keys(exploded, DEFAULT_CONFIG)
    assert driver_hot == dist_hot
    assert len(driver_hot) > 0  # the fixture's hot basename must register


def test_conjunctive_blocking_kernels():
    """D6 candidate-set intersection: pair-gen keeps key-hit multiplicity
    and the dedup pass filters pairs below min_band_hits."""
    from address_parser_ray.stages.blocking import (
        _dedup_pairs_bucket_fn,
        _make_pairs_bucket_fn,
    )

    def rid(i: int) -> bytes:
        return i.to_bytes(16, "big")

    g = pa.table(
        {
            "block_key": pa.array([10, 10, 20, 20, 30, 30], type=pa.int64()),
            "record_id": pa.array(
                [rid(1), rid(2), rid(1), rid(2), rid(3), rid(4)],
                type=pa.binary(),
            ),
        }
    )
    pairs = _make_pairs_bucket_fn(4096)(g)
    assert pairs.column("n_hits").to_pylist() == [2, 1]
    assert _dedup_pairs_bucket_fn(1)(pairs).num_rows == 2
    strict = _dedup_pairs_bucket_fn(2)(pairs)
    assert strict.column_names == ["id_a", "id_b"]
    assert strict.to_pydict() == {"id_a": [rid(1)], "id_b": [rid(2)]}


def test_conjunctive_blocking_end_to_end(ray_session, fixture_corpus):
    """min_band_hits=2 must cut candidate-pair volume while near-dup
    recall survives (true variants share many LSH bands)."""
    import dataclasses

    import pandas as pd

    from address_parser_ray.config import DEFAULT_CONFIG
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.evaluation import pairwise_f1
    from address_parser_ray.sources import read_corpus

    corpus_dir, labels_path = fixture_corpus
    labels = pd.read_parquet(labels_path)
    labels["record_id"] = [
        stable_id128(r, p, c) for r, p, c in zip(labels.repo, labels.path, labels.commit)
    ]
    loose = dedup_pipeline(read_corpus(corpus_dir))
    strict = dedup_pipeline(
        read_corpus(corpus_dir),
        dataclasses.replace(DEFAULT_CONFIG, min_band_hits=2),
    )
    n_loose, n_strict = loose.scored_pairs.count(), strict.scored_pairs.count()
    assert n_strict < n_loose
    assert pairwise_f1(labels, strict.assignments.to_pandas()).f1 >= 0.99


def test_fingerprinter_outputs_subset_matches_full():
    """A sketch-subset Fingerprinter must produce byte-identical values
    for the requested sketches (the gating skips compute, never changes
    it) and omit the rest."""
    from address_parser_ray.stages.fingerprint import Fingerprinter

    batch = pa.table(
        {
            "repo": ["r1", "r2", "r3"],
            "path": ["a.py", "b.py", "c.py"],
            "commit": ["c1", "c2", "c3"],
            "lang": ["python"] * 3,
            "content": [
                "def f():\n    return 1\n",
                "some other file body with tokens\n" * 20,
                "",
            ],
        }
    )
    full = Fingerprinter(CFG)(batch)
    only_sh = Fingerprinter(CFG, outputs=frozenset({"simhash"}))(batch)
    assert only_sh["simhash"].to_pylist() == full["simhash"].to_pylist()
    assert only_sh["record_id"].to_pylist() == full["record_id"].to_pylist()
    for absent in ("minhash", "token_minhash", "fine_minhash", "content_sha256"):
        assert absent not in only_sh.column_names

    only_mh = Fingerprinter(CFG, outputs=frozenset({"minhash", "content_sha256"}))(
        batch
    )
    assert only_mh["minhash"].to_pylist() == full["minhash"].to_pylist()
    assert only_mh["content_sha256"].to_pylist() == full["content_sha256"].to_pylist()


def test_fingerprinter_passthrough_columns():
    """``passthrough`` copies the named input columns verbatim; the
    default drops them, and names absent from the input are ignored (the
    flagship corpus has no doc_id)."""
    from address_parser_ray.stages.fingerprint import Fingerprinter

    batch = pa.table(
        {
            "repo": ["r1", "r2"],
            "path": ["a.py", "b.py"],
            "commit": ["c1", "c2"],
            "lang": ["python"] * 2,
            "content": ["x = 1\n", "y = 2\n"],
            "doc_id": pa.array([7, 9], type=pa.int64()),
        }
    )
    default = Fingerprinter(CFG)(batch)
    assert "doc_id" not in default.column_names
    kept = Fingerprinter(CFG, passthrough=("doc_id", "absent_col"))(batch)
    assert kept["doc_id"].to_pylist() == [7, 9]
    assert "absent_col" not in kept.column_names
    # sketches unchanged by the passthrough
    assert kept["simhash"].to_pylist() == default["simhash"].to_pylist()
