"""Fixture-generator invariants (the reference's self-validating
generation, ``ner/build_standard_dataset.py:885-887``)."""

import numpy as np
import pyarrow.parquet as pq

from address_parser_ray.fixtures.generator import (
    NEGATIVE_MAX_JACCARD,
    POSITIVE_MIN_JACCARD,
    _norm_shingles,
    generate_corpus,
)
from address_parser_ray.functions.similarity import exact_jaccard


def test_generator_deterministic():
    c1, l1 = generate_corpus(n_seeds=10, variants_per_seed=5)
    c2, l2 = generate_corpus(n_seeds=10, variants_per_seed=5)
    assert c1.equals(c2) and l1.equals(l2)


def test_labels_align_with_corpus():
    corpus, labels = generate_corpus(n_seeds=10, variants_per_seed=5)
    assert corpus.num_rows == labels.num_rows
    assert corpus["repo"].to_pylist() == labels["repo"].to_pylist()
    assert corpus["path"].to_pylist() == labels["path"].to_pylist()
    # (repo, path, commit) is unique — it's the record identity
    keys = list(
        zip(
            corpus["repo"].to_pylist(),
            corpus["path"].to_pylist(),
            corpus["commit"].to_pylist(),
        )
    )
    assert len(set(keys)) == len(keys)


def test_positive_variants_inside_band():
    corpus, labels = generate_corpus(n_seeds=12, variants_per_seed=6)
    texts = corpus["content"].to_pylist()
    cl = labels["cluster_id"].to_pylist()
    spec = labels["variant_spec"].to_pylist()
    canon = {cl[i]: texts[i] for i in range(len(texts)) if spec[i] == "canonical"}
    for i, t in enumerate(texts):
        if spec[i] in ("canonical", "near_miss"):
            continue
        j = exact_jaccard(_norm_shingles(t), _norm_shingles(canon[cl[i]]))
        assert j >= POSITIVE_MIN_JACCARD, (spec[i], j)


def test_near_miss_outside_band():
    corpus, labels = generate_corpus(n_seeds=20, variants_per_seed=5)
    texts = corpus["content"].to_pylist()
    cl = labels["cluster_id"].to_pylist()
    spec = labels["variant_spec"].to_pylist()
    canon = {cl[i]: texts[i] for i in range(len(texts)) if spec[i] == "canonical"}
    n_nm = 0
    for i, t in enumerate(texts):
        if spec[i] != "near_miss":
            continue
        n_nm += 1
        donor = cl[i] - 20  # near-miss cluster id = n_seeds + donor seed
        j = exact_jaccard(_norm_shingles(t), _norm_shingles(canon[donor]))
        assert j <= NEGATIVE_MAX_JACCARD, j
    assert n_nm > 0


def test_write_corpus_ray_matches_sequential(tmp_path, ray_session):
    """Parallel (Ray) generation must produce the same row set as the
    sequential generator — order-independence of per-key RNG."""
    import ray.data

    from address_parser_ray.fixtures import generate_corpus, write_corpus_ray

    d = str(tmp_path / "fxr")
    corpus_dir, labels_dir = write_corpus_ray(d, n_seeds=12, variants_per_seed=5)
    par = (
        ray.data.read_parquet(corpus_dir)
        .to_pandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    seq_tbl, _ = generate_corpus(n_seeds=12, variants_per_seed=5)
    seq = (
        seq_tbl.to_pandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    assert par.equals(seq)


def test_jsonl_roundtrip(tmp_path, ray_session):
    """Format parity with the reference's JSONL I/O (S4/S7): the corpus
    survives a write_json → read_json roundtrip."""
    import ray.data

    from address_parser_ray.fixtures import generate_corpus

    corpus, _ = generate_corpus(n_seeds=5, variants_per_seed=4)
    ds = ray.data.from_arrow(corpus)
    out = str(tmp_path / "jsonl")
    ds.write_json(out)
    back = (
        ray.data.read_json(out)
        .to_pandas()
        .sort_values(["repo", "path", "commit"])
        .reset_index(drop=True)
    )
    orig = corpus.to_pandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert back[["repo", "path", "commit", "lang", "content"]].equals(
        orig[["repo", "path", "commit", "lang", "content"]]
    )


def test_write_corpus_idempotent(tmp_path, ray_session):
    from address_parser_ray.fixtures import write_corpus

    d = str(tmp_path / "fx")
    c1, p1 = write_corpus(d, n_seeds=5, variants_per_seed=4)
    t1 = pq.read_table(p1)
    c2, p2 = write_corpus(d, n_seeds=5, variants_per_seed=4)  # second call: no-op
    assert (c1, p1) == (c2, p2)
    assert pq.read_table(p2).equals(t1)


def test_jsonl_roundtrip_and_sniffer(ray_session, tmp_path):
    """JSONL sink → sniffer → JSONL reader must round-trip the corpus
    byte-identically (modulo row order) vs the parquet read, and the
    pipeline must accept the JSONL-backed dataset unchanged."""
    import pandas as pd

    from address_parser_ray.fixtures import write_corpus
    from address_parser_ray.sources import (
        detect_format,
        read_corpus,
        write_jsonl,
    )

    corpus_dir, _ = write_corpus(
        str(tmp_path / "fx"), n_seeds=5, variants_per_seed=3
    )
    assert detect_format(corpus_dir) == "parquet"

    ds = read_corpus(corpus_dir)
    jdir = str(tmp_path / "jsonl")
    write_jsonl(ds, jdir)
    assert detect_format(jdir) == "json"

    back = read_corpus(jdir).to_pandas()
    orig = ds.to_pandas()
    key = ["repo", "path", "commit"]
    back = back.sort_values(key).reset_index(drop=True)[orig.columns]
    orig = orig.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(back, orig)


def test_tolerant_jsonl_skips_malformed_lines(ray_session, tmp_path):
    """read_corpus(tolerant=True) must drop malformed/blank JSONL lines
    (reference S4 contract) and keep every valid record; the strict
    reader fails on the same file."""
    import json

    import pytest

    from address_parser_ray.sources import read_corpus

    jdir = tmp_path / "jl"
    jdir.mkdir()
    good = [
        {"repo": "r", "path": f"f{i}.py", "commit": "c",
         "lang": "python", "content": f"x = {i}\n"}
        for i in range(5)
    ]
    lines = [json.dumps(good[0]), "{broken json", "", json.dumps(good[1]),
             "[1, 2, 3]", json.dumps(good[2]), "   ",
             json.dumps(good[3]), json.dumps(good[4])]
    (jdir / "part.jsonl").write_text("\n".join(lines) + "\n")

    ds = read_corpus(str(jdir), tolerant=True)
    df = ds.to_pandas().sort_values("path").reset_index(drop=True)
    assert len(df) == 5
    assert df["content"].tolist() == [f"x = {i}\n" for i in range(5)]

    with pytest.raises(Exception):
        read_corpus(str(jdir)).to_pandas()


def test_csv_roundtrip_adversarial_quoting(ray_session, tmp_path):
    """write_csv -> read_csv_corpus must be lossless for fields holding
    the three CSV hazards: embedded commas, embedded double quotes, and
    embedded NEWLINES inside quoted values (the default arrow parse
    splits rows on those without newlines_in_values)."""
    import pyarrow as pa
    import ray.data

    from address_parser_ray.sources import read_csv_corpus, write_csv

    rows = {
        "repo": ["r1", "r2", "r3", "r4"],
        "path": ["a.py", "b,c.py", 'quo"te.py', "d.py"],
        "commit": ["c1", "c2", "c3", "c4"],
        "lang": ["python"] * 4,
        "content": [
            "plain text",
            "comma, separated, values",
            'she said "hello" twice',
            "line one\nline two\nline three",
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = str(tmp_path / "csv_rt")
    write_csv(ds, out)
    back = (
        read_csv_corpus(out, ["repo", "path", "commit", "lang", "content"])
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    import pandas as pd

    expect = pd.DataFrame(rows).sort_values("repo").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, expect)
