"""Checkpoint/lineage layer: resume skips completed stages; interrupted
writes never look complete; invalidation forces recompute."""

import json
import os

import pyarrow as pa
import pytest

from address_parser_ray.state import Checkpointer


def _toy_ds(ray_session, n=10, mark=None):
    import ray.data

    if mark is not None:
        mark["calls"] = mark.get("calls", 0) + 1
    return ray.data.from_arrow(
        pa.table({"x": pa.array(list(range(n)), type=pa.int64())})
    )


def test_stage_computes_then_skips(ray_session, tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"))
    mark = {}
    ds1 = ck.stage("s1", lambda: _toy_ds(ray_session, mark=mark))
    assert ds1.count() == 10
    assert mark["calls"] == 1
    ds2 = ck.stage("s1", lambda: _toy_ds(ray_session, mark=mark))
    assert ds2.count() == 10
    assert mark["calls"] == 1  # not recomputed
    lin = ck.lineage("s1")
    assert lin["rows"] == 10
    assert lin["stage"] == "s1"
    assert sum(lin["files"].values()) == 10


def test_context_change_invalidates(ray_session, tmp_path):
    """A checkpoint written under one (config, input) context must NOT be
    resumed under another — changed config recomputes the stage."""
    from address_parser_ray.state.checkpoint import context_key

    root = str(tmp_path / "ck")
    mark = {}
    k1 = context_key({"match_threshold": 0.5}, "/in/a")
    ck1 = Checkpointer(root, context=k1)
    ck1.stage("s1", lambda: _toy_ds(ray_session, mark=mark))
    assert mark["calls"] == 1
    # same context → resumed
    Checkpointer(root, context=k1).stage("s1", lambda: _toy_ds(ray_session, mark=mark))
    assert mark["calls"] == 1
    # different config → recomputed
    k2 = context_key({"match_threshold": 0.9}, "/in/a")
    assert k1 != k2
    Checkpointer(root, context=k2).stage("s1", lambda: _toy_ds(ray_session, mark=mark))
    assert mark["calls"] == 2
    # dataclass configs hash deterministically
    from address_parser_ray.config import DEFAULT_CONFIG

    assert context_key(DEFAULT_CONFIG, "/x") == context_key(DEFAULT_CONFIG, "/x")


def test_incomplete_stage_redone(ray_session, tmp_path):
    """A stage dir without _lineage.json (crashed write) is recomputed."""
    root = str(tmp_path / "ck")
    ck = Checkpointer(root)
    mark = {}
    ck.stage("s", lambda: _toy_ds(ray_session, mark=mark))
    os.remove(os.path.join(root, "s", "_lineage.json"))
    ck.stage("s", lambda: _toy_ds(ray_session, mark=mark))
    assert mark["calls"] == 2
    assert ck.is_done("s")


def test_invalidate(ray_session, tmp_path):
    ck = Checkpointer(str(tmp_path / "ck"))
    mark = {}
    ck.stage("s", lambda: _toy_ds(ray_session, mark=mark))
    ck.invalidate("s")
    assert not ck.is_done("s")
    ck.stage("s", lambda: _toy_ds(ray_session, mark=mark))
    assert mark["calls"] == 2


def test_invariant_xor_across_stages(ray_session, fixture_corpus, tmp_path):
    """content_sha256 must survive every checkpointed stage unchanged:
    the order-insensitive sha-xor of fingerprints and exact_dedup (same
    row set) must agree."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus

    corpus_dir, _ = fixture_corpus
    ck = Checkpointer(str(tmp_path / "ck"))
    dedup_pipeline(read_corpus(corpus_dir), checkpointer=ck)
    x1 = ck.invariant_xor("fingerprints")
    x2 = ck.invariant_xor("exact_dedup")
    assert x1 is not None and x1 == x2


def test_pipeline_resume_identical(ray_session, fixture_corpus, tmp_path):
    """Full-pipeline resume (the north_rule resumability check): second
    run with the same checkpoint dir recomputes nothing and returns
    identical assignments."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus

    corpus_dir, _ = fixture_corpus
    root = str(tmp_path / "ck")
    r1 = dedup_pipeline(read_corpus(corpus_dir), checkpointer=Checkpointer(root))
    a1 = r1.assignments.to_pandas().sort_values("record_id").reset_index(drop=True)
    # simulate a later resume in a fresh checkpointer on the same dir
    r2 = dedup_pipeline(read_corpus(corpus_dir), checkpointer=Checkpointer(root))
    a2 = r2.assignments.to_pandas().sort_values("record_id").reset_index(drop=True)
    assert a1.equals(a2)
    # partial resume: drop the LAST stage only → earlier stages reused
    ck = Checkpointer(root)
    ck.invalidate("assignments")
    r3 = dedup_pipeline(read_corpus(corpus_dir), checkpointer=ck)
    a3 = r3.assignments.to_pandas().sort_values("record_id").reset_index(drop=True)
    assert a1.equals(a3)


def test_compact_parquet_dir(ray_session, tmp_path):
    """Compaction merges a fragmented parquet dir into few files while
    preserving rows bit-for-bit (content + xor audit), and refuses to
    clobber an existing target."""
    import hashlib

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from address_parser_ray.state.compact import compact_parquet_dir

    src = tmp_path / "frag"
    src.mkdir()
    n = 500
    for i in range(20):  # 20 tiny files
        lo, hi = i * 25, (i + 1) * 25
        t = pa.table(
            {
                "record_id": pa.array(range(lo, hi), type=pa.int64()),
                "content_sha256": [
                    hashlib.sha256(str(x).encode()).hexdigest()
                    for x in range(lo, hi)
                ],
            }
        )
        pq.write_table(t, str(src / f"part-{i:05d}.parquet"))

    out = tmp_path / "compacted"
    summary = compact_parquet_dir(
        str(src), str(out),
        target_rows_per_file=200, verify_column="content_sha256",
    )
    assert summary["rows"] == n
    assert summary["files_in"] == 20
    assert summary["files_out"] <= 4
    a = pd.read_parquet(src).sort_values("record_id").reset_index(drop=True)
    b = pd.read_parquet(out).sort_values("record_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # refuses to clobber
    with _pytest.raises(FileExistsError):
        compact_parquet_dir(str(src), str(out))


def test_multiset_fingerprint_breaks_xor_cancellation():
    """XOR alone cannot distinguish {a,a} from {b,b} (both fold to 0) or
    a NULL from a zero hash under a sentinel — the (xor, sum, n_null,
    n_rows) multiset fingerprint must separate all of those."""
    import pyarrow as pa

    from address_parser_ray.state.compact import hex_multiset_fingerprint

    a, b, zero = "ab" * 32, "cd" * 32, "0" * 64
    fp = lambda vals: hex_multiset_fingerprint(pa.array(vals, type=pa.string()))

    pair_a, pair_b = fp([a, a]), fp([b, b])
    assert pair_a[0] == 0 and pair_b[0] == 0  # XOR cancels...
    assert pair_a != pair_b                   # ...the sum does not
    assert fp([None]) != fp([zero])           # NULL is not a zero hash
    assert fp([None])[2] == 1 and fp([zero])[2] == 0
    # order-insensitive, fold-associative (per-file accumulation)
    assert fp([a, b]) == fp([b, a])
    assert hex_multiset_fingerprint(pa.array([b]), fp([a])) == fp([a, b])


def test_vacuum(ray_session, tmp_path):
    """VACUUM removes crashed .tmp dirs, manifest-orphan part files and
    (opt-in) stale-context stages — and never touches manifest-listed
    files, so a completed stage resumes byte-identical."""
    from address_parser_ray.state.checkpoint import context_key

    root = str(tmp_path / "ck")
    k1 = context_key({"v": 1}, "/in")
    ck = Checkpointer(root, context=k1)
    ck.stage("good", lambda: _toy_ds(ray_session))
    before = ck.invariant_xor("good", column="x") if False else ck.lineage("good")

    # crashed write
    os.makedirs(os.path.join(root, "dead.tmp"))
    with open(os.path.join(root, "dead.tmp", "part.parquet"), "wb") as f:
        f.write(b"junk")
    # orphan inside a completed stage (would duplicate rows on resume)
    orphan = os.path.join(root, "good", "zz_orphan.parquet")
    import pyarrow.parquet as pq

    pq.write_table(pa.table({"x": pa.array([99], type=pa.int64())}), orphan)
    # stale-context stage
    ck2 = Checkpointer(root, context=context_key({"v": 2}, "/in"))
    ck2.stage("stale", lambda: _toy_ds(ray_session))

    # dry run reports but deletes nothing
    rep = ck.vacuum(dry_run=True, drop_stale=True)
    assert rep["tmp_dirs"] == ["dead.tmp"]
    assert rep["orphan_files"] == ["good/zz_orphan.parquet"]
    assert rep["stale_stages"] == ["stale"]
    assert rep["bytes_freed"] > 0
    assert os.path.exists(orphan)

    rep2 = ck.vacuum(drop_stale=True)
    assert rep2["orphan_files"] == ["good/zz_orphan.parquet"]
    assert not os.path.exists(orphan)
    assert not os.path.exists(os.path.join(root, "dead.tmp"))
    assert not os.path.exists(os.path.join(root, "stale"))

    # the completed stage is intact and resumes with the same data
    assert ck.is_done("good")
    assert ck.lineage("good")["files"] == before["files"]
    ds = ck.stage("good", lambda: _toy_ds(ray_session))
    assert ds.count() == 10
    assert sorted(ds.to_pandas()["x"].tolist()) == list(range(10))


def test_read_parquet_evolving(ray_session, tmp_path):
    """Schema evolution: files written before a column existed read
    back null-filled under the unified schema; int widening casts; a
    true type CONFLICT raises instead of silently coercing."""
    import pyarrow.parquet as pq

    from address_parser_ray.rayutil import (
        read_parquet_evolving,
        unified_parquet_schema,
    )

    d = tmp_path / "evolving"
    d.mkdir()
    pq.write_table(
        pa.table({"repo": ["a", "b"], "n": pa.array([1, 2], type=pa.int32())}),
        str(d / "part-000.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "repo": ["c"],
                "n": pa.array([3], type=pa.int32()),
                "stars": pa.array([7], type=pa.int64()),
            }
        ),
        str(d / "part-001.parquet"),
    )
    sch = unified_parquet_schema(str(d))
    assert sch.names == ["repo", "n", "stars"]

    df = (
        read_parquet_evolving(str(d))
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    assert len(df) == 3
    assert df["stars"].tolist()[:2] == [None, None] or df["stars"].isna().tolist()[:2] == [True, True]
    assert df.loc[2, "stars"] == 7
    assert df["n"].tolist() == [1, 2, 3]

    # type conflict raises
    pq.write_table(
        pa.table({"repo": ["x"], "n": pa.array(["oops"], type=pa.string())}),
        str(d / "part-002.parquet"),
    )
    with pytest.raises(ValueError, match="schema evolution conflict"):
        unified_parquet_schema(str(d))


def test_diff_stages(ray_session, tmp_path):
    """Backfill planning: a cloned stage diffs empty; a same-row-count
    content mutation is caught by the fingerprint pass; an extra file
    lands in only_b."""
    import shutil

    import pyarrow.parquet as pq

    root = str(tmp_path / "ck")
    ck = Checkpointer(root)
    ck.stage("s", lambda: _toy_ds(ray_session, n=10))
    a = os.path.join(root, "s")
    b = os.path.join(root, "s_replica")
    shutil.copytree(a, b)

    d0 = Checkpointer.diff_stages(a, b, column="x")
    assert d0["drifted"] == [] and d0["only_a"] == [] and d0["only_b"] == []
    assert d0["identical"] >= 1

    # mutate one replica file, SAME row count — only the fingerprint sees it
    fname = sorted(f for f in os.listdir(b) if f.endswith(".parquet"))[0]
    t = pq.read_table(os.path.join(b, fname))
    xs = t["x"].to_pylist()
    xs[0] = 9999
    pq.write_table(
        pa.table({"x": pa.array(xs, type=pa.int64())}), os.path.join(b, fname)
    )
    d1 = Checkpointer.diff_stages(a, b)  # manifest-only: invisible
    assert d1["drifted"] == []
    d2 = Checkpointer.diff_stages(a, b, column="x")  # fingerprint: caught
    assert d2["drifted"] == [fname]

    # extra file in the replica manifest
    extra = "zz_extra.parquet"
    pq.write_table(
        pa.table({"x": pa.array([1], type=pa.int64())}), os.path.join(b, extra)
    )
    with open(os.path.join(b, "_lineage.json")) as f:
        lin = json.load(f)
    lin["files"][extra] = 1
    with open(os.path.join(b, "_lineage.json"), "w") as f:
        json.dump(lin, f)
    d3 = Checkpointer.diff_stages(a, b, column="x")
    assert d3["only_b"] == [extra]
