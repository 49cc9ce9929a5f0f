"""Object-store URI passthrough (VERDICT r3 item 6): read_corpus,
writers and the Checkpointer accept fsspec URIs; file:// is the
local-backed stand-in exercising the URI code path end-to-end."""

import os

import pandas as pd
import pytest


def test_read_corpus_file_uri(ray_session, tmp_path):
    import ray.data

    from address_parser_ray.fixtures import write_corpus
    from address_parser_ray.sources import detect_format, read_corpus

    corpus_dir, _ = write_corpus(str(tmp_path / "fx"), n_seeds=5, variants_per_seed=3)
    uri = f"file://{corpus_dir}"
    assert detect_format(uri) == "parquet"
    ds = read_corpus(uri)
    local = read_corpus(corpus_dir)
    assert ds.count() == local.count() > 0


def test_checkpointer_file_uri_roundtrip(ray_session, tmp_path):
    import ray.data

    from address_parser_ray.state import Checkpointer
    from address_parser_ray.state.checkpoint import context_key

    root = f"file://{tmp_path}/ck"
    ck = Checkpointer(root, context=context_key({"v": 1}, "input"))
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return ray.data.from_pandas(
            pd.DataFrame({"record_id": [b"a" * 16, b"b" * 16], "x": [1, 2]})
        )

    d1 = ck.stage("s1", make).to_pandas().sort_values("x").reset_index(drop=True)
    assert calls["n"] == 1
    assert ck.is_done("s1")
    # resume: same context -> read back, no recompute, bit-identical
    d2 = ck.stage("s1", make).to_pandas().sort_values("x").reset_index(drop=True)
    assert calls["n"] == 1
    pd.testing.assert_frame_equal(d1, d2)
    lin = ck.lineage("s1")
    assert lin["rows"] == 2 and lin["context_key"] == ck.context
    # sidecar JSON + vacuum on the URI root
    ck.save_json("hot", {"5": 2})
    assert ck.load_json("hot") == {"5": 2}
    rep = ck.vacuum(dry_run=True)
    assert rep["tmp_dirs"] == [] and rep["orphan_files"] == []
    # changed context must recompute, not resume stale outputs
    ck2 = Checkpointer(root, context=context_key({"v": 2}, "input"))
    ck2.stage("s1", make)
    assert calls["n"] == 2


def test_write_parquet_file_uri(ray_session, tmp_path):
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1, 2, 3]}))
    out = f"file://{tmp_path}/out"
    ds.write_parquet(out)
    back = ray.data.read_parquet(out)
    assert back.count() == 3
