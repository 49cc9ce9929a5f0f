"""Incremental linkage: a new batch attached to a previous run must
reproduce the full-corpus run exactly (same partition AND same min-id
labels), including new↔old near-dup pairs and merges through the
closure."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _split_corpus(corpus_dir: str, out_root: str) -> tuple[str, str]:
    """Deterministic 80/20 row split of the fixture corpus (every 5th
    row by global order becomes part of the NEW batch — seeds' variants
    land on both sides, so new↔old near-dup pairs genuinely occur)."""
    import glob

    tables = [pq.read_table(p) for p in sorted(glob.glob(f"{corpus_dir}/*.parquet"))]
    t = pa.concat_tables(tables)
    idx = np.arange(t.num_rows)
    new_mask = idx % 5 == 0
    old_dir, new_dir = f"{out_root}/old", f"{out_root}/new"
    os.makedirs(old_dir, exist_ok=True)
    os.makedirs(new_dir, exist_ok=True)
    pq.write_table(t.filter(pa.array(~new_mask)), f"{old_dir}/part-0.parquet")
    pq.write_table(t.filter(pa.array(new_mask)), f"{new_dir}/part-0.parquet")
    return old_dir, new_dir


@pytest.fixture(scope="module")
def split_dirs(ray_session, fixture_corpus, tmp_path_factory):
    corpus_dir, _ = fixture_corpus
    return _split_corpus(corpus_dir, str(tmp_path_factory.mktemp("inc")))


def _assign_df(res) -> pd.DataFrame:
    return (
        res.assignments.to_pandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )


def test_incremental_matches_full_run(ray_session, fixture_corpus, split_dirs):
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.incremental import incremental_dedup
    from address_parser_ray.sources import read_corpus

    corpus_dir, _ = fixture_corpus
    old_dir, new_dir = split_dirs

    full = _assign_df(dedup_pipeline(read_corpus(corpus_dir)))
    prev = dedup_pipeline(read_corpus(old_dir))
    inc = incremental_dedup(
        prev, read_corpus(new_dir), old_corpus=read_corpus(old_dir)
    )
    inc_df = _assign_df(inc)

    pd.testing.assert_frame_equal(inc_df, full)


def test_incremental_attaches_exact_duplicates(ray_session, tmp_path):
    """A new record byte-identical to an old one must land in the old
    record's cluster via the exact-dup path (no near-dup scoring
    needed), and untouched old singletons keep their labels."""
    import ray

    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.incremental import incremental_dedup
    from address_parser_ray.sources import read_corpus

    def write(dirname, rows):
        os.makedirs(dirname, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "repo": [r[0] for r in rows],
                    "path": [r[1] for r in rows],
                    "commit": ["c"] * len(rows),
                    "lang": ["python"] * len(rows),
                    "content": [r[2] for r in rows],
                }
            ),
            f"{dirname}/part-0.parquet",
        )
        return dirname

    body_x = "def alpha():\n    return 'one body of code'\n" * 4
    body_y = "class Beta:\n    value = 'totally different text here'\n" * 4
    old_dir = write(
        str(tmp_path / "old"), [("r", "x.py", body_x), ("r", "y.py", body_y)]
    )
    new_dir = write(str(tmp_path / "new"), [("r", "x_copy.py", body_x)])

    prev = dedup_pipeline(read_corpus(old_dir))
    inc = incremental_dedup(
        prev, read_corpus(new_dir), old_corpus=read_corpus(old_dir)
    )
    df = _assign_df(inc)
    assert len(df) == 3
    assert df.cluster_id.nunique() == 2
    sizes = df.groupby("cluster_id").size().sort_values()
    assert list(sizes) == [1, 2]


def test_incremental_from_checkpoint_matches_in_memory(
    ray_session, fixture_corpus, split_dirs, tmp_path
):
    """The CLI path: the previous run is reloaded from its checkpoint
    directory (load_result) instead of living in memory — assignments
    must be identical either way."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.incremental import (
        incremental_dedup,
        load_result,
    )
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.state import Checkpointer

    old_dir, new_dir = split_dirs
    ckdir = str(tmp_path / "ck")
    dedup_pipeline(read_corpus(old_dir), checkpointer=Checkpointer(ckdir))

    prev = load_result(ckdir)
    inc = incremental_dedup(
        prev, read_corpus(new_dir), old_corpus=read_corpus(old_dir)
    )
    in_mem = incremental_dedup(
        dedup_pipeline(read_corpus(old_dir)),
        read_corpus(new_dir),
        old_corpus=read_corpus(old_dir),
    )
    pd.testing.assert_frame_equal(_assign_df(inc), _assign_df(in_mem))


def test_incremental_band_index_probe_matches_full_run(
    ray_session, fixture_corpus, split_dirs, tmp_path
):
    """The persisted band index removes the corpus-wide band
    re-emission: the increment emits keys for its OWN reps only and
    probes the checkpointed (block_key, record_id) index for old members
    of touched blocks. Labels must stay bit-identical to the full
    combined run (and to the legacy no-index incremental path)."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.incremental import (
        incremental_dedup,
        load_band_index,
        load_result,
    )
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.state import Checkpointer

    corpus_dir, _ = fixture_corpus
    old_dir, new_dir = split_dirs
    ckdir = str(tmp_path / "ck_band")
    dedup_pipeline(read_corpus(old_dir), checkpointer=Checkpointer(ckdir))

    band, hot = load_band_index(ckdir)
    assert band is not None and band.count() > 0
    assert isinstance(hot, dict)

    inc = incremental_dedup(
        load_result(ckdir),
        read_corpus(new_dir),
        old_corpus=read_corpus(old_dir),
        band_index=band,
        band_hot_keys=hot,
    )
    full = _assign_df(dedup_pipeline(read_corpus(corpus_dir)))
    pd.testing.assert_frame_equal(_assign_df(inc), full)


def test_load_band_index_absent_returns_none(ray_session, tmp_path):
    from address_parser_ray.pipelines.incremental import load_band_index

    band, hot = load_band_index(str(tmp_path / "nope"))
    assert band is None and hot is None


def test_load_result_refuses_incomplete_checkpoint(ray_session, tmp_path):
    from address_parser_ray.pipelines.incremental import load_result

    with pytest.raises(FileNotFoundError, match="exact_dedup"):
        load_result(str(tmp_path / "nope"))


def test_incremental_requires_old_corpus_for_rescore(ray_session, split_dirs):
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.incremental import incremental_dedup
    from address_parser_ray.sources import read_corpus

    old_dir, new_dir = split_dirs
    prev = dedup_pipeline(read_corpus(old_dir))
    with pytest.raises(ValueError, match="old_corpus"):
        incremental_dedup(prev, read_corpus(new_dir))
