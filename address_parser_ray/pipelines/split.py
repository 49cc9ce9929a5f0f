"""Shuffle → proportional split → partitioned write (reference T5).

The reference merges datasets, shuffles with a seeded RNG and writes
train/validation splits (``ner/merge_datasets.py:85-99``,
``build_standard_dataset.py:983-988``). Ray-natively that is
``random_shuffle(seed)`` (a distributed all-to-all permutation) →
``split_proportionately`` (exact floor-based sizes) → one
``write_parquet`` per split directory — partitioned output, so a failed
run can re-write one split without touching the others.

Split-size rule (pinned by test + SQL oracle): split i of proportions
``[p0, ..]`` gets ``floor(p_i * n)`` rows; the LAST split takes the
remainder.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def shuffle_split_write(
    ds: ray.data.Dataset,
    out_dir: str,
    proportions: list[float] = (0.9,),
    names: list[str] = ("train", "test"),
    seed: int = 42,
) -> dict[str, int]:
    """Shuffle, split and write ``ds``; returns {split_name: rows_written}
    counted back from the written Parquet metadata (the write is the
    ground truth, not the plan)."""
    if len(names) != len(proportions) + 1:
        raise ValueError("need len(proportions)+1 split names")
    splits = ds.random_shuffle(seed=seed).split_proportionately(list(proportions))
    counts: dict[str, int] = {}
    for name, part in zip(names, splits):
        d = os.path.join(out_dir, name)
        shutil.rmtree(d, ignore_errors=True)
        part.write_parquet(d)
        counts[name] = sum(
            pq.read_metadata(os.path.join(d, f)).num_rows
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )
    return counts


def split_counts_table(counts: dict[str, int]) -> pa.Table:
    names = sorted(counts)
    return pa.table(
        {
            "part": pa.array(names, type=pa.string()),
            "n": pa.array([counts[k] for k in names], type=pa.int64()),
        }
    )
