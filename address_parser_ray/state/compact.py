"""Small-file compaction — the operational answer to the 100-TB
small-file problem: checkpoint/output directories accumulate one part
file per block (thousands of tiny files after a skewed or wide run),
which wrecks both the filesystem and the NEXT read's task fan-out.

``compact_parquet_dir`` streams the directory through a no-shuffle
``repartition`` into ~``target_rows_per_file`` files, writes to a
``.tmp`` sibling, VERIFIES the result against the input (row count
always; an order-insensitive XOR of an invariant column when given —
the same sha-xor audit the checkpoints carry), then atomically renames.
A crashed compaction never looks complete; a verification miss raises
and leaves the input untouched.
"""

from __future__ import annotations

import json
import math
import os
import shutil

import pyarrow.parquet as pq
import ray.data


def _dir_rows(path: str) -> int:
    total = 0
    for fname in sorted(os.listdir(path)):
        if fname.endswith(".parquet"):
            total += pq.read_metadata(os.path.join(path, fname)).num_rows
    return total


def _dir_files(path: str) -> int:
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def _xor_column(path: str, column: str) -> int:
    """Order-insensitive XOR fingerprint of a hex-string column across
    every part file (same rule as ``Checkpointer.invariant_xor``)."""
    acc = 0
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(path, fname), columns=[column])
        for v in t[column].to_pylist():
            acc ^= int((v or "0" * 16)[:16], 16)
    return acc


def compact_parquet_dir(
    input_dir: str,
    output_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
    verify_column: str | None = None,
) -> dict:
    """Compact ``input_dir``'s parquet parts into ``output_dir`` with
    ~``target_rows_per_file`` rows per file. Returns a summary dict
    (rows, files in/out). The repartition is split/coalesce only — no
    all-to-all shuffle — so compaction cost is one read + one write."""
    total = _dir_rows(input_dir)
    n_files = max(1, math.ceil(total / max(1, target_rows_per_file)))
    tmp = output_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    if os.path.exists(output_dir):
        raise FileExistsError(f"compaction target exists: {output_dir!r}")

    ray.data.read_parquet(input_dir).repartition(n_files).write_parquet(tmp)

    out_rows = _dir_rows(tmp)
    if out_rows != total:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction row mismatch: in={total} out={out_rows} — input left untouched"
        )
    if verify_column is not None:
        xin, xout = _xor_column(input_dir, verify_column), _xor_column(tmp, verify_column)
        if xin != xout:
            shutil.rmtree(tmp, ignore_errors=True)
            raise RuntimeError(
                f"compaction {verify_column} xor mismatch: {xin:x} != {xout:x}"
            )
    summary = {
        "rows": total,
        "files_in": _dir_files(input_dir),
        "files_out": _dir_files(tmp),
        "target_rows_per_file": target_rows_per_file,
    }
    with open(os.path.join(tmp, "_compaction.json"), "w") as f:
        json.dump(summary, f, indent=1)
    os.rename(tmp, output_dir)
    return summary
