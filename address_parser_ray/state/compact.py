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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
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


def _hex16_to_u64(arr: pa.StringArray) -> np.ndarray:
    """Vectorized ``int(s[:16], 16)`` over a non-null Arrow string array:
    slice to 16 code units, gather the UTF-8 bytes straight off the Arrow
    buffers with one fancy-index, and fold nibbles with numpy — no
    per-row Python. Rows shorter than 16 chars (never the case for
    sha256 hex) take a tiny scalar fallback."""
    h = pc.utf8_slice_codeunits(arr, 0, 16)
    h = h.combine_chunks() if isinstance(h, pa.ChunkedArray) else h
    off = np.frombuffer(h.buffers()[1], dtype=np.int32)[
        h.offset : h.offset + len(h) + 1
    ].astype(np.int64)
    lens = np.diff(off)
    data = np.frombuffer(h.buffers()[2], dtype=np.uint8)
    out = np.zeros(len(h), dtype=np.uint64)
    full = lens == 16
    if full.any():
        idx = off[:-1][full, None] + np.arange(16)[None, :]
        d = data[idx].astype(np.int64)
        v = d - 48 - (d >= 97) * 39 - (d >= 65) * 7  # '0'-'9','a'-'f','A'-'F'
        by = ((v[:, 0::2] << 4) | v[:, 1::2]).astype(np.uint64)
        u = np.zeros(int(full.sum()), dtype=np.uint64)
        for k in range(8):
            u = (u << np.uint64(8)) | by[:, k]
        out[full] = u
    if (~full).any():  # ragged stragglers: scalar path (rare by contract)
        for i in np.flatnonzero(~full):
            s = bytes(data[off[i] : off[i + 1]]).decode()
            out[i] = np.uint64(int(s, 16) if s else 0)
    return out


def hex_multiset_fingerprint(col, acc: tuple = (0, 0, 0, 0)) -> tuple:
    """Order-insensitive MULTISET fingerprint of a hex-string column:
    ``(xor of splitmix64(v), sum of splitmix64(v) mod 2^64, n_null,
    n_rows)`` folded into ``acc``. XOR alone cancels any even number of
    identical values (``{a,a}`` and ``{c,c}`` both XOR to 0) and a
    NULL-vs-zero-hash substitution under a sentinel — the modular SUM
    component breaks the cancellation and NULLs are counted separately,
    never encoded as a colliding value."""
    from address_parser_ray.functions.hashing import splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    valid = col.drop_null()
    n_null = n - len(valid)
    x, s = np.uint64(0), np.uint64(0)
    if len(valid):
        m = splitmix64(_hex16_to_u64(valid))
        x = np.bitwise_xor.reduce(m)
        with np.errstate(over="ignore"):
            s = np.add.reduce(m)
    with np.errstate(over="ignore"):
        return (
            int(acc[0]) ^ int(x),
            int((np.uint64(acc[1]) + s) & np.uint64(0xFFFFFFFFFFFFFFFF)),
            acc[2] + n_null,
            acc[3] + n,
        )


def multiset_fingerprint(col, acc: tuple = (0, 0, 0, 0)) -> tuple:
    """Type-dispatching multiset fingerprint: integer columns fold
    splitmix64 over the raw values; string columns use the hex path
    (``hex_multiset_fingerprint``).  Same (xor, sum, n_null, n_rows)
    contract."""
    from address_parser_ray.functions.hashing import splitmix64

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        n = len(col)
        valid = col.drop_null()
        n_null = n - len(valid)
        x, s = np.uint64(0), np.uint64(0)
        if len(valid):
            m = splitmix64(np.asarray(valid, dtype=np.int64).view(np.uint64))
            x = np.bitwise_xor.reduce(m)
            with np.errstate(over="ignore"):
                s = np.add.reduce(m)
        with np.errstate(over="ignore"):
            return (
                int(acc[0]) ^ int(x),
                int((np.uint64(acc[1]) + s) & np.uint64(0xFFFFFFFFFFFFFFFF)),
                acc[2] + n_null,
                acc[3] + n,
            )
    return hex_multiset_fingerprint(col, acc)


def _xor_column(path: str, column: str) -> tuple:
    """Multiset fingerprint of ``column`` across every part file (same
    rule as ``Checkpointer.invariant_xor``). Vectorized — the audit reads
    both sides of a compaction, so per-row Python here would double-scan
    the data through one interpreter."""
    acc = (0, 0, 0, 0)
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(path, fname), columns=[column])
        acc = hex_multiset_fingerprint(t[column], acc)
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
                f"compaction {verify_column} fingerprint mismatch: "
                f"{xin} != {xout}"
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
