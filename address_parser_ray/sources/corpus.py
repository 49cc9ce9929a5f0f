"""Corpus readers/adapters.

The authoritative input shape (BASELINE.json ``input_hint``) is a
Parquet table ``(repo, path, commit, lang, content)``. Reads always
prune to the needed columns — a read that loads all columns for a
2-column transform is wrong at 100 TB.

Reference analogues: the JSON/JSONL readers
(``ner/build_real_dataset.py:23-103`` file-kind sniffing + streaming
array parse) collapse into ``ray.data.read_parquet`` — the streaming
executor replaces the hand-rolled incremental parse.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import ray.data

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def read_corpus(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a corpus Parquet directory/file with column pruning."""
    return ray.data.read_parquet(path, columns=columns or CORPUS_COLUMNS)


def _docs_to_corpus(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text, lang, source, n_chars) → corpus shape.

    path/commit are synthesized deterministically from doc_id (FIXTURES.md
    §"Driver testdata note": shape-compat adapter for oracle checks)."""
    doc_ids = batch["doc_id"].to_pylist()
    paths = [f"docs/doc_{d}.txt" for d in doc_ids]
    commits = [
        hashlib.sha1(f"doc:{d}".encode()).hexdigest() for d in doc_ids
    ]
    return pa.table(
        {
            "repo": batch["source"],
            "path": pa.array(paths, type=pa.string()),
            "commit": pa.array(commits, type=pa.string()),
            "lang": batch["lang"],
            "content": batch["text"],
            "doc_id": batch["doc_id"],
        }
    )


def documents_as_corpus(sf_dir: str) -> ray.data.Dataset:
    """Adapt the driver's ``documents`` table to the corpus schema
    (keeps ``doc_id`` so results can be compared against SQL oracles)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    return ds.map_batches(_docs_to_corpus, batch_format="pyarrow", zero_copy_batch=True)
