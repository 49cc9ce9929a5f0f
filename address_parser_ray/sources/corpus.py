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
import os

import pyarrow as pa
import ray.data

CORPUS_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def detect_format(path: str) -> str:
    """File-kind sniffer (reference S3, ``build_real_dataset.py:23-44``
    magic-byte + extension dispatch): 'parquet' or 'json' (JSONL / JSON
    array both — pyarrow's json reader handles NDJSON natively).
    Accepts fsspec URIs (``s3://…``, ``file://…``) — the readers and
    writers below pass URIs straight to Ray's native object-store
    support; only this probe needs explicit filesystem routing."""
    if "://" in path:
        import fsspec

        fs, fpath = fsspec.core.url_to_fs(path)
        probe = fpath
        if fs.isdir(fpath):
            entries = sorted(
                b
                for e in fs.ls(fpath, detail=False)
                for b in [e.rstrip("/").rsplit("/", 1)[-1]]
                if not b.startswith((".", "_"))
            )
            if not entries:
                return "parquet"
            probe = f"{fpath.rstrip('/')}/{entries[0]}"
        ext = os.path.splitext(probe)[1].lower()
        if ext in (".parquet", ".pq"):
            return "parquet"
        if ext in (".json", ".jsonl", ".ndjson"):
            return "json"
        if ext in (".csv", ".tsv"):
            return "csv"
        with fs.open(probe, "rb") as f:
            head = f.read(4)
        return "parquet" if head[:4] == b"PAR1" else "json"
    probe = path
    if os.path.isdir(path):
        entries = sorted(
            e for e in os.listdir(path) if not e.startswith((".", "_"))
        )
        if not entries:
            return "parquet"
        probe = os.path.join(path, entries[0])
    ext = os.path.splitext(probe)[1].lower()
    if ext in (".parquet", ".pq"):
        return "parquet"
    if ext in (".json", ".jsonl", ".ndjson"):
        return "json"
    if ext in (".csv", ".tsv"):
        return "csv"
    with open(probe, "rb") as f:
        head = f.read(4)
    return "parquet" if head[:4] == b"PAR1" else "json"


def read_corpus(
    path: str,
    columns: list[str] | None = None,
    file_format: str | None = None,
    tolerant: bool = False,
) -> ray.data.Dataset:
    """Read a corpus directory/file with column pruning. Parquet prunes
    AT the read (only the needed columns leave storage); JSONL cannot —
    it is parsed then projected, so Parquet is the 100-TB format and
    JSONL the ingestion/interchange one (reference S1/S4 readers).

    ``tolerant=True`` (JSONL only) skips malformed/blank lines instead
    of failing the read — the reference S4 contract
    (``build_real_dataset.py:46-57`` drops lines that do not parse);
    real crawl dumps always contain a few."""
    cols = columns or CORPUS_COLUMNS
    fmt = file_format or detect_format(path)
    if fmt == "parquet":
        return ray.data.read_parquet(path, columns=cols)
    if fmt == "csv":
        return read_csv_corpus(path, cols)
    if tolerant:
        return _read_jsonl_tolerant(path, cols)
    from address_parser_ray.rayutil import project

    return project(ray.data.read_json(path), {c: c for c in cols})


def _read_jsonl_tolerant(path: str, cols: list[str]) -> ray.data.Dataset:
    """Line-level JSONL parse that SKIPS malformed lines (per-row poison
    handling, SURVEY §4): read_text streams lines, each batch parses
    with json.loads and drops failures — no single bad line can fail a
    100-TB ingest."""
    import json as _json

    def parse(t: pa.Table) -> pa.Table:
        rows = []
        for line in t["text"].to_pylist():
            line = (line or "").strip()
            if not line:
                continue
            try:
                obj = _json.loads(line)
            except ValueError:
                continue
            if isinstance(obj, dict):
                rows.append(obj)
        return pa.table(
            {
                c: pa.array(
                    [r.get(c) for r in rows], type=pa.string()
                )
                for c in cols
            }
        )

    return ray.data.read_text(path).map_batches(parse, batch_format="pyarrow")


def read_csv_corpus(path: str, cols: list[str]) -> ray.data.Dataset:
    """CSV reader (interchange format beside JSONL): quoted fields may
    contain commas, quotes and NEWLINES (``newlines_in_values`` — the
    default reader would split a quoted multi-line field); projection
    happens after the parse (CSV, like JSONL, cannot prune at the
    read — Parquet remains the 100-TB format)."""
    from pyarrow import csv as pacsv

    from address_parser_ray.rayutil import project

    ds = ray.data.read_csv(
        path, parse_options=pacsv.ParseOptions(newlines_in_values=True)
    )
    return project(ds, {c: c for c in cols})


def write_csv(ds: ray.data.Dataset, path: str) -> None:
    """CSV sink: one file per block (resumable, never one giant file);
    arrow's writer quotes embedded delimiters/quotes/newlines so the
    ``read_csv_corpus`` round-trip is lossless for non-null strings
    (CSV has no null/empty-string distinction — use Parquet or JSONL
    when nulls matter)."""
    ds.write_csv(path)


def write_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """JSONL sink (reference S7 ``merge_datasets.py:40-55`` writer):
    one line per record, partitioned one file per block — resumable
    output, never one giant file."""
    ds.write_json(path)


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
