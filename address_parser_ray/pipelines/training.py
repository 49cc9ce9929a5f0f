"""Training-ingest handoff: packed token shards + batch iteration.

Closes the last reference-surface gap (``ner/ner_train.py:82-138``: HF
dataset load → ``tokenize_and_align`` → batched map into a Trainer).
Training itself stays out of scope (SURVEY §3.3); this module is the
HANDOFF — the engine's curation output materialized as the thing a
trainer actually consumes:

- :func:`write_packed_shards` — documents → token-id sequences packed
  to a fixed token budget, written as hive-partitioned Parquet
  (``split=…/bucket=…``) so a failed run re-writes one partition and a
  reader prunes by split.  The packing rule is EXACTLY
  ``q_seq_pack_stats``'s SQL-checkable prefix-sum rule
  (``batch_id = tokens_before // capacity`` per ``doc_id % buckets``
  scan bucket, docs in doc_id order), with one EOS token appended per
  document so sequence boundaries survive concatenation.
- :func:`iter_packed_batches` — shards → padded numpy
  ``{input_ids, attention_mask}`` batches (the `collate` shape).
- :func:`iter_torch_batches` — the same as torch tensors, import-gated
  (no torch in this sandbox; the numpy path is the tested one).

Tokenizer: the deterministic HASHING-TRICK id map (splitmix64 of the
whitespace token's bytes → ``[2, vocab)``; 0 = PAD, 1 = EOS) — the
sandbox stand-in for a real BPE vocab.  It is vocabulary-free (no
driver-side vocab build, nothing to broadcast), which is also the
honest 100-TB default; swap :func:`hash_token_ids` for a broadcast
BPE table when a trained vocab exists (``q_bpe_train_merges`` builds
one).  Whitespace tokenization matches ``_ws_tokens``' pinned
DuckDB-parity rule.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import ray.data

from address_parser_ray.functions.hashing import splitmix64

PAD_ID = 0
EOS_ID = 1
VOCAB_SIZE = 1 << 15
PACK_CAPACITY = 512
PACK_BUCKETS = 16

_WS_ASCII = re.compile(r"\s+", re.ASCII)
_POLY = np.uint64(1099511628211)


def hash_token_ids(tokens: list[str], vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    """Deterministic token ids in ``[2, vocab_size)`` via an FNV-1a-style
    byte fold + splitmix64 — the hashing trick (Weinberger et al.,
    ICML'09).  Reserved: 0 = PAD, 1 = EOS."""
    n = len(tokens)
    out = np.empty(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i, t in enumerate(tokens):
            h = np.uint64(0xCBF29CE484222325)
            for b in t.encode("utf-8", "ignore"):
                h = (h ^ np.uint64(b)) * _POLY
            out[i] = h
        mixed = splitmix64(out)
    return (mixed % np.uint64(vocab_size - 2) + np.uint64(2)).astype(np.int32)


def _doc_token_ids(text: str | None, vocab_size: int) -> np.ndarray:
    toks = _WS_ASCII.split((text or "").strip(" "))
    ids = hash_token_ids(toks, vocab_size)
    return np.concatenate([ids, np.array([EOS_ID], dtype=np.int32)])


def write_packed_shards(
    docs: ray.data.Dataset,
    out_dir: str,
    *,
    capacity: int = PACK_CAPACITY,
    buckets: int = PACK_BUCKETS,
    holdout_mod: int = 10,
    vocab_size: int = VOCAB_SIZE,
) -> dict:
    """``docs`` (doc_id, text) → packed shards under
    ``out_dir/<split>/bucket=<k>/*.parquet``; returns a manifest
    ``{split: {"n_sequences": …, "n_docs": …, "n_tokens": …}}`` counted
    from the written data.

    Split rule (T6, parallel-safe): ``doc_id % holdout_mod == 0`` →
    ``heldout``, else ``train``.  Pack rule (``q_seq_pack_stats``):
    within each (split, ``doc_id % buckets``) scan bucket, docs in
    ascending doc_id pack at ``batch_id = tokens_before // capacity``
    over the EOS-inclusive token counts — a pure prefix sum, so each
    bucket scans independently (scale by raising ``buckets``) and a
    sequence may overflow the budget by at most one document (standard
    greedy packing; the trainer's collate pads to the max).

    Each output row is ONE training sequence:
    ``(bucket, batch_id, input_ids list<int32>, doc_ids list<int64>,
    n_docs, n_tokens)``.
    """

    def tokenize(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        texts = t["text"].to_pylist()
        tok_ids = [_doc_token_ids(x, vocab_size) for x in texts]
        return pa.table(
            {
                # one int key fuses (split, bucket): bucket + buckets*is_heldout
                "gkey": pa.array(
                    (ids % buckets) + buckets * (ids % holdout_mod == 0)
                ),
                "doc_id": pa.array(ids),
                "input_ids": pa.array(
                    [x.tolist() for x in tok_ids], type=pa.list_(pa.int32())
                ),
                "n_tokens": pa.array(
                    np.array([len(x) for x in tok_ids], dtype=np.int64)
                ),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        order = np.argsort(np.asarray(g["doc_id"]).astype(np.int64))
        ids = np.asarray(g["doc_id"]).astype(np.int64)[order]
        ntok = np.asarray(g["n_tokens"]).astype(np.int64)[order]
        seqs = g["input_ids"].to_pylist()
        seqs = [seqs[i] for i in order]
        gkey = int(np.asarray(g["gkey"])[0])
        split = "heldout" if gkey >= buckets else "train"
        bucket = gkey % buckets
        before = np.concatenate([[0], np.cumsum(ntok)[:-1]])
        batch = before // capacity
        rows = {
            "split": [],
            "bucket": [],
            "batch_id": [],
            "input_ids": [],
            "doc_ids": [],
            "n_docs": [],
            "n_tokens": [],
        }
        for b in np.unique(batch):
            sel = np.flatnonzero(batch == b)
            flat: list[int] = []
            for i in sel:
                flat.extend(seqs[i])
            rows["split"].append(split)
            rows["bucket"].append(int(bucket))
            rows["batch_id"].append(int(b))
            rows["input_ids"].append(flat)
            rows["doc_ids"].append([int(ids[i]) for i in sel])
            rows["n_docs"].append(len(sel))
            rows["n_tokens"].append(int(ntok[sel].sum()))
        return pa.table(
            {
                "split": pa.array(rows["split"], type=pa.string()),
                "bucket": pa.array(rows["bucket"], type=pa.int64()),
                "batch_id": pa.array(rows["batch_id"], type=pa.int64()),
                "input_ids": pa.array(rows["input_ids"], type=pa.list_(pa.int32())),
                "doc_ids": pa.array(rows["doc_ids"], type=pa.list_(pa.int64())),
                "n_docs": pa.array(rows["n_docs"], type=pa.int64()),
                "n_tokens": pa.array(rows["n_tokens"], type=pa.int64()),
            }
        )

    packed = (
        docs.map_batches(tokenize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gkey")
        .map_groups(pack, batch_format="pyarrow")
        .materialize()
    )
    manifest: dict = {}
    for split in ("train", "heldout"):
        part = packed.filter(expr=f"split == '{split}'").drop_columns(["split"])
        d = os.path.join(out_dir, split)
        part.write_parquet(d, partition_cols=["bucket"])
        sub = part.materialize()
        manifest[split] = {
            "n_sequences": sub.count(),
            "n_docs": int(
                sub.aggregate(ray.data.aggregate.Sum("n_docs"))["sum(n_docs)"]
            ),
            "n_tokens": int(
                sub.aggregate(ray.data.aggregate.Sum("n_tokens"))["sum(n_tokens)"]
            ),
        }
    return manifest


def read_packed(out_dir: str, split: str) -> ray.data.Dataset:
    """Shard dataset for one split (hive-partitioned read; prune by
    passing ``columns=…`` downstream).  The hive partition value comes
    back as string — re-cast ``bucket`` to int64 for a stable schema."""
    ds = ray.data.read_parquet(os.path.join(out_dir, split))

    def fix(t: pa.Table) -> pa.Table:
        if "bucket" in t.column_names and not pa.types.is_integer(
            t.schema.field("bucket").type
        ):
            i = t.column_names.index("bucket")
            t = t.set_column(
                i, "bucket", t["bucket"].cast(pa.string()).cast(pa.int64())
            )
        return t

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def iter_packed_batches(
    out_dir: str,
    split: str,
    *,
    batch_size: int = 8,
    pad_to: int | None = None,
    drop_doc_ids: bool = True,
):
    """Yield padded numpy training batches ``{"input_ids": (B, L) int32,
    "attention_mask": (B, L) int8}`` from written shards — the collate
    the reference's Trainer applies (``ner_train.py:118-130``), minus
    the framework.  ``L`` = longest sequence in the batch (or
    ``pad_to``); sequences stream shard-by-shard, nothing corpus-sized
    materializes."""
    cols = ["input_ids"] if drop_doc_ids else ["input_ids", "doc_ids"]
    ds = read_packed(out_dir, split).select_columns(cols)
    for b in ds.iter_batches(batch_size=batch_size, batch_format="pyarrow"):
        seqs = b["input_ids"].to_pylist()
        if not seqs:
            continue
        width = pad_to or max(len(s) for s in seqs)
        ids = np.full((len(seqs), width), PAD_ID, dtype=np.int32)
        mask = np.zeros((len(seqs), width), dtype=np.int8)
        for i, s in enumerate(seqs):
            L = min(len(s), width)
            ids[i, :L] = s[:L]
            mask[i, :L] = 1
        yield {"input_ids": ids, "attention_mask": mask}


def iter_torch_batches(out_dir: str, split: str, **kw):
    """Torch-tensor view of :func:`iter_packed_batches` — import-gated
    (torch is not in this container; the numpy iterator is the tested
    surface and ``ray.data.Dataset.iter_torch_batches`` works directly
    on :func:`read_packed` where torch exists)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover - sandbox has no torch
        raise ImportError(
            "torch is not installed in this environment; use "
            "iter_packed_batches (numpy) or run where torch exists"
        ) from e
    for batch in iter_packed_batches(out_dir, split, **kw):
        yield {k: torch.from_numpy(v) for k, v in batch.items()}
