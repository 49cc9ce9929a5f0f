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


def hash_token_ids(tokens, vocab_size: int = VOCAB_SIZE) -> np.ndarray:
    """Deterministic token ids in ``[2, vocab_size)`` via an FNV-1a-style
    byte fold + splitmix64 — the hashing trick (Weinberger et al.,
    ICML'09).  Reserved: 0 = PAD, 1 = EOS.

    Vectorized ACROSS tokens: the fold walks byte POSITIONS (bounded by
    the longest token), updating every still-live token's state with one
    masked gather per position — numpy element throughput instead of the
    per-token per-byte Python loop this replaced (values bit-identical).
    Accepts a list of strings or a pyarrow string Array."""
    arr = (
        tokens.combine_chunks()
        if isinstance(tokens, pa.ChunkedArray)
        else tokens
        if isinstance(tokens, pa.Array)
        else pa.array(tokens, type=pa.string(), from_pandas=True)
    )
    import pyarrow.compute as pc

    if arr.null_count:
        arr = pc.fill_null(arr, "")
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    offs = np.frombuffer(
        arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
    ).astype(np.int64)
    starts = offs[:-1] - offs[0]
    lens = (offs[1:] - offs[:-1]).astype(np.int64)
    nb = int(offs[-1] - offs[0])
    data = (
        np.frombuffer(arr.buffers()[2], dtype=np.uint8, count=nb,
                      offset=int(offs[0]))
        if nb
        else np.empty(0, dtype=np.uint8)
    )
    h = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(int(lens.max()) if n else 0):
            m = lens > j
            b = data[starts[m] + j].astype(np.uint64)
            h[m] = (h[m] ^ b) * _POLY
        mixed = splitmix64(h)
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
        # split per doc (C regex), then ONE vectorized hash over every
        # token of the batch; EOS scattered in by offset arithmetic —
        # no per-doc concatenate, no list-of-list round-trip
        toks_per = [_WS_ASCII.split((x or "").strip(" ")) for x in texts]
        lens = np.fromiter(
            (len(ts) for ts in toks_per), dtype=np.int64, count=len(toks_per)
        )
        flat = [tok for ts in toks_per for tok in ts]
        tok_flat = hash_token_ids(flat, vocab_size)
        n_out = lens + 1  # one EOS per doc
        ends = np.cumsum(n_out)
        total = int(ends[-1]) if len(ends) else 0
        out = np.full(total, EOS_ID, dtype=np.int32)
        # token i of the flat stream lands at its position shifted by
        # the number of EOS slots inserted before its doc
        if len(flat):
            shift = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            out[np.arange(len(flat), dtype=np.int64) + shift] = tok_flat
        offsets = np.concatenate([[0], ends]).astype(np.int32)
        input_ids = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(out, type=pa.int32()),
        )
        return pa.table(
            {
                # one int key fuses (split, bucket): bucket + buckets*is_heldout
                "gkey": pa.array(
                    (ids % buckets) + buckets * (ids % holdout_mod == 0)
                ),
                "doc_id": pa.array(ids),
                "input_ids": input_ids,
                "n_tokens": pa.array(n_out),
            }
        )

    def pack(g: pa.Table) -> pa.Table:
        # fully vectorized: the ordered docs' token lists gather into one
        # contiguous stream (Arrow values + offsets, no to_pylist), and
        # each output sequence is a slice of that stream at the batch
        # boundaries — zero per-doc Python
        ids_all = np.asarray(g["doc_id"]).astype(np.int64)
        order = np.argsort(ids_all)
        ids = ids_all[order]
        ntok = np.asarray(g["n_tokens"]).astype(np.int64)[order]
        col = g["input_ids"]
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        voff = np.asarray(arr.offsets, dtype=np.int64)
        vals = np.asarray(arr.values, dtype=np.int32)
        seq_starts = voff[:-1][order]
        seq_lens = (voff[1:] - voff[:-1])[order]
        out_ends = np.cumsum(seq_lens)
        total = int(out_ends[-1]) if len(out_ends) else 0
        flat_idx = (
            np.repeat(
                seq_starts - np.concatenate([[0], out_ends[:-1]]), seq_lens
            )
            + np.arange(total, dtype=np.int64)
        )
        stream = vals[flat_idx]
        gkey = int(np.asarray(g["gkey"])[0])
        split = "heldout" if gkey >= buckets else "train"
        bucket = gkey % buckets
        before = np.concatenate([[0], np.cumsum(ntok)[:-1]])
        batch = before // capacity
        bstart = np.flatnonzero(
            np.concatenate([[True], batch[1:] != batch[:-1]])
        )
        doc_tok_start = np.concatenate([[0], out_ends])
        bnd = np.concatenate([bstart, [len(ids)]])
        tok_bnd = doc_tok_start[bnd]
        input_lists = pa.ListArray.from_arrays(
            pa.array(tok_bnd.astype(np.int32), type=pa.int32()),
            pa.array(stream, type=pa.int32()),
        )
        doc_lists = pa.ListArray.from_arrays(
            pa.array(bnd.astype(np.int32), type=pa.int32()),
            pa.array(ids, type=pa.int64()),
        )
        nseq = len(bstart)
        return pa.table(
            {
                "split": pa.array([split] * nseq, type=pa.string()),
                "bucket": pa.array(
                    np.full(nseq, bucket, dtype=np.int64)
                ),
                "batch_id": pa.array(batch[bstart].astype(np.int64)),
                "input_ids": input_lists,
                "doc_ids": doc_lists,
                "n_docs": pa.array(np.diff(bnd).astype(np.int64)),
                "n_tokens": pa.array(np.diff(tok_bnd).astype(np.int64)),
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
