"""Warm-heavy-state model inference stage (reference A3).

The reference loads a tokenizer + NER model once per process and runs
batched inference over a dataset (``ner/ner_train.py:181-189`` warm
state, batched ``dataset.map`` at ``:138``). The Ray-native shape is an
ACTOR-POOL ``map_batches`` stage: the model — here a deterministic
hashing-trick linear classifier with a multi-MB float32 weight matrix —
is built once per actor in ``__init__`` and applied vectorized per
batch in ``__call__``.

The model is real (not a stub): weights are a deterministic random
matrix with the stopword rows of each language boosted toward that
language's class, so the classifier genuinely predicts language from
token evidence — a linear model "trained by construction", which keeps
the container dependency-free while exercising the exact operational
shape of heavy-model inference (weight residency, per-actor load cost,
batched matmul, ``num_gpus`` plumbing).

GPU: pass ``num_gpus>0`` to ``model_inference_stage`` to reserve GPU
slices per actor (weights would move to device in ``__init__`` on a
CUDA build; this container is CPU-only so the matmul runs in numpy
either way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from address_parser_ray.functions.hashing import rng_for, token_hashes
from address_parser_ray.functions.text import STOPWORDS

#: feature space of the hashing trick (2^18 buckets × 6 classes × 4 B
#: ≈ 6 MB of weights — deliberately heavy enough that rebuilding it per
#: batch would dominate the stage).
VOCAB_BITS = 18
VOCAB = 1 << VOCAB_BITS
CLASSES = ("de", "en", "es", "fr", "zh", "unknown")
_STOPWORD_BOOST = 5.0


class HashingTrickClassifier:
    """Callable-class actor: ~6 MB weight matrix built ONCE per actor."""

    def __init__(self, seed: int = 42):
        rng = rng_for(seed, "hash_clf_weights")
        W = (rng.standard_normal((VOCAB, len(CLASSES))) * 0.01).astype(np.float32)
        # "training by construction": each language's stopword hash rows
        # get a strong positive weight on that language's class
        for ci, lang in enumerate(CLASSES):
            for w in sorted(STOPWORDS.get(lang, ())):
                h = token_hashes(w)
                W[int(h[0]) & (VOCAB - 1), ci] += _STOPWORD_BOOST
        self.W = W
        self.bias = np.zeros(len(CLASSES), dtype=np.float32)
        self.n_init = getattr(self, "n_init", 0) + 1

    def _featurize(self, texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """CSR-style (indices, counts, row offsets) of hashed tokens."""
        idx_parts, cnt_parts, offs = [], [], [0]
        for t in texts:
            h = token_hashes((t or "").lower()) & np.uint64(VOCAB - 1)
            u, c = np.unique(h, return_counts=True)
            idx_parts.append(u.astype(np.int64))
            cnt_parts.append(c.astype(np.float32))
            offs.append(offs[-1] + len(u))
        idx = np.concatenate(idx_parts) if idx_parts else np.empty(0, np.int64)
        cnt = np.concatenate(cnt_parts) if cnt_parts else np.empty(0, np.float32)
        return idx, cnt, np.asarray(offs, dtype=np.int64)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        idx, cnt, offs = self._featurize(texts)
        if len(idx) == 0:
            logits = np.zeros((n, len(CLASSES)), dtype=np.float32)
        else:
            # batched sparse × dense: gather weight rows once, segment-sum.
            # A zero sentinel row keeps every offset a valid reduceat index
            # (trailing empty docs point one past the last real row).
            rows = np.vstack(
                [self.W[idx] * cnt[:, None], np.zeros((1, len(CLASSES)), np.float32)]
            )
            logits = np.add.reduceat(rows, offs[:-1], axis=0)
            # a mid-batch empty doc's segment start collides with its
            # neighbor: reduceat returns the neighbor's row — zero it out
            empty = (offs[1:] - offs[:-1]) == 0
            if empty.any():
                logits[empty] = 0.0
        logits = logits + self.bias
        pred = np.argmax(logits, axis=1)
        top = np.max(logits, axis=1) if len(texts) else np.empty(0, np.float32)
        margin = top - np.partition(logits, -2, axis=1)[:, -2] if len(texts) else top
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "pred_lang_model": pa.array(
                    [CLASSES[i] for i in pred], type=pa.string()
                ),
                "margin_1e4": pa.array(
                    np.floor(margin.astype(np.float64) * 1e4).astype(np.int64)
                ),
            }
        )


def model_inference_stage(ds, *, concurrency=None, batch_size: int = 256,
                          num_gpus: float = 0, seed: int = 42):
    """documents(doc_id, text) → (doc_id, pred_lang_model, margin_1e4).

    Actor pool: one weight build per actor, not per batch. ``num_gpus``
    reserves GPU fractions per actor when the cluster has them. The
    default pool size leaves CPU headroom for the upstream read — a pool
    reserving every CPU deadlocks the streaming executor (rayutil note)."""
    from address_parser_ray.rayutil import default_concurrency

    if concurrency is None:
        concurrency = min(8, default_concurrency())
    kwargs = dict(
        fn_constructor_kwargs={"seed": seed},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(HashingTrickClassifier, **kwargs)
