"""Distributed spherical k-means (cosine Lloyd's) — the iterative-ML
training loop over an embedding Dataset.

Each iteration is ONE streaming pass: every batch assigns its vectors to
the nearest centroid (one matmul against the broadcast centroid matrix)
and emits a (k × dims) partial-sum panel plus a partial objective; the
driver folds the panels (structurally tiny — k·dims floats, independent
of corpus size) into the next centroid matrix. Vectors never shuffle;
per round the loop re-broadcasts k·dims floats.

Spherical variant (centroids L2-normalized after each mean) so the
objective Σ cos(x, c(x)) is monotone non-decreasing — the property the
test pins. Empty clusters keep their previous centroid.

Single-step SQL-checkable twin: ``q_kmeans_update`` (integer milli-grid
sums); this loop trades the integer grid for float means because the
fit itself is iterative and oracle-free.

Reference anchor: the trainer loop shape of ``ner/ner_train.py:226-236``
(iterative state update over batched passes), re-expressed Ray-native.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _seed_centroids(ds: ray.data.Dataset, k: int) -> np.ndarray:
    """Deterministic init: the k smallest-vec_id vectors, L2-normalized
    (the same seed-row rule as the IVF/LSH queries).

    Distributed min-k: each batch emits only its own k smallest-id rows
    (a vectorized argpartition inside ``map_batches``), so the driver
    combines a panel of at most (blocks × k) rows — NOT the whole
    embedding table (the old form streamed every batch through the
    driver; at 100 TB that is one process's bandwidth). Same idiom as
    ``q_stratified_sample``'s per-batch top-k partials. Ties on a
    duplicate vec_id resolve by first-seen order within the stable sort —
    embeddings are never part of any comparison key."""

    def partial(t: pa.Table) -> pa.Table:
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        if len(vids) > k:
            idx = np.argpartition(vids, k - 1)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    panel = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    panel = panel.sort_values("vec_id", kind="stable").head(k)
    seeds = np.stack(panel["embedding"].to_numpy()).astype(np.float64)
    return seeds / np.maximum(np.linalg.norm(seeds, axis=1, keepdims=True), 1e-12)


def kmeans_fit(
    ds: ray.data.Dataset, k: int = 16, iters: int = 5
) -> tuple[np.ndarray, list[float]]:
    """→ (centroids (k, d) L2-normalized, objective history). ``ds`` must
    have ``vec_id`` and ``embedding`` columns."""
    C = _seed_centroids(ds, k)
    history: list[float] = []
    panel_input = ds.select_columns(["vec_id", "embedding"])

    for _ in range(iters):
        cref = ray.put(C)

        def partial(t: pa.Table) -> pa.Table:
            C_m = ray.get(cref)
            kk, d = C_m.shape
            emb = np.asarray(
                t["embedding"].combine_chunks().flatten(), dtype=np.float64
            ).reshape(t.num_rows, -1)
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            unit = emb / norms[:, None]
            cos = unit @ C_m.T
            a = np.argmax(cos, axis=1)
            obj = float(cos[np.arange(len(a)), a].sum())
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, a, unit)  # spherical: mean of unit vectors
            counts = np.bincount(a, minlength=kk).astype(np.int64)
            # batch_key: the batch's min vec_id — a deterministic label
            # for THIS partial, so the driver can fold partials in a
            # fixed order (float addition is non-associative; block
            # ARRIVAL order varies run to run and would otherwise wiggle
            # the centroids' last ulps — observed as a determinism-test
            # failure).
            bk = int(np.min(np.asarray(t["vec_id"], dtype=np.int64)))
            return pa.table(
                {
                    "batch_key": pa.array(np.full(kk, bk, dtype=np.int64)),
                    "cluster": pa.array(np.arange(kk, dtype=np.int64)),
                    "n": pa.array(counts),
                    "obj": pa.array(np.r_[obj, np.zeros(kk - 1)]),
                    "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
                }
            )

        panel = (
            panel_input.map_batches(
                partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .to_pandas()  # blocks × k rows of (k·d)-float panels — tiny
            .sort_values(["cluster", "batch_key"], kind="stable")
        )

        history.append(float(panel.sort_values("batch_key", kind="stable")["obj"].sum()))
        new_C = C.copy()
        g = panel.groupby("cluster", sort=True)
        for cid, grp in g:
            n = int(grp["n"].sum())
            if n == 0:
                continue  # empty cluster keeps its centroid
            s = np.sum(np.stack(grp["vsum"].to_numpy()), axis=0)
            norm = np.linalg.norm(s)
            if norm > 0:
                new_C[int(cid)] = s / norm
        C = new_C
    return C, history
