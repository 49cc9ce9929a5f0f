"""Stage 2 — pairwise scoring (actor pool, warm state).

The graft of the reference's P-stage: a cheap set-similarity gate before
the expensive scorers (Dice gate 0.4, ``fuzz/inexus_parser.py:2804-2833``)
followed by a blended rich score (ratio/partial_ratio/WRatio blend with
component boosts, ``:2852-2941``). Here per candidate pair:

- ``jacc_shingle`` — MinHash Jaccard estimate over char shingles (gate)
- ``jacc_token``   — MinHash Jaccard estimate over word tokens
- ``jw_path``      — Jaro-Winkler on file paths (only computed for pairs
                     that survive the gate — the reference computes its
                     rich scores only after the Dice gate)
- ``size_sim``     — min/max length ratio
- ``score``        — fixed blend (PipelineConfig weights)
- ``is_match``     — score ≥ match_threshold (plus exact sha equality
                     short-circuits to 1.0)

Runs as ``map_batches(PairScorer, concurrency=...)``: the scorer is a
callable class so per-actor state (config, weights) loads once
(the reference builds its parser once per process and reuses it per
record, ``ner/build_real_dataset.py:170,199``).

Everything except Jaro-Winkler is vectorized numpy over the whole batch;
JW runs only on gate survivors (short path strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.functions.hashing import decode_sig_column, ids_np
from address_parser_ray.functions.similarity import jaro_winkler
from address_parser_ray.rayutil import default_concurrency, project


def _score_arrays(cfg, ids_a, ids_b, mh_a, mh_b, tmh_a, tmh_b,
                  nc_a, nc_b, sha_a, sha_b, path_a, path_b,
                  lang_a=None, lang_b=None, fmh_a=None, fmh_b=None) -> pa.Table:
    """Shared scoring math for both scorer variants (joined columns vs
    broadcast lookup).  ``ids_a``/``ids_b`` are Arrow binary columns and
    ride through to the output verbatim."""
    n = len(ids_a)
    jacc = (mh_a == mh_b).mean(axis=1)
    tjacc = (tmh_a == tmh_b).mean(axis=1)
    nc_a = nc_a.astype(np.float64)
    nc_b = nc_b.astype(np.float64)
    hi = np.maximum(nc_a, nc_b)
    size_sim = np.where(hi > 0, np.minimum(nc_a, nc_b) / np.where(hi > 0, hi, 1), 1.0)
    exact = sha_a == sha_b

    # fine (4-gram) Jaccard estimate: rename-robust content evidence
    # (reference P2 content blend, estimated from the per-record sketch)
    fj = None
    if cfg.content_rescore and fmh_a is not None:
        fj = (fmh_a == fmh_b).mean(axis=1)

    gate = (jacc >= cfg.jaccard_gate) | exact
    if fj is not None:
        # a heavy rename can push the wide-shingle estimate under the
        # gate while 4-gram similarity stays high — let it through
        gate = gate | (fj >= cfg.jaccard_gate)

    base = cfg.w_shingle * jacc + cfg.w_token * tjacc + cfg.w_size * size_sim
    # path Jaro-Winkler is the one per-pair PYTHON kernel — compute it
    # only where its ≤ w_path contribution can move the pair into the
    # decision window [threshold − margin, threshold + margin); outside
    # that window the match decision (and band membership) is already
    # settled without it. Deterministic: need is a pure function of base.
    margin = cfg.rescore_margin if cfg.content_rescore else 0.0
    lo = cfg.match_threshold - margin
    hi = cfg.match_threshold + margin
    need_jw = gate & ~exact & (base + cfg.w_path >= lo) & (base < hi)
    jw = np.zeros(n, dtype=np.float64)
    for i in np.flatnonzero(need_jw):
        jw[i] = jaro_winkler(path_a[i] or "", path_b[i] or "")

    score = base + cfg.w_path * jw
    if fj is not None:
        content_est = cfg.w_content_shingle * jacc + cfg.w_content_4gram * fj
        score = np.maximum(score, content_est)
    score = np.where(exact, 1.0, np.where(gate, score, 0.0))
    is_match = score >= cfg.match_threshold
    # P4 analogue (hierarchy-constrained resolution,
    # inexus_parser.py:264-403): a non-exact match edge may not merge
    # records with inconsistent lang evidence. Free: lang rides the
    # compact feature table.
    if cfg.enforce_lang_consistency and lang_a is not None:
        lang_ok = (
            np.asarray(lang_a, dtype=object) == np.asarray(lang_b, dtype=object)
        )
        is_match = is_match & (lang_ok | exact)
    return pa.table(
        {
            # ids pass through as Arrow binary columns (128-bit identity)
            "id_a": ids_a,
            "id_b": ids_b,
            "jacc_shingle": pa.array(jacc),
            "jacc_token": pa.array(tjacc),
            "jw_path": pa.array(jw),
            "size_sim": pa.array(size_sim),
            "score": pa.array(score),
            "is_match": pa.array(is_match),
        }
    )


class PairScorer:
    """Scores pairs whose features were JOINED on (``attach_features``)."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        if batch.num_rows == 0:
            return _empty_scores()
        P, TP = cfg.score_char_lanes, cfg.score_token_lanes
        return _score_arrays(
            cfg,
            batch["id_a"],
            batch["id_b"],
            decode_sig_column(batch["mh_sk_a"], P, dtype=np.uint16),
            decode_sig_column(batch["mh_sk_b"], P, dtype=np.uint16),
            decode_sig_column(batch["tmh_sk_a"], TP, dtype=np.uint16),
            decode_sig_column(batch["tmh_sk_b"], TP, dtype=np.uint16),
            np.asarray(batch["n_chars_a"]),
            np.asarray(batch["n_chars_b"]),
            np.asarray(batch["sha64_a"]),
            np.asarray(batch["sha64_b"]),
            batch["path_a"].to_pylist(),
            batch["path_b"].to_pylist(),
            batch["lang_a"].to_pylist(),
            batch["lang_b"].to_pylist(),
            decode_sig_column(batch["fmh_sk_a"], P, dtype=np.uint16),
            decode_sig_column(batch["fmh_sk_b"], P, dtype=np.uint16),
        )


class BroadcastPairScorer:
    """Scores raw (id_a, id_b) pairs against a BROADCAST compact features
    table — the Ray-native "small side via ray.put, lookup inside
    map_batches" pattern: zero join shuffles. The features land in each
    actor ONCE in ``__init__`` (object-store shared per node); per batch
    both sides are gathered by a vectorized searchsorted."""

    def __init__(self, cfg: PipelineConfig, feats_ref):
        import ray

        self.cfg = cfg
        t: pa.Table = ray.get(feats_ref)
        ids = ids_np(t["record_id"])
        # columns stay in table order (zero-copy views of the shared
        # object-store buffers — reordering would copy ~90 MB per actor);
        # lookups go through one sorted-permutation indirection instead.
        self.sort_idx = np.argsort(ids, kind="stable")
        self.ids_sorted = ids[self.sort_idx]
        P, TP = cfg.score_char_lanes, cfg.score_token_lanes
        self.mh = decode_sig_column(t["mh_sk"], P, dtype=np.uint16)
        self.tmh = decode_sig_column(t["tmh_sk"], TP, dtype=np.uint16)
        self.sha = np.asarray(t["sha64"]).astype(np.int64)
        self.nc = np.asarray(t["n_chars"]).astype(np.int64)
        # object ndarrays: per-batch gathers below are one C-level fancy
        # index instead of a Python list build per pair side
        self.path = np.array(t["path"].to_pylist(), dtype=object)
        self.lang = np.array(t["lang"].to_pylist(), dtype=object)
        self.fmh = decode_sig_column(t["fmh_sk"], P, dtype=np.uint16)

    def _gather(self, ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self.ids_sorted, ids)
        pos = np.clip(pos, 0, len(self.ids_sorted) - 1)
        if not (self.ids_sorted[pos] == ids).all():
            missing = ids[self.ids_sorted[pos] != ids][:3]
            raise KeyError(f"pair references unknown record ids: {missing}")
        return self.sort_idx[pos]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _empty_scores()
        ia = self._gather(ids_np(batch["id_a"]))
        ib = self._gather(ids_np(batch["id_b"]))
        return _score_arrays(
            self.cfg, batch["id_a"], batch["id_b"],
            self.mh[ia], self.mh[ib],
            self.tmh[ia], self.tmh[ib],
            self.nc[ia], self.nc[ib],
            self.sha[ia], self.sha[ib],
            self.path[ia],
            self.path[ib],
            self.lang[ia],
            self.lang[ib],
            self.fmh[ia],
            self.fmh[ib],
        )


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.binary()),
            "id_b": pa.array([], type=pa.binary()),
            "jacc_shingle": pa.array([], type=pa.float64()),
            "jacc_token": pa.array([], type=pa.float64()),
            "jw_path": pa.array([], type=pa.float64()),
            "size_sim": pa.array([], type=pa.float64()),
            "score": pa.array([], type=pa.float64()),
            "is_match": pa.array([], type=pa.bool_()),
        }
    )


def scoring_stage(pairs_with_features, cfg: PipelineConfig = DEFAULT_CONFIG):
    # a bounded pool: scoring is light per pair, so a huge pool pays more
    # in per-execution actor spawns than it gains in parallelism.
    pool = cfg.scorer_concurrency
    if pool is None:
        # scale the pool WITH the machine (a fixed cap of 8 actors made
        # the stage scale 1.3x from 8->32 cpus); keep headroom for the
        # upstream read/shuffle operators sharing the execution.
        pool = max(2, default_concurrency(None) // 2)
    from address_parser_ray.rayutil import clamped_pool

    return pairs_with_features.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        zero_copy_batch=True,
        concurrency=clamped_pool(pool, pairs_with_features),
        num_cpus=1,
    )


def scoring_stage_broadcast(pairs, feats, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Score raw pairs against broadcast features (small-side path; the
    caller gates on ``feats.size_bytes() <= cfg.broadcast_feats_max_bytes``)."""
    import ray

    feats_table = pa.concat_tables(
        [b for b in feats.iter_batches(batch_size=1 << 18, batch_format="pyarrow")]
    )
    feats_ref = ray.put(feats_table)
    pool = cfg.scorer_concurrency
    if pool is None:
        pool = max(2, default_concurrency(None) // 2)
    from address_parser_ray.rayutil import clamped_pool

    return pairs.map_batches(
        BroadcastPairScorer,
        fn_constructor_kwargs={"cfg": cfg, "feats_ref": feats_ref},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        zero_copy_batch=True,
        concurrency=clamped_pool(pool, pairs),
        num_cpus=1,
    )


def match_edges(scored):
    """is_match pairs → (src, dst) edge list for clustering."""
    return project(
        scored.filter(expr="is_match == True"), {"id_a": "src", "id_b": "dst"}
    )
