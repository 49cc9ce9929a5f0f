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
from address_parser_ray.functions.hashing import decode_sig_column
from address_parser_ray.functions.similarity import jaro_winkler
from address_parser_ray.rayutil import project


class PairScorer:
    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        if n == 0:
            return _empty_scores()
        P = cfg.num_perm
        TP = cfg.token_num_perm
        mh_a = decode_sig_column(batch["minhash_a"], P)
        mh_b = decode_sig_column(batch["minhash_b"], P)
        tmh_a = decode_sig_column(batch["token_minhash_a"], TP)
        tmh_b = decode_sig_column(batch["token_minhash_b"], TP)
        jacc = (mh_a == mh_b).mean(axis=1)
        tjacc = (tmh_a == tmh_b).mean(axis=1)
        nc_a = np.asarray(batch["n_chars_a"], dtype=np.float64)
        nc_b = np.asarray(batch["n_chars_b"], dtype=np.float64)
        hi = np.maximum(nc_a, nc_b)
        size_sim = np.where(hi > 0, np.minimum(nc_a, nc_b) / np.where(hi > 0, hi, 1), 1.0)

        sha_a = batch["content_sha256_a"].to_pylist()
        sha_b = batch["content_sha256_b"].to_pylist()
        exact = np.fromiter(
            (a == b for a, b in zip(sha_a, sha_b)), dtype=bool, count=n
        )

        gate = (jacc >= cfg.jaccard_gate) | exact
        jw = np.zeros(n, dtype=np.float64)
        if gate.any():
            path_a = batch["path_a"].to_pylist()
            path_b = batch["path_b"].to_pylist()
            for i in np.flatnonzero(gate):
                jw[i] = jaro_winkler(path_a[i] or "", path_b[i] or "")

        score = (
            cfg.w_shingle * jacc
            + cfg.w_token * tjacc
            + cfg.w_path * jw
            + cfg.w_size * size_sim
        )
        score = np.where(exact, 1.0, np.where(gate, score, 0.0))
        is_match = score >= cfg.match_threshold

        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jacc_shingle": pa.array(jacc),
                "jacc_token": pa.array(tjacc),
                "jw_path": pa.array(jw),
                "size_sim": pa.array(size_sim),
                "score": pa.array(score),
                "is_match": pa.array(is_match),
            }
        )


def _empty_scores() -> pa.Table:
    return pa.table(
        {
            "id_a": pa.array([], type=pa.int64()),
            "id_b": pa.array([], type=pa.int64()),
            "jacc_shingle": pa.array([], type=pa.float64()),
            "jacc_token": pa.array([], type=pa.float64()),
            "jw_path": pa.array([], type=pa.float64()),
            "size_sim": pa.array([], type=pa.float64()),
            "score": pa.array([], type=pa.float64()),
            "is_match": pa.array([], type=pa.bool_()),
        }
    )


def scoring_stage(pairs_with_features, cfg: PipelineConfig = DEFAULT_CONFIG):
    return pairs_with_features.map_batches(
        PairScorer,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        zero_copy_batch=True,
        concurrency=cfg.scorer_concurrency,
        num_cpus=1,
    )


def match_edges(scored):
    """is_match pairs → (src, dst) edge list for clustering."""
    return project(
        scored.filter(expr="is_match == True"), {"id_a": "src", "id_b": "dst"}
    )
