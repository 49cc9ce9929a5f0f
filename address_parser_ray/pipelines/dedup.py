"""The flagship pipeline: corpus → entity clusters.

This is the Ray-Data-native replacement for the reference's
per-document extraction loop (``ner/build_real_dataset.py:159-247``:
one process, one thread, one warm parser, millions of sequential
``parser.process`` calls). Shape:

    read_parquet(corpus)
      → map_batches(fingerprint)             # stage 0: normalize + sketches
      → light (id, sha) shuffle              # exact dedup (dup map broadcast
                                             #   below a size gate)
      → emit keys → salt → bucket shuffle    # blocking (hot keys sampled)
      → bucket shuffle                       # cross-band pair dedup
      → map_batches(PairScorer actor pool)   # scoring: compact features
                                             #   broadcast below a byte gate,
                                             #   bucketed joins above
      → union-find                           # driver (vectorized) below an
                                             #   edge gate, distributed
                                             #   min-label propagation above
      → assignments (record_id, cluster_id)

Every wide step carries only ids + fixed-width sketches; ``content``
never crosses a shuffle. Each size gate has a test asserting both paths
produce identical output.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.stages.blocking import attach_features, blocking_stage
from address_parser_ray.stages.clustering import connected_components
from address_parser_ray.stages.exact_dedup import (
    duplicate_edges,
    exact_dedup_stage,
    representatives,
)
from address_parser_ray.stages.fingerprint import (
    PIPELINE_OUTPUTS,
    fingerprint_stage,
)
from address_parser_ray.stages.scoring import match_edges, scoring_stage


@dataclass
class DedupResult:
    assignments: ray.data.Dataset   # (record_id, cluster_id) for every record
    scored_pairs: ray.data.Dataset  # all scored candidate pairs
    fingerprints: ray.data.Dataset  # per-record sketches (content dropped)


def dedup_pipeline(
    corpus: ray.data.Dataset,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
    checkpointer=None,
) -> DedupResult:
    """Run blocking → scoring → clustering end-to-end.

    ``checkpointer`` (state.checkpoint.Checkpointer) persists each stage
    as partitioned Parquet with a lineage sidecar; a rerun resumes from
    the last completed stage.
    """

    from address_parser_ray.rayutil import default_num_partitions

    num_partitions = default_num_partitions(num_partitions)

    import os as _os
    import sys as _sys
    import time as _time

    _timing = _os.environ.get("APR_STAGE_TIMING") == "1"

    def ck(name, fn):
        # every stage output is consumed by >1 downstream branch (or in a
        # loop); without pinning, Ray's lazy DAG would re-execute the whole
        # upstream per consumer. Checkpointer pins to Parquet (durable,
        # resumable); otherwise pin in the object store.
        t0 = _time.time()
        if checkpointer is None:
            out = fn().materialize()
        else:
            out = checkpointer.stage(name, fn)
        if _timing:
            print(f"[stage {name}: {_time.time() - t0:.1f}s]", file=_sys.stderr)
        return out

    # --- stage 0: the ONE content scan -----------------------------------
    # With content_rescore on, the fingerprint pass also keeps the
    # normalized text (norm_text column): the rescore band later re-reads
    # text BY ID from this side table instead of re-reading +
    # re-normalizing the corpus parquet — the second full-corpus scan was
    # the measured bandwidth floor (BASELINE.md Amdahl F ≈ 53 s).
    # norm_text is dropped before the first shuffle; only ids + sketches
    # ever cross an exchange.
    norm_texts = None
    fresh_fingerprints = checkpointer is None or not checkpointer.is_done(
        "fingerprints"
    )
    if cfg.content_rescore and fresh_fingerprints:
        t0 = _time.time()
        combined = fingerprint_stage(
            corpus, cfg, keep_norm_text=True, outputs=PIPELINE_OUTPUTS
        ).materialize()
        if _timing:
            print(f"[stage fingerprints: {_time.time() - t0:.1f}s]", file=_sys.stderr)
        if checkpointer is None:
            fingerprints = combined.drop_columns(["norm_text"])
            norm_texts = combined
        else:
            # persist BOTH views: sketches for every downstream stage,
            # and the (record_id, lang, norm_text) side table a resumed
            # run's rescore can re-read by id without a corpus scan.
            fingerprints = ck(
                "fingerprints", lambda: combined.drop_columns(["norm_text"])
            )
            norm_texts = ck(
                "norm_texts",
                lambda: combined.select_columns(
                    ["record_id", "lang", "norm_text"]
                ),
            )
    else:
        fingerprints = ck(
            "fingerprints",
            lambda: fingerprint_stage(corpus, cfg, outputs=PIPELINE_OUTPUTS),
        )
        if (
            cfg.content_rescore
            and checkpointer is not None
            and checkpointer.is_done("norm_texts")
        ):
            norm_texts = checkpointer.stage("norm_texts", lambda: None)
    deduped = ck("exact_dedup", lambda: exact_dedup_stage(fingerprints))
    # reps feeds the hot-key probe, key emission and two feature joins —
    # pin it once.
    reps = representatives(deduped).materialize()
    dup_edges = duplicate_edges(deduped)

    if checkpointer is None:
        pairs = ck("candidate_pairs", lambda: blocking_stage(reps, cfg))
    else:
        # checkpointing runs persist the salted exploded band index
        # (block_key, record_id) plus the hot-key map it was salted with
        # — the posting-list side table a later INCREMENT probes by key
        # instead of re-emitting bands over every old sketch
        # (pipelines/incremental.py). The full run itself pays nothing
        # extra beyond the parquet write: pair generation reads the same
        # exploded relation back (which also makes blocking resumable).
        from address_parser_ray.stages.blocking import (
            exploded_index,
            pairs_from_exploded,
            probe_hot_keys,
        )

        hot_raw = checkpointer.load_json("band_hot_keys")
        if hot_raw is None or not checkpointer.is_done("band_index"):
            light = reps.select_columns(
                ["record_id", "minhash", "lang", "basename"]
            )
            hot = probe_hot_keys(light, cfg)
            checkpointer.save_json(
                "band_hot_keys", {str(k): v for k, v in hot.items()}
            )
        else:
            hot = {int(k): int(v) for k, v in hot_raw.items()}
        band = ck("band_index", lambda: exploded_index(reps, cfg, hot_keys=hot))
        pairs = ck("candidate_pairs", lambda: pairs_from_exploded(band, cfg))
    n_pairs = pairs.count()
    from address_parser_ray.rayutil import partitions_for

    join_partitions = partitions_for(n_pairs)
    if n_pairs == 0:
        # degenerate corpora (e.g. all rows byte-identical) yield zero
        # candidate pairs — and an empty map_groups output can carry no
        # schema, which downstream joins cannot tolerate.
        from address_parser_ray.stages.scoring import _empty_scores

        scored = ray.data.from_arrow(_empty_scores())
        edges = ray.data.from_arrow(
            _empty_scores().select(["id_a", "id_b"]).rename_columns(["src", "dst"])
        )
    else:
        from address_parser_ray.stages.blocking import _reduce_feats
        from address_parser_ray.stages.scoring import scoring_stage_broadcast

        feats = reps.map_batches(
            _reduce_feats(cfg), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if feats.size_bytes() <= cfg.broadcast_feats_max_bytes:
            # small-side broadcast: ray.put the compact feature table once,
            # score raw pairs with zero join shuffles.
            scored = ck(
                "scored_pairs", lambda: scoring_stage_broadcast(pairs, feats, cfg)
            )
        else:
            scored = ck(
                "scored_pairs",
                lambda: scoring_stage(
                    attach_features(pairs, reps, cfg, num_partitions=join_partitions),
                    cfg,
                ),
            )
        if cfg.content_rescore:
            # stage 2b (reference P2): re-score the uncertain band on
            # content evidence re-joined by id; also re-applies the P4
            # lang rule. See stages/rescore.py.
            from address_parser_ray.stages.rescore import content_rescore_stage

            scored = ck(
                "rescored_pairs",
                lambda: content_rescore_stage(
                    scored,
                    corpus,
                    cfg,
                    num_partitions=join_partitions,
                    norm_texts=norm_texts,
                ),
            )
        edges = match_edges(scored)

    def _cluster():
        # exact-duplicate edges (dup → its sha representative) go into the
        # SAME transitive closure as the match edges, over ALL records —
        # no separate "re-attach duplicates" join afterwards.
        all_edges = edges.union(dup_edges)
        return connected_components(
            all_edges,
            deduped,
            max_rounds=cfg.max_cc_rounds,
            num_partitions=num_partitions,
            driver_max_edges=cfg.driver_cc_max_edges,
        )

    assignments = ck("assignments", _cluster)
    return DedupResult(
        assignments=assignments, scored_pairs=scored, fingerprints=deduped
    )
