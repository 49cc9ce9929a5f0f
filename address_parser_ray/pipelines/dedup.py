"""The flagship pipeline: corpus → entity clusters.

This is the Ray-Data-native replacement for the reference's
per-document extraction loop (``ner/build_real_dataset.py:159-247``:
one process, one thread, one warm parser, millions of sequential
``parser.process`` calls). Shape:

    read_parquet(corpus)
      → map_batches(Fingerprinter)         # stage 0: normalize + sketches
      → groupby(content_sha256)            # exact dedup  (shuffle 1)
      → KeyEmitter → groupby(block_key)    # blocking     (shuffle 2)
      → groupby(id_a, id_b)                # pair dedup   (shuffle 3)
      → join features → map_batches(PairScorer)   # actor-pool scoring
      → iterated groupby/join              # connected components
      → assignments (record_id, cluster_id)

Every wide step carries only ids + fixed-width sketches; ``content``
never crosses a shuffle.
"""

from __future__ import annotations

from dataclasses import dataclass

import ray.data

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.stages.blocking import attach_features, blocking_stage
from address_parser_ray.stages.clustering import (
    clusters_with_duplicates,
    connected_components,
)
from address_parser_ray.stages.exact_dedup import (
    duplicate_edges,
    exact_dedup_stage,
    representatives,
)
from address_parser_ray.stages.fingerprint import fingerprint_stage
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
    num_partitions: int = 8,
    checkpointer=None,
) -> DedupResult:
    """Run blocking → scoring → clustering end-to-end.

    ``checkpointer`` (state.checkpoint.Checkpointer) persists each stage
    as partitioned Parquet with a lineage sidecar; a rerun resumes from
    the last completed stage.
    """

    def ck(name, fn):
        # every stage output is consumed by >1 downstream branch (or in a
        # loop); without pinning, Ray's lazy DAG would re-execute the whole
        # upstream per consumer. Checkpointer pins to Parquet (durable,
        # resumable); otherwise pin in the object store.
        if checkpointer is None:
            return fn().materialize()
        return checkpointer.stage(name, fn)

    fingerprints = ck("fingerprints", lambda: fingerprint_stage(corpus, cfg))
    deduped = ck("exact_dedup", lambda: exact_dedup_stage(fingerprints))
    # reps feeds the hot-key probe, key emission and two feature joins —
    # pin it once.
    reps = representatives(deduped).materialize()
    dup_edges = duplicate_edges(deduped)

    pairs = ck("candidate_pairs", lambda: blocking_stage(reps, cfg))
    if pairs.count() == 0:
        # degenerate corpora (e.g. all rows byte-identical) yield zero
        # candidate pairs — and an empty map_groups output can carry no
        # schema, which downstream joins cannot tolerate.
        from address_parser_ray.stages.scoring import _empty_scores

        scored = ray.data.from_arrow(_empty_scores())
        edges = ray.data.from_arrow(
            _empty_scores().select(["id_a", "id_b"]).rename_columns(["src", "dst"])
        )
    else:
        scored = ck(
            "scored_pairs",
            lambda: scoring_stage(
                attach_features(pairs, reps, cfg, num_partitions=num_partitions), cfg
            ),
        )
        edges = match_edges(scored)

    def _cluster():
        assign_reps = connected_components(
            edges,
            reps,
            max_rounds=cfg.max_cc_rounds,
            num_partitions=num_partitions,
        )
        return clusters_with_duplicates(
            assign_reps, dup_edges, num_partitions=num_partitions
        )

    assignments = ck("assignments", _cluster)
    return DedupResult(
        assignments=assignments, scored_pairs=scored, fingerprints=deduped
    )
