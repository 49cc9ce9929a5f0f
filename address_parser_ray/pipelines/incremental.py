"""Incremental entity resolution: attach a NEW batch of records to an
existing :class:`DedupResult` without re-fingerprinting or re-scoring
the old corpus.

The reference's pipeline is batch-only (``ner/build_real_dataset.py``
reprocesses the whole file per run); a 100-TB engine cannot afford
that — daily crawl increments must link against yesterday's clusters.
Shape:

    fingerprint(new batch)                    # old sketches are REUSED
      → exact dedup over old ∪ new ids+shas   # light shuffle — this IS
                                              #   the distributed sha-index
                                              #   probe (16 B+sha per row)
      → blocking over all reps                # band keys recomputed from
                                              #   sketches (no content read)
      → keep only pairs touching a new id     # old↔old pairs were already
                                              #   decided by the prev run
      → score / content-rescore new pairs     # the expensive stages run
                                              #   on the increment only
      → closure over new edges ∪ dup edges
        ∪ prev NON-SINGLETON assignments      # new evidence may MERGE two
                                              #   old clusters; min-id
                                              #   labels stay stable

Determinism: labels are min-record-id, so an incremental run and a
full-corpus run produce the SAME partition AND the same labels whenever
they decide the same pairs (asserted by ``tests/test_incremental.py``).

Band-index probe (removes the last corpus-wide pass): a checkpointing
full run persists the salted exploded (block_key, record_id) index plus
the hot-key map it was salted with (``dedup_pipeline`` stage
``band_index``; reference analogue: the prebuilt inverted n-gram index
reused across calls, ``fuzz/inexus_parser.py:886-889``). Pass it (or a
checkpoint dir via :func:`load_band_index`) and the increment emits keys
for its OWN reps only, probes the index for old members of touched
blocks with a vectorized id-set filter (16 B/row scan, no minhash
decode or band hashing), and feeds the union into pair generation —
block membership for every touched key is identical to a full blocking
run salted with the same hot map, so pairs (and labels) are unchanged.
New-only hot keys that emerge INSIDE the increment are still bounded by
the per-block pair caps. Without an index the legacy path recomputes
bands over all reps (kept for index-less callers). At true scale the
index would additionally be written sorted by key so row-group stats
prune the probe's scan; here the probe is a streamed filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.functions.hashing import ID_DTYPE, ids_np, pack_ids
from address_parser_ray.pipelines.dedup import DedupResult
from address_parser_ray.rayutil import (
    default_num_partitions,
    partitions_for,
    project,
)
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
from address_parser_ray.stages.scoring import match_edges


def load_result(checkpoint_dir: str) -> DedupResult:
    """Rebuild a completed run's :class:`DedupResult` from its
    checkpoint directory (the ``incremental`` CLI path: yesterday's run
    is on disk, not in memory). Needs the ``exact_dedup`` and
    ``assignments`` stages; scored pairs come from ``rescored_pairs``
    when the run had content-rescore on, else ``scored_pairs``."""
    from address_parser_ray.state import Checkpointer

    ck = Checkpointer(checkpoint_dir)
    for stage in ("exact_dedup", "assignments"):
        if not ck.is_done(stage):
            raise FileNotFoundError(
                f"checkpoint {checkpoint_dir!r} has no completed "
                f"{stage!r} stage — run the full pipeline with "
                f"--checkpoint-dir first"
            )
    scored_name = (
        "rescored_pairs" if ck.is_done("rescored_pairs") else "scored_pairs"
    )
    scored = (
        ray.data.read_parquet(f"{checkpoint_dir}/{scored_name}")
        if ck.is_done(scored_name)
        else None
    )
    return DedupResult(
        assignments=ray.data.read_parquet(f"{checkpoint_dir}/assignments"),
        scored_pairs=scored,
        fingerprints=ray.data.read_parquet(f"{checkpoint_dir}/exact_dedup"),
    )


def load_band_index(checkpoint_dir: str):
    """→ (band_index Dataset, hot_keys dict) from a completed
    checkpointing run, or (None, None) when the run predates the index
    (legacy checkpoints still work — the increment just recomputes
    bands)."""
    from address_parser_ray.state import Checkpointer

    ck = Checkpointer(checkpoint_dir)
    if not ck.is_done("band_index"):
        return None, None
    hot_raw = ck.load_json("band_hot_keys") or {}
    return (
        ray.data.read_parquet(f"{checkpoint_dir}/band_index"),
        {int(k): int(v) for k, v in hot_raw.items()},
    )


def _collect_ids(ds: ray.data.Dataset) -> np.ndarray:
    """Sorted id array of the increment — the incremental contract is
    that the NEW batch is small relative to the corpus, so its id set
    broadcasts (the corpus-sized side never leaves the cluster)."""
    parts = [
        ids_np(b["record_id"])
        for b in ds.select_columns(["record_id"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    ]
    return np.sort(np.concatenate(parts)) if parts else np.empty(0, dtype=ID_DTYPE)


def _touching_filter(new_ids_ref):
    def keep(t: pa.Table) -> pa.Table:
        ids = ray.get(new_ids_ref)
        if not ids.size:
            return t.slice(0, 0)

        def isin(col) -> np.ndarray:
            x = ids_np(col)
            pos = np.clip(np.searchsorted(ids, x), 0, ids.size - 1)
            return ids[pos] == x

        return t.filter(pa.array(isin(t["id_a"]) | isin(t["id_b"])))

    return keep


def incremental_dedup(
    prev: DedupResult,
    new_corpus: ray.data.Dataset,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    old_corpus: ray.data.Dataset | None = None,
    num_partitions: int | None = None,
    band_index: ray.data.Dataset | None = None,
    band_hot_keys: dict | None = None,
) -> DedupResult:
    """Link ``new_corpus`` against ``prev`` (a completed run's result).

    ``old_corpus`` is required when ``cfg.content_rescore`` is on: the
    rescore stage re-reads content BY ID for near-threshold pairs, and a
    new↔old pair needs the old side's text.

    ``band_index`` / ``band_hot_keys`` (from :func:`load_band_index`):
    the previous full run's persisted salted (block_key, record_id)
    relation and its hot-key map. When given, band keys are emitted for
    the increment's reps ONLY and old members of touched blocks come
    from an id-set probe of the index — no band re-emission over old
    sketches.
    """
    if cfg.content_rescore and old_corpus is None:
        raise ValueError(
            "incremental_dedup with cfg.content_rescore=True needs "
            "old_corpus (the rescore band re-reads content by id for "
            "both pair sides)"
        )
    num_partitions = default_num_partitions(num_partitions)

    new_fp = fingerprint_stage(
        new_corpus, cfg, outputs=PIPELINE_OUTPUTS
    ).materialize()
    new_ids = _collect_ids(new_fp)
    new_ids_ref = ray.put(new_ids)

    old_fp = prev.fingerprints.drop_columns(["rep_id"])
    deduped = exact_dedup_stage(old_fp.union(new_fp)).materialize()
    reps = representatives(deduped).materialize()
    dup_edges = duplicate_edges(deduped)

    if band_index is not None:
        from address_parser_ray.stages.blocking import (
            exploded_index,
            pairs_from_exploded,
        )

        # 1. keys for the increment's reps only (new records that are
        #    exact dups of old rows dropped out of reps — their linkage
        #    rides dup_edges), salted with the INDEX's hot map so old and
        #    new emissions agree key-for-key.
        def keep_new(t: pa.Table) -> pa.Table:
            ids = ray.get(new_ids_ref)
            if not ids.size:
                return t.slice(0, 0)
            x = ids_np(t["record_id"])
            pos = np.clip(np.searchsorted(ids, x), 0, ids.size - 1)
            return t.filter(pa.array(ids[pos] == x))

        new_keys = exploded_index(
            reps.map_batches(keep_new, batch_format="pyarrow", zero_copy_batch=True),
            cfg,
            hot_keys=band_hot_keys or {},
        ).materialize()

        # 2. the increment's distinct key set broadcasts (small by the
        #    incremental contract: ~keys-per-record × |increment|)…
        key_parts = [
            np.asarray(b["block_key"]).astype(np.int64)
            for b in new_keys.select_columns(["block_key"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        ]
        touched = (
            np.unique(np.concatenate(key_parts))
            if key_parts
            else np.empty(0, dtype=np.int64)
        )
        touched_ref = ray.put(touched)

        # Record ids are hashes, not monotone: a NEW record that exactly
        # duplicates an old rep under a SMALLER id takes over as rep,
        # demoting the old one — its index rows are stale (the combined
        # run's blocks carry the new rep instead, whose keys new_keys
        # already emits). The demoted set is bounded by the increment's
        # sha groups, so it broadcasts; computed as a streamed filter
        # over deduped (rep_id ∈ new ∧ record_id ∉ new).
        def dem(t: pa.Table) -> pa.Table:
            ids = ray.get(new_ids_ref)
            out = t.select(["record_id", "rep_id"])
            if not ids.size:
                return out.slice(0, 0).select(["record_id"])
            rid = ids_np(out["record_id"])
            rep = ids_np(out["rep_id"])

            def isin(x: np.ndarray) -> np.ndarray:
                pos = np.clip(np.searchsorted(ids, x), 0, ids.size - 1)
                return ids[pos] == x

            return pa.table({"record_id": pack_ids(rid[isin(rep) & ~isin(rid)])})

        demoted = _collect_ids(
            deduped.map_batches(dem, batch_format="pyarrow", zero_copy_batch=True)
        )
        demoted_ref = ray.put(demoted)

        # 3. …and probes the index: a streamed vectorized filter over
        #    (block_key, record_id) rows — no sketch decode, no banding.
        def probe(t: pa.Table) -> pa.Table:
            keys = ray.get(touched_ref)
            if not keys.size:
                return t.slice(0, 0)
            x = np.asarray(t["block_key"]).astype(np.int64)
            pos = np.clip(np.searchsorted(keys, x), 0, keys.size - 1)
            mask = keys[pos] == x
            dem_ids = ray.get(demoted_ref)
            if dem_ids.size:
                r = ids_np(t["record_id"])
                dpos = np.clip(np.searchsorted(dem_ids, r), 0, dem_ids.size - 1)
                mask &= dem_ids[dpos] != r
            return t.filter(pa.array(mask))

        old_touched = band_index.map_batches(
            probe, batch_format="pyarrow", zero_copy_batch=True
        )
        pairs = (
            pairs_from_exploded(old_touched.union(new_keys), cfg)
            .map_batches(
                _touching_filter(new_ids_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    else:
        pairs = (
            blocking_stage(reps, cfg)
            .map_batches(
                _touching_filter(new_ids_ref),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .materialize()
        )
    n_pairs = pairs.count()
    join_partitions = partitions_for(n_pairs)

    if n_pairs == 0:
        from address_parser_ray.stages.scoring import _empty_scores

        scored = ray.data.from_arrow(_empty_scores())
        edges = ray.data.from_arrow(
            _empty_scores().select(["id_a", "id_b"]).rename_columns(["src", "dst"])
        )
    else:
        from address_parser_ray.stages.blocking import _reduce_feats
        from address_parser_ray.stages.scoring import (
            scoring_stage,
            scoring_stage_broadcast,
        )

        feats = reps.map_batches(
            _reduce_feats(cfg), batch_format="pyarrow", zero_copy_batch=True
        ).materialize()
        if feats.size_bytes() <= cfg.broadcast_feats_max_bytes:
            scored = scoring_stage_broadcast(pairs, feats, cfg).materialize()
        else:
            scored = scoring_stage(
                attach_features(pairs, reps, cfg, num_partitions=join_partitions),
                cfg,
            ).materialize()
        if cfg.content_rescore:
            from address_parser_ray.stages.rescore import content_rescore_stage

            scored = content_rescore_stage(
                scored,
                old_corpus.union(new_corpus),
                cfg,
                num_partitions=join_partitions,
            ).materialize()
        edges = match_edges(scored)

    # prev assignments re-enter the closure as (record → label) edges;
    # singletons (record == label) carry no information and are dropped,
    # so this side is O(duplicates in the old corpus), not O(corpus).
    prev_edges = project(
        prev.assignments, {"record_id": "src", "cluster_id": "dst"}
    ).filter(expr="src != dst")

    assignments = connected_components(
        edges.union(dup_edges).union(prev_edges),
        deduped,
        max_rounds=cfg.max_cc_rounds,
        num_partitions=num_partitions,
        driver_max_edges=cfg.driver_cc_max_edges,
    ).materialize()

    return DedupResult(
        assignments=assignments, scored_pairs=scored, fingerprints=deduped
    )
