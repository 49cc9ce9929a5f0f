"""Stage 1 — blocking: LSH band keys + exact keys → candidate pairs.

Replaces the reference's centralized inverted n-gram index + Counter
candidate retrieval (``fuzz/inexus_parser.py:92-97, 2662-2680``) with
key *emission* + shuffle: every record emits its blocking keys, a
``groupby(block_key)`` co-locates same-key records, and pairs are
generated per group. Exact-key blocking on (lang, basename) mirrors the
reference's prefix-detected exact keys (``:2685-2762``).

Skew handling (SURVEY.md §4): a cheap key-count pre-pass finds hot keys
(boilerplate / empty files / ``utils.py``), the hot set is broadcast via
``ray.put``, and hot keys are salted into ``ceil(count/cap)`` sub-buckets
by ``hash(record_id)``. Cross-salt pairs inside a hot key are deliberately
dropped — the distributed mirror of the reference's candidate caps
(top-K 400, Dice-scan stop 200: ``inexus_parser.py:114, 2829-2831``).
Pair emission per block is capped and deterministic (sorted-id order),
so N-cpu and 4N-cpu runs produce identical candidate sets.

Only light rows ever shuffle here: (block_key, slot, record_id) — the
1 KB MinHash signatures are joined onto the surviving unique pairs
afterwards, not exploded ~33× per record.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.functions.hashing import (
    decode_sig_column,
    lsh_band_keys,
    splitmix64,
)
from address_parser_ray.rayutil import pinned_join

_U64 = np.uint64


class KeyEmitter:
    """records → exploded (block_key, slot, record_id) rows.

    slot 0 = exact (lang, basename) key; slots 1..bands = LSH bands.
    ``hot_ref`` is an object-store ref to {block_key(int): n_salts} —
    fetched once per actor, read per batch (broadcast, never re-shipped).
    """

    def __init__(self, cfg: PipelineConfig, hot_ref=None):
        self.cfg = cfg
        self.hot = ray.get(hot_ref) if hot_ref is not None else {}

    def _keys_matrix(self, batch: pa.Table) -> np.ndarray:
        cfg = self.cfg
        n = batch.num_rows
        sigs = decode_sig_column(batch["minhash"], cfg.num_perm)
        n_slots = cfg.lsh_bands + (1 if cfg.exact_path_key else 0)
        keys = np.empty((n, n_slots), dtype=_U64)
        col = 0
        if cfg.exact_path_key:
            lang = batch["lang"].to_pylist()
            base = batch["basename"].to_pylist()
            import hashlib

            for i in range(n):
                h = hashlib.blake2b(
                    f"xk\x1f{lang[i]}\x1f{base[i]}".encode("utf-8"), digest_size=8
                )
                keys[i, 0] = int.from_bytes(h.digest(), "big")
            col = 1
        for i in range(n):
            keys[i, col:] = lsh_band_keys(sigs[i], cfg.lsh_bands, cfg.lsh_rows)
        return keys

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        keys = self._keys_matrix(batch)
        rids = np.asarray(batch["record_id"]).astype(np.int64)
        if self.hot:
            # salt hot keys: key' = mix(key, hash(rid) % n_salts)
            old = np.seterr(over="ignore")
            try:
                for i in range(n):
                    for s in range(keys.shape[1]):
                        n_salts = self.hot.get(int(keys[i, s]))
                        if n_salts:
                            salt = int(splitmix64(_U64(rids[i]))) % n_salts
                            keys[i, s] = splitmix64(
                                keys[i, s] * _U64(0x9E3779B97F4A7C15) + _U64(salt + 1)
                            )
            finally:
                np.seterr(**old)
        n_slots = keys.shape[1]
        return pa.table(
            {
                "block_key": pa.array(keys.reshape(-1).view(np.int64)),
                "slot": pa.array(np.tile(np.arange(n_slots, dtype=np.int32), n)),
                "record_id": pa.array(np.repeat(rids, n_slots)),
            }
        )


def _count_keys(batch: pa.Table) -> pa.Table:
    """Partial pre-aggregation: per-batch key counts (combiner before the
    global groupby — SURVEY/ray_guide 'pre-aggregate first')."""
    counts = batch.group_by("block_key").aggregate([("block_key", "count")])
    return counts.rename_columns(["block_key", "n"])


def find_hot_keys(exploded, cfg: PipelineConfig) -> dict[int, int]:
    """Exact counts over 16-byte key rows (cheap shuffle), filtered to the
    hot tail only before leaving the cluster — the driver only ever sees
    keys with count > max_block_records."""
    partial = exploded.select_columns(["block_key"]).map_batches(
        _count_keys, batch_format="pyarrow", batch_size=1 << 20
    )
    from ray.data.aggregate import Sum

    totals = partial.groupby("block_key").aggregate(Sum("n", alias_name="n"))
    hot = totals.filter(expr=f"n > {cfg.max_block_records}")
    out: dict[int, int] = {}
    for row in hot.iter_rows():
        out[int(_U64(np.int64(row["block_key"])))] = int(
            -(-row["n"] // cfg.max_block_records)
        )
    return out


def _make_pairs_fn(max_pairs: int):
    def make_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(group["record_id"]).astype(np.int64))
        m = ids.size
        if m < 2:
            return pa.table(
                {
                    "id_a": pa.array([], type=pa.int64()),
                    "id_b": pa.array([], type=pa.int64()),
                }
            )
        # deterministic emission: sorted ids, lexicographic pair order,
        # truncated at max_pairs (the reference's scored-candidate cap,
        # inexus_parser.py:2878).
        iu = np.triu_indices(m, k=1)
        a = ids[iu[0]][:max_pairs]
        b = ids[iu[1]][:max_pairs]
        return pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})

    return make_pairs


def _dedup_pairs(group: pa.Table) -> pa.Table:
    return group.slice(0, 1)


def blocking_stage(
    reps,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    hot_keys: dict | None = None,
    precomputed_hot: bool = False,
):
    """representatives Dataset → unique candidate pairs (id_a < id_b).

    Two-pass: (1) emit keys, count, find hot keys (small driver-side
    dict); (2) re-emit with salting, group, emit pairs, dedup pairs
    across slots. Pass ``hot_keys={}`` with ``precomputed_hot=True`` to
    skip the counting pass (tests / known-cold corpora).
    """
    light_cols = ["record_id", "minhash", "lang", "basename"]
    key_input = reps.select_columns(light_cols)

    if not precomputed_hot and hot_keys is None:
        exploded_probe = key_input.map_batches(
            KeyEmitter,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=1024,
            zero_copy_batch=True,
            concurrency=cfg.scorer_concurrency,
        )
        hot_keys = find_hot_keys(exploded_probe, cfg)

    hot_ref = ray.put(hot_keys or {})
    exploded = key_input.map_batches(
        KeyEmitter,
        fn_constructor_kwargs={"cfg": cfg, "hot_ref": hot_ref},
        batch_format="pyarrow",
        batch_size=1024,
        zero_copy_batch=True,
        concurrency=cfg.scorer_concurrency,
    )
    pairs = exploded.groupby("block_key").map_groups(
        _make_pairs_fn(cfg.max_pairs_per_block), batch_format="pyarrow"
    )
    # a pair found by several bands/keys survives once
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        _dedup_pairs, batch_format="pyarrow"
    )


def attach_features(pairs, reps, cfg: PipelineConfig = DEFAULT_CONFIG,
                    num_partitions: int = 8):
    """Join each side's sketches onto the unique pairs (two hash joins on
    the features table — cheaper than exploding 1 KB signatures ~33× per
    record through the blocking shuffle)."""
    feat_cols = [
        "record_id", "content_sha256", "path", "n_chars", "n_tokens",
        "minhash", "token_minhash", "simhash",
    ]
    payload = [c for c in feat_cols if c != "record_id"]
    feats = reps.select_columns(feat_cols)
    joined = pinned_join(
        pairs, feats, on="id_a", right_on="record_id",
        num_partitions=num_partitions,
    )
    joined = joined.rename_columns({c: f"{c}_a" for c in payload})
    joined = pinned_join(
        joined, feats, on="id_b", right_on="record_id",
        num_partitions=num_partitions,
    )
    return joined.rename_columns({c: f"{c}_b" for c in payload})
