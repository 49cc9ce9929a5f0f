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
    ID_DTYPE,
    decode_sig_column,
    id_hash64,
    ids_np,
    lsh_band_keys_batch,
    pack_ids,
    splitmix64,
)
from address_parser_ray.rayutil import (
    default_num_partitions,
    pinned_join,
)

_U64 = np.uint64


def emit_keys(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Plain-function form (stateless tasks over warm workers)."""
    return KeyEmitter(cfg)(batch)


def emit_keys_bucketed(
    batch: pa.Table,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    hot_ref=None,
    n_buckets: int = 8,
) -> pa.Table:
    """Single fused pass: emit keys, salt hot ones, add the shuffle
    bucket — so the exploded relation is built exactly once and never
    materialized whole."""
    t = KeyEmitter(cfg)(batch)
    if hot_ref is not None:
        t = _salt_fn(hot_ref, cfg.max_block_records)(t)
    k = np.asarray(t["block_key"]).astype(np.int64).view(_U64)
    b = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column("bucket", pa.array(b))


class KeyEmitter:
    """records → exploded (block_key, record_id) rows.

    slot 0 = exact (lang, basename) key; slots 1..bands = LSH bands —
    both folded into one 64-bit key space (band index mixed in). Band
    keys are computed batch-vectorized. Salting of hot keys happens in a
    separate pass AFTER hot-key counting, directly on the exploded rows,
    so keys are computed once, not twice.
    """

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        sigs = decode_sig_column(batch["minhash"], cfg.num_perm)
        n_slots = cfg.lsh_bands + (1 if cfg.exact_path_key else 0)
        keys = np.empty((n, n_slots), dtype=_U64)
        col = 0
        if cfg.exact_path_key:
            import hashlib

            # hash only the DISTINCT (lang, basename) combos per batch —
            # basenames repeat heavily (utils.py, mod_0.go, ...), so this
            # drops the per-row Python blake2b loop to a per-unique one
            combo = pc.binary_join_element_wise(
                "xk", batch["lang"], batch["basename"], "\x1f"
            )
            arr = np.asarray(combo.to_pandas(), dtype=object)
            uniq, inv = np.unique(arr, return_inverse=True)
            hu = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.blake2b(u.encode("utf-8"), digest_size=8).digest(),
                        "big",
                    )
                    for u in uniq
                ),
                dtype=_U64,
                count=len(uniq),
            )
            keys[:, 0] = hu[inv]
            col = 1
        keys[:, col:] = lsh_band_keys_batch(sigs, cfg.lsh_bands, cfg.lsh_rows)
        rids = ids_np(batch["record_id"])
        return pa.table(
            {
                "block_key": pa.array(keys.reshape(-1).view(np.int64)),
                "record_id": pack_ids(np.repeat(rids, n_slots)),
            }
        )


def _salt_fn(hot_ref, max_block_records: int):
    """Vectorized hot-key salting on exploded rows:
    key' = mix(key, hash(record_id) % n_salts). Cross-salt pairs within a
    hot key are deliberately dropped (the reference's candidate cap)."""

    def salt(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        if not hot:
            return t
        keys = np.asarray(t["block_key"]).astype(np.int64).view(_U64).copy()
        rids = id_hash64(ids_np(t["record_id"]))
        old = np.seterr(over="ignore")
        try:
            n_salts = np.array([hot.get(int(k), 0) for k in keys], dtype=np.int64)
            mask = n_salts > 0
            if mask.any():
                salts = (
                    splitmix64(rids[mask]) % n_salts[mask].astype(np.uint64)
                ).astype(_U64)
                keys[mask] = splitmix64(
                    keys[mask] * _U64(0x9E3779B97F4A7C15) + salts + _U64(1)
                )
        finally:
            np.seterr(**old)
        return pa.table(
            {
                "block_key": pa.array(keys.view(np.int64)),
                "record_id": t["record_id"],
            }
        )

    return salt


_HOT_SAMPLE_RATE = 16  # keep 1/16 of exploded rows for hot-key detection


#: sampled-row count at or below which the per-batch partial counts are
#: pulled to the driver and merged with one np pass (8 B key + 8 B count
#: per partial row → ≤~320 MB at the gate); above it, the distributed
#: groupby path runs. The probe only ever sees 1/16 of the exploded rows.
DRIVER_PROBE_MAX_ROWS = 20_000_000


def find_hot_keys(exploded, cfg: PipelineConfig) -> dict[int, int]:
    """Approximate hot-key detection by deterministic hash sampling.

    Exact counting of EVERY key is an all-to-all over O(corpus) distinct
    keys — pointless when only the hot tail matters. A 1/16 hash sample
    of (record_id) rows is counted instead; a key whose sampled count
    exceeds cap/(2·rate) is declared hot with estimated true count
    sampled·rate. Deterministic (hash-of-record sample, no RNG), so N-
    and 4N-cpu runs salt identically. Over-salting a borderline key only
    splits its candidate pairs — the same bounded-recall trade the
    reference makes with its candidate caps (inexus_parser.py:114).

    The per-batch PARTIAL counts (a few distinct keys per batch) merge on
    the driver below ``DRIVER_PROBE_MAX_ROWS`` — one np pass instead of a
    full sort shuffle whose fixed cost dwarfs the 5-key answer; above the
    gate the distributed groupby takes over (identical output)."""
    rate = _HOT_SAMPLE_RATE
    thresh = max(1, cfg.max_block_records // (2 * rate))

    def sample(t: pa.Table) -> pa.Table:
        counts = (
            pa.table({"block_key": t["block_key"]})
            .group_by("block_key")
            .aggregate([("block_key", "count")])
        )
        return counts.rename_columns(["block_key", "n"])

    partial = exploded.map_batches(sample, batch_format="pyarrow").materialize()

    out: dict[int, int] = {}
    if partial.count() <= DRIVER_PROBE_MAX_ROWS:
        keys_parts, n_parts = [], []
        for b in partial.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            keys_parts.append(np.asarray(b["block_key"]).astype(np.int64))
            n_parts.append(np.asarray(b["n"]).astype(np.int64))
        if not keys_parts:
            return out
        keys = np.concatenate(keys_parts)
        ns = np.concatenate(n_parts)
        order = np.argsort(keys, kind="stable")
        keys, ns = keys[order], ns[order]
        first = np.concatenate([[True], keys[1:] != keys[:-1]])
        starts = np.flatnonzero(first)
        totals = np.add.reduceat(ns, starts)
        hot_mask = totals > thresh
        for k, n in zip(keys[starts][hot_mask], totals[hot_mask]):
            est = int(n) * rate
            out[int(_U64(np.int64(k)))] = max(
                2, int(-(-est // cfg.max_block_records))
            )
        return out

    from ray.data.aggregate import Sum

    totals = partial.groupby("block_key").aggregate(Sum("n", alias_name="n"))
    hot = totals.filter(expr=f"n > {thresh}")
    for row in hot.iter_rows():
        est = row["n"] * rate
        out[int(_U64(np.int64(row["block_key"])))] = max(
            2, int(-(-est // cfg.max_block_records))
        )
    return out


def probe_hot_keys(key_input, cfg: PipelineConfig) -> dict[int, int]:
    """Hot-key map from a 1/16 deterministic hash-sample of the records
    (an extra key emission over the SAMPLE only). Split out of
    :func:`blocking_stage` so a checkpointing run can persist the map
    next to the band index it salted."""

    def sample_records(t: pa.Table) -> pa.Table:
        rid = id_hash64(ids_np(t["record_id"]))
        mask = (splitmix64(rid + _U64(0xA5A5A5A5)) % _U64(_HOT_SAMPLE_RATE)) == 0
        return t.filter(pa.array(mask))

    probe = key_input.map_batches(
        sample_records, batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(
        emit_keys, fn_kwargs={"cfg": cfg}, batch_format="pyarrow", batch_size=1024
    )
    return find_hot_keys(probe, cfg)


_PAIR_SCHEMA = pa.schema([("id_a", pa.binary()), ("id_b", pa.binary())])
# pair-gen → dedup interchange: n_hits = how many block keys produced the
# pair within one bucket (summed across buckets in the dedup pass)
_PAIR_HITS_SCHEMA = pa.schema(
    [("id_a", pa.binary()), ("id_b", pa.binary()), ("n_hits", pa.int64())]
)


def _make_pairs_bucket_fn(max_pairs: int):
    """Per-BUCKET pair generation (a bucket holds many block keys).

    ``groupby(block_key).map_groups`` costs one Python call per distinct
    key — ~33 keys/record makes that millions of tiny calls. Instead keys
    are hash-bucketed, and within a bucket the runs of each key are
    processed with run-length encoding + one vectorized triu expansion
    per distinct run LENGTH (≤ max_block_records distinct lengths, since
    salting caps block size). Deterministic: rows sorted by (key, id),
    pair order lexicographic, truncation at max_pairs per block.
    """

    def make_pairs(group: pa.Table) -> pa.Table:
        keys = np.asarray(group["block_key"]).astype(np.int64)
        ids = ids_np(group["record_id"])
        # sort on big-endian u64 half views, not the 'S16' strings —
        # integer lexsort is ~4x faster than byte-string comparison
        # sorts at this volume and yields the SAME (key, id-bytes) order
        idm = np.frombuffer(np.ascontiguousarray(ids).tobytes(), dtype=">u8")
        idm = idm.reshape(-1, 2)
        order = np.lexsort((idm[:, 1], idm[:, 0], keys))
        keys, ids = keys[order], ids[order]
        if keys.size < 2:
            return _PAIR_HITS_SCHEMA.empty_table()
        change = np.flatnonzero(np.diff(keys)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [keys.size]]))
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2:
                continue
            sel = starts[lens == m]
            mat = ids[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            if iu.size > max_pairs:
                iu, ju = iu[:max_pairs], ju[:max_pairs]
            out_a.append(mat[:, iu].ravel())
            out_b.append(mat[:, ju].ravel())
        if not out_a:
            return _PAIR_HITS_SCHEMA.empty_table()
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # within-bucket dedup (the same pair can arise from several keys
        # in this bucket) — multiplicity kept as n_hits for conjunctive
        # blocking; cross-bucket dedup sums it downstream. Pairs pack as
        # 32-byte strings (a||b) so np.unique runs on a flat 1-D array.
        pair = np.frombuffer(
            np.ascontiguousarray(np.stack([a, b], axis=1)).tobytes(), dtype="S32"
        )
        uniq, counts = np.unique(pair, return_counts=True)
        um = np.frombuffer(
            np.ascontiguousarray(uniq).tobytes(), dtype=ID_DTYPE
        ).reshape(-1, 2)
        return pa.table(
            {
                "id_a": pack_ids(um[:, 0]),
                "id_b": pack_ids(um[:, 1]),
                "n_hits": pa.array(counts.astype(np.int64)),
            }
        )

    return make_pairs


def _dedup_pairs_bucket_fn(min_hits: int):
    """Vectorized cross-bucket pair dedup (bucketed by hash(id_a,id_b)).
    Sums per-bucket key-hit counts and applies the conjunctive
    ``min_band_hits`` filter (D6) — with min_hits=1 this is the plain
    disjunctive dedup."""

    def dedup(group: pa.Table) -> pa.Table:
        a = ids_np(group["id_a"])
        b = ids_np(group["id_b"])
        if a.size == 0:
            return _PAIR_SCHEMA.empty_table()
        pair = np.frombuffer(
            np.ascontiguousarray(np.stack([a, b], axis=1)).tobytes(), dtype="S32"
        )
        uniq, inv = np.unique(pair, return_inverse=True)
        if min_hits > 1:
            hits = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(hits, inv, np.asarray(group["n_hits"]).astype(np.int64))
            uniq = uniq[hits >= min_hits]
        um = np.frombuffer(
            np.ascontiguousarray(uniq).tobytes(), dtype=ID_DTYPE
        ).reshape(-1, 2)
        return pa.table({"id_a": pack_ids(um[:, 0]), "id_b": pack_ids(um[:, 1])})

    return dedup


def blocking_stage(
    reps,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    hot_keys: dict | None = None,
    precomputed_hot: bool = False,
):
    """representatives Dataset → unique candidate pairs (id_a < id_b).

    Hot keys are estimated from a 1/16 hash-sample of the RECORDS (a
    cheap extra key-emission over the sample), then the full exploded
    relation is built in ONE fused streaming pass (emit → salt → bucket)
    straight into the pair-generation shuffle — it is never materialized
    whole. Pass ``hot_keys={}`` with ``precomputed_hot=True`` to skip the
    probe (tests / known-cold corpora).
    """
    light_cols = ["record_id", "minhash", "lang", "basename"]
    key_input = reps.select_columns(light_cols)

    if not precomputed_hot and hot_keys is None:
        hot_keys = probe_hot_keys(key_input, cfg)

    hot_ref = ray.put(hot_keys or {})
    n_buckets = default_num_partitions()

    exploded = key_input.map_batches(
        emit_keys_bucketed,
        fn_kwargs={"cfg": cfg, "hot_ref": hot_ref, "n_buckets": n_buckets},
        batch_format="pyarrow",
        batch_size=1024,
        zero_copy_batch=True,
    )
    return pairs_from_exploded(exploded, cfg, n_buckets=n_buckets)


def add_key_bucket(t: pa.Table, n_buckets: int) -> pa.Table:
    """Attach the deterministic shuffle bucket to exploded
    (block_key, record_id) rows — hash of the key only, so the SAME key
    lands in the same bucket regardless of which run emitted it (the
    property the incremental band-index probe relies on)."""
    k = np.asarray(t["block_key"]).astype(np.int64).view(_U64)
    b = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int64)
    return t.append_column("bucket", pa.array(b))


def pairs_from_exploded(
    exploded,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    n_buckets: int | None = None,
):
    """Exploded salted (block_key, record_id[, bucket]) rows → unique
    candidate pairs (id_a < id_b). The second half of
    :func:`blocking_stage`, split out so the incremental path can feed
    it a UNION of the persisted band index's probed rows and the new
    batch's freshly emitted keys. Adds the bucket column when absent
    (bucket is a pure key hash, so union-of-runs buckets consistently)."""
    n_buckets = n_buckets or default_num_partitions()
    if "bucket" not in exploded.schema().names:
        exploded = exploded.map_batches(
            add_key_bucket,
            fn_kwargs={"n_buckets": n_buckets},
            batch_format="pyarrow",
            zero_copy_batch=True,
        )

    from address_parser_ray.rayutil import task_shuffle_groupby

    # raw-task hash shuffle: the bucket ids are already hash buckets, so
    # Ray 2.49's sort-based map_groups would pay a pointless comparison
    # sort + pivot sampling on the exploded relation (the largest
    # intermediate in the pipeline). APR_BUCKET_SHUFFLE=sort restores it.
    pairs = task_shuffle_groupby(
        exploded,
        "bucket",
        _make_pairs_bucket_fn(cfg.max_pairs_per_block),
        n_buckets,
        empty_result=_PAIR_HITS_SCHEMA.empty_table(),
    )

    # a pair found by several bands/keys survives once
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = id_hash64(ids_np(t["id_a"]))
        b = id_hash64(ids_np(t["id_b"]))
        old = np.seterr(over="ignore")
        try:
            pb = (splitmix64(a * np.uint64(0x9E3779B97F4A7C15) + b) % np.uint64(n_buckets)).astype(np.int64)
        finally:
            np.seterr(**old)
        return t.append_column("bucket", pa.array(pb))

    return task_shuffle_groupby(
        pairs.map_batches(add_pair_bucket, batch_format="pyarrow"),
        "bucket",
        _dedup_pairs_bucket_fn(cfg.min_band_hits),
        n_buckets,
        empty_result=_PAIR_SCHEMA.empty_table(),
    )


def exploded_index(reps, cfg: PipelineConfig = DEFAULT_CONFIG, *, hot_keys: dict):
    """Salted exploded (block_key, record_id) relation WITHOUT the
    bucket column — the persistable band index (SURVEY §4's posting-list
    shape; reference analogue: the prebuilt inverted n-gram index reused
    across calls, ``fuzz/inexus_parser.py:886-889``). A full run
    checkpoints this table (16 B/row) so a later increment probes it by
    key instead of re-emitting bands over every old sketch."""
    hot_ref = ray.put(hot_keys or {})
    light_cols = ["record_id", "minhash", "lang", "basename"]

    def emit_salted(t: pa.Table) -> pa.Table:
        out = KeyEmitter(cfg)(t)
        return _salt_fn(hot_ref, cfg.max_block_records)(out)

    return reps.select_columns(light_cols).map_batches(
        emit_salted, batch_format="pyarrow", batch_size=1024, zero_copy_batch=True
    )


def _reduce_feats(cfg: PipelineConfig):
    """Compact per-record features for pair scoring: signatures narrowed
    to 32-bit lanes (equality-comparison MinHash loses nothing material —
    cross-lane collision adds ~2^-32 bias) and the sha to an 8-byte
    prefix int. Halves the bytes shuffled per pair side."""

    def fn(t: pa.Table) -> pa.Table:
        n = t.num_rows
        mh = decode_sig_column(t["minhash"], cfg.num_perm)[:, : cfg.score_char_lanes]
        tmh = decode_sig_column(t["token_minhash"], cfg.token_num_perm)[
            :, : cfg.score_token_lanes
        ]
        fmh = decode_sig_column(t["fine_minhash"], cfg.num_perm)[
            :, : cfg.score_char_lanes
        ]
        # 16-bit equality lanes: per-lane random collision (2^-16) adds
        # +1.5e-5 to the Jaccard estimate — unmeasurable; payload halves.
        mh16 = np.ascontiguousarray((mh & np.uint64(0xFFFF)).astype(np.uint16))
        tmh16 = np.ascontiguousarray((tmh & np.uint64(0xFFFF)).astype(np.uint16))
        fmh16 = np.ascontiguousarray((fmh & np.uint64(0xFFFF)).astype(np.uint16))
        sha = t["content_sha256"].to_pylist()
        sha64 = np.array(
            [int(s[:16], 16) - (1 << 63) if s else 0 for s in sha], dtype=np.int64
        )
        return pa.table(
            {
                "record_id": t["record_id"],
                "sha64": pa.array(sha64),
                "path": t["path"],
                "lang": t["lang"],
                "n_chars": t["n_chars"],
                "mh_sk": pa.array([mh16[i].tobytes() for i in range(n)], type=pa.binary()),
                "tmh_sk": pa.array(
                    [tmh16[i].tobytes() for i in range(n)], type=pa.binary()
                ),
                "fmh_sk": pa.array(
                    [fmh16[i].tobytes() for i in range(n)], type=pa.binary()
                ),
            }
        )

    return fn


def attach_features(pairs, reps, cfg: PipelineConfig = DEFAULT_CONFIG,
                    num_partitions: int | None = None):
    """Join each side's compact sketches onto the unique pairs (two
    bucketed hash joins on the reduced features table — cheaper than
    exploding signatures ~33× per record through the blocking shuffle)."""
    feat_cols = [
        "record_id", "sha64", "path", "lang", "n_chars", "mh_sk", "tmh_sk", "fmh_sk"
    ]
    num_partitions = default_num_partitions(num_partitions)
    payload = [c for c in feat_cols if c != "record_id"]
    feats = reps.map_batches(
        _reduce_feats(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
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
