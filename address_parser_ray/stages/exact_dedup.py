"""Exact dedup by ``content_sha256`` — the cheapest clustering win.

Reference analogue: first-wins signature dedup
(``ner/build_standard_dataset.py:949-965`` ``seen_sequences``), made
deterministic under parallelism by replacing "first wins" with
"min (rep_key, record_id) wins" — rep_key = md5 of the natural key
(repo, path), a pure function of record identity that the DuckDB
oracles recompute (blake2b record-id order is not SQL-expressible;
round 4 made rep election engine-independent after sf0.1 exposed
same-sha groups whose members carry different lang metadata, where the
rep's lang feeds the P4 scorer rule).

One ``groupby(content_sha256)`` shuffle. Output keeps EVERY row and adds
``rep_id`` (the group's min 128-bit record_id); downstream:

- representatives (``record_id == rep_id``) feed blocking/scoring;
- duplicate edges (``record_id != rep_id`` → ``(record_id, rep_id)``)
  feed transitive clustering directly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from address_parser_ray.functions.hashing import ids_np, pack_ids
from address_parser_ray.rayutil import default_num_partitions, project


def _sha_bucket(col, n_buckets: int) -> np.ndarray:
    """Vectorized shuffle bucket from the first 8 hex chars of each sha
    (== int(s[:8], 16) % n_buckets). Reads the Arrow string data buffer
    directly when every value is 64-char hex (the sha256_hex invariant);
    falls back to the per-row parse for nulls/odd shapes."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if arr.null_count == 0:
        offsets = np.frombuffer(
            arr.buffers()[1], dtype=np.int32, count=n + 1, offset=arr.offset * 4
        )
        if ((offsets[1:] - offsets[:-1]) == 64).all():
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            ch = data[offsets[:-1, None] + np.arange(8)[None, :]]
            nib = np.where(ch >= 97, ch - 87, ch - 48).astype(np.uint64)
            val = np.zeros(n, dtype=np.uint64)
            for k in range(8):
                val = (val << np.uint64(4)) | nib[:, k]
            return (val % np.uint64(n_buckets)).astype(np.int64)
    sha = arr.to_pylist()
    return np.array(
        [int(s[:8], 16) % n_buckets if s else 0 for s in sha], dtype=np.int64
    )


def _tag_reps_bucket(group: pa.Table) -> pa.Table:
    """Vectorized rep-tagging for one hash bucket of sha groups: sort by
    (sha, rep_key, record_id), first of each run becomes the run's rep.
    One Python call per BUCKET, not per sha (a per-group ``map_groups``
    costs one call per distinct content hash — millions at scale)."""
    idx = pc.sort_indices(
        group,
        sort_keys=[
            ("content_sha256", "ascending"),
            ("rep_key", "ascending"),
            ("record_id", "ascending"),
        ],
    )
    g = group.take(idx)
    if "bucket" in g.column_names:
        g = g.drop(["bucket"])
    sha = np.asarray(g["content_sha256"].cast(pa.large_string()).combine_chunks())
    ids = ids_np(g["record_id"])
    if len(sha) == 0:
        return g.append_column("rep_id", pa.array([], type=pa.binary()))
    new_run = np.concatenate([[True], sha[1:] != sha[:-1]])
    run_id = np.cumsum(new_run) - 1
    rep = ids[new_run][run_id]  # first (= min rep_key) of each run
    return g.append_column("rep_id", pack_ids(rep))


def _dup_pairs_bucket(group: pa.Table) -> pa.Table:
    """Bucket of (record_id, content_sha256) rows → ONLY the duplicate
    rows as (record_id, rep_id). Vectorized run-length over sorted sha."""
    tagged = _tag_reps_bucket(group)
    mask = pc.not_equal(tagged["record_id"], tagged["rep_id"])
    out = tagged.filter(mask)
    return pa.table({"record_id": out["record_id"], "rep_id": out["rep_id"]})


def exact_dedup_stage(fingerprints, num_partitions: int | None = None,
                      broadcast_max_dups: int = 5_000_000):
    """fingerprints Dataset → same rows + ``rep_id`` column.

    Two-phase to keep the wide signature columns OUT of the shuffle:
    (1) a LIGHT (record_id, sha, rep_key) projection is bucketed by sha
    prefix and rep-tagged (rep = min ``(rep_key, record_id)`` per sha,
    where rep_key = md5(repo, path) — the engine-independent,
    SQL-recomputable "first wins" election of round 4; see
    ``_tag_reps_bucket`` and ``ner/build_standard_dataset.py:949-965``);
    only the DUPLICATE rows come back.
    (2) below ``broadcast_max_dups`` the dup→rep map broadcasts via
    ``ray.put`` and rep_id is attached with a per-batch dict lookup (no
    shuffle of the 1.5 KB/row fingerprint table at all); above it, the
    full bucketed shuffle of the fingerprint table takes over."""
    import ray

    n_buckets = default_num_partitions(num_partitions)

    def add_bucket_light(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "record_id": t["record_id"],
                "content_sha256": t["content_sha256"],
                "rep_key": t["rep_key"],
                "bucket": pa.array(_sha_bucket(t["content_sha256"], n_buckets)),
            }
        )

    dup_pairs = (
        fingerprints.select_columns(["record_id", "content_sha256", "rep_key"])
        .map_batches(add_bucket_light, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dup_pairs_bucket, batch_format="pyarrow")
        .materialize()
    )
    n_dups = dup_pairs.count()

    if n_dups <= broadcast_max_dups:
        dmap: dict[bytes, bytes] = {}
        for b in dup_pairs.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            # Arrow to_pylist keeps full 16-byte values (numpy .tolist()
            # would strip trailing NULs — never use it on id columns)
            dmap.update(zip(b["record_id"].to_pylist(), b["rep_id"].to_pylist()))
        dref = ray.put(dmap)

        def attach_rep(t: pa.Table) -> pa.Table:
            m = ray.get(dref)
            ids = t["record_id"].to_pylist()
            rep = [m.get(i, i) for i in ids] if m else ids
            return t.append_column("rep_id", pa.array(rep, type=pa.binary()))

        return fingerprints.map_batches(attach_rep, batch_format="pyarrow")

    # large-dup fallback: full bucketed shuffle of the fingerprint table
    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pa.array(_sha_bucket(t["content_sha256"], n_buckets))
        )

    return (
        fingerprints.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_tag_reps_bucket, batch_format="pyarrow")
    )


def representatives(deduped):
    return deduped.filter(expr="record_id == rep_id")


def duplicate_edges(deduped):
    """(src, dst) edges linking each duplicate to its representative."""
    return project(
        deduped.filter(expr="record_id != rep_id"),
        {"record_id": "src", "rep_id": "dst"},
    )
