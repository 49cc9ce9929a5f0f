"""Small Ray Data utilities shared by the stages.

Why a hand-rolled join
----------------------
Ray 2.49's native ``Dataset.join`` operator showed three failure modes
in this engine's shapes (all reproduced in tests/scratch):

1. two lazy joins composed in ONE streaming execution deadlock (each
   join's partition-aggregator actor pool holds resources waiting on the
   other);
2. a hash partition fed ONLY schema-less empty blocks fails inside
   ``HashShuffleAggregator.finalize`` ("No match for key field ...");
3. ``map_batches`` does not invoke the UDF on empty blocks and emits
   NEW schema-less empties — so any projection upstream of a join can
   poison it.

``pinned_join`` therefore implements the classic partitioned reduce-side
hash join out of primitives that ARE robust here: tag each side, union,
``groupby(bucket)``, and run an in-process ``pyarrow.Table.join`` per
bucket (vectorized acero, no Ray join operator). This is exactly the
"portable pattern" the Ray guide recommends for explicit partitioned
joins, and it scales the same way: one shuffle of each side by
``hash(key) % num_partitions``.

Keys must be integer-typed (all engine keys are int64 record ids /
codes); hot keys hash to one bucket — same skew behavior as any hash
join, so salt upstream where needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from address_parser_ray.functions.hashing import splitmix64


def default_concurrency(requested=None):
    """Actor-pool size for stateful stages: a FIXED pool of #CPUs actors
    unless the config pins something. Measured on Ray 2.49: the
    autoscaling (1, max) pool ramps up so lazily that a 16 s fingerprint
    stage ran effectively single-actor at 32 CPUs — a fixed pool spawns
    upfront (cold start amortized by any warmup) and actually scales."""
    if requested is not None:
        return requested
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    # leave ~1/4 of the CPUs for the read/shuffle/write operators that
    # share the execution — a pool reserving every CPU deadlocks the
    # streaming executor (observed at num_cpus=4: shuffle tasks starve).
    return max(2, cpus - max(1, cpus // 4))


def clamped_pool(pool, ds):
    """Clamp an actor-pool size to the input's known block count.

    On fixture-scale inputs a pool floor above the block count makes Ray
    warn (``min concurrent actors ... received N input blocks``) and
    spawn actors that never see a batch. For a MATERIALIZED input the
    block count is free; for a checkpoint read the part-file count is a
    lower bound (splits only raise it — under-clamping just lets the
    autoscaler ramp). Lazy inputs pass through unchanged."""
    nb = None
    try:
        import ray.data

        if isinstance(ds, ray.data.dataset.MaterializedDataset):
            nb = ds.num_blocks()
        else:
            files = ds.input_files()
            nb = len(files) if files else None
    except Exception:
        return pool
    if not isinstance(nb, int) or nb <= 0:
        return pool
    if isinstance(pool, tuple):
        lo, hi = pool
        return (max(1, min(lo, nb)), hi)
    if nb < pool:
        return (max(1, nb), pool)
    return pool


def task_shuffle_groupby(
    ds, bucket_col: str, fn, n_buckets: int, empty_result: pa.Table | None = None
):
    """Hash-shuffle + per-bucket apply WITHOUT Ray's sort machinery —
    the classic two-phase map-reduce shuffle in raw Ray tasks.

    Ray 2.49's ``groupby(k).map_groups`` range-sorts the whole dataset
    to co-locate groups — an avoidable comparison sort when the key is
    already a hash bucket in [0, n_buckets).  Here each input block is
    SPLIT once by bucket (one stable argsort of small ints per block,
    O(rows) slicing), the per-bucket slices flow to one reduce task per
    bucket (concat + ``fn``), and the reduced tables come back as a
    Dataset via ``from_arrow_refs`` — no comparison sort, no pivot
    sampling, map-side parallelism = input blocks, reduce-side =
    n_buckets.  Every intermediate is an object-store table; the driver
    holds only refs.

    ``fn`` must not depend on row order within its bucket (both blocking
    bucket fns sort internally).  ``empty_result``: zero-row table
    returned for buckets whose every part is one of Ray 2.49's
    SCHEMA-LESS empty blocks (map_batches skips empty blocks and emits
    new schema-less empties — the same poisoning ``pinned_join`` works
    around); callers pass their output schema's empty table.  Falls
    back to the sort-based ``groupby().map_groups`` via env
    ``APR_BUCKET_SHUFFLE=sort``.
    """
    import os

    import ray
    import ray.data

    if os.environ.get("APR_BUCKET_SHUFFLE", "tasks") == "sort":
        return ds.groupby(bucket_col).map_groups(fn, batch_format="pyarrow")

    @ray.remote(num_returns=n_buckets)
    def split_block(tbl: pa.Table):
        if tbl.num_rows == 0 or bucket_col not in tbl.column_names:
            out = [pa.table({})] * n_buckets
        else:
            b = np.asarray(tbl[bucket_col], dtype=np.int64)
            order = np.argsort(b, kind="stable")
            srt = tbl.take(pa.array(order))
            bs = b[order]
            cuts = np.searchsorted(
                bs, np.arange(n_buckets + 1, dtype=np.int64)
            )
            out = [srt.slice(int(cuts[i]), int(cuts[i + 1] - cuts[i]))
                   for i in range(n_buckets)]
        return out[0] if n_buckets == 1 else tuple(out)

    @ray.remote
    def reduce_bucket(*parts):
        keep = [p for p in parts if p.num_columns and p.num_rows]
        if keep:
            return fn(pa.concat_tables(keep).combine_chunks())
        typed = [p for p in parts if p.num_columns]
        if typed:
            return fn(typed[0])
        if empty_result is not None:
            return empty_result
        return pa.table({})

    block_refs = ds.to_arrow_refs()
    if not block_refs:
        return ds.map_batches(fn, batch_format="pyarrow")
    per_block = [split_block.remote(r) for r in block_refs]
    if n_buckets == 1:
        per_block = [[r] for r in per_block]
    reduced = [
        reduce_bucket.remote(*(per_block[j][i] for j in range(len(per_block))))
        for i in range(n_buckets)
    ]
    return ray.data.from_arrow_refs(reduced)


def default_num_partitions(requested=None) -> int:
    """Shuffle/bucket fan-out: one bucket per CPU (min 8). At 8 CPUs a
    fixed 32 starves nothing but a fixed 8 caps a 32-CPU run at 8-way
    parallelism for the per-bucket stages."""
    if requested is not None:
        return requested
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(8, cpus)


def partitions_for(n_rows: int, target_rows: int = 5000, requested=None) -> int:
    """Bucket fan-out sized to the DATA, bounded by the CPU-scaled
    default: per-bucket shuffle overhead dominates when buckets hold
    only hundreds of rows, and a row-count cap throttles big machines."""
    if requested is not None:
        return requested
    return min(default_num_partitions(), max(4, n_rows // target_rows + 1))


def project(ds, mapping: dict[str, str]):
    """Project + rename in ONE vectorized Arrow op: ``{old: new}``.

    Exists because ``select_columns(...).rename_columns([...])`` trips an
    unreliable eager schema check in Ray 2.49 when lazy ops (filter,
    rename) sit upstream — rename validates against the pre-projection
    schema. Column references are zero-copy, so this costs nothing.
    """

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({new: t[old] for old, new in mapping.items()})

    return ds.map_batches(fn, batch_format="pyarrow")


def ensure_schema(ds, schema: pa.Schema):
    """Force non-empty blocks to ``schema`` (column order + types).
    NOTE: empty blocks pass through untouched — Ray's map_batches never
    invokes the UDF on them (see module docstring, failure mode 3)."""

    def fn(t: pa.Table) -> pa.Table:
        if t.num_columns == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)

    return ds.map_batches(fn, batch_format="pyarrow")


def evolve_schema(ds, schema: pa.Schema):
    """SCHEMA-EVOLUTION projection: project every block to ``schema`` —
    missing columns null-filled, extra columns dropped, types cast
    (int widening etc.).  The read-side half of schema evolution for a
    long-lived dataset whose early files predate a column: a 100 TB
    corpus is never rewritten when a field is added, the reader
    reconciles.  ``ensure_schema`` (above) is the strict variant that
    requires every column present."""

    def fn(t: pa.Table) -> pa.Table:
        cols = {}
        for f in schema:
            if f.name in t.column_names:
                cols[f.name] = t[f.name].cast(f.type)
            else:
                cols[f.name] = pa.nulls(t.num_rows, f.type)
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")


def unified_parquet_schema(path: str) -> pa.Schema:
    """Union of the field sets across every ``*.parquet`` footer in a
    directory (first occurrence pins a field's type; later files may
    add fields but not silently change types — a changed type raises).
    Footer reads are metadata-only — no row data is touched."""
    import os

    import pyarrow.parquet as pq

    fields: dict[str, pa.Field] = {}
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".parquet"):
            continue
        sch = pq.read_schema(os.path.join(path, fname))
        for f in sch:
            prev = fields.get(f.name)
            if prev is None:
                fields[f.name] = f
            elif prev.type != f.type and not pa.types.is_null(f.type):
                raise ValueError(
                    f"schema evolution conflict on column '{f.name}': "
                    f"{prev.type} vs {f.type} — widen explicitly"
                )
    return pa.schema(list(fields.values()))


def read_parquet_evolving(path: str, **kwargs):
    """Read a parquet directory whose files were written under EVOLVING
    schemas (columns added over time): derives the unified schema from
    the footers, reads each homogeneous file, and projects every block
    to the union (missing columns null-filled).  Per-file reads keep
    each ``read_parquet`` schema-homogeneous — Ray 2.49 rejects mixed
    schemas inside one read — and ``union`` streams them."""
    import os

    import ray.data

    schema = unified_parquet_schema(path)
    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    # group files by their exact footer schema so each read is
    # homogeneous; one read per schema generation, not per file
    import pyarrow.parquet as pq

    by_schema: dict[str, list[str]] = {}
    for f in files:
        key = str(pq.read_schema(f))
        by_schema.setdefault(key, []).append(f)
    parts = [
        evolve_schema(ray.data.read_parquet(group, **kwargs), schema)
        for group in by_schema.values()
    ]
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _arrow_schema(ds) -> pa.Schema:
    """ray.data.Schema → pyarrow.Schema (ray wraps the arrow schema)."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _bucket_of(key_arr: pa.Array, num_partitions: int) -> pa.Array:
    if pa.types.is_binary(key_arr.type) or pa.types.is_large_binary(key_arr.type):
        # 128-bit record-id keys (16-byte blake2b): route on a u64 fold
        # of BOTH halves so an id-prefix collision cannot co-bucket
        # distinct records by construction
        from address_parser_ray.functions.hashing import id_hash64, ids_np

        k = id_hash64(ids_np(key_arr))
    else:
        k = np.asarray(key_arr.cast(pa.int64())).astype(np.uint64)
    b = (splitmix64(k) % np.uint64(num_partitions)).astype(np.int64)
    return pa.array(b)


def _join_key(col):
    """Normalized join-key column: ints widen to int64; binary (128-bit
    ids) pass through native — acero hash joins support binary keys."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        return arr
    return arr.cast(pa.int64())


def pinned_join(
    left,
    right,
    *,
    on: str,
    right_on: str | None = None,
    num_partitions: int = 8,
    join_type: str = "inner",
    left_suffix: str | None = None,
    right_suffix: str | None = "_r",
):
    """Partitioned reduce-side hash join (see module docstring).

    Column semantics match the native operator as verified earlier: the
    output keeps the LEFT key column name; the right key is dropped;
    non-key name collisions get ``right_suffix`` on the right column.
    Keys are integer OR binary (128-bit record id) columns. Output is
    lazy (composes freely).

    ``join_type="left anti"`` keeps left rows whose key has NO match on
    the right; only the right KEYS travel through the shuffle (payload
    dropped at the tag stage), so the anti side is as light as a
    semi-join filter.

    ``join_type="full outer"`` keeps unmatched rows from BOTH sides
    (missing side null-filled) — per-bucket Arrow full-outer joins are
    exactly the global full outer because both sides hash on the same
    key, so no key can match across buckets.
    """
    if join_type not in ("inner", "left anti", "full outer"):
        raise NotImplementedError(
            "only inner / left-anti / full-outer joins are used"
        )
    anti = join_type == "left anti"
    fullo = join_type == "full outer"
    right_on = right_on or on
    ls, rs = _arrow_schema(left), _arrow_schema(right)
    lpay = [c for c in ls.names if c != on]
    rpay = [] if anti else [c for c in rs.names if c != right_on]
    # resolve right-side collisions with the suffix (left wins its names)
    ren = {
        c: c + (right_suffix or "_r") if (c in lpay or c == on) else c for c in rpay
    }
    out_schema = pa.schema(
        [(on, ls.field(on).type)]
        + [(c, ls.field(c).type) for c in lpay]
        + [(ren[c], rs.field(c).type) for c in rpay]
    )

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "__bucket": _bucket_of(
                t[on].combine_chunks() if isinstance(t[on], pa.ChunkedArray) else t[on],
                num_partitions,
            ),
            "__key": _join_key(t[on]),
            "__side": pa.array(np.zeros(n, dtype=np.int8)),
        }
        for c in lpay:
            cols["l." + c] = t[c]
        for c in rpay:
            cols["r." + ren[c]] = pa.nulls(n, rs.field(c).type)
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "__bucket": _bucket_of(
                t[right_on].combine_chunks()
                if isinstance(t[right_on], pa.ChunkedArray)
                else t[right_on],
                num_partitions,
            ),
            "__key": _join_key(t[right_on]),
            "__side": pa.array(np.ones(n, dtype=np.int8)),
        }
        for c in lpay:
            cols["l." + c] = pa.nulls(n, ls.field(c).type)
        for c in rpay:
            cols["r." + ren[c]] = t[c]
        return pa.table(cols)

    tagged = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    key_type = ls.field(on).type

    def join_bucket(g: pa.Table) -> pa.Table:
        side = np.asarray(g["__side"])
        lmask = side == 0
        if not fullo and (not lmask.any() or (lmask.all() and not anti)):
            return out_schema.empty_table()
        lt_rows = g.filter(pa.array(lmask))
        rt_rows = g.filter(pa.array(~lmask))
        lt = pa.table(
            {"__key": lt_rows["__key"], **{c: lt_rows["l." + c] for c in lpay}}
        )
        rt = pa.table(
            {"__key": rt_rows["__key"], **{ren[c]: rt_rows["r." + ren[c]] for c in rpay}}
        )
        jt = "left anti" if anti else ("full outer" if fullo else "inner")
        j = lt.join(rt, keys=["__key"], join_type=jt)
        cols = {on: j["__key"].cast(key_type)}
        for c in lpay:
            cols[c] = j[c]
        for c in rpay:
            cols[ren[c]] = j[ren[c]]
        return pa.table(cols).cast(out_schema)

    return tagged.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")
