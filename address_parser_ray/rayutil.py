"""Small Ray Data utilities shared by the stages.

``pinned_join`` exists because of an execution-engine constraint observed
on Ray 2.49: two hash-``join`` operators composed lazily in ONE streaming
execution can deadlock (each join's partition-aggregator actor pool holds
resources while waiting on the other). Materializing each join's output
bounds every execution graph to a single join operator. At cluster scale
the equivalent is checkpointing between wide ops — which the pipeline's
Checkpointer does anyway.
"""

from __future__ import annotations

import pyarrow as pa


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
    """Inner hash join, immediately materialized (see module docstring).

    Column semantics (verified on Ray 2.49): the output keeps the LEFT
    key column name; the right key column is dropped; non-key name
    collisions get the suffixes.
    """
    j = left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,) if right_on else None,
        left_suffix=left_suffix,
        right_suffix=right_suffix,
    )
    return j.materialize()
