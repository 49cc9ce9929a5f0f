"""Exact dedup by ``content_sha256`` — the cheapest clustering win.

Reference analogue: first-wins signature dedup
(``ner/build_standard_dataset.py:949-965`` ``seen_sequences``), made
deterministic under parallelism by replacing "first wins" with
"min(record_id) wins" (SURVEY.md §4 determinism note).

One ``groupby(content_sha256)`` shuffle. Output keeps EVERY row and adds
``rep_id`` (the group's min record_id); downstream:

- representatives (``record_id == rep_id``) feed blocking/scoring;
- duplicate edges (``record_id != rep_id`` → ``(record_id, rep_id)``)
  feed transitive clustering directly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from address_parser_ray.rayutil import project


def _tag_rep(group: pa.Table) -> pa.Table:
    rep = pc.min(group["record_id"]).as_py()
    return group.append_column("rep_id", pa.array([rep] * group.num_rows, type=pa.int64()))


def exact_dedup_stage(fingerprints):
    """fingerprints Dataset → same rows + ``rep_id`` column."""
    return fingerprints.groupby("content_sha256").map_groups(
        _tag_rep, batch_format="pyarrow"
    )


def representatives(deduped):
    return deduped.filter(expr="record_id == rep_id")


def duplicate_edges(deduped):
    """(src, dst) edges linking each duplicate to its representative."""
    return project(
        deduped.filter(expr="record_id != rep_id"),
        {"record_id": "src", "rep_id": "dst"},
    )
