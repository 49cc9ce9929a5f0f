"""Stage 3 — transitive clustering: distributed connected components.

The reference's analogue is the old→new ward mapping closure — membership
edges of entity clusters resolved through hash lookups
(``fuzz/inexus_parser.py:1121-1190, 1355-1443``). At corpus scale the
cluster edges are *produced* by the match stage, and the transitive
closure runs as iterated shuffles.

Algorithm: min-label propagation with pointer jumping
(cf. BTS / star-contraction literature, PAPERS.md):

    L0(u)   = u
    L_{t+1}(u) = min( L_t(u), min_{(u,v)∈E} L_t(v), L_t(L_t(u)) )

Each round is two hash joins + one ``groupby(node).min(label)``;
pointer jumping (the ``L(L(u))`` term) makes convergence logarithmic in
component diameter instead of linear. Fixpoint = no label changed
(a cheap count aggregate on the changed mask). Deterministic: the final
label is the component's min record_id — "first wins" replaced by
"min wins" everywhere (SURVEY.md §4).

Edges are expected deduplicated and (src, dst) int64; orientation is
irrelevant (both directions are added here).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

from address_parser_ray.rayutil import ensure_schema, pinned_join, project

_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _symmetrize(edges):
    rev = project(edges, {"dst": "src", "src": "dst"})
    return edges.union(rev)


def connected_components(
    edges,
    nodes,
    *,
    max_rounds: int = 20,
    num_partitions: int = 8,
):
    """(edges Dataset (src,dst), nodes Dataset (record_id)) →
    assignments Dataset (record_id, cluster_id).

    Nodes absent from any edge become singleton clusters
    (cluster_id = record_id).
    """
    # labels: (node, label); edges never change across rounds — only the
    # small labels relation iterates. Materialize both once: the loop
    # re-reads them each round and lazy re-execution would re-run the
    # whole upstream pipeline per round.
    labels = (
        nodes.select_columns(["record_id"])
        .map_batches(
            lambda t: pa.table({"node": t["record_id"], "label": t["record_id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    sym = _symmetrize(edges).materialize()
    if sym.count() == 0:
        # no edges → everything is a singleton; joins on an empty (and
        # possibly schema-less) dataset are both pointless and brittle.
        return project(labels, {"node": "record_id", "label": "cluster_id"})

    for _round in range(max_rounds):
        # neighbor labels: edges ⋈ labels on dst → (src, neighbor_label)
        nbr = project(
            pinned_join(
                sym, labels, on="dst", right_on="node",
                num_partitions=num_partitions,
            ),
            {"src": "node", "label": "cand"},
        )

        # pointer jumping: labels ⋈ labels on label → (node, label-of-label)
        jump = project(
            pinned_join(
                labels, project(labels, {"node": "node2", "label": "label2"}),
                on="label", right_on="node2",
                num_partitions=num_partitions,
            ),
            {"node": "node", "label2": "cand"},
        )

        own = project(labels, {"node": "node", "label": "cand"})
        # repartition: unions + shuffles multiply tiny blocks each round;
        # without coalescing, per-block task overhead compounds
        # exponentially across iterations.
        new_labels = (
            ensure_schema(
                own.union(nbr)
                .union(jump)
                .groupby("node")
                .aggregate(Min("cand", alias_name="label")),
                _LABEL_SCHEMA,
            )
            .repartition(num_partitions)
            .materialize()
        )

        # fixpoint check: join old vs new, count changes
        cmp = pinned_join(
            project(labels, {"node": "node", "label": "old_label"}), new_labels,
            on="node", num_partitions=num_partitions,
        )
        changed = cmp.filter(expr="old_label != label").count()
        labels = new_labels
        if changed == 0:
            break

    return project(labels, {"node": "record_id", "label": "cluster_id"})


def clusters_with_duplicates(assignments, dup_edges, *, num_partitions: int = 8):
    """Extend representative-level assignments back over exact duplicates:
    each duplicate inherits its representative's cluster
    (dup_edges: (src=dup, dst=rep))."""
    dup_edges = dup_edges.materialize()
    if dup_edges.count() == 0:
        return assignments
    dup_assign = pinned_join(
        dup_edges, assignments, on="dst", right_on="record_id",
        num_partitions=num_partitions,
    ).map_batches(
        lambda t: pa.table(
            {"record_id": t["src"], "cluster_id": t["cluster_id"]}
        ),
        batch_format="pyarrow",
    )
    return assignments.union(dup_assign)
