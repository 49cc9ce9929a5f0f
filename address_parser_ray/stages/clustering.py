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

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min

from address_parser_ray.functions.hashing import ID_DTYPE, id_hash64, ids_np, pack_ids, splitmix64
from address_parser_ray.rayutil import (
    default_num_partitions,
    ensure_schema,
    pinned_join,
    project,
)

# id columns are either int64 (doc-id graphs in SQL-checkable queries)
# or binary 16-byte record ids (the flagship since r4) — every kernel
# below is dtype-generic over the two.


def _arrow_field_type(ds, name: str) -> pa.DataType:
    sch = ds.schema()
    base = getattr(sch, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base.field(name).type
    return dict(zip(sch.names, sch.types))[name]


def _is_id_binary(typ: pa.DataType) -> bool:
    return pa.types.is_binary(typ) or pa.types.is_large_binary(typ)


def _ids_of(col) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if _is_id_binary(arr.type):
        return ids_np(arr)
    return np.asarray(arr).astype(np.int64)


def _pack(ids: np.ndarray):
    if ids.dtype == np.dtype(ID_DTYPE):
        return pack_ids(ids)
    return pa.array(ids)


def _id64_of(col) -> np.ndarray:
    """int64 routing view of an id column (hash fold for binary)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if _is_id_binary(arr.type):
        return id_hash64(ids_np(arr)).astype(np.int64)
    return np.asarray(arr).astype(np.int64)


def _label_schema(id_type: pa.DataType) -> pa.Schema:
    return pa.schema([("node", id_type), ("label", id_type)])


def _agg_schema(id_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [("node", id_type), ("label", id_type), ("old_label", id_type)]
    )


def _symmetrize(edges):
    rev = project(edges, {"dst": "src", "src": "dst"})
    return edges.union(rev)


def _numpy_components(src: np.ndarray, dst: np.ndarray):
    """Vectorized union-find over an edge list: min-label propagation
    with pointer jumping on DENSE indices (np.unique is ascending, so
    min index == min node id — the deterministic "min wins" rule).
    O(E) numpy per round, O(log n) rounds, no per-edge Python loop.
    Ids are 'S16' byte strings (128-bit); the propagation itself runs on
    dense int indices, so only unique/searchsorted touch the wide ids.
    Returns (uniq_nodes, component_min_id_per_node)."""
    uniq, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: src.size], inv[src.size :]
    lab = np.arange(uniq.size, dtype=np.int64)
    while True:
        old = lab.copy()
        np.minimum.at(lab, si, lab[di])
        np.minimum.at(lab, di, lab[si])
        lab = lab[lab]  # pointer jumping
        if np.array_equal(lab, old):
            break
    return uniq, uniq[lab]


def _mix64(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — a cheap vectorized integer hash."""
    with np.errstate(over="ignore"):
        z = x.astype(np.uint64) + np.uint64(
            (0x9E3779B97F4A7C15 * (salt + 1)) & 0xFFFFFFFFFFFFFFFF
        )
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _contract_edges(edges, *, n_edges: int, salt: int):
    """One filtering/contraction round (the MapReduce-CC "filtering"
    technique — Kiveris et al., *Connected Components in MapReduce and
    Beyond*, PAPERS.md): hash-bucket the edges by src, run the
    vectorized union-find within each bucket, and emit each bucket-local
    component as its star decomposition (root=min id, member).

    The union of per-bucket stars preserves connectivity exactly while
    dense subgraphs — near-dup match cliques, exactly what blocking
    produces — collapse from O(k²) edges to k−1 in one shuffle. Output
    size is Σ(bucket nodes − bucket components) ≤ E, so iterating is
    monotone; a round that fails to shrink signals a tree-like graph and
    the caller falls back to label propagation."""
    nbuckets = int(min(max(4, n_edges // (1 << 19)), 4096))

    def add_bucket(t: pa.Table) -> pa.Table:
        src = _id64_of(t["src"])
        b = (_mix64(src, salt) % np.uint64(nbuckets)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    def contract(t: pa.Table) -> pa.Table:
        src = _ids_of(t["src"])
        dst = _ids_of(t["dst"])
        uniq, roots = _numpy_components(src, dst)
        member = uniq[roots != uniq]
        root = roots[roots != uniq]
        return pa.table({"src": _pack(root), "dst": _pack(member)})

    id_type = _arrow_field_type(edges, "src")
    return ensure_schema(
        edges.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(contract, batch_format="pyarrow"),
        pa.schema([("src", id_type), ("dst", id_type)]),
    )


def _driver_union_find(edges, nodes, num_partitions: int):
    """Small-graph fast path: the match graph has O(duplicates) edges —
    orders of magnitude smaller than the corpus — so below a threshold
    the transitive closure is cheapest on the driver (the Ray guide's
    "union-find on the driver only if the candidate set is provably
    small"). Edges stream to the driver as (src, dst) int64 batches
    (32 B/edge), the root map broadcasts back via ``ray.put``, and the
    assignment itself stays a distributed ``map_batches`` over nodes."""
    import ray

    srcs, dsts = [], []
    for batch in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        srcs.append(_ids_of(batch["src"]))
        dsts.append(_ids_of(batch["dst"]))
    empty_dt = srcs[0].dtype if srcs else np.dtype(ID_DTYPE)
    src = np.concatenate(srcs) if srcs else np.empty(0, dtype=empty_dt)
    dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=empty_dt)

    uniq, roots = _numpy_components(src, dst)

    bcast = ray.put((uniq, roots))

    def assign(t: pa.Table) -> pa.Table:
        u, r = ray.get(bcast)
        ids = _ids_of(t["record_id"])
        out = ids.copy()
        if u.size:
            pos = np.searchsorted(u, ids)
            pos = np.clip(pos, 0, u.size - 1)
            hit = u[pos] == ids
            out[hit] = r[pos[hit]]
        return pa.table({"record_id": _pack(ids), "cluster_id": _pack(out)})

    return nodes.select_columns(["record_id"]).map_batches(
        assign, batch_format="pyarrow"
    )


def connected_components(
    edges,
    nodes,
    *,
    max_rounds: int = 20,
    num_partitions: int | None = None,
    driver_max_edges: int = 2_000_000,
):
    """(edges Dataset (src,dst), nodes Dataset (record_id)) →
    assignments Dataset (record_id, cluster_id).

    Nodes absent from any edge become singleton clusters
    (cluster_id = record_id). Below ``driver_max_edges`` the closure runs
    as a driver-side union-find (see _driver_union_find — the match graph
    is tiny relative to the corpus); above it, filtering/contraction
    rounds (``_contract_edges``) collapse dense cliques until the graph
    fits the gate, and only a non-shrinking residue falls through to the
    distributed label-propagation loop. All paths are deterministic
    (min record_id wins) and produce identical partitions."""
    num_partitions = default_num_partitions(num_partitions)
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
    edges = edges.materialize()
    n_raw_edges = edges.count()
    if n_raw_edges == 0:
        # no edges → everything is a singleton; joins on an empty (and
        # possibly schema-less) dataset are both pointless and brittle.
        return project(labels, {"node": "record_id", "label": "cluster_id"})
    # contraction ladder: above the driver gate, collapse the match
    # graph's dense cliques with filtering rounds (one shuffle each)
    # until it fits the gate; only a tree-like residue that refuses to
    # shrink falls through to the join-heavy label-propagation loop.
    # At the 1 M-row / 5 M-edge smoke scale this replaced a 479 s
    # propagation run with one contraction + the driver finish.
    n_edges_cur = n_raw_edges
    for _salt in range(6):
        if n_edges_cur <= driver_max_edges:
            break
        contracted = _contract_edges(
            edges, n_edges=n_edges_cur, salt=_salt
        ).materialize()
        n_new = contracted.count()
        shrunk = n_new < 0.9 * n_edges_cur
        edges, n_edges_cur = contracted, n_new
        if not shrunk:
            break
    if n_edges_cur <= driver_max_edges:
        return _driver_union_find(edges, nodes, num_partitions)

    sym = _symmetrize(edges).materialize()
    n_edges = sym.count()
    # partitions sized to the data, bounded by the CPU count: per-bucket
    # task overhead dominates when buckets hold only hundreds of rows.
    num_partitions = min(num_partitions, max(4, n_edges // 20_000 + 1))

    id_type = _arrow_field_type(sym, "src")
    is_bin = _is_id_binary(id_type)

    def with_own_marker(own_val):
        """Candidate rows carry ``own``: the node's previous label on its
        own row, the dtype's BOTTOM element elsewhere (b"" for binary
        labels, INT64_MIN for int64). Each node has exactly ONE own row
        and the bottom sorts below every real label, so Max(own)
        recovers the old label inside the SAME aggregate that computes
        the new one — the fixpoint check costs no extra join."""

        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            if own_val:
                own = t["cand"]
            elif is_bin:
                own = pa.array([b""] * n, type=pa.binary())
            else:
                own = pa.array(
                    np.full(n, np.iinfo(np.int64).min, dtype=np.int64)
                )
            return t.append_column("own", own)

        return fn

    for _round in range(max_rounds):
        # neighbor labels: edges ⋈ labels on dst → (src, neighbor_label)
        nbr = project(
            pinned_join(
                sym, labels, on="dst", right_on="node",
                num_partitions=num_partitions,
            ),
            {"src": "node", "label": "cand"},
        ).map_batches(with_own_marker(False), batch_format="pyarrow")

        own = project(labels, {"node": "node", "label": "cand"}).map_batches(
            with_own_marker(True), batch_format="pyarrow"
        )
        cands = own.union(nbr)

        # pointer jumping: labels ⋈ labels on label → (node, label-of-label).
        # Star-like match graphs (near-dup clusters) converge on neighbor
        # propagation alone; the extra join only pays off on deep chains,
        # so it joins in from round 1.
        if _round >= 1:
            jump = project(
                pinned_join(
                    labels, project(labels, {"node": "node2", "label": "label2"}),
                    on="label", right_on="node2",
                    num_partitions=num_partitions,
                ),
                {"node": "node", "label2": "cand"},
            ).map_batches(with_own_marker(False), batch_format="pyarrow")
            cands = cands.union(jump)
        # repartition: unions + shuffles multiply tiny blocks each round;
        # without coalescing, per-block task overhead compounds
        # exponentially across iterations.
        agg = (
            ensure_schema(
                cands.groupby("node").aggregate(
                    Min("cand", alias_name="label"),
                    Max("own", alias_name="old_label"),
                ),
                _agg_schema(id_type),
            )
            .repartition(num_partitions)
            .materialize()
        )
        changed = agg.filter(expr="label != old_label").count()
        # cheap lazy projection over the materialized agg — no extra pin
        labels = project(agg, {"node": "node", "label": "label"})
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected components did not converge after {max_rounds} "
            f"label-propagation rounds ({changed} labels still changing): "
            "the match graph has pathological diameter — raise max_rounds "
            "or inspect the candidate-pair stage for a runaway component"
        )

    return project(labels, {"node": "record_id", "label": "cluster_id"})


def clusters_with_duplicates(assignments, dup_edges, *, num_partitions: int | None = None):
    """Extend representative-level assignments back over exact duplicates:
    each duplicate inherits its representative's cluster
    (dup_edges: (src=dup, dst=rep))."""
    dup_edges = dup_edges.materialize()
    n_dups = dup_edges.count()
    if n_dups == 0:
        return assignments
    from address_parser_ray.rayutil import partitions_for

    num_partitions = partitions_for(n_dups, requested=num_partitions)
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
