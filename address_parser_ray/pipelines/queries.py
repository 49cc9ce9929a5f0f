"""Query registry: one callable per implemented operator/pipeline
(SURVEY.md §2), each taking ``sf_dir`` and returning a Dataset /
pyarrow Table / pandas DataFrame.

Paired with ``pipelines.oracle.ORACLE_SQL`` (DuckDB-runnable ANSI SQL on
the same tables) for the driver's row-count + schema + value-hash
comparison. Column names here MUST match the SQL aliases exactly.

Determinism rules used throughout:
- money/float sums compare as ``CAST(floor(x*100) AS BIGINT)`` cents —
  floor of an IEEE double is identical in numpy and DuckDB (no rounding
  tie-break ambiguity);
- top-k queries sort on a unique tiebreaker column;
- "first wins" is always "min(id) wins".
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from address_parser_ray.config import DEFAULT_CONFIG
from address_parser_ray.functions.hashing import sha256_hex
from address_parser_ray.functions.text import (
    detect_lang,
    quality_features,
    ws_token_count_series,
)
from address_parser_ray.rayutil import pinned_join, project

_DOC_COLS = ["doc_id", "text", "lang", "source", "n_chars"]


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=columns or _DOC_COLS
    )


# ---------------------------------------------------------------------------
# ER / dedup family (reference: D2 exact dedup, D7 near dedup, M6 shingles)
# ---------------------------------------------------------------------------


def q_exact_dedup_groups(sf_dir: str):
    """Exact-dedup group stats over documents (D2: first-wins signature
    dedup, ``ner/build_standard_dataset.py:949-965``; "first" → min id)."""

    def add_sha(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "content_sha256": pa.array(
                    sha256_hex(t["text"].to_pylist()), type=pa.string()
                ),
                "doc_id": t["doc_id"],
            }
        )

    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        add_sha, batch_format="pyarrow", zero_copy_batch=True
    )
    return ds.groupby("content_sha256").aggregate(
        Count(alias_name="n_dups"), Min("doc_id", alias_name="rep_doc_id")
    )


_DEDUP_MEMO: dict = {}


def _dedup_documents(sf_dir: str):
    """Memoized full dedup over documents-as-corpus — several queries
    consume the same (deterministic, materialized) result; recomputing it
    per query would triple the correctness-matrix runtime."""
    if sf_dir not in _DEDUP_MEMO:
        from address_parser_ray.pipelines.dedup import dedup_pipeline
        from address_parser_ray.sources import documents_as_corpus

        _DEDUP_MEMO[sf_dir] = dedup_pipeline(documents_as_corpus(sf_dir))
    return _DEDUP_MEMO[sf_dir]


def q_minhash_lsh_clusters(sf_dir: str):
    """Full near-dup pipeline over documents-as-corpus → cluster size
    histogram (cluster_size, n_clusters).  Full SQL oracle since r4:
    ``oracle._build_flagship_lsh_sql`` recomputes the ENTIRE pipeline —
    OPH sketches, band blocking, the sketch scorer, the content-rescore
    band, and the transitive closure — in DuckDB (domain assumptions
    documented on the builder)."""
    res = _dedup_documents(sf_dir)
    sizes = res.assignments.groupby("cluster_id").aggregate(
        Count(alias_name="cluster_size")
    )
    hist = sizes.groupby("cluster_size").aggregate(Count(alias_name="n_clusters"))
    return hist.sort("cluster_size")


def _doc_id_map_ref(sf_dir: str):
    """Broadcast (sorted 'S16' record ids, int64 doc ids) — the
    record→doc relabeling map for oracle-comparable doc-space outputs,
    built exactly like ``sources._docs_to_corpus`` synthesizes its keys
    (one ``ray.put``; consumers gather via searchsorted)."""
    import hashlib

    from address_parser_ray.functions.hashing import ids_np, stable_id128

    def emit_map(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        rids = [
            stable_id128(
                s or "",
                f"docs/doc_{d}.txt",
                hashlib.sha1(f"doc:{d}".encode()).hexdigest(),
            )
            for d, s in zip(ids, srcs)
        ]
        return pa.table(
            {
                "record_id": pa.array(rids, type=pa.binary()),
                "doc_id": t["doc_id"],
            }
        )

    m = pa.concat_tables(
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(emit_map, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    from address_parser_ray.functions.hashing import ids_np as _inp

    rid = _inp(m["record_id"])
    did = np.asarray(m["doc_id"], dtype=np.int64)
    order = np.argsort(rid)
    return ray.put((rid[order], did[order]))


def q_lsh_cluster_assignments(sf_dir: str):
    """Per-document flagship cluster assignments in doc-id space —
    the STRONG-discrimination twin of ``minhash_lsh_clusters`` (a 2-row
    histogram can hash-match by luck; one row per document cannot):
    (doc_id, cluster_label = min doc_id in the cluster, cluster_size).

    record_id (blake2b of repo/path/commit, not SQL-recomputable) maps
    back to doc_id via the same synthesis ``_docs_to_corpus`` applied —
    the map broadcasts once (``ray.put`` of two sorted int64 arrays) and
    each assignment batch relabels via one searchsorted; cluster labels
    re-derive as min(doc_id) per cluster so both sides speak doc ids.
    Oracle: the flagship closure SQL with a per-doc tail."""
    from address_parser_ray.functions.hashing import ids_np

    res = _dedup_documents(sf_dir)
    map_ref = _doc_id_map_ref(sf_dir)

    def relabel(t: pa.Table) -> pa.Table:
        rids, dids = ray.get(map_ref)
        r = ids_np(t["record_id"])
        c = ids_np(t["cluster_id"])
        pr = np.clip(np.searchsorted(rids, r), 0, len(rids) - 1)
        pc = np.clip(np.searchsorted(rids, c), 0, len(rids) - 1)
        if not ((rids[pr] == r).all() and (rids[pc] == c).all()):
            raise KeyError("assignment references record id not in corpus map")
        return pa.table(
            {
                "doc_id": pa.array(dids[pr]),
                "cluster_doc": pa.array(dids[pc]),
            }
        )

    labeled = res.assignments.map_batches(
        relabel, batch_format="pyarrow", zero_copy_batch=True
    )
    # cluster label = min DOC id per cluster (cluster_doc is the min
    # RECORD id's doc — blake2b order, not comparable); size via Count
    stats = labeled.groupby("cluster_doc").aggregate(
        Min("doc_id", alias_name="cluster_label"),
        Count(alias_name="cluster_size"),
    )
    from address_parser_ray.rayutil import pinned_join

    out = pinned_join(
        labeled, stats, on="cluster_doc", right_on="cluster_doc"
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "cluster_label": t["cluster_label"],
                "cluster_size": pc.cast(t["cluster_size"], pa.int64()),
            }
        )

    return out.map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    ).sort("doc_id")


def q_score_histogram(sf_dir: str):
    """Match-score distribution of the flagship scorer over the
    documents corpus — the calibration diagnostic an ER operator reads
    before picking ``match_threshold`` (and the observability twin of
    ``q_block_size_histogram``): scores bucket into 5%-wide integer bins
    (``floor(score·20)``), counted with per-batch partials. A healthy
    corpus shows the bimodal gap the threshold sits in; a collapsing gap
    is the signal to re-tune gates. Rows-only (scores are
    sketch-derived); panel is ≤ 21 rows regardless of pair volume."""
    res = _dedup_documents(sf_dir)
    if res.scored_pairs is None:
        return pd.DataFrame({"score_bin": pd.Series([], dtype="int64"),
                             "n_pairs": pd.Series([], dtype="int64")})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.clip(
            np.floor(df["score"].to_numpy(dtype=np.float64) * 20).astype(np.int64),
            0, 20,
        )
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame(
            {"score_bin": u, "part_n": c.astype(np.int64)}
        )

    return (
        res.scored_pairs.map_batches(partial, batch_format="pandas")
        .groupby("score_bin")
        .aggregate(Sum("part_n", alias_name="n_pairs"))
        .sort("score_bin")
    )


def q_content_score_histogram(sf_dir: str):
    """Oracle-checkable calibration twin of ``score_histogram``: the
    same floor(score·20) bin arithmetic applied to an EXACT content
    score — distinct char-4-gram Jaccard — over a pinned pair fixture
    (adjacent doc ids d, d+1). ``score_histogram`` itself bins the
    flagship sketch scorer (non-SQL by nature); this twin pins the bin
    arithmetic and the content-score semantics against DuckDB with pure
    integer math (bin = (20·|∩|)//|∪|, no float boundary).

    Shape: one pass emits per-doc gram counts as two pair-keyed partial
    rows (d is the right member of pair d-1 and the left member of pair
    d); a second pass explodes distinct gram hashes, hash-bucketed, and
    counts adjacent-id co-occurrences per bucket — the intersection.
    One single-key groupby folds both streams; no composite keys, no
    corpus-sized broadcast. Gram-hash equality stands in for gram
    equality (64-bit, collision-free at corpus scale — same documented
    assumption as ``ngram_jaccard_stats``)."""
    from address_parser_ray.functions.hashing import (
        char_shingle_hashes,
        splitmix64,
    )
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    PAIR_COLS = ("pair", "n_l", "n_r", "l_pres", "r_pres", "inter")

    def _pair_table(**cols) -> pa.Table:
        n = len(cols["pair"])
        return pa.table(
            {
                c: pa.array(
                    cols.get(c, np.zeros(n, dtype=np.int64)), type=pa.int64()
                )
                for c in PAIR_COLS
            }
        )

    def counts(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        texts = t["text"].to_pylist()
        n_g = np.array(
            [np.unique(char_shingle_hashes(x or "", 4)).size for x in texts],
            dtype=np.int64,
        )
        ones = np.ones(ids.size, dtype=np.int64)
        left = _pair_table(pair=ids, n_l=n_g, l_pres=ones)
        right = _pair_table(pair=ids - 1, n_r=n_g, r_pres=ones)
        return pa.concat_tables([left, right])

    def explode(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        texts = t["text"].to_pylist()
        hv_parts, id_parts = [], []
        for d, x in zip(ids, texts):
            hs = np.unique(char_shingle_hashes(x or "", 4))
            hv_parts.append(hs)
            id_parts.append(np.full(hs.size, d, dtype=np.int64))
        hv = (
            np.concatenate(hv_parts) if hv_parts else np.empty(0, np.uint64)
        )
        did = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
        bucket = (splitmix64(hv) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "hv": pa.array(hv.view(np.int64)),
                "doc_id": pa.array(did),
            }
        )

    def bucket_inter(g: pa.Table) -> pa.Table:
        hv = np.asarray(g["hv"], dtype=np.int64)
        ids = np.asarray(g["doc_id"], dtype=np.int64)
        order = np.lexsort((ids, hv))
        hv, ids = hv[order], ids[order]
        # adjacent-id co-occurrence within a gram run: ids sorted per hv,
        # a (d, d+1) adjacency is consecutive after the sort
        same_h = hv[1:] == hv[:-1]
        adj = same_h & (ids[1:] == ids[:-1] + 1)
        left = ids[:-1][adj]
        if left.size == 0:
            return _pair_table(pair=np.empty(0, dtype=np.int64))
        u, c = np.unique(left, return_counts=True)
        return _pair_table(pair=u, inter=c.astype(np.int64))

    docs = _docs(sf_dir, ["doc_id", "text"])
    part_counts = docs.map_batches(
        counts, batch_format="pyarrow", zero_copy_batch=True
    )
    part_inter = (
        docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_inter, batch_format="pyarrow")
    )
    folded = part_counts.union(part_inter).groupby("pair").aggregate(
        Sum("n_l", alias_name="n_l"),
        Sum("n_r", alias_name="n_r"),
        Sum("l_pres", alias_name="l_pres"),
        Sum("r_pres", alias_name="r_pres"),
        Sum("inter", alias_name="inter"),
    )

    def bins(df: pd.DataFrame) -> pd.DataFrame:
        ok = (df["l_pres"] > 0) & (df["r_pres"] > 0)
        u = (df["n_l"] + df["n_r"] - df["inter"]).to_numpy(np.int64)
        ok &= u > 0
        b = np.zeros(len(df), dtype=np.int64)
        nz = ok.to_numpy()
        b[nz] = (20 * df["inter"].to_numpy(np.int64)[nz]) // u[nz]
        sel = b[nz]
        uq, cq = np.unique(sel, return_counts=True)
        return pd.DataFrame({"score_bin": uq, "part_n": cq.astype(np.int64)})

    return (
        folded.map_batches(bins, batch_format="pandas")
        .groupby("score_bin")
        .aggregate(Sum("part_n", alias_name="n_pairs"))
        .sort("score_bin")
    )


_SIMHASH_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("hamming", pa.int64())]
)


def q_simhash_hamming_pairs(sf_dir: str):
    """SimHash near-dup: 64-bit simhash per doc, candidate pairs =
    same 16-bit band (4 bands → Hamming ≤ ~3 guaranteed recall),
    verified by full Hamming distance ≤ 3. Band groups are hash-bucketed
    (one Python call per BUCKET, run-length vectorized per band inside)
    and pair emission per band is capped at max_pairs_per_block in
    deterministic sorted-id order — a degenerate band (all-boilerplate /
    empty docs sharing one simhash) stays bounded instead of going
    O(m²). Pairs are in doc_id space (Fingerprinter passthrough), so the
    whole flavor is oracle-checkable: Hamming ≤ 3 over 64-bit simhash
    guarantees ≥ 1 identical 16-bit band (pigeonhole), hence the banded
    candidate set equals the exhaustive one whenever the per-block pair
    caps don't bite (they need a >91-member identical band run)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions
    from address_parser_ray.sources import documents_as_corpus
    from address_parser_ray.stages.fingerprint import Fingerprinter

    max_pairs = DEFAULT_CONFIG.max_pairs_per_block
    nparts = default_num_partitions()

    corpus = documents_as_corpus(sf_dir)
    fp = corpus.map_batches(
        Fingerprinter,
        # simhash only: skips the three OPH sketches + content sha256
        fn_constructor_kwargs={
            "cfg": DEFAULT_CONFIG,
            "outputs": frozenset({"simhash"}),
            "passthrough": ("doc_id",),
        },
        batch_format="pyarrow",
        batch_size=512,
        # min 1: a floor of 2 exceeds the block count on fixture-scale
        # inputs (Ray warns and idles an actor); the autoscaler still
        # ramps to 8 when blocks are plentiful
        concurrency=(1, 8),
    )

    def explode_bands(t: pa.Table) -> pa.Table:
        sh = np.asarray(t["simhash"], dtype=np.uint64)
        doc = np.asarray(t["doc_id"], dtype=np.int64)
        n = len(sh)
        bands = np.empty((n, 4), dtype=np.int64)
        for b in range(4):
            chunk = (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            bands[:, b] = (chunk.astype(np.int64) << 2) | b
        flat = bands.reshape(-1)
        bucket = (splitmix64(flat.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "band": pa.array(flat),
                "record_id": pa.array(np.repeat(doc, 4)),
                "simhash": pa.array(np.repeat(sh, 4)),
            }
        )

    exploded = fp.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        band = np.asarray(group["band"], dtype=np.int64)
        ids = np.asarray(group["record_id"], dtype=np.int64)
        sh = np.asarray(group["simhash"], dtype=np.uint64)
        order = np.lexsort((ids, band))
        band, ids, sh = band[order], ids[order], sh[order]
        keep = np.concatenate(
            [[True], (band[1:] != band[:-1]) | (ids[1:] != ids[:-1])]
        )
        band, ids, sh = band[keep], ids[keep], sh[keep]
        if band.size < 2:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        change = np.flatnonzero(np.diff(band)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [band.size]]))
        out_a, out_b, out_d = [], [], []
        # one vectorized triu expansion per distinct run LENGTH (the
        # _make_pairs_bucket_fn trick) — not one call per band key
        for m in np.unique(lens):
            if m < 2:
                continue
            sel = starts[lens == m]
            idm = ids[sel[:, None] + np.arange(m)[None, :]]
            shm = sh[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            if iu.size > max_pairs:
                iu, ju = iu[:max_pairs], ju[:max_pairs]
            x = np.bitwise_xor(shm[:, iu], shm[:, ju]).ravel()
            dist = np.unpackbits(x.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
            mask = dist <= 3
            out_a.append(idm[:, iu].ravel()[mask])
            out_b.append(idm[:, ju].ravel()[mask])
            out_d.append(dist[mask].astype(np.int64))
        if not out_a:
            return _SIMHASH_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
                "hamming": pa.array(np.concatenate(out_d)),
            }
        )

    cand = exploded.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")

    # cross-band dedup (min hamming per pair) via a pair-hash bucket +
    # one vectorized reduceat pass per bucket — the blocking stage's
    # _dedup_pairs_bucket_fn shape. (A composite-key
    # groupby(["id_a","id_b"]).aggregate() is pathologically slow in Ray
    # 2.49 and would sort the full pair stream; see
    # q_event_value_percentiles.)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"]).astype(np.int64)
        b = np.asarray(t["id_b"]).astype(np.int64)
        pb = (
            splitmix64(splitmix64(a.view(np.uint64)) ^ b.view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)
        return t.append_column("pb", pa.array(pb))

    def min_per_pair(g: pa.Table) -> pa.Table:
        a = np.asarray(g["id_a"], dtype=np.int64)
        b = np.asarray(g["id_b"], dtype=np.int64)
        d = np.asarray(g["hamming"], dtype=np.int64)
        order = np.lexsort((d, b, a))
        a, b, d = a[order], b[order], d[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        return pa.table(
            {
                "id_a": pa.array(a[first]),
                "id_b": pa.array(b[first]),
                "hamming": pa.array(d[first]),  # sorted → first is min
            }
        )

    return (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(min_per_pair, batch_format="pyarrow")
    )


def q_ngram_jaccard_stats(sf_dir: str):
    """Char-4-gram set stats per doc — the reference's shingling op
    (``generate_ngrams`` fuzz/inexus_parser.py:2657-2660) surfaced as a
    column: (doc_id, n_ngrams). Non-SQL-expressible (set semantics)."""
    from address_parser_ray.functions.hashing import char_shingle_hashes

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = [int(char_shingle_hashes((x or ""), 4).size) for x in texts]
        return pa.table({"doc_id": t["doc_id"], "n_ngrams": pa.array(n, type=pa.int64())})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data operators)
# ---------------------------------------------------------------------------


_TYPE_PREFIX_KINDS = (
    ("operator", frozenset({"scan", "merge", "hash", "sort", "join"})),
    ("schema", frozenset({"table", "column", "row", "index"})),
    ("entity", frozenset({"customer", "order", "supplier", "part"})),
)


def q_type_prefix_counts(sf_dir: str):
    """M16 full analogue (reference ``build_standard_dataset.py:420-436,
    464-516``: infer_includes_type / detect_type_hint / extract_type_word
    classify an entity name by its leading type word). Here each doc is
    classified by its FIRST whitespace token against small keyword sets
    (operator / schema / entity / other) — a pure vectorized map — and
    counted per (kind, lang). The composite aggregate is domain-tiny
    (≤ 4 kinds × langs after per-batch partials), the accepted regime."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        firsts = []
        for text in df["text"]:
            toks = [w for w in _ws_tokens(text) if w]
            firsts.append(toks[0].lower() if toks else "")
        kind = np.full(len(df), "other", dtype=object)
        f = pd.Series(firsts)
        for name, words in _TYPE_PREFIX_KINDS:
            kind[f.isin(words).to_numpy()] = name
        out = pd.DataFrame({"kind": kind, "lang": df["lang"].to_numpy()})
        g = out.groupby(["kind", "lang"], sort=False, as_index=False).agg(
            part_n=("kind", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    return (
        _docs(sf_dir, ["text", "lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby(["kind", "lang"])
        .aggregate(Sum("part_n", alias_name="n_docs"))
        .sort(["kind", "lang"])
    )


def q_top_tokens_per_doc(sf_dir: str):
    """G2 full analogue (reference ``inexus_parser.py:147-154``: top-5
    ngram frequency → partial_input heuristic): per-record top-3 most
    frequent tokens, ties broken token-ascending — the in-map per-record
    top-k shape (each doc lives in one row, so no shuffle at all).
    Output: (doc_id, rank, token, n)."""
    K = 3

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        ids, ranks, toks, ns = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            c = Counter(w.lower() for w in _ws_tokens(text) if w)
            best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
            for r, (w, n) in enumerate(best, 1):
                ids.append(doc_id)
                ranks.append(r)
                toks.append(w)
                ns.append(n)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "rank": np.asarray(ranks, dtype=np.int64),
                "token": toks,
                "n": np.asarray(ns, dtype=np.int64),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        topk, batch_format="pandas"
    )


def q_dup_span_stats(sf_dir: str):
    """Exact-substring dedup, 8th flavor (Lee et al. 2022 ExactSubstr,
    bounded to token-8-gram granularity — the suffix-array generalizes
    the window, the distributed shape is identical): a SPAN is
    duplicated when the same 8-token window occurs in ≥ 2 distinct docs.
    Output per doc: (doc_id, n_grams, dup_positions, dup_grams) — total
    windows, window positions whose gram is corpus-duplicated, distinct
    duplicated grams; <8-token docs surface as zeros.

    Shape: ONE content pass emits hashed window postings (16-byte
    blake2b keys: at 10^12 grams a 64-bit key takes birthday collisions,
    128-bit does not) pre-counted per (doc, gram) and hash-bucketed by
    key; document-frequency + per-doc partials are one vectorized pandas
    pass per bucket; a single-key groupby(doc_id) Sum combines. A
    zero-count marker row per doc rides the same postings stream
    (bucketed by doc id, key=b''), so zero-gram docs surface without a
    doc-table join. Reference analogue: the n-gram posting index of
    ``fuzz/inexus_parser.py:468-889`` inverted to corpus-level df."""
    import hashlib
    from collections import Counter

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    W = 8
    nparts = default_num_partitions()

    def emit_postings(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        docs, keys, cnts = [], [], []
        for d, text in zip(doc_ids, texts):
            toks = [w.lower() for w in _ws_tokens(text) if w]
            c = Counter(
                hashlib.blake2b(
                    " ".join(toks[i : i + W]).encode(), digest_size=16
                ).digest()
                for i in range(len(toks) - W + 1)
            )
            docs.append(d)  # marker row: presence with zero grams
            keys.append(b"")
            cnts.append(0)
            for k, n in c.items():
                docs.append(d)
                keys.append(k)
                cnts.append(n)
        key_arr = pa.array(keys, type=pa.binary())
        doc_arr = np.asarray(docs, dtype=np.int64)
        # gram rows bucket by key prefix; marker rows by doc id so the
        # constant b'' key can never become a hot bucket
        pref = np.array(
            [
                int.from_bytes(k[:8], "little") if k else 0
                for k in keys
            ],
            dtype=np.uint64,
        )
        is_marker = np.array([not k for k in keys], dtype=bool)
        mixed = np.where(is_marker, doc_arr.view(np.uint64), pref)
        bucket = (splitmix64(mixed) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "key": key_arr,
                "doc_id": pa.array(doc_arr),
                "cnt": pa.array(np.asarray(cnts, dtype=np.int64)),
            }
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        marker = g["key"].str.len() == 0
        grams = g[~marker]
        parts = [
            pd.DataFrame(
                {
                    "doc_id": g.loc[marker, "doc_id"].to_numpy(np.int64),
                    "part_n": np.int64(0),
                    "part_dp": np.int64(0),
                    "part_dg": np.int64(0),
                }
            )
        ]
        if len(grams):
            nd = grams.groupby("key")["doc_id"].transform("nunique")
            dup = (nd >= 2).to_numpy()
            cnt = grams["cnt"].to_numpy(np.int64)
            per = (
                pd.DataFrame(
                    {
                        "doc_id": grams["doc_id"].to_numpy(np.int64),
                        "part_n": cnt,
                        "part_dp": np.where(dup, cnt, 0),
                        "part_dg": dup.astype(np.int64),
                    }
                )
                .groupby("doc_id", sort=False, as_index=False)
                .sum()
            )
            parts.append(per)
        out = pd.concat(parts, ignore_index=True)
        for c in ("part_n", "part_dp", "part_dg"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("part_n", alias_name="n_grams"),
            Sum("part_dp", alias_name="dup_positions"),
            Sum("part_dg", alias_name="dup_grams"),
        )
        .sort("doc_id")
    )


_CDC_MULT = np.array(
    [2654435761, 40503, 2246822519, 3266489917], dtype=np.int64
)
_CDC_MOD = np.int64(1) << np.int64(32)
_CDC_DIV = np.int64(61)  # prime → expected chunk length ≈ 61 chars


def _cdc_chunk_spans(codepoints: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Content-defined chunk boundaries (FastCDC/rsync family, but with
    a STATELESS 4-codepoint window hash so the identical rule is
    expressible in SQL): cut AFTER 0-based position ``e`` (3 ≤ e ≤ n-2,
    so no chunk is ever empty) when the window hash of codepoints
    ``e-3..e`` is ≡ 0 (mod 61). Returns (starts, ends) half-open span
    arrays. Fully vectorized — four strided multiplies, no recurrence,
    unlike gear hashing whose rolling state serializes the scan."""
    n = codepoints.size
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z
    if n >= 5:
        h = (
            codepoints[: n - 4] * _CDC_MULT[0]
            + codepoints[1 : n - 3] * _CDC_MULT[1]
            + codepoints[2 : n - 2] * _CDC_MULT[2]
            + codepoints[3 : n - 1] * _CDC_MULT[3]
        ) % _CDC_MOD
        starts = np.concatenate(
            [[np.int64(0)], np.flatnonzero(h % _CDC_DIV == 0) + 4]
        )
    else:
        starts = np.zeros(1, dtype=np.int64)
    return starts, np.append(starts[1:], np.int64(n))


def q_cdc_chunk_stats(sf_dir: str):
    """Content-defined-chunking dedup, 9th flavor (the rsync/FastCDC/
    storage-dedup mechanism, applied to corpus text): chunk boundaries
    come from the CONTENT (a 4-codepoint window hash ≡ 0 mod 61), so an
    insertion near the top of a file shifts only the chunk it lands in —
    every later chunk still byte-matches its twin in the other copy,
    which fixed-stride chunking (``doc_chunks``) structurally cannot do.
    Output per doc: (doc_id, n_chunks, dup_chunks, dup_chars) — total
    chunks, chunk instances whose content occurs in ≥ 2 distinct docs,
    and the characters those duplicated instances cover. Reference
    analogue: the sub-document n-gram postings of
    ``fuzz/inexus_parser.py:468-889``, inverted to chunk granularity.

    Shape (identical contract to :func:`q_dup_span_stats`): one content
    pass emits (bucket, chunk-hash key, doc_id, cnt, clen) postings
    pre-counted per (doc, chunk) and hash-bucketed by key — content
    itself never shuffles, only 60-bit digests (vectorized
    ``_text_60bit`` over every chunk of a batch; equality-only, the
    oracle groups by the actual substrings via md5); document-frequency
    and per-doc partials are one vectorized pandas pass per bucket; a
    single-key ``groupby(doc_id)`` Sum combines. A key=-1 marker row
    per doc (bucketed by doc id) keeps empty docs in the output."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        m_docs: list = []
        ch_docs: list = []
        ch_txt: list = []
        ch_len: list = []
        for d, text in zip(doc_ids, texts):
            s = text or ""
            m_docs.append(d)  # marker row: presence with zero chunks
            if not s:
                continue
            cps = np.frombuffer(
                s.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            starts, ends = _cdc_chunk_spans(cps)
            for lo, hi in zip(starts, ends):
                ch_docs.append(d)
                ch_txt.append(s[lo:hi])
                ch_len.append(int(hi - lo))
        if ch_txt:
            agg = (
                pd.DataFrame(
                    {
                        "doc_id": np.asarray(ch_docs, dtype=np.int64),
                        "key": _text_60bit(ch_txt),
                        "clen": np.asarray(ch_len, dtype=np.int64),
                    }
                )
                .groupby(["doc_id", "key"], as_index=False)
                .agg(cnt=("clen", "size"), clen=("clen", "min"))
            )
        else:
            agg = pd.DataFrame(
                {"doc_id": [], "key": [], "cnt": [], "clen": []}
            ).astype(np.int64)
        doc_arr = np.concatenate(
            [np.asarray(m_docs, dtype=np.int64), agg["doc_id"].to_numpy(np.int64)]
        )
        key_arr = np.concatenate(
            [np.full(len(m_docs), -1, dtype=np.int64), agg["key"].to_numpy(np.int64)]
        )
        cnt_arr = np.concatenate(
            [np.zeros(len(m_docs), dtype=np.int64), agg["cnt"].to_numpy(np.int64)]
        )
        len_arr = np.concatenate(
            [np.zeros(len(m_docs), dtype=np.int64), agg["clen"].to_numpy(np.int64)]
        )
        mixed = np.where(key_arr < 0, doc_arr, key_arr).view(np.uint64)
        bucket = (splitmix64(mixed) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "key": pa.array(key_arr),
                "doc_id": pa.array(doc_arr),
                "cnt": pa.array(cnt_arr),
                "clen": pa.array(len_arr),
            }
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        marker = g["key"] < 0
        chunks = g[~marker]
        parts = [
            pd.DataFrame(
                {
                    "doc_id": g.loc[marker, "doc_id"].to_numpy(np.int64),
                    "part_n": np.int64(0),
                    "part_dc": np.int64(0),
                    "part_dch": np.int64(0),
                }
            )
        ]
        if len(chunks):
            nd = chunks.groupby("key")["doc_id"].transform("nunique")
            dup = (nd >= 2).to_numpy()
            cnt = chunks["cnt"].to_numpy(np.int64)
            clen = chunks["clen"].to_numpy(np.int64)
            per = (
                pd.DataFrame(
                    {
                        "doc_id": chunks["doc_id"].to_numpy(np.int64),
                        "part_n": cnt,
                        "part_dc": np.where(dup, cnt, 0),
                        "part_dch": np.where(dup, cnt * clen, 0),
                    }
                )
                .groupby("doc_id", sort=False, as_index=False)
                .sum()
            )
            parts.append(per)
        out = pd.concat(parts, ignore_index=True)
        for c in ("part_n", "part_dc", "part_dch"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("part_n", alias_name="n_chunks"),
            Sum("part_dc", alias_name="dup_chunks"),
            Sum("part_dch", alias_name="dup_chars"),
        )
        .sort("doc_id")
    )


def _span_posting_emitter(extra_col: str | None, nparts: int, W: int = 8):
    """Shared window-posting emitter for the span-analysis family
    (:func:`q_dup_span_stats` semantics): one row per DISTINCT 8-token
    gram per doc — (bucket, key, doc_id[, extra]) with 16-byte blake2b
    keys bucketed by key prefix — plus one key=b'' marker row per doc
    (bucketed by doc id) so zero-gram docs survive the groupby."""
    import hashlib

    from address_parser_ray.functions.hashing import splitmix64

    def emit(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        extras = t[extra_col].to_pylist() if extra_col else None
        docs, keys, exs = [], [], []
        for row, (d, text) in enumerate(zip(doc_ids, texts)):
            toks = [w.lower() for w in _ws_tokens(text) if w]
            grams = {
                hashlib.blake2b(
                    " ".join(toks[i : i + W]).encode(), digest_size=16
                ).digest()
                for i in range(len(toks) - W + 1)
            }
            docs.append(d)
            keys.append(b"")
            if extras is not None:
                exs.append(extras[row])
            for k in grams:
                docs.append(d)
                keys.append(k)
                if extras is not None:
                    exs.append(extras[row])
        doc_arr = np.asarray(docs, dtype=np.int64)
        pref = np.array(
            [int.from_bytes(k[:8], "little") if k else 0 for k in keys],
            dtype=np.uint64,
        )
        is_marker = np.array([not k for k in keys], dtype=bool)
        mixed = np.where(is_marker, doc_arr.view(np.uint64), pref)
        bucket = (splitmix64(mixed) % np.uint64(nparts)).astype(np.int64)
        cols = {
            "bucket": pa.array(bucket),
            "key": pa.array(keys, type=pa.binary()),
            "doc_id": pa.array(doc_arr),
        }
        if extra_col:
            cols[extra_col] = pa.array(exs, type=pa.string())
        return pa.table(cols)

    return emit


def q_gram_novelty(sf_dir: str):
    """Novelty attribution for training-data curation: a doc's NOVEL
    grams are the distinct 8-token windows it introduces to the corpus —
    i.e. it is the min-doc_id owner of the gram (the dual of
    ``dup_span_stats``: that flavor counts what a doc SHARES, this one
    what it CONTRIBUTES; curation keeps high-novelty docs first). Output
    (doc_id, n_distinct_grams, n_novel_grams); <8-token docs are zeros.
    Same postings shape as dup_span_stats: one content pass, df/min-owner
    per key inside hash buckets, single-key Sum combine."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        marker = g["key"].str.len() == 0
        grams = g[~marker]
        parts = [
            pd.DataFrame(
                {
                    "doc_id": g.loc[marker, "doc_id"].to_numpy(np.int64),
                    "part_nd": np.int64(0),
                    "part_nn": np.int64(0),
                }
            )
        ]
        if len(grams):
            owner = grams.groupby("key")["doc_id"].transform("min")
            novel = (grams["doc_id"].to_numpy(np.int64)
                     == owner.to_numpy(np.int64))
            per = (
                pd.DataFrame(
                    {
                        "doc_id": grams["doc_id"].to_numpy(np.int64),
                        "part_nd": np.int64(1),
                        "part_nn": novel.astype(np.int64),
                    }
                )
                .groupby("doc_id", sort=False, as_index=False)
                .sum()
            )
            parts.append(per)
        out = pd.concat(parts, ignore_index=True)
        for c in ("part_nd", "part_nn"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(
            _span_posting_emitter(None, nparts), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("part_nd", alias_name="n_distinct_grams"),
            Sum("part_nn", alias_name="n_novel_grams"),
        )
        .sort("doc_id")
    )


def q_source_overlap(sf_dir: str):
    """Cross-source contamination matrix: for every source pair, the
    number of DISTINCT 8-token grams present in both (benchmark-leakage /
    crawl-overlap diagnostic — the between-corpora view of
    ``contamination_5gram``). Postings carry the source; each hash
    bucket reduces its keys to distinct (key, source), emits source-pair
    partials, and the composite groupby is domain-tiny (≤ C(n_sources,2)
    rows after per-bucket partials — the accepted composite-key regime).
    Output (source_a, source_b, n_shared_grams), source_a < source_b."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        grams = g[g["key"].str.len() > 0]
        if not len(grams):
            return pd.DataFrame(
                {
                    "source_a": pd.Series([], dtype=object),
                    "source_b": pd.Series([], dtype=object),
                    "part_n": pd.Series([], dtype=np.int64),
                }
            )
        ks = grams[["key", "source"]].drop_duplicates()
        # vectorized pair expansion: factorize sources, lexsort by
        # (key, source code), then one triu expansion per distinct run
        # LENGTH (the simhash bucket trick) — no per-key Python loop
        scode, slabels = pd.factorize(ks["source"], sort=True)
        kcode = pd.factorize(ks["key"], sort=False)[0]
        order = np.lexsort((scode, kcode))
        kc, sc = kcode[order], scode[order]
        change = np.flatnonzero(np.diff(kc)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [kc.size]]))
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2:
                continue
            sel = starts[lens == m]
            sm = sc[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            out_a.append(sm[:, iu].ravel())
            out_b.append(sm[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "source_a": pd.Series([], dtype=object),
                    "source_b": pd.Series([], dtype=object),
                    "part_n": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        out = (
            pd.DataFrame(
                {
                    "source_a": slabels.take(a),
                    "source_b": slabels.take(b),
                }
            )
            .groupby(["source_a", "source_b"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "part_n"})
        )
        out["part_n"] = out["part_n"].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text", "source"])
        .map_batches(
            _span_posting_emitter("source", nparts), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["source_a", "source_b"])
        .aggregate(Sum("part_n", alias_name="n_shared_grams"))
        .sort(["source_a", "source_b"])
    )


def q_lang_counts(sf_dir: str):
    """G-family grouped count (reference run counters,
    ``ner/build_real_dataset.py:176-244``)."""
    return _docs(sf_dir, ["lang"]).groupby("lang").aggregate(Count(alias_name="n"))


def q_doc_stats_by_lang(sf_dir: str):
    """Per-lang size aggregates (int-exact), pre-combined per batch
    (count/sum/max are associative) so the shuffle carries ~5 rows per
    batch instead of every document."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False, as_index=False).agg(
            part_n=("n_chars", "size"),
            part_sum=("n_chars", "sum"),
            part_max=("n_chars", "max"),
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    return (
        _docs(sf_dir, ["lang", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("part_n", alias_name="n_docs"),
            Sum("part_sum", alias_name="sum_chars"),
            Max("part_max", alias_name="max_chars"),
        )
    )


def q_token_counts_by_lang(sf_dir: str):
    """Whitespace token counting, summed per lang (token-counting op)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {"lang": df["lang"], "n_tokens": ws_token_count_series(df["text"])}
        )
        return df.groupby("lang", sort=False, as_index=False).agg(
            part_sum=("n_tokens", "sum")
        )

    return (
        _docs(sf_dir, ["lang", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("part_sum", alias_name="sum_tokens"))
    )


def q_quality_flags(sf_dir: str):
    """Per-doc quality counters (ints only → SQL-exact): token count and
    punctuation count."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": ws_token_count_series(df["text"]),
                "punct_chars": df["text"].fillna("").str.count(r"[.,;:!?]").astype("int64"),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_quality_scores(sf_dir: str):
    """Blended quality score per doc. ``stopword_ratio`` is an exact IEEE
    int/int division (bit-reproducible in SQL); the blended score is
    emitted floor-scaled to 1e3 so a last-ulp ``ln`` difference between
    numpy and the oracle's libm cannot flip the hash."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = quality_features(df["text"])
        out.insert(0, "doc_id", df["doc_id"].values)
        out["quality_score_1e3"] = np.floor(
            out["quality_score"] * 1000.0
        ).astype(np.int64)
        return out[["doc_id", "n_tokens", "stopword_ratio", "quality_score_1e3"]]

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_langid_pred(sf_dir: str):
    """Heuristic language-ID (stopword/CJK n-gram heuristic). Warm state
    (compiled regexes/stopword sets) lives at module import → actor
    reuse.  Fully vectorized since r4: ``detect_lang_batch`` runs the
    CJK-class count + per-lang full-token alternation counts as C-level
    regex passes over the whole batch (the former per-row
    ``map(detect_lang)`` was a Python call per document)."""
    from address_parser_ray.functions.text import detect_lang_batch

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "pred_lang": detect_lang_batch(df["text"]),
                "lang": df["lang"],
            }
        )

    return _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        fn, batch_format="pandas"
    )


def q_top_docs(sf_dir: str):
    """Top-k by size with unique tiebreaker (T1/T2 ranked-sort family)."""
    return (
        _docs(sf_dir, ["doc_id", "n_chars"])
        .sort(["n_chars", "doc_id"], descending=[True, False])
        .limit(20)
    )


def q_distinct_langs(sf_dir: str):
    """Distinct + sort (G7 label-set extraction, ``ner_train.py:93-98``)."""
    langs = sorted(_docs(sf_dir, ["lang"]).unique("lang"))
    return pa.table({"lang": pa.array(langs, type=pa.string())})


def q_hash_split_counts(sf_dir: str):
    """Deterministic key split (T6 Bernoulli split made parallel-safe:
    hash-of-key, here doc_id % 10)."""

    def fn(t: pa.Table) -> pa.Table:
        part = pc.if_else(
            pc.less(_mod(t["doc_id"], 10), 8),
            pa.scalar("train"),
            pa.scalar("test"),
        )
        return pa.table({"part": part})

    return (
        _docs(sf_dir, ["doc_id"])
        .map_batches(fn, batch_format="pyarrow")
        .groupby("part")
        .aggregate(Count(alias_name="n"))
    )


def _mod(arr, k: int):
    return pc.subtract(arr, pc.multiply(pc.divide(arr, k), k))


def q_filter_union_counts(sf_dir: str):
    """Filter + union-all + grouped count (D1 dataset union,
    ``ner/merge_datasets.py:32-38``)."""
    en = _docs(sf_dir, ["source", "lang", "n_chars"]).filter(
        expr="lang == 'en' and n_chars > 300"
    )
    de = _docs(sf_dir, ["source", "lang", "n_chars"]).filter(expr="lang == 'de'")
    return en.union(de).groupby("source").aggregate(Count(alias_name="n"))


# ---------------------------------------------------------------------------
# Relational (J1 snowflake joins, G aggregates, T top-k)
# ---------------------------------------------------------------------------


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0).astype(np.int64)


def q_orders_by_nation(sf_dir: str):
    """customer⋈nation⋈orders rollup (J1 FK assembly,
    ``ner/build_standard_dataset.py:650-698``). Both join sides are
    DIMENSIONS (customer, nation) — broadcast via ``ray.put`` and looked
    up per batch; only the orders fact table streams."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    # customer → nation NAME, collapsed once on the driver: one sorted
    # key array + one parallel nation-name-index array, broadcast to every
    # task (searchsorted lookup — no per-row dict probes)
    ckeys = np.asarray(cust["c_custkey"]).astype(np.int64)
    cnat = np.asarray(cust["c_nationkey"]).astype(np.int64)
    order = np.argsort(ckeys)
    nkeys = np.asarray(nation["n_nationkey"]).astype(np.int64)
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    norder = np.argsort(nkeys)
    name_idx = norder[np.searchsorted(nkeys[norder], cnat[order])]
    dims_ref = ray.put((ckeys[order], nnames, name_idx))

    def add_cents(t: pa.Table) -> pa.Table:
        ck, names_u, nidx = ray.get(dims_ref)
        cents = _cents(np.asarray(t["o_totalprice"], dtype=np.float64))
        pos = np.searchsorted(ck, np.asarray(t["o_custkey"]).astype(np.int64))
        names = names_u[nidx[pos]]
        return pa.table(
            {"n_name": pa.array(names, type=pa.string()), "cents": pa.array(cents)}
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )
    return (
        orders.map_batches(add_cents, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
    )


def q_revenue_rollup(sf_dir: str):
    """Hierarchical rollup (GROUPING SETS analogue): order revenue at
    (region, nation), (region), and grand-total levels. ONE streaming
    pass aggregates at the finest grain (dims broadcast, searchsorted
    lookups — same shape as orders_by_nation); the coarser levels are
    derived from the resulting nation panel, which is bounded by the
    dimension cardinality (25 rows) regardless of fact volume — never a
    second scan. 'ALL' marks rolled-up levels."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])

    ckeys = np.asarray(cust["c_custkey"]).astype(np.int64)
    cnat = np.asarray(cust["c_nationkey"]).astype(np.int64)
    corder = np.argsort(ckeys)
    nkeys = np.asarray(nation["n_nationkey"]).astype(np.int64)
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)
    nreg = np.asarray(nation["n_regionkey"]).astype(np.int64)
    norder = np.argsort(nkeys)
    rkeys = np.asarray(region["r_regionkey"]).astype(np.int64)
    rnames = np.asarray(region["r_name"].to_pylist(), dtype=object)
    rorder = np.argsort(rkeys)

    nidx = norder[np.searchsorted(nkeys[norder], cnat[corder])]
    ridx = rorder[np.searchsorted(rkeys[rorder], nreg[nidx])]
    dims_ref = ray.put((ckeys[corder], nnames[nidx], rnames[ridx]))

    def add_dims(t: pa.Table) -> pa.Table:
        ck, nat_of, reg_of = ray.get(dims_ref)
        pos = np.searchsorted(ck, np.asarray(t["o_custkey"]).astype(np.int64))
        return pa.table(
            {
                "r_name": pa.array(reg_of[pos], type=pa.string()),
                "n_name": pa.array(nat_of[pos], type=pa.string()),
                "cents": pa.array(
                    _cents(np.asarray(t["o_totalprice"], dtype=np.float64))
                ),
            }
        )

    fine = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
        )
        .map_batches(add_dims, batch_format="pyarrow")
        .groupby(["r_name", "n_name"])
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents"))
        .to_pandas()
    )
    by_region = fine.groupby("r_name", as_index=False)[["n_orders", "total_cents"]].sum()
    by_region["n_name"] = "ALL"
    total = pd.DataFrame(
        {
            "r_name": ["ALL"],
            "n_name": ["ALL"],
            "n_orders": [fine["n_orders"].sum()],
            "total_cents": [fine["total_cents"].sum()],
        }
    )
    out = pd.concat([fine, by_region, total], ignore_index=True)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    out["total_cents"] = out["total_cents"].astype(np.int64)
    return out[["r_name", "n_name", "n_orders", "total_cents"]]


def q_tfidf_top_terms(sf_dir: str):
    """Per-lang top-5 terms by tf-idf with an INTEGER idf weight
    (``(L*1000) // df``, L = distinct langs) so ranking is exact on both
    sides — no float log parity games. ONE shuffle: the (lang, token)
    partial counts group by TOKEN, where each group computes its own
    document frequency (df = langs containing it) and scores every
    (lang, tf) row; the per-lang top-5 runs over the scored panel
    (bounded by vocabulary). The classic keyword-extraction op."""
    docs = _docs(sf_dir, ["lang", "text"])
    # tiny distinct aggregate over a lang-only read (never drags text)
    n_langs = len(_docs(sf_dir, ["lang"]).unique("lang"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _bpe_findall(df["text"])
        n = toks.str.len().to_numpy()
        if n.sum() == 0:
            return pd.DataFrame({"lang": [], "token": [], "part_n": []}).astype(
                {"lang": str, "token": str, "part_n": np.int64}
            )
        flat = pd.DataFrame(
            {
                "lang": np.repeat(df["lang"].to_numpy(), n),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        g = flat.groupby(["lang", "token"], sort=False, as_index=False).agg(
            part_n=("token", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    # df + scoring is bucketed by token HASH (one Python call per bucket,
    # vectorized inside — the per-key map_groups trap avoided), because a
    # real vocabulary has millions of tokens. The (lang, token) partial
    # combine folds into the SAME bucket pass (a token's rows all land in
    # its bucket), replacing the pathological composite-key
    # sort-aggregate (see q_event_value_percentiles) — one shuffle total
    # before the per-lang top-k.
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tb"] = (
            pd.util.hash_pandas_object(df["token"], index=False).to_numpy()
            % nparts
        ).astype(np.int64)
        return df

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["lang", "token"], as_index=False)["part_n"].sum()
        g = g.rename(columns={"part_n": "tf"})
        df_count = g.groupby("token")["lang"].transform("size").to_numpy()
        idf_int = (n_langs * 1000) // df_count
        out = g[["lang", "token", "tf"]].copy()
        out["score"] = (out["tf"].to_numpy(dtype=np.int64) * idf_int).astype(np.int64)
        return out

    scored = (
        docs.map_batches(partial, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("tb")
        .map_groups(score_bucket, batch_format="pandas")
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", "token"], ascending=[False, True]).head(5)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "rank", "token", "score"]]

    return scored.groupby("lang").map_groups(topk, batch_format="pandas")


def q_pricing_summary(sf_dir: str):
    """Lineitem pricing rollup (the G1-style grouped aggregate)."""
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                # l_quantity is integral-valued double; sum as int64 so the
                # aggregate dtype matches the oracle's CAST(sum(...) AS BIGINT).
                "l_quantity": pc.cast(t["l_quantity"], pa.int64()),
                "price_cents": pa.array(
                    _cents(np.asarray(t["l_extendedprice"], dtype=np.float64))
                ),
            }
        )

    return (
        li.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("price_cents", alias_name="sum_price_cents"),
            Count(alias_name="count_order"),
        )
    )


def q_top_customers(sf_dir: str):
    """Join + rollup + ranked top-k (T1 most_common analogue)."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def add_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_custkey": t["o_custkey"],
                "cents": pa.array(_cents(np.asarray(t["o_totalprice"], dtype=np.float64))),
            }
        )

    totals = (
        orders.map_batches(add_cents, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("cents", alias_name="total_cents"), Count(alias_name="n_orders"))
    )
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    # broadcast-dim lookup as sorted arrays + searchsorted (the
    # orders_by_nation idiom) — no per-row dict lookups in the map
    ckeys = np.asarray(cust["c_custkey"].combine_chunks()).astype(np.int64)
    corder = np.argsort(ckeys)
    names_ref = ray.put(
        (ckeys[corder], cust["c_name"].combine_chunks().take(pa.array(corder)))
    )

    def attach_name(t: pa.Table) -> pa.Table:
        keys_sorted, names = ray.get(names_ref)
        k = np.asarray(t["o_custkey"]).astype(np.int64)
        pos = np.searchsorted(keys_sorted, k)
        return pa.table(
            {
                "c_custkey": t["o_custkey"],
                "c_name": names.take(pa.array(pos)),
                "total_cents": t["total_cents"],
                "n_orders": t["n_orders"],
            }
        )

    return (
        totals.sort(["total_cents", "o_custkey"], descending=[True, False])
        .limit(10)
        .map_batches(attach_name, batch_format="pyarrow")
    )


def q_events_hourly(sf_dir: str):
    """Tumbling-window aggregate over the events log — Ray Data has no
    event-time windows, so the window is the group key
    (ray_guide "Streaming-shaped workloads"). Aggregation is PARTIAL
    inside ``map_batches`` (arrow group_by per batch: count+sum are
    associative) — ~2k partial rows per batch enter the shuffle instead
    of every event row. Ordering assumption: none."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "hour": df["ts"].dt.floor("h"),
                "value_cents": np.floor(df["value"].to_numpy() * 100.0).astype(np.int64),
            }
        )
        g = df.groupby(["event_type", "hour"], sort=False, as_index=False).agg(
            part_n=("value_cents", "size"), part_sum=("value_cents", "sum")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    # partials combine inside a per-type map_groups (one single-key
    # shuffle; composite-key aggregates are pathological in Ray 2.49 —
    # see q_event_value_percentiles). Per-type fan-in = hours × blocks.
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("hour", as_index=False).agg(
            n_events=("part_n", "sum"), sum_value_cents=("part_sum", "sum")
        )
        h.insert(0, "event_type", g["event_type"].iloc[0])
        h["n_events"] = h["n_events"].astype(np.int64)
        h["sum_value_cents"] = h["sum_value_cents"].astype(np.int64)
        return h

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )


def q_events_sliding_3h(sf_dir: str):
    """SLIDING-window aggregate (trailing 3 h count per event type, one
    row per occupied hour) — the moving-window sibling of the tumbling
    ``events_hourly``. The heavy reduction is the same partial hourly
    pre-aggregation; the window itself runs over the compacted
    (event_type, hour) panel — thousands of rows regardless of event
    volume — as one vectorized prefix-sum + ``searchsorted`` pass per
    event_type group."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"event_type": df["event_type"], "hour": df["ts"].dt.floor("h")}
        ).groupby(["event_type", "hour"], sort=False, as_index=False).agg(
            part_n=("hour", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    # hourly combine folds into the same per-type map_groups as the
    # window pass — one single-key shuffle total (see events_hourly)
    def window(g: pd.DataFrame) -> pd.DataFrame:
        et = g["event_type"].iloc[0]
        g = g.groupby("hour", as_index=False)["part_n"].sum()
        g = g.sort_values("hour").reset_index(drop=True)
        h = g["hour"].to_numpy().astype("datetime64[h]").astype(np.int64)
        n = g["part_n"].to_numpy(dtype=np.int64)
        pre = np.concatenate([[0], np.cumsum(n)])
        lo = np.searchsorted(h, h - 2, side="left")
        return pd.DataFrame(
            {
                "event_type": et,
                "hour": g["hour"],
                "n_3h": pre[np.arange(1, len(h) + 1)] - pre[lo],
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(window, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embeddings: similarity search
# ---------------------------------------------------------------------------


def _seed_embedding_rows(sf_dir: str, k: int) -> tuple[np.ndarray, np.ndarray]:
    """The k smallest-vec_id embedding rows as (vec_ids asc, (k, d)
    float64 matrix) — the shared seed-row rule of the IVF / LSH /
    k-means-update / kNN queries, computed DISTRIBUTED: each batch
    emits only its own k smallest-id rows (vectorized argpartition
    partials, the ``kmeans._seed_centroids`` idiom), so the driver
    combines a (blocks × k) panel instead of reading the whole
    embedding table through one process (the former driver-side
    ``pq.read_table`` is one process's bandwidth at 100 TB)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        if len(vids) > k:
            idx = np.argpartition(vids, k - 1)[:k]
            t = t.take(pa.array(np.sort(idx)))
        return t

    panel = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
        .sort_values("vec_id", kind="stable")
        .head(k)
    )
    vids = panel["vec_id"].to_numpy(np.int64)
    emb = np.stack(panel["embedding"].to_numpy()).astype(np.float64)
    return vids, emb


def _load_query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    """One embedding row by id — a FILTERED distributed read (row-group
    pruning at the scan), not a whole-table driver read."""
    import pyarrow.dataset as pads

    panel = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filter=(pads.field("vec_id") == vec_id),
    ).to_pandas()
    return np.asarray(panel["embedding"].iloc[0], dtype=np.float64)


def q_embedding_topk(sf_dir: str):
    """Brute-force cosine top-k against one query vector: the query is
    broadcast (closure-captured ndarray), each batch does one matmul —
    the baseline ANN path."""
    q = _load_query_vec(sf_dir, 0)
    qn = q / np.linalg.norm(q)

    def score(t: pa.Table) -> pa.Table:
        emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        emb = emb.reshape(len(t), -1)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (emb @ qn) / norms
        return pa.table(
            {
                "vec_id": t["vec_id"],
                # +1e-7 before flooring (mirrored in the oracle SQL): a
                # 1-ulp numpy-vs-DuckDB difference exactly at a 1e-6
                # boundary must not flip the bucket (same convention as
                # content_score_histogram / gram_novelty).
                "cos_sim": pa.array(np.floor(cos * 1e6 + 1e-7) / 1e6),
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return ds.sort(["cos_sim", "vec_id"], descending=[True, False]).limit(10)


def q_knn_bruteforce(sf_dir: str):
    """k-NN for the first 5 vectors (query matrix broadcast once, one
    matmul per batch). Returns (query_vec_id, neighbor_vec_id, rank),
    rank by (cos desc, vec_id) excluding self. Non-SQL (float ordering
    kept internal; output is int-only → robust hashing)."""
    qids, Q = _seed_embedding_rows(sf_dir, 5)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qref = ray.put((qids, Qn))

    class KnnScorer:
        def __init__(self):
            self.qids, self.Qn = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
            emb = emb.reshape(len(t), -1)
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            emb = emb / norms[:, None]
            cos = emb @ self.Qn.T  # (n, 5)
            n = len(t)
            vid = np.asarray(t["vec_id"], dtype=np.int64)
            return pa.table(
                {
                    "query_vec_id": pa.array(np.repeat(self.qids, n)),
                    "neighbor_vec_id": pa.array(np.tile(vid, len(self.qids))),
                    "cos": pa.array(cos.T.reshape(-1)),
                }
            )

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(KnnScorer, batch_format="pyarrow", concurrency=(1, 4))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group[group["neighbor_vec_id"] != group["query_vec_id"]]
        g = g.sort_values(["cos", "neighbor_vec_id"], ascending=[False, True]).head(3)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "neighbor_vec_id", "rank"]]

    return scored.groupby("query_vec_id").map_groups(topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# Multimodal (binary payload plumbing; decode stubbed — no media libs here)
# ---------------------------------------------------------------------------


def q_media_sizes(sf_dir: str):
    """Opaque-binary metadata pass: payload byte size per doc. The text
    column stands in for an image/audio blob; the plumbing (binary column
    → vectorized metadata) is the real thing."""

    def fn(t: pa.Table) -> pa.Table:
        blob = pc.cast(t["text"], pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pc.cast(pc.binary_length(blob), pa.int64()),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


class MediaFeatureExtractor:
    """Actor-pool multimodal stage with a REAL decoder: payloads are
    binary PGM images (synthesized deterministically from the doc bytes —
    the testdata has no media column — but every byte of the decode path
    is real: header parse → raster view → vectorized features). Formats
    that need codec libraries (JPEG/PNG) raise NotImplementedError with
    the codec name; see ``functions/media.py``."""

    def __init__(self):
        from address_parser_ray.functions.media import (
            decode_image,
            raster_features,
            synth_pgm_from_bytes,
        )

        self._decode = decode_image
        self._features = raster_features
        self._synth = synth_pgm_from_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = [
            self._synth((x or "").encode("utf-8")) for x in t["text"].to_pylist()
        ]
        rows = []
        for p in payloads:
            w, h, raster = self._decode(p)
            rows.append({"width": w, "height": h, **self._features(raster)})
        cols = {"doc_id": t["doc_id"]}
        for k in ("width", "height", "mean_gray_1e4", "std_gray_1e4",
                  "nonzero_px", "edge_energy_1e4"):
            cols[k] = pa.array([r[k] for r in rows], type=pa.int64())
        return pa.table(cols)


def q_media_features(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# Per-group picks / top-k (J5 pick-best, T1 most_common)
# ---------------------------------------------------------------------------


_WINNOW_PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64())]
)


def q_winnow_dup_pairs(sf_dir: str):
    """Winnowing near-dup (Schleimer et al., SIGMOD'03 — the MOSS
    scheme): per doc, min-hash per sliding window of positional shingles
    → fingerprint set; docs sharing ≥ 5 fingerprints are candidate dups.
    Fingerprints appearing in > 64 docs are dropped (boilerplate), hot
    groups are capped — the 6th dedup flavor. Non-SQL (positional
    winnowing semantics)."""
    from address_parser_ray.functions.hashing import (
        char_shingle_hashes_positional,
        splitmix64,
        winnow_fingerprints,
    )
    from address_parser_ray.functions.normalize import normalize_content_arrow
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    MIN_SHARED, MAX_GROUP = 5, 64

    def fingerprint(t: pa.Table) -> pa.Table:
        norm = normalize_content_arrow(t["text"]).to_pylist()
        ids = t["doc_id"].to_pylist()
        fp_parts, id_parts = [], []
        for d, x in zip(ids, norm):
            fps = winnow_fingerprints(char_shingle_hashes_positional(x or "", 8), 16)
            fp_parts.append(fps)
            id_parts.append(np.full(fps.size, d, dtype=np.int64))
        fp = np.concatenate(fp_parts) if fp_parts else np.empty(0, np.uint64)
        did = np.concatenate(id_parts) if id_parts else np.empty(0, np.int64)
        bucket = (splitmix64(fp) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "fp": pa.array(fp.view(np.int64)),
                "doc_id": pa.array(did),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        fp = np.asarray(group["fp"], dtype=np.int64)
        ids = np.asarray(group["doc_id"], dtype=np.int64)
        order = np.lexsort((ids, fp))
        fp, ids = fp[order], ids[order]
        keep = np.concatenate([[True], (fp[1:] != fp[:-1]) | (ids[1:] != ids[:-1])])
        fp, ids = fp[keep], ids[keep]
        if fp.size < 2:
            return _WINNOW_PAIR_SCHEMA.empty_table()
        change = np.flatnonzero(np.diff(fp)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [fp.size]]))
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2 or m > MAX_GROUP:  # singleton or boilerplate fp
                continue
            sel = starts[lens == m]
            idm = ids[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            out_a.append(idm[:, iu].ravel())
            out_b.append(idm[:, ju].ravel())
        if not out_a:
            return _WINNOW_PAIR_SCHEMA.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a)),
                "id_b": pa.array(np.concatenate(out_b)),
            }
        )

    exploded = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint, batch_format="pyarrow", zero_copy_batch=True
    )
    cand = exploded.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    # shared-fingerprint count per pair via a pair-hash bucket + one
    # vectorized run-length pass per bucket (composite-key aggregates
    # sort the whole pair stream in Ray 2.49 — see
    # q_event_value_percentiles)
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        a = np.asarray(t["id_a"]).astype(np.int64)
        b = np.asarray(t["id_b"]).astype(np.int64)
        pb = (
            splitmix64(splitmix64(a.view(np.uint64)) ^ b.view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)
        return t.append_column("pb", pa.array(pb))

    def count_shared(g: pa.Table) -> pa.Table:
        a = np.asarray(g["id_a"], dtype=np.int64)
        b = np.asarray(g["id_b"], dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.concatenate([[True], (a[1:] != a[:-1]) | (b[1:] != b[:-1])])
        starts = np.flatnonzero(first)
        n = np.diff(np.concatenate([starts, [a.size]]))
        keep = n >= MIN_SHARED
        return pa.table(
            {
                "id_a": pa.array(a[starts][keep]),
                "id_b": pa.array(b[starts][keep]),
                "n_shared": pa.array(n[keep].astype(np.int64)),
            }
        )

    return (
        cand.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(count_shared, batch_format="pyarrow")
    )


def q_shuffle_split_write(sf_dir: str):
    """T5 (``ner/merge_datasets.py:85-99``): seeded random_shuffle →
    split_proportionately([0.9]) → partitioned parquet write, counts
    read back from the WRITTEN files. Oracle: floor-based split sizes."""
    import os
    import tempfile

    from address_parser_ray.pipelines.split import (
        shuffle_split_write,
        split_counts_table,
    )

    out = os.path.join(
        tempfile.gettempdir(),
        f"apr_split_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    counts = shuffle_split_write(
        _docs(sf_dir, ["doc_id", "text", "lang"]), out, proportions=[0.9]
    )
    return split_counts_table(counts)


def q_model_langid(sf_dir: str):
    """Warm-heavy-state model inference (reference A3,
    ``ner/ner_train.py:181-189``): a ~6 MB hashing-trick linear
    classifier loads once per actor and predicts language per doc,
    batched. Non-SQL (model semantics); deterministic output."""
    from address_parser_ray.stages.inference import model_inference_stage

    return model_inference_stage(_docs(sf_dir, ["doc_id", "text"]))


def q_largest_doc_per_lang(sf_dir: str):
    """Per-group argmax with deterministic tiebreak (J5 fallback-to-first
    made 'min id wins', ``fuzz/inexus_parser.py:1396-1443``)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return g.head(1)[["lang", "doc_id", "n_chars"]]

    return (
        _docs(sf_dir, ["lang", "doc_id", "n_chars"])
        .groupby("lang")
        .map_groups(pick, batch_format="pandas")
    )


def q_top3_docs_per_source(sf_dir: str):
    """Per-group top-k (T1 ``counter.most_common``, inexus_parser.py:2680)."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(3)
        return g[["source", "doc_id", "n_chars"]]

    return (
        _docs(sf_dir, ["source", "doc_id", "n_chars"])
        .groupby("source")
        .map_groups(pick, batch_format="pandas")
    )


def q_customers_without_orders(sf_dir: str):
    """Distributed ANTI-join (J7's set-subtraction shape lifted to the
    relational level): customers with no HIGH-VALUE order (>= 300k),
    via the bucketed reduce-side join with ``join_type="left anti"`` —
    the anti side ships only its DISTINCT keys through the shuffle
    (orders are row-filtered AT THE READ, key-projected and
    pre-deduplicated per batch), so the probe stream is bounded by
    distinct qualifying customers, not order volume."""
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_acctbal"]
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_totalprice") >= 300000.0,
    )

    def dedup_keys(t: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(t["o_custkey"], dtype=np.int64))
        return pa.table({"o_custkey": pa.array(k)})

    def add_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "c_name": t["c_name"],
                "acctbal_cents": pa.array(
                    _cents(np.asarray(t["c_acctbal"], dtype=np.float64))
                ),
            }
        )

    return pinned_join(
        cust.map_batches(add_cents, batch_format="pyarrow"),
        orders.map_batches(dedup_keys, batch_format="pyarrow"),
        on="c_custkey",
        right_on="o_custkey",
        join_type="left anti",
    )


# ---------------------------------------------------------------------------
# Broadcast dimension join (A2/J1: small side via ray.put, no shuffle)
# ---------------------------------------------------------------------------


def q_customers_per_region(sf_dir: str):
    """customer⋈nation⋈region rollup with BOTH dims broadcast (the A2
    pattern: reference-name maps held in memory, ``hcmut_assigment/
    main.py:44-55`` — here an object-store ref read once per task)."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    n2r = dict(zip(nation["n_nationkey"].to_pylist(), nation["n_regionkey"].to_pylist()))
    r2name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    dims_ref = ray.put((n2r, r2name))

    def lookup(t: pa.Table) -> pa.Table:
        n2r_, r2name_ = ray.get(dims_ref)
        nk = t["c_nationkey"].to_pylist()
        return pa.table(
            {"r_name": pa.array([r2name_[n2r_[k]] for k in nk], type=pa.string())}
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])
        .map_batches(lookup, batch_format="pyarrow")
        .groupby("r_name")
        .aggregate(Count(alias_name="n_customers"))
    )


# ---------------------------------------------------------------------------
# Event-log custom operators: as-of join, sessionization (ray_guide
# "Streaming-shaped workloads"; ordering assumption: sort per user group)
# ---------------------------------------------------------------------------


def _add_user_bucket(nparts: int):
    """user_id → shuffle bucket (hash, not sort, and far fewer groups
    than distinct users — ``map_groups`` costs one Python call per key)."""
    from address_parser_ray.functions.hashing import splitmix64

    def fn(t: pa.Table) -> pa.Table:
        uid = np.asarray(t["user_id"]).astype(np.int64)
        b = (splitmix64(uid.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("bucket", pa.array(b))

    return fn


def q_purchase_last_click(sf_dir: str):
    """As-of join: for each purchase, the most recent click at-or-before
    it by the same user (backward, exact matches allowed). Users are
    hash-bucketed; within a bucket one vectorized pass (lexsort + per-user
    cummax of click timestamps) answers every purchase — one Python call
    per BUCKET, not per user. Partitioning assumption: one bucket holds
    ALL of a user's events."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .filter(expr="event_type == 'purchase' or event_type == 'click'")
        .map_batches(_add_user_bucket(nparts), batch_format="pyarrow")
    )

    TMIN = np.iinfo(np.int64).min

    def asof_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy()
        tsi = ts.view("i8")
        eid = g["event_id"].to_numpy(dtype=np.int64)
        is_click = (g["event_type"] == "click").to_numpy()
        # clicks sort before purchases at equal (user, ts): exact-match
        # clicks are eligible (allow_exact_matches=True semantics)
        order = np.lexsort((eid, ~is_click, tsi, uid))
        uid, ts, tsi, eid, is_click = (
            uid[order], ts[order], tsi[order], eid[order], is_click[order]
        )
        click_ts = np.where(is_click, tsi, TMIN)
        # per-user running max of click ts (C-level groupby cummax)
        last = pd.Series(click_ts).groupby(uid).cummax().to_numpy()
        keep = (~is_click) & (last > TMIN)
        return pd.DataFrame(
            {
                "event_id": eid[keep],
                "user_id": uid[keep],
                "last_click_ts": last[keep].view(ts.dtype),
            }
        )

    return ev.groupby("bucket").map_groups(asof_bucket, batch_format="pandas")


def q_user_sessions(sf_dir: str):
    """Sessionization: per-user session count with a 30-minute idle gap.
    Users are hash-bucketed; one vectorized pass per bucket (lexsort +
    boundary diff + ``np.add.reduceat``) — no per-user Python calls."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_add_user_bucket(nparts), batch_format="pyarrow")

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        tsi = g["ts"].to_numpy().view("i8")  # µs since epoch
        order = np.lexsort((tsi, uid))
        uid, tsi = uid[order], tsi[order]
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate(
            [[True], (tsi[1:] - tsi[:-1]) > 1_800_000_000]
        )  # 30 min in µs
        new_sess = (first | gap).astype(np.int64)
        starts = np.flatnonzero(first)
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "n_events": np.diff(np.concatenate([starts, [uid.size]])),
                "n_sessions": np.add.reduceat(new_sess, starts),
            }
        )

    return ev.groupby("bucket").map_groups(sessions_bucket, batch_format="pandas")


def q_purchase_clicks_1h(sf_dir: str):
    """Bounded-interval RANGE join (the windowed sibling of the as-of
    join above): for each purchase, the number of same-user clicks in
    (ts − 1h, ts]. Users are hash-bucketed (same partitioning assumption:
    one bucket holds all of a user's events); within a bucket clicks are
    sorted once on a dense (user, ts) composite key and every purchase's
    window is answered by two ``np.searchsorted`` probes — one vectorized
    pass per bucket, no per-user Python and no pairwise blow-up."""
    from address_parser_ray.rayutil import default_num_partitions

    WINDOW_US = 3_600_000_000

    nparts = default_num_partitions()
    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type"],
        )
        .filter(expr="event_type == 'purchase' or event_type == 'click'")
        .map_batches(_add_user_bucket(nparts), batch_format="pyarrow")
    )

    def window_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        tsi = g["ts"].to_numpy().view("i8")  # µs since epoch
        eid = g["event_id"].to_numpy(dtype=np.int64)
        is_click = (g["event_type"] == "click").to_numpy()
        # dense per-bucket user index → (user, ts) packs into ONE int64:
        # segment width = span + window + 2 keeps users disjoint even for
        # the lo probe at ts − 1h. Bucket-local, so no global-id overflow.
        uniq, du = np.unique(uid, return_inverse=True)
        rel = tsi - tsi.min()
        seg = np.int64(rel.max()) + WINDOW_US + 2
        if len(uniq) * seg >= np.iinfo(np.int64).max:
            raise OverflowError(
                "bucket (users × time-span) exceeds int64 packing; "
                "raise the bucket fan-out (default_num_partitions)"
            )
        comp = du * seg + rel + WINDOW_US
        clicks = np.sort(comp[is_click])
        p = ~is_click
        hi = np.searchsorted(clicks, comp[p], side="right")
        lo = np.searchsorted(clicks, comp[p] - WINDOW_US, side="right")
        return pd.DataFrame(
            {
                "event_id": eid[p],
                "user_id": uid[p],
                "n_clicks_1h": (hi - lo).astype(np.int64),
            }
        )

    return ev.groupby("bucket").map_groups(window_bucket, batch_format="pandas")


def q_event_value_extremes(sf_dir: str):
    """Min/max/count per event type (G5 latency-stats analogue,
    ``hcmut_assigment/scorer.py:110-116``), int-exact via floor-cents."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": t["event_type"],
                "cents": pa.array(_cents(np.asarray(t["value"], dtype=np.float64))),
            }
        )

    return (
        ev.map_batches(prep, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(
            Min("cents", alias_name="min_cents"),
            Max("cents", alias_name="max_cents"),
            Count(alias_name="n"),
        )
    )


def q_event_value_percentiles(sf_dir: str):
    """EXACT distributed percentiles (p50/p90/p99 per event type) via a
    bounded value histogram: values floor to int cents (the repo-wide
    determinism trick), the heavy pass is a partial (event_type, cents)
    count inside ``map_batches``, and the quantile selection runs over
    the compacted histogram — thousands of rows regardless of event
    volume (same shape as the sliding window's hourly panel). Rank rule
    is pure-integer on both sides (``rank_p = (p*n + 99) // 100``,
    answer = smallest cents with cumulative count >= rank) so parity
    does not depend on float quantile semantics.

    Shuffle note: the partials are combined inside the SAME per-type
    ``map_groups`` that selects the quantiles — ONE single-key shuffle.
    (Ray 2.49's composite-key sort-aggregate on (event_type, cents) was
    measured pathologically slow: 22 s for a 98 k-row partial panel vs
    ~3 s for this shape.) Per-type fan-in is bounded by distinct cents ×
    upstream blocks — the value DOMAIN, not event volume. At 100 TB this
    is the scale path for exact quantiles over bounded-domain values;
    unbounded domains swap the histogram for the log-bucketed sketch
    (``q_event_value_log_hist``)."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "cents": _cents(df["value"].to_numpy(dtype=np.float64)),
            }
        ).groupby(["event_type", "cents"], sort=False, as_index=False).agg(
            part_n=("cents", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    parts = ev.map_batches(partial, batch_format="pandas")

    def quantiles(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("cents", as_index=False, sort=True)["part_n"].sum()
        cents = h["cents"].to_numpy(dtype=np.int64)
        cum = np.cumsum(h["part_n"].to_numpy(dtype=np.int64))
        total = int(cum[-1])
        out = {"event_type": [g["event_type"].iloc[0]], "n": [total]}
        for p in (50, 90, 99):
            rank = (p * total + 99) // 100
            out[f"p{p}_cents"] = [int(cents[np.searchsorted(cum, rank, side="left")])]
        return pd.DataFrame(out)

    return parts.groupby("event_type").map_groups(quantiles, batch_format="pandas")


# ---------------------------------------------------------------------------
# Sketches + sampling over documents (KMV distinct, stratified sample)
# ---------------------------------------------------------------------------

_KMV_K = 64
_HEXVAL = {c: i for i, c in enumerate("0123456789abcdef")}


def _fixture_cache_dir(suffix: str) -> str:
    """Fixture-corpus cache dir for the synthetic-eval queries: rooted at
    env ``APR_FIXTURE_CACHE_ROOT`` (default /tmp) and param-suffixed so
    runs with different generator parameters cannot collide (identical
    params produce byte-identical corpora — reuse is safe)."""
    import os

    root = os.environ.get("APR_FIXTURE_CACHE_ROOT", "/tmp")
    return os.path.join(root, f"apr_qgen_corpus{suffix}")


def _id_rank60(ids: np.ndarray, salt: int) -> np.ndarray:
    """Uniform 60-bit per-id sampling priority, fully vectorized —
    ``splitmix64(id + salt) >> 4`` (the retired idiom was a per-row
    ``hashlib.md5(f"tag:{id}")`` loop).  SQL twin:
    ``sm64((doc_id + salt) % 2^64) // 16`` via the shared macro
    prelude.  Distinct salts keep the samplers' draws independent."""
    from address_parser_ray.functions.hashing import splitmix64

    with np.errstate(over="ignore"):
        h = splitmix64(np.asarray(ids, dtype=np.int64).view(np.uint64) + np.uint64(salt))
    return (h >> np.uint64(4)).astype(np.int64)


def _text_60bit(texts) -> np.ndarray:
    """60-bit content hash of a string column, fully vectorized (ONE
    polynomial prefix pass over the concatenated UTF-8 bytes — the
    ``functions.hashing.text_hash60`` kernel; no per-row Python, unlike
    the retired per-row ``hashlib.md5`` fold).  The same value DuckDB
    derives via the ``strh60`` macro, so sketches stay exactly
    SQL-checkable."""
    from address_parser_ray.functions.hashing import text_hash60

    return text_hash60(texts)


def q_distinct_kmv(sf_dir: str):
    """KMV (k-minimum-values) distinct-count sketch per lang: keep the
    k=64 smallest distinct 60-bit hashes of each document text; estimate
    ``(k-1) * 2^60 // h_k`` when the sketch saturates, exact count
    below. The sketch is MERGEABLE — each batch emits at most k rows per
    lang, so the shuffle carries O(k x langs x batches) rows no matter
    the corpus size (the histogram-panel discipline again). Estimator:
    Bar-Yossef et al. 2002 / Beyer et al. SIGMOD'07 (public). Integer
    arithmetic end-to-end (Python int << 60 / DuckDB HUGEINT) so the
    oracle hash-matches bit-for-bit."""
    docs = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _text_60bit(df["text"].tolist())
        g = pd.DataFrame({"lang": df["lang"], "h": h}).drop_duplicates()
        g = g.sort_values("h", kind="stable").groupby("lang", sort=False).head(_KMV_K)
        return g.reset_index(drop=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u = np.unique(g["h"].to_numpy(dtype=np.int64))
        if len(u) >= _KMV_K:
            est = ((_KMV_K - 1) << 60) // int(u[_KMV_K - 1])
        else:
            est = len(u)
        return pd.DataFrame(
            {"lang": [g["lang"].iloc[0]], "est_distinct": np.array([est], dtype=np.int64)}
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


_BPE_RE = None  # compiled lazily per process (regex compile once, A1 discipline)


def _bpe_findall(texts: pd.Series):
    """BPE-ish pre-tokenizer (letter runs | digit runs | symbol runs) —
    the GPT-2-style split classes without the contraction cases; compiled
    with re.ASCII so ``\\s`` matches RE2's class exactly (the oracle runs
    the same pattern through DuckDB's regexp_extract_all)."""
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+", re.ASCII)
    return texts.fillna("").str.findall(_BPE_RE)


def q_vocab_stats(sf_dir: str):
    """Vocabulary build over BPE-ish tokens — the canonical word-count
    shuffle of every training-data pipeline: per-batch PARTIAL
    (lang, token) counts (shuffle volume bounded by per-batch vocab, not
    token occurrences), a (lang, token) groupby-sum, then a tiny per-lang
    reduction to vocab size / total tokens / most-frequent token
    (tie → lexicographically smallest). Token classes are letter / digit
    / symbol runs (the BPE pre-tokenizer split), full SQL oracle."""
    docs = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _bpe_findall(df["text"])
        n = toks.str.len().to_numpy()
        if n.sum() == 0:
            return pd.DataFrame({"lang": [], "token": [], "part_n": []}).astype(
                {"lang": str, "token": str, "part_n": np.int64}
            )
        flat = pd.DataFrame(
            {
                "lang": np.repeat(df["lang"].to_numpy(), n),
                "token": np.concatenate(toks.to_numpy()),
            }
        )
        g = flat.groupby(["lang", "token"], sort=False, as_index=False).agg(
            part_n=("token", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    parts = docs.map_batches(partial, batch_format="pandas")

    # partials combine INSIDE the per-lang map_groups — one single-key
    # shuffle (Ray 2.49's composite-key sort-aggregate is pathologically
    # slow; see q_event_value_percentiles). Per-lang fan-in is bounded
    # by that lang's vocabulary × upstream blocks, the same bound the
    # composite panel had.
    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("token", as_index=False)["part_n"].sum()
        top = h.sort_values(["part_n", "token"], ascending=[False, True]).iloc[0]
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "vocab_size": np.array([len(h)], dtype=np.int64),
                "n_tokens": np.array([int(h["part_n"].sum())], dtype=np.int64),
                "top_token": [top["token"]],
                "top_token_n": np.array([int(top["part_n"])], dtype=np.int64),
            }
        )

    return parts.groupby("lang").map_groups(final, batch_format="pandas")


_STRAT_SALT = 1002  # sampler salt (see _id_rank60; mirrored in the SQL twin)


def q_stratified_sample(sf_dir: str):
    """Deterministic stratified sample: 3 documents per lang, chosen by
    splitmix64 hash order of the doc id (vectorized ``_id_rank60`` —
    the retired form was a per-row md5 hexdigest loop) — the
    train-subset-sampling op every data pipeline needs, reproducible
    across runs/cluster sizes because the 'random' order is a pure hash
    of the row key (same discipline as the T6 hash split). Per-batch
    top-k partials bound the shuffle to k x langs x batches rows;
    (rank, doc_id) ordering is pinned identically in the SQL twin."""
    docs = _docs(sf_dir, ["lang", "doc_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {"lang": df["lang"], "doc_id": df["doc_id"].astype(np.int64)}
        )
        g["skey"] = _id_rank60(g["doc_id"].to_numpy(np.int64), _STRAT_SALT)
        return (
            g.sort_values(["skey", "doc_id"], kind="stable")
            .groupby("lang", sort=False)
            .head(3)
            .reset_index(drop=True)
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["skey", "doc_id"], kind="stable").head(3)
        g = g.reset_index(drop=True)
        g["sample_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "doc_id", "sample_rank"]]

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(pick, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Text labeling + synthetic generation + ER quality (M10, M17, G6)
# ---------------------------------------------------------------------------

_BIO_PHRASES = [["table", "scan"], ["hash", "join"], ["sort", "merge"], ["group", "by"]]


def q_bio_label_counts(sf_dir: str):
    """BIO span labeling (M10 ``label_tokens``) over documents: counts of
    B-/I- tags per doc for a fixed phrase list. SQL oracle: with this
    phrase list (all length 2, no phrase's last token equal to another's
    first) the greedy non-overlapping scan degenerates to counting
    matching adjacent-token pairs — test_bio_phrases_chain_free guards
    the property the oracle relies on."""
    from address_parser_ray.functions.text import label_tokens_bio

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        b, i_ = [], []
        for text in df["text"].fillna(""):
            tags = label_tokens_bio(text.split(), _BIO_PHRASES)
            b.append(sum(1 for t in tags if t == "B-PHR"))
            i_.append(sum(1 for t in tags if t == "I-PHR"))
        return pd.DataFrame(
            {"doc_id": df["doc_id"], "n_b": pd.Series(b, dtype="int64"),
             "n_i": pd.Series(i_, dtype="int64")}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_synthetic_corpus_stats(sf_dir: str):
    """The M17 variant flat-map generator as an operator: deterministic
    seed×spec corpus, rolled up by variant spec. (sf_dir sets the scale
    only; the corpus itself is synthesized — no external data.)"""
    from address_parser_ray.fixtures import write_corpus_ray

    out_dir = _fixture_cache_dir("")
    _, labels_dir = write_corpus_ray(out_dir, n_seeds=200, variants_per_seed=6)
    return (
        ray.data.read_parquet(labels_dir, columns=["variant_spec"])
        .groupby("variant_spec")
        .aggregate(Count(alias_name="n"))
    )


def q_er_quality(sf_dir: str):
    """End-to-end ER quality on the fixture corpus with known clusters
    (G6 seqeval-F1 analogue): exhaustive + same-block pairwise metrics."""
    from address_parser_ray.fixtures import write_corpus_ray
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.evaluation import (
        pairwise_f1,
        same_block_pairwise_f1,
    )
    from address_parser_ray.sources import read_corpus

    out_dir = _fixture_cache_dir("_s200_v6")
    corpus_dir, labels_dir = write_corpus_ray(out_dir, n_seeds=200, variants_per_seed=6)
    res = dedup_pipeline(read_corpus(corpus_dir))
    assign = res.assignments.to_pandas()
    lab = ray.data.read_parquet(labels_dir).to_pandas()
    lab["record_id"] = [
        stable_id128(r, p, c) for r, p, c in zip(lab["repo"], lab["path"], lab["commit"])
    ]
    exhaustive = pairwise_f1(
        lab[["record_id", "cluster_id"]], assign, truth_col="cluster_id"
    )
    sb = same_block_pairwise_f1(
        res.scored_pairs.to_pandas(),
        lab.set_index("record_id")["cluster_id"],
        assign.set_index("record_id")["cluster_id"],
    )
    rows = [
        {"metric": "exhaustive", **exhaustive.as_row()},
        {"metric": "same_block", **sb.as_row()},
    ]
    return pd.DataFrame(rows)


# ---------------------------------------------------------------------------
# Similarity search: LSH-bucketed ANN (scale path next to brute force)
# ---------------------------------------------------------------------------


def q_ann_lsh_buckets(sf_dir: str):
    """Hyperplane LSH over embeddings: 12-bit signatures → bucket
    histogram (the scale path for similarity search — candidates come
    from same-bucket collisions instead of a full matmul). Bit j is
    ``dot(e, A_j) > dot(e, B_j)`` where (A_j, B_j) are the (2j, 2j+1)-th
    smallest-vec_id rows — data-derived hyperplanes (the difference
    A_j − B_j) with the same seed-row rule as the IVF centroids, which
    keeps the operator fully SQL-checkable. At 100 TB the seed rows come
    from a driver-side sample; the two dot products per bit match the
    oracle's ``list_inner_product`` term-for-term."""
    _, seeds = _seed_embedding_rows(sf_dir, 24)
    A, B = seeds[0::2], seeds[1::2]  # (12, dim) each
    planes_ref = ray.put((A, B))

    def bucketize(t: pa.Table) -> pa.Table:
        a_m, b_m = ray.get(planes_ref)
        emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        emb = emb.reshape(len(t), -1)
        bits = (emb @ a_m.T) > (emb @ b_m.T)
        code = (bits * (1 << np.arange(12))).sum(axis=1).astype(np.int64)
        return pa.table({"bucket": pa.array(code)})

    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .aggregate(Count(alias_name="n_vectors"))
    )


#: above this many vectors the IVF coarse quantizer switches from the
#: SQL-checkable seed-row rule to distributed sampled k-means
#: (pipelines/kmeans.kmeans_fit). Oracle scales (sf <= 0.1: <= ~50k
#: vectors) stay on the seed rule; tests force the k-means path by
#: monkeypatching the gate to 0.
IVF_KMEANS_GATE = 1_000_000


def q_ann_ivf_topk(sf_dir: str):
    """IVF ANN (the coarse-quantizer scale path, complementing the LSH
    buckets): K=16 deterministic seed centroids (the 16 smallest vec_ids,
    normalized — at 100 TB these come from a driver-side SAMPLE + k-means;
    the seed rule keeps the operator SQL-checkable), every vector assigned
    to its nearest centroid (argmax cosine, ties → smaller centroid id);
    the 5 query vectors probe their nprobe=4 nearest centroid lists and
    exact cosine is ranked only within the probed candidates. Assignment
    and probe-filtered scoring are FUSED in one streaming map_batches pass
    (centroid + query matrices broadcast once via ray.put) — only the tiny
    (query, candidate) stream reaches the per-query top-k groupby."""
    K, NPROBE, TOPK, NQUERY = 16, 4, 3, 5

    seed_ids, seed_emb = _seed_embedding_rows(sf_dir, K)
    n_vecs = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    ).count()
    if n_vecs > IVF_KMEANS_GATE:
        # scale path (VERDICT r3 item 8): above the gate the coarse
        # quantizer comes from the distributed sampled spherical k-means
        # (pipelines/kmeans.kmeans_fit — deterministic seeding +
        # fixed-order partial folds), not the seed rows. The seed-row
        # rule below the gate keeps the operator SQL-checkable at
        # oracle scales; quality parity of the kmeans path is pinned by
        # test_ivf_kmeans_gate (recall vs brute force at fixture scale).
        from address_parser_ray.pipelines.kmeans import kmeans_fit

        emb_ds = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        C, _hist = kmeans_fit(emb_ds, k=K, iters=5)
        cids = np.arange(K, dtype=np.int64)  # centroid index space
    else:
        C = seed_emb / np.linalg.norm(seed_emb, axis=1, keepdims=True)
        cids = seed_ids
    Q = seed_emb[:NQUERY] / np.linalg.norm(
        seed_emb[:NQUERY], axis=1, keepdims=True
    )
    qids = seed_ids[:NQUERY]

    # probe table: for each query, its NPROBE nearest centroids
    # (cos desc, cid asc — matching the assignment tie-break).
    qc = Q @ C.T  # (NQUERY, K); cids are sorted asc so argsort ties → smaller cid
    probe = np.zeros((K, NQUERY), dtype=bool)
    for qi in range(NQUERY):
        nearest = np.lexsort((cids, -qc[qi]))[:NPROBE]
        probe[nearest, qi] = True
    state = ray.put((C, Q, cids, qids, probe))

    class IvfScorer:
        def __init__(self):
            self.C, self.Q, self.cids, self.qids, self.probe = ray.get(state)

        def __call__(self, t: pa.Table) -> pa.Table:
            emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
            emb = emb.reshape(len(t), -1)
            norms = np.linalg.norm(emb, axis=1)
            norms[norms == 0] = 1.0
            emb = emb / norms[:, None]
            assign = np.argmax(emb @ self.C.T, axis=1)  # first max = smaller cid
            vid = np.asarray(t["vec_id"], dtype=np.int64)
            keep = self.probe[assign]  # (n, NQUERY): is row in a probed list?
            keep &= vid[:, None] != self.qids[None, :]
            ri, qi = np.nonzero(keep)
            cos = np.einsum("ij,ij->i", emb[ri], self.Q[qi])
            return pa.table(
                {
                    "query_vec_id": pa.array(self.qids[qi]),
                    "neighbor_vec_id": pa.array(vid[ri]),
                    "cos": pa.array(cos),
                }
            )

    scored = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(IvfScorer, batch_format="pyarrow", concurrency=(1, 4))

    def topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cos", "neighbor_vec_id"], ascending=[False, True]).head(TOPK)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_vec_id", "neighbor_vec_id", "rank"]]

    return scored.groupby("query_vec_id").map_groups(topk, batch_format="pandas")


def _corpus_texts(sf_dir: str):
    """(record_id, text) keyed exactly as ``documents_as_corpus`` keys its
    rows — computed in a streamed ``map_batches``, never materialized on
    the driver."""
    import hashlib as _h

    from address_parser_ray.functions.hashing import stable_id128

    def fn(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        srcs = t["source"].to_pylist()
        rid = [
            stable_id128(s, f"docs/doc_{d}.txt", _h.sha1(f"doc:{d}".encode()).hexdigest())
            for d, s in zip(ids, srcs)
        ]
        return pa.table({"record_id": pa.array(rid, type=pa.binary()), "text": t["text"]})

    return _docs(sf_dir, ["doc_id", "source", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _attach_pair_texts(pairs, sf_dir: str):
    """Attach ``text_a``/``text_b`` to a ``(id_a, id_b)`` pair set via two
    bucketed reduce-side joins — pair-side content is re-joined by id, not
    broadcast, so nothing scales with corpus size on the driver. The pair
    set shuffles twice (it is sketch-thin); the corpus text column
    shuffles by id hash — the standard 100-TB verify-join shape."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    texts = _corpus_texts(sf_dir)
    with_a = pinned_join(
        pairs,
        project(texts, {"record_id": "record_id", "text": "text_a"}),
        on="id_a",
        right_on="record_id",
        num_partitions=nparts,
    )
    return pinned_join(
        with_a,
        project(texts, {"record_id": "record_id", "text": "text_b"}),
        on="id_b",
        right_on="record_id",
        num_partitions=nparts,
    )


def q_ngram_jaccard_pairs(sf_dir: str):
    """n-gram-Jaccard near-dup: LSH candidates VERIFIED by exact char-4-
    gram Jaccard (the reference's Dice-gate-then-verify shape, P1).
    Content for verification is re-joined by record id (bucketed
    reduce-side join) — the verify stage never holds more than its own
    batches.  Full SQL oracle since r4: pairs emit in DOC-ID space
    ((least, greatest) — 128-bit record ids are not SQL-recomputable)
    and the twin recomputes the flagship candidate set + exact distinct
    4-gram substring Jaccard over the raw text (hash-collision-free
    assumption, as ``ngram_jaccard_stats``)."""
    from address_parser_ray.functions.hashing import char_shingle_hashes, ids_np
    from address_parser_ray.functions.similarity import exact_jaccard

    res = _dedup_documents(sf_dir)
    pairs = project(res.scored_pairs, {"id_a": "id_a", "id_b": "id_b"})
    map_ref = _doc_id_map_ref(sf_dir)

    def verify(t: pa.Table) -> pa.Table:
        ta = t["text_a"].to_pylist()
        tb = t["text_b"].to_pylist()
        j = np.array(
            [
                exact_jaccard(
                    char_shingle_hashes(x or "", 4), char_shingle_hashes(y or "", 4)
                )
                for x, y in zip(ta, tb)
            ]
        )
        keep = j >= 0.5
        f = t.filter(pa.array(keep))
        rids, dids = ray.get(map_ref)

        def docs_of(col) -> np.ndarray:
            r = ids_np(col)
            pos = np.clip(np.searchsorted(rids, r), 0, max(0, len(rids) - 1))
            if len(rids) == 0 or not (rids[pos] == r).all():
                raise KeyError("pair references record id not in corpus map")
            return dids[pos]

        da = docs_of(f["id_a"])
        db = docs_of(f["id_b"])
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(da, db)),
                "doc_b": pa.array(np.maximum(da, db)),
                "jaccard": pa.array(np.floor(j[keep] * 1e4) / 1e4),
            }
        )

    return _attach_pair_texts(pairs, sf_dir).map_batches(
        verify, batch_format="pyarrow", batch_size=4096
    )


def q_residual_tokens(sf_dir: str):
    """Residual extraction (M9 ``_extract_street_address``,
    ``fuzz/inexus_parser.py:2509-2655``): for each matched near-dup pair,
    the tokens of one side NOT covered by the other — a token anti-semi-
    join against the matched counterpart. Content is re-joined by record
    id (bucketed join), never broadcast. Returns per-pair residual counts
    (ints) in canonical (min, max) DOC-ID orientation — full SQL oracle
    since r4 (flagship ``scored_final`` match pairs + per-pair distinct
    token anti-join; the corpus is single-space tokenized, so Python
    ``.split()`` == the SQL space split, both emitting no empties)."""
    from address_parser_ray.functions.hashing import ids_np

    res = _dedup_documents(sf_dir)
    map_ref = _doc_id_map_ref(sf_dir)

    def matched(t: pa.Table) -> pa.Table:
        keep = pa.array(np.asarray(t["is_match"]))
        f = t.filter(keep)
        return pa.table({"id_a": f["id_a"], "id_b": f["id_b"]})

    pairs = res.scored_pairs.map_batches(matched, batch_format="pyarrow")

    def residual(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ra = np.empty(n, dtype=np.int64)
        rb = np.empty(n, dtype=np.int64)
        for i, (x, y) in enumerate(zip(t["text_a"].to_pylist(), t["text_b"].to_pylist())):
            ta = set((x or "").split())
            tb = set((y or "").split())
            ra[i] = len(ta - tb)
            rb[i] = len(tb - ta)
        rids, dids = ray.get(map_ref)

        def docs_of(col) -> np.ndarray:
            r = ids_np(col)
            pos = np.clip(np.searchsorted(rids, r), 0, max(0, len(rids) - 1))
            if len(rids) == 0 or not (rids[pos] == r).all():
                raise KeyError("pair references record id not in corpus map")
            return dids[pos]

        da = docs_of(t["id_a"])
        db = docs_of(t["id_b"])
        # canonical (min, max) doc orientation — swap the side-specific
        # residual counts along with the ids
        swap = da > db
        return pa.table(
            {
                "doc_a": pa.array(np.where(swap, db, da)),
                "doc_b": pa.array(np.where(swap, da, db)),
                "residual_a": pa.array(np.where(swap, rb, ra)),
                "residual_b": pa.array(np.where(swap, ra, rb)),
            }
        )

    return _attach_pair_texts(pairs, sf_dir).map_batches(
        residual, batch_format="pyarrow", batch_size=4096
    )


def q_embedding_near_dup(sf_dir: str):
    """Embedding-cosine near-dup: LSH-bucket candidates verified by
    exact cosine ≥ 0.30 within each bucket (the testdata embeddings are
    near-orthogonal random vectors; real embedding near-dup would sit at
    ≥0.95) — the 5th dedup flavor. Hyperplanes follow the same
    seed-row-difference rule as q_ann_lsh_buckets (bit j is
    ``dot(e, A_j) > dot(e, B_j)`` over the 16 smallest-vec_id rows),
    which makes the WHOLE flavor SQL-checkable; at 100 TB the seed rows
    come from a driver-side sample, broadcast once. Similarity is
    emitted as integer basis points (``floor(cos·1e4)``) and the ≥0.30
    gate compares the same floored value on both sides. Degenerate
    buckets are capped at 2048 members in deterministic min-vec_id
    order (bounded-recall trade, same as the blocking pair caps; the
    cap never binds on the test data, so oracle parity holds)."""
    MAX_BUCKET = 2048

    _, seeds = _seed_embedding_rows(sf_dir, 16)
    A, B = seeds[0::2], seeds[1::2]  # (8, dim) each
    planes_ref = ray.put((A, B))

    def bucketize(t: pa.Table) -> pa.Table:
        a_m, b_m = ray.get(planes_ref)
        emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        emb = emb.reshape(len(t), -1)
        bits = (emb @ a_m.T) > (emb @ b_m.T)
        code = (bits * (1 << np.arange(8))).sum(axis=1).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(code),
                "vec_id": t["vec_id"],
                "embedding": t["embedding"],
            }
        )

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"),
                 "id_b": pd.Series([], dtype="int64"),
                 "cos_bp": pd.Series([], dtype="int64")}
            )
        g = g.sort_values("vec_id").head(MAX_BUCKET)
        ids = g["vec_id"].to_numpy()
        emb = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        emb = emb / norms[:, None]
        cos = emb @ emb.T
        iu = np.triu_indices(len(ids), k=1)
        # +1e-7 before flooring (mirrored in the oracle SQL): a 1-ulp
        # numpy-vs-DuckDB cosine difference exactly AT a basis-point
        # boundary must not flip a bucket on one side only
        bp = np.floor(cos[iu] * 1e4 + 1e-7).astype(np.int64)
        keep = bp >= 3000
        return pd.DataFrame(
            {
                "id_a": ids[iu[0]][keep],
                "id_b": ids[iu[1]][keep],
                "cos_bp": bp[keep],
            }
        )

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("bucket").map_groups(verify, batch_format="pandas")


def q_infer_missing_lang(sf_dir: str):
    """Inference-from-partial-evidence (P5, the reference's
    infer-district-from-ward hierarchy walk, ``fuzz/inexus_parser.py:
    264-403``): records missing a field get it back-filled from the
    majority value among sibling records sharing a parent key.

    Graft shape: ``lang`` is masked on a deterministic subset
    (``(doc_id // 20) % 10 == 3`` — the testdata carries no NULLs, so
    partiality is synthesized in-operator; the stride keeps the mask
    decorrelated from ``source``) and re-inferred as the modal lang of
    the doc's ``source`` group (ties broken lang-ascending), falling
    back to ``'und'`` for evidence-free sources.

    Scale shape: the evidence table is |sources| × |langs| rows after a
    partial per-batch pre-aggregation — tiny at any corpus size — so it
    is collected on the driver and broadcast once via ``ray.put``; the
    fill pass is a stateless map_batches. No full-table shuffle."""
    MASK_MOD, MASK_RES = 10, 3

    def mask(t: pa.Table) -> pa.Table:
        doc_id = np.asarray(t["doc_id"]).astype(np.int64)
        keep = pa.array((doc_id // 20) % MASK_MOD != MASK_RES)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": t["source"],
                "lang_obs": pc.if_else(keep, t["lang"], pa.scalar(None, pa.string())),
            }
        )

    masked = _docs(sf_dir, ["doc_id", "source", "lang"]).map_batches(
        mask, batch_format="pyarrow", zero_copy_batch=True
    )

    def partial_counts(t: pa.Table) -> pa.Table:
        f = t.filter(pc.is_valid(t["lang_obs"]))
        return (
            pa.table({"source": f["source"], "lang": f["lang_obs"]})
            .group_by(["source", "lang"])
            .aggregate([([], "count_all")])
            .rename_columns(["source", "lang", "c"])
        )

    evidence = (
        masked.map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # |sources| x |langs| rows — driver-small by design
    )
    evidence = evidence.sort_values(["source", "c", "lang"], ascending=[True, False, True])
    best = dict(zip(evidence.drop_duplicates("source")["source"],
                    evidence.drop_duplicates("source")["lang"]))
    best_ref = ray.put(best)

    def fill(t: pa.Table) -> pa.Table:
        b = ray.get(best_ref)
        obs = t["lang_obs"].to_pylist()
        srcs = t["source"].to_pylist()
        filled = [o if o is not None else b.get(s, "und") for o, s in zip(obs, srcs)]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_filled": pa.array(filled, type=pa.string()),
                "inferred": pa.array([o is None for o in obs]),
            }
        )

    return masked.map_batches(fill, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Training-data shaping: sequence packing, decontamination, payload parsing
# ---------------------------------------------------------------------------

_PACK_BUCKETS = 16  # partitioning key for the packing scan (oracle pins it)
_PACK_CAPACITY = 512  # token budget per training batch


def q_seq_pack_stats(sf_dir: str):
    """Sequence packing for training batches: docs are greedily packed in
    doc_id order into batches of ~``_PACK_CAPACITY`` whitespace tokens —
    batch boundary rule ``batch_id = tokens_before // capacity`` (a
    prefix-sum, so a batch may overflow by at most one doc; the rule is a
    pure window function, which keeps it shuffle-free AND
    SQL-checkable). The scan is partitioned by ``doc_id % _PACK_BUCKETS``
    — each bucket's prefix sum is independent, so the op scales by
    raising the bucket fan-out, never by a global ordered scan.
    Reference analogue: T5 batching in ``ner/merge_datasets.py:85-99`` +
    the trainer's fixed-token batch shape (``ner/configs/train_default
    .json:7-12``)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "bucket": (df["doc_id"] % _PACK_BUCKETS).astype(np.int64),
                "doc_id": df["doc_id"].astype(np.int64),
                "n_tokens": ws_token_count_series(df["text"]),
            }
        )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        tok = g["n_tokens"].to_numpy(np.int64)
        before = np.concatenate([[0], np.cumsum(tok)[:-1]])
        out = pd.DataFrame(
            {
                "bucket": g["bucket"].to_numpy(np.int64),
                "batch_id": before // _PACK_CAPACITY,
                "n_tokens": tok,
            }
        )
        agg = out.groupby(["bucket", "batch_id"], as_index=False, sort=False).agg(
            n_docs=("n_tokens", "size"), batch_tokens=("n_tokens", "sum")
        )
        agg["n_docs"] = agg["n_docs"].astype(np.int64)
        agg["batch_tokens"] = agg["batch_tokens"].astype(np.int64)
        return agg

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


_CONTAM_N = 5  # token n-gram order
_CONTAM_MOD = 97  # stand-in benchmark membership rule: doc_id % 97 == 0


_WS_ASCII = re.compile(r"\s+", re.ASCII)


def _ws_tokens(text) -> list:
    # EXACT parity with the oracle's
    # ``regexp_split_to_array(trim(COALESCE(text,'')), '\s+')`` (probed
    # against DuckDB): trim strips ASCII space ONLY (not tabs), RE2 \s is
    # ASCII-only (NBSP/EM-space do NOT split — str.split() would), and an
    # empty string yields [''] (one empty token), not []. Test data is
    # ASCII so the old str.split() happened to agree; this pins the edge
    # cases too.
    return _WS_ASCII.split((text or "").strip(" "))


def q_packed_shard_stats(sf_dir: str):
    """Training-ingest handoff audit (reference ``ner/ner_train.py:
    82-138``): materialize the documents corpus as ACTUAL packed token
    shards (``pipelines/training.write_packed_shards`` — hashing-trick
    ids + EOS per doc, ``q_seq_pack_stats``'s prefix-sum packing rule,
    hive-partitioned split/bucket layout), read them BACK, and report
    per split: sequence count, doc count, total tokens, max sequence
    length.  The read-back makes the panel a round-trip proof of the
    writer (a wrong shard shows up as a count/token drift), and the
    whole rule is a window function — full SQL oracle.  Staging dir
    under /tmp (single-node assumption, as ``csv_read_counts``),
    removed after the panel materializes."""
    import shutil
    import tempfile

    from address_parser_ray.pipelines.training import (
        read_packed,
        write_packed_shards,
    )

    tmp = tempfile.mkdtemp(prefix="apr_shards_")
    try:
        write_packed_shards(_docs(sf_dir, ["doc_id", "text"]), tmp)
        rows = []
        for split in ("heldout", "train"):
            df = read_packed(tmp, split).to_pandas()
            rows.append(
                {
                    "split": split,
                    "n_sequences": np.int64(len(df)),
                    "n_docs": np.int64(df["n_docs"].sum()),
                    "n_tokens": np.int64(df["n_tokens"].sum()),
                    "max_seq_tokens": np.int64(df["n_tokens"].max()),
                }
            )
        return pd.DataFrame(rows).sort_values("split").reset_index(drop=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_contamination_5gram(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any token
    5-gram with a benchmark/eval set (the standard train-set
    contamination check). The benchmark here is the deterministic
    ``doc_id % 97 == 0`` slice standing in for an external eval set —
    which is small BY DEFINITION, so collecting its distinct grams on
    the driver and broadcasting the set via ``ray.put`` is the correct
    100-TB shape (the corpus side streams; nothing corpus-sized ever
    materializes). Hit = any of the doc's gram positions appears in the
    benchmark set."""
    import ray

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[(df["doc_id"] % _CONTAM_MOD) == 0]
        return pd.DataFrame(
            {
                "g": list(
                    {
                        " ".join(toks[i : i + _CONTAM_N])
                        for text in sel["text"]
                        for toks in (_ws_tokens(text),)
                        for i in range(len(toks) - _CONTAM_N + 1)
                    }
                )
            }
        )

    bench = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_grams, batch_format="pandas")
        .to_pandas()
    )
    bench_ref = ray.put(frozenset(bench["g"]))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bset = ray.get(bench_ref)
        hits = np.fromiter(
            (
                sum(
                    " ".join(toks[i : i + _CONTAM_N]) in bset
                    for i in range(len(toks) - _CONTAM_N + 1)
                )
                for text in df["text"]
                for toks in (_ws_tokens(text),)
            ),
            dtype=np.int64,
            count=len(df),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_hits": hits,
                "contaminated": hits > 0,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pandas")


_REP_N = 3  # n-gram order for the repetition signal


_WRS_K = 25  # sample size
_WRS_SALT = 1001  # sampler salt (see _id_rank60; mirrored in the SQL twin)


def q_size_weighted_sample(sf_dir: str):
    """Weighted sampling without replacement — the curation op behind
    length-balanced subset selection (big docs proportionally likelier,
    not certain): the integer form of A-ES priority sampling
    (Efraimidis & Spirakis 2006 use rank = u^(1/w); here rank =
    h // w with h a 60-bit splitmix64 uniform — the same
    weight-monotone ordering in pure integers, so selection is
    hash-exact across engines and cluster sizes).  Top-``_WRS_K`` docs
    by ascending rank (ties → doc_id) with weight = n_chars.

    Shape: per-batch local top-k partials (k rows per batch cross the
    exchange, never the corpus), one driver-side head — the same
    bounded-shuffle discipline as ``top_docs``.  Full SQL oracle
    (row_number over the same integer rank)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        h = _id_rank60(df["doc_id"].to_numpy(np.int64), _WRS_SALT)
        rank = h // w
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "lang": df["lang"],
                "n_chars": df["n_chars"].astype(np.int64),
                "rank": rank,
            }
        )
        return out.nsmallest(_WRS_K, ["rank", "doc_id"])

    return (
        _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .sort(["rank", "doc_id"])
        .limit(_WRS_K)
    )


_BLOOM_M = 1 << 16   # bits
_BLOOM_K = 4         # hash functions (Kirsch-Mitzenmacher double hashing)


def q_bloom_contamination(sf_dir: str):
    """Bloom-filter decontamination — the MEMBERSHIP sketch beside the
    repo's Count-Min (point counts), KMV (distinct), MG (heavy
    hitters), HLL (cardinality) and HDR (quantiles): the benchmark
    slice's token 5-grams (``doc_id % 97 == 0``, as
    ``contamination_5gram``) populate an m=2^16-bit / k=4 Bloom filter
    (Kirsch-Mitzenmacher double hashing off one 60-bit ``_text_60bit``
    content hash — h1 = low 16 bits, h2 from the upper bits,
    h_i = (h1 + i*h2) mod m; vectorized over every gram of a batch —
    the retired form md5-hashed each gram in a Python loop), and every
    corpus doc probes it.  A Bloom
    hit is ONE-SIDED: every truly contaminated doc is flagged; clean
    docs can false-positive, and the panel REPORTS that error by
    carrying the exact verdict next to the sketch verdict — per lang:
    docs, bloom-flagged, exactly-contaminated, false positives, and
    the filter's fill (set bits). At 100 TB the 8 KB filter broadcasts
    where the exact gram set (GBs) cannot — that is the point of the
    sketch; integer-exact in both engines."""

    def grams_of(text) -> list:
        toks = _ws_tokens(text)
        return [
            " ".join(toks[i: i + _CONTAM_N])
            for i in range(len(toks) - _CONTAM_N + 1)
        ]

    def h12(grams: list) -> tuple[np.ndarray, np.ndarray]:
        h = _text_60bit(grams)
        return h % _BLOOM_M, (h // _BLOOM_M) % (_BLOOM_M - 1) + 1

    # benchmark slice is small BY DEFINITION: per-batch partial bit
    # sets union on the driver (≤ 8 KB each), filter broadcasts once
    def bench_bits(df: pd.DataFrame) -> pd.DataFrame:
        sel = df[(df["doc_id"] % _CONTAM_MOD) == 0]
        flat: list[str] = []
        for t in sel["text"]:
            flat.extend(grams_of(t))
        grams = sorted(set(flat))
        if grams:
            h1, h2 = h12(grams)
            ks = np.arange(_BLOOM_K, dtype=np.int64)
            bits = np.unique(
                (h1[:, None] + ks[None, :] * h2[:, None]) % _BLOOM_M
            )
        else:
            bits = np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {"kind": ["b"] * len(bits) + ["g"] * len(grams),
             "val": [str(int(x)) for x in bits] + grams}
        )

    parts = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(bench_bits, batch_format="pandas")
        .to_pandas()
    )
    bits = np.zeros(_BLOOM_M, dtype=bool)
    bset = parts[parts["kind"] == "b"]["val"].astype(int).to_numpy()
    bits[bset] = True
    exact_grams = frozenset(parts[parts["kind"] == "g"]["val"])
    state = ray.put((bits, exact_grams))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        bv, eg = ray.get(state)
        gs_per = [grams_of(t) for t in df["text"]]
        lens = np.fromiter((len(g) for g in gs_per), dtype=np.int64,
                           count=len(gs_per))
        flat = [g for gs in gs_per for g in gs]
        n_docs = len(gs_per)
        bloom_doc = np.zeros(n_docs, dtype=bool)
        exact_doc = np.zeros(n_docs, dtype=bool)
        if flat:
            h1, h2 = h12(flat)
            ok = np.ones(len(flat), dtype=bool)
            for i in range(_BLOOM_K):
                ok &= bv[(h1 + i * h2) % _BLOOM_M]
            # a benchmark gram's bits are all set by construction, so
            # exact ⟹ bloom — the early-exit scan and this vector form
            # agree doc-by-doc
            ex = pd.Series(flat, dtype=object).isin(eg).to_numpy()
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            np.logical_or.at(bloom_doc, doc_of, ok)
            np.logical_or.at(exact_doc, doc_of, ex)
        g = pd.DataFrame(
            {"lang": df["lang"].to_numpy(), "bloom": bloom_doc,
             "exact": exact_doc}
        ).groupby("lang", sort=False, as_index=False).agg(
            pn=("bloom", "size"),
            pb=("bloom", "sum"),
            pe=("exact", "sum"),
        )
        for c in ("pn", "pb", "pe"):
            g[c] = g[c].astype(np.int64)
        return g

    n_set = np.int64(bits.sum())

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": np.array([g["pn"].sum()], dtype=np.int64),
                "n_bloom_flagged": np.array([g["pb"].sum()], dtype=np.int64),
                "n_contaminated": np.array([g["pe"].sum()], dtype=np.int64),
                "n_false_pos": np.array(
                    [g["pb"].sum() - g["pe"].sum()], dtype=np.int64
                ),
                "filter_bits_set": np.array([n_set], dtype=np.int64),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(probe, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_bigram_lm_score(sf_dir: str):
    """Bigram-LM quality proxy — the CCNet/Gopher-style "perplexity
    filter" in a log-free integer form: train corpus-wide token-BIGRAM
    counts, then score every doc by the mean RARITY of its bigrams,
    ``score_ppm = (Σ_i 1e6 // (1 + count(bigram_i))) // n_bigrams`` —
    high score = built from rare transitions (noise / boilerplate-free
    garble), low = fluent under the corpus LM. Pure integers both
    engines, so the filter threshold is hash-exact (a float log-prob
    would differ in ULPs).

    Shape (the "train on statistics, not rows" discipline): one pass
    emits per-batch (bigram, partial count) — the shuffle is bounded by
    the BIGRAM VOCABULARY, not the corpus; one single-key combine; the
    count panel broadcasts via ``ray.put`` below
    ``_BIGRAM_BROADCAST_MAX`` distinct bigrams (50M ≈ 1.2 GB of
    16-byte digests+counts — at web scale the scoring pass becomes a
    bigram-hash bucketed join, same panel), and the scoring pass
    re-streams the corpus against it. Whitespace tokens use the pinned
    ``_ws_tokens`` DuckDB-parity rule. Output per doc:
    (doc_id, lang, n_bigrams, score_ppm); docs with no bigram score
    -1 (sentinel, distinct from a real 0)."""
    docs = _docs(sf_dir, ["doc_id", "lang", "text"])

    def bigrams_of(text) -> list:
        toks = _ws_tokens(text)
        return [
            toks[i] + "\x1f" + toks[i + 1] for i in range(len(toks) - 1)
        ]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c: Counter = Counter()
        for t in df["text"]:
            c.update(bigrams_of(t))
        return pd.DataFrame(
            {"bg": list(c.keys()),
             "pn": np.fromiter(c.values(), dtype=np.int64, count=len(c))}
        )

    counts = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("bg")
        .aggregate(Sum("pn", alias_name="n"))
        .materialize()
    )
    n_distinct = counts.count()
    if n_distinct > _BIGRAM_BROADCAST_MAX:
        raise NotImplementedError(
            "bigram vocabulary exceeds the broadcast gate — route the "
            "scoring pass through the bigram-hash bucketed join"
        )
    cmap: dict = {}
    for b in counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        cmap.update(zip(b["bg"].to_pylist(), b["n"].to_pylist()))
    cref = ray.put(cmap)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(cref)
        n_bg = np.empty(len(df), dtype=np.int64)
        sc = np.empty(len(df), dtype=np.int64)
        for i, t in enumerate(df["text"]):
            bgs = bigrams_of(t)
            n_bg[i] = len(bgs)
            if not bgs:
                sc[i] = -1
                continue
            sc[i] = sum(1_000_000 // (1 + m[b]) for b in bgs) // len(bgs)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "lang": df["lang"],
                "n_bigrams": n_bg,
                "score_ppm": sc,
            }
        )

    return docs.map_batches(score, batch_format="pandas")


#: distinct bigrams at or below which the count panel broadcasts; above
#: it the scoring join must bucket by bigram hash (raise documented).
_BIGRAM_BROADCAST_MAX = 50_000_000


def q_repetition_stats(sf_dir: str):
    """Within-doc repetition signal (the Gopher-style duplicate n-gram
    fraction): per doc, total vs distinct token 3-gram counts — a high
    duplicate fraction flags degenerate/templated text for training-set
    filtering. Stateless map; repetition fraction =
    1 - n_distinct/n_grams, derivable exactly from the integer output."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        total = np.zeros(len(df), dtype=np.int64)
        distinct = np.zeros(len(df), dtype=np.int64)
        for j, text in enumerate(df["text"]):
            toks = _ws_tokens(text)
            n = max(len(toks) - _REP_N + 1, 0)
            total[j] = n
            if n:
                distinct[j] = len(
                    {tuple(toks[i : i + _REP_N]) for i in range(n)}
                )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "n_grams": total,
                "n_distinct": distinct,
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def q_props_k_stats(sf_dir: str):
    """JSON payload field extraction + aggregate (reference S8 JSON
    payload handling): pull ``k`` out of the ``props`` JSON string with
    one vectorized RE2 regex (no per-row json.loads) and aggregate per
    event type. Partial min/sum/max per batch → tiny shuffle."""
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = (
            df["props"]
            .str.extract(r'"k":\s*(\d+)', expand=False)
            .astype(np.int64)
        )
        g = pd.DataFrame({"event_type": df["event_type"], "k": k}).groupby(
            "event_type", sort=False, as_index=False
        ).agg(
            part_n=("k", "size"),
            part_sum=("k", "sum"),
            part_min=("k", "min"),
            part_max=("k", "max"),
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("part_n", alias_name="n"),
            Sum("part_sum", alias_name="sum_k"),
            Min("part_min", alias_name="min_k"),
            Max("part_max", alias_name="max_k"),
        )
    )


_PIVOT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_hours(sf_dir: str):
    """Pivot / wide aggregate: event counts by hour-of-day with one
    column per event type (conditional partial counts per batch → a
    24-row panel). Types outside the pinned list land in ``n_other`` so
    the schema is stable regardless of data drift."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hod = df["ts"].dt.hour.astype(np.int64)
        cols = {"hour_of_day": hod}
        known = np.zeros(len(df), dtype=bool)
        for t in _PIVOT_TYPES:
            m = (df["event_type"] == t).to_numpy()
            known |= m
            cols[f"part_{t}"] = m.astype(np.int64)
        cols["part_other"] = (~known).astype(np.int64)
        return (
            pd.DataFrame(cols)
            .groupby("hour_of_day", sort=False, as_index=False)
            .sum()
        )

    aggs = [Sum(f"part_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES]
    aggs.append(Sum("part_other", alias_name="n_other"))
    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("hour_of_day")
        .aggregate(*aggs)
    )


def q_embedding_centroids(sf_dir: str):
    """Per-label embedding centroid — vector aggregation with per-batch
    partial sums (labels × dims rows enter the shuffle, never vectors).
    Elements are snapped to an integer milli-grid (``floor(f64(e)*1000)``
    — float32→float64 is exact, so numpy and DuckDB floor identically)
    making the distributed sum order-independent and bit-checkable.
    Centroid = sum_milli / n_vecs, derivable exactly from the output."""
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partial(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        vals = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(t)
        d = len(vals) // n if n else 0
        milli = np.floor(vals * 1000.0).astype(np.int64).reshape(n, d)
        labels = t["label"].to_numpy()
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, milli)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": pa.array(np.repeat(uniq, d), type=t.schema.field("label").type),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
                "part_n": pa.array(np.repeat(counts, d)),
                "part_sum": pa.array(sums.reshape(-1)),
            }
        )

    # per-label combine of the dim partials in one single-key shuffle
    # (composite-key aggregates sort the batches × labels × dims stream;
    # see q_event_value_percentiles). Per-label fan-in = dims × blocks.
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("dim", as_index=False).agg(
            n_vecs=("part_n", "sum"), sum_milli=("part_sum", "sum")
        )
        h.insert(0, "label", g["label"].iloc[0])
        h["dim"] = h["dim"].astype(np.int64)
        h["n_vecs"] = h["n_vecs"].astype(np.int64)
        h["sum_milli"] = h["sum_milli"].astype(np.int64)
        return h

    return (
        emb.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("label")
        .map_groups(combine, batch_format="pandas")
    )


class MediaResizer:
    """Actor-pool multimodal resize stage: decode the binary PGM payload,
    2×2 box-downsample on the integer grid (``sum // 4`` per block —
    deterministic, no float rounding), emit output dims + pixel
    checksum. Same warm-decoder discipline as MediaFeatureExtractor."""

    def __init__(self):
        from address_parser_ray.functions.media import (
            decode_image,
            synth_pgm_from_bytes,
        )

        self._decode = decode_image
        self._synth = synth_pgm_from_bytes

    def __call__(self, t: pa.Table) -> pa.Table:
        out_w, out_h, px_sum = [], [], []
        for x in t["text"].to_pylist():
            w, h, raster = self._decode(self._synth((x or "").encode("utf-8")))
            raster = raster[: h - h % 2, : w - w % 2].astype(np.int64)
            small = (
                raster[0::2, 0::2]
                + raster[0::2, 1::2]
                + raster[1::2, 0::2]
                + raster[1::2, 1::2]
            ) // 4
            out_h.append(small.shape[0])
            out_w.append(small.shape[1])
            px_sum.append(int(small.sum()))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "out_width": pa.array(out_w, type=pa.int64()),
                "out_height": pa.array(out_h, type=pa.int64()),
                "px_sum": pa.array(px_sum, type=pa.int64()),
            }
        )


def q_media_resize(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


class FrameSampler:
    """Actor-pool video stage: parse a multi-frame binary payload
    (concatenated PGM frames — a real container parse, streamed frame by
    frame) and keep every k-th frame, the standard video→training-frames
    sampling op. Emits per-sampled-frame rows (``flat_map`` shape: more
    rows out than docs in)."""

    STRIDE = 4

    def __init__(self):
        from address_parser_ray.functions.media import (
            iter_video_frames,
            raster_features,
            synth_video_from_bytes,
        )

        self._synth = synth_video_from_bytes
        self._frames = iter_video_frames
        self._features = raster_features

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, frame_idx, feats = [], [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            video = self._synth((x or "").encode("utf-8"))
            for i, (_w, _h, raster) in enumerate(self._frames(video)):
                if i % self.STRIDE:
                    continue
                doc_ids.append(d)
                frame_idx.append(i)
                feats.append(self._features(raster))
        cols = {
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "frame_idx": pa.array(frame_idx, type=pa.int64()),
        }
        for k in ("mean_gray_1e4", "nonzero_px"):
            cols[k] = pa.array([f[k] for f in feats], type=pa.int64())
        return pa.table(cols)


def q_media_frame_sample(sf_dir: str):
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        FrameSampler,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )


def q_event_value_log_hist(sf_dir: str):
    """HDR-style log-bucketed value histogram per event type — the
    bounded-memory quantile sketch for UNBOUNDED value domains that
    ``event_value_percentiles`` (exact, domain-bounded histogram)
    documents as its scale swap-in. Bucket = bit_length(value_cents)
    (0 for ≤0): deterministic pure-integer rule, mergeable per-batch
    partials, relative value error ≤ 2× per bucket, sketch size
    O(types × 64) regardless of event volume — and, like the KMV
    sketch, bit-checkable by SQL (``length(bin(cents))``)."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy() * 100.0).astype(np.int64)
        # bit_length of positive ints via frexp (exact for < 2^53)
        bucket = np.where(
            cents <= 0, 0, np.frexp(np.maximum(cents, 1).astype(np.float64))[1]
        ).astype(np.int64)
        g = pd.DataFrame({"event_type": df["event_type"], "bucket": bucket}).groupby(
            ["event_type", "bucket"], sort=False, as_index=False
        ).agg(part_n=("bucket", "size"))
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "bucket"])
        .aggregate(Sum("part_n", alias_name="n"))
    )


def q_dup_ratio_by_source(sf_dir: str):
    """Dedup-rate diagnostics per source group: how duplicated is each
    crawl/source? n_docs vs distinct content hashes. The (source, sha)
    combine rides a sha-hash bucket (all copies of a sha colocate, so a
    bucket counts its distinct pairs exactly; a composite-key aggregate
    would sort the corpus-sized pair stream — see
    q_event_value_percentiles); per-batch pre-compaction bounds the
    shuffle to one row per distinct (source, sha) per batch; the final
    per-source rollup sums a sources × buckets panel."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def add_sha(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "source": t["source"].to_pylist(),
                "sha": sha256_hex(t["text"].to_pylist()),
            }
        )
        g = df.groupby(["source", "sha"], sort=False, as_index=False).size()
        sb = (
            splitmix64(
                np.array(
                    [int(s[:15], 16) for s in g["sha"]], dtype=np.int64
                ).view(np.uint64)
            )
            % np.uint64(nparts)
        ).astype(np.int64)
        return pa.table(
            {
                "sb": pa.array(sb),
                "source": pa.array(g["source"], type=pa.string()),
                "sha": pa.array(g["sha"], type=pa.string()),
                "part_n": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(["source", "sha"], as_index=False)["part_n"].sum()
        out = h.groupby("source", as_index=False).agg(
            part_docs=("part_n", "sum"), part_distinct=("part_n", "size")
        )
        out["part_docs"] = out["part_docs"].astype(np.int64)
        out["part_distinct"] = out["part_distinct"].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["source", "text"])
        .map_batches(add_sha, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("sb")
        .map_groups(bucket_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("part_docs", alias_name="n_docs"),
            Sum("part_distinct", alias_name="n_distinct"),
        )
    )


def q_block_size_histogram(sf_dir: str):
    """Skew diagnostic: histogram of blocking-key block sizes over the
    documents corpus — the observability an operator needs to tune
    salting/caps (reference T4's candidate caps are the blind version).
    Rows-only (band keys are MinHash-derived)."""
    from address_parser_ray.config import DEFAULT_CONFIG as _cfg
    from address_parser_ray.stages.blocking import emit_keys
    from address_parser_ray.stages.exact_dedup import (
        exact_dedup_stage,
        representatives,
    )
    from address_parser_ray.stages.fingerprint import fingerprint_stage
    from address_parser_ray.sources import documents_as_corpus

    fp = fingerprint_stage(documents_as_corpus(sf_dir), _cfg)
    reps = representatives(exact_dedup_stage(fp)).select_columns(
        ["record_id", "minhash", "lang", "basename"]
    )
    keys = reps.map_batches(
        emit_keys, fn_kwargs={"cfg": _cfg}, batch_format="pyarrow", batch_size=1024
    )
    sizes = keys.groupby("block_key").aggregate(Count(alias_name="block_size"))
    return (
        sizes.groupby("block_size")
        .aggregate(Count(alias_name="n_blocks"))
        .sort("block_size")
    )


_BPE_MERGES = 20
# above this many distinct words the merge loop runs over the
# DISTRIBUTED vocabulary panel instead of a driver list (both paths are
# tested identical; tests lower the gate to force the panel path)
_BPE_PANEL_GATE = 200_000


def _bpe_pair_counts(words, counts):
    """Exact (left, right) → Σ word-count pair counts of a word list."""
    from collections import Counter

    pair_counts: Counter = Counter()
    for w, n in zip(words, counts):
        ni = int(n)
        for i in range(len(w) - 1):
            pair_counts[(w[i], w[i + 1])] += ni
    return pair_counts


def _bpe_apply_merge(words, left: str, right: str):
    """Replace every non-overlapping (left, right) adjacency, left-to-
    right, with the fused symbol — the canonical BPE update rule."""
    fused = left + right
    new_words = []
    for w in words:
        out, i = [], 0
        while i < len(w):
            if i + 1 < len(w) and w[i] == left and w[i + 1] == right:
                out.append(fused)
                i += 2
            else:
                out.append(w[i])
                i += 1
        new_words.append(tuple(out))
    return new_words


def _bpe_merge_loop_driver(words, counts, n_merges: int):
    """Driver-resident merge loop (small-vocabulary fast path)."""
    merges = []
    for rank in range(n_merges):
        pair_counts = _bpe_pair_counts(words, counts)
        if not pair_counts:
            break
        # max count, ties broken lexicographically (deterministic)
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n_occ = best
        merges.append(
            {
                "rank": np.int64(rank),
                "left": left,
                "right": right,
                "n_occurrences": np.int64(n_occ),
            }
        )
        words = _bpe_apply_merge(words, left, right)
    return pd.DataFrame(merges)


def _bpe_merge_loop_panel(vocab, n_merges: int):
    """Distributed merge loop: the (symbols, count) vocabulary stays a
    Ray Dataset the whole time. Per round, each batch emits its partial
    (left, right, part_n) pair counts; the driver folds ONLY that pair
    panel — structurally tiny, because distinct pairs are bounded by
    (alphabet + merges-so-far)², independent of vocabulary size — picks
    the winner, and a second ``map_batches`` applies the merge to every
    word in place. The vocabulary itself never passes through the driver
    and never shuffles (pair counting is per-word, embarrassingly
    parallel). ``materialize()`` per round pins the update so lineage
    does not re-run all previous rounds.

    Reference anchor for "iterative training over batched passes":
    ``ner/ner_train.py:226-236``."""

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "symbols": [list(w) + ["</w>"] for w in df["word"]],
                "n": df["n"].astype(np.int64),
            }
        )

    ds = vocab.map_batches(explode, batch_format="pandas").materialize()

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        pc = _bpe_pair_counts(df["symbols"], df["n"])
        if not pc:
            return pd.DataFrame(
                {
                    "left": pd.Series([], dtype=str),
                    "right": pd.Series([], dtype=str),
                    "part_n": pd.Series([], dtype=np.int64),
                }
            )
        lefts, rights = zip(*pc.keys())
        return pd.DataFrame(
            {
                "left": lefts,
                "right": rights,
                "part_n": np.fromiter(pc.values(), dtype=np.int64, count=len(pc)),
            }
        )

    merges = []
    for rank in range(n_merges):
        panel = ds.map_batches(pair_partial, batch_format="pandas").to_pandas()
        if panel.empty:
            break
        agg = panel.groupby(["left", "right"], sort=False)["part_n"].sum()
        best = min(agg.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n_occ = best
        merges.append(
            {
                "rank": np.int64(rank),
                "left": left,
                "right": right,
                "n_occurrences": np.int64(n_occ),
            }
        )

        def apply_merge(df: pd.DataFrame, left=left, right=right) -> pd.DataFrame:
            df = df.copy()
            df["symbols"] = list(_bpe_apply_merge(df["symbols"], left, right))
            return df

        ds = ds.map_batches(apply_merge, batch_format="pandas").materialize()
    return pd.DataFrame(merges)


def q_bpe_train_merges(sf_dir: str):
    """BPE tokenizer TRAINING (completes the spec's "BPE-ish" token
    story: `vocab_stats` counts with a trained-style pre-tokenizer;
    this trains the merges themselves). Stage 1 (always distributed) =
    corpus → (word, count) vocabulary panel: partial counts per batch,
    one groupby — the shuffle is bounded by vocabulary, not token
    occurrences; pair counts depend ONLY on (word spelling, word count),
    which is how production trainers (HF tokenizers) compact too. Stage
    2 = the merge loop: below ``_BPE_PANEL_GATE`` distinct words it runs
    on a driver list (fast path); above it, on the DISTRIBUTED panel
    (``_bpe_merge_loop_panel`` — the vocabulary never leaves the
    cluster; only the tiny per-round pair panel folds on the driver).
    Both paths are deterministic and tested identical: ties on pair
    count break lexicographically. Non-SQL (iterative merges). Output:
    one row per merge rule (rank, left, right, n_occurrences)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for text in df["text"]:
            c.update(_ws_tokens(text))
        return pd.DataFrame(
            {
                "word": list(c.keys()),
                "part_n": np.fromiter(c.values(), dtype=np.int64, count=len(c)),
            }
        )

    vocab = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("part_n", alias_name="n"))
        .materialize()
    )
    if vocab.count() > _BPE_PANEL_GATE:
        return _bpe_merge_loop_panel(vocab, _BPE_MERGES)
    panel = vocab.to_pandas()
    words = [tuple(w) + ("</w>",) for w in panel["word"]]
    counts = panel["n"].to_numpy(np.int64)
    return _bpe_merge_loop_driver(words, counts, _BPE_MERGES)


def q_cluster_canonical(sf_dir: str):
    """Survivorship / golden-record extraction: one canonical row per
    entity cluster from the full near-dup pipeline — rep = min doc_id
    (the deterministic "first wins" of reference J5 pick-best),
    plus merged metadata (member count, char extremes). The ER engine's
    user-facing output shape: a deduplicated master table. Rows-only
    (cluster membership comes from LSH + scoring, non-SQL)."""
    res = _dedup_documents(sf_dir)

    def meta(t: pa.Table) -> pa.Table:
        # fingerprints carry the synthesized path "docs/doc_{id}.txt"
        # (sources._docs_to_corpus); recover doc_id without re-reading
        # the documents table.
        doc_ids = np.array(
            [int(p.rsplit("_", 1)[1].split(".")[0]) for p in t["path"].to_pylist()],
            dtype=np.int64,
        )
        return pa.table(
            {
                "rid": t["record_id"],
                "doc_id": pa.array(doc_ids),
                "n_chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )

    fp = res.fingerprints.map_batches(
        meta, batch_format="pyarrow", zero_copy_batch=True
    )
    joined = pinned_join(res.assignments, fp, on="record_id", right_on="rid")
    return (
        joined.groupby("cluster_id")
        .aggregate(
            Count(alias_name="n_members"),
            Min("doc_id", alias_name="rep_doc_id"),
            Max("n_chars", alias_name="max_chars"),
            Sum("n_chars", alias_name="total_chars"),
        )
        .drop_columns(["cluster_id"])
    )


def q_incremental_dedup_check(sf_dir: str):
    """Incremental linkage equivalence (rows-only): split the documents
    corpus 80/20 by doc_id, dedup the 80, attach the 20 with
    ``incremental_dedup``, and compare against the full-corpus run —
    the daily-crawl-increment shape a 100-TB engine must support.
    Reports pairwise F1 (1e6-scaled) and whether the min-id labels are
    bit-identical (they must be when both runs decide the same pairs)."""
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.evaluation import pairwise_f1
    from address_parser_ray.pipelines.incremental import incremental_dedup
    from address_parser_ray.sources import documents_as_corpus

    corpus = documents_as_corpus(sf_dir)

    def part(is_new: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            m = (ids % 5 == 0) if is_new else (ids % 5 != 0)
            return t.filter(pa.array(m))

        return fn

    old = corpus.map_batches(part(False), batch_format="pyarrow").materialize()
    new = corpus.map_batches(part(True), batch_format="pyarrow").materialize()

    full_df = (
        _dedup_documents(sf_dir)
        .assignments.to_pandas()
        .sort_values("record_id")
        .reset_index(drop=True)
    )
    prev = dedup_pipeline(old)
    inc = incremental_dedup(prev, new, old_corpus=old)
    inc_df = (
        inc.assignments.to_pandas().sort_values("record_id").reset_index(drop=True)
    )
    m = pairwise_f1(full_df, inc_df)
    return pd.DataFrame(
        [
            {
                "n_records": np.int64(len(inc_df)),
                "labels_identical": bool(inc_df.equals(full_df)),
                "f1_vs_full_1e6": np.int64(round(m.f1 * 1e6)),
            }
        ]
    )


_MIX_SALT = 1003  # sampler salt (see _id_rank60; mirrored in the SQL twin)


def q_mixture_sample(sf_dir: str):
    """Source-mixture weighted sampling — the data-mixing op of a
    pretraining pipeline: each source (crawl/domain) gets a deterministic
    sampling rate derived from its name (``100 + strh60(source) % 800``
    permille, computed once per distinct source) and rows are kept by an
    independent vectorized per-row hash gate
    (``_id_rank60(doc_id) % 1000 < rate`` — the retired form was a
    per-row md5 loop). Pure hash of the row key → reproducible across
    runs and cluster sizes (same discipline as the T6 hash split /
    stratified sample). Per-batch partials bound the shuffle to
    sources x batches rows; integer arithmetic is exact in both engines
    (int64 / BIGINT)."""
    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq = list(df["source"].unique())
        rate_of = dict(
            zip(uniq, (100 + (_text_60bit(uniq) % 800)).tolist())
        )
        rate = df["source"].map(rate_of).to_numpy(dtype=np.int64)
        gate = _id_rank60(df["doc_id"].to_numpy(np.int64), _MIX_SALT) % 1000
        keep = gate < rate
        g = pd.DataFrame(
            {
                "source": df["source"],
                "rate_permille": rate,
                "kept": keep.astype(np.int64),
                "kept_chars": np.where(
                    keep, df["n_chars"].to_numpy(dtype=np.int64), 0
                ),
            }
        )
        out = g.groupby(["source", "rate_permille"], as_index=False).agg(
            part_total=("kept", "size"),
            part_kept=("kept", "sum"),
            part_chars=("kept_chars", "sum"),
        )
        for c in ("part_total", "part_kept", "part_chars"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Max("rate_permille", alias_name="rate_permille"),
            Sum("part_total", alias_name="n_total"),
            Sum("part_kept", alias_name="n_kept"),
            Sum("part_chars", alias_name="kept_chars"),
        )
    )


def q_quality_quantile_filter(sf_dir: str):
    """Per-group quantile-threshold pruning — the quality-filter shape
    used in pretraining data curation (keep docs at or above their
    language's median length). Two logical passes, ONE data pass: the
    per-batch partial (lang, n_chars) counts compact the corpus into a
    value histogram, and both the threshold (pure-integer rank rule
    ``(50*n+99)//100``, same as q_event_value_percentiles) and the
    kept-count roll up from that panel — the corpus itself is never
    re-read. Panel is bounded by langs x distinct lengths, not corpus
    size."""
    docs = _docs(sf_dir, ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["lang", "n_chars"], as_index=False).size()
        return pd.DataFrame(
            {
                "lang": g["lang"],
                "n_chars": g["n_chars"].astype(np.int64),
                "part_n": g["size"].astype(np.int64),
            }
        )

    hist = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "n_chars"])
        .aggregate(Sum("part_n", alias_name="n"))
    )

    def threshold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("n_chars", kind="stable")
        counts = g["n"].to_numpy(dtype=np.int64)
        values = g["n_chars"].to_numpy(dtype=np.int64)
        cum = np.cumsum(counts)
        total = int(cum[-1])
        thr = int(values[np.searchsorted(cum, (50 * total + 99) // 100)])
        kept = int(counts[values >= thr].sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "p50_chars": np.array([thr], dtype=np.int64),
                "n_total": np.array([total], dtype=np.int64),
                "n_kept": np.array([kept], dtype=np.int64),
            }
        )

    return hist.groupby("lang").map_groups(threshold, batch_format="pandas")


_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def _chunk_spans(n: int, size: int = _CHUNK_SIZE, stride: int = _CHUNK_STRIDE):
    """Token-window spans for a doc of ``n`` tokens: ``[(start, stop)...]``.
    One window when n ≤ size; else enough strided windows that the last
    one reaches the end (overlap = size − stride). Pure kernel —
    property-tested against coverage/monotonicity invariants."""
    if n <= 0:
        return []
    n_chunks = 1 if n <= size else 1 + (n - size + stride - 1) // stride
    return [(i * stride, min(i * stride + size, n)) for i in range(n_chunks)]


def q_doc_chunks(sf_dir: str):
    """Training-shard chunking (flat-map): every doc splits into
    fixed-size token windows (size 32, stride 24 — overlapping, the
    standard LM pre-training chunking; reference M17's one-row-to-many
    flat-map shape, ``ner/build_standard_dataset.py:952-978``). Each
    chunk row carries its token count AND a ``_text_60bit`` signature
    of the joined chunk text (one vectorized hash pass per batch — the
    retired form md5'd each chunk in the loop), so oracle parity
    verifies the actual chunk CONTENT, not just the window arithmetic.
    Stateless map, no shuffle; at 100 TB this is a pure streaming pass
    whose output is ~size/stride x the input rows."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        doc_ids: list[int] = []
        idxs: list[int] = []
        ntoks: list[int] = []
        sigs: list[str] = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _ws_tokens(text)
            for i, (lo, hi) in enumerate(_chunk_spans(len(toks))):
                chunk = toks[lo:hi]
                doc_ids.append(int(doc_id))
                idxs.append(i)
                ntoks.append(len(chunk))
                sigs.append(" ".join(chunk))
        return pd.DataFrame(
            {
                "doc_id": np.array(doc_ids, dtype=np.int64),
                "chunk_idx": np.array(idxs, dtype=np.int64),
                "n_tokens": np.array(ntoks, dtype=np.int64),
                "chunk_h60": _text_60bit(sigs),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


_FUNNEL_WINDOW_US = 24 * 3_600_000_000  # 24 h attribution window


def _funnel_anchors(
    uid: np.ndarray, tsi: np.ndarray, typ: np.ndarray, window_us: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-user funnel anchors (µs; INT64_MAX = stage not reached):
    first view, first click strictly after + within ``window_us`` of it,
    first purchase strictly after + within ``window_us`` of the click.
    One vectorized pass (lexsort + masked ``minimum.reduceat``); inputs
    may be unsorted. Pure kernel — property-tested against a per-user
    brute force."""
    INF = np.iinfo(np.int64).max
    if uid.size == 0:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty, empty
    order = np.lexsort((tsi, uid))
    uid, tsi, typ = uid[order], tsi[order], np.asarray(typ)[order]
    first = np.concatenate([[True], uid[1:] != uid[:-1]])
    starts = np.flatnonzero(first)
    seg = np.cumsum(first) - 1  # row → per-user index

    def next_stage(anchor: np.ndarray, stage: str) -> np.ndarray:
        # anchor[seg] == INF ⇒ anchor + window overflows; mask on the
        # anchor first (users who missed a stage never qualify)
        a = anchor[seg]
        ok = (typ == stage) & (a < INF) & (tsi > a) & (tsi - a <= window_us)
        return np.minimum.reduceat(np.where(ok, tsi, INF), starts)

    t_view = np.minimum.reduceat(np.where(typ == "view", tsi, INF), starts)
    t_click = next_stage(t_view, "click")
    t_buy = next_stage(t_click, "purchase")
    return t_view, t_click, t_buy


def q_funnel_counts(sf_dir: str):
    """Ordered-funnel conversion (view → click → purchase): a user
    advances a stage only with an event STRICTLY LATER than, and within
    a 24 h attribution window of, the first qualifying event of the
    previous stage — per-key ordered-sequence matching, the analytics
    sibling of sessionization. Users are hash-bucketed (same
    partitioning contract as q_user_sessions); each bucket runs one
    vectorized pass (lexsort + masked ``np.minimum.reduceat`` per
    stage), emitting 3 partial counters — the driver reduces a
    bucket-count-sized panel, never event rows."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    ev = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
        )
        .filter(
            expr=(
                "event_type == 'view' or event_type == 'click' "
                "or event_type == 'purchase'"
            )
        )
        .map_batches(_add_user_bucket(nparts), batch_format="pyarrow")
    )

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        t_view, t_click, t_buy = _funnel_anchors(
            g["user_id"].to_numpy(dtype=np.int64),
            g["ts"].to_numpy().view("i8"),  # µs since epoch
            g["event_type"].to_numpy(),
            _FUNNEL_WINDOW_US,
        )
        INF = np.iinfo(np.int64).max
        return pd.DataFrame(
            {
                "part_view": np.array([(t_view < INF).sum()], dtype=np.int64),
                "part_click": np.array([(t_click < INF).sum()], dtype=np.int64),
                "part_buy": np.array([(t_buy < INF).sum()], dtype=np.int64),
            }
        )

    panel = (
        ev.groupby("bucket")
        .map_groups(funnel_bucket, batch_format="pandas")
        .to_pandas()  # one row per bucket — structurally tiny
    )
    return pd.DataFrame(
        {
            "n_view": np.array([panel["part_view"].sum()], dtype=np.int64),
            "n_view_click": np.array([panel["part_click"].sum()], dtype=np.int64),
            "n_full_funnel": np.array([panel["part_buy"].sum()], dtype=np.int64),
        }
    )


_POSTING_K = 5


def q_inverted_index(sf_dir: str):
    """Distributed inverted-index build — the reference's core index
    structure (G1 ``invert_ngrams_idx``, ``fuzz/inexus_parser.py:92-97``
    filled at ``:886-889``) as a persisted-artifact op: token → exact
    document frequency + the K smallest posting doc_ids. Per-batch
    partials dedupe (token, doc) pairs and keep only each token's K
    smallest ids, so the shuffle carries ≤ (per-batch vocab × K) rows
    per batch regardless of posting-list length; the combine rides a
    token-hash bucket (single int key — composite aggregates sort, see
    q_event_value_percentiles). Hot-token posting lists are capped at K
    by design (df stays exact) — the same bounded-index trade as the
    blocking caps. Full SQL oracle."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    docs = _docs(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _bpe_findall(df["text"])
        n = toks.str.len().to_numpy()
        if n.sum() == 0:
            return pd.DataFrame(
                {"tb": [], "token": [], "doc_id": [], "part_df": []}
            ).astype({"tb": np.int64, "token": str, "doc_id": np.int64,
                      "part_df": np.int64})
        flat = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy().astype(np.int64), n),
                "token": np.concatenate(toks.to_numpy()),
            }
        ).drop_duplicates()  # (token, doc) distinct; docs never span batches
        flat = flat.sort_values(["token", "doc_id"], kind="stable")
        # batch df on the first row of each token (0 elsewhere) sums exactly
        first = flat["token"].ne(flat["token"].shift()).to_numpy()
        sizes = flat.groupby("token", sort=False)["doc_id"].transform("size")
        flat["part_df"] = np.where(first, sizes.to_numpy(), 0).astype(np.int64)
        top = flat.groupby("token", sort=False).head(_POSTING_K).copy()
        top["tb"] = (
            pd.util.hash_pandas_object(top["token"], index=False).to_numpy()
            % nparts
        ).astype(np.int64)
        return top[["tb", "token", "doc_id", "part_df"]]

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["token", "doc_id"], kind="stable")
        dfc = g.groupby("token", sort=False, as_index=False)["part_df"].sum()
        top = (
            g.groupby("token", sort=False)
            .head(_POSTING_K)
            .groupby("token", sort=False)["doc_id"]
            .agg(lambda s: ",".join(str(int(x)) for x in s))
            .reset_index(name="top_docs")
        )
        out = dfc.merge(top, on="token")
        return pd.DataFrame(
            {
                "token": out["token"],
                "df": out["part_df"].astype(np.int64),
                "top_docs": out["top_docs"],
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("tb")
        .map_groups(combine, batch_format="pandas")
    )


def q_bloom_semijoin_revenue(sf_dir: str):
    """Bloom-prefiltered semi-join: revenue per order priority for
    orders of NEGATIVE-balance customers. The canonical 100-TB semi-join
    shape: a Bloom filter built from the small side broadcasts once
    (~16 bits/key; bitwise-or of per-block partial blooms is associative
    so the build itself distributes), the fact stream is probed
    vectorized and ~92% of it dies BEFORE any shuffle, and the exact
    bucketed join over survivors removes the bloom's false positives —
    results stay exact (full SQL oracle), bytes shuffled scale with the
    match rate, not the fact table."""
    import pyarrow.parquet as pq

    from address_parser_ray.functions.bloom import bloom_build, bloom_probe
    from address_parser_ray.rayutil import pinned_join

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    )
    keys = np.asarray(cust["c_custkey"], dtype=np.int64)[
        np.asarray(cust["c_acctbal"], dtype=np.float64) < 0
    ]
    words, m, k = bloom_build(keys, bits_per_key=16, k=4)
    bref = ray.put((words, m, k))

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderpriority"],
    )

    def prefilter(t: pa.Table) -> pa.Table:
        w, m_, k_ = ray.get(bref)
        mask = bloom_probe(w, m_, k_, np.asarray(t["o_custkey"]).astype(np.int64))
        return t.filter(pa.array(mask))

    survivors = orders.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )
    keys_ds = ray.data.from_arrow(
        pa.table({"bk": pa.array(np.unique(keys), type=pa.int64())})
    )
    exact = pinned_join(survivors, keys_ds, on="o_custkey", right_on="bk")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "cents": _cents(df["o_totalprice"].to_numpy(dtype=np.float64)),
            }
        ).groupby("o_orderpriority", sort=False, as_index=False).agg(
            part_n=("cents", "size"), part_sum=("cents", "sum")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    return (
        exact.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("part_n", alias_name="n_orders"),
            Sum("part_sum", alias_name="revenue_cents"),
        )
    )


_PROFILE_NUMERIC = ("doc_id", "n_chars")
_PROFILE_COLS = ("doc_id", "lang", "source", "n_chars", "text")
_PROFILE_EMPTY_MIN = 1 << 62   # absorbing under min()
_PROFILE_EMPTY_MAX = -(1 << 62)  # absorbing under max()


def q_table_profile(sf_dir: str):
    """ANALYZE-style table profiler — the stats pass every engine runs
    before planning: per column → row count, null count, min/max
    (numeric columns; -1 sentinel elsewhere so the schema stays
    non-nullable) and a KMV distinct-count estimate (same mergeable
    sketch + exact-integer estimator as ``q_distinct_kmv``). Each batch
    emits ≤ k sketch rows per column with the count/min/max partials
    riding the first row; one single-key (column) shuffle combines.
    Sketch state is O(columns × k) regardless of table size. Full SQL
    oracle (UNION ALL per column, KMV via the md5-fold idiom)."""
    docs = _docs(sf_dir, list(_PROFILE_COLS))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in _PROFILE_COLS:
            s = df[col]
            n_null = int(s.isna().sum())
            vals = s.dropna()
            if col in _PROFILE_NUMERIC:
                v = vals.to_numpy(dtype=np.int64)
                # empty-batch sentinels are absorbing for min/max
                mn = int(v.min()) if v.size else _PROFILE_EMPTY_MIN
                mx = int(v.max()) if v.size else _PROFILE_EMPTY_MAX
                reprs = [str(int(x)) for x in v]  # == CAST(x AS VARCHAR)
            else:
                mn = _PROFILE_EMPTY_MIN
                mx = _PROFILE_EMPTY_MAX
                reprs = vals.tolist()
            h = np.unique(_text_60bit(reprs))[:_KMV_K]
            k = max(1, len(h))
            frames.append(
                pd.DataFrame(
                    {
                        "column": col,
                        "h": h if len(h) else np.array([-1], dtype=np.int64),
                        "part_n": np.r_[len(s), np.zeros(k - 1)].astype(np.int64),
                        "part_null": np.r_[n_null, np.zeros(k - 1)].astype(np.int64),
                        "part_min": np.r_[mn, np.full(k - 1, -1)].astype(np.int64),
                        "part_max": np.r_[mx, np.full(k - 1, -1)].astype(np.int64),
                    }
                )
            )
        return pd.concat(frames, ignore_index=True)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        col = g["column"].iloc[0]
        first = g["part_n"].to_numpy() > 0
        u = np.unique(g.loc[g["h"] >= 0, "h"].to_numpy(dtype=np.int64))
        if len(u) >= _KMV_K:
            est = ((_KMV_K - 1) << 60) // int(u[_KMV_K - 1])
        else:
            est = len(u)
        if col in _PROFILE_NUMERIC:
            mn = int(g.loc[first, "part_min"].min())
            mx = int(g.loc[first, "part_max"].max())
            if mn == _PROFILE_EMPTY_MIN:  # every batch was all-null
                mn, mx = -1, -1
        else:
            mn = mx = -1
        return pd.DataFrame(
            {
                "column": [col],
                "n_rows": np.array([g["part_n"].sum()], dtype=np.int64),
                "n_nulls": np.array([g["part_null"].sum()], dtype=np.int64),
                "min_val": np.array([mn], dtype=np.int64),
                "max_val": np.array([mx], dtype=np.int64),
                "est_distinct": np.array([est], dtype=np.int64),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("column")
        .map_groups(combine, batch_format="pandas")
    )


def q_upsert_latest(sf_dir: str):
    """CDC upsert / MERGE INTO (last-writer-wins by version): a delta
    batch (every 7th doc re-ingested with version 1 and bumped length —
    synthesized deterministically from the base so the op is
    self-contained) merges into the base table; one row per key
    survives, the highest version winning. Keys are hash-bucketed and
    each bucket resolves winners in one vectorized lexsort pass — the
    same single-key shuffle discipline as every dedup stage (exact
    dedup's "min-id wins" generalized to "max-version wins"). At 100 TB
    the delta side is small by contract; the union streams and only
    (key, version)-bounded buckets shuffle. Full SQL oracle
    (row_number over version DESC)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    base = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def as_base(t: pa.Table) -> pa.Table:
        return t.append_column(
            "version", pa.array(np.zeros(t.num_rows, dtype=np.int64))
        )

    def as_delta(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        keep = ids % 7 == 0
        t = t.filter(pa.array(keep))
        n = t.num_rows
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source": pa.array(["delta"] * n, type=pa.string()),
                "n_chars": pc.add(t["n_chars"], 1000),
                "version": pa.array(np.ones(n, dtype=np.int64)),
            }
        )

    unioned = base.map_batches(as_base, batch_format="pyarrow").union(
        base.map_batches(as_delta, batch_format="pyarrow")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        kb = (splitmix64(ids.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("kb", pa.array(kb))

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "version"], kind="stable")
        last = g["doc_id"].ne(g["doc_id"].shift(-1)).to_numpy()
        out = g.loc[last, ["doc_id", "source", "n_chars", "version"]]
        return out.astype(
            {"doc_id": np.int64, "n_chars": np.int64, "version": np.int64}
        )

    return (
        unioned.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(latest, batch_format="pandas")
    )


def q_kmeans_update(sf_dir: str):
    """One distributed Lloyd (k-means) iteration — the iterative-ML
    training-step shape: ASSIGN each vector to its nearest of K=16 seed
    centroids (cosine, ties → smaller centroid id — the IVF assignment
    rule, `q_ann_ivf_topk`), then UPDATE by summing member vectors per
    (cluster, dim) on the integer milli-grid (the `q_embedding_centroids`
    exactness rule). New centroid = sum_milli / n_vecs, derivable
    exactly from the output. Assignment is one matmul per batch against
    the broadcast centroid matrix; update partials are (K × dims)-sized
    per batch and combine in a single-key per-cluster map_groups. At
    100 TB the loop re-broadcasts K·dims floats per round — centroids
    never shuffle. Full SQL oracle."""
    K = 16
    cids, C = _seed_embedding_rows(sf_dir, K)
    C = C / np.linalg.norm(C, axis=1, keepdims=True)
    # cids ascending → argmax first-max tie == smallest cid
    state = ray.put((C, cids))

    def assign_partial(t: pa.Table) -> pa.Table:
        C_m, cids_m = ray.get(state)
        emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
        emb = emb.reshape(len(t), -1)
        d = emb.shape[1]
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        cos = (emb / norms[:, None]) @ C_m.T
        cid = cids_m[np.argmax(cos, axis=1)]
        milli = np.floor(emb * 1000.0).astype(np.int64)
        uniq, inv = np.unique(cid, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, milli)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "cid": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq))),
                "part_n": pa.array(np.repeat(counts, d)),
                "part_sum": pa.array(sums.reshape(-1)),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("dim", as_index=False).agg(
            n_vecs=("part_n", "sum"), sum_milli=("part_sum", "sum")
        )
        h.insert(0, "cid", np.int64(g["cid"].iloc[0]))
        return h.astype(
            {"cid": np.int64, "dim": np.int64, "n_vecs": np.int64,
             "sum_milli": np.int64}
        )

    return (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .map_batches(assign_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cid")
        .map_groups(combine, batch_format="pandas")
    )


def q_semantic_dedup(sf_dir: str):
    """Semantic dedup (SemDeDup, Abbas et al. 2023 — public): the 7th
    dedup flavor. k-means clusters the embedding space (the distributed
    spherical fit from ``pipelines.kmeans``), then WITHIN each cluster a
    vector is dropped when an earlier (smaller vec_id) member sits at
    cosine ≥ τ — near-duplicate semantics without any cross-cluster
    pair generation. τ = 0.30 here because the testdata embeddings are
    near-orthogonal random vectors (same calibration note as
    ``q_embedding_near_dup``; real semantic dedup sits at ≥0.95). Per-cluster work is one cos matrix over a
    deterministically capped membership (min-vec_id order, same
    bounded-recall trade as the other flavors). Output is the per-cluster
    keep panel. Rows-only (the trained centroids are float-iterative —
    no SQL twin); determinism is pinned by the rows-only re-run test."""
    from address_parser_ray.pipelines.kmeans import kmeans_fit

    MAX_CLUSTER, TAU = 2048, 0.30

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    C, _ = kmeans_fit(ds, k=16, iters=3)
    cref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        C_m = ray.get(cref)
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(t.num_rows, -1)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        a = np.argmax((emb / norms[:, None]) @ C_m.T, axis=1).astype(np.int64)
        return pa.table(
            {"cluster": pa.array(a), "vec_id": t["vec_id"], "embedding": t["embedding"]}
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id").head(MAX_CLUSTER)
        emb = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        unit = emb / norms[:, None]
        cos = unit @ unit.T
        m = len(g)
        # dropped ⇔ some EARLIER member is ≥ τ similar (vec_id order)
        earlier = np.tril(cos, k=-1)
        dropped = (earlier >= TAU).any(axis=1)
        return pd.DataFrame(
            {
                "cluster": np.array([int(g["cluster"].iloc[0])], dtype=np.int64),
                "n_vectors": np.array([m], dtype=np.int64),
                "n_kept": np.array([int(m - dropped.sum())], dtype=np.int64),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(prune, batch_format="pandas")
    )


def q_event_gap_histogram(sf_dir: str):
    """Inter-event gap distribution — the LAG-window analytics shape:
    per user, consecutive event-timestamp gaps (µs) land in log2 buckets
    (``bit_length``; 0 for zero gaps), counted globally. The gap
    MULTISET depends only on each user's sorted timestamp sequence, so
    the result is independent of tie order — which is what makes the
    LAG oracle exact despite arbitrary same-ts ordering. Users are
    hash-bucketed (sessionization's partitioning contract); one
    lexsort + diff + ``np.frexp`` pass per bucket (frexp's exponent IS
    bit_length — no float-log rounding); per-bucket partial counts roll
    up over a ≤64-row panel. Full SQL oracle (lag window +
    ``length(bin(gap))``)."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_add_user_bucket(nparts), batch_format="pyarrow")

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        tsi = g["ts"].to_numpy().view("i8")
        order = np.lexsort((tsi, uid))
        uid, tsi = uid[order], tsi[order]
        same = uid[1:] == uid[:-1]
        gap = (tsi[1:] - tsi[:-1])[same]
        b = np.zeros(len(gap), dtype=np.int64)
        pos = gap > 0
        b[pos] = np.frexp(gap[pos].astype(np.float64))[1]  # == bit_length
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"gap_bucket": u, "part_n": c.astype(np.int64)})

    return (
        ev.groupby("bucket")
        .map_groups(gaps_bucket, batch_format="pandas")
        .groupby("gap_bucket")
        .aggregate(Sum("part_n", alias_name="n_gaps"))
        .sort("gap_bucket")
    )


_HH_CAPACITY = 1024  # Misra–Gries counters kept per partial summary
_HH_PHI_INV = 512  # frequent-items threshold: count ≥ n_total / 512


def q_heavy_hitters(sf_dir: str):
    """Frequent tokens (φ = 1/512 heavy hitters) over the whole corpus
    via a mergeable Misra–Gries summary + exact verify — the
    frequent-items sketch family alongside KMV (distinct) and the HDR
    log-histogram (Agarwal et al., *Mergeable Summaries*, PODS'12).

    Phase A (sketch pass): each batch counts its tokens exactly
    (vectorized ``np.unique`` — an error-0 MG summary), then compresses
    to ≤ m = 1024 counters by subtracting the (m+1)-th largest count
    and dropping non-positives. Every unit subtracted retires ≥ m+1
    token occurrences, so across all batches the total deduction
    D ≤ n/(m+1); the per-batch deduction is emitted on an unreachable
    sentinel key (a single space — tokens are split on ``\\s+``) so the
    combine knows the ACTUAL D, and the batch token total rides a
    second sentinel (empty string). A plain distributed SUM of partials
    is a valid MG merge: every token's summed counter ≥ true − D, so
    thresholding at summed + D ≥ ⌈n/512⌉ gives a candidate set with
    ZERO false negatives for the φ gate. Shuffle volume is O(m) rows
    per batch no matter how large the vocabulary — that is the whole
    point at 100 TB.

    Phase B (verify pass): the candidate panel (≤ m · blocks rows,
    driver-combined) is closure-broadcast; one exact-count pass over
    the corpus restricted to candidates, integer φ gate
    (512 · count ≥ n_total — no float boundary), sorted by token.
    Reference analogue: G1's posting-list group counts with T4's
    bounded-state discipline."""
    m = _HH_CAPACITY

    def _explode(df: pd.DataFrame) -> np.ndarray:
        ex = df["text"].fillna("").str.split(_WS_ASCII).explode()
        ex = ex[ex.notna() & (ex != "")]
        return ex.to_numpy(dtype=object)

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        v = _explode(df)
        u, c = np.unique(v, return_counts=True)
        n_batch = int(c.sum())
        deduct = 0
        if len(c) > m:
            d = int(np.partition(c, len(c) - (m + 1))[len(c) - (m + 1)])
            keep = c > d
            u, c = u[keep], c[keep] - d
            deduct = d
        return pd.DataFrame(
            {
                "token": np.concatenate([u, np.array(["", " "], dtype=object)]),
                "part_n": np.concatenate(
                    [c, [n_batch, deduct]]
                ).astype(np.int64),
            }
        )

    docs = _docs(sf_dir, columns=["text"])
    panel = (
        docs.map_batches(sketch, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("part_n", alias_name="mg_n"))
        .to_pandas()
    )
    n_total = int(panel.loc[panel["token"] == "", "mg_n"].sum())
    d_total = int(panel.loc[panel["token"] == " ", "mg_n"].sum())
    need = -(-n_total // _HH_PHI_INV)  # ceil
    cand = panel[
        ~panel["token"].isin(["", " "]) & (panel["mg_n"] + d_total >= need)
    ]["token"].to_numpy(dtype=object)
    cand.sort()

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        v = _explode(df)
        v = v[np.isin(v, cand)]
        u, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"token": u, "part_n": c.astype(np.int64)})

    out = (
        docs.map_batches(verify, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("part_n", alias_name="n_occurrences"))
        .to_pandas()
    )
    out = out[out["n_occurrences"] * _HH_PHI_INV >= n_total]
    return out.sort_values("token").reset_index(drop=True)


_QSK_STRIDE = 64  # order statistics emitted per batch: every 64th + max


def q_quantile_sketch(sf_dir: str):
    """EXACT distributed quantiles by mergeable-summary bracketing —
    the two-pass scheme real engines use when a full sort is too
    expensive: a q-digest-style summary brackets each target rank, then
    one filtered pass resolves the exact order statistic. Completes the
    mergeable-sketch family (KMV distinct, HDR histogram, Misra–Gries
    frequent items, now quantiles — Agarwal et al., PODS'12).

    Pass 1: each batch emits every 64th order statistic plus its max,
    weighted by the gap it covers, so count(x ≤ v) for any summary
    value v is bounded within [W(v), W(v) + (s−1)·n_batches] where W is
    the weight cumsum. For each target rank r = ⌈pct·n/100⌉ (DuckDB's
    ``quantile_disc`` rule, pinned empirically) that gives a bracket
    (lo, hi] GUARANTEED to contain the answer. Summary size is n/64
    rows — the stride is the ε knob; at 100 TB you raise it (or add one
    hierarchical re-compression level) so the panel stays driver-sized.
    Pass 2: count exact n_below = #{x ≤ lo} and collect only the values
    inside the bracket (≤ s·n_batches per target by the same bound);
    the answer is the (r − n_below)-th smallest of that tiny window.
    Output is integer cents (floor of the SAME IEEE double on both
    sides — the repo's money rule), so the oracle is hash-exact."""
    PCTS = [1, 5, 25, 50, 75, 95, 99]
    s = _QSK_STRIDE
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def summary(df: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(df["value"].dropna().to_numpy(dtype=np.float64))
        if len(v) == 0:
            return pd.DataFrame(
                {
                    "v": pd.Series([], dtype="float64"),
                    "w": pd.Series([], dtype="int64"),
                    "nb": pd.Series([], dtype="int64"),
                }
            )
        idx = np.arange(s - 1, len(v), s)
        if len(idx) == 0 or idx[-1] != len(v) - 1:
            idx = np.append(idx, len(v) - 1)
        w = np.diff(np.concatenate([[0], idx + 1])).astype(np.int64)
        nb = np.zeros(len(idx), dtype=np.int64)
        nb[0] = 1  # summed downstream → number of batch summaries
        return pd.DataFrame({"v": v[idx], "w": w, "nb": nb})

    panel = (
        ev.map_batches(summary, batch_format="pandas")
        .to_pandas()
        .sort_values("v", kind="stable")
    )
    n_batches = int(panel["nb"].sum())
    W = panel["w"].to_numpy(dtype=np.int64).cumsum()
    vals = panel["v"].to_numpy(dtype=np.float64)
    n_total = int(W[-1])
    slack = (s - 1) * n_batches
    # Collapse duplicate summary values to their LAST position's cumweight:
    # count(x ≤ v) bounds hold per distinct value, not per summary row —
    # with ties across batches a per-row lo can already cover rank r,
    # emptying the (lo, hi] window.
    last = np.flatnonzero(np.append(vals[1:] != vals[:-1], True))
    vals, W = vals[last], W[last]

    brackets = []  # (pct, rank, lo_or_None, hi)
    for pct in PCTS:
        r = -(-pct * n_total // 100)  # ceil(pct·n/100)
        below = np.flatnonzero(W + slack < r)
        lo = float(vals[below[-1]]) if len(below) else None
        hi = float(vals[np.flatnonzero(W >= r)[0]])
        brackets.append((pct, r, lo, hi))

    def window(df: pd.DataFrame) -> pd.DataFrame:
        x = df["value"].dropna().to_numpy(dtype=np.float64)
        pcts, kinds, out = [], [], []
        for pct, _r, lo, hi in brackets:
            n_below = int((x <= lo).sum()) if lo is not None else 0
            win = x[(x > lo) & (x <= hi)] if lo is not None else x[x <= hi]
            pcts += [pct] * (1 + len(win))
            kinds += [0] + [1] * len(win)  # 0 = below-count partial, 1 = value
            out += [float(n_below)] + win.tolist()
        return pd.DataFrame(
            {
                "pct": pd.Series(pcts, dtype="int64"),
                "kind": pd.Series(kinds, dtype="int64"),
                "x": pd.Series(out, dtype="float64"),
            }
        )

    p2 = ev.map_batches(window, batch_format="pandas").to_pandas()
    rows = []
    for pct, r, _lo, _hi in brackets:
        g = p2[p2["pct"] == pct]
        n_below = int(g.loc[g["kind"] == 0, "x"].sum())
        win = np.sort(g.loc[g["kind"] == 1, "x"].to_numpy(dtype=np.float64))
        ans = win[r - n_below - 1]
        rows.append((pct, int(np.floor(ans * 100))))
    return pd.DataFrame(rows, columns=["pct", "value_cents"]).astype(
        {"pct": "int64", "value_cents": "int64"}
    )


_GC_W = 8  # token window width shared with dup_span_stats
_GC_DF_MAX = 8  # grams in more docs than this are boilerplate, not evidence


def q_gram_components(sf_dir: str):
    """Connected components over the rare-gram co-occurrence graph —
    the clustering ladder (``stages/clustering.py``) anchored, for the
    first time, to a FULL SQL oracle (a recursive min-label CTE) instead
    of pytest-only coverage. Nodes = every doc; edge (a, b) iff some
    8-token window occurs in both AND in ≤ ``_GC_DF_MAX`` docs total —
    a deterministic df PREDICATE (the ExactSubstr boilerplate rule),
    not a truncation cap, so the oracle expresses it verbatim.

    Shape: one content pass emits each doc's DISTINCT hashed windows
    (16-byte blake2b — 64-bit keys take birthday collisions at 10^12
    grams), hash-bucketed by key; each bucket filters df ∈ [2, DF_MAX]
    and expands pairs with one vectorized triu per distinct run length
    (≤ C(8,2) = 28 edges per gram by the predicate, so the edge stream
    is bounded by the duplicated-gram count, never df²); the component
    closure is the tested driver-union-find → contraction →
    label-propagation ladder. Output: (doc_id, component_id = min doc
    id reachable, component_size). Reference analogue: the candidate
    graph over shared n-grams (``fuzz/inexus_parser.py:468-889``)
    closed into entity groups."""
    import hashlib

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions
    from address_parser_ray.stages.clustering import connected_components

    nparts = default_num_partitions()
    W = _GC_W

    def emit(t: pa.Table) -> pa.Table:
        docs_l, keys = [], []
        for d, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = [w.lower() for w in _ws_tokens(text) if w]
            seen = {
                hashlib.blake2b(
                    " ".join(toks[i : i + W]).encode(), digest_size=16
                ).digest()
                for i in range(len(toks) - W + 1)
            }
            docs_l += [d] * len(seen)
            keys += list(seen)
        if not keys:
            return pa.table(
                {
                    "bucket": pa.array([], type=pa.int64()),
                    "hi": pa.array([], type=pa.uint64()),
                    "lo": pa.array([], type=pa.uint64()),
                    "doc_id": pa.array([], type=pa.int64()),
                }
            )
        # 16-byte keys → two uint64 words (vectorized grouping downstream)
        kw = np.frombuffer(b"".join(keys), dtype=np.uint64).reshape(-1, 2)
        bucket = (splitmix64(kw[:, 0]) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "hi": pa.array(kw[:, 0]),
                "lo": pa.array(kw[:, 1]),
                "doc_id": pa.array(np.asarray(docs_l, dtype=np.int64)),
            }
        )

    def bucket_edges(t: pa.Table) -> pa.Table:
        hi = np.asarray(t["hi"], dtype=np.uint64)
        lo = np.asarray(t["lo"], dtype=np.uint64)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        order = np.lexsort((ids, lo, hi))
        hi, lo, ids = hi[order], lo[order], ids[order]
        change = np.flatnonzero((hi[1:] != hi[:-1]) | (lo[1:] != lo[:-1])) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [hi.size]]))
        ok = (lens >= 2) & (lens <= _GC_DF_MAX)
        out_s, out_d = [], []
        for m in np.unique(lens[ok]):
            sel = starts[ok][lens[ok] == m]
            idm = ids[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            out_s.append(idm[:, iu].ravel())
            out_d.append(idm[:, ju].ravel())
        src = np.concatenate(out_s) if out_s else np.array([], dtype=np.int64)
        dst = np.concatenate(out_d) if out_d else np.array([], dtype=np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    docs = _docs(sf_dir, ["doc_id", "text"])
    edges = (
        docs.map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_edges, batch_format="pyarrow")
    )
    nodes = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"]}), batch_format="pyarrow"
    )
    asg = connected_components(edges, nodes)

    def with_size(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": g["record_id"].to_numpy(np.int64),
                "component_id": g["cluster_id"].to_numpy(np.int64),
                "component_size": np.int64(len(g)),
            }
        )

    return asg.groupby("cluster_id").map_groups(with_size, batch_format="pandas")


def q_bigram_lm_scores(sf_dir: str):
    """Bigram language-model quality scoring — the CCNet/perplexity-
    filter shape (Wenzek et al. 2020): TRAIN an n-gram LM over the
    corpus, then SCORE every document with it, both distributed.

    Train pass: per-batch bigram Counters → one vocabulary-bounded
    groupby (the shuffle carries (bigram, count) partials, never token
    occurrences); prefix counts fall out as the per-w1 sum of bigram
    counts, no second pass. Score pass: the (bigram → c_bg, c_prefix)
    model is `ray.put` once and every batch hash-joins its flattened
    bigram stream against it (a pandas merge — no per-row probes).
    At 100 TB the model panel is pruned to the top-K bigrams before
    broadcast (the CCNet move); here it stays exact so the oracle can
    replay it verbatim.

    Scores are PURE INTEGER — each position contributes
    ``c_bg · 10^6 // c_prefix`` (a fixed-point conditional probability;
    floor division is exact on both engines, no libm logs to drift) —
    so the doc score is hash-exact against SQL. Output: (doc_id,
    n_bigrams, lm_score); docs under 2 tokens score 0. Reference
    analogue: the n-gram frequency model built per call in
    ``fuzz/inexus_parser.py:468-520`` reused as a scoring table."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for text in df["text"]:
            toks = [w.lower() for w in _ws_tokens(text) if w]
            c.update(zip(toks, toks[1:]))
        return pd.DataFrame(
            {
                "w1": [k[0] for k in c],
                "w2": [k[1] for k in c],
                "part_n": np.fromiter(c.values(), dtype=np.int64, count=len(c)),
            }
        )

    # single-key combine (composite aggregates sort the whole stream —
    # see q_event_value_percentiles): group on w1, fold w2 inside.
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], sort=False, as_index=False)["part_n"].sum()
        out["c_prefix"] = out.groupby("w1", sort=False)["part_n"].transform("sum")
        return out.rename(columns={"part_n": "c_bg"})

    model = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("w1")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    model["score"] = model["c_bg"].to_numpy(np.int64) * 1_000_000 // model[
        "c_prefix"
    ].to_numpy(np.int64)
    model_ref = ray.put(model[["w1", "w2", "score"]])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(model_ref)
        ids, w1s, w2s, nbg = [], [], [], []
        for d, text in zip(df["doc_id"], df["text"]):
            toks = [w.lower() for w in _ws_tokens(text) if w]
            ids += [d] * max(0, len(toks) - 1)
            w1s += toks[:-1]
            w2s += toks[1:]
            nbg.append(max(0, len(toks) - 1))
        flat = pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64),
                             "w1": w1s, "w2": w2s})
        joined = flat.merge(m, on=["w1", "w2"], how="left")
        per = joined.groupby("doc_id", sort=False)["score"].sum()
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_bigrams": np.asarray(nbg, dtype=np.int64),
            }
        )
        out["lm_score"] = (
            out["doc_id"].map(per).fillna(0).astype(np.int64)
        )
        return out

    return docs.map_batches(score, batch_format="pandas")


def q_scd2_history(sf_dir: str):
    """SCD-Type-2 dimension build — turn a versioned change stream into
    VALIDITY INTERVALS (valid_to = next version, 9999 sentinel = open;
    is_current flag), the warehouse-history sibling of the final-state
    CDC merges (``upsert_latest`` keeps only the winner;
    ``cdc_with_deletes`` adds tombstones; SCD2 keeps EVERY version with
    its lifespan). The change stream is derived deterministically from
    documents exactly like ``q_cdc_with_deletes``'s delta: v0 = base
    row, v1 touches every 5th doc, v2 every 15th.

    Shape: the three version streams union and hash-bucket by key in
    ONE single-key shuffle; each bucket builds intervals in one
    vectorized lexsort + shift (a row's valid_to is the next version of
    the SAME key — all of a key's versions co-locate because the bucket
    key is the dimension key). At 10^12 rows this is the standard
    reduce-side history rebuild: shuffle ∝ change-stream size, no
    window function over a global sort."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit_versions(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        src = np.asarray(t["source"].to_pylist(), dtype=object)
        nc = np.asarray(t["n_chars"], dtype=np.int64)
        m1 = ids % 5 == 0
        m2 = ids % 15 == 0
        out_ids = np.concatenate([ids, ids[m1], ids[m2]])
        out_src = np.concatenate(
            [src, np.full(int(m1.sum()), "v1", object),
             np.full(int(m2.sum()), "v2", object)]
        )
        out_nc = np.concatenate([nc, nc[m1] + 100, nc[m2] + 200])
        out_ver = np.concatenate(
            [
                np.zeros(ids.size, dtype=np.int64),
                np.ones(int(m1.sum()), dtype=np.int64),
                np.full(int(m2.sum()), 2, dtype=np.int64),
            ]
        )
        return pa.table(
            {
                "bucket": pa.array(
                    (
                        splitmix64(out_ids.view(np.uint64))
                        % np.uint64(nparts)
                    ).astype(np.int64)
                ),
                "doc_id": pa.array(out_ids),
                "version": pa.array(out_ver),
                "source": pa.array(out_src.tolist(), type=pa.string()),
                "n_chars": pa.array(out_nc),
            }
        )

    def build_intervals(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["doc_id"].to_numpy(np.int64)
        ver = g["version"].to_numpy(np.int64)
        order = np.lexsort((ver, ids))
        ids, ver = ids[order], ver[order]
        g = g.iloc[order]
        nxt_same = np.concatenate([ids[1:] == ids[:-1], [False]])
        valid_to = np.where(
            nxt_same, np.concatenate([ver[1:], [0]]), np.int64(9999)
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "version": ver,
                "source": g["source"].to_numpy(),
                "n_chars": g["n_chars"].to_numpy(np.int64),
                "valid_to": valid_to.astype(np.int64),
                "is_current": (~nxt_same).astype(np.int64),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "source", "n_chars"])
        .map_batches(emit_versions, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build_intervals, batch_format="pandas")
        .sort(["doc_id", "version"])
    )


def q_rollup_counts(sf_dir: str):
    """Multi-level ROLLUP aggregate — (lang, source), (lang), and grand
    total in ONE pass: each batch partial-aggregates locally and emits
    rows for all three levels ('*' marks a rolled-up axis), so the
    hierarchy costs zero extra shuffles over a flat groupby. The combine
    groups on a single FUSED key (lang + unit-separator + source) —
    composite-key aggregate shuffles pay a full multi-column sort in
    Ray's sort shuffle, while the fused single key sorts once (see
    q_event_value_percentiles). Pre-combine volume is ≤ (langs·sources
    + langs + 1) rows per block regardless of input size — the standard
    warehouse CUBE/ROLLUP trick of pushing every level into the partial."""
    SEP = "\x1f"

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        base = (
            df.groupby(["lang", "source"], sort=False)
            .agg(n=("n_chars", "size"), chars=("n_chars", "sum"))
            .reset_index()
        )
        lv1 = (
            base.groupby("lang", sort=False)
            .agg(n=("n", "sum"), chars=("chars", "sum"))
            .reset_index()
        )
        rows = pd.concat(
            [
                pd.DataFrame(
                    {
                        "k": base["lang"] + SEP + base["source"],
                        "n": base["n"],
                        "chars": base["chars"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": lv1["lang"] + SEP + "*",
                        "n": lv1["n"],
                        "chars": lv1["chars"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": ["*" + SEP + "*"],
                        "n": [int(base["n"].sum())],
                        "chars": [int(base["chars"].sum())],
                    }
                ),
            ],
            ignore_index=True,
        )
        rows["n"] = rows["n"].astype("int64")
        rows["chars"] = rows["chars"].astype("int64")
        return rows

    def split_key(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["k"].str.split(SEP, expand=True)
        return pd.DataFrame(
            {
                "lang": parts[0],
                "source": parts[1],
                "n_docs": df["n_docs"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
            }
        )

    return (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partials, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("chars", alias_name="n_chars"),
        )
        .map_batches(split_key, batch_format="pandas")
        .sort(["lang", "source"])
    )


def _skyline_2d(size: np.ndarray, price: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D Pareto frontier (maximize ``size``,
    minimize ``price``): a row is dominated iff some row has size ≥ and
    price ≤ with at least one strict. Equal (size, price) rows do not
    dominate each other — all survive. Vectorized: per-size min price,
    then a strict running-min scan over sizes descending."""
    if size.size == 0:
        return np.zeros(0, dtype=bool)
    order = np.lexsort((price, -size))  # size desc, price asc
    s, p = size[order], price[order]
    first = np.concatenate([[True], s[1:] != s[:-1]])
    # min price of any STRICTLY larger size, as a running prefix
    grp_min = p[first]  # per distinct size (sorted asc within size)
    best_above = np.concatenate(
        [[np.iinfo(np.int64).max], np.minimum.accumulate(grp_min)[:-1]]
    )
    seg = np.cumsum(first) - 1
    keep_sorted = (p == grp_min[seg]) & (p < best_above[seg])
    keep = np.zeros(size.size, dtype=bool)
    keep[order] = keep_sorted
    return keep


def q_pareto_parts(sf_dir: str):
    """Skyline / Pareto-dominance query over parts (maximize p_size,
    minimize price): return every part no other part beats on both
    axes — the dominance-query class, distinct from top-k/rank/window.
    Price compares in integer cents (floor(p_retailprice·100), the same
    IEEE expression both engines evaluate), so parity is exact.

    Shape: the skyline operator is ALGEBRAIC — skyline(A ∪ B) =
    skyline(skyline(A) ∪ skyline(B)) — so each batch reduces to its
    local frontier first (vectorized lexsort + running-min scan) and
    only frontier-sized remnants move to the single combine group. At
    10^12 rows the shuffle carries ~√-law-sized frontiers per block,
    never the table; the final group is frontier-sized by the 2-D
    anti-chain bound (≤ #distinct sizes)."""

    def local_skyline(t: pa.Table) -> pa.Table:
        size = np.asarray(t["p_size"], dtype=np.int64)
        price = np.floor(
            np.asarray(t["p_retailprice"], dtype=np.float64) * 100
        ).astype(np.int64)
        keep = _skyline_2d(size, price)
        return pa.table(
            {
                "g": pa.array(np.zeros(int(keep.sum()), dtype=np.int64)),
                "p_partkey": pa.array(
                    np.asarray(t["p_partkey"], dtype=np.int64)[keep]
                ),
                "p_size": pa.array(size[keep]),
                "price_cents": pa.array(price[keep]),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        keep = _skyline_2d(
            g["p_size"].to_numpy(np.int64),
            g["price_cents"].to_numpy(np.int64),
        )
        out = g.loc[keep, ["p_partkey", "p_size", "price_cents"]]
        return out.astype("int64")

    return (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_size", "p_retailprice"],
        )
        .map_batches(local_skyline, batch_format="pyarrow")
        .groupby("g")
        .map_groups(combine, batch_format="pandas")
        .sort("p_partkey")
    )


_PR_R0 = 1_000_000_000  # initial rank, integer fixed point
_PR_BASE = 150_000_000  # (1 - 0.85) * R0 teleport term


def q_pagerank_ranks(sf_dir: str, _gate_bytes: int = 64 << 20):
    """Iterative PageRank (3 damped power iterations, d = 0.85) over the
    symmetrized customer↔supplier graph (edge = "this customer bought
    from this supplier", from orders ⋈ lineitem) — the iterative
    GRAPH-RANKING class of distributed algorithm (vs the repo's
    connected components / k-means / EM / gradient loops). Integer fixed
    point end to end: contribution(u→v) = (r_u * 85) // (100 * deg_u),
    new r_v = 150000000 + Σ contribs — floor semantics identical in
    numpy and the unrolled-CTE DuckDB oracle, so parity is exact, not
    float-tolerant.

    Shape: edges come from the co-partitioned big-big join (bucket by
    orderkey — neither fact side broadcasts), deduped by pair-hash
    bucket, then land hash-bucketed BY SOURCE NODE — which means a
    node's outdegree and its outgoing contributions are both computable
    inside its bucket with no further data movement. Under a byte gate
    (rank panel is NODE-sized — dimension-tiny here) each iteration is
    ONE pass over the static deg-annotated edge panel with the ranks
    broadcast via ``ray.put`` (searchsorted lookups) and a node-sized
    partial-sum combine — edges never re-shuffle per iteration. Above
    the gate the reduce-side path runs: (ranks ∪ edges) by src bucket →
    per-bucket vectorized contrib emission pre-summed per (bucket, dst),
    then by dst bucket → per-node sum + teleport — two single-key
    shuffles per iteration, no broadcast assumption. Rank panels are
    materialized per iteration to keep lineage flat; at 10^12 files the
    analogue checkpoints them as parquet, exactly like the flagship's
    stage checkpoints. Nodes are namespaced (cust*2 / supp*2+1);
    symmetrizing leaves no dangling nodes, so the teleport constant
    needs no dangling-mass correction. Both paths produce identical
    panels (pinned by test_pagerank_paths_agree)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def _bucket_of(a: np.ndarray) -> np.ndarray:
        return (
            splitmix64(a.astype(np.int64).view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)

    # ---- stage 1: distinct (cust, supp) edges via co-partitioned join
    def tag_orders(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(k)),
                "key": pa.array(k),
                "val": pa.array(np.asarray(t["o_custkey"], dtype=np.int64)),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            }
        )

    def tag_items(t: pa.Table) -> pa.Table:
        k = np.asarray(t["l_orderkey"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket_of(k)),
                "key": pa.array(k),
                "val": pa.array(np.asarray(t["l_suppkey"], dtype=np.int64)),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["key", "val"]].rename(columns={"val": "c"})
        li = g.loc[g["side"] == 1, ["key", "val"]].rename(columns={"val": "s"})
        j = li.merge(o, on="key")[["c", "s"]].drop_duplicates()
        src = j["c"].to_numpy(np.int64) * 2
        dst = j["s"].to_numpy(np.int64) * 2 + 1
        # dedup within this orderkey bucket; the same pair can still
        # arrive from other orderkeys → rebucket by pair hash for the
        # global distinct
        pair = splitmix64(src.view(np.uint64)) ^ dst.view(np.uint64)
        return pd.DataFrame(
            {
                "bucket": (
                    splitmix64(pair) % np.uint64(nparts)
                ).astype(np.int64),
                "src": src,
                "dst": dst,
            }
        )

    def distinct_symmetrize(g: pd.DataFrame) -> pd.DataFrame:
        e = g[["src", "dst"]].drop_duplicates()
        src = e["src"].to_numpy(np.int64)
        dst = e["dst"].to_numpy(np.int64)
        both_src = np.concatenate([src, dst])
        both_dst = np.concatenate([dst, src])
        return pd.DataFrame(
            {
                "bucket": _bucket_of(both_src),
                "a": both_src,  # src node — the bucketing key
                "b": both_dst,  # dst node
                "side": np.zeros(both_src.size, dtype=np.int8),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).map_batches(tag_items, batch_format="pyarrow")
    edges = (
        orders.union(items)
        .groupby("bucket")
        .map_groups(bucket_edges, batch_format="pandas")
        .groupby("bucket")
        .map_groups(distinct_symmetrize, batch_format="pandas")
        .materialize()  # node-pair panel ≪ fact inputs; reused 3×
    )

    # ---- stage 2: three power iterations, two shuffles each
    def emit_contribs(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g["side"] == 0]
        src = e["a"].to_numpy(np.int64)
        dst = e["b"].to_numpy(np.int64)
        if src.size == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                }
            )
        r = g[g["side"] == 1]
        if len(r):  # ranks from the previous iteration ride the union
            rmap = pd.Series(
                r["b"].to_numpy(np.int64), index=r["a"].to_numpy(np.int64)
            )
            rsrc = rmap.reindex(src).to_numpy(np.int64)
        else:  # first iteration: every node starts at R0
            rsrc = np.full(src.size, _PR_R0, dtype=np.int64)
        deg = pd.Series(src).groupby(src).transform("size").to_numpy(np.int64)
        contrib = (rsrc * 85) // (100 * deg)
        out = (
            pd.DataFrame({"node": dst, "c": contrib})
            .groupby("node", sort=False, as_index=False)
            .sum()  # partial-agg before the dst shuffle
        )
        out["bucket"] = _bucket_of(out["node"].to_numpy(np.int64))
        return out[["bucket", "node", "c"]].astype("int64")

    def combine_ranks(g: pd.DataFrame) -> pd.DataFrame:
        per = g.groupby("node", sort=False, as_index=False)["c"].sum()
        node = per["node"].to_numpy(np.int64)
        r = _PR_BASE + per["c"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "bucket": _bucket_of(node),
                "a": node,
                "b": r,
                "side": np.ones(node.size, dtype=np.int8),
            }
        )

    if edges.size_bytes() <= _gate_bytes:
        # gated fast path: attach each src's outdegree ONCE inside its
        # bucket, then every iteration is a single stationary pass over
        # the deg-annotated edges with the node-sized rank panel
        # broadcast — no per-iteration edge shuffle.
        def attach_deg(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["side"] == 0]
            src = e["a"].to_numpy(np.int64)
            dst = e["b"].to_numpy(np.int64)
            deg = pd.Series(src).groupby(src).transform("size").to_numpy(
                np.int64
            )
            return pd.DataFrame({"src": src, "dst": dst, "deg": deg})

        edges_deg = (
            edges.groupby("bucket")
            .map_groups(attach_deg, batch_format="pandas")
            .materialize()
        )
        rank_ref = ray.put(None)  # iteration 1: every node at R0
        panel = None
        for _ in range(3):
            ref = rank_ref

            def contribs(t: pa.Table, _ref=ref) -> pa.Table:
                state = ray.get(_ref)
                src = np.asarray(t["src"], dtype=np.int64)
                dst = np.asarray(t["dst"], dtype=np.int64)
                deg = np.asarray(t["deg"], dtype=np.int64)
                if state is None:
                    rsrc = np.full(src.size, _PR_R0, dtype=np.int64)
                else:
                    nodes, vals = state
                    rsrc = vals[np.searchsorted(nodes, src)]
                contrib = (rsrc * 85) // (100 * deg)
                # partial-agg per dst inside the block
                order = np.argsort(dst, kind="stable")
                d_s, c_s = dst[order], contrib[order]
                cuts = np.flatnonzero(
                    np.concatenate([[True], d_s[1:] != d_s[:-1]])
                )
                sums = np.add.reduceat(c_s, cuts)
                return pa.table(
                    {
                        "node": pa.array(d_s[cuts]),
                        "c": pa.array(sums.astype(np.int64)),
                    }
                )

            # the contrib stream is ALREADY per-dst pre-aggregated per
            # block, so the combine input is ≤ blocks × nodes rows —
            # node-sized. A per-key groupby(node).aggregate here is the
            # measured Ray 2.49 sort-aggregate trap (the former path:
            # 3 iterations × ~15 s of shuffle for an 11k-node panel);
            # fold the partials with one driver-side searchsorted pass
            # instead (same discipline as the k-means seeding panel).
            nparts_list, cparts = [], []
            for b in edges_deg.map_batches(
                contribs, batch_format="pyarrow", zero_copy_batch=True
            ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
                nparts_list.append(np.asarray(b["node"], dtype=np.int64))
                cparts.append(np.asarray(b["c"], dtype=np.int64))
            allnodes = np.concatenate(nparts_list)
            allc = np.concatenate(cparts)
            nodes = np.unique(allnodes)
            sums = np.zeros(nodes.size, dtype=np.int64)
            np.add.at(sums, np.searchsorted(nodes, allnodes), allc)
            vals = _PR_BASE + sums
            rank_ref = ray.put((nodes, vals))
        return pa.table(
            {
                "node_id": pa.array(nodes),
                "rank_fp": pa.array(vals),
            }
        )

    ranks = None
    for _ in range(3):
        stream = edges if ranks is None else edges.union(ranks)
        ranks = (
            stream.groupby("bucket")
            .map_groups(emit_contribs, batch_format="pandas")
            .groupby("bucket")
            .map_groups(combine_ranks, batch_format="pandas")
            .materialize()  # node-sized panel; flattens the lineage
        )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({"node_id": t["a"], "rank_fp": t["b"]})

    return ranks.map_batches(finish, batch_format="pyarrow").sort("node_id")


def q_revenue_by_priority(sf_dir: str):
    """Big–big CO-PARTITIONED hash join — the one join shape the repo
    had not yet demonstrated: orders ⋈ lineitem on orderkey where BOTH
    sides are fact-sized, so neither may broadcast (every other join in
    the registry broadcasts a dimension or semi-join filter). Shape:
    tag + union the two streams, hash-bucket by orderkey (ONE single-key
    shuffle moves both sides, co-locating each key's rows), then each
    bucket joins locally with one vectorized pandas merge and
    pre-aggregates to a (priority, n_orders, cents) partial — the final
    combine folds nparts×5 tiny panels. Per-bucket distinct-order counts
    sum exactly because the bucket key IS the join key. At 100 TB this
    is the standard reduce-side join: shuffle ∝ the two projected
    columns, never a replicated table. Revenue = floor(price·(1−disc)
    ·100) — the same IEEE expression both engines evaluate."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def tag_orders(t: pa.Table) -> pa.Table:
        k = np.asarray(t["o_orderkey"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(k),
                "priority": t["o_orderpriority"],
                "cents": pa.array(np.zeros(len(k), dtype=np.int64)),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            }
        )

    def tag_lineitem(t: pa.Table) -> pa.Table:
        k = np.asarray(t["l_orderkey"], dtype=np.int64)
        price = np.asarray(t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"], dtype=np.float64)
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(k),
                "priority": pa.array([""] * len(k), type=pa.string()),
                "cents": pa.array(cents),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(tag_lineitem, batch_format="pyarrow")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["key", "priority"]]
        li = g.loc[g["side"] == 1, ["key", "cents"]]
        j = li.merge(o, on="key", how="inner")
        if len(j) == 0:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series([], dtype="object"),
                    "part_orders": pd.Series([], dtype="int64"),
                    "part_cents": pd.Series([], dtype="int64"),
                }
            )
        agg = j.groupby("priority").agg(
            part_orders=("key", "nunique"), part_cents=("cents", "sum")
        )
        agg.index.name = "o_orderpriority"
        return agg.reset_index().astype(
            {"part_orders": "int64", "part_cents": "int64"}
        )

    panel = (
        orders.union(items)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .to_pandas()
    )
    out = (
        panel.groupby("o_orderpriority", as_index=False)[
            ["part_orders", "part_cents"]
        ]
        .sum()
        .rename(columns={"part_orders": "n_orders", "part_cents": "revenue_cents"})
        .astype({"n_orders": "int64", "revenue_cents": "int64"})
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return out


def q_user_running_totals(sf_dir: str):
    """Ordered window functions — ROW_NUMBER + running SUM per user —
    the remaining classic window shape (events_sliding covers
    range-frames, purchase_last_click covers as-of; this is the
    row-frame prefix scan). Each user's full history must be co-located
    for a prefix sum, so the stream hash-buckets by user (the SAME
    single-key shuffle every other per-user op in the registry rides —
    one partitioning key reused, per the scale plan) and each bucket
    sorts once and runs vectorized cumsum/rank, no per-row Python.
    Partitioning assumption (documented, shared with user_sessions):
    one bucket holds a user's whole history; a user too big for one
    block would need a range-partitioned segmented scan. Ordering ties
    on ts break by event_id — pinned on both sides. Output: one row per
    'purchase' event (bounded projection of the scan) with its per-user
    sequence number and running cents total."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def tag(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(u.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "user_id": pa.array(u),
                "event_id": t["event_id"],
                "ts": t["ts"],
                "event_type": t["event_type"],
                "cents": pa.array(
                    _cents(np.asarray(t["value"], dtype=np.float64))
                ),
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        seq = g.groupby("user_id", sort=False).cumcount().to_numpy() + 1
        run = g.groupby("user_id", sort=False)["cents"].cumsum().to_numpy()
        keep = (g["event_type"] == "purchase").to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64)[keep],
                "user_id": g["user_id"].to_numpy(np.int64)[keep],
                "seq_no": seq[keep].astype(np.int64),
                "running_cents": run[keep].astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "ts", "user_id", "event_type", "value"],
        )
        .map_batches(tag, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )


_MH_P, _MH_BANDS, _MH_ROWS, _MH_SEED = 8, 4, 2, 7


def _mh_band_rows(t: pa.Table):
    """(doc_ids, band_idx, band_keys_u64) for one batch — the flagship
    blocking math (8-gram rolling-hash shingles over the normalized
    text → classic (a·x+b mod 2⁶⁴) MinHash → splitmix64 band fold,
    ``functions/hashing.py:minhash_signature/lsh_band_keys``) at
    SQL-checkable parameters (P=8 perms, 4 bands × 2 rows; the pipeline
    runs 128/32×4 — same kernels, same fold). Docs empty after
    normalization emit nothing (no shingles → sentinel signature)."""
    from address_parser_ray.functions.hashing import (
        char_shingle_hashes,
        lsh_band_keys,
        minhash_params,
        minhash_signature,
    )
    from address_parser_ray.functions.normalize import normalize_content_arrow

    a, b = minhash_params(_MH_P, _MH_SEED)
    norm = normalize_content_arrow(t["text"]).to_pylist()
    ids = np.asarray(t["doc_id"], dtype=np.int64)
    out_id, out_band, out_key = [], [], []
    for d, x in zip(ids, norm):
        if not x:
            continue
        sig = minhash_signature(char_shingle_hashes(x, 8), a, b)
        keys = lsh_band_keys(sig, _MH_BANDS, _MH_ROWS)
        out_id.extend([int(d)] * _MH_BANDS)
        out_band.extend(range(_MH_BANDS))
        out_key.extend(int(k) for k in keys)
    return (
        np.asarray(out_id, dtype=np.int64),
        np.asarray(out_band, dtype=np.int64),
        np.asarray(out_key, dtype=np.uint64),
    )


def q_minhash_band_keys(sf_dir: str):
    """LSH band keys with a FULL SQL oracle — closes the gap where the
    LSH banding itself was only pytest-covered: every doc's band keys
    are recomputed independently in DuckDB down to the 64-bit hex (u64
    does not fit BIGINT, so keys emit as 16-hex text). One map_batches
    pass, no shuffle. Math in ``_mh_band_rows``."""

    def fn(t: pa.Table) -> pa.Table:
        ids, bands, keys = _mh_band_rows(t)
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "band": pa.array(bands),
                "band_key": pa.array(
                    [format(k, "016x") for k in keys], type=pa.string()
                ),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def _mh_assignments(sf_dir: str):
    """Shared core of the SQL-checkable LSH clustering: band-key
    emission → bucketed pair expansion → transitive closure through
    the ``stages/clustering`` ladder. Returns the assignments dataset
    (record_id, cluster_id = min reachable doc id)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions
    from address_parser_ray.stages.clustering import connected_components

    nparts = default_num_partitions()

    def emit(t: pa.Table) -> pa.Table:
        ids, bands, keys = _mh_band_rows(t)
        # fold band index into the key space (already mixed in by the
        # fold, but keep (band, key) distinct explicitly for grouping)
        bucket = (splitmix64(keys) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "key": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(ids),
            }
        )

    def bucket_edges(t: pa.Table) -> pa.Table:
        key = np.asarray(t["key"], dtype=np.int64)
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        order = np.lexsort((ids, key))
        key, ids = key[order], ids[order]
        keep = np.concatenate(
            [[True], (key[1:] != key[:-1]) | (ids[1:] != ids[:-1])]
        )
        key, ids = key[keep], ids[keep]
        change = np.flatnonzero(np.diff(key)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [key.size]]))
        out_s, out_d = [], []
        for m in np.unique(lens):
            if m < 2:
                continue
            sel = starts[lens == m]
            idm = ids[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            out_s.append(idm[:, iu].ravel())
            out_d.append(idm[:, ju].ravel())
        src = np.concatenate(out_s) if out_s else np.array([], dtype=np.int64)
        dst = np.concatenate(out_d) if out_d else np.array([], dtype=np.int64)
        return pa.table({"src": pa.array(src), "dst": pa.array(dst)})

    edges = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_edges, batch_format="pyarrow")
    )
    nodes = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda t: pa.table({"record_id": t["doc_id"]}), batch_format="pyarrow"
    )
    return connected_components(edges, nodes)


def q_minhash_cluster_ids(sf_dir: str):
    """MinHash-LSH clustering END-TO-END with a FULL SQL oracle — the
    flagship's whole shape (shingle → MinHash → band → candidate edges
    → transitive closure) verified row-exactly against a recursive
    min-label CTE in DuckDB, at the SQL-checkable band parameters of
    ``_mh_band_rows``. Edges = docs sharing any (band, key); the
    closure runs through the SAME ``stages/clustering`` ladder the
    flagship uses (driver union-find below the gate, distributed star
    contraction above). Band keys hash-bucket once (single-key
    shuffle); per-bucket pair expansion is one vectorized triu per
    run length. Output: (doc_id, cluster_id = min reachable doc id,
    cluster_size) for every doc — empty docs are singletons."""
    asg = _mh_assignments(sf_dir)

    def with_size(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": g["record_id"].to_numpy(np.int64),
                "cluster_id": g["cluster_id"].to_numpy(np.int64),
                "cluster_size": np.int64(len(g)),
            }
        )

    return asg.groupby("cluster_id").map_groups(with_size, batch_format="pandas")


def q_clustering_agreement(sf_dir: str):
    """Clustering-agreement evaluation — exact integer Adjusted Rand
    Index between TWO clusterings of the corpus: A = exact-duplicate
    groups (label = min doc_id sharing the identical text), B = the
    SQL-checkable MinHash-LSH clustering (``minhash_cluster_ids``).
    This is the eval harness an ER engine runs whenever a cheap
    clustering is validated against a reference one (the differential
    shape of ``tests/eval_parsers.py:76-114`` lifted from per-field
    diffs to whole-partition agreement).

    All four Rand terms come from pair counts computed WITHOUT
    enumerating pairs: contingency cells (a_label, b_label, n) via one
    fused-key count shuffle, then Σ C(n,2) over cells / A-sizes /
    B-sizes as vectorized panel passes. ARI is a ratio of integers —
    the row carries exact numerator/denominator components
    (pairs_both, pairs_a, pairs_b, n_docs) PLUS ari_milli =
    (1000·2·(N·Nab − Na·Nb)) // (N·(Na+Nb) − 2·Na·Nb) computed in
    Python bigint (HUGEINT in the oracle) so the approximate index is
    still hash-exact. Panels are cluster-count-sized; doc content
    never moves — only (doc_id, label) pairs."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions, pinned_join

    nparts = default_num_partitions()
    SEP = "\x1f"

    # A: exact-text labels (min doc_id per identical text)
    def emit_text_hash(t: pa.Table) -> pa.Table:
        h = _text_60bit(t["text"].to_pylist())
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(h.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "h": pa.array(h),
                "doc_id": t["doc_id"],
            }
        )

    def label_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lab = g.groupby("h")["doc_id"].transform("min").to_numpy(np.int64)
        return pd.DataFrame(
            {"doc_id": g["doc_id"].to_numpy(np.int64), "label_a": lab}
        )

    a = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_text_hash, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(label_bucket, batch_format="pandas")
    )

    # B: LSH clustering labels (shared core with minhash_cluster_ids)
    b = _mh_assignments(sf_dir).map_batches(
        lambda t: pa.table({"doc_id": t["record_id"], "label_b": t["cluster_id"]}),
        batch_format="pyarrow",
    )

    joined = pinned_join(a, b, on="doc_id", num_partitions=nparts)

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "k": df["label_a"].astype(str) + SEP + df["label_b"].astype(str),
                "part_n": np.int64(1),
            }
        ).groupby("k", as_index=False)["part_n"].sum()
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    def cell_final(g: pd.DataFrame) -> pd.DataFrame:
        la, lb = g["k"].iloc[0].split(SEP)
        return pd.DataFrame(
            {
                "label_a": np.array([int(la)], dtype=np.int64),
                "label_b": np.array([int(lb)], dtype=np.int64),
                "n": np.array([g["part_n"].sum()], dtype=np.int64),
            }
        )

    cells = (
        joined.map_batches(cell_partial, batch_format="pandas")
        .groupby("k")
        .map_groups(cell_final, batch_format="pandas")
        .to_pandas()
    )
    # panels are cluster-count-sized from here on (driver arithmetic in
    # exact Python ints — at 10^12 rows these stay distributed sums of
    # per-cell C(n,2) terms, same shape, bigger panel)
    n_cells = cells["n"].to_numpy(np.int64)
    n_docs = int(n_cells.sum())

    def c2(v: np.ndarray) -> int:
        v = v.astype(object)
        return int((v * (v - 1) // 2).sum()) if len(v) else 0

    nab = c2(n_cells)
    na = c2(cells.groupby("label_a")["n"].sum().to_numpy(np.int64))
    nb = c2(cells.groupby("label_b")["n"].sum().to_numpy(np.int64))
    n_pairs = n_docs * (n_docs - 1) // 2
    num = 2 * (n_pairs * nab - na * nb)
    den = n_pairs * (na + nb) - 2 * na * nb
    ari_milli = (1000 * num) // den if den else 1000
    return pd.DataFrame(
        {
            "n_docs": [n_docs],
            "pairs_both": [nab],
            "pairs_a": [na],
            "pairs_b": [nb],
            "ari_milli": [ari_milli],
        }
    ).astype("int64")


def _levenshtein_block(sa: list, sb: list) -> np.ndarray:
    """Unit-cost Levenshtein distances for aligned string lists,
    vectorized ACROSS THE PAIR AXIS: the DP table's sequential (i, j)
    dependencies stay as two small Python loops over max-length
    positions, but every cell update is one numpy op over all pairs at
    once — the hot axis (pairs) never touches the interpreter. Matches
    DuckDB ``levenshtein`` (unit insert/delete/substitute)."""
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    la = np.fromiter((len(s) for s in sa), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in sb), dtype=np.int64, count=n)
    ma, mb = int(la.max()), int(lb.max())
    A = np.zeros((n, max(ma, 1)), dtype=np.uint32)
    B = np.zeros((n, max(mb, 1)), dtype=np.uint32)
    for i, s in enumerate(sa):
        A[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    for i, s in enumerate(sb):
        B[i, : len(s)] = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)
    prev = np.tile(np.arange(mb + 1, dtype=np.int32), (n, 1))
    for i in range(1, ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, mb + 1):
            cost = (ai != B[:, j - 1]).astype(np.int32)
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost,
            )
        # rows whose A is exhausted freeze at row la (the answer row)
        done = la < i
        cur[done] = prev[done]
        prev = cur
    return prev[np.arange(n), lb].astype(np.int64)


def q_name_edit_pairs(sf_dir: str):
    """Edit-distance similarity self-join (the reference's
    fuzzy-alias matching family, ``fuzz/inexus_parser.py:2852-2941``,
    with Levenshtein instead of rapidfuzz ratios): part-name pairs
    within edit distance 3, weighted by how many ROW pairs each name
    pair represents. Scale shape: the row stream first collapses to the
    DISTINCT-name panel with counts (mergeable partial counts → one
    single-key combine — names are low-cardinality by domain), then the
    panel broadcasts via ``ray.put`` and each panel slice computes DP
    distances against the whole broadcast side — an O(D²) similarity
    join distributed over tasks where D = distinct names ≪ rows (64 vs
    20k at sf0.1). Row-pair weight n_a·n_b comes along for free from the
    counts. DP is vectorized across the pair axis
    (``_levenshtein_block``)."""
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_name"]
    )

    def partial(t: pa.Table) -> pa.Table:
        names, counts = np.unique(
            np.asarray(t["p_name"].to_pylist(), dtype=object), return_counts=True
        )
        return pa.table(
            {
                "p_name": pa.array(list(names), type=pa.string()),
                "n": pa.array(counts.astype(np.int64)),
            }
        )

    panel = (
        parts.map_batches(partial, batch_format="pyarrow")
        .groupby("p_name")
        .map_groups(
            lambda g: pd.DataFrame(
                {"p_name": [g["p_name"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("p_name")
        .reset_index(drop=True)
    )
    bref = ray.put((panel["p_name"].tolist(), panel["n"].to_numpy(np.int64)))

    def pairs(t: pa.Table) -> pa.Table:
        all_names, all_n = ray.get(bref)
        my_names = t["p_name"].to_pylist()
        my_n = np.asarray(t["n"], dtype=np.int64)
        sa, sb, wa, wb = [], [], [], []
        for name, cnt in zip(my_names, my_n):
            # only the strictly-greater half of the cross product —
            # each unordered pair is computed exactly once fleet-wide
            for other, on in zip(all_names, all_n):
                if other > name:
                    sa.append(name)
                    sb.append(other)
                    wa.append(int(cnt))
                    wb.append(int(on))
        dist = _levenshtein_block(sa, sb)
        keep = dist <= 3
        w = np.asarray(wa, dtype=np.int64) * np.asarray(wb, dtype=np.int64)
        return pa.table(
            {
                "name_a": pa.array(np.asarray(sa, dtype=object)[keep].tolist(), type=pa.string()),
                "name_b": pa.array(np.asarray(sb, dtype=object)[keep].tolist(), type=pa.string()),
                "dist": pa.array(dist[keep]),
                "n_row_pairs": pa.array(w[keep] if len(w) else np.empty(0, np.int64)),
            }
        )

    return ray.data.from_pandas(panel).map_batches(
        pairs, batch_format="pyarrow", batch_size=16
    )


_KEYWORDS = ("hash", "join", "merge", "scan", "sort", "table")


def q_keyword_tags(sf_dir: str):
    """Gazetteer keyword tagging (the reference's alias-list match,
    M5/T3 ``longest-alias-first`` family, over a broadcast dictionary):
    count, per dictionary keyword, how many documents mention it and how
    many total token hits occur. Tokens are ASCII-``\\s+`` splits (the
    ``_ws_tokens`` parity rule); membership is exact token equality —
    no regex word-boundary ambiguity between engines. One map_batches
    pass emits (keyword, n_docs, n_hits) partials (the dictionary is a
    constant broadcast; per-batch doc counts are exact because each doc
    is one row), one tiny single-key combine folds them."""

    kws = np.asarray(_KEYWORDS, dtype=object)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows_kw, rows_docs, rows_hits = [], [], []
        agg_docs = np.zeros(len(kws), dtype=np.int64)
        agg_hits = np.zeros(len(kws), dtype=np.int64)
        for text in df["text"]:
            toks = np.asarray(_WS_ASCII.split(text or ""), dtype=object)
            m = np.searchsorted(kws, toks)
            m = np.clip(m, 0, len(kws) - 1)
            hit = kws[m] == toks
            if not hit.any():
                continue
            idx, cnt = np.unique(m[hit], return_counts=True)
            agg_docs[idx] += 1
            agg_hits[idx] += cnt
        present = agg_hits > 0
        return pd.DataFrame(
            {
                "keyword": kws[present],
                "n_docs": agg_docs[present],
                "n_hits": agg_hits[present],
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("keyword")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "keyword": [g["keyword"].iloc[0]],
                    "n_docs": [int(g["n_docs"].sum())],
                    "n_hits": [int(g["n_hits"].sum())],
                }
            ),
            batch_format="pandas",
        )
    )


def q_value_moments(sf_dir: str):
    """Exact distributed second moments per event_type on the integer
    cents grid: n, Σx, Σx², min, max — the one-pass mergeable-partials
    shape every statistical profiler needs (variance/stddev derive
    exactly from the output; no float accumulation order anywhere).
    Σx² of cents fits int64 with ~100× headroom at this domain
    (|value| ≤ ~10³ → cents² ≤ 10¹⁰; 2³ rows × 10¹⁰ ≪ 2⁶³). Partial
    per batch, single-key combine — event_type cardinality is
    domain-tiny."""

    def partial(t: pa.Table) -> pa.Table:
        cents = _cents(np.asarray(t["value"], dtype=np.float64))
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        uniq, inv = np.unique(et, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(len(uniq), dtype=np.int64)
        s2 = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        np.add.at(s2, inv, cents * cents)
        mn = np.full(len(uniq), np.iinfo(np.int64).max)
        mx = np.full(len(uniq), np.iinfo(np.int64).min)
        np.minimum.at(mn, inv, cents)
        np.maximum.at(mx, inv, cents)
        return pa.table(
            {
                "event_type": pa.array(list(uniq), type=pa.string()),
                "n": pa.array(n),
                "sum_cents": pa.array(s),
                "sumsq_cents": pa.array(s2),
                "min_cents": pa.array(mn),
                "max_cents": pa.array(mx),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n": [int(g["n"].sum())],
                "sum_cents": [int(g["sum_cents"].sum())],
                "sumsq_cents": [int(g["sumsq_cents"].sum())],
                "min_cents": [int(g["min_cents"].min())],
                "max_cents": [int(g["max_cents"].max())],
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
    )


def q_cdc_with_deletes(sf_dir: str):
    """CDC merge WITH TOMBSTONES — ``upsert_latest`` extended to the
    full change-capture contract: a delta stream carries updates
    (op='U', every 7th doc, version 1) AND deletes (op='D', every 11th
    doc, version 2, so a doc both updated and deleted ends deleted).
    Final state = per-key highest-version row, dropped when that row is
    a tombstone. Same scale shape as upsert_latest: keys hash-bucket
    once (single-key shuffle), each bucket resolves winners in one
    vectorized lexsort; the delta is small by contract. Full SQL oracle
    (row_number over version DESC, anti-filter on 'D')."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    base = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def as_base(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return t.append_column(
            "version", pa.array(np.zeros(n, dtype=np.int64))
        ).append_column("op", pa.array(["U"] * n, type=pa.string()))

    def as_delta(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        upd = t.filter(pa.array(ids % 7 == 0))
        nu = upd.num_rows
        updates = pa.table(
            {
                "doc_id": upd["doc_id"],
                "source": pa.array(["delta"] * nu, type=pa.string()),
                "n_chars": pc.add(upd["n_chars"], 1000),
                "version": pa.array(np.ones(nu, dtype=np.int64)),
                "op": pa.array(["U"] * nu, type=pa.string()),
            }
        )
        del_ = t.filter(pa.array(ids % 11 == 0))
        nd = del_.num_rows
        deletes = pa.table(
            {
                "doc_id": del_["doc_id"],
                "source": pa.array([""] * nd, type=pa.string()),
                "n_chars": pa.array(np.zeros(nd, dtype=np.int64)),
                "version": pa.array(np.full(nd, 2, dtype=np.int64)),
                "op": pa.array(["D"] * nd, type=pa.string()),
            }
        )
        return pa.concat_tables([updates, deletes])

    unioned = base.map_batches(as_base, batch_format="pyarrow").union(
        base.map_batches(as_delta, batch_format="pyarrow")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        kb = (splitmix64(ids.view(np.uint64)) % np.uint64(nparts)).astype(np.int64)
        return t.append_column("kb", pa.array(kb))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["doc_id", "version"], kind="stable")
        last = ~g["doc_id"].duplicated(keep="last")
        win = g.loc[last & (g["op"] != "D")]
        return win[["doc_id", "source", "n_chars", "version"]].astype(
            {"doc_id": np.int64, "n_chars": np.int64, "version": np.int64}
        )

    return (
        unioned.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("kb")
        .map_groups(resolve, batch_format="pandas")
    )


def q_embedding_dim_stats(sf_dir: str):
    """Per-dimension stats over a ``list<float>`` embedding column on
    the integer milli-grid: n, Σ, min, max for each of the 64 dims —
    the nested-column (UNNEST) aggregate shape. The Ray side never
    explodes rows: each batch reshapes the packed list buffer to
    (rows, dims) zero-copy and emits ONE (dims)-row partial (vectorized
    column reductions), so the shuffle carries blocks×dims tiny rows
    while the SQL twin pays the full row explosion. Combine is a
    single-key groupby over dim."""

    def partial(t: pa.Table) -> pa.Table:
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(t.num_rows, -1)
        milli = np.floor(emb * 1000.0).astype(np.int64)
        d = milli.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, milli.shape[0], dtype=np.int64)),
                "sum_milli": pa.array(milli.sum(axis=0)),
                "min_milli": pa.array(milli.min(axis=0)),
                "max_milli": pa.array(milli.max(axis=0)),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dim": [int(g["dim"].iloc[0])],
                "n": [int(g["n"].sum())],
                "sum_milli": [int(g["sum_milli"].sum())],
                "min_milli": [int(g["min_milli"].min())],
                "max_milli": [int(g["max_milli"].max())],
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["embedding"]
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .map_groups(combine, batch_format="pandas")
    )


def q_jw_name_pairs(sf_dir: str):
    """Jaro-Winkler similarity self-join over the distinct-name panel —
    the scorer's path-JW feature (``functions/similarity.py:jaro``)
    verified against DuckDB's ``jaro_winkler_similarity`` down to
    micro-units. Same broadcast-panel shape as ``name_edit_pairs``
    (distinct values ≪ rows; O(D²) distributed over panel slices).
    DuckDB (rapidfuzz) applies the Winkler prefix boost only when
    jaro > 0.7 — mirrored here; scores emit as floor(jw·10⁶ + ε)
    micro-units (the epsilon guards the 1-ulp bucket-boundary flake,
    ADVICE r2)."""
    from address_parser_ray.functions.similarity import jaro

    def jw_duck(a: str, b: str) -> float:
        j = jaro(a, b)
        if j <= 0.7:
            return j
        p = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            p += 1
        return j + p * 0.1 * (1.0 - j)

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def partial(t: pa.Table) -> pa.Table:
        names = np.unique(np.asarray(t["p_name"].to_pylist(), dtype=object))
        return pa.table({"p_name": pa.array(list(names), type=pa.string())})

    panel = (
        parts.map_batches(partial, batch_format="pyarrow")
        .groupby("p_name")
        .map_groups(
            lambda g: pd.DataFrame({"p_name": [g["p_name"].iloc[0]]}),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("p_name")
        .reset_index(drop=True)
    )
    bref = ray.put(panel["p_name"].tolist())

    def pairs(t: pa.Table) -> pa.Table:
        all_names = ray.get(bref)
        out_a, out_b, out_jw = [], [], []
        for name in t["p_name"].to_pylist():
            for other in all_names:
                if other > name:
                    jw = jw_duck(name, other)
                    if jw >= 0.85:
                        out_a.append(name)
                        out_b.append(other)
                        out_jw.append(int(np.floor(jw * 1e6 + 1e-7)))
        return pa.table(
            {
                "name_a": pa.array(out_a, type=pa.string()),
                "name_b": pa.array(out_b, type=pa.string()),
                "jw_micro": pa.array(out_jw, type=pa.int64()),
            }
        )

    return ray.data.from_pandas(panel).map_batches(
        pairs, batch_format="pyarrow", batch_size=16
    )


_COOC_TOP = 32


def q_token_cooccurrence(sf_dir: str):
    """Token co-occurrence counts over the top-K vocabulary — corpus
    statistics in two passes, both distributed: (1) global token counts
    via mergeable per-batch partials → top-32 by (count DESC, token)
    (a tiny panel, broadcast via ``ray.put``); (2) per-doc presence of
    vocabulary tokens folded into ONE K×K count matrix per batch
    (``np.add.at`` on triangular indices — the pair axis never touches
    the interpreter), combined in a single-key groupby. At 100 TB the
    shuffle carries blocks × K² partials, never token pairs per doc.
    Output: (tok_a, tok_b, n_docs_both) for pairs co-occurring in ≥ 1
    doc."""
    from collections import Counter

    docs = _docs(sf_dir, ["doc_id", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in df["text"]:
            for w in _WS_ASCII.split(text or ""):
                if w:
                    c[w] += 1
        return pd.DataFrame(
            {"tok": list(c.keys()), "n": np.fromiter(c.values(), dtype=np.int64)}
        )

    # top-K via DISTRIBUTED sort+limit over the (tok, n) panel — the
    # driver receives exactly K rows, never the full vocabulary (at
    # 100 TB distinct tokens are billions; the combine panel shuffles,
    # the driver does not read it)
    top = (
        docs.map_batches(count_partial, batch_format="pandas")
        .groupby("tok")
        .map_groups(
            lambda g: pd.DataFrame(
                {"tok": [g["tok"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .sort(["n", "tok"], descending=[True, False])
        .limit(_COOC_TOP)
        .to_pandas()["tok"]
        .tolist()
    )
    vocab = np.asarray(sorted(top), dtype=object)
    vref = ray.put(vocab)

    def cooc_partial(df: pd.DataFrame) -> pd.DataFrame:
        voc = ray.get(vref)
        k = len(voc)
        M = np.zeros((k, k), dtype=np.int64)
        for text in df["text"]:
            toks = np.unique(
                np.asarray(
                    [w for w in _WS_ASCII.split(text or "") if w], dtype=object
                )
            )
            # exact membership: searchsorted + equality check
            pos = np.searchsorted(voc, toks)
            ok = (pos < k)
            ok[ok] = voc[pos[ok]] == toks[ok]
            idx = np.unique(pos[ok])
            if len(idx) >= 2:
                iu, ju = np.triu_indices(len(idx), k=1)
                np.add.at(M, (idx[iu], idx[ju]), 1)
        ia, ja = np.nonzero(M)
        return pd.DataFrame(
            {
                "tok_a": voc[ia],
                "tok_b": voc[ja],
                "n_docs_both": M[ia, ja],
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("tok_b", as_index=False)["n_docs_both"].sum()
        h.insert(0, "tok_a", g["tok_a"].iloc[0])
        return h.astype({"n_docs_both": np.int64})

    return (
        docs.map_batches(cooc_partial, batch_format="pandas")
        .groupby("tok_a")
        .map_groups(combine, batch_format="pandas")
    )


def q_user_spend_ranks(sf_dir: str):
    """EXACT global rank by total purchase spend — the distributed
    sort-rank primitive: (1) per-user spend panel (hash-bucketed
    single-key combine); (2) deterministic boundary sample (every
    101st user) → range partitions on spend (equal spends can never
    straddle a boundary — the partition function reads spend only);
    (3) per-partition counts → exclusive prefix offsets (one tiny
    driver fold of nparts integers); (4) each partition sorts locally
    and adds its offset. No global sort materialization; the panel
    (one row per user, ≪ events) crosses the exchange twice. SQL twin:
    ROW_NUMBER() OVER (ORDER BY spend, user_id)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def spend_partial(t: pa.Table) -> pa.Table:
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        keep = et == "purchase"
        uid = np.asarray(t["user_id"], dtype=np.int64)[keep]
        cents = _cents(np.asarray(t["value"], dtype=np.float64))[keep]
        uniq, inv = np.unique(uid, return_inverse=True)
        s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(s, inv, cents)
        kb = (splitmix64(uniq.view(np.uint64)) % np.uint64(nparts)).astype(
            np.int64
        )
        return pa.table(
            {
                "kb": pa.array(kb),
                "user_id": pa.array(uniq),
                "part_cents": pa.array(s),
            }
        )

    def spend_combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("user_id", as_index=False)["part_cents"].sum()
        return pd.DataFrame(
            {
                "user_id": h["user_id"].astype(np.int64),
                "spend_cents": h["part_cents"].astype(np.int64),
            }
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "event_type", "value"],
        )
        .map_batches(spend_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kb")
        .map_groups(spend_combine, batch_format="pandas")
        .materialize()
    )

    # deterministic boundary sample: every 101st user's spend
    sample = np.sort(
        np.concatenate(
            [
                np.asarray(b["spend_cents"])[
                    np.asarray(b["user_id"]) % 101 == 0
                ]
                for b in panel.iter_batches(
                    batch_size=1 << 18, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    nb = min(nparts - 1, len(sample))
    bounds = (
        sample[np.linspace(0, len(sample) - 1, nb + 2)[1:-1].astype(int)]
        if nb > 0
        else np.empty(0, np.int64)
    )
    bref = ray.put(np.unique(bounds))

    def add_part(t: pa.Table) -> pa.Table:
        bnds = ray.get(bref)
        p = np.searchsorted(
            bnds, np.asarray(t["spend_cents"], dtype=np.int64), side="right"
        ).astype(np.int64)
        return t.append_column("part", pa.array(p))

    parted = panel.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # exclusive prefix offsets from per-partition counts (nparts ints)
    cnt = np.zeros(len(np.unique(bounds)) + 1, dtype=np.int64)
    for b in parted.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        idx, c = np.unique(np.asarray(b["part"]), return_counts=True)
        cnt[idx] += c
    offsets = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    oref = ray.put(offsets)

    def local_rank(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(oref)
        g = g.sort_values(["spend_cents", "user_id"], kind="stable")
        base = int(offs[int(g["part"].iloc[0])])
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(np.int64),
                "spend_cents": g["spend_cents"].to_numpy(np.int64),
                "spend_rank": base + np.arange(1, len(g) + 1, dtype=np.int64),
            }
        )

    return parted.groupby("part").map_groups(local_rank, batch_format="pandas")


def q_retention_cohorts(sf_dir: str):
    """Cohort retention (the classic training-telemetry analytics
    shape): cohort = a user's first active day; one output row per
    (cohort_day, active_day) with the number of that cohort's users
    active that day. Each user's history must be co-located — the SAME
    single-key user-hash shuffle every per-user op rides; inside a
    bucket the whole computation is vectorized (groupby min for the
    cohort, drop_duplicates for presence), and buckets emit partial
    counts that a tiny single-key combine folds. Days travel as
    '%Y-%m-%d' strings on both engines (no timestamp-dtype kind
    ambiguity)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def tag(t: pa.Table) -> pa.Table:
        u = np.asarray(t["user_id"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(u.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "user_id": pa.array(u),
                "ts": t["ts"],
            }
        )

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(day=g["ts"].dt.strftime("%Y-%m-%d"))
        first = g.groupby("user_id", sort=False)["day"].min()
        act = g[["user_id", "day"]].drop_duplicates()
        act = act.assign(cohort_day=first.loc[act["user_id"]].to_numpy())
        out = (
            act.groupby(["cohort_day", "day"], as_index=False, sort=False)
            .size()
            .rename(columns={"day": "active_day", "size": "n_users"})
        )
        return out.astype({"n_users": np.int64})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("active_day", as_index=False)["n_users"].sum()
        h.insert(0, "cohort_day", g["cohort_day"].iloc[0])
        return h.astype({"n_users": np.int64})

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
        )
        .map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
        .groupby("cohort_day")
        .map_groups(combine, batch_format="pandas")
    )


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit across the snowflake — the
    data-quality ops surface: per FK edge, total child rows and rows
    whose key has no parent. Join strategy picked per edge exactly as
    the scale plan dictates: small parents (customer, nation) broadcast
    as sorted key arrays (``ray.put`` once, searchsorted per batch);
    the fact-fact edge lineitem→orders runs the bucketed reduce-side
    anti-join (one single-key shuffle of two projected key columns).
    Output is a 3-row panel."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def broadcast_orphans(child_path, child_col, parent_path, parent_col):
        keys = np.sort(
            np.unique(
                np.asarray(
                    ray.data.read_parquet(parent_path, columns=[parent_col])
                    .to_pandas()[parent_col]
                    .to_numpy(np.int64)
                )
            )
        )
        kref = ray.put(keys)

        def partial(t: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            v = np.asarray(t[child_col], dtype=np.int64)
            pos = np.clip(np.searchsorted(ks, v), 0, max(0, len(ks) - 1))
            orphan = ks[pos] != v if len(ks) else np.ones(len(v), bool)
            return pa.table(
                {
                    "n_rows": pa.array([len(v)], type=pa.int64()),
                    "n_orphans": pa.array([int(orphan.sum())], type=pa.int64()),
                }
            )

        parts = (
            ray.data.read_parquet(child_path, columns=[child_col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        return int(parts["n_rows"].sum()), int(parts["n_orphans"].sum())

    n_ord, o_ord = broadcast_orphans(
        f"{sf_dir}/orders.parquet", "o_custkey",
        f"{sf_dir}/customer.parquet", "c_custkey",
    )
    n_cust, o_cust = broadcast_orphans(
        f"{sf_dir}/customer.parquet", "c_nationkey",
        f"{sf_dir}/nation.parquet", "n_nationkey",
    )

    # fact-fact edge: bucketed anti-join, keys only
    def tag_parent(t: pa.Table) -> pa.Table:
        k = np.unique(np.asarray(t["o_orderkey"], dtype=np.int64))
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(k),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            }
        )

    def tag_child(t: pa.Table) -> pa.Table:
        k = np.asarray(t["l_orderkey"], dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "key": pa.array(k),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    def bucket_anti(g: pd.DataFrame) -> pd.DataFrame:
        parents = np.sort(g.loc[g["side"] == 0, "key"].to_numpy(np.int64))
        child = g.loc[g["side"] == 1, "key"].to_numpy(np.int64)
        if len(parents):
            pos = np.clip(np.searchsorted(parents, child), 0, len(parents) - 1)
            orphan = parents[pos] != child
        else:
            orphan = np.ones(len(child), dtype=bool)
        return pd.DataFrame(
            {"n_rows": [len(child)], "n_orphans": [int(orphan.sum())]}
        )

    li = (
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .map_batches(tag_parent, batch_format="pyarrow")
        .union(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"]
            ).map_batches(tag_child, batch_format="pyarrow")
        )
        .groupby("bucket")
        .map_groups(bucket_anti, batch_format="pandas")
        .to_pandas()
    )
    n_li, o_li = int(li["n_rows"].sum()), int(li["n_orphans"].sum())

    return pd.DataFrame(
        {
            "relation": [
                "customer.c_nationkey->nation",
                "lineitem.l_orderkey->orders",
                "orders.o_custkey->customer",
            ],
            "n_rows": np.asarray([n_cust, n_li, n_ord], dtype=np.int64),
            "n_orphans": np.asarray([o_cust, o_li, o_ord], dtype=np.int64),
        }
    )


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_DIGITS = r"\d{9,}"


def q_pii_scrub(sf_dir: str):
    """PII detection + redaction — the scrub pass a training-data
    pipeline runs before anything leaves the corpus: find emails and
    long (≥9-digit) identifier runs, count them per doc, and emit the
    ``_text_60bit`` content hash of the REDACTED text so downstream
    exactness checks never touch the raw PII. The shipped corpus
    contains no natural PII, so both sides append a deterministic
    contact line derived from (source, doc_id) — the mechanics under
    test are the detect/redact kernels, not the synthesis. Redaction
    order matters and is pinned: emails first (they contain digits),
    then digit runs.

    Everything is RE2 on BOTH sides — pyarrow.compute's regex kernels
    and DuckDB's regexp_* are the same engine, so ``\\d`` / class
    semantics match exactly (the same discipline as the BPE tokenizer's
    re.ASCII). Vectorized end-to-end, including the content hash (the
    strh60 twin; the retired form was a per-row md5 loop)."""

    def scrub(t: pa.Table) -> pa.Table:
        base = pc.coalesce(t["text"], pa.scalar("", type=pa.string()))
        s = pc.binary_join_element_wise(
            base,
            " contact: ",
            t["source"],
            ".",
            pc.cast(t["doc_id"], pa.string()),
            "@example.com id=",
            pc.cast(pc.add(t["doc_id"], 1000000000), pa.string()),
            "",
        )
        n_emails = pc.cast(pc.count_substring_regex(s, _PII_EMAIL), pa.int64())
        s1 = pc.replace_substring_regex(s, _PII_EMAIL, "<EMAIL>")
        n_digits = pc.cast(pc.count_substring_regex(s1, _PII_DIGITS), pa.int64())
        s2 = pc.replace_substring_regex(s1, _PII_DIGITS, "<ID>")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_emails": n_emails,
                "n_long_digits": n_digits,
                "clean_h60": pa.array(_text_60bit(s2)),
            }
        )

    return _docs(sf_dir, columns=["doc_id", "text", "source"]).map_batches(
        scrub, batch_format="pyarrow", zero_copy_batch=True
    )


# ---------------------------------------------------------------------------
# Classic entity-resolution primitives: sorted-neighborhood blocking,
# meta-blocking, Fellegi-Sunter EM, blocking-quality metrics
# ---------------------------------------------------------------------------


def q_sorted_neighborhood(sf_dir: str):
    """Sorted-neighborhood blocking (SNM, Hernandez & Stolfo): records
    sort by a blocking key and every pair within a sliding window of
    w=3 becomes a candidate. Distributed in two shuffle-light passes:
    (1) the exact-global-rank primitive (range partitions from a
    deterministic boundary sample + per-partition count offsets — the
    same machinery as ``q_user_spend_ranks``; the panel never passes
    through the driver); (2) rank-bucketed pair emission — bucket b
    owns ranks [bB, (b+1)B) and the first w-1 rows of every bucket
    replicate into the previous bucket, so each window pair co-locates
    exactly once and pair emission is a vectorized shift per distance.
    Key: (bal_cents, c_custkey). SQL twin: ROW_NUMBER self-join on rank
    distance 1..w-1. Reference anchor: the sorted candidate sweep in
    ``fuzz/inexus_parser.py`` (longest-alias-first ordered scan)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    W = 3
    B = 1024  # rank bucket width; pairs per bucket ~ B * (W-1)
    nparts = default_num_partitions()

    def key_partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": t["c_custkey"],
                "bal_cents": pa.array(
                    _cents(np.asarray(t["c_acctbal"], dtype=np.float64))
                ),
            }
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"]
        )
        .map_batches(key_partial, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )

    # deterministic boundary sample (every 101st custkey's key value)
    sample = np.sort(
        np.concatenate(
            [
                np.asarray(b["bal_cents"])[np.asarray(b["c_custkey"]) % 101 == 0]
                for b in panel.iter_batches(
                    batch_size=1 << 18, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    nb = min(nparts - 1, len(sample))
    bounds = (
        np.unique(
            sample[np.linspace(0, len(sample) - 1, nb + 2)[1:-1].astype(int)]
        )
        if nb > 0
        else np.empty(0, np.int64)
    )
    bref = ray.put(bounds)

    def add_part(t: pa.Table) -> pa.Table:
        bnds = ray.get(bref)
        p = np.searchsorted(
            bnds, np.asarray(t["bal_cents"], dtype=np.int64), side="right"
        ).astype(np.int64)
        return t.append_column("part", pa.array(p))

    parted = panel.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    cnt = np.zeros(len(bounds) + 1, dtype=np.int64)
    for b in parted.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        idx, c = np.unique(np.asarray(b["part"]), return_counts=True)
        cnt[idx] += c
    offsets = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    oref = ray.put(offsets)

    def local_rank(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(oref)
        g = g.sort_values(["bal_cents", "c_custkey"], kind="stable")
        base = int(offs[int(g["part"].iloc[0])])
        return pd.DataFrame(
            {
                "c_custkey": g["c_custkey"].to_numpy(np.int64),
                "rank0": base + np.arange(len(g), dtype=np.int64),
            }
        )

    ranked = parted.groupby("part").map_groups(
        local_rank, batch_format="pandas"
    )

    def to_buckets(t: pa.Table) -> pa.Table:
        r = np.asarray(t["rank0"], dtype=np.int64)
        k = np.asarray(t["c_custkey"], dtype=np.int64)
        bkt = r // B
        # replicate the first W-1 ranks of each bucket into the previous
        # bucket so boundary-straddling window pairs co-locate
        rep = (r % B < W - 1) & (bkt > 0)
        return pa.table(
            {
                "bkt": pa.array(np.concatenate([bkt, bkt[rep] - 1])),
                "rank0": pa.array(np.concatenate([r, r[rep]])),
                "key": pa.array(np.concatenate([k, k[rep]])),
            }
        )

    def window_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rank0", kind="stable")
        r = g["rank0"].to_numpy(np.int64)
        k = g["key"].to_numpy(np.int64)
        own_hi = (int(g["bkt"].iloc[0]) + 1) * B  # left end must be owned
        out_a, out_b, out_d = [], [], []
        for d in range(1, W):
            if len(r) <= d:
                break
            left = np.arange(len(r) - d)
            ok = (r[left] + d == r[left + d]) & (r[left] < own_hi)
            out_a.append(k[left[ok]])
            out_b.append(k[left[ok] + d])
            out_d.append(np.full(int(ok.sum()), d, dtype=np.int64))
        if not out_a:
            return pd.DataFrame(
                {
                    "key_a": pd.Series([], dtype=np.int64),
                    "key_b": pd.Series([], dtype=np.int64),
                    "dist": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "key_a": np.concatenate(out_a),
                "key_b": np.concatenate(out_b),
                "dist": np.concatenate(out_d),
            }
        )

    return (
        ranked.map_batches(
            to_buckets, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("bkt")
        .map_groups(window_pairs, batch_format="pandas")
    )


def q_meta_blocking(sf_dir: str):
    """Meta-blocking with the CBS (common-block scheme) weight: token
    blocking over whitespace tokens, blocks outside [2, 64] docs
    dropped (oversized blocks are stop-word noise AND the quadratic
    hazard), then every in-block pair weighted by HOW MANY blocks it
    shares; pairs with CBS < 2 pruned. Distributed: (tok, doc_id)
    postings shuffle ONCE by token hash bucket; per-bucket pair
    emission is a run-length triu vectorized per block SIZE (no
    per-token Python); pair counts combine in a pair-hash-bucketed
    single-key pass (the composite-groupby trap avoided). At 100 TB
    the [2,64] df gate bounds per-block work and the CBS>=2 filter
    bounds the output. Papadakis et al.'s meta-blocking, re-expressed
    Ray-Data-first."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    DF_MIN, DF_MAX, CBS_MIN = 2, 64, 2
    nparts = default_num_partitions()

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        toks: list = []
        dids: list = []
        for did, text in zip(df["doc_id"], df["text"]):
            arr = _WS_ASCII.split(text or "")
            # blocking key = token BIGRAM (unigrams on web-scale text are
            # stop-word blocks: every one blows the df gate); pairs with
            # an empty member are skipped positionally, exactly like the
            # SQL twin's arr[i] != '' AND arr[i+1] != ''
            ts = {
                arr[i] + " " + arr[i + 1]
                for i in range(len(arr) - 1)
                if arr[i] and arr[i + 1]
            }
            toks.extend(ts)
            dids.extend([did] * len(ts))
        out = pd.DataFrame(
            {"tok": pd.Series(toks, dtype=object), "doc_id": dids}
        )
        # deterministic token hash — Python's hash() is per-process
        # randomized and would split one token across buckets
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        t.encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for t in out["tok"]
            ),
            dtype=np.uint64,
            count=len(out),
        )
        out["tb"] = (splitmix64(h) % np.uint64(nparts)).astype(np.int64)
        return out

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["tok", "doc_id"], kind="stable")
        toks = df["tok"].to_numpy(object)
        ids = df["doc_id"].to_numpy(np.int64)
        new = np.concatenate([[True], toks[1:] != toks[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(toks)))
        out_a: list = []
        out_b: list = []
        for s in np.unique(lens):
            if s < DF_MIN or s > DF_MAX:
                continue
            sel = starts[lens == s]
            block = ids[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block[:, iu].ravel())
            out_b.append(block[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                    "w": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # partial combine inside the bucket before the pair shuffle
        pk = pd.DataFrame({"doc_a": a, "doc_b": b})
        h = pk.groupby(["doc_a", "doc_b"], sort=False).size().reset_index()
        h.columns = ["doc_a", "doc_b", "w"]
        return h.astype({"w": np.int64})

    def add_pb(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"], dtype=np.int64).astype(np.uint64)
        b = np.asarray(t["doc_b"], dtype=np.int64).astype(np.uint64)
        pb = (
            splitmix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
            % np.uint64(nparts)
        ).astype(np.int64)
        return t.append_column("pb", pa.array(pb))

    def combine_pairs(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(["doc_a", "doc_b"], sort=False, as_index=False)["w"].sum()
        h = h[h["w"] >= CBS_MIN]
        return pd.DataFrame(
            {
                "doc_a": h["doc_a"].to_numpy(np.int64),
                "doc_b": h["doc_b"].to_numpy(np.int64),
                "cbs": h["w"].to_numpy(np.int64),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(tok_partial, batch_format="pandas")
        .groupby("tb")
        .map_groups(pairs_bucket, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(combine_pairs, batch_format="pandas")
        .materialize()
    )
    if out.count() == 0:
        # all groups empty → Ray loses the schema entirely; pin it
        return pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("cbs", pa.int64()),
            ]
        ).empty_table()
    return out


# Fellegi-Sunter parameters: ALL exact binary doubles so the Ray and
# DuckDB sides compute bit-identical E-step weights from any engine.
_FS_P0 = 0.125
_FS_M0 = (0.9375, 0.9375, 0.9375)
_FS_U0 = (0.25, 0.0625, 0.5)
_FS_FIELDS = ("mktsegment", "nationkey", "acctbal")
_FS_Q = 1 << 20  # E-step weight fixed-point quantum
_FS_EPS = 2.0**-20  # parameter clamp (exact binary double)
_FS_ONE_MINUS_EPS = 1.0 - 2.0**-20  # exact: 0.99999904632568359375


def _fs_combo_counts(sf_dir: str) -> np.ndarray:
    """The ONE distributed pass of Fellegi-Sunter over binary
    comparison vectors: pairs = (c_custkey 2i, 2i+1), fields g1 = same
    mktsegment, g2 = same nationkey, g3 = |Δ bal_cents| < 50000. The
    8-combo histogram is a sufficient statistic for EVERY EM iteration
    — pairs co-locate via one pair-id hash-bucket shuffle, each bucket
    folds its combos vectorized, and the driver sees only 8 integers
    per bucket. At 100 TB the EM loop itself therefore costs nothing
    beyond this single pass."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def part_emit(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["c_custkey"], dtype=np.int64)
        pid = ck // 2
        pb = (splitmix64(pid.astype(np.uint64)) % np.uint64(nparts)).astype(
            np.int64
        )
        return pa.table(
            {
                "pb": pa.array(pb),
                "pair_id": pa.array(pid),
                "c_custkey": t["c_custkey"],
                "seg": t["c_mktsegment"],
                "nat": t["c_nationkey"],
                "bal_cents": pa.array(
                    _cents(np.asarray(t["c_acctbal"], dtype=np.float64))
                ),
            }
        )

    def combos(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["pair_id", "c_custkey"], kind="stable")
        pid = df["pair_id"].to_numpy(np.int64)
        i = np.flatnonzero(pid[:-1] == pid[1:])
        seg = df["seg"].to_numpy(object)
        nat = df["nat"].to_numpy(np.int64)
        bal = df["bal_cents"].to_numpy(np.int64)
        g1 = seg[i] == seg[i + 1]
        g2 = nat[i] == nat[i + 1]
        g3 = np.abs(bal[i] - bal[i + 1]) < 50000
        combo = g1 * 4 + g2 * 2 + g3 * 1
        n = np.bincount(combo.astype(np.int64), minlength=8)
        return pd.DataFrame(
            {"combo": np.arange(8, dtype=np.int64), "n": n.astype(np.int64)}
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"],
        )
        .map_batches(part_emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(combos, batch_format="pandas")
        .to_pandas()
    )
    counts = np.zeros(8, dtype=np.int64)
    agg = panel.groupby("combo")["n"].sum()
    counts[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    return counts


def _fs_em_step(counts: np.ndarray, p, m, u):
    """One EM iteration over the combo histogram, E-step weights
    quantized to 1/2^20 so integer sums make every iteration
    bit-deterministic (the SQL twin mirrors the same arithmetic)."""
    import math

    S = T = 0
    Sk = [0, 0, 0]
    Tk = [0, 0, 0]
    N = 0
    for c in range(8):
        n = int(counts[c])
        bits = ((c >> 2) & 1, (c >> 1) & 1, c & 1)
        a = p
        b = 1.0 - p
        for k in range(3):
            a = a * (m[k] if bits[k] else 1.0 - m[k])
            b = b * (u[k] if bits[k] else 1.0 - u[k])
        w = a / (a + b)
        wfix = int(math.floor(w * _FS_Q + 0.5 + 1e-9))
        S += n * wfix
        T += n * (_FS_Q - wfix)
        N += n
        for k in range(3):
            if bits[k]:
                Sk[k] += n * wfix
                Tk[k] += n * (_FS_Q - wfix)
    # clamp away from {0, 1} (exact binary 2^-20 bounds, mirrored
    # literal-for-literal in the SQL twin): perfectly-separated data
    # otherwise drives m -> 1 / u -> 0 exactly and zeroes BOTH mixture
    # likelihoods for mixed combos on the next E-step
    eps = _FS_EPS
    hi = _FS_ONE_MINUS_EPS

    def cl(num: int, den: int) -> float:
        return min(max(num / den if den > 0 else eps, eps), hi)

    new_m = tuple(cl(Sk[k], S) for k in range(3))
    new_u = tuple(cl(Tk[k], T) for k in range(3))
    new_p = cl(S, N * _FS_Q)
    return new_p, new_m, new_u


def _fs_result_table(p, m, u) -> pa.Table:
    import math

    def micro(x: float) -> int:
        return int(math.floor(1000000.0 * x + 1e-7))

    return pa.table(
        {
            "field": pa.array(list(_FS_FIELDS), type=pa.string()),
            "m_micro": pa.array([micro(x) for x in m], type=pa.int64()),
            "u_micro": pa.array([micro(x) for x in u], type=pa.int64()),
            "p_micro": pa.array([micro(p)] * 3, type=pa.int64()),
        }
    )


def q_fs_em_update(sf_dir: str):
    """ONE Fellegi-Sunter EM iteration (probabilistic record linkage,
    the Splink/Dedupe model) with a FULL SQL oracle: m/u/λ updates from
    binary comparison vectors over deterministic (2i, 2i+1) customer
    pairs. All start parameters are exact binary doubles and E-step
    weights quantize to 1/2^20 fixed point, so both engines fold the
    SAME integers — the oracle recomputes the update scalar-for-scalar.
    The distributed part is the one combo-histogram pass
    (``_fs_combo_counts``); the update itself reads 8 integers."""
    counts = _fs_combo_counts(sf_dir)
    p, m, u = _fs_em_step(counts, _FS_P0, list(_FS_M0), list(_FS_U0))
    return _fs_result_table(p, m, u)


_FS_ITERS = 20


def q_fellegi_sunter_em(sf_dir: str):
    """Fellegi-Sunter EM to convergence (20 fixed-point iterations) —
    the full iterative-training loop, oracle-checked END-TO-END via a
    recursive CTE that carries (p, m, u) through the same quantized
    update. The combo histogram from the single distributed pass is a
    sufficient statistic, so iterations are free at any corpus size."""
    counts = _fs_combo_counts(sf_dir)
    p, m, u = _FS_P0, list(_FS_M0), list(_FS_U0)
    for _ in range(_FS_ITERS):
        p, m, u = _fs_em_step(counts, p, m, u)
    return _fs_result_table(p, m, u)


def q_cluster_size_histogram(sf_dir: str):
    """Cluster-size distribution of the SQL-checkable MinHash-LSH
    clustering — THE skew diagnostic for a dedup run (a heavy tail
    here is exactly what the flagship's salting/caps exist for).
    Log2-bucketed: (log2_size, n_clusters, n_docs). Rides the full
    ``q_minhash_cluster_ids`` path, so the whole chain shingle →
    MinHash → bands → transitive closure → histogram is oracle-checked
    end-to-end."""

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def to_cluster(t: pa.Table) -> pa.Table:
        # a cluster spans batches (one row per doc): bucket by cluster
        # id so the distinct happens once per cluster, not per batch
        cid = np.asarray(t["cluster_id"], dtype=np.int64)
        cb = (
            splitmix64(cid.astype(np.uint64)) % np.uint64(nparts)
        ).astype(np.int64)
        return pa.table(
            {
                "cb": pa.array(cb),
                "cluster_id": pa.array(cid),
                "cluster_size": t["cluster_size"],
            }
        )

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        one = g.drop_duplicates("cluster_id")
        sz = one["cluster_size"].to_numpy(np.int64)
        b = np.floor(np.log2(sz)).astype(np.int64)
        out = pd.DataFrame({"log2_size": b, "size": sz})
        h = out.groupby("log2_size", as_index=False).agg(
            part_clusters=("size", "count"), part_docs=("size", "sum")
        )
        return h.astype({"part_clusters": np.int64, "part_docs": np.int64})

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "log2_size": [np.int64(g["log2_size"].iloc[0])],
                "n_clusters": [np.int64(g["part_clusters"].sum())],
                "n_docs": [np.int64(g["part_docs"].sum())],
            }
        )

    return (
        q_minhash_cluster_ids(sf_dir)
        .map_batches(to_cluster, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cb")
        .map_groups(hist, batch_format="pandas")
        .groupby("log2_size")
        .map_groups(combine, batch_format="pandas")
    )


def q_window_dedup_stats(sf_dir: str):
    """Streaming-shaped dedup: events dedup WITHIN 1-hour tumbling
    windows by (user_id, event_type, value-cents) — the
    at-least-once-ingest cleanup every event pipeline runs. Key insight
    for scale: bucket on the FULL dedup key hash, so each distinct key
    lives in exactly one bucket and per-bucket unique counts sum
    exactly — one single-key shuffle, no count-distinct exchange.
    Output per window: (window_start_hour, n_events, n_unique,
    n_dupes)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit(t: pa.Table) -> pa.Table:
        ts = np.asarray(t["ts"]).astype("datetime64[us]").astype(np.int64)
        w = ts // 3_600_000_000
        uid = np.asarray(t["user_id"], dtype=np.int64)
        cents = _cents(np.asarray(t["value"], dtype=np.float64))
        import hashlib

        et = t["event_type"]
        eth = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        (x or "").encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for x in et.to_pylist()
            ),
            dtype=np.uint64,
            count=t.num_rows,
        )
        key = (
            splitmix64(w.astype(np.uint64))
            ^ splitmix64(uid.astype(np.uint64))
            ^ splitmix64(cents.astype(np.uint64))
            ^ eth
        )
        kb = (splitmix64(key) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "kb": pa.array(kb),
                "w": pa.array(w),
                "user_id": pa.array(uid),
                "event_type": et,
                "cents": pa.array(cents),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(
            ["w", "user_id", "event_type", "cents"], sort=False, as_index=False
        ).size()
        out = h.groupby("w", sort=False, as_index=False).agg(
            part_events=("size", "sum"), part_unique=("size", "count")
        )
        return out.astype(
            {"part_events": np.int64, "part_unique": np.int64}
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        ne = int(g["part_events"].sum())
        nu = int(g["part_unique"].sum())
        return pd.DataFrame(
            {
                "window_hour": [np.int64(g["w"].iloc[0])],
                "n_events": [np.int64(ne)],
                "n_unique": [np.int64(nu)],
                "n_dupes": [np.int64(ne - nu)],
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["ts", "user_id", "event_type", "value"],
        )
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kb")
        .map_groups(per_bucket, batch_format="pandas")
        .groupby("w")
        .map_groups(combine, batch_format="pandas")
    )


_ER_NEG_SHIFT = 37  # negative-pair partner offset (invertible: j = i+37 mod n)


def q_er_training_pairs(sf_dir: str):
    """Training-set construction for a learned linkage model: positive
    pairs = the deterministic (2i, 2i+1) twins, negative pairs = each
    record paired with the one +37 (mod n) away — an INVERTIBLE offset,
    so every row knows both pairs it belongs to and emits itself under
    each pair key locally (no driver-side pair list, no inverse-hash
    lookup). One pair-key-bucketed shuffle co-locates both members;
    each bucket assembles comparison vectors (g1 = same mktsegment,
    g2 = same nationkey, g3 = |Δ bal_cents| < 50000) vectorized.
    Output: (pair_type, key_a, key_b, g1, g2, g3) — the labeled
    comparison-vector table a Fellegi-Sunter / logistic trainer
    consumes. Assumes contiguous 0..n-1 custkeys (the fixture
    contract; asserted by the count)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    n = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()

    def emit(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["c_custkey"], dtype=np.int64)
        seg = t["c_mktsegment"]
        nat = np.asarray(t["c_nationkey"], dtype=np.int64)
        bal = _cents(np.asarray(t["c_acctbal"], dtype=np.float64))
        # each row belongs to: its positive pair, the negative pair it
        # LEADS (i, i+37 mod n) and the one it TRAILS (i-37 mod n, i)
        pos_key = ck // 2 * 2 + 0  # even sentinel space: 2*pid
        neg_lead = 2 * (ck % n) + 1  # odd space keyed by the leader id
        neg_trail = 2 * ((ck - _ER_NEG_SHIFT) % n) + 1
        keys = np.concatenate([pos_key, neg_lead, neg_trail])
        rows = np.concatenate([np.arange(len(ck))] * 3)
        roles = np.concatenate(
            [
                (ck % 2).astype(np.int64),  # positive: even row = a
                np.zeros(len(ck), dtype=np.int64),  # leader = a
                np.ones(len(ck), dtype=np.int64),  # trailer = b
            ]
        )
        pb = (
            splitmix64(keys.astype(np.uint64)) % np.uint64(nparts)
        ).astype(np.int64)
        return pa.table(
            {
                "pb": pa.array(pb),
                "pkey": pa.array(keys),
                "role": pa.array(roles),
                "c_custkey": pa.array(ck.take(rows)),
                "seg": seg.take(pa.array(rows)),
                "nat": pa.array(nat.take(rows)),
                "bal_cents": pa.array(bal.take(rows)),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["pkey", "role", "c_custkey"], kind="stable")
        pk = df["pkey"].to_numpy(np.int64)
        role = df["role"].to_numpy(np.int64)
        i = np.flatnonzero(
            (pk[:-1] == pk[1:]) & (role[:-1] == 0) & (role[1:] == 1)
        )
        ck = df["c_custkey"].to_numpy(np.int64)
        seg = df["seg"].to_numpy(object)
        nat = df["nat"].to_numpy(np.int64)
        bal = df["bal_cents"].to_numpy(np.int64)
        a, b = ck[i], ck[i + 1]
        keep = a != b  # degenerate negatives when n <= 37
        i = i[keep]
        a, b = a[keep], b[keep]
        return pd.DataFrame(
            {
                "pair_type": np.where(pk[i] % 2 == 0, "pos", "neg"),
                "key_a": a,
                "key_b": b,
                "g1": (seg[i] == seg[i + 1]).astype(np.int64),
                "g2": (nat[i] == nat[i + 1]).astype(np.int64),
                "g3": (np.abs(bal[i] - bal[i + 1]) < 50000).astype(
                    np.int64
                ),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"],
        )
        .map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(assemble, batch_format="pandas")
    )


_LINREG_W0 = (1, 2, 3, 4)  # initial weights, in 2^10 fixed-point units
_LINREG_S = 1 << 20  # label scale


def q_linreg_grad_step(sf_dir: str):
    """Distributed full-batch gradient step for a linear quality model
    (squared loss): features x = (1, n_tokens, punct_chars, n_chars)
    per doc (all INTEGER — the same counters as ``quality_flags``),
    label y = [lang = 'en'] scaled by 2^20, weights in 2^10 fixed
    point. The gradient g_j = Σ_i x_ij · r_i with residual
    r_i = Σ_k x_ik w_k − y_i·S is ALL integer arithmetic, so partial
    per-batch sums combine order-free and the SQL twin is hash-exact —
    the canonical data-parallel SGD shape (compute ∥ combine) with
    none of the float-summation drift. Output: one row per feature
    (feature, grad, w_next = w·2^10 − g)."""
    docs = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        n_tok = ws_token_count_series(df["text"]).to_numpy(np.int64)
        punct = (
            df["text"].fillna("").str.count(r"[.,;:!?]").to_numpy(np.int64)
        )
        nch = df["n_chars"].to_numpy(np.int64)
        ones = np.ones(len(df), dtype=np.int64)
        X = np.stack([ones, n_tok, punct, nch], axis=1)
        y = (df["lang"] == "en").to_numpy().astype(np.int64) * _LINREG_S
        w = np.asarray(_LINREG_W0, dtype=np.int64) * (1 << 10)
        r = X @ w - y
        g = X.T @ r
        return pd.DataFrame(
            {
                "feature": ["bias", "n_tokens", "punct_chars", "n_chars"],
                "part_g": g.astype(np.int64),
            }
        )

    panel = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("feature")
        .map_groups(
            lambda grp: pd.DataFrame(
                {
                    "feature": [grp["feature"].iloc[0]],
                    "grad": [np.int64(grp["part_g"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("feature")
        .reset_index(drop=True)
    )
    w_by = dict(
        zip(
            ["bias", "n_tokens", "punct_chars", "n_chars"],
            [w * (1 << 10) for w in _LINREG_W0],
        )
    )
    panel["w_next"] = np.asarray(
        [w_by[f] for f in panel["feature"]], dtype=np.int64
    ) - panel["grad"].to_numpy(np.int64)
    return pa.Table.from_pandas(panel, preserve_index=False)


def q_token_set_pairs(sf_dir: str):
    """Token-SET similarity self-join (the third similarity the
    north-star names beside Jaccard and Jaro-Winkler): distinct part
    names block on shared tokens (postings groupby — the meta_blocking
    shape), pairs sharing >= 1 token score Dice = 2|A∩B| / (|A|+|B|)
    in pure-integer micro units (2·ni·10^6 // (na+nb) — floor division,
    hash-exact in SQL). Names tokenize on single spaces (the TPC-H
    separator) into distinct token sets. Shuffle carries (token, name)
    postings once; intersection counts combine per pair-hash bucket."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def postings(t: pa.Table) -> pa.Table:
        import hashlib

        names: list = []
        toks: list = []
        counts: list = []
        seen = set()
        for nm in t["p_name"].to_pylist():
            if nm in seen:
                continue
            seen.add(nm)
            ts = sorted({w for w in (nm or "").split(" ") if w})
            names.extend([nm] * len(ts))
            toks.extend(ts)
            counts.extend([len(ts)] * len(ts))
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        x.encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for x in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        return pa.table(
            {
                "tb": pa.array(
                    (splitmix64(h) % np.uint64(nparts)).astype(np.int64)
                ),
                "tok": pa.array(toks, type=pa.string()),
                "name": pa.array(names, type=pa.string()),
                "ntok": pa.array(np.asarray(counts, dtype=np.int64)),
            }
        )

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (tok, name) within the bucket: a name seen in several
        # batches re-emits its postings — dedup before pairing
        df = g.drop_duplicates(["tok", "name"]).sort_values(
            ["tok", "name"], kind="stable"
        )
        toks = df["tok"].to_numpy(object)
        names = df["name"].to_numpy(object)
        ntok = df["ntok"].to_numpy(np.int64)
        new = np.concatenate([[True], toks[1:] != toks[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(toks)))
        out_a: list = []
        out_b: list = []
        out_na: list = []
        out_nb: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block_n = names[sel[:, None] + np.arange(s)[None, :]]
            block_k = ntok[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block_n[:, iu].ravel())
            out_b.append(block_n[:, ju].ravel())
            out_na.append(block_k[:, iu].ravel())
            out_nb.append(block_k[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "name_a": pd.Series([], dtype=object),
                    "name_b": pd.Series([], dtype=object),
                    "na": pd.Series([], dtype=np.int64),
                    "nb": pd.Series([], dtype=np.int64),
                    "ni": pd.Series([], dtype=np.int64),
                }
            )
        pk = pd.DataFrame(
            {
                "name_a": np.concatenate(out_a),
                "name_b": np.concatenate(out_b),
                "na": np.concatenate(out_na),
                "nb": np.concatenate(out_nb),
            }
        )
        h = pk.groupby(["name_a", "name_b"], sort=False, as_index=False).agg(
            na=("na", "first"), nb=("nb", "first"), ni=("na", "size")
        )
        return h.astype({"na": np.int64, "nb": np.int64, "ni": np.int64})

    def add_pb(t: pa.Table) -> pa.Table:
        import hashlib

        ab = [
            a + "\x00" + b
            for a, b in zip(
                t["name_a"].to_pylist(), t["name_b"].to_pylist()
            )
        ]
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        x.encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for x in ab
            ),
            dtype=np.uint64,
            count=len(ab),
        )
        return t.append_column(
            "pb",
            pa.array((splitmix64(h) % np.uint64(nparts)).astype(np.int64)),
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby(["name_a", "name_b"], sort=False, as_index=False).agg(
            na=("na", "first"), nb=("nb", "first"), ni=("ni", "sum")
        )
        h = h[h["ni"] >= 1]
        ni = h["ni"].to_numpy(np.int64)
        den = h["na"].to_numpy(np.int64) + h["nb"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "name_a": h["name_a"].to_numpy(object),
                "name_b": h["name_b"].to_numpy(object),
                "n_shared": ni,
                "dice_micro": 2 * ni * 1_000_000 // den,
            }
        )

    out = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])
        .map_batches(postings, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(pairs_bucket, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(combine, batch_format="pandas")
        .materialize()
    )
    if out.count() == 0:
        return pa.schema(
            [
                ("name_a", pa.string()),
                ("name_b", pa.string()),
                ("n_shared", pa.int64()),
                ("dice_micro", pa.int64()),
            ]
        ).empty_table()
    return out


def q_dsir_weights(sf_dir: str):
    """DSIR-style importance weights for data selection (Xie et al.
    2023): every document scores under TWO bigram models — a target LM
    (here: the lang='en' slice) and the raw-corpus LM — and the
    importance weight is the score difference; resampling by this
    weight tilts a raw corpus toward the target distribution. Both
    models train distributed (per-batch bigram partials → single-key
    combine), broadcast once via ``ray.put``, and one scoring pass
    hash-joins each batch's flattened bigram stream against both (the
    ``bigram_lm_scores`` machinery, twice). Scores are PURE INTEGER
    fixed-point conditional probabilities (c·10^6 // prefix — no libm
    logs to drift), so the whole operator is hash-exact in SQL; bigrams
    unseen in the target model contribute 0. At 100 TB the models prune
    to top-K bigrams before broadcast; here they stay exact for the
    oracle."""
    docs = _docs(sf_dir, ["doc_id", "text", "lang"])

    def partial_all(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for text in df["text"]:
            toks = [w.lower() for w in _ws_tokens(text) if w]
            c.update(zip(toks, toks[1:]))
        return pd.DataFrame(
            {
                "w1": [k[0] for k in c],
                "w2": [k[1] for k in c],
                "part_n": np.fromiter(
                    c.values(), dtype=np.int64, count=len(c)
                ),
            }
        )

    def partial_target(df: pd.DataFrame) -> pd.DataFrame:
        return partial_all(df[df["lang"] == "en"])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["w1", "w2"], sort=False, as_index=False)[
            "part_n"
        ].sum()
        out["c_prefix"] = out.groupby("w1", sort=False)["part_n"].transform(
            "sum"
        )
        return out.rename(columns={"part_n": "c_bg"})

    def train(partial_fn) -> pd.DataFrame:
        m = (
            docs.map_batches(partial_fn, batch_format="pandas")
            .groupby("w1")
            .map_groups(combine, batch_format="pandas")
            .to_pandas()
        )
        if len(m) == 0:
            return pd.DataFrame(
                {
                    "w1": pd.Series([], dtype=object),
                    "w2": pd.Series([], dtype=object),
                    "score": pd.Series([], dtype=np.int64),
                }
            )
        m["score"] = m["c_bg"].to_numpy(np.int64) * 1_000_000 // m[
            "c_prefix"
        ].to_numpy(np.int64)
        return m[["w1", "w2", "score"]]

    t_ref = ray.put(train(partial_target))
    r_ref = ray.put(train(partial_all))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        mt = ray.get(t_ref)
        mr = ray.get(r_ref)
        ids, w1s, w2s, nbg = [], [], [], []
        for d, text in zip(df["doc_id"], df["text"]):
            toks = [w.lower() for w in _ws_tokens(text) if w]
            ids += [d] * max(0, len(toks) - 1)
            w1s += toks[:-1]
            w2s += toks[1:]
            nbg.append(max(0, len(toks) - 1))
        flat = pd.DataFrame(
            {"doc_id": np.asarray(ids, dtype=np.int64), "w1": w1s, "w2": w2s}
        )
        jt = flat.merge(mt, on=["w1", "w2"], how="left")
        jr = flat.merge(mr, on=["w1", "w2"], how="left")
        ts = jt.groupby("doc_id", sort=False)["score"].sum()
        rs = jr.groupby("doc_id", sort=False)["score"].sum()
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_bigrams": np.asarray(nbg, dtype=np.int64),
            }
        )
        out["target_score"] = (
            out["doc_id"].map(ts).fillna(0).astype(np.int64)
        )
        out["raw_score"] = out["doc_id"].map(rs).fillna(0).astype(np.int64)
        out["dsir_weight"] = out["target_score"] - out["raw_score"]
        return out

    return docs.map_batches(score, batch_format="pandas")


def q_fs_classify(sf_dir: str):
    """Fellegi-Sunter DECISION step: the converged EM parameters score
    every pair's posterior match probability and pairs with w >= 1/2
    classify as matches — the apply-the-model half of probabilistic
    record linkage. Distributed: the combo histogram fits the model
    (one pass), then a second pass re-emits each pair's combo and maps
    it through the 8-entry combo → (w_fix, is_match) table (broadcast;
    the posterior depends only on the binary comparison vector). All
    outputs integer (1/2^20 fixed point) → bit-exact SQL twin."""
    counts = _fs_combo_counts(sf_dir)
    p, m, u = _FS_P0, list(_FS_M0), list(_FS_U0)
    for _ in range(_FS_ITERS):
        p, m, u = _fs_em_step(counts, p, m, u)

    import math

    wfix_by_combo = np.empty(8, dtype=np.int64)
    for c in range(8):
        bits = ((c >> 2) & 1, (c >> 1) & 1, c & 1)
        a = p
        b = 1.0 - p
        for k in range(3):
            a = a * (m[k] if bits[k] else 1.0 - m[k])
            b = b * (u[k] if bits[k] else 1.0 - u[k])
        wfix_by_combo[c] = int(
            math.floor(a / (a + b) * _FS_Q + 0.5 + 1e-9)
        )
    wref = ray.put(wfix_by_combo)

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def part_emit(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["c_custkey"], dtype=np.int64)
        pid = ck // 2
        pb = (splitmix64(pid.astype(np.uint64)) % np.uint64(nparts)).astype(
            np.int64
        )
        return pa.table(
            {
                "pb": pa.array(pb),
                "pair_id": pa.array(pid),
                "c_custkey": t["c_custkey"],
                "seg": t["c_mktsegment"],
                "nat": t["c_nationkey"],
                "bal_cents": pa.array(
                    _cents(np.asarray(t["c_acctbal"], dtype=np.float64))
                ),
            }
        )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        wtab = ray.get(wref)
        df = g.sort_values(["pair_id", "c_custkey"], kind="stable")
        pid = df["pair_id"].to_numpy(np.int64)
        i = np.flatnonzero(pid[:-1] == pid[1:])
        seg = df["seg"].to_numpy(object)
        nat = df["nat"].to_numpy(np.int64)
        bal = df["bal_cents"].to_numpy(np.int64)
        combo = (
            (seg[i] == seg[i + 1]) * 4
            + (nat[i] == nat[i + 1]) * 2
            + (np.abs(bal[i] - bal[i + 1]) < 50000) * 1
        ).astype(np.int64)
        w = wtab[combo]
        return pd.DataFrame(
            {
                "pair_id": pid[i],
                "combo": combo,
                "w_fix": w,
                "is_match": (w >= _FS_Q // 2).astype(np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal"],
        )
        .map_batches(part_emit, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(classify, batch_format="pandas")
    )


def q_blocking_quality(sf_dir: str):
    """Blocking-quality metrics (the standard ER evaluation pair):
    reduction ratio RR = 1 - |candidates| / C(n,2) and pairs
    completeness PC = |true ∩ candidates| / |true|, measured for the
    SQL-checkable MinHash-LSH blocking (``_mh_band_rows``) against
    exact-duplicate ground truth (identical-text content hash —
    vectorized ``_text_60bit``; equality-only, so the SQL twin's md5
    grouping is equivalent). One pass emits band keys + content hash
    per doc; candidates pair within (band, key) groups, dedup across
    bands via pair-hash buckets; true-pair counts fold from content
    group sizes. Output: ONE summary row."""
    import math

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    docs = _docs(sf_dir, ["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        ids, bands, keys = _mh_band_rows(t)
        # content hash per emitted row's doc (align via searchsorted)
        dids = np.asarray(t["doc_id"], dtype=np.int64)
        h60 = _text_60bit(t["text"])
        order = np.argsort(dids)
        hrow = h60[order][np.searchsorted(dids[order], ids)]
        gb = (
            splitmix64(
                keys.astype(np.uint64)
                + (bands.astype(np.uint64) << np.uint64(56))
            )
            % np.uint64(nparts)
        ).astype(np.int64)
        return pa.table(
            {
                "gb": pa.array(gb),
                "band": pa.array(bands),
                "key": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(ids),
                "h": pa.array(hrow),
            }
        )

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.sort_values(["band", "key", "doc_id"], kind="stable")
        bk = df["band"].to_numpy(np.int64) * (1 << 56) + df["key"].to_numpy(
            np.int64
        )
        ids = df["doc_id"].to_numpy(np.int64)
        hs = df["h"].to_numpy(np.int64)
        new = np.concatenate([[True], bk[1:] != bk[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(bk)))
        out_a: list = []
        out_b: list = []
        out_s: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block = ids[sel[:, None] + np.arange(s)[None, :]]
            hb = hs[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block[:, iu].ravel())
            out_b.append(block[:, ju].ravel())
            out_s.append((hb[:, iu] == hb[:, ju]).ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                    "same": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "same": np.concatenate(out_s).astype(np.int64),
            }
        ).drop_duplicates(["doc_a", "doc_b"])

    def add_pb(t: pa.Table) -> pa.Table:
        a = np.asarray(t["doc_a"], dtype=np.int64).astype(np.uint64)
        b = np.asarray(t["doc_b"], dtype=np.int64).astype(np.uint64)
        pb = (
            splitmix64(a * np.uint64(0x9E3779B97F4A7C15) ^ b)
            % np.uint64(nparts)
        ).astype(np.int64)
        return t.append_column("pb", pa.array(pb))

    def dedup_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["doc_a", "doc_b"])
        return pd.DataFrame(
            {
                "n_cand": [np.int64(len(d))],
                "n_cov": [np.int64(int(d["same"].sum()))],
            }
        )

    cand = (
        docs.map_batches(band_rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("gb")
        .map_groups(group_pairs, batch_format="pandas")
        .map_batches(add_pb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pb")
        .map_groups(dedup_count, batch_format="pandas")
        .to_pandas()
    )
    n_cand = int(cand["n_cand"].sum()) if len(cand) else 0
    n_cov = int(cand["n_cov"].sum()) if len(cand) else 0

    def hash_partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _text_60bit(df["text"].tolist())
        out = pd.DataFrame({"h": h}).groupby("h").size().reset_index()
        out.columns = ["h", "m"]
        out["m"] = out["m"].astype(np.int64)
        # hash-bucket the content keys: ONE bucketed combine, not one
        # Python map_groups call per distinct text
        out["hb"] = (
            splitmix64(out["h"].to_numpy(np.int64).view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)
        return out

    def true_pairs(g: pd.DataFrame) -> pd.DataFrame:
        sizes = g.groupby("h")["m"].sum().to_numpy(np.int64)
        return pd.DataFrame(
            {"n_true": [np.int64(int((sizes * (sizes - 1) // 2).sum()))]}
        )

    tp = (
        docs.map_batches(hash_partial, batch_format="pandas")
        .groupby("hb")
        .map_groups(true_pairs, batch_format="pandas")
        .to_pandas()
    )
    n_true = int(tp["n_true"].sum()) if len(tp) else 0
    n_docs = docs.count()

    total2 = n_docs * (n_docs - 1) // 2
    rr = 1.0 - (n_cand / total2 if total2 > 0 else 0.0)
    pc_ = n_cov / max(n_true, 1)
    return pa.table(
        {
            "n_docs": pa.array([n_docs], type=pa.int64()),
            "n_cand_pairs": pa.array([n_cand], type=pa.int64()),
            "n_true_pairs": pa.array([n_true], type=pa.int64()),
            "n_covered": pa.array([n_cov], type=pa.int64()),
            "rr_micro": pa.array(
                [int(math.floor(1000000.0 * rr + 1e-7))], type=pa.int64()
            ),
            "pc_micro": pa.array(
                [int(math.floor(1000000.0 * pc_ + 1e-7))], type=pa.int64()
            ),
        }
    )


def q_graph_triangles(sf_dir: str):
    """Distributed triangle counting over the LSH candidate graph
    (edge = two docs share a MinHash band key, the ``_mh_band_rows``
    parameters with a full SQL twin) — the classic degree-ordered
    node-iterator (Cohen's MapReduce formulation / the
    Suri–Vassilvitskii wedge-check): orient every edge from the
    lower-(degree, id) endpoint to the higher one, emit each node's
    out-neighbor pairs as wedges, and count wedges whose closing edge
    exists. Degree ordering bounds per-node wedge fan-out by the
    arboricity (O(sqrt(E)) out-degree), which is what makes the wedge
    volume tractable on a skewed graph. On the candidate graph the
    triangle density is the TRANSITIVITY diagnostic: near-clique
    components validate transitive-closure clustering; triangle-poor
    chains flag bridge edges that closure would over-merge.

    Shape: band keys hash-bucket once, per-bucket run-length triu pair
    expansion (the ``minhash_cluster_ids`` shape), pair-hash-bucket
    distinct. The (node, degree) panel is graph-node-sized and
    broadcasts via ``ray.put``; above a byte gate the rank attaches
    through the bucketed ``pinned_join`` fallback like every other
    broadcast in the repo. Wedges never materialize globally: each src
    bucket emits its own wedges pre-keyed by the closing pair's hash
    bucket, where a per-bucket semi-join against the directed edge
    list counts triangles. Full SQL oracle (3-way self-join over the
    recomputed band keys)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def _bucket(a: np.ndarray) -> np.ndarray:
        return (
            splitmix64(a.astype(np.int64).view(np.uint64)) % np.uint64(nparts)
        ).astype(np.int64)

    def _pair_bucket(u: np.ndarray, v: np.ndarray) -> np.ndarray:
        return (
            splitmix64(
                u.astype(np.int64).view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ v.astype(np.int64).view(np.uint64)
            )
            % np.uint64(nparts)
        ).astype(np.int64)

    def emit_keys(t: pa.Table) -> pa.Table:
        ids, _bands, keys = _mh_band_rows(t)
        kb = (splitmix64(keys) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "kb": pa.array(kb),
                "key": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(ids),
            }
        )

    def key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # distinct (key, doc) then run-length triu pair expansion per
        # key — the minhash_cluster_ids edge shape, emitted s1 < s2
        d = g[["key", "doc_id"]].drop_duplicates()
        d = d.sort_values(["key", "doc_id"])
        ky = d["key"].to_numpy(np.int64)
        ids = d["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], ky[1:] != ky[:-1]]))
        lens = np.diff(np.append(starts, len(ky)))
        out_a: list = []
        out_b: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block = ids[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block[:, iu].ravel())
            out_b.append(block[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "pb": pd.Series([], dtype=np.int64),
                    "s1": pd.Series([], dtype=np.int64),
                    "s2": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"s1": a, "s2": b}).drop_duplicates()
        df.insert(
            0, "pb", _pair_bucket(df["s1"].to_numpy(), df["s2"].to_numpy())
        )
        return df

    def distinct_edges(g: pd.DataFrame) -> pd.DataFrame:
        return g[["s1", "s2"]].drop_duplicates()

    edges = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kb")
        .map_groups(key_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(distinct_edges, batch_format="pandas")
        .materialize()
    )
    n_edges = edges.count()

    # (node, degree) panel: per-batch partial endpoint counts → one
    # combine. Node panel ∝ graph nodes (supplier dim here); above the
    # broadcast gate this panel attaches via pinned_join instead.
    def deg_partial(t: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [np.asarray(t["s1"], dtype=np.int64), np.asarray(t["s2"], dtype=np.int64)]
        )
        u, c = np.unique(nodes, return_counts=True)
        return pa.table(
            {"node": pa.array(u), "pd_": pa.array(c.astype(np.int64))}
        )

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("pd_", alias_name="deg"))
        .to_pandas()
        .sort_values("node")
    )
    n_nodes = np.int64(len(deg))
    # rank = position in (degree, node) order; directed edge u→v iff
    # rank_u < rank_v. searchsorted over the broadcast panel (the
    # orders_by_nation idiom — no per-row dict lookups).
    order = np.lexsort((deg["node"].to_numpy(np.int64), deg["deg"].to_numpy(np.int64)))
    node_sorted = deg["node"].to_numpy(np.int64)
    rank_by_pos = np.empty(len(deg), dtype=np.int64)
    rank_by_pos[order] = np.arange(len(deg), dtype=np.int64)
    rank_ref = ray.put((node_sorted, rank_by_pos))

    def orient(t: pa.Table) -> pa.Table:
        nodes, ranks = ray.get(rank_ref)
        a = np.asarray(t["s1"], dtype=np.int64)
        b = np.asarray(t["s2"], dtype=np.int64)
        ra = ranks[np.searchsorted(nodes, a)]
        rb = ranks[np.searchsorted(nodes, b)]
        lo_first = ra < rb
        u = np.where(lo_first, a, b)
        v = np.where(lo_first, b, a)
        rv = np.where(lo_first, rb, ra)
        return pa.table(
            {
                "ub": pa.array(_bucket(u)),
                "u": pa.array(u),
                "v": pa.array(v),
                "rv": pa.array(rv),
            }
        )

    directed = edges.map_batches(
        orient, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    # wedges from each src's out-neighbors (rank-ordered pair), keyed by
    # the closing pair's hash bucket; side=1 rows are the directed edges
    # themselves re-keyed the same way for the per-bucket semi-join
    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["u", "rv"])
        u = d["u"].to_numpy(np.int64)
        v = d["v"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], u[1:] != u[:-1]]))
        lens = np.diff(np.append(starts, len(u)))
        out_x: list = []
        out_y: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block = v[sel[:, None] + np.arange(s)[None, :]]  # rank-ascending
            iu, ju = np.triu_indices(int(s), k=1)
            out_x.append(block[:, iu].ravel())
            out_y.append(block[:, ju].ravel())
        if not out_x:
            return pd.DataFrame(
                {
                    "pb": pd.Series([], dtype=np.int64),
                    "x": pd.Series([], dtype=np.int64),
                    "y": pd.Series([], dtype=np.int64),
                    "side": pd.Series([], dtype=np.int8),
                }
            )
        x = np.concatenate(out_x)
        y = np.concatenate(out_y)
        return pd.DataFrame(
            {
                "pb": _pair_bucket(x, y),
                "x": x,
                "y": y,
                "side": np.zeros(len(x), dtype=np.int8),
            }
        )

    def edge_side(df: pd.DataFrame) -> pd.DataFrame:
        # pandas batch (not arrow) so the union with the wedge stream —
        # whose map_groups emits pandas blocks — stays one block type
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "pb": _pair_bucket(u, v),
                "x": u,
                "y": v,
                "side": np.ones(len(u), dtype=np.int8),
            }
        )

    def close_count(g: pd.DataFrame) -> pd.DataFrame:
        w = g[g["side"] == 0]
        e = g[g["side"] == 1][["x", "y"]].drop_duplicates()
        n_w = np.int64(len(w))
        if len(w) == 0 or len(e) == 0:
            return pd.DataFrame({"n_w": [n_w], "n_tri": [np.int64(0)]})
        m = w.merge(e, on=["x", "y"], how="inner")
        return pd.DataFrame({"n_w": [n_w], "n_tri": [np.int64(len(m))]})

    if n_edges == 0:
        panel = pd.DataFrame({"n_w": [], "n_tri": []})
    elif directed.size_bytes() <= 64 << 20:
        # fast path: the DIRECTED EDGE LIST (≪ wedge volume — that is
        # the point of degree ordering) fits a broadcast; each wedge
        # bucket checks closure against the broadcast sorted edge-rank
        # keys locally, so the 1M-row wedge stream never enters a
        # shuffle. Edge key = rank(u)·n_nodes + rank(v): exact (ranks
        # are dense in [0, n_nodes)), int64-safe under the byte gate.
        et = pa.concat_tables(
            directed.select_columns(["u", "v"]).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
        eu = np.asarray(et["u"], dtype=np.int64)
        ev = np.asarray(et["v"], dtype=np.int64)
        iu = np.searchsorted(node_sorted, eu)
        iv = np.searchsorted(node_sorted, ev)
        ekeys_ref = ray.put(np.sort(iu * int(n_nodes) + iv))

        def close_local(g: pd.DataFrame) -> pd.DataFrame:
            w = wedges(g)
            n_w = np.int64(len(w))
            if n_w == 0:
                return pd.DataFrame({"n_w": [n_w], "n_tri": [np.int64(0)]})
            ekeys = ray.get(ekeys_ref)
            kx = np.searchsorted(node_sorted, w["x"].to_numpy(np.int64))
            ky = np.searchsorted(node_sorted, w["y"].to_numpy(np.int64))
            wk = kx * int(n_nodes) + ky
            pos = np.clip(np.searchsorted(ekeys, wk), 0, len(ekeys) - 1)
            n_tri = np.int64((ekeys[pos] == wk).sum())
            return pd.DataFrame({"n_w": [n_w], "n_tri": [n_tri]})

        panel = (
            directed.groupby("ub")
            .map_groups(close_local, batch_format="pandas")
            .to_pandas()
        )
    else:
        # at-scale path: wedges are emitted pre-keyed by the closing
        # pair's hash bucket and meet the re-keyed directed edges in a
        # per-bucket semi-join — no global edge broadcast required.
        wedge_stream = directed.groupby("ub").map_groups(
            wedges, batch_format="pandas"
        )
        edge_stream = directed.map_batches(edge_side, batch_format="pandas")
        panel = (
            wedge_stream.union(edge_stream)
            .groupby("pb")
            .map_groups(close_count, batch_format="pandas")
            .to_pandas()
        )
    n_wedges = int(panel["n_w"].sum()) if len(panel) else 0
    n_tri = int(panel["n_tri"].sum()) if len(panel) else 0
    return pa.table(
        {
            "n_nodes": pa.array([int(n_nodes)], type=pa.int64()),
            "n_edges": pa.array([int(n_edges)], type=pa.int64()),
            "n_wedges": pa.array([n_wedges], type=pa.int64()),
            "n_triangles": pa.array([n_tri], type=pa.int64()),
        }
    )


def q_countmin_estimates(sf_dir: str):
    """Count-Min sketch (Cormode–Muthukrishnan) over the corpus token
    stream: d=4 rows × w=512 buckets, Kirsch–Mitzenmacher double hashing
    from one 60-bit md5 fold (``b_i = (h_lo + i·h_hi) mod w`` — the same
    two-hash trick the bloom filter uses). Per-batch PARTIALS are the
    (row, bucket) cell sums — at most d·w rows per batch regardless of
    token volume — combined by one single-key groupby; the sketch is the
    canonical mergeable-summary shape (state O(d·w), stream-size-free).
    Point estimates (min over rows) are reported for the 10 globally
    most-frequent tokens next to their exact counts, so the output
    also certifies the CMS one-sided error: est ≥ exact always. Full
    SQL oracle (md5-fold + integer bucket arithmetic)."""
    import hashlib as _hl

    D, W = 4, 512
    docs = _docs(sf_dir, ["text"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        toks = _bpe_findall(df["text"])
        n = toks.str.len().to_numpy()
        if n.sum() == 0:
            return pd.DataFrame(
                {
                    "kind": pd.Series([], dtype=np.int8),
                    "cell": pd.Series([], dtype=np.int64),
                    "token": pd.Series([], dtype=str),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        flat = pd.Series(np.concatenate(toks.to_numpy()))
        cnt = flat.groupby(flat, sort=False).size()
        tokens = cnt.index.to_numpy(dtype=object)
        counts = cnt.to_numpy(np.int64)
        h = np.fromiter(
            (
                int(_hl.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in tokens
            ),
            dtype=np.int64,
            count=len(tokens),
        )
        h_lo = h % (1 << 30)
        h_hi = h >> 30
        rows = []
        for i in range(D):
            b = (h_lo + i * h_hi) % W
            cell = pd.DataFrame({"cell": i * W + b, "n": counts})
            rows.append(cell)
        cms = (
            pd.concat(rows).groupby("cell", as_index=False)["n"].sum()
        )
        cms.insert(0, "kind", np.int8(0))
        cms.insert(2, "token", "")
        # kind=1 rows: exact per-token partial counts (the vocab_stats
        # word-count shuffle; volume bounded by per-batch vocabulary)
        ex = pd.DataFrame(
            {
                "kind": np.int8(1),
                "cell": np.int64(-1),
                "token": tokens.astype(str),
                "n": counts,
            }
        )
        out = pd.concat([cms, ex], ignore_index=True)
        out["cell"] = out["cell"].astype(np.int64)
        out["n"] = out["n"].astype(np.int64)
        return out

    both = docs.map_batches(partials, batch_format="pandas").materialize()

    cms_panel = (
        both.filter(expr="kind == 0")
        .groupby("cell")
        .aggregate(Sum("n", alias_name="cn"))
        .to_pandas()
    )
    cms = np.zeros(D * W, dtype=np.int64)
    cms[cms_panel["cell"].to_numpy(np.int64)] = cms_panel["cn"].to_numpy(np.int64)

    exact = (
        both.filter(expr="kind == 1")
        .groupby("token")
        .aggregate(Sum("n", alias_name="exact_n"))
        .to_pandas()
    )
    top = exact.sort_values(
        ["exact_n", "token"], ascending=[False, True]
    ).head(10)

    ests = []
    for t in top["token"]:
        h = int(_hl.md5(t.encode("utf-8")).hexdigest()[:15], 16)
        h_lo, h_hi = h % (1 << 30), h >> 30
        ests.append(min(int(cms[i * W + (h_lo + i * h_hi) % W]) for i in range(D)))
    est = np.asarray(ests, dtype=np.int64)
    exact_n = top["exact_n"].to_numpy(np.int64)
    return pa.table(
        {
            "token": pa.array(top["token"].tolist(), type=pa.string()),
            "exact_n": pa.array(exact_n),
            "cms_est": pa.array(est),
            "overcount": pa.array(est - exact_n),
        }
    )


def q_winsorized_stats(sf_dir: str):
    """Winsorized length statistics per lang — the outlier-robust
    aggregate a quality pipeline uses where a plain mean is dominated by
    a few megabyte files: clip ``n_chars`` to the exact [p5, p95]
    per-lang values (the ``event_value_percentiles`` integer rank rule
    ``(p·n+99)//100`` on a compacted (lang, n_chars) histogram — one
    corpus pass, panel bounded by langs × distinct lengths), then the
    clipped sum/mean in pure-integer arithmetic (mean as milli-units,
    floor division — hash-exact in SQL)."""
    docs = _docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "v": np.asarray(t["n_chars"], dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "v"], as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), type=pa.string()),
                "v": pa.array(g["v"].to_numpy(np.int64)),
                "pn": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("v", as_index=False)["pn"].sum().sort_values("v")
        v = h["v"].to_numpy(np.int64)
        n = h["pn"].to_numpy(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1])
        p5 = int(v[np.searchsorted(cum, (5 * total + 99) // 100)])
        p95 = int(v[np.searchsorted(cum, (95 * total + 99) // 100)])
        clipped = np.clip(v, p5, p95)
        wsum = int((clipped * n).sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n": np.array([total], dtype=np.int64),
                "p5": np.array([p5], dtype=np.int64),
                "p95": np.array([p95], dtype=np.int64),
                "wins_sum": np.array([wsum], dtype=np.int64),
                "wins_mean_milli": np.array(
                    [wsum * 1000 // total], dtype=np.int64
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


_BAL_SALT = 1004  # sampler salt (see _id_rank60; mirrored in the SQL twin)


def q_balanced_sample(sf_dir: str):
    """Mixture balancing — per-lang downsample to the SMALLEST lang's
    row count (the training-mixture equalizer every multilingual
    pipeline runs before tokenization): kept rows are the n_min
    smallest-``_id_rank60(doc_id)`` docs of each lang (vectorized
    splitmix64 — the retired form was a per-row md5 hexdigest loop), so
    the 'random' subset is a pure function of the row key (reproducible
    across runs and cluster sizes, the T6 hash-split discipline). Two
    passes: a lang-count panel (langs-sized) fixes n_min, then
    per-batch per-lang head(n_min) partials bound the shuffle before
    the per-lang final head. Full SQL oracle (row_number over the same
    integer rank)."""
    docs = _docs(sf_dir, ["lang", "doc_id"])
    counts = docs.groupby("lang").count().to_pandas()
    n_min = int(counts["count()"].min())

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].astype(np.int64),
                "skey": _id_rank60(df["doc_id"].to_numpy(np.int64), _BAL_SALT),
            }
        )
        return (
            g.sort_values(["skey", "doc_id"], kind="stable")
            .groupby("lang", sort=False)
            .head(n_min)
            .reset_index(drop=True)
        )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["skey", "doc_id"], kind="stable").head(n_min)
        g = g.reset_index(drop=True)
        g["sample_rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "doc_id", "sample_rank"]]

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(pick, batch_format="pandas")
    )


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (DuckDB ``//`` truncates toward zero;
    Python ``//`` floors — they differ on negative quotients)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def q_lang_regression(sf_dir: str):
    """Per-lang OLS fit of token count on n_chars — the distributed
    sufficient-statistics pattern for linear models: each batch emits
    only the five per-lang integer moments (n, Σx, Σy, Σxy, Σx²), one
    single-key combine folds them, and the closed-form slope/intercept
    evaluate on the langs-sized panel. All arithmetic is exact integers
    (Python bigints driver-side, HUGEINT in SQL; quotients in micro /
    milli units via truncating division) — hash-exact by construction,
    no float summation order anywhere. Tokens are the BPE pre-tokenizer
    classes (``_bpe_findall``, RE2 parity). Full SQL oracle."""
    docs = _docs(sf_dir, ["lang", "text", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = _bpe_findall(df["text"])
        y = toks.str.len().to_numpy().astype(np.int64)
        x = df["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame(
            {
                "lang": df["lang"],
                "pn": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sy": y,
                "sxy": x * y,
                "sxx": x * x,
            }
        )
        return g.groupby("lang", as_index=False).sum()

    panel = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("lang")
    )
    rows = []
    for r in panel.itertuples(index=False):
        # exact bigint math: n·Σxy − Σx·Σy overflows int64 at corpus
        # scale, so the langs-sized panel evaluates in Python ints
        n, sx, sy, sxy, sxx = (
            int(r.n), int(r.sx), int(r.sy), int(r.sxy), int(r.sxx)
        )
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        slope_micro = _tdiv(num * 1_000_000, den) if den else 0
        icpt_milli = _tdiv((sy * den - num * sx) * 1_000, den * n) if den else 0
        rows.append((r.lang, n, slope_micro, icpt_milli))
    return pa.table(
        {
            "lang": pa.array([r[0] for r in rows], type=pa.string()),
            "n": pa.array([r[1] for r in rows], type=pa.int64()),
            "slope_micro": pa.array([r[2] for r in rows], type=pa.int64()),
            "intercept_milli": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def q_decayed_counts(sf_dir: str):
    """Exponentially time-decayed engagement score per event_type — the
    streaming-flavored 'recency-weighted popularity' aggregate, in pure
    integers so it is hash-exact: an event aged d whole days (vs the
    corpus max ts) contributes 1000 // 2^(d // 7) milli-units (7-day
    half-life, weight floors to 0 past ~10 half-lives — exactly the
    truncation a fixed-point streaming counter applies). Two passes:
    a max-ts scalar (one Max aggregate), then per-batch per-type partial
    sums (shuffle = types × blocks). Full SQL oracle."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    t_max = events.aggregate(Max("ts"))["max(ts)"]
    t_max_us = int(pd.Timestamp(t_max).value // 1000)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        age_days = (t_max_us - ts) // np.int64(86_400_000_000)
        shift = np.minimum(age_days // 7, 62).astype(np.int64)
        g = pd.DataFrame(
            {
                "event_type": df["event_type"],
                "pw": np.int64(1000) >> shift,
                "pn": np.ones(len(shift), dtype=np.int64),
            }
        ).groupby("event_type", as_index=False).sum()
        g["pw"] = g["pw"].astype(np.int64)
        g["pn"] = g["pn"].astype(np.int64)
        return g

    return (
        events.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(
            Sum("pw", alias_name="decayed_milli"),
            Sum("pn", alias_name="n_events"),
        )
    )


def q_regional_revenue(sf_dir: str):
    """TPC-H Q5 topology — the LOCAL-SUPPLIER join: revenue per nation
    counted only where the ordering customer and the line's supplier
    share a nation. Distinct from every other join in the registry by
    combining BOTH join families at once: two dimension broadcasts
    attach nationkeys to opposite sides of a big–big fact join
    (customer→orders, supplier→lineitem via ``ray.put`` searchsorted
    lookups), then orders and lineitem co-partition on orderkey hash
    buckets (one single-key shuffle each) and every bucket applies the
    equality filter locally and pre-aggregates to a nations-sized
    partial. Revenue = floor(price·(1−disc)·100) — the same IEEE
    expression both engines evaluate. Full SQL oracle (4-way join)."""
    import pyarrow.parquet as pq

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    )
    ck = np.asarray(cust["c_custkey"]).astype(np.int64)
    co = np.argsort(ck)
    cust_ref = ray.put(
        (ck[co], np.asarray(cust["c_nationkey"]).astype(np.int64)[co])
    )
    sk = np.asarray(supp["s_suppkey"]).astype(np.int64)
    so = np.argsort(sk)
    supp_ref = ray.put(
        (sk[so], np.asarray(supp["s_nationkey"]).astype(np.int64)[so])
    )
    nk = np.asarray(nation["n_nationkey"]).astype(np.int64)
    no = np.argsort(nk)
    nnames = np.asarray(nation["n_name"].to_pylist(), dtype=object)[no]
    nk_sorted = nk[no]

    def _bucket(k: np.ndarray) -> np.ndarray:
        return (splitmix64(k.view(np.uint64)) % np.uint64(nparts)).astype(
            np.int64
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(cust_ref)
        k = np.asarray(t["o_orderkey"], dtype=np.int64)
        cnat = nats[np.searchsorted(keys, np.asarray(t["o_custkey"], dtype=np.int64))]
        return pa.table(
            {
                "bucket": pa.array(_bucket(k)),
                "key": pa.array(k),
                "nat": pa.array(cnat),
                "cents": pa.array(np.zeros(len(k), dtype=np.int64)),
                "side": pa.array(np.zeros(len(k), dtype=np.int8)),
            }
        )

    def tag_items(t: pa.Table) -> pa.Table:
        keys, nats = ray.get(supp_ref)
        k = np.asarray(t["l_orderkey"], dtype=np.int64)
        snat = nats[np.searchsorted(keys, np.asarray(t["l_suppkey"], dtype=np.int64))]
        price = np.asarray(t["l_extendedprice"], dtype=np.float64)
        disc = np.asarray(t["l_discount"], dtype=np.float64)
        cents = np.floor(price * (1 - disc) * 100).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(_bucket(k)),
                "key": pa.array(k),
                "nat": pa.array(snat),
                "cents": pa.array(cents),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(tag_orders, batch_format="pyarrow")
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(tag_items, batch_format="pyarrow")

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["key", "nat"]].rename(columns={"nat": "cnat"})
        li = g.loc[g["side"] == 1, ["key", "nat", "cents"]]
        j = li.merge(o, on="key", how="inner")
        j = j[j["nat"] == j["cnat"]]
        if len(j) == 0:
            return pd.DataFrame(
                {
                    "nat": pd.Series([], dtype=np.int64),
                    "part_cents": pd.Series([], dtype=np.int64),
                    "part_items": pd.Series([], dtype=np.int64),
                }
            )
        out = j.groupby("nat", as_index=False).agg(
            part_cents=("cents", "sum"), part_items=("cents", "size")
        )
        out["part_cents"] = out["part_cents"].astype(np.int64)
        out["part_items"] = out["part_items"].astype(np.int64)
        return out

    panel = (
        orders.union(items)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
        .groupby("nat")
        .aggregate(
            Sum("part_cents", alias_name="revenue_cents"),
            Sum("part_items", alias_name="n_items"),
        )
        .to_pandas()
        .sort_values("nat")
    )
    names = nnames[np.searchsorted(nk_sorted, panel["nat"].to_numpy(np.int64))]
    return pa.table(
        {
            "n_name": pa.array(list(names), type=pa.string()),
            "revenue_cents": pa.array(panel["revenue_cents"].to_numpy(np.int64)),
            "n_items": pa.array(panel["n_items"].to_numpy(np.int64)),
        }
    )


def _mh_candidate_pairs(sf_dir: str):
    """Deduped LSH candidate pairs (id_a < id_b) at the SQL-checkable
    ``_mh_band_rows`` parameters: band-key emission → key-hash buckets →
    run-length triu pair expansion → pair-hash-bucket dedup.  Shared by
    the containment join and the sketch-error audit."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit_keys(t: pa.Table) -> pa.Table:
        ids, _bands, keys = _mh_band_rows(t)
        kb = (splitmix64(keys) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "kb": pa.array(kb),
                "key": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(ids),
            }
        )

    def key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["key", "doc_id"]].drop_duplicates().sort_values(["key", "doc_id"])
        ky = d["key"].to_numpy(np.int64)
        ids = d["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], ky[1:] != ky[:-1]]))
        lens = np.diff(np.append(starts, len(ky)))
        out_a: list = []
        out_b: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block = ids[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block[:, iu].ravel())
            out_b.append(block[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "pb": pd.Series([], dtype=np.int64),
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"id_a": a, "id_b": b}).drop_duplicates()
        pb = (
            splitmix64(
                df["id_a"].to_numpy(np.int64).view(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                ^ df["id_b"].to_numpy(np.int64).view(np.uint64)
            )
            % np.uint64(nparts)
        ).astype(np.int64)
        df.insert(0, "pb", pb)
        return df

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kb")
        .map_groups(key_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(
            lambda g: g[["id_a", "id_b"]].drop_duplicates(),
            batch_format="pandas",
        )
        .materialize()
    )


_DOC_TEXTS_MEMO: dict = {}
_DOC_TEXTS_GATE_ENV = "APR_DOC_TEXTS_BROADCAST_MAX_BYTES"


def _norm_doc_texts_ds(sf_dir: str):
    """Streaming (doc_id, norm) panel — every document normalized the
    same way the diagnostics' shingle sets expect.  A Dataset, never
    driver-collected by itself."""
    from address_parser_ray.functions.normalize import normalize_content_arrow

    def norm_texts(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": t["doc_id"], "norm": normalize_content_arrow(t["text"])}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        norm_texts, batch_format="pyarrow", zero_copy_batch=True
    )


def _gated_doc_texts(sf_dir: str):
    """Byte-GATED texts-by-id for the doc-id diagnostics — the
    ``stages/rescore.py`` ``filter_texts_by_id`` discipline: returns
    ``(texts_ref, texts_ds)`` with exactly one side set.

    Below the gate (env ``APR_DOC_TEXTS_BROADCAST_MAX_BYTES``, default
    ``DEFAULT_CONFIG.broadcast_feats_max_bytes``) the panel is collected
    once, sorted by doc_id and broadcast via ``ray.put`` — each consumer
    batch does one searchsorted lookup.  ABOVE the gate nothing
    corpus-scale reaches the driver: ``texts_ds`` comes back instead and
    consumers attach text through the bucketed ``pinned_join``
    (``_attach_norm_texts`` / a record_id join).  Memoized per
    (sf_dir, gate) — three diagnostics share the panel."""
    import os

    gate = int(
        os.environ.get(_DOC_TEXTS_GATE_ENV)
        or DEFAULT_CONFIG.broadcast_feats_max_bytes
    )
    key = (sf_dir, gate)
    if key in _DOC_TEXTS_MEMO:
        return _DOC_TEXTS_MEMO[key]
    texts_ds = _norm_doc_texts_ds(sf_dir).materialize()
    if texts_ds.size_bytes() <= gate:
        tbl = pa.concat_tables(
            texts_ds.iter_batches(batch_size=1 << 18, batch_format="pyarrow")
        )
        tids = np.asarray(tbl["doc_id"], dtype=np.int64)
        order = np.argsort(tids)
        norms = tbl["norm"].to_pylist()
        out = (ray.put((tids[order], [norms[i] for i in order])), None)
    else:
        out = (None, texts_ds)
    _DOC_TEXTS_MEMO[key] = out
    return out


def _attach_norm_texts(pairs, texts_ds):
    """(id_a, id_b, …) pairs + (doc_id, norm) panel → pairs with
    ``norm_a``/``norm_b`` attached via two bucketed ``pinned_join``s —
    the above-gate path (text shuffles by id, bounded by the pair set;
    nothing driver-side)."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    j = pinned_join(
        pairs,
        project(texts_ds, {"doc_id": "doc_id", "norm": "norm_a"}),
        on="id_a",
        right_on="doc_id",
        num_partitions=nparts,
    )
    return pinned_join(
        j,
        project(texts_ds, {"doc_id": "doc_id", "norm": "norm_b"}),
        on="id_b",
        right_on="doc_id",
        num_partitions=nparts,
    )


def q_containment_pairs(sf_dir: str):
    """ASYMMETRIC containment join over the LSH candidate pairs — the
    quote/inclusion detector symmetric Jaccard misses (a file pasted
    inside a larger one scores low Jaccard but containment ≈ 1): for
    every candidate pair (docs sharing a MinHash band key at the
    ``_mh_band_rows`` parameters), containment(A→B) = |A∩B|·10⁶ //
    |A| over DISTINCT 8-gram shingle hash sets, reported in both
    directions (a = smaller doc_id). Candidate pairs come from the
    band-bucket run-length expansion (the triangles/cluster shape);
    texts re-attach by id through ``_gated_doc_texts``: a ``ray.put``
    broadcast under the byte gate, the bucketed ``pinned_join``
    (``_attach_norm_texts``) above it — the driver never holds
    corpus-scale text. Full SQL oracle (distinct shingle-hash sets
    recomputed in DuckDB)."""
    from address_parser_ray.functions.hashing import char_shingle_hashes

    pairs = _mh_candidate_pairs(sf_dir)
    texts_ref, texts_ds = _gated_doc_texts(sf_dir)

    def score(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        cache: dict[int, set] = {}
        if texts_ref is not None:
            ids_sorted, norms = ray.get(texts_ref)

            def text_of(doc: int, i: int, side: int) -> str:
                return norms[int(np.searchsorted(ids_sorted, doc))]
        else:
            na = batch["norm_a"].to_pylist()
            nb = batch["norm_b"].to_pylist()

            def text_of(doc: int, i: int, side: int) -> str:
                return na[i] if side == 0 else nb[i]

        def sset(doc: int, i: int, side: int) -> set:
            got = cache.get(doc)
            if got is None:
                got = set(char_shingle_hashes(text_of(doc, i, side), 8).tolist())
                cache[doc] = got
            return got

        ca = np.empty(len(a), dtype=np.int64)
        cb = np.empty(len(a), dtype=np.int64)
        ni_arr = np.empty(len(a), dtype=np.int64)
        for i in range(len(a)):
            sa, sb = sset(int(a[i]), i, 0), sset(int(b[i]), i, 1)
            ni = len(sa & sb)
            ni_arr[i] = ni
            ca[i] = ni * 1_000_000 // len(sa) if sa else 0
            cb[i] = ni * 1_000_000 // len(sb) if sb else 0
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "n_shared": pa.array(ni_arr),
                "cont_a_micro": pa.array(ca),
                "cont_b_micro": pa.array(cb),
            }
        )

    src = pairs if texts_ref is not None else _attach_norm_texts(pairs, texts_ds)
    return src.map_batches(
        score, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    )


_SOUNDEX_FROM = "AEIOUYBFPVCGJKQSXZDTLMNRHW"
_SOUNDEX_TO = "000000111122222222334556"  # HW have no target: dropped
_SOUNDEX_TABLE = str.maketrans(
    _SOUNDEX_FROM[: len(_SOUNDEX_TO)],
    _SOUNDEX_TO,
    _SOUNDEX_FROM[len(_SOUNDEX_TO):],
)
_SOUNDEX_RUN = re.compile(r"(.)\1+")
_NON_ALPHA = re.compile(r"[^A-Z]")


def _soundex(name: str) -> str:
    """American Soundex (Russell/Odell): vowels break same-code runs
    (coded 0 then removed), H/W are transparent (dropped BEFORE the
    adjacent-collapse, so codes separated only by h/w merge), first
    letter kept verbatim with its own code collapsed into the leading
    run. Verified on the textbook vectors (ASHCRAFT→A261, TYMCZAK→T522,
    PFEIFFER→P160). Non-letters are stripped first (multi-word inputs
    code as their concatenation)."""
    clean = _NON_ALPHA.sub("", (name or "").upper())
    if not clean:
        return ""
    mapped = clean.translate(_SOUNDEX_TABLE)
    collapsed = _SOUNDEX_RUN.sub(r"\1", mapped)
    digits = collapsed[1:].replace("0", "")
    return clean[0] + (digits[:3] + "000")[:3]


def q_soundex_blocks(sf_dir: str):
    """Phonetic blocking (the classic pre-LSH ER blocking key the
    registry's sorted-neighborhood / meta-blocking family lacked):
    group part names by American Soundex code and report each block's
    distinct-name count, row count, candidate-pair bound C(names, 2)
    and alphabetically-first member. Per-batch partials carry
    (code, name, rows) — distinct names, not rows — so the shuffle is
    bounded by the name vocabulary; the final per-code group computes
    the block stats. Full SQL oracle (translate + regexp_replace
    reproduce the code character-for-character)."""
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_name", as_index=False).size()
        g["code"] = [_soundex(n) for n in g["p_name"]]
        return pd.DataFrame(
            {
                "code": g["code"],
                "p_name": g["p_name"],
                "pn": g["size"].astype(np.int64),
            }
        )

    def block(g: pd.DataFrame) -> pd.DataFrame:
        names = g.groupby("p_name", as_index=False)["pn"].sum()
        m = np.int64(len(names))
        return pd.DataFrame(
            {
                "code": [g["code"].iloc[0]],
                "n_names": m,
                "n_rows": np.array([names["pn"].sum()], dtype=np.int64),
                "n_cand_pairs": m * (m - 1) // 2,
                "first_name": [names["p_name"].min()],
            }
        )

    return (
        parts.map_batches(partial, batch_format="pandas")
        .groupby("code")
        .map_groups(block, batch_format="pandas")
    )


def q_golden_records(sf_dir: str):
    """Survivorship merge (the MDM "golden record" build) over the
    SQL-checkable LSH clusters — the ER output step after clustering
    that ``cluster_canonical`` (pick ONE representative row) does not
    cover: per cluster, each FIELD survives independently — modal lang
    and modal source (tie → lexicographically smallest), min doc id as
    the stable representative key, summed n_chars. Cluster ids come
    from the same band→edges→transitive-closure chain as
    ``minhash_cluster_ids``; attributes re-attach by id through
    ``pinned_join`` (doc-sized both sides — never a broadcast
    assumption), then ONE single-key groupby computes all survivorship
    rules inside the cluster group. Full SQL oracle (recursive-CTE
    closure + row_number modes)."""
    asg = q_minhash_cluster_ids(sf_dir)
    docs = _docs(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    j = pinned_join(
        docs,
        project(asg, {"doc_id": "cid_doc", "cluster_id": "cluster_id"}),
        on="doc_id",
        right_on="cid_doc",
    )

    def golden(g: pd.DataFrame) -> pd.DataFrame:
        def mode(col: pd.Series) -> str:
            c = col.groupby(col).size()
            return c.sort_index().sort_values(kind="stable", ascending=False).index[0]

        return pd.DataFrame(
            {
                "cluster_id": np.array(
                    [g["cluster_id"].iloc[0]], dtype=np.int64
                ),
                "n_docs": np.array([len(g)], dtype=np.int64),
                "rep_doc": np.array([g["doc_id"].min()], dtype=np.int64),
                "golden_lang": [mode(g["lang"])],
                "golden_source": [mode(g["source"])],
                "total_chars": np.array(
                    [g["n_chars"].sum()], dtype=np.int64
                ),
            }
        )

    return j.groupby("cluster_id").map_groups(golden, batch_format="pandas")


def q_length_outliers(sf_dir: str):
    """Per-lang 3σ length-outlier detection with EXACT integer
    arithmetic — the quality filter a plain float z-score gets wrong at
    hash-comparison time: flag x where (x·n − Σx)² > 9·(n·Σx² − (Σx)²)
    (the z² > 9 inequality cleared of divisions and square roots —
    (x−μ)² = (xn−Σx)²/n² and σ² = (nΣx²−(Σx)²)/n² share the n² — so
    both engines evaluate identical bigints). Two passes: a langs-sized
    integer-moment panel (per-batch partials, one combine) broadcasts;
    the flag pass re-streams n_chars and pre-aggregates outlier counts
    per batch. Full SQL oracle (HUGEINT)."""
    docs = _docs(sf_dir, ["lang", "n_chars"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame(
            {
                "lang": df["lang"],
                "pn": np.ones(len(x), dtype=np.int64),
                "sx": x,
                "sxx": x * x,
            }
        ).groupby("lang", as_index=False).sum()
        for c in ("pn", "sx", "sxx"):
            g[c] = g[c].astype(np.int64)
        return g

    panel = (
        docs.map_batches(moments, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
    )
    # exact bigint thresholds per lang (Python ints — n·Σx² overflows
    # int64 at corpus scale)
    stats = {
        str(r.lang): (int(r.n), int(r.sx), 9 * (int(r.n) * int(r.sxx) - int(r.sx) ** 2))
        for r in panel.itertuples(index=False)
    }
    stats_ref = ray.put(stats)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        st = ray.get(stats_ref)
        out_lang, out_n, out_out = [], [], []
        for lang, grp in df.groupby("lang", sort=False):
            n, sx, thr = st[str(lang)]
            x = grp["n_chars"].to_numpy(np.int64).astype(object)  # bigint
            dev = x * n - sx
            is_out = (dev * dev) > thr
            out_lang.append(lang)
            out_n.append(len(grp))
            out_out.append(int(np.count_nonzero(is_out)))
        return pd.DataFrame(
            {
                "lang": out_lang,
                "pn": np.asarray(out_n, dtype=np.int64),
                "po": np.asarray(out_out, dtype=np.int64),
            }
        )

    return (
        docs.map_batches(flag, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("po", alias_name="n_outliers"),
        )
    )


def q_partition_digests(sf_dir: str):
    """Replica-reconciliation fingerprints per source — the
    anti-entropy primitive for verifying a copy of a 100-TB table
    partition-by-partition without moving rows: per source emit row
    count, an ORDER-INDEPENDENT additive digest (Σ md5₆₀(text) mod 2⁶⁰)
    and an xor digest (bit_xor of the same hashes). Both digests are
    mergeable (per-batch partials fold associatively), so the shuffle
    carries sources × blocks tiny rows; two replicas compare panels and
    ship only mismatched partitions. Full SQL oracle (HUGEINT sum %,
    bit_xor)."""
    docs = _docs(sf_dir, ["source", "text"])
    MOD = 1 << 60

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _text_60bit(df["text"].tolist())
        rows = []
        for src, grp in pd.DataFrame({"source": df["source"], "h": h}).groupby(
            "source", sort=False
        ):
            hv = grp["h"].to_numpy(np.int64)
            rows.append(
                (
                    src,
                    len(hv),
                    int(sum(int(v) for v in hv) % MOD),
                    int(np.bitwise_xor.reduce(hv)) if len(hv) else 0,
                )
            )
        return pd.DataFrame(
            rows, columns=["source", "pn", "psum", "pxor"]
        ).astype({"pn": np.int64, "psum": np.int64, "pxor": np.int64})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_rows": np.array([g["pn"].sum()], dtype=np.int64),
                "digest_sum": np.array(
                    [sum(int(v) for v in g["psum"]) % MOD], dtype=np.int64
                ),
                "digest_xor": np.array(
                    [int(np.bitwise_xor.reduce(g["pxor"].to_numpy(np.int64)))],
                    dtype=np.int64,
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(merge, batch_format="pandas")
    )


_STITCH_K = 3
_SPACE_TOK = re.compile(r"[^ ]+")


def q_fragment_stitching(sf_dir: str):
    """Crawl-fragment stitching — detect docs where the LAST 3
    space-tokens of A equal the FIRST 3 of B (the overlap a pagination
    or chunked-crawl merge leaves behind): postings emit each doc's head
    and tail boundary keys once, hash-bucket on the boundary string,
    and each bucket joins tails×heads locally (self-pairs excluded).
    Shuffle carries two short keys per doc — content never moves. Docs
    shorter than 6 tokens are skipped on both sides (head and tail
    would overlap). Full SQL oracle (list-slice joins; the bucket hash
    is routing-only — ``_text_60bit`` vectorized, never compared)."""
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    docs = _docs(sf_dir, ["doc_id", "text"])

    def postings(df: pd.DataFrame) -> pd.DataFrame:
        out_key, out_id, out_side = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            w = _SPACE_TOK.findall(text or "")
            if len(w) < 2 * _STITCH_K:
                continue
            head = " ".join(w[:_STITCH_K])
            tail = " ".join(w[-_STITCH_K:])
            for key, side in ((head, 0), (tail, 1)):
                out_key.append(key)
                out_id.append(int(doc_id))
                out_side.append(side)
        bucket = (
            _text_60bit(out_key) % nparts
            if out_key
            else np.empty(0, dtype=np.int64)
        )
        return pd.DataFrame(
            {
                "bucket": bucket,
                "key": pd.Series(out_key, dtype=str),
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "side": np.asarray(out_side, dtype=np.int8),
            }
        )

    def bucket_join(g: pd.DataFrame) -> pd.DataFrame:
        tails = g.loc[g["side"] == 1, ["key", "doc_id"]].rename(
            columns={"doc_id": "id_from"}
        )
        heads = g.loc[g["side"] == 0, ["key", "doc_id"]].rename(
            columns={"doc_id": "id_to"}
        )
        j = tails.merge(heads, on="key")
        j = j[j["id_from"] != j["id_to"]]
        if len(j) == 0:
            return pd.DataFrame(
                {
                    "id_from": pd.Series([], dtype=np.int64),
                    "id_to": pd.Series([], dtype=np.int64),
                    "boundary": pd.Series([], dtype=str),
                }
            )
        return pd.DataFrame(
            {
                "id_from": j["id_from"].to_numpy(np.int64),
                "id_to": j["id_to"].to_numpy(np.int64),
                "boundary": j["key"],
            }
        )

    return (
        docs.map_batches(postings, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pandas")
    )


_KCORE_K = 3  # minimum surviving degree
_KCORE_ROUNDS = 8  # bounded peel rounds (fixpoint at 6 on the test corpus)
_KCORE_BROADCAST_GATE = 64 << 20  # survivor-panel bytes above which the
# filter runs as two bucketed semi-joins instead of a broadcast


def q_kcore_nodes(sf_dir: str, _gate_bytes: int = _KCORE_BROADCAST_GATE):
    """k-core decomposition (k = 3, bounded 8-round peel) of the LSH
    candidate graph — the spam/boilerplate diagnostic for closure
    clustering: dense cores are near-cliques (true duplicate groups or
    template farms); everything peeled away is chain/bridge structure
    that transitive closure would over-merge. Complements PageRank
    (fixed-round value iteration) and CC (label fixpoint) with the
    third iterative-graph shape: MONOTONE SHRINKING fixpoint, where
    each round's work is bounded by the previous round's survivors.

    Peeling is distributed and monotone: the symmetrized candidate
    edge panel (same band→bucket→run-length-triu shape as
    ``minhash_cluster_ids``, deduped per pair-hash bucket) lands
    hash-bucketed; each round computes per-node degree with a
    single-key count, keeps nodes with deg ≥ k, and filters edges to
    surviving endpoints — survivor ids broadcast as one sorted int64
    array under a byte gate (node-panel-sized, the PageRank rank-panel
    assumption), or via two bucketed ``pinned_join`` semi-joins above
    it. The loop stops early at fixpoint (edge count unchanged);
    because peeling is monotone, rounds past fixpoint are no-ops, so
    the FIXED 8-round unrolled MATERIALIZED-CTE oracle is exact
    whenever fixpoint ≤ 8 (the corpus reaches it at 6; a deeper chain
    would need a taller unroll, never a semantic change). Output: one
    row per surviving node with its in-core degree.

    Reference analogue: T4's candidate caps prune the same
    low-evidence structure blindly; the core is the principled cut.
    """
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit_keys(t: pa.Table) -> pa.Table:
        ids, _bands, keys = _mh_band_rows(t)
        kb = (splitmix64(keys) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "kb": pa.array(kb),
                "key": pa.array(keys.view(np.int64)),
                "doc_id": pa.array(ids),
            }
        )

    def key_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["key", "doc_id"]].drop_duplicates().sort_values(["key", "doc_id"])
        ky = d["key"].to_numpy(np.int64)
        ids = d["doc_id"].to_numpy(np.int64)
        starts = np.flatnonzero(np.concatenate([[True], ky[1:] != ky[:-1]]))
        lens = np.diff(np.append(starts, len(ky)))
        out_a: list = []
        out_b: list = []
        for s in np.unique(lens):
            if s < 2:
                continue
            sel = starts[lens == s]
            block = ids[sel[:, None] + np.arange(s)[None, :]]
            iu, ju = np.triu_indices(int(s), k=1)
            out_a.append(block[:, iu].ravel())
            out_b.append(block[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "pb": pd.Series([], dtype=np.int64),
                    "s1": pd.Series([], dtype=np.int64),
                    "s2": pd.Series([], dtype=np.int64),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        df = pd.DataFrame({"s1": a, "s2": b}).drop_duplicates()
        pb = (
            splitmix64(
                df["s1"].to_numpy(np.int64).view(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                ^ df["s2"].to_numpy(np.int64).view(np.uint64)
            )
            % np.uint64(nparts)
        ).astype(np.int64)
        df.insert(0, "pb", pb)
        return df

    def symmetrize(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["s1", "s2"]].drop_duplicates()
        a = d["s1"].to_numpy(np.int64)
        b = d["s2"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "u": np.concatenate([a, b]),
                "v": np.concatenate([b, a]),
            }
        )

    edges = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_keys, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("kb")
        .map_groups(key_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(symmetrize, batch_format="pandas")
        .materialize()
    )

    if edges.size_bytes() <= _gate_bytes:
        # driver peel under the byte gate: the loop's cost on a small
        # panel is EXECUTION COUNT, not data — the former per-round
        # count()/groupby/materialize chain paid ~30 Ray executions
        # (~20 s of fixed overhead at sf0.1 for a graph that fits in
        # one numpy array). Same monotone peel, vectorized: dense-index
        # nodes, bincount degrees, boolean survivor masks. The
        # distributed path below stays the above-gate fallback
        # (identical output — same fixpoint, pinned by the oracle).
        us, vs = [], []
        for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            us.append(np.asarray(b["u"], dtype=np.int64))
            vs.append(np.asarray(b["v"], dtype=np.int64))
        u = np.concatenate(us) if us else np.array([], dtype=np.int64)
        v = np.concatenate(vs) if vs else np.array([], dtype=np.int64)
        nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
        ui, vi = inv[: u.size], inv[u.size:]
        alive_edges = np.ones(u.size, dtype=bool)
        for _ in range(_KCORE_ROUNDS):
            if not alive_edges.any():
                break
            deg = np.bincount(ui[alive_edges], minlength=nodes.size)
            keep_node = deg >= _KCORE_K
            new_alive = alive_edges & keep_node[ui] & keep_node[vi]
            if new_alive.sum() == alive_edges.sum():
                break  # fixpoint
            alive_edges = new_alive
        deg = np.bincount(ui[alive_edges], minlength=nodes.size)
        sel = np.flatnonzero(deg > 0)
        return pa.table(
            {
                "doc_id": pa.array(nodes[sel]),
                "core_deg": pa.array(deg[sel].astype(np.int64)),
            }
        )

    for _ in range(_KCORE_ROUNDS):
        n_edges = edges.count()
        if n_edges == 0:
            break
        deg = (
            edges.groupby("u").aggregate(Count(alias_name="deg")).materialize()
        )
        surv = deg.filter(expr=f"deg >= {_KCORE_K}").materialize()
        if surv.count() == deg.count():
            break  # fixpoint: every node already satisfies k
        if surv.size_bytes() <= _gate_bytes:
            parts = [
                np.asarray(b["u"]).astype(np.int64)
                for b in surv.iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
            ]
            ids = np.sort(np.concatenate(parts)) if parts else np.array([], np.int64)
            ref = ray.put(ids)

            def keep(t: pa.Table, _ref=ref) -> pa.Table:
                s = ray.get(_ref)
                u = np.asarray(t["u"], dtype=np.int64)
                v = np.asarray(t["v"], dtype=np.int64)
                if not len(s):
                    return t.filter(pa.array(np.zeros(len(u), bool)))

                def isin(x):
                    p = np.clip(np.searchsorted(s, x), 0, len(s) - 1)
                    return s[p] == x

                return t.filter(pa.array(isin(u) & isin(v)))

            edges = edges.map_batches(
                keep, batch_format="pyarrow", zero_copy_batch=True
            ).materialize()
        else:
            # node panel exceeds the broadcast budget: two bucketed
            # semi-joins (u then v) — the reduce-side verify-join shape
            ku = project(surv, {"u": "ku"})
            edges = pinned_join(
                edges, ku, on="u", right_on="ku", num_partitions=nparts
            )
            edges = pinned_join(
                edges, ku, on="v", right_on="ku", num_partitions=nparts
            ).materialize()

    return (
        edges.groupby("u")
        .aggregate(Count(alias_name="core_deg"))
        .map_batches(
            lambda t: pa.table(
                {
                    "doc_id": pc.cast(t["u"], pa.int64()),
                    "core_deg": pc.cast(t["core_deg"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        .sort("doc_id")
    )


_TFIDF_DF_LO = 2  # candidate-blocking df window (rare-term prefix filter)
_TFIDF_DF_HI = 20
_TFIDF_IDF_SCALE = 10_000  # integer idf: w = tf * (SCALE // df)
_TFIDF_MAX_PAIRS = 20_000  # deterministic candidate cap (ORDER BY a, b)
_TFIDF_COS_NUM = 25  # is_sim <=> cos >= 0.4 <=> 25*cross^2 >= 4*n2a*n2b
_TFIDF_COS_DEN = 4


def q_tfidf_cosine_pairs(sf_dir: str):
    """TF-IDF-weighted cosine similarity self-join over token BIGRAMS —
    the classic sparse-vector similarity join (Bayardo et al.'s
    all-pairs shape) beside the repo's set similarities (Jaccard =
    ``ngram_jaccard_stats``, Dice = ``token_set_pairs``): weights damp
    boilerplate terms, so two docs match on DISTINCTIVE shared phrasing
    rather than raw overlap. Everything is exact integer arithmetic —
    w = tf · (10000 // df) (floor-division idf), and the cosine
    threshold cos ≥ 0.4 is decided as 25·cross² ≥ 4·‖a‖²·‖b‖² (cross ≥ 0
    for non-negative weights), so there is no float anywhere and the
    DuckDB twin is hash-exact in HUGEINT.

    Shape: one corpus pass emits per-doc bigram tf postings (tf is
    complete within the row — no pre-shuffle combine needed); ONE
    term-key shuffle computes df inside the group and emits weighted
    postings; candidates block on RARE terms only (2 ≤ df ≤ 20 — the
    prefix-filter idea: a pair is a candidate only if it shares a
    discriminative term), deduped per pair-hash bucket, globally
    ordered and capped at 20k pairs (panel-sized sort). The candidate
    docs' weighted vectors broadcast via ``ray.put`` — bounded by the
    pair cap, the rescore-band assumption — and pairs score in
    ``map_batches`` with vectorized sorted-array intersections.
    Reference analogue: the inverted-index Dice gate
    (``fuzz/inexus_parser.py:2829-2878``) is the unweighted version of
    this blocking."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def postings(t: pa.Table) -> pa.Table:
        from collections import Counter

        docs: list = []
        terms: list = []
        tfs: list = []
        for d, text in zip(
            np.asarray(t["doc_id"], dtype=np.int64), t["text"].to_pylist()
        ):
            toks = _ws_tokens(text)
            # parity with the oracle's len(w) >= 2 AND w[1] <> '' guard
            if len(toks) < 2 or toks[0] == "":
                continue
            c = Counter(
                toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
            )
            docs.extend([int(d)] * len(c))
            terms.extend(c.keys())
            tfs.extend(c.values())
        return pa.table(
            {
                "doc_id": pa.array(docs, type=pa.int64()),
                "term": pa.array(terms, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
            }
        )

    def add_w(g: pd.DataFrame) -> pd.DataFrame:
        # rows are distinct (doc, term): group size IS the df
        df = len(g)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "w": g["tf"].to_numpy(np.int64) * (_TFIDF_IDF_SCALE // df),
                "df": np.int64(df),
                "term": g["term"],
            }
        )

    posted = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True
    )
    wdf = (
        posted.groupby("term")
        .map_groups(add_w, batch_format="pandas")
        .materialize()
    )

    def rare_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy(np.int64))
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "pb": pd.Series([], dtype=np.int64),
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                }
            )
        iu, ju = np.triu_indices(len(ids), k=1)
        a, b = ids[iu], ids[ju]
        pb = (
            splitmix64(
                a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                ^ b.view(np.uint64)
            )
            % np.uint64(nparts)
        ).astype(np.int64)
        return pd.DataFrame({"pb": pb, "doc_a": a, "doc_b": b})

    cand = (
        wdf.filter(expr=f"df >= {_TFIDF_DF_LO} and df <= {_TFIDF_DF_HI}")
        .groupby("term")
        .map_groups(rare_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(
            lambda g: g[["doc_a", "doc_b"]].drop_duplicates(),
            batch_format="pandas",
        )
        .sort(["doc_a", "doc_b"])
        .limit(_TFIDF_MAX_PAIRS)
        .materialize()
    )
    cand_pd = cand.to_pandas()  # capped pair panel — driver-sized by rule
    if len(cand_pd) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "cross_w": pa.array([], type=pa.int64()),
                "is_sim": pa.array([], type=pa.int64()),
            }
        )
    need = np.unique(
        np.concatenate(
            [cand_pd["doc_a"].to_numpy(np.int64), cand_pd["doc_b"].to_numpy(np.int64)]
        )
    )
    need_ref = ray.put(need)

    def keep_vecs(t: pa.Table) -> pa.Table:
        s = ray.get(need_ref)
        d = np.asarray(t["doc_id"], dtype=np.int64)
        p = np.clip(np.searchsorted(s, d), 0, len(s) - 1)
        return t.filter(pa.array(s[p] == d))

    slab = pa.concat_tables(
        wdf.select_columns(["doc_id", "term", "w"])
        .map_batches(keep_vecs, batch_format="pyarrow", zero_copy_batch=True)
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    vecs: dict[int, tuple] = {}
    s_doc = np.asarray(slab["doc_id"]).astype(np.int64)
    s_term = np.asarray(slab["term"].to_pandas(), dtype=object)
    s_w = np.asarray(slab["w"]).astype(np.int64)
    order = np.argsort(s_doc, kind="stable")
    s_doc, s_term, s_w = s_doc[order], s_term[order], s_w[order]
    starts = np.flatnonzero(np.concatenate([[True], s_doc[1:] != s_doc[:-1]]))
    bounds = np.append(starts, len(s_doc))
    for si, ei in zip(bounds[:-1], bounds[1:]):
        terms_i = s_term[si:ei].astype(str)
        w_i = s_w[si:ei]
        o = np.argsort(terms_i, kind="stable")
        vecs[int(s_doc[si])] = (
            terms_i[o],
            w_i[o],
            int((w_i.astype(object) ** 2).sum()),
        )
    vec_ref = ray.put(vecs)

    def score(t: pa.Table) -> pa.Table:
        v = ray.get(vec_ref)
        a = np.asarray(t["doc_a"], dtype=np.int64)
        b = np.asarray(t["doc_b"], dtype=np.int64)
        cross = np.empty(len(a), dtype=np.int64)
        sim = np.empty(len(a), dtype=np.int64)
        for i in range(len(a)):
            ta, wa, na2 = v[int(a[i])]
            tb, wb, nb2 = v[int(b[i])]
            _, ia, ib = np.intersect1d(
                ta, tb, assume_unique=True, return_indices=True
            )
            c = int((wa[ia].astype(object) * wb[ib]).sum()) if len(ia) else 0
            cross[i] = c
            sim[i] = int(
                _TFIDF_COS_NUM * c * c >= _TFIDF_COS_DEN * na2 * nb2
            )
        return pa.table(
            {
                "doc_a": t["doc_a"],
                "doc_b": t["doc_b"],
                "cross_w": pa.array(cross),
                "is_sim": pa.array(sim),
            }
        )

    return cand.map_batches(
        score, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).sort(["doc_a", "doc_b"])


def q_one_to_one_match(sf_dir: str):
    """Distributed 1-to-1 entity matching (mutual best match): enforce
    a one-to-one assignment over a blocked candidate-pair set — the
    post-scoring step record-linkage systems run when each entity may
    match at most one counterpart (the reference resolves each input to
    exactly one gazetteer node, ``fuzz/inexus_parser.py:2929-2945``;
    this is the symmetric two-sided analogue). Blocks are
    (lang, n_chars // 64); within a block every doc pair is a candidate
    scored by |len_a - len_b| (lower = better; bucket width bounds the
    score to [0, 63]), each doc's best partner is the (score,
    partner_id)-argmin, and a pair survives iff the choice is MUTUAL.
    Because a doc's candidates all live in its own block, candidate
    generation, per-doc argmin AND the mutuality check are co-located:
    ONE shuffle total (the block groupby). Argmin is vectorized as a
    single int64 composite key (score << 32 | partner_id — score < 64
    and ids < 2^32 by contract). At 100 TB, block size is bounded by
    the blocking key's selectivity; oversized blocks would take the
    same deterministic cap used in ``stages/blocking.py``."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def add_block(t: pa.Table) -> pa.Table:
        import hashlib

        lang = t["lang"].to_pylist()
        n = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        bkt = n // 64
        keys = [f"{la}:{b}" for la, b in zip(lang, bkt)]
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(
                        k.encode("utf-8"), digest_size=8
                    ).digest(),
                    "little",
                )
                for k in keys
            ),
            dtype=np.uint64,
            count=len(keys),
        )
        return pa.table(
            {
                "bb": pa.array(
                    (splitmix64(h) % np.uint64(nparts)).astype(np.int64)
                ),
                "lang": t["lang"],
                "bkt": pa.array(bkt),
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n),
            }
        )

    def match_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a: list = []
        out_b: list = []
        out_d: list = []
        out_l: list = []
        for (lang, _bkt), blk in g.groupby(["lang", "bkt"], sort=False):
            ids = blk["doc_id"].to_numpy(np.int64)
            lens = blk["n_chars"].to_numpy(np.int64)
            s = len(ids)
            if s < 2:
                continue
            order = np.argsort(ids, kind="stable")
            ids, lens = ids[order], lens[order]
            # composite argmin key: |len diff| (< 64 by bucket width)
            # in the high bits, partner doc_id in the low 32
            diff = np.abs(lens[:, None] - lens[None, :])
            key = (diff.astype(np.int64) << np.int64(32)) | ids[None, :]
            np.fill_diagonal(key, np.iinfo(np.int64).max)
            best = np.argmin(key, axis=1)
            mutual = (best[best] == np.arange(s)) & (np.arange(s) < best)
            idx = np.flatnonzero(mutual)
            if len(idx):
                out_a.append(ids[idx])
                out_b.append(ids[best[idx]])
                out_d.append(diff[idx, best[idx]])
                out_l.extend([lang] * len(idx))
        if not out_a:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                    "len_diff": pd.Series([], dtype=np.int64),
                    "lang": pd.Series([], dtype=object),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "len_diff": np.concatenate(out_d).astype(np.int64),
                "lang": np.asarray(out_l, dtype=object),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(add_block, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bb")
        .map_groups(match_bucket, batch_format="pandas")
        .materialize()
    )
    if out.count() == 0:
        return pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("len_diff", pa.int64()),
                ("lang", pa.string()),
            ]
        ).empty_table()
    return out.sort(["doc_a", "doc_b"])


def _tok_h64(s: str) -> int:
    """blake2b-8 of a token/pair key as uint64 (bucket hashing)."""
    import hashlib

    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def q_prefix_filter_pairs(sf_dir: str):
    """Prefix-filtered threshold similarity self-join (AllPairs /
    PPJoin, Bayardo et al. WWW'07): find ALL doc pairs whose distinct
    word-4-GRAM shingle sets have Jaccard >= 1/2, generating candidates
    from PREFIX postings only.  Shingles get a global rare-first order
    (df asc, shingle asc); a doc with n shingles posts only its first
    n - ceil(t*n) + 1 shingles under that order — the classic guarantee
    that any pair meeting the threshold shares a prefix shingle.  A
    length filter (min >= t*max) prunes cross-size candidates at
    emission.

    Scale shape: postings carry ONLY (tok, doc_id, ntok) — never the
    shingle payload — so the token shuffle is id-sized; candidate pairs
    dedup in pair-hash buckets; exact Jaccard is then verified by
    re-joining each side's shingle set from a one-row-per-doc side
    table (two ``pinned_join`` passes — the ``residual_tokens`` idiom),
    touching only docs that survived the filter.  The df order panel is
    vocabulary-sized and ships as sorted arrays probed with
    ``searchsorted`` (no per-row dict lookups).  Jaccard is reported in
    integer micro units (ni*10^6 // union) — hash-exact in SQL; the
    oracle is the direct quadratic join, so parity also proves the
    prefix filter's COMPLETENESS (no threshold pair missed), the strong
    claim of Bayardo et al.  Reference analogue: candidate-set
    reduction before exact scoring (fuzz/inexus_parser.py:886-905).
    Tokenizes with ASCII ``\\s+`` to pin oracle parity (see
    doc_chunks)."""
    import math
    import re as _re

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions, pinned_join

    nparts = default_num_partitions()
    T_NUM, T_DEN = 1, 2  # Jaccard threshold 1/2
    W = 4  # word-shingle width
    ws_re = _re.compile(r"\s+", _re.ASCII)

    def _shingles(text: str) -> list:
        ws = [w for w in ws_re.split(text or "") if w]
        return sorted({" ".join(ws[i : i + W]) for i in range(len(ws) - W + 1)})

    def shingle_sets(t: pa.Table) -> pa.Table:
        ids: list = []
        joined: list = []
        ns: list = []
        for did, tx in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            s = _shingles(tx)
            if not s:
                continue
            ids.append(did)
            joined.append("\x00".join(s))
            ns.append(len(s))
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "toks": pa.array(joined, type=pa.string()),
                "ntok": pa.array(np.asarray(ns, dtype=np.int64)),
            }
        )

    sets = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(shingle_sets, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()  # consumed 3× (df pass, postings, verify joins)
    )

    def df_partial(t: pa.Table) -> pa.Table:
        toks = np.concatenate(
            [np.array(s.split("\x00"), dtype=object) for s in t["toks"].to_pylist()]
        ) if len(t) else np.array([], dtype=object)
        u, c = np.unique(toks, return_counts=True)
        h = np.fromiter(
            (_tok_h64(x) for x in u), dtype=np.uint64, count=len(u)
        )
        return pa.table(
            {
                "tok": pa.array(u, type=pa.string()),
                "df": pa.array(c.astype(np.int64)),
                "tb": pa.array(
                    (splitmix64(h) % np.uint64(nparts)).astype(np.int64)
                ),
            }
        )

    def df_combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("tok", sort=False)["df"].sum()
        return pd.DataFrame(
            {"tok": c.index.to_numpy(object), "df": c.to_numpy(np.int64)}
        )

    # global rare-first shingle order as broadcast SORTED arrays: per-batch
    # partial df counts, bucketed combine; probed via searchsorted below
    df_tbl = (
        sets.map_batches(df_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(df_combine, batch_format="pandas")
        .to_pandas()
    )
    df_tbl = df_tbl.sort_values("tok", kind="stable")
    tok_sorted = df_tbl["tok"].to_numpy(object)
    rank_of = (
        df_tbl.reset_index(drop=True)
        .sort_values(["df", "tok"], kind="stable")
        .index.to_numpy(np.int64)
    )
    rank_arr = np.empty(len(rank_of), dtype=np.int64)
    rank_arr[rank_of] = np.arange(len(rank_of), dtype=np.int64)
    toks_ref = ray.put(tok_sorted)
    rank_ref = ray.put(rank_arr)

    def prefix_postings(t: pa.Table) -> pa.Table:
        tok_s = ray.get(toks_ref)
        rk = ray.get(rank_ref)
        out_tok: list = []
        out_id: list = []
        out_n: list = []
        for did, joined, n in zip(
            t["doc_id"].to_pylist(), t["toks"].to_pylist(), t["ntok"].to_pylist()
        ):
            ts = np.array(joined.split("\x00"), dtype=object)
            r = rk[np.searchsorted(tok_s, ts)]
            plen = n - math.ceil(T_NUM * n / T_DEN) + 1
            pref = ts[np.argsort(r, kind="stable")[:plen]]
            out_tok.extend(pref.tolist())
            out_id.extend([did] * len(pref))
            out_n.extend([n] * len(pref))
        return pa.table(
            {
                "tok": pa.array(out_tok, type=pa.string()),
                "doc_id": pa.array(out_id, type=pa.int64()),
                "ntok": pa.array(np.asarray(out_n, dtype=np.int64)),
            }
        )

    def add_tb(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (_tok_h64(x) for x in t["tok"].to_pylist()),
            dtype=np.uint64,
            count=len(t),
        )
        return t.append_column(
            "tb",
            pa.array((splitmix64(h) % np.uint64(nparts)).astype(np.int64)),
        )

    def cand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g.sort_values(["tok", "doc_id"], kind="stable")
        toks = d["tok"].to_numpy(object)
        ids = d["doc_id"].to_numpy(np.int64)
        nt = d["ntok"].to_numpy(np.int64)
        new = np.concatenate([[True], toks[1:] != toks[:-1]])
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(toks)))
        a_l: list = []
        b_l: list = []
        for st, ln in zip(starts, lens):
            if ln < 2:
                continue
            for i in range(st, st + ln):
                for j in range(i + 1, st + ln):
                    na, nb = int(nt[i]), int(nt[j])
                    # length filter: J>=t requires min >= t*max
                    if T_NUM * max(na, nb) > T_DEN * min(na, nb):
                        continue
                    a_l.append(int(ids[i]))
                    b_l.append(int(ids[j]))
        out = pd.DataFrame(
            {
                "doc_a": pd.Series(a_l, dtype=np.int64),
                "doc_b": pd.Series(b_l, dtype=np.int64),
            }
        )
        ph = np.fromiter(
            (_tok_h64(f"{a}\x00{b}") for a, b in zip(a_l, b_l)),
            dtype=np.uint64,
            count=len(a_l),
        )
        out["pb"] = (splitmix64(ph) % np.uint64(nparts)).astype(np.int64)
        return out

    def dedup_pairs(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]

    pairs = (
        sets.map_batches(
            prefix_postings, batch_format="pyarrow", zero_copy_batch=True
        )
        .map_batches(add_tb, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(cand_pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(dedup_pairs, batch_format="pandas")
        .materialize()
    )
    empty = pa.schema(
        [
            ("doc_a", pa.int64()),
            ("doc_b", pa.int64()),
            ("ni", pa.int64()),
            ("na", pa.int64()),
            ("nb", pa.int64()),
            ("jacc_micro", pa.int64()),
        ]
    ).empty_table()
    if pairs.count() == 0:
        return empty

    # verify: re-join each side's shingle set by id (only surviving docs
    # travel), then one vectorized-set pass per pair
    wa = pinned_join(pairs, sets, on="doc_a", right_on="doc_id")
    wb = pinned_join(wa, sets, on="doc_b", right_on="doc_id")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        na_l: list = []
        nb_l: list = []
        ni_l: list = []
        for ta, tb_ in zip(g["toks"], g["toks_r"]):
            sa = ta.split("\x00")
            sb = set(tb_.split("\x00"))
            na_l.append(len(sa))
            nb_l.append(len(sb))
            ni_l.append(sum(1 for w in sa if w in sb))
        na = np.asarray(na_l, dtype=np.int64)
        nb = np.asarray(nb_l, dtype=np.int64)
        ni = np.asarray(ni_l, dtype=np.int64)
        un = na + nb - ni
        keep = T_DEN * ni >= T_NUM * un
        return pd.DataFrame(
            {
                "doc_a": g["doc_a"].to_numpy(np.int64)[keep],
                "doc_b": g["doc_b"].to_numpy(np.int64)[keep],
                "ni": ni[keep],
                "na": na[keep],
                "nb": nb[keep],
                "jacc_micro": ni[keep] * 1_000_000 // un[keep],
            }
        )

    out = wb.map_batches(verify, batch_format="pandas").materialize()
    if out.count() == 0:
        return empty
    return out.select_columns(
        ["doc_a", "doc_b", "ni", "na", "nb", "jacc_micro"]
    ).sort(["doc_a", "doc_b"])


_LATE_DELAY_US = 900_000_000  # watermark delay: 15 min
_LATE_JITTER_US = 7_200_000_000  # simulated network delay: up to 2 h


def q_late_event_stats(sf_dir: str):
    """Event-time watermark audit — the late-data accounting every
    streaming pipeline needs before choosing a watermark delay (Dataflow
    model, Akidau et al. VLDB'15).  The source table is perfectly
    time-ordered, so arrival disorder is SIMULATED deterministically:
    arrival time = event time + splitmix64(event_id) % 2 h (a bounded
    per-event network delay; ties broken by event_id).  The watermark
    seen by an event is the running max event-time of all PRIOR
    arrivals for that user minus a 15-minute allowed delay; an event is
    LATE iff its event-time falls below that watermark (it would have
    been dropped / sent to a side output).  Users are hash-bucketed
    (the ``user_sessions`` partitioning assumption: one bucket holds a
    user), per-bucket running max + shift are cythonized pandas
    kernels, and only a (event_type × buckets) partial panel shuffles
    to the final combine.  Output per event_type: event count, late
    count, and the worst lateness in µs — the exact curve you read to
    size the delay.  Reference analogue: the per-record time budget
    that decides when a slow parse is abandoned
    (hcmut_assigment/main.py:620-621)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_id", "ts", "event_type"],
    ).map_batches(_add_user_bucket(nparts), batch_format="pyarrow")

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        eid = g["event_id"].to_numpy(np.int64)
        jit = (
            splitmix64(eid.view(np.uint64)) % np.uint64(_LATE_JITTER_US)
        ).astype(np.int64)
        g = g.assign(arr=g["ts"].to_numpy().view("i8") + jit)
        d = g.sort_values(["user_id", "arr", "event_id"], kind="stable").reset_index(
            drop=True
        )
        t = pd.Series(d["ts"].to_numpy().view("i8"))
        cm = t.groupby(d["user_id"], sort=False).cummax()
        wm = cm.groupby(d["user_id"], sort=False).shift(1)
        lateness = (wm - _LATE_DELAY_US - t).clip(lower=0).fillna(0)
        out = pd.DataFrame(
            {
                "event_type": d["event_type"],
                "one": np.ones(len(d), dtype=np.int64),
                "late": (lateness > 0).to_numpy(dtype=np.int64),
                "lat": lateness.to_numpy(dtype=np.int64),
            }
        )
        p = out.groupby("event_type", sort=False).agg(
            n_events=("one", "sum"), n_late=("late", "sum"), mx=("lat", "max")
        )
        return p.reset_index()

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_events": np.array([g["n_events"].sum()], dtype=np.int64),
                "n_late": np.array([g["n_late"].sum()], dtype=np.int64),
                "max_lateness_us": np.array([g["mx"].max()], dtype=np.int64),
            }
        )

    return (
        ev.groupby("bucket")
        .map_groups(bucket_partial, batch_format="pandas")
        .groupby("event_type")
        .map_groups(combine, batch_format="pandas")
        .sort("event_type")
    )


_TRIGRAM_QUERY = "merge part"


def q_trigram_search(sf_dir: str):
    """Trigram-indexed substring search — the Google-Code-Search shape
    (Cox, 2012): a substring query is answered by AND-ing the posting
    lists of the query's character trigrams (a candidate must contain
    EVERY query trigram), then exact-verifying only the candidates.
    Here the index probe is fused into the scan: per batch, 8 vectorized
    ``str.contains`` passes (one per distinct query trigram, plain-text
    match) build the presence conjunction, and the exact ``str.count``
    runs only on surviving rows — the persisted-index variant writes the
    (gram, doc_id) postings once (see ``inverted_index``) and probes
    them per query, which is what a 100-TB code-search deployment does.
    Oracle parity against the direct ``position(q IN text)`` scan proves
    the trigram filter's COMPLETENESS (it can never miss a true match —
    every occurrence contains all its trigrams).  Occurrence counts are
    non-overlapping left-to-right on both sides (str.count == the
    replace-length arithmetic).  Reference analogue: n-gram inverted
    index consulted before exact scoring
    (fuzz/inexus_parser.py:886-905)."""
    Q = _TRIGRAM_QUERY
    qgrams = sorted({Q[i : i + 3] for i in range(len(Q) - 2)})

    def search(df: pd.DataFrame) -> pd.DataFrame:
        txt = df["text"].fillna("")
        mask = np.ones(len(df), dtype=bool)
        for g in qgrams:  # trigram AND-filter: all postings must hit
            mask &= txt.str.contains(g, regex=False).to_numpy()
            if not mask.any():
                break
        cand = txt[mask]
        n_occ = np.fromiter(
            (t.count(Q) for t in cand), dtype=np.int64, count=len(cand)
        )
        keep = n_occ > 0
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[mask][keep],
                "n_occurrences": n_occ[keep],
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(search, batch_format="pandas")
        .sort("doc_id")
    )


_RDV_N1, _RDV_N2 = 16, 20  # cluster sizes before/after scale-out


def q_rendezvous_rebalance(sf_dir: str):
    """Rendezvous (highest-random-weight) shard assignment + elastic
    rebalance audit — how a fixed-size cluster grows without reshuffling
    the world (Thaler & Ravishankar '96; the consistent-hashing family).
    Every key's shard under N nodes is argmax over nodes of
    splitmix64(splitmix64(key) XOR splitmix64(node)) (ties → lowest
    node).  The audit assigns orders keys under 16 and under 20 nodes in
    ONE vectorized pass (a (batch × 20) weight matrix per batch; the
    first 16 columns ARE the 16-node weights, so both assignments share
    one matrix) and emits per-(old, new) partial counts — a ≤16×20
    panel per batch, folded on the driver.  Output per node: key count
    under 16, under 20, and keys that MOVED IN — nonzero only for nodes
    16-19 (the HRW minimal-disruption property, visible in the data:
    exactly the ~4/20 expected mass moves, none between old nodes).
    Reference analogue: stable cluster-id remapping across gazetteer
    rebuilds (fuzz/inexus_parser.py:1121-1190)."""
    from address_parser_ray.functions.hashing import splitmix64

    node_h = splitmix64(np.arange(_RDV_N2, dtype=np.uint64))  # (20,)

    def partials(t: pa.Table) -> pa.Table:
        k = splitmix64(
            np.asarray(t["o_orderkey"], dtype=np.int64).view(np.uint64)
        )
        w = splitmix64(k[:, None] ^ node_h[None, :])  # (rows, 20)
        a20 = np.argmax(w, axis=1).astype(np.int64)
        a16 = np.argmax(w[:, :_RDV_N1], axis=1).astype(np.int64)
        pair = a16 * _RDV_N2 + a20
        u, c = np.unique(pair, return_counts=True)
        return pa.table(
            {
                "n16": pa.array(u // _RDV_N2),
                "n20": pa.array(u % _RDV_N2),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey"]
        )
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # ≤ blocks × 320 rows
    )
    g = panel.groupby(["n16", "n20"], sort=False)["cnt"].sum().reset_index()
    nodes = np.arange(_RDV_N2, dtype=np.int64)
    under16 = np.zeros(_RDV_N2, dtype=np.int64)
    under20 = np.zeros(_RDV_N2, dtype=np.int64)
    moved_in = np.zeros(_RDV_N2, dtype=np.int64)
    for n16, n20, cnt in zip(g["n16"], g["n20"], g["cnt"]):
        under16[n16] += cnt
        under20[n20] += cnt
        if n16 != n20:
            moved_in[n20] += cnt
    return pd.DataFrame(
        {
            "node": nodes,
            "n_under_16": under16,
            "n_under_20": under20,
            "n_moved_in": moved_in,
        }
    )


_RPB_PARTS = 16  # target range partitions


def q_range_partition_balance(sf_dir: str):
    """Range-partitioner boundary planning — the split-point computation
    every distributed sort / range shuffle runs before moving a byte
    (Spark's RangePartitioner, the plan step of Ray Data's own sort).
    Pass 1 builds an exact (key, count) histogram of ``o_custkey`` with
    per-batch partial counts combined in hash buckets (the panel is
    distinct-key-sized; for unbounded key domains swap in the
    ``q_quantile_sketch`` bracketing summary — same two-pass shape).
    Boundaries are the keys at ranks ceil(i*n/B), i = 1..B-1 (DuckDB's
    ``quantile_disc`` rank rule, integer arithmetic on both sides),
    deduplicated so a hot key never splits.  Pass 2 broadcasts the tiny
    boundary array and assigns every row with one vectorized
    ``searchsorted`` (side='right': partition = #{bounds <= key}),
    aggregating (n_rows, key_min, key_max) per partition from per-batch
    partials.  The output exposes the skew a planner would act on:
    partitions are row-balanced only up to the hottest key's mass.
    Reference analogue: candidate-list budget splitting before scoring
    (fuzz/inexus_parser.py:2829-2878)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    B = _RPB_PARTS

    def key_counts(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"key": t["o_custkey"]})
            .group_by("key")
            .aggregate([("key", "count")])
        )
        k = np.asarray(g["key"], dtype=np.int64)
        return pa.table(
            {
                "key": pa.array(k),
                "cnt": pc.cast(g["key_count"], pa.int64()),
                "tb": pa.array(
                    (
                        splitmix64(k.view(np.uint64))
                        % np.uint64(nparts)
                    ).astype(np.int64)
                ),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("key", sort=False)["cnt"].sum()
        return pd.DataFrame(
            {"key": c.index.to_numpy(np.int64), "cnt": c.to_numpy(np.int64)}
        )

    hist = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .map_batches(key_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
        .sort_values("key", kind="stable")
    )
    keys = hist["key"].to_numpy(np.int64)
    cum = hist["cnt"].to_numpy(np.int64).cumsum()
    n = int(cum[-1])
    # boundary_i = smallest key whose cumulative count reaches rank
    # ceil(i*n/B) == the key at that rank in the sorted multiset
    ranks = np.array([(i * n + B - 1) // B for i in range(1, B)], dtype=np.int64)
    bounds = np.unique(keys[np.searchsorted(cum, ranks, side="left")])
    bounds_ref = ray.put(bounds)

    def assign(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        k = np.asarray(t["o_custkey"], dtype=np.int64)
        p = np.searchsorted(b, k, side="right").astype(np.int64)
        order = np.argsort(p, kind="stable")
        ps, ks = p[order], k[order]
        new = np.concatenate([[True], ps[1:] != ps[:-1]])
        st = np.flatnonzero(new)
        ln = np.diff(np.append(st, len(ps)))
        return pa.table(
            {
                "partition_id": pa.array(ps[st]),
                "n_rows": pa.array(ln.astype(np.int64)),
                "key_min": pa.array(
                    np.minimum.reduceat(ks, st) if len(ks) else ks
                ),
                "key_max": pa.array(
                    np.maximum.reduceat(ks, st) if len(ks) else ks
                ),
            }
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_custkey"]
        )
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # ≤ (blocks × B) rows — planner-panel-sized
    )
    out = (
        panel.groupby("partition_id", sort=True)
        .agg(
            n_rows=("n_rows", "sum"),
            key_min=("key_min", "min"),
            key_max=("key_max", "max"),
        )
        .reset_index()
    )
    return out.astype(
        {
            "partition_id": "int64",
            "n_rows": "int64",
            "key_min": "int64",
            "key_max": "int64",
        }
    )


_ZM_HASH_BUCKETS = 64  # hash-layout bucket count
_ZM_LO = "1998-06-01"  # predicate window (inclusive)
_ZM_HI = "1998-06-30"


def q_zonemap_pruning(sf_dir: str):
    """Zone-map data-skipping audit — quantifies what partition layout
    buys a scan, the #1 cost lever at 100 TB (parquet row-group min/max
    stats, Iceberg/Delta file pruning).  Two physical layouts of
    ``orders`` are simulated: ``date_week`` (rows bucketed by
    ``epoch_day // 7`` — the classic time-partitioned table) and
    ``hash`` (rows bucketed by ``splitmix64(o_orderkey) % 64`` — a
    layout with no date locality).  For each, one vectorized pass emits
    per-(layout, bucket) partials (row count, min/max orderdate-day,
    predicate-match count); the combined panel is bucket-count-sized
    (weeks + 64 rows — at any corpus size), so it folds on the driver.
    A bucket must be READ iff its [min, max] zone intersects the
    predicate window [1998-06-01, 1998-06-30]; the output contrasts
    buckets/rows touched per layout against the true match count —
    date_week scans ~1/300th of what hash does for the same answer.
    Reference analogue: the prefix-indexed candidate lookup that avoids
    scanning the full gazetteer (fuzz/inexus_parser.py:886-905)."""
    from address_parser_ray.functions.hashing import splitmix64

    d_lo = int(np.datetime64(_ZM_LO, "D").astype(np.int64))
    d_hi = int(np.datetime64(_ZM_HI, "D").astype(np.int64))

    def partials(t: pa.Table) -> pa.Table:
        days = (
            np.asarray(t["o_orderdate"], dtype="datetime64[us]")
            .astype("datetime64[D]")
            .astype(np.int64)
        )
        okey = np.asarray(t["o_orderkey"], dtype=np.int64)
        match = ((days >= d_lo) & (days <= d_hi)).astype(np.int64)
        lays: list = []
        bks: list = []
        ns: list = []
        mins: list = []
        maxs: list = []
        nms: list = []
        for lay, bk in (
            ("date_week", days // 7),
            (
                "hash",
                (
                    splitmix64(okey.view(np.uint64))
                    % np.uint64(_ZM_HASH_BUCKETS)
                ).astype(np.int64),
            ),
        ):
            order = np.argsort(bk, kind="stable")
            b, d, m = bk[order], days[order], match[order]
            new = np.concatenate([[True], b[1:] != b[:-1]])
            st = np.flatnonzero(new)
            ln = np.diff(np.append(st, len(b)))
            lays += [lay] * len(st)
            bks.append(b[st])
            ns.append(ln.astype(np.int64))
            mins.append(np.minimum.reduceat(d, st))
            maxs.append(np.maximum.reduceat(d, st))
            nms.append(np.add.reduceat(m, st))
        return pa.table(
            {
                "layout": pa.array(lays, type=pa.string()),
                "bucket": pa.array(np.concatenate(bks)),
                "n": pa.array(np.concatenate(ns)),
                "dmin": pa.array(np.concatenate(mins)),
                "dmax": pa.array(np.concatenate(maxs)),
                "nmatch": pa.array(np.concatenate(nms)),
            }
        )

    panel = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
        )
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # ≤ blocks × (weeks + 64) rows
    )
    z = (
        panel.groupby(["layout", "bucket"], sort=False)
        .agg(
            n=("n", "sum"),
            dmin=("dmin", "min"),
            dmax=("dmax", "max"),
            nmatch=("nmatch", "sum"),
        )
        .reset_index()
    )
    rows = []
    for lay, g in z.groupby("layout", sort=True):
        touched = (g["dmax"] >= d_lo) & (g["dmin"] <= d_hi)
        rows.append(
            (
                lay,
                int(len(g)),
                int(touched.sum()),
                int(g.loc[touched, "n"].sum()),
                int(g["nmatch"].sum()),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "layout",
            "n_buckets",
            "buckets_touched",
            "rows_scanned",
            "rows_matched",
        ],
    ).astype(
        {
            "n_buckets": "int64",
            "buckets_touched": "int64",
            "rows_scanned": "int64",
            "rows_matched": "int64",
        }
    )


_KMVJ_K = 256  # join-estimator sketch size (distinct from _KMV_K = 64 above)


def q_kmv_join_estimate(sf_dir: str):
    """Sketch-based join-cardinality estimation — the planner statistic
    a distributed engine computes BEFORE choosing broadcast vs shuffle
    for a join (Beyer et al., SIGMOD'07 KMV synopses).  Each side's
    distinct-key set (orders.o_custkey, customer.c_custkey) is reduced
    to its k = 256 smallest splitmix64 hashes via per-batch min-k
    partials (one driver combine of a (blocks × k) panel — the
    ``_seed_centroids`` idiom; sketches merge associatively so the same
    partials tree-reduce on a cluster).  tau = k-th smallest of the
    merged sketch ⇒ |A ∪ B| ≈ (k-1)·2^64/tau; the intersection scales
    that by the fraction of sketch hashes below tau present in BOTH
    sketches.  Integer arithmetic end-to-end (Python bigint // on the
    Ray side, HUGEINT // in the oracle) makes the estimator hash-exact;
    the exact distinct counts ride along in the same row so the output
    doubles as an accuracy audit.  When the union has fewer than k
    distinct hashes the sketch IS the set and the estimate collapses to
    the exact count (the sf0.001 fixture exercises that branch; sf0.01
    exercises the estimator branch).  Reference analogue: candidate-set
    size heuristics gating the expensive scorer
    (fuzz/inexus_parser.py:2829-2878)."""
    from address_parser_ray.functions.hashing import splitmix64

    k = _KMVJ_K

    def side_sketch(path: str, col: str) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            h = np.unique(
                splitmix64(
                    np.asarray(t[col], dtype=np.int64).view(np.uint64)
                )
            )
            return pa.table({"h": pa.array(h[:k].view(np.int64))})

        panel = (
            ray.data.read_parquet(path, columns=[col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        h = np.unique(panel["h"].to_numpy(np.int64).view(np.uint64))
        return h[:k]

    ka = side_sketch(f"{sf_dir}/orders.parquet", "o_custkey")
    kb = side_sketch(f"{sf_dir}/customer.parquet", "c_custkey")
    u = np.unique(np.concatenate([ka, kb]))
    if len(u) >= k:
        tau = int(u[k - 1])
        est_union = (k - 1) * (1 << 64) // tau
        common = int(
            np.intersect1d(ka, kb, assume_unique=True).searchsorted(
                np.uint64(tau), side="right"
            )
        )
        est_inter = common * est_union // k
    else:
        # sketch saw every distinct hash — estimates are exact counts
        est_union = int(len(u))
        est_inter = int(len(np.intersect1d(ka, kb, assume_unique=True)))

    # exact twin (verification baseline; the sketch is the scale path)
    def keys_of(path: str, col: str) -> np.ndarray:
        def partial(t: pa.Table) -> pa.Table:
            return pa.table(
                {"key": pa.array(np.unique(np.asarray(t[col], dtype=np.int64)))}
            )

        panel = (
            ray.data.read_parquet(path, columns=[col])
            .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
        )
        return np.unique(panel["key"].to_numpy(np.int64))

    a_keys = keys_of(f"{sf_dir}/orders.parquet", "o_custkey")
    b_keys = keys_of(f"{sf_dir}/customer.parquet", "c_custkey")
    exact_union = int(len(np.union1d(a_keys, b_keys)))
    exact_inter = int(len(np.intersect1d(a_keys, b_keys, assume_unique=True)))
    return pd.DataFrame(
        {
            "k": [k],
            "est_union": [est_union],
            "est_inter": [est_inter],
            "exact_union": [exact_union],
            "exact_inter": [exact_inter],
        }
    ).astype("int64")


def q_scd2_temporal_join(sf_dir: str):
    """Temporal dimension join — attach to every fact event the
    dimension VERSION valid at event time (the consumption side of
    ``scd2_history``, which only builds intervals). The user dimension
    is derived from the stream itself: version 'new' from the user's
    first event (signup), version 'tenured' from signup + 30 days —
    a 2-row SCD2 history per user. Revenue rolls up per (tier,
    event_type).

    Shape: dimension history and facts co-partition on the SAME key
    (splitmix64(user_id) buckets), so the validity lookup runs entirely
    inside the bucket — the standard warehouse distribution for
    BETWEEN-style temporal joins (never a broadcast of a full dimension
    history, never an all-pairs range join). Here the history is
    derived in-bucket from the co-located facts (per-user min ts), so
    the whole op costs ONE single-key shuffle; with an external SCD2
    table the identical bucket layout applies with the history unioned
    into the same shuffle. Combine panel ≤ 2 × event_types rows.
    Integer epoch-µs arithmetic both sides (no interval/date functions
    with boundary-counting ambiguity). Full SQL oracle."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    _30D_US = np.int64(30 * 86_400_000_000)
    SEP = "\x1f"

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "bucket": (
                    splitmix64(uid.view(np.uint64)) % np.uint64(nparts)
                ).astype(np.int64),
                "user_id": uid,
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_type": df["event_type"],
                "cents": _cents(df["value"].to_numpy(np.float64)),
            }
        )

    def temporal_join(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts_us"].to_numpy(np.int64)
        signup = g.groupby("user_id")["ts_us"].transform("min").to_numpy(np.int64)
        tier = np.where(ts >= signup + _30D_US, "tenured", "new")
        out = (
            pd.DataFrame(
                {
                    "k": np.char.add(
                        np.char.add(tier.astype(str), SEP),
                        g["event_type"].to_numpy(str),
                    ),
                    "n_events": np.ones(len(g), dtype=np.int64),
                    "sum_cents": g["cents"].to_numpy(np.int64),
                }
            )
            .groupby("k", as_index=False)
            .sum()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        out["sum_cents"] = out["sum_cents"].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        tier, etype = g["k"].iloc[0].split(SEP)
        return pd.DataFrame(
            {
                "tier": [tier],
                "event_type": [etype],
                "n_events": np.array([g["n_events"].sum()], dtype=np.int64),
                "sum_cents": np.array([g["sum_cents"].sum()], dtype=np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_type", "value"],
        )
        .map_batches(emit, batch_format="pandas")
        .groupby("bucket")
        .map_groups(temporal_join, batch_format="pandas")
        .groupby("k")
        .map_groups(final, batch_format="pandas")
    )


def q_snapshot_diff(sf_dir: str):
    """Snapshot diff — classify every key of two table VERSIONS as
    added / deleted / changed / unchanged and roll counts up per lang
    (the table-format time-travel diff: Iceberg/Delta snapshot compare,
    and the validation step after any backfill). Version B is derived
    deterministically from the documents base: every 11th doc deleted,
    every 6th surviving doc changed (n_chars + 50), every 9th doc
    re-added as a NEW key (doc_id + 10^7).

    Shape: both sides emit (key-hash bucket, doc_id, side, fingerprint)
    rows in one pass each; the single-key bucket shuffle co-locates the
    two versions of a key and each bucket classifies via one sorted
    merge (searchsorted, no per-row Python), emitting a ≤ 4 × langs
    partial panel. At 10^12 rows: shuffle carries two id+fingerprint
    streams (16 B/row), never content — diffing by stored column stats
    or content hashes is the same mechanism with a different
    fingerprint column. Full SQL oracle (FULL OUTER JOIN + CASE)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    SEP = "\x1f"

    def emit_sides(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        lang = df["lang"].to_numpy(str)
        nc = df["n_chars"].to_numpy(np.int64)
        # side A: the base snapshot, verbatim
        a = pd.DataFrame({"doc_id": ids, "lang": lang, "fp": nc, "side": np.int64(0)})
        # side B: deterministic evolution of the same rows
        keep = ids % 11 != 0
        b_ids, b_lang, b_nc = ids[keep], lang[keep], nc[keep].copy()
        chg = b_ids % 6 == 0
        b_nc[chg] += 50
        new_mask = ids % 9 == 0
        b = pd.DataFrame(
            {
                "doc_id": np.concatenate([b_ids, ids[new_mask] + 10_000_000]),
                "lang": np.concatenate([b_lang, lang[new_mask]]),
                "fp": np.concatenate([b_nc, nc[new_mask]]),
                "side": np.int64(1),
            }
        )
        out = pd.concat([a, b], ignore_index=True)
        out["bucket"] = (
            splitmix64(out["doc_id"].to_numpy(np.int64).view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)
        return out

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        side = g["side"].to_numpy(np.int64)
        a, b = g[side == 0], g[side == 1]
        a_ids = a["doc_id"].to_numpy(np.int64)
        b_ids = b["doc_id"].to_numpy(np.int64)
        ao, bo = np.argsort(a_ids), np.argsort(b_ids)
        a_ids, b_ids = a_ids[ao], b_ids[bo]
        a_fp = a["fp"].to_numpy(np.int64)[ao]
        b_fp = b["fp"].to_numpy(np.int64)[bo]
        a_lang = a["lang"].to_numpy(str)[ao]
        b_lang = b["lang"].to_numpy(str)[bo]
        # A-side status via searchsorted into B
        pos = np.searchsorted(b_ids, a_ids)
        pos_c = np.minimum(pos, max(len(b_ids) - 1, 0))
        in_b = (len(b_ids) > 0) & (b_ids[pos_c] == a_ids)
        same = np.zeros(len(a_ids), dtype=bool)
        if len(b_ids):
            same[in_b] = b_fp[pos_c[in_b]] == a_fp[in_b]
        a_status = np.where(~in_b, "deleted", np.where(same, "unchanged", "changed"))
        # B-only keys are additions
        posa = np.searchsorted(a_ids, b_ids)
        posa_c = np.minimum(posa, max(len(a_ids) - 1, 0))
        in_a = (len(a_ids) > 0) & (a_ids[posa_c] == b_ids)
        out = pd.DataFrame(
            {
                "k": np.concatenate(
                    [
                        np.char.add(np.char.add(a_lang, SEP), a_status.astype(str)),
                        np.char.add(
                            np.char.add(b_lang[~in_a], SEP),
                            np.full(int((~in_a).sum()), "added"),
                        ),
                    ]
                ),
                "part_n": np.int64(1),
            }
        ).groupby("k", as_index=False)["part_n"].sum()
        out["part_n"] = out["part_n"].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        lang, status = g["k"].iloc[0].split(SEP)
        return pd.DataFrame(
            {
                "lang": [lang],
                "status": [status],
                "n": np.array([g["part_n"].sum()], dtype=np.int64),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "lang", "n_chars"])
        .map_batches(emit_sides, batch_format="pandas")
        .groupby("bucket")
        .map_groups(classify, batch_format="pandas")
        .groupby("k")
        .map_groups(final, batch_format="pandas")
    )


def q_dq_expectations(sf_dir: str):
    """Data-quality expectation suite — the declarative constraint
    validation every production ingest runs before publishing a
    partition (the Great-Expectations / dbt-test shape, public): each
    expectation yields (n_checked, n_violations). Five row-local
    expectations stream in ONE pass with per-batch partial counters
    (panel = expectations × blocks); the uniqueness expectation needs a
    key shuffle and rides a splitmix64-bucketed per-batch-distinct pass
    (shuffle carries unique ids per batch, 8 B each, never rows) —
    violations = total − Σ per-bucket distinct. At 10^12 rows the
    row-local suite is free (piggybacks any existing scan) and
    uniqueness costs one id-only shuffle, the minimum possible. Full
    SQL oracle (UNION ALL of counting queries)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    LANGS = {"en", "de", "fr", "es", "zh"}

    def row_local(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        ids = df["doc_id"]
        text = df["text"]
        nc = df["n_chars"].to_numpy(np.int64)
        viol = {
            "doc_id_not_null": int(ids.isna().sum()),
            "text_not_empty": int((text.isna() | (text.str.len() == 0)).sum()),
            "n_chars_in_range": int(((nc < 1) | (nc > 100_000)).sum()),
            "lang_in_set": int((~df["lang"].isin(LANGS)).sum()),
            "n_chars_eq_len": int(
                (text.fillna("").str.len().to_numpy(np.int64) != nc).sum()
            ),
        }
        return pd.DataFrame(
            {
                "expectation": list(viol),
                "part_checked": np.full(len(viol), n, dtype=np.int64),
                "part_viol": np.array(list(viol.values()), dtype=np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "expectation": [g["expectation"].iloc[0]],
                "n_checked": np.array([g["part_checked"].sum()], dtype=np.int64),
                "n_violations": np.array([g["part_viol"].sum()], dtype=np.int64),
            }
        )

    docs = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])
    local = (
        docs.map_batches(row_local, batch_format="pandas")
        .groupby("expectation")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )

    # uniqueness: id-only bucketed distinct (ids unique per bucket by
    # construction, so per-bucket distinct counts sum exactly)
    def id_partial(t: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(t["doc_id"], dtype=np.int64))
        return pa.table(
            {
                "bucket": pa.array(
                    (splitmix64(ids.view(np.uint64)) % np.uint64(nparts)).astype(
                        np.int64
                    )
                ),
                "doc_id": pa.array(ids),
            }
        )

    def bucket_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_distinct": np.array(
                    [len(np.unique(g["doc_id"].to_numpy(np.int64)))], dtype=np.int64
                ),
            }
        )

    dd = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(id_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_distinct, batch_format="pandas")
        .to_pandas()
    )
    total = int(local.loc[local["expectation"] == "lang_in_set", "n_checked"].iloc[0])
    uniq = pd.DataFrame(
        {
            "expectation": ["doc_id_unique"],
            "n_checked": np.array([total], dtype=np.int64),
            "n_violations": np.array(
                [total - int(dd["n_distinct"].sum())], dtype=np.int64
            ),
        }
    )
    return (
        pd.concat([local, uniq], ignore_index=True)
        .sort_values("expectation")
        .reset_index(drop=True)
    )


def q_weighted_sample(sf_dir: str):
    """Deterministic WEIGHTED sample — k = 5 docs per lang with
    inclusion biased toward longer documents: priority =
    md5₆₀(text) // n_chars, keep the k smallest (ties → doc_id). This
    is the integer determinization of the Efraimidis–Spirakis A-ES
    weighted-reservoir scheme (priority = random^(1/w), public): the
    hash plays the uniform draw, dividing by the weight shrinks
    expected priority for heavy items, and hash-derived randomness
    makes the draw reproducible at ANY cluster size (the T6
    discipline). The integer rule trades exact inclusion probabilities
    for bit-exact mergeability — what a distributed curation pipeline
    actually needs (same sample on 8 or 256 nodes, re-runnable audit).

    Per-batch per-lang k-smallest partials bound the shuffle to
    k × langs × blocks rows; one single-key combine per lang. Full SQL
    oracle (row_number over the same integer priority)."""
    docs = _docs(sf_dir, ["doc_id", "lang", "text", "n_chars"])
    K = 5

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = np.maximum(df["n_chars"].to_numpy(np.int64), 1)
        pri = _text_60bit(df["text"].tolist()) // w
        g = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_chars": df["n_chars"].to_numpy(np.int64),
                "priority": pri,
            }
        )
        return (
            g.sort_values(["priority", "doc_id"], kind="stable")
            .groupby("lang", sort=False)
            .head(K)
            .reset_index(drop=True)
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.sort_values(["priority", "doc_id"], kind="stable")
            .head(K)
            .reset_index(drop=True)
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


def q_zorder_vs_linear(sf_dir: str):
    """Z-order layout audit — quantify how much a space-filling-curve
    file layout (Delta/Iceberg ``ZORDER BY``, public) cuts scan cost
    for a 2-D predicate vs a linear (x-major) layout. Dimensions: x =
    user_id % 256, y = epoch-hour % 256; z interleaves their bits
    (Morton code); both layouts bucket rows into 64 partitions (top 6
    bits of the 16-bit key). Predicate: the aligned square x ∈ [64,96)
    ∧ y ∈ [32,64) — under Z-order an aligned 2^k square shares one
    bit-prefix so it lands in ONE partition; the linear layout touches
    every partition whose x-slice intersects, dragging all their
    non-matching rows through the scan.

    Output per layout: partitions_touched, rows_scanned (rows resident
    in touched partitions — the real I/O bill), rows_matched
    (identical by construction). One streaming pass emits (layout,
    partition, rows, matches) partials; a fused-key combine reduces a
    ≤ 2×64-row panel — the audit costs one scan regardless of event
    volume, exactly how a table-format layout advisor runs. Full SQL
    oracle (explicit bit-interleave arithmetic)."""
    SEP = "\x1f"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        ts_us = df["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
        x = uid % 256
        y = (ts_us // np.int64(3_600_000_000)) % 256
        z = np.zeros(len(x), dtype=np.int64)
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        part_z = z >> 10
        part_lin = (x * 256 + y) >> 10
        match = ((x >= 64) & (x < 96) & (y >= 32) & (y < 64)).astype(np.int64)
        rows = []
        for layout, part in (("zorder", part_z), ("linear", part_lin)):
            g = (
                pd.DataFrame({"part": part, "n": np.int64(1), "m": match})
                .groupby("part", as_index=False)
                .sum()
            )
            g["k"] = layout + SEP + g["part"].astype(str)
            rows.append(g[["k", "n", "m"]])
        out = pd.concat(rows, ignore_index=True)
        out["n"] = out["n"].astype(np.int64)
        out["m"] = out["m"].astype(np.int64)
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        layout, part = g["k"].iloc[0].split(SEP)
        return pd.DataFrame(
            {
                "layout": [layout],
                "part": np.array([int(part)], dtype=np.int64),
                "n": np.array([g["n"].sum()], dtype=np.int64),
                "m": np.array([g["m"].sum()], dtype=np.int64),
            }
        )

    panel = (
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
        .map_batches(partial, batch_format="pandas")
        .groupby("k")
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    out = []
    for layout, g in panel.groupby("layout"):
        touched = g[g["m"] > 0]
        out.append(
            {
                "layout": layout,
                "partitions_touched": np.int64(len(touched)),
                "rows_scanned": np.int64(touched["n"].sum()),
                "rows_matched": np.int64(g["m"].sum()),
            }
        )
    return (
        pd.DataFrame(out)
        .astype(
            {
                "partitions_touched": np.int64,
                "rows_scanned": np.int64,
                "rows_matched": np.int64,
            }
        )
        .sort_values("layout")
        .reset_index(drop=True)
    )


def q_event_transitions(sf_dir: str):
    """First-order Markov transition counts over per-user event
    sequences — the LAG-window sibling of ``event_gap_histogram`` on
    the TYPE axis instead of the time axis (funnel analytics' raw
    material; row = prev_type → next_type with its count). Ordering is
    pinned to (ts, event_id) so timestamp ties cannot flip a
    transition between runs or cluster sizes.

    Shape: users hash-bucket once (single-key shuffle); each bucket
    runs ONE lexsort over (user, ts, event_id) and a shifted equality
    mask — no per-user loop, no global window sort; fused-key partial
    counts reduce to a ≤ types² panel. Full SQL oracle (lag() window
    with the same tie-break)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    SEP = "\x1f"

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "bucket": (
                    splitmix64(uid.view(np.uint64)) % np.uint64(nparts)
                ).astype(np.int64),
                "user_id": uid,
                "ts_us": df["ts"].astype("datetime64[us]").astype(np.int64),
                "event_id": df["event_id"].to_numpy(np.int64),
                "event_type": df["event_type"],
            }
        )

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts_us"].to_numpy(np.int64)
        eid = g["event_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(str)
        order = np.lexsort((eid, ts, uid))
        uid, et = uid[order], et[order]
        same_user = uid[1:] == uid[:-1]
        prev, nxt = et[:-1][same_user], et[1:][same_user]
        if prev.size == 0:
            return pd.DataFrame({"k": pd.Series([], dtype=str),
                                 "part_n": pd.Series([], dtype=np.int64)})
        out = (
            pd.DataFrame(
                {"k": np.char.add(np.char.add(prev, SEP), nxt), "part_n": np.int64(1)}
            )
            .groupby("k", as_index=False)["part_n"]
            .sum()
        )
        out["part_n"] = out["part_n"].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        prev, nxt = g["k"].iloc[0].split(SEP)
        return pd.DataFrame(
            {
                "prev_type": [prev],
                "next_type": [nxt],
                "n": np.array([g["part_n"].sum()], dtype=np.int64),
            }
        )

    return (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["user_id", "ts", "event_id", "event_type"],
        )
        .map_batches(emit, batch_format="pandas")
        .groupby("bucket")
        .map_groups(transitions, batch_format="pandas")
        .groupby("k")
        .map_groups(final, batch_format="pandas")
    )


_CANOPY_T1 = 22  # loose threshold (Hamming bits on the 64-bit simhash)
_CANOPY_T2 = 14  # tight threshold (removal from the candidate list)
_CANOPY_MAX_CENTERS = 4096  # per-group determinism cap (leftovers → singletons)


def q_canopy_clusters(sf_dir: str):
    """Canopy clustering (McCallum, Nigam & Ungar, KDD 2000 — public):
    the classic cheap-metric PRE-clustering that bounds who the
    expensive scorer may compare. Cheap metric = Hamming distance on
    the 64-bit content simhash; loose threshold T1 = 22 bits forms the
    (overlapping) canopies, tight threshold T2 = 14 removes covered
    points from the candidate-center list. The greedy is made
    deterministic the same way every 'first wins' in this repo is:
    centers are taken in ascending doc_id order, so 8-cpu and 32-cpu
    runs emit identical canopies (the reference's analogue is its
    candidate caps applied in fixed order, fuzz/inexus_parser.py:2829).

    Shape: the sequential greedy parallelizes across LANG groups (the
    canopy key): one Fingerprinter actor-pool pass emits (doc_id,
    lang, simhash) — 16 B/row, content never shuffles — and each lang
    group runs a vectorized greedy (one hamming64 pass per center over
    the group panel, no per-point Python). Centers per group are
    capped at 4096 in sorted order — past the cap, leftovers become
    singleton canopies (honest bound, same trade as the LSH pair
    caps). Output per doc: primary canopy (first canopy containing
    it — provably center_id ≤ doc_id) and its membership count across
    overlapping canopies. Greedy-vs-brute-force parity and the
    center_id ≤ doc_id invariant are pytest-pinned, and since r4 the
    greedy ALSO has a full SQL oracle: a recursive CTE that elects the
    min-remaining doc per lang as center each iteration (window
    functions over the recursive relation) on top of the proven simhash
    recomputation — the sequential fold IS expressible because the
    iteration order is a pure function of the data (ascending doc id)."""
    from address_parser_ray.functions.hashing import hamming64
    from address_parser_ray.sources import documents_as_corpus
    from address_parser_ray.stages.fingerprint import Fingerprinter

    corpus = documents_as_corpus(sf_dir)
    fp = corpus.map_batches(
        Fingerprinter,
        fn_constructor_kwargs={
            "cfg": DEFAULT_CONFIG,
            "outputs": frozenset({"simhash"}),
            "passthrough": ("doc_id", "lang"),
        },
        batch_format="pyarrow",
        batch_size=512,
        concurrency=(1, 8),
    )

    def greedy(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(g["doc_id"].to_numpy(np.int64), kind="stable")
        ids = g["doc_id"].to_numpy(np.int64)[order]
        sh = g["simhash"].to_numpy(np.uint64)[order]
        n = len(ids)
        remaining = np.ones(n, dtype=bool)
        primary = np.full(n, -1, dtype=np.int64)
        n_canopies = np.zeros(n, dtype=np.int64)
        centers = 0
        while remaining.any() and centers < _CANOPY_MAX_CENTERS:
            i = int(np.flatnonzero(remaining)[0])
            d = hamming64(sh, int(sh[i]))
            in_t1 = d <= _CANOPY_T1
            n_canopies += in_t1
            unset = (primary < 0) & in_t1
            primary[unset] = ids[i]
            remaining &= d > _CANOPY_T2
            centers += 1
        # past the cap: leftovers are their own singleton canopies
        left = primary < 0
        primary[left] = ids[left]
        n_canopies[left] += 1
        return pd.DataFrame(
            {
                "doc_id": ids,
                "lang": g["lang"].to_numpy(str)[order],
                "canopy_id": primary,
                "n_canopies": n_canopies,
            }
        )

    return (
        fp.select_columns(["doc_id", "lang", "simhash"])
        .groupby("lang")
        .map_groups(greedy, batch_format="pandas")
    )


_HLL_M = 64  # registers (p = 6)
_HLL_POW2 = None  # lazy powers-of-two table for exact vectorized bit_length


def q_hll_distinct(sf_dir: str):
    """HyperLogLog distinct-count registers per lang (Flajolet et al.
    2007, public) — the fixed-size cousin of ``distinct_kmv``: m = 64
    registers, each holding the max leading-zero rank seen for the
    hashes routed to it.  Hash = the same 60-bit md5 fold as the KMV
    sketch (so the oracle reuses the proven list_reduce twin); register
    = ``h % 64``; rank of the remaining 54-bit word w = ``55 -
    bit_length(w)`` (w = 0 ⇒ 55).  bit_length is computed by
    searchsorted against an exact powers-of-two table — NOT float
    frexp, which mis-rounds near 2^53.

    Registers are MERGEABLE maxima: each batch emits ≤ m rows per lang
    ((lang, reg, rank) partial-max panel), one single-key combine per
    lang computes the harmonic denominator S = Σ_j 2^(55-M_j) and the
    raw HLL estimate ``(70937 · m² · 2^55) // (100000 · S)`` (α₆₄ ≈
    0.70937 as an exact rational) in pure integer arithmetic — HUGEINT
    on the SQL side, Python int here, so an *approximate* sketch is
    bit-exactly oracle-checkable.  The small-range linear-counting
    branch needs ln() so instead the row carries ``n_zero_regs`` and S
    verbatim — the caller applies the correction; the stored state is
    exact.  At 10^12 rows the shuffle carries O(m × langs × blocks)
    tiny rows; sketch state is 64 ints per group forever.  Reference
    analogue: candidate-set cardinality gates
    (fuzz/inexus_parser.py:2829-2878)."""
    global _HLL_POW2
    if _HLL_POW2 is None:
        _HLL_POW2 = (np.int64(1) << np.arange(55, dtype=np.int64)).astype(np.int64)
    pow2 = _HLL_POW2
    docs = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _text_60bit(df["text"].tolist())
        reg = h % _HLL_M
        w = h >> 6
        rank = np.int64(55) - np.searchsorted(pow2, w, side="right").astype(np.int64)
        g = (
            pd.DataFrame({"lang": df["lang"], "reg": reg, "rank": rank})
            .groupby(["lang", "reg"], sort=False, as_index=False)["rank"]
            .max()
        )
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mj = np.zeros(_HLL_M, dtype=np.int64)
        h = g.groupby("reg", as_index=False)["rank"].max()
        mj[h["reg"].to_numpy(np.int64)] = h["rank"].to_numpy(np.int64)
        s = sum(1 << int(55 - m) for m in mj)  # ≤ 64·2^55 but kept Python int
        est = (70937 * _HLL_M * _HLL_M * (1 << 55)) // (100000 * s)
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_zero_regs": np.array([int((mj == 0).sum())], dtype=np.int64),
                "harmonic_denom": np.array([s], dtype=np.int64),
                "est_raw": np.array([est], dtype=np.int64),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(merge, batch_format="pandas")
    )


_SNAP_ACCEPT_MICRO = 890_000  # reference REFERENCE_ACCEPT_RATIO = 90 analogue
_SNAP_VOWELS = re.compile(r"[aeiou]")


def q_canonical_snap(sf_dir: str):
    """Canonical snap with an accept threshold — the reference's
    ``_match_reference`` (fuzz/inexus_parser.py:1718-1756; hcmut
    main.py:342-380): exact gazetteer hit wins outright, else the best
    fuzzy candidate (``extractOne``) is accepted only above a cutoff,
    else the input stays unresolved.  P3 of SURVEY §2.8, now full.

    Inputs = every canonical part name PLUS its vowel-stripped variant
    (the deterministic "dirty observation" — same mangle in SQL via
    regexp_replace, so the whole op is oracle-checkable).  Gazetteer =
    the distinct-name panel, small by definition (A2) and broadcast
    once via ``ray.put``; the input panel is built distributed (per-
    batch dedup partials → one vocabulary-bounded groupby) and scored
    in ``map_batches`` slices — at 100 TB the name panel distributes
    while the gazetteer broadcast stays O(entities).  Scoring is the
    DuckDB-parity Jaro-Winkler (boost only above jaro 0.7, rapidfuzz
    semantics) in floor(jw·10⁶ + ε) micro-units; winner = argmax by
    (jw_micro DESC, candidate ASC) — the same integer tie-break on
    both engines, so an *approximate* matcher is hash-verifiable.
    method: 'exact' (jw = 10⁶ ⇔ string equality), 'fuzzy' (≥ the
    accept threshold), 'none' (best candidate reported, snap NULL)."""
    from address_parser_ray.functions.similarity import jaro

    def jw_duck(a: str, b: str) -> float:
        j = jaro(a, b)
        if j <= 0.7:
            return j
        p = 0
        for x, y in zip(a[:4], b[:4]):
            if x != y:
                break
            p += 1
        return j + p * 0.1 * (1.0 - j)

    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def inputs_partial(t: pa.Table) -> pa.Table:
        names = set(t["p_name"].to_pylist())
        inp = names | {_SNAP_VOWELS.sub("", n) for n in names}
        return pa.table({"input_name": pa.array(sorted(inp), type=pa.string())})

    def gaz_partial(t: pa.Table) -> pa.Table:
        names = sorted(set(t["p_name"].to_pylist()))
        return pa.table({"p_name": pa.array(names, type=pa.string())})

    gaz = (
        parts.map_batches(gaz_partial, batch_format="pyarrow")
        .groupby("p_name")
        .map_groups(
            lambda g: pd.DataFrame({"p_name": [g["p_name"].iloc[0]]}),
            batch_format="pandas",
        )
        .to_pandas()["p_name"]
        .sort_values()
        .tolist()
    )
    gref = ray.put(gaz)

    inputs = (
        parts.map_batches(inputs_partial, batch_format="pyarrow")
        .groupby("input_name")
        .map_groups(
            lambda g: pd.DataFrame({"input_name": [g["input_name"].iloc[0]]}),
            batch_format="pandas",
        )
    )

    def snap(t: pa.Table) -> pa.Table:
        cands = ray.get(gref)
        cand_set = set(cands)
        out_in, out_snap, out_jw, out_m = [], [], [], []
        for name in t["input_name"].to_pylist():
            if name in cand_set:  # exact hit short-circuits (reference :1729)
                best_c, best_jw = name, 1_000_000
            else:
                best_c, best_jw = None, -1
                for c in cands:  # cands sorted ASC → ties keep lexic. min
                    jw = int(np.floor(jw_duck(name, c) * 1e6 + 1e-7))
                    if jw > best_jw:
                        best_c, best_jw = c, jw
            meth = (
                "exact"
                if best_jw == 1_000_000
                else ("fuzzy" if best_jw >= _SNAP_ACCEPT_MICRO else "none")
            )
            out_in.append(name)
            out_snap.append(best_c if meth != "none" else None)
            out_jw.append(best_jw)
            out_m.append(meth)
        return pa.table(
            {
                "input_name": pa.array(out_in, type=pa.string()),
                "snapped": pa.array(out_snap, type=pa.string()),
                "jw_micro": pa.array(out_jw, type=pa.int64()),
                "method": pa.array(out_m, type=pa.string()),
            }
        )

    return inputs.map_batches(snap, batch_format="pyarrow", batch_size=64)


def q_signature_blocks(sf_dir: str):
    """Component-signature blocking — the reference's
    ``_build_component_signature`` variants (token sequence, joined,
    initials; fuzz/inexus_parser.py:2475-2507) as blocking keys
    (M19 of SURVEY §2.2, now full).  Each distinct name emits three
    signatures: 'initials' (first char of each space-token — acronym
    blocking), 'joined' (spaces removed — glued-form blocking) and
    'prefix' (first token — the reference's prefix-detect key M18).
    Output: per (kind, sig) block with ≥ 2 members, the member count,
    the C(n,2) candidate-pair bound (the blocking-cost statistic) and
    the min-name representative.

    Shape: the name panel is built distributed (per-batch dedup →
    vocabulary-bounded groupby), signatures are a stateless flat map,
    and the block rollup is ONE single-key groupby on the fused
    ``kind|sig`` key (composite-groupby trap avoided) — shuffles are
    bounded by name vocabulary at any corpus size.  Full SQL oracle
    (list_transform initials / replace / split[1])."""
    parts = ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_name"])

    def dedup_partial(t: pa.Table) -> pa.Table:
        names = sorted(set(t["p_name"].to_pylist()))
        return pa.table({"p_name": pa.array(names, type=pa.string())})

    def sigs(df: pd.DataFrame) -> pd.DataFrame:
        keys, names = [], []
        for name in df["p_name"]:
            toks = name.split(" ")
            for k, s in (
                ("initials", "".join(t[:1] for t in toks)),
                ("joined", name.replace(" ", "")),
                ("prefix", toks[0]),
            ):
                keys.append(f"{k}\x1f{s}")
                names.append(name)
        return pd.DataFrame({"key": keys, "p_name": names})

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        # singleton blocks are emitted then filtered downstream — an
        # empty object-dtype frame here trips Ray's size estimator
        n = len(g)
        kind, sig = g["key"].iloc[0].split("\x1f", 1)
        return pd.DataFrame(
            {
                "kind": [kind],
                "sig": [sig],
                "n_names": np.array([n], dtype=np.int64),
                "n_pairs": np.array([n * (n - 1) // 2], dtype=np.int64),
                "rep": [g["p_name"].min()],
            }
        )

    return (
        parts.map_batches(dedup_partial, batch_format="pyarrow")
        .groupby("p_name")
        .map_groups(
            lambda g: pd.DataFrame({"p_name": [g["p_name"].iloc[0]]}),
            batch_format="pandas",
        )
        .map_batches(sigs, batch_format="pandas")
        .groupby("key")
        .map_groups(rollup, batch_format="pandas")
        .filter(expr="n_names >= 2")
    )


def q_token_transforms(sf_dir: str):
    """Spec-driven per-token transforms — the reference's
    ``transform_tokens(tokens, spec)`` (ner/build_standard_dataset.py:
    443-452; M14 of SURVEY §2.2, now full): a declarative spec picks
    which normalization each token gets.  Three specs: 'lower'
    (casefold), 'fold' (NFD accent-fold — DuckDB ``strip_accents``
    twin; ASCII tokens short-circuit), 'alnum' (lowercase then strip
    non-[a-z0-9] — the M2 ``_normalize_token_basic`` rule).  Output per
    (spec, lang): token count and how many tokens the spec actually
    changed — the audit that tells a pipeline author what each
    normalization level costs in information.

    Shape: stateless per-batch transforms (pandas str kernels; the
    accent fold only ever touches non-ASCII tokens) emitting
    (spec × langs) partial counts, one fused single-key combine —
    shuffle rows are blocks × specs × langs regardless of corpus
    size.  Full SQL oracle (lower / strip_accents / regexp_replace
    over the exploded token stream)."""
    from address_parser_ray.functions.normalize import strip_accents

    docs = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks, langs = [], []
        for lang, text in zip(df["lang"], df["text"]):
            ws = [w for w in _ws_tokens(text) if w]
            toks.extend(ws)
            langs.extend([lang] * len(ws))
        s = pd.Series(toks, dtype=object)
        lang_s = pd.Series(langs, dtype=object)
        if not len(s):
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype=str),
                    "n_tokens": pd.Series([], dtype=np.int64),
                    "n_changed": pd.Series([], dtype=np.int64),
                }
            )
        low = s.str.lower()
        alnum = low.str.replace("[^a-z0-9]", "", regex=True)
        is_ascii = s.map(str.isascii)
        fold_chg = np.zeros(len(s), dtype=bool)
        for i in np.flatnonzero(~is_ascii.to_numpy()):
            fold_chg[i] = strip_accents(s.iloc[i]) != s.iloc[i]
        chg = pd.DataFrame(
            {
                "lower": (low != s).to_numpy(),
                "fold": fold_chg,
                "alnum": (alnum != s).to_numpy(),
                "lang": lang_s,
            }
        )
        out = []
        for spec in ("lower", "fold", "alnum"):
            g = chg.groupby("lang", sort=False)[spec].agg(["count", "sum"])
            for lang, row in g.iterrows():
                out.append((f"{spec}\x1f{lang}", int(row["count"]), int(row["sum"])))
        return pd.DataFrame(
            {
                "key": [o[0] for o in out],
                "n_tokens": np.array([o[1] for o in out], dtype=np.int64),
                "n_changed": np.array([o[2] for o in out], dtype=np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        spec, lang = g["key"].iloc[0].split("\x1f", 1)
        return pd.DataFrame(
            {
                "spec": [spec],
                "lang": [lang],
                "n_tokens": np.array([int(g["n_tokens"].sum())], dtype=np.int64),
                "n_changed": np.array([int(g["n_changed"].sum())], dtype=np.int64),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("key")
        .map_groups(combine, batch_format="pandas")
    )


_MEDOID_CAP = 256  # members per cluster considered (row_number ≤ cap in SQL)


def q_cluster_medoids(sf_dir: str):
    """Cluster MEDOID election — per LSH cluster, the member that
    minimizes total distance to the others (equivalently maximizes
    Σ Jaccard over distinct 8-gram shingle-hash sets, in integer
    micro-units) — the content-aware canonicalization step beyond
    ``cluster_canonical``'s min-id rule (reference P3/J5 pick-best
    semantics, fuzz/inexus_parser.py:1396-1443, where the best-scoring
    candidate represents the entity).  Tie-break: (score DESC, doc_id
    ASC), identical integers on both engines.

    Shape: clusters come from the SQL-checkable LSH clustering
    (``_mh_assignments``); the per-cluster greedy is one vectorized
    O(m²) set pass bounded by a deterministic 256-member cap taken in
    doc_id order (mirrored in SQL via row_number ≤ cap — the SemDeDup
    cap discipline).  Normalized texts ride ``_gated_doc_texts``: the
    shared broadcast panel under the byte gate, a bucketed
    ``pinned_join`` on record_id above it (norm travels WITH the
    assignment row into the group); the assignments shuffle carries
    (id, label[, norm-above-gate]) only.  Full SQL oracle
    (recursive-CTE closure + shingle-set self-join + argmax window)."""
    from address_parser_ray.functions.hashing import char_shingle_hashes

    asg = _mh_assignments(sf_dir)
    texts_ref, texts_ds = _gated_doc_texts(sf_dir)
    if texts_ds is not None:
        asg = pinned_join(asg, texts_ds, on="record_id", right_on="doc_id")

    def medoid(g: pd.DataFrame) -> pd.DataFrame:
        rid = g["record_id"].to_numpy(np.int64)
        order = np.argsort(rid)
        ids = rid[order]
        empty = pd.DataFrame(
            {
                "cluster_id": pd.Series([], dtype=np.int64),
                "medoid_id": pd.Series([], dtype=np.int64),
                "score_micro": pd.Series([], dtype=np.int64),
                "n_members": pd.Series([], dtype=np.int64),
            }
        )
        if len(ids) < 2:
            return empty
        ids = ids[:_MEDOID_CAP]
        if texts_ref is not None:
            ids_sorted, norms = ray.get(texts_ref)
            pos = np.searchsorted(ids_sorted, ids)
            texts = [norms[int(p)] for p in pos]
        else:
            gn = g["norm"].to_numpy(dtype=object)
            texts = [gn[i] for i in order[: len(ids)]]
        sets = [set(char_shingle_hashes(t, 8).tolist()) for t in texts]
        k = len(ids)
        score = np.zeros(k, dtype=np.int64)
        for i in range(k):
            si, li = sets[i], len(sets[i])
            for j in range(i + 1, k):
                ni = len(si & sets[j])
                if ni:
                    jp = ni * 1_000_000 // (li + len(sets[j]) - ni)
                    score[i] += jp
                    score[j] += jp
        best = int(np.lexsort((ids, -score))[0])
        return pd.DataFrame(
            {
                "cluster_id": np.array(
                    [g["cluster_id"].iloc[0]], dtype=np.int64
                ),
                "medoid_id": np.array([ids[best]], dtype=np.int64),
                "score_micro": np.array([score[best]], dtype=np.int64),
                "n_members": np.array([k], dtype=np.int64),
            }
        )

    return asg.groupby("cluster_id").map_groups(medoid, batch_format="pandas")


def q_session_concurrency(sf_dir: str):
    """Interval SWEEP-LINE — per day, how many sessions ever run
    concurrently (peak load / capacity planning over the session
    intervals that ``user_sessions`` builds).  Sessions use the same
    30-minute-gap rule; each session [start, end] is clipped to day
    boundaries (a midnight-spanning session counts in both days — the
    standard interval-split), then each day runs one boundary sweep:
    (+1 at clipped start, −1 at clipped end), sorted by (t, delta
    DESC) so a session starting exactly when another ends counts as
    concurrent — the tie rule is pinned identically in the SQL window
    ORDER BY.  max concurrent = max of the running sum.

    Shape: session building is the per-user-bucket vectorized pass
    (lexsort + boundary diff — no per-user Python); the sweep
    re-groups by day, whose groups hold session-interval rows (users ×
    sessions-that-day), not events — bounded regardless of event
    volume.  Two single-key shuffles total.  Full SQL oracle
    (lag-gap sessionization + generate_series day split + windowed
    running sum)."""
    from address_parser_ray.rayutil import default_num_partitions

    DAY = 86_400_000_000  # µs
    nparts = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_add_user_bucket(nparts), batch_format="pyarrow")

    def intervals_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        tsi = g["ts"].to_numpy().view("i8")  # µs since epoch
        order = np.lexsort((tsi, uid))
        uid, tsi = uid[order], tsi[order]
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[True], (tsi[1:] - tsi[:-1]) > 1_800_000_000])
        starts = np.flatnonzero(first | gap)
        ends = np.append(starts[1:], uid.size) - 1
        st, en = tsi[starts], tsi[ends]
        # split every session across the days it touches (vectorized)
        d0, d1 = st // DAY, en // DAY
        ndays = (d1 - d0 + 1).astype(np.int64)
        total = int(ndays.sum())
        rep = np.repeat(np.arange(len(st)), ndays)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(ndays)[:-1]]), ndays
        )
        day = d0[rep] + offs
        cst = np.maximum(st[rep], day * DAY)
        cen = np.minimum(en[rep], day * DAY + DAY - 1)
        return pd.DataFrame({"day": day, "cst": cst, "cen": cen})

    def sweep_day(g: pd.DataFrame) -> pd.DataFrame:
        cst = g["cst"].to_numpy(np.int64)
        cen = g["cen"].to_numpy(np.int64)
        t = np.concatenate([cst, cen])
        d = np.concatenate(
            [np.ones(len(cst), dtype=np.int64), -np.ones(len(cen), dtype=np.int64)]
        )
        order = np.lexsort((-d, t))  # +1 before -1 at equal t
        conc = np.cumsum(d[order])
        return pd.DataFrame(
            {
                "day_epoch": np.array([g["day"].iloc[0]], dtype=np.int64),
                "n_sessions": np.array([len(g)], dtype=np.int64),
                "max_concurrent": np.array([int(conc.max())], dtype=np.int64),
            }
        )

    return (
        ev.groupby("bucket")
        .map_groups(intervals_bucket, batch_format="pandas")
        .groupby("day")
        .map_groups(sweep_day, batch_format="pandas")
    )


_SHARD_K = 16  # output shards


def q_shard_balance(sf_dir: str):
    """Balanced training-shard assignment — size-rank round-robin: docs
    are ranked by (bytes DESC, doc_id), shard = (rank−1) mod K.  The
    striped assignment bounds shard-size spread by one max-doc (vs the
    2x spread of naive hash placement) — the shard-writing step of a
    training-data pipeline, and the planning audit for it.

    Shape: the exact global rank reuses the ``user_spend_ranks``
    distributed-rank primitive — (doc_id, n_bytes) panel, deterministic
    boundary sample → range partitions on n_bytes only (equal sizes
    never straddle a partition), per-partition counts → exclusive
    prefix offsets (one nparts-int driver fold), local sort + offset.
    No global sort materialization; content never moves — only the
    16-byte (id, size) panel, twice.  Per-shard rollups ride the same
    pass as partials into one K-row combine.  SQL twin: row_number()
    OVER (ORDER BY n_bytes DESC, doc_id) striping."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def size_panel(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nb = pc.binary_length(
            pc.cast(pc.coalesce(t["text"], ""), pa.binary())
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pc.cast(nb, pa.int64()),
            }
        )

    panel = docs.map_batches(
        size_panel, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    sample = np.sort(
        np.concatenate(
            [
                np.asarray(b["n_bytes"])[np.asarray(b["doc_id"]) % 101 == 0]
                for b in panel.iter_batches(
                    batch_size=1 << 18, batch_format="pyarrow"
                )
            ]
            or [np.empty(0, np.int64)]
        )
    )
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()
    nb_ = min(nparts - 1, len(sample))
    bounds = (
        sample[np.linspace(0, len(sample) - 1, nb_ + 2)[1:-1].astype(int)]
        if nb_ > 0
        else np.empty(0, np.int64)
    )
    bref = ray.put(np.unique(bounds))

    def add_part(t: pa.Table) -> pa.Table:
        bnds = ray.get(bref)
        p = np.searchsorted(
            bnds, np.asarray(t["n_bytes"], dtype=np.int64), side="right"
        ).astype(np.int64)
        return t.append_column("part", pa.array(p))

    parted = panel.map_batches(
        add_part, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    cnt = np.zeros(len(np.unique(bounds)) + 1, dtype=np.int64)
    for b in parted.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        idx, c = np.unique(np.asarray(b["part"]), return_counts=True)
        cnt[idx] += c
    total = int(cnt.sum())
    offsets = np.concatenate([[0], np.cumsum(cnt)[:-1]])
    oref = ray.put((offsets, total))

    def shard_partial(g: pd.DataFrame) -> pd.DataFrame:
        offs, n_total = ray.get(oref)
        g = g.sort_values(["n_bytes", "doc_id"], ascending=[True, False])
        base = int(offs[int(g["part"].iloc[0])])
        rank_asc = base + np.arange(1, len(g) + 1, dtype=np.int64)
        rn_desc = n_total + 1 - rank_asc
        shard = (rn_desc - 1) % _SHARD_K
        nb2 = g["n_bytes"].to_numpy(np.int64)
        h = pd.DataFrame({"shard": shard, "n_bytes": nb2}).groupby(
            "shard", as_index=False
        )["n_bytes"].agg(["count", "sum", "min", "max"])
        return pd.DataFrame(
            {
                "shard": h["shard"].astype(np.int64),
                "part_docs": h["count"].astype(np.int64),
                "part_bytes": h["sum"].astype(np.int64),
                "part_min": h["min"].astype(np.int64),
                "part_max": h["max"].astype(np.int64),
            }
        )

    def shard_final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "shard": np.array([g["shard"].iloc[0]], dtype=np.int64),
                "n_docs": np.array([int(g["part_docs"].sum())], dtype=np.int64),
                "total_bytes": np.array(
                    [int(g["part_bytes"].sum())], dtype=np.int64
                ),
                "min_bytes": np.array([int(g["part_min"].min())], dtype=np.int64),
                "max_bytes": np.array([int(g["part_max"].max())], dtype=np.int64),
            }
        )

    return (
        parted.groupby("part")
        .map_groups(shard_partial, batch_format="pandas")
        .groupby("shard")
        .map_groups(shard_final, batch_format="pandas")
    )


def q_compression_quality(sf_dir: str):
    """Compressibility quality signal — per-doc zlib (level 6) ratio in
    ppm: highly compressible text is repetitive/boilerplate (the
    Gopher/FineWeb-style curation feature next to ``repetition_stats``'
    duplicate-n-gram fraction; both feed the same keep/drop decision).
    Output per doc: raw UTF-8 bytes, compressed bytes, ratio_ppm =
    zlib_len·10⁶ // n_bytes, and the is_repetitive flag (ratio below
    250 000 — compresses 4:1 or better).  Stateless vectorizable
    ``map_batches`` (zlib releases the GIL; one C call per doc, no
    content shuffle — the signal panel is 4 ints/doc).  Rows-only by
    nature (no zlib in the SQL engine); determinism and the
    repetitive-vs-varied ordering property are pytest-pinned."""
    import zlib

    docs = _docs(sf_dir, ["doc_id", "text"])

    def comp(t: pa.Table) -> pa.Table:
        out_n, out_z, out_r = [], [], []
        for s in t["text"].to_pylist():
            raw = (s or "").encode("utf-8")
            z = len(zlib.compress(raw, 6))
            n = len(raw)
            out_n.append(n)
            out_z.append(z)
            out_r.append(z * 1_000_000 // n if n else 1_000_000)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(out_n, type=pa.int64()),
                "zlib_bytes": pa.array(out_z, type=pa.int64()),
                "ratio_ppm": pa.array(out_r, type=pa.int64()),
                "is_repetitive": pa.array(
                    [r < 250_000 for r in out_r], type=pa.bool_()
                ),
            }
        )

    return docs.map_batches(comp, batch_format="pyarrow", zero_copy_batch=True)


def q_embedding_quantize(sf_dir: str):
    """INT8 embedding quantization audit — per-dim min/max affine
    quantization to [0, 255] with exact integer arithmetic throughout:
    q = (x − min)·255 // (max − min) on the milli-grid, recon = min +
    q·(max − min) // 255, reported per dim as Σq plus the summed and
    max absolute reconstruction error in milli-units.  This is the
    vector-compression planning pass (4× memory cut for the ANN /
    SemDeDup stages) with its error budget measured, not guessed.
    All operands are nonnegative, so // floor-vs-trunc semantics never
    diverge between engines.

    Shape: pass 1 = the ``embedding_dim_stats`` per-dim min/max panel
    (blocks × dims partials, one combine, 64-row broadcast); pass 2 =
    stateless zero-copy quantize emitting per-dim error partials; one
    single-key combine.  Vectors never shuffle — only (dims)-row
    panels.  Full SQL oracle (unnest + the same integer formulas)."""
    emb_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    )

    def minmax_partial(t: pa.Table) -> pa.Table:
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(t.num_rows, -1)
        milli = np.floor(emb * 1000.0).astype(np.int64)
        d = milli.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "mn": pa.array(milli.min(axis=0)),
                "mx": pa.array(milli.max(axis=0)),
            }
        )

    def minmax_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dim": [int(g["dim"].iloc[0])],
                "mn": [int(g["mn"].min())],
                "mx": [int(g["mx"].max())],
            }
        )

    panel = (
        emb_ds.map_batches(
            minmax_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("dim")
        .map_groups(minmax_combine, batch_format="pandas")
        .to_pandas()
        .sort_values("dim")
    )
    mn = panel["mn"].to_numpy(np.int64)
    mx = panel["mx"].to_numpy(np.int64)
    pref = ray.put((mn, mx))

    def quant_partial(t: pa.Table) -> pa.Table:
        mn_, mx_ = ray.get(pref)
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(t.num_rows, -1)
        milli = np.floor(emb * 1000.0).astype(np.int64)
        span = np.maximum(mx_ - mn_, 1)
        q = (milli - mn_[None, :]) * 255 // span[None, :]
        q[:, mx_ == mn_] = 0
        recon = mn_[None, :] + q * (mx_ - mn_)[None, :] // 255
        err = np.abs(milli - recon)
        d = milli.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, milli.shape[0], dtype=np.int64)),
                "sum_q": pa.array(q.sum(axis=0)),
                "sum_abs_err_milli": pa.array(err.sum(axis=0)),
                "max_abs_err_milli": pa.array(err.max(axis=0)),
            }
        )

    def quant_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "dim": [int(g["dim"].iloc[0])],
                "n": [int(g["n"].sum())],
                "sum_q": [int(g["sum_q"].sum())],
                "sum_abs_err_milli": [int(g["sum_abs_err_milli"].sum())],
                "max_abs_err_milli": [int(g["max_abs_err_milli"].max())],
            }
        )

    return (
        emb_ds.map_batches(
            quant_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("dim")
        .map_groups(quant_combine, batch_format="pandas")
    )


def q_activity_reconcile(sf_dir: str):
    """FULL-OUTER reconciliation across two fact systems — per key,
    urgent-order count (orders table) vs purchase-event count (events
    table), keeping keys present in EITHER side null-filled-to-zero and
    classifying each as both / orders_only / events_only.  The
    cross-system audit shape (order book vs clickstream) that inner /
    anti joins cannot express; rides the ``pinned_join`` full-outer
    path (per-bucket Arrow full outers compose into the global one
    because both sides hash on the same key).

    Shape: each side pre-aggregates to a (key, count) panel before the
    join — per-batch partials, one key-bucket combine — so the join
    moves key-cardinality rows, never facts.  Full SQL oracle
    (FULL OUTER JOIN + COALESCE)."""
    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions, pinned_join

    nparts = default_num_partitions()

    def panel(ds, keycol, outcol):
        def part(t: pa.Table) -> pa.Table:
            k = np.asarray(t[keycol], dtype=np.int64)
            uniq, cnt = np.unique(k, return_counts=True)
            kb = (splitmix64(uniq.view(np.uint64)) % np.uint64(nparts)).astype(
                np.int64
            )
            return pa.table(
                {
                    "kb": pa.array(kb),
                    "key": pa.array(uniq),
                    "part_n": pa.array(cnt.astype(np.int64)),
                }
            )

        def comb(g: pd.DataFrame) -> pd.DataFrame:
            h = g.groupby("key", as_index=False)["part_n"].sum()
            return pd.DataFrame(
                {
                    "key": h["key"].astype(np.int64),
                    outcol: h["part_n"].astype(np.int64),
                }
            )

        return (
            ds.map_batches(part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("kb")
            .map_groups(comb, batch_format="pandas")
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).filter(expr="o_orderpriority == '1-URGENT'")
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).filter(expr="event_type == 'purchase'")

    lt = panel(orders, "o_custkey", "n_urgent_orders")
    rt = panel(events, "user_id", "n_purchases")
    joined = pinned_join(
        lt, rt, on="key", num_partitions=nparts, join_type="full outer"
    )

    def finish(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        no = df["n_urgent_orders"]
        np_ = df["n_purchases"]
        side = np.where(
            no.isna(), "events_only", np.where(np_.isna(), "orders_only", "both")
        )
        return pa.table(
            {
                "user_key": pa.array(df["key"].to_numpy(np.int64)),
                "n_urgent_orders": pa.array(
                    no.fillna(0).to_numpy(np.int64)
                ),
                "n_purchases": pa.array(np_.fillna(0).to_numpy(np.int64)),
                "side": pa.array(side, type=pa.string()),
            }
        )

    return joined.map_batches(finish, batch_format="pyarrow")


_MEST_M = 50  # pseudo-count weight of the global prior


def q_source_quality_prior(sf_dir: str):
    """m-estimate SMOOTHED source quality — per-source mean doc length
    shrunk toward the corpus mean with m = 50 pseudo-counts:
    smoothed = (Σlen·1000 + m·prior) // (n + m), prior = corpus mean in
    milli-chars.  The Bayesian-shrinkage rollup every curation pipeline
    needs before ranking SOURCES by a per-doc signal: a 3-doc crawl
    cannot outrank a 30 000-doc one on noise (reference analogue: the
    specificity-aware ranking that keeps low-evidence candidates from
    winning, fuzz/inexus_parser.py:2926-2937).  Pure-integer milli
    arithmetic; all division operands nonnegative.

    Shape: per-batch (source, n, Σlen) partials → one key combine; the
    global prior folds from the sources-sized panel itself (tiny by
    definition) and broadcasts back.  Full SQL oracle (two-level CTE
    with the same integer formula)."""
    docs = _docs(sf_dir, ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ln = df["text"].fillna("").str.len().to_numpy(np.int64)
        g = pd.DataFrame({"source": df["source"], "n": 1, "sl": ln}).groupby(
            "source", as_index=False
        ).agg({"n": "sum", "sl": "sum"})
        g["n"] = g["n"].astype(np.int64)
        g["sl"] = g["sl"].astype(np.int64)
        return g

    panel = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "source": [g["source"].iloc[0]],
                    "n": np.array([int(g["n"].sum())], dtype=np.int64),
                    "sl": np.array([int(g["sl"].sum())], dtype=np.int64),
                }
            ),
            batch_format="pandas",
        )
        .materialize()
    )
    tot = panel.to_pandas()
    prior_milli = int(tot["sl"].sum()) * 1000 // max(1, int(tot["n"].sum()))
    pref = ray.put(prior_milli)

    def smooth(t: pa.Table) -> pa.Table:
        prior = ray.get(pref)
        n = np.asarray(t["n"], dtype=np.int64)
        sl = np.asarray(t["sl"], dtype=np.int64)
        mean = sl * 1000 // np.maximum(n, 1)
        smoothed = (sl * 1000 + _MEST_M * prior) // (n + _MEST_M)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(n),
                "mean_len_milli": pa.array(mean),
                "smoothed_milli": pa.array(smoothed),
            }
        )

    return panel.map_batches(smooth, batch_format="pyarrow")


_PC_ITERS = 5


def q_embedding_top_pc(sf_dir: str):
    """Top principal component by POWER ITERATION — the iterative
    linear-algebra loop (beside the k-means fit and PageRank): v ←
    normalize(Xcᵀ(Xc v)) over mean-centered embeddings, 5 rounds.
    Every distributed quantity is EXACT INTEGER so the combine is
    order-free and runs are bit-identical at any parallelism:
    embeddings quantize per element to the milli-grid (row-local, batch-
    independent), the center is the integer milli-mean, each pass emits
    per-dim partials of Xcᵀ(Xc v) in pure int64 (one matmul pair per
    batch, vectors never shuffle — only (dims)-row panels), and only
    the driver-side normalize of the 64-int result touches floats
    (deterministic given the ints).  Output: (dim, v_milli, lam_milli)
    — λ = Rayleigh quotient in milli-units.  Rows-only (iterative float
    normalize isn't SQL); pytest pins run-to-run determinism, unit
    norm, and the Rayleigh quotient against numpy's exact λ_max (the
    fixture spectrum is nearly flat, so the eigenvalue — not the
    ill-conditioned eigenvector — is the honest 5-round guarantee).
    int64 headroom: |partial| ≤ rows·2e3·(d·2e3·1e3) ≈ 2.6e14 per
    1000-row batch; combine overflows only past ~10^4 blocks per dim —
    swap the combine to Python int (HUGEINT-style) beyond that."""
    emb_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["embedding"]
    ).materialize()

    def milli_panel(t: pa.Table) -> pa.Table:
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(t.num_rows, -1)
        m = np.floor(emb * 1000.0).astype(np.int64)
        d = m.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
                "n": pa.array(np.full(d, m.shape[0], dtype=np.int64)),
                "s": pa.array(m.sum(axis=0)),
            }
        )

    stats = (
        emb_ds.map_batches(
            milli_panel, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("dim")
        .map_groups(
            lambda g: pd.DataFrame(
                {
                    "dim": [int(g["dim"].iloc[0])],
                    "n": [int(g["n"].sum())],
                    "s": [int(g["s"].sum())],
                }
            ),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("dim")
    )
    n_rows = int(stats["n"].iloc[0])
    mu = (stats["s"].to_numpy(np.int64) // max(1, n_rows)).astype(np.int64)
    d = len(mu)

    v = np.full(d, 1000 // 1, dtype=np.int64)  # un-normalized start
    lam_milli = 0
    for _ in range(_PC_ITERS):
        ref = ray.put((mu, v))

        def w_partial(t: pa.Table) -> pa.Table:
            mu_, v_ = ray.get(ref)
            emb = np.asarray(
                t["embedding"].combine_chunks().flatten(), dtype=np.float64
            ).reshape(t.num_rows, -1)
            xc = np.floor(emb * 1000.0).astype(np.int64) - mu_[None, :]
            y = xc @ v_
            w = xc.T @ y
            return pa.table(
                {
                    "dim": pa.array(
                        np.arange(1, len(w) + 1, dtype=np.int64)
                    ),
                    "w": pa.array(w),
                }
            )

        wp = (
            emb_ds.map_batches(
                w_partial, batch_format="pyarrow", zero_copy_batch=True
            )
            .groupby("dim")
            .map_groups(
                lambda g: pd.DataFrame(
                    {
                        "dim": [int(g["dim"].iloc[0])],
                        "w": [int(g["w"].sum())],
                    }
                ),
                batch_format="pandas",
            )
            .to_pandas()
            .sort_values("dim")
        )
        w = wp["w"].to_numpy(np.int64)
        vn = np.linalg.norm(v.astype(np.float64))
        wn = np.linalg.norm(w.astype(np.float64))
        if wn == 0:
            break
        lam_milli = int(
            np.floor(float(v @ w) / (vn * vn) / 1_000.0 + 1e-7)
        )  # Rayleigh vᵀCv/vᵀv on the milli² grid → milli
        v = np.floor(w / wn * 1000.0 + 1e-7).astype(np.int64)

    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "v_milli": pa.array(v),
            "lam_milli": pa.array(np.full(d, lam_milli, dtype=np.int64)),
        }
    )


def q_dedup_savings(sf_dir: str):
    """Dedup ROI report — per source, the byte savings exact dedup
    would deliver: n_docs vs n_unique (distinct text), total stored
    bytes vs bytes after keeping one representative per duplicate
    group, and saved_ppm.  This is the report that justifies running
    the dedup pipeline at all (and the per-source view says WHERE the
    duplication lives — crawl A re-crawling crawl B).  Identical texts
    have identical byte lengths, so total bytes = Σ n·bytes over
    distinct texts — one (source, md5) panel carries everything.

    Shape: per-batch distinct (source|md5, n, bytes) partials → one
    fused-key combine (shuffle bounded by distinct texts, never docs)
    → a sources-sized rollup.  Pure-integer ppm.  Full SQL oracle."""
    docs = _docs(sf_dir, ["source", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = _text_60bit(df["text"].tolist())
        nb = (
            df["text"].fillna("").str.encode("utf-8").str.len().to_numpy(np.int64)
        )
        g = (
            pd.DataFrame(
                {
                    "key": df["source"].astype(str)
                    + "\x1f"
                    + pd.Series(h).astype(str),
                    "n": np.int64(1),
                    "nb": nb,
                }
            )
            .groupby("key", as_index=False)
            .agg({"n": "sum", "nb": "min"})
        )
        g["n"] = g["n"].astype(np.int64)
        g["nb"] = g["nb"].astype(np.int64)
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        source = g["key"].iloc[0].split("\x1f", 1)[0]
        return pd.DataFrame(
            {
                "source": [source],
                "n": np.array([int(g["n"].sum())], dtype=np.int64),
                "nb": np.array([int(g["nb"].min())], dtype=np.int64),
            }
        )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        nb = g["nb"].to_numpy(np.int64)
        total = int((n * nb).sum())
        uniq = int(nb.sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([int(n.sum())], dtype=np.int64),
                "n_unique": np.array([len(g)], dtype=np.int64),
                "bytes_total": np.array([total], dtype=np.int64),
                "bytes_unique": np.array([uniq], dtype=np.int64),
                "saved_ppm": np.array(
                    [(total - uniq) * 1_000_000 // max(total, 1)],
                    dtype=np.int64,
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("key")
        .map_groups(combine, batch_format="pandas")
        .groupby("source")
        .map_groups(rollup, batch_format="pandas")
    )


def q_token_lift(sf_dir: str):
    """Association LIFT over the top-32 vocabulary — market-basket
    mining on docs-as-baskets: lift(a,b) = P(a∧b) / (P(a)·P(b)) =
    n_both·N·10⁶ // (n_a·n_b) in integer ppm (>10⁶ ⇒ tokens attract,
    <10⁶ ⇒ repel) — no float probability ever materializes, so the
    ranking is hash-exact.  The signal a curation pipeline uses to find
    templated co-occurrence (license headers, generated-code idioms)
    beyond raw counts.

    Shape: same two passes as ``token_cooccurrence`` — distributed
    top-K vocabulary, then ONE K×K presence-count matrix per batch
    (P.T@P, diagonal = per-token doc counts, an extra sentinel row
    carries the batch doc count) combined in a single-key groupby —
    the shuffle is blocks × K² tiny rows regardless of corpus size.
    Full SQL oracle (pair self-join + per-token counts + integer
    lift)."""
    docs = _docs(sf_dir, ["doc_id", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter

        c = Counter()
        for text in df["text"]:
            for w in _WS_ASCII.split(text or ""):
                if w:
                    c[w] += 1
        return pd.DataFrame(
            {"tok": list(c.keys()), "n": np.fromiter(c.values(), dtype=np.int64)}
        )

    top = (
        docs.map_batches(count_partial, batch_format="pandas")
        .groupby("tok")
        .map_groups(
            lambda g: pd.DataFrame(
                {"tok": [g["tok"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .sort(["n", "tok"], descending=[True, False])
        .limit(_COOC_TOP)
        .to_pandas()["tok"]
        .tolist()
    )
    vocab = np.asarray(sorted(top), dtype=object)
    vref = ray.put(vocab)

    def matrix_partial(df: pd.DataFrame) -> pd.DataFrame:
        voc = ray.get(vref)
        k = len(voc)
        idx = {t: i for i, t in enumerate(voc)}
        P = np.zeros((len(df), k), dtype=np.int64)
        for r, text in enumerate(df["text"]):
            for w in set(_WS_ASCII.split(text or "")):
                j = idx.get(w)
                if j is not None:
                    P[r, j] = 1
        M = P.T @ P  # diagonal = per-token doc counts
        iu, ju = np.triu_indices(k)  # k=0 keeps the diagonal
        rows = {
            "i": np.append(iu, -1),
            "j": np.append(ju, -1),
            "n": np.append(M[iu, ju], len(df)),  # sentinel: batch docs
        }
        out = pd.DataFrame(rows)
        out["key"] = out["i"] * 1000 + out["j"]
        return out[["key", "i", "j", "n"]]

    def cell_combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "i": np.array([int(g["i"].iloc[0])], dtype=np.int64),
                "j": np.array([int(g["j"].iloc[0])], dtype=np.int64),
                "n": np.array([int(g["n"].sum())], dtype=np.int64),
            }
        )

    cells = (
        docs.map_batches(matrix_partial, batch_format="pandas")
        .groupby("key")
        .map_groups(cell_combine, batch_format="pandas")
        .to_pandas()
    )
    n_total = int(cells.loc[cells["i"] == -1, "n"].iloc[0])
    diag = {
        int(r["i"]): int(r["n"])
        for _, r in cells[(cells["i"] == cells["j"]) & (cells["i"] >= 0)].iterrows()
    }
    pairs = cells[(cells["i"] >= 0) & (cells["i"] < cells["j"]) & (cells["n"] > 0)]
    out_a, out_b, out_n, out_l = [], [], [], []
    for _, r in pairs.iterrows():
        i, j, nb = int(r["i"]), int(r["j"]), int(r["n"])
        na, nbb = diag[i], diag[j]
        out_a.append(vocab[i])
        out_b.append(vocab[j])
        out_n.append(nb)
        out_l.append(nb * n_total * 1_000_000 // (na * nbb))
    return pa.table(
        {
            "tok_a": pa.array(out_a, type=pa.string()),
            "tok_b": pa.array(out_b, type=pa.string()),
            "n_docs_both": pa.array(out_n, type=pa.int64()),
            "lift_ppm": pa.array(out_l, type=pa.int64()),
        }
    )


_DECILE_PS = (10, 20, 30, 40, 50, 60, 70, 80, 90)


def q_decile_grid(sf_dir: str):
    """2-D DECILE CONTINGENCY — the feature-crossing grid (doc length
    deciles × token-count deciles → cell counts) an analysis pipeline
    draws before trusting one quality signal as a proxy for another.
    Decile boundaries come from the pinned integer rank rule
    ``cum ≥ (p·n + 99) // 100`` on compacted value histograms (the
    ``event_value_percentiles`` idiom — exact, no float quantiles);
    bucket = #{boundaries < v} (searchsorted-left ≡ the SQL boundary
    count, identical under duplicate boundaries).

    Shape: pass 1 emits per-batch (axis, value, n) histogram partials
    (panel = distinct lengths × 2, not docs); the 9+9 boundaries fold
    on the driver and broadcast; pass 2 assigns buckets vectorized and
    emits (xd, yd, n) partials into one fused-key combine — ≤ 100
    cells regardless of corpus size.  Full SQL oracle."""
    docs = _docs(sf_dir, ["text"])

    def nt_of(texts) -> np.ndarray:
        return np.fromiter(
            (sum(1 for w in _ws_tokens(t) if w) for t in texts),
            dtype=np.int64,
        )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        nc = df["text"].fillna("").str.len().to_numpy(np.int64)
        nt = nt_of(df["text"].tolist())
        out = []
        for axis, v in (("nc", nc), ("nt", nt)):
            u, c = np.unique(v, return_counts=True)
            out.append(
                pd.DataFrame(
                    {
                        "key": [f"{axis}\x1f{x}" for x in u],
                        "n": c.astype(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    hist = (
        docs.map_batches(hist_partial, batch_format="pandas")
        .groupby("key")
        .map_groups(
            lambda g: pd.DataFrame(
                {"key": [g["key"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    hist[["axis", "v"]] = hist["key"].str.split("\x1f", expand=True)
    hist["v"] = hist["v"].astype(np.int64)

    def bounds_of(axis: str) -> np.ndarray:
        h = hist[hist["axis"] == axis].sort_values("v")
        cum = h["n"].cumsum().to_numpy(np.int64)
        total = int(cum[-1])
        vs = h["v"].to_numpy(np.int64)
        return np.array(
            [
                vs[np.searchsorted(cum, (p * total + 99) // 100, side="left")]
                for p in _DECILE_PS
            ],
            dtype=np.int64,
        )

    bx, by = bounds_of("nc"), bounds_of("nt")
    bref = ray.put((np.sort(bx), np.sort(by)))

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        bx_, by_ = ray.get(bref)
        nc = df["text"].fillna("").str.len().to_numpy(np.int64)
        nt = nt_of(df["text"].tolist())
        xb = np.searchsorted(bx_, nc, side="left")
        yb = np.searchsorted(by_, nt, side="left")
        g = (
            pd.DataFrame({"cell": xb * 100 + yb})
            .groupby("cell", as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "cell": g["cell"].astype(np.int64),
                "n": g["size"].astype(np.int64),
            }
        )

    def cell_final(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g["cell"].iloc[0])
        return pd.DataFrame(
            {
                "x_decile": np.array([cell // 100], dtype=np.int64),
                "y_decile": np.array([cell % 100], dtype=np.int64),
                "n_docs": np.array([int(g["n"].sum())], dtype=np.int64),
            }
        )

    return (
        docs.map_batches(cell_partial, batch_format="pandas")
        .groupby("cell")
        .map_groups(cell_final, batch_format="pandas")
    )


def q_bpe_eval(sf_dir: str):
    """BPE tokenizer EVALUATION — the held-out half of the tokenizer
    story (``bpe_train_merges`` trains; this measures): merges learned
    on the train slice (doc_id % 10 != 0) are applied to the HELD-OUT
    slice (doc_id % 10 == 0) and the compression they deliver is
    reported per lang: symbols before (chars + </w> per word) vs
    tokens after, compression_ppm = after·10⁶ // before.  The
    tokens-per-byte number that decides whether a tokenizer ships.

    Shape: training reuses the distributed vocabulary reduction +
    deterministic merge loop; the 20 learned rules broadcast via
    ``ray.put`` (bytes); the eval pass is stateless ``map_batches``
    with a per-batch word→encoding cache (words repeat heavily — the
    same compaction the trainer exploits) emitting per-lang integer
    partials into one combine.  Rows-only (iterative merge application
    is non-SQL); pytest pins after ≤ before, determinism, and that
    more merges never tokenize worse."""
    from collections import Counter

    def train_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        keep = df["doc_id"].to_numpy(np.int64) % 10 != 0
        for text in df["text"][keep]:
            c.update(_ws_tokens(text))
        return pd.DataFrame(
            {
                "word": list(c.keys()),
                "part_n": np.fromiter(c.values(), dtype=np.int64, count=len(c)),
            }
        )

    vocab = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(train_partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("part_n", alias_name="n"))
        .to_pandas()
    )
    words = [tuple(w) + ("</w>",) for w in vocab["word"]]
    counts = vocab["n"].to_numpy(np.int64)
    rules = _bpe_merge_loop_driver(words, counts, _BPE_MERGES)
    merges = list(zip(rules["left"], rules["right"])) if len(rules) else []
    mref = ray.put(merges)

    def eval_partial(df: pd.DataFrame) -> pd.DataFrame:
        mg = ray.get(mref)
        cache: dict = {}

        def enc(w: str):
            got = cache.get(w)
            if got is None:
                syms = tuple(w) + ("</w>",)
                for left, right in mg:
                    syms = _bpe_apply_merge([syms], left, right)[0]
                got = (len(w) + 1, len(syms))
                cache[w] = got
            return got

        keep = df["doc_id"].to_numpy(np.int64) % 10 == 0
        rows: dict = {}
        for lang, text in zip(df["lang"][keep], df["text"][keep]):
            nd, nw, nb, na = rows.get(lang, (0, 0, 0, 0))
            for w in _ws_tokens(text):
                if not w:
                    continue
                b, a = enc(w)
                nw += 1
                nb += b
                na += a
            rows[lang] = (nd + 1, nw, nb, na)
        return pd.DataFrame(
            {
                "lang": list(rows.keys()),
                "nd": np.array([v[0] for v in rows.values()], dtype=np.int64),
                "nw": np.array([v[1] for v in rows.values()], dtype=np.int64),
                "nb": np.array([v[2] for v in rows.values()], dtype=np.int64),
                "na": np.array([v[3] for v in rows.values()], dtype=np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        nb, na = int(g["nb"].sum()), int(g["na"].sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": np.array([int(g["nd"].sum())], dtype=np.int64),
                "n_words": np.array([int(g["nw"].sum())], dtype=np.int64),
                "symbols_before": np.array([nb], dtype=np.int64),
                "tokens_after": np.array([na], dtype=np.int64),
                "compression_ppm": np.array(
                    [na * 1_000_000 // max(nb, 1)], dtype=np.int64
                ),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(eval_partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(combine, batch_format="pandas")
    )


_REVIEW_SALT = 1005  # sampler salt (see _id_rank60; mirrored in the SQL twin)


def q_review_pairs(sf_dir: str):
    """Human-review QUEUE construction — the labeling-workflow step of
    an ER engine: from every non-singleton LSH cluster, sample ≤ 2
    (representative, member) pairs for annotator review, picked by
    splitmix64 hash priority of the member id (vectorized
    ``_id_rank60``; hash-order "random" — reproducible at any cluster
    size, the T6 sampling discipline; reference analogue: the
    golden-pair eval sets of hcmut_assigment/test.json).  Pairing
    members against the min-id representative (not all-pairs) keeps
    the queue linear in cluster count.

    Shape: the assignments panel ((id, label) rows, content never
    moves) groups per cluster; the pick is an in-group argsort of
    member-count integer ranks.  Full SQL oracle (recursive-CTE
    clusters + row_number over the same sm64 priority)."""
    asg = _mh_assignments(sf_dir)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["record_id"].to_numpy(np.int64))
        if len(ids) < 2:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype=np.int64),
                    "id_a": pd.Series([], dtype=np.int64),
                    "id_b": pd.Series([], dtype=np.int64),
                    "pick_rank": pd.Series([], dtype=np.int64),
                }
            )
        rep = int(ids[0])
        members = ids[1:]
        pri = _id_rank60(members, _REVIEW_SALT)
        order = np.lexsort((members, pri))[:2]
        return pd.DataFrame(
            {
                "cluster_id": np.full(len(order), g["cluster_id"].iloc[0],
                                      dtype=np.int64),
                "id_a": np.full(len(order), rep, dtype=np.int64),
                "id_b": members[order],
                "pick_rank": np.arange(1, len(order) + 1, dtype=np.int64),
            }
        )

    return asg.groupby("cluster_id").map_groups(pick, batch_format="pandas")


def q_events_hourly_dense(sf_dir: str):
    """GAP-FILLED hourly series — ``events_hourly`` emits only hours
    that HAVE events; every downstream window/decay/anomaly computation
    needs the dense grid (a missing hour is a zero, not an absent
    row).  Emits every (event_type, hour) in the global hour span with
    zero-filled counts — the generate_series + LEFT JOIN fill of SQL,
    as a distributed op.

    Shape: the same per-batch (type, hour, n) partials as
    ``events_hourly`` (panel-sized, never event rows); the global
    [min, max] hour folds from the partial panel on the driver
    (types × hours × blocks tiny rows) and broadcasts into the
    per-type combine, which emits the dense grid directly.  Hours
    travel as epoch-hour BIGINTs (no timestamp-dtype kind ambiguity).
    Full SQL oracle."""
    HOUR_US = 3_600_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].to_numpy().view("i8") // HOUR_US
        g = (
            pd.DataFrame({"event_type": df["event_type"], "h": h})
            .groupby(["event_type", "h"], sort=False, as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "h": g["h"].astype(np.int64),
                "part_n": g["size"].astype(np.int64),
            }
        )

    partials = ev.map_batches(partial, batch_format="pandas").materialize()
    lo, hi = None, None
    for b in partials.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        hs = np.asarray(b["h"], dtype=np.int64)
        if len(hs):
            lo = int(hs.min()) if lo is None else min(lo, int(hs.min()))
            hi = int(hs.max()) if hi is None else max(hi, int(hs.max()))
    span_ref = ray.put((lo, hi))

    def dense(g: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_ = ray.get(span_ref)
        grid = np.arange(lo_, hi_ + 1, dtype=np.int64)
        n = np.zeros(len(grid), dtype=np.int64)
        agg = g.groupby("h", as_index=False)["part_n"].sum()
        n[agg["h"].to_numpy(np.int64) - lo_] = agg["part_n"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * len(grid),
                "hour_epoch": grid,
                "n_events": n,
            }
        )

    return partials.groupby("event_type").map_groups(dense, batch_format="pandas")


def q_session_coverage(sf_dir: str):
    """Interval-UNION coverage — per day, how many µs are covered by at
    least one active session (the uptime/coverage dual of
    ``session_concurrency``'s peak): same gap-rule sessions, same
    day-boundary split, same boundary sweep — but instead of max of
    the running sum, it accumulates segment lengths where the running
    count is > 0 (closed intervals: a boundary instant itself counts
    one µs only through the segment arithmetic, pinned identically in
    SQL via lead()).  Output per day: n_sessions, covered_us,
    coverage_ppm of the 86 400-second day.

    Shape: identical to the concurrency op — two single-key shuffles,
    day groups hold session intervals.  Full SQL oracle (windowed
    running sum + lead segment lengths)."""
    from address_parser_ray.rayutil import default_num_partitions

    DAY = 86_400_000_000  # µs
    nparts = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    ).map_batches(_add_user_bucket(nparts), batch_format="pyarrow")

    def intervals_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uid = g["user_id"].to_numpy(dtype=np.int64)
        tsi = g["ts"].to_numpy().view("i8")
        order = np.lexsort((tsi, uid))
        uid, tsi = uid[order], tsi[order]
        first = np.concatenate([[True], uid[1:] != uid[:-1]])
        gap = np.concatenate([[True], (tsi[1:] - tsi[:-1]) > 1_800_000_000])
        starts = np.flatnonzero(first | gap)
        ends = np.append(starts[1:], uid.size) - 1
        st, en = tsi[starts], tsi[ends]
        d0, d1 = st // DAY, en // DAY
        ndays = (d1 - d0 + 1).astype(np.int64)
        total = int(ndays.sum())
        rep = np.repeat(np.arange(len(st)), ndays)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(ndays)[:-1]]), ndays
        )
        day = d0[rep] + offs
        cst = np.maximum(st[rep], day * DAY)
        cen = np.minimum(en[rep], day * DAY + DAY - 1)
        return pd.DataFrame({"day": day, "cst": cst, "cen": cen})

    def sweep_day(g: pd.DataFrame) -> pd.DataFrame:
        cst = g["cst"].to_numpy(np.int64)
        # half-open sweep [cst, cen+1): covered length sums exactly,
        # single-event sessions cover 1 µs — the rule lead() mirrors
        cen1 = g["cen"].to_numpy(np.int64) + 1
        t = np.concatenate([cst, cen1])
        d = np.concatenate(
            [np.ones(len(cst), dtype=np.int64), -np.ones(len(cen1), dtype=np.int64)]
        )
        order = np.lexsort((-d, t))
        ts_, ds_ = t[order], d[order]
        run = np.cumsum(ds_)
        seg = np.diff(ts_)  # length of [t_i, t_{i+1})
        covered = int(seg[run[:-1] > 0].sum())
        return pd.DataFrame(
            {
                "day_epoch": np.array([g["day"].iloc[0]], dtype=np.int64),
                "n_sessions": np.array([len(g)], dtype=np.int64),
                "covered_us": np.array([covered], dtype=np.int64),
                "coverage_ppm": np.array(
                    [covered * 1_000_000 // DAY], dtype=np.int64
                ),
            }
        )

    return (
        ev.groupby("bucket")
        .map_groups(intervals_bucket, batch_format="pandas")
        .groupby("day")
        .map_groups(sweep_day, batch_format="pandas")
    )


def q_lang_similarity(sf_dir: str):
    """Corpus-slice SIMILARITY MATRIX — pairwise cosine² between
    per-lang token-count vectors over the top-32 vocabulary, in exact
    integer ppm: cos²(a,b) = (Σ cₐc_b)²·10⁶ // (Σcₐ²·Σc_b²) — squaring
    avoids the sqrt, so an inherently float similarity becomes
    hash-exact (the ``embedding_near_dup`` trick applied to corpus
    profiling).  The report that says which slices share a token
    distribution (domain leakage / dedup-across-langs candidates).

    Shape: the same distributed top-K vocabulary as ``token_lift``;
    per-batch (lang, tok, n) partials → one fused-key combine; the
    (langs × 32) panel folds on the driver where Python bigints absorb
    the 10²⁸-scale numerators (HUGEINT on the SQL side).  Full SQL
    oracle."""
    from collections import Counter

    docs = _docs(sf_dir, ["lang", "text"])

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in df["text"]:
            for w in _WS_ASCII.split(text or ""):
                if w:
                    c[w] += 1
        return pd.DataFrame(
            {"tok": list(c.keys()), "n": np.fromiter(c.values(), dtype=np.int64)}
        )

    top = (
        docs.map_batches(count_partial, batch_format="pandas")
        .groupby("tok")
        .map_groups(
            lambda g: pd.DataFrame(
                {"tok": [g["tok"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .sort(["n", "tok"], descending=[True, False])
        .limit(_COOC_TOP)
        .to_pandas()["tok"]
        .tolist()
    )
    vset = frozenset(top)
    vref = ray.put(vset)

    def lv_partial(df: pd.DataFrame) -> pd.DataFrame:
        voc = ray.get(vref)
        c = Counter()
        for lang, text in zip(df["lang"], df["text"]):
            for w in _WS_ASCII.split(text or ""):
                if w in voc:
                    c[(lang, w)] += 1
        return pd.DataFrame(
            {
                "key": [f"{k[0]}\x1f{k[1]}" for k in c],
                "n": np.fromiter(c.values(), dtype=np.int64),
            }
        )

    panel = (
        docs.map_batches(lv_partial, batch_format="pandas")
        .groupby("key")
        .map_groups(
            lambda g: pd.DataFrame(
                {"key": [g["key"].iloc[0]], "n": [int(g["n"].sum())]}
            ),
            batch_format="pandas",
        )
        .to_pandas()
    )
    panel[["lang", "tok"]] = panel["key"].str.split("\x1f", expand=True)
    vecs: dict = {}
    for lang, grp in panel.groupby("lang"):
        vecs[lang] = {t: int(n) for t, n in zip(grp["tok"], grp["n"])}
    langs = sorted(vecs)
    out_a, out_b, out_d, out_c = [], [], [], []
    for i, la in enumerate(langs):
        va = vecs[la]
        n2a = sum(v * v for v in va.values())
        for lb in langs[i + 1 :]:
            vb = vecs[lb]
            n2b = sum(v * v for v in vb.values())
            dot = sum(va[t] * vb.get(t, 0) for t in va)
            out_a.append(la)
            out_b.append(lb)
            out_d.append(dot)
            out_c.append(dot * dot * 1_000_000 // max(n2a * n2b, 1))
    return pa.table(
        {
            "lang_a": pa.array(out_a, type=pa.string()),
            "lang_b": pa.array(out_b, type=pa.string()),
            "dot": pa.array(out_d, type=pa.int64()),
            "cos2_ppm": pa.array(out_c, type=pa.int64()),
        }
    )


def q_hourly_anomalies(sf_dir: str):
    """Timeseries ANOMALY detection — per event type, hours whose count
    sits more than 3σ from the type's mean over the DENSE hour grid
    (zeros included — the reason ``events_hourly_dense`` exists), using
    the division-free integer inequality (x·n − Σx)² > 9·(n·Σx² −
    (Σx)²) — exact bigints on both engines, zero float comparisons
    (the ``length_outliers`` rule applied to the time axis).  Output
    per type: grid size, anomaly count, and the worst offender
    (max-count hour, tie → earliest).

    Shape: the same panel partials as the dense series; moments and
    flags both fold inside one per-type group over the grid.  Full SQL
    oracle."""
    HOUR_US = 3_600_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].to_numpy().view("i8") // HOUR_US
        g = (
            pd.DataFrame({"event_type": df["event_type"], "h": h})
            .groupby(["event_type", "h"], sort=False, as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "h": g["h"].astype(np.int64),
                "part_n": g["size"].astype(np.int64),
            }
        )

    partials = ev.map_batches(partial, batch_format="pandas").materialize()
    lo, hi = None, None
    for b in partials.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        hs = np.asarray(b["h"], dtype=np.int64)
        if len(hs):
            lo = int(hs.min()) if lo is None else min(lo, int(hs.min()))
            hi = int(hs.max()) if hi is None else max(hi, int(hs.max()))
    span_ref = ray.put((lo, hi))

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_ = ray.get(span_ref)
        grid = np.arange(lo_, hi_ + 1, dtype=np.int64)
        x = np.zeros(len(grid), dtype=np.int64)
        agg = g.groupby("h", as_index=False)["part_n"].sum()
        x[agg["h"].to_numpy(np.int64) - lo_] = agg["part_n"].to_numpy(np.int64)
        n = len(grid)
        s1, s2 = int(x.sum()), int((x * x).sum())
        lhs = (x.astype(object) * n - s1) ** 2  # object → Python bigints
        rhs = 9 * (n * s2 - s1 * s1)
        anom = np.array([int(v) > rhs for v in lhs], dtype=bool)
        order = np.lexsort((grid, -x))
        worst = int(order[0])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]],
                "n_hours": np.array([n], dtype=np.int64),
                "n_anomalies": np.array([int(anom.sum())], dtype=np.int64),
                "max_hour_epoch": np.array([grid[worst]], dtype=np.int64),
                "max_n": np.array([x[worst]], dtype=np.int64),
            }
        )

    return partials.groupby("event_type").map_groups(flag, batch_format="pandas")


def q_hapax_stats(sf_dir: str):
    """Vocabulary-tail statistics — per lang: hapax legomena (tokens
    occurring exactly once) count and fraction, plus the integer
    type-token ratio.  The lexical-diversity signal of corpus
    linguistics: a high hapax fraction marks organic text (or OCR
    noise), a collapsed one marks template/boilerplate floods — the
    vocabulary-side complement of the per-doc ``repetition_stats``.

    Shape: per-batch (lang, tok) partial counts → one fused-key
    combine (shuffle bounded by vocabulary) → per-lang rollup of the
    count panel.  Pure-integer ppm.  Full SQL oracle."""
    from collections import Counter

    docs = _docs(sf_dir, ["lang", "text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for lang, text in zip(df["lang"], df["text"]):
            for w in _WS_ASCII.split(text or ""):
                if w:
                    c[(lang, w)] += 1
        return pd.DataFrame(
            {
                "key": [f"{k[0]}\x1f{k[1]}" for k in c],
                "n": np.fromiter(c.values(), dtype=np.int64),
            }
        )

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        lang = g["key"].iloc[0].split("\x1f", 1)[0]
        return pd.DataFrame(
            {
                "lang": [lang],
                "n": np.array([int(g["n"].sum())], dtype=np.int64),
            }
        )

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy(np.int64)
        vocab = len(n)
        tokens = int(n.sum())
        hapax = int((n == 1).sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_tokens": np.array([tokens], dtype=np.int64),
                "vocab_size": np.array([vocab], dtype=np.int64),
                "n_hapax": np.array([hapax], dtype=np.int64),
                "hapax_ppm": np.array(
                    [hapax * 1_000_000 // max(vocab, 1)], dtype=np.int64
                ),
                "ttr_ppm": np.array(
                    [vocab * 1_000_000 // max(tokens, 1)], dtype=np.int64
                ),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("key")
        .map_groups(combine, batch_format="pandas")
        .groupby("lang")
        .map_groups(rollup, batch_format="pandas")
    )


def q_mixed_lang_docs(sf_dir: str):
    """Mixed-language DOCUMENT detector — the curation filter LLM
    pipelines run before language-bucketed training: language-ID per
    LINE (the same stopword-argmax heuristic as ``langid_pred``, whose
    SQL twin is already hash-proven), then per doc the number of
    distinct predicted line languages; ≥ 2 ⇒ mixed (concatenated
    crawls, bilingual boilerplate).  Output per doc: line count,
    lines with a prediction, distinct langs, is_mixed.

    Shape: stateless ``map_batches`` with a per-batch line→lang cache
    (generated corpora repeat lines heavily — the BPE-eval compaction
    trick); per-doc partials only, no shuffle at all.  Full SQL oracle
    (line unnest + the proven langid CASE per line)."""
    from address_parser_ray.functions.text import detect_lang

    docs = _docs(sf_dir, ["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        cache: dict = {}
        out_id, out_nl, out_np, out_k, out_m = [], [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            lines = (text or "").split("\n")
            langs = set()
            npred = 0
            for ln in lines:
                p = cache.get(ln)
                if p is None:
                    p = detect_lang(ln)
                    cache[ln] = p
                if p != "unknown":
                    npred += 1
                    langs.add(p)
            out_id.append(doc_id)
            out_nl.append(len(lines))
            out_np.append(npred)
            out_k.append(len(langs))
            out_m.append(len(langs) >= 2)
        return pd.DataFrame(
            {
                "doc_id": np.asarray(out_id, dtype=np.int64),
                "n_lines": np.asarray(out_nl, dtype=np.int64),
                "n_pred_lines": np.asarray(out_np, dtype=np.int64),
                "n_langs": np.asarray(out_k, dtype=np.int64),
                "is_mixed": np.asarray(out_m, dtype=bool),
            }
        )

    return docs.map_batches(fn, batch_format="pandas")


def q_dup_cap_sample(sf_dir: str):
    """Duplicate-CAP sampling (the C4/Gopher curation middle ground):
    instead of collapsing each exact-dup group to one representative
    (``exact_dedup_groups``) keep the ``m = 2`` smallest doc_ids per
    content-sha256 group — natural duplication signal survives, but
    boilerplate can never dominate the token budget. Output per
    SURVIVOR: (doc_id, copy_idx 1-based, group_n).

    Shape: one content pass emits only (bucket, 32-byte sha, doc_id) —
    text never shuffles; the sha's own first 8 bytes pick the bucket so
    each group lives in exactly ONE bucket and the per-group head-2 is
    exact with a single single-key shuffle. Per bucket: one stable sort
    + cumcount (vectorized pandas), no Python loop over groups."""
    import hashlib

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    CAP = 2
    nparts = default_num_partitions()

    def emit(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        shas = [hashlib.sha256((x or "").encode()).digest() for x in texts]
        pref = np.frombuffer(
            b"".join(s[:8] for s in shas), dtype=np.uint64
        ) if shas else np.empty(0, dtype=np.uint64)
        bucket = (splitmix64(pref) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "sha": pa.array(shas, type=pa.binary()),
                "doc_id": t["doc_id"],
            }
        )

    def cap_groups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sha", "doc_id"], kind="stable")
        grp = g.groupby("sha", sort=False)
        copy_idx = grp.cumcount().to_numpy() + 1
        group_n = grp["doc_id"].transform("size").to_numpy(np.int64)
        keep = copy_idx <= CAP
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64)[keep],
                "copy_idx": copy_idx[keep].astype(np.int64),
                "group_n": group_n[keep],
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(cap_groups, batch_format="pandas")
        .sort("doc_id")
    )


def q_line_dedup_filter(sf_dir: str):
    """CCNet-style per-LINE corpus dedup as a TRANSFORM: a nonempty line
    occurrence is REMOVED when the identical line also occurs in some
    smaller-doc_id document (the min-doc_id owner keeps all its
    occurrences — "first wins" at line granularity). This is the unit
    the CCNet/RefinedWeb pipelines dedup at, distinct from the
    token-8-gram windows of ``dup_span_stats`` and the content-defined
    chunks of ``cdc_chunk_stats``. Output per doc: (doc_id, n_lines,
    n_kept, removed_chars); zero-line docs surface as zeros.

    Shape (the proven postings contract): one content pass emits
    (bucket, 16-byte blake2b line key, doc_id, cnt, clen) pre-counted
    per (doc, line) and hash-bucketed by key — lines never shuffle,
    only digests; each bucket computes the min owner per key in one
    vectorized pandas pass; a single-key ``groupby(doc_id)`` Sum
    combines. A key=b'' marker row per doc keeps empty docs present."""
    import hashlib
    from collections import Counter

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit_postings(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        docs, keys, cnts, lens = [], [], [], []
        for d, text in zip(doc_ids, texts):
            docs.append(d)  # marker row
            keys.append(b"")
            cnts.append(0)
            lens.append(0)
            c = Counter(ln for ln in (text or "").split("\n") if ln != "")
            for ln, n in c.items():
                docs.append(d)
                keys.append(
                    hashlib.blake2b(ln.encode(), digest_size=16).digest()
                )
                cnts.append(n)
                lens.append(len(ln))
        doc_arr = np.asarray(docs, dtype=np.int64)
        pref = np.array(
            [int.from_bytes(k[:8], "little") if k else 0 for k in keys],
            dtype=np.uint64,
        )
        is_marker = np.array([not k for k in keys], dtype=bool)
        mixed = np.where(is_marker, doc_arr.view(np.uint64), pref)
        bucket = (splitmix64(mixed) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "key": pa.array(keys, type=pa.binary()),
                "doc_id": pa.array(doc_arr),
                "cnt": pa.array(np.asarray(cnts, dtype=np.int64)),
                "clen": pa.array(np.asarray(lens, dtype=np.int64)),
            }
        )

    def bucket_stats(g: pd.DataFrame) -> pd.DataFrame:
        marker = g["key"].str.len() == 0
        lines = g[~marker]
        parts = [
            pd.DataFrame(
                {
                    "doc_id": g.loc[marker, "doc_id"].to_numpy(np.int64),
                    "part_n": np.int64(0),
                    "part_kept": np.int64(0),
                    "part_removed_chars": np.int64(0),
                }
            )
        ]
        if len(lines):
            owner = lines.groupby("key")["doc_id"].transform("min")
            own = (owner.to_numpy() == lines["doc_id"].to_numpy())
            cnt = lines["cnt"].to_numpy(np.int64)
            clen = lines["clen"].to_numpy(np.int64)
            per = (
                pd.DataFrame(
                    {
                        "doc_id": lines["doc_id"].to_numpy(np.int64),
                        "part_n": cnt,
                        "part_kept": np.where(own, cnt, 0),
                        "part_removed_chars": np.where(own, 0, clen * cnt),
                    }
                )
                .groupby("doc_id", sort=False, as_index=False)
                .sum()
            )
            parts.append(per)
        out = pd.concat(parts, ignore_index=True)
        for c in ("part_n", "part_kept", "part_removed_chars"):
            out[c] = out[c].astype(np.int64)
        return out

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_stats, batch_format="pandas")
        .groupby("doc_id")
        .aggregate(
            Sum("part_n", alias_name="n_lines"),
            Sum("part_kept", alias_name="n_kept"),
            Sum("part_removed_chars", alias_name="removed_chars"),
        )
        .sort("doc_id")
    )


_TF_DF_MIN, _TF_DF_MAX = 2, 4  # "rare phrase" document-frequency window


def q_tf_match_weights(sf_dir: str):
    """Splink-style term-frequency-ADJUSTED match evidence: two records
    sharing a RARE feature are far stronger match evidence than two
    sharing a common one — the TF adjustment every production linkage
    engine applies on top of Fellegi-Sunter m/u weights
    (``fellegi_sunter_em`` here). The feature unit is the token
    3-gram (phrase), because this corpus's whitespace vocabulary is a
    closed 31-word set (min df 25 — single tokens carry zero rarity);
    phrases recover a real df tail. Candidate pairs = docs sharing a
    3-gram with document frequency in [2, 4]; evidence = Σ over shared
    rare phrases of ``1_000_000 // df`` (integer micro-units — rarer ⇒
    heavier; no float log ever materializes, so the ranking is
    hash-exact). Output (doc_a, doc_b, tf_weight, n_shared_rare).

    Shape: pass 1 emits per-doc DISTINCT phrase postings (16-byte keys)
    hash-bucketed by phrase, so each phrase's exact df lives in one
    bucket; rare phrases fan out ≤ C(4,2) = 6 pair partials each — the
    df cap bounds the quadratic exactly like the blocking stage's
    max-block caps; pass 2 folds pair partials in pair-hash buckets.
    Content never shuffles; both shuffles carry only digests + ids."""
    import hashlib

    from address_parser_ray.functions.hashing import splitmix64
    from address_parser_ray.rayutil import default_num_partitions

    nparts = default_num_partitions()

    def emit_tokens(t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        docs, keys = [], []
        for d, text in zip(doc_ids, texts):
            toks = _ws_tokens(text)
            grams = {
                " ".join(toks[i : i + 3]).lower()
                for i in range(len(toks) - 2)
            }
            for w in grams:
                docs.append(d)
                keys.append(
                    hashlib.blake2b(w.encode(), digest_size=16).digest()
                )
        pref = (
            np.array(
                [int.from_bytes(k[:8], "little") for k in keys],
                dtype=np.uint64,
            )
            if keys
            else np.empty(0, dtype=np.uint64)
        )
        bucket = (splitmix64(pref) % np.uint64(nparts)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket),
                "key": pa.array(keys, type=pa.binary()),
                "doc_id": pa.array(np.asarray(docs, dtype=np.int64)),
            }
        )

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df_per_key = g.groupby("key")["doc_id"].transform("size")
        rare = g[(df_per_key >= _TF_DF_MIN) & (df_per_key <= _TF_DF_MAX)]
        out_a, out_b, out_w = [], [], []
        for _, grp in rare.groupby("key", sort=False):
            ids = np.sort(grp["doc_id"].to_numpy(np.int64))
            w = 1_000_000 // len(ids)
            ia, ib = np.triu_indices(len(ids), k=1)
            out_a.append(ids[ia])
            out_b.append(ids[ib])
            out_w.append(np.full(len(ia), w, dtype=np.int64))
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            w = np.concatenate(out_w)
        else:
            a = b = w = np.empty(0, dtype=np.int64)
        pb = (
            splitmix64(a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                       ^ b.view(np.uint64))
            % np.uint64(nparts)
        ).astype(np.int64)
        return pd.DataFrame(
            {"pair_bucket": pb, "doc_a": a, "doc_b": b, "w": w}
        )

    def fold_pairs(g: pd.DataFrame) -> pd.DataFrame:
        agg = (
            g.groupby(["doc_a", "doc_b"], sort=False)["w"]
            .agg(["sum", "size"])
            .reset_index()
        )
        return pd.DataFrame(
            {
                "doc_a": agg["doc_a"].to_numpy(np.int64),
                "doc_b": agg["doc_b"].to_numpy(np.int64),
                "tf_weight": agg["sum"].to_numpy(np.int64),
                "n_shared_rare": agg["size"].to_numpy(np.int64),
            }
        )

    return (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(emit_tokens, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(emit_pairs, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(fold_pairs, batch_format="pandas")
        .sort(["doc_a", "doc_b"])
    )


def q_cluster_density(sf_dir: str):
    """ER cluster-QA diagnostic (Splink's cluster-metrics surface): per
    near-dup cluster, the EDGE DENSITY — decided edges (score ≥
    match_threshold with both endpoints inside the cluster) over
    possible pairs n·(n-1)/2, in integer ppm. Low-density big clusters
    are the classic transitive-closure failure (one spurious bridge
    glues two real entities); density 10⁶ means a clique. Full SQL
    oracle since r4 (the flagship pipeline recomputed in DuckDB —
    ``oracle._build_flagship_lsh_sql`` ``scored_final``/``comp`` CTEs);
    cluster ids are 128-bit binary since r4 and drop out of the output,
    which compares as the per-cluster multiset. Output (n_members,
    n_edges, density_ppm), n ≥ 2 clusters with ≥ 1 decided edge only.

    Shape: assignments join onto the already-materialized scored-pairs
    panel via two id-bucketed ``pinned_join``s (ids only — content
    never moves); edge counts and member counts fold in one single-key
    groupby each."""
    res = _dedup_documents(sf_dir)
    thr = DEFAULT_CONFIG.match_threshold
    if res.scored_pairs is None:
        return pd.DataFrame(
            {
                "n_members": pd.Series([], dtype="int64"),
                "n_edges": pd.Series([], dtype="int64"),
                "density_ppm": pd.Series([], dtype="int64"),
            }
        )

    edges = res.scored_pairs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], thr)).select(
            ["id_a", "id_b"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    ej = pinned_join(edges, res.assignments, on="id_a", right_on="record_id")
    ej = pinned_join(ej, res.assignments, on="id_b", right_on="record_id")

    def same_cluster(t: pa.Table) -> pa.Table:
        from address_parser_ray.functions.hashing import ids_np, pack_ids

        ca = ids_np(t["cluster_id"])
        cb = ids_np(t["cluster_id_r"])
        keep = ca == cb
        return pa.table({"cluster_id": pack_ids(ca[keep])})

    edge_counts = (
        ej.map_batches(same_cluster, batch_format="pyarrow")
        .groupby("cluster_id")
        .aggregate(Count(alias_name="n_edges"))
    )
    members = res.assignments.groupby("cluster_id").aggregate(
        Count(alias_name="n_members")
    )
    j = pinned_join(members, edge_counts, on="cluster_id")

    def density(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_members"], dtype=np.int64)
        e = np.asarray(t["n_edges"], dtype=np.int64)
        keep = n >= 2
        n, e = n[keep], e[keep]
        possible = n * (n - 1) // 2
        return pa.table(
            {
                "n_members": pa.array(n),
                "n_edges": pa.array(e),
                "density_ppm": pa.array(
                    e * 1_000_000 // np.maximum(possible, 1)
                ),
            }
        )

    return j.map_batches(density, batch_format="pyarrow").sort(
        ["n_members", "n_edges"]
    )


def q_source_lang_gini(sf_dir: str):
    """Corpus-diversity diagnostic for mixture curation: per source, the
    Gini IMPURITY of its language distribution in integer ppm —
    ``1e6 − (1e6·Σnᵢ²)//n²`` (0 = monolingual source, → 1e6 = uniform
    mix). The integer form keeps the panel hash-exact (no float Σpᵢ²);
    a curation pipeline reads it to balance per-source sampling
    temperature. Output (source, n_docs, n_langs, gini_ppm).

    Shape: per-batch (source, lang) partial counts (domain-tiny), then
    ONE single-key groupby(source) whose map_groups folds that source's
    lang counts vectorized — no composite-key aggregate ever forms."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["source", "lang"], sort=False, as_index=False).agg(
            part_n=("lang", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        per_lang = g.groupby("lang", sort=False)["part_n"].sum().to_numpy(np.int64)
        n = int(per_lang.sum())
        ss = int((per_lang * per_lang).sum())
        return pd.DataFrame(
            {
                "source": [g["source"].iloc[0]],
                "n_docs": np.array([n], dtype=np.int64),
                "n_langs": np.array([len(per_lang)], dtype=np.int64),
                "gini_ppm": np.array(
                    [1_000_000 - (1_000_000 * ss) // (n * n)], dtype=np.int64
                ),
            }
        )

    return (
        _docs(sf_dir, ["source", "lang"])
        .map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(fold, batch_format="pandas")
        .sort("source")
    )


def q_k_anonymity_audit(sf_dir: str):
    """k-anonymity audit over the quasi-identifier (lang, source,
    n_chars // 256) — the privacy/compliance pass a training-data
    release runs: how many equivalence classes are smaller than k = 5
    (rows in them are re-identifiable by the QI combination alone).
    Output per class SIZE: (class_size, n_classes, n_docs, at_risk).

    Shape: per-batch partial counts over the QI triple collapse the
    stream to the class domain immediately; classes key a single-key
    groupby via a derived qid string; the size histogram is a second
    domain-tiny groupby. Nothing row-scale ever shuffles."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qid = (
            df["lang"].astype(str)
            + "|"
            + df["source"].astype(str)
            + "|"
            + (df["n_chars"].to_numpy(np.int64) // 256).astype(str)
        )
        g = pd.DataFrame({"qid": qid}).groupby("qid", sort=False, as_index=False).agg(
            part_n=("qid", "size")
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    classes = (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .groupby("qid")
        .aggregate(Sum("part_n", alias_name="class_size"))
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("class_size", sort=False, as_index=False).agg(
            n_classes=("class_size", "size")
        )
        g["n_docs"] = (
            g["class_size"].to_numpy(np.int64) * g["n_classes"].to_numpy(np.int64)
        )
        g["n_classes"] = g["n_classes"].astype(np.int64)
        return g[["class_size", "n_classes", "n_docs"]]

    return (
        classes.map_batches(hist, batch_format="pandas")
        .groupby("class_size")
        .aggregate(
            Sum("n_classes", alias_name="n_classes"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .map_batches(
            lambda df: df.assign(at_risk=df["class_size"] < 5),
            batch_format="pandas",
        )
        .sort("class_size")
    )


def q_benford_digits(sf_dir: str):
    """Benford first-digit screen over event values — the classic
    data-forensics DQ check for fabricated or unit-mangled numeric
    feeds: observed first-significant-digit shares of value-cents
    (> 0). Output (digit 1-9, n_events, share_ppm) with integer ppm
    shares (deviation from log10(1+1/d) is the reader's judgment —
    keeping floats out keeps the panel hash-exact). Shape: per-batch
    digit partials, one 9-row groupby; the total for ppm comes from
    the same 9-row panel — no second pass."""
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["value"].to_numpy(np.float64) * 100.0).astype(np.int64)
        cents = cents[cents > 0]
        if len(cents) == 0:
            return pd.DataFrame(
                {
                    "digit": pd.Series([], dtype="int64"),
                    "part_n": pd.Series([], dtype="int64"),
                }
            )
        # first significant digit via decimal string — the exact rule
        # the oracle's substr(CAST(cents AS VARCHAR),1,1) applies
        d = np.char.mod("%d", cents).astype("U1").astype(np.int64)
        u, c = np.unique(d, return_counts=True)
        return pd.DataFrame(
            {"digit": u.astype(np.int64), "part_n": c.astype(np.int64)}
        )

    panel = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("digit")
        .aggregate(Sum("part_n", alias_name="n_events"))
        .to_pandas()
        .sort_values("digit")
        .reset_index(drop=True)
    )
    total = int(panel["n_events"].sum())
    panel["n_events"] = panel["n_events"].astype(np.int64)
    panel["digit"] = panel["digit"].astype(np.int64)
    panel["share_ppm"] = (
        panel["n_events"].to_numpy(np.int64) * 1_000_000 // max(total, 1)
    )
    return panel


def q_cube_counts(sf_dir: str):
    """Full CUBE aggregate — all four grouping sets of (lang, source)
    from ONE corpus pass: each batch partial-aggregates the finest
    (lang, source) level locally and derives (lang, *), (*, source)
    and the grand total from it, so the cube costs zero extra shuffles
    over a flat groupby (``rollup_counts`` emits only the ROLLUP
    subset; CUBE adds the (*, source) slice).  The combine runs on one
    FUSED key — composite-key aggregate shuffles pay a multi-column
    sort in Ray's sort shuffle.  Pre-combine volume is bounded by
    (langs+1)·(sources+1) rows per block regardless of input size.
    Full SQL oracle (GROUP BY CUBE + GROUPING())."""
    SEP = "\x1f"

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        base = (
            df.groupby(["lang", "source"], sort=False)
            .agg(n=("n_chars", "size"), chars=("n_chars", "sum"))
            .reset_index()
        )
        by_lang = (
            base.groupby("lang", sort=False)
            .agg(n=("n", "sum"), chars=("chars", "sum"))
            .reset_index()
        )
        by_src = (
            base.groupby("source", sort=False)
            .agg(n=("n", "sum"), chars=("chars", "sum"))
            .reset_index()
        )
        rows = pd.concat(
            [
                pd.DataFrame(
                    {
                        "k": base["lang"] + SEP + base["source"],
                        "n": base["n"],
                        "chars": base["chars"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": by_lang["lang"] + SEP + "*",
                        "n": by_lang["n"],
                        "chars": by_lang["chars"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": "*" + SEP + by_src["source"],
                        "n": by_src["n"],
                        "chars": by_src["chars"],
                    }
                ),
                pd.DataFrame(
                    {
                        "k": ["*" + SEP + "*"],
                        "n": [int(base["n"].sum())],
                        "chars": [int(base["chars"].sum())],
                    }
                ),
            ],
            ignore_index=True,
        )
        rows["n"] = rows["n"].astype("int64")
        rows["chars"] = rows["chars"].astype("int64")
        return rows

    def split_key(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["k"].str.split(SEP, expand=True)
        return pd.DataFrame(
            {
                "lang": parts[0],
                "source": parts[1],
                "n_docs": df["n_docs"].astype("int64"),
                "n_chars": df["n_chars"].astype("int64"),
            }
        )

    return (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partials, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Sum("chars", alias_name="n_chars"),
        )
        .map_batches(split_key, batch_format="pandas")
        .sort(["lang", "source"])
    )


def q_oov_rate(sf_dir: str):
    """Held-out out-of-vocabulary rate — the train/holdout DISTINCT-set
    algebra (INTERSECT / EXCEPT counts) every tokenizer-training
    pipeline checks before freezing a vocabulary: docs split by the T6
    hash rule (doc_id % 10 == 0 → holdout), per-lang train vocabulary,
    holdout vocabulary, their intersection, and the holdout-only (OOV)
    count plus an integer-ppm OOV rate.  Shape: per-batch DISTINCT
    (lang, token) rows with train/holdout presence flags fused to one
    key (shuffle bounded by per-batch vocabulary, never token
    occurrences), Max-combined flags, then per-batch per-lang count
    partials → one langs-sized combine.  Tokens are the BPE
    pre-tokenizer classes (``_bpe_findall``, RE2 parity).  Full SQL
    oracle."""
    SEP = "\x1f"
    docs = _docs(sf_dir, ["doc_id", "lang", "text"])

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame(
            {
                "lang": df["lang"],
                "tok": _bpe_findall(df["text"]),
                "tr": (df["doc_id"].to_numpy(np.int64) % 10) != 0,
            }
        ).explode("tok")
        ex = ex[ex["tok"].notna()]
        if len(ex) == 0:
            return pd.DataFrame(
                {
                    "k": pd.Series([], dtype="str"),
                    "tr": pd.Series([], dtype="int64"),
                    "ho": pd.Series([], dtype="int64"),
                }
            )
        ex["ho"] = ~ex["tr"]
        g = ex.groupby(["lang", "tok"], sort=False, as_index=False)[
            ["tr", "ho"]
        ].max()
        return pd.DataFrame(
            {
                "k": g["lang"] + SEP + g["tok"],
                "tr": g["tr"].astype("int64"),
                "ho": g["ho"].astype("int64"),
            }
        )

    vocab = (
        docs.map_batches(vocab_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Max("tr", alias_name="in_train"),
            Max("ho", alias_name="in_holdout"),
        )
    )

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        lang = df["k"].str.split(SEP, n=1, expand=True)[0]
        tr = df["in_train"].to_numpy(np.int64)
        ho = df["in_holdout"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "lang": lang,
                    "ptr": tr,
                    "pho": ho,
                    "pboth": tr * ho,
                    "ponly": ((tr == 0) & (ho == 1)).astype(np.int64),
                }
            )
            .groupby("lang", as_index=False, sort=False)
            .sum()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["oov_ppm"] = out["n_holdout_only"].to_numpy(
            np.int64
        ) * 1_000_000 // np.maximum(
            out["n_holdout_vocab"].to_numpy(np.int64), 1
        )
        return out

    return (
        vocab.map_batches(count_partial, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("ptr", alias_name="n_train_vocab"),
            Sum("pho", alias_name="n_holdout_vocab"),
            Sum("pboth", alias_name="n_common"),
            Sum("ponly", alias_name="n_holdout_only"),
        )
        .map_batches(final, batch_format="pandas")
        .sort("lang")
    )


def q_mad_outliers(sf_dir: str):
    """Robust (median / MAD) length-outlier screen per lang — the
    outlier detector that survives the heavy tails that saturate the
    3σ z-score rule (``length_outliers``, whose mean and variance a
    single megabyte file drags): both the median and the median
    absolute deviation come from the SAME compacted (lang, n_chars)
    histogram via the pinned integer rank rule ``(50·n+99)//100``
    (shared with ``event_value_percentiles`` / ``winsorized_stats``);
    the deviation histogram is DERIVED from the value histogram, so
    the whole op is one corpus pass and the combine touches only
    langs × distinct-lengths panels.  A doc is an outlier iff
    |n_chars − median| > 3·MAD.  All integer.  Full SQL oracle."""
    docs = _docs(sf_dir, ["lang", "n_chars"])

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "v": np.asarray(t["n_chars"], dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "v"], as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), type=pa.string()),
                "v": pa.array(g["v"].to_numpy(np.int64)),
                "pn": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby("v", as_index=False)["pn"].sum().sort_values("v")
        v = h["v"].to_numpy(np.int64)
        n = h["pn"].to_numpy(np.int64)
        cum = np.cumsum(n)
        total = int(cum[-1])
        med = int(v[np.searchsorted(cum, (50 * total + 99) // 100)])
        dev = np.abs(v - med)
        dh = (
            pd.DataFrame({"dev": dev, "pn": n})
            .groupby("dev", as_index=False)["pn"]
            .sum()
            .sort_values("dev")
        )
        dcum = np.cumsum(dh["pn"].to_numpy(np.int64))
        mad = int(
            dh["dev"].to_numpy(np.int64)[
                np.searchsorted(dcum, (50 * total + 99) // 100)
            ]
        )
        n_out = int(n[dev > 3 * mad].sum())
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": np.array([total], dtype=np.int64),
                "median": np.array([med], dtype=np.int64),
                "mad": np.array([mad], dtype=np.int64),
                "n_outliers": np.array([n_out], dtype=np.int64),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def q_trending_types(sf_dir: str):
    """Day-over-day trend panel — dense per-type DAILY counts with the
    LAG delta (the "what spiked today" feed behind an ops dashboard):
    the same gap-filled-grid discipline as ``events_hourly_dense``
    (a missing day is a zero — deltas over a sparse series are wrong),
    days travel as epoch-day BIGINTs, and the first day's delta is its
    own count (LAG default 0).  Shape: per-batch (type, day) partials
    (panel-sized, never event rows), the global [min, max] day folds
    from the partial panel, and the per-type combine emits grid +
    delta in one pass.  Full SQL oracle (generate_series grid + lag
    window)."""
    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().view("i8") // DAY_US
        g = (
            pd.DataFrame({"event_type": df["event_type"], "d": d})
            .groupby(["event_type", "d"], sort=False, as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "d": g["d"].astype(np.int64),
                "part_n": g["size"].astype(np.int64),
            }
        )

    partials = ev.map_batches(partial, batch_format="pandas").materialize()
    lo, hi = None, None
    for b in partials.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        ds_ = np.asarray(b["d"], dtype=np.int64)
        if len(ds_):
            lo = int(ds_.min()) if lo is None else min(lo, int(ds_.min()))
            hi = int(ds_.max()) if hi is None else max(hi, int(ds_.max()))
    span_ref = ray.put((lo, hi))

    def dense(g: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_ = ray.get(span_ref)
        grid = np.arange(lo_, hi_ + 1, dtype=np.int64)
        n = np.zeros(len(grid), dtype=np.int64)
        agg = g.groupby("d", as_index=False)["part_n"].sum()
        n[agg["d"].to_numpy(np.int64) - lo_] = agg["part_n"].to_numpy(np.int64)
        delta = n - np.concatenate([[0], n[:-1]])
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * len(grid),
                "day_epoch": grid,
                "n_events": n,
                "delta": delta,
            }
        )

    return partials.groupby("event_type").map_groups(dense, batch_format="pandas")


def q_copurchase_pairs(sf_dir: str):
    """Frequent-itemset pair mining over FACTS — parts co-occurring in
    the same order (the market-basket dual of ``token_lift``'s document
    co-occurrence): distinct (order, part) per order → C(m,2) pair
    emission inside orderkey-hash buckets (run-length-vectorized triu,
    the simhash trick — no per-order Python loop), a fused-key
    pair-count combine, then the global top-20 by
    (n_orders DESC, pk_a, pk_b) — a pinned TOTAL order (pairs are
    unique) so the cut is deterministic under the count ties a basket
    workload always has.  Order baskets are domain-bounded (≤7
    lineitems in the TPC-H shape), so pair volume is linear in orders.
    Full SQL oracle (distinct self-join + ordered LIMIT)."""
    from address_parser_ray.rayutil import default_num_partitions

    NB = default_num_partitions()
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def bucket(t: pa.Table) -> pa.Table:
        ok = np.asarray(t["l_orderkey"], dtype=np.int64)
        return pa.table(
            {
                "b": pa.array(ok % NB),
                "ok": pa.array(ok),
                "pk": pa.array(np.asarray(t["l_partkey"], dtype=np.int64)),
            }
        )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ok = g["ok"].to_numpy(np.int64)
        pk = g["pk"].to_numpy(np.int64)
        order = np.lexsort((pk, ok))
        ok, pk = ok[order], pk[order]
        keep = np.concatenate(
            [[True], (ok[1:] != ok[:-1]) | (pk[1:] != pk[:-1])]
        )
        ok, pk = ok[keep], pk[keep]
        if ok.size < 2:
            return pd.DataFrame(
                {
                    "pk_a": pd.Series([], dtype="int64"),
                    "pk_b": pd.Series([], dtype="int64"),
                    "pn": pd.Series([], dtype="int64"),
                }
            )
        change = np.flatnonzero(np.diff(ok)) + 1
        starts = np.concatenate([[0], change])
        lens = np.diff(np.concatenate([starts, [ok.size]]))
        out_a, out_b = [], []
        for m in np.unique(lens):
            if m < 2:
                continue
            sel = starts[lens == m]
            pkm = pk[sel[:, None] + np.arange(m)[None, :]]
            iu, ju = np.triu_indices(int(m), k=1)
            out_a.append(pkm[:, iu].ravel())
            out_b.append(pkm[:, ju].ravel())
        if not out_a:
            return pd.DataFrame(
                {
                    "pk_a": pd.Series([], dtype="int64"),
                    "pk_b": pd.Series([], dtype="int64"),
                    "pn": pd.Series([], dtype="int64"),
                }
            )
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        # in-order parts are sorted ascending, so a < b always holds;
        # pack the pair into ONE int64 key (a global multi-column sort
        # over the pair panel is the pathological composite-key path —
        # measured 105 s vs <2 s with the packed key + local-top-k cut)
        # a < b always, so bounding b bounds BOTH halves of the packed key
        if b.size and int(b.max()) >= (1 << 31):
            raise NotImplementedError(
                "copurchase_pairs int64 pair packing exceeded — widen the key"
            )
        key = a * (1 << 31) + b
        u, c = np.unique(key, return_counts=True)
        return pd.DataFrame(
            {"pair": u, "pb": (u % NB).astype(np.int64), "pn": c.astype(np.int64)}
        )

    def combine_topk(df: pd.DataFrame) -> pd.DataFrame:
        # a pair lives in exactly ONE pair-hash bucket, so counts are
        # complete here and the top-20 cut is valid per bucket — a
        # per-key Ray aggregate over ~10^6 distinct pairs measured
        # 100+ s; this vectorized bincount combine runs in <1 s
        pair = df["pair"].to_numpy(np.int64)
        pn = df["pn"].to_numpy(np.int64)
        u, inv = np.unique(pair, return_inverse=True)
        n = np.bincount(inv, weights=pn).astype(np.int64)
        pk_a = u >> 31
        pk_b = u & ((1 << 31) - 1)
        order = np.lexsort((pk_b, pk_a, -n))[:20]
        return pd.DataFrame(
            {
                "pk_a": pk_a[order].astype(np.int64),
                "pk_b": pk_b[order].astype(np.int64),
                "n_orders": n[order].astype(np.int64),
            }
        )

    # per-bucket top-20 partials (buckets × 20 tiny rows reach the
    # driver), one final pandas cut under the same pinned total order
    locals_ = (
        li.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("b")
        .map_groups(pairs, batch_format="pandas")
        .groupby("pb")
        .map_groups(combine_topk, batch_format="pandas")
        .to_pandas()
    )
    return (
        locals_.sort_values(
            ["n_orders", "pk_a", "pk_b"], ascending=[False, True, True]
        )
        .head(20)
        .reset_index(drop=True)
    )


def q_l_diversity_audit(sf_dir: str):
    """l-diversity audit — the sibling of ``k_anonymity_audit`` that
    k-anonymity alone misses: a QI class can be large yet expose its
    members if every row shares the SAME sensitive value.  QI =
    (source, n_chars // 256), sensitive attribute = lang; l(class) =
    distinct langs in the class.  Output per l: (l_distinct,
    n_classes, n_docs, at_risk = l < 2 — a homogeneous class leaks
    the sensitive value outright).

    Shape: per-batch partial (qid, lang) counts collapse the stream to
    the class × sensitive domain; one fused-key combine; per-qid l and
    doc counts fold from that panel (per-batch partials again); the l
    histogram is a third domain-tiny groupby.  Nothing row-scale
    shuffles.  Full SQL oracle."""
    SEP = "\x1f"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        key = (
            df["source"].astype(str)
            + SEP
            + (df["n_chars"].to_numpy(np.int64) // 256).astype(str)
            + SEP
            + df["lang"].astype(str)
        )
        g = (
            pd.DataFrame({"ql": key})
            .groupby("ql", sort=False, as_index=False)
            .agg(part_n=("ql", "size"))
        )
        g["part_n"] = g["part_n"].astype(np.int64)
        return g

    cells = (
        _docs(sf_dir, ["lang", "source", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .groupby("ql")
        .aggregate(Sum("part_n", alias_name="n"))
    )

    def per_class(df: pd.DataFrame) -> pd.DataFrame:
        qid = df["ql"].str.rsplit(SEP, n=1, expand=True)[0]
        g = (
            pd.DataFrame({"qid": qid, "pl": 1, "pd_": df["n"].to_numpy(np.int64)})
            .groupby("qid", sort=False, as_index=False)
            .sum()
        )
        g["pl"] = g["pl"].astype(np.int64)
        g["pd_"] = g["pd_"].astype(np.int64)
        return g

    classes = (
        cells.map_batches(per_class, batch_format="pandas")
        .groupby("qid")
        .aggregate(
            Sum("pl", alias_name="l_distinct"),
            Sum("pd_", alias_name="n_docs_c"),
        )
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_distinct", sort=False, as_index=False).agg(
            n_classes=("l_distinct", "size"), n_docs=("n_docs_c", "sum")
        )
        g["n_classes"] = g["n_classes"].astype(np.int64)
        g["n_docs"] = g["n_docs"].astype(np.int64)
        return g

    return (
        classes.map_batches(hist, batch_format="pandas")
        .groupby("l_distinct")
        .aggregate(
            Sum("n_classes", alias_name="n_classes"),
            Sum("n_docs", alias_name="n_docs"),
        )
        .map_batches(
            lambda df: df.assign(at_risk=df["l_distinct"] < 2),
            batch_format="pandas",
        )
        .sort("l_distinct")
    )


def q_cumulative_users(sf_dir: str):
    """Cumulative distinct users per day — the RUNNING-DISTINCT shape
    (growth dashboards, "total accounts ever active"): naive
    count(DISTINCT) per day re-scans history; the distributed form is
    first-seen-day per user (a users-sized panel), a day histogram of
    first-seens, and one prefix sum over the dense day grid.  Days as
    epoch-day BIGINTs; grid span = [min, max] event day, both folded
    from the SAME user panel (min first-seen / max last-seen).  Output
    (day_epoch, n_new_users, n_cum_users).  Full SQL oracle (window
    sum over a generate_series grid)."""
    DAY_US = 86_400_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["ts"].to_numpy().view("i8") // DAY_US
        g = (
            pd.DataFrame({"user_id": df["user_id"], "d": d})
            .groupby("user_id", sort=False, as_index=False)
            .agg(pmin=("d", "min"), pmax=("d", "max"))
        )
        g["pmin"] = g["pmin"].astype(np.int64)
        g["pmax"] = g["pmax"].astype(np.int64)
        return g

    users = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(
            Min("pmin", alias_name="first_day"),
            Max("pmax", alias_name="last_day"),
        )
        .materialize()
    )

    # fold the users panel down to a DAYS-sized panel distributed —
    # the driver only ever touches (days × blocks) tiny rows: per-batch
    # first-seen-day counts plus a per-batch max(last_day) marker row
    # (pn = 0) so the grid's right edge folds from the same panel.
    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        fd = df["first_day"].to_numpy(np.int64)
        g = (
            pd.DataFrame({"d": fd})
            .groupby("d", sort=False, as_index=False)
            .agg(pn=("d", "size"))
        )
        marker = pd.DataFrame(
            {"d": [int(df["last_day"].to_numpy(np.int64).max())], "pn": [0]}
        )
        out = pd.concat([g, marker], ignore_index=True)
        out["d"] = out["d"].astype(np.int64)
        out["pn"] = out["pn"].astype(np.int64)
        return out

    panel = (
        users.map_batches(day_partial, batch_format="pandas")
        .groupby("d")
        .aggregate(Sum("pn", alias_name="n_new"))
        .to_pandas()
        .sort_values("d")
        .reset_index(drop=True)
    )
    lo = int(panel["d"].min())
    hi = int(panel["d"].max())
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    n = np.zeros(len(grid), dtype=np.int64)
    n[panel["d"].to_numpy(np.int64) - lo] = panel["n_new"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "day_epoch": grid,
            "n_new_users": n,
            "n_cum_users": np.cumsum(n),
        }
    )


def q_weekly_churn(sf_dir: str):
    """Weekly churn — users active in week w but absent in week w+1
    (the LEAD-absence window every retention report is built on; the
    final week churns by definition, as in the SQL twin).  Weeks are
    epoch-µs // 7-day buckets (deterministic, no ISO-week locale
    semantics).  Shape: per-batch DISTINCT (user, week) partials
    (shuffle bounded by users × weeks, never events), user-hash
    buckets, one vectorized next-week membership probe per bucket
    (sorted fused (user, week) keys + searchsorted — no per-user
    loop), per-week partials → one weeks-sized combine with integer
    churn_ppm.  Full SQL oracle (distinct self-join on w+1)."""
    from address_parser_ray.rayutil import default_num_partitions

    WEEK_US = 604_800_000_000
    NB = default_num_partitions()
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].to_numpy().view("i8") // WEEK_US
        g = (
            pd.DataFrame({"user_id": df["user_id"], "w": w})
            .drop_duplicates()
            .reset_index(drop=True)
        )
        g["b"] = g["user_id"].to_numpy(np.int64) % NB
        g["w"] = g["w"].astype(np.int64)
        return g

    def probe(g: pd.DataFrame) -> pd.DataFrame:
        uw = g[["user_id", "w"]].drop_duplicates()
        u = uw["user_id"].to_numpy(np.int64)
        w = uw["w"].to_numpy(np.int64)
        # fused sortable key: (user, week) — week spans are tiny, so
        # u * 2^20 + (w - min_w) cannot collide or overflow
        off = w - w.min()
        if u.size and (int(u.max()) >= (1 << 43) or int(off.max()) >= (1 << 20) - 1):
            raise NotImplementedError(
                "weekly_churn int64 packing exceeded — raise the bucket "
                "fan-out or widen the key"
            )
        key = u * (1 << 20) + off
        order = np.argsort(key)
        key_sorted = key[order]
        nxt = key + 1  # same user, week + 1
        idx = np.searchsorted(key_sorted, nxt)
        has_next = (idx < key_sorted.size) & (
            key_sorted[np.minimum(idx, key_sorted.size - 1)] == nxt
        )
        out = (
            pd.DataFrame({"w": w, "act": 1, "churn": (~has_next).astype(np.int64)})
            .groupby("w", sort=False, as_index=False)
            .sum()
        )
        out["act"] = out["act"].astype(np.int64)
        out["churn"] = out["churn"].astype(np.int64)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "week_epoch": df["w"].astype(np.int64),
                "n_active": df["n_active"].astype(np.int64),
                "n_churned": df["n_churned"].astype(np.int64),
                "churn_ppm": df["n_churned"].to_numpy(np.int64)
                * 1_000_000
                // np.maximum(df["n_active"].to_numpy(np.int64), 1),
            }
        )

    return (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("b")
        .map_groups(probe, batch_format="pandas")
        .groupby("w")
        .aggregate(
            Sum("act", alias_name="n_active"),
            Sum("churn", alias_name="n_churned"),
        )
        .map_batches(final, batch_format="pandas")
        .sort("week_epoch")
    )


def q_fanout_histogram(sf_dir: str):
    """FK fanout profile — the 1:N cardinality histogram (orders per
    customer, INCLUDING the zero bucket) that a join planner and every
    skew diagnosis starts from: per-batch partial counts by custkey,
    one key-bounded combine, a histogram pass over the counts panel,
    and the zero bucket closed from the customer dimension count minus
    the distinct ordering customers (no anti-join needed — the
    arithmetic is exact because TPC-H FKs hold, and the SQL twin's
    LEFT JOIN encodes the same rule).  Output (n_orders, n_customers).
    Full SQL oracle."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    )
    n_cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).count()

    def partial(t: pa.Table) -> pa.Table:
        ck = np.asarray(t["o_custkey"], dtype=np.int64)
        u, c = np.unique(ck, return_counts=True)
        return pa.table({"ck": pa.array(u), "pn": pa.array(c.astype(np.int64))})

    counts = (
        orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ck")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", sort=False, as_index=False).agg(
            pc=("n", "size")
        )
        g["n"] = g["n"].astype(np.int64)
        g["pc"] = g["pc"].astype(np.int64)
        return g

    panel = (
        counts.map_batches(hist, batch_format="pandas")
        .groupby("n")
        .aggregate(Sum("pc", alias_name="n_customers"))
        .to_pandas()
        .sort_values("n")
        .reset_index(drop=True)
    )
    n_with_orders = int(panel["n_customers"].sum())
    zero = pd.DataFrame(
        {"n": np.array([0], dtype=np.int64),
         "n_customers": np.array([n_cust - n_with_orders], dtype=np.int64)}
    )
    out = pd.concat([zero, panel], ignore_index=True)
    out = out[out["n_customers"] > 0].reset_index(drop=True)
    return pd.DataFrame(
        {
            "n_orders": out["n"].astype(np.int64),
            "n_customers": out["n_customers"].astype(np.int64),
        }
    )


def q_match_waterfall(sf_dir: str):
    """Tiered match waterfall — the MDM-style dedup cascade report
    (exact → case-folded → whitespace-normalized), each tier a strictly
    cheaper deterministic rule applied BEFORE fuzzy matching ever runs:
    per tier, the number of distinct keys (groups), docs, and dup docs
    the tier alone would remove.  The reference's shape is the
    normalize-then-exact-match short-circuit in ``_match_reference``
    (``fuzz/inexus_parser.py:1718-1756``) ahead of the fuzzy scorer.

    Shape: ONE corpus pass emits per-batch partial counts per
    (tier, hash-of-key) — vectorized 60-bit ``_text_60bit`` digests
    (equality-only; the oracle counts DISTINCT actual strings) bound
    the shuffle regardless of text width; a fused-key combine; then
    per-tier rollups fold from the digest panel.  Full SQL oracle
    (count(DISTINCT) per tier)."""
    SEP = "\x1f"
    # explicit class: Python ASCII \s includes \x0b (vertical tab) but
    # RE2/DuckDB \s does not — pin BOTH engine and oracle to the same
    # [ \t\n\f\r] set so \v-bearing texts can't diverge
    _ws = re.compile(r"[ \t\n\f\r]+")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        tiers = {
            "1_raw": texts,
            "2_lower": texts.str.lower(),
            # strip(" ") not strip(): after the sub, edges are plain
            # spaces; bare strip() would also eat \v, which DuckDB's
            # trim() does not
            "3_ws_norm": texts.str.lower().map(
                lambda s: _ws.sub(" ", s).strip(" ")
            ),
        }
        frames = []
        for tier, keys in tiers.items():
            dig = _text_60bit(keys.tolist())
            g = (
                pd.DataFrame(
                    {"tk": pd.Series(dig).astype(str).radd(tier + SEP)}
                )
                .groupby("tk", sort=False, as_index=False)
                .agg(pn=("tk", "size"))
            )
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        out["pn"] = out["pn"].astype(np.int64)
        return out

    keys = (
        _docs(sf_dir, ["text"])
        .map_batches(partial, batch_format="pandas")
        .groupby("tk")
        .aggregate(Sum("pn", alias_name="n"))
    )

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        tier = df["tk"].str.split(SEP, n=1, expand=True)[0]
        g = (
            pd.DataFrame(
                {"tier": tier, "pg": 1, "pd_": df["n"].to_numpy(np.int64)}
            )
            .groupby("tier", sort=False, as_index=False)
            .sum()
        )
        g["pg"] = g["pg"].astype(np.int64)
        g["pd_"] = g["pd_"].astype(np.int64)
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tier": df["tier"],
                "n_groups": df["n_groups"].astype(np.int64),
                "n_docs": df["n_docs"].astype(np.int64),
                "n_dup_docs": (
                    df["n_docs"].to_numpy(np.int64)
                    - df["n_groups"].to_numpy(np.int64)
                ),
            }
        )

    return (
        keys.map_batches(rollup, batch_format="pandas")
        .groupby("tier")
        .aggregate(
            Sum("pg", alias_name="n_groups"),
            Sum("pd_", alias_name="n_docs"),
        )
        .map_batches(final, batch_format="pandas")
        .sort("tier")
    )


def q_csv_read_counts(sf_dir: str):
    """CSV source round-trip proof — documents written to CSV (quoted
    fields, one file per block) and read back through
    ``sources.read_csv_corpus`` (``newlines_in_values`` parse), then
    aggregated per lang: doc count, char sum, and the 60-bit
    ``_text_60bit`` content hash summed mod 2^61 — the fold makes the oracle
    comparison sensitive to ANY text corruption through the CSV
    quoting layer, not just row counts.  The oracle reads the original
    Parquet — hash equality IS the round-trip proof.  (CSV is the
    interchange format beside JSONL; Parquet remains the scale
    format — this op exists to prove the reader/writer pair.)

    Single-node assumption: the CSV staging dir lives under the
    driver's /tmp, which workers share only in local mode; a cluster
    deployment would point it at shared storage (s3://...).  The per-
    lang panel (≤ |langs| rows) is materialized so the staging dir can
    be removed before returning."""
    import shutil
    import tempfile

    from address_parser_ray.sources import read_csv_corpus, write_csv

    tmp = tempfile.mkdtemp(prefix="apr_csv_")
    docs = _docs(sf_dir, ["doc_id", "lang", "text", "n_chars"])
    write_csv(docs, tmp)
    back = read_csv_corpus(tmp, ["doc_id", "lang", "text", "n_chars"])

    MOD = 1 << 61

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        folds = _text_60bit(df["text"].tolist())
        g = pd.DataFrame(
            {
                "lang": df["lang"],
                "pn": np.ones(len(df), dtype=np.int64),
                "pc": df["n_chars"].to_numpy(np.int64),
                "pf": folds,
            }
        ).groupby("lang", sort=False, as_index=False)
        out = g.agg(
            pn=("pn", "sum"),
            pc=("pc", "sum"),
            pf=("pf", lambda s: int(sum(int(x) for x in s) % MOD)),
        )
        for c in ("pn", "pc", "pf"):
            out[c] = out[c].astype(np.int64)
        return out

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]],
                "n_docs": np.array([g["pn"].sum()], dtype=np.int64),
                "n_chars": np.array([g["pc"].sum()], dtype=np.int64),
                "text_fold": np.array(
                    [int(sum(int(x) for x in g["pf"]) % MOD)], dtype=np.int64
                ),
            }
        )

    out = (
        back.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
        .materialize()  # ≤ |langs| rows — lets the staging dir go away
    )
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_except_all_tokens(sf_dir: str):
    """Bag-semantics EXCEPT ALL / INTERSECT ALL between the train and
    holdout slices — the multiset complement of ``oov_rate``'s
    DISTINCT-set algebra (set ops say WHICH tokens differ; bag ops say
    by HOW MANY occurrences, which is what mixture rebalancing needs):
    per lang, total train/holdout token occurrences,
    Σ max(c_train − c_holdout, 0) (EXCEPT ALL size) and
    Σ min(c_train, c_holdout) (INTERSECT ALL size).  Same
    vocabulary-bounded shuffle shape as ``oov_rate`` with Sum partials
    instead of Max flags.  Full SQL oracle (greatest/least over the
    per-token count panel)."""
    SEP = "\x1f"
    docs = _docs(sf_dir, ["doc_id", "lang", "text"])

    def vocab_partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame(
            {
                "lang": df["lang"],
                "tok": _bpe_findall(df["text"]),
                "tr": (df["doc_id"].to_numpy(np.int64) % 10) != 0,
            }
        ).explode("tok")
        ex = ex[ex["tok"].notna()]
        if len(ex) == 0:
            return pd.DataFrame(
                {
                    "k": pd.Series([], dtype="str"),
                    "ctr": pd.Series([], dtype="int64"),
                    "cho": pd.Series([], dtype="int64"),
                }
            )
        ex["ctr"] = ex["tr"].astype(np.int64)
        ex["cho"] = (~ex["tr"]).astype(np.int64)
        g = ex.groupby(["lang", "tok"], sort=False, as_index=False)[
            ["ctr", "cho"]
        ].sum()
        return pd.DataFrame(
            {
                "k": g["lang"] + SEP + g["tok"],
                "ctr": g["ctr"].astype("int64"),
                "cho": g["cho"].astype("int64"),
            }
        )

    counts = (
        docs.map_batches(vocab_partial, batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("ctr", alias_name="c_train"),
            Sum("cho", alias_name="c_holdout"),
        )
    )

    def per_lang(df: pd.DataFrame) -> pd.DataFrame:
        lang = df["k"].str.split(SEP, n=1, expand=True)[0]
        ctr = df["c_train"].to_numpy(np.int64)
        cho = df["c_holdout"].to_numpy(np.int64)
        g = (
            pd.DataFrame(
                {
                    "lang": lang,
                    "ptr": ctr,
                    "pho": cho,
                    "pex": np.maximum(ctr - cho, 0),
                    "pin": np.minimum(ctr, cho),
                }
            )
            .groupby("lang", as_index=False, sort=False)
            .sum()
        )
        return g

    return (
        counts.map_batches(per_lang, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("ptr", alias_name="n_train_tokens"),
            Sum("pho", alias_name="n_holdout_tokens"),
            Sum("pex", alias_name="except_all"),
            Sum("pin", alias_name="intersect_all"),
        )
        .sort("lang")
    )


def q_percentile_rank_docs(sf_dir: str):
    """Per-doc PERCENT_RANK within its lang over n_chars — the
    doc-level window-function dual of the panel percentile ops: rank
    position as integer ppm, ``(#{v' < v}) · 10⁶ // (n − 1)`` (exactly
    SQL's ``(rank() − 1)/(n − 1)`` with ties taking the min rank).
    Distributed as broadcast-histogram ranking: pass 1 compacts to the
    per-lang (value, count) panel (langs × distinct lengths — small by
    domain), the driver turns it into sorted values + cumulative-less
    arrays broadcast once; pass 2 ranks every doc with one vectorized
    searchsorted per batch — no global sort, no per-lang shuffle of doc
    rows.  Full SQL oracle (rank/count windows)."""
    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])

    def hist_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": t["lang"].to_pylist(),
                "v": np.asarray(t["n_chars"], dtype=np.int64),
            }
        )
        g = df.groupby(["lang", "v"], as_index=False).size()
        return pa.table(
            {
                "lang": pa.array(g["lang"].tolist(), type=pa.string()),
                "v": pa.array(g["v"].to_numpy(np.int64)),
                "pn": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    panel = (
        docs.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lang")
        .map_groups(
            lambda g: g.groupby(["lang", "v"], as_index=False)["pn"].sum(),
            batch_format="pandas",
        )
        .to_pandas()
    )
    lut = {}
    for lang, g in panel.groupby("lang"):
        g = g.sort_values("v")
        v = g["v"].to_numpy(np.int64)
        n = g["pn"].to_numpy(np.int64)
        cum_less = np.concatenate([[0], np.cumsum(n)[:-1]])
        lut[lang] = (v, cum_less, int(n.sum()))
    lut_ref = ray.put(lut)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        lut_m = ray.get(lut_ref)
        out = np.zeros(len(df), dtype=np.int64)
        vals = df["n_chars"].to_numpy(np.int64)
        langs = df["lang"].to_numpy()
        for lang in pd.unique(langs):
            v, cum_less, n = lut_m[lang]
            m = langs == lang
            idx = np.searchsorted(v, vals[m])
            out[m] = cum_less[idx] * 1_000_000 // max(n - 1, 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype(np.int64),
                "lang": df["lang"],
                "pct_rank_ppm": out,
            }
        )

    return docs.map_batches(rank, batch_format="pandas")


def q_loo_target_encoding(sf_dir: str):
    """Leave-one-out target encoding — the ML feature-engineering op
    that replaces a categorical (source) with the mean of a target
    (n_chars) over the OTHER rows of the category, preventing the
    self-leakage plain mean encoding has: per doc,
    ``(Σ_src − x) · 1000 // (n_src − 1)`` in integer milli (floor ==
    truncation on the nonnegative operands).  Singleton categories are
    dropped on both sides (no other row to encode from).  Shape: one
    pass builds the sources-sized (n, Σ) moment panel, broadcast once;
    the encode pass is vectorized lookups — the canonical
    broadcast-dimension pattern.  Full SQL oracle (window sums)."""
    docs = _docs(sf_dir, ["doc_id", "source", "n_chars"])

    def moment_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {"source": df["source"], "pn": 1, "ps": df["n_chars"]}
            )
            .groupby("source", as_index=False, sort=False)
            .sum()
        )
        g["pn"] = g["pn"].astype(np.int64)
        g["ps"] = g["ps"].astype(np.int64)
        return g

    panel = (
        docs.map_batches(moment_partial, batch_format="pandas")
        .groupby("source")
        .aggregate(Sum("pn", alias_name="n"), Sum("ps", alias_name="s"))
        .to_pandas()
    )
    srcs = panel["source"].to_numpy()
    order = np.argsort(srcs)
    lut_ref = ray.put(
        (
            srcs[order],
            panel["n"].to_numpy(np.int64)[order],
            panel["s"].to_numpy(np.int64)[order],
        )
    )

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        s_keys, n_arr, s_arr = ray.get(lut_ref)
        idx = np.searchsorted(s_keys, df["source"].to_numpy())
        n = n_arr[idx]
        s = s_arr[idx]
        x = df["n_chars"].to_numpy(np.int64)
        keep = n >= 2
        loo = np.zeros(len(df), dtype=np.int64)
        loo[keep] = (s[keep] - x[keep]) * 1000 // (n[keep] - 1)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64)[keep],
                "source": df["source"].to_numpy()[keep],
                "loo_mean_milli": loo[keep],
            }
        )

    return docs.map_batches(encode, batch_format="pandas")


def q_cos_pair_histogram(sf_dir: str):
    """Cosine pair-distance histogram over a deterministic embedding
    sample — the calibration plot behind every near-dup / ANN
    threshold choice (where does the corpus's similarity mass sit
    relative to the 0.30 / τ gates?): the 64 smallest-vec_id rows (the
    shared seed-row rule, gathered DISTRIBUTED via
    ``_seed_embedding_rows``), all C(64,2) = 2016 pairwise cosines,
    bucketed at 0.1 width (``floor(cos·10 + 1e-7)`` — the same
    epsilon-before-floor boundary guard as ``embedding_near_dup``).
    The pair panel is sample-sized by construction; the corpus is
    never paired.  Full SQL oracle (row_number sample self-join +
    list_cosine_similarity)."""
    _, emb = _seed_embedding_rows(sf_dir, 64)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    en = emb / norms[:, None]
    cos = en @ en.T
    iu, ju = np.triu_indices(len(en), k=1)
    bucket = np.floor(cos[iu, ju] * 10 + 1e-7).astype(np.int64)
    u, c = np.unique(bucket, return_counts=True)
    return pd.DataFrame(
        {"bucket": u.astype(np.int64), "n_pairs": c.astype(np.int64)}
    )


def q_minhash_jaccard_error(sf_dir: str):
    """Sketch-accuracy audit — MinHash's Jaccard ESTIMATE measured
    against the exact value it stands in for, over the engine's own
    LSH candidate pairs (the number that justifies trusting the
    flagship's P1 gate): per candidate pair, est = matching signature
    components (0..P at the SQL-checkable P = 8) vs exact Jaccard over
    distinct 8-gram shingle-hash sets; reported as a per-est-bucket
    panel (n_pairs, mean exact ppm, max |est − exact| ppm — integer
    arithmetic throughout).  Pairs from ``_mh_candidate_pairs``; texts
    re-attach through ``_gated_doc_texts`` (broadcast under the byte
    gate, ``_attach_norm_texts``'s bucketed pinned_join above).  Full
    SQL oracle (signatures AND shingle sets recomputed in DuckDB via
    the splitmix macros)."""
    from address_parser_ray.functions.hashing import (
        char_shingle_hashes,
        minhash_params,
        minhash_signature,
    )

    pairs = _mh_candidate_pairs(sf_dir)
    texts_ref, texts_ds = _gated_doc_texts(sf_dir)
    mh_a, mh_b = minhash_params(_MH_P, _MH_SEED)

    def score(batch: pa.Table) -> pa.Table:
        a = np.asarray(batch["id_a"], dtype=np.int64)
        b = np.asarray(batch["id_b"], dtype=np.int64)
        cache: dict[int, tuple] = {}
        if texts_ref is not None:
            ids_sorted, norms = ray.get(texts_ref)

            def text_of(doc: int, i: int, side: int) -> str:
                return norms[int(np.searchsorted(ids_sorted, doc))]
        else:
            na = batch["norm_a"].to_pylist()
            nb = batch["norm_b"].to_pylist()

            def text_of(doc: int, i: int, side: int) -> str:
                return na[i] if side == 0 else nb[i]

        def feats(doc: int, i: int, side: int) -> tuple:
            got = cache.get(doc)
            if got is None:
                sh = char_shingle_hashes(text_of(doc, i, side), 8)
                sig = minhash_signature(sh, mh_a, mh_b)
                got = (set(sh.tolist()), sig)
                cache[doc] = got
            return got

        est = np.empty(len(a), dtype=np.int64)
        exact = np.empty(len(a), dtype=np.int64)
        for i in range(len(a)):
            (sa, ga), (sb, gb) = feats(int(a[i]), i, 0), feats(int(b[i]), i, 1)
            est[i] = int((ga == gb).sum())
            ni = len(sa & sb)
            nu = len(sa) + len(sb) - ni
            exact[i] = ni * 1_000_000 // nu if nu else 0
        err = np.abs(est * 1_000_000 // _MH_P - exact)
        g = (
            pd.DataFrame({"est_matches": est, "pn": 1, "pse": exact, "pme": err})
            .groupby("est_matches", as_index=False, sort=False)
            .agg(pn=("pn", "sum"), pse=("pse", "sum"), pme=("pme", "max"))
        )
        for c in ("est_matches", "pn", "pse", "pme"):
            g[c] = g[c].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "est_matches": df["est_matches"].astype(np.int64),
                "n_pairs": df["n_pairs"].astype(np.int64),
                "mean_exact_ppm": (
                    df["se"].to_numpy(np.int64)
                    // df["n_pairs"].to_numpy(np.int64)
                ),
                "max_err_ppm": df["max_err"].astype(np.int64),
            }
        )

    src = pairs if texts_ref is not None else _attach_norm_texts(pairs, texts_ds)
    return (
        src.map_batches(score, batch_format="pyarrow", batch_size=4096)
        .groupby("est_matches")
        .aggregate(
            Sum("pn", alias_name="n_pairs"),
            Sum("pse", alias_name="se"),
            Max("pme", alias_name="max_err"),
        )
        .map_batches(final, batch_format="pandas")
        .sort("est_matches")
    )


def q_ewma_hourly(sf_dir: str):
    """EWMA over the dense hourly series — the RECURSIVE streaming-state
    aggregate (each hour's smoothed value depends on the previous
    hour's): s_t = (1000·n_t + 7·s_{t−1}) // 8 in integer milli
    (α = 1/8), s_0 = 1000·n_0 — pure-integer recursion so the SQL twin
    (a RECURSIVE CTE stepping the same rule) is hash-exact.  Shape:
    the same panel-sized partials + dense grid as
    ``events_hourly_dense``; the recursion runs inside the per-type
    combine over the hours panel (sequential by nature — but over
    types × hours rows, never events).  Full SQL oracle."""
    HOUR_US = 3_600_000_000
    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["ts"].to_numpy().view("i8") // HOUR_US
        g = (
            pd.DataFrame({"event_type": df["event_type"], "h": h})
            .groupby(["event_type", "h"], sort=False, as_index=False)
            .size()
        )
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "h": g["h"].astype(np.int64),
                "part_n": g["size"].astype(np.int64),
            }
        )

    partials = ev.map_batches(partial, batch_format="pandas").materialize()
    lo, hi = None, None
    for b in partials.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        hs = np.asarray(b["h"], dtype=np.int64)
        if len(hs):
            lo = int(hs.min()) if lo is None else min(lo, int(hs.min()))
            hi = int(hs.max()) if hi is None else max(hi, int(hs.max()))
    span_ref = ray.put((lo, hi))

    def smooth(g: pd.DataFrame) -> pd.DataFrame:
        lo_, hi_ = ray.get(span_ref)
        grid = np.arange(lo_, hi_ + 1, dtype=np.int64)
        n = np.zeros(len(grid), dtype=np.int64)
        agg = g.groupby("h", as_index=False)["part_n"].sum()
        n[agg["h"].to_numpy(np.int64) - lo_] = agg["part_n"].to_numpy(np.int64)
        ewma = np.zeros(len(grid), dtype=np.int64)
        s = int(n[0]) * 1000
        ewma[0] = s
        for i in range(1, len(grid)):
            s = (1000 * int(n[i]) + 7 * s) // 8
            ewma[i] = s
        return pd.DataFrame(
            {
                "event_type": [g["event_type"].iloc[0]] * len(grid),
                "hour_epoch": grid,
                "n_events": n,
                "ewma_milli": ewma,
            }
        )

    return partials.groupby("event_type").map_groups(smooth, batch_format="pandas")


def q_source_ab_tests(sf_dir: str):
    """Two-sample significance screen between every source pair — the
    A/B-test shape (does source X produce longer docs than source Y,
    beyond noise?) in EXACT integers: Welch z² > 4 (|z| > 2) decided by
    the division-free inequality
    ``(sx_a·n_b − sx_b·n_a)² · (n_a−1)(n_b−1)  >
      4 · [ q_a·n_b²·(n_b−1) + q_b·n_a²·(n_a−1) ]`` where
    ``q_i = n_i·sxx_i − sx_i²`` (so v_i/n_i = q_i/(n_i²(n_i−1)); both
    sides are z² > 4 multiplied by (n_a n_b)²(n_a−1)(n_b−1)) — the
    ``length_outliers`` discipline extended to two samples; no float
    ever compares.  One pass emits the per-source integer moments
    (n, Σx, Σx²); the C(sources, 2) pair panel folds on the driver in
    Python bigints (HUGEINT twin).  Output per pair: means in milli,
    significant flag.  Full SQL oracle."""
    docs = _docs(sf_dir, ["source", "n_chars"])

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.int64)
        g = (
            pd.DataFrame(
                {"source": df["source"], "pn": 1, "sx": x, "sxx": x * x}
            )
            .groupby("source", as_index=False, sort=False)
            .sum()
        )
        for c in ("pn", "sx", "sxx"):
            g[c] = g[c].astype(np.int64)
        return g

    panel = (
        docs.map_batches(moments, batch_format="pandas")
        .groupby("source")
        .aggregate(
            Sum("pn", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    rows = []
    recs = list(
        zip(
            panel["source"],
            (int(v) for v in panel["n"]),
            (int(v) for v in panel["sx"]),
            (int(v) for v in panel["sxx"]),
        )
    )
    recs = [(s, n, sx, sxx) for s, n, sx, sxx in recs if n >= 2]
    for i in range(len(recs)):
        for j in range(i + 1, len(recs)):
            sa, na, sxa, sxxa = recs[i]
            sb, nb, sxb, sxxb = recs[j]
            qa = na * sxxa - sxa * sxa
            qb = nb * sxxb - sxb * sxb
            lhs = (sxa * nb - sxb * na) ** 2 * (na - 1) * (nb - 1)
            rhs = 4 * (qa * nb * nb * (nb - 1) + qb * na * na * (na - 1))
            rows.append(
                {
                    "source_a": sa,
                    "source_b": sb,
                    "mean_a_milli": sxa * 1000 // na,
                    "mean_b_milli": sxb * 1000 // nb,
                    "significant": lhs > rhs,
                }
            )
    out = pd.DataFrame(rows)
    for c in ("mean_a_milli", "mean_b_milli"):
        out[c] = out[c].astype(np.int64)
    return out


def q_cv_fold_balance(sf_dir: str):
    """Cross-validation fold audit — hash-assigned folds
    (doc_id % 5, the T6 discipline: reproducible at any cluster size)
    checked for stratification drift: per fold, an integer chi-square
    statistic against the GLOBAL lang distribution,
    ``Σ_lang (o_fl·T − n_f·n_l)² // (n_f·n_l·T)`` (scaled so the
    expected-count division never leaves integers).  A skewed fold
    shows up as a large stat long before a model does.  One partial
    pass to the (fold, lang) panel; marginals and the statistic fold
    from that panel.  Full SQL oracle (HUGEINT)."""
    docs = _docs(sf_dir, ["doc_id", "lang"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            pd.DataFrame(
                {
                    "fold": df["doc_id"].to_numpy(np.int64) % 5,
                    "lang": df["lang"],
                }
            )
            .groupby(["fold", "lang"], as_index=False, sort=False)
            .size()
        )
        return pd.DataFrame(
            {
                "fl": g["fold"].astype(str) + "\x1f" + g["lang"].astype(str),
                "pn": g["size"].astype(np.int64),
            }
        )

    panel = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("fl")
        .aggregate(Sum("pn", alias_name="n"))
        .to_pandas()
    )
    parts = panel["fl"].str.split("\x1f", expand=True)
    panel["fold"] = parts[0].astype(np.int64)
    panel["lang"] = parts[1]
    T = int(panel["n"].sum())
    n_f = panel.groupby("fold")["n"].sum().to_dict()
    n_l = panel.groupby("lang")["n"].sum().to_dict()
    rows = []
    for fold in sorted(n_f):
        stat = 0
        sub = panel[panel["fold"] == fold]
        seen = dict(zip(sub["lang"], (int(v) for v in sub["n"])))
        for lang, nl in n_l.items():
            o = seen.get(lang, 0)
            nf = int(n_f[fold])
            stat += (o * T - nf * int(nl)) ** 2 // (nf * int(nl) * T)
        rows.append(
            {"fold": fold, "n_docs": int(n_f[fold]), "chi2_stat": stat}
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def q_rrf_fusion(sf_dir: str):
    """Hybrid retrieval with Reciprocal Rank Fusion — the standard
    dense + lexical combiner (RRF, Cormack et al., public): for query
    id 0, a DENSE ranking (cosine against embedding 0, quantized to
    basis points before ranking so float ties cannot reorder between
    engines) and a LEXICAL ranking (shared distinct 8-gram
    shingle-hash count against doc 0) each keep their top 20;
    rrf_micro = Σ 10⁶ // (60 + rank) over the rankings that contain
    the id (0 marks absence).  Top-10 by (rrf desc, id asc).

    Shape: both rankings are broadcast-query streaming passes with
    per-batch top-k partials (blocks × 20 rows to the driver);
    embeddings and documents never pair.  Full SQL oracle (dense via
    list_cosine_similarity, lexical via the shingle-macro sets)."""
    from address_parser_ray.functions.hashing import char_shingle_hashes
    from address_parser_ray.functions.normalize import normalize_content_arrow

    K = 20

    # ---- dense ranking: cosine vs vec 0, quantized bp, top-20 ----
    qv = _load_query_vec(sf_dir, 0)
    qn = qv / np.linalg.norm(qv)
    qref = ray.put(qn)

    def dense_partial(t: pa.Table) -> pa.Table:
        q = ray.get(qref)
        emb = np.asarray(
            t["embedding"].combine_chunks().flatten(), dtype=np.float64
        ).reshape(len(t), -1)
        norms = np.linalg.norm(emb, axis=1)
        norms[norms == 0] = 1.0
        bp = np.floor((emb @ q) / norms * 1e4 + 1e-7).astype(np.int64)
        vids = np.asarray(t["vec_id"], dtype=np.int64)
        keep = vids != 0
        bp, vids = bp[keep], vids[keep]
        order = np.lexsort((vids, -bp))[:K]
        return pa.table(
            {"vec_id": pa.array(vids[order]), "bp": pa.array(bp[order])}
        )

    dense = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(dense_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    dense = dense.sort_values(
        ["bp", "vec_id"], ascending=[False, True], kind="stable"
    ).head(K)
    dense["rank"] = np.arange(1, len(dense) + 1, dtype=np.int64)
    r_dense = dict(zip((int(v) for v in dense["vec_id"]), (int(r) for r in dense["rank"])))

    # ---- lexical ranking: shared distinct 8-gram shingles vs doc 0 ----
    import pyarrow.dataset as pads

    q0 = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        filter=(pads.field("doc_id") == 0),
    ).to_pandas()
    qset = set(
        char_shingle_hashes(
            normalize_content_arrow(pa.array(q0["text"].tolist()))[0].as_py()
            or "",
            8,
        ).tolist()
    )
    qset_ref = ray.put(np.fromiter(qset, dtype=np.uint64))

    def lex_partial(t: pa.Table) -> pa.Table:
        qarr = np.sort(ray.get(qset_ref))
        ids = np.asarray(t["doc_id"], dtype=np.int64)
        norms = normalize_content_arrow(t["text"]).to_pylist()
        shared = np.zeros(len(ids), dtype=np.int64)
        for i, x in enumerate(norms):
            if ids[i] == 0 or not x:
                continue
            sh = np.unique(char_shingle_hashes(x, 8))
            pos = np.searchsorted(qarr, sh)
            pos[pos >= len(qarr)] = len(qarr) - 1
            shared[i] = int((qarr[pos] == sh).sum()) if len(qarr) else 0
        keep = (ids != 0) & (shared > 0)
        ids, shared = ids[keep], shared[keep]
        order = np.lexsort((ids, -shared))[:K]
        return pa.table(
            {"doc_id": pa.array(ids[order]), "shared": pa.array(shared[order])}
        )

    lex = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(lex_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    lex = lex.sort_values(
        ["shared", "doc_id"], ascending=[False, True], kind="stable"
    ).head(K)
    lex["rank"] = np.arange(1, len(lex) + 1, dtype=np.int64)
    r_lex = dict(zip((int(v) for v in lex["doc_id"]), (int(r) for r in lex["rank"])))

    # ---- fuse ----
    rows = []
    for did in sorted(set(r_dense) | set(r_lex)):
        rd = r_dense.get(did, 0)
        rl = r_lex.get(did, 0)
        rrf = (1_000_000 // (60 + rd) if rd else 0) + (
            1_000_000 // (60 + rl) if rl else 0
        )
        rows.append(
            {"id": did, "rank_dense": rd, "rank_lexical": rl, "rrf_micro": rrf}
        )
    out = (
        pd.DataFrame(rows)
        .sort_values(["rrf_micro", "id"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def q_vocab_growth(sf_dir: str):
    """Vocabulary growth curve (Heaps' law) — cumulative distinct
    tokens as the corpus is consumed in doc_id order, sampled at
    doc-id deciles: the corpus-stats op behind "how much new
    vocabulary does the next 10% of data buy" (tokenizer sizing,
    dedup-value forecasting).  Distributed as FIRST-OCCURRENCE
    accumulation: min doc_id per token (postings-min shuffle bounded
    by vocabulary), a 10-row decile histogram of first-seens, one
    prefix sum.  Same running-distinct shape as ``cumulative_users``,
    applied to the token domain with bucketed checkpoints.  Full SQL
    oracle."""
    docs = _docs(sf_dir, ["doc_id", "text"])
    n_docs = docs.count()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ex = pd.DataFrame(
            {"tok": _bpe_findall(df["text"]), "d": df["doc_id"].to_numpy(np.int64)}
        ).explode("tok")
        ex = ex[ex["tok"].notna()]
        if len(ex) == 0:
            return pd.DataFrame(
                {
                    "tok": pd.Series([], dtype="str"),
                    "pd_": pd.Series([], dtype="int64"),
                }
            )
        g = ex.groupby("tok", sort=False, as_index=False)["d"].min()
        return pd.DataFrame({"tok": g["tok"], "pd_": g["d"].astype(np.int64)})

    def decile_partial(df: pd.DataFrame) -> pd.DataFrame:
        dec = df["first_doc"].to_numpy(np.int64) * 10 // n_docs
        g = (
            pd.DataFrame({"decile": dec})
            .groupby("decile", as_index=False, sort=False)
            .size()
        )
        return pd.DataFrame(
            {
                "decile": g["decile"].astype(np.int64),
                "pn": g["size"].astype(np.int64),
            }
        )

    panel = (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("tok")
        .aggregate(Min("pd_", alias_name="first_doc"))
        .map_batches(decile_partial, batch_format="pandas")
        .groupby("decile")
        .aggregate(Sum("pn", alias_name="n_new_tokens"))
        .to_pandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    panel["decile"] = panel["decile"].astype(np.int64)
    panel["n_new_tokens"] = panel["n_new_tokens"].astype(np.int64)
    panel["n_cum_tokens"] = np.cumsum(panel["n_new_tokens"].to_numpy(np.int64))
    return panel


def q_pr_curve(sf_dir: str):
    """Precision/recall operating-point sweep for the flagship scorer —
    the PR CURVE behind the ``match_threshold`` config choice (the
    calibration step ``score_histogram`` shows the raw distribution
    for): on the labeled fixture corpus (known true clusters), every
    5%-wide score threshold reports tp / fp / fn and integer-ppm
    P / R / F1 over the CANDIDATE pairs (same-block basis — pairs
    blocking never surfaced are `blocking_quality`'s recall, not the
    scorer's).  Full SQL oracle since r5: the flagship DuckDB twin
    retargeted to the fixture corpus parquet (src hook) + the M18
    exact (lang, basename) candidates; the fixture runs WITHOUT hot
    basenames at frac=0.1 — large enough that cross-cluster docs share
    the (lang, basename) key (the negative class: fp pairs), small
    enough (~22-row blocks) that the twin's no-salting/no-caps domain
    assumption holds (salting fires above ~128 est. rows, pair caps at
    91).  Also pinned by pytest monotonicity + the
    shipped threshold's operating point."""
    from address_parser_ray.fixtures import write_corpus_ray
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus

    out_dir = _fixture_cache_dir("_pr_s200_v6_h10")
    corpus_dir, labels_dir = write_corpus_ray(
        out_dir, n_seeds=200, variants_per_seed=6, hot_basename_frac=0.1
    )
    res = dedup_pipeline(read_corpus(corpus_dir))
    sp = res.scored_pairs.to_pandas()
    lab = ray.data.read_parquet(labels_dir).to_pandas()
    lab["record_id"] = [
        stable_id128(r, p, c)
        for r, p, c in zip(lab["repo"], lab["path"], lab["commit"])
    ]
    truth = lab.set_index("record_id")["cluster_id"]
    same = (
        truth.reindex(sp["id_a"]).to_numpy()
        == truth.reindex(sp["id_b"]).to_numpy()
    )
    score_bp = np.floor(sp["score"].to_numpy(np.float64) * 20 + 1e-7).astype(
        np.int64
    )
    total_true = int(same.sum())
    rows = []
    for t in range(0, 21):
        sel = score_bp >= t
        tp = int((sel & same).sum())
        fp = int((sel & ~same).sum())
        fn = total_true - tp
        prec = tp * 1_000_000 // max(tp + fp, 1)
        rec = tp * 1_000_000 // max(tp + fn, 1)
        f1 = 2 * prec * rec // max(prec + rec, 1)
        rows.append(
            {
                "threshold_bp": t * 500,  # basis points of score (t/20)
                "tp": tp,
                "fp": fp,
                "fn": fn,
                "precision_ppm": prec,
                "recall_ppm": rec,
                "f1_ppm": f1,
            }
        )
    out = pd.DataFrame(rows)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

QUERIES = {
    "exact_dedup_groups": q_exact_dedup_groups,
    "minhash_lsh_clusters": q_minhash_lsh_clusters,
    "lsh_cluster_assignments": q_lsh_cluster_assignments,
    "simhash_hamming_pairs": q_simhash_hamming_pairs,
    "ngram_jaccard_stats": q_ngram_jaccard_stats,
    "lang_counts": q_lang_counts,
    "doc_stats_by_lang": q_doc_stats_by_lang,
    "token_counts_by_lang": q_token_counts_by_lang,
    "quality_flags": q_quality_flags,
    "quality_scores": q_quality_scores,
    "langid_pred": q_langid_pred,
    "top_docs": q_top_docs,
    "distinct_langs": q_distinct_langs,
    "hash_split_counts": q_hash_split_counts,
    "filter_union_counts": q_filter_union_counts,
    "orders_by_nation": q_orders_by_nation,
    "pricing_summary": q_pricing_summary,
    "revenue_rollup": q_revenue_rollup,
    "tfidf_top_terms": q_tfidf_top_terms,
    "top_customers": q_top_customers,
    "events_hourly": q_events_hourly,
    "events_sliding_3h": q_events_sliding_3h,
    "event_value_percentiles": q_event_value_percentiles,
    "distinct_kmv": q_distinct_kmv,
    "hll_distinct": q_hll_distinct,
    "scd2_temporal_join": q_scd2_temporal_join,
    "snapshot_diff": q_snapshot_diff,
    "dq_expectations": q_dq_expectations,
    "weighted_sample": q_weighted_sample,
    "zorder_vs_linear": q_zorder_vs_linear,
    "clustering_agreement": q_clustering_agreement,
    "event_transitions": q_event_transitions,
    "canopy_clusters": q_canopy_clusters,
    "canonical_snap": q_canonical_snap,
    "signature_blocks": q_signature_blocks,
    "token_transforms": q_token_transforms,
    "cluster_medoids": q_cluster_medoids,
    "session_concurrency": q_session_concurrency,
    "shard_balance": q_shard_balance,
    "compression_quality": q_compression_quality,
    "embedding_quantize": q_embedding_quantize,
    "activity_reconcile": q_activity_reconcile,
    "source_quality_prior": q_source_quality_prior,
    "embedding_top_pc": q_embedding_top_pc,
    "dedup_savings": q_dedup_savings,
    "token_lift": q_token_lift,
    "decile_grid": q_decile_grid,
    "bpe_eval": q_bpe_eval,
    "review_pairs": q_review_pairs,
    "events_hourly_dense": q_events_hourly_dense,
    "session_coverage": q_session_coverage,
    "lang_similarity": q_lang_similarity,
    "hourly_anomalies": q_hourly_anomalies,
    "hapax_stats": q_hapax_stats,
    "mixed_lang_docs": q_mixed_lang_docs,
    "vocab_stats": q_vocab_stats,
    "stratified_sample": q_stratified_sample,
    "customers_without_orders": q_customers_without_orders,
    "embedding_topk": q_embedding_topk,
    "knn_bruteforce": q_knn_bruteforce,
    "media_sizes": q_media_sizes,
    "media_features": q_media_features,
    "model_langid": q_model_langid,
    "shuffle_split_write": q_shuffle_split_write,
    "winnow_dup_pairs": q_winnow_dup_pairs,
    "largest_doc_per_lang": q_largest_doc_per_lang,
    "top3_docs_per_source": q_top3_docs_per_source,
    "customers_per_region": q_customers_per_region,
    "purchase_last_click": q_purchase_last_click,
    "user_sessions": q_user_sessions,
    "purchase_clicks_1h": q_purchase_clicks_1h,
    "event_value_extremes": q_event_value_extremes,
    "bio_label_counts": q_bio_label_counts,
    "synthetic_corpus_stats": q_synthetic_corpus_stats,
    "er_quality": q_er_quality,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "embedding_near_dup": q_embedding_near_dup,
    "residual_tokens": q_residual_tokens,
    "infer_missing_lang": q_infer_missing_lang,
    "seq_pack_stats": q_seq_pack_stats,
    "packed_shard_stats": q_packed_shard_stats,
    "contamination_5gram": q_contamination_5gram,
    "repetition_stats": q_repetition_stats,
    "bigram_lm_score": q_bigram_lm_score,
    "bloom_contamination": q_bloom_contamination,
    "size_weighted_sample": q_size_weighted_sample,
    "props_k_stats": q_props_k_stats,
    "pivot_event_hours": q_pivot_event_hours,
    "embedding_centroids": q_embedding_centroids,
    "media_resize": q_media_resize,
    "incremental_dedup_check": q_incremental_dedup_check,
    "cluster_canonical": q_cluster_canonical,
    "bpe_train_merges": q_bpe_train_merges,
    "dup_ratio_by_source": q_dup_ratio_by_source,
    "block_size_histogram": q_block_size_histogram,
    "event_value_log_hist": q_event_value_log_hist,
    "media_frame_sample": q_media_frame_sample,
    "mixture_sample": q_mixture_sample,
    "quality_quantile_filter": q_quality_quantile_filter,
    "doc_chunks": q_doc_chunks,
    "funnel_counts": q_funnel_counts,
    "inverted_index": q_inverted_index,
    "bloom_semijoin_revenue": q_bloom_semijoin_revenue,
    "table_profile": q_table_profile,
    "upsert_latest": q_upsert_latest,
    "kmeans_update": q_kmeans_update,
    "semantic_dedup": q_semantic_dedup,
    "score_histogram": q_score_histogram,
    "content_score_histogram": q_content_score_histogram,
    "type_prefix_counts": q_type_prefix_counts,
    "top_tokens_per_doc": q_top_tokens_per_doc,
    "dup_span_stats": q_dup_span_stats,
    "cdc_chunk_stats": q_cdc_chunk_stats,
    "gram_novelty": q_gram_novelty,
    "source_overlap": q_source_overlap,
    "event_gap_histogram": q_event_gap_histogram,
    "heavy_hitters": q_heavy_hitters,
    "pii_scrub": q_pii_scrub,
    "quantile_sketch": q_quantile_sketch,
    "gram_components": q_gram_components,
    "bigram_lm_scores": q_bigram_lm_scores,
    "revenue_by_priority": q_revenue_by_priority,
    "pagerank_ranks": q_pagerank_ranks,
    "pareto_parts": q_pareto_parts,
    "rollup_counts": q_rollup_counts,
    "scd2_history": q_scd2_history,
    "user_running_totals": q_user_running_totals,
    "minhash_band_keys": q_minhash_band_keys,
    "minhash_cluster_ids": q_minhash_cluster_ids,
    "name_edit_pairs": q_name_edit_pairs,
    "keyword_tags": q_keyword_tags,
    "value_moments": q_value_moments,
    "cdc_with_deletes": q_cdc_with_deletes,
    "embedding_dim_stats": q_embedding_dim_stats,
    "jw_name_pairs": q_jw_name_pairs,
    "token_cooccurrence": q_token_cooccurrence,
    "user_spend_ranks": q_user_spend_ranks,
    "retention_cohorts": q_retention_cohorts,
    "fk_orphans": q_fk_orphans,
    "sorted_neighborhood": q_sorted_neighborhood,
    "meta_blocking": q_meta_blocking,
    "fs_em_update": q_fs_em_update,
    "fellegi_sunter_em": q_fellegi_sunter_em,
    "fs_classify": q_fs_classify,
    "dsir_weights": q_dsir_weights,
    "token_set_pairs": q_token_set_pairs,
    "linreg_grad_step": q_linreg_grad_step,
    "er_training_pairs": q_er_training_pairs,
    "window_dedup_stats": q_window_dedup_stats,
    "cluster_size_histogram": q_cluster_size_histogram,
    "blocking_quality": q_blocking_quality,
    "graph_triangles": q_graph_triangles,
    "kcore_nodes": q_kcore_nodes,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "countmin_estimates": q_countmin_estimates,
    "winsorized_stats": q_winsorized_stats,
    "balanced_sample": q_balanced_sample,
    "lang_regression": q_lang_regression,
    "decayed_counts": q_decayed_counts,
    "regional_revenue": q_regional_revenue,
    "containment_pairs": q_containment_pairs,
    "golden_records": q_golden_records,
    "soundex_blocks": q_soundex_blocks,
    "length_outliers": q_length_outliers,
    "partition_digests": q_partition_digests,
    "fragment_stitching": q_fragment_stitching,
    "one_to_one_match": q_one_to_one_match,
    "prefix_filter_pairs": q_prefix_filter_pairs,
    "range_partition_balance": q_range_partition_balance,
    "zonemap_pruning": q_zonemap_pruning,
    "kmv_join_estimate": q_kmv_join_estimate,
    "late_event_stats": q_late_event_stats,
    "rendezvous_rebalance": q_rendezvous_rebalance,
    "trigram_search": q_trigram_search,
    "dup_cap_sample": q_dup_cap_sample,
    "line_dedup_filter": q_line_dedup_filter,
    "tf_match_weights": q_tf_match_weights,
    "cluster_density": q_cluster_density,
    "source_lang_gini": q_source_lang_gini,
    "k_anonymity_audit": q_k_anonymity_audit,
    "benford_digits": q_benford_digits,
    "cube_counts": q_cube_counts,
    "oov_rate": q_oov_rate,
    "mad_outliers": q_mad_outliers,
    "trending_types": q_trending_types,
    "copurchase_pairs": q_copurchase_pairs,
    "l_diversity_audit": q_l_diversity_audit,
    "cumulative_users": q_cumulative_users,
    "weekly_churn": q_weekly_churn,
    "fanout_histogram": q_fanout_histogram,
    "match_waterfall": q_match_waterfall,
    "csv_read_counts": q_csv_read_counts,
    "except_all_tokens": q_except_all_tokens,
    "percentile_rank_docs": q_percentile_rank_docs,
    "loo_target_encoding": q_loo_target_encoding,
    "cos_pair_histogram": q_cos_pair_histogram,
    "minhash_jaccard_error": q_minhash_jaccard_error,
    "ewma_hourly": q_ewma_hourly,
    "source_ab_tests": q_source_ab_tests,
    "cv_fold_balance": q_cv_fold_balance,
    "rrf_fusion": q_rrf_fusion,
    "vocab_growth": q_vocab_growth,
    "pr_curve": q_pr_curve,
}
