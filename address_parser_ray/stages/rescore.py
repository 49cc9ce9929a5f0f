"""Stage 2b — content rescore for UNCERTAIN pairs (reference P2).

The sketch scorer (stage 2) misses pairs whose MinHash similarity is
diluted by systematic token edits — the classic case is heavy identifier
renaming, where every wide shingle crossing an identifier flips but the
content is obviously the same program. The reference solves this with a
rich rapidfuzz blend (ratio/partial_ratio/WRatio + component boosts,
``fuzz/inexus_parser.py:2852-2941``) computed for every pair that
survives the cheap Dice gate; this stage is the Ray-native equivalent:

- band  = pairs whose ESTIMATED score (stage 2 already blends a
  4-gram-MinHash content estimate) lies within ``rescore_margin`` of the
  match threshold — exactly where sketch noise can flip the decision;
- content comes back by record id: the band's id set broadcasts as a
  semi-join filter and the surviving text SLICE broadcasts when it fits
  the byte budget (both size-gated); above either gate the full bucketed
  reduce-side join runs — the 100-TB verify-join shape. The whole corpus
  text is never driver-materialized;
- content score = w_content_shingle · exactJaccard(k = shingle_k)
  + w_content_4gram · exactJaccard(k = 4): 4-grams survive identifier
  suffix renames (the old identifier's substrings remain), wide shingles
  anchor precision (near-miss programs sharing boilerplate sit at
  j12 ≈ 0.01 / j4 ≤ 0.27 vs heavy-rename positives j12 ≈ 0.27 /
  j4 ≈ 0.72 on the labeled fixture);
- final score = max(sketch, content) — content evidence promotes, the
  lang-consistency rule (P4, applied in stage 2 and re-applied here)
  still demotes.

Shingle sets are computed per DISTINCT record per batch (cached), so a
record appearing in many uncertain pairs hashes once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.functions.hashing import (
    ID_DTYPE,
    char_shingle_hashes,
    ids_np,
    pack_ids,
    stable_id128,
)
from address_parser_ray.functions.normalize import normalize_content_arrow
from address_parser_ray.functions.similarity import exact_jaccard
from address_parser_ray.rayutil import default_num_partitions, pinned_join, project

def corpus_norm_texts(corpus, cfg: PipelineConfig = DEFAULT_CONFIG, keep_ref=None):
    """corpus → (record_id, lang, norm_text): the SAME normalization the
    fingerprint stage applies, so content evidence is computed over the
    text the sketches were built from.

    ``keep_ref``: optional ``ray.put`` of a sorted int64 id array — the
    broadcast side of a semi-join. Rows are filtered BY ID FIRST and only
    survivors are normalized, so a narrow rescore band never pays
    normalization or shuffle for the other 99% of the corpus."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        rid = np.array(
            [
                stable_id128(r or "", p or "", c or "")
                for r, p, c in zip(
                    t["repo"].to_pylist(),
                    t["path"].to_pylist(),
                    t["commit"].to_pylist(),
                )
            ],
            dtype=ID_DTYPE,
        ) if t.num_rows else np.empty(0, dtype=ID_DTYPE)
        if keep_ref is not None:
            keep = ray.get(keep_ref)
            pos = np.clip(np.searchsorted(keep, rid), 0, max(0, len(keep) - 1))
            mask = keep[pos] == rid if len(keep) else np.zeros(len(rid), bool)
            t = t.filter(pa.array(mask))
            rid = rid[mask]
        norm = normalize_content_arrow(
            t["content"], lowercase=cfg.lowercase, strip_comments=cfg.strip_comments
        )
        return pa.table(
            {
                "record_id": pack_ids(rid),
                "lang": t["lang"],
                "norm_text": norm,
            }
        )

    return corpus.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def filter_texts_by_id(norm_texts, keep_ref=None):
    """(record_id, lang, norm_text) view of an ALREADY-NORMALIZED side
    table (fingerprint output with ``keep_norm_text=True``), optionally
    filtered to a broadcast sorted-id set.

    This is the fast path that removes the pipeline's second full-corpus
    scan: the mask is a vectorized searchsorted over the int64
    ``record_id`` column (no per-row Python, no re-normalization, no
    corpus parquet decode) and only the survivors' text bytes are ever
    gathered — the Arrow ``select`` before ``filter`` is metadata-only,
    so untouched columns cost nothing."""
    import ray

    def fn(t: pa.Table) -> pa.Table:
        t = t.select(["record_id", "lang", "norm_text"])
        if keep_ref is None:
            return t
        keep = ray.get(keep_ref)
        rid = ids_np(t["record_id"])
        if len(keep):
            pos = np.clip(np.searchsorted(keep, rid), 0, len(keep) - 1)
            mask = keep[pos] == rid
        else:
            mask = np.zeros(len(rid), dtype=bool)
        return t.filter(pa.array(mask))

    return norm_texts.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class ContentRescorer:
    """Per-batch content scoring over joined (text_a, text_b) pairs.
    Shingle sets cached per distinct text hash within the batch."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg

    def _sets(self, texts: list, ids: np.ndarray, cache: dict):
        cfg = self.cfg
        out = []
        for rid, t in zip(ids, texts):
            got = cache.get(rid)
            if got is None:
                t = t or ""
                got = (
                    char_shingle_hashes(t, cfg.shingle_k),
                    char_shingle_hashes(t, 4),
                )
                cache[rid] = got
            out.append(got)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        ids_a = ids_np(batch["id_a"])
        ids_b = ids_np(batch["id_b"])
        cache: dict[int, tuple] = {}
        sa = self._sets(batch["text_a"].to_pylist(), ids_a, cache)
        sb = self._sets(batch["text_b"].to_pylist(), ids_b, cache)
        j_wide = np.empty(n, dtype=np.float64)
        j_fine = np.empty(n, dtype=np.float64)
        for i in range(n):
            (a_k, a_4), (b_k, b_4) = sa[i], sb[i]
            j_wide[i] = exact_jaccard(a_k, b_k)
            j_fine[i] = exact_jaccard(a_4, b_4)
        # replace every ESTIMATED Jaccard with its exact value and
        # re-evaluate both blends — exact evidence supersedes sketch
        # noise in either direction (promote or demote)
        blend = (
            cfg.w_shingle * j_wide
            + cfg.w_token * np.asarray(batch["jacc_token"], dtype=np.float64)
            + cfg.w_path * np.asarray(batch["jw_path"], dtype=np.float64)
            + cfg.w_size * np.asarray(batch["size_sim"], dtype=np.float64)
        )
        content = cfg.w_content_shingle * j_wide + cfg.w_content_4gram * j_fine
        final = np.maximum(blend, content)
        is_match = final >= cfg.match_threshold
        if cfg.enforce_lang_consistency:
            # re-apply the P4 lang rule: content evidence must not
            # resurrect a pair stage 2 demoted for inconsistent lang
            lang_ok = np.asarray(
                batch["lang_a"].to_pylist(), dtype=object
            ) == np.asarray(batch["lang_b"].to_pylist(), dtype=object)
            is_match = is_match & lang_ok
        return pa.table(
            {
                "id_a": batch["id_a"],
                "id_b": batch["id_b"],
                "jacc_shingle": batch["jacc_shingle"],
                "jacc_token": batch["jacc_token"],
                "jw_path": batch["jw_path"],
                "size_sim": batch["size_sim"],
                "score": pa.array(final),
                "is_match": pa.array(is_match),
            }
        )


def content_rescore_batch(batch: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Stateless-task form (state is per-batch; warm workers reuse the
    hashing power cache at process level)."""
    return ContentRescorer(cfg)(batch)


def _broadcast_rescore_fn(cfg: PipelineConfig, tref):
    """Rescore band pairs against a BROADCAST (ids, langs, texts) triple:
    searchsorted lookup per side, then the same exact-blend math as the
    join path (via ContentRescorer on a synthesized joined batch)."""
    import ray

    def fn(batch: pa.Table) -> pa.Table:
        rid, langs, txts = ray.get(tref)
        a = ids_np(batch["id_a"])
        b = ids_np(batch["id_b"])
        ia = np.searchsorted(rid, a)
        ib = np.searchsorted(rid, b)
        if not ((rid[np.clip(ia, 0, len(rid) - 1)] == a).all()
                and (rid[np.clip(ib, 0, len(rid) - 1)] == b).all()):
            raise KeyError("band pair references id missing from text slice")
        joined = batch.append_column(
            "lang_a", pa.array([langs[i] for i in ia], type=pa.string())
        ).append_column(
            "text_a", pa.array([txts[i] for i in ia], type=pa.string())
        ).append_column(
            "lang_b", pa.array([langs[i] for i in ib], type=pa.string())
        ).append_column(
            "text_b", pa.array([txts[i] for i in ib], type=pa.string())
        )
        return ContentRescorer(cfg)(joined)

    return fn


def content_rescore_stage(
    scored,
    corpus,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
    norm_texts=None,
):
    """scored pairs → scored pairs with the uncertain band re-scored on
    content evidence. Schema unchanged; rows outside the band pass
    through untouched.

    ``norm_texts``: an already-normalized (…, record_id, lang, norm_text)
    side table from the fingerprint pass (``keep_norm_text=True``). When
    given, the band's text comes from it by id — the corpus parquet is
    NEVER read a second time (``corpus`` may then be ``None``). Without
    it, the legacy fallback re-reads + re-normalizes the corpus (used by
    checkpoint resumes that predate the side table).

    The band (``is_match == False``) includes pairs the P4 lang rule
    demoted in stage 2; lang travels with the content join and the rule
    is re-applied after blending, so content evidence can never resurrect
    a cross-lang edge."""
    import ray

    nparts = default_num_partitions(num_partitions)
    lo = cfg.match_threshold - cfg.rescore_margin
    hi = cfg.match_threshold + cfg.rescore_margin
    # only pairs whose ESTIMATED score sits within sketch noise of the
    # threshold need exact verification; score == 1.0 (sha-exact) never
    # does. The fine-sketch estimate in stage 2 already promoted the
    # clear content matches, so this band is narrow (measured ≲2% of
    # pairs on the bench corpus).
    band = scored.filter(expr=f"score >= {lo} and score < {hi}").materialize()
    rest = scored.filter(expr=f"score < {lo} or score >= {hi}")
    n_band = band.count()
    if n_band == 0:
        return scored

    keep_ref = None
    if n_band <= cfg.rescore_band_max_driver_pairs:
        # semi-join reduction: the band's id set broadcasts (two int64
        # columns of a SMALL pair table), the corpus is filtered by id
        # BEFORE normalization/shuffle. Above the gate, the full
        # bucketed join takes over (same result, no driver pull).
        ids = np.unique(
            np.concatenate(
                [
                    np.concatenate([ids_np(b["id_a"]), ids_np(b["id_b"])])
                    for b in band.iter_batches(
                        batch_size=1 << 20, batch_format="pyarrow"
                    )
                ]
            )
        )
        keep_ref = ray.put(ids)

    if keep_ref is not None:
        # the band's text slice fits the broadcast budget in virtually
        # every real run (band ≲2% of pairs) — broadcast it once via
        # ray.put and score without any join shuffle (two sort-shuffles
        # of wide text payloads measured 30 s on a 22k-pair band vs <1 s
        # for the broadcast lookup).
        texts_ds = (
            filter_texts_by_id(norm_texts, keep_ref)
            if norm_texts is not None
            else corpus_norm_texts(corpus, cfg, keep_ref=keep_ref)
        ).materialize()
        if texts_ds.size_bytes() <= cfg.broadcast_feats_max_bytes:
            batches = [
                b
                for b in texts_ds.iter_batches(
                    batch_size=1 << 18, batch_format="pyarrow"
                )
            ]
            if not batches:
                raise ValueError(
                    "rescore band references record ids absent from the "
                    "corpus — the corpus dataset likely re-executed "
                    "non-deterministically (e.g. a lazy .limit()/sample "
                    "upstream). Materialize the corpus before "
                    "dedup_pipeline()."
                )
            tbl = pa.concat_tables(batches)
            rid = ids_np(tbl["record_id"])
            order = np.argsort(rid)
            langs = tbl["lang"].to_pylist()
            txts = tbl["norm_text"].to_pylist()
            tref = ray.put(
                (
                    rid[order],
                    [langs[i] for i in order],
                    [txts[i] for i in order],
                )
            )
            rescored = band.map_batches(
                _broadcast_rescore_fn(cfg, tref),
                batch_format="pyarrow",
                batch_size=256,
                zero_copy_batch=True,
            )
            return rest.union(rescored)
        texts = texts_ds
    elif norm_texts is not None:
        texts = filter_texts_by_id(norm_texts)
    else:
        texts = corpus_norm_texts(corpus, cfg, keep_ref=keep_ref)
    j = pinned_join(
        band,
        project(
            texts,
            {"record_id": "record_id", "lang": "lang_a", "norm_text": "text_a"},
        ),
        on="id_a",
        right_on="record_id",
        num_partitions=nparts,
    )
    j = pinned_join(
        j,
        project(
            texts,
            {"record_id": "record_id", "lang": "lang_b", "norm_text": "text_b"},
        ),
        on="id_b",
        right_on="record_id",
        num_partitions=nparts,
    )
    rescored = j.map_batches(
        content_rescore_batch,
        fn_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=1024,
        zero_copy_batch=True,
    )
    return rest.union(rescored)
