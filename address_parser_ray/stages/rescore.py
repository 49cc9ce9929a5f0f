"""Stage 2b — content rescore for UNCERTAIN pairs (reference P2).

The sketch scorer (stage 2) misses pairs whose MinHash similarity is
diluted by systematic token edits — the classic case is heavy identifier
renaming, where every wide shingle crossing an identifier flips but the
content is obviously the same program. The reference solves this with a
rich rapidfuzz blend (ratio/partial_ratio/WRatio + component boosts,
``fuzz/inexus_parser.py:2852-2941``) computed for every pair that
survives the cheap Dice gate; this stage is the Ray-native equivalent:

- band  = pairs below ``match_threshold`` whose sketch Jaccard is still
  ≥ ``rescore_gate`` (hopeless pairs are skipped — the Dice-gate rule);
- content is RE-JOINED by record id through the bucketed reduce-side
  join (never broadcast: the 100-TB verify-join shape);
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
from address_parser_ray.functions.hashing import char_shingle_hashes, stable_id64
from address_parser_ray.functions.normalize import normalize_content_arrow
from address_parser_ray.functions.similarity import exact_jaccard
from address_parser_ray.rayutil import default_num_partitions, pinned_join, project

def corpus_norm_texts(corpus, cfg: PipelineConfig = DEFAULT_CONFIG):
    """corpus → (record_id, norm_text): the SAME normalization the
    fingerprint stage applies, so content evidence is computed over the
    text the sketches were built from."""

    def fn(t: pa.Table) -> pa.Table:
        norm = normalize_content_arrow(
            t["content"], lowercase=cfg.lowercase, strip_comments=cfg.strip_comments
        )
        rid = [
            stable_id64(r or "", p or "", c or "")
            for r, p, c in zip(
                t["repo"].to_pylist(), t["path"].to_pylist(), t["commit"].to_pylist()
            )
        ]
        return pa.table(
            {
                "record_id": pa.array(rid, type=pa.int64()),
                "lang": t["lang"],
                "norm_text": norm,
            }
        )

    return corpus.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


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
        ids_a = np.asarray(batch["id_a"]).astype(np.int64)
        ids_b = np.asarray(batch["id_b"]).astype(np.int64)
        cache: dict[int, tuple] = {}
        sa = self._sets(batch["text_a"].to_pylist(), ids_a, cache)
        sb = self._sets(batch["text_b"].to_pylist(), ids_b, cache)
        content = np.empty(n, dtype=np.float64)
        for i in range(n):
            (a_k, a_4), (b_k, b_4) = sa[i], sb[i]
            content[i] = cfg.w_content_shingle * exact_jaccard(
                a_k, b_k
            ) + cfg.w_content_4gram * exact_jaccard(a_4, b_4)
        sketch = np.asarray(batch["score"], dtype=np.float64)
        final = np.maximum(sketch, content)
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


def content_rescore_stage(
    scored,
    corpus,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    num_partitions: int | None = None,
):
    """scored pairs → scored pairs with the uncertain band re-scored on
    content evidence. Schema unchanged; rows outside the band pass
    through untouched.

    The band (``is_match == False``) includes pairs the P4 lang rule
    demoted in stage 2; lang travels with the content join and the rule
    is re-applied after blending, so content evidence can never resurrect
    a cross-lang edge."""
    nparts = default_num_partitions(num_partitions)
    band_expr = f"is_match == False and jacc_shingle >= {cfg.rescore_gate}"
    band = scored.filter(expr=band_expr)
    rest = scored.filter(
        expr=f"is_match == True or jacc_shingle < {cfg.rescore_gate}"
    )
    texts = corpus_norm_texts(corpus, cfg)
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
