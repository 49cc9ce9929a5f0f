"""Deterministic synthetic source-code corpus with known clusters.

Mirrors the reference's self-validating synthetic generation
(``ner/build_standard_dataset.py:952-978``): canonical seed × declarative
variant specs × bounded attempts, keep a variant only if it lands in the
intended similarity band (``:885-887``). Randomness is per-key
(``rng_for(seed, ...)``) — never a shared sequential RNG
(``:941``) — so generation is order-independent and parallelizes.

Output schema matches BASELINE.json ``input_hint``:
``(repo, path, commit, lang, content)`` + a ``labels`` table
``(repo, path, commit, content_sha256, cluster_id, variant_spec)``.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from address_parser_ray.functions.hashing import (
    char_shingle_hashes,
    rng_for,
    sha256_hex,
)
from address_parser_ray.functions.similarity import exact_jaccard

LANGS = ["python", "javascript", "go", "java", "rust"]
# Zipf-ish lang weights — deliberately skewed (FIXTURES.md §1).
LANG_WEIGHTS = np.array([0.45, 0.25, 0.15, 0.10, 0.05])

_NOUNS = [
    "user", "order", "cache", "index", "token", "batch", "record", "node",
    "shard", "queue", "config", "metric", "buffer", "stream", "packet",
    "entry", "bucket", "window", "cursor", "worker",
]
_VERBS = [
    "load", "parse", "merge", "split", "flush", "resolve", "encode",
    "decode", "validate", "transform", "collect", "emit", "score", "rank",
]
_OPS = ["+", "-", "*"]

_COMMENT = {"python": "#", "javascript": "//", "go": "//", "java": "//", "rust": "//"}


@dataclass
class SeedFile:
    """Structured form of a canonical file — perturbations act on this
    structure, then render to text (controllable, unlike text munging)."""

    seed_id: int
    lang: str
    funcs: list  # list of (fname, [idents], n_stmts)
    header: list  # boilerplate header lines (shared across near-miss pairs)


def _make_seed(seed_id: int, global_seed: int, file_scale: int = 1) -> SeedFile:
    """``file_scale`` multiplies the function count — real source files
    average several KB; benches use file_scale>1 so per-file compute
    (shingling/MinHash) dominates over fixed per-row costs."""
    rng = rng_for(global_seed, "seed", seed_id)
    lang = LANGS[rng.choice(len(LANGS), p=LANG_WEIGHTS)]
    n_funcs = int(rng.integers(4, 10)) * file_scale
    funcs = []
    for f in range(n_funcs):
        fname = f"{rng.choice(_VERBS)}_{rng.choice(_NOUNS)}_{seed_id}_{f}"
        idents = [f"{rng.choice(_NOUNS)}_{int(rng.integers(0, 100))}" for _ in range(int(rng.integers(3, 7)))]
        n_stmts = int(rng.integers(5, 14))
        funcs.append((fname, idents, n_stmts))
    c = _COMMENT[lang]
    header = [
        f"{c} Copyright (c) example corp. All rights reserved.",
        f"{c} Licensed under the Apache License, Version 2.0",
        f"{c} module generated tooling - do not edit",
    ]
    return SeedFile(seed_id=seed_id, lang=lang, funcs=funcs, header=header)


def _render_stmt(rng: np.random.Generator, idents: list[str]) -> str:
    a, b = rng.choice(idents, 2)
    op = _OPS[int(rng.integers(0, len(_OPS)))]
    kind = int(rng.integers(0, 3))
    if kind == 0:
        return f"{a} = {a} {op} {b}"
    if kind == 1:
        return f"{a} = {rng.choice(_VERBS)}({b}, {int(rng.integers(0, 1000))})"
    return f"if {a} > {int(rng.integers(0, 50))}: {b} = {b} {op} 1"


def _render(seed: SeedFile, *, rename: str = "", rename_frac: float = 1.0,
            rename_rng: np.random.Generator | None = None,
            order: list[int] | None = None,
            drop_tail: int = 0, extra_comments: np.random.Generator | None = None,
            ws_rng: np.random.Generator | None = None, strip_header: bool = False) -> str:
    """Render a SeedFile to text. Statement bodies are re-derived from the
    per-(seed, func) RNG so every render of the same seed is identical."""
    lines: list[str] = []
    if not strip_header:
        lines += seed.header
        lines.append("")
    order = order if order is not None else list(range(len(seed.funcs)))
    funcs = [seed.funcs[i] for i in order]
    if drop_tail:
        funcs = funcs[: max(1, len(funcs) - drop_tail)]
    c = _COMMENT[seed.lang]
    for fname, idents, n_stmts in funcs:
        body_rng = rng_for(seed.seed_id, "body", fname)
        if rename:
            pick = (
                [i for i in idents if rename_rng.random() < rename_frac]
                if rename_rng is not None and rename_frac < 1.0
                else idents
            )
            idmap = {i: i + rename for i in pick}
        else:
            idmap = {}
        use = [idmap.get(i, i) for i in idents]
        fdecl = {
            "python": f"def {fname}({', '.join(use[:2])}):",
            "javascript": f"function {fname}({', '.join(use[:2])}) {{",
            "go": f"func {fname}({', '.join(use[:2])} int) int {{",
            "java": f"static int {fname}(int {', int '.join(use[:2])}) {{",
            "rust": f"fn {fname}({': i64, '.join(use[:2])}: i64) -> i64 {{",
        }[seed.lang]
        lines.append(fdecl)
        if extra_comments is not None and extra_comments.random() < 0.6:
            lines.append(f"    {c} {extra_comments.choice(_VERBS)} the {extra_comments.choice(_NOUNS)} carefully")
        for _ in range(n_stmts):
            stmt = _render_stmt(body_rng, use)
            lines.append("    " + stmt)
            if extra_comments is not None and extra_comments.random() < 0.15:
                lines.append(f"    {c} note {int(extra_comments.integers(0, 9999))}")
        if seed.lang != "python":
            lines.append("}")
        lines.append("")
    text = "\n".join(lines)
    if ws_rng is not None:
        out = []
        for ln in text.split("\n"):
            if ws_rng.random() < 0.2:
                out.append("")
            out.append(ln + (" " * int(ws_rng.integers(0, 3))))
        text = "\n".join(out)
    return text


# ---------------------------------------------------------------------------
# Variant specs — the declarative registry (analogue of VARIANT_SPECS,
# build_standard_dataset.py:208-372). name → render kwargs factory.
# ---------------------------------------------------------------------------

def _spec_identity(seed, rng):
    return _render(seed)


def _spec_ws_jitter(seed, rng):
    return _render(seed, ws_rng=rng)


def _spec_comment_add(seed, rng):
    return _render(seed, extra_comments=rng)


def _spec_comment_strip(seed, rng):
    return _render(seed, strip_header=True)


def _spec_rename(seed, rng):
    # partial rename: ~35% of identifiers per function — full renames fall
    # below the positive band (code shingles are identifier-dense).
    return _render(seed, rename=f"_v{int(rng.integers(2, 9))}",
                   rename_frac=0.35, rename_rng=rng)


def _spec_reorder(seed, rng):
    order = list(range(len(seed.funcs)))
    rng.shuffle(order)
    return _render(seed, order=order)


def _spec_truncate(seed, rng):
    return _render(seed, drop_tail=max(1, len(seed.funcs) // 4))


def _spec_rename_heavy(seed, rng):
    """ADVERSARIAL variant (not in the default pool): 80% of identifiers
    renamed — wide-shingle MinHash similarity falls below the match
    threshold (sketch score ≈ 0.42 < 0.50 measured), while char-4-grams
    of the content stay ≈ 0.72. Exists to prove the content-rescore
    stage (reference P2) recovers what sketches miss."""
    return _render(seed, rename=f"_v{int(rng.integers(2, 9))}",
                   rename_frac=0.8, rename_rng=rng)


def _spec_combo(seed, rng):
    order = list(range(len(seed.funcs)))
    rng.shuffle(order)
    return _render(seed, order=order, ws_rng=rng, extra_comments=rng)


VARIANT_SPECS = {
    "identity": _spec_identity,        # byte-identical dup → exact-dedup case
    "ws_jitter": _spec_ws_jitter,
    "comment_add": _spec_comment_add,
    "comment_strip": _spec_comment_strip,
    "rename_idents": _spec_rename,
    "reorder_funcs": _spec_reorder,
    "truncate_tail": _spec_truncate,
    "combo": _spec_combo,
}

POSITIVE_MIN_JACCARD = 0.35   # variant must land above (normalized shingles)
NEGATIVE_MAX_JACCARD = 0.25   # near-miss must land below vs donor seed
# adversarial variants sit BETWEEN the bands by design: below the sketch
# match threshold, above the content-rescore floor
ADVERSARIAL_MIN_JACCARD = 0.15


def _norm_shingles(text: str, k: int = 12) -> np.ndarray:
    """Shingles of the pipeline-normalized text (same normalization the
    engine applies, so the self-validation band matches the LSH band)."""
    import re

    t = re.sub(r"(#|//|--)[^\n]*", "", text)
    t = re.sub(r"\s+", " ", t).strip().lower()
    return char_shingle_hashes(t, k)


_EXT = {"python": "py", "javascript": "js", "go": "go", "java": "java", "rust": "rs"}


def rows_for_seed(
    sid: int,
    n_seeds: int,
    variants_per_seed: int,
    global_seed: int,
    hot_basename_frac: float,
    near_miss_frac: float,
    file_scale: int = 1,
    adversarial_frac: float = 0.0,
) -> list[dict]:
    """All corpus+label rows for one seed — self-contained and
    order-independent (per-key RNG only), so generation parallelizes
    across any number of workers with bit-identical output."""
    out: list[dict] = []
    spec_names = list(VARIANT_SPECS)

    def add_row(seed: SeedFile, variant_idx: int, spec_name: str, content: str, cluster: int):
        rng = rng_for(global_seed, "meta", seed.seed_id, variant_idx, spec_name)
        repo = f"org{int(rng.integers(0, max(2, n_seeds // 5)))}/proj{int(rng.integers(0, 50))}"
        hot = rng_for(global_seed, "hot", seed.seed_id).random() < hot_basename_frac
        base = f"utils.{_EXT[seed.lang]}" if hot else f"mod_{seed.seed_id}.{_EXT[seed.lang]}"
        path = f"src/pkg{int(rng.integers(0, 20))}/{base}"
        commit = hashlib.sha1(
            f"{global_seed}:{seed.seed_id}:{variant_idx}:{spec_name}".encode()
        ).hexdigest()
        out.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": seed.lang,
                "content": content,
                "content_sha256": sha256_hex([content])[0],
                "cluster_id": cluster,
                "variant_spec": spec_name,
            }
        )

    seed = _make_seed(sid, global_seed, file_scale)
    canonical = _render(seed)
    canon_sh = _norm_shingles(canonical)
    add_row(seed, 0, "canonical", canonical, sid)
    n_var = int(rng_for(global_seed, "nvar", sid).integers(2, variants_per_seed))
    for v in range(1, n_var + 1):
        spec_rng = rng_for(global_seed, "specpick", sid, v)
        if adversarial_frac > 0 and spec_rng.random() < adversarial_frac:
            content = _spec_rename_heavy(
                seed, rng_for(global_seed, "var", sid, v, "rename_heavy", 0)
            )
            if exact_jaccard(_norm_shingles(content), canon_sh) >= ADVERSARIAL_MIN_JACCARD:
                add_row(seed, v, "rename_heavy", content, sid)
                continue
        spec = spec_names[int(spec_rng.integers(0, len(spec_names)))]
        # bounded attempts: keep the first render inside the intended
        # band, else fall back to ws_jitter (always in-band) — the
        # reference's keep-only-if-relabelable rule (:885-887).
        content = None
        for attempt in range(3):
            cand = VARIANT_SPECS[spec](seed, rng_for(global_seed, "var", sid, v, spec, attempt))
            if exact_jaccard(_norm_shingles(cand), canon_sh) >= POSITIVE_MIN_JACCARD:
                content = cand
                break
        if content is None:
            spec = "ws_jitter"
            content = VARIANT_SPECS[spec](seed, rng_for(global_seed, "var", sid, v, spec, 99))
        add_row(seed, v, spec, content, sid)
    # negative control: shares ONLY the header with this seed.
    if rng_for(global_seed, "nm", sid).random() < near_miss_frac:
        other = _make_seed(n_seeds + sid, global_seed, file_scale)
        other.lang = seed.lang
        other.header = seed.header
        nm = _render(other)
        if exact_jaccard(_norm_shingles(nm), canon_sh) <= NEGATIVE_MAX_JACCARD:
            add_row(other, 0, "near_miss", nm, n_seeds + sid)
    return out


_CORPUS_COLS = ("repo", "path", "commit", "lang", "content")
_LABEL_COLS = ("repo", "path", "commit", "content_sha256", "cluster_id", "variant_spec")


def _rows_to_tables(rows: list[dict]) -> tuple[pa.Table, pa.Table]:
    corpus = pa.table(
        {k: pa.array([r[k] for r in rows], type=pa.string()) for k in _CORPUS_COLS}
    )
    labels = pa.table(
        {
            k: pa.array(
                [r[k] for r in rows],
                type=pa.int64() if k == "cluster_id" else pa.string(),
            )
            for k in _LABEL_COLS
        }
    )
    return corpus, labels


def generate_corpus(
    n_seeds: int = 50,
    variants_per_seed: int = 8,
    global_seed: int = 42,
    hot_basename_frac: float = 0.2,
    near_miss_frac: float = 0.2,
    adversarial_frac: float = 0.0,
) -> tuple[pa.Table, pa.Table]:
    """Build (corpus, labels) Arrow tables sequentially (small scales).

    Every seed yields its canonical row + up to ``variants_per_seed - 1``
    perturbed rows (cluster = seed id). ``near_miss_frac`` of seeds also
    yield one negative-control row: a different program sharing only the
    boilerplate header (its own singleton cluster). ``hot_basename_frac``
    of seeds share the basename ``utils.<ext>`` → a deliberately hot
    exact-blocking key that exercises salting.
    """
    rows: list[dict] = []
    for sid in range(n_seeds):
        rows.extend(
            rows_for_seed(
                sid, n_seeds, variants_per_seed, global_seed,
                hot_basename_frac, near_miss_frac,
                adversarial_frac=adversarial_frac,
            )
        )
    return _rows_to_tables(rows)


def write_corpus_ray(
    out_dir: str,
    n_seeds: int,
    variants_per_seed: int = 8,
    global_seed: int = 42,
    hot_basename_frac: float = 0.2,
    near_miss_frac: float = 0.2,
    file_scale: int = 1,
) -> tuple[str, str]:
    """Parallel corpus generation as a Ray Data pipeline — the M17
    flat-map shape (``build_standard_dataset.py:952-978``) done right:
    seeds fan out as rows, each task renders its seeds independently
    (per-key RNG → order-independent), Parquet comes out sharded.
    Idempotent via a _DONE marker."""
    import os as _os

    import ray.data

    corpus_dir = _os.path.join(out_dir, "corpus")
    labels_dir = _os.path.join(out_dir, "labels")
    done = _os.path.join(out_dir, "_DONE")
    if _os.path.exists(done):
        return corpus_dir, labels_dir

    def gen(batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for sid in batch["id"].to_pylist():
            rows.extend(
                rows_for_seed(
                    int(sid), n_seeds, variants_per_seed, global_seed,
                    hot_basename_frac, near_miss_frac, file_scale,
                )
            )
        corpus, labels = _rows_to_tables(rows)
        return pa.table(
            {
                **{c: corpus[c] for c in _CORPUS_COLS},
                **{c: labels[c] for c in _LABEL_COLS if c not in _CORPUS_COLS},
            }
        )

    full = (
        ray.data.range(n_seeds)
        # bounded fan-out: ~1000 corpus rows per output block. 50-row
        # blocks made the downstream read schedule ~1000 tiny tasks,
        # which caps strong-scaling at high cpu counts on driver
        # scheduling throughput, not compute.
        .repartition(max(4, min(256, n_seeds // 200)))
        .map_batches(gen, batch_format="pyarrow", batch_size=200)
        .materialize()
    )
    full.select_columns(list(_CORPUS_COLS)).write_parquet(corpus_dir)
    full.select_columns(list(_LABEL_COLS)).write_parquet(labels_dir)
    with open(done, "w") as f:
        f.write("ok")
    return corpus_dir, labels_dir


def write_corpus(out_dir: str, n_seeds: int = 50, variants_per_seed: int = 8,
                 global_seed: int = 42, shards: int = 4,
                 adversarial_frac: float = 0.0) -> tuple[str, str]:
    """Write corpus + labels parquet under ``out_dir`` (sharded corpus so
    Ray reads parallelize). Idempotent: skips if a _DONE marker exists."""
    corpus_dir = os.path.join(out_dir, "corpus")
    labels_path = os.path.join(out_dir, "labels.parquet")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return corpus_dir, labels_path
    corpus, labels = generate_corpus(
        n_seeds, variants_per_seed, global_seed,
        adversarial_frac=adversarial_frac,
    )
    os.makedirs(corpus_dir, exist_ok=True)
    n = corpus.num_rows
    per = max(1, -(-n // shards))
    for i in range(shards):
        chunk = corpus.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(corpus_dir, f"part-{i:05d}.parquet"))
    pq.write_table(labels, labels_path)
    with open(done, "w") as f:
        f.write("ok")
    return corpus_dir, labels_path
