"""Stage 0 — normalize + fingerprint (stateless-per-row, warm-state actor).

The graft analogue of the reference's per-record preprocessing
(``standardize_name`` ``fuzz/inexus_parser.py:2295-2463`` +
``generate_ngrams`` ``:2657-2660``), fused into one ``map_batches`` pass
that emits, per record:

- ``record_id``        — stable 16-byte blake2b id from (repo, path, commit)
- ``content_sha256``   — the per-row invariant (BASELINE.json input_hint)
- ``minhash``          — char-shingle MinHash signature (fixed list<u64>)
- ``token_minhash``    — word-token MinHash sketch
- ``simhash``          — 64-bit SimHash (near-dup alternative path)
- size stats + ``basename`` (exact-key blocking feature)

``content`` is DROPPED here: wide strings never enter a shuffle
(SURVEY.md §7.4 "wide rows"). Everything downstream works on sketches.

Run as an actor pool: MinHash permutation params are built once per
actor in ``__init__`` (the reference builds its index once per process,
``ner/build_real_dataset.py:170``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from address_parser_ray.config import DEFAULT_CONFIG, PipelineConfig
from address_parser_ray.functions.hashing import (
    splitmix64,
    ID_DTYPE,
    char_shingle_hashes_u64,
    concat_doc_bytes,
    doc_shingle_window_mask,
    oph_minhash,
    oph_minhash_batch,
    pack_ids,
    simhash64,
    stable_id128,
    string_column_byte_views,
    token_hashes_u64,
    _global_window_hashes,
    token_stream,
)
from address_parser_ray.functions.normalize import basename_arrow, normalize_content_arrow


def fingerprint_schema(cfg: PipelineConfig) -> pa.Schema:
    return pa.schema(
        [
            # 128-bit identity (blake2b-16 raw bytes): 64-bit ids
            # birthday-collide ~10^9.7 records (SURVEY §8 debt, closed r4)
            ("record_id", pa.binary()),
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("basename", pa.string()),
            ("content_sha256", pa.string()),
            # deterministic representative-election priority: md5 of the
            # natural key (repo, path) — a pure function of the record's
            # identity that ANY engine (incl. the DuckDB oracle) can
            # recompute, unlike blake2b record-id order. Same-sha groups
            # elect rep = min (rep_key, record_id); the record_id
            # tie-break only fires when two records share (repo, path)
            # across commits (never at oracle scale, documented).
            # NOTE: md5 (hashlib C call) is deliberate — a strh60 SQL
            # twin evaluated inside the reps window exploded DuckDB's
            # jemalloc retained-VM map count (measured +18k mmaps/run,
            # exhausting vm.max_map_count across a multi-oracle sweep).
            ("rep_key", pa.string()),
            ("n_chars", pa.int64()),
            ("n_tokens", pa.int64()),
            # signatures are packed little-endian u64 bytes: binary survives
            # Arrow acero joins (fixed_size_list does not) and parquet
            # round-trips; decode with np.frombuffer(dtype=np.uint64).
            ("minhash", pa.binary()),
            ("token_minhash", pa.binary()),
            ("fine_minhash", pa.binary()),
            ("simhash", pa.uint64()),
        ]
    )


#: the sketches the flagship dedup pipeline consumes: SimHash is its own
#: near-dup flavor (q_simhash_hamming_pairs), never read by blocking /
#: scoring / clustering — skipping it also skips the unique() sort on the
#: wide shingle array, which exists only to give SimHash a deterministic
#: min-k sample (OPH MinHash is min-per-bin, so duplicates and order
#: cannot change it; pinned by test_fingerprinter_outputs_subset).
#: mean capped doc bytes at or below which the batched concat-stream
#: sketch path runs; above it the per-row helpers' cache-resident
#: temporaries win (measured crossover ~3 KB; see Fingerprinter)
_BATCHED_MAX_AVG_BYTES = 3000

PIPELINE_OUTPUTS = frozenset(
    {"minhash", "token_minhash", "fine_minhash", "content_sha256"}
)


def fingerprint_batch(
    batch: pa.Table,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    keep_norm_text: bool = False,
    outputs: frozenset | None = None,
) -> pa.Table:
    """Plain-function form of the fingerprint stage."""
    return Fingerprinter(cfg, outputs=outputs, keep_norm_text=keep_norm_text)(batch)


class Fingerprinter:
    """Callable form. OPH MinHash needs no permutation tables — the only
    warm state is the process-level shingle power cache inside
    ``functions.hashing`` (lru-style, grows on demand)."""

    #: every sketch the full fingerprint carries; pass a subset as
    #: ``outputs`` to skip the others' compute (e.g. the simhash query
    #: needs neither the three OPH sketches nor the content sha)
    ALL_OUTPUTS = frozenset(
        {"minhash", "token_minhash", "fine_minhash", "simhash", "content_sha256"}
    )

    def __init__(
        self,
        cfg: PipelineConfig = DEFAULT_CONFIG,
        outputs: frozenset | None = None,
        keep_norm_text: bool = False,
        passthrough: tuple = (),
    ):
        self.cfg = cfg
        self.outputs = self.ALL_OUTPUTS if outputs is None else frozenset(outputs)
        self.schema = fingerprint_schema(cfg)
        #: extra input columns copied verbatim onto the output (e.g. the
        #: driver testdata's ``doc_id``, so sketch queries stay comparable
        #: to SQL oracles without a blake2b id round-trip)
        self.passthrough = tuple(passthrough)
        #: also emit the normalized content as a ``norm_text`` column —
        #: the content-rescore stage's text source. Keeping it makes the
        #: fingerprint pass the ONLY content scan of the whole pipeline:
        #: rescore re-reads text BY ID from this output instead of
        #: re-reading + re-normalizing the corpus parquet (the second
        #: full-corpus scan was the measured Amdahl floor F ≈ 53 s that
        #: capped single-box scaling, BASELINE.md "Amdahl decomposition").
        #: The column must be DROPPED before any shuffle.
        self.keep_norm_text = keep_norm_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        cfg = self.cfg
        out = self.outputs
        content = batch["content"]
        norm = normalize_content_arrow(
            content, lowercase=cfg.lowercase, strip_comments=cfg.strip_comments
        )
        # zero-copy byte views straight off the Arrow buffers: no
        # str-decode / re-encode round trip per row. NOTE: normalized
        # text is ASCII-whitespace-collapsed, so token runs == regex
        # \s+ splits; n_tokens counts byte runs.
        norm_views = string_column_byte_views(norm)
        raw_views = string_column_byte_views(
            content.combine_chunks()
            if isinstance(content, pa.ChunkedArray)
            else content
        )
        repo = batch["repo"].to_pylist()
        path = batch["path"].to_pylist()
        commit = batch["commit"].to_pylist()
        rep_key = [
            hashlib.md5(
                f"{repo[i] or ''}\x1f{path[i] or ''}".encode("utf-8")
            ).hexdigest()
            for i in range(len(repo))
        ]

        want_mh = "minhash" in out
        want_tmh = "token_minhash" in out
        want_fmh = "fine_minhash" in out
        want_sh = "simhash" in out
        want_sha = "content_sha256" in out

        n = len(norm_views)
        rid = np.empty(n, dtype=ID_DTYPE)
        sh = np.empty(n, dtype=np.uint64) if want_sh else None
        shas = []
        for i in range(n):
            rid[i] = stable_id128(repo[i] or "", path[i] or "", commit[i] or "")
            if want_sha:
                shas.append(hashlib.sha256(raw_views[i]).hexdigest())
        # poison-row bound: sketch at most max_sketch_bytes of the
        # normalized content (the sha above is always full-content)
        capped = [v[: cfg.max_sketch_bytes] for v in norm_views]
        total_bytes = sum(v.size for v in capped)
        use_batched = (
            (want_mh or want_tmh or want_fmh)
            and n > 0
            and total_bytes <= n * _BATCHED_MAX_AVG_BYTES
        )
        if use_batched:
            # BATCHED sketch path (r4): docs concatenate into ONE byte
            # stream per CHUNK (~64 KB of padded bytes) — one rolling
            # hash per k, one OPH bin-min pass per sketch, all
            # gather-free. Replaces ~6 numpy-call-bound helpers PER ROW
            # (the pipeline's one content scan and its Amdahl floor):
            # measured 62× faster at 100 B docs, 18× at 300 B, crossing
            # over at ~3 KB — above the crossover the per-row loop's
            # fully cache-resident temporaries win (u64-per-byte temps
            # are 8× the text; chunking can't beat a 10 KB working
            # set), so dispatch is by mean doc size. Values are
            # bit-identical either way (parity-pinned).
            mh = (
                np.empty((n, cfg.num_perm), dtype=np.uint64) if want_mh else None
            )
            fmh = (
                np.empty((n, cfg.num_perm), dtype=np.uint64) if want_fmh else None
            )
            tmh = (
                np.empty((n, cfg.token_num_perm), dtype=np.uint64)
                if want_tmh
                else None
            )
            n_tok = np.empty(n, dtype=np.int64)
            CHUNK_BYTES = 256 << 10
            # pad to the LARGEST k any sketch on this path uses: a short
            # doc padded only to shingle_k would let a fine_shingle_k >
            # shingle_k window read past its slot into the separator /
            # next doc while the window mask still marks it valid
            pad_k = max(cfg.shingle_k, cfg.fine_shingle_k)
            lens = np.fromiter(
                (max(v.size, pad_k) + 1 for v in capped),
                dtype=np.int64,
                count=n,
            )
            lo = 0
            while lo < n:
                hi = lo + 1
                acc = int(lens[lo])
                while hi < n and acc + lens[hi] <= CHUNK_BYTES:
                    acc += int(lens[hi])
                    hi += 1
                m = hi - lo
                concat, starts, Ls = concat_doc_bytes(
                    capped[lo:hi], pad_to=pad_k
                )
                doc_by_pos = np.repeat(
                    np.arange(m, dtype=np.int64), np.maximum(Ls, pad_k) + 1
                )
                if want_mh:
                    H12 = splitmix64(
                        _global_window_hashes(concat, cfg.shingle_k)
                    )
                    m12, _ = doc_shingle_window_mask(
                        H12.size, starts, Ls, cfg.shingle_k
                    )
                    mh[lo:hi] = oph_minhash_batch(
                        H12, doc_by_pos[: H12.size], m, cfg.num_perm,
                        cfg.seed, mask=m12,
                    )
                if want_fmh:
                    H4 = splitmix64(
                        _global_window_hashes(concat, cfg.fine_shingle_k)
                    )
                    m4, _ = doc_shingle_window_mask(
                        H4.size, starts, Ls, cfg.fine_shingle_k
                    )
                    fmh[lo:hi] = oph_minhash_batch(
                        H4, doc_by_pos[: H4.size], m, cfg.num_perm,
                        cfg.seed + 13, mask=m4,
                    )
                th, tdoc, ntk = token_stream(concat, starts, m)
                n_tok[lo:hi] = ntk
                if want_tmh:
                    tmh[lo:hi] = oph_minhash_batch(
                        th, tdoc, m, cfg.token_num_perm, cfg.seed + 7
                    )
                lo = hi
        else:
            # wide-doc / no-sketch path: per-row helpers (cache-resident)
            mh = np.empty((n, cfg.num_perm), dtype=np.uint64) if want_mh else None
            tmh = (
                np.empty((n, cfg.token_num_perm), dtype=np.uint64)
                if want_tmh
                else None
            )
            fmh = np.empty((n, cfg.num_perm), dtype=np.uint64) if want_fmh else None
            n_tok = np.empty(n, dtype=np.int64)
            for i in range(n):
                arr = capped[i].astype(np.uint64)
                if want_mh:
                    shingles = char_shingle_hashes_u64(
                        arr, cfg.shingle_k, unique=False
                    )
                    mh[i] = oph_minhash(shingles, cfg.num_perm, cfg.seed)
                toks, n_tok[i] = token_hashes_u64(arr, unique=False)
                if want_tmh:
                    tmh[i] = oph_minhash(toks, cfg.token_num_perm, cfg.seed + 7)
                if want_fmh:
                    fine = char_shingle_hashes_u64(
                        arr, cfg.fine_shingle_k, unique=False
                    )
                    fmh[i] = oph_minhash(fine, cfg.num_perm, cfg.seed + 13)
        if want_sh:
            # SimHash keeps the per-row path: it needs the unique-sorted
            # min-2048 shingle SAMPLE, which the streamed form has no
            # cheap equivalent for (and its queries run on demand, not
            # in the flagship hot path).
            for i in range(n):
                arr = capped[i].astype(np.uint64)
                shingles = char_shingle_hashes_u64(arr, cfg.shingle_k, unique=True)
                sh[i] = simhash64(shingles[:2048])

        n_chars = pc.cast(pc.utf8_length(content), pa.int64())
        cols = {
            "record_id": pack_ids(rid),
            "repo": batch["repo"],
            "path": batch["path"],
            "commit": batch["commit"],
            "lang": batch["lang"],
            "basename": basename_arrow(batch["path"]),
            "n_chars": n_chars,
            "n_tokens": pa.array(n_tok),
            "rep_key": pa.array(rep_key, type=pa.string()),
        }
        if want_sha:
            cols["content_sha256"] = pa.array(shas, type=pa.string())
        if want_mh:
            cols["minhash"] = pa.array(
                [mh[i].tobytes() for i in range(n)], type=pa.binary()
            )
        if want_tmh:
            cols["token_minhash"] = pa.array(
                [tmh[i].tobytes() for i in range(n)], type=pa.binary()
            )
        if want_fmh:
            cols["fine_minhash"] = pa.array(
                [fmh[i].tobytes() for i in range(n)], type=pa.binary()
            )
        if want_sh:
            cols["simhash"] = pa.array(sh)
        # column order of the full schema is preserved for default runs
        if out == self.ALL_OUTPUTS:
            cols = {f.name: cols[f.name] for f in self.schema}
        if self.keep_norm_text:
            cols["norm_text"] = norm
        for name in self.passthrough:
            if name in batch.column_names:
                cols[name] = batch[name]
        return pa.table(cols)


def fingerprint_stage(
    ds,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    *,
    concurrency=None,
    keep_norm_text: bool = False,
    outputs: frozenset | None = None,
):
    """corpus Dataset → fingerprints Dataset (content dropped).

    Runs as stateless TASKS over warm workers: the per-process param
    cache gives actor-style state amortization while staying elastic
    (no per-execution pool spawn).

    ``keep_norm_text=True`` additionally emits the normalized content as
    a ``norm_text`` column (for the rescore stage's by-id text lookup) —
    callers MUST drop it before any shuffle."""
    return ds.map_batches(
        fingerprint_batch,
        fn_kwargs={
            "cfg": cfg,
            "keep_norm_text": keep_norm_text,
            "outputs": outputs,
        },
        batch_format="pyarrow",
        batch_size=cfg.fingerprint_batch_size,
        zero_copy_batch=True,
    )
