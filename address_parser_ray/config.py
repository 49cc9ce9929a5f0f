"""Pipeline configuration.

The reference keeps its tunables as instance constants
(``fuzz/inexus_parser.py:114-117``: ``TOPK_CANDIDATES=400``,
``DICE_GATE=0.4`` ...; contest variant ``hcmut_assigment/main.py:61-64``).
Here they live in one frozen dataclass so a run is fully described by its
config — no per-run tuning, which is what keeps N-cpu and 4N-cpu runs
bit-identical.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class PipelineConfig:
    # ---- stage 0: normalize + fingerprint -------------------------------
    #: char-shingle width over normalized content (the reference shingles
    #: normalized addresses with char 4-grams, inexus_parser.py:2657-2660;
    #: code is longer-range, so wider shingles).
    shingle_k: int = 12
    #: number of MinHash permutations over char shingles.
    num_perm: int = 128
    #: number of MinHash permutations over word tokens (the cheap
    #: "token-set" sketch used by the scorer).
    token_num_perm: int = 64
    #: lowercase content during normalization.
    lowercase: bool = True
    #: strip line comments / collapse whitespace during normalization
    #: (analogue of the reference's redundant-phrase removal,
    #: inexus_parser.py:2295-2463).
    strip_comments: bool = True

    # ---- stage 1: blocking ----------------------------------------------
    #: LSH bands over the char-shingle signature: bands * rows == num_perm.
    #: (32, 4) targets a Jaccard threshold of (1/32)**(1/4) ≈ 0.42.
    lsh_bands: int = 32
    lsh_rows: int = 4
    #: also emit an exact blocking key on (lang, basename(path)) — the
    #: analogue of the reference's prefix-detected exact-key blocking
    #: (inexus_parser.py:2685-2762).
    exact_path_key: bool = True
    #: records per (possibly salted) block above which the key is salted
    #: into sub-buckets. Mirrors the reference's candidate caps
    #: (top-K 400 / Dice-scan stop 200, inexus_parser.py:114, 2829-2831).
    max_block_records: int = 256
    #: hard cap on candidate pairs emitted per block (deterministic:
    #: pairs are generated in sorted-id order and truncated).
    max_pairs_per_block: int = 4096
    #: conjunctive blocking (reference D6: candidate-set intersection
    #: across detected levels, inexus_parser.py:2768-2794): a candidate
    #: pair must be produced by at least this many distinct block keys
    #: (LSH bands / exact key) to survive. 1 = disjunctive (default);
    #: ≥2 trades recall for pair-volume/precision — note it also filters
    #: single-hit exact-key pairs.
    min_band_hits: int = 1

    # ---- stage 2: pairwise scoring --------------------------------------
    #: cheap set-similarity gate before the rich score — the reference's
    #: Dice gate 0.4 (inexus_parser.py:2804-2833). Applied to the MinHash
    #: Jaccard estimate.
    jaccard_gate: float = 0.25
    #: blend weights (char-shingle Jaccard, token-set Jaccard,
    #: path Jaro-Winkler, size ratio) — the analogue of the reference's
    #: 0.6*base + 0.4*WRatio blend + component boosts
    #: (inexus_parser.py:2893-2912).
    w_shingle: float = 0.55
    w_token: float = 0.30
    w_path: float = 0.05
    w_size: float = 0.10
    #: final match threshold on the blended score.
    match_threshold: float = 0.50
    #: demote non-exact pairs whose ``lang`` differs — the P4 analogue of
    #: the reference's hierarchy-constrained resolution (a resolved
    #: component must be consistent with the record's own evidence,
    #: inexus_parser.py:264-403). Costs nothing: lang rides the compact
    #: feature table.
    enforce_lang_consistency: bool = True

    # ---- stage 2b: content rescore (reference P2 rich scorer) -----------
    #: re-read normalized content for UNCERTAIN pairs (below the match
    #: threshold but above this exact-Jaccard floor) and re-score them on
    #: content-level evidence — the analogue of the reference's
    #: ratio/partial_ratio/WRatio blend computed after the Dice gate
    #: (inexus_parser.py:2852-2941). Sketches miss heavy identifier
    #: renames; char-4-grams of the content survive them.
    content_rescore: bool = True
    #: the content blend is ESTIMATED for every gated pair from a second
    #: OPH MinHash over char-4-grams (computed once per record in the
    #: fingerprint pass — the Ray-native way to "re-read content" is to
    #: precompute the content feature in the single content pass); the
    #: exact content join below runs only where sketch noise could flip
    #: the decision: |estimated score − match_threshold| < rescore_margin.
    rescore_margin: float = 0.08
    #: 4-gram shingle width of the fine (rename-robust) sketch.
    fine_shingle_k: int = 4
    #: poison-row bound: sketches (MinHash/SimHash/token hashes) are
    #: computed over at most this many bytes of NORMALIZED content — a
    #: single multi-GB row must not stall a fingerprint worker with an
    #: 8 B/char shingle-hash allocation. ``content_sha256`` (the per-row
    #: invariant) is ALWAYS over the full raw content. 4 MiB covers
    #: >99.9% of real source files; near-dup evidence from a 4 MiB
    #: prefix is standard practice at web scale. Deterministic.
    max_sketch_bytes: int = 4 << 20
    #: band pair count at or below which the band's id set is pulled to
    #: the driver and broadcast as a semi-join filter (16 B/pair → ≤32 MB
    #: at the gate); above it, the full bucketed content join runs.
    rescore_band_max_driver_pairs: int = 2_000_000
    #: blend weights for the content score:
    #: w_content_shingle * exactJaccard(k=shingle_k)
    #: + w_content_4gram * exactJaccard(k=4). Measured margins on the
    #: labeled fixture: heavy-rename positives ≈ 0.57, near-miss
    #: negatives ≤ 0.19 at these weights.
    w_content_shingle: float = 0.35
    w_content_4gram: float = 0.65
    #: MinHash lanes actually shipped to the pair scorer (a prefix of the
    #: full signature). Fewer lanes → noisier Jaccard estimate but half
    #: the bytes through the pair-feature join; 64/32 keeps the estimate
    #: std ≈ 0.06 at the gate, far inside the positive/negative margin.
    score_char_lanes: int = 64
    score_token_lanes: int = 32

    # ---- stage 3: clustering --------------------------------------------
    #: max label-propagation rounds before giving up (fixpoint is usually
    #: reached in <6 rounds thanks to pointer-jumping).
    max_cc_rounds: int = 20
    #: match graphs at or below this edge count run transitive closure as
    #: a driver-side union-find (16 B/edge → ≤32 MB on the driver); above
    #: it the distributed label-propagation loop takes over.
    driver_cc_max_edges: int = 2_000_000
    #: when the COMPACT per-record feature table (~250 B/record) fits
    #: under this byte budget, scoring broadcasts it (ray.put once, read
    #: per actor) instead of running two join shuffles. ~2 GiB covers
    #: ~8M unique records per node; above that the bucketed join path
    #: takes over.
    broadcast_feats_max_bytes: int = 2 << 30

    # ---- execution ------------------------------------------------------
    #: batch size for fingerprinting (wide `content` strings → moderate).
    fingerprint_batch_size: int = 512
    #: actor-pool size bounds for stateful stages; None → autoscale
    #: (1, total CPUs) via rayutil.default_concurrency.
    scorer_concurrency: tuple | None = None
    scorer_batch_size: int = 2048

    # ---- hashing seeds (fixed: determinism across runs/processes) -------
    seed: int = 42

    def __post_init__(self):
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError(
                f"lsh_bands*lsh_rows ({self.lsh_bands}*{self.lsh_rows}) "
                f"must equal num_perm ({self.num_perm})"
            )


DEFAULT_CONFIG = PipelineConfig()
