"""Query registry vs DuckDB oracles at sf0.001 (fast subset — the driver
re-runs the full matrix at sf0.01)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_df(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return res


SQL_CHECKED = [
    "minhash_lsh_clusters",
    "lsh_cluster_assignments",
    "score_histogram",
    "cluster_canonical",
    "cluster_density",
    "ngram_jaccard_pairs",
    "block_size_histogram",
    "canopy_clusters",
    "residual_tokens",
    "bigram_lm_score",
    "bloom_contamination",
    "size_weighted_sample",
    "exact_dedup_groups",
    "lang_counts",
    "doc_stats_by_lang",
    "token_counts_by_lang",
    "quality_flags",
    "top_docs",
    "distinct_langs",
    "hash_split_counts",
    "filter_union_counts",
    "orders_by_nation",
    "pricing_summary",
    "top_customers",
    "events_hourly",
    "embedding_topk",
    "media_sizes",
    "largest_doc_per_lang",
    "top3_docs_per_source",
    "customers_per_region",
    "purchase_last_click",
    "user_sessions",
    "event_value_extremes",
    "quality_scores",
    "knn_bruteforce",
    "ngram_jaccard_stats",
    "shuffle_split_write",
    "langid_pred",
    "infer_missing_lang",
    "ann_ivf_topk",
    "bio_label_counts",
    "purchase_clicks_1h",
    "events_sliding_3h",
    "event_value_percentiles",
    "distinct_kmv",
    "stratified_sample",
    "customers_without_orders",
    "ann_lsh_buckets",
    "vocab_stats",
    "revenue_rollup",
    "tfidf_top_terms",
    "seq_pack_stats",
    "contamination_5gram",
    "repetition_stats",
    "props_k_stats",
    "pivot_event_hours",
    "embedding_centroids",
    "dup_ratio_by_source",
    "event_value_log_hist",
    "mixture_sample",
    "quality_quantile_filter",
    "doc_chunks",
    "funnel_counts",
    "embedding_near_dup",
    "inverted_index",
    "bloom_semijoin_revenue",
    "table_profile",
    "upsert_latest",
    "kmeans_update",
    "event_gap_histogram",
    "type_prefix_counts",
    "top_tokens_per_doc",
    "dup_span_stats",
    "cdc_chunk_stats",
    "simhash_hamming_pairs",
    "gram_novelty",
    "source_overlap",
    "heavy_hitters",
    "pii_scrub",
    "quantile_sketch",
    "gram_components",
    "bigram_lm_scores",
    "revenue_by_priority",
    "user_running_totals",
    "minhash_band_keys",
    "minhash_cluster_ids",
    "name_edit_pairs",
    "keyword_tags",
    "value_moments",
    "cdc_with_deletes",
    "embedding_dim_stats",
    "jw_name_pairs",
    "token_cooccurrence",
    "user_spend_ranks",
    "retention_cohorts",
    "fk_orphans",
    "sorted_neighborhood",
    "meta_blocking",
    "fs_em_update",
    "fellegi_sunter_em",
    "fs_classify",
    "blocking_quality",
    "dsir_weights",
    "token_set_pairs",
    "linreg_grad_step",
    "er_training_pairs",
    "window_dedup_stats",
    "cluster_size_histogram",
    "pagerank_ranks",
    "kcore_nodes",
    "tfidf_cosine_pairs",
    "pareto_parts",
    "rollup_counts",
    "scd2_history",
    "graph_triangles",
    "countmin_estimates",
    "winsorized_stats",
    "balanced_sample",
    "lang_regression",
    "decayed_counts",
    "regional_revenue",
    "containment_pairs",
    "length_outliers",
    "partition_digests",
    "fragment_stitching",
    "golden_records",
    "soundex_blocks",
    "one_to_one_match",
    "prefix_filter_pairs",
    "range_partition_balance",
    "zonemap_pruning",
    "kmv_join_estimate",
    "late_event_stats",
    "rendezvous_rebalance",
    "trigram_search",
    "hll_distinct",
    "scd2_temporal_join",
    "snapshot_diff",
    "dq_expectations",
    "weighted_sample",
    "zorder_vs_linear",
    "clustering_agreement",
    "event_transitions",
    "canonical_snap",
    "signature_blocks",
    "token_transforms",
    "cluster_medoids",
    "session_concurrency",
    "shard_balance",
    "embedding_quantize",
    "activity_reconcile",
    "source_quality_prior",
    "dedup_savings",
    "token_lift",
    "decile_grid",
    "review_pairs",
    "events_hourly_dense",
    "session_coverage",
    "lang_similarity",
    "hourly_anomalies",
    "hapax_stats",
    "mixed_lang_docs",
    "dup_cap_sample",
    "line_dedup_filter",
    "tf_match_weights",
    "source_lang_gini",
    "k_anonymity_audit",
    "benford_digits",
    "cube_counts",
    "oov_rate",
    "mad_outliers",
    "trending_types",
    "copurchase_pairs",
    "l_diversity_audit",
    "cumulative_users",
    "weekly_churn",
    "fanout_histogram",
    "match_waterfall",
    "csv_read_counts",
    "except_all_tokens",
    "percentile_rank_docs",
    "loo_target_encoding",
    "cos_pair_histogram",
    "minhash_jaccard_error",
    "ewma_hourly",
    "source_ab_tests",
    "cv_fold_balance",
    "rrf_fusion",
    "vocab_growth",
]


def test_cluster_density_bounds(ray_session):
    """Cluster-QA density: every reported cluster has n >= 2 members,
    edge count bounded by n*(n-1)/2, density in (0, 1e6]; the corpus's
    exact-duplicate groups must surface at least one full clique."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = _to_df(QUERIES["cluster_density"](SF))
    assert len(df) > 0
    assert (df["n_members"] >= 2).all()
    possible = df["n_members"] * (df["n_members"] - 1) // 2
    assert (df["n_edges"] <= possible).all()
    assert (df["density_ppm"] <= 1_000_000).all()
    assert (df["density_ppm"] > 0).all()
    assert (df["density_ppm"] == 1_000_000).any()


def test_canonical_snap_semantics(ray_session):
    """The P3 matcher must (a) resolve every canonical name exactly,
    (b) snap the bulk of vowel-stripped variants back to their source
    name, and (c) leave sub-threshold inputs unresolved (snapped NULL)
    rather than force a bad match — the reference's accept-cutoff
    behavior (fuzz/inexus_parser.py:1718-1756)."""
    import re

    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["canonical_snap"](SF).to_pandas()
    exact = df[df["method"] == "exact"]
    canon = set(exact["input_name"])
    assert len(exact) and (exact["snapped"] == exact["input_name"]).all()
    assert (exact["jw_micro"] == 1_000_000).all()
    # every 'none' row carries the best candidate's score but no snap
    none = df[df["method"] == "none"]
    assert none["snapped"].isna().all()
    assert (none["jw_micro"] < 890_000).all()
    # fuzzy variants mostly recover their source canonical name
    fuzzy = df[df["method"] == "fuzzy"]
    ok = sum(
        1
        for _, r in fuzzy.iterrows()
        if r["snapped"] in canon
        and re.sub(r"[aeiou]", "", r["snapped"]) == r["input_name"]
    )
    assert len(fuzzy) and ok / len(fuzzy) >= 0.85


def test_signature_blocks_semantics(ray_session):
    """Signature blocks must be consistent: n_pairs = C(n,2), the rep
    is a member, and the prefix blocks partition names by first token
    (every multi-member first-token group appears)."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["signature_blocks"](SF).to_pandas()
    assert (df["n_names"] >= 2).all()
    assert (df["n_pairs"] == df["n_names"] * (df["n_names"] - 1) // 2).all()
    pref = df[df["kind"] == "prefix"]
    assert len(pref) and pref["rep"].str.split(" ").str[0].eq(pref["sig"]).all()


def test_compression_quality_properties(ray_session, con):
    """zlib ratio signal: covers every doc, ratios positive and
    deterministic; the is_repetitive rule matches the ratio column;
    and the signal orders repetitive below varied text (checked on
    synthetic strings with the same zlib level the query uses)."""
    import zlib

    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["compression_quality"](SF).to_pandas()
    n_docs = con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert len(df) == n_docs
    assert (df["ratio_ppm"] > 0).all()
    assert (
        df["is_repetitive"] == (df["ratio_ppm"] < 250_000)
    ).all()
    assert (
        df["ratio_ppm"]
        == df["zlib_bytes"] * 1_000_000 // df["n_bytes"].clip(lower=1)
    ).all()

    def ratio(s: str) -> int:
        raw = s.encode()
        return len(zlib.compress(raw, 6)) * 1_000_000 // len(raw)

    import hashlib

    rep = ratio("import os\n" * 2000)
    varied = ratio(
        "".join(hashlib.md5(str(i).encode()).hexdigest() for i in range(2000))
    )
    assert rep < 250_000 < varied  # the flag separates the two regimes


def test_shard_balance_spread(ray_session):
    """Size-rank striping must balance shards: every shard gets within
    one doc of n/K docs, and byte totals spread far tighter than the
    max-doc size (the property hash placement cannot give)."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["shard_balance"](SF).to_pandas()
    assert len(df) == 16
    assert df["n_docs"].max() - df["n_docs"].min() <= 1
    spread = int(df["total_bytes"].max() - df["total_bytes"].min())
    assert spread <= int(df["max_bytes"].max())


def test_embedding_top_pc_vs_numpy(ray_session):
    """Power iteration must (a) be bit-identical across runs (the
    integer-iterate guarantee), (b) emit a ~unit vector, and (c) reach
    a Rayleigh quotient close to numpy's exact λ_max of the centered
    milli-grid covariance.  The fixture spectrum is nearly flat
    (synthetic embeddings ⇒ λ₁/λ₂ ≈ 1.07), so the eigenVECTOR is
    ill-conditioned — the honest power-iteration guarantee at 5 rounds
    is the eigenvalue estimate, measured at ~0.85·λ_max here (vs the
    spectrum mean at 0.54·λ_max); the bound asserts ≥ 0.75."""
    import numpy as np
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    t1 = QUERIES["embedding_top_pc"](SF).to_pandas().sort_values("dim")
    t2 = QUERIES["embedding_top_pc"](SF).to_pandas().sort_values("dim")
    assert t1.reset_index(drop=True).equals(t2.reset_index(drop=True))

    v = t1["v_milli"].to_numpy(np.int64).astype(np.float64) / 1000.0
    assert abs(np.linalg.norm(v) - 1.0) < 0.05

    emb = pq.read_table(f"{SF}/embeddings.parquet", columns=["embedding"])
    X = np.asarray(
        emb["embedding"].combine_chunks().flatten(), dtype=np.float64
    ).reshape(emb.num_rows, -1)
    Xm = np.floor(X * 1000.0).astype(np.int64)
    mu = Xm.sum(axis=0) // Xm.shape[0]
    Xc = (Xm - mu).astype(np.float64)
    w = np.linalg.eigvalsh(Xc.T @ Xc)
    lam = float(t1["lam_milli"].iloc[0]) * 1000.0  # back to milli² units
    assert lam <= w[-1] * 1.001  # Rayleigh never exceeds λ_max
    assert lam >= 0.75 * w[-1]  # and beats the flat-spectrum mean easily
    assert lam >= 1.2 * float(w.mean())


def test_bpe_eval_properties(ray_session):
    """Tokenizer eval invariants: merges only fuse, so tokens_after ≤
    symbols_before; compression is the exact integer ratio; the run is
    deterministic; and applying MORE merges never tokenizes worse
    (checked by re-encoding one word by hand with a rule prefix)."""
    from address_parser_ray.pipelines.queries import (
        QUERIES,
        _bpe_apply_merge,
    )

    d1 = QUERIES["bpe_eval"](SF).to_pandas().sort_values("lang")
    d2 = QUERIES["bpe_eval"](SF).to_pandas().sort_values("lang")
    assert d1.reset_index(drop=True).equals(d2.reset_index(drop=True))
    assert (d1["tokens_after"] <= d1["symbols_before"]).all()
    assert (
        d1["compression_ppm"]
        == d1["tokens_after"] * 1_000_000 // d1["symbols_before"].clip(lower=1)
    ).all()
    assert (d1["compression_ppm"] <= 1_000_000).all()

    # monotonicity of merge application on a concrete word
    word = tuple("deduplicate") + ("</w>",)
    rules = [("d", "e"), ("de", "dup"), ("a", "t")]
    lens = []
    syms = word
    for left, right in rules:
        syms = _bpe_apply_merge([syms], left, right)[0]
        lens.append(len(syms))
    assert lens == sorted(lens, reverse=True) or all(
        a >= b for a, b in zip(lens, lens[1:])
    )


def test_mixed_lang_detector_fires():
    """The corpus has no mixed docs (oracle parity shows 0), so pin
    separately that the per-line rule CAN fire: a doc with an English
    line and a German line yields two distinct predictions."""
    from address_parser_ray.functions.text import detect_lang

    doc = (
        "the cat is on the mat and it was good\n"
        "der hund ist nicht mit der katze und das ist gut\n"
    )
    langs = {detect_lang(ln) for ln in doc.split("\n") if ln}
    assert langs == {"en", "de"}


def test_hll_distinct_accuracy(ray_session, con):
    """The stored register state must support both estimator branches:
    the raw integer estimate rides in the row; the small-range
    linear-counting correction m·ln(m/V) is recomputable from
    n_zero_regs. Both must land near the exact distinct count."""
    import math

    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["hll_distinct"](SF).to_pandas().set_index("lang")
    exact = (
        con.sql(
            "SELECT lang, count(DISTINCT md5(COALESCE(text,''))) AS d "
            "FROM documents GROUP BY 1"
        )
        .df()
        .set_index("lang")["d"]
    )
    for lang, row in df.iterrows():
        ex = int(exact[lang])
        assert abs(int(row["est_raw"]) - ex) <= 0.4 * ex
        v = int(row["n_zero_regs"])
        assert v > 0  # small-range regime at fixture scale
        lin = 64 * math.log(64 / v)
        # estimator variance over 64 registers is ~1/sqrt(64) = 12.5%
        # per draw; the bound covers the hash-draw envelope (the r5
        # strh60 hash lands one lang at ~38% where md5 drew ~20%)
        assert abs(lin - ex) <= 0.45 * ex


def test_canopy_greedy_matches_bruteforce(ray_session):
    """The distributed per-lang vectorized greedy must equal a plain
    sequential reference canopy build (same T1/T2, ascending doc_id
    centers), and primary canopy centers can never exceed the member's
    doc_id (a doc still uncovered when its id comes up becomes its own
    center first)."""
    from address_parser_ray.config import DEFAULT_CONFIG
    from address_parser_ray.pipelines.queries import (
        _CANOPY_T1,
        _CANOPY_T2,
        QUERIES,
    )
    from address_parser_ray.sources import documents_as_corpus
    from address_parser_ray.stages.fingerprint import Fingerprinter

    got = (
        QUERIES["canopy_clusters"](SF)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["canopy_id"] <= got["doc_id"]).all()
    assert (got["n_canopies"] >= 1).all()

    fp = (
        documents_as_corpus(SF)
        .map_batches(
            Fingerprinter,
            fn_constructor_kwargs={
                "cfg": DEFAULT_CONFIG,
                "outputs": frozenset({"simhash"}),
                "passthrough": ("doc_id", "lang"),
            },
            batch_format="pyarrow",
            concurrency=1,
        )
        .to_pandas()
    )
    ref_rows = []
    for lang, g in fp.groupby("lang"):
        g = g.sort_values("doc_id")
        ids = g["doc_id"].tolist()
        shs = [int(s) for s in g["simhash"]]
        remaining = set(ids)
        primary = {}
        counts = {i: 0 for i in ids}
        while remaining:
            c = min(remaining)
            csh = shs[ids.index(c)]
            for i, s in zip(ids, shs):
                d = bin(csh ^ s).count("1")
                if d <= _CANOPY_T1:
                    counts[i] += 1
                    primary.setdefault(i, c)
                if d <= _CANOPY_T2 and i in remaining:
                    remaining.discard(i)
        for i in ids:
            ref_rows.append((i, lang, primary[i], counts[i]))
    ref = (
        pd.DataFrame(ref_rows, columns=["doc_id", "lang", "canopy_id", "n_canopies"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"canopy_id": "int64", "n_canopies": "int64"}), ref
    )


def test_bio_phrases_chain_free():
    """The bio_label_counts SQL oracle is only equivalent to the greedy
    BIO scan while the phrase list is 2-token and chain-free (no phrase's
    last token equals another's first). If this fails, the oracle must be
    rewritten as a sequential recursion, not just the list edited."""
    from address_parser_ray.pipelines.queries import _BIO_PHRASES

    assert all(len(p) == 2 for p in _BIO_PHRASES)
    firsts = {p[0] for p in _BIO_PHRASES}
    lasts = {p[-1] for p in _BIO_PHRASES}
    assert not (firsts & lasts)


def test_infer_missing_lang_exercises_inference(ray_session):
    """The mask must decorrelate from source so the majority-vote path
    actually fires (not just the 'und' fallback for evidence-free
    sources)."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["infer_missing_lang"](SF).to_pandas()
    inferred = df[df["inferred"]]
    assert len(inferred) > 0
    assert (inferred["lang_filled"] != "und").any()
    # unmasked rows pass through untouched
    assert (~df["inferred"]).any()


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(ray_session, con, name):
    from address_parser_ray.pipelines.oracle import ORACLE_SQL
    from address_parser_ray.pipelines.queries import QUERIES

    rdf = _canon(_to_df(QUERIES[name](SF)))
    odf = _canon(con.sql(ORACLE_SQL[name]).df())
    assert list(rdf.columns) == list(odf.columns), (rdf.columns, odf.columns)
    assert len(rdf) == len(odf)
    for c in rdf.columns:
        # The driver's value-hash is dtype-sensitive across numeric KINDS
        # (round 1: DuckDB HUGEINT→float64 vs Ray int64 hashed red with
        # identical values). Same-kind width differences (int32 vs int64)
        # are fine; int vs float is not — catch it here, not at judging.
        rk, ok = rdf[c].dtype.kind, odf[c].dtype.kind
        norm = lambda k: "i" if k in "iu" else k
        assert norm(rk) == norm(ok), (name, c, rdf[c].dtype, odf[c].dtype)
        if rdf[c].dtype != odf[c].dtype:
            rdf[c] = rdf[c].astype(odf[c].dtype)
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False)


@pytest.mark.parametrize(
    "name", ["containment_pairs", "cluster_medoids", "minhash_jaccard_error"]
)
def test_gated_texts_join_path_matches_oracle(ray_session, con, name, monkeypatch):
    """Forcing the texts byte gate to 1 byte sends the three doc-text
    diagnostics down the bucketed pinned_join path (the 100 TB shape —
    no driver-side corpus text at all); results must stay bit-identical
    to the oracle the broadcast path is checked against."""
    monkeypatch.setenv("APR_DOC_TEXTS_BROADCAST_MAX_BYTES", "1")
    from address_parser_ray.pipelines import queries as Q
    from address_parser_ray.pipelines.oracle import ORACLE_SQL

    tref, tds = Q._gated_doc_texts(SF)
    assert tref is None and tds is not None, "gate not forced to join path"
    rdf = _canon(_to_df(Q.QUERIES[name](SF)))
    odf = _canon(con.sql(ORACLE_SQL[name]).df())
    assert list(rdf.columns) == list(odf.columns), (rdf.columns, odf.columns)
    assert len(rdf) == len(odf)
    for c in rdf.columns:
        if rdf[c].dtype != odf[c].dtype:
            rdf[c] = rdf[c].astype(odf[c].dtype)
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False)


ROWS_ONLY = [
    "media_features",
    "model_langid",
    "synthetic_corpus_stats",
    "embedding_near_dup",
    "winnow_dup_pairs",
    "media_resize",
    "bpe_train_merges",
    "media_frame_sample",
    "semantic_dedup",
]


def test_er_quality_meets_north_rule(ray_session):
    """The end-to-end quality query itself must clear F1 ≥ 0.99 —
    the north-rule gate, run as a user would run it."""
    from address_parser_ray.pipelines.queries import q_er_quality

    df = q_er_quality(SF)
    by_metric = df.set_index("metric")["f1"]
    assert by_metric["exhaustive"] >= 0.99, df.to_string()
    assert by_metric["same_block"] >= 0.99, df.to_string()


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run_and_deterministic(ray_session, name):
    from address_parser_ray.pipelines.queries import QUERIES

    d1 = _canon(_to_df(QUERIES[name](SF)))
    d2 = _canon(_to_df(QUERIES[name](SF)))
    assert len(d1) > 0
    pd.testing.assert_frame_equal(d1, d2)


def test_bpe_train_merges_hand_computed(ray_session, tmp_path):
    """Classic BPE on 'low low lower': merge ranks are ('l','o') (ties
    on count 3 with ('o','w') break lexicographically), then
    ('lo','w'), then ('low','</w>') with 2 occurrences."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": ["low low lower"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": pa.array([13], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = QUERIES["bpe_train_merges"](str(tmp_path))
    got = list(zip(df["left"], df["right"]))[:3]
    assert got == [("l", "o"), ("lo", "w"), ("low", "</w>")], df.to_string()
    assert df["n_occurrences"].iloc[0] == 3
    assert df["n_occurrences"].iloc[2] == 2


def test_bpe_panel_path_matches_driver(ray_session, monkeypatch):
    """Above the vocabulary gate the merge loop runs DISTRIBUTED (the
    vocabulary panel never leaves the cluster; only per-round pair-count
    partials fold on the driver). Forcing the gate to 0 makes the real
    corpus an above-gate vocabulary — the panel path must reproduce the
    driver path's merges exactly (same deterministic tie-breaks)."""
    import address_parser_ray.pipelines.queries as Q

    driver_df = Q.QUERIES["bpe_train_merges"](SF)
    monkeypatch.setattr(Q, "_BPE_PANEL_GATE", 0)
    panel_df = Q.QUERIES["bpe_train_merges"](SF)
    pd.testing.assert_frame_equal(panel_df, driver_df)


def test_bpe_panel_path_hand_computed(ray_session, tmp_path, monkeypatch):
    """The distributed merge loop on the classic 'low low lower' fixture
    (gate forced to 0) gives the canonical merges."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import address_parser_ray.pipelines.queries as Q

    t = pa.table(
        {
            "doc_id": pa.array([0], type=pa.int64()),
            "text": ["low low lower"],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": pa.array([13], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    monkeypatch.setattr(Q, "_BPE_PANEL_GATE", 0)
    df = Q.QUERIES["bpe_train_merges"](str(tmp_path))
    got = list(zip(df["left"], df["right"]))[:3]
    assert got == [("l", "o"), ("lo", "w"), ("low", "</w>")], df.to_string()


def test_simhash_degenerate_band_bounded(ray_session, tmp_path):
    """A corpus where EVERY doc shares one simhash (identical text) must
    stay bounded by the per-band pair cap instead of going O(m²)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.config import DEFAULT_CONFIG
    from address_parser_ray.pipelines.queries import QUERIES

    n = 2000
    t = pa.table(
        {
            "doc_id": pa.array(list(range(n)), type=pa.int64()),
            "text": ["the same boilerplate text body for every document"] * n,
            "lang": ["en"] * n,
            "source": ["s"] * n,
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = QUERIES["simhash_hamming_pairs"](str(tmp_path)).to_pandas()
    # 4 bands, each capped — far below the n*(n-1)/2 ≈ 2M uncapped pairs
    assert 0 < len(df) <= 4 * DEFAULT_CONFIG.max_pairs_per_block


def test_entry_contract(ray_session):
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    res = E.entry()
    df = _to_df(res)
    assert len(df) >= 0
    assert sorted(df.columns) == ["cluster_id", "content_sha256", "record_id"]
    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_).issubset(set(qs))


NULL_SAFE = [
    "exact_dedup_groups",
    "token_counts_by_lang",
    "quality_flags",
    "quality_scores",
    "langid_pred",
    "ngram_jaccard_stats",
    "dup_span_stats",
    "cdc_chunk_stats",
    "type_prefix_counts",
    "top_tokens_per_doc",
    "gram_novelty",
    "heavy_hitters",
]


@pytest.mark.parametrize("name", NULL_SAFE)
def test_null_text_parity(ray_session, tmp_path, name):
    """The NULL-text contract (COALESCE(text,'') == fillna('')) must hold
    on a corpus that actually CONTAINS nulls — the shipped testdata has
    none, so parity there proves nothing about NULL handling."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.oracle import ORACLE_SQL
    from address_parser_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(7)
    texts = [
        None if rng.random() < 0.25 else f"the quick doc {i} with, some! text."
        for i in range(80)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(list(range(80)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en", "de", "fr", "es"] * 20),
            "source": pa.array(["s1", "s2"] * 40),
            "n_chars": pa.array(
                [len(x) if x else 0 for x in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path}/documents.parquet')"
    )
    rdf = _canon(_to_df(QUERIES[name](str(tmp_path))))
    odf = _canon(con.sql(ORACLE_SQL[name]).df())
    for c in rdf.columns:
        if rdf[c].dtype != odf[c].dtype:
            rdf[c] = rdf[c].astype(odf[c].dtype)
    pd.testing.assert_frame_equal(rdf, odf, check_dtype=False)


def test_heavy_hitters_compression_path_zero_fn(ray_session, tmp_path, monkeypatch):
    """Force the Misra–Gries compression to actually engage (capacity 64
    ≪ the batch vocabulary of ~3200 unique rare tokens) and check the
    zero-false-negative guarantee — valid only while m+1 > φ⁻¹, so the
    test pins capacity 64 with φ = 1/32 (the shipped 1024/512 pair obeys
    the same inequality). A warm token sits just above ⌈n·φ⌉ to probe the
    near-threshold region where a lost counter would drop a true hitter."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import address_parser_ray.pipelines.queries as Q

    texts, n_docs = [], 400
    for i in range(n_docs):
        toks = ["hota", "hotb"] + [f"rare{i}x{j}" for j in range(8)]
        if i < 130:  # count 130 vs need = ceil(4130/32) = 130 → boundary
            toks.append("warm")
        texts.append(" ".join(toks))
    t = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": ["s"] * n_docs,
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))

    monkeypatch.setattr(Q, "_HH_CAPACITY", 64)
    monkeypatch.setattr(Q, "_HH_PHI_INV", 32)
    got = Q.q_heavy_hitters(str(tmp_path))

    n_total = n_docs * 10 + 130
    need = -(-n_total // 32)
    exact = pd.DataFrame(
        {
            "token": ["hota", "hotb", "warm"],
            "n_occurrences": [n_docs, n_docs, 130],
        }
    )
    exact = exact[exact["n_occurrences"] >= need].reset_index(drop=True)
    assert len(exact) >= 2  # hot tokens always qualify
    pd.testing.assert_frame_equal(
        _canon(got), _canon(exact), check_dtype=False
    )


def test_pii_scrub_redacts_embedded_pii(ray_session, tmp_path):
    """Redaction must fire on PII inside the document text itself (not
    just the synthesized contact line), and in the pinned order: emails
    first, then ≥9-digit runs — '<EMAIL>' must not leave digits behind
    and short digit runs must survive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    texts = [
        "reach me at jane.doe+spam@mail.example.org or 123456789012 ok",
        "short 12345 stays but 999888777 goes",
        None,
    ]
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pa.array(
                [len(x) if x else 0 for x in texts], type=pa.int64()
            ),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = QUERIES["pii_scrub"](str(tmp_path)).to_pandas().set_index("doc_id")
    # doc 0: embedded email + appended contact email; embedded 12-digit
    # run + appended 10-digit id
    assert df.loc[0, "n_emails"] == 2 and df.loc[0, "n_long_digits"] == 2
    # doc 1: only the appended email; embedded 9-digit + appended id
    assert df.loc[1, "n_emails"] == 1 and df.loc[1, "n_long_digits"] == 2
    # doc 2 (NULL text): the appended line alone
    assert df.loc[2, "n_emails"] == 1 and df.loc[2, "n_long_digits"] == 1


def test_quantile_sketch_bracketing_exact(ray_session, tmp_path, monkeypatch):
    """Force the two-pass bracket to matter (stride 16 over ~5k rows in
    multiple batches, heavy ties so brackets straddle repeated values)
    and check the result equals the exact rank-⌈p·n/100⌉ order statistic
    computed by a plain full sort — the guarantee the summary's slack
    bound is supposed to deliver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import address_parser_ray.pipelines.queries as Q

    rng = np.random.default_rng(11)
    # lognormal body + heavy ties at a few exact cents values
    v = np.concatenate(
        [
            rng.lognormal(3.0, 1.2, 4000),
            np.full(500, 19.99),
            np.full(500, 250.0),
        ]
    )
    rng.shuffle(v)
    pq.write_table(
        pa.table({"value": pa.array(v, type=pa.float64())}),
        str(tmp_path / "events.parquet"),
    )
    monkeypatch.setattr(Q, "_QSK_STRIDE", 16)
    got = Q.q_quantile_sketch(str(tmp_path)).set_index("pct")

    vs = np.sort(v)
    n = len(vs)
    for pct in [1, 5, 25, 50, 75, 95, 99]:
        r = -(-pct * n // 100)
        exact = int(np.floor(vs[r - 1] * 100))
        assert got.loc[pct, "value_cents"] == exact, pct


def test_gram_components_chain_and_boilerplate(ray_session, tmp_path):
    """Transitive closure must cross multi-hop chains (A–B share one
    8-gram, B–C share a DIFFERENT one → one component of 3), and a gram
    present in more than _GC_DF_MAX docs is boilerplate — it must create
    no edges at all."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    g1 = "alpha bravo charlie delta echo foxtrot golf hotel"
    g2 = "india juliet kilo lima mike november oscar papa"
    boiler = "one two three four five six seven eight"
    texts = [
        f"{g1} uniqA0",            # doc 0: gram g1
        f"{g1} mid {g2}",          # doc 1: g1 AND g2 → bridges 0 and 2
        f"{g2} uniqC0",            # doc 2: gram g2
    ] + [f"{boiler} tail{i}" for i in range(12)]  # 12 > DF_MAX=8
    n = len(texts)
    t = pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = (
        QUERIES["gram_components"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(df) == n
    # chain: docs 0,1,2 in one component labeled by the min id (0)
    assert set(df.loc[[0, 1, 2], "component_id"]) == {0}
    assert (df.loc[[0, 1, 2], "component_size"] == 3).all()
    # boilerplate docs stay singletons despite all sharing an 8-gram
    boil = df.loc[3:]
    assert (boil["component_id"] == boil.index).all()
    assert (boil["component_size"] == 1).all()


def test_bigram_lm_scores_hand_computed(ray_session, tmp_path):
    """Fixed-point conditional probabilities on a corpus small enough to
    do by hand: c(a,b)=3, c(b,a)=1, c(b,c)=1 → prefix a:3, b:2, so
    P(b|a)=10^6, P(a|b)=P(c|b)=5·10^5; short and NULL docs score 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    texts = ["a b a b", "a b c", "x", None]
    t = pa.table(
        {
            "doc_id": pa.array(range(4), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": pa.array([len(x) if x else 0 for x in texts],
                                type=pa.int64()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    df = (
        QUERIES["bigram_lm_scores"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df["n_bigrams"].tolist() == [3, 2, 0, 0]
    assert df["lm_score"].tolist() == [2_500_000, 1_500_000, 0, 0]


def test_revenue_by_priority_join_semantics(ray_session, tmp_path):
    """Inner-join semantics by hand: an order with two lineitems counts
    ONCE in n_orders and sums both revenues; an order with no lineitems
    disappears; a lineitem with no order disappears."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
                "o_orderpriority": ["1-URGENT", "1-URGENT", "5-LOW"],
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1, 1, 3, 99], type=pa.int64()),
                "l_extendedprice": pa.array(
                    [10.0, 20.0, 5.5, 1000.0], type=pa.float64()
                ),
                "l_discount": pa.array([0.0, 0.5, 0.0, 0.0], type=pa.float64()),
            }
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    df = (
        QUERIES["revenue_by_priority"](str(tmp_path))
        .set_index("o_orderpriority")
        .sort_index()
    )
    # order 1: 1000 + 1000 cents; order 2 has no items → absent
    assert df.loc["1-URGENT", "n_orders"] == 1
    assert df.loc["1-URGENT", "revenue_cents"] == 2000
    assert df.loc["5-LOW", "n_orders"] == 1
    assert df.loc["5-LOW", "revenue_cents"] == 550
    assert len(df) == 2


def test_levenshtein_block_hand_computed():
    """DP kernel vs hand-checked distances, incl. empty strings and
    rows frozen early when one side is shorter than the batch max."""
    from address_parser_ray.pipelines.queries import _levenshtein_block

    sa = ["kitten", "flaw", "abc", "", "same", "a-very-long-string"]
    sb = ["sitting", "lawn", "abc", "xyz", "same", "x"]
    assert _levenshtein_block(sa, sb).tolist() == [3, 2, 0, 3, 0, 18]
    assert _levenshtein_block([], []).tolist() == []


def test_minhash_band_keys_identical_docs_collide(ray_session, tmp_path):
    """Byte-identical texts must share all four band keys; a fully
    different text must not share all of them. Empty text emits no
    rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": [
                    "def alpha(): return beta + gamma",
                    "def alpha(): return beta + gamma",
                    "SELECT x FROM y WHERE z ORDER BY w",
                    "",
                ],
                "lang": ["py"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([33, 33, 34, 0], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = QUERIES["minhash_band_keys"](str(tmp_path)).to_pandas()
    k1 = df[df.doc_id == 1].sort_values("band")["band_key"].tolist()
    k2 = df[df.doc_id == 2].sort_values("band")["band_key"].tolist()
    k3 = df[df.doc_id == 3].sort_values("band")["band_key"].tolist()
    assert len(k1) == 4 and k1 == k2
    assert k1 != k3
    assert (df.doc_id == 4).sum() == 0
    # band index occupies distinct key spaces by construction
    assert len(set(k1)) == 4


def test_cdc_with_deletes_semantics(ray_session, tmp_path):
    """doc 77 (7|77, 11|77) is updated AND deleted → deleted wins
    (higher version); doc 7 updated only; doc 11 deleted; doc 1
    untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    ids = [1, 7, 11, 77]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text": ["t"] * 4,
                "lang": ["en"] * 4,
                "source": ["base"] * 4,
                "n_chars": pa.array([10, 20, 30, 40], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        QUERIES["cdc_with_deletes"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert sorted(df.index.tolist()) == [1, 7]
    assert df.loc[1, "source"] == "base" and df.loc[1, "version"] == 0
    assert df.loc[7, "source"] == "delta"
    assert df.loc[7, "n_chars"] == 1020 and df.loc[7, "version"] == 1


def test_user_spend_ranks_ties_and_offsets(ray_session, tmp_path):
    """Exact ranks with tied spends (ties break by user_id) and users
    spread across range partitions — offsets must chain exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    users = [5, 3, 9, 1, 7, 3, 5]
    vals = [10.0, 20.0, 5.0, 20.0, 10.0, 0.5, 10.0]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(7), type=pa.int64()),
                "ts": pa.array([0] * 7, type=pa.timestamp("us")),
                "user_id": pa.array(users, type=pa.int64()),
                "event_type": ["purchase"] * 7,
                "value": pa.array(vals, type=pa.float64()),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = (
        QUERIES["user_spend_ranks"](str(tmp_path))
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # spends: u1=2000, u3=2050, u5=2000 (tie with u1), u7=1000, u9=500;
    # ties break by user_id, so u1 ranks before u5
    got = df.set_index("user_id")
    assert got.loc[9, "spend_rank"] == 1
    assert got.loc[7, "spend_rank"] == 2
    assert got.loc[1, "spend_rank"] == 3
    assert got.loc[5, "spend_rank"] == 4
    assert got.loc[3, "spend_rank"] == 5
    assert sorted(df["spend_rank"]) == [1, 2, 3, 4, 5]


def test_fk_orphans_detects_injected_orphans(ray_session, tmp_path):
    """A lineitem pointing at a missing order and an order pointing at
    a missing customer must each count as one orphan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table({"n_nationkey": pa.array([0], type=pa.int64())}),
        str(tmp_path / "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([1, 2], type=pa.int64()),
                "c_nationkey": pa.array([0, 0], type=pa.int64()),
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11], type=pa.int64()),
                "o_custkey": pa.array([1, 99], type=pa.int64()),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"l_orderkey": pa.array([10, 10, 404], type=pa.int64())}),
        str(tmp_path / "lineitem.parquet"),
    )
    df = QUERIES["fk_orphans"](str(tmp_path)).set_index("relation")
    assert df.loc["orders.o_custkey->customer", "n_orphans"] == 1
    assert df.loc["lineitem.l_orderkey->orders", "n_orphans"] == 1
    assert df.loc["lineitem.l_orderkey->orders", "n_rows"] == 3
    assert df.loc["customer.c_nationkey->nation", "n_orphans"] == 0


def test_minhash_cluster_ids_groups_identical_docs(ray_session, tmp_path):
    """Identical texts must land in one cluster labeled by the min doc
    id; an unrelated text stays a singleton; an empty doc is a
    singleton (it emits no band keys)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": [
                    "def alpha(): return beta + gamma",
                    "def alpha(): return beta + gamma",
                    "SELECT x FROM y WHERE z ORDER BY w LIMIT 10",
                    "",
                ],
                "lang": ["py"] * 4,
                "source": ["s"] * 4,
                "n_chars": pa.array([33, 33, 43, 0], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        QUERIES["minhash_cluster_ids"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "cluster_id"] == 1 and df.loc[2, "cluster_id"] == 1
    assert df.loc[1, "cluster_size"] == 2
    assert df.loc[3, "cluster_id"] == 3 and df.loc[3, "cluster_size"] == 1
    assert df.loc[4, "cluster_id"] == 4 and df.loc[4, "cluster_size"] == 1


def _write_docs(tmp_path, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(texts) + 1), type=pa.int64()),
                "text": texts,
                "lang": ["py"] * len(texts),
                "source": ["s"] * len(texts),
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_sorted_neighborhood_window_pairs(ray_session, tmp_path):
    """w=3 window over (bal_cents, custkey) order must emit exactly the
    rank-distance-1 and -2 pairs, including across tied balances."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    # balances: key order by (cents, custkey):
    #   30(5.00) < 10(10.00) < 40(10.00) < 20(20.00) < 50(30.00)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([10, 20, 30, 40, 50], type=pa.int64()),
                "c_name": [f"Customer#{k}" for k in (10, 20, 30, 40, 50)],
                "c_nationkey": pa.array([0] * 5, type=pa.int64()),
                "c_acctbal": pa.array(
                    [10.0, 20.0, 5.0, 10.0, 30.0], type=pa.float64()
                ),
                "c_mktsegment": ["BUILDING"] * 5,
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = (
        QUERIES["sorted_neighborhood"](str(tmp_path))
        .to_pandas()
        .sort_values(["key_a", "key_b"])
        .reset_index(drop=True)
    )
    got = {(a, b, d) for a, b, d in zip(df["key_a"], df["key_b"], df["dist"])}
    order = [30, 10, 40, 20, 50]
    want = set()
    for i in range(len(order)):
        for d in (1, 2):
            if i + d < len(order):
                want.add((order[i], order[i + d], d))
    assert got == want


def test_meta_blocking_cbs_weights(ray_session, tmp_path):
    """Pairs sharing >=2 qualifying token bigrams survive with the
    right CBS; pairs sharing only one are pruned; a bigram present in
    too many docs is not a block."""
    from address_parser_ray.pipelines.queries import QUERIES

    # docs 1 & 2 share bigrams "alpha beta" and "beta gamma" (CBS 2);
    # docs 1 & 3 share only "zz top" (CBS 1 -> pruned);
    # "common word" appears in all 70 filler docs + none of 1-3.
    texts = [
        "alpha beta gamma zz top",
        "alpha beta gamma other",
        "zz top unrelated",
    ] + ["common word filler%d" % i for i in range(70)]
    _write_docs(tmp_path, texts)
    df = QUERIES["meta_blocking"](str(tmp_path)).to_pandas()
    got = {
        (a, b): c for a, b, c in zip(df["doc_a"], df["doc_b"], df["cbs"])
    }
    assert got == {(1, 2): 2}


def test_fs_em_update_hand_computed(ray_session, tmp_path):
    """One EM iteration over a two-combo corpus must match the closed
    form computed by hand from the quantized weights."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import (
        _FS_M0,
        _FS_P0,
        _FS_Q,
        _FS_U0,
        QUERIES,
    )

    # 4 customers -> 2 pairs: pair (0,1) agrees everywhere (combo 7),
    # pair (2,3) disagrees everywhere (combo 0).
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array([0, 1, 2, 3], type=pa.int64()),
                "c_name": ["a", "b", "c", "d"],
                "c_nationkey": pa.array([5, 5, 1, 2], type=pa.int64()),
                "c_acctbal": pa.array(
                    [100.0, 100.0, 100.0, 5000.0], type=pa.float64()
                ),
                "c_mktsegment": ["AUTO", "AUTO", "AUTO", "STEEL"],
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = (
        QUERIES["fs_em_update"](str(tmp_path))
        .to_pandas()
        .set_index("field")
        .sort_index()
    )

    def step(p, m, u):
        a7 = ((p * m[0]) * m[1]) * m[2]
        b7 = (((1.0 - p) * u[0]) * u[1]) * u[2]
        w7 = int(math.floor(a7 / (a7 + b7) * _FS_Q + 0.5 + 1e-9))
        a0 = ((p * (1 - m[0])) * (1 - m[1])) * (1 - m[2])
        b0 = (((1.0 - p) * (1 - u[0])) * (1 - u[1])) * (1 - u[2])
        w0 = int(math.floor(a0 / (a0 + b0) * _FS_Q + 0.5 + 1e-9))
        S, T = w7 + w0, 2 * _FS_Q - w7 - w0
        m_new = w7 / S  # only combo 7 has any bit set
        u_new = (_FS_Q - w7) / T
        p_new = S / (2 * _FS_Q)
        return m_new, u_new, p_new

    m_new, u_new, p_new = step(_FS_P0, list(_FS_M0), list(_FS_U0))
    for f in ("mktsegment", "nationkey", "acctbal"):
        assert df.loc[f, "m_micro"] == int(math.floor(1e6 * m_new + 1e-7))
        assert df.loc[f, "u_micro"] == int(math.floor(1e6 * u_new + 1e-7))
        assert df.loc[f, "p_micro"] == int(math.floor(1e6 * p_new + 1e-7))


def test_fellegi_sunter_em_recovers_planted_params(ray_session, tmp_path):
    """EM over a corpus with 30% planted matches must drive m toward 1,
    keep u near the random-agreement rates, and land p near 0.3."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(7)
    n_pairs = 4000
    segs = np.array(["AUTO", "STEEL", "FURNITURE", "BUILDING", "MACHINERY"])
    rows = {"c_custkey": [], "c_name": [], "c_nationkey": [],
            "c_acctbal": [], "c_mktsegment": []}
    for i in range(n_pairs):
        match = rng.random() < 0.3
        seg_a = segs[rng.integers(5)]
        nat_a = int(rng.integers(25))
        bal_a = float(rng.integers(0, 900000)) / 100.0
        if match:  # noisy copies: agree with prob ~0.95 per field
            seg_b = seg_a if rng.random() < 0.95 else segs[rng.integers(5)]
            nat_b = nat_a if rng.random() < 0.95 else int(rng.integers(25))
            bal_b = bal_a + (0.0 if rng.random() < 0.95 else 10000.0)
        else:
            seg_b = segs[rng.integers(5)]
            nat_b = int(rng.integers(25))
            bal_b = float(rng.integers(0, 900000)) / 100.0
        for j, (s, n, b) in enumerate(
            ((seg_a, nat_a, bal_a), (seg_b, nat_b, bal_b))
        ):
            rows["c_custkey"].append(2 * i + j)
            rows["c_name"].append(f"c{2 * i + j}")
            rows["c_nationkey"].append(n)
            rows["c_acctbal"].append(b)
            rows["c_mktsegment"].append(s)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(rows["c_custkey"], type=pa.int64()),
                "c_name": rows["c_name"],
                "c_nationkey": pa.array(rows["c_nationkey"], type=pa.int64()),
                "c_acctbal": pa.array(rows["c_acctbal"], type=pa.float64()),
                "c_mktsegment": rows["c_mktsegment"],
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = (
        QUERIES["fellegi_sunter_em"](str(tmp_path))
        .to_pandas()
        .set_index("field")
    )
    # m estimates near the planted 0.95 agreement; u near random rates
    for f in ("mktsegment", "nationkey", "acctbal"):
        assert df.loc[f, "m_micro"] > 850000, df
        assert df.loc[f, "u_micro"] < df.loc[f, "m_micro"]
    assert 200000 < df.loc["mktsegment", "p_micro"] < 400000
    # u for nationkey ~ 1/25 = 4%; for mktsegment ~ 1/5 = 20%
    assert df.loc["nationkey", "u_micro"] < df.loc["mktsegment", "u_micro"]


def test_blocking_quality_exact_dups_covered(ray_session, tmp_path):
    """Identical texts share every band key, so PC must be 1.0; with
    far more docs than candidates RR stays near 1."""
    from address_parser_ray.pipelines.queries import QUERIES

    texts = (
        ["def dup(): return 42  # identical twin payload"] * 3
        + ["unique doc %d with its own words and shape %d" % (i, i * i)
           for i in range(40)]
    )
    _write_docs(tmp_path, texts)
    row = QUERIES["blocking_quality"](str(tmp_path)).to_pandas().iloc[0]
    assert row["n_docs"] == 43
    assert row["n_true_pairs"] == 3  # C(3,2)
    assert row["n_covered"] == 3 and row["pc_micro"] == 1000000
    assert row["n_cand_pairs"] >= 3
    # near-identical filler docs legitimately collide in some bands;
    # the substantive check is PC == 1.0 above
    assert row["rr_micro"] > 700000


def test_fs_classify_separates_planted_pairs(ray_session, tmp_path):
    """After EM, all-agree pairs must classify as matches and all-
    disagree pairs as non-matches."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    rng = np.random.default_rng(11)
    segs = ["AUTO", "STEEL", "FURNITURE", "BUILDING", "MACHINERY"]
    rows = {"c_custkey": [], "c_name": [], "c_nationkey": [],
            "c_acctbal": [], "c_mktsegment": []}
    matches = set()
    for i in range(600):
        match = rng.random() < 0.3
        if match:
            matches.add(i)
        seg_a = segs[int(rng.integers(5))]
        nat_a = int(rng.integers(25))
        bal_a = float(rng.integers(0, 900000)) / 100.0
        if match:
            seg_b, nat_b, bal_b = seg_a, nat_a, bal_a
        else:
            seg_b = segs[(segs.index(seg_a) + 1) % 5]
            nat_b = (nat_a + 1) % 25
            bal_b = bal_a + 10000.0
        for j, (s, n, b) in enumerate(
            ((seg_a, nat_a, bal_a), (seg_b, nat_b, bal_b))
        ):
            rows["c_custkey"].append(2 * i + j)
            rows["c_name"].append(f"c{2 * i + j}")
            rows["c_nationkey"].append(n)
            rows["c_acctbal"].append(b)
            rows["c_mktsegment"].append(s)
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(rows["c_custkey"], type=pa.int64()),
                "c_name": rows["c_name"],
                "c_nationkey": pa.array(rows["c_nationkey"], type=pa.int64()),
                "c_acctbal": pa.array(rows["c_acctbal"], type=pa.float64()),
                "c_mktsegment": rows["c_mktsegment"],
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = QUERIES["fs_classify"](str(tmp_path)).to_pandas()
    assert len(df) == 600
    pred = set(df[df["is_match"] == 1]["pair_id"].tolist())
    assert pred == matches


def test_dsir_weights_tilt_toward_target(ray_session, tmp_path):
    """Docs matching the target (en) bigram distribution must weight
    higher than docs drawn from the other distribution; weights are
    pure-integer and deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    texts = (
        ["the quick brown fox jumps"] * 5
        + ["le renard brun rapide saute"] * 5
        + ["the quick brown fox leaps"]      # en-like holdout
        + ["le renard brun rapide dort"]     # fr-like holdout
    )
    langs = ["en"] * 5 + ["fr"] * 5 + ["en", "fr"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, 13), type=pa.int64()),
                "text": texts,
                "lang": langs,
                "source": ["s"] * 12,
                "n_chars": pa.array([len(t) for t in texts], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        QUERIES["dsir_weights"](str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(df) == 12
    # the en-like holdout (doc 11) shares 3 of 4 bigrams with the target
    # model; the fr-like holdout (doc 12) shares none
    assert df.loc[11, "dsir_weight"] > df.loc[12, "dsir_weight"]
    assert df.loc[12, "target_score"] == 0
    assert (df.loc[[1, 2, 3], "dsir_weight"] >= 0).all()
    d1, d2 = (
        QUERIES["dsir_weights"](str(tmp_path)).to_pandas().sort_values("doc_id"),
        QUERIES["dsir_weights"](str(tmp_path)).to_pandas().sort_values("doc_id"),
    )
    assert (d1["dsir_weight"].to_numpy() == d2["dsir_weight"].to_numpy()).all()


def test_token_set_pairs_dice(ray_session, tmp_path):
    """Dice micro-units over shared-token blocks: hand-checkable pairs,
    duplicate part rows must not double-count postings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    names = [
        "red shiny copper kettle",
        "red shiny copper pot",      # shares 3 of 4 tokens with kettle
        "red kettle",                # shares 2 with the first
        "green plastic spoon",       # shares none (>=2)
        "red shiny copper kettle",   # exact duplicate row
    ]
    pq.write_table(
        pa.table({"p_name": names, "p_partkey": pa.array(range(5), type=pa.int64())}),
        str(tmp_path / "part.parquet"),
    )
    df = QUERIES["token_set_pairs"](str(tmp_path)).to_pandas()
    got = {
        (a, b): (s, d)
        for a, b, s, d in zip(
            df["name_a"], df["name_b"], df["n_shared"], df["dice_micro"]
        )
    }
    k1 = ("red shiny copper kettle", "red shiny copper pot")
    k2 = ("red kettle", "red shiny copper kettle")
    k3 = ("red kettle", "red shiny copper pot")
    assert got[k1] == (3, 2 * 3 * 1_000_000 // 8)
    assert got[k2] == (2, 2 * 2 * 1_000_000 // 6)
    assert got[k3] == (1, 2 * 1 * 1_000_000 // 6)
    assert len(got) == 3


def test_linreg_grad_step_hand_computed(ray_session, tmp_path):
    """Gradient on a two-doc fixture must match the hand-computed
    integer value regardless of batch split."""
    import numpy as np

    from address_parser_ray.pipelines.queries import (
        _LINREG_S,
        _LINREG_W0,
        QUERIES,
    )

    texts = ["one two three.", "quatre cinq"]
    langs = ["en", "fr"]
    _write_docs(tmp_path, texts)
    # overwrite langs (fixture writes all 'py')
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "text": texts,
                "lang": langs,
                "source": ["s", "s"],
                "n_chars": pa.array(
                    [len(t) for t in texts], type=pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        QUERIES["linreg_grad_step"](str(tmp_path))
        .to_pandas()
        .set_index("feature")
    )
    X = np.array(
        [[1, 3, 1, len(texts[0])], [1, 2, 0, len(texts[1])]],
        dtype=np.int64,
    )
    y = np.array([1, 0], dtype=np.int64) * _LINREG_S
    w = np.asarray(_LINREG_W0, dtype=np.int64) * (1 << 10)
    g = X.T @ (X @ w - y)
    for i, f in enumerate(["bias", "n_tokens", "punct_chars", "n_chars"]):
        assert df.loc[f, "grad"] == g[i]
        assert df.loc[f, "w_next"] == w[i] - g[i]


def test_er_training_pairs_structure(ray_session, tmp_path):
    """n=6 customers: 3 positives; negatives degenerate (shift 37 mod 6
    = shift 1) but never self-pairs or duplicates of a positive's key
    pair; comparison bits hand-checked."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(range(6), type=pa.int64()),
                "c_name": [f"c{i}" for i in range(6)],
                "c_nationkey": pa.array([1, 1, 2, 3, 4, 4], type=pa.int64()),
                "c_acctbal": pa.array(
                    [10.0, 10.0, 999.0, 998.0, 5.0, 90000.0],
                    type=pa.float64(),
                ),
                "c_mktsegment": ["A", "A", "B", "C", "D", "D"],
            }
        ),
        str(tmp_path / "customer.parquet"),
    )
    df = QUERIES["er_training_pairs"](str(tmp_path)).to_pandas()
    pos = df[df["pair_type"] == "pos"].set_index("key_a").sort_index()
    assert len(pos) == 3
    # pair (0,1): same seg, same nation, same balance
    assert (pos.loc[0, ["g1", "g2", "g3"]] == [1, 1, 1]).all()
    # pair (4,5): same seg/nation, balance differs by ~9e6 cents
    assert (pos.loc[4, ["g1", "g2", "g3"]] == [1, 1, 0]).all()
    neg = df[df["pair_type"] == "neg"]
    # shift 37 % 6 = 1: each i pairs with i+1 mod 6 -> 6 negatives
    assert len(neg) == 6
    assert (neg["key_a"] != neg["key_b"]).all()


def test_window_dedup_stats_counts(ray_session, tmp_path):
    """Duplicates within an hour window collapse; the same key in a
    different window does not."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    H = 3_600_000_000  # us per hour
    ts = [10, 20, 30, H + 10, H + 20]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(5), type=pa.int64()),
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 1, 1], type=pa.int64()),
                "event_type": ["click"] * 5,
                "value": pa.array([5.0, 5.0, 5.0, 5.0, 6.0]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = (
        QUERIES["window_dedup_stats"](str(tmp_path))
        .to_pandas()
        .set_index("window_hour")
        .sort_index()
    )
    # window 0: u1 click 5.0 twice (dupe) + u2 once -> 3 events 2 unique
    assert df.loc[0, "n_events"] == 3 and df.loc[0, "n_unique"] == 2
    assert df.loc[0, "n_dupes"] == 1
    # window 1: u1 5.0 and u1 6.0 -> both unique
    assert df.loc[1, "n_events"] == 2 and df.loc[1, "n_dupes"] == 0


def test_cluster_size_histogram_buckets(ray_session, tmp_path):
    """4 identical docs (one size-4 cluster) + 2 singletons -> buckets
    log2=2 (1 cluster, 4 docs) and log2=0 (2 clusters, 2 docs)."""
    from address_parser_ray.pipelines.queries import QUERIES

    texts = (
        ["def quad(): return 4  # same payload"] * 4
        + ["unique alpha doc with words", "another different text body"]
    )
    _write_docs(tmp_path, texts)
    df = (
        QUERIES["cluster_size_histogram"](str(tmp_path))
        .to_pandas()
        .set_index("log2_size")
        .sort_index()
    )
    assert df.loc[2, "n_clusters"] == 1 and df.loc[2, "n_docs"] == 4
    assert df.loc[0, "n_clusters"] == 2 and df.loc[0, "n_docs"] == 2


def test_graph_triangles_planted(ray_session, tmp_path):
    """Three identical docs share every band key → K3{1,2,3} = exactly
    one triangle and (degree-ordered) one wedge; two identical docs of
    a different text add one more edge but no wedge; two singletons
    with unrelated text contribute nothing. Identical text ⇒ identical
    MinHash signature ⇒ identical band keys, so the planted edges are
    deterministic regardless of the hash constants."""
    from address_parser_ray.pipelines.queries import QUERIES

    tri = "def alpha(x):\n    return x * 41 + alpha_offset\n"
    pair = "SELECT customer_name, SUM(total) FROM ledger GROUP BY 1;\n"
    texts = [tri, tri, tri, pair, pair,
             "zebra quilt // completely unrelated body of text ~!",
             "int main() { volatile long z = 99; return (int)z; }"]
    _write_docs(tmp_path, texts)
    df = QUERIES["graph_triangles"](str(tmp_path)).to_pandas().iloc[0]
    # nodes = endpoints of at least one edge (5 of the 7 docs)
    assert df["n_nodes"] == 5
    assert df["n_edges"] == 4
    assert df["n_triangles"] == 1
    # degree-ordered emission: inside K3 only the lowest-(deg, id)
    # vertex emits its out-neighbor pair; the 2-clique has out-degree
    # 1 at its source — exactly one wedge total
    assert df["n_wedges"] == 1


def test_countmin_one_sided_error(ray_session):
    """CMS point estimates can only OVERcount: est >= exact for every
    reported token, and the heaviest token's estimate is within the
    eps*N classical bound (here simply sanity: < 2x exact at sf0.001)."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["countmin_estimates"](SF).to_pandas()
    assert len(df) == 10
    assert (df["overcount"] >= 0).all()
    assert (df["cms_est"] == df["exact_n"] + df["overcount"]).all()
    top = df.sort_values("exact_n", ascending=False).iloc[0]
    assert top["cms_est"] < 2 * top["exact_n"]


def test_winsorized_stats_bounds(ray_session):
    """Winsorized mean lies within [p5, p95] and the clipped sum is
    bounded by n*p95; p5 <= p95 per lang."""
    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["winsorized_stats"](SF).to_pandas()
    assert (df["p5"] <= df["p95"]).all()
    assert (df["wins_mean_milli"] >= df["p5"] * 1000).all()
    assert (df["wins_mean_milli"] <= df["p95"] * 1000).all()
    assert (df["wins_sum"] <= df["n"] * df["p95"]).all()


def test_balanced_sample_equalizes_langs(ray_session, tmp_path):
    """Unbalanced corpus (4 py / 2 sql docs) must downsample every lang
    to n_min=2, ranks 1..2, and pick the hash-rank-smallest doc ids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    langs = ["py"] * 4 + ["sql"] * 2
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(1, 7), type=pa.int64()),
                "text": [f"doc {i}" for i in range(6)],
                "lang": langs,
                "source": ["s"] * 6,
                "n_chars": pa.array([5] * 6, type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = QUERIES["balanced_sample"](str(tmp_path)).to_pandas()
    assert len(df) == 4
    assert (df.groupby("lang").size() == 2).all()
    assert sorted(df["sample_rank"].unique()) == [1, 2]
    kept_py = set(df.loc[df["lang"] == "py", "doc_id"])
    from address_parser_ray.pipelines.queries import _BAL_SALT, _id_rank60

    want = sorted(
        range(1, 5), key=lambda d: int(_id_rank60([d], _BAL_SALT)[0])
    )[:2]
    assert kept_py == set(want)


def test_lang_regression_recovers_planted_line(ray_session, tmp_path):
    """Exact collinear points y = 0.5x per lang must recover
    slope_micro=500000, intercept_milli=0 (integer math is exact)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    texts = ["a", "a b", "a b c"]  # 1, 2, 3 BPE tokens
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": texts,
                "lang": ["py"] * 3,
                "source": ["s"] * 3,
                "n_chars": pa.array([2, 4, 6], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = QUERIES["lang_regression"](str(tmp_path)).to_pandas().iloc[0]
    assert df["n"] == 3
    assert df["slope_micro"] == 500_000
    assert df["intercept_milli"] == 0


def test_decayed_counts_halving(ray_session, tmp_path):
    """Weights halve every 7 whole days and floor to 0 past 10
    half-lives: ages 0 / 7 / 70 days -> 1000 + 500 + 0 milli-units."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    base = pd.Timestamp("2026-01-01 12:00:00")
    ts = [base, base - pd.Timedelta(days=7), base - pd.Timedelta(days=70)]
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, type=pa.timestamp("us")),
                "event_type": ["click"] * 3,
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = QUERIES["decayed_counts"](str(tmp_path)).to_pandas().iloc[0]
    assert df["n_events"] == 3
    assert df["decayed_milli"] == 1500


def test_regional_revenue_local_supplier_filter(ray_session, tmp_path):
    """Only lines whose supplier shares the ordering customer's nation
    count: c1(n1) orders from s1(n1) [kept] and s2(n2) [dropped]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    pq.write_table(
        pa.table({"c_custkey": pa.array([1], type=pa.int64()),
                  "c_nationkey": pa.array([1], type=pa.int32())}),
        str(tmp_path / "customer.parquet"))
    pq.write_table(
        pa.table({"s_suppkey": pa.array([10, 20], type=pa.int64()),
                  "s_nationkey": pa.array([1, 2], type=pa.int32())}),
        str(tmp_path / "supplier.parquet"))
    pq.write_table(
        pa.table({"n_nationkey": pa.array([1, 2], type=pa.int32()),
                  "n_name": ["ALPHA", "BETA"]}),
        str(tmp_path / "nation.parquet"))
    pq.write_table(
        pa.table({"o_orderkey": pa.array([100], type=pa.int64()),
                  "o_custkey": pa.array([1], type=pa.int64())}),
        str(tmp_path / "orders.parquet"))
    pq.write_table(
        pa.table({
            "l_orderkey": pa.array([100, 100], type=pa.int64()),
            "l_suppkey": pa.array([10, 20], type=pa.int64()),
            "l_extendedprice": pa.array([100.0, 100.0]),
            "l_discount": pa.array([0.1, 0.1]),
        }),
        str(tmp_path / "lineitem.parquet"))
    df = QUERIES["regional_revenue"](str(tmp_path)).to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["n_name"] == "ALPHA"
    assert row["n_items"] == 1
    assert row["revenue_cents"] == 9000  # floor(100*0.9*100)


def test_containment_pairs_asymmetry(ray_session, tmp_path):
    """Identical docs score 10^6 containment both ways; a doc pasted
    into a larger one scores near-1 containment of the smaller side and
    strictly lower of the larger."""
    from address_parser_ray.pipelines.queries import QUERIES

    a = (
        "\n".join(
            f"def fn_{i}(x):\n    return x * {i} + offset_{i}"
            for i in range(12)
        )
        + "\n"
    )
    texts = [
        a,
        a + "print('tail marker 99')\n",  # A pasted into a larger B
        "completely unrelated ~~ zebra quilt body!!",
    ]
    _write_docs(tmp_path, texts)
    df = QUERIES["containment_pairs"](str(tmp_path)).to_pandas()
    pair = df[(df["id_a"] == 1) & (df["id_b"] == 2)]
    assert len(pair) == 1, df
    row = pair.iloc[0]
    assert row["cont_a_micro"] == 1_000_000  # A's shingles all inside A+A
    assert row["cont_b_micro"] < row["cont_a_micro"]
    assert row["n_shared"] > 0


def test_length_outliers_planted(ray_session, tmp_path):
    """19 docs of length 100 plus one of length 10000: exactly the one
    extreme row clears the exact-integer 3-sigma inequality."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    n_chars = [100] * 19 + [10_000]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(20), type=pa.int64()),
                "text": ["x"] * 20,
                "lang": ["py"] * 20,
                "source": ["s"] * 20,
                "n_chars": pa.array(n_chars, type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = QUERIES["length_outliers"](str(tmp_path)).to_pandas().iloc[0]
    assert df["n"] == 20
    assert df["n_outliers"] == 1


def test_partition_digests_detect_single_row_drift(ray_session, tmp_path):
    """The reconciliation use-case: one changed row in one source must
    flip BOTH digests of that source and neither of the other."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    def write(tmp, texts_by_source):
        rows = [
            (i, t, s)
            for i, (s, t) in enumerate(
                (s, t) for s, ts in texts_by_source.items() for t in ts
            )
        ]
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "text": [r[1] for r in rows],
                    "lang": ["py"] * len(rows),
                    "source": [r[2] for r in rows],
                    "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
                }
            ),
            str(tmp / "documents.parquet"),
        )

    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir()
    b.mkdir()
    write(a, {"s1": ["one", "two"], "s2": ["three"]})
    write(b, {"s1": ["one", "two CHANGED"], "s2": ["three"]})
    da = QUERIES["partition_digests"](str(a)).to_pandas().set_index("source")
    db = QUERIES["partition_digests"](str(b)).to_pandas().set_index("source")
    assert da.loc["s2"].equals(db.loc["s2"])
    assert da.loc["s1", "digest_sum"] != db.loc["s1", "digest_sum"]
    assert da.loc["s1", "digest_xor"] != db.loc["s1", "digest_xor"]
    assert da.loc["s1", "n_rows"] == db.loc["s1", "n_rows"] == 2


def test_fragment_stitching_planted(ray_session, tmp_path):
    """B starts with A's last 3 tokens -> one (A,B) stitch edge; the
    short doc (< 6 tokens) never emits boundaries."""
    from address_parser_ray.pipelines.queries import QUERIES

    texts = [
        "alpha beta gamma delta epsilon zeta",      # tail: delta epsilon zeta
        "delta epsilon zeta eta theta iota kappa",  # head matches doc 1's tail
        "too short here",                            # < 6 tokens: skipped
        "lone wolf document with unique tokens here",
    ]
    _write_docs(tmp_path, texts)
    df = QUERIES["fragment_stitching"](str(tmp_path)).to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    assert row["id_from"] == 1 and row["id_to"] == 2
    assert row["boundary"] == "delta epsilon zeta"


def test_soundex_textbook_vectors():
    """The Wikipedia/NARA reference vectors, incl. the h/w-transparency
    and vowel-run-break rules the naive variant gets wrong."""
    from address_parser_ray.pipelines.queries import _soundex

    assert _soundex("Robert") == "R163"
    assert _soundex("Rupert") == "R163"
    assert _soundex("Ashcraft") == "A261"  # h transparent: c,r merge? no — s,c merge
    assert _soundex("Ashcroft") == "A261"
    assert _soundex("Tymczak") == "T522"  # vowel breaks z,k? no — cz merge, a breaks
    assert _soundex("Pfister") == "P236"
    assert _soundex("Honeyman") == "H555"
    assert _soundex("BOB") == "B100"  # vowel breaks the B..B run
    assert _soundex("") == ""
    assert _soundex("123") == ""


def test_golden_records_survivorship(ray_session, tmp_path):
    """Identical texts cluster together; each field survives
    independently: modal lang (2 sql vs 1 py) and modal source with a
    tie broken lexicographically; rep_doc = min id; chars summed."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from address_parser_ray.pipelines.queries import QUERIES

    t = "def shared_cluster_text(): return 42  # same payload\n"
    texts = [t, t, t, "completely unrelated zebra quilt body ~~!!"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 9], type=pa.int64()),
                "text": texts,
                "lang": ["py", "sql", "sql", "py"],
                "source": ["b", "a", "b", "z"],  # b wins 2-1
                "n_chars": pa.array([len(x) for x in texts], type=pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = (
        QUERIES["golden_records"](str(tmp_path))
        .to_pandas()
        .set_index("cluster_id")
        .sort_index()
    )
    big = df.loc[1]
    assert big["n_docs"] == 3 and big["rep_doc"] == 1
    assert big["golden_lang"] == "sql"
    assert big["golden_source"] == "b"
    assert big["total_chars"] == 3 * len(t)
    lone = df.loc[9]
    assert lone["n_docs"] == 1 and lone["golden_lang"] == "py"


def test_pagerank_paths_agree(ray_session):
    """The gated broadcast iteration and the reduce-side union/shuffle
    iteration must produce bit-identical rank panels."""
    from address_parser_ray.pipelines.queries import q_pagerank_ranks

    fast = _canon(_to_df(q_pagerank_ranks(SF)))
    slow = _canon(_to_df(q_pagerank_ranks(SF, _gate_bytes=0)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)


def test_kcore_paths_agree(ray_session):
    """The broadcast survivor filter and the bucketed semi-join filter
    must peel to identical cores; every surviving node satisfies k."""
    from address_parser_ray.pipelines.queries import _KCORE_K, q_kcore_nodes

    fast = _canon(_to_df(q_kcore_nodes(SF)))
    slow = _canon(_to_df(q_kcore_nodes(SF, _gate_bytes=0)))
    pd.testing.assert_frame_equal(fast, slow, check_dtype=False)
    if len(fast):
        assert (fast["core_deg"] >= _KCORE_K).all()


def test_source_ab_inequality_matches_float_welch(ray_session):
    """The division-free integer inequality must decide exactly the
    float Welch z^2 > 4 test on random samples (the property the SQL
    twin and the engine both rely on)."""
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(500):
        na, nb = rng.integers(2, 40, 2)
        a = rng.integers(0, 500, na)
        b = rng.integers(0, 500, nb)
        sxa, sxxa = int(a.sum()), int((a * a).sum())
        sxb, sxxb = int(b.sum()), int((b * b).sum())
        qa = na * sxxa - sxa * sxa
        qb = nb * sxxb - sxb * sxb
        lhs = (sxa * nb - sxb * na) ** 2 * (na - 1) * (nb - 1)
        rhs = 4 * (qa * nb * nb * (nb - 1) + qb * na * na * (na - 1))
        va, vb = a.var(ddof=1), b.var(ddof=1)
        denom = va / na + vb / nb
        if denom == 0:
            continue
        z2 = (a.mean() - b.mean()) ** 2 / denom
        if abs(z2 - 4) > 1e-9:
            assert (lhs > rhs) == (z2 > 4)


def test_pr_curve_properties(ray_session):
    """The threshold sweep must be internally consistent: tp/fp
    non-increasing and fn non-decreasing in the threshold, recall
    monotone non-increasing, counts tie out per row, and the shipped
    operating region (score >= 0.5) must separate the fixture's true
    pairs cleanly (F1 >= 0.99 at threshold_bp = 5000)."""
    import numpy as np

    from address_parser_ray.pipelines.queries import QUERIES

    df = QUERIES["pr_curve"](SF).sort_values("threshold_bp").reset_index(drop=True)
    assert len(df) == 21
    tp = df["tp"].to_numpy()
    fp = df["fp"].to_numpy()
    fn = df["fn"].to_numpy()
    assert (np.diff(tp) <= 0).all()
    assert (np.diff(fp) <= 0).all()
    assert (np.diff(fn) >= 0).all()
    assert ((tp + fn) == (tp[0] + fn[0])).all()
    assert (df["recall_ppm"].to_numpy()[1:] <= df["recall_ppm"].to_numpy()[:-1]).all()
    at = df[df["threshold_bp"] == 5000].iloc[0]
    assert at["f1_ppm"] >= 990_000, df.to_string()


def test_ivf_kmeans_gate(ray_session, monkeypatch):
    """VERDICT r3 item 8: above IVF_KMEANS_GATE the IVF coarse quantizer
    must come from the distributed sampled k-means instead of the
    seed-row rule. Forcing the gate to 0 at fixture scale: the query
    still returns the full (query x top-k) panel, is deterministic, and
    its probed-list recall vs exhaustive cosine top-k stays >= 2/3 of
    neighbors per query on average (IVF trades recall for probe count;
    the seed-rule path's recall is the same trade)."""
    import numpy as np

    from address_parser_ray.pipelines import queries as Q

    base = _to_df(Q.QUERIES["ann_ivf_topk"](SF))
    monkeypatch.setattr(Q, "IVF_KMEANS_GATE", 0)
    km1 = _to_df(Q.QUERIES["ann_ivf_topk"](SF))
    km2 = _to_df(Q.QUERIES["ann_ivf_topk"](SF))
    pd.testing.assert_frame_equal(_canon(km1), _canon(km2))  # deterministic
    assert set(km1.columns) == set(base.columns)
    assert km1["query_vec_id"].nunique() == base["query_vec_id"].nunique()
    assert (km1.groupby("query_vec_id")["rank"].max() == 3).all()

    # recall vs exhaustive cosine top-3 (computed directly here)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    vids = np.asarray(t["vec_id"], dtype=np.int64)
    emb = np.asarray(t["embedding"].combine_chunks().flatten(), dtype=np.float64)
    emb = emb.reshape(len(vids), -1)
    norms = np.linalg.norm(emb, axis=1)
    norms[norms == 0] = 1.0
    unit = emb / norms[:, None]
    hits = 0
    total = 0
    for q, g in km1.groupby("query_vec_id"):
        qv = unit[vids == q][0]
        cos = unit @ qv
        order = np.lexsort((vids, -cos))
        top = [int(v) for v in vids[order] if int(v) != int(q)][:3]
        want = set(top)
        hits += len(want & set(int(x) for x in g["neighbor_vec_id"]))
        total += len(want)
    assert total > 0 and hits / total >= 2 / 3, (hits, total)
