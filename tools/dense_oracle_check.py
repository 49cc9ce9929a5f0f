"""Dup-DENSE flagship oracle evidence run (VERDICT r4 item 8).

The sf-scale documents corpora have shallow duplicate clusters, so the
flagship DuckDB twin's green runs never exercised high band-key
multiplicity.  This tool generates a dense fixture regime — 30 seeds x
40 variants/seed (clusters ~25-40 members; band multiplicity ~40, still
inside the oracle's no-salting/no-caps domain: salting fires above ~128
estimated rows per key, the pair cap at 91) — runs the ENGINE's full
dedup pipeline and the ORACLE's full SQL twin (src hook → the fixture
parquet, cand_extra → the M18 exact (lang, basename) key) and compares
per-document cluster assignments bit-for-bit in surrogate doc-id space.

Usage:  PYTHONPATH=/root/repo python tools/dense_oracle_check.py
Prints one JSON line {"n_docs":…, "n_clusters":…, "match": true|false}.
Record the result in BASELINE.md.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

N_SEEDS, VARIANTS = 30, 40
SUFFIX = f"_dense_s{N_SEEDS}_v{VARIANTS}"


def main() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from address_parser_ray.fixtures import write_corpus_ray
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus

    root = os.environ.get("APR_FIXTURE_CACHE_ROOT", "/tmp")
    out_dir = os.path.join(root, f"apr_qgen_corpus{SUFFIX}")
    corpus_dir, _ = write_corpus_ray(
        out_dir, n_seeds=N_SEEDS, variants_per_seed=VARIANTS,
        hot_basename_frac=0.0,
    )

    t0 = time.time()
    res = dedup_pipeline(read_corpus(corpus_dir))
    asg = res.assignments.to_pandas()
    corpus = read_corpus(corpus_dir).to_pandas()
    engine_s = time.time() - t0

    # surrogate doc ids: the oracle's row_number() ORDER BY repo, path,
    # commit — recomputed identically here
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    corpus["doc_id"] = np.arange(1, len(corpus) + 1, dtype=np.int64)
    corpus["record_id"] = [
        stable_id128(r, p, c)
        for r, p, c in zip(corpus["repo"], corpus["path"], corpus["commit"])
    ]
    m = asg.merge(corpus[["record_id", "doc_id"]], on="record_id")
    assert len(m) == len(asg), "assignment/corpus id mismatch"
    lab = m.groupby("cluster_id")["doc_id"].transform("min")
    eng = (
        pd.DataFrame({"doc_id": m["doc_id"], "cluster_label": lab})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    sizes = eng.groupby("cluster_label")["doc_id"].transform("size")
    eng["cluster_size"] = sizes.astype(np.int64)
    ray.shutdown()

    import duckdb

    from address_parser_ray.pipelines.oracle import _build_flagship_lsh_sql

    src = f"""
  SELECT row_number() OVER (ORDER BY repo, path, "commit") AS doc_id,
         lang, path,
         repo || chr(31) || path AS repo_key,
         COALESCE(content, '') AS text
  FROM read_parquet('{corpus_dir}/*.parquet')
"""
    cand_extra = """
    UNION ALL
    SELECT a.doc_id, b.doc_id FROM
      (SELECT doc_id, lang, regexp_replace(path, '^.*/', '') AS bn
       FROM reps WHERE doc_id = rep_doc) a
      JOIN
      (SELECT doc_id, lang, regexp_replace(path, '^.*/', '') AS bn
       FROM reps WHERE doc_id = rep_doc) b
      ON a.lang = b.lang AND a.bn = b.bn AND a.doc_id < b.doc_id
"""
    tail = (
        "SELECT c.doc_id, CAST(c.cluster_id AS BIGINT) AS cluster_label,\n"
        "       s.cluster_size\n"
        "FROM comp c JOIN sizes s ON s.cluster_id = c.cluster_id\n"
        "ORDER BY c.doc_id"
    )
    t0 = time.time()
    con = duckdb.connect()
    con.sql("SET memory_limit='48GB'")
    con.sql("SET preserve_insertion_order=false")
    odf = con.sql(
        _build_flagship_lsh_sql(tail=tail, src=src, cand_extra=cand_extra)
    ).df()
    oracle_s = time.time() - t0
    for c in odf.columns:
        odf[c] = odf[c].astype(np.int64)
    eng = eng[["doc_id", "cluster_label", "cluster_size"]].astype(np.int64)
    match = eng.equals(odf.reset_index(drop=True))
    print(json.dumps({
        "n_docs": int(len(eng)),
        "n_clusters": int(eng["cluster_label"].nunique()),
        "max_cluster": int(eng["cluster_size"].max()),
        "engine_sec": round(engine_s, 1),
        "oracle_sec": round(oracle_s, 1),
        "match": bool(match),
    }))
    if not match:
        diff = eng.compare(odf.reset_index(drop=True))
        print(diff.head(20).to_string(), file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
