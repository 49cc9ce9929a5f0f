"""CLI entrypoint — the ``ray job submit`` surface of the engine
(north_rule: "run via ray job submit on a fixed-size multi-node Ray
cluster"; reference analogue: the argparse CLIs on every tool,
``ner/build_real_dataset.py:250-295``).

    python -m address_parser_ray.cli dedup \
        --input  /path/to/corpus_parquet \
        --output /path/to/assignments    \
        --checkpoint-dir /path/to/ckpt   \
        [--match-threshold 0.5] [--lsh-bands 32] [--lsh-rows 4]

A rerun with the same --checkpoint-dir resumes from the last completed
stage. This is the ONLY module (besides bench.py and tests) that may own
a Ray session; ``entry()``/``queries()`` never init.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _build_cfg(args) -> "PipelineConfig":
    from address_parser_ray.config import DEFAULT_CONFIG

    overrides = {}
    for field in ("match_threshold", "jaccard_gate", "lsh_bands", "lsh_rows",
                  "max_block_records", "max_pairs_per_block", "shingle_k"):
        val = getattr(args, field, None)
        if val is not None:
            overrides[field] = val
    return dataclasses.replace(DEFAULT_CONFIG, **overrides)


def cmd_dedup(args) -> int:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus
    from address_parser_ray.state import Checkpointer
    from address_parser_ray.state.checkpoint import context_key

    cfg = _build_cfg(args)
    # checkpoints are keyed by (config, input): a rerun with a changed
    # --match-threshold or a different --input recomputes instead of
    # silently resuming stale stage outputs
    ck = (
        Checkpointer(args.checkpoint_dir, context=context_key(cfg, args.input))
        if args.checkpoint_dir
        else None
    )
    result = dedup_pipeline(read_corpus(args.input), cfg, checkpointer=ck)
    result.assignments.write_parquet(args.output)
    n = result.assignments.count()
    n_clusters = result.assignments.unique("cluster_id")
    print(json.dumps({"rows": n, "clusters": len(n_clusters), "output": args.output}))
    ray.shutdown()
    return 0


def _ray_up():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_generate(args) -> int:
    """Synthetic labeled-corpus generation (the reference's
    build_standard_dataset entry point, parallelized)."""
    ray = _ray_up()
    from address_parser_ray.fixtures.generator import write_corpus_ray

    corpus_dir, labels_dir = write_corpus_ray(
        args.out,
        n_seeds=args.n_seeds,
        variants_per_seed=args.variants_per_seed,
        global_seed=args.seed,
        file_scale=args.file_scale,
    )
    import ray.data as rd

    n = rd.read_parquet(corpus_dir).count()
    print(json.dumps({"corpus": corpus_dir, "labels": labels_dir, "rows": n}))
    ray.shutdown()
    return 0


def cmd_split(args) -> int:
    """Seeded shuffle → proportional split → partitioned write (the
    reference's merge_datasets entry point)."""
    ray = _ray_up()
    import ray.data as rd

    from address_parser_ray.pipelines.split import shuffle_split_write

    ds = rd.read_parquet(args.input)
    props = [float(x) for x in args.proportions.split(",")]
    names = args.names.split(",")
    counts = shuffle_split_write(ds, args.out, props, names, seed=args.seed)
    print(json.dumps({"splits": counts, "out": args.out}))
    ray.shutdown()
    return 0


def cmd_infer(args) -> int:
    """Batched model inference over a documents table (the reference's
    ner_train prediction surface): warm hashing-trick classifier."""
    ray = _ray_up()
    import ray.data as rd

    from address_parser_ray.stages.inference import model_inference_stage

    ds = rd.read_parquet(args.input, columns=["doc_id", "text"])
    out = model_inference_stage(ds, num_gpus=args.num_gpus)
    out.write_parquet(args.output)
    print(json.dumps({"rows": out.count(), "output": args.output}))
    ray.shutdown()
    return 0


def cmd_incremental(args) -> int:
    """Attach a new record batch to a completed (checkpointed) run —
    the daily-increment surface of the engine. The config knobs must
    match the previous run's (checkpoints are context-keyed, so a
    mismatch is the operator's responsibility here: the previous run's
    sketches are reused as-is)."""
    ray = _ray_up()
    from address_parser_ray.pipelines.incremental import incremental_dedup, load_result
    from address_parser_ray.sources import read_corpus

    cfg = _build_cfg(args)
    prev = load_result(args.prev_checkpoint)
    old_corpus = read_corpus(args.old_input) if args.old_input else None
    result = incremental_dedup(
        prev, read_corpus(args.input), cfg, old_corpus=old_corpus
    )
    result.assignments.write_parquet(args.output)
    n = result.assignments.count()
    n_clusters = result.assignments.unique("cluster_id")
    print(json.dumps({"rows": n, "clusters": len(n_clusters), "output": args.output}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    """Small-file compaction with row-count + xor verification."""
    ray = _ray_up()

    from address_parser_ray.state.compact import compact_parquet_dir

    summary = compact_parquet_dir(
        args.input,
        args.output,
        target_rows_per_file=args.target_rows_per_file,
        verify_column=args.verify_column,
    )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_pack(args) -> int:
    """documents/corpus parquet → packed token shards (training ingest).

    Reads (doc_id, text) rows, writes hive-partitioned
    split/bucket shards via ``pipelines.training.write_packed_shards``
    and prints the per-split manifest."""
    import ray

    from address_parser_ray.pipelines.training import write_packed_shards

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    ds = ray.data.read_parquet(args.input, columns=["doc_id", "text"])
    manifest = write_packed_shards(
        ds,
        args.output,
        capacity=args.capacity,
        buckets=args.buckets,
        holdout_mod=args.holdout_mod,
    )
    print(json.dumps({"output": args.output, **manifest}))
    ray.shutdown()
    return 0


def cmd_query(args) -> int:
    """Run any registered query by name over an sf-style table dir —
    the ad-hoc analytics surface: every SURVEY §2 operator is runnable
    from the shell.  ``--output`` streams a Dataset result straight to
    parquet (no driver materialization); without it the head is
    printed for inspection."""
    ray = _ray_up()
    from address_parser_ray.pipelines.queries import QUERIES

    if args.name not in QUERIES:
        print(
            json.dumps(
                {"error": f"unknown query {args.name!r}",
                 "available": sorted(QUERIES)}
            )
        )
        ray.shutdown()
        return 2
    res = QUERIES[args.name](args.sf_dir)
    if args.output and hasattr(res, "write_parquet"):
        # partition_cols → one directory per key value: the resumable
        # layout (a failed downstream consumer skips finished keys)
        kwargs = (
            {"partition_cols": args.partition_by.split(",")}
            if args.partition_by
            else {}
        )
        # materialize ONCE so write + count don't each re-execute the
        # full lazy lineage (count() on a materialized set is metadata)
        res = res.materialize()
        res.write_parquet(args.output, **kwargs)
        print(json.dumps({"query": args.name, "rows": res.count(),
                          "output": args.output}))
        ray.shutdown()
        return 0
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    if args.output:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pa.Table.from_pandas(df, preserve_index=False)
        if args.partition_by:
            # pandas-path queries honor --partition-by too: hive layout
            # via write_to_dataset (same resumable shape as the Dataset
            # path) instead of silently ignoring the flag
            pq.write_to_dataset(
                tbl,
                root_path=args.output,
                partition_cols=args.partition_by.split(","),
            )
        else:
            pq.write_table(tbl, args.output)
    print(json.dumps({"query": args.name, "rows": len(df),
                      "output": args.output}))
    if not args.output:
        print(df.head(args.limit).to_string())
    ray.shutdown()
    return 0


def cmd_stats(args) -> int:
    """Per-stage execution profile of the flagship pipeline —
    ``ds.stats()`` as a first-class surface (the tuning feedback loop:
    wall-time should sit in the scorer/fingerprint compute, not in
    shuffles or task overhead)."""
    ray = _ray_up()
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.sources import read_corpus

    cfg = _build_cfg(args)
    result = dedup_pipeline(read_corpus(args.input), cfg)
    for stage_name in ("fingerprints", "scored_pairs", "assignments"):
        ds = getattr(result, stage_name, None)
        if ds is None or not hasattr(ds, "stats"):
            continue
        ds = ds.materialize()
        print(f"===== {stage_name} =====")
        print(ds.stats())
    ray.shutdown()
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="address_parser_ray")
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dedup", help="corpus parquet → cluster assignments parquet")
    d.add_argument("--input", required=True, help="corpus parquet file/dir")
    d.add_argument("--output", required=True, help="assignments output dir")
    d.add_argument("--checkpoint-dir", default=None, help="resume-able stage checkpoints")
    d.add_argument("--match-threshold", type=float, default=None)
    d.add_argument("--jaccard-gate", type=float, default=None)
    d.add_argument("--lsh-bands", type=int, default=None)
    d.add_argument("--lsh-rows", type=int, default=None)
    d.add_argument("--max-block-records", type=int, default=None)
    d.add_argument("--max-pairs-per-block", type=int, default=None)
    d.add_argument("--shingle-k", type=int, default=None)
    d.set_defaults(fn=cmd_dedup)

    g = sub.add_parser("generate", help="synthetic labeled corpus → parquet")
    g.add_argument("--out", required=True)
    g.add_argument("--n-seeds", type=int, default=1000)
    g.add_argument("--variants-per-seed", type=int, default=8)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--file-scale", type=int, default=1)
    g.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("split", help="seeded shuffle → proportional split → parquet")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--proportions", default="0.9", help="comma list, last split is remainder")
    sp.add_argument("--names", default="train,test")
    sp.add_argument("--seed", type=int, default=42)
    sp.set_defaults(fn=cmd_split)

    inc = sub.add_parser(
        "incremental",
        help="attach a new corpus batch to a completed checkpointed run",
    )
    inc.add_argument("--prev-checkpoint", required=True,
                     help="checkpoint dir of the completed previous run")
    inc.add_argument("--input", required=True, help="NEW batch parquet file/dir")
    inc.add_argument("--old-input", default=None,
                     help="previous corpus (required while content rescore is on)")
    inc.add_argument("--output", required=True, help="assignments output dir")
    inc.add_argument("--match-threshold", type=float, default=None)
    inc.add_argument("--jaccard-gate", type=float, default=None)
    inc.add_argument("--lsh-bands", type=int, default=None)
    inc.add_argument("--lsh-rows", type=int, default=None)
    inc.set_defaults(fn=cmd_incremental)

    inf = sub.add_parser("infer", help="documents parquet → model language predictions")
    inf.add_argument("--input", required=True)
    inf.add_argument("--output", required=True)
    inf.add_argument("--num-gpus", type=float, default=0)
    inf.set_defaults(fn=cmd_infer)

    cp = sub.add_parser(
        "compact",
        help="merge a parquet dir's small part files into ~target-size files "
             "(verified: row count + optional invariant-column xor)",
    )
    cp.add_argument("--input", required=True)
    cp.add_argument("--output", required=True)
    cp.add_argument("--target-rows-per-file", type=int, default=1_000_000)
    cp.add_argument("--verify-column", default=None,
                    help="hex-string column to xor-audit (e.g. content_sha256)")
    cp.set_defaults(fn=cmd_compact)

    q = sub.add_parser("query", help="run a registered query over an sf-style table dir")
    q.add_argument("name", help="query name from __ray_entry__.queries()")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--output", default=None, help="parquet output path (streams Datasets)")
    q.add_argument("--partition-by", default=None,
                   help="comma list of columns → hive-partitioned output dirs")
    q.add_argument("--limit", type=int, default=20, help="rows printed without --output")
    q.set_defaults(fn=cmd_query)

    pk = sub.add_parser(
        "pack", help="documents parquet → packed token shards (training ingest)"
    )
    pk.add_argument("--input", required=True, help="parquet with doc_id, text")
    pk.add_argument("--output", required=True, help="shard root dir")
    pk.add_argument("--capacity", type=int, default=512)
    pk.add_argument("--buckets", type=int, default=16)
    pk.add_argument("--holdout-mod", type=int, default=10)
    pk.set_defaults(fn=cmd_pack)

    st = sub.add_parser("stats", help="per-stage ds.stats() profile of the dedup pipeline")
    st.add_argument("--input", required=True, help="corpus parquet file/dir")
    st.add_argument("--match-threshold", type=float, default=None)
    st.add_argument("--lsh-bands", type=int, default=None)
    st.add_argument("--lsh-rows", type=int, default=None)
    st.set_defaults(fn=cmd_stats)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
