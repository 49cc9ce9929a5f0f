#!/usr/bin/env python
"""Benchmark harness.

Headline: the flagship blocking → scoring → clustering pipeline over a
deterministic synthetic source-code corpus sized to the scale factor
(BASELINE.json input_hint shape; synthesized because the driver testdata
has no code corpus). Also times a representative query subset over
``$GRAFT_SF_DIR`` and reports scored-pairs/sec.

Prints ONE JSON line:
  {"metric": "e2e_dedup_sec", "value": N, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the same bench in fresh processes at num_cpus=8 and
num_cpus=32 on the SAME corpus (the sandbox proxy for the N vs 4N-node
cluster rule) and reports throughput at both + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# corpus size scales with sf: sf0.1 → 2000 seeds (~12k files, ~25 MB)
def _sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


SF = _sf_of(SF_DIR)


def _corpus_cfg() -> tuple[int, int, int, str]:
    """Corpus knobs, read at call time so --dense can set them in main."""
    n_seeds = int(
        os.environ.get("APR_BENCH_SEEDS", max(50, min(48000, int(480000 * SF))))
    )
    # file_scale=4 → ~9-10 KB files (realistic source-file sizes); per-file
    # fingerprint compute then dominates fixed per-row shuffle costs.
    file_scale = int(os.environ.get("APR_BENCH_FILE_SCALE", "4"))
    # variants_per_seed=8 → ~28% duplicate rows (web-crawl-like); raising it
    # produces a duplicate-DENSE corpus (larger clusters → quadratically more
    # candidate pairs per byte read) where pairwise-scoring compute dominates
    # the scan — the "compute-dominated corpus" regime for --scaling --dense.
    variants = int(os.environ.get("APR_BENCH_VARIANTS", "8"))
    cache = f"/tmp/apr_bench_corpus_s{n_seeds}_f{file_scale}_v{variants}"
    return n_seeds, file_scale, variants, cache

BENCH_QUERIES = [
    "exact_dedup_groups",
    "token_counts_by_lang",
    "pricing_summary",
    "orders_by_nation",
    "events_hourly",
    "embedding_topk",
    "simhash_hamming_pairs",
]


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from address_parser_ray.fixtures import write_corpus_ray
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.queries import QUERIES
    from address_parser_ray.sources import read_corpus

    n_seeds, file_scale, variants, corpus_cache = _corpus_cfg()
    corpus_dir, _ = write_corpus_ray(
        corpus_cache, n_seeds=n_seeds, file_scale=file_scale,
        variants_per_seed=variants,
    )

    # warm the page cache AND the Ray worker/actor pools with an untimed
    # mini-run, so the timed run measures steady-state compute + shuffle,
    # not process spawn + module imports (both cluster sizes pay the same
    # cold start; leaving it in just smears the scaling signal).
    import pyarrow as _pa

    corpus = read_corpus(corpus_dir)
    # full scan (not count(), which reads only parquet metadata) so the
    # page cache is genuinely warm even right after corpus generation
    n_rows = sum(
        b.num_rows
        for b in corpus.iter_batches(batch_size=8192, batch_format="pyarrow")
    )
    # materialize: a lazy .limit() yields DIFFERENT rows on re-execution
    # at high parallelism, and the rescore stage re-reads the corpus
    dedup_pipeline(corpus.limit(512).materialize()).assignments.count()
    # ...then TWO full untimed passes: the mini-run warms imports and the
    # page cache but not the actor pools / object store at full fan-out —
    # and the FIRST full pass still reads 2-2.5x high (r3 measured
    # [113.8, 45.4, 43.6] with one warm-up pass: leg 1 pays object-store
    # eviction of the warm-up's blocks; legs 2-3 agree within 4%). Two
    # passes reach the steady state the timed legs are meant to measure.
    n_warm = int(os.environ.get("APR_BENCH_WARMUPS", "2"))
    for _ in range(n_warm):
        dedup_pipeline(corpus).assignments.count()

    # three timed runs (post-warm-up), min reported: single-shot numbers
    # on this sandbox swing ±20% with ambient load (BASELINE.md noise
    # analysis); min-of-3 after a warm-up estimates steady state.
    # --scaling legs dial this down to 2 via the env var to bound the
    # total wall-clock of 2 legs × reps.
    n_timed = int(os.environ.get("APR_BENCH_E2E_RUNS", "3"))
    e2e_runs = []
    for _ in range(n_timed):
        t0 = time.time()
        result = dedup_pipeline(corpus)
        n_assigned = result.assignments.count()
        e2e_runs.append(time.time() - t0)
    e2e = min(e2e_runs)
    n_scored = result.scored_pairs.count()

    qtimes: dict[str, float] = {}
    if os.environ.get("APR_BENCH_SKIP_QUERIES") == "1":
        BENCH_QUERIES.clear()  # scaling legs time only the headline pipeline
    for name in BENCH_QUERIES:
        qt = time.time()
        res = QUERIES[name](SF_DIR)
        # consume
        if hasattr(res, "count") and not isinstance(res, (int, float)):
            try:
                res.count()
            except AttributeError:
                pass
        qtimes[name] = round(time.time() - qt, 3)

    out = {
        "metric": "e2e_dedup_sec",
        "value": round(e2e, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF,
        "num_cpus": NUM_CPUS,
        "corpus_rows": int(n_rows),
        "e2e_runs": [round(x, 3) for x in e2e_runs],
        "assigned_rows": int(n_assigned),
        "scored_pairs": int(n_scored),
        "scored_pairs_per_sec": round(n_scored / e2e, 1) if e2e > 0 else None,
    }
    ray.shutdown()
    print(json.dumps(out))


_PROBE = r"""
import ray, time, numpy as np, sys
ncpu = int(sys.argv[1])
ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
         logging_level="ERROR", log_to_driver=False)

@ray.remote
def compute_task(n):
    x = np.arange(200_000, dtype=np.uint64)
    acc = np.uint64(0)
    with np.errstate(over="ignore"):
        for _ in range(n):
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            acc ^= x[0]
    return int(acc)

@ray.remote
def memory_task(n):
    x = np.zeros(64_000_000, dtype=np.uint64)  # 512 MB stream
    s = 0
    for _ in range(n):
        x += np.uint64(1)
        s += int(x[-1])
    return s

for task, iters in ((compute_task, 60), (memory_task, 6)):
    t0 = time.time()
    ray.get([task.remote(iters) for _ in range(ncpu * 2)])  # 2 tasks/cpu
    print(f"{time.time()-t0:.3f}")
ray.shutdown()
"""


def _hw_probe(lo: int = 8, hi: int = 32) -> dict:
    """Per-core-normalized weak-scaling of a cache-resident compute
    kernel vs a 512 MB-streaming memory kernel at lo and hi cpus — the
    hardware context the pipeline ratio must be read against (a single
    socket does not multiply memory bandwidth with cpu count)."""
    probe_path = "/tmp/apr_scaling_probe.py"
    with open(probe_path, "w") as f:
        f.write(_PROBE)

    def run(ncpu):
        out = subprocess.run(
            [sys.executable, probe_path, str(ncpu)],
            capture_output=True, text=True, check=True,
        ).stdout.split()
        return float(out[0]), float(out[1])

    c_lo, m_lo = run(lo)
    c_hi, m_hi = run(hi)
    return {
        "compute_weak_eff": round(c_lo / c_hi, 3),
        "memory_weak_eff": round(m_lo / m_hi, 3),
    }


def scaling(lo: int = 8, hi: int = 32, reps: int = 3, write_baseline: bool = True) -> dict:
    """Same corpus, fresh ray.init at ``lo`` then ``hi`` CPUs (defaults
    8→32, the driver's N vs 4N proxy; ``--lo 4 --hi 16`` measures the
    same 4× ratio in a regime where the single socket's memory bus is
    not yet saturated). Efficiency = (t_lo/t_hi)/(hi/lo). Each leg runs
    ``reps`` times interleaved and the min is used — the sandbox shows
    ±20% run-to-run system noise, and min estimates steady-state. A
    hardware probe (pure-compute vs pure-memory-stream weak scaling) is
    reported alongside so the ratio can be read against the box's
    actual bandwidth ceiling. Appends to BASELINE.md (the 8→32 default
    replaces the measured block; other leg pairs append a line)."""

    def run_once(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_SF_DIR=SF_DIR,
            APR_BENCH_SKIP_QUERIES="1",
            APR_BENCH_E2E_RUNS="2",
            # one warm-up per leg: the interleaved min-of-reps already
            # filters cold runs; two would double each leg's wall-clock
            APR_BENCH_WARMUPS="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # legs INTERLEAVED (hi,lo,hi,lo,...) so slow system drift hits both
    # sides equally; min per leg estimates steady state against the
    # sandbox's ±20% run-to-run noise. hi first: a cold corpus cache is
    # generated at full parallelism.
    runs_hi, runs_lo = [], []
    for _ in range(reps):
        runs_hi.append(run_once(hi))
        runs_lo.append(run_once(lo))
    r_hi = min(runs_hi, key=lambda r: r["value"])
    r_lo = min(runs_lo, key=lambda r: r["value"])
    r_hi["runs"] = [r["value"] for r in runs_hi]
    r_lo["runs"] = [r["value"] for r in runs_lo]
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    hw = _hw_probe(lo, hi)
    dense = os.environ.get("APR_BENCH_VARIANTS", "8") != "8"
    result = {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "corpus_regime": "duplicate-dense" if dense else "default",
        "variants_per_seed": int(os.environ.get("APR_BENCH_VARIANTS", "8")),
        "cpus_lo": lo,
        "cpus_hi": hi,
        f"sec_{lo}": r_lo["value"],
        f"sec_{hi}": r_hi["value"],
        f"runs_{lo}": r_lo["runs"],
        f"runs_{hi}": r_hi["runs"],
        f"pairs_per_sec_{lo}": r_lo["scored_pairs_per_sec"],
        f"pairs_per_sec_{hi}": r_hi["scored_pairs_per_sec"],
        "sf": SF,
        "corpus_rows": r_hi["corpus_rows"],
        **hw,
    }
    print(json.dumps(result))
    if not write_baseline:
        return result
    path = os.path.join(REPO, "BASELINE.md")
    marker = "## Measured (bench.py --scaling)"
    with open(path) as f:
        text = f.read()
    if (lo, hi) == (8, 32) and not dense:
        # the canonical measurement replaces any previous measured block
        if marker in text:
            text = text[: text.index(marker)].rstrip() + "\n"
        text += (
            f"\n{marker}\n\n"
            f"| num_cpus | e2e dedup sec (min of {reps}) | runs | scored-pairs/sec |\n"
            f"|---|---|---|---|\n"
            f"| {lo} | {r_lo['value']} | {r_lo['runs']} | {r_lo['scored_pairs_per_sec']} |\n"
            f"| {hi} | {r_hi['value']} | {r_hi['runs']} | {r_hi['scored_pairs_per_sec']} |\n\n"
            f"Scaling efficiency ({lo}→{hi} cpus, same input, fresh sessions): "
            f"**{round(eff, 3)}** (corpus_rows={r_hi['corpus_rows']}, sf={SF}).\n\n"
            f"Hardware context (per-core-normalized weak scaling, 2 tasks/cpu, "
            f"{lo} vs {hi} cpus): cache-resident compute kernel "
            f"**{hw['compute_weak_eff']}**, 512 MB-streaming memory kernel "
            f"**{hw['memory_weak_eff']}** — this single-socket box does not "
            f"multiply memory bandwidth with cpu count, so any pipeline that "
            f"streams GBs (parquet decode, normalization, shuffle) is capped "
            f"well below 1.0 here; on a real multi-node cluster each node "
            f"brings its own memory system and the same code scales with "
            f"nodes.\n"
        )
    else:
        # supplementary leg pairs (e.g. 4→16, --dense) append, never replace
        regime = (
            f"duplicate-dense corpus, variants_per_seed="
            f"{os.environ.get('APR_BENCH_VARIANTS')}, "
            if dense
            else ""
        )
        text = text.rstrip() + (
            f"\n\nSupplementary --scaling run ({lo}→{hi} cpus, same "
            f"{hi // lo}× ratio, {regime}min of {reps}): efficiency "
            f"**{round(eff, 3)}** "
            f"(sec_{lo}={r_lo['value']} {r_lo['runs']}, "
            f"sec_{hi}={r_hi['value']} {r_hi['runs']}, "
            f"pairs/sec {r_lo['scored_pairs_per_sec']}→"
            f"{r_hi['scored_pairs_per_sec']}, "
            f"compute ceiling {hw['compute_weak_eff']}, memory ceiling "
            f"{hw['memory_weak_eff']}, corpus_rows={r_hi['corpus_rows']}, "
            f"sf={SF}).\n"
        )
    with open(path, "w") as f:
        f.write(text)
    return result


def scaling_median(lo: int = 4, hi: int = 16, windows: int = 3, reps: int = 2) -> None:
    """Reproducibility discipline for the scaling number (VERDICT r3
    item 7): ``windows`` fully independent --scaling measurements (each
    its own interleaved min-of-``reps`` window with its own same-window
    hardware probes), reported as the MEDIAN-of-windows with every
    window's efficiency and probe ceilings attached — a best-window
    number can ride one quiet scheduling interval; a median cannot.
    Appends the block to BASELINE.md."""
    results = [scaling(lo=lo, hi=hi, reps=reps, write_baseline=False)
               for _ in range(windows)]
    effs = sorted(r["value"] for r in results)
    med = effs[len(effs) // 2]
    summary = {
        "metric": "scaling_efficiency_median",
        "value": med,
        "unit": "ratio",
        "windows": [r["value"] for r in results],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "probe_compute": [r["compute_weak_eff"] for r in results],
        "probe_memory": [r["memory_weak_eff"] for r in results],
        "sf": SF,
    }
    print(json.dumps(summary))
    path = os.path.join(REPO, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    lines = "\n".join(
        f"| {i + 1} | {r['value']} | {r[f'sec_{lo}']} | {r[f'sec_{hi}']} "
        f"| {r['compute_weak_eff']} | {r['memory_weak_eff']} |"
        for i, r in enumerate(results)
    )
    text = text.rstrip() + (
        f"\n\n## Median-of-{windows} scaling windows ({lo}\u2192{hi} cpus)\n\n"
        f"| window | efficiency | sec@{lo} | sec@{hi} | compute ceiling | memory ceiling |\n"
        f"|---|---|---|---|---|---|\n{lines}\n\n"
        f"**Median efficiency: {med}** (windows {summary['windows']}; each window is an\n"
        f"independent interleaved min-of-{reps} measurement in fresh processes with its\n"
        f"own same-window hardware probes \u2014 the reproducible version of the former\n"
        f"best-window number).\n"
    )
    with open(path, "w") as f:
        f.write(text)


def _arg(name: str, default: int) -> int:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


if __name__ == "__main__":
    if "--dense" in sys.argv:
        # duplicate-dense regime: fewer seeds, much larger clusters — same
        # pipeline, but candidate-pair scoring (pure compute) dominates the
        # content scan, emulating a heavily-duplicated web crawl.
        os.environ.setdefault("APR_BENCH_VARIANTS", "40")
        os.environ.setdefault("APR_BENCH_SEEDS", "12000")
    if "--scaling-median" in sys.argv:
        scaling_median(
            lo=_arg("--lo", 4),
            hi=_arg("--hi", 16),
            windows=_arg("--windows", 3),
            reps=_arg("--reps", 2),
        )
    elif "--scaling" in sys.argv:
        scaling(lo=_arg("--lo", 8), hi=_arg("--hi", 32), reps=_arg("--reps", 3))
    else:
        main()
