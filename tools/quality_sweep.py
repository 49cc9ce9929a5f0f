"""Quality sweep: pairwise F1 of the flagship pipeline across
adversarial-variant fractions, with the content-rescore stage on vs off
— quantifies what the P2 content blend contributes as rename pressure
rises. Prints a markdown table + one JSON line.

Usage: python tools/quality_sweep.py
"""

from __future__ import annotations

import dataclasses
import json
import sys


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pandas as pd

    from address_parser_ray.config import PipelineConfig
    from address_parser_ray.fixtures import write_corpus
    from address_parser_ray.functions.hashing import stable_id128
    from address_parser_ray.pipelines.dedup import dedup_pipeline
    from address_parser_ray.pipelines.evaluation import pairwise_f1
    from address_parser_ray.sources import read_corpus

    rows = []
    off_cfg = dataclasses.replace(PipelineConfig(), content_rescore=False)
    for frac in (0.0, 0.25, 0.5, 0.75, 1.0):
        cd, lp = write_corpus(
            f"/tmp/apr_quality_{int(frac * 100)}",
            n_seeds=40,
            variants_per_seed=8,
            adversarial_frac=frac,
        )
        labels = pd.read_parquet(lp)
        labels["record_id"] = [
            stable_id128(r, p, c)
            for r, p, c in zip(labels.repo, labels.path, labels.commit)
        ]
        corpus = read_corpus(cd)
        f_on = pairwise_f1(labels, dedup_pipeline(corpus).assignments.to_pandas())
        f_off = pairwise_f1(
            labels, dedup_pipeline(corpus, off_cfg).assignments.to_pandas()
        )
        rows.append(
            {
                "adversarial_frac": frac,
                "f1_rescore_on": round(f_on.f1, 4),
                "f1_rescore_off": round(f_off.f1, 4),
            }
        )
        print(rows[-1], flush=True)

    print("\n| adversarial_frac | F1 (rescore on) | F1 (rescore off) |")
    print("|---|---|---|")
    for r in rows:
        print(
            f"| {r['adversarial_frac']} | {r['f1_rescore_on']} "
            f"| {r['f1_rescore_off']} |"
        )
    print(json.dumps(rows))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
