"""Evaluation harness — the graft of the reference's golden-accuracy
scorer (``hcmut_assigment/scorer.py:30-116``: per-field compare with
equivalence-class normalization, accuracy + latency stats) and the
differential eval (``tests/eval_parsers.py:76-114``).

Cluster assignments are compared *up to relabeling* (partition equality)
— the analogue of scorer.py's spelling-variant groups: two labelings
agree on a pair iff both place the pair in the same/different clusters.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


@dataclass
class PairwiseMetrics:
    precision: float
    recall: float
    f1: float
    tp: int
    fp: int
    fn: int

    def as_row(self) -> dict:
        return {
            "precision": round(self.precision, 6),
            "recall": round(self.recall, 6),
            "f1": round(self.f1, 6),
            "tp": self.tp,
            "fp": self.fp,
            "fn": self.fn,
        }


def _pair_counts_from_labels(ids: np.ndarray, labels: np.ndarray) -> dict[int, int]:
    """cluster label → size (for same-pair counting via C(n,2))."""
    _, counts = np.unique(labels, return_counts=True)
    return counts


def pairwise_f1(
    truth: pd.DataFrame, pred: pd.DataFrame, on: str = "record_id",
    truth_col: str = "cluster_id", pred_col: str = "cluster_id",
) -> PairwiseMetrics:
    """Exhaustive pairwise P/R/F1 between two labelings WITHOUT
    enumerating pairs: same-pair counts come from cluster sizes
    (Σ C(n,2)) and the intersection contingency — O(n log n)."""
    m = truth[[on, truth_col]].merge(
        pred[[on, pred_col]], on=on, suffixes=("_t", "_p")
    )
    t = m[f"{truth_col}_t"].to_numpy() if truth_col == pred_col else m[truth_col].to_numpy()
    p = m[f"{pred_col}_p"].to_numpy() if truth_col == pred_col else m[pred_col].to_numpy()

    def c2(counts: np.ndarray) -> int:
        return int((counts.astype(np.int64) * (counts - 1) // 2).sum())

    _, tc = np.unique(t, return_counts=True)
    _, pc = np.unique(p, return_counts=True)
    # contingency: pairs in same cluster in BOTH labelings
    both = pd.DataFrame({"t": t, "p": p}).groupby(["t", "p"]).size().to_numpy()
    tp = c2(both)
    fn = c2(tc) - tp
    fp = c2(pc) - tp
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * prec * rec / max(1e-12, prec + rec)
    return PairwiseMetrics(prec, rec, f1, tp, fp, fn)


def same_block_pairwise_f1(
    scored_pairs: pd.DataFrame,
    truth: pd.Series,
    pred: pd.Series,
) -> PairwiseMetrics:
    """North-rule form: F1 over labeled candidate pairs within the same
    blocking key, judged by final cluster agreement.

    ``truth``/``pred``: record_id-indexed cluster labels."""
    a = scored_pairs["id_a"].to_numpy()
    b = scored_pairs["id_b"].to_numpy()
    t_same = truth.loc[a].to_numpy() == truth.loc[b].to_numpy()
    p_same = pred.loc[a].to_numpy() == pred.loc[b].to_numpy()
    tp = int((t_same & p_same).sum())
    fp = int((~t_same & p_same).sum())
    fn = int((t_same & ~p_same).sum())
    prec = tp / max(1, tp + fp)
    rec = tp / max(1, tp + fn)
    f1 = 2 * prec * rec / max(1e-12, prec + rec)
    return PairwiseMetrics(prec, rec, f1, tp, fp, fn)
