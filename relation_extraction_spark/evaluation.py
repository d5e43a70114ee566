"""Triple P/R evaluation harness (SURVEY.md §2.7 U2/U3; the
BASELINE.json:L2 acceptance metric "triple P/R>=0.95 vs reference
fixtures" computed with the engine's own set operators).

Both inputs are DataFrames of (url, sent_id, subj, pred, obj)-shaped
rows (extra columns are dropped); the comparison is exact-match on the
key columns, distributed end-to-end — counts come back to the driver,
rows never do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


KEY_COLS = ["url", "sent_id", "subj", "pred", "obj"]


def triple_pr(
    predicted: DataFrame,
    golden: DataFrame,
    key_cols: list[str] | None = None,
) -> dict:
    """Exact-match precision/recall of predicted triples vs a golden set.

    Returns {precision, recall, f1, n_pred, n_gold, n_tp,
    false_positives, false_negatives} — the FP/FN entries are lazy
    DataFrames (U3 except) for drill-down; the scalars are computed.
    """
    keys = key_cols or KEY_COLS
    p = predicted.select(*keys).distinct()
    g = golden.select(*keys).distinct()
    tp = p.intersect(g)  # U2
    n_pred, n_gold, n_tp = p.count(), g.count(), tp.count()
    precision = n_tp / n_pred if n_pred else 0.0
    recall = n_tp / n_gold if n_gold else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "n_pred": n_pred,
        "n_gold": n_gold,
        "n_tp": n_tp,
        "false_positives": p.exceptAll(tp),  # U3
        "false_negatives": g.exceptAll(tp),
    }
