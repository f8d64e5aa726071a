"""Triple-level precision/recall evaluation (the north-rule quality gate)
plus a CoNLL-style fixture corpus generator for P/R measurement at scale.

The evaluation matches the reference's external CoNLL evaluation protocol:
a predicted (conv, turn, mention, entity) matches a gold row iff all four
agree; NIL gold rows (--NME--) count as correct when the system emits no
triple (or OOKBE) for that mention.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from .core.kb import OOKBE
from .sources.conll import NME

__all__ = ["triple_prf", "evaluate_assignments"]


def triple_prf(
    predicted: set[tuple], gold: set[tuple]
) -> dict[str, float]:
    tp = len(predicted & gold)
    precision = tp / len(predicted) if predicted else 1.0
    recall = tp / len(gold) if gold else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "tp": tp}


def evaluate_assignments(
    assignments: DataFrame, gold: pd.DataFrame
) -> dict[str, float]:
    """Spark assignments (conv_id, turn_idx, mention, entity, ...) vs a
    gold pandas table (conv_id, turn_idx, mention, entity)."""
    pred_rows = assignments.select(
        "conv_id", "turn_idx", "mention", "entity"
    ).collect()
    predicted = {
        (r["conv_id"], r["turn_idx"], r["mention"], r["entity"])
        for r in pred_rows
        if r["entity"] != OOKBE
    }
    gold_linked = {
        (r.conv_id, int(r.turn_idx), r.mention, r.entity)
        for r in gold.itertuples(index=False)
        if r.entity != NME
    }
    # NIL gold mentions: correct iff absent from predicted
    gold_nil = {
        (r.conv_id, int(r.turn_idx), r.mention)
        for r in gold.itertuples(index=False)
        if r.entity == NME
    }
    nil_violations = sum(
        1 for (c, t, m, _e) in predicted if (c, t, m) in gold_nil
    )
    out = triple_prf(predicted, gold_linked)
    out["nil_violations"] = nil_violations
    out["n_gold"] = len(gold_linked)
    out["n_predicted"] = len(predicted)
    return out
