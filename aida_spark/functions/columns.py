"""Reusable Catalyst column functions (the engine's `F`-level surface).

Collects the column-expression builders scattered across the engine so
users can compose them in their own DataFrame pipelines:

- `mi_expr`, `idf_expr`       — association weights (K3/K4)
- `cosine_sim_col`            — array cosine similarity
- `trigram_array`             — padded character trigrams
- `conflate_col`              — the P10 case-conflation rule as a column
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..kb_spark import idf_expr, mi_expr
from ..operators.fuzzy import _trigram_array as trigram_array
from ..operators.knn import cosine_sim_col

__all__ = ["mi_expr", "idf_expr", "cosine_sim_col", "trigram_array", "conflate_col"]


def conflate_col(col):
    """AidaManager.conflateToken as a column: uppercase iff length >= 4."""
    return F.when(F.length(col) >= 4, F.upper(col)).otherwise(col)
