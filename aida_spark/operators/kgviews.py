"""Knowledge-graph materialization views over the triple table — the
"graph materialize" step of the north rule beyond per-mention triples:
entity co-occurrence edges and per-entity mention statistics, for
downstream graph analytics / embedding training.

Scale shape: the edge view is a per-conversation self-join over the
DISTINCT entities of each conversation (candidate sets are pruned
upstream, so per-conv entity counts are small and the join is bounded
per key), followed by a partial-aggregated count — two shuffles on
uniform keys, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["conv_of_subj", "entity_cooccurrence", "entity_mention_stats"]


def conv_of_subj(col="subj"):
    """Extract the conversation id from a triple subject
    ``conv/turn/offset`` (conv ids themselves never contain '/')."""
    return F.substring_index(F.col(col), "/", 1)


def entity_cooccurrence(triples: DataFrame, min_convs: int = 1) -> DataFrame:
    """(entity_a, entity_b, n_convs): undirected co-occurrence edges —
    how many conversations link both entities (a < b lexicographically;
    an entity pair counts once per conversation regardless of mention
    multiplicity)."""
    ce = (
        triples.select(
            conv_of_subj().alias("conv"), F.col("obj").alias("entity")
        )
        .distinct()
    )
    a, b = ce.alias("a"), ce.alias("b")
    return (
        a.join(
            b,
            (F.col("a.conv") == F.col("b.conv"))
            & (F.col("a.entity") < F.col("b.entity")),
        )
        .groupBy(
            F.col("a.entity").alias("entity_a"),
            F.col("b.entity").alias("entity_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_convs"))
        .filter(F.col("n_convs") >= min_convs)
    )


def entity_mention_stats(triples: DataFrame) -> DataFrame:
    """(entity, n_mentions, n_convs, n_surfaces): per-entity linking
    statistics — the dimension table a KG consumer ranks/filters by."""
    return (
        triples.select(
            conv_of_subj().alias("conv"),
            F.col("obj").alias("entity"),
            F.col("mention"),
        )
        .groupBy("entity")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            F.countDistinct("conv").alias("n_convs"),
            F.countDistinct("mention").alias("n_surfaces"),
        )
    )
