"""Sequence packing for LLM training: assign documents to fixed-capacity
training sequences ("packs") so short documents share a sequence instead
of wasting pad tokens.

Algorithm: deterministic greedy fill — within a shard, walk documents in
id order and start a new pack whenever adding the next document would
exceed the capacity (a document longer than the capacity gets a pack of
its own). This is the standard streaming packer; shards make it
embarrassingly parallel.

Scale shape: packing is sequential BY DESIGN within a shard (each pack
decision depends on the previous fill level), so the parallel unit is
the shard: ``shard = pmod(xxhash64(id), n_shards)``. One shuffle onto
the shard key, then one Arrow-batched pass per shard group (the
per-shard state is two integers). Pick n_shards ~ cluster cores x 4;
each shard's rows must fit one worker (same contract as any grouped
pandas op). Cross-shard packing quality loss is negligible for
n_docs >> n_shards.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

__all__ = ["pack_sequences"]

_PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("shard", LongType()),
        StructField("pack_no", LongType()),
        StructField("pack_fill", LongType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    shard_col: str | None = None,
) -> DataFrame:
    """(doc_id, shard, pack_no, pack_fill): pack_no numbers the training
    sequences within a shard (0-based, in id order); pack_fill is the
    pack's running token total after this document. Deterministic for a
    given (capacity, n_shards). Pass ``shard_col`` to bring your own
    shard assignment (any deterministic int column — e.g. one an
    external system, or a SQL oracle, can reproduce); the default is
    ``pmod(xxhash64(id), n_shards)``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf.sort_values("doc_id")
        pack_no = 0
        fill = 0
        first = True
        out_no = []
        out_fill = []
        for n in grp["n_tokens"]:
            n = int(n)
            if not first and fill + n > capacity:
                pack_no += 1
                fill = 0
            fill += n
            first = False
            out_no.append(pack_no)
            out_fill.append(fill)
        return pd.DataFrame(
            {
                "doc_id": grp["doc_id"].astype("int64"),
                "shard": grp["shard"].astype("int64"),
                "pack_no": out_no,
                "pack_fill": out_fill,
            }
        )

    shard_expr = (
        F.col(shard_col).cast("long")
        if shard_col
        else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    )
    sharded = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        shard_expr.alias("shard"),
    )
    # one group per shard: the sequential fill state lives inside the
    # Arrow pass; repartitioning by shard bounds any group to one task
    return (
        sharded.repartition(n_shards, "shard")
        .groupBy("shard")
        .applyInPandas(pack, _PACK_SCHEMA)
    )
