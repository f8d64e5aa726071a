"""Triple-table materialization (S11): partitioned Parquet layout with a
manifest of per-partition statistics.

Layout mirrors what an Iceberg table gives on a real cluster (this
container has no Iceberg runtime jars, so Parquet + manifest is the
stand-in; the write API is storage-agnostic):

    <path>/data/obj_bucket=<k>/part-*.parquet   -- triples
    <path>/manifest/                             -- (bucket, rows,
                                                    n_subjects, n_objects)

Bucketing by hash(obj) co-locates each entity's triples, which is the
access pattern of downstream KG consumers (entity-centric reads) and
keeps bucket sizes uniform regardless of subject skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["write_triples", "read_triples"]


def write_triples(
    triples: DataFrame,
    path: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    bucketed = triples.withColumn(
        "obj_bucket",
        F.pmod(F.xxhash64(F.col("obj")), F.lit(n_buckets)).cast("int"),
    )
    bucketed.write.mode(mode).partitionBy("obj_bucket").parquet(f"{path}/data")
    manifest = bucketed.groupBy("obj_bucket").agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("subj").alias("n_subjects"),
        F.countDistinct("obj").alias("n_objects"),
    )
    manifest.write.mode(mode).parquet(f"{path}/manifest")


def read_triples(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/data").drop("obj_bucket")
