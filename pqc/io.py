"""Table IO seam.

The design target is an Iceberg catalog (BASELINE.json north_rule); the
sandbox has no Iceberg runtime jar, so this module reads/writes
Iceberg-*layout* partitioned Parquet behind one seam (SURVEY.md §7.4).
Partition pruning semantics are identical — Spark prunes partitioned
Parquet directories on partition-column predicates just as it prunes
Iceberg manifests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-provided testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)


def write_partitioned(df: DataFrame, path: str, partition_col: str = "part") -> None:
    """Write an Iceberg-layout partitioned Parquet table."""
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
