"""Loaders for the driver-generated parquet tables.

``spark.read.parquet`` gives Catalyst full predicate-pushdown / column
pruning on these scans; at 100 TB the same call pointed at a partitioned
(symbol, threshold_decimal_bps) layout gets partition pruning for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
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
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> None:
    for name in names or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
