"""Result sinks (SURVEY.md §2.1 S3-S11): append result tables, targeted
overwrite-before-rerun, NDJSON telemetry — the Spark forms of the
reference's INSERT-SELECT / ALTER DELETE / flock-append-NDJSON plumbing.

The reference needed 80 lines of bash for atomic NDJSON appends with
NULL scrubbing (scripts/gen600/submit.sh:40-120); ``df.write.json`` is
the whole replacement — nulls are native, partition files are atomic.

At 100 TB: results partition by (generation, symbol); the rerun pattern
(S5: delete WHERE generation=... AND symbol=... then insert) becomes
dynamic-partition overwrite, which replaces exactly the partitions the
new run produces and leaves the rest untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def append_results(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S3: INSERT-SELECT equivalent — append to a partitioned result table."""
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def overwrite_partitions(df: DataFrame, path: str, partition_by: list[str]) -> None:
    """S5: targeted delete-then-insert — dynamic partition overwrite
    replaces only the partitions present in ``df`` (the reference's
    ``ALTER TABLE ... DELETE WHERE generation=... AND symbol=...`` +
    re-INSERT rerun idiom)."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_telemetry_ndjson(df: DataFrame, path: str) -> None:
    """S9: NDJSON telemetry sink (one JSON object per line, per-partition
    files written atomically by the task commit protocol)."""
    df.write.mode("append").json(path)


def read_telemetry_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """S10/S11: load JSONL results for ad-hoc SQL (the DuckDB-over-
    parquet layer of the reference is just Spark SQL here)."""
    return spark.read.json(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str = "symbol",
    n_buckets: int = 16,
    sort_col: str | None = "rn",
) -> None:
    """Bucketed parquet table (S11 scale variant): pre-shuffles once at
    write time so every later equi-join/aggregation on ``bucket_col``
    is co-located — Catalyst drops the Exchange entirely (asserted in
    tests/test_bucketing.py).  At 100 TB this converts the per-query
    shuffle of repeated (symbol, threshold)-keyed joins into a one-time
    layout cost, the cluster-scale analogue of the reference's per-shard
    table files.  ``n_buckets`` should track cluster parallelism, not
    data size — bucket pruning and AQE handle the rest."""
    w = df.write.mode("overwrite").format("parquet").option("path", path)
    w = w.bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table with its bucket metadata intact (a plain
    ``spark.read.parquet(path)`` would lose the bucket spec and
    reintroduce shuffles)."""
    return spark.table(table_name)
