"""Iceberg-gated partitioned writer.

The checkpoint protocol (sources/lineage.py) targets an Iceberg
checkpoint table (north_rule): with an Iceberg catalog on the
classpath, partition replacement is `writeTo(table).overwritePartitions()`
— snapshot-isolated, atomic per commit. This container ships no
Iceberg jars, so the probe fails and the SAME layout is produced with
partitioned-Parquet dynamic partition overwrite. Both paths replace
exactly the partitions present in the written DataFrame and leave the
rest untouched, which is the only property the resume protocol needs.

The probe is a classpath check (`org.apache.iceberg.spark.SparkCatalog`)
cached per JVM — cheap enough to call per write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_PROBE_CACHE: dict[int, bool] = {}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the JVM classpath."""
    key = id(spark.sparkContext._jsc)
    if key not in _PROBE_CACHE:
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.SparkCatalog"
            )
            _PROBE_CACHE[key] = True
        except Exception:
            _PROBE_CACHE[key] = False
    return _PROBE_CACHE[key]


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_col: str,
    table: str | None = None,
) -> str:
    """Replace exactly the partitions present in `df` at `path`.

    Returns the engine used ('iceberg' | 'parquet') so callers/tests
    can assert which path engaged. `table` (an Iceberg identifier like
    `ckpt.db.stage`) is required for the Iceberg path; when absent the
    parquet fallback is used even if jars are present.
    """
    spark = df.sparkSession
    if table is not None and iceberg_available(spark):
        if not spark.catalog.tableExists(table):
            df.writeTo(table).partitionedBy(df[partition_col]).createOrReplace()
        else:
            df.writeTo(table).overwritePartitions()
        return "iceberg"
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    return "parquet"
