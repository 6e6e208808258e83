"""Checkpointed stage execution with per-wave lineage + exact resume.

The PySpark re-expression of the reference's shard checkpointing
(score_curation/docta/core/preprocess.py:55-57 — save every N batches;
LLM_scoring/scoring_api.py:163 — per-batch API saves): input rows are
hashed into W waves; each wave is processed and written as one
atomic-enough unit (dynamic partition overwrite keyed by wave_id, so
re-running a wave replaces rather than duplicates), and a `_lineage`
row records completion. A re-run with the same (run_id, stage)
anti-joins completed waves and only processes the remainder — exact
resume after failure (north_rule requirement).

Tables (FIXTURES.md §4):
  _lineage(run_id, stage, partition_id, input_rows, output_rows,
           started_at, finished_at, status)
  _metrics(run_id, stage, partition_id, metric, value)

Iceberg note: with an Iceberg catalog on the classpath these writes
become `writeTo(...).overwritePartitions()` on a real table with
snapshot isolation; this container has no Iceberg jars, so the
protocol is implemented on partitioned Parquet directories behind the
same helper API (connector gated by import-try, same layout).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, stage string, partition_id int, input_rows long, "
    "output_rows long, started_at double, finished_at double, status string"
)
METRICS_SCHEMA = "run_id string, stage string, partition_id int, metric string, value double"


def _lineage_dir(root: str) -> str:
    return os.path.join(root, "_lineage")


def _metrics_dir(root: str) -> str:
    return os.path.join(root, "_metrics")


def read_lineage(spark: SparkSession, root: str) -> DataFrame:
    path = _lineage_dir(root)
    if not os.path.exists(path):
        return spark.createDataFrame([], LINEAGE_SCHEMA)
    return spark.read.schema(LINEAGE_SCHEMA).parquet(path)


def read_metrics(spark: SparkSession, root: str) -> DataFrame:
    path = _metrics_dir(root)
    if not os.path.exists(path):
        return spark.createDataFrame([], METRICS_SCHEMA)
    return spark.read.schema(METRICS_SCHEMA).parquet(path)


def completed_waves(spark: SparkSession, root: str, run_id: str, stage: str) -> set[int]:
    rows = (
        read_lineage(spark, root)
        .filter(
            (F.col("run_id") == run_id)
            & (F.col("stage") == stage)
            & (F.col("status") == "done")
        )
        .select("partition_id")
        .collect()
    )
    return {int(r["partition_id"]) for r in rows}


def run_stage(
    spark: SparkSession,
    input_df: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    root: str,
    run_id: str,
    stage: str,
    key_col: str = "clip_id",
    n_waves: int = 8,
    extra_metrics: Callable[[DataFrame], dict[str, float]] | None = None,
) -> DataFrame:
    """Process input in W checkpointed waves; resume skips completed
    waves. Returns the stage's full output DataFrame (all waves).

    stage_fn must be a narrow-or-shuffling transform whose output still
    carries `key_col` (used only for wave assignment bookkeeping)."""
    out_dir = os.path.join(root, stage)
    done = completed_waves(spark, root, run_id, stage)
    waved = input_df.withColumn(
        "_wave", F.pmod(F.hash(F.col(key_col)), F.lit(n_waves)).cast("int")
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    for w in range(n_waves):
        if w in done:
            continue
        t0 = time.time()
        wave_in = waved.filter(F.col("_wave") == w).drop("_wave")
        in_rows = wave_in.count()
        out = stage_fn(wave_in).withColumn("_wave", F.lit(w))
        out.write.mode("overwrite").partitionBy("_wave").parquet(out_dir)
        out_rows = (
            spark.read.parquet(out_dir).filter(F.col("_wave") == w).count()
        )
        t1 = time.time()
        lineage_row = [(run_id, stage, w, in_rows, out_rows, t0, t1, "done")]
        spark.createDataFrame(lineage_row, LINEAGE_SCHEMA).write.mode("append").parquet(
            _lineage_dir(root)
        )
        metrics = {
            "rows_per_sec": (out_rows / max(t1 - t0, 1e-9)),
            "input_rows": float(in_rows),
            "output_rows": float(out_rows),
        }
        if extra_metrics is not None:
            metrics.update(extra_metrics(spark.read.parquet(out_dir).filter(F.col("_wave") == w)))
        mrows = [(run_id, stage, w, k, float(v)) for k, v in metrics.items()]
        spark.createDataFrame(mrows, METRICS_SCHEMA).write.mode("append").parquet(
            _metrics_dir(root)
        )

    return spark.read.parquet(out_dir).drop("_wave")
