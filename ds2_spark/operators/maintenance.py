"""Table-maintenance planning — the small-file compaction problem.

A 10^12-row Iceberg table accretes small files at every streaming
commit and every skewed write (the north rule's checkpoint tables
included); scan cost then degrades with file COUNT, not byte size
(per-file open/footer/seek dominates). Engines fix it by rewriting
groups of small files into target-size ones (Iceberg's
`rewrite_data_files`, Delta OPTIMIZE). The expensive part is the
rewrite; the PLAN — which files go into which output group — is a
cheap deterministic relational job, and it is what this module
computes (the executor loop then rewrites one group per task).

Plan shape: within each table partition, take files smaller than
`small_bytes` (already-compact files are left alone), order them by
file id (stable, resume-safe — NOT by size: a size order changes
whenever any file changes), and cut the running byte total into bins
of `target_bytes`:

    grp = (cumsum_bytes - size) div target_bytes

i.e. a file joins the group its START offset falls in, so every
group's byte total lands within one small-file size of the target
(the final partial group may be smaller) — the byte-offset variant
of greedy fill, chosen because it is a single window expression with
no running carried state. All arithmetic is
int64 bytes, so the plan replays bit-identically in SQL (the oracle
recomputes it with a window cumsum), and the single shuffle is the
per-partition window sort over the SMALL-FILE manifest only — a
manifest row is ~3 scalars, so even a billion-file table plans in one
tiny job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    small_bytes: int | None = None,
    file_id: str = "file_id",
    size_col: str = "size_bytes",
    partition_cols: tuple[str, ...] = (),
) -> DataFrame:
    """File manifest -> compaction groups.

    manifest: one row per data file with an id, its byte size, and
    optional table-partition columns (groups never span partitions —
    a rewrite must not move rows across partition boundaries).
    small_bytes: only files strictly smaller participate (default:
    target_bytes — a file at target size is already compact).

    Output, one row per participating file: the partition columns,
    file_id, size_bytes, grp (0-based within partition), plus
    group_files / group_bytes audit columns. A group with one file
    and group_bytes >= target is possible only for the partition's
    final partial group meeting a large small-file; callers may skip
    single-file groups (rewriting one file is a no-op).
    """
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    small = target_bytes if small_bytes is None else small_bytes
    parts = list(partition_cols)
    eligible = manifest.select(
        *parts,
        F.col(file_id),
        F.col(size_col).cast("bigint").alias(size_col),
    ).where(F.col(size_col) < small)
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(file_id))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = eligible.withColumn(
        "_cum", F.sum(size_col).over(w)
    ).withColumn(
        # exact integer division: a double `/` + cast can round across
        # an integer boundary on large byte totals (NOTES.md #51)
        "grp",
        F.expr(f"(_cum - {size_col}) div {int(target_bytes)}"),
    )
    gw = Window.partitionBy(*parts, "grp")
    return binned.select(
        *parts,
        file_id,
        size_col,
        "grp",
        F.count("*").over(gw).alias("group_files"),
        F.sum(size_col).over(gw).alias("group_bytes"),
    )
