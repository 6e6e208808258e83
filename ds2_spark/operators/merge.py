"""Last-writer-wins MERGE / upsert (CDC apply) over keyed tables.

The batch-parquet twin of Iceberg's ``MERGE INTO`` (this container has
no Iceberg jars — see sources/iceberg.py for the same
fallback-with-identical-semantics policy): apply a changelog of
upserts and deletes to a base snapshot, keeping per key the row with
the highest version; tombstones remove the key entirely. This is how
a 10^12-row corpus absorbs incremental re-crawls / re-scores without
rewriting itself — the pipeline's checkpoint tables (sources/lineage)
already use dynamic partition overwrite; this operator is the keyed
row-level complement.

Determinism contract: versions are caller-supplied monotonic integers
(an event id, a commit sequence — never wall-clock floats), ties
between a base row and an update at the SAME version resolve to the
update, and the whole reduction is one hash-partition shuffle on the
key followed by a window rank — no collect, no RNG, resume-stable.

Scale shape at 10^12 rows: unionByName is a zero-shuffle concat; the
only exchange is the partitionBy(key) for the rank. With the base
stored bucketed by key the exchange drops to the changelog side only.
Per-key state is the rows of that key alone (no global ordering), so
skewed keys are bounded by their own change count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Apply ``updates`` (upserts + optional tombstones) onto ``base``.

    Both inputs must share a schema (plus the optional boolean
    ``delete_col`` on updates; absent on base it is filled false).
    Returns the merged snapshot: per key the highest-version row,
    updates winning version ties against base; keys whose winning row
    is a tombstone are dropped. Adds ``n_versions`` (rows seen for the
    key, base included) for audit.

    Determinism requires versions to be UNIQUE per key within the
    changelog (a CDC sequence number / commit id gives this for free);
    two updates to one key at the same version have no defined winner
    and resolve arbitrarily — validate upstream if the source can
    emit such ties."""
    b = base.withColumn("_src", F.lit(0))
    u = updates.withColumn("_src", F.lit(1))
    if delete_col is None:
        delete_col = "_is_delete"
        u = u.withColumn(delete_col, F.lit(False))
    if delete_col not in b.columns:
        b = b.withColumn(delete_col, F.lit(False))
    all_rows = b.unionByName(u)
    win = Window.partitionBy(key).orderBy(
        F.desc(version_col), F.desc("_src")
    )
    counted = Window.partitionBy(key)
    return (
        all_rows.withColumn("_rn", F.row_number().over(win))
        .withColumn("n_versions", F.count("*").over(counted))
        .where((F.col("_rn") == 1) & (~F.col(delete_col)))
        .drop("_rn", "_src", delete_col)
    )
