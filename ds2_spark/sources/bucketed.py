"""Bucketed tables: pre-shuffled storage for shuffle-free joins/aggs.

At the 10^12-clip design point the expensive thing about an equi-join
or keyed aggregation is not the compute, it is the Exchange: every
consumer of `clip_id`-keyed data re-shuffles the full table. Bucketing
pays that shuffle ONCE at write time — rows are hash-partitioned into
a fixed number of buckets by the key and each bucket written sorted —
and every later join or aggregation whose key matches the bucket spec
reuses the stored distribution: Catalyst plans the join with NO
Exchange on the bucketed side(s) and (with sortBy) no Sort either.

This is the storage-layout counterpart to the engine's runtime
answers to the same problem (broadcast for small dims, salting for
skew, AQE for stragglers): bucketing is the right tool when BOTH
sides are too big to broadcast and the same join key is hit by many
downstream consumers — exactly the clips ⋈ scores ⋈ decisions shape
of this pipeline.

Operational notes, which are the part that bites at scale:
- Both sides must have the SAME bucket count (or a clean multiple
  with bucket coalescing enabled) and the join keys must cover the
  bucket columns, else Catalyst silently falls back to a full
  shuffle. `colocated_join` asserts the specs match up front so the
  fallback can't pass unnoticed.
- Bucket counts should be sized so one bucket ≈ one task's worth of
  data at the TARGET scale (10^12 rows / O(100k) buckets), never the
  test scale.
- Exchange elision works out of the box; SORT elision additionally
  needs one file per bucket (write_bucketed repartitions by the
  bucket column before a sorted write to guarantee it) AND
  `spark.sql.legacy.bucketedTableScan.outputOrdering=true` — Spark 3+
  distrusts stored order by default because multi-file buckets would
  silently break it. Both halves are pinned in tests/test_bucketed.py.
- Spark's bucketed format is hive-compatible hash bucketing; writes
  go through saveAsTable (the catalog records the spec — a bare
  parquet path loses it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Write `df` as a bucketed (and optionally per-bucket sorted)
    table registered in the session catalog at an explicit external
    `path`. Overwrites an existing table of the same name, so the
    call is idempotent for repeated runs."""
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if sort_col is not None:
        # one write task per bucket -> ONE FILE per bucket. With
        # multiple files per bucket Spark cannot trust the stored
        # order and re-inserts a per-task Sort at read time, which is
        # the half of the layout's payoff sortBy exists for.
        # (repartition's Murmur3 on the column matches the bucketing
        # hash, so each task holds exactly one bucket's rows.)
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    w = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def _bucket_spec(spark: SparkSession, table: str) -> tuple[list[str], int]:
    cat = spark._jsparkSession.catalog()
    t = spark._jsparkSession.sessionState().catalog().getTableMetadata(
        spark._jsparkSession.sessionState().sqlParser().parseTableIdentifier(table)
    )
    spec = t.bucketSpec()
    if spec.isEmpty():
        raise ValueError(f"table {table} is not bucketed")
    b = spec.get()
    cols = [str(c) for c in _scala_seq(b.bucketColumnNames())]
    _ = cat  # parity with the public-catalog route; metadata is authoritative
    return cols, int(b.numBuckets())


def _scala_seq(seq):
    it = seq.iterator()
    out = []
    while it.hasNext():
        out.append(it.next())
    return out


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key, refusing
    up front if the stored layouts cannot co-locate (different bucket
    counts, or join keys not covering the bucket columns) — the cases
    where Spark would silently re-shuffle both sides. The returned
    plan contains no Exchange on either side (pinned by pytest via
    the physical plan string)."""
    lcols, ln = _bucket_spec(spark, left_table)
    rcols, rn = _bucket_spec(spark, right_table)
    if ln != rn:
        raise ValueError(
            f"bucket counts differ ({left_table}: {ln}, {right_table}: "
            f"{rn}); co-located join would silently fall back to a "
            "full shuffle"
        )
    if not (set(lcols) <= set(on) and set(rcols) <= set(on)):
        raise ValueError(
            f"join keys {on} do not cover bucket columns "
            f"({left_table}: {lcols}, {right_table}: {rcols})"
        )
    return spark.table(left_table).join(spark.table(right_table), on, how)
