"""Snapshot reconciliation (anti-entropy table diff).

At 10^12 rows you cannot "just diff" two table snapshots (a re-crawl
vs its predecessor, a replica vs its primary, a checkpoint vs a
recomputation) — and you also cannot trust they match without
checking. The standard shape is Merkle-style: compare BUCKET DIGESTS
first (tiny — thousands of integers per snapshot), then join rows
only inside buckets whose digests disagree. When the snapshots are
mostly equal (the common case for an anti-entropy sweep), the row
join touches a vanishing fraction of the data.

Determinism / portability contract (NOTES.md #7 hashing recipe):
  bucket(key)   = int(md5(key)[:12 hex], 16) % n_buckets
  row_digest    = int(md5(key || '|' || canonical row repr)[:12], 16)
  bucket digest = SUM(row_digest) as int64  (48-bit digests, so a
                  bucket would need ~2^15 rows per unit of headroom
                  loss — sums stay exact far past any real bucket)
Sum (not XOR) keeps the digest order-free AND multiset-sensitive
(XOR would cancel duplicate rows in pairs); both sides compute it
with identical string arithmetic, so DuckDB replays the digests
bit-for-bit.

`snapshot_diff` returns the row-level differences:
  status ∈ {added, removed, changed}  (b relative to a)
restricted to differing buckets — which equals the full diff, since
equal buckets contribute no differences (same digest sum is treated
as equal; a 48-bit-sum collision needs an adversarial payload, and
the oracle twin recomputes the same way so the contract cannot flap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, n_buckets: int) -> Column:
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, 12), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def _row_digest(key: Column, payload: Column) -> Column:
    h = F.md5(F.concat_ws("|", key.cast("string"), payload))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("long")


def _prep(df: DataFrame, key: str, cols: list[str], n_buckets: int) -> DataFrame:
    payload = F.concat_ws(
        ",", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return df.select(
        F.col(key),
        _bucket(F.col(key), n_buckets).alias("bucket"),
        _row_digest(F.col(key), payload).alias("digest"),
    )


def bucket_digests(
    df: DataFrame, key: str, cols: list[str], n_buckets: int = 4096
) -> DataFrame:
    """(bucket, n_rows, digest_sum) — the tiny Merkle summary of a
    snapshot; map-side combined, one shuffle of n_buckets rows."""
    return (
        _prep(df, key, cols, n_buckets)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("digest").alias("digest_sum"),
        )
    )


def snapshot_diff(
    a: DataFrame,
    b: DataFrame,
    key: str,
    cols: list[str],
    n_buckets: int = 4096,
) -> DataFrame:
    """Row-level diff of b vs a (added / removed / changed), computed
    Merkle-style: only buckets whose (n_rows, digest_sum) disagree are
    row-joined. Output: (key, bucket, status)."""
    pa_ = _prep(a, key, cols, n_buckets)
    pb = _prep(b, key, cols, n_buckets)
    da = bucket_digests(a, key, cols, n_buckets).withColumnRenamed(
        "n_rows", "na"
    ).withColumnRenamed("digest_sum", "sa")
    db = bucket_digests(b, key, cols, n_buckets).withColumnRenamed(
        "n_rows", "nb"
    ).withColumnRenamed("digest_sum", "sb")
    differing = (
        da.join(db, "bucket", "full_outer")
        .where(
            (F.col("na").isNull())
            | (F.col("nb").isNull())
            | (F.col("na") != F.col("nb"))
            | (F.col("sa") != F.col("sb"))
        )
        .select("bucket")
    )
    fa = pa_.join(F.broadcast(differing), "bucket")
    fb = pb.join(F.broadcast(differing), "bucket")
    joined = fa.alias("a").join(
        fb.alias("b"), F.col(f"a.{key}") == F.col(f"b.{key}"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col(f"a.{key}"), F.col(f"b.{key}")).alias(key),
        F.coalesce(F.col("a.bucket"), F.col("b.bucket")).alias("bucket"),
        F.when(F.col(f"a.{key}").isNull(), F.lit("added"))
        .when(F.col(f"b.{key}").isNull(), F.lit("removed"))
        .when(F.col("a.digest") != F.col("b.digest"), F.lit("changed"))
        .otherwise(F.lit("equal"))
        .alias("status"),
    ).where(F.col("status") != "equal")
