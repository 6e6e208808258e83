"""Similarity search over embedding columns (array<float>).

Two paths:
  brute_force_topk  exact cosine top-k per query via join + window —
                    the correctness baseline (SQL-expressible);
  lsh_topk          random-hyperplane LSH buckets (sign bits of dot
                    products with seeded planes) -> candidates joined
                    on bucket key -> exact rerank. The scale path:
                    shuffle carries (bucket, id) not vectors; probes
                    multiple bucket permutations for recall.

Also embedding-cosine near-dup pairs (threshold variant) for dedup.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def brute_force_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    qid: str = "query_id",
    cid: str = "neighbor_id",
    qv: str = "qv",
    cv: str = "cv",
) -> DataFrame:
    sim = F.round(
        cosine_similarity(F.col(qv).cast("array<double>"), F.col(cv).cast("array<double>")),
        6,
    )
    pairs = queries.crossJoin(candidates).select(qid, cid, sim.alias("sim"))
    w = Window.partitionBy(qid).orderBy(F.desc("sim"), F.asc(cid))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def _plane_matrix(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, size=(n_planes, dim)).astype(np.float32).tolist()


def lsh_bucket_col(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Sign-bit bucket key from dot products with literal hyperplanes —
    pure built-in expressions (zip_with/aggregate), JVM-evaluated."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col).cast("array<double>"), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    qid: str = "query_id",
    cid: str = "neighbor_id",
    qv: str = "qv",
    cv: str = "cv",
) -> DataFrame:
    """Approximate top-k: union of n_tables independent LSH bucketings,
    exact cosine rerank on the bucket-colliding candidates."""
    cand_parts = []
    q_parts = []
    for t in range(n_tables):
        planes = _plane_matrix(dim, n_planes, seed + 1000 * t)
        key = F.concat(F.lit(f"t{t}:"), lsh_bucket_col(cv, planes)).alias("bkey")
        cand_parts.append(candidates.select(cid, F.col(cv), key))
        qkey = F.concat(F.lit(f"t{t}:"), lsh_bucket_col(qv, planes)).alias("bkey")
        q_parts.append(queries.select(qid, F.col(qv), qkey))
    cand_all = cand_parts[0]
    for p in cand_parts[1:]:
        cand_all = cand_all.unionByName(p)
    q_all = q_parts[0]
    for p in q_parts[1:]:
        q_all = q_all.unionByName(p)
    hits = q_all.join(cand_all, "bkey").select(qid, qv, cid, cv).distinct()
    sim = F.round(
        cosine_similarity(F.col(qv).cast("array<double>"), F.col(cv).cast("array<double>")),
        6,
    )
    w = Window.partitionBy(qid).orderBy(F.desc("sim"), F.asc(cid))
    return (
        hits.select(qid, cid, sim.alias("sim"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, sim >= t).
    Brute force for bounded inputs; at scale route through lsh buckets
    first (same rerank expression)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    sim = F.round(
        cosine_similarity(F.col("va").cast("array<double>"), F.col("vb").cast("array<double>")),
        6,
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )
