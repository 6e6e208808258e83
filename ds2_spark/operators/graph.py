"""Iterative graph scoring: integer fixed-point PageRank.

Why an engine like this needs it: link/citation/co-occurrence graphs
over a training corpus (doc -> quoted doc, page -> linked page) feed
quality priors — PageRank-style centrality is the classic one. The
operator demonstrates the second iterative-algorithm shape next to
connected components (operators/dedup.connected_components): a
bounded loop of join + aggregate per round with `localCheckpoint()`
truncating the logical plan every round (NOTES.md #36 — without it
the optimizer cost grows exponentially with rounds).

Exactness contract: the usual float PageRank cannot be compared
cross-engine (sum order changes ulps), so the recurrence is INTEGER
fixed-point, deterministic to the last digit:

    contrib_t(u)  = rank_t(u) // outdeg(u)          (trunc; ranks >= 0)
    rank_{t+1}(v) = BASE + (DAMP_NUM * S) // DAMP_DEN
                    where S = sum of contrib_t(u) over in-edges u->v

with BASE = (SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN the teleport
mass at SCALE fixed-point. Every step is integer, so a DuckDB
recursive CTE replays the exact ranks after any number of rounds.
Dangling mass is dropped (ranks then sum below SCALE*n — documented,
standard in the non-redistributing formulation); nodes with no
in-edges hold BASE.

Scale shape at 10^9+ edges: per round ONE shuffle keyed by dst for
the contribution sum plus a keyed join ranks-x-outdeg; outdeg is
computed once up front. Rounds are a fixed small constant (10-20),
not data-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000
DAMP_NUM, DAMP_DEN = 85, 100
BASE = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN


def pagerank_int(edges: DataFrame, rounds: int = 5) -> DataFrame:
    """edges(src long, dst long) -> (node, rank) after `rounds`
    synchronous integer fixed-point iterations. Node set = every id
    appearing as src or dst; initial rank SCALE for all."""
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    edges = edges.select("src", "dst").localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    ranks = nodes.withColumn("rank", F.lit(SCALE).cast("long"))
    for _ in range(rounds):
        contrib = (
            ranks.join(outdeg, ranks.node == outdeg.src)
            .select(
                F.col("src"),
                F.expr("rank div outdeg").alias("contrib"),  # true
                # integer division (SQL `div`) — a double `/` + cast
                # could round across an integer boundary
            )
            .join(edges, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .select(
                "node",
                (
                    F.lit(BASE)
                    + F.expr(
                        "({0} * coalesce(s, 0L)) div {1}".format(
                            DAMP_NUM, DAMP_DEN
                        )
                    )
                )
                .cast("long")
                .alias("rank"),
            )
            .localCheckpoint()  # truncate the per-round plan (NOTES #36)
        )
    return ranks
