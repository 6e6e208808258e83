#!/usr/bin/env python
"""spark-submit entry point for the quality-filter pipeline.

Ships unchanged at any parallelism (north_rule):

  spark-submit --master local[8]  --py-files dist/ds2_spark.zip \
      run_pipeline.py --clips fx/clips.parquet --scores fx/scores.parquet \
      --out /tmp/out --checkpoint /tmp/ckpt

Prints exactly one JSON line with row counts, keep stats, and
throughput (clips/sec) — the measurement unit of BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", required=True)
    ap.add_argument("--scores", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--rater", default="rater_a")
    ap.add_argument("--budget-frac", type=float, default=0.05)
    ap.add_argument("--hoc-rounds", type=int, default=20)
    ap.add_argument("--vote-epochs", type=int, default=21)
    ap.add_argument("--sample-size", type=int, default=20000)
    ap.add_argument("--embed-dim", type=int, default=128)
    ap.add_argument("--waves", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()  # configured by spark-submit
    spark.sparkContext.setLogLevel("WARN")

    from ds2_spark.config import (
        HocConfig,
        PipelineConfig,
        SelectionConfig,
        VoteConfig,
    )
    from ds2_spark.plans.curation import curation_pipeline

    cfg = PipelineConfig(
        hoc=HocConfig(rounds=args.hoc_rounds, sample_size=args.sample_size),
        vote=VoteConfig(epochs=args.vote_epochs, sample_size=args.sample_size),
        selection=SelectionConfig(budget_frac=args.budget_frac),
        embed_dim=args.embed_dim,
    )
    clips = spark.read.parquet(args.clips)
    scores = spark.read.parquet(args.scores)
    n_clips = clips.count()

    t0 = time.time()
    res = curation_pipeline(
        spark,
        clips,
        scores,
        cfg,
        rater=args.rater,
        checkpoint_root=args.checkpoint,
        run_id=args.run_id,
        n_waves=args.waves,
    )
    decisions = res["decisions"]
    decisions.write.mode("overwrite").parquet(args.out)
    elapsed = time.time() - t0

    kept = spark.read.parquet(args.out).filter("keep").count()
    print(
        json.dumps(
            {
                "n_clips": n_clips,
                "kept": kept,
                "budget": res["budget"],
                "pool_size": res["pool_size"],
                "elapsed_sec": round(elapsed, 3),
                "clips_per_sec": round(n_clips / max(elapsed, 1e-9), 2),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
