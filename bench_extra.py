#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual catalog
queries with either the bench's .count() action (comparable to
bench.py / the driver) or a noop sink (forces every column), labels
jobs for the UI, and can dump .explain("formatted") plans.

NOT part of the driver contract — bench.py stays the frozen harness.

Usage:
  python bench_extra.py q_audio_fingerprint q_lsh_neardup \
      [--sf /root/testdata/sf1.0] [--action count|noop] [--passes 2] \
      [--explain plans/r06 --suffix before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--action", default="count", choices=["count", "noop"])
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--explain", default=None, help="dir to write <q>_<suffix>.txt plans")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()

    from ds2_spark import queries_catalog
    from ds2_spark.session import get_spark

    spark = get_spark(app_name="ds2_bench_extra")
    qs = dict(queries_catalog.queries())
    # bench override twin (frozen in bench.py; re-created here so the
    # arrow verify path can be isolated too)
    import bench as _bench

    qs.update(_bench.OVERRIDES)

    if not args.no_warmup:
        qs["q_tpch_q1"](spark, args.sf).count()

    def run(df):
        if args.action == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    per_pass: list[dict[str, float]] = []
    for _ in range(args.passes):
        p: dict[str, float] = {}
        for name in args.queries:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            run(qs[name](spark, args.sf))
            p[name] = round(time.time() - t0, 3)
            spark.sparkContext.setJobDescription(None)
        per_pass.append(p)

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for name in args.queries:
            df = qs[name](spark, args.sf)
            path = os.path.join(args.explain, f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    out = {
        "sf_dir": args.sf,
        "action": args.action,
        "min": {n: min(p[n] for p in per_pass) for n in per_pass[0]},
        "passes": per_pass,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
