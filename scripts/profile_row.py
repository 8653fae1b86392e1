"""Profile one (or more) registry rows: wall time, Spark job count, and a
driver-side cProfile breakdown attributed to operator functions.

Usage:
    python scripts/profile_row.py ROW [ROW...] [--sf-dir DIR] [--runs N]

Driver-side cumulative time per operator function is a faithful proxy for
where the wall clock goes even though the work runs in the JVM: the driver
blocks in py4j under the call site that launched each job, so cumtime on
``merge_write_items`` etc. is that call's wall time.
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("rows", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from wcdimportbot_spark import get_spark
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    spark = get_spark(app_name="wcd-profile")
    sc = spark.sparkContext

    # warmup on a cheap query to amortize JVM/codegen startup
    QUERIES["q1_pricing_summary"].fn(spark, args.sf_dir).count()

    for name in args.rows:
        spec = QUERIES[name]
        for run in range(args.runs):
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
            tracker = sc.statusTracker()
            jobs_before = max(tracker.getJobIdsForGroup() or [0])
            pr = cProfile.Profile()
            t0 = time.time()
            pr.enable()
            df = spec.fn(spark, args.sf_dir)
            n = df.count()
            pr.disable()
            wall = time.time() - t0
            jobs_after = max(tracker.getJobIdsForGroup() or [0])
            print(f"\n===== {name} run{run+1}: {wall:.2f}s rows={n} "
                  f"spark_jobs~{jobs_after - jobs_before}")
            st = pstats.Stats(pr)
            st.sort_stats("cumulative")
            print("--- top operator/plan frames (cumtime) ---")
            st.print_stats(r"wcdimportbot_spark", args.top)
            print("--- top py4j/pyspark action frames ---")
            st.print_stats(r"pyspark/sql/(dataframe|readwriter|session)\.py", 15)


if __name__ == "__main__":
    main()
