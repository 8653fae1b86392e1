"""Capture .explain("formatted") for registry rows into plans/$WCD_PLANS_ROUND (default r16)..

Usage: python scripts/explain_row.py before|after ROW [ROW...]

Lifecycle/scenario rows return a localCheckpoint whose plan is trivial —
this script is for the pure-query rows whose returned DataFrame is the
computation being timed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    rows = sys.argv[2:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("WCD_PLANS_ROUND", "r16"))
    os.makedirs(outdir, exist_ok=True)

    from wcdimportbot_spark import get_spark
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    spark = get_spark(app_name="wcd-explain")
    for name in rows:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
