"""Generate a local sf1-equivalent corpus (~6M lineitem) for the scale
rehearsal (SCALE.md §"sf0.1 → sf1 rehearsal").

The driver's generator is not in this repo, so sf1 is built as a
DETERMINISTIC 10x replication of the read-only sf0.1 tables with key
offsets — dimension tables stay fixed (the realistic shape of a scale-up:
facts grow, dims do not), fact/document/vector tables get disjoint key
ranges per replica. No RNG anywhere; re-running produces identical data.

Caveat recorded in SCALE.md: replicated documents share text bytes, so
self-join-style dedup queries see 10x duplicate groups — correct results,
but their OUTPUT size scales with the duplication structure, not the
engine; the near-linear assertion therefore runs on the clean basket.

Usage: python scripts/gen_sf1.py  (writes /root/repo/.sf1, ~0.5 GB)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wcdimportbot_spark import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.sf1"
K = 10
OFFSET = 10_000_000  # > any sf0.1 key; replicas get disjoint key ranges

DIMS = ["region", "nation", "customer", "supplier", "part"]
FACT_OFFSETS = {
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    spark = get_spark(app_name="gen-sf1")
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet"
        )
        print(f"{t}: copied", flush=True)
    for t, key_cols in FACT_OFFSETS.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        out = None
        for i in range(K):
            d = df
            for c in key_cols:
                d = d.withColumn(c, (F.col(c) + F.lit(i * OFFSET)).cast("long"))
            out = d if out is None else out.unionByName(d)
        out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
