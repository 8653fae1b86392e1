"""Deterministic job-count evidence for the store engines: run one
steady-state MERGE / DELETE / UPSERT / dedup-index / ANN call against a
small scratch store and print the number of Spark jobs each scheduled.
Job counts are plan-shape facts (not timings), so before/after pairs of
this script are comparable across hosts.

Usage: python scripts/count_engine_jobs.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import functions as F  # noqa: E402

from wcdimportbot_spark import get_spark  # noqa: E402
from wcdimportbot_spark.operators import sinks  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="count-engine-jobs")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup() or []
        return max(ids) if ids else 0

    def items(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("h"), F.col("id")).alias("hash"),
            F.concat(F.lit("Q"), F.col("id")).alias("qid"),
            F.lit("website").alias("instance_of"),
        )

    base = tempfile.mkdtemp(prefix="wcd-jobcount-")
    results = {}
    try:
        store = os.path.join(base, "items")
        # warmup + bootstrap (not counted: first-write path)
        sinks.merge_write_items(spark, items(0, 50), store)

        j0 = jobs()
        sinks.merge_write_items(spark, items(20, 120), store)
        results["merge_steady"] = jobs() - j0

        j0 = jobs()
        sinks.merge_write_items(spark, items(0, 100), store)  # all dups
        results["merge_noop"] = jobs() - j0

        doomed = spark.createDataFrame(
            [(f"h{i}",) for i in range(15)], "hash string"
        )
        j0 = jobs()
        n = sinks.delete_from_store(
            spark, doomed, store, key="hash", bucket_key="hash",
            partitions=["instance_of", sinks.BUCKET_COL],
        )
        results["delete_steady"] = jobs() - j0
        assert n == 15, n

        up = items(100, 140).withColumn("qid", F.lit("QX"))
        j0 = jobs()
        res = sinks.upsert_into_store(
            spark, up, store, key="hash", bucket_key="hash",
            partitions=["instance_of", sinks.BUCKET_COL],
        )
        results["upsert_steady"] = jobs() - j0
        assert res == {"updated": 20, "inserted": 20}, res

        # dedup index: probe + merge + delete through the curation loop
        from wcdimportbot_spark.plans import curation_nightly as cn

        docs = spark.range(0, 60).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.lit("the quick brown fox jumps over the lazy dog "),
                F.lit("document body number "),
                F.col("id").cast("string"),
                F.lit(" with enough distinct words to score well and "
                      "pass the quality gate easily in every language "
                      "profile considered here today"),
            ).alias("text"),
        )
        cbase = os.path.join(base, "cur")
        cn.curate_increment(docs.filter(F.col("doc_id") < 30), cbase)
        j0 = jobs()
        cn.curate_increment(docs, cbase)
        results["curate_increment_steady"] = jobs() - j0

        doomed_hashes = (
            cn.read_curated_corpus(spark, cbase)
            .select("text_hash")
            .limit(5)
        )
        j0 = jobs()
        cn.purge_documents(spark, doomed_hashes.localCheckpoint(), cbase)
        results["purge_documents"] = jobs() - j0

        # ANN build + retrain (r16: the assigned relation materializes
        # once — job count drops by the re-run assign passes)
        from wcdimportbot_spark.operators import ann_store as ann

        emb = spark.range(0, 400).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: ((F.col("id") * 31 + i) % 97).cast("double")
                / 97.0,
            ).alias("embedding"),
        )
        ann_base = os.path.join(base, "ann")
        j0 = jobs()
        ann.ann_index_build(emb, ann_base)
        results["ann_build"] = jobs() - j0
        j0 = jobs()
        ann.ann_retrain(emb, ann_base)
        results["ann_retrain"] = jobs() - j0
    finally:
        shutil.rmtree(base, ignore_errors=True)

    for k, v in results.items():
        print(f"{k:28s} {v} jobs")


if __name__ == "__main__":
    main()
