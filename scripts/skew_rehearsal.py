"""Skewed-corpus rehearsal: prove the skew primitives WIN on a hot-key
corpus, not merely that they equal the unsalted plans on uniform data
(VERDICT r5 next-round item #6; results recorded in SCALE.md §Round 6).

Corpus: a deterministic Zipf-ish events variant built from the sf1
rehearsal corpus (scripts/gen_sf1.py) — events replicated ``K``=16 times
(16M rows), with ONE user owning half of all rows and the rest spread
uniformly over 100k users, and a per-row distinct payload value so the
hot user's distinct-value state is 8M entries. No RNG: user and value
are hash/arithmetic functions of (event_id, replica).

Measured (3 iterations each, min reported, GC between; every
measurement collects a checksum over the aggregate column — ``.count()``
on a groupBy would let Catalyst prune the aggregate expressions and the
skewed state would never be built):

1. per-user distinct state, three ways: built-in ``count(DISTINCT)``
   (Catalyst's two-phase rewrite shuffles the dedup on (user, value) —
   ALREADY skew-safe, recorded as the honest baseline), ``collect_set``
   (a holistic aggregate the rewrite cannot decompose — the hot user's
   full 8M-entry set merges in ONE reducer task; AQE splits skewed JOIN
   partitions, not aggregate state), and
   functions/skew.py:salted_distinct_count (16 disjoint salt groups).
2. events ⋈ user-dim on the skewed user key with broadcast disabled
   (the neither-side-broadcasts case) — AQE-skew-join sort-merge vs
   replicate_salted_join.

Usage: python scripts/skew_rehearsal.py  (builds /root/repo/.sf1/
events_skewed.parquet on first run, ~200 MB)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from wcdimportbot_spark import get_spark
from wcdimportbot_spark.functions.skew import (
    replicate_salted_join,
    salted_distinct_count,
)

SF1 = "/root/repo/.sf1"
SKEWED = f"{SF1}/events_skewed.parquet"
K = 16  # replication of the 1M-row sf1 events table
N_COLD_USERS = 100_000
HOT_MOD = 2  # hot user owns 1/HOT_MOD of all rows


def build(spark) -> None:
    if os.path.exists(SKEWED):
        return
    ev = spark.read.parquet(f"{SF1}/events.parquet").select("event_id")
    rep = ev.withColumn("replica", F.explode(F.sequence(F.lit(0), F.lit(K - 1))))
    rid = F.col("event_id") * K + F.col("replica")
    skewed = rep.select(
        rid.alias("row_id"),
        # 1/HOT_MOD of rows -> one hot user; rest uniform over 100k cold users
        F.when(rid % HOT_MOD == 0, F.lit("hot_user"))
        .otherwise(
            F.concat(F.lit("u"), F.pmod(F.xxhash64(rid), F.lit(N_COLD_USERS)))
        )
        .alias("user"),
        # distinct per row -> the hot user's distinct-state is ~K*N/5 values
        F.md5(rid.cast("string")).alias("value"),
    )
    skewed.repartition(32).write.mode("overwrite").parquet(SKEWED)


def timed(label, fn, iters=3):
    spark = get_spark()
    best = None
    for _ in range(iters):
        spark.catalog.clearCache()
        try:
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass
        t0 = time.time()
        n = fn()
        t = time.time() - t0
        best = t if best is None else min(best, t)
    print(f"{label:48s} {best:7.2f}s  (rows={n})", flush=True)
    return best


def main() -> None:
    spark = get_spark(app_name="skew-rehearsal")
    build(spark)
    ev = spark.read.parquet(SKEWED)
    total = ev.count()
    hot = ev.filter(F.col("user") == "hot_user").count()
    print(f"corpus: {total} rows, hot user holds {hot} ({100*hot/total:.1f}%)")

    # --- 1. per-user distinct state ------------------------------------
    # (a) built-in count(DISTINCT): Catalyst's two-phase rewrite already
    #     shuffles the dedup on (user, value), so the hot key's SET never
    #     builds in one task — an honest finding: for plain distinct
    #     counts the optimizer is already skew-safe.
    # every measurement returns a CHECKSUM over the aggregate column:
    # .count() on a groupBy would let Catalyst prune the aggregate
    # expressions entirely (group keys suffice for a row count), and the
    # skewed state would never be built
    def builtin_distinct():
        return (
            ev.groupBy("user")
            .agg(F.count_distinct("value").alias("n_distinct"))
            .agg(F.sum("n_distinct"))
            .collect()[0][0]
        )

    # (b) the melt case the salt exists for: a HOLISTIC aggregate whose
    #     state cannot be decomposed by the rewrite — collect_set merges
    #     the hot user's full 1.6M-entry set in ONE reducer task.
    def holistic_set():
        return (
            ev.groupBy("user")
            .agg(F.size(F.collect_set("value")).alias("n_distinct"))
            .agg(F.sum("n_distinct"))
            .collect()[0][0]
        )

    # (c) salted two-phase: per-salt disjoint partial sets, then SUM.
    def salted():
        return (
            salted_distinct_count(ev, ["user"], "value", buckets=16)
            .agg(F.sum("n_distinct"))
            .collect()[0][0]
        )

    t_b = timed("distinct-count built-in (Catalyst 2-phase)", builtin_distinct)
    t_u = timed("distinct via collect_set (hot key -> 1 task)", holistic_set)
    t_s = timed("distinct-count salted x16", salted)

    # sanity: identical results on the hot key
    a = (
        ev.groupBy("user")
        .agg(F.count_distinct("value").alias("n"))
        .filter(F.col("user") == "hot_user")
        .collect()[0]["n"]
    )
    b = (
        salted_distinct_count(ev, ["user"], "value", buckets=16)
        .filter(F.col("user") == "hot_user")
        .collect()[0]["n_distinct"]
    )
    assert a == b, (a, b)
    print(f"hot-user distinct values: {a} (salted == unsalted)")

    # --- 2. skewed join, broadcast disabled ----------------------------
    dim = spark.range(N_COLD_USERS + 1).select(
        F.when(F.col("id") == N_COLD_USERS, F.lit("hot_user"))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("user"),
        (F.pmod(F.col("id"), F.lit(7))).alias("segment"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:

        def join_aqe():
            return (
                ev.join(dim, "user")
                .groupBy("segment")
                .agg(F.count("*").alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

        def join_salted():
            return (
                replicate_salted_join(ev, dim, "user", buckets=16)
                .groupBy("segment")
                .agg(F.count("*").alias("n"))
                .agg(F.sum("n"))
                .collect()[0][0]
            )

        t_ja = timed("skewed join sort-merge + AQE skew-join", join_aqe)
        t_js = timed("skewed join replicate-salted x16", join_salted)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    print(
        f"\nsummary: salted vs holistic(collect_set) = {t_s/t_u:.2f}x, "
        f"salted vs built-in countDistinct = {t_s/t_b:.2f}x, "
        f"join salted/AQE = {t_js/t_ja:.2f}x"
    )


if __name__ == "__main__":
    main()
