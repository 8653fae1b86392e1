"""Graph table sinks (S7-S10): partitioned parquet with MERGE semantics.

The cluster-grade sink is Delta/Iceberg ``MERGE INTO items ON hash`` (jars
not present in this image — SURVEY §7.4); these writers emulate the same
contract on plain parquet:

- ``items`` partitioned by ``instance_of`` → read-side type pruning (the
  statistics screen A1 and rinse U2 touch one partition per type);
- ``claims`` partitioned by ``property`` → property-usage queries (A2) and
  hash lookups (J2) scan only their partition;
- merge = insert-if-absent on the hash key (conflict-as-success S9: the
  existing row wins, mirroring ``crud/create.py:39-45``).

At 100 TB: add ``bucketBy(N, "hash")`` on a real metastore so re-import
anti-joins and MERGE co-locate without a shuffle; partition counts stay
bounded because ``instance_of`` has 3 values and ``property`` ~45.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_items(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    items.write.mode(mode).partitionBy("instance_of").parquet(path)


def write_claims(claims: DataFrame, path: str, mode: str = "overwrite") -> None:
    claims.write.mode(mode).partitionBy("property").parquet(path)


def read_items(spark: SparkSession, path: str) -> DataFrame:
    # the store paths are rewritten in place; drop any stale file-listing
    # cache a long-lived session may hold for them
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def read_claims(spark: SparkSession, path: str) -> DataFrame:
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def merge_items(
    spark: SparkSession, new_items: DataFrame, path: str
) -> DataFrame:
    """S9 — insert-if-absent by hash; existing items keep their row
    (conflict-as-success). Returns the merged table (caller re-writes).

    Delta form: MERGE INTO items USING new ON items.hash = new.hash
    WHEN NOT MATCHED THEN INSERT *."""
    deduped = new_items.dropDuplicates(["hash"])
    if os.path.exists(path):
        existing = read_items(spark, path)
        fresh = deduped.join(existing.select("hash"), "hash", "left_anti")
        merged = existing.unionByName(fresh)
    else:
        merged = deduped
    return merged


def write_rejects(rejects: DataFrame, base_path: str) -> None:
    """S11 — one directory per rule (the reference's per-rule log files),
    written in a single partitioned pass (badRecordsPath pattern)."""
    rejects.write.mode("append").partitionBy("rule").parquet(base_path)
