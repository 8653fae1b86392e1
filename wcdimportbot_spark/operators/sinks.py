"""Graph table sinks (S7-S10): hash-bucketed partitioned parquet with
incremental MERGE semantics.

The cluster-grade sink is Delta/Iceberg ``MERGE INTO items ON hash`` (jars
not present in this image — SURVEY §7.4); these writers emulate the same
contract on plain parquet:

- ``items`` partitioned by ``(instance_of, hb)`` where ``hb`` is a hash
  bucket of the identity key → read-side type pruning (A1/U2 touch one
  ``instance_of`` per type) AND write-side bucket pruning;
- ``claims`` partitioned by ``(property, hb)`` with ``hb`` from
  ``subject_qid`` → property queries (A2, J2) prune to their partition, and
  a subject's claims co-locate in one bucket;
- **incremental merge** (:func:`merge_write_items`,
  :func:`merge_write_claims`): only the buckets TOUCHED by the incoming
  batch are read, merged (insert-if-absent: conflict-as-success S9, the
  existing row wins, mirroring ``crud/create.py:39-45``), and rewritten via
  dynamic partition overwrite. Re-importing one page over an N-page store
  rewrites O(pages-in-batch) buckets, not the whole store — the plain-
  parquet equivalent of a MERGE touching only matching files.

Deletes (``--delete-page``, ``--rinse``) use the full-overwrite writers: a
dynamic overwrite cannot clear a partition that ends up empty, so deletion
correctness requires the static rewrite. Deletes are rare and explicitly
user-initiated; imports are the hot path.

At 100 TB: raise ``N_BUCKETS`` so a bucket fits an executor (the layout is
``O(types × buckets)`` directories, independent of data volume), or swap
the writers for Delta MERGE — the function contracts are unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: store-level hash-bucket fanout; sized so local test stores stay readable.
#: At 100 TB pick buckets ≈ store_size / executor-comfortable-chunk.
N_BUCKETS = 16

#: name of the bucket partition column (short to keep paths compact)
BUCKET_COL = "hb"


def with_bucket(df: DataFrame, key: str) -> DataFrame:
    """Attach the deterministic hash bucket for ``key`` (idempotent)."""
    if BUCKET_COL in df.columns:
        return df
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(N_BUCKETS))
    )


def _overwrite_dynamic(df: DataFrame, path: str, partitions: list[str]) -> None:
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partitions)
        .parquet(path)
    )


def _sorted_on(df: DataFrame, key: str) -> DataFrame:
    """Sort within output tasks on the lookup key: parquet row-group
    min/max statistics then prune point lookups (S6/J2) to one row group
    instead of scanning the bucket."""
    return df.sortWithinPartitions(key)


def write_items(items: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Full (static) overwrite — bootstrap and delete paths."""
    _sorted_on(with_bucket(items, "hash"), "hash").write.mode(mode).partitionBy(
        "instance_of", BUCKET_COL
    ).parquet(path)


def write_claims(claims: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Full (static) overwrite — bootstrap and delete paths."""
    _sorted_on(with_bucket(claims, "subject_qid"), "subject_qid").write.mode(
        mode
    ).partitionBy("property", BUCKET_COL).parquet(path)


def read_items(spark: SparkSession, path: str) -> DataFrame:
    # the store paths are rewritten in place; drop any stale file-listing
    # cache a long-lived session may hold for them
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def read_claims(spark: SparkSession, path: str) -> DataFrame:
    spark.catalog.refreshByPath(path)
    return spark.read.parquet(path)


def _touched_buckets(df: DataFrame) -> list[int]:
    return [r[BUCKET_COL] for r in df.select(BUCKET_COL).distinct().collect()]


def _partition_predicate(pairs, first_col: str):
    """OR of (first_col, hb) equality pairs — a driver-side list bounded by
    the import batch size, never the store size."""
    cond = F.lit(False)
    for a, b in pairs:
        cond = cond | ((F.col(first_col) == F.lit(a)) & (F.col(BUCKET_COL) == F.lit(b)))
    return cond


def merge_write_items(
    spark: SparkSession, new_items: DataFrame, path: str
) -> None:
    """S9 incremental MERGE — insert-if-absent by hash; existing items keep
    their row (conflict-as-success). Reads ONLY the hash buckets the new
    batch touches and rewrites ONLY the ``(instance_of, hb)`` partitions
    that actually gain rows; a re-import with nothing new writes nothing.

    Delta form: MERGE INTO items USING new ON items.hash = new.hash
    WHEN NOT MATCHED THEN INSERT *."""
    new_b = with_bucket(new_items.dropDuplicates(["hash"]), "hash")
    if not os.path.exists(path):
        write_items(new_b, path)
        return
    buckets = _touched_buckets(new_b)
    # hash determines the bucket, so an existing duplicate can only live in
    # the same bucket — pruning the anti-join probe to touched buckets is
    # exact, not approximate
    existing = read_items(spark, path).filter(F.col(BUCKET_COL).isin(buckets))
    fresh = new_b.join(existing.select("hash"), "hash", "left_anti").localCheckpoint(
        eager=True
    )
    pairs = [
        (r["instance_of"], r[BUCKET_COL])
        for r in fresh.select("instance_of", BUCKET_COL).distinct().collect()
    ]
    if not pairs:
        return
    merged = existing.filter(_partition_predicate(pairs, "instance_of")).unionByName(
        fresh
    )
    # materialize before overwriting partitions this plan reads from
    staged = merged.localCheckpoint(eager=True)
    _overwrite_dynamic(_sorted_on(staged, "hash"), path, ["instance_of", BUCKET_COL])


def merge_write_claims(
    spark: SparkSession, new_claims: DataFrame, path: str
) -> None:
    """Claim-level conflict-as-success, bucket-incrementally: a subject
    already in the store keeps its existing claim rows verbatim (first
    write wins, like the item row); only claims of NEW subjects are
    inserted, and only their ``(property, hb)`` partitions are rewritten.
    Never row-level dedup — claims differing only in qualifiers or
    value_quantity must both survive."""
    new_b = with_bucket(new_claims, "subject_qid")
    if not os.path.exists(path):
        write_claims(new_b, path)
        return
    buckets = _touched_buckets(new_b)
    # subject_qid determines the bucket: touched-bucket pruning is exact
    existing = read_claims(spark, path).filter(F.col(BUCKET_COL).isin(buckets))
    existing_subjects = existing.select("subject_qid").distinct()
    fresh = new_b.join(existing_subjects, "subject_qid", "left_anti").localCheckpoint(
        eager=True
    )
    pairs = [
        (r["property"], r[BUCKET_COL])
        for r in fresh.select("property", BUCKET_COL).distinct().collect()
    ]
    if not pairs:
        return
    merged = existing.filter(_partition_predicate(pairs, "property")).unionByName(fresh)
    staged = merged.localCheckpoint(eager=True)
    _overwrite_dynamic(
        _sorted_on(staged, "subject_qid"), path, ["property", BUCKET_COL]
    )


def merge_items(
    spark: SparkSession, new_items: DataFrame, path: str
) -> DataFrame:
    """In-memory MERGE twin (returns the merged table without writing):
    used where the caller needs the merged DataFrame itself. The persisted
    path should prefer :func:`merge_write_items`, which rewrites only
    touched buckets."""
    deduped = new_items.dropDuplicates(["hash"])
    if os.path.exists(path):
        existing = read_items(spark, path)
        fresh = deduped.join(existing.select("hash"), "hash", "left_anti")
        merged = existing.drop(BUCKET_COL).unionByName(fresh)
    else:
        merged = deduped
    return merged


def write_rejects(rejects: DataFrame, base_path: str) -> None:
    """S11 — one directory per rule (the reference's per-rule log files),
    written in a single partitioned pass (badRecordsPath pattern)."""
    rejects.write.mode("append").partitionBy("rule").parquet(base_path)
