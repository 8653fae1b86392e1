"""Skew-handling primitives: salted aggregation and replicate-salted join.

AQE (enabled in ``session.get_spark``) already splits skewed sort-merge
join partitions at runtime. These helpers cover the cases AQE cannot:

- **hot-key aggregations whose state does not combine map-side** —
  ``count(DISTINCT v)`` / ``collect_set`` keep the full value set per key,
  so one hot key melts a single reducer no matter how partial aggregation
  is configured. :func:`salted_distinct_count` splits each key's values
  across ``buckets`` disjoint salt groups (salt is derived from the VALUE,
  so the same value always lands in the same group — partial distinct
  counts are disjoint and their SUM is exact, not approximate);
- **hot-key joins where neither side broadcasts** —
  :func:`replicate_salted_join` spreads the big side's hot keys across
  ``buckets`` salt values and replicates the other side once per salt, so
  one key's rows land on ``buckets`` reducers instead of one. Replication
  multiplies the small side ``buckets``× — use only when it is orders of
  magnitude smaller than the skewed side (else prefer AQE skew-join).

Used sparingly in this engine because its own hot keys are md5/xxhash64
(near-uniform by construction — SURVEY §4); the helpers exist for the
corpus-derived keys a training-data pipeline aggregates on (domains,
languages, users), where Zipf skew is the norm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_salt(value: Column, buckets: int) -> Column:
    """Deterministic salt from the aggregated value: every occurrence of a
    value gets the SAME salt, so per-salt distinct sets are disjoint."""
    return F.pmod(F.xxhash64(value), F.lit(buckets))


def salted_distinct_count(
    df: DataFrame,
    keys: list[str],
    value: str,
    buckets: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """EXACT distinct count per key, skew-safe.

    Phase 1 groups on (keys, salt(value)) — a hot key's state is split
    across ``buckets`` reducers, each holding a disjoint value subset.
    Phase 2 sums the per-salt counts (tiny: ``|keys| × buckets`` rows).
    Same result as ``groupBy(keys).agg(countDistinct(value))``; bounded
    per-task state instead of one task holding a hot key's full set."""
    partial = (
        df.withColumn("_salt", value_salt(F.col(value), buckets))
        .groupBy(*keys, "_salt")
        .agg(F.count_distinct(F.col(value)).alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(out_col))


def replicate_salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot ``key`` values and ``small`` is
    too big to broadcast: salt the skewed side by input partition, replicate
    the small side once per salt, join on (key, salt). The salt column is
    dropped from the result.

    ``spark_partition_id() % buckets`` spreads a hot key across as many
    salts as the partitions its rows occupy — deterministic for a given
    input partitioning, no RNG in the plan.

    Only join types that never emit unmatched SMALL-side rows are allowed:
    the small side is replicated ``buckets``×, so right/full/outer would
    duplicate every unmatched small-side row once per salt."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"replicate_salted_join supports inner/left/left_semi/left_anti, "
            f"got {how!r}: the replicated small side would emit unmatched "
            f"rows {buckets} times under {how}"
        )
    s = skewed.withColumn("_salt", F.pmod(F.spark_partition_id(), F.lit(buckets)))
    r = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return s.join(r, [key, "_salt"], how).drop("_salt")
