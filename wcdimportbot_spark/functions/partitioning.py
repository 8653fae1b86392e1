"""Input fan-out guard for compute-heavy narrow stages.

A DataFrame read from a single small parquet file arrives as ONE partition,
so any expensive per-row stage (K minhash permutations, hyperplane
signatures, Arrow-batched extraction) runs on one core no matter how many
the cluster has. ``fan_out`` repartitions such under-partitioned inputs to
the session's default parallelism; at scale the source already has at least
as many splits as cores and this is a metadata check only — it never
shuffles a large corpus just to please small inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, *hash_cols: str) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism when its
    input partitioning is narrower; no-op otherwise. Pass key column(s) for
    a deterministic hash repartition (recommended); without keys Spark uses
    round-robin."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        if hash_cols:
            return df.repartition(target, *[F.col(c) for c in hash_cols])
        return df.repartition(target)
    return df
