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

#: inputs below this size are assumed to scan into fewer splits than the
#: cluster has cores (one spark.sql.files.maxPartitionBytes worth of data)
_SMALL_INPUT_BYTES = 128 * 1024 * 1024


def fan_out(df: DataFrame, *hash_cols: str) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism when its
    input is small enough to scan into fewer splits; no-op otherwise. Pass
    key column(s) for a deterministic hash repartition (recommended);
    without keys Spark uses round-robin.

    The decision reads the optimizer's size statistics (file-listing
    based) instead of ``df.rdd.getNumPartitions()``: translating the plan
    to an RDD runs full physical planning + DAG construction per call,
    which showed up as sub-second per-query regressions in benchmarks.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    if size < _SMALL_INPUT_BYTES:
        if hash_cols:
            return df.repartition(target, *[F.col(c) for c in hash_cols])
        return df.repartition(target)
    return df
