"""Input fan-out guard for compute-heavy narrow stages.

A DataFrame read from a single small parquet file arrives as ONE partition,
so any expensive per-row stage (K minhash permutations, hyperplane
signatures, Arrow-batched extraction) runs on one core no matter how many
the cluster has. ``fan_out`` repartitions such under-partitioned inputs to
the session's default parallelism; at scale the source already has at least
as many splits as cores and this is a metadata check only — it never
shuffles a large corpus just to please small inputs.

Small inputs are normalized to default parallelism in BOTH directions on
purpose: a tiny input fragmented across hundreds of partitions pays
per-task overhead for nothing, and the expensive stage downstream wants
exactly one task per core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: inputs below this size are assumed to scan into fewer splits than the
#: cluster has cores (one spark.sql.files.maxPartitionBytes worth of data)
_SMALL_INPUT_BYTES = 128 * 1024 * 1024

#: plans without file statistics report spark.sql.defaultSizeInBytes
#: (Long.MaxValue) — anything this large is a "stats unknown" sentinel,
#: not a measurement
_UNKNOWN_SIZE_FLOOR = 1 << 62


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate, or None when unavailable.

    ``queryExecution().optimizedPlan().stats()`` is a private PySpark
    surface (`_jdf`): guard it so an upgrade that drops the attribute
    degrades fan_out to its fallback probe instead of crashing every
    pipeline, and treat the defaultSizeInBytes sentinel (returned for
    post-join/aggregate and LogicalRDD plans with no file statistics) as
    unknown rather than "huge"."""
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 - private API drift must not crash plans
        return None
    if size < 0 or size >= _UNKNOWN_SIZE_FLOOR:
        return None
    return size


def fan_out(df: DataFrame, *hash_cols: str) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism when its
    input is small enough to scan into fewer splits; no-op otherwise. Pass
    key column(s) for a deterministic hash repartition (recommended);
    without keys Spark uses round-robin.

    The decision reads the optimizer's size statistics (file-listing
    based) instead of ``df.rdd.getNumPartitions()``: translating the plan
    to an RDD runs full physical planning + DAG construction per call,
    which showed up as sub-second per-query regressions in benchmarks. The
    partition-count probe remains as the FALLBACK for the rare plans with
    no usable size statistic (post-join/aggregate stages, localCheckpoint
    outputs, private-API drift) — there the narrow-input hazard the probe
    catches outweighs its planning cost.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is None:
        try:
            if df.rdd.getNumPartitions() >= target:
                return df
        except Exception:  # noqa: BLE001 - fallback failure -> pass-through
            return df
    elif size >= _SMALL_INPUT_BYTES:
        return df
    if hash_cols:
        return df.repartition(target, *[F.col(c) for c in hash_cols])
    return df.repartition(target)
