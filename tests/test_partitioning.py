"""fan_out guard behavior: stats-driven repartition, sentinel/failure
fallbacks (VERDICT r4 'what's wrong' #4, ADVICE r4 partitioning.py)."""

import pytest


from wcdimportbot_spark.functions import partitioning
from wcdimportbot_spark.functions.partitioning import fan_out


def test_small_input_fans_out_to_default_parallelism(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "k")
    assert fan_out(df, "k").rdd.getNumPartitions() == target


def test_sentinel_size_reads_as_unknown():
    # plans with no usable statistics report spark.sql.defaultSizeInBytes
    # (Long.MaxValue); that sentinel must read as "unknown" (-> partition-
    # count probe), not "huge" (-> a silent no-op on exactly the narrow
    # inputs fan_out exists for)
    class _Stats:
        def __init__(self, v):
            self._v = v

        def sizeInBytes(self):
            return self._v

    class _FakeDF:
        def __init__(self, v):
            self._v = v

        @property
        def _jdf(self):
            outer = self

            class _QE:
                def queryExecution(self):
                    return self

                def optimizedPlan(self):
                    return self

                def stats(self):
                    return _Stats(outer._v)

            return _QE()

    assert partitioning._plan_size_bytes(_FakeDF((1 << 63) - 1)) is None
    assert partitioning._plan_size_bytes(_FakeDF(-1)) is None
    assert partitioning._plan_size_bytes(_FakeDF(8000)) == 8000


def test_narrow_stats_unknown_falls_back_to_partition_count(spark, monkeypatch):
    df = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "k")
    monkeypatch.setattr(partitioning, "_plan_size_bytes", lambda _df: None)
    target = spark.sparkContext.defaultParallelism
    assert fan_out(df, "k").rdd.getNumPartitions() == target


def test_large_known_input_is_left_alone(spark, monkeypatch):
    df = spark.range(0, 1000, 1, 2).withColumnRenamed("id", "k")
    monkeypatch.setattr(partitioning, "_plan_size_bytes", lambda _df: 1 << 30)
    out = fan_out(df, "k")
    assert out is df


def test_small_but_wide_input_is_normalized(spark):
    # deliberate: a tiny input fragmented across many partitions is
    # coalesced down to default parallelism (per-task overhead for nothing)
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000, 1, target * 4).withColumnRenamed("id", "k")
    assert fan_out(df, "k").rdd.getNumPartitions() == target


def test_private_api_drift_degrades_to_passthrough(spark, monkeypatch):
    # simulate a PySpark upgrade dropping the _jdf stats surface AND the
    # RDD fallback: fan_out must return the input unchanged, never raise
    df = spark.range(0, 10, 1, 1).withColumnRenamed("id", "k")
    monkeypatch.setattr(partitioning, "_plan_size_bytes", lambda _df: None)
    # patch the concrete class (pyspark.sql.classic), not the base export
    monkeypatch.setattr(
        type(df), "rdd", property(lambda self: (_ for _ in ()).throw(RuntimeError))
    )
    out = fan_out(df, "k")
    assert out is df


def test_plan_size_handles_missing_attribute(spark, monkeypatch):
    df = spark.range(0, 10, 1, 1)
    # _jdf is an instance attribute; a class-level property shadows it
    monkeypatch.setattr(
        type(df),
        "_jdf",
        property(lambda self: (_ for _ in ()).throw(AttributeError)),
        raising=False,
    )
    assert partitioning._plan_size_bytes(df) is None
