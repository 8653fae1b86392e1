"""Skew-handling primitives: exactness and plan-shape checks."""

from pyspark.sql import functions as F

from wcdimportbot_spark.functions.skew import (
    replicate_salted_join,
    salted_distinct_count,
)


def _zipf_df(spark):
    """One pathologically hot key ('hot' has 5000 rows, 500 distinct
    values), plus uniform cold keys."""
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 500).alias("v")
    )
    cold = spark.range(2000).select(
        F.concat(F.lit("cold"), (F.col("id") % 20).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_distinct_count_is_exact(spark):
    df = _zipf_df(spark)
    expected = {
        (r["k"], r["n"])
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {
        (r["k"], r["n_distinct"])
        for r in salted_distinct_count(df, ["k"], "v", buckets=16).collect()
    }
    assert got == expected
    assert ("hot", 500) in got


def test_salted_distinct_splits_hot_key_state(spark):
    """Phase-1 output must hold the hot key on many reducers: ~buckets rows
    for 'hot', each with a disjoint share of the distinct values."""
    df = _zipf_df(spark)
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("v")), F.lit(16))
        )
        .groupBy("k", "_salt")
        .agg(F.count_distinct("v").alias("c"))
        .filter(F.col("k") == "hot")
        .collect()
    )
    assert len(partial) == 16
    assert sum(r["c"] for r in partial) == 500
    assert max(r["c"] for r in partial) < 500 / 2


def test_replicate_salted_join_matches_plain_join(spark):
    df = _zipf_df(spark).repartition(8, "v")  # hot key spans partitions
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(20)],
        ["k", "tag"],
    )
    plain = df.join(dim, "k").groupBy("k", "tag").count()
    salted = replicate_salted_join(df, dim, "k", buckets=8).groupBy(
        "k", "tag"
    ).count()
    assert {tuple(r) for r in salted.collect()} == {tuple(r) for r in plain.collect()}


def test_sketch_union_tracks_exact_distinct(spark):
    """Mergeable HLL maintenance: the union of two row-hash batch
    sketches estimates within tolerance on a frame with known distinct
    counts (and the flags the oracle predicts are all true)."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.analytics import (
        incremental_distinct_sketch,
    )

    df = (
        spark.range(12_000)
        .select(
            (F.col("id") % 3).cast("string").alias("event_type"),
            (F.col("id") % 1500).alias("user_id"),
            F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        )
    )
    rows = incremental_distinct_sketch(df).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["n_exact"] == 500
        assert r["sketch_within_tol"]


def test_theta_overlap_and_kll_merge_contracts(spark):
    """Theta set algebra and KLL quantile merge on a frame with known
    structure: exact overlap counts are right and every tolerance flag
    holds (the sketch states really carry the answer)."""
    from pyspark.sql import functions as F

    from wcdimportbot_spark.operators.analytics import (
        kll_quantile_merge_sketch,
        theta_overlap_sketch,
    )

    # users 0..599 per type; user appears in batch (event_id%2) by
    # construction: even users only in batch 0, odd in both
    rows = []
    eid = 0
    for t in ("a", "b"):
        for u in range(600):
            halves = (0,) if u % 2 == 0 else (0, 1)
            for h in halves:
                rows.append((eid * 2 + h, t, u, float(u % 100)))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, value double"
    )
    ov = {r["event_type"]: r for r in theta_overlap_sketch(df).collect()}
    for t in ("a", "b"):
        assert ov[t]["n_both"] == 300  # odd users in both batches
        assert ov[t]["n_only_first"] == 300  # even users batch-0 only
        assert ov[t]["inter_within_tol"] and ov[t]["diff_within_tol"]

    kll = {r["event_type"]: r for r in kll_quantile_merge_sketch(df).collect()}
    for t in ("a", "b"):
        assert kll[t]["kll_rank_within_tol"]
