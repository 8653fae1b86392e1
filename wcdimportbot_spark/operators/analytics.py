"""Read-side analytics (A1-A8, J2, W3; the reference's --statistics and
--lookup-md5hash entry points, ``src/__init__.py:42-54,277-303``,
``crud/read.py``).

All functions take the ``items``/``claims``/``references`` DataFrames
produced by the pipeline and return DataFrames — no driver-side collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def count_items_by_type(items: DataFrame) -> DataFrame:
    """A1 — SPARQL ``COUNT(?item) WHERE { ?item instance_of wcd:Q }`` for
    every item type in one scan (crud/read.py:18-34,101-123)."""
    return items.groupBy("instance_of").agg(F.count("*").alias("count"))


def count_property_usage(claims: DataFrame) -> DataFrame:
    """A2 — items having any value per property; the whole statistics
    screen is one aggregation (crud/read.py:144-146, src/__init__.py:42-54)."""
    return claims.groupBy("property").agg(
        F.countDistinct("subject_qid").alias("items_with_property")
    )


def page_hash_statistics(references: DataFrame) -> DataFrame:
    """A3 — per-page reference/hash counts and integer percent
    (wikipedia_page.py:63-84,476-480: floor of 100*hashed/total)."""
    return references.groupBy("page_id").agg(
        F.count("*").alias("number_of_references"),
        F.count(F.when(F.col("md5hash").isNotNull(), 1)).alias(
            "number_of_hashed_references"
        ),
        F.floor(
            100
            * F.count(F.when(F.col("md5hash").isNotNull(), 1))
            / F.count("*")
        )
        .cast("int")
        .alias("percent_of_hashed_references"),
    )


def corpus_statistics(references: DataFrame) -> DataFrame:
    """A4 — global sums + percent (src/__init__.py:354-370, commented
    design)."""
    return references.agg(
        F.count("*").alias("total_references"),
        F.count(F.when(F.col("md5hash").isNotNull(), 1)).alias("total_hashed"),
        F.floor(
            100 * F.count(F.when(F.col("md5hash").isNotNull(), 1)) / F.count("*")
        )
        .cast("int")
        .alias("percent_hashed"),
    )


def lookup_qids_for_hash(claims: DataFrame, md5hash: str) -> DataFrame:
    """J2 — ``?item wcdt:HASH "md5"`` (crud/read.py:126-142)."""
    return claims.filter(
        (F.col("property") == "HASH") & (F.col("value_string") == md5hash)
    ).select("subject_qid")


def duplicate_hash_violations(claims: DataFrame) -> DataFrame:
    """J2 uniqueness assertion — >1 item per hash is an invariant violation
    (wikipedia_page.py:143-167 raises on multiple QIDs)."""
    return (
        claims.filter(F.col("property") == "HASH")
        .groupBy(F.col("value_string").alias("hash"))
        .agg(F.countDistinct("subject_qid").alias("n_items"))
        .filter(F.col("n_items") > 1)
    )


def rinse_items(items: DataFrame, claims: DataFrame, item_types: list[str]) -> tuple[DataFrame, DataFrame]:
    """S10/U2 — delete-all per item type as anti-join rewrites (the Delta
    form is two DELETE statements; crud/delete.py:18-68)."""
    doomed = items.filter(F.col("instance_of").isin(item_types)).select("qid")
    kept_items = items.join(doomed, "qid", "left_anti")
    kept_claims = claims.join(
        doomed.withColumnRenamed("qid", "subject_qid"), "subject_qid", "left_anti"
    )
    return kept_items, kept_claims


def incremental_distinct_sketch(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    lg_k: int = 14,
    tolerance: float = 0.05,
) -> DataFrame:
    """Mergeable-sketch maintenance (the A1/A2 sketch extension, beyond
    a11's single-pass contract): two ingest batches build PARTIAL HLL
    sketches independently, ``hll_union_agg`` merges the binary sketch
    states, and the estimate comes off the merged sketch — never a
    rescan of the first batch. This associativity is the whole point of
    sketches at 100 TB: per-partition/per-day sketch artifacts are tiny
    (O(2^lg_k) bytes), stored next to the data, and any time-range
    distinct count is a union of stored states, not a recount.

    The batch split is a deterministic row hash over (key, ts), so the
    same key lands in BOTH batches and the union must actually dedup
    across sketch states (a key-partitioned split would make the union
    trivially disjoint). Emitted as the verifiable a11-style contract:
    exact distinct count + a within-tolerance flag the oracle predicts
    as all-true."""
    batches = events.withColumn(
        "_b", F.pmod(F.xxhash64(F.col(key), F.col("ts")), F.lit(2))
    )
    partial = batches.groupBy(group, "_b").agg(
        F.hll_sketch_agg(key, F.lit(lg_k)).alias("_sk")
    )
    merged = partial.groupBy(group).agg(F.hll_union_agg("_sk").alias("_sk"))
    exact = events.groupBy(group).agg(
        F.countDistinct(key).alias("n_exact")
    )
    return merged.join(exact, group).select(
        group,
        "n_exact",
        (
            F.abs(
                F.hll_sketch_estimate("_sk").cast("double")
                - F.col("n_exact")
            )
            / F.col("n_exact")
            <= tolerance
        ).alias("sketch_within_tol"),
    )


def windowed_distinct_sketch(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    window: str = "1 day",
    lg_k: int = 14,
    tolerance: float = 0.05,
) -> DataFrame:
    """Per-EVENT-TIME-WINDOW mergeable HLL distincts (r8 verdict #7):
    the a12 lifetime-distinct maintenance keyed additionally by the
    tumbling window, so the A7 counter family answers BOTH "distinct
    users ever" and "distinct users per day" from stored O(2^lg_k)-byte
    sketch states per (window, group) — any ad-hoc time RANGE is then a
    union of stored per-window states, never a raw re-scan.

    Same two-batch construction as a12: a deterministic row-hash split
    builds partial sketches independently (the same key lands in both
    batches, so the union genuinely dedups), ``hll_union_agg`` merges
    the binary states per (window_start, group), and the estimate comes
    off the merged state. Contract columns: exact per-window distinct
    count + a within-tolerance flag the oracle predicts as all-true
    (HLL is exact in its sparse range, so small windows are safe).
    The streaming twin is
    ``streaming/sketch_gate.windowed_distinct_sketch_batch_fn`` —
    identical stored-state shape, replay-idempotent by HLL-union
    construction."""
    win_start = F.window("ts", window).getField("start").alias("window_start")
    batches = events.withColumn(
        "_b", F.pmod(F.xxhash64(F.col(key), F.col("ts")), F.lit(2))
    )
    partial = batches.groupBy(
        win_start, F.col(group), F.col("_b")
    ).agg(F.hll_sketch_agg(key, F.lit(lg_k)).alias("_sk"))
    merged = partial.groupBy("window_start", group).agg(
        F.hll_union_agg("_sk").alias("_sk")
    )
    exact = events.groupBy(win_start, F.col(group)).agg(
        F.countDistinct(key).alias("n_exact")
    )
    return merged.join(exact, ["window_start", group]).select(
        "window_start",
        group,
        "n_exact",
        (
            F.abs(
                F.hll_sketch_estimate("_sk").cast("double")
                - F.col("n_exact")
            )
            / F.greatest(F.col("n_exact").cast("double"), F.lit(1.0))
            <= tolerance
        ).alias("sketch_within_tol"),
    )


def theta_overlap_sketch(
    events: DataFrame,
    key: str = "user_id",
    group: str = "event_type",
    split_col: str = "event_id",
    tolerance: float = 0.05,
) -> DataFrame:
    """Theta-sketch SET ALGEBRA between two ingest batches: per group,
    estimate |A ∩ B| (keys active in both batches — retention) and
    |A \\ B| (batch-1-only keys — churn) from the two stored sketch
    states alone. HLL can only union; theta sketches keep a key sample
    so intersection and difference are sketch-side operations — at
    100 TB this answers "how many users overlap between any two days"
    from O(k)-byte stored artifacts per day, no re-join of raw events.

    Batches split on ``split_col % 2`` (event id parity — the same key
    lands in both batches, so the intersection is genuinely non-trivial
    and the split is reproducible by the SQL oracle). Contract columns:
    exact intersection/difference counts plus within-tolerance flags
    the oracle predicts as all-true."""
    tagged = events.withColumn("_b", F.pmod(F.col(split_col), F.lit(2)))
    a = tagged.filter(F.col("_b") == 0).groupBy(group).agg(
        F.theta_sketch_agg(key).alias("_ska")
    )
    b = tagged.filter(F.col("_b") == 1).groupBy(group).agg(
        F.theta_sketch_agg(key).alias("_skb")
    )
    per_key = tagged.groupBy(group, key).agg(
        F.max(F.when(F.col("_b") == 0, 1).otherwise(0)).alias("_ina"),
        F.max(F.when(F.col("_b") == 1, 1).otherwise(0)).alias("_inb"),
    )
    exact = per_key.groupBy(group).agg(
        F.sum(F.col("_ina") * F.col("_inb")).alias("n_both"),
        F.sum(F.col("_ina") * (1 - F.col("_inb"))).alias("n_only_first"),
    )
    est_inter = F.theta_sketch_estimate(
        F.theta_intersection("_ska", "_skb")
    ).cast("double")
    est_diff = F.theta_sketch_estimate(
        F.theta_difference("_ska", "_skb")
    ).cast("double")
    return (
        a.join(b, group)
        .join(exact, group)
        .select(
            group,
            "n_both",
            "n_only_first",
            (
                F.abs(est_inter - F.col("n_both"))
                <= F.greatest(F.col("n_both").cast("double"), F.lit(1.0))
                * tolerance
            ).alias("inter_within_tol"),
            (
                F.abs(est_diff - F.col("n_only_first"))
                <= F.greatest(
                    F.col("n_only_first").cast("double"), F.lit(1.0)
                )
                * tolerance
            ).alias("diff_within_tol"),
        )
    )


def kll_quantile_merge_sketch(
    events: DataFrame,
    value_col: str = "value",
    group: str = "event_type",
    split_col: str = "event_id",
    rank_tolerance: float = 0.03,
) -> DataFrame:
    """KLL quantile-sketch maintenance, completing the mergeable-sketch
    triple (HLL distinct / theta set algebra / KLL quantiles): two
    ingest batches build partial KLL sketches over ``value_col``, the
    binary states merge sketch-side, and the median estimate comes off
    the merged state — distribution questions over any batch range from
    stored O(k) artifacts, no raw re-scan. KLL's guarantee is on RANK
    (±1.65% at the default k=200), so the contract verifies exactly
    that: the EXACT rank of the merged-sketch median (one broadcast of
    5 group medians back over the events, one conditional count) must
    sit within ``rank_tolerance`` of 0.5. The oracle predicts the exact
    median (a11-style percentile parity) and the all-true flag."""
    tagged = events.withColumn("_b", F.pmod(F.col(split_col), F.lit(2)))
    a = tagged.filter(F.col("_b") == 0).groupBy(group).agg(
        F.kll_sketch_agg_double(value_col).alias("_ska")
    )
    b = tagged.filter(F.col("_b") == 1).groupBy(group).agg(
        F.kll_sketch_agg_double(value_col).alias("_skb")
    )
    est = a.join(b, group).select(
        group,
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_merge_double("_ska", "_skb"), F.lit(0.5)
        ).alias("_est_p50"),
    )
    ranked = (
        events.join(F.broadcast(est), group)
        .groupBy(group)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col(value_col) <= F.col("_est_p50"), 1).otherwise(0)
            ).alias("_le"),
            F.round(
                F.percentile(value_col, F.lit(0.5)), 4
            ).alias("p50_exact"),
        )
    )
    return ranked.select(
        group,
        "n",
        "p50_exact",
        (
            F.abs(
                F.col("_le").cast("double") / F.col("n") - F.lit(0.5)
            )
            <= rank_tolerance
        ).alias("kll_rank_within_tol"),
    )
