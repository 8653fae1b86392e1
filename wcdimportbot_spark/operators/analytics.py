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
