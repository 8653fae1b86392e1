"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — synthesize citation-bearing pages from
  the sf0.001 ``documents`` table, run the full import pipeline
  (extract → normalize → hash → dedup), and return the per-page
  reference/hash statistics (SURVEY §7.2 step 1, the reference's
  ``__print_hash_statistics__``).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (registry: ``wcdimportbot_spark/plans/benchmark_queries.py``,
  121 queries, all DuckDB-verified — the ANN top-k variants emit an
  epsilon-recall accuracy contract the oracle predicts in closed form),
  ordered so the driver's 50-query window prioritizes, in round 12: the
  three new rows (``s12_purge_propagation`` — the composed document
  purge: corpus + dedup-index hash/band fingerprints + the docs' graph
  items/claims/cache rows leave under one self-describing two-phase
  marker (arm set + resolved claim subjects recorded for crash replay),
  the purged content's re-ingest is ACCEPTED back, and the replay runs
  the history VACUUM (late r12): every touched store keeps exactly its
  current tree and a recursive disk scan of all remaining parquet finds
  zero doomed fingerprints — time travel cannot resurrect purged rows;
  ``s12_curation_refresh`` — the re-crawl refresh increment: changed
  re-sends REPLACE their old corpus rows and the store hash-matches the
  one-shot closed form over latest versions; ``s12_maintenance_
  composition`` — merge → split → evolve → delete → compact → upsert on
  ONE store with sidecar/routing/inode pins after every engine), every
  row whose write path changed in round 12 (the hash-ATTRIBUTED bands
  store + ``dedup_index_delete`` behind ``dedup_incremental``/
  ``dedup_incremental_maint``/``curation_incremental_store``; the
  upsert matched-dir guard and distinct-key counts behind
  ``s11_upsert_rewrite``; the optimistic touched-list reset behind
  ``s9_optimistic_commits``/``s11_pruned_delete``; the ANN
  ``drift_ratio`` + optimistic first-commit stamping behind
  ``sim_ann_delete`` (extended in-row with the symmetric staleness
  assert), ``sim_ann_index_maint`` and ``sim_ann_retrain``), the
  late-r12 ``sim_ann_upsert`` (re-crawl refresh at the ANN layer:
  matched vec_ids REPLACED and re-clustered — plain add-batch would
  duplicate a changed vector beside its stale row), the late-r12
  ``train_shard_purge`` (purge propagation into SHIPPED training
  shards: touched split=/shard= partitions named CLOSED-FORM from the
  doomed keys, untouched partition inodes pinned, surviving pos values
  oracle-verified against the full recomputed epoch permutation), and
  sentinels — one per operator family already driver-verified in
  r5-r11 — for the rest.
  ``tests/test_plan_shapes.py::test_registry_size_matches_docs`` pins this
  count so the docs cannot drift from ``len(QUERIES)`` again.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_conf(spark: SparkSession) -> None:
    # driver may hand us a session not built by wcdimportbot_spark.session
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    import wcdimportbot_spark.session as session

    session._export_package_on_pythonpath()


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically wrap each document in wikitext with citation
    templates so the real extraction pipeline has real work to do: one
    hashable cite web (url identity), one cite journal with a DOI shared by
    every 10th doc (cross-page dedup), one unhashable cite news."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wikitext = F.concat(
        F.lit("{{cite web |url=https://"),
        F.col("source"),
        F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"),
        F.lit(" |title=Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" |last=Author |first=A. |access-date=2024-01-01}} "),
        F.substring("text", 1, 200),
        F.lit(" {{cite journal |title=Shared |doi=10.5555/group."),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("}} {{cite news |agency=Wire |title=String citation "),
        F.col("doc_id").cast("string"),
        F.lit("}}"),
    )
    return docs.select(
        F.col("doc_id").alias("page_id"),
        F.concat(F.lit("Document "), F.col("doc_id").cast("string")).alias("title"),
        F.coalesce(F.col("lang"), F.lit("en")).alias("language_code"),
        (F.col("doc_id") + 1000).alias("latest_revision_id"),
        wikitext.alias("wikitext"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full import pipeline on sf0.001 → per-page hash statistics."""
    _ensure_conf(spark)
    from wcdimportbot_spark.operators.analytics import page_hash_statistics
    from wcdimportbot_spark.plans.pipeline import run_import

    pages = pages_from_documents(spark, SMOKE_SF_DIR)
    result = run_import(
        pages, retrieved_date=F.lit("2026-08-13").cast("date")
    )
    return page_hash_statistics(result.references)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from wcdimportbot_spark.plans.benchmark_queries import QUERIES

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
