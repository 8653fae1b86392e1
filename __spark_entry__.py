"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — synthesize citation-bearing pages from
  the sf0.001 ``documents`` table, run the full import pipeline
  (extract → normalize → hash → dedup), and return the per-page
  reference/hash statistics (SURVEY §7.2 step 1, the reference's
  ``__print_hash_statistics__``).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (registry: ``wcdimportbot_spark/plans/benchmark_queries.py``,
  124 queries, all DuckDB-verified — the ANN top-k variants emit an
  epsilon-recall accuracy contract the oracle predicts in closed form),
  ordered so the driver's 50-query window prioritizes, in round 13: the
  three new rows (``s13_purge_race`` — the purge-vs-writer race
  contract: a purge deterministically straddling a concurrent
  curate_increment's two merges (the interleaving that used to leave
  the corpus-dropped/index-remembered mixed state) is detected by the
  increment's marker-fingerprint repair and converges onto the
  purge→ingest serial order — content in corpus AND index hashes AND
  index bands TOGETHER, bystanders intact, marker committed, corpus
  hash-matching the closed form after cleanup; ``s13_purge_spill_
  replay`` — bulk-purge crash replay above the marker cap: the resolved
  hash set SPILLS to a parquet side relation the pending marker points
  at, the purge is crashed between the corpus and index arms, and the
  id-form replay converges FROM THE SPILL ALONE (index forgets all 5
  fingerprints, spill removed at commit, re-ingest ACCEPTED back);
  ``s13_ann_binding`` — the bound ANN purge arm: after bind_ann_store
  declares which ANN store indexes the corpus, purge_documents derives
  the doomed vec_ids ITSELF — id-form directly, hash-form through one
  pre-corpus-arm resolution recorded in the marker, crash-replayable
  from that record), every row whose write path changed in round 13
  (the curate_increment race repair + per-arm marker heartbeats +
  distributive marker digests behind ``s12_purge_propagation``/
  ``s12_curation_refresh``/``s12_maintenance_composition``/
  ``curation_incremental_store``; the staged-swap scrub engine — kept
  rows staged to disk, two-rename partition swaps with crash healing,
  replacing block-manager materialization — behind
  ``train_shard_purge``), the round-12 write-path rows re-verified
  (attributed bands store, upsert/delete inode contracts, optimistic
  commits, ANN lifecycle + upsert), and sentinels — one per operator
  family already driver-verified in r5-r12 — for the rest.
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
