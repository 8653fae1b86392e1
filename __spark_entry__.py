"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query — synthesize citation-bearing pages from
  the sf0.001 ``documents`` table, run the full import pipeline
  (extract → normalize → hash → dedup), and return the per-page
  reference/hash statistics (SURVEY §7.2 step 1, the reference's
  ``__print_hash_statistics__``).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (registry: ``wcdimportbot_spark/plans/benchmark_queries.py``,
  129 queries, all DuckDB-verified — the ANN top-k variants emit an
  epsilon-recall accuracy contract the oracle predicts in closed form),
  ordered so the driver's 50-query window prioritizes, in round 15: the
  new row (``s15_ann_epoch_race`` — the last store pair joins the
  disjoint-or-detected contract: ``ann_index_delete`` resolved its
  (vec_id, cluster) pair set by scan and then published, so an
  add/upsert landing between them could insert a doomed id into a
  cluster the pair set never named and the vector stayed served after
  a "complete" privacy purge; both writers now bracket their windows
  with symmetric ``_ANN_DELETE_EPOCH``/``_ANN_MERGE_EPOCH`` bumps —
  the row forces the exact schedule with a one-shot gate, the delete
  re-resolves from the live store and re-deletes, and the
  delete→re-ingest contract accepts the ids back to the closed-form
  count), the rows whose write paths changed this round re-verified
  behind them (the epoch bracket behind all four ``sim_ann_*``
  lifecycle rows and ``s13_ann_binding``; the scrub sentinel
  HEARTBEAT + the epoch-bracketed ``read_plain_layout`` listing +
  rename-first all-doomed removal + contract-aware retention levers
  with keep_last as a protection floor behind ``s14_scrub_sentinel``/
  ``s14_output_retention``/``train_shard_purge``), the round-13/14
  two-sided epoch contract rows (``s14_import_epoch_race``,
  ``s13_purge_race``, the purge/refresh family), and sentinels — one
  per operator family already driver-verified in r5-r14 — for the
  rest. ``tests/test_plan_shapes.py::test_registry_size_matches_docs``
  pins this count so the docs cannot drift from ``len(QUERIES)`` again.
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
