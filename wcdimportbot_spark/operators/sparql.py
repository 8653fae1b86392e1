"""SPARQL-shaped read surface (S5).

The reference exposes every read query as a SPARQL string against the
Wikibase triplestore (``crud/read.py:36-44,88-99``): ``__get_statistic__``
counts items matching a (property, value) pattern, ``__get_all_items__``
lists items of a type, and the statistics screen composes several such
counts. The Spark-native restatement: the ``claims`` table *is* the triple
store — each row is a ``(subject, property, value)`` triple — and ``items``
is the materialized ``instance_of`` relation, so every SPARQL basic graph
pattern the reference issues maps to a ``spark.sql`` filter/aggregate over
the registered views. Catalyst plays the role of BlazeGraph's query planner:
the property filter prunes to one claims partition (the sink partitions by
``property``), and counts are one map-side-combinable aggregation.

Usage::

    register_graph_views(spark, items, claims)
    count_items_by_type_sql(spark).show()          # A1 statistics screen
    statistic_count(spark, "INSTANCE_OF", "WIKIPEDIA_REFERENCE").show()

Values are injected as SQL string literals (single quotes escaped) — the
surface mirrors the reference's f-string SPARQL templating
(``crud/read.py:88-99``), which has the same trust model: property/value
names come from the bot's own config enums, not end users.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_ITEMS_VIEW = "wcd_items"
DEFAULT_CLAIMS_VIEW = "wcd_claims"


def _quote(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


def register_graph_views(
    spark: SparkSession,
    items: DataFrame,
    claims: DataFrame,
    items_view: str = DEFAULT_ITEMS_VIEW,
    claims_view: str = DEFAULT_CLAIMS_VIEW,
) -> tuple[str, str]:
    """Register the graph tables as temp views for the SQL read surface.
    Temp views are session-scoped metadata only — no data is copied."""
    items.createOrReplaceTempView(items_view)
    claims.createOrReplaceTempView(claims_view)
    return items_view, claims_view


def count_items_by_type_sql(
    spark: SparkSession, items_view: str = DEFAULT_ITEMS_VIEW
) -> DataFrame:
    """A1 — the statistics screen's per-type counts as one SQL aggregate
    (the reference fires one SPARQL COUNT per type, crud/read.py:18-34)."""
    return spark.sql(
        f"SELECT instance_of, COUNT(*) AS count FROM {items_view} "
        "GROUP BY instance_of"
    )


def count_property_usage_sql(
    spark: SparkSession, claims_view: str = DEFAULT_CLAIMS_VIEW
) -> DataFrame:
    """A2 — items having any value per property (crud/read.py:144-146)."""
    return spark.sql(
        "SELECT property, COUNT(DISTINCT subject_qid) AS items_with_property "
        f"FROM {claims_view} GROUP BY property"
    )


def statistic_count(
    spark: SparkSession,
    prop: str,
    value_qid: str,
    claims_view: str = DEFAULT_CLAIMS_VIEW,
) -> DataFrame:
    """``__get_statistic__`` (crud/read.py:88-99) —
    ``SELECT (COUNT(?item) AS ?count) WHERE {{ ?item wcdt:P wcd:V }}``."""
    return spark.sql(
        f"SELECT COUNT(DISTINCT subject_qid) AS count FROM {claims_view} "
        f"WHERE property = {_quote(prop)} AND value_qid = {_quote(value_qid)}"
    )


def all_items_of_type(
    spark: SparkSession,
    item_type: str,
    items_view: str = DEFAULT_ITEMS_VIEW,
) -> DataFrame:
    """``__get_all_items__`` (crud/read.py:63-77) —
    ``SELECT ?item WHERE {{ ?item wcdt:INSTANCE_OF wcd:T }}``."""
    return spark.sql(
        f"SELECT qid AS item FROM {items_view} "
        f"WHERE instance_of = {_quote(item_type)}"
    )


def items_for_hash(
    spark: SparkSession,
    md5hash: str,
    claims_view: str = DEFAULT_CLAIMS_VIEW,
) -> DataFrame:
    """J2 hash lookup (crud/read.py:126-142) —
    ``SELECT ?item WHERE {{ ?item wcdt:HASH "md5" }}``."""
    return spark.sql(
        f"SELECT subject_qid AS item FROM {claims_view} "
        f"WHERE property = 'HASH' AND value_string = {_quote(md5hash)}"
    )


def duplicate_hash_violations_sql(
    spark: SparkSession, claims_view: str = DEFAULT_CLAIMS_VIEW
) -> DataFrame:
    """J2 uniqueness invariant — more than one item per hash
    (wikipedia_page.py:143-167 raises on multiple QIDs)."""
    return spark.sql(
        "SELECT value_string AS hash, COUNT(DISTINCT subject_qid) AS n_items "
        f"FROM {claims_view} WHERE property = 'HASH' "
        "GROUP BY value_string HAVING COUNT(DISTINCT subject_qid) > 1"
    )
