"""wcdimportbot_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of internetarchive/wcdimportbot.

The reference (``/root/reference``, v2.0.0-alpha3) is a single-threaded
imperative Python bot: fetch Wikipedia pages, extract citation templates from
wikitext, normalize them into wide typed reference records, deduplicate by
content hash, and emit a (page)-[cites]->(reference)-[website]->(domain)
graph into a Wikibase store, with a KV cache for idempotence and SPARQL
count/lookup analytics on the read side.

This package re-expresses every one of those dataflow operators (SURVEY.md §2)
as declarative Spark DataFrame pipelines:

- ``sources``    — page-dump / titles / category-closure / event scans (S1-S4)
- ``functions``  — wikitext template extraction (the one irreducible UDF) and
                   all scalar normalization expressions (F1-F26), Catalyst-native
- ``operators``  — extraction, normalization, persons, hashing, dedup, graph
                   emission, cache joins, analytics (P/J/A/W/U rows)
- ``plans``      — end-to-end composed pipelines (the reference's entry points)
- ``streaming``  — Structured Streaming variant of the pipeline (§2.8)

Design rules (100 TB first):
- DataFrame/SQL only; RDDs never. Python appears exactly once in the hot
  path (template extraction via Arrow-batched ``mapInPandas``).
- No driver-side ``collect()`` in any pipeline; all loops are bounded
  fixpoint iterations over DataFrames (category closure).
- Every join declares its strategy: broadcast for dimensions, shuffle hash
  for fact×fact; AQE left on for skew.
"""

from wcdimportbot_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
