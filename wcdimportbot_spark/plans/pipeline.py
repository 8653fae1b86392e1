"""End-to-end import pipeline (the reference's ``--import-title`` flagship,
SURVEY §3.1, restated for Spark):

    pages → extract (F1) → filter/fix/validate (P1-P5) → normalize (F4-F22)
    → dedup (A5/A6) → anti-join cache (J4) → items/claims (F24-F26, J5)
    → merge sinks (S7/S9)

One job; shuffles only at the dropDuplicates and the cache join — exactly
the plan SURVEY §3.1 calls for.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.hashing import DEFAULT_WIKIBASE_TITLE
from wcdimportbot_spark.operators import cache as cache_ops
from wcdimportbot_spark.operators.extract import (
    extract_raw_templates,
    filter_supported_templates,
    fix_param_keys,
    split_valid_and_rejects,
)
from wcdimportbot_spark.operators.graph import build_graph, qid_from_hash
from wcdimportbot_spark.operators.normalize import build_references, collect_rejects


@dataclass
class ImportResult:
    references: DataFrame
    items: DataFrame
    claims: DataFrame
    rejects: DataFrame
    new_cache_mappings: DataFrame
    extra: dict = field(default_factory=dict)


def run_import(
    pages: DataFrame,
    cache: DataFrame | None = None,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
    retrieved_date: Column | None = None,
    persist: bool = True,
) -> ImportResult:
    """pages(page_id, title, language_code, latest_revision_id, wikitext)
    → graph tables + cache additions + rejects.

    ``persist=True`` (default) materializes the normalized references once:
    extraction + normalization is the expensive narrow stage and every
    downstream output (items, three claim families, rejects, cache) branches
    from it — without persistence each branch would re-run the Python
    extraction UDF. On a cluster this is the natural stage boundary to
    checkpoint; disable only for single-output plans."""
    raw = extract_raw_templates(pages)
    raw = filter_supported_templates(raw)
    raw = fix_param_keys(raw)
    valid, schema_rejects = split_valid_and_rejects(raw)
    refs = build_references(valid, wikibase_title)
    # A5 in-page dedup happens inside graph emission (citations edges)
    refs = refs.join(
        pages.select("page_id", "latest_revision_id"), "page_id", "left"
    )
    if persist:
        refs = refs.persist()
    rejects = collect_rejects(refs).unionByName(schema_rejects)
    items, claims = build_graph(pages, refs, wikibase_title, retrieved_date)

    # J4 — only entities missing from the cache are new uploads
    new_items = items
    if cache is not None:
        cache_as_items = cache.withColumnRenamed("hash", "hash")
        new_items = items.join(cache_as_items, "hash", "left_anti")
    new_cache = new_items.select(F.col("hash"), F.col("qid"))
    return ImportResult(
        references=refs,
        items=items,
        claims=claims,
        rejects=rejects,
        new_cache_mappings=new_cache,
    )
