"""Template extraction and parameter-key normalization (S-P rows of SURVEY §2).

Pipeline stage: ``pages`` → ``raw_templates``.

- F1/F2: wikitext → (template_name, params) rows via an Arrow-batched
  ``mapInPandas`` around :mod:`wcdimportbot_spark.functions.wikitext` — the
  engine's single Python hot path (reference
  ``helpers/template_extraction.py:40-116``).
- P1: supported-template filter (``wikipedia_page.py:422-424``).
- P2-P4: key renames — reserved word, aliases, dashes
  (``wikipedia_page.py:246-301``) — as Catalyst ``transform_keys``.
- P5: schema validation — rows with unknown keys go to the rejects channel
  (``wikipedia_page.py:431-444``).

Scale notes: extraction is embarrassingly parallel (no shuffle); one pass,
one Python worker per core, Arrow batches both ways. Everything after the
UDF is whole-stage codegen. The supported-template filter is applied *after*
extraction because templates are discovered by parsing, but it cuts the data
volume before any wide normalization happens.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wcdimportbot_spark.functions.template_fields import (
    ALL_ACCEPTED_KEYS,
    KEY_ALIASES,
    POSITIONAL_KEY_RENAMES,
    RESERVED_KEY_RENAMES,
    SUPPORTED_TEMPLATES,
)

RAW_TEMPLATE_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.LongType()),
        T.StructField("template_name", T.StringType()),
        T.StructField("template_ordinal", T.IntegerType()),
        T.StructField("params", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # Imported lazily so the executor-side worker resolves the module itself
    from wcdimportbot_spark.functions.wikitext import extract_templates_and_params

    for pdf in batches:
        page_ids, names, ordinals, params = [], [], [], []
        for page_id, wikitext in zip(pdf["page_id"], pdf["wikitext"]):
            if not isinstance(wikitext, str) or not wikitext:
                continue
            for ordinal, (name, tpl_params) in enumerate(
                extract_templates_and_params(wikitext, True), start=1
            ):
                page_ids.append(page_id)
                names.append(name)
                ordinals.append(ordinal)
                params.append(tpl_params)
        yield pd.DataFrame(
            {
                "page_id": pd.Series(page_ids, dtype="int64"),
                "template_name": pd.Series(names, dtype="object"),
                "template_ordinal": pd.Series(ordinals, dtype="int32"),
                "params": pd.Series(params, dtype="object"),
            }
        )


def extract_raw_templates(pages: DataFrame) -> DataFrame:
    """``pages(page_id, wikitext, ...)`` → one row per template occurrence.

    Column pruning: only (page_id, wikitext) cross the Arrow boundary.
    """
    return pages.select("page_id", "wikitext").mapInPandas(
        _extract_batches, RAW_TEMPLATE_SCHEMA
    )


def filter_supported_templates(raw: DataFrame) -> DataFrame:
    """P1 — keep supported citation templates; names compare lowercased
    (wikipedia_page.py:422-424 lowercases before the isin check)."""
    return raw.withColumn("template_name", F.lower("template_name")).filter(
        F.col("template_name").isin(*SUPPORTED_TEMPLATES)
    )


def fix_param_keys(raw: DataFrame) -> DataFrame:
    """P2-P4 + positional renames, as a single ``transform_keys`` pass.

    Order matches ``__fix_keys__`` (class → aliases → dashes), then the
    marshmallow data_key renames 1/2 → first/second_parameter. Duplicate keys
    produced by a rename (e.g. both ``accessdate`` and ``access_date``
    present) resolve last-wins explicitly via
    :func:`~wcdimportbot_spark.functions.columns.dedup_map_last_wins` —
    matching dict-overwrite semantics without depending on the session's
    ``spark.sql.mapKeyDedupPolicy``."""
    renames = {}
    renames.update(RESERVED_KEY_RENAMES)
    renames.update(KEY_ALIASES)
    renames.update(POSITIONAL_KEY_RENAMES)

    def rename_expr(k):
        expr = F.regexp_replace(k, "-", "_")
        for old, new in renames.items():
            # aliases are applied to the raw key before dash-fixing; a raw key
            # equal to an alias takes the alias target verbatim
            expr = F.when(k == old, F.lit(new)).otherwise(expr)
        return expr

    from wcdimportbot_spark.functions.columns import transform_keys_last_wins

    return raw.withColumn(
        "params", transform_keys_last_wins(F.col("params"), rename_expr)
    )


def split_valid_and_rejects(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P5 — schema validation. Rows whose params contain keys outside the
    declared field set are rejected whole (marshmallow ValidationError →
    ``schema_errors.log``); the rejects carry rule + message per S11."""
    accepted = F.array(*[F.lit(k) for k in ALL_ACCEPTED_KEYS])
    unknown = F.filter(
        F.map_keys("params"), lambda k: ~F.array_contains(accepted, k)
    )
    flagged = raw.withColumn("_unknown_keys", unknown)
    valid = flagged.filter(F.size("_unknown_keys") == 0).drop("_unknown_keys")
    rejects = (
        flagged.filter(F.size("_unknown_keys") > 0)
        .select(
            F.lit("schema_errors").alias("rule"),
            F.concat(
                F.lit("unknown keys: "), F.array_join("_unknown_keys", ", ")
            ).alias("message"),
            "page_id",
            "template_ordinal",
        )
    )
    return valid, rejects
