"""Page sources (S1-S3): dump reader, live REST fetch, range scan.

The reference fetches one page at a time over MediaWiki REST
(``wikipedia_page.py:216-244``) and iterates allpages/category generators
(``src/__init__.py:210-275``). Spark restatement: batch inputs are page
dumps (parquet/jsonl); live fetch is a ``mapInPandas`` HTTP stage over a
titles DataFrame — gated behind an import-try so offline environments get a
deterministic stub.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAGE_SCHEMA = T.StructType(
    [
        T.StructField("page_id", T.LongType()),
        T.StructField("title", T.StringType()),
        T.StructField("language_code", T.StringType()),
        T.StructField("wikimedia_site", T.StringType()),
        T.StructField("namespace", T.IntegerType()),
        T.StructField("is_redirect", T.BooleanType()),
        T.StructField("latest_revision_id", T.LongType()),
        T.StructField("latest_revision_date", T.TimestampType()),
        T.StructField("wikitext", T.StringType()),
    ]
)


def read_page_dump(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """S1 batch form: schema-enforced dump read (parquet column-pruned and
    predicate-pushed; jsonl for raw exports)."""
    reader = spark.read.schema(PAGE_SCHEMA)
    if fmt == "parquet":
        return reader.parquet(path)
    if fmt == "json":
        return reader.json(path)
    raise ValueError(f"unsupported page dump format: {fmt}")


def range_scan(pages: DataFrame, max_count: int | None = None) -> DataFrame:
    """S2 — allpages(namespace=0), skip redirects, stop at max_count
    (src/__init__.py:255-275; P6/P7/W3)."""
    scanned = pages.filter(
        (F.col("namespace") == 0) & (~F.coalesce(F.col("is_redirect"), F.lit(False)))
    )
    return scanned.limit(max_count) if max_count else scanned


def fetch_pages_by_title(
    titles: DataFrame,
    language_code: str = "en",
    live: bool = False,
) -> DataFrame:
    """S1 live form: one REST GET per title, executed executor-side in
    Arrow batches with a lazily-initialized connection per worker (the
    standard executor-side-client pattern; reference does this serially on
    one thread).

    ``live=False`` (default, and forced when ``requests`` is missing)
    produces deterministic synthetic pages so the downstream pipeline is
    exercisable offline."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        session = None
        use_live = live
        if use_live:
            try:  # executor-side lazy init (wikipedia_page.py:482-498 analog)
                import requests  # noqa: F401

                session = requests.Session()
            except ImportError:
                use_live = False
        for pdf in it:
            rows = []
            for title in pdf["title"]:
                if use_live and session is not None:
                    url = (
                        f"https://{language_code}.wikipedia.org"
                        f"/w/rest.php/v1/page/{title.replace(' ', '_')}"
                    )
                    resp = session.get(url, timeout=30)
                    resp.raise_for_status()  # non-200 raises (S1 contract)
                    data = resp.json()
                    rows.append(
                        (
                            int(data["id"]),
                            title,
                            language_code,
                            "wikipedia",
                            0,
                            False,
                            int(data["latest"]["id"]),
                            pd.Timestamp(data["latest"]["timestamp"]),
                            data["source"],
                        )
                    )
                else:
                    # deterministic offline stub: ids/wikitext derived from
                    # the title hash
                    import hashlib

                    h = int(hashlib.md5(title.encode()).hexdigest()[:8], 16)
                    rows.append(
                        (
                            h,
                            title,
                            language_code,
                            "wikipedia",
                            0,
                            False,
                            h + 1,
                            pd.Timestamp("2026-01-01"),
                            "{{cite web |url=https://example.com/"
                            + title.replace(" ", "_")
                            + " |title="
                            + title
                            + "}}",
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in PAGE_SCHEMA.fields],
            )

    return titles.select("title").mapInPandas(batches, PAGE_SCHEMA)
