"""CLI command-surface tests (in-process main() to reuse the session)."""

import json

from wcdimportbot_spark.cli import main


def test_cli_roundtrip(spark, tmp_path, capsys):
    store = str(tmp_path / "store")

    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    out = capsys.readouterr().out
    assert "imported: 1 pages, 3 new items" in out

    # idempotent re-import
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    assert "0 new items" in capsys.readouterr().out

    # statistics on the populated store
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["items"] == {
        "WEBSITE_ITEM": 1,
        "WIKIPEDIA_PAGE": 1,
        "WIKIPEDIA_REFERENCE": 1,
    }
    assert stats["properties"]["CITATIONS"] == 1

    # lookup an existing hash via the cache
    h = spark.read.parquet(store + "/cache").collect()[0]["hash"]
    assert main(["--store", store, "--lookup-md5hash", h]) == 0
    out = capsys.readouterr().out
    assert f"Q{h}" in out

    # delete the page item, keep reference/website
    assert main(["--store", store, "--delete-page", "Easter Island"]) == 0
    assert "deleted 1 page item(s)" in capsys.readouterr().out
    assert main(["--store", store, "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert "WIKIPEDIA_PAGE" not in stats["items"]

    # rinse empties everything
    assert main(["--store", store, "--rinse"]) == 0


def test_cli_statistics_empty_store(tmp_path, capsys):
    assert main(["--store", str(tmp_path / "none"), "--statistics"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats == {"items": {}, "properties": {}}


def test_cli_delete_page_with_long_title(spark, tmp_path, capsys):
    """Stored page labels are truncated to 250 chars; delete-by-title must
    apply the same truncation or long-titled pages become undeletable."""
    store = str(tmp_path / "store")
    long_title = "Llanfairpwllgwyngyll " * 20  # ~420 chars, word-delimited
    long_title = long_title.strip()

    assert main(["--store", store, "--import-title", long_title]) == 0
    assert "imported: 1 pages" in capsys.readouterr().out
    assert main(["--store", store, "--delete-page", long_title]) == 0
    assert "deleted 1 page item(s)" in capsys.readouterr().out

    items = spark.read.parquet(store + "/items")
    assert items.filter(items.instance_of == "WIKIPEDIA_PAGE").count() == 0


def test_cli_reimport_preserves_qualifier_distinct_claims(spark, tmp_path, capsys):
    """Claims differing only in qualifiers (or value_quantity) must survive a
    re-import: merge is conflict-as-success per subject, never row-level
    dedup across imports."""
    store = str(tmp_path / "store")
    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    capsys.readouterr()

    claims_path = store + "/claims"
    spark.catalog.refreshByPath(claims_path)
    claims = spark.read.parquet(claims_path)
    n0 = claims.count()

    # forge a twin of an existing claim differing only in value_quantity —
    # a column the old dropDuplicates key ignored, so the pair collapsed
    from pyspark.sql import functions as F

    twin = claims.limit(1).withColumn("value_quantity", F.lit(99.0))
    forged = claims.unionByName(twin).localCheckpoint(eager=True)
    forged.write.mode("overwrite").partitionBy("property").parquet(claims_path)

    assert main(["--store", store, "--import-title", "Easter Island"]) == 0
    assert "0 new items" in capsys.readouterr().out
    spark.catalog.refreshByPath(claims_path)
    assert spark.read.parquet(claims_path).count() == n0 + 1
