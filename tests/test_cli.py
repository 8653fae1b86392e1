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
