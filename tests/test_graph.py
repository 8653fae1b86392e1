"""Graph emission + cache + analytics tests (FIXTURES.md §6 assertions)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.operators import cache as cache_ops
from wcdimportbot_spark.operators.analytics import (
    corpus_statistics,
    count_items_by_type,
    count_property_usage,
    duplicate_hash_violations,
    lookup_qids_for_hash,
    page_hash_statistics,
    rinse_items,
)
from wcdimportbot_spark.plans.pipeline import run_import

WIKITEXT_A = (
    "{{cite journal |last1=Skaaning |first1=Svend-Erik |title=Different Types of Data "
    "|doi=10.17645/pag.v6i1.1183 |year=2018 }} "
    "{{cite web |url=https://www.stereogum.com/1345401/turntable-interview/ "
    "|title=Turntable Interview |last=Locker |first=Melissa |access-date=May 24, 2021 "
    "|archive-url=https://web.archive.org/web/20100715195638/http://www.ine.cl/x.php |archive-date=2010-08-12 }}"
    # duplicate of the first (same doi) — must dedup to one item / one edge
    "{{cite journal |title=Different Types of Data (dup) |doi=10.17645/pag.v6i1.1183 }} "
    # string citation (no identifiers at all)
    "{{cite news |agency=Oxford University Press |access-date=24 February 2021 |title=Democracy }}"
)
WIKITEXT_B = (
    "{{cite web |url=https://www.stereogum.com/other-page/ |title=Other |author=John Doe }}"
)


@pytest.fixture(scope="module")
def result(spark):
    pages = spark.createDataFrame(
        [
            (1, "Test Page A", "en", 100, WIKITEXT_A),
            (2, "Test Page B", "en", 200, WIKITEXT_B),
        ],
        "page_id long, title string, language_code string, latest_revision_id long, wikitext string",
    )
    res = run_import(pages, retrieved_date=F.lit("2026-08-13").cast("date"))
    res.items = res.items.cache()
    res.claims = res.claims.cache()
    res.references = res.references.cache()
    return res


def test_items_inventory(result):
    by_type = {
        r["instance_of"]: r["count"] for r in count_items_by_type(result.items).collect()
    }
    assert by_type["WIKIPEDIA_PAGE"] == 2
    # 3 unique hashed refs: doi (deduped), stereogum url A, stereogum url B
    assert by_type["WIKIPEDIA_REFERENCE"] == 3
    assert by_type["WEBSITE_ITEM"] == 1  # stereogum.com only


def test_reference_label_rule(result):
    doi_hash = hashlib.md5(
        ("sandbox.wiki" + "10.17645/pag.v6i1.1183".lower()).encode()
    ).hexdigest()
    item = result.items.filter(F.col("hash") == doi_hash).collect()[0]
    assert item["label"].endswith(f" | {doi_hash[:7]}")
    assert item["label"].startswith("Different Types of Data")
    assert item["qid"] == "Q" + doi_hash


def test_citations_edges_deduped(result):
    edges = result.claims.filter(F.col("property") == "CITATIONS").collect()
    # page 1: doi ref + stereogum ref (dup doi collapsed); page 2: one
    assert len(edges) == 3
    assert all(e["value_qid"].startswith("Q") for e in edges)
    assert all(e["ref_retrieved_date"] == "+2026-08-13T00:00:00Z" for e in edges)
    # provenance revision ids flow from the page rows
    revs = {e["ref_page_revision_id"] for e in edges}
    assert revs == {"100", "200"}


def test_string_citation_with_qualifiers(result):
    sc = result.claims.filter(F.col("property") == "STRING_CITATIONS").collect()
    assert len(sc) == 1
    assert sc[0]["value_string"] == "cite news"
    quals = {q["property"]: q["value"] for q in sc[0]["qualifiers"]}
    assert quals["TITLE"] == "Democracy"
    assert quals["ACCESS_DATE"] == "+2021-02-24T00:00:00Z"


def test_website_edge_and_claims(result):
    w = result.claims.filter(F.col("property") == "WEBSITE").collect()
    assert len(w) == 2  # both stereogum refs point at the same website item
    assert len({x["value_qid"] for x in w}) == 1
    fld = result.claims.filter(F.col("property") == "FIRST_LEVEL_DOMAIN_STRING").collect()
    assert fld[0]["value_string"] == "stereogum.com"


def test_archive_url_claim_has_archive_qualifier(result):
    au = result.claims.filter(F.col("property") == "ARCHIVE_URL").collect()
    assert len(au) == 1
    quals = {q["property"]: q["value"] for q in (au[0]["qualifiers"] or [])}
    assert quals.get("ARCHIVE") == "QARCHIVE_ORG"


def test_person_claims(result):
    full_names = {
        r["value_string"]
        for r in result.claims.filter(F.col("property") == "FULL_NAME_STRING").collect()
    }
    assert {"Svend-Erik Skaaning", "Melissa Locker", "John Doe"} <= full_names
    one = result.claims.filter(
        (F.col("property") == "FULL_NAME_STRING")
        & (F.col("value_string") == "Svend-Erik Skaaning")
    ).collect()[0]
    quals = {q["property"]: q["value"] for q in one["qualifiers"]}
    assert quals["GIVEN_NAME"] == "Svend-Erik"
    assert quals["FAMILY_NAME"] == "Skaaning"
    assert quals["SERIES_ORDINAL"] == "1"


def test_hash_uniqueness_invariant(result):
    assert duplicate_hash_violations(result.claims).count() == 0


def test_lookup_and_stats(result):
    doi_hash = hashlib.md5(
        ("sandbox.wiki" + "10.17645/pag.v6i1.1183".lower()).encode()
    ).hexdigest()
    qids = lookup_qids_for_hash(result.claims, doi_hash).collect()
    assert [q["subject_qid"] for q in qids] == ["Q" + doi_hash]

    stats = {r["page_id"]: r for r in page_hash_statistics(result.references).collect()}
    assert stats[1]["number_of_references"] == 4
    assert stats[1]["number_of_hashed_references"] == 3
    assert stats[1]["percent_of_hashed_references"] == 75
    corpus = corpus_statistics(result.references).collect()[0]
    assert corpus["total_references"] == 5 and corpus["total_hashed"] == 4

    usage = {r["property"]: r["items_with_property"] for r in count_property_usage(result.claims).collect()}
    assert usage["HASH"] == 6  # 2 pages + 3 refs + 1 website


def test_cache_roundtrip(spark, result, tmp_path):
    path = str(tmp_path / "cache.parquet")
    cache = cache_ops.read_cache(spark, path)
    assert cache.count() == 0
    mappings = result.items.select("hash", "qid")
    merged = cache_ops.merge_into_cache(cache, mappings)
    cache_ops.write_cache(merged, path)
    cache2 = cache_ops.read_cache(spark, path)
    assert cache2.count() == 6

    # J1/J4: all hits now, no misses
    hits, misses = cache_ops.split_hits_and_misses(
        result.items.select(F.col("hash")), cache2
    )
    assert hits.count() == 6 and misses.count() == 0

    # re-merge with a conflicting qid: existing mapping wins (S9 semantics)
    conflict = spark.createDataFrame(
        [(result.items.collect()[0]["hash"], "Q_SOMETHING_ELSE")], ["hash", "qid"]
    )
    merged2 = cache_ops.merge_into_cache(cache2, conflict)
    assert merged2.count() == 6
    kept = merged2.join(conflict.select("hash"), "hash").collect()[0]
    assert kept["qid"] != "Q_SOMETHING_ELSE"

    # S8 delete
    fewer = cache_ops.delete_keys(cache2, conflict)
    assert fewer.count() == 5


def test_rinse(result):
    items2, claims2 = rinse_items(result.items, result.claims, ["WIKIPEDIA_REFERENCE"])
    types = {r["instance_of"] for r in items2.select("instance_of").distinct().collect()}
    assert "WIKIPEDIA_REFERENCE" not in types
    assert claims2.filter(F.col("property") == "TEMPLATE_NAME").count() == 0


def test_sinks_partitioned_merge(spark, result, tmp_path):
    import os

    from wcdimportbot_spark.operators import sinks

    items_path = str(tmp_path / "items")
    claims_path = str(tmp_path / "claims")
    rejects_path = str(tmp_path / "rejects")
    sinks.write_items(result.items, items_path)
    sinks.write_claims(result.claims, claims_path)
    sinks.write_rejects(result.rejects, rejects_path)
    # partition directories exist per type/property/rule in the published
    # snapshot version
    from wcdimportbot_spark.operators import versioned

    assert any(
        d.startswith("instance_of=")
        for d in os.listdir(versioned.data_dir(items_path))
    )
    assert any(
        d.startswith("property=")
        for d in os.listdir(versioned.data_dir(claims_path))
    )
    assert sinks.read_items(spark, items_path).count() == result.items.count()
    # merge is idempotent: re-merging the same items adds nothing
    merged = sinks.merge_items(spark, result.items, items_path)
    assert merged.count() == result.items.count()
    # a genuinely new item is inserted; a conflicting hash keeps the old row
    first_hash = result.items.select("hash").limit(1).collect()[0][0]
    newcomers = spark.createDataFrame(
        [
            ("QNEW", "WEBSITE_ITEM", "new.example", "d", "brandnewhash"),
            ("QCONFLICT", "WEBSITE_ITEM", "conflict", "d", first_hash),
        ],
        result.items.schema,
    )
    merged2 = sinks.merge_items(spark, newcomers, items_path)
    assert merged2.count() == result.items.count() + 1
    kept = merged2.filter(F.col("hash") == first_hash).collect()[0]
    assert kept["qid"] != "QCONFLICT"
