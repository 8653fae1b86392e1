"""Domain-pipeline parity tests: wikitext → raw templates → references.

Inputs mirror the reference test suite (FIXTURES.md §3,
tests/test_english_wikipedia_page_reference.py) run through the full Spark
pipeline."""

import hashlib

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.operators.extract import (
    extract_raw_templates,
    filter_supported_templates,
    fix_param_keys,
    split_valid_and_rejects,
)
from wcdimportbot_spark.operators.normalize import build_references, collect_rejects

WIKITEXT = " ".join(
    [
        # cite web + person + archive_url (stereogum case + swedish case blend)
        "{{cite web |url=https://www.stereogum.com/1345401/turntable-interview/interviews/ "
        "|title=Turntable Interview: !!! |last=Locker |first=Melissa |date=May 9, 2013 "
        "|website=Stereogum |access-date=May 24, 2021 "
        "|archive-url=https://web.archive.org/web/20100715195638/http://www.ine.cl/x.php }}",
        # cite journal + DOI
        "{{cite journal |last1=Skaaning |first1=Svend-Erik |title=Different Types of Data "
        "|journal=Politics and Governance |volume=6 |issue=1 |page=105 "
        "|doi=10.17645/pag.v6i1.1183 |year=2018 }}",
        # cite book + ISBN + DOI (doi wins the hash chain)
        "{{cite book |last=Tangian |first=Andranik |date=2020 |title=Analytical Theory of Democracy "
        "|publisher=[[Springer|Springer-Verlag]] |location=Cham, Switzerland "
        "|isbn=978-3-030-39690-9 |doi=10.1007/978-3-030-39691-6 |s2cid=216190330 }}",
        # url template positional
        "{{url|chkchkchk.net}}",
        # bad url (wiki-link)
        "{{cite web |url=[[:sq:Shkrime për historinë e Shqipërisë|Shkrime]] |title=Bad }}",
        # google books template inside url
        "{{cite book |url={{google books |plainurl=y |id=CDJpAAAAMAAJ |page=313}} |title=GB }}",
        # internet archive id
        "{{cite book |url=https://archive.org/details/catalogueofshipw0000wils/ |title=IA }}",
        # google books id from query
        "{{cite book |url=https://books.google.ca/books?id=on0TaPqFXbcC&pg=PA431 |title=GBQ }}",
        # place/lang merge
        "{{cite book |title=Merge |place=Copenhagen |lang=English }}",
        # unsupported template (filtered)
        "{{infobox country |name=Chile }}",
        # unknown param key (rejected by schema validation)
        "{{cite web |url=https://ok.example.com/ |bogus_param=1 |title=Rej }}",
        # isbn template + bad isbn length
        "{{isbn|12345}}",
    ]
)


def md5(wikibase_title, key):
    return hashlib.md5(f"{wikibase_title}{key.replace(' ', '').lower()}".encode()).hexdigest()


@pytest.fixture(scope="module")
def refs(spark):
    pages = spark.createDataFrame([(1, WIKITEXT)], "page_id long, wikitext string")
    raw = fix_param_keys(filter_supported_templates(extract_raw_templates(pages)))
    valid, rejects = split_valid_and_rejects(raw)
    refs = build_references(valid).cache()
    return {
        "refs": {r["title"] or r["first_parameter"]: r for r in refs.collect()},
        "schema_rejects": rejects.collect(),
        "rejects": collect_rejects(refs).collect(),
    }


def test_supported_filter_and_schema_rejects(refs):
    assert "Chile" not in str(refs["refs"])  # infobox filtered before validation
    assert len(refs["schema_rejects"]) == 1
    assert "bogus_param" in refs["schema_rejects"][0]["message"]


def test_cite_web_person_and_fld(refs):
    r = refs["refs"]["Turntable Interview: !!!"]
    assert r["first_level_domain_of_url"] == "stereogum.com"
    assert r["first_level_domain_of_archive_url"] == "archive.org"
    assert r["detected_archive_of_archive_url"] == "ARCHIVE_ORG"
    persons = [p for p in r["persons"]]
    assert len(persons) == 1
    p = persons[0]
    assert (p["role"], p["given"], p["surname"]) == ("unknown", "Melissa", "Locker")
    # url-based hash (no doi/pmid/isbn/oclc)
    assert r["md5hash"] == md5("sandbox.wiki", "https://www.stereogum.com/1345401/turntable-interview/interviews/")
    assert r["access_date"].year == 2021 and r["access_date"].month == 5 and r["access_date"].day == 24
    assert r["date"].year == 2013 and r["date"].month == 5 and r["date"].day == 9


def test_cite_journal_doi_hash_and_numbered_person(refs):
    r = refs["refs"]["Different Types of Data"]
    assert r["md5hash"] == md5("sandbox.wiki", "10.17645/pag.v6i1.1183")
    assert r["year"].year == 2018
    p = r["persons"][0]
    assert (p["role"], p["ordinal"], p["given"], p["surname"]) == ("unknown", 1, "Svend-Erik", "Skaaning")


def test_cite_book_doi_beats_isbn_and_markup_cleanup(refs):
    r = refs["refs"]["Analytical Theory of Democracy"]
    assert r["md5hash"] == md5("sandbox.wiki", "10.1007/978-3-030-39691-6")
    assert r["isbn"] == "978-3-030-39690-9"
    assert r["isbn_13"] == "978-3-030-39690-9"
    assert r["isbn_10"] is None
    assert r["publisher"] == "Springer"  # [[Springer|Springer-Verlag]] → first part
    assert r["location"] == "Cham, Switzerland"


def test_url_template_first_parameter(refs):
    r = refs["refs"]["chkchkchk.net"]
    assert r["url"] is None  # no scheme → not promoted to url
    assert r["md5hash"] == md5("sandbox.wiki", "chkchkchk.net")


def test_bad_url_nulled_and_rejected(refs):
    r = refs["refs"]["Bad"]
    assert r["url"] is None
    assert r["first_level_domain_of_url"] is None
    url_rejects = [x for x in refs["rejects"] if x["rule"] == "url_exceptions"]
    assert len(url_rejects) == 1


def test_google_books_template_in_url(refs):
    r = refs["refs"]["GB"]
    assert r["google_books_id"] == "CDJpAAAAMAAJ"
    assert r["url"] == "https://books.google.com/books?id=CDJpAAAAMAAJ"
    assert r["md5hash"] == md5("sandbox.wiki", "https://books.google.com/books?id=CDJpAAAAMAAJ")
    # the GoogleBooks entity hash (google_books.py:47-54): template-parsed
    # ids get their own md5(wikibase_title + id) alongside the reference hash
    assert r["google_books_hash"] == md5("sandbox.wiki", "CDJpAAAAMAAJ")


def test_internet_archive_id(refs):
    r = refs["refs"]["IA"]
    assert r["internet_archive_id"] == "catalogueofshipw0000wils"
    assert r["first_level_domain_of_url"] == "archive.org"


def test_google_books_id_from_query(refs):
    r = refs["refs"]["GBQ"]
    assert r["google_books_id"] == "on0TaPqFXbcC"
    assert r["first_level_domain_of_url"] == "google.ca"
    # query-param-detected ids are NOT hashed (the reference only builds a
    # GoogleBooks entity from the {{google books}} template, not from ?id=)
    assert r["google_books_hash"] is None


def test_place_lang_merge(refs):
    r = refs["refs"]["Merge"]
    assert r["location"] == "Copenhagen"
    assert r["language"] == "English"
    assert r["md5hash"] is None  # nothing hashable
    unhashable = [x for x in refs["rejects"] if x["rule"] == "unhashable_reference"]
    assert len(unhashable) >= 1


def test_isbn_template_and_bad_length(refs):
    r = refs["refs"]["12345"]
    assert r["isbn"] == "12345"
    assert r["isbn_10"] is None and r["isbn_13"] is None
    bad = [x for x in refs["rejects"] if x["rule"] == "isbn_exceptions"]
    assert len(bad) == 1
    # isbn template still hashes from the isbn chain arm
    assert r["md5hash"] == md5("sandbox.wiki", "12345")


@pytest.mark.parametrize(
    "value,expected",
    [
        ("2013-01-01", (2013, 1, 1)),
        ("May 9, 2013", (2013, 5, 9)),
        ("Jul 9, 2013", (2013, 7, 9)),
        ("May 25, 2012a", (2012, 5, 25)),
        ("1 September 2003", (2003, 9, 1)),
        ("26 Dec 1996", (1996, 12, 26)),
        ("September 2003", (2003, 9, 1)),
        ("Sep 2003", (2003, 9, 1)),
        ("2003", (2003, 1, 1)),
        ("not a date", None),
    ],
)
def test_date_formats(spark, value, expected):
    from wcdimportbot_spark.functions.columns import parse_multiformat_date

    row = spark.createDataFrame([(value,)], "v string").select(
        parse_multiformat_date(F.col("v")).alias("d")
    ).collect()[0]
    if expected is None:
        assert row["d"] is None
    else:
        assert (row["d"].year, row["d"].month, row["d"].day) == expected


def test_key_fixes(spark):
    pages = spark.createDataFrame(
        [(1, "{{cite web |accessdate=2020-12-03 |archive-date=2021-07-23 |ISBN=978-3-030-39690-9 "
             "|class=X |authorlink1=SomeLink |url=https://e.com/ |title=K}}")],
        "page_id long, wikitext string",
    )
    raw = fix_param_keys(filter_supported_templates(extract_raw_templates(pages)))
    params = raw.collect()[0]["params"]
    assert params["access_date"] == "2020-12-03"
    assert params["archive_date"] == "2021-07-23"
    assert params["isbn"] == "978-3-030-39690-9"
    assert params["news_class"] == "X"
    assert params["author_link1"] == "SomeLink"
    assert "accessdate" not in params and "archive-date" not in params


def test_persons_both_digit_positions(spark):
    pages = spark.createDataFrame(
        [(1, "{{cite book |author2_first=B2f |author2_last=B2l |author_first1=A1f |author_last1=A1l "
             "|editor=John Niel |editor2=Ed Two |translator_link=TL |title=P}}")],
        "page_id long, wikitext string",
    )
    raw = fix_param_keys(filter_supported_templates(extract_raw_templates(pages)))
    valid, _ = split_valid_and_rejects(raw)
    r = build_references(valid).collect()[0]
    by_role = {}
    for p in r["persons"]:
        by_role.setdefault(p["role"], []).append(p)
    authors = by_role["author"]
    assert [(p["ordinal"], p["given"], p["surname"]) for p in authors] == [
        (1, "A1f", "A1l"),
        (2, "B2f", "B2l"),
    ]
    editors = by_role["editor"]
    assert editors[0]["name_string"] == "John Niel" and editors[0]["ordinal"] is None
    assert editors[1]["name_string"] == "Ed Two" and editors[1]["ordinal"] == 2
    # translator_link alone: unnumbered person with any-field rule
    assert by_role["translator"][0]["link"] == "TL"


def test_shorten_matches_textwrap(spark):
    """shorten() replicates textwrap.shorten(placeholder='...') on
    space-delimited text (crud/__init__.py:194,270,615); hyphen-breaking is
    a documented deviation and excluded here."""
    import textwrap

    from wcdimportbot_spark.functions.columns import shorten

    samples = [
        "goldenrod lavender spring chocolate lace",
        "hello world this is",
        "hello  world",
        "longsingleword",
        "abc def ghij",
        "abcdefg hi",
        "abcdefgh",
        "ab cdefghij",
        "  padded   words  here  ",
        "x",
        "",
    ]
    for width in (10, 20, 240):
        df = spark.createDataFrame([(s,) for s in samples], "s string")
        got = [r["t"] for r in df.select(shorten(F.col("s"), width).alias("t")).collect()]
        want = [textwrap.shorten(s, width, placeholder="...") for s in samples]
        assert got == want, f"width={width}: {got} != {want}"


def test_map_key_dedup_is_config_independent(spark):
    """Renames/canonicalization that collide keys must not depend on
    spark.sql.mapKeyDedupPolicy=LAST_WIN being set by the session factory."""
    from wcdimportbot_spark.operators.persons import canonicalize_person_keys

    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        # both alias variants present -> same key after rename
        pages = spark.createDataFrame(
            [(1, "{{cite web |accessdate=2020-01-01 |access_date=2021-02-02 "
                 "|url=https://e.com/ |title=K}}")],
            "page_id long, wikitext string",
        )
        raw = fix_param_keys(filter_supported_templates(extract_raw_templates(pages)))
        params = raw.collect()[0]["params"]
        assert params["access_date"] == "2021-02-02"  # last wins

        # both digit positions present -> same key after canonicalization
        df = spark.createDataFrame(
            [({"author2_first": "MidDigit", "author_first2": "TrailDigit"},)],
            "params map<string,string>",
        )
        out = df.select(
            canonicalize_person_keys(F.col("params")).alias("p")
        ).collect()[0]["p"]
        # one deduped key, no DUPLICATE_MAP_KEY throw; which value wins
        # follows map entry order (insertion order is not guaranteed for
        # maps built from python dicts, so only the dedup is asserted)
        assert set(out) == {"author_first2"}
        assert out["author_first2"] in {"MidDigit", "TrailDigit"}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
