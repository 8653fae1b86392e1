"""Graph emission: references/pages/websites → ``items`` + ``claims`` tables.

Re-expresses the reference's Wikibase item/claim construction
(``crud/__init__.py:96-891,937-1069``) as two long-format DataFrames
(SURVEY §1.1 "Graph"):

- ``items(qid, instance_of, label, description, hash)``
- ``claims(subject_qid, property, datatype, value_string, value_qid,
  value_time, value_quantity, qualifiers, ref_page_revision_id,
  ref_retrieved_date)``

QID assignment is **deterministic**: ``Q`` + the entity's md5 hash. The
reference gets QIDs from sequential Wikibase writes and then has to join
them back through a cache (J1/J3/J6); hash-derived ids make every edge
computable without any lookup join and are stable across retries (SURVEY
§7.3 "idempotent sink"). A real-Wikibase sink adapter can map them to
numeric QIDs at the boundary.

Claim construction is a per-row array-of-structs projection followed by one
``explode`` — no shuffle, no UDF; at 100 TB the only shuffles in graph
emission are the two ``dropDuplicates`` (by reference hash and by website
hash), both map-side-combinable.

Documented intent-vs-fidelity deviations (SURVEY §1.4):
- editor/translator person claims use ``editors_list``/``translators_list``
  (the reference passes ``interviewers_list`` to both and emits translator
  claims under INTERVIEWER_STRING — copy-paste bugs,
  ``crud/__init__.py:136-151``).
- person qualifiers are attached when *any* qualifier field is present (the
  reference's gate tests ``given or given or orcid or number_in_sequence``,
  dropping qualifiers for surname-only persons, ``crud/__init__.py:339-345``).
- string-citation access_date is emitted even when archive_date is absent
  (the reference resets ``access_date = None`` in the else-branch of the
  archive_date check, ``crud/__init__.py:996-1010``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.columns import (
    has_url_scheme,
    shorten,
    underscored_title,
    wikibase_time,
)
from wcdimportbot_spark.functions.expr_memo import memo_expr
from wcdimportbot_spark.functions.hashing import DEFAULT_WIKIBASE_TITLE, page_hash

#: item QID standing for the source language edition
#: (wcdqid_language_edition_of_wikipedia_to_work_on in the reference config)
ENGLISH_WIKIPEDIA_QID = "QENWIKI"

ITEM_TYPES = ("WIKIPEDIA_PAGE", "WIKIPEDIA_REFERENCE", "WEBSITE_ITEM")

#: property → datatype registry (dictionaries.py:33-124)
PROPERTY_DATATYPES: dict[str, str] = {
    "ACCESS_DATE": "time",
    "ARCHIVE": "wikibase-item",
    "ARCHIVE_DATE": "time",
    "ARCHIVE_URL": "url",
    "CHAPTER_URL": "url",
    "CITATIONS": "wikibase-item",
    "CONFERENCE_URL": "url",
    "DOI": "externalid",
    "EDITOR_NAME_STRING": "string",
    "FAMILY_NAME": "string",
    "FIRST_LEVEL_DOMAIN_STRING": "string",
    "FULL_NAME_STRING": "string",
    "GIVEN_NAME": "string",
    "GOOGLE_BOOKS_ID": "externalid",
    "HASH": "string",
    "HOST_STRING": "string",
    "INSTANCE_OF": "wikibase-item",
    "INTERNET_ARCHIVE_ID": "externalid",
    "INTERVIEWER_STRING": "string",
    "ISBN_10": "externalid",
    "ISBN_13": "externalid",
    "LAST_UPDATE": "time",
    "LAY_URL": "url",
    "LOCATION_STRING": "string",
    "LUMPED_AUTHORS": "string",
    "MEDIAWIKI_PAGE_ID": "externalid",
    "NAME_MASK": "string",
    "OCLC_CONTROL_NUMBER": "externalid",
    "ORCID": "externalid",
    "PAGE_REVISION_ID": "string",
    "PERIODICAL_STRING": "string",
    "PMID": "externalid",
    "PUBLICATION_DATE": "time",
    "PUBLISHED_IN": "wikibase-item",
    "PUBLISHER_STRING": "string",
    "TRANSCRIPT_URL": "url",
    "RETRIEVED_DATE": "time",
    "SERIES_ORDINAL": "quantity",
    "SOURCE_WIKIPEDIA": "wikibase-item",
    "STRING_CITATIONS": "string",
    "TEMPLATE_NAME": "string",
    "TITLE": "string",
    "TRANSLATOR_NAME_STRING": "string",
    "URL": "url",
    "WEBSITE": "wikibase-item",
    "WEBSITE_STRING": "string",
    "WIKIDATA_QID": "externalid",
}

_ROLE_PROPERTY = {
    "author": "FULL_NAME_STRING",
    "unknown": "FULL_NAME_STRING",  # assume_persons_without_role_are_authors
    "editor": "EDITOR_NAME_STRING",
    "host": "HOST_STRING",
    "interviewer": "INTERVIEWER_STRING",
    "translator": "TRANSLATOR_NAME_STRING",
}


def qid_from_hash(hash_col: Column) -> Column:
    return F.concat(F.lit("Q"), hash_col)


# --- claim struct helpers ---------------------------------------------------

_QUAL_TYPE = "array<struct<property:string,datatype:string,value:string>>"


def _null_s() -> Column:
    return F.lit(None).cast("string")


def _null_d() -> Column:
    return F.lit(None).cast("double")


def _qualifier(prop: str, value: Column) -> Column:
    return F.when(
        value.isNotNull(),
        F.struct(
            F.lit(prop).alias("property"),
            F.lit(PROPERTY_DATATYPES[prop]).alias("datatype"),
            value.cast("string").alias("value"),
        ),
    )


def _claim(
    prop: str,
    value: Column,
    qualifiers: Column | None = None,
    when: Column | None = None,
) -> Column:
    """Build one claim struct; NULL (pruned by array_compact) when the value
    — or the extra ``when`` condition — is absent."""
    dt = PROPERTY_DATATYPES[prop]
    vs = value if dt in ("string", "externalid", "url") else _null_s()
    vq = value if dt == "wikibase-item" else _null_s()
    vt = value if dt == "time" else _null_s()
    vqty = value.cast("double") if dt == "quantity" else _null_d()
    quals = (
        qualifiers if qualifiers is not None else F.lit(None).cast(_QUAL_TYPE)
    )
    cond = value.isNotNull() if when is None else (value.isNotNull() & when)
    return F.when(
        cond,
        F.struct(
            F.lit(prop).alias("property"),
            F.lit(dt).alias("datatype"),
            vs.cast("string").alias("value_string"),
            vq.cast("string").alias("value_qid"),
            vt.cast("string").alias("value_time"),
            vqty.alias("value_quantity"),
            quals.alias("qualifiers"),
        ),
    )


def _explode_claims(
    df: DataFrame, subject_qid: Column, claims_array: Column
) -> DataFrame:
    return (
        df.select(
            subject_qid.alias("subject_qid"),
            F.explode(F.array_compact(claims_array)).alias("c"),
            F.col("_rev_id").alias("ref_page_revision_id"),
            F.col("_retrieved").alias("ref_retrieved_date"),
        )
        .select(
            "subject_qid",
            "c.property",
            "c.datatype",
            "c.value_string",
            "c.value_qid",
            "c.value_time",
            "c.value_quantity",
            "c.qualifiers",
            "ref_page_revision_id",
            "ref_retrieved_date",
        )
    )


def _person_claims_array(persons: Column, url_ok) -> Column:
    """F24 persons → one claim struct per person with qualifiers
    (crud/__init__.py:303-382)."""

    def one(p: Column) -> Column:
        from wcdimportbot_spark.functions.columns import person_full_name

        full_name = person_full_name(p["name_string"], p["given"], p["surname"])
        quals = F.array_compact(
            F.array(
                _qualifier("GIVEN_NAME", p["given"]),
                _qualifier("FAMILY_NAME", p["surname"]),
                _qualifier("SERIES_ORDINAL", p["ordinal"]),
                _qualifier("URL", F.when(url_ok(p["link"]), p["link"])),
                _qualifier("NAME_MASK", p["mask"]),
            )
        )
        prop_expr = F.lit("FULL_NAME_STRING")
        dt_expr = F.lit("string")
        for role, prop in _ROLE_PROPERTY.items():
            prop_expr = F.when(p["role"] == role, F.lit(prop)).otherwise(prop_expr)
        return F.when(
            full_name != "",
            F.struct(
                prop_expr.alias("property"),
                dt_expr.alias("datatype"),
                full_name.alias("value_string"),
                _null_s().alias("value_qid"),
                _null_s().alias("value_time"),
                _null_d().alias("value_quantity"),
                F.when(F.size(quals) > 0, quals)
                .otherwise(F.lit(None).cast(_QUAL_TYPE))
                .alias("qualifiers"),
            ),
        )

    return F.transform(persons, one)


# --- items ------------------------------------------------------------------


def reference_items(refs: DataFrame) -> DataFrame:
    """One item per unique reference hash (A6 global dedup). Label rule
    ``'<title ≤240>… | <hash[:7]>'`` (crud/__init__.py:189-204)."""
    hashed = refs.filter(F.col("md5hash").isNotNull()).dropDuplicates(["md5hash"])
    label = F.concat(
        F.coalesce(shorten(F.col("title"), 240), F.lit("Title missing")),
        F.lit(" | "),
        F.substring("md5hash", 1, 7),
    )
    return hashed.select(
        qid_from_hash(F.col("md5hash")).alias("qid"),
        F.lit("WIKIPEDIA_REFERENCE").alias("instance_of"),
        label.alias("label"),
        F.lit("reference from Wikipedia").alias("description"),
        F.col("md5hash").alias("hash"),
    )


def website_items(refs: DataFrame) -> DataFrame:
    """One item per unique first-level domain (J3 target)."""
    sites = (
        refs.filter(F.col("first_level_domain_of_url_hash").isNotNull())
        .select(
            "first_level_domain_of_url", "first_level_domain_of_url_hash"
        )
        .dropDuplicates(["first_level_domain_of_url_hash"])
    )
    return sites.select(
        qid_from_hash(F.col("first_level_domain_of_url_hash")).alias("qid"),
        F.lit("WEBSITE_ITEM").alias("instance_of"),
        F.col("first_level_domain_of_url").alias("label"),
        F.lit("website referenced from Wikipedia").alias("description"),
        F.col("first_level_domain_of_url_hash").alias("hash"),
    )


def page_items(
    pages: DataFrame, wikibase_title: str = DEFAULT_WIKIBASE_TITLE
) -> DataFrame:
    hashed = pages.withColumn(
        "md5hash",
        page_hash(F.col("title"), F.col("language_code"), F.col("page_id"), wikibase_title),
    )
    return hashed.select(
        qid_from_hash(F.col("md5hash")).alias("qid"),
        F.lit("WIKIPEDIA_PAGE").alias("instance_of"),
        shorten(F.col("title"), 250).alias("label"),
        F.concat(
            F.lit("page from "), F.col("language_code"), F.lit(":Wikipedia")
        ).alias("description"),
        F.col("md5hash").alias("hash"),
    )


# --- claims -----------------------------------------------------------------


def _with_provenance(df: DataFrame, retrieved_date: Column) -> DataFrame:
    """F26 — every claim carries (PAGE_REVISION_ID, RETRIEVED_DATE)
    (crud/__init__.py:381-410)."""
    rev = (
        F.col("latest_revision_id").cast("string")
        if "latest_revision_id" in df.columns
        else F.lit(None).cast("string")
    )
    return df.withColumn("_rev_id", rev).withColumn(
        "_retrieved", wikibase_time(retrieved_date)
    )


def reference_claims(
    refs: DataFrame, retrieved_date: Column | None = None
) -> DataFrame:
    """Claims for unique hashed reference items (F24)."""
    # the 30-claim array + person transform is ~500 py4j constructions
    # (~1 s of driver wall); the tree depends only on retrieved_date, so
    # the default-date form (every store-import path) is built once per
    # JVM (functions/expr_memo.py) — an explicit date builds fresh
    if retrieved_date is None:
        all_claims = memo_expr(
            ("reference_all_claims",), lambda: _reference_all_claims(None)
        )
        retrieved_date = F.current_date()
    else:
        all_claims = _reference_all_claims(retrieved_date)
    hashed = _with_provenance(
        refs.filter(F.col("md5hash").isNotNull()).dropDuplicates(["md5hash"]),
        retrieved_date,
    )
    return _explode_claims(
        hashed.withColumn("_all", all_claims),
        qid_from_hash(F.col("md5hash")),
        F.col("_all"),
    )


def _reference_all_claims(retrieved_date: Column | None) -> Column:
    """The full F24 claims-array expression for one normalized reference
    row (persons + singles). Pure tree over ``F.col``/literals except
    ``retrieved_date`` (``None`` → ``current_date()``)."""
    retrieved_date = (
        retrieved_date if retrieved_date is not None else F.current_date()
    )
    url_len_ok = lambda c: F.length(c) <= 500  # noqa: E731
    archive_qual = F.when(
        F.col("detected_archive_of_archive_url").isNotNull(),
        F.array_compact(
            F.array(
                _qualifier(
                    "ARCHIVE",
                    F.concat(F.lit("Q"), F.col("detected_archive_of_archive_url")),
                )
            )
        ),
    )
    single = F.array(
        # website edge — deterministic qid, no lookup join needed (J3)
        _claim("WEBSITE", qid_from_hash(F.col("first_level_domain_of_url_hash"))),
        # always present (crud/__init__.py:451-497)
        _claim("HASH", F.col("md5hash")),
        _claim("INSTANCE_OF", F.lit("WIKIPEDIA_REFERENCE")),
        _claim("RETRIEVED_DATE", wikibase_time(retrieved_date)),
        _claim("SOURCE_WIKIPEDIA", F.lit(ENGLISH_WIKIPEDIA_QID)),
        _claim("TEMPLATE_NAME", F.col("template_name")),
        # external identifiers (crud/__init__.py:498-579)
        _claim("DOI", F.col("doi")),
        _claim("GOOGLE_BOOKS_ID", F.col("google_books_id")),
        _claim("INTERNET_ARCHIVE_ID", F.col("internet_archive_id")),
        _claim("ISBN_10", F.col("isbn_10")),
        _claim("ISBN_13", F.col("isbn_13")),
        _claim("OCLC_CONTROL_NUMBER", F.col("oclc")),
        _claim("PMID", F.col("pmid")),
        _claim("WIKIDATA_QID", F.col("wikidata_qid")),
        # strings (crud/__init__.py:581-642)
        _claim("LOCATION_STRING", F.col("location")),
        _claim("LUMPED_AUTHORS", F.col("vauthors")),
        _claim("PERIODICAL_STRING", F.col("periodical")),
        _claim("PUBLISHER_STRING", F.col("publisher")),
        _claim("TITLE", shorten(F.col("title"), 400)),
        _claim("WEBSITE_STRING", F.col("website")),
        # dates (crud/__init__.py:644-681)
        _claim("ACCESS_DATE", wikibase_time(F.col("access_date"))),
        _claim("PUBLICATION_DATE", wikibase_time(F.col("publication_date"))),
        # urls, ≤500 chars (crud/__init__.py:683-792)
        _claim("ARCHIVE_URL", F.col("archive_url"), qualifiers=archive_qual,
               when=url_len_ok(F.col("archive_url"))),
        _claim("URL", F.col("url"), when=url_len_ok(F.col("url"))),
        _claim("CHAPTER_URL", F.col("chapter_url"), when=url_len_ok(F.col("chapter_url"))),
        _claim("CONFERENCE_URL", F.col("conference_url"), when=url_len_ok(F.col("conference_url"))),
        _claim("LAY_URL", F.col("lay_url"), when=url_len_ok(F.col("lay_url"))),
        _claim("TRANSCRIPT_URL", F.col("transcripturl"), when=url_len_ok(F.col("transcripturl"))),
    )
    persons = _person_claims_array(F.col("persons"), has_url_scheme)
    return F.concat(F.array_compact(persons), F.array_compact(single))


def website_claims(
    refs: DataFrame, retrieved_date: Column | None = None
) -> DataFrame:
    """Claims for website items (crud/__init__.py:794-832)."""
    retrieved_date = (
        retrieved_date if retrieved_date is not None else F.current_date()
    )
    sites = _with_provenance(
        refs.filter(F.col("first_level_domain_of_url_hash").isNotNull())
        .select("first_level_domain_of_url", "first_level_domain_of_url_hash")
        .dropDuplicates(["first_level_domain_of_url_hash"]),
        retrieved_date,
    )
    arr = F.array(
        _claim("INSTANCE_OF", F.lit("WEBSITE_ITEM")),
        _claim("SOURCE_WIKIPEDIA", F.lit(ENGLISH_WIKIPEDIA_QID)),
        _claim("FIRST_LEVEL_DOMAIN_STRING", F.col("first_level_domain_of_url")),
        _claim("HASH", F.col("first_level_domain_of_url_hash")),
    )
    return _explode_claims(
        sites.withColumn("_all", arr),
        qid_from_hash(F.col("first_level_domain_of_url_hash")),
        F.col("_all"),
    )


def _string_citation_qualifiers(url_ok) -> Column:
    """F25 qualifiers (crud/__init__.py:958-1052) + string author/editor/
    translator person qualifiers."""
    person_quals = F.transform(
        F.filter(
            F.col("persons"),
            lambda p: p["role"].isin("author", "unknown", "editor", "translator"),
        ),
        lambda p: F.when(
            F.coalesce(
                F.when(F.trim(p["name_string"]) != "", F.trim(p["name_string"])),
                F.when(
                    F.trim(F.concat_ws(" ", p["given"], p["surname"])) != "",
                    F.trim(F.concat_ws(" ", p["given"], p["surname"])),
                ),
            ).isNotNull(),
            F.struct(
                F.when(p["role"].isin("author", "unknown"), F.lit("FULL_NAME_STRING"))
                .when(p["role"] == "editor", F.lit("EDITOR_NAME_STRING"))
                .otherwise(F.lit("TRANSLATOR_NAME_STRING"))
                .alias("property"),
                F.lit("string").alias("datatype"),
                F.coalesce(
                    F.when(F.trim(p["name_string"]) != "", F.trim(p["name_string"])),
                    F.trim(F.concat_ws(" ", p["given"], p["surname"])),
                ).alias("value"),
            ),
        ),
    )
    scalar_quals = F.array(
        _qualifier("ACCESS_DATE", wikibase_time(F.col("access_date"))),
        _qualifier("ARCHIVE_DATE", wikibase_time(F.col("archive_date"))),
        _qualifier("ARCHIVE_URL", F.col("archive_url")),
        _qualifier("PUBLICATION_DATE", wikibase_time(F.col("publication_date"))),
        _qualifier("TITLE", F.col("title")),
        _qualifier("URL", F.col("url")),
        _qualifier("WEBSITE_STRING", F.col("website")),
    )
    return F.concat(F.array_compact(person_quals), F.array_compact(scalar_quals))


def page_claims(
    pages: DataFrame,
    refs: DataFrame,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
    retrieved_date: Column | None = None,
) -> DataFrame:
    """Page-item claims: CITATIONS edges (J5), string citations (F25), and
    single-value page claims (crud/__init__.py:834-890).

    The two big claim trees (string-citation qualifiers, single-value
    array) are pure over ``F.col``/literals (+ wikibase_title /
    retrieved_date), so the default-date form — every store-import path —
    is built once per JVM (functions/expr_memo.py)."""
    default_date = retrieved_date is None
    retrieved_date = (
        retrieved_date if retrieved_date is not None else F.current_date()
    )
    pages_h = pages.withColumn(
        "_page_qid",
        qid_from_hash(
            page_hash(
                F.col("title"), F.col("language_code"), F.col("page_id"), wikibase_title
            )
        ),
    )

    # J5 — one CITATIONS claim per in-page-unique hashed reference (A5 dedup)
    cited = (
        refs.filter(F.col("md5hash").isNotNull())
        .select("page_id", "md5hash")
        .dropDuplicates(["page_id", "md5hash"])
    )
    citation_edges = (
        pages_h.select("page_id", "_page_qid", "latest_revision_id")
        .join(cited, "page_id")
        .withColumn("_all", F.array(_claim("CITATIONS", qid_from_hash(F.col("md5hash")))))
    )
    citation_claims = _explode_claims(
        _with_provenance(citation_edges, retrieved_date),
        F.col("_page_qid"),
        F.col("_all"),
    )

    # F25 — string citations for unhashable references (provenance comes
    # from the page side; drop a refs-side copy if the caller joined one)
    unhashed = refs.filter(F.col("md5hash").isNull()).drop("latest_revision_id")
    string_cits = (
        pages_h.select("page_id", "_page_qid", "latest_revision_id")
        .join(unhashed, "page_id")
        .withColumn(
            "_all",
            memo_expr(
                ("string_citation_claim_array",),
                lambda: F.array(
                    _claim(
                        "STRING_CITATIONS",
                        F.col("template_name"),
                        qualifiers=_string_citation_qualifiers(has_url_scheme),
                    )
                ),
            ),
        )
    )
    string_claims = _explode_claims(
        _with_provenance(string_cits, retrieved_date),
        F.col("_page_qid"),
        F.col("_all"),
    )

    # single-value page claims
    if default_date:
        page_singles = memo_expr(
            ("page_single_claims", wikibase_title),
            lambda: _page_single_claims(wikibase_title, F.current_date()),
        )
    else:
        page_singles = _page_single_claims(wikibase_title, retrieved_date)
    singles = pages_h.withColumn("_all", page_singles)
    single_claims = _explode_claims(
        _with_provenance(singles, retrieved_date), F.col("_page_qid"), F.col("_all")
    )
    return citation_claims.unionByName(string_claims).unionByName(single_claims)


def _page_single_claims(wikibase_title: str, retrieved_date: Column) -> Column:
    """The single-value page-claims array for one page row — pure tree
    over ``F.col``/literals + (wikibase_title, retrieved_date)."""
    absolute_url = F.concat(
        F.lit("https://"),
        F.col("language_code"),
        F.lit(".wikipedia.org/wiki/"),
        underscored_title(F.col("title")),
    )
    page_hash_col = page_hash(
        F.col("title"), F.col("language_code"), F.col("page_id"), wikibase_title
    )
    return F.array(
        _claim("URL", absolute_url),
        _claim("HASH", page_hash_col),
        _claim("INSTANCE_OF", F.lit("WIKIPEDIA_PAGE")),
        _claim("LAST_UPDATE", wikibase_time(retrieved_date)),
        _claim("MEDIAWIKI_PAGE_ID", F.col("page_id").cast("string")),
        _claim("PUBLISHED_IN", F.lit(ENGLISH_WIKIPEDIA_QID)),
        _claim("TITLE", F.col("title")),
    )


def build_items(
    pages: DataFrame,
    refs: DataFrame,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
) -> DataFrame:
    """Item emission only. Kept separate from :func:`build_claims` because
    the claims plan is hundreds of typed claim-struct expressions whose
    driver-side construction/analysis costs seconds — items-only consumers
    (item counts, the cache-mapping sink) must not pay for it."""
    return (
        page_items(pages, wikibase_title)
        .unionByName(reference_items(refs))
        .unionByName(website_items(refs))
    )


def build_claims(
    pages: DataFrame,
    refs: DataFrame,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
    retrieved_date: Column | None = None,
) -> DataFrame:
    """Claim emission only (see :func:`build_items` for why it is split)."""
    return (
        page_claims(pages, refs, wikibase_title, retrieved_date)
        .unionByName(reference_claims(refs, retrieved_date))
        .unionByName(website_claims(refs, retrieved_date))
    )


def build_graph(
    pages: DataFrame,
    refs: DataFrame,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
    retrieved_date: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full graph emission: (items, claims)."""
    return (
        build_items(pages, refs, wikibase_title),
        build_claims(pages, refs, wikibase_title, retrieved_date),
    )
