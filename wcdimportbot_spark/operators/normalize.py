"""Reference normalization: raw templates → typed wide ``references`` rows.

Implements the reference's ``finish_parsing_and_generate_hash`` pipeline
(``wikipedia_page_reference.py:1168-1183``) as one declarative projection:

    first_parameter (F20) → urls (F6) → fld (F5) → archive detect (J7,
    intent order — see columns.detect_archive) → IA id (F9) → GB id (F7/F8)
    → isbn (F10) → persons (F15) → markup cleanup (F11) → lang/place merges
    (F18/F19) → hashes (F3/F4)

plus the typed date columns (F12) and the rejects side-channel (S11).

Everything is Catalyst expressions over the ``params`` map — a single
narrow (shuffle-free) stage after extraction. The wide promoted columns are
the ones downstream consumers (graph emission, analytics, dedup) read; the
full params map is retained for fidelity and late promotion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.functions import columns as C
from wcdimportbot_spark.functions import hashing as H
from wcdimportbot_spark.functions.expr_memo import memo_expr
from wcdimportbot_spark.functions.template_fields import DATE_FIELDS
from wcdimportbot_spark.operators.persons import (
    parsed_person_entries,
    persons_from_parsed,
    sorted_person_pairs,
)

#: string params promoted to top-level typed columns (FIXTURES.md §3 core set)
PROMOTED_STRING_FIELDS = (
    "title",
    "website",
    "publisher",
    "location",
    "place",
    "lang",
    "language",
    "periodical",
    "journal",
    "magazine",
    "newspaper",
    "series",
    "volume",
    "issue",
    "page",
    "pages",
    "agency",
    "doi",
    "pmid",
    "pmc",
    "oclc",
    "lccn",
    "s2cid",
    "jstor",
    "arxiv",
    "bibcode",
    "hdl",
    "issn",
    "eissn",
    "ol",
    "osti",
    "rfc",
    "ssrn",
    "zbl",
    "url_status",
    "trans_title",
    "vauthors",
    "authors",
    "work",
    "chapter",
    "edition",
    "type",
    "degree",
    "quote",
    "first_parameter",
    "second_parameter",
    "archive_url",
    "chapter_url",
    "conference_url",
    "lay_url",
    "transcripturl",
)


def build_references(
    raw_valid: DataFrame, wikibase_title: str = H.DEFAULT_WIKIBASE_TITLE
) -> DataFrame:
    """``raw_templates`` (post key-fix + validation) -> wide ``references``.

    One narrow projection; no shuffle, no UDF.

    Structured as FIVE batched passes (one ``select`` + four ``withColumns``)
    instead of one ``withColumn`` per derived field: every Dataset
    transformation runs the JVM analyzer eagerly over the whole accumulated
    plan, and with ~35 chained ``withColumn`` calls on this wide plan the
    analysis alone cost multiple seconds per query -- more than executing
    it. Within a batch every expression resolves against the batch's INPUT,
    so each pass may only reference columns produced by earlier passes;
    short-lived intermediates (the F20-resolved url, the google-books
    rewrite) are inlined rather than materialized, trading a few duplicated
    cheap regex evaluations for an order of magnitude fewer analyzer runs.

    The only non-projection steps are the F5 broadcast suffix-table joins
    (functions/psl.py) — still shuffle-free.

    Each pass's expression set is a PURE tree over ``F.col``/literals (+
    the ``wikibase_title`` string), so construction is memoized per JVM
    (functions/expr_memo.py): building these ~600 nodes costs ~1-2 s of
    driver py4j wall per call, and import-heavy scenario rows call this
    several times per run."""
    # --- pass 1 (select): promote strings + F20 disambiguation -------------
    df = raw_valid.select(*memo_expr(("br_pass1",), _br_pass1_cols))

    # --- pass 2: F7 google-books url rewrite + F6/P11 scheme guard ---------
    df = df.withColumns(memo_expr(("br_pass2",), _br_pass2_cols))

    # --- pass 2b: flds (F5) — per-arity broadcast suffix joins -------------
    df = C.with_first_level_domain(df, "url", "first_level_domain_of_url")
    df = C.with_first_level_domain(
        df, "archive_url", "first_level_domain_of_archive_url"
    )

    # --- pass 3: isbn (F10), dates (F12), publisher markup (F11),
    # lang/place merges (F18/F19), person-key parse (F15) -------------------
    df = df.withColumns(memo_expr(("br_pass3",), _br_pass3_cols))

    # --- pass 4: archive detect (J7), external ids (F8/F9), isbn split,
    # persons assembly (F15), hashes (F3/F4, last like the reference) -------
    df = df.withColumns(
        memo_expr(
            ("br_pass4", wikibase_title), lambda: _br_pass4_cols(wikibase_title)
        )
    )

    # --- pass 5: presence flags (P9/P10) -----------------------------------
    df = df.withColumns(memo_expr(("br_pass5",), _br_pass5_cols))
    # keep the raw isbn string param and parse scratch out of the surface
    return df.drop("isbn_raw", "_gb_template_id", "_pparsed")


def _br_pass1_cols() -> tuple:
    p = F.col("params")
    tn = F.col("template_name")
    fp = p["first_parameter"]
    # F20: {{url}} first parameter is the url (if it looks like one)
    url0 = F.when(tn == "url", F.when(fp.contains("://"), fp)).otherwise(p["url"])
    promote = [p[f].alias(f) for f in PROMOTED_STRING_FIELDS if f != "url"]
    return (
        "page_id",
        "template_name",
        "template_ordinal",
        "params",
        *promote,
        url0.alias("url"),
        # F20: {{cite q}} first parameter is a wikidata qid
        F.when(
            tn.isin("cite q", "citeq")
            & fp.isNotNull()
            & F.lower(F.substring(fp, 1, 1)).eqNullSafe("q"),
            fp,
        ).alias("wikidata_qid"),
        # F20: {{isbn}} first parameter is the isbn
        F.when(tn == "isbn", fp).otherwise(p["isbn"]).alias("isbn_raw"),
    )


def _br_pass2_cols() -> dict:
    gb_tpl_id = C.google_books_template_id(F.col("url"))
    url1 = F.when(
        gb_tpl_id.isNotNull(), C.canonical_google_books_url(gb_tpl_id)
    ).otherwise(F.col("url"))
    return {
        "_gb_template_id": gb_tpl_id,
        "_url_missing_scheme": url1.isNotNull() & ~C.has_url_scheme(url1),
        # reference nulls only self.url on a missing scheme (F6/P11)
        "url": C.url_with_scheme_or_null(url1),
    }


def _br_pass3_cols() -> dict:
    p = F.col("params")
    pass3 = {
        "isbn": C.isbn_normalized(F.col("isbn_raw")),
        "publisher": C.clean_wiki_markup(F.col("publisher")),
        # conflicts read the INPUT columns (pre-merge), matching the
        # original compute-conflict-then-merge order
        "_lang_conflict": C.merge_conflict(F.col("language"), F.col("lang")),
        "language": C.merge_secondary(F.col("language"), F.col("lang")),
        "_place_conflict": C.merge_conflict(F.col("location"), F.col("place")),
        "location": C.merge_secondary(F.col("location"), F.col("place")),
        "_pparsed": parsed_person_entries(p),
    }
    for field in DATE_FIELDS:
        pass3[field] = C.parse_multiformat_date(p[field])
    return pass3


def _br_pass4_cols(wikibase_title: str) -> dict:
    return {
        "detected_archive_of_archive_url": C.detect_archive(
            F.col("first_level_domain_of_archive_url")
        ),
        "detected_archive_of_url": C.detect_archive(
            F.col("first_level_domain_of_url")
        ),
        "internet_archive_id": C.internet_archive_id_from_path(
            F.col("url"), F.col("first_level_domain_of_url")
        ),
        "google_books_id": F.coalesce(
            F.col("_gb_template_id"),
            C.google_books_id_from_query(
                F.col("url"), F.col("first_level_domain_of_url")
            ),
        ),
        # the reference builds a GoogleBooks entity (with its own
        # md5hash, google_books.py:47-54) ONLY for template-parsed ids
        # (__parse_google_books_template__) — ids detected from the
        # ?id= query param (__detect_google_books_id__) stay unhashed
        "google_books_hash": H.google_books_hash(
            F.col("_gb_template_id"), wikibase_title
        ),
        "isbn_13": C.isbn_13(F.col("isbn")),
        "isbn_10": C.isbn_10(F.col("isbn")),
        "persons": persons_from_parsed(
            F.col("_pparsed"), sorted_person_pairs(F.col("_pparsed"))
        ),
        "md5hash": H.reference_hash(
            H.reference_hash_key(
                F.col("doi"),
                F.col("pmid"),
                F.col("isbn"),
                F.col("oclc"),
                F.col("url"),
                F.col("first_parameter"),
            ),
            wikibase_title,
        ),
        "first_level_domain_of_url_hash": H.website_hash(
            F.col("first_level_domain_of_url"), wikibase_title
        ),
    }


def _br_pass5_cols() -> dict:
    return {
        "has_hash": F.col("md5hash").isNotNull(),
        "has_first_level_domain_url_hash": F.col(
            "first_level_domain_of_url_hash"
        ).isNotNull(),
    }


#: S11 — rejects rules derivable from a normalized references row
def collect_rejects(references: DataFrame) -> DataFrame:
    """Side-output channel (S11): one row per violated rule, schema per
    FIXTURES.md §8. The rules mirror the reference's per-rule log files."""
    key_cols = [F.col("page_id"), F.col("template_ordinal")]

    def channel(cond, rule: str, message):
        return references.filter(cond).select(
            F.lit(rule).alias("rule"), message.alias("message"), *key_cols
        )

    p = F.col("params")
    channels = [
        # url_exceptions.log — url present but scheme missing (P11)
        channel(
            F.col("_url_missing_scheme"),
            "url_exceptions",
            F.concat(F.lit("missing scheme in url: "), F.coalesce(p["url"], F.lit(""))),
        ),
        # isbn_exceptions.log — isbn not 10/13 after dash strip (F10)
        channel(
            C.isbn_invalid_length(F.col("isbn")),
            "isbn_exceptions",
            F.concat(F.lit("isbn not 10 or 13 chars: "), F.col("isbn")),
        ),
        # lang.log — both lang and language populated (F18)
        channel(
            F.col("_lang_conflict"),
            "lang",
            F.concat(F.lit("both lang and language populated: "), p["lang"]),
        ),
        # place.log — both place and location populated (F19)
        channel(
            F.col("_place_conflict"),
            "place",
            F.concat(F.lit("both place and location populated: "), p["place"]),
        ),
        # undetected_archive.log — archive_url whose fld is no known archive (J7)
        channel(
            F.col("archive_url").isNotNull()
            & F.col("first_level_domain_of_archive_url").isNotNull()
            & F.col("detected_archive_of_archive_url").isNull(),
            "undetected_archive",
            F.concat(F.lit("no archive detected for "), F.col("archive_url")),
        ),
        # hashing not possible (P10) — warning channel
        channel(
            ~F.col("has_hash"),
            "unhashable_reference",
            F.concat(
                F.lit("hashing not possible for this instance of "),
                F.col("template_name"),
            ),
        ),
    ]
    out = channels[0]
    for ch in channels[1:]:
        out = out.unionByName(ch)
    return out
