"""Catalyst-native column expression builders for reference normalization.

Every scalar transformation from SURVEY.md §2.7 that the reference implements
as imperative Python is expressed here as a pure Spark Column expression —
JVM-side, whole-stage-codegen'd, no Python in the hot path. Reference
citations are on each function.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.template_fields import KNOWN_ARCHIVES

# ---------------------------------------------------------------------------
# F12 — multi-format date parsing (wikipedia_page_reference.py:1101-1166)
# ---------------------------------------------------------------------------

# (spark datetime pattern, preprocess) pairs for the 9 accepted formats.
# The reference tries strptime formats sequentially; the formats are mutually
# exclusive on result, so a coalesce of try_to_timestamp arms is equivalent.
_DATE_FORMATS = (
    "yyyy-MM-dd",  # 2013-01-01
    "MMMM d, yyyy",  # May 9, 2013
    "MMM d, yyyy",  # Jul 9, 2013
    "d MMMM yyyy",  # 1 September 2003
    "d MMM yyyy",  # 26 Dec 1996
    "MMMM yyyy",  # September 2003
    "MMM yyyy",  # Sep 2003
    "yyyy",  # 2003
)


def parse_multiformat_date(col: Column) -> Column:
    """9-arm date parser; unparseable values yield NULL (reference logs a
    warning and returns None — the NULL rows are surfaced via the rejects
    channel by the caller)."""
    trimmed = F.trim(col)
    arms = [F.try_to_timestamp(trimmed, F.lit(fmt)) for fmt in _DATE_FORMATS]
    # "May 25, 2012a" — strip one trailing letter then retry the
    # abbreviated-month format (reference arm 4: strptime(v[:-1], "%b %d, %Y"))
    stripped = F.regexp_replace(trimmed, r"[A-Za-z]$", "")
    arms.insert(3, F.try_to_timestamp(stripped, F.lit("MMM d, yyyy")))
    return F.coalesce(*arms)


# ---------------------------------------------------------------------------
# F6 / P11 — URL scheme guard (wikipedia_page_reference.py:1081-1089)
# ---------------------------------------------------------------------------

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


def url_with_scheme_or_null(col: Column) -> Column:
    """NULL out values that are not absolute URLs (e.g. wiki links like
    ``[[:sq:...]]``); mirrors ``urlparse(url).scheme`` being empty."""
    return F.when(col.rlike(_SCHEME_RE), col)


def has_url_scheme(col: Column) -> Column:
    return F.when(col.isNotNull(), col.rlike(_SCHEME_RE)).otherwise(F.lit(False))


# ---------------------------------------------------------------------------
# F5 — first-level domain extraction (wikipedia_page_reference.py:695-714)
# ---------------------------------------------------------------------------


def hostname(url: Column) -> Column:
    # try_parse_url: malformed URLs yield NULL instead of failing the task
    # (reference wraps get_fld in try/except TldBadUrl — same contract)
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def with_first_level_domain(df, url: Column | str, out: str):
    """Registrable-domain extraction with the FULL public suffix list
    (``tld.get_fld`` parity — ICANN + private sections): appends ``out`` =
    fld of ``url`` via per-arity broadcast suffix-table joins (see
    functions/psl.py for the design and documented deviations). NULL for
    unparseable hosts and unknown TLDs; URLs whose host cannot be derived
    but contain ``web.archive.org`` map to ``archive.org`` (the reference's
    TldBadUrl fallback, ``wikipedia_page_reference.py:704-707``)."""
    from wcdimportbot_spark.functions.psl import with_registrable_domain

    u = F.col(url) if isinstance(url, str) else url
    tmp = f"__fldhost_{out}"
    df = df.withColumn(tmp, hostname(u))
    df = with_registrable_domain(df, tmp, out)
    archive_fallback = F.when(u.contains("web.archive.org"), F.lit("archive.org"))
    return df.withColumn(out, F.coalesce(F.col(out), archive_fallback)).drop(tmp)


# ---------------------------------------------------------------------------
# J7 — known-archive detection (wikipedia_page_reference.py:469-506)
# ---------------------------------------------------------------------------


def detect_archive(fld: Column) -> Column:
    """Map a first-level domain to the KnownArchiveUrl enum name, else NULL.

    Note: the reference calls ``__detect_archive_urls__`` *before*
    ``__extract_first_level_domain__`` in ``finish_parsing_and_generate_hash``
    (wikipedia_page_reference.py:1168-1183), which would always see NULL flds;
    its own unit test (tests/test_english_wikipedia_page_reference.py:203-216)
    calls the two in the working order. We implement the evident intent
    (fld first, then detect)."""
    expr = F.lit(None).cast("string")
    for domain, name in KNOWN_ARCHIVES.items():
        expr = F.when(fld == domain, F.lit(name)).otherwise(expr)
    return expr


# ---------------------------------------------------------------------------
# F8 / F9 — external ids from URLs (wikipedia_page_reference.py:508-538)
# ---------------------------------------------------------------------------


def google_books_id_from_query(url: Column, fld: Column) -> Column:
    """``?id=`` query param on books.google.* urls
    (__detect_google_books_id__)."""
    return F.when(
        fld.contains("google.") & url.contains("/books.google."),
        F.try_parse_url(url, F.lit("QUERY"), F.lit("id")),
    )


def internet_archive_id_from_path(url: Column, fld: Column) -> Column:
    """Second path segment after /details/ on archive.org urls
    (__detect_internet_archive_id__)."""
    return F.when(
        (fld == "archive.org") & url.contains("/details/"),
        F.regexp_extract(url, r"/details/([^/?#]+)", 1),
    )


# ---------------------------------------------------------------------------
# F7 — {{google books}} template inside the url param
# (wikipedia_page_reference.py:933-947; google_books.py:30-79)
# ---------------------------------------------------------------------------


def google_books_template_id(url: Column) -> Column:
    """Extract the id from a ``{{google books |...|id=X|...}}`` (or positional
    ``|1=X`` / ``|X``) template stored in the url parameter. The id must be
    exactly 12 characters (TwelveCharString, google_books.py:25-27)."""
    is_tpl = url.rlike(r"^\s*\{\{\s*[Gg]oogle [Bb]ooks")
    named = F.regexp_extract(url, r"[|\s]id\s*=\s*([^|}\s]+)", 1)
    positional = F.regexp_extract(url, r"[|]\s*1\s*=\s*([^|}\s]+)", 1)
    candidate = F.when(named != "", named).otherwise(F.when(positional != "", positional))
    return F.when(is_tpl & (F.length(candidate) == 12), candidate)


def canonical_google_books_url(book_id: Column) -> Column:
    return F.concat(F.lit("https://books.google.com/books?id="), book_id)


# ---------------------------------------------------------------------------
# F10 — ISBN normalize & classify (wikipedia_page_reference.py:949-970)
# ---------------------------------------------------------------------------


def isbn_normalized(raw: Column) -> Column:
    """Spaces → dashes (ISBN standard); empty after dash-strip → NULL."""
    spaced = F.regexp_replace(raw, " ", "-")
    stripped = F.regexp_replace(spaced, "-", "")
    return F.when(raw.isNotNull() & (stripped != ""), spaced)


def isbn_digits(norm: Column) -> Column:
    return F.regexp_replace(norm, "-", "")


def isbn_13(norm: Column) -> Column:
    return F.when(F.length(isbn_digits(norm)) == 13, norm)


def isbn_10(norm: Column) -> Column:
    return F.when(F.length(isbn_digits(norm)) == 10, norm)


def isbn_invalid_length(norm: Column) -> Column:
    ln = F.length(isbn_digits(norm))
    return norm.isNotNull() & ~ln.isin(10, 13)


# ---------------------------------------------------------------------------
# F11 — wiki-markup cleanup, publisher only
# (wikipedia_page_reference.py:456-467)
# ---------------------------------------------------------------------------


def clean_wiki_markup(col: Column) -> Column:
    """``[[X]]`` → X; ``[[X|Y]]`` → X (first part), matching
    __clean_wiki_markup_from_strings__: strip brackets, split on '|', first
    part."""
    no_brackets = F.regexp_replace(col, r"\[\[|\]\]", "")
    return F.when(
        col.contains("[[") & col.contains("|"),
        F.split(no_brackets, r"\|").getItem(0),
    ).when(col.contains("[["), no_brackets).otherwise(col)


# ---------------------------------------------------------------------------
# F18 / F19 — lang→language, place→location merges
# (wikipedia_page_reference.py:887-905)
# ---------------------------------------------------------------------------


def merge_secondary(primary: Column, secondary: Column) -> Column:
    return F.coalesce(primary, secondary)


def merge_conflict(primary: Column, secondary: Column) -> Column:
    return primary.isNotNull() & secondary.isNotNull()


# ---------------------------------------------------------------------------
# F14 — number-in-string extraction (wikipedia_page_reference.py:551-563)
# ---------------------------------------------------------------------------


def find_single_number(col: Column) -> Column:
    """Exactly one digit-run → int; zero → NULL; multiple → NULL (the
    imperative MoreThanOneNumberError becomes a filterable condition via
    :func:`has_multiple_numbers`)."""
    nums = F.regexp_extract_all(col, F.lit(r"(\d+)"), 1)
    return F.when(F.size(nums) == 1, F.element_at(nums, 1).cast("int"))


def has_multiple_numbers(col: Column) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(r"(\d+)"), 1)) > 1


# ---------------------------------------------------------------------------
# F16 / F17 — person name / url derivation (person/__init__.py:25-53)
# ---------------------------------------------------------------------------


def person_full_name(name_string: Column, given: Column, surname: Column) -> Column:
    """name_string > "given surname" > ''. The reference f-string renders a
    literal "None" when exactly one of given/surname is set
    (person/__init__.py:36); we implement the evident intent (skip the null
    part) via concat_ws."""
    joined = F.trim(F.concat_ws(" ", given, surname))
    return F.coalesce(
        F.when(F.trim(name_string) != "", F.trim(name_string)),
        F.when(joined != "", joined),
        F.lit(""),
    )


# ---------------------------------------------------------------------------
# W4 — label truncation (crud/__init__.py:193-200,269-274,613-621)
# ---------------------------------------------------------------------------


def shorten(col: Column, width: int) -> Column:
    """``textwrap.shorten(col, width, placeholder="...")`` as a Column
    expression (reference: crud/__init__.py:194,270,615): collapse whitespace
    runs to single spaces; if the collapsed text fits in ``width`` return it,
    else keep the longest whole-word prefix that fits together with the
    3-char ``...`` placeholder (the placeholder alone when no word fits).

    Documented deviation: textwrap's ``break_on_hyphens`` (a hyphenated word
    may be split, keeping ``aaa-...``) is not modeled — we treat
    space-delimited words as atomic, yielding ``...`` for that case."""
    collapsed = F.trim(F.regexp_replace(col, r"\s+", " "))
    # peek one char past the word budget (width-3): a space there means the
    # budget-filling prefix ends exactly on a word boundary
    peek = F.substring(collapsed, 1, width - 2)
    kept = F.regexp_replace(peek, r"\s*\S*$", "")
    return F.when(F.length(collapsed) <= width, collapsed).otherwise(
        F.when(kept == "", F.lit("...")).otherwise(F.concat(kept, F.lit("...")))
    )


# ---------------------------------------------------------------------------
# map key dedup, independent of session config
# ---------------------------------------------------------------------------


def transform_keys_last_wins(m: Column, key_fn) -> Column:
    """``transform_keys`` with explicit last-wins dedup of colliding keys.

    ``transform_keys`` itself builds its output map through the session's
    ``spark.sql.mapKeyDedupPolicy`` (default EXCEPTION), so a rename that
    collides keys (e.g. ``accessdate`` → ``access_date`` when both were
    present) throws DUPLICATE_MAP_KEY before any after-the-fact cleanup can
    run. This helper renames on the ENTRIES ARRAY instead, drops all but the
    last entry per key, and only then materializes a map — dict-overwrite
    semantics independent of session config. O(n²) per row in map size;
    maps here are template params (≲ dozens of keys)."""
    renamed = F.transform(
        F.map_entries(m),
        lambda e: F.struct(key_fn(e["key"]).alias("key"), e["value"].alias("value")),
    )
    # fold entries left→right, evicting an earlier entry when its key
    # reappears: lambda variables (acc, e) are materialized values, so the
    # rename transform above evaluates exactly ONCE per row (referencing
    # `renamed` inside a lambda body instead would re-evaluate the whole
    # rename chain per element — measured as a pipeline-level regression)
    deduped = F.aggregate(
        renamed,
        F.array().cast("array<struct<key:string,value:string>>"),
        lambda acc, e: F.concat(
            F.filter(acc, lambda a: a["key"] != e["key"]), F.array(e)
        ),
    )
    return F.map_from_entries(deduped)


# ---------------------------------------------------------------------------
# F13 — Wikibase time format (crud/__init__.py:388-398 etc.)
# ---------------------------------------------------------------------------


def wikibase_time(col: Column) -> Column:
    """Zero out time-of-day, format ``+%Y-%m-%dT00:00:00Z``."""
    return F.date_format(F.date_trunc("day", col), "'+'yyyy-MM-dd'T'HH:mm:ss'Z'")


# ---------------------------------------------------------------------------
# F21 — title → URL forms (wikipedia_page.py:86-98)
# ---------------------------------------------------------------------------


def underscored_title(title: Column) -> Column:
    return F.regexp_replace(title, " ", "_")


def quoted_title(title: Column) -> Column:
    return F.url_encode(underscored_title(title))
