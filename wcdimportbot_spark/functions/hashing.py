"""Identity & hashing semantics (SURVEY.md §1.3).

All dedup identity in the engine is MD5 over ``wikibase_title + key`` with
the key lowercased and space-stripped, exactly as the reference computes it:

- reference hash: priority chain doi → pmid → isbn(dashes stripped) → oclc →
  [url → first_parameter, config-gated]   (wikipedia_page_reference.py:580-693)
- page hash: title + language_code + page_id (wikipedia_page.py:303-309)
- website hash: first_level_domain           (wikipedia_page_reference.py:565-571)
- google books hash: books id                (google_books.py:47-54)

The chain is an exclusive when-ladder, not a coalesce: if e.g. url is present
but the config flag is off, the hash is NULL even if first_parameter exists
(elif semantics in the reference).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default wikibase identity prefix; the reference's test fixtures use
#: SandboxWikibase (title "sandbox.wiki", sandbox_wikibase.py:10)
DEFAULT_WIKIBASE_TITLE = "sandbox.wiki"


def _salted_md5(wikibase_title: str, key: Column) -> Column:
    return F.md5(
        F.concat(F.lit(wikibase_title), F.lower(F.regexp_replace(key, " ", "")))
    )


def reference_hash_key(
    doi: Column,
    pmid: Column,
    isbn: Column,
    oclc: Column,
    url: Column,
    first_parameter: Column,
    include_url_and_first_parameter: bool = True,
) -> Column:
    """The string that gets hashed, or NULL when the reference is unhashable
    (→ demoted to a string citation)."""
    chain = (
        F.when(doi.isNotNull(), doi)
        .when(pmid.isNotNull(), pmid)
        .when(isbn.isNotNull(), F.regexp_replace(isbn, "-", ""))
        .when(oclc.isNotNull(), oclc)
    )
    if include_url_and_first_parameter:
        chain = chain.when(url.isNotNull(), url).when(
            first_parameter.isNotNull(), first_parameter
        )
    return chain


def reference_hash(key: Column, wikibase_title: str = DEFAULT_WIKIBASE_TITLE) -> Column:
    return F.when(key.isNotNull(), _salted_md5(wikibase_title, key))


def page_hash(
    title: Column,
    language_code: Column,
    page_id: Column,
    wikibase_title: str = DEFAULT_WIKIBASE_TITLE,
) -> Column:
    """md5(wikibase_title + language_code + page_id) — note: not lowercased /
    space-stripped in the reference (wikipedia_page.py:303-309 hashes the raw
    concatenation)."""
    return F.md5(
        F.concat(
            F.lit(wikibase_title), language_code, page_id.cast("string")
        )
    )


def website_hash(fld: Column, wikibase_title: str = DEFAULT_WIKIBASE_TITLE) -> Column:
    return F.when(fld.isNotNull(), _salted_md5(wikibase_title, fld))


def google_books_hash(book_id: Column, wikibase_title: str = DEFAULT_WIKIBASE_TITLE) -> Column:
    return F.when(book_id.isNotNull(), _salted_md5(wikibase_title, book_id))
