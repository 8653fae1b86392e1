"""Template extraction parity tests.

Cases mirror the reference's ``tests/test_template_extraction.py:11-87`` and
FIXTURES.md §1-2 exactly (same inputs, same expected output)."""

from wcdimportbot_spark.functions.wikitext import (
    extract_templates_and_params,
    remove_comments,
)

CITE_BOOK = (
    "{{cite book |last=von Mach |first=Edmund |author-link=Edmund von Mach "
    "|title=Official Diplomatic Documents Relating to the Outbreak of the European War: "
    "With Photographic Reproductions of Official Editions of the Documents "
    "(Blue, White, Yellow, Etc., Books) |url=https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 "
    "<!--|alternate-full-text-url="
    "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 --> "
    "|year=1916 |publisher=Macmillan |page=7 |location=New York |oclc=651023684 "
    "|lccn=16019222 |access-date=2020-12-03 |archive-date=2021-07-23 "
    "|archive-url=https://web.archive.org/web/20210723163014/"
    "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 |url-status=live }}"
)


def test_remove_comments():
    text = (
        "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 "
        "<!--|alternate-full-text-url="
        "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 -->"
    )
    assert remove_comments(text) == "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7"


def test_url_template_with_comment_positional_explicit_key():
    data = (
        "{{url|1=https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7 <!--|alternate-full-text-url="
        "https://babel.hathitrust.org/cgi/pt?id=mdp.39015027915100&view=1up&seq=11 -->}}"
    )
    assert extract_templates_and_params(data, True) == [
        ("url", {"1": "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7"})
    ]


def test_cite_book_with_comment_in_url():
    out = extract_templates_and_params(CITE_BOOK, True)
    assert out == [
        (
            "cite book",
            {
                "last": "von Mach",
                "first": "Edmund",
                "author-link": "Edmund von Mach",
                "title": (
                    "Official Diplomatic Documents Relating to the Outbreak of the European War: "
                    "With Photographic Reproductions of Official Editions of the Documents "
                    "(Blue, White, Yellow, Etc., Books)"
                ),
                "url": "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7",
                "year": "1916",
                "publisher": "Macmillan",
                "page": "7",
                "location": "New York",
                "oclc": "651023684",
                "lccn": "16019222",
                "access-date": "2020-12-03",
                "archive-date": "2021-07-23",
                "archive-url": (
                    "https://web.archive.org/web/20210723163014/"
                    "https://books.google.com/books?id=28tmAAAAMAAJ&pg=PR7"
                ),
                "url-status": "live",
            },
        )
    ]


def test_positional_params_numbered():
    # docstring case template_extraction.py:62: {{a| foo | 2 <!-- --> = bar | baz }}
    out = extract_templates_and_params("{{a| foo |2= bar | baz }}", True)
    assert out == [("a", {"1": "foo", "2": "baz"})]


def test_positional_without_equals():
    out = extract_templates_and_params("{{url|chkchkchk.net}}", True)
    assert out == [("url", {"1": "chkchkchk.net"})]


def test_parser_functions_skipped():
    out = extract_templates_and_params("x {{#if:a|b|c}} y {{cite web|url=http://a.com}}", True)
    assert out == [("cite web", {"url": "http://a.com"})]


def test_nested_template_recursive():
    data = "{{cite web |url={{google books |plainurl=y |id=CDJpAAAAMAAJ |page=313}} |title=T}}"
    out = extract_templates_and_params(data, True)
    names = [t[0] for t in out]
    assert names == ["cite web", "google books"]
    outer = dict(out)["cite web"]
    assert outer["url"] == "{{google books |plainurl=y |id=CDJpAAAAMAAJ |page=313}}"
    inner = dict(out)["google books"]
    assert inner == {"plainurl": "y", "id": "CDJpAAAAMAAJ", "page": "313"}


def test_pipe_inside_wikilink_does_not_split():
    out = extract_templates_and_params("{{cite web |publisher=[[test|test]] |title=T}}", True)
    assert out == [("cite web", {"publisher": "[[test|test]]", "title": "T"})]


def test_equals_in_url_value():
    out = extract_templates_and_params("{{cite web|url=https://a.com/x?id=1&pg=2}}", True)
    assert out == [("cite web", {"url": "https://a.com/x?id=1&pg=2"})]


def test_duplicate_key_last_wins():
    out = extract_templates_and_params("{{a|x=1|x=2}}", True)
    assert out == [("a", {"x": "2"})]


def test_no_templates():
    assert extract_templates_and_params("plain text, no templates", True) == []
    assert extract_templates_and_params("", True) == []


def test_unclosed_braces_ignored():
    assert extract_templates_and_params("{{cite web |url=http://a.com", True) == []
