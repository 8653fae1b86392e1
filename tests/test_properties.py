"""Property-based tests (SURVEY §5 rebuild plan item 4): hash determinism,
date-parser totality, and wikitext parser robustness.

These run the pure-Python layers directly (no Spark session) so hypothesis
can explore thousands of cases quickly; the Spark expressions for the same
logic are pinned against DuckDB oracles elsewhere."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from wcdimportbot_spark.functions.wikitext import (
    extract_templates_and_params,
    remove_comments,
)

# ---------------------------------------------------------------------------
# wikitext parser robustness: never crashes, output shape is stable
# ---------------------------------------------------------------------------

wikitext_chars = st.text(
    alphabet=string.ascii_letters + string.digits + " {}|[]=<>!-_./:#\n",
    max_size=400,
)


@given(wikitext_chars)
@settings(max_examples=300, deadline=None)
def test_parser_total_on_arbitrary_text(text):
    out = extract_templates_and_params(text, True)
    for name, params in out:
        assert isinstance(name, str)
        assert name == name.strip()
        for k, v in params.items():
            assert isinstance(k, str) and isinstance(v, str)
            assert "<!--" not in v or "-->" not in v  # comments removed


@given(wikitext_chars)
@settings(max_examples=200, deadline=None)
def test_remove_comments_idempotent(text):
    once = remove_comments(text)
    assert remove_comments(once) == once


@given(
    st.lists(
        st.tuples(
            st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=12),
            st.text(alphabet=string.ascii_letters + string.digits + " ._-:/", max_size=30),
        ),
        min_size=0,
        max_size=8,
        unique_by=lambda kv: kv[0],
    )
)
@settings(max_examples=200, deadline=None)
def test_parser_roundtrips_wellformed_templates(params):
    """A well-formed template serialized from key/value pairs parses back to
    exactly those pairs (keys unique, values free of markup)."""
    body = "".join(f" |{k}={v}" for k, v in params)
    text = "before {{cite web" + body + "}} after"
    out = extract_templates_and_params(text, True)
    assert len(out) == 1
    name, parsed = out[0]
    assert name == "cite web"
    assert parsed == {k: v.strip() for k, v in params}


# ---------------------------------------------------------------------------
# hash determinism: same identifiers ⇒ same hash regardless of field order
# or unrelated fields (verified at the Spark layer on a tiny local session
# in test_normalize; here we pin the algorithm itself)
# ---------------------------------------------------------------------------


@given(st.text(min_size=1, max_size=60))
@settings(max_examples=200, deadline=None)
def test_hash_normalization_invariants(key):
    import hashlib

    def ref_hash(k: str) -> str:
        return hashlib.md5(
            f"sandbox.wiki{k.replace(' ', '').lower()}".encode()
        ).hexdigest()

    # space/case-insensitive under the algorithm's own normalization
    # (NB: .upper() is not involutive in unicode — 'ß'.upper() == 'SS' — so
    # the invariant is stated via .lower(), which is what the rule applies)
    assert ref_hash(key) == ref_hash(key.lower().replace(" ", ""))
    assert ref_hash(key) == ref_hash(" " + key + " ")


# ---------------------------------------------------------------------------
# date parser totality (the 9-format validator never raises)
# ---------------------------------------------------------------------------


@given(st.text(max_size=30))
@settings(max_examples=150, deadline=None)
def test_date_parse_total_python_model(value):
    """Model of F12: a coalesce of try-parsers either yields a datetime or
    None — never an exception — for arbitrary input."""
    from datetime import datetime

    formats = [
        "%Y-%m-%d", "%B %d, %Y", "%b %d, %Y", "%d %B %Y",
        "%d %b %Y", "%B %Y", "%b %Y", "%Y",
    ]
    result = None
    for fmt in formats:
        try:
            result = datetime.strptime(value.strip(), fmt)
            break
        except (ValueError, TypeError):
            continue
    assert result is None or isinstance(result, datetime)


# ---------------------------------------------------------------------------
# token-scan scanners ≡ the character-scanner specification
# ---------------------------------------------------------------------------
# The production scanners jump between tokens with compiled-regex search
# (functions/wikitext.py); these reference implementations advance one
# character at a time — trivially auditable, too slow for production. The
# differential property keeps the optimization honest on the exact corner
# cases (brace runs, unclosed comments, overlapping closers).


def _spec_find_template_spans(text):
    spans, stack = [], []
    i, n = 0, len(text)
    while i < n - 1:
        if text[i:i + 4] == "<!--":
            close = text.find("-->", i + 4)
            i = n if close < 0 else close + 3
            continue
        two = text[i:i + 2]
        if two == "{{":
            stack.append(i)
            i += 2
        elif two == "}}" and stack:
            spans.append((stack.pop(), i + 2))
            i += 2
        else:
            i += 1
    spans.sort(key=lambda s: s[0])
    return spans


def _spec_split_top_level(content, seps="|"):
    parts, buf_start, tdepth, ldepth = [], 0, 0, 0
    i, n = 0, len(content)
    while i < n:
        if content[i:i + 4] == "<!--":
            close = content.find("-->", i + 4)
            i = n if close < 0 else close + 3
            continue
        two = content[i:i + 2]
        if two == "{{":
            tdepth += 1
            i += 2
        elif two == "}}" and tdepth > 0:
            tdepth -= 1
            i += 2
        elif two == "[[":
            ldepth += 1
            i += 2
        elif two == "]]" and ldepth > 0:
            ldepth -= 1
            i += 2
        else:
            if tdepth == 0 and ldepth == 0 and content[i] in seps:
                parts.append(content[buf_start:i])
                buf_start = i + 1
            i += 1
    parts.append(content[buf_start:])
    return parts


def _spec_first_top_level_eq(segment):
    tdepth = ldepth = 0
    i, n = 0, len(segment)
    while i < n:
        if segment[i:i + 4] == "<!--":
            close = segment.find("-->", i + 4)
            i = n if close < 0 else close + 3
            continue
        two = segment[i:i + 2]
        if two == "{{":
            tdepth += 1
            i += 2
        elif two == "}}" and tdepth > 0:
            tdepth -= 1
            i += 2
        elif two == "[[":
            ldepth += 1
            i += 2
        elif two == "]]" and ldepth > 0:
            ldepth -= 1
            i += 2
        else:
            if tdepth == 0 and ldepth == 0 and segment[i] == "=":
                return i
            i += 1
    return -1


scanner_text = st.lists(
    st.sampled_from(
        ["{{", "}}", "[[", "]]", "|", "=", "<!--", "-->", "a", "b ",
         "cite web ", "url", " ", "{", "}", "[", "]", "<!-", "-", "x=y"]
    ),
    max_size=40,
).map("".join)


@given(scanner_text)
@settings(max_examples=500, deadline=None)
def test_token_scanners_match_char_scanner_spec(s):
    from wcdimportbot_spark.functions.wikitext import (
        _find_template_spans,
        _first_top_level_eq,
        _split_top_level,
    )

    assert _find_template_spans(s) == _spec_find_template_spans(s)
    assert _split_top_level(s) == _spec_split_top_level(s)
    assert _first_top_level_eq(s) == _spec_first_top_level_eq(s)


@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.sampled_from([3, 4]),
    st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=30, deadline=None)
def test_png_filter_algebra_roundtrips_random_pixels(w, h, ch, seed):
    """encode(filter row y with type y%5) -> decode(unfilter) must
    reproduce EXACT pixel bytes for arbitrary content — the full PNG
    filter algebra (None/Sub/Up/Average/Paeth over RGB and RGBA), not
    just solid colors with exact channel means."""
    import numpy as np

    from wcdimportbot_spark.operators.multimodal import (
        decode_png,
        encode_png_array,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    d = decode_png(encode_png_array(px), return_pixels=True)
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert np.array_equal(d["pixels"], px)
