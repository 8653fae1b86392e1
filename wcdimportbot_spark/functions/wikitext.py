"""Wikitext citation-template extraction (pure Python, no third-party parser).

Re-implements the observable behavior of the reference's
``src/helpers/template_extraction.py:40-116`` (itself derived from pywikibot
textlib + mwparserfromhell), which the reference drives with ``strip=True``
from ``src/models/wikimedia/wikipedia/wikipedia_page.py:416``:

- every template occurrence in the text is returned, recursively (a template
  nested inside another template's parameter value is its own entry, and the
  parent keeps the nested raw text in its value);
- parser functions (template name starting with ``#``) are skipped
  (``template_extraction.py:92-94``);
- unnamed (positional) parameters are keyed ``"1"``, ``"2"``, ... by their
  position among the unnamed parameters; an explicit ``2=`` key does not
  advance that counter;
- a parameter is "named" iff it contains a top-level ``=`` — pipes and
  equals signs inside nested ``{{...}}`` templates or ``[[...]]`` wiki links
  do not split parameters (this is why ``publisher=[[test|test]]`` is one
  value);
- HTML comments ``<!-- ... -->`` are removed from values, and keys/values
  are whitespace-stripped (``template_extraction.py:19-37,98-113``).

This module is executed executor-side inside an Arrow-batched
``mapInPandas`` (see ``operators/extract.py``) — the single Python hot path
of the engine. It is deliberately dependency-free and allocation-light: one
linear scan finds all template spans, one linear scan per template splits
parameters.

Known deviations:

- MediaWiki triple-brace arguments (``{{{x}}}``) are not modeled
  (mwparserfromhell parses them as Argument nodes; we may misparse them as
  a template named ``{x``). Citation wikitext does not contain template
  arguments, and the reference's own test corpus never exercises them.
- ``remove_comments`` removes each ``<!-- ... -->`` non-greedily across
  lines. The reference (template_extraction.py:19-37) applies a GREEDY
  per-line regex line-by-line and re-joins without newlines: on a line with
  two comments it eats the text between them (ref ``'a<!--x-->b<!--y-->c'``
  → ``'ac'``, repo → ``'abc'``), and multi-line input loses its newlines.
  We implement the evident intent (excise each comment, keep everything
  else); the reference behavior is a greedy-regex artifact its own tests
  never pin.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

ETPType = List[Tuple[str, Dict[str, str]]]

# Same comment-removal regex family as the reference (template_extraction.py:25):
# text on both sides of a comment is joined; the result is stripped.
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)


def remove_comments(text: str) -> str:
    """Remove ``<!-- ... -->`` comments and strip the result.

    Matches reference ``remove_comments`` (template_extraction.py:19-37) on
    its tested behavior: comment excised, surrounding text joined, result
    stripped.
    """
    return _COMMENT_RE.sub("", text).strip()


# The scanners below advance by compiled-regex token search instead of a
# per-character Python loop: the C regex engine skips the (dominant) prose
# between tokens, so Python-level iterations are O(tokens), not O(chars) —
# measured ~4-6x on the extraction hot path. Semantics are unchanged,
# including the 1-char advance on an unmatched ``}}``/``]]`` (a run like
# ``}}}`` must re-test from the next character, exactly like the
# char-scanner it replaces).

_SPAN_TOK = re.compile(r"<!--|\{\{|\}\}")
_EQ_TOK = re.compile(r"<!--|\{\{|\}\}|\[\[|\]\]|=")
_SPLIT_TOK_CACHE: Dict[str, "re.Pattern[str]"] = {}


def _split_tok(seps: str) -> "re.Pattern[str]":
    pat = _SPLIT_TOK_CACHE.get(seps)
    if pat is None:
        pat = re.compile(
            r"<!--|\{\{|\}\}|\[\[|\]\]|" + "|".join(re.escape(c) for c in seps)
        )
        _SPLIT_TOK_CACHE[seps] = pat
    return pat


def _find_template_spans(text: str) -> List[Tuple[int, int]]:
    """Find all ``{{ ... }}`` spans, including nested ones.

    Returns (start, end) character offsets (end exclusive, braces included),
    in document preorder (outer template before its nested templates).
    """
    spans: List[Tuple[int, int]] = []
    stack: List[int] = []
    pos, n = 0, len(text)
    search = _SPAN_TOK.search
    while True:
        m = search(text, pos)
        if m is None:
            break
        tok = m.group()
        p = m.start()
        if tok == "<!--":
            close = text.find("-->", p + 4)
            pos = n if close < 0 else close + 3
        elif tok == "{{":
            stack.append(p)
            pos = p + 2
        elif stack:  # "}}"
            spans.append((stack.pop(), p + 2))
            pos = p + 2
        else:  # unmatched "}}": re-test from the next char
            pos = p + 1
    # preorder: by start ascending; identical starts impossible (distinct offsets)
    spans.sort(key=lambda s: s[0])
    return spans


def _split_top_level(content: str, seps: str = "|") -> List[str]:
    """Split ``content`` on separator chars that are at nesting depth 0
    with respect to ``{{ }}`` and ``[[ ]]``."""
    parts: List[str] = []
    buf_start = 0
    tdepth = 0  # {{ }}
    ldepth = 0  # [[ ]]
    pos, n = 0, len(content)
    search = _split_tok(seps).search
    while True:
        m = search(content, pos)
        if m is None:
            break
        tok = m.group()
        p = m.start()
        if tok == "<!--":
            close = content.find("-->", p + 4)
            pos = n if close < 0 else close + 3
        elif tok == "{{":
            tdepth += 1
            pos = p + 2
        elif tok == "}}":
            if tdepth > 0:
                tdepth -= 1
                pos = p + 2
            else:
                pos = p + 1
        elif tok == "[[":
            ldepth += 1
            pos = p + 2
        elif tok == "]]":
            if ldepth > 0:
                ldepth -= 1
                pos = p + 2
            else:
                pos = p + 1
        else:  # separator char
            if tdepth == 0 and ldepth == 0:
                parts.append(content[buf_start:p])
                buf_start = p + 1
            pos = p + 1
    parts.append(content[buf_start:])
    return parts


def _first_top_level_eq(segment: str) -> int:
    """Index of the first ``=`` at nesting depth 0, or -1."""
    tdepth = ldepth = 0
    pos, n = 0, len(segment)
    search = _EQ_TOK.search
    while True:
        m = search(segment, pos)
        if m is None:
            return -1
        tok = m.group()
        p = m.start()
        if tok == "<!--":
            close = segment.find("-->", p + 4)
            pos = n if close < 0 else close + 3
        elif tok == "{{":
            tdepth += 1
            pos = p + 2
        elif tok == "}}":
            if tdepth > 0:
                tdepth -= 1
                pos = p + 2
            else:
                pos = p + 1
        elif tok == "[[":
            ldepth += 1
            pos = p + 2
        elif tok == "]]":
            if ldepth > 0:
                ldepth -= 1
                pos = p + 2
            else:
                pos = p + 1
        else:  # "="
            if tdepth == 0 and ldepth == 0:
                return p
            pos = p + 1


def extract_templates_and_params(text: str, strip: bool = True) -> ETPType:
    """Extract (template_name, params) tuples from wikitext.

    Mirrors reference ``extract_templates_and_params`` with ``strip=True``
    (the only mode the reference pipeline uses): keys stripped, named values
    stripped, comments removed from values, names stripped, parser functions
    skipped, duplicate keys keep the last value.
    """
    if not text:
        return []
    result: ETPType = []
    for start, end in _find_template_spans(text):
        inner = text[start + 2 : end - 2]
        segments = _split_top_level(inner)
        name = segments[0]
        if name.lstrip().startswith("#"):
            continue  # parser function (template_extraction.py:92-94)
        params: Dict[str, str] = {}
        implicit_ordinal = 0
        for seg in segments[1:]:
            eq = _first_top_level_eq(seg)
            if eq >= 0:
                key = seg[:eq]
                value = seg[eq + 1 :]
                if strip:
                    key = key.strip()
                    value = value.strip()
            else:
                implicit_ordinal += 1
                key = str(implicit_ordinal)
                value = seg  # positional values are not stripped pre-comment
            value = remove_comments(value)
            params[key] = value
        result.append((name.strip() if strip else name, params))
    return result
