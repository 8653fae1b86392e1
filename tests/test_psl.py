"""F5 full-PSL first-level-domain parity tests.

Mirrors the reference's own fld cases
(``tests/test_english_wikipedia_page_reference.py:129-163,225-236``:
stereogum.com, archive.org, bad-url → None) and exercises the PSL rule
classes the curated round-1 list could not express: deep ccTLD suffixes,
wildcard rules (``*.ck``), exception rules (``!www.ck``), and the private
section (``blogspot.com``).
"""

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.columns import with_first_level_domain
from wcdimportbot_spark.functions.psl import load_psl

CASES = [
    # reference test corpus
    ("https://www.stereogum.com/2033090/turnstile-glow-on/", "stereogum.com"),
    (
        "https://web.archive.org/web/20100715195638/http://www.ine.cl/x.php",
        "archive.org",
    ),
    ("https://books.google.com/books?id=9HRodACJLOoC", "google.com"),
    # TldBadUrl fallback: scheme-less archive URL has no parseable host
    ("web.archive.org/web/2010/http://www.kmk.a.se/x.pdf", "archive.org"),
    ("not a url at all", None),
    # classic two-part suffixes
    ("https://shop.example.co.uk/p", "example.co.uk"),
    ("https://example.com.do/", "example.com.do"),
    ("https://portal.example.gov.in/x", "example.gov.in"),
    ("https://example.co.ke", "example.co.ke"),
    # three-label suffix (act.edu.au is on the PSL)
    ("https://www.example.act.edu.au/", "example.act.edu.au"),
    # wildcard *.ck → one extra suffix label
    ("https://a.b.ck/", "a.b.ck"),
    # exception !www.ck cancels the wildcard
    ("https://www.ck/", "www.ck"),
    ("https://sub.www.ck/", "www.ck"),
    # private-section suffix (tld.get_fld default searches private domains)
    ("https://someone.blogspot.com/post", "someone.blogspot.com"),
    # host IS a public suffix → no registrable domain
    ("https://co.uk/", None),
    ("https://com/", None),
    # unknown TLD (tld raises TldDomainNotFound; we surface NULL)
    ("https://example.notarealtld2026/", None),
    # IP hosts have no registrable domain
    ("http://192.168.1.1/admin", None),
    # nested web.archive.org with full scheme resolves via PSL, not fallback
    ("https://web.archive.org/web/2019/https://example.com", "archive.org"),
    ("https://deep.sub.domain.example.com/a/b", "example.com"),
]


def test_psl_loads_full_list():
    rules = load_psl()
    n_rules = sum(len(s) for s in rules["normal"].values())
    assert n_rules > 8000, "expected the full Mozilla PSL, not a curated list"
    assert "co.uk" in rules["normal"][2]
    assert "blogspot.com" in rules["normal"][2]  # private section included
    assert "ck" in rules["wild"][1]
    assert "www.ck" in rules["exc"][2]


@pytest.mark.parametrize("url,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_first_level_domain(spark, url, expected):
    df = spark.createDataFrame([(url,)], ["url"])
    row = with_first_level_domain(df, "url", "fld").collect()[0]
    assert row["fld"] == expected


def test_fld_plan_is_broadcast_joins_no_shuffle(spark):
    """The PSL match must be per-arity BROADCAST joins: no shuffle
    exchange on the fact side, no sort-merge join, and the plan must not
    inline the rule set (a 9k-literal expression tree OOMs streaming
    micro-batches — round-3 regression)."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    df = with_first_level_domain(df, "url", "fld")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert len(plan) < 200_000, "plan inlines the PSL rule set"


def _py_fld(host, rules):
    """Independent pure-Python PSL matcher (test oracle)."""
    labels = host.lower().rstrip(".").split(".")
    n = len(labels)
    best = 0
    for k in range(1, min(n, 5) + 1):
        if ".".join(labels[n - k:]) in rules["normal"].get(k, ()):
            best = max(best, k)
    for k, w in rules["wild"].items():
        if n >= k and ".".join(labels[n - k:]) in w:
            exc = rules["exc"].get(k + 1, frozenset())
            if n >= k + 1 and ".".join(labels[n - k - 1:]) in exc:
                best = max(best, k)
            else:
                best = max(best, k + 1)
    if best == 0 or n <= best:
        return None
    return ".".join(labels[n - best - 1:])


def test_psl_matrix_vs_python_oracle(spark):
    """Batched randomized parity: sample suffixes from every rule class in
    the real PSL, build hosts with 0-3 extra labels, and compare the Spark
    expression against an independent Python matcher."""
    import random

    from wcdimportbot_spark.functions.psl import with_registrable_domain

    rules = load_psl()
    rng = random.Random(20260813)
    suffixes = []
    for k, s in rules["normal"].items():
        suffixes += rng.sample(sorted(s), min(60, len(s)))
    for k, w in rules["wild"].items():
        for base in rng.sample(sorted(w), min(20, len(w))):
            suffixes.append("anylabel." + base)
    for k, e in rules["exc"].items():
        suffixes += sorted(e)  # all 8 exceptions
    hosts = []
    for suf in suffixes:
        depth = rng.randint(0, 3)
        prefix = [rng.choice(["www", "a", "sub1", "x9", "deep"]) for _ in range(depth)]
        hosts.append(".".join(prefix + [suf]))
    expected = {h: _py_fld(h, rules) for h in hosts}

    got = dict(
        with_registrable_domain(
            spark.createDataFrame([(h,) for h in hosts], ["host"]), "host", "fld"
        )
        .select("host", "fld")
        .collect()
    )
    mismatches = {h: (got[h], expected[h]) for h in hosts if got[h] != expected[h]}
    assert not mismatches, f"{len(mismatches)} PSL mismatches, e.g. {list(mismatches.items())[:5]}"
