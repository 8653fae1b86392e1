"""Driver-side expression memoization (functions/expr_memo.py): the
memoized builders must return plan-equivalent results on a cache HIT —
the second call reuses the exact Column objects of the first inside a
brand-new DataFrame plan."""

import pytest
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.expr_memo import memo_expr
from wcdimportbot_spark.operators.extract import (
    extract_raw_templates,
    filter_supported_templates,
    fix_param_keys,
    split_valid_and_rejects,
)
from wcdimportbot_spark.operators.graph import page_claims, reference_claims
from wcdimportbot_spark.operators.normalize import build_references
from wcdimportbot_spark.operators.text_dedup import (
    lsh_candidate_pairs,
    minhash_signatures,
)

WIKITEXT = (
    "{{cite web |url=https://www.example.com/a |title=A |last=Doe |first=J. "
    "|access-date=May 24, 2021}} "
    "{{cite journal |title=B |doi=10.1000/xyz |year=2018}} "
    "{{cite news |agency=Wire |title=String citation}}"
)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [
            (1, "Page One", "en", 100, WIKITEXT),
            (2, "Page Two", "en", 200, WIKITEXT.replace("/a", "/b")),
        ],
        "page_id long, title string, language_code string, "
        "latest_revision_id long, wikitext string",
    )


@pytest.fixture(scope="module")
def valid_raw(pages):
    raw = fix_param_keys(
        filter_supported_templates(extract_raw_templates(pages))
    )
    valid, _ = split_valid_and_rejects(raw)
    return valid


def test_memo_expr_returns_same_object_per_key(spark):
    a = memo_expr(("t_memo", 1), lambda: F.col("x") + 1)
    b = memo_expr(("t_memo", 1), lambda: F.col("x") + 2)  # builder ignored
    c = memo_expr(("t_memo", 2), lambda: F.col("x") + 2)
    assert a is b
    assert c is not a


def test_build_references_memo_hit_identical(valid_raw):
    first = build_references(valid_raw)  # may build or hit — either way
    second = build_references(valid_raw)  # guaranteed memo HIT
    assert first.schema == second.schema

    def rows(df):  # exceptAll rejects MAP columns (params) — compare JSON
        return sorted(
            r[0] for r in df.select(F.to_json(F.struct(*df.columns))).collect()
        )

    assert rows(first) == rows(second)
    assert second.count() > 0


@pytest.mark.slow
def test_reference_claims_default_matches_explicit_date(valid_raw):
    refs = build_references(valid_raw)
    memoized = reference_claims(refs)  # default date → memoized tree
    fresh = reference_claims(refs, F.current_date())  # fresh tree
    assert memoized.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memoized).count() == 0
    assert memoized.count() > 0


@pytest.mark.slow
def test_page_claims_default_matches_explicit_date(pages, valid_raw):
    refs = build_references(valid_raw)
    memoized = page_claims(pages, refs)  # default date → memoized trees
    fresh = page_claims(pages, refs, retrieved_date=F.current_date())
    assert memoized.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(memoized).count() == 0
    assert memoized.count() > 0


def test_text_analysis_memo_matches_bound_column(spark):
    from wcdimportbot_spark.operators.text_analysis import (
        detect_language,
        quality_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox is on the hill with a dog"),
            (2, "le chat est dans la maison pour la nuit et le jour"),
            (3, "x"),
        ],
        "doc_id long, text string",
    )
    # name form → memoized tree; a Column argument builds fresh (old
    # behavior)
    memoized = docs.select(
        "doc_id",
        quality_score("text").alias("q"),
        detect_language("text").alias("l"),
    )
    fresh = docs.select(
        "doc_id",
        quality_score(docs["text"]).alias("q"),
        detect_language(docs["text"]).alias("l"),
    )
    assert sorted(map(tuple, memoized.collect())) == sorted(
        map(tuple, fresh.collect())
    )
    # second memoized call (guaranteed hit) still resolves per-plan
    again = docs.select(
        "doc_id",
        quality_score("text").alias("q"),
        detect_language("text").alias("l"),
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, memoized.collect())
    )


def test_minhash_lsh_memo_hit_identical(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, "a completely different document body with other words inside"),
        ],
        "doc_id long, text string",
    )
    s1 = minhash_signatures(docs).collect()
    s2 = minhash_signatures(docs).collect()  # memo HIT on aggs/base/shingles
    assert sorted(map(tuple, s1)) == sorted(map(tuple, s2))
    p1 = lsh_candidate_pairs(docs).collect()
    p2 = lsh_candidate_pairs(docs).collect()  # memo HIT on band array
    assert sorted(map(tuple, p1)) == sorted(map(tuple, p2))
    assert (1, 2) in {(r["doc_a"], r["doc_b"]) for r in p1}
