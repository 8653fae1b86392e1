"""S5 — SPARQL-shaped read surface over registered graph views
(crud/read.py:36-99 restated as spark.sql; operators/sparql.py)."""

from wcdimportbot_spark.operators import sparql


def _views(spark):
    items = spark.createDataFrame(
        [
            ("Qp1", "WIKIPEDIA_PAGE"),
            ("Qr1", "WIKIPEDIA_REFERENCE"),
            ("Qr2", "WIKIPEDIA_REFERENCE"),
            ("Qw1", "WEBSITE_ITEM"),
        ],
        "qid string, instance_of string",
    )
    claims = spark.createDataFrame(
        [
            ("Qr1", "INSTANCE_OF", None, "WIKIPEDIA_REFERENCE"),
            ("Qr2", "INSTANCE_OF", None, "WIKIPEDIA_REFERENCE"),
            ("Qr1", "HASH", "abc", None),
            ("Qr2", "HASH", "abc", None),  # two items, one hash → violation
            ("Qr1", "TITLE", "T", None),
        ],
        "subject_qid string, property string, value_string string, value_qid string",
    )
    sparql.register_graph_views(spark, items, claims)


def test_sparql_read_surface(spark):
    _views(spark)

    counts = {
        r["instance_of"]: r["count"]
        for r in sparql.count_items_by_type_sql(spark).collect()
    }
    assert counts == {
        "WIKIPEDIA_PAGE": 1,
        "WIKIPEDIA_REFERENCE": 2,
        "WEBSITE_ITEM": 1,
    }

    usage = {
        r["property"]: r["items_with_property"]
        for r in sparql.count_property_usage_sql(spark).collect()
    }
    assert usage == {"INSTANCE_OF": 2, "HASH": 2, "TITLE": 1}

    stat = sparql.statistic_count(spark, "INSTANCE_OF", "WIKIPEDIA_REFERENCE")
    assert stat.collect()[0]["count"] == 2

    of_type = sorted(
        r["item"] for r in sparql.all_items_of_type(spark, "WIKIPEDIA_REFERENCE").collect()
    )
    assert of_type == ["Qr1", "Qr2"]

    hits = sorted(r["item"] for r in sparql.items_for_hash(spark, "abc").collect())
    assert hits == ["Qr1", "Qr2"]

    viol = sparql.duplicate_hash_violations_sql(spark).collect()
    assert len(viol) == 1 and viol[0]["hash"] == "abc" and viol[0]["n_items"] == 2


def test_sparql_quote_escapes_literals(spark):
    _views(spark)
    # a value containing a quote must not break the generated SQL
    assert sparql.items_for_hash(spark, "o'hash").count() == 0
