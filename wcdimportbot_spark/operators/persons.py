"""Person assembly from numbered template parameters (F15-F17, W1).

The reference scans every non-null attribute of the wide record and
assembles Person objects per role with ordinals 1..13
(``wikipedia_page_reference.py:716-858,972-1071``). The natural Spark
translations are (a) unpivot → regex → groupBy → collect_list, or (b) a
pure per-row expression over the params map. We use (b): all information
for one reference's persons lives in a single row's ``params`` column, so
a shuffle-free expression builds the persons array — at 100 TB this saves
an entire shuffle of the exploded key-value stream that (a) would require.

Within (b) there are two shapes. The first implementation PROBED every
possible key: 6 roles × (1 unnumbered + 13 ordinals) × 5 parts ≈ 550 map
lookups per row, a large codegen tree (multi-second JIT per query) and
~0.4 ms/row interpreted evaluation. This implementation PARSES the keys
that are actually present instead: one pass over ``map_entries`` with a
single anchored regex classifies each key into (role, ordinal, field), a
distinct+sort yields the (role, ordinal) person slots, and each person is
assembled by filtering the handful of parsed entries. Cost is
O(present person keys) ≈ 3-10 per row instead of O(possible keys) = 550.

Key grammar (post key-fixing, so dashes are underscores; BOTH digit
positions accepted directly by the parse regex —
``__get_numbered_person__`` handles e.g. ``author2_first`` and
``author_first2``):

- roleless:  ``first``/``last``, ``first{N}``/``last{N}``  → role ``unknown``
  (``__parse_roleless_persons__``, numbered range 1..13)
- role r ∈ {author, editor, host, interviewer, translator}:
  - ``{r}``            → name_string (unnumbered)
  - ``{r}_{part}``     → part ∈ first|last|link|mask (unnumbered)
  - ``{r}{N}``         → name_string
  - ``{r}_{part}{N}`` and ``{r}{N}_{part}`` — both digit positions

Guards: numbered persons require (given AND surname) OR name_string
(``wikipedia_page_reference.py:781-790``); unnumbered persons require any
field. Deviation from the reference, implemented as evident intent per
SURVEY §1.4: numbered persons carry their actual role (the reference
hardcodes AUTHOR for all numbered known-role persons,
``wikipedia_page_reference.py:1008``: ``role=...AUTHOR`` regardless of the
``search_string``).

Output ordering matches the reference's scan order: roles in
``PERSON_ROLES`` order, within a role the unnumbered person first then
ordinals ascending, roleless (``unknown``) persons last.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from wcdimportbot_spark.functions.template_fields import (
    MAX_PERSON_ORDINAL,
    PERSON_ROLES,
)

PERSON_STRUCT_FIELDS = (
    "role",
    "ordinal",
    "given",
    "surname",
    "name_string",
    "link",
    "mask",
)

#: anchored person-key classifier; groups: (role token, middle digits,
#: part, trailing digits). Non-person params (title, url, ...) fail the
#: anchor and are dropped before any further work.
_PERSON_KEY_RE = (
    "^(author|editor|host|interviewer|translator|first|last)"
    "([0-9]{0,2})(?:_(first|last|link|mask))?([0-9]{0,2})$"
)


def _numbered_guard(p: Column) -> Column:
    return (p["given"].isNotNull() & p["surname"].isNotNull()) | p[
        "name_string"
    ].isNotNull()


def _any_field(p: Column) -> Column:
    return (
        p["given"].isNotNull()
        | p["surname"].isNotNull()
        | p["name_string"].isNotNull()
        | p["link"].isNotNull()
        | p["mask"].isNotNull()
    )


def canonicalize_person_keys(params: Column) -> Column:
    """Rewrite middle-digit person keys to the trailing-digit form
    (``author2_first`` → ``author_first2``), deduping collisions last-wins
    independent of ``spark.sql.mapKeyDedupPolicy``. No longer in the hot
    path (the parse regex accepts both digit positions directly); retained
    for callers that want a canonical params map."""
    from wcdimportbot_spark.functions.columns import transform_keys_last_wins

    roles_alt = "|".join(PERSON_ROLES)
    return transform_keys_last_wins(
        params,
        lambda k: F.regexp_replace(
            k, f"^({roles_alt})(\\d+)_(first|last|link|mask)$", "$1_$3$2"
        ),
    )


def parsed_person_entries(params: Column) -> Column:
    """One pass over the params map: keep person keys, classify each into
    ``struct(role, ordinal, field, value)``. ``field`` is the person-struct
    slot the value fills (given|surname|name_string|link|mask)."""
    person_entries = F.filter(
        F.map_entries(params),
        lambda e: e["key"].rlike(_PERSON_KEY_RE) & e["value"].isNotNull(),
    )

    def classify(e: Column) -> Column:
        key = e["key"]
        tok = F.regexp_extract(key, _PERSON_KEY_RE, 1)
        d_mid = F.regexp_extract(key, _PERSON_KEY_RE, 2)
        part = F.regexp_extract(key, _PERSON_KEY_RE, 3)
        d_tail = F.regexp_extract(key, _PERSON_KEY_RE, 4)
        ordinal = F.coalesce(
            F.nullif(d_mid, F.lit("")), F.nullif(d_tail, F.lit(""))
        ).cast("int")
        role = F.when(tok.isin("first", "last"), F.lit("unknown")).otherwise(tok)
        field = (
            F.when(tok == "first", F.lit("given"))
            .when(tok == "last", F.lit("surname"))
            .when(part == "first", F.lit("given"))
            .when(part == "last", F.lit("surname"))
            .when(part == "link", F.lit("link"))
            .when(part == "mask", F.lit("mask"))
            .otherwise(F.lit("name_string"))
        )
        return F.struct(
            role.alias("role"),
            ordinal.alias("ordinal"),
            field.alias("field"),
            e["value"].alias("value"),
        )

    parsed = F.transform(person_entries, classify)
    # reference scan range is 1..13 (wikipedia_page_reference.py:855);
    # out-of-range ordinals are ignored exactly as the probe loop ignored them
    return F.filter(
        parsed,
        lambda x: x["ordinal"].isNull()
        | ((x["ordinal"] >= 1) & (x["ordinal"] <= MAX_PERSON_ORDINAL)),
    )


def _slot_rank(pr: Column) -> Column:
    """Scalar sort key reproducing the probe order: PERSON_ROLES order,
    unnumbered (NULL ordinal) before numbered, roleless last."""
    pos = F.array_position(F.array(*[F.lit(r) for r in PERSON_ROLES]), pr["role"])
    role_rank = F.when(pos == 0, F.lit(len(PERSON_ROLES) + 1)).otherwise(pos)
    return role_rank * 100 + F.coalesce(pr["ordinal"], F.lit(0))


def sorted_person_pairs(parsed: Column) -> Column:
    """Distinct (role, ordinal) person slots present in the params, in
    reference scan order."""
    pairs = F.array_distinct(
        F.transform(
            parsed,
            lambda e: F.struct(e["role"].alias("role"), e["ordinal"].alias("ordinal")),
        )
    )
    return F.array_sort(
        pairs,
        lambda x, y: F.when(_slot_rank(x) < _slot_rank(y), F.lit(-1))
        .when(_slot_rank(x) > _slot_rank(y), F.lit(1))
        .otherwise(F.lit(0)),
    )


def persons_from_parsed(parsed: Column, pairs: Column) -> Column:
    """Assemble one guarded person struct per (role, ordinal) slot from the
    parsed entries. Pass MATERIALIZED columns (see :func:`with_persons`) —
    inlining the parse expression here would re-evaluate it per field."""

    def pick(pr: Column, field: str) -> Column:
        matches = F.filter(
            parsed,
            lambda e: (e["role"] == pr["role"])
            & e["ordinal"].eqNullSafe(pr["ordinal"])
            & (e["field"] == F.lit(field)),
        )
        # -1 = last occurrence: both digit positions present for the same
        # slot resolve last-wins, matching dict-overwrite semantics
        return F.try_element_at(matches, F.lit(-1))["value"]

    def build(pr: Column) -> Column:
        return F.struct(
            pr["role"].alias("role"),
            pr["ordinal"].alias("ordinal"),
            pick(pr, "given").alias("given"),
            pick(pr, "surname").alias("surname"),
            pick(pr, "name_string").alias("name_string"),
            pick(pr, "link").alias("link"),
            pick(pr, "mask").alias("mask"),
        )

    persons = F.transform(pairs, build)
    return F.filter(
        persons,
        lambda p: F.when(p["ordinal"].isNull(), _any_field(p)).otherwise(
            _numbered_guard(p)
        ),
    )


def with_persons(references: DataFrame, params_col: str = "params") -> DataFrame:
    """Attach the ``persons`` array column. The parse and slot arrays are
    materialized as their own columns first: Catalyst does no
    common-subexpression elimination inside lambda bodies, so inlining
    would re-run the parse for every one of the 5 field picks."""
    return (
        references.withColumn(
            "_pparsed", parsed_person_entries(F.col(params_col))
        )
        .withColumn("_ppairs", sorted_person_pairs(F.col("_pparsed")))
        .withColumn(
            "persons", persons_from_parsed(F.col("_pparsed"), F.col("_ppairs"))
        )
        .drop("_pparsed", "_ppairs")
    )


def persons_long(references: DataFrame, keys: list[str]) -> DataFrame:
    """Explode the persons array into a long table keyed by ``keys`` —
    the ``persons`` dimension table of SURVEY §1.1, with W1 ordinal
    sequencing and F16 full-name derivation applied."""
    from wcdimportbot_spark.functions.columns import person_full_name

    exploded = references.select(
        *keys, F.posexplode_outer("persons").alias("pos", "person")
    )
    return exploded.select(
        *keys,
        F.col("person.role").alias("role"),
        F.col("person.ordinal").alias("number_in_sequence"),
        F.col("person.given").alias("given"),
        F.col("person.surname").alias("surname"),
        F.col("person.name_string").alias("name_string"),
        F.col("person.link").alias("link"),
        F.col("person.mask").alias("mask"),
        person_full_name(
            F.col("person.name_string"),
            F.col("person.given"),
            F.col("person.surname"),
        ).alias("full_name"),
        (F.col("pos") + 1).alias("position_in_reference"),
    )
