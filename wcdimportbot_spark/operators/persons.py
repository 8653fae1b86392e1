"""Person assembly from numbered template parameters (F15-F17, W1).

The reference scans every non-null attribute of the wide record and
assembles Person objects per role with ordinals 1..13
(``wikipedia_page_reference.py:716-858,972-1071``). The natural Spark
translations are (a) unpivot → regex → groupBy → collect_list, or (b) a
pure per-row expression over the params map. We use (b): all information for
one reference's persons lives in a single row's ``params`` column, so a
shuffle-free ``transform(sequence(1,13), ...)`` expression builds the
persons array in whole-stage codegen — at 100 TB this saves an entire
shuffle of the exploded key-value stream that (a) would require.

Key grammar (post key-fixing, so dashes are underscores):

- roleless:  ``first``/``last``, ``first{N}``/``last{N}``  → role ``unknown``
  (``__parse_roleless_persons__``, numbered range 1..13)
- role r ∈ {author, editor, host, interviewer, translator}:
  - ``{r}``            → name_string (unnumbered)
  - ``{r}_{part}``     → part ∈ first|last|link|mask (unnumbered)
  - ``{r}{N}``         → name_string
  - ``{r}_{part}{N}`` and ``{r}{N}_{part}`` — both digit positions
    (``__get_numbered_person__`` handles e.g. ``author2_first`` and
    ``author_first2``)

Guards: numbered persons require (given AND surname) OR name_string
(``wikipedia_page_reference.py:781-790``); unnumbered persons require any
field. Deviation from the reference, implemented as evident intent per
SURVEY §1.4: numbered persons carry their actual role (the reference
hardcodes AUTHOR for all numbered known-role persons,
``wikipedia_page_reference.py:1008``: ``role=...AUTHOR`` regardless of the
``search_string``).
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


def _person_struct(
    role: Column | str,
    ordinal: Column,
    given: Column,
    surname: Column,
    name_string: Column,
    link: Column,
    mask: Column,
) -> Column:
    role_col = F.lit(role) if isinstance(role, str) else role
    return F.struct(
        role_col.alias("role"),
        ordinal.cast("int").alias("ordinal"),
        given.alias("given"),
        surname.alias("surname"),
        name_string.alias("name_string"),
        link.alias("link"),
        mask.alias("mask"),
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
    (``author2_first`` → ``author_first2``). The reference accepts both
    positions; canonicalizing once halves the lookup tree in
    :func:`persons_array` (which otherwise needs a two-variant coalesce per
    part — measured as a large codegen JIT cost).

    IMPORTANT: materialize the result as its own column before passing it
    to :func:`persons_array` — inlining it makes Catalyst re-evaluate the
    whole map transform for every lookup (no common-subexpression sharing
    inside lambda bodies)."""
    from wcdimportbot_spark.functions.columns import dedup_map_last_wins

    roles_alt = "|".join(PERSON_ROLES)
    # a params map holding BOTH digit positions for the same person part
    # (author2_first + author_first2) canonicalizes to a duplicate key;
    # dedup explicitly (last wins) instead of relying on the session's
    # spark.sql.mapKeyDedupPolicy
    return dedup_map_last_wins(
        F.transform_keys(
            params,
            lambda k, _v: F.regexp_replace(
                k, f"^({roles_alt})(\\d+)_(first|last|link|mask)$", "$1_$3$2"
            ),
        )
    )


def persons_array(params: Column) -> Column:
    """Build the ordered persons array for one reference row, from its
    params map (keys pre-canonicalized via
    :func:`canonicalize_person_keys`). Pure Catalyst expression — no UDF,
    no shuffle."""
    null_s = F.lit(None).cast("string")
    null_i = F.lit(None).cast("int")
    role_arrays = []
    for role in PERSON_ROLES:
        unnumbered = _person_struct(
            role,
            null_i,
            params[f"{role}_first"],
            params[f"{role}_last"],
            params[role],
            params[f"{role}_link"],
            params[f"{role}_mask"],
        )
        def numbered_person(r: str):
            # NB: the transform lambda must take exactly one parameter —
            # pyspark treats a second parameter (even defaulted) as the
            # array-index argument
            def build(n: Column) -> Column:
                ns = n.cast("string")

                def part(suffix: str) -> Column:
                    # canonical trailing-digit key only (see transform_keys
                    # canonicalization above)
                    return params[F.concat(F.lit(f"{r}_{suffix}"), ns)]

                return _person_struct(
                    r,
                    n,
                    part("first"),
                    part("last"),
                    params[F.concat(F.lit(r), ns)],
                    part("link"),
                    part("mask"),
                )

            return build

        numbered = F.transform(
            F.sequence(F.lit(1), F.lit(MAX_PERSON_ORDINAL)), numbered_person(role)
        )
        role_arrays.append(
            F.concat(
                F.filter(F.array(unnumbered), _any_field),
                F.filter(numbered, _numbered_guard),
            )
        )
    roleless_unnumbered = _person_struct(
        "unknown", null_i, params["first"], params["last"], null_s, null_s, null_s
    )
    roleless_numbered = F.transform(
        F.sequence(F.lit(1), F.lit(MAX_PERSON_ORDINAL)),
        lambda n: _person_struct(
            "unknown",
            n,
            params[F.concat(F.lit("first"), n.cast("string"))],
            params[F.concat(F.lit("last"), n.cast("string"))],
            null_s,
            null_s,
            null_s,
        ),
    )
    role_arrays.append(
        F.concat(
            F.filter(F.array(roleless_unnumbered), _any_field),
            F.filter(roleless_numbered, _numbered_guard),
        )
    )
    return F.concat(*role_arrays)


def with_persons(references: DataFrame, params_col: str = "params") -> DataFrame:
    return (
        references.withColumn(
            "_pcanon", canonicalize_person_keys(F.col(params_col))
        )
        .withColumn("persons", persons_array(F.col("_pcanon")))
        .drop("_pcanon")
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
