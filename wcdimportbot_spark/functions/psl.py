"""Full public-suffix-list first-level-domain extraction (F5).

The reference derives the registrable domain with ``tld.get_fld``
(``wikipedia_page_reference.py:695-714``), i.e. the full Mozilla Public
Suffix List — ICANN *and* private sections (``get_fld`` defaults to
``search_private=True``, so e.g. ``x.blogspot.com`` is its own fld).

This module re-expresses the PSL match as a pure Catalyst expression,
registered once per session as a SQL scalar function:

- the PSL (``/usr/share/publicsuffix/public_suffix_list.dat``, the
  distro-packaged Mozilla list — public data) is parsed once per process
  into rule sets keyed by label count;
- the match is compiled to ONE ``CREATE TEMPORARY FUNCTION`` statement
  (Spark 4 SQL UDF): candidate suffixes (last 1..5 labels of the host)
  probed with ``IN`` lists. Above ``inSetConversionThreshold`` Catalyst
  compiles each list to a single ``InSet`` hash-set probe — one
  expression node per rule arity, NOT one per rule, so whole-stage
  codegen stays compact;
- building the predicate as one SQL string matters: the naive
  ``Column.isin(*9500_literals)`` constructs every literal through py4j
  (~13 s of driver time PER QUERY, measured at sf0.1); the SQL string
  crosses the bridge once at registration and each use is a single
  ``call_function`` that the analyzer inlines JVM-side;
- the longest matching rule wins (PSL algorithm); wildcard rules
  (``*.ck``) extend the suffix one label; exception rules (``!www.ck``)
  cancel the wildcard they pair with.

Semantics matched to ``tld.get_fld`` rather than the raw PSL spec:

- unknown TLD → NULL (no implicit ``*`` default rule; ``get_fld`` raises
  ``TldDomainNotFound``, which the reference does not catch — a
  distributed job cannot crash per-row, so NULL + rejects channel is the
  documented deviation);
- host exactly equal to a public suffix → NULL (same exception in the
  reference);
- IDN labels are matched verbatim (no punycode conversion — the
  reference corpus is ASCII URLs).
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

#: candidate PSL locations, first hit wins; override with $WCD_PSL_PATH.
#: All are the distro-packaged Mozilla list (public data, MPL 2.0).
PSL_CANDIDATE_PATHS = (
    "/usr/share/publicsuffix/public_suffix_list.dat",
    "/usr/share/publicsuffix/effective_tld_names.dat",
    "/etc/java-17-openjdk/security/public_suffix_list.dat",
)

FN_NAME = "psl_registrable_domain"

_rules_cache: dict | None = None


def resolve_psl_path() -> str:
    import os

    override = os.environ.get("WCD_PSL_PATH")
    candidates = (override,) + PSL_CANDIDATE_PATHS if override else PSL_CANDIDATE_PATHS
    for p in candidates:
        if p and os.path.exists(p):
            return p
    raise FileNotFoundError(
        "no public suffix list found; install the distro 'publicsuffix' "
        f"package or set $WCD_PSL_PATH (tried {candidates})"
    )


def load_psl(path: str | None = None) -> dict:
    """Parse the PSL into ``{"normal": {k: frozenset}, "wild": {k:
    frozenset}, "exc": {k: frozenset}}`` keyed by label count (wildcards
    keyed by the label count of their base, i.e. ``*.ck`` → k=1)."""
    global _rules_cache
    default = path is None
    if default:
        if _rules_cache is not None:
            return _rules_cache
        path = resolve_psl_path()
    normal: dict[int, set] = {}
    wild: dict[int, set] = {}
    exc: dict[int, set] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip().lower()
            if not line or line.startswith("//"):
                continue
            if line.startswith("!"):
                rule = line[1:]
                exc.setdefault(rule.count(".") + 1, set()).add(rule)
            elif line.startswith("*."):
                base = line[2:]
                wild.setdefault(base.count(".") + 1, set()).add(base)
            else:
                normal.setdefault(line.count(".") + 1, set()).add(line)
    rules = {
        "normal": {k: frozenset(v) for k, v in normal.items()},
        "wild": {k: frozenset(v) for k, v in wild.items()},
        "exc": {k: frozenset(v) for k, v in exc.items()},
    }
    if default:
        _rules_cache = rules
    return rules


def _in_list(values) -> str:
    return ", ".join("'" + v.replace("'", "''") + "'" for v in sorted(values))


def _fld_sql_body() -> str:
    """The registrable-domain match as one SQL expression over ``host``.

    Structure mirrors the PSL algorithm: per rule arity an IN-probe arm
    yields its suffix length; ``greatest`` picks the longest match; the
    suffix length is bound ONCE as a lambda variable (``transform`` over a
     1-element array) so its big expression isn't duplicated."""
    rules = load_psl()
    # SQL '\\.' → regex \. (Spark SQL string literals are backslash-escaped)
    parts = "split(host, '\\\\.')"
    n = f"size({parts})"

    def last(k: int) -> str:
        return f"array_join(slice({parts}, {n} - {k} + 1, {k}), '.')"

    arms = []
    for k, s in sorted(rules["normal"].items()):
        arms.append(f"CASE WHEN {n} >= {k} AND {last(k)} IN ({_in_list(s)}) THEN {k} END")
    for k, w in sorted(rules["wild"].items()):
        base = f"{n} >= {k} AND {last(k)} IN ({_in_list(w)})"
        exc = rules["exc"].get(k + 1)
        if exc:
            is_exc = f"{n} >= {k + 1} AND {last(k + 1)} IN ({_in_list(exc)})"
            # exception: the (k+1)-label name is NOT a suffix — the suffix
            # stays at the wildcard base, making the exception name itself
            # the registrable domain
            arms.append(f"CASE WHEN ({base}) AND ({is_exc}) THEN {k} END")
            arms.append(f"CASE WHEN ({base}) AND NOT coalesce({is_exc}, false) THEN {k + 1} END")
        else:
            arms.append(f"CASE WHEN {base} THEN {k + 1} END")
    slen = f"greatest({', '.join(arms)})"
    return (
        "element_at(transform(array(" + slen + "), s -> "
        f"CASE WHEN s IS NOT NULL AND {n} > s "
        f"THEN array_join(slice({parts}, {n} - s, s + 1), '.') END), 1)"
    )


def ensure_registered(spark: SparkSession) -> None:
    """Register the PSL SQL function in this session (idempotent; the
    ~150 KB rule text crosses the py4j bridge once per session).

    Always consults the catalog (one cheap RPC): caching on the Python
    wrapper id would false-positive when a new session object reuses a
    gc'd wrapper's address, and streaming microbatches hand callbacks
    fresh wrappers around CLONED sessions whose registries may or may not
    have the function depending on when the clone was taken."""
    if not spark.catalog.functionExists(FN_NAME):
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {FN_NAME}(host STRING) "
            f"RETURNS STRING RETURN {_fld_sql_body()}"
        )


def registrable_domain(host: Column) -> Column:
    """PSL first-level domain of an already-extracted (lowercase) host
    column; NULL when the host has no registrable domain."""
    spark = SparkSession.getActiveSession()
    if spark is None:  # pragma: no cover - expressions are built in queries
        raise RuntimeError("registrable_domain needs an active SparkSession")
    ensure_registered(spark)
    # strip one trailing dot (FQDN form) before the match
    return F.call_function(FN_NAME, F.regexp_replace(host, r"\.$", ""))
