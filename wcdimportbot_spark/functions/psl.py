"""Full public-suffix-list first-level-domain extraction (F5).

The reference derives the registrable domain with ``tld.get_fld``
(``wikipedia_page_reference.py:695-714``), i.e. the full Mozilla Public
Suffix List — ICANN *and* private sections (``get_fld`` defaults to
``search_private=True``, so e.g. ``x.blogspot.com`` is its own fld).

This module re-expresses the PSL match as a chain of per-arity
**broadcast dimension joins** — the scale-correct plan shape:

- the PSL (``/usr/share/publicsuffix/public_suffix_list.dat``, the
  distro-packaged Mozilla list — public data) is parsed once per process
  into rule sets keyed by label count (arity k = 1..5);
- for each arity k a tiny dimension table ``(suffix, is_n, is_w, is_x)``
  is built once per session (~9.5k rows total across all arities) and
  broadcast; the fact side derives the candidate suffix (last k labels of
  the host) and LEFT-joins it — an equi-key BroadcastHashJoin, no
  shuffle, no row multiplication (suffixes are unique per arity);
- the longest matching rule wins (PSL algorithm), computed as one
  ``greatest`` over the per-arity match flags; wildcard rules (``*.ck``)
  extend the suffix one label; exception rules (``!www.ck``) cancel the
  wildcard they pair with.

Why a join and not a generated IN-list expression: an expression carrying
all 9,391 rules as literals is macro-inlined into EVERY calling plan —
measured 69 MiB task binaries, and inside streaming micro-batches (whose
plans embed the batch pipeline repeatedly) JVM heap exhaustion. A
broadcast variable ships the rule set to each executor ONCE, outside the
plan, and the plan itself stays a few KB. At 100 TB this is the only
shape that survives: the fact table never shuffles, the dimension is
broadcast, and the probe is a hash-map lookup per arity.

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

import weakref

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: candidate PSL locations, first hit wins; override with $WCD_PSL_PATH.
#: All are the distro-packaged Mozilla list (public data, MPL 2.0).
PSL_CANDIDATE_PATHS = (
    "/usr/share/publicsuffix/public_suffix_list.dat",
    "/usr/share/publicsuffix/effective_tld_names.dat",
    "/etc/java-17-openjdk/security/public_suffix_list.dat",
)

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


def _rule_rows() -> dict[int, list[tuple[str, bool, bool, bool]]]:
    """Flatten the parsed PSL into one row per distinct suffix string,
    grouped by arity: ``(suffix, is_normal, is_wild_base, is_exception)``.
    A string can carry several flags (a wildcard base may also be a plain
    rule), so flags are merged — the join side stays unique per arity."""
    rules = load_psl()
    merged: dict[str, list[bool]] = {}

    def add(strings, pos):
        for s in strings:
            merged.setdefault(s, [False, False, False])[pos] = True

    for strings in rules["normal"].values():
        add(strings, 0)
    for strings in rules["wild"].values():
        add(strings, 1)
    for strings in rules["exc"].values():
        add(strings, 2)
    by_k: dict[int, list[tuple[str, bool, bool, bool]]] = {}
    for s, (n, w, x) in merged.items():
        by_k.setdefault(s.count(".") + 1, []).append((s, n, w, x))
    return {k: sorted(v) for k, v in by_k.items()}


#: per-session suffix dimension tables; weakly keyed so dead sessions
#: (streaming clones, test fixtures) don't pin DataFrames forever, and an
#: id()-reuse after gc can't serve another session's tables.
_tables_cache: dict[int, tuple[weakref.ref, dict[int, DataFrame]]] = {}


def suffix_tables(spark: SparkSession) -> dict[int, DataFrame]:
    """The PSL as per-arity dimension DataFrames
    ``{k: (suffix, is_n, is_w, is_x)}``, built once per session."""
    ent = _tables_cache.get(id(spark))
    if ent is not None and ent[0]() is spark:
        return ent[1]
    tables = {
        k: spark.createDataFrame(
            rows, "suffix string, is_n boolean, is_w boolean, is_x boolean"
        )
        for k, rows in _rule_rows().items()
    }
    for dead in [k for k, (ref, _) in _tables_cache.items() if ref() is None]:
        del _tables_cache[dead]
    _tables_cache[id(spark)] = (weakref.ref(spark), tables)
    return tables


def with_registrable_domain(
    df: DataFrame, host: Column | str, out: str
) -> DataFrame:
    """Append the PSL registrable domain of ``host`` as column ``out``.

    One LEFT BroadcastHashJoin per rule arity (5 for the current PSL)
    against the per-arity suffix dimension; the longest match wins. NULL
    when the host is NULL, has an unknown TLD, or IS a public suffix. A
    trailing dot (FQDN form) is stripped before matching."""
    spark = df.sparkSession
    tabs = suffix_tables(spark)
    rules = load_psl()
    hcol = F.col(host) if isinstance(host, str) else host
    pre = f"__psl_{out}_"
    hname = pre + "h"
    df = df.withColumn(hname, F.regexp_replace(hcol, r"\.$", ""))
    parts = F.split(F.col(hname), r"\.")
    n = F.size(parts)
    # candidate join keys: the last k labels of the host, NULL when the
    # host is too short (NULL keys fall out of the equi-join, row kept)
    df = df.withColumns(
        {
            f"{pre}c{k}": F.when(
                n >= k, F.array_join(F.slice(parts, n - k + 1, k), ".")
            )
            for k in sorted(tabs)
        }
    )
    for k in sorted(tabs):
        ck = f"{pre}c{k}"
        dim = tabs[k].select(
            F.col("suffix").alias(ck),
            F.col("is_n").alias(f"{pre}n{k}"),
            F.col("is_w").alias(f"{pre}w{k}"),
            F.col("is_x").alias(f"{pre}x{k}"),
        )
        df = df.join(F.broadcast(dim), on=ck, how="left")
    # longest-match: each arity/rule-class contributes its suffix length
    arms = []
    for k in sorted(rules["normal"]):
        arms.append(F.when(F.col(f"{pre}n{k}"), F.lit(k)))
    for k in sorted(rules["wild"]):
        w = F.col(f"{pre}w{k}")
        if (k + 1) in rules["exc"]:
            # exception: the (k+1)-label name is NOT a suffix — the
            # suffix stays at the wildcard base, making the exception
            # name itself the registrable domain
            x = F.coalesce(F.col(f"{pre}x{k + 1}"), F.lit(False))
            arms.append(F.when(w & x, F.lit(k)))
            arms.append(F.when(w & ~x, F.lit(k + 1)))
        else:
            arms.append(F.when(w, F.lit(k + 1)))
    s = F.greatest(*arms)
    fld = F.when(
        s.isNotNull() & (n > s), F.array_join(F.slice(parts, n - s, s + 1), ".")
    )
    df = df.withColumn(out, fld)
    return df.drop(hname, *[f"{pre}{p}{k}" for k in sorted(tabs) for p in "cnwx"])
