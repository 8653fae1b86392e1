"""Driver-side memo for PURE unresolved Column expression trees.

Building a large Column tree costs one py4j round-trip per node (~1-3 ms
each): builders like ``build_references`` (~600 nodes) or the 41-claim
graph arrays pay 1-2 s of pure DRIVER wall per call while the cluster
idles (guide §5: the driver should do almost no work — and expression
construction is exactly the "generating gigantic expression trees in
loops" planning cost the guide's §7.3 names). An UNRESOLVED expression
tree is immutable and plan-independent: reusing one across queries is
precisely reusing ``F.col("x") > 5`` twice — each plan re-resolves and
re-optimizes it independently (including per-query substitution of
``current_date()`` by the ComputeCurrentTime rule), so the produced
plans are identical to freshly-built ones.

Scope rules for callers:
- memo ONLY trees built from literals, ``F.col``/``F.lit`` and module
  constants — never trees embedding a caller-supplied Column unless the
  key captures that column's identity;
- the cache key embeds the live py4j gateway OBJECT (not its id), so a
  restarted JVM misses cleanly and an old gateway can never be confused
  with a new one by id reuse.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark import SparkContext

_CACHE: dict[tuple, Any] = {}


def memo_expr(key: tuple, build: Callable[[], Any]) -> Any:
    """Return ``build()`` memoized per (JVM, *key*).

    ``build`` must be pure and return an immutable-by-convention value
    (a Column, or a tuple/dict of Columns that callers never mutate).
    Without an active SparkContext the builder runs unmemoized (no JVM
    to key on — and nothing to talk py4j to anyway)."""
    sc = SparkContext._active_spark_context
    if sc is None:
        return build()
    k = (sc._gateway, *key)
    try:
        return _CACHE[k]
    except KeyError:
        pass
    v = _CACHE[k] = build()
    return v
